package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-evidence capture (round 14, VERDICT #3): dumps
  * `.explain("formatted")` for named queries INCLUDING the subplans that
  * feed eager `localCheckpoint` calls — the r13 before/after pairs for
  * q147/q173/q187/q310 were byte-identical `Scan ExistingRDD` stubs
  * because the dump ran downstream of the checkpoint. Operators
  * cooperate via [[graft.api.Graft.planProbe]]: building the query with
  * the hook set hands every checkpoint's INPUT DataFrame to this tool
  * before it is pinned.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> <query>...
  * writes <outDir>/<query>_<tag>.txt (final plan first, then each
  * probed subplan). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val probes = Seq.newBuilder[(String, String)]
      graft.api.Graft.planHook = Some { (label, df) =>
        probes += label -> df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      }
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val finalPlan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val body = new StringBuilder
        body ++= s"== $name ($tag) — final plan ==\n"
        body ++= finalPlan
        for ((label, plan) <- probes.result()) {
          body ++= s"\n== $name ($tag) — pre-checkpoint subplan: $label ==\n"
          body ++= plan
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
          body.toString.getBytes("UTF-8"))
        println(s"[plandump] wrote $outDir/${name}_$tag.txt " +
          s"(${probes.result().size} probed subplans)")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      } finally graft.api.Graft.planHook = None
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
