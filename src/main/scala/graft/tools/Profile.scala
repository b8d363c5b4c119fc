package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling: run named queries N times each against a SF dir.
  * `sbt "runMain graft.tools.Profile sfDir q01_pricing_summary q16_string_funcs"` */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    // Mirrors Bench's session conf exactly (r13; r14 derives cpus and
    // initialPartitionNum from SPARK_GRAFT_CPUS exactly as Bench does —
    // a Profile number is only comparable to a BENCH_DETAIL number if
    // the core count, shuffle sizing and extensions match).
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
    for (name <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
