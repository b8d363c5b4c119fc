package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are fully materialized through the noop
  * sink (count() would let Catalyst prune the computed columns away). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up on a small slice so per-query timings measure the
    // engine, not JIT compilation of Spark's hot paths.
    try {
      import org.apache.spark.sql.functions._
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10000)
      l.groupBy("l_returnflag").agg(sum("l_quantity"), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
      l.withColumn("r", org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey") match {
        case w => row_number().over(w.orderBy("l_linenumber"))
      }).write.format("noop").mode("overwrite").save()
      // explode + wide-agg + self-join shapes (the dedup pipelines' JIT paths)
      val d = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val manyAggs = (0 until 32).map(i => min(xxhash64(col("w")) + i).as(s"m$i"))
      d.groupBy("doc_id").agg(manyAggs.head, manyAggs.tail: _*)
        .write.format("noop").mode("overwrite").save()
      d.alias("a").join(d.alias("b"), col("a.w") === col("b.w")).groupBy(col("a.doc_id"))
        .agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // Two timed sweeps in pinned (sorted) order. The reported number per
    // query is the min of the two — the best isolator of code changes
    // from JIT/GC/machine noise — and `spread` (max-min) flags entries
    // whose timing is too unstable to compare across rounds (round 2's
    // q31 "regression" cost a diagnosis cycle that variance data would
    // have settled).
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    def sweep(): Seq[(String, Double)] = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val s1 = sweep().toMap
    val s2 = sweep().toMap
    val names = ordered.map(_._1)
    def ms3(v: Double): String = // locale-proof %.3f (no comma separators)
      java.lang.String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def fmt(m: Map[String, Double], key: String => String, v: Double => String): String =
      names.map(n => "\"" + key(n) + "\":" + v(m(n))).mkString("{", ",", "}")
    val best = names.map(n => n -> math.min(s1(n), s2(n))).toMap
    val spread = names.map(n => n -> math.abs(s1(n) - s2(n))).toMap
    val total = best.values.sum
    // Full-precision detail (both sweeps + spread, full query names) goes to
    // a file: the driver's capture keeps only the LAST ~2000 chars of stdout,
    // which the full map has never fit (BENCH_r01..r03 all show parsed:null).
    val full = (v: Double) => v.toString
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",
         |"queries":${fmt(best, identity, full)},
         |"sweep1":${fmt(s1, identity, full)},
         |"sweep2":${fmt(s2, identity, full)},
         |"spread":${fmt(spread, identity, full)}}""".stripMargin.replace("\n", "")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detail.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // The final stdout line is the driver-parsed artifact: keep it compact
    // enough (~1200 chars at 75 queries) to survive the tail capture — qNN
    // short keys for the numbered corpus, millisecond precision.
    def short(n: String): String = {
      val i = n.indexOf('_')
      if (n.startsWith("q") && i > 1 && n.substring(1, i).forall(_.isDigit)) n.substring(0, i)
      else n
    }
    println(s"""{"metric":"total","value":${ms3(total)},"unit":"sec","queries":${fmt(best, short, ms3)},"sf":"$sfDir","detail":"BENCH_DETAIL.json"}""")
    spark.stop()
  }
}
