package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling: run named queries N times each against a SF dir.
  * `sbt "runMain graft.tools.Profile sfDir q01_pricing_summary q16_string_funcs"` */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    // Mirrors Bench's session conf exactly (r13) — a Profile number is
    // only comparable to a BENCH_DETAIL number if the shuffle sizing
    // and extensions match.
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
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
