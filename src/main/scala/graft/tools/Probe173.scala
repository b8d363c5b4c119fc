package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway partition-shape probe for q173 (round 14). */
object Probe173 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    graft.functions.GraftFunctions.register(spark)
    val edges = graft.operators.Analytics.basketCanon(spark, sfDir)
    val degrees = graft.operators.Analytics.basketDegrees(spark, sfDir)
    val e = edges.select(col("src").as("a"), col("dst").as("b"))
      .repartition(col("a"), col("b")).localCheckpoint()
    val adj = e.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v")))
    val deg = degrees.toDF("u", "deg").localCheckpoint()
    val bridge = adj.join(deg.filter(col("deg") <= 100), "u")
    val lists = bridge.groupBy(col("u"), col("deg"))
      .agg(sort_array(collect_list(col("v"))).as("vs"))
    println(s"[probe] lists rows=${lists.count()}")
    val paths = lists
      .select(explode(expr("array_pairs(vs)")).as("p"), col("deg").as("degz"))
      .select(col("p.da").as("x"), col("p.db").as("y"), col("degz"))
    // materialize paths and look at its ACTUAL partition count post-AQE
    val prdd = paths.rdd
    println(s"[probe] paths partitions=${prdd.getNumPartitions}")
    val sizes = prdd.mapPartitions(it => Iterator(it.size)).collect()
    println(s"[probe] paths partition sizes min=${sizes.min} max=${sizes.max} n=${sizes.length}")
    println(s"[probe] distinct pairs=${paths.select(col("x"), col("y")).distinct().count()}")
    println(s"[probe] max node id=${deg.agg(max(col("u"))).collect()(0).getLong(0)}")
    spark.stop()
  }
}
