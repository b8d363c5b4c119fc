package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Throwaway piecewise profiler for q173_link_prediction (round 14).
  * Times each subplan of linkPrediction via the noop sink so the wedge
  * stage, the (x,y) aggregate and the checkpoints are attributed
  * separately. Mirrors Bench's session conf. Dev-side; never in a
  * query path. Usage: runMain graft.tools.PieceQ173 <sfDir> */
object PieceQ173 {
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

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[piece] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // artifact warm-up (untimed equivalent of the bench warm sweep)
    time("artifact builds (canon+deg, cold)") {
      noop(graft.operators.Analytics.basketCanon(spark, sfDir))
      noop(graft.operators.Analytics.basketDegrees(spark, sfDir))
    }

    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val edges = graft.operators.Analytics.basketCanon(spark, sfDir)
      val degrees = graft.operators.Analytics.basketDegrees(spark, sfDir)
      val e = time("e: repartition(a,b)+localCheckpoint") {
        edges.select(col("src").as("a"), col("dst").as("b"))
          .repartition(col("a"), col("b")).localCheckpoint()
      }
      println(s"[piece] e partitions=${e.rdd.getNumPartitions} rows=${e.count()}")
      val adj = e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b").as("u"), col("a").as("v")))
      val deg = time("deg: localCheckpoint") {
        degrees.toDF("u", "deg").localCheckpoint()
      }
      val bridge = adj.join(deg.filter(col("deg") <= 100), "u")
      val paths = bridge.groupBy(col("u"), col("deg"))
        .agg(sort_array(collect_list(col("v"))).as("vs"))
        .select(explode(expr("array_pairs(vs)")).as("p"), col("deg").as("degz"))
        .select(col("p.da").as("x"), col("p.db").as("y"), col("degz"))
      time("paths (wedge explode) noop") { noop(paths) }
      println(s"[piece] wedge rows=${paths.count()}")
      val scored = paths.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("cn"),
          sum(round(lit(1.0e9) / log(col("degz").cast(DoubleType)))
            .cast(LongType)).as("__aa_q"))
      time("scored (x,y agg) noop") { noop(scored) }
      val cand = scored.join(e.select(col("a").as("x"), col("b").as("y")),
        Seq("x", "y"), "left_anti")
      val top = time("top: orderBy+limit+localCheckpoint") {
        cand.orderBy(col("__aa_q").desc, col("x"), col("y"))
          .limit(20).localCheckpoint()
      }
      time("final join noop") {
        noop(broadcast(top)
          .join(deg.select(col("u").as("x"), col("deg").as("degx")), "x")
          .join(deg.select(col("u").as("y"), col("deg").as("degy")), "y"))
      }
      time("full query (linkPrediction)") {
        noop(graft.api.Graft.linkPrediction(edges, "src", "dst",
          topK = 20, maxDegree = 100, canonicalEdges = true,
          degrees = Some(degrees.toDF("u", "deg"))))
      }

      // ---- optimized variant: width-restored, term-hoisted, packed keys
      val wedgeEst = deg.filter(col("deg") <= 100)
        .agg(sum(expr("(deg * (deg - 1)) div 2")).as("w"))
        .collect()(0).getLong(0)
      val maxId = deg.agg(max(col("u"))).collect()(0).getLong(0)
      println(s"[piece] wedgeEst=$wedgeEst maxId=$maxId")
      val p = math.max(spark.sparkContext.defaultParallelism,
        math.min(4096L, wedgeEst * 24L / (64L << 20))).toInt
      val lists2 = bridge.groupBy(col("u"), col("deg"))
        .agg(sort_array(collect_list(col("v"))).as("vs"))
        .withColumn("term",
          round(lit(1.0e9) / log(col("deg").cast(DoubleType))).cast(LongType))
        .repartition(p, col("u"))
      val paths2 = lists2
        .select(explode(expr("array_pairs(vs)")).as("pp"), col("term"))
        .select((shiftleft(col("pp.da"), 32) + col("pp.db")).as("xy"),
          col("term"))
      val scored2 = paths2.groupBy(col("xy"))
        .agg(count(lit(1)).as("cn"), sum(col("term")).as("__aa_q"))
      time("scored2 (packed agg) noop") { noop(scored2) }
      val cand2 = scored2.join(
        e.select((shiftleft(col("a"), 32) + col("b")).as("xy")),
        Seq("xy"), "left_anti")
      val top2 = time("top2: orderBy+limit+localCheckpoint") {
        cand2
          .select(shiftright(col("xy"), 32).as("x"),
            col("xy").bitwiseAND(lit(4294967295L)).as("y"),
            col("cn"), col("__aa_q"))
          .orderBy(col("__aa_q").desc, col("x"), col("y"))
          .limit(20).localCheckpoint()
      }
      // width+term only, unpacked 2-col keys
      val paths3 = lists2
        .select(explode(expr("array_pairs(vs)")).as("pp"), col("term"))
        .select(col("pp.da").as("x"), col("pp.db").as("y"), col("term"))
      val scored3 = paths3.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("cn"), sum(col("term")).as("__aa_q"))
      time("scored3 (unpacked wide agg) noop") { noop(scored3) }
      time("final2 join noop") {
        noop(broadcast(top2)
          .join(deg.select(col("u").as("x"), col("deg").as("degx")), "x")
          .join(deg.select(col("u").as("y"), col("deg").as("degy")), "y")
          .orderBy(col("__aa_q").desc, col("x"), col("y")))
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
