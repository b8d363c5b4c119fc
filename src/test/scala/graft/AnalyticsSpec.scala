package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft
import graft.operators.Multimodal

/** Round-5 operators: Morton/Z-order codes, interval merging, profiling,
  * tolerance as-of joins, weighted sampling, and the real WAV audio
  * decode path — invariant tests on hand-checked inline data. */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  // ------------------------------------------------------------- morton

  test("mortonZ is a bijection on [0,64)² and interleaves bits") {
    val s = spark; import s.implicits._
    val pairs = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = pairs.toDF("x", "y").withColumn("z", Graft.mortonZ(col("x"), col("y")))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).distinct.length === 64 * 64) // injective
    // reference interleave computed bit-by-bit in plain Scala
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      }
    rows.foreach { case (x, y, z) => assert(z === ref(x, y), s"($x,$y)") }
    // locality: the quadrant (high interleaved bits) groups nearby points
    assert(ref(0, 0) < ref(32, 32) && ref(31, 31) < ref(32, 32))
  }

  test("zorderBy plans one range exchange and keeps all rows") {
    val s = spark; import s.implicits._
    val df = (0 until 1000).map(i => (i.toLong % 50L, (i * 7L) % 50L, i.toLong))
      .toDF("x", "y", "id")
    val z = Graft.zorderBy(df, "x", "y", partitions = 4)
    val plan = z.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(z.count() === 1000)
    assert(z.columns.toSeq === Seq("x", "y", "id")) // helper column dropped
  }

  // ---------------------------------------------------------- intervals

  test("mergeIntervals merges overlapping and touching, keeps gaps apart") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("u1", 0L, 10L), ("u1", 5L, 12L),  // overlap → one island
      ("u1", 12L, 15L),                  // touching → same island
      ("u1", 20L, 25L),                  // gap → new island
      ("u2", 0L, 1L))
      .toDF("k", "s", "e")
    val out = Graft.mergeIntervals(df, "k", "s", "e")
      .orderBy("k", "island").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out === Array(("u1", 0L, 15L, 3L), ("u1", 20L, 25L, 1L), ("u2", 0L, 1L, 1L)))
  }

  test("mergeIntervals: contained interval does not split a running island") {
    val s = spark; import s.implicits._
    // (0,100) swallows (10,20); (30,40) must still belong to the first
    // island because the running max(end) is 100, not 20
    val df = Seq(("u", 0L, 100L), ("u", 10L, 20L), ("u", 30L, 40L)).toDF("k", "s", "e")
    val out = Graft.mergeIntervals(df, "k", "s", "e").collect()
    assert(out.length === 1)
    assert(out(0).getLong(2) === 0L && out(0).getLong(3) === 100L)
  }

  // ------------------------------------------------------------ profile

  test("profile computes per-column stats in one aggregation") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a"))).toDF("id", "tag")
    val p = Graft.profile(df, Seq("id", "tag")).orderBy("col_name").collect()
    val byName = p.map(r => r.getString(0) -> r).toMap
    assert(byName("id").getLong(1) === 3L && byName("id").getLong(2) === 3L)
    assert(byName("id").getLong(3) === 3L) // distinct
    assert(byName("id").getString(4) === "1" && byName("id").getString(5) === "3")
    assert(byName("tag").getLong(2) === 2L) // non-null
    assert(byName("tag").getLong(3) === 1L) // distinct
    // approx mode plans WITHOUT an Expand (single partial+final agg)
    val approx = Graft.profile(df, Seq("id", "tag"), approxDistinct = true)
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
    val exact = Graft.profile(df, Seq("id", "tag"))
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("histogram bins equi-width with edge values, nulls, and constant columns") {
    val s = spark; import s.implicits._
    // a: 0..10 → width 1, value 10 clamps into bin 9; b: constant; c: nulls skipped
    val df = (0 to 10).map(i =>
      (i.toDouble, 5.0, if (i % 2 == 0) Some(i.toDouble) else None))
      .toDF("a", "b", "c")
    val out = Graft.histogram(df, Seq("a", "b", "c"), bins = 10)
      .orderBy("col_name", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    val a = out.filter(_._1 == "a")
    assert(a.length === 10)
    assert(a.map(_._5).toSeq === Seq(1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 2L)) // 9 and 10 share bin 9
    assert(a.head._3 === 0.0 && a.head._4 === 1.0) // bin edges
    assert(a.last._3 === 9.0 && a.last._4 === 10.0)
    val b = out.filter(_._1 == "b")
    assert(b.toSeq === Seq(("b", 0L, 5.0, 5.0, 11L))) // constant → one bin, zero width
    val c = out.filter(_._1 == "c")
    assert(c.map(_._5).sum === 6L) // only the non-null evens
    // a NaN/Infinity value is skipped like a null — it cannot poison the
    // width and collapse every row into one garbage bin
    val dirty = Seq(0.0, 1.0, 2.0, Double.NaN, Double.PositiveInfinity).toDF("x")
    val h = Graft.histogram(dirty, Seq("x"), bins = 2)
      .orderBy("bin").collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(4)))
    assert(h.toSeq === Seq((0L, 0.0, 1L), (1L, 1.0, 2L))) // finite values only
  }

  // ------------------------------------------------- as-of with tolerance

  test("asofJoinTolerance matches most recent within window, ties to max tie") {
    val s = spark; import s.implicits._
    val left = Seq((1L, "k", 100L), (2L, "k", 500L), (3L, "k", 50L)).toDF("lid", "k", "ts")
    val right = Seq(
      (10L, "k", 90L), (11L, "k", 90L), // tie at ts=90 → pick p_id 11
      (12L, "k", 300L))
      .toDF("p_id", "k", "ts")
    val out = Graft.asofJoinTolerance(left, right, "k", "ts", "ts", "p_id", "p_id", 150L)
      .orderBy("lid").collect()
    // lid=1 @100: rights at 90 in [−150] window → tie → 11
    assert(out(0).getAs[Long]("asof_p_id") === 11L)
    // lid=2 @500: most recent is 300, but 500−300=200 > 150 → null
    assert(out(1).isNullAt(out(1).fieldIndex("asof_p_id")))
    // lid=3 @50: nothing strictly before → null
    assert(out(2).isNullAt(out(2).fieldIndex("asof_p_id")))
  }

  // --------------------------------------------------- weighted sampling

  test("sampleByWeight keeps everything at permille 1000 and nothing at 0") {
    val s = spark; import s.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"d$i")).toDF("id", "t")
    assert(Graft.sampleByWeight(df, col("id").cast("string"), lit(1000L)).count() === 200)
    assert(Graft.sampleByWeight(df, col("id").cast("string"), lit(0L)).count() === 0)
    val half = Graft.sampleByWeight(df, col("id").cast("string"), lit(500L)).count()
    assert(half > 60 && half < 140, s"got $half of 200 at 50%")
  }

  // --------------------------------------------------------------- audio

  test("wavSynth produces a spec-correct container wavMeta parses back") {
    val wav = Multimodal.wavSynth(7L, 1200, 16000)
    assert(wav.length === 44 + 2400)
    val Some((fmt, ch, rate, bits, n)) = Multimodal.wavMeta(wav)
    assert(fmt === 1 && ch === 1 && rate === 16000 && bits === 16 && n === 1200L)
    val Some((peak, sumSq)) = Multimodal.wavStats(wav)
    assert(peak > 0 && peak <= 32768 && sumSq > 0)
    // stats agree with the closed-form sample formula
    val expected = (0 until 1200).map { k =>
      ((7L * 2654435761L + k * 40503L) & 0xFFFFL) - 32768L
    }
    assert(peak === expected.map(math.abs).max)
    assert(sumSq === expected.map(v => v * v).sum)
  }

  test("wavMeta walks foreign chunk layouts (odd-length chunk before fmt)") {
    // hand-build: RIFF [LIST len=3 (padded)] [fmt] [data 4 samples]
    val samples = Array[Short](100, -200, 300, -32768)
    val data = java.nio.ByteBuffer.allocate(8 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    data.put("data".getBytes("ISO-8859-1")).putInt(samples.length * 2)
    samples.foreach(data.putShort)
    val fmt = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fmt.put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(44100 * 4).putShort(4).putShort(16)
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 'x', 'y', 'z', 0) // padded
    val body = list ++ fmt.array() ++ data.array()
    val buf = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ISO-8859-1")).putInt(4 + body.length)
      .put("WAVE".getBytes("ISO-8859-1")).put(body)
    val Some((f, ch, rate, bits, n)) = Multimodal.wavMeta(buf.array())
    assert(f === 1 && ch === 2 && rate === 44100 && bits === 16)
    assert(n === 2L) // 4 samples / blockAlign 4 = 2 frames
    assert(Multimodal.wavMeta("not a wav".getBytes) === None)
  }

  test("decodeAudio routes non-WAV payloads to nulls instead of dropping") {
    val s = spark; import s.implicits._
    val audio = Seq((1L, Multimodal.wavSynth(1L, 100, 8000)),
      (2L, "junk".getBytes)).toDF("doc_id", "content")
    val out = Multimodal.decodeAudio(audio).orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 8000L && out(0).getLong(2) === 100L)
    assert(out(1).isNullAt(1) && out(1).isNullAt(4))
  }

  test("scd2 opens a version only on change and closes it at the next change") {
    val s = spark; import s.implicits._
    // user 1: a a b a → versions a[1,3) b[3,4) a[4,∞); user 2: one version
    val df = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "a"), (1L, 3L, 30L, "b"),
      (1L, 4L, 40L, "a"), (2L, 5L, 15L, "x"))
      .toDF("user_id", "event_id", "us", "attr")
    val out = graft.api.Graft.scd2(df, "user_id", "us", "attr", "event_id")
      .select($"user_id", $"valid_from", $"valid_to", $"attr", $"is_current")
      .orderBy($"user_id", $"valid_from").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getString(3),
        r.getBoolean(4)))
    assert(out === Seq(
      (1L, 10L, Some(30L), "a", false),
      (1L, 30L, Some(40L), "b", false),
      (1L, 40L, None, "a", true),
      (2L, 15L, None, "x", true)))
  }

  test("scd2 treats null attribute values as real versions (null-safe change test)") {
    val s = spark; import s.implicits._
    // a → null → a: three versions, including the null period; and a key
    // that STARTS null still opens its first version
    val df = Seq(
      (1L, 1L, 10L, Some("a")), (1L, 2L, 20L, None), (1L, 3L, 30L, Some("a")),
      (2L, 4L, 5L, None), (2L, 5L, 15L, Some("x")))
      .toDF("user_id", "event_id", "us", "attr")
    val out = graft.api.Graft.scd2(df, "user_id", "us", "attr", "event_id")
      .select($"user_id", $"valid_from", $"valid_to", $"attr")
      .orderBy($"user_id", $"valid_from").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)),
        Option(r.get(3)).map(_.toString)))
    assert(out === Seq(
      (1L, 10L, Some(20L), Some("a")),
      (1L, 20L, Some(30L), None), // the null period is a version, not a gap
      (1L, 30L, None, Some("a")),
      (2L, 5L, Some(15L), None), // first version opens even when null
      (2L, 15L, None, Some("x"))))
  }

  test("hll sketch union estimate stays within its gate at sf0.001") {
    val row = SparkEntry.queries("q104_hll_union")(spark, sf0001).head
    assert(row.getBoolean(3), s"hll union gate failed: $row")
  }

  test("kmeans rejects bad arguments and empty input loudly") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      graft.api.Graft.kmeans(df, "embedding", "vec_id", k = 2, iters = 0)
    }
    intercept[IllegalArgumentException] {
      graft.api.Graft.kmeans(df.filter($"vec_id" < 0), "embedding", "vec_id", k = 2)
    }
  }

  test("skyline2d returns exactly the non-dominated set, keeping frontier duplicates") {
    val s = spark; import s.implicits._
    // points (x=cost minimized, y=value maximized):
    //  (1,5) frontier; (1,3) dominated by (1,5); (2,7) frontier;
    //  (2,7) duplicate frontier point - BOTH kept; (3,7) dominated by
    //  (2,7) (same y, higher x); (3,9) frontier; (5,9) dominated;
    //  (4,1) dominated
    val df = Seq(
      (10L, 1.0, 5), (11L, 1.0, 3), (12L, 2.0, 7), (13L, 2.0, 7),
      (14L, 3.0, 7), (15L, 3.0, 9), (16L, 5.0, 9), (17L, 4.0, 1)
    ).toDF("id", "x", "y")
    val out = graft.api.Graft.skyline2d(df, "x", "y")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(10L, 12L, 13L, 15L))
    // repartition-invariant
    val again = graft.api.Graft.skyline2d(df.repartition(5), "x", "y")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again === out)
  }

  test("cmsJoinSizeEstimate never underestimates and is exact without collisions") {
    val s = spark; import s.implicits._
    val l = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val r = Seq("a", "b", "b", "d").toDF("k")
    // exact |l join r| = 3*1 + 2*2 = 7; with width 4096 and 4 distinct
    // keys a collision among them is essentially impossible -> exact
    val out = graft.api.Graft.cmsJoinSizeEstimate(l, "k", r, "k",
      depth = 4, width = 4096).collect().head
    assert(out.getLong(1) === 7L)          // exact_join
    assert(out.getLong(0) === 7L)          // estimate collision-free
    assert(out.getBoolean(2))
    // disjoint keys -> exact 0, estimate >= 0
    val out2 = graft.api.Graft.cmsJoinSizeEstimate(
      Seq("x").toDF("k"), "k", Seq("y").toDF("k"), "k",
      depth = 4, width = 4096).collect().head
    assert(out2.getLong(1) === 0L && out2.getBoolean(2))
    // tiny width forces collisions: still an overestimate, never under
    val out3 = graft.api.Graft.cmsJoinSizeEstimate(l, "k", r, "k",
      depth = 2, width = 2).collect().head
    assert(out3.getLong(0) >= 7L && out3.getBoolean(2))
  }

  test("TopKPairAgg equals the rank window under any partial split, ties broken by id") {
    val agg = new graft.functions.TopKPairAgg(3)
    val xs = Seq((5L, 10L), (9L, 11L), (5L, 9L), (9L, 12L), (1L, 13L),
      (9L, 11L), (7L, 14L))
    // reference: v desc, id asc, multiset semantics (duplicate (9,11) kept)
    val want = xs.sortBy { case (v, i) => (-v, i) }.take(3)
    assert(xs.foldLeft(agg.zero)(agg.reduce).toSeq === want)
    for (cut <- 0 to xs.length) {
      val (l, r) = xs.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m.toSeq === want, s"cut=$cut")
    }
  }

  test("q199 plans a bounded aggregate, not a rank window over the fact rows") {
    val s = spark
    val plan = graft.SparkEntry.queries("q199_topk_agg")(s, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("Aggregate"), plan)
  }

  // ------------------------------------------------------ mann-whitney

  test("mannWhitneyU: disjoint groups give extreme U and rank_biserial ±1") {
    val s = spark; import s.implicits._
    // A = {1,2,3}, B = {4,5,6}: every B beats every A → U_A = 0
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Graft.mannWhitneyU(df, "v", "g", "a", "b").collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 0.0)              // u_a
    assert(r.getDouble(4) === -1.0)             // rank_biserial
    assert(r.getDouble(3) < -1.9)               // z ≈ -1.964 (no ties)
  }

  test("mannWhitneyU: all-tied sample yields U = nA·nB/2 and NULL z") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 7.0), ("a", 7.0), ("b", 7.0), ("b", 7.0))
      .toDF("g", "v")
    val r = Graft.mannWhitneyU(df, "v", "g", "a", "b").collect().head
    assert(r.getDouble(2) === 2.0)              // 2·2/2
    assert(r.isNullAt(3))                       // σ = 0 under total ties
    assert(r.getDouble(4) === 0.0)
  }

  test("mannWhitneyU: tie-averaged ranks match the textbook hand computation") {
    val s = spark; import s.implicits._
    // pooled: a:{1,2,2}, b:{2,3}; ranks: 1, (2+3+4)/3 = 3 for each 2, 5
    // R_A = 1 + 3 + 3 = 7 → U_A = 7 − 3·4/2 = 1
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    val r = Graft.mannWhitneyU(df, "v", "g", "a", "b").collect().head
    assert(r.getDouble(2) === 1.0)
  }

  // ------------------------------------------------------- conformal

  test("conformalAudit picks the exact ceil((n+1)(1-a)) order statistic") {
    val s = spark; import s.implicits._
    // cal residuals 1..9: k = ceil(10·0.9) = 9 → q̂ = 9.0
    val cal = (1 to 9).map(i => (i.toDouble, i.toLong)).toDF("r", "id")
    val test = Seq((5.0, 100L), (9.0, 101L), (10.0, 102L)).toDF("r", "id")
    val out = Graft.conformalAudit(cal, test, "r", "id", alpha = 0.1)
      .collect().head
    assert(out.getLong(0) === 9L && out.getLong(1) === 3L)
    assert(out.getDouble(2) === 9.0)            // qhat
    assert(out.getLong(3) === 2L)               // 5 and 9 covered, 10 not
    assert(math.abs(out.getDouble(4) - 2.0 / 3.0) < 1e-6)
  }

  test("conformalAudit: calibration too small for the level → empty result") {
    val s = spark; import s.implicits._
    // n=2, k = ceil(3·0.9) = 3 > n → no finite q̂ exists
    val cal = Seq((1.0, 1L), (2.0, 2L)).toDF("r", "id")
    val test = Seq((1.0, 3L)).toDF("r", "id")
    assert(Graft.conformalAudit(cal, test, "r", "id", alpha = 0.1)
      .count() === 0L)
  }

  // -------------------------------------------- clustering coefficient

  test("clusteringCoefficient on bridged triangles: clique corners score 1") {
    val s = spark; import s.implicits._
    val edges = Seq((1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4))
      .toDF("src", "dst")
    val out = Graft.clusteringCoefficient(edges, "src", "dst",
        minDegree = 2, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // pure-triangle corners (deg 2, 1 triangle) have cc = 1; the bridge
    // endpoints (deg 3, 1 triangle) have cc = 1/3; order cc desc, node
    assert(out.map(_._1).toSeq === Seq("1", "2", "5", "6", "3", "4"))
    assert(out.take(4).forall(_._4 === 1.0))
    assert(out.drop(4).forall(t => math.abs(t._4 - 1.0 / 3.0) < 1e-12))
  }

  // ----------------------------------------------------------- cuped

  test("cupedLift matches the hand-computed moments, lifts and rho^2") {
    val s = spark; import s.implicits._
    // y = x + 10 (+50 under treatment), x imbalanced across arms:
    // n=4, Sx=800, Sy=940, Sxx=180000, Sxy=213000, Syy=253400 →
    // θ = 100000/80000 = 1.25, naive = 310−160 = 150,
    // cuped = 150 − 1.25·100 = 25, ρ² = 1e10/(80000·130000)
    val units = Seq((100L, 110L, false), (200L, 210L, false),
      (200L, 260L, true), (300L, 360L, true)).toDF("xq", "yq", "v")
    val r = Graft.cupedLift(units, "xq", "yq", "v", scale = 1.0)
      .collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getDouble(3) === 1.25)
    assert(r.getDouble(4) === 150.0)
    assert(r.getDouble(5) === 25.0)
    assert(math.abs(r.getDouble(6) - 100000.0 * 100000.0 /
      (80000.0 * 130000.0)) < 1e-6)
  }

  test("cupedLift: zero covariate variance yields NULL theta, naive lift kept") {
    val s = spark; import s.implicits._
    val units = Seq((5L, 10L, false), (5L, 30L, true)).toDF("xq", "yq", "v")
    val r = Graft.cupedLift(units, "xq", "yq", "v", scale = 1.0)
      .collect().head
    assert(r.isNullAt(3) && r.isNullAt(5) && r.isNullAt(6))
    assert(r.getDouble(4) === 20.0)
  }

  // ---------------------------------------------------------- fs-em

  test("fsEmLearn matches a plain-Scala reference EM over the pattern table") {
    val s = spark; import s.implicits._
    // one comparator field: 120 agreeing pairs, 880 disagreeing
    val pat = Seq((true, 120L), (false, 880L)).toDF("g", "c")
    // reference: the identical nano-quantized E/M chains in plain Scala
    def ref(rounds: Int): (Long, Long, Long) = {
      var (p, m, u) = (100000000L, 800000000L, 200000000L)
      for (_ <- 1 to rounds) {
        def w(g: Boolean): Long = {
          val pm = (p / 1e9) * (if (g) m / 1e9 else 1.0 - m / 1e9)
          val pu = (1.0 - p / 1e9) * (if (g) u / 1e9 else 1.0 - u / 1e9)
          math.round(pm / (pm + pu) * 1e9)
        }
        val rows = Seq((true, 120L, w(true)), (false, 880L, w(false)))
        val sw = rows.map(r => r._2 * r._3).sum
        val suw = rows.map(r => r._2 * (1000000000L - r._3)).sum
        val mw = rows.filter(_._1).map(r => r._2 * r._3).sum
        val uw = rows.filter(_._1).map(r => r._2 * (1000000000L - r._3)).sum
        p = math.round(sw.toDouble / 1000.0)
        m = math.round(mw.toDouble / sw.toDouble * 1e9)
        u = math.round(uw.toDouble / suw.toDouble * 1e9)
      }
      (p, m, u)
    }
    for (rounds <- Seq(1, 3)) {
      val r = Graft.fsEmLearn(pat, Seq("g"), rounds = rounds).collect().head
      val (ep, em, eu) = ref(rounds)
      assert(math.abs(r.getDouble(1) - em / 1e9) < 1e-12, s"m rounds=$rounds")
      assert(math.abs(r.getDouble(2) - eu / 1e9) < 1e-12, s"u rounds=$rounds")
      assert(math.abs(r.getDouble(3) - ep / 1e9) < 1e-12, s"p rounds=$rounds")
    }
    // agreement must separate the classes: m > u after any round count
    val r3 = Graft.fsEmLearn(pat, Seq("g"), rounds = 3).collect().head
    assert(r3.getDouble(1) > r3.getDouble(2))
    assert(r3.getDouble(4) > 0.0 && r3.getDouble(5) < 0.0) // ln weights
  }

  test("fsEmLearn: boundary collapse yields NULL weights, not infinities") {
    val s = spark; import s.implicits._
    // every pair agrees: u is driven toward m, never 0/1 blowups; craft
    // a direct boundary by an all-false field instead
    val pat = Seq((false, 100L)).toDF("g", "c")
    val r = Graft.fsEmLearn(pat, Seq("g"), rounds = 4).collect().head
    // m and u collapse to 0 (no agreeing mass at all) → w_agree NULL
    assert(r.isNullAt(4), r.toString)
  }

  // ------------------------------------------------- target encoding

  test("targetEncode: smoothed LOO means, prior fallback for unmatched keys") {
    val s = spark; import s.implicits._
    val df = Seq((Option("a"), true), (Option("a"), false),
      (Option("b"), true), (Option.empty[String], true)).toDF("k", "y")
    val out = Graft.targetEncode(df, "k", "y", smoothing = 1.0)
      .collect().map(r => (Option(r.getString(0)), r.getBoolean(1),
        r.getDouble(2))).toSet
    val prior = 3.0 / 4.0
    assert(out.contains((Some("a"), true, (1.0 - 1.0 + prior) / 2.0)))
    assert(out.contains((Some("a"), false, (1.0 - 0.0 + prior) / 2.0)))
    assert(out.contains((Some("b"), true, (1.0 - 1.0 + prior) / 1.0)))
    assert(out.contains((None, true, prior))) // null key → pure prior
  }

  test("targetEncode rejects zero smoothing (singleton divide-by-zero)") {
    val s = spark; import s.implicits._
    val df = Seq(("a", true)).toDF("k", "y")
    intercept[IllegalArgumentException] {
      Graft.targetEncode(df, "k", "y", smoothing = 0.0)
    }
  }

  // --------------------------------------------------- kaplan-meier

  test("kaplanMeier reproduces the textbook product-limit curve") {
    val s = spark; import s.implicits._
    // deaths at 1 (n=4), 2 (n=3, one censored alongside), 3 (n=1):
    // S = 3/4, 3/4·2/3 = 1/2, then d = n → exactly 0
    val df = Seq((1L, 1L), (2L, 1L), (2L, 0L), (3L, 1L)).toDF("dur", "obs")
    val out = Graft.kaplanMeier(df, "dur", "obs")
      .orderBy("duration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((1L, 1L, 4L), (2L, 1L, 3L), (3L, 1L, 1L)))
    assert(math.abs(out(0)._4 - 0.75) < 1e-6)
    assert(math.abs(out(1)._4 - 0.5) < 1e-6)
    assert(out(2)._4 === 0.0)
  }

  test("kaplanMeier: all-censored input has no curve rows") {
    val s = spark; import s.implicits._
    val df = Seq((5L, 0L), (7L, 0L)).toDF("dur", "obs")
    assert(Graft.kaplanMeier(df, "dur", "obs").count() === 0L)
  }

  // ------------------------------------------------------- ablation

  test("ablateGroups: leave-one-group-out means from one aggregate") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 10L), ("a", 20L), ("b", 40L)).toDF("g", "v")
    val out = Graft.ablateGroups(df, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(out("a") === ((2L, 15.0, 40.0, 40.0 - 70.0 / 3.0)))
    assert(out("b") === ((1L, 40.0, 15.0, 15.0 - 70.0 / 3.0)))
  }

  test("ablateGroups: a group covering every row ablates to NULL, not /0") {
    val s = spark; import s.implicits._
    val df = Seq(("only", 1L), ("only", 3L)).toDF("g", "v")
    val r = Graft.ablateGroups(df, "g", "v").collect().head
    assert(r.getDouble(2) === 2.0 && r.isNullAt(3) && r.isNullAt(4))
  }

  // ------------------------------------------------------ best split

  test("bestSplit finds the perfect separator with gain ln 2") {
    val s = spark; import s.implicits._
    val df = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("v", "y")
    val r = Graft.bestSplit(df, "v", "y").collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 2.0)              // threshold: x <= 2
    assert(r.getLong(3) === 2L && r.getLong(4) === 0L)
    assert(math.abs(r.getDouble(5) - math.log(2.0)) < 1e-9)
  }

  test("bestSplit: one-class input has zero gain and the smallest threshold") {
    val s = spark; import s.implicits._
    val df = Seq((5.0, true), (3.0, true), (9.0, true)).toDF("v", "y")
    val r = Graft.bestSplit(df, "v", "y").collect().head
    assert(r.getDouble(2) === 3.0 && r.getDouble(5) === 0.0)
  }

  // -------------------------------------------------------- hilbert

  test("hilbertIndex is a bijection on [0,32)² and consecutive cells are adjacent") {
    // bijection: every d in [0, 1024) hit exactly once; the DEFINING
    // Hilbert property (which Morton lacks): |Δ| between consecutive
    // curve positions is always exactly 1 grid step
    val idx = for (x <- 0 until 32; y <- 0 until 32)
      yield (graft.functions.HilbertKernels.xy2d(5, x, y), (x, y))
    assert(idx.map(_._1).sorted === (0L until 1024L))
    val byD = idx.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump between d-consecutive cells ($x1,$y1)→($x2,$y2)")
    }
    // coordinates above the grid are masked, not wrapped into errors
    assert(graft.functions.HilbertKernels.xy2d(5, 32 + 3, 7) ===
      graft.functions.HilbertKernels.xy2d(5, 3, 7))
    // SQL surface coerces INT literals (interpreted eval under
    // ConstantFolding would CCE without ImplicitCastInputTypes)
    val s = spark
    graft.functions.GraftFunctions.register(s)
    assert(s.sql("SELECT hilbert_index(3, 7, 8)").collect().head.getLong(0)
      === graft.functions.HilbertKernels.xy2d(8, 3L, 7L))
  }

  test("hilbertOrderBy plans one range exchange and keeps all rows") {
    val s = spark; import s.implicits._
    val df = (0 until 1000).map(i => (i.toLong % 50L, (i * 7L) % 50L, i.toLong))
      .toDF("x", "y", "id")
    val h = Graft.hilbertOrderBy(df, "x", "y", order = 6, partitions = 4)
    val plan = h.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(h.count() === 1000)
    assert(h.columns.toSeq === Seq("x", "y", "id"))
  }

  // ----------------------------------------------------- modularity

  test("modularity matches the hand computation on two bridged triangles") {
    val s = spark; import s.implicits._
    // triangles {1,2,3} and {4,5,6} + bridge 3-4: m=7, within=6,
    // d_c = 2+2+3 = 7 each → Q = 6/7 − 2·49/(4·49) = 6/7 − 1/2
    val edges = Seq((1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4))
      .toDF("src", "dst")
    val labels = Seq((1, "t1"), (2, "t1"), (3, "t1"),
      (4, "t2"), (5, "t2"), (6, "t2")).toDF("node", "lab")
    val r = Graft.modularity(edges, "src", "dst", labels).collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 6L)
    assert(r.getLong(2) === 7L && r.getLong(3) === 6L)
    assert(math.abs(r.getDouble(4) - (6.0 / 7.0 - 0.5)) < 1e-12)
  }

  test("modularity canonicalizes double-entered edges and handles the null case") {
    val s = spark; import s.implicits._
    // every edge entered both ways + a self-loop + a null: same Q
    val fwd = Seq((1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4))
    val noisy = (fwd ++ fwd.map(_.swap) ++ Seq((1, 1)))
      .toDF("src", "dst")
      .unionAll(Seq((null.asInstanceOf[Integer], Integer.valueOf(2)))
        .toDF("src", "dst"))
    val labels = Seq((1, "t1"), (2, "t1"), (3, "t1"),
      (4, "t2"), (5, "t2"), (6, "t2")).toDF("node", "lab")
    val r = Graft.modularity(noisy, "src", "dst", labels).collect().head
    assert(r.getLong(2) === 7L)
    assert(math.abs(r.getDouble(4) - (6.0 / 7.0 - 0.5)) < 1e-12)
  }

  // ------------------------------------------------- benjamini-hochberg

  test("benjaminiHochberg reproduces the textbook step-up q-values") {
    val s = spark; import s.implicits._
    // p = .01 .02 .03 .04 .20 (m=5): raw p·m/i = .05 .05 .05 .05 .20 →
    // suffix-min q = .05 ×4, .20; discoveries at α=.05 are the first 4
    val df = Seq(("t1", 10000L), ("t2", 20000L), ("t3", 30000L),
      ("t4", 40000L), ("t5", 200000L)).toDF("k", "p_micro")
    val out = Graft.benjaminiHochberg(df, "p_micro", Seq("k"), alpha = 0.05)
      .orderBy("p_rank").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.map(_._3).toSeq === Seq(0.05, 0.05, 0.05, 0.05, 0.2))
    assert(out.map(_._4).toSeq === Seq(true, true, true, true, false))
    // q is monotone non-decreasing in rank by construction
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq)
  }

  test("benjaminiHochberg: q never exceeds 1 and equal p breaks ties by key") {
    val s = spark; import s.implicits._
    val df = Seq(("b", 900000L), ("a", 900000L), ("c", 100L)).toDF("k", "p_micro")
    val out = Graft.benjaminiHochberg(df, "p_micro", Seq("k"), alpha = 0.05)
      .orderBy("p_rank").collect().map(r => (r.getString(0), r.getDouble(3)))
    assert(out.map(_._1).toSeq === Seq("c", "a", "b")) // deterministic order
    assert(out.forall(_._2 <= 1.0))
  }

  // ------------------------------------------------------ k-anonymity

  test("kAnonymityAudit groups classes by size with worst-case diversity") {
    val s = spark; import s.implicits._
    // classes: (x,1) size 3 with 2 distinct sensitive values;
    // (y,1) and (y,2) singletons with 1 each
    val df = Seq(
      ("x", 1, "s1"), ("x", 1, "s1"), ("x", 1, "s2"),
      ("y", 1, "s1"), ("y", 2, "s3")).toDF("qa", "qb", "sens")
    val out = Graft.kAnonymityAudit(df, Seq("qa", "qb"), "sens", k = 2)
      .orderBy("class_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq === Seq((1L, 2L, 2L, 1L, true), (3L, 1L, 3L, 2L, false)))
  }

  test("kAnonymityAudit rejects k < 2 and empty quasiCols") {
    val s = spark; import s.implicits._
    val df = Seq(("x", "s")).toDF("qa", "sens")
    intercept[IllegalArgumentException] {
      Graft.kAnonymityAudit(df, Seq("qa"), "sens", k = 1)
    }
    intercept[IllegalArgumentException] {
      Graft.kAnonymityAudit(df, Seq.empty, "sens", k = 5)
    }
  }

  // ------------------------------------------------- isotonic (PAV)

  test("isotonicCalibrate reproduces the sequential PAV fit") {
    val s = spark; import s.implicits._
    // unit-weight cells with raw rates 1,0,1,0,1,1 → classic PAV pools
    // the first four to 0.5 and keeps the final two at 1
    val df = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L), (5L, 1L), (6L, 1L))
      .toDF("score", "y")
    val out = Graft.isotonicCalibrate(df, "score", "y")
      .orderBy("score").collect().map(_.getDouble(4))
    assert(out.toSeq === Seq(0.5, 0.5, 0.5, 0.5, 1.0, 1.0))
  }

  test("isotonicCalibrate pools by weight and preserves label mass") {
    val s = spark; import s.implicits._
    // score 10 has two positive rows, 20 one negative, 30 one positive:
    // rates 1,0,1 → pool (10,20) at weight 3 → 2/3, 2/3, 1
    val df = Seq((10L, 1L), (10L, 1L), (20L, 0L), (30L, 1L))
      .toDF("score", "y")
    val rows = Graft.isotonicCalibrate(df, "score", "y")
      .orderBy("score").collect()
    val fit = rows.map(_.getDouble(4))
    assert(fit(0) === 2.0 / 3.0 && fit(1) === 2.0 / 3.0 && fit(2) === 1.0)
    // monotone, and Σ n·fit = Σ pos (PAV preserves the label mass)
    assert(fit.toSeq === fit.sorted.toSeq)
    val mass = rows.map(r => r.getLong(1) * r.getDouble(4)).sum
    assert(math.abs(mass - 3.0) < 1e-12)
  }

  test("isotonicCalibrate trips the maxCells guard on unquantized scores") {
    val s = spark; import s.implicits._
    val df = (1 to 50).map(i => (i.toLong, i.toLong % 2)).toDF("score", "y")
    intercept[IllegalArgumentException] {
      Graft.isotonicCalibrate(df, "score", "y", maxCells = 10)
    }
  }

  // ------------------------------------------------------- huber mean

  test("huberMean resists the outlier the plain mean follows") {
    val s = spark; import s.implicits._
    val df = ((1 to 10).map(_ => ("a", 1.0)) :+ (("a", 1000.0)))
      .toDF("g", "v")
    // plain mean ≈ 91.8; huber at $1 scale pulls the outlier's weight to
    // ~k·s/|x−μ| and lands near 1
    val r = Graft.huberMean(df, "v", "g", scaleCents = 100, rounds = 3)
      .collect().head
    assert(r.getLong(1) === 11L)
    assert(r.getLong(2) >= 1L)            // the outlier is downweighted
    assert(r.getDouble(3) < 5.0, r.getDouble(3))
    intercept[IllegalArgumentException] {
      Graft.huberMean(df, "v", "g", scaleCents = 0)
    }
  }

  test("huberMean is exact on constant data: no downweighting, mean = value") {
    val s = spark; import s.implicits._
    val df = (1 to 8).map(_ => ("a", 7.25)).toDF("g", "v")
    val r = Graft.huberMean(df, "v", "g", scaleCents = 100).collect().head
    assert(r.getLong(2) === 0L && r.getDouble(3) === 7.25)
  }

  // ---------------------------------------------------- stratified ate

  test("stratifiedAte estimates within strata and size-weights the overall") {
    val s = spark; import s.implicits._
    // low stratum (cv 1-2): treated 10 vs control 6 → ate 4
    // high stratum (cv 9-10): treated 100 vs control 90 → ate 10
    // overall = (2·4 + 2·10)/4 = 7 — NOT the naive pooled gap
    val u = Seq(
      (1L, 1L, 1L, 10.0), (2L, 2L, 0L, 6.0),
      (3L, 9L, 1L, 100.0), (4L, 10L, 0L, 90.0))
      .toDF("id", "cv", "t", "v")
    val out = Graft.stratifiedAte(u, "cv", "t", "v", "id", strata = 2)
      .orderBy("stratum").collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(out(0L) === 4.0 && out(1L) === 10.0)
    assert(math.abs(out(-1L) - 7.0) < 1e-9)
  }

  test("ipwAte shrinks toward zero vs stratified under Laplace smoothing") {
    val s = spark; import s.implicits._
    // same 2-strata data as the stratified spec (true weighted ATE 7):
    // smoothing ê = (1+1)/(2+2) = 0.5 per arm → term = 2·(sum_t − sum_c)
    // per stratum → ate = (2·4 + 2·10)/4 = 7 here (balanced arms keep
    // HT == stratified); imbalance is what separates them
    val u = Seq(
      (1L, 1L, 1L, 10.0), (2L, 2L, 0L, 6.0),
      (3L, 9L, 1L, 100.0), (4L, 10L, 0L, 90.0))
      .toDF("id", "cv", "t", "v")
    val r = Graft.ipwAte(u, "cv", "t", "v", "id", strata = 2).collect().head
    assert(r.getLong(0) === 4L && math.abs(r.getDouble(1) - 7.0) < 1e-9)
    // one-armed stratum now CONTRIBUTES (treated-only low stratum):
    // low: st=22, sc=0, n_t=2,n_c=0 → term = 22·4/3 ≈ 29.33; high as
    // before → term = 2·10 = 20 per its arithmetic... assert it runs
    // and stays finite instead of dropping rows
    val u2 = Seq(
      (1L, 1L, 1L, 10.0), (2L, 2L, 1L, 12.0),
      (3L, 9L, 1L, 100.0), (4L, 10L, 0L, 90.0))
      .toDF("id", "cv", "t", "v")
    val r2 = Graft.ipwAte(u2, "cv", "t", "v", "id", strata = 2).collect().head
    assert(r2.getLong(0) === 4L && !r2.isNullAt(1))
  }

  test("markovEval learns the train argmax and scores the held-out half") {
    val s = spark; import s.implicits._
    // user 1 (train rows even id): a->b, b->a, a->b ; user 2 (eval):
    // a->b (correct), b->b (wrong: policy says b->a)
    val e = Seq(
      (1L, 2L, "a", 10L), (1L, 4L, "b", 20L), (1L, 6L, "a", 30L),
      (1L, 8L, "b", 40L),
      (2L, 1L, "a", 10L), (2L, 3L, "b", 20L), (2L, 5L, "b", 30L))
      .toDF("user_id", "event_id", "event_type", "us")
    val out = Graft.markovEval(e, "user_id", Seq("us", "event_id"),
        "event_type", col("event_id") % 2 === 0)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") === (("b", 1L, 1L)))   // a->b predicted, correct
    assert(out("b") === (("a", 1L, 0L)))   // b->a predicted, eval saw b->b
  }

  test("fairnessAudit flags groups under 4/5 of the best rate exactly") {
    val s = spark; import s.implicits._
    // rates: g1 10/10, g2 8/10 (exactly 4/5 — NOT a violation),
    // g3 7/10 (violation)
    val rows = (1 to 10).map(i => ("g1", 1L)) ++
      (1 to 10).map(i => ("g2", if (i <= 8) 1L else 0L)) ++
      (1 to 10).map(i => ("g3", if (i <= 7) 1L else 0L))
    val out = Graft.fairnessAudit(rows.toDF("grp", "sel"), "grp", "sel")
      .collect().map(r => r.getString(0) -> (r.getDouble(4), r.getBoolean(5)))
      .toMap
    assert(out("g1") === ((1.0, false)))
    assert(out("g2")._1 === 0.8 && !out("g2")._2) // boundary: >= 4/5 passes
    assert(out("g3")._2 === true)
  }

  test("bestF1Threshold finds the perfect separator and ties to lower t") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("scq", "y")
    val r = Graft.bestF1Threshold(df, "scq", "y").collect().head
    assert(r.getLong(0) === 3L && r.getDouble(6) === 1.0)
    assert(r.getLong(1) === 2L && r.getLong(2) === 0L && r.getLong(3) === 0L)
    // all-positive data: every threshold has precision 1; F1 maxes at
    // full recall, tie broken to the LOWEST threshold
    val all = Seq((5L, 1L), (7L, 1L)).toDF("scq", "y")
    val r2 = Graft.bestF1Threshold(all, "scq", "y").collect().head
    assert(r2.getLong(0) === 5L && r2.getDouble(5) === 1.0)
  }

  test("itemCooccurrence ranks by cosine co-occurrence and guards mega-baskets") {
    val s = spark; import s.implicits._
    val b = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"),
      (3L, "C")).toDF("bk", "it")
    val out = Graft.itemCooccurrence(b, "bk", "it", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getDouble(4))).toMap
    // c_A=3 c_B=2 c_C=1; AB=2, AC=1 → sim(A,B)=2/√6, sim(A,C)=1/√3
    assert(out(("A", 1L))._1 === "B" && out(("A", 2L))._1 === "C")
    assert(math.abs(out(("A", 1L))._3 - 2.0 / math.sqrt(6.0)) < 1e-9)
    assert(out(("B", 1L))._1 === "A" && out(("C", 1L))._1 === "A")
    // a basket over the cap fails LOUDLY instead of going quadratic
    val mega = (1 to 5).map(i => (9L, s"i$i")).toDF("bk", "it")
    val ex = intercept[Exception] {
      Graft.itemCooccurrence(b.unionAll(mega), "bk", "it", k = 2,
        maxBasket = 3).collect()
    }
    assert(ex.getMessage != null)
  }

  test("stlDecompose recovers a planted trend + weekly pattern exactly") {
    val s = spark; import s.implicits._
    // y = 100 + (t mod 7 == 0 ? 7 : 0): constant trend 101, spike phase 0
    val rows = (0L until 28L).map(t =>
      ("a", t, 100L + (if (t % 7 == 0) 7L else 0L)))
    val out = Graft.stlDecompose(rows.toDF("k", "t", "y"), "k", "t", "y")
      .orderBy("t").collect()
    // first/last 3 days: NULL trend and residual
    assert(out.take(3).forall(_.isNullAt(3)) && out.takeRight(3).forall(_.isNullAt(3)))
    // interior: every 7-day window contains exactly one spike → trend = 101
    val interior = out.drop(3).dropRight(3)
    assert(interior.forall(_.getDouble(3) === 101.0))
    // seasonal: phase 0 = +6, others −1 (detrended means), residual 0
    val byPhase = interior.map(r => (r.getLong(1) % 7, r.getDouble(4))).toMap
    assert(byPhase(0L) === 6.0 && byPhase(1L) === -1.0)
    assert(interior.forall(r => math.abs(r.getDouble(5)) < 1e-9))
  }

  test("pitJoin matches the version valid at ts with [from, to) boundary semantics") {
    val s = spark; import s.implicits._
    val vers = Seq(
      ("u1", 10L, Some(20L), "A"),
      ("u1", 20L, None, "B")
    ).toDF("k", "valid_from", "valid_to", "attr")
    val facts = Seq(
      ("u1", 1L, 15L),  // inside [10, 20) -> A
      ("u1", 2L, 20L),  // exactly at the boundary -> the NEW version B
      ("u1", 3L, 5L),   // before any version -> NULL enrichment
      ("u2", 4L, 15L)   // keyless -> NULL enrichment
    ).toDF("k", "fid", "ts")
    val out = graft.api.Graft.pitJoin(facts, vers, "k", "ts",
        "valid_from", "valid_to", Seq("attr"))
      .orderBy("fid").collect()
      .map(r => (r.getLong(1), Option(r.getString(4))))
    assert(out.toSeq === Seq((1L, Some("A")), (2L, Some("B")),
      (3L, None), (4L, None)))
    // loud-failure guards: reserved facts columns and payload/facts
    // name collisions error instead of emitting ambiguous output
    intercept[IllegalArgumentException] {
      graft.api.Graft.pitJoin(facts.withColumnRenamed("fid", "version_from"),
        vers, "k", "ts", "valid_from", "valid_to", Seq("attr"))
    }
    intercept[IllegalArgumentException] {
      graft.api.Graft.pitJoin(facts, vers.withColumnRenamed("attr", "ts"),
        "k", "ts", "valid_from", "valid_to", Seq("ts"))
    }
  }

  test("q264 unicode hygiene: NFC savings equal combining-mark injections exactly") {
    val s = spark
    val rows = graft.operators.Quality.queries("q264_unicode_hygiene")(s, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every injected combining acute composes with its base 'a' under
      // NFC, so codepoints saved == combining marks counted
      assert(r.getLong(3) === r.getLong(4),
        s"cp_saved_nfc ${r.getLong(3)} != n_combining ${r.getLong(4)} for ${r.getString(0)}")
      // the confusable Cyrillic injection must be visible to the script
      // counter wherever any doc contained an 'e'
      assert(r.getLong(5) >= 0L && r.getLong(1) > 0L)
    }
  }

  test("basketEdges artifact: bucketed, shuffle-free on src, identical to the inline join") {
    val s = spark; import s.implicits._
    val art = graft.operators.Analytics.basketEdges(s, sf0001)
    val li = s.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
    val inline = li.alias("x").join(li.alias("y"),
        $"x.ok" === $"y.ok" && $"x.pk" < $"y.pk")
      .select($"x.pk".as("src"), $"y.pk".as("dst"))
    // the artifact holds the exact multiset the inline join produces
    val a = art.groupBy("src", "dst").count().orderBy("src", "dst").collect()
    val b = inline.groupBy("src", "dst").count().orderBy("src", "dst").collect()
    assert(a.toSeq === b.toSeq)
    // bucketBy(16, src): a src-keyed aggregation plans with NO Exchange —
    // the whole point of the artifact (graph rounds re-key on src)
    val agg = art.groupBy($"src").count()
    agg.collect()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      "src aggregation over the bucketed edge artifact must not shuffle")
    // second call reuses the catalog table instead of rebuilding
    val again = graft.operators.Analytics.basketEdges(s, sf0001)
    assert(again.queryExecution.analyzed.toString ===
      art.queryExecution.analyzed.toString)
  }

  test("materializeBucketed: distinct names get distinct tables; build runs once per name") {
    val s = spark; import s.implicits._
    var builds = 0
    def mk(n: Int) = graft.api.Graft.materializeBucketed(s, s"mb_spec_$n", "k", 4) {
      builds += 1
      Seq((1L, n.toLong), (2L, n.toLong)).toDF("k", "v")
    }
    val a = mk(1); val b = mk(2)
    // the collision test VERDICT asked for: two different logical names
    // (e.g. two data dirs) must resolve to two different digest tables
    // serving their OWN data — never a silent wrong-artifact read
    assert(a.select(sum($"v")).as[Long].head() === 2L)
    assert(b.select(sum($"v")).as[Long].head() === 4L)
    assert(builds === 2)
    mk(1).collect(); mk(2).collect()
    assert(builds === 2, "repeat calls must reuse, not rebuild")
    // artifact files live under the session warehouse in a per-process
    // subdir — the multi-JVM-race-proof location
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest("mb_spec_1".getBytes("UTF-8")).take(8).map(x => f"$x%02x").mkString
    val meta = s.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(s"graft_art_$digest"))
    assert(meta.location.toString
      .contains(s"graft_artifacts_${ProcessHandle.current().pid()}"))
  }

  test("stratifiedAte/ipwAte reject a fractional covariate instead of truncating") {
    val s = spark; import s.implicits._
    // a fractional propensity-like covariate would truncate to 0 under
    // the LongType cast and collapse every unit into one stratum
    val u = Seq((1L, 0.1, 1L, 10.0), (2L, 0.9, 0L, 6.0))
      .toDF("id", "cv", "t", "v")
    val e1 = intercept[IllegalArgumentException] {
      Graft.stratifiedAte(u, "cv", "t", "v", "id", strata = 2)
    }
    assert(e1.getMessage.contains("pre-quantized"))
    val e2 = intercept[IllegalArgumentException] {
      Graft.ipwAte(u, "cv", "t", "v", "id", strata = 2)
    }
    assert(e2.getMessage.contains("pre-quantized"))
  }

  test("stratifiedAte: a one-armed stratum reports NULL and leaves the overall") {
    val s = spark; import s.implicits._
    val u = Seq(
      (1L, 1L, 1L, 10.0), (2L, 2L, 1L, 12.0), // low stratum: treated only
      (3L, 9L, 1L, 100.0), (4L, 10L, 0L, 90.0))
      .toDF("id", "cv", "t", "v")
    val rows = Graft.stratifiedAte(u, "cv", "t", "v", "id", strata = 2)
      .orderBy("stratum").collect()
    val byStratum = rows.map(r => r.getLong(0) -> r).toMap
    assert(byStratum(0L).isNullAt(5))              // no control arm
    assert(byStratum(-1L).getDouble(5) === 10.0)   // only the high stratum
    assert(byStratum(-1L).getLong(1) === 1L && byStratum(-1L).getLong(2) === 1L)
  }

  // ---------------------------------------------------------------- rmst

  test("rmst integrates the KM step function and clamps at tau") {
    val s = spark; import s.implicits._
    // death at t=2 (S drops to 0.5), censored at 5: ∫₀⁴ = 2·1 + 2·0.5 = 3
    val df = Seq((2L, 1L), (5L, 0L)).toDF("dur", "obs")
    val r = Graft.rmst(df, "dur", "obs", tau = 4L).collect().head
    assert(r.getLong(0) === 4L && r.getDouble(2) === 3.0)
    // horizon before the first death: S = 1 throughout → rmst = tau
    val r2 = Graft.rmst(df, "dur", "obs", tau = 1L).collect().head
    assert(r2.getDouble(2) === 1.0)
  }

  // -------------------------------------------------------------- delong

  test("aucDeLong matches the hand-computed variance with ties") {
    val s = spark; import s.implicits._
    // pos {1, 3}, neg {2, 2}: AUC = 0.5; V10 = {0, 1} → S10 = 0.5;
    // V01 = {0.5, 0.5} → S01 = 0; Var = 0.5/2 = 0.25, se = 0.5
    val df = Seq((1.0, 1L), (3.0, 1L), (2.0, 0L), (2.0, 0L)).toDF("s", "y")
    val r = Graft.aucDeLong(df, "s", "y").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.5 && r.getDouble(3) === 0.5)
    assert(r.getDouble(4) === -0.48 && r.getDouble(5) === 1.48)
  }

  test("aucDeLong: a single-member class yields NULL se/CI, not a crash") {
    val s = spark; import s.implicits._
    val df = Seq((1.0, 1L), (3.0, 1L), (2.0, 0L)).toDF("s", "y")
    val r = Graft.aucDeLong(df, "s", "y").collect().head
    assert(r.getDouble(2) === 0.5)
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  // ---------------------------------------------------------------- aipw

  test("aipwAte repairs the misspecified outcome model back to the " +
    "stratified truth (raw propensities); smoothing breaks the identity") {
    val s = spark; import s.implicits._
    // strata: low (cv 1-2) gap 4, high (cv 9-10) gap 10 → stratified 7.
    // Global arm means are badly biased (μ1−μ0 = 40−62 = −22): the AIPW
    // corrections (+78, +96 dollars) must rebuild exactly 7.
    val u = Seq(
      (1L, 1L, 1L, 10.0), (2L, 1L, 1L, 10.0), (3L, 2L, 0L, 6.0),
      (4L, 9L, 1L, 100.0), (5L, 9L, 0L, 90.0), (6L, 10L, 0L, 90.0))
      .toDF("id", "cv", "t", "v")
    val rows = Graft.aipwAte(u, "cv", "t", "v", "id", strata = 2)
      .orderBy("stratum").collect()
    val by = rows.map(r => r.getLong(0) -> r).toMap
    assert(by(0L).getDouble(4) === 78.0)   // low-stratum correction
    assert(by(1L).getDouble(4) === 96.0)   // high-stratum correction
    assert(by(-1L).getDouble(5) === 7.0)   // raw AIPW == stratified overall
    assert(by(-1L).getDouble(6) === -5.888889) // smoothed variant differs
    val strat = Graft.stratifiedAte(u, "cv", "t", "v", "id", strata = 2)
      .filter(col("stratum") === -1L).collect().head.getDouble(5)
    assert(math.abs(by(-1L).getDouble(5) - strat) < 1e-6)
  }

  test("aipwAte: a one-armed stratum is NULL in raw, kept in smoothed") {
    val s = spark; import s.implicits._
    val u = Seq(
      (1L, 1L, 1L, 10.0), (2L, 2L, 1L, 12.0), // low: treated only
      (3L, 9L, 1L, 100.0), (4L, 10L, 0L, 90.0))
      .toDF("id", "cv", "t", "v")
    val rows = Graft.aipwAte(u, "cv", "t", "v", "id", strata = 2)
      .orderBy("stratum").collect()
    val by = rows.map(r => r.getLong(0) -> r).toMap
    assert(by(0L).isNullAt(4))             // raw correction NULL
    assert(!by(-1L).isNullAt(5) && !by(-1L).isNullAt(6))
  }

  // ------------------------------------------------------------ log-rank

  test("logRank matches the hand-computed Mantel statistic with censoring") {
    val s = spark; import s.implicits._
    // treat (grp 1): deaths at t=1, t=2; control: death at t=1,
    // censored at t=3.
    //  t=1: r=4, r1=2, d=2, d1=1 → O−E = 1 − 2·2/4 = 0,
    //       V = 2·2·2·2/(16·3) = 1/3
    //  t=2: r=2, r1=1, d=1, d1=1 → O−E = 1 − 1/2 = 0.5, V = 1/(4·1)
    // ΣOE = 0.5, ΣV = 7/12, Z = 0.5/√0.583333333 = 0.654654
    val u = Seq((1L, 1L, 1L), (2L, 1L, 1L), (1L, 1L, 0L), (3L, 0L, 0L))
      .toDF("dur", "obs", "grp")
    val r = Graft.logRank(u, "dur", "obs", "grp").collect().head
    assert(r.getLong(0) === 2L)               // death times
    assert(r.getLong(1) === 2L && r.getLong(2) === 1L)
    assert(r.getDouble(3) === 0.5)            // O − E
    assert(r.getDouble(4) === 0.583333)       // variance (nano-quantized)
    assert(r.getDouble(5) === 0.654654)       // Z
    assert(r.getDouble(6) === 0.428571)       // χ²
  }

  test("logRank: a one-group population has zero variance and NULL Z") {
    val s = spark; import s.implicits._
    val u = Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 0L, 1L))
      .toDF("dur", "obs", "grp")
    val r = Graft.logRank(u, "dur", "obs", "grp").collect().head
    assert(r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }
}
