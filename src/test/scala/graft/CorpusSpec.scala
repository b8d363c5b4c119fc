package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft

/** Round-4 corpus-prep operators: chunking, vocabulary, per-group caps,
  * stratified sampling, int8 quantization, cross-doc n-grams. */
class CorpusSpec extends AnyFunSuite {
  import TestSpark._

  test("chunkDocs covers every character with the configured overlap") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "")).toDF("id", "txt")
    val out = Graft.chunkDocs(df, "txt", chunkSize = 4, overlap = 1)
      .orderBy("id", "chunk_id")
      .select("id", "chunk_id", "chunk_start", "chunk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // stride 3: starts 1,4,7,10; final chunk may be short; empty doc drops
    assert(out === Seq(
      (1L, 0L, 1L, "abcd"), (1L, 1L, 4L, "defg"),
      (1L, 2L, 7L, "ghij"), (1L, 3L, 10L, "j"),
      (2L, 0L, 1L, "xy")))
    // reassembling chunk prefixes of length `stride` reproduces the doc
    val re = out.filter(_._1 == 1L).map(_._4.take(3)).mkString
    assert(re.startsWith("abcdefghij".take(9)) && out.filter(_._1 == 1L).last._4 == "j")
  }

  test("vocabulary counts lowercase alnum tokens with deterministic ties") {
    val s = spark; import s.implicits._
    val df = Seq("The cat, the CAT; a dog!", "a b a").toDF("txt")
    val out = Graft.vocabulary(df, "txt", topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // counts: a=3, the=2, cat=2, b=1, dog=1 → top3 = a, cat, the (tie n=2 by token)
    assert(out === Seq(("a", 3L), ("cat", 2L), ("the", 2L)))
  }

  test("capPerGroup keeps top-k per group with deterministic tie-break") {
    val s = spark; import s.implicits._
    val df = Seq(("s1", 1L, 10L), ("s1", 2L, 30L), ("s1", 3L, 30L),
      ("s2", 4L, 5L)).toDF("src", "id", "len")
    val out = Graft.capPerGroup(df, "src", Seq(col("len").desc, col("id")), 2)
      .orderBy("src", "rk").select("src", "id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out === Seq(("s1", 2L, 1L), ("s1", 3L, 2L), ("s2", 4L, 1L)))
  }

  test("stratifiedSample yields exactly k per stratum, stable under repartition") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Graft.stratifiedSample(docs, "lang", "doc_id", 7)
      .select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val b = Graft.stratifiedSample(docs.repartition(13), "lang", "doc_id", 7)
      .select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(a === b) // determinism: hash rank, not RNG
    val perLang = a.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ == 7))
  }

  test("quantizeInt8 emits symmetric int8 codes and handles zero vectors") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Seq(1.0f, -0.5f, 0.25f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Graft.quantizeInt8(df, "embedding").orderBy("vec_id")
      .select("maxabs", "codes").collect()
    assert(out(0).getDouble(0) === 1.0)
    assert(out(0).getSeq[Long](1) === Seq(127L, -63L, 32L))
    assert(out(1).getDouble(0) === 0.0)
    assert(out(1).getSeq[Long](1) === Seq(0L, 0L))
    // codes stay in int8 range by construction
    assert(out.flatMap(_.getSeq[Long](1)).forall(c => c >= -128 && c <= 127))
  }

  test("tfidf ranks rare-but-frequent-in-doc tokens first") {
    val s = spark; import s.implicits._
    // "zebra" appears twice in doc 1 and nowhere else; "common" is in all
    // docs (idf = ln(1) = 0, never ranks above a positive score)
    val df = Seq((1L, "zebra zebra common alpha"), (2L, "common beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val toks = df.select($"doc_id",
        explode(split(lower($"text"), "[^a-z0-9]+")).as("token"))
      .filter($"token" =!= "")
    val tf = toks.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val total = df.agg(count(lit(1)).as("n_total"))
    val top = tf.join(dfreq, "token").crossJoin(broadcast(total))
      .withColumn("score", $"tf" * log($"n_total".cast("double") / $"df".cast("double")))
      .filter($"doc_id" === 1L).orderBy($"score".desc, $"token")
      .select("token").as[String].collect()
    assert(top.head === "zebra")       // tf=2, idf=ln(3)
    assert(top.last === "common")      // idf=0 ⇒ score 0
  }

  test("label centroids average embeddings exactly per dimension") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Seq(1.0f, 3.0f), 7), (2L, Seq(3.0f, 5.0f), 7),
      (3L, Seq(10.0f, 20.0f), 8)).toDF("vec_id", "embedding", "label")
    val out = df.select($"label", posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg(count(lit(1)).as("n"),
        sum(round($"x".cast("double") * lit(1000000.0)).cast("long")).as("sm"))
      .select($"label", $"pos", ($"sm".cast("double") / lit(1000000.0) / $"n").as("mean"))
      .orderBy($"label", $"pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(out === Seq((7, 0, 2.0), (7, 1, 4.0), (8, 0, 10.0), (8, 1, 20.0)))
  }

  test("chunkDocs invariant: stride-prefixes reassemble every generated doc") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (1L to 60L).map(i =>
      (i, rnd.alphanumeric.take(rnd.nextInt(400) + 1).mkString))
    val df = docs.toDF("id", "txt")
    val byDoc = Graft.chunkDocs(df, "txt", chunkSize = 50, overlap = 13)
      .select("id", "chunk_id", "chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    docs.foreach { case (id, txt) =>
      val chunks = byDoc(id)
      // every chunk but the last is full-size or the doc tail
      val rebuilt = chunks.init.map(_.take(50 - 13)).mkString + chunks.last
      assert(rebuilt === txt, s"doc $id")
    }
  }

  test("quantizeInt8 invariant: dequantization error is within half a step") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1L to 40L).map(i =>
      (i, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 20f))).toDF("vec_id", "embedding")
    val rows = Graft.quantizeInt8(df, "embedding")
      .selectExpr("embedding", "maxabs", "codes").collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0); val m = r.getDouble(1); val c = r.getSeq[Long](2)
      val step = m / 127.0
      v.zip(c).foreach { case (x, code) =>
        assert(math.abs(x.toDouble - code * step) <= step / 2 + 1e-9,
          s"x=$x code=$code m=$m")
      }
    }
  }

  test("capPerGroupSalted equals the plain window cap on generated skewed data") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    // one hot group with 300 rows, many small ones
    val rows = (1L to 300L).map(i => ("hot", i, rnd.nextInt(50).toLong)) ++
      (301L to 400L).map(i => (s"g${i % 7}", i, rnd.nextInt(50).toLong))
    val df = rows.toDF("src", "id", "score")
    val ord = Seq(col("score").desc, col("id"))
    val plain = Graft.capPerGroup(df, "src", ord, 20)
      .select("src", "id", "rk").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val salted = Graft.capPerGroupSalted(df, "src", ord, 20, saltOn = col("id"))
      .select("src", "id", "rk").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(salted === plain) // identical rows AND ranks
  }

  test("gapFill spine covers exactly [min,max] per key with nulls off-support") {
    val s = spark; import s.implicits._
    val df = Seq((1L, 10L, "a"), (1L, 13L, "b"), (2L, 5L, "c")).toDF("k", "d", "v")
    val out = Graft.gapFill(df, "k", "d").orderBy("k", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
    assert(out === Seq(
      (1L, 10L, Some("a")), (1L, 11L, None), (1L, 12L, None), (1L, 13L, Some("b")),
      (2L, 5L, Some("c"))))
  }

  test("temperatureMix flattens quotas by sqrt(n) and caps at the source size") {
    val s = spark; import s.implicits._
    // A: 9 docs (weight 3), B: 1 doc (weight 1) → tot 4; target 8 →
    // quota A = floor(8·3/4) = 6, quota B = floor(8·1/4) = 2 but B only
    // has one doc. Without temperature A would get ~7.2 of 8.
    val df = ((1L to 9L).map(i => ("A", i)) ++ Seq(("B", 100L)))
      .toDF("source", "doc_id")
    val out = Graft.temperatureMix(df, "source", "doc_id", totalTarget = 8L)
      .groupBy("source").agg(count(lit(1)).as("n"), max(col("quota")).as("q"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("A") === ((6L, 6L)))
    assert(out("B") === ((1L, 2L))) // quota 2, only 1 doc exists
    // determinism: same kept set under repartition
    val a = Graft.temperatureMix(df, "source", "doc_id", 8L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Graft.temperatureMix(df.repartition(7), "source", "doc_id", 8L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
  }

  test("cross-doc repeated 8-grams find the shared span and only it") {
    val s = spark; import s.implicits._
    val shared = "one two three four five six seven eight"
    val df = Seq((1L, s"prefix $shared"), (2L, s"$shared suffix"),
      (3L, "totally different words with no overlap at all")).toDF("doc_id", "text")
    val sh = Graft.shingles(df, "text", "doc_id", 8)
    val common = sh.groupBy("s").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).collect()
    assert(common.map(_.getString(0)).toSet ===
      Set("one two three four five six seven eight".split(' ').mkString("\u0000")))
  }

  test("KmvAgg keeps the k smallest distinct values under any insert/merge order") {
    val agg = new graft.functions.KmvAgg(4)
    val xs = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 7L, 5L)
    // sequential insertion
    val seq1 = xs.foldLeft(agg.zero)(agg.reduce)
    assert(seq1.toSeq === Seq(1L, 2L, 3L, 5L))
    // split into partials at every cut point, then merge - same sketch
    for (cut <- 0 to xs.length) {
      val (l, r) = xs.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m.toSeq === Seq(1L, 2L, 3L, 5L), s"cut=$cut")
    }
    // below-k group: sketch IS the distinct set
    assert(Seq(5L, 5L, 2L).foldLeft(agg.zero)(agg.reduce).toSeq === Seq(2L, 5L))
  }

  test("KMV union sketch of two sketches equals the sketch of the set union") {
    val agg = new graft.functions.KmvAgg(8)
    val a = (1 to 40).map(i => (i * 2654435761L) & Long.MaxValue)
    val b = (25 to 70).map(i => (i * 2654435761L) & Long.MaxValue)
    val ska = a.foldLeft(agg.zero)(agg.reduce)
    val skb = b.foldLeft(agg.zero)(agg.reduce)
    // k smallest of (ska union skb) = sketch built from the raw union
    val mergedFromSketches = (ska ++ skb).distinct.sorted.take(8)
    val fromRaw = (a ++ b).foldLeft(agg.zero)(agg.reduce).toSeq
    assert(mergedFromSketches.toSeq === fromRaw)
    // and membership of a union-sketch element in side A is decidable
    // from ska alone: every union-sketch element of A is below A's tau
    val tauA = ska.last
    assert(fromRaw.filter(a.contains).forall(h => h <= tauA && ska.contains(h)))
  }

  test("kmvSourceOverlap is exact in the below-k regime and repartition-invariant") {
    val s = spark; import s.implicits._
    val docs = Seq(
      ("s1", "alpha beta gamma delta epsilon zeta"),
      ("s1", "eta theta iota kappa"),
      ("s2", "gamma delta epsilon zeta eta theta"),
      ("s3", "unrelated words entirely here now")).toDF("source", "text")
    val out = Graft.kmvSourceOverlap(docs, "text", "source")
      .orderBy("source_a", "source_b").collect()
    assert(out.length === 3)
    val r12 = out.find(r => r.getString(0) == "s1" && r.getString(1) == "s2").get
    // below k => est_union is the exact union size, est_inter = rho exactly
    assert(r12.getLong(2) < 128) // ku below k
    assert(r12.getDouble(5) === r12.getLong(2).toDouble) // est_union == ku
    assert(r12.getDouble(6) === r12.getLong(4).toDouble) // est_inter == rho
    // s1/s2 trigram overlap: gamma-delta-epsilon and delta-epsilon-zeta
    // (s2's zeta-eta-theta spans what is a doc boundary in s1, so no more)
    assert(r12.getLong(4) === 2L)
    val again = Graft.kmvSourceOverlap(docs.repartition(7), "text", "source")
      .orderBy("source_a", "source_b").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("negativeSample draws are deterministic, in-domain, and drop self-collisions") {
    val s = spark; import s.implicits._
    val docs = (0L until 20L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val out = graft.api.Graft.negativeSample(docs, "id", 3, Seq("src"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // every draw lands in [0, 20) and never equals its anchor
    assert(out.forall { case (a, _, neg, _) => neg >= 0 && neg < 20 && neg != a })
    // payload is the partner's, not the anchor's
    assert(out.forall { case (_, _, neg, src) => src == s"src${neg % 3}" })
    // at most k draws per anchor (self-collisions drop, never redraw)
    val perAnchor = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perAnchor.values.forall(n => n >= 1 && n <= 3))
    assert(out.length <= 60 && out.length > 50) // few drops at N=20
    // pure function of (anchor, j): identical under repartition
    val again = graft.api.Graft.negativeSample(docs.repartition(7), "id", 3, Seq("src"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.sortBy(t => (t._1, t._2)).toSeq === again.sortBy(t => (t._1, t._2)).toSeq)
    // anchorFilter restricts anchors but draws from the full pool
    val filtered = graft.api.Graft.negativeSample(docs, "id", 3, Seq("src"),
      anchorFilter = col("id") < 2)
    assert(filtered.select("anchor_id").distinct().collect()
      .map(_.getLong(0)).toSet.subsetOf(Set(0L, 1L)))
    // the dense-domain contract is enforced in-plan (r9): sparse ids
    // would silently deflate negatives per anchor via the partner join
    val sparse = Seq(0L, 1L, 5L).map(i => (i, "x")).toDF("id", "src")
    val ex = intercept[Exception] {
      graft.api.Graft.negativeSample(sparse, "id", 2, Seq("src")).count()
    }
    assert(ex.getMessage.contains("dense [0, N)"), ex.getMessage)
  }

  test("q208 epoch shuffle: balanced shards, epoch reshuffle, repartition-stable") {
    val out = SparkEntry.queries("q208_epoch_shuffle")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = out.count(_._1 == 0L)
    assert(nDocs > 0 && out.length === 2 * nDocs)
    // md5 spreads docs across the 8 shards: every shard non-empty, no
    // shard hoards more than 3x the fair share at 500 docs
    val byShard = out.filter(_._1 == 0L).groupBy(_._3).view.mapValues(_.length)
    assert(byShard.size === 8)
    assert(byShard.values.max <= 3 * nDocs / 8)
    // positions are contiguous 1..n within each (epoch, shard)
    out.groupBy(t => (t._1, t._3)).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq === (1 to g.length).map(_.toLong))
    }
    // the epoch is in the hash: epoch 1 is a genuinely different order
    val e0 = out.filter(_._1 == 0L).sortBy(t => (t._3, t._4)).map(_._2).toSeq
    val e1 = out.filter(_._1 == 1L).sortBy(t => (t._3, t._4)).map(_._2).toSeq
    assert(e0 !== e1)
    assert(e0.toSet === e1.toSet) // same corpus, different order
  }

  test("hrwAssign moves keys only INTO a newly added shard, via a shuffle-free projection") {
    val s = spark; import s.implicits._
    val ids = (0L until 2000L).toDF("id")
    val a = graft.api.Graft.hrwAssign(
      graft.api.Graft.hrwAssign(ids, "id", 5, "s5"), "id", 6, "s6")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every assignment in range
    assert(a.forall { case (_, s5, s6) => s5 >= 0 && s5 < 5 && s6 >= 0 && s6 < 6 })
    // the HRW invariant: a key either stays put or moves to the NEW shard
    assert(a.forall { case (_, s5, s6) => s6 == s5 || s6 == 5 })
    // movement is near 1/6 of keys, never a full reshuffle
    val moved = a.count { case (_, s5, s6) => s5 != s6 }
    assert(moved > 200 && moved < 500, s"moved=$moved")
    // assignment is a pure projection: no Exchange in the plan
    val plan = graft.api.Graft.hrwAssign(ids, "id", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // NULL id -> NULL shard, never a silent -1
    val withNull = graft.api.Graft.hrwAssign(
      Seq(Some(1L), None).toDF("id"), "id", 5).collect()
    assert(withNull.find(_.isNullAt(0)).exists(_.isNullAt(1)))
    assert(withNull.find(!_.isNullAt(0)).exists(r => r.getLong(1) >= 0 && r.getLong(1) < 5))
  }

  test("weightedChoice lands each draw in exactly its interval's item") {
    val s = spark; import s.implicits._
    // cumulative line over token order: a [0,1), b [1,3), c [3,10)
    val items = Seq(("a", 1L), ("b", 2L), ("c", 7L), ("z", 0L))
      .toDF("token", "wq")
    // one draw per line position (hash == u because u = h % 10), plus
    // h=10 wrapping back to u=0
    val draws = (0L to 10L).map(h => (h, h)).toDF("draw_id", "h")
    val out = graft.api.Graft.weightedChoice(items, "token", "wq",
        draws, "h", buckets = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === 11) // every draw resolved to exactly one item
    assert(out(0L) === "a" && out(10L) === "a")
    assert(out(1L) === "b" && out(2L) === "b")
    assert((3L to 9L).forall(out(_) === "c"))
    assert(!out.values.toSet.contains("z")) // zero weight never drawn
  }
}
