package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Util._

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * q27 — brute-force cosine top-k: the correctness baseline. Query vectors
  *   (vec_id % 100 == 0) are broadcast; each partition of the base table
  *   scores its rows against all queries (no shuffle of the base table,
  *   work O(n_base * n_query)), then a per-query top-k window.
  *   All arithmetic is double precision, and the DuckDB oracle uses the
  *   structurally identical expression so ranks agree.
  *
  * q28 — banded sign-bit LSH ANN (lshSearch): the data-independent scale
  *   path; a base row is scored for a query iff they share one of 96
  *   7-bit random-hyperplane sign bands. Approximate vs exact KNN, but
  *   fully deterministic AND partition-invariant → golden-pinned as a
  *   hard hash gate (r9).
  *
  * q43 — IVF coarse-quantizer ANN (golden-pinned like q28); q46 — a recall gate that emits
  *   recall@10 of both approximate paths vs exact as query output, so the
  *   driver pins ANN quality each round despite the missing SQL twin.
  *
  * Scale notes (100 TB): brute force distributes perfectly but costs
  * O(n*q); the banded-LSH/IVF variants cut candidates by the band/probe
  * selectivity with a single bucket-equality shuffle join and tunable
  * recall (measured by q46: IVF nprobe=8 ≈ 0.82, LSH 96×7 ≈ 0.88–0.96,
  * PQ ≈ 0.8, re-ranked PQ = 1.0 mean recall@10 — this testdata's
  * neighbors sit at cos 0.3–0.6, where bucketing is inherently hard; see
  * q44's ρ note).
  */
object Similarity {

  // Native codegen'd kernel (graft.functions.VecDot) — the HOF
  // aggregate(zip_with(...)) form is interpreted per element and melts
  // under all-pairs workloads. Same left-to-right double accumulation, so
  // values are bit-identical to the oracle's list_dot_product(DOUBLE[]).
  private val dotExpr = "vec_dot(v, qv)"
  private val norm2Expr = "vec_dot(v, v)"

  /** IVF coarse quantizer: a few Lloyd iterations over a driver-side
    * sample (deterministic — fixed seed, ordered sample), centroids
    * broadcast to executors. Training is O(sample × nlist × iters) on the
    * driver; at 100 TB you train on a sample the same way and only the
    * assignment pass (map-side, no shuffle) touches the full corpus. */
  private[operators] def trainCentroids(
      sample: Array[Array[Double]], nlist0: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "IVF training requires a non-empty sample")
    val nlist = math.min(nlist0, sample.length) // fewer rows than lists: clamp
    val dim = sample.head.length
    var centroids = sample.take(nlist).map(_.clone)
    for (_ <- 1 to iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Int](nlist)
      for (v <- sample) {
        var best = 0; var bestD = Double.MaxValue
        for (c <- centroids.indices) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - centroids(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(nlist)(c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c)))
    }
    centroids
  }

  private[operators] def nearestCentroids(
      v: Array[Double], centroids: Array[Array[Double]], n: Int): Array[Int] =
    centroids.indices.map { c =>
      var d = 0.0; var j = 0
      while (j < v.length) { val t = v(j) - centroids(c)(j); d += t * t; j += 1 }
      (d, c)
    }.sortBy(x => (x._1, x._2)).take(n).map(_._2).toArray

  /** q234 oracle: the MMR greedy unrolled to `k` chained CTE rounds —
    * candidate pool and pair sims nano-quantized exactly like the Spark
    * side, each round a correlated MAX over the selected-so-far union. */
  private def mmrSql(k: Int): String = {
    val steps = (1 to k).map { r =>
      val prev = if (r == 1) "sel0" else s"sel${r - 1}"
      s"""sc$r AS MATERIALIZED (
         |  SELECT c.id, c.relq,
         |    COALESCE((SELECT MAX(s.simq) FROM sim s
         |      WHERE s.ia = c.id AND s.ib IN (SELECT id FROM $prev)), 0) AS msq
         |  FROM cand c WHERE c.id NOT IN (SELECT id FROM $prev)),
         |pick$r AS MATERIALIZED (
         |  SELECT $r AS rnk, id, relq, msq, 7 * relq - 3 * msq AS mmrq
         |  FROM sc$r ORDER BY mmrq DESC, id LIMIT 1),
         |sel$r AS MATERIALIZED (SELECT id FROM $prev UNION ALL SELECT id FROM pick$r)""".stripMargin
    }.mkString(",\n")
    val picks = (1 to k).map(r => s"SELECT * FROM pick$r")
      .mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
       |cand AS MATERIALIZED (
       |  SELECT vec_id AS id,
       |    CAST(ROUND(list_dot_product(e.v, qv.q)
       |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qv.q, qv.q)))
       |      * 1000000000.0) AS BIGINT) AS relq,
       |    e.v AS v
       |  FROM e CROSS JOIN qv WHERE e.vec_id <> 0
       |  ORDER BY relq DESC, id LIMIT 30),
       |sim AS MATERIALIZED (
       |  SELECT a.id AS ia, b.id AS ib,
       |    CAST(ROUND(list_dot_product(a.v, b.v)
       |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
       |      * 1000000000.0) AS BIGINT) AS simq
       |  FROM cand a JOIN cand b ON a.id <> b.id),
       |sel0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS id WHERE FALSE),
       |$steps
       |SELECT CAST(rnk AS BIGINT) AS rank, id AS vec_id,
       |  CAST(relq AS DOUBLE) / 1000000000.0 AS rel,
       |  CAST(msq AS DOUBLE) / 1000000000.0 AS max_sim_prev,
       |  CAST(mmrq AS DOUBLE) / 10000000000.0 AS mmr
       |FROM ($picks) ORDER BY rank""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    // ---- q234: MMR diversification — the re-rank layer between
    // retrieval and consumption (Carbonell & Goldstein 1998): the
    // vec_id=0 embedding queries the corpus, top-30 by cosine form the
    // candidate pool, and the greedy λ=0.7 integer-exact MMR chain
    // picks 10 results that are relevant AND mutually distinct. ----
    "q234_mmr_rerank" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings").select($"vec_id", $"embedding".as("v"))
        .withColumn("nrm", sqrt(expr(norm2Expr)))
      val q = e.filter($"vec_id" === 0L)
        .select($"v".as("qv"), $"nrm".as("qn"))
      val cand = e.filter($"vec_id" =!= 0L).crossJoin(broadcast(q))
        .withColumn("rel", expr(dotExpr) / ($"nrm" * $"qn"))
        .withColumn("relq", round($"rel" * lit(1.0e9)).cast(LongType))
        .orderBy($"relq".desc, $"vec_id")
        .limit(30)
        .select($"vec_id", $"rel", $"v".as("embedding"))
      graft.api.Graft.mmrRerank(cand, "vec_id", "rel", "embedding",
          k = 10, lambdaTenths = 7)
        .orderBy(col("rank"))
    }),

    // ---- q238: hard-negative mining — for each anchor (every 50th
    // vector), the 5 most-similar vectors with a DIFFERENT label:
    // semantically close but known-distinct, the negatives that train
    // contrastive embedding models (random draws go trivial after the
    // first epochs). Label inequality rides the join condition; sims
    // nano-quantized before the rank. ----
    "q238_hard_negatives" -> ((s, dir) => {
      import s.implicits._
      graft.api.Graft.hardNegatives(t(s, dir, "embeddings"), "vec_id",
          "embedding", "label", k = 5, anchorFilter = $"vec_id" % 50 === 0)
        .withColumn("sim_r", round($"sim", 4)).drop("sim")
        .orderBy($"qid", $"rnk")
    }),

    // ---- q240: embedding-space decontamination — the semantic layer
    // q58's n-gram rules cannot see: every train vector (labels 0-4)
    // reports its nearest eval vector (label 9) and is flagged when the
    // cosine clears 0.35. Clean rows keep their best match un-flagged,
    // so the output doubles as the near-miss audit. ----
    "q240_semantic_decontamination" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      graft.api.Graft.semanticDecontaminate(
          e.filter($"label" <= 4), e.filter($"label" === 9),
          "embedding", "vec_id", threshold = 0.35)
        .withColumn("top_cos_r", round($"top_cos", 4)).drop("top_cos")
        .orderBy($"train_id")
    }),

    // ---- q241: reciprocal nearest neighbors — mutual top-1 pairs
    // across the q206 label split: the hubness-proof high-precision
    // alignment rule (a hub is many items' top-1 but has one top-1
    // itself), the strict sibling of q206's margin rule. ----
    "q241_reciprocal_nn" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      graft.api.Graft.reciprocalNearestNeighbors(
          e.filter($"label" === 0), e.filter($"label" === 1),
          "embedding", "vec_id")
        .withColumn("cos_r", round($"cos", 4)).drop("cos")
        .orderBy($"a_id")
    }),

    // ---- q27: brute-force cosine top-10 per query vector ----
    "q27_knn_cosine" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding".as("v"))
        .withColumn("nrm", sqrt(expr(norm2Expr)))
      val q = e.filter($"vec_id" % 100 === 0)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
      e.join(broadcast(q), $"vec_id" =!= $"qid")
        .withColumn("sim", expr(dotExpr) / ($"nrm" * $"qn"))
        .withColumn("rnk", row_number().over(w).cast(LongType))
        .filter($"rnk" <= 10)
        .select($"qid", $"rnk", $"vec_id".as("nid"), round($"sim", 4).as("sim_r"))
        .orderBy($"qid", $"rnk")
    }),

    // ---- q331: exact KNN-Shapley data valuation (Jia et al., VLDB'19
    // Thm 1) — the per-example "what is this training point WORTH to
    // the K-NN classifier?" closed form the influence family (TracIn
    // q286, EL2N q276, RHO q308) approximates with proxies. For each
    // probe vector, train points sorted by cosine get the exact
    // recursion s_N = 1[y_N=y]/N, s_j = s_{j+1} + (1[y_j=y] −
    // 1[y_{j+1}=y])/max(j,K) — here expressed as a suffix SUM over
    // nano-quantized per-rank terms (the rank-N base value rides as the
    // last "term", so one window cumsum IS the recursion). Probe count
    // is DERIVED (vec_id % max(100, n div 10) = 0 ⇒ ≤ ~10 probes at any
    // scale — the q321 modulus lesson), so total work is ~10·n: linear.
    // Ranks are decided by the q27 double-cosine + vec_id tie-break;
    // every value that decides output rows (terms, suffix sums, top-20
    // cut) is an exact long. The per-probe ranking window holds one
    // probe's train ordering (the q176 dimension-window class — at
    // cluster scale this becomes a range-partitioned sort per probe,
    // ~10 of them, each fully parallel until the cumsum tail). ----
    "q331_knn_shapley" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding".as("v"), $"label")
        .withColumn("nrm", sqrt(expr(norm2Expr)))
      val na = e.agg(count(lit(1)).as("n_all"))
        .withColumn("md", greatest(lit(100L), expr("n_all div 10")))
      val q = e.crossJoin(broadcast(na)).filter($"vec_id" % $"md" === 0L)
        .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn"),
          $"label".as("qlabel"))
      val nq = q.agg(count(lit(1)).as("n_queries"))
      val train = e.crossJoin(broadcast(na)).filter($"vec_id" % $"md" =!= 0L)
        .select($"vec_id", $"v", $"nrm", $"label")
      val ntr = train.agg(count(lit(1)).as("n_train"))
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"sim".desc, $"vec_id")
      val wLead = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"rnk")
      val wSuffix = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"rnk".desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val ranked = train.crossJoin(broadcast(q))
        .withColumn("sim", expr(dotExpr) / ($"nrm" * $"qn"))
        .withColumn("eq",
          when($"label" === $"qlabel", lit(1L)).otherwise(lit(0L)))
        .select($"qid", $"vec_id", $"eq",
          row_number().over(wRank).cast(LongType).as("rnk"))
        .crossJoin(broadcast(ntr))
      val terms = ranked.withColumn("eqn", lead($"eq", 1).over(wLead))
        .withColumn("__t", when($"eqn".isNull,
          round($"eq".cast(DoubleType) / $"n_train".cast(DoubleType) *
            lit(1.0e9)).cast(LongType))
          .otherwise(round(($"eq" - $"eqn").cast(DoubleType) /
            greatest($"rnk", lit(5L)).cast(DoubleType) * lit(1.0e9))
            .cast(LongType)))
      terms.withColumn("s_nano", sum($"__t").over(wSuffix))
        .groupBy($"vec_id").agg(sum($"s_nano").as("sum_nano"))
        .orderBy($"sum_nano".desc, $"vec_id").limit(20)
        .crossJoin(broadcast(nq)).crossJoin(broadcast(ntr))
        .select($"vec_id", $"sum_nano", $"n_queries", $"n_train",
          round($"sum_nano".cast(DoubleType) / lit(1.0e9) /
            $"n_queries".cast(DoubleType), 6).as("shapley"))
        .orderBy($"sum_nano".desc, $"vec_id")
    }),

    // ---- q44: embedding-cosine near-dup pairs (the 5th dedup method) ----
    // Exact at threshold 0.45 via the block-partitioned distributed
    // self-join (Graft.cosineNearDupPairsExact) — work spread evenly over
    // block-pair reducers, shuffle ∝ n·blocks, NOTHING broadcast (the
    // round-1 plan broadcast the whole table: driver-OOM at scale). The
    // testdata's planted pairs sit at cos 0.45–0.6, where sign-bit LSH
    // provably cannot prune (p = 1 − θ/π ≈ 0.65 ⇒ ρ ≈ 0.63), so the
    // honest scale story is an even quadratic; the bucket-first path
    // (Graft.cosineNearDupPairs) is the scale plan for real near-dup
    // thresholds (≥ ~0.8) and is pair-set-equality-tested in GraftApiSpec.
    "q44_dedup_embedding_cosine" -> ((s, dir) => {
      import s.implicits._
      graft.api.Graft.cosineNearDupPairsExact(
        t(s, dir, "embeddings"), "embedding", "vec_id", threshold = 0.45)
        .select($"va", $"vb", round($"cos", 4).as("cos_r"))
        .orderBy($"va", $"vb")
    }),

    // ---- q43: IVF-bucketed ANN top-10 (golden-pinned hash gate) ----
    "q43_ann_ivf" -> ((s, dir) => {
      import s.implicits._
      ivfSearch(t(s, dir, "embeddings"),
        t(s, dir, "embeddings").filter($"vec_id" % 100 === 0),
        "embedding", "vec_id", k = 10, nlist = 16, nprobe = 4)
        .orderBy($"qid", $"rnk")
    }),

    // ---- q28: LSH-bucketed approximate top-5 (golden-pinned hash gate) ----
    "q28_ann_lsh_bucketed" -> ((s, dir) => {
      import s.implicits._
      lshSearch(t(s, dir, "embeddings"),
        t(s, dir, "embeddings").filter($"vec_id" % 100 === 0),
        "embedding", "vec_id", k = 5)
        .orderBy($"qid", $"rnk")
    }),

    // ---- q206: margin-based bitext/pair mining (the LASER/CCMatrix
    // alignment rule): for every source-side vector (label 0) find its
    // best and second-best cosine match on the target side (label 1)
    // and keep pairs whose best-vs-runner-up MARGIN clears 0.02 — the
    // standard defense against hubness (a vector that is everyone's
    // generic neighbor never clears the margin). Built on cosineTopK
    // (k = 2): base never broadcast, parallelism-floored scoring, and
    // the same double-precision expression shape as the q27 oracle so
    // raw sims agree bit-for-bit before rounding. Scale path for 100 TB
    // query sets: swap cosineTopK for pqSearchReranked — the margin
    // pivot/filter is unchanged. ----
    "q206_bitext_mining" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val a = e.filter($"label" === 0)
      val b = e.filter($"label" === 1)
      // excludeSelf = false: the sides are independently-numbered sets —
      // an id collision across labels is two different rows, and the
      // brute-force oracle scores ALL |A|×|B| pairs (review finding)
      val top2 = graft.api.Graft.cosineTopK(b, a, "embedding", "vec_id", 2,
        excludeSelf = false)
      top2.groupBy($"qid").agg(
          max(when($"rnk" === 1L, $"nid")).as("match_id"),
          max(when($"rnk" === 1L, $"sim")).as("s1"),
          max(when($"rnk" === 2L, $"sim")).as("s2"))
        .filter($"s2".isNotNull)
        .withColumn("margin_r", round($"s1" - $"s2", 4))
        .filter($"margin_r" >= 0.02)
        .select($"qid".as("src_id"), $"match_id",
          round($"s1", 4).as("best_sim"), round($"s2", 4).as("second_sim"),
          $"margin_r")
        .orderBy($"src_id")
    }),

    // ---- q262: Matryoshka truncation RECALL — q196's energy audit
    // answers "how much vector survives truncation?"; this answers the
    // question that actually matters downstream: "does the truncated
    // index still RETRIEVE the same neighbors?" — top-10 cosine overlap
    // of prefix-dim search (32/16/8 of 64) vs the full-dim exact top-10,
    // the go/no-go number for serving MRL embeddings at a smaller dim.
    // Full DuckDB oracle (brute force replays both sides); recall means
    // are exact-integer Σhits over a fixed k=10 denominator — no double
    // aggregation anywhere. ----
    "q262_matryoshka_recall" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val dims = Seq(64, 32, 16, 8)
      // ONE brute-force pass scores all four prefix dots (a prefix dot
      // costs a slice, not a second corpus scan); the checkpointed
      // (qid, nid, sim64..sim8) table then feeds all four rankings —
      // 1× the O(n·q) join instead of 4×. Same SMALL-QUERIES CONTRACT
      // as pqSearch: the query set is driver-bounded by construction.
      val withN = dims.foldLeft(
          t(s, dir, "embeddings").select($"vec_id", $"embedding".as("v"))) {
        (df, d) => df.withColumn(s"nrm$d",
          sqrt(expr(s"vec_dot(slice(v, 1, $d), slice(v, 1, $d))")))
      }
      val dp = s.sparkContext.defaultParallelism
      val b = if (withN.rdd.getNumPartitions < dp)
        withN.repartition(dp, $"vec_id") else withN
      val q = withN.filter($"vec_id" % 100 === 0)
        .select($"vec_id".as("qid") +: $"v".as("qv") +:
          dims.map(d => col(s"nrm$d").as(s"qn$d")): _*)
      val scored = b.join(broadcast(q), $"vec_id" =!= $"qid")
        .select($"qid" +: $"vec_id".as("nid") +: dims.map(d =>
          (expr(s"vec_dot(slice(v, 1, $d), slice(qv, 1, $d))") /
            (col(s"nrm$d") * col(s"qn$d"))).as(s"sim$d")): _*)
        .localCheckpoint()
      def top10(d: Int): org.apache.spark.sql.DataFrame = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"qid").orderBy(col(s"sim$d").desc, $"nid")
        scored.withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 10).select($"qid", $"nid")
      }
      val exact = top10(64).localCheckpoint()
      def leg(d: Int): org.apache.spark.sql.DataFrame = {
        val hits = exact.join(top10(d), Seq("qid", "nid"), "left_semi")
          .groupBy($"qid").agg(count(lit(1)).as("h"))
        exact.select($"qid").distinct()
          .join(hits, Seq("qid"), "left").na.fill(0L, Seq("h"))
          .agg(count(lit(1)).as("n_queries"),
            sum($"h").as("__sh"), min($"h").as("__mh"))
          .select(lit(d.toLong).as("dim"), $"n_queries",
            (round($"__sh".cast("double") /
              ($"n_queries".cast("double") * lit(10.0)), 4) + lit(0.0))
              .as("mean_recall"),
            (round($"__mh".cast("double") / lit(10.0), 4) + lit(0.0))
              .as("min_recall"))
      }
      leg(32).unionAll(leg(16)).unionAll(leg(8)).orderBy($"dim")
    }),

    // ---- q46: ANN recall gate — recall@10 of every approximate path vs
    // the exact brute-force top-10, emitted AS DATA and golden-pinned
    // (r10) to a VALUES oracle the same way q28/q43 are: every input is
    // deterministic (md5 hyperplanes, orderBy-limit training samples,
    // seeded codebooks) and the output is partition-invariant (verified
    // local[3] vs local[8] bit-for-bit; spec'd in IvfSpec).
    // Per-method floors sit at measured-minus-margin so a real recall
    // regression flips `pass` to false instead of hiding under one loose
    // global bar. The AUTHORITATIVE measured values are the r10 golden
    // pin in this file's VALUES oracle below (sf0.01: lsh 0.88, pq 0.84)
    // plus IvfSpec — recapture BOTH together if the inputs ever change. ----
    // ---- q355: sign-bit (1-bit) embedding compression audit — the
    // extreme point of the compression family (int8 q67/q324, PQ,
    // matryoshka q196/q262): 64 float dims → ONE 64-bit signature
    // (32× smaller), candidates ranked by Hamming distance, recall@10
    // scored against the exact cosine top-10 (the q46 gate's method
    // applied to binarization). Signatures are order-free integer sums
    // of power-of-two terms over micro-quantized signs (two 32-bit
    // halves, the q193 long-safe device); recall/means come from exact
    // integer hit counts — no float average ever crosses engines. ----
    "q355_signbit_audit" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "embeddings")
      // derived-modulus probe set (r13; the fixed % 100 fraction made
      // #probes ∝ n — the sf3 rung measured 10.2× on 3× data): ~50
      // probes at any scale, identical to % 100 below 5000 vectors
      val cntQ = base.agg(count(lit(1)).as("__n"))
      val qsv = base.crossJoin(broadcast(cntQ))
        .filter($"vec_id" % greatest(lit(100L), expr("__n div 50")) === 0)
        .drop("__n")
      val exact = graft.api.Graft.cosineTopK(base, qsv, "embedding",
          "vec_id", 10)
        .select($"qid", $"nid").localCheckpoint()
      val dims = base.select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("i0", "x")))
        .select(col("vec_id"), (col("i0") + 1).cast(LongType).as("i"),
          round(col("x").cast(DoubleType) * lit(1.0e6)).cast(LongType)
            .as("xq"))
      val sig = dims.groupBy(col("vec_id")).agg(
          sum(when(col("i") <= 32L && col("xq") > 0L,
            expr("cast(power(2.0, 32 - i) as long)")).otherwise(0L)).as("lo"),
          sum(when(col("i") > 32L && col("xq") > 0L,
            expr("cast(power(2.0, 64 - i) as long)")).otherwise(0L)).as("hi"))
        .localCheckpoint() // feeds the probe slice and the scan side
      val qsig = sig.crossJoin(broadcast(cntQ))
        .filter(col("vec_id") % greatest(lit(100L), expr("__n div 50")) === 0)
        .select(col("vec_id").as("qid"), col("lo").as("qlo"),
          col("hi").as("qhi"))
      val ham = sig.join(broadcast(qsig), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
           bit_count(col("hi").bitwiseXOR(col("qhi")))).cast(LongType)
            .as("h"))
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("h"), col("nid"))
      val atop = ham.withColumn("rnk", row_number().over(wq))
        .filter(col("rnk") <= 10)
        .localCheckpoint() // |q|·10 rows; feeds hits + the hamming mean
      val hits = exact.join(atop.select($"qid", $"nid"),
          Seq("qid", "nid"), "left_semi")
        .groupBy($"qid").agg(count(lit(1)).as("hh"))
      val per = exact.groupBy($"qid").agg(count(lit(1)).as("nn"))
        .join(hits, Seq("qid"), "left").na.fill(0L, Seq("hh"))
      val hamAgg = atop.agg(sum(col("h")).as("__sh"),
        count(lit(1)).as("__nh"))
      per.agg(count(lit(1)).as("n_queries"), sum($"hh").as("__h"),
          min($"hh").as("__m"), sum($"nn").as("__n"))
        .crossJoin(broadcast(hamAgg))
        .select(col("n_queries"),
          round(col("__h").cast(DoubleType) / col("__n").cast(DoubleType), 4)
            .as("mean_recall"),
          round(col("__m").cast(DoubleType) / lit(10.0), 4).as("min_recall"),
          round(col("__sh").cast(DoubleType) / col("__nh").cast(DoubleType),
            4).as("mean_hamming_top10"))
    }),

    // ---- q358: MRR of the compressed ranking — WHERE does compression
    // put the one answer that matters? q355's recall@10 scores the set;
    // MRR (the standard first-relevant-rank metric) scores the
    // POSITION of the exact cosine top-1 inside the full Hamming
    // ranking. Rank is an exact integer (row_number by (h, nid) over
    // the same signature scan), reciprocal ranks are micro-quantized
    // by INTEGER division (1000000 div rank — no float average), and a
    // not-found probe contributes 0 by contract (dormant here: the
    // ranking is total). ----
    "q358_mrr_compressed" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "embeddings")
      // derived-modulus probes — see q355 (scale-free probe count)
      val cntQ = base.agg(count(lit(1)).as("__n"))
      val qsv = base.crossJoin(broadcast(cntQ))
        .filter($"vec_id" % greatest(lit(100L), expr("__n div 50")) === 0)
        .drop("__n")
      val top1 = graft.api.Graft.cosineTopK(base, qsv, "embedding",
          "vec_id", 1)
        .select($"qid", $"nid").localCheckpoint()
      val dims = base.select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("i0", "x")))
        .select(col("vec_id"), (col("i0") + 1).cast(LongType).as("i"),
          round(col("x").cast(DoubleType) * lit(1.0e6)).cast(LongType)
            .as("xq"))
      val sig = dims.groupBy(col("vec_id")).agg(
          sum(when(col("i") <= 32L && col("xq") > 0L,
            expr("cast(power(2.0, 32 - i) as long)")).otherwise(0L)).as("lo"),
          sum(when(col("i") > 32L && col("xq") > 0L,
            expr("cast(power(2.0, 64 - i) as long)")).otherwise(0L)).as("hi"))
        .localCheckpoint()
      val qsig = sig.crossJoin(broadcast(cntQ))
        .filter(col("vec_id") % greatest(lit(100L), expr("__n div 50")) === 0)
        .select(col("vec_id").as("qid"), col("lo").as("qlo"),
          col("hi").as("qhi"))
      val ham = sig.join(broadcast(qsig), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
           bit_count(col("hi").bitwiseXOR(col("qhi")))).cast(LongType)
            .as("h"))
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("h"), col("nid"))
      val ranks = ham.withColumn("rnk", row_number().over(wq).cast(LongType))
        .join(top1, Seq("qid", "nid")) // keeps only the true top-1's row
        .select(col("qid"), col("rnk"),
          expr("1000000 div rnk").as("rrq"))
      val nq = top1.agg(countDistinct(col("qid")).as("n_queries"))
      ranks.agg(sum(col("rrq")).as("__s"), max(col("rnk")).as("worst_rank"),
          sum(when(col("rnk") <= 10L, 1L).otherwise(0L)).as("top1_in_10"))
        .crossJoin(broadcast(nq))
        .select(col("n_queries"),
          round(col("__s").cast(DoubleType) / lit(1.0e6) /
            col("n_queries").cast(DoubleType), 6).as("mrr"),
          col("worst_rank"), col("top1_in_10"))
    }),

    "q46_ann_recall_gate" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "embeddings")
      val qs = base.filter($"vec_id" % 100 === 0)
      // The exact ground truth feeds TWO consumers per gated method (the
      // hit semi-join and the per-query denominator) — localCheckpoint
      // materializes the tiny (|queries|·10)-row list so the O(n·q)
      // brute-force join runs once, not once per consumer.
      val exact = graft.api.Graft.cosineTopK(base, qs, "embedding", "vec_id", 10)
        .select($"qid", $"nid").localCheckpoint()
      def recallOf(method: String, floor: Double,
          approx: org.apache.spark.sql.DataFrame) = {
        val hits = exact.join(approx.select($"qid", $"nid"), Seq("qid", "nid"), "left_semi")
          .groupBy($"qid").agg(count(lit(1)).as("h"))
        val per = exact.groupBy($"qid").agg(count(lit(1)).as("n"))
          .join(hits, Seq("qid"), "left").na.fill(0L, Seq("h"))
          .select($"qid", ($"h" / $"n").as("r"))
        per.agg(count(lit(1)).as("n_queries"),
          round(avg($"r"), 4).as("mean_recall"),
          round(min($"r"), 4).as("min_recall"))
          .select(lit(method).as("method"), $"n_queries", $"mean_recall", $"min_recall",
            ($"mean_recall" >= floor).as("pass"))
      }
      // One PQ training/code-scan serves both PQ rows: the top-10 of the
      // k=100 candidate list IS pqSearch(k=10), and the same list feeds
      // the exact re-rank. localCheckpoint materializes the tiny
      // candidate list (|queries|·100 rows) so the code-scan join runs
      // once, not once per consumer.
      val pq100 = pqSearch(base, qs, "embedding", "vec_id", k = 100).localCheckpoint()
      recallOf("ivf_nprobe8", 0.75, ivfSearch(base, qs, "embedding", "vec_id",
          k = 10, nlist = 16, nprobe = 8))
        .unionAll(recallOf("lsh_banded96x7", 0.85,
          lshSearch(base, qs, "embedding", "vec_id", k = 10)))
        .unionAll(recallOf("pq_16x256", 0.70, pq100.filter($"rnk" <= 10)))
        .unionAll(recallOf("pq_rerank", 0.95,
          rerankExact(base, qs, pq100, "embedding", "vec_id", k = 10)))
        .orderBy($"method")
    })
  )

  /** Product-quantization top-k: the memory side of billion-scale ANN.
    * Codebooks (subspaces × K × subDim) train on a bounded driver sample;
    * base vectors collapse to `subspaces` small codes + a norm
    * (64 floats → 16 byte-codes here, 16× smaller), and queries score
    * candidates from codes alone via the codegen'd `PqDot` — the original
    * vectors are never shuffled or rescanned at query time. Recall is
    * inspected by the q46 gate the same way it gates IVF/LSH.
    *
    * SMALL-QUERIES CONTRACT: the `nid =!= qid` join is non-equi, so the
    * exact form is O(|base| · |queries|) whatever the physical plan; the
    * broadcast hint just picks the good physical shape (base never moves)
    * for the intended regime — a driver-bounded query set. For
    * corpus-sized query sets use the bucketed paths (lshSearch /
    * ivfSearch), whose equality joins shuffle-partition both sides. */
  def pqSearch(base: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, vecCol: String, idCol: String,
      k: Int, subspaces: Int = 16, codebookSize: Int = 256): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val spark = base.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val sample = base.select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .limit(math.max(codebookSize * 32, 512)).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(sample.nonEmpty, "PQ training requires data")
    val dim = sample.head.length
    val subDim = (dim + subspaces - 1) / subspaces
    val codebooks = Array.tabulate(subspaces) { s =>
      val slices = sample.map { v =>
        Array.tabulate(subDim)(j =>
          if (s * subDim + j < v.length) v(s * subDim + j) else 0.0)
      }
      trainCentroids(slices, codebookSize, iters = 8)
    }
    val enc = (c: org.apache.spark.sql.Column) =>
      column(graft.functions.PqEncode(expression(c), codebooks))
    val pqdot = (codes: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =>
      column(graft.functions.PqDot(expression(codes), expression(q), codebooks))
    val b = base
      .withColumn("nrm", sqrt(expr(s"vec_dot(`$vecCol`, `$vecCol`)")))
      .select(col(idCol).as("nid"), enc(col(vecCol)).as("codes"), col("nrm"))
      // Materialize codes ONCE per base row. Without this cut Catalyst
      // collapses the encode projection into the query fan-out and
      // re-encodes every (row, query) pair — the sf1 scale ladder
      // measured it as a 70x cliff (288 s) with the whole scoring stage
      // serialized on one input partition. The repartition floors the
      // scoring stage's parallelism at the cluster default even when the
      // input is a single parquet file; the materialized table is 16-byte
      // codes + a norm per row (~250x smaller than the raw vectors), so
      // the shuffle + block storage are cheap at any corpus size.
      .repartition(spark.sparkContext.defaultParallelism, col("nid"))
      .localCheckpoint()
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(expr("vec_dot(qv, qv)")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    b.join(broadcast(q), col("nid") =!= col("qid"))
      .withColumn("sim", pqdot(col("codes"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rnk", row_number().over(w).cast(org.apache.spark.sql.types.LongType))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("sim"), 4).as("sim_r"))
  }

  /** Two-stage PQ search — the standard billion-scale shape: stage 1
    * scores EVERY base row from its 16-byte PQ codes only (cheap, compressed,
    * no raw-vector scan) and keeps `rerank` candidates per query; stage 2
    * fetches the original vectors for those candidates alone (an id
    * equality join, ~rerank·|queries| rows) and re-scores them with the
    * exact `vec_dot`, so the final top-k ordering is exact over the
    * candidate set. Recall loss is only stage-1 misses — with rerank ≫ k
    * that pushes recall toward 1.0 while still never rescanning the corpus
    * vectors for scoring. */
  def pqSearchReranked(base: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, vecCol: String, idCol: String,
      k: Int, rerank: Int = 100, subspaces: Int = 16,
      codebookSize: Int = 256): org.apache.spark.sql.DataFrame =
    rerankExact(base, queries,
      pqSearch(base, queries, vecCol, idCol, k = rerank,
        subspaces = subspaces, codebookSize = codebookSize),
      vecCol, idCol, k)

  /** Exact re-scoring of ANY candidate set — stage 2 of every two-stage
    * ANN (PQ, LSH, IVF): fetch the original vectors for the `(qid, nid)`
    * candidates alone (an id equality join, |cands| rows — the corpus is
    * never rescanned for scoring) and re-rank with the exact `vec_dot`,
    * so the final top-k ordering is exact over the candidate set. Recall
    * loss is only stage-1 misses — with |cands per query| ≫ k this pushes
    * recall toward 1.0 whatever generated the candidates. */
  def rerankExact(base: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      candidates: org.apache.spark.sql.DataFrame, vecCol: String,
      idCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(base.sparkSession)
    val cands = candidates.select(col("qid"), col("nid"))
    val vecs = base.select(col(idCol).as("nid"), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(expr(norm2Expr)))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(expr("vec_dot(qv, qv)")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    cands.join(vecs, Seq("nid")).join(q, Seq("qid"))
      .withColumn("sim", expr(dotExpr) / (col("nrm") * col("qn")))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("sim"), 4).as("sim_r"))
  }

  /** Banded sign-bit LSH ANN: each vector gets `bands` keys of `bits`
    * random-hyperplane sign bits (codegen'd CosineLshBands); a base row is
    * a candidate for a query iff they share ≥1 band key. Multi-band
    * probing is what makes low-cosine neighbors reachable — a single
    * fixed bucket (round 1's shape) had recall ≈ 0.05 on this data
    * because top-10 neighbors sit at cos 0.3–0.6 where any one sign
    * pattern disagrees. bands×bits tunes recall vs candidate volume:
    * P(candidate at angle θ) = 1 − (1 − (1 − θ/π)^bits)^bands.
    * The band join is a plain equality join with NO broadcast hint: AQE
    * broadcasts the query side at runtime when it is genuinely small and
    * shuffle-partitions both sides when it isn't — so corpus-sized query
    * sets work unchanged (unlike the hard-hinted form, which pinned the
    * whole query side into executor memory). */
  def lshSearch(base: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, vecCol: String, idCol: String,
      k: Int, bands: Int = 96, bits: Int = 7,
      seed: Int = 42): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(base.sparkSession)
    val e = base.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(expr(norm2Expr)))
      .withColumn("bk", explode(expr(s"cosine_lsh_bands(v, $bands, $bits, $seed)")))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(expr("vec_dot(qv, qv)")))
      .withColumn("bk", explode(expr(s"cosine_lsh_bands(qv, $bands, $bits, $seed)")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    e.join(q, Seq("bk"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", expr(dotExpr) / (col("nrm") * col("qn")))
      // a pair sharing several bands scores once (max = the single value)
      .groupBy(col("qid"), col("vec_id")).agg(max(col("sim")).as("sim"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id").as("nid"), round(col("sim"), 4).as("sim_r"))
  }

  /** IVF search: assign base vectors to their nearest coarse centroid
    * (map-side, centroids broadcast in the expression), probe the `nprobe`
    * nearest lists per query, score cosine within the probed lists only.
    * Candidate work drops ~nlist/nprobe-fold vs brute force; recall is
    * tunable via nprobe. */
  def ivfSearch(base: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, vecCol: String, idCol: String,
      k: Int, nlist: Int, nprobe: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = base.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // deterministic sample: lowest ids (stable across runs/partitionings)
    val sample = base.select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .limit(math.max(nlist * 16, 256)).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val centroids = trainCentroids(sample, nlist, iters = 5)
    // Codegen'd assignment (VecLshKernels) — the centroid table rides in
    // the plan as a reference object; no per-row boxing of the vector as
    // a Seq[Float] (the previous UDF form's cost).
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val assign = (c: org.apache.spark.sql.Column) =>
      column(graft.functions.IvfAssign(expression(c), centroids))
    val probe = (c: org.apache.spark.sql.Column) =>
      column(graft.functions.IvfProbe(expression(c), centroids, nprobe))
    val b = base.select(col(idCol).as("nid"), col(vecCol).as("v"),
      assign(col(vecCol)).as("bucket"))
      .withColumn("nrm", sqrt(expr(norm2Expr)))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      explode(probe(col(vecCol))).as("bucket"))
      .withColumn("qn", sqrt(expr("vec_dot(qv, qv)")))
    // No broadcast hint: the probe join is a plain bucket-equality join,
    // so AQE broadcasts a small query side at runtime and shuffles when
    // the query set is corpus-sized.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    b.join(q, Seq("bucket"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim", expr(dotExpr) / (col("nrm") * col("qn")))
      .withColumn("rnk", row_number().over(w).cast(org.apache.spark.sql.types.LongType))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("sim"), 4).as("sim_r"))
  }

  val oracle: Map[String, String] = Map(
    // MMR twin: identical nano-quantized relevance/sim chains, then the
    // k greedy rounds unrolled as chained CTEs (the HITS/k-core device)
    // — each round's argmax is the same integer 7·relq − 3·msq with the
    // same (mmrq desc, id) order
    "q234_mmr_rerank" -> mmrSql(10),

    // q28/q43 GOLDEN PINS (r9): both ANN paths are fully deterministic —
    // q28's hyperplanes are md5-derived from a fixed seed
    // (cosine_lsh_bands), q43's IVF centroids train on the orderBy(id)
    // lowest-id sample with fixed iteration count, and both rank with a
    // total (sim DESC, nid) tie-break — and partition-INVARIANT (verified
    // by diffing local[3] vs local[8] runs bit-for-bit), so the sf0.01
    // outputs are hard-pinned as literal VALUES oracles, upgrading the
    // rows-only checks to full hash gates. If the driver regenerates
    // testdata the pin fails LOUDLY; recapture via Verify. The recall
    // quality of both paths stays separately gated by q46.
    // (Captured 2026-08-14 from /root/testdata/sf0.01.)
    "q28_ann_lsh_bucketed" ->
      """SELECT CAST(qid AS BIGINT) AS qid, CAST(rnk AS BIGINT) AS rnk,
        |  CAST(nid AS BIGINT) AS nid, CAST(sim_r AS DOUBLE) AS sim_r
        |FROM (VALUES
        |  (0, 1, 365, 0.37), (0, 2, 334, 0.3627), (0, 3, 387, 0.3311),
        |  (0, 4, 423, 0.2969), (0, 5, 73, 0.2954),
        |  (100, 1, 398, 0.3584), (100, 2, 279, 0.3473), (100, 3, 360, 0.317),
        |  (100, 4, 478, 0.308), (100, 5, 45, 0.3026),
        |  (200, 1, 204, 0.4429), (200, 2, 32, 0.4379), (200, 3, 143, 0.3534),
        |  (200, 4, 410, 0.3028), (200, 5, 135, 0.2702),
        |  (300, 1, 53, 0.453), (300, 2, 477, 0.3836), (300, 3, 446, 0.363),
        |  (300, 4, 464, 0.3562), (300, 5, 245, 0.3399),
        |  (400, 1, 451, 0.3785), (400, 2, 443, 0.3782), (400, 3, 475, 0.3097),
        |  (400, 4, 182, 0.2856), (400, 5, 358, 0.2825))
        |  g(qid, rnk, nid, sim_r)
        |ORDER BY qid, rnk""".stripMargin,

    "q43_ann_ivf" ->
      """SELECT CAST(qid AS BIGINT) AS qid, CAST(rnk AS BIGINT) AS rnk,
        |  CAST(nid AS BIGINT) AS nid, CAST(sim_r AS DOUBLE) AS sim_r
        |FROM (VALUES
        |  (0, 1, 365, 0.37), (0, 2, 334, 0.3627), (0, 3, 387, 0.3311),
        |  (0, 4, 423, 0.2969), (0, 5, 73, 0.2954), (0, 6, 7, 0.2928),
        |  (0, 7, 320, 0.2879), (0, 8, 190, 0.2818), (0, 9, 388, 0.2763),
        |  (0, 10, 323, 0.2565),
        |  (100, 1, 398, 0.3584), (100, 2, 360, 0.317), (100, 3, 478, 0.308),
        |  (100, 4, 45, 0.3026), (100, 5, 395, 0.2999), (100, 6, 24, 0.2824),
        |  (100, 7, 480, 0.2802), (100, 8, 33, 0.278), (100, 9, 12, 0.2655),
        |  (100, 10, 298, 0.2431),
        |  (200, 1, 32, 0.4379), (200, 2, 410, 0.3028), (200, 3, 135, 0.2702),
        |  (200, 4, 409, 0.2698), (200, 5, 58, 0.2605), (200, 6, 189, 0.2528),
        |  (200, 7, 103, 0.2491), (200, 8, 183, 0.2458), (200, 9, 461, 0.2436),
        |  (200, 10, 264, 0.2403),
        |  (300, 1, 245, 0.3399), (300, 2, 27, 0.2819), (300, 3, 305, 0.2683),
        |  (300, 4, 431, 0.2393), (300, 5, 1, 0.2368), (300, 6, 134, 0.2365),
        |  (300, 7, 475, 0.2318), (300, 8, 43, 0.2247), (300, 9, 493, 0.2185),
        |  (300, 10, 449, 0.2162),
        |  (400, 1, 451, 0.3785), (400, 2, 443, 0.3782), (400, 3, 475, 0.3097),
        |  (400, 4, 182, 0.2856), (400, 5, 485, 0.2801), (400, 6, 94, 0.2608),
        |  (400, 7, 415, 0.2601), (400, 8, 92, 0.258), (400, 9, 29, 0.2571),
        |  (400, 10, 490, 0.254))
        |  g(qid, rnk, nid, sim_r)
        |ORDER BY qid, rnk""".stripMargin,

    // q46 GOLDEN PIN (r10): the recall gate was the last `no_oracle`
    // entry. Same argument as the q28/q43 pins above — the four rows are
    // a pure function of deterministic inputs (md5 hyperplanes, the
    // orderBy(id).limit PQ/IVF training samples, fixed iteration counts)
    // and partition-INVARIANT (diffed local[3] vs local[8] bit-for-bit;
    // IvfSpec pins repartition-stability every test run). Hard-pinned at
    // sf0.01; if the driver regenerates testdata the pin fails LOUDLY —
    // recapture via `SPARK_GRAFT_ONLY=q46 runMain graft.Verify`.
    // (Captured 2026-08-15 from /root/testdata/sf0.01.)
    "q46_ann_recall_gate" ->
      """SELECT CAST(method AS VARCHAR) AS method,
        |  CAST(n_queries AS BIGINT) AS n_queries,
        |  CAST(mean_recall AS DOUBLE) AS mean_recall,
        |  CAST(min_recall AS DOUBLE) AS min_recall,
        |  CAST(pass AS BOOLEAN) AS pass
        |FROM (VALUES
        |  ('ivf_nprobe8', 5, 0.82, 0.7, TRUE),
        |  ('lsh_banded96x7', 5, 0.88, 0.7, TRUE),
        |  ('pq_16x256', 5, 0.84, 0.8, TRUE),
        |  ('pq_rerank', 5, 1.0, 1.0, TRUE))
        |  g(method, n_queries, mean_recall, min_recall, pass)
        |ORDER BY method""".stripMargin,

    "q44_dedup_embedding_cosine" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS va, b.vec_id AS vb,
        | round(list_dot_product(a.v, b.v) /
        |   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos_r
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) /
        |   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.45
        |ORDER BY va, vb""".stripMargin,

    // margin-mining twin: identical brute-force cosine, top-2 pivot,
    // rounded margin — the q27 oracle conventions applied cross-set
    "q206_bitext_mining" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |a AS (SELECT vec_id, v FROM e WHERE label = 0),
        |b AS (SELECT vec_id, v FROM e WHERE label = 1),
        |scored AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS nid,
        |    list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
        |  FROM a, b),
        |r AS (SELECT qid, nid, sim,
        |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
        |      FROM scored),
        |p AS (SELECT qid,
        |        max(CASE WHEN rnk = 1 THEN nid END) AS match_id,
        |        max(CASE WHEN rnk = 1 THEN sim END) AS s1,
        |        max(CASE WHEN rnk = 2 THEN sim END) AS s2
        |      FROM r WHERE rnk <= 2 GROUP BY qid)
        |SELECT qid AS src_id, match_id, round(s1, 4) AS best_sim,
        |  round(s2, 4) AS second_sim, round(s1 - s2, 4) AS margin_r
        |FROM p
        |WHERE s2 IS NOT NULL AND round(s1 - s2, 4) >= 0.02
        |ORDER BY src_id""".stripMargin,

    // hard-negative twin: identical nano-quantized cosine, the same
    // label-inequality condition and (simq desc, nid) rank
    "q238_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, label AS anchor_label, v AS qv
        |      FROM e WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q.qid, q.anchor_label, e.vec_id AS nid, e.label AS neg_label,
        |    CAST(ROUND(list_dot_product(e.v, q.qv) /
        |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))
        |      * 1000000000.0) AS BIGINT) AS simq
        |  FROM e, q WHERE e.label <> q.anchor_label),
        |r AS (SELECT qid, anchor_label, nid, neg_label, simq,
        |        CAST(row_number() OVER (PARTITION BY qid
        |          ORDER BY simq DESC, nid) AS BIGINT) AS rnk
        |      FROM scored)
        |SELECT qid, anchor_label, rnk, nid, neg_label,
        |  round(CAST(simq AS DOUBLE) / 1000000000.0, 4) AS sim_r
        |FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    // decontamination twin: identical quantized cosine, the same
    // (simq desc, eval_id) argmax and threshold-on-the-quantized-long
    "q240_semantic_decontamination" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |tr AS (SELECT vec_id AS train_id, v FROM e WHERE label <= 4),
        |ev AS (SELECT vec_id AS eval_id, v AS qv FROM e WHERE label = 9),
        |scored AS (
        |  SELECT tr.train_id, ev.eval_id,
        |    CAST(ROUND(list_dot_product(tr.v, ev.qv) /
        |      (sqrt(list_dot_product(tr.v, tr.v)) * sqrt(list_dot_product(ev.qv, ev.qv)))
        |      * 1000000000.0) AS BIGINT) AS simq
        |  FROM tr, ev),
        |r AS (SELECT train_id, eval_id, simq,
        |        row_number() OVER (PARTITION BY train_id
        |          ORDER BY simq DESC, eval_id) AS rnk
        |      FROM scored)
        |SELECT train_id, eval_id AS top_eval_id,
        |  round(CAST(simq AS DOUBLE) / 1000000000.0, 4) AS top_cos_r,
        |  simq >= 350000000 AS contaminated
        |FROM r WHERE rnk = 1 ORDER BY train_id""".stripMargin,

    // reciprocal-NN twin: both directions' (simq desc, id) top-1 from
    // the same quantized score table, joined on mutual agreement
    "q241_reciprocal_nn" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |a AS (SELECT vec_id AS a_id, v FROM e WHERE label = 0),
        |b AS (SELECT vec_id AS b_id, v AS qv FROM e WHERE label = 1),
        |scored AS (
        |  SELECT a.a_id, b.b_id,
        |    CAST(ROUND(list_dot_product(a.v, b.qv) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.qv, b.qv)))
        |      * 1000000000.0) AS BIGINT) AS simq
        |  FROM a, b),
        |ra AS (SELECT a_id, b_id, simq,
        |         row_number() OVER (PARTITION BY a_id
        |           ORDER BY simq DESC, b_id) AS rnk
        |       FROM scored),
        |rb AS (SELECT a_id, b_id,
        |         row_number() OVER (PARTITION BY b_id
        |           ORDER BY simq DESC, a_id) AS rnk
        |       FROM scored)
        |SELECT ra.a_id, ra.b_id,
        |  round(CAST(ra.simq AS DOUBLE) / 1000000000.0, 4) AS cos_r
        |FROM ra JOIN rb ON ra.a_id = rb.a_id AND ra.b_id = rb.b_id
        |WHERE ra.rnk = 1 AND rb.rnk = 1
        |ORDER BY ra.a_id""".stripMargin,

    // q262 twin: brute-force replay of the exact full-dim top-10 AND
    // each prefix-dim top-10 (list slicing), identical (sim DESC, nid)
    // rankings, exact-integer hit sums over the fixed k=10 denominator
    "q262_matryoshka_recall" -> {
      def rankedTop10(vExpr: String, qExpr: String, name: String): String =
        s"""$name AS (SELECT qid, nid FROM (
           |  SELECT q.qid, e.vec_id AS nid,
           |    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
           |      list_dot_product($vExpr, $qExpr) /
           |        (sqrt(list_dot_product($vExpr, $vExpr)) *
           |         sqrt(list_dot_product($qExpr, $qExpr))) DESC, e.vec_id) AS rnk
           |  FROM e, q WHERE e.vec_id <> q.qid) WHERE rnk <= 10)""".stripMargin
      def legSql(d: Int): String =
        s"""${rankedTop10(s"e.v[1:$d]", s"q.qv[1:$d]", s"a$d")},
           |h$d AS (
           |  SELECT ex.qid, COUNT(a$d.nid) AS h
           |  FROM ex LEFT JOIN a$d ON ex.qid = a$d.qid AND ex.nid = a$d.nid
           |  GROUP BY ex.qid),
           |r$d AS (
           |  SELECT CAST($d AS BIGINT) AS dim,
           |    CAST(COUNT(*) AS BIGINT) AS n_queries,
           |    ROUND(CAST(SUM(h) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 10.0), 4)
           |      + 0.0 AS mean_recall,
           |    ROUND(CAST(MIN(h) AS DOUBLE) / 10.0, 4) + 0.0 AS min_recall
           |  FROM h$d)""".stripMargin
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 100 = 0),
         |${rankedTop10("e.v", "q.qv", "ex")},
         |${legSql(32)},
         |${legSql(16)},
         |${legSql(8)}
         |SELECT * FROM r32 UNION ALL SELECT * FROM r16 UNION ALL
         |SELECT * FROM r8 ORDER BY dim""".stripMargin
    },

    // KNN-Shapley twin: same derived probe modulus, the q27 double-cosine
    // rank, the identical nano-quantized term recursion as a suffix
    // window sum, the same exact-long top-20 cut
    "q331_knn_shapley" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
        |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
        |  GREATEST(CAST(100 AS BIGINT), CAST(COUNT(*) AS BIGINT) // 10)
        |    AS md FROM e),
        |q AS (SELECT vec_id AS qid, v AS qv, label AS qlabel
        |      FROM e CROSS JOIN na WHERE vec_id % md = 0),
        |nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM q),
        |train AS (SELECT vec_id, v, label
        |          FROM e CROSS JOIN na WHERE vec_id % md <> 0),
        |ntr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM train),
        |ranked AS (
        |  SELECT qid, vec_id, eq,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC,
        |      vec_id) AS BIGINT) AS rnk
        |  FROM (SELECT q.qid, t.vec_id,
        |      CASE WHEN t.label = q.qlabel THEN CAST(1 AS BIGINT)
        |        ELSE CAST(0 AS BIGINT) END AS eq,
        |      list_dot_product(t.v, q.qv) /
        |        (sqrt(list_dot_product(t.v, t.v)) *
        |         sqrt(list_dot_product(q.qv, q.qv))) AS sim
        |    FROM train t CROSS JOIN q)),
        |terms AS (
        |  SELECT qid, vec_id, rnk,
        |    CASE WHEN LEAD(eq, 1) OVER (PARTITION BY qid ORDER BY rnk)
        |        IS NULL
        |      THEN CAST(ROUND(CAST(eq AS DOUBLE)
        |        / CAST(ntr.n_train AS DOUBLE) * 1000000000.0) AS BIGINT)
        |      ELSE CAST(ROUND(CAST(eq - LEAD(eq, 1) OVER (
        |          PARTITION BY qid ORDER BY rnk) AS DOUBLE)
        |        / CAST(GREATEST(rnk, 5) AS DOUBLE) * 1000000000.0)
        |        AS BIGINT) END AS t
        |  FROM ranked CROSS JOIN ntr),
        |sval AS (
        |  SELECT qid, vec_id,
        |    SUM(t) OVER (PARTITION BY qid ORDER BY rnk DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_nano
        |  FROM terms),
        |tot AS (SELECT vec_id, CAST(SUM(s_nano) AS BIGINT) AS sum_nano
        |        FROM sval GROUP BY 1)
        |SELECT vec_id, sum_nano, n_queries, n_train,
        |  round(CAST(sum_nano AS DOUBLE) / 1000000000.0
        |    / CAST(n_queries AS DOUBLE), 6) AS shapley
        |FROM tot CROSS JOIN nq CROSS JOIN ntr
        |ORDER BY sum_nano DESC, vec_id LIMIT 20""".stripMargin,

    // MRR twin: the q27 exact chain at k=1 for the gold answer, the
    // q355 signature/Hamming ranking for the full rank, integer-
    // division reciprocal ranks
    "q358_mrr_compressed" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cq AS (SELECT greatest(100, CAST(COUNT(*) AS BIGINT) // 50) AS m
        |       FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e CROSS JOIN cq
        |      WHERE vec_id % m = 0),
        |scored AS (
        |  SELECT q.qid, e.vec_id AS nid,
        |    list_dot_product(e.v, q.qv) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(q.qv, q.qv))) AS sim
        |  FROM e, q WHERE e.vec_id <> q.qid),
        |top1 AS (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid,
        |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
        |        AS rnk
        |    FROM scored) WHERE rnk <= 1),
        |dims AS (
        |  SELECT vec_id, CAST(i AS BIGINT) AS i,
        |    CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |      AS xq
        |  FROM (SELECT vec_id, embedding,
        |          unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings) d),
        |sig AS (
        |  SELECT vec_id,
        |    CAST(SUM(CASE WHEN i <= 32 AND xq > 0
        |      THEN CAST(power(2.0, 32 - i) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS lo,
        |    CAST(SUM(CASE WHEN i > 32 AND xq > 0
        |      THEN CAST(power(2.0, 64 - i) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS hi
        |  FROM dims GROUP BY 1),
        |qs AS (SELECT vec_id AS qid, lo AS qlo, hi AS qhi
        |       FROM sig CROSS JOIN cq WHERE vec_id % m = 0),
        |ham AS (
        |  SELECT q2.qid, s.vec_id AS nid,
        |    CAST(bit_count(xor(s.lo, q2.qlo)) + bit_count(xor(s.hi, q2.qhi))
        |      AS BIGINT) AS h
        |  FROM sig s CROSS JOIN qs q2 WHERE s.vec_id <> q2.qid),
        |ranks AS (
        |  SELECT r.qid, r.rnk, 1000000 // r.rnk AS rrq
        |  FROM (SELECT qid, nid, h,
        |          CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY h, nid)
        |            AS BIGINT) AS rnk
        |        FROM ham) r
        |  JOIN top1 t1 ON t1.qid = r.qid AND t1.nid = r.nid),
        |nq AS (SELECT CAST(COUNT(DISTINCT qid) AS BIGINT) AS n_queries
        |       FROM top1)
        |SELECT n_queries,
        |  round(CAST(SUM(rrq) AS DOUBLE) / 1000000.0 /
        |    CAST(n_queries AS DOUBLE), 6) AS mrr,
        |  CAST(MAX(rnk) AS BIGINT) AS worst_rank,
        |  CAST(SUM(CASE WHEN rnk <= 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS top1_in_10
        |FROM ranks CROSS JOIN nq GROUP BY n_queries""".stripMargin,

    // sign-bit twin: the q27 exact-cosine chain for ground truth, the
    // same power-of-two signature sums and Hamming ranking, integer
    // hit counts — recall means never average floats
    "q355_signbit_audit" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cq AS (SELECT greatest(100, CAST(COUNT(*) AS BIGINT) // 50) AS m
        |       FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e CROSS JOIN cq
        |      WHERE vec_id % m = 0),
        |scored AS (
        |  SELECT q.qid, e.vec_id AS nid,
        |    list_dot_product(e.v, q.qv) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(q.qv, q.qv))) AS sim
        |  FROM e, q WHERE e.vec_id <> q.qid),
        |exact AS (
        |  SELECT qid, nid FROM (
        |    SELECT qid, nid,
        |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
        |        AS rnk
        |    FROM scored) WHERE rnk <= 10),
        |dims AS (
        |  SELECT vec_id, CAST(i AS BIGINT) AS i,
        |    CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |      AS xq
        |  FROM (SELECT vec_id, embedding,
        |          unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings) d),
        |sig AS (
        |  SELECT vec_id,
        |    CAST(SUM(CASE WHEN i <= 32 AND xq > 0
        |      THEN CAST(power(2.0, 32 - i) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS lo,
        |    CAST(SUM(CASE WHEN i > 32 AND xq > 0
        |      THEN CAST(power(2.0, 64 - i) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS hi
        |  FROM dims GROUP BY 1),
        |qs AS (SELECT vec_id AS qid, lo AS qlo, hi AS qhi
        |       FROM sig CROSS JOIN cq WHERE vec_id % m = 0),
        |ham AS (
        |  SELECT q.qid, s.vec_id AS nid,
        |    CAST(bit_count(xor(s.lo, q.qlo)) + bit_count(xor(s.hi, q.qhi))
        |      AS BIGINT) AS h
        |  FROM sig s CROSS JOIN qs q WHERE s.vec_id <> q.qid),
        |atop AS (
        |  SELECT qid, nid, h FROM (
        |    SELECT qid, nid, h,
        |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY h, nid) AS rnk
        |    FROM ham) WHERE rnk <= 10),
        |hits AS (
        |  SELECT e2.qid, CAST(COUNT(*) AS BIGINT) AS hh
        |  FROM exact e2 JOIN atop a ON a.qid = e2.qid AND a.nid = e2.nid
        |  GROUP BY 1),
        |per AS (
        |  SELECT e2.qid, CAST(COUNT(*) AS BIGINT) AS nn,
        |    COALESCE(MAX(h2.hh), 0) AS hh
        |  FROM exact e2 LEFT JOIN hits h2 ON h2.qid = e2.qid
        |  GROUP BY 1),
        |hamagg AS (SELECT CAST(SUM(h) AS BIGINT) AS sh,
        |    CAST(COUNT(*) AS BIGINT) AS nh FROM atop)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  round(CAST(SUM(hh) AS DOUBLE) / CAST(SUM(nn) AS DOUBLE), 4)
        |    AS mean_recall,
        |  round(CAST(MIN(hh) AS DOUBLE) / 10.0, 4) AS min_recall,
        |  round(CAST(sh AS DOUBLE) / CAST(nh AS DOUBLE), 4)
        |    AS mean_hamming_top10
        |FROM per CROSS JOIN hamagg
        |GROUP BY sh, nh""".stripMargin,

    "q27_knn_cosine" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |     q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 100 = 0),
        |     scored AS (
        |       SELECT q.qid, e.vec_id AS nid,
        |         list_dot_product(e.v, q.qv) /
        |           (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS sim
        |       FROM e, q WHERE e.vec_id <> q.qid),
        |     ranked AS (
        |       SELECT qid, nid, sim,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
        |       FROM scored)
        |SELECT qid, rnk, nid, round(sim, 4) AS sim_r
        |FROM ranked WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
  )
}
