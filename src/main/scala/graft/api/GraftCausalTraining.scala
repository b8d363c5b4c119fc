package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Graft]] members: pre-quantized training diagnostics, logistic training, causal inference, time series, URLs.
  *
  * One of the six family slices of the operator API — `object Graft`
  * mixes them all in; call sites use `Graft.<member>` exactly as
  * before. Split round 13 purely for navigability (8.5k LoC in one
  * file); `private` members became `private[api]` so slices can share
  * helpers with zero behavior change.
  */
private[api] trait GraftCausalTraining { this: Graft.type =>


  /** Guard for operators that rank/stratify with integer arithmetic
    * ([[qiniByDecile]], [[stratifiedAte]], [[ipwAte]]): a fractional
    * score or covariate would truncate to 0 under a silent LongType
    * cast and the output would be meaningless with no error. Callers
    * quantize explicitly (e.g. `round(score * 1000).cast("long")`). */
  private[api] def requirePreQuantized(df: DataFrame, colName: String,
      fn: String, role: String): Unit = {
    val dt = df.select(col(colName)).schema.head.dataType
    val ok = dt == ByteType || dt == ShortType || dt == IntegerType ||
      dt == LongType || dt == BooleanType
    require(ok, s"$fn expects a pre-quantized integral $role column " +
      s"('$colName' is $dt): quantize explicitly, e.g. " +
      s"round($colName * 1000).cast('long'), instead of relying on a " +
      "silent truncating cast")
  }

  /** Qini / uplift-by-decile curve (q245) — the evaluation table for an
    * uplift score: rank units by score, cut into `buckets` equal-count
    * bins by integer rank arithmetic, report cumulative treated/control
    * conversions and the Qini value q(k) = conv_t(k) −
    * conv_c(k)·n_t(k)/n_c(k) per bin (Radcliffe 2007). A score with no
    * uplift signal gives a flat-to-diagonal curve.
    *
    * Ranks come from [[globalRank]] (never a one-partition window); the
    * bin cut is (grank−1)·buckets div n; the cumulative pass is a
    * window over ≤ `buckets` rows. Ties on score break by id, so bins
    * replay exactly cross-engine.
    *
    * PRE-QUANTIZED CONTRACT: `scoreCol` must already be an integral
    * column (e.g. score_cents) — a fractional uplift score in [−1, 1]
    * would truncate to 0 under a silent cast and the ranking would
    * degenerate to the id tie-break, so non-integral inputs raise. */
  def qiniByDecile(units: DataFrame, scoreCol: String, treatedCol: String,
      convCol: String, idCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"qiniByDecile needs buckets >= 2, got $buckets")
    requirePreQuantized(units, scoreCol, "qiniByDecile", "score")
    val base = units.select(col(idCol).as("__id"),
      (-col(scoreCol).cast(LongType)).as("__negs"),
      col(treatedCol).cast(LongType).as("__t"),
      col(convCol).cast(LongType).as("__y"))
    val nDf = base.agg(count(lit(1)).as("__n"))
    val ranked = globalRank(base, Seq("__negs", "__id"), "grank")
      .crossJoin(broadcast(nDf))
      .withColumn("bucket", expr(s"((grank - 1) * $buckets) div __n"))
    val per = ranked.groupBy(col("bucket"))
      .agg(sum(col("__t")).as("__nt"), sum(lit(1L) - col("__t")).as("__nc"),
        sum(col("__t") * col("__y")).as("__ct"),
        sum((lit(1L) - col("__t")) * col("__y")).as("__cc"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0) // ≤ buckets rows
    per.select(col("bucket"),
        sum(col("__nt")).over(w).as("cum_n_t"),
        sum(col("__nc")).over(w).as("cum_n_c"),
        sum(col("__ct")).over(w).as("cum_conv_t"),
        sum(col("__cc")).over(w).as("cum_conv_c"))
      .withColumn("qini",
        when(col("cum_n_c") === 0L, lit(null).cast(DoubleType))
          .otherwise(col("cum_conv_t").cast(DoubleType) -
            col("cum_conv_c").cast(DoubleType) *
              col("cum_n_t").cast(DoubleType) /
              col("cum_n_c").cast(DoubleType)))
  }

  /** Event-time disorder audit (q246) — the measurement that SIZES a
    * stream's watermark delay: per key, an event is late by
    * (max prior event-time − its event-time) under ARRIVAL order;
    * report the late count and exact p50/p95/p99 lateness order
    * statistics plus the p99 as the suggested watermark. Run it on a
    * sample of the real arrival log before choosing
    * withWatermark(delay).
    *
    * Shape: one key-partitioned prefix-max window over arrival order,
    * then [[globalRank]] order statistics over the (far smaller) late
    * set — integer microseconds end-to-end, no percentile_approx. */
  def disorderAudit(df: DataFrame, keyCol: String, tsCol: String,
      arrivalCols: Seq[String]): DataFrame = {
    require(arrivalCols.nonEmpty, "disorderAudit: arrivalCols must order arrivals")
    val ord = arrivalCols.map(col)
    val w = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = df
      .select(col(keyCol).as("__k") +: unix_micros(col(tsCol)).as("__tus") +:
        ord: _*)
      .withColumn("__mx", max(col("__tus")).over(w))
      .withColumn("late_us", col("__mx") - col("__tus"))
    val nTot = late.agg(count(lit(1)).as("n_events"))
    val lateOnly = late.filter(col("late_us") > 0L)
      .select(col("late_us") +: col("__k") +: ord: _*)
    val ranked = globalRank(lateOnly,
      "late_us" +: "__k" +: arrivalCols, "grank")
    // exact ⌈p·n/100⌉ order statistic — integer div, never a percentile
    def target(p: Int): Column = expr(s"(__nl * $p + 99) div 100")
    val stats = ranked
      .crossJoin(broadcast(lateOnly.agg(count(lit(1)).as("__nl"))))
      .agg(max(col("__nl")).as("n_late"),
        max(when(col("grank") === target(50), col("late_us")))
          .as("p50_late_us"),
        max(when(col("grank") === target(95), col("late_us")))
          .as("p95_late_us"),
        max(when(col("grank") === target(99), col("late_us")))
          .as("p99_late_us"))
    nTot.crossJoin(stats)
      .select(col("n_events"), coalesce(col("n_late"), lit(0L)).as("n_late"),
        col("p50_late_us"), col("p95_late_us"), col("p99_late_us"),
        col("p99_late_us").as("suggested_watermark_us"))
  }

  /** Personalized PageRank (q247) — [[pageRank]] with the teleport
    * distribution concentrated on a SEED SET instead of uniform:
    * r' = (1−d)·s + d·(Pᵀr + dangling·s), s(v) = 1/|seeds| on seeds and
    * 0 elsewhere. The random walk restarts at the seeds, so ranks
    * measure proximity TO the seeds — the standard related-items /
    * local-community primitive (Page et al. 1999 §6; Gleich 2015).
    *
    * Same chain discipline as [[pageRank]]: per-round in-sums quantized
    * at 1e-12, dangling mass redistributed to the seed vector, iterative
    * lineage cut each round (checkpointDir for cluster durability).
    * Identical per-round shape: one keyed join + aggregate. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: DataFrame, seedCol: String,
      damping: Double = 0.85, iterations: Int = 10,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1,
      s"personalizedPageRank needs iterations >= 1, got $iterations")
    val Q = 1.0e12
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val e = edges.select(col(srcCol).cast(StringType).as("src"),
      col(dstCol).cast(StringType).as("dst"),
      col(weightCol).cast(DoubleType).as("w"))
    val badW = e.filter(col("w").isNull || !(col("w") > 0.0)).limit(1).count()
    require(badW == 0L,
      s"personalizedPageRank: weight column '$weightCol' must be positive " +
        "and non-null")
    val nodes = cut(e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct())
    val seedSet = cut(seeds.select(col(seedCol).cast(StringType).as("node"))
      .distinct().join(nodes, Seq("node"), "left_semi"))
    val nSeeds = seedSet.count()
    require(nSeeds > 0,
      "personalizedPageRank: no seed appears in the graph's node set")
    val sv = nodes.join(seedSet.withColumn("__isSeed", lit(1)),
        Seq("node"), "left")
      .select(col("node"),
        when(col("__isSeed").isNotNull, lit(1.0) / lit(nSeeds.toDouble))
          .otherwise(lit(0.0)).as("sv"))
    val svPinned = cut(sv)
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val ep = cut(e.join(outw, Seq("src"))
      .select(col("src"), col("dst"),
        (col("w").cast(DoubleType) / col("ow").cast(DoubleType)).as("p")))
    val dangling = cut(svPinned.select(col("node"))
      .join(e.select(col("src").as("node")).distinct(), Seq("node"),
        "left_anti"))
    var ranks = svPinned.select(col("node"), col("sv").as("rank"))
    var i = 0
    while (i < iterations) {
      val in = ep.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg((sum(round(col("rank") * col("p") * lit(Q)).cast(LongType))
          .cast(DoubleType) / lit(Q)).as("in_r"))
      val dang = ranks.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum(round(col("rank") * lit(Q)).cast(LongType)), lit(0L))
          .cast(DoubleType).as("dang_q"))
        .select((col("dang_q") / lit(Q)).as("dang"))
      ranks = cut(svPinned.join(in, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          ((lit(1.0) - lit(damping)) * col("sv") +
            lit(damping) * (coalesce(col("in_r"), lit(0.0)) +
              col("dang") * col("sv"))).as("rank")))
      i += 1
    }
    ranks
  }

  /** Huber robust mean per group (q249) — the location M-estimator that
    * metric pipelines need when a handful of corrupt rows should not
    * move the reported mean (Huber 1964): IRLS with weights
    * w = min(1, k/|x−μ|), a fixed number of rounds from the plain mean.
    * `scaleCents` is the caller's robust scale in cents (feed q118's
    * MAD); k multiplies it (1.345 ≈ 95% Gaussian efficiency → pass
    * kCentiK = 134 for k=1.34).
    *
    * Exactness: values quantize to cents ONCE; each round's weights are
    * nano-quantized longs and the re-estimate is the q166 floor-division
    * micro-mean over Decimal(38) sums of wq·xc products (HUGEINT twins)
    * — every round replays bit-for-bit cross-engine, so the oracle
    * unrolls the rounds as chained CTEs (the pagerank/EM device).
    *
    * 100 TB shape: each round is ONE keyed aggregate over the rows with
    * a broadcast join back of the (1-row-per-group) estimates — rounds
    * are fixed (default 3), so the whole fit is `rounds` keyed shuffles,
    * partial-agg friendly. */
  def huberMean(df: DataFrame, valueCol: String, groupCol: String,
      scaleCents: Long, kCentiK: Long = 134, rounds: Int = 3): DataFrame = {
    require(scaleCents > 0, s"huberMean needs scaleCents > 0, got $scaleCents")
    require(rounds >= 1, s"huberMean needs rounds >= 1, got $rounds")
    val kq = scaleCents * kCentiK // k·scale in centi-cents
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"),
        round(col(valueCol) * lit(100.0)).cast(LongType).as("__xc"))
    // round 0: the plain micro-cent mean (q166's floor-div device)
    var est = base.groupBy(col("grp"))
      .agg(expr("(sum(__xc) * 10000) div count(1)").as("__mu_mc"),
        count(lit(1)).as("n"))
      .localCheckpoint()
    var i = 0
    while (i < rounds) {
      // |x − μ| in centi-cents (micro-cent μ floor-divided back): weight
      // wq = 1e9 iff inside k·scale, else k·scale/|x−μ| nano-quantized
      est = base.join(broadcast(est), Seq("grp"))
        .withColumn("__dev",
          abs(col("__xc") * lit(100L) - expr("__mu_mc div 100")))
        .withColumn("__wq",
          when(col("__dev") <= lit(kq), lit(1000000000L))
            .otherwise(round(lit(kq.toDouble) * lit(1.0e9) /
              col("__dev").cast(DoubleType)).cast(LongType)))
        .groupBy(col("grp"))
        .agg(expr(
          s"""(sum(cast(__wq as decimal(38,0)) * __xc) * 10000)
             |  div sum(cast(__wq as decimal(38,0)))""".stripMargin)
          .cast(LongType).as("__mu_mc"),
          count(lit(1)).as("n"),
          sum(when(col("__wq") < lit(1000000000L), lit(1L))
            .otherwise(lit(0L))).as("n_downweighted"))
        .localCheckpoint()
      i += 1
    }
    est.select(col("grp"), col("n"), col("n_downweighted"),
      (col("__mu_mc").cast(DoubleType) / lit(1.0e6)).as("huber_mean"))
  }

  /** Stratified average treatment effect (q250) — the
    * propensity-stratification baseline (Rosenbaum & Rubin 1984): cut
    * units into equal-count strata of a confounding covariate (integer
    * rank arithmetic over [[globalRank]], the q245 device), estimate the
    * treated−control gap inside each stratum where the covariate is
    * held roughly constant, and combine strata weighted by size. The
    * overall row carries stratum = −1.
    *
    * Exactness: cents sums per (stratum, arm) cell; means are single
    * double divisions; the overall ATE is assembled from the SAME cell
    * integers. Cells without both arms contribute NULL ate and drop
    * from the weighted overall (n counted over contributing strata).
    *
    * PRE-QUANTIZED CONTRACT: `covariateCol` must be integral — a
    * fractional covariate would truncate under a silent cast and
    * collapse the stratification, so non-integral inputs raise. */
  def stratifiedAte(units: DataFrame, covariateCol: String,
      treatedCol: String, valueCol: String, idCol: String,
      strata: Int = 5): DataFrame = {
    require(strata >= 2, s"stratifiedAte needs strata >= 2, got $strata")
    requirePreQuantized(units, covariateCol, "stratifiedAte", "covariate")
    val base = units.filter(col(valueCol).isNotNull)
      .select(col(idCol).as("__id"),
        col(covariateCol).cast(LongType).as("__cv"),
        col(treatedCol).cast(LongType).as("__t"),
        round(col(valueCol) * lit(100.0)).cast(LongType).as("__vc"))
    val nDf = base.agg(count(lit(1)).as("__n"))
    val ranked = globalRank(base, Seq("__cv", "__id"), "grank")
      .crossJoin(broadcast(nDf))
      .withColumn("stratum", expr(s"((grank - 1) * $strata) div __n"))
    val cells = ranked.groupBy(col("stratum"))
      .agg(sum(col("__t")).as("n_t"), sum(lit(1L) - col("__t")).as("n_c"),
        sum(col("__t") * col("__vc")).as("__st"),
        sum((lit(1L) - col("__t")) * col("__vc")).as("__sc"))
      .localCheckpoint() // feeds both the per-stratum rows and the overall
    def mean(s: Column, n: Column): Column =
      when(n === 0L, lit(null).cast(DoubleType))
        .otherwise(s.cast(DoubleType) / (lit(100.0) * n.cast(DoubleType)))
    val per = cells.select(col("stratum"), col("n_t"), col("n_c"),
      mean(col("__st"), col("n_t")).as("mean_t"),
      mean(col("__sc"), col("n_c")).as("mean_c"),
      (mean(col("__st"), col("n_t")) - mean(col("__sc"), col("n_c")))
        .as("ate"))
    // each stratum's weighted term micro-quantized to a long BEFORE the
    // sum — a raw double sum over strata would be aggregation-order-
    // dependent (house rule: never sum doubles across rows)
    val overall = cells
      .filter(col("n_t") > 0L && col("n_c") > 0L)
      .withColumn("__wq", round((col("n_t") + col("n_c")).cast(DoubleType) *
        (col("__st").cast(DoubleType) / (lit(100.0) * col("n_t").cast(DoubleType)) -
          col("__sc").cast(DoubleType) / (lit(100.0) * col("n_c").cast(DoubleType))) *
        lit(1.0e6)).cast(LongType))
      .agg(sum(col("n_t")).as("n_t"), sum(col("n_c")).as("n_c"),
        sum(col("__wq")).as("__q"), sum(col("n_t") + col("n_c")).as("__wn"))
      .select(lit(-1L).as("stratum"), col("n_t"), col("n_c"),
        lit(null).cast(DoubleType).as("mean_t"),
        lit(null).cast(DoubleType).as("mean_c"),
        (col("__q").cast(DoubleType) / lit(1.0e6) /
          col("__wn").cast(DoubleType)).as("ate"))
    per.unionAll(overall)
  }

  /** Deterministic weighted categorical sampling (q251) — map each
    * draw's hash onto the cumulative-weight number line and return the
    * item whose [hi−wq, hi) interval contains it: P(item) ∝ weight,
    * replayable because the caller's hashes are pure functions (q189's
    * md5 discipline). This is the primitive under word2vec-style
    * popularity-corrected negative sampling (unigram^0.75).
    *
    * Scale shape: the interval lookup is the q198 bucket-expansion
    * device, NOT a nested-loop range join — items explode into the
    * ⌈wq/B⌉+1 buckets their interval spans (ΣB-expansion ≤ V + buckets),
    * draws join on bucket EQUALITY, and the containment filter keeps
    * exactly one item per draw. Both sides shuffle once on the bucket
    * key; nothing is O(draws·items).
    *
    * Exactness: weights are caller-quantized longs, the cumulative line
    * comes from [[globalCumSum]] over the item order (must be total),
    * and u = hash % W is integer — bit-replayable cross-engine. */
  def weightedChoice(items: DataFrame, keyCol: String, weightQCol: String,
      draws: DataFrame, hashCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, s"weightedChoice needs buckets >= 1, got $buckets")
    val pos = items.filter(col(weightQCol) > 0L)
      .select(col(keyCol).as("__key"), col(weightQCol).cast(LongType).as("__wq"))
    // an empty (or all-zero-weight) item table would null the modulus
    // and silently drop every draw — fail loudly instead
    require(!pos.isEmpty,
      "weightedChoice: no items with positive weight — every draw would " +
        "silently drop")
    val cum = globalCumSum(pos, Seq("__key"), "__wq", "__hi")
      .localCheckpoint() // feeds the total AND the bucket explode
    val tot = cum.agg(sum(col("__wq")).as("__W"))
    val exploded = cum.crossJoin(broadcast(tot))
      .withColumn("__B", expr(s"(__W + ${buckets - 1}) div $buckets"))
      .select(col("__key"), col("__wq"), col("__hi"),
        explode(expr("sequence((__hi - __wq) div __B, (__hi - 1) div __B)"))
          .as("__bkt"))
    val d = draws.crossJoin(broadcast(tot))
      .withColumn("__u", pmod(col(hashCol), col("__W")))
      .withColumn("__bkt",
        expr(s"__u div ((__W + ${buckets - 1}) div $buckets)"))
      .drop("__W", hashCol)
    d.join(exploded, Seq("__bkt"))
      .filter(col("__u") >= col("__hi") - col("__wq") &&
        col("__u") < col("__hi"))
      .drop("__bkt", "__wq", "__hi", "__u")
      .withColumnRenamed("__key", "choice")
  }

  /** Distributed logistic-regression trainer over sparse features
    * (q253) — the fastText/CCNet-style quality-classifier loop run IN
    * the engine: full-batch gradient descent on hashed bag-of-words
    * ([[featureHash]] + a bias dim), a fixed number of rounds. Each
    * round is two keyed aggregates (per-doc score, per-dim gradient)
    * with the (tiny) weight vector broadcast — nothing anywhere is
    * proportional to the vocabulary, and rounds are the only sequential
    * structure.
    *
    * Input contracts: `features` = (id, dim, x) sparse rows;
    * `labels` = (id, y ∈ {0,1}), one row per id. Learning rate is
    * etaMilli/1000.
    *
    * Exactness: weights live as nano-quantized longs; round 1 is exp-
    * free (w=0 → p=0.5 exactly), later rounds nano-quantize the
    * residual after the sigmoid; the update divides with plain `div` —
    * Spark's `div` and DuckDB's integer `//` BOTH truncate toward zero
    * (the repo's verified rule: never a one-sided floor device), so
    * every round replays bit-for-bit even on negative gradients and the
    * oracle unrolls them as chained CTEs. Gradient sums are exact longs
    * to |Σ rq·x| < 9·10¹⁸ ≈ 10¹² tokens — switch the sum to
    * Decimal(38) past that. */
  def logisticTrainHashed(features: DataFrame, labels: DataFrame,
      rounds: Int = 3, etaMilli: Long = 500): DataFrame = {
    require(rounds >= 1, s"logisticTrainHashed needs rounds >= 1, got $rounds")
    require(etaMilli > 0, s"logisticTrainHashed needs etaMilli > 0")
    val f = features.select(col("id"), col("dim").cast(LongType).as("dim"),
      col("x").cast(LongType).as("x")).localCheckpoint()
    val yDf = labels.select(col("id"), col("y").cast(LongType).as("y"))
    logisticTrainQ(f, yDf, rounds, etaMilli).select(col("dim"),
      (col("wq").cast(DoubleType) / lit(1.0e9)).as("weight"))
  }

  /** The quantized GD loop shared by [[logisticTrainHashed]],
    * [[el2nPruneReport]], and [[datasetCartography]]: takes
    * ALREADY-normalized (id, dim, x long) features and (id, y long)
    * labels, returns the final (dim, wq) nano-quantized weights plus
    * the per-round residual trace (round r's residuals are computed
    * under the weights ENTERING round r — the same r1..rN CTEs the
    * oracle unrolls). */
  private[api] def logisticTrainTrace(f: DataFrame, yDf: DataFrame,
      rounds: Int, etaMilli: Long): (DataFrame, Seq[DataFrame]) = {
    val nDf = yDf.agg(count(lit(1)).as("__N"))
    var w = f.select(col("dim")).distinct()
      .withColumn("wq", lit(0L)).localCheckpoint()
    val traces = Seq.newBuilder[DataFrame]
    var r = 0
    while (r < rounds) {
      val z = f.join(broadcast(w), Seq("dim"))
        .groupBy(col("id"))
        .agg(sum(col("wq") * col("x")).as("zq"))
      val res = z.join(yDf, Seq("id"))
        .withColumn("rq", round((lit(1.0) / (lit(1.0) +
          exp(-(col("zq").cast(DoubleType) / lit(1.0e9)))) -
          col("y").cast(DoubleType)) * lit(1.0e6)).cast(LongType))
      traces += res
      val grad = f.join(res.select(col("id"), col("rq")), Seq("id"))
        .groupBy(col("dim"))
        .agg(sum(col("rq") * col("x")).as("gq"))
      w = w.join(grad, Seq("dim"), "left")
        .crossJoin(broadcast(nDf))
        .select(col("dim"),
          (col("wq") - expr(s"(coalesce(gq, 0) * $etaMilli) div __N"))
            .as("wq"))
        .localCheckpoint()
      r += 1
    }
    (w, traces.result())
  }

  private[api] def logisticTrainQ(f: DataFrame, yDf: DataFrame,
      rounds: Int, etaMilli: Long): DataFrame =
    logisticTrainTrace(f, yDf, rounds, etaMilli)._1

  /** Dataset cartography (Swayamdipta et al., EMNLP 2020) — the
    * training-dynamics curation map: per example, CONFIDENCE (mean
    * true-class probability across training rounds) × VARIABILITY
    * (probability range across rounds), bucketed into the quadrants
    * the paper acts on — `easy` (high-conf stable: compressible),
    * `ambiguous` (high variability: the most valuable training data),
    * `hard` (low-conf stable: label-noise suspects — cross-check with
    * q233). Probabilities are recovered EXACTLY from the GD loop's
    * micro-quantized residuals (p·10⁶ = rq + y·10⁶, true-class flip
    * for y = 0), skipping round 1 whose w = 0 probability is the
    * constant ½ for every example (no dynamics signal): with `rounds`
    * updates the trace is the probability under w₁..w_rounds, i.e.
    * rounds+1 loop iterations, final update discarded. Thresholds are
    * micro-integer comparisons; means are long sums with one division
    * chain. Everything is the q253 plan shape — per round two keyed
    * aggregates with the weight vector broadcast — plus one union'd
    * per-doc aggregate at the end. */
  def datasetCartography(features: DataFrame, labels: DataFrame,
      rounds: Int = 3, etaMilli: Long = 500,
      confHiMicro: Long = 700000L, confLoMicro: Long = 300000L,
      varMicro: Long = 200000L): DataFrame = {
    require(rounds >= 2, s"datasetCartography needs rounds >= 2, got $rounds")
    val f = features.select(col("id"), col("dim").cast(LongType).as("dim"),
      col("x").cast(LongType).as("x")).localCheckpoint()
    val yDf = labels.select(col("id"), col("y").cast(LongType).as("y"))
    val (_, traces) = logisticTrainTrace(f, yDf, rounds + 1, etaMilli)
    val pts = traces.drop(1).map(res =>
      res.select(col("id"),
        when(col("y") === 1L, col("rq") + lit(1000000L))
          .otherwise(lit(1000000L) - col("rq"))
          .as("ptq")))
      .reduce(_ unionAll _)
    val hi = confHiMicro * rounds
    val lo = confLoMicro * rounds
    pts.groupBy(col("id"))
      .agg(sum(col("ptq")).as("s"),
        (max(col("ptq")) - min(col("ptq"))).as("rng"))
      .withColumn("quadrant",
        when(col("rng") > varMicro, lit("ambiguous"))
          .when(col("s") >= hi, lit("easy"))
          .when(col("s") <= lo, lit("hard"))
          .otherwise(lit("medium")))
      .groupBy(col("quadrant"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("s")).cast(DoubleType) / count(lit(1)).cast(DoubleType) /
          lit(rounds * 1.0e6)).as("mean_conf"),
        (sum(col("rng")).cast(DoubleType) / count(lit(1)).cast(DoubleType) /
          lit(1.0e6)).as("mean_variability"))
      .orderBy(col("quadrant"))
  }

  /** Covariate-shift importance reweighting + ESS diagnostic (q289) —
    * the distribution-matching audit run before trusting any metric
    * computed on a convenience sample: train the
    * [[logisticTrainHashed]] probe to distinguish target-population
    * rows (y = 1) from source rows (y = 0), weight each source row by
    * the density-ratio estimate w = p/(1−p), and report (a) Kish's
    * effective sample size (Σw)²/Σw² — how many target-like examples
    * the source corpus is actually worth — and (b) the weighted vs
    * unweighted source mean of `values` next to the true target mean,
    * the self-check that the reweighting moves the estimate the right
    * way. Low ESS ratio = the source barely overlaps the target;
    * reweighting cannot fix that, only say it loudly.
    *
    * Scale shape: the probe is the q253 loop (broadcast weights, two
    * keyed aggregates per round); scoring is one more broadcast join +
    * keyed aggregate; everything after is a single 1-row aggregate.
    * Exactness: probabilities micro-quantized then clamped to
    * [1, 999999] (the standard weight clip — unclipped w explodes as
    * p→1); weights micro-quantized longs; all sums Decimal(38); the
    * ESS/mean chains are single fixed double expressions. */
  def covariateShiftEss(features: DataFrame, labels: DataFrame,
      values: DataFrame, rounds: Int = 3, etaMilli: Long = 500)
      : DataFrame = {
    require(rounds >= 1, s"covariateShiftEss needs rounds >= 1")
    require(etaMilli > 0, "covariateShiftEss needs etaMilli > 0")
    val f = features.select(col("id"), col("dim").cast(LongType).as("dim"),
      col("x").cast(LongType).as("x")).localCheckpoint()
    val yDf = labels.select(col("id"), col("y").cast(LongType).as("y"))
    val vDf = values.select(col("id"), col("v").cast(LongType).as("v"))
    val w = logisticTrainQ(f, yDf, rounds, etaMilli)
    val scored = f.join(broadcast(w), Seq("dim"))
      .groupBy(col("id"))
      .agg(sum(col("wq") * col("x")).as("zq"))
      .join(yDf, Seq("id")).join(vDf, Seq("id"))
      .withColumn("pq", greatest(least(
        round((lit(1.0) / (lit(1.0) +
          exp(-(col("zq").cast(DoubleType) / lit(1.0e9))))) * lit(1.0e6))
          .cast(LongType), lit(999999L)), lit(1L)))
      .withColumn("wgt", round(col("pq").cast(DoubleType) /
        (lit(1000000.0) - col("pq").cast(DoubleType)) * lit(1.0e6))
        .cast(LongType))
    val src = scored.filter(col("y") === 0L).agg(
      count(lit(1)).as("n_source"),
      sum(col("wgt").cast(DecimalType(38, 0))).as("sw"),
      sum(col("wgt").cast(DecimalType(38, 0)) *
        col("wgt").cast(DecimalType(38, 0))).as("sw2"),
      sum(col("wgt").cast(DecimalType(38, 0)) *
        col("v").cast(DecimalType(38, 0))).as("swv"),
      sum(col("v").cast(DecimalType(38, 0))).as("sv"))
    val tgt = scored.filter(col("y") === 1L).agg(
      count(lit(1)).as("n_target"),
      sum(col("v").cast(DecimalType(38, 0))).as("stv"))
    src.crossJoin(broadcast(tgt))
      .withColumn("ess", col("sw").cast(DoubleType) *
        col("sw").cast(DoubleType) / col("sw2").cast(DoubleType))
      .select(col("n_source"), col("n_target"), col("ess"),
        (col("ess") / col("n_source").cast(DoubleType)).as("ess_ratio"),
        (col("swv").cast(DoubleType) / col("sw").cast(DoubleType))
          .as("weighted_mean"),
        (col("sv").cast(DoubleType) / col("n_source").cast(DoubleType))
          .as("source_mean"),
        (col("stv").cast(DoubleType) / col("n_target").cast(DoubleType))
          .as("target_mean"))
  }

  /** TracIn influence attribution (q286) — Pruthi et al. 2020's
    * checkpoint form: the influence of training example z on probe z'
    * is Σ_t η·g_t(z)·g_t(z') over the training checkpoints. For the
    * [[logisticTrainHashed]] model the per-example gradient factors as
    * (p_t−y)·x, so the checkpoint sum SEPARATES:
    *   influence(z, z') = (η/N) · (x·x') · Σ_t r_t(z)·r_t(z')
    * — the feature dot is round-independent and the residual trace is
    * exactly what [[logisticTrainTrace]] already micro-quantizes. No
    * per-checkpoint weight vectors are ever materialized per pair.
    *
    * Scale shape: probes are a FIXED-size set (broadcast twice — once
    * as a rounds×P residual table, once as a P×dims feature block), so
    * both dot products are broadcast joins + keyed aggregates over
    * corpus-shaped streams: n·rounds·P residual terms, n·nnz·P/dims
    * feature terms, all map-side combined. The per-probe top-k is the
    * ccnetBuckets device — [[globalRank]] over (pid, −score, id) plus a
    * broadcast per-probe offset join — never a per-probe window over
    * the corpus.
    *
    * Exactness: residual dots are exact long sums of micro-residual
    * products; the pair score xd·rdq is an exact Decimal(38) product
    * (ranked as an integer, ties on id); the reported influence is one
    * fixed double chain (pq/10¹² · η / N). Self-pairs are excluded. */
  def tracinInfluence(features: DataFrame, labels: DataFrame,
      probeIds: DataFrame, rounds: Int = 3, etaMilli: Long = 500,
      topK: Int = 5): DataFrame = {
    require(rounds >= 1, s"tracinInfluence needs rounds >= 1, got $rounds")
    require(etaMilli > 0, "tracinInfluence needs etaMilli > 0")
    require(topK >= 1, s"tracinInfluence needs topK >= 1, got $topK")
    val f = features.select(col("id"), col("dim").cast(LongType).as("dim"),
      col("x").cast(LongType).as("x")).localCheckpoint()
    val yDf = labels.select(col("id"), col("y").cast(LongType).as("y"))
    val pids = probeIds.select(col("id").cast(LongType).as("pid"))
    val (_, traces) = logisticTrainTrace(f, yDf, rounds, etaMilli)
    val trace = traces.zipWithIndex.map { case (res, i) =>
      res.select(col("id"), lit(i.toLong).as("r"), col("rq"))
    }.reduce(_ unionAll _)
    val ptrace = trace.join(broadcast(pids), col("id") === col("pid"))
      .select(col("pid"), col("r"), col("rq").as("prq"))
    val resdot = trace.join(broadcast(ptrace), Seq("r"))
      .filter(col("id") =!= col("pid"))
      .groupBy(col("id"), col("pid"))
      .agg(sum(col("rq") * col("prq")).as("rdq"))
    val pf = f.join(broadcast(pids), col("id") === col("pid"))
      .select(col("pid"), col("dim"), col("x").as("px"))
    val xdot = f.join(broadcast(pf), Seq("dim"))
      .filter(col("id") =!= col("pid"))
      .groupBy(col("id"), col("pid"))
      .agg(sum(col("x") * col("px")).as("xd"))
    val nDf = yDf.agg(count(lit(1)).as("__N"))
    val pairs = resdot.join(xdot, Seq("id", "pid"))
      .withColumn("pq", col("xd").cast(DecimalType(38, 0)) *
        col("rdq").cast(DecimalType(38, 0)))
    val ranked = globalRank(pairs.withColumn("negpq", -col("pq")),
      Seq("pid", "negpq", "id"), "grank")
    val offs = ranked.groupBy(col("pid")).agg(min(col("grank")).as("__off"))
    ranked.join(broadcast(offs), Seq("pid"))
      .withColumn("rnk", col("grank") - col("__off") + lit(1L))
      .filter(col("rnk") <= topK)
      .crossJoin(broadcast(nDf))
      .select(col("pid").as("probe_id"), col("rnk"),
        col("id").as("doc_id"),
        (col("pq").cast(DoubleType) / lit(1.0e12) *
          lit(etaMilli.toDouble / 1000.0) /
          col("__N").cast(DoubleType)).as("influence"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** EL2N data-pruning report (q276) — the "easy examples teach
    * nothing" curation pass (Paul et al. 2021; Sorscher et al. 2022
    * use exactly this score to beat power-law scaling): train the
    * [[logisticTrainHashed]] quality classifier, score every example's
    * error norm |p − y| (for a binary logistic model the EL2N margin),
    * decile-rank the corpus by it, and report per-decile volume + mean
    * score with the prune/keep decision for the lowest `pruneDeciles`
    * deciles. The model pass is the q253 loop verbatim (broadcast
    * weight vector, two keyed aggregates per round); scoring adds ONE
    * more broadcast join + aggregate; the decile cut is the two-phase
    * parallel order statistic (globalRank), never a one-partition
    * window — so the whole report is corpus-shaped work at any scale.
    *
    * Exactness: scores are micro-quantized longs (|round((p−y)·10⁶)|),
    * rank ties break on id, per-decile means are long sums with a
    * single division chain — the full report hash-replays in the
    * unrolled-CTE oracle. */
  def el2nPruneReport(features: DataFrame, labels: DataFrame,
      rounds: Int = 3, etaMilli: Long = 500, deciles: Int = 10,
      pruneDeciles: Int = 2): DataFrame = {
    require(deciles >= 2, s"el2nPruneReport needs deciles >= 2, got $deciles")
    require(pruneDeciles >= 0 && pruneDeciles < deciles,
      s"el2nPruneReport needs 0 <= pruneDeciles < deciles")
    val f = features.select(col("id"), col("dim").cast(LongType).as("dim"),
      col("x").cast(LongType).as("x")).localCheckpoint()
    val yDf = labels.select(col("id"), col("y").cast(LongType).as("y"))
    val w = logisticTrainQ(f, yDf, rounds, etaMilli)
    val scored = f.join(broadcast(w), Seq("dim"))
      .groupBy(col("id"))
      .agg(sum(col("wq") * col("x")).as("zq"))
      .join(yDf, Seq("id"))
      .withColumn("elq", abs(round((lit(1.0) / (lit(1.0) +
        exp(-(col("zq").cast(DoubleType) / lit(1.0e9)))) -
        col("y").cast(DoubleType)) * lit(1.0e6)).cast(LongType)))
      .select(col("id"), col("elq"))
    val nDf = scored.agg(count(lit(1)).as("__n"))
    globalRank(scored, Seq("elq", "id"), "grank")
      .crossJoin(broadcast(nDf))
      .withColumn("decile", expr(s"((grank - 1) * $deciles) div __n"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("elq")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType) / lit(1.0e6)).as("mean_el2n"))
      .withColumn("action",
        when(col("decile") < pruneDeciles, lit("prune")).otherwise(lit("keep")))
      .orderBy(col("decile"))
  }

  /** Black-box label-shift estimation (BBSE, Lipton et al. 2018) —
    * "the target slice has a different class mix; how much?": under
    * label shift the classifier's confusion rates are invariant, so
    * the target prior solves p̂ = c11·q + c01·(1−q), i.e.
    * q = (p̂ − c01)/(c11 − c01) — NO target labels needed. The naive
    * answer (read the predicted-positive rate directly) is biased by
    * exactly the classifier's error rates; BBSE inverts them out. The
    * prior-estimation sibling of q289's covariate-shift probe, and the
    * held-out true prior is emitted so the estimator's error is data.
    *
    * Predictions are EXACT integer sign tests (z > 0) on the nano
    * weight dots; confusion cells and rates are counts with single
    * divisions; the degenerate classifier (c11 = c01, detected by
    * exact cross-multiplication) yields NULL instead of an exploding
    * inverse. One probe + two scoring passes, all broadcast joins. */
  def labelShiftBbse(features: DataFrame, labels: DataFrame,
      trainIds: DataFrame, calibIds: DataFrame, targetIds: DataFrame,
      rounds: Int = 3, etaMilli: Long = 500): DataFrame = {
    val f = features.select(col("id"), col("dim").cast(LongType).as("dim"),
      col("x").cast(LongType).as("x")).localCheckpoint()
    val yDf = labels.select(col("id"), col("y").cast(LongType).as("y"))
    val w = logisticTrainQ(f.join(trainIds.select(col("id")), Seq("id"), "left_semi"),
      yDf.join(trainIds.select(col("id")), Seq("id"), "left_semi"),
      rounds, etaMilli)
    def scored(ids: DataFrame): DataFrame =
      f.join(ids.select(col("id")), Seq("id"), "left_semi")
        .join(broadcast(w), Seq("dim"))
        .groupBy(col("id")).agg(sum(col("wq") * col("x")).as("zq"))
        .join(yDf, Seq("id"))
        .select(col("y"), (col("zq") > 0L).cast(LongType).as("pred"))
    val cal = scored(calibIds).agg(count(lit(1)).as("n_cal"),
      sum(col("y")).as("n1"), sum(col("y") * col("pred")).as("p11"),
      sum(lit(1L) - col("y")).as("n0"),
      sum((lit(1L) - col("y")) * col("pred")).as("p01"))
    val tgt = scored(targetIds).agg(count(lit(1)).as("n_target"),
      sum(col("pred")).as("pt"), sum(col("y")).as("ty"))
    val c11 = col("p11").cast(DoubleType) / col("n1").cast(DoubleType)
    val c01 = col("p01").cast(DoubleType) / col("n0").cast(DoubleType)
    val phat = col("pt").cast(DoubleType) / col("n_target").cast(DoubleType)
    val nondeg = col("p11") * col("n0") =!= col("p01") * col("n1")
    val q1 = least(lit(1.0), greatest(lit(0.0), (phat - c01) / (c11 - c01)))
    val trueQ = col("ty").cast(DoubleType) / col("n_target").cast(DoubleType)
    cal.crossJoin(tgt).select(
      col("n_cal"), col("n_target"),
      round(c11, 9).as("c11"), round(c01, 9).as("c01"),
      round(phat, 6).as("q1_naive"),
      when(nondeg, round(q1, 6)).otherwise(lit(null).cast(DoubleType))
        .as("q1_bbse"),
      round(trueQ, 9).as("true_q1"),
      when(nondeg, round(q1 - trueQ, 6)).otherwise(lit(null).cast(DoubleType))
        .as("bbse_err"))
  }

  /** Selective-prediction risk–coverage report (Geifman & El-Yaniv
    * 2017) — "if the model may abstain, how good is what it keeps?":
    * rank held-out examples by confidence, report cumulative error
    * rate at each coverage decile plus AURC (area under the
    * risk–coverage curve — the abstention-aware quality number a
    * routing/escalation policy is tuned against). A well-ranked model
    * shows risk rising monotonically with coverage; flat = confidence
    * carries no signal (the selective twin of q162's calibration
    * check).
    *
    * Confidence is the EXACT integer |z| (|p−½| is monotone in it —
    * no probability is ever materialized), predictions are integer
    * sign tests, the rank is the two-phase [[globalRank]], cumulative
    * counts ride [[globalCumSum]] over the 10-row decile table, and
    * AURC averages nano-quantized decile risks. */
  def selectiveRiskReport(features: DataFrame, labels: DataFrame,
      evalIds: DataFrame, rounds: Int = 3, etaMilli: Long = 500): DataFrame = {
    val f = features.select(col("id"), col("dim").cast(LongType).as("dim"),
      col("x").cast(LongType).as("x")).localCheckpoint()
    val yDf = labels.select(col("id"), col("y").cast(LongType).as("y"))
    val ev = evalIds.select(col("id"))
    val w = logisticTrainQ(f.join(ev, Seq("id"), "left_anti"),
      yDf.join(ev, Seq("id"), "left_anti"), rounds, etaMilli)
    val sc = f.join(ev, Seq("id"), "left_semi")
      .join(broadcast(w), Seq("dim"))
      .groupBy(col("id")).agg(sum(col("wq") * col("x")).as("zq"))
      .join(yDf, Seq("id"))
      .select(col("id"), (-abs(col("zq"))).as("negconf"),
        ((col("zq") > 0L).cast(LongType) =!= col("y")).cast(LongType)
          .as("err"))
    val nDf = sc.agg(count(lit(1)).as("__n"))
    val dec = globalRank(sc, Seq("negconf", "id"), "grank")
      .crossJoin(broadcast(nDf))
      .withColumn("decile", expr("((grank - 1) * 10) div __n"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_d"), sum(col("err")).as("e_d"))
    val rq = globalCumSum(globalCumSum(dec, Seq("decile"), "n_d", "cn"),
        Seq("decile"), "e_d", "ce")
      .withColumn("riskq", round(col("ce").cast(DoubleType) /
        col("cn").cast(DoubleType) * lit(1.0e9)).cast(LongType))
      .localCheckpoint() // feeds AURC AND the decile rows
    val au = rq.agg(sum(col("riskq")).as("__s"))
      .select(round((col("__s").cast(DoubleType) / lit(1.0e9)) / lit(10.0), 6)
        .as("aurc"))
    rq.crossJoin(broadcast(nDf)).crossJoin(broadcast(au))
      .select(col("decile"),
        round(col("cn").cast(DoubleType) / col("__n").cast(DoubleType), 6)
          .as("coverage"),
        col("cn").as("n_covered"), col("ce").as("errors"),
        round(col("riskq").cast(DoubleType) / lit(1.0e9), 6).as("risk"),
        col("aurc"))
      .orderBy(col("decile"))
  }

  /** Gradient-noise scale (McCandlish et al. 2018) — the critical-
    * batch-size planner: B_simple = tr(Σ)/|G|², the ratio of per-
    * example gradient variance to squared mean gradient under the
    * trained probe. Batches past B_simple stop buying optimization
    * progress — the number that sizes data-parallel training for the
    * corpus this engine curates. The logistic gradient factors as
    * (p−y)·x, so per-example gradients are EXACT integers rq·x (micro
    * residual × feature), and both traces collapse to per-dim moment
    * sums: tr(Σ) = Σ_d (N·Sgg_d − Sg_d²)/(N(N−1)), |G|² = Σ_d Sg_d²/N².
    * B = N·Σ(N·Sgg−Sg²) / ((N−1)·ΣSg²) — one division on exact
    * Decimal(38) sums; the 1e6 residual scale cancels.
    *
    * 100 TB shape: the q253 loop + ONE feature-keyed moment aggregate
    * + a 1-row reduce; nothing new shuffles. */
  def gradientNoiseScale(features: DataFrame, labels: DataFrame,
      rounds: Int = 3, etaMilli: Long = 500): DataFrame = {
    val D = DecimalType(38, 0)
    val f = features.select(col("id"), col("dim").cast(LongType).as("dim"),
      col("x").cast(LongType).as("x")).localCheckpoint()
    val yDf = labels.select(col("id"), col("y").cast(LongType).as("y"))
    val w = logisticTrainQ(f, yDf, rounds, etaMilli)
    val rq = f.join(broadcast(w), Seq("dim"))
      .groupBy(col("id")).agg(sum(col("wq") * col("x")).as("zq"))
      .join(yDf, Seq("id"))
      .select(col("id"), round((lit(1.0) / (lit(1.0) +
        exp(-(col("zq").cast(DoubleType) / lit(1.0e9)))) -
        col("y").cast(DoubleType)) * lit(1.0e6)).cast(LongType).as("rq"))
      .localCheckpoint() // feeds N AND the gradient table
    val nD = rq.agg(count(lit(1)).as("N"))
    val perDim = f.join(rq, Seq("id"))
      .select(col("dim"), (col("rq") * col("x")).as("g"))
      .groupBy(col("dim"))
      .agg(sum(col("g").cast(D)).as("sg"),
        sum(col("g").cast(D) * col("g").cast(D)).as("sgg"))
    perDim.crossJoin(broadcast(nD))
      .select(col("N"),
        (col("N").cast(D) * col("sgg") - col("sg") * col("sg")).as("vnum"),
        (col("sg") * col("sg")).as("g2"))
      .groupBy(col("N"))
      .agg(count(lit(1)).as("n_dims"),
        sum(col("vnum")).as("__tr"), sum(col("g2")).as("__g2"))
      .select(col("N").as("n_docs"), col("n_dims"),
        round(col("__g2").cast(DoubleType) /
          (col("N").cast(D) * col("N").cast(D)).cast(DoubleType) /
          lit(1.0e12), 9).as("grad_norm2"),
        round(col("__tr").cast(DoubleType) /
          (col("N").cast(D) * (col("N") - lit(1L)).cast(D))
            .cast(DoubleType) / lit(1.0e12), 9).as("trace_sigma"),
        round((col("N").cast(D) * col("__tr")).cast(DoubleType) /
          ((col("N") - lit(1L)).cast(D) * col("__g2")).cast(DoubleType), 6)
          .as("b_noise"))
  }

  /** Temperature-scaling calibration fit (Guo et al. 2017) — the
    * one-parameter post-hoc fix for over/under-confident classifiers:
    * grid the softmax temperature on a held-out calibration slice and
    * report NLL per candidate with the argmin flagged. T* > 1 says the
    * probe is overconfident (divide logits before trusting its
    * probabilities in selection gates like q276/q308); T* = 1 says
    * calibrated as-is.
    *
    * One probe training + ONE calibration scoring pass; the ∓z margin
    * is computed once and fanned out over the broadcast temperature
    * grid, per-(doc, T) NLL micro-quantized before exact keyed sums;
    * the argmin compares exact integers with a low-T tie-break. */
  def temperatureScaling(features: DataFrame, labels: DataFrame,
      calibIds: DataFrame, rounds: Int = 3, etaMilli: Long = 500,
      temps: Seq[Double] = Seq(0.25, 0.5, 1.0, 2.0, 4.0)): DataFrame = {
    require(temps.nonEmpty && temps.forall(_ > 0.0),
      "temperatureScaling needs a non-empty positive temperature grid")
    val f = features.select(col("id"), col("dim").cast(LongType).as("dim"),
      col("x").cast(LongType).as("x")).localCheckpoint()
    val yDf = labels.select(col("id"), col("y").cast(LongType).as("y"))
    val cal = calibIds.select(col("id"))
    val w = logisticTrainQ(f.join(cal, Seq("id"), "left_anti"),
      yDf.join(cal, Seq("id"), "left_anti"), rounds, etaMilli)
    val mz = f.join(cal, Seq("id"), "left_semi")
      .join(broadcast(w), Seq("dim"))
      .groupBy(col("id")).agg(sum(col("wq") * col("x")).as("zq"))
      .join(yDf.join(cal, Seq("id"), "left_semi"), Seq("id"))
      .select(col("id"),
        when(col("y") === 1L, -col("zq").cast(DoubleType))
          .otherwise(col("zq").cast(DoubleType)).as("mz"))
      .localCheckpoint()
    val spark = features.sparkSession
    import spark.implicits._
    val tDf = temps.toDF("temperature")
    val ag = mz.crossJoin(broadcast(tDf))
      .select(col("temperature"),
        round(log(lit(1.0) + exp((col("mz") / lit(1.0e9)) /
          col("temperature"))) * lit(1.0e6)).cast(LongType).as("ceq"))
      .groupBy(col("temperature"))
      .agg(sum(col("ceq")).as("sq"), count(lit(1)).as("n"))
      .localCheckpoint() // feeds the argmin AND the output rows
    val best = ag.orderBy(col("sq"), col("temperature")).limit(1)
      .select(col("temperature").as("bt"))
    ag.crossJoin(broadcast(best))
      .select(col("temperature"),
        round((col("sq").cast(DoubleType) / lit(1.0e6)) /
          col("n").cast(DoubleType), 6).as("mean_nll"),
        (col("temperature") === col("bt")).cast(LongType).as("is_best"))
      .orderBy(col("temperature"))
  }

  /** RHO-loss selection report (Mindermann et al. 2022) — prioritize
    * points that are "learnable, worth learning, and not yet learnt":
    * reducible holdout loss rho(x) = CE(x | train-model) −
    * CE(x | holdout-model). High rho = the current model gets x wrong
    * but a model that never saw x finds it predictable (worth
    * training on); rho ≈ 0 flags already-learnt redundancy; NEGATIVE
    * rho flags noise/mislabels (even a clean-data model can't predict
    * it — the selection-side view of q233's label-noise audit).
    *
    * Two [[logisticTrainHashed]]-style GD probes on disjoint slices
    * (train = everything outside `holdoutIds`, irreducible-loss model
    * = the holdout only), then one scoring pass over the train slice:
    * per-doc cross-entropy ln(1+exp(∓z)) micro-quantized under EACH
    * model, rho as an exact long difference, decile-cut with the
    * [[globalRank]] device and 'select' on the top `selectDeciles`.
    * Features absent from a model's slice carry weight 0 (inner join
    * on the weight table — every doc keeps its bias row). Per round
    * each probe is two keyed aggregates with the weight vector
    * broadcast; nothing scales worse than q253. */
  def rhoLossReport(features: DataFrame, labels: DataFrame,
      holdoutIds: DataFrame, rounds: Int = 3, etaMilli: Long = 500,
      deciles: Int = 10, selectDeciles: Int = 2): DataFrame = {
    require(deciles >= 2, s"rhoLossReport needs deciles >= 2, got $deciles")
    require(selectDeciles >= 0 && selectDeciles < deciles,
      s"rhoLossReport needs 0 <= selectDeciles < deciles")
    val f = features.select(col("id"), col("dim").cast(LongType).as("dim"),
      col("x").cast(LongType).as("x")).localCheckpoint()
    val yDf = labels.select(col("id"), col("y").cast(LongType).as("y"))
    val ho = holdoutIds.select(col("id"))
    val fTr = f.join(ho, Seq("id"), "left_anti").localCheckpoint()
    val yTr = yDf.join(ho, Seq("id"), "left_anti").localCheckpoint()
    val wA = logisticTrainQ(fTr, yTr, rounds, etaMilli)
    val wB = logisticTrainQ(f.join(ho, Seq("id"), "left_semi"),
      yDf.join(ho, Seq("id"), "left_semi"), rounds, etaMilli)
    def ceq(w: DataFrame, name: String): DataFrame =
      fTr.join(broadcast(w), Seq("dim"))
        .groupBy(col("id")).agg(sum(col("wq") * col("x")).as("zq"))
        .join(yTr, Seq("id"))
        .withColumn(name,
          round(log(lit(1.0) + exp(
            when(col("y") === 1L, -col("zq").cast(DoubleType))
              .otherwise(col("zq").cast(DoubleType)) / lit(1.0e9))) *
            lit(1.0e6)).cast(LongType))
        .select(col("id"), col(name))
    val scored = ceq(wA, "cea").join(ceq(wB, "ceb"), Seq("id"))
      .select(col("id"), (col("cea") - col("ceb")).as("rhoq"))
    val nDf = scored.agg(count(lit(1)).as("__n"))
    globalRank(scored, Seq("rhoq", "id"), "grank")
      .crossJoin(broadcast(nDf))
      .withColumn("decile", expr(s"((grank - 1) * $deciles) div __n"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("rhoq")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType) / lit(1.0e6)).as("mean_rho"))
      .withColumn("action",
        when(col("decile") >= deciles - selectDeciles, lit("select"))
          .otherwise(lit("skip")))
      .orderBy(col("decile"))
  }

  /** Data scaling-law fit (Kaplan et al. 2020's data term) — the
    * will-more-data-help planner: train the SAME probe on nested
    * training slices, score each on ONE fixed held-out slice, and fit
    * the power law L(N) = a·N^(−α) by log-log OLS. α near 0 = the
    * corpus is saturated for this capability (collect different data,
    * not more); α > 0 quantifies the marginal value of scale — the
    * measured counterpart of q283's Heaps-law vocabulary curve, on
    * LOSS instead of vocabulary.
    *
    * Per slice one [[logisticTrainHashed]]-style GD probe + one
    * holdout scoring pass (micro-quantized softplus CE, exact long
    * sums, fixed mean chain); the fit runs over the #slices-row table
    * with nano-quantized ln points and exact Decimal(38) OLS moments —
    * the quantization scale cancels in the slope ratio. Output: one
    * row per slice (n_train, holdout_ce) with the fitted alpha
    * broadcast onto every row. */
  def scalingLawFit(features: DataFrame, labels: DataFrame,
      trainSlices: Seq[(String, DataFrame)], evalIds: DataFrame,
      rounds: Int = 3, etaMilli: Long = 500): DataFrame = {
    require(trainSlices.size >= 2,
      s"scalingLawFit needs >= 2 slices, got ${trainSlices.size}")
    val D = DecimalType(38, 0)
    val f = features.select(col("id"), col("dim").cast(LongType).as("dim"),
      col("x").cast(LongType).as("x")).localCheckpoint()
    val yDf = labels.select(col("id"), col("y").cast(LongType).as("y"))
    val ev = evalIds.select(col("id"))
    val fEv = f.join(ev, Seq("id"), "left_semi").localCheckpoint()
    val yEv = yDf.join(ev, Seq("id"), "left_semi").localCheckpoint()
    val sliceRows = trainSlices.map { case (name, ids) =>
      val tr = ids.select(col("id"))
      val w = logisticTrainQ(f.join(tr, Seq("id"), "left_semi"),
        yDf.join(tr, Seq("id"), "left_semi"), rounds, etaMilli)
      val ce = fEv.join(broadcast(w), Seq("dim"))
        .groupBy(col("id")).agg(sum(col("wq") * col("x")).as("zq"))
        .join(yEv, Seq("id"))
        .select(round(log(lit(1.0) + exp(
          when(col("y") === 1L, -col("zq").cast(DoubleType))
            .otherwise(col("zq").cast(DoubleType)) / lit(1.0e9))) *
          lit(1.0e6)).cast(LongType).as("ceq"))
        .agg(sum(col("ceq")).as("sq"), count(lit(1)).as("n_eval"))
      val nTr = yDf.join(tr, Seq("id"), "left_semi")
        .agg(count(lit(1)).as("n_train"))
      nTr.crossJoin(ce).select(lit(name).as("slice"),
        col("n_train"), col("n_eval"), col("sq"))
    }
    val pts = sliceRows.reduce(_ unionAll _)
      .withColumn("ce", (col("sq").cast(DoubleType) / lit(1.0e6)) /
        col("n_eval").cast(DoubleType))
      .withColumn("xq",
        round(log(col("n_train").cast(DoubleType)) * lit(1.0e9))
          .cast(LongType))
      .withColumn("yq", round(log(col("ce")) * lit(1.0e9)).cast(LongType))
      .localCheckpoint() // feeds the fit AND the output rows
    val fit = pts.agg(count(lit(1)).as("m"),
        sum(col("xq").cast(D)).as("sxq"), sum(col("yq").cast(D)).as("syq"),
        sum(col("xq").cast(D) * col("yq").cast(D)).as("sxy"),
        sum(col("xq").cast(D) * col("xq").cast(D)).as("sxx"))
      .select(round(-((col("m").cast(D) * col("sxy") -
        col("sxq") * col("syq")).cast(DoubleType) /
        (col("m").cast(D) * col("sxx") - col("sxq") * col("sxq"))
          .cast(DoubleType)), 6).as("alpha"))
    pts.crossJoin(broadcast(fit))
      .select(col("slice"), col("n_train"), col("n_eval"),
        round(col("ce"), 6).as("holdout_ce"), col("alpha"))
      .orderBy(col("slice"))
  }

  /** Inverse-propensity-weighted ATE (q254) — [[stratifiedAte]]'s
    * estimator sibling on the SAME strata, with LAPLACE-SMOOTHED
    * propensities ê_s = (n_t+1)/(n_t+n_c+2): the Horvitz–Thompson form
    * ATE = (1/N)·Σ_s (S_t,s/ê_s − S_c,s/(1−ê_s)). Under raw frequency
    * propensities HT-IPW is ALGEBRAICALLY the size-weighted stratified
    * estimator — the smoothing is what makes this a genuinely distinct
    * robustness check, keeps weights finite, and lets one-armed strata
    * contribute instead of being dropped. Agreement between q250 and
    * q254 is the standard sanity gate before trusting either.
    *
    * Exactness: cents cells; each stratum's two rescaled terms (exact
    * integer numerators st·(n_t+n_c+2), denominators n_t+1) are
    * micro-quantized longs before the cross-strata sum. */
  def ipwAte(units: DataFrame, covariateCol: String, treatedCol: String,
      valueCol: String, idCol: String, strata: Int = 5): DataFrame = {
    require(strata >= 2, s"ipwAte needs strata >= 2, got $strata")
    requirePreQuantized(units, covariateCol, "ipwAte", "covariate")
    val base = units.filter(col(valueCol).isNotNull)
      .select(col(idCol).as("__id"),
        col(covariateCol).cast(LongType).as("__cv"),
        col(treatedCol).cast(LongType).as("__t"),
        round(col(valueCol) * lit(100.0)).cast(LongType).as("__vc"))
    val nDf = base.agg(count(lit(1)).as("__n"))
    val cells = globalRank(base, Seq("__cv", "__id"), "grank")
      .crossJoin(broadcast(nDf))
      .withColumn("stratum", expr(s"((grank - 1) * $strata) div __n"))
      .groupBy(col("stratum"))
      .agg(sum(col("__t")).as("n_t"), sum(lit(1L) - col("__t")).as("n_c"),
        sum(col("__t") * col("__vc")).as("__st"),
        sum((lit(1L) - col("__t")) * col("__vc")).as("__sc"))
    val terms = cells.withColumn("__tq", round(
      (col("__st").cast(DoubleType) *
        (col("n_t") + col("n_c") + lit(2L)).cast(DoubleType) /
        (col("n_t") + lit(1L)).cast(DoubleType) -
        col("__sc").cast(DoubleType) *
          (col("n_t") + col("n_c") + lit(2L)).cast(DoubleType) /
          (col("n_c") + lit(1L)).cast(DoubleType)) * lit(1.0e4))
      .cast(LongType))
    terms.agg(sum(col("n_t") + col("n_c")).as("n_units"),
        sum(col("__tq")).as("__q"))
      .select(col("n_units"),
        (col("__q").cast(DoubleType) / lit(1.0e4) / lit(100.0) /
          col("n_units").cast(DoubleType)).as("ate_ipw"))
  }

  /** Doubly-robust AIPW ATE (Robins, Rotnitzky & Zhao 1994) — the
    * augmented estimator that corrects a MISSPECIFIED outcome model
    * with propensity-weighted residuals: here the outcome model is
    * deliberately the crudest one (global arm means, ignoring the
    * covariate entirely) and the per-stratum residual corrections
    * repair it. With the raw within-stratum propensities n_t/n_s the
    * repair is ALGEBRAIC — ate_aipw equals [[stratifiedAte]]'s overall
    * identically (the in-sample double-robustness identity, reported
    * as the cross-check); `ate_aipw_smoothed` swaps in [[ipwAte]]'s
    * Laplace-smoothed (n_t+1)/(n_s+2) propensities, which keeps
    * one-armed strata contributing (raw drops them like q250).
    *
    * Exactness: cents-integer stratum sums, global means one double
    * division each; per-stratum corrections are fixed double chains
    * micro-quantized to longs before the cross-strata sums; outputs
    * single divisions rounded. One [[globalRank]] cut + ONE
    * stratum-keyed aggregate + 1-row broadcasts — q250's exact shape,
    * nothing new at 100 TB. */
  def aipwAte(units: DataFrame, covariateCol: String, treatedCol: String,
      valueCol: String, idCol: String, strata: Int = 5): DataFrame = {
    require(strata >= 2, s"aipwAte needs strata >= 2, got $strata")
    requirePreQuantized(units, covariateCol, "aipwAte", "covariate")
    val base = units.filter(col(valueCol).isNotNull)
      .select(col(idCol).as("__id"),
        col(covariateCol).cast(LongType).as("__cv"),
        col(treatedCol).cast(LongType).as("__t"),
        round(col(valueCol) * lit(100.0)).cast(LongType).as("__vc"))
    val nDf = base.agg(count(lit(1)).as("__n"))
    val cells = globalRank(base, Seq("__cv", "__id"), "grank")
      .crossJoin(broadcast(nDf))
      .withColumn("stratum", expr(s"((grank - 1) * $strata) div __n"))
      .groupBy(col("stratum"))
      .agg(sum(col("__t")).as("n_t"), sum(lit(1L) - col("__t")).as("n_c"),
        sum(col("__t") * col("__vc")).as("__st"),
        sum((lit(1L) - col("__t")) * col("__vc")).as("__sc"))
      .localCheckpoint() // feeds the global means AND the corrections
    val glob = cells.agg(sum(col("n_t")).as("__gnt"),
      sum(col("n_c")).as("__gnc"),
      sum(col("__st")).as("__gst"), sum(col("__sc")).as("__gsc"))
    val mu1 = col("__gst").cast(DoubleType) / col("__gnt").cast(DoubleType)
    val mu0 = col("__gsc").cast(DoubleType) / col("__gnc").cast(DoubleType)
    val ns = col("n_t") + col("n_c")
    def corr(wT: Column, wC: Column): Column =
      (col("__st").cast(DoubleType) - col("n_t").cast(DoubleType) * mu1) *
        wT -
        (col("__sc").cast(DoubleType) - col("n_c").cast(DoubleType) * mu0) *
        wC
    val terms = cells.crossJoin(broadcast(glob))
      .withColumn("__cqr",
        when(col("n_t") > 0L && col("n_c") > 0L,
          round(corr(
            ns.cast(DoubleType) / col("n_t").cast(DoubleType),
            ns.cast(DoubleType) / col("n_c").cast(DoubleType)) * lit(1.0e6))
            .cast(LongType))
          .otherwise(lit(null).cast(LongType)))
      .withColumn("__cqs",
        round(corr(
          (ns + lit(2L)).cast(DoubleType) /
            (col("n_t") + lit(1L)).cast(DoubleType),
          (ns + lit(2L)).cast(DoubleType) /
            (col("n_c") + lit(1L)).cast(DoubleType)) * lit(1.0e6))
          .cast(LongType))
      .localCheckpoint()
    val per = terms.select(col("stratum"), col("n_t"), col("n_c"),
      round((col("n_t") + lit(1L)).cast(DoubleType) /
        (ns + lit(2L)).cast(DoubleType), 9).as("e_hat_smoothed"),
      round(col("__cqr").cast(DoubleType) / lit(1.0e8), 6).as("correction"),
      lit(null).cast(DoubleType).as("ate_aipw"),
      lit(null).cast(DoubleType).as("ate_aipw_smoothed"))
    val ov = terms
      .agg(sum(col("n_t")).as("n_t"), sum(col("n_c")).as("n_c"),
        sum(when(col("__cqr").isNotNull, ns).otherwise(lit(0L))).as("__n2"),
        sum(col("__cqr")).as("__qr"), sum(col("__cqs")).as("__qs"))
      .crossJoin(broadcast(glob))
      .select(lit(-1L).as("stratum"), col("n_t"), col("n_c"),
        lit(null).cast(DoubleType).as("e_hat_smoothed"),
        lit(null).cast(DoubleType).as("correction"),
        round((mu1 - mu0 + col("__qr").cast(DoubleType) / lit(1.0e6) /
          col("__n2").cast(DoubleType)) / lit(100.0), 6).as("ate_aipw"),
        round((mu1 - mu0 + col("__qs").cast(DoubleType) / lit(1.0e6) /
          (col("n_t") + col("n_c")).cast(DoubleType)) / lit(100.0), 6)
          .as("ate_aipw_smoothed"))
    per.unionAll(ov)
  }

  /** Markov next-event model evaluation (q255) — train the first-order
    * transition argmax on one half of the stream, score top-1 accuracy
    * on the other: the sequence-model baseline every session-
    * recommendation pipeline should have to beat. Transitions come from
    * one lead() per key (never a self-join); the learned policy is a
    * #states-row broadcast; accuracy is one keyed count.
    *
    * Exactness: the argmax next-state ranks on exact transition COUNTS
    * with a state tie-break; accuracy is integer counts + one double
    * division per state. */
  def markovEval(events: DataFrame, keyCol: String, tsCols: Seq[String],
      stateCol: String, splitCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(tsCols.map(col): _*)
    val trans = events
      .select(col(keyCol) +: col(stateCol).as("__s") +: splitCol.as("__train") +:
        tsCols.map(col): _*)
      .withColumn("__next", lead(col("__s"), 1).over(w))
      .filter(col("__next").isNotNull)
    val policy = trans.filter(col("__train"))
      .groupBy(col("__s"), col("__next")).agg(count(lit(1)).as("__c"))
      .groupBy(col("__s"))
      .agg(min_by(col("__next"),
        struct((-col("__c")).as("c"), col("__next").as("n"))).as("__pred"))
    trans.filter(!col("__train"))
      .join(broadcast(policy), Seq("__s"))
      .groupBy(col("__s").as("state"), col("__pred").as("predicted_next"))
      .agg(count(lit(1)).as("n_eval"),
        sum((col("__next") === col("__pred")).cast(LongType)).as("n_correct"))
      .withColumn("accuracy",
        col("n_correct").cast(DoubleType) / col("n_eval").cast(DoubleType))
  }

  /** Group-fairness audit (q256) — per-group selection rates and the
    * disparate-impact ratio vs the best-treated group, flagged by the
    * four-fifths rule (EEOC 29 CFR 1607.4(D)): the governance gate a
    * classifier's decisions (e.g. [[logisticTrainHashed]]'s) pass
    * before deployment. One keyed aggregate + a 1-row broadcast of the
    * reference rate.
    *
    * Exactness: rates are integer counts; the ratio is cross-multiplied
    * for the flag (5·n_sel·n_ref_tot ≥ 4·n_ref_sel·n_tot — never a
    * float threshold) and emitted as one double division per group. */
  def fairnessAudit(df: DataFrame, groupCol: String,
      selectedCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col(selectedCol).cast(LongType)).as("n_selected"))
    // reference = the group with the highest selection rate (cross-
    // multiplied comparison; ties by group for determinism)
    val ref = g.agg(min_by(struct(col("n").as("rn"),
        col("n_selected").as("rs")),
      struct((-expr("(n_selected * 1000000) div n")).as("r"),
        col("grp").as("g"))).as("__ref"))
      .select(col("__ref.rn").as("__rn"), col("__ref.rs").as("__rs"))
    g.crossJoin(broadcast(ref))
      .select(col("grp"), col("n"), col("n_selected"),
        (col("n_selected").cast(DoubleType) / col("n").cast(DoubleType))
          .as("selection_rate"),
        (col("n_selected").cast(DoubleType) * col("__rn").cast(DoubleType) /
          (col("n").cast(DoubleType) * col("__rs").cast(DoubleType)))
          .as("impact_ratio"),
        (col("n_selected") * col("__rn") * lit(5L) <
          col("__rs") * col("n") * lit(4L)).as("four_fifths_violation"))
  }

  /** Operating-point selection (q257) — the threshold that maximizes F1
    * for a "predict positive iff score ≥ t" rule, picked over EVERY
    * distinct score in one pass: descending prefix counts give TP/FP/FN
    * at each candidate, F1 is the exact integer ratio
    * (2·TP·10⁹) div (2·TP+FP+FN) (never a float compare), and the
    * argmax breaks ties toward the LOWER threshold. The deployment
    * decision q160's AUC (threshold-free) and q237's calibration
    * deliberately don't make.
    *
    * Shape: one keyed aggregate to score cells, two [[globalCumSum]]
    * passes over the (caller-quantized) cell table, one keyed argmax.
    * Exact to 4.6·10⁹ rows (2·TP·10⁹ in a long); past that drop the
    * quantizer to 10⁶. */
  def bestF1Threshold(df: DataFrame, scoreQCol: String,
      labelCol: String): DataFrame = {
    val cells = df.filter(col(scoreQCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreQCol).cast(LongType).as("sc"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast(LongType)).as("pos"))
      .localCheckpoint() // feeds the total AND both cum passes
    val tot = cells.agg(sum(col("pos")).as("__P"))
    val desc = cells.withColumn("__neg", -col("sc"))
    val cum = globalCumSum(globalCumSum(desc, Seq("__neg"), "pos", "tp"),
      Seq("__neg"), "n", "pp")
    cum.crossJoin(broadcast(tot))
      .withColumn("fp", col("pp") - col("tp"))
      .withColumn("fn", col("__P") - col("tp"))
      .withColumn("f1q",
        expr("(2 * tp * 1000000000) div (2 * tp + fp + fn)"))
      .agg(min_by(struct(col("sc"), col("tp"), col("pp"), col("fp"),
          col("fn"), col("f1q")),
        struct((-col("f1q")).as("f"), col("sc").as("s"))).as("__b"),
        max(col("__P")).as("__pt"))
      .select(col("__b.sc").as("threshold"), col("__b.tp").as("tp"),
        col("__b.fp").as("fp"), col("__b.fn").as("fn"),
        (col("__b.tp").cast(DoubleType) / col("__b.pp").cast(DoubleType))
          .as("precision"),
        (col("__b.tp").cast(DoubleType) / col("__pt").cast(DoubleType))
          .as("recall"),
        (col("__b.f1q").cast(DoubleType) / lit(1.0e9)).as("f1"))
  }

  /** Item-to-item collaborative filtering (q258; Linden, Smith & York
    * 2003 — the Amazon "customers who bought X also bought Y"
    * primitive): per item, the top-k co-occurring items by cosine-
    * normalized basket co-occurrence sim(i,j) = c_ij/√(c_i·c_j).
    *
    * Scale shape: distinct (basket, item) once, pairs from a basket-
    * keyed self-join — work is Σ C(basket_size, 2), which a single
    * mega-basket turns quadratic, so baskets over `maxBasket` fail
    * LOUDLY in-plan (the q198/q24 guard rule: cap or pre-filter, never
    * a silent OOM); the top-k window partitions by item. Similarities
    * nano-quantized (exact integer c's under an IEEE sqrt/division
    * chain) → engine-exact ranking with an item tie-break. */
  def itemCooccurrence(df: DataFrame, basketCol: String, itemCol: String,
      k: Int = 5, maxBasket: Int = 100): DataFrame = {
    require(k >= 1, s"itemCooccurrence needs k >= 1, got $k")
    val items0 = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
    val sizes = items0.groupBy(col("__b")).agg(count(lit(1)).as("__bs"))
    val items = items0.join(sizes, Seq("__b"))
      .select(col("__b"),
        when(col("__bs") > maxBasket, raise_error(concat(
          lit(s"itemCooccurrence: basket "), col("__b").cast(StringType),
          lit(s" has "), col("__bs").cast(StringType),
          lit(s" distinct items > maxBasket=$maxBasket — pair generation " +
            "is quadratic per basket; cap baskets or raise the limit " +
            "explicitly")))).otherwise(col("__i")).as("__i"))
      .localCheckpoint() // feeds the pair join AND the item counts
    val ci = items.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val pairs = items.as("a").join(items.as("b"), Seq("__b"))
      .filter(col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("ia"), col("b.__i").as("ib"))
      .agg(count(lit(1)).as("__cij"))
    val sym = pairs.unionAll(pairs.select(col("ib").as("ia"),
      col("ia").as("ib"), col("__cij")))
    val w = Window.partitionBy(col("ia"))
      .orderBy(col("__simq").desc, col("ib"))
    sym
      .join(ci.select(col("__i").as("ia"), col("__c").as("__ca")), Seq("ia"))
      .join(ci.select(col("__i").as("ib"), col("__c").as("__cb")), Seq("ib"))
      .withColumn("__simq", round(col("__cij").cast(DoubleType) /
        sqrt(col("__ca").cast(DoubleType) * col("__cb").cast(DoubleType)) *
        lit(1.0e9)).cast(LongType))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("ia").as("item"), col("rnk"), col("ib").as("also"),
        col("__cij").as("n_cooc"),
        (col("__simq").cast(DoubleType) / lit(1.0e9)).as("sim"))
  }

  /** STL-lite seasonal decomposition (q259) — the additive
    * trend/seasonal/residual split every metrics dashboard needs before
    * alerting on a daily series: trend = centered (2h+1)-point moving
    * average, seasonal = per-phase mean of the detrended series
    * (period `period`), residual = y − trend − seasonal. The first/last
    * h points carry NULL trend (no symmetric window exists — never
    * extrapolated silently).
    *
    * Input: one row per (key, t) with an integer value (pre-aggregate
    * counts/sums first — the series table is small by construction).
    * Exactness: trend is an integer window sum micro-floor-divided by
    * the window width; seasonal means floor-divide micro sums; residual
    * is pure long arithmetic. Windows partition by KEY (and phase) —
    * never a global sort. */
  def stlDecompose(series: DataFrame, keyCol: String, tCol: String,
      valueCol: String, period: Int = 7, halfWindow: Int = 3): DataFrame = {
    require(period >= 2, s"stlDecompose needs period >= 2, got $period")
    require(halfWindow >= 1, s"stlDecompose needs halfWindow >= 1")
    val width = 2 * halfWindow + 1
    val wN = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rowsBetween(-halfWindow, halfWindow)
    val base = series.select(col(keyCol).as("__k"),
      col(tCol).cast(LongType).as("__t"),
      col(valueCol).cast(LongType).as("__y"))
    val trended = base
      .withColumn("__wn", count(lit(1)).over(wN))
      .withColumn("__ws",
        expr(s"sum(__y) over (partition by __k order by __t " +
          s"rows between $halfWindow preceding and $halfWindow following)" +
          " * 1000000"))
      // plain truncating division: Spark `div` and DuckDB integer `//`
      // BOTH truncate toward zero (verified: (-7)//2 = -3 in DuckDB),
      // so the chains agree on negative sums without a floor device
      .withColumn("__trend_mc",
        when(col("__wn") === width, expr(s"__ws div $width")))
      .drop("__ws")
      .withColumn("__det_mc", col("__y") * lit(1000000L) - col("__trend_mc"))
    // detrended sums are negative half the time — truncating division
    // matches DuckDB's integer `//` exactly (both truncate toward zero)
    val seasonalF = trended.filter(col("__det_mc").isNotNull)
      .groupBy(col("__k"), pmod(col("__t"), lit(period.toLong)).as("__ph"))
      .agg(expr("sum(__det_mc) div count(1)").as("__seas_mc"))
    trended
      .withColumn("__ph", pmod(col("__t"), lit(period.toLong)))
      .join(seasonalF, Seq("__k", "__ph"), "left")
      .select(col("__k").as(keyCol), col("__t").as(tCol),
        col("__y").as("y"),
        (col("__trend_mc").cast(DoubleType) / lit(1.0e6)).as("trend"),
        (col("__seas_mc").cast(DoubleType) / lit(1.0e6)).as("seasonal"),
        ((col("__y") * lit(1000000L) - col("__trend_mc") -
          col("__seas_mc")).cast(DoubleType) / lit(1.0e6)).as("residual"))
  }

  // --------------------------------------------------- round-10 additions

  /** tf–idf cosine retrieval (q261) — the vector-space-model ranker
    * beside BM25 (q109) and Dirichlet QL (q231): score(d) =
    * Σ_{t∈q} tf_td·idf_t² / (‖d‖·‖q‖) with smooth idf = ln((N+1)/
    * (df+1)) + 1 (the sklearn convention) and a FULL document norm over
    * every term, not just query terms — what separates VSM cosine from
    * a bare dot product.
    *
    * Exactness: the numerator and the query norm are FIXED left-to-
    * right chains over the literal term list (q109's device — no double
    * aggregation anywhere order matters); the document norm's Σw² is
    * micro-quantized per posting and summed as exact longs. Shapes: one
    * postings shuffle, a token-keyed df join back, one per-doc agg;
    * query-term tf columns ride the same agg as literals. */
  def tfidfCosine(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "tfidfCosine needs at least one query term")
    val toks = df.select(col(idCol).as("__id"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("__t"))
      .filter(col("__t") =!= "")
    // postings feed the df count, the norm, and the per-doc term tfs
    val post = toks.groupBy(col("__id"), col("__t"))
      .agg(count(lit(1)).as("__tf")).localCheckpoint()
    val dfT = post.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val nDf = post.groupBy(col("__id")).agg(count(lit(1)))
      .agg(count(lit(1)).as("__n"))
    def idfOf(dfCol: Column, nCol: Column): Column =
      log((nCol.cast(DoubleType) + lit(1.0)) /
        (dfCol.cast(DoubleType) + lit(1.0))) + lit(1.0)
    val w = post.join(dfT, Seq("__t")).crossJoin(broadcast(nDf))
      .withColumn("__w", col("__tf").cast(DoubleType) *
        idfOf(col("__df"), col("__n")))
    val norms = w.groupBy(col("__id")).agg(
      sum(col("__tf")).as("dl"),
      sum(round(col("__w") * col("__w") * lit(1.0e6)).cast(LongType)).as("__nq"))
    // literal conditional tfs + dfs, one agg each — the q109 shape
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("__t") === t, col("__tf")).otherwise(0L)).as(s"__tf_$i")
    }
    val perDoc = post.groupBy(col("__id")).agg(tfCols.head, tfCols.tail: _*)
    val dfCols = terms.indices.map(i =>
      count(when(col(s"__tf_$i") > 0, 1)).as(s"__df_$i"))
    val stats = perDoc.agg(count(lit(1)).as("__sn"), dfCols: _*)
    val joined = perDoc.join(norms, Seq("__id"))
      .crossJoin(broadcast(stats))
    def termIdf(i: Int): Column = idfOf(col(s"__df_$i"), col("__sn"))
    val num = terms.indices
      .map(i => col(s"__tf_$i").cast(DoubleType) * termIdf(i) * termIdf(i))
      .reduce(_ + _)
    val qNorm = sqrt(terms.indices.map(i => termIdf(i) * termIdf(i)).reduce(_ + _))
    val dNorm = sqrt(col("__nq").cast(DoubleType) / lit(1.0e6))
    val hitCount = terms.indices
      .map(i => when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
    val scored = joined.select(col("__id"), col("dl"),
      hitCount.as("n_terms_hit"),
      (round(num / (dNorm * qNorm), 4) + lit(0.0)).as("tfidf_r"))
    df.select(col(idCol).as("__id")).distinct()
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("dl"), lit(0L)).as("dl"),
        coalesce(col("n_terms_hit"), lit(0L)).as("n_terms_hit"),
        coalesce(col("tfidf_r"), lit(0.0)).as("tfidf_r"))
  }

  /** Preference-pair mining (q265) — the RLHF/DPO data-prep step that
    * turns per-unit engagement into pairwise comparisons: within each
    * unit (user), every pair of items BOTH observed becomes one
    * comparison won by the item with the strictly higher exact total
    * (cents); ties produce NO comparison (the standard convention — a
    * tie carries no preference signal, and dropping it keeps the output
    * free of tie-break artifacts). Output is the aggregated (winner,
    * loser, n_units) table [[bradleyTerry]] consumes.
    *
    * 100 TB shape: one (unit, item) aggregate, then a unit-keyed
    * self-join whose fan-out is C(items-per-unit, 2) — bounded by the
    * per-unit item count (the q140 basket discipline), never corpus-
    * quadratic — and one pair-level aggregate. */
  def preferencePairs(df: DataFrame, unitCol: String, itemCol: String,
      valueCol: String): DataFrame = {
    val per = df.filter(col(valueCol).isNotNull)
      .groupBy(col(unitCol).as("__u"), col(itemCol).as("__i"))
      .agg(sum(round(col(valueCol) * lit(100.0)).cast(LongType)).as("__t"))
    per.alias("a").join(per.alias("b"),
        col("a.__u") === col("b.__u") && col("a.__i") < col("b.__i"))
      .filter(col("a.__t") =!= col("b.__t"))
      .select(
        when(col("a.__t") > col("b.__t"), col("a.__i")).otherwise(col("b.__i"))
          .as("winner"),
        when(col("a.__t") > col("b.__t"), col("b.__i")).otherwise(col("a.__i"))
          .as("loser"))
      .groupBy(col("winner"), col("loser"))
      .agg(count(lit(1)).as("n_units"))
  }

  /** Bradley–Terry strength fitting (q266) — the preference-model fit
    * behind reward-model data QC (Hunter 2004's MM algorithm): item
    * strengths s_i with P(i beats j) = s_i/(s_i+s_j), updated by
    * s_i ← W_i / Σ_j n_ij/(s_i+s_j) and renormalized to mean 1 each
    * round, a fixed `rounds` times.
    *
    * Exactness (the q253 replay discipline): strengths are nano-
    * quantized longs; each pair's denominator term and each item's
    * update/normalization are SINGLE identical double chains over exact
    * integers, re-quantized immediately — so every round replays
    * bit-for-bit and the oracle unrolls the rounds as chained CTEs.
    *
    * 100 TB shape: per round, one pairs⋈strengths join (two keyed
    * lookups), a 2-way per-pair explode (each unordered pair feeds both
    * endpoints' denominators with the SAME term), one item-keyed sum,
    * one 1-row normalization broadcast. Nothing is ever proportional to
    * units — only to items and observed pairs. */
  def bradleyTerry(pairs: DataFrame, winnerCol: String, loserCol: String,
      countCol: String, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"bradleyTerry needs rounds >= 1, got $rounds")
    val Q = 1.0e9
    // symmetric pair table: (lo, hi, n) with per-endpoint win counts
    val sym = pairs.select(
        least(col(winnerCol), col(loserCol)).as("__lo"),
        greatest(col(winnerCol), col(loserCol)).as("__hi"),
        col(countCol).cast(LongType).as("__n"),
        when(col(winnerCol) < col(loserCol), col(countCol).cast(LongType))
          .otherwise(lit(0L)).as("__wlo"))
      .groupBy(col("__lo"), col("__hi"))
      .agg(sum(col("__n")).as("__n"), sum(col("__wlo")).as("__wlo"))
      .localCheckpoint() // pinned for the MM rounds
    val wins = sym.select(col("__lo").as("item"), col("__wlo").as("__w"))
      .unionAll(sym.select(col("__hi").as("item"),
        (col("__n") - col("__wlo")).as("__w")))
      .groupBy(col("item")).agg(sum(col("__w")).as("wins"))
      .localCheckpoint()
    val comps = sym.select(col("__lo").as("item"), col("__n"))
      .unionAll(sym.select(col("__hi").as("item"), col("__n")))
      .groupBy(col("item")).agg(sum(col("__n")).as("comparisons"))
    val nItems = wins.count() // #items — bounded driver scalar
    var s = wins.select(col("item"), lit(1000000000L).as("sq")).localCheckpoint()
    var r = 0
    while (r < rounds) {
      val terms = sym
        .join(s.select(col("item").as("__lo"), col("sq").as("__sqlo")), Seq("__lo"))
        .join(s.select(col("item").as("__hi"), col("sq").as("__sqhi")), Seq("__hi"))
        .withColumn("__term", round(col("__n").cast(DoubleType) /
          ((col("__sqlo") + col("__sqhi")).cast(DoubleType) / lit(Q)) * lit(Q))
          .cast(LongType))
      val denom = terms.select(col("__lo").as("item"), col("__term"))
        .unionAll(terms.select(col("__hi").as("item"), col("__term")))
        .groupBy(col("item")).agg(sum(col("__term")).as("__d"))
      val updated = wins.join(denom, Seq("item"))
        .select(col("item"),
          when(col("__d") > 0L, round(col("wins").cast(DoubleType) * lit(Q) /
            (col("__d").cast(DoubleType) / lit(Q))).cast(LongType))
            .otherwise(lit(0L)).as("sq0"))
      val tot = updated.agg(sum(col("sq0")).as("__tot"))
      s = updated.crossJoin(broadcast(tot))
        .select(col("item"),
          round(col("sq0").cast(DoubleType) * lit(nItems.toDouble) * lit(Q) /
            col("__tot").cast(DoubleType)).cast(LongType).as("sq"))
        .localCheckpoint()
      r += 1
    }
    wins.join(comps, Seq("item")).join(s, Seq("item"))
      .select(col("item"), col("wins"), col("comparisons"),
        (col("sq").cast(DoubleType) / lit(Q)).as("strength"))
  }

  /** URL canonicalization + registered-domain extraction (q263) — the
    * CommonCrawl-pipeline hygiene step every web corpus runs before
    * dedup/quotas: per-URL dedup keys and per-SITE quotas both depend on
    * it. Policy (each step a fixed regexp chain, identical on the DuckDB
    * twin; no backreferences — Spark uses $1, DuckDB \\1, so none are
    * portable): strip the fragment, lowercase scheme and host, strip the
    * scheme's DEFAULT port only (:443 https / :80 http — a nonstandard
    * port is a different origin), strip one leading `www.`, drop every
    * `utm_*` tracking parameter (query-order preserved otherwise), and
    * extract eTLD+1 against an embedded multi-part-suffix list
    * (`co.uk`-style) with a last-two-labels fallback. Path case is
    * preserved — paths are case-sensitive, hosts are not (RFC 3986).
    *
    * Pure per-row projections: no shuffle, codegen-friendly, safe at any
    * scale. Adds scheme / host / etld1 / url_norm. */
  def normalizeUrls(df: DataFrame, urlCol: String): DataFrame = {
    // eTLD+1 is a property of the hostname alone — a kept nonstandard
    // port must not leak into it
    val hnp = regexp_replace(col("host"), ":[0-9]+$", "")
    val multi = regexp_extract(hnp,
      "([^.]+\\.(?:co\\.uk|com|org|net|io))$", 1)
    df.withColumn("__s1", regexp_replace(col(urlCol), "#.*$", ""))
      .withColumn("scheme",
        lower(regexp_extract(col("__s1"), "^([A-Za-z]+)://", 1)))
      .withColumn("__hp",
        lower(regexp_extract(col("__s1"), "^[A-Za-z]+://([^/?#]+)", 1)))
      .withColumn("__h1",
        when(col("scheme") === "https", regexp_replace(col("__hp"), ":443$", ""))
          .when(col("scheme") === "http", regexp_replace(col("__hp"), ":80$", ""))
          .otherwise(col("__hp")))
      .withColumn("host", regexp_replace(col("__h1"), "^www\\.", ""))
      .withColumn("__pq",
        regexp_extract(col("__s1"), "^[A-Za-z]+://[^/?#]+(.*)$", 1))
      // utm params, each match anchored at its own separator so a param
      // NAMED `xutm_source` or a VALUE containing `utm_x=1` never
      // matches: (1) `&utm_...` non-leading params (separator removed
      // with the param), (2) a leading `?utm_...&` with followers (the
      // `?` survives as the next param's separator), (3) a lone
      // `?utm_...` (query gone entirely)
      .withColumn("__q1",
        regexp_replace(col("__pq"), "&utm_[A-Za-z0-9_]*=[^&#]*", ""))
      .withColumn("__q2",
        regexp_replace(
          regexp_replace(col("__q1"), "\\?utm_[A-Za-z0-9_]*=[^&#]*&", "?"),
          "\\?utm_[A-Za-z0-9_]*=[^&#]*$", ""))
      .withColumn("etld1", when(multi =!= "", multi)
        .otherwise(regexp_extract(hnp, "([^.]+\\.[^.]+)$", 1)))
      .withColumn("url_norm",
        concat(col("scheme"), lit("://"), col("host"), col("__q2")))
      .drop("__s1", "__hp", "__h1", "__pq", "__q1", "__q2")
  }
}
