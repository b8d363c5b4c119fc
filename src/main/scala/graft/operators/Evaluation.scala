package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Util._

/** Model / retrieval evaluation metrics (q160–q163) — the gate family a
  * curation pipeline needs AFTER the classifiers and retrievers the rest
  * of the corpus implements: does the quality score actually rank
  * positives first (AUC), is it calibrated (reliability bins), how much
  * does one label tell you about another (mutual information), and how
  * close is a ranking to ideal (NDCG@k)?
  *
  * Exactness policy is the house one end-to-end: rank statistics and bin
  * ids are pure integer arithmetic, every ln/log2 term is nano-quantized
  * to a long before any sum, and each output double is a single fixed
  * division chain — so all four queries are full hash-gated oracles, not
  * self-gates. */
object Evaluation {

  val queries: Map[String, Q] = Map(
    // ---- q275: unbiased pass@k (Chen et al. 2021) — THE sampling-eval
    // metric for generated-candidate pipelines: per problem with n
    // samples and c passes, pass@k = 1 − C(n−c,k)/C(n,k), estimated for
    // k ∈ {1,5,10} over problems with n ≥ k and corpus-averaged. The
    // naive combination ratio overflows BIGINT at k=10 (n^k), so both
    // engines evaluate it in log space with every ln term nano-quantized
    // BEFORE the sum (the house order-free device): Σⱼ ln(n−c−j)−ln(n−j)
    // is an exact long, one exp + one subtraction per problem, and the
    // corpus mean is a long sum with a single division chain. Problems =
    // users, pass = a purchase event; c = n (or n−c < k) short-circuits
    // to exactly 1 before any ln sees a non-positive argument. ----
    "q275_pass_at_k" -> ((s, dir) => {
      import s.implicits._
      val probs = t(s, dir, "events")
        .groupBy(col("user_id").as("problem_id"))
        .agg(count(lit(1)).as("n"),
          sum((col("event_type") === "purchase").cast(LongType)).as("c"))
      val ks = Seq(1L, 5L, 10L).toDF("k")
      probs.crossJoin(broadcast(ks)).filter(col("n") >= col("k"))
        .withColumn("passq",
          when(col("n") - col("c") < col("k"), lit(1000000000L))
            .otherwise(expr(
              """cast(round((1.0 - exp(cast(aggregate(sequence(0L, k - 1L), 0L,
                |  (acc, j) -> acc + cast(round(ln(n - c - j) * 1e9) as long)
                |            - cast(round(ln(n - j) * 1e9) as long))
                | as double) / 1e9)) * 1e9) as long)""".stripMargin)))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_problems"),
          (sum(col("passq")).cast(DoubleType) /
            count(lit(1)).cast(DoubleType) / lit(1.0e9)).as("pass_at_k"))
        .orderBy(col("k"))
    }),

    // ---- q232: Murphy decomposition of the Brier score — q162's
    // quantitative upgrade: a per-(event_type, user-cohort) rate model
    // trained on even event_ids forecasts P(value > 50) for odd
    // event_ids; the one-row report splits its Brier score into
    // reliability (miscalibration), resolution (discrimination), and
    // the base-rate uncertainty floor. ----
    "q232_brier_decomposition" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          (col("user_id") % 8).as("cohort"),
          (col("value") > 50.0).cast(LongType).as("y"))
      val train = ev.filter(col("event_id") % 2 === 0)
        .groupBy(col("event_type"), col("cohort"))
        .agg((sum(col("y")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("p"))
      val test = ev.filter(col("event_id") % 2 === 1)
        .join(broadcast(train), Seq("event_type", "cohort"))
      graft.api.Graft.brierDecomposition(test, "p", "y", scale = 10000)
    }),

    // ---- q237: isotonic (PAV) calibration of q232's cohort forecast —
    // the REPAIR next to the diagnosis: the least-squares monotone map
    // from the (10⁴-quantized) forecast to a calibrated rate, computed
    // via the minimax closed form over forecast cells. Score cells are
    // the q232 quantization, so C is bounded by #(event_type × cohort)
    // no matter the row count. ----
    "q237_isotonic_calibration" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          (col("user_id") % 8).as("cohort"),
          (col("value") > 50.0).cast(LongType).as("y"))
      val train = ev.filter(col("event_id") % 2 === 0)
        .groupBy(col("event_type"), col("cohort"))
        .agg((sum(col("y")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("p"))
      val test = ev.filter(col("event_id") % 2 === 1)
        .join(broadcast(train), Seq("event_type", "cohort"))
        .withColumn("pq", round(col("p") * lit(10000.0)).cast(LongType))
      graft.api.Graft.isotonicCalibrate(test, "pq", "y")
        .orderBy(col("score"))
    }),

    // ---- q252: off-policy replay evaluation (Li et al. 2011) — the
    // unbiased offline estimator for a targeting policy: learn the
    // argmax-reward action per context on the train half, then score
    // the policy ONLY on held-out logged events where the logged action
    // equals the policy's choice (everything else is unusable — that is
    // the replay rule). Per-cohort matched counts + replay reward; the
    // policy argmax is micro-quantized with an action tie-break. ----
    "q252_bandit_replay" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_id"), (col("user_id") % 8).as("cohort"),
          col("event_type").as("action"),
          (col("value") > 50.0).cast(LongType).as("reward"))
      val policy = ev.filter(col("event_id") % 2 === 0)
        .groupBy(col("cohort"), col("action"))
        .agg(expr("(sum(reward) * 1000000) div count(1)").as("__rq"))
        .groupBy(col("cohort"))
        .agg(min_by(col("action"),
          struct((-col("__rq")).as("r"), col("action").as("a"))).as("action"))
      ev.filter(col("event_id") % 2 === 1)
        .join(broadcast(policy), Seq("cohort", "action"))
        .groupBy(col("cohort"), col("action"))
        .agg(count(lit(1)).as("n_matched"),
          (sum(col("reward")).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("replay_reward"))
        .orderBy(col("cohort"))
    }),

    // ---- q257: operating-point selection — the F1-maximizing decision
    // threshold for "flag as purchase when value ≥ t", searched over
    // every distinct cents value with exact integer F1 ratios. The
    // deployment decision AUC (q160, threshold-free) and calibration
    // (q237) deliberately don't make. ----
    "q257_best_f1_threshold" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("scq", round(col("value") * lit(100.0)).cast(LongType))
        .withColumn("y", (col("event_type") === "purchase").cast(LongType))
      graft.api.Graft.bestF1Threshold(ev, "scq", "y")
    }),

    // ---- q160: exact ROC AUC (Mann–Whitney) — does `value` rank
    // purchase events above the rest? Tie groups (the value column is
    // money-quantized, ~1/3 of rows share a value with another) exercise
    // the average-rank convention; ranking is globalRank's two-phase
    // parallel order statistic, never a one-partition window. ----
    "q160_auc" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("label", (col("event_type") === "purchase").cast(LongType))
      graft.api.Graft.auc(ev, "value", "label")
    }),

    // ---- q315: DeLong AUC confidence interval — the error bar q160
    // ships without: a 0.61 AUC with ±0.01 and one with ±0.20 are
    // different business facts. Same (value → purchase) ranking task,
    // placement statistics from the doubled-midrank device over the
    // distinct-value table. ----
    "q315_auc_delong" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("label", (col("event_type") === "purchase").cast(LongType))
      graft.api.Graft.aucDeLong(ev, "value", "label")
    }),

    // ---- q161: mutual information between customer market segment and
    // order priority (orders⋈customer): near-independent columns → MI
    // close to 0 — the redundancy measure next to q151's chi-square
    // significance on the same contingency shape. ----
    "q161_mutual_info" -> ((s, dir) => {
      val j = t(s, dir, "orders").join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      graft.api.Graft.mutualInfo(j, "c_mktsegment", "o_orderpriority")
    }),

    // ---- q162: calibration / reliability bins — value min–max
    // normalized into 10 equal-width integer-cut bins vs the observed
    // purchase rate per bin (|gap| = the per-bin ECE term). A flat
    // frac_pos across bins says the score carries no signal — the
    // honest-negative companion to q160. ----
    "q162_calibration" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("label", (col("event_type") === "purchase").cast(LongType))
      graft.api.Graft.calibrationBins(ev, "value", "label", bins = 10)
        .orderBy(col("bin"))
    }),

    // ---- q163: NDCG@10 per language — ranking docs by n_chars (ties →
    // doc_id) against graded relevance rel = min(3, #\bthe\b): en/fr/de
    // groups score mid-range, zh has all-zero relevance → NULL ndcg (the
    // no-ideal edge). Both rank windows share ONE group exchange. ----
    "q163_ndcg" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("rel",
          least(lit(3L), regexp_count(lower(col("text")), lit("\\bthe\\b"))
            .cast(LongType)))
      graft.api.Graft.ndcgAtK(d, "lang", "n_chars", "doc_id", "rel", k = 10)
        .orderBy(col("lang"))
    }),

    // ---- q183: Adjusted Rand Index for the same predictions — the
    // pair-counting, label-permutation-invariant agreement next to
    // q165's kappa and q161's NMI: the metric to use when cluster ids
    // carry no meaning (dedup clusters, k-means cells). ----
    "q183_adjusted_rand" -> ((s, dir) =>
      graft.api.Graft.adjustedRandIndex(
        TextAnalysis.langidPred(s, dir), "lang", "pred_lang")),

    // ---- q164: per-class confusion statistics over q29's langid
    // predictions — tp/fp/fn and precision/recall/F1 per language. F1 is
    // the single-division 2tp/(2tp+fp+fn) form; classes the model never
    // predicts (or hallucinates) keep their row instead of vanishing. ----
    "q164_confusion" -> ((s, dir) =>
      graft.api.Graft.confusionStats(
          TextAnalysis.langidPred(s, dir), "lang", "pred_lang")
        .orderBy(col("label"))),

    // ---- q165: Cohen's kappa for the same predictions — the
    // chance-corrected agreement score a labeling pipeline gates on
    // before trusting weak labels (accuracy alone flatters the en-heavy
    // prior). Cross-multiplied exact form, three output divisions. ----
    "q165_kappa" -> ((s, dir) =>
      graft.api.Graft.cohensKappa(
        TextAnalysis.langidPred(s, dir), "lang", "pred_lang")),

    // ---- q166: regression metrics (MAE/RMSE/R²) of the group-mean
    // predictor: predict an event's value by its event_type mean (the
    // simplest model — R² here IS the eta-squared of the grouping).
    // Means are micro-quantized by integer floor-division so the
    // prediction column replays exactly cross-engine. ----
    "q166_regression_metrics" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("__vc", round(col("value") * lit(100.0)).cast(LongType))
      val means = ev.groupBy(col("event_type"))
        .agg(expr("(sum(__vc) * 10000) div count(1)").as("__mean_mc"))
      val pred = ev.join(broadcast(means), "event_type")
        .withColumn("pred", col("__mean_mc").cast(DoubleType) / lit(1.0e6))
      graft.api.Graft.regressionMetrics(pred, "value", "pred")
    }),

    // ---- q167: average precision @10 per language (MAP's per-query
    // table) — binary relevance rel = contains \bthe\b, the q163 ranking
    // (n_chars desc, doc_id). Rank + running-relevance share ONE group
    // window; each precision term nano-quantized before the keyed sum. ----
    "q167_avg_precision" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("rel",
          (regexp_count(lower(col("text")), lit("\\bthe\\b")) > 0)
            .cast(LongType))
      graft.api.Graft.averagePrecisionAtK(d, "lang", "n_chars", "doc_id",
          "rel", k = 10)
        .orderBy(col("lang"))
    }),

    // ---- q271: corpus BLEU-4 per language between a normalized
    // candidate (lowercased, stopword 'the' dropped, whitespace
    // collapsed) and the original text — the generation-eval metric
    // doubling as a "how much did my cleaning pipeline distort the
    // corpus" audit. Clipped per-pair n-gram matches, BLEU+1 smoothing
    // on n≥2, brevity penalty; one explode + one pair-keyed LEFT join +
    // one group agg, every float behind the nano-quantize/single-exp
    // recipe. ----
    "q271_bleu_eval" -> ((s, dir) => {
      graft.api.Graft.corpusBleu(bleuPairs(s, dir), "cand", "ref",
          "doc_id", "lang")
        .orderBy(col("lang"))
    }),

    // ---- q272: corpus chrF2 per language over the same (cand, ref)
    // pairs — the tokenization-free companion: whitespace stripped,
    // char 1..6-gram clipped matches, F-score collapsed algebraically
    // to one division per n over exact integers (no log/exp at all). ----
    "q272_chrf_eval" -> ((s, dir) => {
      graft.api.Graft.chrF(bleuPairs(s, dir), "cand", "ref",
          "doc_id", "lang")
        .orderBy(col("lang"))
    }),

    // ---- q278: corpus ROUGE-1/2 over the same (cand, ref) pairs —
    // the RECALL side BLEU doesn't report (a summarizer that drops
    // content scores high BLEU precision but low ROUGE recall); P/R/F1
    // per order are single exact-integer divisions (chrF's collapse),
    // so no quantization machinery at all. ----
    "q278_rouge_eval" -> ((s, dir) => {
      graft.api.Graft.rougeN(bleuPairs(s, dir), "cand", "ref",
          "doc_id", "lang")
        .orderBy(col("lang"))
    }),

    // ---- q282: best-of-k yield curve — the rejection-sampling planner
    // (the BoN curves of WebGPT / summarization-from-feedback): from n
    // logged samples per problem, the UNBIASED order-statistics
    // estimator of E[max score of k draws],
    // v̂ₖ = Σᵢ C(i−1,k−1)/C(n,k) · v₍ᵢ₎, for k ∈ {1,2,4} — telling the
    // pipeline how much reward another 2× sampling budget actually buys
    // BEFORE paying for it. Problems = users, score = value (cents).
    // Exactness: binomials at k ≤ 4 are closed-form exact BIGINTs
    // ((i−1)(i−2)(i−3)/6 etc. — always divisible), Σ vc·C(i−1,k−1) is
    // an exact long, each problem's estimate is one division micro-
    // quantized before the corpus mean. One rank window per problem +
    // a 3-row broadcast grid; no log-gamma anywhere. ----
    "q282_best_of_k" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("vc"), col("event_id"))
      val ranked = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("user_id"), col("event_id"),
          round(col("value") * lit(100.0)).cast(LongType).as("vc"))
        .withColumn("i", row_number().over(w).cast(LongType))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id")))
          .cast(LongType))
      val ks = Seq(1L, 2L, 4L).toDF("k")
      ranked.crossJoin(broadcast(ks)).filter(col("n") >= col("k"))
        .withColumn("num", expr(
          """CASE k WHEN 1 THEN 1L WHEN 2 THEN i - 1L
            | ELSE ((i - 1L) * (i - 2L) * (i - 3L)) div 6L END""".stripMargin))
        .withColumn("den", expr(
          """CASE k WHEN 1 THEN n WHEN 2 THEN (n * (n - 1L)) div 2L
            | ELSE (n * (n - 1L) * (n - 2L) * (n - 3L)) div 24L END""".stripMargin))
        .groupBy(col("user_id"), col("k"), col("den"))
        .agg(sum(col("vc") * col("num")).as("s"))
        .withColumn("estq", round(col("s").cast(DoubleType) /
          col("den").cast(DoubleType) / lit(100.0) * lit(1.0e6)).cast(LongType))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_problems"),
          (sum(col("estq")).cast(DoubleType) /
            count(lit(1)).cast(DoubleType) / lit(1.0e6)).as("best_of_k"))
        .orderBy(col("k"))
    }),

    // ---- q280: Fleiss' kappa — multi-rater chance-corrected agreement,
    // the gate a labeling/RLHF-rating pipeline needs where Cohen's
    // kappa (q165, two raters) can't go: are R raters assigning the
    // same categories beyond chance? Items = users, ratings = each
    // item's FIRST R=4 events in (ts, event_id) order (a deterministic
    // fixed-panel stand-in; items with fewer ratings are excluded, as
    // Fleiss requires constant R). Everything is exact integers —
    // A = ΣᵢΣⱼ n²ᵢⱼ, category sums c_j — and P̄ = (A−NR)/(NR(R−1)),
    // Pₑ = Σc²ⱼ/(NR)², κ = (P̄−Pₑ)/(1−Pₑ) are three fixed double
    // divisions over them: bit-identical cross-engine, no quantization.
    // ----
    "q280_fleiss_kappa" -> ((s, dir) => {
      val rr = 4
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val first = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= rr)
      val eligible = first.groupBy(col("user_id"))
        .agg(count(lit(1)).as("nr")).filter(col("nr") === rr)
        .select(col("user_id"))
      val nij = first.join(eligible, "user_id")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("nij"))
      val aDf = nij.agg(sum(col("nij") * col("nij")).as("a"))
      val c2Df = nij.groupBy(col("event_type"))
        .agg(sum(col("nij")).as("cj"))
        .agg(sum(col("cj") * col("cj")).as("c2"))
      val nDf = eligible.agg(count(lit(1)).as("n_items"))
      val pbar = (col("a") - col("n_items") * lit(rr.toLong)).cast(DoubleType) /
        (col("n_items") * lit((rr * (rr - 1)).toLong)).cast(DoubleType)
      val pe = col("c2").cast(DoubleType) /
        (col("n_items") * lit(rr.toLong) * col("n_items") * lit(rr.toLong))
          .cast(DoubleType)
      nDf.crossJoin(broadcast(aDf)).crossJoin(broadcast(c2Df))
        .withColumn("n_raters", lit(rr.toLong))
        .withColumn("p_bar", pbar)
        .withColumn("p_e", pe)
        .withColumn("kappa",
          (col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e")))
        .select(col("n_items"), col("n_raters"), col("p_bar"), col("p_e"),
          col("kappa"))
    }),

    // ---- q334: Krippendorff's alpha (nominal) — the agreement gate
    // q280's Fleiss kappa can't give when the rater panel is RAGGED:
    // Fleiss requires a constant R raters per item; real annotation
    // (RLHF label queues, review backfills) has whoever showed up.
    // Krippendorff handles any m_u ≥ 2 via coincidence counting.
    // Items = parts, raters = supplier cohorts (l_suppkey % 4), value =
    // the cohort's first return flag (deterministic min). Per-(item,
    // value) agreement mass n_uc(n_uc−1)/(m_u−1) is ONE double chain
    // nano-quantized to a long before the global sum (order-free);
    // category totals are exact integers (Decimal for the n_c(n_c−1)
    // products — they bind at ~10¹⁹ values per category as longs);
    // D_o, D_e, α are fixed double chains over those. Two keyed
    // aggregates over the scan + category-sized tails: linear. ----
    // ---- q349: McNemar's test — the PAIRED model-comparison gate the
    // board lacked: q341/q214 compare independent samples, but two
    // classifiers scored on the SAME eval set are paired, and only the
    // discordant cells carry information (b = A right/B wrong, c = the
    // reverse; χ² = (|b−c|−1)²/(b+c), continuity-corrected). Probes
    // here are two deterministic embedding-sign rules against the
    // label-parity target (the q277 split device) — the stand-in for
    // two model variants on one eval set. Per-dim coordinates are
    // micro-quantized BEFORE the sign tests so both engines take the
    // identical branch; counts are exact integers, χ² one division. ----
    "q349_mcnemar" -> ((s, dir) => {
      val base = t(s, dir, "embeddings").select(
        (col("label").cast(LongType) % 2L === 1L).as("truth"),
        (expr("cast(round(cast(embedding[0] as double) * 1000000.0) " +
          "as long)") > 0L).as("pa"),
        (expr("aggregate(slice(embedding, 1, 8), 0L, (acc, x) -> acc + " +
          "cast(round(cast(x as double) * 1000000.0) as long))") > 0L)
          .as("pb"))
      val ag = base.agg(count(lit(1)).as("n"),
        sum(when(col("pa") === col("truth") && col("pb") === col("truth"),
          1L).otherwise(0L)).as("both_correct"),
        sum(when(col("pa") === col("truth") && col("pb") =!= col("truth"),
          1L).otherwise(0L)).as("only_a"),
        sum(when(col("pa") =!= col("truth") && col("pb") === col("truth"),
          1L).otherwise(0L)).as("only_b"),
        sum(when(col("pa") =!= col("truth") && col("pb") =!= col("truth"),
          1L).otherwise(0L)).as("both_wrong"))
      val bc = col("only_a") + col("only_b")
      val d = abs(col("only_a") - col("only_b")) - lit(1L)
      val chi = d.cast(DoubleType) * d.cast(DoubleType) / bc.cast(DoubleType)
      ag.select(col("n"), col("both_correct"), col("only_a"), col("only_b"),
        col("both_wrong"),
        when(bc === 0L, lit(null).cast(DoubleType))
          .otherwise(round(chi, 6)).as("chi2"),
        when(bc === 0L, lit(false)).otherwise(chi > lit(3.84))
          .as("significant"))
    }),

    "q334_krippendorff" -> ((s, dir) => {
      val D = DecimalType(38, 0)
      val ratings = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("item"),
          (col("l_suppkey") % 4).as("rater"))
        .agg(min(col("l_returnflag")).as("v"))
      val mu = ratings.groupBy(col("item")).agg(count(lit(1)).as("m"))
        .filter(col("m") >= 2L)
      val nuc = ratings.join(mu, "item")
        .groupBy(col("item"), col("m"), col("v"))
        .agg(count(lit(1)).as("nuc"))
      val oagg = nuc.select(col("v"), col("nuc"),
        round(col("nuc").cast(DoubleType) * (col("nuc") - 1L).cast(DoubleType)
          / (col("m") - 1L).cast(DoubleType) * lit(1.0e9))
          .cast(LongType).as("__o"))
      val tot = oagg.agg(sum(col("__o")).as("__oa"))
      val nn = mu.agg(count(lit(1)).as("n_items"), sum(col("m")).as("n_values"))
      val ce = oagg.groupBy(col("v")).agg(sum(col("nuc")).as("nc"))
        .agg(count(lit(1)).as("n_categories"),
          sum(col("nc").cast(D) * (col("nc") - 1L).cast(D)).as("__ce"))
      val dOr = lit(1.0) - col("__oa").cast(DoubleType) /
        (lit(1.0e9) * col("n_values").cast(DoubleType))
      val dEr = lit(1.0) - col("__ce").cast(DoubleType) /
        (col("n_values").cast(DoubleType) *
          (col("n_values") - lit(1L)).cast(DoubleType))
      broadcast(tot).crossJoin(broadcast(nn)).crossJoin(broadcast(ce))
        .select(col("n_items"), col("n_values"), col("n_categories"),
          round(dOr, 6).as("d_o"), round(dEr, 6).as("d_e"),
          when(dEr <= lit(0.0), lit(null).cast(DoubleType))
            .otherwise(round(lit(1.0) - dOr / dEr, 6)).as("alpha"))
    }),

    // ---- q335: doubly-robust off-policy evaluation — the serving-side
    // counterfactual gate (Dudík 2011) the bandit family (q252 replay,
    // q245 uplift) was missing: what would the ARGMAX policy have
    // earned on logged traffic, with the DR estimator that stays
    // consistent if EITHER the outcome model OR the propensity is
    // right? Logged data = events (context = user cohort, action =
    // event type, reward = value); the outcome model q̂ is fit on even
    // epoch-days and evaluated on odd days (an in-sample q̂ makes the
    // DR correction vanish identically — the split keeps it honest);
    // the behavior propensity is the eval split's empirical n_xa/n_x.
    // Everything aggregates to (context × action) cells: q̂ micro-
    // quantized per train cell, the DM / IPS / correction terms each
    // ONE fixed double chain micro-quantized per eval cell before the
    // global sum. Two scans + k×16-cell tails, all broadcast: linear,
    // no per-row model math. Unseen-cell fallbacks (context or action
    // missing from train) coalesce to the global train mean / global
    // argmax action — dormant on this data but pinned in both engines.
    // ----
    "q335_dr_ope" -> ((s, dir) => {
      val wAll = org.apache.spark.sql.expressions.Window
        .orderBy(col("qhat").desc, col("a"))
      val base = t(s, dir, "events").filter(col("value").isNotNull)
        .select((col("user_id") % 16).as("x"), col("event_type").as("a"),
          round(col("value") * lit(100.0)).cast(LongType).as("r"),
          (expr("unix_micros(ts) div 86400000000") % 2).as("split"))
      val train = base.filter(col("split") === 0L)
      val ev = base.filter(col("split") === 1L)
      val tcell = train.groupBy(col("x"), col("a"))
        .agg(round(sum(col("r")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType) * lit(1.0e6))
          .cast(LongType).as("qhat"))
        .localCheckpoint() // feeds π(x), the per-cell q̂ join, and n_train
      val nTrain = train.agg(count(lit(1)).as("n_train"))
      val g = train.agg(round(sum(col("r")).cast(DoubleType) /
        count(lit(1)).cast(DoubleType) * lit(1.0e6)).cast(LongType).as("g"))
      val ga = train.groupBy(col("a"))
        .agg(round(sum(col("r")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType) * lit(1.0e6))
          .cast(LongType).as("qhat"))
      val agl = ga.withColumn("rn", row_number().over(wAll))
        .filter(col("rn") === 1)
        .select(col("a").as("ag"), col("qhat").as("qag"))
      val wx = org.apache.spark.sql.expressions.Window
        .partitionBy(col("x")).orderBy(col("qhat").desc, col("a"))
      val pi = tcell.withColumn("rn", row_number().over(wx))
        .filter(col("rn") === 1)
        .select(col("x"), col("a").as("pia"), col("qhat").as("qpi"))
      val ecell = ev.groupBy(col("x"), col("a"))
        .agg(count(lit(1)).as("n"), sum(col("r")).as("sr"))
      val nx = ecell.groupBy(col("x")).agg(sum(col("n")).as("nx"))
      val nEval = ev.agg(count(lit(1)).as("n_eval"))
      // context-level DM mass: n_x · q̂(x, π(x)), micro-cents
      val dm = nx.join(broadcast(pi), Seq("x"), "left")
        .crossJoin(broadcast(agl)).crossJoin(broadcast(g))
        .select(round(col("nx").cast(DoubleType) *
          coalesce(col("qpi"), col("qag")).cast(DoubleType))
          .cast(LongType).as("__dm"))
        .agg(sum(col("__dm")).as("__sdm"))
      // cell-level IPS + DR correction on π-matching cells
      val cj = ecell.join(nx, "x")
        .join(broadcast(pi), Seq("x"), "left")
        .join(broadcast(tcell), Seq("x", "a"), "left")
        .crossJoin(broadcast(agl)).crossJoin(broadcast(g))
        .filter(col("a") === coalesce(col("pia"), col("ag")))
      val sums = cj.select(
          round(col("sr").cast(DoubleType) * col("nx").cast(DoubleType) /
            col("n").cast(DoubleType) * lit(1.0e6))
            .cast(LongType).as("__ips"),
          round((col("sr").cast(DoubleType) * lit(1.0e6) -
            col("n").cast(DoubleType) *
              coalesce(col("qhat"), col("g")).cast(DoubleType)) *
            col("nx").cast(DoubleType) / col("n").cast(DoubleType))
            .cast(LongType).as("__corr"))
        .agg(coalesce(sum(col("__ips")), lit(0L)).as("__sips"),
          coalesce(sum(col("__corr")), lit(0L)).as("__scorr"))
      broadcast(nTrain).crossJoin(broadcast(nEval))
        .crossJoin(broadcast(dm)).crossJoin(broadcast(sums))
        .select(col("n_train"), col("n_eval"),
          round(col("__sdm").cast(DoubleType) / lit(1.0e8) /
            col("n_eval").cast(DoubleType), 6).as("v_dm"),
          round(col("__sips").cast(DoubleType) / lit(1.0e8) /
            col("n_eval").cast(DoubleType), 6).as("v_ips"),
          round((col("__sdm") + col("__scorr")).cast(DoubleType) /
            lit(1.0e8) / col("n_eval").cast(DoubleType), 6).as("v_dr"))
    }),

    // ---- q339: propensity-score matching ATT — the third leg of the
    // ATE family's identification tripod: q254 re-WEIGHTS by inverse
    // propensity, q250/q307 STRATIFY, this one MATCHES — each treated
    // unit to its nearest control on the propensity score (1-NN with
    // replacement, caliper 0.05), the estimator reviewers ask for when
    // overlap is doubtful (q327's gate). Scores come from a FIXED-
    // coefficient logistic over per-user activity features (micro-
    // quantized — deterministic, no fitting RNG); matching is a
    // BUCKET-blocked candidate join (score div caliper, each treated
    // probes its own + 2 adjacent buckets — a caliper match can never
    // straddle further), best = row_number on (gap, score, id): every
    // decision integer. 100 TB shape: one user aggregate, an equi join
    // on bucket with bounded probe width, per-treated windows. ----
    "q339_psm_att" -> ((s, dir) => {
      val u = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("nev"),
          sum(when(col("event_type") === "click", lit(1L))
            .otherwise(lit(0L))).as("clicks"),
          coalesce(sum(when(col("value").isNotNull,
            round(col("value") * lit(100.0)).cast(LongType))
            .otherwise(lit(0L))), lit(0L)).as("y"))
        .withColumn("t", expr("user_id div 8") % 2)
      val z = lit(-1.2) +
        lit(0.8) * log(col("nev").cast(DoubleType) + lit(1.0)) -
        lit(1.5) * (col("clicks").cast(DoubleType) /
          col("nev").cast(DoubleType))
      val sb = u
        .withColumn("p_mu",
          round(lit(1.0e6) / (lit(1.0) + exp(-z))).cast(LongType))
        .withColumn("b", expr("p_mu div 50000"))
      // VALUE-KEYED matching (r13; the per-user bucket join was 179.9 s
      // at sf1 — candidates scaled as |T|·|C| per bucket, quadratic in
      // users at fixed bucket width). The caliper 1-NN match is a pure
      // function of the propensity VALUE: order (gap, pc, c_uid) never
      // reads anything else from the treated row. So both sides
      // collapse to distinct propensity cells first — controls to
      // (pc → min c_uid and ITS outcome), treated to (pt → count,
      // Σy) — the match runs once per distinct pt, and the per-user
      // sums re-expand as exact integer products. Work scales with
      // distinct propensity cells (bounded by the micro grid), not
      // users; the result is bit-identical to the per-user join.
      val tr = sb.filter(col("t") === 1L).select(col("user_id").as("t_uid"),
        col("p_mu").as("pt"), col("y").as("yt"), col("b"))
      val trVals = tr.groupBy(col("pt"), col("b"))
        .agg(count(lit(1)).as("cnt_t"), sum(col("yt")).as("sum_yt"))
      val ctVals = sb.filter(col("t") === 0L)
        .select(col("user_id").as("c_uid"), col("p_mu").as("pc"),
          col("y").as("yc"), col("b").as("cb"))
        .groupBy(col("pc"), col("cb"))
        .agg(min(struct(col("c_uid"), col("yc"))).as("m"))
        .select(col("pc"), col("cb"), col("m.c_uid").as("c_uid"),
          col("m.yc").as("yc"))
      val cand = trVals
        .withColumn("cb",
          explode(array(col("b") - 1L, col("b"), col("b") + 1L)))
        .join(ctVals, "cb")
        .withColumn("gap", abs(col("pt") - col("pc")))
        .filter(col("gap") <= 50000L)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pt")).orderBy(col("gap"), col("pc"),
          col("c_uid"))
      val best = cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      val nt = tr.agg(count(lit(1)).as("n_treated"))
      best.agg(sum(col("cnt_t")).as("n_matched"),
          sum(col("sum_yt") - col("cnt_t") * col("yc")).as("__d"),
          sum(col("cnt_t") * col("gap")).as("__g"))
        .crossJoin(broadcast(nt))
        .select(col("n_treated"), col("n_matched"),
          round(col("__d").cast(DoubleType) / lit(100.0) /
            col("n_matched").cast(DoubleType), 6).as("att"),
          round(col("__g").cast(DoubleType) / lit(1.0e6) /
            col("n_matched").cast(DoubleType), 6).as("mean_pscore_gap"))
    }),

    // ---- q279: self-BLEU corpus-diversity audit (Zhu et al. 2018) —
    // the synthetic-data gate BLEU-against-a-reference can't give: how
    // template-like is the corpus against ITSELF? Pairs are adjacent
    // same-lang documents (doc_id order — deterministic, no sampling
    // RNG), scored with the full q271 BLEU machinery; a high self-BLEU
    // lang partition is a mode-collapse / boilerplate red flag before
    // the data is mixed. One window lead + the corpusBleu plan. ----
    "q279_self_bleu" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
      val pairs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text").as("cand"),
          lead(col("text"), 1).over(w).as("ref"))
        .filter(col("ref").isNotNull)
      graft.api.Graft.corpusBleu(pairs, "cand", "ref", "doc_id", "lang")
        .orderBy(col("lang"))
    })
  )

  /** The q271/q272 evaluation pairs: candidate = the house-normalized
    * text (lower, drop \bthe\b, collapse whitespace), reference = the
    * original — a deterministic, SQL-expressible stand-in for (model
    * output, reference) pairs that exercises clipping (repeated words),
    * smoothing (short docs), and the brevity penalty (cand is shorter). */
  private def bleuPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    t(s, dir, "documents").select(col("doc_id"), col("lang"),
      regexp_replace(trim(regexp_replace(lower(col("text")),
        "\\bthe\\b", " ")), "\\s+", " ").as("cand"),
      col("text").as("ref"))

  private val oracleHead: Map[String, String] = Map(
    // pass@k twin: identical log-space evaluation — nano-quantized ln
    // terms summed as BIGINTs per (problem, k), one exp, the same
    // 1e9-quantized per-problem estimate, the same mean division chain
    "q275_pass_at_k" ->
      """WITH p AS (
        |  SELECT user_id AS problem_id, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |ks AS (SELECT CAST(unnest([1, 5, 10]) AS BIGINT) AS k),
        |j AS (SELECT * FROM p CROSS JOIN ks WHERE n >= k),
        |terms AS (
        |  SELECT problem_id, k,
        |    SUM(CAST(ROUND(ln(n - c - t.jj) * 1000000000.0) AS BIGINT)
        |      - CAST(ROUND(ln(n - t.jj) * 1000000000.0) AS BIGINT)) AS lnsum
        |  FROM j, UNNEST(generate_series(0, k - 1)) AS t(jj)
        |  WHERE n - c >= k GROUP BY 1, 2),
        |per AS (
        |  SELECT j.problem_id, j.k,
        |    CASE WHEN j.n - j.c < j.k THEN 1000000000
        |     ELSE CAST(ROUND((1.0 - exp(CAST(t.lnsum AS DOUBLE)
        |       / 1000000000.0)) * 1000000000.0) AS BIGINT)
        |    END AS passq
        |  FROM j LEFT JOIN terms t USING (problem_id, k))
        |SELECT k, COUNT(*) AS n_problems,
        |  CAST(SUM(passq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    / 1000000000.0 AS pass_at_k
        |FROM per GROUP BY k ORDER BY k""".stripMargin,

    // Brier-decomposition twin: identical cohort model, exact-value
    // (round(p·10000)) grouping, each cell's n·(…)² term nano-quantized
    // before the order-free sum, the same (…/1e9)/n division chains
    "q232_brier_decomposition" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, user_id % 8 AS cohort,
        |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |tr AS (
        |  SELECT event_type, cohort,
        |    CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS p
        |  FROM ev WHERE event_id % 2 = 0 GROUP BY event_type, cohort),
        |ts AS (
        |  SELECT y, p FROM ev JOIN tr USING (event_type, cohort)
        |  WHERE event_id % 2 = 1),
        |cells AS (
        |  SELECT CAST(ROUND(p * 10000.0) AS BIGINT) AS pq,
        |    CAST(y AS BIGINT) AS y, CAST(COUNT(*) AS BIGINT) AS m
        |  FROM ts GROUP BY 1, 2),
        |tot AS (SELECT SUM(m) AS n, SUM(y * m) AS s FROM cells),
        |bs AS (
        |  SELECT SUM(CAST(ROUND(CAST(m AS DOUBLE)
        |    * (CAST(pq AS DOUBLE) / 10000.0 - CAST(y AS DOUBLE))
        |    * (CAST(pq AS DOUBLE) / 10000.0 - CAST(y AS DOUBLE))
        |    * 1000000000.0) AS BIGINT)) AS bq
        |  FROM cells),
        |fc AS (SELECT pq, SUM(m) AS nk, SUM(y * m) AS sk
        |       FROM cells GROUP BY pq),
        |rr AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
        |    SUM(CAST(ROUND(CAST(nk AS DOUBLE)
        |      * (CAST(pq AS DOUBLE) / 10000.0 - CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE))
        |      * (CAST(pq AS DOUBLE) / 10000.0 - CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE))
        |      * 1000000000.0) AS BIGINT)) AS rq,
        |    SUM(CAST(ROUND(CAST(nk AS DOUBLE)
        |      * (CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE) - CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
        |      * (CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE) - CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
        |      * 1000000000.0) AS BIGINT)) AS gq
        |  FROM fc CROSS JOIN tot t)
        |SELECT CAST(t.n AS BIGINT) AS n, rr.n_cells,
        |  CAST(bs.bq AS DOUBLE) / 1000000000.0 / CAST(t.n AS DOUBLE) AS brier,
        |  CAST(rr.rq AS DOUBLE) / 1000000000.0 / CAST(t.n AS DOUBLE) AS reliability,
        |  CAST(rr.gq AS DOUBLE) / 1000000000.0 / CAST(t.n AS DOUBLE) AS resolution,
        |  CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)
        |    * (1.0 - CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)) AS uncertainty
        |FROM tot t CROSS JOIN bs CROSS JOIN rr""".stripMargin,

    // isotonic twin: the q232 forecast model and quantization, the same
    // cell prefix sums, the same minimax m(i,k) = min_{j≥k} mean(i..j)
    // suffix-min window and max-over-i fold — cell means are exact-long
    // double divisions, so the fit hash-gates without quantization
    "q237_isotonic_calibration" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, user_id % 8 AS cohort,
        |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |tr AS (
        |  SELECT event_type, cohort,
        |    CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS p
        |  FROM ev WHERE event_id % 2 = 0 GROUP BY event_type, cohort),
        |ts AS (
        |  SELECT y, CAST(ROUND(p * 10000.0) AS BIGINT) AS pq
        |  FROM ev JOIN tr USING (event_type, cohort)
        |  WHERE event_id % 2 = 1),
        |cells AS (
        |  SELECT pq AS score, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS pos
        |  FROM ts GROUP BY pq),
        |idx AS (
        |  SELECT score, n, pos,
        |    row_number() OVER (ORDER BY score) AS i,
        |    CAST(SUM(n) OVER (ORDER BY score) AS BIGINT) AS cn,
        |    CAST(SUM(pos) OVER (ORDER BY score) AS BIGINT) AS cp
        |  FROM cells),
        |pairs AS (
        |  SELECT a.i AS ia, b.i AS ib,
        |    CAST(b.cp - a.cp + a.pos AS DOUBLE) /
        |      CAST(b.cn - a.cn + a.n AS DOUBLE) AS m
        |  FROM idx a JOIN idx b ON a.i <= b.i),
        |suf AS (
        |  SELECT ia, ib, MIN(m) OVER (PARTITION BY ia ORDER BY ib DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mik
        |  FROM pairs),
        |iso AS (SELECT ib AS i, MAX(mik) AS rate_iso FROM suf GROUP BY ib)
        |SELECT idx.score, idx.n, idx.pos,
        |  CAST(idx.pos AS DOUBLE) / CAST(idx.n AS DOUBLE) AS rate_raw,
        |  iso.rate_iso
        |FROM idx JOIN iso USING (i) ORDER BY score""".stripMargin,

    // F1-threshold twin: identical cents cells, descending prefix
    // counts, the exact integer F1 ratio and (f1q desc, sc asc) argmax
    "q257_best_f1_threshold" ->
      """WITH b AS (
        |  SELECT CAST(ROUND(value * 100.0) AS BIGINT) AS sc,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |cells AS (SELECT sc, CAST(COUNT(*) AS BIGINT) AS n,
        |            CAST(SUM(y) AS BIGINT) AS pos
        |          FROM b GROUP BY sc),
        |tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS p FROM cells),
        |c AS (SELECT sc,
        |        CAST(SUM(pos) OVER w AS BIGINT) AS tp,
        |        CAST(SUM(n) OVER w AS BIGINT) AS pp
        |      FROM cells
        |      WINDOW w AS (ORDER BY sc DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT sc, tp, pp, pp - tp AS fp, t.p - tp AS fn,
        |        (2 * tp * 1000000000) // (2 * tp + (pp - tp) + (t.p - tp)) AS f1q,
        |        t.p AS pt
        |      FROM c CROSS JOIN tot t),
        |best AS (SELECT * FROM f ORDER BY f1q DESC, sc LIMIT 1)
        |SELECT sc AS threshold, tp, fp, fn,
        |  CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE) AS "precision",
        |  CAST(tp AS DOUBLE) / CAST(pt AS DOUBLE) AS recall,
        |  CAST(f1q AS DOUBLE) / 1000000000.0 AS f1
        |FROM best""".stripMargin,

    // replay twin: identical micro-quantized per-(cohort, action) train
    // means, the same (rq desc, action) argmax, the same matched-rows
    // rule on the held-out half
    "q252_bandit_replay" ->
      """WITH ev AS (
        |  SELECT event_id, user_id % 8 AS cohort, event_type AS action,
        |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS reward
        |  FROM events WHERE value IS NOT NULL),
        |tr AS (
        |  SELECT cohort, action,
        |    (SUM(reward) * 1000000) // COUNT(*) AS rq
        |  FROM ev WHERE event_id % 2 = 0 GROUP BY cohort, action),
        |pol AS (
        |  SELECT cohort, action FROM (
        |    SELECT cohort, action,
        |      row_number() OVER (PARTITION BY cohort
        |        ORDER BY rq DESC, action) AS rn
        |    FROM tr) x WHERE rn = 1)
        |SELECT e.cohort, e.action, CAST(COUNT(*) AS BIGINT) AS n_matched,
        |  CAST(SUM(e.reward) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS replay_reward
        |FROM ev e JOIN pol USING (cohort, action)
        |WHERE e.event_id % 2 = 1
        |GROUP BY e.cohort, e.action
        |ORDER BY e.cohort""".stripMargin,

    // ARI twin: identical contingency and the cross-multiplied
    // (2·N₂·x − 2ab)/(N₂(a+b) − 2ab) identity in HUGEINT
    "q183_adjusted_rand" ->
      s"""WITH p AS (
         |${TextAnalysis.langidPredSql}),
         |bse AS (SELECT lang AS a, pred_lang AS b FROM p
         |        WHERE lang IS NOT NULL AND pred_lang IS NOT NULL),
         |c AS (SELECT a, b, COUNT(*) AS c FROM bse GROUP BY a, b),
         |x AS (SELECT SUM(CAST(c AS HUGEINT) * (c - 1)) AS x,
         |        COUNT(*) AS n_cells, CAST(SUM(c) AS BIGINT) AS n FROM c),
         |aa AS (SELECT SUM(CAST(ai AS HUGEINT) * (ai - 1)) AS sa
         |       FROM (SELECT CAST(SUM(c) AS BIGINT) AS ai FROM c GROUP BY a) t),
         |bb AS (SELECT SUM(CAST(bj AS HUGEINT) * (bj - 1)) AS sb
         |       FROM (SELECT CAST(SUM(c) AS BIGINT) AS bj FROM c GROUP BY b) t)
         |SELECT x.n, x.n_cells,
         |  CASE WHEN CAST(x.n AS HUGEINT) * (x.n - 1) * (sa + sb)
         |         - 2 * sa * sb = 0 THEN NULL
         |       ELSE CAST(2 * CAST(x.n AS HUGEINT) * (x.n - 1) * x.x
         |              - 2 * sa * sb AS DOUBLE) /
         |            CAST(CAST(x.n AS HUGEINT) * (x.n - 1) * (sa + sb)
         |              - 2 * sa * sb AS DOUBLE) END AS ari
         |FROM x CROSS JOIN aa CROSS JOIN bb""".stripMargin,

    // confusion twin: q29's shared langid CTE, the same full-outer
    // marginal join (classes present on either axis survive), the same
    // single-division F1 form
    "q164_confusion" ->
      s"""WITH p AS (
         |${TextAnalysis.langidPredSql}),
         |b AS (SELECT lang AS a, pred_lang AS pr FROM p
         |      WHERE lang IS NOT NULL AND pred_lang IS NOT NULL),
         |c AS (SELECT a, pr, COUNT(*) AS c FROM b GROUP BY a, pr),
         |rs AS (SELECT a AS label, CAST(SUM(c) AS BIGINT) AS na FROM c GROUP BY a),
         |cs AS (SELECT pr AS label, CAST(SUM(c) AS BIGINT) AS np FROM c GROUP BY pr),
         |dg AS (SELECT a AS label, CAST(c AS BIGINT) AS tp FROM c WHERE a = pr),
         |j AS (SELECT COALESCE(rs.label, cs.label) AS label,
         |        COALESCE(na, 0) AS n_actual, COALESCE(np, 0) AS n_pred
         |      FROM rs FULL OUTER JOIN cs ON rs.label = cs.label),
         |f AS (SELECT j.label, n_actual, n_pred, COALESCE(tp, 0) AS tp
         |      FROM j LEFT JOIN dg ON j.label = dg.label)
         |SELECT label, n_actual, n_pred, tp,
         |  n_pred - tp AS fp, n_actual - tp AS fn,
         |  CASE WHEN n_pred = 0 THEN NULL
         |       ELSE CAST(tp AS DOUBLE) / n_pred END AS "precision",
         |  CASE WHEN n_actual = 0 THEN NULL
         |       ELSE CAST(tp AS DOUBLE) / n_actual END AS recall,
         |  CASE WHEN 2 * tp + (n_pred - tp) + (n_actual - tp) = 0 THEN NULL
         |       ELSE CAST(2 * tp AS DOUBLE) /
         |         (2 * tp + (n_pred - tp) + (n_actual - tp)) END AS f1
         |FROM f ORDER BY label""".stripMargin,

    // kappa twin: identical contingency, the cross-multiplied
    // (N·D − E)/(N² − E) identity in HUGEINT, the same three divisions
    "q165_kappa" ->
      s"""WITH p AS (
         |${TextAnalysis.langidPredSql}),
         |b AS (SELECT lang AS a, pred_lang AS pb FROM p
         |      WHERE lang IS NOT NULL AND pred_lang IS NOT NULL),
         |c AS (SELECT a, pb, COUNT(*) AS c FROM b GROUP BY a, pb),
         |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
         |d AS (SELECT COALESCE(CAST(SUM(c) AS BIGINT), 0) AS d FROM c WHERE a = pb),
         |rs AS (SELECT a AS l, CAST(SUM(c) AS BIGINT) AS rs FROM c GROUP BY a),
         |cs AS (SELECT pb AS l, CAST(SUM(c) AS BIGINT) AS cs FROM c GROUP BY pb),
         |e AS (SELECT COALESCE(SUM(CAST(rs AS HUGEINT) * cs), 0) AS e
         |      FROM rs JOIN cs USING (l))
         |SELECT n.n AS n,
         |  CAST(d.d AS DOUBLE) / n.n AS po,
         |  CAST(e.e AS DOUBLE) / (CAST(n.n AS DOUBLE) * n.n) AS pe,
         |  CASE WHEN CAST(n.n AS HUGEINT) * n.n = e.e THEN NULL
         |       ELSE CAST(CAST(n.n AS HUGEINT) * d.d - e.e AS DOUBLE) /
         |            CAST(CAST(n.n AS HUGEINT) * n.n - e.e AS DOUBLE) END AS kappa
         |FROM n CROSS JOIN d CROSS JOIN e""".stripMargin,

    // regression twin: identical integer micro-mean floor division,
    // identical quantized residual sums and the cross-multiplied R²
    "q166_regression_metrics" ->
      """WITH ev AS (
        |  SELECT event_type, value, CAST(ROUND(value * 100.0) AS BIGINT) AS vc
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT event_type,
        |        (CAST(SUM(vc) AS BIGINT) * 10000) // COUNT(*) AS mean_mc
        |      FROM ev GROUP BY event_type),
        |p AS (SELECT ev.value, CAST(mean_mc AS DOUBLE) / 1000000.0 AS pred
        |      FROM ev JOIN m USING (event_type)),
        |q AS (SELECT CAST(ROUND(value * 1000000.0) AS BIGINT) AS aq,
        |             CAST(ROUND(pred * 1000000.0) AS BIGINT) AS pq
        |      FROM p),
        |g AS (SELECT COUNT(*) AS n,
        |        SUM(CAST(aq AS HUGEINT)) AS s,
        |        SUM(CAST(aq AS HUGEINT) * aq) AS qq,
        |        SUM(CAST(abs(aq - pq) AS HUGEINT)) AS sad,
        |        SUM(CAST(aq - pq AS HUGEINT) * (aq - pq)) AS sse
        |      FROM q)
        |SELECT n,
        |  CAST(sad AS DOUBLE) / (1000000.0 * n) AS mae,
        |  sqrt(CAST(sse AS DOUBLE) / (1000000.0 * 1000000.0 * n)) AS rmse,
        |  CASE WHEN CAST(n AS HUGEINT) * qq - s * s = 0 THEN NULL
        |       ELSE CAST((CAST(n AS HUGEINT) * qq - s * s) -
        |              CAST(n AS HUGEINT) * sse AS DOUBLE) /
        |            CAST(CAST(n AS HUGEINT) * qq - s * s AS DOUBLE) END AS r2
        |FROM g""".stripMargin,

    // AP twin: shared rank + running-relevance windows, nano-quantized
    // prefix/pos terms, min(R, k) normalization, NULL on no-relevant
    "q167_avg_precision" ->
      """WITH b AS (
        |  SELECT lang, doc_id, n_chars,
        |    CASE WHEN len(regexp_extract_all(lower(text), '\bthe\b')) > 0
        |         THEN 1 ELSE 0 END AS rel
        |  FROM documents),
        |r AS (SELECT lang, rel,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY n_chars DESC, doc_id) AS pos,
        |        SUM(rel) OVER (PARTITION BY lang
        |          ORDER BY n_chars DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
        |      FROM b),
        |g AS (SELECT lang, COUNT(*) AS n_docs, CAST(SUM(rel) AS BIGINT) AS n_rel,
        |        CAST(SUM(CASE WHEN rel = 1 AND pos <= 10 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_rel_topk,
        |        CAST(SUM(CASE WHEN rel = 1 AND pos <= 10 THEN
        |          CAST(ROUND(CAST(prefix AS DOUBLE) / pos * 1000000000.0)
        |            AS BIGINT) ELSE 0 END) AS BIGINT) AS sp_q
        |      FROM r GROUP BY lang)
        |SELECT lang, n_docs, n_rel, n_rel_topk,
        |  CASE WHEN least(n_rel, 10) = 0 THEN NULL
        |       ELSE CAST(sp_q AS DOUBLE) / (1000000000.0 * least(n_rel, 10))
        |  END AS ap
        |FROM g ORDER BY lang""".stripMargin,

    // AUC twin: row_number over the same score order (tie order inside a
    // group is irrelevant — only MIN(rank) and counts enter), the same
    // 2U = Σ np_g(2·min_g + n_g − 1) − np(np+1) integer identity in
    // HUGEINT, the same single final division.
    "q160_auc" ->
      """WITH b AS (
        |  SELECT value AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT s, y, row_number() OVER (ORDER BY s) AS rn FROM b),
        |g AS (SELECT s, MIN(rn) AS minr, COUNT(*) AS n,
        |        CAST(SUM(y) AS BIGINT) AS np FROM r GROUP BY s),
        |t AS (SELECT SUM(CAST(np AS HUGEINT) * (2 * minr + n - 1)) AS s2,
        |        CAST(SUM(np) AS BIGINT) AS n_pos,
        |        CAST(SUM(n - np) AS BIGINT) AS n_neg FROM g),
        |t2 AS (SELECT n_pos, n_neg,
        |        CAST(s2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT) AS u2
        |       FROM t)
        |SELECT n_pos, n_neg, u2,
        |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |       ELSE CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg) END AS auc
        |FROM t2""".stripMargin,

    // MI twin: identical contingency/marginal counts, the identical
    // nano-quantized (c/N)·ln(·) terms summed as exact integers, one
    // division per entropy and the same sqrt-product chain for nmi.
    "q161_mutual_info" ->
      """WITH b AS (
        |  SELECT c.c_mktsegment AS x, o.o_orderpriority AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment IS NOT NULL AND o.o_orderpriority IS NOT NULL),
        |cxy AS (SELECT x, y, COUNT(*) AS cxy FROM b GROUP BY x, y),
        |cx AS (SELECT x, COUNT(*) AS cx FROM b GROUP BY x),
        |cy AS (SELECT y, COUNT(*) AS cy FROM b GROUP BY y),
        |nn AS (SELECT COUNT(*) AS n FROM b),
        |mi AS (
        |  SELECT CAST(SUM(CAST(ROUND((CAST(cxy AS DOUBLE) / n) *
        |      ln((CAST(n AS DOUBLE) * cxy) / (CAST(cx AS DOUBLE) * cy)) *
        |      1000000000.0) AS BIGINT)) AS BIGINT) AS mi_q,
        |    COUNT(*) AS n_cells
        |  FROM cxy JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN nn),
        |hx AS (
        |  SELECT CAST(SUM(CAST(ROUND((CAST(cx AS DOUBLE) / n) *
        |      ln(CAST(n AS DOUBLE) / cx) * 1000000000.0) AS BIGINT))
        |    AS BIGINT) AS hx_q
        |  FROM cx CROSS JOIN nn),
        |hy AS (
        |  SELECT CAST(SUM(CAST(ROUND((CAST(cy AS DOUBLE) / n) *
        |      ln(CAST(n AS DOUBLE) / cy) * 1000000000.0) AS BIGINT))
        |    AS BIGINT) AS hy_q
        |  FROM cy CROSS JOIN nn)
        |SELECT nn.n AS n, mi.n_cells,
        |  CAST(mi_q AS DOUBLE) / 1000000000.0 AS mi,
        |  CAST(hx_q AS DOUBLE) / 1000000000.0 AS hx,
        |  CAST(hy_q AS DOUBLE) / 1000000000.0 AS hy,
        |  CASE WHEN hx_q <= 0 OR hy_q <= 0 THEN NULL
        |       ELSE CAST(mi_q AS DOUBLE) /
        |         sqrt(CAST(hx_q AS DOUBLE) * CAST(hy_q AS DOUBLE)) END AS nmi
        |FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN nn""".stripMargin,

    // calibration twin: identical cents quantization, identical integer
    // width/bin cut, exact long sums, the same two divisions per bin.
    "q162_calibration" ->
      """WITH b AS (
        |  SELECT CAST(ROUND(value * 100.0) AS BIGINT) AS vc,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |mm AS (SELECT MIN(vc) AS minc, MAX(vc) AS maxc FROM b),
        |binned AS (
        |  SELECT (vc - minc) // ((maxc - minc) // 10 + 1) AS bin, vc, y
        |  FROM b CROSS JOIN mm),
        |g AS (
        |  SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
        |    CAST(SUM(vc) AS BIGINT) AS sv
        |  FROM binned GROUP BY bin)
        |SELECT bin, n, n_pos,
        |  CASE WHEN maxc = minc THEN NULL
        |       ELSE CAST(sv - n * minc AS DOUBLE) /
        |         (CAST(n AS DOUBLE) * (maxc - minc)) END AS mean_norm,
        |  CAST(n_pos AS DOUBLE) / n AS frac_pos,
        |  CASE WHEN maxc = minc THEN NULL
        |       ELSE abs(CAST(n_pos AS DOUBLE) / n -
        |         CAST(sv - n * minc AS DOUBLE) /
        |         (CAST(n AS DOUBLE) * (maxc - minc))) END AS gap
        |FROM g CROSS JOIN mm ORDER BY bin""".stripMargin,

    // NDCG twin: identical rank windows (score desc / rel desc, doc_id
    // ties), exact 2^rel−1 gains, the identical ln(x)/ln(2) discount
    // chain nano-quantized per position, one final division.
    "q163_ndcg" ->
      """WITH b AS (
        |  SELECT lang, doc_id, n_chars,
        |    least(3, len(regexp_extract_all(lower(text), '\bthe\b'))) AS rel
        |  FROM documents),
        |r AS (
        |  SELECT lang, rel,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id) AS pos,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY rel DESC, n_chars DESC, doc_id) AS ipos
        |  FROM b),
        |g AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(CASE WHEN pos <= 10 THEN
        |      CAST(ROUND(CAST(CAST(pow(2.0, rel) AS BIGINT) - 1 AS DOUBLE) /
        |        (ln(CAST(pos AS DOUBLE) + 1.0) / ln(2.0)) * 1000000000.0)
        |        AS BIGINT) ELSE 0 END) AS BIGINT) AS dcg_q,
        |    CAST(SUM(CASE WHEN ipos <= 10 THEN
        |      CAST(ROUND(CAST(CAST(pow(2.0, rel) AS BIGINT) - 1 AS DOUBLE) /
        |        (ln(CAST(ipos AS DOUBLE) + 1.0) / ln(2.0)) * 1000000000.0)
        |        AS BIGINT) ELSE 0 END) AS BIGINT) AS idcg_q
        |  FROM r GROUP BY lang)
        |SELECT lang, n_docs,
        |  CAST(dcg_q AS DOUBLE) / 1000000000.0 AS dcg,
        |  CAST(idcg_q AS DOUBLE) / 1000000000.0 AS idcg,
        |  CASE WHEN idcg_q <= 0 THEN NULL
        |       ELSE CAST(dcg_q AS DOUBLE) / CAST(idcg_q AS DOUBLE) END AS ndcg
        |FROM g ORDER BY lang""".stripMargin,

    // BLEU twin: identical pairing/tokenization, NUL-joined n-grams via
    // list slicing, clipped per-pair matches through the same LEFT join,
    // each ln pn nano-quantized before the 4-term sum, one exp micro-
    // rounded (the q253 recipe); brevity penalty shares the exact
    // token-count integers
    "q271_bleu_eval" -> bleuSql(
      """pairs AS (
        |  SELECT doc_id, lang,
        |    regexp_replace(trim(regexp_replace(lower(text), '\bthe\b', ' ', 'g')),
        |      '\s+', ' ', 'g') AS cand,
        |    text AS ref
        |  FROM documents)""".stripMargin),

    // self-BLEU twin: the q271 body over adjacent same-lang doc pairs
    "q279_self_bleu" -> bleuSql(
      """pairs AS (
        |  SELECT doc_id, lang, cand, ref FROM (
        |    SELECT doc_id, lang, text AS cand,
        |      lead(text) OVER (PARTITION BY lang ORDER BY doc_id) AS ref
        |    FROM documents)
        |  WHERE ref IS NOT NULL)""".stripMargin)
  )

  /** The q271/q279 BLEU oracle body: token 1..4-gram clipped matches
    * per (lang, doc pair), BLEU+1 smoothing, brevity penalty — shared
    * between the normalization-distortion pairs (q271) and the
    * adjacent-document self-BLEU diversity pairs (q279); only the
    * `pairs` CTE differs. */
  private def bleuSql(pairsCte: String): String =
    s"""WITH $pairsCte,
        |base AS (
        |  SELECT lang, doc_id, string_split(trim(cand), ' ') AS ct,
        |         string_split(trim(ref), ' ') AS rt
        |  FROM pairs),
        |cpos AS (
        |  SELECT lang, doc_id, n, ct,
        |    unnest(generate_series(1, greatest(len(ct) - n + 1, 0))) AS i
        |  FROM base CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS n) ns),
        |cg AS (
        |  SELECT lang, doc_id, n, array_to_string(ct[i:i+n-1], chr(0)) AS gram,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM cpos GROUP BY lang, doc_id, n, gram),
        |rpos AS (
        |  SELECT lang, doc_id, n, rt,
        |    unnest(generate_series(1, greatest(len(rt) - n + 1, 0))) AS i
        |  FROM base CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS n) ns),
        |rg AS (
        |  SELECT lang, doc_id, n, array_to_string(rt[i:i+n-1], chr(0)) AS gram,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM rpos GROUP BY lang, doc_id, n, gram),
        |m AS (
        |  SELECT cg.lang, cg.n,
        |    CAST(SUM(least(cg.c, COALESCE(rg.c, 0))) AS BIGINT) AS m
        |  FROM cg LEFT JOIN rg ON cg.lang = rg.lang AND cg.doc_id = rg.doc_id
        |    AND cg.n = rg.n AND cg.gram = rg.gram
        |  GROUP BY cg.lang, cg.n),
        |mp AS (
        |  SELECT lang,
        |    CAST(COALESCE(SUM(CASE WHEN n = 1 THEN m END), 0) AS BIGINT) AS m1,
        |    CAST(COALESCE(SUM(CASE WHEN n = 2 THEN m END), 0) AS BIGINT) AS m2,
        |    CAST(COALESCE(SUM(CASE WHEN n = 3 THEN m END), 0) AS BIGINT) AS m3,
        |    CAST(COALESCE(SUM(CASE WHEN n = 4 THEN m END), 0) AS BIGINT) AS m4
        |  FROM m GROUP BY lang),
        |tot AS (
        |  SELECT lang, COUNT(*) AS n_pairs,
        |    CAST(SUM(len(ct)) AS BIGINT) AS cand_tokens,
        |    CAST(SUM(len(rt)) AS BIGINT) AS ref_tokens,
        |    CAST(SUM(greatest(len(ct), 0)) AS BIGINT) AS t1,
        |    CAST(SUM(greatest(len(ct) - 1, 0)) AS BIGINT) AS t2,
        |    CAST(SUM(greatest(len(ct) - 2, 0)) AS BIGINT) AS t3,
        |    CAST(SUM(greatest(len(ct) - 3, 0)) AS BIGINT) AS t4
        |  FROM base GROUP BY lang)
        |SELECT t.lang, t.n_pairs, t.cand_tokens, t.ref_tokens,
        |  COALESCE(m1, 0) AS m1, COALESCE(m2, 0) AS m2,
        |  COALESCE(m3, 0) AS m3, COALESCE(m4, 0) AS m4,
        |  t1, t2, t3, t4,
        |  CAST(ROUND(exp(least(0.0, 1.0 - CAST(ref_tokens AS DOUBLE)
        |    / CAST(cand_tokens AS DOUBLE))) * 1000000.0) AS BIGINT) AS bp_micro,
        |  CASE WHEN COALESCE(m1, 0) = 0 OR t1 = 0 THEN 0
        |    ELSE CAST(ROUND(exp(
        |      CAST(CAST(ROUND(ln(CAST(m1 AS DOUBLE) / CAST(t1 AS DOUBLE))
        |          * 1000000000.0) AS BIGINT)
        |        + CAST(ROUND(ln(CAST(m2 + 1 AS DOUBLE) / CAST(t2 + 1 AS DOUBLE))
        |          * 1000000000.0) AS BIGINT)
        |        + CAST(ROUND(ln(CAST(m3 + 1 AS DOUBLE) / CAST(t3 + 1 AS DOUBLE))
        |          * 1000000000.0) AS BIGINT)
        |        + CAST(ROUND(ln(CAST(m4 + 1 AS DOUBLE) / CAST(t4 + 1 AS DOUBLE))
        |          * 1000000000.0) AS BIGINT) AS DOUBLE) / 4000000000.0
        |      + least(0.0, 1.0 - CAST(ref_tokens AS DOUBLE)
        |        / CAST(cand_tokens AS DOUBLE))) * 1000000.0) AS BIGINT)
        |  END AS bleu_micro
        |FROM tot t LEFT JOIN mp USING (lang)
        |ORDER BY lang""".stripMargin

  private val oracleMore: Map[String, String] = Map(
    // PSM twin: same fixed-coefficient logistic (identical double chain
    // micro-quantized), bucket-blocked candidates, QUALIFY 1-NN pick
    "q339_psm_att" ->
      """WITH u AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS nev,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS clicks,
        |    CAST(COALESCE(SUM(CASE WHEN value IS NOT NULL
        |      THEN CAST(ROUND(value * 100.0) AS BIGINT) ELSE 0 END), 0)
        |      AS BIGINT) AS y,
        |    (user_id // 8) % 2 AS t
        |  FROM events GROUP BY user_id),
        |sc AS (SELECT *, CAST(ROUND(1000000.0 / (1.0 + exp(-(-1.2
        |    + 0.8 * ln(CAST(nev AS DOUBLE) + 1.0)
        |    - 1.5 * (CAST(clicks AS DOUBLE) / CAST(nev AS DOUBLE))))))
        |    AS BIGINT) AS p_mu
        |  FROM u),
        |sb AS (SELECT *, p_mu // 50000 AS b FROM sc),
        |tr AS (SELECT user_id AS t_uid, p_mu AS pt, y AS yt, b
        |       FROM sb WHERE t = 1),
        |ct AS (SELECT user_id AS c_uid, p_mu AS pc, y AS yc, b AS cb
        |       FROM sb WHERE t = 0),
        |cand AS (
        |  SELECT t_uid, pt, yt, pc, yc, c_uid, ABS(pt - pc) AS gap
        |  FROM (SELECT tr.*, unnest([b - 1, b, b + 1]) AS cb FROM tr) tx
        |  JOIN ct USING (cb) WHERE ABS(pt - pc) <= 50000),
        |best AS (SELECT * FROM cand QUALIFY ROW_NUMBER() OVER (
        |  PARTITION BY t_uid ORDER BY gap, pc, c_uid) = 1),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_treated FROM tr),
        |ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
        |    CAST(SUM(yt - yc) AS BIGINT) AS d,
        |    CAST(SUM(gap) AS BIGINT) AS g
        |  FROM best)
        |SELECT n_treated, n_matched,
        |  round(CAST(d AS DOUBLE) / 100.0
        |    / CAST(n_matched AS DOUBLE), 6) AS att,
        |  round(CAST(g AS DOUBLE) / 1000000.0
        |    / CAST(n_matched AS DOUBLE), 6) AS mean_pscore_gap
        |FROM ag CROSS JOIN nt""".stripMargin,

    // McNemar twin: identical micro-quantized sign probes, exact
    // discordant-cell counts, the same continuity-corrected chi-square
    "q349_mcnemar" ->
      """WITH base AS (
        |  SELECT (CAST(label AS BIGINT) % 2 = 1) AS truth,
        |    (CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1000000.0)
        |      AS BIGINT) > 0) AS pa,
        |    (list_sum(list_transform(embedding[1:8],
        |      x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)))
        |      > 0) AS pb
        |  FROM embeddings),
        |ag AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN pa = truth AND pb = truth THEN 1 ELSE 0 END)
        |      AS BIGINT) AS both_correct,
        |    CAST(SUM(CASE WHEN pa = truth AND pb <> truth THEN 1 ELSE 0 END)
        |      AS BIGINT) AS only_a,
        |    CAST(SUM(CASE WHEN pa <> truth AND pb = truth THEN 1 ELSE 0 END)
        |      AS BIGINT) AS only_b,
        |    CAST(SUM(CASE WHEN pa <> truth AND pb <> truth THEN 1 ELSE 0 END)
        |      AS BIGINT) AS both_wrong
        |  FROM base)
        |SELECT n, both_correct, only_a, only_b, both_wrong,
        |  CASE WHEN only_a + only_b = 0 THEN NULL
        |    ELSE round(CAST(abs(only_a - only_b) - 1 AS DOUBLE) *
        |      CAST(abs(only_a - only_b) - 1 AS DOUBLE) /
        |      CAST(only_a + only_b AS DOUBLE), 6) END AS chi2,
        |  CASE WHEN only_a + only_b = 0 THEN FALSE
        |    ELSE CAST(abs(only_a - only_b) - 1 AS DOUBLE) *
        |      CAST(abs(only_a - only_b) - 1 AS DOUBLE) /
        |      CAST(only_a + only_b AS DOUBLE) > 3.84 END AS significant
        |FROM ag""".stripMargin,

    // Krippendorff twin: same ragged-panel coincidence counting —
    // nano-quantized per-(item,value) agreement terms, HUGEINT category
    // products, identical D_o/D_e/alpha double chains
    "q334_krippendorff" ->
      """WITH ratings AS (
        |  SELECT l_partkey AS item, l_suppkey % 4 AS rater,
        |    MIN(l_returnflag) AS v
        |  FROM lineitem GROUP BY 1, 2),
        |mu AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS m
        |       FROM ratings GROUP BY 1 HAVING COUNT(*) >= 2),
        |nuc AS (SELECT r.item, mu.m, r.v, CAST(COUNT(*) AS BIGINT) AS nuc
        |        FROM ratings r JOIN mu ON r.item = mu.item GROUP BY 1, 2, 3),
        |oagg AS (SELECT v, nuc,
        |    CAST(ROUND(CAST(nuc AS DOUBLE) * CAST(nuc - 1 AS DOUBLE)
        |      / CAST(m - 1 AS DOUBLE) * 1000000000.0) AS BIGINT) AS o
        |  FROM nuc),
        |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS oa FROM oagg),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |       CAST(SUM(m) AS BIGINT) AS n_values FROM mu),
        |ce AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
        |    SUM(CAST(nc AS HUGEINT) * (nc - 1)) AS cesum
        |  FROM (SELECT v, CAST(SUM(nuc) AS BIGINT) AS nc
        |        FROM oagg GROUP BY v))
        |SELECT n_items, n_values, n_categories,
        |  round(1.0 - CAST(oa AS DOUBLE)
        |    / (1000000000.0 * CAST(n_values AS DOUBLE)), 6) AS d_o,
        |  round(1.0 - CAST(cesum AS DOUBLE)
        |    / (CAST(n_values AS DOUBLE) * CAST(n_values - 1 AS DOUBLE)), 6)
        |    AS d_e,
        |  CASE WHEN 1.0 - CAST(cesum AS DOUBLE)
        |      / (CAST(n_values AS DOUBLE) * CAST(n_values - 1 AS DOUBLE))
        |      <= 0.0 THEN NULL
        |    ELSE round(1.0 - (1.0 - CAST(oa AS DOUBLE)
        |        / (1000000000.0 * CAST(n_values AS DOUBLE)))
        |      / (1.0 - CAST(cesum AS DOUBLE)
        |        / (CAST(n_values AS DOUBLE)
        |          * CAST(n_values - 1 AS DOUBLE))), 6)
        |  END AS alpha
        |FROM tot CROSS JOIN nn CROSS JOIN ce""".stripMargin,

    // DR-OPE twin: identical split/cells, micro-quantized q-hat per
    // train cell, the same argmax tie-breaks via QUALIFY, the same
    // micro-quantized DM/IPS/correction chains per eval cell
    "q335_dr_ope" ->
      """WITH base AS (
        |  SELECT user_id % 16 AS x, event_type AS a,
        |    CAST(ROUND(value * 100.0) AS BIGINT) AS r,
        |    (epoch_us(ts) // 86400000000) % 2 AS split
        |  FROM events WHERE value IS NOT NULL),
        |train AS (SELECT * FROM base WHERE split = 0),
        |ev AS (SELECT * FROM base WHERE split = 1),
        |tcell AS (SELECT x, a,
        |    CAST(ROUND(CAST(SUM(r) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |      * 1000000.0) AS BIGINT) AS qhat
        |  FROM train GROUP BY 1, 2),
        |ntr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM train),
        |gg AS (SELECT CAST(ROUND(CAST(SUM(r) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS BIGINT) AS g
        |  FROM train),
        |ga AS (SELECT a, CAST(ROUND(CAST(SUM(r) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS BIGINT) AS qhat
        |  FROM train GROUP BY 1),
        |agl AS (SELECT a AS ag, qhat AS qag FROM ga
        |        QUALIFY ROW_NUMBER() OVER (ORDER BY qhat DESC, a) = 1),
        |pi AS (SELECT x, a AS pia, qhat AS qpi FROM tcell
        |       QUALIFY ROW_NUMBER() OVER (
        |         PARTITION BY x ORDER BY qhat DESC, a) = 1),
        |ecell AS (SELECT x, a, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(r) AS BIGINT) AS sr
        |  FROM ev GROUP BY 1, 2),
        |nx AS (SELECT x, CAST(SUM(n) AS BIGINT) AS nx
        |       FROM ecell GROUP BY 1),
        |nev AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_eval FROM ev),
        |dm AS (SELECT CAST(SUM(CAST(ROUND(CAST(nx.nx AS DOUBLE)
        |      * CAST(COALESCE(pi.qpi, agl.qag) AS DOUBLE)) AS BIGINT))
        |    AS BIGINT) AS sdm
        |  FROM nx LEFT JOIN pi ON nx.x = pi.x CROSS JOIN agl),
        |cj AS (SELECT ecell.n, ecell.sr, nx.nx,
        |    COALESCE(tc.qhat, gg.g) AS qae
        |  FROM ecell JOIN nx ON ecell.x = nx.x
        |  LEFT JOIN pi ON ecell.x = pi.x
        |  LEFT JOIN tcell tc ON ecell.x = tc.x AND ecell.a = tc.a
        |  CROSS JOIN agl CROSS JOIN gg
        |  WHERE ecell.a = COALESCE(pi.pia, agl.ag)),
        |sums AS (SELECT
        |    COALESCE(CAST(SUM(CAST(ROUND(CAST(sr AS DOUBLE)
        |      * CAST(nx AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
        |      AS BIGINT)) AS BIGINT), 0) AS sips,
        |    COALESCE(CAST(SUM(CAST(ROUND((CAST(sr AS DOUBLE) * 1000000.0
        |      - CAST(n AS DOUBLE) * CAST(qae AS DOUBLE))
        |      * CAST(nx AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT))
        |      AS BIGINT), 0) AS scorr
        |  FROM cj)
        |SELECT n_train, n_eval,
        |  round(CAST(sdm AS DOUBLE) / 100000000.0
        |    / CAST(n_eval AS DOUBLE), 6) AS v_dm,
        |  round(CAST(sips AS DOUBLE) / 100000000.0
        |    / CAST(n_eval AS DOUBLE), 6) AS v_ips,
        |  round(CAST(sdm + scorr AS DOUBLE) / 100000000.0
        |    / CAST(n_eval AS DOUBLE), 6) AS v_dr
        |FROM ntr CROSS JOIN nev CROSS JOIN dm CROSS JOIN sums""".stripMargin,

    // DeLong twin: identical distinct-value placement statistics
    // (doubled midranks), HUGEINT moments, the same fixed
    // division/sqrt chain and degenerate-class NULL guard
    "q315_auc_delong" ->
      """WITH b AS (
        |  SELECT value AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |g AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS cnt,
        |        CAST(SUM(y) AS BIGINT) AS np FROM b GROUP BY s),
        |c AS (SELECT s, cnt, np,
        |    CAST(SUM(cnt) OVER (ORDER BY s) AS BIGINT) AS cumall,
        |    CAST(SUM(np) OVER (ORDER BY s) AS BIGINT) AS cumpos FROM g),
        |tot AS (SELECT CAST(SUM(np) AS BIGINT) AS m,
        |        CAST(SUM(cnt - np) AS BIGINT) AS n FROM g),
        |pl AS (SELECT np, cnt,
        |    2 * ((cumall - cnt) - (cumpos - np)) + (cnt - np) AS v10,
        |    2 * m - (2 * ((cumall - cnt)
        |      - ((cumall - cumpos) - (cnt - np))) + np) AS w01
        |  FROM c CROSS JOIN tot),
        |mom AS (SELECT
        |    SUM(CAST(np AS HUGEINT) * v10) AS s1,
        |    SUM(CAST(np AS HUGEINT) * v10 * v10) AS sqq,
        |    SUM(CAST(cnt - np AS HUGEINT) * w01) AS t1,
        |    SUM(CAST(cnt - np AS HUGEINT) * w01 * w01) AS tqq
        |  FROM pl)
        |SELECT m AS n_pos, n AS n_neg,
        |  round(CAST(s1 AS DOUBLE)
        |    / CAST(CAST(2 AS HUGEINT) * m * n AS DOUBLE), 9) AS auc,
        |  CASE WHEN m > 1 AND n > 1 THEN round(sqrt(
        |      CAST(CAST(m AS HUGEINT) * sqq - s1 * s1 AS DOUBLE)
        |        / CAST(CAST(m AS HUGEINT) * (m - 1) * 4 * n * n * m
        |          AS DOUBLE)
        |      + CAST(CAST(n AS HUGEINT) * tqq - t1 * t1 AS DOUBLE)
        |        / CAST(CAST(n AS HUGEINT) * (n - 1) * 4 * m * m * n
        |          AS DOUBLE)), 9)
        |    ELSE NULL END AS se,
        |  CASE WHEN m > 1 AND n > 1 THEN round(
        |      CAST(s1 AS DOUBLE)
        |        / CAST(CAST(2 AS HUGEINT) * m * n AS DOUBLE)
        |      - 1.96 * sqrt(
        |      CAST(CAST(m AS HUGEINT) * sqq - s1 * s1 AS DOUBLE)
        |        / CAST(CAST(m AS HUGEINT) * (m - 1) * 4 * n * n * m
        |          AS DOUBLE)
        |      + CAST(CAST(n AS HUGEINT) * tqq - t1 * t1 AS DOUBLE)
        |        / CAST(CAST(n AS HUGEINT) * (n - 1) * 4 * m * m * n
        |          AS DOUBLE)), 6)
        |    ELSE NULL END AS ci_lo,
        |  CASE WHEN m > 1 AND n > 1 THEN round(
        |      CAST(s1 AS DOUBLE)
        |        / CAST(CAST(2 AS HUGEINT) * m * n AS DOUBLE)
        |      + 1.96 * sqrt(
        |      CAST(CAST(m AS HUGEINT) * sqq - s1 * s1 AS DOUBLE)
        |        / CAST(CAST(m AS HUGEINT) * (m - 1) * 4 * n * n * m
        |          AS DOUBLE)
        |      + CAST(CAST(n AS HUGEINT) * tqq - t1 * t1 AS DOUBLE)
        |        / CAST(CAST(n AS HUGEINT) * (n - 1) * 4 * m * m * n
        |          AS DOUBLE)), 6)
        |    ELSE NULL END AS ci_hi
        |FROM mom CROSS JOIN tot""".stripMargin,
    // best-of-k twin: the same rank window, closed-form exact binomials
    // (integer // is exact — the products are always divisible), the
    // same one-division-then-micro-quantize per problem
    "q282_best_of_k" ->
      """WITH r AS (
        |  SELECT user_id, event_id,
        |    CAST(ROUND(value * 100.0) AS BIGINT) AS vc,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ROUND(value * 100.0) AS BIGINT), event_id)
        |      AS BIGINT) AS i,
        |    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        |  FROM events WHERE value IS NOT NULL),
        |ks AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS k),
        |terms AS (
        |  SELECT user_id, k,
        |    CASE k WHEN 1 THEN CAST(1 AS BIGINT) WHEN 2 THEN i - 1
        |      ELSE ((i - 1) * (i - 2) * (i - 3)) // 6 END AS num,
        |    CASE k WHEN 1 THEN n WHEN 2 THEN (n * (n - 1)) // 2
        |      ELSE (n * (n - 1) * (n - 2) * (n - 3)) // 24 END AS den,
        |    vc
        |  FROM r CROSS JOIN ks WHERE n >= k),
        |per AS (
        |  SELECT user_id, k, den, CAST(SUM(vc * num) AS BIGINT) AS s
        |  FROM terms GROUP BY user_id, k, den),
        |q AS (
        |  SELECT k, CAST(ROUND(CAST(s AS DOUBLE) / CAST(den AS DOUBLE)
        |    / 100.0 * 1000000.0) AS BIGINT) AS estq
        |  FROM per)
        |SELECT k, COUNT(*) AS n_problems,
        |  CAST(SUM(estq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    / 1000000.0 AS best_of_k
        |FROM q GROUP BY k ORDER BY k""".stripMargin,

    // Fleiss twin: the same first-R panel via row_number, exact A/c²
    // integer sums, the identical three-division double chain
    "q280_fleiss_kappa" ->
      """WITH f0 AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |f AS (SELECT user_id, event_type FROM f0 WHERE rn <= 4),
        |el AS (SELECT user_id FROM f GROUP BY user_id HAVING COUNT(*) = 4),
        |nij AS (
        |  SELECT f.user_id, f.event_type, CAST(COUNT(*) AS BIGINT) AS nij
        |  FROM f JOIN el USING (user_id) GROUP BY f.user_id, f.event_type),
        |a AS (SELECT CAST(SUM(nij * nij) AS BIGINT) AS a FROM nij),
        |c2 AS (SELECT CAST(SUM(cj * cj) AS BIGINT) AS c2 FROM (
        |  SELECT CAST(SUM(nij) AS BIGINT) AS cj FROM nij GROUP BY event_type)),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items FROM el),
        |x AS (
        |  SELECT n_items, CAST(4 AS BIGINT) AS n_raters,
        |    CAST(a - n_items * 4 AS DOUBLE)
        |      / CAST(n_items * 12 AS DOUBLE) AS p_bar,
        |    CAST(c2 AS DOUBLE)
        |      / CAST(n_items * 4 * n_items * 4 AS DOUBLE) AS p_e
        |  FROM n CROSS JOIN a CROSS JOIN c2)
        |SELECT n_items, n_raters, p_bar, p_e,
        |  (p_bar - p_e) / (1.0 - p_e) AS kappa
        |FROM x""".stripMargin,

    // ROUGE twin: q271's token-gram CTE skeleton at maxN=2, with BOTH
    // sides' gram totals; every P/R/F1 is one exact-integer division
    "q278_rouge_eval" ->
      """WITH pairs AS (
        |  SELECT doc_id, lang,
        |    regexp_replace(trim(regexp_replace(lower(text), '\bthe\b', ' ', 'g')),
        |      '\s+', ' ', 'g') AS cand,
        |    text AS ref
        |  FROM documents),
        |base AS (
        |  SELECT lang, doc_id, string_split(trim(cand), ' ') AS ct,
        |         string_split(trim(ref), ' ') AS rt
        |  FROM pairs),
        |cpos AS (
        |  SELECT lang, doc_id, n, ct,
        |    unnest(generate_series(1, greatest(len(ct) - n + 1, 0))) AS i
        |  FROM base CROSS JOIN (SELECT unnest([1, 2]) AS n) ns),
        |cg AS (
        |  SELECT lang, doc_id, n, array_to_string(ct[i:i+n-1], chr(0)) AS gram,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM cpos GROUP BY lang, doc_id, n, gram),
        |rpos AS (
        |  SELECT lang, doc_id, n, rt,
        |    unnest(generate_series(1, greatest(len(rt) - n + 1, 0))) AS i
        |  FROM base CROSS JOIN (SELECT unnest([1, 2]) AS n) ns),
        |rg AS (
        |  SELECT lang, doc_id, n, array_to_string(rt[i:i+n-1], chr(0)) AS gram,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM rpos GROUP BY lang, doc_id, n, gram),
        |m AS (
        |  SELECT cg.lang, cg.n,
        |    CAST(SUM(least(cg.c, COALESCE(rg.c, 0))) AS BIGINT) AS m
        |  FROM cg LEFT JOIN rg ON cg.lang = rg.lang AND cg.doc_id = rg.doc_id
        |    AND cg.n = rg.n AND cg.gram = rg.gram
        |  GROUP BY cg.lang, cg.n),
        |mp AS (
        |  SELECT lang,
        |    CAST(COALESCE(SUM(CASE WHEN n = 1 THEN m END), 0) AS BIGINT) AS m1,
        |    CAST(COALESCE(SUM(CASE WHEN n = 2 THEN m END), 0) AS BIGINT) AS m2
        |  FROM m GROUP BY lang),
        |tot AS (
        |  SELECT lang, COUNT(*) AS n_pairs,
        |    CAST(SUM(greatest(len(ct), 0)) AS BIGINT) AS ct1,
        |    CAST(SUM(greatest(len(ct) - 1, 0)) AS BIGINT) AS ct2,
        |    CAST(SUM(greatest(len(rt), 0)) AS BIGINT) AS rt1,
        |    CAST(SUM(greatest(len(rt) - 1, 0)) AS BIGINT) AS rt2
        |  FROM base GROUP BY lang)
        |SELECT t.lang, t.n_pairs,
        |  COALESCE(m1, 0) AS m1, ct1, rt1,
        |  CASE WHEN ct1 > 0 THEN CAST(COALESCE(m1, 0) AS DOUBLE)
        |    / CAST(ct1 AS DOUBLE) ELSE 0.0 END AS rouge1_p,
        |  CASE WHEN rt1 > 0 THEN CAST(COALESCE(m1, 0) AS DOUBLE)
        |    / CAST(rt1 AS DOUBLE) ELSE 0.0 END AS rouge1_r,
        |  CASE WHEN ct1 + rt1 > 0 THEN CAST(2 * COALESCE(m1, 0) AS DOUBLE)
        |    / CAST(ct1 + rt1 AS DOUBLE) ELSE 0.0 END AS rouge1_f,
        |  COALESCE(m2, 0) AS m2, ct2, rt2,
        |  CASE WHEN ct2 > 0 THEN CAST(COALESCE(m2, 0) AS DOUBLE)
        |    / CAST(ct2 AS DOUBLE) ELSE 0.0 END AS rouge2_p,
        |  CASE WHEN rt2 > 0 THEN CAST(COALESCE(m2, 0) AS DOUBLE)
        |    / CAST(rt2 AS DOUBLE) ELSE 0.0 END AS rouge2_r,
        |  CASE WHEN ct2 + rt2 > 0 THEN CAST(2 * COALESCE(m2, 0) AS DOUBLE)
        |    / CAST(ct2 + rt2 AS DOUBLE) ELSE 0.0 END AS rouge2_f
        |FROM tot t LEFT JOIN mp USING (lang)
        |ORDER BY lang""".stripMargin,

    // chrF twin: whitespace stripped, substr char n-grams, the same
    // clipped-match LEFT join; every F_n is the single division
    // (1+β²)m/(β²·rt+ct) over exact integers, fixed-order 6-term sum,
    // micro-rounded — no transcendental functions anywhere
    "q272_chrf_eval" ->
      """WITH pairs AS (
        |  SELECT doc_id, lang,
        |    regexp_replace(trim(regexp_replace(lower(text), '\bthe\b', ' ', 'g')),
        |      '\s+', ' ', 'g') AS cand,
        |    text AS ref
        |  FROM documents),
        |base AS (
        |  SELECT lang, doc_id,
        |    regexp_replace(cand, '\s+', '', 'g') AS cs,
        |    regexp_replace(ref, '\s+', '', 'g') AS rs
        |  FROM pairs),
        |cpos AS (
        |  SELECT lang, doc_id, n, cs,
        |    unnest(generate_series(1, greatest(len(cs) - n + 1, 0))) AS i
        |  FROM base CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n) ns),
        |cg AS (
        |  SELECT lang, doc_id, n, substr(cs, i, n) AS gram,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM cpos GROUP BY lang, doc_id, n, gram),
        |rpos AS (
        |  SELECT lang, doc_id, n, rs,
        |    unnest(generate_series(1, greatest(len(rs) - n + 1, 0))) AS i
        |  FROM base CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n) ns),
        |rg AS (
        |  SELECT lang, doc_id, n, substr(rs, i, n) AS gram,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM rpos GROUP BY lang, doc_id, n, gram),
        |m AS (
        |  SELECT cg.lang, cg.n,
        |    CAST(SUM(least(cg.c, COALESCE(rg.c, 0))) AS BIGINT) AS m
        |  FROM cg LEFT JOIN rg ON cg.lang = rg.lang AND cg.doc_id = rg.doc_id
        |    AND cg.n = rg.n AND cg.gram = rg.gram
        |  GROUP BY cg.lang, cg.n),
        |mp AS (
        |  SELECT lang,
        |    CAST(COALESCE(SUM(CASE WHEN n = 1 THEN m END), 0) AS BIGINT) AS m1,
        |    CAST(COALESCE(SUM(CASE WHEN n = 2 THEN m END), 0) AS BIGINT) AS m2,
        |    CAST(COALESCE(SUM(CASE WHEN n = 3 THEN m END), 0) AS BIGINT) AS m3,
        |    CAST(COALESCE(SUM(CASE WHEN n = 4 THEN m END), 0) AS BIGINT) AS m4,
        |    CAST(COALESCE(SUM(CASE WHEN n = 5 THEN m END), 0) AS BIGINT) AS m5,
        |    CAST(COALESCE(SUM(CASE WHEN n = 6 THEN m END), 0) AS BIGINT) AS m6
        |  FROM m GROUP BY lang),
        |tot AS (
        |  SELECT lang, COUNT(*) AS n_pairs,
        |    CAST(SUM(len(cs)) AS BIGINT) AS cand_chars,
        |    CAST(SUM(len(rs)) AS BIGINT) AS ref_chars,
        |    CAST(SUM(greatest(len(cs), 0)) AS BIGINT) AS ct1,
        |    CAST(SUM(greatest(len(cs) - 1, 0)) AS BIGINT) AS ct2,
        |    CAST(SUM(greatest(len(cs) - 2, 0)) AS BIGINT) AS ct3,
        |    CAST(SUM(greatest(len(cs) - 3, 0)) AS BIGINT) AS ct4,
        |    CAST(SUM(greatest(len(cs) - 4, 0)) AS BIGINT) AS ct5,
        |    CAST(SUM(greatest(len(cs) - 5, 0)) AS BIGINT) AS ct6,
        |    CAST(SUM(greatest(len(rs), 0)) AS BIGINT) AS rt1,
        |    CAST(SUM(greatest(len(rs) - 1, 0)) AS BIGINT) AS rt2,
        |    CAST(SUM(greatest(len(rs) - 2, 0)) AS BIGINT) AS rt3,
        |    CAST(SUM(greatest(len(rs) - 3, 0)) AS BIGINT) AS rt4,
        |    CAST(SUM(greatest(len(rs) - 4, 0)) AS BIGINT) AS rt5,
        |    CAST(SUM(greatest(len(rs) - 5, 0)) AS BIGINT) AS rt6
        |  FROM base GROUP BY lang)
        |SELECT t.lang, t.n_pairs, t.cand_chars, t.ref_chars,
        |  COALESCE(m1, 0) AS m1, COALESCE(m2, 0) AS m2,
        |  COALESCE(m3, 0) AS m3, COALESCE(m4, 0) AS m4,
        |  COALESCE(m5, 0) AS m5, COALESCE(m6, 0) AS m6,
        |  CAST(ROUND((
        |      (CASE WHEN 4 * rt1 + ct1 > 0 THEN CAST(5 * COALESCE(m1, 0) AS DOUBLE)
        |            / CAST(4 * rt1 + ct1 AS DOUBLE) ELSE 0.0 END)
        |    + (CASE WHEN 4 * rt2 + ct2 > 0 THEN CAST(5 * COALESCE(m2, 0) AS DOUBLE)
        |            / CAST(4 * rt2 + ct2 AS DOUBLE) ELSE 0.0 END)
        |    + (CASE WHEN 4 * rt3 + ct3 > 0 THEN CAST(5 * COALESCE(m3, 0) AS DOUBLE)
        |            / CAST(4 * rt3 + ct3 AS DOUBLE) ELSE 0.0 END)
        |    + (CASE WHEN 4 * rt4 + ct4 > 0 THEN CAST(5 * COALESCE(m4, 0) AS DOUBLE)
        |            / CAST(4 * rt4 + ct4 AS DOUBLE) ELSE 0.0 END)
        |    + (CASE WHEN 4 * rt5 + ct5 > 0 THEN CAST(5 * COALESCE(m5, 0) AS DOUBLE)
        |            / CAST(4 * rt5 + ct5 AS DOUBLE) ELSE 0.0 END)
        |    + (CASE WHEN 4 * rt6 + ct6 > 0 THEN CAST(5 * COALESCE(m6, 0) AS DOUBLE)
        |            / CAST(4 * rt6 + ct6 AS DOUBLE) ELSE 0.0 END)
        |    ) / CAST(greatest(
        |      (CASE WHEN 4 * rt1 + ct1 > 0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN 4 * rt2 + ct2 > 0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN 4 * rt3 + ct3 > 0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN 4 * rt4 + ct4 > 0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN 4 * rt5 + ct5 > 0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN 4 * rt6 + ct6 > 0 THEN 1 ELSE 0 END), 1) AS DOUBLE)
        |    * 1000000.0) AS BIGINT) AS chrf_micro
        |FROM tot t LEFT JOIN mp USING (lang)
        |ORDER BY lang""".stripMargin
  )

  val oracle: Map[String, String] = oracleHead ++ oracleMore
}
