package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the scale-critical physical-plan properties
  * SCALE.md documents, pinned structurally so a refactor cannot silently
  * reintroduce a scale-killer (the checks run on sf0.001 — shape, not
  * timing). */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = sf0001

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  /** Every executed plan of a query, captured through a
    * QueryExecutionListener — the pin device for operators that
    * materialize mid-pipeline (localCheckpoint/persist hide the
    * interesting subplans from the final query plan). */
  private def capturedPlans(q: String): Seq[String] = {
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      // the listener bus is async: poll until the plan count stabilizes
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        if (plans.size == last) stable += 1 else { stable = 0; last = plans.size }
        Thread.sleep(100)
      }
    } finally spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    plans.asScala.toSeq
  }

  test("q03 star join broadcasts the dimensions (no shuffle of the fact side)") {
    val p = planOf("q03_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q12 global top-k plans TakeOrderedAndProject, not a global sort") {
    val p = planOf("q12_topk_global")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q01 aggregate is partial+final hash aggregation") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    // partial + final = at least two HashAggregate nodes
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2, p)
  }

  test("q44 embedding near-dup never plans a broadcast nested loop") {
    val p = planOf("q44_dedup_embedding_cosine")
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("q24 capped jaccard has no shingle self-join (bounded in-array pairs)") {
    val p = planOf("q24_dedup_ngram_jaccard")
    assert(p.contains("array_pairs"), p)
    assert(p.contains("collect_list"), p)
  }

  test("q25 minhash signatures are a projection, not 128 aggregates") {
    // the expansion guard (r9) materializes the rep pairs mid-pipeline,
    // so the signature stage only shows in the captured per-job plans
    val all = capturedPlans("q25_dedup_minhash_lsh").mkString("\n===\n")
    assert(all.contains("minhash_bands"), all)
    assert(!all.contains("h127"), all) // the old 128-min-agg columns are gone
  }

  test("q26 simhash computes signatures once, upstream of the pair stage") {
    val df = SparkEntry.queries("q26_dedup_simhash")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // since the r8 exact-dup collapse, the one-pass simhash64 projection
    // is materialized (localCheckpoint) BEFORE chunk joins + expansion:
    // the pair stage scans the signature RDD and must contain neither a
    // signature recompute nor a word explode
    assert(!p.contains("simhash64"), p)
    assert(!p.contains("Generate"), p)
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"), p)
  }

  test("q02 filter and projection push into the scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull") || p.contains("PushedFilters: ["), p)
  }

  test("q47 split assignment is a pure projection (no shuffle before the aggregate)") {
    val p = planOf("q47_train_split")
    assert(p.contains("md5_lower64"), p)
    // exactly the aggregation exchanges — no join/window exchanges
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("q113 bigrams come from lead() over the per-doc window, not a token self-join") {
    val p = planOf("q113_ngram_lm")
    // adjacent-token pairing must reuse the __id window partitioning:
    // a lead() Window node, and NO join keyed on a derived row-number
    // (the r7 shape shuffled the full token stream twice)
    assert(p.contains("lead("), p)
    assert(!p.contains("__i#"), p)
  }

  test("q57 PII scrub is a pure per-row projection (only the output-sort exchange)") {
    val p = planOf("q57_pii_scrub")
    // the single Exchange is the deterministic ORDER BY every oracle
    // query carries; the scrub itself must not shuffle or join
    assert(p.sliding("Exchange".length).count(_ == "Exchange") === 1, p)
    assert(p.contains("rangepartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q58 decontamination broadcasts the eval shingles, shuffles train once") {
    val p = planOf("q58_decontaminate")
    // the semi-join against the eval set must be broadcast — the corpus
    // side is shuffled only by the distinct on contaminated doc ids
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q61 pipeline composes without a cartesian product, eval set broadcast") {
    val p = planOf("q61_corpus_pipeline")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q62 chunking is a pure explode projection (only the output-sort exchange)") {
    val p = planOf("q62_chunk_docs")
    assert(p.contains("Generate"), p) // the explode
    assert(p.sliding("Exchange".length).count(_ == "Exchange") === 1, p)
    assert(p.contains("rangepartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q63 vocabulary top-k plans TakeOrderedAndProject, never a global sort") {
    val p = planOf("q63_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    // partial+final count agg on the token
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2, p)
  }

  test("q69 tf-idf rides N as a broadcast one-row aggregate, no driver count") {
    val p = planOf("q69_tfidf")
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q73 salted cap plans two windows (per-salt partial then final)") {
    val p = planOf("q73_source_cap_salted")
    assert(p.sliding("row_number()".length).count(_ == "row_number()") >= 2, p)
    assert(p.contains("__salt"), p)
  }

  test("q78 fuzzy match joins on the block keys, never a cartesian") {
    val p = planOf("q78_fuzzy_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("levenshtein"), p) // distance is a post-join filter
  }

  test("gdal_read_fgb_bbox pushes the box into the scan via the optimizer rule") {
    val df = SparkEntry.queries("gdal_read_fgb_bbox")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("bbox=[-77.05"), p)
  }

  test("q59 sequence packing windows per source shard, not globally") {
    val df = SparkEntry.queries("q59_pack_sequences")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // a partitioned window = hashpartitioning on source, never a single
    // global sort partition
    assert(p.contains("hashpartitioning(source"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("q79 rolling window partitions by customer (no global sort frame)") {
    val p = planOf("q79_rolling_window")
    assert(p.contains("hashpartitioning(o_custkey"), p)
    // the RANGE frame rides one Window node over one shuffle; the only
    // rangepartitioning allowed is the final output ORDER BY
    assert(p.contains("specifiedwindowframe(RangeFrame"), p)
  }

  test("q88 tolerance as-of is one union+window shuffle, never a join per row") {
    val p = planOf("q88_asof_tolerance")
    assert(p.contains("Union"), p)
    assert(p.contains("hashpartitioning(__k"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q85 z-score joins the tiny per-type stats via broadcast") {
    val p = planOf("q85_zscore_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q81 zorder clusters with a single range exchange (plus output sort)") {
    val p = planOf("q81_zorder")
    // the morton key is pure integer projection — no shuffle beyond the
    // repartitionByRange and the final ORDER BY
    assert(p.contains("rangepartitioning(__z"), p)
    assert(!p.contains("hashpartitioning"), p)
  }

  test("q95 kmeans assignment is a codegen projection, never a centroid join") {
    val p = planOf("q95_kmeans")
    // centroids ride as reference objects inside kmeans_assign — a join
    // (or worse, a cartesian against a centroid table) would shuffle the
    // full corpus once per iteration at 100 TB
    assert(p.contains("kmeans_assign"), p)
    assert(!p.contains("Join"), p)
  }

  test("q96 semantic dedup joins on the cluster id only (quadratic stays in-cluster)") {
    val p = planOf("q96_semantic_dedup")
    assert(p.contains("kmeans_assign"), p)
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q97 bloom probe is a literal filter - no join carries the bloom") {
    val p = planOf("q97_bloom_decontaminate")
    assert(p.contains("might_contain"), p)
    // the exact-flag leg (q58) keeps its broadcast semi-join; the bloom
    // leg itself must not add a bloom-carrying join, so the only joins
    // are the exact leg's semi + the final flag joins
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q96 salted semantic dedup broadcasts the k-row sizes, pairs on (cid, salt)") {
    val p = planOf("q96_semantic_dedup")
    // cluster sizes are a k-row table: must ride a broadcast join, never
    // shuffle the corpus against them
    assert(p.contains("BroadcastHashJoin"), p)
    // the pair join keys include the salt, so a hot cluster's quadratic
    // is bounded by the split groups
    assert(p.contains("__salt"), p)
  }

  test("q107 gopher repetition windows per doc, never globally") {
    val p = planOf("q107_gopher_repetition")
    // every window/agg partitions on the doc id — a global window here
    // would serialize the corpus through one task
    assert(p.contains("hashpartitioning(__id"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q112 merge-upsert is one keyed full-outer join, nothing nested-loop") {
    val p = planOf("q112_merge_upsert")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q113 ngram LM joins by gram keys, vocab rides as a 1-row broadcast") {
    val p = planOf("q113_ngram_lm")
    // the only nested-loop/cartesian allowed is the 1-row vocab gate join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q114 source overlap self-joins on the shingle key, never a cartesian") {
    val p = planOf("q114_source_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q119 event-path top-20 plans TakeOrderedAndProject, never a global sort") {
    val p = planOf("q119_event_paths")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q117 trend slope is one partial+final integer aggregate") {
    val p = planOf("q117_trend_slope")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q115 DSIR rides the bucket models as broadcasts, never a cartesian") {
    val p = planOf("q115_dsir_weight")
    // the <=1024-row count table and 1-row totals broadcast onto the
    // gram stream; no shuffle join against a vocabulary-sized table
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q139 bloom probe is a literal fact-side filter, not a bloom-carrying join") {
    val p = planOf("q139_bloom_join")
    // rows that cannot match die in a literal might_contain filter on
    // the fact scan (below its shuffle by construction — the filter is
    // applied before the join), so ~90% of the fact table never moves
    assert(p.contains("might_contain"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q141 random projection collapses sign terms in partial+final aggs") {
    val p = planOf("q141_random_projection")
    // the outDim fan-out must meet a map-side partial aggregate on
    // (id, j) — never shuffle the exploded element stream raw — and the
    // 16-row j table rides a broadcast
    assert(p.contains("HashAggregate"), p)
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2, p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q145 ewma windows per key, never globally") {
    val p = planOf("q145_ewma")
    assert(p.contains("hashpartitioning(user_id"), p)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q146 quantile normalize has no one-partition window") {
    val p = planOf("q146_quantile_normalize")
    // every window must carry a partition column: the group windows
    // partition on event_type, globalRank's rank window on its range-
    // partition id (__pid) — a bare ORDER BY window would print a
    // windowspecdefinition starting with the order column instead.
    // (The 1-row N aggregate legitimately passes through SinglePartition.)
    assert(p.contains("hashpartitioning(event_type"), p)
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      val head = p.substring(i, math.min(p.length, i + 60))
      head.contains("event_type") || head.contains("__pid")
    }, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q149 acf windows and aggregates per key, never a stream self-join") {
    val p = planOf("q149_acf")
    // lead() columns ride ONE key-partitioned window; moments are keyed
    // partial+final aggregates — the token-stream is never self-joined
    assert(p.contains("hashpartitioning(__k"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("SortMergeJoin"), p) // the #keys-row moment join broadcasts
  }

  test("q150 cusum broadcasts the per-key moments onto one keyed window sort") {
    val p = planOf("q150_cusum")
    assert(p.contains("hashpartitioning(__k"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q155 assoc rules pair-gen is a keyed equi-join, never a cartesian") {
    val p = planOf("q155_assoc_rules")
    assert(!p.contains("CartesianProduct"), p)
    // basket self-join must be an equi-join on the basket key
    assert(p.contains("__bk"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q160 auc ranks via globalRank's partitioned window, never one-partition") {
    val p = planOf("q160_auc")
    // every window partitions on globalRank's range-partition id — a bare
    // ORDER BY window would open with the order column instead
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      p.substring(i, math.min(p.length, i + 60)).contains("__pid")
    }, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q161 mutual info rides N as a broadcast 1-row aggregate") {
    val p = planOf("q161_mutual_info")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    // contingency + marginals are partial+final hash aggregates
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 4, p)
  }

  test("q162 calibration broadcasts min/max and aggregates bins partial+final") {
    val p = planOf("q162_calibration")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q163 ndcg shares one group exchange across both rank windows") {
    val p = planOf("q163_ndcg")
    // both row_number windows partition on lang → EnsureRequirements
    // plans ONE hash exchange plus two in-partition sorts
    assert("Exchange hashpartitioning\\(lang".r.findAllMatchIn(p).size === 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("SinglePartition"), p)
  }

  test("q164 confusion is one contingency aggregate then class-sized joins") {
    val p = planOf("q164_confusion")
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q166 regression metrics broadcast the group means, one final agg") {
    val p = planOf("q166_regression_metrics")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q167 average precision rides one group exchange like q163") {
    val p = planOf("q167_avg_precision")
    assert("Exchange hashpartitioning\\(lang".r.findAllMatchIn(p).size === 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("SinglePartition"), p)
  }

  test("q168 profile avoids the multi-distinct Expand (melt + plain aggs)") {
    val p = planOf("q168_profile")
    // distincts ride the narrow melt, NOT Spark's Expand-based
    // multi-distinct rewrite (measured ~6x slower for this shape)
    assert(!p.contains("Expand"), p)
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q169 constraint audit anti-joins the fk rule, never a cartesian") {
    val p = planOf("q169_constraint_audit")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q171 sorted-neighborhood pair-gen is an integer equi join") {
    val p = planOf("q171_sorted_neighborhood")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // ranking windows all partition on globalRank's __pid
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      p.substring(i, math.min(p.length, i + 60)).contains("__pid")
    }, p)
  }

  test("q210 spearman ranks ride partitioned windows, never a global sort window") {
    // globalCumSum materializes mid-plan: capture every executed plan
    val plans = capturedPlans("q210_spearman")
    val all = plans.mkString("\n===\n")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q209 ccnet terciles never plan ntile or an unpartitioned window") {
    val plans = capturedPlans("q209_ccnet_buckets")
    val all = plans.mkString("\n===\n")
    assert(!all.contains("ntile("), all)
    // windows are the per-doc bigram lead() (__id) and globalRank's
    // per-partition row_number (__pid) — never partitioned by lang
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      val w = all.substring(i, math.min(all.length, i + 60))
      w.contains("__pid") || w.contains("__id")
    }, all)
  }

  test("q172 equi-depth histogram never plans a one-partition window") {
    val p = planOf("q172_equidepth_histogram")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      p.substring(i, math.min(p.length, i + 60)).contains("__pid")
    }, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q177 weighted percentiles prefix-sum via partitioned windows only") {
    val p = planOf("q177_weighted_percentiles")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      p.substring(i, math.min(p.length, i + 60)).contains("__pid")
    }, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q176 bootstrap fan-out collapses in a partial+final keyed aggregate") {
    val p = planOf("q176_bootstrap_ci")
    // the B-way explode must meet a partial aggregate BEFORE any
    // exchange — the shuffle carries B*partitions rows, not B*N
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q174 rolling slope rides one customer-keyed window sort") {
    val p = planOf("q174_rolling_slope")
    assert(p.contains("hashpartitioning(o_custkey"), p)
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      p.substring(i, math.min(p.length, i + 60)).contains("o_custkey")
    }, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q175 anova is one partial+final keyed aggregate") {
    val p = planOf("q175_anova")
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("Join"), p)
  }

  test("q173 link prediction plans top-k, equi joins, no cartesian") {
    // linkPrediction materializes its working set and checkpoints the
    // topK-row result (r9), so pin across the captured per-job plans
    val plans = capturedPlans("q173_link_prediction")
    val all = plans.mkString("\n===\n")
    assert(plans.exists(_.contains("TakeOrderedAndProject")), all)
    assert(!all.contains("CartesianProduct") && !all.contains("BroadcastNestedLoop"),
      all)
    // r14 width fix: the wedge explode must sit ABOVE an explicit
    // numbered repartition of the hub lists (REPARTITION_BY_NUM) — the
    // hub-list aggregate's compact output otherwise gets AQE-coalesced
    // to a handful of partitions and the data-proportional explode +
    // (x,y) aggregation run nearly serially (measured 4 partitions for
    // 17.2M wedge rows at sf0.1, 8v32-core scaling ratio 1.02).
    val wedgePlan = plans.find(p =>
      p.contains("array_pairs") && p.contains("TakeOrderedAndProject"))
    assert(wedgePlan.exists(_.contains("REPARTITION_BY_NUM")), all)
  }

  test("q170 benford is a digit-keyed aggregate with a broadcast total") {
    val p = planOf("q170_benford")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q185 skyline never plans a cartesian or nested-loop dominance join") {
    val p = planOf("q185_skyline")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("q187 prefix-filter join pairs candidates by token equality, never all-pairs") {
    val p = planOf("q187_prefix_filter_join")
    assert(!p.contains("CartesianProduct"), p)
    // r9: the ONLY nested-loop joins allowed are the pair-budget
    // guard's one-row broadcast aggregates (candidate guard + the
    // within-group guard); the data-sized candidate join itself stays a
    // token-equality join
    assert(p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") <= 2, p)
  }

  test("q198 interval overlap joins on (key, bucket), not a nested-loop theta join") {
    val p = planOf("q198_interval_overlap_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("q196 matryoshka audit is explode + keyed agg, no joins at all") {
    val p = planOf("q196_matryoshka_audit")
    assert(!p.contains("Join"), p)
  }

  test("q194 cms join estimate never joins the raw inputs (sketch-sized joins only)") {
    val p = planOf("q194_cms_join_estimate")
    // no sort-merge join anywhere: the sketch product and rows-frame
    // joins are broadcast-sized, and the only key-shuffle is the exact
    // gate's aggregate
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q204 five-table rollup broadcasts every dimension chain") {
    val p = planOf("q204_five_table_join")
    assert(p.contains("BroadcastHashJoin"), p)
    // the only shuffle join allowed is lineitem-orders (both fact-sized);
    // dims must never sort-merge
    assert(p.sliding("SortMergeJoin".length).count(_ == "SortMergeJoin") <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q214 mann-whitney never ranks or re-joins the raw rows") {
    // every statistic comes from the distinct-value table: the only
    // windows are globalCumSum's per-partition running sums (__pid),
    // and no join back to the fact rows exists at all
    val plans = capturedPlans("q214_mann_whitney")
    val all = plans.mkString("\n===\n")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
    assert(!all.contains("SortMergeJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q216 padding audit ranks via partition-offset windows only") {
    // three strategies = three globalRank passes; every window is the
    // per-partition row_number (__pid), never an unpartitioned sort
    val plans = capturedPlans("q216_padding_waste")
    val all = plans.mkString("\n===\n")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
  }

  test("q218 modularity joins labels by key, nothing quadratic") {
    // the summary assembly and the label joins all live in the FINAL
    // query plan (the localCheckpoints only hide the edge/label
    // builds), so planOf sees them exactly once — capturedPlans would
    // double-count BNLJs through AQE's initial+final plan printing
    val p = planOf("q218_modularity")
    assert(!p.contains("CartesianProduct"), p)
    // BroadcastNestedLoopJoin may only carry the 1-row summary
    // assembly (crossJoin(broadcast(nn/m/within)) = 3 occurrences);
    // a label equi-join regressing to BNLJ adds a fourth
    val bnlj = "BroadcastNestedLoopJoin".r.findAllMatchIn(p).size
    assert(bnlj <= 3, s"$bnlj BNLJs (expected <= 3: 1-row assembly only)\n$p")
    // the label joins themselves must be key-equi (hash or sort-merge)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("q220 best split aggregates the argmax, never LIMIT over a sort") {
    val plans = capturedPlans("q220_best_split")
    val all = plans.mkString("\n===\n")
    // the winner comes from min_by in an Aggregate, not TakeOrdered
    assert(!all.contains("TakeOrderedAndProject"), all)
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
  }

  test("q147 kcore rounds never re-shuffle the cached adjacency") {
    // The r9 incremental-degree kCore materializes per round, so the
    // final query plan can't show the loop — capture every executed
    // plan through a QueryExecutionListener instead and pin the scale
    // property directly: the edge-sized exchange keyed on the adjacency
    // probe column (nbr) happens exactly ONCE (the setup repartition);
    // every peel round probes the cached adjacency without re-shuffling
    // it (the removed set is the broadcast side).
    val all = capturedPlans("q147_kcore")
    assert(all.nonEmpty)
    val text = all.mkString("\n===PLAN===\n")
    // A re-shuffle of the adjacency could only feed a shuffle-requiring
    // join keyed on the probe column — neither form may appear in any
    // executed plan (the removed set is always the broadcast side).
    assert(!text.contains("SortMergeJoin [nbr"), text)
    assert(!text.contains("ShuffledHashJoin [nbr"), text)
    // the rounds really do probe the cache...
    assert(text.contains("InMemoryTableScan") || text.contains("TableCacheQueryStage"),
      text)
    // ...and the cached working set (adjacency + degree tables) is
    // unpersisted on exit — only the node-sized localCheckpoint of the
    // RESULT may remain pinned
    val leftover = spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.toString.contains("localCheckpoint"))
    assert(leftover.isEmpty, leftover.mkString(", "))
  }

  test("q240/q241 embedding argmaxes reduce map-side — no rank window, no SMJ") {
    // the |train|×|eval| pair stream reduces through keyed min_by
    // aggregates: a rank window here would shuffle every scored pair
    for (q <- Seq("q240_semantic_decontamination", "q241_reciprocal_nn")) {
      val p = planOf(q)
      assert(!p.contains("windowspecdefinition"), s"$q: $p")
      assert(!p.contains("SortMergeJoin"), s"$q: $p")
    }
  }

  test("q242 feature hashing reads the shared artifact with no re-" +
    "featurization (r13: was projection + keyed aggregate per query)") {
    val p = planOf("q242_feature_hashing")
    assert(!p.contains("Join"), p)
    assert(!p.contains("windowspecdefinition"), p)
    // the featurize pass (explode + two md5s + keyed sum) now lives in
    // the once-per-session bucketed artifact — the query plan is just
    // the artifact scan plus the output-order range exchange
    assert(p.contains("graft_art_"), p)
    assert(!p.contains("md5"), p)
    assert("hashpartitioning".r.findAllMatchIn(
      p.replaceAll("AQEShuffleRead.*", "")).isEmpty, p)
  }

  test("q243 sprt walk windows are partition-offset only (never one global sort)") {
    val plans = capturedPlans("q243_sprt")
    val all = plans.mkString("\n===\n")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
  }

  test("q246 disorder windows are per-key or partition-offset, never global") {
    val plans = capturedPlans("q246_disorder_audit")
    val all = plans.mkString("\n===\n")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      val ctx = all.substring(i, math.min(all.length, i + 60))
      ctx.contains("__k") || ctx.contains("__pid")
    }, all)
  }

  test("q248 warc write+parse joins nothing and windows nothing") {
    val p = planOf("q248_warc_roundtrip")
    assert(!p.contains("Join"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("q263 URL canonicalization is a pure projection (only the output-sort exchange)") {
    val p = planOf("q263_url_normalize")
    assert(!p.contains("Join"), p)
    assert(!p.contains("windowspecdefinition"), p)
    // exactly one exchange: the rangepartitioning for the ordered output
    val ex = "Exchange ".r.findAllMatchIn(p).size
    assert(ex <= 1 && p.contains("rangepartitioning"), p)
  }

  test("q267 PIT join is one key-equi-join with the interval test residual") {
    val p = planOf("q267_pit_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the interval bounds ride as a join condition on the key-equi join,
    // never as a post-join filter over a wider product
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q261 VSM cosine rides broadcast one-row stats, no driver count") {
    val p = planOf("q261_vsm_cosine")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p) // the 1-row stats / nDf
  }

  test("q275 pass@k broadcasts the k grid and keeps the log-sum in codegen") {
    val p = planOf("q275_pass_at_k")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p) // the 3-row k grid
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("q277 Fréchet stats are ONE conditional aggregate over the explode") {
    val p = planOf("q277_frechet_embed")
    // both sides' per-dim sums come from a single grouped aggregate —
    // never one scan per side; the side counts ride as a 1-row broadcast
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    val gens = "Generate posexplode".r.findAllMatchIn(p).size
    assert(gens == 1, s"expected one posexplode, got $gens:\n$p")
  }

  test("q281 coverage ranks types via the two-phase order statistic, no global window") {
    val plans = capturedPlans("q281_vocab_coverage")
    val all = plans.mkString("\n===\n")
    // every window is partitioned by the range-partition id (__pid),
    // never a one-partition global ROW_NUMBER over the type table
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
  }

  test("q276 EL2N scoring pass broadcasts the weight vector") {
    val plans = capturedPlans("q276_el2n_prune")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q285 Kneser-Ney joins gram count tables, codegen only, no cartesian") {
    val p = planOf("q285_kneser_ney")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
    assert(p.contains("BroadcastExchange"), p) // the 1-row bigram total
  }

  test("q286 TracIn keeps both dot products broadcast-side, no cartesian") {
    val plans = capturedPlans("q286_tracin_influence")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin"), all) // probe trace + features
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q287 MMD is one posexplode + a broadcast weight grid") {
    val p = planOf("q287_mmd_drift")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p) // the D×d grid + 1-row nn
    val gens = "Generate posexplode".r.findAllMatchIn(p).size
    assert(gens == 1, s"expected one posexplode, got $gens:\n$p")
  }

  test("q288 Wasserstein CDFs use the two-phase cumsum, no global window") {
    val plans = capturedPlans("q288_wasserstein_shift")
    val all = plans.mkString("\n===\n")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q289 covariate-shift scoring broadcasts the weight vector") {
    val plans = capturedPlans("q289_covariate_shift")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q290 Shapley coverage is keyed aggregates, no cartesian, no UDF") {
    val p = planOf("q290_shapley_coverage")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q291 greedy coverage broadcasts picks and covered-set lookups") {
    val plans = capturedPlans("q291_greedy_coverage")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin") || all.contains("BroadcastNestedLoopJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q293 Mahalanobis is two explode passes (stats, score) + a broadcast stats join") {
    val p = planOf("q293_mahalanobis_outliers")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p)
    // one pass computes the per-dim moments, one scores — exactly two,
    // never a per-dim or per-vector re-scan
    val gens = "Generate posexplode".r.findAllMatchIn(p).size
    assert(gens == 2, s"expected two posexplodes, got $gens:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p) // top-20, never a global sort
  }

  test("q295 changepoint prefix stats use the two-phase cumsum, day-level only") {
    val plans = capturedPlans("q295_changepoint")
    val all = plans.mkString("\n===\n")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
    assert(all.contains("TakeOrderedAndProject"), all) // the argmax
  }

  test("q296 transfer matrix fans out via the broadcast hub table, gram-keyed count joins") {
    val plans = capturedPlans("q296_domain_transfer")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastNestedLoopJoin") || all.contains("BroadcastHashJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
    assert(!all.contains("BatchEvalPython") && !all.contains("ScalaUDF"), all)
  }

  test("q299 silhouette broadcasts the centroid cells, no cartesian, no UDF") {
    val p = planOf("q299_silhouette")
    assert(p.contains("BroadcastExchange"), p) // k×d centroid cells
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("q300 DP release is one keyed aggregate + a projection") {
    val p = planOf("q300_dp_release")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
  }

  test("q301 Sinkhorn iterates broadcast the support-sized tables only") {
    val plans = capturedPlans("q301_sinkhorn_ot")
    val all = plans.mkString("\n===\n")
    // every join in the scaling loop is against a broadcast 10-row
    // iterate or the 100-cell grid; the corpus appears only in the
    // bucketing aggregates
    assert(all.contains("BroadcastHashJoin") || all.contains("BroadcastNestedLoopJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
    assert(!all.contains("SortMergeJoin"), all) // nothing corpus-sized is joined
  }

  test("q302 log-rank ordered work is __pid-partitioned (duration table only)") {
    val plans = capturedPlans("q302_logrank")
    val all = plans.mkString("\n===\n")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q303 speculative acceptance joins gram tables, no cartesian/UDF") {
    val p = planOf("q303_spec_decode_accept")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q305 MASE is a day-table self-join, nothing event-sized joins") {
    val p = planOf("q305_mase_backtest")
    assert(!p.contains("CartesianProduct"), p)
    // the day table is tiny: the self-join must be broadcast, and the
    // only shuffles are the daily aggregate's
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q307 AIPW is one rank cut + one stratum aggregate (q250's shape)") {
    val plans = capturedPlans("q307_aipw_ate")
    val all = plans.mkString("\n===\n")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q308 RHO-loss broadcasts both weight vectors in scoring") {
    val plans = capturedPlans("q308_rho_loss")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q310 scaling-law fit: probes broadcast weights, fit is 1-row math") {
    val plans = capturedPlans("q310_scaling_law")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
    assert(!all.contains("BatchEvalPython") && !all.contains("ScalaUDF"), all)
  }

  test("q312 gradient-noise moments are keyed aggregates, weights broadcast") {
    val plans = capturedPlans("q312_gradient_noise")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
    assert(!all.contains("BatchEvalPython") && !all.contains("ScalaUDF"), all)
  }

  test("q313 temperature grid fans out via broadcast, argmin is a limit") {
    val plans = capturedPlans("q313_temperature_scaling")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin") ||
      all.contains("BroadcastNestedLoopJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q315 DeLong placements are __pid-windowed over distinct values only") {
    val plans = capturedPlans("q315_auc_delong")
    val all = plans.mkString("\n===\n")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q316 LSH audit carries both pair-budget guards (raise_error in plan)") {
    val plans = capturedPlans("q316_lsh_quality_audit")
    val all = plans.mkString("\n===\n")
    assert(all.contains("raise_error") || all.contains("raiseerror"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q317 DoReMi scoring is gram-keyed LEFT joins, no cartesian/UDF") {
    val p = planOf("q317_doremi_weights")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("q318 BBSE scoring is broadcast weight joins, no cartesian/UDF") {
    val plans = capturedPlans("q318_label_shift_bbse")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
    assert(!all.contains("BatchEvalPython") && !all.contains("ScalaUDF"), all)
  }

  test("q319 risk-coverage ranks via __pid windows, never a global sort window") {
    val plans = capturedPlans("q319_risk_coverage")
    val all = plans.mkString("\n===\n")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q320 Mann-Kendall pair scan joins the day table only (broadcast)") {
    val p = planOf("q320_mann_kendall")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q321 hubness broadcasts the query sample; windows key on qid") {
    val p = planOf("q321_hubness_audit")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // q27's =!= join shape
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      p.substring(i, math.min(p.length, i + 60)).contains("qid")
    }, p)
  }

  test("q323 fightin-words ranks top-20 via TakeOrdered on the quantized z") {
    val p = planOf("q323_fightin_words")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q324 quantization audit is two linear passes with max broadcasts") {
    val p = planOf("q324_quant_strategy_audit")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q325 Shapley attribution: corpus work is ONE user aggregate, " +
    "the game table is broadcast") {
    val plans = capturedPlans("q325_shapley_attribution")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin") ||
      all.contains("BroadcastNestedLoopJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q326 burstiness ranks via TakeOrdered, one token aggregate") {
    val p = planOf("q326_burstiness")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q327 positivity audit is q250's rank-cut shape, __pid windows only") {
    val plans = capturedPlans("q327_positivity_audit")
    val all = plans.mkString("\n===\n")
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(all).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      all.substring(i, math.min(all.length, i + 60)).contains("__pid")
    }, all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q328 q-error audit never executes the joins it estimates " +
    "(count-table algebra only)") {
    val p = planOf("q328_cardest_qerror")
    assert(!p.contains("CartesianProduct"), p)
    // actuals join COUNT TABLES (key-distinct), never the fact rows:
    // every join input is an aggregate
    assert(p.contains("HashAggregate"), p)
  }

  test("q321 hubness query sample is modulus-derived (scale-proof count)") {
    // the sample filter must take its modulus from the derived __k
    // column (a broadcast 1-row aggregate), not a literal fraction
    val all = capturedPlans("q321_hubness_audit").mkString("\n===\n")
    assert(all.contains("__k"), all)
    assert(!all.contains("(vec_id#") || !all.contains("% 10) = 0"), all)
  }

  test("q311 k-center rounds broadcast the d-row center, argmax is TakeOrdered") {
    val plans = capturedPlans("q311_kcenter_coreset")
    val all = plans.mkString("\n===\n")
    assert(all.contains("TakeOrderedAndProject"), all)
    assert(all.contains("BroadcastHashJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q330 assortativity: degree joins are equi, moments partial-aggregate") {
    val plans = capturedPlans("q330_assortativity")
    val all = plans.mkString("\n===\n")
    assert(all.contains("HashAggregate"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q337 rich club pays the edge scan once (conditional-sum pivot)") {
    val plans = capturedPlans("q337_rich_club")
    val all = plans.mkString("\n===\n")
    // the 4 cutoffs ride one aggregate over the degree-joined edges,
    // the 1-row club tables broadcast back
    assert(!all.contains("CartesianProduct"), all)
    assert(all.contains("BroadcastNestedLoopJoin") ||
      all.contains("BroadcastHashJoin"), all)
  }

  test("q331 KNN-Shapley broadcasts the probe set; windows key on qid") {
    val p = planOf("q331_knn_shapley")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // ~10-row probe cross
    assert(p.contains("vec_dot"), p)                 // codegen'd cosine
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      p.substring(i, math.min(p.length, i + 60)).contains("qid")
    }, p)
  }

  test("q331 probe set is modulus-derived (scale-proof count)") {
    val p = planOf("q331_knn_shapley")
    assert(p.contains("md#") || p.contains("n_all"), p)
    assert(!p.contains("% 100) = 0"), p) // never a literal fraction
  }

  test("q332 CMH is one stratum aggregate, no per-row UDF") {
    val p = planOf("q332_cmh")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p)
  }

  test("q333 winnowing joins fingerprint-blocked, windows key on doc_id") {
    val p = planOf("q333_winnowing")
    assert(p.contains("md5_lower64"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p) // pair join is equi on mh
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      p.substring(i, math.min(p.length, i + 60)).contains("doc_id")
    }, p)
  }

  test("q334 Krippendorff is two keyed aggregates + broadcast tails") {
    val p = planOf("q334_krippendorff")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("ScalaUDF"), p)
  }

  test("q335 DR-OPE cell tables broadcast back to the eval cells") {
    val plans = capturedPlans("q335_dr_ope")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin"), all)
    assert(!all.contains("CartesianProduct") && !all.contains("ScalaUDF"), all)
  }

  test("q336 Hill top-1001 cut is TakeOrderedAndProject, never a global sort") {
    val p = planOf("q336_hill_tail")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q339 PSM matches bucket-blocked (equi join on cb), value-keyed windows") {
    val p = planOf("q339_psm_att")
    // the only BNLJ allowed is the 1-row summary cross; the candidate
    // join itself must be a cb-keyed equi join
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("cb"), p)
    // r13 rewrite: the rank window keys on the distinct propensity
    // value (work ∝ distinct cells) — the old per-treated (t_uid)
    // window was quadratic in users at fixed bucket width
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(_.start).toSeq
    assert(specs.nonEmpty && specs.forall { i =>
      p.substring(i, math.min(p.length, i + 60)).contains("pt")
    }, p)
  }

  test("q340 Kendall pair scan joins the day table only") {
    val p = planOf("q340_kendall_tau")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q341 Welch is ONE aggregate over the scan (no join, no window)") {
    val p = planOf("q341_welch_ttest")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("q342 power/MDE is ONE aggregate over the scan") {
    val p = planOf("q342_power_mde")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("q343 B-cubed rides cell-count aggregates past the q54 components") {
    val plans = capturedPlans("q343_bcubed")
    val all = plans.mkString("\n===\n")
    assert(all.contains("HashAggregate"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q344 V-measure is cell aggregates + 1-row combines, no cartesian") {
    val plans = capturedPlans("q344_vmeasure")
    val all = plans.mkString("\n===\n")
    assert(all.contains("HashAggregate"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q345 closeness relaxation is keyed joins + min-aggregates") {
    val plans = capturedPlans("q345_closeness")
    val all = plans.mkString("\n===\n")
    // per-hop frontier⋈adjacency must be an equi join (hash or sort-merge),
    // never a nested loop over the edge table
    assert(!all.contains("CartesianProduct"), all)
    assert(all.contains("HashAggregate"), all)
    // the seed count rides as a broadcast 1-row aggregate, not a collect
    assert(all.contains("BroadcastNestedLoopJoin") ||
      all.contains("BroadcastHashJoin"), all)
  }

  test("q346 NMF: H-side joins broadcast the topic×vocab factor") {
    val plans = capturedPlans("q346_nmf_topics")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q347 periodogram folds via hash aggregate; totals broadcast") {
    val p = planOf("q347_periodogram")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q348 Hurst windows are keyed by (m, block), day agg is hashed") {
    val plans = capturedPlans("q348_hurst")
    val all = plans.mkString("\n===\n")
    assert(all.contains("HashAggregate"), all)
    // the per-block cumulative windows must partition on m, b — a
    // partitionless Window over the raw series would serialize
    assert(all.contains("partitionBy") || all.contains("PartitionBy") ||
      all.contains("windowspecdefinition(m#"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q350 Granger is one moment aggregate per direction, no windows") {
    val plans = capturedPlans("q350_granger")
    val all = plans.mkString("\n===\n")
    assert(all.contains("HashAggregate"), all)
    assert(!all.contains("Window"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q349 McNemar is a single pass: one aggregate over the scan") {
    val p = planOf("q349_mcnemar")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Exchange hashpartitioning"), p) // global agg only
  }

  test("q351 whitening broadcasts the d-row stats back to the scan") {
    val plans = capturedPlans("q351_whitening")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastHashJoin"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q352 robustness probes are equi-join relaxations, no closure") {
    val plans = capturedPlans("q352_hub_robustness")
    val all = plans.mkString("\n===\n")
    assert(all.contains("HashAggregate"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q353 placebo/E-value is one conditional aggregate, no windows") {
    val p = planOf("q353_placebo_evalue")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("q354 TextTiling windows and joins are doc-keyed (no global sort)") {
    val plans = capturedPlans("q354_texttiling")
    val all = plans.mkString("\n===\n")
    assert(all.contains("windowspecdefinition(doc_id#"), all)
    assert(!all.contains("CartesianProduct"), all)
  }

  test("q355 sign-bit audit broadcasts probe signatures; Hamming ranks key on qid") {
    val plans = capturedPlans("q355_signbit_audit")
    val all = plans.mkString("\n===\n")
    assert(all.contains("BroadcastNestedLoopJoin") ||
      all.contains("BroadcastHashJoin"), all)
    assert(all.contains("windowspecdefinition(qid#"), all)
  }

  test("q358 MRR rank window keys on qid; probes broadcast") {
    val plans = capturedPlans("q358_mrr_compressed")
    val all = plans.mkString("\n===\n")
    assert(all.contains("windowspecdefinition(qid#"), all)
    assert(all.contains("BroadcastNestedLoopJoin") ||
      all.contains("BroadcastHashJoin"), all)
  }

  test("q359 truncation audit is one conditional aggregate over the scan") {
    val p = planOf("q359_truncation_audit")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("q356 capture-recapture is two hash aggregates, no window") {
    val p = planOf("q356_capture_recapture")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("q357 template audit is two keyed aggregates, no window") {
    val p = planOf("q357_template_prefix")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
  }

}
