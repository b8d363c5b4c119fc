package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Util._

/** Second wave of relational/semi-structured operator coverage: JSON
  * extraction, lateral explode, pivot, exact moment statistics, exact
  * percentiles, SQL grouping sets and correlated EXISTS, plus an
  * approx-distinct sketch (rows-only).
  *
  * The statistics queries compute variance/stddev/corr from DECIMAL sums
  * (sum x, sum x², sum xy are associative-exact) and do the float math
  * once at the end — deterministic under any shuffle order, unlike
  * Welford-style online aggregates, and exactly reproducible by the
  * oracle. That is also the 100 TB-correct formulation.
  */
object Extras {

  val queries: Map[String, Q] = Map(
    // ---- q127: join-key skew audit — the pre-shuffle diagnostic for
    // salting / AQE skew thresholds. Per-key counts collapse to a
    // count-of-counts histogram (distinct count VALUES — tiny at any
    // scale), so the exact rank-based p50/p99 walk is a window over
    // hundreds of rows, never a global sort over keys. ----
    "q127_key_skew_audit" -> ((s, dir) => {
      import graft.api.Graft
      Graft.keySkewAudit(t(s, dir, "lineitem"), "l_orderkey")
        .unionByName(Graft.keySkewAudit(t(s, dir, "orders"), "o_custkey"))
        .unionByName(Graft.keySkewAudit(t(s, dir, "events"), "user_id"))
        .orderBy("key_col")
    }),

    // ---- q132: exact join-size pre-flight audit — q127's two-sided
    // sibling: |L ⋈ R| = Σ_k cl·cr computed from the per-key count
    // tables alone (key-table-sized work, the join never runs), plus the
    // hottest key's contribution — the broadcast/shuffle/salt decision
    // input. Hot-key argmax is a deterministic struct max. ----
    "q132_join_size_audit" -> ((s, dir) => {
      graft.api.Graft.joinSizeAudit(
        t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "k"),
        t(s, dir, "orders").withColumnRenamed("o_orderkey", "k"), "k")
    }),

    // ---- q34: JSON field extraction over events.props ----
    "q34_json_extract" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast(LongType))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), min($"k").as("min_k"), max($"k").as("max_k"),
          sum($"k").as("sum_k"))
        .orderBy($"event_type")
    }),

    // ---- q35: lateral explode → word frequency top-20 ----
    "q35_explode_words" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(explode(split(trim($"text"), "\\s+")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"word")
        .limit(20)
    }),

    // ---- q36: pivot (per-user event-type counts) ----
    "q36_pivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"user_id")
    }),

    // ---- q37: exact interpolated percentiles ----
    "q37_percentile" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          percentile($"o_totalprice", lit(0.5)).as("p50"),
          percentile($"o_totalprice", lit(0.9)).as("p90"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    }),

    // ---- q38: moment statistics from exact decimal sums ----
    "q38_stats" -> ((s, dir) => {
      import s.implicits._
      val sums = t(s, dir, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast(LongType))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(dec($"value", 6)).cast(DoubleType).as("sx"),
          sum(dec($"value", 6) * dec($"value", 6)).cast(DoubleType).as("sx2"),
          sum($"k").cast(DoubleType).as("sy"),
          sum($"k" * $"k").cast(DoubleType).as("sy2"),
          sum(dec($"value", 6) * $"k".cast(DecimalType(18, 0))).cast(DoubleType).as("sxy"))
      // The inputs (decimal sums → double) are bit-identical cross-engine;
      // the derived stats are rounded to 6dp because C++ FMA contraction
      // can differ from JVM float semantics by 1 ulp.
      sums.select($"event_type", $"n",
        round($"sx" / $"n", 6).as("mean_value"),
        round(($"sx2" - $"sx" * $"sx" / $"n") / ($"n" - 1), 6).as("var_value"),
        round(sqrt(($"sx2" - $"sx" * $"sx" / $"n") / ($"n" - 1)), 6).as("std_value"),
        round(($"sxy" - $"sx" * $"sy" / $"n") /
          sqrt(($"sx2" - $"sx" * $"sx" / $"n") * ($"sy2" - $"sy" * $"sy" / $"n")), 6).as("corr_vk"))
        .orderBy($"event_type")
    }),

    // ---- q39: SQL GROUPING SETS ----
    "q39_grouping_sets" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "nation").createOrReplaceTempView("nation_v")
      s.sql(
        """SELECT n_name, c_mktsegment, COUNT(*) AS n_cust,
          | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          |FROM customer_v JOIN nation_v ON c_nationkey = n_nationkey
          |GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
          |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin)
    }),

    // ---- q40: correlated EXISTS subquery via SQL ----
    "q40_exists_correlated" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders_v
          |WHERE EXISTS (SELECT 1 FROM lineitem_v
          |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // ---- q42: RANGE window frame (trailing 30-day spend per customer) ----
    "q42_range_window" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_custkey")
        .orderBy(unix_timestamp($"o_orderdate"))
        .rangeBetween(-30L * 86400L, 0L)
      t(s, dir, "orders")
        .withColumn("spend_30d", sum(dec($"o_totalprice")).over(w).cast(DoubleType))
        .select($"o_custkey", $"o_orderkey", $"spend_30d")
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // ---- q72: the rank-function window family — ntile / percent_rank /
    // cume_dist / lag / lead per customer. percent_rank and cume_dist
    // are exact rationals ((rank−1)/(n−1), rank/n) computed identically
    // by both engines, so no rounding is needed. ----
    "q72_window_rank_funcs" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_custkey").orderBy($"o_orderdate")
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          ntile(4).over(w).cast(LongType).as("quartile"),
          // rank/dense_rank need a non-unique order to differ: same-date
          // orders tie under wp
          rank().over(wp).cast(LongType).as("rnk"),
          dense_rank().over(wp).cast(LongType).as("drnk"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // ---- q78: fuzzy matching — Levenshtein near-duplicate part names
    // within (brand, size) blocks. Classic blocked fuzzy join: the
    // equality join on the block keys bounds pair generation to
    // C(rows-per-block, 2) — the same cap discipline as q24 — and the
    // edit distance runs only inside blocks, never across the full
    // cross product. Same definition (unit-cost edits) both engines. ----
    "q78_fuzzy_match" -> ((s, dir) => {
      import s.implicits._
      val p = t(s, dir, "part").select($"p_partkey", $"p_brand", $"p_size", $"p_name")
      p.alias("a").join(p.alias("b"),
          $"a.p_brand" === $"b.p_brand" && $"a.p_size" === $"b.p_size" &&
            $"a.p_partkey" < $"b.p_partkey")
        // project the distance ONCE: Filter and Aggregate are separate
        // operators, so Catalyst would not CSE a repeated levenshtein —
        // and the O(len²) DP is the whole cost of this query. (The 3-arg
        // bounded form was A/B'd at sf1 and LOST here: at k=8 the band
        // 2k+1=17 is nearly the ~30-char name length, so the banded DP
        // saves no cells and its per-cell bookkeeping costs ~45% — it
        // only pays at tight thresholds, see q195's k=2.)
        .withColumn("d", levenshtein($"a.p_name", $"b.p_name"))
        .filter($"d" <= 8)
        .groupBy($"a.p_brand".as("brand"))
        .agg(count(lit(1)).as("n_pairs"),
          min($"d").cast(LongType).as("min_dist"))
        .orderBy($"brand")
    }),

    // ---- q76: unpivot/melt — wide → long normalization (the inverse of
    // q36's pivot; a Polars table-stake). Pure projection: each input row
    // fans to one row per measure with no shuffle. ----
    "q76_unpivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select($"p_partkey", $"p_retailprice", $"p_size".cast(DoubleType).as("p_size"))
        .unpivot(Array($"p_partkey"), Array($"p_retailprice", $"p_size"),
          "measure", "value")
        .orderBy($"p_partkey", $"measure")
    }),

    // ---- q41: HLL++ sketch distinct — approximate, so no SQL twin, but
    // SELF-GATING like q46: the exact count rides along and the emitted
    // `pass` pins the sketch's relative error (< 3× the configured 1%
    // rsd) every round instead of a bare rows-only check. ----
    "q41_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      // approx and exact run as SEPARATE aggregations joined on the tiny
      // group key: mixing count_distinct into the HLL agg makes Catalyst
      // plan one expand + full-row distinct shuffle for BOTH branches
      // (8× slower, measured); separately, the HLL keeps its map-side
      // partial sketch and the exact keeps partial (type,user) dedup.
      val ev = t(s, dir, "events")
      val ap = ev.groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", rsd = 0.01).as("approx_users"))
      val ex = ev.groupBy($"event_type")
        .agg(count_distinct($"user_id").as("exact_users"))
      ap.join(ex, Seq("event_type"))
        .withColumn("rel_err", round(
          abs($"approx_users" - $"exact_users") / $"exact_users", 5))
        .withColumn("pass", $"rel_err" <= 0.03)
        .orderBy($"event_type")
    }),

    // ---- q104: MERGEABLE HLL sketches — the re-aggregation story q41
    // can't tell: one Datasketches HLL per source (the compact artifact a
    // 100 TB pipeline PERSISTS instead of raw values), then a global
    // estimate from hll_union_agg over the sketches alone — raw data
    // touched exactly once, cross-source overlap handled by the sketch
    // algebra (summing per-source distincts would double-count shared
    // docs). Exact global distinct rides along; emitted `pass` pins
    // rel_err ≤ 5% (q41's self-gate). lgK=13, NOT 12: Datasketches
    // promotes a coupon SET to HLL registers once the coupon array would
    // outgrow 2^(lgK-3) ints (~3/4·2^(lgK-3)·... ≈ 384 coupons at lgK=12)
    // and the HLL-mode estimate then varies ±4 with the partial-agg merge
    // order (measured 497/498/499/501 across local[2/7/32] at lgK=12).
    // At lgK=13 the ~500 sf0.01 coupons stay in SET mode end-to-end, the
    // union is a plain set union, and the estimate is a deterministic
    // function of the coupon set — partition-layout-invariant (measured
    // 500 at local[2/7/32]), which is what makes the golden pin below
    // sound. At real 100 TB cardinalities the sketch goes HLL-mode and
    // estimates legitimately wobble ±ε with merge order; only the exact
    // coupon regime supports a hash gate. ----
    "q104_hll_union" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").withColumn("fp", md5($"text"))
      val perSource = docs.groupBy($"source")
        .agg(expr("hll_sketch_agg(fp, 13)").as("sk"))
      val merged = perSource
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_global"))
      val exact = docs.agg(count_distinct($"fp").as("exact_global"))
      merged.crossJoin(exact)
        .withColumn("rel_err", round(
          abs($"approx_global" - $"exact_global") / $"exact_global", 5))
        .withColumn("pass", $"rel_err" <= 0.05)
    }),

    // ---- q199: bounded map-side top-k per group — the Aggregator
    // answer to "top 3 per key" that q07's rank window can't give at
    // scale: the window SORTS every group's full row set; topk_agg3
    // keeps a 3-row buffer per group per partition, map-side combines,
    // and merges in O(k) — only k rows per partition per group cross
    // the shuffle, nothing is sorted. The oracle is the rank window:
    // same rows, radically different plan (PlanShapeSpec pins no Window
    // and no Sort over the fact rows). ----
    "q199_topk_agg" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      import s.implicits._
      val o = t(s, dir, "orders").select($"o_orderpriority",
        round($"o_totalprice" * 100).cast(LongType).as("cents"), $"o_orderkey")
      o.groupBy($"o_orderpriority")
        .agg(expr("topk_agg3(cents, o_orderkey)").as("tk"))
        .select($"o_orderpriority", posexplode($"tk").as(Seq("p", "x")))
        .select($"o_orderpriority", ($"p" + 1).cast(LongType).as("rk"),
          $"x._1".as("cents"), $"x._2".as("o_orderkey"))
        .orderBy($"o_orderpriority", $"rk")
    }),

    // ---- q56: salted join under key skew — orders⋈lineitem through
    // Graft.saltedJoin (big side salted deterministically, small side
    // replicated saltFactor times), aggregated after: results must equal
    // the plain join, which is exactly what the oracle states. The skew
    // remedy is thus correctness-gated, not just spec'd. ----
    "q56_salted_join_skew" -> ((s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderpriority")
      val items = t(s, dir, "lineitem")
        .select($"l_orderkey".as("o_orderkey"), $"l_quantity", $"l_extendedprice")
      graft.api.Graft.saltedJoin(items, orders, "o_orderkey", saltFactor = 8)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          dsum($"l_extendedprice").as("total_price"))
        .orderBy($"o_orderpriority")
    }),

    // ---- q45: exact COUNT(DISTINCT) — the oracle-checkable twin of q41.
    // Expands to a two-phase plan (partial distinct on (event_type,
    // user_id), then count) — both shuffles partial-agg friendly. ----
    "q45_exact_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(count_distinct($"user_id").as("exact_users"),
          count(lit(1)).as("n_events"))
        .orderBy($"event_type")
    }),

    // ---- q139: bloom-prefiltered selective join — lineitem joined to
    // the small-part slice (p_size ≤ 5, ~10% of parts) through
    // Graft.bloomPrefilterJoin: the dim keys compress to one bloom
    // aggregate and the fact side is probed per row BEFORE its shuffle,
    // so ~90% of lineitem never moves. Bloom false positives die in the
    // join itself, so the result is exactly the plain join — which is
    // what the oracle states (q56's remedy-gating pattern: the scale
    // optimization is correctness-gated against the unoptimized form). ----
    "q139_bloom_join" -> ((s, dir) => {
      import s.implicits._
      val parts = t(s, dir, "part").filter($"p_size" <= 5)
        .select($"p_partkey", $"p_brand")
      val items = t(s, dir, "lineitem")
        .select($"l_partkey".as("p_partkey"), $"l_extendedprice")
      graft.api.Graft.bloomPrefilterJoin(items, parts, "p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_items"),
          dsum($"l_extendedprice").as("revenue"))
        .orderBy($"p_brand")
    })
  )

  /** One audit block per table, mirroring keySkewAudit's histogram walk. */
  private def skewAuditSql(i: Int, table: String, key: String): String =
    s"""c$i AS (SELECT $key AS key, COUNT(*) AS cnt FROM $table GROUP BY 1),
       |h$i AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS k FROM c$i GROUP BY cnt),
       |m$i AS (SELECT cnt, k, SUM(k) OVER (ORDER BY cnt) AS cumk FROM h$i),
       |t$i AS (SELECT CAST(SUM(k) AS BIGINT) AS n_keys,
       |               CAST(SUM(cnt * k) AS BIGINT) AS total_rows,
       |               MAX(cnt) AS max_cnt FROM h$i),
       |s$i AS (SELECT '$key' AS key_col, n_keys, total_rows, max_cnt,
       |          MIN(CASE WHEN cumk >= ceil(n_keys * 0.5) THEN cnt END) AS p50_cnt,
       |          MIN(CASE WHEN cumk >= ceil(n_keys * 0.99) THEN cnt END) AS p99_cnt,
       |          ROUND(CAST(max_cnt AS DOUBLE) * n_keys / total_rows, 6) AS skew_factor
       |        FROM m$i CROSS JOIN t$i GROUP BY 1, 2, 3, 4)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q127_key_skew_audit" ->
      s"""WITH ${skewAuditSql(1, "lineitem", "l_orderkey")},
         |${skewAuditSql(2, "orders", "o_custkey")},
         |${skewAuditSql(3, "events", "user_id")}
         |SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
         |ORDER BY key_col""".stripMargin,

    // join-size twin: same count-table algebra; the hot key replays the
    // (contribution, key-string) struct-max as a window argmax
    "q132_join_size_audit" ->
      """WITH lc AS (SELECT l_orderkey AS k, COUNT(*) AS cl FROM lineitem GROUP BY 1),
        |rc AS (SELECT o_orderkey AS k, COUNT(*) AS cr FROM orders GROUP BY 1),
        |j AS (SELECT lc.k, cl * cr AS rows_k FROM lc JOIN rc USING (k)),
        |hot AS (
        |  SELECT rows_k, CAST(k AS VARCHAR) AS k FROM j
        |  ORDER BY rows_k DESC, CAST(k AS VARCHAR) DESC LIMIT 1)
        |SELECT CAST((SELECT SUM(cl) FROM lc) AS BIGINT) AS n_left,
        |  CAST((SELECT COUNT(*) FROM lc) AS BIGINT) AS n_keys_left,
        |  CAST((SELECT SUM(cr) FROM rc) AS BIGINT) AS n_right,
        |  CAST((SELECT COUNT(*) FROM rc) AS BIGINT) AS n_keys_right,
        |  CAST((SELECT COUNT(*) FROM j) AS BIGINT) AS n_keys_common,
        |  CAST((SELECT COALESCE(SUM(rows_k), 0) FROM j) AS BIGINT) AS join_rows,
        |  CAST((SELECT rows_k FROM hot) AS BIGINT) AS max_key_rows,
        |  (SELECT k FROM hot) AS max_key""".stripMargin,

    "q34_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        | MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        | MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q35_explode_words" ->
      """SELECT word, COUNT(*) AS cnt FROM (
        | SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents) x
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin,

    "q36_pivot" ->
      """SELECT user_id,
        | COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        | COUNT(*) FILTER (WHERE event_type = 'view') AS view,
        | COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        | COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        | COUNT(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q37_percentile" ->
      """SELECT o_orderpriority,
        | quantile_cont(o_totalprice, 0.5) AS p50,
        | quantile_cont(o_totalprice, 0.9) AS p90,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q38_stats" ->
      """WITH sums AS (
        | SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx2,
        |  CAST(SUM(k) AS DOUBLE) AS sy,
        |  CAST(SUM(k * k) AS DOUBLE) AS sy2,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(k AS DECIMAL(18,0))) AS DOUBLE) AS sxy
        | FROM (SELECT event_type, value,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) e
        | GROUP BY event_type)
        |SELECT event_type, n,
        | round(sx / n, 6) AS mean_value,
        | round((sx2 - sx * sx / n) / (n - 1), 6) AS var_value,
        | round(sqrt((sx2 - sx * sx / n) / (n - 1)), 6) AS std_value,
        | round((sxy - sx * sy / n) / sqrt((sx2 - sx * sx / n) * (sy2 - sy * sy / n)), 6) AS corr_vk
        |FROM sums ORDER BY event_type""".stripMargin,

    "q39_grouping_sets" ->
      """SELECT n_name, c_mktsegment, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,

    "q40_exists_correlated" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
        |ORDER BY o_orderkey""".stripMargin,

    "q56_salted_join_skew" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q45_exact_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        | COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the bloom prefilter is transparent by construction (no false
    // negatives; false positives die in the join), so the oracle is the
    // PLAIN join — the optimization itself is under the hash gate
    "q139_bloom_join" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 5
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // q41/q104 GOLDEN PINS (r8): both sketches are deterministic given
    // the input — HLL++ with fixed rsd and Datasketches HLL with fixed
    // lgK have no randomness — so the sf0.01 outputs are hard-pinned as
    // literals, upgrading the self-gated rows-only checks to full hash
    // gates. The exact_* columns stay literal TOO on purpose: if the
    // driver's testdata ever changes, the pin fails LOUDLY instead of
    // silently re-passing a drifted sketch. (Captured 2026-08-13 from
    // /root/testdata/sf0.01; regenerate by re-running Verify if the
    // driver regenerates testdata.)
    "q41_approx_distinct" ->
      """SELECT event_type, CAST(approx_users AS BIGINT) AS approx_users,
        |  CAST(exact_users AS BIGINT) AS exact_users,
        |  CAST(rel_err AS DOUBLE) AS rel_err, pass
        |FROM (VALUES
        |  ('click', 151, 150, 0.00667, TRUE),
        |  ('error', 151, 150, 0.00667, TRUE),
        |  ('purchase', 151, 150, 0.00667, TRUE),
        |  ('signup', 151, 150, 0.00667, TRUE),
        |  ('view', 151, 150, 0.00667, TRUE))
        |  g(event_type, approx_users, exact_users, rel_err, pass)
        |ORDER BY event_type""".stripMargin,

    // top-k-agg twin: the rank window the aggregate replaces
    "q199_topk_agg" ->
      """SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, cents, o_orderkey
        |FROM (
        |  SELECT o_orderpriority,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
        |        o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin,

    "q104_hll_union" ->
      """SELECT CAST(500 AS BIGINT) AS approx_global,
        |  CAST(500 AS BIGINT) AS exact_global,
        |  CAST(0.0 AS DOUBLE) AS rel_err, TRUE AS pass""".stripMargin,

    "q78_fuzzy_match" ->
      """SELECT a.p_brand AS brand, COUNT(*) AS n_pairs,
        | CAST(MIN(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS min_dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        | AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 8
        |GROUP BY 1 ORDER BY brand""".stripMargin,

    "q76_unpivot" ->
      """SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
        |ORDER BY p_partkey, measure""".stripMargin,

    "q72_window_rank_funcs" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        | CAST(RANK() OVER wp AS BIGINT) AS rnk,
        | CAST(DENSE_RANK() OVER wp AS BIGINT) AS drnk,
        | PERCENT_RANK() OVER w AS pr,
        | CUME_DIST() OVER w AS cd,
        | LAG(o_totalprice, 1) OVER w AS prev_price,
        | LEAD(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       wp AS (PARTITION BY o_custkey ORDER BY o_orderdate)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q42_range_window" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
