package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import Util._

/** Event-stream operators (north-star surface, SURVEY.md §2.9). These are the
  * batch twins of the Structured Streaming plans in `graft.streaming`; the
  * oracle checks the batch semantics (tumbling windows, sessionization,
  * as-of join) exactly.
  *
  * Scale notes: everything here shuffles once on `user_id` (or the window
  * key) and is window/partial-agg friendly. The as-of join uses the
  * union+sort-within-partition pattern — one shuffle, no per-row subquery,
  * no O(n^2) pair blowup — which is the 100 TB-safe formulation.
  */
object Events {

  val queries: Map[String, Q] = Map(
    // ---- q18: as-of join — for each purchase, the latest click strictly
    //      before it by the same user (argmax over (ts, event_id)). ----
    "q18_asof_join" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
      // Union the two sides; on ts ties purchases sort before clicks so a
      // click at exactly the purchase ts is NOT matched (strict <).
      val tagged = e.filter($"event_type".isin("click", "purchase"))
        .select($"event_id", $"user_id", $"ts",
          when($"event_type" === "click", $"event_id").as("click_id"),
          when($"event_type" === "purchase", lit(1)).otherwise(lit(2)).as("kind"))
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"kind", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("matched", last($"click_id", ignoreNulls = true).over(w))
        .filter($"kind" === 1)
        .select($"event_id".as("purchase_id"), $"user_id", $"matched".as("click_id"))
        .orderBy($"purchase_id")
    }),

    // ---- q21: tumbling 1-hour window aggregation (epoch-aligned) ----
    "q21_tumbling_window" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value", 6).as("sum_value"))
        .select(unix_timestamp($"w.start").as("window_start"), $"event_type",
          $"n_events", $"sum_value")
        .orderBy($"window_start", $"event_type")
    }),

    // ---- q49: batch twin of the watermarked stream dedup (T3): semantic
    // dedup on (user, type, minute) keeping the smallest event_id — the
    // deterministic batch statement of "duplicates within the horizon are
    // dropped". One partial-agg-friendly shuffle. ----
    "q49_event_dedup_twin" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id", $"event_type", date_trunc("minute", $"ts").as("m"))
        .agg(min($"event_id").as("keep_id"), count(lit(1)).as("n_dups"))
        .select($"keep_id", $"user_id", $"event_type",
          unix_timestamp($"m").as("m_start"), $"n_dups")
        .orderBy($"keep_id")
    }),

    // ---- q50: batch twin of the stream-stream interval join (T5):
    // purchases attributed to same-user clicks in the preceding hour.
    // Shuffles once on user_id with the time bound as residual — the
    // exact shape whose streaming form evicts state by watermark. ----
    "q50_purchase_attribution" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
      val clicks = e.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("c_ts"), $"event_id".as("click_id"))
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("p_ts"), $"event_id".as("purchase_id"), $"value")
      purchases.join(clicks, Seq("user_id"))
        .filter($"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") && $"c_ts" < $"p_ts")
        .select($"purchase_id", $"click_id", $"user_id",
          unix_micros($"p_ts").as("p_us"), unix_micros($"c_ts").as("c_us"), $"value")
        .orderBy($"purchase_id", $"click_id")
    }),

    // ---- q192: linear multi-touch attribution — q50 finds the touch
    // ROWS; this splits conversion credit across them: 1000 permille per
    // purchase divided equally over the qualifying view/click/signup
    // touches in the prior 72 h, integer remainder to the earliest touch
    // (so per-channel totals reconcile to #conversions × 1000 exactly —
    // the audit property float splits lose). ----
    "q192_attribution" -> ((s, dir) => {
      import s.implicits._
      graft.api.Graft.linearAttribution(t(s, dir, "events"),
          "user_id", "event_type", "ts", "event_id",
          convType = "purchase", touchTypes = Seq("view", "click", "signup"),
          windowUs = 259200000000L)
        .groupBy($"channel")
        .agg(count(lit(1)).as("n_touches"),
          sum($"credit").as("credit_permille"),
          count_distinct($"conv_id").as("n_conversions"))
        .orderBy($"channel")
    }),

    // ---- q200: behavioral bot screening — the event-stream hygiene
    // audit run before any engagement analysis: per user, volume,
    // type diversity, activity span, EXACT median inter-event gap
    // (lag diff + percentile — the even-count midpoint is (a+b)/2, a
    // division by two that is always float-exact, so the gate holds),
    // and peak events-per-minute burst. Flags = machine-like cadence:
    // burst ≥ 20/min or median gap ≤ 500 ms. Two keyed shuffles on
    // user_id total (gaps window + final agg; the burst count folds
    // into the same agg via a minute-bucket subaggregate). ----
    "q200_bot_screen" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events").select($"user_id", $"event_type",
        unix_micros($"ts").as("us"), $"event_id")
      val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      val gaps = e.withColumn("gap", $"us" - lag($"us", 1).over(w))
      val perMin = e.groupBy($"user_id", expr("us div 60000000").as("minute"))
        .agg(count(lit(1)).as("n_min"))
        .groupBy($"user_id").agg(max($"n_min").as("burst_per_min"))
      val stats = gaps.groupBy($"user_id").agg(
        count(lit(1)).as("n_events"),
        count_distinct($"event_type").as("n_types"),
        (max($"us") - min($"us")).as("span_us"),
        expr("percentile(gap, 0.5)").as("median_gap_us"))
      stats.join(perMin, Seq("user_id"))
        .withColumn("is_bot",
          $"burst_per_min" >= 20L ||
            (col("median_gap_us").isNotNull && col("median_gap_us") <= 500000.0))
        .orderBy($"user_id")
    }),

    // ---- q51: batch twin of the arbitrary-stateful running totals (T4,
    // EventStreams.runningTotals): the final state per user equals the
    // plain aggregate — decimal-exact sum per the float policy. ----
    "q51_running_totals_twin" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("total_events"), dsum($"value", 6).as("total_value"))
        .orderBy($"user_id")
    }),

    // ---- q22: sessionization (30-min inactivity gap), gaps-and-islands ----
    "q22_sessionize" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
        .withColumn("new_sess",
          when($"prev_us".isNull || (unix_micros($"ts") - $"prev_us") > 1800L * 1000000L, 1))
        .groupBy($"user_id")
        .agg(count($"new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    }),

    // ---- q74: ordered funnel (view → click → purchase) — each stage's
    // anchor is the FIRST qualifying event strictly after the previous
    // stage's anchor. Timestamps compare as unix micros on both engines
    // (Spark TimestampType is µs; the oracle uses epoch_us). Three
    // pre-aggregated per-user anchors, each one join + one agg — never a
    // per-user subquery. ----
    "q74_funnel" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      val stages = graft.api.Graft.funnelStages(e, "user_id", "event_type", "us",
        Seq("view", "click", "purchase"))
      val labels = Seq("1_view", "2_view_click", "3_view_click_purchase")
      labels.zip(stages).map { case (label, st) =>
        st.agg(count(lit(1)).as("n_users")).select(lit(label).as("stage"), $"n_users")
      }.reduce(_ unionAll _).orderBy($"stage")
    }),

    // ---- q77: gap-filled daily activity — time-series densification.
    // Each user's [first, last] day range becomes a contiguous spine
    // (explode(sequence)), missing days join as zero counts — the
    // resample/fill-forward prerequisite of any per-entity time series. ----
    "q77_gap_fill" -> ((s, dir) => {
      import s.implicits._
      val perDay = t(s, dir, "events")
        .select($"user_id", graft.api.Graft.epochDay($"ts").as("day"))
        .groupBy($"user_id", $"day").agg(count(lit(1)).as("n"))
      graft.api.Graft.gapFill(perDay, "user_id", "day")
        .withColumn("n", coalesce($"n", lit(0L)))
        .orderBy($"user_id", $"day")
    }),

    // ---- q75: cohort retention — users grouped by first-seen day, the
    // classic (cohort, day-offset) activity triangle. Two shuffles on
    // user_id (first-seen + join) and one on the cohort cell; day math
    // is Graft.epochDay — FLOOR division matching DuckDB `//` even for
    // pre-1970 timestamps (Spark `div` truncates toward zero). ----
    "q75_retention" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
        .select($"user_id", graft.api.Graft.epochDay($"ts").as("day"))
      graft.api.Graft.retentionTriangle(e, "user_id", "day")
        .orderBy($"cohort", $"offset")
    })
  )

  val oracle: Map[String, String] = Map(
    "q18_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        | (SELECT c.event_id FROM events c
        |   WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
        |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,

    "q21_tumbling_window" ->
      """SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start, event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q49_event_dedup_twin" ->
      """SELECT MIN(event_id) AS keep_id, user_id, event_type,
        | CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS m_start,
        | COUNT(*) AS n_dups
        |FROM events GROUP BY user_id, event_type, date_trunc('minute', ts)
        |ORDER BY keep_id""".stripMargin,

    "q50_purchase_attribution" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
        | epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us, p.value
        |FROM events p JOIN events c ON p.user_id = c.user_id
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        |ORDER BY purchase_id, click_id""".stripMargin,

    // bot-screen twin: identical gap/burst/median algebra (DuckDB median
    // = Spark percentile 0.5 — both midpoint-average on even counts,
    // which is float-exact)
    "q200_bot_screen" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
        |g AS (
        |  SELECT user_id, event_type, us,
        |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
        |  FROM e),
        |pm AS (
        |  SELECT user_id, CAST(MAX(n_min) AS BIGINT) AS burst_per_min FROM (
        |    SELECT user_id, us // 60000000 AS minute, COUNT(*) AS n_min
        |    FROM e GROUP BY 1, 2) GROUP BY user_id),
        |st AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
        |    MAX(us) - MIN(us) AS span_us,
        |    CAST(median(gap) AS DOUBLE) AS median_gap_us
        |  FROM g GROUP BY user_id)
        |SELECT st.user_id, st.n_events, st.n_types, st.span_us,
        |  st.median_gap_us, pm.burst_per_min,
        |  (pm.burst_per_min >= 20 OR (st.median_gap_us IS NOT NULL
        |    AND st.median_gap_us <= 500000.0)) AS is_bot
        |FROM st JOIN pm ON pm.user_id = st.user_id
        |ORDER BY st.user_id""".stripMargin,

    // attribution twin: identical integer credit split (1000 // m,
    // remainder to the earliest touch by (ts, id) order)
    "q192_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
        |conv AS (
        |  SELECT user_id, event_id AS cid, us AS cus FROM e
        |  WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_id AS tid, event_type AS channel, us AS tus
        |  FROM e WHERE event_type IN ('view', 'click', 'signup')),
        |j AS (
        |  SELECT c.cid, t.tid, t.channel, t.tus
        |  FROM conv c JOIN touch t ON t.user_id = c.user_id
        |  WHERE t.tus < c.cus AND c.cus - t.tus <= 259200000000),
        |r AS (
        |  SELECT cid, tid, channel,
        |    COUNT(*) OVER (PARTITION BY cid) AS m,
        |    row_number() OVER (PARTITION BY cid ORDER BY tus, tid) AS rk
        |  FROM j)
        |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(1000 // m + CASE WHEN rk = 1 THEN 1000 % m ELSE 0 END)
        |    AS BIGINT) AS credit_permille,
        |  CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_conversions
        |FROM r GROUP BY channel
        |ORDER BY channel""".stripMargin,

    "q51_running_totals_twin" ->
      """SELECT user_id, COUNT(*) AS total_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q22_sessionize" ->
      """WITH x AS (
        | SELECT user_id, epoch_us(ts) AS us,
        |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        | FROM events)
        |SELECT user_id,
        | COUNT(*) FILTER (WHERE prev_us IS NULL OR us - prev_us > 1800000000) AS n_sessions,
        | COUNT(*) AS n_events
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q74_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.us) AS t2 FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.us > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.us) AS t3 FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.us > c.t2 GROUP BY 1)
        |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
        |UNION ALL SELECT '2_view_click', COUNT(*) FROM c
        |UNION ALL SELECT '3_view_click_purchase', COUNT(*) FROM p
        |ORDER BY stage""".stripMargin,

    "q77_gap_fill" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |), sp AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM pd GROUP BY 1),
        |spine AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM sp)
        |SELECT s.user_id, s.day, COALESCE(n, 0) AS n
        |FROM spine s LEFT JOIN pd ON s.user_id = pd.user_id AND s.day = pd.day
        |ORDER BY s.user_id, s.day""".stripMargin,

    "q75_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort FROM e GROUP BY 1)
        |SELECT cohort, day - cohort AS "offset", COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort, "offset"""".stripMargin
  )
}
