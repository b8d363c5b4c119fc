package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Util._

/** Training-data partitioning and mixing (north-star LLM-pipeline ops):
  * deterministic hash-gated train/val/test assignment and per-source
  * weighted corpus sampling.
  *
  * Both use the cross-engine bucket
  * `(md5_lower64(key) & 0x7FFFFFFF) % 1000` — the same value DuckDB
  * computes as `(md5_number_lower(key) & 2147483647) % 1000` — so both
  * queries are hash-checked against the oracle, not rows-only. Bucket
  * gating is the 100 TB-correct mechanism: assignment is a pure per-row
  * projection (no shuffle, no RNG state, no sampling drift between
  * runs/retries), stable under repartitioning, and new data lands in
  * splits at the configured ratios without touching old rows. The sample
  * gate salts the id with the source so mixing is independent of split
  * assignment. */
object Sampling {

  val queries: Map[String, Q] = Map(
    // ---- q179: stratified sample, EXACT proportional allocation —
    // ⌊100·n_lang/N⌋ docs per language in md5-hash order (q47/q48 keep
    // ratios only in expectation; eval sets need exact counts). The
    // sample itself is the gated output — reproducible bit-for-bit. ----
    "q179_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      graft.api.Graft.proportionalSample(
          t(s, dir, "documents").select($"doc_id", $"lang"),
          "lang", "doc_id", sampleSize = 100)
        .orderBy($"lang", $"doc_id")
    }),

    // ---- q47: deterministic train/val/test split (800/100/100 permille) ----
    "q47_train_split" -> ((s, dir) => {
      import s.implicits._
      graft.api.Graft.assignSplit(t(s, dir, "documents"), "doc_id")
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
        .orderBy($"split")
    }),

    // ---- q48: weighted corpus mixing — single-digit sources keep 700
    // permille, the rest 300; gate salted with the source name ----
    "q48_corpus_sample" -> ((s, dir) => {
      import s.implicits._
      val rate = when(length($"source") === 4, 700).otherwise(300)
      val docs = graft.api.Graft.sampleGate(
        t(s, dir, "documents"), concat($"source", lit("|"), $"doc_id".cast(StringType)))
      docs.groupBy($"source")
        .agg(count(lit(1)).as("n_total"),
          count(when($"__gate" < rate, 1)).as("n_kept"))
        .orderBy($"source")
    }),

    // ---- q108: temperature-based source mixing (α-sampling) — quotas
    // ∝ √n_s of a 200-doc budget, filled by md5 rank. The per-source
    // summary pins the quota math AND the exact kept set (sum of kept
    // ids), hash-checked. ----
    "q108_temperature_mix" -> ((s, dir) => {
      import s.implicits._
      graft.api.Graft.temperatureMix(t(s, dir, "documents"), "source",
          "doc_id", totalTarget = 200L)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_kept"), max($"quota").as("quota"),
          sum($"doc_id").as("kept_id_sum"))
        .orderBy($"source")
    })
  )

  val oracle: Map[String, String] = Map(
    // stratified-sample twin: identical floor allocation and md5-order
    // within-stratum selection
    "q179_stratified_sample" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
        |      & 9223372036854775807::UBIGINT AS BIGINT) AS h
        |  FROM documents),
        |cnt AS (SELECT lang, COUNT(*) AS ng FROM d GROUP BY lang),
        |tot AS (SELECT COUNT(*) AS n FROM d),
        |alloc AS (SELECT lang, (100 * ng) // n AS take
        |          FROM cnt CROSS JOIN tot),
        |r AS (SELECT d.doc_id, d.lang,
        |        row_number() OVER (PARTITION BY d.lang ORDER BY d.h, d.doc_id)
        |          AS rn
        |      FROM d)
        |SELECT r.doc_id, r.lang FROM r JOIN alloc USING (lang)
        |WHERE rn <= take ORDER BY lang, doc_id""".stripMargin,

    "q47_train_split" ->
      """SELECT CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val' ELSE 'test' END AS split,
        | COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM (SELECT n_chars,
        |        (md5_number_lower(CAST(doc_id AS VARCHAR)) & 2147483647::UBIGINT) % 1000 AS b
        |      FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q48_corpus_sample" ->
      """SELECT source, COUNT(*) AS n_total,
        | COUNT(CASE WHEN (md5_number_lower(source || '|' || CAST(doc_id AS VARCHAR))
        |                    & 2147483647::UBIGINT) % 1000
        |              < (CASE WHEN length(source) = 4 THEN 700 ELSE 300 END)
        |            THEN 1 END) AS n_kept
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // Replays the √n quota math (sqrt is IEEE-exact in both engines; the
    // k-row normalizing sum runs in the same source order) and the md5
    // rank fill.
    "q108_temperature_mix" ->
      """WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
        |w AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS wt FROM c),
        |s AS (SELECT source, n, wt,
        |        SUM(wt) OVER (ORDER BY source
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS tot
        |      FROM w),
        |q AS (SELECT source, n,
        |        CAST(FLOOR(CAST(200 AS DOUBLE) * wt / tot) AS BIGINT) AS quota
        |      FROM s),
        |r AS (SELECT source, doc_id,
        |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY
        |          (md5_number_lower(CAST(doc_id AS VARCHAR)) & 9223372036854775807::UBIGINT),
        |          doc_id) AS rk
        |      FROM documents)
        |SELECT q.source, COUNT(*) AS n_kept, q.quota,
        |       CAST(SUM(r.doc_id) AS BIGINT) AS kept_id_sum
        |FROM r JOIN q ON r.source = q.source
        |WHERE r.rk <= q.quota
        |GROUP BY q.source, q.quota
        |ORDER BY q.source""".stripMargin
  )
}
