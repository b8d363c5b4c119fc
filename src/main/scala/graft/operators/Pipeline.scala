package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Util._

/** Corpus-preparation operators a training-data pipeline runs after
  * cleaning/dedup (north-star LLM-pipeline surface): PII scrubbing,
  * eval-set decontamination, and token-budget sequence packing. All three
  * are oracle-checked (DuckDB runs the structurally identical SQL).
  *
  * Scale notes (100 TB): q57 is a pure per-row projection (regex passes,
  * no shuffle). q58 is one shuffle of train shingles semi-joined against
  * a BROADCAST eval-shingle set — eval benchmarks are small by
  * construction, so the broadcast contract holds at any corpus size; drop
  * the hint if decontaminating against something corpus-sized. q59 packs
  * per `source` shard with a partitioned running sum (one shuffle,
  * parallel across shards) — the streaming-friendly stand-in for the
  * per-partition first-fit packer a production tokenizer would run.
  */
object Pipeline {

  val queries: Map[String, Q] = Map(
    // ---- q57: PII scrubbing ----
    // The synthetic corpus carries no PII, so the query plants a
    // deterministic specimen per document (email + IP + 12-digit id) and
    // then scrubs it — counts prove detection, the cleaned text proves
    // replacement order, and the oracle rebuilds both from the same
    // expressions.
    "q57_pii_scrub" -> ((s, dir) => {
      import s.implicits._
      val planted = t(s, dir, "documents")
        .withColumn("pii_text", concat($"text",
          lit(" contact user"), $"doc_id", lit("@example.com via 10.0.0."),
          ($"doc_id" % 256).cast(StringType), lit(" ref "),
          lpad(($"doc_id" * 7919).cast(StringType), 12, "0")))
      graft.api.Graft.scrubPii(planted, "pii_text")
        .select($"doc_id", $"n_emails", $"n_ips", $"n_nums", $"pii_text".as("clean"))
        .orderBy($"doc_id")
    }),

    // ---- q58: eval-set decontamination ----
    // Benchmark contamination check: any training document sharing a
    // word 3-gram with the (deterministic doc_id % 97 == 0) eval slice is
    // flagged. Same shingle construction q24/q53 already pin against the
    // oracle. The eval shingle set is broadcast: one shuffle of the train
    // side, none of the corpus moves twice.
    "q58_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      graft.api.Graft.decontaminate(
          train = docs.filter($"doc_id" % 97 =!= 0),
          evalSet = docs.filter($"doc_id" % 97 === 0),
          textCol = "text", idCol = "doc_id")
        .select($"doc_id", $"contaminated")
        .orderBy($"doc_id")
    }),

    // ---- q212: scored contamination — q58's flag upgraded to the
    // GPT-3/PaLM-report form: per train doc, the eval doc with the
    // largest distinct-3-gram overlap (count desc, id asc argmax via
    // max_by — no sort window) and the overlap fraction the reports
    // threshold on. Same shingle family and %97 eval slice as q58. ----
    "q212_contamination_score" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      graft.api.Graft.contaminationScore(
          train = docs.filter($"doc_id" % 97 =!= 0),
          evalSet = docs.filter($"doc_id" % 97 === 0),
          textCol = "text", idCol = "doc_id")
        .orderBy($"doc_id")
    }),

    // ---- q59: token-budget sequence packing ----
    // Documents pack greedily in doc_id order into 2048-token training
    // sequences, independently per `source` shard (the parallel unit —
    // a real pipeline packs per output shard exactly like this).
    // seq_id = tokens-before-this-doc div budget, so a document straddling
    // a boundary starts the next sequence's fill — deterministic and
    // windowable, unlike bin-packing heuristics.
    "q59_pack_sequences" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val toks = t(s, dir, "documents")
        .withColumn("ts", expr("text_stats(text)"))
        .select($"source", $"doc_id", $"ts.ws_tokens".cast(LongType).as("n_tokens"))
      graft.api.Graft.packSequences(toks, "n_tokens", "source", "doc_id", budget = 2048L)
        .groupBy($"source", $"seq_id")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("seq_tokens"),
          min($"doc_id").as("first_doc"))
        .orderBy($"source", $"seq_id")
    }),

    // ---- q223: source-ablation audit — per source, the corpus mean
    // token count WITHOUT that source, from global-minus-group
    // sufficient statistics (every ablation from ONE keyed aggregate,
    // never #sources re-scans): the curation triage that ranks which
    // source to cut first. ----
    "q223_source_ablation" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val toks = t(s, dir, "documents")
        .select($"source",
          expr("text_stats(text).ws_tokens").cast(LongType).as("n_tokens"))
      graft.api.Graft.ablateGroups(toks, "source", "n_tokens")
        .orderBy($"source")
    }),

    // ---- q216: padding-waste audit of batching strategies — the
    // batch-shape counterpart to q59's sequence packing: a training
    // batch pads every member to the batch max, so total cost is
    // Σ n_b·max_b and the waste is what batching policy controls.
    // Three policies over the same token counts: arrival (doc_id
    // order), hash-shuffled (md5 order — what a random epoch shuffle
    // yields), and length-sorted (the bucketing trick). Ranks come
    // from globalRank (partition-offset pattern, never a 1-partition
    // window); everything after is integer keyed aggregates, one
    // double division per strategy at the end. The text is scanned
    // ONCE (localCheckpoint) for all three rankings. ----
    "q216_padding_waste" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val toks = t(s, dir, "documents")
        .select($"doc_id", md5($"doc_id".cast(StringType)).as("h"),
          expr("text_stats(text).ws_tokens").cast(LongType).as("n_tokens"))
        .localCheckpoint()
      def strat(name: String, ord: Seq[String]): org.apache.spark.sql.DataFrame =
        graft.api.Graft.globalRank(toks, ord)
          .withColumn("__b", expr("(grank - 1) div 32"))
          .groupBy($"__b")
          .agg(count(lit(1)).as("__n"), max($"n_tokens").as("__mx"),
            sum($"n_tokens").as("__tot"))
          .agg(count(lit(1)).as("n_batches"),
            sum($"__n" * $"__mx").as("__pad"), sum($"__tot").as("__tot"))
          .select(lit(name).as("strategy"), $"n_batches",
            $"__tot".as("total_tokens"),
            ($"__pad" - $"__tot").as("padding_tokens"),
            (($"__pad" - $"__tot").cast(DoubleType) /
              $"__pad".cast(DoubleType)).as("waste_pct"))
      strat("arrival", Seq("doc_id"))
        .unionAll(strat("length_sorted", Seq("n_tokens", "doc_id")))
        .unionAll(strat("shuffled", Seq("h", "doc_id")))
        .orderBy($"strategy")
    }),

    // ---- q61: the flagship END-TO-END pipeline — quality gate → exact
    // dedup → eval decontamination → deterministic split, each stage the
    // already-oracle-proven operator, composed and hash-checked as one
    // plan. This is the "a user could run their whole corpus prep here"
    // query: per-row projections (stats, hash buckets), one dedup
    // shuffle on the content hash, one shingle shuffle against the
    // broadcast eval set — nothing quadratic, nothing driver-resident.
    "q61_corpus_pipeline" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      // 1. quality gate on token count (one text_stats scan)
      val quality = docs
        .withColumn("n_tokens", expr("text_stats(text).ws_tokens").cast(LongType))
        .filter($"n_tokens" >= 20)
      // 2. exact dedup: keep the min doc_id per normalized content
      val keepIds = graft.api.Graft.dedupExact(quality, "text", "doc_id")
        .select($"doc_id")
      val deduped = quality.join(keepIds, Seq("doc_id"), "left_semi")
      // 3. drop eval docs and anything sharing a 3-gram with them
      val clean = graft.api.Graft.decontaminate(
          train = deduped.filter($"doc_id" % 97 =!= 0),
          evalSet = docs.filter($"doc_id" % 97 === 0),
          textCol = "text", idCol = "doc_id")
        .filter(!$"contaminated")
      // 4. deterministic split, report sizes
      graft.api.Graft.assignSplit(clean, "doc_id")
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("sum_tokens"))
        .orderBy($"split")
    }),

    // ---- q100: corpus prep v2 — the round-5 hygiene composite ----
    // NFC/lower/whitespace normalization → cross-doc common-SPAN removal
    // (the substring-dedup cut, not whole-doc) → survivor-length quality
    // gate → exact dedup on the CLEANED text → per-source yield report.
    // Each stage is the already-oracle-proven operator (q99, q98, q23's
    // hash-group); composed and hash-checked as ONE plan, the way q61
    // pinned the v1 pipeline. Shapes: per-row normalization, one gram
    // shuffle + semi-join for spans, one window on the cleaned-text hash.
    "q100_corpus_pipeline_v2" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
        .withColumn("norm",
          trim(regexp_replace(lower(expr("nfc_normalize(text)")), "\\s+", " ")))
      val cleaned = graft.api.Graft.removeCommonSpans(docs, "norm", "doc_id")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .withColumn("kept_words", col("n_words") - col("n_removed"))
        .filter(col("kept_words") >= 20)
      val w = Window.partitionBy(md5(col("cleaned"))).orderBy(col("doc_id"))
      cleaned.withColumn("rn", row_number().over(w))
        .groupBy(col("source"))
        .agg(sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dropped_dup"),
          sum(when(col("rn") === 1, col("kept_words")).otherwise(0L))
            .as("kept_words"))
        .orderBy(col("source"))
    }),

    // ---- q105: length-grouped batching — bucket documents by token
    // count (ntile per source: a PARTITIONED window, never a global
    // sort) then pack each (source, bucket) shard independently. Packing
    // similar-length docs together is how training pipelines cut padding
    // waste; bucketing first multiplies q59's parallel shards and
    // narrows per-sequence length spread. Two keyed shuffles: source for
    // the ntile, then (source, bucket) shards for the pack windows —
    // both partitioned, nothing global. ----
    "q105_length_buckets" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val toks = t(s, dir, "documents")
        .withColumn("ts", expr("text_stats(text)"))
        .select($"source", $"doc_id", $"ts.ws_tokens".cast(LongType).as("n_tokens"))
      val wb = Window.partitionBy($"source").orderBy($"n_tokens", $"doc_id")
      val bucketed = toks
        .withColumn("bucket", ntile(4).over(wb).cast(LongType))
        .withColumn("shard", concat($"source", lit("#"), $"bucket"))
      val packed = graft.api.Graft.packSequences(
        bucketed, "n_tokens", "shard", "doc_id", budget = 2048L)
      packed.groupBy($"source", $"bucket")
        .agg(count(lit(1)).as("n_docs"),
          min($"n_tokens").as("min_tokens"), max($"n_tokens").as("max_tokens"),
          (max($"seq_id") + 1L).as("n_seqs"))
        .orderBy($"source", $"bucket")
    }),

    // ---- q97: BLOOM-FILTER decontamination, SELF-GATING ----
    // q58 at the scale where even the broadcast eval-shingle set is too
    // big: the eval slice compresses to a 1 MiB bloom built by one
    // mergeable aggregate; the train side probes it per row — no join.
    // Exact q58 flags ride along; the emitted row pins the two properties
    // that make a bloom usable for decontamination: ZERO false negatives
    // (missed = 0, a structural guarantee) and a bounded false-positive
    // over-flag rate (≤ 5% of train docs). Rows-only by construction
    // (bloom bits aren't reproducible in SQL); the gate IS the check,
    // like q41/q90. ----
    "q97_bloom_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val train = docs.filter($"doc_id" % 97 =!= 0)
      val evalSet = docs.filter($"doc_id" % 97 === 0)
      val b = graft.api.Graft.decontaminateBloom(train, evalSet, "text", "doc_id")
        .select($"doc_id", $"maybe_contaminated")
      val e = graft.api.Graft.decontaminate(train, evalSet, "text", "doc_id")
        .select($"doc_id", $"contaminated")
      b.join(e, Seq("doc_id"))
        .agg(count(lit(1)).as("n_train"),
          sum(when($"contaminated", 1L).otherwise(0L)).as("n_exact"),
          sum(when($"maybe_contaminated", 1L).otherwise(0L)).as("n_bloom"),
          sum(when($"contaminated" && !$"maybe_contaminated", 1L).otherwise(0L))
            .as("n_missed"),
          sum(when($"maybe_contaminated" && !$"contaminated", 1L).otherwise(0L))
            .as("n_false_pos"))
        .withColumn("pass",
          $"n_missed" === 0L && $"n_false_pos" * 20L <= $"n_train")
    }))

  val oracle: Map[String, String] = Map(
    // q97 GOLDEN PIN (r8): the bloom aggregate is order-insensitive
    // (every item ORs its bits in; merge is a bitwise OR), so the probe
    // counts are deterministic given the input — hard-pin the sf0.01
    // output, upgrading the self-gated rows-only row to a full hash gate.
    // The exact-side columns stay literal too, so testdata drift fails
    // loudly. (Captured 2026-08-13; regenerate via Verify on new data.)
    "q97_bloom_decontaminate" ->
      """SELECT CAST(494 AS BIGINT) AS n_train, CAST(171 AS BIGINT) AS n_exact,
        |  CAST(171 AS BIGINT) AS n_bloom, CAST(0 AS BIGINT) AS n_missed,
        |  CAST(0 AS BIGINT) AS n_false_pos, TRUE AS pass""".stripMargin,

    "q100_corpus_pipeline_v2" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |w AS (SELECT doc_id, source, string_split(trim(norm), ' ') AS wl FROM d),
        |tok AS (
        |  SELECT doc_id, i, wl[i] AS word
        |  FROM (SELECT doc_id, wl, unnest(generate_series(1, len(wl))) AS i FROM w) t),
        |gr AS (
        |  SELECT doc_id, i,
        |    wl[i] || chr(0) || wl[i+1] || chr(0) || wl[i+2] || chr(0) || wl[i+3] || chr(0) ||
        |    wl[i+4] || chr(0) || wl[i+5] || chr(0) || wl[i+6] || chr(0) || wl[i+7] AS g
        |  FROM (SELECT doc_id, wl, unnest(generate_series(1, greatest(len(wl) - 7, 0))) AS i
        |        FROM w) t),
        |common AS (
        |  SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS c FROM gr GROUP BY g) t
        |  WHERE c >= 2),
        |cov AS (
        |  SELECT DISTINCT doc_id, i + j AS cp
        |  FROM (SELECT doc_id, i, unnest(generate_series(0, 7)) AS j
        |        FROM gr WHERE g IN (SELECT g FROM common)) t),
        |kept AS (
        |  SELECT tok.doc_id, tok.i, tok.word FROM tok
        |  LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.i = cov.cp
        |  WHERE cov.doc_id IS NULL),
        |reb AS (
        |  SELECT doc_id, COUNT(*) AS nk, string_agg(word, ' ' ORDER BY i) AS cleaned
        |  FROM kept GROUP BY doc_id),
        |clean AS (
        |  SELECT w.doc_id AS doc_id, w.source AS source,
        |         CAST(len(wl) AS BIGINT) AS n_words,
        |         CAST(len(wl) - COALESCE(nk, 0) AS BIGINT) AS n_removed,
        |         COALESCE(cleaned, '') AS cleaned
        |  FROM w LEFT JOIN reb ON w.doc_id = reb.doc_id),
        |gate AS (
        |  SELECT *, n_words - n_removed AS kept_words
        |  FROM clean WHERE n_words - n_removed >= 20),
        |ded AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(cleaned) ORDER BY doc_id) AS rn
        |  FROM gate)
        |SELECT source,
        |  CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
        |  CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped_dup,
        |  CAST(SUM(CASE WHEN rn = 1 THEN kept_words ELSE 0 END) AS BIGINT) AS kept_words
        |FROM ded GROUP BY source ORDER BY source""".stripMargin,

    "q57_pii_scrub" ->
      """WITH pii AS (
        |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@example.com via 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
        |    || ' ref ' || lpad(CAST(doc_id * 7919 AS VARCHAR), 12, '0') AS pii_text
        |  FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(pii_text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        | CAST(len(regexp_extract_all(pii_text, '\d{9,}')) AS BIGINT) AS n_nums,
        | regexp_replace(regexp_replace(regexp_replace(pii_text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |   '\d{9,}', '<NUM>', 'g') AS clean
        |FROM pii ORDER BY doc_id""".stripMargin,

    "q58_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, t[i] || chr(0) || t[i+1] || chr(0) || t[i+2] AS s
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
        |        FROM toks)
        |), ev AS (
        |  SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0
        |), cont AS (
        |  SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (s) WHERE sh.doc_id % 97 <> 0
        |)
        |SELECT d.doc_id, (cont.doc_id IS NOT NULL) AS contaminated
        |FROM documents d LEFT JOIN cont ON d.doc_id = cont.doc_id
        |WHERE d.doc_id % 97 <> 0 ORDER BY d.doc_id""".stripMargin,

    // scored-contamination twin: q58's pinned shingle CTE, per-(train,
    // eval) distinct-gram overlap counts, ROW_NUMBER (n_ov DESC, eid)
    // argmax — the exact max_by tie-break — and one double division
    "q212_contamination_score" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, t[i] || chr(0) || t[i+1] || chr(0) || t[i+2] AS s
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
        |        FROM toks)
        |), tr AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
        |ev AS (SELECT doc_id AS eid, s FROM sh WHERE doc_id % 97 = 0),
        |ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM tr GROUP BY doc_id),
        |ov AS (SELECT tr.doc_id, ev.eid, COUNT(*) AS n_ov
        |       FROM tr JOIN ev USING (s) GROUP BY tr.doc_id, ev.eid),
        |top AS (SELECT doc_id, eid, n_ov FROM (
        |          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |                      ORDER BY n_ov DESC, eid) AS rn FROM ov)
        |        WHERE rn = 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(ng.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(top.eid AS BIGINT) AS top_eval_id,
        |  CAST(COALESCE(top.n_ov, 0) AS BIGINT) AS n_overlap,
        |  CASE WHEN COALESCE(ng.n_grams, 0) = 0 THEN 0.0
        |       ELSE CAST(COALESCE(top.n_ov, 0) AS DOUBLE) /
        |            CAST(ng.n_grams AS DOUBLE) END AS overlap_frac
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
        |LEFT JOIN ng USING (doc_id) LEFT JOIN top USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q61_corpus_pipeline" ->
      """WITH stats AS (
        |  SELECT doc_id, text,
        |   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), q AS (
        |  SELECT * FROM stats WHERE n_tokens >= 20
        |), keep AS (
        |  SELECT MIN(doc_id) AS doc_id FROM q
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |), dd AS (
        |  SELECT q.* FROM q JOIN keep USING (doc_id)
        |), toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, t[i] || chr(0) || t[i+1] || chr(0) || t[i+2] AS s
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
        |        FROM toks)
        |), ev AS (
        |  SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0
        |), cont AS (
        |  SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (s)
        |), clean AS (
        |  SELECT dd.* FROM dd
        |  WHERE dd.doc_id % 97 <> 0
        |    AND dd.doc_id NOT IN (SELECT doc_id FROM cont)
        |), sp AS (
        |  SELECT n_tokens,
        |   CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT n_tokens,
        |         (md5_number_lower(CAST(doc_id AS VARCHAR)) & 2147483647::UBIGINT) % 1000 AS b
        |        FROM clean)
        |)
        |SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,

    "q105_length_buckets" ->
      """WITH tok AS (
        |  SELECT source, doc_id,
        |   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT source, doc_id, n_tokens,
        |    CAST(NTILE(4) OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS BIGINT) AS bucket
        |  FROM tok),
        |cum AS (
        |  SELECT source, bucket, doc_id, n_tokens,
        |    COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY source, bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
        |  FROM b)
        |SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens,
        |  CAST(MAX(cum_before // 2048) + 1 AS BIGINT) AS n_seqs
        |FROM cum GROUP BY source, bucket
        |ORDER BY source, bucket""".stripMargin,

    "q59_pack_sequences" ->
      """WITH tok AS (
        |  SELECT source, doc_id,
        |   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), cum AS (
        |  SELECT source, doc_id, n_tokens,
        |   COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
        |  FROM tok)
        |SELECT source, cum_before // 2048 AS seq_id,
        | CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
        | MIN(doc_id) AS first_doc
        |FROM cum GROUP BY source, cum_before // 2048
        |ORDER BY source, seq_id""".stripMargin,

    // ablation twin: identical \S+ token counts, group/global exact
    // sums, and the same single-division mean/mean-without/delta chains
    "q223_source_ablation" ->
      """WITH tok AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v
        |  FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |        CAST(SUM(v) AS BIGINT) AS s FROM tok GROUP BY source),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tn,
        |        CAST(SUM(v) AS BIGINT) AS ts FROM tok)
        |SELECT source, n_rows,
        |  CAST(s AS DOUBLE) / CAST(n_rows AS DOUBLE) AS group_mean,
        |  CASE WHEN tn = n_rows THEN NULL
        |       ELSE CAST(ts - s AS DOUBLE) / CAST(tn - n_rows AS DOUBLE)
        |  END AS mean_without,
        |  CASE WHEN tn = n_rows THEN NULL
        |       ELSE CAST(ts - s AS DOUBLE) / CAST(tn - n_rows AS DOUBLE)
        |         - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)
        |  END AS delta
        |FROM g CROSS JOIN t
        |ORDER BY source""".stripMargin,

    // padding-waste twin: identical rank → batch → n·max integer
    // arithmetic per strategy; md5 hex-string order for the shuffle leg
    // (string collation is plain ASCII on both engines)
    "q216_padding_waste" ->
      """WITH tok AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s1 AS (SELECT n_tokens,
        |         (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 32 AS b
        |       FROM tok),
        |s2 AS (SELECT n_tokens,
        |         (ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) - 1) // 32 AS b
        |       FROM tok),
        |s3 AS (SELECT n_tokens,
        |         (ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1) // 32 AS b
        |       FROM tok),
        |g1 AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
        |         MAX(n_tokens) AS mx, CAST(SUM(n_tokens) AS BIGINT) AS tot
        |       FROM s1 GROUP BY b),
        |g2 AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
        |         MAX(n_tokens) AS mx, CAST(SUM(n_tokens) AS BIGINT) AS tot
        |       FROM s2 GROUP BY b),
        |g3 AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
        |         MAX(n_tokens) AS mx, CAST(SUM(n_tokens) AS BIGINT) AS tot
        |       FROM s3 GROUP BY b)
        |SELECT 'arrival' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_batches,
        |  CAST(SUM(tot) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n * mx) - SUM(tot) AS BIGINT) AS padding_tokens,
        |  CAST(SUM(n * mx) - SUM(tot) AS DOUBLE) /
        |    CAST(SUM(n * mx) AS DOUBLE) AS waste_pct
        |FROM g1
        |UNION ALL
        |SELECT 'length_sorted', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(tot) AS BIGINT), CAST(SUM(n * mx) - SUM(tot) AS BIGINT),
        |  CAST(SUM(n * mx) - SUM(tot) AS DOUBLE) / CAST(SUM(n * mx) AS DOUBLE)
        |FROM g2
        |UNION ALL
        |SELECT 'shuffled', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(tot) AS BIGINT), CAST(SUM(n * mx) - SUM(tot) AS BIGINT),
        |  CAST(SUM(n * mx) - SUM(tot) AS DOUBLE) / CAST(SUM(n * mx) AS DOUBLE)
        |FROM g3
        |ORDER BY strategy""".stripMargin)
}
