package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Util._

/** Round-4 corpus-preparation operators: chunking, vocabulary building,
  * per-source quotas, stratified sampling, cross-doc repeated n-grams
  * (the exact-substring-dedup signal of Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better"), and int8 embedding
  * quantization. Every entry is hash-checked against a DuckDB oracle;
  * cross-engine exactness follows the Util policy (BIGINT casts, integer
  * division, identical double expression shapes, 63-bit-masked md5 rank).
  */
object Corpus {

  val queries: Map[String, Q] = Map(
    // ---- q208: deterministic epoch shuffle + shard plan — the training
    // dataloader's order contract computed as data: every (epoch, doc)
    // draws a 63-bit md5 rank from "epoch:doc_id", shards by rank mod 8,
    // and takes its within-shard position from the rank order. Each
    // epoch reshuffles (the hash input includes the epoch) yet replays
    // bit-for-bit on any engine, any partitioning, any retry — the q65
    // sampling determinism applied to ORDER. No global sort anywhere:
    // the only window is partitioned by (epoch, shard), i.e. 16
    // independent rank sequences. ----
    "q208_epoch_shuffle" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("epoch"), col("shard")).orderBy(col("h"), col("doc_id"))
      t(s, dir, "documents").select(col("doc_id"))
        .withColumn("epoch", explode(expr("sequence(0L, 1L)")))
        .withColumn("h", call_function("md5_lower64",
            concat(col("epoch").cast(StringType), lit(":"),
              col("doc_id").cast(StringType)))
          .bitwiseAND(lit(0x7FFFFFFFFFFFFFFFL)))
        .withColumn("shard", col("h") % 8L)
        .withColumn("pos", row_number().over(w).cast(LongType))
        .select(col("epoch"), col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("epoch"), col("shard"), col("pos"))
    }),

    // ---- q290: Shapley coverage attribution — the fair-division
    // answer to "which source is WORTH paying for": each source's
    // Shapley value of the corpus-coverage game over distinct word-
    // trigram shingles (the q24/q114 content unit — unigram types are
    // template-collapsed on this corpus, q283). For a coverage game
    // the exponential Shapley sum collapses to a closed form — a unit
    // held by k sources pays 1/k to each holder (the probability that
    // holder is first among the k in a random arrival order) — so the
    // exact game-theoretic attribution is ONE keyed aggregate over the
    // (source, shingle) distinct set, no 2^n subset walk. Generalizes
    // q223's leave-one-out (which under-credits redundant-but-useful
    // sources) with interaction-aware credit; n_exclusive is the k=1
    // slice (what you lose outright if the source is dropped). Shares
    // nano-quantized (round(1e9/k)) before the order-free sum. ----
    "q290_shapley_coverage" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val st = t(s, dir, "documents")
        .select(col("source"),
          explode(expr("shingle_set(text, 3)")).as("tok"))
        .distinct()
      val kt = st.groupBy(col("tok")).agg(count(lit(1)).as("k"))
      val tot = kt.agg(count(lit(1)).as("total_types"))
      st.join(kt, Seq("tok"))
        .withColumn("shq",
          round(lit(1.0e9) / col("k").cast(DoubleType)).cast(LongType))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_types"),
          sum((col("k") === 1L).cast(LongType)).as("n_exclusive"),
          sum(col("shq")).as("sq"))
        .crossJoin(broadcast(tot))
        .select(col("source"), col("n_types"), col("n_exclusive"),
          (col("sq").cast(DoubleType) / lit(1.0e9)).as("shapley_types"),
          (col("sq").cast(DoubleType) / lit(1.0e9) /
            col("total_types").cast(DoubleType)).as("shapley_share"))
        .orderBy(col("source"))
    }),

    // ---- q291: greedy max-coverage selection — the submodular
    // curation pass (facility-location family): pick 5 documents that
    // together cover the most distinct word-trigram shingles, by the
    // classic 1−1/e greedy —
    // each round scores every remaining doc's MARGINAL gain (types not
    // yet covered) and takes the argmax (gain desc, doc_id tie-break).
    // The diverse-seed selection used for eval-set construction and
    // k-center-style corpus summaries. Five unrolled rounds, each one
    // anti-join + keyed aggregate + a TakeOrdered(1) — corpus-shaped
    // work per round, covered-set state is a types-table, never driver
    // state. Exact integer gains; coverage is the one division. ----
    "q291_greedy_coverage" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val dt = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(expr("shingle_set(text, 3)")).as("tok"))
        .distinct().localCheckpoint()
      val tot = dt.select(col("tok")).distinct()
        .agg(count(lit(1)).as("total_types"))
      var selected = Seq.empty[org.apache.spark.sql.DataFrame]
      var sids: Option[org.apache.spark.sql.DataFrame] = None
      var covered: Option[org.apache.spark.sql.DataFrame] = None
      var r = 1
      while (r <= 5) {
        val remaining = sids match {
          case Some(ids) => dt.join(broadcast(ids), Seq("doc_id"), "left_anti")
          case None => dt
        }
        // LEFT join + conditional count (not an anti-join): a remaining
        // doc whose every type is already covered must stay in the
        // argmax with gain 0 — the saturation rounds are part of the
        // report, not silently dropped rows
        val fresh = covered match {
          case Some(c) => remaining.join(
            c.withColumn("__cov", lit(1L)), Seq("tok"), "left")
          case None => remaining.withColumn("__cov", lit(null).cast(LongType))
        }
        val pick = fresh.groupBy(col("doc_id"))
          .agg(sum(when(col("__cov").isNull, 1L).otherwise(0L)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id"))
          .limit(1).localCheckpoint()
        val newCov = (covered match {
          case Some(c) => c.unionAll(
            dt.join(broadcast(pick.select(col("doc_id"))), Seq("doc_id"))
              .select(col("tok")))
          case None => dt.join(broadcast(pick.select(col("doc_id"))),
            Seq("doc_id")).select(col("tok"))
        }).distinct().localCheckpoint()
        val cum = newCov.agg(count(lit(1)).as("cum_types"))
        selected = selected :+ pick.crossJoin(broadcast(cum))
          .select(lit(r.toLong).as("rank"), col("doc_id"), col("gain"),
            col("cum_types"))
        sids = Some(sids.map(_.unionAll(pick.select(col("doc_id"))))
          .getOrElse(pick.select(col("doc_id"))).localCheckpoint())
        covered = Some(newCov)
        r += 1
      }
      selected.reduce(_ unionAll _)
        .crossJoin(broadcast(tot))
        .select(col("rank"), col("doc_id"), col("gain"), col("cum_types"),
          (col("cum_types").cast(DoubleType) /
            col("total_types").cast(DoubleType)).as("coverage"))
        .orderBy(col("rank"))
    }),

    // ---- q298: prefix-cache savings estimator — the serving-cost
    // planner behind vLLM-style prefix caching / prompt dedup: group
    // prompts by their first-k-token prefix (k ∈ {4, 8, 16}) and report
    // how many prefill tokens a shared KV-cache saves — (g−1)·k per
    // g-sized group — against the eligible token volume. Rising
    // saved_frac with k = templated prompt traffic (cache wins);
    // flat ≈ 0 = unique prompts (don't bother). Pure keyed aggregates
    // over an array-slice projection: one shuffle per k on the prefix
    // string, map-side combined, linear at any corpus. Docs shorter
    // than k tokens are excluded from that k's row (their prefix is
    // not k tokens — exact semantics, documented). ----
    "q298_prefix_cache" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "documents").select(
        expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')")
          .as("w"))
      val ks = Seq(4, 8, 16)
      ks.map { k =>
        val elig = base.filter(size(col("w")) >= k)
          .select(array_join(slice(col("w"), 1, k), " ").as("pfx"),
            size(col("w")).cast(LongType).as("ntok"))
        val groups = elig.groupBy(col("pfx"))
          .agg(count(lit(1)).as("g"), sum(col("ntok")).as("gt"))
        groups.agg(
            lit(k.toLong).as("k"),
            sum(col("g")).as("n_docs"),
            count(lit(1)).as("n_groups"),
            sum(when(col("g") >= 2L, col("g")).otherwise(0L))
              .as("shared_docs"),
            sum((col("g") - 1L) * lit(k.toLong)).as("saved_tokens"),
            sum(col("gt")).as("total_tokens"))
          .select(col("k"), col("n_docs"), col("n_groups"),
            col("shared_docs"), col("saved_tokens"), col("total_tokens"),
            (col("saved_tokens").cast(DoubleType) /
              col("total_tokens").cast(DoubleType)).as("saved_frac"))
      }.reduce(_ unionAll _).orderBy(col("k"))
    }),

    // ---- q114: pairwise corpus-overlap audit — exact Jaccard of the
    // distinct word-trigram shingle sets of every source pair (the
    // contamination/provenance matrix run before mixing corpora). One
    // shingle-keyed self-join of the (shingle, source)-distinct set: a
    // shingle fans out only across the ≤ #sources sources containing it,
    // never across documents — no cartesian at any scale. ----
    "q114_source_overlap" -> ((s, dir) => {
      graft.api.Graft.shingleOverlap(t(s, dir, "documents"), "text", "source", 3)
        .select(col("source_a"), col("source_b"), col("inter"), col("union_size"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // ---- q184: KMV-sketch source overlap — q114's matrix from 128-long
    // mergeable sketches instead of a corpus-wide shingle join. The
    // DuckDB oracle recomputes every pair-union sketch FROM RAW SHINGLES
    // while the Spark plan derives it from the per-source sketches only,
    // so a hash match proves the KMV merge/membership algebra (k smallest
    // of a sketch union = sketch of the set union), not just the final
    // arithmetic. Unlike the HLL family (q104), KMV output is a pure
    // function of the hash SET — partition-invariant at any cardinality,
    // no promotion-mode caveat — which is why it can be hard-gated
    // without a golden. ----
    "q184_kmv_overlap" -> ((s, dir) => {
      graft.api.Graft.kmvSourceOverlap(t(s, dir, "documents"), "text", "source")
        .orderBy(col("source_a"), col("source_b"))
    }),

    // ---- q203: corpus-yield ledger — the per-source funnel report a
    // training-data pipeline publishes with every release: raw docs →
    // exact-dedup survivors (canonical = min doc_id per normalized-text
    // fingerprint, so cross-source duplicates count once, at their
    // canonical source) → length-quality survivors → decontamination
    // survivors (fingerprint overlap with the held-out slice, doc_id %
    // 97 = 0 playing eval), plus surviving whitespace-token volume.
    // Every stage is an already-oracled primitive (q23 dedup rule, q58
    // decontamination rule); the ledger gates their COMPOSITION and the
    // per-stage loss accounting. All counts exact; one fingerprint
    // shuffle + broadcast eval set. ----
    "q203_corpus_yield" -> ((s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      // materialize the fingerprinted projection ONCE: four consumer
      // subtrees (canonical rule, kept join probe, eval slice, raw
      // counts) would otherwise each re-scan the corpus and re-md5
      // every document (review finding)
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"source", $"text", $"n_chars",
          graft.api.Graft.normFp($"text").as("fp"))
        .localCheckpoint()
      val canon = docs.groupBy($"fp").agg(min($"doc_id").as("keep_id"))
        .withColumnRenamed("fp", "cfp")
      val kept = docs.join(canon,
        docs("fp") === canon("cfp") && docs("doc_id") === canon("keep_id"))
        .select(docs("doc_id"), docs("source"), docs("text"), docs("fp"),
          docs("n_chars"))
      val evalFps = docs.filter($"doc_id" % 97 === 0)
        .select($"fp".as("efp")).distinct()
      val ledger = docs.groupBy($"source").agg(count(lit(1)).as("n_raw"))
      val dedup = kept.groupBy($"source").agg(count(lit(1)).as("n_dedup"))
      val qual = kept.filter($"n_chars" >= 100)
      val qualAgg = qual.groupBy($"source").agg(count(lit(1)).as("n_quality"))
      val clean = qual.join(evalFps, qual("fp") === evalFps("efp"), "left_anti")
      val cleanAgg = clean.groupBy($"source").agg(
        count(lit(1)).as("n_final"),
        sum(expr("text_stats(text).ws_tokens")).as("final_tokens"))
      ledger.join(dedup, Seq("source"), "left")
        .join(qualAgg, Seq("source"), "left")
        .join(cleanAgg, Seq("source"), "left")
        .select($"source", $"n_raw",
          coalesce($"n_dedup", lit(0L)).as("n_dedup"),
          coalesce($"n_quality", lit(0L)).as("n_quality"),
          coalesce($"n_final", lit(0L)).as("n_final"),
          coalesce($"final_tokens", lit(0L)).as("final_tokens"))
        .orderBy($"source")
    }),

    // ---- q201: incremental sketch maintenance — the workflow q184's
    // sketches exist FOR: two ingest batches (doc_id parity) build
    // per-source KMV sketches independently; the stored sketches merge
    // by pure array algebra (union → sort → first k, no raw data), and
    // the query asserts IN-BAND that the merged sketch equals the
    // full-corpus rebuild, per source. The oracle rebuilds the full
    // sketch from raw shingles and expects merge_equals_full = TRUE —
    // if the merge algebra dropped or invented a hash anywhere, the
    // boolean (and the sketch md5) flip and the gate goes red. ----
    "q201_kmv_incremental" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      def sk(df: org.apache.spark.sql.DataFrame) = df
        .select(col("source").as("__g"),
          explode(expr("shingle_set(`text`, 3)")).as("__s"))
        .select(col("__g"), call_function("md5_lower64", col("__s"))
          .bitwiseAND(lit(Long.MaxValue)).as("__h"))
        .groupBy(col("__g")).agg(call_function("kmv_agg128", col("__h")).as("sk"))
      val a = sk(docs.filter(col("doc_id") % 2 === 0)).withColumnRenamed("sk", "ska")
      val b = sk(docs.filter(col("doc_id") % 2 =!= 0)).withColumnRenamed("sk", "skb")
      val full = sk(docs).withColumnRenamed("sk", "skf")
      def md5Of(c: org.apache.spark.sql.Column) =
        md5(expr(s"concat_ws(',', transform(${c.toString}, x -> cast(x as string)))"))
      a.join(b, Seq("__g"), "full")
        .withColumn("merged", slice(array_sort(array_union(
          coalesce(col("ska"), expr("array()")),
          coalesce(col("skb"), expr("array()")))), 1, 128))
        .join(full, Seq("__g"))
        .select(col("__g").as("source"),
          size(col("merged")).cast(LongType).as("k_merged"),
          md5Of(col("merged")).as("sketch_md5"),
          (md5Of(col("merged")) === md5Of(col("skf"))).as("merge_equals_full"))
        .orderBy(col("source"))
    }),

    // ---- q251: popularity-corrected weighted negative sampling — the
    // word2vec unigram^0.75 rule: negatives drawn ∝ count^0.75 over the
    // vocabulary via the deterministic weighted-choice primitive
    // (md5(anchor:j) draws, bucket-interval lookup — q198's device, not
    // a range nested loop). c^0.75 is computed as sqrt(c·sqrt(c)):
    // IEEE sqrt is correctly rounded in BOTH engines, unlike pow, so
    // the quantized weights replay bit-for-bit. ----
    "q251_weighted_negative_sampling" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val toks = t(s, dir, "documents").select(
          explode(split(lower(col("text")), "[^a-z0-9]+")).as("__t"))
        .filter(col("__t") =!= "")
      val vocab = toks.groupBy(col("__t").as("token"))
        .agg(count(lit(1)).as("c"))
        .withColumn("wq", round(sqrt(col("c").cast(DoubleType) *
          sqrt(col("c").cast(DoubleType))) * lit(1.0e6)).cast(LongType))
      val draws = t(s, dir, "documents").filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("anchor_id"),
          explode(expr("sequence(1, 4)")).as("j"))
        .withColumn("j", col("j").cast(LongType))
        .withColumn("h", call_function("md5_lower64",
          concat(col("anchor_id").cast(StringType), lit(":"),
            col("j").cast(StringType))).bitwiseAND(lit(Long.MaxValue)))
      graft.api.Graft.weightedChoice(vocab.select(col("token"), col("wq")),
          "token", "wq", draws, "h")
        .withColumnRenamed("choice", "neg_token")
        .select(col("anchor_id"), col("j"), col("neg_token"))
        .orderBy(col("anchor_id"), col("j"))
    }),

    // ---- q189: contrastive negative sampling — every 10th doc anchors
    // k=4 hash-drawn partners from the full corpus (md5(id:j) mod N into
    // the dense id domain): the training-pair generator for contrastive
    // embedding runs, with no RNG state — each sample a pure function of
    // (anchor, j), so stable under repartition/retry/append and exactly
    // replayable by the oracle. Self-collisions drop, never redraw. ----
    "q189_negative_sampling" -> ((s, dir) => {
      // Densify FIRST (r9): real corpora (and the sf1 ladder's shifted
      // key ranges) have sparse doc ids, and negativeSample's dense
      // [0, N) contract is now enforced in-plan — globalRank satisfies
      // it by construction; the dense id maps back to the original
      // doc_id for both the anchor and the drawn partner, so the output
      // is id-scheme-independent. At a dense-0-based sf the mapping is
      // the identity and the result is unchanged.
      val docs = t(s, dir, "documents")
      val dense = graft.api.Graft.globalRank(
          docs.select(col("doc_id"), col("source"), col("lang")),
          Seq("doc_id"), "__rk")
        .withColumn("did", col("__rk") - 1L).drop("__rk")
      graft.api.Graft.negativeSample(dense, "did", 4,
          Seq("doc_id", "source", "lang"),
          anchorFilter = col("doc_id") % 10 === 0)
        .join(dense.select(col("did").as("anchor_id"),
          col("doc_id").as("__anchor_doc")), Seq("anchor_id"))
        .select(col("__anchor_doc").as("anchor_id"), col("j"),
          col("neg_doc_id").as("neg_id"),
          col("neg_source"), col("neg_lang"))
        .orderBy(col("anchor_id"), col("j"))
    }),

    // ---- q191: rendezvous (HRW) sharding — per-shard populations under
    // 8 shards, under 9 shards, and the docs each old shard loses when
    // shard 8 joins. The gated numbers exhibit THE property mod-N
    // sharding lacks: movement only INTO the new shard (n9 = n8 −
    // moved_out for every old shard; Σ moved_out = n9(new shard)), at
    // ~1/9 of keys. Assignment is a pure projection (in-expression
    // rendezvous fold, no explode), so resharding audits cost two
    // projections + one keyed count. ----
    "q191_hrw_sharding" -> ((s, dir) => {
      val g = graft.api.Graft
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val a8 = g.hrwAssign(docs, "doc_id", 8, "s8")
      val a9 = g.hrwAssign(a8, "doc_id", 9, "s9")
      val agg8 = a9.groupBy(col("s8").as("shard"))
        .agg(count(lit(1)).as("n8"),
          count(when(col("s8") =!= col("s9"), 1)).as("moved_out"))
      val agg9 = a9.groupBy(col("s9").as("shard")).agg(count(lit(1)).as("n9"))
      val shards = docs.sparkSession.range(9).select(col("id").as("shard"))
      shards.join(agg8, Seq("shard"), "left").join(agg9, Seq("shard"), "left")
        .select(col("shard"),
          coalesce(col("n8"), lit(0L)).as("n8"),
          coalesce(col("moved_out"), lit(0L)).as("moved_out"),
          coalesce(col("n9"), lit(0L)).as("n9"))
        .orderBy(col("shard"))
    }),

    // ---- q115: DSIR importance weighting — hashed-ngram log-likelihood
    // ratio of each doc under a target-domain model (source src0) vs the
    // raw corpus (Xie et al. 2023): the data-selection scorer. Both
    // models are one 1024-row broadcast aggregate; the ratio is integer
    // cross-multiplied under ONE double division inside ln; per-doc sums
    // nano-quantized (order-free). ----
    "q115_dsir_weight" -> ((s, dir) => {
      graft.api.Graft.dsirWeight(t(s, dir, "documents"), "text", "doc_id",
          col("source") === "src0")
        .select(col("doc_id"), col("n_grams"),
          round(col("dsir"), 6).as("dsir"))
        .orderBy(col("doc_id"))
    }),

    // ---- q62: overlapping character chunking (500/100) — RAG/pretrain
    // context-window splitter. Chunk content pinned via md5 so the output
    // stays compact while hash-checking every byte of every chunk. ----
    "q62_chunk_docs" -> ((s, dir) => {
      graft.api.Graft.chunkDocs(t(s, dir, "documents"), "text", 500, 100)
        .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
          col("chunk_len"), md5(col("chunk")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // ---- q63: token-frequency vocabulary, deterministic global top-1000.
    // Partial+final count agg on the token, TakeOrderedAndProject top-k —
    // no global sort at any corpus size. ----
    "q63_vocab_topk" -> ((s, dir) =>
      graft.api.Graft.vocabulary(t(s, dir, "documents"), "text", 1000)),

    // ---- q64: per-source document cap — keep the 50 longest docs per
    // source (ties by doc_id), the per-domain quota of web-corpus
    // curation. ----
    "q64_source_cap" -> ((s, dir) => {
      graft.api.Graft.capPerGroup(t(s, dir, "documents"), "source",
          Seq(col("n_chars").desc, col("doc_id")), 50)
        .select(col("source"), col("doc_id"), col("n_chars").cast(LongType).as("n_chars"),
          col("rk"))
        .orderBy(col("source"), col("rk"))
    }),

    // ---- q65: exact 25-per-language stratified sample, deterministic by
    // cross-engine md5 rank (not RNG) — stable under repartition/retry. ----
    "q65_stratified_sample" -> ((s, dir) => {
      graft.api.Graft.stratifiedSample(t(s, dir, "documents"), "lang", "doc_id", 25)
        .select(col("lang"), col("doc_id"), col("rk"))
        .orderBy(col("lang"), col("rk"))
    }),

    // ---- q66: cross-document repeated word 8-grams — the detection half
    // of exact-substring dedup (Lee et al. 2022): any 8-gram appearing in
    // ≥ 2 documents marks a repeated span a substring-dedup pass would
    // cut. One shuffle on the shingle; per-row shingling is the codegen'd
    // shingle_set kernel, and the agg is partial+final (hot shingles
    // combine map-side). ----
    "q66_common_ngrams" -> ((s, dir) => {
      val sh = graft.api.Graft.shingles(t(s, dir, "documents"), "text", "doc_id", 8)
      sh.groupBy(col("s"))
        .agg(count(lit(1)).as("n_docs"), // shingles are per-doc distinct
          min(col("__id")).as("first_doc"), max(col("__id")).as("last_doc"))
        .filter(col("n_docs") >= 2)
        // counting keys on the NUL-joined shingle (collision-proof);
        // display re-joins with '_' — display-colliding grams can tie on
        // (s, first_doc), so the full column set orders the rows
        .select(translate(col("s"), "\u0000", "_").as("s"),
          col("n_docs"), col("first_doc"), col("last_doc"))
        .orderBy(col("s"), col("first_doc"), col("last_doc"), col("n_docs"))
    }),

    // ---- q142: n-gram novelty score — the per-DOC inverse of q66's
    // per-GRAM view: what fraction of a document's word 8-grams appear in
    // no other document. The memorization/boilerplate signal curation
    // pipelines rank on (high novelty = fresh content, low = templated).
    // One gram-keyed df aggregate + one join back + one doc-keyed agg —
    // the q24-family shuffle shape; ratios are exact integers under one
    // double division, and docs too short for any 8-gram keep a
    // NULL-novelty row (the q113 "no evidence" contract). ----
    "q142_ngram_novelty" -> ((s, dir) => {
      val sh = graft.api.Graft.shingles(t(s, dir, "documents"), "text", "doc_id", 8)
      val df = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val per = sh.join(df, Seq("s"))
        .groupBy(col("__id").as("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      t(s, dir, "documents").select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_unique"), lit(0L)).as("n_unique"),
          (col("n_unique").cast(DoubleType) /
            col("n_grams").cast(DoubleType)).as("novelty"))
        .orderBy(col("doc_id"))
    }),

    // ---- q98: the REMOVAL half of exact-substring dedup (q66 detects,
    // this cuts): every word position covered by a cross-document word
    // 8-gram is removed and the document reassembled from the surviving
    // words — Lee et al. 2022's dedup applied at span granularity, not
    // whole-doc. Cleaned text itself is hash-checked, so the position
    // bookkeeping (overlapping spans, boundary words, fully-boilerplate
    // docs → empty string) is value-verified. ----
    "q98_remove_common_spans" -> ((s, dir) => {
      graft.api.Graft.removeCommonSpans(t(s, dir, "documents"), "text",
          "doc_id", n = 8, minDf = 2)
        .orderBy(col("doc_id"))
    }),

    // ---- q73: the same per-source cap through the SALTED two-phase
    // top-k — the hot-group remedy. The oracle is q64's plain single-
    // window SQL, so the remedy is correctness-gated (result AND rank
    // must equal the unsalted form), mirroring q56/q68's pattern of
    // gating each scale remedy against its naive twin. ----
    "q73_source_cap_salted" -> ((s, dir) => {
      graft.api.Graft.capPerGroupSalted(t(s, dir, "documents"), "source",
          Seq(col("n_chars").desc, col("doc_id")), 50, saltOn = col("doc_id"))
        .select(col("source"), col("doc_id"), col("n_chars").cast(LongType).as("n_chars"),
          col("rk"))
        .orderBy(col("source"), col("rk"))
    }),

    // ---- q67: int8 scalar quantization of the embedding table — per-
    // vector scale + exact integer invariants of the code array (sum, L1,
    // saturation count). Integer outputs make the lossy compression
    // hash-checkable. ----
    "q67_quantize_int8" -> ((s, dir) => {
      graft.api.Graft.quantizeInt8(t(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"),
          round(col("maxabs"), 6).as("maxabs"),
          expr("aggregate(codes, cast(0 as bigint), (a, x) -> a + x)").as("code_sum"),
          expr("aggregate(codes, cast(0 as bigint), (a, x) -> a + abs(x))").as("code_l1"),
          expr("aggregate(codes, cast(0 as bigint), (a, x) -> a + cast(x = 127 as bigint))")
            .as("n_sat"))
        .orderBy(col("vec_id"))
    }),

    // ---- q69: TF-IDF top-3 terms per document — the classic keyword
    // extractor. tf and df are one shuffle each on the token; N rides the
    // plan as a broadcast 1-row aggregate (no driver-side count), the
    // top-3 is a per-doc window. Scores are ranked RAW (tf·ln(N/df),
    // identical doubles both engines) and only rounded for output. ----
    "q69_tfidf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = docs
        .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("token"))
        .filter(col("token") =!= "")
      val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val total = docs.agg(count(lit(1)).as("n_total"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
      tf.join(dfreq, "token").crossJoin(broadcast(total))
        .withColumn("score",
          col("tf") * log(col("n_total").cast(DoubleType) / col("df").cast(DoubleType)))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("token"), round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"), col("rk"))
    }),

    // ---- q70: per-label embedding centroids — the cluster-profile /
    // class-prototype aggregation. posexplode → (label, dim) partial+final
    // agg. Components are quantized to integer micro-units before summing:
    // integer addition is associative (shuffle-order-proof) AND
    // cross-engine exact — a decimal cast is NOT, because Spark casts
    // float→decimal via the shortest decimal string while DuckDB expands
    // the exact binary value (bit at the 11th digit here). ----
    "q70_label_centroids" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("x").cast(DoubleType) * lit(1000000.0)).cast(LongType))
            .as("sum_micro"))
        .select(col("label"), col("pos").cast(LongType).as("pos"), col("n"),
          col("sum_micro"),
          (col("sum_micro").cast(DoubleType) / lit(1000000.0) / col("n")).as("mean"))
        .orderBy(col("label"), col("pos"))
    }),

    // ---- q263: URL canonicalization + eTLD+1 — the CommonCrawl hygiene
    // step per-URL dedup keys and per-SITE quotas (q64/q73) both depend
    // on: messy synthetic URLs (upper-case scheme/host, www., default
    // port, utm_* tracking params, fragment, a co.uk multi-part suffix
    // every third doc) are canonicalized by Graft.normalizeUrls' fixed
    // regexp chains — pure per-row projections, exact strings, no
    // floats anywhere. ----
    "q263_url_normalize" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"))
        .withColumn("url", concat(
          lit("HTTPS://WWW."), upper(col("source")),
          when(col("doc_id") % 3 === 0, lit(".Example.CO.UK"))
            .otherwise(lit(".Example.COM")),
          lit(":443/Docs/"), col("doc_id").cast(StringType),
          lit("?utm_source=feed&ref="), (col("doc_id") % 7).cast(StringType),
          lit("&utm_campaign=q263&id="), col("doc_id").cast(StringType),
          lit("#sec")))
      graft.api.Graft.normalizeUrls(d, "url")
        .select(col("doc_id"), col("scheme"), col("host"), col("etld1"),
          col("url_norm"))
        .orderBy(col("doc_id"))
    }))

  /** q291 oracle: the same 5 greedy rounds unrolled as CTEs — anti-join
    * marginal gains, (gain DESC, doc_id) argmax, UNION-accumulated
    * covered set, scalar-subquery cumulative counts. */
  private def greedyCoverageSql(k: Int): String = {
    val rounds = (1 to k).map { r =>
      val pick =
        s"""s$r AS MATERIALIZED (
           |  SELECT doc_id, gain FROM g$r
           |  ORDER BY gain DESC, doc_id LIMIT 1),
           |c$r AS MATERIALIZED (""".stripMargin +
        (if (r == 1) """
           |  SELECT DISTINCT dt.tok FROM dt JOIN s1 USING (doc_id))""".stripMargin
         else s"""
           |  SELECT tok FROM c${r - 1}
           |  UNION
           |  SELECT dt.tok FROM dt JOIN s$r USING (doc_id))""".stripMargin)
      val gains = if (r == 1)
        """g1 AS (
          |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
          |  FROM dt GROUP BY doc_id),""".stripMargin
      else {
        val prevIds = (1 until r).map(i => s"SELECT doc_id FROM s$i")
          .mkString(" UNION ALL ")
        s"""g$r AS (
           |  SELECT dt.doc_id,
           |    CAST(COUNT(*) FILTER (WHERE cc.tok IS NULL) AS BIGINT) AS gain
           |  FROM dt LEFT JOIN c${r - 1} cc ON cc.tok = dt.tok
           |  WHERE dt.doc_id NOT IN ($prevIds)
           |  GROUP BY dt.doc_id),""".stripMargin
      }
      gains + "\n" + pick
    }.mkString(",\n")
    val rows = (1 to k).map(r =>
      s"""SELECT $r AS rank, doc_id, gain,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c$r) AS cum_types
         |FROM s$r""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH tl AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
       |dt AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |    t[i] || chr(0) || t[i+1] || chr(0) || t[i+2] AS tok
       |  FROM (SELECT doc_id, t,
       |          unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
       |        FROM tl)),
       |tot AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS total_types
       |        FROM dt),
       |$rounds,
       |rows_out AS (
       |$rows)
       |SELECT CAST(rank AS BIGINT) AS rank, doc_id, gain, cum_types,
       |  CAST(cum_types AS DOUBLE) / CAST(total_types AS DOUBLE) AS coverage
       |FROM rows_out CROSS JOIN tot ORDER BY rank""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // Shapley twin: the closed-form coverage-game credit — identical
    // tokenization, per-type holder counts, nano-quantized 1/k shares
    "q290_shapley_coverage" ->
      """WITH tl AS (
        |  SELECT source, string_split(trim(text), ' ') AS t FROM documents),
        |st AS (
        |  SELECT DISTINCT source,
        |    t[i] || chr(0) || t[i+1] || chr(0) || t[i+2] AS tok
        |  FROM (SELECT source, t,
        |          unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
        |        FROM tl)),
        |kt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS k
        |       FROM st GROUP BY tok),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_types FROM kt),
        |j AS (
        |  SELECT st.source, kt.k,
        |    CAST(ROUND(1000000000.0 / CAST(k AS DOUBLE)) AS BIGINT) AS shq
        |  FROM st JOIN kt USING (tok)),
        |ag AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(COUNT(*) FILTER (WHERE k = 1) AS BIGINT) AS n_exclusive,
        |    CAST(SUM(shq) AS BIGINT) AS sq
        |  FROM j GROUP BY source)
        |SELECT source, n_types, n_exclusive,
        |  CAST(sq AS DOUBLE) / 1000000000.0 AS shapley_types,
        |  CAST(sq AS DOUBLE) / 1000000000.0 / CAST(total_types AS DOUBLE)
        |    AS shapley_share
        |FROM ag CROSS JOIN tot ORDER BY source""".stripMargin,

    "q291_greedy_coverage" -> greedyCoverageSql(5),

    // prefix-cache twin: identical tokenization, list-slice prefixes,
    // the same per-k eligibility rule and savings arithmetic
    "q298_prefix_cache" -> {
      val one = (k: Int) =>
        s"""SELECT CAST($k AS BIGINT) AS k,
           |  CAST(SUM(g) AS BIGINT) AS n_docs,
           |  CAST(COUNT(*) AS BIGINT) AS n_groups,
           |  CAST(SUM(CASE WHEN g >= 2 THEN g ELSE 0 END) AS BIGINT)
           |    AS shared_docs,
           |  CAST(SUM((g - 1) * $k) AS BIGINT) AS saved_tokens,
           |  CAST(SUM(gt) AS BIGINT) AS total_tokens,
           |  CAST(SUM((g - 1) * $k) AS DOUBLE) / CAST(SUM(gt) AS DOUBLE)
           |    AS saved_frac
           |FROM (
           |  SELECT array_to_string(w[1:$k], ' ') AS pfx,
           |    CAST(COUNT(*) AS BIGINT) AS g,
           |    CAST(SUM(len(w)) AS BIGINT) AS gt
           |  FROM tl WHERE len(w) >= $k GROUP BY pfx)""".stripMargin
      s"""WITH tl AS (
         |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |    x -> x <> '') AS w
         |  FROM documents)
         |${Seq(4, 8, 16).map(one).mkString("\nUNION ALL\n")}
         |ORDER BY k""".stripMargin
    },

    // q263 twin: the SAME regexp chains (no backreferences — they are
    // not portable between Java's $1 and RE2's \1), with 'g' flags
    // exactly where the Spark side's replace-all semantics need them
    "q263_url_normalize" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.' || upper(source) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN '.Example.CO.UK' ELSE '.Example.COM' END) ||
        |    ':443/Docs/' || CAST(doc_id AS VARCHAR) ||
        |    '?utm_source=feed&ref=' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '&utm_campaign=q263&id=' || CAST(doc_id AS VARCHAR) || '#sec' AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM raw),
        |parts AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) AS scheme,
        |    lower(regexp_extract(u, '^[A-Za-z]+://([^/?#]+)', 1)) AS hp,
        |    regexp_extract(u, '^[A-Za-z]+://[^/?#]+(.*)$', 1) AS pq
        |  FROM s1),
        |hosted AS (
        |  SELECT doc_id, scheme,
        |    regexp_replace(
        |      CASE WHEN scheme = 'https' THEN regexp_replace(hp, ':443$', '')
        |           WHEN scheme = 'http' THEN regexp_replace(hp, ':80$', '')
        |           ELSE hp END, '^www\.', '') AS host,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(pq, '&utm_[A-Za-z0-9_]*=[^&#]*', '', 'g'),
        |        '\?utm_[A-Za-z0-9_]*=[^&#]*&', '?'),
        |      '\?utm_[A-Za-z0-9_]*=[^&#]*$', '') AS pq2
        |  FROM parts),
        |np AS (SELECT *, regexp_replace(host, ':[0-9]+$', '') AS hnp FROM hosted)
        |SELECT doc_id, scheme, host,
        |  CASE WHEN regexp_extract(hnp, '([^.]+\.(?:co\.uk|com|org|net|io))$', 1) <> ''
        |       THEN regexp_extract(hnp, '([^.]+\.(?:co\.uk|com|org|net|io))$', 1)
        |       ELSE regexp_extract(hnp, '([^.]+\.[^.]+)$', 1) END AS etld1,
        |  scheme || '://' || host || pq2 AS url_norm
        |FROM np ORDER BY doc_id""".stripMargin,

    // epoch-shuffle twin: identical "epoch:doc_id" md5 rank
    // (md5_lower64 & Long.MaxValue ≡ md5_number_lower & 2^63−1 mask),
    // mod-8 shard, per-(epoch, shard) rank order
    "q208_epoch_shuffle" ->
      """WITH x AS (
        |  SELECT doc_id, unnest([0, 1]) AS epoch FROM documents
        |), h AS (
        |  SELECT epoch, doc_id,
        |    CAST(md5_number_lower(CAST(epoch AS VARCHAR) || ':' ||
        |      CAST(doc_id AS VARCHAR)) & 9223372036854775807::UBIGINT AS BIGINT) AS h
        |  FROM x)
        |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
        |  CAST(h % 8 AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY epoch, h % 8 ORDER BY h, doc_id)
        |    AS BIGINT) AS pos
        |FROM h ORDER BY epoch, shard, pos""".stripMargin,

    // DSIR twin: identical tokenization (q113's), unigram+bigram feature
    // stream, 1023-mask md5 buckets, integer cross-multiplied smoothed
    // ratio under one double division, nano-quantized per-doc ln sums
    "q115_dsir_weight" ->
      """WITH tl AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, source, unnest(w) AS g FROM tl
        |  UNION ALL
        |  SELECT doc_id, source, w[i] || ' ' || w[i + 1] AS g
        |  FROM (SELECT doc_id, source, w, unnest(range(1, len(w))) AS i
        |        FROM tl WHERE len(w) >= 2)),
        |b AS (
        |  SELECT doc_id, source,
        |    (md5_number_lower(g) & 1023::UBIGINT) AS bk
        |  FROM grams),
        |counts AS (
        |  SELECT bk, COUNT(CASE WHEN source = 'src0' THEN 1 END) AS ct,
        |    COUNT(*) AS cr
        |  FROM b GROUP BY bk),
        |tot AS (
        |  SELECT COUNT(CASE WHEN source = 'src0' THEN 1 END) + 1024 AS ntb,
        |    COUNT(*) + 1024 AS nrb
        |  FROM b),
        |scored AS (
        |  SELECT doc_id, COUNT(*) AS n_grams,
        |    CAST(SUM(CAST(ROUND(ln(CAST((ct + 1) * nrb AS DOUBLE) /
        |        CAST((cr + 1) * ntb AS DOUBLE)) * 1000000000.0) AS BIGINT)) AS DOUBLE)
        |      / 1000000000.0 AS dsir
        |  FROM b JOIN counts USING (bk) CROSS JOIN tot
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
        |  ROUND(dsir, 6) AS dsir
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN scored USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // source-overlap twin: the q52 shingle formulation (space-split
    // tokens, chr(0)-joined trigrams, DISTINCT per source), exact integer
    // inter/union, jaccard as ONE double division
    "q114_source_overlap" ->
      """WITH toks AS (
        |  SELECT source, string_split(trim(text), ' ') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT source, t[i] || chr(0) || t[i+1] || chr(0) || t[i+2] AS s
        |  FROM (SELECT source, t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
        |        FROM toks)),
        |sizes AS (SELECT source, COUNT(*) AS d FROM sh GROUP BY source),
        |inter AS (
        |  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, inter,
        |  sa.d + sb.d - inter AS union_size,
        |  ROUND(CAST(inter AS DOUBLE) / CAST(sa.d + sb.d - inter AS DOUBLE), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.source = source_a
        |JOIN sizes sb ON sb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,

    // KMV twin: same tokenization, but the oracle rebuilds each
    // per-source AND pair-union sketch from scratch with window row_number
    // — it never touches the sketch-merge path the Spark plan uses, so the
    // gate checks the algebra. Hash = low-64 md5 masked to 63 bits
    // (md5_lower64 & Long.MaxValue ≡ md5_number_lower & 9223372036854775807);
    // estimator doubles are the IDENTICAL IEEE chain both sides
    // ((k-1)·2^63/τ — 2^63 written out is exactly representable).
    "q184_kmv_overlap" ->
      """WITH toks AS (
        |  SELECT source, string_split(trim(text), ' ') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT source,
        |    CAST(md5_number_lower(t[i] || chr(0) || t[i+1] || chr(0) || t[i+2])
        |         & 9223372036854775807::UBIGINT AS BIGINT) AS h
        |  FROM (SELECT source, t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
        |        FROM toks)),
        |sk AS (
        |  SELECT source, h FROM (
        |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |    FROM sh) WHERE rn <= 128),
        |pairs AS (
        |  SELECT a.source AS sa, b.source AS sb
        |  FROM (SELECT DISTINCT source FROM sh) a
        |  JOIN (SELECT DISTINCT source FROM sh) b ON a.source < b.source),
        |cand AS (
        |  SELECT DISTINCT p.sa, p.sb, s.h
        |  FROM pairs p JOIN sk s ON s.source = p.sa OR s.source = p.sb),
        |uk AS (
        |  SELECT sa, sb, h FROM (
        |    SELECT sa, sb, h, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
        |    FROM cand) WHERE rn <= 128),
        |agg AS (
        |  SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS ku, MAX(h) AS tau
        |  FROM uk GROUP BY sa, sb),
        |rho AS (
        |  SELECT uk.sa, uk.sb, CAST(COUNT(*) AS BIGINT) AS rho
        |  FROM uk
        |  JOIN sk x ON x.source = uk.sa AND x.h = uk.h
        |  JOIN sk y ON y.source = uk.sb AND y.h = uk.h
        |  GROUP BY uk.sa, uk.sb)
        |SELECT a.sa AS source_a, a.sb AS source_b, a.ku, a.tau,
        |  CAST(COALESCE(r.rho, 0) AS BIGINT) AS rho,
        |  CASE WHEN a.ku < 128 THEN CAST(a.ku AS DOUBLE)
        |       ELSE CAST(127 AS DOUBLE) * 9.223372036854775808E18 / CAST(a.tau AS DOUBLE)
        |  END AS est_union,
        |  CAST(COALESCE(r.rho, 0) AS DOUBLE) *
        |    (CASE WHEN a.ku < 128 THEN CAST(a.ku AS DOUBLE)
        |          ELSE CAST(127 AS DOUBLE) * 9.223372036854775808E18 / CAST(a.tau AS DOUBLE)
        |     END) / CAST(a.ku AS DOUBLE) AS est_inter
        |FROM agg a LEFT JOIN rho r ON a.sa = r.sa AND a.sb = r.sb
        |ORDER BY source_a, source_b""".stripMargin,

    // negative-sampling twin: identical md5(id:j) mod N draw, identical
    // self-collision drop, partner payload via the same equi-join
    // r9: the twin densifies identically (0-based rank over doc_id), so
    // the draw hashes the dense id and both anchor/partner map back to
    // original doc ids — id-scheme-independent, identity at sf0.01
    // weighted-sampling twin: identical sqrt-chain weights, the same
    // token-ordered cumulative line and md5 draws — but the lookup is
    // the NAIVE interval theta join (no knowledge of the bucket device)
    "q251_weighted_negative_sampling" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text),
        |    '[^a-z0-9]+'), x -> x <> '')) AS t
        |  FROM documents),
        |v AS (SELECT t AS token, COUNT(*) AS c FROM toks GROUP BY t),
        |w AS (SELECT token,
        |        CAST(ROUND(sqrt(CAST(c AS DOUBLE) * sqrt(CAST(c AS DOUBLE)))
        |          * 1000000.0) AS BIGINT) AS wq
        |      FROM v),
        |cum AS (SELECT token, wq,
        |          CAST(SUM(wq) OVER (ORDER BY token
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS hi
        |        FROM w WHERE wq > 0),
        |tot AS (SELECT CAST(SUM(wq) AS BIGINT) AS W FROM w WHERE wq > 0),
        |d AS (
        |  SELECT doc_id AS anchor_id, CAST(j AS BIGINT) AS j,
        |    CAST((md5_number_lower(CAST(doc_id AS VARCHAR) || ':' ||
        |        CAST(j AS VARCHAR)) & 9223372036854775807::UBIGINT)
        |      % tot.W AS BIGINT) AS u
        |  FROM documents
        |  CROSS JOIN tot
        |  CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS j)
        |  WHERE doc_id % 10 = 0)
        |SELECT d.anchor_id, d.j, c.token AS neg_token
        |FROM d JOIN cum c ON d.u >= c.hi - c.wq AND d.u < c.hi
        |ORDER BY anchor_id, j""".stripMargin,

    "q189_negative_sampling" ->
      """WITH d AS (
        |  SELECT doc_id, source, lang,
        |    row_number() OVER (ORDER BY doc_id) - 1 AS did
        |  FROM documents),
        |nn AS (SELECT COUNT(*) AS n FROM documents),
        |draws AS (
        |  SELECT a.doc_id AS anchor_id, a.did AS adid, CAST(j AS BIGINT) AS j,
        |    CAST((md5_number_lower(CAST(a.did AS VARCHAR) || ':' || CAST(j AS VARCHAR))
        |          & 9223372036854775807::UBIGINT) % nn.n AS BIGINT) AS neg_did
        |  FROM d a
        |  CROSS JOIN nn
        |  CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS j)
        |  WHERE a.doc_id % 10 = 0)
        |SELECT anchor_id, j, p.doc_id AS neg_id, p.source AS neg_source,
        |  p.lang AS neg_lang
        |FROM draws JOIN d p ON p.did = draws.neg_did
        |WHERE neg_did <> adid
        |ORDER BY anchor_id, j""".stripMargin,

    // yield-ledger twin: q23's normalization/canonical rule, q58's
    // fingerprint decontamination, q31's token regex — composed
    "q203_corpus_yield" ->
      """WITH d AS (
        |  SELECT doc_id, source, text, n_chars,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |canon AS (SELECT fp, MIN(doc_id) AS keep_id FROM d GROUP BY fp),
        |kept AS (SELECT d.* FROM d
        |         JOIN canon ON canon.fp = d.fp AND canon.keep_id = d.doc_id),
        |evalf AS (SELECT DISTINCT fp FROM d WHERE doc_id % 97 = 0),
        |qual AS (SELECT * FROM kept WHERE n_chars >= 100),
        |clean AS (SELECT q.* FROM qual q
        |          WHERE NOT EXISTS (SELECT 1 FROM evalf e WHERE e.fp = q.fp)),
        |raw AS (SELECT source, COUNT(*) AS n_raw FROM d GROUP BY source),
        |dd AS (SELECT source, COUNT(*) AS n_dedup FROM kept GROUP BY source),
        |qq AS (SELECT source, COUNT(*) AS n_quality FROM qual GROUP BY source),
        |cc AS (SELECT source, COUNT(*) AS n_final,
        |         CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
        |           AS final_tokens
        |       FROM clean GROUP BY source)
        |SELECT raw.source, raw.n_raw,
        |  CAST(COALESCE(dd.n_dedup, 0) AS BIGINT) AS n_dedup,
        |  CAST(COALESCE(qq.n_quality, 0) AS BIGINT) AS n_quality,
        |  CAST(COALESCE(cc.n_final, 0) AS BIGINT) AS n_final,
        |  CAST(COALESCE(cc.final_tokens, 0) AS BIGINT) AS final_tokens
        |FROM raw
        |LEFT JOIN dd USING (source)
        |LEFT JOIN qq USING (source)
        |LEFT JOIN cc USING (source)
        |ORDER BY source""".stripMargin,

    // incremental-sketch twin: the full-corpus sketch rebuilt from raw
    // shingles; merge_equals_full is expected TRUE — the Spark side
    // computes it from its own two batch paths, so a broken merge flips
    // the boolean (and the md5) into a hash mismatch
    "q201_kmv_incremental" ->
      """WITH toks AS (
        |  SELECT source, string_split(trim(text), ' ') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT source,
        |    CAST(md5_number_lower(t[i] || chr(0) || t[i+1] || chr(0) || t[i+2])
        |         & 9223372036854775807::UBIGINT AS BIGINT) AS h
        |  FROM (SELECT source, t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
        |        FROM toks)),
        |sk AS (
        |  SELECT source, h FROM (
        |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        |    FROM sh) WHERE rn <= 128)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS k_merged,
        |  md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY h)) AS sketch_md5,
        |  TRUE AS merge_equals_full
        |FROM sk GROUP BY source
        |ORDER BY source""".stripMargin,

    // HRW twin: the oracle computes each rendezvous argmax with an
    // explode + window (semantically identical to the plan's
    // in-expression fold — same 63-bit-masked hash, same shard-index
    // tie-break)
    "q191_hrw_sharding" ->
      """WITH a8 AS (
        |  SELECT doc_id, s AS shard FROM (
        |    SELECT d.doc_id, ss.s, row_number() OVER (PARTITION BY d.doc_id
        |      ORDER BY (md5_number_lower(CAST(ss.s AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR))
        |                & 9223372036854775807::UBIGINT) DESC, ss.s) AS rn
        |    FROM documents d
        |    CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS s) ss)
        |  WHERE rn = 1),
        |a9 AS (
        |  SELECT doc_id, s AS shard FROM (
        |    SELECT d.doc_id, ss.s, row_number() OVER (PARTITION BY d.doc_id
        |      ORDER BY (md5_number_lower(CAST(ss.s AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR))
        |                & 9223372036854775807::UBIGINT) DESC, ss.s) AS rn
        |    FROM documents d
        |    CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS s) ss)
        |  WHERE rn = 1),
        |j AS (SELECT a8.doc_id, a8.shard AS s8, a9.shard AS s9
        |      FROM a8 JOIN a9 USING (doc_id)),
        |agg8 AS (SELECT s8 AS shard, COUNT(*) AS n8,
        |           COUNT(*) FILTER (WHERE s8 <> s9) AS moved_out
        |         FROM j GROUP BY 1),
        |agg9 AS (SELECT s9 AS shard, COUNT(*) AS n9 FROM j GROUP BY 1)
        |SELECT CAST(s.shard AS BIGINT) AS shard,
        |  CAST(COALESCE(agg8.n8, 0) AS BIGINT) AS n8,
        |  CAST(COALESCE(agg8.moved_out, 0) AS BIGINT) AS moved_out,
        |  CAST(COALESCE(agg9.n9, 0) AS BIGINT) AS n9
        |FROM (SELECT unnest(generate_series(0, 8)) AS shard) s
        |LEFT JOIN agg8 ON agg8.shard = s.shard
        |LEFT JOIN agg9 ON agg9.shard = s.shard
        |ORDER BY shard""".stripMargin,

    "q62_chunk_docs" ->
      """WITH c AS (SELECT doc_id, text, length(text) AS len
        |           FROM documents WHERE length(text) > 0)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |       CAST(i * 400 + 1 AS BIGINT) AS chunk_start,
        |       CAST(length(substr(text, CAST(i * 400 + 1 AS INT), 500)) AS BIGINT) AS chunk_len,
        |       md5(substr(text, CAST(i * 400 + 1 AS INT), 500)) AS chunk_md5
        |FROM (SELECT doc_id, text, unnest(generate_series(0, (len - 1) // 400)) AS i FROM c)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "q63_vocab_topk" ->
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
        |      FROM documents)
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 1000""".stripMargin,

    "q64_source_cap" ->
      """SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars, rk
        |FROM (SELECT source, doc_id, n_chars,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY source
        |               ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
        |      FROM documents)
        |WHERE rk <= 50 ORDER BY source, rk""".stripMargin,

    "q73_source_cap_salted" ->
      """SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars, rk
        |FROM (SELECT source, doc_id, n_chars,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY source
        |               ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
        |      FROM documents)
        |WHERE rk <= 50 ORDER BY source, rk""".stripMargin,

    "q65_stratified_sample" ->
      """SELECT lang, doc_id, rk
        |FROM (SELECT lang, doc_id,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |               ORDER BY (md5_number_lower(CAST(doc_id AS VARCHAR))
        |                           & 9223372036854775807::UBIGINT), doc_id) AS BIGINT) AS rk
        |      FROM documents)
        |WHERE rk <= 25 ORDER BY lang, rk""".stripMargin,

    "q98_remove_common_spans" ->
      """WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS wl FROM documents),
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
        |  FROM kept GROUP BY doc_id)
        |SELECT w.doc_id AS doc_id, CAST(len(wl) AS BIGINT) AS n_words,
        |       CAST(len(wl) - COALESCE(nk, 0) AS BIGINT) AS n_removed,
        |       COALESCE(cleaned, '') AS cleaned
        |FROM w LEFT JOIN reb ON w.doc_id = reb.doc_id
        |ORDER BY w.doc_id""".stripMargin,

    "q66_common_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    t[i] || chr(0) || t[i+1] || chr(0) || t[i+2] || chr(0) || t[i+3] || chr(0) ||
        |    t[i+4] || chr(0) || t[i+5] || chr(0) || t[i+6] || chr(0) || t[i+7] AS s
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i
        |        FROM toks)
        |)
        |SELECT replace(s, chr(0), '_') AS s, COUNT(*) AS n_docs,
        |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM sh GROUP BY s HAVING COUNT(*) >= 2 ORDER BY 1, first_doc, last_doc, n_docs""".stripMargin,

    // novelty twin: q66's shingle derivation, inverted to the per-doc
    // unseen-gram fraction; short docs fall out of the left join as
    // zero-gram NULL-novelty rows on both engines
    "q142_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    t[i] || chr(0) || t[i+1] || chr(0) || t[i+2] || chr(0) || t[i+3] || chr(0) ||
        |    t[i+4] || chr(0) || t[i+5] || chr(0) || t[i+6] || chr(0) || t[i+7] AS s
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i
        |        FROM toks)
        |), df AS (
        |  SELECT s, COUNT(*) AS df FROM sh GROUP BY s
        |), per AS (
        |  SELECT sh.doc_id, COUNT(*) AS n_grams,
        |         CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
        |  FROM sh JOIN df USING (s) GROUP BY sh.doc_id
        |)
        |SELECT d.doc_id, COALESCE(p.n_grams, 0) AS n_grams,
        |       COALESCE(p.n_unique, 0) AS n_unique,
        |       CAST(p.n_unique AS DOUBLE) / CAST(p.n_grams AS DOUBLE) AS novelty
        |FROM documents d LEFT JOIN per p USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // NULL/empty semantics mirror the Spark aggregate-with-seed forms
    // exactly: a NULL vector passes NULL through (no coalesce), an EMPTY
    // vector gets maxabs 0.0 and zero sums (aggregate's 0 seed ==
    // COALESCE over DuckDB's NULL-on-empty list_sum/list_max).
    "q67_quantize_int8" ->
      """SELECT vec_id, ROUND(m, 6) AS maxabs,
        |       CASE WHEN v IS NULL THEN NULL
        |            ELSE COALESCE(CAST(list_sum(codes) AS BIGINT), 0) END AS code_sum,
        |       CASE WHEN v IS NULL THEN NULL
        |            ELSE COALESCE(CAST(list_sum(list_transform(codes, x -> abs(x))) AS BIGINT), 0) END AS code_l1,
        |       CASE WHEN v IS NULL THEN NULL
        |            ELSE COALESCE(CAST(list_sum(list_transform(codes, x -> CAST(x = 127 AS BIGINT))) AS BIGINT), 0) END AS n_sat
        |FROM (SELECT vec_id, v, m,
        |        list_transform(v, x -> CAST(floor(CASE WHEN m = 0.0 THEN 0.0
        |                 ELSE x * 127.0 / m + 0.5 END) AS BIGINT)) AS codes
        |      FROM (SELECT vec_id, v,
        |              CASE WHEN v IS NULL THEN NULL
        |                   ELSE coalesce(list_max(list_transform(v, x -> abs(x))), 0.0) END AS m
        |            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |                  FROM embeddings)))
        |ORDER BY vec_id""".stripMargin,

    "q69_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE token <> '' GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
        |), n AS (SELECT COUNT(*) AS n_total FROM documents),
        |scored AS (
        |  SELECT doc_id, token,
        |         tf * ln(CAST(n_total AS DOUBLE) / CAST(df AS DOUBLE)) AS score
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n
        |)
        |SELECT doc_id, rk, token, ROUND(score, 6) AS score
        |FROM (SELECT doc_id, token, score,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |               ORDER BY score DESC, token) AS BIGINT) AS rk
        |      FROM scored)
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "q70_label_centroids" ->
      """SELECT label, CAST(i - 1 AS BIGINT) AS pos, COUNT(*) AS n,
        |       CAST(SUM(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_micro,
        |       CAST(SUM(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean
        |FROM (SELECT label, embedding,
        |        unnest(generate_series(1, len(embedding))) AS i
        |      FROM embeddings)
        |GROUP BY 1, 2 ORDER BY label, pos""".stripMargin
  )
}
