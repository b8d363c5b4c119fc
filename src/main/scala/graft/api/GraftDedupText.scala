package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Graft]] members: dedup, shingle/minhash families, similarity search, skew handling, bucketing, text quality, sampling.
  *
  * One of the six family slices of the operator API — `object Graft`
  * mixes them all in; call sites use `Graft.<member>` exactly as
  * before. Split round 13 purely for navigability (8.5k LoC in one
  * file); `private` members became `private[api]` so slices can share
  * helpers with zero behavior change.
  */
private[api] trait GraftDedupText { this: Graft.type =>


  // ------------------------------------------------------------- dedup

  /** THE canonical-dedup fingerprint: md5 of whitespace-collapsed,
    * lowercased, trimmed text. Every consumer of the exact-dedup rule
    * (dedupExact, dedupKeepBest, q23, the q203 yield ledger) derives its
    * fingerprint HERE so the normalization can never silently diverge
    * between the dedup and anything accounting for it. */
  def normFp(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** LSH dedup quality audit (q316) — the honesty gate on the MinHash
    * pipeline q25 ships: against brute-force ground truth (exact
    * Jaccard ≥ num/den over rep-level shingle sets), how many true
    * near-dup pairs do the 32×4 band collisions CATCH (recall — pairs
    * missed dedup nothing), and how much of the candidate stream is
    * below-threshold noise (precision — wasted verification)?
    * `th_recall` is the analytic 1−(1−J^r)^b bound at the threshold,
    * emitted beside the measured recall so a drifting corpus shows up
    * as measured-vs-theory gap.
    *
    * Runs on DISTINCT texts (the q25 exact-dup collapse: identical
    * texts collide in every band by construction and would only pad
    * both sides). Both quadratics carry the loud pair-budget guard of
    * the production ops. Scale: this is an AUDIT — run it on a
    * sampled slice at 100 TB; the ground-truth shingle self-join is
    * the bounded cost the guard prices. */
  def lshAuditPairs(df: DataFrame, textCol: String, idCol: String,
      num: Int = 4, den: Int = 5, maxPairs: Long = 100000000L): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // The rep key only ever feeds joins, pair orientation, and counts —
    // every output column is a COUNT, so any bijective key works. A
    // pinned long surrogate (r13) replaces the 32-char md5 string in
    // the brute-force shingle self-join and the band join, the two
    // pair-explosion stages this audit deliberately runs uncapped.
    val reps = df.select(md5(col(textCol)).as("__fp"), col(textCol).as("__t"))
      .groupBy(col("__fp")).agg(min(col("__t")).as("__t"))
      .select(monotonically_increasing_id().as("fp"),
        expr("shingle_set(`__t`, 3)").as("ss"))
      .localCheckpoint()
    val banded = reps.select(col("fp"),
      posexplode(expr("minhash_bands(ss)")).as(Seq("band", "bh")))
    val guardedBanded = pairBudgetGuard(banded,
      Seq(banded.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("__n"))),
      maxPairs, "lshAuditPairs")
    val cands = guardedBanded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.fp") < col("b.fp"))
      .select(col("a.fp").as("fa"), col("b.fp").as("fb")).distinct()
      .localCheckpoint()
    val sh = reps.select(col("fp"), explode(col("ss")).as("s"))
    val guardedSh = pairBudgetGuard(sh,
      Seq(sh.groupBy(col("s")).agg(count(lit(1)).as("__n"))),
      maxPairs, "lshAuditPairs")
    val sizes = reps.select(col("fp"), size(col("ss")).cast(LongType).as("n"))
    val truePairs = guardedSh.alias("a")
      .join(sh.alias("b"),
        col("a.s") === col("b.s") && col("a.fp") < col("b.fp"))
      .groupBy(col("a.fp").as("fa"), col("b.fp").as("fb"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.select(col("fp").as("fa"), col("n").as("na")), "fa")
      .join(sizes.select(col("fp").as("fb"), col("n").as("nb")), "fb")
      .filter(lit(den) * col("i") >= lit(num) * (col("na") + col("nb") - col("i")))
      .select(col("fa"), col("fb")).localCheckpoint()
    val j = num.toDouble / den
    val th = 1.0 - math.pow(1.0 - math.pow(j, 4), 32)
    truePairs.agg(count(lit(1)).as("n_true"))
      .crossJoin(cands.agg(count(lit(1)).as("n_cand")))
      .crossJoin(truePairs.join(cands, Seq("fa", "fb"), "left_semi")
        .agg(count(lit(1)).as("n_hit")))
      .select(col("n_true"), col("n_cand"), col("n_hit"),
        when(col("n_true") > 0L,
          round(col("n_hit").cast(DoubleType) /
            col("n_true").cast(DoubleType), 6))
          .otherwise(lit(null).cast(DoubleType)).as("recall"),
        when(col("n_cand") > 0L,
          round(col("n_hit").cast(DoubleType) /
            col("n_cand").cast(DoubleType), 6))
          .otherwise(lit(null).cast(DoubleType)).as("precision"),
        round(lit(th), 9).as("th_recall"))
  }

  /** Exact dedup on normalized text: keeps the smallest id per duplicate
    * group. One shuffle on a 128-bit hash. */
  def dedupExact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(normFp(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("fp")

  /** Distinct word n-gram shingles per row: (id, s). A single codegen'd
    * projection (graft.functions.ShingleSet) — dedup happens in-array per
    * row, so there is no distinct() shuffle and recomputing this subplan
    * in multi-consumer dedup pipelines costs only the scan. */
  def shingles(df: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("__id"),
        explode(expr(s"shingle_set(`$textCol`, $n)")).as("s"))
  }

  /** Loud pair-explosion tripwire for every pair-ENUMERATING dedup API
    * (the q24/q25/q26/q52/q187 family): pair enumeration is
    * output-quadratic under duplication BY SEMANTICS — a 10×-duplicated
    * corpus grows the answer ~100×, which no exact enumeration can avoid
    * (the r8 sf1 ladder measured q26's answer growing 190×) — so a
    * pathological corpus must fail LOUDLY before the quadratic
    * materializes, not OOM a downstream stage. Each `budgets` entry is a
    * one-column (`__n`) bucket-size table; Σ C(__n, 2) upper-bounds the
    * pairs the buckets can emit. The bound rides the plan as a broadcast
    * one-row aggregate (same device as [[intervalOverlapJoin]]'s span
    * guard): cheap keyed aggs, no extra action, and the raise_error
    * fires on the stream's first row — before the join explodes.
    * The cluster-form APIs ([[connectedComponents]] / [[dedupKeepBest]])
    * are the fixed-size-answer alternative the error points at. */
  private[graft] def pairBudgetGuard(stream: DataFrame,
      budgets: Seq[DataFrame], maxPairs: Long, op: String): DataFrame = {
    require(maxPairs > 0, s"$op: maxPairs must be positive")
    val ub = budgets.map(_.agg(coalesce(sum(
        expr("__n * (__n - 1) div 2")), lit(0L)).as("__ubp")))
      .reduce(_ unionAll _)
      .agg(sum(col("__ubp")).as("__ub"))
    stream.crossJoin(broadcast(ub))
      .filter(when(col("__ub") > maxPairs,
        raise_error(concat(
          lit(s"$op: candidate-pair upper bound "),
          col("__ub").cast(StringType),
          lit(s" exceeds maxPairs=$maxPairs — pair enumeration is " +
            "output-quadratic under duplication; raise maxPairs only if " +
            "the pair set truly fits downstream, or switch to the " +
            "cluster form (connectedComponents/dedupKeepBest), whose " +
            "output is one row per document"))).cast(BooleanType))
        .otherwise(lit(true)))
      .drop("__ub")
  }

  /** EXACT expansion tripwire completing [[pairBudgetGuard]] (review
    * finding: the bucket/within budgets bound candidate generation and
    * within-group output, but the exact-dup member RE-EXPANSION joins
    * multiply each verified representative pair by |ga|·|gb| — on a
    * d×-duplicated corpus that is d² past everything the first guard
    * sees). The representative pairs are materialized (they already
    * feed two member joins, so this also removes a recompute; the
    * pinned set is verified-near-dup-pair-sized, not corpus-sized),
    * the true member-pair total Σ|ga|·|gb| comes from one
    * group-sized join + 1-row aggregate — EXACT, so legitimate corpora
    * can never false-trip — and the expansion raises past `maxPairs`
    * before producing a row. `groupSizes` carries (__g, __n). */
  private[graft] def expansionGuard(repPairs: DataFrame, aCol: String,
      bCol: String, groupSizes: DataFrame, maxPairs: Long,
      op: String): DataFrame = {
    val reps = repPairs.localCheckpoint()
    val sa = groupSizes.select(col("__g").as(aCol), col("__n").as("__xna"))
    val sb = groupSizes.select(col("__g").as(bCol), col("__n").as("__xnb"))
    val tot = reps.join(sa, aCol).join(sb, bCol)
      .agg(coalesce(sum(col("__xna") * col("__xnb")), lit(0L)).as("__xub"))
    reps.crossJoin(broadcast(tot))
      .filter(when(col("__xub") > maxPairs,
        raise_error(concat(
          lit(s"$op: exact-dup member expansion of "),
          col("__xub").cast(StringType),
          lit(s" pairs exceeds maxPairs=$maxPairs — the corpus's " +
            "duplication makes the pair answer itself quadratic; raise " +
            "maxPairs only if the pair set truly fits downstream, or " +
            "switch to the cluster form (connectedComponents/" +
            "dedupKeepBest), whose output is one row per document")))
          .cast(BooleanType))
        .otherwise(lit(true)))
      .drop("__xub")
  }

  /** Exact Jaccard near-duplicate pairs at `num/den` threshold (integer
    * cross-multiplied — no float compare).
    *
    * With `maxShingleDf = Some(cap)` (the 100 TB formulation): stop-shingles
    * (df > cap) carry no near-dup signal but O(df²) join pairs — they are
    * both the skew and most of the work. Pass 1 computes per-shingle df
    * (partial-agg safe even on a hot key) and broadcasts the tiny hot list;
    * after the anti-join every surviving shingle has ≤ cap docs, so pair
    * generation collapses to `groupBy(s) → collect_list → in-array pairs` —
    * per-key work bounded by C(cap,2), no self-join, no skewed shuffle.
    *
    * Without a cap the per-shingle doc list is unbounded (collect_list on a
    * hot key OOMs a task), so the classic shingle-equality self-join is
    * used; that form is exact but skew-prone — prefer a cap at scale.
    *
    * `maxPairs` is the [[pairBudgetGuard]] tripwire: if the per-shingle
    * bucket sizes bound the candidate pair set above it, the job fails
    * loudly before enumerating (pair output is quadratic under
    * duplication by semantics — see the guard's scaladoc). */
  def nearDupPairsExact(df: DataFrame, textCol: String, idCol: String,
      num: Int = 4, den: Int = 5, ngram: Int = 3,
      maxShingleDf: Option[Int] = None,
      maxPairs: Long = 100000000L,
      shingles: Option[DataFrame] = None): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    shingles.foreach(requireShingleArtifactMatches(_, df, textCol, idCol,
      ngram, "nearDupPairsExact"))
    // `shingles`, if given, must be [[shingleTable]](df, textCol, idCol,
    // ngram) — typically pre-materialized once per session via
    // [[materializeBucketed]] keyed on the shingle column so several
    // dedup queries share one tokenization pass AND the shingle-keyed
    // aggregations below read co-located buckets instead of shuffling.
    // Identical multiset to the inline projection (parquet round-trips
    // the strings bit-for-bit), so hash gates are unchanged.
    val sh0 = shingles.map(_.select(col(idCol).as("__id"), col("s"))).getOrElse(
      df.select(col(idCol).as("__id"),
          expr(s"shingle_set(`$textCol`, $ngram)").as("ss"))
        .select(col("__id"), explode(col("ss")).as("s")))
    val (inter, sizes) = maxShingleDf match {
      case Some(cap) =>
        val hot = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("s"))
        val kept = sh0.join(broadcast(hot), Seq("s"), "left_anti")
        val sh = pairBudgetGuard(kept,
          Seq(kept.groupBy(col("s")).agg(count(lit(1)).as("__n"))),
          maxPairs, "nearDupPairsExact")
        val i = sh.groupBy(col("s")).agg(sort_array(collect_list(col("__id"))).as("ds"))
          .select(explode(expr("array_pairs(ds)")).as("p"))
          .groupBy(col("p.da").as("da"), col("p.db").as("db"))
          .agg(count(lit(1)).as("i"))
        // Per-doc KEPT sizes re-count the anti-joined explode. (An
        // array_except-against-broadcast-hot formulation would save this
        // pass, but measured 6× slower end-to-end here: the crossJoin
        // lineage degrades the downstream join planning. The shingle
        // projection is codegen'd and cheap to recompute.)
        val n = sh.groupBy(col("__id")).agg(count(lit(1)).as("n"))
        (i, n)
      case None =>
        val guarded = pairBudgetGuard(sh0,
          Seq(sh0.groupBy(col("s")).agg(count(lit(1)).as("__n"))),
          maxPairs, "nearDupPairsExact")
        val i = guarded.alias("a")
          .join(sh0.alias("b"), col("a.s") === col("b.s") && col("a.__id") < col("b.__id"))
          .groupBy(col("a.__id").as("da"), col("b.__id").as("db"))
          .agg(count(lit(1)).as("i"))
        // per-doc set sizes: a shuffle-free size(ss) projection inline;
        // a keyed count over the artifact rows (same integers — the
        // shingle column is a per-doc SET) when one was supplied
        val n = shingles match {
          case Some(_) =>
            sh0.groupBy(col("__id")).agg(count(lit(1)).as("n"))
          case None =>
            df.select(col(idCol).as("__id"),
                size(expr(s"shingle_set(`$textCol`, $ngram)")).cast(LongType).as("n"))
              .filter(col("n") > 0)
        }
        (i, n)
    }
    inter
      .join(sizes.select(col("__id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("__id").as("db"), col("n").as("nb")), "db")
      .filter(lit(den) * col("i") >= lit(num) * (col("na") + col("nb") - col("i")))
      .select(col("da"), col("db"), col("i"), col("na"), col("nb"),
        (col("i") / (col("na") + col("nb") - col("i"))).as("jac"))
  }

  /** The exploded (id, shingle) token table — one row per DISTINCT
    * word-`ngram` shingle per document, the shared intermediate of the
    * whole exact-Jaccard dedup family (near-dup pairs, containment,
    * threshold sweeps). Columns: (`idCol`, `s`). Materialize it once per
    * session with [[materializeBucketed]] (key it on `s` — every
    * downstream df-count and pair-generation aggregation groups by the
    * shingle) and pass it to [[nearDupPairsExact]]'s `shingles` hook so
    * N dedup queries pay ONE corpus tokenization pass instead of N. */
  def shingleTable(df: DataFrame, textCol: String, idCol: String,
      ngram: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol),
        explode(expr(s"shingle_set(`$textCol`, $ngram)")).as("s"))
  }

  /** Artifacts validated by [[requireShingleArtifactMatches]] this JVM:
    * the probe costs three tiny jobs, so it runs once per (artifact plan,
    * parameters) pair, not once per query. */
  private[api] val validatedShingleArtifacts: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** One-row validation probe (the `:2010`-style convention) guarding the
    * `shingles` artifact hook: a caller passing an artifact built with a
    * DIFFERENT textCol/ngram than the call's would get silently wrong
    * pair sets — the shapes are identical, only the string multiset
    * differs. Samples one document id from the artifact, recomputes that
    * document's shingle set from `df`, and requires exact agreement;
    * fails loudly with the mismatch instead. */
  private[api] def requireShingleArtifactMatches(art: DataFrame, df: DataFrame,
      textCol: String, idCol: String, ngram: Int, op: String): Unit = {
    val key = art.queryExecution.logical.semanticHash().toString +
      s"|$textCol|$idCol|$ngram"
    if (validatedShingleArtifacts.contains(key)) return
    val probe = art.select(col(idCol)).limit(1).collect()
    if (probe.isEmpty) return // empty artifact: nothing to disagree about
    val id = probe(0).get(0)
    val got = art.filter(col(idCol) === lit(id)).select(col("s"))
      .collect().map(_.getString(0)).toSet
    val exp = df.filter(col(idCol) === lit(id))
      .select(explode(expr(s"shingle_set(`$textCol`, $ngram)")).as("s"))
      .collect().map(_.getString(0)).toSet
    require(got == exp,
      s"$op: the supplied shingles artifact disagrees with " +
        s"shingleTable(df, '$textCol', '$idCol', ngram=$ngram) on sampled " +
        s"document $id (artifact has ${got.size} shingles, recompute has " +
        s"${exp.size}) — was the artifact built with a different textCol " +
        "or ngram?")
    validatedShingleArtifacts.add(key)
  }

  /** Token-set similarity join with POSITIONAL PREFIX FILTERING
    * (Chaudhuri et al. ICDE'06 / Bayardo et al. WWW'07): all pairs with
    * Jaccard(tokens(a), tokens(b)) >= num/den, generating candidates
    * from each document's PREFIX only — its L = n − ⌈t·n⌉ + 1 rarest
    * tokens under a global document-frequency order.
    *
    * Why the filter is LOSSLESS: J(x,y) ≥ t ⟹ |x∩y| ≥ t·|x∪y| ≥ t·|x|,
    * so a qualifying pair shares at least ⌈t·|x|⌉ tokens; if it shared
    * none of x's first L tokens the intersection would fit in the
    * remaining n−L = ⌈t·n⌉−1 < ⌈t·n⌉ — contradiction. Hence every
    * qualifying pair collides on both prefixes and the exact verify
    * loses nothing. This is the q24-family's df-cap idea made EXACT:
    * the cap drops hot-shingle evidence (oracle must mirror it); the
    * prefix filter provably cannot, so the DuckDB oracle is pure brute
    * force with no knowledge of the plan's filter.
    *
    * 100 TB shape: candidate fan-out is driven by the RAREST tokens —
    * a stopword lands in a prefix only for documents shorter than
    * ~1/(1−t) tokens, so the hot-key explosion the df-cap exists to
    * contain never forms. Stages: token df (keyed agg) → per-doc
    * rarest-first window (one shuffle on doc id) → prefix self-join on
    * token → exact verify via one more token-keyed join.
    *
    * `ngram` sets the token granularity: 1 = words; 2 (default) = word
    * bigrams, whose richer universe keeps Jaccard thresholds
    * discriminative on template-heavy corpora where nearly all docs
    * share half their word VOCABULARY (measured here: word-level t=0.9
    * still passes 7% of all pairs; bigram t=0.5 isolates exactly the
    * planted near-dups). */
  def prefixFilterJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      num: Int = 1, den: Int = 2, ngram: Int = 2,
      maxPairs: Long = 100000000L): DataFrame = {
    require(num > 0 && den >= num, "threshold must be in (0, 1]")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // EXACT-DUP COLLAPSE (the minhashPairs device): identical texts have
    // identical token sets, so Jaccard depends only on the text
    // fingerprint pair — run the whole filter/verify pipeline once per
    // DISTINCT text and re-expand member pairs afterwards. On a
    // d×-duplicated corpus (the realistic crawl input, and exactly what
    // the sf1 ladder synthesizes) this divides candidate generation by
    // d²; within-group pairs are J=1 by construction and rejoin at the
    // end. Pair set is IDENTICAL to the uncollapsed form.
    val groups = df.select(col(idCol).as("__gid"), md5(col(textCol)).as("__fp"))
    val reps = df.select(md5(col(textCol)).as("__fp"), col(textCol).as("__text"))
      .groupBy(col("__fp")).agg(min(col("__text")).as("__text"))
    val gsizes = groups.groupBy(col("__fp")).agg(count(lit(1)).as("__n"))
      .select(col("__fp").as("__g"), col("__n"))
    val repPairs = expansionGuard(
      prefixFilterJaccardPairsRaw(reps, "__text", "__fp", num, den, ngram, maxPairs),
      "da", "db", gsizes, maxPairs, "prefixFilterJaccardPairs(expansion)")
    val cross = repPairs
      .join(groups.select(col("__fp").as("da"), col("__gid").as("ia")), Seq("da"))
      .join(groups.select(col("__fp").as("db"), col("__gid").as("ib")), Seq("db"))
      .select(least(col("ia"), col("ib")).as("da"),
        greatest(col("ia"), col("ib")).as("db"), col("inter"), col("uni"))
    // within-group pairs: inter = uni = |bigram set| (always above any
    // threshold ≤ 1); groups with an EMPTY token set never enter the
    // token table in the uncollapsed form, so exclude n = 0 here too
    val sizes = reps.select(col("__fp"),
      size(expr(s"shingle_set(`__text`, $ngram)")).cast(LongType).as("__n"))
    val within = pairBudgetGuard(groups,
        Seq(groups.groupBy(col("__fp")).agg(count(lit(1)).as("__n"))),
        maxPairs, "prefixFilterJaccardPairs(within-group)").alias("a")
      .join(groups.alias("b"),
        col("a.__fp") === col("b.__fp") && col("a.__gid") < col("b.__gid"))
      .select(col("a.__fp").as("__fp"),
        col("a.__gid").as("da"), col("b.__gid").as("db"))
      .join(sizes, Seq("__fp")).filter(col("__n") > 0)
      .select(col("da"), col("db"), col("__n").as("inter"), col("__n").as("uni"))
    cross.unionByName(within)
  }

  /** The uncollapsed prefix-filter pipeline — see
    * [[prefixFilterJaccardPairs]] for the public entry and the
    * losslessness proofs. */
  private[api] def prefixFilterJaccardPairsRaw(df: DataFrame, textCol: String,
      idCol: String, num: Int, den: Int, ngram: Int,
      maxPairs: Long = 100000000L): DataFrame = {
    // the token table feeds FOUR consumers (df-count agg, size agg, the
    // prefix window, and both verify joins) — materialize the skinny
    // (id, token) rows once instead of re-exploding the corpus per use
    val toks = df.select(col(idCol).as("__id"),
        explode(expr(s"shingle_set(`$textCol`, $ngram)")).as("__t"))
      .localCheckpoint()
    val sizes = toks.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val dfc = toks.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    // DICTIONARY ENCODING (r13): every stage downstream of here only
    // needs key EQUALITY (joins, counts) plus one consistent total
    // order for the prefix (any fixed order satisfies the losslessness
    // proof — the verify is exact, so the candidate set may legally
    // vary with the order while the OUTPUT cannot). The heavy stages —
    // the prefix self-join and the 2-sided verify join, whose shuffle
    // at sf0.1 carries ~30M (pair × token) rows — therefore run on
    // dense LONG surrogates instead of (md5-string id, n-gram-string
    // token) keys: measured 12.4 → ~7 s end to end on q187, identical
    // pair set. Surrogates come from monotonically_increasing_id
    // pinned by localCheckpoint (unique per row of the pinned copy;
    // WHICH id a key draws is irrelevant — only bijectivity matters,
    // and every consumer below reads the same pinned table).
    val docDict = sizes.withColumn("__did", monotonically_increasing_id())
      .localCheckpoint() // (__id, __n, __did) — corpus-distinct-doc-sized
    val tokDict = dfc.withColumn("__tid", monotonically_increasing_id())
      .localCheckpoint() // (__t, __df, __tid) — vocabulary-sized
    val toksI = toks.join(tokDict, Seq("__t"))
      .join(docDict.select(col("__id"), col("__did")), Seq("__id"))
      .select(col("__did"), col("__tid"), col("__df"))
      .localCheckpoint() // the all-long token table the hot path reads
    val wn = Window.partitionBy(col("__did")).orderBy(col("__df"), col("__tid"))
    val pref = toksI
      .join(docDict.select(col("__did"), col("__n")), Seq("__did"))
      .withColumn("__pos", row_number().over(wn))
      // L = n − ⌈num·n/den⌉ + 1, all-integer
      .filter(col("__pos") <=
        col("__n") - expr(s"(($num * __n) + ${den - 1}) div $den") + lit(1))
      .select(col("__did"), col("__tid"), col("__pos"), col("__n"))
      // both sides of the candidate self-join read this subplan; without
      // materialization the df-agg + per-doc window run twice
      .localCheckpoint()
    // Candidate join carries two more LOSSLESS prunes (both standard
    // PPJoin filters; proofs in the Scaladoc losslessness argument):
    //  - length: J ≥ t ⟹ i ≤ min(na,nb) and i ≥ t·max(na,nb), so
    //    den·min ≥ num·max or the pair cannot qualify;
    //  - positional: at the FIRST shared prefix token all common tokens
    //    sit at order-rank ≥ it, so i ≤ min(na−posa, nb−posb)+1, which
    //    must reach α = ⌈num·(na+nb)/(num+den)⌉ (from i ≥ t·(na+nb−i)).
    //    Keeping a pair when ANY shared row passes is safe: for a
    //    qualifying pair the first shared token's bound ≥ i ≥ α.
    // (Pair orientation uses the surrogate order — each unordered pair
    // is still emitted exactly once, and the public wrapper re-orients
    // the final member pairs by the caller's ids.)
    val cand = pairBudgetGuard(pref,
        Seq(pref.groupBy(col("__tid")).agg(count(lit(1)).as("__n"))),
        maxPairs, "prefixFilterJaccardPairs").alias("a")
      .join(pref.alias("b"),
        col("a.__tid") === col("b.__tid") && col("a.__did") < col("b.__did") &&
          lit(den) * least(col("a.__n"), col("b.__n")) >=
            lit(num) * greatest(col("a.__n"), col("b.__n")) &&
          least(col("a.__n") - col("a.__pos"), col("b.__n") - col("b.__pos")) + lit(1) >=
            expr(s"(($num * (`a`.__n + `b`.__n)) + ${num + den - 1}) div ${num + den}"))
      .select(col("a.__did").as("dida"), col("b.__did").as("didb"))
      .distinct()
    // Verify with the skinny exploded-token join (measured FASTER here
    // than a per-pair array_intersect on collected shingle arrays: wide
    // array payloads replicated across every candidate row shuffle more
    // bytes than pair×token rows do).
    val inter = cand
      .join(toksI.select(col("__did").as("dida"), col("__tid")), Seq("dida"))
      .join(toksI.select(col("__did").as("didb"), col("__tid")),
        Seq("didb", "__tid"))
      .groupBy(col("dida"), col("didb")).agg(count(lit(1)).as("inter"))
    inter
      .join(docDict.select(col("__did").as("dida"), col("__id").as("da"),
        col("__n").as("na")), Seq("dida"))
      .join(docDict.select(col("__did").as("didb"), col("__id").as("db"),
        col("__n").as("nb")), Seq("didb"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(lit(den) * col("inter") >= lit(num) * col("uni"))
      .select(col("da"), col("db"), col("inter"), col("uni"))
  }

  /** Connected components of an undirected edge list — the step that
    * turns near-dup PAIRS into duplicate CLUSTERS so one canonical doc
    * survives per group. Label propagation to a fixpoint: every node
    * takes the min label in its neighborhood each round, so rounds ≤
    * graph diameter ≤ O(log n) for near-dup graphs (small, dense
    * clusters). Each round is one shuffle over the edge list; the driver
    * only checks a scalar convergence count — no vertex data leaves the
    * executors. Returns (node, component) with component = min reachable
    * node id. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    // Materialize the symmetrized edges ONCE: `sym` is joined every
    // iteration, and the caller's edge list is typically the most
    // expensive subplan in the pipeline (a full near-dup candidate
    // generation). Without the checkpoint that subplan re-executes every
    // round — multiplying the corpus's costliest job by the graph
    // diameter. The label seed below derives from the same materialized
    // scan, so the upstream lineage runs exactly once.
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionAll(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "b")
          .withColumnRenamed("label", "blabel"), "b")
        .groupBy(col("a").as("node")).agg(min(col("blabel")).as("nmin"))
      // carry the previous label through so convergence is a filter over
      // the checkpointed result, not another join
      val next = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"), col("label").as("__old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint() // truncate the iterative lineage
      val changed = next.filter(col("label") =!= col("__old")).count()
      labels = next.drop("__old")
      converged = changed == 0
      i += 1
    }
    // Min-label propagation advances one hop per round: a chain of
    // diameter > maxIter exits un-merged. Silent wrong answers are worse
    // than a loud stop.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(graph diameter exceeds maxIter); raise maxIter")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Exact dedup keeping the best row per duplicate group (highest
    * `scoreCol`, ties by smallest id) — the quality-aware form of
    * [[dedupExact]]. One shuffle on the content hash. */
  def dedupKeepBest(df: DataFrame, textCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    val w = Window
      .partitionBy(normFp(col(textCol)))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash+LSH near-dup pairs, exactly verified: candidates from banded
    * signature buckets (work ∝ true dups), then exact Jaccard on the
    * candidates only. See operators/Dedup for the banding math. */
  def nearDupPairsMinHash(df: DataFrame, textCol: String, idCol: String,
      num: Int = 4, den: Int = 5, maxPairs: Long = 100000000L): DataFrame =
    graft.operators.Dedup.minhashPairs(df, textCol, idCol, num, den, maxPairs)

  /** Embedding-cosine near-dup pairs, bucket-first (the corpus-scale
    * path): sign-bit LSH band candidates → exact `vec_dot` verify of
    * candidates only — the same candidates→verify shape as MinHash dedup.
    * No relation in the plan is broadcast or driver-bounded.
    *
    * Effective regime: a pair at angle θ collides in one `bits`-bit band
    * with prob p^bits, p = 1 − θ/π; recall = 1 − (1 − p^bits)^bands. The
    * defaults (128 bands × 12 bits) give recall ≈ 1 − 4e-10 at cos ≥ 0.9
    * while pruning uncorrelated pairs ~30×. At LOW thresholds sign-bit
    * LSH cannot prune (cos 0.45 ⇒ p ≈ 0.65, ρ = ln(1/p)/ln 2 ≈ 0.63 —
    * near-all pairs become candidates for recall ≈ 1); use
    * [[cosineNearDupPairsExact]] there, which is the honest distributed
    * quadratic. */
  def cosineNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, bands: Int = 128, bits: Int = 12,
      seed: Int = 42): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val e = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
    val banded = df.select(col(idCol).as("id"),
      explode(expr(s"cosine_lsh_bands(`$vecCol`, $bands, $bits, $seed)")).as("bk"))
    val cands = banded.alias("a")
      .join(banded.alias("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("va"), col("b.id").as("vb"))
      .distinct()
    cands
      .join(e.select(col("id").as("va"), col("v"), col("nrm")), "va")
      .join(e.select(col("id").as("vb"), col("v").as("qv"), col("nrm").as("bn")), "vb")
      .withColumn("cos", expr("vec_dot(v, qv)") / (col("nrm") * col("bn")))
      .filter(col("cos") >= threshold)
      .select(col("va"), col("vb"), col("cos"))
  }

  /** Exact embedding-cosine near-dup pairs at any threshold: a
    * block-partitioned distributed self-join. Rows are hashed into
    * `blocks` groups; each unordered block pair (lo, hi) is one join key,
    * with a row of block g replicated to keys {(i≤g, g)} ∪ {(g, j≥g)} —
    * so every vector pair is scored exactly once, work is spread evenly
    * over blocks(blocks+1)/2 reducers, shuffle volume is n·(blocks+1)
    * rows, and nothing is broadcast or driver-resident (the previous
    * formulation broadcast the whole table — OOM at corpus scale). The
    * O(n²) compare count is inherent to exact low-threshold semantics;
    * scale `blocks` with √n to hold per-task work constant. */
  def cosineNearDupPairsExact(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, blocks: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val g = blocks
    val e = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
      .withColumn("g", pmod(xxhash64(col("id")), lit(g)).cast("int"))
    val aRep = e.withColumn("k",
      explode(expr(s"transform(sequence(g, ${g - 1}), j -> g * $g + j)")))
      .select(col("id").as("va"), col("v"), col("nrm"), col("g").as("ga"), col("k"))
    val bRep = e.withColumn("k",
      explode(expr(s"transform(sequence(0, g), i -> i * $g + g)")))
      .select(col("id").as("vb"), col("v").as("qv"), col("nrm").as("bn"),
        col("g").as("gb"), col("k"))
    aRep.join(bRep, Seq("k"))
      .filter(col("ga") =!= col("gb") || col("va") < col("vb"))
      .withColumn("cos", expr("vec_dot(v, qv)") / (col("nrm") * col("bn")))
      .filter(col("cos") >= threshold)
      .select(least(col("va"), col("vb")).as("va"),
        greatest(col("va"), col("vb")).as("vb"), col("cos"))
  }

  // ------------------------------------------------------------ similarity

  /** Brute-force cosine top-k: for each row of `queries`, the k nearest
    * rows of `base` by cosine over `vecCol` (Array[Float/Double]).
    *
    * SMALL-QUERIES CONTRACT: the `nid =!= qid` join is non-equi, so this
    * is O(|base| · |queries|) under ANY physical plan; the broadcast hint
    * picks the right shape for the intended regime — a driver-bounded
    * query set scored against an arbitrarily large base that never
    * shuffles. For corpus-sized query sets use the bucketed paths
    * (Similarity.lshSearch / ivfSearch — plain equality joins, AQE picks
    * the join strategy) or cosineNearDupPairsExact (block-partitioned
    * quadratic). */
  def cosineTopK(base: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(base.sparkSession)
    val b0 = base.select(col(idCol).as("nid"), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
    // Parallelism floor: the broadcast nested-loop join inherits the base
    // side's partitioning, so a base read from one parquet file serializes
    // the whole O(|base|·|queries|) scoring on one core (sf1 ladder
    // finding). Repartition ONLY in that under-partitioned case — on a
    // real cluster the scan already has thousands of splits and the base
    // must not be reshuffled.
    val dp = base.sparkSession.sparkContext.defaultParallelism
    val b = if (b0.rdd.getNumPartitions < dp) b0.repartition(dp, col("nid")) else b0
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(expr("vec_dot(qv, qv)")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    // excludeSelf guards SAME-set search (a vector must not be its own
    // neighbor); CROSS-set searches over independently-numbered corpora
    // (q206 bitext mining) pass false — an id collision across sets is
    // two different rows, not a self-match.
    val cond = if (excludeSelf) col("nid") =!= col("qid") else lit(true)
    b.join(broadcast(q), cond)
      .withColumn("sim", expr("vec_dot(v, qv)") / (col("nrm") * col("qn")))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), col("sim"))
  }

  /** Maximal Marginal Relevance re-rank (q234; Carbonell & Goldstein
    * 1998) — the standard diversification layer between retrieval
    * (q27/q109/q231) and consumption: greedily pick the candidate
    * maximizing λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s), so near-duplicate
    * hits stop crowding the top-k. The max over an empty S is 0 — the
    * first pick is pure relevance.
    *
    * Exactness: relevance and pairwise cosines are nano-quantized ONCE;
    * every subsequent round is pure integer arithmetic — mmrq =
    * λ₁₀·relq − (10−λ₁₀)·msq with λ in tenths — and a deterministic
    * (mmrq desc, id) argmax, so the greedy chain replays bit-for-bit on
    * both engines (the oracle unrolls the k rounds as chained CTEs,
    * exactly like the HITS/k-core twins).
    *
    * 100 TB shape: MMR is inherently a k-step sequential greedy over a
    * CANDIDATE POOL — the caller bounds the pool (their retrieval
    * top-N); this operator is O(N²) in pool size and O(k) rounds of
    * tiny jobs over the two localCheckpointed tables, with nothing
    * proportional to the corpus anywhere. Keep N in the hundreds; the
    * corpus-scale work belongs in the retrieval stage that builds the
    * pool. */
  def mmrRerank(cands: DataFrame, idCol: String, relCol: String,
      vecCol: String, k: Int = 10, lambdaTenths: Int = 7): DataFrame = {
    require(k >= 1, s"mmrRerank needs k >= 1, got $k")
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"mmrRerank needs lambdaTenths in [0, 10], got $lambdaTenths")
    graft.functions.GraftFunctions.register(cands.sparkSession)
    val Q = 1.0e9
    val c = cands.select(col(idCol).cast(LongType).as("__cid"),
        round(col(relCol) * lit(Q)).cast(LongType).as("__relq"),
        col(vecCol).as("__v"))
      .localCheckpoint() // caller-bounded pool, pinned for the k rounds
    val a = c.select(col("__cid").as("__ia"), col("__v").as("v"))
      .withColumn("__na", sqrt(expr("vec_dot(v, v)")))
    val b = c.select(col("__cid").as("__ib"), col("__v").as("qv"))
      .withColumn("__nb", sqrt(expr("vec_dot(qv, qv)")))
    val sims = a.join(b, col("__ia") =!= col("__ib"))
      .select(col("__ia"), col("__ib"),
        round(expr("vec_dot(v, qv)") / (col("__na") * col("__nb")) * lit(Q))
          .cast(LongType).as("__simq"))
      .localCheckpoint() // N² rows, probed every round
    val lam = lambdaTenths.toLong
    val empty = c.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      new StructType()
        .add("__cid", LongType).add("rank", LongType)
        .add("__relq", LongType).add("__msq", LongType)
        .add("__mmrq", LongType))
    val sel = (1 to k).foldLeft(empty) { (s, r) =>
      val selIds = s.select(col("__cid").as("__sid"))
      val toSel = sims.join(selIds, col("__ib") === col("__sid"))
        .groupBy(col("__ia")).agg(max(col("__simq")).as("__ms"))
      val pick = c.join(s.select(col("__cid")), Seq("__cid"), "left_anti")
        .join(toSel, col("__cid") === col("__ia"), "left")
        .withColumn("__msq", coalesce(col("__ms"), lit(0L)))
        .withColumn("__mmrq",
          lit(lam) * col("__relq") - lit(10L - lam) * col("__msq"))
        .orderBy(col("__mmrq").desc, col("__cid"))
        .limit(1)
        .select(col("__cid"), lit(r.toLong).as("rank"), col("__relq"),
          col("__msq"), col("__mmrq"))
      s.unionByName(pick).localCheckpoint()
    }
    sel.select(col("rank"), col("__cid").as(idCol),
      (col("__relq").cast(DoubleType) / lit(Q)).as("rel"),
      (col("__msq").cast(DoubleType) / lit(Q)).as("max_sim_prev"),
      (col("__mmrq").cast(DoubleType) / lit(1.0e10)).as("mmr"))
  }

  /** Cross-document duplicated-span audit (q235) — the measurement that
    * motivates exact substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): sample each doc's
    * character `gramLen`-grams at `stride` resolution, hash them, and
    * report per doc what fraction of sampled positions carry a gram
    * that also appears in ANOTHER document. A shared span of length
    * ≥ gramLen+stride−1 is guaranteed to be caught (phase error ≤
    * stride); within-doc repetition alone never counts — the flag is
    * strictly cross-document.
    *
    * 100 TB shape: the gram table is len/stride rows per doc (stride
    * divides the suffix-array version's cost by stride with bounded
    * resolution loss); cross-doc counts are ONE hash-keyed aggregate
    * with a distinct-doc count, joined back on the hash — two shuffles
    * total, both partial-agg friendly, nothing quadratic. Docs shorter
    * than gramLen report 0 grams with a NULL fraction. */
  def duplicatedSpans(df: DataFrame, textCol: String, idCol: String,
      gramLen: Int = 40, stride: Int = 10): DataFrame = {
    require(gramLen >= 8, s"duplicatedSpans needs gramLen >= 8, got $gramLen")
    require(stride >= 1, s"duplicatedSpans needs stride >= 1, got $stride")
    val g = df.select(col(idCol).as("__id"), col(textCol).as("__tx"))
      .filter(length(col("__tx")) >= gramLen)
      .select(col("__id"), col("__tx"),
        explode(sequence(lit(1), length(col("__tx")) - lit(gramLen - 1),
          lit(stride))).as("__pos"))
      .select(col("__id"),
        md5(expr(s"substring(__tx, __pos, $gramLen)")).as("__h"))
    val hc = g.groupBy(col("__h"))
      .agg(countDistinct(col("__id")).as("__nd"))
    val per = g.join(hc, Seq("__h"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__nd") >= 2, 1L).otherwise(0L)).as("n_dup"))
    df.select(col(idCol).as("__id")).distinct()
      .join(per, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(col("n_grams").isNull, lit(null).cast(DoubleType))
          .otherwise(col("n_dup").cast(DoubleType) /
            col("n_grams").cast(DoubleType)).as("dup_frac"))
  }

  // ------------------------------------------------------------ skew

  /** Salted equi-join for pathologically skewed keys: the big side gets a
    * deterministic salt from its row content, the small side is replicated
    * `saltFactor` times, and the join key becomes (key, salt) — splitting
    * one hot key's partition into `saltFactor` tasks. Results equal the
    * plain join. Prefer AQE skew handling first; this is the explicit
    * remedy when one key dwarfs everything (SCALE.md). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val b = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltFactor)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  // ------------------------------------------------------------ bucketing

  /** Bucketed table write — the co-located-join primitive: rows are
    * hash-partitioned into `buckets` files per partition ON WRITE and
    * sorted within each bucket, so every later equi-join or aggregation
    * on `key` between same-bucket-count tables runs with NO shuffle (and
    * with the sort pre-done). At 100 TB this converts the recurring
    * fact-fact join shuffle — the single most expensive stage in a daily
    * pipeline — into a one-time write cost. BucketedJoinSpec pins the
    * no-Exchange plan shape. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Once-per-session bucketed MATERIALIZATION of a reused intermediate —
    * the 100 TB pattern behind the shared basket-edge artifact
    * (`Analytics.basketEdges`), promoted to a public primitive: any
    * expensive intermediate consumed by several queries in a session
    * (a tokenized corpus, a shingle table, an edge list, an embedding
    * block) is computed ONCE, written as a `key`-bucketed sorted parquet
    * table, and every later consumer reads co-located, pre-sorted
    * buckets instead of re-computing and re-shuffling. The first caller
    * pays the build inside its own query time (the artifact's honest
    * cost); repeat callers get a shuffle-free scan.
    *
    * Naming & isolation (the collision/race story): the catalog table is
    * `graft_art_<sha256(name) prefix>` — a collision-resistant digest of
    * the caller's full logical name (include the data directory in it!),
    * NOT a 32-bit hashCode. Files live under the session warehouse dir
    * in a per-process `graft_artifacts_<pid>` subdirectory, so two
    * concurrent JVMs benching the same data can never overwrite each
    * other's files mid-read (per-process paths make the write-then-
    * rename dance unnecessary: no other process ever reads this path —
    * and the catalog is per-JVM anyway, so artifacts were never
    * cross-process shareable). A JVM shutdown hook removes the
    * directory.
    *
    * `build` is by-name: it runs only on the first call for `name`.
    * Correctness contract: parquet round-trips longs/strings/doubles
    * bit-for-bit, so hash-gated consumers see the exact multiset the
    * inline plan would produce. */
  def materializeBucketed(spark: org.apache.spark.sql.SparkSession, name: String, key: String,
      buckets: Int = 16)(build: => DataFrame): DataFrame =
    artifactTables.synchronized {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString
      val tbl = s"graft_art_$digest"
      if (!artifactTables.contains(name) || !spark.catalog.tableExists(tbl)) {
        writeBucketed(build, tbl, key, buckets, Some(s"${artifactDir(spark)}/$tbl"))
        artifactTables(name) = tbl
      }
      spark.table(tbl)
    }

  private[api] val artifactTables = scala.collection.mutable.Map[String, String]()
  @volatile private[api] var artifactDirCached: String = null
  private[api] def artifactDir(spark: org.apache.spark.sql.SparkSession): String = {
    if (artifactDirCached == null) {
      val base = spark.sessionState.conf.warehousePath
      val dir = s"$base/graft_artifacts_${ProcessHandle.current().pid()}"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(p)
      sys.addShutdownHook { fs.delete(p, true); () }
      artifactDirCached = dir
    }
    artifactDirCached
  }

  // ------------------------------------------------------------ text

  /** Adds n_tokens / n_punct / n_stop / char_len / stop_ratio /
    * quality_score columns from ONE code-point scan per row (the
    * `text_stats` codegen kernel; regex-equivalent semantics — see
    * TextStatsKernel). */
  def withTextStats(df: DataFrame, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("__ts", expr(s"text_stats(`$textCol`)"))
      .withColumn("n_tokens", col("__ts.ws_tokens"))
      .withColumn("n_punct", col("__ts.n_punct"))
      .withColumn("n_stop", col("__ts.n_stop"))
      .withColumn("char_len", col("__ts.char_len"))
      .drop("__ts")
      .withColumn("stop_ratio", col("n_stop") / col("n_tokens"))
      .withColumn("quality_score",
        lit(0.5) * (col("n_stop") / col("n_tokens")) +
          lit(0.5) * (lit(1.0) - col("n_punct") / col("char_len")))
  }

  /** Normalized-content fingerprint column. */
  def withFingerprint(df: DataFrame, textCol: String, out: String = "fp"): DataFrame =
    df.withColumn(out, md5(regexp_replace(lower(col(textCol)), "[^a-z0-9]", "")))

  /** PII scrubbing (q57): redacts emails, dotted-quad IPs, and long digit
    * runs in `textCol`, adding `n_emails`/`n_ips`/`n_nums` detection
    * counts and replacing the text in place. Patterns sit in the RE2 ∩
    * java.util.regex common dialect; replacement order email → IP → num
    * is part of the contract (an IP inside an email is already gone).
    * Pure per-row projection — no shuffle at any scale. */
  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val num = "\\d{9,}"
    df.withColumn("n_emails", regexp_count(col(textCol), lit(email)).cast(LongType))
      .withColumn("n_ips", regexp_count(col(textCol), lit(ip)).cast(LongType))
      .withColumn("n_nums", regexp_count(col(textCol), lit(num)).cast(LongType))
      .withColumn(textCol,
        regexp_replace(regexp_replace(regexp_replace(col(textCol),
          lit(email), lit("<EMAIL>")), lit(ip), lit("<IP>")), lit(num), lit("<NUM>")))
  }

  /** Eval-set decontamination (q58): flags `train` rows sharing any word
    * `ngram`-gram with `evalSet` — the benchmark-leak check every
    * training corpus needs. One shuffle of the train shingles against a
    * BROADCAST eval shingle set (benchmarks are small by construction;
    * drop to a plain join for corpus-sized eval sets). Returns `train`
    * plus a `contaminated` boolean. */
  def decontaminate(train: DataFrame, evalSet: DataFrame, textCol: String,
      idCol: String, ngram: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    val evalSh = evalSet
      .select(explode(expr(s"shingle_set(`$textCol`, $ngram)")).as("__s")).distinct()
    val contaminated = train
      .select(col(idCol), explode(expr(s"shingle_set(`$textCol`, $ngram)")).as("__s"))
      .join(broadcast(evalSh), Seq("__s"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__c", lit(true))
    train.join(contaminated, Seq(idCol), "left")
      .withColumn("contaminated", coalesce(col("__c"), lit(false)))
      .drop("__c")
  }

  /** Repeat-upweighting data-mix plan — the "epochs per dataset" table
    * of the LLaMA/GPT reports: given per-row token counts, a total
    * training-token budget, and a max-epochs cap per source, allocate
    * the budget across sources under sqrt-temperature weights
    * (T=2, the q108 family), capping any source at `maxEpochs` passes
    * and redistributing the capped-off remainder across the uncapped
    * sources in ONE documented round (capped sources can leave a
    * residual unallocated sliver rather than iterating to the exact
    * water-filling fixpoint — deterministic beats asymptotic here).
    *
    * Float policy: weights are nano-quantized sqrt(tokens) longs
    * summed exactly; allocations live in MICRO-token longs, so both
    * redistribution inputs (Σ alloc, Σ uncapped weight) are exact
    * integer sums — the only doubles are per-source single-expression
    * conversions identical on the oracle. Shapes: one keyed agg over
    * the corpus, then everything is #sources-sized with 1-row
    * broadcasts. Returns (group, n_tokens, weight, capped, epochs,
    * alloc_tokens, share); `capped` reports saturation AFTER the
    * redistribution round — a source the round-2 top-up pushes onto
    * its cap is saturated too, and its clipped sliver is the reason
    * Σshare can fall short of 1. */
  def mixPlan(df: DataFrame, tokenCol: String, groupCol: String,
      budgetTokens: Long, maxEpochs: Double = 3.0): DataFrame = {
    require(budgetTokens > 0 && maxEpochs > 0, "mixPlan: bad budget/cap")
    // micro-token quantization must fit a long: budget·1e6 < 2^63. Past
    // ~9.2e12 tokens the multiply would wrap silently (non-ANSI) and
    // every allocation downstream would be garbage — fail loudly with
    // the remedy instead (review finding: the docstring's own
    // LLaMA-scale budgets would have tripped this)
    require(budgetTokens <= 9_000_000_000_000L,
      s"mixPlan: budgetTokens=$budgetTokens exceeds the 9e12 micro-token " +
        "quantization range; plan in thousands of tokens (divide budget " +
        "and per-row counts by 1e3) or widen the quantization")
    val Q = 1.0e9; val M = 1.0e6
    val wq = df.groupBy(col(groupCol)).agg(sum(col(tokenCol)).as("n_tokens"))
      .withColumn("__wq",
        round(sqrt(col("n_tokens").cast(DoubleType)) * lit(Q)).cast(LongType))
    val tot = wq.agg(sum(col("__wq")).as("__W"))
    val r1 = wq.crossJoin(broadcast(tot))
      .withColumn("__want", col("__wq").cast(DoubleType) *
        lit(budgetTokens.toDouble) / col("__W").cast(DoubleType))
      .withColumn("__cap", lit(maxEpochs) * col("n_tokens").cast(DoubleType))
      .withColumn("capped", col("__want") >= col("__cap"))
      .withColumn("__a1q",
        round(least(col("__want"), col("__cap")) * lit(M)).cast(LongType))
    val t2 = r1.agg(sum(col("__a1q")).as("__A1"),
      sum(when(!col("capped"), col("__wq")).otherwise(lit(0L))).as("__WU"))
    r1.crossJoin(broadcast(t2))
      .withColumn("__addq", when(col("capped") || col("__WU") === 0L, lit(0L))
        .otherwise(round((lit(budgetTokens) * lit(1000000L) - col("__A1"))
          .cast(DoubleType) * col("__wq").cast(DoubleType) /
          col("__WU").cast(DoubleType)).cast(LongType)))
      .withColumn("__capq", round(col("__cap") * lit(M)).cast(LongType))
      .withColumn("__a2q", least(col("__a1q") + col("__addq"), col("__capq")))
      .select(col(groupCol), col("n_tokens"),
        (col("__wq").cast(DoubleType) / col("__W").cast(DoubleType))
          .as("weight"),
        // report capping AFTER redistribution: a source the round-2
        // top-up pushes onto its cap is saturated too (review finding —
        // the round-1 flag under-reported exactly those sources)
        (col("__a2q") === col("__capq")).as("capped"),
        (col("__a2q").cast(DoubleType) / lit(M) /
          col("n_tokens").cast(DoubleType)).as("epochs"),
        (col("__a2q").cast(DoubleType) / lit(M)).as("alloc_tokens"),
        (col("__a2q").cast(DoubleType) /
          (lit(budgetTokens.toDouble) * lit(M))).as("share"))
  }

  /** Scored eval-set contamination — [[decontaminate]]'s binary flag
    * upgraded to the GPT-3/PaLM-report form: for each training
    * document, the single eval document with the LARGEST distinct
    * n-gram overlap, plus the overlap fraction of the train doc's gram
    * set. The fraction is what the reports threshold on; the argmax
    * eval id is what an audit actually needs (WHICH benchmark item
    * leaked, not just that something did).
    *
    * Shapes: both gram sets are per-doc DISTINCT (shingle_set), the
    * eval side is BROADCAST (benchmarks are small by construction),
    * per-(train, eval) overlaps are one keyed aggregate, and the
    * argmax is `max_by` on (count, −eval_id) — count desc, id asc tie
    * break, never a sort window. Clean train docs stay as rows with
    * overlap 0 and a NULL top id (the bm25 "no evidence" contract).
    * Returns (id, n_grams, top_eval_id, n_overlap, overlap_frac). */
  def contaminationScore(train: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, ngram: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    // the corpus-wide shingle explode is the dominant cost and feeds
    // TWO consumers (the per-doc gram count and the overlap join, on
    // different keys — no exchange reuse possible): materialize once
    val trG = train.select(col(idCol).as("__id"),
      explode(expr(s"shingle_set(`$textCol`, $ngram)")).as("__s"))
      .localCheckpoint()
    val nG = trG.groupBy(col("__id")).agg(count(lit(1)).as("n_grams"))
    val evG = evalSet.select(col(idCol).as("__eid"),
      explode(expr(s"shingle_set(`$textCol`, $ngram)")).as("__s"))
    // min_by on (−count, id): count desc then id ASC without negating
    // the id — ids of ANY orderable type (string uuids included) keep
    // the tie-break deterministic (review finding: −id silently casts
    // non-numeric ids to null)
    val top = trG.join(broadcast(evG), Seq("__s"))
      .groupBy(col("__id"), col("__eid")).agg(count(lit(1)).as("__ov"))
      .groupBy(col("__id"))
      .agg(min_by(struct(col("__ov"), col("__eid")),
        struct((-col("__ov")).as("__neg"), col("__eid"))).as("__t"))
      .select(col("__id"), col("__t.__ov").as("n_overlap"),
        col("__t.__eid").as("top_eval_id"))
    train.select(col(idCol).as("__id"))
      .join(nG, Seq("__id"), "left")
      .join(top, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        col("top_eval_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        when(coalesce(col("n_grams"), lit(0L)) === 0L, lit(0.0))
          .otherwise(coalesce(col("n_overlap"), lit(0L)).cast(DoubleType) /
            col("n_grams").cast(DoubleType)).as("overlap_frac"))
  }

  /** The REMOVAL half of exact-substring dedup (Lee et al. 2022 — q66 is
    * the detection half): word `n`-grams appearing in ≥ `minDf` distinct
    * documents are repeated spans; every word position they cover is cut
    * and the document reassembled from the survivors. Shapes: one shuffle
    * on the gram for the df count, a semi-join back (gram-keyed, so hot
    * boilerplate grams combine map-side), and a per-doc reassembly whose
    * state is bounded by document length (q62's contract). Returns
    * (id, n_words, n_removed, cleaned). */
  def removeCommonSpans(df: DataFrame, textCol: String, idCol: String,
      n: Int = 8, minDf: Int = 2): DataFrame = {
    val w = df.select(col(idCol).as("__id"),
      split(trim(col(textCol)), " ").as("__w"))
    // gram key joins words with NUL — '_' collides for words containing
    // '_' (["a_b","c"] vs ["a","b_c"]), falsely marking spans common;
    // NUL cannot appear in whitespace-split tokens of real text
    val grams = w.filter(size(col("__w")) >= n)
      .select(col("__id"), posexplode(expr(
        s"transform(sequence(0, size(__w) - $n), i -> concat_ws(chr(0), slice(__w, i + 1, $n)))"))
        .as(Seq("__p", "__g")))
    val common = grams.select(col("__id"), col("__g")).distinct()
      .groupBy(col("__g")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minDf).select(col("__g"))
    val covered = grams.join(common, Seq("__g"), "left_semi")
      .select(col("__id").as("__cid"),
        explode(sequence(col("__p"), col("__p") + lit(n - 1))).as("__cp"))
      .distinct()
    val toks = w.select(col("__id"), posexplode(col("__w")).as(Seq("__p", "__word")))
    val kept = toks.join(covered,
      toks("__id") === covered("__cid") && toks("__p") === covered("__cp"),
      "left_anti")
    val reb = kept.groupBy(col("__id")).agg(
      count(lit(1)).as("__nk"),
      array_join(transform(array_sort(collect_list(struct(col("__p"), col("__word")))),
        x => x.getField("__word")), " ").as("cleaned"))
    w.select(col("__id"), size(col("__w")).cast(LongType).as("n_words"))
      .join(reb, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_words"),
        (col("n_words") - coalesce(col("__nk"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    * Models", Table A1 — the standard pre-training repetition filters,
    * adapted to word n-grams for single-line corpora): per document,
    * the character fraction covered by the MOST FREQUENT word 2-gram and
    * 3-gram (looping generations, chorus spam) and by DUPLICATED word
    * 10-grams (copy-paste boilerplate), plus the combined flag at the
    * paper's thresholds (0.20 / 0.18 / 0.10). Everything is per-doc —
    * gram generation is per-row array work and every shuffle/window keys
    * on the doc id (zero cross-document state) — so the filter scales
    * linearly and salts are never needed. Fractions are exact-integer
    * ratios under a single double division (cross-engine exact; q83's
    * policy). */
  def gopherRepetition(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val base = df.select(col(idCol).as("__id"),
      split(trim(col(textCol)), "\\s+").as("__w"),
      length(trim(col(textCol))).cast(LongType).as("n_chars"))
    // chars covered by the most frequent n-gram = count × gram length;
    // ties break to the lexicographically smallest gram (deterministic
    // in both engines' binary collations). Each signal leg re-scans the
    // (doc_id, text)-pruned source with per-row array gram generation —
    // measured 1.8× FASTER at sf0.1 than a shared tagged-struct explode
    // (the struct materialization cost more than the extra pruned scans);
    // if scanning ever dominates at cluster scale, persist `base`.
    def topGramFrac(n: Int): DataFrame = {
      val grams = base.filter(size(col("__w")) >= n)
        .select(col("__id"), col("n_chars"), explode(expr(
          s"transform(sequence(0, size(__w) - $n), i -> concat_ws(' ', slice(__w, i + 1, $n)))"))
          .as("__g"))
      val counts = grams.groupBy(col("__id"), col("n_chars"), col("__g"))
        .agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(col("__id")).orderBy(col("__c").desc, col("__g"))
      counts.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("__id"),
          (col("__c") * length(col("__g")).cast(LongType) / col("n_chars"))
            .as(s"top${n}_frac"))
    }
    // word positions covered by ANY within-doc repeated 10-gram, counted
    // once (overlaps don't double-count), as a fraction of doc chars
    val n10 = 10
    val toks = base.select(col("__id"),
      posexplode(col("__w")).as(Seq("__p", "__word")))
    val wd = Window.partitionBy(col("__id"), col("__g"))
    val covered = base.filter(size(col("__w")) >= n10)
      .select(col("__id"), posexplode(expr(
        s"transform(sequence(0, size(__w) - $n10), i -> concat_ws(chr(0), slice(__w, i + 1, $n10)))"))
        .as(Seq("__p", "__g")))
      .withColumn("__c", count(lit(1)).over(wd))
      .filter(col("__c") >= 2)
      .select(col("__id").as("__cid"),
        explode(sequence(col("__p"), col("__p") + lit(n10 - 1))).as("__cp"))
      .distinct()
    val dupChars = toks.join(covered,
        toks("__id") === covered("__cid") && toks("__p") === covered("__cp"),
        "left_semi")
      .groupBy(col("__id"))
      .agg(sum(length(col("__word")).cast(LongType)).as("__dchars"))
    base.select(col("__id"), col("n_chars"))
      .join(topGramFrac(2), Seq("__id"), "left")
      .join(topGramFrac(3), Seq("__id"), "left")
      .join(dupChars, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_chars"),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        coalesce(col("top3_frac"), lit(0.0)).as("top3_frac"),
        // empty/whitespace-only text has n_chars = 0: guard the division
        // (0/0 is NULL or an ANSI error, either of which would poison
        // `flagged`) — an empty doc is simply not repetitive
        when(col("n_chars") > 0,
          coalesce(col("__dchars") / col("n_chars"), lit(0.0)))
          .otherwise(lit(0.0)).as("dup10_frac"))
      .withColumn("flagged",
        col("top2_frac") > 0.20 || col("top3_frac") > 0.18 ||
          col("dup10_frac") > 0.10)
  }

  /** Bloom-filter decontamination — the shape [[decontaminate]] grows into
    * when even the broadcast eval-shingle SET is too big: the eval slice
    * compresses to `numBits` of bloom (1 MiB default) built by ONE
    * mergeable aggregate, and the train side is a pure per-row probe —
    * no join, no train-side shuffle beyond the per-doc distinct.
    * Guarantees: no false negatives (every truly contaminated doc is
    * flagged — a bloom property, not a tuning outcome); false positives
    * over-flag at a rate set by numBits/items. Flags are
    * `maybe_contaminated`; q97 rides the exact flag alongside and gates
    * the FP rate per round (q41's self-gating pattern). */
  def decontaminateBloom(train: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, ngram: Int = 3,
      expectedItems: Long = 4000000L, numBits: Long = 1L << 23): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    // Spark's native bloom machinery (the runtime-filter aggregate) —
    // registered only internally, so built directly as expressions.
    val bfAgg = new BloomFilterAggregate(
      new XxHash64(Seq(expression(col("__s")))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    // The bloom is collected once: `numBits` of driver-side state (1 MiB
    // default) REGARDLESS of eval-set size — bounded like the IVF/PQ
    // training samples, and required by might_contain's constant-bloom
    // contract. It then rides the probe as a literal: every executor
    // filters locally, nothing joins, nothing shuffles.
    val bloomBytes = evalSet
      .select(explode(expr(s"shingle_set(`$textCol`, $ngram)")).as("__s"))
      .agg(column(bfAgg).as("__bf"))
      .head.getAs[Array[Byte]](0)
    val flagged = train
      .select(col(idCol), explode(expr(s"shingle_set(`$textCol`, $ngram)")).as("__s"))
      .filter(column(BloomFilterMightContain(Literal(bloomBytes, BinaryType),
        new XxHash64(Seq(expression(col("__s")))))))
      .select(col(idCol)).distinct()
      .withColumn("__b", lit(true))
    train.join(flagged, Seq(idCol), "left")
      .withColumn("maybe_contaminated", coalesce(col("__b"), lit(false)))
      .drop("__b")
  }

  /** Token-budget sequence packing (q59): assigns each row a `seq_id` so
    * consecutive rows (by `orderCol`, independently per `shardCol`) fill
    * `budget`-token training sequences — seq_id = tokens-before div
    * budget, the deterministic windowable packer. One shuffle on the
    * shard key; shards fill in parallel, exactly how a production
    * tokenizer packs per output shard. */
  def packSequences(df: DataFrame, tokensCol: String, shardCol: String,
      orderCol: String, budget: Long = 2048L): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__cum div $budget"))
      .drop("__cum")
  }

  /** Overlapping fixed-size character chunking (q62) — the
    * context-window splitter every RAG/pretraining pipeline needs. Chunk i
    * of a doc covers 1-based [i·stride + 1, i·stride + chunkSize], stride =
    * chunkSize − overlap; every doc with text yields ⌊(len−1)/stride⌋ + 1
    * chunks, so the final chunk may be short but no character is dropped.
    * All input columns (including any id) are carried through unchanged.
    * Pure per-row explode+projection: no shuffle, linear in output size. */
  def chunkDocs(df: DataFrame, textCol: String,
      chunkSize: Int = 500, overlap: Int = 100): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = (chunkSize - overlap).toLong
    df.withColumn("__len", length(col(textCol)).cast(LongType))
      .filter(col("__len") > 0)
      .withColumn("chunk_id",
        explode(expr(s"sequence(cast(0 as bigint), (__len - 1) div $stride)")))
      .withColumn("chunk_start", col("chunk_id") * lit(stride) + lit(1L))
      .withColumn("chunk",
        expr(s"substr(`$textCol`, cast(chunk_start as int), $chunkSize)"))
      .withColumn("chunk_len", length(col("chunk")).cast(LongType))
      .drop("__len")
  }

  /** Token-frequency vocabulary (q63): lowercase alnum tokens, global
    * counts, deterministic top-k (count desc, token asc). The top-k is a
    * TakeOrderedAndProject over a partial+final count agg — one shuffle on
    * the token, never a global sort, so it holds at any corpus size. */
  def vocabulary(df: DataFrame, textCol: String, topK: Int = 1000): DataFrame =
    df.select(explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topK)

  /** Pairwise Jensen–Shannon divergence between per-group token
    * distributions (q228) — the data-MIXING audit next to [[vocabulary]]:
    * how far apart are two sources' unigram distributions? 0 = identical,
    * ln 2 = disjoint; symmetric and bounded, unlike the raw KL behind
    * q136's PSI. This is the number that drives mixture re-weighting and
    * the "is this new crawl slice actually new text?" call.
    *
    * Identity used: with cm = each side's probability mass on the SHARED
    * vocabulary, JSD(P,Q) = ½·Σ_shared[p·ln(2p/(p+q)) + q·ln(2q/(p+q))]
    * + ½·ln2·(1−cm_P) + ½·ln2·(1−cm_Q) — a token private to one side
    * contributes exactly ½·p·ln2, so the disjoint mass folds into a
    * closed form over integer masses and the vocabulary join can stay
    * inner (never full-outer). Pairs that share nothing are restored by
    * a left join from the #groups² pair frame and read exactly ln 2.
    *
    * Exactness: each shared-token term is nano-quantized before the
    * order-free long sum (q113/q128 policy); the private-mass correction
    * is ONE fixed double chain over exact integer masses with ln 2 a
    * shared literal — no accumulation, no libm beyond the quantized
    * terms, identical expression shape on the oracle.
    *
    * 100 TB shape: token counts are ONE partial-agg-friendly keyed
    * shuffle; group totals are #groups rows; the pair join keys on the
    * token over the VOCABULARY table (≤ #groups rows per token, fan-out
    * ≤ #groups² per token — independent of corpus row count). Output is
    * #groups·(#groups−1)/2 rows. */
  def jsDivergence(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val Q = 1.0e9
    val Ln2 = 0.6931471805599453
    val cnt = df.select(col(groupCol).cast(StringType).as("__g"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col("__g"), col("__t")).agg(count(lit(1)).as("__c"))
      .localCheckpoint() // feeds totals + both sides of the pair join
    val tot = cnt.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
      .localCheckpoint() // #groups rows; feeds the pair frame twice
    val p = cnt.join(broadcast(tot), Seq("__g"))
    val pd = col("c1").cast(DoubleType) / col("n1").cast(DoubleType)
    val qd = col("c2").cast(DoubleType) / col("n2").cast(DoubleType)
    val term = lit(0.5) * (pd * log(lit(2.0) * pd / (pd + qd)) +
      qd * log(lit(2.0) * qd / (pd + qd)))
    val shared = p.select(col("__g").as("g1"), col("__t"),
        col("__c").as("c1"), col("__n").as("n1"))
      .join(p.select(col("__g").as("g2"), col("__t"),
        col("__c").as("c2"), col("__n").as("n2")), Seq("__t"))
      .filter(col("g1") < col("g2"))
      .select(col("g1"), col("g2"), col("c1"), col("c2"),
        round(term * lit(Q)).cast(LongType).as("__q"))
      .groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("n_common"), sum(col("c1")).as("__cm1"),
        sum(col("c2")).as("__cm2"), sum(col("__q")).as("__s"))
    val allPairs = tot.select(col("__g").as("g1"), col("__n").as("n1"))
      .join(tot.select(col("__g").as("g2"), col("__n").as("n2")),
        col("g1") < col("g2"))
    allPairs.join(shared, Seq("g1", "g2"), "left")
      .select(col("g1").as(s"${groupCol}_a"), col("g2").as(s"${groupCol}_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("__s"), lit(0L)).cast(DoubleType) / lit(Q) +
          lit(0.5) * lit(Ln2) * (lit(1.0) -
            coalesce(col("__cm1"), lit(0L)).cast(DoubleType) /
              col("n1").cast(DoubleType)) +
          lit(0.5) * lit(Ln2) * (lit(1.0) -
            coalesce(col("__cm2"), lit(0L)).cast(DoubleType) /
              col("n2").cast(DoubleType))).as("jsd"))
  }

  /** Per-group Zipf rank-frequency fit (q229) — the corpus NATURALNESS
    * audit: log-log OLS of token frequency on frequency rank over each
    * group's top-`maxRank` types. Natural language sits near slope −1
    * (Zipf's law); a template farm flattens the head and machine
    * gibberish steepens the tail, so a source whose slope drifts far
    * from −1 is the first place to look — the cross-doc companion to
    * q107's per-doc repetition and q128's entropy gates.
    *
    * Exactness: ln(rank) and ln(count) are nano-quantized longs; every
    * OLS moment is an exact Decimal(38,0) sum of their products (HUGEINT
    * twins on the oracle); slope and r² are fixed double chains over
    * those exact integers. All-equal counts make the y-variance 0 —
    * slope 0/positive = 0.0 and r² NULL (0/0), never NaN.
    *
    * 100 TB shape: ONE keyed count shuffle to the (group, token)
    * vocabulary, a top-`maxRank` window partitioned BY GROUP over that
    * vocabulary (bounded by vocab size, not corpus rows), and a
    * #groups-row moment aggregate. Groups with fewer than `minRanks`
    * ranked types are dropped (a 10-type source has no meaningful fit). */
  def zipfFit(df: DataFrame, textCol: String, groupCol: String,
      maxRank: Int = 200, minRanks: Int = 20): DataFrame = {
    require(maxRank >= 2, s"zipfFit needs maxRank >= 2, got $maxRank")
    require(minRanks >= 2 && minRanks <= maxRank,
      s"zipfFit needs 2 <= minRanks <= maxRank, got $minRanks")
    val dec = DecimalType(38, 0)
    val cnt = df.select(col(groupCol).cast(StringType).as("__g"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col("__g"), col("__t")).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__c").desc, col("__t"))
    val ranked = cnt.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= maxRank)
      .select(col("__g"),
        round(log(col("__r").cast(DoubleType)) * lit(1.0e9))
          .cast(LongType).as("__x"),
        round(log(col("__c").cast(DoubleType)) * lit(1.0e9))
          .cast(LongType).as("__y"))
    val m = ranked.groupBy(col("__g")).agg(
        count(lit(1)).as("__n"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(col("__x").cast(dec) * col("__x")).as("__sxx"),
        sum(col("__x").cast(dec) * col("__y")).as("__sxy"),
        sum(col("__y").cast(dec) * col("__y")).as("__syy"))
      .filter(col("__n") >= minRanks.toLong)
    val nd = col("__n").cast(dec)
    val num = nd * col("__sxy") - col("__sx") * col("__sy")
    val denx = nd * col("__sxx") - col("__sx") * col("__sx")
    val deny = nd * col("__syy") - col("__sy") * col("__sy")
    m.select(col("__g").as(groupCol), col("__n").as("n_ranks"),
      (num.cast(DoubleType) / denx.cast(DoubleType)).as("zipf_slope"),
      when(deny === lit(0), lit(null).cast(DoubleType))
        .otherwise(num.cast(DoubleType) * num.cast(DoubleType) /
          (denx.cast(DoubleType) * deny.cast(DoubleType))).as("r2"))
  }

  /** Good–Turing frequency smoothing over the word n-gram vocabulary
    * (q230) — the classical unseen-mass estimator: from the frequency-
    * of-frequencies table N_r, the smoothed count r* = (r+1)·N_{r+1}/N_r
    * and the probability the NEXT n-gram is an unseen type P₀ = N₁/N.
    * This is exactly what Katz backoff discounts a bigram LM (q113's
    * kin) with, and the "how much of the gram space have we not crawled
    * yet" coverage estimate for a corpus slice. Default `ngram=2`: the
    * bigram table is where the singleton/doubleton mass lives (a unigram
    * vocabulary saturates on any real corpus and has an empty low-r
    * histogram).
    *
    * Output: one row per observed count r ≤ `maxR` — (r, n_types,
    * r_star, gt_prob = r_star/N) — plus the r=0 row carrying the unseen
    * mass in gt_prob. r* is NULL when no type has count r+1 (GT is
    * undefined there — never coerced to 0), hence the self-join on
    * r+1 rather than a lead(): an absent count must read as absent,
    * not as the next PRESENT row.
    *
    * Exactness/scale: gram formation is a per-doc window (lead over the
    * token position — the q113 device, zero cross-doc state) feeding two
    * partial-agg-friendly keyed shuffles (gram → count, count →
    * histogram); the histogram is ≤ #distinct-counts rows (tiny at any
    * corpus size — counts cluster), so the r+1 join and the totals
    * broadcast are free; every ratio is one fixed double chain over
    * exact integers. */
  def goodTuring(df: DataFrame, textCol: String, idCol: String,
      ngram: Int = 2, maxR: Int = 10): DataFrame = {
    require(maxR >= 1, s"goodTuring needs maxR >= 1, got $maxR")
    require(ngram == 1 || ngram == 2,
      s"goodTuring supports ngram of 1 or 2, got $ngram")
    val toks = df.select(col(idCol).as("__id"),
        posexplode(split(lower(col(textCol)), "[^a-z0-9]+"))
          .as(Seq("__p", "__t")))
      .filter(col("__t") =!= "")
    val grams =
      if (ngram == 1) toks.select(col("__t").as("__gm"))
      else {
        val w = Window.partitionBy(col("__id")).orderBy(col("__p"))
        toks.withColumn("__t2", lead(col("__t"), 1).over(w))
          .filter(col("__t2").isNotNull)
          .select(concat(col("__t"), lit(" "), col("__t2")).as("__gm"))
      }
    val cnt = grams.groupBy(col("__gm")).agg(count(lit(1)).as("__c"))
    val hist = cnt.select(col("__c").as("r"))
      .groupBy(col("r")).agg(count(lit(1)).as("n_types"))
      .localCheckpoint() // tiny; feeds the r+1 self-join + totals
    val tot = hist.agg(sum(col("r") * col("n_types")).as("__N"),
      sum(when(col("r") === 1L, col("n_types")).otherwise(lit(0L)))
        .as("__N1"))
    val nxt = hist.select((col("r") - lit(1L)).as("r"),
      col("n_types").as("__nn"))
    val rStar = when(col("__nn").isNull, lit(null).cast(DoubleType))
      .otherwise(((col("r") + lit(1L)) * col("__nn")).cast(DoubleType) /
        col("n_types").cast(DoubleType))
    val rows = hist.filter(col("r") <= maxR.toLong)
      .join(nxt, Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_types"), rStar.as("r_star"),
        when(rStar.isNull, lit(null).cast(DoubleType))
          .otherwise(rStar / col("__N").cast(DoubleType)).as("gt_prob"))
    val unseen = tot.select(lit(0L).as("r"),
      lit(null).cast(LongType).as("n_types"),
      lit(null).cast(DoubleType).as("r_star"),
      (col("__N1").cast(DoubleType) / col("__N").cast(DoubleType))
        .as("gt_prob"))
    rows.unionByName(unseen)
  }

  /** Per-group quota (q64) — the CommonCrawl-style "at most k documents
    * per domain/source" cap, keeping the best rows by `order` with a
    * deterministic tie-break. One shuffle on the group key; the window
    * never materializes more than a group per task. For a pathologically
    * hot group at 100 TB, pre-aggregate with a salted partial top-k first
    * (same remedy as saltedJoin). */
  def capPerGroup(df: DataFrame, groupCol: String, order: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
  }

  /** Two-phase salted per-group top-k (q73) — the hot-group remedy for
    * [[capPerGroup]]: phase 1 ranks within (group, salt) so one
    * pathologically hot group spreads over `saltFactor` tasks and each
    * task keeps at most k rows; phase 2 ranks the ≤ saltFactor·k
    * survivors per group. The global top-k of a total order is always
    * contained in the union of per-salt top-ks, so the result — including
    * the rank — EQUALS the single-window form (q73's oracle is exactly
    * q64's plain-window SQL). Same pattern as [[saltedJoin]].
    *
    * `saltOn` is the cheap column the salt is hashed from — pass the
    * unique tie-break key (e.g. the id that already makes `order` a
    * total order). Hashing the full row would read every wide column
    * (the document text) just to pick a bucket. */
  def capPerGroupSalted(df: DataFrame, groupCol: String, order: Seq[Column],
      k: Int, saltOn: Column, saltFactor: Int = 8): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltOn), lit(saltFactor)))
    val w1 = Window.partitionBy(col(groupCol), col("__salt")).orderBy(order: _*)
    val survivors = salted.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k).drop("__r1", "__salt")
    capPerGroup(survivors, groupCol, order, k)
  }

  /** Exact k-per-stratum deterministic sample (q65): rows are ranked
    * inside each stratum by the cross-engine md5 hash of their id (63-bit
    * mask keeps signed/unsigned order identical between engines, ties
    * broken by id) and the first k are kept. Unlike fraction-based
    * sampling this yields EXACTLY k rows per stratum, yet stays
    * deterministic under repartitioning/retries — no RNG state. One
    * shuffle on the stratum key. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val h = call_function("md5_lower64", col(idCol).cast(StringType))
      .bitwiseAND(lit(0x7FFFFFFFFFFFFFFFL))
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(idCol))
    df.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
  }

  /** Per-vector int8 scalar quantization (q67): codes_i =
    * ⌊v_i · 127/max|v| + ½⌋ — the storage layout ANN systems ship to disk
    * (4× smaller than float32, 127 ⇒ symmetric range, max|v| stored per
    * vector for dequantization). Pure projection. Doubles throughout so
    * the arithmetic is bit-identical cross-engine; all-zero vectors get
    * scale 0 and all-zero codes rather than NaN. */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__v", expr(s"transform(`$vecCol`, x -> cast(x as double))"))
      .withColumn("maxabs",
        expr("aggregate(__v, cast(0.0 as double), (a, x) -> greatest(a, abs(x)))"))
      .withColumn("codes", expr(
        "transform(__v, x -> cast(floor(case when maxabs = 0.0 then 0.0 " +
          "else x * 127.0 / maxabs + 0.5 end) as bigint))"))
      .drop("__v")

  // ------------------------------------------------------------ sampling

  /** Cross-engine deterministic permille bucket of a string key:
    * `(md5_lower64(key) & 0x7FFFFFFF) % 1000` — bit-identical to DuckDB's
    * `(md5_number_lower(key) & 2147483647) % 1000`, so hash-gated
    * pipelines stay oracle-checkable. */
  def hashBucket(key: Column): Column =
    call_function("md5_lower64", key).bitwiseAND(lit(0x7FFFFFFFL)) % lit(1000L)

  /** Deterministic train/val/test assignment by id hash — a pure per-row
    * projection: no shuffle, no RNG state, stable under repartitioning
    * and retries, and new rows land in splits at the configured permille
    * ratios without touching old assignments (the property a 100 TB
    * incremental corpus needs). */
  def assignSplit(df: DataFrame, idCol: String, valPermille: Int = 100,
      testPermille: Int = 100): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val b = hashBucket(col(idCol).cast(StringType))
    df.withColumn("split",
      when(b < lit(1000L - valPermille - testPermille), "train")
        .when(b < lit(1000L - testPermille), "val")
        .otherwise("test"))
  }

  /** Adds the raw `__gate` bucket for a (usually salted) key — callers
    * compare against per-stratum permille rates (see q48). */
  def sampleGate(df: DataFrame, key: Column): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("__gate", hashBucket(key))
  }

  /** Deterministic hash subsample: keeps `keepPermille`/1000 of rows. */
  def sampleByHash(df: DataFrame, key: Column, keepPermille: Int): DataFrame =
    sampleGate(df, key).filter(col("__gate") < keepPermille).drop("__gate")

  /** Deterministic negative sampling for contrastive training pairs:
    * each anchor row draws `k` pseudo-random partners by hashing
    * (anchor id, draw index) into the dense id domain [0, N) —
    * `md5_lower64(id:j) mod N` — then joining back on the sampled id.
    * Self-collisions (draw == anchor) are dropped rather than redrawn,
    * keeping every sample a pure function of (id, j): stable under
    * repartition, retry, and incremental append (new anchors draw
    * without touching old pairs), and replayable in ANSI SQL — no RNG
    * state anywhere.
    *
    * Requires a dense id domain [0, N) (the generator's contract here);
    * densify sparse ids with [[globalRank]] first. The contract is
    * ENFORCED in-plan (r9, review finding): min/max ride the same 1-row
    * count aggregate and a gap (min ≠ 0 or max ≠ N−1) raises before any
    * draw — on sparse ids the partner join would otherwise silently
    * drop gap-hitting draws and deflate negatives-per-anchor below k.
    * 100 TB shape: one 1-row count broadcast, a k-way per-anchor
    * explode (k rows per anchor, not a cartesian), one equi-join on the
    * sampled id to fetch partner payloads — shuffle-partitioned by the
    * sampled id, no skew because md5 spreads draws uniformly. */
  def negativeSample(df: DataFrame, idCol: String, k: Int,
      payload: Seq[String], anchorFilter: Column = lit(true)): DataFrame = {
    require(k > 0, "negativeSample: k must be positive")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // min/max catch offset and gap-at-the-end; countDistinct catches
    // duplicate ids with compensating gaps ([0,1,1,3] passes min/max but
    // is not dense — review finding). All ride one aggregate.
    val n = df.agg(count(lit(1)).as("__cnt"),
        countDistinct(col(idCol)).as("__cd"),
        min(col(idCol).cast(LongType)).as("__mn"),
        max(col(idCol).cast(LongType)).as("__mx"))
      .select(when(col("__mn") =!= 0L || col("__mx") =!= col("__cnt") - 1L ||
          col("__cd") =!= col("__cnt"),
        raise_error(concat(
          lit("negativeSample: id domain must be dense [0, N) — got min="),
          col("__mn").cast(StringType), lit(", max="),
          col("__mx").cast(StringType), lit(", n="),
          col("__cnt").cast(StringType), lit(", distinct="),
          col("__cd").cast(StringType),
          lit("; densify sparse ids with globalRank first (gap-hitting " +
            "draws would silently deflate negatives per anchor)")))
          .cast(LongType))
        .otherwise(col("__cnt")).as("__n"))
    val anchors = df.filter(anchorFilter)
      .select((col(idCol).cast(LongType)).as("anchor_id"))
      .crossJoin(broadcast(n))
      .select(col("anchor_id"), explode(expr(s"sequence(1, $k)")).as("j"),
        col("__n"))
      .withColumn("neg_id",
        call_function("md5_lower64",
          concat(col("anchor_id").cast(StringType), lit(":"),
            col("j").cast(StringType)))
          .bitwiseAND(lit(Long.MaxValue)) % col("__n"))
      .filter(col("neg_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("j").cast(LongType).as("j"), col("neg_id"))
    val partner = df.select(
      (col(idCol).cast(LongType)).as("neg_id") +:
        payload.map(c => col(c).as(s"neg_$c")): _*)
    anchors.join(partner, Seq("neg_id"))
      .select(col("anchor_id") +: col("j") +: col("neg_id") +:
        payload.map(c => col(s"neg_$c")): _*)
  }

  /** Temperature-based source mixing (the α-sampling of multilingual /
    * multi-source pre-training, e.g. mT5's α = 0.3 upweighting of small
    * sources): source `s` receives a quota ∝ n_s^α of the `totalTarget`
    * budget, flattening the natural size distribution, and the quota is
    * filled with the n_s^α-rank smallest cross-engine md5 ranks
    * ([[stratifiedSample]]'s determinism — no RNG, stable under
    * repartition/retry/append).
    *
    * Shapes at 100 TB: one per-source count agg (tiny frame), quota math
    * on that k-source frame (the only global window, over k rows — q83's
    * already-aggregated pattern), one rank window partitioned by source.
    * The default α = 0.5 computes weights with `sqrt`, which IEEE
    * requires correctly rounded — bit-identical across engines, so
    * quotas are oracle-exact; other α use `pow`, where libm last-ulp
    * differences could shift a knife-edge quota by one. Returns the kept
    * rows with their per-source `rk`. */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
      totalTarget: Long, alpha: Double = 0.5): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val wt =
      if (alpha == 0.5) sqrt(col("n").cast(DoubleType))
      else pow(col("n").cast(DoubleType), lit(alpha))
    val wAll = Window.orderBy(col(sourceCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val quotas = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .withColumn("__wt", wt)
      .withColumn("__tot", sum(col("__wt")).over(wAll))
      .select(col(sourceCol),
        floor(lit(totalTarget).cast(DoubleType) * col("__wt") / col("__tot"))
          .cast(LongType).as("quota"))
    val rw = Window.partitionBy(col(sourceCol)).orderBy(
      call_function("md5_lower64", col(idCol).cast(StringType))
        .bitwiseAND(lit(0x7FFFFFFFFFFFFFFFL)), col(idCol))
    df.withColumn("rk", row_number().over(rw).cast(LongType))
      .join(broadcast(quotas), Seq(sourceCol))
      .filter(col("rk") <= col("quota"))
  }

  /** BM25 relevance of every document against a fixed term set — the
    * retrieval scorer data-curation pipelines use to importance-sample
    * documents "similar to" a trusted reference query/corpus
    * (Okapi BM25: idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf_t = ln(1 + (N−df+0.5)/(df+0.5))).
    *
    * Shapes at 100 TB: the term list is a literal filter on the token
    * explode (only query-term postings survive the shuffle), df and
    * avgdl are tiny/1-row aggregates broadcast onto the postings (q69's
    * no-driver-count pattern), and the score is one per-doc sum. Float
    * policy: scores are computed with one identical expression tree in
    * both engines and rounded for OUTPUT only (q69's precedent — ln is
    * not IEEE-exactness-guaranteed, so ranking-free output ordered by id
    * keeps last-ulp libm differences harmless). */
  def bm25Score(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Score needs at least one query term")
    val toks = df.select(col(idCol).as("__id"),
      explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("__t"))
      .filter(col("__t") =!= "")
    // ONE pass over tokens: doc length + a conditional tf per query term
    // (terms are literals — no postings join at all)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      count(when(col("__t") === t, 1)).as(s"__tf_$i")
    }
    val perDoc = toks.groupBy(col("__id"))
      .agg(count(lit(1)).as("__dl"), tfCols: _*)
    // N, Σdl, and every per-term df in one 1-row aggregate, broadcast
    val dfCols = terms.indices.map(i =>
      count(when(col(s"__tf_$i") > 0, 1)).as(s"__df_$i"))
    val stats = perDoc.agg(count(lit(1)).as("__n"),
      (sum(col("__dl")).as("__sumdl") +: dfCols): _*)
    val joined = perDoc.crossJoin(broadcast(stats))
      .withColumn("__avgdl",
        col("__sumdl").cast(DoubleType) / col("__n").cast(DoubleType))
    // the total is a FIXED left-to-right expression chain over the term
    // list — no aggregation of doubles, so shuffle order cannot perturb
    // the sum and the oracle's identical chain matches bit-for-bit
    def termScore(i: Int): Column = {
      val tf = col(s"__tf_$i").cast(DoubleType)
      val dfT = col(s"__df_$i").cast(DoubleType)
      val idf = log(lit(1.0) +
        (col("__n").cast(DoubleType) - dfT + lit(0.5)) / (dfT + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast(DoubleType) / col("__avgdl")))
    }
    val total = terms.indices.map(termScore).reduce(_ + _)
    val hitCount = terms.indices
      .map(i => when(col(s"__tf_$i") > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    val scored = joined.select(col("__id"), col("__dl").as("dl"),
      hitCount.as("n_terms_hit"), total.as("bm25"))
    // documents whose text tokenizes to NOTHING never reach the token
    // explode — left-join them back with dl=0/score=0 so callers joining
    // scores by id see every input row. (Corpus stats N/avgdl remain
    // over token-bearing docs only: a zero-length doc contributes no
    // evidence to either, and including it would only deflate avgdl.)
    df.select(col(idCol).as("__id")).distinct()
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("dl"), lit(0L)).as("dl"),
        coalesce(col("n_terms_hit"), lit(0L)).as("n_terms_hit"),
        coalesce(col("bm25"), lit(0.0)).as("bm25"))
  }

  /** Dirichlet-smoothed query-likelihood retrieval score (q231) — the
    * language-modeling twin of [[bm25Score]] (Zhai & Lafferty 2004,
    * the other canonical lexical ranker): score(d) = Σ_q ln((tf_q,d +
    * μ·ctf_q/|C|) / (dl_d + μ)). Where BM25's idf punishes common
    * terms, QL's collection model P(q|C) = ctf/|C| smooths rare ones —
    * the two rankers disagree exactly where hybrid retrieval (q144 RRF)
    * earns its keep, which is why a retrieval stack wants both.
    *
    * Same shape and policies as [[bm25Score]]: terms are literals, so
    * each doc's tf vector comes from ONE conditional-count pass over
    * its tokens (no postings join); ctf/|C| come from ONE 1-row
    * broadcast aggregate; the score is a FIXED left-to-right chain over
    * the term list (never an aggregation of doubles — shuffle order
    * cannot perturb it). A term absent from the collection contributes
    * 0 (its background mass is undefined), and a doc that tokenizes to
    * nothing left-joins back with dl=0/score=0 — both mirrored by the
    * oracle. */
  def qlDirichletScore(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], mu: Double = 2000.0): DataFrame = {
    require(terms.nonEmpty, "qlDirichletScore needs at least one query term")
    require(mu > 0, s"qlDirichletScore needs mu > 0, got $mu")
    val toks = df.select(col(idCol).as("__id"),
      explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("__t"))
      .filter(col("__t") =!= "")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      count(when(col("__t") === t, 1)).as(s"__tf_$i")
    }
    val perDoc = toks.groupBy(col("__id"))
      .agg(count(lit(1)).as("__dl"), tfCols: _*)
    val ctfCols = terms.indices.map(i =>
      sum(col(s"__tf_$i")).as(s"__ctf_$i"))
    val stats = perDoc.agg(sum(col("__dl")).as("__ctot"), ctfCols: _*)
    val joined = perDoc.crossJoin(broadcast(stats))
    def termScore(i: Int): Column = {
      val tf = col(s"__tf_$i").cast(DoubleType)
      val ctf = col(s"__ctf_$i").cast(DoubleType)
      val bg = lit(mu) * ctf / col("__ctot").cast(DoubleType)
      when(col(s"__ctf_$i") === 0L, lit(0.0))
        .otherwise(log((tf + bg) / (col("__dl").cast(DoubleType) + lit(mu))))
    }
    val total = terms.indices.map(termScore).reduce(_ + _)
    val hitCount = terms.indices
      .map(i => when(col(s"__tf_$i") > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    val scored = joined.select(col("__id"), col("__dl").as("dl"),
      hitCount.as("n_terms_hit"), total.as("ql"))
    df.select(col(idCol).as("__id")).distinct()
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("dl"), lit(0L)).as("dl"),
        coalesce(col("n_terms_hit"), lit(0L)).as("n_terms_hit"),
        coalesce(col("ql"), lit(0.0)).as("ql"))
  }
}
