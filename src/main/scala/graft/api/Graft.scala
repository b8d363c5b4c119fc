package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The user-facing operator API: every pipeline primitive the query corpus
  * exercises, parameterized for arbitrary inputs. All operators are pure
  * DataFrame→DataFrame transforms (lazy, Catalyst-optimized, no driver-side
  * materialization) and follow the scale rules in SCALE.md.
  */
object Graft {

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
    val reps = df.select(md5(col(textCol)).as("fp"), col(textCol).as("__t"))
      .groupBy(col("fp")).agg(min(col("__t")).as("__t"))
      .select(col("fp"), expr("shingle_set(`__t`, 3)").as("ss"))
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
  private val validatedShingleArtifacts: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** One-row validation probe (the `:2010`-style convention) guarding the
    * `shingles` artifact hook: a caller passing an artifact built with a
    * DIFFERENT textCol/ngram than the call's would get silently wrong
    * pair sets — the shapes are identical, only the string multiset
    * differs. Samples one document id from the artifact, recomputes that
    * document's shingle set from `df`, and requires exact agreement;
    * fails loudly with the mismatch instead. */
  private def requireShingleArtifactMatches(art: DataFrame, df: DataFrame,
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
  private def prefixFilterJaccardPairsRaw(df: DataFrame, textCol: String,
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
    val wn = Window.partitionBy(col("__id")).orderBy(col("__df"), col("__t"))
    val pref = toks.join(dfc, Seq("__t"))
      .join(sizes, Seq("__id"))
      .withColumn("__pos", row_number().over(wn))
      // L = n − ⌈num·n/den⌉ + 1, all-integer
      .filter(col("__pos") <=
        col("__n") - expr(s"(($num * __n) + ${den - 1}) div $den") + lit(1))
      .select(col("__id"), col("__t"), col("__pos"), col("__n"))
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
    val cand = pairBudgetGuard(pref,
        Seq(pref.groupBy(col("__t")).agg(count(lit(1)).as("__n"))),
        maxPairs, "prefixFilterJaccardPairs").alias("a")
      .join(pref.alias("b"),
        col("a.__t") === col("b.__t") && col("a.__id") < col("b.__id") &&
          lit(den) * least(col("a.__n"), col("b.__n")) >=
            lit(num) * greatest(col("a.__n"), col("b.__n")) &&
          least(col("a.__n") - col("a.__pos"), col("b.__n") - col("b.__pos")) + lit(1) >=
            expr(s"(($num * (`a`.__n + `b`.__n)) + ${num + den - 1}) div ${num + den}"))
      .select(col("a.__id").as("da"), col("b.__id").as("db"))
      .distinct()
    // Verify with the skinny exploded-token join (measured FASTER here
    // than a per-pair array_intersect on collected shingle arrays: wide
    // array payloads replicated across every candidate row shuffle more
    // bytes than pair×token rows do).
    val inter = cand
      .join(toks.select(col("__id").as("da"), col("__t")), Seq("da"))
      .join(toks.select(col("__id").as("db"), col("__t")), Seq("db", "__t"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("__id").as("da"), col("__n").as("na")), Seq("da"))
      .join(sizes.select(col("__id").as("db"), col("__n").as("nb")), Seq("db"))
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

  private val artifactTables = scala.collection.mutable.Map[String, String]()
  @volatile private var artifactDirCached: String = null
  private def artifactDir(spark: org.apache.spark.sql.SparkSession): String = {
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

  // ------------------------------------------------------------ events

  /** Epoch day from a timestamp with FLOOR semantics on both engines
    * (q75/q77): `div` truncates toward zero, which diverges from DuckDB's
    * floor `//` for pre-1970 timestamps. Double division is floor-exact
    * here: |unix_micros| < 2^53, so the operands are exact; at exact
    * multiples the quotient is representable (IEEE division returns it
    * exactly), and elsewhere the true value is ≥ 1/86400000000 ≈ 1.2e-11
    * from an integer while the rounding error is ~2e-12. */
  def epochDay(ts: Column): Column =
    floor(unix_micros(ts) / lit(86400000000.0)).cast(LongType)

  /** Ordered funnel stage anchors (q74): stage i's anchor per user is the
    * FIRST event of `stages(i)` strictly after the user's stage-(i−1)
    * anchor (stage 0 anchors at the first matching event). Returns one
    * DataFrame per stage: (userCol, anchor). Each stage is a
    * pre-aggregated join — never a per-user subquery; a user drops out at
    * the first stage they fail. `tsCol` must be a totally-ordered numeric
    * (e.g. unix micros). */
  def funnelStages(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): Seq[DataFrame] = {
    require(stages.nonEmpty, "need at least one funnel stage")
    stages.foldLeft(Vector.empty[DataFrame]) { (acc, st) =>
      val base = acc.lastOption match {
        case None => events.filter(col(typeCol) === st)
        case Some(prev) => events
          .join(prev.select(col(userCol), col("anchor")), userCol)
          .filter(col(typeCol) === st && col(tsCol) > col("anchor"))
      }
      acc :+ base.groupBy(col(userCol)).agg(min(col(tsCol)).as("anchor"))
    }
  }

  /** Cohort retention triangle (q75): rows (cohort, offset, n_users)
    * where cohort = a user's first `dayCol` and offset = activity day −
    * cohort day. Two shuffles on the user, one on the cohort cell. */
  def retentionTriangle(df: DataFrame, userCol: String, dayCol: String): DataFrame = {
    val first = df.groupBy(col(userCol)).agg(min(col(dayCol)).as("cohort"))
    df.join(first, userCol)
      .withColumn("offset", col(dayCol) - col("cohort"))
      .groupBy(col("cohort"), col("offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Integer gap-filling spine per key (q77) — time-series densification:
    * for each key, one row per value of `seqCol` in [min, max] of that
    * key's observed range, left-joined back to the input (absent rows
    * carry nulls; coalesce to taste). One agg + one join shuffle, both on
    * the key. The explode fans each key to its span width — for a key
    * whose span dwarfs the rest, pre-split the range (same salting idea
    * as [[capPerGroupSalted]]). */
  def gapFill(df: DataFrame, keyCol: String, seqCol: String): DataFrame = {
    val spans = df.groupBy(col(keyCol))
      .agg(min(col(seqCol)).as("__d0"), max(col(seqCol)).as("__d1"))
    val spine = spans.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"))).as(seqCol))
    spine.join(df, Seq(keyCol, seqCol), "left")
  }

  /** Gaps-and-islands sessionization: per-key session counts with the
    * given inactivity gap. One shuffle on the key. */
  def sessionize(df: DataFrame, tsCol: String, keyCol: String,
      gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    df.withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        (unix_micros(col(tsCol)) - col("__prev")) > gapMinutes * 60L * 1000000L, 1))
      .groupBy(col(keyCol))
      .agg(count(col("__new")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  // ------------------------------------------------------------ layout

  /** Bit-spread of the low 16 bits of `c` into even bit positions — the
    * half of a Morton (Z-order) code. Five shift/mask rounds, pure integer
    * projection, codegen'd end-to-end. */
  def mortonSpread16(c: Column): Column = {
    var x = c.cast(LongType).bitwiseAND(lit(0xFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton (Z-order) interleave of two 16-bit values: bit i of `x`
    * lands at position 2i, bit i of `y` at 2i+1. Z-ordering is the standard
    * multi-dimensional clustering key: sorting/range-partitioning by it
    * co-locates rows that are close in BOTH dimensions, so parquet
    * row-group min/max stats prune scans filtered on either column — the
    * data-layout half of "fast at 100 TB" that no per-query plan can
    * recover after a bad write. */
  def mortonZ(x: Column, y: Column): Column =
    mortonSpread16(x).bitwiseOR(shiftleft(mortonSpread16(y), 1))

  /** Hilbert-curve index of two integer coordinates on the 2^order grid —
    * [[mortonZ]]'s locality-superior sibling (the curve never jumps, so
    * curve-consecutive cells are always grid-adjacent; q219 measures the
    * difference as per-bucket bounding-box area). Codegen'd native
    * expression; coordinates are masked to the grid like mortonZ's
    * 16-bit truncation. */
  def hilbertIndex(x: Column, y: Column, order: Int = 16): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.functions.HilbertIndex(
      expression(x.cast(LongType)), expression(y.cast(LongType)), order))
  }

  /** Hilbert clustering write-layout — [[zorderBy]] with the Hilbert
    * index as the clustering key: range-partition + in-partition sort,
    * so parquet min/max stats come out tighter in both dimensions than
    * the Z-order layout gives (no curve jumps across file boundaries). */
  def hilbertOrderBy(df: DataFrame, xCol: String, yCol: String,
      order: Int = 16, partitions: Int = 0): DataFrame = {
    val withH = df.withColumn("__h",
      hilbertIndex(col(xCol), col(yCol), order))
    val parted =
      if (partitions > 0) withH.repartitionByRange(partitions, col("__h"))
      else withH.repartitionByRange(col("__h"))
    parted.sortWithinPartitions(col("__h")).drop("__h")
  }

  /** Z-order clustering write-layout: range-partition by the Morton code of
    * (xCol, yCol) and sort within partitions, so a subsequent parquet write
    * yields files whose min/max stats are tight in both dimensions. The
    * code uses each column's low 16 bits — pre-bucket skewed or wide-range
    * columns into [0, 65536) (e.g. `pmod(xxhash64(c), 65536)` for ids, a
    * range rank for continuous values) before calling. */
  def zorderBy(df: DataFrame, xCol: String, yCol: String,
      partitions: Int = 0): DataFrame = {
    val z = mortonZ(col(xCol), col(yCol)).as("__z")
    val withZ = df.withColumn("__z", z)
    val parted =
      if (partitions > 0) withZ.repartitionByRange(partitions, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }

  /** Grid-partitioned (tiled) spatial join — the scale form of
    * "points in polygons": each point keys to its grid cell, each polygon
    * replicates to the cells its envelope covers, the cell key is a plain
    * EQUALITY join (shuffle or broadcast, AQE's choice), and exact
    * `st_contains` verifies candidates. A (point, polygon) pair meets in
    * at most ONE cell — the point's — so no dedup pass is needed. This
    * replaces the broadcast nested-loop (O(|points|·|polys|) under any
    * physical plan) with work ∝ candidates per cell: the standard
    * bin-then-verify shape every distributed spatial engine uses.
    * Column names of the two inputs must be disjoint. `cellSize` trades
    * polygon replication (big cells) against candidate precision (small
    * cells) — start near the median polygon extent. */
  def spatialJoinTiled(points: DataFrame, polygons: DataFrame,
      pointGeom: String, polyGeom: String, cellSize: Double = 1.0): DataFrame = {
    graft.functions.GraftFunctions.register(points.sparkSession)
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    val p = points
      .withColumn("__tx", floor(expr(s"st_x(`$pointGeom`)") / cellSize).cast(LongType))
      .withColumn("__ty", floor(expr(s"st_y(`$pointGeom`)") / cellSize).cast(LongType))
    val g = polygons
      .withColumn("__tx", explode(sequence(
        floor(expr(s"st_xmin(`$polyGeom`)") / cellSize).cast(LongType),
        floor(expr(s"st_xmax(`$polyGeom`)") / cellSize).cast(LongType))))
      .withColumn("__ty", explode(sequence(
        floor(expr(s"st_ymin(`$polyGeom`)") / cellSize).cast(LongType),
        floor(expr(s"st_ymax(`$polyGeom`)") / cellSize).cast(LongType))))
    p.join(g, Seq("__tx", "__ty"))
      .filter(expr(s"st_contains(`$polyGeom`, `$pointGeom`)"))
      .drop("__tx", "__ty")
  }

  // ------------------------------------------------------------ profiling

  /** One-pass per-column data profile: (col_name, n_rows, n_nonnull,
    * n_distinct, min_s, max_s) for each listed column — the pre-flight
    * check every ingest pipeline runs. One aggregation job; with
    * `approxDistinct` the distinct counts use HLL and the plan is a single
    * partial+final agg (the 100 TB mode — exact multi-column DISTINCT
    * plans an Expand of |cols| copies of the input). min/max are cast to
    * string so the profile is one uniform relation regardless of column
    * types. */
  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val nd = if (approxDistinct) approx_count_distinct(col(c))
               else countDistinct(col(c))
      Seq(count(col(c)).as(s"__nn_$c"), nd.as(s"__nd_$c"),
        min(col(c)).cast(StringType).as(s"__mn_$c"),
        max(col(c)).cast(StringType).as(s"__mx_$c"))
    } :+ count(lit(1)).as("__n")
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_s"), col(s"__mx_$c").as("max_s"))
    }
    agged.select(inline(array(rows: _*)))
  }

  /** Equi-width histograms of numeric columns — [[profile]]'s missing
    * distribution view. TWO aggregation jobs at any scale: pass 1 is one
    * partial+final min/max aggregate over every column (a 1-row
    * broadcast); pass 2 stacks the columns long, bins each value
    * (identical double math in both engines: width = (max−min)/bins,
    * bin = min(floor((v−min)/width), bins−1)) and counts per
    * (column, bin). Constant columns collapse to bin 0; empty bins are
    * simply absent; nulls are skipped. */
  def histogram(df: DataFrame, cols: Seq[String], bins: Int = 10): DataFrame = {
    require(cols.nonEmpty, "histogram needs at least one column")
    require(cols.distinct == cols, s"histogram column list has duplicates: $cols")
    // backslash is a Spark SQL string-literal escape: a trailing `\` in a
    // generated stack() label would swallow its closing quote
    require(cols.forall(c => !c.contains("'") && !c.contains("`") && !c.contains("\\")),
      "histogram column names may not contain quotes/backticks/backslashes")
    require(bins >= 1, s"histogram needs bins >= 1, got $bins")
    // non-finite values are skipped like nulls BEFORE min/max, so one NaN
    // cannot poison the width and collapse the whole histogram
    val stacked = df.select(expr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', cast(`$c` as double)").mkString(", ") +
        ") AS (col_name, v)"))
      .filter(col("v").isNotNull && !isnan(col("v")) &&
        abs(col("v")) =!= lit(Double.PositiveInfinity))
    // per-column min/max is a k-row broadcast (k = |cols|)
    val stats = stacked.groupBy(col("col_name"))
      .agg(min(col("v")).as("__mn"), max(col("v")).as("__mx"))
    val width = (col("__mx") - col("__mn")) / lit(bins.toDouble)
    stacked.join(broadcast(stats), Seq("col_name"))
      .withColumn("bin", when(col("__mx") > col("__mn"),
        least(floor((col("v") - col("__mn")) / width).cast(LongType),
          lit(bins - 1L))).otherwise(0L))
      .groupBy(col("col_name"), col("bin"), col("__mn"), col("__mx"))
      .agg(count(lit(1)).as("n"))
      .select(col("col_name"), col("bin"),
        (col("__mn") + col("bin") * width).as("bin_lo"),
        (col("__mn") + (col("bin") + lit(1L)) * width).as("bin_hi"),
        col("n"))
  }

  // ------------------------------------------------------------ intervals

  /** Merge overlapping/touching intervals per key (gaps-and-islands):
    * returns one row per merged island with (keyCol, island, island_start,
    * island_end, n_rows). `startCol`/`endCol` are numeric (e.g. unix
    * micros). Intervals overlap when next.start <= running max(end) —
    * touching intervals merge. One shuffle on the key; the window is a
    * running max, never a buffer of the whole key. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1))
      .withColumn("island",
        count(col("__new")).over(
          byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"), count(lit(1)).as("n_rows"))
  }

  // ------------------------------------------------------------ sampling

  /** Rendezvous (highest-random-weight) shard assignment: each row joins
    * the shard s ∈ [0, shards) maximizing `md5_lower64(s:id)` — the
    * consistent-placement primitive for routing a 100 TB corpus to
    * workers/buckets. The property that matters (and that q191 gates):
    * when a shard is ADDED, a key moves iff the new shard wins its
    * rendezvous — old shards' relative scores are untouched, so nothing
    * ever moves BETWEEN old shards and the expected movement is exactly
    * 1/(S+1) of keys, the theoretical minimum (vs ~all keys for mod-N).
    *
    * Shape: a pure per-row projection — the S candidate hashes are an
    * in-expression fold (`transform` + `aggregate` over a literal
    * sequence), NO explode, NO shuffle, nothing collected. Hashes are
    * 63-bit-masked so Spark's signed ordering matches the oracle's
    * unsigned; ties (never observed; probability ~2⁻⁶³) break toward the
    * smaller shard index in both engines. */
  def hrwAssign(df: DataFrame, idCol: String, shards: Int,
      outCol: String = "shard"): DataFrame = {
    require(shards > 0, s"hrwAssign: shards must be positive, got $shards")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // NULL id → NULL shard (without the guard the fold's seed would
    // silently route every null row to shard −1)
    df.withColumn(outCol, when(col(idCol).isNull, lit(null)).otherwise(expr(
      s"""aggregate(
         |  transform(sequence(0, ${shards - 1}), s -> struct(
         |    md5_lower64(concat(cast(s as string), ':', cast(`$idCol` as string)))
         |      & 9223372036854775807L as h,
         |    s as s)),
         |  struct(cast(-1 as bigint) as h, -1 as s),
         |  (acc, x) -> if(x.h > acc.h or (x.h = acc.h and x.s < acc.s), x, acc)
         |).s""".stripMargin)).cast(LongType))
  }

  /** Deterministic weight-proportional sampling: a row is kept when its
    * cross-engine hash bucket (0..999) is below `permille`, a per-row
    * integer column (cap at 1000 keeps everything). The weighted
    * generalization of [[sampleByHash]]: stable under repartition/retry,
    * no RNG state, new rows sampled at their own rate without touching
    * old decisions. Pure projection — no shuffle. */
  def sampleByWeight(df: DataFrame, key: Column, permille: Column): DataFrame =
    sampleGate(df, key).filter(col("__gate") < permille).drop("__gate")

  /** Linear multi-touch attribution: every conversion splits 1000
    * permille of credit equally across its qualifying touchpoints
    * (earlier events of `touchTypes` by the same user within
    * `windowUs`), the integer remainder going to the EARLIEST touch so
    * credit sums to exactly 1000 per conversion — no float splits, no
    * lost permille (the property that makes channel totals reconcile to
    * #conversions × 1000 at audit time). Returns one row per
    * (conversion, touch): conv_id, touch_id, channel, credit.
    *
    * 100 TB shape: one user-keyed join bounded by the attribution
    * window (the q50 interval-join family), then one window over the
    * conversion id — touches per conversion are window-bounded, so the
    * per-key fan-out is capped by user activity rate, not corpus size. */
  def linearAttribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, convType: String,
      touchTypes: Seq[String], windowUs: Long): DataFrame = {
    require(touchTypes.nonEmpty && windowUs > 0, "need touch types and a positive window")
    val e = events.select(col(userCol).as("__u"), col(typeCol).as("__ty"),
      unix_micros(col(tsCol)).as("__us"), col(idCol).as("__id"))
    val conv = e.filter(col("__ty") === convType)
      .select(col("__u"), col("__id").as("conv_id"), col("__us").as("__cus"))
    val touch = e.filter(col("__ty").isin(touchTypes: _*))
      .select(col("__u"), col("__id").as("touch_id"),
        col("__ty").as("channel"), col("__us").as("__tus"))
    val j = conv.join(touch, Seq("__u"))
      .filter(col("__tus") < col("__cus") &&
        col("__cus") - col("__tus") <= windowUs)
    val wc = Window.partitionBy(col("conv_id"))
    val wr = Window.partitionBy(col("conv_id")).orderBy(col("__tus"), col("touch_id"))
    j.withColumn("__m", count(lit(1)).over(wc))
      .withColumn("__rk", row_number().over(wr))
      .withColumn("credit", expr("1000 div __m") +
        when(col("__rk") === 1, expr("1000 % __m")).otherwise(lit(0L)))
      .select(col("conv_id"), col("touch_id"), col("channel"), col("credit"))
  }

  /** As-of join with tolerance: like [[asofJoin]] but a match is kept only
    * when `leftTs - rightTs <= toleranceUs` (timestamps are numeric, e.g.
    * unix micros) — the "most recent quote no older than X" form. Ties on
    * `rightTs` break toward the greatest `tieCol` (required so results are
    * deterministic — multiple right rows at one timestamp are real at
    * scale). Output: left rows + `asof_<payload>` + `asof_ts`, both null
    * when nothing matched inside the tolerance. Same union+window shape as
    * [[asofJoin]]: one shuffle on the key, no per-row subquery. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payload: String, tieCol: String,
      toleranceUs: Long): DataFrame = {
    val rowType = StructType(left.schema.fields)
    val pType = right.schema(payload).dataType
    val l = left.select(col(keyCol).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__kind"), lit(null).cast(pType).as("__p"),
      lit(null).cast(right.schema(tieCol).dataType).as("__tie"),
      struct(left.columns.map(col): _*).as("__row"))
    val r = right.select(col(keyCol).as("__k"), col(rightTs).as("__ts"),
      lit(2).as("__kind"), col(payload).as("__p"), col(tieCol).as("__tie"),
      lit(null).cast(rowType).as("__row"))
    // Rights at ts T sort after lefts at T (kind 2 > 1) → strictly-before
    // semantics; equal-ts rights order by __tie so last() is deterministic.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__kind"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__mp", last(col("__p"), ignoreNulls = true).over(w))
      .withColumn("__mts",
        last(when(col("__kind") === 2, col("__ts")), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
    val inTol = col("__mts").isNotNull &&
      (col("__ts") - col("__mts")) <= toleranceUs
    matched.select(col("__row.*"),
      when(inTol, col("__mp")).as(s"asof_$payload"),
      when(inTol, col("__mts")).as("asof_ts"))
  }

  /** As-of join: for each left row, the single right row with the greatest
    * `rightTs` strictly before `leftTs` on the same key. Union+window
    * formulation — one shuffle, no per-row subquery. `payload` is the right
    * column carried to the output. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payload: String): DataFrame = {
    val rowType = StructType(left.schema.fields)
    val l = left.select(col(keyCol).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__kind"), lit(null).cast(right.schema(payload).dataType).as("__p"),
      struct(left.columns.map(col): _*).as("__row"))
    val r = right.select(col(keyCol).as("__k"), col(rightTs).as("__ts"),
      lit(2).as("__kind"), col(payload).as("__p"), lit(null).cast(rowType).as("__row"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = false)
      .withColumn("__matched", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .select(col("__row.*"), col("__matched").as(s"asof_$payload"))
  }

  /** SCD2 temporal versioning: collapse an update stream into validity
    * intervals per key — a new version starts only when `attrCol` CHANGES
    * (gaps-and-islands on lag-inequality), `valid_to` is the next
    * version's start (null = current). One shuffle on the key; windows
    * run inside each key's sorted run, never a per-row subquery — the
    * dimension-history build every warehouse load runs, at fact-table
    * scale. `orderCol` breaks same-timestamp ties deterministically. */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, attrCol: String,
      orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderCol))
    // null-SAFE change test: `prev IS DISTINCT FROM attr`, with the first
    // row kept by row number — a plain `prev =!= attr` filter silently
    // drops a change TO null and re-opens a duplicate version after it
    val changed = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .drop("__rn")
    val wv = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderCol))
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev")
  }

  /** Point-in-time (PIT) join (q267) — the consumption half of [[scd2]]:
    * enrich each fact with the dimension VERSION that was valid at the
    * fact's timestamp (valid_from ≤ ts, and ts < valid_to or open-ended)
    * — the join every feature-store / ML-training pipeline needs to
    * avoid label leakage from future attribute values. Left join: facts
    * before any version (or keyless) keep NULL enrichment instead of
    * silently dropping.
    *
    * 100 TB shape: ONE equi-join keyed on `keyCol` (the interval test
    * rides as a residual predicate on co-shuffled rows) — never a
    * cartesian, never a window over facts; version tables are
    * per-key-small by construction. CONTRACT: versions must be disjoint
    * per key (what [[scd2]] emits — valid_to = next valid_from); an
    * overlapping-version dimension duplicates matching facts, which
    * surfaces in row counts rather than silently losing data. */
  def pitJoin(facts: DataFrame, versions: DataFrame, keyCol: String,
      tsCol: String, fromCol: String, toCol: String,
      payload: Seq[String]): DataFrame = {
    // loud-failure guards (the requirePreQuantized convention): a facts
    // table already carrying a reserved temp/output name, or a payload
    // column shadowing a facts column, would otherwise produce ambiguous
    // or silently duplicated output columns
    val fCols = facts.schema.fieldNames.toSet
    val reserved = Seq("__vk", "__vf", "__vt", "version_from")
    require(!reserved.exists(fCols.contains),
      s"pitJoin: facts must not contain reserved columns ${reserved.mkString(", ")}")
    val clash = payload.filter(fCols.contains)
    require(clash.isEmpty,
      s"pitJoin: payload columns ${clash.mkString(", ")} collide with facts " +
        "columns — alias them on the versions side first")
    val v = versions.select(
      (col(keyCol).as("__vk") +: col(fromCol).as("__vf") +:
        col(toCol).as("__vt") +: payload.map(col)): _*)
    facts.join(v,
      facts(keyCol) === col("__vk") && col("__vf") <= facts(tsCol) &&
        (col("__vt").isNull || facts(tsCol) < col("__vt")),
      "left").drop("__vk", "__vt")
      .withColumnRenamed("__vf", "version_from")
  }

  /** MERGE INTO semantics (the lakehouse CDC primitive): apply a
    * changeset to a snapshot in ONE full-outer join on the key.
    * `changes` carries the target's columns plus `opCol` ∈ {I,U,D}:
    * D drops the key (a D on an absent key is a no-op), I/U replace the
    * row WHOLESALE (an update may set columns to null — no coalesce
    * smearing of old values). Exactly one change row per key is required
    * for a deterministic result; feed [[scd2]]-style latest-wins
    * compaction first if the stream has more. Change rows with a NULL
    * key match nothing and are dropped (they would otherwise emit an
    * all-null output row); `validate = true` adds a debug-mode scan that
    * fails loudly on null or duplicate change keys instead.
    *
    * 100 TB shape: one shuffle on the key (full-outer cannot broadcast in
    * Spark); both sides hash-partition, AQE handles skew. No driver
    * traffic, no window over the snapshot. */
  def mergeChanges(target: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String = "op", validate: Boolean = false): DataFrame = {
    val tCols = target.schema.fieldNames
    require(changes.schema.fieldNames.contains(opCol),
      s"mergeChanges: changeset lacks op column '$opCol'")
    require(tCols.forall(changes.schema.fieldNames.contains),
      "mergeChanges: changeset must carry every target column")
    if (validate) {
      val badKeys = changes.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
        .filter(col(keyCol).isNull || col("__c") > 1).limit(1).collect()
      require(badKeys.isEmpty,
        s"mergeChanges: changeset has ${if (badKeys.head.isNullAt(0)) "NULL"
          else "duplicate"} '$keyCol' keys — compact latest-wins first (scd2)")
    }
    val t = target.as("t")
    val c = changes.filter(col(keyCol).isNotNull).as("c")
    t.join(c, col(s"t.$keyCol") === col(s"c.$keyCol"), "full_outer")
      .filter(!(col(s"c.$opCol") <=> lit("D")))
      .select(tCols.toIndexedSeq.map { n =>
        when(col(s"c.$keyCol").isNotNull, col(s"c.$n"))
          .otherwise(col(s"t.$n")).as(n)
      }: _*)
  }

  /** Weighted PageRank by power iteration — the canonical "iterative
    * distributed graph computation" (link/citation/transition authority).
    * pr(v) = (1-d)/N + d·(Σ_{u→v} pr(u)·w/outw(u) + dangling/N), a fixed
    * `iterations` rounds from the uniform vector.
    *
    * 100 TB shape, mirroring [[connectedComponents]]: the normalized edge
    * list is materialized ONCE (`localCheckpoint`) and every iteration is
    * one keyed join + one aggregation — per-round lineage truncated so
    * round t never re-executes rounds 0..t-1; dangling mass is a 1-row
    * aggregate broadcast back (never a driver round-trip); nothing
    * collects.
    *
    * Cross-engine float policy (q95 kmeans precedent): the only
    * order-sensitive op — summing in-contributions — is quantized to
    * pico-units (round(x·1e12) as long) so partial/map-side aggregation
    * order cannot perturb the sum in either engine; everything else is a
    * fixed double expression tree.
    *
    * Durability: `checkpointDir` switches the per-iteration lineage cut
    * from `localCheckpoint` (executor block store — fast, but an executor
    * loss mid-run kills the job) to reliable `checkpoint` into that
    * directory (HDFS/object store on a real cluster), which survives
    * executor loss. Local mode keeps the default.
    *
    * Weights stay DOUBLE end-to-end (no silent integer truncation) and
    * must be positive non-null — one validating scan up front, amortized
    * over `iterations` rounds, fails loudly instead of propagating
    * w/0 = NaN transition probabilities into every downstream rank. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, damping: Double = 0.85, iterations: Int = 10,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"pageRank needs iterations >= 1, got $iterations")
    val Q = 1.0e12
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val e = edges.select(col(srcCol).cast(StringType).as("src"),
      col(dstCol).cast(StringType).as("dst"),
      col(weightCol).cast(DoubleType).as("w"))
    val badW = e.filter(col("w").isNull || !(col("w") > 0.0)).limit(1).count()
    require(badW == 0L,
      s"pageRank: weight column '$weightCol' must be positive and non-null " +
        "(zero/negative/null weights would yield NaN transition probabilities)")
    val nodes = cut(e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct())
    val n = nodes.count() // ONE driver scalar for the whole run
    require(n > 0, "pageRank: empty edge list")
    val nD = n.toDouble
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val ep = cut(e.join(outw, Seq("src"))
      .select(col("src"), col("dst"),
        (col("w").cast(DoubleType) / col("ow").cast(DoubleType)).as("p")))
      // joined every round; upstream runs exactly once
    val dangling = cut(nodes.join(e.select(col("src").as("node")).distinct(),
      Seq("node"), "left_anti"))
    var ranks = nodes.withColumn("rank", lit(1.0) / lit(nD))
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
      ranks = cut(nodes.join(in, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          ((lit(1.0) - lit(damping)) / lit(nD) +
            lit(damping) * (coalesce(col("in_r"), lit(0.0)) +
              col("dang") / lit(nD))).as("rank"))) // truncate iterative lineage
      i += 1
    }
    ranks
  }

  /** Bigram language-model scoring (the CCNet/Wenzek et al. 2020 shape:
    * score every document by cross-entropy under an n-gram LM, filter or
    * bucket on it — here the LM is trained on the corpus ITSELF, the
    * self-perplexity form used to find gibberish/outlier documents
    * without an external model). Add-k smoothing:
    * P(w2|w1) = (C(w1,w2)+k)/(C(w1)+k·V), doc score = mean over its
    * bigrams of -ln P.
    *
    * 100 TB shape: bigram/unigram count tables are keyed aggregates of
    * the token stream (the vocabulary is orders of magnitude smaller than
    * the corpus), joined back by gram key — all hash-partitioned, nothing
    * broadcast but the 1-row vocab size. Per-doc -ln-P sums are
    * nano-quantized longs (order-free, q95 policy); the mean is one
    * double division. */
  def ngramLmScore(df: DataFrame, textCol: String, idCol: String,
      addK: Double = 0.5): DataFrame = {
    val Q = 1.0e9
    val toks = df.select(col(idCol).as("__id"),
      posexplode(split(lower(col(textCol)), "[^a-z0-9]+")).as(Seq("__p", "__t")))
      .filter(col("__t") =!= "")
    // bigrams via lead() over a per-doc window ordered by the ORIGINAL
    // position (empties already filtered, so the lead token is the next
    // SURVIVING token — bigrams never straddle a punctuation gap): ONE
    // shuffle of the token stream on __id, where the r7 self-join
    // re-shuffled it twice on a derived row-number key. At 100 TB that
    // saved shuffle is the dominant cost of the query.
    val wp = Window.partitionBy(col("__id")).orderBy(col("__p"))
    val bigrams = toks
      .select(col("__id"), col("__t").as("w1"), lead(col("__t"), 1).over(wp).as("w2"))
      .filter(col("w2").isNotNull)
    val uni = toks.groupBy(col("__t").as("w1")).agg(count(lit(1)).as("cu"))
    val bi = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val vocab = toks.agg(countDistinct(col("__t")).as("v"))
    val nll = log((col("cu").cast(DoubleType) + lit(addK) * col("v").cast(DoubleType)) /
      (col("cb").cast(DoubleType) + lit(addK)))
    val scored = bigrams.join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("__id"), round(nll * lit(Q)).cast(LongType).as("__q"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        ((sum(col("__q")).cast(DoubleType) / lit(Q)) / count(lit(1)))
          .as("cross_entropy"))
    // docs with < 2 tokens have no bigrams: keep them as rows (the bm25
    // contract) with n_bigrams=0 and a NULL score — "no evidence" is not
    // a zero cross-entropy
    df.select(col(idCol).as("__id")).distinct()
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("cross_entropy"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 — the filter
    * that built CCNet/most LLM web corpora): score every document's
    * bigram cross-entropy under a PER-LANGUAGE reference LM trained on
    * a held-out clean slice (`trainFilter`), then cut each language
    * into equal-frequency head/middle/tail terciles — head is the
    * "looks like the reference" slice a pretraining mix keeps.
    *
    * Differs from [[ngramLmScore]] (self-scoring) in the two ways that
    * matter: counts are keyed by LANGUAGE (one LM per language in one
    * plan, not a loop), and score-side bigrams LEFT-join the count
    * tables — unseen grams fall back to the add-k floor ln(kV/k)..
    * ln(V) instead of dropping. Per-doc −ln P sums are nano-quantized
    * longs (order-free); the only doubles are the final ce division
    * and the rank sort key.
    *
    * Terciles are NEVER a per-lang ntile window (one reducer per
    * language at 100 TB): [[globalRank]] over (lang, ce, id) gives
    * parallel ranks, a keyed agg gives each language's offset+count,
    * and bucket = (rank_in_lang−1)·3 div n_lang — pure integer
    * arithmetic, exact thirds, deterministic under ties.
    *
    * Documents with < 2 tokens have no bigrams and are unscorable —
    * dropped, as are languages absent from the train slice (no
    * reference LM). Returns (id, lang, n_bigrams, cross_entropy,
    * bucket ∈ head|middle|tail). */
  def ccnetBuckets(df: DataFrame, textCol: String, idCol: String,
      langCol: String, trainFilter: Column, addK: Double = 0.5): DataFrame = {
    val Q = 1.0e9
    def toks(d: DataFrame) = d.select(col(idCol).as("__id"),
        col(langCol).as("__lang"),
        posexplode(split(lower(col(textCol)), "[^a-z0-9]+")).as(Seq("__p", "__t")))
      .filter(col("__t") =!= "")
    val wp = Window.partitionBy(col("__id")).orderBy(col("__p"))
    def bigrams(tk: DataFrame) = tk
      .select(col("__id"), col("__lang"), col("__t").as("w1"),
        lead(col("__t"), 1).over(wp).as("w2"))
      .filter(col("w2").isNotNull)
    // the train tokenization feeds THREE consumers (uni, bi, vocab) —
    // materialize once instead of re-scanning the slice per consumer
    // (the SCALE.md multi-consumer doctrine)
    val trToks = toks(df.filter(trainFilter)).localCheckpoint()
    val uni = trToks.groupBy(col("__lang"), col("__t").as("w1"))
      .agg(count(lit(1)).as("cu"))
    val bi = bigrams(trToks).groupBy(col("__lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cb"))
    val vocab = trToks.groupBy(col("__lang")).agg(countDistinct(col("__t")).as("v"))
    val nll = log((coalesce(col("cu"), lit(0L)).cast(DoubleType) +
        lit(addK) * col("v").cast(DoubleType)) /
      (coalesce(col("cb"), lit(0L)).cast(DoubleType) + lit(addK)))
    val scored = bigrams(toks(df.filter(!trainFilter)))
      .join(bi, Seq("__lang", "w1", "w2"), "left")
      .join(uni, Seq("__lang", "w1"), "left")
      .join(broadcast(vocab), Seq("__lang"))
      .select(col("__id"), col("__lang"), round(nll * lit(Q)).cast(LongType).as("__q"))
      .groupBy(col("__id"), col("__lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__q")).as("__sq"))
      .withColumn("cross_entropy",
        (col("__sq").cast(DoubleType) / lit(Q)) / col("n_bigrams"))
    val g = globalRank(scored, Seq("__lang", "cross_entropy", "__id"), "__gr")
    val ls = g.groupBy(col("__lang"))
      .agg((min(col("__gr")) - lit(1L)).as("__off"), count(lit(1)).as("__nl"))
    g.join(broadcast(ls), Seq("__lang"))
      .withColumn("__b", expr("((__gr - __off - 1) * 3) div __nl"))
      .select(col("__id").as(idCol), col("__lang").as(langCol),
        col("n_bigrams"), col("cross_entropy"),
        when(col("__b") === 0, "head").when(col("__b") === 1, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Range-partitioned layout manifest: exact quantile boundaries of
    * `keyCol` at i/buckets, every row assigned to its quantile bucket,
    * returned as the per-bucket manifest (bucket, n, min_key, max_key) —
    * the planning pass behind sorted/range-clustered lake layouts
    * (what `repartitionByRange` does with SAMPLED boundaries, made
    * deterministic and oracle-able with exact ones).
    *
    * Shapes: boundaries are ONE aggregate row broadcast back (k−1
    * doubles); assignment is a pure projection (fold over the boundary
    * array); the manifest is a k-row aggregate. Spark's exact
    * `percentile` holds a value-count map per partition — fine to tens
    * of millions of distinct keys; at larger cardinalities swap in
    * `approx_percentile` upstream and keep the identical downstream
    * shape. Power-of-two `buckets` keeps i/buckets and the R-7
    * interpolation fractions exact binary fractions, so both engines
    * compute bit-identical boundaries over integer keys. */
  def rangeLayout(df: DataFrame, keyCol: String, buckets: Int = 8): DataFrame = {
    require(buckets >= 2, s"rangeLayout needs buckets >= 2, got $buckets")
    val ps = (1 until buckets).map(i => lit(i.toDouble / buckets))
    val bds = df.agg(percentile(col(keyCol), array(ps: _*)).as("__bds"))
    df.select(col(keyCol).as("__k"))
      .crossJoin(broadcast(bds))
      .select(col("__k"),
        aggregate(col("__bds"), lit(0),
          (acc, b) => acc + when(col("__k").cast(DoubleType) > b, 1).otherwise(0))
          .cast(LongType).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__k")).as("min_key"), max(col("__k")).as("max_key"))
  }

  /** DSIR importance weighting (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by the log-likelihood ratio of its hashed n-gram features under a
    * target-distribution model vs the raw-corpus model —
    * Σ_g ln(p_target(bucket(g)) / p_raw(bucket(g))), add-1 smoothed over
    * `buckets` hash buckets. High scores = "looks like the target
    * domain"; the standard pre-training data-selection scorer.
    *
    * 100 TB shape: the feature space is FIXED at `buckets` cells, so
    * both models are one ≤`buckets`-row aggregate broadcast back onto
    * the gram stream — no per-doc join against a vocabulary table, no
    * driver traffic. Cross-engine exactness: bucket counts are integers,
    * the probability ratio collapses to the cross-multiplied integer
    * form (ct+1)·(Nr+B) / ((cr+1)·(Nt+B)) under ONE double division
    * inside ln (products stay < 2^63 for corpora to ~2^31 grams), and
    * per-doc ln-sums are nano-quantized longs (q95 policy).
    * `isTarget` marks the target slice (e.g. `col("source") === "wiki"`);
    * target docs are scored too (self-ratio). Docs with no tokens stay
    * as rows with a NULL score. */
  def dsirWeight(df: DataFrame, textCol: String, idCol: String,
      isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"dsirWeight buckets must be a power of two >= 2, got $buckets")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val Q = 1.0e9
    val base = df.select(col(idCol).as("__id"), isTarget.as("__t"),
        split(lower(col(textCol)), "[^a-z0-9]+").as("__w0"))
      .select(col("__id"), col("__t"),
        filter(col("__w0"), w => w =!= "").as("__w"))
    // features = unigrams ++ word bigrams (the DSIR paper's hashed-ngram
    // featurization), bucketed by the cross-engine md5 hash; power-of-two
    // buckets make the bucket index a mask (no signed-% divergence)
    val grams = base.select(col("__id"), col("__t"), explode(concat(col("__w"),
        when(size(col("__w")) >= 2, zip_with(
          slice(col("__w"), lit(1), size(col("__w")) - 1),
          slice(col("__w"), lit(2), size(col("__w")) - 1),
          (a, b) => concat(a, lit(" "), b)))
          .otherwise(array()))).as("__g"))
    val bucketed = grams.select(col("__id"), col("__t"),
      call_function("md5_lower64", col("__g"))
        .bitwiseAND(lit((buckets - 1).toLong)).as("__b"))
    val counts = bucketed.groupBy(col("__b"))
      .agg(count(when(col("__t"), 1)).as("ct"), count(lit(1)).as("cr"))
    val tot = bucketed.agg(
      (count(when(col("__t"), 1)) + lit(buckets.toLong)).as("__ntb"),
      (count(lit(1)) + lit(buckets.toLong)).as("__nrb"))
    val llr = log(((col("ct") + lit(1L)) * col("__nrb")).cast(DoubleType) /
      ((col("cr") + lit(1L)) * col("__ntb")).cast(DoubleType))
    val scored = bucketed
      .join(broadcast(counts), Seq("__b"))
      .crossJoin(broadcast(tot))
      .select(col("__id"), round(llr * lit(Q)).cast(LongType).as("__q"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"),
        (sum(col("__q")).cast(DoubleType) / lit(Q)).as("dsir"))
    df.select(col(idCol).as("__id")).distinct()
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"), col("dsir"))
  }

  /** Pairwise corpus-overlap audit: Jaccard similarity of the distinct
    * word-`n`-gram shingle sets of every pair of sources — the
    * contamination/provenance matrix run before mixing corpora (a high
    * overlap means two "sources" are the same crawl twice). Exact, via
    * one shingle-keyed self-join of the (shingle, source)-distinct set:
    * inter(a,b) per pair, union = |A|+|B|−inter. No cartesian anywhere —
    * the join key is the shingle, and a shingle contributes C(s,2) pair
    * rows only across the s ≤ #sources sources that contain it (sources
    * number in the dozens, not the corpus size). Jaccard is one double
    * division, q83's policy. */
  def shingleOverlap(df: DataFrame, textCol: String, groupCol: String,
      n: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // the same codegen'd whitespace-token shingle kernel the dedup family
    // uses (q24/q52 semantics — one tokenization rule engine-wide)
    val sh = df.select(col(groupCol).as("__g"),
        explode(expr(s"shingle_set(`$textCol`, $n)")).as("__s"))
      .distinct()
    val sizes = sh.groupBy(col("__g")).agg(count(lit(1)).as("__d"))
    val inter = sh.alias("a").join(sh.alias("b"),
        col("a.__s") === col("b.__s") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("source_a"), col("b.__g").as("source_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("__g").as("source_a"), col("__d").as("__da")), Seq("source_a"))
      .join(sizes.select(col("__g").as("source_b"), col("__d").as("__db")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("inter"),
        (col("__da") + col("__db") - col("inter")).as("union_size"),
        (col("inter").cast(DoubleType) /
          (col("__da") + col("__db") - col("inter")).cast(DoubleType)).as("jaccard"))
  }

  /** Sketch-based source overlap: the KMV (k-minimum-values) estimate of
    * pairwise shingle union/intersection sizes between groups — the cheap
    * companion to [[shingleOverlap]]'s exact matrix. One pass builds a
    * k=128-long sketch per group (bounded partial-agg state, see
    * [[graft.functions.KmvAgg]]); ALL pairwise estimates then derive from
    * the G tiny sketches alone — no shingle-keyed join, no second scan.
    * At 100 TB this is the difference between a corpus-sized shuffle
    * (exact form, still available when the numbers must be exact) and a
    * G×1 KiB driver-sized algebra problem.
    *
    * KMV estimators (Beyer et al., SIGMOD'07), hashes uniform in
    * [0, 2^63): with τ = k-th smallest of the pair-union sketch,
    * est_union = (k-1)·2^63/τ; est_inter = ρ/|sk|·est_union where ρ
    * counts union-sketch members present in both sides (decidable from
    * the two sketches alone — h ≤ τ_union ≤ τ_side). When the union has
    * fewer than k distinct hashes the sketch IS the union and both
    * estimates are exact. Every output is either an exact integer or a
    * single identical IEEE expression chain, so the DuckDB oracle — which
    * recomputes the sketches from raw shingles, NOT from the sketch
    * algebra — hash-gates the merge semantics themselves. */
  def kmvSourceOverlap(df: DataFrame, textCol: String, groupCol: String,
      n: Int = 3, k: Int = 128): DataFrame = {
    require(k == 128, "kmv_agg is registered at k=128; other k need their own registration")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val kd = (k - 1).toDouble
    val sh = df.select(col(groupCol).as("__g"),
        explode(expr(s"shingle_set(`$textCol`, $n)")).as("__s"))
      .select(col("__g"), call_function("md5_lower64", col("__s"))
        .bitwiseAND(lit(Long.MaxValue)).as("__h"))
    // no distinct() shuffle: KmvAgg dedups inside its bounded buffer
    val sk = sh.groupBy(col("__g"))
      .agg(call_function("kmv_agg128", col("__h")).as("sk"))
    val pairs = sk.alias("a").join(sk.alias("b"), col("a.__g") < col("b.__g"))
      .select(col("a.__g").as("source_a"), col("b.__g").as("source_b"),
        col("a.sk").as("ska"), col("b.sk").as("skb"))
    pairs
      // k smallest of (ska ∪ skb) = the KMV sketch of the underlying union
      .withColumn("uk", slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
      .withColumn("ku", size(col("uk")).cast(LongType))
      .withColumn("tau", element_at(col("uk"), size(col("uk"))))
      .withColumn("rho", expr(
        "cast(size(filter(uk, x -> array_contains(ska, x) AND array_contains(skb, x))) as bigint)"))
      .withColumn("est_union",
        when(col("ku") < k, col("ku").cast(DoubleType))
          .otherwise(lit(kd) * lit(9.223372036854775808e18) / col("tau").cast(DoubleType)))
      .withColumn("est_inter",
        col("rho").cast(DoubleType) * col("est_union") / col("ku").cast(DoubleType))
      .select(col("source_a"), col("source_b"), col("ku"), col("tau"),
        col("rho"), col("est_union"), col("est_inter"))
  }

  // -------------------------------------------------- embedding clustering

  /** Deterministic k-means seeds: the k vectors with the smallest
    * cross-engine md5 rank of their id (stratifiedSample's hash — stable
    * under repartition/retry, reproducible by a SQL oracle; no RNG).
    * Returns (centroid components as exact float→double casts, ‖c‖²
    * accumulated left-to-right — the same value list_dot_product yields).
    * Driver-side materialization is k rows — bounded and documented, like
    * the IVF/PQ training samples. */
  private[graft] def kmeansSeeds(df: DataFrame, vecCol: String, idCol: String,
      k: Int): Array[Array[Double]] = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val h = call_function("md5_lower64", col(idCol).cast(StringType))
      .bitwiseAND(lit(0x7FFFFFFFFFFFFFFFL))
    df.select(col(vecCol).cast(ArrayType(DoubleType)).as("__v"), h.as("__h"),
        col(idCol).as("__id"))
      .orderBy(col("__h"), col("__id")).limit(k)
      .collect().map(_.getSeq[Double](0).toArray)
  }

  private def normSq(c: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    acc
  }

  /** Adds a `cid` nearest-centroid column — a pure codegen projection
    * (centroids ride the plan as reference objects; no join, no shuffle). */
  def kmeansAssigned(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    df.withColumn("cid", column(graft.functions.KmeansAssign(
      expression(col(vecCol)), centroids, centroids.map(normSq))))
  }

  /** Distributed Lloyd k-means over an embedding column — the 100 TB
    * shape: per iteration, assignment is a per-row projection against
    * broadcast-by-codegen centroids and the update is ONE partial+final
    * aggregate of k×dim cells; only k×dim values ever reach the driver
    * (MLlib's KMeans runs the same loop). Centroid components are
    * micro-unit integer sums → mean (q70's cross-engine-exact policy:
    * integer addition is associative under shuffle AND bit-identical in
    * DuckDB, where float→decimal casts are not). Clusters that lose all
    * rows vanish (both engines derive live centroids from the same
    * aggregate). Returns the final update table
    * (cid, pos, n, sum_micro, mean) — k×dim rows. */
  def kmeans(df: DataFrame, vecCol: String, idCol: String, k: Int = 8,
      iters: Int = 2): DataFrame = {
    require(k >= 1, s"kmeans needs k >= 1, got $k")
    require(iters >= 1, s"kmeans needs iters >= 1, got $iters")
    var centroids = kmeansSeeds(df, vecCol, idCol, k)
    require(centroids.nonEmpty, "kmeans: input has no rows to seed from")
    // cids are ORIGINAL seed labels for the whole run: if a cluster loses
    // all rows, its label dies with it rather than every later label
    // shifting down (the oracle keeps original cids through its CTE
    // chain, and callers correlating iterations need stable labels).
    // `cidOf` maps assignment index → original cid; live centroids stay
    // sorted by original cid, so index tie-break == original-cid
    // tie-break.
    var cidOf: Array[Int] = Array.range(0, centroids.length)
    var out: DataFrame = null
    var it = 0
    while (it < iters) {
      val remap = element_at(
        array(cidOf.map(c => lit(c)).toIndexedSeq: _*), col("cid") + 1)
      val upd = kmeansAssigned(df, vecCol, centroids)
        .withColumn("cid", remap)
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("x").cast(DoubleType) * lit(1000000.0)).cast(LongType))
            .as("sum_micro"))
        .select(col("cid"), col("pos").cast(LongType).as("pos"), col("n"),
          col("sum_micro"),
          (col("sum_micro").cast(DoubleType) / lit(1000000.0) / col("n"))
            .as("mean"))
      out = upd
      it += 1
      if (it < iters) {
        // k×dim cells to the driver — bounded, independent of row count.
        val cells = upd.select(col("cid"), col("pos"), col("mean")).collect()
        require(cells.nonEmpty,
          "kmeans: no non-null vectors survived assignment")
        val live = cells.map(_.getInt(0)).distinct.sorted
        val dim = cells.map(r => r.getLong(1)).max.toInt + 1
        val byCid = cells.groupBy(_.getInt(0))
        centroids = live.map { c =>
          val arr = new Array[Double](dim)
          byCid(c).foreach(r => arr(r.getLong(1).toInt) = r.getDouble(2))
          arr
        }
        cidOf = live
      }
    }
    out
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster first so
    * the quadratic cosine check runs only WITHIN clusters, then drop the
    * higher id of every near-dup pair. Against cosineNearDupPairsExact's
    * honest full quadratic this is the curation-scale shape — pair work
    * falls from C(n,2) to Σ C(|cluster|,2) (k ≈ √n makes it ~n^1.5), at
    * the cost of missing cross-cluster pairs (acceptable by construction:
    * near-dups land in the same cell of a fine enough quantizer).
    * Returns the survivors (id, cid), one shuffle on cid for the
    * self-join.
    *
    * `k = 0` (default) auto-scales: k = max(8, ceil(√n)) from one cheap
    * count, so the shape stays ~n^1.5 as the corpus grows instead of the
    * quadratic re-concentrating in fixed-k cells. A giant cluster (skewed
    * data defeats any k) is re-split by SALT before pairing:
    * `maxClusterSize = 0` (default) caps cells at max(100, 4·ceil(√n));
    * a cluster of size s splits into ceil(s/cap) deterministic hash
    * groups (cross-engine md5 of the id, so a SQL oracle replays it),
    * bounding every cell's pair work at the documented cost of missing
    * pairs that straddle salt groups — the capPerGroupSalted remedy,
    * applied. */
  def semanticDedup(df: DataFrame, vecCol: String, idCol: String,
      k: Int = 0, threshold: Double = 0.45,
      maxClusterSize: Int = 0): DataFrame = {
    val a = semanticDedupSalted(df, vecCol, idCol, k, maxClusterSize)
    val l = a.select(col("cid"), col("__salt"), col("__id").as("va"),
      col("__v").as("xa"), col("__nrm").as("na"))
    val r = a.select(col("cid"), col("__salt"), col("__id").as("vb"),
      col("__v").as("xb"), col("__nrm").as("nb"))
    val dropped = l.join(r, Seq("cid", "__salt"))
      .filter(col("va") < col("vb"))
      .filter(call_function("vec_dot", col("xa"), col("xb")) >=
        lit(threshold) * col("na") * col("nb"))
      .select(col("vb").as("__drop")).distinct()
    a.join(dropped, col("__id") === col("__drop"), "left_anti")
      .select(col("__id").as(idCol), col("cid"))
  }

  /** The salted cluster assignment behind [[semanticDedup]]: every row
    * with (__id, __v, __nrm, cid, __csz, __nsplit, __salt). Exposed
    * private[graft] so tests can assert the hot-cell split shape. */
  private[graft] def semanticDedupSalted(df: DataFrame, vecCol: String,
      idCol: String, k: Int, maxClusterSize: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val n = df.count()
    val rootN = math.ceil(math.sqrt(n.toDouble)).toInt
    val kk = if (k > 0) k else math.max(8, rootN)
    val cap = if (maxClusterSize > 0) maxClusterSize else math.max(100, 4 * rootN)
    val centroids = kmeansSeeds(df, vecCol, idCol, kk)
    val a0 = kmeansAssigned(df, vecCol, centroids)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"), col("cid"))
      .withColumn("__nrm", sqrt(call_function("vec_dot", col("__v"), col("__v"))))
    // hot-cell re-split: cluster sizes are a k-row broadcast; a cluster of
    // size s pairs within ceil(s/cap) salt groups instead of one
    val sizes = a0.groupBy(col("cid")).agg(count(lit(1)).as("__csz"))
    a0.join(broadcast(sizes), Seq("cid"))
      .withColumn("__nsplit", expr(s"(__csz + ${cap - 1}) div $cap"))
      .withColumn("__salt", pmod(
        call_function("md5_lower64", col("__id").cast(StringType))
          .bitwiseAND(lit(0x7FFFFFFFFFFFFFFFL)),
        col("__nsplit")))
  }

  /** Distributed BPE merge-table LEARNING (Sennrich et al. 2016) — the
    * corpus-scale half of tokenizer training (q103 is the apply half).
    * The corpus collapses to a word-frequency vocab in ONE aggregate (at
    * 100 TB the vocab is millions of rows, not corpus-sized); each merge
    * step is then one pair-count aggregate over that vocab plus a 1-row
    * argmax to the driver — [[kmeans]]' bounded-driver-traffic policy
    * (total driver bytes = `merges` rows). Words are held in q103's
    * delimited symbol form `|a||b||c|`, so the merge apply is a literal
    * left-to-right non-overlapping `replace` with identical semantics in
    * Spark and SQL. Ties break (count DESC, left ASC, right ASC) — a
    * total order, so the learned table is deterministic under any
    * shuffle order. Returns (step, l, r, cnt) in merge-priority order. */
  def bpeLearn(df: DataFrame, textCol: String, merges: Int = 6): DataFrame = {
    require(merges >= 1, s"bpeLearn needs merges >= 1, got $merges")
    val spark = df.sparkSession
    // vocab: (sym, freq) — lineage cut so each step replans 1+step
    // projections over a materialized base, not the corpus scan
    var words = df
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("w"), "(.)", "|$1|").as("sym"), col("freq"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var step = 1
    while (step <= merges) {
      val best = words
        .select(col("freq"),
          split(expr("substring(sym, 2, length(sym)-2)"), "\\|\\|").as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(a)-2), i -> struct(a[i] AS l, a[i+1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      require(best.nonEmpty, "bpeLearn: no adjacent symbol pairs left to merge")
      val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      require(l.matches("[a-z]+") && r.matches("[a-z]+"),
        s"bpeLearn: non-alpha symbol pair ('$l','$r')") // literals feed expr()
      learned += ((step.toLong, l, r, cnt))
      words = words.withColumn("sym", expr(s"replace(sym, '|$l||$r|', '|$l$r|')"))
      step += 1
    }
    import spark.implicits._
    learned.toSeq.toDF("step", "l", "r", "cnt").orderBy("step")
  }

  /** Segmented inverted index over literal query terms — the Lucene-shape
    * postings build. Postings are grouped per (term, doc-id bucket) so no
    * task ever materializes a whole term's posting list (a stopword's list
    * is the entire corpus — the classic straggler); each segment is a
    * bounded sorted run, and the per-term rollup hashes segment digests in
    * bucket order. Two keyed aggregates, both bounded; emits
    * (term, df, n_segments, index_md5). */
  def invertedIndex(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], bucketWidth: Long = 100L): DataFrame = {
    require(terms.nonEmpty, "invertedIndex needs at least one term")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    // doc-id bucketing needs integral ids; a silent cast of e.g. "doc-1"
    // would NULL every id and collapse all postings into one bucket with
    // a wrong df/index_md5 — fail fast on the schema instead
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"invertedIndex: id column '$idCol' must be an integral type " +
          s"(doc-id buckets are __id div $bucketWidth), got $other")
    }
    val toks = df.select(col(idCol).cast(LongType).as("__id"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .filter(col("term").isin(terms: _*))
      .distinct()
    val seg = toks
      .groupBy(col("term"), expr(s"__id div $bucketWidth").as("__bucket"))
      .agg(count(lit(1)).as("__cnt"),
        md5(array_join(
          transform(sort_array(collect_list(col("__id"))),
            _.cast(StringType)), ",")).as("__seg_md5"))
    seg.groupBy(col("term"))
      .agg(sum(col("__cnt")).as("df"),
        count(lit(1)).as("n_segments"),
        md5(array_join(
          transform(sort_array(collect_list(struct(col("__bucket"), col("__seg_md5")))),
            _.getField("__seg_md5")), ",")).as("index_md5"))
      .orderBy("term")
  }

  /** Join-key skew audit — the pre-flight diagnostic for shuffle planning
    * (salting / AQE skew thresholds) on a fact-table key. The per-key
    * count table collapses to a count-of-counts histogram (distinct count
    * VALUES, not keys — tiny at any corpus size), so the percentile walk
    * is a window over a frame measured in hundreds of rows, never a
    * global sort over keys. p50/p99 are rank-based (the count value at
    * rank ceil(q·K) ascending) — exact integers, no interpolation.
    * skew_factor = max_cnt·K/total: 1.0 = perfectly uniform. */
  def keySkewAudit(df: DataFrame, keyCol: String,
      label: String = ""): DataFrame = {
    val name = if (label.nonEmpty) label else keyCol
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val hist = counts.groupBy(col("cnt")).agg(count(lit(1)).as("k"))
    val w = Window.orderBy(col("cnt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cumk", sum(col("k")).over(w))
    val tot = cum.agg(sum(col("k")).as("n_keys"),
      sum(col("cnt") * col("k")).as("total_rows"),
      max(col("cnt")).as("max_cnt"))
    cum.crossJoin(broadcast(tot))
      .groupBy(col("n_keys"), col("total_rows"), col("max_cnt"))
      .agg(
        min(when(col("cumk") >= ceil(col("n_keys") * lit(0.5)), col("cnt")))
          .as("p50_cnt"),
        min(when(col("cumk") >= ceil(col("n_keys") * lit(0.99)), col("cnt")))
          .as("p99_cnt"))
      .select(lit(name).as("key_col"), col("n_keys"), col("total_rows"),
        col("max_cnt"), col("p50_cnt"), col("p99_cnt"),
        round(col("max_cnt").cast(DoubleType) * col("n_keys") / col("total_rows"), 6)
          .as("skew_factor"))
  }

  /** Top principal component of a covariance matrix by power iteration —
    * the distributed eigen step a PCA/whitening pipeline runs after the
    * gram/covariance aggregate (q123's cells are the expected input:
    * upper-triangle rows (i, j, cov), 1-based).
    *
    * 100 TB shape: state per round is ONE d-row vector broadcast onto
    * the (mirrored) cell table — a matvec join + keyed aggregate, the
    * q111 iteration discipline (lineage cut per round, nothing but a
    * d-row table ever moves). Exactness: every matvec term and every
    * squared-norm term is pico-quantized to a long before its order-free
    * sum; each round ends in fixed double divisions and one sqrt, so a
    * SQL twin can replay the whole loop bit-for-bit. The deterministic
    * uniform start vector pins the eigenvector's sign. */
  def topPrincipalComponent(cells: DataFrame, iters: Int = 12,
      driverEigenMaxDim: Int = 512): DataFrame = {
    require(iters >= 1, s"topPrincipalComponent needs iters >= 1, got $iters")
    val Q = 1.0e12
    val full = cells.select(col("i"), col("j"), col("cov"))
      .unionByName(cells.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov")))
      .localCheckpoint()
    val d = full.agg(max(col("i"))).head().getLong(0) // ONE driver scalar
    require(d >= 1, "topPrincipalComponent: empty cell table")
    if (d <= driverEigenMaxDim) {
      // Driver fast path (the MLlib RowMatrix design): the cell table is
      // d²-bounded — DIMENSION-sized, not corpus-sized — so collecting it
      // and iterating locally replaces 3·iters scheduled jobs over d-row
      // state with one collect. Arithmetic is the EXACT mirror of the
      // distributed loop below (and of the SQL oracle twin): BigDecimal
      // HALF_UP quantization == Spark's Round, exact long sums, fixed
      // double divisions — both paths are hash-identical.
      def qz(x: Double): Long = java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      val dd = d.toInt
      val c = Array.ofDim[Double](dd, dd)
      full.collect().foreach { r =>
        c(r.getLong(0).toInt - 1)(r.getLong(1).toInt - 1) = r.getDouble(2)
      }
      var v = Array.fill(dd)(1.0 / math.sqrt(d.toDouble))
      var it = 0
      while (it < iters) {
        val mv = Array.tabulate(dd) { i =>
          var s = 0L
          var j = 0
          while (j < dd) { s += qz(c(i)(j) * v(j) * Q); j += 1 }
          s.toDouble / Q
        }
        var n2 = 0L
        mv.foreach(x => n2 += qz(x * x * Q))
        val nrm = math.sqrt(n2.toDouble / Q)
        v = mv.map(_ / nrm)
        it += 1
      }
      var lq = 0L
      for (i <- 0 until dd; j <- 0 until dd)
        lq += qz(c(i)(j) * v(i) * v(j) * Q)
      val lambda = lq.toDouble / Q
      val spark = cells.sparkSession
      import spark.implicits._
      v.toSeq.zipWithIndex
        .map { case (x, i) => ((i + 1).toLong, x, lambda) }
        .toDF("pos", "component", "eigenvalue")
    } else {
      var v = full.select(col("i").as("pos")).distinct()
        .withColumn("vv", lit(1.0) / sqrt(lit(d.toDouble)))
      var it = 0
      while (it < iters) {
        val mv = full.join(broadcast(v.select(col("pos").as("j"), col("vv"))), Seq("j"))
          .groupBy(col("i").as("pos"))
          .agg((sum(round(col("cov") * col("vv") * lit(Q)).cast(LongType))
            .cast(DoubleType) / lit(Q)).as("mv"))
        val nrm = mv.agg(sqrt(sum(round(col("mv") * col("mv") * lit(Q))
          .cast(LongType)).cast(DoubleType) / lit(Q)).as("nrm"))
        v = mv.crossJoin(broadcast(nrm))
          .select(col("pos"), (col("mv") / col("nrm")).as("vv"))
          .localCheckpoint()
        it += 1
      }
      val lam = full
        .join(broadcast(v.select(col("pos").as("i"), col("vv").as("va"))), Seq("i"))
        .join(broadcast(v.select(col("pos").as("j"), col("vv").as("vb"))), Seq("j"))
        .agg((sum(round(col("cov") * col("va") * col("vb") * lit(Q)).cast(LongType))
          .cast(DoubleType) / lit(Q)).as("eigenvalue"))
      v.crossJoin(broadcast(lam))
        .select(col("pos"), col("vv").as("component"), col("eigenvalue"))
    }
  }

  /** Second principal component by DEFLATED power iteration (q268) — the
    * spectral half of ABTT/whitening (Mu & Viswanath 2018): q260's audit
    * MEASURES the rogue top direction; this answers the what-if —
    * removing it leaves covariance (I−v₁v₁ᵀ)C(I−v₁v₁ᵀ), whose top
    * eigenvalue is λ₂, so post-removal anisotropy is λ₂/(trace−λ₁)
    * without ever re-deriving the transformed covariance. Each round is
    * [[topPrincipalComponent]]'s quantized matvec + norm, with the
    * iterate's v₁-component projected out between them (dot and
    * deflection are pico-quantized fixed chains, so the oracle unrolls
    * the rounds as CTEs exactly like q134's).
    *
    * Like [[topPrincipalComponent]], a driver fast path handles
    * d ≤ `driverEigenMaxDim` (the cell table is d²-bounded — DIMENSION-
    * sized, never corpus-sized — so 12 rounds of d-row algebra are one
    * collect + local loops; BigDecimal HALF_UP == Spark Round keeps both
    * paths hash-identical, the proven q134 device). The distributed loop
    * below remains the d > 512 path, with the round tail FUSED into
    * unpartitioned-window sums so each round is ONE tiny job (r11).
    * The uniform start loses its v₁-component at round 1's deflation,
    * so no orthogonal initialization is needed. */
  def secondPrincipalComponent(cells: DataFrame, component: DataFrame,
      iters: Int = 12, driverEigenMaxDim: Int = 512): DataFrame = {
    require(iters >= 1, s"secondPrincipalComponent needs iters >= 1, got $iters")
    val Q = 1.0e12
    val full = cells.select(col("i"), col("j"), col("cov"))
      .unionByName(cells.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov")))
      .localCheckpoint()
    val d = full.agg(max(col("i"))).head().getLong(0) // ONE driver scalar
    require(d >= 2, "secondPrincipalComponent needs dimension >= 2")
    if (d <= driverEigenMaxDim) {
      // Driver fast path — the exact mirror of the distributed loop
      // below and of the unrolled-CTE oracle: HALF_UP quantization,
      // exact long sums, the same fixed double chains in the same order.
      def qz(x: Double): Long = java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      val dd = d.toInt
      val c = Array.ofDim[Double](dd, dd)
      full.collect().foreach { r =>
        c(r.getLong(0).toInt - 1)(r.getLong(1).toInt - 1) = r.getDouble(2)
      }
      val v1 = new Array[Double](dd)
      component.select(col("pos"), col("component")).collect()
        .foreach(r => v1(r.getLong(0).toInt - 1) = r.getDouble(1))
      var v = Array.fill(dd)(1.0 / math.sqrt(d.toDouble))
      var it = 0
      while (it < iters) {
        val mv = Array.tabulate(dd) { i =>
          var s = 0L
          var j = 0
          while (j < dd) { s += qz(c(i)(j) * v(j) * Q); j += 1 }
          s.toDouble / Q
        }
        var dq = 0L
        var i = 0
        while (i < dd) { dq += qz(v1(i) * mv(i) * Q); i += 1 }
        val dt = dq.toDouble / Q
        val w = Array.tabulate(dd)(i => mv(i) - dt * v1(i))
        var n2 = 0L
        w.foreach(x => n2 += qz(x * x * Q))
        val nrm = math.sqrt(n2.toDouble / Q)
        require(nrm > 0.0, "secondPrincipalComponent: deflated iterate " +
          "vanished (v1 is the uniform vector / eigengap is zero) — " +
          "the second eigenpair is not recoverable by this start")
        v = w.map(_ / nrm)
        it += 1
      }
      var lq = 0L
      for (i <- 0 until dd; j <- 0 until dd)
        lq += qz(c(i)(j) * v(i) * v(j) * Q)
      val lambda = lq.toDouble / Q
      val spark = cells.sparkSession
      import spark.implicits._
      v.toSeq.zipWithIndex
        .map { case (x, i) => ((i + 1).toLong, x, lambda) }
        .toDF("pos", "component", "eigenvalue")
    } else {
      val v1 = component.select(col("pos"), col("component").as("v1"))
        .localCheckpoint() // d rows, pinned for the rounds
      var v = full.select(col("i").as("pos")).distinct()
        .withColumn("vv", lit(1.0) / sqrt(lit(d.toDouble)))
      // Round tail FUSION (r11): dot, deflection, and norm are d-row
      // scalar algebra — computed as unpartitioned-window sums over the
      // d matvec rows, the whole round is ONE localCheckpointed job
      // instead of four (matvec checkpoint + two 1-row aggregate jobs
      // broadcast back + the iterate checkpoint). Same quantized chains
      // in the same order (window sums are exact long additions), so
      // the unrolled-CTE oracle is untouched.
      val whole = Window.partitionBy(lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      var it = 0
      while (it < iters) {
        v = full.join(broadcast(v.select(col("pos").as("j"), col("vv"))), Seq("j"))
          .groupBy(col("i").as("pos"))
          .agg((sum(round(col("cov") * col("vv") * lit(Q)).cast(LongType))
            .cast(DoubleType) / lit(Q)).as("mv"))
          .join(broadcast(v1), Seq("pos"))
          .withColumn("dt",
            sum(round(col("v1") * col("mv") * lit(Q)).cast(LongType))
              .over(whole).cast(DoubleType) / lit(Q))
          .withColumn("w", col("mv") - col("dt") * col("v1"))
          .withColumn("nrm",
            sqrt(sum(round(col("w") * col("w") * lit(Q)).cast(LongType))
              .over(whole).cast(DoubleType) / lit(Q)))
          .select(col("pos"), (col("w") / col("nrm")).as("vv"))
          .localCheckpoint()
        it += 1
      }
      val lam = full
        .join(broadcast(v.select(col("pos").as("i"), col("vv").as("va"))), Seq("i"))
        .join(broadcast(v.select(col("pos").as("j"), col("vv").as("vb"))), Seq("j"))
        .agg((sum(round(col("cov") * col("va") * col("vb") * lit(Q)).cast(LongType))
          .cast(DoubleType) / lit(Q)).as("eigenvalue"))
      v.crossJoin(broadcast(lam))
        .select(col("pos"), col("vv").as("component"), col("eigenvalue"))
    }
  }

  /** Project every vector onto a principal component (the APPLY half of
    * the PCA pipeline: q123 covariance → [[topPrincipalComponent]] →
    * this): per-vector principal score v·x and residual norm
    * √(|x|² − score²) — the dimensionality-reduction / outlier-energy
    * signal. The component rides as a d-row broadcast; per-position
    * products are nano-quantized before the order-free per-vector sums
    * (q113 policy), residual is one fixed double chain. */
  def pcaProject(df: DataFrame, vecCol: String, idCol: String,
      component: DataFrame): DataFrame = {
    val Q = 1.0e9
    val ev = df.select(col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("p", "x0")))
      .select(col("__id"), (col("p") + 1).cast(LongType).as("pos"),
        col("x0").cast(DoubleType).as("x"))
    ev.join(broadcast(component.select(col("pos"), col("component").as("vv"))),
        Seq("pos"))
      .groupBy(col("__id"))
      .agg(
        (sum(round(col("x") * col("vv") * lit(Q)).cast(LongType))
          .cast(DoubleType) / lit(Q)).as("score"),
        (sum(round(col("x") * col("x") * lit(Q)).cast(LongType))
          .cast(DoubleType) / lit(Q)).as("sq"))
      .select(col("__id").as(idCol), col("score"),
        sqrt(greatest(col("sq") - col("score") * col("score"), lit(0.0)))
          .as("residual_norm"))
  }

  /** Exact join-size pre-flight audit — q127's sibling for two-sided
    * planning: the exact output cardinality of `left ⋈ right` on a key
    * WITHOUT executing the join, from the per-key count tables alone
    * (|join| = Σ_k cl(k)·cr(k)), plus the hottest key's contribution —
    * the number that decides broadcast vs shuffle vs salt before a
    * multi-hour job is launched.
    *
    * 100 TB shape: two partial-agg-safe counts (key-table-sized, not
    * data-sized), one join of the count tables, one 1-row aggregate.
    * The hot-key argmax is a deterministic max over (contribution, key)
    * structs — exact integers throughout. */
  def joinSizeAudit(left: DataFrame, right: DataFrame, keyCol: String): DataFrame = {
    val lc = left.groupBy(col(keyCol).as("__k")).agg(count(lit(1)).as("cl"))
    val rc = right.groupBy(col(keyCol).as("__k")).agg(count(lit(1)).as("cr"))
    val joined = lc.join(rc, Seq("__k"))
      .select(col("__k"), (col("cl") * col("cr")).as("rows_k"))
    val totals = lc.agg(sum(col("cl")).as("n_left"), count(lit(1)).as("n_keys_left"))
      .crossJoin(rc.agg(sum(col("cr")).as("n_right"), count(lit(1)).as("n_keys_right")))
    totals.crossJoin(
      joined.agg(count(lit(1)).as("n_keys_common"),
        coalesce(sum(col("rows_k")), lit(0L)).as("join_rows"),
        max(struct(col("rows_k"), col("__k").cast(StringType).as("k")))
          .as("__hot"))
        .select(col("n_keys_common"), col("join_rows"),
          col("__hot.rows_k").as("max_key_rows"), col("__hot.k").as("max_key")))
  }

  /** Incremental ingestion dedup — flag each NEW-batch document whose
    * n-gram Jaccard similarity against ANY existing-corpus document
    * reaches num/den (the cross-corpus form of [[nearDupPairsExact]]:
    * what a pipeline runs on every fresh crawl batch before appending).
    *
    * 100 TB shape: the corpus side is never self-joined — one
    * shingle-keyed equality join between batch shingles and corpus
    * shingles, with corpus-side stop-shingles (df > maxShingleDf)
    * anti-joined off BOTH sides first (broadcast hot list), so a hot
    * shingle cannot create a quadratic bucket. Jaccard thresholds are
    * integer cross-multiplied — no float compares. */
  def incrementalNearDup(batch: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String, num: Int = 1, den: Int = 2,
      ngram: Int = 3, maxShingleDf: Option[Int] = None): DataFrame = {
    graft.functions.GraftFunctions.register(batch.sparkSession)
    val bs0 = batch.select(col(idCol).as("__bid"),
      explode(expr(s"shingle_set(`$textCol`, $ngram)")).as("s"))
    val cs0 = corpus.select(col(idCol).as("__cid"),
      explode(expr(s"shingle_set(`$textCol`, $ngram)")).as("s"))
    val (bs, cs) = maxShingleDf match {
      case Some(cap) =>
        val hot = cs0.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("s"))
        (bs0.join(broadcast(hot), Seq("s"), "left_anti"),
          cs0.join(broadcast(hot), Seq("s"), "left_anti"))
      case None => (bs0, cs0)
    }
    val inter = bs.join(cs, Seq("s"))
      .groupBy(col("__bid"), col("__cid")).agg(count(lit(1)).as("i"))
    val nb = bs.groupBy(col("__bid")).agg(count(lit(1)).as("nb"))
    val nc = cs.groupBy(col("__cid")).agg(count(lit(1)).as("nc"))
    val matches = inter.join(nb, Seq("__bid")).join(nc, Seq("__cid"))
      .filter(lit(den) * col("i") >= lit(num) * (col("nb") + col("nc") - col("i")))
      .groupBy(col("__bid")).agg(count(lit(1)).as("n_matches"))
    batch.select(col(idCol).as("__bid")).distinct()
      .join(matches, Seq("__bid"), "left")
      .select(col("__bid").as(idCol),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        (coalesce(col("n_matches"), lit(0L)) > 0L).as("is_dup"))
  }

  /** Per-document Shannon character entropy (nats) — the classic cheap
    * gibberish/boilerplate detector (low entropy = repeated filler, high
    * entropy = encrypted/compressed junk; CCNet and Gopher both gate on
    * simple length/character statistics of this family).
    *
    * 100 TB shape: char explode fans out n_chars rows per doc but every
    * shuffle keys on (doc, char) then (doc) — zero cross-document state,
    * linear scaling, AQE-coalescible. Float policy: each distinct char
    * contributes term = (c/n)·ln(n/c) computed as ONE fixed expression,
    * nano-quantized to a long before the per-doc sum (order-free exact,
    * the q113 policy), one final double division. Docs whose text is
    * empty keep their row with n_chars=0 and NULL entropy ("no evidence"
    * contract, as bm25/ngramLmScore). */
  def charEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val Q = 1.0e9
    val chars = df.select(col(idCol).as("__id"),
        explode(split(col(textCol), "")).as("__ch"))
      .filter(col("__ch") =!= "")
    val cnt = chars.groupBy(col("__id"), col("__ch"))
      .agg(count(lit(1)).as("__c"))
    val tot = cnt.groupBy(col("__id"))
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("n_distinct"))
    val term = (col("__c").cast(DoubleType) / col("__n").cast(DoubleType)) *
      log(col("__n").cast(DoubleType) / col("__c").cast(DoubleType))
    val ent = cnt.join(tot, Seq("__id"))
      .select(col("__id"), col("__n"), col("n_distinct"),
        round(term * lit(Q)).cast(LongType).as("__q"))
      .groupBy(col("__id"), col("__n"), col("n_distinct"))
      .agg((sum(col("__q")).cast(DoubleType) / lit(Q)).as("entropy"))
    df.select(col(idCol).as("__id")).distinct()
      .join(ent, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("__n"), lit(0L)).as("n_chars"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("entropy"))
  }

  /** Bounded-hop single-source shortest paths (unweighted BFS) — the
    * graph-traversal primitive next to [[pageRank]] (influence radius,
    * reachability, funnel-distance questions on transition graphs).
    *
    * 100 TB shape: classic frontier relaxation — each hop is ONE keyed
    * join of the previous distance table against the edge list plus a
    * min-aggregate; lineage is cut per hop (same localCheckpoint /
    * reliable-checkpoint switch as [[pageRank]]); nothing ever collects
    * and the frontier join broadcasts nothing. Distances are exact
    * integers — no float policy needed. */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      source: String, maxHops: Int = 6,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxHops >= 1, s"shortestPaths needs maxHops >= 1, got $maxHops")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val e = cut(edges.select(col(srcCol).cast(StringType).as("src"),
      col(dstCol).cast(StringType).as("dst")).distinct())
    val sp = edges.sparkSession
    import sp.implicits._
    var dist = Seq((source, 0L)).toDF("node", "dist")
    var h = 1L
    while (h <= maxHops) {
      val frontier = dist.filter(col("dist") === (h - 1))
      val reached = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"), lit(h).as("dist"))
      dist = cut(dist.unionByName(reached)
        .groupBy(col("node")).agg(min(col("dist")).as("dist")))
      h += 1
    }
    dist.orderBy(col("dist"), col("node"))
  }

  /** Keyed interval-overlap join — all pairs (a, b) sharing a key whose
    * time intervals truly overlap (intersection length > 0), via TIME
    * BUCKETING: each interval replicates to the fixed-width buckets it
    * touches, candidates come from a plain equi-join on (key, bucket),
    * duplicates from multi-bucket spans collapse with distinct, and the
    * exact overlap test runs on candidates only. The temporal analog of
    * [[spatialJoinTiled]]'s grid device — it turns the O(n·m) interval
    * theta join (which Spark plans as a per-key nested loop) into an
    * equi-join whose fan-out is interval-length/bucketUs per row.
    *
    * Pick `bucketUs` near the typical interval length: too small
    * explodes replication, too large packs unrelated intervals into one
    * bucket. Output: key, a's id/bounds, b's id/bounds, overlap_us. */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, keyCol: String,
      sCol: String, eCol: String, idCol: String,
      bucketUs: Long, maxBucketsPerRow: Long = 65536L): DataFrame = {
    require(bucketUs > 0, "intervalOverlapJoin: bucketUs must be positive")
    def expand(df: DataFrame, p: String) = df
      .select(col(keyCol).as("__k"), col(idCol).as(s"${p}_id"),
        col(sCol).cast(LongType).as(s"${p}_s"), col(eCol).cast(LongType).as(s"${p}_e"))
      .filter(col(s"${p}_s") < col(s"${p}_e"))
      // fail LOUDLY on absurd spans (a corrupt timestamp would otherwise
      // explode one row into millions of bucket replicas mid-job); the
      // guard uses the SAME integer div as the sequence() below so it is
      // exact — a float formulation was off by one at the cap and could
      // misjudge near 2^53 (review finding)
      // replicas = div-difference + 1, so error at diff >= cap ("more
      // than maxBucketsPerRow buckets" is exact, no off-by-one)
      .withColumn(s"${p}_e", when(
        expr(s"(${p}_e div $bucketUs) - (${p}_s div $bucketUs)") >= maxBucketsPerRow,
        raise_error(concat(lit(s"intervalOverlapJoin: interval for id="),
          col(s"${p}_id").cast(StringType),
          lit(s" spans more than $maxBucketsPerRow buckets of $bucketUs us — " +
            "corrupt bounds or bucketUs far too small"))).cast(LongType))
        .otherwise(col(s"${p}_e")))
      .withColumn("__bk", explode(expr(
        s"sequence(${p}_s div $bucketUs, ${p}_e div $bucketUs)")))
    // A pair sharing several buckets would emit once per shared bucket;
    // keep only the match in the bucket containing the overlap START —
    // each truly-overlapping pair matches in EXACTLY that one bucket, so
    // no distinct() is needed. (A full-row distinct also collapsed pairs
    // from genuinely duplicated input rows, diverging from the theta
    // join this must reproduce — review finding — and cost a shuffle.)
    val cand = expand(a, "a").join(expand(b, "b"), Seq("__k", "__bk"))
      .filter(col("__bk") === expr(s"greatest(a_s, b_s) div $bucketUs"))
      .drop("__bk")
    cand
      .withColumn("overlap_us",
        least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
      .filter(col("overlap_us") > 0L)
      .select(col("__k").as(keyCol), col("a_id"), col("a_s"), col("a_e"),
        col("b_id"), col("b_s"), col("b_e"), col("overlap_us"))
  }

  /** Hierarchy flattening by POINTER JUMPING (path doubling): every node
    * of a parent-child forest resolves its (root, depth) in ⌈log₂ h⌉
    * rounds instead of the h rounds a parent-at-a-time walk needs —
    * each round replaces every node's ancestor pointer with its
    * ancestor's ancestor and adds the distances, so pointer distance
    * doubles per round. THE textbook reason deep recursion is cheap on
    * a shuffle engine: a depth-1000 chain costs 10 self-joins, not 1000.
    *
    * Input: one row per node with its parent (NULL ⇒ root). Output:
    * (node, root, depth). Cycles never terminate pointer-chasing in ANY
    * formulation; here `maxDoubling` bounds rounds and unresolved nodes
    * (pointer not yet at a root) are returned with NULL root/depth so
    * corrupt hierarchies surface instead of spinning.
    *
    * 100 TB shape: each round is ONE self-equi-join on the ancestor
    * pointer + a projection, lineage cut per round; convergence is a
    * scalar count. */
  def flattenHierarchy(nodes: DataFrame, nodeCol: String, parentCol: String,
      maxDoubling: Int = 20, checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(nodes.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    var st = cut(nodes.select(col(nodeCol).as("node"),
      coalesce(col(parentCol), col(nodeCol)).as("anc"),
      when(col(parentCol).isNull, 0L).otherwise(1L).as("d")))
    var round = 0
    var converged = false
    while (round < maxDoubling && !converged) {
      val lk = st.select(col("node").as("anc"), col("anc").as("anc2"),
        col("d").as("d2"))
      // LEFT join: a DANGLING parent pointer (anc references an id with
      // no node row) has no lookup entry — the pointer simply cannot
      // advance, the node keeps (anc, d), and it surfaces at the end
      // with NULL root/depth. An inner join here silently dropped the
      // node and its whole subtree (review finding).
      // the changed flag rides the SAME jump join (r9, review finding:
      // the old convergence probe re-joined next against st every round,
      // doubling per-round job count); the post-cut isEmpty is a cheap
      // scan of the just-materialized table, no join
      val next = cut(st.join(lk, Seq("anc"), "left")
        .select(col("node"), coalesce(col("anc2"), col("anc")).as("anc"),
          (col("d") + coalesce(col("d2"), lit(0L))).as("d"),
          (coalesce(col("anc2"), col("anc")) =!= col("anc")).as("__ch")))
      // converged when every pointer is at a root (its own anc = itself,
      // i.e. the jump changed nothing anywhere)
      converged = next.filter(col("__ch")).isEmpty
      st = next.drop("__ch")
      round += 1
    }
    // true roots have d = 0; a cycle node can self-point after doubling
    // (cycle length divides 2^round) but always with d > 0
    val roots = st.filter(col("node") === col("anc") && col("d") === 0L)
      .select(col("node").as("__r"))
    st.join(roots, st("anc") === roots("__r"), "left")
      .select(col("node"),
        when(col("__r").isNotNull, col("anc")).as("root"),
        when(col("__r").isNotNull, col("d")).as("depth"))
  }

  /** Bounded-hop single-source WEIGHTED shortest paths (Bellman–Ford
    * rounds) — [[shortestPaths]]' sibling for cost graphs: after round h,
    * `dist` holds the exact minimum cost over all paths of ≤ h edges
    * (the Bellman–Ford invariant), so with maxHops = the graph's longest
    * useful path the result is the true shortest-path cost. Unlike BFS,
    * every round relaxes the FULL distance table (a cheaper node's cost
    * can improve later via a longer path), not just the last frontier.
    *
    * Weights must be non-negative integers (cost semantics are the
    * caller's — cents, hop counts, 1e6/width inverses); sums stay in
    * long range for any real graph. 100 TB shape: one keyed join +
    * min-aggregate per round, lineage cut per round with the same
    * localCheckpoint / reliable-checkpoint switch as [[pageRank]];
    * nothing collects. */
  def weightedShortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, source: String, maxHops: Int = 6,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxHops >= 1, s"weightedShortestPaths needs maxHops >= 1, got $maxHops")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val e = cut(edges
      .select(col(srcCol).cast(StringType).as("src"),
        col(dstCol).cast(StringType).as("dst"),
        // the non-negative-weight contract is enforced IN the edge
        // projection (r9, review finding: the old standalone validation
        // pass scanned the edge set once more before any relaxation) —
        // raise_error fires during the same eager setup job that
        // materializes the edge table
        when(col(weightCol).cast(LongType) < 0L,
          raise_error(concat(
            lit("weightedShortestPaths: negative edge weight "),
            col(weightCol).cast(StringType), lit(" on edge "),
            col(srcCol).cast(StringType), lit(" -> "),
            col(dstCol).cast(StringType),
            lit(" — negative weights are not supported"))).cast(LongType))
          .otherwise(col(weightCol).cast(LongType)).as("w"))
      // parallel edges collapse to their cheapest — same relaxation result
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w")))
    val sp = edges.sparkSession
    import sp.implicits._
    var dist = Seq((source, 0L)).toDF("node", "dist")
    var h = 1
    while (h <= maxHops) {
      val relaxed = dist.join(e, dist("node") === e("src"))
        .select(e("dst").as("node"), (dist("dist") + e("w")).as("dist"))
      dist = cut(dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist")))
      h += 1
    }
    dist.orderBy(col("dist"), col("node"))
  }

  /** Small-file compaction planner — the lakehouse maintenance primitive:
    * given a file manifest (id + size), assign files to sequential
    * compaction groups of ~`targetBytes` by first-fit in id order
    * (bucket = floor(prefix_sum_before / target): a group overflows by at
    * most one file, every group except the last is ≥ target once closed
    * — the Iceberg/Delta bin-pack shape, made deterministic).
    *
    * 100 TB shape: the input is a MANIFEST (one row per file — millions
    * of rows for a 100 TB dataset, not billions), so the single-partition
    * prefix-sum window is over manifest-sized data by construction; the
    * data files themselves are never read. Same contract as the q116
    * range-layout manifest. */
  def compactionPlan(manifest: DataFrame, idCol: String, sizeCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"compactionPlan needs targetBytes >= 1, got $targetBytes")
    val w = Window.orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    manifest.select(col(idCol).as("__id"),
        col(sizeCol).cast(LongType).as("__sz"))
      .withColumn("grp",
        (coalesce(sum(col("__sz")).over(w), lit(0L)) / lit(targetBytes))
          .cast(LongType))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_files"), sum(col("__sz")).as("total_bytes"),
        min(col("__id")).as("first_id"), max(col("__id")).as("last_id"))
      .orderBy(col("grp"))
  }

  /** Exact triangle count by degree orientation — the standard
    * communication-optimal distributed formulation (each undirected edge
    * is oriented from its lower-(degree, id) endpoint to the higher, so
    * every vertex's out-degree is bounded by O(sqrt(m)) on any graph and
    * the wedge join cannot explode on hubs; each triangle is counted at
    * exactly one vertex — the one with two out-edges).
    *
    * Input: a directed/undirected edge list; self-loops dropped,
    * direction and duplicates collapsed. Three keyed joins, no
    * broadcast needed beyond the degree table (which is node-sized). */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges.select(
        least(col(srcCol).cast(StringType), col(dstCol).cast(StringType)).as("a"),
        greatest(col(srcCol).cast(StringType), col(dstCol).cast(StringType)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    // orient u -> v iff (d(u), u) < (d(v), v)
    val oriented = und
      .join(deg.select(col("node").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("apex"), col("e1.v").as("x"), col("e2.v").as("y"))
    // the closing edge (x,y) exists in SOME orientation
    val closing = oriented.select(col("u").as("x"), col("v").as("y"))
      .unionAll(oriented.select(col("v").as("x"), col("u").as("y")))
    val tri = wedges.join(closing, Seq("x", "y"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val stats = und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
    stats.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  /** Per-node local clustering coefficient — [[triangleCount]]'s node-
    * level companion (global transitivity says a graph is clumpy;
    * this says WHICH nodes sit in cliques vs stars): cc(v) =
    * 2·tri(v) / (deg(v)·(deg(v)−1)), the fraction of a node's
    * neighbor pairs that are themselves connected.
    *
    * Same communication-optimal degree-orientation as triangleCount
    * (out-degrees bounded by O(√m), wedge join cannot explode on
    * hubs); each triangle row then credits its THREE corners via one
    * explode + keyed count — no per-node wedge re-enumeration. cc is
    * one double division of exact integers; output is the top-k by
    * (nano-quantized cc desc, node) above a degree floor — k-bounded,
    * so the final TakeOrdered is fine at any scale. */
  def clusteringCoefficient(edges: DataFrame, srcCol: String,
      dstCol: String, minDegree: Int = 2, topK: Int = 20): DataFrame = {
    require(minDegree >= 2,
      s"clusteringCoefficient needs minDegree >= 2 (cc undefined below), got $minDegree")
    require(topK >= 1, s"clusteringCoefficient needs topK >= 1, got $topK")
    val und = edges.select(
        least(col(srcCol).cast(StringType), col(dstCol).cast(StringType)).as("a"),
        greatest(col(srcCol).cast(StringType), col(dstCol).cast(StringType)).as("b"))
      .filter(col("a").isNotNull && col("a") =!= col("b")).distinct()
      .localCheckpoint() // feeds degrees + orientation
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val oriented = und
      .join(deg.select(col("node").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("degree").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
      .localCheckpoint() // feeds wedges (twice) + closing
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("apex"), col("e1.v").as("x"), col("e2.v").as("y"))
    val closing = oriented.select(col("u").as("x"), col("v").as("y"))
      .unionAll(oriented.select(col("v").as("x"), col("u").as("y")))
    val triNodes = wedges.join(closing, Seq("x", "y"))
      .select(explode(array(col("apex"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.join(triNodes, Seq("node"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .filter(col("degree") >= minDegree.toLong)
      .withColumn("cc", (lit(2L) * col("n_triangles")).cast(DoubleType) /
        (col("degree") * (col("degree") - lit(1L))).cast(DoubleType))
      .withColumn("__ccq", round(col("cc") * lit(1.0e9)).cast(LongType))
      .orderBy(col("__ccq").desc, col("node"))
      .limit(topK)
      .select(col("node"), col("degree"), col("n_triangles"), col("cc"))
  }

  /** Centroid-disagreement label-noise audit (q233) — confident-
    * learning-lite over an embedding column: assign every vector to its
    * nearest LABEL CENTROID by cosine; a row whose own label is not the
    * argmax is flagged as suspect. The per-label noise rate is the
    * standard first look at "is this labeled set worth training on",
    * and the flagged slice is what goes to re-annotation.
    *
    * Exactness: components are micro-quantized longs (the q70 centroid
    * convention), so every dot product and norm reduces as an exact
    * Decimal(38) sum of integer products (HUGEINT twins); each
    * (row, centroid) cosine is then ONE fixed double chain, and the
    * argmax compares nano-quantized cosines with a deterministic
    * label tie-break (rank over (simq desc, label)).
    *
    * 100 TB shape: the centroid table is #labels·dims rows — broadcast;
    * the dot-product join fans each row out to dims·#labels terms but
    * immediately reduces them through ONE keyed aggregate on
    * (row, centroid-label); the argmax window partitions by row id over
    * #labels rows. Nothing quadratic in row count anywhere. */
  def labelNoiseAudit(df: DataFrame, vecCol: String, labelCol: String,
      idCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val dims = df.select(col(idCol).as("__id"),
        col(labelCol).cast(LongType).as("__lab"),
        posexplode(col(vecCol)).as(Seq("__pos", "__x")))
      .select(col("__id"), col("__lab"), col("__pos"),
        round(col("__x").cast(DoubleType) * lit(1000000.0)).cast(LongType)
          .as("__xq"))
      .localCheckpoint() // feeds centroids, norms, and the dot join
    val cent = dims.groupBy(col("__lab").as("__cl"), col("__pos"))
      .agg(count(lit(1)).as("__cn"), sum(col("__xq")).as("__sm"))
    val cnorm = cent.groupBy(col("__cl"))
      .agg(max(col("__cn")).as("__cn"),
        sum(col("__sm").cast(dec) * col("__sm")).as("__css"))
    val xnorm = dims.groupBy(col("__id"))
      .agg(sum(col("__xq").cast(dec) * col("__xq")).as("__xss"))
    val dots = dims
      .join(broadcast(cent.select(col("__cl"), col("__pos"), col("__sm"))),
        Seq("__pos"))
      .groupBy(col("__id"), col("__lab"), col("__cl"))
      .agg(sum(col("__xq").cast(dec) * col("__sm")).as("__dot"))
    // cos = (dot / (1e12·n)) / ((√xss/1e6) · (√css/(1e6·n)))
    val cos = col("__dot").cast(DoubleType) / (lit(1.0e12) *
        col("__cn").cast(DoubleType)) /
      ((sqrt(col("__xss").cast(DoubleType)) / lit(1.0e6)) *
        (sqrt(col("__css").cast(DoubleType)) /
          (lit(1.0e6) * col("__cn").cast(DoubleType))))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__simq").desc, col("__cl"))
    val best = dots
      .join(broadcast(cnorm), Seq("__cl"))
      .join(xnorm, Seq("__id"))
      .withColumn("__simq", round(cos * lit(1.0e9)).cast(LongType))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
    best.groupBy(col("__lab").as(labelCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__cl") =!= col("__lab"), 1L).otherwise(0L))
          .as("n_flagged"))
      .withColumn("noise_rate",
        col("n_flagged").cast(DoubleType) / col("n").cast(DoubleType))
  }

  /** Bloom-prefiltered equi join — the row-level runtime-filter shape
    * Spark's own `spark.sql.optimizer.runtime.bloomFilter` applies, made
    * an explicit operator: the dim side's join keys compress to ONE
    * mergeable bloom aggregate (`numBits` of driver state regardless of
    * dim size — the [[decontaminateBloom]] bound), and the fact side is
    * probed per row BEFORE its shuffle, so rows that cannot match never
    * leave their input partition. At 100 TB the shuffle of non-matching
    * fact rows is the dominant cost of a selective join; the probe is a
    * pure codegen'd filter. False positives survive the probe but are
    * eliminated by the join itself, so the result is EXACTLY the plain
    * inner join — which is what the q139 oracle states. */
  def bloomPrefilterJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
      expectedItems: Long = 4000000L, numBits: Long = 1L << 23): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    val bloomBytes = dim
      .select(col(keyCol).as("__k"))
      .agg(column(new BloomFilterAggregate(
        new XxHash64(Seq(expression(col("__k")))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression()).as("__bf"))
      .head.getAs[Array[Byte]](0)
    val pre = fact.filter(column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      new XxHash64(Seq(expression(col(keyCol)))))))
    pre.join(dim, Seq(keyCol))
  }

  /** Synchronous label-propagation community detection — the classic
    * near-linear community finder (Raghavan et al. 2007) made
    * deterministic: every node starts as its own label and each round
    * adopts the label most frequent among its neighbors, ties broken by
    * the SMALLEST label (the usual random tie-break is replaced so runs
    * are reproducible and oracle-checkable). Fixed `rounds` synchronous
    * updates, no convergence test — the caller picks depth.
    *
    * 100 TB shape: per round ONE keyed join of the neighbor list against
    * the label table, one (node, label) count aggregate, and one
    * node-keyed `min_by` argmax — hash aggregation with map-side
    * partials, no sort (the tie-break rides inside the min_by struct
    * key). The neighbor list is CACHED hash-partitioned by the probe
    * key (r9): the per-round label join then exchanges only the
    * node-sized label table — the edge list is never re-shuffled after
    * setup (under the reliable-checkpoint durability switch from
    * [[pageRank]] the edge list checkpoints instead — durability over
    * the partitioning hint). Each round's output feeds exactly one
    * consumer (the next round's join), so the lazy chain evaluates in a
    * single pass; label lineage is cut every 5 rounds (plan-size
    * hygiene for deep runs) or every round when durable. Differs from
    * [[connectedComponents]] (min-label fixpoint = connectivity) by
    * splitting dense regions apart instead of merging everything
    * reachable. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 3, checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"labelPropagation needs rounds >= 1, got $rounds")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val und = edges.select(col(srcCol).cast(StringType).as("a"),
        col(dstCol).cast(StringType).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val nbrsPlan = und.select(col("a").as("node"), col("b").as("nbr"))
      .unionAll(und.select(col("b").as("node"), col("a").as("nbr")))
      .distinct()
      .repartition(col("nbr"))
    val (nbrs, release): (DataFrame, () => Unit) =
      if (checkpointDir.isDefined) (nbrsPlan.checkpoint(), () => ())
      else {
        val p = nbrsPlan.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        (p, () => { p.unpersist(); () })
      }
    var labels = nbrs.select(col("node")).distinct()
      .withColumn("lab", col("node"))
    var r = 0
    while (r < rounds) {
      val cnt = nbrs
        .join(labels.select(col("node").as("nbr"), col("lab")), Seq("nbr"))
        .groupBy(col("node"), col("lab")).agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc) == min_by over the composite
      // key (-count, label) — lexicographic struct ordering
      labels = cnt.groupBy(col("node")).agg(
        min_by(col("lab"), struct((-col("c")).as("nc"), col("lab"))).as("lab"))
      r += 1
      if (checkpointDir.isDefined || (r % 5 == 0 && r < rounds))
        labels = cut(labels)
    }
    // node-sized result is cut so the cached edge list can be released
    val out = if (checkpointDir.isDefined) labels else labels.localCheckpoint()
    release()
    out
  }

  /** Newman modularity Q of a community assignment over an undirected
    * simple graph — the quality gate for [[labelPropagation]]'s output
    * (did propagation find real structure, or noise? Q ≈ 0 means the
    * within-community edge mass is what a random degree-preserving
    * rewiring would give). Q = W/m − Σ_c d_c²/(4m²) with W = within-
    * community edges, m = undirected edge count, d_c = total degree of
    * community c.
    *
    * Edges are normalized exactly like [[labelPropagation]] (string
    * cast, null/self drop, distinct) plus endpoint canonicalization,
    * so double-entered edges count once; all masses (W, m, d_c, Σd_c²)
    * are exact integers (Decimal(38) for the square sum — binds at
    * d_c ~ 10¹⁸) and Q is a two-division double chain, identical shape
    * on the oracle.
    *
    * 100 TB shape: two label equi-joins over the edge list + three
    * keyed aggregates — one edge shuffle on each endpoint, a node
    * shuffle for degrees, a community shuffle for d_c. Nothing
    * quadratic, nothing driver-resident. */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, nodeCol: String = "node",
      labCol: String = "lab"): DataFrame = {
    val D = DecimalType(38, 0)
    val und = edges.select(col(srcCol).cast(StringType).as("__ea"),
        col(dstCol).cast(StringType).as("__eb"))
      .filter(col("__ea").isNotNull && col("__eb").isNotNull &&
        col("__ea") =!= col("__eb"))
      .select(least(col("__ea"), col("__eb")).as("a"),
        greatest(col("__ea"), col("__eb")).as("b"))
      .distinct()
      // three consumers (m, within, degrees) — materialize the
      // normalized edge set once instead of replaying its lineage 3×
      .localCheckpoint()
    val lab = labels.select(col(nodeCol).cast(StringType).as("node"),
      col(labCol).cast(StringType).as("lab"))
    val m = und.agg(count(lit(1)).as("m_edges"))
    val within = und
      .join(lab.select(col("node").as("a"), col("lab").as("__la")), Seq("a"))
      .join(lab.select(col("node").as("b"), col("lab").as("__lb")), Seq("b"))
      .filter(col("__la") === col("__lb"))
      .agg(count(lit(1)).as("within_edges"))
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("__d"))
    val dc = deg.join(lab, Seq("node"))
      .groupBy(col("lab")).agg(sum(col("__d")).as("__dc"))
    val s = dc.agg(count(lit(1)).as("n_communities"),
      sum(col("__dc").cast(D) * col("__dc").cast(D)).as("__sd2"))
    val nn = lab.agg(count(lit(1)).as("n_nodes"))
    s.crossJoin(broadcast(nn)).crossJoin(broadcast(m))
      .crossJoin(broadcast(within))
      .select(col("n_communities"), col("n_nodes"), col("m_edges"),
        col("within_edges"),
        when(col("m_edges") === 0L, lit(null).cast(DoubleType))
          .otherwise(col("within_edges").cast(DoubleType) /
            col("m_edges").cast(DoubleType) -
            col("__sd2").cast(DoubleType) /
              (lit(4.0) * col("m_edges").cast(DoubleType) *
                col("m_edges").cast(DoubleType))).as("modularity"))
  }

  /** Deterministic random projection (Johnson–Lindenstrauss sign matrix) —
    * the embedding-compression step between [[quantizeInt8]] (per-value)
    * and [[topPrincipalComponent]] (data-dependent): out component j is
    * Σᵢ ±xᵢ / √outDim with the sign drawn from bit 0 of the cross-engine
    * md5 of "j:i" — no RNG, no trained state, stable under repartition
    * and identically replayable in SQL.
    *
    * Exactness: elements are micro-quantized to longs FIRST (the q123
    * policy), signed sums are exact integers under any shuffle order, and
    * the projected value is ONE double division at the end. Plan: one
    * posexplode fan-out × outDim sign terms collapsed by map-side partial
    * agg on (id, j); rows whose vector is NULL/empty keep a NULL-component
    * row (the q113 "no evidence" contract). */
  def randomProject(df: DataFrame, vecCol: String, idCol: String,
      outDim: Int = 16): DataFrame = {
    require(outDim >= 1, s"randomProject needs outDim >= 1, got $outDim")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val e = df
      .select(col(idCol).as("__vid"), posexplode(col(vecCol)).as(Seq("p", "x")))
      .select(col("__vid"), (col("p") + 1).cast(LongType).as("i"),
        round(col("x").cast(DoubleType) * lit(1000000.0)).cast(LongType).as("xq"))
    val js = df.sparkSession.range(1, outDim + 1).select(col("id").as("j"))
    val proj = e.crossJoin(broadcast(js))
      .select(col("__vid"), col("j"),
        when(expr("(md5_lower64(concat(cast(j AS STRING), ':', cast(i AS STRING))) & 1) = 1"),
          col("xq")).otherwise(-col("xq")).as("t"))
      .groupBy(col("__vid"), col("j"))
      .agg(sum(col("t")).as("yq"))
    df.select(col(idCol).as("__vid")).distinct()
      .join(proj, Seq("__vid"), "left")
      .select(col("__vid").as(idCol), col("j"), col("yq"),
        (col("yq").cast(DoubleType) /
          (lit(1000000.0) * sqrt(lit(outDim.toDouble)))).as("y"))
  }

  /** Count–min sketch heavy hitters — the mergeable frequency sketch next
    * to q104's HLL (cardinality) and q90's percentile sketch: `depth`
    * independent md5-derived hash rows × `width` buckets, each raw row
    * incrementing one cell per hash row. The CMS table is built straight
    * from the RAW data (depth-way per-row fan-out collapsed by map-side
    * partial agg to depth·width cells per partition — the true streaming
    * increment shape, never a pre-built count table), so at 100 TB the
    * shuffle moves depth·width cells per partition, not keys. Estimates
    * = min over the key's depth cells (CMS never underestimates); the
    * exact count table rides along as the gate, the q91 pattern. Fully
    * deterministic given the seeds — hash-checked against a DuckDB
    * replay, not self-gated. */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256, k: Int = 20): DataFrame = {
    require(depth >= 1 && width >= 1 && k >= 1,
      s"cmsHeavyHitters needs depth/width/k >= 1, got $depth/$width/$k")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val rows = df.sparkSession.range(depth).select(col("id").as("row"))
    val keyed = df.select(col(keyCol).cast(StringType).as("key"))
      .filter(col("key").isNotNull)
    def bucket = expr(
      s"(md5_lower64(concat(cast(row AS STRING), ':', key)) & 9223372036854775807) % $width")
    val cms = keyed.crossJoin(broadcast(rows))
      .select(col("row"), bucket.as("bucket"))
      .groupBy(col("row"), col("bucket")).agg(count(lit(1)).as("c"))
    val exact = keyed.groupBy(col("key")).agg(count(lit(1)).as("n"))
    val est = exact.crossJoin(broadcast(rows))
      .select(col("key"), col("n"), col("row"), bucket.as("bucket"))
      .join(broadcast(cms), Seq("row", "bucket"))
      .groupBy(col("key"), col("n")).agg(min(col("c")).as("cms_est"))
    val w = Window.orderBy(col("n").desc, col("key"))
    est.orderBy(col("n").desc, col("key")).limit(k)
      .withColumn("rk", row_number().over(w).cast(LongType))
      .select(col("rk"), col("key"), col("n"), col("cms_est"),
        (col("cms_est") >= col("n")).as("no_underestimate"))
  }

  /** CMS join-size ESTIMATE — the sketch companion to [[joinSizeAudit]]:
    * |L ⋈ R| = Σ_key f_L(key)·f_R(key) is estimated by the inner product
    * of the two sides' count–min rows (min over depth), touching each
    * side ONCE and never joining them. Per Cormode–Muthukrishnan the
    * inner product never underestimates (collisions only add), which the
    * output asserts against the exact size riding along.
    *
    * Determinism: CMS counters are SUMS — merge-order-invariant at any
    * cardinality (the KMV/q104 distinction applied to frequency
    * sketches) — so the estimate is a pure function of the data and
    * hash-gates without a golden. 100 TB shape: each sketch is one
    * depth×width keyed count (map-side partial), the product is
    * depth×width rows; the exact side (for the gate) is the only
    * key-shuffle and is exactly [[joinSizeAudit]]'s cost — drop it in
    * production and the estimate is shuffle-free per side. */
  def cmsJoinSizeEstimate(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, "cmsJoinSizeEstimate needs depth/width >= 1")
    graft.functions.GraftFunctions.register(left.sparkSession)
    val rows = left.sparkSession.range(depth).select(col("id").as("row"))
    def keyed(df: DataFrame, k: String) =
      df.select(col(k).cast(StringType).as("key")).filter(col("key").isNotNull)
    def bucket = expr(
      s"(md5_lower64(concat(cast(row AS STRING), ':', key)) & 9223372036854775807) % $width")
    def cms(df: DataFrame, c: String) = keyed(df, "key")
      .crossJoin(broadcast(rows))
      .select(col("row"), bucket.as("bucket"))
      .groupBy(col("row"), col("bucket")).agg(count(lit(1)).as(c))
    // per-depth-row inner products, with ABSENT rows counting as 0: a
    // depth row whose buckets never collide IS an estimate of zero and
    // must win the min (dropping it silently inflates the estimate —
    // caught by the disjoint-keys spec case)
    val prod = rows.join(
        cms(keyed(left, leftKey), "cl")
          .join(cms(keyed(right, rightKey), "cr"), Seq("row", "bucket"))
          .groupBy(col("row")).agg(sum(col("cl") * col("cr")).as("ip")),
        Seq("row"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("cms_join_est"))
    val exact = keyed(left, leftKey).groupBy(col("key")).agg(count(lit(1)).as("nl"))
      .join(keyed(right, rightKey).groupBy(col("key")).agg(count(lit(1)).as("nr")),
        Seq("key"))
      .agg(coalesce(sum(col("nl") * col("nr")), lit(0L)).as("exact_join"))
    prod.crossJoin(exact)
      .select(col("cms_join_est"), col("exact_join"),
        (col("cms_join_est") >= col("exact_join")).as("no_underestimate"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    * combine heterogeneous retrieval rankings (lexical BM25, dense ANN,
    * priors) without score calibration: fused(id) = Σ over lists of
    * 1/(k + rank). Each input holds (idCol, rankCol) — typically an
    * already-truncated top-N, so every join side is list-sized, not
    * corpus-sized. Output: one row per id seen in ANY list, per-list
    * ranks (NULL where absent), n_lists hit, and the fused score.
    *
    * Exactness: each term is ONE double division at fixed k and the
    * total is a FIXED left-to-right chain over the (statically known)
    * list sequence — no double aggregation, so shuffle order cannot
    * perturb it and an oracle replaying the same chain matches
    * bit-for-bit (the q109 policy). An id absent from a list
    * contributes exactly 0.0. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String,
      rankCol: String = "rank", k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1, s"rrfFuse needs k >= 1, got $k")
    val ids = rankings.map(_.select(col(idCol))).reduce(_ unionAll _).distinct()
    val joined = rankings.zipWithIndex.foldLeft(ids) { case (acc, (r, i)) =>
      acc.join(r.select(col(idCol), col(rankCol).cast(LongType).as(s"rank_$i")),
        Seq(idCol), "left")
    }
    val terms = rankings.indices.map(i =>
      coalesce(lit(1.0) / (lit(k.toDouble) + col(s"rank_$i").cast(DoubleType)),
        lit(0.0)))
    val hits = rankings.indices
      .map(i => when(col(s"rank_$i").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    joined.select(col(idCol) +: rankings.indices.map(i => col(s"rank_$i")) :+
      hits.as("n_lists") :+ terms.reduce(_ + _).as("rrf"): _*)
  }

  /** Dyadic exponential moving average (α = 1/2) over a bounded frame —
    * the recursive smoother y_n = (x_n + y_{n-1})/2 restarted at the
    * start of a `lags`-row sliding window, so every output depends on at
    * most lags+1 rows and all weights are powers of two. Since the tail
    * weight beyond 20 lags is < 1e-6, the window form is the streaming-
    * friendly, numerically-identical-everywhere formulation of EWMA.
    *
    * Exactness: values micro-quantize to longs, every weight is an
    * integer shift of 2^lags (seed term gets double weight — exactly the
    * restarted recursion), the weighted sum is exact BIGINT arithmetic
    * under any execution order, and the result is ONE double division by
    * 2^lags·1e6. Magnitude: |xq|·2^(lags-1)·(lags+1) must fit a long —
    * fine for |x| ≤ 1e6 at the default lags=20.
    *
    * 100 TB shape: one window per key (frame bounded by lags+1 — never
    * corpus-sized state), no joins, no collects. NULL values carry no
    * signal and are dropped before framing (the q113 contract). */
  def ewmaDyadic(df: DataFrame, valueCol: String, keyCol: String,
      orderCols: Seq[String], lags: Int = 20): DataFrame = {
    require(lags >= 1 && lags <= 40, s"ewmaDyadic needs 1 <= lags <= 40, got $lags")
    val base = df.filter(col(valueCol).isNotNull)
      .withColumn("__xq",
        round(col(valueCol).cast(DoubleType) * lit(1000000.0)).cast(LongType))
    val ord = orderCols.map(col)
    val wRank = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val wFrame = wRank.rowsBetween(-lags, Window.currentRow)
    // frame list arrives oldest→newest (window order); position i=1 is
    // the restart seed and carries weight 2^(lags+1-n), positions i>=2
    // carry 2^(lags-1-n+i) — the exact dyadic recursion unrolled
    val yq = expr(
      s"""aggregate(
         |  zip_with(__lst, sequence(1, size(__lst)), (x, i) ->
         |    x * shiftleft(1L, CASE WHEN i = 1 THEN $lags + 1 - size(__lst)
         |                         ELSE $lags - 1 - size(__lst) + i END)),
         |  0L, (a, b) -> a + b)""".stripMargin)
    base
      .withColumn("rn", row_number().over(wRank).cast(LongType))
      .withColumn("__lst", collect_list(col("__xq")).over(wFrame))
      .withColumn("yq", yq)
      .select(col(keyCol), col("rn"), col(valueCol), col("yq"),
        (col("yq").cast(DoubleType) /
          lit((1L << lags).toDouble * 1000000.0)).as("ewma"))
  }

  /** Exact distributed global rank — the textbook two-phase order
    * statistic: range-repartition on the order columns, pin the staged
    * partitioning (localCheckpoint — range boundaries are SAMPLED, so
    * the counts job and the rank job must see the SAME split), collect
    * per-partition counts (bounded by the partition count, never data-
    * sized), and add the broadcast cumulative offset to each partition-
    * local row_number. `orderCols` must be a total order (include a
    * unique tiebreaker) or ranks at partition boundaries are undefined.
    * Unlike a bare `row_number() OVER (ORDER BY …)` — which Spark
    * executes on ONE partition — every stage here is parallel. */
  def globalRank(df: DataFrame, orderCols: Seq[String],
      rankName: String = "grank"): DataFrame = {
    val ord = orderCols.map(col)
    val staged = df.repartitionByRange(ord: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = staged.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) {
      case ((_, acc), (p, c)) => (p + 1, acc + c)
    }.dropRight(1).zip(counts).map { case ((_, off), (p, _)) => (p, off) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    staged.join(broadcast(offDf), Seq("__pid"))
      .withColumn(rankName, row_number().over(w).cast(LongType) + col("__off"))
      .drop("__pid", "__off")
  }

  /** Cross-source quantile normalization — map each group's value
    * distribution onto the GLOBAL distribution (the scanner-effect /
    * score-calibration transform: after it, every group's quantiles
    * coincide). Row at within-group rank r of n maps to the global order
    * statistic at position ⌊(r−1)(N−1)/(n−1)⌋+1 (singleton groups map to
    * the global median position) — all INTEGER arithmetic, so the only
    * doubles in the output are input values themselves.
    *
    * 100 TB shape: the global order-statistic table comes from
    * [[globalRank]] (parallel two-phase ranking — never a one-partition
    * window), group ranks are ordinary partitioned windows, and the
    * final lookup is an equi join on the computed position. Magnitude:
    * (n−1)·(N−1) must fit a long — holds to N ~ 3e9 per group-size 3e9;
    * beyond that, bucket first. */
  def quantileNormalize(df: DataFrame, valueCol: String, groupCol: String,
      idCol: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(idCol), col(groupCol), col(valueCol))
    val ranked = globalRank(base, Seq(valueCol, idCol))
    val n1 = ranked.agg(max(col("grank")).as("__n")).select(
      (col("__n") - 1L).as("__n1"), ((col("__n") + 1L) / 2).cast(LongType).as("__mid"))
    val gstat = ranked.select(col("grank").as("__gpos"),
      col(valueCol).as("normalized"))
    val wg = Window.partitionBy(col(groupCol))
    val rs = row_number().over(wg.orderBy(col(valueCol), col(idCol))).cast(LongType)
    val pos = base
      .withColumn("g_rank", rs)
      .withColumn("g_n", count(lit(1)).over(wg))
      .crossJoin(broadcast(n1))
      .withColumn("__gpos",
        when(col("g_n") > 1L,
          expr("((g_rank - 1) * __n1) div (g_n - 1)") + 1L)
          .otherwise(col("__mid")))
    pos.join(gstat, Seq("__gpos"))
      .select(col(idCol), col(groupCol), col(valueCol), col("g_rank"),
        col("g_n"), col("__gpos").as("g_pos"), col("normalized"))
  }

  /** Synchronous k-core peeling — the web-graph quality filter (keep
    * only the subgraph where every node retains ≥ k neighbors after
    * everything weaker is recursively stripped): each round removes ALL
    * nodes of degree < k at once and recomputes degrees on the induced
    * subgraph. Fixed `rounds` synchronous passes (the caller picks
    * depth; peeling converges monotonically, so extra rounds are
    * no-ops once stable). Returns surviving (node, degree).
    *
    * 100 TB shape (r9 rewrite — incremental degrees, zero edge-sized
    * shuffles per round): the r8 form re-filtered the full edge list
    * with two semi-joins per round AND, with lineage cut only every 5
    * rounds, re-evaluated each prior round ~3× per level (~3^rounds
    * replays of round 0 — measured as the slowest query of the r8 sf1
    * ladder). Peeling only ever needs DEGREES, and a survivor's induced
    * degree changes by exactly its count of newly-removed neighbors, so
    * the adjacency is now built ONCE (canonical-orientation distinct,
    * then symmetric doubling — dedup before doubling halves the distinct)
    * and cached hash-partitioned by the probe key; each round is
    *   rem   = degree rows that fell below k          (node-sized filter)
    *   delta = adj ⋈ rem on nbr → count per node      (adj probed from
    *           cache; rem is the small side — AQE broadcasts it after
    *           the first peel, so the full edge list is never
    *           re-shuffled; only the incident-edge subset aggregates)
    *   deg   = survivors.left-join(delta), __d − __rm  (node-sized)
    * The degree table is materialized per round (it feeds three
    * consumers), so total work is linear in rounds. Removed-set
    * disjointness across rounds makes the subtraction exact — a
    * neighbor removed in round r is gone from the degree table and can
    * never be subtracted twice. Never a cartesian, never driver
    * traffic. Materialization is executor-storage persist, or reliable
    * `checkpoint` under the `checkpointDir` durability switch shared
    * with [[pageRank]]; the working set is unpersisted on exit, the
    * node-sized result is checkpointed. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int = 3, checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"kCore needs k >= 1, got $k")
    require(rounds >= 1, s"kCore needs rounds >= 1, got $rounds")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def mat(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint()
      else {
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
      }
    // Canonical orientation first: (least, greatest) + distinct dedups
    // BEFORE the symmetric doubling, so the doubled list needs no second
    // distinct (unioning both directions of unique a<b pairs cannot
    // collide) — one edge shuffle of setup instead of two.
    val canon = edges.select(
        least(col(srcCol).cast(StringType), col(dstCol).cast(StringType)).as("a"),
        greatest(col(srcCol).cast(StringType), col(dstCol).cast(StringType)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val adj = mat(canon.select(col("a").as("node"), col("b").as("nbr"))
      .unionAll(canon.select(col("b").as("node"), col("a").as("nbr")))
      .repartition(col("nbr")))
    var deg = mat(adj.groupBy(col("node")).agg(count(lit(1)).as("__d")))
    var r = 0
    while (r < rounds) {
      val rem = deg.filter(col("__d") < k).select(col("node").as("nbr"))
      val delta = adj.join(rem, Seq("nbr"))
        .groupBy(col("node")).agg(count(lit(1)).as("__rm"))
      val prev = deg
      deg = mat(prev.filter(col("__d") >= k)
        .join(delta, Seq("node"), "left")
        .select(col("node"),
          (col("__d") - coalesce(col("__rm"), lit(0L))).as("__d")))
      if (checkpointDir.isEmpty) prev.unpersist()
      r += 1
    }
    // __d = 0 survivors (every neighbor peeled) have no edge left in the
    // induced subgraph — excluded, matching the degree-of-induced-edges
    // contract. Node-sized result is cut so the cached working set can
    // be released.
    val out =
      if (checkpointDir.isDefined)
        deg.filter(col("__d") > 0L).select(col("node"), col("__d").as("degree"))
      else {
        val o = deg.filter(col("__d") > 0L)
          .select(col("node"), col("__d").as("degree")).localCheckpoint()
        deg.unpersist(); adj.unpersist()
        o
      }
    out
  }

  /** Exact per-group winsorization — clip each value into its group's
    * [loPermille, hiPermille] order-statistic band (the outlier-taming
    * transform run before normalization/aggregation so one wild sensor
    * or spam burst cannot drag a group mean). Bound positions are pure
    * integer arithmetic — ⌈p·n/1000⌉ clamped to ≥ 1 — so the only
    * doubles in the output are input values themselves.
    *
    * 100 TB shape: one per-group rank window (groups are the partition
    * key — never a global sort), then the two bound rows per group
    * collapse to a #groups-sized table that broadcasts back onto the
    * stream. */
  def winsorize(df: DataFrame, valueCol: String, groupCol: String,
      idCol: String, loPermille: Int = 50, hiPermille: Int = 950): DataFrame = {
    require(0 <= loPermille && loPermille <= hiPermille && hiPermille <= 1000,
      s"winsorize needs 0 <= lo <= hi <= 1000, got $loPermille/$hiPermille")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(idCol), col(groupCol), col(valueCol))
    val wg = Window.partitionBy(col(groupCol))
    val ranked = base
      .withColumn("__r", row_number()
        .over(wg.orderBy(col(valueCol), col(idCol))).cast(LongType))
      .withColumn("__n", count(lit(1)).over(wg))
      .withColumn("__lo", greatest(lit(1L),
        expr(s"($loPermille * __n + 999) div 1000")))
      .withColumn("__hi", greatest(lit(1L),
        expr(s"($hiPermille * __n + 999) div 1000")))
    val bounds = ranked
      .filter(col("__r") === col("__lo") || col("__r") === col("__hi"))
      .groupBy(col(groupCol)).agg(
        min(when(col("__r") === col("__lo"), col(valueCol))).as("lo_val"),
        max(when(col("__r") === col("__hi"), col(valueCol))).as("hi_val"))
    ranked.join(broadcast(bounds), Seq(groupCol))
      .select(col(idCol), col(groupCol), col(valueCol), col("lo_val"),
        col("hi_val"),
        least(greatest(col(valueCol), col("lo_val")), col("hi_val"))
          .as("winsorized"))
  }

  /** Per-key sample autocorrelation at lags 1..maxLag — the seasonality
    * / burst-persistence detector for telemetry streams (is a metric's
    * next sample predicted by its previous one?):
    * r_k = Σ(x_i−x̄)(x_{i+k}−x̄) / Σ(x_i−x̄)², x̄ over the full series.
    *
    * Exactness: values micro-quantize to longs through a DECIMAL(19,6)
    * cast (q92's conversion — both engines round the double identically),
    * every moment (Σx, Σx², lagged pair sums Σx_i·x_{i+k}, head/tail
    * partial sums) is an exact DECIMAL(38,0)/int128 integer, and the
    * mean never materializes: the estimator is cross-multiplied by n²
    * so numerator and denominator are single exact integers and r_k is
    * ONE double division. Constant series (den = 0) yield NULL.
    *
    * 100 TB shape: one window shuffle on the key computes every lead
    * column, one keyed aggregate per series + one per (series, lag) —
    * output is #keys·maxLag rows. Never a self-join of the stream. */
  def acf(df: DataFrame, valueCol: String, keyCol: String, tsCol: String,
      idCol: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 16, s"acf needs 1 <= maxLag <= 16, got $maxLag")
    val dec = DecimalType(38, 0)
    val base = df.select(col(keyCol).as("__k"),
      unix_micros(col(tsCol)).as("__us"), col(idCol).as("__id"),
      (col(valueCol).cast(DecimalType(19, 6)) * lit(1000000))
        .cast(LongType).as("__xq"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__us"), col("__id"))
    val leads = (1 to maxLag).foldLeft(base) { (d, k) =>
      d.withColumn(s"__l$k", lead(col("__xq"), k).over(w))
    }
    val g = base.groupBy(col("__k")).agg(
      count(lit(1)).as("__n"),
      sum(col("__xq")).as("__sx"),
      sum(col("__xq").cast(dec) * col("__xq")).as("__sxx"))
    val pairs = leads.select(col("__k"), explode(array((1 to maxLag).map(k =>
        struct(lit(k).cast(LongType).as("lag"), col("__xq").as("x"),
          col(s"__l$k").as("xk"))): _*)).as("p"))
      .select(col("__k"), col("p.lag").as("lag"), col("p.x").as("x"),
        col("p.xk").as("xk"))
      .filter(col("xk").isNotNull)
    val pl = pairs.groupBy(col("__k"), col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("x").cast(dec) * col("xk")).as("__sk"),
      sum(col("x")).as("__sh"),
      sum(col("xk")).as("__st"))
    val nd = col("__n").cast(dec)
    val sx = col("__sx").cast(dec)
    val num = nd * nd * col("__sk") - nd * sx * col("__sh") -
      nd * sx * col("__st") + (nd - col("lag")) * sx * sx
    val den = nd * nd * col("__sxx") - nd * sx * sx
    pl.join(g, Seq("__k"))
      .select(col("__k").as(keyCol), col("lag"), col("__n").as("n"),
        col("n_pairs"),
        when(den === lit(0), lit(null).cast(DoubleType))
          .otherwise(num.cast(DoubleType) / den.cast(DoubleType)).as("acf"))
  }

  /** Per-key CUSUM changepoint scan — the sequential drift alarm (has
    * this series' level shifted up by more than `slack` from its
    * overall mean, accumulated past `threshold`?): the classic
    * recursion s_i = max(0, s_{i−1} + (x_i − x̄ − slack)) rewritten as
    * prefix algebra — s_i = R_i − min(0, min_{j≤i} R_j) with
    * R_i = Σ_{t≤i}(x_t − x̄ − slack) — so two window functions over ONE
    * key-partitioned sort replace the unwindowable recursion.
    *
    * Exactness: x̄ = Σx/n never materializes — every term is scaled by
    * n (d_i = n·x_i_micro − Σx_micro − n·slack_micro, an exact
    * DECIMAL(38,0)/int128 integer), running sums/mins stay integer
    * under the deterministic (ts, id) order, and the alarm compare
    * s_i > n·threshold_micro is pure integer. The reported cusum is one
    * fixed double chain (÷n ÷1e6). Exact on both engines end to end.
    *
    * 100 TB shape: one keyed aggregate (n, Σx per series — #keys rows,
    * broadcast back) + one window shuffle on the key. Output is
    * row-per-sample by design (the alarm TRACE); filter on `alarm`
    * downstream for the sparse form. */
  def cusum(df: DataFrame, valueCol: String, keyCol: String, tsCol: String,
      idCol: String, slack: Double = 5.0, threshold: Double = 50.0): DataFrame = {
    require(slack >= 0, s"cusum needs slack >= 0, got $slack")
    require(threshold > 0, s"cusum needs threshold > 0, got $threshold")
    val dec = DecimalType(38, 0)
    val kq = math.round(slack * 1e6)    // exact micro-unit constants
    val hq = math.round(threshold * 1e6)
    val base = df.select(col(keyCol).as("__k"),
      unix_micros(col(tsCol)).as("__us"), col(idCol).as("__id"),
      (col(valueCol).cast(DecimalType(19, 6)) * lit(1000000))
        .cast(LongType).as("__xq"))
    val g = base.groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"), sum(col("__xq")).as("__sx"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__us"), col("__id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nd = col("__n").cast(dec)
    base.join(broadcast(g), Seq("__k"))
      .withColumn("__d",
        nd * col("__xq").cast(dec) - col("__sx").cast(dec) - nd * lit(kq))
      .withColumn("__r", sum(col("__d")).over(run))
      .withColumn("__m", least(lit(0).cast(dec), min(col("__r")).over(run)))
      .select(col("__k").as(keyCol), col("__id").as(idCol),
        ((col("__r") - col("__m")).cast(DoubleType) /
          col("__n").cast(DoubleType) / lit(1.0e6)).as("cusum"),
        (col("__r") - col("__m") > nd * lit(hq)).cast(IntegerType).as("alarm"))
  }

  /** Per-group chi-square drift of a categorical column against the
    * corpus-wide distribution — the CATEGORICAL axis of the drift family
    * (q122's KS and q136's PSI cover numeric distributions; this one
    * audits e.g. the language mix per crawl source). Standard
    * contingency form: χ²_g = Σ_cat (o − e)²/e with e = rt·ct/N,
    * cross-multiplied to (o·N − rt·ct)²/(N·rt·ct) so every operand is an
    * exact integer.
    *
    * Exactness without a rounding function: each cell's term is
    * nano-scaled by INTEGER LONG DIVISION — q·1e9 + (rem·1e9) div den
    * from the euclidean split of d² by den — so there is no float round
    * anywhere (a rational term CAN land on a .5 tie; q123 proved
    * decimal-vs-float round() diverges there). Truncation bias < 1e-9
    * per cell, identical on both engines. χ² is one double division.
    *
    * 100 TB shape: three keyed count aggregates + a #groups × #cats
    * grid (dimension-table-sized); zero-observed cells enter via the
    * grid left join (they carry rt·ct/N of the statistic). */
  def chiSquareDrift(df: DataFrame, categoryCol: String,
      groupCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = df.select(col(groupCol).cast(StringType).as("__g"),
        col(categoryCol).cast(StringType).as("__c"))
      .filter(col("__g").isNotNull && col("__c").isNotNull)
    val cells = base.groupBy(col("__g"), col("__c")).agg(count(lit(1)).as("__o"))
    val rt = base.groupBy(col("__g")).agg(count(lit(1)).as("__rt"))
    val ct = base.groupBy(col("__c")).agg(count(lit(1)).as("__ct"))
    val n1 = base.agg(count(lit(1)).as("__nn"),
      count_distinct(col("__c")).as("__k"))
    rt.crossJoin(broadcast(ct))
      .join(cells, Seq("__g", "__c"), "left").na.fill(0L, Seq("__o"))
      .crossJoin(broadcast(n1))
      .withColumn("__d", col("__o").cast(dec) * col("__nn") -
        col("__rt").cast(dec) * col("__ct"))
      .withColumn("__d2", col("__d") * col("__d"))
      .withColumn("__den", col("__nn").cast(dec) * col("__rt") * col("__ct"))
      .withColumn("__ts", expr("__d2 div __den") * lit(1000000000L) +
        expr("((__d2 % __den) * 1000000000) div __den"))
      .groupBy(col("__g"), col("__rt"), col("__k"))
      .agg((sum(col("__ts")).cast(DoubleType) / lit(1.0e9)).as("chi2"))
      .select(col("__g").as(groupCol), col("__rt").as("n"),
        (col("__k") - lit(1L)).cast(LongType).as("dof"), col("chi2"))
  }

  /** Two-proportion z-test over a deterministic unit-level A/B table —
    * the experiment-analysis primitive (did variant B convert better
    * than A, beyond what chance explains?):
    * z = (p̂_B − p̂_A) / sqrt(p̂(1−p̂)(1/n_A + 1/n_B)) with p̂ pooled.
    *
    * All inputs to the chain are exact integer counts from ONE 1-row
    * aggregate; the z statistic is a fixed double expression tree
    * (divisions, one sqrt — every op IEEE-correctly-rounded, so an
    * identical tree is bit-identical cross-engine). Degenerate splits
    * (an empty arm, or zero/full pooled conversion → se = 0) yield NULL
    * rather than ±Inf/NaN. */
  def twoProportionZTest(units: DataFrame, variantCol: String,
      convCol: String): DataFrame = {
    val v = col(variantCol)
    val cv = col(convCol)
    val agg = units.agg(
      count(when(!v, 1)).as("n_a"),
      count(when(!v && cv, 1)).as("conv_a"),
      count(when(v, 1)).as("n_b"),
      count(when(v && cv, 1)).as("conv_b"))
    val pa = col("conv_a").cast(DoubleType) / col("n_a").cast(DoubleType)
    val pb = col("conv_b").cast(DoubleType) / col("n_b").cast(DoubleType)
    val pp = (col("conv_a") + col("conv_b")).cast(DoubleType) /
      (col("n_a") + col("n_b")).cast(DoubleType)
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast(DoubleType) +
        lit(1.0) / col("n_b").cast(DoubleType)))
    val degenerate = col("n_a") === 0 || col("n_b") === 0 ||
      col("conv_a") + col("conv_b") === 0 ||
      col("conv_a") + col("conv_b") === col("n_a") + col("n_b")
    agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      (pb - pa).as("lift"),
      when(degenerate, lit(null).cast(DoubleType))
        .otherwise((pb - pa) / se).as("z"))
  }

  /** Weighted HITS hubs & authorities — [[pageRank]]'s companion link
    * analysis (PageRank measures POPULARITY via random-walk mass; HITS
    * separates being a good SOURCE of links (hub) from being a good
    * TARGET (authority) — the curation signal for "this page links to
    * quality" vs "quality links to this page"). Mutual recursion
    * a ∝ Σ_in w·h, h ∝ Σ_out w·a, L1-normalized each half-round.
    *
    * Exactness: the q111 policy verbatim — every order-sensitive sum
    * (in/out contributions, the normalizers) is pico-quantized to longs
    * before aggregation; normalization is one double division per node.
    * Durability: same `checkpointDir` switch as [[pageRank]].
    *
    * 100 TB shape: per half-round one keyed join + one aggregation and
    * a 1-row normalizer broadcast; lineage cut per round. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int = 8,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"hits needs iterations >= 1, got $iterations")
    val Q = 1.0e12
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def cut(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val e0 = edges.select(col(srcCol).cast(StringType).as("src"),
      col(dstCol).cast(StringType).as("dst"),
      col(weightCol).cast(DoubleType).as("w"))
    val badW = e0.filter(col("w").isNull || !(col("w") > 0.0)).limit(1).count()
    require(badW == 0L,
      s"hits: weight column '$weightCol' must be positive and non-null")
    val e = cut(e0)
    val nodes = cut(e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    require(n > 0, "hits: empty edge list")
    var scores = nodes.withColumn("hub", lit(1.0) / lit(n.toDouble))
      .withColumn("auth", lit(0.0))
    var i = 0
    while (i < iterations) {
      // authority half-round: pull hub mass along in-edges, L1-normalize.
      // The pulled-mass table is MATERIALIZED (r9): it feeds the
      // normalizer aggregate AND the node join, and `auth` below feeds
      // the hub half-round AND the round's score join — uncut, each
      // consumer replayed the edge join, ~4x the per-round work (the
      // kCore lineage lesson, bounded per round here since scores is
      // cut). The cut table is node-sized.
      val aq = cut(e.join(scores.select(col("node").as("src"), col("hub")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(round(col("w") * col("hub") * lit(Q)).cast(LongType)).as("__aq")))
      val asum = aq.agg(sum(col("__aq")).as("__as"))
      val auth = nodes.join(aq, Seq("node"), "left")
        .crossJoin(broadcast(asum))
        .select(col("node"),
          (coalesce(col("__aq"), lit(0L)).cast(DoubleType) /
            col("__as").cast(DoubleType)).as("auth"))
      // hub half-round: pull the fresh authority along out-edges
      val hq = cut(e.join(auth.select(col("node").as("dst"), col("auth")), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(sum(round(col("w") * col("auth") * lit(Q)).cast(LongType)).as("__hq")))
      val hsum = hq.agg(sum(col("__hq")).as("__hs"))
      val hub = nodes.join(hq, Seq("node"), "left")
        .crossJoin(broadcast(hsum))
        .select(col("node"),
          (coalesce(col("__hq"), lit(0L)).cast(DoubleType) /
            col("__hs").cast(DoubleType)).as("hub"))
      scores = cut(hub.join(auth, Seq("node")))
      i += 1
    }
    scores.select(col("node"), col("auth").as("authority"), col("hub"))
  }

  /** Order-free table fingerprint — the data-integrity primitive for
    * migrations/compactions/replication at lake scale: XOR of per-row
    * 63-bit md5 hashes + exact row count. Two tables are (overwhelmingly
    * likely) row-identical iff fingerprints AND counts match, and the
    * check is a map-side XOR with a 1-row result — no sort, no shuffle
    * of data, no driver-side compare of contents.
    *
    * Rows are serialized as control-char-joined string casts (U+0001
    * separator, U+0002 for NULL) — restrict `cols` to integer/string columns (float and
    * timestamp string forms are not portable across engines/locales).
    * XOR is commutative+associative, so partitioning and row order are
    * irrelevant by construction. */
  def tableFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableFingerprint needs at least one column")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val rowStr = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast(StringType), lit("\u0002"))): _*)
    df.agg(count(lit(1)).as("n_rows"),
      coalesce(bit_xor(call_function("md5_lower64", rowStr)
        .bitwiseAND(lit(0x7FFFFFFFFFFFFFFFL))), lit(0L)).as("fingerprint"))
  }

  /** Pairwise association rules over baskets — market-basket support /
    * confidence / lift for item pairs (the co-purchase recommender
    * signal; q119's event paths are the SEQUENTIAL analogue, this is the
    * set-co-occurrence one). Returns unordered pairs (a < b) with
    * basket-count support ≥ `minSupport` and both directed confidences.
    *
    * All ratios are single double divisions of exact integer counts;
    * the support filter is an integer compare.
    *
    * 100 TB shape: distinct (basket, item) first (collapses quantity
    * rows), pair generation is the per-basket a<b self-join — fan-out
    * C(basket size, 2), the q140/q147 edge shape, never a global
    * cartesian; item and pair counts are keyed aggregates. */
  def assocRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1, s"assocRules needs minSupport >= 1, got $minSupport")
    val bi = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .filter(col("__bk").isNotNull && col("__it").isNotNull)
      .distinct()
    val nb = bi.agg(count_distinct(col("__bk")).as("__nb"))
    val ic = bi.groupBy(col("__it")).agg(count(lit(1)).as("__ci"))
    val pairs = bi.alias("x").join(bi.alias("y"),
        col("x.__bk") === col("y.__bk") && col("x.__it") < col("y.__it"))
      .groupBy(col("x.__it").as("item_a"), col("y.__it").as("item_b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minSupport)
    pairs
      .join(ic.select(col("__it").as("item_a"), col("__ci").as("__ca")), Seq("item_a"))
      .join(ic.select(col("__it").as("item_b"), col("__ci").as("__cb")), Seq("item_b"))
      .crossJoin(broadcast(nb))
      .select(col("item_a"), col("item_b"), col("pair_n"),
        col("__ca").as("n_a"), col("__cb").as("n_b"),
        (col("pair_n").cast(DoubleType) / col("__nb").cast(DoubleType))
          .as("support"),
        (col("pair_n").cast(DoubleType) / col("__ca").cast(DoubleType))
          .as("conf_a_to_b"),
        (col("pair_n").cast(DoubleType) / col("__cb").cast(DoubleType))
          .as("conf_b_to_a"),
        ((col("pair_n") * col("__nb")).cast(DoubleType) /
          (col("__ca") * col("__cb")).cast(DoubleType)).as("lift"))
  }

  /** Theil–Sen robust trend per key — the median of all pairwise slopes
    * (v_j − v_i)/(t_j − t_i): the heavy-tail-safe twin of the OLS
    * slope exactly as MAD (q118) is to the z-score (q85) — one wild
    * point moves an OLS fit arbitrarily but shifts a slope MEDIAN by at
    * most one rank. `tCol`/`vCol` must be exact integers (epoch days,
    * cents); same-t pairs are excluded (vertical slope), keys with no
    * valid pair drop out.
    *
    * Exactness: each slope is ONE double division of exact longs;
    * median selection is integer rank arithmetic over a deterministic
    * (slope, rank-pair) order, and the even-m midpoint is one fixed
    * (lo+hi)/2 chain — both engines replay it bit-for-bit.
    *
    * 100 TB shape: pair generation is per-key C(min(n, maxPoints), 2)
    * via a keyed self-join on the row_number prefix — the cap bounds
    * the quadratic per key (points beyond `maxPoints` in time order are
    * ignored, documented truncation); everything shuffles on the key
    * only. */
  def theilSen(df: DataFrame, keyCol: String, tCol: String, vCol: String,
      maxPoints: Int = 1000): DataFrame = {
    require(maxPoints >= 2, s"theilSen needs maxPoints >= 2, got $maxPoints")
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__v"))
    val base = df.select(col(keyCol).as("__k"),
        col(tCol).cast(LongType).as("__t"), col(vCol).cast(LongType).as("__v"))
      .filter(col("__t").isNotNull && col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPoints)
    val slopes = base.alias("x").join(base.alias("y"),
        col("x.__k") === col("y.__k") && col("x.__rn") < col("y.__rn"))
      .filter(col("y.__t") =!= col("x.__t"))
      .select(col("x.__k").as("__k"), col("x.__rn").as("__ri"),
        col("y.__rn").as("__rj"),
        ((col("y.__v") - col("x.__v")).cast(DoubleType) /
          (col("y.__t") - col("x.__t")).cast(DoubleType)).as("__s"))
    val sw = Window.partitionBy(col("__k"))
    val ranked = slopes
      .withColumn("__r", row_number()
        .over(sw.orderBy(col("__s"), col("__ri"), col("__rj"))).cast(LongType))
      .withColumn("__m", count(lit(1)).over(sw))
      .withColumn("__lo", expr("(__m + 1) div 2"))
      .withColumn("__hi", expr("(__m + 2) div 2"))
    val n = base.groupBy(col("__k")).agg(count(lit(1)).as("n"))
    ranked
      .filter(col("__r") === col("__lo") || col("__r") === col("__hi"))
      .groupBy(col("__k"), col("__m"))
      .agg(((min(when(col("__r") === col("__lo"), col("__s"))) +
        max(when(col("__r") === col("__hi"), col("__s")))) / lit(2.0))
        .as("slope_ts"))
      .join(n, Seq("__k"))
      .select(col("__k").as(keyCol), col("n"), col("__m").as("n_pairs"),
        col("slope_ts"))
  }

  /** Zone-map skip audit — per-file SKIPPABLE decisions for a range
    * predicate `[lo, hi]` from a stats manifest alone (file, min, max,
    * rows): the data-skipping planner next to q130's compaction planner
    * and q116's range layout. A file is skippable iff its [min, max]
    * zone cannot intersect the predicate — the row-group/file pruning
    * rule every lake format (parquet zone maps, Iceberg/Delta file
    * stats) applies; auditing it from the manifest predicts scan cost
    * BEFORE touching data, and a low skip fraction on a hot predicate
    * is the signal to re-layout (q116/q81).
    *
    * Pure integer compares over manifest-sized input — the planner
    * never reads data files. */
  def zoneMapSkipAudit(manifest: DataFrame, fileCol: String, minCol: String,
      maxCol: String, rowsCol: String, lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"zoneMapSkipAudit needs lo <= hi, got $lo > $hi")
    manifest.select(col(fileCol),
      col(minCol).cast(LongType).as("min_v"),
      col(maxCol).cast(LongType).as("max_v"),
      col(rowsCol).cast(LongType).as("n_rows"),
      (col(maxCol).cast(LongType) < lit(lo) ||
        col(minCol).cast(LongType) > lit(hi)).cast(IntegerType).as("skippable"))
  }

  /** Cross-correlation of two event-count series at lags −maxLag..maxLag
    * — [[acf]]'s cross-series twin (does series x LEAD series y?): both
    * series are daily counts on the full closed day grid (gap days are
    * genuine zeros), r_xy(k) pairs x_d with y_{d+k} and normalizes by
    * the full-series variances.
    *
    * Exactness: counts are exact integers; the estimator is
    * cross-multiplied by n² (the q149 device) so numerator and both
    * variance terms are single exact DECIMAL(38,0)/int128 integers, and
    * the result is one fixed double chain with two sqrts. Constant
    * series yield NULL.
    *
    * Scale note: the day grid is #days-sized — an AGGREGATE result, not
    * raw data — so the single-partition lead window over it is
    * dimension-table work (the q108 k-row-window precedent); everything
    * upstream is keyed counts. */
  def ccf(df: DataFrame, tsCol: String, typeCol: String, xType: String,
      yType: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 16, s"ccf needs 1 <= maxLag <= 16, got $maxLag")
    val dec = DecimalType(38, 0)
    val d = df.select(epochDay(col(tsCol)).as("d"), col(typeCol).as("t"))
    val counts = d.groupBy(col("d")).agg(
      count(when(col("t") === xType, 1)).as("x"),
      count(when(col("t") === yType, 1)).as("y"))
    val bounds = d.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = bounds.select(explode(sequence(col("d0"), col("d1"))).as("d"))
      .join(counts, Seq("d"), "left").na.fill(0L, Seq("x", "y"))
    val w = Window.orderBy(col("d"))
    val leads = (1 to maxLag).foldLeft(grid) { (g, k) =>
      g.withColumn(s"__yl$k", lead(col("y"), k).over(w))
        .withColumn(s"__xl$k", lead(col("x"), k).over(w))
    }
    val g1 = grid.agg(count(lit(1)).as("__n"),
      sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
      sum(col("x").cast(dec) * col("x")).as("__sxx"),
      sum(col("y").cast(dec) * col("y")).as("__syy"))
    // lag k > 0: (x_d, y_{d+k}); lag 0: (x, y); lag −k: (x_{d+k}, y_d)
    val pairStructs =
      (1 to maxLag).map(k => struct(lit(-k.toLong).as("lag"),
        col(s"__xl$k").as("a"), col("y").as("b"))) ++
      Seq(struct(lit(0L).as("lag"), col("x").as("a"), col("y").as("b"))) ++
      (1 to maxLag).map(k => struct(lit(k.toLong).as("lag"),
        col("x").as("a"), col(s"__yl$k").as("b")))
    val pairs = leads.select(explode(array(pairStructs: _*)).as("p"))
      .select(col("p.lag").as("lag"), col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val pl = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("a").cast(dec) * col("b")).as("__sab"),
      sum(col("a")).as("__sa"), sum(col("b")).as("__sb"))
    val nd = col("__n").cast(dec)
    val num = nd * nd * col("__sab") - nd * col("__sy").cast(dec) * col("__sa") -
      nd * col("__sx").cast(dec) * col("__sb") +
      col("__m2") * col("__sx").cast(dec) * col("__sy")
    val va = nd * nd * col("__sxx") - nd * col("__sx").cast(dec) * col("__sx")
    val vb = nd * nd * col("__syy") - nd * col("__sy").cast(dec) * col("__sy")
    pl.withColumn("__m2", col("n_pairs").cast(dec))
      .crossJoin(broadcast(g1))
      .select(col("lag"), col("n_pairs"),
        when(va === lit(0) || vb === lit(0), lit(null).cast(DoubleType))
          .otherwise(num.cast(DoubleType) /
            (sqrt(va.cast(DoubleType)) * sqrt(vb.cast(DoubleType)))).as("ccf"))
  }

  /** Keyed table diff — [[tableFingerprint]]'s drill-down: when two
    * table versions' fingerprints disagree, WHICH keys differ and how?
    * Emits one row per differing key with status `a_only` / `b_only` /
    * `changed`; identical rows produce NOTHING (the diff is sparse by
    * construction — its size is the drift, not the table).
    *
    * Value columns compare by the same portable row hash as
    * [[tableFingerprint]] (restrict to integer/string columns). Keys
    * must be unique per side — validated up front with a fail-loud scan
    * (duplicate keys would fan out the join and report phantom diffs).
    *
    * 100 TB shape: one hash projection per side + ONE keyed full-outer
    * join; nothing is collected, broadcast, or sorted globally. */
  def tableDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      valCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valCols.nonEmpty,
      "tableDiff needs non-empty key and value column lists")
    graft.functions.GraftFunctions.register(a.sparkSession)
    def rowHash: Column = call_function("md5_lower64",
      concat_ws("\u0001",
        valCols.map(c => coalesce(col(c).cast(StringType), lit("\u0002"))): _*))
      .bitwiseAND(lit(0x7FFFFFFFFFFFFFFFL))
    def hashed(df: DataFrame, side: String): DataFrame = {
      val dups = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
        .filter(col("__c") > 1).limit(1).count()
      require(dups == 0L,
        s"tableDiff: side '$side' has duplicate keys on (${keyCols.mkString(", ")})")
      df.select(keyCols.map(col) :+ rowHash.as(s"__h_$side"): _*)
    }
    hashed(a, "a").join(hashed(b, "b"), keyCols, "full_outer")
      .withColumn("status",
        when(col("__h_b").isNull, lit("a_only"))
          .when(col("__h_a").isNull, lit("b_only"))
          .otherwise(lit("changed")))
      .filter(col("__h_a").isNull || col("__h_b").isNull ||
        col("__h_a") =!= col("__h_b"))
      .select(keyCols.map(col) :+ col("status"): _*)
  }

  /** Adjusted Rand Index — pair-counting agreement between two
    * partitions of the same rows (cluster-assignment quality against a
    * reference, e.g. a dedup clustering vs ground truth), chance-
    * corrected like [[cohensKappa]] but over PAIRS, so it is invariant
    * to label permutations — the right metric when cluster ids carry no
    * meaning.
    *
    * Fully exact: with x = Σ n_ij(n_ij−1), a = Σ a_i(a_i−1),
    * b = Σ b_j(b_j−1), N₂ = n(n−1), ARI = (2·N₂·x − 2·a·b) /
    * (N₂·(a+b) − 2·a·b) — the cross-multiplied textbook form held in
    * DECIMAL(38,0) until ONE division. Degenerate partitions
    * (denominator 0: both sides all-singletons or all-one-cluster)
    * yield NULL. Magnitude: a·b ~ n⁴ holds in DECIMAL(38,0) to n ≈
    * 3·10⁹ rows — past that, pre-aggregate clusters.
    *
    * 100 TB shape: one (a, b) contingency aggregate, then
    * dimension-sized marginals — the [[mutualInfo]] shape. */
  def adjustedRandIndex(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("__a"), col(bCol).as("__b"))
    val c = base.groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__c"))
    val x = c.agg(sum(col("__c").cast(dec) * (col("__c") - 1L)).as("__x"),
      count(lit(1)).as("n_cells"), sum(col("__c")).as("n"))
    val a = c.groupBy(col("__a")).agg(sum(col("__c")).as("__ai"))
      .agg(sum(col("__ai").cast(dec) * (col("__ai") - 1L)).as("__sa"))
    val b = c.groupBy(col("__b")).agg(sum(col("__c")).as("__bj"))
      .agg(sum(col("__bj").cast(dec) * (col("__bj") - 1L)).as("__sb"))
    val n2 = col("n").cast(dec) * (col("n") - 1L).cast(dec)
    val num = lit(2L).cast(dec) * n2 * col("__x") -
      lit(2L).cast(dec) * col("__sa") * col("__sb")
    val den = n2 * (col("__sa") + col("__sb")) -
      lit(2L).cast(dec) * col("__sa") * col("__sb")
    x.crossJoin(broadcast(a)).crossJoin(broadcast(b))
      .select(col("n"), col("n_cells"),
        when(den === lit(0L).cast(dec), lit(null).cast(DoubleType))
          .otherwise(num.cast(DoubleType) / den.cast(DoubleType)).as("ari"))
  }

  /** Time-travel audit over a versioned file manifest — the live file
    * set AS OF each version v ∈ [0, maxVersion]: a file is visible when
    * `added ≤ v < deleted` (NULL deleted = still live). This is the
    * snapshot-resolution rule every versioned lake format applies;
    * auditing it per version shows table growth and churn at manifest
    * cost — the planner never touches data files (the q157 principle).
    *
    * 100 TB shape: manifest × (maxVersion+1) grid join on
    * dimension-sized input, one keyed aggregate. */
  def timeTravelAudit(manifest: DataFrame, addedCol: String,
      deletedCol: String, rowsCol: String, maxVersion: Int): DataFrame = {
    require(maxVersion >= 0, "timeTravelAudit: maxVersion must be >= 0")
    manifest
      .withColumn("version",
        explode(sequence(lit(0L), lit(maxVersion.toLong))))
      .filter(col(addedCol) <= col("version") &&
        (col(deletedCol).isNull || col(deletedCol) > col("version")))
      .groupBy(col("version"))
      .agg(count(lit(1)).as("n_files"), sum(col(rowsCol)).as("n_rows"))
  }

  /** Vacuum plan under a version-retention window — which deleted files
    * are safe to physically remove? A file whose `deleted ≤
    * currentVersion − retainVersions` can no longer be referenced by
    * any retained snapshot. Emits the deletable manifest rows; pure
    * integer filters over manifest-sized input. */
  def vacuumPlan(manifest: DataFrame, deletedCol: String,
      currentVersion: Int, retainVersions: Int): DataFrame = {
    require(retainVersions >= 0 && currentVersion >= retainVersions,
      "vacuumPlan: need 0 <= retainVersions <= currentVersion")
    manifest.filter(col(deletedCol).isNotNull &&
      col(deletedCol) <= currentVersion - retainVersions)
  }

  /** K-fold cross-validation of the group-mean predictor — the
    * model-selection primitive: per fold, predict each row by its
    * group's OUT-OF-FOLD mean and report the fold's RMSE. Folds are
    * md5-deterministic; out-of-fold means come from total-minus-fold
    * algebra over ONE (fold, group) aggregate — never k re-scans of the
    * data — and are micro-quantized integer floor divisions, so every
    * fold's predictions replay exactly cross-engine.
    *
    * 100 TB shape: one keyed (fold, group) aggregate; the k·#groups
    * out-of-fold model table broadcasts back; residual sums are one
    * more keyed aggregate. Rows whose group exists only inside their
    * own fold have no out-of-fold model and are excluded (counted in
    * `n_skipped`). */
  def crossValidateGroupMean(df: DataFrame, valueCol: String,
      groupCol: String, idCol: String, folds: Int = 5,
      scale: Int = 100): DataFrame = {
    require(folds >= 2, "crossValidateGroupMean: folds must be >= 2")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val dec = DecimalType(38, 0)
    val base = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        round(col(valueCol) * lit(scale.toDouble)).cast(LongType).as("__vq"),
        (call_function("md5_lower64", col(idCol).cast(StringType))
          .bitwiseAND(lit(0x7FFFFFFFL)) % folds).as("__f"))
    val fg = base.groupBy(col("__f"), col("__g"))
      .agg(count(lit(1)).as("__nfg"), sum(col("__vq")).as("__sfg"))
    val g = fg.groupBy(col("__g"))
      .agg(sum(col("__nfg")).as("__ng"), sum(col("__sfg")).as("__sg"))
    val oof = fg.join(g, "__g")
      .filter(col("__ng") > col("__nfg"))
      .select(col("__f"), col("__g"),
        expr("((__sg - __sfg) * 10000) div (__ng - __nfg)").as("__mean_mc"))
    val total = base.groupBy(col("__f")).agg(count(lit(1)).as("__nf"))
    base.join(broadcast(oof), Seq("__f", "__g"))
      .withColumn("__d", col("__vq") * 10000L - col("__mean_mc"))
      .groupBy(col("__f"))
      .agg(count(lit(1)).as("n"),
        sum(col("__d").cast(dec) * col("__d")).as("__sse"))
      .join(total, "__f")
      .select(col("__f").as("fold"), col("n"),
        (col("__nf") - col("n")).as("n_skipped"),
        (sqrt(col("__sse").cast(DoubleType) / col("n")) /
          (lit(1.0e4) * scale)).as("rmse"))
  }

  /** Proportional stratified sample — take
    * ⌊size·n_g/N⌋ rows from each stratum (q47/q48's hash gates keep
    * ratios only in expectation; evaluation sets and benchmarks need
    * exact per-stratum counts). Within a stratum, rows are selected in
    * md5-hash order of the id — the same deterministic "randomness" the
    * split/sample gates use, so the sample is reproducible bit-for-bit
    * under any partitioning and is itself hash-oracle-gated.
    *
    * 100 TB shape: one keyed count + a 1-row total, broadcast as the
    * #strata-row allocation; selection is one stratum-partitioned
    * window. Rounding is floor — Σ takes ≤ size by construction (the
    * shortfall is at most #strata rows; callers needing exact-total
    * can top up from the largest strata). */
  def proportionalSample(df: DataFrame, stratumCol: String, idCol: String,
      sampleSize: Int): DataFrame = {
    require(sampleSize > 0, "proportionalSample: sampleSize must be > 0")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__ng"))
    val tot = df.agg(count(lit(1)).as("__n"))
    val alloc = counts.crossJoin(broadcast(tot))
      .select(col(stratumCol), expr(s"($sampleSize * __ng) div __n").as("__take"))
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("__h"), col(idCol))
    df.withColumn("__h",
        call_function("md5_lower64", col(idCol).cast(StringType))
          .bitwiseAND(lit(0x7FFFFFFFFFFFFFFFL)))
      .join(broadcast(alloc), Seq(stratumCol))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= col("__take"))
      .drop("__h", "__r", "__take")
  }

  /** Distributed prefix sum — running total of `valueCol` in
    * `orderCols` order, the two-phase [[globalRank]] device generalized
    * from counts to sums: range-repartition, per-partition totals
    * collected once (#partitions rows of driver traffic), broadcast
    * cumulative offsets + partition-local running-sum windows. Never a
    * one-partition ORDER BY window.
    *
    * The order must be total (include a tiebreaker) for the running sum
    * to be engine-reproducible row-by-row. */
  def globalCumSum(df: DataFrame, orderCols: Seq[String], valueCol: String,
      outName: String = "cum"): DataFrame = {
    val ord = orderCols.map(col)
    val staged = df.repartitionByRange(ord: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = staged.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) {
      case ((_, acc), (p, c)) => (p + 1, acc + c)
    }.dropRight(1).zip(counts).map { case ((_, off), (p, _)) => (p, off) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    staged.join(broadcast(offDf), Seq("__pid"))
      .withColumn(outName, sum(col(valueCol)).over(w) + col("__off"))
      .drop("__pid", "__off")
  }

  /** Spearman rank correlation with tie-averaged ranks — the robust
    * (monotone-invariant) companion to Pearson for metric-agreement
    * checks (does quality score A order documents like score B?).
    *
    * Never ranks row-by-row: the tie-averaged rank of value v is
    * determined by the VALUE alone — cum_before(v) + (n_v+1)/2 — so
    * ranks come from a value-keyed count aggregate plus ONE
    * [[globalCumSum]] over the (far smaller) distinct-value table,
    * then join back by value. Doubled ranks (2r = 2·cum_before+n_v+1)
    * keep tie averages integral; Σ2r = n(n+1) exactly, so centering by
    * (n+1) needs no mean division. Moments are Decimal(18→38) sums of
    * exact integers; the SUM Σc² ≈ 4n³/3 is the binding bound — exact
    * to ~4·10¹² rows (past that Spark's non-ANSI decimal sum nulls out
    * and DuckDB's HUGEINT overflows: split the moment into per-range
    * partial sums combined in doubles, trading last-ulp exactness for
    * range). The only floating math is the final correctly-rounded
    * double conversions + one sqrt·sqrt division — identical
    * expression shape both engines.
    *
    * 100 TB shape: two value-keyed aggs, two cum-sums over distinct
    * values (partition-offset pattern, never a 1-partition window),
    * two value-equi joins back, one global 4-cell aggregate. */
  def spearmanCorr(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val D = DecimalType(18, 0)
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("__x"), col(yCol).as("__y"))
    def doubledRanks(c: String, out: String): DataFrame = {
      val counts = base.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__n"))
      globalCumSum(counts, Seq("__v"), "__n", "__cum")
        .select(col("__v").as(c),
          (lit(2L) * (col("__cum") - col("__n")) + col("__n") + lit(1L)).as(out))
    }
    val nRow = base.agg(count(lit(1)).as("__nn"))
    val cent = base.join(doubledRanks("__x", "__rx"), "__x")
      .join(doubledRanks("__y", "__ry"), "__y")
      .crossJoin(broadcast(nRow))
      .select((col("__rx") - (col("__nn") + lit(1L))).cast(D).as("__cx"),
        (col("__ry") - (col("__nn") + lit(1L))).cast(D).as("__cy"))
    cent.agg(count(lit(1)).as("n"),
        sum(col("__cx") * col("__cy")).as("__sxy"),
        sum(col("__cx") * col("__cx")).as("__sxx"),
        sum(col("__cy") * col("__cy")).as("__syy"))
      .select(col("n"),
        when(col("__sxx") === 0 || col("__syy") === 0,
          lit(null).cast(DoubleType))
          // |rho| ≤ 1 by Cauchy–Schwarz; the clamp only trims the 1-ulp
          // excess sqrt(x)·sqrt(x) can leave (identical on the oracle)
          .otherwise(least(greatest(col("__sxy").cast(DoubleType) /
            (sqrt(col("__sxx").cast(DoubleType)) *
              sqrt(col("__syy").cast(DoubleType))), lit(-1.0)), lit(1.0)))
          .as("spearman_rho"))
  }

  /** 2D skyline (Pareto frontier): rows not dominated by any other row,
    * where b dominates a iff b.x <= a.x AND b.y >= a.y with at least one
    * strict (x minimized, y maximized — negate a column to flip its
    * direction). Duplicate points on the frontier are all kept (neither
    * strictly dominates the other).
    *
    * Shape, NOT the textbook NOT-EXISTS self-join (quadratic): a 2D
    * skyline is a prefix-max sweep. (1) keyed agg: per distinct x the
    * max y (map-side partial — raw rows collapse here); (2) exclusive
    * running max of those group maxes in x order via the two-phase
    * [[globalCumSum]] device — range partition, one #partitions-row
    * driver collect for cross-partition offsets, partition-local
    * windows; (3) a frontier x survives iff its max-y strictly exceeds
    * every cheaper x's max-y; (4) one equi-join on (x, y) brings back
    * the original rows. No self-join, no single-partition window, no
    * stage touching more than the distinct-x aggregate. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // dominance is undefined for NULL coordinates (SQL's NOT-EXISTS
    // would vacuously keep them); exclude them instead of NPE-ing in
    // the driver-side offset collect. The y filter is on the CAST value,
    // so a non-numeric y (cast → null) is excluded too, not just SQL
    // NULLs (review finding).
    val clean = df.filter(col(xCol).isNotNull &&
      col(yCol).cast(LongType).isNotNull)
    val g = clean.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol).cast(LongType)).as("__gy"))
    val staged = g.repartitionByRange(col("__x"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val parts = staged.groupBy(col("__pid")).agg(max(col("__gy")).as("__m"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // exclusive prefix max across partitions (partition ids are dense in
    // range order; empty partitions simply don't appear)
    var acc = Long.MinValue
    val offsets = parts.map { case (p, m) =>
      val o = (p, acc); acc = math.max(acc, m); o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__prevmax")
    val w = Window.partitionBy(col("__pid")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val surv = staged.join(broadcast(offDf), Seq("__pid"))
      .withColumn("__cheaper",
        greatest(coalesce(max(col("__gy")).over(w), lit(Long.MinValue)),
          col("__prevmax")))
      .filter(col("__gy") > col("__cheaper"))
      .select(col("__x"), col("__gy"))
    clean.join(surv, col(xCol) === col("__x") &&
        col(yCol).cast(LongType) === col("__gy"))
      .drop("__x", "__gy")
  }

  /** Exact weighted percentiles — the smallest value whose cumulative
    * weight reaches ⌈p·W/1000⌉, for each requested permille: what
    * "median price weighted by quantity" actually means, computed
    * without expanding rows by weight.
    *
    * Weights are exact longs; the cumulative weight comes from
    * [[globalCumSum]] over the total (value, id) order; each requested
    * permille is one conditional min aggregate against its integer
    * threshold. No float boundary, no row explosion.
    *
    * 100 TB shape: one range exchange + partition-local windows
    * (globalCumSum), then a single aggregate; output is one row with a
    * column per permille. */
  def weightedPercentiles(df: DataFrame, valueCol: String, weightCol: String,
      idCol: String, permilles: Seq[Int] = Seq(250, 500, 750)): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 999),
      "weightedPercentiles: permilles must be in [1, 999]")
    val base = df.filter(col(valueCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0L)
      .select(col(valueCol).as("__v"), col(idCol).as("__id"),
        col(weightCol).cast(LongType).as("__w"))
    val cum = globalCumSum(base, Seq("__v", "__id"), "__w", "__cw")
    val tot = base.agg(sum(col("__w")).as("w_total"))
    val aggs = permilles.map { p =>
      min(when(col("__cw") >= expr(s"((w_total * $p) + 999) div 1000"),
        col("__v"))).as(s"p$p")
    }
    cum.crossJoin(broadcast(tot))
      .groupBy(col("w_total"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Deterministic approximate percentiles from a fixed-bin histogram
    * sketch — the partition-INVARIANT alternative to merge-order-sensitive
    * quantile summaries (Greenwald-Khanna / approx_percentile), built so
    * the output can be golden-pinned: bin counts are commutative integer
    * sums, so any partitioning, any merge order, any retry produces the
    * identical histogram and therefore the identical percentile estimate.
    *
    * Pass 1 computes (min, max, n); pass 2 bins every value into one of
    * `bins` equal-width buckets (a map-side projection + one count
    * aggregate whose output is ≤ `bins` rows regardless of data size);
    * the percentile for probability p is read off the cumulative
    * histogram with linear interpolation inside the hit bin. Absolute
    * error is bounded by one bin width, (max−min)/bins — 4096 bins keeps
    * it under 0.025 % of the value range, far inside any practical gate.
    *
    * 100 TB shape: two scans (the classic histogram trade for a hard
    * error bound), each collapsing map-side; the cumulative window runs
    * over the ≤`bins`-row histogram — sketch-sized, like the q176 rank
    * window over B resamples. Output: one row, `n` + one `ap<permille>`
    * column per requested probability. */
  def histogramPercentiles(df: DataFrame, valueCol: String,
      probs: Seq[Double] = Seq(0.5, 0.9, 0.99), bins: Int = 4096): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p < 1.0),
      "histogramPercentiles: probs must be in (0, 1)")
    require(bins >= 2 && bins <= (1 << 20),
      "histogramPercentiles: bins must be in [2, 2^20]")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast(DoubleType).as("__x"))
    val stats = base.agg(min(col("__x")).as("__mn"), max(col("__x")).as("__mx"),
      count(lit(1)).as("__n"))
    val hist = base.crossJoin(broadcast(stats))
      .withColumn("__i", when(col("__mx") === col("__mn"), lit(0))
        .otherwise(least(lit(bins - 1),
          floor((col("__x") - col("__mn")) / (col("__mx") - col("__mn")) *
            lit(bins.toDouble)).cast(IntegerType))))
      .groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    // ≤ `bins` rows: the unpartitioned window is sketch-sized by design.
    val wcum = Window.orderBy(col("__i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("__cum", sum(col("__c")).over(wcum))
      .withColumn("__cprev", col("__cum") - col("__c"))
      .crossJoin(broadcast(stats))
    // One conditional min-struct per probability: the first bin whose
    // cumulative count reaches rank ⌈p·n⌉ (struct compare is
    // lexicographic and __i is distinct, so min = lowest hit bin).
    val aggs = probs.zipWithIndex.map { case (p, j) =>
      min(when(col("__cum") >= ceil(lit(p) * col("__n")),
        struct(col("__i"), col("__cprev"), col("__c")))).as(s"__b$j")
    }
    val agged = cum.groupBy(col("__mn"), col("__mx"), col("__n"))
      .agg(aggs.head, aggs.tail: _*)
    val width = (col("__mx") - col("__mn")) / lit(bins.toDouble)
    val sels = probs.zipWithIndex.map { case (p, j) =>
      val r = ceil(lit(p) * col("__n")).cast(DoubleType)
      (col("__mn") + width * (col(s"__b$j").getField("__i") +
        (r - col(s"__b$j").getField("__cprev")) /
          col(s"__b$j").getField("__c"))).as(s"ap${math.round(p * 1000)}")
    }
    agged.select(col("__n").as("n") +: sels: _*)
  }

  /** Poisson-bootstrap 95% confidence interval for the mean — THE
    * distributed resampling method (multinomial resampling needs global
    * coordination; independent per-row Poisson(1) weights need none and
    * converge to the same bootstrap distribution): every (resample,
    * row) pair draws its weight from the cross-engine md5 hash pushed
    * through the integer-thresholded Poisson(1) CDF (thresholds are
    * round(CDF·10⁶) literals — no float compare anywhere), so the
    * "randomness" replays bit-for-bit on any engine, any partitioning,
    * any retry.
    *
    * Per-resample means are micro-quantized by integer floor division;
    * the CI bounds are exact order statistics of the B quantized means
    * (positions ⌈B·25/1000⌉ and B−lo+1 — integer arithmetic).
    *
    * 100 TB shape: the B-way fan-out collapses via partial aggregation
    * (each partition emits ≤ B partial sums, so the shuffle carries
    * B·partitions rows regardless of data size); the rank window runs
    * over B rows — dimension-sized, like the q158 day grid. Σw·v must
    * fit a long (~10⁹ rows at cents scale; lift to DECIMAL past that —
    * the q149 device). The Poisson tail is truncated at w = 5 (0.37%
    * of draws), a documented approximation of the weight distribution,
    * NOT a nondeterminism: the oracle replays it exactly. */
  def bootstrapMeanCI(df: DataFrame, valueCol: String, idCol: String,
      resamples: Int = 200, scale: Int = 100): DataFrame = {
    require(resamples >= 40 && resamples <= 10000,
      "bootstrapMeanCI: resamples must be in [40, 10000]")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(idCol).cast(StringType).as("__id"),
        round(col(valueCol) * lit(scale.toDouble)).cast(LongType).as("__vc"))
    val u = call_function("md5_lower64",
      concat(col("__b").cast(StringType), lit(":"), col("__id")))
      .bitwiseAND(lit(0x7FFFFFFFL)) % lit(1000000L)
    val w = when(u < 367879L, lit(0L)).when(u < 735759L, lit(1L))
      .when(u < 919699L, lit(2L)).when(u < 981012L, lit(3L))
      .when(u < 996340L, lit(4L)).otherwise(lit(5L))
    val res = base
      .withColumn("__b", explode(sequence(lit(0), lit(resamples - 1))))
      .withColumn("__w", w)
      .groupBy(col("__b"))
      .agg(sum(col("__w") * col("__vc")).as("__swv"), sum(col("__w")).as("__sw"))
      .filter(col("__sw") > 0L)
      .withColumn("__mc", expr("(__swv * 10000) div __sw"))
    val ranked = res.withColumn("__r",
      row_number().over(Window.orderBy(col("__mc"), col("__b"))).cast(LongType))
    val nb = res.agg(count(lit(1)).as("__nb"))
      .withColumn("__lo_pos", greatest(lit(1L), expr("(__nb * 25) div 1000")))
      .withColumn("__hi_pos", col("__nb") - col("__lo_pos") + 1L)
    val full = base.agg(count(lit(1)).as("n"), sum(col("__vc")).as("__sv"))
    val unitDiv = 1.0e4 * scale.toDouble
    ranked.crossJoin(broadcast(nb)).crossJoin(broadcast(full))
      .groupBy(col("n"), col("__nb"), col("__sv"))
      .agg(
        max(when(col("__r") === col("__lo_pos"), col("__mc"))).as("__lo_mc"),
        max(when(col("__r") === col("__hi_pos"), col("__mc"))).as("__hi_mc"))
      .select(col("n"), col("__nb").as("n_resamples"),
        (expr("(__sv * 10000) div n").cast(DoubleType) / lit(unitDiv)).as("mean"),
        (col("__lo_mc").cast(DoubleType) / lit(unitDiv)).as("lo95"),
        (col("__hi_mc").cast(DoubleType) / lit(unitDiv)).as("hi95"))
  }

  /** Rolling OLS slope per key — the windowed member of the trend
    * family ([[theilSen]] robust, q117 whole-series, [[ewmaDyadic]]
    * smoothing): slope of y on x over the last `windowRows` rows of
    * each key's series.
    *
    * x and y arrive as PRE-QUANTIZED longs (day index, cents — the
    * q156 convention), all five frame sums (n, Σx, Σy, Σxy, Σx²) ride
    * ONE key-partitioned sort with identical ROWS frames, and the
    * closed form (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is exact long arithmetic
    * until a single division. Magnitudes are FRAME-bounded
    * (w·max(x)·max(y) must fit a long) — independent of corpus size,
    * so the exactness argument survives any scale-up. Zero-variance
    * frames (n = 1, or all x equal) yield NULL.
    *
    * 100 TB shape: one hash exchange on the key, one in-partition
    * sort, five frame aggregates sharing it; output is row-per-input
    * (a per-row signal column, like q85's z-score). */
  def rollingSlope(df: DataFrame, keyCol: String, xCol: String, yCol: String,
      idCol: String, windowRows: Int = 5): DataFrame = {
    require(windowRows >= 2, "rollingSlope: windowRows must be >= 2")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(xCol), col(idCol))
      .rowsBetween(-(windowRows - 1), 0)
    val staged = df
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(col(xCol)).over(w))
      .withColumn("__sy", sum(col(yCol)).over(w))
      .withColumn("__sxy", sum(col(xCol) * col(yCol)).over(w))
      .withColumn("__sxx", sum(col(xCol) * col(xCol)).over(w))
    val num = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    staged
      .withColumn("n_window", col("__n"))
      .withColumn("slope",
        when(den === 0L, lit(null).cast(DoubleType))
          .otherwise(num.cast(DoubleType) / den.cast(DoubleType)))
      .drop("__n", "__sx", "__sy", "__sxy", "__sxx")
  }

  /** One-way ANOVA — F statistic and effect size η² of a numeric value
    * across groups: IS the grouping explaining variance, and how much?
    * (q152 answers two proportions, q151 two categoricals, this one
    * k means — and η² here is exactly what q166's R² reports for the
    * group-mean predictor.)
    *
    * Per-group n/Σv/Σv² are exact cents-quantized longs; each group's
    * between-term S²/n is ONE double chain milli-quantized to a long
    * before the k-row sum (order-free), and SSB/SSW/F/η² are single
    * fixed chains from those quantized pieces. Degenerate inputs
    * (k < 2, zero within-variance) yield NULL F.
    *
    * 100 TB shape: one keyed aggregate over the scan, then k-row work.
    * Σv² stays a long to ~10⁹ rows per group at cents scale — past
    * that, lift `q` to DECIMAL(38,0) (the q149 device). */
  def anovaOneWay(df: DataFrame, valueCol: String, groupCol: String,
      scale: Int = 100): DataFrame = {
    require(scale > 0, "anovaOneWay: scale must be > 0")
    val base = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        round(col(valueCol) * lit(scale.toDouble)).cast(LongType).as("__vq"))
    val g = base.groupBy(col("__g")).agg(count(lit(1)).as("__n"),
      sum(col("__vq")).as("__s"), sum(col("__vq") * col("__vq")).as("__q"))
    val termQ = round(col("__s").cast(DoubleType) * col("__s") / col("__n") *
      lit(1.0e3)).cast(LongType)
    val tot = g.agg(sum(col("__n")).as("__nn"), sum(col("__s")).as("__ss"),
      sum(col("__q")).as("__qq"), sum(termQ).as("__t"),
      count(lit(1)).as("k"))
    val gQ = round(col("__ss").cast(DoubleType) * col("__ss") / col("__nn") *
      lit(1.0e3)).cast(LongType)
    val unitDiv = 1.0e3 * scale.toDouble * scale.toDouble
    tot.withColumn("__gq", gQ)
      .withColumn("__ssb_q", col("__t") - col("__gq"))
      .withColumn("__ssw_q", col("__qq") * 1000L - col("__t"))
      .select(col("k"), col("__nn").as("n"),
        (col("__ssb_q").cast(DoubleType) / lit(unitDiv)).as("ssb"),
        (col("__ssw_q").cast(DoubleType) / lit(unitDiv)).as("ssw"),
        when(col("k") <= 1L || col("__ssw_q") <= 0L, lit(null).cast(DoubleType))
          .otherwise(((col("__nn") - col("k")).cast(DoubleType) *
            col("__ssb_q").cast(DoubleType)) /
            ((col("k") - 1L).cast(DoubleType) *
              col("__ssw_q").cast(DoubleType))).as("f_stat"),
        when(col("__qq") * 1000L - col("__gq") <= 0L,
          lit(null).cast(DoubleType))
          .otherwise(col("__ssb_q").cast(DoubleType) /
            (col("__qq") * 1000L - col("__gq")).cast(DoubleType)).as("eta2"))
  }

  /** Link prediction over an undirected graph — common-neighbor count,
    * Adamic–Adar, and neighborhood Jaccard for NON-edges, ranked by
    * Adamic–Adar (the recommendation/knowledge-graph completion
    * primitive on the same co-occurrence graphs pageRank/kCore/HITS
    * analyze).
    *
    * Candidate pairs come from 2-paths (x–z–y); hubs with degree >
    * `maxDegree` are excluded from the BRIDGE role z (the q24
    * stop-shingle discipline: a hub's Σdeg² pair fan-out is the whole
    * cost and its 1/ln(deg) contribution is the least informative —
    * documented truncation, endpoints keep their full degrees).
    * Adamic–Adar terms 1/ln(deg z) are nano-quantized before the keyed
    * sum (deg z ≥ 2 on any 2-path, so ln > 0); Jaccard is one division
    * of exact longs. Existing edges drop via one anti join.
    *
    * 100 TB shape: degree = one keyed count; pair-gen = one self equi
    * join on the bridge node with the hub cap bounding per-key fan-out;
    * scoring = keyed aggregates + degree joins; deterministic top-k via
    * TakeOrderedAndProject on (aa_q desc, x, y).
    *
    * The canonical edge list and the degree table are MATERIALIZED
    * (r9): `e` feeds five consumers (adj twice, the anti join, and
    * through adj the bridge self-join's both sides) and `deg` three
    * (bridge filter, degx, degy) — uncut, the caller's edge-generation
    * subplan (typically the corpus's most expensive join) re-evaluated
    * per consumer; measured 3× on q173 at sf1. The topK-row result is
    * checkpointed, so the returned plan drops every reference to the
    * edge-sized working-set RDDs and the ContextCleaner reclaims them at
    * the next GC — repeated calls cannot accumulate live caches. */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
      topK: Int = 20, maxDegree: Int = 100): DataFrame = {
    require(topK > 0 && maxDegree >= 2, "linkPrediction: bad topK/maxDegree")
    graft.functions.GraftFunctions.register(edges.sparkSession) // array_pairs
    // localCheckpoint (row-RDD storage) over persist: the wedge join
    // re-reads the edge table many times and the columnar cache's
    // encode/decode measured ~2x slower end-to-end on q173
    val e = edges.select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val adj = e.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v")))
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val bridge = adj.join(deg.filter(col("deg") <= maxDegree), "u")
    // Wedge generation as groupBy(hub) → ≤maxDegree neighbor list →
    // in-array pairs (r11; the capped nearDupPairsExact shape): the
    // previous bridge⋈bridge self-join sort-merged the 2|E| adjacency
    // twice to emit the same pairs — at sf3 (36M edges, 516M wedges)
    // that double sort OOM'd 32-task 8 GiB heaps, while the per-hub
    // list buffer is cap-bounded (≤100 longs) by construction. Pair set
    // identical: array_pairs on the sorted list ≡ the l.v < r.v join.
    val paths = bridge.groupBy(col("u"), col("deg"))
      .agg(sort_array(collect_list(col("v"))).as("vs"))
      .select(explode(expr("array_pairs(vs)")).as("p"), col("deg").as("degz"))
      .select(col("p.da").as("x"), col("p.db").as("y"), col("degz"))
    val scored = paths.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("cn"),
        sum(round(lit(1.0e9) / log(col("degz").cast(DoubleType)))
          .cast(LongType)).as("__aa_q"))
    val cand = scored.join(e.select(col("a").as("x"), col("b").as("y")),
      Seq("x", "y"), "left_anti")
    // Top-k FIRST (rank is by aa_q with (x,y) tie-break — independent of
    // the degrees), THEN the degx/degy lookups on just k rows: the two
    // degree joins would otherwise shuffle the full wedge-candidate set
    // twice purely to compute Jaccard values the top-k then discards.
    // TakeOrderedAndProject over cand; the k-row cut also drops every
    // reference to the edge-sized checkpoint RDDs so the ContextCleaner
    // reclaims them at the next GC (review finding).
    val top = cand.orderBy(col("__aa_q").desc, col("x"), col("y"))
      .limit(topK).localCheckpoint()
    broadcast(top)
      .join(deg.select(col("u").as("x"), col("deg").as("degx")), "x")
      .join(deg.select(col("u").as("y"), col("deg").as("degy")), "y")
      .orderBy(col("__aa_q").desc, col("x"), col("y"))
      .select(col("x"), col("y"), col("cn"),
        (col("__aa_q").cast(DoubleType) / lit(1.0e9)).as("adamic_adar"),
        (col("cn").cast(DoubleType) /
          (col("degx") + col("degy") - col("cn"))).as("jaccard"))
      .localCheckpoint()
  }

  /** Sorted-neighborhood candidate pairs — the OTHER classic
    * record-linkage blocking strategy (q78's equality blocks miss
    * near-misses that straddle a block boundary; a sort key brings
    * lexicographic neighbors together regardless): rank every row by
    * the sort key via [[globalRank]], then pair each row with the
    * `windowSize − 1` rows after it in sort order.
    *
    * Pair generation is an EQUI join on the rank (each row explodes to
    * w−1 probe ranks) — exact across partition boundaries, unlike a
    * per-partition lead(), and co-partitioned by the unique integer
    * rank so no key ever hot-spots. Output: (id_a, id_b, key_a, key_b).
    *
    * 100 TB shape: one range exchange (globalRank), a w−1 fan-out
    * projection, one integer equi join. Total pairs = N·(w−1) by
    * construction — the window bounds the quadratic, the caller picks
    * the similarity verify (levenshtein, jaccard, …) to run on the
    * linear-sized candidate set. */
  def sortedNeighborhoodPairs(df: DataFrame, sortCol: String, idCol: String,
      windowSize: Int = 5): DataFrame = {
    require(windowSize >= 2, "sortedNeighborhoodPairs: windowSize must be >= 2")
    val base = df.select(col(sortCol).as("__k"), col(idCol).as("__id"))
    val ranked = globalRank(base, Seq("__k", "__id"), "__r")
    val probes = ranked
      .withColumn("__o", explode(array((1 until windowSize).map(lit): _*)))
      .select(col("__id").as("id_a"), col("__k").as("key_a"),
        (col("__r") + col("__o")).as("__r"))
    probes.join(ranked.select(col("__id").as("id_b"), col("__k").as("key_b"),
        col("__r")), "__r")
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"))
  }

  /** Exact equi-depth histogram — `buckets` order-statistic buckets of
    * (count, lo, hi) per bucket: the value-distribution companion to
    * the equi-width [[histogram]] (equi-width shows shape, equi-depth
    * shows quantile boundaries — what a range-partitioner or zone-map
    * layout planner actually needs).
    *
    * Bucket of the row at global rank r (1-based) of N is
    * (r−1)·buckets div N — pure integer arithmetic. Ties straddling a
    * boundary cannot perturb the output: bucket COUNTS are fixed by
    * rank arithmetic, and the straddling VALUE is both buckets' shared
    * endpoint whichever copies land where. Output doubles are input
    * values only.
    *
    * 100 TB shape: [[globalRank]]'s range exchange + one keyed
    * aggregate + a 1-row N broadcast; `buckets` rows out. */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets > 0, "equiDepthHistogram: buckets must be > 0")
    val base = df.filter(col(valueCol).isNotNull).select(col(valueCol).as("__v"))
    val ranked = globalRank(base, Seq("__v"), "__r")
    val n = base.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bucket", expr(s"((__r - 1) * $buckets) div __n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"))
  }

  // --------------------------------------------- data-quality / profiling

  /** Column profile — per column: null count, exact distinct count, and
    * min/max (stringified AFTER the typed aggregate, so ordering is the
    * column's own, not lexicographic). The first look a pipeline takes
    * at an unfamiliar table.
    *
    * 100 TB shape: nulls and min/max come from ONE 1-row aggregate pass.
    * Exact distincts deliberately avoid Spark's multi-distinct rewrite
    * (an Expand plus a #cols-buffer distinct aggregate — measured ~6×
    * slower here): the frame is melted to narrow (col_name, value)
    * pairs by a stack projection and counted through one ordinary
    * partial+final aggregate — the same #cols row fan-out, but a
    * 2-column shuffle of pre-deduped pairs and trivial codegen. Distinct
    * counting happens on the value's string form (injective for the
    * scalar types a profile walks); at extreme widths swap in
    * `approx_count_distinct` (the q41 HLL device). Pass doubles pre-cast
    * to DECIMAL if their min/max must render engine-portably
    * (Double.toString uses scientific notation where SQL engines do
    * not). */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns: need at least one column")
    val aggs = cols.flatMap(c => Seq(
      (count(lit(1)) - count(col(c))).as(s"__nn_$c"),
      min(col(c)).cast(StringType).as(s"__mn_$c"),
      max(col(c)).cast(StringType).as(s"__mx_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val statsStack = s"stack(${cols.size}, " + cols.map(c =>
      s"'$c', `__nn_$c`, `__mn_$c`, `__mx_$c`").mkString(", ") +
      ") as (col_name, n_nulls, min_value, max_value)"
    val stats = one.select(expr(statsStack))
    val meltStack = s"stack(${cols.size}, " + cols.map(c =>
      s"'$c', CAST(`$c` AS STRING)").mkString(", ") + ") as (col_name, __v)"
    val nd = df.select(expr(meltStack))
      .groupBy(col("col_name"), col("__v")).agg(count(lit(1)).as("__c"))
      .groupBy(col("col_name"))
      .agg(sum(when(col("__v").isNotNull, lit(1L)).otherwise(lit(0L)))
        .as("n_distinct"))
    stats.join(nd, "col_name")
      .select(col("col_name"), col("n_nulls"), col("n_distinct"),
        col("min_value"), col("max_value"))
  }

  /** Duplicate-key audit: one row `(rule, n_bad)` where n_bad counts the
    * EXTRA rows beyond one per key (0 = the key is unique). One keyed
    * count aggregate; nothing else moves. */
  def uniqueViolations(df: DataFrame, keyCols: Seq[String],
      rule: String = "pk_duplicates"): DataFrame = {
    require(keyCols.nonEmpty, "uniqueViolations: need key columns")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("n_bad"))
      .select(lit(rule).as("rule"), col("n_bad"))
  }

  /** Referential-integrity audit: `(rule, n_bad)` = child rows whose key
    * has no parent (NULL child keys are not orphans — SQL FK semantics).
    * One anti join on the key — co-partitioned shuffle at scale, or a
    * broadcast when the parent key set fits. */
  def fkViolations(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, rule: String = "fk_orphans"): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_bad"))
      .select(lit(rule).as("rule"), col("n_bad"))

  /** Domain audit: `(rule, n_bad)` = non-NULL values outside the allowed
    * set. A pure filter + count — map-side only until the 1-row agg. */
  def domainViolations(df: DataFrame, c: String, allowed: Seq[String],
      rule: String = "domain"): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(allowed: _*))
      .agg(count(lit(1)).as("n_bad"))
      .select(lit(rule).as("rule"), col("n_bad"))

  /** Range audit: `(rule, n_bad)` = non-NULL values outside [lo, hi]. */
  def rangeViolations(df: DataFrame, c: String, lo: Long, hi: Long,
      rule: String = "range"): DataFrame =
    df.filter(col(c).isNotNull && (col(c) < lo || col(c) > hi))
      .agg(count(lit(1)).as("n_bad"))
      .select(lit(rule).as("rule"), col("n_bad"))

  /** Functional-dependency audit — for each candidate A→B, does every A
    * value map to exactly one B? Holds iff |distinct A| = |distinct
    * (A,B)| (the count-based FD test data-profiling systems like
    * Metanome/TANE use as their pruning core); `violations` = the number
    * of extra (A,B) combinations beyond one-per-A — 0 exactly when the
    * FD holds. Null-containing rows are excluded up front so both
    * engines count the same universe (SQL DISTINCT and multi-column
    * count_distinct disagree on null rows otherwise).
    *
    * 100 TB shape: each candidate is one two-column distinct aggregate —
    * partial-agg'd, one shuffle on (A,B) — fully independent of the
    * others (they union, nothing joins). Discovery over all column
    * pairs is #pairs such aggregates; prune with [[profileColumns]]
    * cardinalities first (|distinct A| = |rows| ⇒ A→anything trivially). */
  def fdAudit(df: DataFrame, tableName: String,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "fdAudit: need at least one candidate pair")
    pairs.map { case (lhs, rhs) =>
      df.filter(col(lhs).isNotNull && col(rhs).isNotNull)
        .agg(count_distinct(col(lhs)).as("n_lhs"),
          count_distinct(col(lhs), col(rhs)).as("n_pair"))
        .select(lit(s"$tableName.$lhs->$rhs").as("fd"),
          col("n_lhs"), col("n_pair"),
          (col("n_pair") - col("n_lhs")).as("violations"),
          (col("n_pair") === col("n_lhs")).as("holds"))
    }.reduce(_ unionAll _)
  }

  /** Benford first-digit audit — compare the leading-significant-digit
    * distribution of a money-like column against Benford's law (the
    * synthetic-data / fraud / unit-mixup smell test). Values are
    * cents-quantized; the leading digit comes from the INTEGER's string
    * form (a ×100 shift never changes the leading significant digit),
    * so no log10-at-a-power-boundary float hazard exists. The expected
    * frequency ln(1+1/d)/ln(10) is the identical double chain in both
    * engines.
    *
    * 100 TB shape: one digit-keyed count aggregate + a 1-row total
    * broadcast; 9 output rows. */
  def benfordAudit(df: DataFrame, valueCol: String,
      scale: Int = 100): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(abs(round(col(valueCol) * lit(scale.toDouble)).cast(LongType))
        .as("__vc"))
      .filter(col("__vc") > 0L)
      .select(substring(col("__vc").cast(StringType), 1, 1).as("digit"))
    val counts = base.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = base.agg(count(lit(1)).as("__t"))
    counts.crossJoin(broadcast(total))
      .withColumn("frac", col("n").cast(DoubleType) / col("__t"))
      .withColumn("expected",
        log(lit(1.0) + lit(1.0) / col("digit").cast(LongType)) /
          log(lit(10.0)))
      .select(col("digit"), col("n"), col("frac"), col("expected"),
        abs(col("frac") - col("expected")).as("abs_dev"))
  }

  // --------------------------------------------- evaluation metrics

  /** Exact ROC AUC via the Mann–Whitney rank-sum statistic — the
    * model-evaluation primitive for the quality/toxicity/langid
    * classifiers that gate corpus curation: does the score actually
    * order positives above negatives?
    *
    * Tie handling is the textbook average-rank convention, computed
    * WITHOUT any float ranks: rows are ranked by [[globalRank]] (ties
    * broken arbitrarily — per-score-group MIN(rank) and counts are
    * order-independent, so the result is engine-exact), and each score
    * group contributes n_pos·(2·min_rank + n − 1) to twice the positive
    * rank sum (2·avg_rank = 2·min_rank + n − 1). AUC = U / (n_pos·n_neg)
    * with U = Σ_pos avg_rank − n_pos(n_pos+1)/2 — everything stays an
    * exact DECIMAL(38,0) integer until the single final double division.
    *
    * 100 TB shape: one range exchange (globalRank's two-phase parallel
    * ranking — never a one-partition ORDER BY window), one keyed
    * aggregate on the score, one 1-row final aggregate. The rank sum
    * reaches ~n_pos·2N, so the DECIMAL(38,0) accumulator holds far past
    * any real corpus (overflows only past ~10^19 rows). */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).as("__s"), col(labelCol).cast(LongType).as("__y"))
    val ranked = globalRank(base, Seq("__s"), "__r")
    val grouped = ranked.groupBy(col("__s")).agg(
      min(col("__r")).as("__minr"), count(lit(1)).as("__n"),
      sum(col("__y")).as("__np"))
    grouped.agg(
        sum(col("__np").cast(dec) *
          (lit(2L) * col("__minr") + col("__n") - lit(1L)).cast(dec)).as("__s2"),
        sum(col("__np")).as("n_pos"),
        sum(col("__n") - col("__np")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        (col("__s2") - col("n_pos").cast(dec) *
          (col("n_pos") + lit(1L)).cast(dec)).cast(LongType).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          lit(null).cast(DoubleType))
          .otherwise(col("u2").cast(DoubleType) /
            (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"))
  }

  /** DeLong AUC confidence interval (DeLong et al. 1988, midrank form
    * of Sun & Xu 2014) — the error bar [[auc]] ships without: Var(AUC)
    * = S10/m + S01/n from the per-positive/per-negative placement
    * statistics. An AUC of 0.61 ± 0.01 and one of 0.61 ± 0.20 are
    * different business facts; this is the gate that tells a model
    * comparison from coin-flip noise.
    *
    * Nothing ranks raw rows: placements are determined by the VALUE
    * alone (doubled-midrank device), so V10/V01 come from one
    * value-keyed aggregate + two [[globalCumSum]] passes, with exact
    * Decimal(38) moments (integer placement scale 2n / 2m — bound:
    * m·(2n)² ≤ 10³⁸ holds past 10⁹ rows per class). The variance
    * DENOMINATOR (≈ 4m³n², past Decimal(38) at m≈n≈3×10⁷) and the
    * final division/sqrt chain are double. Degenerate classes
    * (m < 2 or n < 2) yield NULL se/CI instead of a zero-division. */
  def aucDeLong(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val base = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).as("__s"), col(labelCol).cast(LongType).as("__y"))
    val grouped = base.groupBy(col("__s"))
      .agg(count(lit(1)).as("cnt"), sum(col("__y")).as("np"))
    val cums = globalCumSum(globalCumSum(grouped, Seq("__s"), "cnt", "cumAll"),
        Seq("__s"), "np", "cumPos")
      .localCheckpoint() // feeds totals AND the placement scan
    val tot = cums.agg(sum(col("np")).as("m"),
      sum(col("cnt") - col("np")).as("n"))
    val cbAll = col("cumAll") - col("cnt")
    val cbPos = col("cumPos") - col("np")
    val cbNeg = (col("cumAll") - col("cumPos")) - (col("cnt") - col("np"))
    val v10 = lit(2L) * (cbAll - cbPos) + (col("cnt") - col("np"))
    val w01 = lit(2L) * col("m") -
      (lit(2L) * (cbAll - cbNeg) + col("np"))
    val mom = cums.crossJoin(broadcast(tot))
      .agg(sum(col("np").cast(D) * v10.cast(D)).as("s1"),
        sum(col("np").cast(D) * v10.cast(D) * v10.cast(D)).as("sqq"),
        sum((col("cnt") - col("np")).cast(D) * w01.cast(D)).as("t1"),
        sum((col("cnt") - col("np")).cast(D) * w01.cast(D) * w01.cast(D))
          .as("tqq"))
    val m = col("m")
    val n = col("n")
    val aucRaw = col("s1").cast(DoubleType) /
      (lit(2L).cast(D) * m.cast(D) * n.cast(D)).cast(DoubleType)
    // Numerators stay exact Decimal(38) (m·sqq ≈ 4m²n² ≤ 10³⁸ holds to
    // ~10⁹ rows per class); the DENOMINATOR m·(m−1)·4·n²·m ≈ 4m³n² would
    // overflow Decimal(38,0) near m≈n≈3×10⁷ (silently nulling se/CI on
    // non-ANSI Spark), so it is built as a double product — the quotient
    // is double anyway, and each factor is exact in double to 2⁵³.
    val varRaw =
      (m.cast(D) * col("sqq") - col("s1") * col("s1")).cast(DoubleType) /
        (m.cast(DoubleType) * (m - lit(1L)).cast(DoubleType) * lit(4.0) *
          n.cast(DoubleType) * n.cast(DoubleType) * m.cast(DoubleType)) +
      (n.cast(D) * col("tqq") - col("t1") * col("t1")).cast(DoubleType) /
        (n.cast(DoubleType) * (n - lit(1L)).cast(DoubleType) * lit(4.0) *
          m.cast(DoubleType) * m.cast(DoubleType) * n.cast(DoubleType))
    mom.crossJoin(broadcast(tot))
      .select(m.as("n_pos"), n.as("n_neg"),
        round(aucRaw, 9).as("auc"),
        when(m > 1L && n > 1L, round(sqrt(varRaw), 9))
          .otherwise(lit(null).cast(DoubleType)).as("se"),
        when(m > 1L && n > 1L,
          round(aucRaw - lit(1.96) * sqrt(varRaw), 6))
          .otherwise(lit(null).cast(DoubleType)).as("ci_lo"),
        when(m > 1L && n > 1L,
          round(aucRaw + lit(1.96) * sqrt(varRaw), 6))
          .otherwise(lit(null).cast(DoubleType)).as("ci_hi"))
  }

  /** Mutual information (nats) between two categorical columns, plus the
    * marginal entropies and the normalized MI (mi / √(hx·hy)) — the
    * feature-relevance / redundancy measure next to [[chiSquareDrift]]'s
    * significance test on the same contingency shape.
    *
    * Cross-engine exactness: every per-cell term (c_xy/N)·ln(N·c_xy /
    * (c_x·c_y)) is nano-quantized to a long BEFORE the sum (the q128 /
    * q137 ln policy), so the only order-sensitive op is an exact integer
    * sum; mi/hx/hy are one division each, nmi one fixed
    * division-by-sqrt-product chain (the q-longs are promoted to double
    * first — their product can exceed a long).
    *
    * 100 TB shape: the raw data is scanned ONCE — the (x, y) contingency
    * aggregate — and the marginals and N are re-aggregated from the
    * dimension-sized cells table (|X|·|Y| rows), so everything after the
    * first keyed aggregate is independent of corpus size; N rides as a
    * 1-row broadcast. */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("__x"), col(yCol).as("__y"))
    val cxy = base.groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("__cxy"))
    val cx = cxy.groupBy(col("__x")).agg(sum(col("__cxy")).as("__cx"))
    val cy = cxy.groupBy(col("__y")).agg(sum(col("__cxy")).as("__cy"))
    val n = cxy.agg(sum(col("__cxy")).as("__n"))
    val miTerm = round(
      (col("__cxy").cast(DoubleType) / col("__n")) *
        log((col("__n").cast(DoubleType) * col("__cxy")) /
          (col("__cx").cast(DoubleType) * col("__cy"))) * lit(1.0e9))
      .cast(LongType)
    val mi = cxy.join(cx, "__x").join(cy, "__y").crossJoin(broadcast(n))
      .agg(sum(miTerm).as("__mi_q"), count(lit(1)).as("n_cells"))
    def entropyQ(cdf: DataFrame, c: String, out: String): DataFrame =
      cdf.crossJoin(broadcast(n)).agg(sum(round(
        (col(c).cast(DoubleType) / col("__n")) *
          log(col("__n").cast(DoubleType) / col(c)) * lit(1.0e9))
        .cast(LongType)).as(out))
    mi.crossJoin(broadcast(entropyQ(cx, "__cx", "__hx_q")))
      .crossJoin(broadcast(entropyQ(cy, "__cy", "__hy_q")))
      .crossJoin(broadcast(n))
      .select(col("__n").as("n"), col("n_cells"),
        (col("__mi_q").cast(DoubleType) / lit(1.0e9)).as("mi"),
        (col("__hx_q").cast(DoubleType) / lit(1.0e9)).as("hx"),
        (col("__hy_q").cast(DoubleType) / lit(1.0e9)).as("hy"),
        when(col("__hx_q") <= 0L || col("__hy_q") <= 0L,
          lit(null).cast(DoubleType))
          .otherwise(col("__mi_q").cast(DoubleType) /
            sqrt(col("__hx_q").cast(DoubleType) *
              col("__hy_q").cast(DoubleType))).as("nmi"))
  }

  /** Calibration / reliability bins — does a score behave like a
    * probability? Scores are quantized to exact integer units
    * (`round(score·scale)`, the money-cents policy), min–max normalized,
    * and cut into `bins` equal-width bins by PURE INTEGER arithmetic
    * (width = range div bins + 1 — no float boundary can tie-diverge);
    * each bin reports its observed positive rate next to its mean
    * normalized score and the |gap| between them (the per-bin ECE term).
    *
    * 100 TB shape: one 1-row min/max aggregate broadcast back, one keyed
    * aggregate on the bin id; sums stay exact longs until the two final
    * divisions per bin. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10, scale: Int = 100): DataFrame = {
    require(bins > 0 && scale > 0, "calibrationBins: bins and scale must be > 0")
    val base = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(round(col(scoreCol) * lit(scale.toDouble)).cast(LongType).as("__vc"),
        col(labelCol).cast(LongType).as("__y"))
    val mm = base.agg(min(col("__vc")).as("__minc"), max(col("__vc")).as("__maxc"))
    base.crossJoin(broadcast(mm))
      .withColumn("bin",
        expr(s"(__vc - __minc) div ((__maxc - __minc) div $bins + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        sum(col("__vc")).as("__sv"))
      .crossJoin(broadcast(mm))
      .select(col("bin"), col("n"), col("n_pos"),
        when(col("__maxc") === col("__minc"), lit(null).cast(DoubleType))
          .otherwise((col("__sv") - col("n") * col("__minc")).cast(DoubleType) /
            (col("n").cast(DoubleType) * (col("__maxc") - col("__minc"))))
          .as("mean_norm"),
        (col("n_pos").cast(DoubleType) / col("n")).as("frac_pos"))
      .withColumn("gap",
        when(col("mean_norm").isNull, lit(null).cast(DoubleType))
          .otherwise(abs(col("frac_pos") - col("mean_norm"))))
  }

  /** Murphy decomposition of the Brier score (q232) — calibration's
    * (q162) quantitative upgrade: BS = REL − RES + UNC, where
    * reliability REL = Σ n_k(p_k − ō_k)²/N is HOW MISCALIBRATED the
    * forecasts are (0 = perfect), resolution RES = Σ n_k(ō_k − ō)²/N is
    * how much they actually DISCRIMINATE (bigger = better), and
    * uncertainty UNC = ō(1−ō) is the base-rate floor no forecaster can
    * beat. A model can ace q162's per-bin gaps and still be useless
    * (RES ≈ 0); this one row says which.
    *
    * Grouping is by the EXACT quantized forecast value (round(p·scale)
    * — Murphy's identity holds exactly for value-grouping, only
    * approximately for range-binning), so the cell table is bounded by
    * scale+1 regardless of row count.
    *
    * Exactness: everything reduces over the (forecast, outcome)
    * contingency cells; each cell's n·(…)² term is a fixed double chain
    * over exact integers, nano-quantized before the order-free long
    * sum; the direct Brier sum uses the same device, so both engines
    * agree bit-for-bit (BS and REL−RES+UNC then differ only by
    * quantization residue — reported, not hidden).
    *
    * 100 TB shape: ONE keyed aggregate to ≤ 2·(scale+1) cells, then
    * cell-table arithmetic + two 1-row broadcasts. */
  def brierDecomposition(df: DataFrame, probCol: String, labelCol: String,
      scale: Int = 10000): DataFrame = {
    require(scale > 0, s"brierDecomposition needs scale > 0, got $scale")
    val Q = 1.0e9
    val cells = df.filter(col(probCol).isNotNull && col(labelCol).isNotNull)
      .select(round(col(probCol) * lit(scale.toDouble)).cast(LongType)
        .as("__pq"), col(labelCol).cast(LongType).as("__y"))
      .groupBy(col("__pq"), col("__y")).agg(count(lit(1)).as("__m"))
      .localCheckpoint() // ≤ 2(scale+1) rows; feeds 3 reductions
    val tot = cells.agg(sum(col("__m")).as("__n"),
      sum(col("__y") * col("__m")).as("__s"))
    val pk = col("__pq").cast(DoubleType) / lit(scale.toDouble)
    val obar = col("__s").cast(DoubleType) / col("__n").cast(DoubleType)
    // direct Brier: Σ m·(p − y)² over contingency cells
    val bs = cells
      .select(round(col("__m").cast(DoubleType) *
        (pk - col("__y").cast(DoubleType)) *
        (pk - col("__y").cast(DoubleType)) * lit(Q))
        .cast(LongType).as("__b"))
      .agg(sum(col("__b")).as("__bq"))
    // per-forecast cells for REL/RES
    val fc = cells.groupBy(col("__pq"))
      .agg(sum(col("__m")).as("__nk"),
        sum(col("__y") * col("__m")).as("__sk"))
    val ok = col("__sk").cast(DoubleType) / col("__nk").cast(DoubleType)
    val rr = fc.crossJoin(broadcast(tot))
      .select(
        round(col("__nk").cast(DoubleType) * (pk - ok) * (pk - ok) * lit(Q))
          .cast(LongType).as("__r"),
        round(col("__nk").cast(DoubleType) * (ok - obar) * (ok - obar) *
          lit(Q)).cast(LongType).as("__g"))
      .agg(count(lit(1)).as("n_cells"), sum(col("__r")).as("__rq"),
        sum(col("__g")).as("__gq"))
    tot.crossJoin(broadcast(bs)).crossJoin(broadcast(rr))
      .select(col("__n").as("n"), col("n_cells"),
        (col("__bq").cast(DoubleType) / lit(Q) / col("__n").cast(DoubleType))
          .as("brier"),
        (col("__rq").cast(DoubleType) / lit(Q) / col("__n").cast(DoubleType))
          .as("reliability"),
        (col("__gq").cast(DoubleType) / lit(Q) / col("__n").cast(DoubleType))
          .as("resolution"),
        (obar * (lit(1.0) - obar)).as("uncertainty"))
  }

  /** Per-class confusion statistics — tp/fp/fn, precision, recall, F1
    * for every label observed as actual OR predicted (a class the model
    * never predicts still reports recall 0, and a hallucinated class
    * reports precision 0 instead of vanishing).
    *
    * F1 is computed as 2·tp / (2·tp + fp + fn) — a SINGLE division of
    * exact longs (algebraically identical to the harmonic mean of the
    * precision/recall divisions, without chaining three engine-rounded
    * doubles). Denominator-zero cases report NULL.
    *
    * 100 TB shape: one (actual, predicted) contingency aggregate over
    * the data; row/column marginals and the diagonal re-aggregate from
    * the |classes|²-bounded cells table, joined per class — everything
    * after the first aggregate is dimension-sized. */
  def confusionStats(df: DataFrame, actualCol: String, predCol: String): DataFrame = {
    val base = df.filter(col(actualCol).isNotNull && col(predCol).isNotNull)
      .select(col(actualCol).as("__a"), col(predCol).as("__p"))
    val c = base.groupBy(col("__a"), col("__p")).agg(count(lit(1)).as("__c"))
    val rs = c.groupBy(col("__a").as("label")).agg(sum(col("__c")).as("__na"))
    val cs = c.groupBy(col("__p").as("label")).agg(sum(col("__c")).as("__np"))
    val diag = c.filter(col("__a") === col("__p"))
      .select(col("__a").as("label"), col("__c").as("__tp"))
    rs.join(cs, Seq("label"), "full_outer")
      .join(diag, Seq("label"), "left_outer")
      .select(col("label"),
        coalesce(col("__na"), lit(0L)).as("n_actual"),
        coalesce(col("__np"), lit(0L)).as("n_pred"),
        coalesce(col("__tp"), lit(0L)).as("tp"))
      .withColumn("fp", col("n_pred") - col("tp"))
      .withColumn("fn", col("n_actual") - col("tp"))
      .withColumn("precision",
        when(col("n_pred") === 0L, lit(null).cast(DoubleType))
          .otherwise(col("tp").cast(DoubleType) / col("n_pred")))
      .withColumn("recall",
        when(col("n_actual") === 0L, lit(null).cast(DoubleType))
          .otherwise(col("tp").cast(DoubleType) / col("n_actual")))
      .withColumn("f1",
        when(lit(2L) * col("tp") + col("fp") + col("fn") === 0L,
          lit(null).cast(DoubleType))
          .otherwise((lit(2L) * col("tp")).cast(DoubleType) /
            (lit(2L) * col("tp") + col("fp") + col("fn"))))
  }

  /** Cohen's kappa — chance-corrected agreement between two label
    * columns (annotator vs annotator, or model vs gold): the
    * acceptance gate for weak/synthetic labels before they train a
    * curation classifier.
    *
    * Fully exact: κ = (N·D − E) / (N² − E) with D = Σ diagonal counts
    * and E = Σ_label rowsum·colsum — the cross-multiplied form of
    * (p_o − p_e)/(1 − p_e) — held in DECIMAL(38,0) until each of the
    * three output divisions (p_o, p_e, κ), so no engine rounding ever
    * compounds. Degenerate total agreement-by-chance (N² = E) → NULL.
    *
    * 100 TB shape: identical to [[confusionStats]] — one contingency
    * aggregate, then |classes|-sized joins and 1-row aggregates. */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("__a"), col(bCol).as("__b"))
    val c = base.groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__c"))
    val n = c.agg(sum(col("__c")).as("__n"))
    val d = c.filter(col("__a") === col("__b"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("__d"))
    val rs = c.groupBy(col("__a").as("l")).agg(sum(col("__c")).as("__rs"))
    val cs = c.groupBy(col("__b").as("l")).agg(sum(col("__c")).as("__cs"))
    val e = rs.join(cs, "l")
      .agg(coalesce(sum(col("__rs").cast(dec) * col("__cs").cast(dec)),
        lit(0L).cast(dec)).as("__e"))
    n.crossJoin(broadcast(d)).crossJoin(broadcast(e))
      .select(col("__n").as("n"),
        (col("__d").cast(DoubleType) / col("__n")).as("po"),
        (col("__e").cast(DoubleType) /
          (col("__n").cast(DoubleType) * col("__n"))).as("pe"),
        when(col("__n").cast(dec) * col("__n").cast(dec) === col("__e"),
          lit(null).cast(DoubleType))
          .otherwise((col("__n").cast(dec) * col("__d").cast(dec) - col("__e"))
            .cast(DoubleType) /
            (col("__n").cast(dec) * col("__n").cast(dec) - col("__e"))
              .cast(DoubleType)).as("kappa"))
  }

  /** Regression metrics — MAE, RMSE, R² of a prediction column against
    * an actual column, in ONE pass. Both columns are quantized to exact
    * micro-units (`round(x·microScale)` longs), residual sums and
    * squares accumulate in DECIMAL(38,0), and R² uses the
    * cross-multiplied identity (n·Q − S² − n·SSE)/(n·Q − S²) (Q = Σa²,
    * S = Σa) so each output is one fixed division chain — no
    * engine-rounded intermediate ever enters another sum.
    *
    * 100 TB shape: a single 1-row aggregate over the scan; nothing else
    * moves. Constant actuals (zero variance, R² undefined) → NULL. */
  def regressionMetrics(df: DataFrame, actualCol: String, predCol: String,
      microScale: Long = 1000000L): DataFrame = {
    require(microScale > 0, "regressionMetrics: microScale must be > 0")
    val dec = DecimalType(38, 0)
    val base = df.filter(col(actualCol).isNotNull && col(predCol).isNotNull)
      .select(round(col(actualCol) * lit(microScale.toDouble)).cast(LongType).as("__aq"),
        round(col(predCol) * lit(microScale.toDouble)).cast(LongType).as("__pq"))
      .withColumn("__d", col("__aq") - col("__pq"))
    val g = base.agg(count(lit(1)).as("n"),
      sum(col("__aq").cast(dec)).as("__s"),
      sum(col("__aq").cast(dec) * col("__aq")).as("__q"),
      sum(abs(col("__d")).cast(dec)).as("__sad"),
      sum(col("__d").cast(dec) * col("__d")).as("__sse"))
    val ms = microScale.toDouble
    val nSst = col("n").cast(dec) * col("__q") - col("__s") * col("__s")
    g.select(col("n"),
      (col("__sad").cast(DoubleType) / (lit(ms) * col("n"))).as("mae"),
      sqrt(col("__sse").cast(DoubleType) / (lit(ms) * ms * col("n"))).as("rmse"),
      when(nSst === lit(0L).cast(dec), lit(null).cast(DoubleType))
        .otherwise((nSst - col("n").cast(dec) * col("__sse")).cast(DoubleType) /
          nSst.cast(DoubleType)).as("r2"))
  }

  /** Average precision at k per query group — the binary-relevance
    * companion to [[ndcgAtK]] (MAP's per-query table): AP@k = mean over
    * the relevant items in the top k of precision-at-their-rank,
    * normalized by min(R, k).
    *
    * Each precision term prefix/pos is nano-quantized to a long before
    * the per-group sum (one engine-identical double division per
    * relevant position, then exact integers); ap is one final division.
    * Groups with no relevant items report NULL.
    *
    * 100 TB shape: rank and running-relevance ride ONE group-partitioned
    * window (a single hash exchange), then a keyed aggregate; per-group
    * cost is docs-per-query. */
  def averagePrecisionAtK(df: DataFrame, groupCol: String, scoreCol: String,
      tieCol: String, relCol: String, k: Int = 10): DataFrame = {
    require(k > 0, "averagePrecisionAtK: k must be > 0")
    val base = df.select(col(groupCol), col(scoreCol), col(tieCol),
      (col(relCol).cast(LongType) > 0L).cast(LongType).as("__rel"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(tieCol))
    val ranked = base
      .withColumn("__pos", row_number().over(w).cast(LongType))
      .withColumn("__prefix",
        sum(col("__rel")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val termQ = round(
      (col("__prefix").cast(DoubleType) / col("__pos")) * lit(1.0e9))
      .cast(LongType)
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__rel")).as("n_rel"),
        sum(when(col("__rel") === 1L && col("__pos") <= k, lit(1L))
          .otherwise(lit(0L))).as("n_rel_topk"),
        sum(when(col("__rel") === 1L && col("__pos") <= k, termQ)
          .otherwise(lit(0L))).as("__sp_q"))
      .select(col(groupCol), col("n_docs"), col("n_rel"), col("n_rel_topk"),
        when(least(col("n_rel"), lit(k.toLong)) === 0L,
          lit(null).cast(DoubleType))
          .otherwise(col("__sp_q").cast(DoubleType) /
            (lit(1.0e9) * least(col("n_rel"), lit(k.toLong)))).as("ap"))
  }

  /** NDCG@k per query group — the graded-relevance retrieval metric that
    * completes the BM25 → ANN → RRF retrieval stack with an evaluation
    * gate: how close is a ranking to its ideal reordering?
    *
    * `scoreCol` descending (ties broken by `tieCol`) defines the system
    * ranking; the ideal ranking reorders by relevance. Gains are exact
    * longs (2^rel − 1); each position's gain/log2(pos+1) term is
    * nano-quantized BEFORE the per-group sum (the ln policy — log2 is
    * spelled ln(x)/ln(2) so both engines build the identical double
    * chain), and ndcg = dcg_q/idcg_q is one final division. Groups whose
    * top-k relevance is all zero report NULL (no ideal to compare to).
    *
    * 100 TB shape: both rank windows partition on the query group — ONE
    * hash exchange, two in-partition sorts, then a keyed aggregate.
    * Per-group work is bounded by docs-per-query, never corpus size. */
  def ndcgAtK(df: DataFrame, groupCol: String, scoreCol: String,
      tieCol: String, relCol: String, k: Int = 10): DataFrame = {
    require(k > 0, "ndcgAtK: k must be > 0")
    val base = df.select(col(groupCol), col(scoreCol), col(tieCol),
      least(lit(62L), col(relCol).cast(LongType)).as("__rel"))
    val byGroup = Window.partitionBy(col(groupCol))
    val pos = row_number().over(
      byGroup.orderBy(col(scoreCol).desc, col(tieCol))).cast(LongType)
    val ipos = row_number().over(
      byGroup.orderBy(col("__rel").desc, col(scoreCol).desc, col(tieCol)))
      .cast(LongType)
    def termQ(p: Column): Column = round(
      (pow(lit(2.0), col("__rel")).cast(LongType) - lit(1L)).cast(DoubleType) /
        (log(p.cast(DoubleType) + lit(1.0)) / log(lit(2.0))) * lit(1.0e9))
      .cast(LongType)
    base.withColumn("__pos", pos).withColumn("__ipos", ipos)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__pos") <= k, termQ(col("__pos"))).otherwise(lit(0L)))
          .as("__dcg_q"),
        sum(when(col("__ipos") <= k, termQ(col("__ipos"))).otherwise(lit(0L)))
          .as("__idcg_q"))
      .select(col(groupCol), col("n_docs"),
        (col("__dcg_q").cast(DoubleType) / lit(1.0e9)).as("dcg"),
        (col("__idcg_q").cast(DoubleType) / lit(1.0e9)).as("idcg"),
        when(col("__idcg_q") <= 0L, lit(null).cast(DoubleType))
          .otherwise(col("__dcg_q").cast(DoubleType) /
            col("__idcg_q").cast(DoubleType)).as("ndcg"))
  }

  /** Corpus-level BLEU (Papineni et al., ACL 2002) between a candidate
    * and a reference text column — THE n-gram overlap gate a generation
    * pipeline runs over (model output, reference) pairs before a costlier
    * judge, and the canonical "how much did my normalization distort the
    * corpus" audit when cand = transformed text, ref = original.
    *
    * Semantics: per-pair CLIPPED n-gram matches (each candidate n-gram
    * credits at most its count in that pair's reference), micro-averaged
    * per group; geometric mean of the 1..maxN precisions; brevity
    * penalty exp(min(0, 1 − ref_len/cand_len)). n ≥ 2 precisions are
    * add-one smoothed (BLEU+1, Lin & Och COLING 2004) so a short corpus
    * with no 4-gram overlap degrades smoothly instead of zeroing; an
    * all-n₁-miss group reports bleu_micro = 0 by convention.
    *
    * Tokens are the house single-space tokenization (q66 convention);
    * n-grams are NUL-joined (collision-proof). Scale shape: one explode
    * to (pair, n, gram) counts, one pair-keyed LEFT join cand→ref, one
    * group agg — all partial-agg friendly, no window over the corpus, no
    * driver state. Exactness: match/total counts are exact integers;
    * each ln pₙ is nano-quantized BEFORE the fixed-order sum and the one
    * exp is micro-rounded (the q253 recipe), so the output hash-gates. */
  def corpusBleu(df: DataFrame, candCol: String, refCol: String,
      idCol: String, groupCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, "corpusBleu: maxN must be in [1, 8]")
    graft.functions.GraftFunctions.register(df.sparkSession)
    def toks(c: Column): Column = split(trim(c), " ")
    // clipped per-pair matches come from the single-pass codegen kernel
    // (OverlapKernels: one ref-gram hash map + one clipped-decrement
    // sweep per pair) -- identical multiset-intersection counts to the
    // former explode-every-gram / shuffle / LEFT-join plan, with zero
    // shuffled gram rows (the old plan's gram-row exchange was ~all of
    // the 11.5 s sf0.1 self-BLEU cost)
    val base = df.select(col(groupCol).as("__g"),
      toks(col(candCol)).as("__ct"), toks(col(refCol)).as("__rt"))
      .withColumn("__m", expr(s"token_clipped_matches(__ct, __rt, $maxN)"))
    val aggs = count(lit(1)).as("n_pairs") +:
      sum(size(col("__ct")).cast(LongType)).as("cand_tokens") +:
      sum(size(col("__rt")).cast(LongType)).as("ref_tokens") +:
      ((1 to maxN).map(n =>
        sum(element_at(col("__m"), n)).as(s"m$n")) ++
        (1 to maxN).map(n =>
          sum(greatest(size(col("__ct")) - lit(n - 1), lit(0)).cast(LongType))
            .as(s"t$n")))
    val totals = base.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
    def m(n: Int): Column = coalesce(col(s"m$n"), lit(0L))
    def pn(n: Int): Column =
      if (n == 1) m(1).cast(DoubleType) / col("t1").cast(DoubleType)
      else (m(n) + lit(1L)).cast(DoubleType) /
        (col(s"t$n") + lit(1L)).cast(DoubleType)
    def lq(n: Int): Column = round(log(pn(n)) * lit(1.0e9)).cast(LongType)
    val bpExp = least(lit(0.0), lit(1.0) -
      col("ref_tokens").cast(DoubleType) / col("cand_tokens").cast(DoubleType))
    totals
      .select(col("__g").as(groupCol) +: col("n_pairs") +:
        col("cand_tokens") +: col("ref_tokens") +:
        ((1 to maxN).map(n => m(n).as(s"m$n")) ++
          (1 to maxN).map(n => col(s"t$n"))) :+
        round(exp(bpExp) * lit(1.0e6)).cast(LongType).as("bp_micro") :+
        when(m(1) === 0L || col("t1") === 0L, lit(0L))
          .otherwise(round(exp(
            (1 to maxN).map(lq).reduce(_ + _).cast(DoubleType) /
              lit(maxN * 1.0e9) + bpExp) * lit(1.0e6)).cast(LongType))
          .as("bleu_micro"): _*)
  }

  /** Corpus-level chrF (Popović, WMT 2015): character-n-gram F-score
    * between candidate and reference, the tokenization-free companion to
    * [[corpusBleu]] (robust to morphology/punctuation splits that break
    * word n-grams). Whitespace is removed entirely (sacreBLEU chrF
    * convention), char 1..maxN-gram matches are clipped per pair and
    * micro-averaged per group, and chrFβ = mean over n of
    * (1+β²)·mₙ / (β²·refₙ + candₙ) — the algebraic collapse of
    * (1+β²)PR/(β²P+R) to ONE division per n over exact integers, so the
    * only doubles are maxN fixed-order divisions and the final mean:
    * bit-identical on any engine, no quantization machinery needed
    * (the output is still micro-rounded for hash hygiene). Same scale
    * shape as corpusBleu: explode → pair-keyed counts → one LEFT join →
    * one group agg. */
  def chrF(df: DataFrame, candCol: String, refCol: String,
      idCol: String, groupCol: String, maxN: Int = 6,
      betaSq: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, "chrF: maxN must be in [1, 8]")
    graft.functions.GraftFunctions.register(df.sparkSession)
    def chars(c: Column): Column = regexp_replace(c, "\\s+", "")
    // clipped per-pair matches via the single-pass codepoint kernel
    // (OverlapKernels.charClippedMatches) -- the corpus-chars x 6-order
    // gram explode + shuffle + LEFT join this replaces was 21 s at
    // sf0.1, the slowest entry in the whole suite; counts are the same
    // multiset-intersection integers, oracle unchanged
    val base = df.select(col(groupCol).as("__g"),
      chars(col(candCol)).as("__cs"), chars(col(refCol)).as("__rs"))
      .withColumn("__m", expr(s"char_clipped_matches(__cs, __rs, $maxN)"))
    val aggs = count(lit(1)).as("n_pairs") +:
      sum(length(col("__cs")).cast(LongType)).as("cand_chars") +:
      sum(length(col("__rs")).cast(LongType)).as("ref_chars") +:
      ((1 to maxN).map(n =>
        sum(element_at(col("__m"), n)).as(s"m$n")) ++
        (1 to maxN).map(n =>
          sum(greatest(length(col("__cs")) - lit(n - 1), lit(0)).cast(LongType))
            .as(s"__ct$n")) ++
        (1 to maxN).map(n =>
          sum(greatest(length(col("__rs")) - lit(n - 1), lit(0)).cast(LongType))
            .as(s"__rt$n")))
    val totals = base.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
    def m(n: Int): Column = coalesce(col(s"m$n"), lit(0L))
    def fn(n: Int): Column = {
      val den = lit(betaSq.toLong) * col(s"__rt$n") + col(s"__ct$n")
      when(den > 0L,
        (lit((1 + betaSq).toLong) * m(n)).cast(DoubleType) / den.cast(DoubleType))
        .otherwise(lit(0.0))
    }
    // average over the orders the corpus actually HAS (den > 0): a
    // corpus of strings shorter than maxN must still score 1 on identity
    val nOrders = (1 to maxN).map(n =>
      when(lit(betaSq.toLong) * col(s"__rt$n") + col(s"__ct$n") > 0L,
        lit(1L)).otherwise(lit(0L))).reduce(_ + _)
    totals
      .select(col("__g").as(groupCol) +: col("n_pairs") +:
        col("cand_chars") +: col("ref_chars") +:
        (1 to maxN).map(n => m(n).as(s"m$n")) :+
        round((1 to maxN).map(fn).reduce(_ + _) /
          greatest(nOrders, lit(1L)).cast(DoubleType) *
          lit(1.0e6)).cast(LongType).as("chrf_micro"): _*)
  }

  /** Corpus-level ROUGE-N (Lin, ACL 2004 — the RECALL-oriented overlap
    * family; [[corpusBleu]] is precision-oriented, so a summarization /
    * distillation pipeline gates on both): per-pair CLIPPED word n-gram
    * matches micro-averaged per group, reported as precision, recall,
    * and F1 per order n ≤ maxN. Same scale shape as corpusBleu (one
    * explode → pair-keyed counts → one LEFT join → one group agg), and
    * chrF's exactness collapse: every score is a SINGLE division over
    * exact integer match/total counts — P = m/cand_n, R = m/ref_n,
    * F1 = 2m/(cand_n + ref_n) — bit-identical on any engine with no
    * quantization machinery; zero denominators report 0 by convention. */
  def rougeN(df: DataFrame, candCol: String, refCol: String,
      idCol: String, groupCol: String, maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 4, "rougeN: maxN must be in [1, 4]")
    graft.functions.GraftFunctions.register(df.sparkSession)
    def toks(c: Column): Column = split(trim(c), " ")
    // clipped per-pair matches via the single-pass token kernel
    // (OverlapKernels.tokenClippedMatches) -- same rewrite as
    // corpusBleu: no gram explode, no shuffle, no join
    val base = df.select(col(groupCol).as("__g"),
      toks(col(candCol)).as("__ct"), toks(col(refCol)).as("__rt"))
      .withColumn("__m", expr(s"token_clipped_matches(__ct, __rt, $maxN)"))
    val aggs = count(lit(1)).as("n_pairs") +:
      ((1 to maxN).map(n =>
        sum(element_at(col("__m"), n)).as(s"m$n")) ++
        (1 to maxN).map(n =>
          sum(greatest(size(col("__ct")) - lit(n - 1), lit(0)).cast(LongType))
            .as(s"ct$n")) ++
        (1 to maxN).map(n =>
          sum(greatest(size(col("__rt")) - lit(n - 1), lit(0)).cast(LongType))
            .as(s"rt$n")))
    val totals = base.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
    def m(n: Int): Column = coalesce(col(s"m$n"), lit(0L))
    def ratio(num: Column, den: Column): Column =
      when(den > 0L, num.cast(DoubleType) / den.cast(DoubleType))
        .otherwise(lit(0.0))
    totals
      .select(col("__g").as(groupCol) +: col("n_pairs") +:
        (1 to maxN).flatMap(n => Seq(
          m(n).as(s"m$n"), col(s"ct$n"), col(s"rt$n"),
          ratio(m(n), col(s"ct$n")).as(s"rouge${n}_p"),
          ratio(m(n), col(s"rt$n")).as(s"rouge${n}_r"),
          ratio(lit(2L) * m(n), col(s"ct$n") + col(s"rt$n"))
            .as(s"rouge${n}_f"))): _*)
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) two-sample test — the
    * distribution-free "did segment A shift relative to segment B?"
    * check that pairs with [[spearmanCorr]] in the nonparametric
    * toolbox (rank correlation there, rank location-shift here). No
    * normality assumption: only ranks of the pooled sample matter.
    *
    * Same rank discipline as Spearman: the tie-averaged rank of a value
    * is VALUE-determined (cum_before + (n_v+1)/2), so every statistic
    * below comes from the (far smaller) distinct-value table — a
    * value-keyed count aggregate, ONE [[globalCumSum]] over distinct
    * values, then a single global aggregate. The raw rows are never
    * ranked, joined back, or re-shuffled. Doubled ranks keep tie
    * averages integral; moments are Decimal(38) sums of exact integers
    * (the tie term Σ(t³−t) ≤ n³ binds at ~10¹² distinct-value rows).
    *
    * Outputs: group sizes, U_A (may end in .5 — emitted as the one
    * exact halving of the doubled integral U), the tie-corrected
    * normal-approximation z (no continuity correction; NULL when every
    * value is tied so σ = 0), and the rank-biserial effect size
    * r = 2U_A/(n_A·n_B) − 1 ∈ [−1, 1] (sign = P(A>B) − P(A<B)). The
    * z/r chains are fixed IEEE double expressions over exact integer
    * inputs — identical shape on the DuckDB oracle, so both engines
    * produce the same bits. */
  def mannWhitneyU(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    val D = DecimalType(38, 0)
    val base = df.filter(col(valueCol).isNotNull &&
        col(groupCol).isin(groupA, groupB))
      .select(col(valueCol).as("__v"),
        when(col(groupCol) === groupA, lit(1L)).otherwise(lit(0L)).as("__a"))
    val counts = base.groupBy(col("__v"))
      .agg(count(lit(1)).as("__n"), sum(col("__a")).as("__na"))
    // doubled tie-averaged rank of value v: 2r = 2·cum_before + n_v + 1
    val ranked = globalCumSum(counts, Seq("__v"), "__n", "__cum")
      .withColumn("__r2",
        lit(2L) * (col("__cum") - col("__n")) + col("__n") + lit(1L))
    val m = ranked.agg(
      sum(col("__na")).as("n_a"),
      sum(col("__n") - col("__na")).as("n_b"),
      sum(col("__na").cast(D) * col("__r2").cast(D)).as("__ra2"),
      sum(col("__n").cast(D) * col("__n").cast(D) * col("__n").cast(D) -
        col("__n").cast(D)).as("__t"))
    // 2U_A = 2R_A − n_A(n_A+1); E[2U] = n_A·n_B;
    // Var(2U) = (n_A·n_B/3)·((n+1) − T/(n(n−1)))
    val withU = m.select(col("n_a"), col("n_b"), col("__t"),
      (col("__ra2") -
        col("n_a").cast(D) * (col("n_a") + lit(1L)).cast(D)).as("__u2"),
      (col("n_a") + col("n_b")).as("__nn"))
    val dab = col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)
    val bracket = (col("__nn") + lit(1L)).cast(DoubleType) -
      col("__t").cast(DoubleType) /
        (col("__nn").cast(DoubleType) * (col("__nn") - lit(1L)).cast(DoubleType))
    withU.select(col("n_a"), col("n_b"),
      (col("__u2").cast(DoubleType) / lit(2.0)).as("u_a"),
      when(col("n_a") === 0L || col("n_b") === 0L || col("__nn") < 2L ||
          bracket <= lit(0.0), lit(null).cast(DoubleType))
        .otherwise((col("__u2").cast(DoubleType) - dab) /
          sqrt(dab / lit(3.0) * bracket)).as("z"),
      when(col("n_a") === 0L || col("n_b") === 0L, lit(null).cast(DoubleType))
        .otherwise(col("__u2").cast(DoubleType) / dab - lit(1.0))
        .as("rank_biserial"))
  }

  /** Split-conformal prediction audit — the distribution-free
    * uncertainty wrapper every deployed predictor should carry: from a
    * CALIBRATION set's absolute residuals, pick q̂ = the
    * ⌈(n+1)(1−α)⌉-th smallest; the interval pred ± q̂ then covers a
    * fresh point with probability ≥ 1−α under exchangeability, no
    * model assumptions. This measures it: q̂ from the calibration
    * residuals (exact order statistic — integer ceil arithmetic over
    * [[globalRank]], never a percentile approximation) and the
    * EMPIRICAL coverage on a held-out test set.
    *
    * Inputs: two DataFrames with a residual column (any deterministic
    * |y − ŷ|) and a unique tiebreak id. Shape: one globalRank over the
    * calibration rows (partition-offset pattern), a 1-row broadcast of
    * (n, q̂), and one aggregate over test — nothing quadratic, no
    * single-partition sort. */
  def conformalAudit(cal: DataFrame, test: DataFrame, residCol: String,
      idCol: String, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0,
      s"conformalAudit: alpha must be in (0,1), got $alpha")
    // ceil((n+1)(1−α)) in exact integer arithmetic: α as a permille
    val keepPm = math.round((1.0 - alpha) * 1000)
    val calR = cal.filter(col(residCol).isNotNull)
      .select(col(residCol).cast(DoubleType).as("__r"), col(idCol).as("__id"))
    val ranked = globalRank(calR, Seq("__r", "__id"))
    val n = ranked.agg(count(lit(1)).as("n_cal"))
      .withColumn("__k",
        expr(s"(($keepPm * (n_cal + 1)) + 999) div 1000"))
    val qhat = ranked.crossJoin(broadcast(n))
      // k > n_cal (tiny calibration sets) → no finite q̂: empty result
      .filter(col("grank") === col("__k"))
      .select(col("n_cal"), col("__r").as("qhat"))
    val testR = test.filter(col(residCol).isNotNull)
      .select(col(residCol).cast(DoubleType).as("__r"))
    testR.crossJoin(broadcast(qhat))
      // grouped (single-group) aggregate: a too-small calibration set
      // (k > n) yields an EMPTY result, not a row of nulls — a global
      // agg would always emit one row
      .groupBy(col("n_cal"), col("qhat"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__r") <= col("qhat"), lit(1L)).otherwise(lit(0L)))
          .as("n_covered"))
      .select(col("n_cal"), col("n_test"), col("qhat"), col("n_covered"),
        round(col("n_covered").cast(DoubleType) /
          col("n_test").cast(DoubleType), 6).as("coverage"),
        lit(1.0 - alpha).as("target"))
  }

  /** CUPED variance-reduced A/B lift — the industry-standard variance
    * reduction for experiments (Deng et al., WSDM'13): adjust each
    * unit's metric by its PRE-period covariate, y′ = y − θ(x − x̄) with
    * θ = cov(x,y)/var(x), which shrinks metric variance by exactly
    * ρ²(x,y) without biasing the treatment contrast.
    *
    * Input: one row per experiment unit with integer-quantized
    * pre-metric `xqCol`, post-metric `yqCol` (the caller quantizes —
    * exact cross-engine sums demand integer inputs) and a boolean
    * variant. ONE aggregate computes every moment: n/Σx/Σy/Σx²/Σy²/Σxy
    * as exact Decimal(38) sums plus per-variant conditional sums. θ and
    * the lifts are fixed double chains over those exact integers —
    * θ = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), lift_cuped = lift_naive −
    * θ·(x̄_B − x̄_A) (the x-imbalance correction), and the variance
    * reduction is ρ² computed from the same three exact bases.
    *
    * 100 TB shape: the unit table is already one row per unit (the
    * caller's keyed aggregate over raw events); this adds ONE 1-row
    * aggregate — no join, no window, no second scan. */
  def cupedLift(units: DataFrame, xqCol: String, yqCol: String,
      variantCol: String, scale: Double = 1e6): DataFrame = {
    require(scale > 0.0, s"cupedLift: scale must be > 0, got $scale")
    val D = DecimalType(38, 0)
    val base = units.filter(col(xqCol).isNotNull && col(yqCol).isNotNull &&
        col(variantCol).isNotNull)
      .select(col(xqCol).cast(D).as("__x"), col(yqCol).cast(D).as("__y"),
        col(variantCol).cast(BooleanType).as("__v"))
    val m = base.agg(count(lit(1)).as("n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(when(col("__v"), lit(1L)).otherwise(lit(0L))).as("n_b"),
      sum(when(col("__v"), col("__x")).otherwise(lit(0L).cast(D))).as("__sxb"),
      sum(when(col("__v"), col("__y")).otherwise(lit(0L).cast(D))).as("__syb"))
    def d(c: Column): Column = c.cast(DoubleType)
    val nD = d(col("n"))
    val covN = d(col("n").cast(D) * col("__sxy") - col("__sx") * col("__sy"))
    val varXN = d(col("n").cast(D) * col("__sxx") - col("__sx") * col("__sx"))
    val varYN = d(col("n").cast(D) * col("__syy") - col("__sy") * col("__sy"))
    val nA = col("n") - col("n_b")
    val meanYB = d(col("__syb")) / d(col("n_b"))
    val meanYA = d(col("__sy") - col("__syb")) / d(nA)
    val meanXB = d(col("__sxb")) / d(col("n_b"))
    val meanXA = d(col("__sx") - col("__sxb")) / d(nA)
    val theta = covN / varXN
    m.select(col("n"), (col("n") - col("n_b")).as("n_a"), col("n_b"),
      when(col("n_b") === 0L || nA === 0L || varXN <= lit(0.0),
        lit(null).cast(DoubleType))
        .otherwise(round(theta, 6)).as("theta_r"),
      when(col("n_b") === 0L || nA === 0L, lit(null).cast(DoubleType))
        .otherwise(round((meanYB - meanYA) / lit(scale), 6)).as("lift_naive_r"),
      when(col("n_b") === 0L || nA === 0L || varXN <= lit(0.0),
        lit(null).cast(DoubleType))
        .otherwise(round((meanYB - meanYA) / lit(scale) -
          theta * ((meanXB - meanXA) / lit(scale)), 6)).as("lift_cuped_r"),
      when(varXN <= lit(0.0) || varYN <= lit(0.0),
        lit(null).cast(DoubleType))
        .otherwise(round(covN * covN / (varXN * varYN), 6))
        .as("var_reduction_r"))
  }

  /** Fellegi–Sunter EM parameter learning — the training step the q195
    * scorer's declared weights come from: given the AGREEMENT-PATTERN
    * counts of blocked candidate pairs (one row per pattern over k
    * boolean comparators, with its pair count), learn per-field match/
    * non-match agreement probabilities m_i, u_i and the match prior λ
    * by the classic two-class latent EM (Winkler's formulation).
    *
    * Everything runs on the 2^k-row pattern table — the raw pairs are
    * reduced ONCE by the caller's keyed count; EM rounds are tiny
    * crossJoin(broadcast(1-row params)) + aggregate plans, nothing
    * driver-resident, nothing proportional to corpus size.
    *
    * Float policy: parameters and responsibilities are nano-quantized
    * longs after EVERY E and M step, so both engines round identically
    * each round and libm drift cannot accumulate; the output ln-weights
    * are single ln calls over quantized inputs, rounded once. Boundary
    * collapse (m→1, u→0) yields NULL weights instead of ±∞.
    *
    * Output: one row per field — m, u, λ, and the agree/disagree
    * ln-weights the q195 scorer consumes. */
  def fsEmLearn(patterns: DataFrame, fieldCols: Seq[String],
      countCol: String = "c", rounds: Int = 5, initM: Double = 0.8,
      initU: Double = 0.2, initLambda: Double = 0.1): DataFrame = {
    require(fieldCols.nonEmpty, "fsEmLearn needs at least one field")
    require(rounds >= 1, s"fsEmLearn needs rounds >= 1, got $rounds")
    val spark = patterns.sparkSession
    val k = fieldCols.size
    val pat = patterns.select(
      fieldCols.zipWithIndex.map { case (c0, i) =>
        col(c0).cast(BooleanType).as(s"__g$i") } :+
        col(countCol).cast(LongType).as("__c"): _*)
      .localCheckpoint()
    def qLit(x: Double): Column = lit(math.round(x * 1e9))
    def d(c: Column): Column = c.cast(DoubleType) / lit(1.0e9)
    var params: DataFrame = spark.range(1).select(
      qLit(initLambda).as("__p") +: (0 until k).flatMap(i =>
        Seq(qLit(initM).as(s"__m$i"), qLit(initU).as(s"__u$i"))): _*)
    for (_ <- 1 to rounds) {
      // E step: responsibility w = P(match | pattern), nano-quantized
      val pm = (0 until k).foldLeft(d(col("__p"))) { (acc, i) =>
        acc * when(col(s"__g$i"), d(col(s"__m$i")))
          .otherwise(lit(1.0) - d(col(s"__m$i")))
      }
      val pu = (0 until k).foldLeft(lit(1.0) - d(col("__p"))) { (acc, i) =>
        acc * when(col(s"__g$i"), d(col(s"__u$i")))
          .otherwise(lit(1.0) - d(col(s"__u$i")))
      }
      val scored = pat.crossJoin(broadcast(params))
        .withColumn("__w",
          round(pm / (pm + pu) * lit(1.0e9)).cast(LongType))
      // M step: weighted counts (exact longs) → nano-quantized params;
      // a collapsed denominator keeps the previous round's value
      val aggs =
        (when(sum(col("__c") * col("__w")) === 0L, max(col("__p")))
          .otherwise(round(sum(col("__c") * col("__w")).cast(DoubleType) /
            sum(col("__c")).cast(DoubleType)).cast(LongType)).as("__p")) +:
        (0 until k).flatMap { i =>
          val mw = sum(when(col(s"__g$i"), col("__c") * col("__w"))
            .otherwise(lit(0L)))
          val uw = sum(when(col(s"__g$i"),
            col("__c") * (lit(1000000000L) - col("__w"))).otherwise(lit(0L)))
          Seq(
            when(sum(col("__c") * col("__w")) === 0L, max(col(s"__m$i")))
              .otherwise(round(mw.cast(DoubleType) /
                sum(col("__c") * col("__w")).cast(DoubleType) * lit(1.0e9))
                .cast(LongType)).as(s"__m$i"),
            when(sum(col("__c") * (lit(1000000000L) - col("__w"))) === 0L,
              max(col(s"__u$i")))
              .otherwise(round(uw.cast(DoubleType) /
                sum(col("__c") * (lit(1000000000L) - col("__w")))
                  .cast(DoubleType) * lit(1.0e9)).cast(LongType))
              .as(s"__u$i"))
        }
      params = scored.agg(aggs.head, aggs.tail: _*)
    }
    (0 until k).map { i =>
      val m = d(col(s"__m$i")); val u = d(col(s"__u$i"))
      params.select(lit(fieldCols(i)).as("field"), m.as("m"), u.as("u"),
        d(col("__p")).as("lambda"),
        when(col(s"__m$i") === 0L || col(s"__u$i") === 0L,
          lit(null).cast(DoubleType))
          .otherwise(round(log(m / u), 6)).as("w_agree"),
        when(col(s"__m$i") === 1000000000L || col(s"__u$i") === 1000000000L,
          lit(null).cast(DoubleType))
          .otherwise(round(log((lit(1.0) - m) / (lit(1.0) - u)), 6))
          .as("w_disagree"))
    }.reduce(_ unionAll _)
  }

  /** Leave-one-group-out ablation of a metric mean — "which source
    * drags the corpus?" answered without one job per source: the
    * mean-without-group comes from global sufficient statistics minus
    * the group's own, so ALL ablations cost ONE keyed aggregate plus a
    * broadcast 1-row total (vs the naive #groups × full-scan loop —
    * the difference between an afternoon and a minute at 100 TB).
    *
    * Output per group: size, its own mean, the corpus mean without it,
    * and the delta vs the overall mean (positive delta = removing the
    * group RAISES the mean = the group drags it down). Sums are exact
    * longs; each mean is a single double division and the delta is one
    * subtraction of identically-shaped divisions — oracle-exact with
    * no rounding. */
  def ablateGroups(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    // DECIMAL(38,6) sums: exact for any metric with ≤ 6 decimals (and
    // for all integer metrics), order-invariant under shuffle — a
    // LongType cast here would silently truncate fractional metrics
    // (review finding)
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast(DecimalType(38, 6)).as("__v"))
    // group table materialized once: it feeds BOTH the output rows and
    // the global totals, and the totals are derivable from it — so the
    // raw rows are scanned ONCE, not once per aggregate
    val g = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum(col("__v")).as("__s"))
      .localCheckpoint()
    val tot = g.agg(sum(col("n_rows")).as("__tn"), sum(col("__s")).as("__ts"))
    g.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_rows"),
        (col("__s").cast(DoubleType) / col("n_rows").cast(DoubleType))
          .as("group_mean"),
        when(col("__tn") === col("n_rows"), lit(null).cast(DoubleType))
          .otherwise((col("__ts") - col("__s")).cast(DoubleType) /
            (col("__tn") - col("n_rows")).cast(DoubleType))
          .as("mean_without"),
        when(col("__tn") === col("n_rows"), lit(null).cast(DoubleType))
          .otherwise((col("__ts") - col("__s")).cast(DoubleType) /
            (col("__tn") - col("n_rows")).cast(DoubleType) -
            col("__ts").cast(DoubleType) / col("__tn").cast(DoubleType))
          .as("delta"))
  }

  /** Kaplan–Meier survival estimator — the right-censoring-aware "how
    * long do users/jobs/sessions live?" curve (a plain duration mean is
    * biased the moment censored subjects exist): at every death time t,
    * S(t) = Π_{t' ≤ t} (1 − d_{t'}/n_{t'}) with d = deaths at t' and
    * n = subjects still at risk.
    *
    * Input: one row per subject with a duration and an observed flag
    * (1 = event seen, 0 = censored at that duration). Shape: one
    * duration-keyed aggregate, then THREE [[globalCumSum]] passes over
    * the distinct-duration table (at-risk prefix, log-survival prefix,
    * zero-survival flag prefix) — the duration table is bounded by the
    * time resolution, not the subject count, so the repeated cum-sums
    * are free at any corpus size and the raw rows shuffle ONCE.
    *
    * Float policy: each step's ln(1 − d/n) is nano-quantized to a long
    * BEFORE the prefix sum (exact under any order), S = exp(prefix)
    * rounded once; a step with d = n sends S to exactly 0 from then on
    * (flag prefix, not a −∞ log). */
  def kaplanMeier(df: DataFrame, durationCol: String,
      observedCol: String): DataFrame = {
    val base = df.filter(col(durationCol).isNotNull)
      .select(col(durationCol).cast(LongType).as("__t"),
        col(observedCol).cast(LongType).as("__o"))
    // duration table materialized once: it feeds the cum-sum staging
    // AND the total, which is derivable from it — one scan of the
    // subject rows, not two
    val g = base.groupBy(col("__t"))
      .agg(count(lit(1)).as("__na"), sum(col("__o")).as("__d"))
      .localCheckpoint()
    val tot = g.agg(sum(col("__na")).as("__nn"))
    val atRisk = globalCumSum(g, Seq("__t"), "__na", "__cum")
      .crossJoin(broadcast(tot))
      .withColumn("__risk", col("__nn") - (col("__cum") - col("__na")))
      .filter(col("__d") > 0L)
      .withColumn("__lnq", when(col("__d") >= col("__risk"), lit(0L))
        .otherwise(round(log(lit(1.0) -
          col("__d").cast(DoubleType) / col("__risk").cast(DoubleType)) *
          lit(1.0e9)).cast(LongType)))
      .withColumn("__z",
        when(col("__d") >= col("__risk"), lit(1L)).otherwise(lit(0L)))
    globalCumSum(globalCumSum(atRisk, Seq("__t"), "__lnq", "__cq"),
        Seq("__t"), "__z", "__cz")
      .select(col("__t").as("duration"), col("__d").as("n_deaths"),
        col("__risk").as("n_at_risk"),
        when(col("__cz") >= 1L, lit(0.0))
          .otherwise(round(exp(col("__cq").cast(DoubleType) / lit(1.0e9)), 6))
          .as("survival"))
  }

  /** Two-sample log-rank test (Mantel 1966) — does the treatment group's
    * survival curve differ from control's? The hypothesis-test companion
    * to [[kaplanMeier]] (that one DRAWS the curves; this says whether the
    * gap is noise), censoring-aware where q214's Mann–Whitney is not.
    * `groupCol` must be 0/1 (1 = treatment). At each distinct death time
    * t: O−E term d1 − d·r1/r and hypergeometric variance
    * d·r1·r2·(r−d) / (r²·(r−1)); Z = ΣOE/√ΣV, χ² = Z².
    *
    * Exactness: at-risk counts come from ONE duration-keyed aggregate +
    * two [[globalCumSum]] passes (never a 1-partition window, never a
    * rank over subjects); per-time numerators are exact Decimal(38)
    * integer products (bound: r⁴ ≤ 10³⁸ holds to ~10⁹ subjects) cast
    * once to double for a single division, nano-quantized to longs so
    * the cross-time sums are order-free, and the final Z/χ² are one
    * fixed double chain rounded to 6 dp. Times where only one subject
    * is at risk carry zero information (O−E = 0 identically) and a
    * zero variance term.
    *
    * 100 TB shape: subjects shuffle once (duration agg); everything
    * ordered runs over the distinct-duration table; 1-row totals
    * broadcast. */
  def logRank(df: DataFrame, durationCol: String, observedCol: String,
      groupCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val base = df.filter(col(durationCol).isNotNull)
      .select(col(durationCol).cast(LongType).as("__t"),
        col(observedCol).cast(LongType).as("__o"),
        col(groupCol).cast(LongType).as("__g"))
    val g = base.groupBy(col("__t"))
      .agg(count(lit(1)).as("__na"),
        sum(col("__g")).as("__na1"),
        sum(col("__o")).as("__d"),
        sum(col("__g") * col("__o")).as("__d1"))
      .localCheckpoint()
    val tot = g.agg(sum(col("__na")).as("__nn"), sum(col("__na1")).as("__nn1"))
    val r = globalCumSum(globalCumSum(g, Seq("__t"), "__na", "__cum"),
        Seq("__t"), "__na1", "__cum1")
      .crossJoin(broadcast(tot))
      .withColumn("__risk", col("__nn") - (col("__cum") - col("__na")))
      .withColumn("__risk1", col("__nn1") - (col("__cum1") - col("__na1")))
      .filter(col("__d") > 0L)
    val term = r.select(col("__d"), col("__d1"),
      round((col("__d1").cast(DoubleType) -
        (col("__d").cast(D) * col("__risk1").cast(D)).cast(DoubleType) /
          col("__risk").cast(DoubleType)) * lit(1.0e9))
        .cast(LongType).as("__oeq"),
      when(col("__risk") > 1L,
        round((col("__d").cast(D) * col("__risk1").cast(D) *
          (col("__risk") - col("__risk1")).cast(D) *
          (col("__risk") - col("__d")).cast(D)).cast(DoubleType) /
          (col("__risk").cast(D) * col("__risk").cast(D) *
            (col("__risk") - lit(1L)).cast(D)).cast(DoubleType) *
          lit(1.0e9)).cast(LongType))
        .otherwise(lit(0L)).as("__vq"))
    val oes = col("__oes").cast(DoubleType) / lit(1.0e9)
    val vs = col("__vs").cast(DoubleType) / lit(1.0e9)
    term.agg(count(lit(1)).as("n_death_times"),
        sum(col("__d1")).as("deaths_treat"),
        sum(col("__d") - col("__d1")).as("deaths_control"),
        sum(col("__oeq")).as("__oes"), sum(col("__vq")).as("__vs"))
      .select(col("n_death_times"), col("deaths_treat"), col("deaths_control"),
        round(oes, 6).as("o_minus_e"),
        round(vs, 6).as("variance"),
        when(col("__vs") > 0L, round(oes / sqrt(vs), 6))
          .otherwise(lit(null).cast(DoubleType)).as("z_score"),
        when(col("__vs") > 0L, round(oes * oes / vs, 6))
          .otherwise(lit(null).cast(DoubleType)).as("chi_sq"))
  }

  /** Restricted mean survival time (Royston & Parmar 2013) — the
    * single-number summary a KM curve feeds a business decision as:
    * expected survival within a τ-day horizon, ∫₀^τ S(t)dt of the
    * [[kaplanMeier]] step function. Robust where median survival is
    * undefined (curve never crosses 0.5) and the standard effect
    * measure when hazards aren't proportional.
    *
    * The integral runs over the death-time table only: interval widths
    * from the [[globalRank]] next-value device (never a 1-partition
    * lead window), S·Δt terms micro-quantized longs before the
    * order-free sum, the leading S=1 segment from one 1-row min. */
  def rmst(df: DataFrame, durationCol: String, observedCol: String,
      tau: Long): DataFrame = {
    require(tau > 0L, s"rmst needs tau > 0, got $tau")
    val km = kaplanMeier(df, durationCol, observedCol)
      .select(col("duration"), col("survival")).localCheckpoint()
    val ranked = globalRank(km, Seq("duration"), "rnk")
    val nxt = ranked.select((col("rnk") - 1L).as("rnk"),
      col("duration").as("next_dur"))
    val widths = ranked.join(nxt, Seq("rnk"), "left")
      .select(col("duration"), col("survival"),
        greatest(lit(0L),
          least(coalesce(col("next_dur"), lit(tau)), lit(tau)) -
            least(col("duration"), lit(tau))).as("w"))
    val segSum = widths
      .select(round(col("survival") * col("w").cast(DoubleType) *
        lit(1.0e6)).cast(LongType).as("sq"))
      .agg(sum(col("sq")).as("__s"), count(lit(1)).as("n_death_times"))
    val head = km.agg(min(col("duration")).as("__t1"))
    segSum.crossJoin(broadcast(head))
      .select(lit(tau).as("tau"), col("n_death_times"),
        round(least(col("__t1"), lit(tau)).cast(DoubleType) +
          col("__s").cast(DoubleType) / lit(1.0e6), 6).as("rmst"))
  }

  /** Leave-one-out target encoding of a high-cardinality categorical
    * key — the standard feature-engineering transform that replaces a
    * key with the label mean of its OTHER members (leave-one-out kills
    * the self-leakage that plain mean encoding trains on), smoothed
    * toward the global prior so rare categories don't memorize:
    * te_i = (pos_c − y_i + m·prior) / (n_c − 1 + m).
    *
    * Exactness: category sums and counts are exact longs; the prior is
    * one double division broadcast from a 1-row aggregate; te is one
    * fixed double chain per row — identical shape on the oracle, no
    * rounding needed. Categories of size 1 fall back to pure prior
    * (numerator m·prior over denominator m) by the same formula.
    *
    * 100 TB shape: ONE category-keyed aggregate + an equi-join back on
    * the key (the category table is dimension-sized) + a broadcast
    * 1-row prior. Never a window, never per-row state. */
  def targetEncode(df: DataFrame, keyCol: String, labelCol: String,
      smoothing: Double = 10.0): DataFrame = {
    require(smoothing > 0.0,
      s"targetEncode: smoothing must be > 0 (got $smoothing) — " +
        "m = 0 makes singleton categories divide by zero")
    val base = df.withColumn("__y",
      col(labelCol).cast(BooleanType).cast(LongType))
    // the category table feeds BOTH the join probe and the prior, and
    // the prior is derivable from it (Σpc/Σnc == Σy/n exactly, integer
    // sums) — materialize it so the raw rows are scanned once for the
    // aggregate and once for the join, never a third time
    val cat = base.filter(col("__y").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("__nc"), sum(col("__y")).as("__pc"))
      .localCheckpoint()
    val prior = cat.agg((sum(col("__pc")).cast(DoubleType) /
      sum(col("__nc")).cast(DoubleType)).as("__prior"))
    base.join(cat, Seq(keyCol), "left").crossJoin(broadcast(prior))
      .withColumn("te",
        when(col("__y").isNull || col("__nc").isNull, col("__prior"))
          .otherwise(
            ((col("__pc") - col("__y")).cast(DoubleType) +
              lit(smoothing) * col("__prior")) /
              ((col("__nc") - lit(1L)).cast(DoubleType) + lit(smoothing))))
      .drop("__y", "__nc", "__pc", "__prior")
  }

  /** Best binary split of a numeric feature against a boolean label by
    * information gain — the decision-stump / feature-quality audit (and
    * the inner loop of distributed tree training): which threshold on
    * this feature most reduces label entropy?
    *
    * Candidate thresholds are the distinct feature values (split:
    * x ≤ v). Like [[spearmanCorr]]/[[mannWhitneyU]], nothing ranks the
    * raw rows: left-side (count, positives) prefixes come from ONE
    * value-keyed aggregate + two [[globalCumSum]] passes over the
    * distinct-value table, entropies are a fixed double chain over
    * exact integer counts, and the winner is a nano-quantized
    * `min_by` argmax (gain desc, threshold asc) — one aggregate, no
    * sort, deterministic under ln() last-ulp noise.
    *
    * Output: total/positive counts, the winning threshold with its
    * left-side counts, and the gain (nats). All-one-class inputs have
    * gain 0 everywhere → the smallest threshold wins (still
    * deterministic). */
  def bestSplit(df: DataFrame, featureCol: String,
      labelCol: String): DataFrame = {
    val base = df.filter(col(featureCol).isNotNull && col(labelCol).isNotNull)
      .select(col(featureCol).as("__v"),
        col(labelCol).cast(BooleanType).cast(LongType).as("__y"))
    // distinct-value table materialized once: both cum-sums AND the
    // totals derive from it — the raw rows are scanned exactly once
    val counts = base.groupBy(col("__v"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("__n")).as("n_total"),
      sum(col("__p")).as("n_pos"))
    val cum = globalCumSum(globalCumSum(counts, Seq("__v"), "__n", "__nl"),
      Seq("__v"), "__p", "__pl")
    def d(c: Column): Column = c.cast(DoubleType)
    // entropy of a (pos, n) block in nats; 0·ln0 handled by the guard
    def h(p: Column, n: Column): Column =
      when(n === 0L || p === 0L || p === n, lit(0.0))
        .otherwise(-(d(p) / d(n) * log(d(p) / d(n)) +
          d(n - p) / d(n) * log(d(n - p) / d(n))))
    val scored = cum.crossJoin(broadcast(totals))
      .withColumn("__nr", col("n_total") - col("__nl"))
      .withColumn("__pr", col("n_pos") - col("__pl"))
      .withColumn("__gain",
        h(col("n_pos"), col("n_total")) -
          d(col("__nl")) / d(col("n_total")) * h(col("__pl"), col("__nl")) -
          d(col("__nr")) / d(col("n_total")) * h(col("__pr"), col("__nr")))
      .withColumn("__gq", round(col("__gain") * lit(1.0e9)).cast(LongType))
    scored.agg(
        max(col("n_total")).as("n_total"), max(col("n_pos")).as("n_pos"),
        min_by(struct(col("__v"), col("__nl"), col("__pl"), col("__gq")),
          struct((-col("__gq")).as("g"), col("__v").as("v"))).as("__best"))
      .select(col("n_total"), col("n_pos"),
        col("__best.__v").as("best_threshold"),
        col("__best.__nl").as("n_left"), col("__best.__pl").as("pos_left"),
        (col("__best.__gq").cast(DoubleType) / lit(1.0e9)).as("gain"))
  }

  /** Benjamini–Hochberg step-up FDR control over a table of hypothesis
    * tests — the multiple-comparisons gate a segment-sweep experiment
    * family needs (run one test per cell, then control the EXPECTED
    * false-discovery rate instead of per-test α).
    *
    * Input: one row per hypothesis with a micro-quantized p-value
    * (`pQCol`: round(p·1e6) as long — quantization makes the cross-
    * engine ordering exact; sub-ulp libm differences in the caller's
    * p-value chain vanish at 1e-6). `tieCols` must make the order total
    * so rank assignment is engine-reproducible under equal p.
    *
    * Adjusted q_i = min_{j ≥ i}(p_j·m/j), computed as an ascending-p
    * rank + a suffix running-min window; discovery ⇔ q ≤ α. The raw
    * BH term p_q·m is an exact long product (p_q ≤ 1e6, so safe to
    * m ~ 9·10¹¹ hypotheses); the /rank division is the only double.
    *
    * Scale note: this runs windows ordered over the WHOLE test table —
    * in-budget because the input is one row per hypothesis (segment
    * cells, not raw observations; thousands, not billions). The raw-row
    * reduction to per-cell statistics is the caller's keyed aggregate. */
  def benjaminiHochberg(tests: DataFrame, pQCol: String,
      tieCols: Seq[String], alpha: Double = 0.05): DataFrame = {
    require(tieCols.nonEmpty,
      "benjaminiHochberg: tieCols must make the p order total")
    val mDf = tests.agg(count(lit(1)).as("__m"))
    val ordAsc = (col(pQCol) +: tieCols.map(col)).toSeq
    val wAsc = Window.orderBy(ordAsc: _*)
    val wSuffix = Window.orderBy(ordAsc.map(_.desc): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    tests.crossJoin(broadcast(mDf))
      .withColumn("p_rank", row_number().over(wAsc).cast(LongType))
      .withColumn("__raw",
        (col(pQCol) * col("__m")).cast(DoubleType) /
          col("p_rank").cast(DoubleType))
      .withColumn("q_value_micro", min(col("__raw")).over(wSuffix))
      .withColumn("q_value",
        least(col("q_value_micro") / lit(1.0e6), lit(1.0)))
      .withColumn("discovered", col("q_value") <= lit(alpha))
      .drop("__m", "__raw", "q_value_micro")
  }

  /** k-anonymity / l-diversity release audit — the privacy gate before a
    * dataset leaves the pipeline: every row must hide in an equivalence
    * class of ≥ k rows sharing its quasi-identifier tuple (k-anonymity,
    * Sweeney 2002), and each class should carry several distinct
    * sensitive values (l-diversity, Machanavajjhala et al. 2007) or
    * class membership alone discloses the sensitive attribute.
    *
    * Output: one row per observed CLASS SIZE — how many classes have
    * that size, how many rows they cover, the worst (minimum) sensitive
    * diversity among them, and the at_risk flag (class_size < k). The
    * suppression worklist is the natural follow-up: semi-join the input
    * against classes below k.
    *
    * 100 TB shape: two keyed aggregates — quasi-tuple → class, then
    * class-size → report — the second over the far smaller class table;
    * output is ≤ #distinct class sizes. Exactness: pure integer counts
    * end-to-end (exact countDistinct; swap approx_count_distinct in at
    * extreme sensitive-cardinality, documented trade). */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit: quasiCols must be non-empty")
    require(k >= 2, s"kAnonymityAudit: k must be >= 2, got $k")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("__l"))
    classes.groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("__l")).as("min_l_diversity"))
      .select(col("class_size"), col("n_classes"),
        (col("class_size") * col("n_classes")).as("n_rows"),
        col("min_l_diversity"),
        (col("class_size") < lit(k.toLong)).as("at_risk"))
  }

  /** Isotonic calibration (pool-adjacent-violators) of a score against a
    * binary label — the calibration REPAIR beside q162's diagnosis and
    * q232's decomposition: the least-squares monotone map score →
    * calibrated rate (Zadrozny & Elkan 2002's recipe for turning ranker
    * scores into usable probabilities).
    *
    * Computed via the minimax closed form of isotonic regression —
    * fit(k) = max_{i≤k} min_{j≥k} mean(label over cells i..j) — instead
    * of the sequential PAV stack: every quantity derives from the CELL
    * table (one row per distinct score), so the whole fit is cell-table
    * arithmetic after ONE keyed aggregate over the raw rows.
    *
    * Exactness: cell-range means are single double divisions of exact
    * long prefix-sum differences (correctly rounded, so bit-identical
    * cross-engine), and min/max over identical doubles are exact — the
    * fit hash-gates without quantization.
    *
    * 100 TB shape: the raw-row reduction is one groupBy(score); the
    * C-cell table then drives a C²-row pair join + one windowed
    * suffix-min + one keyed max. In-budget because C is the number of
    * DISTINCT scores, which the caller bounds by quantizing the score
    * first (q232's round(p·scale) device); the maxCells tripwire fails
    * loudly instead of letting an unquantized float score melt the pair
    * join. The windows here order CELLS, never raw rows. */
  def isotonicCalibrate(df: DataFrame, scoreCol: String, labelCol: String,
      maxCells: Int = 1000): DataFrame = {
    val cells = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("score"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast(LongType)).as("pos"))
      .localCheckpoint() // pinned: feeds the pair join AND the output join
    val c = cells.count()
    require(c <= maxCells,
      s"isotonicCalibrate: $c distinct scores exceed maxCells=$maxCells — " +
        "quantize the score first (round(p*scale) cast to long); the PAV " +
        "fit is C^2 in distinct scores by design")
    val wIdx = Window.orderBy(col("score"))
    val idx = cells.select(col("score"), col("n"), col("pos"),
      row_number().over(wIdx).cast(LongType).as("i"),
      sum(col("n")).over(wIdx).as("cn"),
      sum(col("pos")).over(wIdx).as("cp"))
    val a = idx.select(col("i").as("ia"), col("cn").as("cna"),
      col("cp").as("cpa"), col("n").as("na"), col("pos").as("posa"))
    val b = idx.select(col("i").as("ib"), col("cn").as("cnb"),
      col("cp").as("cpb"))
    val pairs = a.join(b, col("ia") <= col("ib"))
      .select(col("ia"), col("ib"),
        ((col("cpb") - col("cpa") + col("posa")).cast(DoubleType) /
          (col("cnb") - col("cna") + col("na")).cast(DoubleType)).as("m"))
    val wSuf = Window.partitionBy(col("ia")).orderBy(col("ib").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val iso = pairs.withColumn("mik", min(col("m")).over(wSuf))
      .groupBy(col("ib").as("i"))
      .agg(max(col("mik")).as("rate_iso"))
    idx.join(iso, Seq("i"))
      .select(col("score"), col("n"), col("pos"),
        (col("pos").cast(DoubleType) / col("n").cast(DoubleType))
          .as("rate_raw"),
        col("rate_iso"))
  }

  /** Hard-negative mining for contrastive training (q238) — for each
    * anchor, the k most-similar corpus items with a DIFFERENT label:
    * semantically close but known-distinct, the negatives that actually
    * move an embedding model (random negatives — negativeSample — are
    * trivially separable after the first epochs; cf. DPR, Karpukhin et
    * al. 2020).
    *
    * Same shape as [[cosineTopK]]: anchors broadcast (caller-bounded —
    * mine for a training batch, not the whole corpus at once), the base
    * side never shuffles, label inequality rides the join condition so
    * same-label pairs are never scored. Similarities are nano-quantized
    * before the rank so ordering is engine-exact. At corpus-scale anchor
    * sets, swap the scoring join for the LSH/IVF candidate paths. */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, anchorFilter: Column): DataFrame = {
    require(k >= 1, s"hardNegatives needs k >= 1, got $k")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val base0 = df.select(col(idCol).as("nid"), col(vecCol).as("v"),
        col(labelCol).as("neg_label"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
    // the cosineTopK parallelism floor: a single-file base read would
    // serialize the O(|base|·|anchors|) scoring on one core
    val dp = df.sparkSession.sparkContext.defaultParallelism
    val base = if (base0.rdd.getNumPartitions < dp)
      base0.repartition(dp, col("nid")) else base0
    val anchors = df.filter(anchorFilter)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        col(labelCol).as("anchor_label"))
      .withColumn("qn", sqrt(expr("vec_dot(qv, qv)")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("simq").desc, col("nid"))
    base.join(broadcast(anchors), col("neg_label") =!= col("anchor_label"))
      .withColumn("simq", round(expr("vec_dot(v, qv)") /
        (col("nrm") * col("qn")) * lit(1.0e9)).cast(LongType))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("anchor_label"), col("rnk"), col("nid"),
        col("neg_label"),
        (col("simq").cast(DoubleType) / lit(1.0e9)).as("sim"))
  }

  /** Embedding-space decontamination (q240) — the semantic layer the
    * n-gram rules (bloom/gram decontamination) cannot see: flag every
    * train item whose nearest eval-set embedding clears a cosine
    * threshold (paraphrased eval leakage shares no 13-gram but sits at
    * high cosine). Every train row is kept — clean rows report their
    * best match un-flagged, so the output doubles as a near-miss audit.
    *
    * Shape: eval set broadcast (eval suites are small by construction);
    * the |train|×|eval| scoring reduces through ONE keyed min_by argmax
    * (map-side partial, no window, no shuffle of scored pairs), so the
    * train side streams. Similarities nano-quantized before the argmax
    * → engine-exact tie-breaks (then min eval_id). At eval sets too big
    * to broadcast, bucket both sides through the LSH path first. */
  def semanticDecontaminate(train: DataFrame, evalSet: DataFrame,
      vecCol: String, idCol: String, threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    // the keep-every-train-row contract cannot survive an empty eval
    // side (the argmax aggregate would silently emit zero rows)
    require(!evalSet.isEmpty,
      "semanticDecontaminate: eval set is empty — every train row would " +
        "silently vanish; pass the eval suite or skip the stage")
    val tq = math.round(threshold * 1.0e9)
    val tr = train.select(col(idCol).as("train_id"), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
    val ev = evalSet.select(col(idCol).as("eval_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(expr("vec_dot(qv, qv)")))
    tr.join(broadcast(ev), lit(true))
      .withColumn("simq", round(expr("vec_dot(v, qv)") /
        (col("nrm") * col("qn")) * lit(1.0e9)).cast(LongType))
      .groupBy(col("train_id"))
      .agg(min_by(struct(col("eval_id"), col("simq")),
        struct((-col("simq")).as("s"), col("eval_id").as("e"))).as("__best"))
      .select(col("train_id"), col("__best.eval_id").as("top_eval_id"),
        (col("__best.simq").cast(DoubleType) / lit(1.0e9)).as("top_cos"),
        (col("__best.simq") >= lit(tq)).as("contaminated"))
  }

  /** Reciprocal nearest neighbors across two sets (q241) — pairs (a, b)
    * where b is a's top-1 AND a is b's top-1: the mutual-best rule that
    * hubness cannot fool (a hub vector is many items' top-1 but has only
    * one top-1 itself), the strict sibling of margin-based mining
    * (q206). Standard as the high-precision alignment filter in bitext
    * mining and cross-modal pair curation.
    *
    * Both argmaxes reduce the SAME scored lineage through keyed min_by
    * aggregates (map-side partial; the pair stream is never materialized
    * or shuffled), then one equi-join keeps mutual pairs. Similarities
    * nano-quantized → engine-exact ties (then min partner id). Brute
    * force O(|A|·|B|) with the smaller side broadcast — at corpus scale
    * generate candidates with the LSH/IVF paths and apply the same
    * mutual rule to the candidate set. */
  def reciprocalNearestNeighbors(a: DataFrame, b: DataFrame,
      vecCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(a.sparkSession)
    val av = a.select(col(idCol).as("a_id"), col(vecCol).as("v"))
      .withColumn("an", sqrt(expr("vec_dot(v, v)")))
    val bv = b.select(col(idCol).as("b_id"), col(vecCol).as("qv"))
      .withColumn("bn", sqrt(expr("vec_dot(qv, qv)")))
    val scored = av.join(broadcast(bv), lit(true))
      .withColumn("simq", round(expr("vec_dot(v, qv)") /
        (col("an") * col("bn")) * lit(1.0e9)).cast(LongType))
      .select(col("a_id"), col("b_id"), col("simq"))
    val bestB = scored.groupBy(col("a_id"))
      .agg(min_by(struct(col("b_id"), col("simq")),
        struct((-col("simq")).as("s"), col("b_id").as("t"))).as("__m"))
      .select(col("a_id"), col("__m.b_id").as("b_id"),
        col("__m.simq").as("simq"))
    val bestA = scored.groupBy(col("b_id"))
      .agg(min_by(col("a_id"),
        struct((-col("simq")).as("s"), col("a_id").as("t"))).as("a_id"))
    // bestA is one row per b-side unit (the already-broadcast side) —
    // broadcasting it keeps the mutual check shuffle-free
    bestB.join(broadcast(bestA), Seq("a_id", "b_id"))
      .select(col("a_id"), col("b_id"),
        (col("simq").cast(DoubleType) / lit(1.0e9)).as("cos"))
  }

  /** Feature hashing — the "hashing trick" (Weinberger et al. 2009):
    * fixed-dimension sparse bag-of-words features with NO vocabulary
    * pass — token → dimension by hash, ±1 sign by an independent hash
    * bit so collisions cancel in expectation. The standard featurizer
    * for linear classifiers / quality scorers over unbounded vocabulary
    * at corpus scale (Vowpal-Wabbit-style).
    *
    * Output: (doc_id, dim, weight) for nonzero weights. Shape: one
    * per-row projection + ONE keyed aggregate — no vocabulary table, no
    * broadcast, nothing proportional to vocab size anywhere. Hashes are
    * md5-derived (md5_lower64, the q189 device), so features are
    * deterministic cross-run, cross-engine, and append-stable. */
  def featureHash(df: DataFrame, textCol: String, idCol: String,
      dims: Int = 64): DataFrame = {
    require(dims >= 2, s"featureHash needs dims >= 2, got $dims")
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("__t"))
      .filter(col("__t") =!= "")
      .withColumn("dim", call_function("md5_lower64", col("__t"))
        .bitwiseAND(lit(Long.MaxValue)) % dims)
      .withColumn("__sgn", call_function("md5_lower64",
        concat(lit("s:"), col("__t"))).bitwiseAND(lit(1L)) * lit(2L) - lit(1L))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("__sgn")).as("weight"))
      .filter(col("weight") =!= 0L)
  }

  /** Wald sequential probability ratio test (q243) — the early-stopping
    * A/B gate: walk the cumulative log-likelihood ratio of H1 (rate p1)
    * vs H0 (rate p0) over the ordered observation stream and stop at
    * the first boundary crossing (accept H1 at ln((1−β)/α), H0 at
    * ln(β/(1−α))). Reports where the test WOULD have stopped plus the
    * final state — the audit for "how much earlier could this
    * experiment have ended".
    *
    * Exactness: the two per-step increments and both thresholds are
    * nano-quantized ONCE (driver-side constants), so the walk is an
    * exact integer prefix sum — [[globalCumSum]]'s partition-offset
    * pattern, never a one-partition window. The crossing argmin and the
    * final value are keyed aggregates over the walk. `orderCols` must
    * be a total order. */
  def sprtTest(df: DataFrame, labelCol: String, orderCols: Seq[String],
      p0: Double, p1: Double, alpha: Double = 0.05,
      beta: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      s"sprtTest needs distinct rates in (0,1), got p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"sprtTest needs alpha, beta in (0,1), got $alpha, $beta")
    val l1 = math.round(math.log(p1 / p0) * 1e9)
    val l0 = math.round(math.log((1 - p1) / (1 - p0)) * 1e9)
    val aq = math.round(math.log((1 - beta) / alpha) * 1e9)
    val bq = math.round(math.log(beta / (1 - alpha)) * 1e9)
    val base = df.select(
      orderCols.map(col) :+ col(labelCol).cast(LongType).as("__x"): _*)
      .withColumn("__inc",
        when(col("__x") === 1L, lit(l1)).otherwise(lit(l0)))
    val walk = globalCumSum(globalRank(base, orderCols, "grank"),
      Seq("grank"), "__inc", "llr_q")
    val crossed = col("llr_q") >= lit(aq) || col("llr_q") <= lit(bq)
    val tot = walk.agg(count(lit(1)).as("n"),
      max_by(col("llr_q"), col("grank")).as("__final_q"))
    val cross = walk.filter(crossed)
      .agg(min(col("grank")).as("first_cross_n"),
        min_by(col("llr_q"), col("grank")).as("__cross_q"))
    tot.crossJoin(cross)
      .select(col("n"), col("first_cross_n"),
        when(col("first_cross_n").isNull, lit("continue"))
          .when(col("__cross_q") >= lit(aq), lit("accept_h1"))
          .otherwise(lit("accept_h0")).as("decision"),
        (col("__cross_q").cast(DoubleType) / lit(1.0e9)).as("llr_at_cross"),
        (col("__final_q").cast(DoubleType) / lit(1.0e9)).as("llr_final"))
  }

  /** Difference-in-differences estimator (q244) — the observational
    * causal baseline: DiD = (ȳ_treated,post − ȳ_treated,pre) −
    * (ȳ_control,post − ȳ_control,pre), which nets out both the group
    * gap and the common time trend (parallel-trends assumption).
    *
    * ONE keyed aggregate reduces any row count to 4 cells (exact cents
    * sums, the q166 device); the report is cell arithmetic — four
    * single double divisions and one fixed chain. */
  def diffInDiff(df: DataFrame, treatedCol: String, postCol: String,
      valueCol: String): DataFrame = {
    val b = df.filter(col(valueCol).isNotNull)
      .select(col(treatedCol).cast(LongType).as("__t"),
        col(postCol).cast(LongType).as("__p"),
        round(col(valueCol) * lit(100.0)).cast(LongType).as("__vc"))
    val cells = b.groupBy(col("__t"), col("__p"))
      .agg(count(lit(1)).as("__n"), sum(col("__vc")).as("__s"))
    def m(tv: Int, pv: Int): Column = {
      val pick = col("__t") === tv && col("__p") === pv
      max(when(pick, col("__s"))).cast(DoubleType) /
        (lit(100.0) * max(when(pick, col("__n"))).cast(DoubleType))
    }
    def n(tv: Int, pv: Int): Column =
      coalesce(max(when(col("__t") === tv && col("__p") === pv,
        col("__n"))), lit(0L))
    cells.agg(
      n(0, 0).as("n_c_pre"), n(0, 1).as("n_c_post"),
      n(1, 0).as("n_t_pre"), n(1, 1).as("n_t_post"),
      m(0, 0).as("mean_c_pre"), m(0, 1).as("mean_c_post"),
      m(1, 0).as("mean_t_pre"), m(1, 1).as("mean_t_post"),
      ((m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0))).as("did"))
  }

  /** Guard for operators that rank/stratify with integer arithmetic
    * ([[qiniByDecile]], [[stratifiedAte]], [[ipwAte]]): a fractional
    * score or covariate would truncate to 0 under a silent LongType
    * cast and the output would be meaningless with no error. Callers
    * quantize explicitly (e.g. `round(score * 1000).cast("long")`). */
  private def requirePreQuantized(df: DataFrame, colName: String,
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
  private def logisticTrainTrace(f: DataFrame, yDf: DataFrame,
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

  private def logisticTrainQ(f: DataFrame, yDf: DataFrame,
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
