package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Util._

/** Document deduplication suite (north-star LLM-pipeline surface).
  *
  * Exact dedup      — hash-groupBy on normalized text (one shuffle).
  * N-gram Jaccard   — word-trigram shingles, shingle-equality self-join,
  *                    integer cross-multiplied threshold (5*I >= 4*U ⇔
  *                    J >= 0.8) so no float compare is involved.
  * MinHash + LSH    — 128 permutations, 32 bands × 4 rows, banded bucket
  *                    join for candidates, then EXACT Jaccard verification
  *                    of candidates only. At the 0.8 threshold the planted
  *                    near-dups (J≈0.97) are caught with prob 1-1e-30, so
  *                    the output equals the exact-Jaccard pair set and is
  *                    oracle-checkable.
  * SimHash          — 64-bit signature over word hashes; 4×16-bit band join
  *                    (pigeonhole: hamming<=3 ⇒ some 16-bit chunk equal),
  *                    exact hamming via bit_count(xor).
  *
  * Scale notes (100 TB): shingle self-joins shuffle on the shingle hash —
  * the classic skew risk is stop-shingles; MinHash-LSH is the scale path
  * (candidates ∝ true dups, not n^2). All stages are partial-agg friendly;
  * no driver-side materialization anywhere.
  */
object Dedup {

  /** Word tokens of the trimmed text (single shuffle-free projection). */
  private def tokens(df: DataFrame): DataFrame =
    df.select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))

  /** Distinct word-trigram shingles per doc. */
  private[operators] def shingles(s: SparkSession, dir: String): DataFrame =
    tokens(t(s, dir, "documents"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(t) - 3), i -> concat_ws('_', t[i], t[i+1], t[i+2]))")).as("s"))
      .distinct()

  private val P = (1L << 61) - 1
  private val NumHashes = 128
  private val Bands = 32 // 4 rows per band
  /** Deterministic permutation coefficients (fixed seed, a < 2^30 so
    * a * (hash & 0xFFFFFFFF) + b stays within a signed 64-bit long). */
  private val coefs: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumHashes)((1L + rnd.nextInt(1 << 30).toLong, rnd.nextInt(1 << 30).toLong))
  }

  /** MinHash signatures: one row per doc, h0..h127. */
  private[operators] def minhashSigs(sh: DataFrame): DataFrame = {
    val hashed = sh.select(col("doc_id"), xxhash64(col("s")).bitwiseAND(lit(0xFFFFFFFFL)).as("x"))
    val aggs = coefs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("x") * a + b, lit(P))).as(s"h$i")
    }
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Parametric MinHash+LSH near-dup pipeline (the public API entry):
    * banded signature buckets → candidate pairs → exact Jaccard verify on
    * candidates only, at `num/den` threshold. One shared distinct-shingle
    * subplan feeds signatures, sizes and verification (ReusedExchange);
    * the candidate list is broadcast so the shingle table never
    * reshuffles. */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
      num: Int, den: Int): DataFrame = {
    val sh = graft.api.Graft.shingles(df, textCol, idCol)
      .withColumnRenamed("__id", "doc_id")
    val sigs = minhashSigs(sh)
    val bandCols = (0 until Bands).map { bi =>
      hash((4 * bi until 4 * bi + 4).map(j => col(s"h$j")): _*).as(s"b$bi")
    }
    val banded = sigs.select(col("doc_id") +: bandCols: _*)
    val longForm = banded.select(col("doc_id"),
      posexplode(array((0 until Bands).map(i => col(s"b$i")): _*)).as(Seq("band", "bh")))
    val cands = longForm.alias("a")
      .join(longForm.alias("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val shA = sh.select(col("doc_id").as("da"), col("s"))
    val shB = sh.select(col("doc_id").as("db"), col("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = broadcast(shA.join(broadcast(cands), "da")).join(shB, Seq("db", "s"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(lit(den) * col("i") >= lit(num) * (col("na") + col("nb") - col("i")))
      .select(col("da"), col("db"), col("i"), col("na"), col("nb"),
        (col("i") / (col("na") + col("nb") - col("i"))).as("jac"))
  }

  val queries: Map[String, Q] = Map(
    // ---- q23: exact dedup on normalized text ----
    "q23_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))
    }),

    // ---- q24: exact n-gram Jaccard near-dup pairs (J >= 0.8) ----
    "q24_dedup_ngram_jaccard" -> ((s, dir) => {
      graft.api.Graft.nearDupPairsExact(t(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("da"), col("db"))
    }),

    // ---- q25: MinHash + LSH candidates, exact-verified (J >= 0.8) ----
    "q25_dedup_minhash_lsh" -> ((s, dir) => {
      minhashPairs(t(s, dir, "documents"), "text", "doc_id", 4, 5)
        .select(col("da"), col("db"), col("jac"))
        .orderBy(col("da"), col("db"))
    }),

    // ---- q26: SimHash near-dup pairs (hamming <= 3); rows-only check ----
    "q26_dedup_simhash" -> ((s, dir) => {
      val words = tokens(t(s, dir, "documents"))
        .select(col("doc_id"), explode(col("t")).as("w")).distinct()
        .select(col("doc_id"), xxhash64(col("w")).as("h"))
      val bitSums = (0 until 64).map { j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"c$j")
      }
      val signed = words.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      val simhash = (0 until 64).map { j =>
        when(col(s"c$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
      }.reduce[Column](_ bitwiseOR _)
      val chunks = (0 until 4).map { k =>
        shiftright(col("sig"), 16 * k).bitwiseAND(lit(0xFFFFL)).as(s"k$k")
      }
      val sigs = signed.select(col("doc_id"), simhash.as("sig"))
        .select(col("doc_id") +: col("sig") +: chunks: _*)
      val pairs = (0 until 4).map { k =>
        sigs.alias("a").join(sigs.alias("b"),
          col(s"a.k$k") === col(s"b.k$k") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
            col("a.sig").as("sa"), col("b.sig").as("sb"))
      }.reduce(_ unionAll _).distinct()
      pairs
        .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast(LongType))
        .filter(col("hamming") <= 3)
        .select(col("da"), col("db"), col("hamming"))
        .orderBy(col("da"), col("db"))
    })
  )

  /** DuckDB twins. q24/q25 share the exact-Jaccard pair oracle (LSH recall
    * at J≈0.97 under 32x4 banding is 1 - ~1e-30, verified empirically on
    * the deterministic testdata). q26 is rows-only (no SQL twin). */
  private val exactJaccardPairsSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, t[i] || '_' || t[i+1] || '_' || t[i+2] AS s
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i FROM toks)
      |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT da, db, i, sa.n AS na, sb.n AS nb, i / (sa.n + sb.n - i) AS jac
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = da
      |JOIN sizes sb ON sb.doc_id = db
      |WHERE 5 * i >= 4 * (sa.n + sb.n - i)
      |ORDER BY da, db""".stripMargin

  val oracle: Map[String, String] = Map(
    "q23_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |ORDER BY keep_id""".stripMargin,
    "q24_dedup_ngram_jaccard" -> exactJaccardPairsSql,
    "q25_dedup_minhash_lsh" ->
      // Same pair set as q24 (see recall argument above), pairs+jac only.
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, t[i] || '_' || t[i+1] || '_' || t[i+2] AS s
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i FROM toks)
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db, i / (sa.n + sb.n - i) AS jac
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = da
        |JOIN sizes sb ON sb.doc_id = db
        |WHERE 5 * i >= 4 * (sa.n + sb.n - i)
        |ORDER BY da, db""".stripMargin
  )
}
