package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-signature kernels as native codegen'd expressions.
  *
  * `simhash64(tokens)` computes the whole 64-bit SimHash signature in a
  * single pass over a document's token array — replacing the previous
  * 64-separate-`sum(when(...))`-aggregates-over-exploded-words plan, which
  * shuffled every (doc, word) pair and did 64× redundant aggregate work
  * (the `vec_dot` playbook from VecExpressions applied to text).
  *
  * The per-word hash is the low 64 bits of MD5 — bytes 8..15 of the digest,
  * little-endian — chosen because DuckDB exposes exactly this value as
  * `md5_number_lower(w)`, which makes the whole signature reproducible in
  * ANSI-ish SQL and lets the simhash query graduate from rows-only to a
  * hash-matched oracle check.
  */
object TextKernels {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Fixed BPE merge table (learned-vocab shape: production tokenizers
    * apply a SHIPPED merge list, they don't retrain per corpus). Order is
    * priority order, applied sequentially — the standard BPE apply. */
  val BpeMerges: Array[(String, String)] = Array(
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"), ("r", "e"),
    ("o", "n"), ("a", "t"), ("e", "n"), ("o", "r"), ("t", "i"), ("an", "d"),
    ("s", "t"), ("e", "s"), ("in", "g"), ("o", "u"))

  /** REAL byte-pair-encoding token count: each word becomes a token
    * sequence in `|tok|` wrapped form (`|h||i|`), merges apply in priority
    * order as literal left-to-right non-overlapping replaces
    * (`|t||h|` → `|th|`) — the wrapper makes a pair match impossible
    * except at true token boundaries, and `String.replace` has the exact
    * semantics of SQL `replace`, so a DuckDB oracle reproduces the count
    * from the same merge table. Tokens per word = `||` separators + 1. */
  def bpeCount(s: UTF8String): Long = {
    val text = s.toString.trim
    if (text.isEmpty) return 0L
    var total = 0L
    var start = 0
    val n = text.length
    while (start < n) {
      var end = text.indexOf(' ', start)
      if (end < 0) end = n
      if (end > start) {
        val word = text.substring(start, end)
        val sb = new java.lang.StringBuilder(word.length * 3)
        var i = 0
        while (i < word.length) { sb.append('|').append(word.charAt(i)).append('|'); i += 1 }
        var w = sb.toString
        var m = 0
        while (m < BpeMerges.length) {
          val (a, b) = BpeMerges(m)
          w = w.replace("|" + a + "||" + b + "|", "|" + a + b + "|")
          m += 1
        }
        var toks = 1L
        var j = w.indexOf("||")
        while (j >= 0) { toks += 1; j = w.indexOf("||", j + 2) }
        total += toks
      }
      start = end + 1
    }
    total
  }

  /** Unicode NFC (canonical composition) — the normalization every corpus
    * pass runs before hashing/dedup so `é` (U+00E9) and `e`+`´`
    * (U+0065 U+0301) stop being distinct training tokens. Pure-ASCII
    * strings short-circuit without allocating (the overwhelmingly common
    * case in web corpora — and a cheap one-pass byte scan here). Matches
    * DuckDB's `nfc_normalize`. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
  }

  /** Low 64 bits of MD5(word-utf8), little-endian (== DuckDB
    * `md5_number_lower`, bit-for-bit including the sign bit pattern). */
  def md5Lower64(w: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(w.getBytes)
    var h = 0L
    var j = 0
    while (j < 8) { h |= (digest(8 + j) & 0xFFL) << (8 * j); j += 1 }
    h
  }

  /** One-pass SimHash over the DISTINCT tokens of the array (null tokens
    * ignored). Ties (bit-count 0) resolve to bit 0, matching the SQL twin's
    * `> 0` test. */
  def simhash64(arr: ArrayData): Long = {
    val seen = new java.util.HashSet[UTF8String]()
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        if (seen.add(w)) {
          val h = md5Lower64(w)
          var b = 0
          while (b < 64) {
            counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** Shingle/MinHash kernels. Motivation (measured at sf0.1): the
  * plan-level shingle pipeline — `transform(sequence(...), i ->
  * concat_ws(...))` HOF + a global `distinct()` — cost ~1.7s per
  * evaluation and was recomputed up to 6× per dedup query (exchange reuse
  * does not fire across differently-keyed consumers). These kernels make
  * shingling a cheap codegen'd projection, so recomputation is free and
  * the distinct shuffle disappears entirely (dedup happens in-array,
  * per row).
  */
object ShingleKernels {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** Distinct word n-gram shingles of a document, NUL-joined (a '_'
    * joiner collides for words containing '_': ["a_b","c"] and
    * ["a","b_c"] would shingle identically; NUL cannot appear in
    * whitespace-split tokens) — equal to the former plan-level
    * `split(trim(text),'\s+')` → transform → distinct, as a single
    * pass. Spark-`trim` semantics (spaces only). */
  def shingleSet(text: UTF8String, n: Int): ArrayData = {
    val toks = text.trim().toString.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append('\u0000').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  // MinHash family: 128 min-wise hashes h_j(s) = xxhash64(xxhash64(s), seed=j),
  // banded 32×4. Re-hashing the shingle's 64-bit hash under 128 distinct
  // seeds gives (approximately) independent uniform draws per permutation.
  // NOTE: the earlier affine family (a*x + b) mod (2^61-1) over a 32-bit x
  // was defective — a*x < 2^62 < 2P wraps the modulus at most once, so all
  // 128 "permutations" were nearly monotone in x and highly correlated; a
  // single new small-x shingle could flip most signature slots at once
  // (observed: a J=0.98 pair sharing 0 of 32 bands).
  val NumHashes = 128
  val Bands = 32

  /** The 32 LSH band hashes of a shingle set, one pass: min-hash all 128
    * seeded hashes over the shingles, then mix each 4-signature band into
    * one long. Empty input → empty array (doc can never be a candidate). */
  def minhashBands(shingles: ArrayData): ArrayData = {
    val m = shingles.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val x = XXH64.hashUTF8String(shingles.getUTF8String(i), 42L)
      var j = 0
      while (j < NumHashes) {
        val h = XXH64.hashLong(x, j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    val bands = new Array[Any](Bands)
    var bi = 0
    while (bi < Bands) {
      var bh = XXH64.hashLong(mins(4 * bi), 42L + bi)
      var r = 1
      while (r < 4) { bh = XXH64.hashLong(mins(4 * bi + r), bh); r += 1 }
      bands(bi) = bh
      bi += 1
    }
    new GenericArrayData(bands)
  }

  /** All ordered pairs (a[i], a[j]) with i < j of a sorted long array, as
    * struct(da, db). Caller bounds |a| (e.g. via a shingle-df cap), so the
    * output is ≤ C(cap, 2) per row. */
  def arrayPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, arr.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** shingle_set(text, n) → array<string>: distinct word n-grams. */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  protected override def nullSafeEval(a: Any): Any =
    ShingleKernels.shingleSet(a.asInstanceOf[UTF8String], n)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ShingleKernels.shingleSet($a, $n)")

  protected override def withNewChildInternal(c: Expression): ShingleSet =
    copy(child = c)
}

/** minhash_bands(shingles) → array<long>: 32 LSH band hashes. */
case class MinHashBands(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  protected override def nullSafeEval(a: Any): Any =
    ShingleKernels.minhashBands(a.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ShingleKernels.minhashBands($a)")

  protected override def withNewChildInternal(c: Expression): MinHashBands =
    copy(child = c)
}

/** array_pairs(sorted array<long>) → array<struct<da,db>>: i<j pairs. */
case class ArrayPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("da", LongType, nullable = false),
      StructField("db", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "array_pairs"

  protected override def nullSafeEval(a: Any): Any =
    ShingleKernels.arrayPairs(a.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ShingleKernels.arrayPairs($a)")

  protected override def withNewChildInternal(c: Expression): ArrayPairs =
    copy(child = c)
}

/** md5_lower64(string) → long: low 64 bits of MD5, little-endian — the
  * bit pattern DuckDB exposes as `md5_number_lower`, which makes
  * hash-derived columns (dedup keys, split buckets, sample gates)
  * reproducible in ANSI-ish SQL across engines. */
case class Md5Lower64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_lower64"

  protected override def nullSafeEval(a: Any): Any =
    TextKernels.md5Lower64(a.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.md5Lower64($a)")

  protected override def withNewChildInternal(c: Expression): Md5Lower64 =
    copy(child = c)
}

/** One-pass text statistics: every count q30/q31 need, from a single scan
  * over the string's code points — replacing 2–3 `java.util.regex` passes
  * per document (measured: the regex formulation was the slowest linear op
  * in the bench). Character classes mirror the exact regex semantics the
  * DuckDB oracle still runs, so swapping the implementation cannot move
  * the oracle:
  *  - whitespace  = Java `\s` = [ \t\n\x0B\f\r]
  *  - ws_tokens   = maximal non-whitespace runs        (`\S+`)
  *  - bpe_tokens  = maximal ASCII letter runs + maximal digit runs +
  *                  one per other non-ws char          (`[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`)
  *  - n_punct     = non-alnum non-ws code points       (`[^A-Za-z0-9\s]`)
  *  - n_stop      = maximal word runs whose lowercase equals a stopword —
  *                  exactly the strings `\b(the|a|of|and|is|in|to)\b`
  *                  matches on lower(text). NB java.util.regex's `\b`
  *                  boundary class is `'_' || Character.isLetterOrDigit`
  *                  (Unicode), NOT the ASCII `\w` — so `aé` contains no
  *                  boundary and counts zero stopwords (property-tested
  *                  against the regex in TextStatsSpec)
  *  - char_len    = code points (Spark `length` / DuckDB `length`)
  */
object TextStatsKernel {
  // \b(the|a|of|and|is|in|to)\b — all ≤ 3 chars, so a run longer than 3
  // can never match and needs no buffering.
  private def isStop(c0: Char, c1: Char, c2: Char, len: Int): Boolean = len match {
    case 1 => c0 == 'a'
    case 2 => (c0 == 'o' && c1 == 'f') || (c0 == 'i' && (c1 == 's' || c1 == 'n')) ||
      (c0 == 't' && c1 == 'o')
    case 3 => (c0 == 't' && c1 == 'h' && c2 == 'e') || (c0 == 'a' && c1 == 'n' && c2 == 'd')
    case _ => false
  }

  def textStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val n = s.length
    var wsTokens = 0L; var bpeTokens = 0L; var nPunct = 0L; var nStop = 0L
    var charLen = 0L
    var inTok = false      // inside a \S+ run
    var inLetter = false   // inside an [A-Za-z]+ run
    var inDigit = false    // inside a [0-9]+ run
    var wordLen = 0        // current \w run length (capped at 4)
    var w0 = ' '; var w1 = ' '; var w2 = ' '
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var step = 1
      var cp: Int = c
      if (Character.isHighSurrogate(c) && i + 1 < n && Character.isLowSurrogate(s.charAt(i + 1))) {
        cp = Character.toCodePoint(c, s.charAt(i + 1)); step = 2
      }
      charLen += 1
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
      val letter = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
      val digit = cp >= '0' && cp <= '9'
      // \b's word class (see scaladoc): Unicode letter-or-digit, plus '_'
      val word = cp == '_' || Character.isLetterOrDigit(cp)
      if (!ws && !inTok) wsTokens += 1
      inTok = !ws
      if (letter && !inLetter) bpeTokens += 1
      inLetter = letter
      if (digit && !inDigit) bpeTokens += 1
      inDigit = digit
      if (!ws && !letter && !digit) { nPunct += 1; bpeTokens += 1 }
      if (word) {
        val lc = if (cp >= 'A' && cp <= 'Z') (cp + 32).toChar else c
        if (wordLen == 0) w0 = lc else if (wordLen == 1) w1 = lc else if (wordLen == 2) w2 = lc
        if (wordLen < 4) wordLen += 1
      } else {
        if (wordLen > 0 && isStop(w0, w1, w2, wordLen)) nStop += 1
        wordLen = 0
      }
      i += step
    }
    if (wordLen > 0 && isStop(w0, w1, w2, wordLen)) nStop += 1
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](wsTokens, bpeTokens, nPunct, nStop, charLen))
  }
}

/** text_stats(string) → struct<ws_tokens,bpe_tokens,n_punct,n_stop,char_len>. */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"

  protected override def nullSafeEval(a: Any): Any =
    TextStatsKernel.textStats(a.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextStatsKernel.textStats($a)")

  protected override def withNewChildInternal(c: Expression): TextStats =
    copy(child = c)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("ws_tokens", LongType, nullable = false),
    StructField("bpe_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("char_len", LongType, nullable = false)))
}

/** One-pass per-row codepoint histogram moments — the inputs to
  * collision/Rényi-2 entropy (a gibberish/low-diversity quality signal).
  * Only integer moments leave the kernel (n, distinct, Σcnt²); the one
  * log call happens downstream on an exact rational, so the result is
  * deterministic and exactly reproducible by a SQL oracle. ASCII counts
  * live in a flat array; the rare non-ASCII tail spills to a map. */
object CharStatsKernel {
  def charStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val n = s.length
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, java.lang.Long] = null
    var total = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var cp: Int = c
      var step = 1
      if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
        cp = Character.toCodePoint(c, s.charAt(i + 1)); step = 2
      }
      total += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap()
        val prev = other.get(cp)
        other.put(cp, if (prev == null) 1L else prev + 1L)
      }
      i += step
    }
    var distinct = 0L
    var sumSq = 0L
    var j = 0
    while (j < 128) {
      val cj = ascii(j)
      if (cj > 0) { distinct += 1; sumSq += cj * cj }
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { val cv = it.next(); distinct += 1; sumSq += cv * cv }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, distinct, sumSq))
  }
}

/** char_stats(string) → struct<n_chars,n_distinct,sum_sq>. */
case class CharStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = CharStats.schema
  override def prettyName: String = "char_stats"

  protected override def nullSafeEval(a: Any): Any =
    CharStatsKernel.charStats(a.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CharStatsKernel.charStats($a)")

  protected override def withNewChildInternal(c: Expression): CharStats =
    copy(child = c)
}

object CharStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))
}

/** simhash64(array<string>) → long: full SimHash signature per row. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(a: Any): Any =
    TextKernels.simhash64(a.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.simhash64($a)")

  protected override def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** bpe_count(string) → long: token count under the fixed BPE merge table
  * (TextKernels.BpeMerges), codegen'd per-row. */
case class BpeCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  protected override def nullSafeEval(a: Any): Any =
    TextKernels.bpeCount(a.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.bpeCount($a)")

  protected override def withNewChildInternal(c: Expression): BpeCount =
    copy(child = c)
}

/** nfc_normalize(string) → string: Unicode canonical composition (see
  * TextKernels.nfcNormalize); name-twin of DuckDB's builtin. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(a: Any): Any =
    TextKernels.nfcNormalize(a.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.nfcNormalize($a)")

  protected override def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** Clipped n-gram overlap kernels — the match-counting half of
  * BLEU/chrF/ROUGE (q271/q272/q278/q279) as single-pass per-pair
  * functions. Motivation (measured at sf0.1): the plan-level device —
  * explode every 1..maxN-gram of BOTH sides to rows, shuffle to
  * per-(pair, n, gram) counts, LEFT-join cand to ref — cost 21 s for
  * chrF and 11 s for self-BLEU, all of it gram-row explode + exchange.
  * The clipped match count sum_g min(cand(g), ref(g)) only ever needs
  * the two strings of ONE pair at a time, so it belongs in a codegen'd
  * kernel (the ShingleKernels playbook): one hash map over the ref
  * grams, one clipped-decrement sweep over the cand grams, zero
  * shuffled gram rows. Counts are exactly the multiset-intersection
  * integers of the old plan — the DuckDB oracles gate the rewrite
  * unchanged.
  */
object OverlapKernels {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Clipped CHARACTER n-gram matches for n = 1..maxN between two
    * strings, by CODEPOINT (the `substr` semantics both engines use).
    * Returns a maxN-length long array m(1)..m(maxN). */
  def charClippedMatches(cand: UTF8String, ref: UTF8String, maxN: Int): ArrayData = {
    val cc = toCodePoints(cand)
    val rc = toCodePoints(ref)
    val out = new Array[Any](maxN)
    var n = 1
    while (n <= maxN) {
      out(n - 1) = java.lang.Long.valueOf(clippedCp(cc, rc, n))
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Clipped TOKEN n-gram matches for n = 1..maxN between two token
    * arrays (space-joined gram keys — tokens are whitespace-split, so a
    * space cannot occur inside one). */
  def tokenClippedMatches(cand: ArrayData, ref: ArrayData, maxN: Int): ArrayData = {
    val ct = toStrings(cand)
    val rt = toStrings(ref)
    val out = new Array[Any](maxN)
    var n = 1
    while (n <= maxN) {
      out(n - 1) = java.lang.Long.valueOf(clippedTok(ct, rt, n))
      n += 1
    }
    new GenericArrayData(out)
  }

  private def toCodePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  private def toStrings(a: ArrayData): Array[String] = {
    val out = new Array[String](a.numElements())
    var i = 0
    while (i < out.length) { out(i) = a.getUTF8String(i).toString; i += 1 }
    out
  }

  private def clippedCp(cc: Array[Int], rc: Array[Int], n: Int): Long = {
    if (cc.length < n || rc.length < n) return 0L
    val refCounts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i <= rc.length - n) {
      val g = new String(rc, i, n)
      val c = refCounts.get(g)
      refCounts.put(g, if (c == null) 1 else c + 1)
      i += 1
    }
    var m = 0L
    i = 0
    while (i <= cc.length - n) {
      val g = new String(cc, i, n)
      val left = refCounts.get(g)
      if (left != null && left > 0) { m += 1; refCounts.put(g, left - 1) }
      i += 1
    }
    m
  }

  private def clippedTok(ct: Array[String], rt: Array[String], n: Int): Long = {
    if (ct.length < n || rt.length < n) return 0L
    def gram(a: Array[String], i: Int): String = {
      val sb = new java.lang.StringBuilder(a(i))
      var j = 1
      while (j < n) { sb.append(' ').append(a(i + j)); j += 1 }
      sb.toString
    }
    val refCounts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i <= rt.length - n) {
      val g = gram(rt, i)
      val c = refCounts.get(g)
      refCounts.put(g, if (c == null) 1 else c + 1)
      i += 1
    }
    var m = 0L
    i = 0
    while (i <= ct.length - n) {
      val g = gram(ct, i)
      val left = refCounts.get(g)
      if (left != null && left > 0) { m += 1; refCounts.put(g, left - 1) }
      i += 1
    }
    m
  }
}

/** char_clipped_matches(cand, ref) → array<long>(maxN): per-order clipped
  * character n-gram match counts (chrF's m1..mN) in one pass. */
case class CharClippedMatches(left: Expression, right: Expression, maxN: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_clipped_matches"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    OverlapKernels.charClippedMatches(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], maxN)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.OverlapKernels.charClippedMatches($a, $b, $maxN)")

  protected override def withNewChildrenInternal(l: Expression, r: Expression)
      : CharClippedMatches = copy(left = l, right = r)
}

/** token_clipped_matches(cand, ref) → array<long>(maxN): per-order clipped
  * token n-gram match counts (BLEU's / ROUGE's m1..mN) in one pass. */
case class TokenClippedMatches(left: Expression, right: Expression, maxN: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_clipped_matches"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    OverlapKernels.tokenClippedMatches(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], maxN)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.OverlapKernels.tokenClippedMatches($a, $b, $maxN)")

  protected override def withNewChildrenInternal(l: Expression, r: Expression)
      : TokenClippedMatches = copy(left = l, right = r)
}
