package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** `kmv_agg(hash)` — KMV (k-minimum-values) distinct sketch: the k
  * smallest DISTINCT 64-bit hash values seen by the group, as a sorted
  * ascending array.
  *
  * Why this aggregate exists (vs the Datasketches HLL family q41/q104
  * already exercises): KMV sketches support SET ALGEBRA with exact,
  * engine-replayable semantics. The merge of two KMV sketches — the k
  * smallest of the union of their elements — IS the KMV sketch of the
  * union of the underlying sets (every hash below the union threshold
  * is below both input thresholds, so no element can be missing), and
  * membership of a union-sketch element in an input set can be decided
  * from the input's sketch alone (h ≤ τ_union ≤ τ_input, and a KMV
  * sketch contains ALL of its set's hashes ≤ its own threshold). That
  * closure property is what q184 gates: the DuckDB oracle recomputes
  * the pair-union sketches from raw shingles while the Spark plan
  * builds them from per-source sketches only — identical output proves
  * the algebra, not just the arithmetic.
  *
  * Determinism: the result is a pure function of the input's distinct
  * hash SET — insertion and merge order cannot change "the k smallest"
  * — so unlike register-based sketches in coupon/HLL mixed modes (see
  * q104's lgK note) a KMV output is partition-layout-invariant and can
  * be hash-gated at ANY cardinality, not only below a promotion
  * threshold.
  *
  * Scale shape: an `Aggregator`, so Spark plans partial+final
  * aggregation — per-partition buffers are capped at k longs, only k
  * values per partition per group cross the shuffle, merge is an
  * O(k) sorted-array merge. k=128 ⇒ a 1 KiB sketch summarizes any
  * cardinality; 20 sources at 100 TB is 20 KiB of driver-visible
  * state for a full pairwise overlap matrix that would otherwise cost
  * a shingle-keyed shuffle of the corpus (q114's exact form).
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"kmv_agg: k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present — sketch is a set
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) { // displaces the current k-th minimum
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf // h above the threshold — not one of the k smallest
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 } // drop cross-side dups
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** `topk_agg(value, id)` — the k largest (value, id) rows of a group by
  * (value DESC, id ASC), as a sorted array of structs.
  *
  * Why an Aggregator and not a rank window: the window form
  * (`row_number() over (partition by g order by v desc)` ≤ k) SORTS
  * every group's full row set — at 100 TB the sort+spill of the
  * non-surviving rows IS the cost. This aggregate keeps a k-bounded
  * buffer per group per partition, map-side combines before the
  * shuffle, and merges two buffers in O(k) — only k rows per partition
  * per group ever cross the wire, and nothing is globally sorted.
  * Duplicate (value, id) rows are kept (multiset top-k, matching what
  * the rank window would emit for duplicated inputs).
  *
  * Determinism: the composite order (value desc, id asc) is total when
  * ids are unique per row, so the retained set and its order are pure
  * functions of the group's row multiset — hash-gateable. */
class TopKPairAgg(k: Int) extends Aggregator[
    (Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {
  require(k > 0, s"topk_agg: k must be positive, got $k")

  // ordering: v desc, then id asc — "better" = earlier in the buffer
  private def beats(v1: Long, i1: Long, v2: Long, i2: Long): Boolean =
    v1 > v2 || (v1 == v2 && i1 < i2)

  override def zero: Array[(Long, Long)] = Array.empty

  override def reduce(buf: Array[(Long, Long)], x: (Long, Long)): Array[(Long, Long)] = {
    if (buf.length == k && !beats(x._1, x._2, buf(k - 1)._1, buf(k - 1)._2)) return buf
    var ins = buf.length
    var i = 0
    while (i < buf.length) {
      if (beats(x._1, x._2, buf(i)._1, buf(i)._2)) { ins = i; i = buf.length }
      else i += 1
    }
    val n = math.min(k, buf.length + 1)
    val out = new Array[(Long, Long)](n)
    System.arraycopy(buf, 0, out, 0, ins)
    if (ins < n) out(ins) = x
    var j = ins + 1
    while (j < n) { out(j) = buf(j - 1); j += 1 }
    out
  }

  override def merge(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[(Long, Long)](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length) {
      val takeA = j >= b.length ||
        (i < a.length && beats(a(i)._1, a(i)._2, b(j)._1, b(j)._2))
      if (takeA) { out(n) = a(i); i += 1 } else { out(n) = b(j); j += 1 }
      n += 1
    }
    out
  }

  override def finish(r: Array[(Long, Long)]): Array[(Long, Long)] = r

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
}

/** One-pass Gram-matrix aggregation over pre-quantized vectors — the
  * covariance-build primitive behind q123/q134/q135/q260/q268: the
  * buffer packs the upper-triangle pair-product sums Σ qᵢ·qⱼ (exact
  * longs), the per-dimension sums Σ qᵢ, and the row count into ONE
  * d(d+1)/2 + d + 1 long array. No Spark builtin expresses an
  * outer-product partial aggregation, and the alternative — exploding
  * every row into its d(d+1)/2 cell pairs — generates corpus×2080 rows
  * that only exist to be re-summed (measured 3.0 s → 0.4 s at sf0.1
  * for the covariance build).
  *
  * 100 TB shape: this is a classic partial+final Aggregator — each
  * partition reduces locally into a single d²-bounded buffer, only one
  * ~17 KiB array per partition crosses the shuffle, merge is
  * elementwise long addition. Driver-visible state stays d²-bounded
  * (the same class as the k-means k×dim and PCA d² collects).
  *
  * Determinism: all sums are exact integer additions — order- and
  * partition-layout-invariant, so downstream covariance values are
  * bit-identical to the exploded formulation's. Null vectors fail
  * LOUDLY (the old explode shape silently counted them into n while
  * excluding them from every sum — an inconsistency, not a feature);
  * mixed dimensions fail loudly too. */
class GramAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf0: Array[Long], qv: Array[Long]): Array[Long] = {
    require(qv != null, "gram_agg: null vector (filter or impute first)")
    val d = qv.length
    val t = d * (d + 1) / 2
    val buf = if (buf0.isEmpty) new Array[Long](t + d + 1) else buf0
    require(buf.length == t + d + 1, "gram_agg: mixed vector dimensions")
    var k = 0
    var i = 0
    while (i < d) {
      val qi = qv(i)
      var j = i
      while (j < d) { buf(k) += qi * qv(j); k += 1; j += 1 }
      buf(t + i) += qi
      i += 1
    }
    buf(t + d) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length, "gram_agg: mixed vector dimensions")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
