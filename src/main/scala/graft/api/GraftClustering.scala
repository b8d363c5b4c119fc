package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Graft]] members: embedding clustering: k-means, PCA, projections, quantization, community propagation, modularity.
  *
  * One of the six family slices of the operator API — `object Graft`
  * mixes them all in; call sites use `Graft.<member>` exactly as
  * before. Split round 13 purely for navigability (8.5k LoC in one
  * file); `private` members became `private[api]` so slices can share
  * helpers with zero behavior change.
  */
private[api] trait GraftClustering { this: Graft.type =>


  private[api] def normSq(c: Array[Double]): Double = {
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

  /** NMF topic model (Lee–Seung multiplicative updates, Frobenius
    * objective) — the corpus-exploration layer the engine lacked:
    * factor the doc×term count matrix V ≈ W·H into k nonnegative
    * topics and report each topic's top terms. Two full update rounds
    * (H then W then H) from a deterministic md5 init — enough to pull
    * coherent term groups out of count co-occurrence; callers wanting
    * convergence run their own loop over the same primitives.
    *
    * 100 TB shape: W is doc-keyed (n×k rows, never collected), H is
    * topic×vocab (k·vocabSize rows — broadcast-sized by construction).
    * Per update: numerator = ONE corpus-scale equi join (V⋈W keyed on
    * doc, or V⋈broadcast(H) keyed on term) + keyed sum; Gram matrices
    * WᵀW / HHᵀ are k×k aggregates (the k-means-style bounded driver
    * traffic, except nothing here even reaches the driver). No
    * iteration touches more than |V| + n·k rows.
    *
    * Float policy: W/H live as micro-quantized longs; numerators are
    * exact integer sums, Gram/denominator sums exact Decimal(38); each
    * update is ONE double ratio (num·1e12/den — IEEE multiply/divide
    * are correctly rounded, so cross-engine exact on equal inputs)
    * re-rounded to the micro grid, and H rows renormalize to Σ=1e6
    * after each H step so magnitudes never drift across rounds. Vocab
    * = top `vocabSize` terms by document frequency (ties by term). */
  def nmfTopics(df: DataFrame, textCol: String, idCol: String,
      k: Int = 5, vocabSize: Int = 200, topTerms: Int = 5): DataFrame = {
    require(k >= 2 && vocabSize >= k && topTerms >= 1,
      "nmfTopics: need k >= 2, vocabSize >= k, topTerms >= 1")
    graft.functions.GraftFunctions.register(df.sparkSession) // md5_lower64
    val dec = DecimalType(38, 0)
    val toks = df.select(col(idCol).as("d"),
      explode(split(trim(col(textCol)), " ")).as("w"))
    val tc = toks.groupBy(col("d"), col("w"))
      .agg(count(lit(1)).as("v"))
      .localCheckpoint() // feeds vocab ranking + the V matrix
    val vocab = tc.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w")).limit(vocabSize)
      .select(col("w"))
    val matV = tc.join(broadcast(vocab), Seq("w"))
      .select(col("d"), col("w"), col("v"))
      .localCheckpoint() // read by every numerator of every round
    val topics = df.sparkSession.range(1, k + 1L).select(col("id").as("t"))
    val w0 = matV.select(col("d")).distinct().crossJoin(broadcast(topics))
      .select(col("d"), col("t"), (lit(1000000L) +
        expr("(md5_lower64(concat('w:', cast(d AS STRING), ':', " +
          "cast(t AS STRING))) & 9223372036854775807) % 997") * 1000L)
        .as("wq"))
      .localCheckpoint()
    val h0 = vocab.crossJoin(broadcast(topics))
      .select(col("t"), col("w"), (lit(1000000L) +
        expr("(md5_lower64(concat('h:', cast(t AS STRING), ':', w)) " +
          "& 9223372036854775807) % 997") * 1000L).as("hq"))

    // H ← H ∘ (WᵀV) ⊘ ((WᵀW)H), entries re-quantized to the micro grid
    def updateH(w: DataFrame, h: DataFrame): DataFrame = {
      val num = matV.join(w, Seq("d")).groupBy(col("t"), col("w"))
        .agg(sum(col("wq") * col("v")).as("numh"))
      val gram = w.alias("a").join(w.alias("b"), col("a.d") === col("b.d"))
        .groupBy(col("a.t").as("i"), col("b.t").as("j"))
        .agg(sum(col("a.wq").cast(dec) * col("b.wq").cast(dec)).as("g"))
      val den = gram.join(h.select(col("t").as("j"), col("w"), col("hq")),
          Seq("j"))
        .groupBy(col("i").as("t"), col("w"))
        .agg(sum(col("g") * col("hq").cast(dec)).as("denh"))
      val dend = col("denh").cast(DoubleType)
      h.join(num, Seq("t", "w"), "left").join(den, Seq("t", "w"))
        .select(col("t"), col("w"),
          round(col("hq").cast(DoubleType) *
            (coalesce(col("numh"), lit(0L)).cast(DoubleType) * lit(1.0e12) /
              when(dend <= lit(0.0), lit(1.0)).otherwise(dend)))
            .cast(LongType).as("hq"))
    }
    // per-topic renormalization to Σ_w H = 1e6 — scale lives in W
    def normH(h: DataFrame): DataFrame = {
      val s = h.groupBy(col("t")).agg(sum(col("hq").cast(dec)).as("sh"))
      h.join(s, Seq("t")).select(col("t"), col("w"),
        when(col("sh").cast(DoubleType) <= lit(0.0), lit(0L))
          .otherwise(round(col("hq").cast(DoubleType) * lit(1.0e6) /
            col("sh").cast(DoubleType)).cast(LongType)).as("hq"))
        .localCheckpoint() // k·vocab rows; cuts the round's lineage
    }
    // W ← W ∘ (VHᵀ) ⊘ (W(HHᵀ))
    def updateW(w: DataFrame, h: DataFrame): DataFrame = {
      val num = matV.join(broadcast(h), Seq("w"))
        .groupBy(col("d"), col("t")).agg(sum(col("v") * col("hq")).as("numw"))
      val kmat = h.alias("a").join(h.alias("b"), col("a.w") === col("b.w"))
        .groupBy(col("a.t").as("i"), col("b.t").as("j"))
        .agg(sum(col("a.hq") * col("b.hq")).as("kk"))
      val den = w.select(col("d"), col("t").as("i"), col("wq"))
        .join(broadcast(kmat), Seq("i"))
        .groupBy(col("d"), col("j").as("t"))
        .agg(sum(col("wq").cast(dec) * col("kk").cast(dec)).as("denw"))
      val dend = col("denw").cast(DoubleType)
      w.join(num, Seq("d", "t"), "left").join(den, Seq("d", "t"))
        .select(col("d"), col("t"),
          round(col("wq").cast(DoubleType) *
            (coalesce(col("numw"), lit(0L)).cast(DoubleType) * lit(1.0e12) /
              when(dend <= lit(0.0), lit(1.0)).otherwise(dend)))
            .cast(LongType).as("wq"))
        .localCheckpoint() // n×k rows; cuts the corpus-join lineage
    }
    val h1 = normH(updateH(w0, h0))
    val w1 = updateW(w0, h1)
    val h2 = normH(updateH(w1, h1))
    val r = Window.partitionBy(col("t")).orderBy(col("hq").desc, col("w"))
    h2.withColumn("rnk", row_number().over(r).cast(LongType))
      .filter(col("rnk") <= topTerms)
      .select(col("t").as("topic"), col("rnk"), col("w").as("term"),
        round(col("hq").cast(DoubleType) / lit(1.0e6), 6).as("weight"))
      .orderBy(col("topic"), col("rnk"))
  }
}
