package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[Graft]] members: event sequences, layout/compaction planning, profiling, intervals, sketches (HLL/KMV/CMS).
  *
  * One of the six family slices of the operator API — `object Graft`
  * mixes them all in; call sites use `Graft.<member>` exactly as
  * before. Split round 13 purely for navigability (8.5k LoC in one
  * file); `private` members became `private[api]` so slices can share
  * helpers with zero behavior change.
  */
private[api] trait GraftEventsSketches { this: Graft.type =>


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
}
