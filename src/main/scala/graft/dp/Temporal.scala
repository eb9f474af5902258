package graft.dp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/window operators for event-series feature engineering.
  *
  * The headline operator is the backward as-of join ("for each probe row,
  * the most recent reference row at or before its timestamp"), the core
  * primitive of point-in-time-correct feature lookup (no label leakage
  * from the future). Neither Spark SQL nor the reference has it natively.
  *
  * Scale design: implemented as union + per-key running window, NOT a
  * join — one shuffle on the key columns, one sequential pass per key,
  * zero candidate-pair blowup. A range-join formulation would need an
  * inequality join (cartesian-per-key in Spark); this is strictly
  * better: cost is that of a sort-merge join WITHOUT the merge
  * amplification, and AQE skew-split applies to the sort shuffle.
  */
object Temporal {

  /** Backward as-of join: for every `probe` row, attach the `refValueCols`
    * of the latest `ref` row with the same `keyCols` and
    * `ref.refTsCol <= probe.probeTsCol` (inclusive, like DuckDB/kdb asof).
    * Probe rows with no earlier reference row get nulls.
    *
    * Output = all probe columns + `asof_<refTsCol>` (the matched reference
    * timestamp) + `asof_<c>` for each reference value column.
    *
    * Mechanics: reference rows are packed into ONE struct column (so a
    * null VALUE inside a matched row survives — `last(ignoreNulls)` skips
    * whole unmatched rows, never individual null fields), unioned with the
    * probe rows, and resolved with a per-key running
    * `last(struct, ignoreNulls = true)` ordered by (ts, isProbe) — a
    * reference row at exactly the probe timestamp sorts first and is
    * therefore visible to it.
    *
    * Ties: multiple reference rows on the same (key, ts) are ambiguous by
    * definition — pre-aggregate the reference side to one row per key+ts
    * (the registered query takes max(value)).
    */
  def asofJoinBackward(
      probe: DataFrame,
      ref: DataFrame,
      keyCols: Seq[String],
      probeTsCol: String,
      refTsCol: String,
      refValueCols: Seq[String]): DataFrame =
    asofJoin(probe, ref, keyCols, probeTsCol, refTsCol, refValueCols, backward = true)

  /** Forward as-of join: the EARLIEST reference row at or after each probe
    * timestamp ("next maintenance event", "next price revision"). Same
    * union + running-window mechanics as [[asofJoinBackward]], with the
    * per-key sort descending — identical scale shape. */
  def asofJoinForward(
      probe: DataFrame,
      ref: DataFrame,
      keyCols: Seq[String],
      probeTsCol: String,
      refTsCol: String,
      refValueCols: Seq[String]): DataFrame =
    asofJoin(probe, ref, keyCols, probeTsCol, refTsCol, refValueCols, backward = false)

  private def asofJoin(
      probe: DataFrame,
      ref: DataFrame,
      keyCols: Seq[String],
      probeTsCol: String,
      refTsCol: String,
      refValueCols: Seq[String],
      backward: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    val probeCols = probe.columns.toSeq
    val packed = struct(
      (col(refTsCol).as(refTsCol) +: refValueCols.map(c => col(c).as(c))): _*)
    // a null reference timestamp has no position on the time axis — under
    // the ascending window it would sort NULLS FIRST and become a phantom
    // "earliest" match for probes that have no real predecessor
    val r = ref
      .filter(col(refTsCol).isNotNull)
      .select(
        (keyCols.map(col) :+ col(refTsCol).as("__asof_t") :+ packed.as("__asof_r")): _*)
      .withColumn("__asof_probe", lit(0))
    val p = probe
      .withColumn("__asof_t", col(probeTsCol))
      .withColumn("__asof_probe", lit(1))
    val u = p.unionByName(r, allowMissingColumns = true)
    val tOrder = if (backward) col("__asof_t").asc else col("__asof_t").desc
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(tOrder, col("__asof_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn("__asof_m", last(col("__asof_r"), ignoreNulls = true).over(w))
    // a null PROBE timestamp has no position on the time axis either: under
    // the descending (forward) window it would sort NULLS LAST, see every
    // reference row as "preceding", and phantom-match the minimum-timestamp
    // row — emit null match columns instead (the backward path is already
    // null-safe via asc NULLS FIRST, but gets the same explicit guard)
    val m = when(col(probeTsCol).isNotNull, col("__asof_m"))
    val out =
      probeCols.map(col) ++
        (m(refTsCol).as(s"asof_$refTsCol") +:
          refValueCols.map(c => m(c).as(s"asof_$c")))
    matched.filter(col("__asof_probe") === 1).select(out: _*)
  }

  /** Batch range (interval-containment) join: every `probe` row pairs with
    * every `intervals` row whose `[startCol, endCol)` contains the probe's
    * `ptCol`. All three columns must be the same numeric axis (epoch
    * seconds, epoch days — cast timestamps first). Overlapping intervals
    * produce multiple matches, point-less probes produce none (inner).
    *
    * Scale shape: Spark plans a raw `p.pt >= i.start AND p.pt < i.end`
    * predicate as BroadcastNestedLoopJoin — a per-partition cartesian that
    * dies when neither side is tiny. Instead the axis is quantized into
    * `bucketWidth` cells: each interval EXPLODES into the cells it spans,
    * each probe keys to its own cell, and the join becomes an EQUI join on
    * the cell id + an exact residual filter. A probe's cell is unique, so
    * a matching pair meets in exactly one cell — no post-join dedup.
    * Shuffle volume is |probe| + Σ(interval spans / bucketWidth); pick
    * `bucketWidth` near the median interval length so typical intervals
    * explode into ~1-2 cells. Time-of-day hot spots land in different
    * cells each day, and AQE skew-split handles the rest. */
  def rangeJoin(
      probe: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val cells = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn(
        "__cell",
        explode(sequence(
          expr(s"$startCol div $bucketWidth"),
          expr(s"($endCol - 1) div $bucketWidth"))))
    probe
      .withColumn("__cell", expr(s"$ptCol div $bucketWidth"))
      .join(cells, Seq("__cell"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__cell")
  }
}
