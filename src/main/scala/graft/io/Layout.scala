package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * file-skipping scans.
  *
  * A table sorted by one column skips files well for predicates on THAT
  * column and not at all for any other. Interleaving the bits of several
  * columns into one sort key (the Z-order curve — the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`) makes rows that are close in ANY
  * participating dimension land in the same files, so parquet row-group
  * min/max stats prune multi-dimensional box predicates without any
  * index structure. At 100 TB this is pure scan-byte leverage: the
  * curation pipelines here filter events by (user, time) and documents
  * by (source, length) constantly, and a one-off re-layout pays for
  * itself on the first few scans.
  *
  * Everything is plain column arithmetic — the z-key is computable by
  * any engine (the oracle recomputes it in SQL), and the layout is
  * ordinary parquet: readers that don't know about z-order still read
  * the table normally, they just skip less.
  *
  * Relationship to [[Tables.mortonCode]]/[[Tables.saveZOrdered]]: those
  * are the 2-D fast path (five mask-shift rounds, full 32 bits per
  * dimension, pre-bucketed int inputs — also exposed to SQL as
  * `graft_morton`). This object generalizes to n dimensions at a chosen
  * bit width, adds the range normalization, and renders the identical
  * arithmetic as portable SQL for cross-engine verification. For two
  * dimensions below 2^bits the keys agree bit for bit (asserted in
  * OperatorsSpec).
  */
object Layout {

  /** Clamp-and-scale a numeric column to an integer bucket in
    * [0, 2^bits): the per-dimension normalization before interleaving.
    * Callers supply the (min, max) range — compute it once with an agg,
    * or use domain knowledge; values outside clamp to the edge buckets,
    * nulls go to bucket 0 (nulls cluster together at the curve origin,
    * which is also where a null-filtering scan skips them wholesale). */
  def rangeBucket(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    require(max > min, s"need max > min, got [$min, $max]")
    val buckets = (1L << bits) - 1
    val scaled = floor((c.cast("double") - lit(min)) / lit(max - min) * lit(buckets.toDouble))
    // least/greatest IGNORE nulls (they return the extreme of the
    // non-null args), so the null case needs its own branch — clamping
    // a null through them would land it in the TOP bucket
    when(c.isNull, lit(0L))
      .otherwise(greatest(lit(0L), least(lit(buckets), scaled.cast("long"))))
  }

  /** Interleave the low `bits` bits of each pre-bucketed column into one
    * long Morton key: bit i of column j lands at position i·n + j, so a
    * unit step in any single dimension moves the key by at most
    * 2^(n·bits−n) — near rows stay near. Inputs must already be
    * non-negative longs below 2^bits ([[rangeBucket]] produces exactly
    * that). The expansion is a static sum of shift/mask terms — fully
    * codegen'd, no UDF, and the identical arithmetic runs in any SQL
    * engine. */
  def zorderKey(bucketed: Seq[Column], bits: Int): Column = {
    val n = bucketed.size
    require(n >= 1, "zorderKey needs at least one column")
    require(bits >= 1 && n * bits <= 63,
      s"interleaved width ${n * bits} must fit a long (n=$n, bits=$bits)")
    val terms = for {
      i <- 0 until bits
      (c, j) <- bucketed.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _)
  }

  /** SQL text of [[zorderKey]] for a given per-dimension expression list —
    * the same unrolled shift/mask sum, renderable into any engine's
    * dialect (the oracle uses this to recompute the key in DuckDB). */
  def zorderKeySql(bucketedExprs: Seq[String], bits: Int): String = {
    val n = bucketedExprs.size
    require(n >= 1 && bits >= 1 && n * bits <= 63)
    (for {
      i <- 0 until bits
      (e, j) <- bucketedExprs.zipWithIndex
    } yield s"((($e >> $i) & 1) << ${i * n + j})").mkString(" + ")
  }

  /** Rewrite a frame into z-ordered parquet: bucket each `(column, min,
    * max)` dimension, range-partition by the interleaved key into
    * `nFiles` output files, sort within each, and write. Range
    * partitioning keeps output files balanced under skew (quantile-based
    * splits, not fixed key ranges); the within-file sort is what makes
    * row-group min/max stats tight on EVERY participating column.
    * The z-key is dropped before writing — the layout is the artifact,
    * not the key. */
  def writeZOrdered(
      df: DataFrame,
      dims: Seq[(String, Double, Double)],
      path: String,
      nFiles: Int,
      bits: Int = 16,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(dims.nonEmpty, "writeZOrdered needs at least one dimension")
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    df.withColumn("__z",
        zorderKey(dims.map { case (c, mn, mx) => rangeBucket(col(c), mn, mx, bits) }, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
  }
}
