package graft.profile

import graft.dp.Taxonomy
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EDA / profiling operators: every reference profiling computation
  * (reference: src/ta_lib/pyspark/eda.py) as a function DataFrame =>
  * small-result DataFrame, kept fully distributed — the reference's
  * toPandas()/RDD-collect escapes (eda.py:42-43, 417, 457) are replaced by
  * Spark aggregates, so these run unchanged on a 100 TB input.
  *
  * All "per column" statistics are batched into ONE wide agg pass (a single
  * scan) instead of the reference's O(columns) separate jobs.
  */
object Profile {

  private def isNumeric(df: DataFrame, c: String): Boolean =
    df.schema(c).dataType.isInstanceOf[NumericType]

  /** null-or-NaN test appropriate for the column's type. */
  def missing(df: DataFrame, c: String): Column = {
    val base = col(c).isNull
    df.schema(c).dataType match {
      case DoubleType | FloatType => base || isnan(col(c))
      case _                      => base
    }
  }

  /** Per-column missing (null|NaN) counts in one pass
    * (reference: dp.py:608-636 `identify_missing_values`).
    * Output: (column, missing_count) one row per column. */
  def missingValueCounts(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.isEmpty) df.columns.toSeq else cols
    val aggs = cs.map(c => sum(when(missing(df, c), 1L).otherwise(0L)).as(c))
    unpivotRow(df.agg(aggs.head, aggs.tail: _*), cs, "column", "missing_count")
  }

  /** Bucketed missing-value summary: columns grouped into missing-ratio
    * buckets (reference: eda.py:244-307 `missing_value_summary` /
    * `missing_plot` — the reference builds this in pandas; here the same
    * single missing-count pass feeds a bucket label projection). */
  def missingValueSummary(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.isEmpty) df.columns.toSeq else cols
    val aggs = cs.map(c => sum(when(missing(df, c), 1L).otherwise(0L)).as(c)) :+
      count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cs.map { c =>
      struct(
        lit(c).as("column"),
        col(c).as("missing_count"),
        round(col(c) * 100.0 / col("__n"), 4).as("missing_pct"))
    }
    val long = row
      .select(explode(array(stacked: _*)).as("s"))
      .select(col("s.column"), col("s.missing_count"), col("s.missing_pct"))
    long.withColumn(
      "bucket",
      when(col("missing_pct") === 0.0, "none")
        .when(col("missing_pct") < 5.0, "low (<5%)")
        .when(col("missing_pct") < 25.0, "moderate (<25%)")
        .when(col("missing_pct") < 50.0, "high (<50%)")
        .otherwise("critical (>=50%)"))
  }

  /** dtype + distinct count + distinct%% per column
    * (reference: eda.py:57-82 `column_values_summary`).
    *
    * `exact = false` (default) counts distincts with the mergeable HLL
    * sketch (`approx_count_distinct`): one pass, no row expansion. Exact
    * multi-column countDistinct makes Catalyst EXPAND the input once per
    * counted column (n columns ⇒ n× the shuffled rows) — the oracle checks
    * opt into it at small SF, production profiling should not. */
  def columnValuesSummary(df: DataFrame, exact: Boolean = false): DataFrame = {
    val cs = df.columns.toSeq
    def cd(c: String) =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cs.map(c => cd(c).as(c)) :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cs.map { c =>
      struct(
        lit(c).as("column"),
        lit(df.schema(c).dataType.simpleString).as("dtype"),
        col(c).as("distinct_count"),
        round(col(c) * 100.0 / col("__n"), 4).as("distinct_pct"))
    }
    row
      .select(explode(array(stacked: _*)).as("s"))
      .select(col("s.column"), col("s.dtype"), col("s.distinct_count"), col("s.distinct_pct"))
  }

  /** Dataset health: %missing cells, %numeric columns, %duplicate rows
    * (reference: eda.py:146-192 `get_health_analysis` — NB the reference's
    * `[x,y]*100` bug multiplies the list; we compute the percentages).
    *
    * ONE aggregate pass: row count, missing-cell total, and distinct-row
    * count (over a struct of all columns — the equivalent of
    * `dropDuplicates().count()` without a second full-width shuffle job).
    * `exact = false` uses the HLL sketch for the distinct-row count (one
    * pass, no distinct shuffle; duplicate_row_pct becomes an estimate). */
  def healthAnalysis(df: DataFrame, exact: Boolean = false): DataFrame = {
    val cs = df.columns.toSeq
    val missAggs = cs.map(c => sum(when(missing(df, c), 1L).otherwise(0L)))
    val totalMissing = missAggs.reduce(_ + _).as("missing_cells")
    val nNumeric = cs.count(isNumeric(df, _))
    val distinctRows =
      if (exact) countDistinct(struct(cs.map(col): _*))
      else approx_count_distinct(struct(cs.map(col): _*))
    df.agg(
        count(lit(1)).as("rows"),
        totalMissing,
        distinctRows.as("distinct_rows"))
      .withColumn("cols", lit(cs.length))
      .select(
        col("rows"),
        col("cols"),
        round(col("missing_cells") * 100.0 / (col("rows") * col("cols")), 4)
          .as("missing_pct"),
        round(lit(nNumeric) * 100.0 / cs.length, 4).as("numeric_col_pct"),
        // HLL may OVERestimate distinct_rows past the row count — clamp so
        // the approx path can't report a negative duplicate percentage
        round(greatest(lit(0.0), (col("rows") - col("distinct_rows")) * 100.0 / col("rows")), 4)
          .as("duplicate_row_pct"))
  }

  /** Per-column counts outside IQR and mean±3σ bounds, one scan for all
    * columns (reference: eda.py:310-394 recomputes per column). Quantiles
    * default to the approx sketch; `exact = true` is the oracle-check
    * opt-in like every percentile-learning operator. */
  def outlierCounts(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    // one pass for bounds; ONE sketch per column queried at both
    // quartiles (r21, guide §2.3) — the array-probe form builds a single
    // aggregation buffer where two scalar percentile calls built two
    // identical ones: same inserts, bit-identical answers, half the
    // buffer work
    val bAggs = cols.flatMap { c =>
      Seq(
        graft.Exprs.pctArray(col(c).cast("double"), Seq(0.25, 0.75), exact)
          .as(s"${c}__q"),
        avg(col(c)).as(s"${c}__mean"),
        stddev(col(c)).as(s"${c}__sd"))
    }
    // NOT spread (r20, measured): the percentile sketch pays a large
    // per-partition constant (final compress) and a single-task merge of
    // every partial — 32-way spreading grew total sketch work 4→9 s of
    // task time and added a 1.4 s merge at sf0.1. Scan-parallel partials
    // are the right shape for mergeable sketches.
    val bounds = df.agg(bAggs.head, bAggs.tail: _*).collect()(0)
    def d(n: String) = graft.Exprs.requireD(bounds, n, s"outlierCounts")
    def q(c: String, i: Int): Double = {
      val arr = bounds.getSeq[Any](bounds.fieldIndex(s"${c}__q"))
      require(arr != null && arr.length == 2 && arr.forall(_ != null),
        s"outlierCounts($c): percentile aggregate is null " +
          "(empty, all-null, or constant input column)")
      arr(i).asInstanceOf[Double]
    }
    // one pass for counts
    val cAggs = cols.flatMap { c =>
      val iqr = q(c, 1) - q(c, 0)
      val lo = q(c, 0) - 1.5 * iqr
      val hi = q(c, 1) + 1.5 * iqr
      val sLo = d(s"${c}__mean") - 3 * d(s"${c}__sd")
      val sHi = d(s"${c}__mean") + 3 * d(s"${c}__sd")
      Seq(
        sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)).as(s"${c}__iqr"),
        sum(when(col(c) < sLo || col(c) > sHi, 1L).otherwise(0L)).as(s"${c}__sdv"))
    }
    val row = df.agg(cAggs.head, cAggs.tail: _*)
    val stacked = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__iqr").as("iqr_outliers"),
        col(s"${c}__sdv").as("sdv_outliers"))
    }
    row
      .select(explode(array(stacked: _*)).as("s"))
      .select(col("s.column"), col("s.iqr_outliers"), col("s.sdv_outliers"))
  }

  /** count/mean/stddev/min/max (+ exact quartiles) per numeric column
    * (reference: eda.py:400-485 via toPandas+numpy → distributed here). */
  def describeData(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    // ONE sketch per column queried at all three quartiles (r21, guide
    // §2.3): the array-probe form shares a single aggregation buffer
    // where three scalar percentile calls built three identical ones —
    // same inserts, bit-identical answers, a third of the buffer work
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).cast("double").as(s"${c}__count"),
        avg(col(c)).as(s"${c}__mean"),
        stddev(col(c)).as(s"${c}__stddev"),
        min(col(c)).cast("double").as(s"${c}__min"),
        graft.Exprs.pctArray(col(c).cast("double"), Seq(0.25, 0.5, 0.75), exact)
          .as(s"${c}__q"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__count").as("count"),
        round(col(s"${c}__mean"), 6).as("mean"),
        round(col(s"${c}__stddev"), 6).as("stddev"),
        col(s"${c}__min").as("min"),
        round(element_at(col(s"${c}__q"), 1), 6).as("p25"),
        round(element_at(col(s"${c}__q"), 2), 6).as("p50"),
        round(element_at(col(s"${c}__q"), 3), 6).as("p75"),
        col(s"${c}__max").as("max"))
    }
    row
      .select(explode(array(stacked: _*)).as("s"))
      .select("s.column", "s.count", "s.mean", "s.stddev", "s.min", "s.p25", "s.p50", "s.p75", "s.max")
  }

  /** Categorical profile: distinct count, mode, mode frequency
    * (reference: eda.py:444-485 `describe_categoricaldata`). */
  def describeCategorical(df: DataFrame, cols: Seq[String]): DataFrame = {
    val perCol = cols.map { c =>
      df.groupBy(col(c).as("value"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(desc("freq"), asc("value"))
        .limit(1)
        .select(
          lit(c).as("column"),
          col("value").cast("string").as("mode"),
          col("freq").as("mode_freq"))
    }
    perCol.reduce(_ unionByName _)
  }

  /** Distributed set analysis on a key column: |A−B|, |B−A|, |A∩B|, |A∪B|
    * (reference: eda.py:19-51 `setanalyse` collects both sides to Python
    * sets — here pure `except`/`intersect`/`union`, never collected). */
  def setAnalyse(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val ka = a.select(col(keyCol).as("__k")).distinct().withColumn("__in_a", lit(1))
    val kb = b.select(col(keyCol).as("__k")).distinct().withColumn("__in_b", lit(1))
    // one full-outer join on distinct keys + one agg of null patterns —
    // a single job instead of except+intersect+union each reshuffling.
    ka.join(kb, Seq("__k"), "full_outer")
      .agg(
        sum(when(col("__in_b").isNull, 1L).otherwise(0L)).as("a_minus_b"),
        sum(when(col("__in_a").isNull, 1L).otherwise(0L)).as("b_minus_a"),
        sum(when(col("__in_a").isNotNull && col("__in_b").isNotNull, 1L).otherwise(0L))
          .as("a_intersect_b"),
        count(lit(1)).as("a_union_b"))
  }

  /** Equi-width histogram of a numeric column: ONE agg learns min/max
    * (driver scalars), bucket assignment is a pure projection, counts are
    * a hash-partitioned groupBy — two passes total at any size. The top
    * edge folds into the last bucket. */
  def histogram(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val x = col(c).cast("double")
    // NaN sorts above every double in Spark's max — a single NaN row would
    // make width NaN and collapse every bucket to 0; exclude NaN like null
    val clean = df.filter(x.isNotNull && !isnan(x))
    val row = clean.agg(min(x).as("mn"), max(x).as("mx")).head()
    if (row.isNullAt(0)) // empty frame or all-null/NaN column: empty histogram
      return df.limit(0).select(
        lit(0).as("bucket"), lit(0.0).as("lo"), lit(0.0).as("hi"), lit(0L).as("n"))
    val (mn, mx) = (row.getDouble(0), row.getDouble(1))
    val width = (mx - mn) / bins
    val bucket =
      if (width == 0.0) lit(0)
      else least(floor((x - mn) / width).cast("int"), lit(bins - 1))
    clean
      .select(bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("bucket"),
        round(lit(mn) + col("bucket") * width, 6).as("lo"),
        round(lit(mn) + (col("bucket") + 1) * width, 6).as("hi"),
        col("n"))
  }

  /** Membership drill-down for [[setAnalyse]]: the actual keys per region
    * (a_only / b_only / both) as (category, key) rows, capped at
    * `maxKeysPerCategory` smallest keys per region (reference returns the
    * full Python sets, eda.py:19-51 — unbounded driver memory; here the
    * output is bounded and never collected). The per-category row_number
    * window sorts each region in one task (external sort, memory-safe) —
    * use the counts-only [[setAnalyse]] when the drill-down isn't needed. */
  def setAnalyseKeys(a: DataFrame, b: DataFrame, keyCol: String, maxKeysPerCategory: Int = 100): DataFrame = {
    val ka = a.select(col(keyCol).as("__k")).distinct().withColumn("__in_a", lit(1))
    val kb = b.select(col(keyCol).as("__k")).distinct().withColumn("__in_b", lit(1))
    val m = ka.join(kb, Seq("__k"), "full_outer")
      .select(
        col("__k"),
        when(col("__in_b").isNull, "a_only")
          .when(col("__in_a").isNull, "b_only")
          .otherwise("both").as("category"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("category").orderBy("__k")
    m.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxKeysPerCategory)
      .select(col("category"), col("__k").as(keyCol))
  }

  /** Pearson correlation of each feature with a target column, one pass
    * (reference: eda.py:714-802 via assembled-vector Correlation.corr). */
  def correlationWithTarget(df: DataFrame, features: Seq[String], target: String): DataFrame = {
    val aggs = features.map(c => corr(col(c), col(target)).as(c))
    unpivotRowDouble(df.agg(aggs.head, aggs.tail: _*), features, "column", "correlation")
  }

  /** Full Pearson correlation matrix over numeric columns as a long table
    * (col_a, col_b, corr). One agg pass over all pairs. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for (a <- cols; b <- cols) yield (a, b)
    val aggs = pairs.map { case (a, b) => corr(col(a), col(b)).as(s"${a}__${b}") }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      struct(
        lit(a).as("col_a"),
        lit(b).as("col_b"),
        round(col(s"${a}__${b}"), 6).as("correlation"))
    }
    row
      .select(explode(array(stacked: _*)).as("s"))
      .select(col("s.col_a"), col("s.col_b"), col("s.correlation"))
  }

  /** Top-k category frequencies (reference does pandas value_counts().head,
    * eda.py:552-553 → TakeOrderedAndProject here, no full sort). */
  def topKCategories(df: DataFrame, c: String, k: Int): DataFrame =
    df.groupBy(col(c))
      .agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc(c))
      .limit(k)

  // --- helpers -------------------------------------------------------------

  /** Single-row wide frame → (name, value) long frame, preserving Long. */
  private def unpivotRow(row: DataFrame, names: Seq[String], kCol: String, vCol: String): DataFrame = {
    val stacked = names.map(c => struct(lit(c).as(kCol), col(c).cast("long").as(vCol)))
    row.select(explode(array(stacked: _*)).as("s")).select(col(s"s.$kCol"), col(s"s.$vCol"))
  }

  private def unpivotRowDouble(row: DataFrame, names: Seq[String], kCol: String, vCol: String): DataFrame = {
    val stacked = names.map(c => struct(lit(c).as(kCol), round(col(c).cast("double"), 6).as(vCol)))
    row.select(explode(array(stacked: _*)).as("s")).select(col(s"s.$kCol"), col(s"s.$vCol"))
  }
}
