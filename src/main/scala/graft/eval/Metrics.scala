package graft.eval

import org.apache.spark.mllib.evaluation.BinaryClassificationMetrics
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation operators (reference:
  * src/ta_lib/pyspark/model_eval.py + handy_spark_cd.py).
  *
  * All regression metrics are single `agg` expressions — the reference's
  * per-metric passes collapse to one scan. Binary-classification curves use
  * the native Scala BinaryClassificationMetrics (the reference's entire py4j
  * bridge, handy_spark_cd.py:24-38, disappears). The confusion-cell column is
  * a pure `when` chain, not a UDF (reference UDF at model_eval.py:450-468).
  */
object Metrics {

  /** One-pass regression metric table: rmse, mae, mape, wmape, r2, expvar
    * (reference: model_eval.py:30-140). */
  def regressionMetrics(df: DataFrame, yCol: String, yhatCol: String): DataFrame = {
    val y = col(yCol).cast("double")
    val yhat = col(yhatCol).cast("double")
    val err = yhat - y
    df.agg(
      round(sqrt(avg(err * err)), 6).as("rmse"),
      round(avg(abs(err)), 6).as("mae"),
      // zero-actual rows are excluded from MAPE (the reference divides by y
      // unguarded, model_eval.py:95-114 — divergence noted in DIVERGENCES.md)
      round(avg(when(y =!= 0.0, abs(err) / abs(y))), 6).as("mape"),
      round(sum(abs(err)) / sum(abs(y)), 6).as("wmape"))
  }

  /** R² and explained variance (needs mean(y), so computed via a self-agg
    * subquery — still two scans max, usually one with AQE reuse). */
  def r2AndExplainedVariance(df: DataFrame, yCol: String, yhatCol: String): DataFrame = {
    val stats = df.agg(avg(col(yCol)).as("ybar")).collect()(0)
    val ybar = stats.getDouble(0)
    val y = col(yCol).cast("double")
    val yhat = col(yhatCol).cast("double")
    val err = yhat - y
    df.agg(
      round(lit(1.0) - sum(err * err) / sum((y - ybar) * (y - ybar)), 6).as("r2"),
      round(lit(1.0) - variance(err) / variance(y), 6).as("explained_variance"))
  }

  /** Threshold the positive-class score into a 0/1 label — replaces the
    * reference's `_get_label` UDF (model_eval.py:444-448). */
  def labelAtThreshold(df: DataFrame, scoreCol: String, threshold: Double, out: String = "prediction"): DataFrame =
    df.withColumn(out, when(col(scoreCol) > threshold, 1.0).otherwise(0.0))

  /** TP/FP/TN/FN cell per row as a `when` chain — replaces the reference's
    * `_get_conf_cell` UDF (model_eval.py:450-468). */
  def confusionCell(df: DataFrame, predCol: String, labelCol: String, out: String = "cell"): DataFrame =
    df.withColumn(
      out,
      // null pred/label: null cell, NOT the otherwise branch — every when
      // condition evaluates null for them and they would all silently
      // land in "FN"
      when(col(predCol).isNull || col(labelCol).isNull, lit(null).cast("string"))
        .when(col(predCol) === 1.0 && col(labelCol) === 1.0, "TP")
        .when(col(predCol) === 1.0 && col(labelCol) === 0.0, "FP")
        .when(col(predCol) === 0.0 && col(labelCol) === 0.0, "TN")
        .otherwise("FN"))

  /** The four confusion-cell aggregates at a threshold — shared by the
    * global and per-group variants so the cell definitions exist once. */
  private def confusionCellAggs(scoreCol: String, labelCol: String, threshold: Double) = {
    val pred = when(col(scoreCol) > threshold, 1.0).otherwise(0.0)
    val y = col(labelCol).cast("double")
    Seq(
      sum(when(pred === 1.0 && y === 1.0, 1L).otherwise(0L)).as("tp"),
      sum(when(pred === 1.0 && y === 0.0, 1L).otherwise(0L)).as("fp"),
      sum(when(pred === 0.0 && y === 0.0, 1L).otherwise(0L)).as("tn"),
      sum(when(pred === 0.0 && y === 1.0, 1L).otherwise(0L)).as("fn"))
  }

  /** accuracy/precision/recall/f1 from tp/fp/tn/fn columns — the one
    * place the derived formulas live. */
  private def derivedBinaryMetrics(cells: DataFrame): DataFrame =
    cells.select(
      cells.columns.map(col).toSeq ++ Seq(
        round((col("tp") + col("tn")) / (col("tp") + col("fp") + col("tn") + col("fn")).cast("double"), 6)
          .as("accuracy"),
        round(col("tp") / (col("tp") + col("fp")).cast("double"), 6).as("precision"),
        round(col("tp") / (col("tp") + col("fn")).cast("double"), 6).as("recall"),
        round(lit(2.0) * col("tp") / (lit(2.0) * col("tp") + col("fp") + col("fn")).cast("double"), 6)
          .as("f1")): _*)

  /** Confusion counts + accuracy/precision/recall/f1 at a threshold, one
    * aggregate pass (reference: handy_spark_cd.py:168-187 +
    * model_eval.py:256-318). Stays a GLOBAL aggregate (SinglePartition
    * exchange) rather than delegating to the grouped variant: grouping on
    * a constant key plans a full-width hash shuffle + AQE stage for the
    * same one-row answer — measured ~2x per-call overhead. */
  def binaryMetricsAtThreshold(df: DataFrame, scoreCol: String, labelCol: String, threshold: Double): DataFrame = {
    val aggs = confusionCellAggs(scoreCol, labelCol, threshold)
    derivedBinaryMetrics(df.agg(aggs.head, aggs.tail: _*))
  }

  /** Per-segment binary metrics in ONE hash-partitioned pass: the fairness
    * / slice-analysis table (metrics by language, source, market, ...).
    * Same cells and derived metrics as [[binaryMetricsAtThreshold]], one
    * row per group — the reference (and the naive loop) filters and
    * re-scans the data once per segment; here segments share the scan and
    * the partial aggregation. */
  def binaryMetricsByGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      labelCol: String,
      threshold: Double): DataFrame = {
    val aggs = confusionCellAggs(scoreCol, labelCol, threshold)
    derivedBinaryMetrics(
      df.groupBy(col(groupCol).as("segment")).agg(aggs.head, aggs.tail: _*))
  }

  /** Multiclass confusion matrix: one hash-partitioned groupBy over the
    * data, (label, prediction, n) rows — the eval twin of the multiclass
    * estimators the Registry exposes (the reference's eval surface is
    * binary-only). */
  def confusionMatrix(df: DataFrame, predCol: String, labelCol: String): DataFrame =
    df.groupBy(
        col(labelCol).cast("double").as("label"),
        col(predCol).cast("double").as("prediction"))
      .agg(count(lit(1)).as("n"))

  /** Per-class precision/recall/f1 + support, from ONE scan: the confusion
    * matrix is tiny (classes²), so the per-class sums run on the
    * aggregated frame, never the data. */
  def multiclassSummary(df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val cm = confusionMatrix(df, predCol, labelCol)
    val byLabel = cm.groupBy(col("label")).agg(sum(col("n")).as("support"))
    val byPred = cm.groupBy(col("prediction").as("label")).agg(sum(col("n")).as("predicted"))
    val tp = cm.filter(col("label") === col("prediction"))
      .select(col("label"), col("n").as("tp"))
    byLabel
      .join(byPred, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left")
      .na.fill(0L, Seq("support", "predicted", "tp"))
      .select(
        col("label"),
        col("support"),
        round(when(col("predicted") =!= 0L, col("tp") / col("predicted").cast("double")), 6)
          .as("precision"),
        round(when(col("support") =!= 0L, col("tp") / col("support").cast("double")), 6)
          .as("recall"),
        round(
          when(col("predicted") + col("support") =!= 0L,
            lit(2.0) * col("tp") / (col("predicted") + col("support")).cast("double")), 6)
          .as("f1"))
  }

  /** auROC / auPR over (score, label) using native mllib metrics
    * (reference: model_eval.py:294-312). */
  def aucMetrics(df: DataFrame, scoreCol: String, labelCol: String): (Double, Double) = {
    val scoreAndLabels = df
      .select(col(scoreCol).cast("double"), col(labelCol).cast("double"))
      .rdd
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val m = new BinaryClassificationMetrics(scoreAndLabels)
    val res = (m.areaUnderROC(), m.areaUnderPR())
    m.unpersist()
    res
  }

  /** Full ROC/PR curve point table (reference exports these for plotting,
    * handy_spark_cd.py:142-187): one row per distinct score threshold
    * (rounded to `digits` decimals), prediction rule `score >= threshold`,
    * with tp/fp/tn/fn plus tpr (= recall), fpr and precision.
    *
    * Scale design: ONE groupBy over the data learns per-threshold pos/neg
    * counts; the cumulative sums then run in an unpartitioned window over
    * the GROUPED frame, which the rounding bounds at ~10^digits + 1 rows
    * for probability-like scores — the raw data never crosses a global
    * sort. Curve resolution is the explicit knob: digits=3 → ≤1001 points.
    */
  def rocPrCurve(df: DataFrame, scoreCol: String, labelCol: String, digits: Int = 3): DataFrame = {
    val y = col(labelCol).cast("double")
    val g = df
      .groupBy(round(col(scoreCol).cast("double"), digits).as("threshold"))
      .agg(
        sum(when(y === 1.0, 1L).otherwise(0L)).as("pos"),
        sum(when(y === 0.0, 1L).otherwise(0L)).as("neg"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("threshold").desc)
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    g.select(
        col("threshold"),
        sum(col("pos")).over(w).as("tp"),
        sum(col("neg")).over(w).as("fp"),
        sum(col("pos")).over(tot).as("__tot_pos"),
        sum(col("neg")).over(tot).as("__tot_neg"))
      .select(
        col("threshold"),
        col("tp"),
        col("fp"),
        (col("__tot_neg") - col("fp")).as("tn"),
        (col("__tot_pos") - col("tp")).as("fn"),
        round(when(col("__tot_pos") =!= 0L, col("tp") / col("__tot_pos").cast("double")), 6).as("tpr"),
        round(when(col("__tot_neg") =!= 0L, col("fp") / col("__tot_neg").cast("double")), 6).as("fpr"),
        round(col("tp") / (col("tp") + col("fp")).cast("double"), 6).as("precision"))
  }

  /** Per-threshold confusion/precision/recall/f1 curves in ONE aggregate
    * pass over the data — all thresholds' cells are columns of a single
    * wide agg, then unpivoted (reference: handy_spark_cd.py:142-165 scans
    * once per threshold). */
  def thresholdMetrics(df: DataFrame, scoreCol: String, labelCol: String, thresholds: Seq[Double]): DataFrame = {
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("double")
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(s > t && y === 1.0, 1L).otherwise(0L)).as(s"tp_$i"),
        sum(when(s > t && y === 0.0, 1L).otherwise(0L)).as(s"fp_$i"),
        sum(when(s <= t && y === 0.0, 1L).otherwise(0L)).as(s"tn_$i"),
        sum(when(s <= t && y === 1.0, 1L).otherwise(0L)).as(s"fn_$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = thresholds.zipWithIndex.map { case (t, i) =>
      val (tp, fp, tn, fn) = (col(s"tp_$i"), col(s"fp_$i"), col(s"tn_$i"), col(s"fn_$i"))
      struct(
        lit(t).as("threshold"),
        tp.as("tp"),
        fp.as("fp"),
        tn.as("tn"),
        fn.as("fn"),
        round((tp + tn) / (tp + fp + tn + fn).cast("double"), 6).as("accuracy"),
        round(when(tp + fp =!= 0L, tp / (tp + fp).cast("double")), 6).as("precision"),
        round(when(tp + fn =!= 0L, tp / (tp + fn).cast("double")), 6).as("recall"),
        round(when(lit(2.0) * tp + fp + fn =!= 0.0, lit(2.0) * tp / (lit(2.0) * tp + fp + fn).cast("double")), 6)
          .as("f1"))
    }
    row
      .select(explode(array(stacked: _*)).as("s"))
      .select("s.threshold", "s.tp", "s.fp", "s.tn", "s.fn", "s.accuracy", "s.precision", "s.recall", "s.f1")
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the score
    * distributions of two groups (e.g. last week's vs today's model
    * scores): KS = max over the score axis of |CDF_a − CDF_b|.
    *
    * Scores are first rounded to `digits` and pre-aggregated, so the
    * global cumulative window runs over ≤ 10^digits + 1 rows (the
    * roc_pr_curve bounding trick) — the only unpartitioned window is over
    * that small frame, never raw data. NOTE: this bound assumes scores in
    * a bounded range like [0, 1] (model scores, rates, normalized
    * features); for an arbitrary-range column, rounding does not bound
    * the distinct-value count and the single global window degrades to
    * one task over all distinct rounded values — normalize or clamp
    * first. An empty side has no CDF: it fails loudly (raise_error in
    * the denominator) rather than returning a silent null KS. */
  def ksStatistic(
      a: DataFrame,
      b: DataFrame,
      scoreCol: String,
      digits: Int = 3): DataFrame = {
    def side(df: DataFrame, n: String) =
      df.filter(col(scoreCol).isNotNull) // a null score has no CDF position
        .select(round(col(scoreCol).cast("double"), digits).as("s"))
        .groupBy(col("s")).agg(count(lit(1)).as(n))
    val grouped = side(a, "na")
      .join(side(b, "nb"), Seq("s"), "full_outer")
      .na.fill(0L, Seq("na", "nb"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    def denom(c: Column, side: String): Column = {
      val n = sum(c).over(tot).cast("double")
      when(n > 0d, n).otherwise(
        raise_error(lit(s"ksStatistic: $side input has no non-null scores")).cast("double"))
    }
    grouped
      .select(
        (sum(col("na")).over(w) / denom(col("na"), "left")).as("cdf_a"),
        (sum(col("nb")).over(w) / denom(col("nb"), "right")).as("cdf_b"))
      .agg(round(max(abs(col("cdf_a") - col("cdf_b"))), 6).as("ks"))
      // max over zero rows (BOTH sides empty) is the one null that slips
      // past the per-side denominator guard
      .select(when(col("ks").isNotNull, col("ks")).otherwise(
        raise_error(lit("ksStatistic: both inputs are empty")).cast("double")).as("ks"))
  }

  /** Calibration (reliability) table: scores in [0, 1] bucketed into
    * `buckets` equal-width bins; per bin the mean predicted score, the
    * observed event rate, and the count. A well-calibrated model has
    * mean_score ≈ event_rate per bin. score = 1.0 lands in the top bin.
    * One hash-partitioned groupBy over ≤ `buckets` output rows — the
    * cheapest possible shape at any scale.
    *
    * Domain guard: the bucket id is clamped to [0, buckets-1] (float-noise
    * excursions like -1e-9 or 1.0000001 land in the edge bins instead of
    * fabricating out-of-contract bucket rows), and a NULL score fails
    * loudly — a silently-appearing null-bucket row is how a broken
    * upstream score column hides in a monitoring table. */
  def calibrationTable(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      buckets: Int = 10): DataFrame = {
    val s = col(scoreCol).cast("double")
    val clamped = greatest(lit(0), least(floor(s * buckets).cast("int"), lit(buckets - 1)))
    // NaN would otherwise pass isNotNull and silently land in bin 0
    // (floor(NaN)→0 under non-ANSI casts) — same hiding place as null
    val b = when(s.isNotNull && !isnan(s), clamped).otherwise(
      raise_error(lit(s"calibrationTable: null or NaN score in '$scoreCol'")).cast("int"))
    df.groupBy(b.as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(s), 6).as("mean_score"),
        round(avg(col(labelCol).cast("double")), 6).as("event_rate"))
      .orderBy(col("bucket"))
  }

  /** Isotonic score calibration — the production companion to
    * [[calibrationTable]]: fits the monotone step function minimizing
    * squared error between scores and labels (spark.ml's distributed
    * pool-adjacent-violators) and returns (model, mapping table). The
    * mapping table `(boundary, calibrated)` is the persistable artifact —
    * KBs, broadcast at scoring time; `applyCalibration` rescales a scored
    * frame through it with a pure expression (linear interpolation
    * between boundaries, the spark.ml transform contract) — no model
    * object needed at serving time.
    *
    * Scale shape: the fit is one spark.ml PAVA pass (sorts by score —
    * a distributed range sort, the irreducible cost of isotonic); the
    * mapping is bounded by the number of violator pools, not rows. */
  def fitIsotonicCalibration(
      df: DataFrame,
      scoreCol: String,
      labelCol: String): (org.apache.spark.ml.regression.IsotonicRegressionModel, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val model = new org.apache.spark.ml.regression.IsotonicRegression()
      .setFeaturesCol("__score")
      .setLabelCol("__label")
      .setIsotonic(true)
      .fit(df.select(
        col(scoreCol).cast("double").as("__score"),
        col(labelCol).cast("double").as("__label")))
    val mapping = model.boundaries.toArray.zip(model.predictions.toArray)
      .toSeq.toDF("boundary", "calibrated")
    (model, mapping)
  }

  /** Apply a persisted isotonic mapping table to a scored frame: adds
    * `calibrated` by piecewise-linear interpolation between boundaries
    * (clamped at the ends), matching spark.ml's transform semantics for
    * in-range scores. Pure scan — the mapping rides the plan as literal
    * arrays. */
  def applyCalibration(df: DataFrame, scoreCol: String, mapping: DataFrame): DataFrame = {
    val rows = mapping.select(col("boundary").cast("double"), col("calibrated").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    require(rows.nonEmpty, "applyCalibration: empty mapping table")
    val bs = rows.map(_._1)
    val ps = rows.map(_._2)
    val raw = col(scoreCol).cast("double")
    // same null/NaN discipline as calibrationTable: a silent null in a
    // production score column is exactly what this table would hide
    val s = when(raw.isNotNull && !isnan(raw), raw).otherwise(
      raise_error(lit(s"applyCalibration: null or NaN score in '$scoreCol'")).cast("double"))
    // piecewise-linear: find the bracketing boundary pair
    val expr0 = (0 until bs.length - 1).foldLeft(
      when(s <= bs.head, ps.head).when(s >= bs.last, ps.last)) { (acc, i) =>
      val (b0, b1, p0, p1) = (bs(i), bs(i + 1), ps(i), ps(i + 1))
      val interp =
        if (b1 == b0) lit(p1)
        else lit(p0) + (s - b0) * ((p1 - p0) / (b1 - b0))
      acc.when(s >= b0 && s < b1, interp)
    }
    df.withColumn("calibrated", round(expr0, 6))
  }

  /** Per-segment isotonic calibration: one mapping per value of
    * `groupCol` — the fairness-slice companion to
    * [[fitIsotonicCalibration]] (a global map can leave every slice
    * miscalibrated in opposite directions). The group collect is CAPPED
    * like the encoder fits: pointing this at a high-cardinality column
    * fails loudly instead of fanning out thousands of spark.ml fits.
    * Returns the union mapping table `(group, boundary, calibrated)`;
    * apply with [[applyCalibrationByGroup]]. */
  def fitIsotonicCalibrationByGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      labelCol: String,
      maxGroups: Int = 50): DataFrame = {
    val groups = df.select(col(groupCol).cast("string")).distinct()
      .limit(maxGroups + 1).collect().map(_.getString(0))
    require(groups.length <= maxGroups,
      s"fitIsotonicCalibrationByGroup: > $maxGroups groups in '$groupCol' — not a segment column")
    require(groups.exists(_ != null),
      s"fitIsotonicCalibrationByGroup: no non-null groups in '$groupCol'")
    groups.filter(_ != null).map { g =>
      val (_, m) = fitIsotonicCalibration(
        df.filter(col(groupCol).cast("string") === g), scoreCol, labelCol)
      m.select(lit(g).as("group"), col("boundary"), col("calibrated"))
    }.reduce(_.unionByName(_))
  }

  /** Apply a per-group mapping table: each row rescores through ITS
    * group's isotonic map (rows whose group has no map keep a null
    * `calibrated` — surfacing unseen segments instead of silently
    * passing raw scores through). */
  def applyCalibrationByGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      mapping: DataFrame): DataFrame = {
    val groups = mapping.select(col("group")).distinct().collect().map(_.getString(0))
    val applied = groups.map { g =>
      applyCalibration(
        df.filter(col(groupCol).cast("string") === g),
        scoreCol,
        mapping.filter(col("group") === g))
    }
    val unseen = df.filter(!col(groupCol).cast("string").isin(groups: _*) ||
        col(groupCol).isNull)
      .withColumn("calibrated", lit(null).cast("double"))
    (applied :+ unseen).reduce(_.unionByName(_))
  }

  /** Cumulative gains / lift table — the propensity-targeting artifact:
    * score quantile buckets (bucket 0 = highest scores), and for each the
    * cumulative share of positives captured (`gain`) and the response-rate
    * multiple vs. targeting at random (`lift`). "Top 2 deciles capture 60%
    * of bookings at 3x lift" is this table's row 1.
    *
    * Scale shape: one percentile pass learns the score edges (mergeable
    * approx sketch by default, exact for the oracle), bucket assignment is
    * an expression over the edges array, counts are one combinable
    * groupBy, and the cumulative window runs over ≤ `buckets` rows — the
    * documented bounded-global-window exception. */
  def liftTable(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      buckets: Int = 10,
      exact: Boolean = false): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val s = col(scoreCol).cast("double")
    val probes = (1 until buckets).map(_.toDouble / buckets)
    val edges = df.agg(graft.Exprs.pctArray(s, probes, exact).as("__e")).head().getSeq[Double](0)
    // bucket 0 = top scores: count of edges STRICTLY ABOVE the score.
    // Same null/NaN discipline as calibrationTable: a null score's filter
    // predicate drops every edge (bottom bucket), a NaN's keeps every
    // edge (top bucket) — both would silently skew gain/lift
    val bucket = when(s.isNotNull && !isnan(s),
      lit(edges.size) - size(filter(typedLit(edges), e => e <= s)))
      .otherwise(
        raise_error(lit(s"liftTable: null or NaN score in '$scoreCol'")).cast("int"))
    val cells = df
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("n_pos"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    cells
      .select(
        col("bucket"),
        col("n"),
        col("n_pos"),
        sum(col("n")).over(w).as("cum_n"),
        sum(col("n_pos")).over(w).as("cum_pos"),
        sum(col("n")).over(tot).as("__tn"),
        sum(col("n_pos")).over(tot).as("__tp"))
      .select(
        col("bucket"),
        col("n"),
        col("n_pos"),
        round(col("cum_pos").cast("double") / col("__tp"), 6).as("gain"),
        round(
          (col("cum_pos").cast("double") / col("cum_n")) /
            (col("__tp").cast("double") / col("__tn")), 6).as("lift"))
      .orderBy(col("bucket"))
  }

  /** Benchmark-evaluation results table (the eval-harness shape: one
    * row per task with sample count, correct count, accuracy, and the
    * binomial standard error √(p(1−p)/n), plus two rollup rows —
    * `__micro__`: the pooled accuracy over all samples with its own
    * binomial stderr; `__macro__`: the unweighted mean of task
    * accuracies, stderr by error propagation √(Σ se_t²)/T, the
    * aggregation eval harnesses report for task groups). Accuracies and
    * stderrs rounded to 6 decimals; rollups compute from the ROUNDED
    * per-task terms so the whole table replays cross-engine.
    *
    * Scale shape: ONE count aggregate per task, rollups are
    * projections of the |tasks|-row frame — sample volume is touched
    * exactly once. Output: task, n, n_correct, accuracy, stderr. */
  def evalSummary(
      results: DataFrame,
      taskCol: String,
      correctCol: String): DataFrame = {
    val tasks = results
      .groupBy(col(taskCol).cast("string").as("task"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(correctCol).cast("boolean"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("task"), col("n"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n"), 6).as("accuracy"))
      .withColumn("stderr",
        round(sqrt(col("accuracy") * (lit(1.0) - col("accuracy")) / col("n")), 6))
    val micro = tasks.agg(
      coalesce(sum(col("n")), lit(0L)).as("n"),
      coalesce(sum(col("n_correct")), lit(0L)).as("n_correct"))
      .select(lit("__micro__").as("task"), col("n"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n"), 6).as("accuracy"))
      .withColumn("stderr",
        round(sqrt(col("accuracy") * (lit(1.0) - col("accuracy")) / col("n")), 6))
    val macroRow = tasks.agg(
      coalesce(sum(col("n")), lit(0L)).as("n"),
      coalesce(sum(col("n_correct")), lit(0L)).as("n_correct"),
      round(avg(col("accuracy")), 6).as("accuracy"),
      round(sqrt(sum(col("stderr") * col("stderr"))) /
        count(lit(1)), 6).as("stderr"))
      .select(lit("__macro__").as("task"), col("n"), col("n_correct"),
        col("accuracy"), col("stderr"))
    tasks.unionByName(micro).unionByName(macroRow)
  }

  /** Retrieval ranking metrics PER QUERY over arbitrary user-labeled
    * frames — the evaluation half of the ANN/hybrid serving surface
    * ([[graft.similarity.AnnIndex]] search output, `rrfFuse`, `mmrRerank`
    * all produce exactly the (query, candidate, rank) shape this grades):
    *
    *   - `dcg` / `idcg` / `ndcg` at k with GRADED relevance
    *     (gain 2^rel − 1, log2(position+1) discount — Järvelin &
    *     Kekäläinen 2002); `ndcg` is null for queries with no relevant
    *     labels (0/0 is undefined, not perfect and not zero)
    *   - `reciprocal_rank` (rank of the first rel>0 hit; 0 if none —
    *     average it for MRR)
    *   - `precision_at_k` = relevant retrieved in top-k / k, and
    *     `recall_at_k` = relevant retrieved in top-k / total relevant
    *     (null when the query has no relevant labels)
    *   - `average_precision` = Σ over relevant hits in the top-k of
    *     (precision at that hit's rank) / TOTAL relevant (the standard
    *     pooled convention — unretrieved relevant docs drag AP down);
    *     null for zero-relevant queries, like ndcg/recall. Graded labels
    *     binarize as rel > 0 for AP (AP is a binary-relevance metric).
    *
    * `results` carries ranked candidates (`rankCol` 1-based; rows with
    * rank > k are ignored, so passing a deeper list is fine); `relevance`
    * carries (query, candidate, grade ≥ 0) labels — binary labels are the
    * rel ∈ {0,1} special case. Duplicate relevance rows for one
    * (query, candidate) are folded to their MAX grade here (a duplicated
    * label must not fan the join and double-count dcg/n_relevant);
    * `results` rows are assumed unique per (query, candidate) — a
    * retrieval list that returns the same candidate twice is a caller
    * bug this function cannot repair. Queries appearing in only one
    * frame still get a row (zero-retrieved or zero-relevant semantics
    * above).
    *
    * Scale shape: one keyed equi-join on (query, candidate) + per-query
    * aggregates; the ideal-DCG window is PARTITIONED by query (frame =
    * that query's labels), never a global sort. Ties in the ideal
    * ordering break by candidate id, so the metric is deterministic and
    * engine-portable. */
  def rankingMetrics(
      results: DataFrame,
      relevance: DataFrame,
      queryCol: String,
      candCol: String,
      rankCol: String,
      relCol: String = "rel",
      k: Int = 10): DataFrame = {
    require(k > 0, s"rankingMetrics: k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val topk = results.filter(col(rankCol) <= k)
      .select(col(queryCol), col(candCol),
        col(rankCol).cast("double").as("__rank"))
    // fold duplicate labels to max grade BEFORE the join: a duplicated
    // (query, candidate) relevance row would otherwise fan the left join
    // and silently double-count dcg/hits and inflate n_relevant
    val rels = relevance.select(col(queryCol), col(candCol),
        col(relCol).cast("double").as("__rel"))
      .groupBy(col(queryCol), col(candCol))
      .agg(max(col("__rel")).as("__rel"))
    // unlabeled retrieved candidates count as rel 0 (the standard pooled-
    // judgment convention), so the join stays a LEFT join, not inner
    val cumW = Window.partitionBy(col(queryCol))
      .orderBy(col("__rank"), col(candCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perQ = topk.join(rels, Seq(queryCol, candCol), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0.0)))
      // relevant hits at rank <= r — the precision@r numerator AP sums;
      // the window is PARTITIONED by query (frame = that query's top-k)
      .withColumn("__cumhits",
        sum(when(col("__rel") > 0, 1.0).otherwise(0.0)).over(cumW))
      .groupBy(col(queryCol))
      .agg(
        sum((pow(lit(2.0), col("__rel")) - 1) / log2(col("__rank") + 1))
          .as("__dcg"),
        sum(when(col("__rel") > 0, 1L).otherwise(0L)).as("__hits"),
        min(when(col("__rel") > 0, col("__rank"))).as("__first"),
        sum(when(col("__rel") > 0, col("__cumhits") / col("__rank")))
          .as("__apn"),
        count(lit(1)).as("n_retrieved"))
    val ideal = rels.filter(col("__rel") > 0)
      .withColumn("__i", row_number().over(
        Window.partitionBy(col(queryCol))
          .orderBy(col("__rel").desc, col(candCol))))
      .groupBy(col(queryCol))
      .agg(
        sum(when(col("__i") <= k,
          (pow(lit(2.0), col("__rel")) - 1) / log2(col("__i") + 1)))
          .as("__idcg"),
        count(lit(1)).as("n_relevant"))
    perQ.join(ideal, Seq(queryCol), "full_outer")
      .select(
        col(queryCol),
        round(coalesce(col("__dcg"), lit(0.0)), 6).as("dcg"),
        round(coalesce(col("__idcg"), lit(0.0)), 6).as("idcg"),
        round(when(col("__idcg") > 0,
          coalesce(col("__dcg"), lit(0.0)) / col("__idcg")), 6).as("ndcg"),
        round(coalesce(col("__hits"), lit(0L)) / lit(k.toDouble), 6)
          .as("precision_at_k"),
        round(when(col("n_relevant") > 0,
          coalesce(col("__hits"), lit(0L)) / col("n_relevant")), 6)
          .as("recall_at_k"),
        round(when(col("n_relevant") > 0,
          coalesce(col("__apn"), lit(0.0)) / col("n_relevant")), 6)
          .as("average_precision"),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 6)
          .as("reciprocal_rank"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"))
  }

  /** One-row fleet summary of [[rankingMetrics]] output — what a user
    * tuning nprobe / refine / RRF weights reads, plus the query counts
    * that say how much of the label set the numbers rest on.
    *
    * Zero-relevant (unlabeled) queries are NOT treated uniformly across
    * columns — each follows its metric's standard convention, so read
    * them against `n_labeled` vs `n_queries`:
    *   - `mrr` averages over ALL queries, counting zero-relevant ones as
    *     rr 0 (their rr IS 0: no relevant doc to reciprocate).
    *   - `mean_ndcg`, `mean_recall_at_k`, `mean_ap` average over LABELED
    *     queries only (the per-query value is null when 0/0 is
    *     undefined; avg skips nulls in both engines).
    *   - `mean_precision_at_k` averages over ALL queries — a
    *     zero-relevant query's precision is a well-defined 0, so an
    *     unlabeled-heavy frame drags this column while leaving
    *     `mean_ndcg`/`mean_ap` untouched. Compare the two regimes via
    *     `n_labeled / n_queries` before reading precision against ndcg. */
  def rankingMetricsSummary(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      sum(when(col("n_relevant") > 0, 1L).otherwise(0L)).as("n_labeled"),
      round(avg(col("reciprocal_rank")), 6).as("mrr"),
      round(avg(col("ndcg")), 6).as("mean_ndcg"),
      round(avg(col("average_precision")), 6).as("mean_ap"),
      round(avg(col("precision_at_k")), 6).as("mean_precision_at_k"),
      round(avg(col("recall_at_k")), 6).as("mean_recall_at_k"))
}
