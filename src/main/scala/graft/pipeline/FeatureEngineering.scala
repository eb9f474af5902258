package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's core feature-engineering program re-expressed as one
  * declarative DataFrame pipeline
  * (reference: production/feature_engineering.py:101-167):
  * per-key recency/total aggregates from activity streams, a common-consumer
  * inner-join restriction, a left-join feature merge, and a label left-join
  * with fill(0).
  *
  * Scale design: every aggregate is a map-side-combinable groupBy on the
  * join key, so each activity source shuffles once on the same key; the
  * merge joins are all on that key (AQE can broadcast the smaller
  * aggregates). No window functions, no driver collects.
  */
object FeatureEngineering {

  /** Per-key recency (min days before refDate) + total(value) from an event
    * stream filtered to rows at/before refDate
    * (reference: feature_engineering.py:118-156). */
  def recencyTotals(
      events: DataFrame,
      keyCol: String,
      dateCol: String,
      valueCol: String,
      refDate: String,
      prefix: String): DataFrame = {
    val d = to_date(col(dateCol))
    events
      .filter(d <= lit(refDate).cast("date"))
      .groupBy(col(keyCol))
      .agg(
        min(datediff(lit(refDate).cast("date"), d)).as(s"last_${prefix}_date_diff"),
        sum(col(valueCol)).as(s"total_${prefix}_value"))
  }

  /** Exponentially time-decayed per-key total:
    * `sum(value * 2^(-age_days / halfLifeDays))` over events at/before
    * refDate — the standard recency-weighted engagement feature the flat
    * `recencyTotals` sum cannot express (a purchase yesterday counts ~full,
    * one half-life ago counts half).
    *
    * One map-side-combinable groupBy on the key — same shuffle shape as
    * `recencyTotals`, so at 100 TB it pipelines into the same Exchange.
    * Numeric discipline: the decay weight is quantized to 8 decimals and
    * multiplied against the decimal(18,2) view of value, so every per-row
    * term is exact decimal and the sum is order-insensitive (partition
    * count can't flip a bit); callers round the final double for display.
    */
  def decayedTotals(
      events: DataFrame,
      keyCol: String,
      dateCol: String,
      valueCol: String,
      refDate: String,
      halfLifeDays: Double,
      prefix: String): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be > 0, got $halfLifeDays")
    val d = to_date(col(dateCol))
    val age = datediff(lit(refDate).cast("date"), d)
    val c = -math.log(2.0) / halfLifeDays
    val w = round(exp(age * lit(c)), 8).cast("decimal(12,8)")
    events
      .filter(d <= lit(refDate).cast("date"))
      .groupBy(col(keyCol))
      .agg(
        sum(col(valueCol).cast("decimal(18,2)") * w)
          .cast("double")
          .as(s"decayed_${prefix}_value"),
        count(lit(1)).as(s"n_${prefix}_events"))
  }

  /** Ordered funnel: for each key, the earliest event time completing each
    * step of `steps` IN ORDER — step i's timestamp is the minimum event of
    * type steps(i) at/after the key's step i-1 timestamp. A key that never
    * reaches step i gets null there and for all later steps (an early
    * purchase before the first view does NOT count as funnel progress).
    *
    * Greedy-earliest is the standard funnel semantics: taking the earliest
    * valid timestamp at each step never excludes a key that any other
    * step-time choice would admit (a later step-i event only shrinks the
    * window for step i+1).
    *
    * Plan shape: one aggregate for the first step, then per additional step
    * one equi-join + groupBy on the SAME key — every shuffle is on the
    * funnel key, so AQE/co-partitioning reuses the exchange, and each
    * aggregate is map-side combinable. No windows, no per-key event-list
    * collection — at 100 TB a key's full history never has to fit anywhere.
    * Output timestamps are epoch seconds (`<step>_sec` columns).
    */
  def funnelSteps(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps needs at least one step")
    require(steps.distinct == steps, s"funnel steps must be distinct, got $steps")
    val tsec = unix_timestamp(col(tsCol))
    def stepCol(i: Int) = s"${steps(i)}_sec"
    var state = events
      .filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol))
      .agg(min(tsec).as(stepCol(0)))
    for (i <- 1 until steps.length) {
      val nxt = events
        .filter(col(typeCol) === steps(i))
        .select(col(keyCol), tsec.as("__t"))
      // prior step columns are constant per key, so min() re-selects them
      val keep = (0 until i).map(j => min(col(stepCol(j))).as(stepCol(j)))
      val aggs = keep :+
        min(when(col("__t") >= col(stepCol(i - 1)), col("__t"))).as(stepCol(i))
      state = state
        .join(nxt, Seq(keyCol), "left")
        .groupBy(col(keyCol))
        .agg(aggs.head, aggs.tail: _*)
    }
    state
  }

  /** Cohort retention: keys are bucketed by first-activity period (cohort),
    * and each (cohort, period-offset) cell reports how many of the cohort's
    * keys were active that period — the classic retention triangle.
    *
    * Periods are `periodDays`-wide buckets of days-since-epoch (period 0 =
    * 1970-01-01), so bucket boundaries are data-independent and stable
    * across incremental recomputes. Plan: one groupBy(key) for cohort
    * assignment, an equi-join back on the SAME key (co-partitioned with the
    * aggregate that produced it), a distinct-count per (cohort, offset),
    * and a broadcast-sized join against per-cohort sizes (|cohorts| rows).
    * The only full-data shuffles are on the high-cardinality key.
    */
  def cohortRetention(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      periodDays: Int): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    val day = datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
    val ev = events.select(col(keyCol), floor(day / periodDays).as("__p"))
    val cohorts = ev.groupBy(col(keyCol)).agg(min(col("__p")).as("cohort_p"))
    val sizes = cohorts.groupBy(col("cohort_p")).agg(count(lit(1)).as("cohort_size"))
    ev.join(cohorts, Seq(keyCol))
      .groupBy(col("cohort_p"), (col("__p") - col("cohort_p")).as("period_offset"))
      .agg(countDistinct(col(keyCol)).as("active_keys"))
      .join(broadcast(sizes), Seq("cohort_p"))
      .select(
        col("cohort_p"),
        col("period_offset"),
        col("active_keys"),
        col("cohort_size"),
        round(col("active_keys") / col("cohort_size"), 6).as("retention"))
  }

  /** Distinct keys with target_var=1 for events inside the label window
    * (refDate, refDate + windowDays] (reference: data_cleaning.py:132-148 +
    * feature_engineering.py:111-115). */
  def labelTable(df: DataFrame, keyCol: String, dateCol: String, refDate: String, windowDays: Int): DataFrame = {
    val d = to_date(col(dateCol))
    df.filter(
        d > lit(refDate).cast("date") &&
          d <= date_add(lit(refDate).cast("date"), windowDays))
      .select(col(keyCol))
      .distinct()
      .withColumn("target_var", lit(1))
  }

  /** Rolling event-time aggregate per key: sum(value) and count over the
    * trailing `days` window ending at each event. A PARTITIONED range
    * window (key-partitioned, ordered by epoch seconds) — every key's
    * history sorts within its own partition, so the frame is scale-safe
    * wherever the per-key history fits a task, the same condition any
    * sessionization has. */
  def rollingValue(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      days: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(unix_timestamp(col(tsCol)))
      .rangeBetween(-days.toLong * 86400, 0)
    events.select(
      col(keyCol),
      col(tsCol),
      sum(col(valueCol).cast("decimal(18,2)")).over(w).cast("double").as(s"rolling_${days}d_value"),
      count(lit(1)).over(w).as(s"rolling_${days}d_events"))
  }

  /** Gap-based batch sessionization: events more than `gapSeconds` of
    * event time apart start a new session per key. lag + cumulative-sum
    * windows, both PARTITIONED by key (no global sort); tie timestamps
    * land in the same session on any engine because the cumulative RANGE
    * frame includes all ties. The batch twin of
    * streaming.Streaming.sessionizeAppend. */
  def sessionizeBatch(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      gapSeconds: Long): DataFrame = {
    val t = unix_timestamp(col(tsCol))
    val byTs = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol)).orderBy(t)
    val brk = when(t - lag(t, 1).over(byTs) > gapSeconds, 1).otherwise(0)
    events
      .select(col(keyCol), t.as("__t"), col(valueCol).as("__v"), brk.as("__brk"))
      .withColumn("session_id",
        sum(col("__brk")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol)).orderBy(col("__t")))
          .cast("int"))
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col("__t")).as("start_sec"),
        max(col("__t")).as("end_sec"),
        count(lit(1)).as("n_events"),
        sum(col("__v").cast("decimal(18,2)")).cast("double").as("total_value"))
  }

  /** Adjacent-event features per key: previous/next value and the gap (in
    * seconds) since the previous event, via lag/lead over a PARTITIONED
    * window ordered by (epoch seconds, value) — the value tiebreak makes
    * neighbor assignment deterministic when timestamps collide at second
    * granularity. Callers should deduplicate (key, ts, value) first if the
    * stream can carry exact duplicates. */
  def adjacentFeatures(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val t = unix_timestamp(col(tsCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(t, col(valueCol))
    events.select(
      col(keyCol),
      t.as("ts_sec"),
      col(valueCol),
      lag(col(valueCol), 1).over(w).as("prev_value"),
      lead(col(valueCol), 1).over(w).as("next_value"),
      (t - lag(t, 1).over(w)).as("gap_sec"))
  }

  /** Per-key rank family over an event stream: row_number / rank /
    * percent_rank / cume_dist / ntile by (epoch seconds, value) within each
    * key. All windows are PARTITIONED by the (high-cardinality) key —
    * millions of small sorted runs, never a global sort; ranking within a
    * LOW-cardinality partition column at corpus scale needs a different
    * (two-pass prefix-sum) plan and is intentionally not this operator. */
  def rankFeatures(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      ntiles: Int = 4): DataFrame = {
    val t = unix_timestamp(col(tsCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(t, col(valueCol))
    events.select(
      col(keyCol),
      t.as("ts_sec"),
      col(valueCol),
      row_number().over(w).as("rn"),
      rank().over(w).as("rnk"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"),
      ntile(ntiles).over(w).as("quartile"))
  }

  /** Merge: restrict to keys present in every source (the reference's
    * common-consumer inner joins, feature_engineering.py:101-109), attach
    * every feature table, then label left-join + fill(0).
    *
    * The common-key restriction is expressed by inner-joining the FULL
    * feature frames (each aggregate has unique keys, so this adds no row
    * multiplicity) rather than building a separate keys-only `common` frame
    * first: that formulation referenced each aggregate twice and Catalyst
    * re-computed every source's filter+shuffle+agg — six scans of the
    * biggest tables instead of three. Here each source is aggregated
    * exactly once (one Exchange per source, asserted in OperatorsSpec). */
  def merge(
      base: DataFrame,
      keyCol: String,
      features: Seq[DataFrame],
      label: DataFrame,
      labelKeyCol: String): DataFrame = {
    val joinedFeatures = features.reduce((a, b) => a.join(b, Seq(keyCol), "inner"))
    base
      .join(joinedFeatures, Seq(keyCol), "inner")
      .join(label.withColumnRenamed(labelKeyCol, keyCol), Seq(keyCol), "left")
      .na.fill(0, Seq("target_var"))
  }
}
