package graft.queries

import graft.pipeline.FeatureEngineering
import graft.sampling.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Support._

/** The E1 end-to-end feature pipeline (the reference's flagship program)
  * plus sampling/split queries (seeded RNG — registered without oracle,
  * validated by property tests instead). */
object PipelineQueries {

  private val evRef = "2024-01-15"
  private val lblRef = "1997-06-30"

  def e1(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumnRenamed("user_id", "c_custkey")
    def src(tpe: String) =
      FeatureEngineering.recencyTotals(
        ev.filter(col("event_type") === tpe), "c_custkey", "ts", "value", evRef, tpe)
    val label = FeatureEngineering.labelTable(
      t(s, dir, "orders"), "o_custkey", "o_orderdate", lblRef, 90)
    val merged = FeatureEngineering.merge(
      t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment")),
      "c_custkey",
      Seq(src("click"), src("view"), src("purchase")),
      label,
      "o_custkey")
    merged
      .select(
        col("c_custkey"),
        col("c_acctbal"),
        col("c_mktsegment"),
        col("last_click_date_diff"),
        r6(col("total_click_value")).as("total_click_value"),
        col("last_view_date_diff"),
        r6(col("total_view_value")).as("total_view_value"),
        col("last_purchase_date_diff"),
        r6(col("total_purchase_value")).as("total_purchase_value"),
        col("target_var"))
      .orderBy(col("c_custkey"))
  }

  /** Decay constant for the half-life-7d decayed aggregate; embedded
    * verbatim in the oracle SQL so both engines evaluate exp() over the
    * identical double. */
  private val decayC: Double = -math.log(2.0) / 7.0

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_feature_pipeline" -> (e1 _),
    // --- recency-weighted engagement: half-life-decayed per-user value
    "decayed_agg" -> { (s, dir) =>
      FeatureEngineering
        .decayedTotals(events(s, dir), "user_id", "ts", "value", evRef, halfLifeDays = 7.0, "all")
        .select(
          col("user_id"),
          r6(col("decayed_all_value")).as("decayed_all_value"),
          col("n_all_events"))
        .orderBy(col("user_id"))
    },
    // --- ordered funnel: earliest view -> click-after-view ->
    // purchase-after-click per user (null once a step is unreached)
    "funnel_steps" -> { (s, dir) =>
      FeatureEngineering
        .funnelSteps(events(s, dir), "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))
    },
    // --- retention triangle: first-activity cohorts x period offset
    "cohort_retention" -> { (s, dir) =>
      FeatureEngineering
        .cohortRetention(events(s, dir), "user_id", "ts", periodDays = 7)
        .orderBy(col("cohort_p"), col("period_offset"))
    },
    // --- mergeable distinct-count state (HLL sketches): fold two batch
    // states and read estimates. Sketch bytes have no DuckDB twin, so the
    // oracle checks derived scalars: the exact per-key distinct count
    // (computable by both engines) plus a within-5% flag on the merged
    // sketch's estimate — a FALSE anywhere breaks the hash match
    "hll_distinct_state" -> { (s, dir) =>
      import graft.dp.IncrementalAgg._
      val ev = events(s, dir)
      val cut = lit("2024-01-15").cast("date")
      val merged = mergeDistinctSketches(
        distinctSketch(ev.filter(to_date(col("ts")) <= cut), "user_id", "props"),
        distinctSketch(ev.filter(to_date(col("ts")) > cut), "user_id", "props"),
        "user_id")
      val exact = ev.groupBy(col("user_id"))
        .agg(countDistinct(col("props")).as("exact_distinct"))
      estimateDistinct(merged, "user_id")
        .join(exact, Seq("user_id"))
        .select(
          col("user_id"),
          col("exact_distinct"),
          (abs(col("approx_distinct") - col("exact_distinct")) <=
            greatest(lit(1.0), col("exact_distinct") * 0.05)).as("within_tol"))
        .orderBy(col("user_id"))
    },
    // --- mergeable quantile state: like hll_distinct_state, sketch bytes
    // have no DuckDB twin, so the oracle checks derived scalars — the exact
    // per-key row count plus GK rank-bound flags on the merged sketch's
    // p50/p90 estimates, all of which must be uniformly TRUE
    "quantile_sketch_state" -> { (s, dir) =>
      import graft.dp.QuantileState._
      val ev = events(s, dir)
      val cut = lit("2024-01-15").cast("date")
      val probs = Seq(0.5, 0.9)
      val merged = mergeQuantileSketches(
        quantileSketch(ev.filter(to_date(col("ts")) <= cut), "user_id", "value"),
        quantileSketch(ev.filter(to_date(col("ts")) > cut), "user_id", "value"),
        "user_id")
      rankWithinBound(ev, estimateQuantiles(merged, "user_id", probs),
          "user_id", "value", probs)
        .orderBy(col("user_id"))
    },
    // --- incremental state maintenance: merge(state(batch1), state(batch2))
    // must equal a from-scratch aggregate over all rows — the oracle IS the
    // from-scratch recompute
    "incremental_agg_state" -> { (s, dir) =>
      import graft.dp.IncrementalAgg._
      val ev = events(s, dir)
      val cut = lit("2024-01-15").cast("date")
      val merged = mergeStates(
        aggState(ev.filter(to_date(col("ts")) <= cut), "user_id", "value"),
        aggState(ev.filter(to_date(col("ts")) > cut), "user_id", "value"),
        "user_id")
      merged
        .select(
          col("user_id"), col("n"),
          col("sum_v").cast("double").as("sum_v"),
          col("min_v"), col("max_v"))
        .orderBy(col("user_id"))
    },
    // --- Count-Min Sketch frequency state: built as TWO batch states
    // folded with cmsMerge, estimated per item. The md5-derived slots are
    // engine-portable, so the oracle rebuilds the EXACT counter table from
    // all rows in DuckDB — a full hash match that simultaneously proves
    // merge(state(A), state(B)) == state(A ∪ B) and the one-sided
    // never-undercount guarantee (width 256 forces real collisions)
    "cms_frequency" -> { (s, dir) =>
      import graft.dp.IncrementalAgg._
      val ev = events(s, dir).select(col("user_id"))
      val merged = cmsMerge(
        cmsState(ev.filter(col("user_id") % 2 === 0), "user_id", width = 256, depth = 4),
        cmsState(ev.filter(col("user_id") % 2 =!= 0), "user_id", width = 256, depth = 4))
      val truth = ev.groupBy(col("user_id")).agg(count(lit(1)).as("true_n"))
      cmsEstimate(merged, truth.filter(col("user_id") < 50), "user_id")
        .join(truth, Seq("user_id"))
        .select(col("user_id"), col("true_n"), col("est"),
          (col("est") >= col("true_n")).as("never_undercounts"))
        .orderBy(col("user_id"))
    },
    "sessionize_batch" -> { (s, dir) =>
      val ev = events(s, dir).filter(col("user_id") < 50)
      FeatureEngineering
        .sessionizeBatch(ev, "user_id", "ts", "value", gapSeconds = 1800)
        .orderBy(col("user_id"), col("session_id"))
    },
    // --- the built-in session_window form of sessionization: same gap
    // semantics expressed as a grouping expression (break at diff >= gap;
    // the lag/cumsum form breaks at > gap — both oracled). ts floored to
    // seconds so boundaries match the second-granular oracle exactly
    "session_window_agg" -> { (s, dir) =>
      val ev = events(s, dir).filter(col("user_id") < 50)
        .withColumn("tss", timestamp_seconds(unix_timestamp(col("ts"))))
      ev.groupBy(col("user_id"), session_window(col("tss"), "1800 seconds").as("w"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(
          col("user_id"),
          unix_timestamp(col("w.start")).as("start_sec"),
          unix_timestamp(col("w.end")).as("end_sec"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("start_sec"))
    },
    "time_buckets" -> { (s, dir) =>
      events(s, dir)
        .groupBy(
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_sec"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy(col("hour_sec"), col("event_type"))
    },
    "rolling_window" -> { (s, dir) =>
      val ev = events(s, dir).filter(col("user_id") < 50)
      FeatureEngineering
        .rollingValue(ev, "user_id", "ts", "value", days = 7)
        .select(
          col("user_id"),
          unix_timestamp(col("ts")).as("ts_sec"),
          col("rolling_7d_value"),
          col("rolling_7d_events"))
        .orderBy(col("user_id"), col("ts_sec"), col("rolling_7d_value"))
    },
    // --- backward as-of join: latest purchase at/before each click.
    // Timestamp discipline: Spark reads the nanos parquet column truncated
    // to MICROS (Support.events), so the oracle compares at epoch_ns//1000
    // — comparing at full nanos would flip inequalities for rows whose
    // micros collide but nanos differ.
    "asof_join" -> { (s, dir) =>
      val ev = events(s, dir)
      val probe = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
        .dropDuplicates(Seq("user_id", "ts", "value"))
      val ref = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("purchase_value"))
      graft.dp.Temporal
        .asofJoinBackward(probe, ref, Seq("user_id"), "ts", "ts", Seq("purchase_value"))
        .select(
          col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("value"),
          unix_micros(col("asof_ts")).as("asof_ts_us"),
          col("asof_purchase_value"))
        .orderBy(col("user_id"), col("ts_us"), col("value"))
    },
    // --- last-touch attribution: each purchase credited to the user's
    // latest click at-or-before it, void past a 7-day horizon — the as-of
    // join composed with a window guard (one shuffle, no inequality join)
    "attribution_last_touch" -> { (s, dir) =>
      val ev = events(s, dir)
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
        .dropDuplicates(Seq("user_id", "ts", "value"))
      val ref = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts")).distinct()
      val horizonUs = 7L * 86400L * 1000000L
      graft.dp.Temporal
        .asofJoinBackward(probe, ref, Seq("user_id"), "ts", "ts", Nil)
        .select(
          col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("value"),
          when(
            unix_micros(col("asof_ts")).isNotNull &&
              unix_micros(col("ts")) - unix_micros(col("asof_ts")) <= horizonUs,
            unix_micros(col("asof_ts"))).as("attributed_click_us"))
        .orderBy(col("user_id"), col("ts_us"), col("value"))
    },
    // --- batch range join: events × overlapping campaign windows via
    // bucketed equi-join (no nested-loop) — each event meets a window in
    // exactly one day-cell, overlaps produce one row per containing window
    "range_join" -> { (s, dir) =>
      val ev = events(s, dir)
        .select(col("event_id"), unix_timestamp(col("ts")).as("pt"))
      val iv = s.range(12).select(
        col("id").as("w_id"),
        (lit(1704067200L) + col("id") * 259200L).as("w_start"),
        (lit(1704067200L) + col("id") * 259200L + 432000L).as("w_end"))
      graft.dp.Temporal
        .rangeJoin(ev, iv, "pt", "w_start", "w_end", bucketWidth = 86400L)
        .select(col("event_id"), col("w_id"))
        .orderBy(col("event_id"), col("w_id"))
    },
    "lag_lead" -> { (s, dir) =>
      val ev = events(s, dir).filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("value"))
        .dropDuplicates(Seq("user_id", "ts", "value"))
      FeatureEngineering.adjacentFeatures(ev, "user_id", "ts", "value")
        .orderBy(col("user_id"), col("ts_sec"), col("value"))
    },
    "rank_features" -> { (s, dir) =>
      val ev = events(s, dir).filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("value"))
        .dropDuplicates(Seq("user_id", "ts", "value"))
      FeatureEngineering.rankFeatures(ev, "user_id", "ts", "value", ntiles = 4)
        .orderBy(col("user_id"), col("rn"))
    },
    "temporal_split" -> { (s, dir) =>
      val ev = events(s, dir).select(col("user_id"), unix_micros(col("ts")).as("t"))
      val (train, test) = Sampling.temporalSplit(ev, "t", 0.8, exact = Support.exact)
      train.withColumn("split", lit("train"))
        .unionByName(test.withColumn("split", lit("test")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("t")).as("min_t"), max(col("t")).as("max_t"))
        .orderBy(col("split"))
    },
    // --- weighted corpus sampling (A-ES over portable md5 priorities):
    // the oracle reproduces the exact draw from md5(doc_id:seed)
    "weighted_sample" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("w", col("n_chars").cast("double") + 1.0)
      Sampling.weightedSample(docs, "w", k = 25, seed = 42,
          stratumCols = Seq("lang"), hashCols = Seq("doc_id"))
        .orderBy(col("lang"), col("rank"))
    },
    // engine-portable stratified split over the md5 draw: the oracle
    // reproduces every row's train/test assignment, checked here as
    // per-(split, class) counts. The seeded JVM-RNG stratifiedSplit stays
    // covered by PropertySpec ratio invariants.
    "stratified_split" -> { (s, dir) =>
      val df = t(s, dir, "customer").withColumn("y", (col("c_acctbal") > 0).cast("int"))
      Sampling.stratifiedSplitHash(df, "y", 0.3, idCol = "c_custkey", salt = "s6")
        .groupBy(col("split"), col("y"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("split"), col("y"))
    },
    // --- exact-count rebalance over portable md5 priorities: the oracle
    // reproduces the same per-class reservoir row for row
    "rebalance_sample" -> { (s, dir) =>
      val df = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .withColumn("y", (col("c_acctbal") > 5000).cast("int"))
      Sampling.rebalanceExact(df, "y", maxSampleSize = 200, idCol = "c_custkey", salt = "r6")
        .orderBy(col("y"), col("rank"))
    })

  private def srcSql(tpe: String): String =
    s"""SELECT user_id,
       |  CAST(min(date_diff('day', CAST(ts AS DATE), DATE '$evRef')) AS INT) AS last_${tpe}_date_diff,
       |  sum(value) AS total_${tpe}_value
       |FROM events
       |WHERE event_type = '$tpe' AND CAST(ts AS DATE) <= DATE '$evRef'
       |GROUP BY user_id""".stripMargin

  val oracle: Map[String, String] = Map(
    // A-ES weighted sample: mirror the md5(doc_id:seed) draw exactly —
    // first 13 hex chars = 52 uniform bits, u = (v + 0.5) / 2^52,
    // priority = -ln(u)/w, smallest k per stratum win (rank 1 = smallest)
    // portable md5 split: the oracle mirrors the per-row draw bit for bit
    "stratified_split" ->
      """WITH d AS (SELECT c_custkey,
        |    CAST(c_acctbal > 0 AS INT) AS y FROM customer),
        |s AS (SELECT y,
        |    CASE WHEN (CAST('0x' || substring(md5(
        |        CAST(y AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR) || ':s6'),
        |        1, 13) AS BIGINT) + 0.5) / 4503599627370496.0 < 0.3
        |      THEN 'test' ELSE 'train' END AS split
        |  FROM d)
        |SELECT split, y, CAST(count(*) AS BIGINT) AS n
        |FROM s GROUP BY split, y ORDER BY split, y""".stripMargin,
    "weighted_sample" ->
      """WITH d AS (SELECT doc_id, lang, n_chars,
        |    CAST(n_chars AS DOUBLE) + 1.0 AS w FROM documents),
        |p AS (SELECT *,
        |    -ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13)
        |         AS BIGINT) + 0.5) / 4503599627370496.0) / w AS prio
        |  FROM d WHERE w > 0),
        |r AS (SELECT doc_id, lang, n_chars, w,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY prio) AS INT) AS rank
        |  FROM p)
        |SELECT * FROM r WHERE rank <= 25 ORDER BY lang, rank""".stripMargin,
    // exact rebalance: same md5 reservoir, k = least(cap, smallest class)
    "rebalance_sample" ->
      """WITH d AS (SELECT c_custkey, c_acctbal,
        |    CAST(c_acctbal > 5000 AS INT) AS y FROM customer),
        |m AS (SELECT least(200, min(n)) AS k
        |      FROM (SELECT count(*) AS n FROM d GROUP BY y)),
        |r AS (SELECT y, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY y
        |      ORDER BY md5(CAST(c_custkey AS VARCHAR) || 'r6') DESC) AS rn
        |  FROM d)
        |SELECT y, CAST(rn AS INT) AS rank, c_custkey, c_acctbal
        |FROM r, m WHERE rn <= k ORDER BY y, rank""".stripMargin,
    // HLL state: the oracle is the exact distinct count; within_tol must
    // be uniformly TRUE for the hash to match
    "hll_distinct_state" ->
      """SELECT user_id, CAST(count(DISTINCT props) AS BIGINT) AS exact_distinct,
        |  TRUE AS within_tol
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,
    // quantile state: the oracle is the exact per-key row count; the GK
    // rank-bound flags must be uniformly TRUE for the hash to match
    "quantile_sketch_state" ->
      """SELECT user_id, CAST(count(value) AS BIGINT) AS n, TRUE AS count_exact,
        |  TRUE AS within_q_50, TRUE AS within_q_90
        |FROM events WHERE value IS NOT NULL GROUP BY 1 ORDER BY user_id""".stripMargin,
    "cohort_retention" ->
      """WITH e AS (SELECT DISTINCT user_id,
        |    CAST(floor(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS p
        |  FROM events),
        |c AS (SELECT user_id, min(p) AS cohort_p FROM e GROUP BY 1),
        |s AS (SELECT cohort_p, CAST(count(*) AS BIGINT) AS cohort_size FROM c GROUP BY 1),
        |a AS (SELECT c.cohort_p, e.p - c.cohort_p AS period_offset,
        |        CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_keys
        |      FROM e JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT a.cohort_p, a.period_offset, a.active_keys, s.cohort_size,
        |       round(a.active_keys / s.cohort_size, 6) AS retention
        |FROM a JOIN s USING (cohort_p)
        |ORDER BY cohort_p, period_offset""".stripMargin,
    "decayed_agg" ->
      s"""WITH e AS (SELECT user_id,
         |  date_diff('day', CAST(ts AS DATE), DATE '$evRef') AS age, value
         |  FROM events WHERE CAST(ts AS DATE) <= DATE '$evRef')
         |SELECT user_id,
         |  round(CAST(sum(CAST(value AS DECIMAL(18,2))
         |    * CAST(round(exp(age * ($decayC)), 8) AS DECIMAL(12,8))) AS DOUBLE), 6)
         |    AS decayed_all_value,
         |  CAST(count(*) AS BIGINT) AS n_all_events
         |FROM e GROUP BY 1 ORDER BY user_id""".stripMargin,
    "funnel_steps" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS t, event_type FROM events),
        |s0 AS (SELECT user_id, min(t) AS view_sec FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(CASE WHEN e.t >= s0.view_sec THEN e.t END) AS click_sec
        |       FROM e JOIN s0 USING (user_id) WHERE e.event_type = 'click' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(CASE WHEN e.t >= s1.click_sec THEN e.t END) AS purchase_sec
        |       FROM e JOIN s1 USING (user_id) WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT s0.user_id, s0.view_sec, s1.click_sec, s2.purchase_sec
        |FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "incremental_agg_state" ->
      """SELECT user_id, CAST(count(value) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,
    // CMS: rebuild the exact md5-slot counter table from all rows — the
    // same 52-bit md5-prefix draw the Spark side computes, so counters,
    // estimates, and the never-undercount flags hash-match exactly
    "cms_frequency" ->
      """WITH cnts AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
        |slots AS (
        |  SELECT user_id, c, r,
        |    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':'
        |      || CAST(r AS VARCHAR)), 1, 13) AS BIGINT) % 256 AS slot
        |  FROM cnts, (SELECT unnest(range(4)) AS r)),
        |counters AS (SELECT r, slot, sum(c) AS cnt FROM slots GROUP BY 1, 2),
        |est AS (
        |  SELECT s.user_id, min(ct.cnt) AS est
        |  FROM slots s JOIN counters ct ON s.r = ct.r AND s.slot = ct.slot
        |  GROUP BY 1)
        |SELECT c.user_id, CAST(c.c AS BIGINT) AS true_n,
        |  CAST(e.est AS BIGINT) AS est,
        |  (e.est >= c.c) AS never_undercounts
        |FROM cnts c JOIN est e USING (user_id)
        |WHERE c.user_id < 50 ORDER BY c.user_id""".stripMargin,
    "temporal_split" ->
      """WITH e AS (SELECT epoch_ns(ts) // 1000 AS t FROM events),
        |c AS (SELECT quantile_cont(CAST(t AS DOUBLE), 0.8) AS cut FROM e),
        |s AS (SELECT t, CASE WHEN t <= cut THEN 'train' ELSE 'test' END AS split FROM e, c)
        |SELECT split, CAST(count(*) AS BIGINT) AS n, min(t) AS min_t, max(t) AS max_t
        |FROM s GROUP BY 1 ORDER BY split""".stripMargin,
    "asof_join" ->
      """WITH probe AS (SELECT DISTINCT user_id, epoch_ns(ts) // 1000 AS t_us, value
        |               FROM events WHERE event_type = 'click'),
        |ref AS (SELECT user_id, epoch_ns(ts) // 1000 AS t_us, max(value) AS purchase_value
        |        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |u AS (
        |  SELECT user_id, t_us, value, 1 AS is_probe,
        |         NULL AS r_t_us, NULL AS r_value FROM probe
        |  UNION ALL
        |  SELECT user_id, t_us, NULL, 0, t_us, purchase_value FROM ref),
        |m AS (SELECT user_id, t_us, value, is_probe,
        |        last_value(r_t_us IGNORE NULLS) OVER w AS asof_ts_us,
        |        last_value(r_value IGNORE NULLS) OVER w AS asof_purchase_value
        |      FROM u
        |      WINDOW w AS (PARTITION BY user_id ORDER BY t_us, is_probe
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, t_us AS ts_us, value, asof_ts_us, asof_purchase_value
        |FROM m WHERE is_probe = 1 ORDER BY user_id, ts_us, value""".stripMargin,
    "attribution_last_touch" ->
      """WITH probe AS (SELECT DISTINCT user_id, epoch_ns(ts) // 1000 AS t_us, value
        |               FROM events WHERE event_type = 'purchase'),
        |ref AS (SELECT DISTINCT user_id, epoch_ns(ts) // 1000 AS t_us
        |        FROM events WHERE event_type = 'click'),
        |u AS (
        |  SELECT user_id, t_us, value, 1 AS is_probe, NULL AS r_t_us FROM probe
        |  UNION ALL
        |  SELECT user_id, t_us, NULL, 0, t_us FROM ref),
        |m AS (SELECT user_id, t_us, value, is_probe,
        |        last_value(r_t_us IGNORE NULLS) OVER w AS a_us
        |      FROM u
        |      WINDOW w AS (PARTITION BY user_id ORDER BY t_us, is_probe
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, t_us AS ts_us, value,
        |  CASE WHEN a_us IS NOT NULL AND t_us - a_us <= 604800000000
        |       THEN a_us END AS attributed_click_us
        |FROM m WHERE is_probe = 1 ORDER BY user_id, ts_us, value""".stripMargin,
    "range_join" ->
      """WITH w AS (SELECT i AS w_id, 1704067200 + i * 259200 AS ws,
        |                  1704067200 + i * 259200 + 432000 AS we
        |           FROM range(12) t(i)),
        |e AS (SELECT event_id, epoch_ns(ts) // 1000000000 AS pt FROM events)
        |SELECT event_id, w_id FROM e JOIN w ON pt >= ws AND pt < we
        |ORDER BY event_id, w_id""".stripMargin,
    "lag_lead" ->
      """WITH e AS (SELECT DISTINCT user_id, epoch_ns(ts) // 1000 AS t_us, value
        |           FROM events WHERE user_id < 50),
        |s AS (SELECT user_id, t_us // 1000000 AS ts_sec, value FROM e)
        |SELECT user_id, ts_sec, value,
        |  lag(value) OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  ts_sec - lag(ts_sec) OVER w AS gap_sec
        |FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, value)
        |ORDER BY user_id, ts_sec, value""".stripMargin,
    "rank_features" ->
      """WITH e AS (SELECT DISTINCT user_id, epoch_ns(ts) // 1000 AS t_us, value
        |           FROM events WHERE user_id < 50),
        |s AS (SELECT user_id, t_us // 1000000 AS ts_sec, value FROM e)
        |SELECT user_id, ts_sec, value,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, value)
        |ORDER BY user_id, rn""".stripMargin,
    "sessionize_batch" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS t, value
        |           FROM events WHERE user_id < 50),
        |f AS (SELECT user_id, t, value,
        |        CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |g AS (SELECT user_id, t, value,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY t) AS sid
        |      FROM f)
        |SELECT user_id, CAST(sid AS INT) AS session_id,
        |  min(t) AS start_sec, max(t) AS end_sec,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_id""".stripMargin,
    "session_window_agg" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS t, value
        |           FROM events WHERE user_id < 50),
        |f AS (SELECT user_id, t, value,
        |        CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= 1800
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |g AS (SELECT user_id, t, value,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY t) AS sid
        |      FROM f)
        |SELECT user_id, min(t) AS start_sec, max(t) + 1800 AS end_sec,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, start_sec""".stripMargin,
    "time_buckets" ->
      """SELECT epoch_us(date_trunc('hour', ts)) // 1000000 AS hour_sec,
        |  event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_sec, event_type""".stripMargin,
    "rolling_window" ->
      """SELECT user_id,
        |  epoch_us(ts) // 1000000 AS ts_sec,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rolling_7d_value,
        |  CAST(count(*) OVER w AS BIGINT) AS rolling_7d_events
        |FROM events WHERE user_id < 50
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_sec, rolling_7d_value""".stripMargin,
    "e1_feature_pipeline" ->
      s"""WITH click AS (${srcSql("click")}),
         |vw AS (${srcSql("view")}),
         |pur AS (${srcSql("purchase")}),
         |common AS (SELECT click.user_id FROM click
         |           JOIN vw ON click.user_id = vw.user_id
         |           JOIN pur ON click.user_id = pur.user_id),
         |lbl AS (SELECT DISTINCT o_custkey, 1 AS target_var FROM orders
         |        WHERE CAST(o_orderdate AS DATE) > DATE '$lblRef'
         |          AND CAST(o_orderdate AS DATE) <= DATE '$lblRef' + INTERVAL 90 DAY)
         |SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment,
         |  click.last_click_date_diff, round(click.total_click_value, 6) AS total_click_value,
         |  vw.last_view_date_diff, round(vw.total_view_value, 6) AS total_view_value,
         |  pur.last_purchase_date_diff, round(pur.total_purchase_value, 6) AS total_purchase_value,
         |  COALESCE(lbl.target_var, 0) AS target_var
         |FROM customer c
         |JOIN common ON c.c_custkey = common.user_id
         |LEFT JOIN click ON c.c_custkey = click.user_id
         |LEFT JOIN vw ON c.c_custkey = vw.user_id
         |LEFT JOIN pur ON c.c_custkey = pur.user_id
         |LEFT JOIN lbl ON c.c_custkey = lbl.o_custkey
         |ORDER BY c.c_custkey""".stripMargin)
}
