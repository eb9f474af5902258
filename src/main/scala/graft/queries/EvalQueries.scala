package graft.queries

import graft.eval.Metrics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Support._

/** Model-evaluation queries with DuckDB oracles. Deterministic synthetic
  * score/label: score = l_discount * 10 (11 distinct values — exercises tie
  * handling), label = l_quantity > 25, yhat = l_quantity * (1 + l_discount). */
object EvalQueries {

  private def scored(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      (col("l_discount") * 10).as("score"),
      when(col("l_quantity") > 25, 1.0).otherwise(0.0).as("label"))

  private val scoredSql =
    "SELECT l_discount * 10 AS score, CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS label FROM lineitem"

  /** 3-class synthetic (pred, y) — quantity tertile as label, a shifted
    * variant as an imperfect prediction. */
  private def mc(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      (col("l_quantity").cast("long") % 3).cast("double").as("y"),
      ((col("l_quantity").cast("long") + col("l_linenumber").cast("long")) % 3).cast("double").as("pred"))

  private val mcSql =
    """SELECT CAST(CAST(l_quantity AS BIGINT) % 3 AS DOUBLE) AS y,
      |       CAST((CAST(l_quantity AS BIGINT) + CAST(l_linenumber AS BIGINT)) % 3 AS DOUBLE) AS pred
      |FROM lineitem""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "regression_metrics" -> { (s, dir) =>
      val df = t(s, dir, "lineitem").select(
        col("l_quantity").as("y"),
        (col("l_quantity") * (lit(1) + col("l_discount"))).as("yhat"))
      Metrics.regressionMetrics(df, "y", "yhat")
    },
    "r2_expvar" -> { (s, dir) =>
      val df = t(s, dir, "lineitem").select(
        col("l_quantity").as("y"),
        (col("l_quantity") * (lit(1) + col("l_discount"))).as("yhat"))
      Metrics.r2AndExplainedVariance(df, "y", "yhat")
    },
    "binary_metrics" -> { (s, dir) =>
      Metrics.binaryMetricsAtThreshold(scored(s, dir), "score", "label", 0.5)
    },
    // --- per-segment (fairness/slice) metrics: one shared scan + partial
    // agg instead of a filter-and-rescan per segment
    "binary_metrics_by_group" -> { (s, dir) =>
      val df = t(s, dir, "lineitem").select(
        col("l_returnflag").as("seg"),
        (col("l_discount") * 10).as("score"),
        when(col("l_quantity") > 25, 1.0).otherwise(0.0).as("label"))
      Metrics.binaryMetricsByGroup(df, "seg", "score", "label", 0.5)
        .orderBy(col("segment"))
    },
    // --- cumulative gains / lift: the propensity-targeting table (top
    // decile captures X% of positives at Yx lift); bucket edges from one
    // percentile pass, cumulative window over <= buckets rows
    "lift_table" -> { (s, dir) =>
      Metrics.liftTable(scored(s, dir), "score", "label", buckets = 10, exact = Support.exact)
    },
    "threshold_metrics" -> { (s, dir) =>
      Metrics.thresholdMetrics(scored(s, dir), "score", "label", Seq(0.2, 0.4, 0.6, 0.8))
    },
    "confusion_cells" -> { (s, dir) =>
      val pred = Metrics.labelAtThreshold(scored(s, dir), "score", 0.5)
      Metrics
        .confusionCell(pred, "prediction", "label")
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("cell"))
    },
    "calibration_table" -> { (s, dir) =>
      Metrics.calibrationTable(scored(s, dir), "score", "label", buckets = 10)
    },
    "ks_statistic" -> { (s, dir) =>
      // planted distribution shift: odd-key scores compressed by 0.8
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_orderkey") % 2 === 0)
        .select((col("l_discount") * 10).as("score"))
      val b = li.filter(col("l_orderkey") % 2 === 1)
        .select((col("l_discount") * 10 * 0.8).as("score"))
      Metrics.ksStatistic(a, b, "score", digits = 3)
    },
    "crosstab" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },
    "roc_pr_curve" -> { (s, dir) =>
      Metrics.rocPrCurve(scored(s, dir), "score", "label").orderBy(desc("threshold"))
    },
    // deterministic synthetic 3-class pred/label from lineitem columns
    "multiclass_confusion" -> { (s, dir) =>
      Metrics.confusionMatrix(mc(s, dir), "pred", "y")
        .orderBy(col("label"), col("prediction"))
    },
    "multiclass_summary" -> { (s, dir) =>
      Metrics.multiclassSummary(mc(s, dir), "pred", "y").orderBy(col("label"))
    },
    // auROC via native mllib BinaryClassificationMetrics; the oracle is the
    // Mann-Whitney U / average-rank formulation, which equals the trapezoid
    // area over the tie-grouped ROC curve.
    "auc_roc" -> { (s, dir) =>
      val (auroc, _) = Metrics.aucMetrics(scored(s, dir), "score", "label")
      val spark = s
      import spark.implicits._
      Seq(BigDecimal(auroc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        .toDF("auroc")
    },
    // --- retrieval ranking metrics (nDCG@k / MRR / P@k / R@k): the
    // evaluation half of the ANN serving surface. Ranked lists and graded
    // labels are md5-drawn (portable to DuckDB), covering every branch:
    // query 0 retrieved but unlabeled (null ndcg/recall), query 1 labeled
    // but never retrieved (zero precision/rr), ranks beyond k ignored
    "ranking_metrics" -> { (s, dir) =>
      val (results, relevance) = rankingFixture(s, dir)
      Metrics.rankingMetrics(results, relevance,
          "query_id", "cand_id", "rank", "rel", k = 10)
        .orderBy(col("query_id"))
    },
    "ranking_metrics_summary" -> { (s, dir) =>
      val (results, relevance) = rankingFixture(s, dir)
      Metrics.rankingMetricsSummary(
        Metrics.rankingMetrics(results, relevance,
          "query_id", "cand_id", "rank", "rel", k = 10))
    },
    // the tune-sweep table shape (ann-serving/retrieval-tune): one
    // summary row per operating point, stacked and labeled — here two
    // truncation depths of the same fixture stand in for two pruning
    // levels, so the whole sweep-assembly arithmetic replays in DuckDB
    "retrieval_tune_sweep" -> { (s, dir) =>
      val (results, relevance) = rankingFixture(s, dir)
      Seq(5, 10).map { kk =>
        Metrics.rankingMetricsSummary(
          Metrics.rankingMetrics(results, relevance,
            "query_id", "cand_id", "rank", "rel", k = kk))
          .select(lit(s"k=$kk").as("operating_point"), col("*"))
      }.reduce(_ unionByName _).orderBy(col("operating_point"))
    })

  /** Deterministic ranked-results + graded-relevance frames for the
    * ranking-metric oracles: 29 queries × top-15 md5-ordered candidate
    * lists, labels rel ∈ {0..3} md5-drawn over 60 of 100 candidates.
    * Query 0 has no labels; query 1 has no retrieved list. */
  private def rankingFixture(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "embeddings")
    val pairs = e.filter(col("vec_id") < 30)
      .select(col("vec_id").as("query_id"))
      .crossJoin(e.filter(col("vec_id") >= 30 && col("vec_id") < 130)
        .select(col("vec_id").as("cand_id")))
    val results = pairs
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(
          md5(concat_ws(":", col("query_id"), col("cand_id"))),
          col("cand_id"))))
      .filter(col("rank") <= 15 && col("query_id") =!= 1)
    val relevance = pairs
      .filter(col("cand_id") < 90 && col("query_id") =!= 0)
      .withColumn("rel", graft.Exprs.md5Bits52(concat_ws(":",
        lit("rel"), col("query_id"), col("cand_id"))) % 4)
    (results, relevance)
  }

  private def thresholdSql(thr: Double): String =
    s"""SELECT $thr AS threshold,
       |  CAST(sum(CASE WHEN score > $thr AND label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(sum(CASE WHEN score > $thr AND label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(sum(CASE WHEN score <= $thr AND label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |  CAST(sum(CASE WHEN score <= $thr AND label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  round((sum(CASE WHEN score > $thr AND label = 1.0 THEN 1 ELSE 0 END) + sum(CASE WHEN score <= $thr AND label = 0.0 THEN 1 ELSE 0 END)) / CAST(count(*) AS DOUBLE), 6) AS accuracy,
       |  round(sum(CASE WHEN score > $thr AND label = 1.0 THEN 1 ELSE 0 END) / CAST(NULLIF(sum(CASE WHEN score > $thr THEN 1 ELSE 0 END), 0) AS DOUBLE), 6) AS precision,
       |  round(sum(CASE WHEN score > $thr AND label = 1.0 THEN 1 ELSE 0 END) / CAST(NULLIF(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END), 0) AS DOUBLE), 6) AS recall,
       |  round(2.0 * sum(CASE WHEN score > $thr AND label = 1.0 THEN 1 ELSE 0 END) / CAST(NULLIF(2 * sum(CASE WHEN score > $thr AND label = 1.0 THEN 1 ELSE 0 END) + sum(CASE WHEN score > $thr AND label = 0.0 THEN 1 ELSE 0 END) + sum(CASE WHEN score <= $thr AND label = 1.0 THEN 1 ELSE 0 END), 0) AS DOUBLE), 6) AS f1
       |FROM (${scoredSql})""".stripMargin

  /** The full per-query DCG/IDCG arithmetic replayed in DuckDB over the
    * same md5-drawn fixture ([[rankingFixture]]), parameterized by k so
    * the tune-sweep oracle can stack two truncation depths — two
    * "operating points" — through the identical arithmetic. */
  private def rankingPerQuerySql(k: Int): String =
    s"""WITH pairs AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id
      |  FROM (SELECT vec_id FROM embeddings WHERE vec_id < 30) q
      |  CROSS JOIN (SELECT vec_id FROM embeddings WHERE vec_id >= 30 AND vec_id < 130) c),
      |results AS (
      |  SELECT query_id, cand_id, rank FROM (
      |    SELECT query_id, cand_id,
      |      row_number() OVER (PARTITION BY query_id ORDER BY
      |        md5(CAST(query_id AS VARCHAR) || ':' || CAST(cand_id AS VARCHAR)),
      |        cand_id) AS rank
      |    FROM pairs)
      |  WHERE rank <= 15 AND query_id <> 1),
      |relevance AS (
      |  SELECT query_id, cand_id,
      |    CAST('0x' || substring(md5('rel:' || CAST(query_id AS VARCHAR) ||
      |      ':' || CAST(cand_id AS VARCHAR)), 1, 13) AS BIGINT) % 4 AS rel
      |  FROM pairs WHERE cand_id < 90 AND query_id <> 0),
      |topk AS (
      |  SELECT r.query_id, r.cand_id, CAST(r.rank AS DOUBLE) AS rank,
      |    COALESCE(CAST(v.rel AS DOUBLE), 0.0) AS rel
      |  FROM results r LEFT JOIN relevance v
      |    ON r.query_id = v.query_id AND r.cand_id = v.cand_id
      |  WHERE r.rank <= $k),
      |topc AS (
      |  SELECT query_id, rank, rel,
      |    sum(CASE WHEN rel > 0 THEN 1.0 ELSE 0.0 END) OVER (
      |      PARTITION BY query_id ORDER BY rank, cand_id
      |      ROWS UNBOUNDED PRECEDING) AS cumhits
      |  FROM topk),
      |perq AS (
      |  SELECT query_id,
      |    sum((pow(2.0, rel) - 1) / log2(rank + 1)) AS dcg0,
      |    CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
      |    min(CASE WHEN rel > 0 THEN rank END) AS first_rel,
      |    sum(CASE WHEN rel > 0 THEN cumhits / rank END) AS apn,
      |    CAST(count(*) AS BIGINT) AS n_retrieved
      |  FROM topc GROUP BY query_id),
      |ideal AS (
      |  SELECT query_id,
      |    sum(CASE WHEN i <= $k THEN (pow(2.0, rel) - 1) / log2(i + 1) END) AS idcg0,
      |    CAST(count(*) AS BIGINT) AS n_relevant
      |  FROM (
      |    SELECT query_id, CAST(rel AS DOUBLE) AS rel,
      |      row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS i
      |    FROM relevance WHERE rel > 0)
      |  GROUP BY query_id)
      |SELECT
      |  COALESCE(p.query_id, i.query_id) AS query_id,
      |  round(COALESCE(p.dcg0, 0), 6) AS dcg,
      |  round(COALESCE(i.idcg0, 0), 6) AS idcg,
      |  round(CASE WHEN i.idcg0 > 0 THEN COALESCE(p.dcg0, 0) / i.idcg0 END, 6) AS ndcg,
      |  round(COALESCE(p.hits, 0) / $k.0, 6) AS precision_at_k,
      |  round(CASE WHEN i.n_relevant > 0
      |    THEN COALESCE(p.hits, 0) / CAST(i.n_relevant AS DOUBLE) END, 6) AS recall_at_k,
      |  round(CASE WHEN i.n_relevant > 0
      |    THEN COALESCE(p.apn, 0) / CAST(i.n_relevant AS DOUBLE) END, 6) AS average_precision,
      |  round(COALESCE(1.0 / p.first_rel, 0), 6) AS reciprocal_rank,
      |  CAST(COALESCE(i.n_relevant, 0) AS BIGINT) AS n_relevant,
      |  CAST(COALESCE(p.n_retrieved, 0) AS BIGINT) AS n_retrieved
      |FROM perq p FULL OUTER JOIN ideal i ON p.query_id = i.query_id""".stripMargin

  private def rankingSummarySql(k: Int, extraCols: String = ""): String =
    s"""WITH perquery AS (${rankingPerQuerySql(k)})
      |SELECT$extraCols
      |  CAST(count(*) AS BIGINT) AS n_queries,
      |  CAST(sum(CASE WHEN n_relevant > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_labeled,
      |  round(avg(reciprocal_rank), 6) AS mrr,
      |  round(avg(ndcg), 6) AS mean_ndcg,
      |  round(avg(average_precision), 6) AS mean_ap,
      |  round(avg(precision_at_k), 6) AS mean_precision_at_k,
      |  round(avg(recall_at_k), 6) AS mean_recall_at_k
      |FROM perquery""".stripMargin

  val oracle: Map[String, String] = Map(
    "ranking_metrics" ->
      s"""${rankingPerQuerySql(10)}
        |ORDER BY query_id""".stripMargin,
    "ranking_metrics_summary" -> rankingSummarySql(10),
    "retrieval_tune_sweep" ->
      s"""SELECT * FROM (
        |(${rankingSummarySql(5, " 'k=5' AS operating_point,")})
        |UNION ALL
        |(${rankingSummarySql(10, " 'k=10' AS operating_point,")}))
        |ORDER BY operating_point""".stripMargin,
    "lift_table" ->
      s"""WITH sc AS ($scoredSql),
        |e AS (SELECT quantile_cont(score, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS ed
        |      FROM sc),
        |b AS (SELECT CAST(9 - len(list_filter(ed, x -> x <= score)) AS INT) AS bucket, label
        |      FROM sc, e),
        |c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(CAST(label AS BIGINT)) AS BIGINT) AS n_pos
        |      FROM b GROUP BY 1),
        |w AS (SELECT bucket, n, n_pos,
        |        sum(n) OVER (ORDER BY bucket) AS cum_n,
        |        sum(n_pos) OVER (ORDER BY bucket) AS cum_pos,
        |        sum(n) OVER () AS tn, sum(n_pos) OVER () AS tp FROM c)
        |SELECT bucket, n, n_pos,
        |  round(CAST(cum_pos AS DOUBLE) / tp, 6) AS gain,
        |  round((CAST(cum_pos AS DOUBLE) / cum_n) / (CAST(tp AS DOUBLE) / tn), 6) AS lift
        |FROM w ORDER BY bucket""".stripMargin,
    "regression_metrics" ->
      """WITH v AS (SELECT l_quantity AS y, l_quantity * (1 + l_discount) AS yhat FROM lineitem)
        |SELECT round(sqrt(avg((yhat - y) * (yhat - y))), 6) AS rmse,
        |       round(avg(abs(yhat - y)), 6) AS mae,
        |       round(avg(CASE WHEN y <> 0 THEN abs(yhat - y) / abs(y) END), 6) AS mape,
        |       round(sum(abs(yhat - y)) / sum(abs(y)), 6) AS wmape
        |FROM v""".stripMargin,
    "r2_expvar" ->
      """WITH v AS (SELECT l_quantity AS y, l_quantity * (1 + l_discount) AS yhat FROM lineitem),
        |m AS (SELECT avg(y) AS ybar FROM v)
        |SELECT round(1.0 - sum((yhat - y) * (yhat - y)) / sum((y - ybar) * (y - ybar)), 6) AS r2,
        |       round(1.0 - var_samp(yhat - y) / var_samp(y), 6) AS explained_variance
        |FROM v, m""".stripMargin,
    "binary_metrics" ->
      s"""SELECT
         |  CAST(sum(CASE WHEN score > 0.5 AND label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN score > 0.5 AND label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(sum(CASE WHEN score <= 0.5 AND label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         |  CAST(sum(CASE WHEN score <= 0.5 AND label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  round((sum(CASE WHEN score > 0.5 AND label = 1.0 THEN 1 ELSE 0 END) + sum(CASE WHEN score <= 0.5 AND label = 0.0 THEN 1 ELSE 0 END)) / CAST(count(*) AS DOUBLE), 6) AS accuracy,
         |  round(sum(CASE WHEN score > 0.5 AND label = 1.0 THEN 1 ELSE 0 END) / CAST(NULLIF(sum(CASE WHEN score > 0.5 THEN 1 ELSE 0 END), 0) AS DOUBLE), 6) AS precision,
         |  round(sum(CASE WHEN score > 0.5 AND label = 1.0 THEN 1 ELSE 0 END) / CAST(NULLIF(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END), 0) AS DOUBLE), 6) AS recall,
         |  round(2.0 * sum(CASE WHEN score > 0.5 AND label = 1.0 THEN 1 ELSE 0 END) / CAST(NULLIF(2 * sum(CASE WHEN score > 0.5 AND label = 1.0 THEN 1 ELSE 0 END) + sum(CASE WHEN score > 0.5 AND label = 0.0 THEN 1 ELSE 0 END) + sum(CASE WHEN score <= 0.5 AND label = 1.0 THEN 1 ELSE 0 END), 0) AS DOUBLE), 6) AS f1
         |FROM (${scoredSql})""".stripMargin,
    "binary_metrics_by_group" ->
      """WITH v AS (SELECT l_returnflag AS seg, l_discount * 10 AS score,
        |             CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS label
        |           FROM lineitem)
        |SELECT seg AS segment,
        |  CAST(sum(CASE WHEN score > 0.5 AND label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(sum(CASE WHEN score > 0.5 AND label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |  CAST(sum(CASE WHEN score <= 0.5 AND label = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |  CAST(sum(CASE WHEN score <= 0.5 AND label = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |  round((sum(CASE WHEN score > 0.5 AND label = 1.0 THEN 1 ELSE 0 END) + sum(CASE WHEN score <= 0.5 AND label = 0.0 THEN 1 ELSE 0 END)) / CAST(count(*) AS DOUBLE), 6) AS accuracy,
        |  round(sum(CASE WHEN score > 0.5 AND label = 1.0 THEN 1 ELSE 0 END) / CAST(NULLIF(sum(CASE WHEN score > 0.5 THEN 1 ELSE 0 END), 0) AS DOUBLE), 6) AS precision,
        |  round(sum(CASE WHEN score > 0.5 AND label = 1.0 THEN 1 ELSE 0 END) / CAST(NULLIF(sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END), 0) AS DOUBLE), 6) AS recall,
        |  round(2.0 * sum(CASE WHEN score > 0.5 AND label = 1.0 THEN 1 ELSE 0 END) / CAST(NULLIF(2 * sum(CASE WHEN score > 0.5 AND label = 1.0 THEN 1 ELSE 0 END) + sum(CASE WHEN score > 0.5 AND label = 0.0 THEN 1 ELSE 0 END) + sum(CASE WHEN score <= 0.5 AND label = 1.0 THEN 1 ELSE 0 END), 0) AS DOUBLE), 6) AS f1
        |FROM v GROUP BY seg ORDER BY segment""".stripMargin,
    "threshold_metrics" ->
      s"""SELECT * FROM (
         |${thresholdSql(0.2)}
         |UNION ALL ${thresholdSql(0.4)}
         |UNION ALL ${thresholdSql(0.6)}
         |UNION ALL ${thresholdSql(0.8)})
         |ORDER BY threshold""".stripMargin,
    "confusion_cells" ->
      s"""SELECT CASE WHEN score > 0.5 AND label = 1.0 THEN 'TP'
         |            WHEN score > 0.5 AND label = 0.0 THEN 'FP'
         |            WHEN score <= 0.5 AND label = 0.0 THEN 'TN'
         |            ELSE 'FN' END AS cell, count(*) AS n
         |FROM (${scoredSql}) GROUP BY 1 ORDER BY 1""".stripMargin,
    "calibration_table" ->
      s"""SELECT LEAST(CAST(floor(score * 10) AS INT), 9) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n,
         |  round(avg(score), 6) AS mean_score,
         |  round(avg(label), 6) AS event_rate
         |FROM (${scoredSql}) GROUP BY 1 ORDER BY 1""".stripMargin,
    "ks_statistic" ->
      """WITH a AS (SELECT round(l_discount * 10, 3) AS s FROM lineitem WHERE l_orderkey % 2 = 0),
        |b AS (SELECT round(l_discount * 10 * 0.8, 3) AS s FROM lineitem WHERE l_orderkey % 2 = 1),
        |ga AS (SELECT s, CAST(count(*) AS BIGINT) AS na FROM a GROUP BY 1),
        |gb AS (SELECT s, CAST(count(*) AS BIGINT) AS nb FROM b GROUP BY 1),
        |g AS (SELECT COALESCE(ga.s, gb.s) AS s, COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
        |      FROM ga FULL JOIN gb ON ga.s = gb.s),
        |c AS (SELECT
        |    sum(na) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) / CAST(sum(na) OVER () AS DOUBLE) AS cdf_a,
        |    sum(nb) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) / CAST(sum(nb) OVER () AS DOUBLE) AS cdf_b
        |  FROM g)
        |SELECT round(max(abs(cdf_a - cdf_b)), 6) AS ks FROM c""".stripMargin,
    "crosstab" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders
        |GROUP BY 1, 2 ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "multiclass_confusion" ->
      s"""SELECT y AS label, pred AS prediction, CAST(count(*) AS BIGINT) AS n
         |FROM (${mcSql}) GROUP BY 1, 2 ORDER BY label, prediction""".stripMargin,
    "multiclass_summary" ->
      s"""WITH cm AS (SELECT y AS label, pred AS prediction, count(*) AS n
         |            FROM (${mcSql}) GROUP BY 1, 2),
         |bl AS (SELECT label, sum(n) AS support FROM cm GROUP BY 1),
         |bp AS (SELECT prediction AS label, sum(n) AS predicted FROM cm GROUP BY 1),
         |tp AS (SELECT label, n AS tp FROM cm WHERE label = prediction)
         |SELECT COALESCE(bl.label, bp.label) AS label,
         |  CAST(COALESCE(bl.support, 0) AS BIGINT) AS support,
         |  round(COALESCE(tp.tp, 0) / CAST(NULLIF(COALESCE(bp.predicted, 0), 0) AS DOUBLE), 6) AS precision,
         |  round(COALESCE(tp.tp, 0) / CAST(NULLIF(COALESCE(bl.support, 0), 0) AS DOUBLE), 6) AS recall,
         |  round(2.0 * COALESCE(tp.tp, 0) / CAST(NULLIF(COALESCE(bp.predicted, 0) + COALESCE(bl.support, 0), 0) AS DOUBLE), 6) AS f1
         |FROM bl
         |FULL OUTER JOIN bp ON bl.label = bp.label
         |LEFT JOIN tp ON COALESCE(bl.label, bp.label) = tp.label
         |ORDER BY label""".stripMargin,
    "roc_pr_curve" ->
      s"""WITH v AS (${scoredSql}),
         |g AS (SELECT round(score, 3) AS threshold,
         |             sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS pos,
         |             sum(CASE WHEN label = 0.0 THEN 1 ELSE 0 END) AS neg
         |      FROM v GROUP BY 1),
         |c AS (SELECT threshold,
         |             sum(pos) OVER (ORDER BY threshold DESC) AS tp,
         |             sum(neg) OVER (ORDER BY threshold DESC) AS fp,
         |             sum(pos) OVER () AS tot_pos,
         |             sum(neg) OVER () AS tot_neg
         |      FROM g)
         |SELECT threshold,
         |  CAST(tp AS BIGINT) AS tp,
         |  CAST(fp AS BIGINT) AS fp,
         |  CAST(tot_neg - fp AS BIGINT) AS tn,
         |  CAST(tot_pos - tp AS BIGINT) AS fn,
         |  round(tp / CAST(NULLIF(tot_pos, 0) AS DOUBLE), 6) AS tpr,
         |  round(fp / CAST(NULLIF(tot_neg, 0) AS DOUBLE), 6) AS fpr,
         |  round(tp / CAST(tp + fp AS DOUBLE), 6) AS precision
         |FROM c ORDER BY threshold DESC""".stripMargin,
    "auc_roc" ->
      s"""WITH v AS (${scoredSql}),
         |r AS (SELECT label,
         |             rank() OVER (ORDER BY score) AS rmin,
         |             count(*) OVER (PARTITION BY score) AS c
         |      FROM v),
         |s AS (SELECT sum(CASE WHEN label = 1.0 THEN rmin + (c - 1) / 2.0 ELSE 0 END) AS rpos,
         |             sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS npos,
         |             sum(CASE WHEN label = 0.0 THEN 1 ELSE 0 END) AS nneg
         |      FROM r)
         |SELECT round((rpos - npos * (npos + 1) / 2.0) / (npos * nneg), 6) AS auroc FROM s""".stripMargin)
}
