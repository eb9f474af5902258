package graft.queries

import graft.features._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Support._

/** Estimator/transformer queries (outlier treatment, imputation, binning,
  * encodings, scaling, elimination stats, IV) with DuckDB oracles.
  *
  * Null-injection trick: the testdata has no nulls, so imputation queries
  * deterministically null out a slice (key % k = 0) first — the oracle SQL
  * mirrors the same injection, so fit+transform semantics are genuinely
  * exercised. */
object FeatureQueries {

  private val ordinalMap = Map(
    "1-URGENT" -> 1, "2-HIGH" -> 2, "3-MEDIUM" -> 3, "4-NOT SPECIFIED" -> 4, "5-LOW" -> 5)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "outlier_bounds" -> { (s, dir) =>
      val df = t(s, dir, "lineitem")
      OutlierTreatment
        .fit(df, Seq("l_quantity", "l_extendedprice", "l_discount"), exact = Support.exact)
        .boundsTable(df)
        .select(col("column"), r6(col("lower_bound")).as("lower_bound"), r6(col("upper_bound")).as("upper_bound"))
        .orderBy(col("column"))
    },
    "outlier_cap_stats" -> { (s, dir) =>
      val df = t(s, dir, "lineitem")
      val m = OutlierTreatment.fit(df, Seq("l_extendedprice"), exact = Support.exact)
      m.cap(df).agg(
        r6(avg(col("l_extendedprice"))).as("avg_capped"),
        r6(min(col("l_extendedprice"))).as("min_capped"),
        r6(max(col("l_extendedprice"))).as("max_capped"),
        count(lit(1)).as("n"))
    },
    "outlier_drop_stats" -> { (s, dir) =>
      val df = t(s, dir, "lineitem")
      val m = OutlierTreatment.fit(df, Seq("l_extendedprice"), exact = Support.exact)
      m.drop(df).agg(
        count(lit(1)).as("n"),
        r6(avg(col("l_extendedprice"))).as("avg_kept"))
    },
    "impute_mean" -> { (s, dir) =>
      val df = t(s, dir, "lineitem")
        .withColumn("q", when(col("l_linenumber") % 3 === 0, lit(null)).otherwise(col("l_quantity")))
      val m = RuleImputer.fit(df, Map("q" -> RuleImputer.Mean))
      m.transform(df).agg(
        r6(avg(col("q"))).as("avg_q"),
        count(col("q")).as("n_nonnull"))
    },
    "impute_mode" -> { (s, dir) =>
      val df = t(s, dir, "customer")
        .withColumn("seg", when(col("c_custkey") % 5 === 0, lit(null)).otherwise(col("c_mktsegment")))
      val m = RuleImputer.fit(df, Map("seg" -> RuleImputer.Mode))
      m.transform(df)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("seg"))
    },
    "grouped_quantiles" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(graft.Exprs
          .pctArray(col("l_quantity").cast("double"), Seq(0.25, 0.5, 0.75), Support.exact)
          .as("q"))
        .select(
          col("l_returnflag"),
          r6(element_at(col("q"), 1)).as("q25"),
          r6(element_at(col("q"), 2)).as("q50"),
          r6(element_at(col("q"), 3)).as("q75"))
        .orderBy(col("l_returnflag"))
    },
    // --- per-group quantile buckets: quartile edges learned per
    // event_type in one combinable agg, assignment via the edges array —
    // no driver collect, no per-group ntile sort
    "grouped_binning" -> { (s, dir) =>
      Binning
        .groupedBinning(
          events(s, dir).select(col("event_id"), col("event_type"), col("value")),
          "event_type", "value", nBuckets = 4, exact = Support.exact)
        .select(col("event_id"), col("event_type"), col("bucket"))
        .orderBy(col("event_id"))
    },
    "binning_quantile" -> { (s, dir) =>
      val df = t(s, dir, "lineitem")
      val m = Binning.fitQuantile(df, Seq("l_extendedprice"), 5, exact = Support.exact)
      m.transform(df)
        .groupBy(col("l_extendedprice_bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_extendedprice_bin"))
    },
    "target_encoding" -> { (s, dir) =>
      val df = t(s, dir, "customer")
        .withColumn("y", (col("c_acctbal") > 0).cast("int"))
      Encoding
        .fitTargetEncoder(df, "c_mktsegment", "y")
        .mapping
        .select(col("c_mktsegment"), r6(col("c_mktsegment_te")).as("c_mktsegment_te"))
        .orderBy(col("c_mktsegment"))
    },
    "frequency_encoding" -> { (s, dir) =>
      Encoding
        .fitFrequencyEncoder(t(s, dir, "customer"), "c_mktsegment")
        .mapping
        .select(col("c_mktsegment"), r6(col("c_mktsegment_freq")).as("c_mktsegment_freq"))
        .orderBy(col("c_mktsegment"))
    },
    "onehot_encoding" -> { (s, dir) =>
      val df = t(s, dir, "customer")
      val m = Encoding.fitOneHot(df, "c_mktsegment")
      val indicators = m.categories.map(c => s"c_mktsegment_${c.replaceAll("[^A-Za-z0-9]", "_")}")
      m.transform(df).agg(
        sum(col(indicators.head)).as(indicators.head),
        indicators.tail.map(c => sum(col(c)).as(c)): _*)
    },
    "ordinal_encoding" -> { (s, dir) =>
      Encoding
        .ordinalEncode(t(s, dir, "orders"), "o_orderpriority", ordinalMap)
        .groupBy(col("o_orderpriority"), col("o_orderpriority_ord"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },
    "label_encoding" -> { (s, dir) =>
      Encoding
        .fitLabelEncoding(t(s, dir, "customer"), "c_mktsegment")
        .orderBy(col("c_mktsegment_idx"))
    },
    "scaling_minmax" -> { (s, dir) =>
      val df = t(s, dir, "lineitem")
      Scaling
        .fitMinMax(df, Seq("l_quantity"))
        .transform(df)
        .agg(
          r6(min(col("l_quantity_scaled"))).as("min_s"),
          r6(max(col("l_quantity_scaled"))).as("max_s"),
          r6(graft.Exprs.pct(col("l_quantity_scaled"), 0.5, exact = Support.exact)).as("med_s"))
    },
    "scaling_robust" -> { (s, dir) =>
      val df = t(s, dir, "lineitem")
      Scaling
        .fitRobust(df, Seq("l_extendedprice"), exact = Support.exact)
        .transform(df)
        .agg(
          r6(graft.Exprs.pct(col("l_extendedprice_scaled"), 0.5, exact = Support.exact)).as("med_s"),
          r6(min(col("l_extendedprice_scaled"))).as("min_s"),
          r6(max(col("l_extendedprice_scaled"))).as("max_s"))
    },
    "scaling_standard" -> { (s, dir) =>
      val df = t(s, dir, "lineitem")
      Scaling
        .fitStandard(df, Seq("l_quantity"))
        .transform(df)
        .agg(
          r6(stddev(col("l_quantity_scaled"))).as("sd_s"),
          r6(min(col("l_quantity_scaled"))).as("min_s"),
          r6(max(col("l_quantity_scaled"))).as("max_s"))
    },
    // --- robust dispersion profile: median + MAD per column (the
    // outlier-insensitive describe row)
    "mad_table" -> { (s, dir) =>
      OutlierTreatment
        .madTable(
          t(s, dir, "lineitem"),
          Seq("l_discount", "l_extendedprice", "l_quantity"),
          exact = Support.exact)
        .orderBy(col("column"))
    },
    "sparseness" -> { (s, dir) =>
      FeatureElimination
        .sparsenessTable(t(s, dir, "lineitem"), Seq("l_discount", "l_tax"))
        .orderBy(col("column"))
    },
    "cv_table" -> { (s, dir) =>
      FeatureElimination
        .cvTable(t(s, dir, "lineitem"), Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy(col("column"))
    },
    "iv_table" -> { (s, dir) =>
      val df = t(s, dir, "lineitem")
        .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
      InformationValue
        .ivTable(df, Seq("l_quantity", "l_extendedprice", "l_discount"), "y", 5, exact = Support.exact)
        .orderBy(col("feature"))
    },
    "chi_square" -> { (s, dir) =>
      val df = t(s, dir, "lineitem")
        .withColumn("y", when(col("l_quantity") > 25, "hi").otherwise("lo"))
      ChiSquare.chiSquareTable(df, Seq("l_returnflag", "l_linestatus"), "y")
        .orderBy(col("feature"))
    },
    "psi_drift" -> { (s, dir) =>
      // baseline = even order keys; current = odd keys with a planted 20%
      // shift on l_extendedprice — that feature must dominate the PSI table
      val li = t(s, dir, "lineitem")
      val baseline = li.filter(col("l_orderkey") % 2 === 0)
      val current = li.filter(col("l_orderkey") % 2 === 1)
        .withColumn("l_extendedprice", col("l_extendedprice") * 1.2)
      Drift
        .psiTable(
          baseline, current,
          Seq("l_quantity", "l_extendedprice", "l_discount"), 5, exact = Support.exact)
        .orderBy(col("feature"))
    })

  // grid completed via generate_series like psiSql: an empty bucket still
  // contributes its smoothed term (mirrors InformationValue.ivTable)
  private def ivSql(f: String): String =
    s"""SELECT '$f' AS feature,
       |  round(sum(((ne + 0.5) / (tne + 2.5) - (ev + 0.5) / (te + 2.5))
       |        * ln(((ne + 0.5) / (tne + 2.5)) / ((ev + 0.5) / (te + 2.5)))), 6) AS iv
       |FROM (
       |  SELECT g.bucket, COALESCE(ev, 0) AS ev, COALESCE(ne, 0) AS ne,
       |         sum(COALESCE(ev, 0)) OVER () AS te, sum(COALESCE(ne, 0)) OVER () AS tne
       |  FROM (SELECT unnest(generate_series(1, 5)) AS bucket) g
       |  LEFT JOIN (
       |    SELECT bucket, sum(y) AS ev, sum(1 - y) AS ne
       |    FROM (
       |      SELECT CASE WHEN $f <= e1 THEN 1 WHEN $f <= e2 THEN 2 WHEN $f <= e3 THEN 3
       |                  WHEN $f <= e4 THEN 4 ELSE 5 END AS bucket,
       |             CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
       |      FROM lineitem, (SELECT round(quantile_cont(CAST($f AS DOUBLE), 0.2), 6) AS e1,
       |                             round(quantile_cont(CAST($f AS DOUBLE), 0.4), 6) AS e2,
       |                             round(quantile_cont(CAST($f AS DOUBLE), 0.6), 6) AS e3,
       |                             round(quantile_cont(CAST($f AS DOUBLE), 0.8), 6) AS e4 FROM lineitem)
       |      WHERE $f IS NOT NULL)
       |    GROUP BY bucket) c USING (bucket))""".stripMargin

  private def psiSql(f: String): String =
    s"""SELECT '$f' AS feature, round(sum((p - q) * ln(p / q)), 6) AS psi
       |FROM (
       |  SELECT (COALESCE(nb, 0) + 0.5) / (sum(COALESCE(nb, 0)) OVER () + 2.5) AS p,
       |         (COALESCE(nc, 0) + 0.5) / (sum(COALESCE(nc, 0)) OVER () + 2.5) AS q
       |  FROM (SELECT unnest(generate_series(1, 5)) AS bucket) g
       |  LEFT JOIN (SELECT bucket, count(*) AS nb FROM (
       |          SELECT CASE WHEN $f <= e1 THEN 1 WHEN $f <= e2 THEN 2 WHEN $f <= e3 THEN 3
       |                      WHEN $f <= e4 THEN 4 ELSE 5 END AS bucket
       |          FROM (SELECT * FROM lineitem WHERE l_orderkey % 2 = 0), psi_edges_$f
       |          WHERE $f IS NOT NULL) GROUP BY 1) b USING (bucket)
       |  LEFT JOIN (SELECT bucket, count(*) AS nc FROM (
       |          SELECT CASE WHEN $f <= e1 THEN 1 WHEN $f <= e2 THEN 2 WHEN $f <= e3 THEN 3
       |                      WHEN $f <= e4 THEN 4 ELSE 5 END AS bucket
       |          FROM (SELECT l_quantity, l_extendedprice * 1.2 AS l_extendedprice, l_discount
       |                FROM lineitem WHERE l_orderkey % 2 = 1), psi_edges_$f
       |          WHERE $f IS NOT NULL) GROUP BY 1) c USING (bucket))""".stripMargin

  private def psiEdges(f: String): String =
    s"""psi_edges_$f AS (
       |  SELECT round(quantile_cont(CAST($f AS DOUBLE), 0.2), 6) AS e1,
       |         round(quantile_cont(CAST($f AS DOUBLE), 0.4), 6) AS e2,
       |         round(quantile_cont(CAST($f AS DOUBLE), 0.6), 6) AS e3,
       |         round(quantile_cont(CAST($f AS DOUBLE), 0.8), 6) AS e4
       |  FROM lineitem WHERE l_orderkey % 2 = 0)""".stripMargin

  private def chiSql(f: String): String =
    s"""SELECT '$f' AS feature,
       |  round(sum((o - e) * (o - e) / e), 6) AS chi2,
       |  CAST((SELECT count(DISTINCT $f) - 1 FROM lineitem WHERE $f IS NOT NULL)
       |     * (SELECT count(DISTINCT CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END) - 1
       |        FROM lineitem WHERE $f IS NOT NULL) AS INT) AS dof
       |FROM (
       |  SELECT o, sum(o) OVER (PARTITION BY v) * sum(o) OVER (PARTITION BY y)
       |            / CAST(sum(o) OVER () AS DOUBLE) AS e
       |  FROM (
       |    SELECT vv.v, yy.y, COALESCE(obs.o, 0) AS o
       |    FROM (SELECT DISTINCT v FROM (SELECT $f AS v FROM lineitem WHERE $f IS NOT NULL)) vv
       |    CROSS JOIN (SELECT DISTINCT CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END AS y
       |                FROM lineitem WHERE $f IS NOT NULL) yy
       |    LEFT JOIN (SELECT $f AS v, CASE WHEN l_quantity > 25 THEN 'hi' ELSE 'lo' END AS y,
       |                      count(*) AS o
       |               FROM lineitem WHERE $f IS NOT NULL GROUP BY 1, 2) obs
       |      USING (v, y)))""".stripMargin

  val oracle: Map[String, String] = Map(
    "chi_square" ->
      s"""SELECT * FROM (
         |${chiSql("l_returnflag")}
         |UNION ALL ${chiSql("l_linestatus")})
         |ORDER BY feature""".stripMargin,
    "psi_drift" ->
      s"""WITH ${psiEdges("l_quantity")},
         |${psiEdges("l_extendedprice")},
         |${psiEdges("l_discount")}
         |SELECT * FROM (
         |${psiSql("l_quantity")}
         |UNION ALL ${psiSql("l_extendedprice")}
         |UNION ALL ${psiSql("l_discount")})
         |ORDER BY feature""".stripMargin,
    "outlier_bounds" -> {
      def row(c: String) =
        s"""SELECT '$c' AS "column",
           |  round(q1 - 1.5*(q3-q1), 6) AS lower_bound, round(q3 + 1.5*(q3-q1), 6) AS upper_bound
           |FROM (SELECT quantile_cont(CAST($c AS DOUBLE), 0.25) AS q1, quantile_cont(CAST($c AS DOUBLE), 0.75) AS q3 FROM lineitem)""".stripMargin
      s"""SELECT * FROM (
         |${row("l_quantity")}
         |UNION ALL ${row("l_extendedprice")}
         |UNION ALL ${row("l_discount")})
         |ORDER BY "column"""".stripMargin
    },
    "outlier_cap_stats" ->
      """WITH b AS (SELECT q1 - 1.5*(q3-q1) AS lo, q3 + 1.5*(q3-q1) AS hi
        |           FROM (SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS q1,
        |                        quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS q3 FROM lineitem)),
        |c AS (SELECT CASE WHEN l_extendedprice < lo THEN lo WHEN l_extendedprice > hi THEN hi
        |             ELSE l_extendedprice END AS v FROM lineitem, b)
        |SELECT round(avg(v), 6) AS avg_capped, round(min(v), 6) AS min_capped,
        |       round(max(v), 6) AS max_capped, count(*) AS n FROM c""".stripMargin,
    "outlier_drop_stats" ->
      """WITH b AS (SELECT q1 - 1.5*(q3-q1) AS lo, q3 + 1.5*(q3-q1) AS hi
        |           FROM (SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS q1,
        |                        quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS q3 FROM lineitem))
        |SELECT count(*) AS n, round(avg(l_extendedprice), 6) AS avg_kept
        |FROM lineitem, b
        |WHERE l_extendedprice IS NULL OR (l_extendedprice >= lo AND l_extendedprice <= hi)""".stripMargin,
    "impute_mean" ->
      """WITH base AS (SELECT CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_quantity END AS q FROM lineitem),
        |m AS (SELECT avg(q) AS v FROM base)
        |SELECT round(avg(COALESCE(q, v)), 6) AS avg_q, count(COALESCE(q, v)) AS n_nonnull
        |FROM base, m""".stripMargin,
    "impute_mode" ->
      """WITH base AS (SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS seg FROM customer),
        |m AS (SELECT seg AS v FROM base WHERE seg IS NOT NULL
        |      GROUP BY seg ORDER BY count(*) DESC, seg ASC LIMIT 1)
        |SELECT COALESCE(seg, v) AS seg, count(*) AS n
        |FROM base, m GROUP BY 1 ORDER BY 1""".stripMargin,
    "grouped_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS q25,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS q50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS q75
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // LEFT join like Binning.groupedBinning: a null group key keeps its
    // row with a null bucket (an inner join would silently drop it)
    "grouped_binning" ->
      """WITH e AS (SELECT event_type,
        |    quantile_cont(CAST(value AS DOUBLE), [0.25, 0.5, 0.75]) AS edges
        |  FROM events GROUP BY 1)
        |SELECT event_id, ev.event_type,
        |  CAST(len(list_filter(edges, x -> x <= CAST(ev.value AS DOUBLE))) AS INT) AS bucket
        |FROM events ev LEFT JOIN e ON ev.event_type = e.event_type
        |ORDER BY event_id""".stripMargin,
    "binning_quantile" ->
"""WITH e AS (SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.0) AS s0,
        |                  quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.2) AS s1,
        |                  quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.4) AS s2,
        |                  quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.6) AS s3,
        |                  quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.8) AS s4,
        |                  quantile_cont(CAST(l_extendedprice AS DOUBLE), 1.0) AS s5 FROM lineitem)
        |SELECT CASE WHEN l_extendedprice >= s0 AND l_extendedprice < s1 THEN 0
        |            WHEN l_extendedprice >= s1 AND l_extendedprice < s2 THEN 1
        |            WHEN l_extendedprice >= s2 AND l_extendedprice < s3 THEN 2
        |            WHEN l_extendedprice >= s3 AND l_extendedprice < s4 THEN 3
        |            WHEN l_extendedprice >= s4 AND l_extendedprice <= s5 THEN 4
        |            ELSE NULL END AS l_extendedprice_bin, count(*) AS n
        |FROM lineitem, e GROUP BY 1 ORDER BY 1""".stripMargin,
    "target_encoding" ->
      """SELECT c_mktsegment,
        |  round(avg(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END), 6) AS c_mktsegment_te
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "frequency_encoding" ->
      """SELECT c_mktsegment,
        |  round(count(*) / CAST((SELECT count(*) FROM customer) AS DOUBLE), 6) AS c_mktsegment_freq
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "onehot_encoding" ->
      """SELECT CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS c_mktsegment_AUTOMOBILE,
        |       CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS c_mktsegment_BUILDING,
        |       CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS c_mktsegment_FURNITURE,
        |       CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS c_mktsegment_HOUSEHOLD,
        |       CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS c_mktsegment_MACHINERY
        |FROM customer""".stripMargin,
    "ordinal_encoding" ->
      """SELECT o_orderpriority,
        |  CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
        |       WHEN '4-NOT SPECIFIED' THEN 4 WHEN '5-LOW' THEN 5 ELSE -1 END AS o_orderpriority_ord,
        |  count(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY o_orderpriority""".stripMargin,
    "label_encoding" ->
      """SELECT c_mktsegment,
        |  CAST(row_number() OVER (ORDER BY count(*) DESC, c_mktsegment ASC) - 1 AS INT) AS c_mktsegment_idx
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment_idx""".stripMargin,
    "scaling_minmax" ->
      """WITH s AS (SELECT CAST(min(l_quantity) AS DOUBLE) AS a, CAST(max(l_quantity) AS DOUBLE) AS b FROM lineitem),
        |v AS (SELECT (l_quantity - a) / (b - a) AS x FROM lineitem, s)
        |SELECT round(min(x), 6) AS min_s, round(max(x), 6) AS max_s,
        |       round(quantile_cont(x, 0.5), 6) AS med_s FROM v""".stripMargin,
    "scaling_robust" ->
      """WITH s AS (SELECT round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS m,
        |           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75)
        |             - quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 6) AS iqr
        |           FROM lineitem),
        |v AS (SELECT (l_extendedprice - m) / iqr AS x FROM lineitem, s)
        |SELECT round(quantile_cont(x, 0.5), 6) AS med_s,
        |       round(min(x), 6) AS min_s, round(max(x), 6) AS max_s FROM v""".stripMargin,
    "scaling_standard" ->
      """WITH s AS (SELECT avg(l_quantity) AS m, stddev(l_quantity) AS sd FROM lineitem),
        |v AS (SELECT (l_quantity - m) / sd AS x FROM lineitem, s)
        |SELECT round(stddev(x), 6) AS sd_s, round(min(x), 6) AS min_s, round(max(x), 6) AS max_s FROM v""".stripMargin,
    "mad_table" -> {
      def one(c: String) =
        s"""SELECT '$c' AS "column",
           |  round((SELECT quantile_cont(CAST($c AS DOUBLE), 0.5) FROM lineitem), 6) AS median,
           |  round(quantile_cont(abs(CAST($c AS DOUBLE)
           |    - (SELECT quantile_cont(CAST($c AS DOUBLE), 0.5) FROM lineitem)), 0.5), 6) AS mad
           |FROM lineitem""".stripMargin
      s"""SELECT * FROM (
         |${one("l_discount")}
         |UNION ALL ${one("l_extendedprice")}
         |UNION ALL ${one("l_quantity")})
         |ORDER BY "column"""".stripMargin
    },
    "sparseness" ->
      """SELECT * FROM (
        |  SELECT 'l_discount' AS "column", round(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS zero_density FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', round(sum(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) FROM lineitem)
        |ORDER BY "column"""".stripMargin,
    "cv_table" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS "column", round(stddev(l_quantity) / avg(l_quantity), 6) AS cv FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', round(stddev(l_extendedprice) / avg(l_extendedprice), 6) FROM lineitem
        |  UNION ALL SELECT 'l_discount', round(stddev(l_discount) / avg(l_discount), 6) FROM lineitem)
        |ORDER BY "column"""".stripMargin,
    "iv_table" ->
      s"""SELECT * FROM (
         |${ivSql("l_quantity")}
         |UNION ALL ${ivSql("l_extendedprice")}
         |UNION ALL ${ivSql("l_discount")})
         |ORDER BY feature""".stripMargin)
}
