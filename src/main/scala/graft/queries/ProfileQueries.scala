package graft.queries

import graft.profile.Profile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Support._

/** EDA / profiling queries with DuckDB oracles. */
object ProfileQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "constraint_checks" -> { (s, dir) =>
      import graft.profile.Constraints._
      graft.profile.Constraints.check(
        t(s, dir, "customer"),
        Seq(
          NotNull("c_custkey"),
          Unique("c_custkey"),
          NotNull("c_acctbal"),
          // deliberately tight range / reduced set so violations are non-zero
          InRange("c_acctbal", 0.0, 5000.0),
          InSet("c_mktsegment", Seq("AUTOMOBILE", "BUILDING", "FURNITURE")),
          MatchesRegex("c_name", "Customer#[0-9]+")))
    },
    "missing_counts" -> { (s, dir) =>
      Profile.missingValueCounts(t(s, dir, "customer")).orderBy(col("column"))
    },
    "missing_summary" -> { (s, dir) =>
      // inject nulls so the buckets are non-trivial
      Profile
        .missingValueSummary(
          t(s, dir, "customer").withColumn(
            "c_acctbal",
            when(col("c_custkey") % 3 === 0, lit(null)).otherwise(col("c_acctbal"))))
        .orderBy(col("column"))
    },
    "column_summary" -> { (s, dir) =>
      Profile.columnValuesSummary(t(s, dir, "customer"), exact = Support.exact)
        .orderBy(col("column"))
    },
    "health_analysis" -> { (s, dir) =>
      Profile.healthAnalysis(t(s, dir, "customer"), exact = Support.exact)
    },
    "outlier_counts" -> { (s, dir) =>
      Profile
        .outlierCounts(
          t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"),
          exact = Support.exact)
        .orderBy(col("column"))
    },
    "describe_numeric" -> { (s, dir) =>
      Profile
        .describeData(
          t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"),
          exact = Support.exact)
        .orderBy(col("column"))
    },
    "describe_categorical" -> { (s, dir) =>
      Profile
        .describeCategorical(t(s, dir, "customer"), Seq("c_mktsegment", "c_name"))
        .orderBy(col("column"))
    },
    "set_analysis" -> { (s, dir) =>
      Profile.setAnalyse(
        t(s, dir, "customer").select(col("c_custkey")),
        t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
        "c_custkey")
    },
    "histogram" -> { (s, dir) =>
      Profile.histogram(t(s, dir, "lineitem"), "l_extendedprice", bins = 10)
        .orderBy(col("bucket"))
    },
    "set_analysis_keys" -> { (s, dir) =>
      Profile.setAnalyseKeys(
        t(s, dir, "customer").select(col("c_custkey")),
        t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
        "c_custkey", maxKeysPerCategory = 50)
        .orderBy(col("category"), col("c_custkey"))
    },
    "correlation_with_target" -> { (s, dir) =>
      Profile
        .correlationWithTarget(
          t(s, dir, "lineitem"),
          Seq("l_extendedprice", "l_discount", "l_tax"),
          "l_quantity")
        .orderBy(col("column"))
    },
    "correlation_matrix" -> { (s, dir) =>
      Profile
        .correlationMatrix(
          t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy(col("col_a"), col("col_b"))
    },
    // --- skew diagnosis: heaviest join keys with share + skew factor (the
    // measurement that decides salted join vs plain AQE)
    "key_skew_profile" -> { (s, dir) =>
      graft.dp.SkewJoin.keySkewProfile(events(s, dir), "user_id", topK = 20)
    },
    // --- the remedy for what key_skew_profile flags: the salted join on
    // the same events.user_id key. Salting spreads each hot key over 8
    // sub-partitions (placement only — the result is EXACTLY the plain
    // join's, which is what the DuckDB oracle checks). The aggregate
    // output keeps the compare compact while any dropped or duplicated
    // row under salting flips the counts and fails the hash.
    "skew_join" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.dp.SkewJoin.saltedJoin(events(s, dir), cust, "user_id", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"), sumd(col("value")).as("total_value"))
        .orderBy(col("c_mktsegment"))
    })

  private val custMissing =
    """sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
      | + sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
      | + sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
      | + sum(CASE WHEN c_acctbal IS NULL OR isnan(c_acctbal) THEN 1 ELSE 0 END)
      | + sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)""".stripMargin

  private def describeCol(c: String): String =
    s"""SELECT '$c' AS "column", CAST(count($c) AS DOUBLE) AS "count",
       |  round(avg($c), 6) AS mean, round(stddev($c), 6) AS stddev,
       |  CAST(min($c) AS DOUBLE) AS min,
       |  round(quantile_cont($c, 0.25), 6) AS p25,
       |  round(quantile_cont($c, 0.5), 6) AS p50,
       |  round(quantile_cont($c, 0.75), 6) AS p75,
       |  CAST(max($c) AS DOUBLE) AS max
       |FROM lineitem""".stripMargin

  private def outlierCol(c: String): String =
    s"""SELECT '$c' AS "column",
       |  CAST(sum(CASE WHEN $c < q1 - 1.5*(q3-q1) OR $c > q3 + 1.5*(q3-q1) THEN 1 ELSE 0 END) AS BIGINT) AS iqr_outliers,
       |  CAST(sum(CASE WHEN $c < m - 3*sd OR $c > m + 3*sd THEN 1 ELSE 0 END) AS BIGINT) AS sdv_outliers
       |FROM lineitem, (SELECT quantile_cont($c, 0.25) AS q1, quantile_cont($c, 0.75) AS q3,
       |                avg($c) AS m, stddev($c) AS sd FROM lineitem)""".stripMargin

  val oracle: Map[String, String] = Map(
    "skew_join" ->
      """SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "key_skew_profile" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_keys FROM c)
        |SELECT user_id, n, round(n / total, 6) AS share,
        |       round(n * n_keys / total, 6) AS skew_x
        |FROM c, t ORDER BY n DESC, user_id LIMIT 20""".stripMargin,
    "constraint_checks" ->
      """WITH a AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_key,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS nd_key,
        |    CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_bal,
        |    CAST(sum(CASE WHEN c_acctbal < 0 OR c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS rng_bal,
        |    CAST(sum(CASE WHEN c_mktsegment IS NOT NULL
        |                   AND c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE')
        |             THEN 1 ELSE 0 END) AS BIGINT) AS set_seg,
        |    CAST(sum(CASE WHEN c_name IS NOT NULL
        |                   AND NOT regexp_full_match(c_name, 'Customer#[0-9]+')
        |             THEN 1 ELSE 0 END) AS BIGINT) AS rx_name
        |  FROM customer)
        |SELECT * FROM (
        |  SELECT 'in_range' AS check_name, 'c_acctbal' AS col_name,
        |         rng_bal AS violations, rng_bal = 0 AS passed FROM a
        |  UNION ALL SELECT 'in_set', 'c_mktsegment', set_seg, set_seg = 0 FROM a
        |  UNION ALL SELECT 'matches_regex', 'c_name', rx_name, rx_name = 0 FROM a
        |  UNION ALL SELECT 'not_null', 'c_acctbal', nn_bal, nn_bal = 0 FROM a
        |  UNION ALL SELECT 'not_null', 'c_custkey', nn_key, nn_key = 0 FROM a
        |  UNION ALL SELECT 'unique', 'c_custkey',
        |    n - nd_key - CASE WHEN nn_key > 0 THEN 1 ELSE 0 END,
        |    (n - nd_key - CASE WHEN nn_key > 0 THEN 1 ELSE 0 END) = 0 FROM a)
        |ORDER BY check_name, col_name""".stripMargin,
    "missing_summary" ->
      """SELECT "column", missing_count, missing_pct,
        |  CASE WHEN missing_pct = 0.0 THEN 'none'
        |       WHEN missing_pct < 5.0 THEN 'low (<5%)'
        |       WHEN missing_pct < 25.0 THEN 'moderate (<25%)'
        |       WHEN missing_pct < 50.0 THEN 'high (<50%)'
        |       ELSE 'critical (>=50%)' END AS bucket
        |FROM (
        |  SELECT 'c_custkey' AS "column", CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_count, round(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) * 100.0 / count(*), 4) AS missing_pct FROM customer
        |  UNION ALL SELECT 'c_name', CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT), round(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) * 100.0 / count(*), 4) FROM customer
        |  UNION ALL SELECT 'c_nationkey', CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), round(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) * 100.0 / count(*), 4) FROM customer
        |  UNION ALL SELECT 'c_acctbal', CAST(sum(CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT), round(sum(CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END) * 100.0 / count(*), 4) FROM customer
        |  UNION ALL SELECT 'c_mktsegment', CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT), round(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) * 100.0 / count(*), 4) FROM customer)
        |ORDER BY "column"""".stripMargin,
    "missing_counts" ->
      """SELECT * FROM (
        |  SELECT 'c_custkey' AS "column", CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_count FROM customer
        |  UNION ALL SELECT 'c_name', CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM customer
        |  UNION ALL SELECT 'c_nationkey', CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM customer
        |  UNION ALL SELECT 'c_acctbal', CAST(sum(CASE WHEN c_acctbal IS NULL OR isnan(c_acctbal) THEN 1 ELSE 0 END) AS BIGINT) FROM customer
        |  UNION ALL SELECT 'c_mktsegment', CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM customer)
        |ORDER BY "column"""".stripMargin,
    "column_summary" ->
      """SELECT * FROM (
        |  SELECT 'c_custkey' AS "column", 'bigint' AS dtype, CAST(count(DISTINCT c_custkey) AS BIGINT) AS distinct_count, round(count(DISTINCT c_custkey) * 100.0 / count(*), 4) AS distinct_pct FROM customer
        |  UNION ALL SELECT 'c_name', 'string', CAST(count(DISTINCT c_name) AS BIGINT), round(count(DISTINCT c_name) * 100.0 / count(*), 4) FROM customer
        |  UNION ALL SELECT 'c_nationkey', 'int', CAST(count(DISTINCT c_nationkey) AS BIGINT), round(count(DISTINCT c_nationkey) * 100.0 / count(*), 4) FROM customer
        |  UNION ALL SELECT 'c_acctbal', 'double', CAST(count(DISTINCT c_acctbal) AS BIGINT), round(count(DISTINCT c_acctbal) * 100.0 / count(*), 4) FROM customer
        |  UNION ALL SELECT 'c_mktsegment', 'string', CAST(count(DISTINCT c_mktsegment) AS BIGINT), round(count(DISTINCT c_mktsegment) * 100.0 / count(*), 4) FROM customer)
        |ORDER BY "column"""".stripMargin,
    "health_analysis" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS "rows", 5 AS cols,
         |  round(($custMissing) * 100.0 / (count(*) * 5), 4) AS missing_pct,
         |  round(3 * 100.0 / 5, 4) AS numeric_col_pct,
         |  round((count(*) - count(DISTINCT (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment))) * 100.0 / count(*), 4) AS duplicate_row_pct
         |FROM customer""".stripMargin,
    "outlier_counts" ->
      s"""SELECT * FROM (
         |${outlierCol("l_quantity")}
         |UNION ALL ${outlierCol("l_extendedprice")}
         |UNION ALL ${outlierCol("l_discount")})
         |ORDER BY "column"""".stripMargin,
    "describe_numeric" ->
      s"""SELECT * FROM (
         |${describeCol("l_quantity")}
         |UNION ALL ${describeCol("l_extendedprice")}
         |UNION ALL ${describeCol("l_discount")})
         |ORDER BY "column"""".stripMargin,
    "describe_categorical" ->
      """SELECT * FROM (
        |  SELECT 'c_mktsegment' AS "column", CAST(val AS VARCHAR) AS mode, cnt AS mode_freq
        |  FROM (SELECT c_mktsegment AS val, count(*) AS cnt FROM customer GROUP BY 1 ORDER BY cnt DESC, val ASC LIMIT 1)
        |  UNION ALL
        |  SELECT 'c_name', CAST(val AS VARCHAR), cnt
        |  FROM (SELECT c_name AS val, count(*) AS cnt FROM customer GROUP BY 1 ORDER BY cnt DESC, val ASC LIMIT 1))
        |ORDER BY "column"""".stripMargin,
    "histogram" ->
      """WITH s AS (SELECT min(l_extendedprice) AS mn,
        |                  (max(l_extendedprice) - min(l_extendedprice)) / 10 AS width
        |           FROM lineitem),
        |b AS (SELECT LEAST(CAST(floor((l_extendedprice - mn) / width) AS INT), 9) AS bucket,
        |             mn, width
        |      FROM lineitem, s WHERE l_extendedprice IS NOT NULL)
        |SELECT bucket,
        |  round(mn + bucket * width, 6) AS lo,
        |  round(mn + (bucket + 1) * width, 6) AS hi,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM b GROUP BY bucket, mn, width ORDER BY bucket""".stripMargin,
    "set_analysis_keys" ->
      """WITH ka AS (SELECT DISTINCT c_custkey AS k FROM customer),
        |     kb AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |     j AS (SELECT ka.k AS ak, kb.k AS bk FROM ka FULL OUTER JOIN kb ON ka.k = kb.k),
        |     m AS (SELECT COALESCE(ak, bk) AS k,
        |                  CASE WHEN bk IS NULL THEN 'a_only'
        |                       WHEN ak IS NULL THEN 'b_only'
        |                       ELSE 'both' END AS category
        |           FROM j),
        |     r AS (SELECT category, k,
        |                  row_number() OVER (PARTITION BY category ORDER BY k) AS rn
        |           FROM m)
        |SELECT category, k AS c_custkey FROM r WHERE rn <= 50
        |ORDER BY category, c_custkey""".stripMargin,
    "set_analysis" ->
      """WITH ka AS (SELECT DISTINCT c_custkey AS k FROM customer),
        |     kb AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |     j AS (SELECT ka.k AS ak, kb.k AS bk FROM ka FULL OUTER JOIN kb ON ka.k = kb.k)
        |SELECT CAST(sum(CASE WHEN bk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS a_minus_b,
        |       CAST(sum(CASE WHEN ak IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS b_minus_a,
        |       CAST(sum(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS a_intersect_b,
        |       CAST(count(*) AS BIGINT) AS a_union_b
        |FROM j""".stripMargin,
    "correlation_with_target" ->
      """SELECT * FROM (
        |  SELECT 'l_extendedprice' AS "column", round(corr(l_extendedprice, l_quantity), 6) AS correlation FROM lineitem
        |  UNION ALL SELECT 'l_discount', round(corr(l_discount, l_quantity), 6) FROM lineitem
        |  UNION ALL SELECT 'l_tax', round(corr(l_tax, l_quantity), 6) FROM lineitem)
        |ORDER BY "column"""".stripMargin,
    "correlation_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val rows = for (a <- cols; b <- cols)
        yield s"SELECT '$a' AS col_a, '$b' AS col_b, round(corr($a, $b), 6) AS correlation FROM lineitem"
      s"""SELECT * FROM (
         |${rows.mkString("\nUNION ALL ")})
         |ORDER BY col_a, col_b""".stripMargin
    })
}
