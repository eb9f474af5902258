package graft.queries

import graft.Exprs
import graft.align.Preference
import graft.similarity.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Support._

/** Preference / alignment data-prep queries (graft.align.Preference +
  * the semantic decontamination screen): every fixture is deterministic
  * arithmetic over the driver tables — md5-draw scores, modular prompt
  * groups — so DuckDB replays pair construction, MM iterations, and
  * template rendering in full. */
object AlignQueries {

  /** 30 prompts × 8 scored responses derived from documents: prompt =
    * doc_id % 30, score = a 52-bit md5 draw in [0, 100) with one decimal
    * — ties possible (and wanted: they exercise the deterministic
    * (score, id) tie ranks in both engines). */
  private def responses(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") >= 30 && col("doc_id") < 270)
      .select(
        pmod(col("doc_id"), lit(30L)).as("prompt_id"),
        col("doc_id").as("response_id"),
        col("text").as("response"),
        ((Exprs.md5Bits52(concat(lit("score:"), col("doc_id").cast("string")))
          % 1000) / lit(10.0)).as("score"))

  private val responsesSql: String =
    """resp AS (
      |  SELECT doc_id % 30 AS prompt_id, doc_id AS response_id, text AS response,
      |    (CAST('0x' || substring(md5('score:' || CAST(doc_id AS VARCHAR)), 1, 13)
      |      AS BIGINT) % 1000) / 10.0 AS score
      |  FROM documents WHERE doc_id >= 30 AND doc_id < 270)""".stripMargin

  /** Pairwise comparisons among 8 items from documents: per doc, two
    * distinct items (a, b) by modular arithmetic, winner by an md5 draw
    * biased toward the higher index — a graded strength ladder the
    * Bradley–Terry MLE recovers. */
  private def outcomes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 480)
      .select(
        pmod(col("doc_id"), lit(8L)).as("a"),
        pmod(expr("doc_id div 8"), lit(7L)).as("b0"),
        Exprs.md5Bits52(concat(lit("bt:"), col("doc_id").cast("string"))).as("d"))
      .withColumn("b", when(col("b0") >= col("a"), col("b0") + 1).otherwise(col("b0")))
      .select(
        when(pmod(col("d"), col("a") + col("b") + 2) <= col("a"), col("b"))
          .otherwise(col("a")).as("winner"),
        when(pmod(col("d"), col("a") + col("b") + 2) <= col("a"), col("a"))
          .otherwise(col("b")).as("loser"))

  private val outcomesSql: String =
    """o AS (
      |  SELECT CASE WHEN d % (a + b + 2) <= a THEN b ELSE a END AS winner,
      |         CASE WHEN d % (a + b + 2) <= a THEN a ELSE b END AS loser
      |  FROM (
      |    SELECT a, CASE WHEN b0 >= a THEN b0 + 1 ELSE b0 END AS b, d
      |    FROM (
      |      SELECT doc_id % 8 AS a, (doc_id // 8) % 7 AS b0,
      |        CAST('0x' || substring(md5('bt:' || CAST(doc_id AS VARCHAR)), 1, 13)
      |          AS BIGINT) AS d
      |      FROM documents WHERE doc_id < 480)))""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- best-of-N rejection sampling: top-2 responses per prompt by
    // score (bounded-heap per-key aggregate, ties to the lower id)
    "best_of_n" -> { (s, dir) =>
      Preference.bestOfN(responses(s, dir), "prompt_id", "response_id", "score", n = 2)
        .orderBy(col("prompt_id"), col("rank"))
    },
    // --- DPO pair construction, max-min policy: ONE (best, worst) pair
    // per prompt, margin-gated
    "preference_pairs" -> { (s, dir) =>
      Preference.preferencePairs(responses(s, dir),
        "prompt_id", "response_id", "response", "score",
        policy = "max-min", minMargin = 5.0)
        .orderBy(col("prompt_id"))
    },
    // --- all-pairs policy at a wide margin gate: every ordered pair
    // whose score gap clears 50
    "preference_pairs_all" -> { (s, dir) =>
      Preference.preferencePairs(responses(s, dir),
        "prompt_id", "response_id", "response", "score",
        policy = "all", minMargin = 50.0)
        .orderBy(col("prompt_id"), col("chosen_id"), col("rejected_id"))
    },
    // --- verbosity-bias diagnostic over the all-pairs frame: win rate
    // of the longer response per length-gap bucket + the 'all' rollup
    "length_bias" -> { (s, dir) =>
      Preference.lengthBiasReport(
        Preference.preferencePairs(responses(s, dir),
          "prompt_id", "response_id", "response", "score", policy = "all"),
        "chosen", "rejected")
        .orderBy(col("len_gap_bucket"))
    },
    // --- Bradley–Terry strengths: 10 MM iterations over 480 planted
    // comparisons among 8 items; the oracle unrolls every iteration
    "bradley_terry" -> { (s, dir) =>
      Preference.bradleyTerry(outcomes(s, dir), "winner", "loser", iterations = 10)
        .orderBy(col("item"))
    },
    // --- DPO ChatML rendering of the max-min pairs: chosen/rejected
    // texts share the SFT template; mask offsets replayed from the same
    // length arithmetic
    "dpo_render" -> { (s, dir) =>
      val prompts = t(s, dir, "documents").filter(col("doc_id") < 30)
        .select(col("doc_id").as("prompt_id"), col("text").as("prompt"))
      val pairs = Preference.preferencePairs(responses(s, dir),
        "prompt_id", "response_id", "response", "score")
        .join(prompts, Seq("prompt_id"))
      Preference.dpoRender(pairs, "prompt_id", "prompt", "chosen", "rejected")
        .orderBy(col("prompt_id"))
    },
    // --- semantic decontamination report: every corpus vector's best
    // benchmark match at cosine >= 0.999 (bench = every 17th vector, so
    // the planted self-matches at cosine 1 MUST flag)
    "semantic_decontam" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val bench = e.filter(pmod(col("vec_id"), lit(17L)) === 0)
        .select(col("vec_id").as("bench_id"), col("embedding").as("bvec"))
      Similarity.semanticContaminationReport(
        e, "vec_id", "embedding", bench, "bench_id", "bvec", threshold = 0.999)
        .orderBy(col("vec_id"))
    },
    // --- enforcement twin: the surviving corpus ids after dropping
    // every flagged row
    "semantic_decontam_survivors" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val bench = e.filter(pmod(col("vec_id"), lit(17L)) === 0)
        .select(col("vec_id").as("bench_id"), col("embedding").as("bvec"))
      Similarity.decontaminateSemantic(
        e, "vec_id", "embedding", bench, "bench_id", "bvec", threshold = 0.999)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    })

  /** Bradley–Terry oracle: the 10 MM iterations unrolled as chained CTEs
    * (the PageRank-oracle treatment) — per-pair game counts, per-item
    * wins, p ← W / Σ n/(p_i+p_j), mean-1 renormalization each step.
    * Every chained CTE is MATERIALIZED: DuckDB inlines CTEs by default,
    * and each iteration references the previous strength table ~3 times,
    * so inlining re-expands the base parquet scan 3^10 times (it dies on
    * open file handles before it dies on time). */
  private val bradleyTerryOracleSql: String = {
    def iter(k: Int): String =
      s"""d$k AS MATERIALIZED (
         |  SELECT s.i, sum(CASE WHEN pi.p + pj.p > 0
         |      THEN s.n / (pi.p + pj.p) ELSE 0 END) AS den
         |  FROM sym s
         |  JOIN p${k - 1} pi ON pi.i = s.i
         |  JOIN p${k - 1} pj ON pj.i = s.j
         |  GROUP BY s.i),
         |q$k AS MATERIALIZED (
         |  SELECT p.i, p.w,
         |    CASE WHEN d.den > 0 THEN CAST(p.w AS DOUBLE) / d.den ELSE 0.0 END AS praw
         |  FROM p${k - 1} p LEFT JOIN d$k d ON d.i = p.i),
         |p$k AS MATERIALIZED (
         |  SELECT q.i,
         |    CASE WHEN t.s > 0 THEN q.praw * t.c / t.s ELSE 0.0 END AS p, q.w
         |  FROM q$k q CROSS JOIN
         |    (SELECT sum(praw) AS s, CAST(count(*) AS DOUBLE) AS c FROM q$k) t)""".stripMargin
    s"""WITH $outcomesSql,
       |dir AS MATERIALIZED (
       |        SELECT winner AS w, loser AS l, CAST(count(*) AS BIGINT) AS c
       |        FROM o GROUP BY winner, loser),
       |sym AS MATERIALIZED (
       |        SELECT i, j, CAST(sum(c) AS BIGINT) AS n FROM (
       |          SELECT w AS i, l AS j, c FROM dir
       |          UNION ALL SELECT l AS i, w AS j, c FROM dir) GROUP BY i, j),
       |wins AS (SELECT w AS i, CAST(sum(c) AS BIGINT) AS wins FROM dir GROUP BY w),
       |games AS (SELECT i, CAST(sum(n) AS BIGINT) AS games FROM sym GROUP BY i),
       |v AS (SELECT DISTINCT i FROM sym),
       |p0 AS MATERIALIZED (
       |       SELECT v.i, 1.0 AS p, coalesce(wins.wins, 0) AS w
       |       FROM v LEFT JOIN wins ON wins.i = v.i),
       |""".stripMargin +
      (1 to 10).map(iter).mkString(",\n") +
      """
        |SELECT p.i AS item, round(p.p, 6) AS strength, p.w AS n_wins,
        |  coalesce(g.games, 0) AS n_games
        |FROM p10 p LEFT JOIN games g ON g.i = p.i
        |ORDER BY item""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "best_of_n" ->
      s"""WITH $responsesSql,
         |r AS (SELECT prompt_id,
         |  CAST(row_number() OVER (PARTITION BY prompt_id
         |    ORDER BY score DESC, response_id) AS INT) AS rank,
         |  score, response_id, response FROM resp)
         |SELECT prompt_id, rank, score, response_id, response
         |FROM r WHERE rank <= 2 ORDER BY prompt_id, rank""".stripMargin,
    "preference_pairs" ->
      s"""WITH $responsesSql,
         |c AS (SELECT prompt_id, response_id AS chosen_id, response AS chosen,
         |        score AS chosen_score,
         |        row_number() OVER (PARTITION BY prompt_id
         |          ORDER BY score DESC, response_id) AS rn FROM resp),
         |j AS (SELECT prompt_id, response_id AS rejected_id, response AS rejected,
         |        score AS rejected_score,
         |        row_number() OVER (PARTITION BY prompt_id
         |          ORDER BY score ASC, response_id) AS rn FROM resp)
         |SELECT c.prompt_id, chosen_id, rejected_id, chosen, rejected,
         |  chosen_score, rejected_score, chosen_score - rejected_score AS margin
         |FROM c JOIN j ON c.prompt_id = j.prompt_id AND c.rn = 1 AND j.rn = 1
         |WHERE chosen_score - rejected_score > 0
         |  AND chosen_score - rejected_score >= 5.0
         |ORDER BY c.prompt_id""".stripMargin,
    "preference_pairs_all" ->
      s"""WITH $responsesSql
         |SELECT a.prompt_id, a.response_id AS chosen_id, b.response_id AS rejected_id,
         |  a.response AS chosen, b.response AS rejected,
         |  a.score AS chosen_score, b.score AS rejected_score,
         |  a.score - b.score AS margin
         |FROM resp a JOIN resp b ON a.prompt_id = b.prompt_id
         |WHERE a.score - b.score > 0 AND a.score - b.score >= 50.0
         |ORDER BY a.prompt_id, chosen_id, rejected_id""".stripMargin,
    "length_bias" ->
      s"""WITH $responsesSql,
         |pairs AS (
         |  SELECT length(a.response) AS lc, length(b.response) AS lr
         |  FROM resp a JOIN resp b ON a.prompt_id = b.prompt_id
         |  WHERE a.score - b.score > 0),
         |b AS (SELECT CASE WHEN abs(lc - lr) = 0 THEN '0'
         |        WHEN abs(lc - lr) <= 10 THEN '1-10'
         |        WHEN abs(lc - lr) <= 50 THEN '11-50'
         |        WHEN abs(lc - lr) <= 200 THEN '51-200'
         |        ELSE '>200' END AS len_gap_bucket,
         |        CAST(lc AS BIGINT) AS lc, CAST(lr AS BIGINT) AS lr FROM pairs)
         |SELECT coalesce(len_gap_bucket, 'all') AS len_gap_bucket,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(avg(CASE WHEN lc > lr THEN 1.0 WHEN lc < lr THEN 0.0
         |    ELSE 0.5 END), 6) AS longer_chosen_rate,
         |  round(avg(lc), 6) AS mean_chosen_chars,
         |  round(avg(lr), 6) AS mean_rejected_chars
         |FROM b GROUP BY ROLLUP(len_gap_bucket)
         |ORDER BY len_gap_bucket""".stripMargin,
    "bradley_terry" -> bradleyTerryOracleSql,
    "dpo_render" ->
      s"""WITH $responsesSql,
         |c AS (SELECT prompt_id, response AS chosen, score,
         |        row_number() OVER (PARTITION BY prompt_id
         |          ORDER BY score DESC, response_id) AS rn FROM resp),
         |j AS (SELECT prompt_id, response AS rejected, score,
         |        row_number() OVER (PARTITION BY prompt_id
         |          ORDER BY score ASC, response_id) AS rn FROM resp),
         |pairs AS (
         |  SELECT c.prompt_id,
         |    regexp_replace(c.chosen, '^[ \\t\\n\\x0b\\f\\r]+', '') AS ch,
         |    regexp_replace(j.rejected, '^[ \\t\\n\\x0b\\f\\r]+', '') AS rj,
         |    regexp_replace(d.text, '^[ \\t\\n\\x0b\\f\\r]+', '') AS p
         |  FROM c JOIN j ON c.prompt_id = j.prompt_id AND c.rn = 1 AND j.rn = 1
         |  JOIN documents d ON d.doc_id = c.prompt_id
         |  WHERE c.score - j.score > 0)
         |SELECT prompt_id,
         |  '<|im_start|>user' || chr(10) || p || '<|im_end|>' || chr(10) ||
         |    '<|im_start|>assistant' || chr(10) || ch || '<|im_end|>' || chr(10)
         |    AS chosen_text,
         |  CAST(28 + length(p) + 22 AS BIGINT) AS chosen_mask_start,
         |  CAST(28 + length(p) + 32 + length(ch) AS BIGINT) AS chosen_mask_end,
         |  '<|im_start|>user' || chr(10) || p || '<|im_end|>' || chr(10) ||
         |    '<|im_start|>assistant' || chr(10) || rj || '<|im_end|>' || chr(10)
         |    AS rejected_text,
         |  CAST(28 + length(p) + 22 AS BIGINT) AS rejected_mask_start,
         |  CAST(28 + length(p) + 32 + length(rj) AS BIGINT) AS rejected_mask_end
         |FROM pairs ORDER BY prompt_id""".stripMargin,
    "semantic_decontam" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |b AS (SELECT vec_id AS bench_id, v AS bv FROM e WHERE vec_id % 17 = 0),
        |s AS (SELECT e.vec_id, b.bench_id,
        |        round(list_dot_product(v, bv)
        |          / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(bv, bv))), 6) AS cs
        |      FROM e, b
        |      WHERE list_dot_product(v, v) > 0 AND list_dot_product(bv, bv) > 0),
        |m AS (SELECT vec_id, max(struct_pack(s := cs, nb := -bench_id)) AS m
        |      FROM s GROUP BY vec_id)
        |SELECT vec_id, CAST(-m.nb AS BIGINT) AS bench_id, m.s AS cosine
        |FROM m WHERE m.s >= 0.999 ORDER BY vec_id""".stripMargin,
    "semantic_decontam_survivors" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |b AS (SELECT vec_id AS bench_id, v AS bv FROM e WHERE vec_id % 17 = 0),
        |s AS (SELECT e.vec_id, b.bench_id,
        |        round(list_dot_product(v, bv)
        |          / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(bv, bv))), 6) AS cs
        |      FROM e, b
        |      WHERE list_dot_product(v, v) > 0 AND list_dot_product(bv, bv) > 0),
        |m AS (SELECT vec_id, max(struct_pack(s := cs, nb := -bench_id)) AS m
        |      FROM s GROUP BY vec_id),
        |flagged AS (SELECT vec_id FROM m WHERE m.s >= 0.999)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM flagged)
        |ORDER BY vec_id""".stripMargin)
}
