package graft.queries

import graft.Exprs
import graft.align.{Agreement, Preference}
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

  /** Two-rater rating log: r1 rates doc_id < 240, r2 rates 20..259 (the
    * inner join keeps the 220 co-rated items), labels l0/l1/l2 from an
    * md5 draw; r2 disagrees by +1 (mod 3) on every 4th item — planted
    * ~75% observed agreement. */
  private def cohenRatings(s: SparkSession, dir: String): DataFrame = {
    val d1 = pmod(
      Exprs.md5Bits52(concat(lit("k1:"), col("doc_id").cast("string"))), lit(3L))
    val flip = pmod(
      Exprs.md5Bits52(concat(lit("k2:"), col("doc_id").cast("string"))), lit(4L)) === 0
    val docs = t(s, dir, "documents")
    docs.filter(col("doc_id") < 240)
      .select(col("doc_id").as("item_id"), lit("r1").as("rater"),
        concat(lit("l"), d1.cast("string")).as("label"))
      .unionByName(docs.filter(col("doc_id") >= 20 && col("doc_id") < 260)
        .select(col("doc_id").as("item_id"), lit("r2").as("rater"),
          concat(lit("l"),
            when(flip, pmod(d1 + 1, lit(3L))).otherwise(d1).cast("string"))
            .as("label")))
  }

  /** Many-rater log for Fleiss: 150 items × raters 0-3, but every 10th
    * item keeps only raters 0-1 (exercises the variable-n retention);
    * labels mostly item-determined (70%) with md5 disagreement noise. */
  private def fleissRatings(s: SparkSession, dir: String): DataFrame = {
    val d = Exprs.md5Bits52(concat(
      lit("f:"), col("doc_id").cast("string"), lit(":"), col("r").cast("string")))
    t(s, dir, "documents").filter(col("doc_id") < 150)
      .select(col("doc_id"), explode(array(lit(0L), lit(1L), lit(2L), lit(3L))).as("r"))
      .filter(!(pmod(col("doc_id"), lit(10L)) === 0 && col("r") >= 2))
      .select(col("doc_id").as("item_id"),
        concat(lit("l"),
          when(pmod(d, lit(10L)) < 7, pmod(col("doc_id"), lit(3L)))
            .otherwise(pmod(d, lit(3L))).cast("string")).as("label"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- Cohen's kappa between the two planted raters over co-rated items
    "cohen_kappa" -> { (s, dir) =>
      Agreement.cohenKappa(cohenRatings(s, dir), "item_id", "rater", "label", "r1", "r2")
    },
    // --- Fleiss' kappa (variable rater counts) over the 4-rater log
    "fleiss_kappa" -> { (s, dir) =>
      Agreement.fleissKappa(fleissRatings(s, dir), "item_id", "label")
    },
    // --- Krippendorff's alpha (nominal) over the SAME variable-n log —
    // the third agreement statistic, coincidence-matrix construction
    "krippendorff_alpha" -> { (s, dir) =>
      Agreement.krippendorffAlpha(fleissRatings(s, dir), "item_id", "label")
    },
    // --- reward-model pairwise accuracy by confidence bucket: human
    // pairs from the all-policy construction, RM scores an independent
    // md5 draw per response — accuracy ~0.5 everywhere by construction,
    // the arithmetic (buckets, tie handling, rollup) is the contract
    "reward_pairwise" -> { (s, dir) =>
      def rm(id: org.apache.spark.sql.Column) =
        (Exprs.md5Bits52(concat(lit("rm:"), id.cast("string"))) % 400) / lit(20.0)
      val pairs = Preference.preferencePairs(responses(s, dir),
        "prompt_id", "response_id", "response", "score", policy = "all")
        .select(col("chosen_id"), col("rejected_id"),
          rm(col("chosen_id")).as("rm_chosen"),
          rm(col("rejected_id")).as("rm_rejected"))
      Preference.rewardModelReport(pairs, "rm_chosen", "rm_rejected")
        .orderBy(col("margin_bucket"))
    },
    // --- KTO unpaired-feedback rows: thumbs from the score draw (>=50
    // desirable), every 13th response unlabeled (dropped), class-balanced
    // weights
    "kto_rows" -> { (s, dir) =>
      val f = responses(s, dir).select(
        col("prompt_id"), col("response_id"),
        when(pmod(col("response_id"), lit(13L)) === 0, lit(null))
          .otherwise(col("score") >= 50).as("feedback"))
      Preference.ktoRows(f, "feedback").orderBy(col("response_id"))
    },
    // --- self-consistency majority vote: 20 samples per prompt, answers
    // mostly prompt-determined with md5 noise; ties resolve to the
    // lexicographically smallest answer
    "majority_vote" -> { (s, dir) =>
      val h = Exprs.md5Bits52(concat(lit("ans:"), col("doc_id").cast("string")))
      val samples = t(s, dir, "documents").filter(col("doc_id") < 400)
        .select(
          pmod(col("doc_id"), lit(20L)).as("prompt_id"),
          concat(lit("a"),
            when(pmod(h, lit(10L)) < 6,
              pmod(pmod(col("doc_id"), lit(20L)), lit(3L)))
              .otherwise(pmod(h, lit(4L))).cast("string")).as("answer"))
      Preference.majorityVote(samples, "prompt_id", "answer")
        .orderBy(col("prompt_id"))
    },
    // --- GRPO group-relative advantages over the 8-sample groups:
    // reward standardized within each prompt's group (sample std)
    "grpo_advantages" -> { (s, dir) =>
      Preference.groupAdvantages(
        responses(s, dir).select(col("prompt_id"), col("response_id"), col("score")),
        "prompt_id", "score")
        .orderBy(col("response_id"))
    },
    // --- Kendall τ-b between the human score draw and an independent RM
    // draw per prompt group: near-zero correlation by construction, the
    // pair-classification arithmetic is the contract
    "kendall_tau" -> { (s, dir) =>
      val r = responses(s, dir).select(
        col("prompt_id"), col("response_id"), col("score"),
        ((Exprs.md5Bits52(concat(lit("rm:"), col("response_id").cast("string")))
          % 400) / lit(20.0)).as("rm_score"))
      Preference.kendallTau(r, "prompt_id", "response_id", "score", "rm_score")
        .orderBy(col("prompt_id"))
    },
    // --- eval-harness results table: 6 tasks × 50 samples with planted
    // per-task rates, micro/macro rollups from the rounded terms
    "eval_summary" -> { (s, dir) =>
      val results = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(
          concat(lit("t"), pmod(col("doc_id"), lit(6L)).cast("string")).as("task"),
          (pmod(Exprs.md5Bits52(concat(lit("ev:"), col("doc_id").cast("string"))),
            lit(10L)) < pmod(col("doc_id"), lit(6L)) + 3).as("correct"))
      graft.eval.Metrics.evalSummary(results, "task", "correct")
        .orderBy(col("task"))
    },
    // --- the alignment release data card: pair volume + margin
    // percentiles over the all-policy pairs, the length-bias rollup,
    // both variable-n agreement statistics, and the per-task eval
    // summary — ONE tall (section, key, n, value) table, every section
    // replayed by the same DuckDB arithmetic as its standalone oracle
    "align_data_card" -> { (s, dir) =>
      val pairs = Preference.preferencePairs(responses(s, dir),
        "prompt_id", "response_id", "response", "score", policy = "all")
      val results = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(
          concat(lit("t"), pmod(col("doc_id"), lit(6L)).cast("string")).as("task"),
          (pmod(Exprs.md5Bits52(concat(lit("ev:"), col("doc_id").cast("string"))),
            lit(10L)) < pmod(col("doc_id"), lit(6L)) + 3).as("correct"))
      Preference.alignmentDataCard(
        pairs, "prompt_id", "chosen", "rejected", "margin",
        fleissRatings(s, dir), "item_id", "label",
        results, "task", "correct")
        .orderBy(col("section"), col("key"))
    },
    // --- unbiased best-of-k reward curve over the 8-sample groups:
    // k=1 recovers the group mean, k=8 the group max
    "best_of_n_curve" -> { (s, dir) =>
      Preference.bestOfNCurve(
        responses(s, dir).select(col("prompt_id"), col("score")),
        "prompt_id", "score", ks = Seq(1, 2, 4, 8))
        .orderBy(col("prompt_id"), col("k"))
    },
    // --- Codex pass@k over graded samples: 20 prompts × 20 samples,
    // per-prompt correctness rate cycling 0/0.1/0.2/0.3 (the 0-rate
    // prompts pin the c=0 branch), k ∈ {1, 5, 10}
    "pass_at_k" -> { (s, dir) =>
      val samples = t(s, dir, "documents").filter(col("doc_id") < 400)
        .select(
          pmod(col("doc_id"), lit(20L)).as("prompt_id"),
          (pmod(Exprs.md5Bits52(concat(lit("pass:"), col("doc_id").cast("string"))),
            lit(10L)) < pmod(pmod(col("doc_id"), lit(20L)), lit(4L))).as("correct"))
      Preference.passAtK(samples, "prompt_id", "correct", Seq(1, 5, 10))
        .orderBy(col("prompt_id"), col("k"))
    },
    // --- SFT conversation QA: the chat fixture with planted shape
    // breaks — every 7th conversation loses its final assistant turn,
    // every 5th(+3) gets a double-user alternation break. Convs 1, 5,
    // 9, 13, 17 additionally get TWO consecutive trailing TOOL turns
    // (the agentic-trace shape): without the tool exemption those convs
    // would flip ends_with_assistant AND strict_alternation to false —
    // both flags are canaries that tool turns stay out of the shape
    // checks while counting toward n_tool/total_chars. Their trailing
    // position also pins dangling_tool = true (the truncation canary
    // the exemption must not launder); every other conv reads false
    "conversation_stats" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val turn = floor(col("doc_id") / 20).cast("int")
      val conv = pmod(col("doc_id"), lit(20L))
      val turns = docs.filter(col("doc_id") < 200 &&
        !(turn === 9 && pmod(conv, lit(7L)) === 0))
        .select(
          conv.as("conv_id"), turn.as("turn_no"),
          when(turn === 4 && pmod(conv, lit(5L)) === 3, "user")
            .when(pmod(turn, lit(2)) === 0, "user")
            .otherwise("assistant").as("role"),
          col("text").as("content"))
        .unionByName(docs.filter(col("doc_id") < 20).select(
          col("doc_id").as("conv_id"), lit(-1).as("turn_no"),
          lit("system").as("role"),
          lit("You are a concise assistant.").as("content")))
        .unionByName(docs
          .filter(col("doc_id") < 40 && pmod(col("doc_id"), lit(4L)) === 1)
          .select(
            pmod(col("doc_id"), lit(20L)).as("conv_id"),
            (lit(10) + floor(col("doc_id") / 20)).cast("int").as("turn_no"),
            lit("tool").as("role"),
            concat(lit("{\"result\": "), col("doc_id").cast("string"),
              lit("}")).as("content")))
      graft.text.Packing
        .conversationStats(turns, "conv_id", "turn_no", "role", "content")
        .orderBy(col("conv_id"))
    },
    // --- RETRO retrieval neighbors at the exact operating point
    // (nprobe = nlist): top-10 cosine neighbors per chunk excluding the
    // chunk's own document (doc = vec_id % 25 -> 20 chunks per doc).
    // The corpus cap keeps the deliberately-exhaustive exact twin
    // bench-sized at larger sf (no-op at the sf0.01 oracle gate); the
    // production path's scaling is measured separately (SCALEBENCH r15)
    "cross_doc_neighbors_exact" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .filter(col("vec_id") < 1000)
        .select(col("vec_id"), col("embedding"),
          pmod(col("vec_id"), lit(25L)).as("doc"))
      Similarity.retrievalNeighbors(e, "vec_id", "embedding", "doc",
        k = 10, nlist = 16, nprobe = 16)
        .orderBy(col("query_id"), col("rank"))
    },
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
    // --- arena head-to-head matrix over the same planted comparisons:
    // unordered pairs, win rate + Wilson bounds
    "head_to_head" -> { (s, dir) =>
      Preference.headToHead(outcomes(s, dir), "winner", "loser")
        .orderBy(col("item_a"), col("item_b"))
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
    // --- multi-turn DPO rendering: 10 conversations with a 4-turn
    // prefix (user / assistant / tool / user), branch responses from
    // disjoint document ranges; the oracle replays the full template
    // offset arithmetic and pins that the mask is the LAST assistant
    // span (the branch), never the prefix assistant turn
    "dpo_render_conversation" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val prefix = docs.filter(col("doc_id") < 40).select(
        pmod(col("doc_id"), lit(10L)).as("conv_id"),
        floor(col("doc_id") / 10).cast("int").as("turn_no"),
        when(floor(col("doc_id") / 10) === 1, "assistant")
          .when(floor(col("doc_id") / 10) === 2, "tool")
          .otherwise("user").as("role"),
        col("text").as("content"))
      val pairsDf = docs.filter(col("doc_id") >= 100 && col("doc_id") < 110)
        .select((col("doc_id") - 100).as("conv_id"), col("text").as("chosen"))
        .join(docs.filter(col("doc_id") >= 110 && col("doc_id") < 120)
          .select((col("doc_id") - 110).as("conv_id"), col("text").as("rejected")),
          Seq("conv_id"))
      Preference.dpoRenderConversation(
        prefix, "conv_id", "turn_no", "role", "content",
        pairsDf, "chosen", "rejected")
        .orderBy(col("conv_id"))
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
    // Cohen: the same planted two-rater log, then po / marginal-product
    // pe / kappa replayed — kappa computed from the ROUNDED po and pe,
    // mirroring the library's 6-decimal convention
    "cohen_kappa" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST('0x' || substring(md5('k1:' || CAST(doc_id AS VARCHAR)), 1, 13)
        |      AS BIGINT) % 3 AS i1,
        |    CAST('0x' || substring(md5('k2:' || CAST(doc_id AS VARCHAR)), 1, 13)
        |      AS BIGINT) % 4 AS f
        |  FROM documents),
        |j AS (
        |  SELECT a.i1 AS ia, CASE WHEN b.f = 0 THEN (b.i1 + 1) % 3 ELSE b.i1 END AS ib
        |  FROM (SELECT doc_id, i1 FROM base WHERE doc_id < 240) a
        |  JOIN (SELECT doc_id, i1, f FROM base WHERE doc_id >= 20 AND doc_id < 260) b
        |    USING (doc_id)),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |            round(avg(CASE WHEN ia = ib THEN 1.0 ELSE 0.0 END), 6) AS po
        |          FROM j),
        |m AS (SELECT sum(na * nb) AS ab FROM
        |        (SELECT ia AS l, count(*) AS na FROM j GROUP BY 1) x
        |        JOIN (SELECT ib AS l, count(*) AS nb FROM j GROUP BY 1) y USING (l))
        |SELECT n_items, po, round(ab / (n_items * n_items), 6) AS pe,
        |  CASE WHEN round(ab / (n_items * n_items), 6) < 1.0
        |    THEN round((po - round(ab / (n_items * n_items), 6))
        |           / (1.0 - round(ab / (n_items * n_items), 6)), 6) END AS kappa
        |FROM stats, m""".stripMargin,
    // Fleiss (variable n): per-item agreement over >=2-rating items,
    // pooled label shares, kappa from the rounded terms
    "fleiss_kappa" ->
      """WITH r AS (
        |  SELECT d.doc_id AS item, t.r,
        |    CAST('0x' || substring(md5('f:' || CAST(d.doc_id AS VARCHAR) || ':'
        |      || CAST(t.r AS VARCHAR)), 1, 13) AS BIGINT) AS h
        |  FROM documents d CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) t
        |  WHERE d.doc_id < 150 AND NOT (d.doc_id % 10 = 0 AND t.r >= 2)),
        |lab AS (SELECT item, CASE WHEN h % 10 < 7 THEN item % 3 ELSE h % 3 END AS l
        |        FROM r),
        |cnt AS (SELECT item, l, CAST(count(*) AS BIGINT) AS nij FROM lab GROUP BY 1, 2),
        |it AS (SELECT item, CAST(sum(nij) AS BIGINT) AS ni,
        |         CAST(sum(nij * (nij - 1)) AS BIGINT) AS agr
        |       FROM cnt GROUP BY 1 HAVING sum(nij) >= 2),
        |base AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |           CAST(sum(ni) AS BIGINT) AS n_ratings,
        |           round(avg(CAST(agr AS DOUBLE) / (ni * (ni - 1))), 6) AS p_bar
        |         FROM it),
        |pooled AS (SELECT sum(tj * tj) AS sq FROM
        |  (SELECT l, CAST(sum(nij) AS BIGINT) AS tj
        |   FROM cnt JOIN it USING (item) GROUP BY l))
        |SELECT n_items, n_ratings, p_bar,
        |  round(sq / (n_ratings * n_ratings), 6) AS p_e,
        |  CASE WHEN round(sq / (n_ratings * n_ratings), 6) < 1.0 AND n_items > 0
        |    THEN round((p_bar - round(sq / (n_ratings * n_ratings), 6))
        |           / (1.0 - round(sq / (n_ratings * n_ratings), 6)), 6) END AS kappa
        |FROM base, pooled""".stripMargin,
    // reward-model report: the all-policy pairs, independent md5 RM
    // scores, confidence buckets + rollup replayed
    "reward_pairwise" ->
      s"""WITH $responsesSql,
         |p AS (SELECT a.response_id AS cid, b.response_id AS rid
         |      FROM resp a JOIN resp b ON a.prompt_id = b.prompt_id
         |      WHERE a.score - b.score > 0),
         |m AS (SELECT
         |    (CAST('0x' || substring(md5('rm:' || CAST(cid AS VARCHAR)), 1, 13)
         |       AS BIGINT) % 400) / 20.0
         |  - (CAST('0x' || substring(md5('rm:' || CAST(rid AS VARCHAR)), 1, 13)
         |       AS BIGINT) % 400) / 20.0 AS mg
         |  FROM p),
         |b AS (SELECT CASE WHEN abs(mg) <= 0.5 THEN '<=0.5'
         |        WHEN abs(mg) <= 1.0 THEN '0.5-1.0'
         |        WHEN abs(mg) <= 2.0 THEN '1.0-2.0'
         |        WHEN abs(mg) <= 5.0 THEN '2.0-5.0'
         |        ELSE '>5.0' END AS margin_bucket, mg FROM m)
         |SELECT coalesce(margin_bucket, 'all') AS margin_bucket,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(avg(CASE WHEN mg > 0 THEN 1.0 WHEN mg < 0 THEN 0.0
         |    ELSE 0.5 END), 6) AS accuracy,
         |  round(avg(mg), 6) AS mean_margin
         |FROM b GROUP BY ROLLUP(margin_bucket)
         |ORDER BY margin_bucket""".stripMargin,
    // KTO: labeled rows survive, class-balanced weights from the two-row
    // count aggregate
    "kto_rows" ->
      s"""WITH $responsesSql,
         |f AS (SELECT prompt_id, response_id,
         |        CASE WHEN response_id % 13 = 0 THEN NULL
         |             ELSE score >= 50 END AS feedback
         |      FROM resp),
         |l AS (SELECT * FROM f WHERE feedback IS NOT NULL),
         |c AS (SELECT CAST(count(*) AS BIGINT) AS nt,
         |        CAST(sum(CASE WHEN feedback THEN 1 ELSE 0 END) AS BIGINT) AS nd,
         |        CAST(sum(CASE WHEN NOT feedback THEN 1 ELSE 0 END) AS BIGINT) AS nu
         |      FROM l)
         |SELECT prompt_id, response_id, feedback,
         |  round(nt / (2.0 * CASE WHEN feedback THEN nd ELSE nu END), 6) AS weight
         |FROM l CROSS JOIN c ORDER BY response_id""".stripMargin,
    // majority vote: modal answer per prompt, ties to the smallest answer
    "majority_vote" ->
      """WITH s AS (
        |  SELECT doc_id % 20 AS prompt_id,
        |    'a' || CAST(CASE
        |      WHEN CAST('0x' || substring(md5('ans:' || CAST(doc_id AS VARCHAR)), 1, 13)
        |        AS BIGINT) % 10 < 6 THEN (doc_id % 20) % 3
        |      ELSE CAST('0x' || substring(md5('ans:' || CAST(doc_id AS VARCHAR)), 1, 13)
        |        AS BIGINT) % 4 END AS VARCHAR) AS answer
        |  FROM documents WHERE doc_id < 400),
        |cnt AS (SELECT prompt_id, answer, CAST(count(*) AS BIGINT) AS n_agree
        |        FROM s GROUP BY 1, 2),
        |top AS (SELECT prompt_id, answer, n_agree, row_number() OVER (
        |          PARTITION BY prompt_id ORDER BY n_agree DESC, answer) AS rn
        |        FROM cnt),
        |tot AS (SELECT prompt_id, CAST(sum(n_agree) AS BIGINT) AS n_samples
        |        FROM cnt GROUP BY 1)
        |SELECT t.prompt_id, t.answer, t.n_agree, n_samples,
        |  round(t.n_agree / n_samples, 6) AS agreement
        |FROM top t JOIN tot USING (prompt_id) WHERE rn = 1
        |ORDER BY t.prompt_id""".stripMargin,
    // Krippendorff nominal alpha: the coincidence-matrix sums replayed
    // from the same rating log as fleiss_kappa
    "krippendorff_alpha" ->
      """WITH r AS (
        |  SELECT d.doc_id AS item, t.r,
        |    CAST('0x' || substring(md5('f:' || CAST(d.doc_id AS VARCHAR) || ':'
        |      || CAST(t.r AS VARCHAR)), 1, 13) AS BIGINT) AS h
        |  FROM documents d CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) t
        |  WHERE d.doc_id < 150 AND NOT (d.doc_id % 10 = 0 AND t.r >= 2)),
        |lab AS (SELECT item, CASE WHEN h % 10 < 7 THEN item % 3 ELSE h % 3 END AS l
        |        FROM r),
        |cnt AS (SELECT item, l, CAST(count(*) AS BIGINT) AS nij FROM lab GROUP BY 1, 2),
        |it AS (SELECT item, CAST(sum(nij) AS BIGINT) AS ni
        |       FROM cnt GROUP BY 1 HAVING sum(nij) >= 2),
        |ret AS (SELECT cnt.*, it.ni FROM cnt JOIN it USING (item)),
        |base AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(sum(ni) AS BIGINT) AS n_ratings,
        |    sum(CAST(agr AS DOUBLE) / (ni - 1)) AS occ
        |  FROM (SELECT item, ni, sum(nij * (nij - 1)) AS agr
        |        FROM ret GROUP BY 1, 2)),
        |marg AS (SELECT sum(nc * (nc - 1)) AS mm FROM
        |  (SELECT l, CAST(sum(nij) AS BIGINT) AS nc FROM ret GROUP BY 1))
        |SELECT n_items, n_ratings,
        |  round(1.0 - occ / n_ratings, 6) AS d_o,
        |  round(1.0 - mm / (n_ratings * (n_ratings - 1)), 6) AS d_e,
        |  CASE WHEN round(1.0 - mm / (n_ratings * (n_ratings - 1)), 6) > 0
        |       AND n_items > 0
        |    THEN round(1.0 - round(1.0 - occ / n_ratings, 6)
        |           / round(1.0 - mm / (n_ratings * (n_ratings - 1)), 6), 6) END
        |    AS alpha
        |FROM base, marg""".stripMargin,
    // GRPO: per-group mean/sample-std rounded first, advantage from the
    // rounded terms (the cross-engine convention)
    "grpo_advantages" ->
      s"""WITH $responsesSql,
         |st AS (SELECT prompt_id, round(avg(score), 6) AS group_mean,
         |         round(coalesce(stddev_samp(score), 0), 6) AS group_std
         |       FROM resp GROUP BY 1)
         |SELECT r.prompt_id, r.response_id, r.score, group_mean, group_std,
         |  CASE WHEN group_std > 0
         |    THEN round((r.score - group_mean) / group_std, 6)
         |    ELSE 0.0 END AS advantage
         |FROM resp r JOIN st USING (prompt_id)
         |ORDER BY r.response_id""".stripMargin,
    // Kendall τ-b: the keyed self-join pair classification + the
    // tie-corrected denominator replayed
    "kendall_tau" ->
      s"""WITH $responsesSql,
         |r AS (SELECT prompt_id, response_id, score,
         |        (CAST('0x' || substring(md5('rm:' || CAST(response_id AS VARCHAR)),
         |          1, 13) AS BIGINT) % 400) / 20.0 AS rm
         |      FROM resp),
         |p AS (SELECT a.prompt_id, a.score - b.score AS dx, a.rm - b.rm AS dy
         |      FROM r a JOIN r b
         |        ON a.prompt_id = b.prompt_id AND a.response_id < b.response_id),
         |c AS (SELECT prompt_id, CAST(count(*) AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         |    CAST(sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
         |    CAST(sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         |    CAST(sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
         |  FROM p GROUP BY 1)
         |SELECT prompt_id,
         |  CAST(round((1.0 + sqrt(1.0 + 8.0 * n0)) / 2.0, 0) AS BIGINT) AS n_samples,
         |  concordant, discordant,
         |  CASE WHEN n0 > tx AND n0 > ty THEN
         |    round(CAST(concordant - discordant AS DOUBLE)
         |      / sqrt(CAST(n0 - tx AS DOUBLE) * (n0 - ty)), 6) END AS tau_b
         |FROM c ORDER BY prompt_id""".stripMargin,
    // eval summary: per-task binomial stats + the micro/macro rollups
    // recomputed from the rounded per-task terms
    "eval_summary" ->
      """WITH s AS (
        |  SELECT 't' || CAST(doc_id % 6 AS VARCHAR) AS task,
        |    (CAST('0x' || substring(md5('ev:' || CAST(doc_id AS VARCHAR)), 1, 13)
        |      AS BIGINT) % 10) < (doc_id % 6) + 3 AS correct
        |  FROM documents WHERE doc_id < 300),
        |t AS (SELECT task, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |      FROM s GROUP BY 1),
        |t2 AS (SELECT task, n, n_correct,
        |         round(CAST(n_correct AS DOUBLE) / n, 6) AS accuracy FROM t),
        |t3 AS (SELECT *, round(sqrt(accuracy * (1 - accuracy) / n), 6) AS stderr
        |       FROM t2),
        |mi AS (SELECT '__micro__' AS task, CAST(sum(n) AS BIGINT) AS n,
        |         CAST(sum(n_correct) AS BIGINT) AS n_correct FROM t3),
        |mi2 AS (SELECT task, n, n_correct,
        |          round(CAST(n_correct AS DOUBLE) / n, 6) AS accuracy FROM mi),
        |mi3 AS (SELECT *, round(sqrt(accuracy * (1 - accuracy) / n), 6) AS stderr
        |        FROM mi2),
        |ma AS (SELECT '__macro__' AS task, CAST(sum(n) AS BIGINT) AS n,
        |         CAST(sum(n_correct) AS BIGINT) AS n_correct,
        |         round(avg(accuracy), 6) AS accuracy,
        |         round(sqrt(sum(stderr * stderr)) / count(*), 6) AS stderr
        |       FROM t3)
        |SELECT * FROM t3 UNION ALL SELECT * FROM mi3 UNION ALL SELECT * FROM ma
        |ORDER BY task""".stripMargin,
    // alignment data card: each section replays its standalone oracle's
    // arithmetic — all-policy pairs + quantile_cont percentiles, the
    // length-bias rollup, the fleiss/krippendorff sums over the shared
    // rating log, the eval rollups — flattened to (section, key, n, value)
    "align_data_card" ->
      s"""WITH $responsesSql,
         |pairs AS (
         |  SELECT a.prompt_id, a.response AS chosen, b.response AS rejected,
         |    a.score - b.score AS margin
         |  FROM resp a JOIN resp b ON a.prompt_id = b.prompt_id
         |  WHERE a.score - b.score > 0),
         |ps AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(count(DISTINCT prompt_id) AS BIGINT) AS np,
         |         round(avg(margin), 6) AS mm,
         |         round(quantile_cont(margin, 0.5), 6) AS p50,
         |         round(quantile_cont(margin, 0.9), 6) AS p90
         |       FROM pairs),
         |prows AS (
         |  SELECT 'pairs' AS section, 'n_pairs' AS k2, n, CAST(n AS DOUBLE) AS value FROM ps
         |  UNION ALL SELECT 'pairs', 'n_prompts', np, CAST(np AS DOUBLE) FROM ps
         |  UNION ALL SELECT 'pairs', 'margin_mean', n, mm FROM ps
         |  UNION ALL SELECT 'pairs', 'margin_p50', n, p50 FROM ps
         |  UNION ALL SELECT 'pairs', 'margin_p90', n, p90 FROM ps),
         |lb0 AS (SELECT CASE WHEN abs(length(chosen) - length(rejected)) = 0 THEN '0'
         |          WHEN abs(length(chosen) - length(rejected)) <= 10 THEN '1-10'
         |          WHEN abs(length(chosen) - length(rejected)) <= 50 THEN '11-50'
         |          WHEN abs(length(chosen) - length(rejected)) <= 200 THEN '51-200'
         |          ELSE '>200' END AS bkt,
         |          CAST(length(chosen) AS BIGINT) AS lc,
         |          CAST(length(rejected) AS BIGINT) AS lr
         |        FROM pairs),
         |lbrows AS (SELECT 'length_bias' AS section,
         |    coalesce(bkt, 'all') AS k2, CAST(count(*) AS BIGINT) AS n,
         |    round(avg(CASE WHEN lc > lr THEN 1.0 WHEN lc < lr THEN 0.0
         |      ELSE 0.5 END), 6) AS value
         |  FROM lb0 GROUP BY ROLLUP(bkt)),
         |rr AS (
         |  SELECT d.doc_id AS item,
         |    CAST('0x' || substring(md5('f:' || CAST(d.doc_id AS VARCHAR) || ':'
         |      || CAST(t.r AS VARCHAR)), 1, 13) AS BIGINT) AS h
         |  FROM documents d CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) t
         |  WHERE d.doc_id < 150 AND NOT (d.doc_id % 10 = 0 AND t.r >= 2)),
         |lab AS (SELECT item, CASE WHEN h % 10 < 7 THEN item % 3 ELSE h % 3 END AS l
         |        FROM rr),
         |cnt AS (SELECT item, l, CAST(count(*) AS BIGINT) AS nij FROM lab GROUP BY 1, 2),
         |it AS (SELECT item, CAST(sum(nij) AS BIGINT) AS ni,
         |         CAST(sum(nij * (nij - 1)) AS BIGINT) AS agr
         |       FROM cnt GROUP BY 1 HAVING sum(nij) >= 2),
         |fb AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
         |         CAST(sum(ni) AS BIGINT) AS n_ratings,
         |         round(avg(CAST(agr AS DOUBLE) / (ni * (ni - 1))), 6) AS p_bar
         |       FROM it),
         |fp AS (SELECT sum(tj * tj) AS sq FROM
         |  (SELECT l, CAST(sum(nij) AS BIGINT) AS tj
         |   FROM cnt JOIN it USING (item) GROUP BY 1)),
         |frow AS (SELECT 'agreement' AS section, 'fleiss_kappa' AS k2, n_items AS n,
         |    CASE WHEN round(sq / (n_ratings * n_ratings), 6) < 1.0 AND n_items > 0
         |      THEN round((p_bar - round(sq / (n_ratings * n_ratings), 6))
         |             / (1.0 - round(sq / (n_ratings * n_ratings), 6)), 6) END AS value
         |  FROM fb, fp),
         |kb AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
         |         CAST(sum(ni) AS BIGINT) AS n_ratings,
         |         sum(CAST(agr AS DOUBLE) / (ni - 1)) AS occ
         |       FROM it),
         |km AS (SELECT sum(nc * (nc - 1)) AS mm FROM
         |  (SELECT l, CAST(sum(nij) AS BIGINT) AS nc
         |   FROM cnt JOIN it USING (item) GROUP BY 1)),
         |krow AS (SELECT 'agreement' AS section, 'krippendorff_alpha' AS k2,
         |    n_items AS n,
         |    CASE WHEN round(1.0 - mm / (n_ratings * (n_ratings - 1)), 6) > 0
         |         AND n_items > 0
         |      THEN round(1.0 - round(1.0 - occ / n_ratings, 6)
         |             / round(1.0 - mm / (n_ratings * (n_ratings - 1)), 6), 6)
         |      END AS value
         |  FROM kb, km),
         |ev AS (
         |  SELECT 't' || CAST(doc_id % 6 AS VARCHAR) AS task,
         |    (CAST('0x' || substring(md5('ev:' || CAST(doc_id AS VARCHAR)), 1, 13)
         |      AS BIGINT) % 10) < (doc_id % 6) + 3 AS correct
         |  FROM documents WHERE doc_id < 300),
         |et AS (SELECT task, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS nc
         |       FROM ev GROUP BY 1),
         |et2 AS (SELECT task, n, nc, round(CAST(nc AS DOUBLE) / n, 6) AS acc FROM et),
         |erows AS (
         |  SELECT 'eval' AS section, task AS k2, n, acc AS value FROM et2
         |  UNION ALL
         |  SELECT 'eval', '__micro__', CAST(sum(n) AS BIGINT),
         |    round(CAST(sum(nc) AS DOUBLE) / sum(n), 6) FROM et2
         |  UNION ALL
         |  SELECT 'eval', '__macro__', CAST(sum(n) AS BIGINT),
         |    round(avg(acc), 6) FROM et2)
         |SELECT section, k2 AS key, n, value FROM (
         |  SELECT * FROM prows UNION ALL SELECT * FROM lbrows
         |  UNION ALL SELECT * FROM frow UNION ALL SELECT * FROM krow
         |  UNION ALL SELECT * FROM erows)
         |ORDER BY section, key""".stripMargin,
    // best-of-k curve: the order-statistic weights in the same
    // overflow-free product form, empty product coalesced at k=1
    "best_of_n_curve" ->
      s"""WITH $responsesSql,
         |rk AS (SELECT prompt_id, score,
         |         CAST(row_number() OVER (PARTITION BY prompt_id
         |           ORDER BY score) AS BIGINT) AS i,
         |         CAST(count(*) OVER (PARTITION BY prompt_id) AS BIGINT) AS n
         |       FROM resp),
         |x AS (SELECT prompt_id, score, i, n, CAST(k AS INT) AS k
         |      FROM rk CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS k) t
         |      WHERE k <= n AND i >= k),
         |wgt AS (SELECT prompt_id, k, n, score,
         |         (CAST(k AS DOUBLE) / n) * coalesce(
         |           list_product(list_transform(range(1, k),
         |             j -> CAST(i - j AS DOUBLE) / (n - k + j))), 1.0) AS w
         |        FROM x)
         |SELECT prompt_id, k, max(n) AS n_samples,
         |  round(sum(w * score), 6) AS expected_max
         |FROM wgt GROUP BY 1, 2 ORDER BY prompt_id, k""".stripMargin,
    // pass@k: the stable product form 1 - Π (n-c-i)/(n-i), left-to-right
    // over the same index list in both engines (identical IEEE fold)
    "pass_at_k" ->
      """WITH s AS (
        |  SELECT doc_id % 20 AS prompt_id,
        |    (CAST('0x' || substring(md5('pass:' || CAST(doc_id AS VARCHAR)), 1, 13)
        |      AS BIGINT) % 10) < (doc_id % 20) % 4 AS correct
        |  FROM documents WHERE doc_id < 400),
        |cnt AS (SELECT prompt_id, CAST(count(*) AS BIGINT) AS n_samples,
        |          CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |        FROM s GROUP BY 1),
        |x AS (SELECT prompt_id, CAST(k AS INT) AS k, n_samples, n_correct
        |      FROM cnt CROSS JOIN (SELECT unnest([1, 5, 10]) AS k) t
        |      WHERE k <= n_samples)
        |SELECT prompt_id, k, n_samples, n_correct,
        |  round(CASE WHEN n_correct = 0 THEN 0.0
        |    WHEN n_samples - n_correct < k THEN 1.0
        |    ELSE 1.0 - list_product(list_transform(range(k),
        |      i -> CAST(n_samples - n_correct - i AS DOUBLE) / (n_samples - i)))
        |    END, 6) AS pass_at_k
        |FROM x ORDER BY prompt_id, k""".stripMargin,
    // conversation stats: counts, arg_min/arg_max shape flags, lag-based
    // alternation over non-system turns, char mass split
    "conversation_stats" ->
      """WITH t0 AS (
        |  SELECT doc_id % 20 AS conv_id, CAST(doc_id // 20 AS INT) AS turn_no,
        |    CASE WHEN doc_id // 20 = 4 AND (doc_id % 20) % 5 = 3 THEN 'user'
        |         WHEN (doc_id // 20) % 2 = 0 THEN 'user'
        |         ELSE 'assistant' END AS role,
        |    text AS content
        |  FROM documents WHERE doc_id < 200
        |    AND NOT (doc_id // 20 = 9 AND (doc_id % 20) % 7 = 0)
        |  UNION ALL
        |  SELECT doc_id AS conv_id, -1 AS turn_no, 'system' AS role,
        |    'You are a concise assistant.' AS content
        |  FROM documents WHERE doc_id < 20
        |  UNION ALL
        |  SELECT doc_id % 20 AS conv_id, CAST(10 + doc_id // 20 AS INT) AS turn_no,
        |    'tool' AS role,
        |    '{"result": ' || CAST(doc_id AS VARCHAR) || '}' AS content
        |  FROM documents WHERE doc_id < 40 AND doc_id % 4 = 1),
        |base AS (SELECT conv_id, turn_no AS t, role AS r,
        |           CAST(length(content) AS BIGINT) AS len FROM t0),
        |agg AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
        |    CAST(sum(CASE WHEN r = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
        |    CAST(sum(CASE WHEN r = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
        |    CAST(sum(CASE WHEN r = 'system' THEN 1 ELSE 0 END) AS BIGINT) AS n_system,
        |    CAST(sum(CASE WHEN r = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool,
        |    arg_max(r, t) FILTER (WHERE r <> 'system') = 'tool' AS dangling_tool,
        |    CAST(sum(len) AS BIGINT) AS total_chars,
        |    CAST(sum(CASE WHEN r = 'assistant' THEN len ELSE 0 END) AS BIGINT) AS achars
        |  FROM base GROUP BY 1),
        |ns AS (SELECT conv_id, t, r,
        |         lag(r) OVER (PARTITION BY conv_id ORDER BY t) AS prev
        |       FROM base WHERE r <> 'system' AND r <> 'tool'),
        |shape AS (SELECT conv_id,
        |    arg_min(r, t) = 'user' AS starts_with_user,
        |    arg_max(r, t) = 'assistant' AS ends_with_assistant,
        |    sum(CASE WHEN r = prev THEN 1 ELSE 0 END) = 0 AS strict_alternation
        |  FROM ns GROUP BY 1)
        |SELECT a.conv_id, n_turns, n_user, n_assistant, n_system, n_tool,
        |  starts_with_user, ends_with_assistant, strict_alternation,
        |  dangling_tool, total_chars,
        |  CASE WHEN total_chars > 0 THEN round(achars / total_chars, 6) END
        |    AS assistant_char_frac
        |FROM agg a LEFT JOIN shape USING (conv_id) ORDER BY a.conv_id""".stripMargin,
    // multi-turn DPO render: the chat_sft_render offset arithmetic over
    // prefix + branch turns; the branch is the LAST segment, so its mask
    // is (total − branch_len + 12 + 9 + 1, total − 1)
    "dpo_render_conversation" ->
      """WITH pre AS (
        |  SELECT doc_id % 10 AS conv_id, CAST(doc_id // 10 AS INT) AS turn_no,
        |    CASE WHEN doc_id // 10 = 1 THEN 'assistant'
        |         WHEN doc_id // 10 = 2 THEN 'tool' ELSE 'user' END AS role,
        |    regexp_replace(text, '^[ \t\n\x0b\f\r]+', '') AS content
        |  FROM documents WHERE doc_id < 40),
        |br AS (
        |  SELECT doc_id - 100 AS conv_id, 4 AS turn_no, 'assistant' AS role,
        |    'chosen' AS branch,
        |    regexp_replace(text, '^[ \t\n\x0b\f\r]+', '') AS content
        |  FROM documents WHERE doc_id >= 100 AND doc_id < 110
        |  UNION ALL
        |  SELECT doc_id - 110, 4, 'assistant', 'rejected',
        |    regexp_replace(text, '^[ \t\n\x0b\f\r]+', '')
        |  FROM documents WHERE doc_id >= 110 AND doc_id < 120),
        |allt AS (
        |  SELECT conv_id, branch, turn_no, role, content FROM br
        |  UNION ALL
        |  SELECT p.conv_id, b.branch, p.turn_no, p.role, p.content
        |  FROM pre p CROSS JOIN (SELECT unnest(['chosen', 'rejected']) AS branch) b),
        |seg AS (SELECT *,
        |    CAST(12 + length(role) + 1 + length(content) + 10 + 1 AS BIGINT) AS len,
        |    '<|im_start|>' || role || chr(10) || content || '<|im_end|>' || chr(10) AS s
        |  FROM allt),
        |conv AS (SELECT conv_id, branch,
        |    string_agg(s, '' ORDER BY turn_no) AS text,
        |    CAST(sum(len) AS BIGINT) AS total,
        |    CAST(max(CASE WHEN turn_no = 4 THEN len END) AS BIGINT) AS blen
        |  FROM seg GROUP BY 1, 2)
        |SELECT ch.conv_id,
        |  ch.text AS chosen_text,
        |  ch.total - ch.blen + 22 AS chosen_mask_start,
        |  ch.total - 1 AS chosen_mask_end,
        |  rj.text AS rejected_text,
        |  rj.total - rj.blen + 22 AS rejected_mask_start,
        |  rj.total - 1 AS rejected_mask_end
        |FROM conv ch JOIN conv rj
        |  ON ch.conv_id = rj.conv_id AND ch.branch = 'chosen' AND rj.branch = 'rejected'
        |ORDER BY ch.conv_id""".stripMargin,
    // RETRO neighbors at nprobe = nlist: brute cosine over different-doc
    // pairs, rank by (cosine DESC, id)
    "cross_doc_neighbors_exact" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |             vec_id % 25 AS doc FROM embeddings WHERE vec_id < 1000),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id,
        |        round(list_dot_product(c.v, q.v)
        |          / (sqrt(list_dot_product(c.v, c.v))
        |             * sqrt(list_dot_product(q.v, q.v))), 6) AS cosine
        |      FROM e q JOIN e c ON c.doc <> q.doc),
        |r AS (SELECT *, CAST(row_number() OVER (
        |        PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
        |      FROM s)
        |SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
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
    // head-to-head: per-ordered-pair counts folded to unordered pairs,
    // Wilson interval arithmetic replayed (z*z as the same 1.96 product)
    "head_to_head" ->
      s"""WITH $outcomesSql,
         |d AS (SELECT CAST(winner AS VARCHAR) AS w, CAST(loser AS VARCHAR) AS l,
         |        CAST(count(*) AS BIGINT) AS c
         |      FROM o GROUP BY 1, 2),
         |f AS (SELECT least(w, l) AS item_a, greatest(w, l) AS item_b,
         |        CAST(sum(CASE WHEN w <= l THEN c ELSE 0 END) AS BIGINT) AS wins_a,
         |        CAST(sum(c) AS BIGINT) AS n_games
         |      FROM d GROUP BY 1, 2),
         |g AS (SELECT *, CAST(wins_a AS DOUBLE) / n_games AS p,
         |        CAST(n_games AS DOUBLE) AS nn FROM f)
         |SELECT item_a, item_b, wins_a, n_games,
         |  round(p, 6) AS win_rate_a,
         |  round((p + 1.96 * 1.96 / (2 * nn)
         |    - 1.96 * sqrt((p * (1 - p) + 1.96 * 1.96 / (4 * nn)) / nn))
         |    / (1 + 1.96 * 1.96 / nn), 6) AS wilson_low,
         |  round((p + 1.96 * 1.96 / (2 * nn)
         |    + 1.96 * sqrt((p * (1 - p) + 1.96 * 1.96 / (4 * nn)) / nn))
         |    / (1 + 1.96 * 1.96 / nn), 6) AS wilson_high
         |FROM g ORDER BY item_a, item_b""".stripMargin,
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
