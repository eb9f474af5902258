package graft.queries

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Support._

/** LLM-training-data pipeline queries: text analysis, dedup (exact /
  * MinHash-LSH / SimHash / n-gram Jaccard), embedding similarity search,
  * multimodal plumbing.
  *
  * xxhash64-based operators (MinHash, SimHash, fingerprints, LSH) have no
  * DuckDB equivalent — they are registered without oracle SQL but with
  * deterministic PLANTED near-duplicates (doc_id + 100000, first token
  * mutated) so their outputs are non-empty and reproducible; ScalaTest
  * asserts the planted pairs are found. */
object LlmQueries {

  /** documents ∪ mutated copies: near-dup planting for dedup operators. */
  private def planted(s: SparkSession, dir: String, n: Int = 50): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") < n)
    docs.unionByName(
      docs.select(
        (col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "graftmutated").as("text"),
        col("lang"), col("source"), col("n_chars")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> { (s, dir) =>
      TextAnalysis
        .textStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    "lang_id" -> { (s, dir) =>
      TextAnalysis
        .languageScores(t(s, dir, "documents").select(col("doc_id"), col("text")), "text")
        .drop("text")
        .orderBy(col("doc_id"))
    },
    "top_tokens" -> { (s, dir) =>
      TextAnalysis
        .topTokens(t(s, dir, "documents"), "text", k = 25, minLength = 2)
        .orderBy(desc("freq"), col("token"))
    },
    // --- bounded-memory heavy hitters (hash sample candidates + seeded
    // count-min sketch estimates): estimates are approximate -> no SQL
    // oracle; determinism + CMS bounds are pinned in DedupSimilaritySpec
    "heavy_hitters" -> { (s, dir) =>
      TextAnalysis.heavyHittersApprox(t(s, dir, "documents"), "text", k = 20)
    },
    "pii_redaction" -> { (s, dir) =>
      // plant deterministic PII (email + URL + phone per doc) so redaction
      // has guaranteed work; original text may add more matches — both
      // engines run the same regexes either way
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("text", concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or https://ex.ample/"), col("doc_id").cast("string"),
          lit(" tel +1 (555) 010-"), lpad(col("doc_id").cast("string"), 4, "0")))
      val (u, e, p) = TextAnalysis.piiCounts(col("text"))
      docs.select(
        col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("redacted"),
        u.as("n_urls"), e.as("n_emails"), p.as("n_phones"))
        .orderBy(col("doc_id"))
    },
    "unigram_logprob" -> { (s, dir) =>
      TextAnalysis
        .unigramLogProb(
          t(s, dir, "documents").select(col("doc_id"), col("text")), "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    "repetition_stats" -> { (s, dir) =>
      TextAnalysis
        .repetitionStats(
          t(s, dir, "documents").select(col("doc_id"), col("text")), "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    "tfidf_top_terms" -> { (s, dir) =>
      TextAnalysis
        .tfidfTopTerms(
          t(s, dir, "documents").select(col("doc_id"), col("text")),
          "doc_id", "text", k = 5, minLength = 2)
        .orderBy(col("doc_id"), col("rn"))
    },
    "chunk_documents" -> { (s, dir) =>
      TextAnalysis
        .chunkDocuments(
          t(s, dir, "documents").filter(col("doc_id") < 20).select(col("doc_id"), col("text")),
          "doc_id", "text", chunkTokens = 40, overlap = 10)
        .orderBy(col("doc_id"), col("chunk_id"))
    },
    "dedup_exact" -> { (s, dir) =>
      // plant exact duplicates (same text, higher id) — survivors must be
      // exactly the original doc_ids
      val docs = t(s, dir, "documents")
      val dup = docs.select((col("doc_id") + 100000).as("doc_id"), col("text"))
      Dedup
        .exactDedupKeys(docs.select(col("doc_id"), col("text")).unionByName(dup), "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    // --- character-level fuzzy dedup (SymSpell deletion neighborhoods +
    // exact levenshtein verify): entity-name typo pairs the token-level
    // dedups can't see. Customer names differ in single digits — dense
    // distance-1 pairs; the 500-key cap keeps the DuckDB O(n²) oracle small
    "fuzzy_dedup_pairs" -> { (s, dir) =>
      graft.dedup.Fuzzy
        .fuzzyPairsD1(
          t(s, dir, "customer").filter(col("c_custkey") <= 500),
          "c_custkey", "c_name")
        .orderBy(col("id_a"), col("id_b"))
    },
    "dedup_incremental" -> { (s, dir) =>
      // steady-state curation: a new batch (docs >= 250, plus 10 planted
      // copies of corpus texts) deduped against the existing corpus
      // (docs < 250) — the planted copies must all be dropped
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") < 250).select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 200000).as("doc_id"), col("text"))
      val batch = docs.filter(col("doc_id") >= 250)
        .select(col("doc_id"), col("text"))
        .unionByName(planted)
      Dedup.incrementalExactDedupKeys(batch, corpus, "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    "cluster_survivors_exact" -> { (s, dir) =>
      // clustering with a TRUE oracle: pairs come from exact n-gram
      // Jaccard (SQL-expressible), the connected-components resolution is
      // checked against a DuckDB recursive CTE. The minhash variant of
      // this flow stays no_oracle (banded LSH isn't SQL-reproducible).
      val docs = t(s, dir, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"), col("text"))
      val corpus = docs.unionByName(
        docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
      val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", k = 3, minJaccard = 0.6)
      val clusters = Dedup.nearDupClusters(pairs)
      val losers = clusters.filter(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
      corpus.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id")).orderBy(col("doc_id"))
    },
    "contamination_report" -> { (s, dir) =>
      // eval = docs 0-4; corpus = the rest plus planted exact copies of
      // docs 0-2 (full eval_coverage 1.0 rows must appear)
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") >= 5)
        .unionByName(docs.filter(col("doc_id") < 3)
          .select((col("doc_id") + 300000).as("doc_id"), col("text")))
      val evalSet = docs.filter(col("doc_id") < 5)
      Dedup.contaminationReport(corpus, evalSet, "doc_id", "text", k = 3, minOverlap = 2)
        .orderBy(col("corpus_id"), col("eval_id"))
    },
    "ngram_jaccard" -> { (s, dir) =>
      Dedup
        .ngramJaccardPairs(
          t(s, dir, "documents").filter(col("doc_id") < 40), "doc_id", "text",
          k = 3, minJaccard = 0.02)
        .orderBy(col("id_a"), col("id_b"))
    },
    "embedding_norms" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .select(
          col("vec_id"),
          round(Similarity.l2Norm(col("embedding")), 6).as("l2_norm"),
          col("label"))
        .orderBy(col("vec_id"))
    },
    "cosine_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity
        .cosineTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", "vec_id", 10)
        .orderBy(col("query_id"), col("rank"))
    },
    // --- no DuckDB oracle (xxhash64-based); deterministic planted dups ---
    "dedup_minhash" -> { (s, dir) =>
      Dedup
        .minhashNearDupPairs(planted(s, dir), "doc_id", "text", threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },
    "dedup_cluster_survivors" -> { (s, dir) =>
      Dedup
        .nearDupDedup(planted(s, dir), "doc_id", "text", threshold = 0.5)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    "dedup_simhash" -> { (s, dir) =>
      Dedup
        .simhashNearDupPairs(planted(s, dir), "doc_id", "text", maxHamming = 10)
        .orderBy(col("id_a"), col("id_b"))
    },
    "fingerprints" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"),
          TextAnalysis.shingleFingerprint(col("text")).as("shingle_fingerprint"))
        .orderBy(col("doc_id"))
    },
    "ann_lsh_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity
        .lshCosineTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", "vec_id",
          k = 10, tables = 8, bits = 8)
        .orderBy(col("query_id"), col("rank"))
    },
    "ann_ivf_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity
        .ivfCosineTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", "vec_id",
          k = 10, nlist = 16, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))
    },
    "embedding_near_dup" -> { (s, dir) =>
      // plant exact-duplicate vectors (vec_id + 100000): every planted pair
      // has cosine 1.0 and must be found by the hyperplane-LSH buckets
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 50)
        .select(col("vec_id"), col("embedding"))
      val planted = e.unionByName(
        e.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Similarity
        .embeddingNearDupPairs(planted, "vec_id", "embedding", threshold = 0.999)
        .orderBy(col("id_a"), col("id_b"))
    },
    "multimodal_features" -> { (s, dir) =>
      val assets = Multimodal.toAssets(
        t(s, dir, "documents").select(col("doc_id"), col("text").cast("binary").as("bytes")),
        "doc_id", "bytes", "image")
      Multimodal
        .extractFeatures(assets, dim = 8)
        .select(col("asset_id"), col("media_type"), col("payload_bytes"),
          round(element_at(col("features"), 1).cast("double"), 6).as("f0"))
        .orderBy(col("asset_id"))
    })

  // ---- oracle SQL ----------------------------------------------------------

  /** Token-equality stopword count, mirroring TokenSetCounts: tokenize
    * trim(lower(text)) on whitespace, count tokens in the word set. */
  private def wordsSql(words: Seq[String]): String = {
    val cond = words.map(w => s"t = '$w'").mkString(" OR ")
    s"CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> $cond)) AS BIGINT)"
  }

  private def scoreSql(lang: String): String =
    wordsSql(TextAnalysis.langStopwords(lang))

  /** Union of every language's stopwords — the quality gate's word set. */
  private def allStopSql: String =
    wordsSql(TextAnalysis.langStopwords.values.flatten.toSeq.distinct.sorted)

  private val hanSql =
    "CAST(length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    "pii_redaction" ->
      """WITH d AS (SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |         || '@example.com or https://ex.ample/' || CAST(doc_id AS VARCHAR)
        |         || ' tel +1 (555) 010-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id, text,
        |    regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g') AS t1 FROM d),
        |s2 AS (SELECT doc_id, text, t1,
        |    regexp_replace(t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t2
        |  FROM s1)
        |SELECT doc_id,
        |  regexp_replace(t2, '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS INT) AS n_urls,
        |  CAST(len(regexp_extract_all(t1, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(t2, '\+?[0-9][0-9()\- ]{6,}[0-9]')) AS INT) AS n_phones
        |FROM s2 ORDER BY doc_id""".stripMargin,
    "unigram_logprob" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |           FROM documents),
        |tf AS (SELECT doc_id, token FROM t WHERE length(token) >= 1),
        |f AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tf GROUP BY 1),
        |tot AS (SELECT sum(n) AS total FROM f)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(avg(-ln(n / CAST(total AS DOUBLE))), 6) AS avg_neg_logprob
        |FROM tf JOIN f USING (token) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "repetition_stats" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |           FROM documents),
        |base AS (SELECT doc_id, len(w) AS n, len(list_distinct(w)) AS nd, w FROM w),
        |g AS (SELECT doc_id, count(DISTINCT s) AS g3d, count(*) AS g3 FROM (
        |        SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM base))
        |      GROUP BY doc_id)
        |SELECT b.doc_id,
        |  CAST(n AS INT) AS n_tokens,
        |  round(CASE WHEN n > 0 THEN 1.0 - CAST(nd AS DOUBLE) / n ELSE 0 END, 6) AS dup_token_ratio,
        |  round(CASE WHEN COALESCE(g3, 0) > 0 THEN 1.0 - CAST(g3d AS DOUBLE) / g3 ELSE 0 END, 6) AS dup_3gram_ratio
        |FROM base b LEFT JOIN g ON b.doc_id = g.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "tfidf_top_terms" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |tok AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |        FROM d),
        |ft AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok WHERE length(token) >= 2 GROUP BY 1, 2),
        |dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM ft GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM d),
        |sc AS (SELECT f.doc_id, f.token, f.tf, dfq.df,
        |         round(f.tf * ln((n.n + 1.0) / (dfq.df + 1.0)), 6) AS tfidf
        |       FROM ft f JOIN dfq ON f.token = dfq.token CROSS JOIN n),
        |r AS (SELECT *, CAST(row_number() OVER (
        |        PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INT) AS rn
        |      FROM sc)
        |SELECT doc_id, rn, token, tf, df, tfidf FROM r WHERE rn <= 5
        |ORDER BY doc_id, rn""".stripMargin,
    "text_stats" ->
      s"""SELECT doc_id,
         |  CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         |  len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_regex_tokens,
         |  length(text) AS n_chars,
         |  round(CASE WHEN length(text) = 0 THEN 0 ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS punct_ratio,
         |  round(CASE WHEN length(text) = 0 THEN 0 ELSE CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS digit_ratio,
         |  round(CASE WHEN length(text) = 0 THEN 0 ELSE CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS upper_ratio,
         |  round((
         |    (CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1.0 ELSE 0.0 END)
         |    + (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s一-鿿]', '', 'g')) AS DOUBLE) / length(text) < 0.2 THEN 1.0 ELSE 0.0 END)
         |    + (CASE WHEN CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) < 0.3 THEN 1.0 ELSE 0.0 END)
         |    + (CASE WHEN ($allStopSql) > 0 OR ($hanSql) > 0 THEN 1.0 ELSE 0.0 END)
         |  ) / 4.0, 6) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "lang_id" -> {
      val langs = Seq("de", "en", "es", "fr", "zh")
      def scoreCol(l: String) = if (l == "zh") hanSql else scoreSql(l)
      val greatestExpr = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
      val pick = langs.reverse
        .foldLeft("CAST(NULL AS VARCHAR)") { (acc, l) =>
          s"CASE WHEN score_$l = $greatestExpr THEN '$l' ELSE $acc END"
        }
      s"""SELECT doc_id, score_de, score_en, score_es, score_fr, score_zh,
         |  $pick AS lang_detected
         |FROM (SELECT doc_id,
         |  ${scoreCol("de")} AS score_de,
         |  ${scoreCol("en")} AS score_en,
         |  ${scoreCol("es")} AS score_es,
         |  ${scoreCol("fr")} AS score_fr,
         |  ${scoreCol("zh")} AS score_zh
         |FROM documents)
         |ORDER BY doc_id""".stripMargin
    },
    "top_tokens" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |           FROM documents)
        |SELECT token, CAST(count(*) AS BIGINT) AS freq
        |FROM t WHERE length(token) >= 2
        |GROUP BY token ORDER BY freq DESC, token LIMIT 25""".stripMargin,
    "chunk_documents" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |           FROM documents WHERE doc_id < 20 AND trim(text) <> ''),
        |s AS (SELECT doc_id, w,
        |             unnest(range(0, GREATEST(len(w) - 1, 0) + 1, 30)) AS start
        |      FROM d)
        |SELECT doc_id,
        |  CAST(start / 30 AS INT) AS chunk_id,
        |  array_to_string(w[start + 1 : start + 40], ' ') AS chunk_text,
        |  CAST(LEAST(40, len(w) - start) AS INT) AS n_chunk_tokens
        |FROM s
        |WHERE start = 0 OR len(w) - start > 10
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id FROM (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents)
        |GROUP BY sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
        |ORDER BY doc_id""".stripMargin,
    "fuzzy_dedup_pairs" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE a.c_custkey <= 500 AND b.c_custkey <= 500
        |  AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_incremental" ->
      """WITH corpus AS (SELECT text FROM documents WHERE doc_id < 250),
        |batch AS (SELECT doc_id, text FROM documents WHERE doc_id >= 250
        |          UNION ALL
        |          SELECT doc_id + 200000, text FROM documents WHERE doc_id < 10),
        |ch AS (SELECT DISTINCT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
        |       FROM corpus),
        |bh AS (SELECT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h,
        |              min(doc_id) AS doc_id
        |       FROM batch GROUP BY 1)
        |SELECT doc_id FROM bh WHERE h NOT IN (SELECT h FROM ch)
        |ORDER BY doc_id""".stripMargin,
    "cluster_survivors_exact" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
        |corpus AS (SELECT doc_id, text FROM d
        |           UNION ALL SELECT doc_id + 100000, text FROM d),
        |w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM corpus),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM w)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM inter
        |          JOIN sizes sa ON sa.doc_id = id_a
        |          JOIN sizes sb ON sb.doc_id = id_b
        |          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.6),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |cc AS (SELECT id, id AS label FROM nodes
        |       UNION
        |       SELECT e.src, cc.label FROM edges e, cc WHERE e.dst = cc.id),
        |labels AS (SELECT id, min(label) AS cluster_id FROM cc GROUP BY id),
        |losers AS (SELECT id AS doc_id FROM labels WHERE id <> cluster_id)
        |SELECT doc_id FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY doc_id""".stripMargin,
    "contamination_report" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |corpus AS (SELECT doc_id, text FROM docs WHERE doc_id >= 5
        |           UNION ALL SELECT doc_id + 300000, text FROM docs WHERE doc_id < 3),
        |ev AS (SELECT doc_id, text FROM docs WHERE doc_id < 5),
        |cg AS (SELECT DISTINCT doc_id AS corpus_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        |             FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |                   FROM corpus))),
        |eg AS (SELECT DISTINCT doc_id AS eval_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
        |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        |             FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |                   FROM ev))),
        |sizes AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS eval_grams FROM eg GROUP BY 1),
        |ov AS (SELECT corpus_id, eval_id, CAST(count(*) AS BIGINT) AS overlap_grams
        |       FROM cg JOIN eg ON cg.g = eg.g GROUP BY 1, 2)
        |SELECT corpus_id, eval_id, overlap_grams,
        |  round(CAST(overlap_grams AS DOUBLE) / eval_grams, 6) AS eval_coverage
        |FROM ov JOIN sizes USING (eval_id)
        |WHERE overlap_grams >= 2
        |ORDER BY corpus_id, eval_id""".stripMargin,
    "ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |           FROM documents WHERE doc_id < 40),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |       FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM d)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.02
        |ORDER BY id_a, id_b""".stripMargin,
    "embedding_norms" ->
      """SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm,
        |  label
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        |s AS (SELECT query_id, e.vec_id,
        |        round(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cosine
        |      FROM e, q WHERE e.vec_id <> query_id),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank FROM s)
        |SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin)
}
