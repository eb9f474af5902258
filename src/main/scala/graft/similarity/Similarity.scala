package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — the query set is broadcast, the
  * corpus is scanned once, and per-query top-k is a partitioned window on
  * the (queries × corpus) frame, which is |Q|·N rows but never N².
  *
  * Scale path: random-hyperplane (sign-bit) LSH — each vector gets a
  * b-bit signature per table; candidates are corpus rows sharing a bucket
  * with the query in ANY table. The planes are deterministic Rademacher
  * vectors derived from xxhash64(table, bit, dim), so signatures are pure
  * expressions — no driver-side randomness, no model state to ship.
  *
  * Ranking is by cosine ROUNDED to 6 decimals (ties broken by id) so
  * results are reproducible across engines and summation orders.
  */
object Similarity {

  /** Double-precision dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force cosine top-k: for each query vector (small set, broadcast),
    * the k nearest corpus vectors. */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = corpus
      .select(col(idCol), col(vecCol).as("__cv"))
      .crossJoin(q)
      .filter(col(idCol) =!= col("query_id"))
      .select(
        col("query_id"),
        col(idCol),
        round(cosine(col("__cv"), col("__qv")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("cosine"), col("rank"))
  }

  /** Deterministic ±1 hyperplane component for (table, bit, dim). */
  private def rademacher(table: Int, bit: Int, dim: Column): Column =
    when(xxhash64(lit(table), lit(bit), dim).bitwiseAND(1) === 1, 1.0).otherwise(-1.0)

  /** b-bit sign signature of a vector under table t's Rademacher planes. */
  def lshSignature(vec: Column, table: Int, bits: Int): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    val bitVals = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(vec, dims, (x, i) => x.cast("double") * rademacher(table, b, i)),
        lit(0.0),
        (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitVals.reduce(_ + _)
  }

  /** LSH-bucketed approximate cosine top-k: candidates are corpus vectors
    * sharing a (table, signature) bucket with the query in any of
    * `tables` tables; exact cosine ranks the candidates. Recall grows with
    * `tables`, bucket size shrinks with `bits`. */
  def lshCosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      queryIdCol: String,
      k: Int,
      tables: Int = 8,
      bits: Int = 8): DataFrame = {
    def signatures(df: DataFrame, id: String, out: String) =
      df.select(
          col(id),
          col(vecCol).as(out),
          explode(array((0 until tables).map { t =>
            struct(lit(t).as("table"), lshSignature(col(vecCol), t, bits).as("sig"))
          }: _*)).as("ts"))
        .select(col(id), col(out), col("ts.table"), col("ts.sig"))
    val cSig = signatures(corpus, idCol, "__cv")
    val qSig = broadcast(
      signatures(queries.withColumnRenamed(queryIdCol, "query_id"), "query_id", "__qv"))
    val cands = cSig
      .join(qSig, Seq("table", "sig"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol), col("__cv"), col("__qv"))
      .distinct()
    val scored = cands.select(
      col("query_id"),
      col(idCol),
      round(cosine(col("__cv"), col("__qv")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("cosine"), col("rank"))
  }

  /** Embedding near-dup pairs: cosine above threshold among LSH candidates
    * (same bucketing as lshCosineTopK, corpus against itself). */
  def embeddingNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 8,
      bits: Int = 8): DataFrame = {
    val sigs = corpus.select(
      col(idCol),
      col(vecCol).as("__v"),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("table"), lshSignature(col(vecCol), t, bits).as("sig"))
      }: _*)).as("ts"))
      .select(col(idCol), col("__v"), col("ts.table"), col("ts.sig"))
    val l = sigs.select(col("table"), col("sig"), col(idCol).as("id_a"), col("__v").as("va"))
    val r = sigs.select(col("table"), col("sig"), col(idCol).as("id_b"), col("__v").as("vb"))
    l.join(r, Seq("table", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("va"), col("vb"))
      .distinct()
      .select(col("id_a"), col("id_b"), round(cosine(col("va"), col("vb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
