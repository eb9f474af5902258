package graft.dp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Per-key top-k via the native bounded-heap aggregate
  * (graft.expressions.TopKStructs).
  *
  * Scale shape: every map partition reduces to ≤ k rows per key before
  * the exchange (partial ObjectHashAggregate), so shuffle volume is
  * bounded by the answer size. NOTE the `row_number() <= k` window idiom
  * achieves the same bound on Spark ≥ 3.5 (InferWindowGroupLimit inserts
  * a Partial WindowGroupLimit before the exchange) and is often faster —
  * use THIS form when top-k must compose with other aggregates in the
  * same groupBy pass, when you want the ranked rows as an array per key,
  * or when the rank-filter shape defeats the inference rule. See
  * TopKStructs' scaladoc and SCALE.md. */
object TopK {

  /** The top `k` rows of each `keyCols` group, ranked by `orderCols`
    * lexicographically DESCENDING (nulls last), remaining columns carried
    * along. Ties beyond `orderCols` are broken by the carried columns
    * (the full row participates in the ordering, making the result
    * deterministic). Output: keyCols, rank (1-based), orderCols, rest. */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      k: Int): DataFrame = {
    require(orderCols.nonEmpty, "topKPerKey needs at least one order column")
    val payload = df.columns.toSeq.filterNot(c => keyCols.contains(c) || orderCols.contains(c))
    val fields = orderCols ++ payload
    run(df, keyCols, fields.map(col), outFields = fields, k)
  }

  /** Expression-ordered variant: `orderExprs` are compared
    * lexicographically with LARGER = BETTER — mix directions by negating
    * a numeric field (e.g. `Seq(col("score"), -col("id"))` for
    * "score DESC, id ASC"). Output: keyCols, rank, then every non-key
    * column of `df`. Ties beyond `orderExprs` fall back to the carried
    * columns' ordering, keeping results deterministic. */
  def topKPerKeyExpr(
      df: DataFrame,
      keyCols: Seq[String],
      orderExprs: Seq[org.apache.spark.sql.Column],
      k: Int): DataFrame = {
    require(orderExprs.nonEmpty, "topKPerKeyExpr needs at least one order expression")
    val payload = df.columns.toSeq.filterNot(keyCols.contains)
    val named = orderExprs.zipWithIndex.map { case (e, i) => e.as(s"__o$i") }
    run(df, keyCols, named ++ payload.map(col), outFields = payload, k)
  }

  /** Mixed-direction variant: `orderCols` are (column, resultAscending)
    * pairs — e.g. `Seq("score" -> false, "token" -> true)` ranks
    * "score DESC, token ASC". This is the form for string tiebreaks that
    * can't be negated into [[topKPerKeyExpr]]'s larger-is-better frame.
    * Output: keyCols, rank (1-based), orderCols, remaining columns. */
  def topKPerKeyDirectional(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(orderCols.nonEmpty, "topKPerKeyDirectional needs at least one order column")
    val payload =
      df.columns.toSeq.filterNot(c => keyCols.contains(c) || orderCols.exists(_._1 == c))
    val fields = orderCols.map(_._1) ++ payload
    run(df, keyCols, fields.map(col), outFields = fields, k,
      ascending = orderCols.map(_._2))
  }

  /** The raw aggregate Column — for composing top-k with OTHER aggregates
    * in a single groupBy pass (the case the window idiom can't express
    * without a second stage + join). Returns the k largest structs of
    * `fields` (lexicographic, descending) as an array; element_at past a
    * small group's size is null, as usual. Name the fields with `.as`. */
  def topKAgg(k: Int)(fields: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    Bridge.column(
      graft.expressions.TopKStructs(Bridge.expression(struct(fields: _*)), k)
        .toAggregateExpression())

  /** `structFields`: ordering-significant fields first (struct ordering is
    * lexicographic); `outFields` are projected back out after the explode. */
  private def run(
      df: DataFrame,
      keyCols: Seq[String],
      structFields: Seq[org.apache.spark.sql.Column],
      outFields: Seq[String],
      k: Int,
      ascending: Seq[Boolean] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "topKPerKey needs at least one key column")
    val packed = struct(structFields: _*)
    val agg = Bridge.column(
      graft.expressions.TopKStructs(Bridge.expression(packed), k, ascending)
        .toAggregateExpression())
    df.groupBy(keyCols.map(col): _*)
      .agg(agg.as("__topk"))
      .select((keyCols.map(col) :+ posexplode(col("__topk")).as(Seq("__pos", "__row"))): _*)
      .select(
        (keyCols.map(col) :+ (col("__pos") + 1).cast("int").as("rank")) ++
          outFields.map(f => col("__row").getField(f).as(f)): _*)
  }
}
