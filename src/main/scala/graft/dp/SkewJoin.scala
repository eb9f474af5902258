package graft.dp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one side's key distribution is heavily skewed, a plain shuffle join
  * funnels every row of a hot key through a single reducer. Salting spreads
  * each hot key over `salts` sub-partitions: the skewed side gets a
  * per-row salt in [0, salts), the other side is replicated once per salt
  * value, and the join runs on (key, salt) — hot-key work parallelizes
  * `salts`-ways at the cost of replicating the non-skewed side.
  *
  * AQE's runtime skew-join split (spark.sql.adaptive.skewJoin, on in graft
  * sessions) already handles moderate skew by splitting oversized
  * partitions; explicit salting is for the pathological long tail (a
  * single key holding a double-digit share of 100 TB) and for non-AQE
  * contexts. Prefer AQE first; reach for this when a stage's max task is
  * orders of magnitude above its median.
  *
  * The salt is derived from a per-row id (partition index + offset), so
  * byte-identical rows of a hot key still spread across salts — a
  * content-hash salt would funnel duplicate rows (or a keys-only
  * projection) back through one reducer, keeping the skew while paying the
  * replication. The salt is deterministic for a fixed partitioning of the
  * input; it only affects placement, never the join result.
  */
object SkewJoin {

  /** Skew diagnosis for a join/aggregation key: the top-k heaviest keys
    * with their row count, share of all rows, and skew factor (count vs
    * the mean per-key count). This is the measurement that decides whether
    * a key needs `saltedJoin` (skew_x in the hundreds+) or AQE's runtime
    * split suffices — measure, don't guess.
    *
    * Two aggregates over the per-key counts frame: a single-row global
    * stats agg (broadcast) and a top-k sort capped at `topK` rows
    * (TakeOrderedAndProject — never a global sort of all keys). Scale:
    * the only full-data pass is the initial map-side-combinable groupBy.
    */
  def keySkewProfile(df: org.apache.spark.sql.DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum(col("n")).as("__total"),
      count(lit(1)).as("__n_keys"))
    counts
      .orderBy(col("n").desc, col(keyCol))
      .limit(topK)
      .crossJoin(broadcast(totals))
      .select(
        col(keyCol),
        col("n"),
        round(col("n") / col("__total"), 6).as("share"),
        // double multiply: long n * long n_keys overflows at exactly the
        // hot-key-on-a-big-table scale this profile exists to flag
        round(col("n").cast("double") * col("__n_keys") / col("__total"), 6).as("skew_x"))
      .orderBy(col("n").desc, col(keyCol))
  }

  private val safeJoinTypes =
    Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti")

  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // right/full outer would emit every UNMATCHED right row once per salt
    // replica — silently wrong; only inner/left variants are salt-safe
    require(
      safeJoinTypes(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left join types only, got '$joinType' — " +
        "a right/full outer join would duplicate unmatched right rows per salt")
    val saltedLeft = skewed.withColumn(
      "__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val replicatedRight = other.withColumn(
      "__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft
      .join(replicatedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
