package graft.dp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Bloom-filter prefiltered joins: build a compact bloom over the (already
  * filtered) build side's keys, probe it in the fact scan's filter, THEN
  * run the exact join on the survivors.
  *
  * Why not just join? A semi join against a selective dimension still
  * shuffles every fact row first; AQE's runtime bloom
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) triggers only under
  * planner heuristics. This operator makes the pruning explicit and
  * deterministic: the bloom is a driver-built bitmap (treeAggregate, one
  * pass over the build side), the probe is a codegen'd predicate AT THE
  * SCAN — fact rows that cannot join never enter the exchange. With fpp
  * 1% the shuffle carries ~1.01× the true matches instead of the full
  * table; the exact join then removes the false positives, so results are
  * identical to a plain join.
  *
  * Sizing: the bitmap is ~1.2 bytes/key at 1% fpp (10 MB per 8M keys) —
  * build-side keys must be countable in driver memory terms, the classic
  * "filtered dimension vs fact" shape. The fact side is never collected. */
object BloomJoin {

  /** Exact left-semi join of `fact` to `dim`, bloom-prefiltered.
    * `expectedItems` sizes the filter (overestimate is safe: bits scale
    * linearly; underestimate only raises fpp — never wrong results). */
  def semiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    // alias the build key: when factKey == dimKey (the common call shape)
    // a bare col(dimKey) would be ambiguous between the two join children.
    // No distinct() — semi-join results are insensitive to build-side
    // duplicates, so deduplication would only add an exchange
    val build = dim.select(col(dimKey).as("__graft_dim_key"))
    prefilter(fact, dim, factKey, dimKey, expectedItems, fpp)
      .join(build, col(factKey) === col("__graft_dim_key"), "left_semi")
  }

  /** Just the bloom-prefiltered fact (may contain ~fpp false positives —
    * compose with the exact join of your choice). */
  def prefilter(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long,
      fpp: Double): DataFrame = {
    // build over xxhash64(key) so the probe hashes once and the bitmap
    // stores fixed-width longs whatever the key type
    val bloom = dim
      .select(xxhash64(col(dimKey)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val probe = Bridge.column(graft.expressions.BloomMightContain(
      Bridge.expression(xxhash64(col(factKey))), bos.toByteArray))
    fact.filter(probe)
  }
}
