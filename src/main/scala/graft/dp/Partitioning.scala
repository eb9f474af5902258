package graft.dp

import org.apache.spark.sql.DataFrame

/** Parallelism repair for expensive-per-row stages (r20 optimization
  * round, guide §2.5 "input skew" / §2.6 "stragglers and idle capacity").
  *
  * A scan's parallelism is bounded by its file/row-group layout: a corpus
  * that arrives as one parquet file (or a probe-pruned index scan whose
  * few small files get packed into one split by `openCostInBytes`) runs
  * every downstream codegen stage in 1-3 tasks while the rest of the
  * cluster idles. That is invisible when the stage is cheap I/O, and the
  * whole wall time when the stage is an expensive kernel — audio
  * fingerprinting, n-gram hashing, percentile sketch inserts, dot
  * products over exploding joins (job-profiled at sf0.1: single tasks of
  * 0.7-4 s with 31 cores idle).
  */
object Partitioning {

  /** Repartition `df` to the cluster's default parallelism IFF its
    * current layout is materially under-parallel (fewer than half the
    * cores' worth of partitions). On a realistically-sized input — many
    * files / row groups, or downstream of any shuffle at the session's
    * partition count — this is a NO-OP returning `df` unchanged, so the
    * production plan at scale never pays an extra exchange; on a
    * single-split source it buys back the idle cores for one shuffle of
    * the (projected — callers select the needed columns first) rows.
    *
    * Results are unchanged: round-robin repartition is deterministic
    * under retries (sort-before-repartition, SPARK-23207 default), and
    * every caller's downstream op is row-independent or
    * order-insensitive (aggregates, joins, per-row kernels).
    *
    * The partition-count probe compiles the frame's physical plan
    * (`df.rdd`) without running a job — a few ms of driver work, paid
    * only at call sites that sit in front of measured expensive kernels,
    * and only once per query. */
  /** `even = false` (default) spreads by a deterministic whole-row HASH:
    * no exchange-side sort (keyless repartition(n) first pays a local
    * sort of its input — sortBeforeRepartition, so retried tasks
    * reproduce their row→partition assignment — measured as the dominant
    * exchange cost on 10⁵-row frames), at the price of Poisson unevenness
    * that is negligible when rows ≫ cores. `even = true` uses round-robin
    * for PERFECTLY even partitions — the right trade for a frame of only
    * 100-200 rows feeding a very expensive per-row kernel (audio/image
    * decode), where one extra row per task is the tail and the sort of
    * 100 rows is free. */
  def spread(df: DataFrame, even: Boolean = false): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(2, p / 2)) df
    else if (even) df.repartition(p)
    else {
      import org.apache.spark.sql.functions.{col, xxhash64}
      df.repartition(p, xxhash64(df.columns.map(col): _*))
    }
  }
}
