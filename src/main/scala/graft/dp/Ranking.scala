package graft.dp

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ranking WITHOUT a global window.
  *
  * `row_number() OVER (ORDER BY ...)` moves every row to one task — the
  * audit-flagged shape that melts at scale. The scalable plan is the
  * classic two-pass prefix sum: range-partition by the sort key (so
  * partition i's rows all sort before partition i+1's), sort within each
  * partition, count per partition, then add each partition's offset to
  * its local positions. `RDD.zipWithIndex` implements exactly that
  * (one count job + one map), so ranks are assigned with every partition
  * working in parallel and nothing ever funneling to a single task.
  *
  * The sort order must be TOTAL (break ties down to a unique column) —
  * with a total order the assigned ranks are independent of partition
  * boundaries, so results are deterministic and engine-reproducible.
  */
object Ranking {

  /** `df` + a 1-based `rank` column following `sortExprs` lexicographically
    * (make the order total — tie-break on a unique id). */
  def globalRowNumber(df: DataFrame, sortExprs: Column*): DataFrame = {
    require(sortExprs.nonEmpty, "globalRowNumber needs at least one sort expression")
    val sorted = df.repartitionByRange(sortExprs: _*).sortWithinPartitions(sortExprs: _*)
    val spark = df.sparkSession
    val withIdx = sorted.rdd.zipWithIndex().map { case (r: Row, i: Long) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(
      withIdx,
      StructType(sorted.schema.fields :+ StructField("rank", LongType, nullable = false)))
  }

  /** Token-balanced shard assignment for training-data writes: documents
    * ranked by token count DESCENDING (ties by id) and dealt SERPENTINE
    * (0..n-1 then n-1..0, like fantasy-draft order) across `nShards` —
    * plain round-robin systematically favors early shards on a descending
    * sequence; the serpentine deal cancels that bias block by block.
    * Unlike `id % nShards` (count-balanced, token-skewed when lengths are
    * skewed) every shard gets the same mix of long and short documents.
    *
    * Only (id, n_tokens) metadata is ranked — the text itself never
    * sorts. Output: (idCol, n_tokens, shard). */
  def tokenBalancedShards(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val meta = df.select(
      col(idCol),
      graft.text.TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val pos = (col("rank") - 1) % nShards
    val block = expr(s"(rank - 1) div $nShards")
    globalRowNumber(meta, col("n_tokens").desc, col(idCol))
      .select(
        col(idCol),
        col("n_tokens"),
        when(block % 2 === 0, pos).otherwise(lit(nShards - 1) - pos).as("shard"))
  }
}
