package graft.tools

import org.apache.spark.sql.functions._

/** Scratch driver for ad-hoc plan/timing probes during development —
  * rewritten per investigation; not part of any shipped surface. Current
  * probe: the r20 ranking-metrics MAP column + duplicate-label fold and
  * the maintenance-report audit trail, driven end to end on sf0.001.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.similarity.{AnnIndex, Similarity}
    import graft.eval.Metrics

    // --- rankingMetrics with MAP over a real served pipeline
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_drive_ivf").toString
    AnnIndex.buildIvf(emb, "vec_id", "embedding", dir, nlist = 8, seed = 7L)
    val queries = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val relevance = Similarity
      .cosineTopK(emb, queries, "vec_id", "embedding", "vec_id", 3)
      .select(col("query_id"), col("vec_id"), (lit(4) - col("rank")).as("rel"))
    val hits = AnnIndex.searchIvf(spark, dir, queries, "vec_id",
      "embedding", k = 10, nprobe = 4)
    val perQ = Metrics.rankingMetrics(hits, relevance,
      "query_id", "vec_id", "rank", "rel", k = 10)
    perQ.orderBy("query_id").show(10, truncate = false)
    Metrics.rankingMetricsSummary(perQ).show(truncate = false)
    // plan check: the AP cumulative window must be query-partitioned. An
    // UNpartitioned window renders its spec with the order expression
    // first ("windowspecdefinition(__rank ASC ...") — so require every
    // window spec in this plan to open with the partition column
    val plan = perQ.queryExecution.executedPlan.toString
    val specs = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    println(s"PROBE window_spec_lines=${specs.size}")
    specs.foreach(l => println("PROBE " + l.trim.take(160)))
    require(specs.nonEmpty, "expected window specs in the plan")
    require(specs.forall(_.contains("windowspecdefinition(query_id")),
      "global (unpartitioned) window in rankingMetrics plan")
  }
}
