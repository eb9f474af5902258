package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph scoring operators for corpus curation.
  *
  * The published web-scale curation pipelines weight documents by the
  * authority of their source host (the Common Crawl host-graph ranking
  * that feeds crawl frontier and quality decisions); this is that
  * signal's engine half: PageRank by power iteration over an edge
  * frame, expressed as keyed joins + aggregations so every step is a
  * shuffle on node id — no adjacency matrix, no driver-side graph.
  */
object Graphs {

  /** PageRank over a directed edge list, by `iterations` steps of the
    * damped power iteration:
    *
    *   r_{t+1}(v) = (1−d)/n + d · (Σ_{u→v} r_t(u)/outdeg(u) + D_t/n)
    *
    * where `D_t` is the dangling mass (total rank on nodes with no
    * out-edges), redistributed uniformly — the standard treatment, and
    * with it Σ r(v) = 1 at every step (asserted by the spec). Parallel
    * edges are collapsed; the node set is src ∪ dst.
    *
    * Scale shape: per iteration one join of edges against ranks on the
    * src key, one groupBy dst, one small left join back to the node
    * set — all keyed shuffles, reused across iterations by the same
    * partitioning. The dangling mass is a 1-row aggregate collected per
    * iteration (a scalar, not data). Iterations checkpoint through the
    * session's reliable checkpoint dir exactly like
    * [[graft.dedup.Dedup.nearDupClusters]], so lineage stays bounded on
    * long runs. A fixed iteration count (default 10) keeps the result a
    * pure function of the input — auditable cross-engine — rather than
    * a convergence race; pass more iterations for tighter fixpoints
    * (error decays as d^t).
    *
    * Output: (id, rank). */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val spark = edges.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    // eager reliable checkpoint via a transient cache (the cache makes
    // the checkpoint write read computed partitions, and is dropped as
    // soon as the files exist — the nearDupClusters pattern); local
    // fallback when no checkpoint dir is set. Checkpoint files are
    // reclaimed by cleanCheckpoints once frames become unreachable.
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) {
        val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = cached.checkpoint(eager = true)
        cached.unpersist(blocking = false)
        out
      } else df.localCheckpoint(eager = true)

    val e = ckpt(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    val nodes = ckpt(
      e.select(col("src").as("id")).unionByName(e.select(col("dst").as("id"))).distinct())
    val n = nodes.count().toDouble
    val deg = ckpt(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))

    var ranks = ckpt(nodes.select(col("id"), lit(1.0 / n).as("rank")))
    var i = 0
    while (i < iterations) {
      // dangling mass: rank sitting on nodes with no out-edges — a 1-row
      // frame broadcast into the update, so each iteration is ONE job
      // (the checkpoint action), not a separate driver collect + job
      val dangling = ranks
        .join(deg.select(col("src").as("id")), Seq("id"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outdeg")).as("__in"))
      ranks = ckpt(nodes
        .join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("__in"), lit(0.0)) + col("__dm") / lit(n)))
            .as("rank")))
      i += 1
    }
    ranks
  }
}
