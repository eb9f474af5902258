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
      damping: Double = 0.85): DataFrame =
    pageRankImpl(edges, srcCol, dstCol, iterations, damping, LocalPrMaxEdges)

  /** Distinct-edge bound for the driver-local fast path (r21, the
    * [[graft.align.Preference]] bradleyTerry / Similarity LocalQuantizer
    * precedent): when the deduplicated edge set — the frame every
    * iteration joins, NOT the raw log — provably fits under this many
    * rows, the power iterations run as plain driver arithmetic instead
    * of `iterations` rounds of join/groupBy/checkpoint jobs. The gate is
    * a data-size bound probed with a bounded collect (limit n+1),
    * independent of core count; larger graphs take the distributed loop
    * unchanged. 262 144 edges ≈ 8 MB collected worst-case, iterations ×
    * edges driver multiplies — milliseconds where the job storm costs
    * seconds. */
  private[graft] val LocalPrMaxEdges: Int = 262144

  private[graft] def pageRankImpl(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      damping: Double,
      localMaxEdges: Int): DataFrame = {
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

    // ONE distributed pass over the raw edge log — the at-scale work —
    // then a bounded probe (limit n+1, never more) decides where the
    // iterations run; the cache makes the probe's scan reusable by the
    // distributed fallback's checkpoint.
    val eDistinct = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probe =
      if (localMaxEdges > 0) eDistinct.limit(localMaxEdges + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (localMaxEdges > 0 && probe.length <= localMaxEdges) {
      val idField = eDistinct.select(col("src").as("id"))
        .unionByName(eDistinct.select(col("dst").as("id")))
        .schema("id")
      val out = localPageRank(spark, idField, probe, iterations, damping)
      eDistinct.unpersist(false)
      return out
    }
    val e = {
      val cp =
        if (reliable) eDistinct.checkpoint(eager = true)
        else eDistinct.localCheckpoint(eager = true)
      eDistinct.unpersist(blocking = false)
      cp
    }
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

  /** The damped power iterations of [[pageRank]] as plain driver
    * arithmetic over the collected distinct-edge set — the identical
    * per-iteration formula (uniform dangling redistribution, same
    * guards), so the result lands on the same 6-decimal values the
    * distributed loop (and the oracle's chained-CTE replay) produces:
    * the damped iteration is a contraction, summation-order ulp noise
    * stays far below the output rounding every caller applies. */
  private def localPageRank(
      spark: org.apache.spark.sql.SparkSession,
      idField: org.apache.spark.sql.types.StructField,
      edgeRows: Array[org.apache.spark.sql.Row],
      iterations: Int,
      damping: Double): DataFrame = {
    import scala.collection.mutable
    val deg = mutable.HashMap.empty[Any, Long]
    val nodes = mutable.LinkedHashSet.empty[Any]
    edgeRows.foreach { r =>
      val s = r.get(0); val d = r.get(1)
      deg.update(s, deg.getOrElse(s, 0L) + 1L)
      nodes += s; nodes += d
    }
    val ids = nodes.toArray
    val idx = ids.zipWithIndex.toMap
    val n = ids.length.toDouble
    val out = new Array[Long](ids.length)
    ids.indices.foreach(k => out(k) = deg.getOrElse(ids(k), 0L))
    // edge list as dense indices, collect order preserved
    val es = edgeRows.map(r => (idx(r.get(0)), idx(r.get(1))))
    var rank = Array.fill(ids.length)(1.0 / n)
    var it = 0
    while (it < iterations) {
      var dm = 0.0
      var k = 0
      while (k < ids.length) { if (out(k) == 0L) dm += rank(k); k += 1 }
      val contrib = new Array[Double](ids.length)
      var j = 0
      while (j < es.length) {
        val (s, d) = es(j)
        contrib(d) += rank(s) / out(s)
        j += 1
      }
      val next = new Array[Double](ids.length)
      k = 0
      while (k < ids.length) {
        next(k) = (1.0 - damping) / n + damping * (contrib(k) + dm / n)
        k += 1
      }
      rank = next
      it += 1
    }
    val rows: Seq[org.apache.spark.sql.Row] =
      ids.indices.map(k => org.apache.spark.sql.Row(ids(k), rank(k)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      idField,
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }
}
