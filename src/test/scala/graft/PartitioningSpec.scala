package graft

import org.apache.spark.sql.functions._

/** r20 optimization-round internals: the conditional spread helper and
  * the exhaustive-probe fast path must change PLANS, never results. */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("spread: repartitions an under-parallel frame to default parallelism") {
    val one = (1 to 100).toDF("x").coalesce(1)
    assert(one.rdd.getNumPartitions == 1)
    for (even <- Seq(false, true)) {
      val s = graft.dp.Partitioning.spread(one, even)
      assert(s.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
      // same rows, order-insensitively, in both spread modes
      assert(s.as[Int].collect().sorted.toSeq == (1 to 100))
    }
  }

  test("spread: no-op at adequate parallelism (the at-scale path)") {
    val p = spark.sparkContext.defaultParallelism
    val wide = (1 to 100).toDF("x").repartition(p)
    // object identity: no extra exchange inserted
    assert(graft.dp.Partitioning.spread(wide) eq wide)
  }

  test("ivfQueryProbes: allCells fast path emits exactly the ranked path's rows") {
    val qs = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.6, 0.8)), (3L, Array(0.0, 1.0)))
      .toDF("id", "vec")
    val cents = Seq(
      (0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)), (2, Seq(-1.0, 0.0)))
      .toDF("__cell", "__cent")
    def rows(allCells: Boolean) = graft.similarity.Similarity
      .ivfQueryProbes(qs, "id", "vec", cents, probes = 3, allCells = allCells)
      .select(col("query_id"), col("__cell"))
      .as[(Long, Int)].collect().toSet
    // probes == nlist: the ranked path keeps every (query, cell) pair, so
    // the window-free fast path must produce the identical set
    assert(rows(allCells = true) == rows(allCells = false))
    assert(rows(allCells = true).size == 9)
  }

  test("pageRank: ranks match a hand-rolled damped iteration (incl. dangling mass)") {
    // a graph with a dangling node (4 has no out-edges) so the dangling
    // redistribution path is exercised through the restructured loop
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (2L, 4L))
      .toDF("src", "dst")
    val ranks = graft.graph.Graphs.pageRank(edges, "src", "dst", iterations = 5)
      .as[(Long, Double)].collect().toMap
    // invariant the operator documents: Σ r(v) = 1 at every step
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    // hand-rolled reference of the same damped iteration (d = 0.85)
    var r = Map(1L -> 0.25, 2L -> 0.25, 3L -> 0.25, 4L -> 0.25)
    val out = Map(1L -> Seq(2L, 4L), 2L -> Seq(3L, 4L), 3L -> Seq(1L))
    for (_ <- 1 to 5) {
      val dm = r(4L)
      val in = out.toSeq.flatMap { case (u, vs) => vs.map(v => v -> r(u) / vs.size) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = r.keys.map(v =>
        v -> (0.15 / 4 + 0.85 * (in.getOrElse(v, 0.0) + dm / 4))).toMap
    }
    r.foreach { case (v, expect) =>
      assert(math.abs(ranks(v) - expect) < 1e-9, s"node $v")
    }
  }
}
