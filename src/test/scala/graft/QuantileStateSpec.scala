package graft

import org.apache.spark.sql.functions._
import graft.dp.QuantileState

/** Mergeable per-key quantile state: GK rank bound, merge == incremental
  * fold, stable binary encoding. */
class QuantileStateSpec extends SparkSpec {
  import spark.implicits._

  // deterministic skewed data: two keys, lognormal-ish spread via x^3
  private lazy val rows = {
    val xs = (1 to 4000).map { i =>
      val u = ((i * 2654435761L) % 9973).toDouble / 9973.0 // hash-derived, seedless
      val key = if (i % 3 == 0) "b" else "a"
      (key, u * u * u * 1000.0)
    }
    xs.toDF("k", "v").repartition(7) // force multi-partition partial aggs
  }

  test("sketch + estimate stays inside the GK rank bound on skewed data") {
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val state = QuantileState.quantileSketch(rows, "k", "v")
    val est = QuantileState.estimateQuantiles(state, "k", probs)
    val audit = QuantileState.rankWithinBound(rows, est, "k", "v", probs).collect()
    assert(audit.length === 2)
    audit.foreach { r =>
      assert(r.getAs[Boolean]("count_exact"), s"summary count drifted: $r")
      probs.foreach { p =>
        val c = "within_q_" + (if (p == 0.5) "50" else if (p == 0.1) "10" else if (p == 0.9) "90" else "99")
        assert(r.getAs[Boolean](c), s"rank bound violated at p=$p: $r")
      }
    }
  }

  test("rank audit passes on heavily tied values (tie-group rank interval)") {
    // >2*eps of key mass on one value: count(<=q) alone sits far above the
    // target rank and the old max-rank check reported a false failure for
    // a sketch that satisfies the GK guarantee (some rank in the tie
    // interval is within bound)
    val probs = Seq(0.5, 0.9)
    val tied = ((1 to 5000).map(_ => ("t", 42.0)) ++
      (1 to 100).map(i => ("t", i.toDouble)) ++
      (1 to 100).map(i => ("t", 1000.0 + i))).toDF("k", "v").repartition(5)
    val state = QuantileState.quantileSketch(tied, "k", "v")
    val est = QuantileState.estimateQuantiles(state, "k", probs)
    val audit = QuantileState.rankWithinBound(tied, est, "k", "v", probs).head()
    assert(audit.getAs[Boolean]("within_q_50"),
      s"median audit must pass when the median value is a massive tie: $audit")
    // a genuinely-off estimate still fails: claim the 0.9 quantile is the
    // minimum value
    val wrong = est.withColumn("q_90", lit(0.5))
    val bad = QuantileState.rankWithinBound(tied, wrong, "k", "v", probs).head()
    assert(!bad.getAs[Boolean]("within_q_90"), s"audit must still catch a wrong estimate: $bad")
  }

  test("merge of disjoint batch states bounds ranks over the union") {
    val (a, b) = (rows.filter(col("v") < 100), rows.filter(col("v") >= 100))
    val merged = QuantileState.mergeQuantileSketches(
      QuantileState.quantileSketch(a, "k", "v"),
      QuantileState.quantileSketch(b, "k", "v"),
      "k")
    val probs = Seq(0.5, 0.95)
    val est = QuantileState.estimateQuantiles(merged, "k", probs)
    val audit = QuantileState.rankWithinBound(rows, est, "k", "v", probs).collect()
    assert(audit.length === 2)
    audit.foreach { r =>
      assert(r.getAs[Boolean]("count_exact"), s"merged count != union count: $r")
      assert(r.getAs[Boolean]("within_q_50") && r.getAs[Boolean]("within_q_95"), s"$r")
    }
  }

  test("keys present in only one batch survive the merge unchanged") {
    val a = Seq(("only_a", 1.0), ("only_a", 2.0), ("both", 5.0)).toDF("k", "v")
    val b = Seq(("only_b", 9.0), ("both", 7.0)).toDF("k", "v")
    val merged = QuantileState.mergeQuantileSketches(
      QuantileState.quantileSketch(a, "k", "v"),
      QuantileState.quantileSketch(b, "k", "v"),
      "k")
    val est = QuantileState.estimateQuantiles(merged, "k", Seq(0.5))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(est.keySet === Set("only_a", "only_b", "both"))
    assert(est("only_a")._1 === 2L && est("only_b")._1 === 1L && est("both")._1 === 2L)
    assert(est("only_b")._2 === 9.0)
  }

  test("binary encoding round-trips and is deterministic") {
    val qs0 = new org.apache.spark.sql.catalyst.util.QuantileSummaries(
      org.apache.spark.sql.catalyst.util.QuantileSummaries.defaultCompressThreshold, 0.01)
    val qs = (1 to 500).foldLeft(qs0)((s, i) => s.insert(i.toDouble))
    val bytes = QuantileState.serialize(qs)
    val back = QuantileState.deserialize(bytes)
    assert(back.count === qs.compress().count)
    assert(QuantileState.serialize(back).toSeq === bytes.toSeq) // stable bytes
    Seq(0.25, 0.5, 0.75).foreach { p =>
      assert(back.query(p) === qs.compress().query(p))
    }
    // version guard fails loudly
    val bad = bytes.clone(); bad(0) = 9
    val e = intercept[IllegalArgumentException](QuantileState.deserialize(bad))
    assert(e.getMessage.contains("version"))
  }

  test("sketch agg is two-phase: summaries, not values, cross the exchange") {
    val plan = QuantileState.quantileSketch(rows, "k", "v")
      .queryExecution.executedPlan.toString
    // physical tree prints top-down (final agg, exchange, partial agg):
    // the partial sketch below the exchange is what makes the shuffle
    // carry per-key summaries instead of raw values
    val exchange = plan.indexOf("Exchange")
    val partial = plan.indexOf("partial_sketchagg")
    assert(partial >= 0, s"no partial aggregation in plan:\n$plan")
    assert(exchange >= 0 && exchange < partial,
      s"partial sketch not below the exchange:\n$plan")
  }

  test("states built at different relative errors refuse to merge") {
    val df = Seq(("k", 1.0), ("k", 2.0)).toDF("k", "v")
    val a = QuantileState.quantileSketch(df, "k", "v", relErr = 0.01)
    val b = QuantileState.quantileSketch(df, "k", "v", relErr = 0.05)
    val e = intercept[Exception](
      QuantileState.mergeQuantileSketches(a, b, "k").collect())
    assert(e.getMessage.contains("relative errors")
      || Option(e.getCause).exists(_.getMessage.contains("relative errors")),
      s"unexpected: $e")
  }

  test("nulls are dropped, not counted") {
    val df = Seq(Some(1.0), None, Some(3.0), None).map(v => ("k", v)).toDF("k", "v")
    val est = QuantileState.estimateQuantiles(
      QuantileState.quantileSketch(df, "k", "v"), "k", Seq(0.5)).head()
    assert(est.getLong(1) === 2L)
  }
}
