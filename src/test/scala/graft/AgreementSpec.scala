package graft

import graft.align.Agreement
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("cohenKappa: hand case po=0.7, pe=0.5, kappa=0.4; solo-rated items excluded") {
    val r1 = Seq("y", "y", "y", "y", "y", "y", "n", "n", "n", "n")
    val r2 = Seq("y", "y", "y", "y", "n", "n", "n", "n", "n", "y")
    val ratings =
      (r1.zipWithIndex.map { case (l, i) => (i.toLong, "r1", l) } ++
        r2.zipWithIndex.map { case (l, i) => (i.toLong, "r2", l) } ++
        // items rated by only one rater fall out of the inner join
        Seq((100L, "r1", "y"), (101L, "r2", "n")))
        .toDF("item_id", "rater", "label")
    val row = Agreement.cohenKappa(ratings, "item_id", "rater", "label", "r1", "r2").head()
    assert(row.getAs[Long]("n_items") === 10L)
    assert(row.getAs[Double]("po") === 0.7)
    assert(row.getAs[Double]("pe") === 0.5)
    assert(row.getAs[Double]("kappa") === 0.4)
  }

  test("cohenKappa: perfect chance agreement (pe = 1) yields null kappa") {
    val ratings = Seq(
      (1L, "r1", "x"), (1L, "r2", "x"),
      (2L, "r1", "x"), (2L, "r2", "x"))
      .toDF("item_id", "rater", "label")
    val row = Agreement.cohenKappa(ratings, "item_id", "rater", "label", "r1", "r2").head()
    assert(row.getAs[Double]("po") === 1.0 && row.getAs[Double]("pe") === 1.0)
    assert(row.isNullAt(row.fieldIndex("kappa")))
  }

  test("fleissKappa: hand case with variable rater counts and a dropped singleton") {
    val ratings = (
      Seq("a", "a", "a", "b").map((1L, _)) ++
        Seq("a", "a", "b", "b").map((2L, _)) ++
        Seq((3L, "c")) // one rating: no agreement information, excluded
      ).toDF("item_id", "label")
    val row = Agreement.fleissKappa(ratings, "item_id", "label").head()
    assert(row.getAs[Long]("n_items") === 2L)
    assert(row.getAs[Long]("n_ratings") === 8L)
    assert(row.getAs[Double]("p_bar") === 0.416667)
    assert(row.getAs[Double]("p_e") === 0.53125)
    assert(row.getAs[Double]("kappa") === -0.244444)
  }

  test("krippendorffAlpha: hand coincidence case, perfect agreement, degenerate null") {
    // A: [a,a,b] (n=3), B: [b,b] (n=2), C: [a] dropped
    // o_cc = 2/2 + 2/1 = 3, n = 5, D_o = 1 - 3/5 = 0.4
    // marginals a=2, b=3 -> D_e = 1 - (2*1 + 3*2)/(5*4) = 0.6, alpha = 1/3
    val ratings = (Seq("a", "a", "b").map((1L, _)) ++ Seq("b", "b").map((2L, _))
      ++ Seq((3L, "a"))).toDF("item_id", "label")
    val row = Agreement.krippendorffAlpha(ratings, "item_id", "label").head()
    assert(row.getAs[Long]("n_items") === 2L && row.getAs[Long]("n_ratings") === 5L)
    assert(row.getAs[Double]("d_o") === 0.4)
    assert(row.getAs[Double]("d_e") === 0.6)
    assert(row.getAs[Double]("alpha") === 0.333333)
    // unanimous per item, labels varying across items -> alpha 1
    val perfect = (Seq.fill(2)((1L, "a")) ++ Seq.fill(2)((2L, "b")))
      .toDF("item_id", "label")
    assert(Agreement.krippendorffAlpha(perfect, "item_id", "label")
      .head().getAs[Double]("alpha") === 1.0)
    // every rating the same label -> D_e = 0 -> alpha undefined (null)
    val flat = (Seq.fill(2)((1L, "a")) ++ Seq.fill(2)((2L, "a")))
      .toDF("item_id", "label")
    val fr = Agreement.krippendorffAlpha(flat, "item_id", "label").head()
    assert(fr.getAs[Double]("d_e") === 0.0)
    assert(fr.isNullAt(fr.fieldIndex("alpha")))
  }

  test("fleissKappa: unanimous raters reach kappa 1 when labels vary across items") {
    val ratings = (Seq.fill(3)((1L, "a")) ++ Seq.fill(3)((2L, "b")))
      .toDF("item_id", "label")
    val row = Agreement.fleissKappa(ratings, "item_id", "label").head()
    assert(row.getAs[Double]("p_bar") === 1.0)
    assert(row.getAs[Double]("kappa") === 1.0)
  }

  test("retrievalNeighbors: same-document twins excluded, nearest cross-doc found") {
    // doc 0: two near-identical chunks (0, 1); doc 1: chunk 2 close to
    // them, chunk 3 orthogonal; doc 2: chunk 4 mid-angle. At
    // nprobe = nlist the search is exact: chunk 0's best neighbor must
    // be 2 (its twin 1 is same-doc), never itself.
    val corpus = Seq(
      (0L, 0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, 0L, Array(0.999f, 0.01f, 0.0f)),
      (2L, 1L, Array(0.95f, 0.1f, 0.0f)),
      (3L, 1L, Array(0.0f, 1.0f, 0.0f)),
      (4L, 2L, Array(0.6f, 0.6f, 0.0f)))
      .toDF("vec_id", "doc", "embedding")
    val r = Similarity.retrievalNeighbors(corpus, "vec_id", "embedding", "doc",
      k = 2, nlist = 2, nprobe = 2)
    val byQuery = r.select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(byQuery(0L) === Seq(2L, 4L)) // twin 1 (same doc) excluded
    assert(byQuery(1L) === Seq(2L, 4L))
    assert(byQuery(2L) === Seq(1L, 0L)) // chunk 2's nearest other-doc vectors
    assert(!byQuery.exists { case (q, ns) => ns.contains(q) }) // never self
    // every query's neighbor list is cross-document by construction
    val docOf = Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L)
    assert(byQuery.forall { case (q, ns) => ns.forall(n => docOf(n) != docOf(q)) })
  }

  test("retrievalNeighbors: ranks are contiguous and cosine-descending per query") {
    val corpus = (0L until 30L).map { i =>
      (i, i % 5, Array.tabulate(4)(d => ((i * 7 + d * 3) % 11).toFloat + 1f))
    }.toDF("vec_id", "doc", "embedding")
    val r = Similarity.retrievalNeighbors(corpus, "vec_id", "embedding", "doc",
      k = 3, nlist = 2, nprobe = 2)
      .select("query_id", "cosine", "rank")
      .as[(Long, Double, Int)].collect()
      .groupBy(_._1)
    assert(r.nonEmpty)
    r.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === (1 to sorted.length))
      assert(sorted.map(_._2).toSeq === sorted.map(_._2).sortBy(-_).toSeq)
    }
  }
}
