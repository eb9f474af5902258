package graft

import graft.sampling.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling: hashed n-gram featurization, smoothed
  * distributions, log-likelihood-ratio weights, Gumbel-top-k selection. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: "science" prose vs spam boilerplate; the
  // raw corpus mixes them, the target corpus is pure science
  private def science(id: Long) =
    (id, s"quantum field theory lattice gauge simulation energy spectrum run $id")
  private def spam(id: Long) =
    (id, s"click here buy now free offer winner prize claim today deal $id")

  private def target = (0L until 30L).map(science).toDF("doc_id", "text")
  private def raw =
    ((100L until 130L).map(science) ++ (200L until 230L).map(spam))
      .toDF("doc_id", "text")

  test("hashedNgramCounts: conserves gram mass, buckets in range") {
    val counts = Dsir.hashedNgramCounts(raw, "doc_id", "text", buckets = 64)
    // n tokens -> n unigrams + (n-1) bigrams per doc: science docs have
    // 10 tokens (19 grams), spam docs 12 (23 grams)
    val total = counts.agg(sum("cnt")).head().getLong(0)
    assert(total === 30L * 19L + 30L * 23L)
    assert(counts.filter(col("bucket") < 0 || col("bucket") >= 64).count() === 0)
  }

  test("bucketLogProbs: full-width table, probabilities sum to 1") {
    val counts = Dsir.hashedNgramCounts(raw, "doc_id", "text", buckets = 64)
    val lp = Dsir.bucketLogProbs(counts, buckets = 64)
    assert(lp.count() === 64)
    val mass = lp.agg(sum(exp(col("logp")))).head().getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-9)
  }

  test("logWeights: target-like raw docs outweigh off-target docs") {
    val w = Dsir.logWeights(raw, target, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size === 60)
    val sciMin = (100L until 130L).map(w).min
    val spamMax = (200L until 230L).map(w).max
    assert(sciMin > spamMax,
      s"science docs must outweigh spam: min(sci)=$sciMin max(spam)=$spamMax")
    // weights are likelihood ratios: science positive, spam negative
    assert(sciMin > 0 && spamMax < 0)
  }

  test("gumbelTopK: deterministic, exact size, heavily enriched in target-like docs") {
    val w = Dsir.logWeights(raw, target, "doc_id", "text", buckets = 256)
    val pick1 = Dsir.gumbelTopK(w, "doc_id", "log_weight", k = 30, seed = 11)
      .select("doc_id").as[Long].collect().toSet
    val pick2 = Dsir.gumbelTopK(w, "doc_id", "log_weight", k = 30, seed = 11)
      .select("doc_id").as[Long].collect().toSet
    assert(pick1 === pick2)
    assert(pick1.size === 30)
    // the weight gap here is many nats, so the softmax sample is
    // effectively the science half
    assert(pick1.count(_ < 200L) === 30)
    // a different seed still samples ~science, but k > #science forces
    // spam in — tail draws really do depend on the Gumbel noise
    val pick3 = Dsir.gumbelTopK(w, "doc_id", "log_weight", k = 40, seed = 12)
      .select("doc_id").as[Long].collect().toSet
    assert(pick3.size === 40 && pick3.count(_ < 200L) === 30)
  }
}
