package graft

import graft.tools.Recall

/** Recall bounds for the approximate operators, enforced on every build.
  *
  * These operators (seeded LSH planes / minhash permutations / k-means
  * cells) have no SQL-expressible DuckDB oracle, so the hash-compare gate
  * can't see a recall regression — a silent drop from 0.9 to 0.3 would
  * still produce "plausible" rows. This spec runs the planted-truth
  * harness ([[graft.tools.Recall.measure]]) on sf0.01 and asserts every
  * entry's bound, making recall a build-breaking property:
  *
  *   - LSH top-k (one-shot + prebuilt index)  >= 0.6
  *   - IVF top-k (one-shot + prebuilt index)  >= 0.85 (r8 auto-nprobe)
  *   - MinHash near-dup (batch + incremental) >= 0.9
  *   - SimHash near-dup (pigeonhole-complete)  = 1.0
  *   - cluster survivors                      >= 0.95
  *   - embedding near-dup (planted clones)     = 1.0
  *   - ROUGE-L near-dup (banding-adversarial) >= 0.9 (default), >= 0.95 (32x1)
  *   - IVF scale-branch auto policy (120k clustered planted) >= 0.85
  *   - IVF scale byK arm (nlist=4096 at 200k -> 50 probes,
  *     two-level fit)                                        >= 0.85
  *   - retrievalNeighbors hierarchical centroid selection    >= 0.85
  *   - IVF auto mid-ramp on NEAR-UNIFORM 90k (the pessimal
  *     shape — measured 0.744 r17, the documented degradation
  *     inside the blend; see ivfAutoNprobe SCOPE note)       >= 0.65
  *   - sharded IVF-PQ at the DEPLOYED defaults (refine on,
  *     auto probes — r18)                                    >= 0.85
  *   - dims=768 production-width auto point (r18; centroid
  *     broadcast budget require()d in the harness)           >= 0.85
  *
  * The same harness run as `runMain graft.tools.Recall` writes the round
  * artifact (RECALL_r*.json); the bounds here and there are one list.
  */
class RecallSpec extends SparkSpec {

  test("approximate operators meet their recall bounds (sf0.01 planted truth)") {
    val entries = Recall.measure(spark, "/root/testdata/sf0.01")
    // every expected operator is present — a harness edit can't silently
    // drop an operator from enforcement
    val expected = Set(
      "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_search", "ann_lsh_search",
      "dedup_minhash", "dedup_minhash_incremental", "dedup_cluster_survivors",
      "dedup_simhash", "embedding_near_dup", "semdedup", "ann_ivfpq_search",
      "ann_ivfpq_refined", "ann_ivfpq_default", "rouge_neardup",
      "rouge_neardup_hr", "retrieval_neighbors",
      "ann_ivf_scale_policy", "ann_ivf_scale_policy_zipf",
      "ann_ivf_scale_byk", "retrieval_neighbors_hierarchical",
      "ann_ivf_ramp_uniform", "ann_ivf_sharded_auto",
      "ann_ivfpq_sharded_auto", "ann_ivfpq_sharded_auto_s16",
      "ann_ivf_highdim_auto")
    assert(entries.map(_.name).toSet === expected)
    val failures = entries.filter(e => e.recall < e.minBound)
    assert(failures.isEmpty,
      failures.map(e => f"${e.name}: recall ${e.recall}%.4f < bound ${e.minBound}")
        .mkString("; "))
  }
}
