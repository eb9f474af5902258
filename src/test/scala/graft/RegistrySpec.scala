package graft

import graft.queries._
import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene: SparkEntry merges the per-domain query maps with
  * `++`, which silently overrides on a duplicate name — a collision
  * would drop a query (and possibly pair the survivor with the wrong
  * oracle) without any failure. Pure map assertions, no session. */
class RegistrySpec extends AnyFunSuite {

  private val queryMaps = Seq(
    "RelationalQueries" -> RelationalQueries.queries.keySet,
    "ProfileQueries" -> ProfileQueries.queries.keySet,
    "FeatureQueries" -> FeatureQueries.queries.keySet,
    "EvalQueries" -> EvalQueries.queries.keySet,
    "PipelineQueries" -> PipelineQueries.queries.keySet,
    "LlmQueries" -> LlmQueries.queries.keySet,
    "AlignQueries" -> AlignQueries.queries.keySet)

  test("no query name is defined by two query objects") {
    val dupes = queryMaps.combinations(2).flatMap {
      case Seq((na, a), (nb, b)) => (a & b).map(k => s"$k ($na and $nb)")
    }.toSeq
    assert(dupes.isEmpty, s"silently overridden queries: ${dupes.mkString(", ")}")
    assert(queryMaps.map(_._2.size).sum == SparkEntry.queries.size)
  }

  test("every oracle references a registered query, with no cross-object collisions") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: ${orphans.mkString(", ")}")
    val oracleMaps = Seq(
      RelationalQueries.oracle.keySet, ProfileQueries.oracle.keySet,
      FeatureQueries.oracle.keySet, EvalQueries.oracle.keySet,
      PipelineQueries.oracle.keySet, LlmQueries.oracle.keySet,
      AlignQueries.oracle.keySet)
    assert(oracleMaps.map(_.size).sum == SparkEntry.oracleSql.size,
      "an oracle name is defined in two query objects")
  }
}
