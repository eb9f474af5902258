package graft

import graft.plans.PlanAudit
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 100).map(i => (i.toLong, i % 5, i * 1.0)).toDF("id", "k", "v")

  private def rules(d: org.apache.spark.sql.DataFrame): Set[String] =
    PlanAudit.audit(d).map(_.rule).toSet

  test("flags global windows, passes partitioned ones") {
    val global = df.withColumn("rn", row_number().over(Window.orderBy($"id")))
    assert(rules(global).contains("GLOBAL_WINDOW"))
    val keyed = df.withColumn("rn", row_number().over(Window.partitionBy($"k").orderBy($"id")))
    assert(!rules(keyed).contains("GLOBAL_WINDOW"))
    intercept[IllegalStateException](PlanAudit.assertScaleSafe(global))
    PlanAudit.assertScaleSafe(keyed)
  }

  test("flags cartesian and non-equi joins, passes equi joins") {
    // both sides above the static bound -> genuine scale-killer
    val big = (1 to 1200).map(i => (i.toLong, i % 5, i * 1.0)).toDF("id", "k", "v")
    val dims = (1 to 1500).map(i => (i, s"s$i")).toDF("k2", "s")
    assert(rules(big.crossJoin(dims)).contains("CARTESIAN"))
    assert(rules(big.join(dims, $"v" > $"k2")).contains("CARTESIAN"))
    // equi conjunct present: the range residual is fine
    assert(!rules(big.join(dims, $"k" === $"k2" && $"v" > $"k2")).contains("CARTESIAN"))
    // the sanctioned broadcast-scalar pattern downgrades to info: a
    // broadcast-hinted side, or a statically bounded one (global agg = 1
    // row) — enforcement passes without waiving CARTESIAN wholesale
    val hinted = big.crossJoin(broadcast(dims))
    assert(!rules(hinted).contains("CARTESIAN"))
    assert(rules(hinted).contains("CARTESIAN_BOUNDED"))
    PlanAudit.assertScaleSafe(hinted)
    val scalarSide = big.crossJoin(big.agg(sum($"v").as("total")))
    assert(!rules(scalarSide).contains("CARTESIAN"))
    assert(rules(scalarSide).contains("CARTESIAN_BOUNDED"))
    PlanAudit.assertScaleSafe(scalarSide)
    // the bucketed range join's plan passes the audit by construction
    val iv = Seq((10L, 0L, 50L)).toDF("wid", "ws", "we")
    val rj = graft.dp.Temporal.rangeJoin(df.withColumnRenamed("id", "pt"), iv, "pt", "ws", "we", 16L)
    assert(!rules(rj).contains("CARTESIAN"))
  }

  test("flags single-partition funnels and mid-plan global sorts") {
    assert(rules(df.repartition(1)).contains("SINGLE_PARTITION"))
    assert(rules(df.coalesce(1)).contains("SINGLE_PARTITION"))
    // root-level orderBy is info (allowed by assertScaleSafe)...
    val rootSort = df.orderBy($"v")
    assert(PlanAudit.audit(rootSort).exists(f => f.rule == "GLOBAL_SORT" && f.severity == "info"))
    PlanAudit.assertScaleSafe(rootSort)
    // ...but a sort feeding an aggregation survives optimization only when
    // it matters; a sort under a projection-limit chain is warn-level
    val mid = df.orderBy($"v").limit(10).select($"id")
    PlanAudit.audit(mid) // must not throw — severity at most warn
    // failOn escalates chosen rules
    intercept[IllegalStateException](
      PlanAudit.assertScaleSafe(rootSort, failOn = Set("GLOBAL_SORT")))
    // allow waives a rule the caller argues is bounded by construction
    val global = df.withColumn("rn", row_number().over(Window.orderBy($"id")))
    PlanAudit.assertScaleSafe(global, allow = Set("GLOBAL_WINDOW"))
    // the job runner's documented waiver case: the ROC threshold curve
    val preds = df.select($"id", ($"v" / 100).as("score"), ($"k" % 2).as("y"))
    val roc = graft.eval.Metrics.rocPrCurve(preds, "score", "y")
    PlanAudit.assertScaleSafe(roc, allow = Set("GLOBAL_WINDOW"))
    intercept[IllegalStateException](PlanAudit.assertScaleSafe(roc))
  }

  test("flags unbounded collect_list, passes the bounded top-k aggregate") {
    assert(rules(df.groupBy($"k").agg(collect_list($"v"))).contains("UNBOUNDED_COLLECT"))
    val bounded = df.groupBy($"k").agg(graft.dp.TopK.topKAgg(5)($"v".as("v")))
    assert(!rules(bounded).contains("UNBOUNDED_COLLECT"))
  }

  test("enforcement rule blocks bad plans session-wide when the conf is on") {
    PlanAudit.installEnforcement(spark)
    PlanAudit.installEnforcement(spark) // idempotent
    // count() alone would let column pruning DELETE the unused window (the
    // audit correctly never sees it) — keep rn observable
    val bad = df.withColumn("rn", row_number().over(Window.orderBy($"id")))
      .filter($"rn" > 0)
    try {
      bad.count() // conf off: rule is inert
      spark.conf.set("spark.graft.audit", "enforce")
      val e = intercept[Exception](bad.count())
      assert(e.getMessage.contains("GLOBAL_WINDOW") ||
        Option(e.getCause).exists(_.getMessage.contains("GLOBAL_WINDOW")))
      // partitioned windows and normal queries still run
      assert(df.withColumn("rn",
        row_number().over(Window.partitionBy($"k").orderBy($"id"))).count() == 100)
      // waiver conf lets the bounded case through
      spark.conf.set("spark.graft.audit.allow", "GLOBAL_WINDOW")
      assert(bad.count() == 100)
    } finally {
      spark.conf.unset("spark.graft.audit")
      spark.conf.unset("spark.graft.audit.allow")
    }
  }

  test("registered heavyweight queries pass the audit (modulo output sorts)") {
    val sf = "/root/testdata/sf0.001"
    Seq("e1_feature_pipeline", "sequence_packing", "line_dedup", "inverted_index",
      "dedup_exact", "range_join", "sessionize_batch",
      "packed_sequences", "bpe_pack_e2e", "quantile_sketch_state",
      "cluster_safe_split", "decontaminate_corpus",
      "epoch_shuffle", "dedup_spans", "normalize_text", "avi_mjpeg_decode",
      "bin_packing", "packed_bins", "semdedup_survivors",
      "corpus_data_card", "scd2_build", "scd2_apply", "zorder_key",
      "ann_ivfpq_refined", "ann_ivfpq_refined_exact", "cms_frequency",
      "unigram_encode_audit",
      "interleaved_pack", "scd2_from_snapshots", "scd2_snapshot_at").foreach { name =>
      val d = (SparkEntry.queries ++ SparkEntry.benchQueries)(name)(spark, sf)
      val errors = PlanAudit.audit(d).filter(_.severity == "error")
      assert(errors.isEmpty, s"$name: $errors")
    }
  }
}
