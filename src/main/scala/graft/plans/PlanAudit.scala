package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, CollectSet}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical._

/** Static scale audit of a query plan — the checklist SCALE.md applies by
  * hand, as a library call. Run it in CI or at job-submission time to
  * catch the plan shapes that work at sf0.1 and melt at 100 TB:
  *
  *   - `error` GLOBAL_WINDOW — a window with no partitionBy moves every
  *     row to one task; bound the frame or partition it.
  *   - `error` CARTESIAN — a cross join or a join whose condition has no
  *     equality conjunct (Spark plans nested-loop; see
  *     `Temporal.rangeJoin` for the bucketed rewrite). When one side is
  *     broadcast-hinted or statically bounded (≤ 1000 rows by
  *     `LogicalPlan.maxRows` — a global aggregate, a limit) it is the
  *     sanctioned broadcast-scalar pattern and downgrades to `info`
  *     CARTESIAN_BOUNDED.
  *   - `error` SINGLE_PARTITION — repartition(1)/coalesce(1) funnels the
  *     stage through one task (write-side compaction should size files
  *     with `Tables.compactTo` instead).
  *   - `warn` GLOBAL_SORT — a non-root orderBy forces a full range
  *     exchange mid-pipeline; Spark drops SOME of these itself, the rest
  *     are usually unintended. A root-level sort (display/output
  *     ordering) is reported as `info`.
  *   - `info` UNBOUNDED_COLLECT — collect_list/collect_set grows with
  *     group size; fine for bounded groups, an OOM for power-law keys
  *     (cap with `TopK.topKAgg`).
  *
  * The audit walks the OPTIMIZED logical plan: late enough that
  * Catalyst's own cleanups (redundant-sort removal, constant folding)
  * have run, early enough to be independent of physical strategy and AQE
  * re-planning. It never executes the query.
  */
object PlanAudit {

  final case class Finding(severity: String, rule: String, detail: String) {
    override def toString: String = s"[$severity] $rule: $detail"
  }

  def audit(df: DataFrame): Seq[Finding] =
    auditPlan(df.queryExecution.optimizedPlan)

  /** Audit a logical plan directly (the entry point [[AuditRule]] uses
    * from inside the optimizer). */
  def auditPlan(root: LogicalPlan): Seq[Finding] = {

    def short(p: LogicalPlan): String = p.simpleString(60)

    root.collect {
      case w: Window if w.partitionSpec.isEmpty =>
        Seq(Finding("error", "GLOBAL_WINDOW", short(w)))

      case j: Join =>
        val hasEqui = j.condition.exists(_.exists {
          case _: EqualTo | _: EqualNullSafe => true
          case _ => false
        })
        // A cross join is only a scale-killer when BOTH sides grow with the
        // data. A side the caller explicitly broadcast (the hint survives
        // into Join.hint after EliminateResolvedHint) or whose row count is
        // statically bounded (e.g. a global aggregate's 1 row, a limit) is
        // the sanctioned broadcast-scalar pattern used all over this
        // library — report it as info, not error, so enforcement doesn't
        // force waiving CARTESIAN wholesale (which would also mute real
        // cartesians).
        def sanctioned: Boolean = {
          def hinted(h: Option[HintInfo]) = h.exists(_.strategy.contains(BROADCAST))
          def bounded(p: LogicalPlan) = p.maxRows.exists(_ <= 1000L)
          hinted(j.hint.leftHint) || hinted(j.hint.rightHint) ||
            bounded(j.left) || bounded(j.right)
        }
        val cartesian =
          if (j.joinType == Cross || j.condition.isEmpty) Some(short(j))
          else if (!hasEqui) Some(s"no equality conjunct: ${short(j)}")
          else None
        cartesian.toSeq.map { detail =>
          if (sanctioned) Finding("info", "CARTESIAN_BOUNDED", detail)
          else Finding("error", "CARTESIAN", detail)
        }

      case r: Repartition if r.numPartitions == 1 =>
        Seq(Finding("error", "SINGLE_PARTITION", short(r)))

      case r: RepartitionByExpression if r.optNumPartitions.contains(1) =>
        Seq(Finding("error", "SINGLE_PARTITION", short(r)))

      case s: Sort if s.global =>
        val sev = if (s eq root) "info" else "warn"
        Seq(Finding(sev, "GLOBAL_SORT", short(s)))

      case a: Aggregate =>
        val unbounded = a.aggregateExpressions.exists(_.exists {
          case ae: AggregateExpression =>
            ae.aggregateFunction match {
              case _: CollectList | _: CollectSet => true
              case _ => false
            }
          case _ => false
        })
        if (unbounded) Seq(Finding("info", "UNBOUNDED_COLLECT", short(a))) else Nil
    }.flatten
  }

  /** Throw if the plan has any `error`-severity finding (plus any rule
    * listed in `failOn`); returns the full finding list otherwise.
    * `allow` waives specific rules for plans that violate them SAFELY by
    * construction — e.g. the threshold-curve tables run a global window
    * over a frame already grouped to ≤ 10^digits rows; the waiver is the
    * caller's documented claim that the frame is bounded. */
  def assertScaleSafe(
      df: DataFrame,
      failOn: Set[String] = Set.empty,
      allow: Set[String] = Set.empty): Seq[Finding] = {
    val fs = audit(df)
    val fatal = fs.filter(f =>
      !allow.contains(f.rule) && (f.severity == "error" || failOn.contains(f.rule)))
    if (fatal.nonEmpty)
      throw new IllegalStateException(
        s"plan fails scale audit:\n${fatal.mkString("\n")}")
    fs
  }

  /** Physical-plan fingerprint: counts of the operators whose appearance
    * or disappearance IS a performance regression — shuffles, broadcasts,
    * joins by strategy, sorts (global vs local), windows. Pin these per
    * headline query in a spec (PlanFingerprintSpec) and a silently
    * dropped broadcast hint or a new mid-pipeline global sort fails CI
    * the way a recall regression already does. Zero-count keys are
    * omitted so fingerprints read as the plan's shape, not a matrix.
    * Fingerprint under `spark.sql.adaptive.enabled=false` — the initial
    * physical plan is the pinnable artifact; AQE's runtime re-plans are
    * data-dependent by design. */
  def fingerprint(df: DataFrame): Map[String, Int] = {
    import org.apache.spark.sql.execution._
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    def add(k: String): Unit = counts(k) += 1
    def walk(p: SparkPlan): Unit = {
      p match {
        case _: adaptive.AdaptiveSparkPlanExec =>
          // AQE wraps the real operators in a leaf node: walking it would
          // return {} and make every pinned comparison pass trivially —
          // fail loudly instead of silently disarming the guard
          throw new IllegalStateException(
            "PlanAudit.fingerprint needs spark.sql.adaptive.enabled=false " +
              "(the initial physical plan is the pinnable artifact; AQE " +
              "re-plans are data-dependent by design)")
        case _ =>
      }
      p match {
        case _: exchange.ShuffleExchangeExec            => add("shuffle")
        case _: exchange.BroadcastExchangeExec          => add("broadcast")
        case _: joins.BroadcastHashJoinExec             => add("broadcast_hash_join")
        case _: joins.SortMergeJoinExec                 => add("sort_merge_join")
        case _: joins.ShuffledHashJoinExec              => add("shuffled_hash_join")
        case _: joins.BroadcastNestedLoopJoinExec       => add("broadcast_nested_loop")
        case _: joins.CartesianProductExec              => add("cartesian")
        case s: SortExec if s.global                    => add("global_sort")
        case _: SortExec                                => add("local_sort")
        case _: window.WindowExec                       => add("window")
        case _: window.WindowGroupLimitExec             => add("window_group_limit")
        case _: TakeOrderedAndProjectExec               => add("take_ordered")
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    counts.toMap
  }

  /** Leaf SCAN-node count of the initial physical plan — the
    * fingerprint's companion for FANOUT regressions: an operator that
    * fans a derived input out N ways re-inlines the derivation into N
    * scans (fc67664 measured 38 on interleaved_loss_masks, a silent
    * 3.4s — every oracle still passed). Pin it alongside fingerprint()
    * for queries that sit on that knife-edge. Same AQE-off contract as
    * [[fingerprint]]. */
  def scanCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution._
    var n = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case _: adaptive.AdaptiveSparkPlanExec =>
          throw new IllegalStateException(
            "PlanAudit.scanCount needs spark.sql.adaptive.enabled=false " +
              "(same contract as fingerprint)")
        case _: FileSourceScanExec                    => n += 1
        case _: datasources.v2.BatchScanExec          => n += 1
        case _: LocalTableScanExec                    => n += 1
        case _: RDDScanExec                           => n += 1
        case _: columnar.InMemoryTableScanExec        => n += 1
        case _ =>
      }
      // subqueries too (scalar/IN subquery plans hang off expressions,
      // not children): a fanout that re-inlines a derivation into a
      // subquery adds real scans that a children-only walk never sees —
      // exactly the silent-rescan pathology this count exists to pin
      p.subqueries.foreach(walk)
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  /** Session-wide enforcement: installs [[AuditRule]] as an extra
    * optimizer rule on a LIVE session (idempotent). The rule is inert
    * until `spark.graft.audit` is set to `enforce`; per-rule waivers via
    * `spark.graft.audit.allow` (comma-separated rule names). Sessions
    * built with `spark.sql.extensions=graft.functions.GraftExtensions`
    * get the rule injected automatically. */
  def installEnforcement(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[AuditRule.type]))
      spark.experimental.extraOptimizations = cur :+ AuditRule
  }
}

/** Optimizer rule form of the audit — a validator, not a transformer:
  * returns the plan unchanged, but throws when enforcement is on and an
  * error-severity finding is not waived. Lives in the optimizer so ANY
  * query in the session is covered (spark.sql, DataFrame API, a
  * library's internals), not just paths that remembered to call
  * assertScaleSafe. */
object AuditRule extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.audit", "off") == "enforce") {
      val allow = conf.getConfString("spark.graft.audit.allow", "")
        .split(",").map(_.trim).filter(_.nonEmpty).toSet
      val fatal = PlanAudit.auditPlan(plan)
        .filter(f => f.severity == "error" && !allow.contains(f.rule))
      if (fatal.nonEmpty)
        throw new IllegalStateException(
          s"plan fails scale audit (spark.graft.audit=enforce):\n${fatal.mkString("\n")}")
    }
    plan
  }
}
