package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints, evaluated in ONE aggregation pass
  * however many constraints are declared — the pre-ingestion gate a large
  * pipeline runs on every batch before it pollutes the lake.
  *
  * Every constraint compiles to a violation-count aggregate over the same
  * scan; the per-constraint result rows are exploded from the single
  * result row (the missing_counts pattern). Uniqueness needs a distinct
  * count and joins the same pass via count_distinct — still one shuffle-
  * free wide agg (Spark plans count_distinct via expand, one extra
  * aggregate level, no collect).
  */
object Constraints {

  sealed trait Constraint {
    def name: String
    def column: String
    /** Count of violating rows (0 = pass). */
    private[profile] def violations: Column
  }

  /** Column must never be null. */
  final case class NotNull(column: String) extends Constraint {
    val name = "not_null"
    private[profile] def violations: Column =
      sum(when(col(column).isNull, 1L).otherwise(0L))
  }

  /** Column values must be unique (null counts as a value). */
  final case class Unique(column: String) extends Constraint {
    val name = "unique"
    private[profile] def violations: Column =
      // rows beyond the first occurrence of each value; count_distinct
      // ignores nulls, so the null group (if any) contributes one extra
      // distinct value
      count(lit(1)) - count_distinct(col(column)) -
        when(sum(when(col(column).isNull, 1L).otherwise(0L)) > 0L, 1L).otherwise(0L)
  }

  /** A column combination must be unique (composite key; nulls inside the
    * tuple participate as values via the struct equality). */
  final case class UniqueKey(columns: Seq[String]) extends Constraint {
    require(columns.nonEmpty, "UniqueKey needs at least one column")
    val name = "unique_key"
    val column: String = columns.mkString(",")
    private[profile] def violations: Column =
      count(lit(1)) - count_distinct(struct(columns.map(col): _*))
  }

  /** Non-null values must fall in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Constraint {
    val name = "in_range"
    private[profile] def violations: Column =
      sum(when(col(column) < lo || col(column) > hi, 1L).otherwise(0L))
  }

  /** Non-null values must belong to the given set. */
  final case class InSet(column: String, values: Seq[String]) extends Constraint {
    val name = "in_set"
    private[profile] def violations: Column =
      sum(when(col(column).isNotNull && !col(column).isInCollection(values), 1L).otherwise(0L))
  }

  /** Non-null values must match the regex anchored over the whole value. */
  final case class MatchesRegex(column: String, pattern: String) extends Constraint {
    val name = "matches_regex"
    private[profile] def violations: Column =
      sum(when(col(column).isNotNull && !col(column).rlike("^(?:" + pattern + ")$"), 1L)
        .otherwise(0L))
  }

  /** Evaluate all constraints in one pass. Output one row per constraint:
    * (check_name, col_name, violations, passed), ordered by name for
    * deterministic comparison. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints declared")
    val aggs = constraints.zipWithIndex.map { case (c, i) =>
      coalesce(c.violations, lit(0L)).as(s"v_$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = constraints.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check_name"),
        lit(c.column).as("col_name"),
        col(s"v_$i").as("violations"),
        (col(s"v_$i") === 0L).as("passed"))
    }
    row
      .select(explode(array(stacked: _*)).as("s"))
      .select(col("s.check_name"), col("s.col_name"), col("s.violations"), col("s.passed"))
      .orderBy(col("check_name"), col("col_name"))
  }
}
