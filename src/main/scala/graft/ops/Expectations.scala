package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations evaluated in ONE scan — the
  * contract-check step a training-data pipeline runs on every ingested
  * batch before it is allowed into the corpus (deequ/dbt-test shape).
  *
  * Not in the reference (whose validation, SURVEY §2.10, checks config
  * and catalog existence, not data); engine extension (SURVEY §2.11).
  *
  * Scale design: every rule compiles to an aggregate over the same
  * single pass — no per-rule jobs, no driver-side row inspection. Rules
  * that need distinct counts ([[Rule.Unique]]) ride the same aggregation
  * via Spark's multi-distinct Expand. The result is rule-count rows, so
  * the output is driver-safe regardless of input size. For metrics that
  * must not cost even one extra scan, ride them on a write instead with
  * [[Observe]] — Expectations is the standalone gate, Observe the
  * piggy-back.
  */
object Expectations {

  /** One expectation. `name` keys the report row. */
  sealed trait Rule { def name: String }
  object Rule {
    /** Column has no nulls. */
    final case class NotNull(column: String) extends Rule {
      val name = s"not_null($column)"
    }
    /** Column tuple is unique across rows (null tuples count as values). */
    final case class Unique(columns: Seq[String]) extends Rule {
      val name = s"unique(${columns.mkString(",")})"
    }
    /** Numeric column within [lo, hi]; nulls do not violate (compose with
      * NotNull for that).
      */
    final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
      val name = s"in_range($column,$lo,$hi)"
    }
    /** Column value drawn from an allowed set; nulls do not violate. */
    final case class InSet(column: String, values: Seq[String]) extends Rule {
      val name = s"in_set($column)"
    }
    /** String column fully matches the regex (Java/RE2-portable subset);
      * nulls do not violate.
      */
    final case class Matches(column: String, regex: String) extends Rule {
      val name = s"matches($column)"
    }
    /** Custom predicate: rows where `holds` is false (or null) violate. */
    final case class Satisfies(name: String, holds: Column) extends Rule
  }

  private def violations(r: Rule): Column = r match {
    case Rule.NotNull(c) =>
      sum(when(col(c).isNull, 1L).otherwise(0L))
    case Rule.Unique(cs) =>
      count(lit(1)) - count_distinct(struct(cs.map(col): _*))
    case Rule.InRange(c, lo, hi) =>
      sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L).otherwise(0L))
    case Rule.InSet(c, vs) =>
      sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L).otherwise(0L))
    case Rule.Matches(c, re) =>
      // \A..\z, not ^..$: Java's $ matches BEFORE a trailing newline, so
      // "F\n" would pass a rule documented as a full match
      sum(when(col(c).isNotNull && !col(c).rlike(s"\\A(?:$re)\\z"), 1L).otherwise(0L))
    case Rule.Satisfies(_, holds) =>
      sum(when(coalesce(holds, lit(false)), 0L).otherwise(1L))
  }

  /** Evaluate all rules in one aggregation pass.
    *
    * Returns one row per rule: `(rule, violations, passed)`, ordered by
    * rule name. An empty input frame passes every rule (vacuous truth):
    * sums coalesce to 0.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique (duplicate rule in the list)")
    val aliases = rules.indices.map(i => s"__exp_$i")
    val aggs = rules.zip(aliases).map { case (r, a) =>
      coalesce(violations(r), lit(0L)).as(a)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.zip(aliases).map { case (r, a) =>
      struct(lit(r.name).as("rule"), col(a).as("violations"))
    }
    wide.select(explode(array(entries: _*)).as("e"))
      .select(col("e.rule").as("rule"), col("e.violations").as("violations"))
      .withColumn("passed", col("violations") === 0L)
      .orderBy(col("rule"))
  }

  /** Cross-table referential-integrity audit — the expectation the
    * single-table [[Rule]] ADT can't express: how many child rows
    * reference a parent key that does not exist (orphans), and how many
    * carry a null foreign key (which violates nothing, but is reported
    * — the NOT NULL decision belongs to a [[Rule.NotNull]]). One row:
    * `(relation, child_rows, null_fk_rows, orphan_rows, orphan_pct)`.
    *
    * Orphans come from ONE left-anti join of the non-null-FK child
    * against the DISTINCT parent keys; counts are exact, the one pct
    * micro-quantizes via exact integral division (no rounding-tie
    * surface).
    *
    * Scale shape: the anti join shuffles on the key (AQE broadcasts a
    * small parent side automatically); the distinct on the parent is
    * map-side combined. Audit cost ≈ one join — run it before every
    * release the way [[check]] runs its scan.
    */
  def referentialIntegrity(child: DataFrame, fkCols: Seq[String],
                           parent: DataFrame, pkCols: Seq[String],
                           relation: String): DataFrame = {
    require(fkCols.nonEmpty && fkCols.size == pkCols.size,
      s"fk/pk arity mismatch: $fkCols vs $pkCols")
    val fkNonNull = fkCols.map(col(_).isNotNull).reduce(_ && _)
    val totals = child.agg(
      count(lit(1)).as("child_rows"),
      sum(when(!fkNonNull, 1L).otherwise(0L)).as("null_fk_rows"))
    val parentKeys = parent
      .select(pkCols.zip(fkCols).map { case (p, f) => col(p).as(f) }: _*)
      .distinct()
    val orphans = child.filter(fkNonNull)
      .join(parentKeys, fkCols, "left_anti")
      .agg(count(lit(1)).as("orphan_rows"))
    totals.crossJoin(orphans)
      .select(lit(relation).as("relation"), col("child_rows"),
        col("null_fk_rows"), col("orphan_rows"),
        // child_rows > 0 guard: an EMPTY child table must report a null
        // pct (0 orphans of 0 rows is not "0% orphaned"), and Spark's
        // decimal div-by-zero null vs DuckDB's // 0 would otherwise be
        // an engine-specific edge (r12 ADVICE)
        when(col("child_rows") > 0,
          expr("(cast(orphan_rows as decimal(38,0)) * 2000000 + child_rows) " +
            "div (cast(child_rows as decimal(38,0)) * 2)").cast("double") /
            lit(1e6)).as("orphan_pct"))
  }
}
