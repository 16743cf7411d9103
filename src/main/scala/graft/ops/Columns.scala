package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Column-level helpers: P1-P6, U2, W1, S5 from the survey inventory.
  * Reference: ons_utils/pyspark/general.py and ons_utils/pyspark/udfs.py.
  */
object Columns {

  /** P1 — string→Column promotion (reference general.py:29-39). The
    * reference's decorator machinery (factories.py) is Python argument
    * rewriting; in Scala plain overloads cover it.
    */
  def toSparkCol(c: String): Column = col(c)
  def toSparkCol(c: Column): Column = c

  /** P2 — rename-by-mapping projection (reference general.py:202-211):
    * names absent from the mapper pass through unchanged. Pure Project
    * node — no shuffle, fully pushdown-transparent.
    */
  def mapColumnNames(df: DataFrame, mapper: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapper)

  /** P3 — literal-map lookup (reference general.py:152-162): CASE/decode via
    * a literal `map(...)` expression; Seq values become array literals;
    * unmapped keys yield null (ANSI-safe via try_element_at). The literal
    * map is constant-folded by Catalyst — O(1) per row after folding; for
    * very large mappings prefer a broadcast join instead.
    */
  def mapCol(colName: String, mapping: Seq[(Any, Any)]): Column = {
    val entries: Seq[Column] = mapping.flatMap { case (k, v) =>
      Seq(lit(k), v match {
        case s: Seq[_] => array(s.map(x => lit(x)): _*)
        case other     => lit(other)
      })
    }
    try_element_at(map(entries: _*), col(colName))
  }

  /** P4 — first-group filter (reference general.py:224-228). The reference
    * interpolates values into a SQL string (breaks on quotes); we keep the
    * semantics but build a Column predicate. `head(1)` order is whatever the
    * scan yields, matching the reference; see [[firstGroupOrdered]] for a
    * deterministic variant.
    */
  def getFirstGroup(df: DataFrame, groups: Seq[String]): DataFrame = {
    val first = df.select(groups.map(col): _*).head()
    filterToGroup(df, groups, first)
  }

  /** Deterministic variant of P4: the group with the smallest key tuple. */
  def firstGroupOrdered(df: DataFrame, groups: Seq[String]): DataFrame = {
    val first = df.select(groups.map(col): _*).orderBy(groups.map(col): _*).head()
    filterToGroup(df, groups, first)
  }

  private def filterToGroup(df: DataFrame, groups: Seq[String], key: Row): DataFrame =
    df.filter(groups.zipWithIndex.map { case (g, i) => col(g) <=> lit(key.get(i)) }.reduce(_ && _))

  /** W1 — window-spec builder (reference general.py:170-183). An empty
    * `groups` yields a whole-frame window: every row lands in ONE partition
    * of ONE task — the reference docstring's "use with caution on large
    * DataFrames" warning holds doubly at scale; prefer an `agg` + broadcast
    * join for global aggregates.
    */
  def windowSpec(groups: Seq[String] = Nil): WindowSpec =
    if (groups.nonEmpty) Window.partitionBy(groups.map(col): _*) else Window.partitionBy()

  /** S5 — driver collect sink (reference general.py:186-199): one column →
    * flat values; several → row value lists. Driver-local by design; never
    * use mid-pipeline.
    */
  def toList(df: DataFrame): Seq[Any] =
    if (df.columns.length == 1) df.collect().toSeq.map(_.get(0))
    else df.collect().toSeq.map(_.toSeq)

  /** U2 — array successive-difference (reference udfs.py:7-10, `np.diff` as
    * a Python UDF over array<float>). Here it is pure Catalyst — zip_with
    * over two shifted slices — so it stays inside whole-stage codegen with
    * no UDF serialization cost.
    */
  def arrayDiff(c: Column): Column = {
    val n = size(c)
    zip_with(
      slice(c, lit(2), greatest(n - 1, lit(0))),
      slice(c, lit(1), greatest(n - 1, lit(0))),
      (next, prev) => next - prev,
    )
  }
}
