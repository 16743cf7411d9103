package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, StructType}

/** Dtype lattice + schema introspection helpers.
  *
  * Coercion semantics follow the reference library's union-coercion rules
  * (reference: ons_utils/pyspark/concat.py:24-33 precedence list,
  * concat.py:209-244 final-schema resolution):
  *
  *   - `string` is a universal coercion sink: if any frame has a column as
  *     string, every frame casts that column to string.
  *   - numeric columns widen to the highest-precedence numeric type present,
  *     with the reference's deliberate, non-Spark ordering where
  *     `decimal(10,0)` outranks `double` (verified by reference test
  *     tests/pyspark/test_concat.py:452-455).
  *   - a column entirely missing from a frame counts as `int` for the
  *     "is this column numeric everywhere" test, but the missing slot does
  *     not influence which numeric type wins (concat.py:222-232).
  *   - anything else that differs across frames is non-coercible.
  *
  * All work here is driver-side metadata manipulation: cost scales with the
  * number of columns, never with rows — safe at any data scale.
  */
object Types {

  /** Numeric precedence, big → small (reference concat.py:24-33). */
  val sparkNumberTypes: Seq[String] = Seq(
    "decimal(10,0)",
    "double",
    "float",
    "bigint",
    "int",
    "smallint",
    "tinyint",
  )

  /** Dtype string a missing column contributes to the numeric test
    * (reference concat.py:224).
    */
  val missingDefault: String = "int"

  /** `(name, dtype-string)` pairs for a DataFrame, PySpark `df.dtypes`-style
    * (dtype strings are `DataType.simpleString`, identical notation).
    */
  def dtypes(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => (f.name, f.dataType.simpleString))

  /** P6 `get_fields` (reference ons_utils/pyspark/general.py:128-149),
    * normalized to always return a Seq (the reference's dict-returning
    * no-selection branch is a quirk we do not replicate).
    */
  def getFields(df: DataFrame, selection: Option[Seq[String]] = None): Seq[(String, String)] = {
    val all = dtypes(df)
    selection match {
      case Some(names) => all.filter { case (n, _) => names.contains(n) }
      case None        => all
    }
  }

  /** P6 `get_ddl_schema` (reference general.py:109-125): DDL string from
    * `(name, dtype)` pairs, one field per line.
    */
  def getDdlSchema(fields: Seq[(String, String)]): String =
    fields.map { case (n, d) => s"$n $d" }.mkString(",\n")

  /** Parse a DDL string back to a StructType. */
  def fromDdl(ddl: String): StructType = StructType.fromDDL(ddl)

  /** Resolve the target dtype for one column across frames.
    *
    * `dtypesAcrossFrames` has one entry per frame: `Some(dtype)` if the frame
    * has the column, `None` if missing. Returns the coerced dtype, or throws
    * `IllegalArgumentException` when the column is non-coercible (the
    * reference raises TypeError, concat.py:234-238).
    */
  def coerceColumn(name: String, dtypesAcrossFrames: Seq[Option[String]]): String = {
    val present = dtypesAcrossFrames.flatten.distinct
    if (present.exists(_ == "string")) {
      "string"
    } else {
      // Missing slots count as int for the all-numeric test only.
      val forTest = dtypesAcrossFrames.map(_.getOrElse(missingDefault))
      if (forTest.forall(sparkNumberTypes.contains)) {
        sparkNumberTypes.find(present.contains).getOrElse(missingDefault)
      } else if (present.size == 1 && dtypesAcrossFrames.forall(_.isDefined)) {
        present.head
      } else {
        throw new IllegalArgumentException(
          s"Spark column data type mismatch, can't auto-convert between types" +
            s" for column '$name': ${dtypesAcrossFrames.map(_.getOrElse("<missing>")).mkString(", ")}"
        )
      }
    }
  }

  /** Evolve a frame to an explicit target schema (migration front door,
    * the single-frame sibling of [[graft.ops.Concat]]'s pairwise
    * harmonization): present columns cast to the target type, missing
    * columns appear as typed nulls, extras drop, order follows the
    * target. Matching is case-insensitive (Spark's default resolution),
    * and the data column keeps the TARGET's spelling. Column-count work
    * only — no shuffle, no data pass beyond the rewrite itself.
    */
  def evolveTo(df: DataFrame, targetDdl: String): DataFrame = {
    val target = StructType.fromDDL(targetDdl)
    // Two source columns differing only in case are an ambiguous match —
    // fail instead of silently binding whichever happened to come last.
    val present = df.columns.groupBy(_.toLowerCase).map { case (lc, cs) =>
      if (cs.length > 1) throw new IllegalArgumentException(
        s"ambiguous case-insensitive match for '$lc': ${cs.mkString(", ")}")
      lc -> cs.head
    }
    val cols = target.fields.toSeq.map { f =>
      present.get(f.name.toLowerCase) match {
        case Some(src) =>
          org.apache.spark.sql.functions.col(src).cast(f.dataType).as(f.name)
        case None =>
          org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols: _*)
  }

  /** Schema drift report between two frames (e.g. yesterday's corpus
    * version and today's ingest): one `(column, change, from_type,
    * to_type)` row per difference — `added` (only in `to`), `removed`
    * (only in `from`), `retyped` (both, different dtype). Matching is
    * case-insensitive like [[evolveTo]]; unchanged columns are omitted.
    * Pure schema work — no data scan. Feed `retyped`/`added` into
    * [[evolveTo]] or [[graft.ops.Cdc.diffSnapshots]] for the data-level
    * follow-up.
    */
  def diffSchemas(from: DataFrame, to: DataFrame): Seq[(String, String, Option[String], Option[String])] = {
    def m(df: DataFrame): Map[String, (String, String)] =
      df.schema.fields.map(f => f.name.toLowerCase -> (f.name, f.dataType.simpleString)).toMap
    val (f, t) = (m(from), m(to))
    val added = (t.keySet -- f.keySet).toSeq.sorted
      .map(k => (t(k)._1, "added", None, Some(t(k)._2)))
    val removed = (f.keySet -- t.keySet).toSeq.sorted
      .map(k => (f(k)._1, "removed", Some(f(k)._2), None))
    val retyped = (f.keySet & t.keySet).toSeq.sorted
      .filter(k => f(k)._2 != t(k)._2)
      .map(k => (t(k)._1, "retyped", Some(f(k)._2), Some(t(k)._2)))
    added ++ removed ++ retyped
  }

  /** Parse a dtype string to a Catalyst DataType (inverse of simpleString
    * for the types the lattice handles).
    */
  def toDataType(dtype: String): DataType =
    StructType.fromDDL(s"c $dtype").head.dataType
}
