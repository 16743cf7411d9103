package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot / reshape operators (R1-R7).
  *
  * The reference does these driver-side on pandas MultiIndex frames
  * (reference: ons_utils/pandas.py:21-118, generic.py:9-88); here the
  * long↔wide moves are distributed `pivot` / `unpivot`. The behavior
  * contracts ported are: unstack∘stack = identity (modulo row order), and
  * pivoted column order = sorted distinct pivot values (deterministic, so
  * results are oracle-comparable).
  */
object Reshape {

  /** R1 — unstack (long→wide): `pivot` on the index column. Passing
    * `pivotValues` explicitly skips the extra distinct-values job AND keeps
    * the plan static for very large inputs — always pass them when known.
    */
  def unstack(
      df: DataFrame,
      rowKeys: Seq[String],
      pivotCol: String,
      valueCol: String,
      pivotValues: Seq[Any] = Nil,
      agg: String => Column = c => first(col(c)),
  ): DataFrame = {
    val g = df.groupBy(rowKeys.map(col): _*)
    val p = if (pivotValues.nonEmpty) g.pivot(pivotCol, pivotValues) else g.pivot(pivotCol)
    p.agg(agg(valueCol))
  }

  /** The Stacker `transpose` option (reference pandas.py:21-54: `unstack`
    * then `.T`): swap the row axis and the wide column axis. Distributed
    * spelling: unpivot the wide columns to long, then pivot the former
    * row-key tuples (joined with `sep`) into columns. Pass `keyValues`
    * (the joined row-key strings) when known to keep the plan static —
    * and note the transposed frame has one column per former row, so
    * this is only sensible where the reference used it: small summary
    * frames, not fact tables.
    */
  def transposeWide(df: DataFrame, rowKeys: Seq[String],
                    headerName: String = "column", sep: String = "_",
                    keyValues: Seq[Any] = Nil): DataFrame = {
    val valueCols = df.columns.toSeq.filterNot(rowKeys.contains)
    val long = df.withColumn("__key", concat_ws(sep, rowKeys.map(col): _*))
      .unpivot(Array(col("__key")), valueCols.map(col).toArray, headerName, "__value")
    unstack(long, Seq(headerName), "__key", "__value", keyValues)
  }

  /** R1 with the reference's `transpose=True`: [[unstack]] then
    * [[transposeWide]] — pivot values become rows, row-key tuples become
    * columns.
    */
  def unstackTransposed(
      df: DataFrame,
      rowKeys: Seq[String],
      pivotCol: String,
      valueCol: String,
      pivotValues: Seq[Any] = Nil,
      agg: String => Column = c => first(col(c)),
      sep: String = "_",
  ): DataFrame =
    transposeWide(unstack(df, rowKeys, pivotCol, valueCol, pivotValues, agg),
      rowKeys, headerName = pivotCol, sep = sep)

  /** R2 — stack (wide→long): `unpivot`, the inverse of [[unstack]]. */
  def stack(
      df: DataFrame,
      ids: Seq[String],
      valueCols: Seq[String],
      varName: String,
      valueName: String,
  ): DataFrame =
    df.unpivot(ids.map(col).toArray, valueCols.map(col).toArray, varName, valueName)

  /** R4 — index level → datetime (reference pandas.py:67-79). */
  def levelToDatetime(df: DataFrame, level: String): DataFrame =
    df.withColumn(level, to_timestamp(col(level)))

  /** A2 — distinct level-combination values (reference pandas.py:112-118). */
  def indexLevelValues(df: DataFrame, levels: Seq[String]): DataFrame =
    df.select(levels.map(col): _*).distinct()

  /** R5 — MultiIndex slicer as a filter-expression builder (reference
    * pandas.py:82-109; we raise on arity mismatch instead of returning the
    * error, fixing the reference's returned-not-raised ValueError quirk).
    */
  def levelSlicer(levels: Seq[String], values: Seq[Any]): Column = {
    require(values.length == levels.length,
      s"number of values (${values.length}) must match number of levels (${levels.length})")
    levels.zip(values).map { case (l, v) => col(l) === lit(v) }.reduce(_ && _)
  }

  /** R6 — invert nested keys (reference generic.py:9-11), driver-local. */
  def invertNestedKeys[V](m: Map[Seq[String], V]): Map[Seq[String], V] =
    m.map { case (k, v) => k.reverse -> v }

  /** R7 — key-value pair explosion (reference generic.py:14-25): seq-valued
    * entries become cartesian (k, v) pairs, scalars pass through.
    */
  def keyValuePairs(m: Seq[(String, Any)]): Seq[(String, Any)] =
    m.flatMap {
      case (k, vs: Seq[_]) => vs.map(v => k -> (v: Any))
      case (k, v)          => Seq(k -> v)
    }

  /** R3 support — flatten a nested map to full-depth key paths (reference
    * generic.py via pandas.py:9-18), driver-local config machinery.
    */
  def flattenNested(m: Map[String, Any], prefix: Seq[String] = Nil): Seq[(Seq[String], Any)] =
    m.toSeq.flatMap {
      case (k, nested: Map[_, _]) =>
        flattenNested(nested.asInstanceOf[Map[String, Any]], prefix :+ k)
      case (k, v) => Seq((prefix :+ k) -> v)
    }

  /** R3 — nested map → DataFrame (reference pandas.py:9-18
    * `nested_dict_to_df`): flatten to full-depth key paths, ffill-pad the
    * paths to uniform depth, one level column per depth plus the value.
    */
  def nestedDictToDf(spark: org.apache.spark.sql.SparkSession,
                     m: Map[String, Any],
                     levelNames: Seq[String],
                     valueName: String = "value"): DataFrame = {
    val flat = flattenNested(m)
    val filled = fillTuples(flat.map(_._1), "ffill")
    val depth = filled.headOption.map(_.length).getOrElse(0)
    require(levelNames.length == depth,
      s"levelNames has ${levelNames.length} entries but keys have depth $depth")
    val rows = filled.zip(flat.map(_._2)).map { case (k, v) =>
      org.apache.spark.sql.Row.fromSeq(k ++ Seq(if (v == null) null else v.toString))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      (levelNames.map(n => s"$n string") :+ s"$valueName string").mkString(", "))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Tuple-key padding (reference generic.py:28-65 `fill_tuples`): pad each
    * key to the max length, repeating the last element (`method="ffill"`),
    * the first (`"bfill"`), or duplicating the single element everywhere.
    */
  def fillTuples(keys: Seq[Seq[String]], method: String = "ffill"): Seq[Seq[String]] = {
    val maxLen = keys.map(_.length).max
    keys.map { k =>
      if (k.length == maxLen) k
      else method match {
        case "ffill"  => k ++ Seq.fill(maxLen - k.length)(k.last)
        case "bfill"  => Seq.fill(maxLen - k.length)(k.head) ++ k
        case "repeat" => if (k.length == 1) Seq.fill(maxLen)(k.head) else k
        case other    => throw new IllegalArgumentException(s"unknown fill method: $other")
      }
    }
  }
}
