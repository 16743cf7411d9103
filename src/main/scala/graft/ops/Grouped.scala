package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** U1 — grouped-map table function (flagship #2).
  *
  * The reference wraps a `pandas.DataFrame → pandas.DataFrame` function as a
  * GROUPED_MAP pandas_udf and re-attaches the group-key columns by sampling
  * the first input row (reference: ons_utils/pyspark/general.py:42-106,
  * key re-attach at 97-104). The Spark-native form is
  * `KeyValueGroupedDataset.flatMapGroups`:
  *
  *   - the group key arrives as a function argument, so key re-attachment is
  *     exact (no first-row sampling) and works for empty-output groups;
  *   - the function runs inside the executor JVM — no Arrow IPC hop and no
  *     Python worker process, deleting the reference's two biggest
  *     per-group overheads;
  *   - physical plan: one hash-partition Exchange on the keys, then
  *     partition-local group iteration. One shuffle, same as the reference,
  *     minus the serialization.
  *
  * The output schema is explicit (`StructType`), keeping the reference's
  * dynamic-schema capability; unlike the reference (which trusts the
  * declared DDL, general.py:57-60) the Row encoder validates shapes at
  * runtime.
  */
object Grouped {

  /** Apply `f` to each group's rows; group-key columns are prepended to
    * `f`'s output automatically (reference behavior with `groups` always
    * re-attached).
    *
    * @param outSchema schema of `f`'s output rows (keys excluded)
    */
  def applyPerGroup(
      df: DataFrame,
      groups: Seq[String],
      outSchema: StructType,
  )(f: (Row, Iterator[Row]) => Iterator[Row]): DataFrame = {
    val keySchema = StructType(groups.map(g => df.schema(g)))
    val fullSchema = StructType(keySchema.fields ++ outSchema.fields)
    val keyEnc = Encoders.row(keySchema)
    val outEnc = Encoders.row(fullSchema)
    val keyIdx = groups.map(df.schema.fieldIndex)

    df.groupByKey(r => Row.fromSeq(keyIdx.map(r.get)))(keyEnc)
      .flatMapGroups { (key: Row, rows: Iterator[Row]) =>
        f(key, rows).map(out => Row.fromSeq(key.toSeq ++ out.toSeq))
      }(outEnc)
      .toDF()
  }

  /** Convenience overload for whole-group materialized transforms, the
    * closest analog of the reference's pandas-frame-in/pandas-frame-out
    * contract. Only use when groups are known to fit in executor memory —
    * the Iterator form above streams.
    */
  def applyPerGroupSeq(
      df: DataFrame,
      groups: Seq[String],
      outSchema: StructType,
  )(f: Seq[Row] => Seq[Row]): DataFrame =
    applyPerGroup(df, groups, outSchema)((_, it) => f(it.toSeq).iterator)

  /** Two-input sibling of [[applyPerGroup]]: `f` sees each key's row
    * groups from BOTH frames together (`KeyValueGroupedDataset.cogroup`)
    * — custom merge/reconcile/compare logic that a join can't express
    * without materializing the cross product. Keys present on only one
    * side still reach `f` (the other iterator is empty), so full-outer
    * semantics are the default and `f` decides what to emit.
    *
    * Cost: one hash Exchange per side on the keys — exactly a shuffle
    * join's movement, minus the join's pair explosion.
    *
    * @param keys      join-key column names, present on both frames
    * @param outSchema schema of `f`'s output rows (keys excluded;
    *                  key columns are prepended automatically)
    */
  def cogroupApply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      outSchema: StructType,
  )(f: (Row, Iterator[Row], Iterator[Row]) => Iterator[Row]): DataFrame = {
    // the key encoder is built from the LEFT schema and applied to both
    // sides' key rows — mismatched key dtypes would fail deep inside an
    // executor (opaque ClassCastException) or group nothing, so fail fast
    keys.foreach { k =>
      val (lt, rt) = (left.schema(k).dataType, right.schema(k).dataType)
      require(lt == rt, s"cogroup key '$k' dtype mismatch: " +
        s"left ${lt.simpleString} vs right ${rt.simpleString}")
    }
    val keySchema = StructType(keys.map(k => left.schema(k)))
    val fullSchema = StructType(keySchema.fields ++ outSchema.fields)
    val keyEnc = Encoders.row(keySchema)
    val outEnc = Encoders.row(fullSchema)
    val lIdx = keys.map(left.schema.fieldIndex)
    val rIdx = keys.map(right.schema.fieldIndex)

    left.groupByKey(r => Row.fromSeq(lIdx.map(r.get)))(keyEnc)
      .cogroup(right.groupByKey(r => Row.fromSeq(rIdx.map(r.get)))(keyEnc)) {
        (key: Row, l: Iterator[Row], r: Iterator[Row]) =>
          f(key, l, r).map(out => Row.fromSeq(key.toSeq ++ out.toSeq))
      }(outEnc)
      .toDF()
  }
}
