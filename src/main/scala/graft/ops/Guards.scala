package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared input-column guard: operators that add output columns or use
  * internal working names must REJECT inputs already carrying those
  * names — `withColumn` would silently clobber user data and joins would
  * fail later with an opaque ambiguous-reference error. One helper, one
  * message shape, used by every operator with reserved names.
  */
object Guards {
  def requireNoReservedNames(df: DataFrame, reserved: Seq[String], op: String): Unit =
    for (c <- df.columns if reserved.contains(c))
      throw new IllegalArgumentException(
        s"input column '$c' collides with a $op output/internal name; rename it first")

  /** Same check for non-frame name lists (e.g. caller-supplied aggregate
    * aliases that will become columns next to the operator's own).
    */
  def requireNoReserved(names: Seq[String], reserved: Seq[String], op: String): Unit =
    for (c <- names if reserved.contains(c))
      throw new IllegalArgumentException(
        s"name '$c' collides with a $op output/internal name; rename it first")
}
