package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers shared by every query family. */
object Qh {

  /** Read one of the harness tables (nanos-timestamp-aware — see
    * [[graft.sources.Sources.readTable]]).
    */
  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Sources.readTable(s, dir, name)

  /** Exact sum of a double column with `scale` true decimal places:
    * decimal accumulate (associative, order-insensitive), then one
    * deterministic cast back to double.
    */
  private[graft] def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")
}
