package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}
import org.slf4j.LoggerFactory

import graft.schema.Types

/** C1 — schema-harmonizing union-all with key-column injection.
  *
  * Re-expression of the reference's flagship `concat` operator
  * (reference: ons_utils/pyspark/concat.py:36-160 driver, 163-317 helpers):
  * pandas-`concat` semantics for Spark DataFrames. Frames with unequal
  * schemas are harmonized before the union:
  *
  *   - union column set = first-appearance order across frames
  *   - per-column target dtype from [[graft.schema.Types.coerceColumn]]
  *     (string sink; numeric widening with the reference's
  *     decimal(10,0)-over-double precedence; TypeError-equivalent on
  *     non-coercible)
  *   - columns missing from a frame are injected as typed nulls
  *     (`lit(null).cast(dtype)`, reference concat.py:196-206)
  *   - optional key columns prepended per frame (`lit(part).as(name)`,
  *     reference concat.py:152-158)
  *
  * Scale notes: all schema work is driver-side metadata (O(#columns));
  * the emitted plan is Project-per-frame + Union, which Catalyst flattens
  * (`CombineUnions`) and executes partition-local — concat introduces NO
  * shuffle at any data size. We deliberately pre-cast instead of using
  * `unionByName(allowMissingColumns = true)` so the widening lattice stays
  * reference-faithful (Spark's own `WidenSetOperationTypes` resolves
  * decimal vs double differently).
  */
object Concat {

  private val log = LoggerFactory.getLogger(getClass)

  /** Union frames with no key columns. */
  def concat(frames: Seq[DataFrame]): DataFrame =
    concatImpl(frames, keys = Nil, names = Nil)

  /** Union frames, prepending one key column `names.head` (single-part
    * keys) or several (multi-part keys: `keys(i)` has one part per name).
    */
  def concat(frames: Seq[DataFrame], keys: Seq[Seq[Any]], names: Seq[String]): DataFrame =
    concatImpl(frames, keys, names)

  /** Mapping variant (reference concat.py:95-105): entry order provides the
    * keys; `selection`, when given, both subsets and re-orders the frames.
    */
  def concat(
      frames: Seq[(String, DataFrame)],
      names: Seq[String],
      selection: Option[Seq[String]],
  ): DataFrame = {
    require(names.nonEmpty, "when frames is a mapping, names must be given")
    // Duplicate keys are legal (pandas concat keeps them) — select by
    // filtering the ordered sequence, never through a Map.
    val chosen: Seq[(String, DataFrame)] = selection match {
      case None => frames
      case Some(sel) => sel.flatMap { k =>
        val matches = frames.filter(_._1 == k)
        require(matches.nonEmpty,
          s"selection key not found in frames mapping: '$k' " +
            s"(available: ${frames.map(_._1).distinct.mkString(", ")})")
        matches
      }
    }
    concatImpl(chosen.map(_._2), chosen.map(kv => Seq[Any](kv._1)), names)
  }

  private def concatImpl(
      frames: Seq[DataFrame],
      keys: Seq[Seq[Any]],
      names: Seq[String],
  ): DataFrame = {
    require(frames.nonEmpty, "No objects to concatenate")
    if (keys.nonEmpty) {
      require(keys.length == frames.length, "keys must be same length as frames")
      require(keys.forall(_.length == names.length),
        "the length of each key must equal the length of names")
      require(keys.forall(_.length == keys.head.length), "all keys must be of equal length")
    }

    val perFrame: Seq[Seq[(String, String)]] = frames.map(Types.dtypes)
    // Union column list, first-appearance order (reference builds this via
    // pandas concat of dtype Series, concat.py:298-317).
    val allCols: Seq[String] = perFrame.flatMap(_.map(_._1)).distinct
    val lookup: Seq[Map[String, String]] = perFrame.map(_.toMap)

    val target: Seq[(String, String)] = allCols.map { c =>
      c -> Types.coerceColumn(c, lookup.map(_.get(c)))
    }

    val mismatched = allCols.filter { c =>
      val ds = lookup.map(_.get(c))
      ds.flatten.distinct.size > 1
    }
    if (mismatched.nonEmpty) {
      log.warn(s"column dtypes in the schemas are not equal, attempting to coerce: " +
        mismatched.mkString(", "))
    }

    val harmonized: Seq[DataFrame] = frames.zip(lookup).map { case (df, have) =>
      // Keep the frame's own column order, then append missing columns in
      // union-schema order (matches the reference's withColumn appends,
      // concat.py:196-206); unionByName aligns the rest.
      val targetMap = target.toMap
      val ownCols = df.columns.toSeq.map { c =>
        val want = targetMap(c)
        if (have(c) == want) col(c) else col(c).cast(Types.toDataType(want)).as(c)
      }
      val missing = target.filter { case (c, _) => !have.contains(c) }.map {
        case (c, d) => lit(null).cast(Types.toDataType(d)).as(c)
      }
      df.select((ownCols ++ missing): _*)
    }

    val keyed: Seq[DataFrame] =
      if (names.isEmpty) harmonized
      else harmonized.zip(keys).map { case (df, parts) =>
        val keyCols: Seq[Column] = names.zip(parts).map { case (n, p) => lit(p).as(n) }
        df.select(keyCols ++ df.columns.toSeq.map(col): _*)
      }

    keyed.reduce(_.unionByName(_))
  }
}
