package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Boilerplate-line removal — the C4-style cleaning stage that strips
  * headers, footers, nav bars, and cookie banners: a LINE that repeats
  * across many documents is template chrome, not content, and keeping it
  * both wastes tokens and teaches the model to parrot it.
  *
  * Not in the reference; engine extension (SURVEY §2.11) — the
  * line-granularity sibling of [[Dedup.repeatedSpans]] (which works at
  * token-span granularity within otherwise-distinct text).
  *
  * Scale design: line document-frequencies aggregate on `xxhash64(line)`
  * — 8-byte map-side-combined shuffle keys, never materialized line
  * strings (the q_span_dedup lesson: a string-keyed shuffle is
  * corpus-sized at 100 TB). The flagged-hash table is bounded by the
  * number of DISTINCT repeated lines and joins back hint-free (AQE
  * broadcasts it while it fits). Reassembly is one shuffle on the doc
  * key with a per-doc sort bounded by lines-per-doc. A 64-bit hash
  * collision could drop an innocent line; at ~4e9 distinct lines the
  * birthday bound is ~1 expected collision — acceptable for a cleaning
  * stage, and deterministic (not a flaky gate).
  */
object Boilerplate {

  /** Strip lines whose document frequency is at least `minDocs`.
    *
    * Returns one row per input document: the id, the cleaned text
    * (surviving lines re-joined with `sep`, original order), and
    * `n_kept`/`n_dropped` line counts. Documents whose every line is
    * boilerplate survive with empty text — dropping them is a separate
    * quality-gate decision ([[TextStats.qualityScore]]) — and a null
    * text reads as empty text (one empty line), never a lost row.
    *
    * @param sep line separator, split LITERALLY (not as a regex)
    */
  def stripBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                            sep: String = "\n", minDocs: Int = 3): DataFrame = {
    require(minDocs >= 2, s"minDocs < 2 would strip every line: $minDocs")
    require(sep.nonEmpty, "sep must be non-empty")
    graft.ops.Guards.requireNoReservedNames(docs,
      Seq("__pos", "__line", "__lh", "__df", "__boiler", "n_kept", "n_dropped"),
      "stripBoilerplateLines")
    val lines = docs.select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")),
          java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__line")))
      .withColumn("__lh", xxhash64(col("__line")))
    // distinct (doc, hash) BEFORE the count: a line repeated WITHIN one
    // document is repetition, not boilerplate — only cross-doc spread
    // counts (and the dedup keeps the count shuffle-key exact)
    val boiler = lines.select(col(idCol), col("__lh")).distinct()
      .groupBy(col("__lh")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("__lh"), lit(true).as("__boiler"))
    lines.join(boiler, Seq("__lh"), "left")
      .groupBy(col(idCol))
      .agg(
        concat_ws(sep,
          transform(
            array_sort(collect_list(when(col("__boiler").isNull,
              struct(col("__pos"), col("__line"))))),
            e => e.getField("__line"))).as(textCol),
        count(when(col("__boiler").isNull, lit(1))).as("n_kept"),
        count(when(col("__boiler").isNotNull, lit(1))).as("n_dropped"))
  }
}
