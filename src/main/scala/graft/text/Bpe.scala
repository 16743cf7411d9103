package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE merge-rule training — the tokenizer-construction step
  * of an LLM data pipeline (reference scope: the corpus side; this
  * trains the MERGE TABLE, it does not ship an encoder).
  *
  * The industrial-scale shape: the corpus reduces ONCE to a (word,
  * count) vocabulary table (one shuffle — distinct words are orders of
  * magnitude smaller than the corpus), and every round after that works
  * on the vocabulary only: a map-combined adjacent-pair count (pair
  * space is symbol-vocabulary-bounded), ONE winner row to the driver (a
  * scalar merge rule — the same "rules are small, state is distributed"
  * posture as [[graft.ops.Graph.pageRank]]'s N), and a narrow per-row
  * fold rewriting symbol arrays. Rounds never rescan the corpus.
  *
  * Merge semantics are canonical greedy-left (Sennrich et al.): within a
  * word, occurrences of the winning pair merge left-to-right without
  * overlap — `l l l` + rule (l,l) → `ll l`, exactly what the
  * accumulator fold computes. Ties on pair count break by (left, right)
  * lexicographic order, so training is bit-deterministic on any engine
  * and any partitioning.
  */
object Bpe {

  /** Corpus → (syms, cnt) vocabulary: whitespace words, counted, split
    * to single-character symbol arrays. The ONE corpus-sized shuffle.
    */
  def wordVocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextStats.tokens(col(textCol))).as("__w"))
      .filter(length(col("__w")) >= 1)
      .groupBy(col("__w")).agg(count(lit(1)).as("cnt"))
      .select(
        transform(sequence(lit(1), length(col("__w"))),
          i => col("__w").substr(i, lit(1))).as("syms"),
        col("cnt"))

  /** Greedy-left merge of adjacent (left, right) symbol occurrences —
    * a pure-Catalyst `aggregate` fold, no UDF.
    */
  private def foldMerge(syms: org.apache.spark.sql.Column, left: String, right: String) = {
    val merged = left + right
    when(size(syms) <= 1, syms).otherwise(
      aggregate(slice(syms, lit(2), size(syms) - 1), slice(syms, lit(1), lit(1)),
        (acc, x) =>
          when(element_at(acc, -1) === lit(left) && x === lit(right),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
            .otherwise(concat(acc, array(x)))))
  }

  /** Adjacent-pair counts over the vocabulary (position-weighted, the
    * Sennrich convention: `aaa` contributes (a,a) twice per word
    * occurrence).
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))).as("p"), col("cnt"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("cnt")).as("n"))

  /** Train `rounds` merge rules. Returns (round, left, right, n) — fewer
    * rows if the vocabulary runs out of adjacent pairs first (fully
    * merged words stop contributing; never an error).
    */
  def trainMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val spark = df.sparkSession
    var vocab = wordVocab(df, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val w = top.head
        val (l, ri, n) = (w.getString(0), w.getString(1), w.getLong(2))
        merges += ((r, l, ri, n))
        vocab = vocab.select(foldMerge(col("syms"), l, ri).as("syms"), col("cnt"))
          .localCheckpoint(true)
        r += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("round", "left", "right", "n")
  }
}
