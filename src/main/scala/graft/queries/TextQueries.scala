package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}

import graft.multimodal.Multimodal
import graft.ops.{AsOf, Columns, Concat, Grouped, Merge, Pack, Profile, RangeJoin, Reshape, Sampling, Skew, Timeseries}
import graft.streaming.Streaming
import graft.text.{Boilerplate, Classify, Cluster, Dedup, Dsir, LangModel, NaiveBayes, Pq, Rank, Similarity, TextStats}

import graft.queries.Qh.{t, dsum}

/** Text / LLM-pipeline family: quality, language-ID, tokenization, BPE, TF-IDF/BM25, selection.
  *
  * Query defs + their DuckDB oracle SQL, split out of the former
  * monolithic SparkEntry (registry semantics unchanged — the maps merge
  * in [[graft.SparkEntry]]).
  */
object TextQueries {

  /** Corpus statistics per language partition — tokenization, lexical
    * diversity, stopword counts, BPE-ish subword counts.
    */
  private def qTextStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextStats.tokenCount(col("text"))).as("sum_tokens"),
        sum(length(col("text"))).as("sum_chars"),
        sum(TextStats.distinctTokenCount(col("text"))).as("sum_distinct_tokens"),
        sum(TextStats.stopwordCount(col("text"), Seq("the", "a"))).as("sum_stopwords"),
        sum(TextStats.subwordCount(col("text"))).as("sum_subwords"),
      )
      .orderBy(col("lang"))

  /** Per-document quality scoring (length saturation + diversity +
    * stopword presence), deterministic double arithmetic.
    */
  private def qDocQuality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextStats.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** Language-ID heuristic distribution (same heuristic mirrored in SQL). */
  private def qLangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(TextStats.langId(col("text")).as("lang_pred"))
      .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang_pred"))

  /** Bigram PMI collocations ([[Rank.bigramPmi]]): adjacent word pairs
    * co-occurring above chance, with marginals from the bigram table
    * itself — phrase mining before tokenizer training. All counts
    * integer, ln on integer args only, minCount=5 drops the unstable
    * tail.
    */
  private def qPmi(s: SparkSession, dir: String): DataFrame =
    Rank.bigramPmi(t(s, dir, "documents"), col("text"), minCount = 5)
      .orderBy(col("w1"), col("w2"))

  /** Per-document Shannon character entropy
    * ([[TextStats.charEntropy]]): the gibberish/base64 screen beside
    * q_diversity's token-level Simpson index — nano-quantized
    * `cnt·ln(cnt)` terms, ln on integer args only, scan-shaped.
    */
  private def qEntropy(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextStats.charEntropy(col("text")).as("char_entropy"))
      .orderBy(col("doc_id"))

  /** Declared-vs-detected language agreement
    * ([[graft.ops.Stats.cohenKappa]]): the `lang` column as rater A, the
    * [[TextStats.langId]] heuristic as rater B — the annotation-QA audit
    * a labeled corpus runs before trusting its metadata. Multi-category
    * κ on exact counts; the oracle replays the q_lang_id heuristic and
    * the κ arithmetic verbatim.
    */
  private def qKappa(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.ops.Stats.cohenKappa(d, col("lang"), TextStats.langId(col("text")))
  }

  /** Gwet's AC1 ([[graft.ops.Stats.gwetAc1]]): q_kappa's two raters
    * re-scored with the paradox-proof chance correction — on a corpus
    * where one language dominates, κ collapses while AC1 stays
    * calibrated; quoting both is the annotation-QA convention.
    */
  private def qGwet(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.gwetAc1(t(s, dir, "documents"),
      col("lang"), TextStats.langId(col("text")))

  /** McNemar paired-predictor test ([[graft.ops.Stats.mcnemar]]): the
    * per-document [[TextStats.langId]] heuristic vs the source-majority
    * prior (predict every document's language as its source's modal
    * lang — bounded source×lang table, broadcast back), both graded
    * against the `lang` label ON THE SAME DOCUMENTS. The discordant-pair
    * test that decides "swap the predictor", which comparing two
    * accuracies can't. One dimension-table window + one broadcast join
    * + one grand conditional aggregate.
    */
  private def qMcnemar(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    // null langs can't be a modal prediction (and NULLS FIRST vs LAST
    // tie-break order differs across engines) — drop them before ranking
    val counts = d.filter(col("lang").isNotNull)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("__cn"))
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("__cn").desc, col("lang"))
    val majority = counts.withColumn("__rn", row_number().over(W))
      .filter(col("__rn") === 1)
      .select(col("source"), col("lang").as("__maj"))
    val joined = d.join(broadcast(majority), Seq("source"))
    graft.ops.Stats.mcnemar(joined,
      TextStats.langId(col("text")) === col("lang"),
      col("__maj") === col("lang"))
  }

  /** Vocabulary statistics: per-token corpus frequencies (explode-shaped
    * aggregation), top tokens by count with deterministic tie-break.
    */
  private def qVocab(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(TextStats.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)

  /** DSIR importance-resampling selection ([[graft.text.Dsir]]): the 120
    * documents whose hashed unigram+bigram distribution best matches the
    * `lang = 'en'` target slice, scored by exact integer micro-nat LLR
    * sums. The oracle replays the whole chain — bucketing, smoothed LLR
    * quantization, occurrence-sum, top-k — so selection AND scores match
    * bit-for-bit.
    */
  private def qDsir(s: SparkSession, dir: String): DataFrame =
    Dsir.selectTopK(t(s, dir, "documents"), "doc_id", "text",
      isTarget = col("lang") === "en", k = 120, hexChars = 3)

  /** Retrieval evaluation ([[graft.text.Rank.bm25SearchAll]]): each of 20
    * held-out lead chunks queries the remaining chunk corpus via batch
    * BM25; a hit is retrieving a chunk of the SAME document. Emits exact
    * integer recall@1/@5 numerators — the retrieval-QA harness a
    * training-data pipeline runs after chunking. The numbers are
    * data-honest: this synthetic corpus draws from a ~31-token shared
    * vocabulary, so chunk→document identity is irrecoverable BY
    * CONSTRUCTION and the true recall is ~0 — exactly what the harness
    * reports (both engines, bit-identical). RankSpec's distinctive-topic
    * fixture is the positive control where recall is 100%.
    */
  private def qRetrievalEval(s: SparkSession, dir: String): DataFrame = {
    // chunked once: queries, corpus, and the BM25 postings/stats passes
    // all derive from this frame (6 tokenize+chunk replays without it)
    val chunks = t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextStats.chunkTokens(col("text"), 32, 8)).as(Seq("chunk_idx", "ctext")))
      .select((col("doc_id") * 1000 + col("chunk_idx")).as("chunk_id"),
        col("doc_id"), col("chunk_idx"), col("ctext"))
      .localCheckpoint()
    val isQuery = col("doc_id") < 20 && col("chunk_idx") === 0
    val queries = chunks.filter(isQuery)
      .select(col("doc_id").as("query_id"), col("ctext").as("qtext"))
    val corpus = chunks.filter(!isQuery)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_nano").desc, col("chunk_id"))
    val top = Rank.bm25SearchAll(corpus, "chunk_id", "ctext", queries, "query_id", "qtext")
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .withColumn("hit",
        when(expr("chunk_id div 1000") === col("query_id"), 1L).otherwise(0L))
    top.groupBy(col("query_id"))
      .agg(max(when(col("rank") === 1, col("hit")).otherwise(0L)).as("h1"),
        max(col("hit")).as("h5"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("h1")).as("hits_at_1"), sum(col("h5")).as("hits_at_5"))
  }

  /** Sequence packing: documents are sharded by (lang, md5-bucket%8) —
    * NOT by lang alone: a low-cardinality shard key would cap the
    * window's parallelism at the language count, the same single-task
    * hazard as a global window. The md5 bucket is deterministic on both
    * engines (same construction as q_split), shards pack independently,
    * and the summary is per (lang, bucket, pack).
    */
  private def qPack(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        Sampling.hashBucket(col("doc_id"), 8).as("bucket"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tokens"))
    val packed = Pack.packSequences(d, Seq("lang", "bucket"), Seq("doc_id"), "n_tokens", 512)
    Pack.packSummary(packed, Seq("lang", "bucket"), "n_tokens")
      .orderBy(col("lang"), col("bucket"), col("pack_id"))
  }

  /** PII redaction over the corpus. The synthetic docs carry no PII, so
    * deterministic fake PII (an email + an IPv4 per tenth doc) is
    * injected identically on both engines; the oracle reproduces the
    * redaction byte-for-byte (patterns are Java-regex/RE2-portable by
    * construction, [[TextStats.redactPii]]).
    */
  private def qRedact(s: SparkSession, dir: String): DataFrame = {
    val injected = concat(col("text"),
      when(col("doc_id") % 10 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
        .otherwise(lit("")))
    t(s, dir, "documents")
      .select(col("lang"), injected.as("inj"))
      .withColumn("red", TextStats.redactPii(col("inj")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("red") =!= col("inj"), 1L).otherwise(0L)).as("n_redacted"),
        sum(length(col("inj")) - length(col("red"))).cast("long").as("chars_removed"))
      .orderBy(col("lang"))
  }

  /** Benchmark decontamination: a FIXED-size benchmark (every 50th doc
    * among ids < 500 — ten docs at any SF, like a real benchmark suite
    * that does not grow with the corpus, so the broadcast in
    * [[Dedup.crossCorpusOverlap]] stays sound at every scale); corpus
    * docs sharing ≥3 distinct 5-grams with one are flagged with the
    * shared count and contaminated fraction. (The benchmark docs
    * trivially flag against themselves — kept in, as the deterministic
    * sanity floor.)
    */
  private def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bench = docs.filter(col("doc_id") % 50 === 0 && col("doc_id") < 500)
      .select(col("doc_id").as("b_id"), col("text").as("b_text"))
    Dedup.crossCorpusOverlap(docs, "doc_id", "text", bench, "b_id", "b_text",
        shingleSize = 5, minShared = 3)
      .orderBy(col("doc_id"), col("bench_id"))
  }

  /** Per-language repetition profile (C4/Gopher-style quality rule):
    * docs over the 0.03 repetition threshold (chosen non-vacuous on the
    * synthetic corpus — 2-16 docs trip it per SF, so a broken predicate
    * cannot hide behind an all-zero column) and the exact corpus sum.
    */
  private def qRepetition(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), TextStats.repetitionScore(col("text"), 3).as("rep"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rep") > 0.03, 1L).otherwise(0L)).as("n_repetitive"),
        dsum(col("rep"), 9).as("sum_rep"))
      .orderBy(col("lang"))

  /** Overlapping token-window chunking (embedding/RAG prep): 40-token
    * windows advancing by 30 (10-token overlap), exploded to
    * (doc_id, chunk_idx, n_chunk_tokens) rows.
    */
  private def qChunk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextStats.chunkTokens(col("text"), 40, 10)).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        TextStats.tokenCount(col("chunk")).cast("long").as("n_chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Token-budget selection — keep the BEST documents (by quality score,
    * doc_id tiebreak) until a global token budget fills: quality ranking
    * plus an exact GLOBAL running token total via
    * [[graft.ops.Ids.withRunningTotals]] (range-partitioned prefix sums —
    * no single-partition window), cut at 10k tokens. The per-doc
    * cumulative emitted alongside the selection makes the check
    * prefix-exact, not just membership-exact: one document ranked or
    * summed differently anywhere shifts every later cumulative. The
    * oracle is a plain windowed sum over the same (quality DESC, doc_id)
    * order — DuckDB can afford the single-partition window at oracle
    * scale; the operator can't at 100 TB, which is the point.
    */
  private def qTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        TextStats.tokenCount(col("text")).cast("long").as("n_tok"),
        (-TextStats.qualityScore(col("text"))).as("__negq"))
    graft.ops.Ids.withRunningTotals(d, Seq("__negq", "doc_id"), Seq("n_tok"))
      .filter(col("n_tok_cum") <= 10000)
      .select(col("doc_id"), col("n_tok"), col("n_tok_cum").as("cum_tok"))
      .orderBy(col("doc_id"))
  }

  /** Boilerplate-line removal ([[graft.text.Boilerplate.stripBoilerplateLines]],
    * C4-style): the fixture text has no line structure, so each document's
    * tokens are first re-joined into 10-token lines (the same
    * synthesize-in-query pattern the codec queries use), then lines
    * appearing in ≥ 3 documents are stripped and the text reassembled in
    * original order. The md5 of the cleaned text is selection-exact: one
    * line kept, dropped, or reordered differently anywhere breaks it. The
    * oracle replays the chain with line STRINGS where the operator
    * aggregates 8-byte line hashes — so it also certifies the hash-first
    * shuffle loses nothing at this scale.
    */
  private def qBoilerplate(s: SparkSession, dir: String): DataFrame = {
    // pre-fold any literal newline into a space on BOTH sides: a token
    // containing the line separator would otherwise re-split inside the
    // operator while the oracle's line units stay 10-token groups —
    // a silent divergence armed by any future fixture with \n in text
    val lined = t(s, dir, "documents")
      .withColumn("w", split(translate(col("text"), "\n", " "), " "))
      .withColumn("lined", concat_ws("\n",
        transform(sequence(lit(0), (ceil(size(col("w")) / lit(10.0)) - 1).cast("int")),
          i => array_join(slice(col("w"), i * lit(10) + 1, lit(10)), " "))))
      .select(col("doc_id"), col("lined"))
    Boilerplate.stripBoilerplateLines(lined, "doc_id", "lined", "\n", minDocs = 3)
      .select(col("doc_id"), md5(col("lined")).as("sig"),
        col("n_kept"), col("n_dropped"))
      .orderBy(col("doc_id"))
  }

  private val bm25Terms = Seq("spark", "vector", "stream", "merge")

  /** BM25 keyword relevance ([[graft.text.Rank.bm25Scores]], rational
    * rank-equivalent idf): per-(doc, term) scores for a fixed query-term
    * set, folded to per-document totals with a conditional aggregation —
    * one `max(when(term = t))` column per term, summed left-to-right — so
    * double addition order is explicit and the DuckDB oracle reproduces
    * every bit. Top 20 documents by total relevance.
    */
  private def qBm25(s: SparkSession, dir: String): DataFrame = {
    val scores = Rank.bm25Scores(t(s, dir, "documents"), "doc_id", "text", bm25Terms)
    val termCols = bm25Terms.map(term =>
      max(when(col("term") === term, col("score"))).as(s"s_$term"))
    val total = bm25Terms.map(term => coalesce(col(s"s_$term"), lit(0.0))).reduce(_ + _)
    scores.groupBy(col("doc_id"))
      .agg(termCols.head, termCols.tail: _*)
      .withColumn("total", total)
      .orderBy(col("total").desc, col("doc_id"))
      .limit(20)
  }

  /** Vocabulary coverage ([[TextStats.oovRate]]): per-document OOV counts
    * against the corpus top-200 vocabulary.
    */
  private def qOov(s: SparkSession, dir: String): DataFrame =
    TextStats.oovRate(t(s, dir, "documents"), "doc_id", "text", 200)
      .orderBy(col("doc_id"))

  /** Text normalization ([[TextStats.normalizeText]]): every fifth doc is
    * dirtied (leading/trailing runs, upper case, tab, a control byte),
    * normalized, and summarized per language — length sums catch any
    * one-byte divergence from the oracle's RE2 rendition.
    */
  private def qNormalize(s: SparkSession, dir: String): DataFrame = {
    val messy = t(s, dir, "documents").withColumn("m",
      when(col("doc_id") % 5 === 0,
        concat(lit("  "), upper(col("text")), lit("\tX\u0001Y  ")))
        .otherwise(col("text")))
    messy.withColumn("norm", TextStats.normalizeText(col("m")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("norm"))).as("sum_len"),
        sum(when(col("norm") =!= col("text"), 1L).otherwise(0L)).as("n_changed"),
      )
      .orderBy(col("lang"))
  }

  /** TF-IDF keyword extraction ([[Rank.tfidfTopTerms]]): top-3 terms per
    * document (df over the full corpus, output scoped to the first 50
    * docs to keep the verified surface small).
    */
  private def qTfidf(s: SparkSession, dir: String): DataFrame =
    Rank.tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", 3)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))

  /** Bigram-LM quality scoring ([[graft.text.LangModel]]): train on 80%
    * of documents, score the held-out 20%. The oracled output is the
    * exact-integer sufficient statistics (bigram/unseen counts, model
    * count sums) that pin down tokenization + both model joins; the
    * ln-based `avg_logp` is a per-row monotone transform of them,
    * cross-libm-unsafe, and covered by LangModelSpec instead. Vocab is a
    * fixed constant so scoring stays one job (vocabSize() is a separate
    * count job a real pipeline runs once at train time).
    */
  private def qPerplexity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = LangModel.bigramCounts(docs.filter(col("doc_id") % 5 =!= 0), "text")
    LangModel.scoreDocs(docs.filter(col("doc_id") % 5 === 0), model,
        "doc_id", "text", vocab = 64)
      .select(col("doc_id"), col("n_bigrams"), col("n_unseen"),
        col("sum_c12"), col("sum_c1"))
      .orderBy(col("doc_id"))
  }

  /** Lexical diversity ([[graft.text.TextStats.simpsonDiversity]]):
    * type-token ratio + Gini-Simpson index per document — entirely
    * rational (no ln, unlike Shannon entropy), so the scores themselves
    * are oracled bit-exact. Narrow map, no shuffle.
    */
  private def qDiversity(s: SparkSession, dir: String): DataFrame = {
    val toks = TextStats.tokens(col("text"))
    t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        (size(array_distinct(toks)).cast("double") / size(toks).cast("double")).as("ttr"),
        TextStats.simpsonDiversity(col("text")).as("simpson"))
      .orderBy(col("doc_id"))
  }

  /** BPE merge-rule training ([[graft.text.Bpe.trainMerges]]): 8 rounds
    * over the corpus vocabulary, greedy-left merge semantics,
    * (count, left, right) total-order tiebreak. The oracle replays the
    * identical rounds as unrolled MATERIALIZED CTEs with a
    * `list_reduce` fold.
    */
  private def qBpe(s: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.trainMerges(t(s, dir, "documents"), "text", rounds = 8)
      .orderBy(col("round"))

  /** BPE ENCODE ([[graft.text.Bpe.encodeTokenCounts]]): train 8 merge
    * rules (the 8-row driver collect is the bounded rule table, same
    * posture as training itself), then tokenize every document —
    * distinct words fold once, documents join counts. The oracle
    * re-derives the SAME rules with the unrolled training CTEs and
    * replays the identical greedy-left fold over a word-keyed copy, so
    * rule derivation AND application verify together.
    */
  private def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val rules = graft.text.Bpe.trainMerges(t(s, dir, "documents"), "text", rounds = 8)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.text.Bpe.encodeTokenCounts(t(s, dir, "documents"), "doc_id", "text", rules)
      .orderBy(col("doc_id"))
  }

  /** The greedy-left BPE fold in SQL — THE single copy shared by the
    * training v-steps and the encode e-steps (string accumulator,
    * '|'-delimited; symbols are alphanumeric so the delimiter can't
    * collide). `lRef`/`rRef` name the LEFT-JOINed winner columns; the
    * IS NULL guard makes a dried-up round (empty w$r — no pairs left)
    * an IDENTITY fold instead of emptying the chain, matching
    * [[graft.text.Bpe.trainMerges]]'s early stop.
    */
  private def bpeFoldSql(lRef: String, rRef: String): String =
    s"""CASE WHEN $lRef IS NULL OR len(syms) = 1 THEN syms ELSE string_split(
       |    list_reduce(syms, (acc, x) -> CASE
       |      WHEN string_split(acc, '|')[-1] = $lRef AND x = $rRef
       |      THEN array_to_string(list_append(
       |        string_split(acc, '|')[1:len(string_split(acc, '|')) - 1],
       |        $lRef || $rRef), '|')
       |      ELSE acc || '|' || x END), '|') END""".stripMargin

  private val bpeVocabHead =
    """WITH v0 AS MATERIALIZED (
      |  SELECT string_split_regex(word, '') AS syms, count(*) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  GROUP BY word)""".stripMargin

  /** Per-round (pair counts, winner, fold-rewrite) training CTEs — ONE
    * copy shared by [[bpeOracleSql]] and [[bpeEncodeOracleSql]], so the
    * rule derivation the two gates verify can never drift apart.
    */
  private def bpeTrainingSteps(rounds: Int): Seq[String] = (1 to rounds).map { r =>
    s"""p$r AS MATERIALIZED (
       |  SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(cnt) AS BIGINT) AS n
       |  FROM v${r - 1} CROSS JOIN LATERAL
       |    (SELECT unnest(generate_series(1, len(syms) - 1)) AS i)
       |  GROUP BY 1, 2),
       |w$r AS MATERIALIZED (
       |  SELECT $r AS round, l, r, n FROM p$r ORDER BY n DESC, l, r LIMIT 1),
       |v$r AS MATERIALIZED (
       |  SELECT ${bpeFoldSql("w.l", "w.r")} AS syms, cnt
       |  FROM v${r - 1} LEFT JOIN w$r w ON TRUE)""".stripMargin
  }

  /** Unrolled BPE oracle: round r = pair counts from v(r-1), one winner
    * by (n DESC, l, r), fold-rewrite into v(r) — assembled from the
    * shared CTE builders above.
    */
  private def bpeOracleSql(rounds: Int): String = {
    val tail =
      s"""SELECT round, l AS left, r AS right, n FROM (
         |${(1 to rounds).map(r => s"  SELECT * FROM w$r").mkString(" UNION ALL\n")}
         |) ORDER BY round""".stripMargin
    (bpeVocabHead +: bpeTrainingSteps(rounds)).mkString(",\n") + "\n" + tail
  }

  /** Encode oracle: the training chain of [[bpeOracleSql]] derives the
    * same w1..wN winner rules, then an `e`-chain replays the identical
    * greedy-left fold over a WORD-KEYED copy of the distinct vocabulary
    * (the training chain's v-tables drop the word), and documents join
    * their words' token counts.
    */
  private def bpeEncodeOracleSql(rounds: Int): String = {
    val e0 =
      """e0 AS MATERIALIZED (
        |  SELECT word, string_split_regex(word, '') AS syms
        |  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE len(word) >= 1)""".stripMargin
    val esteps = (1 to rounds).map { r =>
      s"""e$r AS MATERIALIZED (
         |  SELECT word, ${bpeFoldSql("w.l", "w.r")} AS syms
         |  FROM e${r - 1} LEFT JOIN w$r w ON TRUE)""".stripMargin
    }
    val tail =
      s"""tok AS (SELECT word, len(syms) AS n_tok FROM e$rounds),
         |dwf AS (
         |  SELECT doc_id, word
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |  WHERE len(word) >= 1)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(len(word)) AS BIGINT) AS n_chars,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM dwf JOIN tok USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ((bpeVocabHead +: bpeTrainingSteps(rounds)) ++ (e0 +: esteps))
      .mkString(",\n") + ",\n" + tail
  }

  /** This family's slice of [[graft.SparkEntry.queries]]. */
  /** Corpus readability ([[TextStats.fleschReadingEase]]): per
    * (lang, source) exact integer word/sentence/vowel-group sums with
    * the Flesch score computed ONCE over the group totals — the
    * curation-time "is this slice too hard/too degenerate" screen.
    * Counts are dialect-portable regex extractions, so the oracle
    * replays them verbatim.
    */
  private def qReadability(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("lang"), col("source"),
      TextStats.alnumWordCount(col("text")).cast("long").as("__w"),
      TextStats.sentenceCount(col("text")).cast("long").as("__st"),
      TextStats.vowelGroupCount(col("text")).cast("long").as("__sy"))
    d.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).as("words"),
        sum(col("__st")).as("sentences"),
        sum(col("__sy")).as("syllables"))
      .select(col("lang"), col("source"), col("n_docs"),
        col("words"), col("sentences"), col("syllables"),
        round(TextStats.fleschReadingEase(
          col("words"), col("sentences"), col("syllables")), 6).as("flesch"))
      .orderBy(col("lang"), col("source"))
  }

  /** Shared by qKeywords and its oracle — the list is part of the
    * operator contract (phrase delimiters).
    */
  private val rakeStopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "are", "was", "were", "on", "for", "with", "as", "by", "at",
    "it", "this", "that", "be", "from")

  /** RAKE keyphrase extraction ([[Rank.rakeTopPhrase]]): the top-scoring
    * stopword-free phrase per document — deg/freq word scores in integer
    * nanos, phrase reassembly through sorted structs, every stage keyed
    * by doc_id.
    */
  private def qKeywords(s: SparkSession, dir: String): DataFrame =
    Rank.rakeTopPhrase(t(s, dir, "documents"), "doc_id", col("text"),
        rakeStopwords)
      .orderBy(col("doc_id"))

  /** Cross-source vocabulary overlap
    * ([[graft.ops.Drift.vocabularyOverlap]]): jaccard + directional
    * containment over distinct whitespace tokens for every source pair
    * — the set-level corpus comparison feeding dedup planning.
    */
  private def qVocabOverlap(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("source"), explode(TextStats.tokens(col("text"))).as("token"))
    graft.ops.Drift.vocabularyOverlap(toks, "source", "token")
      .orderBy(col("group_a"), col("group_b"))
  }

  /** Zipf-law fit ([[Rank.zipfFit]]): log-log frequency-rank slope per
    * language — natural text sits near −1; the r² collapse is the
    * generated/templated-text tell.
    */
  private def qZipf(s: SparkSession, dir: String): DataFrame =
    Rank.zipfFit(t(s, dir, "documents"), Seq("lang"), col("text"))
      .orderBy(col("lang"))

  /** Heaps' law ([[Rank.heapsLaw]]): vocabulary growth exponent over
    * md5-bucket "arrival" prefixes — q_zipf's companion curve and the
    * vocabulary-size forecast for a 100× corpus. No global ordering:
    * prefix doc counts and first-seen-bucket vocabulary counts are
    * conditional sums over two scans.
    */
  private def qHeaps(s: SparkSession, dir: String): DataFrame =
    Rank.heapsLaw(t(s, dir, "documents"), col("doc_id"), col("text"))

  /** Token burstiness ([[Rank.burstiness]]): the top-20 highest
    * variance-to-mean tokens — topical terms that flood the documents
    * they enter, versus Poisson-scattered function words. Reference-
    * corpus-free keyword surfacing off one (doc, token) count pass.
    */
  private def qBurstiness(s: SparkSession, dir: String): DataFrame =
    Rank.burstiness(t(s, dir, "documents"), col("doc_id"), col("text"))

  /** Exact-duplicate cluster histogram ([[Dedup.exactGroups]]): how is
    * duplication DISTRIBUTED — a few huge clusters (template spam) or
    * a long tail of pairs? Plus the docs_removable count per cluster
    * size, the dedup-savings ledger before anyone runs the dedup.
    */
  private def qDupHistogram(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(t(s, dir, "documents"), "text", "doc_id")
      .groupBy(col("n_dups").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("n_dups")).as("n_docs"))
      .withColumn("docs_removable", col("n_docs") - col("n_clusters"))
      .orderBy(col("cluster_size"))

  /** Conditional bigram entropy ([[Rank.conditionalEntropy]]): how
    * predictable is each source one token ahead — H(w₂|w₁) beside
    * H(w), with exp(H) as the effective next-token branching factor.
    * Template chrome collapses the conditional entropy long before it
    * dents the unigram number.
    */
  private def qCondEntropy(s: SparkSession, dir: String): DataFrame =
    Rank.conditionalEntropy(
        t(s, dir, "documents").filter(col("source").isNotNull && col("text").isNotNull),
        Seq("source"), col("text"))
      .orderBy(col("source"))

  /** Hill diversity profile ([[Rank.hillNumbers]]): effective
    * vocabulary sizes q0/q1/q2 per source — richness, exp(Shannon),
    * inverse Simpson. The top-heaviness read a curation mix needs
    * beside q_zipf's shape check; nano-quantized p·ln p terms over the
    * vocabulary-bounded count table.
    */
  private def qHill(s: SparkSession, dir: String): DataFrame =
    Rank.hillNumbers(t(s, dir, "documents").filter(col("source").isNotNull),
        Seq("source"), col("text"))
      .orderBy(col("source"))

  /** Script-mix audit ([[TextStats.charClassCount]]): per source, how
    * many characters sit in each major script, and how many documents
    * mix scripts (≥ 2 scripts each holding ≥ 10% of the doc's script
    * characters) — the crawl-hygiene signal for mislabeled languages,
    * template chrome, and mojibake. Exact integer counts end to end.
    */
  private def qScriptMix(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .filter(col("text").isNotNull && col("source").isNotNull)
    val classes = Seq(
      "__lat" -> "[A-Za-z]", "__cjk" -> "[\\u4e00-\\u9fff]",
      "__kana" -> "[\\u3040-\\u30ff]", "__cyr" -> "[\\u0400-\\u04ff]",
      "__dig" -> "[0-9]")
    val withC = d.select(col("source") +:
      classes.map { case (n, p) => TextStats.charClassCount(col("text"), p).as(n) }: _*)
    val scripts = Seq("__lat", "__cjk", "__kana", "__cyr")
    val tot = scripts.map(col).reduce(_ + _)
    val nScripts = scripts
      .map(c => when(col(c) * 10 >= tot && col(c) > 0, 1).otherwise(0))
      .reduce(_ + _)
    val mixed = when(tot > 0 && nScripts >= 2, 1L).otherwise(0L)
    withC.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__lat")).as("latin_chars"), sum(col("__cjk")).as("cjk_chars"),
        sum(col("__kana")).as("kana_chars"), sum(col("__cyr")).as("cyrillic_chars"),
        sum(col("__dig")).as("digit_chars"), sum(mixed).as("n_mixed"))
      .withColumn("mixed_frac",
        round(col("n_mixed").cast("double") / col("n_docs").cast("double"), 6))
      .orderBy(col("source"))
  }

  /** Linear quality-classifier inference ([[Classify.score]]): the
    * fastText-style post-heuristic curation stage — md5-bucketed word
    * uni+bigrams, exact micro-weight pooling, sigmoid. Weights come
    * from [[Classify.demoWeightsMicros]]'s closed form, which the
    * oracle regenerates bucket-for-bucket; scoring is one shuffle-free
    * per-row expression, so the plan is scan → project → sort only.
    */
  private def qClassify(s: SparkSession, dir: String): DataFrame = {
    val w = Classify.demoWeightsMicros(64)
    val d = t(s, dir, "documents")
    d.select(col("doc_id"),
        size(Classify.ngramFeatures(col("text"))).cast("long").as("n_features"),
        round(Classify.linearLogit(col("text"), w, biasMicros = -50000L), 6).as("logit"),
        Classify.score(col("text"), w, biasMicros = -50000L).as("score"))
      .withColumn("keep", col("score") >= 0.5)
      .orderBy(col("doc_id"))
  }

  /** Language confusion matrix: declared `lang` × [[TextStats.langId]]
    * heuristic prediction with per-cell counts — the eval view of
    * q_lang_id's marginal (which cells leak tells you WHERE the
    * heuristic fails, the first diagnostic before swapping in a
    * trained identifier). One (lang, pred) map-combined aggregation.
    */
  private def qLangConfusion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), TextStats.langId(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_pred"))

  /** Classifier ROC AUC ([[graft.ops.Stats.binaryAuc]] over
    * [[Classify.score]]): can the linear quality score separate
    * English documents from the rest? The eval number that must
    * accompany q_classify before anyone trusts its threshold —
    * computed as the exact tie-corrected Mann-Whitney U normalized,
    * so it replays bit-for-bit.
    */
  private def qAuc(s: SparkSession, dir: String): DataFrame = {
    val w = Classify.demoWeightsMicros(64)
    val scored = t(s, dir, "documents")
      .select(col("lang"), Classify.score(col("text"), w, biasMicros = -50000L).as("score"))
    graft.ops.Stats.binaryAuc(scored, col("lang") === "en", col("score"))
  }

  /** KMV distinct-vocabulary estimate ([[graft.ops.Kmv.kmvDistinct]]):
    * per-language distinct-token count from the 256 smallest md5-60bit
    * hashes, with the exact count and relative error riding the same
    * distinct layer — the sketch whose error the oracle replays
    * digit-for-digit (md5, not xxhash, so nothing here is rows-only).
    */
  private def qKmv(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("lang"), explode(TextStats.tokens(col("text"))).as("tok"))
    graft.ops.Kmv.kmvDistinct(toks, Seq("lang"), col("tok"), k = 256)
      .orderBy(col("lang"))
  }

  /** KMV pairwise vocabulary overlap ([[graft.ops.Kmv.kmvJaccard]]) vs
    * the exact [[graft.ops.Drift.vocabularyOverlap]] — the bounded-
    * sketch scale path for q_vocab_overlap's corpus-sized token
    * self-join, with the estimation error emitted per pair. At 100 TB
    * the exact column drops and the pair stage touches only k-row
    * sketches.
    */
  private def qKmvOverlap(s: SparkSession, dir: String): DataFrame = {
    // both consumers reduce to DISTINCT (source, token) first (the
    // sketch hashes distinct tokens; the exact overlap sets are
    // distinct by definition), so tokenize + distinct once and share —
    // vocabulary×sources-bounded, never the raw token stream
    val toks = t(s, dir, "documents")
      .select(col("source"), explode(TextStats.tokens(col("text"))).as("token"))
      .distinct().localCheckpoint()
    val est = graft.ops.Kmv.kmvJaccard(toks, "source", col("token"), k = 256)
    // toks IS the distinct materialized (group, token) table — skip the
    // redundant re-distinct + re-checkpoint inside the overlap op (r15)
    val exact = graft.ops.Drift.vocabularyOverlapPreDeduped(toks, "source", "token")
      .select(col("group_a"), col("group_b"), col("jaccard"))
    est.join(exact, Seq("group_a", "group_b"))
      .select(col("group_a"), col("group_b"), col("n_theta"), col("n_both"),
        col("jaccard_est"), col("jaccard"),
        round(abs(col("jaccard_est") - col("jaccard")), 6).as("abs_err"))
      .orderBy(col("group_a"), col("group_b"))
  }

  /** Shared by the classifier-eval queries: every document scored by
    * the demo linear model, labeled en-vs-rest.
    */
  private def scoredDocsRaw(s: SparkSession, dir: String): DataFrame = {
    val w = Classify.demoWeightsMicros(64)
    t(s, dir, "documents").select(col("doc_id"),
      (col("lang") === "en").as("y"),
      Classify.score(col("text"), w, biasMicros = -50000L).as("s"))
  }

  /** [[scoredDocsRaw]] materialized once — for the consumers whose
    * internal plans re-evaluate the scored frame across window/join
    * stages that ReuseExchange cannot share (calibration/stump/brier/
    * ks/pr_auc/lift measured 1.3-3.5s faster each with the 17-byte
    * (doc_id, y, s) proxy checkpointed; the single-aggregation
    * consumers mcc/bss/pr_table/conformal stay on the raw lineage,
    * where a checkpoint only adds a materialization job).
    */
  private def scoredDocs(s: SparkSession, dir: String): DataFrame =
    scoredDocsRaw(s, dir).localCheckpoint()

  /** Reliability table + ECE ([[graft.ops.Calibration.calibration]]):
    * does the classifier's 0.5 MEAN 50% English? — the calibration
    * check q_auc's ranking view cannot give (a perfectly-ranking score
    * can still be wildly miscalibrated). Gap nano-quantizes before the
    * bin-bounded ECE window.
    */
  private def qCalibration(s: SparkSession, dir: String): DataFrame =
    graft.ops.Calibration.calibration(scoredDocs(s, dir), col("y"), col("s"),
        nBins = 10)
      .orderBy(col("bin"))

  /** Isotonic recalibration ([[graft.ops.Calibration.isotonicCalibration]]):
    * the monotone PAV fit of the classifier's per-bin English rates —
    * what q_calibration DIAGNOSES, this repairs. Distributed bin
    * aggregation, bounded driver PAV with exact integer pools; the
    * oracle replays the fit through the minimax identity
    * max_i min_j avg(i..j) over the same bins.
    */
  private def qIsotonic(s: SparkSession, dir: String): DataFrame =
    graft.ops.Calibration.isotonicCalibration(scoredDocs(s, dir),
        col("y"), col("s"), nBins = 10)
      .orderBy(col("bin"))

  /** Split-conformal coverage audit
    * ([[graft.ops.Calibration.conformalSplit]]): calibrate the
    * classifier's nonconformity threshold q̂ at α = 0.1 on the
    * even-doc_id half and measure empirical prediction-set coverage on
    * the odd half — the distribution-free guarantee check that belongs
    * beside q_calibration's ECE. Rank k and q̂ are exact integers; the
    * quantile rides range-partitioned running totals, never a
    * whole-frame row window.
    */
  private def qConformal(s: SparkSession, dir: String): DataFrame = {
    val sd = scoredDocsRaw(s, dir)
    graft.ops.Calibration.conformalSplit(sd, col("y"), col("s"),
      col("doc_id") % 2 === 0, alphaMicro = 100000L)
  }

  /** TextRank keywords ([[graft.ops.Graph.pageRank]] over the
    * adjacent-token co-occurrence graph, both directions — Mihalcea &
    * Tarau's keyword variant): the 30 most central vocabulary words by
    * exact-integer PageRank, 4 iterations. The oracle replays the
    * identical truncating-div recurrence through unrolled CTEs, so the
    * ranks hash-match bit-for-bit; top-k is total-ordered by (rank,
    * word).
    */
  private def qTextrank(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents").select(TextStats.tokens(col("text")).as("tk"))
    val n1 = greatest(size(col("tk")) - 1, lit(0))
    val adj = toks
      .select(explode(zip_with(
        slice(col("tk"), lit(1), n1), slice(col("tk"), lit(2), n1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
    val edges = adj.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(adj.select(col("b").as("src"), col("a").as("dst")))
    graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 4)
      .orderBy(col("rank").desc, col("node")).limit(30)
  }

  /** Oracle for [[qTextrank]]: the adjacent-token edge build plus the
    * exact-integer PageRank recurrence unrolled into chained CTEs (the
    * q_pagerank oracle shape — DuckDB's recursive CTEs allow one
    * self-reference, the nodes-left-join needs two).
    */
  private def textrankOracleSql: String = {
    val base = "((1000000000000 * 15) // 100) // (SELECT n FROM cnt)"
    val iters = (1 to 4).map { i =>
      s"""pr$i AS (
         |  SELECT nd.node, $base + (85 * COALESCE(c.m, 0)) // 100 AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.rank // od.d) AS m
         |    FROM e JOIN pr${i - 1} p ON e.src = p.node JOIN od ON od.src = e.src
         |    GROUP BY e.dst) c ON nd.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH l AS (SELECT string_split(text, ' ') AS tk FROM documents),
       |tp AS (
       |  SELECT unnest(list_transform(range(1, len(tk)),
       |    i -> {'a': tk[i], 'b': tk[i + 1]})) AS p
       |  FROM l),
       |ad AS (SELECT p.a AS a, p.b AS b FROM tp WHERE p.a <> p.b),
       |bo AS (SELECT a AS src, b AS dst FROM ad
       |       UNION ALL SELECT b AS src, a AS dst FROM ad),
       |e AS (SELECT DISTINCT src, dst FROM bo),
       |nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
       |cnt AS (SELECT count(*) AS n FROM nodes),
       |od AS (SELECT src, count(*) AS d FROM e GROUP BY src),
       |pr0 AS (SELECT node, 1000000000000 // (SELECT n FROM cnt) AS rank FROM nodes),
       |$iters
       |SELECT node, CAST(rank AS BIGINT) AS rank FROM pr4
       |ORDER BY rank DESC, node LIMIT 30""".stripMargin
  }

  /** Fleiss' kappa ([[graft.ops.Stats.fleissKappa]]): three-rater
    * agreement on every document's language — the label, the
    * [[TextStats.langId]] heuristic, and the source-majority prior
    * (q_mcnemar's raters plus the ground truth, now scored for
    * agreement instead of against it). The multi-rater QA number
    * q_kappa's two-rater κ can't give.
    */
  /** The three language raters shared by q_fleiss / q_krippendorff:
    * the label, the [[TextStats.langId]] heuristic, and the
    * source-majority prior, joined onto every document.
    */
  private def ratedDocs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val counts = d.filter(col("lang").isNotNull)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("__cn"))
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("__cn").desc, col("lang"))
    val majority = counts.withColumn("__rn", row_number().over(W))
      .filter(col("__rn") === 1)
      .select(col("source"), col("lang").as("__maj"))
    d.join(broadcast(majority), Seq("source"))
  }

  private def qFleiss(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.fleissKappa(ratedDocs(s, dir), col("doc_id"),
      Seq(col("lang"), TextStats.langId(col("text")), col("__maj")))

  /** Krippendorff's alpha ([[graft.ops.Stats.krippendorffAlpha]]):
    * q_fleiss's three raters scored by expected-DISAGREEMENT
    * correction instead of marginal-agreement correction — the other
    * reliability number an annotation pipeline quotes, off the same
    * pooled coincidence counts.
    */
  private def qKrippendorff(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.krippendorffAlpha(ratedDocs(s, dir), col("doc_id"),
      Seq(col("lang"), TextStats.langId(col("text")), col("__maj")))

  /** Average precision ([[graft.ops.Stats.averagePrecision]]): the
    * PR-curve area for the linear quality classifier — q_auc's partner
    * that doesn't flatter imbalanced classes. Distinct-score threshold
    * sweep, nano-quantized ΔR·P steps.
    */
  private def qPrAuc(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.averagePrecision(scoredDocs(s, dir), col("y"), col("s"))

  /** Operating-point table ([[graft.ops.Stats.prAtThresholds]]):
    * precision/recall/F1 for the linear classifier at cutoffs
    * 0.1..0.9 — what q_pr_auc integrates, spelled out for whoever has
    * to pick the deployment threshold. One grand aggregation, exact
    * counts.
    */
  private def qPrTable(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.prAtThresholds(scoredDocsRaw(s, dir), col("y"), col("s"),
        (1 to 9).map(_ / 10.0))
      .orderBy(col("threshold"))

  /** Brier + Murphy decomposition
    * ([[graft.ops.Calibration.brierDecomposition]]): WHY is the
    * classifier's Brier score what it is — miscalibration
    * (reliability) or lack of separation (resolution)? The proper-
    * scoring companion to q_calibration on the same binned table.
    */
  private def qBrier(s: SparkSession, dir: String): DataFrame =
    graft.ops.Calibration.brierDecomposition(scoredDocs(s, dir),
      col("y"), col("s"), nBins = 10)

  /** Thresholded confusion readout
    * ([[graft.ops.Calibration.confusionStats]]) for the linear quality
    * classifier at the 0.5 cutoff: the deployment numbers — accuracy,
    * precision/recall/F1, and MCC, the one summary class imbalance
    * cannot game — once q_auc's ranking and q_calibration's
    * probabilities commit to a threshold. Integer micro cutoff, exact
    * cells, one aggregation.
    */
  private def qMcc(s: SparkSession, dir: String): DataFrame =
    graft.ops.Calibration.confusionStats(scoredDocsRaw(s, dir),
      col("y"), col("s"))

  /** Credit-scoring KS ([[graft.ops.Calibration.ksScore]]) of the
    * classifier: the single best separation between English and
    * non-English score distributions and WHERE it sits — the
    * one-threshold summary q_auc integrates away and q_stump re-derives
    * via impurity. Cleared-integer CDF gaps on the distinct-score
    * table.
    */
  private def qKsScore(s: SparkSession, dir: String): DataFrame =
    graft.ops.Calibration.ksScore(scoredDocs(s, dir), col("y"), col("s"))

  /** Brier skill score ([[graft.ops.Calibration.brierSkill]]): does the
    * classifier beat always-predict-the-base-rate — the go/no-go
    * number q_brier's absolute score cannot give alone. One exact
    * aggregation.
    */
  private def qBss(s: SparkSession, dir: String): DataFrame =
    graft.ops.Calibration.brierSkill(scoredDocsRaw(s, dir), col("y"), col("s"))

  /** Best Gini decision stump ([[graft.ops.Calibration.decisionStump]])
    * on the classifier score for lang=en: the single cut a tree
    * learner would greedily take — the interpretable floor any fancier
    * threshold (q_mcc's fixed 0.5, q_pr_table's sweep) should beat.
    * Distinct-score candidate scan, exact cumulative cells,
    * nano-quantized argmin.
    */
  private def qStump(s: SparkSession, dir: String): DataFrame =
    graft.ops.Calibration.decisionStump(scoredDocs(s, dir), col("y"), col("s"))

  /** Feature-hash collision audit for the classifier's 64-bucket
    * space: distinct n-gram features, occupied buckets, max bucket
    * load, and the collision rate — the capacity check run BEFORE
    * trusting q_classify's weights (a saturated table aliases unrelated
    * features). One vocabulary-keyed distinct + a 64-row rollup.
    */
  private def qHashCollisions(s: SparkSession, dir: String): DataFrame = {
    val feats = t(s, dir, "documents").filter(col("text").isNotNull)
      .select(explode(Classify.ngramFeatures(col("text"))).as("f"))
      .distinct()
    val perBucket = feats
      .select(Classify.featureBucket(col("f"), 64, "clf").as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("load"))
    perBucket.agg(
        sum(col("load")).as("n_features"),
        count(lit(1)).as("n_buckets_used"),
        max(col("load")).as("max_load"))
      .select(col("n_features"), lit(64L).as("dim"), col("n_buckets_used"),
        col("max_load"),
        round(col("n_features").cast("double") / lit(64.0), 6).as("avg_load"),
        when(col("n_features") > 0,
          round((col("n_features") - col("n_buckets_used")).cast("double")
            / col("n_features").cast("double"), 6)).as("collision_rate"))
  }

  /** Rényi-2 collision diversity
    * ([[graft.text.TextStats.renyiDiversity]]) per source: the
    * effective vocabulary N²/Σc² — how many equally-common tokens each
    * source is WORTH once template repetition is priced in (q_richness
    * counts distinct types; this discounts the ones that dominate).
    * One vocabulary shuffle, integer-arg logs.
    */
  private def qRenyi(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .filter(col("source").isNotNull && col("text").isNotNull)
      .select(col("source"),
        explode(TextStats.tokens(col("text"))).as("token"))
    TextStats.renyiDiversity(toks, Seq("source"), col("token"))
      .orderBy(col("source"))
  }

  /** Yule's K repeat rate per source ([[graft.text.TextStats.yuleK]]):
    * the size-invariant vocabulary-concentration number beside
    * q_renyi's effective vocabulary — high K flags formulaic or
    * generated text; the hapax count rides along. All-BIGINT output
    * (K in exact integral-division micro units).
    */
  private def qYule(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .filter(col("source").isNotNull && col("text").isNotNull)
      .select(col("source"),
        explode(TextStats.tokens(col("text"))).as("token"))
    TextStats.yuleK(toks, Seq("source"), col("token"))
      .orderBy(col("source"))
  }

  /** Burrows' Delta ([[graft.text.TextStats.burrowsDelta]]) between
    * sources over the corpus's top-50 words: the stylometric register
    * distance (authorship attribution's workhorse) read as a
    * source-drift screen — which feeds write most alike? K²-bounded
    * pair table, all-BIGINT nano output.
    */
  private def qBurrows(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .filter(col("source").isNotNull && col("text").isNotNull)
      .select(col("source"),
        explode(TextStats.tokens(col("text"))).as("token"))
    TextStats.burrowsDelta(toks, col("source"), col("token"), topM = 50)
  }

  /** Tokenizer fertility per language: BPE-ish subwords per whitespace
    * word and characters per subword — the "how expensive is this
    * language for my tokenizer?" table (high fertility = wasted
    * context window) that sits beside q_bpe's trained merges. Exact
    * integer count sums, one aggregation. Ratios emit as INTEGER
    * micro-units (round-half-up of num*1e6/den via exact integral
    * division on decimal products).
    *
    * r13 root cause of the r10-r12 driver-red streak: the oracle
    * re-emitted the CTE's `subwords`/`words` columns raw, and DuckDB's
    * SUM(BIGINT) has type HUGEINT (int128) — local fetchall() coerces
    * int128 to Python int (so every local compare was bit-exact), but
    * the driver's canonicalization is type-sensitive there. A
    * registry-wide type scan found HUGEINT final columns in EXACTLY the
    * three driver-red rows (here, q_scene_cuts, q_sq8_recall) and
    * nowhere else. Fix: CAST both to BIGINT; tools/compare_oracle.py
    * now hard-fails any oracle emitting int128/unsigned finals.
    */
  private def qFertility(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .filter(col("text").isNotNull && col("lang").isNotNull)
    d.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(TextStats.subwordCount(col("text")).cast("long")).as("subwords"),
        sum(TextStats.tokenCount(col("text")).cast("long")).as("words"),
        sum(length(col("text")).cast("long")).as("chars"))
      .select(col("lang"), col("n_docs"), col("subwords"), col("words"),
        when(col("words") > 0,
          expr("(cast(subwords as decimal(38,0)) * 2000000 + words) div " +
            "(cast(words as decimal(38,0)) * 2)").cast("long"))
          .as("fertility_micros"),
        when(col("subwords") > 0,
          expr("(cast(chars as decimal(38,0)) * 2000000 + subwords) div " +
            "(cast(subwords as decimal(38,0)) * 2)").cast("long"))
          .as("chars_per_subword_micros"))
      .orderBy(col("lang"))
  }

  /** Gopher-rule quality funnel ([[graft.text.TextStats.gopherReport]]):
    * per published heuristic rule (Rae et al. 2021), how many documents
    * pass and fail, plus the full-conjunction `all` row — the "which
    * filter costs me the most data?" table read before committing
    * thresholds, beside q_doc_quality's per-doc composite. Every
    * verdict is an integer cross-multiplication; one aggregation.
    */
  private def qGopher(s: SparkSession, dir: String): DataFrame =
    TextStats.gopherReport(t(s, dir, "documents"), col("text"))

  /** NDCG@10 ([[graft.ops.Calibration.ndcgAtK]]) of the classifier
    * ranking per source: if a curation pipeline takes each source's
    * top-10 by score, how close is that list to the ideal
    * English-first ordering — the position-discounted readout q_auc's
    * whole-ranking view washes out. Integer-ln discount terms,
    * doc_id tie-break, ≤10-row ideal prefix per source.
    */
  private def qNdcg(s: SparkSession, dir: String): DataFrame = {
    val w = Classify.demoWeightsMicros(64)
    val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
      (col("lang") === "en").as("y"),
      Classify.score(col("text"), w, biasMicros = -50000L).as("s"))
    graft.ops.Calibration.ndcgAtK(d, Seq("source"), col("y"), col("s"),
        k = 10, tieBreak = col("doc_id"))
      .orderBy(col("source"))
  }

  /** Group fairness audit ([[graft.ops.Calibration.groupFairness]]) of
    * the quality classifier's keep/drop decision per source: selection
    * rate, TPR, FPR, precision — does "keep if score ≥ 0.5" starve any
    * source of its share of the training mix? The decision is the
    * ALL-INTEGER margin test ([[Classify.selectedAtHalf]]): Σw ≥
    * −bias·n, so the selection set itself is oracle-exact (no 6-dp
    * score boundary), and every rate emits via integral-divide micro
    * quantization.
    */
  private def qFairness(s: SparkSession, dir: String): DataFrame = {
    val w = Classify.demoWeightsMicros(64)
    val d = t(s, dir, "documents")
      .filter(col("text").isNotNull && col("lang").isNotNull)
      .select(col("source"), (col("lang") === "en").as("y"),
        Classify.selectedAtHalf(col("text"), w, biasMicros = -50000L).as("sel"))
    graft.ops.Calibration.groupFairness(d, Seq("source"), col("y"), col("sel"))
      .orderBy(col("source"))
  }

  /** Top-k vocabulary coverage ([[graft.text.Rank.vocabCoverage]]): the
    * fraction of corpus tokens the 100/1000/5000 most frequent types
    * cover — the 1 − OOV-mass curve a vocab-size decision reads, where
    * q_zipf only implies it. TakeOrdered top-k, never a whole-vocab
    * single-partition sort; coverage via integral-divide micro emit.
    */
  private def qVocabCoverage(s: SparkSession, dir: String): DataFrame =
    graft.text.Rank.vocabCoverage(
      t(s, dir, "documents").filter(col("text").isNotNull),
      col("text"), Seq(100, 1000, 5000))

  /** Mean cross-entropy ([[graft.ops.Calibration.logLoss]]) of the
    * same classifier: the proper scoring rule q_brier bounds and
    * training actually optimizes — confident wrong answers cost
    * without limit. Micro-clamped probabilities, nano-quantized
    * per-row terms, one aggregation.
    */
  private def qLogLoss(s: SparkSession, dir: String): DataFrame =
    graft.ops.Calibration.logLoss(scoredDocs(s, dir), col("y"), col("s"))

  /** Lin's CCC ([[graft.ops.Stats.linCcc]]): do character count and
    * (6×) token count AGREE as document-size raters — not merely
    * correlate? CCC docks the scale/location bias Pearson forgives;
    * the method-comparison number for interchangeable size metrics.
    */
  private def qCcc(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").filter(col("text").isNotNull)
    graft.ops.Stats.linCcc(d,
      length(col("text")).cast("double"),
      (size(split(col("text"), " ")) * 6).cast("double"))
  }

  /** Decile lift/gain ([[graft.ops.Calibration.lift]]): how much
    * English does the top score-decile concentrate — the selection-
    * budget view of the same score, tiled by exact quantile thresholds
    * (never a global row sort). The scored frame localCheckpoints
    * (q_curate's inter-stage handoff) because the cutpoint and
    * bucketing branches would otherwise each re-run the md5-heavy
    * classifier (measured 6.0s → checkpointed, r9).
    */
  private def qLift(s: SparkSession, dir: String): DataFrame =
    graft.ops.Calibration.lift(scoredDocs(s, dir), // checkpointed there
        col("y"), col("s"), nTiles = 10)
      .orderBy(col("tile"))

  /** Multinomial Naive Bayes confusion
    * ([[graft.text.NaiveBayes.confusion]]): train a language model on
    * the corpus's own labels in one (token, class) aggregation, score
    * every document through the postings join, and read the
    * resubstitution confusion matrix — a TRAINED classifier whose
    * training, smoothing, scoring and argmax all replay in the oracle
    * (integer-argument lns, nano-quantized terms, max-struct ties).
    */
  private def qNb(s: SparkSession, dir: String): DataFrame =
    NaiveBayes.confusion(t(s, dir, "documents"), "doc_id",
        col("lang"), col("text"))
      .orderBy(col("label"), col("predicted"))

  /** Vocabulary richness ([[Rank.vocabularyRichness]]): Chao1 unseen-
    * type estimate and Good-Turing coverage per language — how much
    * more crawl would grow the vocabulary, the corpus-planning number
    * beside q_zipf's shape check.
    */
  private def qRichness(s: SparkSession, dir: String): DataFrame =
    Rank.vocabularyRichness(t(s, dir, "documents"), Seq("lang"), col("text"))
      .orderBy(col("lang"))

  /** Moving-average type-token ratio
    * ([[graft.text.TextStats.mattr]]): length-robust lexical diversity
    * per document over 20-token sliding windows — the curation-filter
    * feature raw TTR fakes on long docs; exact distinct counts per
    * window start, doc-local keys throughout.
    */
  private def qMattr(s: SparkSession, dir: String): DataFrame =
    graft.text.TextStats.mattr(t(s, dir, "documents"), "doc_id", "text",
        window = 20)
      .orderBy(col("doc_id"))

  /** Naive Bayes HOLDOUT confusion: train on even doc_ids, score the
    * odd half — the honest generalization view beside q_nb's
    * resubstitution matrix, and the query that exercises
    * [[graft.text.NaiveBayes.scoreWith]]'s unseen-token Laplace path
    * for real (test tokens absent from the training vocabulary ride
    * the per-class default likelihood).
    */
  private def qNbHoldout(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val model = NaiveBayes.trainModel(d.filter(col("doc_id") % 2 === 0),
      col("lang"), col("text"))
    val test = d.filter(col("doc_id") % 2 === 1)
    test.select(col("doc_id"), col("lang").as("label"))
      .join(NaiveBayes.scoreWith(model, test, "doc_id", col("text")), Seq("doc_id"))
      .groupBy(col("label"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("predicted"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mattr" -> (qMattr _),
    "q_classify" -> (qClassify _),
    "q_nb" -> (qNb _),
    "q_nb_holdout" -> (qNbHoldout _),
    "q_richness" -> (qRichness _),
    "q_auc" -> (qAuc _),
    "q_calibration" -> (qCalibration _),
    "q_lift" -> (qLift _),
    "q_kmv" -> (qKmv _),
    "q_kmv_overlap" -> (qKmvOverlap _),
    "q_lang_confusion" -> (qLangConfusion _),
    "q_keywords" -> (qKeywords _),
    "q_readability" -> (qReadability _),
    "q_vocab_overlap" -> (qVocabOverlap _),
    "q_zipf" -> (qZipf _),
    "q_heaps" -> (qHeaps _),
    "q_burstiness" -> (qBurstiness _),
    "q_script_mix" -> (qScriptMix _),
    "q_hill" -> (qHill _),
    "q_dup_histogram" -> (qDupHistogram _),
    "q_cond_entropy" -> (qCondEntropy _),
    "q_text_stats" -> (qTextStats _),
    "q_vocab" -> (qVocab _),
    "q_doc_quality" -> (qDocQuality _),
    "q_lang_id" -> (qLangId _),
    "q_kappa" -> (qKappa _),
    "q_gwet" -> (qGwet _),
    "q_mcnemar" -> (qMcnemar _),
    "q_isotonic" -> (qIsotonic _),
    "q_conformal" -> (qConformal _),
    "q_textrank" -> (qTextrank _),
    "q_fleiss" -> (qFleiss _),
    "q_krippendorff" -> (qKrippendorff _),
    "q_pr_auc" -> (qPrAuc _),
    "q_pr_table" -> (qPrTable _),
    "q_brier" -> (qBrier _),
    "q_mcc" -> (qMcc _),
    "q_log_loss" -> (qLogLoss _),
    "q_ndcg" -> (qNdcg _),
    "q_fairness" -> (qFairness _),
    "q_vocab_coverage" -> (qVocabCoverage _),
    "q_gopher" -> (qGopher _),
    "q_fertility" -> (qFertility _),
    "q_stump" -> (qStump _),
    "q_hash_collisions" -> (qHashCollisions _),
    "q_ks_score" -> (qKsScore _),
    "q_bss" -> (qBss _),
    "q_renyi" -> (qRenyi _),
    "q_yule" -> (qYule _),
    "q_burrows" -> (qBurrows _),
    "q_ccc" -> (qCcc _),
    "q_entropy" -> (qEntropy _),
    "q_pmi" -> (qPmi _),
    "q_dsir" -> (qDsir _),
    "q_pack" -> (qPack _),
    "q_redact" -> (qRedact _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_repetition" -> (qRepetition _),
    "q_chunk" -> (qChunk _),
    "q_boilerplate" -> (qBoilerplate _),
    "q_token_budget" -> (qTokenBudget _),
    "q_bm25" -> (qBm25 _),
    "q_retrieval_eval" -> (qRetrievalEval _),
    "q_oov" -> (qOov _),
    "q_normalize" -> (qNormalize _),
    "q_tfidf" -> (qTfidf _),
    "q_perplexity" -> (qPerplexity _),
    "q_diversity" -> (qDiversity _),
    "q_bpe" -> (qBpe _),
    "q_bpe_encode" -> (qBpeEncode _),
  )

  /** This family's slice of [[graft.SparkEntry.oracleSql]]. */
  private def keywordsOracleSql: String = {
    val stopList = rakeStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9\\s]+') AS fr
       |  FROM documents),
       |f AS (
       |  SELECT doc_id AS id, s.fi AS fi, s.frag AS frag FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(fr, (x, i) -> {'frag': x, 'fi': i})) AS s
       |    FROM d)),
       |toks AS (
       |  SELECT id, fi, u.pos AS pos, u.w AS w FROM (
       |    SELECT id, fi,
       |      unnest(list_transform(string_split_regex(frag, '\\s+'),
       |        (x, i) -> {'w': x, 'pos': i})) AS u
       |    FROM f)
       |  WHERE u.w <> ''),
       |seg AS (
       |  SELECT id, fi, pos, w, stop,
       |    SUM(CASE WHEN stop THEN 1 ELSE 0 END) OVER (PARTITION BY id
       |      ORDER BY fi, pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sr
       |  FROM (SELECT id, fi, pos, w, w IN ($stopList) AS stop FROM toks)),
       |kept AS (SELECT id, fi, pos, w, sr FROM seg WHERE NOT stop),
       |sc1 AS (
       |  SELECT id, fi, pos, w, sr,
       |    COUNT(*) OVER (PARTITION BY id, fi, sr) AS plen
       |  FROM kept),
       |sc AS (
       |  SELECT id, fi, pos, w, sr, plen,
       |    COUNT(*) OVER (PARTITION BY id, w) AS freq,
       |    SUM(plen) OVER (PARTITION BY id, w) AS deg
       |  FROM sc1),
       |phr AS (
       |  SELECT id, fi, sr, string_agg(w, ' ' ORDER BY pos) AS phrase,
       |    COUNT(*) AS n_words,
       |    SUM((1000000000 * deg) // freq) AS score
       |  FROM sc GROUP BY 1, 2, 3),
       |top AS (
       |  SELECT id, phrase, n_words, score,
       |    row_number() OVER (PARTITION BY id
       |      ORDER BY score DESC, phrase) AS rn
       |  FROM phr)
       |SELECT id AS doc_id, phrase, CAST(n_words AS BIGINT) AS n_words,
       |  CAST(score AS BIGINT) AS score_nanos
       |FROM top WHERE rn = 1 ORDER BY id""".stripMargin
  }

  /** DuckDB replay of [[Rank.heapsLaw]]: md5-bucket prefixes, two
    * conditional-count aggregates, log-log OLS over the checkpoint
    * table with the same nano-quantized ln terms.
    */
  private def heapsOracleSql(nCheckpoints: Int): String = {
    val bSize = 1 << 20
    val cuts = (1 to nCheckpoints).map(c => bSize >> (nCheckpoints - c))
    val ndCols = cuts.zipWithIndex.map { case (cut, i) =>
      s"SUM(CASE WHEN b < $cut THEN 1 ELSE 0 END) AS nd$i"
    }.mkString(",\n    ")
    val vCols = cuts.zipWithIndex.map { case (cut, i) =>
      s"SUM(CASE WHEN mb < $cut THEN 1 ELSE 0 END) AS v$i"
    }.mkString(",\n    ")
    val last = nCheckpoints - 1
    val unions = cuts.indices.map { i =>
      s"SELECT nd$last AS n_docs, v$last AS n_types, nd$i AS nd, v$i AS v FROM da, va"
    }.mkString("\n  UNION ALL ")
    s"""WITH d AS (
       |  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
       |      AS BIGINT) % $bSize AS b, text
       |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
       |da AS (
       |  SELECT $ndCols
       |  FROM d),
       |tk AS (
       |  SELECT b, w FROM (
       |    SELECT b, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
       |    FROM d)
       |  WHERE w <> ''),
       |tm AS (SELECT w, MIN(b) AS mb FROM tk GROUP BY 1),
       |va AS (
       |  SELECT $vCols
       |  FROM tm),
       |pts AS (
       |  $unions),
       |q AS (
       |  SELECT n_docs, n_types,
       |    CAST(round(ln(CAST(nd AS DOUBLE)) * 1000000000.0) AS BIGINT) AS x,
       |    CAST(round(ln(CAST(v AS DOUBLE)) * 1000000000.0) AS BIGINT) AS y
       |  FROM pts WHERE nd > 0 AND v > 0),
       |a AS (
       |  SELECT n_docs, n_types, COUNT(*) AS np,
       |    SUM(x) AS sx, SUM(y) AS sy,
       |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
       |    SUM(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM q GROUP BY 1, 2),
       |f AS (
       |  SELECT n_docs, n_types, np,
       |    CAST(np * sxy - sx * sy AS DOUBLE) AS num,
       |    CAST(np * sxx - sx * sx AS DOUBLE) AS dx,
       |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
       |  FROM a)
       |SELECT CAST(n_docs AS BIGINT) AS n_docs, CAST(n_types AS BIGINT) AS n_types,
       |  CAST(np AS BIGINT) AS n_points,
       |  CASE WHEN np >= 3 AND dx > 0.0 THEN round(num / dx, 6) END AS beta,
       |  CASE WHEN np >= 3 AND dx > 0.0 THEN
       |    round(exp((syd - num / dx * sxd) / CAST(np AS DOUBLE) / 1000000000.0), 6)
       |  END AS k_coef
       |FROM f""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q_mattr" ->
      """WITH t AS (
        |  SELECT doc_id, u.tok AS tok, u.i - 1 AS pos
        |  FROM (SELECT doc_id,
        |          unnest(list_transform(string_split(text, ' '),
        |            (x, i) -> {'tok': x, 'i': i})) AS u
        |        FROM documents)),
        |n AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY 1 HAVING COUNT(*) >= 20),
        |st AS (
        |  SELECT t.doc_id, t.tok,
        |    unnest(range(greatest(t.pos - 19, 0), least(t.pos, n.n - 20) + 1)) AS s
        |  FROM t JOIN n USING (doc_id)),
        |d AS (SELECT doc_id, s, COUNT(DISTINCT tok) AS dv FROM st GROUP BY 1, 2)
        |SELECT d.doc_id, CAST(n.n AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_windows,
        |  round(CAST(SUM(dv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 20.0, 6) AS mattr
        |FROM d JOIN n USING (doc_id) GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,
    "q_pr_auc" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT lang, round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    / 1000000.0 + (-0.05)))), 6) AS s
        |  FROM agg),
        |tg AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    CAST(round(s * 1000000.0) AS BIGINT) AS x
        |  FROM sc WHERE lang IS NOT NULL AND s IS NOT NULL),
        |bv AS (SELECT x, COUNT(*) AS nv, SUM(y) AS pv FROM tg GROUP BY 1),
        |cm AS (
        |  SELECT nv, pv,
        |    SUM(nv) OVER (ORDER BY x DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        |    SUM(pv) OVER (ORDER BY x DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
        |  FROM bv),
        |tt AS (SELECT SUM(nv) AS n, SUM(pv) AS p FROM cm),
        |tm AS (
        |  SELECT n, p,
        |    CASE WHEN p > 0 THEN
        |      CAST(round(CAST(pv AS DOUBLE) / CAST(p AS DOUBLE)
        |        * (CAST(cp AS DOUBLE) / CAST(ca AS DOUBLE))
        |        * 1000000000.0) AS BIGINT) END AS t
        |  FROM cm CROSS JOIN tt),
        |ag AS (SELECT n, p, SUM(t) AS ap FROM tm GROUP BY 1, 2)
        |SELECT CAST(p AS BIGINT) AS n_pos, CAST(n - p AS BIGINT) AS n_neg,
        |  CASE WHEN p > 0 THEN round(CAST(ap AS DOUBLE) / 1000000000.0, 6) END AS ap
        |FROM ag""".stripMargin,
    "q_pr_table" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT lang, round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    / 1000000.0 + (-0.05)))), 6) AS s
        |  FROM agg),
        |tg AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    CAST(round(s * 1000000.0) AS BIGINT) AS x
        |  FROM sc WHERE lang IS NOT NULL AND s IS NOT NULL),
        |ag AS (
        |  SELECT SUM(y) AS p,
        |    SUM(CASE WHEN x >= 100000 THEN 1 ELSE 0 END) AS pp1,
        |    SUM(CASE WHEN x >= 100000 AND y = 1 THEN 1 ELSE 0 END) AS tp1,
        |    SUM(CASE WHEN x >= 200000 THEN 1 ELSE 0 END) AS pp2,
        |    SUM(CASE WHEN x >= 200000 AND y = 1 THEN 1 ELSE 0 END) AS tp2,
        |    SUM(CASE WHEN x >= 300000 THEN 1 ELSE 0 END) AS pp3,
        |    SUM(CASE WHEN x >= 300000 AND y = 1 THEN 1 ELSE 0 END) AS tp3,
        |    SUM(CASE WHEN x >= 400000 THEN 1 ELSE 0 END) AS pp4,
        |    SUM(CASE WHEN x >= 400000 AND y = 1 THEN 1 ELSE 0 END) AS tp4,
        |    SUM(CASE WHEN x >= 500000 THEN 1 ELSE 0 END) AS pp5,
        |    SUM(CASE WHEN x >= 500000 AND y = 1 THEN 1 ELSE 0 END) AS tp5,
        |    SUM(CASE WHEN x >= 600000 THEN 1 ELSE 0 END) AS pp6,
        |    SUM(CASE WHEN x >= 600000 AND y = 1 THEN 1 ELSE 0 END) AS tp6,
        |    SUM(CASE WHEN x >= 700000 THEN 1 ELSE 0 END) AS pp7,
        |    SUM(CASE WHEN x >= 700000 AND y = 1 THEN 1 ELSE 0 END) AS tp7,
        |    SUM(CASE WHEN x >= 800000 THEN 1 ELSE 0 END) AS pp8,
        |    SUM(CASE WHEN x >= 800000 AND y = 1 THEN 1 ELSE 0 END) AS tp8,
        |    SUM(CASE WHEN x >= 900000 THEN 1 ELSE 0 END) AS pp9,
        |    SUM(CASE WHEN x >= 900000 AND y = 1 THEN 1 ELSE 0 END) AS tp9
        |  FROM tg),
        |u AS (
        |  SELECT 0.1 AS threshold, pp1 AS pp, tp1 AS tp, p FROM ag
        |  UNION ALL SELECT 0.2, pp2, tp2, p FROM ag
        |  UNION ALL SELECT 0.3, pp3, tp3, p FROM ag
        |  UNION ALL SELECT 0.4, pp4, tp4, p FROM ag
        |  UNION ALL SELECT 0.5, pp5, tp5, p FROM ag
        |  UNION ALL SELECT 0.6, pp6, tp6, p FROM ag
        |  UNION ALL SELECT 0.7, pp7, tp7, p FROM ag
        |  UNION ALL SELECT 0.8, pp8, tp8, p FROM ag
        |  UNION ALL SELECT 0.9, pp9, tp9, p FROM ag)
        |SELECT threshold, CAST(pp AS BIGINT) AS n_pred_pos, CAST(tp AS BIGINT) AS tp,
        |  CASE WHEN pp > 0 THEN
        |    round(CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE), 6) END AS "precision",
        |  CASE WHEN p > 0 THEN
        |    round(CAST(tp AS DOUBLE) / CAST(p AS DOUBLE), 6) END AS recall,
        |  CASE WHEN pp > 0 AND p > 0
        |      AND CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE)
        |        + CAST(tp AS DOUBLE) / CAST(p AS DOUBLE) > 0.0 THEN
        |    round(2.0 * (CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE))
        |        * (CAST(tp AS DOUBLE) / CAST(p AS DOUBLE))
        |      / (CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE)
        |        + CAST(tp AS DOUBLE) / CAST(p AS DOUBLE)), 6) END AS f1
        |FROM u ORDER BY threshold""".stripMargin,
    "q_brier" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT lang, round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    / 1000000.0 + (-0.05)))), 6) AS s
        |  FROM agg),
        |bb AS (
        |  SELECT LEAST(CAST(floor(s * 10) AS INTEGER), 9) AS b,
        |    CAST(round(s * 1000000.0) AS BIGINT) AS sq,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM sc WHERE lang IS NOT NULL AND s IS NOT NULL
        |    AND LEAST(CAST(floor(s * 10) AS INTEGER), 9) >= 0),
        |bn AS (
        |  SELECT b, COUNT(*) AS nb, SUM(sq) AS ss, SUM(y) AS sy,
        |    SUM(CAST(sq - y * 1000000 AS HUGEINT) * (sq - y * 1000000)) AS sd2
        |  FROM bb GROUP BY 1),
        |tt AS (SELECT COUNT(*) AS n_bins, SUM(nb) AS n, SUM(sy) AS yy,
        |  SUM(sd2) AS d2 FROM bn),
        |tm AS (
        |  SELECT n, n_bins, yy, d2,
        |    CAST(round(CAST(nb AS DOUBLE)
        |      * (CAST(ss AS DOUBLE) / CAST(nb AS DOUBLE) / 1000000.0
        |        - CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE))
        |      * (CAST(ss AS DOUBLE) / CAST(nb AS DOUBLE) / 1000000.0
        |        - CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE))
        |      * 1000000000.0) AS BIGINT) AS rel,
        |    CAST(round(CAST(nb AS DOUBLE)
        |      * (CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE)
        |        - CAST(yy AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sy AS DOUBLE) / CAST(nb AS DOUBLE)
        |        - CAST(yy AS DOUBLE) / CAST(n AS DOUBLE))
        |      * 1000000000.0) AS BIGINT) AS res
        |  FROM bn CROSS JOIN tt),
        |ag AS (SELECT n, n_bins, yy, d2, SUM(rel) AS rels, SUM(res) AS ress
        |  FROM tm GROUP BY 1, 2, 3, 4)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n_bins AS BIGINT) AS n_bins,
        |  round(CAST(d2 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000000.0, 6) AS brier,
        |  round(CAST(rels AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE), 6)
        |    AS reliability,
        |  round(CAST(ress AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE), 6)
        |    AS resolution,
        |  round((CAST(yy AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (1.0 - CAST(yy AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS uncertainty
        |FROM ag""".stripMargin,
    "q_mcc" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT lang, round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    / 1000000.0 + (-0.05)))), 6) AS s
        |  FROM agg),
        |b AS (
        |  SELECT lang = 'en' AS y, CAST(round(s * 1000000.0) AS BIGINT) AS sq
        |  FROM sc WHERE lang IS NOT NULL AND s IS NOT NULL),
        |ag AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN y AND sq >= 500000 THEN 1 ELSE 0 END) AS tp,
        |    SUM(CASE WHEN NOT y AND sq >= 500000 THEN 1 ELSE 0 END) AS fp,
        |    SUM(CASE WHEN y AND sq < 500000 THEN 1 ELSE 0 END) AS fn,
        |    SUM(CASE WHEN NOT y AND sq < 500000 THEN 1 ELSE 0 END) AS tn
        |  FROM b)
        |SELECT CAST(n AS BIGINT) AS n, CAST(tp AS BIGINT) AS tp,
        |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
        |  CAST(tn AS BIGINT) AS tn,
        |  CASE WHEN n > 0 THEN
        |    round((CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE)) / CAST(n AS DOUBLE), 6)
        |  END AS accuracy,
        |  CASE WHEN tp + fp > 0 THEN
        |    round(CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)), 6)
        |  END AS precision,
        |  CASE WHEN tp + fn > 0 THEN
        |    round(CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)), 6)
        |  END AS recall,
        |  CASE WHEN 2 * tp + fp + fn > 0 THEN
        |    round(2.0 * CAST(tp AS DOUBLE) / (2.0 * CAST(tp AS DOUBLE)
        |      + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE)), 6)
        |  END AS f1,
        |  CASE WHEN sqrt((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
        |      * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |      * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
        |      * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))) > 0.0 THEN
        |    round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
        |        - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
        |      / sqrt((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
        |        * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
        |        * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
        |        * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))), 6)
        |  END AS mcc
        |FROM ag""".stripMargin,
    "q_ks_score" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT lang, round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    / 1000000.0 + (-0.05)))), 6) AS s
        |  FROM agg),
        |b AS (
        |  SELECT lang = 'en' AS y, CAST(round(s * 1000000.0) AS BIGINT) AS sq
        |  FROM sc WHERE lang IS NOT NULL AND s IS NOT NULL),
        |cells AS (
        |  SELECT sq, SUM(CASE WHEN y THEN 1 ELSE 0 END) AS p,
        |    SUM(CASE WHEN y THEN 0 ELSE 1 END) AS q
        |  FROM b GROUP BY 1),
        |cum AS (
        |  SELECT sq, SUM(p) OVER w AS cp, SUM(q) OVER w AS cq
        |  FROM cells
        |  WINDOW w AS (ORDER BY sq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT SUM(p) AS pp, SUM(q) AS nn FROM cells),
        |dd AS (
        |  SELECT sq, abs(CAST(cp AS HUGEINT) * nn - CAST(cq AS HUGEINT) * pp) AS d,
        |    pp, nn
        |  FROM cum CROSS JOIN tot),
        |mx AS (SELECT MAX(d) AS md FROM dd),
        |th AS (SELECT MIN(sq) AS ts FROM dd JOIN mx ON dd.d = mx.md)
        |SELECT CAST(pp + nn AS BIGINT) AS n, CAST(pp AS BIGINT) AS n_pos,
        |  CASE WHEN pp > 0 AND nn > 0 THEN
        |    round(CAST(d AS DOUBLE) / (CAST(pp AS DOUBLE) * CAST(nn AS DOUBLE)), 6)
        |  END AS ks,
        |  CASE WHEN pp > 0 AND nn > 0 THEN
        |    round(CAST(dd.sq AS DOUBLE) / 1000000.0, 6) END AS threshold
        |FROM dd JOIN th ON dd.sq = th.ts""".stripMargin,
    "q_bss" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT lang, round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    / 1000000.0 + (-0.05)))), 6) AS s
        |  FROM agg),
        |b AS (
        |  SELECT lang = 'en' AS y, CAST(round(s * 1000000.0) AS BIGINT) AS sq
        |  FROM sc WHERE lang IS NOT NULL AND s IS NOT NULL),
        |a AS (
        |  SELECT COUNT(*) AS n, SUM(CASE WHEN y THEN 1 ELSE 0 END) AS np,
        |    SUM(CAST(sq - CASE WHEN y THEN 1000000 ELSE 0 END AS HUGEINT)
        |      * (sq - CASE WHEN y THEN 1000000 ELSE 0 END)) AS se2
        |  FROM b)
        |SELECT CAST(n AS BIGINT) AS n, CAST(np AS BIGINT) AS n_pos,
        |  CASE WHEN n > 0 THEN
        |    round(CAST(se2 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000000.0, 6)
        |  END AS brier,
        |  CASE WHEN n > 0 AND np > 0 AND np < n THEN
        |    round((CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (1.0 - CAST(np AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |  END AS brier_ref,
        |  CASE WHEN n > 0 AND np > 0 AND np < n THEN
        |    round(1.0 - CAST(se2 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000000.0
        |      / ((CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (1.0 - CAST(np AS DOUBLE) / CAST(n AS DOUBLE))), 6)
        |  END AS bss
        |FROM a""".stripMargin,
    "q_stump" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT lang, round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    / 1000000.0 + (-0.05)))), 6) AS s
        |  FROM agg),
        |b AS (
        |  SELECT lang = 'en' AS y, CAST(round(s * 1000000.0) AS BIGINT) AS sq
        |  FROM sc WHERE lang IS NOT NULL AND s IS NOT NULL),
        |cells AS (
        |  SELECT sq, COUNT(*) AS n, SUM(CASE WHEN y THEN 1 ELSE 0 END) AS p
        |  FROM b GROUP BY 1),
        |cum AS (
        |  SELECT sq, n, p,
        |    COALESCE(SUM(n) OVER (ORDER BY sq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nl,
        |    COALESCE(SUM(p) OVER (ORDER BY sq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pl
        |  FROM cells),
        |tot AS (SELECT SUM(n) AS nt, SUM(p) AS pt FROM cells),
        |imp AS (
        |  SELECT sq, nl, pl, nt, pt,
        |    CAST(round((CASE WHEN nl > 0 THEN
        |      (CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE)
        |        - CAST(pl AS DOUBLE) * CAST(pl AS DOUBLE)
        |        - CAST(nl - pl AS DOUBLE) * CAST(nl - pl AS DOUBLE))
        |      / (CAST(nl AS DOUBLE) * CAST(nt AS DOUBLE)) ELSE 0.0 END
        |      + CASE WHEN nt - nl > 0 THEN
        |      (CAST(nt - nl AS DOUBLE) * CAST(nt - nl AS DOUBLE)
        |        - CAST(pt - pl AS DOUBLE) * CAST(pt - pl AS DOUBLE)
        |        - CAST((nt - nl) - (pt - pl) AS DOUBLE)
        |          * CAST((nt - nl) - (pt - pl) AS DOUBLE))
        |      / (CAST(nt - nl AS DOUBLE) * CAST(nt AS DOUBLE)) ELSE 0.0 END)
        |      * 1000000000.0) AS BIGINT) AS inano
        |  FROM cum CROSS JOIN tot),
        |mn AS (SELECT MIN(inano) AS mi FROM imp),
        |th AS (SELECT MIN(sq) AS ts FROM imp JOIN mn ON imp.inano = mn.mi)
        |SELECT CAST(nt AS BIGINT) AS n, CAST(pt AS BIGINT) AS n_pos,
        |  round(CAST(sq AS DOUBLE) / 1000000.0, 6) AS threshold,
        |  round(CAST(inano AS DOUBLE) / 1000000000.0, 6) AS impurity,
        |  CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left
        |FROM imp JOIN th ON imp.sq = th.ts""".stripMargin,
    "q_hash_collisions" ->
      """WITH l AS (
        |  SELECT string_split(text, ' ') AS tk FROM documents
        |  WHERE text IS NOT NULL),
        |fe AS (
        |  SELECT unnest(list_concat(tk,
        |    list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |feats AS (SELECT DISTINCT f FROM fe),
        |bk AS (
        |  SELECT CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64 AS b
        |  FROM feats),
        |pb AS (SELECT b, COUNT(*) AS load FROM bk GROUP BY 1),
        |a AS (SELECT SUM(load) AS nf, COUNT(*) AS nb, MAX(load) AS ml FROM pb)
        |SELECT CAST(nf AS BIGINT) AS n_features, CAST(64 AS BIGINT) AS dim,
        |  CAST(nb AS BIGINT) AS n_buckets_used, CAST(ml AS BIGINT) AS max_load,
        |  round(CAST(nf AS DOUBLE) / 64.0, 6) AS avg_load,
        |  CASE WHEN nf > 0 THEN
        |    round(CAST(nf - nb AS DOUBLE) / CAST(nf AS DOUBLE), 6)
        |  END AS collision_rate
        |FROM a""".stripMargin,
    "q_burrows" ->
      """WITH tok AS (
        |  SELECT source AS g, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
        |c AS (
        |  SELECT g, t, COUNT(*) AS c FROM tok
        |  WHERE t IS NOT NULL GROUP BY 1, 2),
        |top AS (
        |  SELECT t FROM (SELECT t, SUM(c) AS tot FROM c GROUP BY 1)
        |  ORDER BY tot DESC, t LIMIT 50),
        |tt AS (SELECT g, SUM(c) AS tl FROM c GROUP BY 1),
        |grid AS (
        |  SELECT tt.g, top.t,
        |    COALESCE((CAST(c.c AS HUGEINT) * 2000000 + tt.tl)
        |      // (CAST(tt.tl AS HUGEINT) * 2), 0) AS f
        |  FROM tt CROSS JOIN top
        |  LEFT JOIN c ON c.g = tt.g AND c.t = top.t),
        |m AS (
        |  SELECT t, COUNT(*) AS k, SUM(CAST(f AS HUGEINT)) AS s1,
        |    SUM(CAST(f AS HUGEINT) * f) AS s2
        |  FROM grid GROUP BY 1),
        |mm AS (
        |  SELECT t, CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS muv,
        |    sqrt((CAST(s2 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
        |      / (CAST(k AS DOUBLE) - 1.0)) AS sdv
        |  FROM m),
        |z AS (
        |  SELECT grid.g, grid.t,
        |    CASE WHEN sdv > 0.0 THEN (CAST(f AS DOUBLE) - muv) / sdv
        |         ELSE 0.0 END AS z
        |  FROM grid JOIN mm ON mm.t = grid.t),
        |p AS (
        |  SELECT a.g AS ga, b.g AS gb,
        |    SUM(CAST(round(abs(a.z - b.z) * 1000000000.0) AS HUGEINT)) AS ds
        |  FROM z a JOIN z b ON a.t = b.t AND a.g < b.g GROUP BY 1, 2)
        |SELECT ga AS group_a, gb AS group_b,
        |  CAST((ds * 2 + 50) // 100 AS BIGINT) AS delta_nano
        |FROM p ORDER BY group_a, group_b""".stripMargin,
    "q_yule" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
        |c AS (
        |  SELECT source, t, COUNT(*) AS c FROM tok
        |  WHERE t IS NOT NULL GROUP BY 1, 2),
        |a AS (
        |  SELECT source, SUM(c) AS n, COUNT(*) AS v,
        |    SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax,
        |    SUM(CAST(c AS HUGEINT) * c) AS c2
        |  FROM c GROUP BY 1)
        |SELECT source, CAST(n AS BIGINT) AS n_tokens, CAST(v AS BIGINT) AS n_vocab,
        |  CAST(hapax AS BIGINT) AS n_hapax,
        |  CASE WHEN n > 0 THEN
        |    CAST(((c2 - n) * 20000000000 + CAST(n AS HUGEINT) * n)
        |      // (CAST(n AS HUGEINT) * n * 2) AS BIGINT)
        |  END AS yule_k_micros
        |FROM a ORDER BY source""".stripMargin,
    "q_renyi" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
        |c AS (
        |  SELECT source, t, COUNT(*) AS c FROM tok
        |  WHERE t IS NOT NULL GROUP BY 1, 2),
        |a AS (
        |  SELECT source, SUM(c) AS n, COUNT(*) AS v,
        |    SUM(CAST(c AS HUGEINT) * c) AS c2
        |  FROM c GROUP BY 1)
        |SELECT source, CAST(n AS BIGINT) AS n_tokens, CAST(v AS BIGINT) AS n_vocab,
        |  CASE WHEN n > 0 AND c2 > 0 THEN
        |    round(ln(CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |      - ln(CAST(c2 AS DOUBLE)), 6) END AS renyi2,
        |  CASE WHEN n > 0 AND c2 > 0 THEN
        |    round(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      / CAST(c2 AS DOUBLE), 6) END AS eff_vocab
        |FROM a ORDER BY source""".stripMargin,
    "q_fertility" ->
      """WITH d AS (
        |  SELECT lang, text FROM documents
        |  WHERE text IS NOT NULL AND lang IS NOT NULL),
        |a AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    SUM(CAST(len(regexp_extract_all(text,
        |      '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT)) AS subwords,
        |    SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS words,
        |    SUM(CAST(length(text) AS BIGINT)) AS chars
        |  FROM d GROUP BY 1)
        |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(subwords AS BIGINT) AS subwords, CAST(words AS BIGINT) AS words,
        |  CASE WHEN words > 0 THEN
        |    CAST((CAST(subwords AS HUGEINT) * 2000000 + words)
        |      // (CAST(words AS HUGEINT) * 2) AS BIGINT)
        |  END AS fertility_micros,
        |  CASE WHEN subwords > 0 THEN
        |    CAST((CAST(chars AS HUGEINT) * 2000000 + subwords)
        |      // (CAST(subwords AS HUGEINT) * 2) AS BIGINT)
        |  END AS chars_per_subword_micros
        |FROM a ORDER BY lang""".stripMargin,
    "q_gopher" ->
      """WITH d AS (
        |  SELECT text, string_split(text, ' ') AS tk,
        |    string_split(text, chr(10)) AS ln
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (
        |  SELECT
        |    CAST(len(tk) AS BIGINT) AS nw,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars,
        |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hashes,
        |    CAST((length(text) - length(replace(text, '...', ''))) // 3
        |      AS BIGINT) AS ells,
        |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS BIGINT) AS alphaw,
        |    CAST(len(ln) AS BIGINT) AS nl,
        |    CAST(len(list_filter(ln, x -> starts_with(x, '-')
        |      OR starts_with(x, '*') OR starts_with(x, '•'))) AS BIGINT) AS bl,
        |    CAST(len(list_filter(ln, x -> ends_with(x, '...'))) AS BIGINT) AS el,
        |    (CASE WHEN list_contains(tk, 'the') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(tk, 'be') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(tk, 'to') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(tk, 'of') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(tk, 'and') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(tk, 'that') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(tk, 'have') THEN 1 ELSE 0 END
        |      + CASE WHEN list_contains(tk, 'with') THEN 1 ELSE 0 END) AS stopw
        |  FROM d),
        |r AS (
        |  SELECT
        |    nw >= 50 AND nw <= 100000 AS r_words,
        |    chars >= 3 * nw AND chars <= 10 * nw AS r_word_len,
        |    10 * (hashes + ells) <= nw AS r_symbol,
        |    5 * alphaw >= 4 * nw AS r_alpha,
        |    10 * bl <= 9 * nl AS r_bullet,
        |    10 * el <= 3 * nl AS r_ellipsis,
        |    stopw >= 2 AS r_stop
        |  FROM f),
        |a AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN r_words THEN 1 ELSE 0 END) AS p_words,
        |    SUM(CASE WHEN r_word_len THEN 1 ELSE 0 END) AS p_word_len,
        |    SUM(CASE WHEN r_symbol THEN 1 ELSE 0 END) AS p_symbol,
        |    SUM(CASE WHEN r_alpha THEN 1 ELSE 0 END) AS p_alpha,
        |    SUM(CASE WHEN r_bullet THEN 1 ELSE 0 END) AS p_bullet,
        |    SUM(CASE WHEN r_ellipsis THEN 1 ELSE 0 END) AS p_ellipsis,
        |    SUM(CASE WHEN r_stop THEN 1 ELSE 0 END) AS p_stop,
        |    SUM(CASE WHEN r_words AND r_word_len AND r_symbol AND r_alpha
        |      AND r_bullet AND r_ellipsis AND r_stop THEN 1 ELSE 0 END) AS p_all
        |  FROM r)
        |SELECT rule, CAST(n_pass AS BIGINT) AS n_pass,
        |  CAST(n_fail AS BIGINT) AS n_fail FROM (
        |  SELECT 'words' AS rule, p_words AS n_pass, n - p_words AS n_fail FROM a
        |  UNION ALL SELECT 'word_len', p_word_len, n - p_word_len FROM a
        |  UNION ALL SELECT 'symbol', p_symbol, n - p_symbol FROM a
        |  UNION ALL SELECT 'alpha', p_alpha, n - p_alpha FROM a
        |  UNION ALL SELECT 'bullet', p_bullet, n - p_bullet FROM a
        |  UNION ALL SELECT 'ellipsis', p_ellipsis, n - p_ellipsis FROM a
        |  UNION ALL SELECT 'stop', p_stop, n - p_stop FROM a
        |  UNION ALL SELECT 'all', p_all, n - p_all FROM a) q
        |ORDER BY rule""".stripMargin,
    "q_ndcg" ->
      """WITH l AS (
        |  SELECT doc_id, source, lang, string_split(text, ' ') AS tk
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, source, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, source, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (
        |  SELECT doc_id, source, lang, SUM(wm) AS sm, COUNT(*) AS n
        |  FROM wt GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT doc_id, source, lang = 'en' AS y,
        |    round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |      / 1000000.0 + (-0.05)))), 6) AS s
        |  FROM agg WHERE lang IS NOT NULL),
        |b AS (SELECT source, doc_id, y, s FROM sc WHERE s IS NOT NULL),
        |rk AS (
        |  SELECT source, y,
        |    row_number() OVER (PARTITION BY source ORDER BY s DESC, doc_id) AS rk
        |  FROM b),
        |g AS (
        |  SELECT source, COUNT(*) AS n,
        |    SUM(CASE WHEN y THEN 1 ELSE 0 END) AS n_rel,
        |    SUM(CASE WHEN rk <= 10 AND y THEN
        |      CAST(round(1000000000.0 * ln(2.0)
        |        / ln(CAST(rk + 1 AS DOUBLE))) AS BIGINT) ELSE 0 END) AS dcg
        |  FROM rk GROUP BY 1),
        |ideal AS (
        |  SELECT source,
        |    SUM(CAST(round(1000000000.0 * ln(2.0)
        |      / ln(CAST(i + 1 AS DOUBLE))) AS BIGINT)) AS idcg
        |  FROM (SELECT source,
        |          unnest(range(1, CAST(LEAST(10, n_rel) + 1 AS BIGINT))) AS i
        |        FROM g WHERE n_rel > 0) q
        |  GROUP BY 1)
        |SELECT g.source, CAST(n AS BIGINT) AS n, CAST(n_rel AS BIGINT) AS n_rel,
        |  round(CAST(dcg AS DOUBLE) / 1000000000.0, 6) AS dcg,
        |  round(CAST(idcg AS DOUBLE) / 1000000000.0, 6) AS idcg,
        |  CASE WHEN idcg > 0 THEN
        |    round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) END AS ndcg
        |FROM g LEFT JOIN ideal ON g.source = ideal.source
        |ORDER BY g.source""".stripMargin,
    "q_log_loss" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT lang, round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    / 1000000.0 + (-0.05)))), 6) AS s
        |  FROM agg),
        |b AS (
        |  SELECT lang = 'en' AS y,
        |    LEAST(GREATEST(CAST(round(s * 1000000.0) AS BIGINT), 1), 999999) AS sq
        |  FROM sc WHERE lang IS NOT NULL AND s IS NOT NULL),
        |t AS (
        |  SELECT y, CAST(round(-(CASE WHEN y THEN ln(CAST(sq AS DOUBLE) / 1000000.0)
        |    ELSE ln(CAST(1000000 - sq AS DOUBLE) / 1000000.0) END)
        |    * 1000000000.0) AS BIGINT) AS term
        |  FROM b)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CASE WHEN COUNT(*) > 0 THEN
        |    round(CAST(SUM(term) AS DOUBLE) / 1000000000.0
        |      / CAST(COUNT(*) AS DOUBLE), 6)
        |  END AS log_loss
        |FROM t""".stripMargin,
    "q_ccc" ->
      """WITH v AS (
        |  SELECT CAST(length(text) AS BIGINT) * 1000000 AS x,
        |    CAST(len(string_split(text, ' ')) * 6 AS BIGINT) * 1000000 AS y
        |  FROM documents WHERE text IS NOT NULL),
        |ag AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM v),
        |m AS (
        |  SELECT n,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS mx,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS my,
        |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 1000000000000.0 AS vx,
        |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 1000000000000.0 AS vy,
        |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / 1000000000000.0 AS cxy
        |  FROM ag)
        |SELECT CAST(n AS BIGINT) AS n, round(mx, 6) AS mean_x,
        |  round(my, 6) AS mean_y,
        |  CASE WHEN n >= 2 AND vx > 0.0 AND vy > 0.0 THEN
        |    round(cxy / sqrt(vx * vy), 6) END AS pearson_r,
        |  CASE WHEN n >= 2 AND vx > 0.0 AND vy > 0.0 THEN
        |    round(2.0 * cxy / (vx + vy + (mx - my) * (mx - my)), 6) END AS ccc
        |FROM m""".stripMargin,
    "q_conformal" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    LEAST(GREATEST(CAST(round(round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE)
        |      / CAST(n AS DOUBLE) / 1000000.0 + (-0.05)))), 6) * 1000000.0) AS BIGINT),
        |      0), 1000000) AS sq
        |  FROM agg),
        |ncs AS (
        |  SELECT doc_id % 2 = 0 AS is_cal,
        |    CASE WHEN y = 1 THEN 1000000 - sq ELSE sq END AS ncf
        |  FROM sc),
        |calr AS (SELECT ncf FROM ncs WHERE is_cal),
        |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS ncal,
        |  CAST(((COUNT(*) + 1) * 900000 + 999999) // 1000000 AS BIGINT) AS k
        |  FROM calr),
        |bv AS (SELECT ncf, COUNT(*) AS n_v FROM calr GROUP BY 1),
        |cum AS (SELECT ncf, SUM(n_v) OVER (ORDER BY ncf
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc FROM bv),
        |q AS (SELECT CAST(COALESCE(MIN(ncf), 1000000) AS BIGINT) AS qhat
        |  FROM cum, kk WHERE cumc >= k)
        |SELECT (SELECT ncal FROM kk) AS n_cal,
        |  CAST(COUNT(*) AS BIGINT) AS n_test,
        |  (SELECT k FROM kk) AS k,
        |  (SELECT qhat FROM q) AS qhat_micro,
        |  CASE WHEN COUNT(*) > 0 THEN
        |    round(CAST(SUM(CASE WHEN ncf <= (SELECT qhat FROM q) THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) END AS coverage
        |FROM ncs WHERE NOT is_cal""".stripMargin,
    "q_textrank" -> textrankOracleSql,
    "q_isotonic" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |      / 1000000.0 + (-0.05)))), 6) AS s
        |  FROM agg),
        |bb AS (
        |  SELECT LEAST(CAST(floor(s * 10) AS INTEGER), 9) AS bin, y
        |  FROM sc WHERE s IS NOT NULL
        |    AND LEAST(CAST(floor(s * 10) AS INTEGER), 9) >= 0),
        |g AS (SELECT bin, COUNT(*) AS n, SUM(y) AS np FROM bb GROUP BY 1),
        |pre AS (
        |  SELECT bin, n, np,
        |    SUM(n) OVER (ORDER BY bin) AS cn,
        |    SUM(np) OVER (ORDER BY bin) AS cp
        |  FROM g),
        |mm AS (
        |  SELECT b.bin AS bin, pi.bin AS i,
        |    MIN(CAST(pj.cp - (pi.cp - pi.np) AS DOUBLE)
        |      / CAST(pj.cn - (pi.cn - pi.n) AS DOUBLE)) AS mn
        |  FROM g b
        |  JOIN pre pi ON pi.bin <= b.bin
        |  JOIN pre pj ON pj.bin >= b.bin
        |  GROUP BY 1, 2),
        |io AS (SELECT bin, MAX(mn) AS iso FROM mm GROUP BY 1)
        |SELECT g.bin, CAST(g.n AS BIGINT) AS n, CAST(g.np AS BIGINT) AS n_pos,
        |  round(CAST(g.np AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS frac_pos,
        |  round(io.iso, 6) AS iso
        |FROM g JOIN io ON g.bin = io.bin ORDER BY g.bin""".stripMargin,
    "q_gwet" ->
      """WITH pred AS (
        |  SELECT lang AS a,
        |    CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |         WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
        |         WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
        |         WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
        |         ELSE 'unknown' END AS b
        |  FROM documents WHERE lang IS NOT NULL),
        |cells AS (SELECT a, b, COUNT(*) AS n FROM pred GROUP BY 1, 2),
        |tot AS (
        |  SELECT SUM(n) AS nn,
        |    SUM(CASE WHEN a = b THEN n ELSE 0 END) AS agree
        |  FROM cells),
        |rm AS (SELECT a AS cat, SUM(n) AS ra FROM cells GROUP BY 1),
        |cm AS (SELECT b AS cat, SUM(n) AS cb FROM cells GROUP BY 1),
        |mg AS (
        |  SELECT COALESCE(rm.cat, cm.cat) AS cat, ra, cb
        |  FROM rm FULL OUTER JOIN cm ON rm.cat = cm.cat),
        |pt AS (
        |  SELECT COUNT(*) AS kk,
        |    SUM(CAST(round((CAST(COALESCE(ra, 0) + COALESCE(cb, 0) AS DOUBLE)
        |        / (2.0 * CAST(nn AS DOUBLE)))
        |      * (1.0 - CAST(COALESCE(ra, 0) + COALESCE(cb, 0) AS DOUBLE)
        |        / (2.0 * CAST(nn AS DOUBLE)))
        |      * 1000000000.0) AS BIGINT)) AS ptt
        |  FROM mg, tot)
        |SELECT CAST(nn AS BIGINT) AS n,
        |  round(CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS po,
        |  CASE WHEN kk >= 2 THEN
        |    round(CAST(ptt AS DOUBLE) / 1000000000.0
        |      / CAST(kk - 1 AS DOUBLE), 6) END AS pe_gamma,
        |  CASE WHEN kk >= 2 AND CAST(ptt AS DOUBLE) / 1000000000.0
        |      / CAST(kk - 1 AS DOUBLE) <> 1.0 THEN
        |    round((CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE)
        |        - CAST(ptt AS DOUBLE) / 1000000000.0 / CAST(kk - 1 AS DOUBLE))
        |      / (1.0 - CAST(ptt AS DOUBLE) / 1000000000.0
        |        / CAST(kk - 1 AS DOUBLE)), 6) END AS ac1
        |FROM tot, pt""".stripMargin,
    "q_krippendorff" ->
      """WITH cnt AS (
        |  SELECT source, lang, COUNT(*) AS cn FROM documents
        |  WHERE lang IS NOT NULL GROUP BY 1, 2),
        |maj AS (
        |  SELECT source, lang AS maj FROM (
        |    SELECT source, lang,
        |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY cn DESC, lang) AS rn
        |    FROM cnt) t
        |  WHERE rn = 1),
        |pred AS (
        |  SELECT d.doc_id AS id, d.lang AS r0,
        |    CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |         WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
        |         WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
        |         WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
        |         ELSE 'unknown' END AS r1,
        |    m.maj AS r2
        |  FROM documents d JOIN maj m ON d.source = m.source
        |  WHERE d.doc_id IS NOT NULL AND d.lang IS NOT NULL),
        |cells AS (
        |  SELECT id, c, COUNT(*) AS n FROM (
        |    SELECT id, unnest([r0, r1, r2]) AS c FROM pred) t
        |  GROUP BY 1, 2),
        |per AS (SELECT id, SUM(n * (n - 1)) AS au FROM cells GROUP BY 1),
        |ia AS (SELECT COUNT(*) AS ni, SUM(au) AS a FROM per),
        |ct AS (SELECT c, SUM(n) AS t FROM cells GROUP BY 1),
        |cb AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1)) AS b FROM ct),
        |fin AS (
        |  SELECT ni,
        |    1.0 - CAST(a AS DOUBLE)
        |      / (2.0 * (CAST(ni AS DOUBLE) * 3.0)) AS dob,
        |    1.0 - CAST(b AS DOUBLE)
        |      / ((CAST(ni AS DOUBLE) * 3.0)
        |        * ((CAST(ni AS DOUBLE) * 3.0) - 1.0)) AS dex
        |  FROM ia, cb)
        |SELECT CAST(ni AS BIGINT) AS n_items, 3 AS n_raters,
        |  round(dob, 6) AS d_o, round(dex, 6) AS d_e,
        |  CASE WHEN dex <> 0.0 THEN round(1.0 - dob / dex, 6) END AS alpha
        |FROM fin""".stripMargin,
    "q_fleiss" ->
      """WITH cnt AS (
        |  SELECT source, lang, COUNT(*) AS cn FROM documents
        |  WHERE lang IS NOT NULL GROUP BY 1, 2),
        |maj AS (
        |  SELECT source, lang AS maj FROM (
        |    SELECT source, lang,
        |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY cn DESC, lang) AS rn
        |    FROM cnt) t
        |  WHERE rn = 1),
        |pred AS (
        |  SELECT d.doc_id AS id, d.lang AS r0,
        |    CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |         WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
        |         WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
        |         WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
        |         ELSE 'unknown' END AS r1,
        |    m.maj AS r2
        |  FROM documents d JOIN maj m ON d.source = m.source
        |  WHERE d.doc_id IS NOT NULL AND d.lang IS NOT NULL),
        |cells AS (
        |  SELECT id, c, COUNT(*) AS n FROM (
        |    SELECT id, unnest([r0, r1, r2]) AS c FROM pred) t
        |  GROUP BY 1, 2),
        |per AS (SELECT id, SUM(n * n) - 3 AS num FROM cells GROUP BY 1),
        |ia AS (SELECT COUNT(*) AS ni, SUM(num) AS sn FROM per),
        |ct AS (SELECT c, SUM(n) AS t FROM cells GROUP BY 1),
        |pe AS (
        |  SELECT ni, sn,
        |    SUM(CAST(round((CAST(t AS DOUBLE) / CAST(ni * 3 AS DOUBLE))
        |      * (CAST(t AS DOUBLE) / CAST(ni * 3 AS DOUBLE)) * 1e9) AS BIGINT))
        |      AS spe
        |  FROM ct, ia GROUP BY 1, 2)
        |SELECT CAST(ni AS BIGINT) AS n_items, 3 AS n_raters,
        |  round(CAST(sn AS DOUBLE) / CAST(ni * 6 AS DOUBLE), 6) AS p_bar,
        |  round(CAST(spe AS DOUBLE) / 1e9, 6) AS p_e,
        |  CASE WHEN 1.0 - CAST(spe AS DOUBLE) / 1e9 <> 0.0 THEN
        |    round((CAST(sn AS DOUBLE) / CAST(ni * 6 AS DOUBLE)
        |        - CAST(spe AS DOUBLE) / 1e9)
        |      / (1.0 - CAST(spe AS DOUBLE) / 1e9), 6) END AS kappa
        |FROM pe""".stripMargin,
    "q_mcnemar" ->
      """WITH cnt AS (
        |  SELECT source, lang, COUNT(*) AS cn FROM documents
        |  WHERE lang IS NOT NULL GROUP BY 1, 2),
        |maj AS (
        |  SELECT source, lang AS maj FROM (
        |    SELECT source, lang,
        |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY cn DESC, lang) AS rn
        |    FROM cnt) t
        |  WHERE rn = 1),
        |pred AS (
        |  SELECT
        |    (CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |          WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
        |          WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
        |          WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
        |          ELSE 'unknown' END = d.lang) AS a,
        |    (m.maj = d.lang) AS b
        |  FROM documents d JOIN maj m ON d.source = m.source),
        |f AS (SELECT a, b FROM pred WHERE a IS NOT NULL AND b IS NOT NULL),
        |ag AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS nb,
        |    SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS nao,
        |    SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS nbo,
        |    SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS nn
        |  FROM f)
        |SELECT CAST(n AS BIGINT) AS n, CAST(nb AS BIGINT) AS n_both,
        |  CAST(nao AS BIGINT) AS n_a_only, CAST(nbo AS BIGINT) AS n_b_only,
        |  CAST(nn AS BIGINT) AS n_neither,
        |  CASE WHEN nao + nbo > 0 THEN
        |    round(greatest(abs(CAST(nao AS DOUBLE) - CAST(nbo AS DOUBLE)) - 1.0, 0.0)
        |      * greatest(abs(CAST(nao AS DOUBLE) - CAST(nbo AS DOUBLE)) - 1.0, 0.0)
        |      / (CAST(nao AS DOUBLE) + CAST(nbo AS DOUBLE)), 6) END AS chi2,
        |  CASE WHEN nao + nbo > 0 THEN
        |    round(greatest(abs(CAST(nao AS DOUBLE) - CAST(nbo AS DOUBLE)) - 1.0, 0.0)
        |      * greatest(abs(CAST(nao AS DOUBLE) - CAST(nbo AS DOUBLE)) - 1.0, 0.0)
        |      / (CAST(nao AS DOUBLE) + CAST(nbo AS DOUBLE)), 6) > 3.841459
        |    END AS reject
        |FROM ag""".stripMargin,
    "q_classify" ->
      """WITH l AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, len(tk) + len(tk) - 1 AS nf,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, nf,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (
        |  SELECT doc_id, nf, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |z AS (
        |  SELECT doc_id, nf,
        |    CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 + (-0.05) AS zz
        |  FROM agg)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_features,
        |  round(zz, 6) AS logit,
        |  round(1.0 / (1.0 + exp(-zz)), 6) AS score,
        |  (round(1.0 / (1.0 + exp(-zz)), 6) >= 0.5) AS keep
        |FROM z ORDER BY doc_id""".stripMargin,
    "q_vocab_overlap" ->
      """WITH d AS (
        |  SELECT DISTINCT g, tk FROM (
        |    SELECT source AS g, unnest(string_split(text, ' ')) AS tk
        |    FROM documents)
        |  WHERE tk IS NOT NULL),
        |s AS (SELECT g, COUNT(*) AS n FROM d GROUP BY 1),
        |i AS (
        |  SELECT a.g AS ga, b.g AS gb, COUNT(*) AS c
        |  FROM d a JOIN d b ON a.tk = b.tk AND a.g < b.g
        |  GROUP BY 1, 2)
        |SELECT ga AS group_a, gb AS group_b,
        |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
        |  CAST(c AS BIGINT) AS n_common,
        |  round(CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE), 6) AS jaccard,
        |  round(CAST(c AS DOUBLE) / CAST(sa.n AS DOUBLE), 6) AS containment_a,
        |  round(CAST(c AS DOUBLE) / CAST(sb.n AS DOUBLE), 6) AS containment_b
        |FROM i JOIN s sa ON sa.g = ga JOIN s sb ON sb.g = gb
        |ORDER BY ga, gb""".stripMargin,
    "q_heaps" -> heapsOracleSql(12),
    "q_dup_histogram" ->
      """WITH g AS (SELECT md5(text) AS f, COUNT(*) AS n FROM documents GROUP BY 1)
        |SELECT n AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |  CAST(SUM(n) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) - COUNT(*) AS BIGINT) AS docs_removable
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cond_entropy" ->
      """WITH l AS (
        |  SELECT source, string_split(text, ' ') AS tk FROM documents
        |  WHERE source IS NOT NULL AND text IS NOT NULL),
        |bg AS (
        |  SELECT source, unnest(list_transform(range(1, len(tk)),
        |    i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS p
        |  FROM l),
        |cells AS (
        |  SELECT source, p.w1 AS w1, p.w2 AS w2, COUNT(*) AS c12
        |  FROM bg GROUP BY 1, 2, 3),
        |ext AS (
        |  SELECT source, c12,
        |    SUM(c12) OVER (PARTITION BY source, w1) AS c1,
        |    SUM(c12) OVER (PARTITION BY source) AS nn,
        |    ROW_NUMBER() OVER (PARTITION BY source, w1 ORDER BY w2) AS rn
        |  FROM cells),
        |tm AS (
        |  SELECT source, c12,
        |    CAST(round(CAST(c12 AS DOUBLE) / CAST(nn AS DOUBLE)
        |      * ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
        |      * 1000000000.0) AS BIGINT) AS tc,
        |    CASE WHEN rn = 1 THEN
        |      CAST(round(CAST(c1 AS DOUBLE) / CAST(nn AS DOUBLE)
        |        * ln(CAST(c1 AS DOUBLE) / CAST(nn AS DOUBLE))
        |        * 1000000000.0) AS BIGINT) END AS tu
        |  FROM ext),
        |ag AS (
        |  SELECT source, SUM(c12) AS nb, SUM(tu) AS hu, SUM(tc) AS hc
        |  FROM tm GROUP BY 1)
        |SELECT source, CAST(nb AS BIGINT) AS n_bigrams,
        |  round(-(CAST(hu AS DOUBLE) / 1000000000.0), 6) AS h_unigram,
        |  round(-(CAST(hc AS DOUBLE) / 1000000000.0), 6) AS h_cond,
        |  round(exp(-(CAST(hc AS DOUBLE) / 1000000000.0)), 6) AS ppl_cond
        |FROM ag ORDER BY source""".stripMargin,
    "q_hill" ->
      """WITH tk AS (
        |  SELECT source, w FROM (
        |    SELECT source, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
        |    FROM documents WHERE source IS NOT NULL)
        |  WHERE w <> ''),
        |f AS (SELECT source, w, COUNT(*) AS ff FROM tk GROUP BY 1, 2),
        |t AS (
        |  SELECT source, COUNT(*) AS nt, SUM(ff) AS ntok,
        |    SUM(CAST(ff AS HUGEINT) * ff) AS f2
        |  FROM f GROUP BY 1),
        |h AS (
        |  SELECT f.source,
        |    SUM(CAST(round(CAST(ff AS DOUBLE) / CAST(ntok AS DOUBLE)
        |      * ln(CAST(ff AS DOUBLE) / CAST(ntok AS DOUBLE))
        |      * 1000000000.0) AS BIGINT)) AS hs
        |  FROM f JOIN t ON f.source = t.source GROUP BY 1)
        |SELECT t.source, CAST(ntok AS BIGINT) AS n_tokens,
        |  CAST(nt AS BIGINT) AS n_types,
        |  round(-(CAST(hs AS DOUBLE) / 1000000000.0), 6) AS shannon,
        |  round(exp(-(CAST(hs AS DOUBLE) / 1000000000.0)), 6) AS hill1,
        |  round(CAST(ntok AS DOUBLE) * CAST(ntok AS DOUBLE)
        |    / CAST(f2 AS DOUBLE), 6) AS hill2
        |FROM t JOIN h ON t.source = h.source ORDER BY t.source""".stripMargin,
    "q_burstiness" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |nn AS (SELECT COUNT(*) AS n FROM d),
        |tk AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
        |    FROM d)
        |  WHERE w <> ''),
        |pd AS (SELECT doc_id, w, COUNT(*) AS c FROM tk GROUP BY 1, 2),
        |t AS (
        |  SELECT w, COUNT(*) AS ndocs, SUM(c) AS sc,
        |    SUM(CAST(c AS HUGEINT) * c) AS sc2
        |  FROM pd GROUP BY 1 HAVING COUNT(*) >= 5),
        |v AS (
        |  SELECT w, ndocs, sc,
        |    CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    CASE WHEN n >= 2 THEN
        |      ((CAST(sc2 AS DOUBLE)
        |          - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - 1.0))
        |      / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) END AS vm
        |  FROM t CROSS JOIN nn)
        |SELECT w AS token, CAST(ndocs AS BIGINT) AS n_docs,
        |  CAST(sc AS BIGINT) AS total_count,
        |  round(mean, 6) AS mean_per_doc, round(vm, 6) AS vmr
        |FROM v ORDER BY vm DESC, token LIMIT 20""".stripMargin,
    "q_script_mix" ->
      """WITH c AS (
        |  SELECT source,
        |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS lat,
        |    length(text) - length(regexp_replace(text,
        |      '[\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
        |    length(text) - length(regexp_replace(text,
        |      '[\x{3040}-\x{30ff}]', '', 'g')) AS kana,
        |    length(text) - length(regexp_replace(text,
        |      '[\x{0400}-\x{04ff}]', '', 'g')) AS cyr,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS dig
        |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        |m AS (
        |  SELECT source, lat, cjk, kana, cyr, dig,
        |    lat + cjk + kana + cyr AS tot,
        |    (CASE WHEN lat * 10 >= lat + cjk + kana + cyr AND lat > 0
        |        THEN 1 ELSE 0 END
        |     + CASE WHEN cjk * 10 >= lat + cjk + kana + cyr AND cjk > 0
        |        THEN 1 ELSE 0 END
        |     + CASE WHEN kana * 10 >= lat + cjk + kana + cyr AND kana > 0
        |        THEN 1 ELSE 0 END
        |     + CASE WHEN cyr * 10 >= lat + cjk + kana + cyr AND cyr > 0
        |        THEN 1 ELSE 0 END) AS ns
        |  FROM c)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(lat) AS BIGINT) AS latin_chars,
        |  CAST(SUM(cjk) AS BIGINT) AS cjk_chars,
        |  CAST(SUM(kana) AS BIGINT) AS kana_chars,
        |  CAST(SUM(cyr) AS BIGINT) AS cyrillic_chars,
        |  CAST(SUM(dig) AS BIGINT) AS digit_chars,
        |  CAST(SUM(CASE WHEN tot > 0 AND ns >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mixed,
        |  round(CAST(SUM(CASE WHEN tot > 0 AND ns >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS mixed_frac
        |FROM m GROUP BY 1 ORDER BY source""".stripMargin,
    "q_zipf" ->
      """WITH tk AS (
        |  SELECT lang, w FROM (
        |    SELECT lang, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
        |    FROM documents)
        |  WHERE w <> ''),
        |f AS (SELECT lang, w, COUNT(*) AS ff FROM tk GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, ff,
        |    row_number() OVER (PARTITION BY lang ORDER BY ff DESC, w) AS rk
        |  FROM f),
        |q AS (
        |  SELECT lang, ff,
        |    CAST(round(ln(rk) * 1000000000.0) AS BIGINT) AS x,
        |    CAST(round(ln(ff) * 1000000000.0) AS BIGINT) AS y
        |  FROM r),
        |a AS (
        |  SELECT lang, COUNT(*) AS nt, SUM(ff) AS ntok,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM q GROUP BY 1),
        |b AS (
        |  SELECT lang, nt, ntok,
        |    CAST(nt * sxy - sx * sy AS DOUBLE) AS num,
        |    CAST(nt * sxx - sx * sx AS DOUBLE) AS dx,
        |    CAST(nt * syy - sy * sy AS DOUBLE) AS dy,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM a)
        |SELECT lang, CAST(nt AS BIGINT) AS n_types, CAST(ntok AS BIGINT) AS n_tokens,
        |  CASE WHEN nt >= 3 AND dx > 0.0 THEN round(num / dx, 6) END AS slope,
        |  CASE WHEN nt >= 3 AND dx > 0.0 THEN
        |    round((syd - num / dx * sxd) / CAST(nt AS DOUBLE) / 1000000000.0, 6)
        |  END AS intercept,
        |  CASE WHEN nt >= 3 AND dx > 0.0 AND dy > 0.0 THEN
        |    round(num * num / (dx * dy), 6)
        |  END AS r2
        |FROM b ORDER BY lang""".stripMargin,
    "q_keywords" -> keywordsOracleSql,
    "q_readability" ->
      """WITH c AS (
        |  SELECT lang, source,
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS st,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS sy
        |  FROM documents),
        |a AS (
        |  SELECT lang, source, COUNT(*) AS n_docs,
        |    SUM(w) AS words, SUM(st) AS sentences, SUM(sy) AS syllables
        |  FROM c GROUP BY 1, 2)
        |SELECT lang, source, n_docs,
        |  CAST(words AS BIGINT) AS words,
        |  CAST(sentences AS BIGINT) AS sentences,
        |  CAST(syllables AS BIGINT) AS syllables,
        |  CASE WHEN words > 0 THEN
        |    round(206.835
        |      - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
        |      - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)), 6)
        |  END AS flesch
        |FROM a ORDER BY lang, source""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
        |  CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS sum_distinct_tokens,
        |  CAST(SUM(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a')))) AS BIGINT) AS sum_stopwords,
        |  CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS sum_subwords
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_vocab" ->
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "q_doc_quality" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |  0.4 * least(len(string_split(text, ' ')) / 50.0, 1.0)
        |  + 0.4 * (len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE))
        |  + 0.2 * (len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_richness" ->
      """WITH tc AS (
        |  SELECT lang, t, COUNT(*) AS n FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t IS NOT NULL GROUP BY 1, 2),
        |sp AS (
        |  SELECT lang, SUM(n) AS n_tokens, COUNT(*) AS n_types,
        |    SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS f1,
        |    SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS f2
        |  FROM tc GROUP BY 1)
        |SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_types AS BIGINT) AS n_types,
        |  CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
        |  round(CAST(n_types AS DOUBLE)
        |    + CAST(f1 * (f1 - 1) AS DOUBLE) / (2.0 * CAST(f2 + 1 AS DOUBLE)), 6) AS chao1,
        |  round(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS coverage
        |FROM sp ORDER BY lang""".stripMargin,
    "q_nb_holdout" ->
      """WITH tr AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
        |te AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
        |toks AS (
        |  SELECT lang AS c, unnest(string_split(text, ' ')) AS t
        |  FROM tr WHERE lang IS NOT NULL),
        |tc AS (SELECT t, c, COUNT(*) AS n FROM toks WHERE t IS NOT NULL GROUP BY 1, 2),
        |v AS (SELECT COUNT(DISTINCT t) AS vv FROM tc),
        |pc AS (SELECT c, SUM(n) AS nc FROM tc GROUP BY 1),
        |dc AS (SELECT lang AS c, COUNT(*) AS n_docs FROM tr
        |       WHERE lang IS NOT NULL GROUP BY 1),
        |td AS (SELECT SUM(n_docs) AS dd FROM dc),
        |ct AS (
        |  SELECT pc.c,
        |    CAST(round(ln(CAST(n_docs AS DOUBLE)) * 1e9) AS BIGINT)
        |      - CAST(round(ln(CAST(dd AS DOUBLE)) * 1e9) AS BIGINT) AS prior,
        |    0 - CAST(round(ln(CAST(nc + vv AS DOUBLE)) * 1e9) AS BIGINT) AS lld
        |  FROM pc JOIN dc ON pc.c = dc.c CROSS JOIN v CROSS JOIN td),
        |ll AS (SELECT t, c,
        |    CAST(round(ln(CAST(n + 1 AS DOUBLE)) * 1e9) AS BIGINT) AS ll_adj
        |  FROM tc),
        |dt AS (
        |  SELECT doc_id, u AS t, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS u FROM te)
        |  WHERE u IS NOT NULL GROUP BY 1, 2),
        |pd AS (SELECT doc_id, SUM(tf) AS ntok FROM dt GROUP BY 1),
        |mt AS (
        |  SELECT dt.doc_id, ll.c, SUM(dt.tf * ll.ll_adj) AS m
        |  FROM dt JOIN ll ON dt.t = ll.t GROUP BY 1, 2),
        |sp AS (SELECT pd.doc_id, pd.ntok, ct.c, ct.prior, ct.lld FROM pd CROSS JOIN ct),
        |sc AS (
        |  SELECT sp.doc_id, sp.c,
        |    sp.prior + sp.ntok * sp.lld + COALESCE(mt.m, 0) AS score
        |  FROM sp LEFT JOIN mt ON mt.doc_id = sp.doc_id AND mt.c = sp.c),
        |best AS (
        |  SELECT doc_id, c AS predicted FROM (
        |    SELECT doc_id, c, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, c DESC) AS rn FROM sc)
        |  WHERE rn = 1)
        |SELECT te.lang AS label, b.predicted, COUNT(*) AS n
        |FROM te JOIN best b USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_nb" ->
      """WITH toks AS (
        |  SELECT lang AS c, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE lang IS NOT NULL),
        |tc AS (SELECT t, c, COUNT(*) AS n FROM toks WHERE t IS NOT NULL GROUP BY 1, 2),
        |v AS (SELECT COUNT(DISTINCT t) AS vv FROM tc),
        |pc AS (SELECT c, SUM(n) AS nc FROM tc GROUP BY 1),
        |dc AS (SELECT lang AS c, COUNT(*) AS n_docs FROM documents
        |       WHERE lang IS NOT NULL GROUP BY 1),
        |td AS (SELECT SUM(n_docs) AS dd FROM dc),
        |ct AS (
        |  SELECT pc.c,
        |    CAST(round(ln(CAST(n_docs AS DOUBLE)) * 1e9) AS BIGINT)
        |      - CAST(round(ln(CAST(dd AS DOUBLE)) * 1e9) AS BIGINT) AS prior,
        |    0 - CAST(round(ln(CAST(nc + vv AS DOUBLE)) * 1e9) AS BIGINT) AS lld
        |  FROM pc JOIN dc ON pc.c = dc.c CROSS JOIN v CROSS JOIN td),
        |ll AS (SELECT t, c,
        |    CAST(round(ln(CAST(n + 1 AS DOUBLE)) * 1e9) AS BIGINT) AS ll_adj
        |  FROM tc),
        |dt AS (
        |  SELECT doc_id, u AS t, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS u FROM documents)
        |  WHERE u IS NOT NULL GROUP BY 1, 2),
        |pd AS (SELECT doc_id, SUM(tf) AS ntok FROM dt GROUP BY 1),
        |mt AS (
        |  SELECT dt.doc_id, ll.c, SUM(dt.tf * ll.ll_adj) AS m
        |  FROM dt JOIN ll ON dt.t = ll.t GROUP BY 1, 2),
        |sp AS (SELECT pd.doc_id, pd.ntok, ct.c, ct.prior, ct.lld FROM pd CROSS JOIN ct),
        |sc AS (
        |  SELECT sp.doc_id, sp.c,
        |    sp.prior + sp.ntok * sp.lld + COALESCE(mt.m, 0) AS score
        |  FROM sp LEFT JOIN mt ON mt.doc_id = sp.doc_id AND mt.c = sp.c),
        |best AS (
        |  SELECT doc_id, c AS predicted FROM (
        |    SELECT doc_id, c, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, c DESC) AS rn FROM sc)
        |  WHERE rn = 1)
        |SELECT d.lang AS label, b.predicted, COUNT(*) AS n
        |FROM documents d JOIN best b USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_calibration" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |      / 1000000.0 + (-0.05)))), 6) AS s
        |  FROM agg),
        |bb AS (
        |  SELECT LEAST(CAST(floor(s * 10) AS INTEGER), 9) AS bin,
        |    CAST(round(s * 1000000.0) AS BIGINT) AS smv, y
        |  FROM sc WHERE s IS NOT NULL),
        |g AS (SELECT bin, COUNT(*) AS n, SUM(smv) AS ss, SUM(y) AS n_pos FROM bb GROUP BY 1),
        |e AS (
        |  SELECT bin, n, n_pos,
        |    CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS ms,
        |    CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS fp
        |  FROM g),
        |w2 AS (SELECT *, CAST(round(abs(ms - fp) * 1000000000.0) AS BIGINT) AS gap FROM e),
        |f AS (SELECT *, SUM(gap * n) OVER () AS ecen, SUM(n) OVER () AS nn FROM w2)
        |SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
        |  round(ms, 6) AS mean_score, round(fp, 6) AS frac_pos,
        |  round(CAST(gap AS DOUBLE) / 1000000000.0, 6) AS gap,
        |  round(CAST(ecen AS DOUBLE) / CAST(nn AS DOUBLE) / 1000000000.0, 6) AS ece
        |FROM f ORDER BY bin""".stripMargin,
    "q_lift" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |      / 1000000.0 + (-0.05)))), 6) AS s
        |  FROM agg WHERE lang IS NOT NULL),
        |ds AS (SELECT s, COUNT(*) AS c FROM sc WHERE s IS NOT NULL GROUP BY 1),
        |wv AS (
        |  SELECT CAST(round(s * 1000000.0) AS BIGINT) AS x,
        |    CAST(round(CAST(c AS DOUBLE) * 1000000.0) AS BIGINT) AS w
        |  FROM ds),
        |r2 AS (
        |  SELECT x, w,
        |    SUM(w) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    SUM(w) OVER () AS tw
        |  FROM wv WHERE w > 0),
        |qs AS (SELECT * FROM (VALUES (1,10),(2,10),(3,10),(4,10),(5,10),(6,10),
        |  (7,10),(8,10),(9,10)) AS t(pn, pd)),
        |cuts AS (
        |  SELECT round(CAST(MAX(CASE WHEN pd * (cw - w) < pn * tw
        |      AND pn * tw <= pd * cw THEN x END) AS DOUBLE) / 1000000.0, 6) AS q
        |  FROM r2 CROSS JOIN qs GROUP BY pn, pd),
        |tiles AS (
        |  SELECT sc.doc_id, sc.y,
        |    1 + COUNT(CASE WHEN sc.s < cuts.q THEN 1 END) AS tile
        |  FROM sc CROSS JOIN cuts GROUP BY sc.doc_id, sc.y, sc.s),
        |bt AS (SELECT tile, COUNT(*) AS n, SUM(y) AS n_pos FROM tiles GROUP BY 1),
        |f AS (
        |  SELECT *, SUM(n_pos) OVER () AS tp, SUM(n) OVER () AS tn,
        |    SUM(n_pos) OVER (ORDER BY tile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
        |  FROM bt)
        |SELECT CAST(tile AS INTEGER) AS tile, CAST(n AS BIGINT) AS n,
        |  CAST(n_pos AS BIGINT) AS n_pos,
        |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
        |  CASE WHEN tp > 0 THEN round((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6) END AS lift,
        |  CASE WHEN tp > 0
        |    THEN round(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE), 6) END AS cum_gain
        |FROM f ORDER BY tile""".stripMargin,
    "q_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT lang AS g,
        |    CAST(('0x' || substr(md5('kmv:' || tk), 1, 15)) AS BIGINT) AS hh
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tk FROM documents)
        |  WHERE tk IS NOT NULL),
        |r AS (
        |  SELECT g, hh, row_number() OVER (PARTITION BY g ORDER BY hh) AS rn,
        |    COUNT(*) OVER (PARTITION BY g) AS n
        |  FROM h),
        |kth AS (SELECT g, hh, n FROM r WHERE rn = LEAST(256, n)),
        |e AS (
        |  SELECT g, hh, n,
        |    CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
        |         ELSE 255.0 / (CAST(hh AS DOUBLE) / 1152921504606846976.0) END AS est
        |  FROM kth)
        |SELECT g AS lang, CAST(n AS BIGINT) AS n_distinct,
        |  CAST(LEAST(256, n) AS BIGINT) AS k_used, hh AS kth_hash,
        |  round(est, 6) AS est,
        |  round(abs(est - CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS rel_err
        |FROM e ORDER BY g""".stripMargin,
    "q_kmv_overlap" ->
      """WITH tok AS (
        |  SELECT source AS g, unnest(string_split(text, ' ')) AS token FROM documents),
        |h AS (
        |  SELECT DISTINCT g,
        |    CAST(('0x' || substr(md5('kmv:' || token), 1, 15)) AS BIGINT) AS hh
        |  FROM tok WHERE token IS NOT NULL AND g IS NOT NULL),
        |sk AS (
        |  SELECT g, hh FROM (
        |    SELECT g, hh, row_number() OVER (PARTITION BY g ORDER BY hh) AS rn FROM h)
        |  WHERE rn <= 256),
        |pairs AS (
        |  SELECT a.g AS ga, b.g AS gb
        |  FROM (SELECT DISTINCT g FROM sk) a JOIN (SELECT DISTINCT g FROM sk) b
        |    ON a.g < b.g),
        |u AS (
        |  SELECT ga, gb, hh, COUNT(*) AS cnt FROM (
        |    SELECT p.ga, p.gb, s.hh FROM pairs p JOIN sk s ON s.g = p.ga
        |    UNION ALL
        |    SELECT p.ga, p.gb, s.hh FROM pairs p JOIN sk s ON s.g = p.gb)
        |  GROUP BY 1, 2, 3),
        |ru AS (
        |  SELECT ga, gb, hh, cnt,
        |    row_number() OVER (PARTITION BY ga, gb ORDER BY hh) AS rn,
        |    COUNT(*) OVER (PARTITION BY ga, gb) AS nu
        |  FROM u),
        |ag AS (
        |  SELECT ga, gb, COUNT(*) AS n_theta,
        |    SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS n_both
        |  FROM ru WHERE rn <= LEAST(256, nu) GROUP BY 1, 2),
        |d AS (SELECT DISTINCT g, token AS tk FROM tok WHERE token IS NOT NULL),
        |s2 AS (SELECT g, COUNT(*) AS n FROM d GROUP BY 1),
        |i AS (
        |  SELECT a.g AS ga, b.g AS gb, COUNT(*) AS c
        |  FROM d a JOIN d b ON a.tk = b.tk AND a.g < b.g GROUP BY 1, 2)
        |SELECT ag.ga AS group_a, ag.gb AS group_b,
        |  CAST(n_theta AS BIGINT) AS n_theta, CAST(n_both AS BIGINT) AS n_both,
        |  round(CAST(n_both AS DOUBLE) / CAST(n_theta AS DOUBLE), 6) AS jaccard_est,
        |  round(CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE), 6) AS jaccard,
        |  round(abs(round(CAST(n_both AS DOUBLE) / CAST(n_theta AS DOUBLE), 6)
        |    - round(CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE), 6)), 6) AS abs_err
        |FROM ag JOIN i ON i.ga = ag.ga AND i.gb = ag.gb
        |JOIN s2 sa ON sa.g = ag.ga JOIN s2 sb ON sb.g = ag.gb
        |ORDER BY 1, 2""".stripMargin,
    "q_auc" ->
      """WITH l AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
        |feats AS (
        |  SELECT doc_id, lang,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (SELECT doc_id, lang, SUM(wm) AS sm, COUNT(*) AS n FROM wt GROUP BY 1, 2),
        |sc AS (
        |  SELECT lang, round(1.0 / (1.0 + exp(-(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
        |    / 1000000.0 + (-0.05)))), 6) AS score
        |  FROM agg),
        |tg AS (
        |  SELECT CASE WHEN lang = 'en' THEN 'a' ELSE 'b' END AS g,
        |    CAST(round(score * 1000000.0) AS BIGINT) AS x
        |  FROM sc WHERE score IS NOT NULL),
        |bv AS (
        |  SELECT x, SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS na_v, COUNT(*) AS n_v
        |  FROM tg GROUP BY 1),
        |rk AS (
        |  SELECT na_v, n_v,
        |    COALESCE(SUM(n_v) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM bv),
        |a AS (
        |  SELECT SUM(na_v) AS na, SUM(n_v - na_v) AS nb,
        |    SUM(na_v * (2 * cb + n_v + 1)) AS ra2
        |  FROM rk)
        |SELECT CAST(na AS BIGINT) AS n_pos, CAST(nb AS BIGINT) AS n_neg,
        |  CASE WHEN na >= 1 AND nb >= 1
        |    THEN round(CAST(ra2 - na * (na + 1) AS DOUBLE) / 2.0
        |      / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) END AS auc
        |FROM a WHERE na IS NOT NULL""".stripMargin,
    "q_fairness" ->
      """WITH l AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS tk
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        |feats AS (
        |  SELECT doc_id, lang, source,
        |    unnest(list_concat(tk,
        |      list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i + 1]))) AS f
        |  FROM l),
        |wt AS (
        |  SELECT doc_id, lang, source,
        |    (((CAST(('0x' || substr(md5('clf:' || f), 1, 8)) AS BIGINT) % 64)
        |      * 37 + 11) % 101 - 50) * 10000 AS wm
        |  FROM feats),
        |agg AS (
        |  SELECT doc_id, lang, source, SUM(wm) AS sm, COUNT(*) AS n
        |  FROM wt GROUP BY 1, 2, 3),
        |d AS (
        |  SELECT source, lang = 'en' AS y, sm - 50000 * n >= 0 AS sel FROM agg),
        |g AS (
        |  SELECT source, COUNT(*) AS n,
        |    SUM(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos,
        |    SUM(CASE WHEN sel THEN 1 ELSE 0 END) AS n_sel,
        |    SUM(CASE WHEN y AND sel THEN 1 ELSE 0 END) AS n_tp
        |  FROM d GROUP BY 1)
        |SELECT source, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(n_sel AS BIGINT) AS n_sel, CAST(n_tp AS BIGINT) AS n_tp,
        |  CASE WHEN n > 0 THEN CAST((CAST(n_sel AS HUGEINT) * 2000000 + n)
        |    // (CAST(n AS HUGEINT) * 2) AS DOUBLE) / 1000000.0 END AS sel_rate,
        |  CASE WHEN n_pos > 0 THEN CAST((CAST(n_tp AS HUGEINT) * 2000000 + n_pos)
        |    // (CAST(n_pos AS HUGEINT) * 2) AS DOUBLE) / 1000000.0 END AS tpr,
        |  CASE WHEN n - n_pos > 0 THEN
        |    CAST((CAST(n_sel - n_tp AS HUGEINT) * 2000000 + (n - n_pos))
        |      // (CAST(n - n_pos AS HUGEINT) * 2) AS DOUBLE) / 1000000.0 END AS fpr,
        |  CASE WHEN n_sel > 0 THEN CAST((CAST(n_tp AS HUGEINT) * 2000000 + n_sel)
        |    // (CAST(n_sel AS HUGEINT) * 2) AS DOUBLE) / 1000000.0 END AS precision
        |FROM g ORDER BY source""".stripMargin,
    "q_vocab_coverage" ->
      """WITH tk AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
        |    FROM documents WHERE text IS NOT NULL)
        |  WHERE w <> ''),
        |f AS (SELECT w, COUNT(*) AS ff FROM tk GROUP BY 1),
        |tot AS (SELECT SUM(ff) AS total FROM f),
        |r AS (SELECT ff, w, row_number() OVER (ORDER BY ff DESC, w) AS rk FROM f),
        |top AS (
        |  SELECT rk, SUM(ff) OVER (ORDER BY rk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM r WHERE rk <= 5000),
        |ks AS (SELECT unnest([100, 1000, 5000]) AS k)
        |SELECT CAST(ks.k AS BIGINT) AS k,
        |  CAST(MAX(top.rk) AS BIGINT) AS n_types_used,
        |  CAST(MAX(top.cum) AS BIGINT) AS covered_tokens,
        |  (SELECT CAST(total AS BIGINT) FROM tot) AS total_tokens,
        |  CAST((CAST(MAX(top.cum) AS HUGEINT) * 2000000 + (SELECT total FROM tot))
        |    // (CAST((SELECT total FROM tot) AS HUGEINT) * 2) AS DOUBLE)
        |    / 1000000.0 AS coverage
        |FROM ks JOIN top ON top.rk <= ks.k
        |GROUP BY ks.k ORDER BY k""".stripMargin,
    "q_lang_confusion" ->
      """SELECT lang,
        |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |       WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
        |       WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
        |       WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
        |       ELSE 'unknown' END AS lang_pred,
        |  COUNT(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_lang_id" ->
      """SELECT CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |            WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
        |            WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
        |            WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
        |            ELSE 'unknown' END AS lang_pred, COUNT(*) AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pmi" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p FROM toks),
        |cells AS (SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
        |tot AS (SELECT SUM(c12) AS n FROM cells),
        |m AS (
        |  SELECT w1, w2, c12,
        |    SUM(c12) OVER (PARTITION BY w1) AS c1,
        |    SUM(c12) OVER (PARTITION BY w2) AS c2
        |  FROM cells)
        |SELECT w1, w2, c12,
        |  round(ln(CAST(c12 AS DOUBLE)) + ln(CAST((SELECT n FROM tot) AS DOUBLE))
        |    - ln(CAST(c1 AS DOUBLE)) - ln(CAST(c2 AS DOUBLE)), 6) AS pmi
        |FROM m WHERE c12 >= 5 ORDER BY w1, w2
        |""".stripMargin,
    "q_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '')) AS c FROM documents),
        |cc AS (SELECT doc_id, c, COUNT(*) AS cnt FROM ch GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id,
        |    SUM(CAST(round(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE)) * 1e9)
        |      AS BIGINT)) AS s,
        |    SUM(cnt) AS L
        |  FROM cc GROUP BY 1)
        |SELECT doc_id,
        |  round(ln(CAST(L AS DOUBLE)) - CAST(s AS DOUBLE) / CAST(L AS DOUBLE) / 1e9, 6)
        |    AS char_entropy
        |FROM agg ORDER BY doc_id
        |""".stripMargin,
    "q_kappa" ->
      """WITH pred AS (
        |  SELECT lang AS a,
        |    CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |         WHEN regexp_matches(text, '[\x{3040}-\x{30ff}]') THEN 'ja'
        |         WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
        |         WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
        |         ELSE 'unknown' END AS b
        |  FROM documents),
        |cells AS (SELECT a, b, COUNT(*) AS cn FROM pred GROUP BY 1, 2),
        |tot AS (
        |  SELECT CAST(SUM(cn) AS BIGINT) AS nn,
        |    CAST(SUM(CASE WHEN a = b THEN cn ELSE 0 END) AS BIGINT) AS agree
        |  FROM cells),
        |ram AS (SELECT a, CAST(SUM(cn) AS BIGINT) AS ra FROM cells GROUP BY 1),
        |cbm AS (SELECT b, CAST(SUM(cn) AS BIGINT) AS cb FROM cells GROUP BY 1),
        |pm AS (
        |  SELECT COALESCE(CAST(SUM(ra * cb) AS BIGINT), 0) AS pe_num
        |  FROM ram JOIN cbm ON ram.a = cbm.b),
        |s AS (
        |  SELECT nn, CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE) AS po,
        |    CAST(pe_num AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) AS pe
        |  FROM tot, pm)
        |SELECT nn AS n, round(po, 6) AS po, round(pe, 6) AS pe,
        |  CASE WHEN pe <> 1 THEN round((po - pe) / (1 - pe), 6) END AS kappa
        |FROM s
        |""".stripMargin,
    // Replays Dsir end-to-end: md5-prefix bucketing of unigrams+bigrams,
    // Laplace-smoothed LLR quantized to integer micro-nats PER BUCKET
    // (identical IEEE ratio operands; only ln can differ by ulps, absorbed
    // by the 1e-6 grid), exact BIGINT occurrence sums, top-120.
    "q_dsir" ->
      """WITH w AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |f AS (
        |  SELECT doc_id, lang, unnest(list_concat(w,
        |    [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))])) AS feat
        |  FROM w),
        |b AS (SELECT doc_id, lang, substring(md5(feat), 1, 3) AS bucket FROM f),
        |cnt AS (
        |  SELECT bucket, COUNT(*) AS nq,
        |         COUNT(*) FILTER (WHERE lang = 'en') AS np
        |  FROM b GROUP BY 1),
        |tot AS (SELECT SUM(nq) AS tq, SUM(np) AS tp FROM cnt),
        |llr AS (
        |  SELECT bucket,
        |    CAST(round(ln(
        |      (CAST(np + 1 AS DOUBLE) / CAST(tp + 4096 AS DOUBLE))
        |      / (CAST(nq + 1 AS DOUBLE) / CAST(tq + 4096 AS DOUBLE))
        |    ) * 1000000.0) AS BIGINT) AS llr_micro
        |  FROM cnt CROSS JOIN tot)
        |SELECT b.doc_id, COUNT(*) AS n_features,
        |  CAST(SUM(llr_micro) AS BIGINT) AS score_micro
        |FROM b JOIN llr USING (bucket)
        |GROUP BY b.doc_id
        |ORDER BY score_micro DESC, doc_id LIMIT 120""".stripMargin,
    "q_bpe" -> bpeOracleSql(rounds = 8),
    "q_bpe_encode" -> bpeEncodeOracleSql(rounds = 8),
    "q_decontaminate" ->
      """WITH s AS (
        |  SELECT doc_id, list_distinct([array_to_string(w[i:i+4], ' ') FOR i IN range(1, len(w)-3)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |c AS (SELECT doc_id, len(sh) AS n_doc_sh, unnest(sh) AS shingle FROM s),
        |b AS (SELECT doc_id AS bench_id, unnest(sh) AS shingle FROM s
        |      WHERE doc_id % 50 = 0 AND doc_id < 500),
        |j AS (
        |  SELECT c.doc_id, b.bench_id, c.n_doc_sh, COUNT(*) AS n_shared
        |  FROM c JOIN b USING (shingle)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, bench_id, n_shared,
        |  CAST(n_shared AS DOUBLE) / n_doc_sh AS contaminated_frac
        |FROM j WHERE n_shared >= 3 ORDER BY doc_id, bench_id""".stripMargin,
    "q_chunk" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, n,
        |        unnest(range(0, (greatest(n - 10 - 1, 0) // 30) + 1)) AS chunk_idx
        |      FROM d)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(least(40, n - chunk_idx * 30) AS BIGINT) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_repetition" ->
      """WITH r AS (
        |  SELECT lang,
        |    CASE WHEN len(w) < 3 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct([array_to_string(w[i:i+2], ' ')
        |                FOR i IN range(1, len(w)-1)])) AS DOUBLE) / (len(w) - 2)
        |    END AS rep
        |  FROM (SELECT lang, string_split(text, ' ') AS w FROM documents))
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN rep > 0.03 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
        |  CAST(SUM(CAST(rep AS DECIMAL(18,9))) AS DOUBLE) AS sum_rep
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pack" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS bucket,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (
        |  SELECT lang, bucket, n_tokens,
        |    CAST((SUM(n_tokens) OVER (PARTITION BY lang, bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 512 AS BIGINT) AS pack_id
        |  FROM d)
        |SELECT lang, bucket, pack_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |FROM p GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_redact" ->
      """WITH inj AS (
        |  SELECT lang,
        |    text || CASE WHEN doc_id % 10 = 0
        |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.'
        |           || CAST(doc_id % 256 AS VARCHAR) || '.7'
        |      ELSE '' END AS t
        |  FROM documents),
        |red AS (
        |  SELECT lang, t,
        |    regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS r
        |  FROM inj)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN r != t THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
        |  CAST(SUM(length(t) - length(r)) AS BIGINT) AS chars_removed
        |FROM red GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_token_budget" ->
      // quality formula mirrors q_doc_quality's exactly; the negated sort
      // key on the Spark side is ORDER BY quality DESC here (doubles
      // compare identically — the formula is bit-replicated)
      """WITH q AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
        |    0.4 * least(len(string_split(text, ' ')) / 50.0, 1.0)
        |    + 0.4 * (len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE))
        |    + 0.2 * (len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS qual
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tok,
        |    SUM(n_tok) OVER (ORDER BY qual DESC, doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM q)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, CAST(cum AS BIGINT) AS cum_tok
        |FROM c WHERE cum <= 10000 ORDER BY doc_id""".stripMargin,
    "q_boilerplate" ->
      // Same synthesis (10-token lines), then the reference logic with
      // line STRINGS end to end: cross-doc distinct counts, >= 3 docs is
      // boilerplate, survivors re-join in position order. string_agg is
      // NULL for all-boilerplate docs; coalesce matches concat_ws's ''.
      """WITH tok AS (
        |  SELECT doc_id, string_split(replace(text, chr(10), ' '), ' ') AS w
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, pos, array_to_string(w[pos*10+1 : pos*10+10], ' ') AS line
        |  FROM (SELECT doc_id, w,
        |          unnest(range(0, CAST(ceil(len(w)/10.0) AS BIGINT))) AS pos
        |        FROM tok)),
        |boiler AS (
        |  SELECT line FROM (
        |    SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY line)
        |  WHERE df >= 3)
        |SELECT doc_id,
        |  md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
        |    FILTER (WHERE line NOT IN (SELECT line FROM boiler)), '')) AS sig,
        |  COUNT(*) FILTER (WHERE line NOT IN (SELECT line FROM boiler)) AS n_kept,
        |  COUNT(*) FILTER (WHERE line IN (SELECT line FROM boiler)) AS n_dropped
        |FROM lines GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // mirrors qRetrievalEval CTE-for-CTE; per-term scores quantize to
    // integer nano-units BEFORE the pair sum (round-per-term playbook)
    "q_retrieval_eval" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (
        |  SELECT doc_id, unnest(range(0, (greatest(len(w) - 8 - 1, 0) // 24) + 1)) AS ci, w
        |  FROM w),
        |c2 AS (
        |  SELECT doc_id * 1000 + ci AS chunk_id, doc_id, ci,
        |    array_to_string(w[ci*24+1:ci*24+32], ' ') AS ctext
        |  FROM ch),
        |q AS (SELECT doc_id AS query_id, ctext AS qtext FROM c2 WHERE doc_id < 20 AND ci = 0),
        |corp AS (SELECT chunk_id, ctext FROM c2 WHERE NOT (doc_id < 20 AND ci = 0)),
        |qt AS (SELECT query_id, unnest(list_distinct(string_split(qtext, ' '))) AS term FROM q),
        |cw AS (SELECT chunk_id, string_split(ctext, ' ') AS w FROM corp),
        |post AS (SELECT chunk_id, len(w) AS dl, unnest(w) AS term FROM cw),
        |tf AS (
        |  SELECT chunk_id, dl, term, COUNT(*) AS tf FROM post
        |  WHERE term IN (SELECT DISTINCT term FROM qt)
        |  GROUP BY 1, 2, 3),
        |dfx AS (SELECT term, COUNT(DISTINCT chunk_id) AS df FROM tf GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(len(string_split(ctext, ' '))) AS sum_dl FROM corp),
        |sc AS (
        |  SELECT qt.query_id, f.chunk_id, f.term,
        |    (((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE)) + 0.5)
        |       / (CAST(d.df AS DOUBLE) + 0.5))
        |    * ((CAST(f.tf AS DOUBLE) * (1.2 + 1.0))
        |       / (CAST(f.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(f.dl AS DOUBLE)
        |            / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))) AS s
        |  FROM tf f JOIN qt USING (term) JOIN dfx d USING (term) CROSS JOIN stats s),
        |tot AS (
        |  SELECT query_id, chunk_id,
        |    SUM(CAST(round(s * 1000000000.0) AS BIGINT)) AS score_nano
        |  FROM sc GROUP BY 1, 2),
        |rk AS (
        |  SELECT query_id, chunk_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score_nano DESC, chunk_id) AS rank
        |  FROM tot),
        |top AS (
        |  SELECT query_id, rank,
        |    CASE WHEN chunk_id // 1000 = query_id THEN 1 ELSE 0 END AS hit
        |  FROM rk WHERE rank <= 5),
        |per AS (
        |  SELECT query_id, MAX(CASE WHEN rank = 1 THEN hit ELSE 0 END) AS h1, MAX(hit) AS h5
        |  FROM top GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  CAST(SUM(h1) AS BIGINT) AS hits_at_1, CAST(SUM(h5) AS BIGINT) AS hits_at_5
        |FROM per""".stripMargin,
    "q_bm25" ->
      // the score expression tree mirrors Rank.bm25Scores operation for
      // operation (rational idf — no ln), so doubles match bit-for-bit
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |posting AS (
        |  SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM tok),
        |tf AS (
        |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM posting
        |  WHERE term IN ('spark', 'vector', 'stream', 'merge')
        |  GROUP BY doc_id, dl, term),
        |dfx AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(len(w)) AS sum_dl FROM tok),
        |scored AS (
        |  SELECT f.doc_id, f.term,
        |    (((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE)) + 0.5)
        |       / (CAST(d.df AS DOUBLE) + 0.5))
        |    * ((CAST(f.tf AS DOUBLE) * (1.2 + 1.0))
        |       / (CAST(f.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(f.dl AS DOUBLE)
        |            / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))) AS score
        |  FROM tf f JOIN dfx d USING (term) CROSS JOIN stats s),
        |agg AS (
        |  SELECT doc_id,
        |    MAX(CASE WHEN term = 'spark' THEN score END) AS s_spark,
        |    MAX(CASE WHEN term = 'vector' THEN score END) AS s_vector,
        |    MAX(CASE WHEN term = 'stream' THEN score END) AS s_stream,
        |    MAX(CASE WHEN term = 'merge' THEN score END) AS s_merge
        |  FROM scored GROUP BY doc_id)
        |SELECT doc_id, s_spark, s_vector, s_stream, s_merge,
        |  COALESCE(s_spark, 0.0) + COALESCE(s_vector, 0.0)
        |    + COALESCE(s_stream, 0.0) + COALESCE(s_merge, 0.0) AS total
        |FROM agg ORDER BY total DESC, doc_id LIMIT 20""".stripMargin,
    "q_oov" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |v AS (
        |  SELECT w FROM (SELECT w, COUNT(*) AS c FROM tok GROUP BY w
        |                 ORDER BY c DESC, w LIMIT 200)),
        |j AS (
        |  SELECT t.doc_id, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM tok t LEFT JOIN v ON t.w = v.w)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(oov) AS BIGINT) AS n_oov,
        |  CAST(SUM(oov) AS DOUBLE) / COUNT(*) AS oov_rate
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_normalize" ->
      """WITH m AS (
        |  SELECT lang, text,
        |    CASE WHEN doc_id % 5 = 0
        |         THEN '  ' || upper(text) || chr(9) || 'X' || chr(1) || 'Y  '
        |         ELSE text END AS mtext
        |  FROM documents),
        |n AS (
        |  SELECT lang, text,
        |    trim(regexp_replace(
        |      regexp_replace(lower(mtext), '[ \t\n\x0B\f\r]+', ' ', 'g'),
        |      '[\x00-\x1F\x7F]', '', 'g')) AS norm
        |  FROM m)
        |SELECT lang, COUNT(*) AS n,
        |  CAST(SUM(length(norm)) AS BIGINT) AS sum_len,
        |  CAST(SUM(CASE WHEN norm <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
        |FROM n GROUP BY lang ORDER BY lang""".stripMargin,
    "q_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfx AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term HAVING COUNT(*) >= 2),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
        |sc AS (
        |  SELECT f.doc_id, f.term, f.tf, d.df,
        |    CAST(f.tf AS DOUBLE) * ((CAST(n.n_docs AS DOUBLE) + 1.0)
        |      / (CAST(d.df AS DOUBLE) + 1.0)) AS score
        |  FROM tf f JOIN dfx d USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS rank FROM sc)
        |SELECT doc_id, rank, term, tf, df, score
        |FROM r WHERE rank <= 3 AND doc_id < 50
        |ORDER BY doc_id, rank""".stripMargin,
    "q_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
        |  FROM documents),
        |bg_tr AS (
        |  SELECT u[1] AS w1, u[2] AS w2
        |  FROM (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS u
        |        FROM tok WHERE doc_id % 5 <> 0)),
        |model AS (SELECT w1, w2, count(*) AS c12 FROM bg_tr GROUP BY w1, w2),
        |modelc AS (
        |  SELECT w1, w2, c12, sum(c12) OVER (PARTITION BY w1) AS c1 FROM model),
        |bg_cand AS (
        |  SELECT doc_id, u[1] AS w1, u[2] AS w2
        |  FROM (SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS u
        |        FROM tok WHERE doc_id % 5 = 0)),
        |uni AS (SELECT DISTINCT w1, c1 FROM modelc),
        |j AS (
        |  SELECT b.doc_id, COALESCE(m.c12, 0) AS c12, COALESCE(u.c1, 0) AS c1
        |  FROM bg_cand b
        |  LEFT JOIN modelc m ON b.w1 = m.w1 AND b.w2 = m.w2
        |  LEFT JOIN uni u ON b.w1 = u.w1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(CASE WHEN c12 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
        |  CAST(sum(c12) AS BIGINT) AS sum_c12,
        |  CAST(sum(c1) AS BIGINT) AS sum_c1
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_diversity" ->
      """SELECT doc_id,
        |  CAST(len(l) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct,
        |  CAST(len(list_distinct(l)) AS DOUBLE) / CAST(len(l) AS DOUBLE) AS ttr,
        |  CASE WHEN len(l) > 1 THEN 1.0 - CAST(s AS DOUBLE) /
        |    (CAST(len(l) AS DOUBLE) * (CAST(len(l) AS DOUBLE) - 1.0)) END AS simpson
        |FROM (
        |  SELECT doc_id, l,
        |    list_sum(list_transform(list_distinct(l),
        |      w -> len(list_filter(l, x -> x = w)) * (len(list_filter(l, x -> x = w)) - 1))) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))
        |ORDER BY doc_id""".stripMargin,
  )
}
