package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, n-gram shingles, quality metrics, language-ID heuristic,
  * winnowing fingerprints. All pure Catalyst expressions (higher-order
  * array functions) — no UDFs, so everything stays inside whole-stage
  * codegen and scales linearly with tokens per row.
  */
object TextStats {

  /** Whitespace tokenization (single-space corpus) — keep the contract
    * trivial so oracles can reproduce it (`string_split`).
    */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-alnum chars — a cheap proxy for tokenizer load estimation.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Alphanumeric word count (readability's denominator): runs of
    * [a-z0-9] over the lowercased text — dialect-portable (no \b, no
    * lookaround) so SQL oracles reproduce it verbatim.
    */
  def alnumWordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0)))

  /** Sentence count: runs of terminal punctuation, floored at 1 (a
    * fragment with no .!? is one sentence, not zero — division guard
    * and the convention readability tables assume).
    */
  def sentenceCount(text: Column): Column =
    greatest(lit(1), size(regexp_extract_all(text, lit("[.!?]+"), lit(0))))

  /** Syllable proxy: vowel-group runs ([aeiouy]+) over the lowercased
    * text — the standard cheap estimator (each group ≈ one syllable
    * nucleus). All-consonant/numeric words contribute 0; stated, since
    * per-word flooring would cost a token explode for ~no signal on
    * natural text.
    */
  def vowelGroupCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))

  /** Flesch reading ease from exact integer counts:
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    * null when there are no words. One fixed IEEE tree — pass the
    * outputs of [[alnumWordCount]]/[[sentenceCount]]/[[vowelGroupCount]]
    * (or their per-group integer SUMS for a corpus-level score).
    */
  def fleschReadingEase(words: Column, sentences: Column, syllables: Column): Column =
    when(words > 0,
      lit(206.835)
        - lit(1.015) * (words.cast("double") / sentences.cast("double"))
        - lit(84.6) * (syllables.cast("double") / words.cast("double")))

  /** Overlapping token-window chunks (embedding/RAG prep): split the
    * token stream into windows of `chunkTokens` advancing by
    * `chunkTokens - overlapTokens`, each rejoined with spaces. The last
    * window may be shorter; documents shorter than one window yield one
    * chunk. Pure per-row array work — pair with `posexplode` for
    * (doc, chunk_idx, chunk) rows and [[graft.ops.Pack]] for layout.
    */
  def chunkTokens(text: Column, chunkTokens: Int, overlapTokens: Int): Column = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"need 0 <= overlap < chunk, got chunk=$chunkTokens overlap=$overlapTokens")
    val stride = chunkTokens - overlapTokens
    graft.functions.ArrayMath.bound(tokens(text)) { w =>
      transform(
        sequence(lit(0),
          (greatest(size(w) - overlapTokens - 1, lit(0)) / lit(stride)).cast("int")),
        i => array_join(slice(w, i * stride + 1, lit(chunkTokens)), " "))
    }
  }

  /** Σ cᵢ·(cᵢ−1) over the document's token frequencies — the number of
    * ordered same-token pairs, the integer heart of the Gini-Simpson
    * diversity index. Per-row array arithmetic only (O(k·n) per doc,
    * k = distinct tokens): no explode, no shuffle — diversity scoring at
    * 100 TB stays a narrow map.
    */
  def samePairCount(toks: Column): Column =
    graft.functions.ArrayMath.bound(toks) { t =>
      aggregate(array_distinct(t), lit(0L), (acc, w) => {
        val c = size(filter(t, x => x === w)).cast("long")
        acc + c * (c - lit(1L))
      })
    }

  /** Gini-Simpson lexical diversity: probability two tokens drawn
    * without replacement differ — `1 − Σcᵢ(cᵢ−1) / (n(n−1))`. Entirely
    * RATIONAL (unlike Shannon entropy's ln), so the score is bit-exact
    * across engines: integer counts, one IEEE division. Null for docs
    * with fewer than two tokens.
    */
  def simpsonDiversity(text: Column): Column = {
    val t = tokens(text)
    val n = size(t).cast("double")
    when(size(t) > 1,
      lit(1.0) - samePairCount(t).cast("double") / (n * (n - lit(1.0))))
  }

  /** Shannon character entropy in nats — the classic gibberish screen
    * ([[simpsonDiversity]]'s token-level cousin at the character level):
    * keyboard mash, base64 blobs and single-char runs sit far from
    * natural text's ~2.8-3.2 nats. Computed as
    * `ln(L) − Σ_c cnt_c·ln(cnt_c) / L` so every `ln` argument is an
    * INTEGER-valued double (identical in every libm we target — the
    * q_elementary_index rule); each `cnt·ln(cnt)` term nano-quantizes
    * before the sum, one final subtraction/division chain, 6 dp.
    * Empty/null text scores 0.0 (a no-information document, not null).
    *
    * Per-row array arithmetic only (distinct-chars × chars scan per
    * document — alphabet-bounded, ~100·L steps) — no shuffle; the whole
    * corpus screens in one codegen'd scan.
    */
  def charEntropy(text: Column): Column = {
    // Spark's split(_, "") keeps a trailing "" (Java split limit -1);
    // DuckDB's does not — filter it so both engines see the same chars
    val chars = filter(split(text, ""), c => c =!= lit(""))
    val len = size(chars)
    val termNano = transform(array_distinct(chars), ch => {
      val cnt = size(filter(chars, c => c === ch)).cast("double")
      round(cnt * log(cnt) * lit(1e9), 0).cast("long")
    })
    val s = aggregate(termNano, lit(0L), (acc, x) => acc + x)
    when(len > 0,
      round(log(len.cast("double"))
        - s.cast("double") / len.cast("double") / lit(1e9), 6))
      .otherwise(lit(0.0))
  }

  /** Intra-document repetition score (C4/Gopher-style quality rule): the
    * fraction of `n`-gram occurrences that are repeats of an earlier
    * occurrence — `1 - |distinct n-grams| / |n-grams|`; 0 for documents
    * too short to shingle. High values mark boilerplate/spam for
    * filtering. Pure per-row array arithmetic, no shuffle.
    */
  def repetitionScore(text: Column, n: Int = 3): Column =
    graft.functions.ArrayMath.bound(
      graft.functions.ArrayMath.shingleHash64(tokens(text), n, distinct = false)) { sh =>
      // positional 64-bit hashes stand in for the n-gram strings: the
      // score only needs |distinct| / |total| (null/short text → 0.0)
      when(size(sh) > 0,
        lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
        .otherwise(lit(0.0))
    }

  /** PII redaction (training-data scrubbing): replace email addresses and
    * IPv4 literals with typed placeholder tokens. Patterns deliberately
    * use only constructs with identical semantics in Java regex (Spark)
    * and RE2 (DuckDB/Go scrubbers) — character classes, bounded repeats,
    * grouping; no backreferences or lookaround — so a downstream engine
    * reproduces the redaction byte-for-byte. Order matters: emails first
    * (an email's host part must not be half-eaten by the IP pattern).
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Word boundaries stop partial eats of longer dotted-number runs
    * ("1.2.3.4567" is NOT half-redacted). Version strings whose four
    * parts all fit in 3 digits are inherently IPv4-shaped and still
    * match — callers scrubbing changelogs should pre-mask those.
    */
  val ipv4Pattern = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      ipv4Pattern, "<IP>")

  /** Word n-gram shingles joined by spaces; empty array when the document
    * is shorter than `n` words.
    *
    * The token array is routed through [[graft.functions.ArrayMath.bound]]
    * so the split is evaluated once per row — referencing it directly
    * inside the position lambda would re-split the text per shingle after
    * CollapseProject inlining (measured 10×+ slowdown at bench scale).
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.ArrayMath.bound(tokens(text)) { w =>
      when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n), i => array_join(slice(w, i + lit(1), lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    }

  def stopwordCount(text: Column, stopwords: Seq[String]): Column = {
    val sw = stopwords.map(lit(_))
    size(filter(tokens(text), t => t.isin(sw: _*)))
  }

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Composite quality score in [0,1]: length saturation, lexical
    * diversity, stopword presence. Deterministic double arithmetic over
    * integer-valued counts (oracle-safe).
    */
  def qualityScore(text: Column, stopwords: Seq[String] = Seq("the", "a")): Column = {
    val n = tokenCount(text).cast("double")
    val lenScore = least(n / lit(50.0), lit(1.0))
    val diversity = distinctTokenCount(text).cast("double") / n
    val stopRatio = stopwordCount(text, stopwords).cast("double") / n
    lit(0.4) * lenScore + lit(0.4) * diversity + lit(0.2) * stopRatio
  }

  /** Language-ID heuristic: charset ranges first (CJK, Cyrillic, kana),
    * then an English stopword probe. Deliberately simple and
    * SQL-reproducible; a real pipeline would swap in a trained n-gram
    * model behind the same Column→Column contract.
    */
  /** Characters of `text` matching a character-class `pattern` (e.g.
    * `"[A-Za-z]"`), counted by length difference after stripping — the
    * portable spelling ([[langId]]'s explicit-range discipline: the
    * same classes mean the same thing in Java regex and RE2, so a
    * DuckDB/Go scrubber replays the count byte-for-byte).
    */
  def charClassCount(text: Column, pattern: String): Column =
    length(text) - length(regexp_replace(text, pattern, ""))

  def langId(text: Column): Column =
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(text.rlike("[\\u3040-\\u30ff]"), "ja")
      .when(text.rlike("[\\u0400-\\u04ff]"), "ru")
      .when(array_contains(tokens(text), "the"), "en")
      .otherwise("unknown")

  /** Dialect-portable text normalization (crawl-cleaning front door):
    * lowercase, collapse every whitespace run to one space, strip the
    * remaining (non-whitespace) control characters, trim. Runs are
    * collapsed BEFORE the control strip so tabs/newlines become word
    * separators instead of gluing words together. Patterns use only
    * explicit character ranges (`\x00`-style), which mean the same thing
    * in Java regex (Spark) and RE2 (DuckDB/Go scrubbers) — a downstream
    * engine reproduces the normalization byte-for-byte.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[ \\t\\n\\x0B\\f\\r]+", " "),
      "[\\x00-\\x1F\\x7F]", ""))

  /** Vocabulary coverage: per-document out-of-vocabulary token counts
    * against the corpus's top-`topN` vocabulary (ties at the cutoff break
    * to the lexicographically smaller token, so the vocabulary — and
    * therefore every rate — is deterministic).
    *
    * Scale shape: the vocabulary is a tiny aggregate broadcast back
    * against the token stream; the only O(corpus) shuffle is the
    * per-document count. A fixed externally-supplied vocabulary (the
    * tokenizer's, usually) can replace the first aggregation entirely.
    */
  def oovRate(docs: org.apache.spark.sql.DataFrame, idCol: String,
              textCol: String, topN: Int): org.apache.spark.sql.DataFrame = {
    require(topN > 0, "topN must be positive")
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("__w"))
    val vocab = toks.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc)
      .limit(topN)
      .select(col("__w"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("__w"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
  }

  /** [[oovRate]] against a FIXED vocabulary (the tokenizer's, usually) —
    * the scale path: membership is an array HOF against a broadcast
    * literal set, so the whole computation is a narrow map over the
    * corpus. No explode, no join, no shuffle at all.
    */
  def oovRateWithVocab(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, vocab: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    val vocabArr = array(vocab.map(lit(_)): _*)
    val stats = graft.functions.ArrayMath.bound(tokens(col(textCol))) { w =>
      struct(
        size(w).as("n_tokens"),
        size(filter(w, t => !array_contains(vocabArr, t))).as("n_oov"))
    }
    docs.select(col(idCol), stats.as("__s"))
      .select(col(idCol),
        col("__s.n_tokens").cast("long").as("n_tokens"),
        col("__s.n_oov").cast("long").as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
  }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03): hash
    * every k-gram, take the minimum hash of each sliding window of `w`
    * consecutive k-gram hashes, dedupe. Robust to local edits; the
    * distinct min-hashes are the document's fingerprint set.
    */
  def fingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    graft.functions.ArrayMath.bound(
      // positional k-gram hashes, hash-equal to xxhash64 over the shingle
      // strings (same seed-42 bytes hash) with no string materialization
      graft.functions.ArrayMath.shingleHash64(tokens(text), k, distinct = false)) { hashes =>
      when(size(hashes) >= w,
        array_distinct(transform(sequence(lit(0), size(hashes) - w),
          i => array_min(slice(hashes, i + lit(1), lit(w))))))
        .when(size(hashes) > 0, array(array_min(hashes)))
        .otherwise(array().cast("array<bigint>"))
    }

  /** Moving-average type-token ratio (MATTR) — lexical diversity that,
    * unlike raw TTR, does not collapse with document length: the mean
    * distinct-token share over every length-`window` sliding window of
    * the token stream. Low MATTR = loops/boilerplate; the
    * length-robust quality feature for curation filters.
    *
    * Determinism: each token row explodes into the integer window
    * starts it serves (a narrow `sequence`), distinct counts per
    * (doc, start) are exact, and MATTR is one division of exact
    * integers, 6 dp.
    *
    * Scale shape: one doc-partitioned count window (token counts are
    * doc-local), a narrow ≤`window`-fanout explode, one
    * (doc, start)-keyed distinct aggregation, one doc rollup — rows
    * moved are O(tokens × window), never corpus-quadratic, and every
    * key is doc-local so the whole plan is embarrassingly parallel by
    * document.
    *
    * @return (docId, n_tokens, n_windows, mattr) — docs shorter than
    *         `window` have no windows and drop (stated)
    */
  def mattr(df: DataFrame, idCol: String, textCol: String,
            window: Int = 20): DataFrame = {
    require(window >= 2 && window <= 1000, s"window out of range: $window")
    val toks = df.select(col(idCol).as("__id"),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("__id"))
    val withN = toks.withColumn("__n", count(lit(1)).over(wDoc))
      .filter(col("__n") >= window)
    val starts = withN.select(col("__id"), col("__n"), col("__tok"),
      explode(sequence(
        greatest(col("__pos") - lit(window - 1), lit(0)),
        least(col("__pos"), col("__n") - lit(window)))).as("__s"))
    val perWin = starts.groupBy(col("__id"), col("__n"), col("__s"))
      .agg(countDistinct(col("__tok")).as("__d"))
    perWin.groupBy(col("__id"), col("__n"))
      .agg(count(lit(1)).as("n_windows"), sum(col("__d")).as("__sd"))
      .select(col("__id").as(idCol), col("__n").as("n_tokens"), col("n_windows"),
        round(col("__sd").cast("double") / col("n_windows").cast("double")
          / lit(window.toDouble), 6).as("mattr"))
  }

  /** Rényi-2 (collision) diversity per group: H₂ = −ln Σp² over the
    * token distribution, with the inverse-Simpson effective vocabulary
    * N²/Σc² — "how many EQUALLY-COMMON tokens is this source worth?"
    * The order-2 point on the diversity profile [[simpsonDiversity]]
    * reports per document and q_hill profiles per corpus; H₂ weights
    * common tokens hardest, so template-heavy sources crater here
    * first. Returns `(groupBy..., n_tokens, n_vocab, renyi2,
    * eff_vocab)`; null when the group is empty.
    *
    * Determinism: counts and Σc² are exact integers; both outputs take
    * ln of integer-valued doubles (the integer-arg ln convention) or a
    * plain exact-integer ratio.
    *
    * Scale shape: one (group, token)-keyed map-combined aggregation +
    * a group rollup — the corpus pays one vocabulary shuffle.
    */
  def renyiDiversity(df: DataFrame, groupBy: Seq[String],
                     token: Column): DataFrame = {
    require(groupBy.nonEmpty, "renyiDiversity needs group keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val gCols = groupBy.map(col)
    val counts = df.select(gCols :+ token.as("__t"): _*)
      .filter(col("__t").isNotNull)
      .groupBy(gCols :+ col("__t"): _*)
      .agg(count(lit(1)).as("__c"))
    val agg = counts.groupBy(gCols: _*).agg(
      sum(col("__c")).as("n_tokens"),
      count(lit(1)).as("n_vocab"),
      sum(col("__c").cast(dec) * col("__c").cast(dec)).as("__c2"))
    val nD = col("n_tokens").cast("double")
    val c2 = col("__c2").cast("double")
    val ok = col("n_tokens") > 0L && col("__c2") > 0L
    agg.select(gCols :+ col("n_tokens") :+ col("n_vocab")
      :+ when(ok, round(log(nD * nD) - log(c2), 6)).as("renyi2")
      :+ when(ok, round(nD * nD / c2, 6)).as("eff_vocab"): _*)
  }

  /** Yule's K — the repeat-rate concentration of a vocabulary
    * ([[renyiDiversity]]'s classic stylometric sibling):
    *
    *   K = 10⁴ · (Σ_types c² − N) / N²
    *
    * — size-invariant by design (the property raw type/token ratios
    * lack), high for formulaic/generated text, ~100-200 for natural
    * prose. Per group: `(groups..., n_tokens, n_vocab, n_hapax,
    * yule_k_micros)` with K in round-half-up integer micro units (no
    * float surface; the hapax count rides along as the
    * complementary "fresh vocabulary" readout).
    *
    * Determinism: exact integer N, Σc², hapax count; K one exact
    * integral division on decimal products.
    *
    * Scale shape: the [[renyiDiversity]] contract — one (group, token)
    * map-combined aggregation, one group rollup, nothing data-sized
    * after the first exchange.
    */
  def yuleK(df: DataFrame, groupBy: Seq[String], token: Column): DataFrame = {
    require(groupBy.nonEmpty, "yuleK needs group keys")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val gCols = groupBy.map(col)
    val counts = df.select(gCols :+ token.as("__t"): _*)
      .filter(col("__t").isNotNull)
      .groupBy(gCols :+ col("__t"): _*)
      .agg(count(lit(1)).as("__c"))
    val agg = counts.groupBy(gCols: _*).agg(
      sum(col("__c")).as("n_tokens"),
      count(lit(1)).as("n_vocab"),
      sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("n_hapax"),
      sum(col("__c").cast(dec) * col("__c").cast(dec)).as("__c2"))
    agg.select(gCols :+ col("n_tokens") :+ col("n_vocab") :+ col("n_hapax")
      :+ when(col("n_tokens") > 0L,
        expr("(cast(__c2 - n_tokens as decimal(38,0)) * 20000000000 " +
          "+ cast(n_tokens as decimal(38,0)) * n_tokens) div " +
          "(cast(n_tokens as decimal(38,0)) * n_tokens * 2)").cast("long"))
        .as("yule_k_micros"): _*)
  }

  /** Burrows' Delta — the classic stylometric distance between text
    * slices (authorship attribution's workhorse, here the "did this
    * source's register drift away from the others?" screen): over the
    * corpus's `topM` most frequent words, each slice's relative word
    * frequencies z-score ACROSS slices, and
    *
    *   Δ(a, b) = (1/M) Σ_w |z_a(w) − z_b(w)|
    *
    * Per unordered slice pair: `(group_a, group_b, delta_nano)` —
    * BIGINT nano units (no float surface).
    *
    * Determinism: relative frequencies micro-quantize via exact
    * integral division ((c·2·10⁶ + T) div 2T); μ_w/σ_w come from exact
    * integer sums over the K slices; each |z_a − z_b| term
    * nano-quantizes before the exact pair sum and Δ is one final
    * integral division by M. σ_w = 0 (a word used at the same rate
    * everywhere) contributes z = 0 — the standard guard.
    *
    * Scale shape: one (slice, token) map-combined counting pass; the
    * top-M vocabulary is a corpus-frequency sort truncated at M
    * (broadcast back); everything after lives on the K×M grid
    * (slices × words — design-bounded, never corpus-sized): a bounded
    * densification spine, M-row moment rollup, and a w-keyed pair
    * join bounded by K²·M.
    */
  def burrowsDelta(df: DataFrame, groupCol: Column, token: Column,
                   topM: Int = 50): DataFrame = {
    require(topM >= 2 && topM <= 10000, s"topM out of range: $topM")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(groupCol.cast("string").as("__g"), token.as("__t"))
      .filter(col("__g").isNotNull && col("__t").isNotNull)
    val counts = base.groupBy(col("__g"), col("__t"))
      .agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // top-M vocabulary collected to the driver (M strings — bounded)
    // and shipped back as a literal explode: the q_classify posture,
    // so the densification spine is a projection, not a join
    val topTokens: Seq[String] = counts.groupBy(col("__t"))
      .agg(sum(col("__c")).as("__tot"))
      .orderBy(col("__tot").desc, col("__t")).limit(topM)
      .select(col("__t")).collect().map(_.getString(0)).toSeq
    val totals = counts.groupBy(col("__g")).agg(sum(col("__c")).as("__tl"))
    // densified K×M grid with micro relative frequencies (0 for absent)
    val grid = totals
      .select(col("__g"), col("__tl"), explode(typedLit(topTokens)).as("__t"))
      .join(counts, Seq("__g", "__t"), "left")
      .select(col("__g"), col("__t"),
        coalesce(
          expr("(cast(__c as decimal(38,0)) * 2000000 + __tl) div " +
            "(cast(__tl as decimal(38,0)) * 2)"), lit(0L)).as("__f"))
    val mom = grid.groupBy(col("__t")).agg(
      count(lit(1)).as("__k"),
      sum(col("__f").cast(dec)).as("__s1"),
      sum(col("__f").cast(dec) * col("__f").cast(dec)).as("__s2"))
    val kD = col("__k").cast("double")
    val mu = col("__s1").cast("double") / kD
    val sd = sqrt((col("__s2").cast("double") -
      col("__s1").cast("double") * col("__s1").cast("double") / kD) /
      (kD - lit(1.0)))
    val withZ = grid.join(broadcast(mom.select(col("__t"),
        mu.as("__mu"), sd.as("__sd"))), Seq("__t"))
      .select(col("__t"), col("__g"),
        when(col("__sd") > 0.0,
          (col("__f").cast("double") - col("__mu")) / col("__sd"))
          .otherwise(lit(0.0)).as("__z"))
    val a = withZ.select(col("__t"), col("__g").as("group_a"), col("__z").as("__za"))
    val b = withZ.select(col("__t"), col("__g").as("group_b"), col("__z").as("__zb"))
    counts.unpersist(false)
    a.join(b, Seq("__t")).filter(col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        round(abs(col("__za") - col("__zb")) * lit(1e9), 0).cast(dec).as("__d"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(sum(col("__d")).as("__ds"))
      .select(col("group_a"), col("group_b"),
        expr(s"(cast(__ds as decimal(38,0)) * 2 + $topM) div ${2 * topM}")
          .cast("long").as("delta_nano"))
      .orderBy(col("group_a"), col("group_b"))
  }

  /** Gopher-style quality-rule flags (Rae et al. 2021, §A1.1 — the
    * public heuristic ruleset most curation pipelines start from): a
    * struct of 7 booleans, true = the document PASSES the rule.
    *
    *   r_words       50 ≤ word count ≤ 100,000
    *   r_word_len    mean word length in [3, 10] chars
    *   r_symbol      (# + …) symbols ≤ 0.1 per word
    *   r_alpha       ≥ 80% of words contain a letter
    *   r_bullet      ≤ 90% of lines start with a bullet (-, *, •)
    *   r_ellipsis    ≤ 30% of lines end with "..."
    *   r_stop        ≥ 2 distinct common stopwords present
    *
    * Every ratio tests by integer cross-multiplication (10·sym ≤ words,
    * 5·alpha ≥ 4·words, …) — no float thresholds anywhere, so any
    * engine replays each verdict exactly. Null text → null struct.
    */
  def gopherFlags(text: Column): Column = {
    val toks = tokens(text)
    val nw = size(toks).cast("long")
    val chars = length(regexp_replace(text, " ", "")).cast("long")
    val hashes = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val ells = ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3)
      .cast("long")
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l =>
      l.startsWith("-") || l.startsWith("*") || l.startsWith("•"))).cast("long")
    val ellLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
    val stopHits = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(s => when(array_contains(toks, s), 1L).otherwise(0L))
      .reduce(_ + _)
    when(text.isNotNull, struct(
      (nw >= 50L && nw <= 100000L).as("r_words"),
      (chars >= lit(3L) * nw && chars <= lit(10L) * nw).as("r_word_len"),
      (lit(10L) * (hashes + ells) <= nw).as("r_symbol"),
      (lit(5L) * alphaWords >= lit(4L) * nw).as("r_alpha"),
      (lit(10L) * bulletLines <= lit(9L) * nLines).as("r_bullet"),
      (lit(10L) * ellLines <= lit(3L) * nLines).as("r_ellipsis"),
      (stopHits >= 2L).as("r_stop")))
  }

  /** Rule-level funnel over [[gopherFlags]]: one row per rule —
    * `(rule, n_pass, n_fail)` — plus an `all` row for the full
    * conjunction: the "which filter costs me the most data?" table a
    * curation run reads before committing thresholds.
    *
    * Scale shape: the flags ride the corpus scan (pure codegen'd
    * expressions); ONE map-combined aggregation reduces everything to
    * a single row, then a ≤ 8-row literal explode shapes the report.
    */
  def gopherReport(df: DataFrame, text: Column): DataFrame = {
    val rules = Seq("r_words", "r_word_len", "r_symbol", "r_alpha",
      "r_bullet", "r_ellipsis", "r_stop")
    val flagged = df.select(gopherFlags(text).as("__g"))
      .filter(col("__g").isNotNull)
    val passAll = rules.map(r => col(s"__g.$r")).reduce(_ && _)
    val aggs = count(lit(1)).as("n") +:
      rules.map(r => sum(when(col(s"__g.$r"), 1L).otherwise(0L)).as(s"__p_$r")) :+
      sum(when(passAll, 1L).otherwise(0L)).as("__p_all")
    val agg = flagged.agg(aggs.head, aggs.tail: _*)
    val rows = (rules.map(r => (r.stripPrefix("r_"), s"__p_$r")) :+
      ("all", "__p_all")).map { case (name, c) =>
      struct(lit(name).as("rule"), col(c).as("n_pass"),
        (col("n") - col(c)).as("n_fail"))
    }
    agg.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.rule").as("rule"), col("__r.n_pass").as("n_pass"),
        col("__r.n_fail").as("n_fail"))
      .orderBy(col("rule"))
  }
}
