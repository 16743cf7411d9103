package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-reproducible sampling and dataset splitting.
  *
  * Training pipelines need splits that are (a) stable across reruns and
  * cluster sizes — `rand()` is neither — and (b) a pure function of a row
  * key, so late-arriving rows land in the same split. Everything here
  * derives from an md5-based hash bucket of the key column: md5 is
  * available in every engine (the DuckDB oracle reproduces it hex-for-hex),
  * and bucketing is a narrow map — no shuffle, no state.
  *
  * For hot paths where cross-engine reproducibility is not needed,
  * swap [[hashBucket]]'s md5 for `xxhash64` (cheaper, same contract).
  */
object Sampling {

  /** Uniform bucket in [0, nBuckets) from the key's md5: first 8 hex chars
    * → 32-bit int → mod. Unsigned 32-bit value, so no negative-mod
    * surprises.
    */
  def hashBucket(key: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(nBuckets.toLong))

  /** Deterministic weighted sampling without replacement (Efraimidis-
    * Spirakis A-ES): each row draws a reproducible uniform `u` from its
    * key's md5 and ranks by `-ln(u) / w`; the k smallest ranks are the
    * sample. Inclusion probability rises with weight, the draw is a pure
    * function of (key, seed) — rerun-stable, cluster-layout-stable, and
    * a different `seed` gives an independent sample.
    *
    * Scale shape: a narrow map then global top-k, which Spark plans as
    * TakeOrderedAndProject — per-partition k-heaps merged at the driver,
    * never a full sort. Rows with weight ≤ 0, null, or NaN are excluded
    * (a row without a valid positive weight must never be drawn; NaN
    * compares GREATER than every number in Spark's ordering, so an
    * unguarded `> 0` would let 0.0/0.0-style ratios through).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String, k: Int,
                     seed: String = ""): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    Guards.requireNoReservedNames(df, Seq("__ws_rank"), "weightedSample")
    val buckets = 1 << 30
    val u = (hashBucket(concat_ws("::", col(keyCol), lit(seed)), buckets) + lit(0.5)) /
      lit(buckets.toDouble)
    df.filter(col(weightCol).isNotNull && !isnan(col(weightCol)) && col(weightCol) > 0)
      .withColumn("__ws_rank", -log(u) / col(weightCol))
      // key tiebreak: u has 2^30 distinct values, so equal-weight rows CAN
      // tie on rank — without a total order the k-boundary row would be
      // partition-layout-dependent, breaking the rerun-identity contract
      .orderBy(col("__ws_rank"), col(keyCol))
      .limit(k)
      .drop("__ws_rank")
  }

  /** Leakage-safe split: like [[deterministicSplit]], but rows connected
    * by `pairs` (near-duplicate edges from any pair producer —
    * [[graft.text.Similarity.lshNearDupPairs]],
    * [[graft.text.Fuzzy.fuzzyDupPairs]], ...) are split BY THEIR
    * DUPLICATE CLUSTER, so two near-copies can never land one in train
    * and one in test — the split-level contamination that per-row
    * hashing cannot prevent. Each row's split key is its component's
    * minimum member id ([[graft.text.Dedup.connectedComponents]]);
    * unpaired rows key on their own id, reproducing the per-row split.
    *
    * Cost on top of the narrow per-row split: the component loop over
    * the PAIRS (edge-count-sized, not corpus-sized) plus one left join
    * of the corpus against the paired-vertex labels.
    *
    * RETAINED STATE: the paired-vertex labels ride the returned plan as
    * a localCheckpoint (same contract as
    * [[graft.text.Dedup.connectedComponents]]) — already compact (two
    * ids per PAIRED vertex, nothing corpus-sized); it is freed by the
    * ContextCleaner once the returned plan is no longer referenced.
    */
  def splitByGroup(df: DataFrame, idCol: String, pairs: DataFrame,
                   weights: Seq[(String, Double)],
                   splitCol: String = "split"): DataFrame = {
    Guards.requireNoReservedNames(df,
      Seq(splitCol, "__group_root", "__group_key"), "splitByGroup")
    val labels = graft.text.Dedup.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("v", idCol).withColumnRenamed("label", "__group_root")
    val keyed = df.join(labels, Seq(idCol), "left")
      .withColumn("__group_key", coalesce(col("__group_root"), col(idCol)))
    deterministicSplit(keyed, "__group_key", weights, splitCol)
      .drop("__group_root", "__group_key")
  }

  /** Deterministic train/validation/test-style split: `weights` are
    * (label, weight) pairs; each row's label is chosen by its key's hash
    * bucket falling into the cumulative weight range (resolution 1/10000).
    * Rows with a NULL key deterministically land in the LAST label (they
    * must belong to exactly one split; last = the conventional test/held
    * -out bucket, and the SQL `CASE ... ELSE last` form matches).
    */
  def deterministicSplit(df: DataFrame, keyCol: String,
                         weights: Seq[(String, Double)],
                         splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val total = weights.map(_._2).sum
    val bucket = hashBucket(col(keyCol), 10000)
    val cuts = weights.scanLeft(0.0)(_ + _._2 / total).map(f => (f * 10000).round)
    val expr = weights.zipWithIndex.foldLeft(lit(weights.last._1)) {
      case (acc, ((label, _), i)) =>
        when(bucket >= cuts(i) && bucket < cuts(i + 1), label).otherwise(acc)
    }
    df.withColumn(splitCol, expr)
  }

  /** Deterministic fraction sample: keeps the same rows on every run and
    * on any cluster layout (unlike `df.sample`).
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(keyCol), 10000) < (fraction * 10000).round)

  /** Per-stratum deterministic sample (the hash-stable `sampleBy`): each
    * stratum value gets its own keep-fraction; strata absent from the map
    * use `default` (0.0 = dropped).
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       default: Double = 0.0): DataFrame = {
    val bucket = hashBucket(col(keyCol), 10000)
    val threshold = fractions.foldLeft(lit((default * 10000).round)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === lit(stratum), lit((f * 10000).round)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** EXACT-count stratified sample: per stratum, keep exactly
    * `⌊fraction · n_stratum⌋` rows — the eval-set primitive hash-bucket
    * thresholds ([[stratifiedSample]]) cannot provide: bucket sampling
    * keeps a binomially-distributed count, and for a 500-row benchmark
    * stratum "±2%" is a different benchmark. Selection is deterministic
    * and layout-independent: rows rank by `(md5(key), key)` within their
    * stratum (an engine-reproducible total order — the md5 discipline of
    * [[hashBucket]]) and the first `quota` win; late-arriving data
    * changes quotas only where counts change.
    *
    * Scale shape: ONE shuffle on the strata columns; the quota count
    * rides the same window partition as the rank (no second aggregation
    * pass, no driver state). The per-stratum sort is the price of
    * exactness — strata are typically benchmark- or source-sized, far
    * below partition limits; for corpus-sized strata with approximate
    * tolerance use [[stratifiedSample]].
    */
  def stratifiedExact(df: DataFrame, strataCols: Seq[String], keyCol: String,
                      fraction: Double): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction in [0,1]: $fraction")
    Guards.requireNoReservedNames(df, Seq("__se_rank", "__se_n"), "stratifiedExact")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string").cast("binary")), col(keyCol))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
    df.withColumn("__se_rank", row_number().over(w))
      .withColumn("__se_n", count(lit(1)).over(wAll))
      .filter(col("__se_rank") <= floor(col("__se_n") * fraction))
      .drop("__se_rank", "__se_n")
  }

  /** Training-mixture construction: downsample each source so the
    * retained rows hit `targetWeights` proportions at the MAXIMUM
    * feasible size — the binding source (largest target share relative
    * to its supply) keeps everything, every other source downsamples to
    * match: with observed counts n_s, feasible total T = min_s(n_s/w_s)
    * and keepRate_s = w_s·T/n_s. Rates come from one tiny
    * groupBy-count (one collected row per source — the ONLY driver-side
    * data); row selection is the same deterministic md5 bucket as
    * [[deterministicSplit]] (resolution 1/10000), so the mix is
    * rerun-stable and layout-independent. Sources absent from
    * `targetWeights` are dropped.
    */
  def resampleToMixture(df: DataFrame, sourceCol: String, keyCol: String,
                        targetWeights: Map[String, Double]): DataFrame = {
    require(targetWeights.nonEmpty && targetWeights.values.forall(_ > 0),
      "targetWeights must be non-empty with positive weights")
    val inScope = df.filter(col(sourceCol).isin(targetWeights.keys.toSeq: _*))
    val counts = inScope.groupBy(col(sourceCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.keySet == targetWeights.keySet,
      s"sources with no rows cannot anchor a mixture: missing ${targetWeights.keySet -- counts.keySet}")
    val total = counts.map { case (s, n) => n / targetWeights(s) }.min
    // fractions round-trip exactly through stratifiedSample's
    // (f * 10000).round — integer cutoffs divided by 10000.0 are exact
    val fractions = counts.map { case (s, n) =>
      s -> math.min((targetWeights(s) * total / n * 10000).round, 10000L) / 10000.0
    }
    stratifiedSample(inScope, keyCol, sourceCol, fractions)
  }

  /** Per-group cap (domain-balance control, C4/RefinedWeb style "at most
    * k pages per domain"): keep a deterministic k-subset of each group,
    * chosen by md5 hash order of the key — rerun- and layout-stable, and
    * unbiased w.r.t. any natural ordering of the data (keeping the
    * "first" k rows would keep whatever the crawl happened to fetch
    * first). One hash shuffle on the group columns; Spark's
    * WindowGroupLimit pushes the rank filter below the sort at scale.
    */
  def capPerGroup(df: DataFrame, parts: Seq[String], keyCol: String, k: Int): DataFrame = {
    require(parts.nonEmpty, "need at least one grouping column")
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(parts.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string").cast("binary")).asc, col(keyCol).asc)
    df.withColumn("__cap_rk", row_number().over(w))
      .filter(col("__cap_rk") <= k)
      .drop("__cap_rk")
  }

  /** Hamilton largest-remainder apportionment: split an integer `budget`
    * across groups EXACTLY in proportion to integer weights — the missing
    * complement of [[resampleToMixture]] (which keeps fractions, not a
    * fixed total). Each group gets `floor(budget·w/W)` plus one of the
    * `budget − Σfloor` leftovers, awarded by largest fractional remainder
    * (ties to the smaller key). Guarantees: quotas sum to `budget`
    * exactly; each quota is within 1 of its exact proportional share;
    * everything is integer/decimal arithmetic an independent engine
    * replays bit-for-bit.
    *
    * `weights` is a per-GROUP table — bounded by group count, so the
    * whole-frame remainder window is bounded by construction (the q_drift
    * bin-table doctrine), and the 1-row totals ride broadcasts. Products
    * go through DECIMAL(38,0): a 10^12-row source times a 10^9 budget
    * cannot overflow.
    *
    * @return (keyCol, weightCol, quota long)
    */
  def apportion(weights: DataFrame, keyCol: String, weightCol: String,
                budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // the weight table is group-bounded by contract but often DERIVED
    // from a corpus-sized aggregation; it feeds three sub-plans (total,
    // base quotas, remainder count) — materialize it once so the
    // upstream aggregation never replays per reference
    val w0 = weights.select(col(keyCol), col(weightCol)).localCheckpoint()
    val tot = w0.agg(sum(col(weightCol).cast(dec)).as("__W"))
    val based = w0.select(col(keyCol), col(weightCol))
      .crossJoin(tot)
      .select(col(keyCol), col(weightCol),
        (lit(budget).cast(dec) * col(weightCol).cast(dec)).as("__kw"), col("__W"))
      // exact floor division: __kw - pmod(__kw, __W) is divisible by __W
      .select(col(keyCol), col(weightCol),
        ((col("__kw") - pmod(col("__kw"), col("__W"))) / col("__W"))
          .cast("long").as("__base"),
        pmod(col("__kw"), col("__W")).as("__rem"))
    val extra = based.agg((lit(budget) - sum(col("__base"))).cast("long").as("__extra"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(keyCol).asc)
    based.crossJoin(extra)
      .withColumn("__rk", row_number().over(w))
      .select(col(keyCol), col(weightCol),
        (col("__base") + when(col("__rk") <= col("__extra"), 1L).otherwise(0L))
          .as("quota"))
  }

  /** Materialize per-group quotas ([[apportion]]'s output, or any
    * `(groupCols, quota)` table): keep each group's first `quota` rows in
    * the unbiased md5-hash order ([[capPerGroup]]'s selection rule, made
    * per-group-dynamic). The quota table is group-bounded, so the join is
    * hint-free (AQE broadcasts it); rows shuffle once on the group key.
    */
  def takeApportioned(df: DataFrame, groupCols: Seq[String], keyCol: String,
                      quotas: DataFrame): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(keyCol).cast("string").cast("binary")).asc, col(keyCol).asc)
    df.join(quotas, groupCols)
      .withColumn("__ap_rk", row_number().over(w))
      .filter(col("__ap_rk") <= col("quota"))
      .drop("__ap_rk")
  }

  /** Temporal split with a purge embargo — the leakage control for
    * time-ordered data that hash splits can't give: train strictly
    * before `cutoff − embargo`, test at/after `cutoff`, and the embargo
    * band in between EXCLUDED from both (rows whose influence straddles
    * the boundary — label windows, rolling features — would otherwise
    * leak future into train; the finance literature's "purged" split).
    * Appends a `split` column ("train" | "embargo" | "test").
    *
    * Boundaries are integer epoch-MICROSECOND comparisons (no interval /
    * calendar arithmetic, which engines disagree on): narrow map,
    * scan-shaped, no shuffle.
    */
  def temporalSplit(df: DataFrame, tsCol: Column, cutoffUs: Long,
                    embargoUs: Long): DataFrame = {
    require(embargoUs >= 0, s"embargoUs must be non-negative: $embargoUs")
    val us = unix_micros(tsCol)
    df.withColumn("split",
      when(us < lit(cutoffUs - embargoUs), "train")
        .when(us < lit(cutoffUs), "embargo")
        .otherwise("test"))
  }

  /** Deterministic global shuffle — the training-data "shuffle and
    * shard" step ([shard, pos] assignment a dataloader consumes)
    * WITHOUT `rand()`: the order is the md5 of `seed:key`, so a rerun,
    * a different partitioning, or an independent engine produces the
    * IDENTICAL permutation, and changing the seed string is a fresh
    * epoch's shuffle. Returns the input plus `(shard, pos)` — shard in
    * [0, nShards), pos the 0-based position within the shard in hash
    * order.
    *
    * Shard and position derive from DISJOINT hex ranges of one digest
    * (shard from chars 1-8, order from chars 9-24 — using the same
    * range for both would sort each shard by the value that chose it,
    * leaving the high-order shard structure visible in the stream);
    * `key` breaks exact digest ties so duplicate-free keys give a
    * total order.
    *
    * Scale shape: one exchange keyed on shard; each shard sorts
    * locally for `row_number` (Spark plans the partition-local sort
    * under the window). Per-shard state is the shard itself — size
    * `nShards` to the dataloader's file-size target (the usual
    * contract), NOT to the cluster: 100 TB into 4096 shards is ~25 GB
    * of spill-safe sort per task, and the emitted (shard, pos) pairs
    * are exactly a shard-file writer's layout.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String, nShards: Int,
                           seed: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val hex = md5(concat(lit(seed), lit(":"), col(keyCol).cast("string"))
      .cast("binary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(substring(col("__dsh"), 9, 16).asc, col(keyCol).asc)
    df.withColumn("__dsh", hex)
      .withColumn("shard",
        pmod(conv(substring(col("__dsh"), 1, 8), 16, 10).cast("long"), lit(nShards)))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop("__dsh")
  }

  /** Deterministic negative-pair mining (contrastive-training prep): for
    * each row, `k` pseudo-random partners — reproducible across reruns
    * and engines, unlike `rand()`-ordered self-joins, and NOT an O(n²)
    * shape.
    *
    * Mechanics: ids hash into `nBuckets` buckets; probe `j` of an id
    * targets bucket `(bucket(id) + hash(id#j)) mod nBuckets` and pairs
    * with that bucket's representative (its minimum id). One narrow map
    * + a broadcast join against the tiny representative table — the
    * corpus never shuffles. Probes that land in an empty bucket, or on
    * themselves, are dropped (expect ~k·(1 - 1/nBuckets) pairs per row
    * for corpora ≫ nBuckets).
    */
  def negativePairs(df: DataFrame, idCol: String, k: Int,
                    nBuckets: Int = 1024): DataFrame = {
    require(k > 0, "k must be positive")
    require(nBuckets > 1, "need at least two buckets")
    val id = col(idCol)
    val bucketed = df.select(id, hashBucket(id, nBuckets).as("__b"))
    val reps = bucketed.groupBy(col("__b")).agg(min(id).as("neg_id"))
      .withColumnRenamed("__b", "__pb")
    val probe = hashBucket(
      concat(id.cast("string"), lit("#"), col("j").cast("string")), nBuckets)
    bucketed
      .select(id, col("__b"), explode(array((1 to k).map(lit): _*)).as("j"))
      .withColumn("__pb", pmod(col("__b") + probe, lit(nBuckets.toLong)))
      .join(broadcast(reps), Seq("__pb"))
      .filter(col("neg_id") =!= id)
      // two probes of one id can land in the same bucket (~k²/nBuckets of
      // rows) and would emit the same partner twice — a wasted/biased
      // slot in a contrastive batch. Keep one row per distinct partner
      // (the lowest probe index).
      .groupBy(id, col("neg_id"))
      .agg(min(col("j")).as("j"))
      .select(id, col("j"), col("neg_id"))
  }

  /** Neyman allocation — the OPTIMAL stratified sampling design: a
    * fixed `budget` of samples split across strata proportionally to
    * N_h·S_h (stratum size × stratum spread), which minimizes the
    * variance of the stratified mean at fixed cost (the survey-design
    * theorem behind every serious stratified audit; proportional
    * allocation ignores S_h and oversamples homogeneous strata).
    * Integerization reuses [[apportion]]'s largest-remainder exact
    * path. Returns `(strata, n_rows, sd, weight, quota)`; a
    * zero-variance stratum carries weight 0 and quota 0 — by Neyman's
    * own logic one observation tells you everything about it, so give
    * it a floor upstream if operationally required (documented).
    *
    * Determinism: moments are exact integer micro sums; sd is one
    * fixed IEEE tree; the weight re-quantizes to an exact integer
    * (micro units) BEFORE apportionment, and apportion's floor/remainder
    * arithmetic is exact decimal end-to-end.
    *
    * Scale shape: one strata-keyed map-combined moment pass, then
    * [[apportion]] on the strata-bounded weight table.
    */
  def neymanAllocation(df: DataFrame, strataCol: String, valueCol: Column,
                       budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def q(c: Column): Column = round(c * lit(1e6), 0).cast("long")
    val m = df.select(col(strataCol), q(valueCol).as("__x"))
      .filter(col(strataCol).isNotNull && col("__x").isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__x").cast(dec)).as("__s1"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__s2"))
    val nD = col("n_rows").cast("double")
    val s1d = col("__s1").cast("double")
    val sdMicro = when(col("n_rows") >= 2,
      sqrt((col("__s2").cast("double") - s1d * s1d / nD) / (nD - lit(1.0))))
      .otherwise(lit(0.0))
    val weights = m.select(col(strataCol), col("n_rows"),
      round(sdMicro / lit(1e6), 6).as("sd"),
      // N_h·S_h in micro units, re-quantized to an exact integer weight
      round(nD * sdMicro, 0).cast("long").as("weight"))
    val quotas = apportion(weights.select(col(strataCol), col("weight")),
      strataCol, "weight", budget)
    weights.join(quotas.select(col(strataCol), col("quota")), Seq(strataCol))
  }
}
