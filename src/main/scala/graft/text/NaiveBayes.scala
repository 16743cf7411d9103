package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes, trained AND scored inside the engine — the
  * first rung of trainable text classification above
  * [[Classify]]'s fixed-weight scorer (the reference-free baseline
  * every curation stack fits before reaching for embeddings):
  *
  *   score(d, c) = ln P(c) + Σ_{t ∈ d} tf_d(t) · ln P(t | c)
  *   P(t | c) = (cnt(t,c) + 1) / (N_c + V)      (Laplace smoothing)
  *
  * Everything is count arithmetic, so the WHOLE pipeline — training,
  * smoothing, scoring, argmax — replays in a SQL oracle: every `ln`
  * takes an INTEGER argument (counts, class totals, V), each term
  * nano-quantizes before the per-document sums, and the argmax breaks
  * score ties by class name (max struct ordering), never by plan order.
  *
  * Scale shape: training is one (token, class)-keyed map-combined
  * aggregation to a vocab×classes table; scoring is the BM25 postings
  * shape — doc-term counts equi-join the model on the token key
  * (per-token fanout = classes containing it, ≤ |classes|), the
  * (doc, class) spine comes from a grand-collect + explode (generator
  * fanout, no cross join), and per-(doc, class) sums map-combine. The
  * model table is vocabulary-bounded, never corpus-bounded.
  */
object NaiveBayes {

  /** Train on `(labelCol, textCol)` and score every row, returning
    * `(idCol, label, predicted, n_classes)` — resubstitution scoring
    * when train and test coincide; split callers pass disjoint frames
    * through [[trainModel]]/[[scoreWith]] directly.
    */
  case class Model(tokenLogLik: DataFrame, classTable: DataFrame)

  /** (token, class) adjusted log-likelihoods + per-class constants.
    *
    * tokenLogLik: `(t, c, ll_adj)` with ll_adj = ln(cnt+1) − ln(1) =
    * ln(cnt(t,c)+1) in nanos MINUS the per-class default (so missing
    * (t,c) pairs contribute exactly 0 and the join may drop them);
    * classTable: `(c, prior_nanos, ll_default_nanos, n_docs)`.
    */
  def trainModel(docs: DataFrame, labelCol: Column, textCol: Column): Model = {
    val toks = docs.select(labelCol.as("__c"),
        explode(TextStats.tokens(textCol)).as("__t"))
      .filter(col("__c").isNotNull && col("__t").isNotNull)
    // NOTE (r14): tc is read three times (V, N_c, likelihoods) but the
    // three consumers share one canonical (t,c) exchange subtree, so
    // ReuseExchange already evaluates the tokenize-explode once at
    // runtime; a localCheckpoint here measured SLOWER (the LogicalRDD
    // loses size stats, degrading the postings broadcast join to SMJ)
    val tc = toks.groupBy(col("__t"), col("__c")).agg(count(lit(1)).as("__n"))
    // V = distinct tokens across the corpus; N_c = tokens per class;
    // docs_c / docs_total for the prior — all integer counts
    val vocab = tc.agg(countDistinct(col("__t")).as("__V"))
    val perClass = tc.groupBy(col("__c")).agg(sum(col("__n")).as("__Nc"))
    val docsPerClass = docs.select(labelCol.as("__c"))
      .filter(col("__c").isNotNull)
      .groupBy(col("__c")).agg(count(lit(1)).as("n_docs"))
    val totalDocs = docsPerClass.agg(sum(col("n_docs")).as("__D"))
    def nanos(c: Column): Column = round(c * lit(1e9), 0).cast("long")
    val classTable = perClass
      .join(docsPerClass, Seq("__c"))
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(totalDocs))
      .select(col("__c"),
        (nanos(log(col("n_docs").cast("double")))
          - nanos(log(col("__D").cast("double")))).as("prior_nanos"),
        (lit(0L) - nanos(log((col("__Nc") + col("__V")).cast("double"))))
          .as("ll_default_nanos"),
        col("n_docs"))
    // ll(t,c) − ll_default(c) = ln(cnt+1) − ln(1) = ln(cnt+1): the
    // adjusted form needs NO class join at all — it is class-local
    val tokenLogLik = tc.select(col("__t"), col("__c"),
      nanos(log((col("__n") + lit(1L)).cast("double"))).as("ll_adj"))
    Model(tokenLogLik, classTable)
  }

  /** Score documents against a trained model: per (doc, class),
    * score = prior + n_tokens·ll_default + Σ_matched tf·ll_adj, all in
    * exact nanos; predicted = argmax with ties broken by LARGEST class
    * name (max-struct ordering — deterministic, plan-independent).
    * Returns `(idCol, predicted, score_nanos)`.
    */
  def scoreWith(model: Model, docs: DataFrame, idCol: String,
                textCol: Column): DataFrame = {
    // dt feeds both the length sums and the postings join through one
    // canonical (id,t) exchange — ReuseExchange shares it at runtime
    // (checkpointing here measured slower; see trainModel's note)
    val dt = docs.select(col(idCol).as("__id"),
        explode(TextStats.tokens(textCol)).as("__t"))
      .filter(col("__t").isNotNull)
      .groupBy(col("__id"), col("__t")).agg(count(lit(1)).as("__tf"))
    val perDoc = dt.groupBy(col("__id")).agg(sum(col("__tf")).as("__ntok"))
    // matched contribution: one token-keyed equi-join (postings shape)
    val matched = dt.join(model.tokenLogLik, dt("__t") === model.tokenLogLik("__t"))
      .groupBy(col("__id"), col("__c"))
      .agg(sum(col("__tf") * col("ll_adj")).as("__m"))
    // (doc, class) spine by grand-collect + explode — no cross join
    val classArr = model.classTable
      .agg(sort_array(collect_list(struct(col("__c"), col("prior_nanos"),
        col("ll_default_nanos")))).as("__cs"))
    val spine = perDoc.crossJoin(broadcast(classArr))
      .select(col("__id"), col("__ntok"), explode(col("__cs")).as("__e"))
      .select(col("__id"), col("__ntok"),
        col("__e.__c").as("__c"),
        col("__e.prior_nanos").as("__prior"),
        col("__e.ll_default_nanos").as("__lld"))
    val scored = spine.join(matched, Seq("__id", "__c"), "left")
      .select(col("__id"), col("__c"),
        (col("__prior") + col("__ntok") * col("__lld")
          + coalesce(col("__m"), lit(0L))).as("__score"))
    scored.groupBy(col("__id"))
      .agg(max(struct(col("__score"), col("__c"))).as("__best"))
      .select(col("__id").as(idCol),
        col("__best.__c").as("predicted"),
        col("__best.__score").as("score_nanos"))
  }

  /** Train-and-score convenience: resubstitution confusion counts
    * `(label, predicted, n)` — the accuracy view a pipeline reads
    * before trusting the model on unlabeled data.
    */
  def confusion(docs: DataFrame, idCol: String, labelCol: Column,
                textCol: Column): DataFrame = {
    val model = trainModel(docs, labelCol, textCol)
    val preds = scoreWith(model, docs, idCol, textCol)
    docs.select(col(idCol), labelCol.as("label"))
      .join(preds, Seq(idCol))
      .groupBy(col("label"), col("predicted"))
      .agg(count(lit(1)).as("n"))
  }
}
