package graft

import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions

/** Opinionated session factory for the library.
  *
  * Settings chosen for the 100 TB posture: AQE on (runtime re-planning,
  * skew-join splitting, partition coalescing), shuffle partitions sized to
  * the parallelism at hand rather than Spark's default 200 (callers on a
  * real cluster should pass `shufflePartitions ≈ 2-3× total cores` and let
  * AQE coalesce down), UTC session time, and the library's extensions
  * (SQL-registered native expressions) injected.
  */
object GraftSession {

  def builder(appName: String = "graft",
              master: Option[String] = None,
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // persisted intermediates (iterative panels, ANN cells) get
      // AQE-right-sized partitioning instead of pinning
      // shuffle.partitions tasks per pass at any data size
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
    master.foreach(b.master)
    shufflePartitions.foreach(n => b.config("spark.sql.shuffle.partitions", n.toString))
    b
  }

  /** Register the library's SQL functions on an ALREADY-RUNNING session
    * (extensions only apply to sessions built through the builder).
    */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "dot_f64", graft.functions.FunctionBuilders.dotF64, "scala_udf")
    reg.createOrReplaceTempFunction(
      "minhash_sig", graft.functions.FunctionBuilders.minhashSig, "scala_udf")
    reg.createOrReplaceTempFunction(
      "simhash32", graft.functions.FunctionBuilders.simhash32, "scala_udf")
    reg.createOrReplaceTempFunction(
      "shingle_hash64", graft.functions.FunctionBuilders.shingleHash64, "scala_udf")
  }
}
