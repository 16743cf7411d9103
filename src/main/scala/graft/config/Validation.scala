package graft.config

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Config validation against the catalog and the filesystem (reference:
  * ons_utils/config/validation.py). The py4j `_jsparkSession.catalog()`
  * bridge hack (validation.py:318-320) becomes the public
  * `spark.catalog.tableExists`; HDFS probes go through the session's Hadoop
  * FileSystem with a small memo cache (the reference's lru_cache,
  * validation.py:313-315). The reference's `get_inner` recursion bug
  * (validation.py:275, drops the config argument) is not replicated.
  */
object Validation {

  /** Bounded LRU memo for filesystem probes (the reference's
    * `lru_cache(maxsize=32)`, validation.py:313-315) — an unbounded map
    * would slow-leak on a long-lived driver probing many paths.
    */
  private[config] val maxFileCacheEntries = 32
  private val fileCache =
    new java.util.LinkedHashMap[String, Boolean](64, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Boolean]): Boolean =
        size() > maxFileCacheEntries
    }

  private[config] def cachedPathCount: Int = fileCache.synchronized(fileCache.size())
  private[config] def isCached(path: String): Boolean =
    fileCache.synchronized(fileCache.containsKey(path))

  /** S2 — Hive/catalog table existence. */
  def tableExists(spark: SparkSession, database: String, table: String): Boolean =
    spark.catalog.tableExists(s"$database.$table")

  /** S1 — column names of a catalog table. */
  def tableColumns(spark: SparkSession, table: String): Seq[String] =
    spark.catalog.listColumns(table).collect().toSeq.map(_.name)

  /** S3 — file existence on the session's filesystem, memoized (LRU).
    * The filesystem RPC runs OUTSIDE the cache monitor — a slow namenode
    * probe must not block other threads' cache hits. Concurrent misses
    * on the same path may probe twice; last write wins, both see the
    * same answer.
    */
  def fileExists(spark: SparkSession, path: String): Boolean = {
    val cached = fileCache.synchronized {
      if (fileCache.containsKey(path)) Some(fileCache.get(path): Boolean) else None
    }
    cached.getOrElse {
      val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
      val exists = fs.isFile(new HPath(path))
      fileCache.synchronized(fileCache.put(path, exists))
      exists
    }
  }

  def clearCache(): Unit = fileCache.synchronized(fileCache.clear())

  /** Validate that mapping-valued attr `key` holds existing input files;
    * sections with `active: false` are skipped (validation.py:250-259).
    * Returns human-readable error lines; empty = valid.
    */
  def validateInputFiles(spark: SparkSession, cfg: Config, key: String): Seq[String] = {
    if (!cfg.has(key)) return Seq(s"missing config section: $key")
    cfg.getMap(key).toSeq.flatMap {
      case (section, m: Map[_, _]) =>
        val sec = m.asInstanceOf[Map[String, Any]]
        if (sec.get("active").contains(false)) Nil
        else sec.collect {
          case (field, path: String)
            if field != "active" && !fileExists(spark, path) =>
              s"$key.$section.$field: file does not exist: $path"
        }
      case (section, path: String) if !fileExists(spark, path) =>
        Seq(s"$key.$section: file does not exist: $path")
      case _ => Nil
    }
  }

  /** Required-key/type predicate check (stand-in for the reference's
    * cerberus schemas, which are largely commented out there).
    */
  def requireKeys(cfg: Config, keys: Seq[String]): Seq[String] =
    keys.filterNot(cfg.has).map(k => s"missing required config attribute: $k")

  /** Render the error report (validation.py:196-205 flavor): empty string
    * means the config is valid.
    */
  def report(errors: Seq[String]): String =
    if (errors.isEmpty) ""
    else ("Config validation failed:" +: errors.map("  - " + _)).mkString("\n")
}
