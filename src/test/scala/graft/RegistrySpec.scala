package graft

import org.scalatest.funsuite.AnyFunSuite

/** Integrity guards for the per-family query registries: after the
  * SparkEntry split, each family owns a slice of the queries/oracle
  * maps and `++` would silently last-wins on a name collision — these
  * pin the invariants a future family edit could quietly break.
  */
class RegistrySpec extends AnyFunSuite {

  test("no duplicate query names across families; merged sizes add up") {
    // SparkEntry.queries/oracleSql require() this at construction —
    // evaluating them IS the assertion
    assert(SparkEntry.queries.nonEmpty)
    assert(SparkEntry.oracleSql.nonEmpty)
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: ${orphans.toSeq.sorted}")
  }

  test("validation queries are registered and oracled") {
    val missing = SparkEntry.validationQueries -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"validation names not in registry: ${missing.toSeq.sorted}")
    val unoracled = SparkEntry.validationQueries -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty,
      s"validation queries must be oracled (they gate correctness): ${unoracled.toSeq.sorted}")
  }

  test("rows-only queries are exactly the documented xxhash64 set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q_dedup_minhash", "q_dedup_simhash", "q_fingerprint"),
      s"a query lost (or gained) its oracle: ${rowsOnly.toSeq.sorted}")
  }

  test("oracle SQL is non-blank") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: blank oracle")
    }
  }
}
