package graft

import org.scalatest.funsuite.AnyFunSuite

/** CATALOG.md cannot drift: the committed file must equal the
  * generator's output for the CURRENT registry, and every registered
  * query must appear as a row. Regenerate with
  * `sbt "runMain graft.Catalog"` after adding or moving a query.
  */
class CatalogSpec extends AnyFunSuite {

  test("every registered query has a catalog row and the file is regenerated") {
    val rs = Catalog.rows(".")
    val names = rs.map(_.name).toSet
    val missing = SparkEntry.queries.keySet -- names
    assert(missing.isEmpty, s"queries with no catalog row: ${missing.toSeq.sorted.mkString(", ")}")
    val extra = names -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"catalog rows with no registered query: ${extra.toSeq.sorted.mkString(", ")}")

    val committed = {
      val src = scala.io.Source.fromFile("CATALOG.md", "UTF-8")
      try src.mkString finally src.close()
    }
    assert(committed == Catalog.render(rs),
      "CATALOG.md is stale — run `sbt \"runMain graft.Catalog\"` and commit the result")
  }

  test("every catalog row cites a real file:line whose line defines the query function") {
    Catalog.rows(".").foreach { r =>
      val Array(path, lineNo) = r.definedAt.split(":")
      val src = scala.io.Source.fromFile(path, "UTF-8")
      val line = try src.getLines().toVector(lineNo.toInt - 1) finally src.close()
      assert(line.contains("def q"), s"${r.name}: ${r.definedAt} does not point at a def: $line")
    }
  }
}
