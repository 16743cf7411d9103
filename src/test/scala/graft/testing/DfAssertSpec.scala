package graft.testing

import org.scalatest.funsuite.AnyFunSuite

import graft.testing.DfAssert._

/** Test-scaffolding parity with the reference's builder helpers
  * (reference testing.py:9-87): date literals and the flat-column analogs
  * of the MultiIndex builders.
  */
class DfAssertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("toDate / toTs parse fixture literals") {
    assert(toDate("2024-02-01") == java.sql.Date.valueOf("2024-02-01"))
    assert(toTs("2024-02-01") == java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    assert(toTs("2024-02-01 10:30:00") == java.sql.Timestamp.valueOf("2024-02-01 10:30:00"))
    assert(toTs("2024-02-01T10:30:00") == java.sql.Timestamp.valueOf("2024-02-01 10:30:00"))
  }

  test("createMultiColumnDf joins level labels into flat names") {
    val df = createMultiColumnDf(spark, Seq(
      Seq("price", "price", "weight"),
      Seq("p1", "p2", "p1"),
      Seq[Any](1.3, 1.4, 5.0),
      Seq[Any](2.3, 2.4, 6.0)), columnLevels = 2)
    assert(df.columns.toSeq == Seq("price_p1", "price_p2", "weight_p1"))
    assert(df.count() == 2)
  }

  test("createDfWithMultiIndices mirrors the reference doctest shape") {
    // reference testing.py:50-73 example, flat-spelled
    val df = createDfWithMultiIndices(spark,
      data = Seq(
        Seq("price", "price", "weight", "weight"),
        Seq("product_1", "product_2", "product_1", "product_2"),
        Seq[Any]("retailer_1", "abc", 1.3, 1.3, 5, 6),
        Seq[Any]("retailer_1", "xyz", 1.3, 1.3, 5, 6),
        Seq[Any]("retailer_2", "abc", 1.3, 1.3, 5, 6),
        Seq[Any]("retailer_2", "xyz", 1.3, 1.3, 5, 6)),
      columnLabels = Seq("value", "product"),
      indexLabels = Seq("retailer", "group"))
    assert(df.columns.toSeq == Seq("retailer", "group",
      "price_product_1", "price_product_2", "weight_product_1", "weight_product_2"))
    assert(df.count() == 4)
    assert(df.filter(df("retailer") === "retailer_1").count() == 2)
  }

  test("builders reject malformed grids") {
    intercept[IllegalArgumentException] {
      createMultiColumnDf(spark, Seq(Seq("a", "b")), columnLevels = 1)
    }
    intercept[IllegalArgumentException] {
      createDfWithMultiIndices(spark,
        Seq(Seq("a", "b"), Seq[Any](1, 2)), // missing index value in data row
        columnLabels = Seq("value"), indexLabels = Seq("idx"))
    }
  }
}
