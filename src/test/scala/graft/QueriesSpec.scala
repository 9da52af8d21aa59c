package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run and return rows at sf0.001, and every oracle
  * key must reference a declared query — keeps the driver contract unbreakable. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001 and returns rows") {
      val df = fn(spark, dir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q15: approximate aggregates land within their accuracy bounds") {
    val rows = graft.queries.Relational.q15Approx(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      assert(r.getAs[Boolean]("parts_within_bound"),
        s"$flag: HLL++ distinct (exact ${r.getAs[Long]("exact_parts")}) out of ±15% bound")
      assert(r.getAs[Boolean]("median_within_bound"),
        s"$flag: approx median outside the exact [p40, p60] band")
    }
  }
}
