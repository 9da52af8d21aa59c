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
    import org.apache.spark.sql.functions._
    val approx = graft.queries.Relational.q15Approx(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = graft.sources.Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("parts"),
        expr("percentile(l_extendedprice, 0.5)").as("median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (parts, median)) =>
      val (aParts, aMedian) = approx(k)
      assert(math.abs(aParts - parts).toDouble / parts < 0.15,
        s"$k: approx distinct $aParts vs exact $parts")
      assert(math.abs(aMedian - median) / median < 0.05,
        s"$k: approx median $aMedian vs exact $median")
    }
  }
}
