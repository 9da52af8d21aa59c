package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted join / salted distinct-count: identical results to the unsalted
  * formulations on skewed data, and the salt actually spreads the hot key. */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 90% of left rows share key 0 (the hot key); right has 3 rows per key
  private lazy val left = (0 until 2000).map { i =>
    val k = if (i % 10 == 0) (i / 10) % 20 else 0
    (k, i.toLong)
  }.toDF("k", "lv")
  private lazy val right = (0 until 20).flatMap { k =>
    (0 until 3).map(j => (k, s"r$k-$j"))
  }.toDF("k", "rv")

  test("saltedJoin equals the plain equi-join on skewed keys") {
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
    val salted = Skew.saltedJoin(left, right, Seq("k"), numSalts = 8)
      .select("k", "lv", "rv")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("left salt actually scatters the hot key across buckets") {
    val salts = left.filter($"k" === 0)
      .withColumn("__salt", pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts == 8)
  }

  test("saltedJoinSkewed equals the plain join; cold-only input stays unreplicated") {
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
    val salted = Skew.saltedJoinSkewed(left, right, Seq("k"),
      numSalts = 8, hotThreshold = 100L) // only key 0 qualifies (1800 rows)
    assert(salted.select("k", "lv", "rv").exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted.select("k", "lv", "rv")).count() == 0)
    // with the threshold above every key's count, nothing is hot: results
    // still match and no right row is replicated (pass-through degradation)
    val cold = Skew.saltedJoinSkewed(left, right, Seq("k"),
      numSalts = 8, hotThreshold = 10000L)
    assert(cold.select("k", "lv", "rv").exceptAll(plain).count() == 0)
    assert(plain.exceptAll(cold.select("k", "lv", "rv")).count() == 0)
  }

  test("saltedDistinctCount equals plain countDistinct per group") {
    val df = left.withColumn("v", concat(lit("u"), ($"lv" % 97).cast("string")))
    val plain = df.groupBy("k").agg(countDistinct("v").as("n_distinct"))
    val salted = Skew.saltedDistinctCount(df, Seq("k"), "v", numSalts = 8)
    val joined = plain.withColumnRenamed("n_distinct", "a")
      .join(salted.withColumnRenamed("n_distinct", "b"), Seq("k"))
    assert(joined.filter($"a" =!= $"b").count() == 0)
    assert(joined.count() == plain.count())
  }
}
