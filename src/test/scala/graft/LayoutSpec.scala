package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Layout, Tables}

/** Layout operators: the z-order interleave is bit-exact vs a reference
  * loop, and clusteredWrite really produces files with disjoint key ranges
  * (the property row-group/file skipping depends on). */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference Morton interleave: plain bit loop. */
  private def zRef(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 31)
      z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    z
  }

  test("zorder matches the reference bit interleave, including 31-bit extremes") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 256L),
      (2147483647L, 0L), (0L, 2147483647L), (2147483647L, 2147483647L),
      (1234567890L, 987654321L))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorder(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(z == zRef(a, b), s"zorder($a,$b)=$z, want ${zRef(a, b)}")
      assert(z >= 0, s"zorder($a,$b) must stay non-negative")
    }
  }

  test("zorder is monotone in each dimension with the other fixed") {
    val df = (0L until 200L).toDF("a")
      .select(Layout.zorder(col("a"), lit(77L)).as("z"))
    val zs = df.collect().map(_.getLong(0))
    assert(zs.sliding(2).forall(p => p(0) < p(1)))
  }

  test("clusteredWrite produces files with pairwise-disjoint sort-key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        Layout.zorder(col("l_partkey"), col("l_suppkey")).as("z"))
    Layout.clusteredWrite(li, "z", numFiles = 8, dir)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length > 1, "expected multiple files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: hi=$hi1 > next lo=$lo2")
      case _ =>
    }
    // row count survives the re-layout
    assert(spark.read.parquet(dir).count() ==
      Tables.lineitem(spark, "/root/testdata/sf0.001").count())
  }
}
