package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the pre-shuffle: two tables bucketed the same way on the join
  * key join with NO exchange on either side — the co-located join strategy
  * for repeated fact-fact joins at 100 TB (pay the shuffle once at write
  * time, never again at read time). */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("equal-bucketed tables join without any shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a non-broadcast join so the exchange-free claim is actually tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (0 until 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "av")
      val b = (0 until 600).map(i => (i.toLong % 50, s"b$i")).toDF("k", "bv")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_a")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_b")
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == (0 until 1000).map(_ % 50).map(k =>
        (0 until 600).count(_ % 50 == k)).sum)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }
}
