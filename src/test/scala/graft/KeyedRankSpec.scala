package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KeyedRank

/** [[graft.operators.KeyedRank]] — the two-pass range-partitioned rank/cumsum
  * must equal the plain `Window.partitionBy(key)` form EXACTLY (the DuckDB
  * oracles keep replaying the plain window), including on a skewed corpus
  * where one key holds most rows, descending order columns, and ties broken
  * by the unique id. */
class KeyedRankSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** AQE coalesces toy-sized shuffles into ONE partition, which would make
    * the multi-partition offset composition trivially untested here (at real
    * scale AQE keeps ~64 MB partitions). Suites run sequentially in this
    * JVM, so flipping the conf and restoring is safe. */
  private def withoutCoalesce[T](body: => T): T = {
    val k = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try body finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None    => spark.conf.unset(k)
    }
  }

  /** Skewed frame: 80 % of rows in one key, deterministic pseudo-values. */
  private def skewed(n: Int) = (0 until n).map { i =>
    val key = if (i % 10 < 8) "hot" else s"cold${i % 3}"
    val v = (i * 2654435761L) % 97 // collides often -> exercises tie-breaks
    (i.toLong, key, v, (v % 13) + 1)
  }.toDF("id", "key", "score", "toks").repartition(7)

  test("rank + key total equal the plain window on a skewed frame") {
    withoutCoalesce {
    val df = skewed(2000)
    val got = KeyedRank.rankCumsum(df, "key",
        Seq(col("score"), col("id")), rn = Some("rn"), keyTotal = Some("n"))
      .select("id", "rn", "n")
    val w = Window.partitionBy("key").orderBy("score", "id")
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("key")))
      .select("id", "rn", "n")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  test("descending-order cumsum equals the plain window (the fill shape)") {
    withoutCoalesce {
    val df = skewed(1500)
    val got = KeyedRank.rankCumsum(df, "key",
        Seq(col("score").desc, col("id")), cum = Some(("toks", "cum")))
      .select("id", "cum")
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("cum", sum(col("toks").cast("long")).over(w))
      .select("id", "cum")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  test("rank and cumsum compose in one call; original columns survive") {
    val df = skewed(400)
    val got = KeyedRank.rankCumsum(df, "key", Seq(col("score"), col("id")),
      rn = Some("rn"), cum = Some(("toks", "cum")), keyTotal = Some("n"))
    assert(got.columns.toSeq ===
      Seq("id", "key", "score", "toks", "rn", "cum", "n"))
    val w = Window.partitionBy("key").orderBy("score", "id")
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("toks").cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("key")))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("single-key frame (the worst skew) still matches and stays parallel") {
    withoutCoalesce {
    val df = (0 until 800).map(i => (i.toLong, "only", i % 11))
      .toDF("id", "key", "v").repartition(5)
    val got = KeyedRank.rankCumsum(df, "key", Seq(col("v"), col("id")),
      rn = Some("rn"))
    val w = Window.partitionBy("key").orderBy("v", "id")
    val want = df.withColumn("rn", row_number().over(w).cast("long"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the one key must SPAN range partitions — that is the whole point
    val layout = KeyedRank.rangeLayout(df, "key", Seq(col("v"), col("id")))
    val pids = layout.select("__gr_pid").distinct().count()
    assert(pids > 1, s"a single hot key must spread over >1 partition, got $pids")
    }
  }

  test("null keys survive and rank as their own group (null-safe join)") {
    withoutCoalesce {
    // Window.partitionBy(key) keeps nulls as a group; a plain equi-join on
    // the offset table would drop them silently (r14 advice, medium).
    val df = (0 until 600).map { i =>
      val key: String = if (i % 5 == 0) null else if (i % 2 == 0) "a" else "b"
      (i.toLong, key, (i * 37) % 101)
    }.toDF("id", "key", "v").repartition(6)
    val got = KeyedRank.rankCumsum(df, "key", Seq(col("v"), col("id")),
      rn = Some("rn"), keyTotal = Some("n"))
    assert(got.count() === 600L, "null-key rows must not be dropped")
    val w = Window.partitionBy("key").orderBy("v", "id")
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("key")))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  test("layoutLevel knob (DISK_ONLY) leaves results identical") {
    withoutCoalesce {
    val df = skewed(900)
    val mem = KeyedRank.rankCumsum(df, "key", Seq(col("score"), col("id")),
      rn = Some("rn"), cum = Some(("toks", "cum")))
    val disk = KeyedRank.rankCumsum(df, "key", Seq(col("score"), col("id")),
      rn = Some("rn"), cum = Some(("toks", "cum")),
      layoutLevel = Some(org.apache.spark.storage.StorageLevel.DISK_ONLY))
    assert(mem.exceptAll(disk).isEmpty && disk.exceptAll(mem).isEmpty)
    }
  }

  test("empty frame and the offset-row bound") {
    val empty = Seq.empty[(Long, String, Int)].toDF("id", "key", "v")
    assert(KeyedRank.rankCumsum(empty, "key", Seq(col("v"), col("id")),
      rn = Some("rn")).count() === 0L)
    val df = (0 until 100).map(i => (i.toLong, s"k$i", i)).toDF("id", "key", "v")
    val e = intercept[IllegalArgumentException] {
      KeyedRank.rankCumsum(df, "key", Seq(col("v"), col("id")),
        rn = Some("rn"), maxOffsetRows = 10)
    }
    assert(e.getMessage.contains("offset"))
  }
}
