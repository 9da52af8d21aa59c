package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Takedown

/** The staged multi-table retract choreography — every crash point must
  * replay clean: pre-marker orphans discard, committed retractions finish
  * from ANY point (including mid-swap, and including an aside a concurrent
  * read heal restored), and the asides — which still hold retracted content
  * — are always deleted by the end. */
class TakedownSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  /** A toy two-table store: a/ holds 0..9, b/ holds 10..19. */
  private def freshStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("takedown").toString
    (0L until 10L).toDF("v").write.parquet(s"$dir/a")
    (10L until 20L).toDF("v").write.parquet(s"$dir/b")
    dir
  }

  private def vals(dir: String, sub: String): Set[Long] =
    spark.read.parquet(s"$dir/$sub").collect().map(_.getLong(0)).toSet

  /** Stage a rewrite dropping `gone` from both tables (not yet committed). */
  private def buildStage(dir: String, stage: String, gone: Set[Long]): Unit = {
    (0L until 10L).filterNot(gone).toDF("v").write.parquet(s"$stage/a")
    (10L until 20L).filterNot(gone).toDF("v").write.parquet(s"$stage/b")
  }

  test("run swaps every table atomically and leaves no stage/marker/aside") {
    val dir = freshStore()
    Takedown.run(spark, dir, Seq("a", "b"))(buildStage(dir, _, Set(3L, 13L)))
    assert(vals(dir, "a") == (0L until 10L).toSet - 3L)
    assert(vals(dir, "b") == (10L until 20L).toSet - 13L)
    Seq(".retract_stage", "_retract_pending", ".a_precompact", ".b_precompact")
      .foreach(n => assert(!fs.exists(new Path(s"$dir/$n")), n))
  }

  test("pre-marker crash: an orphan stage is discarded, tables untouched") {
    val dir = freshStore()
    buildStage(dir, s"$dir/.retract_stage", Set(5L))
    Takedown.heal(spark, dir)
    assert(vals(dir, "a") == (0L until 10L).toSet)
    assert(!fs.exists(new Path(s"$dir/.retract_stage")))
  }

  test("post-marker crash before any swap: heal finishes both tables") {
    val dir = freshStore()
    buildStage(dir, s"$dir/.retract_stage", Set(4L, 14L))
    val out = fs.create(new Path(s"$dir/_retract_pending"), true)
    out.write("a,b".getBytes("UTF-8")); out.close()
    Takedown.heal(spark, dir)
    assert(vals(dir, "a") == (0L until 10L).toSet - 4L)
    assert(vals(dir, "b") == (10L until 20L).toSet - 14L)
    Seq(".retract_stage", "_retract_pending", ".a_precompact", ".b_precompact")
      .foreach(n => assert(!fs.exists(new Path(s"$dir/$n")), n))
  }

  test("mid-swap crash (root aside, publish pending): heal publishes the " +
    "staged rewrite, never the aside; a half-done sibling finishes too") {
    val dir = freshStore()
    buildStage(dir, s"$dir/.retract_stage", Set(2L, 12L))
    val out = fs.create(new Path(s"$dir/_retract_pending"), true)
    out.write("a,b".getBytes("UTF-8")); out.close()
    // simulate: table a crashed between aside and publish
    require(fs.rename(new Path(s"$dir/a"), new Path(s"$dir/.a_precompact")))
    Takedown.heal(spark, dir)
    assert(vals(dir, "a") == (0L until 10L).toSet - 2L)
    assert(vals(dir, "b") == (10L until 20L).toSet - 12L)
    assert(!fs.exists(new Path(s"$dir/.a_precompact")),
      "the aside retains retracted content and must be deleted")
  }

  test("crash after one table swapped (its stage sub gone, aside left): heal " +
    "finishes the other and clears the leftover aside") {
    val dir = freshStore()
    buildStage(dir, s"$dir/.retract_stage", Set(7L, 17L))
    val out = fs.create(new Path(s"$dir/_retract_pending"), true)
    out.write("a,b".getBytes("UTF-8")); out.close()
    // simulate table a fully swapped, crash before deleting its aside
    require(fs.rename(new Path(s"$dir/a"), new Path(s"$dir/.a_precompact")))
    require(fs.rename(new Path(s"$dir/.retract_stage/a"), new Path(s"$dir/a")))
    Takedown.heal(spark, dir)
    assert(vals(dir, "a") == (0L until 10L).toSet - 7L)
    assert(vals(dir, "b") == (10L until 20L).toSet - 17L)
    assert(!fs.exists(new Path(s"$dir/.a_precompact")))
    assert(!fs.exists(new Path(s"$dir/_retract_pending")))
  }

  test("defensive: a named sub with no stage and no live table restores its " +
    "aside rather than dropping the only copy") {
    val dir = freshStore()
    val out = fs.create(new Path(s"$dir/_retract_pending"), true)
    out.write("a".getBytes("UTF-8")); out.close()
    require(fs.rename(new Path(s"$dir/a"), new Path(s"$dir/.a_precompact")))
    Takedown.heal(spark, dir)
    assert(vals(dir, "a") == (0L until 10L).toSet)
  }

  test("an invalid receipt name fails BEFORE heal/build run — never after " +
    "the full staged rewrite has been wasted") {
    val dir = freshStore()
    var built = false
    intercept[IllegalArgumentException] {
      Takedown.runDynamic(spark, dir, receipt = Some("bad,name")) { _ =>
        built = true; Seq("a")
      }
    }
    assert(!built, "the staged rewrite must not have run")
    assert(vals(dir, "a") == (0L until 10L).toSet)
    assert(!fs.exists(new Path(s"$dir/_retract_pending")))
  }
}
