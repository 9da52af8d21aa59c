package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage profile of one declared query (optimization-round §1 tooling):
  * run the query once untimed (warmup: codegen + content-keyed store builds),
  * then run it again with a stage listener and print each stage's wall time,
  * task count, shuffle read/write and spill, sorted by duration. The picture
  * the Spark UI would give — the UI is disabled in the bench harness.
  * Usage: runMain graft.StageProfile <query> <sfDir> */
object StageProfile {
  def main(args: Array[String]): Unit = {
    args(0).split(',').map(_.trim).filter(_.nonEmpty)
      .foreach(one(_, args(1)))
  }

  def one(name: String, sfDir: String): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warmup
    System.gc(); Thread.sleep(100)
    val stages = mutable.ArrayBuffer
      .empty[(Int, String, Long, Int, Long, Long, Long, Long)]
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        val tm = si.taskMetrics
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
          ms.getOrElse(-1L), si.numTasks,
          tm.shuffleReadMetrics.totalBytesRead,
          tm.shuffleWriteMetrics.bytesWritten,
          tm.memoryBytesSpilled, tm.executorRunTime))
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // let listener drain
    val stageWall = stages.map(_._3).filter(_ > 0).sum
    println(f"TOTAL $name: $total%.3f s, ${jobs.get} jobs, ${stages.size} " +
      f"stages, stage-wall ${stageWall / 1e3}%.3f s, " +
      f"driver-gap ${total - stageWall / 1e3}%.3f s")
    println("stageId  wall_ms  tasks  shufRd_MB  shufWr_MB  spill_MB  exec_ms  name")
    stages.sortBy(-_._3).take(30).foreach {
      case (id, nm, ms, nt, sr, sw, sp, ex) =>
        println(f"$id%7d $ms%8d $nt%6d ${sr / 1e6}%10.2f ${sw / 1e6}%10.2f " +
          f"${sp / 1e6}%9.2f $ex%8d  $nm")
    }
    spark.stop()
  }
}
