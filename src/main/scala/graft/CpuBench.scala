package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Noise-robust per-query measurement for the optimization rounds: wall
  * clock on a shared host swings ±30-60% between runs (r17 measured), but
  * per-task executor CPU time is stable — it counts cycles actually spent
  * in the query's tasks. Runs each named query `reps` times after the
  * usual two warmup passes and prints min wall + min total task CPU + min
  * total task runtime per query as ONE JSON line.
  * Usage: runMain graft.CpuBench <sfDir> <out.json> <reps> <q1,q2,...> */
object CpuBench {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, out, repsS, names) = args
    val reps = repsS.toInt
    val wanted = names.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new AtomicLong(0) // ns
    val run = new AtomicLong(0) // ms
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) { cpu.addAndGet(m.executorCpuTime)
          run.addAndGet(m.executorRunTime) }
      }
    })
    val fns = wanted.map(n => n -> SparkEntry.queries(n))
    // warmup: codegen at the smallest SF, then content-keyed builds at target
    val warmDir0 = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val warmDir = if (new java.io.File(warmDir0).isDirectory) warmDir0 else sfDir
    fns.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count(); fn(spark, sfDir).count() }
      catch { case _: Throwable => () }
    }
    val results = fns.map { case (name, fn) =>
      val walls = Array.fill(reps)(0.0)
      val cpus_ = Array.fill(reps)(0.0)
      val runs_ = Array.fill(reps)(0.0)
      (0 until reps).foreach { i =>
        System.gc(); Thread.sleep(50)
        val c0 = cpu.get(); val r0 = run.get(); val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        walls(i) = (System.nanoTime() - t0) / 1e9
        Thread.sleep(120) // listener drain
        cpus_(i) = (cpu.get() - c0) / 1e9
        runs_(i) = (run.get() - r0) / 1e3
      }
      (name, walls.min, cpus_.min, runs_.min)
    }
    val json = results.map { case (n, w, c, r) =>
      f""""$n":{"wall":$w%.3f,"cpu":$c%.3f,"run":$r%.3f}"""
    }.mkString("{", ",", "}")
    val line = s"""{"queries":$json,"sf":"$sfDir","reps":$reps}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
    println(line)
  }
}
