package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (per-JVM; Test/fork gives one JVM,
  * suites run sequentially in it). `spark` rebuilds if the previous context
  * was stopped — MemoEvictionSpec exercises real session lifecycles, and
  * suites running after it must get a live session again. */
object SparkTestSession {
  @volatile private var current: SparkSession = _

  def spark: SparkSession = synchronized {
    if (current == null || current.sparkContext.isStopped) {
      current = SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      current.sparkContext.setLogLevel("ERROR")
    }
    current
  }
}
