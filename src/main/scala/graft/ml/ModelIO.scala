package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model sink/scan (SURVEY S6): the reference persists models with
  * torch.save/joblib.dump and resumes from checkpoints
  * (models/wos_train_lstm.py:158-173, wos_train_nb.py:119-120). Here model
  * state is relational — Gaussian-NB sufficient statistics as a parquet table —
  * so persistence is a plain write/read with schema evolution for free, and a
  * "checkpoint" is the same table keyed by an epoch/batch column. */
object ModelIO {

  /** Persist fitted GNB stats (+ priors) as one parquet dataset. */
  def saveGnb(stats: DataFrame, priors: DataFrame, path: String): Unit = {
    stats.write.mode("overwrite").parquet(s"$path/stats")
    priors.write.mode("overwrite").parquet(s"$path/priors")
  }

  /** Load fitted GNB model state. */
  def loadGnb(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/stats"), spark.read.parquet(s"$path/priors"))

  /** Checkpoint the prequential trainer's accumulators at a batch boundary
    * (append-mode, keyed by checkpoint id — resume picks the latest). */
  def checkpointPrequential(model: graft.streaming.StreamOps.PrequentialNB,
                            nClasses: Int, checkpointId: Long, path: String)
                           (implicit spark: SparkSession): Unit = {
    import spark.implicits._
    val rows = (0 until nClasses).map { c =>
      val (n, mean, v) = model.stats(c)
      (checkpointId, c, n, mean.toSeq, v.toSeq)
    }
    rows.toDF("ckpt", "label", "n", "mean", "v")
      .write.mode("append").parquet(path)
  }

  /** Latest checkpoint id present at `path`, if any. */
  def latestCheckpoint(spark: SparkSession, path: String): Option[Long] =
    try {
      val r = spark.read.parquet(path).agg(max("ckpt")).collect()(0)
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    } catch { case _: Throwable => None }
}
