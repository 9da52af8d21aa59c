package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multiclass evaluation metrics (SURVEY A5; reference: utils/metrics.py:6-32).
  *
  * accuracy + macro precision/recall/F1 over the fixed label domain
  * `[0, nLabels)` with sklearn's `zero_division=0` convention: a class with no
  * predicted (resp. true) samples contributes precision (resp. recall) 0 to the
  * macro average, and F1 is 0 when precision+recall is 0.
  *
  * Implementation is a confusion-matrix aggregation: one `groupBy` over
  * (label, prediction) — a single shuffle whose cardinality is at most
  * nLabels², independent of data size, so it scales to any row count.
  */
object Metrics {

  /** Per-class confusion stats: (cls, tp, fp, fn) for every cls in [0, nLabels). */
  def confusion(scored: DataFrame, labelCol: String, predCol: String,
                nLabels: Int): DataFrame = {
    val spark = scored.sparkSession
    val label = col(labelCol).cast("int")
    val pred = col(predCol).cast("int")
    val classes = spark.range(0, nLabels).select(col("id").cast("int").as("cls"))
    val counts = scored
      .groupBy(label.as("label"), pred.as("pred"))
      .agg(count(lit(1)).as("n"))
    // Broadcast the (≤ nLabels²)-row counts to the (≤ nLabels)-row class table:
    // the heavy aggregation already happened; this tail is constant-size.
    classes.join(broadcast(counts),
        counts("label") === classes("cls") || counts("pred") === classes("cls"),
        "left")
      .groupBy(col("cls"))
      .agg(
        sum(when(col("label") === col("cls") && col("pred") === col("cls"), col("n"))
          .otherwise(0L)).as("tp"),
        sum(when(col("pred") === col("cls") && col("label") =!= col("cls"), col("n"))
          .otherwise(0L)).as("fp"),
        sum(when(col("label") === col("cls") && col("pred") =!= col("cls"), col("n"))
          .otherwise(0L)).as("fn"))
  }

  private def safeDiv(num: Column, den: Column): Column =
    when(den === 0L, 0.0).otherwise(num.cast("double") / den.cast("double"))

  /** One-row DataFrame: (accuracy, macro_precision, macro_recall, macro_f1),
    * each rounded to `scale` decimals for cross-engine comparison. */
  def multiclass(scored: DataFrame, labelCol: String, predCol: String,
                 nLabels: Int, scale: Int = 6): DataFrame = {
    val acc = scored.agg(
      avg(when(col(labelCol).cast("int") === col(predCol).cast("int"), 1.0)
        .otherwise(0.0)).as("accuracy"))
    val perClass = confusion(scored, labelCol, predCol, nLabels)
      .withColumn("prec", safeDiv(col("tp"), col("tp") + col("fp")))
      .withColumn("rec", safeDiv(col("tp"), col("tp") + col("fn")))
      .withColumn("f1",
        when(col("prec") + col("rec") === 0.0, 0.0)
          .otherwise(lit(2.0) * col("prec") * col("rec") / (col("prec") + col("rec"))))
    val macroAvg = perClass.agg(
      avg("prec").as("macro_precision"),
      avg("rec").as("macro_recall"),
      avg("f1").as("macro_f1"))
    acc.crossJoin(macroAvg).select(
      round(col("accuracy"), scale).as("accuracy"),
      round(col("macro_precision"), scale).as("macro_precision"),
      round(col("macro_recall"), scale).as("macro_recall"),
      round(col("macro_f1"), scale).as("macro_f1"))
  }

  /** Per-batch accuracy of a scored stream: the reference's detector feed
    * (SURVEY A4/ST2; streams/run_stream_supervised.py:69-83). One narrow
    * aggregation keyed by batch — partial aggregation makes this map-side
    * combinable at any scale. */
  def batchAccuracy(scored: DataFrame, batchIdCol: Column,
                    labelCol: String, predCol: String): DataFrame =
    scored.groupBy(batchIdCol.as("batch_id"))
      .agg(avg(when(col(labelCol).cast("int") === col(predCol).cast("int"), 1.0)
        .otherwise(0.0)).as("accuracy"))
}
