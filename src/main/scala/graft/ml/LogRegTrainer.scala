package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M4 stand-in trainer (documented divergence M1, SURVEY §2.7): the reference's
  * LSTM classifier has no idiomatic-Spark equivalent (no recurrent nets in
  * MLlib); the engine's capability — "multiclass classifier over pooled
  * embeddings, trained with epochs, holdout metrics, checkpoint/resume" — is
  * carried by MLlib `LogisticRegression` over the same pooled vectors.
  * MLlib handles distributed L-BFGS; persistence via the MLlib writer (S6). */
object LogRegTrainer {

  /** ARRAY<FLOAT> column → MLlib VectorUDT feature column. */
  def toFeatures(df: DataFrame, vecCol: String, out: String = "features"): DataFrame = {
    val toVec = udf { v: Seq[Float] =>
      Vectors.dense(v.map(_.toDouble).toArray)
    }
    df.withColumn(out, toVec(col(vecCol)))
  }

  /** Fit on (labelCol, vecCol); maxIter plays the reference's epoch count. */
  def fit(train: DataFrame, labelCol: String, vecCol: String,
          maxIter: Int = 50, regParam: Double = 1e-4): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .setLabelCol(labelCol)
      .setFeaturesCol("features")
      .fit(toFeatures(train, vecCol))

  /** Score: returns (idCol, label, pred). */
  def predict(model: LogisticRegressionModel, test: DataFrame,
              idCol: String, labelCol: String, vecCol: String): DataFrame =
    model.transform(toFeatures(test, vecCol))
      .select(col(idCol), col(labelCol).cast("int").as("label"),
        col("prediction").cast("int").as("pred"))

  /** Holdout evaluation (A10): accuracy + macro metrics over the fixed domain. */
  def holdoutMetrics(model: LogisticRegressionModel, test: DataFrame,
                     idCol: String, labelCol: String, vecCol: String,
                     nLabels: Int): DataFrame =
    graft.operators.Metrics.multiclass(
      predict(model, test, idCol, labelCol, vecCol), "label", "pred", nLabels)
}
