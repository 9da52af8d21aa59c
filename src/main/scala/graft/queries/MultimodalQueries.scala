package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Media
import graft.operators.Similarity
import graft.sources.Tables

/** Multimodal pipeline queries (rows-only: bytes + stub codec are host-side;
  * shapes and invariants are pinned in MultimodalSpec). */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  private def media(s: SparkSession, dir: String): DataFrame =
    Media.synthesize(Tables.documents(s, dir))

  /** Decode-stats per kind: the decode → aggregate spine. */
  val mmDecodeStats: Q = (s, dir) =>
    Media.decodeStats(media(s, dir))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        round(avg("n_samples"), 2).as("avg_samples"),
        round(avg("sample_mean"), 6).as("avg_mean"))
      .orderBy("kind")

  /** Feature extraction → embedding-space ANN over media features: the
    * multimodal corpus joins the similarity suite unchanged. */
  val mmFeatureAnn: Q = (s, dir) => {
    val feats = Media.extractFeatures(media(s, dir))
    Similarity.bruteForceTopK(
        feats.filter(col("media_id") < 3), feats,
        "media_id", "media_id", "feature", k = 5)
      .select(col("qid"), col("rk").cast("long").as("rk"), col("cid"),
        round(col("cos"), 4).as("cos"))
      .orderBy("qid", "rk")
  }

  /** Resize + frame-sample metadata ops, aggregated. */
  val mmResizeFrames: Q = (s, dir) => {
    val m = media(s, dir)
    val resized = Media.resizeMeta(m, maxSide = 128)
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        max("resized.width").as("max_w"), max("resized.height").as("max_h"))
    val frames = Media.sampleFrames(m, everyMs = 1000, maxFrames = 8)
      .groupBy()
      .agg(count(lit(1)).as("n_frames"), max("frame_ms").as("max_frame_ms"))
      .select(lit("video_frames").as("kind"), col("n_frames").as("n"),
        lit(null).cast("int").as("max_w"), col("max_frame_ms").cast("int").as("max_h"))
    resized.unionByName(frames).orderBy("kind")
  }

  val queries: Map[String, Q] = Map(
    "mm_decode_stats" -> mmDecodeStats,
    "mm_feature_ann" -> mmFeatureAnn,
    "mm_resize_frames" -> mmResizeFrames)

  val oracles: Map[String, String] = Map.empty
}
