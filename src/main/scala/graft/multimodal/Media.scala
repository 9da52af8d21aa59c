package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline (engine extension;
  * BASELINE.json north star): image/audio/video ride as opaque `BINARY` columns
  * with a typed metadata struct; decode / feature-extract / resize / frame-
  * sample run as batched per-partition transforms.
  *
  * The decode step is STUBBED — this container has no image/audio codecs — via
  * [[MediaCodec]]: `StubCodec` produces deterministic fake decodes so the
  * Spark-side plumbing (schema, partitioning, batch shape, UDF signatures) is
  * real and tested; a production codec (JNI/FFI to libjpeg/ffmpeg, or a Pandas
  * UDF on a PySpark cluster) implements the same trait.
  *
  * Scale design: media bytes never pass through a shuffle — all transforms are
  * narrow (mapPartitions); only extracted features (small fixed-size vectors)
  * and metadata flow into joins/aggregations. Batches are assembled per
  * partition (the mapInPandas batch shape) so a real codec can amortize
  * model/codec initialization across rows.
  */
object Media {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", IntegerType),
    StructField("format", StringType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", metaSchema, nullable = false)))

  /** A decoded media item: the codec boundary type. For images `samples` are
    * pixel statistics; for audio, waveform samples; for video, per-frame
    * features — the stub fills them deterministically from the bytes. */
  case class Decoded(mediaId: Long, kind: String, samples: Array[Float])

  /** The pluggable decode boundary. Real implementations decode `bytes`
    * according to `format`; they are initialized once per partition-batch. */
  trait MediaCodec extends Serializable {
    def decodeBatch(rows: Seq[(Long, String, Array[Byte], Row)]): Seq[Decoded]
  }

  /** STUB: deterministic fake decode — hash-seeded samples with the right
    * shapes (image: w*h/1024 pixels-ish; audio: sample_rate/100; video: one
    * sample per 500ms frame). Replace with a real codec in production. */
  object StubCodec extends MediaCodec {
    private def mix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    def decodeBatch(rows: Seq[(Long, String, Array[Byte], Row)]): Seq[Decoded] =
      rows.map { case (id, kind, bytes, meta) =>
        val n = kind match {
          case "image" => math.max(4, meta.getInt(0) * meta.getInt(1) / 1024)
          case "audio" => math.max(4, meta.getInt(2) / 100)
          case _ => math.max(2, meta.getInt(3) / 500)
        }
        val seed = bytes.foldLeft(id)((a, b) => mix(a ^ b))
        Decoded(id, kind, Array.tabulate(n)(i =>
          (mix(seed ^ i).toDouble / Long.MaxValue).toFloat))
      }
  }

  /** Synthesize a deterministic media table from `documents` (the driver corpus
    * has no real media; bytes are a pure function of doc_id). One media item
    * per doc, kind round-robin by doc_id. */
  def synthesize(docs: DataFrame): DataFrame = {
    val kind = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    docs.select(
      col("doc_id").as("media_id"),
      col("doc_id"),
      kind.as("kind"),
      // deterministic pseudo-bytes: the doc text's utf8, truncated — stands in
      // for real encoded payloads without shipping codecs
      substring(encode(col("text"), "UTF-8"), 1, 64).as("bytes"),
      struct(
        (pmod(col("doc_id"), lit(4)).cast("int") * 64 + 64).as("width"),
        (pmod(col("doc_id"), lit(3)).cast("int") * 64 + 64).as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id"), lit(10)).cast("int") * 1000 + 500).as("duration_ms"),
        lit("synthetic").as("format")).as("meta"))
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("n_samples", IntegerType),
    StructField("sample_mean", DoubleType),
    StructField("sample_max", DoubleType)))

  /** Decode (stubbed) + per-item sample statistics, batched per partition.
    * The codec sees `batchSize`-row batches — the mapInPandas shape. */
  def decodeStats(media: DataFrame, codec: MediaCodec = StubCodec,
                  batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "kind", "bytes", "meta").rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { chunk =>
          val batch = chunk.map(r =>
            (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2), r.getStruct(3)))
          codec.decodeBatch(batch).map { d =>
            val n = d.samples.length
            val mean = d.samples.map(_.toDouble).sum / n
            Row(d.mediaId, d.kind, n, mean, d.samples.map(_.toDouble).max)
          }
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Feature extraction: fixed-dim embedding per media item (stub: seeded
    * projection of decoded samples) — the ANN/dedup suites consume this. */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      codec: MediaCodec = StubCodec, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("feature", ArrayType(FloatType))))
    val rdd = media.select("media_id", "kind", "bytes", "meta").rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { chunk =>
          val batch = chunk.map(r =>
            (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2), r.getStruct(3)))
          codec.decodeBatch(batch).map { d =>
            val f = new Array[Float](dim)
            var i = 0
            while (i < d.samples.length) {
              f(i % dim) += d.samples(i); i += 1
            }
            Row(d.mediaId, d.kind, f.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Resize: pure metadata transform (no decode) — target box, preserving the
    * aspect-ratio contract a real resizer would enforce. */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = when(greatest(w, h) <= maxSide, 1.0)
      .otherwise(lit(maxSide.toDouble) / greatest(w, h))
    media.withColumn("resized", struct(
      round(w * scale).cast("int").as("width"),
      round(h * scale).cast("int").as("height")))
  }

  /** Frame sampling for video rows: one timestamp every `everyMs`, capped at
    * `maxFrames` — pure metadata expansion; a real pipeline would hand these
    * offsets to the codec. */
  def sampleFrames(media: DataFrame, everyMs: Int, maxFrames: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode_outer(slice(
          sequence(lit(0), col("meta.duration_ms"), lit(everyMs)),
          1, maxFrames)).as("frame_ms"))
      .filter(col("frame_ms").isNotNull)
}
