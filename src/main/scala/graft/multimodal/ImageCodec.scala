package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import javax.imageio.ImageIO

/** REAL image decode behind the [[Media.MediaCodec]] boundary — no stub:
  * `javax.imageio` ships in the JDK, so PNG/BMP decoding needs no external
  * codec. This turns the multimodal path's decode step into an actual
  * bytes→pixels transform while keeping the exact Spark-side plumbing
  * (schema, per-partition batching, narrow no-shuffle shape) of the stubbed
  * path.
  *
  * Oracle strategy: the synthetic corpus has no real media, so
  * [[synthesizeImages]] renders each document a small grayscale PNG whose
  * pixel values are a CLOSED-FORM integer function of (doc_id, pixel index).
  * PNG is lossless, so decode(encode(pixels)) == pixels — the DuckDB oracle
  * recomputes the same statistics from the closed form alone, which makes the
  * full encode → Spark-partition batch → ImageIO decode → aggregate chain
  * hash-checkable end to end. A codec bug (channel order, row stride, color
  * model) breaks the match.
  *
  * Scale: bytes are synthesized AND decoded inside one mapPartitions each —
  * media payloads never cross a shuffle; only (media_id, stats) rows do.
  * ImageIO readers are JVM-local and allocation-light at these sizes; a
  * production deployment swaps in the same trait with a JNI turbo-jpeg for
  * throughput, without touching the plan shape. */
object ImageCodec {

  /** gray(m, i) ∈ [0, 256): integer LCG mix of doc id and pixel index.
    * Operands are bounded (m is reduced mod 1e5) so every intermediate fits
    * comfortably in a signed 64-bit — the same arithmetic is replayed
    * verbatim by the DuckDB oracle in BIGINT. */
  def gray(m: Long, i: Long): Int =
    ((((m % 100000L) * 1103515245L + i * 12345L + 6789L) % 2147483648L) % 256L).toInt

  /** Deterministic image geometry per doc: ≤ 40×32 px (keeps the oracle's
    * unnest(range(w·h)) explosion linear and small). */
  def widthOf(docId: Long): Int = (docId % 4L).toInt * 8 + 16
  def heightOf(docId: Long): Int = (docId % 3L).toInt * 8 + 16

  /** One real PNG per document: media table with genuinely decodable bytes.
    * Encoding happens per partition — narrow, no shuffle. */
  def synthesizeImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select("doc_id").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = widthOf(id); val h = heightOf(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = gray(id, y.toLong * w + x)
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(img, "png", bos)
        Row(id, id, "image", bos.toByteArray,
          Row(w, h, 0, 0, "png"))
      }
    }
    spark.createDataFrame(rdd, Media.mediaSchema)
  }

  /** The real codec: ImageIO decode, gray channel (images are gray by
    * construction; the blue channel reads it back). */
  object ImageIoCodec extends Media.MediaCodec {
    def decodeBatch(rows: Seq[(Long, String, Array[Byte], Row)]): Seq[Media.Decoded] =
      rows.map { case (id, kind, bytes, _) =>
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        val w = img.getWidth; val h = img.getHeight
        val samples = new Array[Float](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            samples(y * w + x) = (img.getRGB(x, y) & 0xFF).toFloat
            x += 1
          }
          y += 1
        }
        Media.Decoded(id, kind, samples)
      }
  }

  /** The `mm_decode_real` surface: synthesize real PNGs, decode them with
    * the real codec through the SAME batched decodeStats plumbing as the
    * stub path, emit per-image gray statistics. */
  def decodeRealStats(docs: DataFrame): DataFrame =
    Media.decodeStats(synthesizeImages(docs), ImageIoCodec)
      .select(
        col("media_id"),
        col("n_samples").as("n_pixels"),
        round(col("sample_mean"), 6).as("gray_mean"),
        col("sample_max").cast("int").as("gray_max"))

  // ---- Perceptual dedup (dHash) --------------------------------------------

  /** Planted-near-dup offset (the [[graft.queries.Pipelines]] planted-corpus
    * convention) and plant cadence: every 4th base image gets a re-encoded
    * copy with ONE pixel perturbed — the "same image, re-processed" shape a
    * perceptual dedup must catch and a byte hash cannot. */
  val NearDupOffset = 10000000L

  /** Like [[synthesizeImages]], plus for every source doc with
    * `doc_id % plantEvery == 0` a second PNG under `doc_id + NearDupOffset`:
    * identical pixels except index 0 becomes `(gray+1) mod 256`. Both the
    * original render and the perturbation are closed-form — the oracle
    * replays them. */
  def synthesizeImagesNearDups(docs: DataFrame, plantEvery: Long = 4L): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select("doc_id").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val w = widthOf(id); val h = heightOf(id)
        def render(perturb: Boolean): Array[Byte] = {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val i = y.toLong * w + x
              val v0 = gray(id, i)
              val v = if (perturb && i == 0L) (v0 + 1) % 256 else v0
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        val base = Row(id, id, "image", render(perturb = false), Row(w, h, 0, 0, "png"))
        if (id % plantEvery == 0L)
          Seq(base, Row(id + NearDupOffset, id + NearDupOffset, "image",
            render(perturb = true), Row(w, h, 0, 0, "png")))
        else Seq(base)
      }
    }
    spark.createDataFrame(rdd, Media.mediaSchema)
  }

  /** dHash of a decoded grayscale image: pixels pool into an 8-row × 9-col
    * grid by the multiplicative bucket map (`ci = y·8 div h`,
    * `cj = x·9 div w`), cell value = integer-division mean, and bit
    * `ci·8 + cj` is set iff `cell(ci, cj+1) > cell(ci, cj)` — 64 bits of
    * horizontal gradient signs, the standard difference-hash. All integer
    * arithmetic, so the hash replays exactly in SQL from the closed-form
    * pixel source. */
  def dHash(gray: Array[Int], w: Int, h: Int): Long = {
    val sum = Array.ofDim[Long](8, 9)
    val cnt = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val ci = y * 8 / h
      var x = 0
      while (x < w) {
        val cj = x * 9 / w
        sum(ci)(cj) += gray(y * w + x)
        cnt(ci)(cj) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var ci = 0
    while (ci < 8) {
      var cj = 0
      while (cj < 8) {
        val a = sum(ci)(cj) / cnt(ci)(cj)
        val b = sum(ci)(cj + 1) / cnt(ci)(cj + 1)
        if (b > a) bits |= 1L << (ci * 8 + cj)
        cj += 1
      }
      ci += 1
    }
    bits
  }

  /** Per-image perceptual signature via the REAL codec: decode the PNG
    * bytes with ImageIO inside one mapPartitions (payloads never shuffle)
    * and emit (id, simhash) rows shaped for
    * [[graft.operators.Dedup.hammingPairsFromSigs]]. */
  def dHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = ImageIO.read(new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        val w = img.getWidth; val h = img.getHeight
        val g = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { g(y * w + x) = img.getRGB(x, y) & 0xFF; x += 1 }
          y += 1
        }
        Row(id, dHash(g, w, h))
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("simhash", LongType, nullable = false))))
  }
}
