package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.multimodal.Media

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val docs = Seq(
    (0L, "an image document"), (1L, "an audio document"),
    (2L, "a video document"), (3L, "another image"),
    (4L, "another audio"), (5L, "another video"))
    .toDF("doc_id", "text")

  test("synthesize produces the declared media schema") {
    val m = Media.synthesize(docs)
    assert(m.schema("bytes").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    assert(m.count() == 6)
    val kinds = m.groupBy("kind").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds == Map("image" -> 2, "audio" -> 2, "video" -> 2))
  }

  test("decodeStats is deterministic and kind-shaped") {
    val m = Media.synthesize(docs)
    val a = Media.decodeStats(m).collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val b = Media.decodeStats(m).collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(a == b, "stub decode must be deterministic")
    val byKind = Media.decodeStats(m).collect()
      .map(r => r.getString(1) -> r.getInt(2)).groupBy(_._1)
    assert(byKind("audio").forall(_._2 == 160), "16kHz/100 samples")
  }

  test("decode batching: batch boundaries don't change results") {
    val m = Media.synthesize(docs)
    val big = Media.decodeStats(m, batchSize = 64).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val tiny = Media.decodeStats(m, batchSize = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(big == tiny)
  }

  test("extractFeatures yields fixed-dim vectors consumable by ANN") {
    val f = Media.extractFeatures(Media.synthesize(docs), dim = 8)
    assert(f.select(size(col("feature"))).collect().forall(_.getInt(0) == 8))
  }

  test("resizeMeta caps the long side and preserves aspect contract") {
    val r = Media.resizeMeta(Media.synthesize(docs), maxSide = 100)
      .select("meta.width", "meta.height", "resized.width", "resized.height")
      .collect()
    r.foreach { row =>
      val (w, h, rw, rh) = (row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3))
      assert(math.max(rw, rh) <= 100)
      if (math.max(w, h) <= 100) assert(rw == w && rh == h)
    }
  }

  test("ImageIoCodec: real PNG bytes decode back to the closed-form pixels") {
    import graft.multimodal.ImageCodec
    val media = ImageCodec.synthesizeImages(docs.limit(5)).collect()
    media.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("bytes")
      // PNG magic: the payload is a genuinely encoded image, not a stub
      assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N')
    }
    val rows = media.map(r => (r.getLong(0), r.getString(2),
      r.getAs[Array[Byte]]("bytes"), r.getStruct(4))).toSeq
    ImageCodec.ImageIoCodec.decodeBatch(rows).foreach { d =>
      val w = ImageCodec.widthOf(d.mediaId); val h = ImageCodec.heightOf(d.mediaId)
      assert(d.samples.length == w * h)
      // lossless round-trip: every decoded pixel equals the generator
      d.samples.zipWithIndex.foreach { case (v, i) =>
        assert(v == ImageCodec.gray(d.mediaId, i).toFloat,
          s"pixel $i of media ${d.mediaId}")
      }
    }
  }

  test("WavCodec: real WAV bytes decode back to the closed-form PCM samples") {
    import graft.multimodal.AudioCodec
    val media = AudioCodec.synthesizeWavs(docs).collect()
    media.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("bytes")
      // RIFF/WAVE magic: a genuinely encoded container, not a stub
      assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
      assert(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
    }
    val rows = media.map(r => (r.getLong(0), r.getString(2),
      r.getAs[Array[Byte]]("bytes"), r.getStruct(4))).toSeq
    AudioCodec.WavCodec.decodeBatch(rows).foreach { d =>
      assert(d.samples.length == AudioCodec.nSamplesOf(d.mediaId))
      // lossless round-trip: every decoded 16-bit sample equals the generator
      // (sign + endianness bugs would flip values, not just perturb them)
      d.samples.zipWithIndex.foreach { case (v, i) =>
        assert(v == AudioCodec.pcm(d.mediaId, i).toFloat,
          s"sample $i of media ${d.mediaId}")
      }
    }
    // negative samples exist: the signed decode convention is exercised
    val any = AudioCodec.WavCodec.decodeBatch(rows).flatMap(_.samples)
    assert(any.exists(_ < 0) && any.exists(_ > 0))
  }

  test("GifCodec: real multi-frame GIF bytes decode back to the closed-form frames") {
    import graft.multimodal.VideoCodec
    val media = VideoCodec.synthesizeGifs(docs).collect()
    media.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("bytes")
      assert(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F',
        "payload is a genuinely encoded GIF container")
    }
    val rows = media.map(r => (r.getLong(0), r.getString(2),
      r.getAs[Array[Byte]]("bytes"), r.getStruct(4))).toSeq
    VideoCodec.GifCodec.decodeBatch(rows).foreach { d =>
      val id = d.mediaId
      val w = VideoCodec.widthOf(id); val h = VideoCodec.heightOf(id)
      val nf = VideoCodec.framesOf(id)
      assert(d.samples.length == nf * w * h, s"clip $id frame count")
      // lossless round-trip across EVERY frame: a disposal-method or
      // palette-quantization bug would corrupt later frames specifically
      var f = 0
      while (f < nf) {
        var i = 0
        while (i < w * h) {
          assert(d.samples(f * w * h + i) == VideoCodec.gray(id, i, f).toFloat,
            s"clip $id frame $f pixel $i")
          i += 1
        }
        f += 1
      }
    }
  }

  test("sampleFrames emits capped per-video offsets") {
    val f = Media.sampleFrames(Media.synthesize(docs), everyMs = 1000, maxFrames = 3)
      .groupBy("media_id").agg(count(lit(1)).as("n"), max("frame_ms").as("mx"))
      .collect()
    assert(f.nonEmpty)
    f.foreach { r => assert(r.getLong(1) <= 3 && r.getInt(2) % 1000 == 0) }
  }

  test("perceptual dHash: planted one-pixel near-dups collide at hamming <= 1 " +
    "through the REAL png encode/decode round trip; dhash matches the " +
    "closed-form twin computed straight from the pixel formula") {
    import graft.multimodal.ImageCodec
    val base = (0L until 40L).map(i => (i * 5L, "d")).toDF("doc_id", "text")
    val media = ImageCodec.synthesizeImagesNearDups(base, plantEvery = 20L)
    // real decode path → signature frame
    val sigs = ImageCodec.dHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.size == 40 + 10) // 40 base + every-4th planted
    // closed-form twin: dHash from the formula pixels, no codec involved
    base.collect().map(_.getLong(0)).foreach { id =>
      val w = ImageCodec.widthOf(id); val h = ImageCodec.heightOf(id)
      val g = Array.tabulate(w * h)(i => ImageCodec.gray(id, i.toLong))
      assert(sigs(id) == ImageCodec.dHash(g, w, h),
        s"doc $id: codec-path dhash != formula dhash")
    }
    // every planted copy within hamming 1 of its source
    sigs.keys.filter(_ >= ImageCodec.NearDupOffset).foreach { pid =>
      val src = pid - ImageCodec.NearDupOffset
      val d = java.lang.Long.bitCount(sigs(pid) ^ sigs(src))
      assert(d <= 1, s"planted $pid vs $src hamming $d")
    }
    // and the pair generator surfaces them all
    val sigDf = ImageCodec.dHashes(media)
    val pairs = graft.operators.Dedup.hammingPairsFromSigs(sigDf, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sigs.keys.filter(_ >= ImageCodec.NearDupOffset).foreach { pid =>
      assert(pairs.contains((pid - ImageCodec.NearDupOffset, pid)),
        s"planted pair for $pid missing from hammingPairsFromSigs")
    }
  }
}
