package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio decode behind the [[Media.MediaCodec]] boundary — the audio
  * twin of [[ImageCodec]]: `javax.sound.sampled` ships in the JDK, so WAV
  * (RIFF/PCM) needs no external codec. The multimodal audio path becomes an
  * actual bytes→waveform transform with the same Spark-side plumbing
  * (schema, per-partition batching, narrow no-shuffle shape) as the stub.
  *
  * Oracle strategy mirrors the image closure: [[synthesizeWavs]] writes each
  * document a short 16-bit mono PCM WAV whose sample values are a CLOSED-FORM
  * integer function of (doc_id, sample index). PCM in a WAV container is
  * lossless, so decode(encode(samples)) == samples — the DuckDB twin replays
  * the integer recurrence alone, and the full AudioSystem encode → partition
  * batch → AudioSystem decode → aggregate chain is hash-checkable end to end.
  * A codec bug (endianness, sign convention, frame size, header offset)
  * breaks the match.
  *
  * Scale: WAV bytes are synthesized AND decoded inside one mapPartitions
  * each — payloads never cross a shuffle; only (media_id, stats) rows do. A
  * production deployment swaps an FFI opus/flac decoder in behind the same
  * trait without touching the plan shape. */
object AudioCodec {

  /** pcm(m, i) ∈ [-32768, 32767]: integer LCG mix of doc id and sample
    * index, reduced to a signed 16-bit range. Operands are bounded (m
    * reduced mod 1e5) so every intermediate fits a signed 64-bit — the
    * DuckDB oracle replays the same arithmetic in BIGINT. */
  def pcm(m: Long, i: Long): Int =
    ((((m % 100000L) * 1103515245L + i * 12347L + 999L) % 2147483648L) % 65536L - 32768L).toInt

  /** Deterministic clip length per doc: 320–960 samples (40–120 ms at 8 kHz;
    * keeps the oracle's unnest(range(n)) linear and small). */
  def nSamplesOf(docId: Long): Int = (docId % 5L).toInt * 160 + 320

  val SampleRate = 8000

  /** One real WAV per document: media table with genuinely decodable bytes.
    * Encoding happens per partition — narrow, no shuffle. */
  def synthesizeWavs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select("doc_id").rdd.mapPartitions { it =>
      val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false) // PCM16LE mono
      it.map { r =>
        val id = r.getLong(0)
        val n = nSamplesOf(id)
        val pcmBytes = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = pcm(id, i)
          pcmBytes(2 * i) = (v & 0xFF).toByte
          pcmBytes(2 * i + 1) = ((v >> 8) & 0xFF).toByte
          i += 1
        }
        val ais = new AudioInputStream(
          new ByteArrayInputStream(pcmBytes), fmt, n.toLong)
        val bos = new ByteArrayOutputStream()
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
        Row(id, id, "audio", bos.toByteArray,
          Row(0, 0, SampleRate, n * 1000 / SampleRate, "wav"))
      }
    }
    spark.createDataFrame(rdd, Media.mediaSchema)
  }

  /** The real codec: AudioSystem WAV decode → signed 16-bit samples. Values
    * in [-32768, 32767] are exactly representable in Float, so the sample
    * array is bit-faithful to the encoded PCM. */
  object WavCodec extends Media.MediaCodec {
    def decodeBatch(rows: Seq[(Long, String, Array[Byte], Row)]): Seq[Media.Decoded] =
      rows.map { case (id, kind, bytes, _) =>
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"expected PCM16 mono, got $fmt")
        val raw = ais.readAllBytes()
        val big = fmt.isBigEndian
        val n = raw.length / 2
        val samples = new Array[Float](n)
        var i = 0
        while (i < n) {
          val lo = if (big) raw(2 * i + 1) else raw(2 * i)
          val hi = if (big) raw(2 * i) else raw(2 * i + 1)
          samples(i) = ((hi.toInt << 8) | (lo.toInt & 0xFF)).toShort.toFloat
          i += 1
        }
        Media.Decoded(id, kind, samples)
      }
  }

  /** The `mm_audio_real` surface: synthesize real WAVs, decode them with the
    * real codec through the SAME batched decodeStats plumbing as the stub
    * path, emit per-clip waveform statistics. Integer sample sums stay far
    * inside 2^53, so the double mean is exact and replayable. */
  def decodeRealStats(docs: DataFrame): DataFrame =
    Media.decodeStats(synthesizeWavs(docs), WavCodec)
      .select(
        col("media_id"),
        col("n_samples"),
        round(col("sample_mean"), 6).as("pcm_mean"),
        col("sample_max").cast("int").as("pcm_max"))
}
