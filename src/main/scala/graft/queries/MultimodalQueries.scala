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

  /** Decode-stats per kind: the decode → aggregate spine. Cross-item stats are
    * count/int-avg/min/max — all order-free exact aggregates, so the whole
    * stub-decode pipeline replays bit-for-bit in the DuckDB oracle (a
    * cross-row double average would depend on accumulation order and is not
    * reproducible across engines). */
  val mmDecodeStats: Q = (s, dir) =>
    Media.decodeStats(media(s, dir))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        round(avg("n_samples"), 2).as("avg_samples"),
        round(min("sample_mean"), 6).as("min_mean"),
        round(max("sample_mean"), 6).as("max_mean"))
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

  /** REAL decode: each document rendered to an actual PNG and decoded back
    * through `javax.imageio` ([[graft.multimodal.ImageCodec]]) inside the
    * same batched decodeStats plumbing as the stub path. PNG is lossless and
    * the pixels are a closed-form integer function of (doc_id, index), so
    * the DuckDB oracle recomputes the statistics from the closed form — any
    * codec bug (channel order, stride, color model) breaks the hash.
    * Runs on the deterministic 1-in-5 doc subset: the round trip is pinned
    * per image, so sampling changes coverage density, not the property —
    * and PNG encode is the engine's single heaviest per-row constant
    * (~0.5 ms/doc), which would otherwise dominate the bench wall. */
  val mmDecodeReal: Q = (s, dir) =>
    graft.multimodal.ImageCodec.decodeRealStats(
        Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(5)) === 0))
      .orderBy("media_id")

  /** The audio twin of [[mmDecodeReal]] (AudioCodec): real WAVs written and
    * decoded through `javax.sound.sampled`, per-clip waveform stats. PCM is
    * lossless and the sample values are a closed-form integer recurrence, so
    * the DuckDB twin replays the full encode→decode round trip. Runs on the
    * deterministic 1-in-5 subset like the image twin: the round trip is
    * pinned per clip, so sampling changes coverage density, not the
    * property — and at sf1 the all-docs variant spent 12 s of pure codec
    * CPU (50k encode+decode), which belongs to a batch job, not the bench
    * gate. */
  val mmAudioReal: Q = (s, dir) =>
    graft.multimodal.AudioCodec.decodeRealStats(
        Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(5)) === 1))
      .orderBy("media_id")

  /** The video twin (VideoCodec): real multi-frame GIF clips written and
    * frame-iterated through `javax.imageio`'s sequence API — all three
    * modalities now really decode with JDK-only codecs. GIF encode is the
    * heaviest of the three (LZW per frame), so this samples 1-in-3 docs:
    * the round trip is pinned per clip, sampling changes density only. */
  val mmVideoReal: Q = (s, dir) =>
    graft.multimodal.VideoCodec.decodeRealStats(
        Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(3)) === 0))
      .orderBy("media_id")

  /** Perceptual image dedup: every document in the 1-in-5 image subset
    * renders a REAL PNG (every 4th of those also a planted near-dup copy —
    * one pixel perturbed, id + 10^7, the re-processed-image shape a byte
    * hash cannot catch), ImageIO decodes the bytes back, and the 64-bit
    * dHash ([[graft.multimodal.ImageCodec.dHash]] — 8×9 integer-mean grid,
    * horizontal gradient signs) feeds the SAME 4×16-bit-block hamming
    * candidate generator as text SimHash
    * ([[graft.operators.Dedup.hammingPairsFromSigs]]). Every planted pair
    * must surface at hamming ≤ 1 (one perturbed pixel touches one grid cell
    * = at most one sign bit). The DuckDB twin replays encode → decode →
    * pool → hash → block join from the closed-form pixel source in pure
    * integer arithmetic. */
  val mmPhashDedup: Q = (s, dir) => {
    val base = Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(5)) === 0)
    val sigs = graft.multimodal.ImageCodec.dHashes(
      graft.multimodal.ImageCodec.synthesizeImagesNearDups(base,
        plantEvery = 20L))
    // hamming ≤ 2 needs only 3 pigeonhole blocks (21-bit blocks, 32× the
    // 4×16 bucket space); since r15 the block join runs over DISTINCT sig
    // values (724 at sf10 for 125k images — dHashes cluster brutally), so
    // the remaining sf10 cost is the PNG decode pass + the 14.3M-pair
    // output itself (output is layout-independent — the oracle keeps
    // replaying 4×16)
    graft.operators.Dedup.hammingPairsFromSigs(sigs, maxHamming = 2,
        numBlocks = 3)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  val queries: Map[String, Q] = Map(
    "mm_video_real" -> mmVideoReal,
    "mm_audio_real" -> mmAudioReal,
    "mm_decode_real" -> mmDecodeReal,
    "mm_decode_stats" -> mmDecodeStats,
    "mm_feature_ann" -> mmFeatureAnn,
    "mm_phash_dedup" -> mmPhashDedup,
    "mm_resize_frames" -> mmResizeFrames)

  /** The synthetic media table (Media.synthesize) as SQL — metadata is pure
    * column arithmetic over doc_id, so the metadata-only pipelines replay
    * exactly; `bytes` = first 64 UTF-8 bytes of the (ASCII) text. */
  private val mediaCte: String =
    """media AS (SELECT doc_id AS media_id, doc_id,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |      ELSE 'video' END AS kind,
      |    substr(text, 1, 64) AS bytes_txt,
      |    CAST(doc_id % 4 AS INT) * 64 + 64 AS width,
      |    CAST(doc_id % 3 AS INT) * 64 + 64 AS height,
      |    16000 AS sample_rate,
      |    CAST(doc_id % 10 AS INT) * 1000 + 500 AS duration_ms
      |  FROM documents)""".stripMargin

  /** DuckDB twin of [[mmResizeFrames]]: resize + frame sampling are pure
    * metadata transforms (no codec), so the whole query replays in SQL. */
  val mmResizeFramesSql: String = {
    val scale = "CASE WHEN greatest(width, height) <= 128 THEN 1.0 " +
      "ELSE 128.0 / greatest(width, height) END"
    s"""WITH $mediaCte,
       |resized AS (SELECT kind,
       |    CAST(round(width * ($scale)) AS INT) AS rw,
       |    CAST(round(height * ($scale)) AS INT) AS rh
       |  FROM media),
       |perkind AS (SELECT kind, count(*) AS n, max(rw) AS max_w, max(rh) AS max_h
       |  FROM resized GROUP BY kind),
       |frames AS (SELECT count(*) AS n_frames, max(frame_ms) AS max_frame_ms FROM (
       |  SELECT media_id, unnest(range(0, duration_ms + 1, 1000)[1:8]) AS frame_ms
       |  FROM media WHERE kind = 'video'))
       |SELECT kind, n, max_w, max_h FROM perkind
       |UNION ALL
       |SELECT 'video_frames', n_frames, NULL, CAST(max_frame_ms AS INT) FROM frames
       |ORDER BY kind""".stripMargin
  }

  /** DuckDB twin of [[mmDecodeStats]] — the STUB codec is deterministic
    * splitmix64 arithmetic (Media.StubCodec), so even the decode path replays:
    * the per-item seed is a recursive-CTE fold of splitmix64 over the payload
    * bytes, samples are one splitmix64 per index mapped to float, and the
    * per-item mean is an order-pinned fold. */
  val mmDecodeStatsSql: String = {
    val smSeed = Duck.splitmix64(
      "SELECT f.media_id, f.pos, xor(f.h, c.code) AS x0 FROM sfold f " +
        "JOIN mbytes c ON c.media_id = f.media_id AND c.bp = f.pos " +
        "JOIN mlen l ON l.media_id = f.media_id AND f.pos < l.n")
    val smSamp = Duck.splitmix64(
      "SELECT n.media_id, unnest(range(0, n.ns)) AS i, " +
        "xor(s.h, CAST(unnest(range(0, n.ns)) AS HUGEINT)) AS x0 " +
        "FROM nsamp n JOIN sd s ON s.media_id = n.media_id")
    s"""WITH RECURSIVE
       |$mediaCte,
       |mlen AS (SELECT media_id, length(bytes_txt) AS n FROM media),
       |mbytes AS (SELECT media_id, unnest(range(0, length(bytes_txt))) AS bp,
       |    unnest([CAST(unicode(c) AS HUGEINT) FOR c IN string_split(bytes_txt, '')]) AS code
       |  FROM media WHERE length(bytes_txt) > 0),
       |sfold AS (
       |  SELECT media_id, 0 AS pos, CAST(media_id AS HUGEINT) AS h FROM media
       |  UNION ALL
       |  SELECT u.media_id, u.pos + 1, u.sm AS h FROM ($smSeed) u
       |),
       |sd AS (SELECT f.media_id, f.h FROM sfold f
       |  JOIN mlen l ON l.media_id = f.media_id AND f.pos = l.n),
       |nsamp AS (SELECT media_id, kind,
       |    CASE kind WHEN 'image' THEN greatest(4, width * height // 1024)
       |      WHEN 'audio' THEN greatest(4, sample_rate // 100)
       |      ELSE greatest(2, duration_ms // 500) END AS ns
       |  FROM media),
       |svals AS (SELECT media_id, i,
       |    CAST(CAST(${Duck.toSigned("sm")} AS DOUBLE) / ${Duck.MaxLongD} AS REAL) AS v
       |  FROM ($smSamp)),
       |item AS (SELECT s.media_id, n.kind, n.ns,
       |    ${Duck.foldSum("list(CAST(v AS DOUBLE) ORDER BY i)")} / n.ns AS mean
       |  FROM svals s JOIN nsamp n ON n.media_id = s.media_id
       |  GROUP BY s.media_id, n.kind, n.ns)
       |SELECT kind, count(*) AS n, round(avg(ns), 2) AS avg_samples,
       |  round(min(mean), 6) AS min_mean, round(max(mean), 6) AS max_mean
       |FROM item GROUP BY kind ORDER BY kind""".stripMargin
  }

  /** DuckDB twin of [[mmFeatureAnn]]: stub features are index-mod float
    * accumulation over the decoded samples (Media.extractFeatures) — replayed
    * as an order-pinned REAL fold per residue class (CAST-per-step restores
    * float32 addition exactly; a double-accumulated sum of two floats rounds
    * to the identical float). Missing residues stay 0.0f via a dense dim
    * spine. Scoring and ranking mirror the proven sim_brute_topk twin. */
  val mmFeatureAnnSql: String = {
    val smSeed = Duck.splitmix64(
      "SELECT f.media_id, f.pos, xor(f.h, c.code) AS x0 FROM sfold f " +
        "JOIN mbytes c ON c.media_id = f.media_id AND c.bp = f.pos " +
        "JOIN mlen l ON l.media_id = f.media_id AND f.pos < l.n")
    val smSamp = Duck.splitmix64(
      "SELECT n.media_id, unnest(range(0, n.ns)) AS i, " +
        "xor(s.h, CAST(unnest(range(0, n.ns)) AS HUGEINT)) AS x0 " +
        "FROM nsamp n JOIN sd s ON s.media_id = n.media_id")
    val foldF = "list_reduce(list_prepend(CAST(0.0 AS REAL), " +
      "list(v ORDER BY i)), (a, b) -> CAST(a + b AS REAL))"
    s"""WITH RECURSIVE
       |$mediaCte,
       |mlen AS (SELECT media_id, length(bytes_txt) AS n FROM media),
       |mbytes AS (SELECT media_id, unnest(range(0, length(bytes_txt))) AS bp,
       |    unnest([CAST(unicode(c) AS HUGEINT) FOR c IN string_split(bytes_txt, '')]) AS code
       |  FROM media WHERE length(bytes_txt) > 0),
       |sfold AS (
       |  SELECT media_id, 0 AS pos, CAST(media_id AS HUGEINT) AS h FROM media
       |  UNION ALL
       |  SELECT u.media_id, u.pos + 1, u.sm AS h FROM ($smSeed) u
       |),
       |sd AS (SELECT f.media_id, f.h FROM sfold f
       |  JOIN mlen l ON l.media_id = f.media_id AND f.pos = l.n),
       |nsamp AS (SELECT media_id, kind,
       |    CASE kind WHEN 'image' THEN greatest(4, width * height // 1024)
       |      WHEN 'audio' THEN greatest(4, sample_rate // 100)
       |      ELSE greatest(2, duration_ms // 500) END AS ns
       |  FROM media),
       |svals AS (SELECT media_id, i,
       |    CAST(CAST(${Duck.toSigned("sm")} AS DOUBLE) / ${Duck.MaxLongD} AS REAL) AS v
       |  FROM ($smSamp)),
       |fsparse AS (SELECT media_id, CAST(i % 16 AS INT) AS d, $foldF AS fv
       |  FROM svals GROUP BY media_id, i % 16),
       |fdense AS (SELECT m.media_id, dm.d,
       |    CAST(coalesce(fs.fv, 0.0) AS DOUBLE) AS val
       |  FROM media m CROSS JOIN (SELECT CAST(unnest(range(0, 16)) AS INT) AS d) dm
       |  LEFT JOIN fsparse fs ON fs.media_id = m.media_id AND fs.d = dm.d),
       |fvec AS (SELECT media_id, list(val ORDER BY d) AS v
       |  FROM fdense GROUP BY media_id),
       |sc AS (SELECT q.media_id AS qid, c.media_id AS cid,
       |    ${Duck.cosine("q.v", "c.v")} AS cos
       |  FROM fvec q CROSS JOIN fvec c WHERE q.media_id < 3),
       |r AS (SELECT qid, cid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
       |SELECT qid, rk, cid, round(cos, 4) AS cos FROM r WHERE rk <= 5
       |ORDER BY qid, rk""".stripMargin
  }

  /** DuckDB twin of [[mmDecodeReal]]: the gray LCG and geometry replayed in
    * BIGINT (every intermediate bounded — ImageCodec.gray reduces doc_id mod
    * 1e5 before the multiply for exactly this reason); the mean is an exact
    * integer sum over ≤1280 pixels divided once. */
  val mmDecodeRealSql: String =
    """WITH geom AS (SELECT doc_id,
      |    CAST(doc_id % 4 AS INT) * 8 + 16 AS w,
      |    CAST(doc_id % 3 AS INT) * 8 + 16 AS h
      |  FROM documents WHERE doc_id % 5 = 0),
      |px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM geom),
      |g AS (SELECT doc_id, w, h,
      |    ((((doc_id % 100000) * 1103515245 + i * 12345 + 6789)
      |      % 2147483648) % 256) AS v
      |  FROM px)
      |SELECT doc_id AS media_id, CAST(w * h AS INT) AS n_pixels,
      |  round(CAST(sum(v) AS DOUBLE) / (w * h), 6) AS gray_mean,
      |  CAST(max(v) AS INT) AS gray_max
      |FROM g GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin

  /** DuckDB twin of [[mmAudioReal]]: the PCM LCG and clip geometry replayed
    * in BIGINT (every intermediate bounded — AudioCodec.pcm reduces doc_id
    * mod 1e5 first); integer sample sums are double-exact. */
  val mmAudioRealSql: String =
    """WITH geom AS (SELECT doc_id,
      |    CAST(doc_id % 5 AS INT) * 160 + 320 AS n
      |  FROM documents WHERE doc_id % 5 = 1),
      |sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM geom),
      |v AS (SELECT doc_id, n,
      |    ((((doc_id % 100000) * 1103515245 + i * 12347 + 999)
      |      % 2147483648) % 65536 - 32768) AS v
      |  FROM sm)
      |SELECT doc_id AS media_id, CAST(n AS INT) AS n_samples,
      |  round(CAST(sum(v) AS DOUBLE) / n, 6) AS pcm_mean,
      |  CAST(max(v) AS INT) AS pcm_max
      |FROM v GROUP BY doc_id, n ORDER BY media_id""".stripMargin

  /** DuckDB twin of [[mmVideoReal]]: clip geometry + the per-frame gray LCG
    * replayed in BIGINT over frames × pixels. */
  val mmVideoRealSql: String =
    """WITH geom AS (SELECT doc_id,
      |    CAST(doc_id % 3 AS INT) + 2 AS nf,
      |    CAST(doc_id % 4 AS INT) * 4 + 12 AS w,
      |    CAST(doc_id % 3 AS INT) * 4 + 8 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |fr AS (SELECT doc_id, nf, w, h, unnest(range(0, nf)) AS f FROM geom),
      |px AS (SELECT doc_id, nf, w, h, f, unnest(range(0, w * h)) AS i FROM fr),
      |g AS (SELECT doc_id, nf, w, h,
      |    ((((doc_id % 100000) * 1103515245 + i * 12345 + f * 777 + 6789)
      |      % 2147483648) % 256) AS v
      |  FROM px)
      |SELECT doc_id AS media_id, CAST(nf AS INT) AS n_frames,
      |  CAST(nf * w * h AS INT) AS n_samples,
      |  round(CAST(sum(v) AS DOUBLE) / (nf * w * h), 6) AS gray_mean,
      |  CAST(max(v) AS INT) AS gray_max
      |FROM g GROUP BY doc_id, nf, w, h ORDER BY media_id""".stripMargin

  /** DuckDB twin of [[mmPhashDedup]]: the full perceptual chain replayed
    * from the closed-form pixel source — planted perturbation, 8×9
    * integer-mean pooling (the multiplicative bucket map), gradient-sign
    * bits packed into a HUGEINT then two's-complemented to the signed
    * BIGINT Spark carries, the 4-block candidate join, and the
    * bit_count(xor) verify. Everything integer. */
  val mmPhashDedupSql: String = {
    val signed = graft.queries.Duck.toSigned("dhu")
    """WITH geom AS (SELECT doc_id,
      |    CAST(doc_id % 4 AS INT) * 8 + 16 AS w,
      |    CAST(doc_id % 3 AS INT) * 8 + 16 AS h
      |  FROM documents WHERE doc_id % 5 = 0),
      |imgs AS (
      |  SELECT doc_id AS img_id, doc_id, w, h, 0 AS perturb FROM geom
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS img_id, doc_id, w, h, 1 AS perturb
      |  FROM geom WHERE doc_id % 20 = 0),
      |px AS (SELECT img_id, doc_id, w, h, perturb,
      |    unnest(range(0, w * h)) AS i FROM imgs),
      |g AS (SELECT img_id, w, h, i,
      |    CASE WHEN perturb = 1 AND i = 0
      |      THEN (((((doc_id % 100000) * 1103515245 + i * 12345 + 6789)
      |        % 2147483648) % 256) + 1) % 256
      |      ELSE ((((doc_id % 100000) * 1103515245 + i * 12345 + 6789)
      |        % 2147483648) % 256) END AS v
      |  FROM px),
      |cells AS (SELECT img_id,
      |    (i // w) * 8 // h AS ci, (i % w) * 9 // w AS cj,
      |    sum(v) // count(*) AS cv
      |  FROM g GROUP BY img_id, ci, cj),
      |bits AS (SELECT a.img_id, a.ci, a.cj,
      |    CASE WHEN b.cv > a.cv THEN 1 ELSE 0 END AS bit
      |  FROM cells a JOIN cells b
      |    ON b.img_id = a.img_id AND b.ci = a.ci AND b.cj = a.cj + 1
      |  WHERE a.cj < 8),
      |dh AS (SELECT img_id, sum(CAST(bit AS HUGEINT) *
      |    (CAST(1 AS HUGEINT) << CAST(ci * 8 + cj AS INT))) AS dhu
      |  FROM bits GROUP BY img_id),
      |""".stripMargin +
    s"""sig AS (SELECT img_id AS id, dhu, $signed AS simhash FROM dh),
       |blocks AS (SELECT id, simhash, blk,
       |    CAST((dhu >> CAST(blk * 16 AS INT)) & 65535 AS BIGINT) AS blk_val
       |  FROM sig, unnest([0, 1, 2, 3]) AS t(blk)),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |    a.simhash AS sig_a, b.simhash AS sig_b
       |  FROM blocks a JOIN blocks b
       |    ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.id < b.id)
       |SELECT id_a, id_b,
       |  CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 2
       |ORDER BY id_a, id_b""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "mm_video_real" -> mmVideoRealSql,
    "mm_audio_real" -> mmAudioRealSql,
    "mm_decode_real" -> mmDecodeRealSql,
    "mm_decode_stats" -> mmDecodeStatsSql,
    "mm_feature_ann" -> mmFeatureAnnSql,
    "mm_phash_dedup" -> mmPhashDedupSql,
    "mm_resize_frames" -> mmResizeFramesSql)
}
