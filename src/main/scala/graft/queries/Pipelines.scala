package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{Dedup, Drift, Similarity}
import graft.sources.Tables

/** LLM-data-pipeline extension queries (dedup, similarity search, text analysis)
  * plus the faithful sequential DDM — the non-relational components get rows-only
  * verification (no oracle entry); the SQL-expressible ones carry DuckDB twins. */
object Pipelines {

  type Q = (SparkSession, String) => DataFrame

  // ---- Dedup ----------------------------------------------------------------

  val dedupExact: Q = (s, dir) =>
    Dedup.exact(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")

  val dedupExactSql: String =
    """SELECT min(doc_id) AS doc_id, count(*) AS dups FROM documents
      |GROUP BY text ORDER BY doc_id""".stripMargin

  /** Fingerprint-keyed exact dedup (8-byte shuffle keys — the at-scale form). [SQL] */
  val dedupFingerprint: Q = (s, dir) =>
    Dedup.exactByFingerprint(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  val dedupFingerprintSql: String = {
    val norm = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
    s"""WITH fp AS (SELECT doc_id, list_reduce(
       |  [CAST(ascii(n[i]) AS BIGINT) FOR i IN range(1, length(n) + 1)],
       |  (acc, x) -> (acc * 31 + x) % ${graft.functions.TextFns.FingerprintMod}) AS fp
       |  FROM (SELECT doc_id, $norm AS n FROM documents) q)
       |SELECT min(doc_id) AS doc_id, count(*) AS dups, fp FROM fp
       |GROUP BY fp ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of [[dedupEmbedding]]: same planted corpus (pseudo-noise copies
    * of the first 20 vectors), same 8-plane sign-LSH buckets, same cosine. The
    * bucket/noise arithmetic is the integer mix of [[Similarity.signBits]] /
    * VecFns.addPseudoNoise — pure SQL, bit-replayable. */
  val dedupEmbeddingSql: String =
    s"""WITH corpus AS (
       |  SELECT vec_id, embedding AS vec FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 10000000 AS vec_id,
       |         ${Duck.pseudoNoise("embedding", "vec_id", "0.05")} AS vec
       |  FROM embeddings WHERE vec_id < 20),
       |b AS (SELECT vec_id, vec, ${Duck.signBucket("vec", 8)} AS bucket FROM corpus),
       |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       |        ${Duck.cosine("a.vec", "c.vec")} AS cos
       |      FROM b a JOIN b c USING (bucket) WHERE a.vec_id < c.vec_id)
       |SELECT id_a, id_b, round(cos, 4) AS cos FROM p WHERE cos >= 0.9
       |ORDER BY id_a, id_b""".stripMargin

  /** MinHash+LSH near-dup candidate pairs (rows-only; xxhash64 is Spark-side). */
  val dedupMinhashLsh: Q = (s, dir) =>
    Dedup.minHashLsh(Tables.documents(s, dir), "doc_id", "text",
        numHashes = 32, bands = 8, shingleSize = 3, threshold = 0.5)
      .orderBy("id_a", "id_b")

  /** Cross-source contamination matrix: the [[dedupMinhashLsh]] verified
    * near-dup pairs rolled up by UNORDERED source pair — how much of source
    * A duplicates source B, the provenance-overlap table that decides dedup
    * precedence (and surfaces a source that is largely a re-scrape of
    * another) on a corpus card. min/max of the estimated Jaccard ride along
    * (order-free aggregates — never an avg of floats, whose summation order
    * isn't engine-portable).
    *
    * Scale: the source lookup is an id-keyed join of the (id, source) dim
    * against the PAIRS frame (pairs ≪ corpus after banding); deliberately
    * NOT broadcast — the dim is corpus-sized at 100 TB. The rollup output is
    * |sources|² at most. [SQL — the LSH spine spliced as a subquery]. */
  val dedupCrossSourceMatrix: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
      numHashes = 32, bands = 8, shingleSize = 3, threshold = 0.5)
    val dims = docs.select(col("doc_id"), col("source"))
    pairs
      .join(dims.select(col("doc_id").as("id_a"), col("source").as("src_a")),
        Seq("id_a"))
      .join(dims.select(col("doc_id").as("id_b"), col("source").as("src_b")),
        Seq("id_b"))
      .groupBy(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"))
      .agg(count(lit(1)).as("n_pairs"),
        min("est_jaccard").as("min_est"), max("est_jaccard").as("max_est"))
      .orderBy("source_lo", "source_hi")
  }

  /** SimHash near-dup pairs within hamming distance 3 (rows-only). */
  val dedupSimhash: Q = (s, dir) =>
    Dedup.simHashPairs(Tables.documents(s, dir), "doc_id", "text", maxHamming = 3)
      .orderBy("id_a", "id_b")

  /** [[dedupSimhashCapped]]'s hot-block threshold: well under the planted
    * 31-doc blob's bucket df, above any natural block bucket that matters
    * for the cold pairs at test scales. */
  private val SimhashBlockCap = 10

  /** The AT-SCALE simhash configuration on the declared surface: the same
    * pigeonhole pair generation as [[dedupSimhash]], but with the
    * `maxBlockDf` hot-block cap ENGAGED, over a corpus with a planted
    * 30-doc near-identical blob (doc 0's text + a one-token variant
    * marker, the [[dedupEmbeddingSql]] planted-corpus pattern). The blob
    * floods its (blk, blk_val) buckets past the cap, so its quadratic
    * bucket contribution is dropped before the self-join — the skew guard a
    * templated 100 TB corpus needs — while pairs matching through any cold
    * block survive bit-identically. The drop rule is a deterministic
    * count-per-(blk, blk_val) filter, so the whole thing replays exactly in
    * DuckDB. [SQL] */
  val dedupSimhashCapped: Q = (s, dir) => {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val blob = base.filter(col("doc_id") === 0)
      .select(explode(sequence(lit(0L), lit(29L))).as("i"), col("text"))
      .select((col("i") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" v"), col("i").cast("string")).as("text"))
    Dedup.simHashPairs(base.unionByName(blob), "doc_id", "text",
      maxHamming = 3, maxBlockDf = SimhashBlockCap)
      .orderBy("id_a", "id_b")
  }

  /** DuckDB twin of [[dedupSimhashCapped]]: the planted-blob corpus CTE +
    * the hot-bucket HAVING filter, around the shared signature replay. */
  val dedupSimhashCappedSql: String = simhashSqlFor(
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT 10000000 + r.i AS doc_id,
       |         d.text || ' v' || CAST(r.i AS VARCHAR) AS text
       |  FROM documents d, range(0, 30) r(i) WHERE d.doc_id = 0),
       |""".stripMargin,
    "corpus", Some(SimhashBlockCap))

  /** Word-3-shingle Jaccard pair graph ≥ 0.5, memoized per (session, dir):
    * pair generation is the expensive stage shared by the pair query and the
    * cluster query — run it once per session and pin the (output-sized,
    * near-dups-only) result. Deterministic per key, so a recompute would
    * return the same rows. Session-evicted ([[graft.SessionMemo]]), like
    * every memo below. */
  private val pairsMemo = new graft.SessionMemo[DataFrame]

  private def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    pairsMemo.getOrBuild(s, dir)(
      Dedup.ngramJaccard(Tables.documents(s, dir), "doc_id", "text",
        shingleSize = 3, threshold = 0.5).localCheckpoint())

  /** Connected-components labels over [[jaccardPairs]], memoized like the
    * pair graph itself: the label-propagation loop is the most iterative
    * (= expensive) piece of the dedup chain and BOTH `dedup_clusters` and
    * `pipeline_prep` consume the identical assignment — computing it once
    * per (session, corpus) is the same shared-artifact contract as
    * [[graft.operators.AdaptCache]]. */
  private val ccMemo = new graft.SessionMemo[DataFrame]

  private def clusterAssignments(s: SparkSession, dir: String): DataFrame =
    ccMemo.getOrBuild(s, dir)(
      Dedup.connectedComponents(jaccardPairs(s, dir).select("id_a", "id_b"))
        .localCheckpoint())

  /** Exact word-3-shingle Jaccard pairs ≥ 0.5. [SQL] */
  val dedupNgramJaccard: Q = (s, dir) =>
    jaccardPairs(s, dir)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")

  /** Shared CTE chain producing the word-3-shingle Jaccard pair set (the
    * [[dedupNgramJaccard]] semantics): toksraw → distinct shingles → sizes →
    * intersections. Reused by the pair query and the cluster oracle. */
  private def ngramPairCtes: String =
    s"""$toksCte,
       |sh AS (
       |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
       |        FROM toksraw WHERE len(w) >= 3) q),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)""".stripMargin

  /** DuckDB twin of [[dedupNgramJaccard]]: distinct word-3-shingles per doc via
    * a positional self-zip of the cleaned token list. */
  val dedupNgramJaccardSql: String = {
    s"""WITH $ngramPairCtes
       |SELECT id_a, id_b,
       |  round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
       |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
       |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Near-dup clusters: connected components over the n-gram-Jaccard pair
    * graph — (doc_id, cluster_id = min reachable id, csize). The step real
    * dedup pipelines run after pair generation: transitive closure merges
    * a~b, b~c into one cluster even when a~c never surfaced as a candidate.
    * [SQL — recursive-CTE reachability over the same pair set]. */
  val dedupClusters: Q = (s, dir) => {
    val cc = clusterAssignments(s, dir)
    val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
    cc.join(sizes, Seq("cluster_id"))
      .select(col("id").as("doc_id"), col("cluster_id"), col("csize"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[dedupClusters]]: min-reachable-id per node via a
    * recursive reachability CTE over the symmetrized pair edges (exact on the
    * oracle-scale graph; the Spark side scales by hash-min + pointer-jump
    * label propagation instead of closure materialization). */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE $ngramPairCtes,
       |pairs AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5),
       |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(v, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, rc.r FROM edges e JOIN reach rc ON rc.v = e.d),
       |cc AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
       |sz AS (SELECT cluster_id, count(*) AS csize FROM cc GROUP BY cluster_id)
       |SELECT cc.doc_id, cc.cluster_id, sz.csize
       |FROM cc JOIN sz USING (cluster_id) ORDER BY doc_id""".stripMargin

  /** Quality-aware cluster representative: real pipelines keep the BEST
    * member of each near-dup cluster, not the smallest id — a boilerplate
    * cluster should be represented by its cleanest longest member, and
    * min-id keeps whatever crawled first. Rep = argmax over
    * (quality_ok DESC, n_tokens DESC, doc_id ASC) — a deterministic total
    * order over the SAME memoized cluster assignment `dedup_clusters`
    * serves and the SAME memoized quality signals `text_quality` serves
    * (pure composition: one partitioned rank over cluster-sized groups, no
    * new corpus pass). [SQL — the cluster reachability and quality CTEs
    * stitched, same ORDER BY]. */
  val dedupBestOfCluster: Q = (s, dir) => {
    val cc = clusterAssignments(s, dir)
    val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
    val q = textQuality(s, dir).select("doc_id", "n_tokens", "quality_ok")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
      .orderBy(col("quality_ok").desc, col("n_tokens").desc, col("doc_id"))
    cc.select(col("id").as("doc_id"), col("cluster_id"))
      .join(q, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(sizes, Seq("cluster_id"))
      .select(col("cluster_id"), col("doc_id").as("rep_id"), col("csize"),
        col("n_tokens").as("rep_tokens"), col("quality_ok").as("rep_quality_ok"))
      .orderBy("cluster_id")
  }

  /** DuckDB twin of [[dedupBestOfCluster]]: the [[dedupClustersSql]]
    * reachability chain + the [[textQualitySql]] signal CTEs (us/g2 only —
    * the gate needs n_tokens, mean_word_len, top_unigram_ratio,
    * dup_2gram_ratio), ranked by the same total order. */
  /** The [[dedupClustersSql]] reachability chain + the quality-signal CTEs
    * + the per-cluster rank — the shared spine of [[dedupBestOfClusterSql]]
    * and [[dedupKeepBestSql]]. */
  private def clusterRankCtes: String =
    s"""$ngramPairCtes,
       |pairs AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5),
       |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(v, r) AS (
       |  SELECT s, s FROM edges
       |  UNION
       |  SELECT e.s, rc.r FROM edges e JOIN reach rc ON rc.v = e.d),
       |cc AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
       |sz AS (SELECT cluster_id, count(*) AS csize FROM cc GROUP BY cluster_id),
       |qtoks AS (SELECT doc_id, list_filter(w, x -> length(x) > 0) AS w FROM toksraw),
       |qtokf AS (SELECT doc_id, unnest(w) AS tok FROM qtoks),
       |us AS (SELECT doc_id, max(c) AS topc, sum(c) AS n, sum(c * ln_) AS sumlen FROM
       |  (SELECT doc_id, tok, count(*) AS c, length(tok) AS ln_ FROM qtokf
       |   GROUP BY doc_id, tok) u GROUP BY doc_id),
       |g2 AS (SELECT doc_id, count(*) AS tot2, count(DISTINCT g) AS dst2 FROM
       |  (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
       |   FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
       |         FROM qtoks WHERE len(w) >= 2) q) GROUP BY doc_id),
       |q AS (SELECT d.doc_id,
       |  coalesce(CAST(us.n AS BIGINT), 0) AS n_tokens,
       |  (coalesce(us.n, 0) >= 20 AND coalesce(us.n, 0) <= 100000
       |   AND round(CAST(us.sumlen AS DOUBLE) / us.n, 6) >= 3.0
       |   AND round(CAST(us.sumlen AS DOUBLE) / us.n, 6) <= 10.0
       |   AND round(CAST(us.topc AS DOUBLE) / us.n, 6) <= 0.15
       |   AND round(CASE WHEN g2.tot2 IS NULL THEN 0.0
       |     ELSE 1.0 - CAST(g2.dst2 AS DOUBLE) / g2.tot2 END, 6) <= 0.05)
       |   AS quality_ok
       |  FROM documents d LEFT JOIN us USING (doc_id) LEFT JOIN g2 USING (doc_id)),
       |ranked AS (SELECT cc.cluster_id, cc.doc_id, q.n_tokens, q.quality_ok,
       |    row_number() OVER (PARTITION BY cc.cluster_id
       |      ORDER BY q.quality_ok DESC, q.n_tokens DESC, cc.doc_id) AS rk
       |  FROM cc JOIN q USING (doc_id))""".stripMargin

  val dedupBestOfClusterSql: String =
    s"""WITH RECURSIVE $clusterRankCtes
       |SELECT cluster_id, doc_id AS rep_id, sz.csize,
       |  n_tokens AS rep_tokens, quality_ok AS rep_quality_ok
       |FROM ranked JOIN sz USING (cluster_id) WHERE rk = 1
       |ORDER BY cluster_id""".stripMargin

  /** The corpus AFTER the near-dup drop a real build executes: every
    * near-dup cluster keeps only its [[dedupBestOfCluster]] representative
    * (quality_ok DESC, n_tokens DESC, doc_id ASC), singleton docs (in no
    * ≥0.5-Jaccard pair) pass through untouched — `dedup_clusters` +
    * `dedup_best_of_cluster` stitched into the end-to-end keep-list. Pure
    * composition over the SAME memoized cluster assignment and the same
    * quality signals: rank members per cluster, anti-join the
    * non-representatives out of the corpus (at 100 TB the drop list is
    * corpus-fraction-sized, so the anti-join stays an id-keyed shuffle —
    * never broadcast by hint). Returns the kept corpus as
    * (doc_id, csize, n_tokens), csize 1 for singletons. [SQL — the
    * best-of-cluster CTE spine + NOT IN drop list]. */
  val dedupKeepBest: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val cc = clusterAssignments(s, dir)
    val q = textQuality(s, dir).select("doc_id", "n_tokens", "quality_ok")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
      .orderBy(col("quality_ok").desc, col("n_tokens").desc, col("doc_id"))
    val drops = cc.select(col("id").as("doc_id"), col("cluster_id"))
      .join(q, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1)
      .select("doc_id")
    val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
    docs.select("doc_id")
      .join(drops, Seq("doc_id"), "left_anti")
      .join(cc.select(col("id").as("doc_id"), col("cluster_id"))
        .join(sizes, Seq("cluster_id")), Seq("doc_id"), "left")
      .join(q.select("doc_id", "n_tokens"), Seq("doc_id"))
      .select(col("doc_id"), coalesce(col("csize"), lit(1L)).as("csize"),
        col("n_tokens"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[dedupKeepBest]]: the shared cluster-rank spine; kept
    * docs = everything not ranked strictly below its cluster's best. */
  val dedupKeepBestSql: String =
    s"""WITH RECURSIVE $clusterRankCtes
       |SELECT d.doc_id, coalesce(sz.csize, 1) AS csize, q.n_tokens
       |FROM documents d
       |JOIN q ON q.doc_id = d.doc_id
       |LEFT JOIN cc ON cc.doc_id = d.doc_id
       |LEFT JOIN sz ON sz.cluster_id = cc.cluster_id
       |WHERE d.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rk > 1)
       |ORDER BY d.doc_id""".stripMargin

  /** The full corpus-construction driver, composed END-TO-END as one
    * declared query — the §2.8-style experiment driver for the LLM-pipeline
    * surface: documents → quality gate ([[textQuality]], shared memo) →
    * near-dup keep-list (the [[dedupKeepBest]] rank over the shared cluster
    * assignment) → per-source token budgets over the SURVIVING corpus (the
    * [[mixTokenFill]] α=0.7 flattened-share greedy fill, seed 13) →
    * length-bucketed BPE packing of the selected docs (the
    * [[packBucketedBpe]] trained-tokenizer keyed pack). Every stage is the
    * SAME code path its standalone query declares — this query pins that
    * they compose: the budget totals are computed over the gated+deduped
    * corpus (not the raw one), and the pack runs over exactly the docs the
    * fill kept.
    *
    * Output: one row per SELECTED doc — (doc_id, source, n_toks) replayed
    * exactly by the oracle, plus the two learned-count pack verdicts
    * cross-checked IN-ENGINE ([[packBpeSequences]] verdict pattern) and
    * exported as pinned-TRUE booleans.
    *
    * Scale design: pure composition of the component plans — the gate and
    * drop list anti-join id-keyed (corpus-fraction-sized, never broadcast
    * by hint), budgets from one bounded sources-sized collect + the
    * [[graft.operators.Mix]] driver math (bit-parity pinned), the fill
    * a [[graft.operators.KeyedRank]] two-pass range-partitioned cumsum over
    * a narrow frame (a hot source spreads across range partitions; text
    * rides only the kept-id semi-join), per-bucket keyed pack with no
    * single-partition exchange. No stage re-reads the corpus text more than
    * its standalone query does; the gate/cluster signals come from the
    * session memos all sibling queries share. [SQL — the cluster-rank spine
    * + staged-xxhash64 draw replay + per-source cumsum, pack verdicts
    * pinned TRUE]. */
  val corpusBuild: Q = (s, dir) => corpusBuildImpl(s, dir, ccnet = false)

  /** [[corpusBuild]] with the CCNet fluency stage composed in: before the
    * budget fill, documents in their language's LEAST-fluent tercile (the
    * [[pplBuckets]] `tail` bucket — CCNet's drop/downsample split) are
    * dropped, so the token budgets and the pack run over the
    * fluency-filtered corpus. Same output contract; the oracle replays the
    * tercile keep-list in the same CTE spine. [SQL] */
  val corpusBuildCcnet: Q = (s, dir) => corpusBuildImpl(s, dir, ccnet = true)

  private def corpusBuildImpl(s: SparkSession, dir: String,
                              ccnet: Boolean): DataFrame = {
    val docs = Tables.documents(s, dir)
    val q = textQuality(s, dir).select("doc_id", "n_tokens", "quality_ok")
    // near-dup drop list: every cluster member ranked below its best
    val cc = clusterAssignments(s, dir)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
      .orderBy(col("quality_ok").desc, col("n_tokens").desc, col("doc_id"))
    val drops = cc.select(col("id").as("doc_id"), col("cluster_id"))
      .join(q, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1)
      .select("doc_id")
    val kept1 = docs
      .join(q.filter(col("quality_ok")).select("doc_id"), Seq("doc_id"),
        "left_semi")
      .join(drops, Seq("doc_id"), "left_anti")
    // CCNet stage: drop each language's least-fluent tercile (the
    // [[pplBuckets]] tail) BEFORE budgets — the fill then spends its token
    // budget on fluent text only
    val kept2 =
      if (!ccnet) kept1
      else {
        // [[pplBuckets]] tercile via the KeyedRank two-pass composition —
        // never a hash-partitioned window on the |langs|-cardinality key
        val fl = lmScored(s, dir)
        val fkeep = graft.operators.KeyedRank.rankCumsum(fl, "lang",
            Seq(col("lm_score"), col("doc_id")), rn = Some("rn"),
            keyTotal = Some("n"),
            materializeInput = false) // lmScored is a memoized checkpoint
          .withColumn("bucket", expr("1 + CAST(rn - 1 AS BIGINT) * 3 DIV n"))
          .filter(col("bucket") >= 2)
          .select("doc_id")
        kept1.join(fkeep, Seq("doc_id"), "left_semi")
      }
    val kept0 = kept2
      .select(col("doc_id"), col("source"), col("text"),
        TextFns.tokenCount(col("text")).cast("long").as("n_toks"))
      .localCheckpoint() // feeds budgets + fill + the encode pass
    // per-source token budgets over the surviving corpus (mixTokenFill
    // discipline: round-6-then-floor longs, integer cumsum comparisons).
    // |sources| rows: one bounded collect over the kept0 checkpoint + the
    // Mix driver math replaces the r17 per→tot→w→sw broadcast chain
    // (guide §5; bit-parity pinned in PackSpec)
    import s.implicits._
    val per = kept0.groupBy("source").agg(sum("n_toks").as("src_toks"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val budgets = graft.operators.Mix.flattenedBudgets(per)
      .toDF("source", "budget_toks")
    // greedy fill decided on a NARROW frame (id, source, draw, n_toks) via
    // the KeyedRank two-pass cumsum — the range shuffle ships 32-byte rows,
    // never text, and a hot source spreads across all range partitions; the
    // kept ids then semi-join the text back ONCE (old shape shipped the
    // whole corpus text through a source-hash window shuffle)
    val drawn = kept0.select("doc_id", "source", "n_toks")
      .withColumn("draw", graft.operators.Sample.drawCol(col("doc_id"), 13L))
    val keptIds = graft.operators.KeyedRank.rankCumsum(drawn, "source",
        Seq(col("draw").desc, col("doc_id")),
        cum = Some(("n_toks", "cum_toks")),
        materializeInput = false) // drawn projects the kept0 checkpoint
      .join(broadcast(budgets), Seq("source"))
      .filter(col("cum_toks") - col("n_toks") < col("budget_toks"))
      .select("doc_id")
    val filled = kept0.join(keptIds, Seq("doc_id"), "left_semi")
      .select("doc_id", "source", "text", "n_toks")
      .localCheckpoint()
    // bucketed BPE pack of the selection (shared trained model, same memo
    // key as bpe_tokenize/pack_bucketed_bpe — trained once per session)
    val model = bpeMemo.getOrBuild(s, s"bpe|$dir|50|2") {
      graft.functions.Bpe.train(docs, "text", numMerges = 50, minCount = 2,
        maxWords = 200000)
    }
    val bm = s.sparkContext.broadcast(model)
    val counts = filled.select(col("doc_id"),
        explode(TextFns.normTokens(TextFns.cleanText(col("text"),
          removePunctuation = true))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id")
      .agg(sum(graft.functions.Bpe.pieceCountCol(bm)(col("w"))).cast("long")
        .as("n_bpe"))
      .withColumn("bucket", least(expr("n_bpe DIV 32"), lit(15L)))
      .localCheckpoint()
    // No checkpoint on the pack output: packByBudgetKeyed freezes its own
    // range layout internally (and its offset collect runs once, at
    // construction), so the two consumers below (starts agg, final join)
    // re-run only a cheap window+broadcast-join over that internal
    // checkpoint — one fewer job AND one fewer corpus-sized pinned copy
    // than the r17 shape (guide §5).
    val packed = graft.operators.Pack.packByBudgetKeyed(
        counts, "bucket", "doc_id", "n_bpe", budget = 512L)
      .select(col("doc_id"), col("bin_id"), col("bin_offset"))
    // verdict twins (oracle scale only): bucket-partitioned window cumsum
    // cross-check + every-bucket-starts-fresh independence
    val dw = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val direct = counts
      .select(col("doc_id"), col("bucket"),
        coalesce(sum("n_bpe").over(dw), lit(0L)).as("prev"))
      .select(col("doc_id"), expr("prev DIV 512").as("d_bin"),
        pmod(col("prev"), lit(512L)).as("d_off"))
    val starts = counts.select("doc_id", "bucket")
      .join(packed, Seq("doc_id"))
      .groupBy("bucket")
      .agg(min(col("bin_id") * 512L + col("bin_offset")).as("bstart"))
    counts
      .join(packed, Seq("doc_id"))
      .join(direct, Seq("doc_id"))
      .join(broadcast(starts), Seq("bucket"))
      .join(filled.select("doc_id", "source", "n_toks"), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_toks"),
        (col("bin_id") === col("d_bin") && col("bin_offset") === col("d_off"))
          .as("bin_cross_checked"),
        (col("bstart") === 0L).as("bucket_starts_fresh"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[corpusBuild]]: the cluster-rank spine gates and
    * dedups, the staged-xxhash64 draw + per-source cumsum replays the fill
    * exactly; the two learned-count pack verdicts are pinned TRUE. */
  val corpusBuildSql: String = corpusBuildSqlImpl(ccnet = false)
  val corpusBuildCcnetSql: String = corpusBuildSqlImpl(ccnet = true)

  private def corpusBuildSqlImpl(ccnet: Boolean): String = {
    val ws = """'\s+'"""
    val drawn = drawSelect("keep0", "doc_id", Seq("source", "text"), 13L)
    val fluencyCtes = if (!ccnet) "" else
      s"""$lmScoreCtes,
         |fr AS (SELECT doc_id, lang, lm_score,
         |    row_number() OVER (PARTITION BY lang ORDER BY lm_score, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM scored),
         |fkeep AS (SELECT doc_id FROM fr WHERE 1 + ((rn - 1) * 3) // n >= 2),
         |""".stripMargin
    val fluencyClause = if (!ccnet) ""
      else "\n    AND d.doc_id IN (SELECT doc_id FROM fkeep)"
    s"""WITH RECURSIVE $clusterRankCtes,
       |$fluencyCtes
       |keep0 AS (
       |  SELECT d.doc_id, d.source, d.text
       |  FROM documents d JOIN q ON q.doc_id = d.doc_id
       |  WHERE q.quality_ok
       |    AND d.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rk > 1)$fluencyClause),
       |d2 AS ($drawn),
       |t AS (SELECT source, doc_id, draw,
       |    CAST(len(regexp_split_to_array(text, $ws)) AS BIGINT) AS n_toks
       |  FROM d2),
       |per AS (SELECT source, sum(n_toks) AS src_toks FROM t GROUP BY source),
       |tot AS (SELECT sum(src_toks) AS tot_toks FROM per),
       |wt AS (SELECT source, src_toks, tot_toks,
       |    pow(CAST(src_toks AS DOUBLE) / CAST(tot_toks AS DOUBLE), 0.7) AS w
       |  FROM per CROSS JOIN tot),
       |sw AS (SELECT sum(w) AS sum_w FROM wt),
       |budgets AS (SELECT source,
       |    CAST(floor(round(0.5 * CAST(tot_toks AS DOUBLE) * w / sum_w, 6))
       |      AS BIGINT) AS budget_toks
       |  FROM wt CROSS JOIN sw),
       |cs AS (SELECT source, doc_id, n_toks,
       |    sum(n_toks) OVER (PARTITION BY source
       |      ORDER BY draw DESC, doc_id) AS cum_toks
       |  FROM t)
       |SELECT cs.doc_id, cs.source, cs.n_toks,
       |  TRUE AS bin_cross_checked, TRUE AS bucket_starts_fresh
       |FROM cs JOIN budgets ON cs.source = budgets.source
       |WHERE cum_toks - n_toks < budget_toks
       |ORDER BY cs.doc_id""".stripMargin
  }

  /** Duplicated-span fraction per doc: stride-1 16-token windows that recur
    * verbatim in another document ([[Dedup.spanDupStats]]) — the
    * substring-level dedup signal doc-level near-dup misses. [SQL — same
    * windows compared as strings (join-on-hash vs join-on-string, the
    * dedup_ngram_jaccard precedent)]. */
  val dedupSpanFraction: Q = (s, dir) =>
    Dedup.spanDupStats(Tables.documents(s, dir), "doc_id", "text", window = 16)
      .select(col("id").as("doc_id"), col("n_windows"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_windows"), 6).as("dup_frac"))
      .orderBy("doc_id")

  val dedupSpanFractionSql: String =
    s"""WITH $toksCte,
       |wins AS (
       |  SELECT doc_id, array_to_string(w[i:i+15], ' ') AS win
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 14)) AS i
       |        FROM toksraw WHERE len(w) >= 16) q),
       |perdh AS (SELECT doc_id, win, count(*) AS n FROM wins GROUP BY 1, 2),
       |dup AS (SELECT win FROM perdh GROUP BY win HAVING count(*) >= 2),
       |nd AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_dup
       |  FROM perdh JOIN dup USING (win) GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_windows
       |  FROM perdh GROUP BY doc_id)
       |SELECT t.doc_id, t.n_windows, COALESCE(nd.n_dup, 0) AS n_dup,
       |  round(CAST(COALESCE(nd.n_dup, 0) AS DOUBLE) / t.n_windows, 6) AS dup_frac
       |FROM tot t LEFT JOIN nd USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Duplicated-span removal: drop every non-first occurrence of a
    * corpus-duplicated 16-token window and reassemble each document from
    * its surviving tokens ([[Dedup.removeDuplicatedSpans]]) — the cleaning
    * pass `dedup_span_fraction` only measures. [SQL — windows compared as
    * strings; the oracle replays keep-first, running-max coverage, and the
    * ORDER BY pos string_agg reassembly]. */
  val dedupSpanRemoval: Q = (s, dir) =>
    Dedup.removeDuplicatedSpans(Tables.documents(s, dir), "doc_id", "text",
        window = 16)
      .select(col("id").as("doc_id"), col("n_toks"), col("n_removed"),
        col("text_kept"))
      .orderBy("doc_id")

  val dedupSpanRemovalSql: String =
    s"""WITH $toksCte,
       |toks AS (SELECT doc_id, i, w[i] AS tok
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM toksraw) q),
       |wins AS (SELECT doc_id, i, array_to_string(w[i:i+15], ' ') AS win
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 14)) AS i
       |        FROM toksraw WHERE len(w) >= 16) q),
       |ranked AS (SELECT doc_id, i,
       |    row_number() OVER (PARTITION BY win ORDER BY doc_id, i) AS rn,
       |    count(*) OVER (PARTITION BY win) AS cnt
       |  FROM wins),
       |starts AS (SELECT doc_id, i FROM ranked WHERE cnt >= 2 AND rn >= 2),
       |cov AS (SELECT t.doc_id, t.i, t.tok,
       |    max(CASE WHEN s.i IS NOT NULL THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY t.doc_id ORDER BY t.i
       |            ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS removed
       |  FROM toks t LEFT JOIN starts s ON t.doc_id = s.doc_id AND t.i = s.i)
       |SELECT doc_id, count(*) AS n_toks, CAST(sum(removed) AS BIGINT) AS n_removed,
       |  COALESCE(string_agg(CASE WHEN removed = 0 THEN tok END, ' ' ORDER BY i), '')
       |    AS text_kept
       |FROM cov GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Shared token-list CTE text for the xxhash64-based dedup oracles (same
    * clean/split chain as [[dedupNgramJaccardSql]]), over table/CTE `src`. */
  private def toksCteFrom(src: String): String = {
    val clean = Duck.clean("text", punct = true)
    val ws = """'\s+'"""
    s"""toksraw AS (
       |  SELECT doc_id, string_split(regexp_replace(trim($clean), $ws, ' ', 'g'), ' ') AS w
       |  FROM $src)""".stripMargin
  }

  private def toksCte: String = toksCteFrom("documents")

  /** DuckDB twin of [[Dedup.simHashPairs]] — Spark's xxhash64 replayed
    * exactly (see Duck.xxh64StrCtes): per-token 64-bit hashes, ±1 votes per
    * bit, signature reassembly, 16-bit pigeonhole blocks, popcount verify.
    * `preCtes` prepends corpus-construction CTEs; `src` is the doc table the
    * tokenizer reads; `maxBlockDf` replays the hot-block drop rule (buckets
    * with count > cap are removed before the pair join — the deterministic
    * rule `maxBlockDf` applies engine-side). */
  private def simhashSqlFor(preCtes: String, src: String,
                            maxBlockDf: Option[Int]): String = {
    val bitsVals = (0 until 64)
      .map(b => s"($b, ${BigInt(1) << b}::HUGEINT)").mkString(", ")
    val blkVals = (0 until 4)
      .map(b => s"($b, ${BigInt(1) << (16 * b)}::HUGEINT)").mkString(", ")
    val capCtes = maxBlockDf.map(c =>
      s"""
         |hot AS (SELECT blk, blk_val FROM blocks
         |  GROUP BY blk, blk_val HAVING count(*) > $c),
         |cold AS (SELECT b.* FROM blocks b WHERE NOT EXISTS (
         |  SELECT 1 FROM hot h WHERE h.blk = b.blk AND h.blk_val = b.blk_val)),""".stripMargin)
      .getOrElse("")
    val pairSrc = if (maxBlockDf.isDefined) "cold" else "blocks"
    s"""WITH RECURSIVE
       |$preCtes${toksCteFrom(src)},
       |tokf AS (SELECT doc_id, tok
       |  FROM (SELECT doc_id, unnest(w) AS tok FROM toksraw) WHERE length(tok) > 0),
       |strs AS (SELECT tok AS sid, tok AS s, CAST(42 AS HUGEINT) AS seed
       |  FROM (SELECT DISTINCT tok FROM tokf)),
       |${Duck.xxh64StrCtes("strs")},
       |bits AS (SELECT c0 AS b, c1 AS p FROM (VALUES $bitsVals) v(c0, c1)),
       |blkp AS (SELECT c0 AS blk, c1 AS p FROM (VALUES $blkVals) v(c0, c1)),
       |th AS (SELECT t.doc_id, x.h FROM tokf t JOIN xstr x ON x.sid = t.tok),
       |votes AS (SELECT doc_id, b,
       |    sum(CASE WHEN (h // p) % 2 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM th CROSS JOIN bits GROUP BY doc_id, b),
       |sig AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN v > 0 THEN p ELSE 0::HUGEINT END) AS HUGEINT) AS simu
       |  FROM votes JOIN bits USING (b) GROUP BY doc_id),
       |sigs AS (SELECT doc_id, simu, ${Duck.toSigned("simu")} AS sim FROM sig),
       |blocks AS (SELECT doc_id, sim, blk, (simu // p) % 65536 AS blk_val
       |  FROM sigs CROSS JOIN blkp),$capCtes
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    bit_count(xor(a.sim, b.sim)) AS hamming
       |  FROM $pairSrc a JOIN $pairSrc b
       |    ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  val dedupSimhashSql: String = simhashSqlFor("", "documents", None)

  /** DuckDB twin of [[dedupMinhashLsh]]: per-shingle XXH64, the 32 seeded
    * variants as hashInt(k,42)→hashLong chains, signed min per (doc, k),
    * 8×4 banding (bucket equality on band VALUES — band-hash collisions are the
    * only divergence from Spark's xxhash64(band) bucket key, astronomically
    * unlikely and absent at test scale), signature-estimated Jaccard ≥ 0.5. */
  val dedupMinhashLshSql: String = {
    val kseeds = Duck.stagedSql(
      "SELECT CAST(unnest(range(0, 32)) AS HUGEINT) AS k",
      Duck.xxhashIntStages("k", "42", "seedk", "i"))
    val khash = Duck.stagedSql(
      "SELECT s.doc_id, s.h0, ks.k, ks.seedk FROM sh0 s CROSS JOIN kseeds ks",
      Duck.xxhashLongStages("h0", "seedk", "hk", "k"))
    s"""WITH RECURSIVE
       |$toksCte,
       |shing AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
       |        FROM toksraw WHERE len(w) >= 3) q),
       |strs AS (SELECT sh AS sid, sh AS s, CAST(42 AS HUGEINT) AS seed
       |  FROM (SELECT DISTINCT sh FROM shing)),
       |${Duck.xxh64StrCtes("strs")},
       |sh0 AS (SELECT g.doc_id, x.h AS h0 FROM shing g JOIN xstr x ON x.sid = g.sh),
       |kseeds AS ($kseeds),
       |khash AS (SELECT doc_id, k, hk FROM ($khash)),
       |sig AS (SELECT doc_id, k, min(${Duck.toSigned("hk")}) AS mh
       |  FROM khash GROUP BY doc_id, k),
       |bands AS (SELECT doc_id, k // 4 AS band_id, list(mh ORDER BY k) AS band
       |  FROM sig GROUP BY doc_id, k // 4),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band = b.band AND a.doc_id < b.doc_id),
       |est AS (SELECT c.id_a, c.id_b,
       |    CAST(count(*) FILTER (sa.mh = sb.mh) AS DOUBLE) / 32 AS est_jaccard
       |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
       |  JOIN sig sb ON sb.doc_id = c.id_b AND sb.k = sa.k
       |  GROUP BY c.id_a, c.id_b)
       |SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** [[dedupCrossSourceMatrix]] twin: the whole LSH spine as a subquery,
    * source lookup by id join, unordered-pair rollup with order-free
    * min/max. */
  val dedupCrossSourceMatrixSql: String =
    s"""SELECT least(a.source, b.source) AS source_lo,
       |  greatest(a.source, b.source) AS source_hi,
       |  count(*) AS n_pairs,
       |  min(p.est_jaccard) AS min_est, max(p.est_jaccard) AS max_est
       |FROM ($dedupMinhashLshSql) p
       |JOIN documents a ON a.doc_id = p.id_a
       |JOIN documents b ON b.doc_id = p.id_b
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Cross-snapshot near-dup delta ([[Dedup.minHashDelta]]): yesterday's
    * snapshot = docs with doc_id % 4 != 0, today's crawl = the rest PLUS ten
    * planted verbatim re-crawls of base docs (ids offset by 10^7, the
    * [[dedupEmbedding]] planted-corpus pattern — guaranteed est 1.0 flags at
    * any sf, on top of whatever natural near-dups straddle the split). Flags
    * each incoming doc that is a MinHash near-dup of ANY base doc.
    *
    * Runs the AT-SCALE delta shape: the base snapshot's signatures are a
    * persisted [[graft.operators.SignatureStore]] artifact (content-digest
    * keyed, built once per corpus like the ANN indexes) and
    * [[Dedup.minHashDeltaStored]] hashes ONLY the incoming docs — the
    * timed work is the incoming-side hash plus a parquet scan of stored
    * 8·32-byte signature rows, exactly what a snapshot delta costs at
    * 100 TB. [SQL] */
  val dedupDeltaMinhash: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val base = docs.filter(pmod(col("doc_id"), lit(4L)) =!= 0L)
    val planted = docs
      .filter(pmod(col("doc_id"), lit(4L)) === 1L && col("doc_id") < 40)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val incoming = docs.filter(pmod(col("doc_id"), lit(4L)) === 0L)
      .unionByName(planted)
    val sigDir = graft.operators.SignatureStore.storeDir(base,
      s"$dir/documents.parquet", "doc_id", "text", numHashes = 32,
      shingleSize = 3, variant = "deltabase_mod4")
    Dedup.minHashDeltaStored(
        graft.operators.SignatureStore.read(s, sigDir),
        incoming, "doc_id", "text",
        numHashes = 32, bands = 8, shingleSize = 3, threshold = 0.5)
      .orderBy("doc_id")
  }

  /** At-scale delta screen WITH the hot-band guard ENGAGED
    * ([[graft.operators.SignatureStore.probeStored]]'s `maxBandDf`,
    * answered from the hotbands census sidecar when present): the base
    * snapshot carries a planted 40-copy templated BLOB (doc 1's text,
    * ids +2·10^7) whose band groups flood past the cap, so a probe of the
    * blob's own text surfaces NOTHING (every matching band hot — the
    * documented recall trade at its exact boundary) while the other
    * planted true dups keep flagging through their cold bands. The DuckDB
    * twin replays the cap as a HAVING count(*) <= cap filter over the
    * base side's band census — group identity is the band VALUE list, so
    * the drop set is bit-deterministic on both sides. [SQL] */
  val dedupDeltaMinhashCapped: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val blob = docs.filter(col("doc_id") === 1L)
      .select(explode(sequence(lit(0L), lit(39L))).as("i"), col("text"))
      .select((col("i") + 20000000L).as("doc_id"), col("text"))
    val base = docs.filter(pmod(col("doc_id"), lit(4L)) =!= 0L)
      .unionByName(blob)
    val planted = docs
      .filter(pmod(col("doc_id"), lit(4L)) === 1L && col("doc_id") < 40)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val incoming = docs.filter(pmod(col("doc_id"), lit(4L)) === 0L)
      .unionByName(planted)
    val sigDir = graft.operators.SignatureStore.storeDir(base,
      s"$dir/documents.parquet", "doc_id", "text", numHashes = 32,
      shingleSize = 3, variant = "deltabase_mod4_blob40")
    val probeSigs = Dedup.minHashSignatures(incoming, "doc_id", "text",
      32, 3)
    graft.operators.SignatureStore.probeStored(s, sigDir, probeSigs,
        numHashes = 32, bands = 8, threshold = 0.5, maxBandDf = 20)
      .orderBy("doc_id")
  }

  /** Cross-store consistency audit ([[graft.operators.Fsck]]) driven
    * through the oracle gate: the signature store seeds from the
    * `doc_id % 4 != 0` slice while the semantic index builds over
    * `vec_id % 5 != 0` — a deliberately MIS-WIRED door trio (the
    * deployment error fsck exists to catch), so `door_membership` must
    * name exactly the ids stored in ann but absent from sig, and every
    * internal check (sigs⟷bands agreement, census overcount, orphan ann
    * lists, crash residue) must report CLEAN over API-built stores. The
    * DuckDB twin recomputes the membership set-difference from the same
    * slices. [SQL] */
  val storeFsck: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val sigSlice = docs.filter(pmod(col("doc_id"), lit(4L)) =!= 0L)
    val sigDir = graft.operators.SignatureStore.storeDir(sigSlice,
      s"$dir/documents.parquet", "doc_id", "text", numHashes = 32,
      shingleSize = 3, variant = "fsck_mod4")
    val embs = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val annSlice = embs.filter(pmod(col("vec_id"), lit(5L)) =!= 0L)
    val ivfDir = graft.operators.AnnIndex.ivfIndexDir(annSlice,
      s"$dir/embeddings.parquet", "vec_id", "embedding", nlist = 16,
      iters = 3, variant = "fsck_mod5")
    graft.operators.Fsck.report(s, graft.operators.CorpusStores(
        sigDir = Some(sigDir), ivfDir = Some(ivfDir)))
      .orderBy("check_name", "layer", "id")
  }

  /** DuckDB twin of [[storeFsck]]: the only findings a mis-wired but
    * internally clean trio can produce are the ann-not-sig memberships. */
  val storeFsckSql: String =
    """SELECT 'door_membership' AS check_name, 'ann' AS layer,
      |       CAST(vec_id AS BIGINT) AS id,
      |       'stored in ann but not in sig' AS detail
      |FROM embeddings
      |WHERE vec_id % 5 != 0
      |  AND vec_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 4 != 0)
      |ORDER BY check_name, layer, id""".stripMargin

  /** DuckDB twin of [[dedupDeltaMinhash]]: the [[dedupMinhashLshSql]]
    * signature machinery over the side-tagged corpus; candidates are
    * in-side × base-side band-VALUE matches (band-hash collisions are the
    * only divergence from Spark's xxhash64 bucket key, astronomically
    * unlikely), verified by per-k signature agreement / 32. Parameterized
    * over the corpus CTE and an optional hot-band cap so the capped twin
    * ([[dedupDeltaMinhashCapped]]) replays the same machinery with a
    * census filter on the base side's band groups. */
  private def deltaMinhashSqlFor(corpusCte: String,
                                 maxBandDf: Option[Int]): String = {
    val kseeds = Duck.stagedSql(
      "SELECT CAST(unnest(range(0, 32)) AS HUGEINT) AS k",
      Duck.xxhashIntStages("k", "42", "seedk", "i"))
    val khash = Duck.stagedSql(
      "SELECT s.doc_id, s.h0, ks.k, ks.seedk FROM sh0 s CROSS JOIN kseeds ks",
      Duck.xxhashLongStages("h0", "seedk", "hk", "k"))
    val censusCte = maxBandDf.fold("")(cap =>
      s"""banddf AS (SELECT b.band_id, b.band
         |  FROM bands b JOIN corpus c ON c.doc_id = b.doc_id AND c.side = 'base'
         |  GROUP BY b.band_id, b.band HAVING count(*) <= $cap),
         |""".stripMargin)
    val candJoin = if (maxBandDf.isDefined)
      "\n  JOIN banddf d ON d.band_id = a.band_id AND d.band = a.band" else ""
    s"""WITH RECURSIVE
       |corpus AS ($corpusCte),
       |${toksCteFrom("corpus")},
       |shing AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
       |        FROM toksraw WHERE len(w) >= 3) q),
       |strs AS (SELECT sh AS sid, sh AS s, CAST(42 AS HUGEINT) AS seed
       |  FROM (SELECT DISTINCT sh FROM shing)),
       |${Duck.xxh64StrCtes("strs")},
       |sh0 AS (SELECT g.doc_id, x.h AS h0 FROM shing g JOIN xstr x ON x.sid = g.sh),
       |kseeds AS ($kseeds),
       |khash AS (SELECT doc_id, k, hk FROM ($khash)),
       |sig AS (SELECT doc_id, k, min(${Duck.toSigned("hk")}) AS mh
       |  FROM khash GROUP BY doc_id, k),
       |bands AS (SELECT doc_id, k // 4 AS band_id, list(mh ORDER BY k) AS band
       |  FROM sig GROUP BY doc_id, k // 4),
       |${censusCte}cand AS (SELECT DISTINCT a.doc_id AS id_in, b.doc_id AS id_base
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band = b.band$candJoin
       |  JOIN corpus ca ON ca.doc_id = a.doc_id AND ca.side = 'in'
       |  JOIN corpus cb ON cb.doc_id = b.doc_id AND cb.side = 'base'),
       |est AS (SELECT c.id_in, c.id_base,
       |    CAST(count(*) FILTER (sa.mh = sb.mh) AS DOUBLE) / 32 AS est_jaccard
       |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_in
       |  JOIN sig sb ON sb.doc_id = c.id_base AND sb.k = sa.k
       |  GROUP BY c.id_in, c.id_base)
       |SELECT id_in AS doc_id, count(*) AS n_base_dups,
       |  round(max(est_jaccard), 6) AS max_est
       |FROM est WHERE est_jaccard >= 0.5
       |GROUP BY id_in ORDER BY doc_id""".stripMargin
  }

  private val DeltaCorpusCte =
    """SELECT doc_id, text,
      |    CASE WHEN doc_id % 4 = 0 THEN 'in' ELSE 'base' END AS side
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id, text, 'in' AS side
      |  FROM documents WHERE doc_id % 4 = 1 AND doc_id < 40""".stripMargin

  val dedupDeltaMinhashSql: String =
    deltaMinhashSqlFor(DeltaCorpusCte, None)

  val dedupDeltaMinhashCappedSql: String =
    deltaMinhashSqlFor(DeltaCorpusCte +
      """
        |  UNION ALL
        |  SELECT 20000000 + q.r AS doc_id, d.text, 'base' AS side
        |  FROM documents d CROSS JOIN
        |    (SELECT unnest(range(0, 40)) AS r) q
        |  WHERE d.doc_id = 1""".stripMargin, Some(20))

  /** Embedding-cosine near-dups via sign-LSH buckets (rows-only).
    *
    * The synthetic embeddings are i.i.d. random, so true near-dups don't exist;
    * to exercise the operator end-to-end the corpus is augmented with
    * deterministically perturbed copies of the first 20 vectors (ids offset by
    * 10^7, pseudo-noise σ=0.05) — the operator must recover exactly those
    * planted pairs at any scale factor. */
  val dedupEmbedding: Q = (s, dir) => {
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val planted = base.filter(col("vec_id") < 20).select(
      (col("vec_id") + 10000000L).as("vec_id"),
      graft.functions.VecFns.addPseudoNoise(
        col("embedding"), col("vec_id"), lit(0.05)).as("embedding"))
    Dedup.embeddingNearDup(base.unionByName(planted), "vec_id", "embedding",
        planes = 8, threshold = 0.9)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")
  }

  /** The AT-SCALE embedding near-dup: [[dedupEmbedding]]'s planted corpus
    * through [[graft.operators.Dedup.embeddingNearDupBanded]] — 4 bands of
    * [[graft.operators.Dedup.adaptiveSignBits]]-deep sign-LSH keys, so
    * bucket occupancy (and with it the candidate pair count) stays flat as
    * the corpus grows, where the fixed-plane [[dedupEmbedding]] measured
    * 31× cost for 100× data at the sf10 decade. The DuckDB twin derives
    * the SAME adaptive depth from the same count via integer bit-length
    * (`length(bin(...))` — no float log2) and replays the band keys as
    * `(sig // 2^(j·15)) % 2^r`, so the recall/efficiency trade sits inside
    * the hash gate, not beside it. [SQL] */
  val dedupEmbeddingBanded: Q = (s, dir) => {
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val planted = base.filter(col("vec_id") < 20).select(
      (col("vec_id") + 10000000L).as("vec_id"),
      graft.functions.VecFns.addPseudoNoise(
        col("embedding"), col("vec_id"), lit(0.05)).as("embedding"))
    Dedup.embeddingNearDupBanded(base.unionByName(planted), "vec_id",
        "embedding", bands = 4, bitsPerBand = 15, targetBucket = 32L,
        threshold = 0.9)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")
  }

  /** DuckDB twin of [[dedupEmbeddingBanded]] — same corpus, same 60-plane
    * signature, same integer-derived band depth. */
  val dedupEmbeddingBandedSql: String =
    s"""WITH corpus AS (
       |  SELECT vec_id, embedding AS vec FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 10000000 AS vec_id,
       |         ${Duck.pseudoNoise("embedding", "vec_id", "0.05")} AS vec
       |  FROM embeddings WHERE vec_id < 20),
       |par AS (SELECT least(15, greatest(8,
       |    length(bin((count(*) + 31) // 32)))) AS r FROM corpus),
       |b AS (SELECT vec_id, vec, ${Duck.signBucket("vec", 60)} AS sig
       |      FROM corpus),
       |e AS (SELECT b.vec_id, b.vec, j.band,
       |        (b.sig // (CAST(1 AS BIGINT) << (j.band * 15)))
       |          % (CAST(1 AS BIGINT) << p.r) AS bucket
       |      FROM b CROSS JOIN par p
       |      CROSS JOIN (SELECT unnest(range(0, 4)) AS band) j),
       |p2 AS (SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
       |        ${Duck.cosine("a.vec", "c.vec")} AS cos
       |       FROM e a JOIN e c ON a.band = c.band AND a.bucket = c.bucket
       |         AND a.vec_id < c.vec_id)
       |SELECT id_a, id_b, round(cos, 4) AS cos FROM p2 WHERE cos >= 0.9
       |ORDER BY id_a, id_b""".stripMargin

  /** Depth-arithmetic pin for [[dedupEmbeddingBanded]]: at the oracle
    * gate's corpus sizes the adaptive depth always clamps to the r = 8
    * floor, so the DYNAMIC band-key arithmetic (r in (8, 15]) would never
    * cross the DuckDB gate — exactly the kind of silent at-scale-only
    * divergence this surface exists to prevent. This query inflates the
    * COUNT (not the data: no quadratic pair work on either engine) by
    * three synthetic deltas chosen to land r = 9, 13 and the 15 ceiling,
    * and emits the first vectors' per-band bucket keys at each depth —
    * both the integer bit-length depth rule and the
    * `(sig // 2^(15j)) % 2^r` key extraction replay bit-exactly. [SQL] */
  val dedupEmbeddingBandedDepth: Q = (s, dir) => {
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n0 = base.count()
    val sig = graft.operators.Similarity.signBits(col("embedding"), 60)
    Seq(8000L, 200000L, 1000000000L).map { inf =>
      val r = Dedup.adaptiveSignBits(n0 + inf, 32L, 15)
      val mask = (1L << r) - 1
      val keys = array((0 until 4).map(j =>
        shiftright(sig, j * 15).bitwiseAND(lit(mask))): _*)
      base.filter(col("vec_id") < 4)
        .select(lit(inf).as("inflate"), lit(r).as("r"), col("vec_id"),
          posexplode(keys).as(Seq("band", "bucket")))
    }.reduce(_.unionByName(_))
      .select(col("inflate").cast("long").as("inflate"),
        col("r").cast("long").as("r"), col("vec_id"),
        col("band").cast("long").as("band"), col("bucket"))
      .orderBy("inflate", "vec_id", "band")
  }

  /** DuckDB twin of [[dedupEmbeddingBandedDepth]]. */
  val dedupEmbeddingBandedDepthSql: String =
    s"""WITH n0 AS (SELECT count(*) AS n FROM embeddings),
       |infl AS (SELECT unnest([8000, 200000, 1000000000]) AS inflate),
       |par AS (SELECT i.inflate,
       |    least(15, greatest(8,
       |      length(bin((n0.n + i.inflate + 31) // 32)))) AS r
       |  FROM infl i CROSS JOIN n0),
       |b AS (SELECT vec_id, ${Duck.signBucket("embedding", 60)} AS sig
       |      FROM embeddings WHERE vec_id < 4)
       |SELECT CAST(p.inflate AS BIGINT) AS inflate,
       |  CAST(p.r AS BIGINT) AS r, b.vec_id,
       |  CAST(j.band AS BIGINT) AS band,
       |  (b.sig // (CAST(1 AS BIGINT) << (j.band * 15)))
       |    % (CAST(1 AS BIGINT) << p.r) AS bucket
       |FROM b CROSS JOIN par p
       |CROSS JOIN (SELECT unnest(range(0, 4)) AS band) j
       |ORDER BY inflate, vec_id, band""".stripMargin

  /** SemDeDup over the same planted corpus as [[dedupEmbedding]]:
    * deterministic first-16 coarse centroids (the [[simIvfTopK]] pick),
    * within-cluster cosine ≥ 0.9 prune, keep-smallest-id. Every planted
    * noisy copy should lose to its original unless the noise pushed it
    * across a cluster boundary — which the oracle replays identically. */
  val dedupSemantic: Q = (s, dir) => {
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val planted = base.filter(col("vec_id") < 20).select(
      (col("vec_id") + 10000000L).as("vec_id"),
      graft.functions.VecFns.addPseudoNoise(
        col("embedding"), col("vec_id"), lit(0.05)).as("embedding"))
    val corpus = base.unionByName(planted)
    val cents: Array[Array[Double]] = corpus.orderBy("vec_id").limit(16)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    Dedup.semanticDedup(corpus, "vec_id", "embedding", cents, threshold = 0.9)
      .select(col("id").as("vec_id"), col("cluster_id"), col("kept"))
      .orderBy("vec_id")
  }

  /** DuckDB twin of [[dedupSemantic]]: same planted corpus, centroids =
    * first 16 by id, assignment ranked by (squared-L2 asc, list_id asc)
    * like the NearestCentroids kernel, same unrounded ≥ 0.9 cosine gate
    * (the [[dedupEmbedding]] float-parity precedent). */
  val dedupSemanticSql: String =
    s"""WITH corpus AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 10000000 AS vec_id,
       |         ${Duck.pseudoNoise("embedding", "vec_id", "0.05")} AS embedding
       |  FROM embeddings WHERE vec_id < 20),
       |cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS list_id,
       |    embedding AS cvec
       |  FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT 16)),
       |ad AS (SELECT e.vec_id, e.embedding, c.list_id,
       |    ${Duck.l2Sq("e.embedding", "c.cvec")} AS d2
       |  FROM corpus e CROSS JOIN cent c),
       |assign AS (SELECT vec_id, embedding, list_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rk FROM ad)
       |  WHERE rk = 1),
       |dup AS (SELECT DISTINCT a.vec_id FROM assign a JOIN assign b
       |  ON a.list_id = b.list_id AND b.vec_id < a.vec_id
       |  WHERE ${Duck.cosine("a.embedding", "b.embedding")} >= 0.9)
       |SELECT a.vec_id, CAST(a.list_id AS BIGINT) AS cluster_id,
       |  (d.vec_id IS NULL) AS kept
       |FROM assign a LEFT JOIN dup d ON a.vec_id = d.vec_id
       |ORDER BY a.vec_id""".stripMargin

  // ---- Similarity search ----------------------------------------------------

  val simBruteTopK: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "vec_id", "embedding", k = 10)
      .select(col("qid"), col("rk").cast("long").as("rk"), col("cid"),
        round(col("cos"), 4).as("cos"))
      .orderBy("qid", "rk")
  }

  val simBruteSql: String =
    s"""WITH sc AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    ${Duck.cosine("q.embedding", "c.embedding")} AS cos
       |  FROM embeddings q CROSS JOIN embeddings c WHERE q.vec_id < 5),
       |r AS (SELECT qid, cid, cos,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
       |SELECT qid, rk, cid, round(cos, 4) AS cos FROM r WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin

  /** LSH-bucketed approximate top-k. [SQL — the sign-LSH buckets are the
    * integer-mix arithmetic of [[Similarity.signBits]], replayed exactly]. */
  val simLshTopK: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.lshTopK(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "vec_id", "embedding", k = 10, planes = 8, probes = 4)
      .select(col("qid"), col("rk").cast("long").as("rk"), col("cid"),
        round(col("cos"), 4).as("cos"))
      .orderBy("qid", "rk")
  }

  /** DuckDB twin of [[simLshTopK]] (planes=8, probes=4, k=10): home bucket plus
    * the four single-bit-flip probe buckets; (cos desc, cid) rank. */
  val simLshSql: String =
    s"""WITH b AS (SELECT vec_id, embedding,
       |    ${Duck.signBucket("embedding", 8)} AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qvec,
       |    unnest([bucket, xor(bucket,1), xor(bucket,2), xor(bucket,4), xor(bucket,8)]) AS bucket
       |  FROM b WHERE vec_id < 5),
       |sc AS (SELECT q.qid, c.vec_id AS cid, ${Duck.cosine("q.qvec", "c.embedding")} AS cos
       |  FROM q JOIN b c USING (bucket)),
       |r AS (SELECT qid, cid, cos,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
       |SELECT qid, rk, cid, round(cos, 4) AS cos FROM r WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin

  /** IVF-style approximate top-k. [SQL — centroid pick, nearest-centroid
    * assignment, and probe selection all replay in DuckDB]. */
  val simIvfTopK: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopK(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4)
      .select(col("qid"), col("rk").cast("long").as("rk"), col("cid"),
        round(col("cos"), 4).as("cos"))
      .orderBy("qid", "rk")
  }

  /** DuckDB twin of [[simIvfTopK]] (nlist=16, nprobe=4, k=10): centroids = first
    * 16 corpus vectors by id; assignment / probes rank by (squared-L2 asc,
    * list_id asc) exactly like the NearestCentroids kernel's tie-break. */
  val simIvfSql: String =
    s"""WITH cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS list_id,
       |    embedding AS cvec
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
       |ad AS (SELECT e.vec_id, e.embedding, c.list_id,
       |    ${Duck.l2Sq("e.embedding", "c.cvec")} AS d2
       |  FROM embeddings e CROSS JOIN cent c),
       |assign AS (SELECT vec_id AS cid, embedding AS cvec, list_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rk FROM ad)
       |  WHERE rk = 1),
       |qp AS (SELECT vec_id AS qid, embedding AS qvec, list_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rk
       |   FROM ad WHERE vec_id < 5)
       |  WHERE rk <= 4),
       |sc AS (SELECT qp.qid, a.cid, ${Duck.cosine("qp.qvec", "a.cvec")} AS cos
       |  FROM qp JOIN assign a USING (list_id)),
       |r AS (SELECT qid, cid, cos,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
       |SELECT qid, rk, cid, round(cos, 4) AS cos FROM r WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin

  /** Product-quantization top-k over the embedding corpus. [SQL] */
  val simPqTopK: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    Similarity.pqTopK(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "vec_id", "embedding", k = 10, m = 8, ksub = 16)
      .select(col("qid"), col("rk").cast("long").as("rk"), col("cid"),
        round(col("adist"), 6).as("adist"))
      .orderBy("qid", "rk")
  }

  /** DuckDB twin of [[simPqTopK]] (m=8, ksub=16, k=10): the deterministic
    * codebook is the same integer-mix arithmetic, the per-subspace argmin
    * replays the NearestCentroids (L2² asc, id asc) tie-break, and the ADC
    * sum folds subspace terms in b order — all bit-exact. */
  val simPqSql: String = {
    val m = 8; val ksub = 16; val sub = 8
    val cbComp = // component i-1 of centroid (b, j), i 1-based from range
      s"((((b * 7919 + j * 2654435761 + (i - 1) * 40503 + 12345) % 100000)" +
        s" / 100000.0 - 0.5) * 2.0)"
    s"""WITH cb AS (SELECT b, j, [$cbComp FOR i IN range(1, $sub + 1)] AS cent
       |  FROM (SELECT unnest(range(0, $m)) AS b)
       |  CROSS JOIN (SELECT unnest(range(0, $ksub)) AS j)),
       |sl AS (SELECT vec_id, bb.b,
       |    embedding[bb.b * $sub + 1 : bb.b * $sub + $sub] AS sl
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, $m)) AS b) bb),
       |dists AS (SELECT s.vec_id, s.b, c.j, ${Duck.l2Sq("s.sl", "c.cent")} AS d
       |  FROM sl s JOIN cb c ON c.b = s.b),
       |codes AS (SELECT vec_id, b, j FROM
       |  (SELECT vec_id, b, j, row_number() OVER (PARTITION BY vec_id, b
       |     ORDER BY d ASC, j ASC) AS rk FROM dists)
       |  WHERE rk = 1),
       |qdist AS (SELECT vec_id AS qid, b, j, d AS qd
       |  FROM dists WHERE vec_id < 5),
       |adc AS (SELECT qd.qid, k.vec_id AS cid,
       |    ${Duck.foldSum("list(qd.qd ORDER BY qd.b)")} AS adist
       |  FROM codes k JOIN qdist qd ON qd.b = k.b AND qd.j = k.j
       |  GROUP BY qd.qid, k.vec_id),
       |r AS (SELECT qid, cid, adist,
       |  row_number() OVER (PARTITION BY qid ORDER BY adist ASC, cid) AS rk FROM adc)
       |SELECT qid, rk, cid, round(adist, 6) AS adist FROM r WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin
  }

  /** Planted-cluster corpus for the trained-quantizer recall gates: centers =
    * the first 20 embeddings, each with 25 deterministic pseudo-noise copies
    * (σ=0.15, ids offset into the 10^7 range) — so each center's exact top-10
    * is dominated by its own cluster, and a quantizer that separates clusters
    * must recover it. Same planting device as [[dedupEmbedding]]. */
  private val plantedMemo = new graft.SessionMemo[DataFrame]

  private def plantedClusters(s: SparkSession, dir: String): DataFrame =
    // Memoized per (session, dir): the checkpointed corpus is re-read by
    // every trained-recall gate and by each benchmark repetition — reusing
    // the same LogicalRDD also lets KMeansQuantizer's plan-identity memo hit
    // instead of retraining per invocation.
    plantedMemo.getOrBuild(s, dir)(plantedClustersBuild(s, dir))

  private def plantedClustersBuild(s: SparkSession, dir: String): DataFrame = {
    val centers = Tables.embeddings(s, dir).filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    // Two-stage select: an output alias named `vec_id` next to an expression
    // reading `vec_id` trips Spark 4's implicit lateral-column-alias
    // resolution — the noise rowId would silently read the NEW id and
    // overflow. Naming the copy id first keeps resolution unambiguous.
    val copies = centers
      .crossJoin(broadcast(s.range(1, 26).select(col("id").as("j"))))
      .select((col("vec_id") * 1000 + col("j")).as("copy_id"), col("embedding"))
      .select((col("copy_id") + 10000000L).as("vec_id"),
        graft.functions.VecFns.addPseudoNoise(col("embedding"),
          col("copy_id"), lit(0.15)).as("embedding"))
    // Pinned once: k-means iterations + brute/approx/verdict all re-read this
    // tiny (520-row) corpus many times — don't re-derive the planting per job.
    centers.unionByName(copies).localCheckpoint()
  }

  /** recall@10 verdict for `approx` against the exact `exact` top-k (both
    * (qid, cid)): TRUE iff ≥ `need` of the exact top-k appear in approx. A
    * qid fully missing from approx keeps its rows (exact is the left side)
    * with zero hits → recall_ok=false → hash mismatch, so the oracle catches
    * total recall failure too. */
  private def recallVerdict(exact: DataFrame, approx: DataFrame,
                            need: Int): DataFrame =
    exact.join(approx.withColumn("hit", lit(1)), Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg((sum(coalesce(col("hit"), lit(0))) >= need).as("recall_ok"))
      .orderBy("qid")

  /** Seeded-k-means IVF recall gate: trained coarse centroids (nlist=16,
    * nprobe=4, 3 Lloyd iterations) must recover ≥ 9 of each planted center's
    * exact top-10. Training is fp-order-sensitive → verdict oracle (the DuckDB
    * twin pins every recall_ok TRUE), the numeric recall is additionally
    * asserted ≥ 0.9 in ScalaTest. */
  val simIvfTrainedRecall: Q = (s, dir) => {
    val corpus = plantedClusters(s, dir)
    val q = corpus.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, corpus,
      "vec_id", "vec_id", "embedding", k = 10).select("qid", "cid")
    val approx = Similarity.ivfTopKTrained(q, corpus,
        "vec_id", "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4,
        iters = 3, seed = 42L)
      .select("qid", "cid")
    recallVerdict(exact, approx, need = 9)
  }

  /** Trained-PQ + exact-re-rank recall gate: the m=8×ksub=16 codebook is
    * k-means-trained per subspace, ADC builds a 50-deep shortlist, and the
    * shortlist re-ranks by exact cosine (the FAISS refine stage) — ≥ 9 of
    * each exact top-10 must survive. */
  val simPqTrainedRecall: Q = (s, dir) => {
    val corpus = plantedClusters(s, dir)
    val q = corpus.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, corpus,
      "vec_id", "vec_id", "embedding", k = 10).select("qid", "cid")
    val cb = graft.ml.KMeansQuantizer.fitProduct(corpus, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 3, seed = 42L)
    val approx = Similarity.pqRefineTopK(q, corpus,
        "vec_id", "vec_id", "embedding", k = 10, cb, rerank = 50)
      .select("qid", "cid")
    recallVerdict(exact, approx, need = 9)
  }

  /** Persisted-IVF-index recall gate: the index builds once per (corpus
    * content, params) into the keyed cache — coarse centroids trained, the
    * inverted file written `partitionBy(list_id)` — and the query path reads
    * ONLY the probed partitions (static partition pruning, pinned in
    * AnnIndexSpec). Same planted-cluster ground truth and verdict oracle as
    * the in-memory trained gates. */
  val simIvfIndexRecall: Q = (s, dir) => {
    val corpus = plantedClusters(s, dir)
    val q = corpus.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, corpus,
      "vec_id", "vec_id", "embedding", k = 10).select("qid", "cid")
    val idx = graft.operators.AnnIndex.ivfIndexDir(corpus,
      s"$dir/embeddings.parquet", "vec_id", "embedding",
      nlist = 16, iters = 3, seed = 42L, variant = "planted_v1")
    val approx = graft.operators.AnnIndex.queryIvf(s, idx, q,
        "vec_id", "embedding", k = 10, nprobe = 4)
      .select("qid", "cid")
    recallVerdict(exact, approx, need = 9)
  }

  /** Persisted-IVF+PQ-index recall gate: inverted lists hold m-byte PQ codes
    * (never raw vectors — the ~64×-smaller on-disk FAISS IVFPQ layout), the
    * query path ADCs only the probed partitions into a 50-deep shortlist,
    * and the shortlist re-ranks by exact cosine against the corpus. Same
    * planted ground truth and verdict oracle as the other trained gates. */
  val simIvfPqIndexRecall: Q = (s, dir) => {
    val corpus = plantedClusters(s, dir)
    val q = corpus.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, corpus,
      "vec_id", "vec_id", "embedding", k = 10).select("qid", "cid")
    val idx = graft.operators.AnnIndex.ivfPqIndexDir(corpus,
      s"$dir/embeddings.parquet", "vec_id", "embedding",
      nlist = 16, m = 8, ksub = 16, iters = 3, seed = 42L,
      variant = "planted_v1")
    val approx = graft.operators.AnnIndex.queryIvfPq(s, idx, corpus, q,
        "vec_id", "vec_id", "embedding", k = 10, nprobe = 4, rerank = 50)
      .select("qid", "cid")
    recallVerdict(exact, approx, need = 9)
  }

  /** Random-projection recall gate: the 64-dim planted vectors reduce to 32
    * dims through a seeded JL matrix (2× cheaper scan+score), a 150-deep
    * reduced-space shortlist re-ranks by exact full-dim cosine, and ≥ 9 of
    * each exact top-10 must survive — the dimensionality-reduction scale
    * path verified like the quantizer gates. The shortlist depth is sized to
    * the JL error at k=32 on THIS corpus (noisy copies sit at ~0.8 cosine to
    * their center, so the exact-top-10 borderline is within the ±1/√32
    * inner-product error — 100 measurably misses members, 150 recovers all);
    * operationally the contract is the ABSOLUTE |Q|·rerank fetch, which at
    * real corpus sizes is a vanishing fraction of a scan. */
  val simRpTopK: Q = (s, dir) => {
    val corpus = plantedClusters(s, dir)
    val q = corpus.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, corpus,
      "vec_id", "vec_id", "embedding", k = 10).select("qid", "cid")
    val approx = Similarity.rpTopK(q, corpus,
        "vec_id", "vec_id", "embedding", k = 10, targetDim = 32,
        seed = 42L, rerank = 150)
      .select("qid", "cid")
    recallVerdict(exact, approx, need = 9)
  }

  /** The recall verdicts' DuckDB twin: every planted center must pass. */
  val simTrainedRecallSql: String =
    """SELECT vec_id AS qid, TRUE AS recall_ok FROM embeddings
      |WHERE vec_id < 20 ORDER BY qid""".stripMargin

  // ---- Text analysis --------------------------------------------------------

  val textStats: Q = (s, dir) =>
    Tables.documents(s, dir).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_m"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"),
        round(TextFns.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextFns.alphaRatio(col("text")), 6).as("alpha_ratio"),
        round(TextFns.stopwordRatio(col("text")), 6).as("stopword_ratio"))
      .orderBy("doc_id")

  val textStatsSql: String = {
    val stop = TextFns.stopwords.map(w => s"'$w'").mkString(", ")
    val toks = """regexp_split_to_array(lower(trim(text)), '\s+')"""
    val rawToks = """regexp_split_to_array(text, '\s+')"""
    s"""SELECT doc_id, length(text) AS n_chars_m,
       |len($rawToks) AS n_tokens,
       |round(CASE WHEN length(text) = 0 THEN 0.0
       |  ELSE CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text)
       |  END, 6) AS punct_ratio,
       |round(CASE WHEN length(text) = 0 THEN 0.0
       |  ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text)
       |  END, 6) AS alpha_ratio,
       |round(CASE WHEN len($toks) = 0 THEN 0.0
       |  ELSE CAST(len(list_filter($toks, x -> x IN ($stop))) AS DOUBLE) / len($toks)
       |  END, 6) AS stopword_ratio
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Dynamic threshold selection: per-source EXACT token-count quantiles
    * (p10/p50/p90) by rank selection, plus how many docs the p10 cutoff
    * would drop — the calibration step quality pipelines run before fixing
    * filter thresholds (per-source, because a cutoff tuned on web text
    * guts a code or reference corpus).
    *
    * Scale design: rank selection, NOT Spark's exact `percentile` aggregate
    * — that buffers every value of a group on one executor (a 100 TB
    * group OOMs it); t-digest `approx_percentile` is the other scale path
    * when 1e-3 error is acceptable, but its sketch isn't engine-portable.
    * Here: the [[graft.operators.KeyedRank]] two-pass range-partitioned
    * rank numbers the rows (a hot source spreads across range partitions —
    * never one task's sort) and carries the per-source count out of its
    * offset table; the three quantiles fall out of one conditional
    * aggregation over the rows that sit exactly at rank ceil(q·n) —
    * integer-exact, so the oracle compares BIGINTs, not interpolated
    * doubles. [SQL] */
  val qualityQuantiles: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(col("source"),
      col("doc_id"), TextFns.tokenCount(col("text")).cast("long").as("n_toks"))
    val withN = graft.operators.KeyedRank.rankCumsum(docs, "source",
      Seq(col("n_toks"), col("doc_id")), rn = Some("rn"),
      keyTotal = Some("n"),
      // materialize: the input embeds the tokenize regex, and the range
      // partitioner's sampling pass would otherwise run it over every doc
      // TWICE — the 32-byte/row frozen frame is ~0.1% of the text bytes it
      // saves re-scanning (BenchOne: 0.96 -> 0.83 s at sf0.1)
      materializeInput = true)
    def atQ(q: Double) = ceil(lit(q) * col("n")).cast("long")
    val cuts = withN
      .filter(col("rn") === atQ(0.1) || col("rn") === atQ(0.5) ||
        col("rn") === atQ(0.9))
      .groupBy("source").agg(
        max(when(col("rn") === atQ(0.1), col("n_toks"))).as("p10_tokens"),
        max(when(col("rn") === atQ(0.5), col("n_toks"))).as("p50_tokens"),
        max(when(col("rn") === atQ(0.9), col("n_toks"))).as("p90_tokens"))
    docs.join(broadcast(cuts), Seq("source"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        first("p10_tokens").as("p10_tokens"),
        first("p50_tokens").as("p50_tokens"),
        first("p90_tokens").as("p90_tokens"),
        sum(when(col("n_toks") < col("p10_tokens"), 1L).otherwise(0L))
          .as("n_below_p10"))
      .orderBy("source")
  }

  /** DuckDB twin of [[qualityQuantiles]] — the same rank-selection formula
    * (row_number over (source, n_toks, doc_id), cutoff at ceil(q·n)), all
    * BIGINT arithmetic. */
  val qualityQuantilesSql: String = {
    val ws = """'\s+'"""
    s"""WITH t AS (SELECT source, doc_id,
       |    CAST(len(regexp_split_to_array(text, $ws)) AS BIGINT) AS n_toks
       |  FROM documents),
       |r AS (SELECT source, doc_id, n_toks,
       |    row_number() OVER (PARTITION BY source ORDER BY n_toks, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM t),
       |cuts AS (SELECT source,
       |    max(CASE WHEN rn = CAST(ceil(0.1 * n) AS BIGINT) THEN n_toks END) AS p10_tokens,
       |    max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN n_toks END) AS p50_tokens,
       |    max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN n_toks END) AS p90_tokens
       |  FROM r WHERE rn = CAST(ceil(0.1 * n) AS BIGINT)
       |     OR rn = CAST(ceil(0.5 * n) AS BIGINT)
       |     OR rn = CAST(ceil(0.9 * n) AS BIGINT)
       |  GROUP BY source)
       |SELECT t.source, count(*) AS n_docs,
       |  any_value(p10_tokens) AS p10_tokens,
       |  any_value(p50_tokens) AS p50_tokens,
       |  any_value(p90_tokens) AS p90_tokens,
       |  CAST(sum(CASE WHEN t.n_toks < p10_tokens THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_below_p10
       |FROM t JOIN cuts USING (source)
       |GROUP BY t.source ORDER BY t.source""".stripMargin
  }

  /** Gopher/C4-style quality filters (repetition + shape): per doc, token
    * count, mean word length, top-unigram mass, duplicate 2-/3-gram
    * fractions, and the composite `quality_ok` verdict a training-data
    * pipeline filters on. One tokenization projection feeds three combinable
    * aggregation branches (unigram counts, 2-gram set size, 3-gram set size)
    * joined back on doc_id — everything shuffles 8-byte keyed partial
    * aggregates, never documents. [SQL] */
  /** Quality gate as a shared artifact, same contract as the pair graph /
    * cluster labels: `text_quality`, `corpus_health`, and `pipeline_prep`
    * all consume the identical per-doc gate, so it computes once per
    * (session, corpus); the checkpointed result is doc-count-sized (one
    * 7-column row per doc). */
  private val qualityMemo = new graft.SessionMemo[DataFrame]

  val textQuality: Q = (s, dir) =>
    qualityMemo.getOrBuild(s, dir)(textQualityBody(s, dir).localCheckpoint())

  private val textQualityBody: Q = (s, dir) =>
    // signal computation + gate predicate live in operators.Quality, shared
    // verbatim with the streaming admission gate (IngestGate) — the stream
    // admits exactly what this batch gate would keep
    graft.operators.Quality.signals(Tables.documents(s, dir), "doc_id", "text")
      .withColumn("quality_ok", graft.operators.Quality.okCol())
      .orderBy("doc_id")

  /** DuckDB twin of [[textQuality]] — same clean/split chain as the dedup
    * oracles, same integer counts, same rounded-double thresholds. */
  val textQualitySql: String =
    s"""WITH $toksCte,
       |toks AS (SELECT doc_id, list_filter(w, x -> length(x) > 0) AS w FROM toksraw),
       |tokf AS (SELECT doc_id, unnest(w) AS tok FROM toks),
       |us AS (SELECT doc_id, max(c) AS topc, sum(c) AS n, sum(c * ln_) AS sumlen FROM
       |  (SELECT doc_id, tok, count(*) AS c, length(tok) AS ln_ FROM tokf
       |   GROUP BY doc_id, tok) u GROUP BY doc_id),
       |g2 AS (SELECT doc_id, count(*) AS tot2, count(DISTINCT g) AS dst2 FROM
       |  (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
       |   FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
       |         FROM toks WHERE len(w) >= 2) q) GROUP BY doc_id),
       |g3 AS (SELECT doc_id, count(*) AS tot3, count(DISTINCT g) AS dst3 FROM
       |  (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
       |   FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
       |         FROM toks WHERE len(w) >= 3) q) GROUP BY doc_id),
       |m AS (SELECT d.doc_id,
       |  coalesce(CAST(us.n AS BIGINT), 0) AS n_tokens,
       |  round(CASE WHEN us.n IS NULL THEN 0.0
       |    ELSE CAST(us.sumlen AS DOUBLE) / us.n END, 6) AS mean_word_len,
       |  round(CASE WHEN us.n IS NULL THEN 0.0
       |    ELSE CAST(us.topc AS DOUBLE) / us.n END, 6) AS top_unigram_ratio,
       |  round(CASE WHEN g2.tot2 IS NULL THEN 0.0
       |    ELSE 1.0 - CAST(g2.dst2 AS DOUBLE) / g2.tot2 END, 6) AS dup_2gram_ratio,
       |  round(CASE WHEN g3.tot3 IS NULL THEN 0.0
       |    ELSE 1.0 - CAST(g3.dst3 AS DOUBLE) / g3.tot3 END, 6) AS dup_3gram_ratio
       |  FROM documents d LEFT JOIN us USING (doc_id)
       |  LEFT JOIN g2 USING (doc_id) LEFT JOIN g3 USING (doc_id))
       |SELECT doc_id, n_tokens, mean_word_len, top_unigram_ratio,
       |  dup_2gram_ratio, dup_3gram_ratio,
       |  (n_tokens >= 20 AND n_tokens <= 100000
       |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |   AND top_unigram_ratio <= 0.15 AND dup_2gram_ratio <= 0.05) AS quality_ok
       |FROM m ORDER BY doc_id""".stripMargin

  /** MODEL-BASED quality filtering — the classifier step real curation
    * pipelines run after rule gates (train a cheap linear model on labeled
    * quality, score every doc, keep the positive side): per-doc signal
    * features (the memoized [[textQuality]] frame — zero extra scans at
    * bench time) feed the corpus-scale [[graft.ml.DistLogReg]] trainer
    * (weights broadcast out, gradients treeAggregate back), and the learned
    * model scores the WHOLE corpus for the keep decision.
    *
    * The synthetic sources are statistically identical, so labels come from
    * a deterministic teacher rule over the signals themselves
    * (mean_word_len > 4.5, the corpus median) with a ±0.1 exclusion margin —
    * the separable-data device MLTrainerSpec uses, promoted to an oracled
    * query: the verdicts are NON-vacuous (a broken trainer sits at ~0.5, the
    * pins demand ≥ 0.95) and every count column replays exactly in SQL
    * (signal arithmetic from [[textQualitySql]], split from the xxhash64
    * bucket replay). [SQL] */
  val qualityClassifier: Q = (s, dir) => {
    val sig = textQuality(s, dir)
    val feat = sig.select(col("doc_id"),
      when(col("mean_word_len") > 4.5, 1).otherwise(0).cast("int").as("label"),
      array(((col("mean_word_len") - 4.5) * 5.0).cast("float"),
        (col("n_tokens").cast("double") / 64.0 - 1.0).cast("float"),
        (col("top_unigram_ratio") * 5.0 - 0.5).cast("float")).as("x"),
      abs(col("mean_word_len") - lit(4.5)).as("gap"))
    val marg = feat.filter(col("gap") > 0.1)
    val (tr, te) = graft.operators.Split.hashSplit(marg, "doc_id", seed = 42L)
    val model = graft.ml.DistLogReg.fit(tr, "label", "x", nClasses = 2,
      iters = 30)
    val m = graft.ml.DistLogReg.holdoutMetrics(model, te, "doc_id", "label",
      "x", 2)
    // the application step: score ALL margin docs (the keep set), agreement
    // with the teacher rule is the filter's fidelity
    val agree = graft.ml.DistLogReg.predict(model, marg, "doc_id", "label", "x")
      .agg((sum(when(col("pred") === col("label"), 1L).otherwise(0L))
        .cast("double") / count(lit(1))).as("agree"))
    tr.agg(count(lit(1)).as("n_train"))
      .crossJoin(te.agg(count(lit(1)).as("n_test")))
      .crossJoin(sig.agg(sum(when(col("mean_word_len") > 4.5, 1L)
        .otherwise(0L)).as("n_teacher_pos")))
      .crossJoin(m).crossJoin(agree)
      .select(col("n_train"), col("n_test"), col("n_teacher_pos"),
        (col("accuracy") >= 0.95).as("acc_ok"),
        (col("agree") >= 0.95).as("keep_agree_ok"))
  }

  /** DuckDB twin of [[qualityClassifier]]: signal arithmetic from
    * [[textQualitySql]], the xxhash64 doc_id bucket replay for the split,
    * the same rounded-double margin/teacher comparisons; verdicts pinned
    * TRUE (learnability is the engine-side claim — a trainer at chance
    * fails the hash compare). */
  val qualityClassifierSql: String = {
    val staged = Duck.stagedSql(
      "SELECT doc_id, CAST(doc_id AS HUGEINT) AS v, CAST(42 AS HUGEINT) AS sd FROM documents",
      Duck.xxhashLongStages("v", "42", "h1", "za") ++
        Duck.xxhashLongStages("sd", "h1", "h2", "zb"))
    s"""WITH sig AS (SELECT doc_id, mean_word_len FROM ($textQualitySql)),
       |hh AS ($staged),
       |bk AS (SELECT doc_id, (((${Duck.toSigned("h2")} % 100) + 100) % 100) AS bkt
       |  FROM hh),
       |marg AS (SELECT s.doc_id, b.bkt FROM sig s JOIN bk b USING (doc_id)
       |  WHERE abs(s.mean_word_len - 4.5) > 0.1),
       |agg AS (SELECT count(*) FILTER (bkt >= 20) AS n_train,
       |  count(*) FILTER (bkt < 20) AS n_test FROM marg),
       |pos AS (SELECT count(*) AS n_teacher_pos FROM sig
       |  WHERE mean_word_len > 4.5)
       |SELECT n_train, n_test, n_teacher_pos, TRUE AS acc_ok,
       |  TRUE AS keep_agree_ok
       |FROM agg CROSS JOIN pos""".stripMargin
  }

  /** Sequence packing: concatenate-and-chunk docs into 512-token training
    * blocks ([[graft.operators.Pack.packByBudget]] — per-partition cumsum
    * composition, never a global window). [SQL — window cumsum twin]. */
  val packSequences: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextFns.tokenCount(col("text")).cast("long").as("n_toks"))
    graft.operators.Pack.packByBudget(docs, "doc_id", "n_toks", budget = 512L)
      .orderBy("doc_id")
  }

  val packSequencesSql: String =
    s"""WITH c AS (SELECT doc_id,
       |    CAST(len(regexp_split_to_array(text, '${"""\s+"""}')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |p AS (SELECT doc_id, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
       |  FROM c)
       |SELECT doc_id, n_tokens, prev // 512 AS bin_id, prev % 512 AS bin_offset
       |FROM p ORDER BY doc_id""".stripMargin

  /** Length-bucketed packing ([[graft.operators.Pack.packByBudgetKeyed]]):
    * docs group into fixed-width token-length buckets
    * (least(n DIV 32, 15) — integer-exact, no float log) and each bucket's
    * stream packs into its own 512-token blocks. Trainers that pad a block
    * to its max sequence waste far less on length-homogeneous blocks — the
    * standard bucketed-batching trick, here as one keyed pass (per-
    * (bucket, partition) prefix composition, never a global window). [SQL —
    * bucket-partitioned window cumsum]. */
  val packLengthBuckets: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        TextFns.tokenCount(col("text")).cast("long").as("n_toks"))
      .select(col("doc_id"), col("n_toks"),
        least(expr("n_toks DIV 32"), lit(15L)).as("bucket"))
    graft.operators.Pack.packByBudgetKeyed(docs, "bucket", "doc_id",
        "n_toks", budget = 512L)
      .orderBy("bucket", "doc_id")
  }

  val packLengthBucketsSql: String =
    s"""WITH c AS (SELECT doc_id,
       |    CAST(len(regexp_split_to_array(text, '${"""\s+"""}')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |b AS (SELECT doc_id, n_tokens,
       |    LEAST(n_tokens // 32, 15) AS bucket FROM c),
       |p AS (SELECT doc_id, n_tokens, bucket,
       |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
       |  FROM b)
       |SELECT bucket, doc_id, n_tokens, prev // 512 AS bin_id,
       |  prev % 512 AS bin_offset
       |FROM p ORDER BY bucket, doc_id""".stripMargin

  /** Context-window chunking: 32-token windows advanced by 24 (8 tokens of
    * overlap) over every document ([[graft.operators.Chunk.chunkWindows]] —
    * one narrow shuffle-free projection). [SQL — range + list_slice twin]. */
  val chunkWindows: Q = (s, dir) =>
    graft.operators.Chunk.chunkWindows(Tables.documents(s, dir),
        "doc_id", "text", win = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")

  /** Shared FROM-body for the chunk oracles: one row per (doc, window) with
    * the same tokenize → range(0, n, stride) → list_slice chain the Spark
    * operator runs ('\s+' split with empties dropped, exactly the engine's
    * tokenization). */
  private def chunksSub(win: Int, stride: Int): String = {
    val ws = """'\s+'"""
    s"""WITH toks AS (SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, $ws), x -> length(x) > 0) AS w
       |  FROM documents),
       |st AS (SELECT doc_id, w, unnest(range(0, len(w), $stride)) AS s
       |  FROM toks WHERE len(w) > 0)
       |SELECT doc_id, CAST(s // $stride AS BIGINT) AS chunk_id,
       |  CAST(s AS BIGINT) AS start_tok,
       |  CAST(least($win, len(w) - s) AS BIGINT) AS n_chunk_tokens,
       |  array_to_string(list_slice(w, s + 1, s + $win), ' ') AS chunk_text
       |FROM st""".stripMargin
  }

  val chunkWindowsSql: String =
    s"""${chunksSub(32, 24)} ORDER BY doc_id, chunk_id""".stripMargin

  /** Duplicated-window report: identical 32-token chunk texts appearing more
    * than once across the corpus ([[graft.operators.Chunk.duplicatedChunks]]
    * — the chunk-granularity exact dedup of a RAG/packed-corpus build). [SQL]. */
  val chunkDedup: Q = (s, dir) =>
    graft.operators.Chunk.duplicatedChunks(
        graft.operators.Chunk.chunkWindows(Tables.documents(s, dir),
          "doc_id", "text", win = 32, stride = 24),
        "doc_id")
      .orderBy("doc_id", "chunk_text")

  val chunkDedupSql: String =
    s"""SELECT min(doc_id) AS doc_id, count(*) AS dups,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, chunk_text
       |FROM (${chunksSub(32, 24)}) c
       |GROUP BY chunk_text HAVING count(*) > 1
       |ORDER BY doc_id, chunk_text""".stripMargin

  /** Stratified rebalancing sample: 5 docs per (lang, source) stratum by the
    * seeded deterministic draw ([[graft.operators.Sample.stratifiedTopN]] —
    * bounded TopK aggregation, not a corpus-wide window). [SQL]. */
  val sampleStratified: Q = (s, dir) =>
    graft.operators.Sample.stratifiedTopN(Tables.documents(s, dir),
        Seq("lang", "source"), "doc_id", n = 5, seed = 7L)
      .orderBy("lang", "source", "smp_rank")

  /** DuckDB twin of [[graft.operators.Sample.drawCol]] as a staged subquery
    * over `table`: emits `cols` plus `draw` ∈ [0, 2^52). Mirrors Spark's
    * xxhash64 argument chaining — hashLong(id, 42) seeds hashLong(seed, ·) —
    * via [[Duck.xxhashLongStages]]; `>>> 12` on the unsigned hash is
    * `// 4096`. Requires non-negative ids (true of all engine tables). */
  private def drawSelect(table: String, idCol: String, cols: Seq[String],
                         seed: Long): String = {
    val sdU = BigInt(seed) & BigInt("FFFFFFFFFFFFFFFF", 16) // two's-complement view
    val keep = (cols :+ idCol).distinct.mkString(", ")
    val inner = s"SELECT $keep, CAST($idCol AS HUGEINT) AS v, " +
      s"CAST('$sdU' AS HUGEINT) AS sd FROM $table"
    val staged = Duck.stagedSql(inner,
      Duck.xxhashLongStages("v", "42", "h1", "da") ++
        Duck.xxhashLongStages("sd", "h1", "h2", "db"))
    s"SELECT $keep, h2 // 4096 AS draw FROM ($staged)"
  }

  /** Deterministic training-order shuffle ([[graft.operators.Pack.shuffleOrder]]):
    * seeded (shard, shard_pos) for every document — 8 shards, epoch seed 17.
    * One hash-keyed shuffle, shard-partitioned rank window, no global sort,
    * no rand(). [SQL — the staged-xxhash64 draw replayed, row_number within
    * shard]. */
  val exportShuffle: Q = (s, dir) =>
    graft.operators.Pack.shuffleOrder(
        Tables.documents(s, dir).select("doc_id"), "doc_id",
        nShards = 8, seed = 17L)
      .orderBy("doc_id")

  val exportShuffleSql: String = {
    val drawn = drawSelect("documents", "doc_id", Seq.empty, 17L)
    s"""WITH d AS ($drawn),
       |sh AS (SELECT doc_id, draw, draw % 8 AS shard FROM d)
       |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY shard
       |    ORDER BY draw DESC, doc_id) AS BIGINT) AS shard_pos
       |FROM sh ORDER BY doc_id""".stripMargin
  }

  val sampleStratifiedSql: String = {
    val drawn = drawSelect("documents", "doc_id", Seq("lang", "source"), 7L)
    s"""WITH d AS ($drawn),
       |r AS (SELECT lang, source, doc_id,
       |    row_number() OVER (PARTITION BY lang, source
       |      ORDER BY draw DESC, doc_id) AS smp_rank
       |  FROM d)
       |SELECT lang, source, doc_id, CAST(smp_rank AS BIGINT) AS smp_rank
       |FROM r WHERE smp_rank <= 5 ORDER BY lang, source, smp_rank""".stripMargin
  }

  /** Size-weighted corpus sample: 20 docs per source by sequential Poisson
    * sampling ([[graft.operators.Sample.weightedOrderSample]]) with w =
    * n_chars — big documents proportionally favored, as a token-budgeted
    * sample wants. Same bounded-TopK combine as [[sampleStratified]]; the
    * ranking key is one exact division of the seeded draw by the weight, so
    * the πps-style sample replays bit-identically in SQL. [SQL]. */
  val sampleWeighted: Q = (s, dir) =>
    graft.operators.Sample.weightedOrderSample(Tables.documents(s, dir),
        Seq("source"), "doc_id", greatest(col("n_chars"), lit(1L)), n = 20,
        seed = 11L)
      .orderBy("source", "smp_rank")

  val sampleWeightedSql: String = {
    val drawn = drawSelect("documents", "doc_id", Seq("source", "n_chars"), 11L)
    s"""WITH d AS ($drawn),
       |k AS (SELECT source, doc_id,
       |    -(CAST(draw + 1 AS DOUBLE) /
       |      CAST(greatest(n_chars, 1) AS DOUBLE)) AS wkey
       |  FROM d),
       |r AS (SELECT source, doc_id,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY wkey DESC, doc_id) AS smp_rank
       |  FROM k)
       |SELECT source, doc_id, CAST(smp_rank AS BIGINT) AS smp_rank
       |FROM r WHERE smp_rank <= 20 ORDER BY source, smp_rank""".stripMargin
  }

  /** Corpus diversity report: per-source type-token ratios at the unigram and
    * bigram level — the repetitiveness screen a corpus card reports (a
    * template-heavy or boilerplate-dominated source shows a collapsed TTR
    * long before eyeballing finds it). One tokenize pass is localCheckpointed
    * and feeds the totals plus both distinct counts.
    *
    * Scale: totals are map-side-combinable; the distinct counts shuffle
    * (source, token) pairs AFTER per-partition dedup inside the hash
    * aggregate. At 100 TB swap `countDistinct` for `approx_count_distinct`
    * (HLL, one pass, no exact shuffle) — kept exact here for the oracle;
    * the sketch path is already proven by `sketch_distinct`. [SQL]. */
  val corpusDiversity: Q = (s, dir) => {
    val base = Tables.documents(s, dir).select(col("source"),
      TextFns.words(TextFns.cleanText(col("text"), removePunctuation = true))
        .as("toks"))
    val withBi = base.select(col("source"), col("toks"),
      TextFns.shingleZip(col("toks"), 2).as("biz")).localCheckpoint()
    val totals = withBi.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("toks"))).cast("long").as("tot_toks"),
      sum(size(col("biz"))).cast("long").as("tot_bigrams"))
    val uToks = withBi.select(col("source"), explode(col("toks")).as("tok"))
      .groupBy("source").agg(countDistinct("tok").as("uniq_toks"))
    val uBis = withBi.select(col("source"), explode(col("biz")).as("s"))
      .select(col("source"), TextFns.shingleString(col("s"), 2).as("bi"))
      .groupBy("source").agg(countDistinct("bi").as("uniq_bigrams"))
    totals.join(uToks, Seq("source"), "left").join(uBis, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        col("tot_toks"), coalesce(col("uniq_toks"), lit(0L)).as("uniq_toks"),
        round(coalesce(col("uniq_toks"), lit(0L)).cast("double") /
          col("tot_toks").cast("double"), 6).as("ttr"),
        col("tot_bigrams"),
        coalesce(col("uniq_bigrams"), lit(0L)).as("uniq_bigrams"),
        when(col("tot_bigrams") === 0, lit(null).cast("double"))
          .otherwise(round(coalesce(col("uniq_bigrams"), lit(0L)).cast("double") /
            col("tot_bigrams").cast("double"), 6)).as("bigram_ttr"))
      .orderBy("source")
  }

  val corpusDiversitySql: String = {
    val toks = "string_split(" + Duck.clean("text", punct = true) + ", ' ')"
    s"""WITH base AS (SELECT source, $toks AS toks FROM documents),
       |wb AS (SELECT source, toks,
       |    [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))] AS bis
       |  FROM base),
       |tot AS (SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(toks)) AS BIGINT) AS tot_toks,
       |    CAST(sum(len(bis)) AS BIGINT) AS tot_bigrams
       |  FROM wb GROUP BY source),
       |ut AS (SELECT source, count(DISTINCT tok) AS uniq_toks
       |  FROM (SELECT source, unnest(toks) AS tok FROM wb) GROUP BY source),
       |ub AS (SELECT source, count(DISTINCT bi) AS uniq_bigrams
       |  FROM (SELECT source, unnest(bis) AS bi FROM wb) GROUP BY source)
       |SELECT tot.source, n_docs, tot_toks,
       |  CAST(coalesce(uniq_toks, 0) AS BIGINT) AS uniq_toks,
       |  round(CAST(coalesce(uniq_toks, 0) AS DOUBLE) /
       |    CAST(tot_toks AS DOUBLE), 6) AS ttr,
       |  tot_bigrams, CAST(coalesce(uniq_bigrams, 0) AS BIGINT) AS uniq_bigrams,
       |  CASE WHEN tot_bigrams = 0 THEN NULL
       |    ELSE round(CAST(coalesce(uniq_bigrams, 0) AS DOUBLE) /
       |      CAST(tot_bigrams AS DOUBLE), 6) END AS bigram_ttr
       |FROM tot LEFT JOIN ut USING (source) LEFT JOIN ub USING (source)
       |ORDER BY source""".stripMargin
  }

  /** [[corpusDiversity]]'s 100-TB path DECLARED (r13 verdict #5): the TTR
    * distincts through the [[sketchDistinct]] HLL machinery
    * (`hll_sketch_agg`, lgK=12) instead of exact `countDistinct` — sketch
    * partials merge map-side and only sketch bytes cross the wire, where
    * the exact path shuffles every distinct (source, token) pair. Oracle =
    * the q15/sketch_distinct verdict pattern: the exact distincts (and the
    * exact TTR) replay in SQL, and the HLL estimates ride as ±5 % boolean
    * claims (|est − exact|·20 ≤ exact) the DuckDB twin pins TRUE. [SQL] */
  val corpusDiversityHll: Q = (s, dir) => {
    val base = Tables.documents(s, dir).select(col("source"),
      TextFns.words(TextFns.cleanText(col("text"), removePunctuation = true))
        .as("toks"))
    val withBi = base.select(col("source"), col("toks"),
      TextFns.shingleZip(col("toks"), 2).as("biz")).localCheckpoint()
    val totals = withBi.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("toks"))).cast("long").as("tot_toks"))
    val uToks = withBi.select(col("source"), explode(col("toks")).as("tok"))
      .groupBy("source").agg(
        countDistinct("tok").as("uniq_toks"),
        hll_sketch_estimate(hll_sketch_agg(col("tok"), 12)).as("est_toks"))
    val uBis = withBi.select(col("source"), explode(col("biz")).as("s"))
      .select(col("source"), TextFns.shingleString(col("s"), 2).as("bi"))
      .groupBy("source").agg(
        countDistinct("bi").as("uniq_bigrams"),
        hll_sketch_estimate(hll_sketch_agg(col("bi"), 12)).as("est_bigrams"))
    totals.join(uToks, Seq("source"), "left").join(uBis, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("tot_toks"),
        coalesce(col("uniq_toks"), lit(0L)).as("uniq_toks"),
        round(coalesce(col("uniq_toks"), lit(0L)).cast("double") /
          col("tot_toks").cast("double"), 6).as("ttr"),
        (abs(coalesce(col("est_toks"), lit(0L)) -
          coalesce(col("uniq_toks"), lit(0L))) * lit(20L) <=
          coalesce(col("uniq_toks"), lit(0L))).as("tok_est_ok"),
        (abs(coalesce(col("est_bigrams"), lit(0L)) -
          coalesce(col("uniq_bigrams"), lit(0L))) * lit(20L) <=
          coalesce(col("uniq_bigrams"), lit(0L))).as("bigram_est_ok"))
      .orderBy("source")
  }

  val corpusDiversityHllSql: String = {
    val toks = "string_split(" + Duck.clean("text", punct = true) + ", ' ')"
    s"""WITH base AS (SELECT source, $toks AS toks FROM documents),
       |tot AS (SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(toks)) AS BIGINT) AS tot_toks
       |  FROM base GROUP BY source),
       |ut AS (SELECT source, count(DISTINCT tok) AS uniq_toks
       |  FROM (SELECT source, unnest(toks) AS tok FROM base) GROUP BY source)
       |SELECT tot.source, n_docs, tot_toks,
       |  CAST(coalesce(uniq_toks, 0) AS BIGINT) AS uniq_toks,
       |  round(CAST(coalesce(uniq_toks, 0) AS DOUBLE) /
       |    CAST(tot_toks AS DOUBLE), 6) AS ttr,
       |  TRUE AS tok_est_ok, TRUE AS bigram_est_ok
       |FROM tot LEFT JOIN ut USING (source)
       |ORDER BY source""".stripMargin
  }

  /** Temperature-weighted mixture SAMPLING — [[mixWeights]] decides the
    * target shares, this draws the actual mix: per-source token shares are
    * flattened with α = 0.7 (the mT5/XLM-R temperature convention — tail
    * sources upsampled relative to their share, head sources capped), a
    * half-corpus token budget turns shares into per-source keep-rates, and
    * each doc keeps iff its seeded 52-bit hash draw ([[graft.operators.Sample.drawCol]])
    * falls under rate·2^52 — deterministic, cluster-size-independent, and
    * resample-stable, unlike `rand()`-based sampling.
    *
    * Float discipline: the keep-rate is round(·, 6) in BOTH engines before
    * the integer threshold compare (rate6·2^52 is exact in a double), so
    * pow/Σ-order ulp drift cannot flip a keep decision. Output is
    * per-source integer counts plus the rounded rate.
    *
    * Scale design: rates come from a sources-sized dim (one bounded
    * collect + [[graft.operators.Mix]] driver math — bit-parity pinned);
    * the corpus-side work is one projection + one map-side-combinable
    * aggregation — no shuffle of documents, no rand(), no window.
    * [SQL — staged xxhash64 replay]. */
  val mixSample: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(col("source"), col("doc_id"),
      TextFns.tokenCount(col("text")).cast("long").as("n_toks"))
    // per-source totals are |sources| rows (model-sized): one bounded
    // collect + the Mix driver math replaces the r17 per→tot→w→sw broadcast
    // chain (2-3 scheduler round-trips for a handful of rows — guide §5);
    // float parity is term-exact, see [[graft.operators.Mix]]
    val per = docs.groupBy("source").agg(sum("n_toks").as("src_toks"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    import s.implicits._
    val rates = graft.operators.Mix.flattenedRates(per).toDF("source", "rate")
    val thresh = (col("rate") * lit(4503599627370496.0)).cast("long")
    docs.join(broadcast(rates), Seq("source"))
      .withColumn("keep",
        graft.operators.Sample.drawCol(col("doc_id"), 11L) < thresh)
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        first("rate").as("rate"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_docs_kept"),
        sum(when(col("keep"), col("n_toks")).otherwise(0L)).as("n_tokens_kept"))
      .orderBy("source")
  }

  /** DuckDB twin of [[mixSample]]: same α = 0.7 flattening, same rounded
    * rate, same staged-xxhash64 draw and integer threshold. */
  val mixSampleSql: String = {
    val ws = """'\s+'"""
    val drawn = drawSelect("documents", "doc_id", Seq("source", "text"), 11L)
    s"""WITH d AS ($drawn),
       |t AS (SELECT source, doc_id, draw,
       |    CAST(len(regexp_split_to_array(text, $ws)) AS BIGINT) AS n_toks
       |  FROM d),
       |per AS (SELECT source, sum(n_toks) AS src_toks FROM t GROUP BY source),
       |tot AS (SELECT sum(src_toks) AS tot_toks FROM per),
       |w AS (SELECT source, src_toks, tot_toks,
       |    pow(CAST(src_toks AS DOUBLE) / CAST(tot_toks AS DOUBLE), 0.7) AS w
       |  FROM per CROSS JOIN tot),
       |sw AS (SELECT sum(w) AS sum_w FROM w),
       |rates AS (SELECT source,
       |    round(least(1.0, 0.5 * CAST(tot_toks AS DOUBLE) * w /
       |      (sum_w * CAST(src_toks AS DOUBLE))), 6) AS rate
       |  FROM w CROSS JOIN sw)
       |SELECT t.source, count(*) AS n_docs, any_value(rate) AS rate,
       |  CAST(sum(CASE WHEN draw < CAST(rate * 4503599627370496.0 AS BIGINT)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       |  CAST(sum(CASE WHEN draw < CAST(rate * 4503599627370496.0 AS BIGINT)
       |    THEN n_toks ELSE 0 END) AS BIGINT) AS n_tokens_kept
       |FROM t JOIN rates ON t.source = rates.source
       |GROUP BY t.source ORDER BY t.source""".stripMargin
  }

  /** Exact token-budget mixture fill — the deterministic-budget complement
    * to [[mixSample]]: the same α = 0.7 temperature shares set a PER-SOURCE
    * TOKEN BUDGET (half the corpus's tokens, split by flattened share), and
    * each source keeps docs greedily in seeded-hash order until the budget
    * is crossed (the boundary-crossing doc is kept — its first token still
    * fits). Rate sampling hits a budget only in expectation; training-data
    * mixes that must land an exact token count per source (a fixed compute
    * budget split across domains) run this fill instead.
    *
    * Float discipline: budgets are round(·, 6)-then-floor longs in BOTH
    * engines, and the keep decision compares integer cumulative sums against
    * that integer budget — pow/Σ-order ulp drift cannot flip a keep.
    *
    * Scale design: budgets come from the same sources-sized dim as
    * [[mixSample]] (one bounded collect + [[graft.operators.Mix]] driver
    * math, bit-parity pinned); the fill itself is the
    * [[graft.operators.KeyedRank]] two-pass range-partitioned cumsum over
    * (source, draw desc, id) — a hot source's sort spreads across ALL range
    * partitions instead of hashing into one task (the r13 skew lesson), and
    * the frame is narrow (32-byte rows, never text). The order within a
    * source still decides the boundary doc — the unavoidable cost of an
    * EXACT greedy fill; when even that is too much, the rate-based
    * [[mixSample]] is the approximate twin. [SQL — staged xxhash64 replay +
    * the plain per-source window, which the composition equals exactly]. */
  val mixTokenFill: Q = (s, dir) => {
    // ONE tokenize pass: the narrow (source, id, n_toks, draw) frame is
    // checkpointed up front and feeds BOTH the budget dim and the fill
    // (r17 shape tokenized twice — once under the budget subtree, once for
    // KeyedRank's materialization — and chained the budgets through three
    // broadcast exchanges; guide §5/§2.4)
    val docs = Tables.documents(s, dir).select(col("source"), col("doc_id"),
        TextFns.tokenCount(col("text")).cast("long").as("n_toks"))
      .withColumn("draw", graft.operators.Sample.drawCol(col("doc_id"), 13L))
      .localCheckpoint()
    val per = docs.groupBy("source").agg(sum("n_toks").as("src_toks"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    import s.implicits._
    val budgets = graft.operators.Mix.flattenedBudgets(per)
      .toDF("source", "budget_toks")
    val cum = graft.operators.KeyedRank.rankCumsum(
      docs, "source", Seq(col("draw").desc, col("doc_id")),
      cum = Some(("n_toks", "cum_toks")),
      materializeInput = false) // docs is the checkpoint above
    val kept = col("cum_toks") - col("n_toks") < col("budget_toks")
    cum.join(broadcast(budgets), Seq("source"))
      .groupBy("source").agg(
        first("budget_toks").as("budget_toks"),
        sum(when(kept, 1L).otherwise(0L)).as("n_docs_kept"),
        sum(when(kept, col("n_toks")).otherwise(0L)).as("n_tokens_kept"))
      .orderBy("source")
  }

  /** DuckDB twin of [[mixTokenFill]]: same flattened budget (round-6 then
    * floor), same staged-xxhash64 draw, same per-source cumsum window. */
  val mixTokenFillSql: String = {
    val ws = """'\s+'"""
    val drawn = drawSelect("documents", "doc_id", Seq("source", "text"), 13L)
    s"""WITH d AS ($drawn),
       |t AS (SELECT source, doc_id, draw,
       |    CAST(len(regexp_split_to_array(text, $ws)) AS BIGINT) AS n_toks
       |  FROM d),
       |per AS (SELECT source, sum(n_toks) AS src_toks FROM t GROUP BY source),
       |tot AS (SELECT sum(src_toks) AS tot_toks FROM per),
       |w AS (SELECT source, src_toks, tot_toks,
       |    pow(CAST(src_toks AS DOUBLE) / CAST(tot_toks AS DOUBLE), 0.7) AS w
       |  FROM per CROSS JOIN tot),
       |sw AS (SELECT sum(w) AS sum_w FROM w),
       |budgets AS (SELECT source,
       |    CAST(floor(round(0.5 * CAST(tot_toks AS DOUBLE) * w / sum_w, 6))
       |      AS BIGINT) AS budget_toks
       |  FROM w CROSS JOIN sw),
       |c AS (SELECT source, doc_id, n_toks,
       |    sum(n_toks) OVER (PARTITION BY source
       |      ORDER BY draw DESC, doc_id) AS cum_toks
       |  FROM t)
       |SELECT c.source, any_value(budget_toks) AS budget_toks,
       |  CAST(sum(CASE WHEN cum_toks - n_toks < budget_toks
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       |  CAST(sum(CASE WHEN cum_toks - n_toks < budget_toks
       |    THEN n_toks ELSE 0 END) AS BIGINT) AS n_tokens_kept
       |FROM c JOIN budgets ON c.source = budgets.source
       |GROUP BY c.source ORDER BY c.source""".stripMargin
  }

  /** Language-ID heuristic: argmax marker-word score, 'und' when all zero. [SQL] */
  val textLangId: Q = (s, dir) => {
    val langs = TextFns.langMarkers.keys.toSeq.sorted
    val scoresDf = langs.foldLeft(Tables.documents(s, dir)) { (df, l) =>
      df.withColumn(s"score_$l", TextFns.langScore(col("text"), l))
    }
    val best = langs.map(l => struct(col(s"score_$l").as("sc"), lit(l).as("lg")))
      .reduce((a, b) => when(b.getField("sc") > a.getField("sc"), b).otherwise(a))
    scoresDf.select(col("doc_id"), col("lang").as("lang_true"),
        when(best.getField("sc") > 0, best.getField("lg")).otherwise("und")
          .as("lang_pred"))
      .orderBy("doc_id")
  }

  val textLangIdSql: String = {
    val langs = TextFns.langMarkers.keys.toSeq.sorted
    def score(l: String): String = {
      val markers = TextFns.langMarkers(l).map(w => s"'$w'").mkString(", ")
      s"""len(list_filter(regexp_split_to_array(lower(trim(text)), '${"""\s+"""}'), x -> x IN ($markers)))"""
    }
    // Mirror of the Spark fold (earliest language wins ties, replace only on
    // strictly-greater): pred = first lang in sort order whose score = max.
    val scoreCols = langs.map(l => s"${score(l)} AS s_$l").mkString(", ")
    val mx = "greatest(" + langs.map(l => s"s_$l").mkString(", ") + ")"
    val argmax = langs.map(l => s"WHEN s_$l = $mx THEN '$l'").mkString(" ")
    s"""SELECT doc_id, lang AS lang_true,
       |  CASE WHEN $mx = 0 THEN 'und' $argmax END AS lang_pred
       |FROM (SELECT doc_id, lang, $scoreCols FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  // ---- Faithful DDM (sequential, with reset) --------------------------------

  /** The exact reference detector semantics over the a4 feed [SQL: recursive
    * reset-DDM replay; the no-reset prefix-scan twin st1_ddm_scan is also
    * asserted equal up to the first drift in ScalaTest]. */
  val driftDdm: Q = (s, dir) => {
    val feed = Corpus.batchAccuracyDf(s, dir)
      .withColumn("err", lit(1.0) - col("accuracy"))
      .withColumn("det", lit("ddm0"))
    Drift.ddmSequential(feed, "det", "batch_id", "err")
      .select(col("batch_id"), col("error"), col("p"), col("s"), col("signal"))
      .orderBy("batch_id")
  }

  // ---- Decontamination / PII / TF-IDF / mixture (pipeline extensions) -------

  /** Benchmark decontamination: training docs (doc_id ≥ 10) sharing word
    * 4-grams with the "benchmark" set (doc_id < 10) — the eval-leak scrub
    * run before training ([[graft.operators.Decontam]]). [SQL] */
  val decontamOverlap: Q = (s, dir) =>
    contamMemo.getOrBuild(s, dir) {
      val docs = Tables.documents(s, dir)
      graft.operators.Decontam.overlap(
          docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
          "doc_id", "text", n = 4)
        .orderBy("doc_id").localCheckpoint()
    }

  /** Decontamination scrub as a shared artifact ([[qualityMemo]] contract):
    * `decontam_overlap` and `pipeline_prep` consume the identical result;
    * output is contaminated-doc-sized. */
  private val contamMemo = new graft.SessionMemo[DataFrame]

  /** [[decontamOverlap]] twin: 4-gram join on shingle STRINGS — the hash
    * join's collision-free replay, same precedent as dedup_ngram_jaccard. */
  val decontamOverlapSql: String =
    s"""WITH $toksCte,
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS sh
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 2)) AS i
       |        FROM toksraw WHERE len(w) >= 4) q),
       |ev AS (SELECT doc_id AS eval_id, sh FROM sh WHERE doc_id < 10),
       |tr AS (SELECT doc_id, sh FROM sh WHERE doc_id >= 10)
       |SELECT t.doc_id, count(DISTINCT t.sh) AS hits,
       |  count(DISTINCT e.eval_id) AS eval_docs
       |FROM tr t JOIN ev e ON e.sh = t.sh
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  /** FUZZY decontamination ([[graft.operators.Decontam.fuzzy]]): the planted
    * eval set is every 97th long-enough doc with a pasted " answer key alpha"
    * suffix (ids offset by 10^7) — the realistic leak shape: the suffixed
    * copy's full-text fingerprint differs from its training source, but its
    * shingle set barely moves, so the MinHash screen flags the source at
    * est ≈ 1 where an exact-hash scrub would pass it. Both eval probe
    * structures (band index + signature table) ride as broadcasts; the
    * corpus is hashed once. [SQL] */
  val decontamFuzzy: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val evalSet = docs
      .filter(pmod(col("doc_id"), lit(97L)) === 5L && length(col("text")) > 200)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" answer key alpha")).as("text"))
    graft.operators.Decontam.fuzzy(docs, evalSet, "doc_id", "text",
        numHashes = 32, bands = 8, shingleSize = 3, threshold = 0.5)
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[decontamFuzzy]]: the [[dedupDeltaMinhashSql]] signature
    * machinery over the train ∪ planted-eval corpus; candidates are
    * train-side × eval-side band-VALUE matches (band-hash collisions are the
    * only divergence from Spark's xxhash64 bucket key, astronomically
    * unlikely), verified by per-k signature agreement / 32. */
  val decontamFuzzySql: String = {
    val kseeds = Duck.stagedSql(
      "SELECT CAST(unnest(range(0, 32)) AS HUGEINT) AS k",
      Duck.xxhashIntStages("k", "42", "seedk", "i"))
    val khash = Duck.stagedSql(
      "SELECT s.doc_id, s.h0, ks.k, ks.seedk FROM sh0 s CROSS JOIN kseeds ks",
      Duck.xxhashLongStages("h0", "seedk", "hk", "k"))
    s"""WITH RECURSIVE
       |corpus AS (
       |  SELECT doc_id, text, 'tr' AS side FROM documents
       |  UNION ALL
       |  SELECT doc_id + 10000000 AS doc_id, text || ' answer key alpha' AS text,
       |    'ev' AS side
       |  FROM documents WHERE doc_id % 97 = 5 AND length(text) > 200),
       |${toksCteFrom("corpus")},
       |shing AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
       |        FROM toksraw WHERE len(w) >= 3) q),
       |strs AS (SELECT sh AS sid, sh AS s, CAST(42 AS HUGEINT) AS seed
       |  FROM (SELECT DISTINCT sh FROM shing)),
       |${Duck.xxh64StrCtes("strs")},
       |sh0 AS (SELECT g.doc_id, x.h AS h0 FROM shing g JOIN xstr x ON x.sid = g.sh),
       |kseeds AS ($kseeds),
       |khash AS (SELECT doc_id, k, hk FROM ($khash)),
       |sig AS (SELECT doc_id, k, min(${Duck.toSigned("hk")}) AS mh
       |  FROM khash GROUP BY doc_id, k),
       |bands AS (SELECT doc_id, k // 4 AS band_id, list(mh ORDER BY k) AS band
       |  FROM sig GROUP BY doc_id, k // 4),
       |cand AS (SELECT DISTINCT a.doc_id AS id_tr, b.doc_id AS id_ev
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band = b.band
       |  JOIN corpus ca ON ca.doc_id = a.doc_id AND ca.side = 'tr'
       |  JOIN corpus cb ON cb.doc_id = b.doc_id AND cb.side = 'ev'),
       |est AS (SELECT c.id_tr, c.id_ev,
       |    CAST(count(*) FILTER (sa.mh = sb.mh) AS DOUBLE) / 32 AS est_jaccard
       |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_tr
       |  JOIN sig sb ON sb.doc_id = c.id_ev AND sb.k = sa.k
       |  GROUP BY c.id_tr, c.id_ev)
       |SELECT id_tr AS doc_id, count(*) AS n_eval_hits,
       |  round(max(est_jaccard), 6) AS max_est
       |FROM est WHERE est_jaccard >= 0.5
       |GROUP BY id_tr ORDER BY doc_id""".stripMargin
  }

  /** PII scrub over deterministically planted contacts: the synthetic corpus
    * carries no natural PII, so the query plants one email/IPv4/phone per doc
    * from its id (the plantedClusters device) and then runs the real
    * match-count + placeholder-redaction chain
    * ([[graft.functions.TextFns.redactPii]] — codegen'd regexp, no UDF). [SQL] */
  val textPii: Q = (s, dir) =>
    Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com from 10."), pmod(col("doc_id"), lit(256L)),
          lit(".0.1 call +1 555 "),
          (lit(1000L) + pmod(col("doc_id"), lit(9000L)))).as("txt"))
      .select(col("doc_id"),
        TextFns.countPattern(col("txt"), TextFns.EmailRe).as("n_email"),
        TextFns.countPattern(col("txt"), TextFns.Ipv4Re).as("n_ip"),
        TextFns.countPattern(col("txt"), TextFns.PhoneRe).as("n_phone"),
        length(col("txt")).cast("long").as("raw_len"),
        length(TextFns.redactPii(col("txt"))).cast("long").as("redacted_len"))
      .orderBy("doc_id")

  /** [[textPii]] twin: the same RE2-safe regexes verbatim (that's the point
    * of keeping them lookaround-free), counts via regexp_extract_all, the
    * same replace order with the 'g' flag. */
  val textPiiSql: String = {
    def cnt(re: String) =
      s"CAST(len(regexp_extract_all(txt, '$re')) AS BIGINT)"
    s"""WITH p AS (SELECT doc_id, text || ' contact user' ||
       |    CAST(doc_id AS VARCHAR) || '@example.com from 10.' ||
       |    CAST(doc_id % 256 AS VARCHAR) || '.0.1 call +1 555 ' ||
       |    CAST(1000 + doc_id % 9000 AS VARCHAR) AS txt
       |  FROM documents)
       |SELECT doc_id,
       |  ${cnt(TextFns.EmailRe)} AS n_email,
       |  ${cnt(TextFns.Ipv4Re)} AS n_ip,
       |  ${cnt(TextFns.PhoneRe)} AS n_phone,
       |  CAST(length(txt) AS BIGINT) AS raw_len,
       |  CAST(length(regexp_replace(regexp_replace(regexp_replace(txt,
       |    '${TextFns.EmailRe}', '<EMAIL>', 'g'),
       |    '${TextFns.PhoneRe}', '<PHONE>', 'g'),
       |    '${TextFns.Ipv4Re}', '<IP>', 'g')) AS BIGINT) AS redacted_len
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** Per-doc top-5 terms by tf-idf. The idf is the rational surrogate
    * (N+1)/(df+1) — one exact integer product and one IEEE division, so both
    * engines compute bit-identical scores (ln() is libm-dependent, NOT
    * guaranteed correctly rounded, and would poison the hash compare at
    * rounding boundaries; the surrogate is order-isomorphic to +idf for
    * ranking). The per-doc rank is [[graft.operators.TopK.topKPerKeyStr]] —
    * a bounded (≤ 5 terms) aggregator with map-side partial combine, so the
    * rank stage ships at most 5 terms per doc per map partition instead of
    * shuffling every doc's whole scored vocabulary into a sort-based window
    * (row-identical ordering contract: score desc, word asc). [SQL] */
  val textTfidf: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val words = docs.select(col("doc_id"),
        explode(TextFns.words(TextFns.cleanText(col("text"),
          removePunctuation = true))).as("word"))
      .filter(length(col("word")) > 0)
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("word")).crossJoin(broadcast(total))
      .select(col("doc_id").as("key"), col("word").as("item"),
        (col("tf").cast("double") * (col("n_docs").cast("double") + 1.0) /
          (col("df").cast("double") + 1.0)).as("score"))
    graft.operators.TopK.topKPerKeyStr(scored, 5)
      .select(col("key").as("doc_id"), col("rk").cast("long").as("rk"),
        col("item").as("word"), round(col("score"), 6).as("tfidf"))
      .orderBy("doc_id", "rk")
  }

  val textTfidfSql: String = {
    val clean = Duck.clean("text", punct = true)
    s"""WITH w AS (SELECT doc_id, unnest(string_split($clean, ' ')) AS word
       |  FROM documents),
       |w2 AS (SELECT doc_id, word FROM w WHERE length(word) > 0),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM w2 GROUP BY 1, 2),
       |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (SELECT t.doc_id, t.word,
       |    CAST(t.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) + 1.0)
       |      / (CAST(d.df AS DOUBLE) + 1.0) AS score
       |  FROM tf t JOIN dfreq d USING (word) CROSS JOIN n),
       |r AS (SELECT doc_id, word, score, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, word) AS rk FROM scored)
       |SELECT doc_id, CAST(rk AS BIGINT) AS rk, word, round(score, 6) AS tfidf
       |FROM r WHERE rk <= 5 ORDER BY doc_id, rk""".stripMargin
  }

  // ---- BM25 retrieval -------------------------------------------------------

  /** The planted probe-query set for [[bm25TopK]] — engine-neutral literals
    * over the synthetic corpus vocabulary; the SQL twin replays the same
    * VALUES verbatim. */
  private val Bm25Queries: Seq[(Long, String)] = Seq(
    1L -> "spark join window", 2L -> "customer order data",
    3L -> "hash table scan", 4L -> "batch merge filter")

  /** BM25 top-5 retrieval over the corpus for four planted probe queries
    * ([[graft.operators.Bm25]] — the decontamination-triage / corpus-probe
    * operator): broadcast inverted-index probe, rational-surrogate idf,
    * order-pinned score fold, bounded per-query TopK aggregate. Arithmetic
    * and divergences documented on the operator. [SQL] */
  val bm25TopK: Q = (s, dir) =>
    graft.operators.Bm25.topK(Tables.documents(s, dir), "doc_id", "text",
        Bm25Queries, k = 5)
      .orderBy("qid", "rk")

  /** DuckDB twin of [[bm25TopK]] — the identical tf/df/length/scalar chain,
    * the same idf and norm expression trees, `list_reduce` over
    * `list(contrib ORDER BY word)` for the order-pinned fold, and ranking on
    * the rounded score with doc-id tie-break. */
  val bm25TopKSql: String = {
    val clean = Duck.clean("text", punct = true)
    val qvals = Bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH q(qid, qtext) AS (VALUES $qvals),
       |qt AS (SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS word FROM q),
       |w AS (SELECT doc_id, unnest(string_split($clean, ' ')) AS word
       |  FROM documents),
       |w2 AS (SELECT doc_id, word FROM w WHERE length(word) > 0),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM w2 GROUP BY 1, 2),
       |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |dl AS (SELECT doc_id, count(*) AS dlen FROM w2 GROUP BY 1),
       |nd AS (SELECT count(*) AS n_docs FROM documents),
       |nt AS (SELECT count(*) AS n_tok FROM w2),
       |c0 AS (SELECT qid, t.doc_id, t.word,
       |    (CAST(n_docs - df AS DOUBLE) * 2.0 + 1.0)
       |      / (CAST(df AS DOUBLE) * 2.0 + 1.0) AS idf,
       |    1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dlen AS DOUBLE)
       |      / (CAST(n_tok AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS nrm,
       |    CAST(t.tf AS DOUBLE) AS tfd
       |  FROM tf t JOIN qt USING (word) JOIN dfreq USING (word)
       |    JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN nd CROSS JOIN nt),
       |c1 AS (SELECT qid, doc_id, word,
       |    idf * (tfd * (1.2 + 1.0)) / (tfd + nrm) AS contrib FROM c0),
       |pq AS (SELECT qid, doc_id,
       |    round(list_reduce(list(contrib ORDER BY word), (a, x) -> a + x), 6)
       |      AS bm25
       |  FROM c1 GROUP BY 1, 2),
       |r AS (SELECT qid, doc_id, bm25, row_number() OVER (
       |    PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS rk FROM pq)
       |SELECT CAST(qid AS BIGINT) AS qid, doc_id, bm25, CAST(rk AS BIGINT) AS rk
       |FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin
  }

  /** [[bm25TopK]] through the PERSISTED postings index
    * ([[graft.operators.Bm25Store]]) — the repeated-probe shape: the store
    * is a content-keyed build-once artifact (like the ANN indexes and the
    * signature store), and the probe reads only the query terms' hash
    * buckets (both store scans statically partition-pruned, plan-pinned).
    * Same scoring tail as the inline path, so the SAME DuckDB twin
    * hash-oracles both. [SQL] */
  val bm25Stored: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val sd = graft.operators.Bm25Store.storeDir(docs,
      s"$dir/documents.parquet", "doc_id", "text")
    graft.operators.Bm25Store.probeStored(s, sd, Bm25Queries, k = 5)
      .orderBy("qid", "rk")
  }

  /** [[bm25Stored]] through the INCREMENTAL path — the growing-corpus shape
    * a crawl pipeline actually runs: the store seeds from half the corpus,
    * then two appended epochs (exactly-once stage→marker→publish, with the
    * last epoch deliberately RE-DELIVERED — the at-least-once replay the
    * protocol must absorb as a no-op), and the probe still hash-matches the
    * whole-corpus DuckDB twin: incremental build ≡ batch build ≡ oracle.
    * df partials sum per word, the scalar ledger sums per epoch — both
    * additive because appended doc sets are disjoint (the append
    * contract). [SQL] */
  val bm25Appended: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val parts = Seq(
      docs.filter(pmod(col("doc_id"), lit(2L)) === 0L),
      docs.filter(pmod(col("doc_id"), lit(4L)) === 1L),
      docs.filter(pmod(col("doc_id"), lit(4L)) === 3L))
    val sd = graft.operators.Bm25Store.appendedStoreDir(parts,
      s"$dir/documents.parquet", "doc_id", "text")
    graft.operators.Bm25Store.probeStored(s, sd, Bm25Queries, k = 5)
      .orderBy("qid", "rk")
  }

  // ---- Bigram LM fluency score ----------------------------------------------

  /** CCNet-style LM fluency filtering, exactly oracled: train an add-one-
    * smoothed bigram LM on the corpus (two distributed count aggregations),
    * score each doc by its MEAN TRANSITION PROBABILITY. Every per-transition
    * probability is one exact integer-ratio division, and the per-doc sum is
    * an ORDER-PINNED left fold (sort by position, fold with 0.0 init — IEEE
    * `0.0 + p == p`, so DuckDB's init-less `list_reduce` over the same
    * ordered list is bit-identical). This sidesteps the float-summation-
    * order trap that forces other host-math queries onto the verdict
    * pattern: the full trained-model scoring chain hash-matches.
    *
    * Scale: the bigram/prefix count tables shuffle narrow (token, count)
    * rows keyed by token — vocabulary-sized, AQE broadcasts them under the
    * threshold; the per-doc fold is doc-bounded. Mean-probability ranks
    * documents the same direction as perplexity would (higher = more
    * predictable text) without libm logs, which are not correctly-rounded
    * portable. [SQL] */
  val lmFluency: Q = (s, dir) => lmScored(s, dir)
    .select("doc_id", "n_trans", "lm_score").orderBy("doc_id")

  /** The shared trained-bigram-LM scoring chain behind [[lmFluency]],
    * [[pplBuckets]], [[exportCurriculum]], and [[corpusBuildCcnet]]:
    * (doc_id, lang, n_trans, lm_score) unordered, every doc present
    * (transition-less docs score 0.0). Shared ARTIFACT like
    * [[textQuality]] ([[qualityMemo]] contract): four queries consume the
    * identical per-doc scores, so the chain computes once per
    * (session, corpus) and the checkpointed result is doc-count-sized
    * (four narrow columns per doc). */
  private val lmScoredMemo = new graft.SessionMemo[DataFrame]

  private def lmScored(s: SparkSession, dir: String): DataFrame =
    lmScoredMemo.getOrBuild(s, dir)(lmScoredBody(s, dir).localCheckpoint())

  private def lmScoredBody(s: SparkSession, dir: String): DataFrame = {
    val arr0 = TextFns.normTokens(TextFns.cleanText(col("text"),
      removePunctuation = true))
    // project the array ONCE (HOF lambdas re-evaluate their input per element)
    val docsArr = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      filter(arr0, w => length(w) > 0).as("arr"))
    val nArr = size(col("arr"))
    val big = docsArr
      .select(col("doc_id"), posexplode(
        when(nArr < 2, array().cast("array<struct<prev:string,cur:string>>"))
          .otherwise(arrays_zip(
            slice(col("arr"), lit(1), nArr - 1).as("prev"),
            slice(col("arr"), lit(2), nArr - 1).as("cur")))))
      .select(col("doc_id"), col("pos"),
        col("col.prev").as("prev"), col("col.cur").as("cur"))
    val bc = big.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
    val pc = big.groupBy("prev").agg(count(lit(1)).as("cp"))
    val vv = docsArr.select(explode(col("arr")).as("w"))
      .agg(countDistinct(col("w")).as("vsz"))
    val scored = big.join(bc, Seq("prev", "cur")).join(pc, Seq("prev"))
      .crossJoin(broadcast(vv))
      .select(col("doc_id"), col("pos"),
        ((col("cb").cast("double") + 1.0) /
          (col("cp").cast("double") + col("vsz").cast("double"))).as("p"))
    val perDoc = scored.groupBy("doc_id").agg(
      count(lit(1)).as("n_trans"),
      aggregate(sort_array(collect_list(struct(col("pos"), col("p")))),
        lit(0.0), (acc, x) => acc + x.getField("p")).as("sump"))
    docsArr.select("doc_id", "lang").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        round(when(col("n_trans").isNull, 0.0)
          .otherwise(col("sump") / col("n_trans")), 6).as("lm_score"))
  }

  /** [[lmFluency]] through the PERSISTED bigram-LM store
    * ([[graft.operators.LmStore]]) — the repeated-scoring shape: the model
    * counts build once (content-keyed cache), and scoring reads only the
    * batch's prev-hash buckets with unseen transitions smoothing through
    * left joins. Same fold, same rounding — the SAME DuckDB twin
    * hash-oracles the store path. [SQL] */
  val lmFluencyStored: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val sd = graft.operators.LmStore.storeDir(docs,
      s"$dir/documents.parquet", "doc_id", "text")
    graft.operators.LmStore.scoreStored(s, sd, docs, "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_trans"), col("lm_score"))
      .orderBy("doc_id")
  }

  /** [[lmFluencyStored]] through the INCREMENTAL path: the LM seeds from
    * half the corpus, grows by two appended epochs (the last deliberately
    * re-delivered — the at-least-once replay the exactly-once protocol
    * must absorb), and scoring the full corpus still hash-matches the
    * whole-corpus twin: count partials sum per key, vocab dedups at the
    * probe — incremental model ≡ batch model ≡ oracle. [SQL] */
  val lmFluencyAppended: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val parts = Seq(
      docs.filter(pmod(col("doc_id"), lit(2L)) === 0L),
      docs.filter(pmod(col("doc_id"), lit(4L)) === 1L),
      docs.filter(pmod(col("doc_id"), lit(4L)) === 3L))
    val sd = graft.operators.LmStore.appendedStoreDir(parts,
      s"$dir/documents.parquet", "doc_id", "text")
    graft.operators.LmStore.scoreStored(s, sd, docs, "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_trans"), col("lm_score"))
      .orderBy("doc_id")
  }

  /** CCNet-style fluency bucketing (Wenzek et al. 2020 §4.3): per LANGUAGE,
    * rank documents by the trained bigram-LM score ([[lmScored]] — rounded
    * score, doc_id tie-break, so the order is engine-portable) and cut the
    * ranking into exact terciles — `tail` (least fluent third), `middle`,
    * `head` — the split CCNet keeps/downsamples/drops. Bucket assignment is
    * pure integer arithmetic on the rank (`1 + (rn−1)·3 div n`), NOT a
    * percentile estimate, so the oracle compares exact BIGINTs.
    *
    * Scale shape: the per-language rank is the
    * [[graft.operators.KeyedRank]] two-pass range-partition composition —
    * a skewed-language corpus spreads one language's sort across ALL range
    * partitions instead of hashing it into one task (the r13 lesson: a
    * `partitionBy(lang)` window is partitioned in name only when |langs| is
    * tiny); per-bucket stats are plain combinable aggregates. The per-lang
    * count rides out of the same offset table — no second groupBy. [SQL] */
  val pplBuckets: Q = (s, dir) => {
    val scored = lmScored(s, dir)
    graft.operators.KeyedRank.rankCumsum(scored, "lang",
        Seq(col("lm_score"), col("doc_id")), rn = Some("rn"),
        keyTotal = Some("n"),
        materializeInput = false) // lmScored is a memoized checkpoint
      // rank cast BEFORE the ×3: an int32 row_number × 3 overflows past
      // ~715M docs per language — real at corpus scale
      .withColumn("bucket", expr("1 + CAST(rn - 1 AS BIGINT) * 3 DIV n"))
      .groupBy("lang", "bucket").agg(
        count(lit(1)).as("n_docs"),
        sum("n_trans").as("sum_trans"),
        min("lm_score").as("min_score"),
        max("lm_score").as("max_score"))
      .select(col("lang"), col("bucket").cast("long").as("bucket"),
        when(col("bucket") === 1, "tail").when(col("bucket") === 2, "middle")
          .otherwise("head").as("bucket_label"),
        col("n_docs"), col("sum_trans"), col("min_score"), col("max_score"))
      .orderBy("lang", "bucket")
  }

  /** DuckDB twin of [[lmFluency]] — the identical count/ratio/ordered-fold
    * chain (list_reduce over `list(p ORDER BY pos)`). */
  /** Shared CTE prefix for the bigram-LM twins: everything through the
    * per-doc `scored` frame (doc_id, lang, n_trans, lm_score) — the SQL
    * mirror of [[lmScored]]. */
  private def lmScoreCtes: String = {
    val clean = Duck.clean("text", punct = true)
    val ws = """'\s+'"""
    val zipped = "CASE WHEN len(arr)<2 THEN [] ELSE " +
      "list_zip(arr[1:len(arr)-1], arr[2:len(arr)]) END"
    s"""base AS (SELECT doc_id, lang,
       |    list_filter(string_split(regexp_replace(trim($clean), $ws, ' ', 'g'), ' '),
       |      w -> length(w) > 0) AS arr
       |  FROM documents),
       |bg0 AS (SELECT doc_id, unnest($zipped) AS z,
       |    generate_subscripts($zipped, 1) AS pos FROM base),
       |big AS (SELECT doc_id, pos, z[1] AS prev, z[2] AS cur FROM bg0),
       |bc AS (SELECT prev, cur, count(*) AS cb FROM big GROUP BY 1, 2),
       |pc AS (SELECT prev, count(*) AS cp FROM big GROUP BY 1),
       |vv AS (SELECT count(DISTINCT w) AS vsz FROM
       |  (SELECT unnest(arr) AS w FROM base)),
       |sc AS (SELECT b.doc_id, b.pos,
       |    (CAST(cb AS DOUBLE) + 1.0) / (CAST(cp AS DOUBLE) + CAST(vsz AS DOUBLE)) AS p
       |  FROM big b JOIN bc USING (prev, cur) JOIN pc USING (prev) CROSS JOIN vv),
       |pd AS (SELECT doc_id, count(*) AS n_trans,
       |    list_reduce(list(p ORDER BY pos), (acc, x) -> acc + x) AS sump
       |  FROM sc GROUP BY doc_id),
       |scored AS (SELECT d.doc_id, d.lang,
       |    CAST(COALESCE(n_trans, 0) AS BIGINT) AS n_trans,
       |    round(CASE WHEN n_trans IS NULL THEN 0.0 ELSE sump / n_trans END, 6)
       |      AS lm_score
       |  FROM base d LEFT JOIN pd USING (doc_id))""".stripMargin
  }

  val lmFluencySql: String =
    s"""WITH $lmScoreCtes
       |SELECT doc_id, n_trans, lm_score FROM scored ORDER BY doc_id""".stripMargin

  /** DuckDB twin of [[pplBuckets]] — the identical rank (rounded score,
    * doc_id tie-break) and integer-division tercile cut. */
  val pplBucketsSql: String =
    s"""WITH $lmScoreCtes,
       |r AS (SELECT lang, n_trans, lm_score,
       |    row_number() OVER (PARTITION BY lang ORDER BY lm_score, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM scored),
       |b AS (SELECT lang, n_trans, lm_score,
       |    1 + ((rn - 1) * 3) // n AS bucket FROM r)
       |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
       |  CASE bucket WHEN 1 THEN 'tail' WHEN 2 THEN 'middle' ELSE 'head' END
       |    AS bucket_label,
       |  count(*) AS n_docs, CAST(sum(n_trans) AS BIGINT) AS sum_trans,
       |  min(lm_score) AS min_score, max(lm_score) AS max_score
       |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin

  /** The per-source CORPUS CARD — the one-page report a data team ships
    * with a training corpus: volume (docs, tokens, token share), quality
    * (gate pass rate — the SAME [[graft.operators.Quality]] signals +
    * thresholds the batch gate and the streaming front door apply),
    * integrity (fraction of docs involved in an exact-dup group), and
    * diversity (unigram TTR, the boilerplate screen). One row per source;
    * every rate is an integer count divided once and rounded, so the whole
    * card hash-matches SQL.
    *
    * Scale: four per-source aggregates over the corpus (each map-side
    * combinable or id-keyed), a sources-sized join tree on top. The dup
    * join keys on the 8-byte [[graft.functions.TextFns.fingerprint64]]
    * exactly as `dedup_fingerprint` does (r13 verdict #4 — the raw-text key
    * shipped the corpus text twice at 100 TB); the oracle replays the same
    * polynomial fp, so "dup" means normalized-fingerprint-identical in BOTH
    * engines. [SQL]. */
  val corpusCard: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val per = docs.groupBy("source").agg(count(lit(1)).as("n_docs"),
      sum(TextFns.tokenCount(col("text")).cast("long")).as("n_tokens"))
    val tot = per.agg(sum("n_tokens").as("tot_tokens"))
    val q = graft.operators.Quality.signals(docs, "doc_id", "text")
      .withColumn("ok", graft.operators.Quality.okCol())
      .select("doc_id", "ok")
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"))
    // 8-byte fp as the dup shuffle key — text never re-keys a shuffle; the
    // char-fold fp computes ONCE (checkpoint) for its two consumers
    val fps = docs.select(col("source"),
      TextFns.fingerprint64(col("text")).as("fp")).localCheckpoint()
    val fpCounts = fps.groupBy("fp").agg(count(lit(1)).as("txt_n"))
    val dup = fps.join(fpCounts, Seq("fp"))
      .groupBy("source")
      .agg(sum(when(col("txt_n") > 1, 1L).otherwise(0L)).as("n_dup"))
    // NEAR-dup involvement per source (r16 verdict #8): the
    // dedup_cross_source_matrix LSH spine rolled per source — distinct doc
    // ids appearing in any verified near-dup pair, id-keyed against the
    // (id, source) dim exactly like the matrix (pairs ≪ corpus after
    // banding; a card that only reports exact-dup involvement undersells
    // contamination by whatever the re-crawl/templating rate is)
    val pairs = graft.operators.Dedup.minHashLsh(docs, "doc_id", "text",
      numHashes = 32, bands = 8, shingleSize = 3, threshold = 0.5)
    val near = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source").agg(count(lit(1)).as("n_near"))
    val tk = docs.select(col("source"),
      TextFns.words(TextFns.cleanText(col("text"), removePunctuation = true))
        .as("toks")).localCheckpoint()
    val st = tk.groupBy("source")
      .agg(sum(size(col("toks"))).cast("long").as("tot_toks"))
    val ut = tk.select(col("source"), explode(col("toks")).as("tok"))
      .groupBy("source").agg(countDistinct("tok").as("uniq_toks"))
    per.crossJoin(broadcast(tot))
      .join(q, Seq("source")).join(dup, Seq("source"))
      .join(near, Seq("source"), "left")
      .join(st, Seq("source")).join(ut, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") /
          col("tot_tokens").cast("double"), 6).as("token_share"),
        round(col("n_ok").cast("double") /
          col("n_docs").cast("double"), 6).as("quality_pass_rate"),
        round(col("n_dup").cast("double") /
          col("n_docs").cast("double"), 6).as("dup_doc_rate"),
        round(coalesce(col("n_near"), lit(0L)).cast("double") /
          col("n_docs").cast("double"), 6).as("near_dup_doc_rate"),
        round(col("uniq_toks").cast("double") /
          col("tot_toks").cast("double"), 6).as("ttr"))
      .orderBy("source")
  }

  val corpusCardSql: String = {
    val ws = """'\s+'"""
    val toks = "string_split(" + Duck.clean("text", punct = true) + ", ' ')"
    s"""WITH per AS (SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(regexp_split_to_array(text, $ws))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT sum(n_tokens) AS tot_tokens FROM per),
       |q AS (SELECT d.source,
       |    sum(CASE WHEN tq.quality_ok THEN 1 ELSE 0 END) AS n_ok
       |  FROM ($textQualitySql) tq JOIN documents d USING (doc_id)
       |  GROUP BY d.source),
       |fps AS (SELECT source, list_reduce(
       |    [CAST(ascii(n[i]) AS BIGINT) FOR i IN range(1, length(n) + 1)],
       |    (acc, x) -> (acc * 31 + x) % ${graft.functions.TextFns.FingerprintMod}) AS fp
       |  FROM (SELECT source,
       |    regexp_replace(lower(trim(text)), '${"""\s+"""}', ' ', 'g') AS n
       |    FROM documents) q0),
       |tc AS (SELECT fp, count(*) AS txt_n FROM fps GROUP BY fp),
       |dup AS (SELECT d.source,
       |    sum(CASE WHEN tc.txt_n > 1 THEN 1 ELSE 0 END) AS n_dup
       |  FROM fps d JOIN tc USING (fp) GROUP BY d.source),
       |tk AS (SELECT source, $toks AS toks FROM documents),
       |st AS (SELECT source, CAST(sum(len(toks)) AS BIGINT) AS tot_toks
       |  FROM tk GROUP BY source),
       |ut AS (SELECT source, count(DISTINCT tok) AS uniq_toks
       |  FROM (SELECT source, unnest(toks) AS tok FROM tk) GROUP BY source),
       |nearp AS (SELECT id_a, id_b FROM ($dedupMinhashLshSql) lsh),
       |ninv AS (SELECT DISTINCT doc_id FROM
       |  (SELECT id_a AS doc_id FROM nearp
       |   UNION ALL SELECT id_b AS doc_id FROM nearp)),
       |nd AS (SELECT d2.source, count(*) AS n_near FROM ninv
       |  JOIN documents d2 USING (doc_id) GROUP BY d2.source)
       |SELECT per.source, n_docs, n_tokens,
       |  round(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE), 6)
       |    AS token_share,
       |  round(CAST(n_ok AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
       |    AS quality_pass_rate,
       |  round(CAST(n_dup AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
       |    AS dup_doc_rate,
       |  round(CAST(coalesce(n_near, 0) AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
       |    AS near_dup_doc_rate,
       |  round(CAST(uniq_toks AS DOUBLE) / CAST(tot_toks AS DOUBLE), 6) AS ttr
       |FROM per CROSS JOIN tot JOIN q USING (source) JOIN dup USING (source)
       |LEFT JOIN nd ON nd.source = per.source
       |JOIN st ON st.source = per.source JOIN ut ON ut.source = per.source
       |ORDER BY per.source""".stripMargin
  }

  /** Curriculum-ordered training export: phase 1 = the most fluent tercile
    * of each language (the CCNet head), phase 3 = the tail — easy-first
    * curriculum ordering by the trained bigram-LM score — and within each
    * phase a seeded shard permutation
    * ([[graft.operators.Pack.shuffleOrderWithin]]), so a trainer consuming
    * phases in order and shards round-robin sees fluent text first with a
    * deterministic shuffle inside every phase. The tercile is the
    * [[pplBuckets]] integer-division rank cut (phase = 4 − bucket); the
    * shard draw is the staged-xxhash64 permutation — everything replays as
    * exact BIGINTs.
    *
    * Scale shape: the lang rank is the [[graft.operators.KeyedRank]]
    * two-pass range-partition composition (never a hash-partitioned window
    * on a |langs|-cardinality key); the phase × shard position window stays
    * a plain partitioned window (its key cardinality GROWS with nShards —
    * size nShards to executor memory exactly as
    * [[graft.operators.Pack.shuffleOrder]]). [SQL]. */
  val exportCurriculum: Q = (s, dir) => {
    val scored = lmScored(s, dir)
    val phased = graft.operators.KeyedRank.rankCumsum(scored, "lang",
        Seq(col("lm_score"), col("doc_id")), rn = Some("rn"),
        keyTotal = Some("n"),
        materializeInput = false) // lmScored is a memoized checkpoint
      .withColumn("phase",
        lit(4L) - expr("1 + CAST(rn - 1 AS BIGINT) * 3 DIV n"))
      .select("doc_id", "phase")
    graft.operators.Pack
      .shuffleOrderWithin(phased, "doc_id", nShards = 8, seed = 19L,
        within = Seq("phase"))
      .select(col("doc_id"), col("phase").cast("long").as("phase"),
        col("shard").cast("long").as("shard"), col("shard_pos"))
      .orderBy("doc_id")
  }

  val exportCurriculumSql: String = {
    val drawn = drawSelect("b", "doc_id", Seq("phase"), 19L)
    s"""WITH $lmScoreCtes,
       |r AS (SELECT doc_id, lang, lm_score,
       |    row_number() OVER (PARTITION BY lang ORDER BY lm_score, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM scored),
       |b AS (SELECT doc_id, 4 - (1 + ((rn - 1) * 3) // n) AS phase FROM r),
       |d AS ($drawn),
       |sh AS (SELECT doc_id, phase, draw, draw % 8 AS shard FROM d)
       |SELECT doc_id, CAST(phase AS BIGINT) AS phase,
       |  CAST(shard AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY phase, shard
       |    ORDER BY draw DESC, doc_id) AS BIGINT) AS shard_pos
       |FROM sh ORDER BY doc_id""".stripMargin
  }

  // ---- Learned BPE tokenizer ------------------------------------------------

  private val bpeMemo = new graft.SessionMemo[graft.functions.Bpe.Model]()

  /** Tokenizer TRAINING as a pipeline step (graft.functions.Bpe — Sennrich
    * BPE): the corpus-sized pass is ONE distributed word-frequency
    * aggregation; the merge loop runs driver-side on the BOUNDED word-freq
    * table (cap enforced, the standard sentencepiece/HF trainer shape); the
    * learned merge ranks broadcast back into a narrow per-word encode map.
    * Oracle = the q15 verdict pattern: per-source word counts replay the
    * clean/split chain exactly in SQL; strict compression, per-word
    * decode∘encode identity, and the merge-budget bound ride as booleans
    * pinned TRUE. Exact merge-sequence learnability is pinned in BpeSpec
    * (hand-computed merges, deterministic tie-breaks). [SQL] */
  /** The shared [[bpeTokenize]] verdict tail over an already-obtained model
    * — the in-memory and stored paths must produce identical frames, so the
    * SAME DuckDB twin oracles both. */
  private def bpeVerdicts(s: SparkSession, docs: DataFrame,
                          model: graft.functions.Bpe.Model): DataFrame = {
    val bm = s.sparkContext.broadcast(model)
    val toks = docs.select(col("source"),
        explode(TextFns.normTokens(TextFns.cleanText(col("text"),
          removePunctuation = true))).as("w"))
      .filter(length(col("w")) > 0)
    toks.select(col("source"),
        graft.functions.Bpe.pieceCountCol(bm)(col("w")).as("np"),
        length(col("w")).cast("long").as("nc"),
        graft.functions.Bpe.roundTripCol(bm)(col("w")).as("rt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        (sum(col("np")) < sum(col("nc"))).as("compresses"),
        (min(when(col("rt"), 1).otherwise(0)) === 1).as("roundtrip_exact"))
      .withColumn("merge_budget_held", lit(model.merges.length <= 50))
      .orderBy("source")
  }

  val bpeTokenize: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val model = bpeMemo.getOrBuild(s, s"bpe|$dir|50|2") {
      graft.functions.Bpe.train(docs, "text", numMerges = 50, minCount = 2,
        maxWords = 200000)
    }
    bpeVerdicts(s, docs, model)
  }

  /** [[bpeTokenize]] through the PERSISTED tokenizer
    * ([[graft.operators.BpeStore]]): train-once-publish, then the model is
    * LOADED FROM DISK (params checked loudly) and must reproduce the
    * in-memory path bit-for-bit — same verdict frame, same DuckDB twin. The
    * production shape: one versioned tokenizer artifact, every downstream
    * job loads it instead of retraining. [SQL] */
  val bpeTokenizeStored: Q = (s, dir) => {
    val sd = graft.operators.BpeStore.storeDir(s, s"$dir/documents.parquet",
      "text", numMerges = 50, minCount = 2L, maxWords = 200000)
    val model = graft.operators.BpeStore.load(s, sd, 50, 2L)
    bpeVerdicts(s, Tables.documents(s, dir), model)
  }

  /** DuckDB twin of [[bpeTokenize]]: the clean/normTokens chain replayed
    * per source; verdicts pinned TRUE. */
  val bpeTokenizeSql: String = {
    val clean = Duck.clean("text", punct = true)
    val ws = """'\s+'"""
    s"""WITH t AS (SELECT source,
       |    unnest(string_split(regexp_replace(trim($clean), $ws, ' ', 'g'), ' ')) AS w
       |  FROM documents)
       |SELECT source, count(*) AS n_words, TRUE AS compresses,
       |  TRUE AS roundtrip_exact, TRUE AS merge_budget_held
       |FROM t WHERE length(w) > 0 GROUP BY source ORDER BY source""".stripMargin
  }

  /** Sequence packing over LEARNED-tokenizer counts — the real pre-training
    * shape (reference tokenize-then-batch, `streams/stream_data.py:132-148`):
    * the corpus's own trained BPE model (shared session artifact with
    * [[bpeTokenize]] — same memo key, trained once) supplies each doc's
    * token count via the broadcast merge table, and
    * [[graft.operators.Pack.packByBudget]] assigns 512-token blocks over
    * those counts with its partition-composed prefix sum.
    *
    * Oracle = the [[bpeTokenize]] verdict pattern: the clean/normTokens
    * word spine (n_words, n_chars) replays exactly in SQL; the learned
    * counts and the packing ride as booleans a broken pipeline fails —
    * `tok_bounded` (words ≤ bpe ≤ chars per doc: a non-encoding or
    * over-splitting tokenizer breaks a side), `merges_applied` (global
    * STRICT words < bpe-total < chars: both a no-op encode (= chars) and a
    * whole-word collapse (= words) fail), and `bin_cross_checked` (the
    * partition-composed bin/offset equals an independent two-level
    * value-ranged prefix sum — the spec twin of the prefix composition,
    * itself scale-shaped: no single-partition window at any scale). [SQL] */
  val packBpeSequences: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val model = bpeMemo.getOrBuild(s, s"bpe|$dir|50|2") {
      graft.functions.Bpe.train(docs, "text", numMerges = 50, minCount = 2,
        maxWords = 200000)
    }
    val bm = s.sparkContext.broadcast(model)
    val toks = docs.select(col("doc_id"),
        explode(TextFns.normTokens(TextFns.cleanText(col("text"),
          removePunctuation = true))).as("w"))
      .filter(length(col("w")) > 0)
    // ONE encode pass feeds the pack, the verdicts, and the global sums
    val counts = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(graft.functions.Bpe.pieceCountCol(bm)(col("w"))).cast("long")
          .as("n_bpe"))
      .localCheckpoint()
    val tot = counts.agg(sum("n_words").cast("long"), sum("n_chars"),
      sum("n_bpe"), max("doc_id")).head()
    val (totW, totC, totB) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val packed = graft.operators.Pack.packByBudget(
      counts, "doc_id", "n_bpe", budget = 512L)
    // Spec twin of the prefix composition, scale-shaped itself (r17 verdict
    // #3: the old global `Window.orderBy(doc_id)` moved every count row to
    // ONE task inside the declared query). Two-level prefix over VALUE
    // ranges: `rng = doc_id DIV rw` (≤ RangeCap ranges by construction, so
    // the per-range offset collect is bounded) + a window PARTITIONED by
    // rng for the intra-range prefix. Mechanism stays independent of
    // Pack.packByBudget (value-derived ranges + broadcast offsets vs
    // physical-pid ranges), and prev is exact: rng is monotone in doc_id,
    // so global-prefix(doc) = range-offset(rng) + intra-range-prefix(doc).
    val rangeCap = 8192L
    val rw = math.max(1L, tot.getLong(3) / rangeCap + 1L)
    val ranged = counts.withColumn("rng", expr(s"doc_id DIV $rw"))
    var roffAcc = 0L
    val roffs = ranged.groupBy("rng").agg(sum("n_bpe").as("rtot"))
      .orderBy("rng").collect()
      .map { r => val t = (r.getLong(0), roffAcc); roffAcc += r.getLong(1); t }
      .toSeq
    import s.implicits._
    val wi = Window.partitionBy("rng").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val direct = ranged
      .select(col("doc_id"), col("rng"),
        coalesce(sum("n_bpe").over(wi), lit(0L)).as("iprev"))
      .join(broadcast(roffs.toDF("rng", "roff")), Seq("rng"))
      .select(col("doc_id"), (col("roff") + col("iprev")).as("prev"))
      .select(col("doc_id"), expr("prev DIV 512").as("d_bin"),
        pmod(col("prev"), lit(512L)).as("d_off"))
    counts.join(packed.select(col("doc_id"), col("bin_id"), col("bin_offset")),
        Seq("doc_id"))
      .join(direct, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        (col("n_words") <= col("n_bpe") && col("n_bpe") <= col("n_chars"))
          .as("tok_bounded"),
        (col("bin_id") === col("d_bin") && col("bin_offset") === col("d_off"))
          .as("bin_cross_checked"),
        lit(totW < totB && totB < totC).as("merges_applied"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[packBpeSequences]]: the per-doc clean/normTokens word
    * spine exact; the three learned-count verdicts pinned TRUE. */
  val packBpeSequencesSql: String = {
    val clean = Duck.clean("text", punct = true)
    val ws = """'\s+'"""
    s"""WITH t AS (SELECT doc_id,
       |    unnest(string_split(regexp_replace(trim($clean), $ws, ' ', 'g'), ' ')) AS w
       |  FROM documents)
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(length(w)) AS BIGINT) AS n_chars,
       |  TRUE AS tok_bounded, TRUE AS bin_cross_checked,
       |  TRUE AS merges_applied
       |FROM t WHERE length(w) > 0 GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Length-bucketed packing over LEARNED-tokenizer counts — [[bpeTokenize]]
    * + [[packLengthBuckets]] composed, the shape a bucketed-batching trainer
    * actually runs: the corpus's own trained BPE model (shared session
    * artifact with [[bpeTokenize]], same memo key — trained once) supplies
    * each doc's piece count, docs bucket by piece-count width
    * (least(n_bpe DIV 32, 15), ≤16 keys — well inside the
    * [[graft.operators.Pack.packByBudgetKeyed]] cardinality contract), and
    * each bucket's stream packs independently into its own 512-piece blocks.
    *
    * Oracle = the [[packBpeSequences]] verdict pattern: the clean/normTokens
    * word spine (n_words, n_chars) replays exactly in SQL; the learned
    * piece counts cross-check IN-ENGINE against a direct bucket-partitioned
    * window cumsum (spec twin, oracle scale only) and against the
    * every-bucket-starts-at-zero independence property, exporting as
    * pinned-TRUE verdicts. [SQL] */
  val packBucketedBpe: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val model = bpeMemo.getOrBuild(s, s"bpe|$dir|50|2") {
      graft.functions.Bpe.train(docs, "text", numMerges = 50, minCount = 2,
        maxWords = 200000)
    }
    val bm = s.sparkContext.broadcast(model)
    val toks = docs.select(col("doc_id"),
        explode(TextFns.normTokens(TextFns.cleanText(col("text"),
          removePunctuation = true))).as("w"))
      .filter(length(col("w")) > 0)
    // ONE encode pass feeds the bucketing, the pack, and the verdicts
    val counts = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(graft.functions.Bpe.pieceCountCol(bm)(col("w"))).cast("long")
          .as("n_bpe"))
      .withColumn("bucket", least(expr("n_bpe DIV 32"), lit(15L)))
      .localCheckpoint()
    val packed = graft.operators.Pack.packByBudgetKeyed(
        counts, "bucket", "doc_id", "n_bpe", budget = 512L)
      .select(col("doc_id"), col("bin_id"), col("bin_offset"))
      .localCheckpoint()
    // spec twin of the keyed prefix composition: one bucket-partitioned
    // window (oracle scale only — the declared operator composes
    // per-(key, partition) instead)
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val direct = counts
      .select(col("doc_id"), col("bucket"),
        coalesce(sum("n_bpe").over(w), lit(0L)).as("prev"))
      .select(col("doc_id"), expr("prev DIV 512").as("d_bin"),
        pmod(col("prev"), lit(512L)).as("d_off"))
    // independence property: every bucket's packed stream starts at block
    // 0, offset 0 (16-row frame, broadcast into the verdict join)
    val starts = counts.select("doc_id", "bucket")
      .join(packed, Seq("doc_id"))
      .groupBy("bucket")
      .agg(min(col("bin_id") * 512L + col("bin_offset")).as("bstart"))
    counts
      .join(packed, Seq("doc_id"))
      .join(direct, Seq("doc_id"))
      .join(broadcast(starts), Seq("bucket"))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        (col("n_words") <= col("n_bpe") && col("n_bpe") <= col("n_chars"))
          .as("tok_bounded"),
        (col("bin_id") === col("d_bin") && col("bin_offset") === col("d_off"))
          .as("bin_cross_checked"),
        (col("bstart") === 0L).as("bucket_starts_fresh"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[packBucketedBpe]]: the per-doc clean/normTokens word
    * spine exact; the three learned-count verdicts pinned TRUE. */
  val packBucketedBpeSql: String = {
    val clean = Duck.clean("text", punct = true)
    val ws = """'\s+'"""
    s"""WITH t AS (SELECT doc_id,
       |    unnest(string_split(regexp_replace(trim($clean), $ws, ' ', 'g'), ' ')) AS w
       |  FROM documents)
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(length(w)) AS BIGINT) AS n_chars,
       |  TRUE AS tok_bounded, TRUE AS bin_cross_checked,
       |  TRUE AS bucket_starts_fresh
       |FROM t WHERE length(w) > 0 GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Unigram-frequency document score: the corpus-LM quality proxy (CCNet
    * trains a real LM; the distributed two-pass shape is identical) — pass 1
    * builds the corpus unigram table, pass 2 scores each doc by its tokens'
    * corpus frequencies. Docs dominated by rare tokens (high `rare_frac`,
    * low `mean_tok_freq`) are gibberish/OCR noise candidates; the score is
    * a standard pre-training filter signal.
    *
    * Formulated integer-exactly (counts and count-sums, divided once at the
    * end) so the oracle matches bit-for-bit — a log-prob mean would hang the
    * hash on float summation order. Pass 2's token→count join keys on the
    * word (vocabulary-sized right side; AQE broadcasts it when it fits);
    * the per-doc rollup is a partial+final agg keyed on doc_id. [SQL] */
  val textUnigramScore: Q = (s, dir) => {
    val words = Tables.documents(s, dir).select(col("doc_id"),
        explode(TextFns.words(TextFns.cleanText(col("text"),
          removePunctuation = true))).as("word"))
      .filter(length(col("word")) > 0)
    val counts = words.groupBy("word").agg(count(lit(1)).as("cnt"))
    words.join(counts, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cnt") <= 2, 1L).otherwise(0L)).as("n_rare"),
        sum("cnt").as("sum_cnt"))
      .select(col("doc_id"), col("n_tokens"), col("n_rare"),
        round(col("n_rare").cast("double") / col("n_tokens"), 6).as("rare_frac"),
        round(col("sum_cnt").cast("double") / col("n_tokens"), 4).as("mean_tok_freq"))
      .orderBy("doc_id")
  }

  val textUnigramScoreSql: String = {
    val clean = Duck.clean("text", punct = true)
    s"""WITH w AS (SELECT doc_id, unnest(string_split($clean, ' ')) AS word
       |  FROM documents),
       |w2 AS (SELECT doc_id, word FROM w WHERE length(word) > 0),
       |c AS (SELECT word, count(*) AS cnt FROM w2 GROUP BY 1),
       |s AS (SELECT doc_id, count(*) AS n_tokens,
       |    CAST(sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       |    CAST(sum(cnt) AS BIGINT) AS sum_cnt
       |  FROM w2 JOIN c USING (word) GROUP BY doc_id)
       |SELECT doc_id, n_tokens, n_rare,
       |  round(CAST(n_rare AS DOUBLE) / n_tokens, 6) AS rare_frac,
       |  round(CAST(sum_cnt AS DOUBLE) / n_tokens, 4) AS mean_tok_freq
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Count-min-sketch frequency survey ([[graft.operators.Sketch]]): the
    * depth×width counter matrix built from the vocab table, point estimates
    * for the top-20 exact heavy hitters, and the CMS guarantees carried as
    * output booleans (over_ok: est ≥ exact, always; within_eps:
    * est − exact ≤ (e/width)·N, integer-exact cross-multiplication with
    * decimal headroom). Top-20 via orderBy+limit (TakeOrdered, the a2
    * precedent); counter matrix is 4×256 cells broadcast into the probe
    * join. The probe set is the top-20 plus one OUT-OF-VOCABULARY token
    * (exact count 0) — pinning the left-join estimate path: an OOV probe
    * hitting an empty cell must report 0, never the min of the non-empty
    * cells only. [SQL — hashInt(i,42)-seeded string hashes replayed via
    * Duck.xxh64StrCtes; width 256 divides 2^64 so unsigned mod replays
    * pmod]. */
  private val oovProbeToken = "zzzgraftoovprobezzz"

  val sketchHeavyHitters: Q = (s, dir) => {
    val counts = Tables.documents(s, dir)
      .select(explode(TextFns.words(TextFns.cleanText(col("text"),
        removePunctuation = true))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // consumers: counters, probes, total, top-20
    val counters = graft.operators.Sketch.cmsCounters(counts)
    val probeExact = counts.orderBy(col("cnt").desc, col("token")).limit(20)
      .unionByName(s.range(1)
        .select(lit(oovProbeToken).as("token"), lit(0L).as("cnt")))
    val est = graft.operators.Sketch.cmsEstimates(
      probeExact.select("token"), counters)
    val tot = counts.agg(sum("cnt").as("ntot"))
    probeExact
      .join(est, Seq("token"))
      .crossJoin(broadcast(tot))
      .select(col("token"), col("cnt").as("exact_cnt"), col("est").as("est_cnt"),
        (col("est") >= col("cnt")).as("over_ok"),
        ((col("est") - col("cnt")).cast("decimal(38,0)") * lit(256000000L) <=
          lit(2718282L).cast("decimal(38,0)") * col("ntot")).as("within_eps"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  val sketchHeavyHittersSql: String = {
    val clean = Duck.clean("text", punct = true)
    val seeds = Duck.stagedSql(
      "SELECT CAST(unnest(range(0, 4)) AS HUGEINT) AS i",
      Duck.xxhashIntStages("i", "42", "seedi", "s"))
    s"""WITH RECURSIVE
       |w AS (SELECT unnest(string_split($clean, ' ')) AS token FROM documents),
       |c AS (SELECT token, count(*) AS cnt FROM w WHERE length(token) > 0
       |  GROUP BY 1),
       |seeds AS ($seeds),
       |toks AS (SELECT token FROM c
       |  UNION ALL SELECT 'zzzgraftoovprobezzz'),
       |cellmap AS (SELECT t.token, sd.i,
       |    CAST(sd.i AS VARCHAR) || '|' || t.token AS sid, sd.seedi
       |  FROM toks t CROSS JOIN seeds sd),
       |strs AS (SELECT sid, token AS s, seedi AS seed FROM cellmap),
       |${Duck.xxh64StrCtes("strs")},
       |bkt AS (SELECT m.token, m.i, x.h % 256 AS bucket
       |  FROM cellmap m JOIN xstr x ON x.sid = m.sid),
       |counters AS (SELECT i, bucket, CAST(sum(c2.cnt) AS HUGEINT) AS cval
       |  FROM bkt JOIN c c2 USING (token) GROUP BY 1, 2),
       |est AS (SELECT token, CAST(min(coalesce(cval, 0)) AS BIGINT) AS est
       |  FROM bkt LEFT JOIN counters USING (i, bucket) GROUP BY token),
       |tot AS (SELECT CAST(sum(cnt) AS HUGEINT) AS ntot FROM c),
       |top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 20),
       |pe AS (SELECT token, cnt FROM top
       |  UNION ALL SELECT 'zzzgraftoovprobezzz', CAST(0 AS BIGINT))
       |SELECT t.token, t.cnt AS exact_cnt, e.est AS est_cnt,
       |  (e.est >= t.cnt) AS over_ok,
       |  (CAST(e.est - t.cnt AS HUGEINT) * 256000000 <= 2718282 * ntot)
       |    AS within_eps
       |FROM pe t JOIN est e USING (token) CROSS JOIN tot
       |ORDER BY exact_cnt DESC, token""".stripMargin
  }

  /** Per-source distinct-token survey via DataSketches HLL
    * (`hll_sketch_agg`, lgK=12 ≈ 1.6 % standard error): the
    * vocabulary-cardinality pass a 100 TB corpus runs WITHOUT the
    * distinct-count shuffle — each source reduces to a 4 KB sketch,
    * sketches are union-mergeable across partitions/epochs (pinned in
    * SketchSpec), and only sketch bytes cross the wire. The oracle follows
    * the q15 verdict pattern: the exact distinct count is replayed in SQL,
    * and the estimate rides as an integer-exact boolean claim
    * (|est − exact|·20 ≤ exact, i.e. within 5 %) the DuckDB twin pins
    * TRUE. [SQL] */
  val sketchDistinct: Q = (s, dir) => {
    val toks = Tables.documents(s, dir)
      .select(col("source"),
        explode(TextFns.words(TextFns.cleanText(col("text"),
          removePunctuation = true))).as("token"))
      .filter(length(col("token")) > 0)
    toks.groupBy("source")
      .agg(countDistinct(col("token")).as("exact_distinct"),
        hll_sketch_estimate(hll_sketch_agg(col("token"), 12)).as("est"))
      .select(col("source"), col("exact_distinct"),
        (abs(col("est") - col("exact_distinct")) * lit(20L) <=
          col("exact_distinct")).as("est_ok"))
      .orderBy("source")
  }

  val sketchDistinctSql: String = {
    val clean = Duck.clean("text", punct = true)
    s"""WITH w AS (SELECT source, unnest(string_split($clean, ' ')) AS token
       |  FROM documents)
       |SELECT source, count(DISTINCT token) AS exact_distinct, TRUE AS est_ok
       |FROM w WHERE length(token) > 0
       |GROUP BY source ORDER BY source""".stripMargin
  }

  /** DSIR data selection ([[graft.operators.Dsir]]): hashed-bigram importance
    * affinity of every raw doc (sources ≠ src0/src1) against the src0+src1
    * target domain, top-50 resample flagged. Integer-exact affinity (ratio of
    * smoothed decimal dot products — see the operator doc for why not the
    * paper's log-sum), bucket stats broadcast, bounded-TopK selection — no
    * global window, no corpus-sized shuffle. [SQL — xxhash64 replayed via
    * Duck.xxh64StrCtes; buckets=256 divides 2^64, so the unsigned `h % 256`
    * equals Spark's pmod(signed h, 256) exactly]. */
  val dsirSelect: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val aff = graft.operators.Dsir.affinity(docs, "doc_id", "text",
      col("source").isin("src0", "src1"), buckets = 256)
    graft.operators.Dsir.resample(aff, k = 50)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  val dsirSelectSql: String =
    s"""WITH RECURSIVE
       |$toksCte,
       |grams AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
       |        FROM toksraw WHERE len(w) >= 2) q),
       |strs AS (SELECT g AS sid, g AS s, CAST(42 AS HUGEINT) AS seed
       |  FROM (SELECT DISTINCT g FROM grams)),
       |${Duck.xxh64StrCtes("strs")},
       |gb AS (SELECT gr.doc_id, x.h % 256 AS b
       |  FROM grams gr JOIN xstr x ON x.sid = gr.g),
       |flag AS (SELECT doc_id, source IN ('src0', 'src1') AS is_target
       |  FROM documents),
       |pd AS (SELECT gb.doc_id, f.is_target, b, count(*) AS c
       |  FROM gb JOIN flag f USING (doc_id) GROUP BY 1, 2, 3),
       |stats AS (SELECT b,
       |    CAST(sum(CASE WHEN is_target THEN c ELSE 0 END) AS HUGEINT) AS ct,
       |    CAST(sum(CASE WHEN NOT is_target THEN c ELSE 0 END) AS HUGEINT) AS cr
       |  FROM pd GROUP BY b),
       |sc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       |    sum(CAST(c AS HUGEINT) * (ct + 1)) AS num,
       |    sum(CAST(c AS HUGEINT) * (cr + 1)) AS den
       |  FROM pd JOIN stats USING (b) WHERE NOT is_target GROUP BY doc_id),
       |r AS (SELECT doc_id, n_grams,
       |    round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS affinity
       |  FROM sc)
       |SELECT doc_id, n_grams, affinity,
       |  (row_number() OVER (ORDER BY affinity DESC, doc_id) <= 50) AS selected
       |FROM r ORDER BY doc_id""".stripMargin

  /** Batch twin of the streaming admission gate
    * ([[graft.streaming.IngestGate]]): every raw document (source outside
    * src0/src1) scored against the target-domain DSIR bucket stats AND the
    * Gopher/C4 quality gate; admitted iff affinity ≥ 1.0 (the neutral
    * smoothed ratio — more target-like than raw-like) and quality passes.
    * EXACTLY the operator the foreachBatch sink runs per micro-batch
    * (same Dsir.bucketStats / affinityAgainst / Quality.signals code),
    * which puts the streaming gate's arithmetic under the DuckDB oracle.
    * [SQL — the dsir_select and text_quality CTE chains stitched]. */
  val gateAdmission: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val isTgt = col("source").isin("src0", "src1")
    // ONE tokenize pass (the most expensive per-byte work in the chain)
    // feeds BOTH the historical bucket stats and the gate's scoring of the
    // non-target pool — the regex chain previously ran once per consumer.
    val toksAll = graft.operators.Quality
      .tokensWith(docs, "doc_id", "text", "is_target" -> isTgt)
      .localCheckpoint()
    val stats = graft.operators.Dsir.bucketStatsFromTokens(toksAll, "doc_id")
    new graft.streaming.IngestGate(stats, minAffinity = 1.0)
      .gateFromTokens(docs.filter(!isTgt),
        toksAll.filter(!col("is_target")).select("doc_id", "toks"), "doc_id")
      .select("doc_id", "affinity", "quality_ok", "admitted")
      .orderBy("doc_id")
  }

  val gateAdmissionSql: String =
    s"""WITH RECURSIVE
       |$toksCte,
       |grams AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
       |        FROM toksraw WHERE len(w) >= 2) q),
       |strs AS (SELECT g AS sid, g AS s, CAST(42 AS HUGEINT) AS seed
       |  FROM (SELECT DISTINCT g FROM grams)),
       |${Duck.xxh64StrCtes("strs")},
       |gb AS (SELECT gr.doc_id, x.h % 256 AS b
       |  FROM grams gr JOIN xstr x ON x.sid = gr.g),
       |flag AS (SELECT doc_id, source IN ('src0', 'src1') AS is_target
       |  FROM documents),
       |pd AS (SELECT gb.doc_id, f.is_target, b, count(*) AS c
       |  FROM gb JOIN flag f USING (doc_id) GROUP BY 1, 2, 3),
       |stats AS (SELECT b,
       |    CAST(sum(CASE WHEN is_target THEN c ELSE 0 END) AS HUGEINT) AS ct,
       |    CAST(sum(CASE WHEN NOT is_target THEN c ELSE 0 END) AS HUGEINT) AS cr
       |  FROM pd GROUP BY b),
       |sc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       |    sum(CAST(c AS HUGEINT) * (ct + 1)) AS num,
       |    sum(CAST(c AS HUGEINT) * (cr + 1)) AS den
       |  FROM pd JOIN stats USING (b) WHERE NOT is_target GROUP BY doc_id),
       |r AS (SELECT doc_id,
       |    round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS affinity
       |  FROM sc),
       |toks AS (SELECT doc_id, list_filter(w, x -> length(x) > 0) AS w FROM toksraw),
       |tokf AS (SELECT doc_id, unnest(w) AS tok FROM toks),
       |us AS (SELECT doc_id, max(c) AS topc, sum(c) AS n, sum(c * ln_) AS sumlen FROM
       |  (SELECT doc_id, tok, count(*) AS c, length(tok) AS ln_ FROM tokf
       |   GROUP BY doc_id, tok) u GROUP BY doc_id),
       |g2 AS (SELECT doc_id, count(*) AS tot2, count(DISTINCT g) AS dst2 FROM
       |  (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
       |   FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
       |         FROM toks WHERE len(w) >= 2) q) GROUP BY doc_id),
       |m AS (SELECT d.doc_id,
       |  coalesce(CAST(us.n AS BIGINT), 0) AS n_tokens,
       |  round(CASE WHEN us.n IS NULL THEN 0.0
       |    ELSE CAST(us.sumlen AS DOUBLE) / us.n END, 6) AS mean_word_len,
       |  round(CASE WHEN us.n IS NULL THEN 0.0
       |    ELSE CAST(us.topc AS DOUBLE) / us.n END, 6) AS top_unigram_ratio,
       |  round(CASE WHEN g2.tot2 IS NULL THEN 0.0
       |    ELSE 1.0 - CAST(g2.dst2 AS DOUBLE) / g2.tot2 END, 6) AS dup_2gram_ratio
       |  FROM documents d LEFT JOIN us USING (doc_id)
       |  LEFT JOIN g2 USING (doc_id)),
       |q AS (SELECT m.doc_id,
       |  (m.n_tokens >= 20 AND m.n_tokens <= 100000
       |   AND m.mean_word_len >= 3.0 AND m.mean_word_len <= 10.0
       |   AND m.top_unigram_ratio <= 0.15 AND m.dup_2gram_ratio <= 0.05)
       |    AS quality_ok
       |  FROM m)
       |SELECT q.doc_id, r.affinity, q.quality_ok,
       |  (coalesce(r.affinity >= 1.0, false) AND q.quality_ok) AS admitted
       |FROM q JOIN flag USING (doc_id) LEFT JOIN r USING (doc_id)
       |WHERE NOT is_target
       |ORDER BY q.doc_id""".stripMargin

  /** Per-source mixture weights: the up/down-sampling factor per domain that
    * hits a uniform token share across sources — the domain-mixing step a
    * pipeline runs before interleaving corpora. One combinable agg over the
    * corpus; the 20-row per-source table is pinned and self-joined against
    * its own 1-row totals (at 100 TB the corpus is scanned ONCE). [SQL] */
  val mixWeights: Q = (s, dir) => {
    val per = Tables.documents(s, dir).groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFns.tokenCount(col("text")).cast("long")).as("n_tokens"))
      .localCheckpoint()
    val tot = per.agg(sum("n_tokens").as("tot_tokens"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("tot_tokens").cast("double"),
          6).as("token_share"),
        round(col("tot_tokens").cast("double") /
            (col("n_sources").cast("double") * col("n_tokens").cast("double")),
          6).as("uniform_weight"))
      .orderBy("source")
  }

  val mixWeightsSql: String = {
    val ws = """'\s+'"""
    s"""WITH per AS (SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(regexp_split_to_array(text, $ws))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT sum(n_tokens) AS tot_tokens, count(*) AS n_sources FROM per)
       |SELECT source, n_docs, n_tokens,
       |  round(CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE), 6)
       |    AS token_share,
       |  round(CAST(tot_tokens AS DOUBLE) /
       |    (CAST(n_sources AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6)
       |    AS uniform_weight
       |FROM per CROSS JOIN tot ORDER BY source""".stripMargin
  }

  /** Deterministic SKEWED planted-cluster corpus for the semantic-mixing
    * query: the same 20 well-separated centers as [[plantedClusters]], but
    * per-center membership 6 + (center % 4)·10 (sizes 6/16/26/36 incl. the
    * center row) — a balanced planting would make every temperature weight
    * collapse to 1/k and the mixing math would never be exercised. The copy
    * arithmetic (copy_id = center·1000 + j, ids offset by 1e7) is exactly
    * SQL-replayable, which is what lets [[mixClusterWeights]]' oracle be
    * EXACT rather than a recall verdict. */
  private val plantedSkewMemo = new graft.SessionMemo[DataFrame]
  private def plantedClustersSkewed(s: SparkSession, dir: String): DataFrame =
    plantedSkewMemo.getOrBuild(s, dir) {
      val centers = Tables.embeddings(s, dir).filter(col("vec_id") < 20)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      val copies = centers
        .crossJoin(broadcast(s.range(1, 36).select(col("id").as("j"))))
        .filter(col("j") <= lit(5L) + pmod(col("vec_id"), lit(4L)) * 10L)
        .select((col("vec_id") * 1000 + col("j")).as("copy_id"),
          col("embedding"))
        .select((col("copy_id") + 10000000L).as("vec_id"),
          graft.functions.VecFns.addPseudoNoise(col("embedding"),
            col("copy_id"), lit(0.15)).as("embedding"))
      centers.unionByName(copies).localCheckpoint()
    }

  /** Semantic cluster-balanced mixture weights — the embedding-space twin of
    * [[mixWeights]] (per-SOURCE mixing): cluster the corpus by embedding
    * (k-means, the IVF coarse trainer), then compute each semantic cluster's
    * document share and its TEMPERATURE-scaled sampling weight
    * w_c ∝ √n_c (the α=0.5 multinomial smoothing of Lample & Conneau 2019
    * §3.1 — upweights rare topics without letting a huge cluster dominate).
    * √ is IEEE-correctly-rounded (unlike log/exp), and the 20-term
    * normalizer is an order-pinned fold, so the weight chain hash-matches.
    *
    * The oracle is EXACT, not a recall verdict: on the skewed planting the
    * trained clustering must recover the planted partition as a bijection —
    * pinned by `n_clusters` (k-means clusters per planted center) = 1 and
    * `pure` (no k-means cluster spans two centers) = TRUE — and then every
    * count, share, and weight is SQL arithmetic over the planted sizes.
    * Scale shape: centroids are model-sized driver state broadcast into a
    * codegen'd expression; assignment + counts are one combinable agg pass;
    * nothing all-pairs. [SQL] */
  val mixClusterWeights: Q = (s, dir) => {
    val corpus = plantedClustersSkewed(s, dir)
    val cents = graft.ml.KMeansQuantizer.fit(corpus, "vec_id", "embedding",
      k = 20, iters = 3, seed = 42L)
    val assigned = corpus.select(
        element_at(graft.expressions.NearestCentroids.column(
          col("embedding").cast("array<double>"), cents, 1), 1).as("cl"),
        when(col("vec_id") < 10000000L, col("vec_id"))
          .otherwise(expr("CAST((vec_id - 10000000) DIV 1000 AS BIGINT)"))
          .as("center_id"))
    val perPair = assigned.groupBy("cl", "center_id")
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val clPure = perPair.groupBy("cl")
      .agg(countDistinct("center_id").as("nc"))
      .agg(max("nc").as("max_centers_per_cluster"))
    val byCenter = perPair.groupBy("center_id").agg(
      sum("n").as("n_docs"), countDistinct("cl").as("n_clusters"))
    val tot = byCenter.agg(sum("n_docs").as("total"))
    val z = byCenter.agg(aggregate(
      sort_array(collect_list(struct(col("center_id"),
        sqrt(col("n_docs").cast("double")).as("sq")))),
      lit(0.0), (a, x) => a + x.getField("sq")).as("zsum"))
    byCenter.crossJoin(broadcast(tot)).crossJoin(broadcast(z))
      .crossJoin(broadcast(clPure))
      .select(col("center_id"), col("n_docs"), col("n_clusters"),
        (col("max_centers_per_cluster") === 1).as("pure"),
        round(col("n_docs").cast("double") / col("total").cast("double"), 6)
          .as("share"),
        round(sqrt(col("n_docs").cast("double")) / col("zsum"), 6)
          .as("mix_weight"))
      .orderBy("center_id")
  }

  /** DuckDB twin of [[mixClusterWeights]]: the planted sizes in closed form,
    * the same √-temperature chain, the bijection pins as literals — any
    * clustering failure breaks them (or the counts) and the hash catches
    * it. */
  val mixClusterWeightsSql: String =
    s"""WITH c AS (SELECT vec_id AS center_id FROM embeddings WHERE vec_id < 20),
       |n AS (SELECT center_id,
       |    CAST(6 + (center_id % 4) * 10 AS BIGINT) AS n_docs FROM c),
       |tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total FROM n),
       |sq AS (SELECT center_id, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS sq
       |  FROM n),
       |z AS (SELECT list_reduce(list(sq ORDER BY center_id), (a, x) -> a + x)
       |    AS zsum FROM sq)
       |SELECT center_id, n_docs, CAST(1 AS BIGINT) AS n_clusters, TRUE AS pure,
       |  round(CAST(n_docs AS DOUBLE) / total, 6) AS share,
       |  round(sq / zsum, 6) AS mix_weight
       |FROM sq CROSS JOIN tot CROSS JOIN z ORDER BY center_id""".stripMargin

  /** End-to-end training-data preparation — the full prep DAG as ONE query,
    * proving the operator suite composes: Gopher/C4 quality gate → near-dup
    * drop (cluster non-canonicals keep only the min-id representative) →
    * benchmark decontamination → token-budget packing of the survivors into
    * 512-token blocks. One row per training candidate (doc_id ≥ 10) with its
    * full disposition; bin_id is null for dropped docs. Each stage is the
    * SAME operator the standalone queries run (memoized pair graph included),
    * so this is composition, not re-implementation. [SQL — the component
    * twins nested as subqueries and stitched]. */
  val pipelinePrep: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).filter(col("doc_id") >= 10)
    val quality = textQuality(s, dir).select("doc_id", "quality_ok")
    val dups = dedupClusters(s, dir)
      .select(col("doc_id"), (col("cluster_id") =!= col("doc_id")).as("dup0"))
    val contam = decontamOverlap(s, dir)
      .select(col("doc_id"), lit(true).as("cont0"))
    val flagged = docs
      .select(col("doc_id"),
        TextFns.tokenCount(col("text")).cast("long").as("n_toks"))
      .join(quality, Seq("doc_id"))
      .join(dups, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"), col("quality_ok"),
        coalesce(col("dup0"), lit(false)).as("is_dup"),
        coalesce(col("cont0"), lit(false)).as("contaminated"))
      .withColumn("keep",
        col("quality_ok") && !col("is_dup") && !col("contaminated"))
      .localCheckpoint() // two consumers: the packed survivors + the final join
    val packed = graft.operators.Pack.packByBudget(
        flagged.filter(col("keep")).select("doc_id", "n_toks"),
        "doc_id", "n_toks", budget = 512L)
      .select(col("doc_id"), col("bin_id"))
    flagged.join(packed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks").as("n_tokens"), col("quality_ok"),
        col("is_dup"), col("contaminated"), col("keep"), col("bin_id"))
      .orderBy("doc_id")
  }

  val pipelinePrepSql: String = {
    val ws = """'\s+'"""
    s"""SELECT f.doc_id, f.n_tokens, f.quality_ok, f.is_dup, f.contaminated,
       |  (f.quality_ok AND NOT f.is_dup AND NOT f.contaminated) AS keep,
       |  p.prev // 512 AS bin_id
       |FROM (
       |  SELECT b.doc_id, b.n_tokens, q.quality_ok,
       |    coalesce(cl.cluster_id <> b.doc_id, FALSE) AS is_dup,
       |    (dc.doc_id IS NOT NULL) AS contaminated
       |  FROM (SELECT doc_id,
       |      CAST(len(regexp_split_to_array(text, $ws)) AS BIGINT) AS n_tokens
       |    FROM documents WHERE doc_id >= 10) b
       |  JOIN (SELECT doc_id, quality_ok FROM ($textQualitySql)) q USING (doc_id)
       |  LEFT JOIN (SELECT doc_id, cluster_id FROM ($dedupClustersSql)) cl
       |    ON cl.doc_id = b.doc_id
       |  LEFT JOIN (SELECT doc_id FROM ($decontamOverlapSql)) dc
       |    ON dc.doc_id = b.doc_id) f
       |LEFT JOIN (
       |  SELECT doc_id, CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
       |  FROM (
       |    SELECT b.doc_id, b.n_tokens
       |    FROM (SELECT doc_id,
       |        CAST(len(regexp_split_to_array(text, $ws)) AS BIGINT) AS n_tokens
       |      FROM documents WHERE doc_id >= 10) b
       |    JOIN (SELECT doc_id, quality_ok FROM ($textQualitySql)) q USING (doc_id)
       |    LEFT JOIN (SELECT doc_id, cluster_id FROM ($dedupClustersSql)) cl
       |      ON cl.doc_id = b.doc_id
       |    LEFT JOIN (SELECT doc_id FROM ($decontamOverlapSql)) dc
       |      ON dc.doc_id = b.doc_id
       |    WHERE q.quality_ok AND NOT coalesce(cl.cluster_id <> b.doc_id, FALSE)
       |      AND dc.doc_id IS NULL) k) p
       |  ON p.doc_id = f.doc_id
       |ORDER BY f.doc_id""".stripMargin
  }

  // ---- Skew toolkit, oracled (salting must be RESULT-invisible) -------------

  /** Salted fact⋈dim join + aggregate: the salted plan must produce results
    * hash-identical to the plain join the oracle runs — salting is a physical
    * rewrite, invisible in the output. Uses the hot-key-only form
    * ([[graft.operators.Skew.saltedJoinSkewed]]): orderkeys with ≥ 5 line
    * rows are salted over 8 buckets, the rest join untouched — so the oracle
    * exercises BOTH the salted and the pass-through path in one result (the
    * explicit fallback for skew AQE can't re-plan, e.g. a replicated build
    * side). [SQL — plain join]. */
  val skewSaltedJoin: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey").as("okey"),
      col("l_quantity"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey").as("okey"),
      col("o_orderpriority"))
    graft.operators.Skew.saltedJoinSkewed(li, ord, Seq("okey"),
        numSalts = 8, hotThreshold = 5L)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy("o_orderpriority")
  }

  val skewSaltedJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS qty
      |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Salted exact distinct-count: the two-stage (key, hash(value)%salts)
    * pre-aggregation must equal a plain COUNT(DISTINCT) — each distinct value
    * lands in exactly one salt bucket, so the per-bucket counts sum exactly.
    * [SQL — plain count distinct]. */
  val skewDistinctCount: Q = (s, dir) =>
    graft.operators.Skew.saltedDistinctCount(Tables.lineitem(s, dir),
        Seq("l_returnflag"), "l_partkey", numSalts = 8)
      .orderBy("l_returnflag")

  val skewDistinctCountSql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_distinct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- Bucketed layout: co-located join + agg, oracled --------------------

  /** Fact⋈fact join over bucketed copies of lineitem/orders (see
    * [[graft.sources.Bucketed]]): the per-order aggregation AND the
    * orderkey join both run on bucket-aligned splits — no Exchange, no Sort
    * before the merge join (pinned in PlanSpec); the only shuffle left is
    * the 3-row status rollup. The write-once/join-free-forever layout is THE
    * 100 TB answer for a fact table joined on its key every day; results
    * must be hash-identical to the plain join the oracle runs. [SQL]. */
  val bucketedJoin: Q = (s, dir) => {
    val li = graft.sources.Bucketed.read(s, dir, "lineitem",
      Seq("l_orderkey"), numBuckets = 8)
    val ord = graft.sources.Bucketed.read(s, dir, "orders",
      Seq("o_orderkey"), numBuckets = 8)
    val perOrder = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("qty"))
    perOrder.join(ord, perOrder("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("qty"), 2).as("total_qty"),
        round(avg("n_lines"), 4).as("avg_lines"))
      .orderBy("o_orderstatus")
  }

  /** Z-order sort key over (partkey, suppkey) ([[graft.sources.Layout]]):
    * first 20 lineitem rows in Morton order. The z-value IS the clustered
    * layout's sort key — checking it bit-for-bit against the same
    * mask-and-shift arithmetic in DuckDB pins the interleave the
    * file-skipping layout depends on. [SQL — spread-bits replay]. */
  val layoutZorder: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        graft.sources.Layout.zorder(col("l_partkey"), col("l_suppkey")).as("z"))
      .orderBy("z", "l_orderkey", "l_linenumber")
      .limit(20)

  val layoutZorderSql: String = {
    def spread(in: String): String = {
      val steps = Seq((16, "281470681808895"), (8, "71777214294589695"),
        (4, "1085102592571150095"), (2, "3689348814741910323"),
        (1, "6148914691236517205"))
      steps.foldLeft(s"(CAST($in AS BIGINT) & 2147483647)") {
        case (e, (sh, m)) => s"((($e | ($e << $sh)) & $m))"
      }
    }
    s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       |  l_partkey, l_suppkey,
       |  (${spread("l_partkey")} | (${spread("l_suppkey")} << 1)) AS z
       |FROM lineitem
       |ORDER BY z, l_orderkey, l_linenumber LIMIT 20""".stripMargin
  }

  /** Footer-only table stats ([[graft.sources.Stats]]): count + key ranges
    * answered from parquet metadata via V2 aggregate pushdown — the "what's
    * in this 100 TB table" query that must never cost a scan. [SQL]. */
  val tableStats: Q = (s, dir) =>
    graft.sources.Stats.tableStats(s, dir, "lineitem",
      Seq("l_orderkey", "l_quantity"))

  val tableStatsSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  min(l_orderkey) AS min_l_orderkey, max(l_orderkey) AS max_l_orderkey,
      |  min(l_quantity) AS min_l_quantity, max(l_quantity) AS max_l_quantity
      |FROM lineitem""".stripMargin

  val bucketedJoinSql: String =
    """WITH per AS (
      |  SELECT l_orderkey, count(*) AS n_lines, sum(l_quantity) AS qty
      |  FROM lineitem GROUP BY 1)
      |SELECT o_orderstatus, count(*) AS n_orders,
      |  round(sum(qty), 2) AS total_qty, round(avg(n_lines), 4) AS avg_lines
      |FROM per JOIN orders ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Per-source corpus health: the one-page summary a curator pulls before
    * mixing — doc/token counts, quality pass rate, near-dup rate, language
    * spread per source. Pure composition of already-oracled signals (the
    * quality gate, the memoized cluster labels) over one corpus scan each;
    * every column is an integer count, so the oracle is exact by
    * construction. [SQL — component twins stitched]. */
  val corpusHealth: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        TextFns.tokenCount(col("text")).cast("long").as("n_toks"))
    val quality = textQuality(s, dir).select("doc_id", "quality_ok")
    val dups = dedupClusters(s, dir)
      .select(col("doc_id"), (col("cluster_id") =!= col("doc_id")).as("is_dup"))
    docs.join(quality, Seq("doc_id"))
      .join(dups, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        sum(col("quality_ok").cast("long")).as("n_quality_ok"),
        sum(coalesce(col("is_dup"), lit(false)).cast("long")).as("n_dups"),
        countDistinct("lang").as("n_langs"))
      .orderBy("source")
  }

  val corpusHealthSql: String = {
    val ws = """'\s+'"""
    s"""SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
       |  CAST(sum(CASE WHEN coalesce(cluster_id <> doc_id, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
       |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
       |FROM (SELECT doc_id, source, lang,
       |    CAST(len(regexp_split_to_array(text, $ws)) AS BIGINT) AS n_toks
       |  FROM documents) b
       |JOIN (SELECT doc_id, quality_ok FROM ($textQualitySql)) q USING (doc_id)
       |LEFT JOIN (SELECT doc_id, cluster_id FROM ($dedupClustersSql)) cl USING (doc_id)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "pipeline_prep" -> pipelinePrep,
    "corpus_health" -> corpusHealth,
    "skew_salted_join" -> skewSaltedJoin,
    "skew_distinct_count" -> skewDistinctCount,
    "bucketed_join" -> bucketedJoin,
    "layout_zorder" -> layoutZorder,
    "table_stats" -> tableStats,
    "decontam_overlap" -> decontamOverlap,
    "decontam_fuzzy" -> decontamFuzzy,
    "text_pii" -> textPii,
    "text_tfidf" -> textTfidf,
    "text_bm25_topk" -> bm25TopK,
    "text_bm25_stored" -> bm25Stored,
    "text_bm25_appended" -> bm25Appended,
    "bpe_tokenize" -> bpeTokenize,
    "bpe_tokenize_stored" -> bpeTokenizeStored,
    "lm_fluency" -> lmFluency,
    "lm_fluency_stored" -> lmFluencyStored,
    "lm_fluency_appended" -> lmFluencyAppended,
    "quality_ppl_buckets" -> pplBuckets,
    "export_curriculum" -> exportCurriculum,
    "corpus_card" -> corpusCard,
    "text_unigram_score" -> textUnigramScore,
    "dsir_select" -> dsirSelect,
    "gate_admission" -> gateAdmission,
    "sketch_heavy_hitters" -> sketchHeavyHitters,
    "sketch_distinct" -> sketchDistinct,
    "dedup_span_fraction" -> dedupSpanFraction,
    "dedup_span_removal" -> dedupSpanRemoval,
    "mix_weights" -> mixWeights,
    "mix_cluster_weights" -> mixClusterWeights,
    "corpus_build_ccnet" -> corpusBuildCcnet,
    "mix_sample" -> mixSample,
    "mix_token_fill" -> mixTokenFill,
    "dedup_exact" -> dedupExact,
    "dedup_fingerprint" -> dedupFingerprint,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_cross_source_matrix" -> dedupCrossSourceMatrix,
    "dedup_simhash" -> dedupSimhash,
    "dedup_simhash_capped" -> dedupSimhashCapped,
    "dedup_delta_minhash" -> dedupDeltaMinhash,
    "dedup_delta_minhash_capped" -> dedupDeltaMinhashCapped,
    "store_fsck" -> storeFsck,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_clusters" -> dedupClusters,
    "dedup_best_of_cluster" -> dedupBestOfCluster,
    "dedup_keep_best" -> dedupKeepBest,
    "corpus_build" -> corpusBuild,
    "dedup_embedding" -> dedupEmbedding,
    "dedup_embedding_banded" -> dedupEmbeddingBanded,
    "dedup_embedding_banded_depth" -> dedupEmbeddingBandedDepth,
    "dedup_semantic" -> dedupSemantic,
    "sim_brute_topk" -> simBruteTopK,
    "sim_lsh_topk" -> simLshTopK,
    "sim_ivf_topk" -> simIvfTopK,
    "sim_pq_topk" -> simPqTopK,
    "sim_ivf_trained_recall" -> simIvfTrainedRecall,
    "sim_pq_trained_recall" -> simPqTrainedRecall,
    "sim_ivf_index_recall" -> simIvfIndexRecall,
    "sim_ivfpq_index_recall" -> simIvfPqIndexRecall,
    "sim_rp_topk" -> simRpTopK,
    "text_stats" -> textStats,
    "text_langid" -> textLangId,
    "text_quality" -> textQuality,
    "quality_classifier" -> qualityClassifier,
    "quality_quantiles" -> qualityQuantiles,
    "pack_sequences" -> packSequences,
    "pack_bpe_sequences" -> packBpeSequences,
    "pack_length_buckets" -> packLengthBuckets,
    "pack_bucketed_bpe" -> packBucketedBpe,
    "export_shuffle" -> exportShuffle,
    "chunk_windows" -> chunkWindows,
    "chunk_dedup" -> chunkDedup,
    "sample_stratified" -> sampleStratified,
    "sample_weighted" -> sampleWeighted,
    "corpus_diversity" -> corpusDiversity,
    "corpus_diversity_hll" -> corpusDiversityHll,
    "drift_ddm" -> driftDdm)

  val oracles: Map[String, String] = Map(
    "pipeline_prep" -> pipelinePrepSql,
    "corpus_health" -> corpusHealthSql,
    "skew_salted_join" -> skewSaltedJoinSql,
    "skew_distinct_count" -> skewDistinctCountSql,
    "bucketed_join" -> bucketedJoinSql,
    "layout_zorder" -> layoutZorderSql,
    "table_stats" -> tableStatsSql,
    "decontam_overlap" -> decontamOverlapSql,
    "decontam_fuzzy" -> decontamFuzzySql,
    "text_pii" -> textPiiSql,
    "text_tfidf" -> textTfidfSql,
    "text_bm25_topk" -> bm25TopKSql,
    "text_bm25_stored" -> bm25TopKSql,
    "text_bm25_appended" -> bm25TopKSql,
    "bpe_tokenize" -> bpeTokenizeSql,
    "bpe_tokenize_stored" -> bpeTokenizeSql,
    "lm_fluency" -> lmFluencySql,
    "lm_fluency_stored" -> lmFluencySql,
    "lm_fluency_appended" -> lmFluencySql,
    "quality_ppl_buckets" -> pplBucketsSql,
    "export_curriculum" -> exportCurriculumSql,
    "corpus_card" -> corpusCardSql,
    "text_unigram_score" -> textUnigramScoreSql,
    "dsir_select" -> dsirSelectSql,
    "gate_admission" -> gateAdmissionSql,
    "sketch_heavy_hitters" -> sketchHeavyHittersSql,
    "sketch_distinct" -> sketchDistinctSql,
    "dedup_span_fraction" -> dedupSpanFractionSql,
    "dedup_span_removal" -> dedupSpanRemovalSql,
    "mix_weights" -> mixWeightsSql,
    "mix_cluster_weights" -> mixClusterWeightsSql,
    "corpus_build_ccnet" -> corpusBuildCcnetSql,
    "mix_sample" -> mixSampleSql,
    "mix_token_fill" -> mixTokenFillSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_fingerprint" -> dedupFingerprintSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_clusters" -> dedupClustersSql,
    "dedup_best_of_cluster" -> dedupBestOfClusterSql,
    "dedup_keep_best" -> dedupKeepBestSql,
    "corpus_build" -> corpusBuildSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_simhash_capped" -> dedupSimhashCappedSql,
    "dedup_delta_minhash" -> dedupDeltaMinhashSql,
    "dedup_delta_minhash_capped" -> dedupDeltaMinhashCappedSql,
    "store_fsck" -> storeFsckSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_cross_source_matrix" -> dedupCrossSourceMatrixSql,
    "dedup_embedding" -> dedupEmbeddingSql,
    "dedup_embedding_banded" -> dedupEmbeddingBandedSql,
    "dedup_embedding_banded_depth" -> dedupEmbeddingBandedDepthSql,
    "dedup_semantic" -> dedupSemanticSql,
    "sim_brute_topk" -> simBruteSql,
    "sim_lsh_topk" -> simLshSql,
    "sim_ivf_topk" -> simIvfSql,
    "sim_pq_topk" -> simPqSql,
    "sim_ivf_trained_recall" -> simTrainedRecallSql,
    "sim_pq_trained_recall" -> simTrainedRecallSql,
    "sim_ivf_index_recall" -> simTrainedRecallSql,
    "sim_ivfpq_index_recall" -> simTrainedRecallSql,
    "sim_rp_topk" -> simTrainedRecallSql,
    "text_stats" -> textStatsSql,
    "text_langid" -> textLangIdSql,
    "text_quality" -> textQualitySql,
    "quality_classifier" -> qualityClassifierSql,
    "quality_quantiles" -> qualityQuantilesSql,
    "pack_sequences" -> packSequencesSql,
    "pack_bpe_sequences" -> packBpeSequencesSql,
    "pack_length_buckets" -> packLengthBucketsSql,
    "pack_bucketed_bpe" -> packBucketedBpeSql,
    "export_shuffle" -> exportShuffleSql,
    "chunk_windows" -> chunkWindowsSql,
    "chunk_dedup" -> chunkDedupSql,
    "sample_stratified" -> sampleStratifiedSql,
    "sample_weighted" -> sampleWeightedSql,
    "corpus_diversity" -> corpusDiversitySql,
    "corpus_diversity_hll" -> corpusDiversityHllSql,
    "drift_ddm" -> Duck.ddmRecursive(
      s"SELECT CAST(batch_id AS BIGINT) AS ord, 1.0 - accuracy AS err " +
        s"FROM ${Corpus.accSub} a", "batch_id"))
}
