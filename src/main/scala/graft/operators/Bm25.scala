package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** BM25 scored retrieval: rank documents against a small query set with the
  * Okapi BM25 weighting (Robertson & Walker, SIGIR '94 — public method;
  * engine extension: the data-curation use is decontamination triage and
  * targeted corpus probes, neither of which the reference pipeline has).
  *
  * Shape (the inverted-index probe, not a corpus × queries product): the
  * corpus is tokenized ONCE; the (doc, word, tf) table is probed by a
  * BROADCAST of the query-term list, so only postings whose word occurs in
  * some query survive past the probe; df stats and the two corpus scalars
  * (N, total tokens) ride as broadcasts; the per-query ranking is the
  * bounded [[TopK.topKPerQuery]] aggregate (≤ k docs per query per map
  * partition — never a window over every scored posting). The only
  * corpus-sized shuffle is the (doc, word) tf aggregation, which is
  * partial+final. At 100 TB: one scan, one narrow shuffle, broadcast probes.
  * For REPEATED probes against a static corpus, [[Bm25Store]] persists the
  * postings/df/scalars so each probe skips the tokenize+aggregate passes
  * entirely.
  *
  * Oracle-exact arithmetic: idf is the rational surrogate
  * (2·(N−df)+1)/(2·df+1) — the BM25 idf ratio (N−df+0.5)/(df+0.5) cleared of
  * halves, ONE exact integer product per side and one IEEE division — rather
  * than the paper's log of it: libm `ln` is not correctly-rounded-portable
  * across engines and would poison the hash compare (the
  * [[graft.queries.Pipelines.textTfidf]] precedent; ranking per term is
  * order-isomorphic, cross-term sums weight large-idf terms more than the
  * log does — documented divergence, same spirit as the reference's own
  * surrogate choices). The per-(query, doc) score is an ORDER-PINNED fold
  * over the matched terms sorted by word (the
  * [[graft.queries.Pipelines.lmFluency]] device: IEEE `0.0 + x == x`, so
  * DuckDB's init-less `list_reduce` over the same ordered list is
  * bit-identical), and ranking happens on the ROUNDED score with doc-id
  * tie-break so both engines rank identical keys.
  */
object Bm25 {

  /** One tokenize pass: (doc_id, word) rows, empty tokens dropped — the
    * shared dialect of the inline probe and the [[Bm25Store]] seed. */
  private[operators] def docWords(docs: DataFrame, idCol: String,
                                  textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFns.words(TextFns.cleanText(col(textCol),
          removePunctuation = true))).as("word"))
      .filter(length(col("word")) > 0)

  /** The query-term probe frame: (qid, word), whitespace-split verbatim. */
  private[graft] def qtermsOf(spark: SparkSession,
                                  queries: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    queries.toDF("qid", "qtext")
      .select(col("qid"), explode(split(col("qtext"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
  }

  /** [[qtermsOf]]'s rows computed ON THE DRIVER — the probe queries are
    * caller-typed literals (a handful of strings), so tokenizing them
    * through a Spark job (checkpoint + two collects in the stored probe)
    * spends three scheduler round-trips on ~10 rows. Spark's
    * `split(c, " ")` is Java regex split on the literal space with
    * trailing-empty drop differences erased by the nonEmpty filter, so
    * this is the same row set (pinned in Bm25Spec). */
  private[graft] def qtermRows(
      queries: Seq[(Long, String)]): Seq[(Long, String)] =
    queries.flatMap { case (q, t) =>
      t.split(" ").filter(_.nonEmpty).map(q -> _)
    }.distinct

  /** Shared scoring tail over the matched-postings frame
    * (qid, doc_id, word, tf, df, dlen, n_docs, n_tok) — the IDENTICAL
    * expression trees for the inline and stored paths, so both hash-match
    * the one DuckDB twin. */
  private[operators] def rank(matched: DataFrame, k: Int, k1: Double,
                              b: Double): DataFrame = {
    val k1c = lit(k1); val bc = lit(b)
    val c0 = matched.select(col("qid"), col("doc_id"), col("word"),
      (((col("n_docs") - col("df")).cast("double") * 2.0 + 1.0) /
        (col("df").cast("double") * 2.0 + 1.0)).as("idf"),
      (k1c * ((lit(1.0) - bc) + bc *
        (col("dlen").cast("double") /
          (col("n_tok").cast("double") / col("n_docs").cast("double")))))
        .as("nrm"),
      col("tf").cast("double").as("tfd"))
    val c1 = c0.select(col("qid"), col("doc_id"), col("word"),
      (col("idf") * (col("tfd") * (k1c + lit(1.0))) /
        (col("tfd") + col("nrm"))).as("contrib"))
    val perQd = c1.groupBy("qid", "doc_id").agg(
        aggregate(sort_array(collect_list(struct(col("word"), col("contrib")))),
          lit(0.0), (acc, x) => acc + x.getField("contrib")).as("sc0"))
      .select(col("qid"), col("doc_id"), round(col("sc0"), 6).as("bm25"))
    TopK.topKPerQuery(
        perQd.select(col("qid"), col("doc_id").as("cid"), col("bm25").as("cos")), k)
      .select(col("qid"), col("cid").as("doc_id"), col("cos").as("bm25"),
        col("rk").cast("long").as("rk"))
  }

  /** Top-k docs per query. `queries`: (qid, qtext) literal pairs — qtext is
    * whitespace-tokenized verbatim (callers pass pre-normalized text).
    * Output: (qid, doc_id, bm25, rk), rk 1..k in (bm25 desc, doc_id asc)
    * order; docs sharing no term with a query never appear. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queries: Seq[(Long, String)], k: Int = 5,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    val words = docWords(docs, idCol, textCol)
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val dlen = words.groupBy("doc_id").agg(count(lit(1)).as("dlen"))
    // the two corpus scalars: N (all docs, empty included) and token total
    val scal = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(words.agg(count(lit(1)).as("n_tok")))
    // inverted-index probe: broadcast query terms prune the postings FIRST,
    // so the df/dlen joins and everything downstream see only matched rows
    val matched = tf.join(broadcast(qtermsOf(spark, queries)), Seq("word"))
      .join(dfreq, Seq("word"))
      .join(dlen, Seq("doc_id"))
      .crossJoin(broadcast(scal))
    rank(matched, k, k1, b)
  }
}
