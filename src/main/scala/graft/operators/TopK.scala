package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed per-group top-k (the similarity-search rank stage).
  *
  * The window formulation (`row_number().over(partitionBy(qid).orderBy(...))`)
  * shuffles EVERY scored (query, candidate) pair just to keep k of them —
  * at 100 TB the brute-force baseline would shuffle corpus×|Q| rows. This
  * typed `Aggregator` keeps a bounded (≤ k entries) sorted buffer per query
  * and merges buffers with the standard partial/final combine, so each map
  * partition ships at most k rows per query across the wire.
  *
  * Ordering contract: (score desc, id asc) — the exact `row_number` order of
  * the window it replaces; scores are compared as raw doubles, so results are
  * row-identical (the DuckDB oracle replays the same ranking).
  */
object TopK {

  /** Bounded buffer: parallel arrays sorted by (score desc, id asc), ≤ k rows. */
  case class Buf(ids: Array[Long], scores: Array[Double])

  class TopKAgg(k: Int)
      extends Aggregator[(Long, Long, Double), Buf, (Array[Long], Array[Double])] {
    require(k >= 1)

    def zero: Buf = Buf(Array.emptyLongArray, Array.emptyDoubleArray)

    /** (s1, id1) ranks strictly ahead of (s2, id2). Double.compare gives the
      * window's TOTAL order (NaN greatest, -0.0 < 0.0) — `>` on raw doubles
      * would silently rank NaN scores last instead of first and diverge from
      * the row_number formulation this aggregator replaces. */
    private def ahead(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && id1 < id2)
    }

    private def insert(b: Buf, id: Long, s: Double): Buf = {
      val len = b.ids.length
      if (len == k && !ahead(s, id, b.scores(len - 1), b.ids(len - 1))) return b
      var pos = 0
      while (pos < len && !ahead(s, id, b.scores(pos), b.ids(pos))) pos += 1
      val nlen = math.min(len + 1, k)
      val ids = new Array[Long](nlen)
      val scores = new Array[Double](nlen)
      System.arraycopy(b.ids, 0, ids, 0, pos)
      System.arraycopy(b.scores, 0, scores, 0, pos)
      ids(pos) = id; scores(pos) = s
      val tail = nlen - pos - 1
      System.arraycopy(b.ids, pos, ids, pos + 1, tail)
      System.arraycopy(b.scores, pos, scores, pos + 1, tail)
      Buf(ids, scores)
    }

    def reduce(b: Buf, row: (Long, Long, Double)): Buf = insert(b, row._2, row._3)

    def merge(a: Buf, b: Buf): Buf = {
      var r = a
      var i = 0
      while (i < b.ids.length) { r = insert(r, b.ids(i), b.scores(i)); i += 1 }
      r
    }

    def finish(b: Buf): (Array[Long], Array[Double]) = (b.ids, b.scores)

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[(Array[Long], Array[Double])] =
      Encoders.product[(Array[Long], Array[Double])]
  }

  /** Rank scored (qid, cid, cos) pairs to the top k per qid.
    * Output: (qid, cid, cos, rk) with rk 1..k in (cos desc, cid asc) order. */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(col("qid").cast("long"), col("cid").cast("long"),
        col("cos").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn.name("top"))
      .toDF("qid", "top")
      .select(col("qid"), col("top._1").as("cids"), col("top._2").as("coss"))
      .select(col("qid"), posexplode(arrays_zip(col("cids"), col("coss")))
        .as(Seq("pos", "hit")))
      .select(col("qid"), col("hit.cids").as("cid"), col("hit.coss").as("cos"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  /** Bounded buffer for [[TopKStrAgg]]: parallel arrays sorted by
    * (score desc, item asc), ≤ k rows. */
  case class StrBuf(items: Array[String], scores: Array[Double])

  /** [[TopKAgg]] with a STRING item and (score desc, item asc) order — the
    * per-document term-ranking variant (tf-idf top terms): the window it
    * replaces shuffled every scored (doc, term) row to sort each doc's whole
    * vocabulary; this ships ≤ k terms per doc per map partition. */
  class TopKStrAgg(k: Int)
      extends Aggregator[(Long, String, Double), StrBuf, (Array[String], Array[Double])] {
    require(k >= 1)

    def zero: StrBuf = StrBuf(Array.empty[String], Array.emptyDoubleArray)

    private def ahead(s1: Double, w1: String, s2: Double, w2: String): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && w1.compareTo(w2) < 0)
    }

    private def insert(b: StrBuf, w: String, s: Double): StrBuf = {
      val len = b.items.length
      if (len == k && !ahead(s, w, b.scores(len - 1), b.items(len - 1))) return b
      var pos = 0
      while (pos < len && !ahead(s, w, b.scores(pos), b.items(pos))) pos += 1
      val nlen = math.min(len + 1, k)
      val items = new Array[String](nlen)
      val scores = new Array[Double](nlen)
      System.arraycopy(b.items, 0, items, 0, pos)
      System.arraycopy(b.scores, 0, scores, 0, pos)
      items(pos) = w; scores(pos) = s
      val tail = nlen - pos - 1
      System.arraycopy(b.items, pos, items, pos + 1, tail)
      System.arraycopy(b.scores, pos, scores, pos + 1, tail)
      StrBuf(items, scores)
    }

    def reduce(b: StrBuf, row: (Long, String, Double)): StrBuf =
      insert(b, row._2, row._3)

    def merge(a: StrBuf, b: StrBuf): StrBuf = {
      var r = a
      var i = 0
      while (i < b.items.length) { r = insert(r, b.items(i), b.scores(i)); i += 1 }
      r
    }

    def finish(b: StrBuf): (Array[String], Array[Double]) = (b.items, b.scores)

    def bufferEncoder: Encoder[StrBuf] = Encoders.product[StrBuf]
    def outputEncoder: Encoder[(Array[String], Array[Double])] =
      Encoders.product[(Array[String], Array[Double])]
  }

  /** Rank scored (key, item, score) rows to the top k per key.
    * Output: (key, item, score, rk), rk 1..k in (score desc, item asc) order
    * — row-identical to `row_number().over(partitionBy(key)
    * .orderBy(score.desc, item))` + `filter(rk <= k)`. */
  def topKPerKeyStr(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(col("key").cast("long"), col("item").cast("string"),
        col("score").cast("double"))
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .agg(new TopKStrAgg(k).toColumn.name("top"))
      .toDF("key", "top")
      .select(col("key"), col("top._1").as("items"), col("top._2").as("scores"))
      .select(col("key"), posexplode(arrays_zip(col("items"), col("scores")))
        .as(Seq("pos", "hit")))
      .select(col("key"), col("hit.items").as("item"),
        col("hit.scores").as("score"), (col("pos") + 1).cast("int").as("rk"))
  }
}
