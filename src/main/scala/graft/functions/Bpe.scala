package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned byte-pair-encoding tokenizer (engine extension): tokenizer
  * TRAINING is itself a large-scale data-pipeline step — every LLM corpus
  * pipeline runs one — and the classic merge-learning algorithm (Sennrich et
  * al. 2015, public) has a natural Spark shape:
  *
  *  - the corpus-sized work is ONE distributed word-frequency aggregation
  *    (tokenize → groupBy word → count), exactly like `a1_word_count`;
  *  - the merge loop runs on the BOUNDED word-frequency table — the standard
  *    trainer shape (sentencepiece/HF both reduce to a word-freq table
  *    first). A frequency cutoff plus an explicit `maxWords` cap make the
  *    bound a CONTRACT, not an assumption (the Tsne pattern): at 100 TB the
  *    corpus pass stays distributed and the driver still only ever sees the
  *    capped vocabulary;
  *  - encoding broadcasts the merge ranks and runs as a narrow per-row map.
  *
  * Determinism: ties in pair frequency break lexicographically, so a
  * (corpus, merges, minCount) triple always learns the same merge sequence —
  * LearnabilitySpec-style exactness lives in BpeSpec (hand-computed merges),
  * and the oracled query uses the q15 verdict pattern (SQL replays the
  * per-source doc counts; compression + round-trip + vocab-size claims ride
  * as booleans pinned TRUE). */
object Bpe {

  /** merges in learned order; rank = position (lower merges first). */
  final case class Model(merges: Array[(String, String)]) extends Serializable {
    @transient lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Greedy BPE encode of one word: start from characters, repeatedly
      * apply the present pair with the LOWEST learned rank. The standard
      * inference loop — O(len²·log) worst case on tiny per-word lengths. */
    def encodeWord(w: String): Seq[String] = {
      if (w.isEmpty) return Seq.empty
      var syms = w.map(_.toString).toArray
      var done = false
      while (!done && syms.length > 1) {
        var best = Int.MaxValue; var bi = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) { best = r; bi = i }
          i += 1
        }
        if (bi < 0) done = true
        else {
          val merged = syms(bi) + syms(bi + 1)
          syms = (syms.take(bi) :+ merged) ++ syms.drop(bi + 2)
        }
      }
      syms.toSeq
    }

    /** Decode = concatenate — BPE is lossless by construction. */
    def decode(pieces: Seq[String]): String = pieces.mkString
  }

  /** Learn `numMerges` merges from the corpus. The distributed part is the
    * word-frequency aggregation; the driver sees at most `maxWords` (word,
    * freq) rows — enforced, not assumed. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L, maxWords: Int = 100000): Model = {
    val wordFreq = docs
      .select(explode(TextFns.normTokens(TextFns.cleanText(col(textCol),
        removePunctuation = true))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    // ONE corpus-scale pass: limit(maxWords+1) both enforces the contract
    // (a row count over the cap shows up as exactly maxWords+1 collected
    // rows) and collects the vocab — count()+collect() would run the full
    // scan/aggregation twice.
    val collected = wordFreq.limit(maxWords + 1).collect()
    require(collected.length <= maxWords,
      s"word-frequency table has > maxWords=$maxWords rows — raise minCount " +
        "(the merge loop is driver-side BY CONTRACT on a bounded vocab)")
    val vocab = collected
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
      .sortBy(_._1.mkString) // deterministic iteration order
    val merges = Array.newBuilder[(String, String)]
    var k = 0
    var active = vocab
    while (k < numMerges) {
      // count adjacent pairs weighted by word frequency
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      active.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) k = numMerges
      else {
        // max frequency; lexicographic tie-break → deterministic
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        active = active.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += merged; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), n)
          }
        }
        k += 1
      }
    }
    Model(merges.result())
  }

  /** Per-task memo cap for the encode caches below: bounds worker memory on
    * an unbounded-vocabulary corpus while still covering any realistic
    * task-local working set (a Zipf head of 64k distinct words). */
  private val EncodeCacheMax = 65536

  /** Per-WORD piece count — use over the same `explode(normTokens(clean))`
    * projection the trainer consumed, so train and encode tokenize
    * identically. Merge ranks ride as ONE broadcast into a narrow map (no
    * shuffle; the scan partitioning is preserved).
    *
    * The UDF closure carries a per-task memo (deserialized empty with each
    * task, single-threaded within it): token streams repeat words
    * Zipf-style (sf0.1: 270k tokens over 31 distinct words), so the BPE
    * merge loop runs once per DISTINCT word per task instead of once per
    * token — guide §4.5's amortize-heavy-work-per-task rule applied to a
    * deterministic function. Result-identical by determinism of
    * encodeWord; size-capped so a web-scale task's vocabulary tail cannot
    * grow the map unboundedly. */
  def pieceCountCol(model: org.apache.spark.broadcast.Broadcast[Model])
                   (word: Column): Column = {
    val f = udf {
      val cache = new java.util.HashMap[String, java.lang.Long]()
      (w0: String) => {
        val w = if (w0 == null) "" else w0
        var v = cache.get(w)
        if (v == null) {
          v = Long.box(model.value.encodeWord(w).length.toLong)
          if (cache.size < EncodeCacheMax) cache.put(w, v)
        }
        v.longValue()
      }
    }
    f(word)
  }

  /** Per-word round-trip check: decode(encode(w)) == w. Same per-task memo
    * as [[pieceCountCol]]. */
  def roundTripCol(model: org.apache.spark.broadcast.Broadcast[Model])
                  (word: Column): Column = {
    val f = udf {
      val cache = new java.util.HashMap[String, java.lang.Boolean]()
      (w0: String) => {
        val w = if (w0 == null) "" else w0
        var v = cache.get(w)
        if (v == null) {
          v = Boolean.box(model.value.decode(model.value.encodeWord(w)) == w)
          if (cache.size < EncodeCacheMax) cache.put(w, v)
        }
        v.booleanValue()
      }
    }
    f(word)
  }
}
