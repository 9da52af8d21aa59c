package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document's token stream into
  * fixed-size windows advanced by a stride (overlap = win - stride) — the
  * segmentation step that turns raw documents into model-context-sized
  * training rows (pre-training) or retrieval passages (RAG ingestion).
  * Window starts are 0, stride, 2·stride, … while they land inside the
  * document, so the final window may be short; a document shorter than one
  * window yields exactly one chunk.
  *
  * Scale design: chunking is a single narrow projection — per-row tokenize →
  * `posexplode` the start sequence → `slice` out each window. No shuffle, no
  * UDF (every step is a codegen'd built-in), and the token array stays inside
  * one projection so nothing wide crosses an exchange; output size is
  * input-tokens × (win / stride), the same blow-up any chunker pays. At
  * 100 TB the operator inherits the scan's partitioning untouched.
  * [SQL oracle: range(0, len, stride) + list slicing]. */
object Chunk {

  /** Tokens of `textCol`: whitespace split, empties dropped (same chain the
    * quality/dedup oracles replay in DuckDB). */
  private def toks(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => length(t) > 0)

  /** One row per (doc, window): `chunk_id` (0-based window index),
    * `start_tok` (0-based token offset), `n_chunk_tokens` (≤ win; short only
    * for the final window), `chunk_text` (the window re-joined with single
    * spaces).
    *
    * @param win    window size in tokens (≥ 1)
    * @param stride window start step in tokens (1 ≤ stride ≤ win; win −
    *               stride tokens of overlap between consecutive windows)
    */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
                   win: Int, stride: Int): DataFrame = {
    require(win >= 1, s"win must be >= 1, got $win")
    require(stride >= 1 && stride <= win,
      s"stride must be in [1, win=$win], got $stride")
    df.select(col(idCol), toks(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(stride))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_id"),
        col("col").cast("long").as("start_tok"),
        slice(col("toks"), col("col") + 1, lit(win)).as("ctoks"))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        size(col("ctoks")).cast("long").as("n_chunk_tokens"),
        array_join(col("ctoks"), " ").as("chunk_text"))
  }

  /** Duplicated-window report over [[chunkWindows]] output: groups of
    * identical `chunk_text` appearing more than once (the chunk-granularity
    * exact dedup a RAG ingestion or packed-corpus build runs so boilerplate
    * passages index once). One row per duplicated window text:
    * representative `doc_id` (the smallest holding it), `dups` (total
    * occurrences), `n_docs` (distinct documents it appears in).
    *
    * Scale design: same 8-byte-able groupBy as [[Dedup.exact]] — partial
    * aggregation map-side, only (text-key, counts) partials shuffle; at real
    * scale swap the group key for `xxhash64(chunk_text)` exactly as
    * [[Dedup.exactByFingerprint]] does. */
  def duplicatedChunks(chunks: DataFrame, idCol: String): DataFrame =
    chunks.groupBy("chunk_text")
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).as("dups"),
        countDistinct(col(idCol)).as("n_docs"))
      .filter(col("dups") > 1)
      .select(col(idCol), col("dups"), col("n_docs"), col("chunk_text"))
}
