package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a curated document set and an LM
  * training run: documents are concatenated in a deterministic order and
  * cut into fixed-capacity training sequences (the GPT-2/3 "concat and
  * chunk" recipe; reference corpora ship as exactly such fixed-length
  * rows). The output is a PLACEMENT TABLE, not the token stream itself:
  * one row per (document, sequence) overlap saying which slice of the
  * document lands where — `(doc_id, seq_id, doc_offset, seq_offset,
  * piece_len)`. Downstream writers join it against the tokenized text;
  * keeping placement separate from payload means the shuffle moves 5
  * integers per piece, never the tokens.
  *
  * Determinism contract (what the DuckDB oracle recomputes exactly):
  * documents are ordered by the salted md5 bucket ([[Sampling.hashBucket]],
  * ties by key), `before(d)` is the total token count of all earlier
  * documents, and document d occupies absolute token positions
  * [before, before+len) of the virtual concatenated stream; sequence s is
  * positions [s*capacity, (s+1)*capacity). Every derived column is integer
  * arithmetic on those quantities — a pure function of (corpus, salt,
  * capacity), identical across engines, partitionings and reruns.
  * Zero-token documents contribute nothing to the stream and are dropped.
  *
  * Scale shape: a naive running sum over the global concat order is ONE
  * window task — the exact serialization the bucketed token-budget form
  * exists to avoid. The same two-pass prefix sum is built in here
  * directly: the hash space splits into `ranges` monotone buckets, pass 1
  * sums within a bucket (no task sees more than ~1/ranges of the corpus),
  * pass 2 adds each bucket's carry-in offset from a `ranges`-row frame
  * that never leaves the broadcast tier. The explode stage emits
  * docs + totalTokens/capacity rows — linear in the input. */
object Packing {

  /** Placement table for packing `df`'s documents into `capacity`-token
    * sequences. Output: (keyCol, seq_id, doc_offset, seq_offset,
    * piece_len), one row per overlap, where doc_offset is the piece's
    * start within the document, seq_offset its start within the sequence,
    * and every sequence except the last is exactly full. */
  def packSequences(df: DataFrame, capacity: Long, salt: String,
      tokenCol: String = "ws_tokens", keyCol: String = "doc_id",
      ranges: Int = 64): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    // the two-pass prefix sum over the salted-hash concat order is the
    // shared [[Sampling.bucketedBefore]] (stratum-free form) — ONE copy
    // of the skew-proof machinery for both the token-budget and packing
    // contracts
    val placed = Sampling.bucketedBefore(
        df.select(col(keyCol), col(tokenCol).cast("long").as("__len"))
          .filter(col("__len") > 0),
        "__len", salt, keyCol, ranges, Nil)
      // the sequences document d overlaps: before div C .. (before+len-1)
      // div C — integer `div`, NOT `/` (which widens to double and loses
      // exactness past 2^52 absolute token positions)
      .withColumn("seq_id", explode(sequence(
        expr(s"__before div ${capacity}L"),
        expr(s"(__before + __len - 1) div ${capacity}L"))))
    val seqStart = col("seq_id") * capacity
    placed
      .withColumn("doc_offset", greatest(lit(0L), seqStart - col("__before")))
      .withColumn("seq_offset",
        greatest(col("__before"), seqStart) - seqStart)
      .withColumn("piece_len",
        least(col("__before") + col("__len"), seqStart + capacity) -
          greatest(col("__before"), seqStart))
      .select(col(keyCol), col("seq_id"), col("doc_offset"),
        col("seq_offset"), col("piece_len"))
  }

  /** Per-sequence fill audit over a placement table: piece count and
    * filled token count per sequence. Invariant (test-pinned): every
    * sequence except the highest seq_id is exactly full. */
  def packStats(placement: DataFrame, capacity: Long): DataFrame =
    placement.groupBy("seq_id")
      .agg(count(lit(1)).as("pieces"), sum("piece_len").as("filled"))
      .withColumn("full", col("filled") === capacity)
}
