package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size token-window chunking with overlap — the RAG / embedding
  * preparation stage (LangChain/LlamaIndex "text splitter" semantics over
  * tokens; also the sliding-window form of LM evaluation). Map-only: each
  * document expands independently into its placement rows, so the operator
  * is embarrassingly parallel and the output is linear in total tokens /
  * stride — no shuffle at any scale.
  *
  * Contract (pinned by the x_chunk_windows oracle row):
  *  - tokens: lowercase `\W+` split, like the rest of the text family;
  *  - stride = size − overlap (> 0); chunk i starts at i·stride;
  *  - the LAST window is right-aligned (start = n − size) so every chunk
  *    except possibly a short single-chunk doc is exactly `size` tokens —
  *    the LM-eval convention (no tail fragment shorter than the overlap);
  *  - docs with ≤ size tokens yield ONE chunk of the whole doc; empty
  *    docs yield none;
  *  - nChunks = ceil((n − size) / stride) + 1 in exact integer arithmetic.
  */
object Chunking {

  def chunk(docs: DataFrame, size: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    docs
      .select(col(idCol).as("doc_id"),
        expr(s"filter(split(lower($textCol), '\\\\W+'), x -> x != '')")
          .as("_toks"))
      .withColumn("n", size1(col("_toks")))
      .filter(col("n") > 0)
      .withColumn("nchunks",
        when(col("n") <= size, lit(1L))
          .otherwise(expr(s"(n - $size + ${stride - 1}) div $stride + 1")))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("nchunks") - 1)))
      .withColumn("start_tok",
        when(col("n") <= size, lit(0L))
          .otherwise(least(col("chunk_id") * stride, col("n") - size)))
      .withColumn("n_tok", least(lit(size.toLong), col("n") - col("start_tok")))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tok"),
        expr("array_join(slice(_toks, cast(start_tok as int) + 1, " +
          "cast(n_tok as int)), ' ')").as("chunk_text"))
  }

  private def size1(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c).cast("long")
}
