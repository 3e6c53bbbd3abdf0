package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass lineage digest as a typed Aggregator (SURVEY.md §2.9/§4.3: the
  * UDAF extension point if metrics outgrow groupBy().agg()): counts + an
  * order-independent XOR of row hashes, mergeable across partitions —
  * the shape that scales to 10^12 rows (no sort, constant state). */
object LineageAgg {

  final case class LineageBuf(nTurns: Long, nContent: Long, digest: Long)
  final case class LineageRow(conv_id: String, turn_idx: Int, content: String)

  val aggregator: Aggregator[LineageRow, LineageBuf, LineageBuf] =
    new Aggregator[LineageRow, LineageBuf, LineageBuf] {
      override def zero: LineageBuf = LineageBuf(0L, 0L, 0L)
      override def reduce(b: LineageBuf, r: LineageRow): LineageBuf = {
        val h = graft.jobs.Synth.mix(
          graft.jobs.Synth.mix(r.conv_id.hashCode.toLong) ^ r.turn_idx.toLong) ^
          (if (r.content == null) 0L else graft.jobs.Synth.mix(r.content.hashCode.toLong))
        LineageBuf(b.nTurns + 1, b.nContent + (if (r.content == null) 0 else 1), b.digest ^ h)
      }
      override def merge(a: LineageBuf, b: LineageBuf): LineageBuf =
        LineageBuf(a.nTurns + b.nTurns, a.nContent + b.nContent, a.digest ^ b.digest)
      override def finish(b: LineageBuf): LineageBuf = b
      override def bufferEncoder: Encoder[LineageBuf] = Encoders.product[LineageBuf]
      override def outputEncoder: Encoder[LineageBuf] = Encoders.product[LineageBuf]
    }
}
