package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator (C8 UDAF surface): keeps at most k
  * (score, tag) pairs per group in a small sorted buffer.
  *
  * Scale rationale: per-group top-k via window row_number materializes
  * and sorts every row of every group after a full shuffle; this
  * aggregator is algebraic — partial buffers of size ≤ k combine
  * map-side, so only |groups|·k pairs cross the shuffle. For k=3 over
  * a power-law group (one customer with 10^8 orders), that is the
  * difference between shuffling 10^8 rows and 3.
  *
  * Ordering: score desc, tag asc — a total order, so results are
  * deterministic and SQL-oracle-comparable.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  override def zero: Seq[(Double, Long)] = Seq.empty

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (score, tag) => (-score, tag) }.take(k)

  override def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ row)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
