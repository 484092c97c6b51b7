package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable buffer for [[TopKTags]]: an unordered scratch list compacted
  * to the k best whenever it outgrows 4k, so memory is O(k) regardless
  * of group size. */
final class TopKBuf(val items: ArrayBuffer[(Double, Long)])

/** Per-group top-k tags by score — `topk(score, tag, k)` for SQL
  * callers, with k a literal argument instead of a value baked in at
  * registration (the limitation of the [[TopKAggregator]] UDAF form,
  * which remains the typed-`Aggregator` tier demo used by q43; the two
  * implement the same (-score, tag) ordering and this one is
  * cross-checked against that one in EngineSpec).
  *
  * NULL scores/tags are skipped like every SQL aggregate — the typed
  * UDAF form crashes its (Double, Long) encoder on NULL input, which
  * is fine behind a typed Dataset but not for arbitrary spark.sql
  * data. Empty groups yield an empty array. Bounded O(k) state per
  * group (the property that lets only groups·k rows cross the
  * shuffle). */
case class TopKTags(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {

  require(k > 0, "topk: k must be positive")

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(ArrayBuffer.empty)

  private def compact(b: TopKBuf): Unit =
    if (b.items.length > k) {
      val best = b.items.sortBy { case (score, tag) => (-score, tag) }.take(k)
      b.items.clear()
      b.items ++= best
    }

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val s = left.eval(input)
    val t = right.eval(input)
    if (s != null && t != null) {
      b.items += ((s.asInstanceOf[Double], t.asInstanceOf[Long]))
      if (b.items.length > 4 * k) compact(b)
    }
    b
  }

  override def merge(b: TopKBuf, o: TopKBuf): TopKBuf = {
    b.items ++= o.items
    if (b.items.length > 4 * k) compact(b)
    b
  }

  override def eval(b: TopKBuf): Any = {
    // compact() caps size but leaves order arbitrary — the final sort
    // always runs (a ≤ k buffer may never have been compacted)
    val best = b.items.sortBy { case (score, tag) => (-score, tag) }.take(k)
    new GenericArrayData(best.map(_._2).toArray)
  }

  override def serialize(b: TopKBuf): Array[Byte] = {
    compact(b)
    val buf = ByteBuffer.allocate(4 + b.items.length * 16)
    buf.putInt(b.items.length)
    b.items.foreach { case (s, t) => buf.putDouble(s); buf.putLong(t) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val items = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { items += ((buf.getDouble(), buf.getLong())); i += 1 }
    new TopKBuf(items)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(off: Int): TopKTags =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKTags =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKTags =
    copy(left = l, right = r)
  override def prettyName: String = "topk"
}

object TopKTags {

  /** Registration builder: coerces score/tag to Double/Long with
    * explicit Casts (ExpectsInputTypes is private[sql], so implicit
    * coercion is not available to external expressions). */
  def forSql(score: Expression, tag: Expression, k: Expression): Expression =
    TopKTags(Cast(score, DoubleType), Cast(tag, LongType), literalK(k))
      .toAggregateExpression()

  /** SQL-registration parsing of the k argument: must be a foldable
    * non-null positive integer (same analysis-time contract as
    * token_set_count's word list / mod_filter's m and r). */
  def literalK(e: Expression): Int = {
    def fail(why: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" ->
          s"topk(score, tag, k): the k argument must be a $why (a positive integer literal like 3)"))
    if (!e.foldable) fail("literal, got a non-foldable expression")
    val k = e.eval() match {
      case null     => fail("non-null integer, got NULL")
      case i: Int   => i.toLong
      case l: Long  => l
      case s: Short => s.toLong
      case b: Byte  => b.toLong
      case other    => fail(s"integer, got ${other.getClass.getSimpleName}")
    }
    if (k <= 0 || k > Int.MaxValue) fail(s"positive integer, got $k")
    k.toInt
  }
}
