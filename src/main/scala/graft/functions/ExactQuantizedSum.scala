package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Mutable buffer for [[ExactQuantizedSum]]: a primitive long
  * accumulator of 10^-6-quantized values, escaping to BigInteger only
  * on overflow — the fast path is one addExact per row. */
final class QuantSumBuf(var acc: Long, var big: BigInteger, var nonEmpty: Boolean) {

  def add(v: Long): Unit = {
    nonEmpty = true
    if (big == null) {
      try acc = Math.addExact(acc, v)
      catch {
        case _: ArithmeticException =>
          big = BigInteger.valueOf(acc).add(BigInteger.valueOf(v))
          acc = 0L
      }
    } else big = big.add(BigInteger.valueOf(v))
  }

  def mergeWith(o: QuantSumBuf): Unit = {
    val wasEmpty = !nonEmpty && !o.nonEmpty
    if (o.big != null) { if (big == null) { big = BigInteger.valueOf(acc); acc = 0L }; big = big.add(o.big) }
    add(o.acc) // sets nonEmpty; undo below if both sides were empty
    if (wasEmpty) nonEmpty = false
  }

  def total: BigInteger =
    if (big == null) BigInteger.valueOf(acc) else big.add(BigInteger.valueOf(acc))
}

/** Exact order-insensitive SUM over 10^-6-quantized doubles as a
  * TypedImperativeAggregate (the mutable-buffer custom-aggregate tier
  * of C8, complementing the DeclarativeAggregate-style decimal path in
  * graft.Det).
  *
  * Each input is quantized to an integer number of millionths with the
  * same HALF_UP semantics as CAST(x AS DECIMAL(_,6)) (fast Math.round
  * when the scaled value fits double's exact-integer range, exact
  * BigDecimal quantization beyond), summed in a primitive long with a
  * BigInteger overflow escape, and finished as the correctly-rounded
  * double of the exact total — bit-identical to the DECIMAL(18,6)
  * formulation and to DuckDB's, at roughly plain-double-sum speed.
  */
case class ExactQuantizedSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantSumBuf] with UnaryLike[Expression] {

  private val Scale = 1000000L
  // |x|*1e6 below this is an exact double integer → Math.round is exact
  private val FastBound = 9.0e15

  override def createAggregationBuffer(): QuantSumBuf = new QuantSumBuf(0L, null, false)

  override def update(b: QuantSumBuf, input: InternalRow): QuantSumBuf = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      val scaled = x * 1e6
      if (scaled > -FastBound && scaled < FastBound) {
        // HALF_UP = round half AWAY FROM ZERO, like CAST(x AS DECIMAL).
        // Math.round alone rounds half toward +inf (-2.5 -> -2, wrong
        // for negatives); mirror through zero for the negative side.
        b.add(if (scaled >= 0) Math.round(scaled) else -Math.round(-scaled))
      } else
        // valueOf uses the double's shortest decimal form — the same
        // BigDecimal Spark's CAST(double AS DECIMAL) quantizes, unlike
        // new JBigDecimal(x)'s exact binary expansion
        b.add(JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP)
          .unscaledValue().longValueExact())
    }
    b
  }

  override def merge(b: QuantSumBuf, o: QuantSumBuf): QuantSumBuf = { b.mergeWith(o); b }

  override def eval(b: QuantSumBuf): Any =
    if (!b.nonEmpty) null
    else new JBigDecimal(b.total, 6).doubleValue()

  override def serialize(b: QuantSumBuf): Array[Byte] = {
    val bigBytes = if (b.big == null) Array.emptyByteArray else b.big.toByteArray
    val buf = ByteBuffer.allocate(8 + 1 + 4 + bigBytes.length)
    buf.putLong(b.acc)
    buf.put(if (b.nonEmpty) 1.toByte else 0.toByte)
    buf.putInt(bigBytes.length)
    buf.put(bigBytes)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantSumBuf = {
    val buf = ByteBuffer.wrap(bytes)
    val acc = buf.getLong()
    val nonEmpty = buf.get() == 1
    val len = buf.getInt()
    val big = if (len == 0) null else {
      val arr = new Array[Byte](len); buf.get(arr); new BigInteger(arr)
    }
    new QuantSumBuf(acc, big, nonEmpty)
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(off: Int): ExactQuantizedSum =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): ExactQuantizedSum =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(c: Expression): ExactQuantizedSum =
    copy(child = c)
  override def prettyName: String = "exact_qsum"
}

object ExactQuantizedSum {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column): Column =
    GraftGlue.toCol(ExactQuantizedSum(GraftGlue.toExpr(c))
      .toAggregateExpression())
}
