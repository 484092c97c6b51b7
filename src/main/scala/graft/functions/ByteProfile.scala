package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Per-payload byte-distribution statistics as ONE codegen'd pass —
  * struct(n_bytes, n_distinct, top_c, printable) over a binary column:
  * total bytes, distinct byte values, the modal byte's count, and the
  * printable-ASCII (0x20–0x7E) byte count. Backs m15's byte-profile
  * admission filter.
  *
  * Why an expression and not a per-byte explode: the profile is a pure
  * per-row fold over a 256-cell histogram — exploding N bytes into N
  * rows through a (doc, byte)-keyed aggregate shuffles and hashes the
  * corpus's entire byte mass to compute 4 numbers per doc (measured
  * 3.4 s at sf0.1 vs ~0.3 s for this one-pass form; at 100 TB the
  * explode is a non-starter). One JVM pass per row, stack-local
  * int[256], zero shuffle, whole-stage-codegen friendly — the
  * ShingleHashes/GearChunkHashes discipline.
  *
  * Determinism: a counting fold — order-free, engine-instance-free;
  * the values are exactly what the SQL explode computes, so m15 keeps
  * its full DuckDB oracle. */
case class BytePayloadProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false),
    StructField("printable", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    BytePayloadProfile.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BytePayloadProfile.compute($c);")

  override protected def withNewChildInternal(c: Expression): BytePayloadProfile =
    copy(child = c)
  override def prettyName: String = "byte_payload_profile"
}

object BytePayloadProfile {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column): Column =
    GraftGlue.toCol(BytePayloadProfile(GraftGlue.toExpr(c)))

  def compute(bytes: Array[Byte]): InternalRow = {
    val hist = new Array[Long](256)
    var i = 0
    val n = bytes.length
    while (i < n) {
      hist(bytes(i) & 0xff) += 1
      i += 1
    }
    var distinct = 0L
    var top = 0L
    var printable = 0L
    var b = 0
    while (b < 256) {
      val c = hist(b)
      if (c > 0) {
        distinct += 1
        if (c > top) top = c
        if (b >= 0x20 && b <= 0x7e) printable += c
      }
      b += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, distinct, top, printable))
  }
}
