package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform

/** Content-defined chunking (CDC) of a binary payload via a Gear
  * rolling hash, returning the DISTINCT xxhash64 of each chunk — one
  * native Catalyst expression, one JVM pass per row.
  *
  * Fixed-size blocking (m06's 64-byte grid) breaks on INSERTION: one
  * added byte shifts every later block boundary, so two payloads that
  * differ by a prepended stamp share ~zero blocks. CDC places
  * boundaries where the CONTENT says so — the rolling hash of the last
  * bytes hits a mask — so an edit only perturbs the chunks it touches
  * and every later boundary re-synchronizes (the rsync/LBFS/FastCDC
  * principle; Gear is FastCDC's rolling function: h = (h << 1) +
  * G[byte], one shift + one add + one table load per byte).
  *
  * Determinism: the gear table is 256 longs from java.util.Random
  * (seed 4242) — a spec-defined LCG, identical on every JVM — and the
  * scan is sequential per row, so the chunk set is a pure function of
  * the bytes (parallelism- and engine-instance-independent; golden-
  * snapshot-safe). Guards: boundaries are only taken once a chunk
  * reaches `minLen` (masks the hash's warmup and bounds the chunk
  * count), and a chunk is force-cut at `maxLen` (bounds worst-case
  * chunk size on mask-free content).
  */
case class GearChunkHashes(child: Expression, mask: Long, minLen: Int,
                           maxLen: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GearChunkHashes.compute(input.asInstanceOf[Array[Byte]], mask, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GearChunkHashes.compute($c, ${mask}L, $minLen, $maxLen);")

  override protected def withNewChildInternal(c: Expression): GearChunkHashes =
    copy(child = c)
  override def prettyName: String = "gear_chunk_hashes"
}

/** [[GearChunkHashes]]'s sibling carrying chunk BYTE LENGTHS alongside
  * the hashes — struct(hashes: array<long>, lens: array<int>), same
  * cut points, same within-payload first-occurrence dedup (identical
  * hash ⇒ identical content ⇒ identical length). The storage-dedup
  * report (m14) needs lengths to price distinct-chunk byte mass;
  * keeping the hash-only expression untouched preserves m12's golden. */
case class GearChunkSpans(child: Expression, mask: Long, minLen: Int,
                          maxLen: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("h", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("len", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def nullSafeEval(input: Any): Any =
    GearChunkHashes.computeSpans(input.asInstanceOf[Array[Byte]], mask, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GearChunkHashes.computeSpans($c, ${mask}L, $minLen, $maxLen);")

  override protected def withNewChildInternal(c: Expression): GearChunkSpans =
    copy(child = c)
  override def prettyName: String = "gear_chunk_spans"
}

object GearChunkSpans {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column, mask: Long, minLen: Int, maxLen: Int): Column =
    GraftGlue.toCol(GearChunkSpans(GraftGlue.toExpr(c), mask, minLen, maxLen))
}

object GearChunkHashes {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column, mask: Long, minLen: Int, maxLen: Int): Column =
    GraftGlue.toCol(GearChunkHashes(GraftGlue.toExpr(c), mask, minLen, maxLen))

  /** 256-entry gear table — java.util.Random's sequence is spec-defined,
    * so these constants are identical on every JVM. */
  private val gear: Array[Long] = {
    val rnd = new java.util.Random(4242L)
    Array.fill(256)(rnd.nextLong())
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte], mask: Long, minLen: Int, maxLen: Int): GenericArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](16)
    val out = new Array[Long](n / minLen + 1)
    var m = 0
    var h = 0L
    var start = 0
    var i = 0
    def cut(end: Int): Unit = {
      val v = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L)
      if (seen.add(v)) { out(m) = v; m += 1 }
      start = end
      h = 0L
    }
    while (i < n) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      i += 1
      val len = i - start
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) cut(i)
    }
    if (start < n) cut(n)
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** [[compute]] with byte lengths: struct(hashes, lens) as an
    * InternalRow — same cut points, same first-occurrence dedup. */
  def computeSpans(bytes: Array[Byte], mask: Long, minLen: Int,
                   maxLen: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val n = bytes.length
    val seen = new java.util.HashSet[java.lang.Long](16)
    val outH = new Array[Long](n / minLen + 1)
    val outL = new Array[Int](n / minLen + 1)
    var m = 0
    var h = 0L
    var start = 0
    var i = 0
    def cut(end: Int): Unit = {
      val v = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L)
      if (seen.add(v)) { outH(m) = v; outL(m) = end - start; m += 1 }
      start = end
      h = 0L
    }
    while (i < n) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      i += 1
      val len = i - start
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) cut(i)
    }
    if (start < n) cut(n)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(java.util.Arrays.copyOf(outH, m)),
                 new GenericArrayData(java.util.Arrays.copyOf(outL, m))))
  }
}
