package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word n-gram shingles of a text column, as one native
  * Catalyst expression: split on ' ', slide an n-token window, xxhash64
  * each shingle (seed 42, matching Spark's xxhash64() default), reduce
  * mod p into the MinHash field, and deduplicate — all in a single JVM
  * pass per row.
  *
  * Replaces a transform(sequence)/concat_ws/element_at/array_distinct
  * pipeline that, being CodegenFallback higher-order functions, paid
  * per-element interpreter overhead (~8 ms/row measured; this is ~µs).
  * Downstream consumers join/aggregate on the hashes — 64-bit collisions
  * are negligible at corpus scale (P[any collision among 10^6 distinct
  * shingles] < 3e-8).
  *
  * `doGenCode` delegates to the same static helper the interpreted path
  * uses — one per-row call, but the surrounding WholeStageCodegen stage
  * (scan → shingle → explode → shuffle write) stays fused instead of
  * being split at a fallback boundary.
  */
case class ShingleHashes(child: Expression, n: Int, p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n, ${p}L);")

  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column, n: Int, p: Long): Column =
    GraftGlue.toCol(ShingleHashes(GraftGlue.toExpr(c), n, p))

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(input: UTF8String, n: Int, p: Long): GenericArrayData = {
    val text = input.toString
    val toks = text.split(' ')
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](toks.length * 2)
    val out = new Array[Long](toks.length - n + 1)
    var m = 0
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      val v = ((h % p) + p) % p // pmod into the MinHash field
      if (seen.add(v)) { out(m) = v; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

/** Character-level n-gram variant of [[ShingleHashes]]: slides an
  * n-character window over the raw string (no tokenization), hashing
  * each gram — the standard modality for languages without whitespace
  * segmentation and for OCR/boilerplate near-dup detection. */
case class CharShingleHashes(child: Expression, n: Int, p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharShingleHashes.compute(input.asInstanceOf[UTF8String], n, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharShingleHashes.compute($c, $n, ${p}L);")

  override protected def withNewChildInternal(c: Expression): CharShingleHashes = copy(child = c)
  override def prettyName: String = "char_shingle_hashes"
}

object CharShingleHashes {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column, n: Int, p: Long): Column =
    GraftGlue.toCol(CharShingleHashes(GraftGlue.toExpr(c), n, p))

  def compute(input: UTF8String, n: Int, p: Long): GenericArrayData = {
    val text = input.toString
    if (text.length < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](text.length * 2)
    val out = new Array[Long](text.length - n + 1)
    var m = 0
    var i = 0
    while (i <= text.length - n) {
      val u = UTF8String.fromString(text.substring(i, i + n))
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      val v = ((h % p) + p) % p
      if (seen.add(v)) { out(m) = v; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

/** Keep the elements of a long array that are ≡ r (mod m) — the 0-mod-p
  * selection of Manber-style fingerprint sampling, as one native pass
  * instead of `filter(arr, h -> h % m == r)`'s interpreted per-element
  * lambda. Inputs are the non-negative mod-p shingle hashes. */
case class ModFilter(child: Expression, m: Long, r: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ModFilter.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], m, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ModFilter.compute($c, ${m}L, ${r}L);")

  override protected def withNewChildInternal(c: Expression): ModFilter = copy(child = c)
  override def prettyName: String = "mod_filter"
}

object ModFilter {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column, m: Long, r: Long): Column =
    GraftGlue.toCol(ModFilter(GraftGlue.toExpr(c), m, r))

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData,
              m: Long, r: Long): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var k = 0
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      if (h % m == r) { out(k) = h; k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** SQL-registration arg parsing: m and r compile into the expression,
    * so they must be foldable non-null integers — fail analysis with a
    * clear message otherwise (same contract as
    * [[TokenSetCount.parseWordList]]). */
  def literalLong(e: Expression, name: String): Long = {
    def fail(why: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" ->
          s"mod_filter(arr, m, r): the $name argument must be a $why (an integer literal like 4)"))
    if (!e.foldable) fail("literal, got a non-foldable expression")
    e.eval() match {
      case null       => fail("non-null integer, got NULL")
      case i: Int     => i.toLong
      case l: Long    => l
      case s: Short   => s.toLong
      case b: Byte    => b.toLong
      case other      => fail(s"integer, got ${other.getClass.getSimpleName}")
    }
  }
}
