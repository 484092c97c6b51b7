package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a native Catalyst expression.
  *
  * Input: array<long> of (already hashed) shingle values in [0, p).
  * Output: array<long> of `a.length` minhash slots, slot i =
  * min over shingles h of (a(i)*h + b(i)) mod p.
  *
  * Why an Expression and not `transform`/`aggregate`: Spark's
  * higher-order functions are CodegenFallback and evaluate one lambda
  * call per element — for 128 permutations × ~100 shingles per row that
  * interpretive overhead dominates (measured 26 s for 500 docs). This
  * expression runs the whole signature as one tight JVM loop per row
  * (~ms for the same data). Constraint a(i) < 2^31 and h < 2^32 keeps
  * a*h below 2^63 (no overflow). `doGenCode` delegates to the same
  * static kernel so the signature pass stays inside WholeStageCodegen
  * (the permutation constants ride along as a referenced object).
  */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression {

  require(a.length == b.length)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], a, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $aRef, $bRef, ${p}L);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column, a: Array[Long], b: Array[Long], p: Long): Column =
    GraftGlue.toCol(MinHashSig(GraftGlue.toExpr(c), a, b, p))

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, a: Array[Long], b: Array[Long], p: Long): GenericArrayData = {
    val n = arr.numElements()
    val k = a.length
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      var m = Long.MaxValue
      val ai = a(i); val bi = b(i)
      var j = 0
      while (j < n) {
        val v = (ai * arr.getLong(j) + bi) % p
        if (v < m) m = v
        j += 1
      }
      sig(i) = if (n == 0) 0L else m
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** LSH band keys over a minhash signature: the signature is cut into
  * `numBands` equal slices and each slice is fold-hashed (chained
  * XXH64 over its longs) into one 64-bit bucket key. Native expression
  * for the same reason as [[MinHashSig]] — the aggregate(slice(...))
  * formulation paid ~0.6 ms/row in interpreted per-element evals. */
case class BandKeys(child: Expression, numBands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BandKeys.compute(input.asInstanceOf[ArrayData], numBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BandKeys.compute($c, $numBands);")

  override protected def withNewChildInternal(c: Expression): BandKeys = copy(child = c)
  override def prettyName: String = "minhash_band_keys"
}

object BandKeys {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column, numBands: Int): Column =
    GraftGlue.toCol(BandKeys(GraftGlue.toExpr(c), numBands))

  def compute(sig: ArrayData, numBands: Int): GenericArrayData = {
    val n = sig.numElements()
    val rows = n / numBands
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var acc = 42L
      var j = 0
      while (j < rows) {
        acc = XXH64.hashLong(sig.getLong(b * rows + j), acc)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}
