package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Immutable Bloom filter over 64-bit hashes, built once on the driver
  * from a SMALL set (benchmark shingles — thousands of docs by
  * construction, the same smallness premise d07's broadcast join rests
  * on) and shipped to executors inside the task binary as a plain
  * `Array[Long]`. Standard double-hashing construction (Kirsch &
  * Mitzenmacher 2006): probe j lands at (h + j·h') mod m with h' an
  * odd derived step, m a power of two so the mod is a mask and every
  * probe index is non-negative by construction.
  *
  * Bit-OR set bits are commutative ⇒ the built filter is independent of
  * the order the members arrive — deterministic across partitionings. */
object BloomBits {
  /** m = smallest power of two ≥ 16 bits/member (k=4 ⇒ FPR ≈ 0.24%),
    * floored at 1024 bits so tiny sets don't degenerate. */
  def build(members: Array[Long], k: Int = 4): Array[Long] = {
    var m = 1024L
    while (m < members.length.toLong * 16) m <<= 1
    val bits = new Array[Long]((m >>> 6).toInt)
    val mask = m - 1
    members.foreach { h =>
      var j = 0
      while (j < k) {
        val pos = probe(h, j, mask)
        bits((pos >>> 6).toInt) |= 1L << (pos & 63)
        j += 1
      }
    }
    bits
  }

  @inline def probe(h: Long, j: Int, mask: Long): Long = {
    // splitmix64 finalizer FIRST: members may occupy only the low bits
    // (shingle hashes are reduced mod a 32-bit prime), so both the base
    // position and the odd step must come from a full-width mix — a
    // step derived from raw upper bits would be constant (≈ k=1 probing
    // on clustered bits, measured as a 20% doc-level FP blowup)
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= z >>> 31
    val h2 = (z >>> 32) | 1L
    (z + j * h2) & mask
  }

  /** True iff every one of `h`'s k probe bits is set. */
  def mightContain(bits: Array[Long], k: Int, h: Long): Boolean = {
    val mask = bits.length.toLong * 64 - 1
    var j = 0
    while (j < k) {
      val pos = probe(h, j, mask)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0) return false
      j += 1
    }
    true
  }
}

/** Per-row prefilter: do at least `minHits` elements of the child
  * `array<long>` (a doc's shingle-hash set — distinct by construction)
  * possibly belong to the Bloom set? One native call per row — the
  * whole shingle array is tested without an explode, so the prefilter
  * runs before any row multiplication, and it early-exits at the
  * `minHits`-th hit.
  *
  * `minHits` is the load-bearing part: a contamination rule demanding
  * ≥ s shared shingles with ONE benchmark doc implies ≥ s distinct
  * shingle hashes present in the union Bloom set (shingle sets are
  * deduped), so filtering at minHits = s admits every doc the exact
  * rule can flag — NO false negatives — while pruning docs that share
  * only a stray boilerplate shingle or two, which "any hit" cannot.
  * False positives (hash-probe collisions inflating the count) only
  * cost the downstream exact verify join a few extra rows. */
case class BloomHitsAtLeast(child: Expression, bits: Array[Long], k: Int, minHits: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    BloomHitsAtLeast.compute(input.asInstanceOf[ArrayData], bits, k, minHits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomHitsAtLeast.compute($c, $bitsRef, $k, $minHits);")
  }

  override protected def withNewChildInternal(c: Expression): BloomHitsAtLeast =
    copy(child = c)
  override def prettyName: String = "bloom_hits_at_least"
}

object BloomHitsAtLeast {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column, bits: Array[Long], k: Int, minHits: Int): Column =
    GraftGlue.toCol(BloomHitsAtLeast(GraftGlue.toExpr(c), bits, k, minHits))

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, bits: Array[Long], k: Int, minHits: Int): Boolean = {
    var i = 0
    var hits = 0
    val n = arr.numElements()
    while (i < n) {
      if (BloomBits.mightContain(bits, k, arr.getLong(i))) {
        hits += 1
        if (hits >= minHits) return true
      }
      i += 1
    }
    false
  }
}
