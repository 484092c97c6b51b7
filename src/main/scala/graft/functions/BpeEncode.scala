package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a trained BPE merge table to `child` (space-delimited text) and
  * return the token sequence — the ENCODE half of the tokenizer loop
  * whose TRAIN half is `TextAnalysis.bpeTrain` (t29). Encoding is
  * embarrassingly parallel: the ranked merge table rides into every
  * task as part of the expression (a broadcast in spirit — one
  * driver-serialized reference object, never a join), and each row is
  * tokenized independently, so the operator adds zero shuffles to
  * whatever plan it appears in.
  *
  * Semantics are the standard greedy encode (Sennrich et al. 2016's
  * `apply_bpe`, HF tokenizers): per word — split on 0x20 like the
  * trainer's histogram, symbols = UTF-16 chars + "</w>", exactly the
  * trainer's word construction — repeatedly find the LOWEST-RANKED
  * merge present among adjacent symbol pairs and apply it left-to-right
  * non-overlapping, until no adjacent pair is in the table. Note this
  * REVISITS earlier ranks when a later merge creates a new occurrence
  * of an earlier pair (e.g. merges 1=(aa,b), 2=(a,a) on "aab" →
  * [aa,b] → [aab]); a single pass per rank would stop at [aa, b] —
  * the distinction is spec-pinned. Rank uniqueness makes the argmin
  * deterministic, so output is a pure per-row function: golden-hash
  * safe and parallelism-invariant by construction.
  *
  * Generates real code (no CodegenFallback): the per-row work is one
  * static call, keeping whole-stage codegen fused across the operator.
  */
case class BpeEncode(child: Expression, merges: Seq[(Int, String, String)])
    extends UnaryExpression {

  // pair → rank, keyed "left right": the space-join is unambiguous
  // because no symbol can contain a space — words are space-split, so
  // their chars exclude 0x20, merged symbols concatenate those chars,
  // and "</w>" has none
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.foreach { case (r, l, rt) => m.put(l + " " + rt, Integer.valueOf(r)) }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.encode($c, $ranksRef);")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
  override def prettyName: String = "bpe_encode"
}

object BpeEncode {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column, merges: Seq[(Int, String, String)]): Column =
    GraftGlue.toCol(BpeEncode(GraftGlue.toExpr(c), merges))

  /** Static helper invoked from both interpreted eval and generated
    * code (raw HashMap in the signature keeps Janino happy). */
  def encode(s: UTF8String,
             ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val text = s.toString
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) encodeWord(text.substring(start, i), ranks, out)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(w: String, ranks: java.util.HashMap[String, Integer],
                         out: java.util.ArrayList[UTF8String]): Unit = {
    var syms = new java.util.ArrayList[String](w.length + 1)
    var c = 0
    while (c < w.length) { syms.add(String.valueOf(w.charAt(c))); c += 1 }
    syms.add("</w>")
    var done = false
    while (!done && syms.size > 1) {
      // argmin rank over adjacent pairs; ranks are unique so this is
      // deterministic without a tie-break
      var best = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && r.intValue() < best) {
          best = r.intValue(); bl = syms.get(i); br = syms.get(i + 1)
        }
        i += 1
      }
      if (bl == null) done = true
      else {
        val ns = new java.util.ArrayList[String](syms.size)
        i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms.get(i) == bl && syms.get(i + 1) == br) {
            ns.add(bl + br); i += 2
          } else { ns.add(syms.get(i)); i += 1 }
        }
        syms = ns
      }
    }
    var j = 0
    while (j < syms.size) { out.add(UTF8String.fromString(syms.get(j))); j += 1 }
  }
}
