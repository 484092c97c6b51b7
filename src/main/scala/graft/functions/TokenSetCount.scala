package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of space-delimited tokens of `child` that are members of a
  * fixed word set — the native form of
  * `size(filter(split(text, ' '), x => x.isin(words)))`.
  *
  * Spark's array higher-order functions are CodegenFallback with an
  * interpreted lambda per element (the 50×-measured trap that motivated
  * [[ShingleHashes]]); this expression generates real code (no fallback,
  * whole-stage codegen stays fused) and scans the UTF-8 bytes directly:
  * 0x20 never occurs inside a multi-byte UTF-8 sequence, so byte-level
  * splitting is character-safe, and tokens hash straight into a
  * UTF8String set without building a token array at all.
  *
  * Matches the HOF semantics exactly: consecutive spaces yield empty
  * tokens, which can never equal a non-empty stopword.
  */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    TokenSetCount.count(input.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenSetCount.count($c, $setRef);")
  }

  override protected def withNewChildInternal(c: Expression): TokenSetCount = copy(child = c)
  override def prettyName: String = "token_set_count"
}

object TokenSetCount {
  import org.apache.spark.sql.GraftGlue
  def apply(c: Column, words: Seq[String]): Column =
    GraftGlue.toCol(TokenSetCount(GraftGlue.toExpr(c), words))

  /** SQL-registration arg parsing: the word-list argument compiles into
    * the expression, so it must be a foldable non-null string. A plain
    * `eval()` on a non-foldable arg dies deep in the expression tree
    * with an opaque UnsupportedOperationException — fail analysis with
    * a proper AnalysisException instead. */
  def parseWordList(e: Expression): Seq[String] = {
    def fail(why: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" ->
          s"token_set_count(text, words): the words argument must be a $why (a comma-joined string literal like 'the,a,of')"))
    if (!e.foldable) fail("literal, got a non-foldable expression")
    val v = e.eval()
    if (v == null) fail("non-null string, got NULL")
    v.asInstanceOf[UTF8String].toString.split(',').toSeq
  }

  /** Static helper invoked from both interpreted eval and generated
    * code (raw HashSet in the signature keeps Janino happy). */
  def count(s: UTF8String, set: java.util.HashSet[UTF8String]): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var cnt = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        if (i > start && set.contains(UTF8String.fromBytes(bytes, start, i - start))) cnt += 1
        start = i + 1
      }
      i += 1
    }
    cnt
  }
}
