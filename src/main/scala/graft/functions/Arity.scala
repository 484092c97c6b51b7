package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared arity validation for the SQL function-registration builders.
  *
  * The builders index their argument list positionally (`es(1)`,
  * `es(2)`); a call with too few arguments would die with an
  * `IndexOutOfBoundsException` deep inside analysis instead of a clean
  * error. Validating the length first turns that into the same
  * `USER_RAISED_EXCEPTION` `AnalysisException` the literal-argument
  * parsers ([[TokenSetCount.parseWordList]], [[ModFilter.literalLong]])
  * raise, with the function's usage string in the message.
  */
object Arity {

  /** Return `es` unchanged if it has exactly `n` elements; fail
    * analysis with a usage message otherwise. */
  def check(name: String, usage: String, n: Int,
            es: Seq[Expression]): Seq[Expression] = {
    if (es.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" ->
          s"$name expects $n argument(s) — usage: $usage — got ${es.length}"))
    es
  }
}
