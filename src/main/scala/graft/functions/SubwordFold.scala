package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native whole-document greedy-subword counter — the codegen'd rewrite the
  * round-9 verdict named as the known optimization path for the
  * [[graft.llm.TextOps.subwordCount]] column fold.
  *
  * Why it exists: three gates (`t_token_subword`, `t_pack_subword`,
  * `t_budget_subword`) each pay `aggregate(transform(words, w ⇒ fold))` —
  * higher-order functions evaluate INTERPRETED, so every character of every
  * word dispatches ~40 interpreted expression nodes (substr, three `isin`s,
  * the when-chain, the packed-state arithmetic). This expression does the
  * identical computation for the WHOLE document in one tight Java loop: split
  * on ASCII whitespace (Java regex `\s` semantics — exactly the 6 chars
  * `split(text, "\\s+")` separates on), then greedy longest-match (4→3→2→1
  * code points) per token over the same pinned vocabulary.
  *
  * Equivalence contract with the column fold (spec-pinned in LlmOpsSpec):
  * `graft_subwords(lower(text))` ==
  * `aggregate(transform(filter(split(lower(text), "\\s+"), len > 0),
  * subwordCount), 0L, _+_)` for every input — leading/trailing separator
  * runs produce empty tokens the filter drops and the scanner never forms;
  * positions count CODE POINTS (`substr` semantics), so astral-plane text
  * agrees too; unmatched characters (anything outside the lowercase vocab)
  * advance by one exactly like the fold's `otherwise(1)` arm. The fold stays
  * as the reference implementation and the custom-vocabulary path.
  */
case class SubwordFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_subwords"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${t.catalogString}")
  }

  override def nullSafeEval(s: Any): Any =
    SubwordFold.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubwordFold.count($c)")

  override protected def withNewChildInternal(newChild: Expression): SubwordFold =
    copy(child = newChild)
}

object SubwordFold {

  /** The pinned vocabulary — single-sourced here; [[graft.llm.TextOps]]'s
    * column fold and its DuckDB twin read these same lists. */
  val Sub4: Seq[String] = Seq("tion", "ment", "able", "ight", "ough")
  val Sub3: Seq[String] = Seq("the", "ing", "ion", "ent", "and", "ati", "for", "ter", "ers")
  val Sub2: Seq[String] = Seq("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "es", "or", "te", "ed", "is", "al", "ar", "st", "to", "of")

  private val s4 = new java.util.HashSet[String](java.util.Arrays.asList(Sub4: _*))
  private val s3 = new java.util.HashSet[String](java.util.Arrays.asList(Sub3: _*))
  private val s2 = new java.util.HashSet[String](java.util.Arrays.asList(Sub2: _*))

  /** Java regex `\s` — the exact separator class `split(text, "\\s+")`
    * uses; NOT Character.isWhitespace (which adds U+00A0 etc.). */
  private def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Total greedy-subword count over the whitespace-separated tokens of
    * `text`. Called from generated code — must stay a static-forwardable
    * method with no Scala-only types in the signature. */
  def count(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    var total = 0L
    var i = 0
    while (i < n) {
      // skip a separator run
      while (i < n && isSep(s.charAt(i))) i += 1
      // one token: greedy longest-match per CODE POINT position
      while (i < n && !isSep(s.charAt(i))) {
        // code-point lengths 4/3/2 from position i, bounded by the token
        val l4 = cpEnd(s, i, 4)
        val l3 = cpEnd(s, i, 3)
        val l2 = cpEnd(s, i, 2)
        val step =
          if (l4 > 0 && s4.contains(s.substring(i, l4))) l4 - i
          else if (l3 > 0 && s3.contains(s.substring(i, l3))) l3 - i
          else if (l2 > 0 && s2.contains(s.substring(i, l2))) l2 - i
          else Character.charCount(s.codePointAt(i))
        total += 1L
        i += step
      }
    }
    total
  }

  /** Char index just past `cps` code points from `from`, or -1 if the token
    * ends (separator or end-of-string) before `cps` code points — callers
    * then fall through to the next-shorter match, mirroring how the fold's
    * short `substr` tail can never equal a longer vocab entry. */
  private def cpEnd(s: String, from: Int, cps: Int): Int = {
    var i = from
    var k = 0
    while (k < cps) {
      if (i >= s.length || isSep(s.charAt(i))) return -1
      i += Character.charCount(s.codePointAt(i))
      k += 1
    }
    i
  }
}
