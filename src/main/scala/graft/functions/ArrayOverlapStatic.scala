package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** True iff any word-`n`-gram of the text is in a STATIC string set —
  * the per-row membership probe behind streaming decontamination
  * ([[graft.corpus.CorpusOps.decontaminateRows]]).
  *
  * One codegen'd kernel does tokenize + rolling n-gram + hash probe,
  * because the composable formulations are each an order of magnitude
  * slower per row: `arrays_overlap(shingles(text), lit(grams))`
  * rebuilds the literal side's hash table on EVERY row (measured 11.5s
  * on q63 at sf0.1), and even with a prebuilt set the `shingles` array
  * HOF is interpreted CodegenFallback (6.2s). This kernel is O(words)
  * per row with a set built once per JVM (transient lazy — only the
  * serializable gram list ships with the plan): 0.6s on the same probe.
  *
  * N-gram semantics match [[graft.dedup.Dedup.shingleTable]] /
  * [[TextFunctions.shingles]]: whitespace-split of the trimmed text,
  * grams joined with single spaces.
  */
case class ShingleOverlapSet(child: Expression, n: Int, items: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "shingle_overlap_set"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, items.size * 2))
    items.foreach(s.add)
    s
  }

  /** Called from generated code; the expression itself is the codegen
    * reference, so the hash set rebuilds lazily per JVM.
    *
    * Tokenization is exact parity with the Spark-side
    * `split(trim(text), "\s+")` ([[TextFunctions.words]] /
    * `Dedup.shingleTable`): SQL `trim` strips U+0020 ONLY (Java
    * `String.trim` strips every char <= U+0020), and Spark's `split`
    * runs with limit -1, KEEPING the empty edge tokens that non-space
    * whitespace at the ends produces. Diverging here would break
    * `decontaminateRows`' membership-identical contract on text fringed
    * with tabs/newlines. */
  def containsAnyShingle(text: UTF8String): Boolean = {
    val s = text.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val words = ShingleOverlapSet.Whitespace.split(s.substring(b, e), -1)
    var i = 0
    val last = words.length - n
    val sb = new java.lang.StringBuilder
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      if (set.contains(sb.toString)) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(v: Any): Any =
    containsAnyShingle(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleSetExpr", this, classOf[ShingleOverlapSet].getName)
    defineCodeGen(ctx, ev, t => s"$ref.containsAnyShingle($t)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleOverlapSet {
  /** Same pattern Spark's `split` compiles for `"\\s+"`. */
  private[functions] val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def shingleOverlapSet(c: Column, n: Int, items: Seq[String]): Column =
    GraftBridge.column(ShingleOverlapSet(GraftBridge.expression(c), n, items))
}
