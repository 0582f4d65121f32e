package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text kernels used by the language-ID and shingling hot paths. */
object TextKernels {

  /** Distinct character n-grams of a string, first-occurrence order —
    * the single-pass equivalent of
    * `array_distinct(transform(sequence(1, len-n+1), i -> substr(s,i,n)))`.
    * Steps by Unicode code point, matching Spark's `substr` (and DuckDB's
    * `substr`) character semantics. */
  def distinctCharNgrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val cpCount = str.codePointCount(0, str.length)
    if (cpCount < n) return new GenericArrayData(Array.empty[Any])
    // char offset of each code point start (cpCount + 1 sentinel)
    val starts = new Array[Int](cpCount + 1)
    var ci = 0
    var cp = 0
    while (ci < str.length) {
      starts(cp) = ci
      ci += Character.charCount(str.codePointAt(ci))
      cp += 1
    }
    starts(cpCount) = str.length
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= cpCount) {
      seen.add(str.substring(starts(i), starts(i + n)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}

/** Codegen-friendly distinct-char-ngram expression (n fixed at plan time). */
case class DistinctCharNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernels.distinctCharNgrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.distinctCharNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextExprs {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_distinct_char_ngrams",
      es => DistinctCharNgramsExpr(es(0), es(1).eval().asInstanceOf[Int]), "built-in")

  /** Requires [[register]] on the executing session. */
  def distinct_char_ngrams(s: Column, n: Int): Column =
    call_function("graft_distinct_char_ngrams", s, org.apache.spark.sql.functions.lit(n))
}
