package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Ids

/** Content-addressed ID generation as native Catalyst expressions
  * (SURVEY §2.10: canonical dict-hash needs custom code — a UDF would
  * serialize closures per task; these evaluate in-plan).
  * CodegenFallback: SHA-256 + canonical-JSON dominates cost, codegen of
  * the glue would not pay for itself. */
abstract class IdExpr extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else UTF8String.fromString(compute(vs))
  }
  protected def compute(vs: Seq[Any]): String
  protected def str(v: Any): String = v.asInstanceOf[UTF8String].toString
  protected def strs(v: Any): Seq[String] =
    v.asInstanceOf[ArrayData].toObjectArray(StringType)
      .map(_.asInstanceOf[UTF8String].toString).toSeq
}

case class UtteranceIdExpr(children: Seq[Expression]) extends IdExpr {
  protected def compute(vs: Seq[Any]): String =
    Ids.utteranceId(str(vs(0)), vs(1).asInstanceOf[Int], str(vs(2)), str(vs(3)),
      vs(4).asInstanceOf[Double], vs(5).asInstanceOf[Double])
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c)
}

case class SpanIdExpr(children: Seq[Expression]) extends IdExpr {
  protected def compute(vs: Seq[Any]): String =
    Ids.spanId(str(vs(0)), vs(1).asInstanceOf[Int], str(vs(2)), strs(vs(3)), str(vs(4)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c)
}

case class BeatIdExpr(children: Seq[Expression]) extends IdExpr {
  protected def compute(vs: Seq[Any]): String =
    Ids.beatId(str(vs(0)), vs(1).asInstanceOf[Int], strs(vs(2)), str(vs(3)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c)
}

case class SectionIdExpr(children: Seq[Expression]) extends IdExpr {
  protected def compute(vs: Seq[Any]): String =
    Ids.sectionId(str(vs(0)), vs(1).asInstanceOf[Int], strs(vs(2)), str(vs(3)))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) = copy(c)
}

/** Column-API entry points. The expressions are registered in the
  * session's FunctionRegistry (also usable from SQL as graft_*_id);
  * registration is idempotent and cheap, so callers invoke
  * [[IdFunctions.register]] defensively. */
object IdFunctions {
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_utterance_id" -> (UtteranceIdExpr(_)),
    "graft_span_id" -> (SpanIdExpr(_)),
    "graft_beat_id" -> (BeatIdExpr(_)),
    "graft_section_id" -> (SectionIdExpr(_)))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
    }

  def utterance_id(episodeId: Column, position: Column, text: Column,
      speaker: Column, start: Column, end: Column): Column =
    call_function("graft_utterance_id", episodeId, position, text, speaker, start, end)

  def span_id(episodeId: Column, position: Column, speaker: Column,
      utteranceIds: Column, text: Column): Column =
    call_function("graft_span_id", episodeId, position, speaker, utteranceIds, text)

  def beat_id(episodeId: Column, position: Column, spanIds: Column, text: Column): Column =
    call_function("graft_beat_id", episodeId, position, spanIds, text)

  def section_id(episodeId: Column, position: Column, beatIds: Column, text: Column): Column =
    call_function("graft_section_id", episodeId, position, beatIds, text)
}
