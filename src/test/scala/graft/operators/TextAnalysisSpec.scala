package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("quality score is in [0,1] and favors longer content-rich text") {
    val df = Seq(
      ("long", Array.fill(60)("substantive").mkString(" ")),
      ("short", "a the of"))
      .toDF("k", "text")
      .select(col("k"), TextAnalysis.qualityScore(col("text")).as("s"))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(m("long") > m("short"))
  }

  test("bpe-ish token count splits punctuation off words") {
    val n = Seq("hello, world!").toDF("text")
      .select(TextAnalysis.bpeishTokenCount(col("text"))).first().getInt(0)
    assert(n == 4) // hello , world !
  }

  test("fingerprint is stable under whitespace/case variation only") {
    val df = Seq(("A  b", "a b", "a c")).toDF("x", "y", "z")
    val r = df.select(TextAnalysis.fingerprint(col("x")),
      TextAnalysis.fingerprint(col("y")), TextAnalysis.fingerprint(col("z"))).first()
    assert(r.getLong(0) == r.getLong(1) && r.getLong(0) != r.getLong(2))
  }

  test("trigram langid separates two synthetic 'languages'") {
    val langA = (1 to 20).map(i => (i.toLong, "aaa bbb aab abb aba bab", "A"))
    val langB = (21 to 40).map(i => (i.toLong, "xxx yyy xxy xyy xyx yxy", "B"))
    val df = (langA ++ langB).toDF("doc_id", "text", "lang")
    val pred = TextAnalysis.langIdByTrigramProfile(df, "doc_id", col("text"), "lang")
    val joined = df.join(pred, "doc_id")
      .select(col("lang"), col("predicted")).collect()
    assert(joined.forall(r => r.getString(0) == r.getString(1)))
  }
}
