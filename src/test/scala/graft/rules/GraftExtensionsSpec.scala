package graft.rules

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("size(regexp_extract_all(_, lit, 0)) optimizes to the counting kernel") {
    // non-foldable source (a scan), or constant folding evaluates the
    // whole expression before the rule can be observed
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("RegexCountExpr") ||
      optimized.toLowerCase.contains("regexcount"),
      s"rule did not fire:\n$optimized")
    // counts equal the token count of the word-soup corpus
    val viaArray = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(size(split(col("text"), " ")).as("n")).as[Int].collect().toSeq
    assert(df.as[Int].collect().toSeq == viaArray)
  }

  test("non-literal pattern and non-zero group index are left untouched") {
    val df = Seq(("a1", "[0-9]")).toDF("t", "p")
    val dynamic = df.select(
      size(regexp_extract_all(col("t"), col("p"), lit(0))).as("n"))
    assert(!dynamic.queryExecution.optimizedPlan.toString.contains("RegexCountExpr"))
    assert(dynamic.as[Int].head() == 1)

    val group1 = Seq("a1b2").toDF("t").select(
      size(regexp_extract_all(col("t"), lit("([a-z])([0-9])"), lit(1))).as("n"))
    assert(!group1.queryExecution.optimizedPlan.toString.contains("RegexCountExpr"))
    assert(group1.as[Int].head() == 2)
  }
}
