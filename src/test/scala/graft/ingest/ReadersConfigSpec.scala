package graft.ingest

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.{Config, Schemas}

class ReadersConfigSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft_readers")
    val f = dir.resolve(name)
    Files.write(f, content.getBytes)
    f.toString
  }

  test("S2: reads array-of-utterances JSON") {
    val p = write("a.json",
      """[{"episode_id":"E","start":0.0,"end":1.0,"speaker":"A","text":"x"},
        | {"episode_id":"E","start":1.0,"end":2.0,"speaker":"A","text":"y"}]""".stripMargin)
    assert(Readers.readJson(spark, p).count() == 2)
  }

  test("S2: reads {utterances: [...]} wrapper JSON") {
    val p = write("b.json",
      """{"utterances":[{"episode_id":"E","start":0.0,"end":1.0,"speaker":"A","text":"x"}]}""")
    val df = Readers.readJson(spark, p)
    assert(df.count() == 1 && df.columns.contains("speaker"))
  }

  test("S2: single-object JSON becomes one row") {
    val p = write("c.json",
      """{"episode_id":"E","start":0.0,"end":1.0,"speaker":"A","text":"x"}""")
    assert(Readers.readJson(spark, p).count() == 1)
  }

  test("S3: sniffing by extension and by first-line shape") {
    assert(Readers.sniffFormat(spark, "/x/y.jsonl") == "jsonl")
    assert(Readers.sniffFormat(spark, "/x/y.json") == "json")
    val jl = write("noext_a", """{"k": 1}""" + "\n" + """{"k": 2}""")
    assert(Readers.sniffFormat(spark, jl) == "jsonl")
    val js = write("noext_b", "[\n  {\"k\": 1}\n]")
    assert(Readers.sniffFormat(spark, js) == "json")
  }

  test("S11: parquet metadata probe") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_meta").toString + "/t"
    Seq(1, 2, 3).toDF("x").write.parquet(dir)
    val (rows, files, schema) = Readers.parquetMetadata(spark, dir)
    assert(rows == 3 && files >= 1 && schema.fieldNames.sameElements(Array("x")))
  }

  test("F11/E1: schema compliance reports missing/extra/type mismatches") {
    import org.apache.spark.sql.types._
    val actual = StructType(Seq(
      StructField("utterance_id", StringType), StructField("episode_id", StringType),
      StructField("start", StringType), // wrong type
      StructField("bonus", IntegerType))) // extra (tolerated)
    val r = Readers.schemaCompliance(actual, Schemas.utterance)
    assert(r.missing == Seq("duration", "end", "speaker", "text"))
    assert(r.extra == Seq("bonus"))
    assert(r.typeMismatches == Seq(("start", "double", "string")))
    assert(!r.isCompliant)
    assert(Readers.schemaCompliance(Schemas.utterance, Schemas.utterance).isCompliant)
  }

  test("C18: env interpolation with defaults") {
    val env = Map("HOME_X" -> "/home/u")
    assert(Config.interpolateEnv("${HOME_X}/data", env) == "/home/u/data")
    assert(Config.interpolateEnv("${MISSING:-/tmp}/data", env) == "/tmp/data")
    assert(Config.interpolateEnv("${MISSING}/data", env) == "/data")
    assert(Config.interpolateEnv("no vars", env) == "no vars")
  }

  test("C20: QA report parsing round-trips renderMarkdown") {
    val a = graft.quality.Quality.Assessment(
      Map("coverage_pct" -> 94.5, "span_regressions" -> 0.0),
      Seq(graft.quality.Quality.Violation("coverage_min", ">= 95.0", "94.50", "error")),
      "RED")
    val md = graft.quality.Quality.renderMarkdown(a)
    val parsed = Config.parseReportSummary(md)
    assert(parsed.status.contains("RED"))
    assert(parsed.metrics("coverage_pct") == 94.5)
    assert(parsed.metrics("span_regressions") == 0.0)
  }
}
