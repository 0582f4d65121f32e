package graft.embed

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The external-process encoder seam (V1's "real provider" path): the
  * line protocol round-trips through an actual subprocess — here awk
  * standing in for a model CLI — both directly and through
  * Embedder.embed's executor-side batching. */
class ProcessEncoderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic "model": dim-2 vector of (input line length, 1.0)
  private val awkModel = Seq("awk", """{ printf("[%d.0, 1.0]\n", length($0)) }""")

  test("line protocol round-trips through a real subprocess, in order") {
    val enc = ProcessEncoder(awkModel, dim = 2)
    val out = enc.encode(Seq("ab", "xyz", "quote\"here"))
    // texts arrive JSON-quoted: "ab" is 4 chars, "xyz" 5, escaped quote 13
    assert(out.map(_.toSeq) ==
      Seq(Seq(4.0f, 1.0f), Seq(5.0f, 1.0f), Seq(13.0f, 1.0f)))
  }

  test("works through Embedder.embed's batched mapPartitions plumbing") {
    val docs = Seq(("d1", "aa"), ("d2", "bbbb")).toDF("doc_id", "text")
    val emb = Embedder.embed(docs, "doc_id", "text", "doc",
      ProcessEncoder(awkModel, dim = 2, modelVersion = Some("awk-1")), batchSize = 1)
    val rows = emb.orderBy("artifact_id").collect()
    assert(rows.map(_.getAs[Seq[Float]]("embedding").head).toSeq == Seq(4.0f, 6.0f))
    assert(rows.forall(_.getAs[String]("model_name") == "graft-process-encoder"))
    assert(rows.forall(_.getAs[String]("model_version") == "awk-1"))
  }

  test("process failure and dimension drift surface as errors") {
    val boom = intercept[RuntimeException] {
      ProcessEncoder(Seq("false"), dim = 2).encode(Seq("x"))
    }
    assert(boom.getMessage.contains("0/1 vectors"))
    val drift = intercept[Exception] {
      ProcessEncoder(awkModel, dim = 3).encode(Seq("x"))
    }
    assert(drift.getMessage.contains("expected 3 dims"))
  }
}
