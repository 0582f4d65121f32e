package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.embed.{Embedder, HashEncoder}

class QuantizedIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val vecs = Embedder.embed(
    (0 until 600).map(i => (s"v$i", s"content topic${i % 4} words $i")).toDF("id", "text"),
    "id", "text", "span", HashEncoder(dim = 24))
    .select(col("artifact_id").as("id"), col("embedding")).cache()

  private def bytesUnder(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
    walk(new java.io.File(dir))
  }

  test("quantized index matches plain-index ranking at full probe and is much smaller") {
    val plainDir = java.nio.file.Files.createTempDirectory("graft_idx_f").toString
    val quantDir = java.nio.file.Files.createTempDirectory("graft_idx_q").toString
    VectorIndex.build(vecs, "id", "embedding", nCells = 4, plainDir)
    VectorIndex.build(vecs, "id", "embedding", nCells = 4, quantDir, quantized = true)

    val queries = vecs.limit(5).select(col("id").as("query_id"),
      graft.functions.VectorFunctions.vecAsDouble(col("embedding")).as("qv"))
    val exact = VectorIndex.search(spark, plainDir, queries, k = 5, nProbe = 4)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getString(0), r.getInt(2)) -> r.getString(1)).toMap
    val quant = VectorIndex.search(spark, quantDir, queries, k = 5, nProbe = 4)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getString(0), r.getInt(2)) -> r.getString(1)).toMap

    // recall@5 against the float index: quantization noise may swap close
    // ranks but must keep the neighbor sets essentially intact
    val perQuery = exact.keys.map(_._1).toSeq.distinct.map { q =>
      val e = (1 to 5).flatMap(r => exact.get((q, r))).toSet
      val g = (1 to 5).flatMap(r => quant.get((q, r))).toSet
      e.intersect(g).size.toDouble / 5.0
    }
    assert(perQuery.forall(_ >= 0.8), s"recall@5 per query: $perQuery")

    // at test scale parquet framing overhead blunts the full 8× data-page
    // ratio; half is already un-fakeable by anything but narrower pages
    val fb = bytesUnder(s"$plainDir/assigned.parquet")
    val qb = bytesUnder(s"$quantDir/assigned.parquet")
    assert(qb < fb / 2, s"quantized $qb bytes vs float $fb — expected < half")
  }

  test("update preserves quantized storage across append and rebuild") {
    val small = Embedder.embed(
      (0 until 80).map(i => (s"v$i", s"content topic${i % 4} words $i")).toDF("id", "text"),
      "id", "text", "span", HashEncoder(dim = 24))
      .select(col("artifact_id").as("id"), col("embedding")).cache()
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_qu").toString
    VectorIndex.build(small, "id", "embedding", nCells = 4, dir, quantized = true)

    val extra = Embedder.embed(
      Seq(("a1", "fresh one"), ("a2", "fresh two")).toDF("id", "text"),
      "id", "text", "span", HashEncoder(dim = 24))
      .select(col("artifact_id").as("id"), col("embedding"))
    assert(VectorIndex.update(small.unionByName(extra), "id", "embedding", 4, dir) == "append")
    val afterAppend = spark.read.parquet(s"$dir/assigned.parquet")
    assert(afterAppend.columns.contains("_q") && !afterAppend.columns.contains("_v"))
    assert(afterAppend.count() == 82)

    val many = Embedder.embed(
      (0 until 40).map(i => (s"b$i", s"bulk $i")).toDF("id", "text"),
      "id", "text", "span", HashEncoder(dim = 24))
      .select(col("artifact_id").as("id"), col("embedding"))
    assert(VectorIndex.update(small.unionByName(extra).unionByName(many),
      "id", "embedding", 4, dir) == "rebuild")
    val afterRebuild = spark.read.parquet(s"$dir/assigned.parquet")
    assert(afterRebuild.columns.contains("_q"), "rebuild must keep quantized storage")
    assert(afterRebuild.count() == 122)
    // searches still work end-to-end on the rebuilt quantized index
    val queries = small.limit(2).select(col("id").as("query_id"),
      graft.functions.VectorFunctions.vecAsDouble(col("embedding")).as("qv"))
    val res = VectorIndex.search(spark, dir, queries, k = 3, nProbe = 4)
    assert(res.groupBy("query_id").count().collect().forall(_.getLong(1) == 3))
  }
}
