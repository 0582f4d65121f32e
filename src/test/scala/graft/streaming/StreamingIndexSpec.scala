package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.index.VectorIndex

/** N2 streaming index maintenance: new vector files discovered by the
  * file stream drive build → append → rebuild per the 30% rule, with
  * checkpointed exactly-once file progress across restarts. */
class StreamingIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def writeVectors(dir: String, from: Int, until: Int): Unit = {
    val df = spark.range(from, until).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        i => (pmod(xxhash64(col("id") * 8 + i), lit(100)).cast("double") / 50.0 - 1.0)
          .cast("float")).as("embedding"))
    df.coalesce(1).write.mode("append").parquet(dir)
  }

  test("stream drains drive build, then append, then 30%-rule rebuild") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_idx")
    val vecDir = tmp.resolve("vectors").toString
    val idxDir = tmp.resolve("ivf").toString
    val ckpt = tmp.resolve("ckpt").toString
    def drain(): Seq[String] = StreamingIndex.maintainAvailableNow(
      spark, vecDir, schema, "vec_id", "embedding", nCells = 4, idxDir, ckpt)

    writeVectors(vecDir, 0, 100)
    assert(drain() == Seq("build"))
    def indexed(): Long = spark.read.parquet(VectorIndex.Paths(idxDir).assigned).count()
    assert(indexed() == 100)

    // 10 new / 100 existing = 10% < 30% → append; old files NOT re-read
    writeVectors(vecDir, 100, 110)
    assert(drain() == Seq("append"))
    assert(indexed() == 110)

    // 60 new / 110 = 55% > 30% → rebuild (batch may arrive as one file)
    writeVectors(vecDir, 110, 170)
    assert(drain() == Seq("rebuild"))
    assert(indexed() == 170)

    // nothing new → no micro-batch fires at all
    assert(drain().isEmpty)

    // the maintained index answers searches
    val queries = spark.read.parquet(vecDir).limit(3)
      .select(col("vec_id").as("query_id"),
        graft.functions.VectorFunctions.vecAsDouble(col("embedding")).as("qv"))
    val hits = VectorIndex.search(spark, idxDir, queries, k = 3, nProbe = 2)
    assert(hits.count() > 0)
  }

  test("graph-index drains: build, touched-cells append, 30%-rule rebuild; exhaustive parity at the end") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_hnsw")
    val vecDir = tmp.resolve("vectors").toString
    val idxDir = tmp.resolve("hnsw").toString
    val ckpt = tmp.resolve("ckpt").toString
    def drain(): Seq[String] = StreamingIndex.maintainGraphAvailableNow(
      spark, vecDir, schema, "vec_id", "embedding", nCells = 4, idxDir, ckpt,
      m = 4, efConstruction = 16)

    writeVectors(vecDir, 0, 100)
    assert(drain() == Seq("build"))
    def indexed(): Long =
      spark.read.parquet(graft.index.HnswIndex.Paths(idxDir).graph).count()
    assert(indexed() == 100)

    writeVectors(vecDir, 100, 110) // 10% < 30% → append
    assert(drain() == Seq("append"))
    assert(indexed() == 110)

    writeVectors(vecDir, 110, 170) // 55% > 30% → rebuild
    assert(drain() == Seq("rebuild"))
    assert(indexed() == 170)

    assert(drain().isEmpty) // no new files → no micro-batch

    // the maintained graph answers exhaustive searches exactly
    val all = spark.read.parquet(vecDir)
    val queries = all.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"),
        graft.functions.VectorFunctions.vecAsDouble(col("embedding")).as("qv"))
    val got = graft.index.HnswIndex.search(spark, idxDir, queries, k = 3,
        efSearch = Int.MaxValue, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val corpus = all.select(col("vec_id").as("neighbor_id"),
      graft.functions.VectorFunctions.vecAsDouble(col("embedding")).as("nv"))
    val want = graft.operators.Similarity.topKExact(queries, corpus, 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }
}
