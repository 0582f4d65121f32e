package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** S2/S3/S11: non-JSONL readers and probes
  * (reference: ingestion/reader.py:39-123, writer.py:313-349). */
object Readers {

  /** S2: multi-line JSON in any of the reference's three shapes —
    * top-level array of utterances, {"utterances": [...]} wrapper, or a
    * single object. Shape is detected from the inferred schema. */
  def readJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    raw.schema.fields.find(_.name == "utterances") match {
      case Some(f) if f.dataType.isInstanceOf[ArrayType] =>
        raw.select(explode(col("utterances")).as("u")).select("u.*")
      case _ => raw // array shape and single-object shape both land here
    }
  }

  /** S3: format sniffing — extension first, else parse the first
    * non-empty line as JSON (driver-side, reads a small prefix only). */
  def sniffFormat(spark: SparkSession, path: String): String = {
    val lower = path.toLowerCase
    if (lower.endsWith(".jsonl") || lower.endsWith(".ndjson")) "jsonl"
    else if (lower.endsWith(".json")) "json"
    else {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      val buf = new Array[Byte](4096)
      val n = math.max(in.read(buf), 0)
      in.close()
      val firstLine = new String(buf, 0, n, "UTF-8")
        .linesIterator.find(_.trim.nonEmpty).getOrElse("")
      val t = firstLine.trim
      if (t.startsWith("{") && t.endsWith("}")) "jsonl" else "json"
    }
  }

  /** S11: parquet metadata probe — row count, file count, schema. */
  def parquetMetadata(spark: SparkSession, path: String): (Long, Int, StructType) = {
    val df = spark.read.parquet(path)
    val files = df.inputFiles.length
    (df.count(), files, df.schema)
  }

  /** F11/E1: schema compliance — expected vs actual column sets and type
    * mismatches (reference: schemas.py:133-165; extra columns tolerated). */
  final case class SchemaReport(missing: Seq[String], extra: Seq[String],
      typeMismatches: Seq[(String, String, String)]) {
    def isCompliant: Boolean = missing.isEmpty && typeMismatches.isEmpty
  }

  def schemaCompliance(actual: StructType, expected: StructType): SchemaReport = {
    val act = actual.fields.map(f => f.name -> f.dataType).toMap
    val exp = expected.fields.map(f => f.name -> f.dataType).toMap
    SchemaReport(
      missing = expected.fieldNames.filterNot(act.contains).toSeq.sorted,
      extra = actual.fieldNames.filterNot(exp.contains).toSeq.sorted,
      typeMismatches = expected.fields.toSeq
        .filter(f => act.get(f.name).exists(_ != f.dataType))
        .map(f => (f.name, f.dataType.simpleString, act(f.name).simpleString)))
  }
}
