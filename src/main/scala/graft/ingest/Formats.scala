package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Multi-format table sink/source (S7-family generalization): the same
  * schema-enforced write/read contract as the parquet sink, over every
  * columnar/text format Spark ships built-in — parquet, ORC (both
  * splittable + predicate-pushdown capable, the 100 TB choices), JSON
  * lines (interchange), and CSV (flat exports).
  *
  * Reads always take an explicit expected schema — never inference — so
  * a corrupted or drifted file surfaces as a hard error or a
  * [[Readers.schemaCompliance]] report, not as silently re-typed columns
  * (the same reasoning as the partition-column round-trip fix: inference
  * is how strings quietly become ints).
  */
object Formats {

  val supported: Set[String] = Set("parquet", "orc", "json", "csv")

  private def requireSupported(format: String): Unit =
    require(supported(format), s"unsupported format '$format' (one of ${supported.mkString(", ")})")

  /** CSV cannot carry nested types; fail with the offending columns
    * instead of Spark's late AnalysisException. */
  private def requireCsvFlat(schema: StructType): Unit = {
    val nested = schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[StructType] ||
        f.dataType.isInstanceOf[MapType] => f.name
    }
    require(nested.isEmpty,
      s"csv cannot encode nested columns: ${nested.mkString(", ")} — use parquet/orc/json")
  }

  /** Schema-preserving write. Partition columns follow the same
    * pruning rationale as [[Ingest.writeNormalized]]. */
  def write(df: DataFrame, dir: String, format: String,
      mode: String = "overwrite", partitionBy: Seq[String] = Nil): Unit = {
    requireSupported(format)
    if (format == "csv") requireCsvFlat(df.schema)
    val w0 = df.write.mode(mode).format(format)
    val w1 = if (format == "csv") w0.option("header", true) else w0
    (if (partitionBy.nonEmpty) w1.partitionBy(partitionBy: _*) else w1).save(dir)
  }

  /** Schema-enforced read: `expected` is applied, not inferred. For CSV
    * the header row is consumed and FAILFAST surfaces malformed rows
    * immediately (the validation layer, not the reader, is where
    * tolerated errors belong). */
  def read(spark: SparkSession, dir: String, format: String,
      expected: StructType): DataFrame = {
    requireSupported(format)
    val r0 = spark.read.format(format).schema(expected)
    val r1 = format match {
      case "csv" => r0.option("header", true).option("mode", "FAILFAST")
      case "json" => r0.option("mode", "FAILFAST")
      case _ => r0
    }
    r1.load(dir)
  }
}
