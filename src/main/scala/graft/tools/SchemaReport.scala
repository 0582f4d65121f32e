package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-start guard: diff the current testdata schema against the
  * expected one and print the deltas BEFORE anything runs. The corpus is
  * regenerated between rounds and has already flipped a column type once
  * (`events.ts`: ns-INT64 → µs TIMESTAMP_NTZ), silently breaking every
  * event query until the loader was made schema-adaptive — this makes the
  * next flip a one-line diagnosis instead of a debugging session.
  *
  * Usage: runMain graft.tools.SchemaReport [sfDir]
  * Prints one line per table; exit code 1 iff any delta was found.
  */
object SchemaReport {

  /** Expected column → acceptable Spark catalogStrings. A set per column
    * because some columns legitimately vary by corpus generation (the
    * loaders adapt); a type OUTSIDE the set is a real break. */
  val expected: Seq[(String, Seq[(String, Set[String])])] = Seq(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Set("timestamp", "timestamp_ntz"),
      "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Set("timestamp", "timestamp_ntz")),
    // ts has shipped as ns-INT64 (read as bigint under nanosAsLong) AND
    // as µs timestamp — the loader adapts to all three
    "events" -> Seq("event_id" -> Set("bigint"),
      "ts" -> Set("bigint", "timestamp", "timestamp_ntz"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>", "array<double>"),
      "label" -> Set("int")))

  /** Diff one directory's tables; returns the delta lines (empty = clean). */
  def diff(spark: SparkSession, dir: String): Seq[String] = {
    // nanosAsLong so an ns-INT64 events generation reads instead of
    // throwing — the comparison then sees `bigint`, which is expected
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    expected.flatMap { case (table, cols) =>
      val p = graft.Tables.path(dir, table)
      scala.util.Try(spark.read.parquet(p).schema
          .map(f => f.name -> f.dataType.catalogString).toMap) match {
        case scala.util.Failure(e) =>
          Seq(s"$table: UNREADABLE ($p): ${e.getMessage.linesIterator.next()}")
        case scala.util.Success(act) =>
          val expNames = cols.map(_._1).toSet
          val missing = cols.collect { case (n, ok) if !act.contains(n) =>
            s"$table.$n: MISSING (expected one of ${ok.mkString("/")})" }
          val retyped = cols.collect { case (n, ok) if act.contains(n) && !ok(act(n)) =>
            s"$table.$n: TYPE ${act(n)} (expected one of ${ok.mkString("/")})" }
          val extra = act.keys.filterNot(expNames).toSeq.sorted
            .map(n => s"$table.$n: NEW COLUMN (${act(n)}) — harmless unless a query needs it")
          missing ++ retyped ++ extra
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val deltas = diff(spark, dir)
    if (deltas.isEmpty) println(s"schema OK: all ${expected.size} tables match expected ($dir)")
    else { println(s"SCHEMA DELTAS in $dir:"); deltas.foreach(d => println(s"  $d")) }
    spark.stop()
    if (deltas.nonEmpty) sys.exit(1)
  }
}
