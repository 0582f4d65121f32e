package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Mirrors the reference's coverage metrics tests
  * (tests/test_quality_metrics.py:83-225: merge overlaps, gap detection;
  * coverage can never exceed the enclosing range). */
class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("union merges overlapping and touching intervals") {
    val df = Seq(("u", 0L, 10L), ("u", 5L, 15L), ("u", 15L, 20L), ("u", 30L, 40L))
      .toDF("k", "s", "e")
    val out = Intervals.unionDuration(df, Seq("k"), "s", "e").collect().head
    assert(out.getAs[Long]("union_len") == 30L) // [0,20] + [30,40]
    assert(out.getAs[Long]("n_islands") == 2L)
  }

  test("union of disjoint intervals is their total length") {
    val df = Seq(("u", 0L, 1L), ("u", 2L, 3L), ("u", 4L, 5L)).toDF("k", "s", "e")
    val out = Intervals.unionDuration(df, Seq("k"), "s", "e").collect().head
    assert(out.getAs[Long]("union_len") == 3L && out.getAs[Long]("n_islands") == 3L)
  }

  test("union length never exceeds max(e) - min(s)") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      val s = rng.nextInt(1000).toLong; ("u", s, s + 1 + rng.nextInt(50))
    }
    val out = Intervals.unionDuration(rows.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .collect().head
    val span = rows.map(_._3).max - rows.map(_._2).min
    assert(out.getAs[Long]("union_len") <= span)
  }

  test("overlap pair counting finds exactly the strict overlaps") {
    val df = Seq(("u", 1L, 0L, 10L), ("u", 2L, 5L, 15L), ("u", 3L, 10L, 20L))
      .toDF("k", "id", "s", "e")
    // 1-2 overlap, 2-3 overlap; 1-3 touch only (strict inequality)
    val out = Intervals.overlapPairCounts(df, Seq("k"), "s", "e", "id").collect().head
    assert(out.getAs[Long]("n_overlap_pairs") == 2L)
  }

  test("banded overlap counting matches the quadratic join on random data") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      val k = s"ep${i % 3}"
      val st = rng.nextInt(500).toDouble
      (k, i.toLong, st, st + 1 + rng.nextInt(80))
    }
    val df = rows.toDF("k", "id", "s", "e")
    val exact = Intervals.overlapPairCounts(df, Seq("k"), "s", "e", "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (width <- Seq(5.0, 40.0, 1000.0)) {
      val banded = Intervals.overlapPairCountsBanded(df, Seq("k"), "s", "e", "id", width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(banded == exact, s"width=$width")
    }
  }

  test("banded overlap join plan is an equi-join on (key, band)") {
    val df = Seq(("u", 1L, 0.0, 10.0), ("u", 2L, 5.0, 15.0)).toDF("k", "id", "s", "e")
    val plan = Intervals.overlapPairCountsBanded(df, Seq("k"), "s", "e", "id", 10.0)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("_band"))
  }
}
