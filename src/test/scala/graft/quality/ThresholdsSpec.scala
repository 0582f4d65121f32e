package graft.quality

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class ThresholdsSpec extends AnyFunSuite {

  test("thresholdsFrom overrides named fields and ignores unknown keys") {
    val t = Quality.thresholdsFrom(Map(
      "coverage_min" -> "80.5",
      "timestamp_regressions_max" -> "3",
      "neighbor_k" -> "25",
      "no_such_threshold" -> "1.0"))
    assert(t.coverageMin == 80.5)
    assert(t.timestampRegressionsMax == 3L)
    assert(t.neighborK == 25)
    assert(t.spanLengthMin == 20.0) // untouched default
  }

  test("loadThresholds parses key=value with comments and env interpolation") {
    val f = Files.createTempFile("graft_thresholds", ".conf")
    Files.writeString(f,
      """# quality thresholds
        |coverage_min = 85.0   # relaxed for backfills
        |span_length_max = ${GRAFT_TEST_SPAN_MAX:-150.0}
        |
        |exact_duplicate_max_percent = 2.5
        |""".stripMargin)
    val t = Quality.loadThresholds(f.toString)
    assert(t.coverageMin == 85.0)
    assert(t.spanLengthMax == 150.0) // env default used
    assert(t.exactDuplicateMaxPercent == 2.5)
  }
}
