package graft.core

/** C18/C20 driver-side config helpers. */
object Config {

  /** C18: `${VAR}` / `${VAR:-default}` interpolation against an
    * environment map (reference: snapshot/config.py:305-388). */
  def interpolateEnv(s: String, env: Map[String, String] = sys.env): String = {
    val pattern = """\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-([^}]*))?\}""".r
    pattern.replaceAllIn(s, m => {
      val value = env.get(m.group(1)).orElse(Option(m.group(2))).getOrElse("")
      scala.util.matching.Regex.quoteReplacement(value)
    })
  }

  /** `key = value` config-file parsing with `${VAR}` interpolation;
    * '#' starts a comment. The flat-config format shared by threshold
    * overrides (Quality.loadThresholds) and validator routing
    * (Guardrails.loadRouting). Later duplicate keys win. */
  def loadKeyValues(path: String): Map[String, String] = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    scala.jdk.CollectionConverters.ListHasAsScala(lines).asScala
      .map(interpolateEnv(_))
      .map(_.takeWhile(_ != '#').trim)
      .filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k.trim -> v.trim }
      .toMap
  }

  /** C20: extract status and metric values from a rendered quality
    * report (reference: snapshot/manifest.py:139-238 regex extraction).
    * Works on graft.quality.Quality.renderMarkdown output. The RELEASE
    * gate over full reports is `graft.snapshot.Snapshot.parseQaReport`
    * (distinct name on purpose — that one parses the reference's
    * quality_assessment.md format into the manifest's qa_status block;
    * this one summarizes graft's own compact metric table). */
  final case class QaSummary(status: Option[String], metrics: Map[String, Double])

  def parseReportSummary(md: String): QaSummary = {
    val status = """\*\*Status: (\w+)\*\*""".r.findFirstMatchIn(md).map(_.group(1))
    val metric = """\| ([a-zA-Z0-9_]+) \| (-?[0-9]+\.[0-9]+) \|""".r
    val metrics = metric.findAllMatchIn(md)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    QaSummary(status, metrics)
  }
}
