package graft.core

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import CanonicalJson._

/** Deterministic content-addressed artifact IDs
  * (reference: src/lakehouse/ids.py:56-207).
  *
  * Format: {utt|spn|bet|sec}_{sha256(episode_id)[:12]}_{position:06d}_{sha256(content)[:8]}
  * where content is the canonical JSON of the defining fields — timestamps
  * rounded to 2 decimals (ids.py:92-93), child-ID lists sorted (ids.py:132),
  * long texts folded to a 16-hex text_hash (ids.py:133).
  */
object Ids {

  def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  def contentHash(content: String): String = sha256Hex(content)

  def dictHash(obj: JObj): String = sha256Hex(render(obj))

  private def format(prefix: String, episodeId: String, position: Int, contentHash8: String): String =
    f"${prefix}_${sha256Hex(episodeId).take(12)}_$position%06d_$contentHash8"

  def utteranceId(episodeId: String, position: Int, text: String,
      speaker: String, start: Double, end: Double): String = {
    val content = JObj(Seq(
      "text" -> JStr(text),
      "speaker" -> JStr(speaker),
      "start" -> JFloat(pyRound(start, 2)),
      "end" -> JFloat(pyRound(end, 2))))
    format("utt", episodeId, position, dictHash(content).take(8))
  }

  def spanId(episodeId: String, position: Int, speaker: String,
      utteranceIds: Seq[String], text: String): String = {
    val content = JObj(Seq(
      "speaker" -> JStr(speaker),
      "utterance_ids" -> JArr(utteranceIds.sorted.map(JStr)),
      "text_hash" -> JStr(contentHash(text).take(16))))
    format("spn", episodeId, position, dictHash(content).take(8))
  }

  def beatId(episodeId: String, position: Int, spanIds: Seq[String], text: String): String = {
    val content = JObj(Seq(
      "span_ids" -> JArr(spanIds.sorted.map(JStr)),
      "text_hash" -> JStr(contentHash(text).take(16))))
    format("bet", episodeId, position, dictHash(content).take(8))
  }

  def sectionId(episodeId: String, position: Int, beatIds: Seq[String], text: String): String = {
    val content = JObj(Seq(
      "beat_ids" -> JArr(beatIds.sorted.map(JStr)),
      "text_hash" -> JStr(contentHash(text).take(16))))
    format("sec", episodeId, position, dictHash(content).take(8))
  }

  private val IdPattern = "^(utt|spn|bet|sec)_[0-9a-f]{12}_[0-9]{6}_[0-9a-f]{8}$".r

  def isValidFormat(id: String, idType: String): Boolean = {
    val prefix = idType match {
      case "utterance" => "utt_"
      case "span"      => "spn_"
      case "beat"      => "bet_"
      case "section"   => "sec_"
      case _           => return false
    }
    id != null && id.startsWith(prefix) && IdPattern.matches(id)
  }
}
