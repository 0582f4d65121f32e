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

  private val HexChars = "0123456789abcdef".toCharArray

  // MessageDigest.getInstance walks the provider registry — reuse one
  // instance per thread (IDs are computed per row in executor loops)
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  def sha256Hex(s: String): String = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  def contentHash(content: String): String = sha256Hex(content)

  def dictHash(obj: JObj): String = sha256Hex(render(obj))

  // 1-entry memo for the episode-hash prefix: rows arrive clustered by
  // episode (normalize sorts per episode), so this turns one of the two
  // sha256s per ID into a string compare for all but the first row of
  // each run
  private val lastEpisode: ThreadLocal[Array[String]] =
    ThreadLocal.withInitial(() => new Array[String](2))

  private def episodeHash12(episodeId: String): String = {
    val memo = lastEpisode.get()
    if (episodeId == memo(0)) memo(1)
    else {
      val h = sha256Hex(episodeId).substring(0, 12)
      memo(0) = episodeId
      memo(1) = h
      h
    }
  }

  private def pad6(position: Int): String = {
    // a negative position would render as "0000-5" (the old %06d gave
    // "-00005") — either silently corrupts the deterministic-ID contract
    require(position >= 0, s"position must be non-negative, got $position")
    val p = Integer.toString(position)
    if (p.length >= 6) p
    else "000000".substring(p.length) + p
  }

  private def format(prefix: String, episodeId: String, position: Int, contentHash8: String): String =
    prefix + "_" + episodeHash12(episodeId) + "_" + pad6(position) + "_" + contentHash8

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
