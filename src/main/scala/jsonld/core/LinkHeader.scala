package jsonld.core

import scala.collection.mutable

/** RFC 5988/8288 HTTP Link header parsing, keyed by `rel` — general (not
  * test-inlined) so any HTTP-speaking DocumentLoader gets the same context
  * / alternate discovery semantics. Mirrors the reference's
  * ParseLinkHeader (/root/reference/ld/document_loader.go:187-224):
  * multiple headers or comma-separated link-values, `<target>` URI
  * reference, `;`-separated parameters with optional quoting, and a rel
  * value that may itself be a space-separated list of relation types.
  */
object LinkHeader {

  /** One link-value: the target URI reference plus its parameters
    * (lower-cased names; quotes stripped).
    */
  final case class LinkValue(target: String, params: Map[String, String]) {
    def rel: String = params.getOrElse("rel", "")
    def `type`: String = params.getOrElse("type", "")
  }

  /** Parse one or more Link header field values into rel → link-values.
    * A link-value with `rel="a b"` is indexed under both "a" and "b".
    * Malformed entries are skipped (headers are adversarial input; a bad
    * link must not fail document loading).
    */
  def parse(headers: Seq[String]): Map[String, Seq[LinkValue]] = {
    val out = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[LinkValue]]
    headers.flatMap(splitValues).foreach { lv =>
      parseLinkValue(lv).foreach { v =>
        v.rel.split("\\s+").filter(_.nonEmpty).foreach { r =>
          out.getOrElseUpdate(r, mutable.ArrayBuffer.empty) += v
        }
      }
    }
    out.map { case (k, v) => (k, v.toSeq) }.toMap
  }

  /** Split a header value on top-level commas (not inside quotes or <>). */
  private def splitValues(header: String): Seq[String] = {
    val parts = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQuote = false
    var inAngle = false
    header.foreach {
      case '"' if !inAngle => inQuote = !inQuote; sb += '"'
      case '<' if !inQuote => inAngle = true; sb += '<'
      case '>' if !inQuote => inAngle = false; sb += '>'
      case ',' if !inQuote && !inAngle => parts += sb.toString; sb.clear()
      case c => sb += c
    }
    if (sb.nonEmpty) parts += sb.toString
    parts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private val targetRe = "^\\s*<([^>]*)>\\s*(.*)$".r

  /** Split on top-level `sep` (not inside quotes). */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val parts = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQuote = false
    s.foreach {
      case '"' => inQuote = !inQuote; sb += '"'
      case c if c == sep && !inQuote => parts += sb.toString; sb.clear()
      case c => sb += c
    }
    if (sb.nonEmpty) parts += sb.toString
    parts.toSeq
  }

  private def parseLinkValue(s: String): Option[LinkValue] = s match {
    case targetRe(target, rest) =>
      val params = mutable.LinkedHashMap.empty[String, String]
      splitTop(rest, ';').map(_.trim).filter(_.nonEmpty).foreach { p =>
        val eq = p.indexOf('=')
        if (eq > 0) {
          val k = p.substring(0, eq).trim.toLowerCase
          var v = p.substring(eq + 1).trim
          if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
            v = v.substring(1, v.length - 1)
          if (!params.contains(k)) params(k) = v // first occurrence wins (RFC 8288 §3)
        }
      }
      Some(LinkValue(target, params.toMap))
    case _ => None
  }
}
