package jsonld.core

/** RFC 3986 URI handling: parse (appendix B regex), reference resolution
  * (§5.2), dot-segment removal (§5.2.4), and base-relativization for
  * compaction. Implemented from the RFC; edge-case parity targets are the
  * W3C suite fixtures (the reference's own URL layer is ld/url.go).
  */
object Uri {

  /** RFC 3986 Appendix B parsing regex. */
  private val rfc3986 =
    "^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\\?([^#]*))?(#(.*))?".r

  final case class Parsed(
      scheme: String,      // null if absent
      authority: String,   // null if absent (no "//")
      path: String,        // possibly ""
      query: String,       // null if absent (includes no '?')
      fragment: String     // null if absent
  ) {
    def isAbsolute: Boolean = scheme != null

    def render: String = {
      val sb = new StringBuilder
      if (scheme != null) { sb.append(scheme); sb.append(':') }
      if (authority != null) { sb.append("//"); sb.append(authority) }
      sb.append(path)
      if (query != null) { sb.append('?'); sb.append(query) }
      if (fragment != null) { sb.append('#'); sb.append(fragment) }
      sb.toString
    }
  }

  def parse(s: String): Parsed = {
    rfc3986.findFirstMatchIn(s) match {
      case Some(m) =>
        Parsed(
          scheme = m.group(2),
          authority = if (m.group(3) != null) m.group(4) else null,
          path = if (m.group(5) != null) m.group(5) else "",
          query = m.group(7),
          fragment = m.group(9)
        )
      case None => Parsed(null, null, s, null, null)
    }
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    if (path.isEmpty) return ""
    var input = path
    val output = new StringBuilder
    while (input.nonEmpty) {
      if (input.startsWith("../")) input = input.substring(3)
      else if (input.startsWith("./")) input = input.substring(2)
      else if (input.startsWith("/./")) input = "/" + input.substring(3)
      else if (input == "/.") input = "/"
      else if (input.startsWith("/../")) {
        input = "/" + input.substring(4)
        trimLastSegment(output)
      } else if (input == "/..") {
        input = "/"
        trimLastSegment(output)
      } else if (input == "." || input == "..") input = ""
      else {
        // move first segment (incl. leading '/') to output
        var i = 0
        if (input.startsWith("/")) i = 1
        val next = input.indexOf('/', i)
        if (next < 0) { output.append(input); input = "" }
        else { output.append(input.substring(0, next)); input = input.substring(next) }
      }
    }
    output.toString
  }

  private def trimLastSegment(sb: StringBuilder): Unit = {
    val idx = sb.lastIndexOf("/")
    if (idx >= 0) sb.setLength(idx) else sb.setLength(0)
  }

  /** RFC 3986 §5.2.2 transform references; strict mode. */
  def resolve(baseStr: String, refStr: String): String = {
    if (baseStr == null || baseStr.isEmpty) return refStr
    if (refStr == null || refStr.isEmpty) {
      // keep base without fragment
      val b = parse(baseStr)
      return b.copy(fragment = null).render
    }
    val base = parse(baseStr)
    val r = parse(refStr)
    var t: Parsed = null
    if (r.scheme != null) {
      t = Parsed(r.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
    } else if (r.authority != null) {
      t = Parsed(base.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
    } else if (r.path.isEmpty) {
      val q = if (r.query != null) r.query else base.query
      t = Parsed(base.scheme, base.authority, base.path, q, r.fragment)
    } else if (r.path.startsWith("/")) {
      t = Parsed(base.scheme, base.authority, removeDotSegments(r.path), r.query, r.fragment)
    } else {
      val merged =
        if (base.authority != null && base.path.isEmpty) "/" + r.path
        else {
          val idx = base.path.lastIndexOf('/')
          if (idx >= 0) base.path.substring(0, idx + 1) + r.path else r.path
        }
      t = Parsed(base.scheme, base.authority, removeDotSegments(merged), r.query, r.fragment)
    }
    t.render
  }

  /** Make `iri` relative to `base` if possible (used by IRI compaction).
    * Segment-matching semantics: when the target carries a query or
    * fragment, all path segments may be consumed (yielding "?q" / "#f"
    * forms); otherwise the final segment is kept ("things/1" vs itself →
    * "1").
    */
  def removeBase(baseStr: String, iri: String): String = {
    if (baseStr == null || baseStr.isEmpty) return iri
    val base = parse(baseStr)

    val root =
      if (base.scheme != null) base.scheme + "://" + (if (base.authority != null) base.authority else "")
      else if (!iri.startsWith("//")) "//"
      else ""
    if (!iri.startsWith(root)) return iri

    val rel = parse(iri.substring(root.length))
    val basePathNorm = removeDotSegments(if (base.path.isEmpty) "/" else base.path)
    val relPathNorm = removeDotSegments(rel.path)

    var baseSegments = basePathNorm.split("/", -1).toList
    var iriSegments = relPathNorm.split("/", -1).toList
    val hasSuffix = (rel.fragment != null && rel.fragment.nonEmpty) ||
      (rel.query != null && rel.query.nonEmpty)
    val last = if (hasSuffix) 0 else 1

    while (baseSegments.nonEmpty && iriSegments.length > last &&
           baseSegments.head == iriSegments.head) {
      baseSegments = baseSegments.tail
      iriSegments = iriSegments.tail
    }

    val sb = new StringBuilder
    if (baseSegments.nonEmpty) {
      // the last base segment is a file (unless the path ends with '/') —
      // it does not contribute a '../'
      if (!basePathNorm.endsWith("/") || baseSegments.head == "")
        baseSegments = baseSegments.dropRight(1)
      baseSegments.foreach(_ => sb.append("../"))
    }
    sb.append(iriSegments.mkString("/"))
    if (rel.query != null && rel.query.nonEmpty) sb.append('?').append(rel.query)
    if (rel.fragment != null && rel.fragment.nonEmpty) sb.append('#').append(rel.fragment)
    if (sb.isEmpty) "./" else sb.toString
  }
}
