package jsonld.spark

import jsonld.core.{Json, JsonLdUtils}
import java.security.MessageDigest

/** Embedded JSON-LD detection — the pipeline's generator stage.
  *
  * The reference processes whole documents; a source-repo corpus instead
  * holds files that *embed* JSON-LD: .jsonld/.json bodies, HTML
  * `<script type="application/ld+json">` islands, and manifest-style JSON
  * with @context/@graph markers. Detection is deliberately a separate,
  * cheap, narrow stage placed before the expensive expansion stage —
  * Catalyst cannot see inside closures, so stage ordering is our
  * responsibility (SURVEY.md §4.2).
  */
object Detect extends Serializable {

  /** Cheap pre-filter predicate, usable as a Column expression upstream:
    * content must mention a JSON-LD keyword or the file must look like JSON.
    */
  def cheapSignal(lang: String, path: String, content: String): Boolean = {
    if (content == null || content.isEmpty) return false
    val l = if (lang == null) "" else lang.toLowerCase
    if (l == "jsonld" || path.endsWith(".jsonld")) return true
    content.contains("@context") || content.contains("@graph") ||
      (content.contains("@id") && content.contains("@type")) ||
      content.contains("application/ld+json")
  }

  private val scriptRe =
    "(?is)<script[^>]*type\\s*=\\s*[\"']application/ld\\+json[\"'][^>]*>(.*?)</script>".r

  // thread-local digest: getInstance's locked provider lookup serializes
  // executor threads at scale; digest(bytes) resets, so reuse is safe here
  // (no nested use)
  private val sha256Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))
  private val HexChars = "0123456789abcdef".toCharArray

  def sha256Hex(s: String): String = {
    val d = sha256Local.get().digest(s.getBytes("UTF-8"))
    val out = new Array[Char](64)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Extract 0..n candidate JSON-LD documents from one file. Pure; returns
    * raw JSON strings — parsing/validation happens in the transform stage so
    * detection stays cheap.
    */
  def detect(f: RepoFile): Iterator[DetectedDoc] = {
    if (!cheapSignal(f.lang, f.path, f.content)) return Iterator.empty
    val sha = sha256Hex(f.content)
    val base = s"graft://${f.repo}/${f.path}"
    val lower = if (f.lang == null) "" else f.lang.toLowerCase

    val candidates: Seq[String] =
      if (lower == "html" || f.path.endsWith(".html") || f.path.endsWith(".htm")) {
        scriptRe.findAllMatchIn(f.content).map(_.group(1).trim).toSeq
      } else if (lower == "jsonld" || lower == "json" ||
                 f.path.endsWith(".jsonld") || f.path.endsWith(".json")) {
        Seq(f.content)
      } else {
        // source files: only extract when the whole body parses as JSON
        // with JSON-LD markers (manifest-style); skip everything else
        val t = f.content.trim
        if ((t.startsWith("{") || t.startsWith("[")) &&
            (t.contains("@context") || t.contains("@graph"))) Seq(t)
        else Seq.empty
      }

    candidates.iterator.zipWithIndex.flatMap { case (json, idx) =>
      val t = json.trim
      if (t.isEmpty || !(t.startsWith("{") || t.startsWith("["))) Iterator.empty
      else Iterator.single(DetectedDoc(
        // short commit keeps the id unique per snapshot while saving ~50
        // bytes on every downstream quad row (docId rides the shuffle)
        docId = s"${f.repo}/${f.path}@${f.commit.take(12)}#$idx",
        repo = f.repo, path = f.path, commit = f.commit,
        docIdx = idx, baseIri = base, json = t, contentSha256 = sha))
    }
  }
}
