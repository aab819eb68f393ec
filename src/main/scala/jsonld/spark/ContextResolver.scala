package jsonld.spark

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.broadcast.Broadcast
import jsonld.core._
import scala.collection.mutable

/** Driver-side pre-pass that turns the corpus's remote-context URL set
  * into the broadcast cache the executors run against.
  *
  * Cluster architecture (SURVEY.md / north rule): executors NEVER do I/O
  * per document — `Pipeline.transformStage` only sees a
  * `Broadcast[Map[url, body]]`. This resolver is the missing front half:
  *
  *  1. `collectContextUrls` — a distributed scan over the detected docs
  *    that extracts every remote `@context` reference (a cheap JSON parse +
  *    walk; no expansion). One shuffle (`distinct` on the URL — a tiny
  *    set by construction: real corpora reference a few thousand distinct
  *    contexts across billions of documents).
  *  2. `resolveClosure` — DRIVER-side: fetch each URL with a pluggable
  *    [[jsonld.core.DocumentLoader]] and chase nested remote `@context`
  *    references (contexts importing contexts) to a fixed point.
  *    Unresolvable URLs are RETURNED, not thrown — at corpus scale a dead
  *    URL must quarantine the documents that reference it, not kill the
  *    job.
  *
  * The fetching loader is pluggable because this sandbox is zero-egress:
  * tests use [[FileDocumentLoader]] / [[jsonld.core.MapDocumentLoader]];
  * a real deployment passes an HTTP loader (with RFC 7234 caching if
  * desired) — the closure logic, error channel, and broadcast contract
  * are identical. Mirrors the role of the reference's DefaultDocumentLoader
  * + caching wrappers (/root/reference/ld/document_loader.go:85-166,292-432)
  * relocated to the driver, which is the only place per-URL I/O is sane on
  * a cluster.
  */
object ContextResolver {

  /** Remote-context URL extraction from one parsed JSON-LD document: every
    * string value of an `@context` key (directly or inside an array),
    * recursively — scoped contexts in term definitions included — plus the
    * string value of any `@import` key inside an inline context (JSON-LD
    * 1.1 §4.1.10: `@import` loads another remote context into the current
    * one, so the closure must chase it exactly like a remote `@context`;
    * executor-side expansion resolves it against the same broadcast cache,
    * Context.scala @import handling).
    */
  def contextUrlsOf(doc: Any): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    def fromContextValue(v: Any): Unit = v match {
      case s: String if s.startsWith("http://") || s.startsWith("https://") => out += s
      case arr: Json.JArr @unchecked => arr.foreach(fromContextValue)
      case m: Json.JObj @unchecked => // inline ctx: harvest @import, scope further
        m.foreach { case (k, v2) => if (k == "@import") fromContextValue(v2) else walk(v2) }
      case _ =>
    }
    def walk(node: Any): Unit = node match {
      case m: Json.JObj @unchecked =>
        m.foreach { case (k, v) =>
          if (k == "@context" || k == "@import") fromContextValue(v) else walk(v)
        }
      case arr: Json.JArr @unchecked => arr.foreach(walk)
      case _ =>
    }
    walk(doc)
    out.distinct.toSeq
  }

  /** Distributed URL harvest over detected docs. Docs that fail to parse
    * contribute nothing here — the main pipeline quarantines them.
    */
  def collectContextUrls(docs: Dataset[DetectedDoc]): Dataset[String] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { iter =>
      iter.flatMap { d =>
        try contextUrlsOf(Json.parse(d.json))
        catch { case _: Exception => Iterator.empty }
      }
    }.distinct()
  }

  /** Driver-side closure resolution. Returns (resolved url → raw body,
    * failed url → error message). Bounded by `maxDocs` as a defense
    * against adversarial context chains.
    */
  def resolveClosure(urls: Seq[String], fetch: DocumentLoader,
                     maxDocs: Int = 10000): (Map[String, String], Map[String, String]) = {
    val resolved = mutable.LinkedHashMap.empty[String, String]
    val failed = mutable.LinkedHashMap.empty[String, String]
    val queue = mutable.Queue.empty[String]
    queue ++= urls.distinct
    while (queue.nonEmpty && resolved.size < maxDocs) {
      val url = queue.dequeue()
      if (!resolved.contains(url) && !failed.contains(url)) {
        try {
          val rd = fetch.loadDocument(url)
          val body = Json.serialize(rd.document)
          resolved += url -> body
          // chase nested remote contexts (a context document may import
          // others via its own @context / @import)
          contextUrlsOf(rd.document).foreach { u =>
            if (!resolved.contains(u) && !failed.contains(u)) queue += u
          }
        } catch {
          case e: JsonLdError => failed += url -> e.getMessage
          case e: Exception => failed += url -> String.valueOf(e.getMessage)
        }
      }
    }
    (resolved.toMap, failed.toMap)
  }

  /** The full pre-pass: harvest (distributed) → resolve (driver) →
    * broadcast. `collect()` here is correct, not a scale smell: the URL
    * set is the DISTINCT remote contexts of the corpus — bounded and tiny
    * relative to the corpus itself.
    */
  def buildCache(spark: SparkSession, docs: Dataset[DetectedDoc], fetch: DocumentLoader)
      : (Broadcast[Map[String, String]], Map[String, String]) = {
    val urls = collectContextUrls(docs).collect().toSeq.sorted
    val (resolved, failed) = resolveClosure(urls, fetch)
    (spark.sparkContext.broadcast(resolved), failed)
  }
}

/** Loads documents from the local/cluster filesystem (`file://` URLs or a
  * url → path mapping) — the zero-egress stand-in for an HTTP loader in
  * the driver pre-pass, and useful in production for vendored context
  * sets shipped with the job.
  */
final class FileDocumentLoader(urlToPath: String => Option[String]) extends DocumentLoader {
  def loadDocument(url: String): RemoteDocument = {
    val path = urlToPath(url).getOrElse {
      if (url.startsWith("file://")) url.stripPrefix("file://")
      else throw JsonLdError(JsonLdError.LoadingDocumentFailed, s"unmapped url: $url")
    }
    try {
      val body = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
      RemoteDocument(url, Json.parse(body))
    } catch {
      case e: JsonLdError => throw e
      case e: Exception =>
        throw JsonLdError(JsonLdError.LoadingDocumentFailed, s"$url: ${e.getMessage}")
    }
  }
}
