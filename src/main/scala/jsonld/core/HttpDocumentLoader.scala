package jsonld.core

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import scala.jdk.CollectionConverters._

/** Real HTTP(S) [[DocumentLoader]] over `java.net.http` — intended for the
  * DRIVER-side context pre-pass ([[jsonld.spark.ContextResolver]]), and OFF
  * by default: nothing in the engine constructs one implicitly (this repo's
  * default posture is zero-egress; executors never do per-document I/O at
  * all — they read the broadcast cache the pre-pass produces).
  *
  * Behavioral model is the reference's DefaultDocumentLoader
  * (/root/reference/ld/document_loader.go:85-166), re-expressed on the JDK
  * client:
  *  - GET with the JSON-LD Accept header (`application/ld+json` preferred,
  *    `application/json` next, anything else last);
  *  - non-2xx/200 → LoadingDocumentFailed (never a partial document);
  *  - HTTP redirects followed by the client (final URL becomes
  *    `documentUrl`, as the reference takes `res.Request.URL`);
  *  - Link headers parsed with [[LinkHeader]]: for a plain/`+json` (but not
  *    `ld+json`) response, a single `rel="http://www.w3.org/ns/json-ld#context"`
  *    link populates `contextUrl` (two or more → MultipleContextLinkHeaders);
  *    for a non-JSON response, `rel="alternate" type="application/ld+json"`
  *    triggers one more fetch of the alternate target (bounded depth);
  *  - `text/html` responses go through [[HtmlExtract]] (fragment targeting
  *    honored) — the engine's HTML extraction applies to remote docs too;
  *  - anything else must parse as JSON.
  */
final class HttpDocumentLoader(
    timeout: Duration = Duration.ofSeconds(30),
    maxAlternateDepth: Int = 8) extends DocumentLoader {

  // lazy + transient: built on first driver-side use; never shipped to
  // executors (the loader boundary is driver-only by design)
  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(timeout)
    .build()

  /** The reference's accept header, verbatim (document_loader.go:32). */
  private val AcceptHeader =
    "application/ld+json, application/json;q=0.9, application/javascript;q=0.5, " +
      "text/javascript;q=0.5, text/plain;q=0.2, */*;q=0.1"
  private val ContextRel = "http://www.w3.org/ns/json-ld#context"
  private val JsonLdType = "application/ld+json"
  private val PlainOrSuffixJson = "^application/(\\w*\\+)?json$".r

  def loadDocument(url: String): RemoteDocument = load(url, maxAlternateDepth)

  private def load(url: String, depth: Int): RemoteDocument = {
    if (depth < 0)
      throw JsonLdError(JsonLdError.LoadingDocumentFailed, s"alternate-link chain too deep at $url")
    if (!url.startsWith("http://") && !url.startsWith("https://"))
      throw JsonLdError(JsonLdError.LoadingDocumentFailed, s"unsupported scheme: $url")

    val resp =
      try client.send(
        HttpRequest.newBuilder(URI.create(url)).timeout(timeout)
          .header("Accept", AcceptHeader).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      catch {
        case e: Exception =>
          throw JsonLdError(JsonLdError.LoadingDocumentFailed, s"$url: ${e.getMessage}")
      }
    if (resp.statusCode() != 200)
      throw JsonLdError(JsonLdError.LoadingDocumentFailed,
        s"bad response status code: ${resp.statusCode()} for $url")

    val finalUrl = resp.uri().toString
    val contentType = resp.headers().firstValue("Content-Type").orElse("")
      .split(";")(0).trim.toLowerCase
    val isJson = PlainOrSuffixJson.matches(contentType)

    val links = LinkHeader.parse(resp.headers().allValues("Link").asScala.toSeq)
    var contextUrl: String = null
    if (links.nonEmpty) {
      val ctxLinks = links.getOrElse(ContextRel, Seq.empty)
      if (ctxLinks.nonEmpty && contentType != JsonLdType && isJson) {
        if (ctxLinks.size > 1)
          throw JsonLdError(JsonLdError.MultipleContextLinkHeaders, url)
        contextUrl = Uri.resolve(finalUrl, ctxLinks.head.target)
      }
      val alt = links.getOrElse("alternate", Seq.empty)
      if (alt.nonEmpty && alt.head.`type` == JsonLdType && !isJson)
        return load(Uri.resolve(url, alt.head.target), depth - 1)
    }

    if (contentType == "text/html") {
      val fragment = {
        val i = url.indexOf('#')
        if (i >= 0) url.substring(i + 1) else ""
      }
      val ex = HtmlExtract.extract(resp.body(), fragment, extractAllScripts = false)
      RemoteDocument(finalUrl, ex.json, contextUrl, ex.baseHref.orNull)
    } else {
      val doc =
        try Json.parse(resp.body())
        catch {
          case e: Exception =>
            throw JsonLdError(JsonLdError.LoadingDocumentFailed, s"$url: ${e.getMessage}")
        }
      RemoteDocument(finalUrl, doc, contextUrl)
    }
  }
}
