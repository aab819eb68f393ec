package jsonld.core

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import scala.jdk.CollectionConverters._
import scala.jdk.OptionConverters._

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

  def loadDocument(url: String): RemoteDocument = load(url, maxAlternateDepth)._1

  /** [[loadDocument]] plus the response's RFC 7234 freshness lifetime: the
    * instant until which a cache may serve this document without
    * revalidation, or None when the response is not cacheable (`no-store` /
    * `no-cache` / `private`, or no explicit `max-age`/`s-maxage`/`Expires`
    * — heuristic freshness is deliberately not applied). Consumed by
    * [[CachingHttpDocumentLoader]].
    */
  def loadWithFreshness(url: String): (RemoteDocument, Option[java.time.Instant]) =
    load(url, maxAlternateDepth)

  private def load(url: String, depth: Int): (RemoteDocument, Option[java.time.Instant]) = {
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

    val freshUntil = freshnessOf(resp)
    if (contentType == "text/html") {
      val fragment = {
        val i = url.indexOf('#')
        if (i >= 0) url.substring(i + 1) else ""
      }
      val ex = HtmlExtract.extract(resp.body(), fragment, extractAllScripts = false)
      (RemoteDocument(finalUrl, ex.json, contextUrl, ex.baseHref.orNull), freshUntil)
    } else {
      val doc =
        try Json.parse(resp.body())
        catch {
          case e: Exception =>
            throw JsonLdError(JsonLdError.LoadingDocumentFailed, s"$url: ${e.getMessage}")
        }
      (RemoteDocument(finalUrl, doc, contextUrl), freshUntil)
    }
  }

  /** RFC 7234 response cacheability: explicit directives only.
    *  - `Cache-Control: no-store | no-cache | private` → not cacheable
    *    (conservative: we don't implement must-revalidate semantics, so
    *    no-cache/private mean "don't serve from our cache");
    *  - `max-age` / `s-maxage` (seconds, relative to the response `Date`
    *    or receipt time) → fresh until then;
    *  - else `Expires` (HTTP-date) → fresh until then;
    *  - no explicit freshness → not cacheable (no heuristics).
    */
  private def freshnessOf(resp: HttpResponse[String]): Option[java.time.Instant] = {
    val cc = resp.headers().allValues("Cache-Control").asScala
      .flatMap(_.split(",")).map(_.trim.toLowerCase).toSeq
    if (cc.exists(d => d == "no-store" || d == "no-cache" || d == "private")) None
    else {
      val date = resp.headers().firstValue("Date").asScala
        .flatMap(parseHttpDate).getOrElse(java.time.Instant.now())
      val maxAge = cc.collectFirst {
        case d if d.startsWith("s-maxage=") => d.stripPrefix("s-maxage=")
        case d if d.startsWith("max-age=") => d.stripPrefix("max-age=")
      }.flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      maxAge match {
        case Some(secs) => Some(date.plusSeconds(secs))
        case None => resp.headers().firstValue("Expires").asScala.flatMap(parseHttpDate)
      }
    }
  }

  private def parseHttpDate(s: String): Option[java.time.Instant] =
    scala.util.Try(java.time.Instant.from(
      java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.parse(s))).toOption
}

/** RFC 7234-caching HTTP loader — the Scala analog of the reference's
  * RFC7324CachingDocumentLoader (/root/reference/ld/document_loader.go:292-432):
  * per-URL cache of loaded documents, valid until the response's explicit
  * freshness lifetime (max-age / s-maxage / Expires; no-store / no-cache /
  * private are never cached). Driver-side like the plain loader; bounded
  * (`maxEntries`, oldest-inserted evicted) so an adversarial corpus can't
  * balloon driver memory. `clock` is injectable for tests.
  */
final class CachingHttpDocumentLoader(
    timeout: Duration = Duration.ofSeconds(30),
    maxAlternateDepth: Int = 8,
    maxEntries: Int = 10000,
    clock: () => java.time.Instant = () => java.time.Instant.now()) extends DocumentLoader {

  private val http = new HttpDocumentLoader(timeout, maxAlternateDepth)
  @transient private lazy val cache =
    scala.collection.mutable.LinkedHashMap.empty[String, (RemoteDocument, java.time.Instant)]

  def loadDocument(url: String): RemoteDocument = synchronized {
    cache.get(url) match {
      case Some((doc, freshUntil)) if freshUntil.isAfter(clock()) => doc
      case _ =>
        cache.remove(url) // stale entry (if any) must not linger
        val (doc, freshOpt) = http.loadWithFreshness(url)
        freshOpt.filter(_.isAfter(clock())).foreach { until =>
          if (cache.size >= maxEntries) cache.remove(cache.head._1)
          cache.put(url, (doc, until))
        }
        doc
    }
  }
}
