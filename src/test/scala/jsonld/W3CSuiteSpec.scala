package jsonld

import org.scalatest.funsuite.AnyFunSuite
import jsonld.core._
import jsonld.core.Json._
import java.nio.file.{Files, Paths, Path}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Replays the reference's vendored W3C JSON-LD 1.1 / framing /
  * normalization suites (src/test/resources/testsuite) through our
  * processor, mirroring the reference runner's dispatch
  * (/root/reference/ld/processor_test.go:188-585) with the mock HTTP
  * server replaced by a preloaded Map loader.
  */
class W3CSuiteSpec extends AnyFunSuite {

  private val testDir = {
    val candidates = Seq("src/test/resources/testsuite", "../src/test/resources/testsuite")
    candidates.map(Paths.get(_)).find(Files.exists(_)).getOrElse(
      throw new IllegalStateException("testsuite resources not found; cwd=" + Paths.get("").toAbsolutePath))
  }

  // test-ID prefixes to skip, seeded from the reference's own skip list
  // (/root/reference/ld/skip_test.go) — we intentionally do NOT inherit
  // skips that our implementation passes.
  private val skips: Map[String, Seq[String]] = Map(
    // t0013: HTML context documents (HTML processing is out of scope)
    // test060: pathological factorial hash-N-degree case (reference skips;
    // the pipeline quarantines such documents via the permutation budget)
    "normalization/manifest-urgna2012.jsonld" -> Seq("manifest-urgna2012#test060"),
    "normalization/manifest-urdna2015.jsonld" -> Seq("manifest-urdna2015#test060")
  )

  /** Minimum pass rates (pass / (pass+fail), skips excluded) asserted per
    * manifest. Targets are ≥ the reference's own pass rates.
    */
  private val minPassRate: Map[String, Double] = Map(
    "expand-manifest.jsonld" -> 1.0,
    "remote-doc-manifest.jsonld" -> 1.0,
    "html-manifest.jsonld" -> 1.0,
    "toRdf-manifest.jsonld" -> 1.0,
    "normalization/manifest-urdna2015.jsonld" -> 1.0,
    "normalization/manifest-urgna2012.jsonld" -> 1.0,
    "compact-manifest.jsonld" -> 1.0,
    "flatten-manifest.jsonld" -> 1.0,
    "fromRdf-manifest.jsonld" -> 1.0,
    "frame-manifest.jsonld" -> 1.0
  )

  private def read(p: Path): String = new String(Files.readAllBytes(p), "UTF-8")

  /** Simulates remote-document HTTP semantics for the remote-doc suite:
    * content-type gating, 3xx redirects, context Link headers, and
    * rel=alternate application/ld+json redirects.
    */
  private class SimulatedHttpLoader(files: Map[String, String], baseIri: String,
                                    inputUrl: String,
                                    contentType: String, httpLink: Seq[String],
                                    redirectTo: String) extends DocumentLoader {
    private def guessCt(url: String): String =
      if (url.endsWith(".jsonld")) "application/ld+json"
      else if (url.endsWith(".json")) "application/json"
      else if (url.endsWith(".html")) "text/html"
      else "application/octet-stream"

    private def jsonish(ct: String): Boolean =
      ct == "application/ld+json" || ct == "application/json" || ct.endsWith("+json")

    private def plain(url: String): RemoteDocument = files.get(url) match {
      case Some(body) if url.endsWith(".html") =>
        // HTML documents (including remote contexts) yield their first
        // application/ld+json script element
        val ex = HtmlExtract.extract(body, "", extractAllScripts = false)
        RemoteDocument(url, ex.json, baseHref = ex.baseHref.orNull)
      case Some(body) => RemoteDocument(url, Json.parse(body))
      case None => throw JsonLdError(JsonLdError.LoadingDocumentFailed, s"not found: $url")
    }

    def loadDocument(url: String): RemoteDocument = {
      if (url != inputUrl) return plain(url)
      if (redirectTo != null) // Location is test-root-relative in the manifests
        return plain(Uri.resolve(baseIri, redirectTo)) // documentUrl = final target
      val ct = if (contentType != null) contentType else guessCt(url)

      val links = LinkHeader.parse(httpLink)
      val ctxLinks = links.getOrElse("http://www.w3.org/ns/json-ld#context", Nil)
      val altLinks = links.getOrElse("alternate", Nil)
        .filter(_.`type` == "application/ld+json")

      // rel=alternate application/ld+json is only followed when the
      // content itself is not processable JSON (e.g. text/html)
      if (!jsonish(ct) && altLinks.nonEmpty)
        return plain(Uri.resolve(url, altLinks.head.target))
      if (!jsonish(ct))
        throw JsonLdError(JsonLdError.LoadingDocumentFailed, s"unsupported content type $ct")
      if (ct != "application/ld+json" && ctxLinks.nonEmpty) {
        if (ctxLinks.size > 1)
          throw JsonLdError(JsonLdError.MultipleContextLinkHeaders, url)
        val base = plain(url)
        return RemoteDocument(url, base.document, Uri.resolve(url, ctxLinks.head.target))
      }
      plain(url)
    }
  }

  /** Serves .html documents through HtmlExtract (fragment targeting,
    * extractAllScripts, base href → documentUrl override).
    */
  private class HtmlAwareLoader(files: Map[String, String],
                                extractAllScripts: Boolean) extends DocumentLoader {
    def loadDocument(url: String): RemoteDocument = {
      val hash = url.indexOf('#')
      val (docUrl, fragment) = if (hash >= 0) (url.substring(0, hash), url.substring(hash + 1))
                               else (url, "")
      files.get(docUrl) match {
        case Some(body) if docUrl.endsWith(".html") =>
          val ex =
            try HtmlExtract.extract(body, fragment, extractAllScripts)
            catch {
              // all-scripts mode with no scripts yields an empty document
              case e: JsonLdError if e.code == JsonLdError.LoadingDocumentFailed &&
                  extractAllScripts && fragment.isEmpty =>
                HtmlExtract.Extracted(Json.arr(), None)
            }
          RemoteDocument(docUrl, ex.json, baseHref = ex.baseHref.orNull)
        case Some(body) =>
          try RemoteDocument(docUrl, Json.parse(body))
          catch { case e: Exception =>
            throw JsonLdError(JsonLdError.LoadingDocumentFailed, s"$docUrl: ${e.getMessage}")
          }
        case None =>
          throw JsonLdError(JsonLdError.LoadingDocumentFailed, s"not preloaded: $docUrl")
      }
    }
  }

  private def buildDocs(baseIri: String, baseDir: Path): Map[String, String] = {
    val docs = mutable.HashMap.empty[String, String]
    Files.walk(baseDir).iterator().asScala.foreach { p =>
      if (Files.isRegularFile(p)) {
        val rel = baseDir.relativize(p).toString.replace('\\', '/')
        docs(baseIri + rel) = read(p)
      }
    }
    docs.toMap
  }

  private case class Summary(manifest: String, pass: Int, fail: Int, skip: Int,
                             failures: Seq[String])

  /** EARL assertion log — mirrors the reference's conformance_report.jsonld
    * artifact (/root/reference/conformance_report.jsonld): one
    * earl:Assertion per attempted suite test, written to
    * target/earl/conformance_report.jsonld when the last manifest finishes.
    */
  private object EarlLog {
    val entries = mutable.ArrayBuffer.empty[(String, String)] // (testIri, outcome)
    def add(baseIri: String, manifestRel: String, testId: String, outcome: String): Unit =
      entries.synchronized {
        val iri =
          if (baseIri.nonEmpty) baseIri + manifestRel.stripSuffix(".jsonld") + testId
          else manifestRel.stripSuffix(".jsonld").replaceAll(".*/", "") + "/" + testId
        entries += ((iri, outcome))
      }
    def write(): Unit = entries.synchronized {
      val subject = "https://github.com/graft/jsongoldspark"
      val assertions = entries.map { case (iri, outcome) =>
        s"""    {"@type": "earl:Assertion", "earl:assertedBy": "$subject", "earl:mode": {"@id": "earl:automatic"}, "earl:subject": "$subject", "earl:test": "$iri", "earl:result": {"@type": "earl:TestResult", "earl:outcome": {"@id": "earl:$outcome"}}}"""
      }.mkString(",\n")
      val doc =
        s"""{
           |  "@context": {
           |    "earl": "http://www.w3.org/ns/earl#",
           |    "doap": "http://usefulinc.com/ns/doap#"
           |  },
           |  "@id": "$subject",
           |  "@type": ["doap:Project", "earl:TestSubject", "earl:Software"],
           |  "doap:name": "jsongoldspark",
           |  "doap:programming-language": "Scala",
           |  "@graph": [
           |$assertions
           |  ]
           |}""".stripMargin
      val out = Paths.get("target/earl")
      Files.createDirectories(out)
      Files.write(out.resolve("conformance_report.jsonld"), doc.getBytes("UTF-8"))
      // also refresh the committed artifact at the repo root (the reference
      // ships conformance_report.jsonld there); content is deterministic —
      // no timestamps, manifests run in a fixed order — so the file is
      // diff-stable until conformance itself changes
      Files.write(Paths.get("conformance_report.jsonld"), doc.getBytes("UTF-8"))
    }
  }

  private def runManifest(manifestRel: String): Summary = {
    val manifestPath = testDir.resolve(manifestRel)
    val manifest = Json.parse(read(manifestPath)).asInstanceOf[JObj]
    val baseIri = manifest.getOrElse("baseIri", "").asInstanceOf[String]
    val isJsonLdSuite = baseIri.nonEmpty
    val listKey = if (isJsonLdSuite) "sequence" else "entries"
    val manifestBaseDir = manifestPath.getParent
    val docsMap = if (isJsonLdSuite) buildDocs(baseIri, testDir) else Map.empty[String, String]
    val loader = if (isJsonLdSuite) new MapDocumentLoader(docsMap) else null
    val skipPrefixes = skips.getOrElse(manifestRel, Nil)

    var pass, fail, skip = 0
    val failures = mutable.ArrayBuffer.empty[String]

    manifest(listKey).asInstanceOf[JArr].foreach { t =>
      val tm = t.asInstanceOf[JObj]
      val (testId, testType, evalType, inputName, expectName) =
        if (isJsonLdSuite) {
          val types = tm("@type").asInstanceOf[JArr].map(_.asInstanceOf[String])
          // HtmlTest entries carry the operation as the middle type
          val opType = if (types.last == "jld:HtmlTest" && types.size >= 2) types(types.size - 2)
                       else types.last
          (tm("@id").asInstanceOf[String], opType, types.head,
            tm("input").asInstanceOf[String],
            tm.getOrElse("expect", null).asInstanceOf[String])
        } else {
          (tm("id").asInstanceOf[String], tm("type").asInstanceOf[String],
            "jld:PositiveEvaluationTest", tm("action").asInstanceOf[String],
            tm("result").asInstanceOf[String])
        }

      val purpose = tm.getOrElse("purpose", "").asInstanceOf[String]
      val option = tm.getOrElse("option", null) match {
        case m: JObj @unchecked => m
        case _ => Json.obj()
      }
      val specVersion10 = option.getOrElse("specVersion", null) == "json-ld-1.0"
      // RUN_SKIPPED=1: attempt every skip-listed test (except the
      // pathological normalization test060) to find skips we outgrow
      val attemptSkipped = sys.env.get("RUN_SKIPPED").contains("1") &&
        !testId.contains("test060")
      val shouldSkip = (skipPrefixes.exists(testId.startsWith) && !attemptSkipped) ||
        purpose.contains("RFC3986") || specVersion10

      if (shouldSkip) {
        skip += 1
        EarlLog.add(baseIri, manifestRel, testId, "untested")
      }
      else {
        val inputUrl0 = baseIri + inputName
        val effectiveLoader =
          if (option.contains("httpLink") || option.contains("redirectTo") ||
              option.contains("httpStatus")) {
            val links: Seq[String] = option.getOrElse("httpLink", null) match {
              case a: JArr @unchecked => a.toSeq.map(String.valueOf(_))
              case s: String => Seq(s)
              case _ => Seq.empty
            }
            new SimulatedHttpLoader(docsMap, baseIri, inputUrl0,
              option.getOrElse("contentType", null).asInstanceOf[String],
              links,
              option.getOrElse("redirectTo", null).asInstanceOf[String])
          } else if (inputName.endsWith(".html") || inputName.contains(".html#")) {
            // extractAllScripts defaults true for toRdf and flatten
            val defaultAll = testType == "jld:ToRDFTest" || testType == "jld:FlattenTest"
            new HtmlAwareLoader(docsMap,
              option.get("extractAllScripts") match {
                case Some(b: java.lang.Boolean) => b.booleanValue()
                case _ => defaultAll
              })
          } else if (option.contains("contentType")) {
            new SimulatedHttpLoader(docsMap, baseIri, inputUrl0,
              option.getOrElse("contentType", null).asInstanceOf[String],
              Seq.empty,
              null)
          } else loader
        var opts = JsonLdOptions(documentLoader = effectiveLoader)
        option.get("processingMode").foreach { pm =>
          opts = opts.copy(processingMode = pm.asInstanceOf[String])
        }
        option.get("base").foreach(b => opts = opts.copy(base = b.asInstanceOf[String]))
        option.get("expandContext").foreach { ec =>
          opts = opts.copy(expandContext =
            Json.parse(read(manifestBaseDir.resolve(ec.asInstanceOf[String]))))
        }
        option.get("compactArrays").foreach(v =>
          opts = opts.copy(compactArrays = v.asInstanceOf[Boolean]))
        option.get("omitGraph").foreach(v =>
          opts = opts.copy(omitGraph = java.lang.Boolean.valueOf(v.asInstanceOf[Boolean])))
        option.get("useNativeTypes").foreach(v =>
          opts = opts.copy(useNativeTypes = v.asInstanceOf[Boolean]))
        option.get("useRdfType").foreach(v => opts = opts.copy(useRdfType = v.asInstanceOf[Boolean]))
        option.get("produceGeneralizedRdf").foreach(v =>
          opts = opts.copy(produceGeneralizedRdf = v.asInstanceOf[Boolean]))
        option.get("rdfDirection").foreach(v =>
          opts = opts.copy(rdfDirection = v.asInstanceOf[String]))

        val inputUrl = baseIri + inputName
        var result: Any = null
        var opError: JsonLdError = null
        var unimplemented = false
        try {
          testType match {
            case "jld:ExpandTest" =>
              result = Processor.expand(inputUrl, opts)
            case "jld:ToRDFTest" =>
              result = Processor.toNQuads(inputUrl, opts)
            case "jld:CompactTest" =>
              val ctx = Json.parse(read(manifestBaseDir.resolve(tm("context").asInstanceOf[String])))
              result = Processor.compact(inputUrl, ctx, opts)
            case "jld:FlattenTest" =>
              val ctx = tm.get("context").map(c =>
                Json.parse(read(manifestBaseDir.resolve(c.asInstanceOf[String])))).orNull
              result = Processor.flatten(inputUrl, ctx, opts)
            case "jld:FrameTest" =>
              val frame = Json.parse(read(manifestBaseDir.resolve(tm("frame").asInstanceOf[String])))
              result = Processor.frame(inputUrl, frame, opts)
            case "jld:FromRDFTest" =>
              result = Processor.fromRdf(read(manifestBaseDir.resolve(inputName)), opts)
            case "rdfn:Urdna2015EvalTest" =>
              result = Processor.normalizeNQuads(read(manifestBaseDir.resolve(inputName)),
                opts.copy(algorithm = "URDNA2015"))
            case "rdfn:Urgna2012EvalTest" =>
              result = Processor.normalizeNQuads(read(manifestBaseDir.resolve(inputName)),
                opts.copy(algorithm = "URGNA2012"))
            case other =>
              unimplemented = true
          }
        } catch {
          case e: JsonLdError if e.code == JsonLdError.NotImplemented => unimplemented = true
          case e: JsonLdError => opError = e
          case e: StackOverflowError => opError = JsonLdError("stack overflow", testId)
          case e: Exception => opError = JsonLdError("crash: " + e, testId)
        }

        if (unimplemented) {
          skip += 1
          EarlLog.add(baseIri, manifestRel, testId, "untested")
        } else {
          val ok: Boolean = evalType match {
            case "jld:PositiveEvaluationTest" =>
              if (opError != null) { failures += s"$testId: unexpected error ${opError.getMessage}"; false }
              else if (expectName == null) true
              else if (expectName.endsWith(".nq")) {
                val expected = read(manifestBaseDir.resolve(expectName))
                val actual = result.asInstanceOf[String]
                if (testType.startsWith("rdfn:")) {
                  if (expected == actual) true
                  else { failures += s"$testId: canonical nquads mismatch"; false }
                } else nquadsIsomorphic(expected, actual) || {
                  failures += s"$testId: nquads not isomorphic"; false
                }
              } else {
                val expected = Json.parse(read(manifestBaseDir.resolve(expectName)))
                Json.deepCompare(expected, result) || {
                  failures += s"$testId: json mismatch"; false
                }
              }
            case "jld:NegativeEvaluationTest" =>
              val expectedCode = tm.getOrElse("expectErrorCode",
                tm.getOrElse("expect", "")).asInstanceOf[String]
              val actualCode = if (opError != null) opError.code else ""
              actualCode == expectedCode || {
                failures += s"$testId: expected error '$expectedCode' got '${
                  if (opError != null) opError.code else "<no error>"}'"; false
              }
            case "jld:PositiveSyntaxTest" =>
              opError == null || { failures += s"$testId: unexpected error $opError"; false }
            case _ => true
          }
          if (ok) pass += 1 else fail += 1
          EarlLog.add(baseIri, manifestRel, testId, if (ok) "passed" else "failed")
        }
      }
    }
    Summary(manifestRel, pass, fail, skip, failures.toSeq)
  }

  private def nquadsIsomorphic(expected: String, actual: String): Boolean = {
    def sortLines(s: String): Seq[String] =
      s.split("\n").map(_.trim).filter(_.nonEmpty).sorted.toSeq
    if (sortLines(expected) == sortLines(actual)) return true
    try {
      val c1 = new Canonicalizer("URDNA2015").canonicalize(Rdf.parseNQuads(expected))
      val c2 = new Canonicalizer("URDNA2015").canonicalize(Rdf.parseNQuads(actual))
      if (c1 == c2) return true
    } catch { case _: Exception => }
    // generalized-RDF fallback: URDNA2015 does not relabel blank-node
    // PREDICATES, so brute-force a label bijection over all positions
    // (only viable for small bnode counts)
    val bnodeRe = "_:[A-Za-z0-9]+".r
    val expLines = sortLines(expected)
    val actLines = sortLines(actual)
    if (expLines.size != actLines.size) return false
    val expB = expLines.flatMap(bnodeRe.findAllIn(_)).distinct
    val actB = actLines.flatMap(bnodeRe.findAllIn(_)).distinct
    if (expB.size != actB.size || expB.size > 6) return false
    // boundary-safe label substitution: "_:b1" must not corrupt "_:b10"
    def subst(line: String, m: Map[String, String]): String =
      bnodeRe.replaceAllIn(line, mm =>
        scala.util.matching.Regex.quoteReplacement(m.getOrElse(mm.matched, mm.matched)))
    actB.permutations.exists { perm =>
      // try the bijection actual-label perm(i) -> expected-label expB(i)
      val m = perm.zip(expB).toMap
      actLines.map(subst(_, m)).sorted == expLines
    }
  }

  private val manifests = Seq(
    "expand-manifest.jsonld",
    "remote-doc-manifest.jsonld",
    "html-manifest.jsonld",
    "toRdf-manifest.jsonld",
    "normalization/manifest-urdna2015.jsonld",
    "normalization/manifest-urgna2012.jsonld",
    "compact-manifest.jsonld",
    "flatten-manifest.jsonld",
    "fromRdf-manifest.jsonld",
    "frame-manifest.jsonld"
  )

  manifests.foreach { m =>
    test(s"W3C suite: $m") {
      val s = runManifest(m)
      val total = s.pass + s.fail
      val rate = if (total == 0) 1.0 else s.pass.toDouble / total
      info(f"$m: pass=${s.pass} fail=${s.fail} skip=${s.skip} rate=$rate%.3f")
      if (s.fail > 0) {
        val show = s.failures.take(Int.MaxValue.min(
          sys.env.get("SHOW_FAILURES").map(_.toInt).getOrElse(15)))
        show.foreach(f => info(s"  FAIL $f"))
      }
      val min = minPassRate.getOrElse(m, 0.0)
      assert(rate >= min, f"pass rate $rate%.3f below threshold $min for $m; " +
        s"first failures: ${s.failures.take(10).mkString("; ")}")
    }
  }

  // registered last → runs after every manifest (funsuite preserves order)
  test("EARL conformance report artifact") {
    EarlLog.write()
    val report = Paths.get("target/earl/conformance_report.jsonld")
    assert(Files.exists(report), "conformance report not written")
    val doc = Json.parse(read(report)).asInstanceOf[JObj] // must parse as JSON-LD input
    val assertions = doc("@graph").asInstanceOf[JArr]
    info(s"EARL assertions: ${assertions.size} (${EarlLog.entries.count(_._2 == "passed")} passed)")
    assert(assertions.size > 1400, s"expected full-suite coverage, got ${assertions.size}")
  }
}
