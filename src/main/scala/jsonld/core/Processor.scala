package jsonld.core

import Json._
import JsonLdUtils._
import Rdf._
import scala.collection.mutable

/** Processor-level entry points (JSON-LD 1.1 API §6 JsonLdProcessor):
  * expand / compact / flatten / frame / toRdf / fromRdf / normalize.
  * All pure per-document transforms — safe to call inside Spark tasks.
  */
object Processor {

  /** Expansion, including document loading for IRI inputs and the
    * expandContext option. Returns the expanded array (JArr).
    */
  def expand(input0: Any, opts0: JsonLdOptions): JArr = {
    var opts = opts0
    var input = input0
    var remoteContext: String = null

    input match {
      case iri: String if iri.contains(":") =>
        val rd = opts.documentLoader.loadDocument(iri)
        input = rd.document
        if (opts.base == "") opts = opts.copy(base = rd.documentUrl)
        if (rd.contextUrl != null && rd.contextUrl.nonEmpty) remoteContext = rd.contextUrl
      case _ =>
    }

    var activeCtx = new Context(opts)
    if (opts.expandContext != null) {
      var exCtx = Json.deepClone(opts.expandContext)
      exCtx match {
        case m: JObj @unchecked if m.contains("@context") => exCtx = m("@context")
        case _ =>
      }
      activeCtx = activeCtx.parse(exCtx)
    }
    if (remoteContext != null) activeCtx = activeCtx.parse(remoteContext)

    var expanded = Expansion.expand(activeCtx, "", input, opts)

    expanded match {
      case m: JObj @unchecked if m.isEmpty => expanded = null
      case m: JObj @unchecked if m.contains("@graph") && m.size == 1 => expanded = m("@graph")
      case _ =>
    }
    if (expanded == null) return Json.arr()
    expanded match {
      case a: JArr @unchecked => a
      case other => Json.arr(other)
    }
  }

  /** Deserialize JSON-LD to an RDF dataset. */
  def toRdf(input: Any, opts: JsonLdOptions): RdfDataset = {
    val expanded = expand(input, opts)
    ToRdf.toRdf(expanded, opts)
  }

  /** Deserialize to N-Quads text. */
  def toNQuads(input: Any, opts: JsonLdOptions): String =
    datasetToNQuads(toRdf(input, opts))

  /** Normalize (canonicalize): input is JSON-LD (or an RdfDataset), output
    * canonical sorted N-Quads string.
    */
  def normalize(input: Any, opts: JsonLdOptions): String = {
    val dataset = input match {
      case ds: RdfDataset => ds
      case other => toRdf(other, opts)
    }
    new Canonicalizer(opts.algorithm).canonicalize(dataset)
  }

  def normalizeNQuads(nquads: String, opts: JsonLdOptions): String =
    new Canonicalizer(opts.algorithm).canonicalize(parseNQuads(nquads))

  // Implemented in later build steps (SURVEY.md §7.1 steps 7-10):
  def compact(input: Any, context: Any, opts: JsonLdOptions): Any =
    throw JsonLdError(JsonLdError.NotImplemented, "compact")
  def flatten(input: Any, context: Any, opts: JsonLdOptions): Any =
    throw JsonLdError(JsonLdError.NotImplemented, "flatten")
  def frame(input: Any, frame: Any, opts: JsonLdOptions): Any =
    throw JsonLdError(JsonLdError.NotImplemented, "frame")
  def fromRdf(input: Any, opts: JsonLdOptions): Any =
    throw JsonLdError(JsonLdError.NotImplemented, "fromRdf")
}
