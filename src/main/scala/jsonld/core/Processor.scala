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
        // an HTML <base href> resolves against the effective base (option
        // base if set, else document URL) and wins; otherwise the
        // document's own URL (after redirects) wins when the loader
        // changed it
        if (rd.baseHref != null) {
          val baseBase = if (opts.base != "") opts.base else rd.documentUrl
          opts = opts.copy(base = Uri.resolve(baseBase, rd.baseHref))
        } else if (opts.base == "" || rd.documentUrl != iri)
          opts = opts.copy(base = rd.documentUrl)
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

  /** Deserialize JSON-LD to an RDF dataset. With `useNamespaces`, prefix
    * candidates from the input's top-level @context (string-valued terms)
    * are collected into `dataset.namespaces` for prefix-printing
    * serializers (cf. /root/reference/ld/processor.go:514-529).
    */
  def toRdf(input: Any, opts: JsonLdOptions): RdfDataset = {
    val expanded = expand(input, opts)
    val dataset = ToRdf.toRdf(expanded, opts)
    if (opts.useNamespaces) input match {
      case m: JObj @unchecked =>
        m.getOrElse("@context", null) match {
          case ctx: JObj @unchecked =>
            ctx.foreach {
              case (term, iri: String)
                  if !term.startsWith("@") && (iri.endsWith("#") || iri.endsWith("/")) =>
                dataset.namespaces(term) = iri
              case _ =>
            }
          case _ =>
        }
      case _ =>
    }
    dataset
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
      case s: String if opts.inputFormat == "application/n-quads" ||
        opts.inputFormat == "application/nquads" => parseNQuads(s)
      case other => toRdf(other, opts)
    }
    new Canonicalizer(opts.algorithm).canonicalize(dataset)
  }

  def normalizeNQuads(nquads: String, opts: JsonLdOptions): String =
    new Canonicalizer(opts.algorithm).canonicalize(parseNQuads(nquads))

  /** Compaction entry point (JSON-LD 1.1 API §6.2). */
  def compact(input: Any, context0: Any, opts0: JsonLdOptions): JObj = {
    var opts = opts0
    input match {
      case s: String if opts.base == "" => opts = opts.copy(base = s)
      case _ =>
    }
    val expanded = expand(input, opts)

    var context = Json.deepClone(context0)
    context match {
      case m: JObj @unchecked if m.contains("@context") => context = m("@context")
      case _ =>
    }
    var activeCtx = new Context(opts)
    activeCtx = activeCtx.parse(context)

    var compacted = Compaction.compact(activeCtx, "", expanded, opts.compactArrays)

    compacted match {
      case lst: JArr @unchecked =>
        if (lst.isEmpty) compacted = Json.obj()
        else {
          val alias = Compaction.compactIri(activeCtx, "@graph", null, relativeToVocab0 = false, reverse = false)
          val m = Json.obj(); m(alias) = lst
          compacted = m
        }
      case _ =>
    }

    val resultMap = compacted.asInstanceOf[JObj]
    if (resultMap.nonEmpty) {
      val withCtx = context match {
        case lst: JArr @unchecked if lst.size == 1 && opts.compactArrays =>
          Some(lst.head)
        case m: JObj @unchecked => if (m.nonEmpty) Some(m) else None
        case null => None
        case other => Some(other) // strings, multi-element arrays
      }
      withCtx.foreach { c =>
        // @context first: rebuild preserving order
        val ordered = Json.obj()
        ordered("@context") = c
        resultMap.foreach { case (k, v) => ordered(k) = v }
        return ordered
      }
    }
    resultMap
  }

  /** Flattening entry point (JSON-LD 1.1 API §7.1). */
  def flatten(input: Any, context0: Any, opts0: JsonLdOptions): Any = {
    var opts = opts0
    input match {
      case s: String if opts.base == "" => opts = opts.copy(base = s)
      case _ =>
    }
    val expanded = expand(input, opts)
    var context = context0
    context match {
      case m: JObj @unchecked if m.contains("@context") => context = m("@context")
      case _ =>
    }

    val nodeMap = Json.obj()
    nodeMap("@default") = Json.obj()
    val issuer = new IdentifierIssuer("_:b")
    NodeMap.generateNodeMap(expanded, nodeMap, "@default", issuer, null, "", null)

    val defaultGraph = nodeMap("@default").asInstanceOf[JObj]
    nodeMap.remove("@default")

    Json.sortedKeys(nodeMap).foreach { graphName =>
      val graph = nodeMap(graphName).asInstanceOf[JObj]
      val entry = defaultGraph.getOrElse(graphName, null) match {
        case m: JObj @unchecked => m
        case _ =>
          val m = Json.obj(); m("@id") = graphName; defaultGraph(graphName) = m; m
      }
      if (!entry.contains("@graph")) entry("@graph") = Json.arr()
      val graphArr = entry("@graph").asInstanceOf[JArr]
      Json.sortedKeys(graph).foreach { id =>
        val node = graph(id).asInstanceOf[JObj]
        if (!(node.contains("@id") && node.size == 1)) graphArr += node
      }
    }

    val flattened = Json.arr()
    Json.sortedKeys(defaultGraph).foreach { id =>
      val node = defaultGraph(id).asInstanceOf[JObj]
      if (!(node.contains("@id") && node.size == 1)) flattened += node
    }

    if (context != null && flattened.nonEmpty) {
      var activeCtx = new Context(opts)
      activeCtx = activeCtx.parse(context)
      var compacted = Compaction.compact(activeCtx, "", flattened, opts.compactArrays)
      compacted = compacted match {
        case a: JArr @unchecked => a
        case other => Json.arr(other)
      }
      val alias = Compaction.compactIri(activeCtx, "@graph", null, relativeToVocab0 = false, reverse = false)
      // echo the caller's context (active-context serialization loses
      // scoped contexts and may re-compact term IRIs)
      val rval = Json.obj()
      val ctxOut = Json.deepClone(context)
      val nonTrivial = ctxOut match {
        case m: JObj @unchecked => m.nonEmpty
        case null => false
        case _ => true
      }
      if (nonTrivial) rval("@context") = ctxOut
      rval(alias) = compacted
      rval
    } else flattened
  }

  /** FromRDF entry point: N-Quads text or RdfDataset → JSON-LD array. */
  def fromRdf(input: Any, opts: JsonLdOptions): JArr = {
    val dataset = input match {
      case ds: RdfDataset => ds
      case s: String => parseNQuads(s)
      case other => throw JsonLdError(JsonLdError.UnknownFormat, String.valueOf(other))
    }
    FromRdf.fromRdf(dataset, opts)
  }

  /** fromRdf with the reference's `outputForm` post-processing
    * (/root/reference/ld/processor.go:473-482): re-shape the expanded
    * result. N-Quads carry no context, so compact/flatten run with an
    * empty context — exactly what the reference does for this input.
    */
  def fromRdfWithOutputForm(input: Any, opts: JsonLdOptions): Any = {
    val rval = fromRdf(input, opts)
    opts.outputForm match {
      case "" | "expanded" => rval
      case "compacted" => compact(rval, null, opts)
      case "flattened" => flatten(rval, null, opts)
      case other => throw JsonLdError(JsonLdError.UnknownError, s"Output form was unknown: $other")
    }
  }

  /** Framing entry point (JSON-LD Framing 1.1 §4.1). */
  def frame(input0: Any, frame0: Any, opts0: JsonLdOptions): JObj = {
    var opts = opts0
    input0 match {
      case s: String if opts.base == "" => opts = opts.copy(base = s)
      case _ =>
    }
    val frameDoc = frame0 match {
      case m: JObj @unchecked => Json.deepClone(m)
      case other => other
    }

    val expandedInput = expand(input0, opts)
    val frameOpts = opts.copy(processingMode = JsonLdOptions.JsonLd11ExpandFrame,
      expandContext = null)
    val expandedFrame = expand(frameDoc, frameOpts)

    val graphInFrame = frameDoc match {
      case m: JObj @unchecked => m.contains("@graph")
      case _ => false
    }
    val (framed, bnodesToClear0) =
      Framing.frame(expandedInput, expandedFrame, opts, merged = !graphInFrame)

    val frameCtx = frameDoc match {
      case m: JObj @unchecked => m.getOrElse("@context", null)
      case _ => null
    }
    var activeCtx = new Context(opts)
    if (frameCtx != null) activeCtx = activeCtx.parse(frameCtx)

    val bnodesToClear =
      if (opts.processingMode == JsonLdOptions.JsonLd10) Seq.empty[String]
      else bnodesToClear0

    // prune single-use blank node identifiers BEFORE compaction: a graph
    // object that loses its bnode @id becomes a simple graph, which is
    // what @container: @graph compaction keys on
    if (bnodesToClear.nonEmpty) pruneBnodeIds(framed, bnodesToClear.toSet)

    val compacted = Compaction.compact(activeCtx, "", framed, opts.compactArrays)

    // the output carries the frame's ORIGINAL @context (scoped contexts
    // and term shapes don't survive active-context serialization)
    val graphAlias = Compaction.compactIri(activeCtx, "@graph", null,
      relativeToVocab0 = false, reverse = false)
    def withContext(body: JObj): JObj =
      if (frameCtx == null) body
      else {
        val ordered = Json.obj()
        ordered("@context") = Json.deepClone(frameCtx)
        body.foreach { case (k, v) => if (k != "@context") ordered(k) = v }
        ordered
      }
    val rval: JObj = compacted match {
      case lst: JArr @unchecked =>
        val m = Json.obj(); m(graphAlias) = lst; withContext(m)
      case m: JObj @unchecked if opts.effectiveOmitGraph =>
        withContext(m)
      case m: JObj @unchecked =>
        val w = Json.obj(); w(graphAlias) = Json.arr(m); withContext(w)
      case other =>
        val w = Json.obj(); w(graphAlias) = Json.arr(other); withContext(w)
    }
    Framing.removePreserve(activeCtx, rval, bnodesToClear, opts.compactArrays)
    rval
  }

  private def pruneBnodeIds(v: Any, clear: Set[String]): Unit = v match {
    case a: JArr @unchecked => a.foreach(pruneBnodeIds(_, clear))
    case m: JObj @unchecked =>
      m.get("@id") match {
        case Some(id: String) if clear.contains(id) && m.size > 1 => m.remove("@id")
        case _ =>
      }
      m.values.foreach(pruneBnodeIds(_, clear))
    case _ =>
  }
}
