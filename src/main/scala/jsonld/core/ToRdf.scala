package jsonld.core

import Json._
import JsonLdUtils._
import Rdf._
import scala.collection.mutable

/** Deserialize JSON-LD to RDF (JSON-LD 1.1 API §8): expanded document →
  * node map → quads per graph. Deterministic: node ids and graph names are
  * iterated in sorted order (the output is order-insensitive up to blank
  * node relabeling, which canonicalization fixes downstream).
  */
object ToRdf {

  def toRdf(expandedInput: Any, opts: JsonLdOptions): RdfDataset = {
    val issuer = new IdentifierIssuer("_:b")
    val nodeMap = Json.obj()
    nodeMap("@default") = Json.obj()
    NodeMap.generateNodeMap(expandedInput, nodeMap, "@default", issuer, null, "", null)

    val dataset = new RdfDataset
    Json.sortedKeys(nodeMap).foreach { graphName =>
      if (!isRelativeIri(graphName)) {
        val graph = nodeMap(graphName).asInstanceOf[JObj]
        graphToRdf(dataset, graphName, graph, issuer, opts.produceGeneralizedRdf, opts.rdfDirection)
      }
    }
    dataset
  }

  def graphToRdf(ds: RdfDataset, graphName: String, graph: JObj,
                 issuer: IdentifierIssuer, produceGeneralizedRdf: Boolean,
                 rdfDirection: String = ""): Unit = {
    val triples = mutable.ArrayBuffer.empty[Quad]
    val graphNode: RdfNode =
      if (graphName == "@default") null
      else if (graphName.startsWith("_:")) RBlank(graphName)
      else RIri(graphName)

    Json.sortedKeys(graph).foreach { id =>
      if (!isRelativeIri(id)) {
        val node = graph(id).asInstanceOf[JObj]
        Json.sortedKeys(node).foreach { property0 =>
          var property = property0
          var values: JArr = null
          if (property == "@type") {
            values = node("@type").asInstanceOf[JArr]
            property = RdfType
          } else if (isKeyword(property)) {
            // skip
          } else if (property.startsWith("_:") && !produceGeneralizedRdf) {
            ds.skippedGeneralized += node(property).asInstanceOf[JArr].size
          } else if (isRelativeIri(property)) {
            ds.skippedRelative += node(property).asInstanceOf[JArr].size
          } else {
            values = node(property).asInstanceOf[JArr]
          }

          if (values != null) {
            val subject: RdfNode = if (id.startsWith("_:")) RBlank(id) else RIri(id)
            val predicate: RdfNode = if (property.startsWith("_:")) RBlank(property) else RIri(property)
            values.foreach { item =>
              val obj = objectToRdf(item, issuer, graphNode, triples, rdfDirection)
              if (obj != null) triples += Quad(subject, predicate, obj, graphNode)
              else ds.skippedRelative += 1 // spec-mandated skip (e.g. relative @id)
            }
          }
        }
      }
    }
    val kept = triples.filter(quadValid)
    ds.droppedQuads += (triples.length - kept.length)
    ds.addQuads(graphName, kept)
  }

  /** Value/node object → RDF node; lists emit rdf:first/rest/nil cons chains
    * into `triples` as a side effect.
    */
  def objectToRdf(item: Any, issuer: IdentifierIssuer, graph: RdfNode,
                  triples: mutable.ArrayBuffer[Quad], rdfDirection: String = ""): RdfNode = {
    if (isValueObject(item)) {
      val itemMap = item.asInstanceOf[JObj]
      val value = itemMap.getOrElse("@value", null)
      var datatype = itemMap.getOrElse("@type", null) match {
        case s: String => s
        case _ => null
      }
      if (datatype == "@json") datatype = RdfJson
      // rdf:JSON literals canonicalize the parsed JSON VALUE (a bare JSON
      // string stays quoted; numbers use ES6 forms) — before any native
      // bool/number conversion
      if (datatype == RdfJson) {
        val canonical =
          try Jcs.canonicalizeValue(value)
          catch { case e: Exception => "JSON Canonicalization error " + e.getMessage }
        return RLiteral(canonical, RdfJson, "")
      }

      // JSON-LD 1.1 base-direction serialization (rdfDirection option)
      if (itemMap.contains("@direction") && value.isInstanceOf[String]) {
        val dir = String.valueOf(itemMap("@direction"))
        val lang = itemMap.getOrElse("@language", "") match {
          case s: String => s.toLowerCase
          case _ => ""
        }
        if (rdfDirection == "i18n-datatype") {
          return RLiteral(value.asInstanceOf[String],
            "https://www.w3.org/ns/i18n#" + lang + "_" + dir, "")
        } else if (rdfDirection == "compound-literal") {
          val bn = RBlank(issuer.getId(""))
          triples += Quad(bn, RIri(RdfValue),
            RLiteral(value.asInstanceOf[String], XsdString, ""), graph)
          if (lang.nonEmpty)
            triples += Quad(bn, RIri(RdfLanguage), RLiteral(lang, XsdString, ""), graph)
          triples += Quad(bn, RIri(RdfDirection), RLiteral(dir, XsdString, ""), graph)
          return bn
        }
      }

      value match {
        case b: java.lang.Boolean =>
          RLiteral(b.toString, if (datatype == null) XsdBoolean else datatype, "")
        case n if Json.isNumber(n) =>
          // All JSON numbers behave as doubles; integral values map to
          // xsd:integer regardless of their lexical form ("1.0" → "1").
          val d = Json.numberValue(n)
          val isInteger = d == d.toLong.toDouble
          if ((!isInteger) || XsdDouble == datatype)
            RLiteral(canonicalDouble(d), if (datatype == null) XsdDouble else datatype, "")
          else
            RLiteral(d.toLong.toString, if (datatype == null) XsdInteger else datatype, "")
        case _ =>
          if (itemMap.contains("@language")) {
            val lang = itemMap("@language").asInstanceOf[String]
            RLiteral(value.asInstanceOf[String], if (datatype == null) RdfLangString else datatype, lang)
          } else if (datatype == null) {
            RLiteral(value.asInstanceOf[String], XsdString, "")
          } else {
            RLiteral(value.asInstanceOf[String], datatype, "")
          }
      }
    } else if (isListObject(item)) {
      parseList(item.asInstanceOf[JObj]("@list").asInstanceOf[JArr], issuer, graph, triples, rdfDirection)
    } else {
      val id = item match {
        case m: JObj @unchecked => m.getOrElse("@id", null) match {
          case s: String => if (isRelativeIri(s)) return null else s
          case _ => return null
        }
        case s: String => s
        case _ => return null
      }
      if (id.startsWith("_:")) RBlank(id) else RIri(id)
    }
  }

  private def parseList(list: JArr, issuer: IdentifierIssuer, graph: RdfNode,
                        triples: mutable.ArrayBuffer[Quad], rdfDirection: String = ""): RdfNode = {
    val nilIri = RIri(RdfNil)
    val first = RIri(RdfFirst)
    val rest = RIri(RdfRest)
    if (list.isEmpty) return nilIri
    val res = RBlank(issuer.getId(""))
    var subj: RdfNode = res
    var i = 0
    while (i < list.size - 1) {
      val obj = objectToRdf(list(i), issuer, graph, triples, rdfDirection)
      val next = RBlank(issuer.getId(""))
      triples += Quad(subj, first, obj, graph)
      triples += Quad(subj, rest, next, graph)
      subj = next
      i += 1
    }
    val obj = objectToRdf(list.last, issuer, graph, triples, rdfDirection)
    triples += Quad(subj, first, obj, graph)
    triples += Quad(subj, rest, nilIri, graph)
    res
  }
}
