package jsonld.core

import Json._
import JsonLdUtils._
import Rdf._
import scala.collection.mutable

/** Serialize RDF as JSON-LD (JSON-LD 1.1 API §9): per-graph node maps,
  * rdf:type → @type, literal conversion (optionally to native types), and
  * rdf:first/rest/nil list reconstitution.
  */
object FromRdf {

  private final class UsagesNode(val node: NodeEntry, val property: String, val value: JObj)
  private final class NodeEntry(id: String) {
    val values: JObj = { val m = Json.obj(); m("@id") = id; m }
    val usages: mutable.ArrayBuffer[UsagesNode] = mutable.ArrayBuffer.empty

    def isWellFormedListNode: Boolean = {
      var keys = 0
      values.get(RdfFirst) match {
        case Some(a: JArr @unchecked) => keys += 1; if (a.size != 1) return false
        case Some(_) => return false
        case None =>
      }
      values.get(RdfRest) match {
        case Some(a: JArr @unchecked) => keys += 1; if (a.size != 1) return false
        case Some(_) => return false
        case None =>
      }
      values.get("@type") match {
        case Some(a: JArr @unchecked) =>
          keys += 1; if (!(a.size == 1 && a.head == RdfList)) return false
        case Some(_) => return false
        case None =>
      }
      if (values.contains("@id")) keys += 1
      keys >= values.size
    }

    def serializeNode: JObj = values.clone().asInstanceOf[JObj]
  }

  private val integerRe = "^[\\-+]?\\d+$".r
  private val doubleRe = "^(\\+|-)?(\\d+(\\.\\d*)?|\\.\\d+)([Ee](\\+|-)?\\d+)?$".r

  /** RDF node → JSON-LD object ({"@id": ...} or value object). */
  def rdfToObject(n: RdfNode, useNativeTypes: Boolean, rdfDirection: String = ""): JObj = {
    n match {
      case RIri(v) => val m = Json.obj(); m("@id") = v; m
      case RBlank(v) => val m = Json.obj(); m("@id") = v; m
      case RLiteral(value, datatype, language) =>
        val rval = Json.obj()
        rval("@value") = value
        if (datatype == RdfJson) {
          // rdf:JSON literal → native JSON value with @type @json
          rval("@value") =
            try Json.parse(value)
            catch { case e: Exception =>
              throw JsonLdError(JsonLdError.InvalidJsonLiteral, String.valueOf(e.getMessage))
            }
          rval("@type") = "@json"
          return rval
        }
        if (rdfDirection == "i18n-datatype" &&
            datatype != null && datatype.startsWith("https://www.w3.org/ns/i18n#")) {
          val frag = datatype.substring("https://www.w3.org/ns/i18n#".length)
          val us = frag.indexOf('_')
          if (us >= 0) {
            val lang = frag.substring(0, us)
            val dir = frag.substring(us + 1)
            if (lang.nonEmpty) rval("@language") = lang
            if (dir.nonEmpty) rval("@direction") = dir
            return rval
          }
        }
        if (language != null && language.nonEmpty) {
          rval("@language") = language
        } else if (useNativeTypes) {
          datatype match {
            case XsdString => // leave plain
            case XsdBoolean =>
              value match {
                case "true" => rval("@value") = java.lang.Boolean.TRUE
                case "false" => rval("@value") = java.lang.Boolean.FALSE
                case _ => rval("@type") = datatype
              }
            case XsdInteger =>
              if (integerRe.matches(value))
                try rval("@value") = java.lang.Long.valueOf(value)
                catch { case _: NumberFormatException => }
            case XsdDouble | XsdFloat =>
              if (doubleRe.matches(value)) {
                val d = java.lang.Double.parseDouble(value)
                if (!d.isNaN && !d.isInfinite) rval("@value") = java.lang.Double.valueOf(d)
              }
            case dt => rval("@type") = dt
          }
        } else if (datatype != XsdString) {
          rval("@type") = datatype
        }
        rval
      case null => throw JsonLdError(JsonLdError.InvalidInput, "null RDF node")
    }
  }

  def fromRdf(dataset: RdfDataset, opts: JsonLdOptions,
              parsedWithoutDuplicates: Boolean = true): JArr = {
    val defaultGraph = mutable.LinkedHashMap.empty[String, NodeEntry]
    val graphMap = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, NodeEntry]]
    graphMap("@default") = defaultGraph
    val referencedOnce = mutable.HashMap.empty[String, UsagesNode]

    dataset.graphs.foreach { case (name, graph) =>
      val nodeMap = graphMap.getOrElseUpdate(name, mutable.LinkedHashMap.empty)
      if (name != "@default" && !defaultGraph.contains(name))
        defaultGraph(name) = new NodeEntry(name)

      graph.foreach { triple =>
        val subject = triple.subject.value
        val predicate = triple.predicate.value
        val obj = triple.obj

        val node = nodeMap.getOrElseUpdate(subject, new NodeEntry(subject))
        if ((obj.isIri || obj.isBlank) && !nodeMap.contains(obj.value))
          nodeMap(obj.value) = new NodeEntry(obj.value)

        if (predicate == RdfType && (obj.isIri || obj.isBlank) && !opts.useRdfType) {
          mergeValue(node.values, "@type", obj.value)
        } else {
          val value = rdfToObject(obj, opts.useNativeTypes, opts.rdfDirection)
          if (parsedWithoutDuplicates) {
            // parser guarantees in-graph quad uniqueness: append directly
            val lst = node.values.get(predicate) match {
              case Some(a: JArr @unchecked) => a
              case _ => val a = Json.arr(); node.values(predicate) = a; a
            }
            lst += value
          } else {
            mergeValue(node.values, predicate, value)
          }

          if (obj.isBlank || obj.isIri) {
            if (obj.value == RdfNil) {
              nodeMap(obj.value).usages += new UsagesNode(node, predicate, value)
            } else if (referencedOnce.contains(obj.value)) {
              referencedOnce(obj.value) = null
            } else {
              referencedOnce(obj.value) = new UsagesNode(node, predicate, value)
            }
          }
        }
      }
    }

    // compound-literal reconstitution (rdfDirection == "compound-literal"):
    // a blank node carrying rdf:direction collapses back into a value
    // object at its (single) usage site
    if (opts.rdfDirection == "compound-literal") {
      graphMap.values.foreach { graph =>
        graph.keys.filter(_.startsWith("_:")).toSeq.foreach { id =>
          val node = graph(id)
          if (node.values.contains(RdfDirection)) {
            referencedOnce.get(id).filter(_ != null).foreach { usage =>
              val vObj = usage.value
              vObj.clear()
              node.values.get(RdfValue) match {
                case Some(a: JArr @unchecked) if a.nonEmpty =>
                  vObj("@value") = a.head.asInstanceOf[JObj].getOrElse("@value", null)
                case _ =>
              }
              node.values.get(RdfLanguage) match {
                case Some(a: JArr @unchecked) if a.nonEmpty =>
                  vObj("@language") = String.valueOf(
                    a.head.asInstanceOf[JObj].getOrElse("@value", "")).toLowerCase
                case _ =>
              }
              node.values(RdfDirection) match {
                case a: JArr @unchecked if a.nonEmpty =>
                  vObj("@direction") = a.head.asInstanceOf[JObj].getOrElse("@value", null)
                case _ =>
              }
              graph.remove(id)
            }
          }
        }
      }
    }

    // list reconstitution
    graphMap.values.foreach { graph =>
      graph.get(RdfNil).foreach { nilNode =>
        nilNode.usages.foreach { usage =>
          var node = usage.node
          var property = usage.property
          var head = usage.value
          val list = Json.arr()
          val listNodes = mutable.ArrayBuffer.empty[String]
          var break = false
          while (!break && property == RdfRest &&
                 referencedOnce.get(node.values("@id").asInstanceOf[String]).exists(_ != null) &&
                 node.isWellFormedListNode) {
            list += node.values(RdfFirst).asInstanceOf[JArr].head
            listNodes += node.values("@id").asInstanceOf[String]
            val nodeUsage = referencedOnce(node.values("@id").asInstanceOf[String])
            node = nodeUsage.node
            property = nodeUsage.property
            head = nodeUsage.value
            if (!isBlankNodeValue(node.values)) break = true
          }
          head.remove("@id")
          val reversed = Json.arr(); reversed ++= list.reverse
          head("@list") = reversed
          listNodes.foreach(graph.remove)
        }
      }
    }

    val result = Json.arr()
    defaultGraph.keys.toSeq.sorted(Json.utf8Ordering).foreach { subject =>
      val node = defaultGraph(subject)
      graphMap.get(subject).foreach { subjectMap =>
        val graphArr = Json.arr()
        subjectMap.keys.toSeq.sorted(Json.utf8Ordering).foreach { s =>
          val n = subjectMap(s)
          if (!(n.values.size == 1 && n.values.contains("@id")))
            graphArr += n.serializeNode
        }
        node.values("@graph") = graphArr
      }
      if (!(node.values.size == 1 && node.values.contains("@id")))
        result += node.serializeNode
    }
    result
  }
}
