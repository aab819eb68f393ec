package jsonld.core

import Json._
import JsonLdUtils._
import scala.collection.mutable

/** Blank-node identifier issuer (`_:b0…`, `_:c14n0…`). Issuance order is
  * semantic (drives flattening output and canonicalization), so issuers are
  * strictly per-document and single-threaded.
  */
final class IdentifierIssuer(val prefix: String) extends Serializable {
  var counter: Int = 0
  val existing: mutable.HashMap[String, String] = mutable.HashMap.empty
  val existingOrder: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty

  def getId(oldId: String): String = {
    if (oldId != null && oldId.nonEmpty) {
      existing.get(oldId) match {
        case Some(ex) => return ex
        case None =>
      }
    }
    val id = prefix + counter
    counter += 1
    if (oldId != null && oldId.nonEmpty) {
      existing(oldId) = id
      existingOrder += oldId
    }
    id
  }

  def hasId(oldId: String): Boolean = existing.contains(oldId)

  def cloneIssuer(): IdentifierIssuer = {
    val c = new IdentifierIssuer(prefix)
    c.counter = counter
    c.existing ++= existing
    c.existingOrder ++= existingOrder
    c
  }
}

/** Node Map Generation (JSON-LD 1.1 API §7 — the flattening core).
  * graphMap: graphName → (@id → node object).
  */
object NodeMap {

  def generateNodeMap(element: Any, graphMap: JObj, issuer: IdentifierIssuer): Unit =
    generateNodeMap(element, graphMap, "@default", issuer, null, "", null)

  def generateNodeMap(element: Any, graphMap: JObj, activeGraph: String,
                      issuer: IdentifierIssuer, activeSubject: Any,
                      activeProperty: String, list0: JObj): JObj = {
    var list = list0
    element match {
      case items: JArr @unchecked =>
        items.foreach { item =>
          list = generateNodeMap(item, graphMap, activeGraph, issuer, activeSubject, activeProperty, list)
        }
        return list
      case _ =>
    }
    val elem = element match {
      case m: JObj @unchecked => m
      case other => throw new IllegalArgumentException(
        s"expected map or list in generateNodeMap, got ${if (other == null) "null" else other.getClass}")
    }

    val graph = graphMap.get(activeGraph) match {
      case Some(g: JObj @unchecked) => g
      case _ => val g = Json.obj(); graphMap(activeGraph) = g; g
    }

    val subjectNode: JObj = activeSubject match {
      case null => graph
      case s: String => graph.getOrElse(s, null) match {
        case m: JObj @unchecked => m
        case _ => null
      }
      case _ => Json.obj()
    }

    // rename blank-node types
    if (elem.contains("@type")) {
      val types = arrayify(elem("@type"))
      val newTypes = Json.arr()
      types.foreach {
        case t: String if t.startsWith("_:") => newTypes += issuer.getId(t)
        case t => newTypes += t
      }
      if (isValueObject(elem)) elem("@type") = newTypes.head
      else elem("@type") = newTypes
    }

    if (isValueObject(elem)) {
      if (list == null)
        addValue(subjectNode, activeProperty, elem, asArray = true, allowDuplicate = false)
      else
        list("@list").asInstanceOf[JArr] += elem
      return list
    }

    if (isListObject(elem)) {
      var result = Json.obj()
      result("@list") = Json.arr()
      result = generateNodeMap(elem("@list"), graphMap, activeGraph, issuer,
        activeSubject, activeProperty, result)
      if (list == null)
        addValue(subjectNode, activeProperty, result, asArray = true, allowDuplicate = false)
      else
        list("@list").asInstanceOf[JArr] += result
      return list
    }

    // element is a node object
    var id: String = {
      if (!elem.contains("@id")) issuer.getId("")
      else elem("@id") match {
        case s: String if s.startsWith("_:") => issuer.getId(s)
        case s: String => s
        // present-but-null @id (reserved keyword-form): a relative id that
        // graphToRdf/objectToRdf silently drop
        case _ => ""
      }
    }

    val node: JObj = graph.getOrElse(id, null) match {
      case m: JObj @unchecked => m
      case _ =>
        val m = Json.obj(); m("@id") = id; graph(id) = m; m
    }

    activeSubject match {
      case m: JObj @unchecked =>
        // reverse-property relationship
        addValue(node, activeProperty, m, asArray = true, allowDuplicate = false)
      case _ =>
        if (activeProperty != null && activeProperty != "") {
          val ref = Json.obj(); ref("@id") = id
          if (list == null)
            addValue(subjectNode, activeProperty, ref, asArray = true, allowDuplicate = false)
          else
            list("@list").asInstanceOf[JArr] += ref
        }
    }

    if (elem.contains("@type")) {
      addValue(node, "@type", elem("@type"), asArray = true, allowDuplicate = false)
    }

    if (elem.contains("@index")) {
      val elemIdx = elem("@index")
      node.get("@index") match {
        case Some(existing) if !Json.deepCompare(existing, elemIdx) =>
          throw JsonLdError(JsonLdError.ConflictingIndexes, "conflicting @index property detected")
        case _ =>
      }
      node("@index") = elemIdx
    }

    if (elem.contains("@reverse")) {
      val referencedNode = Json.obj(); referencedNode("@id") = id
      val reverseMap = elem("@reverse").asInstanceOf[JObj]
      Json.sortedKeys(reverseMap).foreach { reverseProperty =>
        reverseMap(reverseProperty).asInstanceOf[JArr].foreach { v =>
          generateNodeMap(v, graphMap, activeGraph, issuer, referencedNode, reverseProperty, null)
        }
      }
    }

    if (elem.contains("@graph"))
      generateNodeMap(elem("@graph"), graphMap, id, issuer, null, "", null)

    if (elem.contains("@included"))
      generateNodeMap(elem("@included"), graphMap, activeGraph, issuer, null, "", null)

    Json.sortedKeys(elem).foreach { property0 =>
      if (property0 != "@id" && property0 != "@type" && property0 != "@index" &&
          property0 != "@reverse" && property0 != "@graph" && property0 != "@included") {
        val value = elem(property0)
        val property = if (property0.startsWith("_:")) issuer.getId(property0) else property0
        if (!node.contains(property)) node(property) = Json.arr()
        generateNodeMap(value, graphMap, activeGraph, issuer, id, property, null)
      }
    }
    list
  }
}
