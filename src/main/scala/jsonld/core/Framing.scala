package jsonld.core

import Json._
import JsonLdUtils._
import scala.collection.mutable

/** Framing Algorithm (JSON-LD Framing 1.1 W3C Recommendation §4.2).
  * Deeply stateful per document: unique-embeds map, graph stack, subject
  * stack. Pure across documents.
  */
object Framing {

  final val EmbedOnce = "@once"
  final val EmbedNever = "@never"
  final val EmbedAlways = "@always"
  final val EmbedLast = "@last" // legacy alias of @once (kept for API compat)

  private final class EmbedNode(val parent: Any, val property: String)
  private final class StackNode(val subject: JObj, val graph: String)

  private final class FramingState(opts: JsonLdOptions) {
    var embed: String = opts.embed
    var explicit: Boolean = opts.explicit
    var requireAll: Boolean = opts.requireAll
    var omitDefault: Boolean = opts.omitDefault
    val graphMap: JObj = { val m = Json.obj(); m("@default") = Json.obj(); m }
    var graph: String = "@default"
    var subjects: JObj = null
    val graphStack: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty
    val subjectStack: mutable.ArrayBuffer[StackNode] = mutable.ArrayBuffer.empty
    var uniqueEmbeds: mutable.HashMap[String, mutable.HashMap[String, EmbedNode]] =
      mutable.HashMap.empty
    val bnodeMap: JObj = Json.obj()
  }

  /** Returns (framed array, bnodesToClear). */
  def frame(input: Any, frameArr: JArr, opts: JsonLdOptions, merged: Boolean): (JArr, Seq[String]) = {
    val state = new FramingState(opts)
    val issuer = new IdentifierIssuer("_:b")
    NodeMap.generateNodeMap(input, state.graphMap, "@default", issuer, null, "", null)

    if (merged) {
      state.graphMap("@merged") = mergeNodeMapGraphs(state.graphMap)
      state.graph = "@merged"
    }
    state.subjects = state.graphMap(state.graph).asInstanceOf[JObj]

    validateFrame(frameArr)

    val frameParam: JObj = frameArr.headOption match {
      case Some(m: JObj @unchecked) => m
      case _ => Json.obj()
    }

    val framed = matchFrame(state, Json.sortedKeys(state.subjects), frameParam,
      Json.arr(), "", embedded = false)

    val bnodesToClear = state.bnodeMap.collect {
      case (id, arr: JArr @unchecked) if arr.size == 1 => id
    }.toSeq
    (framed.asInstanceOf[JArr], bnodesToClear)
  }

  private def mergeNodeMapGraphs(graphs: JObj): JObj = {
    val merged = Json.obj()
    Json.sortedKeys(graphs).foreach { name =>
      val graph = graphs(name).asInstanceOf[JObj]
      Json.sortedKeys(graph).foreach { id =>
        val mergedNode = merged.getOrElse(id, null) match {
          case m: JObj @unchecked => m
          case _ => val m = Json.obj(); m("@id") = id; merged(id) = m; m
        }
        val node = graph(id).asInstanceOf[JObj]
        Json.sortedKeys(node).foreach { property =>
          if (property == "@type") {
            // types union across graphs in @merged
            arrayify(node(property)).foreach { t =>
              addValue(mergedNode, "@type", t, asArray = true, allowDuplicate = false)
            }
          } else if (isKeyword(property)) {
            mergedNode(property) = Json.deepClone(node(property))
          } else {
            node(property).asInstanceOf[JArr].foreach { v =>
              addValue(mergedNode, property, Json.deepClone(v), asArray = true, allowDuplicate = false)
            }
          }
        }
      }
    }
    merged
  }

  private def createsCircularReference(id: String, graph: String, state: FramingState): Boolean =
    state.subjectStack.reverseIterator.exists { s =>
      s.graph == graph && s.subject.getOrElse("@id", null) == id
    }

  private def matchFrame(state: FramingState, subjects: Seq[String], frame: JObj,
                         parent0: Any, property: String, embedded: Boolean): Any = {
    var parent = parent0
    val embed = getFrameEmbed(frame, state.embed)
    val explicitOn = getFrameFlag(frame, "@explicit", state.explicit)
    val requireAll = getFrameFlag(frame, "@requireAll", state.requireAll)
    val flags = Json.obj()
    flags("@explicit") = Json.arr(java.lang.Boolean.valueOf(explicitOn))
    flags("@requireAll") = Json.arr(java.lang.Boolean.valueOf(requireAll))
    flags("@embed") = Json.arr(embed)

    val matches = filterSubjects(state, subjects, frame, requireAll)

    matches.keys.toSeq.sorted(Json.utf8Ordering).foreach { id =>
      val subject = matches(id).asInstanceOf[JObj]

      if (property == "") {
        state.uniqueEmbeds = mutable.HashMap(state.graph -> mutable.HashMap.empty[String, EmbedNode])
      } else if (!state.uniqueEmbeds.contains(state.graph)) {
        state.uniqueEmbeds(state.graph) = mutable.HashMap.empty
      }

      val output = Json.obj()
      output("@id") = id
      if (id.startsWith("_:"))
        addValue(state.bnodeMap, id, output, asArray = true, allowDuplicate = true)

      val alreadyOnce = embed == EmbedOnce && state.uniqueEmbeds(state.graph).contains(id)
      val skipEmbed =
        (embedded && (embed == EmbedNever ||
          createsCircularReference(id, state.graph, state))) || alreadyOnce

      if (skipEmbed) {
        // referenced use sites keep a node reference; non-embedded sweeps
        // (top level / graph / @included recursion) drop the duplicate
        if (embedded) parent = addFrameOutput(parent, property, output)
      } else {
        // legacy @last: replace any earlier embed with a reference
        if (embed == EmbedLast && state.uniqueEmbeds(state.graph).contains(id))
          removeEmbed(state, id)
        state.uniqueEmbeds(state.graph)(id) = new EmbedNode(parent, property)
        state.subjectStack += new StackNode(subject, state.graph)

        // subject is also the name of a graph
        if (state.graphMap.contains(id)) {
          var recurse = false
          var subframe: JObj = null
          if (!frame.contains("@graph")) {
            recurse = state.graph != "@merged"
            subframe = Json.obj()
          } else {
            subframe = frame("@graph").asInstanceOf[JArr].headOption match {
              case Some(m: JObj @unchecked) => m
              case _ => Json.obj()
            }
            recurse = !(id == "@merged" || id == "@default")
          }
          if (recurse) {
            state.graphStack += state.graph
            state.graph = id
            val gSubjects = Json.sortedKeys(state.graphMap(state.graph).asInstanceOf[JObj])
            matchFrame(state, gSubjects, subframe, output, "@graph", embedded = false)
            state.graph = state.graphStack.remove(state.graphStack.length - 1)
          }
        }

        // frame with @included: recurse over ALL subjects with its subframe
        if (frame.contains("@included")) {
          val subframe = frame("@included") match {
            case a: JArr @unchecked => a.headOption match {
              case Some(m: JObj @unchecked) => m
              case _ => Json.obj()
            }
            case m: JObj @unchecked => m
            case _ => Json.obj()
          }
          matchFrame(state, subjects, subframe, output, "@included", embedded = false)
        }

        Json.sortedKeys(subject).foreach { prop =>
          if (isKeyword(prop)) {
            output(prop) = Json.deepClone(subject(prop))
            if (prop == "@type") {
              subject(prop).asInstanceOf[JArr].foreach {
                case t: String if t.startsWith("_:") =>
                  addValue(state.bnodeMap, t, output, asArray = true, allowDuplicate = true)
                case _ =>
              }
            }
          } else if (!(explicitOn && !frame.contains(prop))) {
            val framePropVal = frame.getOrElse(prop, null)
            val containsProp = frame.contains(prop)
            subject(prop).asInstanceOf[JArr].foreach { item =>
              val itemMap = item match {
                case m: JObj @unchecked => m
                case _ => null
              }
              if (itemMap != null && itemMap.contains("@list")) {
                var list = Json.obj()
                list("@list") = Json.arr()
                addFrameOutput(output, prop, list)
                itemMap("@list").asInstanceOf[JArr].foreach { listitem =>
                  if (isSubjectReference(listitem)) {
                    val itemid = listitem.asInstanceOf[JObj]("@id").asInstanceOf[String]
                    val subframe: JObj =
                      if (containsProp && isListObject(framePropVal.asInstanceOf[JArr].head))
                        framePropVal.asInstanceOf[JArr].head.asInstanceOf[JObj]("@list")
                          .asInstanceOf[JArr].headOption match {
                          case Some(m: JObj @unchecked) => m
                          case _ => flags
                        }
                      else flags
                    list = matchFrame(state, Seq(itemid), subframe, list, "@list",
                      embedded = true).asInstanceOf[JObj]
                  } else {
                    addFrameOutput(list, "@list", Json.deepClone(listitem))
                  }
                }
              } else {
                val subframe: JObj =
                  if (containsProp) framePropVal.asInstanceOf[JArr].headOption match {
                    case Some(m: JObj @unchecked) => m
                    case _ => flags
                  }
                  else flags
                if (isSubjectReference(item)) {
                  val itemid = itemMap("@id").asInstanceOf[String]
                  matchFrame(state, Seq(itemid), subframe, output, prop, embedded = true)
                } else if (valueMatch(subframe, itemMap)) {
                  addFrameOutput(output, prop, Json.deepClone(item))
                }
              }
            }
          }
        }

        // defaults — @type participates only via an @default pattern
        Json.sortedKeys(frame).foreach { prop =>
          val typeWithDefault = prop == "@type" && (frame(prop) match {
            case a: JArr @unchecked => a.headOption.exists {
              case m: JObj @unchecked => m.contains("@default")
              case _ => false
            }
            case _ => false
          })
          if (typeWithDefault || !isKeyword(prop)) {
            val next: JObj = frame(prop) match {
              case a: JArr @unchecked if a.nonEmpty => a.head match {
                case m: JObj @unchecked => m
                case _ => Json.obj()
              }
              case _ => Json.obj()
            }
            val omitDefaultOn = getFrameFlag(next, "@omitDefault", state.omitDefault)
            if (!omitDefaultOn && !output.contains(prop)) {
              val preserve: Any =
                if (next.contains("@default")) Json.deepClone(next("@default")) else "@null"
              val preserveArr = arrayify(preserve)
              val po = Json.obj()
              po("@preserve") = preserveArr
              output(prop) = Json.arr(po)
            }
          }
        }

        // reverse framing
        frame.get("@reverse") match {
          case Some(reverseArr) =>
            val reverse: JObj = reverseArr match {
              case a: JArr @unchecked => a.headOption match {
                case Some(m: JObj @unchecked) => m
                case _ => Json.obj()
              }
              case m: JObj @unchecked => m
              case _ => Json.obj()
            }
            Json.sortedKeys(reverse).foreach { reverseProp =>
              state.subjects.keys.toSeq.sorted(Json.utf8Ordering).foreach { subj =>
                val nodeValues = arrayify(
                  state.subjects(subj).asInstanceOf[JObj].getOrElse(reverseProp, null))
                var break = false
                nodeValues.foreach { v =>
                  if (!break && v != null &&
                      v.asInstanceOf[JObj].getOrElse("@id", null) == id) {
                    val outputReverse = output.getOrElse("@reverse", null) match {
                      case m: JObj @unchecked => m
                      case _ => val m = Json.obj(); output("@reverse") = m; m
                    }
                    addValue(outputReverse, reverseProp, Json.arr(), asArray = true, allowDuplicate = true)
                    val subframe: JObj = reverse(reverseProp) match {
                      case a: JArr @unchecked => a.headOption match {
                        case Some(m: JObj @unchecked) => m
                        case _ => Json.obj()
                      }
                      case m: JObj @unchecked => m
                      case _ => Json.obj()
                    }
                    val res = matchFrame(state, Seq(subj), subframe,
                      outputReverse(reverseProp), property, embedded = true)
                    outputReverse(reverseProp) = res
                    break = true
                  }
                }
              }
            }
          case _ =>
        }

        parent = addFrameOutput(parent, property, output)
        state.subjectStack.remove(state.subjectStack.length - 1)
      }
    }
    parent
  }

  // -------------------------------------------------------------- helpers

  def validateFrame(frame: Any): Unit = {
    var f = frame
    var valid = true
    f match {
      case lst: JArr @unchecked =>
        if (lst.size > 1) valid = false
        else if (lst.size == 1) {
          f = lst.head
          if (!f.isInstanceOf[JObj]) valid = false
        } else return
      case _: JObj @unchecked =>
      case _ => valid = false
    }
    if (!valid)
      throw JsonLdError(JsonLdError.InvalidFrame, "a JSON-LD frame must be a single object")
    val frameMap = f.asInstanceOf[JObj]
    frameMap.get("@id").foreach { idv =>
      arrayify(idv).foreach {
        case _: JObj @unchecked =>
        case s: String if s.startsWith("_:") =>
          throw JsonLdError(JsonLdError.InvalidFrame, s"invalid value of @id: $idv")
        case _ =>
      }
    }
    frameMap.get("@type").foreach { tv =>
      arrayify(tv).foreach {
        case m: JObj @unchecked if m.isEmpty || m.contains("@default") =>
        case _: JObj @unchecked =>
          throw JsonLdError(JsonLdError.InvalidFrame, s"invalid value of @type: $tv")
        case s: String if s.startsWith("_:") =>
          throw JsonLdError(JsonLdError.InvalidFrame, s"invalid value of @type: $tv")
        case _ =>
      }
    }
  }

  private def getFrameValue(frame: JObj, name: String): Any = {
    frame.getOrElse(name, null) match {
      case a: JArr @unchecked => if (a.nonEmpty) a.head else null
      case m: JObj @unchecked => m.getOrElse("@value", m)
      case other => other
    }
  }

  def getFrameFlag(frame: JObj, name: String, default: Boolean): Boolean = {
    val value = frame.getOrElse(name, null) match {
      case a: JArr @unchecked => if (a.nonEmpty) a.head else null
      case m: JObj @unchecked => m.getOrElse("@value", m)
      case b: java.lang.Boolean => return b.booleanValue()
      case other => other
    }
    value match {
      case b: java.lang.Boolean => b.booleanValue()
      case m: JObj @unchecked => m.getOrElse("@value", null) match {
        case b: java.lang.Boolean => b.booleanValue()
        case _ => default
      }
      case "true" => true
      case "false" => false
      case _ => default
    }
  }

  def getFrameEmbed(frame: JObj, default: String): String = {
    getFrameValue(frame, "@embed") match {
      case null => default
      case b: java.lang.Boolean => if (b) EmbedOnce else EmbedNever
      case "@always" => EmbedAlways
      case "@never" => EmbedNever
      case "@once" => EmbedOnce
      case "@last" => EmbedLast // legacy: last embed wins
      case "@first" => EmbedOnce
      case s: String => throw JsonLdError(JsonLdError.InvalidEmbedValue, s"invalid value of @embed: $s")
      case _ => throw JsonLdError(JsonLdError.InvalidEmbedValue, "invalid value of @embed")
    }
  }

  private def filterSubjects(state: FramingState, subjects: Seq[String], frame: JObj,
                             requireAll: Boolean): mutable.LinkedHashMap[String, Any] = {
    val rval = mutable.LinkedHashMap.empty[String, Any]
    subjects.foreach { id =>
      state.graphMap(state.graph).asInstanceOf[JObj].getOrElse(id, null) match {
        case element: JObj @unchecked =>
          if (filterSubject(state, element, frame, requireAll)) rval(id) = element
        case _ =>
      }
    }
    rval
  }

  private def inArray(v: Any, array: Seq[Any]): Boolean = array.exists(x => x == v)

  /** Frame Matching (JSON-LD Framing 1.1 §2.2). */
  def filterSubject(state: FramingState, subject: JObj, frame: JObj, requireAll: Boolean): Boolean = {
    var wildcard = true
    var matchesSome = false

    Json.sortedKeys(frame).foreach { k =>
      var matchThis = false
      val nodeValues: JArr =
        if (subject.contains(k)) arrayify(subject(k)) else Json.arr()
      val frameValues = arrayify(frame.getOrElse(k, null))
      val isEmpty = frameValues.isEmpty

      var continueKey = false
      if (k == "@id") {
        val frameId = frameValues
        if (frameId.isEmpty || frameId.headOption.exists(Expansion.isEmptyObject)) {
          matchThis = true
        } else {
          matchThis = nodeValues.nonEmpty && inArray(nodeValues.head, frameId.toSeq)
        }
        if (!requireAll) return matchThis
      } else if (k == "@type") {
        wildcard = false
        if (isEmpty) {
          if (nodeValues.nonEmpty) return false
          matchThis = true
        } else if (frameValues.size == 1 && Expansion.isEmptyObject(frameValues.head)) {
          matchThis = nodeValues.nonEmpty
        } else if (frameValues.headOption.exists {
          case m: JObj @unchecked => m.contains("@default")
          case _ => false
        }) {
          matchThis = true // has default: always matches
        } else {
          matchThis = nodeValues.exists(tv => frameValues.exists(tf => tv == tf))
        }
        if (!requireAll) return matchThis
      } else if (isKeyword(k)) {
        continueKey = true
      } else {
        val thisFrame: Any = if (frameValues.nonEmpty) frameValues.head else null
        var hasDefault = false
        if (thisFrame != null) {
          validateFrame(thisFrame)
          hasDefault = thisFrame match {
            case m: JObj @unchecked => m.contains("@default")
            case _ => false
          }
        }

        wildcard = false

        if (hasDefault) {
          matchThis = true // a @default pattern always counts as matched
        } else if (nodeValues.nonEmpty && isEmpty) {
          return false // match-none pattern
        } else if (thisFrame == null) {
          if (nodeValues.nonEmpty) return false
          matchThis = true
        } else thisFrame match {
          case fm: JObj @unchecked if isListObject(fm) =>
            val listValue = fm("@list").asInstanceOf[JArr].headOption.orNull
            if (nodeValues.nonEmpty && isListObject(nodeValues.head) && listValue != null) {
              val nodeListValues = nodeValues.head.asInstanceOf[JObj]("@list").asInstanceOf[JArr]
              listValue match {
                case lv: JObj @unchecked if isValueObject(lv) =>
                  matchThis = nodeListValues.exists {
                    case x: JObj @unchecked => valueMatch(lv, x)
                    case _ => false
                  }
                case lv: JObj @unchecked if isSubject(lv) || isSubjectReference(lv) =>
                  matchThis = nodeListValues.exists {
                    case x: JObj @unchecked => nodeMatch(state, lv, x, requireAll)
                    case _ => false
                  }
                case _ =>
              }
            }
          case fm: JObj @unchecked if isValueObject(fm) =>
            matchThis = nodeValues.exists {
              case nv: JObj @unchecked => valueMatch(fm, nv)
              case _ => false
            }
          case fm: JObj @unchecked if fm.isEmpty ||
              fm.keys.forall(k => k == "@explicit" || k == "@requireAll" || k == "@embed" ||
                k == "@default" || k == "@omitDefault") =>
            // wildcard / flags-only pattern: match when the node has values
            matchThis = nodeValues.nonEmpty
          case fm: JObj @unchecked if isSubject(fm) || isSubjectReference(fm) =>
            matchThis = nodeValues.exists {
              case nv: JObj @unchecked => nodeMatch(state, fm, nv, requireAll)
              case _ => false
            }
          case _: JObj @unchecked =>
            // wildcard / flags-only frame: match when the node has values
            matchThis = nodeValues.nonEmpty
          case _ =>
            matchThis = false
        }
      }

      if (!continueKey) {
        if (!matchThis && requireAll) return false
        matchesSome = matchesSome || matchThis
      }
    }
    wildcard || matchesSome
  }

  private def removeEmbed(state: FramingState, id: String): Unit = {
    val links = state.uniqueEmbeds(state.graph)
    val embedNode = links(id)
    val subject = Json.obj(); subject("@id") = id
    embedNode.parent match {
      case parentMap: JObj @unchecked =>
        val useArray = parentMap.contains(embedNode.property)
        removeValue(parentMap, embedNode.property, subject, useArray)
        addValue(parentMap, embedNode.property, subject, useArray, allowDuplicate = true)
      case arr: JArr @unchecked =>
        val idx = arr.indexWhere {
          case m: JObj @unchecked => m.getOrElse("@id", null) == id
          case _ => false
        }
        if (idx >= 0) arr(idx) = subject
      case _ =>
    }
    removeDependents(links, id)
  }

  private def removeValue(subject: JObj, property: String, value: JObj, propertyIsArray: Boolean): Unit = {
    subject.get(property) match {
      case None =>
      case Some(propVal) =>
        val values = arrayify(propVal).filterNot(v => compareValues(v, value))
        if (values.isEmpty) subject.remove(property)
        else if (values.size == 1 && !propertyIsArray) subject(property) = values.head
        else { val a = Json.arr(); a ++= values; subject(property) = a }
    }
  }

  private def removeDependents(embeds: mutable.HashMap[String, EmbedNode], id: String): Unit = {
    embeds.keys.toSeq.foreach { idDep =>
      embeds.get(idDep).foreach { e =>
        e.parent match {
          case p: JObj @unchecked =>
            p.get("@id") match {
              case Some(pid: String) if pid == id =>
                embeds.remove(idDep)
                removeDependents(embeds, idDep)
              case _ =>
            }
          case _ =>
        }
      }
    }
  }

  private def addFrameOutput(parent: Any, property: String, output: Any): Any = parent match {
    case parentMap: JObj @unchecked =>
      addValue(parentMap, property, output, asArray = true, allowDuplicate = true)
      parentMap
    case arr: JArr @unchecked =>
      arr += output
      arr
    case _ => parent
  }

  private def nodeMatch(state: FramingState, pattern: JObj, value: JObj, requireAll: Boolean): Boolean = {
    value.getOrElse("@id", null) match {
      case id: String =>
        state.subjects.getOrElse(id, null) match {
          case nodeObject: JObj @unchecked => filterSubject(state, nodeObject, pattern, requireAll)
          case _ => false
        }
      case _ => false
    }
  }

  def valueMatch(pattern: JObj, value: JObj): Boolean = {
    val v2v = pattern.getOrElse("@value", null)
    val t2v = pattern.getOrElse("@type", null)
    val l2v = pattern.getOrElse("@language", null)
    if (v2v == null && t2v == null && l2v == null) return true

    val v2 = if (v2v != null) arrayify(v2v).toSeq else Seq.empty
    val t2 = if (t2v != null) arrayify(t2v).toSeq else Seq.empty
    val l2 = if (l2v != null) arrayify(l2v).toSeq else Seq.empty

    val v1 = value.getOrElse("@value", null)
    val t1 = value.getOrElse("@type", null)
    val l1 = value.getOrElse("@language", null)

    if (!(inArray(v1, v2) || v2.headOption.exists(Expansion.isEmptyObject))) return false
    if (!((t1 == null && t2.isEmpty) || inArray(t1, t2) ||
          (t1 != null && t2.nonEmpty && Expansion.isEmptyObject(t2.head)))) return false
    if (!((l1 == null && l2.isEmpty) || inArray(l1, l2) ||
          (l1 != null && l2.nonEmpty && Expansion.isEmptyObject(l2.head)))) return false
    true
  }

  /** RemovePreserve: strip @preserve markers and prune unreferenced bnode
    * ids from framed+compacted output (JSON-LD Framing 1.1 §4.4).
    */
  def removePreserve(ctx: Context, input: Any, bnodesToClear: Seq[String],
                     compactArrays: Boolean): Any = input match {
    case lst: JArr @unchecked =>
      val output = Json.arr()
      lst.foreach { i =>
        val result = removePreserve(ctx, i, bnodesToClear, compactArrays)
        if (result != null) output += result
      }
      output
    case v: JObj @unchecked =>
      if (v.contains("@preserve")) {
        val pv = v("@preserve")
        if (pv == "@null") null else pv
      } else if (v.contains("@value")) {
        v
      } else if (v.contains("@list")) {
        v("@list") = removePreserve(ctx, v("@list"), bnodesToClear, compactArrays)
        v
      } else {
        val idAlias = Compaction.compactIri(ctx, "@id", null, relativeToVocab0 = false, reverse = false)
        if (v.contains(idAlias)) {
          val id = v(idAlias)
          if (bnodesToClear.exists(_ == id)) v.remove(idAlias)
        }
        v.keys.toSeq.foreach { prop =>
          v(prop) = removePreserve(ctx, v(prop), bnodesToClear, compactArrays)
        }
        v
      }
    case other => other
  }
}
