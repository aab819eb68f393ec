package jsonld.core

import Json._
import JsonLdUtils._
import scala.collection.mutable

/** Expansion Algorithm (JSON-LD 1.1 API §5.1). Pure, per-document, driver-
  * and executor-safe. Behavior parity verified against the W3C expand suite
  * (cf. reference inventory /root/reference/ld/api_expand.go).
  */
object Expansion {

  def isEmptyObject(v: Any): Boolean = v match {
    case m: JObj @unchecked => m.isEmpty
    case _ => false
  }

  /** Entry point. `typeScopedContext` threads the pre-local-context active
    * context for @type-map handling; `insideIndex` suppresses context
    * reversion inside index-map expansion.
    */
  def expand(activeCtx0: Context, activeProperty: String, element: Any,
             opts: JsonLdOptions, insideIndex: Boolean = false,
             typeScopedContext0: Context = null): Any = {
    var activeCtx = activeCtx0
    var typeScopedContext = typeScopedContext0
    var frameExpansion = opts.processingMode == JsonLdOptions.JsonLd11ExpandFrame
    if (activeProperty == "@default") frameExpansion = false

    element match {
      case null => null

      case elems: JArr @unchecked =>
        val resultList = Json.arr()
        elems.foreach { item =>
          var v = expand(activeCtx, activeProperty, item, opts, insideIndex, typeScopedContext)
          if (activeProperty == "@list" || activeCtx.hasContainerMapping(activeProperty, "@list")) {
            v match {
              case a: JArr @unchecked =>
                val wrapped = Json.obj(); wrapped("@list") = a; v = wrapped
              case _ =>
            }
          }
          v match {
            case null =>
            case a: JArr @unchecked => resultList ++= a
            case other => resultList += other
          }
        }
        resultList

      case elem: JObj @unchecked =>
        val expandedActiveProperty =
          activeCtx.expandIri(activeProperty, relative = false, vocabFlag = true, null, null)

        var propertyScopedCtx: Any = null
        var propertyScopedCtxPresent = false
        val tdAp = activeCtx.getTermDefinition(activeProperty)
        if (tdAp != null && tdAp.hasContext) {
          propertyScopedCtx = tdAp.scopedContext
          propertyScopedCtxPresent = true
        }

        if (typeScopedContext == null && activeCtx.previousContext != null)
          typeScopedContext = activeCtx

        var mustRevert = !insideIndex
        val elemOrderedKeys = Json.sortedKeys(elem)
        val hasContext = elem.contains("@context")
        if (mustRevert && typeScopedContext != null && elemOrderedKeys.size <= 2 && !hasContext) {
          var break = false
          elemOrderedKeys.foreach { key =>
            if (!break) {
              val ep = typeScopedContext.expandIri(key, relative = false, vocabFlag = true, null, null)
              if (ep == "@value") {
                mustRevert = false
                activeCtx = typeScopedContext
                break = true
              } else if (ep == "@id" && elemOrderedKeys.size == 1) {
                mustRevert = false
                break = true
              }
            }
          }
        }
        if (mustRevert) activeCtx = activeCtx.revertToPreviousContext()

        if (propertyScopedCtxPresent && propertyScopedCtx != null)
          activeCtx = activeCtx.parseWith(propertyScopedCtx, List.empty, parsingRemote = false,
            propagate0 = true, protectedFlag = false, overrideProtected = true)

        if (hasContext) activeCtx = activeCtx.parse(elem("@context"))

        typeScopedContext = activeCtx

        var typeKey: String = null
        elemOrderedKeys.foreach { key =>
          val ep = activeCtx.expandIri(key, relative = false, vocabFlag = true, null, null)
          if (ep == "@type") {
            val types = mutable.ArrayBuffer.empty[String]
            elem(key) match {
              case a: JArr @unchecked =>
                a.foreach {
                  case s: String => types += s
                  case _ => throw JsonLdError(JsonLdError.InvalidTypeValue,
                    "@type value must be a string or array of strings")
                }
                val sorted = types.sorted(Json.utf8Ordering)
                types.clear(); types ++= sorted
              case s: String => types += s
              case _: JObj @unchecked =>
                if (!frameExpansion)
                  throw JsonLdError(JsonLdError.InvalidTypeValue,
                    "@type value must be a string or array of strings")
              case _ => throw JsonLdError(JsonLdError.InvalidTypeValue,
                "@type value must be a string or array of strings")
            }
            types.foreach { tt =>
              val td = typeScopedContext.getTermDefinition(tt)
              if (td != null && td.hasContext)
                activeCtx = activeCtx.parseWith(td.scopedContext, List.empty, parsingRemote = false,
                  propagate0 = false, protectedFlag = false, overrideProtected = false)
            }
            typeKey = key
          }
        }

        val resultMap = Json.obj()
        expandObject(activeCtx, activeProperty, expandedActiveProperty, elem, resultMap,
          typeKey, opts, typeScopedContext, frameExpansion)

        // value-object validation
        if (resultMap.contains("@value")) {
          val allowed = Set("@value", "@index", "@language", "@type", "@direction")
          if (resultMap.keys.exists(k => !allowed.contains(k)))
            throw JsonLdError(JsonLdError.InvalidValueObject, "value object has unknown keys")
          val hasLang = resultMap.contains("@language")
          val hasDir = resultMap.contains("@direction")
          val hasType = resultMap.contains("@type")
          if ((hasLang || hasDir) && hasType)
            throw JsonLdError(JsonLdError.InvalidValueObject,
              "value object must not include @type with @language or @direction")
          val rval = resultMap("@value")
          if (rval == null && resultMap.getOrElse("@type", null) != "@json") return null
          if (hasLang) {
            arrayify(rval).foreach { v =>
              if (!v.isInstanceOf[String] && !isEmptyObject(v))
                throw JsonLdError(JsonLdError.InvalidLanguageTaggedValue,
                  "only strings may be language-tagged")
            }
          } else if (hasType) {
            val types = arrayify(resultMap("@type"))
            val jsonOk = activeCtx.isMode11 && types.size == 1 && types.headOption.contains("@json")
            if (!jsonOk) {
              types.foreach {
                case v if isEmptyObject(v) =>
                case s: String if isAbsoluteIri(s) && !s.startsWith("_:") =>
                case _ => throw JsonLdError(JsonLdError.InvalidTypedValue,
                  "@value with @type requires an absolute IRI @type")
              }
            }
          }
          postProcess(resultMap, activeProperty, frameExpansion)
        } else if (resultMap.contains("@type")) {
          resultMap("@type") match {
            case _: JArr @unchecked =>
            case other => resultMap("@type") = Json.arr(other)
          }
          postProcess(resultMap, activeProperty, frameExpansion)
        } else {
          val hasSet = resultMap.contains("@set")
          val hasList = resultMap.contains("@list")
          if (hasSet || hasList) {
            val maxSize = if (resultMap.contains("@index")) 2 else 1
            if (resultMap.size > maxSize)
              throw JsonLdError(JsonLdError.InvalidSetOrListObject, "@set or @list may only contain @index")
            if (hasSet) return resultMap("@set")
          }
          postProcess(resultMap, activeProperty, frameExpansion)
        }

      case scalar =>
        if (activeProperty == "" || activeProperty == "@graph") null
        else activeCtx.expandValue(activeProperty, scalar)
    }
  }

  private def postProcess(resultMap0: JObj, activeProperty: String, frameExpansion: Boolean): Any = {
    var resultMap: JObj = resultMap0
    if (resultMap.contains("@language") && resultMap.size == 1) resultMap = null
    if (activeProperty == "" || activeProperty == "@graph") {
      if (resultMap != null &&
          (resultMap.isEmpty || resultMap.contains("@value") || resultMap.contains("@list")))
        resultMap = null
      else if (resultMap != null && !frameExpansion && resultMap.contains("@id") && resultMap.size == 1)
        resultMap = null
    }
    resultMap
  }

  // ---------------------------------------------------------------------

  private def expandObject(activeCtx: Context, activeProperty: String,
                           expandedActiveProperty: String, elem: JObj, resultMap: JObj,
                           typeKey: String, opts: JsonLdOptions,
                           typeScopedContext: Context, frameExpansion: Boolean): Unit = {
    var inputType: Any = if (typeKey != null) elem.getOrElse(typeKey, null) else null
    inputType match {
      case a: JArr @unchecked => inputType = if (a.nonEmpty) a.last else null
      case _ =>
    }
    inputType match {
      case _: JObj @unchecked =>
        if (frameExpansion) inputType = null
        else throw JsonLdError(JsonLdError.InvalidTypedValue, "@type value must be a string")
      case _ =>
    }
    if (inputType != null)
      inputType = activeCtx.expandIri(inputType.asInstanceOf[String], relative = false,
        vocabFlag = true, null, null)

    val nests = mutable.ArrayBuffer.empty[String]

    Json.sortedKeys(elem).foreach { key =>
      val value = elem(key)
      var skip = false
      if (key == "@context") skip = true

      if (!skip) {
        val expandedProperty = activeCtx.expandIri(key, relative = false, vocabFlag = true, null, null)

        if (expandedProperty == null || expandedProperty == "" ||
            (!expandedProperty.contains(':') && !isKeyword(expandedProperty))) {
          // drop properties that do not expand to an IRI or keyword —
          // unless safeMode demands observable data loss
          // (cf. /root/reference/ld/api_expand.go:365)
          if (opts.safeMode)
            throw JsonLdError(JsonLdError.InvalidProperty,
              s"Dropping property that did not expand into an absolute IRI or keyword: $key")
        } else if (isKeyword(expandedProperty)) {
          var expandedValue: Any = null
          var continueOuter = false

          if (expandedActiveProperty == "@reverse")
            throw JsonLdError(JsonLdError.InvalidReversePropertyMap,
              "a keyword cannot be used as a @reverse property")
          val containsKey = resultMap.contains(expandedProperty)
          if (containsKey && expandedProperty != "@type" && expandedProperty != "@included")
            throw JsonLdError(JsonLdError.CollidingKeywords, s"$expandedProperty already exists in result")

          expandedProperty match {
            case "@id" =>
              value match {
                case s: String =>
                  expandedValue = activeCtx.expandIri(s, relative = true, vocabFlag = false, null, null)
                  if (expandedValue == "") {
                    // keyword-form @id values are reserved: record the id
                    // as explicit null (dropped again at RDF conversion)
                    resultMap("@id") = null
                    continueOuter = true
                  }
                case m: JObj @unchecked if frameExpansion =>
                  if (m.nonEmpty)
                    throw JsonLdError(JsonLdError.InvalidIdValue, "@id must be an empty object for framing")
                  expandedValue = Json.arr(m)
                case a: JArr @unchecked if frameExpansion =>
                  val lst = Json.arr()
                  a.foreach {
                    case s: String =>
                      lst += activeCtx.expandIri(s, relative = true, vocabFlag = true, null, null)
                    case _ => throw JsonLdError(JsonLdError.InvalidIdValue,
                      "@id value must be a string, an array of strings or an empty object")
                  }
                  expandedValue = lst
                case _ => throw JsonLdError(JsonLdError.InvalidIdValue, "value of @id must be a string")
              }

            case "@included" =>
              if (activeCtx.isMode10) continueOuter = true
              else {
                val ev = expand(activeCtx, activeProperty, value, opts, insideIndex = false, null)
                val includedResult = ev match {
                  case a: JArr @unchecked => a
                  case other => Json.arr(other) // includes null: not a node object
                }
                includedResult.foreach { v =>
                  if (!isSubject(v))
                    throw JsonLdError(JsonLdError.InvalidIncludedValue,
                      "values of @included must expand to node objects")
                }
                resultMap.get("@included") match {
                  case Some(prev: JArr @unchecked) =>
                    val merged = Json.arr(); merged ++= prev; merged ++= includedResult
                    expandedValue = merged
                  case _ => expandedValue = includedResult
                }
              }

            case "@type" =>
              value match {
                case a: JArr @unchecked =>
                  val lst = Json.arr()
                  a.foreach {
                    case s: String =>
                      lst += typeScopedContext.expandIri(s, relative = true, vocabFlag = true, null, null)
                    case _ => throw JsonLdError(JsonLdError.InvalidTypeValue,
                      "@type value must be a string or array of strings")
                  }
                  expandedValue = lst
                case s: String =>
                  expandedValue = typeScopedContext.expandIri(s, relative = true, vocabFlag = true, null, null)
                  if (containsKey) {
                    val merged = Json.arr()
                    merged ++= arrayify(resultMap(expandedProperty))
                    merged += expandedValue
                    expandedValue = merged
                  }
                case m: JObj @unchecked =>
                  if (m.isEmpty) expandedValue = value
                  else if (frameExpansion && m.contains("@default")) {
                    // frame pattern: @type with a default — expand the
                    // default IRIs, keep the pattern shape
                    val defs = Json.arr()
                    arrayify(m("@default")).foreach {
                      case s: String =>
                        defs += typeScopedContext.expandIri(s, relative = true, vocabFlag = true, null, null)
                      case v => defs += v
                    }
                    val out = Json.obj(); out("@default") = defs
                    expandedValue = out
                  } else
                    throw JsonLdError(JsonLdError.InvalidTypeValue,
                      "@type value must be an empty object for framing")
                case other => throw JsonLdError(JsonLdError.InvalidTypeValue, String.valueOf(other))
              }

            case "@graph" =>
              val ev = expand(activeCtx, "@graph", value, opts, insideIndex = false, null)
              expandedValue = {
                val a = Json.arr(); a ++= arrayify(ev); a
              }

            case "@value" =>
              if (inputType == "@json" && activeCtx.isMode11) {
                // any value allowed; checked after full expansion
              } else {
                value match {
                  case _: JObj @unchecked | _: JArr @unchecked if !frameExpansion =>
                    throw JsonLdError(JsonLdError.InvalidValueObjectValue,
                      "value of @value must be a scalar or null")
                  case _ =>
                }
              }
              expandedValue = value
              if (expandedValue == null) {
                resultMap("@value") = null
                continueOuter = true
              }

            case "@language" =>
              if (frameExpansion) {
                val lst = Json.arr()
                arrayify(value).foreach {
                  case s: String => lst += s.toLowerCase
                  case v => lst += v
                }
                expandedValue = lst
              } else value match {
                case s: String => expandedValue = s.toLowerCase
                case _ => throw JsonLdError(JsonLdError.InvalidLanguageTaggedString,
                  "@language value must be a string")
              }

            case "@direction" =>
              if (frameExpansion) {
                val lst = Json.arr()
                arrayify(value).foreach {
                  case s: String => lst += s.toLowerCase
                  case v => lst += v
                }
                expandedValue = lst
              } else value match {
                case s: String if s == "ltr" || s == "rtl" => expandedValue = value
                case _ => throw JsonLdError(JsonLdError.InvalidBaseDirection,
                  "@direction must be one of 'ltr', 'rtl'")
              }

            case "@index" =>
              value match {
                case _: String => expandedValue = value
                case _ => throw JsonLdError(JsonLdError.InvalidIndexValue,
                  "value of @index must be a string")
              }

            case "@list" =>
              if (activeProperty == "" || activeProperty == "@graph") continueOuter = true
              else {
                val ev = expand(activeCtx, activeProperty, value, opts, insideIndex = false, null)
                expandedValue = { val a = Json.arr(); a ++= arrayify(ev); a }
              }

            case "@set" =>
              expandedValue = expand(activeCtx, activeProperty, value, opts, insideIndex = false, null)

            case "@reverse" =>
              if (!value.isInstanceOf[JObj])
                throw JsonLdError(JsonLdError.InvalidReverseValue, "@reverse value must be an object")
              val ev = expand(activeCtx, "@reverse", value, opts, insideIndex = false, null)
              val evMap = ev.asInstanceOf[JObj]
              evMap.get("@reverse") match {
                case Some(rev: JObj @unchecked) =>
                  rev.foreach { case (property, item) =>
                    val propertyList = resultMap.get(property) match {
                      case Some(a: JArr @unchecked) => a
                      case _ => val a = Json.arr(); resultMap(property) = a; a
                    }
                    item match {
                      case a: JArr @unchecked => propertyList ++= a
                      case other => propertyList += other
                    }
                  }
                case _ =>
              }
              val maxSize = if (evMap.contains("@reverse")) 1 else 0
              if (evMap.size > maxSize) {
                val reverseMap = resultMap.get("@reverse") match {
                  case Some(m: JObj @unchecked) => m
                  case _ => val m = Json.obj(); resultMap("@reverse") = m; m
                }
                evMap.foreach { case (property, propertyValue) =>
                  if (property != "@reverse") {
                    propertyValue.asInstanceOf[JArr].foreach { item =>
                      val itemMap = item.asInstanceOf[JObj]
                      if (itemMap.contains("@value") || itemMap.contains("@list"))
                        throw JsonLdError(JsonLdError.InvalidReversePropertyValue)
                      val lst = reverseMap.get(property) match {
                        case Some(a: JArr @unchecked) => a
                        case _ => val a = Json.arr(); reverseMap(property) = a; a
                      }
                      lst += item
                    }
                  }
                }
              }
              continueOuter = true

            case "@nest" =>
              nests += key
              continueOuter = true

            case "@default" =>
              expandedValue = expand(activeCtx, "@default", value, opts, insideIndex = false, null)

            case "@explicit" | "@embed" | "@requireAll" | "@omitDefault" =>
              expandedValue = Json.arr(value)

            case _ =>
          }

          if (!continueOuter && expandedValue != null)
            resultMap(expandedProperty) = expandedValue

        } else {
          // non-keyword property
          var termCtx = activeCtx
          val td = activeCtx.getTermDefinition(key)
          if (td != null && td.hasContext)
            termCtx = activeCtx.parseWith(td.scopedContext, List.empty, parsingRemote = false,
              propagate0 = true, protectedFlag = false, overrideProtected = true)

          var expandedValue: Any = null
          val valueIsMap = value.isInstanceOf[JObj]

          if (termCtx.hasContainerMapping(key, "@language") && valueIsMap) {
            val valueMap = value.asInstanceOf[JObj]
            val lst = Json.arr()
            val hasDir = td != null && td.hasDirection
            val dir = if (td != null) td.direction else null
            Json.sortedKeys(valueMap).foreach { language =>
              val expandedLanguage = termCtx.expandIri(language, relative = false, vocabFlag = true, null, null)
              arrayify(valueMap(language)).foreach {
                case null =>
                case s: String =>
                  val v = Json.obj()
                  v("@value") = s
                  if (expandedLanguage != "@none") v("@language") = language.toLowerCase
                  if (hasDir) { if (dir != null) v("@direction") = dir }
                  else if (termCtx.direction != "") v("@direction") = termCtx.direction
                  lst += v
                case item => throw JsonLdError(JsonLdError.InvalidLanguageMapValue,
                  s"expected $item to be a string")
              }
            }
            expandedValue = lst
          } else if (termCtx.hasContainerMapping(key, "@index") && valueIsMap) {
            val asGraph = termCtx.hasContainerMapping(key, "@graph")
            val tdKey = termCtx.getTermDefinition(key)
            val indexKey = if (tdKey != null && tdKey.index != "") tdKey.index else "@index"
            val propertyIndex =
              if (indexKey != "@index")
                activeCtx.expandIri(indexKey, relative = false, vocabFlag = true, null, null)
              else ""
            expandedValue = expandIndexMap(termCtx, key, value.asInstanceOf[JObj], indexKey,
              asGraph, propertyIndex, opts)
          } else if (termCtx.hasContainerMapping(key, "@id") && valueIsMap) {
            val asGraph = termCtx.hasContainerMapping(key, "@graph")
            expandedValue = expandIndexMap(termCtx, key, value.asInstanceOf[JObj], "@id",
              asGraph, "", opts)
          } else if (termCtx.hasContainerMapping(key, "@type") && valueIsMap) {
            expandedValue = expandIndexMap(termCtx.revertToPreviousContext(), key,
              value.asInstanceOf[JObj], "@type", asGraph = false, "", opts)
          } else {
            val isList = expandedProperty == "@list"
            val tdKey = activeCtx.getTermDefinition(key)
            if (isList || expandedProperty == "@set") {
              var nextActiveProperty = activeProperty
              if (isList && expandedActiveProperty == "@graph") nextActiveProperty = ""
              expandedValue = expand(termCtx, nextActiveProperty, value, opts, insideIndex = false, null)
            } else if (tdKey != null && tdKey.typeMapping == "@json") {
              val m = Json.obj()
              m("@type") = "@json"
              m("@value") = value
              expandedValue = m
            } else {
              expandedValue = expand(termCtx, key, value, opts, insideIndex = false, null)
            }
          }

          if (expandedValue != null) {
            if (termCtx.hasContainerMapping(key, "@list")) {
              val isListObj = expandedValue match {
                case m: JObj @unchecked => m.contains("@list")
                case _ => false
              }
              if (!isListObj) {
                val wrapped = Json.obj()
                wrapped("@list") = (expandedValue match {
                  case a: JArr @unchecked => a
                  case other => Json.arr(other)
                })
                expandedValue = wrapped
              }
            }

            val isContainerGraph = termCtx.hasContainerMapping(key, "@graph")
            val isContainerId = termCtx.hasContainerMapping(key, "@id")
            val isContainerIndex = termCtx.hasContainerMapping(key, "@index")
            if (isContainerGraph && !isContainerId && !isContainerIndex) {
              val rVal = Json.arr()
              arrayify(expandedValue).foreach { ev =>
                val g = Json.obj()
                g("@graph") = { val a = Json.arr(); a ++= arrayify(ev); a }
                rVal += g
              }
              expandedValue = rVal
            }

            if (termCtx.isReverseProperty(key)) {
              val reverseMap = resultMap.get("@reverse") match {
                case Some(m: JObj @unchecked) => m
                case _ => val m = Json.obj(); resultMap("@reverse") = m; m
              }
              val evList = expandedValue match {
                case a: JArr @unchecked => a
                case other => Json.arr(other)
              }
              evList.foreach { item =>
                val lst = reverseMap.get(expandedProperty) match {
                  case Some(a: JArr @unchecked) => a
                  case _ => val a = Json.arr(); reverseMap(expandedProperty) = a; a
                }
                item match {
                  case m: JObj @unchecked =>
                    if (m.contains("@value") || m.contains("@list"))
                      throw JsonLdError(JsonLdError.InvalidReversePropertyValue)
                    lst += m
                  case a: JArr @unchecked => lst ++= a
                  case other => lst += other
                }
              }
            } else {
              val lst = resultMap.get(expandedProperty) match {
                case Some(a: JArr @unchecked) => a
                case _ => val a = Json.arr(); resultMap(expandedProperty) = a; a
              }
              expandedValue match {
                case a: JArr @unchecked => lst ++= a
                case other => lst += other
              }
            }
          }
        }
      }
    }

    // expand each nested key
    nests.foreach { n =>
      arrayify(elem(n)).foreach { nv =>
        val ok = nv match {
          case m: JObj @unchecked =>
            !m.keys.exists { k =>
              activeCtx.expandIri(k, relative = false, vocabFlag = true, null, null) == "@value"
            }
          case _ => false
        }
        if (!ok) throw JsonLdError(JsonLdError.InvalidNestValue, "nested value must be a node object")
        expandObject(activeCtx, activeProperty, expandedActiveProperty, nv.asInstanceOf[JObj],
          resultMap, typeKey, opts, typeScopedContext, frameExpansion)
      }
    }
  }

  private def expandIndexMap(activeCtx: Context, activeProperty: String, value: JObj,
                             indexKey: String, asGraph: Boolean, propertyIndex: String,
                             opts: JsonLdOptions): Any = {
    val expandedValueList = Json.arr()
    Json.sortedKeys(value).foreach { key0 =>
      var key = key0
      var indexCtx = activeCtx
      val tdK = activeCtx.getTermDefinition(key)
      if (indexKey == "@type" && tdK != null && tdK.hasContext)
        indexCtx = activeCtx.parse(tdK.scopedContext)

      val rawIndexValue = { val a = Json.arr(); a ++= arrayify(value(key0)); a }
      val indexValue = expand(indexCtx, activeProperty, rawIndexValue, opts,
        insideIndex = true, null).asInstanceOf[JArr]

      var expandedKey: Any = null
      if (propertyIndex != "") {
        expandedKey = if (key == "@none") "@none" else indexCtx.expandValue(indexKey, key)
      } else {
        expandedKey = indexCtx.expandIri(key, relative = false, vocabFlag = true, null, null)
      }

      if (indexKey == "@id")
        key = indexCtx.expandIri(key, relative = true, vocabFlag = false, null, null)
      else if (indexKey == "@type")
        key = expandedKey.asInstanceOf[String]

      indexValue.foreach { itemValue0 =>
        var itemValue = itemValue0
        if (asGraph && !isGraphObject(itemValue)) {
          val g = Json.obj()
          g("@graph") = { val a = Json.arr(); a ++= arrayify(itemValue); a }
          itemValue = g
        }
        val item = itemValue.asInstanceOf[JObj]
        if (indexKey == "@type") {
          if (expandedKey != "@none") {
            item.get("@type") match {
              case Some(s: String) => item("@type") = Json.arr(key, s)
              case Some(a: JArr @unchecked) =>
                val merged = Json.arr(); merged += key; merged ++= a
                item("@type") = merged
              case _ => item("@type") = Json.arr(key)
            }
          }
        } else if (isValueObject(item) && indexKey != "@language" && indexKey != "@index") {
          throw JsonLdError(JsonLdError.InvalidValueObject,
            s"Attempt to add illegal key to value object: $indexKey")
        } else if (propertyIndex != "") {
          if (expandedKey != "@none")
            addValue(item, propertyIndex, expandedKey, asArray = true,
              allowDuplicate = true, prependValue = true)
        } else if (!item.contains(indexKey) && expandedKey != "@none") {
          item(indexKey) = key
        }
        expandedValueList += item
      }
    }
    expandedValueList
  }
}
