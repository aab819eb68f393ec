package jsonld.core

import Json._
import JsonLdUtils._
import scala.collection.mutable

/** Compaction (JSON-LD 1.1 API §6): inverse context creation, IRI/value
  * compaction, and the Compaction Algorithm. Pure per-document transforms.
  * Behavior parity target: the W3C compact suite (240 tests).
  */
object Compaction {

  final case class FastCurieEntry(iri: String, terms: mutable.ArrayBuffer[String])

  // ------------------------------------------------------ inverse context

  def getInverse(ctx: Context): mutable.HashMap[String, Any] = {
    if (ctx.inverseCtx != null) return ctx.inverseCtx
    val inverse = mutable.HashMap.empty[String, Any]
    ctx.inverseCtx = inverse
    ctx.fastCurie = mutable.HashMap.empty[String, Any]

    val defaultLanguage = if (ctx.hasLanguage) ctx.language else "@none"
    val terms = ctx.terms.keys.toSeq.sorted(shortestLeast)
    val irisToTerms = mutable.HashMap.empty[String, mutable.ArrayBuffer[String]]

    terms.foreach { term =>
      val definition = ctx.terms(term)
      if (definition != null && definition.id != null && definition.id.nonEmpty) {
        val containerJoin =
          if (definition.container.isEmpty) "@none"
          else definition.container.sorted.mkString("")

        val iri = definition.id
        val isKw = isKeyword(iri)
        val termHasColon = definition.termHasColon

        val containerMap = inverse.get(iri) match {
          case Some(m: mutable.HashMap[String, Any] @unchecked) =>
            if (!isKw && !termHasColon) irisToTerms(iri) += term
            m
          case _ =>
            val m = mutable.HashMap.empty[String, Any]
            inverse(iri) = m
            if (!isKw && !termHasColon && iri != null && iri.nonEmpty) {
              val buf = mutable.ArrayBuffer(term)
              irisToTerms(iri) = buf
              val entry = FastCurieEntry(iri, buf)
              val letter = iri.substring(0, 1)
              ctx.fastCurie.get(letter) match {
                case Some(arr: mutable.ArrayBuffer[FastCurieEntry] @unchecked) => arr += entry
                case _ => ctx.fastCurie(letter) = mutable.ArrayBuffer(entry)
              }
            }
            m
        }

        val typeLanguageMap = containerMap.get(containerJoin) match {
          case Some(m: mutable.HashMap[String, Any] @unchecked) => m
          case _ =>
            val m = mutable.HashMap.empty[String, Any]
            m("@language") = mutable.HashMap.empty[String, Any]
            m("@type") = mutable.HashMap.empty[String, Any]
            m("@any") = mutable.HashMap[String, Any]("@none" -> term)
            containerMap(containerJoin) = m
            m
        }
        def langMap = typeLanguageMap("@language").asInstanceOf[mutable.HashMap[String, Any]]
        def typeMap = typeLanguageMap("@type").asInstanceOf[mutable.HashMap[String, Any]]

        if (definition.reverse) {
          if (!typeMap.contains("@reverse")) typeMap("@reverse") = term
        } else if (definition.typeMapping == "@none") {
          if (!typeMap.contains("@any")) typeMap("@any") = term
          if (!langMap.contains("@any")) langMap("@any") = term
          val anyMap = typeLanguageMap("@any").asInstanceOf[mutable.HashMap[String, Any]]
          if (!anyMap.contains("@any")) anyMap("@any") = term
        } else if (definition.typeMapping != "") {
          if (!typeMap.contains(definition.typeMapping)) typeMap(definition.typeMapping) = term
        } else if (definition.hasLanguage && definition.hasDirection) {
          val langDir =
            if (definition.language != null && definition.direction != null)
              definition.language + "_" + definition.direction
            else if (definition.language != null) definition.language
            else if (definition.direction != null) "_" + definition.direction
            else "@null"
          if (!langMap.contains(langDir)) langMap(langDir) = term
        } else if (definition.hasLanguage) {
          val language = if (definition.language != null) definition.language else "@null"
          if (!langMap.contains(language)) langMap(language) = term
        } else if (definition.hasDirection) {
          val dir = if (definition.direction != null) "_" + definition.direction else "@none"
          if (!langMap.contains(dir)) langMap(dir) = term
        } else if (ctx.direction != "") {
          val langDir = "_" + ctx.direction
          if (!langMap.contains(langDir)) langMap(langDir) = term
          if (!langMap.contains("@none")) langMap("@none") = term
          if (!typeMap.contains("@none")) typeMap("@none") = term
        } else {
          if (!langMap.contains(defaultLanguage)) langMap(defaultLanguage) = term
          if (!langMap.contains("@none")) langMap("@none") = term
          if (!typeMap.contains("@none")) typeMap("@none") = term
        }
      }
    }

    // build the fast CURIE trie over first letters
    ctx.fastCurie.keys.toSeq.foreach(k => buildIriMap(ctx.fastCurie, k, 1))
    inverse
  }

  private def buildIriMap(iriMap: mutable.HashMap[String, Any], key: String, idx: Int): Unit = {
    val entries = iriMap(key).asInstanceOf[mutable.ArrayBuffer[FastCurieEntry]]
    val next = mutable.HashMap.empty[String, Any]
    iriMap(key) = next
    entries.foreach { entry =>
      val letter = if (idx < entry.iri.length) entry.iri.substring(idx, idx + 1) else ""
      next.get(letter) match {
        case Some(arr: mutable.ArrayBuffer[FastCurieEntry] @unchecked) => arr += entry
        case _ => next(letter) = mutable.ArrayBuffer(entry)
      }
    }
    next.keys.toSeq.foreach { k => if (k != "") buildIriMap(next, k, idx + 1) }
  }

  // ---------------------------------------------------------- selectTerm

  def selectTerm(ctx: Context, iri: String, containers: Seq[String],
                 typeLanguage: String, preferredValues: Seq[String]): String = {
    val inv = getInverse(ctx)
    val containerMap = inv(iri).asInstanceOf[mutable.HashMap[String, Any]]
    containers.foreach { container =>
      containerMap.get(container).foreach { tl =>
        val typeLanguageMap = tl.asInstanceOf[mutable.HashMap[String, Any]]
        val valueMap = typeLanguageMap(typeLanguage).asInstanceOf[mutable.HashMap[String, Any]]
        preferredValues.foreach { item =>
          valueMap.get(item) match {
            case Some(t: String) => return t
            case _ =>
          }
        }
      }
    }
    ""
  }

  // ---------------------------------------------------------- compactIri

  def compactIri(ctx: Context, iri: String, value: Any, relativeToVocab0: Boolean,
                 reverse: Boolean): String = {
    if (iri == null || iri.isEmpty) return iri
    var relativeToVocab = relativeToVocab0
    val inverseCtx = getInverse(ctx)

    if (isKeyword(iri)) {
      // look for a keyword alias
      inverseCtx.get(iri).foreach { v =>
        v.asInstanceOf[mutable.HashMap[String, Any]].get("@none").foreach { v2 =>
          v2.asInstanceOf[mutable.HashMap[String, Any]].get("@type").foreach { v3 =>
            v3.asInstanceOf[mutable.HashMap[String, Any]].get("@none").foreach {
              case s: String => return s
              case _ =>
            }
          }
        }
      }
      relativeToVocab = true
    }

    if (relativeToVocab && inverseCtx.contains(iri)) {
      val defaultLanguage =
        if (ctx.hasLanguage && ctx.direction != "") ctx.language + "_" + ctx.direction
        else if (ctx.hasLanguage) ctx.language
        else "@none"

      val containers = mutable.ArrayBuffer.empty[String]
      var curValue = value
      var valueMap: JObj = curValue match {
        case m: JObj @unchecked => m
        case _ => null
      }
      val isObject = valueMap != null

      if (isObject) {
        if (valueMap.contains("@index") && !valueMap.contains("@graph"))
          containers += ("@index", "@index@set")
        valueMap.get("@preserve") match {
          case Some(pv: JArr @unchecked) if pv.nonEmpty =>
            curValue = pv.head
            valueMap = curValue match {
              case m: JObj @unchecked => m
              case _ => null
            }
          case _ =>
        }
      }

      if (isGraphObject(curValue)) {
        val hasIndex = valueMap.contains("@index")
        val hasId = valueMap.contains("@id")
        if (hasIndex) containers += ("@graph@index", "@graph@index@set", "@index", "@index@set")
        if (hasId) containers += ("@graph@id", "@graph@id@set")
        containers += ("@graph", "@graph@set", "@set")
        if (!hasIndex) containers += ("@graph@index", "@graph@index@set", "@index", "@index@set")
        if (!hasId) containers += ("@graph@id", "@graph@id@set")
      } else if (valueMap != null && !isValueObject(valueMap)) {
        containers += ("@id", "@id@set", "@type", "@set@type")
      }

      var typeLanguage = "@language"
      var typeLanguageValue = "@null"

      if (reverse) {
        typeLanguage = "@type"
        typeLanguageValue = "@reverse"
        containers += "@set"
      } else if (valueMap != null && valueMap.contains("@list")) {
        if (!valueMap.contains("@index")) containers += "@list"
        val list = valueMap("@list") match {
          case a: JArr @unchecked => a
          case _ => Json.arr()
        }
        var commonType: String = if (list.isEmpty) "@id" else ""
        var commonLanguage: String = if (list.isEmpty) defaultLanguage else ""
        var break = false
        list.foreach { item =>
          if (!break) {
            var itemLanguage = "@none"
            var itemType = "@none"
            if (isValueObject(item)) {
              val itemMap = item.asInstanceOf[JObj]
              (itemMap.get("@direction"), itemMap.get("@language")) match {
                case (Some(d), Some(l)) => itemLanguage = s"${l}_$d"
                case (Some(d), None) => itemLanguage = s"_$d"
                case (None, Some(l: String)) => itemLanguage = l
                case _ =>
                  if (itemMap.contains("@type")) itemType = itemMap("@type").asInstanceOf[String]
                  else itemLanguage = "@null"
              }
            } else itemType = "@id"

            if (commonLanguage == "") commonLanguage = itemLanguage
            else if (commonLanguage != itemLanguage && isValueObject(item)) commonLanguage = "@none"
            if (commonType == "") commonType = itemType
            else if (commonType != itemType) commonType = "@none"
            if (commonLanguage == "@none" && commonType == "@none") break = true
          }
        }
        if (commonLanguage == "") commonLanguage = "@none"
        if (commonType == "") commonType = "@none"
        if (commonType != "@none") {
          typeLanguage = "@type"
          typeLanguageValue = commonType
        } else typeLanguageValue = commonLanguage
      } else {
        if (isValueObject(curValue)) {
          val vm = valueMap
          if (vm.contains("@language") && !vm.contains("@index")) {
            containers += ("@language", "@language@set")
            val langVal = vm("@language")
            typeLanguageValue = vm.get("@direction") match {
              case Some(d) => s"${langVal}_$d"
              case None => String.valueOf(langVal)
            }
          } else if (vm.contains("@direction") && !vm.contains("@index")) {
            typeLanguageValue = "_" + vm("@direction")
          } else if (vm.contains("@type")) {
            typeLanguage = "@type"
            typeLanguageValue = vm("@type").asInstanceOf[String]
          }
        } else {
          typeLanguage = "@type"
          typeLanguageValue = "@id"
        }
        containers += "@set"
      }

      containers += "@none"
      if (isObject && !(valueMap != null && valueMap.contains("@index")))
        containers += ("@index", "@index@set")
      if (isValueObject(curValue) && curValue.asInstanceOf[JObj].size == 1)
        containers += ("@language", "@language@set")

      if (typeLanguageValue == null || typeLanguageValue == "") typeLanguageValue = "@null"

      val preferredValues = mutable.ArrayBuffer.empty[String]
      val hasId = valueMap != null && valueMap.contains("@id")
      if ((typeLanguageValue == "@reverse" || typeLanguageValue == "@id") && hasId) {
        if (typeLanguageValue == "@reverse") preferredValues += "@reverse"
        val idVal = valueMap("@id")
        val result = compactIri(ctx, idVal.asInstanceOf[String], null, relativeToVocab0 = true, reverse = false)
        val check = ctx.terms.get(result).flatMap(Option(_)) match {
          case Some(td) => td.id != "" && idVal == td.id
          case None => false
        }
        if (check) preferredValues += ("@vocab", "@id", "@none")
        else preferredValues += ("@id", "@vocab", "@none")
      } else {
        if (valueMap != null && valueMap.contains("@list") && valueMap("@list") == null)
          typeLanguage = "@any"
        preferredValues += (typeLanguageValue, "@none")
      }
      preferredValues += "@any"

      // language-tag_direction → add bare _direction as an extra preference
      preferredValues.toSeq.foreach { pv =>
        val idx = pv.lastIndexOf('_')
        if (idx != -1) preferredValues += pv.substring(idx)
      }

      val term = selectTerm(ctx, iri, containers.toSeq, typeLanguage, preferredValues.toSeq)
      if (term != "") return term
    }

    if (relativeToVocab && ctx.vocab != null) {
      val vocab = ctx.vocab
      if (iri.startsWith(vocab) && iri != vocab) {
        val suffix = iri.substring(vocab.length)
        if (!ctx.terms.contains(suffix)) return suffix
      }
    }

    // fast CURIE partial-match scan
    var compactIriResult = ""
    if (ctx.fastCurie == null) getInverse(ctx)
    val partialMatches = mutable.ArrayBuffer.empty[FastCurieEntry]
    var iriMap: mutable.HashMap[String, Any] = ctx.fastCurie
    var i = 0
    var stop = false
    val maxPartial = iri.length - 1
    while (i < maxPartial && !stop) {
      iriMap.get(iri.substring(i, i + 1)) match {
        case Some(m: mutable.HashMap[String, Any] @unchecked) =>
          iriMap = m
          m.get("") match {
            case Some(arr: mutable.ArrayBuffer[FastCurieEntry] @unchecked) if arr.nonEmpty =>
              partialMatches += arr.head
            case _ =>
          }
        case _ => stop = true
      }
      i += 1
    }
    partialMatches.reverseIterator.foreach { entry =>
      entry.terms.foreach { term =>
        ctx.terms.get(term).flatMap(Option(_)).foreach { td =>
          val curie = term + ":" + iri.substring(entry.iri.length)
          val curieMapping = ctx.terms.get(curie).flatMap(Option(_))
          val usable = td.prefixFlag &&
            (!ctx.terms.contains(curie) || (value == null && curieMapping.exists(_.id == iri)))
          if (usable && (compactIriResult == "" || shortestLeast.compare(curie, compactIriResult) < 0))
            compactIriResult = curie
        }
      }
    }
    if (compactIriResult != "") return compactIriResult

    // prefix-confusion guard
    ctx.terms.foreach { case (term, td) =>
      if (td != null && td.prefixFlag && iri.startsWith(term + ":"))
        throw JsonLdError(JsonLdError.IriConfusedWithPrefix,
          s"Absolute IRI $iri confused with prefix $term")
    }

    if (!relativeToVocab) return Uri.removeBase(ctx.base, iri)
    iri
  }

  // -------------------------------------------------------- compactValue

  def compactValue(ctx: Context, activeProperty: String, value: JObj): Any = {
    var result: Any = value

    val language = ctx.getLanguageMappingStr(activeProperty)
    val direction = ctx.getDirectionMapping(activeProperty)
    val isIndexContainer = ctx.hasContainerMapping(activeProperty, "@index")
    val hasIndex = value.contains("@index")
    val hasId = value.contains("@id")
    val typeVal = value.getOrElse("@type", null)
    val hasType = value.contains("@type")

    val idOrIndex = value.keys.forall(k => k == "@id" || k == "@index")

    val td = ctx.getTermDefinition(activeProperty)
    val propType = if (td != null) td.typeMapping else ""

    val languageVal = value.getOrElse("@language", null) match {
      case s: String => s
      case _ => ""
    }
    val directionVal = value.getOrElse("@direction", null) match {
      case s: String => s
      case _ => ""
    }

    if (hasId && idOrIndex) {
      val idVal = value("@id").asInstanceOf[String]
      if (propType == "@id") {
        result = compactIri(ctx, idVal, null, relativeToVocab0 = false, reverse = false)
      } else if (propType == "@vocab") {
        result = compactIri(ctx, idVal, null, relativeToVocab0 = true, reverse = false)
      } else {
        val compactedId = compactIri(ctx, "@id", null, relativeToVocab0 = true, reverse = false)
        val compactedValue = compactIri(ctx, idVal, null, relativeToVocab0 = false, reverse = false)
        val m = Json.obj(); m(compactedId) = compactedValue
        result = m
      }
    } else if (hasType && typeVal == propType) {
      result = value.getOrElse("@value", null)
    } else if (propType == "@none" || (hasType && typeVal != propType)) {
      result = value
    } else if (!value.getOrElse("@value", null).isInstanceOf[String] &&
               ((hasIndex && isIndexContainer) || !hasIndex)) {
      result = value.getOrElse("@value", null)
    } else if (languageVal == language && directionVal == direction) {
      if ((hasIndex && isIndexContainer) || !hasIndex)
        return value.getOrElse("@value", null)
    }

    result match {
      case rm: JObj @unchecked if rm.contains("@type") && rm("@type") != null &&
          value.getOrElse("@type", null) != "@json" =>
        val newMap = rm.clone().asInstanceOf[JObj]
        newMap("@type") match {
          case tt: JArr @unchecked =>
            val newTT = Json.arr()
            tt.foreach { t =>
              newTT += compactIri(ctx, t.asInstanceOf[String], null, relativeToVocab0 = true, reverse = false)
            }
            newMap("@type") = newTT
          case t: String =>
            newMap("@type") = compactIri(ctx, t, null, relativeToVocab0 = true, reverse = false)
          case _ =>
        }
        result = newMap
      case _ =>
    }

    result match {
      case rm: JObj @unchecked =>
        val newMap = Json.obj()
        rm.foreach { case (k, v) =>
          if (!(k == "@index" && !(hasIndex && !isIndexContainer))) {
            val keyAlias = compactIri(ctx, k, null, relativeToVocab0 = true, reverse = false)
            newMap(keyAlias) = v
          }
        }
        result = newMap
      case _ =>
    }
    result
  }

  // ------------------------------------------------------------- compact

  def compact(activeCtx0: Context, activeProperty: String, element: Any,
              compactArrays: Boolean): Any = {
    var activeCtx = activeCtx0

    element match {
      case elems: JArr @unchecked =>
        val result = Json.arr()
        elems.foreach { item =>
          val ci = compact(activeCtx, activeProperty, item, compactArrays)
          if (ci != null) result += ci
        }
        if (compactArrays && result.size == 1 && activeCtx.getContainer(activeProperty).isEmpty)
          return result.head
        return result
      case _ =>
    }

    val tdAp0 = activeCtx.getTermDefinition(activeProperty)
    if (tdAp0 != null && tdAp0.hasContext)
      activeCtx = activeCtx.parseWith(tdAp0.scopedContext, List.empty, parsingRemote = false,
        propagate0 = true, protectedFlag = false, overrideProtected = true)

    element match {
      case elem: JObj @unchecked =>
        if (isValueObject(elem) || isSubjectReference(elem)) {
          val compactedValue = compactValue(activeCtx, activeProperty, elem)
          val propType = {
            val td = activeCtx.getTermDefinition(activeProperty)
            if (td != null) td.typeMapping else ""
          }
          if (!compactedValue.isInstanceOf[JObj] || propType == "@json")
            return compactedValue
        }

        elem.get("@list") match {
          case Some(list) if activeCtx.hasContainerMapping(activeProperty, "@list") =>
            return compact(activeCtx, activeProperty, list, compactArrays)
          case _ =>
        }

        val insideReverse = activeProperty == "@reverse"
        val result = Json.obj()
        val inputCtx = activeCtx

        if (!isValueObject(elem) && !isSubjectReference(elem))
          activeCtx = activeCtx.revertToPreviousContext()

        val tdAp = inputCtx.getTermDefinition(activeProperty)
        if (tdAp != null && tdAp.scopedContext != null)
          activeCtx = activeCtx.parseWith(tdAp.scopedContext, List.empty, parsingRemote = false,
            propagate0 = true, protectedFlag = false, overrideProtected = true)

        if (elem.contains("@type")) {
          val typeContext = activeCtx
          val types = arrayify(elem("@type")).collect {
            case s: String => compactIri(typeContext, s, null, relativeToVocab0 = true, reverse = false)
          }.sorted(Json.utf8Ordering)
          types.foreach { tt =>
            val td = inputCtx.getTermDefinition(tt)
            if (td != null && td.hasContext)
              activeCtx = activeCtx.parseWith(td.scopedContext, List.empty, parsingRemote = false,
                propagate0 = false, protectedFlag = false, overrideProtected = false)
          }
        }

        Json.sortedKeys(elem).foreach { expandedProperty =>
          val expandedValue = elem(expandedProperty)
          var continueLoop = false

          if (expandedProperty == "@id") {
            val alias = compactIri(activeCtx, "@id", null, relativeToVocab0 = true, reverse = false)
            val compactedValues = Json.arr()
            arrayify(expandedValue).foreach {
              case s: String =>
                compactedValues += compactIri(activeCtx, s, null, relativeToVocab0 = false, reverse = false)
              case other => compactedValues += other
            }
            result(alias) = (if (compactedValues.size == 1) compactedValues.head else compactedValues)
            continueLoop = true
          } else if (expandedProperty == "@type") {
            val alias = compactIri(activeCtx, "@type", null, relativeToVocab0 = true, reverse = false)
            val compactedValues = Json.arr()
            arrayify(expandedValue).foreach {
              case s: String =>
                compactedValues += compactIri(inputCtx, s, null, relativeToVocab0 = true, reverse = false)
              case m: JObj @unchecked if m.contains("@preserve") =>
                // framing @type defaults ride in @preserve wrappers; the
                // preserved IRIs still compact as types
                val inner = Json.arr()
                arrayify(m("@preserve")).foreach {
                  case s: String =>
                    inner += compactIri(inputCtx, s, null, relativeToVocab0 = true, reverse = false)
                  case v => inner += v
                }
                val pm = Json.obj()
                pm("@preserve") = (if (inner.size == 1) inner.head else inner)
                compactedValues += pm
              case other => compactedValues += other
            }
            val container = activeCtx.getContainer(alias)
            val isTypeContainer = container.headOption.contains("@set")
            val compactedValue: Any =
              if (compactedValues.size == 1 && (!activeCtx.isMode11 || !isTypeContainer))
                compactedValues.head
              else compactedValues
            val isArr = compactedValue.isInstanceOf[JArr]
            val asArray = isArr &&
              (compactedValue.asInstanceOf[JArr].isEmpty || isTypeContainer)
            addValue(result, alias, compactedValue, asArray, allowDuplicate = true)
            continueLoop = true
          } else if (expandedProperty == "@reverse") {
            val compactedObject = compact(activeCtx, "@reverse", expandedValue, compactArrays)
            val compactedValue = compactedObject.asInstanceOf[JObj]
            compactedValue.keys.toSeq.foreach { property =>
              if (activeCtx.isReverseProperty(property)) {
                val v = compactedValue(property)
                val useArray = activeCtx.hasContainerMapping(property, "@set") || !compactArrays
                addValue(result, property, v, useArray, allowDuplicate = true)
                compactedValue.remove(property)
              }
            }
            if (compactedValue.nonEmpty) {
              val alias = compactIri(activeCtx, "@reverse", null, relativeToVocab0 = false, reverse = false)
              addValue(result, alias, compactedValue, asArray = false, allowDuplicate = true)
            }
            continueLoop = true
          } else if (expandedProperty == "@preserve") {
            val compactedValue = compact(activeCtx, activeProperty, expandedValue, compactArrays)
            compactedValue match {
              case a: JArr @unchecked if a.isEmpty =>
              case cv => addValue(result, "@preserve", cv, asArray = false, allowDuplicate = true)
            }
            continueLoop = true
          } else if (expandedProperty == "@index" &&
                     activeCtx.hasContainerMapping(activeProperty, "@index")) {
            continueLoop = true
          } else if (expandedProperty == "@index" || expandedProperty == "@value" ||
                     expandedProperty == "@language" || expandedProperty == "@direction") {
            val alias = compactIri(activeCtx, expandedProperty, null, relativeToVocab0 = false, reverse = false)
            addValue(result, alias, expandedValue, asArray = false, allowDuplicate = true)
            continueLoop = true
          } else if (expandedProperty != "@graph" && expandedProperty != "@list" &&
                     expandedProperty != "@included" && isKeyword(expandedProperty)) {
            val alias = compactIri(activeCtx, expandedProperty, null, relativeToVocab0 = false, reverse = false)
            addValue(result, alias, expandedValue, asArray = false, allowDuplicate = true)
            continueLoop = true
          }

          if (!continueLoop) {
            val expandedValueList = expandedValue match {
              case a: JArr @unchecked => a
              case other => Json.arr(other)
            }

            if (expandedValueList.isEmpty) {
              val itemActiveProperty =
                compactIri(activeCtx, expandedProperty, expandedValue, relativeToVocab0 = true, insideReverse)
              var nestResult = result
              val tdI = activeCtx.getTermDefinition(itemActiveProperty)
              if (tdI != null && tdI.nest != "") {
                checkNestProperty(activeCtx, tdI.nest)
                if (!result.getOrElse(tdI.nest, null).isInstanceOf[JObj])
                  result(tdI.nest) = Json.obj()
                nestResult = result(tdI.nest).asInstanceOf[JObj]
              }
              addValue(nestResult, itemActiveProperty, Json.arr(), asArray = true, allowDuplicate = true)
            }

            expandedValueList.foreach { expandedItem =>
              val itemActiveProperty =
                compactIri(activeCtx, expandedProperty, expandedItem, relativeToVocab0 = true, insideReverse)
              val isListContainer = activeCtx.hasContainerMapping(itemActiveProperty, "@list")
              val isGraphContainer = activeCtx.hasContainerMapping(itemActiveProperty, "@graph")
              val isSetContainer = activeCtx.hasContainerMapping(itemActiveProperty, "@set")
              val isLanguageContainer = activeCtx.hasContainerMapping(itemActiveProperty, "@language")
              val isIndexContainer = activeCtx.hasContainerMapping(itemActiveProperty, "@index")
              val isIdContainer = activeCtx.hasContainerMapping(itemActiveProperty, "@id")
              val isTypeContainer = activeCtx.hasContainerMapping(itemActiveProperty, "@type")

              var nestResult = result
              val tdI = activeCtx.getTermDefinition(itemActiveProperty)
              if (tdI != null && tdI.nest != "") {
                checkNestProperty(activeCtx, tdI.nest)
                if (!result.getOrElse(tdI.nest, null).isInstanceOf[JObj])
                  result(tdI.nest) = Json.obj()
                nestResult = result(tdI.nest).asInstanceOf[JObj]
              }

              val expandedItemMap = expandedItem match {
                case m: JObj @unchecked => m
                case _ => null
              }
              val isGraph = expandedItemMap != null && isGraphObject(expandedItemMap)
              val isList = expandedItemMap != null && expandedItemMap.contains("@list")
              val inner: Any =
                if (isList) expandedItemMap("@list")
                else if (isGraph) expandedItemMap("@graph")
                else null

              val elementToCompact = if (isList || isGraph) inner else expandedItem
              var compactedItem = compact(activeCtx, itemActiveProperty, elementToCompact, compactArrays)
              var skipItem = false

              if (isList) {
                compactedItem = compactedItem match {
                  case a: JArr @unchecked => a
                  case other => Json.arr(other)
                }
                if (!isListContainer) {
                  val listAlias = compactIri(activeCtx, "@list", null, relativeToVocab0 = false, reverse = false)
                  val wrapper = Json.obj()
                  wrapper(listAlias) = compactedItem
                  compactedItem = wrapper
                  if (expandedItemMap.contains("@index")) {
                    val indexAlias = compactIri(activeCtx, "@index", null, relativeToVocab0 = false, reverse = false)
                    wrapper(indexAlias) = expandedItemMap("@index")
                  }
                } else {
                  // AddValue with valueAsArray=true: direct assignment
                  nestResult(itemActiveProperty) = compactedItem
                  skipItem = true
                }
              }

              if (!skipItem) {
                if (isGraph) {
                  val asArray = !compactArrays || isSetContainer
                  val isSimpleGraph = isSimpleGraphObject(expandedItemMap)
                  if (isGraphContainer && (isIdContainer || (isIndexContainer && isSimpleGraph))) {
                    val mapObject = nestResult.getOrElse(itemActiveProperty, null) match {
                      case m: JObj @unchecked => m
                      case _ => val m = Json.obj(); nestResult(itemActiveProperty) = m; m
                    }
                    val k = if (isIdContainer) "@id" else "@index"
                    val mapKey = expandedItemMap.getOrElse(k, null) match {
                      case s: String => s
                      case _ => compactIri(activeCtx, "@none", null, relativeToVocab0 = false, reverse = false)
                    }
                    addValue(mapObject, mapKey, compactedItem, asArray, allowDuplicate = true)
                  } else if (isGraphContainer && isSimpleGraph) {
                    compactedItem match {
                      case a: JArr @unchecked if a.size > 1 =>
                        val includedKey = compactIri(activeCtx, "@included", null, relativeToVocab0 = true, reverse = false)
                        val m = Json.obj(); m(includedKey) = a
                        compactedItem = m
                      case _ =>
                    }
                    addValue(nestResult, itemActiveProperty, compactedItem, asArray, allowDuplicate = true)
                  } else {
                    compactedItem match {
                      case a: JArr @unchecked if a.size == 1 && compactArrays =>
                        compactedItem = a.head
                      case _ =>
                    }
                    val graphAlias = compactIri(activeCtx, "@graph", null, relativeToVocab0 = false, reverse = false)
                    val m = Json.obj(); m(graphAlias) = compactedItem
                    if (expandedItemMap.contains("@id")) {
                      val idAlias = compactIri(activeCtx, "@id", null, relativeToVocab0 = false, reverse = false)
                      m(idAlias) = expandedItemMap("@id")
                    }
                    if (expandedItemMap.contains("@index")) {
                      val indexAlias = compactIri(activeCtx, "@index", null, relativeToVocab0 = false, reverse = false)
                      m(indexAlias) = expandedItemMap("@index")
                    }
                    addValue(nestResult, itemActiveProperty, m, asArray, allowDuplicate = true)
                  }
                } else if (isLanguageContainer || isIndexContainer || isIdContainer || isTypeContainer) {
                  val mapObject = nestResult.getOrElse(itemActiveProperty, null) match {
                    case m: JObj @unchecked => m
                    case _ => val m = Json.obj(); nestResult(itemActiveProperty) = m; m
                  }
                  var mapKey = ""

                  if (isLanguageContainer) {
                    compactedItem match {
                      case m: JObj @unchecked if m.contains("@value") =>
                        compactedItem = m("@value")
                      case _ =>
                    }
                    expandedItemMap.get("@language").foreach(v => mapKey = v.asInstanceOf[String])
                  } else if (isIndexContainer) {
                    val tdIdx = activeCtx.getTermDefinition(itemActiveProperty)
                    val indexKey = if (tdIdx != null && tdIdx.index != "") tdIdx.index else "@index"
                    val containerKey = compactIri(activeCtx, indexKey, null, relativeToVocab0 = true, reverse = false)
                    if (indexKey == "@index") {
                      mapKey = expandedItemMap.getOrElse("@index", null) match {
                        case s: String => s
                        case _ => ""
                      }
                      compactedItem match {
                        case m: JObj @unchecked => m.remove(containerKey)
                        case _ =>
                      }
                    } else {
                      val compactedItemMap = compactedItem match {
                        case m: JObj @unchecked => m
                        case _ => null
                      }
                      val propsArray: JArr =
                        if (compactedItemMap != null && compactedItemMap.contains(indexKey))
                          arrayify(compactedItemMap(indexKey))
                        else Json.arr()
                      val mapKeyVal = propsArray.headOption.orNull
                      val others = if (propsArray.nonEmpty) propsArray.tail else Seq.empty
                      mapKeyVal match {
                        case s: String =>
                          mapKey = s
                          others.size match {
                            case 0 => compactedItemMap.remove(indexKey)
                            case 1 => compactedItemMap(indexKey) = others.head
                            case _ =>
                              val oa = Json.arr(); oa ++= others
                              compactedItemMap(indexKey) = oa
                          }
                        case _ => mapKey = ""
                      }
                    }
                  } else if (isIdContainer) {
                    val idKey = compactIri(activeCtx, "@id", null, relativeToVocab0 = false, reverse = false)
                    val compactedItemMap = compactedItem.asInstanceOf[JObj]
                    if (compactedItemMap.contains(idKey)) {
                      mapKey = compactedItemMap(idKey).asInstanceOf[String]
                      compactedItemMap.remove(idKey)
                    } else mapKey = ""
                  } else if (isTypeContainer) {
                    val typeKey = compactIri(activeCtx, "@type", null, relativeToVocab0 = false, reverse = false)
                    val compactedItemMap = compactedItem.asInstanceOf[JObj]
                    var types: JArr = Json.arr()
                    if (compactedItemMap.contains(typeKey)) {
                      types = arrayify(compactedItemMap(typeKey))
                      compactedItemMap.remove(typeKey)
                      if (types.nonEmpty) {
                        mapKey = types.head.asInstanceOf[String]
                        types = { val t = Json.arr(); t ++= types.tail; t }
                      }
                    }
                    if (compactedItemMap.size == 1 && expandedItemMap.contains("@id")) {
                      val idOnly = Json.obj()
                      idOnly("@id") = expandedItemMap("@id")
                      compactedItem = compact(activeCtx, itemActiveProperty, idOnly, compactArrays)
                    }
                    if (types.nonEmpty)
                      addValue(compactedItemMap, typeKey, types, asArray = false, allowDuplicate = false)
                  }

                  if (mapKey == "")
                    mapKey = compactIri(activeCtx, "@none", null, relativeToVocab0 = true, reverse = false)
                  addValue(mapObject, mapKey, compactedItem, isSetContainer, allowDuplicate = true)
                } else {
                  val isArr = compactedItem.isInstanceOf[JArr]
                  val asArray = !compactArrays || isSetContainer || isListContainer ||
                    (isArr && compactedItem.asInstanceOf[JArr].isEmpty) ||
                    expandedProperty == "@list" || expandedProperty == "@graph"
                  addValue(nestResult, itemActiveProperty, compactedItem, asArray, allowDuplicate = true)
                }
              }
            }
          }
        }
        result

      case other => other
    }
  }

  private def checkNestProperty(activeCtx: Context, nestProperty: String): Unit = {
    if (activeCtx.expandIri(nestProperty, relative = false, vocabFlag = true, null, null) != "@nest")
      throw JsonLdError(JsonLdError.InvalidNestValue, "nested property must resolve to @nest")
  }

  // ----------------------------------------------------------- serialize

  /** Active context → `@context` JSON (used by Flatten/Frame output). */
  def serialize(ctx: Context): JObj = {
    val out = Json.obj()
    if (ctx.base != "" && (ctx.options == null || ctx.base != ctx.options.base))
      out("@base") = ctx.base
    if (ctx.version != null) out("@version") = ctx.version
    if (ctx.hasLanguage) out("@language") = ctx.language
    if (ctx.direction != "") out("@direction") = ctx.direction
    if (ctx.vocab != null) out("@vocab") = ctx.vocab

    ctx.terms.keys.toSeq.sorted(Json.utf8Ordering).foreach { term =>
      val definition = ctx.terms(term)
      if (definition != null) {
        if (!definition.hasLanguage && definition.container.isEmpty &&
            definition.typeMapping == "" && !definition.reverse) {
          val id = definition.id
          if (id == "") out(term) = null
          else if (isKeyword(id)) out(term) = id
          else out(term) = compactIri(ctx, id, null, relativeToVocab0 = false, reverse = false)
        } else {
          val defn = Json.obj()
          val cid = compactIri(ctx, definition.id, null, relativeToVocab0 = false, reverse = false)
          if (!(term == cid && !definition.reverse)) {
            if (definition.reverse) defn("@reverse") = cid else defn("@id") = cid
          }
          if (definition.typeMapping != "") {
            defn("@type") =
              if (isKeyword(definition.typeMapping)) definition.typeMapping
              else compactIri(ctx, definition.typeMapping, null, relativeToVocab0 = true, reverse = false)
          }
          if (definition.container.nonEmpty) {
            defn("@container") =
              if (definition.container.size == 1) definition.container.head
              else { val a = Json.arr(); a ++= definition.container; a }
          }
          if (definition.hasLanguage)
            defn("@language") = definition.language
          out(term) = defn
        }
      }
    }

    val rval = Json.obj()
    if (out.nonEmpty) rval("@context") = out
    rval
  }
}
