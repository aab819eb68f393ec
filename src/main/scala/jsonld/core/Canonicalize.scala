package jsonld.core

import Rdf._
import scala.collection.mutable
import java.security.MessageDigest

/** RDF dataset canonicalization: URDNA2015 (SHA-256) and URGNA2012 (SHA-1).
  *
  * Deliberately sequential per document — blank node scopes never cross
  * documents, so corpus-level parallelism comes from running one instance
  * per document inside `mapPartitions` (see graft.pipeline).
  *
  * `maxPermutations` bounds the factorial hash-N-degree worst case (the
  * reference's own suite skips its pathological test060); exceeding it
  * raises a JsonLdError the pipeline routes to the quarantine channel.
  */
final class Canonicalizer(algorithm: String = "URDNA2015",
                          maxPermutations: Long = 2000000L) {
  private val urdna = algorithm == "URDNA2015"
  private val blankQuads = mutable.HashMap.empty[String, mutable.ArrayBuffer[Quad]]
  private val firstDegreeHashes = mutable.HashMap.empty[String, String]
  private val canonicalIssuer = new IdentifierIssuer("_:c14n")
  private var permutationBudget: Long = maxPermutations

  /** Fresh digest via clone of a thread-local prototype.
    * `MessageDigest.getInstance` walks the JCA provider tables behind a
    * lock — at 15M+ digests across 32 executor threads that lookup
    * serializes the whole transform stage. Cloning is lock-free, and each
    * clone is independent (hashNDegreeQuads keeps a digest live across
    * recursive calls, so plain instance reuse would corrupt state).
    */
  private def newDigest(): MessageDigest =
    (if (urdna) Canonicalizer.sha256Proto else Canonicalizer.sha1Proto)
      .get().clone().asInstanceOf[MessageDigest]

  private def hex(bytes: Array[Byte]): String = {
    // manual nibble loop: a per-byte format string allocates a
    // java.util.Formatter per byte — measured hot in URDNA2015
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = Canonicalizer.HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = Canonicalizer.HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Returns canonical, sorted N-Quads lines (each with trailing ".\n"). */
  def canonicalLines(dataset: RdfDataset): Seq[String] = process(dataset)._1

  /** Returns relabeled quads as (graphName, quad), ordered by canonical
    * N-Quads line — avoids a serialize+reparse round trip in the pipeline
    * hot path. graphName "" = default graph.
    */
  def canonicalQuads(dataset: RdfDataset): Seq[(String, Quad)] = process(dataset)._2

  private def process(dataset: RdfDataset): (Seq[String], Seq[(String, Quad)]) = {
    val quads = mutable.ArrayBuffer.empty[Quad]
    dataset.graphs.foreach { case (graphName0, triples) =>
      val graphName = if (graphName0 == "@default") "" else graphName0
      triples.foreach { q0 =>
        val q =
          if (graphName.isEmpty) q0.copy(graph = null)
          else if (graphName.startsWith("_:")) q0.copy(graph = RBlank(graphName))
          else q0.copy(graph = RIri(graphName))
        quads += q
        // explicit per-position matches: a Seq(...) wrapper here allocates
        // on every quad of every document (hot path)
        def note(n: RdfNode): Unit = n match {
          case RBlank(id) => blankQuads.getOrElseUpdate(id, mutable.ArrayBuffer.empty) += q
          case _ =>
        }
        note(q.subject); note(q.obj); note(q.graph)
      }
    }

    val nonNormalized = mutable.HashSet.empty[String]
    nonNormalized ++= blankQuads.keys

    var simple = true
    var hashToBlankNodes = mutable.HashMap.empty[String, mutable.ArrayBuffer[String]]
    while (simple) {
      simple = false
      hashToBlankNodes = mutable.HashMap.empty
      nonNormalized.foreach { id =>
        val h = hashFirstDegreeQuads(id)
        hashToBlankNodes.getOrElseUpdate(h, mutable.ArrayBuffer.empty) += id
      }
      hashToBlankNodes.keys.toSeq.sorted.foreach { hash =>
        val idList = hashToBlankNodes(hash)
        if (idList.size == 1) {
          val id = idList.head
          canonicalIssuer.getId(id)
          nonNormalized -= id
          hashToBlankNodes -= hash
          simple = true
        }
      }
    }

    hashToBlankNodes.keys.toSeq.sorted.foreach { hash =>
      val idList = hashToBlankNodes(hash)
      val hashPaths = mutable.HashMap.empty[String, mutable.ArrayBuffer[IdentifierIssuer]]
      idList.foreach { id =>
        if (!canonicalIssuer.hasId(id)) {
          val issuer = new IdentifierIssuer("_:b")
          issuer.getId(id)
          val (h, newIssuer) = hashNDegreeQuads(id, issuer)
          hashPaths.getOrElseUpdate(h, mutable.ArrayBuffer.empty) += newIssuer
        }
      }
      hashPaths.keys.toSeq.sorted.foreach { h =>
        hashPaths(h).foreach { resultIssuer =>
          resultIssuer.existingOrder.foreach(existing => canonicalIssuer.getId(existing))
        }
      }
    }

    def relabel(n: RdfNode): RdfNode = n match {
      case RBlank(id) if !id.startsWith("_:c14n") => RBlank(canonicalIssuer.getId(id))
      case other => other
    }

    val tagged = quads.map { q =>
      val qq = Quad(relabel(q.subject), q.predicate, relabel(q.obj), relabel(q.graph))
      val name = if (qq.graph == null) "" else qq.graph.value
      (toNQuad(qq, name), (name, qq))
    }.sortBy(_._1)
    (tagged.map(_._1).toSeq, tagged.map(_._2).toSeq)
  }

  def canonicalize(dataset: RdfDataset): String = canonicalLines(dataset).mkString

  // --------------------------------------------------- hash first degree

  private def modifyFirstDegree(id: String, component: RdfNode, isGraph: Boolean): RdfNode =
    component match {
      case RBlank(v) =>
        if (urdna) RBlank(if (v == id) "_:a" else "_:z")
        else if (isGraph) RBlank("_:g")
        else RBlank(if (v == id) "_:a" else "_:z")
      case other => other
    }

  private def hashFirstDegreeQuads(id: String): String = {
    firstDegreeHashes.get(id) match {
      case Some(h) => return h
      case None =>
    }
    val nquads = blankQuads(id).map { q =>
      val graphCopy = modifyFirstDegree(id, q.graph, isGraph = true)
      val name = if (graphCopy == null) "" else graphCopy.value
      toNQuad(Quad(
        modifyFirstDegree(id, q.subject, isGraph = false),
        q.predicate,
        modifyFirstDegree(id, q.obj, isGraph = false),
        graphCopy), name)
    }.sorted
    val md = newDigest()
    nquads.foreach(n => md.update(n.getBytes("UTF-8")))
    val h = hex(md.digest())
    firstDegreeHashes(id) = h
    h
  }

  // --------------------------------------------------- hash related/N-degree

  private def hashRelatedBlankNode(related: String, quad: Quad,
                                   issuer: IdentifierIssuer, position: String): String = {
    val id =
      if (canonicalIssuer.hasId(related)) canonicalIssuer.getId(related)
      else if (issuer.hasId(related)) issuer.getId(related)
      else hashFirstDegreeQuads(related)
    val md = newDigest()
    md.update(position.getBytes("UTF-8"))
    if (position != "g") {
      val predStr = if (urdna) "<" + quad.predicate.value + ">" else quad.predicate.value
      md.update(predStr.getBytes("UTF-8"))
    }
    md.update(id.getBytes("UTF-8"))
    hex(md.digest())
  }

  private def createHashToRelated(id: String, issuer: IdentifierIssuer)
      : mutable.HashMap[String, mutable.ArrayBuffer[String]] = {
    val hashToRelated = mutable.HashMap.empty[String, mutable.ArrayBuffer[String]]
    val quads = blankQuads(id)
    if (urdna) {
      val positions = Array("s", "o", "g")
      quads.foreach { quad =>
        val comps = Array(quad.subject, quad.obj, quad.graph)
        var i = 0
        while (i < 3) {
          comps(i) match {
            case RBlank(v) if v != id =>
              val h = hashRelatedBlankNode(v, quad, issuer, positions(i))
              hashToRelated.getOrElseUpdate(h, mutable.ArrayBuffer.empty) += v
            case _ =>
          }
          i += 1
        }
      }
    } else {
      quads.foreach { quad =>
        val relPos: Option[(String, String)] = quad.subject match {
          case RBlank(v) if v != id => Some((v, "p"))
          case _ => quad.obj match {
            case RBlank(v) if v != id => Some((v, "r"))
            case _ => None
          }
        }
        relPos.foreach { case (related, position) =>
          val h = hashRelatedBlankNode(related, quad, issuer, position)
          hashToRelated.getOrElseUpdate(h, mutable.ArrayBuffer.empty) += related
        }
      }
    }
    hashToRelated
  }

  private def hashNDegreeQuads(id: String, issuer0: IdentifierIssuer): (String, IdentifierIssuer) = {
    var issuer = issuer0
    val hashToRelated = createHashToRelated(id, issuer)
    val md = newDigest()

    hashToRelated.keys.toSeq.sorted.foreach { hash =>
      val blankNodes = hashToRelated(hash)
      md.update(hash.getBytes("UTF-8"))
      var chosenPath = ""
      var chosenIssuer: IdentifierIssuer = null

      val perm = new Permutator(blankNodes.toArray)
      while (perm.hasNext) {
        permutationBudget -= 1
        if (permutationBudget < 0)
          throw JsonLdError(JsonLdError.CanonicalizationBudgetExceeded,
            s"canonicalization permutation budget exceeded ($maxPermutations)")
        val permutation = perm.next()
        var issuerCopy = issuer.cloneIssuer()
        val path = new StringBuilder
        val recursionList = mutable.ArrayBuffer.empty[String]
        var skip = false

        var i = 0
        while (i < permutation.length && !skip) {
          val related = permutation(i)
          if (canonicalIssuer.hasId(related)) {
            path.append(canonicalIssuer.getId(related))
          } else {
            if (!issuerCopy.hasId(related)) recursionList += related
            path.append(issuerCopy.getId(related))
          }
          if (chosenPath.nonEmpty && path.length >= chosenPath.length &&
              path.toString > chosenPath) skip = true
          i += 1
        }

        if (!skip) {
          var j = 0
          while (j < recursionList.length && !skip) {
            val related = recursionList(j)
            val (resultHash, resultIssuer) = hashNDegreeQuads(related, issuerCopy)
            path.append(issuerCopy.getId(related))
            path.append('<').append(resultHash).append('>')
            issuerCopy = resultIssuer
            if (chosenPath.nonEmpty && path.length >= chosenPath.length &&
                path.toString > chosenPath) skip = true
            j += 1
          }
        }

        if (!skip && (chosenPath.isEmpty || path.toString < chosenPath)) {
          chosenPath = path.toString
          chosenIssuer = issuerCopy
        }
      }

      md.update(chosenPath.getBytes("UTF-8"))
      issuer = chosenIssuer
    }
    (hex(md.digest()), issuer)
  }
}

object Canonicalizer {
  private[core] val HexChars = "0123456789abcdef".toCharArray
  private[core] val sha256Proto: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))
  private[core] val sha1Proto: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-1"))
}

/** Steinhaus–Johnson–Trotter permutation generator over a sorted list. */
final class Permutator(list0: Array[String]) {
  private val list = list0.sorted
  private var done = false
  private val left = mutable.HashMap.empty[String, Boolean]
  list.foreach(i => left(i) = true)

  def hasNext: Boolean = !done

  def next(): Array[String] = {
    val rval = list.clone()
    var k: String = null
    var pos = 0
    val length = list.length
    var i = 0
    while (i < length) {
      val element = list(i)
      val isLeft = left(element)
      if ((k == null || element > k) &&
          ((isLeft && i > 0 && element > list(i - 1)) ||
           (!isLeft && i < length - 1 && element > list(i + 1)))) {
        k = element
        pos = i
      }
      i += 1
    }
    if (k == null) done = true
    else {
      val swap = if (left(k)) pos - 1 else pos + 1
      list(pos) = list(swap)
      list(swap) = k
      var j = 0
      while (j < length) {
        if (list(j) > k) left(list(j)) = !left(list(j))
        j += 1
      }
    }
    rval
  }
}
