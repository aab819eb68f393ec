package jsonld

import org.scalatest.funsuite.AnyFunSuite
import jsonld.core._
import jsonld.core.Json._

/** The reference's non-spec option extras (options.go:63-68): safeMode,
  * inputFormat, outputForm, useNamespaces.
  */
class OptionsExtrasSpec extends AnyFunSuite {

  private val docWithJunkKey =
    """{"@context": {"name": "http://ex.org/name"},
      | "@id": "http://ex.org/1", "name": "x", "unmapped_key": "dropped"}""".stripMargin

  test("safeMode raises InvalidProperty where default mode silently drops") {
    val parsed = Json.parse(docWithJunkKey)
    val lax = Processor.expand(parsed, JsonLdOptions())
    assert(Json.serialize(lax).contains("http://ex.org/name"))
    assert(!Json.serialize(lax).contains("dropped"))
    val e = intercept[JsonLdError] {
      Processor.expand(Json.parse(docWithJunkKey), JsonLdOptions(safeMode = true))
    }
    assert(e.code == JsonLdError.InvalidProperty)
    assert(e.details.contains("unmapped_key"))
  }

  test("inputFormat application/n-quads feeds normalize from serialized RDF") {
    val nq = "_:a <http://ex.org/p> \"v\" .\n"
    val out = Processor.normalize(nq,
      JsonLdOptions(inputFormat = "application/n-quads")).asInstanceOf[String]
    assert(out == "_:c14n0 <http://ex.org/p> \"v\" .\n")
  }

  test("outputForm compacted/flattened/expanded post-process fromRdf; unknown raises") {
    val nq = "<http://ex.org/1> <http://ex.org/p> \"v\" .\n"
    val expanded = Processor.fromRdfWithOutputForm(nq, JsonLdOptions())
    assert(expanded.isInstanceOf[JArr])
    val compacted = Processor.fromRdfWithOutputForm(nq, JsonLdOptions(outputForm = "compacted"))
    assert(compacted.isInstanceOf[JObj]) // single node compacts to an object
    val flattened = Processor.fromRdfWithOutputForm(nq, JsonLdOptions(outputForm = "flattened"))
    assert(Json.serialize(flattened).contains("http://ex.org/p"))
    val e = intercept[JsonLdError] {
      Processor.fromRdfWithOutputForm(nq, JsonLdOptions(outputForm = "turtleish"))
    }
    assert(e.getMessage.contains("turtleish"))
  }

  test("useNamespaces collects prefix-shaped @context terms into dataset.namespaces") {
    val doc = Json.parse(
      """{"@context": {"ex": "http://ex.org/ns#", "name": "http://ex.org/name", "xsd": "http://www.w3.org/2001/XMLSchema/"},
        | "@id": "http://ex.org/1", "name": "x"}""".stripMargin)
    val ds = Processor.toRdf(doc, JsonLdOptions(useNamespaces = true))
    assert(ds.namespaces.toMap == Map(
      "ex" -> "http://ex.org/ns#", "xsd" -> "http://www.w3.org/2001/XMLSchema/"))
    val off = Processor.toRdf(doc, JsonLdOptions())
    assert(off.namespaces.isEmpty)
  }
}
