package jsonld

import org.scalatest.funsuite.AnyFunSuite
import jsonld.core.LinkHeader

/** RFC 5988/8288 Link header parsing (reference ParseLinkHeader parity). */
class LinkHeaderSpec extends AnyFunSuite {

  test("single link-value with quoted params") {
    val m = LinkHeader.parse(Seq(
      """<context.jsonld>; rel="http://www.w3.org/ns/json-ld#context"; type="application/ld+json""""))
    val v = m("http://www.w3.org/ns/json-ld#context")
    assert(v.map(_.target) == Seq("context.jsonld"))
    assert(v.head.`type` == "application/ld+json")
  }

  test("comma-separated link-values and multiple headers accumulate") {
    val m = LinkHeader.parse(Seq(
      """<a.jsonld>; rel="alternate"; type="application/ld+json", <b.jsonld>; rel="alternate"""",
      """<c.jsonld>; rel="alternate""""))
    assert(m("alternate").map(_.target) == Seq("a.jsonld", "b.jsonld", "c.jsonld"))
  }

  test("unquoted rel, space-separated rel list, case-normalized param names") {
    val m = LinkHeader.parse(Seq("""<x>; REL="next last"; Type=text/html"""))
    assert(m("next").head.target == "x")
    assert(m("last").head.`type` == "text/html")
  }

  test("quoted separators do not split; malformed entries are skipped") {
    val m = LinkHeader.parse(Seq(
      """<u>; rel="alternate"; title="a,b;c", garbage-without-target, <v>; rel=alternate"""))
    assert(m("alternate").map(_.target) == Seq("u", "v"))
    assert(m("alternate").head.params("title") == "a,b;c")
  }

  test("first duplicate parameter wins (RFC 8288 §3)") {
    val m = LinkHeader.parse(Seq("""<u>; rel=first; rel=second"""))
    assert(m.keySet == Set("first"))
  }
}
