package graft

import jsonld.core._

/** Single-threaded micro-benchmark of the per-document core. */
object DebugCore {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val doc = """{"@context":{"@vocab":"http://graft.example/vocab#"},"@id":"http://graft.example/doc/123","@type":"Document","text":"the quick brown fox jumps over the lazy dog and some more words to make it longer like a real document body with enough content","lang":"en","source":"src1","chars":297}"""
    val docAuthor = """{"@context":{"@vocab":"http://graft.example/vocab#"},"@id":"http://graft.example/doc/123","author":{"name":"Author 3"}}"""
    val loader = new MapDocumentLoader(Map.empty)

    def run(name: String, body: String): Unit = {
      // warmup
      (0 until 2000).foreach { _ =>
        val opts = JsonLdOptions(base = "graft://x", documentLoader = loader)
        val parsed = Json.parse(body)
        val expanded = Processor.expand(parsed, opts)
        val ds = ToRdf.toRdf(expanded, opts)
        new Canonicalizer("URDNA2015", 100000).canonicalQuads(ds)
      }
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        val opts = JsonLdOptions(base = "graft://x", documentLoader = loader)
        val parsed = Json.parse(body)
        val expanded = Processor.expand(parsed, opts)
        val ds = ToRdf.toRdf(expanded, opts)
        new Canonicalizer("URDNA2015", 100000).canonicalQuads(ds)
        i += 1
      }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$name: $n docs in $secs%.2f s = ${n / secs}%.0f docs/s (${secs / n * 1e6}%.1f us/doc)")

      // stage breakdown
      def stage(nm: String)(f: => Unit): Unit = {
        val t = System.nanoTime(); var j = 0
        while (j < n) { f; j += 1 }
        println(f"  $nm: ${(System.nanoTime() - t) / 1e9 / n * 1e6}%.1f us/doc")
      }
      val opts = JsonLdOptions(base = "graft://x", documentLoader = loader)
      stage("parse")(Json.parse(body))
      val parsed = Json.parse(body)
      parsed match { // how much of expand is the inline-@context parse?
        case m: Json.JObj @unchecked if m.contains("@context") =>
          val ctxJson = m("@context")
          stage("ctxparse")(new Context(opts).parse(ctxJson))
        case _ =>
      }
      stage("expand")(Processor.expand(Json.deepClone(parsed), opts))
      val expanded = Processor.expand(Json.parse(body), opts)
      stage("toRdf")(ToRdf.toRdf(expanded, opts))
      val ds = ToRdf.toRdf(expanded, opts)
      stage("c14n")(new Canonicalizer("URDNA2015", 100000).canonicalQuads(ds))
    }
    run("flat", doc)
    run("author", docAuthor)
  }
}
