package jsonld

import org.scalatest.funsuite.AnyFunSuite
import jsonld.core._
import jsonld.core.Json._
import java.nio.file.{Files, Paths}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Ad-hoc single-test debug harness (enabled with DEBUG_TEST env var). */
class DebugFrameSpec extends AnyFunSuite {
  private val testDir = Paths.get("src/test/resources/testsuite")
  private def read(p: String) = new String(Files.readAllBytes(testDir.resolve(p)), "UTF-8")

  test("debug single frame test") {
    val whichAll = sys.env.getOrElse("DEBUG_TEST", "")
    whichAll.split(",").filter(_.nonEmpty).foreach { which =>
      val baseIri = "https://w3c.github.io/json-ld-framing/tests/"
      val docs = mutable.HashMap.empty[String, String]
      Files.walk(testDir).iterator().asScala.foreach { p =>
        if (Files.isRegularFile(p))
          docs(baseIri + testDir.relativize(p).toString.replace('\\', '/')) = new String(Files.readAllBytes(p), "UTF-8")
      }
      val loader = new MapDocumentLoader(docs.toMap)
      val opts = JsonLdOptions(documentLoader = loader, omitGraph = false)
      val frame = Json.parse(read(s"frame/$which-frame.jsonld"))
      try {
        val result = Processor.frame(baseIri + s"frame/$which-in.jsonld", frame, opts)
        println(s"=== ACTUAL $which ===")
        println(Json.serialize(result))
      } catch { case e: Exception => println(s"=== ACTUAL $which ERROR: $e") }
      println(s"=== EXPECTED $which ===")
      println(Json.serialize(Json.parse(read(s"frame/$which-out.jsonld"))))
    }
  }
}
