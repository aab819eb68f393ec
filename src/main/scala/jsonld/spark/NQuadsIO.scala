package jsonld.spark

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import jsonld.core.Rdf
import jsonld.core.Rdf._

/** Distributed N-Quads source/sink bridging the core lexer/serializer
  * (the same code the W3C toRdf/normalization suites gate byte-for-byte
  * — `core/Rdf.scala`; reference: `ld/serialize_nquads.go`) to the
  * engine's relational quad tables:
  *
  *  - [[parseLines]]: a Dataset of N-Quads LINES → (subj, pred, obj,
  *    dt, graph). Line-parallel inside `mapPartitions` — N-Quads is a
  *    line-delimited format, so a 100 TB dump splits on newlines like
  *    any text source and parses with zero shuffle; a malformed line
  *    raises the spec syntax error with its (partition-relative) line
  *    number rather than passing silently.
  *  - [[serialize]]: the inverse — one canonical N-Quads line per quad
  *    row, map-side only. `serialize → parseLines` is an identity on
  *    the quad table (round-trip gated by `kg_nquads_roundtrip`).
  *
  * dt conventions (the engine's storage model throughout): IRIs and
  * blank nodes `""`, plain literals xsd:string, language-tagged
  * literals `"@tag"` (serialized as `"lex"@tag` with rdf:langString
  * identity, per RDF 1.1), other literals their datatype IRI.
  */
object NQuadsIO {

  def parseLines(lines: Dataset[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.mapPartitions { it =>
      it.zipWithIndex.flatMap { case (line, i) =>
        Rdf.parseNQuadLine(line, i + 1).map { case (g, q) =>
          val (obj, dt) = q.obj match {
            case RIri(v) => (v, "")
            case RBlank(v) => (v, "")
            case RLiteral(v, d, l) =>
              if (d == RdfLangString && l.nonEmpty) (v, "@" + l) else (v, d)
          }
          (q.subject.value, q.predicate.value, obj, dt,
            if (g == "@default") "" else g)
        }
      }
    }.toDF("subj", "pred", "obj", "dt", "graph")
  }

  def serialize(quads: DataFrame): Dataset[String] = {
    val spark = quads.sparkSession
    import spark.implicits._
    val base =
      if (quads.columns.contains("graph"))
        quads.select(col("subj"), col("pred"), col("obj"), col("dt"), col("graph"))
      else
        quads.select(col("subj"), col("pred"), col("obj"), col("dt"),
          lit("").as("graph"))
    base.as[(String, String, String, String, String)].map { case (s, p, o, dt, g) =>
      def node(v: String): RdfNode = if (v.startsWith("_:")) RBlank(v) else RIri(v)
      val objNode: RdfNode =
        if (dt.isEmpty) node(o)
        else if (dt.startsWith("@")) RLiteral(o, RdfLangString, dt.drop(1))
        else RLiteral(o, dt, "")
      Rdf.toNQuad(Quad(node(s), node(p), objNode, null), g).stripLineEnd
    }
  }
}
