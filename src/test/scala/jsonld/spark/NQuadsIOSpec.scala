package jsonld.spark

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

class NQuadsIOSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("nquads-io-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  private val XsdInteger = "http://www.w3.org/2001/XMLSchema#integer"

  test("serialize→parseLines is the identity across node kinds, tags, graphs, and escapes") {
    val sp = spark; import sp.implicits._
    val rows = Seq(
      ("urn:s1", "urn:p", "urn:o", "", ""),                        // IRI triple, default graph
      ("_:b0", "urn:p", "_:b1", "", "urn:g1"),                     // bnode subject+object, named graph
      ("urn:s2", "urn:p", "plain", XsdString, ""),                 // plain literal
      ("urn:s2", "urn:p", "42", XsdInteger, "urn:g1"),             // typed literal
      ("urn:s3", "urn:p", "Europa", "@de", ""),                    // language tag
      ("urn:s3", "urn:p", "line1\nline2\tq\"uote\\slash", XsdString, ""), // every escape
      ("urn:s4", "urn:p", "x", XsdString, "_:bg"))                 // bnode graph label
      .toDF("subj", "pred", "obj", "dt", "graph")
    val back = NQuadsIO.parseLines(NQuadsIO.serialize(rows))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    assert(back == rows.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3), r.getString(4))).toSet)
  }

  test("serialize emits canonical lines; parseLines raises on malformed input") {
    val sp = spark; import sp.implicits._
    val line = NQuadsIO.serialize(
      Seq(("urn:s", "urn:p", "Europa", "@de", "urn:g")).toDF("subj", "pred", "obj", "dt", "graph"))
      .collect().head
    assert(line == "<urn:s> <urn:p> \"Europa\"@de <urn:g> .")
    val err = intercept[org.apache.spark.SparkException] {
      NQuadsIO.parseLines(Seq("this is not a quad").toDS()).collect()
    }
    assert(err.getMessage.contains("invalid quad") ||
      String.valueOf(err.getCause).contains("invalid quad"))
  }
}
