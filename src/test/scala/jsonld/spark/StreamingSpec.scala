package jsonld.spark

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{SparkSession, Encoders}
import java.nio.file.Files

/** Streaming pipeline: corpus parquet dropped into a watched directory
  * flows through detect→expand→toRDF→c14n continuously.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("streaming-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("file-source streaming pipeline emits quads") {
    val base = Files.createTempDirectory("graft-stream")
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckDir = s"$base/ck"

    // drop a batch of corpus rows as parquet into the watched dir
    val rows = (0 until 20).map { i =>
      RepoFile(s"org$i", s"doc$i.jsonld", "c0", "jsonld",
        s"""{"@id": "http://ex.org/doc/$i", "http://ex.org/p": "v$i"}""")
    }
    spark.createDataset(rows)(Encoders.product[RepoFile])
      .write.parquet(inDir)

    val ctxCache = spark.sparkContext.broadcast(Map.empty[String, String])
    val query = Streaming.fileStreamPipeline(spark, inDir, outDir, ckDir, ctxCache)
    try {
      query.processAllAvailable()
    } finally query.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == 20)
    assert(out.select("pred").distinct().collect().map(_.getString(0)).toSet ==
      Set("http://ex.org/p"))
  }
}
