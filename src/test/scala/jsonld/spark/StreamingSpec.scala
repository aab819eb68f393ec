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

  test("streamingDedupQuads suppresses repeats across micro-batches (TTL'd state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sp = spark; import sp.implicits._

    val input = MemoryStream[QuadRow]
    val deduped = Streaming.streamingDedupQuads(input.toDS(), ttl = "10 minutes")
    val query = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode(OutputMode.Append).start()
    // NB: with ProcessingTimeTimeout registered, the micro-batch engine
    // keeps scheduling timer-check batches, so processAllAvailable() never
    // returns — poll the sink with a deadline instead.
    def awaitCount(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (spark.table("dedup_out").count() < n && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(spark.table("dedup_out").count() == n,
        s"expected $n rows, got ${spark.table("dedup_out").count()}")
    }
    try {
      def quad(i: Int) = QuadRow(s"d$i", s"s$i", "p", s"o$i", 0.toByte, "", "", "")
      // batch 1: three distinct quads, one duplicated in-batch
      input.addData(quad(1), quad(2), quad(3), quad(1).copy(docId = "other"))
      awaitCount(3)
      // batch 2: all repeats + one new → exactly one more row, repeats suppressed
      input.addData(quad(2), quad(3), quad(4))
      awaitCount(4)
      Thread.sleep(1000) // grace: suppressed repeats must not trickle in late
      val rows = spark.table("dedup_out").collect()
      assert(rows.length == 4, s"expected 4 total, got ${rows.length}")
      assert(rows.map(_.getAs[String]("subj")).toSet == Set("s1", "s2", "s3", "s4"))
    } finally query.stop()
  }
}
