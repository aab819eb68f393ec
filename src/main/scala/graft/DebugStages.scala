package graft

import org.apache.spark.sql.functions._
import jsonld.spark._

/** Ad-hoc stage timing to locate serial bottlenecks in the bench pipeline. */
object DebugStages {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val replication = if (args.length > 2) args(2).toInt else 40
    val spark = Bench.newSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val flat = Corpus.corpusFlat(spark, sfDir).toDF()
    val authored = Corpus.corpusWithAuthors(spark, sfDir).toDF()
    val corpus = flat.union(authored)
      .crossJoin(spark.range(replication).withColumnRenamed("id", "rep"))
      .withColumn("path", concat(col("path"), lit("#r"), col("rep")))
      .withColumn("repo", concat(col("repo"), lit("-"), col("rep")))
      .drop("rep")
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .as[RepoFile]

    timed("corpus-count")(println("rows=" + corpus.count()))
    val counters = Pipeline.newCounters(spark)
    val ctxCache = spark.sparkContext.broadcast(Map.empty[String, String])
    val docs = Pipeline.detectStage(corpus, counters)
    val pipe = Pipeline.transformStage(docs, ctxCache, counters)
    timed("detect+transform-count")(println("quads=" + pipe.count()))
    val deduped = Pipeline.dedupQuads(Pipeline.quads(pipe))
    timed("dedup-count")(println("distinct=" + deduped.count()))
    val out = java.nio.file.Files.createTempDirectory("dbg").toString
    timed("write")(Pipeline.writePartitioned(deduped, s"$out/q", 32))
    spark.stop()
  }
}
