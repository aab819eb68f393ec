package graft

import jsonld.spark._

/** Ad-hoc stage timing to locate serial bottlenecks in the bench pipeline —
  * replicates Bench.pipelineThroughput exactly, but materializes each stage
  * separately so the wall time per stage is visible.
  */
object DebugStages {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val replication = if (args.length > 2) args(2).toInt else 20
    val spark = Bench.newSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val outDir = java.nio.file.Files.createTempDirectory("graft-dbg").toString
    timed("materialize-corpus")(
      Bench.materializeCorpus(spark, sfDir, replication, s"$outDir/corpus"))
    val corpus = spark.read.parquet(s"$outDir/corpus").as[RepoFile]
    timed("corpus-count")(println("rows=" + corpus.count()))

    val counters = Pipeline.newCounters(spark)
    val ctxCache = spark.sparkContext.broadcast(Map.empty[String, String])
    val docs = Pipeline.detectStage(corpus, counters)
    val pipe = Pipeline.transformStage(docs, ctxCache, counters)
    timed("detect+transform-count")(println("quads=" + pipe.filter(_.ok).count()))
    val deduped = Pipeline.dedupQuads(Pipeline.quads(pipe))
    timed("transform+dedup-count")(println("distinct=" + deduped.count()))
    timed("full-with-write")(Pipeline.writePartitioned(deduped, s"$outDir/q", 32))
    timed("written-count")(println("written=" + spark.read.parquet(s"$outDir/q").count()))
    spark.stop()
  }
}
