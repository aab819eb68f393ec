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

    val outDir = Bench.newWorkDir("graft-dbg")
    timed("materialize-corpus")(
      Bench.materializeCorpus(spark, sfDir, replication, s"$outDir/corpus"))
    val corpus = spark.read.parquet(s"$outDir/corpus").as[RepoFile]
    timed("corpus-count")(println("rows=" + corpus.count()))

    val counters = Pipeline.newCounters(spark)
    val ctxCache = spark.sparkContext.broadcast(Map.empty[String, String])
    def freshPipe() = Pipeline.transformStage(
      Pipeline.detectStage(corpus, counters), ctxCache, counters)
    // two passes each: first is JIT-cold, second is the honest number
    timed("detect+transform-count (cold)")(println("quads=" + freshPipe().filter(_.ok).count()))
    timed("detect+transform-count (warm)")(println("quads=" + freshPipe().filter(_.ok).count()))
    timed("fused-dedup-write (cold)")(
      Pipeline.dedupAndWritePartitioned(Pipeline.quads(freshPipe()), s"$outDir/q1", 32))
    timed("fused-dedup-write (warm)")(
      Pipeline.dedupAndWritePartitioned(Pipeline.quads(freshPipe()), s"$outDir/q2", 32))
    timed("written-count")(println("written=" + spark.read.parquet(s"$outDir/q2").count()))
    spark.stop()
  }
}
