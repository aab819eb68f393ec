package graft
import jsonld.spark._
object TransformProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val spark = Bench.newSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val outDir = Bench.newWorkDir(s"tp$cpus")
    Bench.materializeCorpus(spark, "/root/testdata/sf0.1", 100, s"$outDir/corpus")
    val corpus = spark.read.parquet(s"$outDir/corpus").as[RepoFile]
    val counters = Pipeline.newCounters(spark)
    val ctx = spark.sparkContext.broadcast(Map.empty[String, String])
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime()-t0)/1e9
    }
    def best(name: String)(f: => Any): Unit = {
      val times = (1 to 3).map(_ => t(f))
      println(f"[tp$cpus] $name: ${times.map(x => f"$x%.1f").mkString(", ")} best=${times.min}%.2f")
    }
    best("scan-only")(corpus.count())
    best("scan+detect")(Pipeline.detectStage(corpus, counters).count())
    best("scan+detect+transform")(Pipeline.quads(Pipeline.transformStage(Pipeline.detectStage(corpus, counters), ctx, counters)).count())
    spark.stop()
  }
}
