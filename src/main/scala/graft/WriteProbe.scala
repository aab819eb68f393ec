package graft
import org.apache.spark.sql.functions._
import jsonld.spark._
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val spark = Bench.newSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val outDir = Bench.newWorkDir(s"wp$cpus")
    Bench.materializeCorpus(spark, "/root/testdata/sf0.1", 100, s"$outDir/corpus")
    val corpus = spark.read.parquet(s"$outDir/corpus").as[RepoFile]
    val counters = Pipeline.newCounters(spark)
    val ctx = spark.sparkContext.broadcast(Map.empty[String, String])
    def quads() = Pipeline.quads(Pipeline.transformStage(Pipeline.detectStage(corpus, counters), ctx, counters))
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe$cpus] $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    timed("warm-transform")(quads().count())
    timed("repartition-only")(quads().toDF().drop("docId")
      .withColumn("predBucket", pmod(hash(col("pred")), lit(32)))
      .repartition(col("predBucket"), pmod(hash(col("subj")), lit(16)))
      .count())
    timed("repart+sort+dedupmap")(Pipeline.dedupForWrite(quads(), 32).count())
    timed("plainwrite-nopartitionby")(Pipeline.dedupForWrite(quads(), 32)
      .write.mode("overwrite").parquet(s"$outDir/plain"))
    timed("write-partitionBy")(Pipeline.dedupForWrite(quads(), 32)
      .write.mode("overwrite").partitionBy("predBucket").parquet(s"$outDir/partby"))
    spark.stop()
  }
}
