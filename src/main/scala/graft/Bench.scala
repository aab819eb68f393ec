package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import jsonld.spark._

/** Per-round benchmark: headline metric is end-to-end KG-pipeline
  * throughput (triples/sec for detect→expand→toRDF→URDNA2015→dedup→write)
  * on the synthetic corpus, plus per-query wall times for every
  * SparkEntry query. Prints ONE JSON line.
  */
object Bench {

  def newSession(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    // fixed shuffle fan-out regardless of core count: scaling runs must
    // vary ONLY parallelism (a real cluster keeps shuffle.partitions
    // constant while executors scale), and 8-way shuffles of 35M-row
    // dedups spill where 64-way ones don't
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    // small split target: the synthetic corpus is a few hundred MB; with
    // the default 128 MB the scan would open too few partitions to use
    // all cores (a real 100 TB corpus has no such problem)
    .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Materialize the `replication`-times enlarged corpus to parquet —
    * UNTIMED: the benchmark measures the pipeline from a stored corpus
    * (the real deployment shape), not corpus synthesis.
    */
  def materializeCorpus(spark: SparkSession, sfDir: String, replication: Int,
                        corpusDir: String): Unit = {
    // replicate the DOCUMENTS table with renumbered doc_ids, then
    // synthesize: every replica is a fully distinct document, so corpus
    // quad dedup keeps all quads and the post-write count is the true
    // work done (a real 10^12-file corpus is not N copies of one file)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .crossJoin(spark.range(replication).withColumnRenamed("id", "rep"))
      .withColumn("doc_id", col("doc_id") + col("rep") * 100000000L)
      .drop("rep")
    Corpus.corpusHeavyFrom(spark, docs).toDF()
      .write.mode("overwrite").parquet(corpusDir)
  }

  /** Timed region: parquet scan → detect → expand→toRDF→c14n → dedup →
    * predicate-bucketed write. Returns (seconds, triples emitted).
    */
  def pipelineThroughput(spark: SparkSession, sfDir: String, replication: Int,
                         outDir: String): (Double, Long) = {
    import spark.implicits._
    materializeCorpus(spark, sfDir, replication, s"$outDir/corpus")
    val corpus = spark.read.parquet(s"$outDir/corpus").as[RepoFile]

    val counters = Pipeline.newCounters(spark)
    val ctxCache = spark.sparkContext.broadcast(Map.empty[String, String])
    val t0 = System.nanoTime()
    val docs = Pipeline.detectStage(corpus, counters)
    val pipe = Pipeline.transformStage(docs, ctxCache, counters)
    Pipeline.dedupAndWritePartitioned(Pipeline.quads(pipe), s"$outDir/quads", buckets = 32)
    val secs = (System.nanoTime() - t0) / 1e9
    // numerator from the materialized table, not the accumulator: task
    // retries/speculation over-count accumulators in transformations (the
    // untimed count-back is footer metadata only — cheap)
    val written = spark.read.parquet(s"$outDir/quads").count()
    (secs, written)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val replication = sys.env.getOrElse("SPARK_GRAFT_REPLICATION", "20").toInt
    val spark = newSession(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // headline: pipeline throughput. Two warmup passes: the per-document
    // core is pure Scala and needs C2 compilation to reach steady state —
    // a single short pass under a fresh JVM leaves the timed region 2×
    // slower than steady state (observed round 1).
    val outDir = java.nio.file.Files.createTempDirectory("graft-bench").toString
    pipelineThroughput(spark, sfDir, math.max(2, replication / 4), s"$outDir/warmup1")
    pipelineThroughput(spark, sfDir, math.max(4, replication / 2), s"$outDir/warmup2")
    val (pipeSecs, triples) = pipelineThroughput(spark, sfDir, replication, s"$outDir/quads")
    val throughput = triples / math.max(pipeSecs, 1e-9)

    // per-query wall times; a crashing query must be visibly an error, not
    // a misleadingly small wall time
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
      }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }

    val qs = (results.map { case (k, v, ok) =>
        "\"" + k + "\":" + (if (ok) f"$v%.3f" else "\"error\"")
      } :+ ("\"pipeline_e2e\":" + f"$pipeSecs%.3f")).mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum + pipeSecs
    val json = s"""{"metric":"pipeline_triples_per_sec","value":${f"$throughput%.1f"},"unit":"triples/sec","total_sec":${f"$total%.2f"},"pipeline_triples":$triples,"pipeline_sec":${f"$pipeSecs%.2f"},"failed":$failed,"queries":$qs,"sf":"$sfDir","cpus":"$cpus","replication":$replication}"""
    // stdout (passed through unprefixed via run/outputStrategy) AND a
    // well-known file, so the driver can parse either
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json)
    spark.stop()
  }
}
