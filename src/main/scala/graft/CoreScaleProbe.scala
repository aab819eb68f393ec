package graft
import jsonld.core._
import jsonld.spark._
import java.util.concurrent.atomic.AtomicInteger

/** Pure-JVM thread-scaling probe of the per-document core (no Spark in the
  * measured region): isolates allocator/GC scaling from Spark machinery.
  */
object CoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.newSession("4")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val contents = Corpus.corpusHeavy(spark, "/root/testdata/sf0.1").collect().map(_.content)
    spark.stop()
    println(s"docs=${contents.length}")

    def work(doc: String): Int = {
      val opts = JsonLdOptions()
      val expanded = Processor.expand(Json.parse(doc), opts)
      val dataset = ToRdf.toRdf(expanded, opts)
      new Canonicalizer("URDNA2015", 100000L).canonicalQuads(dataset).size
    }
    def run(threads: Int, perThread: Int): Double = {
      val t0 = System.nanoTime()
      val total = new AtomicInteger(0)
      val ts = (0 until threads).map { t => new Thread(() => {
        var i = 0; var acc = 0
        while (i < perThread) { acc += work(contents((t * 7919 + i) % contents.length)); i += 1 }
        total.addAndGet(acc); ()
      })}
      ts.foreach(_.start()); ts.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      threads * perThread / secs
    }
    run(4, 500) // JIT warmup
    run(32, 500)
    // thread counts overridable from args, so a scaling session can probe
    // the SAME N/4N window it measured (e.g. "2 8" alongside a 2→8 run)
    val counts = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 8, 32)
    counts.foreach { t =>
      val best = (1 to 3).map(_ => run(t, 2000)).max
      println(f"[core] threads=$t docs/s=$best%.0f")
    }
  }
}
