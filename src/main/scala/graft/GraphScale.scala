package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.GraphOps

/** Scaling-efficiency evidence for the graph-analytics family
  * (pageRank / triangleCount / shortestPaths — the round-5 additions),
  * extending the north-rule measurement beyond the pipeline: the SAME
  * deterministic synthetic graph is processed at two parallelism levels
  * (default local[8] vs local[32]) and the JSON reports per-op wall
  * times at both levels plus scaling efficiency
  * `(t_lo / t_hi) / (hi / lo)`.
  *
  * Same disciplines as graft.Scale: sessions interleave lo/hi per round
  * (slow host drift hits both levels equally), every timed region is
  * health-gated (gate probe before, post probe after, both recorded),
  * per-level best-of-rounds is the headline. The per-op RESULT value
  * (quantized rank mass / triangle total / distance mass) is required
  * identical across levels — determinism across parallelism is part of
  * the evidence, not an assumption.
  *
  * Graph: ring ±1/±2 plus a `7i+3` modular chord on `n` nodes — cyclic,
  * triangle-rich, diameter O(log n) through the multiplicative chord,
  * fully deterministic from `n` alone.
  *
  * Run: sbt "runMain graft.GraphScale [nodes] [lo] [hi] [rounds]"
  * Output: one JSON line + graph_scale.json.
  */
object GraphScale {

  def main(args: Array[String]): Unit = {
    Bench.cleanWorkRoot()
    val nNodes = if (args.length > 0) args(0).toLong else 400000L
    val lo = if (args.length > 1) args(1).toInt else 8
    val hi = if (args.length > 2) args(2).toInt else 32
    val rounds = if (args.length > 3) args(3).toInt else 3

    final case class Cell(op: String, units: Int, secs: Double, result: Long,
                          gate: Double, post: Double)

    def edgesOf(spark: SparkSession, n: Long): DataFrame = {
      val ids = spark.range(n).select(col("id"))
      def chord(m: Long, a: Long) = ids.select(col("id").as("src"),
        ((col("id") * m + a) % n).as("dst"))
      chord(1, 1).union(chord(1, 2)).union(chord(7, 3)).localCheckpoint()
    }

    def gated(op: String, units: Int)(body: => Long): Cell = {
      val (_, g) = Bench.awaitHealthyHost(maxWaitSec = 120)
      val t0 = System.nanoTime()
      val result = body
      val secs = (System.nanoTime() - t0) / 1e9
      val post = Bench.postProbe()
      System.err.println(
        f"[graph-scale] $op@local[$units]: $secs%.2f s result=$result (gate $g%.2f, post $post%.2f GB/s)")
      Cell(op, units, secs, result, g, post)
    }

    def session(units: Int): Seq[Cell] = {
      val spark = Bench.newSession(units.toString)
      spark.sparkContext.setLogLevel("WARN")
      try {
        val edges = edgesOf(spark, nNodes)
        edges.count() // materialize the checkpoint outside the clocks
        Seq(
          gated("pagerank_3it", units) {
            GraphOps.pageRank(edges, iterations = 3)
              .agg(sum(org.apache.spark.sql.functions.floor(col("rank") * 1e12)
                .cast("long"))).head().getLong(0)
          },
          gated("triangles", units) {
            GraphOps.triangleCount(edges)
              .agg(sum(col("n_triangles"))).head().getLong(0) / 3
          },
          gated("bfs_from_0", units) {
            import spark.implicits._
            GraphOps.shortestPaths(edges, Seq(0L).toDF("node"), maxIterations = 60)
              .agg(sum(col("distance"))).head().getLong(0)
          })
      } finally spark.stop()
    }

    // warmup session (JIT), untimed, discarded
    {
      val w = Bench.newSession(lo.toString)
      w.sparkContext.setLogLevel("WARN")
      try {
        val e = edgesOf(w, math.min(nNodes, 50000L)); e.count()
        GraphOps.pageRank(e, 1).count()
        GraphOps.triangleCount(e).count()
      } finally w.stop()
    }

    val cells = (1 to rounds).flatMap(_ => session(lo) ++ session(hi))
    val floor = Bench.cleanFloor
    def cellJson(c: Cell): String =
      f"""{"op":"${c.op}","units":${c.units},"sec":${c.secs}%.2f,"result":${c.result},"gate_gbps":${c.gate}%.2f,"post_gbps":${c.post}%.2f,"clean":${c.gate >= floor && c.post >= floor}}"""

    // determinism across parallelism: every op must produce the same
    // value at both levels, every round
    cells.groupBy(_.op).foreach { case (op, cs) =>
      require(cs.map(_.result).distinct.size == 1,
        s"$op results diverge across parallelism levels: ${cs.map(c => c.units -> c.result)}")
    }
    val effJson = cells.groupBy(_.op).toSeq.sortBy(_._1).map { case (op, cs) =>
      def best(u: Int) = {
        val ofU = cs.filter(_.units == u)
        val clean = ofU.filter(c => c.gate >= floor && c.post >= floor)
        (if (clean.nonEmpty) clean else ofU).map(_.secs).min
      }
      val (tLo, tHi) = (best(lo), best(hi))
      val eff = (tLo / tHi) / (hi.toDouble / lo)
      f""""$op":{"sec_lo":$tLo%.2f,"sec_hi":$tHi%.2f,"speedup":${tLo / tHi}%.2f,"efficiency":$eff%.3f}"""
    }.mkString("{", ",", "}")

    val json =
      s"""{"metric":"graph_ops_scaling","nodes":$nNodes,"lo":$lo,"hi":$hi,"efficiency":$effJson,"cells":${cells.map(cellJson).mkString("[", ",", "]")},"clean_floor_gbps":${f"$floor%.2f"}}"""
    println(json)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("graph_scale.json"), json)
    catch { case e: Exception => System.err.println(s"[graph-scale] write failed: ${e.getMessage}") }
  }
}
