package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, SparkSession => ClassicSparkSession}

/** Zero-copy escape hatch: run an Iterator[InternalRow] transform over a
  * DataFrame's Tungsten rows WITHOUT the Row-encoder boundary.
  *
  * Why it exists: `df.mapPartitions` deserializes every UnsafeRow into a
  * boxed GenericRow (one object + one box per field + decoded strings).
  * For a row-identity transform like adjacent-duplicate dropping that
  * allocation is the entire cost — at 32 threads the garbage rate inverts
  * scaling (measured: the fused dedup+write stage got SLOWER from 8→32
  * threads). Operating on UnsafeRows directly keeps the hot loop at two
  * pointer reads (getLong) and an occasional byte-compare.
  *
  * Contract for `f`: input rows may share a mutable buffer — `.copy()`
  * anything retained across `next()` calls; emitted rows may be reused
  * immediately by the consumer, which is fine for every Spark sink (they
  * copy on retention).
  */
object GraftInternal {
  def mapPartitionsUnsafe(df: DataFrame,
                          f: Iterator[InternalRow] => Iterator[InternalRow]): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataFrame]
    val spark = classic.sparkSession.asInstanceOf[ClassicSparkSession]
    spark.internalCreateDataFrame(
      classic.queryExecution.toRdd.mapPartitions(f), classic.schema)
  }

  /** Eager local checkpoint that ALSO returns the row count from the
    * same materialization job. Iterative fixpoint loops (transitive
    * closure, delta iteration) previously paid two jobs per round —
    * `localCheckpoint()` (which internally materializes every partition)
    * followed by a separate `count()` for the convergence test. This
    * mirrors `Dataset.localCheckpoint`'s own implementation
    * (`queryExecution.toRdd.map(_.copy()).localCheckpoint()`) but keeps
    * the count the materialization already produces, halving the
    * per-round driver actions (optimization guide §1.2: fix the
    * algorithm's job structure before per-task work).
    */
  def localCheckpointWithCount(df: DataFrame): (DataFrame, Long) = {
    val classic = df.asInstanceOf[ClassicDataFrame]
    val spark = classic.sparkSession.asInstanceOf[ClassicSparkSession]
    val rdd = classic.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val n = rdd.count()
    (spark.internalCreateDataFrame(rdd, classic.schema), n)
  }

  /** [[localCheckpointWithCount]] variant that additionally counts the
    * rows whose boolean column `predCol` is true, still in the single
    * materialization job. Fixpoint loops whose convergence test is a
    * predicate over the just-materialized round (label ≠ previous label,
    * degree < k, ...) previously paid a separate `isEmpty`/`filter.count`
    * action per round on top of the checkpoint — guide §1.2 again: the
    * probe is free if it rides the materialization pass.
    */
  def localCheckpointWithPredCount(df: DataFrame,
                                   predCol: String): (DataFrame, Long, Long) = {
    val classic = df.asInstanceOf[ClassicDataFrame]
    val spark = classic.sparkSession.asInstanceOf[ClassicSparkSession]
    val ord = classic.schema.fieldIndex(predCol)
    val rdd = classic.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val (n, nTrue) = rdd.mapPartitions { it =>
      var total = 0L
      var t = 0L
      while (it.hasNext) {
        val r = it.next()
        total += 1
        if (!r.isNullAt(ord) && r.getBoolean(ord)) t += 1
      }
      Iterator.single((total, t))
    }.fold((0L, 0L)) { case ((a1, b1), (a2, b2)) => (a1 + a2, b1 + b2) }
    (spark.internalCreateDataFrame(rdd, classic.schema), n, nTrue)
  }

  /** [[localCheckpointWithCount]] variant that additionally sums a
    * DecimalType column during the materialization pass (null when every
    * value is null, mirroring SQL `sum`). For fixpoint loops whose
    * convergence test is a checksum aggregate of the round (connected
    * components' label sum, star CC's edge-hash sum): the caller casts
    * the checksum into a column of the round frame and the separate
    * per-round aggregation action disappears.
    */
  def localCheckpointWithCountAndDecimalSum(
      df: DataFrame, sumCol: String): (DataFrame, Long, java.math.BigDecimal) = {
    val classic = df.asInstanceOf[ClassicDataFrame]
    val spark = classic.sparkSession.asInstanceOf[ClassicSparkSession]
    val ord = classic.schema.fieldIndex(sumCol)
    val dt = classic.schema(sumCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.DecimalType]
    val (p, s) = (dt.precision, dt.scale)
    val rdd = classic.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val (n, sum, any) = rdd.mapPartitions { it =>
      var total = 0L
      var acc = java.math.BigDecimal.ZERO
      var seen = false
      while (it.hasNext) {
        val r = it.next()
        total += 1
        if (!r.isNullAt(ord)) {
          acc = acc.add(r.getDecimal(ord, p, s).toJavaBigDecimal)
          seen = true
        }
      }
      Iterator.single((total, acc, seen))
    }.fold((0L, java.math.BigDecimal.ZERO, false)) {
      case ((n1, s1, a1), (n2, s2, a2)) => (n1 + n2, s1.add(s2), a1 || a2)
    }
    (spark.internalCreateDataFrame(rdd, classic.schema), n, if (any) sum else null)
  }

  /** True when `df` is ALREADY a materialized RDD (a local/reliable
    * checkpoint or an internally-created frame over concrete rows) whose
    * columns are exactly `cols` — i.e. re-checkpointing it would be a
    * pure copy. Lets operators that defensively materialize an input
    * (e.g. updateClosure's stored-closure checkpoint) skip the redundant
    * O(rows) copy job when the caller hands them a frame that a sibling
    * operator just materialized.
    */
  def isMaterializedWithColumns(df: DataFrame, cols: Seq[String]): Boolean = {
    val lp = df.asInstanceOf[ClassicDataFrame].queryExecution.logical
    lp.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD] &&
      lp.output.map(_.name) == cols
  }

  /** Drain the async listener bus (accessor is `private[spark]`):
    * metric listeners (e.g. per-run shuffle-byte accounting in
    * graft.Bench) must see every completed stage before a snapshot is
    * read — without the drain a snapshot races in-flight events.
    */
  def waitListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
