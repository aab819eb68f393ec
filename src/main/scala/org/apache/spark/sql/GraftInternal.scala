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

  /** Drain the async listener bus (accessor is `private[spark]`):
    * metric listeners (e.g. per-run shuffle-byte accounting in
    * graft.Bench) must see every completed stage before a snapshot is
    * read — without the drain a snapshot races in-flight events.
    */
  def waitListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
