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

  /** Drain the async listener bus (accessor is `private[spark]`):
    * metric listeners (e.g. per-run shuffle-byte accounting in
    * graft.Bench) must see every completed stage before a snapshot is
    * read — without the drain a snapshot races in-flight events.
    */
  def waitListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
