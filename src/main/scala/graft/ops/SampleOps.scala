package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data-curation sampling for training-data pipelines.
  *
  * `df.sample()` is the wrong tool for corpus curation: it's seeded per
  * RDD partition, so the selected set changes under repartition, task
  * retry, or engine version — a training run can't be reproduced from
  * the recipe. Hash-gate sampling fixes that: a row is kept iff
  * `h60(salt:key) mod 10000 < rate(stratum) × 10000`, a pure function of
  * the row key, identical across runs, partitionings, retries, and
  * engines (the portable hash is reproducible in SQL — see
  * [[PortableHash.sqlH60]]). Changing `salt` draws an independent sample;
  * keeping it pins the exact document set forever.
  */
object SampleOps {

  val Buckets = 10000L

  /** The per-row gate bucket in [0, 10000): `h60(salt:key) mod 10000`. */
  def gateBucket(key: Column, salt: String): Column =
    pmod(PortableHash.h60(concat(lit(s"$salt:"), key.cast("string"))), lit(Buckets))

  /** Per-stratum rate as a column: strata absent from `rates` get
    * `defaultRate` (0.0 = drop unknown strata — the safe default for a
    * curated mix).
    */
  def rateFor(stratum: Column, rates: Map[String, Double], defaultRate: Double): Column =
    rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(stratum === lit(s), lit(r)).otherwise(acc)
    }

  /** Stratified deterministic sample: keep each row with probability
    * `rates(stratum)` (exactly reproducible, not pseudo-random per run).
    * One codegen'd filter — no shuffle, no state; scales with the scan.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       rates: Map[String, Double], defaultRate: Double = 0.0,
                       salt: String = "sample"): DataFrame =
    df.filter(gateBucket(key, salt) <
      (rateFor(stratum, rates, defaultRate) * Buckets).cast("long"))

  /** DuckDB SQL fragment mirroring the gate: `(h60('salt:' || key) %
    * 10000) < CASE stratum ... END` — bit-identical selection.
    */
  def gateSql(keyExpr: String, salt: String): String =
    s"(${PortableHash.sqlH60(s"'$salt:' || CAST($keyExpr AS VARCHAR)")} % $Buckets)"
}
