package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for an LLM-training-data pipeline.
  *
  * Spark's own `sample()` is seed-reproducible only for a fixed partitioning
  * (the Bernoulli draw is keyed by partition index), which makes it
  * unreproducible across cluster sizes and inexpressible in an external
  * oracle. These operators sample by CONTENT hash instead — a row is in the
  * sample iff a pure function of its key says so — which is stable under
  * repartitioning, re-runs, and engine changes, and is exactly the property
  * a training-data pipeline needs ("the sample I audited is the sample that
  * trained").
  */
object Sampling {

  /** Hash-bucket resolution: rates are granted in millionths. */
  val Buckets: Long = 1000000L

  /** Defaults shared with the registered query's oracle SQL — the oracle
    * interpolates THESE constants (not literals), so changing a default
    * here cannot silently desync the two engines.
    */
  val DefaultTargetPerStratum: Long = 100L
  val DefaultSeed: Int = 7

  /** Stratified sample of `documents` targeting ~`targetPerStratum` rows
    * per language: each stratum is sampled at rate target/n_lang via a
    * 60-bit md5 of the doc_id reduced to a bucket in [0, Buckets), kept iff
    * `bucket < floor(target·Buckets / n_lang)`. The threshold is computed
    * with INTEGER division on both engines (Spark `div`, DuckDB `//`) so
    * the kept set is bit-reproducible; strata smaller than the target pass
    * entirely (threshold ≥ Buckets).
    *
    * Shape: one hash-agg for the per-stratum counts (|langs| rows,
    * broadcast back), one scan with a per-row md5 + filter. No corpus-scale
    * shuffle — at 100 TB this is scan-speed, and the sample is balanced
    * across strata rather than proportional (rare languages are not
    * drowned by English), which is the allocation a curriculum/eval split
    * actually wants.
    */
  def stratifiedSample(
      documents: DataFrame, targetPerStratum: Long = DefaultTargetPerStratum,
      seed: Int = DefaultSeed): DataFrame = {
    val counts = documents.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    documents
      .select(
        col("doc_id"), col("lang"),
        (HashFunctions.md5Long(col("doc_id").cast("string"), seed) % Buckets).as("bucket"))
      .join(broadcast(counts), "lang")
      .where(col("bucket") < expr(s"${targetPerStratum * Buckets} div n_lang"))
      .select(col("doc_id"), col("lang"), col("bucket"))
  }

  /** Weight cap for [[weightedSample]]: keep probability saturates at 1
    * once a document reaches this many tokens.
    */
  val WeightCap: Long = 256L
  val WeightedSeed: Int = 11

  /** Quality-weighted Bernoulli sample: each document is kept with
    * probability `min(n_tokens, cap) / cap` — longer (higher-signal)
    * documents are proportionally more likely to survive, the
    * importance-sampling shape a data-mixing pipeline uses to tilt a
    * corpus toward its quality signal without hard thresholds.
    *
    * Determinism: the draw is `md5₆₀(seed:doc_id) mod cap < weight` — a
    * pure function of the key, so the kept set is identical across
    * partitionings, engines, and re-runs (same contract as
    * [[stratifiedSample]], integer arithmetic end to end). Scan-speed:
    * per-row hash + filter, no shuffle at all.
    */
  def weightedSample(documents: DataFrame, cap: Long = WeightCap,
      seed: Int = WeightedSeed): DataFrame =
    documents
      .select(
        col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("weight"),
        (HashFunctions.md5Long(col("doc_id").cast("string"), seed) % cap).as("draw"))
      .where(col("draw") < least(col("weight"), lit(cap)))
}
