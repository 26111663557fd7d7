package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. the skewed side feeds a
  * non-shuffle operator, or the build side must shuffle too).
  *
  * Mechanics: the skewed (large) side gets a deterministic salt in
  * [0, buckets) hashed from a high-cardinality disambiguator column, so one
  * hot key spreads over `buckets` shuffle partitions; the other side is
  * replicated `buckets` times via explode so every (key, salt) bucket finds
  * its match. Replication multiplies the small side by a constant — the
  * classic trade: bounded duplication for an unbounded skew fix. Result is
  * row-identical to the plain join (asserted in SkewJoinSpec).
  */
object SkewJoin {

  /** Inner equi-join of `skewed` (salting on `disambig`) with `other`
    * (replicated `buckets`×) on `skewed(key) === other(otherKey)`.
    */
  def saltedJoin(
      skewed: DataFrame, other: DataFrame,
      key: String, otherKey: String,
      disambig: Column, buckets: Int = 8): DataFrame = {
    val salted = skewed.withColumn("_salt", pmod(hash(disambig), lit(buckets)))
    val replicated = other.withColumn(
      "_salt", explode(array((0 until buckets).map(lit): _*)))
    salted
      .join(replicated, salted(key) === replicated(otherKey) &&
        salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
