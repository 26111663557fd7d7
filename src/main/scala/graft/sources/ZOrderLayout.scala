package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional clustering — the file layout
  * that makes min/max file skipping work on TWO predicate dimensions at
  * once. A single-column sort clusters perfectly on that column and not at
  * all on any other: a 100 TB events table laid out by date answers date
  * ranges cheaply and scans EVERYTHING for a user or value predicate.
  * Interleaving the bits of both dimensions into one sort key gives each
  * file a small rectangle of (x, y) space, so a range on EITHER dimension
  * overlaps only ~√(selectivity) of the files — this is what Delta/Iceberg
  * `OPTIMIZE ZORDER BY` does, rebuilt here from bit arithmetic.
  *
  * The z-value itself is pure integer bit manipulation (shifts, masks,
  * adds — all codegen'd builtins), so the registered query replays
  * bit-for-bit in the DuckDB oracle.
  */
object ZOrderLayout {

  /** Bits kept per dimension: 16 + 16 interleave into a 32-bit z-value. */
  val ZBits = 16

  /** Morton interleave of the low [[ZBits]] bits of `x` (even positions)
    * and `y` (odd positions). Inputs must already be clamped to
    * [0, 2^ZBits); [[clamp16]] is the canonical clamp.
    */
  def zValue(x: Column, y: Column): Column =
    (0 until ZBits).foldLeft(lit(0L)) { (acc, b) =>
      acc +
        shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }

  /** Clamp a long column into the z-addressable domain [0, 2^ZBits). */
  def clamp16(c: Column): Column =
    greatest(lit(0L), least(c.cast("long"), lit((1L << ZBits) - 1)))

  /** The events table's two skip dimensions for the registered query:
    * user id and value in cents, both clamped. Mirrored in the oracle.
    */
  def eventZ(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      clamp16(col("user_id")).as("zx"),
      clamp16(round(col("value") * 100).cast("long")).as("zy"))
      .withColumn("z", zValue(col("zx"), col("zy")))

  /** Rewrite a frame z-clustered: range-partition by z (each output file
    * owns a contiguous z run = a small (x, y) rectangle), sort within
    * partitions so row-group stats are tight too. Same one-time-layout
    * bargain as [[PartitionedLayout]], for multi-dimensional point/range
    * predicates instead of the partition column.
    */
  def writeZOrdered(df: DataFrame, zCol: String, path: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .write.mode("overwrite").parquet(path)
}
