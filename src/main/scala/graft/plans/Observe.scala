package graft.plans

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Query-attached data-quality metrics via `observe()` (the CollectMetrics
  * operator): row and per-column null counters computed DURING the job
  * that was running anyway — zero extra scan, zero extra action. This is
  * the generalization of the reference master's progress accounting
  * (`master/master.go:226-235`) from task counts to data-quality counts:
  * a 100 TB ingest asserts its row/null budget as a side effect of the
  * write instead of re-reading the input to check it.
  */
object Observe {

  /** Attach `n_rows` and a `nulls_<col>` counter per named column. The
    * returned frame is the input, unchanged — metrics land on `obs` when
    * the first action on the frame completes.
    */
  def withRowMetrics(df: DataFrame, obs: Observation, cols: Seq[String]): DataFrame = {
    val metrics = count(lit(1)).as("n_rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    df.observe(obs, metrics.head, metrics.tail: _*)
  }
}
