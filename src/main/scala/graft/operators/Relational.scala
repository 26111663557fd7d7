package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator suite over the driver's TPC-H-ish star schema
  * (FIXTURES.md §B) — the generalization of the reference's single
  * scan→project→filter→agg→sort→limit pipeline (SURVEY §2) to a full query
  * library: multi-way joins, distinct aggregates, rollup, window functions,
  * set ops, semi/anti joins, scalar functions.
  *
  * Scale conventions used throughout:
  *   - Dimension tables (`region`, `nation`, and at 100 TB also `supplier`,
  *     `part` if they fit `spark.sql.autoBroadcastJoinThreshold`) are
  *     explicitly `broadcast()` — no shuffle for the build side.
  *   - Fact-fact joins (`orders ⋈ lineitem`) shuffle on the join key; AQE
  *     handles skew splitting. On a real deployment both facts would be
  *     bucketed by key to make this a zero-shuffle sort-merge join.
  *   - All aggregates are hash aggregates with map-side partials — Catalyst
  *     plans those automatically; nothing here prevents it (no UDAFs).
  *   - Numeric outputs are `round`ed (2dp for money sums, 4dp for averages)
  *     so results are invariant to floating-point summation order across
  *     partitionings — required for a stable result at any parallelism.
  */
object Relational {

  /** Money columns in the test data are exact 2-decimal doubles. All money
    * aggregates below run on integer cents (exact, order-independent) and
    * divide back to dollars as the LAST step, with no fractional `round()`:
    * double summation is partition-order-dependent, and `round()` itself
    * disagrees across engines at half-way points (Spark rounds the shortest
    * decimal representation, DuckDB the binary value). Integer sums are
    * bit-reproducible at any parallelism. (Exactness bound: cents sums stay
    * < 2^53; for a true 100 TB deployment these would be `DecimalType`
    * columns at the source and the scaling layer disappears.)
    */
  private[operators] def cents(c: Column): Column = round(c * 100).cast("long")

  /** l_extendedprice * (1 - l_discount) in exact 1e-4-dollar units. */
  private def discPriceUnits: Column =
    cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))

  /** TPC-H Q1-style pricing summary: scan → partial agg → 6-group final agg.
    * One shuffle whose width = #(returnflag × linestatus) = 6 groups.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(cents(col("l_quantity"))).cast("double") / 100.0).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))).cast("double") / 100.0).as("sum_base_price"),
        (sum(discPriceUnits).cast("double") / 10000.0).as("sum_disc_price"),
        (sum(cents(col("l_quantity"))).cast("double") / count(lit(1)) / 100.0).as("avg_qty"),
        (sum(cents(col("l_extendedprice"))).cast("double") / count(lit(1)) / 100.0).as("avg_price"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q6-style forecast revenue: the predicate-pushdown showcase.
    * All four filters reach the parquet scan (`PushedFilters`), and only
    * 4 of 11 columns are read (`ReadSchema`). Single-row output.
    */
  def forecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .where(
        col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg((sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
        .cast("double") / 10000.0).as("revenue"))

  /** TPC-H Q3-style shipping priority: selective dim filter → 3-way join →
    * agg → top-10. `customer` (filtered) is broadcast; `orders ⋈ lineitem`
    * shuffles on orderkey. Top-10 runs as TakeOrderedAndProject.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    broadcast(customer.where(col("c_mktsegment") === "BUILDING"))
      .join(orders, col("c_custkey") === col("o_custkey"))
      .where(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg((sum(discPriceUnits).cast("double") / 10000.0).as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(10)

  /** TPC-H Q5-style local-supplier revenue: 6-way join through the whole
    * star. region→nation broadcast down the chain; the customer=supplier
    * nation equality is the classic "local supplier" constraint.
    */
  def localSupplierRevenue(
      region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame =
    broadcast(region.where(col("r_name") === "ASIA"))
      .join(broadcast(nation), col("r_regionkey") === col("n_regionkey"))
      .join(customer, col("n_nationkey") === col("c_nationkey"))
      .join(orders, col("c_custkey") === col("o_custkey"))
      .where(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(
        broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg((sum(discPriceUnits).cast("double") / 10000.0).as("revenue"))

  /** TPC-H Q14-style promo revenue: lineitem ⋈ broadcast(part) with
    * conditional aggregation per ship-year. The promo share is a ratio of
    * two exact integer sums — one double division, engine-reproducible.
    */
  def promoRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val promoUnits = when(col("p_type") === "PROMO", discPriceUnits).otherwise(0L)
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).as("yr"))
      .agg(
        (sum(promoUnits).cast("double") / 10000.0).as("promo_revenue"),
        (sum(discPriceUnits).cast("double") / 10000.0).as("total_revenue"),
        (sum(promoUnits).cast("double") / sum(discPriceUnits)).as("promo_share"))
  }

  /** TPC-H Q19-style disjunctive predicate (OR of brand/size/quantity
    * conjunctions). What this exercises is the OPTIMIZER, not the agg:
    * Catalyst distributes the disjunction so the parts common to every
    * branch reach the scans — the `p_brand IN (...)`, `p_size` and
    * `l_quantity` envelope predicates push into the parquet readers
    * (`PushedFilters` shows the Or tree), and only survivors meet the
    * broadcast join; the exact OR-of-ANDs then filters residually. A
    * naive engine evaluates the whole disjunction post-join.
    */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    def branch(brand: String, sizeHi: Int, qLo: Int, qHi: Int): Column =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .where(
        branch("Brand#12", 5, 1, 11) ||
        branch("Brand#23", 10, 10, 20) ||
        branch("Brand#34", 15, 20, 30))
      .agg(
        (sum(discPriceUnits).cast("double") / 10000.0).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q10-style returned-item reporting: one quarter's returned ('R')
    * lineitems → orders → customer, nation broadcast; top-20 customers by
    * lost revenue. The selective fact filters (returnflag + date window)
    * run before any join, the customer join shuffles on custkey, and the
    * top-20 plans as TakeOrderedAndProject.
    */
  def returnedItemRevenue(
      customer: DataFrame, orders: DataFrame, nation: DataFrame,
      lineitem: DataFrame): DataFrame =
    lineitem.where(col("l_returnflag") === "R")
      .join(
        orders.where(
          col("o_orderdate") >= to_timestamp(lit("1996-07-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-10-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg((sum(discPriceUnits).cast("double") / 10000.0).as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)

  /** TPC-H Q18-style large-volume customers: a HAVING-filtered aggregate
    * subquery (orders whose total quantity exceeds the threshold) joined
    * back to orders and customer. The subquery aggregates lineitem FIRST —
    * the join input shrinks to the rare qualifying orderkeys before any
    * wide row is built. Quantity total uses exact integer cents, so the
    * threshold comparison is engine-reproducible.
    */
  def largeVolumeCustomers(
      customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
      minQty: Double = 250.0): DataFrame = {
    val big = lineitem
      .groupBy("l_orderkey")
      .agg((sum(cents(col("l_quantity"))).cast("double") / 100.0).as("total_qty"))
      .where(col("total_qty") > minQty)
    big
      .join(orders, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q4-style priority check: orders with at least one lineitem
    * shipped after the order date, counted per priority. The correlated
    * `EXISTS` is a LEFT SEMI join with a non-equi conjunct riding the
    * orderkey equality — Catalyst keeps the equality as the shuffle key
    * and evaluates the date comparison inside the join, so the shape stays
    * a hash join (never a BNLJ), and the semi join short-circuits on the
    * first match instead of materializing duplicates.
    */
  def latePriorityOrders(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(
        lineitem.select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))

  /** TPC-H Q13-style customer order-count distribution: how many customers
    * placed exactly N orders, INCLUDING the zero-order customers — the
    * classic two-level aggregate over a preserved outer join. `count(col)`
    * (not `count(*)`) skips the null rows the left join injects, so
    * orderless customers land in the N=0 bucket on both engines. First agg
    * shuffles on custkey, second on the (tiny) distinct-count domain.
    */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_customers"))

  /** TPC-H Q17-style small-quantity revenue: lineitems of one brand's parts
    * whose quantity is below a fraction of that part's average quantity.
    * The correlated AVG decorrelates to a per-part aggregate joined back to
    * the fact. The fractional-average comparison is CROSS-MULTIPLIED into
    * exact integers — `qty · den · n < num · Σqty` — so the qualifying set
    * is bit-identical across engines (a double `avg()` would not be).
    * Fraction = num/den, default 1/2.
    */
  /** [[smallQuantityRevenue]] defaults, interpolated into the DuckDB oracle
    * so the two sides cannot silently desync.
    */
  val SmallQtyBrand = "Brand#23"
  val SmallQtyNum = 1
  val SmallQtyDen = 2

  def smallQuantityRevenue(
      lineitem: DataFrame, part: DataFrame,
      brand: String = SmallQtyBrand,
      num: Int = SmallQtyNum, den: Int = SmallQtyDen): DataFrame = {
    // restrict the fact ONCE to the brand's partkeys (broadcast semi join)
    // before the per-part aggregate: the correlated average is per-part, so
    // dropping other parts' rows can't change it — and at 100 TB it is the
    // difference between aggregating the whole fact and ~1/|brands| of it
    val brandLi = lineitem.join(
      broadcast(part.where(col("p_brand") === brand).select("p_partkey")),
      col("l_partkey") === col("p_partkey"), "left_semi")
    val perPart = brandLi
      .groupBy(col("l_partkey").as("a_partkey"))
      .agg(sum(cents(col("l_quantity"))).as("sum_qc"), count(lit(1)).as("n_li"))
    brandLi
      .join(perPart, col("l_partkey") === col("a_partkey"))
      .where(cents(col("l_quantity")) * den * col("n_li") < lit(num) * col("sum_qc"))
      .agg(
        (sum(cents(col("l_extendedprice"))).cast("double") / 100.0).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Dormancy window for [[dormantRichCustomers]], interpolated into the
    * oracle.
    */
  val DormantDays = 365

  /** TPC-H Q22-style dormant high-balance customers: customers whose
    * balance exceeds the global average positive balance and who placed no
    * order in the last [[DormantDays]] days of the corpus, grouped by
    * nation. Both global scalars (the average, the recency cutoff) are
    * one-row aggregates broadcast to every row (the tfidf n_docs pattern);
    * the average is compared by exact integer cross-multiplication
    * (`bal · n > Σbal`) and the cutoff in exact epoch micros; the dormancy
    * side is a LEFT ANTI join on custkey against the recent-order keys.
    */
  def dormantRichCustomers(customer: DataFrame, orders: DataFrame,
      dormantDays: Int = DormantDays): DataFrame = {
    val us = unix_micros(col("o_orderdate").cast("timestamp"))
    val cutoff = orders
      .agg((max(us) - lit(dormantDays.toLong * 86400000000L)).as("cutoff_us"))
    val recent = orders
      .crossJoin(broadcast(cutoff))
      .where(us >= col("cutoff_us"))
      .select(col("o_custkey"))
    val avgPos = customer
      .where(col("c_acctbal") > 0.0)
      .agg(sum(cents(col("c_acctbal"))).as("sum_bal"), count(lit(1)).as("n_pos"))
    customer
      .crossJoin(broadcast(avgPos))
      .where(cents(col("c_acctbal")) * col("n_pos") > col("sum_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n_customers"),
        (sum(cents(col("c_acctbal"))).cast("double") / 100.0).as("total_bal"))
  }

  /** Lateness threshold (days) for [[waitingSuppliers]], interpolated into
    * the oracle. This schema has no commit/receipt dates, so "late" =
    * shipped more than this many days after the order date (the same
    * lateness axis as [[latePriorityOrders]]).
    */
  val WaitingLateDays = 90

  /** TPC-H Q21-style waiting suppliers — the hardest standard
    * decorrelation shape: EXISTS and NOT EXISTS against the SAME fact
    * table with an inequality conjunct. For 'F'-status orders, count per
    * supplier the late lineitems on orders where ANOTHER supplier also
    * shipped (EXISTS → LEFT SEMI on orderkey with a `suppkey <>` residual)
    * and where NO other supplier was late (NOT EXISTS → LEFT ANTI on
    * orderkey with the same residual, probing the already-restricted late
    * set). Both sub-joins are hash joins keyed on l_orderkey with the
    * inequality evaluated as a residual condition — never a BNLJ
    * (PlanSpec's suite-wide lock covers this query too). The supplier dim
    * broadcasts; top-100 by (numwait DESC, s_name ASC) runs as
    * TakeOrderedAndProject.
    *
    * Lateness compares exact epoch micros, so the qualifying set is
    * bit-identical across engines.
    */
  def waitingSuppliers(
      supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
      lateDays: Int = WaitingLateDays): DataFrame = {
    val lateUs = lit(lateDays.toLong * 86400000000L)
    val fOrders = orders.where(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    // late lineitems of 'F' orders — both the counted set and the NOT
    // EXISTS probe set (l3 shares l1's order, so its order is 'F' too)
    val late = lineitem
      .join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .where(unix_micros(col("l_shipdate").cast("timestamp")) >
        unix_micros(col("o_orderdate").cast("timestamp")) + lateUs)
      .select("l_orderkey", "l_suppkey")
      .localCheckpoint() // probed twice (count side + anti side): one build
    val withOther = late.join(
      lineitem.select(col("l_orderkey").as("x_orderkey"), col("l_suppkey").as("x_suppkey")),
      col("l_orderkey") === col("x_orderkey") && col("l_suppkey") =!= col("x_suppkey"),
      "left_semi")
    val waiting = withOther.join(
      late.select(col("l_orderkey").as("y_orderkey"), col("l_suppkey").as("y_suppkey")),
      col("l_orderkey") === col("y_orderkey") && col("l_suppkey") =!= col("y_suppkey"),
      "left_anti")
    waiting
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(100)
  }

  /** Revenue window for [[topRevenueSupplier]], interpolated into the
    * oracle.
    */
  val TopRevStart = "1996-01-01"
  val TopRevEnd = "1996-04-01"

  /** TPC-H Q15-style top supplier: an aggregate view (per-supplier revenue
    * over a 3-month ship window) consumed twice — once for the global MAX
    * scalar, once to select the supplier(s) achieving it. The view is
    * computed ONCE and localCheckpointed; the max is a 1-row broadcast
    * (the n_docs pattern) compared in exact integer revenue units, so the
    * qualifying supplier set is bit-identical across engines. The supplier
    * dim broadcasts into the final lookup.
    */
  def topRevenueSupplier(supplier: DataFrame, lineitem: DataFrame): DataFrame = {
    val rev = lineitem
      .where(
        col("l_shipdate") >= to_timestamp(lit(TopRevStart)) &&
          col("l_shipdate") < to_timestamp(lit(TopRevEnd)))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(discPriceUnits).as("rev_units"))
      .localCheckpoint() // one scan feeds both the max and the filter
    val maxRev = rev.agg(max("rev_units").as("max_units"))
    rev.crossJoin(broadcast(maxRev))
      .where(col("rev_units") === col("max_units"))
      .join(broadcast(supplier), col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_units").cast("double") / 10000.0).as("total_revenue"))
  }

  /** Region/size dials for [[minCostSuppliers]], interpolated into the
    * oracle.
    */
  val MinCostRegion = "EUROPE"
  val MinCostSize = 15

  /** TPC-H Q2-style minimum-cost supplier: a correlated MIN across a JOIN.
    * This schema has no partsupp, so the "supply cost" of (part, supplier)
    * offers is the per-unit price of the supplier's lineitems for that
    * part (exact-integer cents ratio — ONE double division of two exact
    * integers, bit-portable), restricted to suppliers of one region and
    * parts of one size. The correlated `cost = (SELECT min(cost) ...)`
    * decorrelates to a per-part MIN aggregate joined back on
    * (partkey, cost-equality residual). The region→nation→supplier chain
    * and the sized part slice all broadcast; only lineitem scans at scale.
    */
  def minCostSuppliers(
      region: DataFrame, nation: DataFrame, supplier: DataFrame,
      part: DataFrame, lineitem: DataFrame): DataFrame = {
    val regSup = broadcast(
      region.where(col("r_name") === MinCostRegion)
        .join(nation, col("r_regionkey") === col("n_regionkey"))
        .join(supplier, col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name")))
    val offers = lineitem
      .join(broadcast(part.where(col("p_size") === MinCostSize).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(regSup, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"), col("n_name"),
        (cents(col("l_extendedprice")).cast("double") /
          cents(col("l_quantity")).cast("double")).as("unit_cost"))
      .localCheckpoint() // consumed by the min view and the equality probe
    val mins = offers.groupBy(col("p_partkey").as("m_partkey"))
      .agg(min(col("unit_cost")).as("min_cost"))
    offers
      .join(mins,
        col("p_partkey") === col("m_partkey") && col("unit_cost") === col("min_cost"))
      .select("p_partkey", "s_suppkey", "s_name", "n_name", "unit_cost")
      .distinct()
  }

  /** Latest-wins CDC upsert — the batch MERGE INTO shape: apply the order
    * stream as a change log onto the customer dimension. Each matched
    * customer is "updated" with their latest order's attributes (latest =
    * max (date, orderkey), a total deterministic order); unmatched
    * customers keep a sentinel row — i.e. WHEN MATCHED THEN UPDATE / WHEN
    * NOT MATCHED BY SOURCE THEN KEEP, resolved in one pass.
    *
    * Shape: `max_by` over a struct is ONE keyed hash-agg with map-side
    * combine (each partition keeps only its latest change per key — the
    * log compacts before it shuffles), then one outer equi-join on the
    * key. This is the merge-on-read compaction every log-structured table
    * format runs; the streaming twin is
    * [[graft.streaming.DocumentStreams]]'s keyed-store upsert.
    */
  def upsertLatestOrders(customer: DataFrame, orders: DataFrame): DataFrame = {
    val latest = orders
      .groupBy(col("o_custkey"))
      .agg(
        max_by(
          struct(col("o_orderpriority"), col("o_orderstatus")),
          struct(col("o_orderdate"), col("o_orderkey"))).as("u"),
        count(lit(1)).as("n_changes"))
    customer.join(latest, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"), col("c_mktsegment"),
        coalesce(col("u.o_orderpriority"), lit("NONE")).as("cur_priority"),
        coalesce(col("u.o_orderstatus"), lit("NONE")).as("cur_status"),
        coalesce(col("n_changes"), lit(0L)).as("n_changes"))
  }

  /** SCD2 (type-2 slowly-changing-dimension) history build from the same
    * change log: each order opens a new version of its customer's tracked
    * attribute, valid from its date until the next change (NULL = still
    * current). One per-key window (sort by date, then orderkey — total
    * order) yields version numbers, closing timestamps, and the current
    * flag in a single pass; validity bounds surface as exact epoch micros.
    */
  def scd2OrderHistory(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
    // the parquet date is TIMESTAMP_NTZ; pin it to the session's UTC axis
    // before unix_micros (which rejects NTZ) — same integers as DuckDB's
    // naive epoch_us
    val from = unix_micros(col("o_orderdate").cast("timestamp"))
    orders.select(
      col("o_custkey"),
      col("o_orderpriority").as("attr"),
      from.as("valid_from_us"),
      lead(from, 1).over(w).as("valid_to_us"),
      row_number().over(w).as("version"),
      lead(from, 1).over(w).isNull.as("is_current"))
  }

  /** Extended window-function suite in one pass: lag/lead (physical
    * offsets), ntile (quartile bucketing), and cume_dist — all over the
    * same per-customer date-ordered window, so ONE shuffle + sort serves
    * four functions. cume_dist is an exact integer ratio (rank / n),
    * portable across engines.
    */
  def orderWindowProfile(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
    orders.select(
      col("o_custkey"), col("o_orderkey"),
      lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
      lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
      ntile(4).over(w).as("quartile"),
      cume_dist().over(w).as("cdist"))
  }

  /** Exact grouped median over integer cents: both engines define the
    * interpolated percentile as the average of the two middle elements,
    * and on integer cents that average is an exact half — bit-portable,
    * unlike percentiles of raw doubles. (At 100 TB swap for
    * `percentile_approx` and verify error bounds instead — see
    * sketchSummary.)
    */
  def medianOrderValue(orders: DataFrame): DataFrame =
    orders
      .groupBy("o_orderpriority")
      .agg((percentile(cents(col("o_totalprice")), lit(0.5)) / 100.0)
        .as("median_price"))

  /** Percentile targets and resolution for [[histogramQuantiles]] —
    * interpolated into the oracle SQL.
    */
  val HistogramBuckets = 1000
  val HistogramPcts: Seq[Int] = Seq(50, 90, 99)

  /** SCALABLE approximate percentiles as a fixed-width histogram sketch —
    * the deterministic counterpart to `approx_percentile` (whose
    * interpolation is not engine-portable; cf. [[medianOrderValue]] for
    * the exact form). Per group: equi-width histogram over integer cents
    * (`buckets` integer counters, merged by plain sum — order-independent,
    * so bit-exact in the oracle), quantile rank `ceil(pct·n/100)` in pure
    * integer arithmetic, estimate = lower bound of the first bucket whose
    * cumulative count reaches the rank. The estimate is within one bucket
    * width of the true quantile by construction (spec-asserted).
    *
    * Scale shape: one narrow pass to (group, bucket) counts with map-side
    * combine — ≤ groups × buckets rows of state regardless of input — a
    * tiny min/max pre-agg to fix the bucket axis, and a window over ≤
    * `buckets` rows per group for the cumulative sum. At 100 TB the data
    * is touched twice (range + counts), never sorted — `percentile_cont`
    * would sort every group.
    */
  def histogramQuantiles(
      orders: DataFrame, buckets: Int = HistogramBuckets,
      pcts: Seq[Int] = HistogramPcts): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be integers in [1, 100]")
    val base = orders.select(
      col("o_orderpriority").as("grp"), cents(col("o_totalprice")).as("x"))
    val ranges = base.groupBy("grp")
      .agg(min("x").as("mn"), max("x").as("mx"), count(lit(1)).as("n"))
    val bucketed = base.join(ranges, "grp")
      .select(col("grp"), col("n"), col("mn"), col("mx"),
        expr(s"((x - mn) * $buckets) DIV (mx - mn + 1)").as("b"))
    val wCum = Window.partitionBy("grp").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed
      .groupBy("grp", "n", "mn", "mx", "b").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wCum))
    cum
      .select(col("grp"), col("n"), col("mn"), col("mx"), col("b"), col("cum"),
        explode(array(pcts.map(lit(_)): _*)).as("pct"))
      .where(col("cum") >= expr("(pct * n + 99) DIV 100"))
      .groupBy("grp", "pct", "n", "mn", "mx")
      .agg(min("b").as("qb"))
      .select(
        col("grp").as("o_orderpriority"), col("pct"), col("n"), col("qb"),
        expr(s"mn + (qb * (mx - mn + 1) + ${buckets - 1}) DIV $buckets")
          .as("est_cents"))
      .withColumn("est", col("est_cents").cast("double") / 100.0)
  }

  /** Pivot: order counts per priority, one column per order status. The
    * pivot values are declared explicitly, so Catalyst plans ONE pass of
    * conditional aggregation (no values-discovery job, no second scan) —
    * the form that scales; an undeclared pivot first runs a distinct query
    * to find the columns.
    */
  def ordersByPriorityPivot(orders: DataFrame): DataFrame =
    orders
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))

  /** Correlated scalar subquery through the SQL entry point — each
    * customer's cheapest order(s). Exercises the `spark.sql` API surface
    * and Catalyst's subquery decorrelation: the correlated `min` rewrites
    * to an aggregate + join (no per-row re-execution), so the plan is two
    * scans + one shuffle, not O(rows) subquery invocations. Equality is on
    * raw (unarithmetic'd) doubles — engine-portable.
    */
  def cheapestOrderPerCustomer(spark: org.apache.spark.sql.SparkSession,
      orders: DataFrame): DataFrame = {
    // per-call unique view name, dropped right after analysis binds the
    // plan — no fixed-name catalog state for concurrent callers to race on
    val view = s"graft_orders_v_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    orders.createOrReplaceTempView(view)
    try spark.sql(
      s"""SELECT o_custkey, o_orderkey, o_totalprice
         |FROM $view o
         |WHERE o_totalprice = (SELECT min(o2.o_totalprice)
         |                      FROM $view o2
         |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
    finally spark.catalog.dropTempView(view)
  }

  /** Distinct aggregate: Catalyst plans this as a two-phase expand+agg. */
  def distinctCustomers(orders: DataFrame): DataFrame =
    orders
      .groupBy("o_orderpriority")
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))

  /** Grouping sets via ROLLUP — subtotals + grand total in one pass. */
  def rollupSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        (sum(cents(col("l_quantity"))).cast("double") / 100.0).as("sum_qty"),
        count(lit(1)).as("n"))

  /** Grouping sets via CUBE — all 2^k grouping combinations in one pass
    * (rollup's hierarchical subset plus the per-linestatus marginals).
    * Same single-shuffle shape as rollup: Expand multiplies rows by the
    * grouping-set count BEFORE the partial aggregate, so the shuffle still
    * carries group cardinality, not the corpus.
    */
  def cubeSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .cube("l_returnflag", "l_linestatus")
      .agg(
        (sum(cents(col("l_quantity"))).cast("double") / 100.0).as("sum_qty"),
        count(lit(1)).as("n"))

  /** Nation pair / window dials for [[volumeShipping]] (q7 shape). */
  val VolShipNationA = "NATION_1"
  val VolShipNationB = "NATION_2"
  val VolShipStart = "1996-01-01"
  val VolShipEnd = "1998-01-01"

  /** TPC-H Q7-style volume shipping: revenue flowing between two nations
    * in BOTH directions (supplier nation → customer nation), per ship
    * year — the symmetric-pair predicate `(n1=A AND n2=B) OR (n1=B AND
    * n2=A)` over a 5-way join. Both nation dims broadcast pre-filtered to
    * the pair, so the disjunction runs over 2×2 combinations, not the
    * nation cross; revenue in exact integer units; the ship year is an
    * integer extraction, portable.
    */
  def volumeShipping(
      nation: DataFrame, customer: DataFrame, supplier: DataFrame,
      orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pair = Seq(VolShipNationA, VolShipNationB)
    val n1 = broadcast(nation.where(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(nation.where(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    lineitem
      .where(col("l_shipdate") >= to_timestamp(lit(VolShipStart)) &&
        col("l_shipdate") < to_timestamp(lit(VolShipEnd)))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .where(
        (col("supp_nation") === VolShipNationA && col("cust_nation") === VolShipNationB) ||
          (col("supp_nation") === VolShipNationB && col("cust_nation") === VolShipNationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg((sum(discPriceUnits).cast("double") / 10000.0).as("revenue"))
  }

  /** Region / part-type / target-nation dials for [[marketShare]]. */
  val MktRegion = "ASIA"
  val MktType = "PROMO"
  val MktNation = "NATION_2"

  /** TPC-H Q8-style market share: of all revenue from one part type sold
    * to customers of one region per order year, the fraction supplied by
    * one nation — a RATIO OF TWO CONDITIONAL SUMS computed in the same
    * pass (sum(when)/sum), both in exact integer units with ONE double
    * division, so the share is bit-portable. Region→nation→customer
    * chain and the typed part slice broadcast; only the facts shuffle.
    */
  def marketShare(
      region: DataFrame, nation: DataFrame, customer: DataFrame,
      supplier: DataFrame, part: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val regCust = broadcast(
      region.where(col("r_name") === MktRegion)
        .join(nation, col("r_regionkey") === col("n_regionkey"))
        .join(customer, col("n_nationkey") === col("c_nationkey"))
        .select("c_custkey"))
    val suppNation = broadcast(
      supplier.join(nation, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    lineitem
      .join(broadcast(part.where(col("p_type") === MktType).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(regCust, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === MktNation, discPriceUnits)
          .otherwise(lit(0L))).cast("double") /
          sum(discPriceUnits).cast("double")).as("mkt_share"),
        (sum(discPriceUnits).cast("double") / 10000.0).as("total_revenue"))
  }

  /** Explicit GROUPING SETS — the third grouping-combination surface next
    * to rollup (hierarchical prefixes) and cube (all 2^k): an ARBITRARY
    * set list, here the two single-column marginals plus the grand total,
    * with `grouping_id()` disambiguating which set produced each row
    * (standard-SQL bit encoding, so the oracle's GROUPING(a, b) matches
    * bit for bit). Same single-shuffle Expand shape as rollup/cube.
    */
  def groupingSetsSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        (sum(cents(col("l_quantity"))).cast("double") / 100.0).as("sum_qty"),
        count(lit(1)).as("n"))

  /** FULL OUTER join + per-customer order counts: customers with no
    * orders surface with n_orders = 0 (count of a column skips its
    * nulls), order rows with no matching customer would surface with a
    * null name — the outer-join contract inner/semi/anti don't cover.
    * Outer joins shuffle both sides on the key like any equi-join; the
    * planner just cannot broadcast the preserved side(s).
    */
  def customerOrderCoverage(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "full_outer")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        (sum(coalesce(cents(col("o_totalprice")), lit(0L))).cast("double") / 100.0)
          .as("total_spend"))

  /** Ranking window: per-customer top-3 orders by price. The window sort is
    * per-partition (custkey) — no global sort, scales with the largest
    * single customer, not the table.
    */
  def topOrdersPerCustomer(orders: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), row_number().over(w).as("rn"))
      .where(col("rn") <= k)
  }

  /** Analytic window with a sliding frame: 4-row moving average of order
    * totals per customer in date order.
    *
    * Computed over exact integer cents, not `avg(double)`: sliding-window
    * aggregation order differs across engines (Spark recomputes the frame,
    * DuckDB uses segment trees), so double summation is not reproducible at
    * the rounding boundary. Integer sum → one double division is bit-exact
    * everywhere, at any partitioning.
    */
  def movingAvgOrderValue(orders: DataFrame): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(-3, Window.currentRow)
    orders.select(
      col("o_custkey"), col("o_orderkey"),
      (sum(cents(col("o_totalprice"))).over(w).cast("double")
        / count(lit(1)).over(w) / 100.0).as("mavg"))
  }

  /** Time window for [[trailingSpend]], interpolated into the oracle. */
  val TrailingDays = 7

  /** Analytic window with a RANGE (value-based) frame — the complement of
    * [[movingAvgOrderValue]]'s ROWS frame: each order's trailing
    * [[TrailingDays]]-day spend for its customer, frame bounds in exact
    * epoch micros so peers and boundaries agree across engines. RANGE
    * frames are what time-decayed features actually need (a ROWS frame
    * silently changes meaning with event density); rows at the same
    * timestamp are peers and include each other on both engines.
    */
  def trailingSpend(orders: DataFrame): DataFrame = {
    val us = unix_micros(col("o_orderdate").cast("timestamp"))
    val w = Window.partitionBy("o_custkey").orderBy(us)
      .rangeBetween(-TrailingDays.toLong * 86400000000L, 0L)
    orders.select(
      col("o_custkey"), col("o_orderkey"),
      (sum(cents(col("o_totalprice"))).over(w).cast("double") / 100.0)
        .as("trailing_spend"))
  }

  /** Set operations: INTERSECT / EXCEPT branches tagged and unioned. */
  def customerSetOps(customer: DataFrame, orders: DataFrame): DataFrame = {
    val building = customer.where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val withOrders = orders.select(col("o_custkey").as("custkey"))
    building.intersect(withOrders).select(lit("both").as("tag"), col("custkey"))
      .unionAll(building.except(withOrders).select(lit("cust_only").as("tag"), col("custkey")))
  }

  /** Left-semi join: customers having at least one URGENT order.
    * Semi joins shuffle only the distinct keys of the probe side.
    */
  def customersWithUrgentOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(
        orders.where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"),
        "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))

  /** Left-anti join: customers with no URGENT orders. */
  def customersWithoutUrgentOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(
        orders.where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"),
        "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))

  /** Scalar function surface: date parts, string ops, math — all codegen'd
    * builtins, no UDFs (SURVEY §2.2 "scalar functions").
    */
  def scalarShowcase(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dom"),
      substring(col("o_orderpriority"), 1, 1).as("pri"),
      concat(col("o_orderstatus"), lit("-"), upper(col("o_orderpriority"))).as("tag"),
      // raw doubles, no round(): fractional rounding of an irrational is
      // half-way-point flaky across engines (see cents() above); the
      // compare harness canonicalizes floats itself
      sqrt(col("o_totalprice")).as("sqrt_price"),
      log(col("o_totalprice") + 1).as("ln_price"),
      (col("o_orderkey") % 7).as("mod7"))

  /** Relative-error margin for the HLL++ band checks (3× the requested
    * rsd) and rank-fraction margin for the percentile_approx band checks
    * (5× the 1/accuracy guarantee) — interpolated into nothing; the oracle
    * only sees the resulting booleans.
    */
  val SketchRsdMargin = 3.0
  val SketchPctAccuracy = 10000
  val SketchPctMargin = 5.0 / SketchPctAccuracy

  /** Deterministic hash-sample for [[sketchSummary]]'s percentile rail:
    * rows with md5₆₀(seed : orderkey|linenumber) ≡ 0 (mod 16) — a fixed
    * 1/16 of the fact, chosen by content so it is identical across
    * partitionings, engines, and re-runs. The binomial z-score below sets
    * the rank slack the sample's empirical CDF is allowed around the
    * sketch's target rank: ±(5/accuracy + z·√(p(1−p)/n_sample)).
    */
  val SketchSampleMod = 16L
  val SketchSampleSeed = 29
  val SketchSampleZ = 5.0

  /** Minimum per-group sample size for the percentile rank rail to count
    * as CHECKED. Below this, the z-slack is so wide the band is close to
    * vacuous (at n_s < ~7 the p50 slack alone exceeds 1.0), so
    * [[sketchSummary]] reports `pct_rail_checked = false` instead of
    * letting a vacuous TRUE masquerade as a verified bound. The oracle
    * replays the exact same deterministic 1/16 sample count in DuckDB,
    * so this column is hash-checked, not asserted.
    */
  val SketchRailMinN = 100L

  /** Sketch aggregates — the fixed-size-state approximations that replace
    * exact distinct/percentile at 100 TB: HyperLogLog++ distinct counts
    * (`approx_count_distinct`, mergeable across partitions, ~few KB of
    * state vs a hash table of every key) and quantile sketches
    * (`approx_percentile`). The raw estimates are deterministic per input
    * but NOT engine-portable (DuckDB's HLL/quantile sketches differ), so
    * the oracle-facing form is a TOLERANCE BAND made hashable: alongside
    * the exact counts, emit one boolean per approximation asserting it
    * sits inside its error band. The oracle replays the exact columns and
    * literal TRUEs — a hash match IS the bounds check, run by the driver
    * instead of only by SketchSpec.
    *
    * Plan shape (r13 rewrite — this was the suite's worst absolute cost):
    * three narrow scans joined on the 3-row group key, instead of one
    * groupBy holding everything. The old single-agg form paid twice: the
    * two `countDistinct`s force Catalyst's Expand rewrite, which allocates
    * the percentile/HLL `TypedImperativeAggregate` buffers once per
    * (group × distinct-key) intermediate row — hundreds of thousands of
    * empty QuantileSummaries/OpenHashMap objects — and the exact
    * `percentile` rail built a value-count map over ALL of
    * `l_extendedprice` (the genuine 100 TB memory hazard; 266 s at sf1).
    * Now: (1) exact distinct counts alone (Expand with plain longs only);
    * (2) the sketches alone (3 groups → 3 buffers); (3) the percentile
    * band as an EMPIRICAL-CDF RANK CHECK on a deterministic 1/16 hash
    * sample — count how many sampled prices fall below the sketch's
    * estimate and require that rank fraction within
    * ±(5/accuracy + z·√(p(1−p)/n_s)) of the target rank, tie-robust via
    * the [strictly-below, at-or-below] interval. No value-count map
    * exists anywhere; every aggregation state is fixed-size, and the rank
    * band TIGHTENS as n grows (√n) while the cost stays one cheap
    * filtered scan — the correct 100 TB shape for an error rail.
    * Column set and values are unchanged from the pre-r13 form, so the
    * DuckDB oracle row is untouched.
    */
  def sketchSummary(lineitem: DataFrame, rsd: Double = 0.02): DataFrame = {
    val exactCounts = lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n_rows"))
    val approx = lineitem
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), rsd).as("approx_parts"),
        percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.99)), lit(SketchPctAccuracy)).as("pa"))
    val sampled = lineitem
      .filter(pmod(graft.functions.HashFunctions.md5Long(
        concat_ws("|", col("l_orderkey"), col("l_linenumber")), SketchSampleSeed),
        lit(SketchSampleMod)) === 0)
      .select(col("l_returnflag"), col("l_extendedprice"))
    // rank of each sketch estimate within the sample: [below, at-or-below]
    // brackets make the check exact under ties. Only the percentile
    // array rides into the rail — the HLL estimates do not depend on
    // the sample at all, so they are checked directly against
    // exactCounts below instead of being degraded through this join.
    val rail = sampled
      .join(broadcast(approx.select(col("l_returnflag"), col("pa"))),
        Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_s"),
        sum(when(col("l_extendedprice") < element_at(col("pa"), 1), 1L)
          .otherwise(0L)).as("below50"),
        sum(when(col("l_extendedprice") <= element_at(col("pa"), 1), 1L)
          .otherwise(0L)).as("ale50"),
        sum(when(col("l_extendedprice") < element_at(col("pa"), 2), 1L)
          .otherwise(0L)).as("below99"),
        sum(when(col("l_extendedprice") <= element_at(col("pa"), 2), 1L)
          .otherwise(0L)).as("ale99"))
    def inBand(p: Double, below: Column, atOrBelow: Column): Column = {
      val slack = lit(SketchPctMargin) +
        lit(SketchSampleZ) * sqrt(lit(p * (1 - p)) / col("n_s"))
      below / col("n_s") <= lit(p) + slack &&
        atOrBelow / col("n_s") >= lit(p) - slack
    }
    // The HLL bands come from an INNER join of the two full-scan
    // aggregates (identical group sets by construction) — no sample
    // dependency, no coalesce. The percentile bands still LEFT-join the
    // rail: a group the 1/16 sample misses entirely (possible only on
    // sub-16-row spec fixtures; deterministic, so never at data scale)
    // passes vacuously — and `pct_rail_checked` makes that vacuous pass
    // VISIBLE: it is true only when the group's sample reached
    // [[SketchRailMinN]], replayed exactly by the oracle's own count of
    // the same deterministic sample.
    exactCounts
      .join(broadcast(approx.drop("pa")), Seq("l_returnflag"))
      .join(broadcast(rail), Seq("l_returnflag"), "left")
      .select(
        col("l_returnflag"), col("exact_orders"), col("exact_parts"), col("n_rows"),
        (abs(col("approx_orders") - col("exact_orders"))
          <= lit(SketchRsdMargin * rsd) * col("exact_orders"))
          .as("hll_orders_in_band"),
        (abs(col("approx_parts") - col("exact_parts"))
          <= lit(SketchRsdMargin * rsd) * col("exact_parts"))
          .as("hll_parts_in_band"),
        coalesce(inBand(0.5, col("below50"), col("ale50")), lit(true))
          .as("p50_in_band"),
        coalesce(inBand(0.99, col("below99"), col("ale99")), lit(true))
          .as("p99_in_band"),
        coalesce(col("n_s") >= lit(SketchRailMinN), lit(false))
          .as("pct_rail_checked"))
  }

  /** Global top-k over a computed measure — TakeOrderedAndProject again,
    * the distributed generalization of the reference's master-side sort+k
    * (reference `master/master.go:294-311`).
    */
  def topRevenueLineitems(lineitem: DataFrame, k: Int = 20): DataFrame =
    lineitem
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (discPriceUnits.cast("double") / 10000.0).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(k)

  // ----- the final six TPC-H shapes (q9, q11, q12, q16, q20), adapted to
  // this schema like q2/q21 before them: no partsupp table, so supply cost
  // = p_retailprice, availability = shipment history, and the complaint
  // filter = negative account balance. All money/quantity comparisons in
  // exact integer cents.

  /** Part-name prefix for [[productTypeProfit]], interpolated into the oracle. */
  val ProfitNamePrefix = "red"

  /** TPC-H Q9-style product-type profit: the widest star join in the
    * suite — lineitem against FOUR broadcast dims (filtered part with its
    * per-unit cost, supplier, nation) plus the orders fact for the year
    * axis, rolled up per (nation, order year). This schema has no
    * partsupp, so a part's per-unit supply cost is its `p_retailprice`
    * (the axis TPC-H's own generator derives ps_supplycost from);
    * profit = Σ (discounted price − cost·quantity) in exact 1e-4-dollar
    * integer units, one double division at the end.
    *
    * Plan shape: every dimension broadcasts (part slice, supplier,
    * nation); the only shuffles are the lineitem ⋈ orders fact join on
    * orderkey and the final ~(nations × years)-group aggregate — at 100 TB
    * both facts would be bucketed on orderkey and the join shuffle
    * disappears too.
    */
  def productTypeProfit(
      nation: DataFrame, supplier: DataFrame, part: DataFrame,
      orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.where(col("p_name").like(s"$ProfitNamePrefix%"))
        .select(col("p_partkey"), cents(col("p_retailprice")).as("cost_c"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg((sum(discPriceUnits - col("cost_c") * cents(col("l_quantity")))
        .cast("double") / 10000.0).as("sum_profit"))

  /** Supplier nation and threshold denominator for [[importantParts]]:
    * a part qualifies when its value exceeds 1/[[ImportantDen]] of the
    * nation's total (TPC-H q11's FRACTION, scaled to this data size).
    */
  val ImportantNation = "NATION_7"
  val ImportantDen = 1000L

  /** TPC-H Q11-style important stock: a grouped aggregate compared against
    * a GLOBAL scalar aggregate of the same view. A part's "stock value"
    * for one nation's suppliers is the extended price those suppliers
    * shipped of it (no partsupp — shipment history is the availability
    * record). The per-part view is computed ONCE (localCheckpoint) and
    * consumed twice: summed into the 1-row global total (broadcast back —
    * the q15/n_docs pattern), and filtered by the threshold with the
    * fraction CROSS-MULTIPLIED into exact integers (value·den > total, the
    * q17/q22 trick) so the qualifying set is bit-identical across engines.
    */
  def importantParts(
      nation: DataFrame, supplier: DataFrame, lineitem: DataFrame): DataFrame = {
    val natSup = broadcast(
      nation.where(col("n_name") === ImportantNation)
        .join(supplier, col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey")))
    val vals = lineitem
      .join(natSup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("value_c"))
      .localCheckpoint() // consumed by the global total AND the filter
    val total = vals.agg(sum(col("value_c")).as("total_c"))
    vals.crossJoin(broadcast(total))
      .where(col("value_c") * ImportantDen > col("total_c"))
      .select(col("l_partkey").as("p_partkey"),
        (col("value_c").cast("double") / 100.0).as("value"))
  }

  /** Ship window + lag band (days) for [[shippingLagPriority]],
    * interpolated into the oracle.
    */
  val LagStart = "1996-01-01"
  val LagEnd = "1997-01-01"
  val LagMinDays = 30
  val LagMaxDays = 90

  /** TPC-H Q12-style shipmode/priority split: one orders ⋈ lineitem join,
    * a cross-table date-arithmetic band, and TWO conditional counts per
    * tiny group. This schema has no l_shipmode/commit/receipt dates, so
    * the band is the ship LAG (shipped [[LagMinDays]], [[LagMaxDays]])
    * days after ordering — q4/q21's lateness axis) and the group key is
    * l_returnflag; the high/low split on o_orderpriority is q12's
    * verbatim. Lag compares exact epoch micros; the counts are exact
    * longs — hash-stable with no float anywhere.
    */
  def shippingLagPriority(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val lagUs = unix_micros(col("l_shipdate").cast("timestamp")) -
      unix_micros(col("o_orderdate").cast("timestamp"))
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .where(col("l_shipdate") >= to_timestamp(lit(LagStart)) &&
        col("l_shipdate") < to_timestamp(lit(LagEnd)))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .where(lagUs >= lit(LagMinDays.toLong * 86400000000L) &&
        lagUs < lit(LagMaxDays.toLong * 86400000000L))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** Brand/type/size slice for [[partSupplierCounts]], interpolated into
    * the oracle.
    */
  val PscExcludeBrand = "Brand#13"
  val PscExcludeType = "PROMO"
  val PscSizes: Seq[Int] = Seq(1, 4, 9, 16, 25, 36, 49)

  /** TPC-H Q16-style supplier counts per part slice: a DISTINCT aggregate
    * over an anti-joined pair set. The (part, supplier) offer pairs come
    * from distinct lineitem pairs (no partsupp); the NOT IN exclusion —
    * TPC-H's complaint suppliers — is suppliers with negative account
    * balance, planned as a broadcast LEFT ANTI join (suppkeys are non-null
    * so NOT IN ≡ anti join; the oracle keeps the literal NOT IN form).
    * count(DISTINCT suppkey) per (brand, type, size) is a two-phase
    * distinct-agg: Catalyst expands to a (keys, suppkey) dedup then a
    * count — both map-side-combined hash aggs.
    */
  def partSupplierCounts(
      supplier: DataFrame, part: DataFrame, lineitem: DataFrame): DataFrame = {
    val excluded = supplier.where(col("s_acctbal") < 0).select(col("s_suppkey"))
    val slice = part
      .where(col("p_brand") =!= PscExcludeBrand &&
        !col("p_type").like(s"$PscExcludeType%") &&
        col("p_size").isin(PscSizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(slice), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Nation, part-name prefix, and surge year for [[excessStockSuppliers]],
    * interpolated into the oracle.
    */
  val ExcessNation = "NATION_3"
  val ExcessNamePrefix = "blue"
  val ExcessYearStart = "1996-01-01"
  val ExcessYearEnd = "1997-01-01"

  /** TPC-H Q20-style excess stock: the hardest remaining decorrelation —
    * a correlated aggregate inside a semi join ("suppliers who moved more
    * than half of a part's lifetime volume in one year"; without
    * ps_availqty the stock axis is shipment history). The textbook form
    * correlates `(SELECT sum(qty) ... WHERE same supplier AND same part
    * AND in-year)` against each (supplier, part) pair; here BOTH the
    * correlated year sum and the lifetime sum decorrelate into ONE keyed
    * hash aggregate with conditional sums (map-side combined, single
    * shuffle on (suppkey, partkey)) — no per-row subquery, no BNLJ
    * anywhere (PlanSpec's suite-wide lock). The half-threshold compares
    * exact integer centi-quantities cross-multiplied by 2. Qualifying
    * suppkeys semi-join INTO the supplier dim, restricted to one nation
    * (broadcast), ordered by name.
    */
  def excessStockSuppliers(
      nation: DataFrame, supplier: DataFrame, part: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val namedParts = broadcast(
      part.where(col("p_name").like(s"$ExcessNamePrefix%")).select(col("p_partkey")))
    val inYear = col("l_shipdate") >= to_timestamp(lit(ExcessYearStart)) &&
      col("l_shipdate") < to_timestamp(lit(ExcessYearEnd))
    val movers = lineitem
      .join(namedParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(
        sum(when(inYear, cents(col("l_quantity"))).otherwise(0L)).as("year_qc"),
        sum(cents(col("l_quantity"))).as("total_qc"))
      .where(col("year_qc") * 2 > col("total_qc"))
      .select(col("l_suppkey"))
    supplier
      .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(nation.where(col("n_name") === ExcessNation)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(asc("s_name"))
  }
}
