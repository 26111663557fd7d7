package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY §2's inventory (and the LLM-pipeline extension
  * surface) is exposed as a named query over the driver's parquet tables,
  * with a DuckDB-equivalent SQL oracle where the semantics are
  * SQL-expressible. Column names/aliases match the oracle exactly (the
  * driver's compare hashes by sorted column name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Relational.shippingPriority(
      Tables.customer(spark, dir), Tables.orders(spark, dir), Tables.lineitem(spark, dir))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference surface: word count + top-k (SURVEY §2.1 #1-13) ---
    "wordcount_topk" -> ((s, dir) =>
      WordCount.topK(WordCount.counts(Tables.documents(s, dir), "text"), 50)),
    "mr_wordcount" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      import s.implicits._
      val input = Tables.documents(s, dir)
        .select($"doc_id".cast("string"), $"text").as[(String, String)]
      MapReduce.wordCountJob(input).toDF("word", "cnt")
    }),
    // --- relational suite (SURVEY §2 generalized; build plan M3) ---
    "q1_pricing_summary" -> ((s, dir) => Relational.pricingSummary(Tables.lineitem(s, dir))),
    "q6_forecast_revenue" -> ((s, dir) => Relational.forecastRevenue(Tables.lineitem(s, dir))),
    "q3_shipping_priority" -> ((s, dir) =>
      Relational.shippingPriority(Tables.customer(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q5_local_supplier" -> ((s, dir) =>
      Relational.localSupplierRevenue(
        Tables.region(s, dir), Tables.nation(s, dir), Tables.customer(s, dir),
        Tables.supplier(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q_distinct_agg" -> ((s, dir) => Relational.distinctCustomers(Tables.orders(s, dir))),
    "q_rollup" -> ((s, dir) => Relational.rollupSummary(Tables.lineitem(s, dir))),
    "q_window_rank" -> ((s, dir) => Relational.topOrdersPerCustomer(Tables.orders(s, dir))),
    "q_window_moving" -> ((s, dir) => Relational.movingAvgOrderValue(Tables.orders(s, dir))),
    "q_setops" -> ((s, dir) => Relational.customerSetOps(Tables.customer(s, dir), Tables.orders(s, dir))),
    "q_semijoin" -> ((s, dir) =>
      Relational.customersWithUrgentOrders(Tables.customer(s, dir), Tables.orders(s, dir))),
    "q_antijoin" -> ((s, dir) =>
      Relational.customersWithoutUrgentOrders(Tables.customer(s, dir), Tables.orders(s, dir))),
    "q_scalar_funcs" -> ((s, dir) => Relational.scalarShowcase(Tables.orders(s, dir))),
    "q_topk_global" -> ((s, dir) => Relational.topRevenueLineitems(Tables.lineitem(s, dir))),
    // --- events: JSON, time buckets, sessionization (build plan M4/M5) ---
    "q_events_json" -> ((s, dir) => EventAnalytics.perTypeStats(Tables.events(s, dir))),
    "q_events_hourly" -> ((s, dir) => EventAnalytics.hourlyStats(Tables.events(s, dir))),
    "q_events_sessions" -> ((s, dir) => EventAnalytics.sessionCounts(Tables.events(s, dir))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "wordcount_topk" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT regexp_replace(lower(unnest(string_split_regex(text, '\s+'))),
        |                        '^[.,!?:;"'']+|[.,!?:;"'']+$', '', 'g') AS word
        |  FROM documents) t
        |WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 50""".stripMargin,
    "mr_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT regexp_replace(lower(unnest(string_split_regex(text, '\s+'))),
        |                        '^[.,!?:;"'']+|[.,!?:;"'']+$', '', 'g') AS word
        |  FROM documents) t
        |WHERE word <> '' GROUP BY word""".stripMargin,
    // Money math in the oracles mirrors the engine exactly: integer-cents
    // sums (order-independent), one double division at the end, no round()
    // — see Relational.cents for why.
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / count(*) / 100.0 AS avg_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / count(*) / 100.0 AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |               * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND o_orderkey = l_orderkey AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
        |FROM region, nation, customer, orders, lineitem, supplier
        |WHERE r_name = 'ASIA' AND r_regionkey = n_regionkey
        |  AND n_nationkey = c_nationkey AND c_custkey = o_custkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND o_orderkey = l_orderkey
        |  AND l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |GROUP BY n_name""".stripMargin,
    "q_distinct_agg" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,
    "q_window_moving" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS DOUBLE)
        |    / count(*) OVER w / 100.0 AS mavg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_setops" ->
      """SELECT 'both' AS tag, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT SELECT o_custkey AS custkey FROM orders)
        |UNION ALL
        |SELECT 'cust_only' AS tag, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT SELECT o_custkey AS custkey FROM orders)""".stripMargin,
    "q_semijoin" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment""".stripMargin,
    "q_antijoin" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  substr(o_orderpriority, 1, 1) AS pri,
        |  o_orderstatus || '-' || upper(o_orderpriority) AS tag,
        |  round(sqrt(o_totalprice), 4) AS sqrt_price,
        |  round(ln(o_totalprice + 1), 4) AS ln_price,
        |  o_orderkey % 7 AS mod7
        |FROM orders""".stripMargin,
    "q_topk_global" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
        |       * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |ORDER BY revenue DESC, l_orderkey ASC, l_linenumber ASC LIMIT 20""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
        |    / count(json_extract_string(props, '$.k')) AS avg_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin,
    "q_events_sessions" ->
      """SELECT user_id,
        |  CAST(1 + sum(CASE WHEN prev_ms IS NOT NULL AND ms - prev_ms > 1800000
        |                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM (
        |  SELECT user_id, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ms
        |  FROM events) t
        |GROUP BY user_id""".stripMargin,
  )
}
