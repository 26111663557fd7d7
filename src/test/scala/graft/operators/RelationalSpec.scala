package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the relational shapes whose interesting branches the
  * driver data cannot reach: the testdata has no orderless customers and
  * no orphan orders, so the full-outer contract needs synthetic rows.
  */
class RelationalSpec extends SparkSpec {

  test("full outer coverage: orderless customers and orphan orders both survive") {
    import spark.implicits._
    val customer = Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
    val orders = Seq(
      (10L, 1L, 25.50), (11L, 1L, 10.00), // customer 1 has two orders
      (12L, 99L, 5.25)                    // orphan: no such customer
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val got = Relational.customerOrderCoverage(customer, orders)
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got === Set(
      (1L, 2L, 35.50),  // joined rows aggregate normally
      (2L, 0L, 0.0),    // preserved left side: zero orders, zero spend
      (-1L, 1L, 5.25))) // preserved right side groups under the null key
  }

  test("disjunctiveRevenue: only rows inside one OR branch count") {
    import spark.implicits._
    val part = Seq(
      (1L, "Brand#12", 3),  // in branch 1's size window
      (2L, "Brand#23", 8),  // in branch 2's size window
      (3L, "Brand#12", 20), // size outside every window for its brand
      (4L, "Brand#55", 1)   // brand outside every branch
    ).toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      (1L, 5.0, 100.0, 0.10),  // branch 1: qty 5 in [1,11]  -> counted
      (1L, 15.0, 100.0, 0.10), // qty 15 outside [1,11]      -> dropped
      (2L, 12.0, 200.0, 0.00), // branch 2: qty 12 in [10,20] -> counted
      (3L, 5.0, 999.0, 0.00),  // part size disqualifies      -> dropped
      (4L, 5.0, 999.0, 0.00)   // brand disqualifies          -> dropped
    ).toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val r = Relational.disjunctiveRevenue(li, part).collect().head
    assert(r.getLong(1) === 2L)
    assert(r.getDouble(0) === (100.0 * 0.90) + 200.0)
  }

  test("histogramQuantiles: estimate brackets the exact quantile within one bucket") {
    import spark.implicits._
    // two groups with different spreads; values are exact cents/100
    val xs = (1 to 100).map(i => ("A", i.toDouble)) ++
      (1 to 37).map(i => ("B", 1000.0 + 7.5 * i))
    val df = xs.toDF("o_orderpriority", "o_totalprice")
    val rows = Relational.histogramQuantiles(df, buckets = 10, pcts = Seq(50, 90))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(4)))
      .toMap
    assert(rows.keySet === Set(("A", 50), ("A", 90), ("B", 50), ("B", 90)))
    for (((grp, pct), (n, estCents)) <- rows) {
      val sorted = xs.filter(_._1 == grp).map(t => math.round(t._2 * 100)).sorted
      assert(n === sorted.length)
      val exact = sorted(((pct * n + 99) / 100 - 1).toInt) // ceil-rank order statistic
      val width = (sorted.last - sorted.head + 1) / 10 + 1
      assert(estCents <= exact, s"$grp p$pct: lower bound $estCents above exact $exact")
      assert(exact <= estCents + width, s"$grp p$pct: exact $exact beyond $estCents + $width")
    }
  }

  test("cube emits all four grouping combinations; marginals sum to the total") {
    import spark.implicits._
    val li = Seq(
      ("A", "F", 2.0), ("A", "O", 3.0), ("B", "F", 5.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val rows = Relational.cubeSummary(li).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getDouble(2), r.getLong(3)))
    // 2x2 detail cells collapse to 3 present combos + 2 flag subtotals +
    // 2 status subtotals + 1 grand total = 8 rows (rollup would emit 6)
    assert(rows.length === 8)
    val byKey = rows.map(t => (t._1, t._2) -> t._3).toMap
    assert(byKey((None, None)) === 10.0)
    assert(byKey((Some("A"), None)) === 5.0)
    assert(byKey((None, Some("F"))) === 7.0) // the marginal rollup lacks
  }

  test("trailingSpend: RANGE frame is value-based — peers included, gaps excluded") {
    import spark.implicits._
    val orders = Seq(
      (1L, 1L, 100.0, "2024-01-01"),
      (2L, 1L, 50.0, "2024-01-05"),  // within 7 days of #1
      (3L, 1L, 25.0, "2024-01-20"),  // a 15-day gap: frame restarts
      (4L, 1L, 10.0, "2024-01-20"),  // same ts as #3: peers include each other
      (5L, 2L, 7.0, "2024-01-01")
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val got = Relational.trailingSpend(orders).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got === Map(
      1L -> 100.0, 2L -> 150.0,
      3L -> 35.0, 4L -> 35.0, // value-based frame: both peers see both rows
      5L -> 7.0))
  }

  test("upsertLatestOrders: latest change wins; unmatched keys keep the sentinel") {
    import spark.implicits._
    val customer = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, "3-MEDIUM", "F", "2024-01-01"),
      (11L, 1L, "1-URGENT", "O", "2024-02-01"), // later date wins
      (12L, 1L, "5-LOW", "P", "2024-02-01")     // same date: higher orderkey wins
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val got = Relational.upsertLatestOrders(customer, orders)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getString(3), r.getLong(4))))
      .toMap
    assert(got(1L) === (("5-LOW", "P", 3L)))
    assert(got(2L) === (("NONE", "NONE", 0L)))
  }

  test("scd2OrderHistory: contiguous validity chain with one current version per key") {
    import spark.implicits._
    val orders = Seq(
      (10L, 1L, "A", "2024-01-01"), (11L, 1L, "B", "2024-02-01"), (12L, 1L, "C", "2024-03-01"),
      (20L, 2L, "X", "2024-01-15")
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val rows = Relational.scd2OrderHistory(orders).collect()
      .map(r => (r.getLong(0), r.getInt(4)) ->
        ((r.getString(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(5))))
      .toMap
    // versions are chained: each valid_to equals the next version's valid_from
    assert(rows((1L, 1))._1 === "A")
    assert(rows((1L, 1))._3 === Some(rows((1L, 2))._2))
    assert(rows((1L, 2))._3 === Some(rows((1L, 3))._2))
    assert(rows((1L, 3))._3 === None)
    assert(rows.collect { case ((1L, _), v) if v._4 => v._1 } === Seq("C"))
    assert(rows((2L, 1))._4 === true)
  }

  test("latePriorityOrders: EXISTS counts each order once, regardless of match count") {
    import spark.implicits._
    val d0 = "2024-01-10"
    val orders = Seq(
      (1L, "1-URGENT", d0), // two late lineitems -> still one order
      (2L, "1-URGENT", d0), // one on-time lineitem only -> excluded
      (3L, "2-HIGH", d0),   // one late lineitem
      (4L, "2-HIGH", d0)    // no lineitems at all -> excluded
    ).toDF("o_orderkey", "o_orderpriority", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val li = Seq(
      (1L, "2024-01-15"), (1L, "2024-01-20"),
      (2L, "2024-01-10"), // equal ts is NOT strictly after
      (3L, "2024-02-01")
    ).toDF("l_orderkey", "sd")
      .withColumn("l_shipdate", to_timestamp(col("sd"))).drop("sd")
    val got = Relational.latePriorityOrders(orders, li)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("1-URGENT" -> 1L, "2-HIGH" -> 1L))
  }

  test("customerOrderDistribution: zero-order customers land in the N=0 bucket") {
    import spark.implicits._
    val customer = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
    val got = Relational.customerOrderDistribution(customer, orders)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  test("smallQuantityRevenue: cross-multiplied threshold equals the brute-force average rule") {
    import spark.implicits._
    val part = Seq((1L, "Brand#23"), (2L, "Brand#23"), (3L, "Brand#99"))
      .toDF("p_partkey", "p_brand")
    // part 1: quantities 2,10,12 -> avg 8, half = 4: only qty 2 qualifies
    // part 2: single lineitem can never be below half its own average
    // part 3: wrong brand, never counted
    val li = Seq(
      (1L, 2.0, 100.0), (1L, 10.0, 200.0), (1L, 12.0, 300.0),
      (2L, 1.0, 500.0),
      (3L, 0.5, 900.0)
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val r = Relational.smallQuantityRevenue(li, part).collect().head
    assert(r.getDouble(0) === 100.0)
    assert(r.getLong(1) === 1L)
  }

  test("volumeShipping flows both directions; marketShare stays a valid fraction") {
    import graft.Tables
    // sf0.01: the nation-pair x date-window slice is empty at sf0.001
    val dir = sf("sf0.01")
    val v = Relational.volumeShipping(
      Tables.nation(spark, dir), Tables.customer(spark, dir),
      Tables.supplier(spark, dir), Tables.orders(spark, dir),
      Tables.lineitem(spark, dir)).collect()
    assert(v.nonEmpty)
    val pairs = v.map(r => (r.getString(0), r.getString(1))).toSet
    val (a, b) = (Relational.VolShipNationA, Relational.VolShipNationB)
    assert(pairs.subsetOf(Set((a, b), (b, a))))
    assert(pairs.size === 2, s"only one direction present: $pairs")
    val m = Relational.marketShare(
      Tables.region(spark, dir), Tables.nation(spark, dir),
      Tables.customer(spark, dir), Tables.supplier(spark, dir),
      Tables.part(spark, dir), Tables.orders(spark, dir),
      Tables.lineitem(spark, dir)).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0, s"share $share out of range")
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("groupingSetsSummary: exactly the requested sets; marginals sum to the grand total") {
    import spark.implicits._
    val li = Seq(
      ("A", "F", 1.0), ("A", "O", 2.0), ("R", "F", 3.0), ("R", "F", 4.0)
    ).toDF("l_returnflag", "l_linestatus", "l_quantity")
    val rows = Relational.groupingSetsSummary(li).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getDouble(3), r.getLong(4)))
    // sets: per-returnflag (gid 1: linestatus aggregated), per-linestatus
    // (gid 2), grand total (gid 3) — no (flag, status) detail rows
    assert(rows.map(_._3).toSet === Set(1L, 2L, 3L))
    val total = rows.filter(_._3 == 3L)
    assert(total === Array((None, None, 3L, 10.0, 4L)))
    assert(rows.filter(_._3 == 1L).map(_._4).sum === 10.0)
    assert(rows.filter(_._3 == 2L).map(_._4).sum === 10.0)
  }

  test("waitingSuppliers equals the brute-force EXISTS/NOT-EXISTS evaluation") {
    import spark.implicits._
    // deterministic fixture: 6 orders x up to 3 suppliers, lateness varied;
    // the brute-force reference evaluates the two correlated predicates
    // literally over the collected rows
    val rnd = new scala.util.Random(7)
    val supplier = (1L to 4L).map(k => (k, s"S#$k")).toDF("s_suppkey", "s_name")
    val orders = (1L to 12L).map { k =>
      (k, if (k % 3 == 0) "O" else "F", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("o_orderkey", "o_orderstatus", "o_orderdate")
    val liRows = (1L to 12L).flatMap { ok =>
      (1L to (1 + rnd.nextInt(3))).map { sk =>
        val daysAfter = rnd.nextInt(200) // late iff > WaitingLateDays (90)
        (ok, sk, java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(daysAfter)
            .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))))
      }
    }
    val li = liRows.toDF("l_orderkey", "l_suppkey", "l_shipdate")
    // brute force
    val fOrders = (1L to 12L).filter(_ % 3 != 0).toSet
    def lateRow(r: (Long, Long, java.sql.Timestamp)): Boolean =
      fOrders.contains(r._1) &&
        r._3.getTime > java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
          Relational.WaitingLateDays.toLong * 86400000L
    val lateSet = liRows.filter(lateRow)
    val expected = lateSet
      .filter(l1 => liRows.exists(l2 => l2._1 == l1._1 && l2._2 != l1._2))
      .filter(l1 => !lateSet.exists(l3 => l3._1 == l1._1 && l3._2 != l1._2))
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
      .map { case (sk, n) => s"S#$sk" -> n }
    val got = Relational.waitingSuppliers(supplier, orders, li)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected, s"got $got expected $expected")
    assert(expected.nonEmpty, "fixture produced no waiting suppliers — widen it")
  }

  test("topRevenueSupplier returns every supplier tied at the window max") {
    import spark.implicits._
    val supplier = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("s_suppkey", "s_name")
    val inWin = java.sql.Timestamp.valueOf("1996-02-01 00:00:00")
    val outWin = java.sql.Timestamp.valueOf("1997-02-01 00:00:00")
    val li = Seq(
      (1L, 100.0, 0.0, inWin), // supplier 1: 100 in window
      (2L, 60.0, 0.0, inWin), (2L, 40.0, 0.0, inWin), // supplier 2: 100, tied
      (3L, 500.0, 0.0, outWin) // outside the window: ignored
    ).toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val got = Relational.topRevenueSupplier(supplier, li)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1L, "A", 100.0), (2L, "B", 100.0)))
  }

  test("minCostSuppliers: only region suppliers compete; all min-cost ties returned") {
    import spark.implicits._
    val region = Seq((0, "EUROPE"), (1, "ASIA")).toDF("r_regionkey", "r_name")
    val nation = Seq((10, "N_EU", 0), (11, "N_AS", 1)).toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((1L, "EU1", 10), (2L, "EU2", 10), (3L, "AS1", 11))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val part = Seq((100L, Relational.MinCostSize), (200L, 99)).toDF("p_partkey", "p_size")
    val li = Seq(
      (100L, 1L, 10.0, 2.0),  // unit cost 5.0
      (100L, 2L, 10.0, 2.0),  // unit cost 5.0 — tie, both returned
      (100L, 2L, 30.0, 2.0),  // unit cost 15 — not the min
      (100L, 3L, 1.0, 2.0),   // cheapest but ASIA — out of region
      (200L, 1L, 1.0, 1.0)    // wrong size part
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val got = Relational.minCostSuppliers(region, nation, supplier, part, li)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(4))).toSet
    assert(got === Set((100L, "EU1", 5.0), (100L, "EU2", 5.0)))
  }

  test("dormantRichCustomers: above positive-average balance AND no recent order") {
    import spark.implicits._
    // positive balances: 10, 20, 60 -> avg 30; negative balance excluded
    // from the average but also can never pass the > avg test
    val customer = Seq(
      (1L, 10.0, 7), (2L, 20.0, 7), (3L, 60.0, 8), (4L, -5.0, 8), (5L, 40.0, 9)
    ).toDF("c_custkey", "c_acctbal", "c_nationkey")
    val orders = Seq(
      (100L, 3L, "2024-06-01"), // recent: cust 3 is active
      (101L, 5L, "2020-01-01")  // ancient: cust 5 is dormant despite ordering
    ).toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    // candidates > 30: cust 3 (60, recent order -> dropped), cust 5 (40, kept)
    val got = Relational.dormantRichCustomers(customer, orders)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((9, 1L, 40.0)))
  }

  test("excessStockSuppliers equals the brute-force correlated evaluation") {
    import spark.implicits._
    // randomized fixture, literal correlated-subquery evaluation as the
    // reference: for each (supplier, part-with-prefix) pair, the in-year
    // quantity sum must exceed half the lifetime sum; suppliers with any
    // qualifying pair and the right nation survive
    val nation = Seq((0, Relational.ExcessNation), (1, "NATION_OTHER"))
      .toDF("n_nationkey", "n_name")
    // suppliers 2, 4, 6 are in the target nation; 1 is not
    val supplier = Seq((1L, 1), (2L, 0), (4L, 0), (6L, 0))
      .map { case (k, n) => (k, s"S#$k", n) }
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val part = Seq(
      (1L, s"${Relational.ExcessNamePrefix} thing"),
      (2L, s"${Relational.ExcessNamePrefix} gadget"),
      (3L, "red thing")) // outside the name slice
      .toDF("p_partkey", "p_name")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val liRows = Seq(
      // supplier 2, part 1: 10 of 13 units in 1996 -> qualifies
      (2L, 1L, 10.0, ts("1996-06-01 00:00:00")),
      (2L, 1L, 3.0, ts("1997-06-01 00:00:00")),
      // supplier 4, part 1: 2 of 10 in 1996 -> no; part 2: all outside -> no
      (4L, 1L, 2.0, ts("1996-06-01 00:00:00")),
      (4L, 1L, 8.0, ts("1995-06-01 00:00:00")),
      (4L, 2L, 9.0, ts("1997-06-01 00:00:00")),
      // supplier 1 qualifies on volume but is in the wrong nation
      (1L, 2L, 5.0, ts("1996-06-01 00:00:00")),
      // supplier 6 moved everything in-year but only of a non-slice part
      (6L, 3L, 7.0, ts("1996-06-01 00:00:00")))
    val li = liRows.zipWithIndex.map { case ((sk, pk, q, t), i) => (i.toLong, sk, pk, q, t) }
      .toDF("l_orderkey", "l_suppkey", "l_partkey", "l_quantity", "l_shipdate")
    // literal correlated evaluation as the reference
    val prefixed = Set(1L, 2L)
    def centsOf(q: Double) = math.round(q * 100)
    val qualifies = (for {
      sk <- Seq(1L, 2L, 4L, 6L)
      pk <- prefixed
      shipped = liRows.filter(r => r._1 == sk && r._2 == pk)
      if shipped.nonEmpty
      yearQ = shipped.filter(_._4.toString.startsWith("1996")).map(r => centsOf(r._3)).sum
      totQ = shipped.map(r => centsOf(r._3)).sum
      if yearQ * 2 > totQ
    } yield sk).toSet
    val expected = Seq(2L, 4L, 6L).filter(qualifies).map(k => (k, s"S#$k")).toSet
    val got = Relational.excessStockSuppliers(nation, supplier, part, li)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === expected, s"got $got expected $expected")
    assert(expected === Set((2L, "S#2")), "fixture must be discriminating")
  }

  test("productTypeProfit: profit is disc price minus retail cost, per nation-year") {
    import spark.implicits._
    val nation = Seq((0, "N_A"), (1, "N_B")).toDF("n_nationkey", "n_name")
    val supplier = Seq((1L, 0), (2L, 1)).toDF("s_suppkey", "s_nationkey")
    val part = Seq(
      (1L, s"${Relational.ProfitNamePrefix} bolt", 10.0), // in the slice
      (2L, "green bolt", 10.0) // filtered out by name
    ).toDF("p_partkey", "p_name", "p_retailprice")
    val orders = Seq(
      (100L, "1996-03-01"), (101L, "1997-03-01")
    ).toDF("o_orderkey", "d").withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val li = Seq(
      // 27.00 discounted minus 2x10.00 cost -> 7.00 profit
      (100L, 1L, 1L, 2.0, 30.0, 0.10),
      (101L, 1L, 1L, 1.0, 30.0, 0.0), // 1997: 30 - 10 = 20.00
      (100L, 2L, 1L, 1.0, 30.0, 0.0), // other nation: same 20.00
      (100L, 1L, 2L, 9.0, 90.0, 0.0) // filtered part: no contribution
    ).toDF("l_orderkey", "l_suppkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val got = Relational.productTypeProfit(nation, supplier, part, orders, li)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got === Set(("N_A", 1996, 7.0), ("N_A", 1997, 20.0), ("N_B", 1996, 20.0)))
  }

  test("importantParts: threshold is strict and cross-multiplied exactly") {
    import spark.implicits._
    val nation = Seq((0, Relational.ImportantNation), (1, "NATION_OTHER"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((1L, 0), (2L, 1)).toDF("s_suppkey", "s_nationkey")
    // part 1: exactly total/1000 -> excluded (strict >); part 2: above
    // total = 1000.00 -> 100000 cents; threshold value_c * 1000 > 100000
    val li = Seq(
      (1L, 1L, 1.00), // exactly at the boundary: 100 * 1000 == 100000
      (2L, 1L, 995.00),
      (3L, 1L, 4.00), // above: 400 * 1000 > 100000
      (2L, 2L, 1000000.0) // other nation: not counted anywhere
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val got = Relational.importantParts(nation, supplier, li)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((2L, 995.0), (3L, 4.0)),
      "boundary part must be excluded by the strict inequality")
  }

  test("shippingLagPriority: lag band is [min, max) in exact micros") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val orders = Seq(
      (1L, "1-URGENT"), (2L, "5-LOW")
    ).map { case (k, p) => (k, ts("1996-01-01 00:00:00"), p) }
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, "A", ts("1996-01-31 00:00:00")), // lag 30d: included (>=)
      (1L, "A", ts("1996-03-31 00:00:00")), // lag 90d: excluded (<)
      (2L, "A", ts("1996-02-15 00:00:00")), // low priority, in band
      (2L, "R", ts("1996-01-02 00:00:00")) // lag 1d: below band
    ).toDF("l_orderkey", "l_returnflag", "l_shipdate")
    val got = Relational.shippingLagPriority(orders, li)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("A", 1L, 1L)))
  }

  test("partSupplierCounts: distinct pairs, excluded suppliers anti-joined") {
    import spark.implicits._
    val sz = Relational.PscSizes.head
    val supplier = Seq((1L, 100.0), (2L, -5.0), (3L, 50.0))
      .toDF("s_suppkey", "s_acctbal")
    val part = Seq(
      (1L, "Brand#1", "LARGE", sz),
      (2L, Relational.PscExcludeBrand, "LARGE", sz), // excluded brand
      (3L, "Brand#1", s"${Relational.PscExcludeType}X", sz), // excluded type
      (4L, "Brand#1", "LARGE", 9999) // excluded size
    ).toDF("p_partkey", "p_brand", "p_type", "p_size")
    val li = Seq(
      (1L, 1L), (1L, 1L), // duplicate pair counts once
      (1L, 2L), // negative-balance supplier: anti-joined away
      (1L, 3L),
      (2L, 1L), (3L, 1L), (4L, 1L) // all on excluded parts
    ).toDF("l_partkey", "l_suppkey")
    val got = Relational.partSupplierCounts(supplier, part, li)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    assert(got === Set(("Brand#1", "LARGE", sz, 2L)))
  }
}
