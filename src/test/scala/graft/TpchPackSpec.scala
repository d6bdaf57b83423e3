package graft

import org.apache.spark.sql.functions._

import graft.operators.TpchPack

/** Semantic invariants for the r10 TPC-H completion pack — the driver's
  * DuckDB oracle hash-checks exact values at sf0.01; these pin the
  * CROSS-ROW contracts (partitions sum to totals, argmax sets are
  * uniform, orderings hold) that a value hash alone can't localize when
  * it breaks. */
class TpchPackSpec extends SparkSpec {

  test("q2: per part, every returned supplier attains the same (min) cost") {
    val rows = TpchPack.q2MinCostSupp(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("p_partkey")).values.foreach { g =>
      assert(g.map(_.getAs[Double]("supplycost")).distinct.length === 1)
    }
    rows.foreach(r => assert(r.getAs[Double]("supplycost") > 0))
  }

  // q7/q11 slice on single nations — at sf0.001 (10 suppliers over 25
  // nations) those slices are empty, so these two run on sf0.01 where
  // the populations exist (still sub-second: tiny aggregates).
  private val sfMid = "/root/testdata/sf0.01"

  test("q7: only the two nation pairs, both directions, 1996-1997") {
    val rows = TpchPack.q7VolumeShipping(spark, sfMid).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pair = (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))
      assert(pair == ("NATION_1", "NATION_2") || pair == ("NATION_2", "NATION_1"))
      assert(Set(1996L, 1997L).contains(r.getAs[Long]("l_year")))
    }
  }

  test("q8: market share is a fraction of the total") {
    val rows = TpchPack.q8MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Double]("total_volume") > 0)
    }
  }

  test("q10: top-20 by revenue, descending") {
    val rows = TpchPack.q10ReturnedItems(spark, sf).collect()
    assert(rows.length === 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted.reverse))
  }

  test("q11: every surviving part clears the 0.1% share floor; shares < 1") {
    val rows = TpchPack.q11ImportantStock(spark, sfMid).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      assert(share > 0.0009 && share < 1.0)
    }
  }

  test("q12: high + low line counts partition each bucket") {
    val rows = TpchPack.q12ShipDelay(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")
               === r.getAs[Long]("n_lines"))
    }
    val total = rows.map(_.getAs[Long]("n_lines")).sum
    assert(total === Tables.lineitem(spark, sf).count())
  }

  test("q13: the distribution accounts for every customer exactly once") {
    val rows = TpchPack.q13OrderCountDist(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("custdist")).sum
             === Tables.customer(spark, sf).count())
  }

  test("q14: promo share is a percentage; 12 months of 1996") {
    val rows = TpchPack.q14PromoShare(spark, sf).collect()
    assert(rows.length === 12)
    rows.foreach { r =>
      val s = r.getAs[Double]("promo_share")
      assert(s >= 0.0 && s <= 100.0)
      assert(r.getAs[String]("month").startsWith("1996-"))
    }
  }

  test("q15: every returned supplier ties on the maximum revenue") {
    val rows = TpchPack.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("total_revenue")).distinct.length === 1)
  }

  test("q16: distinct-supplier counts are positive and bounded by |supplier|") {
    val nSupp = Tables.supplier(spark, sf).count()
    val rows = TpchPack.q16SuppPartCnt(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Long]("supplier_cnt")
      assert(c >= 1 && c <= nSupp)
      assert(r.getAs[String]("p_brand") !== "Brand#1")
    }
  }

  test("q17: one row; small-quantity revenue is a strict subset of brand revenue") {
    val rows = TpchPack.q17SmallQty(spark, sf).collect()
    assert(rows.length === 1)
    val brandLines = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#3"),
            col("l_partkey") === col("p_partkey")).count()
    assert(rows(0).getAs[Long]("n_lines") < brandLines)
  }

  test("q18: every order clears the 300-quantity floor, ordered by price") {
    val rows = TpchPack.q18LargeOrders(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("sum_qty") > 300))
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted.reverse))
  }

  test("q19: disjunct revenue equals the sum of the three conjunct branches") {
    import spark.implicits._
    val whole = TpchPack.q19Disjunct(spark, sf).collect()(0)
    // the three conjuncts are mutually exclusive (distinct brands), so
    // their line counts must add up exactly
    val li = Tables.lineitem(spark, sf)
      .join(broadcast(Tables.part(spark, sf)), $"l_partkey" === $"p_partkey")
    def branch(b: String, sizeHi: Int, qLo: Int, qHi: Int): Long =
      li.filter($"p_brand" === b && $"p_size".between(1, sizeHi) &&
                $"l_quantity".between(qLo, qHi)).count()
    val parts = branch("Brand#12", 5, 1, 11) + branch("Brand#23", 10, 10, 20) +
      branch("Brand#4", 15, 20, 30)
    assert(whole.getAs[Long]("n_lines") === parts)
  }

  test("q20: qualifying suppliers are above half the per-part average") {
    val rows = TpchPack.q20PartPromoSupp(spark, sf).collect()
    // row-wise contract only (the set can legitimately be empty at tiny
    // SF); names are unique per supplier
    assert(rows.map(_.getAs[String]("s_name")).distinct.length === rows.length)
  }

  test("q21: counts descend; a single-supplier order never contributes") {
    import spark.implicits._
    val rows = TpchPack.q21WaitingSupp(spark, sf).collect()
    val waits = rows.map(_.getAs[Long]("numwait"))
    assert(waits.sameElements(waits.sorted.reverse))
    // cross-check the total against an independent SQL formulation
    Seq("lineitem", "orders").foreach(t =>
      Tables.load(spark, sf, t).createOrReplaceTempView(s"tp_$t"))
    val expect = spark.sql(
      """WITH onf AS (
        | SELECT l.l_orderkey, l.l_suppkey,
        |  l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS AS late
        | FROM tp_lineitem l JOIN tp_orders o ON l.l_orderkey = o.o_orderkey
        | WHERE o.o_orderstatus = 'F'),
        |lp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM onf WHERE late),
        |p AS (SELECT DISTINCT l_orderkey, l_suppkey FROM onf)
        |SELECT count(*) FROM lp
        |WHERE EXISTS (SELECT 1 FROM p WHERE p.l_orderkey = lp.l_orderkey
        |               AND p.l_suppkey <> lp.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lp lp2
        |               WHERE lp2.l_orderkey = lp.l_orderkey
        |                 AND lp2.l_suppkey <> lp.l_suppkey)""".stripMargin)
      .collect()(0).getLong(0)
    assert(waits.sum === expect)
  }

  test("q22: dormant customers have no 2001+ orders (independent recount)") {
    import spark.implicits._
    val total = TpchPack.q22DormantCusts(spark, sf)
      .agg(sum($"numcust")).collect()(0)
    val got = if (total.isNullAt(0)) 0L else total.getLong(0)
    val cust = Tables.customer(spark, sf)
    val stats = cust.filter($"c_acctbal" > 0)
      .agg(sum(round($"c_acctbal" * 100, 0).cast("long")).as("t"),
           count(lit(1)).as("n")).collect()(0)
    val expect = cust
      .filter($"c_nationkey".isin(1, 5, 9, 13, 17, 21))
      .filter(round($"c_acctbal" * 100, 0).cast("long") * stats.getAs[Long]("n")
                > stats.getAs[Long]("t"))
      .join(Tables.orders(spark, sf)
              .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp")),
            $"c_custkey" === $"o_custkey", "left_anti")
      .count()
    assert(got === expect)
  }
}
