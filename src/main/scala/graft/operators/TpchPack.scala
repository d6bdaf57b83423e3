package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** TPC-H completion pack (r10) — the 16 classic decision-support shapes
  * not yet in the catalog (q1/q3/q5/q6/q9 live in [[Core]]; the q4
  * EXISTS shape is [[Core.qExistsLate]]). Adapted to the driver schema
  * (no partsupp table — supplier/part relationships derive from
  * lineitem; no commit/receipt dates — lateness is ship-vs-order-date),
  * but each keeps the plan pattern that makes the original a benchmark:
  * correlated min (q2), two-sided dimension disjunction (q7), share-of-
  * total (q8/q14), top-k join (q10/q18), HAVING vs a global scalar
  * (q11/q22), outer-join distribution (q13), argmax-by-group (q15),
  * NOT-IN + count-distinct (q16), correlated avg (q17), disjunctive
  * pushdown (q19), nested quantile-ish semi (q20), and the double
  * EXISTS/NOT-EXISTS self-join (q21).
  *
  * Engine exactness (the [[Core.q1PricingSummary]]/[[Core.q9Profit]]
  * discipline): all money columns are exactly 2-decimal, quantities are
  * integral, so every sum that feeds a FILTER, ORDER BY, or equality
  * compare is computed in integer units (cents, or 1e-4 "units" for
  * price×discount products) where summation is order-independent and
  * bit-identical across engines; doubles only appear at display time
  * (one division + round(4)).
  *
  * Scale notes (100 TB): dimension sides (part, supplier, nation,
  * region, per-group bound rows) broadcast; the only big-big exchanges
  * are lineitem ⋈ orders on orderkey and the self-joins of q21, which
  * co-partition on the same orderkey key so the planner reuses one
  * shuffle. Derived "partsupp" aggregates shuffle lineitem once on
  * (partkey, suppkey) — the same exchange the real partsupp scan would
  * cost. Windows are keyed (per-part / per-order), never global.
  */
object TpchPack {

  private def c100(c: Column): Column = round(c * 100, 0).cast("long")

  /** revenue in 1e-4 currency units: cents × (100 − disc%). */
  private def revU(ep: Column, disc: Column): Column =
    c100(ep) * (lit(100L) - c100(disc))

  /** TPC-H Q2 shape — min-cost supplier. "partsupp.supplycost" derives
    * as min(extendedprice/quantity) per (part, supplier) observed in
    * lineitem; for LARGE small-size parts, pick the EUROPE supplier(s)
    * attaining the per-part minimum. The correlated MIN subquery is a
    * keyed window over the already-aggregated pair table (≪ fact), so
    * no second pass over lineitem. Division of exact 2-decimal doubles
    * by integral quantities is IEEE-deterministic, and min() is
    * order-independent, so the equality filter is engine-exact. */
  def q2MinCostSupp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, sfDir)
      .filter($"p_type" === "LARGE" && $"p_size" <= 5)
      .select($"p_partkey", $"p_name")
    val eurSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
            $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, sfDir).filter($"r_name" === "EUROPE")),
            $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    // part filter joins BELOW the pair aggregation (Catalyst cannot
    // push a join through a groupBy itself): the ~1.5% selected parts
    // prune the fact scan before the heavy (part, supplier) exchange —
    // per-group min is untouched by dropping whole other groups
    val ps = Tables.lineitem(spark, sfDir)
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .groupBy($"p_partkey", $"p_name", $"l_suppkey")
      .agg(min($"l_extendedprice" / $"l_quantity").as("supplycost"))
    val cand = ps
      .join(broadcast(eurSupp), $"l_suppkey" === $"s_suppkey")
    val perPart = Window.partitionBy($"p_partkey")
    cand.withColumn("min_cost", min($"supplycost").over(perPart))
      .filter($"supplycost" === $"min_cost")
      .select($"p_partkey", $"p_name", $"s_name", $"n_name",
              round($"supplycost", 4).as("supplycost"),
              round($"s_acctbal", 4).as("s_acctbal"))
  }

  /** TPC-H Q7 shape — volume shipping between two nations, both
    * directions in one plan. The (n1,n2)∨(n2,n1) disjunction lands on
    * two broadcast nation copies; facts shuffle once on orderkey. */
  def q7VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n1 = Tables.nation(spark, sfDir)
      .select($"n_nationkey".as("n1_key"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir)
      .select($"n_nationkey".as("n2_key"), $"n_name".as("cust_nation"))
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, sfDir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(spark, sfDir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"n1_key")
      .join(broadcast(n2), $"c_nationkey" === $"n2_key")
      .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
              ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
      .groupBy($"supp_nation", $"cust_nation",
               year($"l_shipdate").cast("long").as("l_year"))
      .agg(sum(revU($"l_extendedprice", $"l_discount")).as("vol_u"),
           count(lit(1)).as("n_lines"))
      .select($"supp_nation", $"cust_nation", $"l_year",
              round($"vol_u".cast("double") / 1e4, 4).as("volume"), $"n_lines")
  }

  /** TPC-H Q8 shape — national market share: of all PROMO-part revenue
    * sold to ASIA customers, the fraction supplied by NATION_3, per
    * order year. Share = ratio of two exact long sums (conditional
    * numerator via a when(), ONE aggregate pass). */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val asiaCust = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, sfDir).filter($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey")
    val promoParts = Tables.part(spark, sfDir)
      .filter($"p_type" === "PROMO").select($"p_partkey")
    val suppNation = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(promoParts), $"l_partkey" === $"p_partkey")
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(asiaCust), $"o_custkey" === $"c_custkey", "left_semi")
      .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(sum(when($"supp_nation" === "NATION_3",
                    revU($"l_extendedprice", $"l_discount")).otherwise(0L))
             .as("nation_u"),
           sum(revU($"l_extendedprice", $"l_discount")).as("total_u"))
      .select($"o_year",
              round($"nation_u".cast("double") / $"total_u", 4).as("mkt_share"),
              round($"total_u".cast("double") / 1e4, 4).as("total_volume"))
  }

  /** TPC-H Q10 shape — returned-item reporting: top 20 customers by
    * revenue lost to returns in one year. Revenue ranks on the exact
    * long (ties broken by custkey), so the top-20 cut is deterministic
    * cross-engine; sort+limit plans as TakeOrderedAndProject. */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val custN = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
    Tables.lineitem(spark, sfDir)
      .filter($"l_returnflag" === "R")
      .join(Tables.orders(spark, sfDir)
              .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                      $"o_orderdate" <  lit("1997-01-01").cast("timestamp")),
            $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum(revU($"l_extendedprice", $"l_discount")).as("rev_u"),
           count(lit(1)).as("n_lines"))
      .join(broadcast(custN), $"o_custkey" === $"c_custkey")
      .orderBy($"rev_u".desc, $"c_custkey".asc)
      .limit(20)
      .select($"c_custkey", $"c_name", $"n_name",
              round($"rev_u".cast("double") / 1e4, 4).as("revenue"),
              round($"c_acctbal", 4).as("c_acctbal"), $"n_lines")
  }

  /** TPC-H Q11 shape — important stock: per-part spend through
    * NATION_7 suppliers, kept where the part's share exceeds 0.1% of
    * the total. The global scalar rides a 1-row broadcast crossJoin and
    * the HAVING compares LONGS (value·1000 > total) — no float
    * boundary. */
  def q11ImportantStock(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val supp7 = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir).filter($"n_name" === "NATION_7")),
            $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val perPart = Tables.lineitem(spark, sfDir)
      .join(broadcast(supp7), $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey")
      .agg(sum(c100($"l_extendedprice")).as("value_c"))
    val total = perPart.agg(sum($"value_c").as("total_c"))
    perPart.crossJoin(broadcast(total))
      .filter($"value_c" * 1000L > $"total_c")
      .select($"l_partkey",
              round($"value_c".cast("double") / 100, 4).as("value"),
              round($"value_c".cast("double") / $"total_c", 6).as("share"))
  }

  /** TPC-H Q12 shape — shipping-delay buckets × order-priority class:
    * did slow shipping hit critical orders? One fact-fact join, then a
    * pure-count pivot (no floats anywhere). */
  def q12ShipDelay(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hi = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .withColumn("delay_d", datediff($"l_shipdate", $"o_orderdate"))
      .withColumn("bucket",
        when($"delay_d" <= 30, "0-30d")
          .when($"delay_d" <= 90, "31-90d")
          .otherwise("90d+"))
      .groupBy($"bucket")
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(hi, 0L).otherwise(1L)).as("low_line_count"),
           count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q13 shape — customer order-count distribution: LEFT join
    * (with the priority predicate on the join's right side, so no-order
    * customers survive as count 0), then a second aggregate over the
    * first's output. Counts only — exact by construction. */
  def q13OrderCountDist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_custkey", $"o_orderkey")
    Tables.customer(spark, sfDir)
      .join(ord, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q14 shape — promo revenue share per month of 1996: one
    * conditional aggregate over the part-joined fact; the share divides
    * two exact longs. */
  def q14PromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val partType = Tables.part(spark, sfDir).select($"p_partkey", $"p_type")
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp"))
      .join(broadcast(partType), $"l_partkey" === $"p_partkey")
      .groupBy(date_format($"l_shipdate", "yyyy-MM").as("month"))
      .agg(sum(when($"p_type" === "PROMO",
                    revU($"l_extendedprice", $"l_discount")).otherwise(0L))
             .as("promo_u"),
           sum(revU($"l_extendedprice", $"l_discount")).as("total_u"))
      .select($"month",
              round($"promo_u" * 100.0 / $"total_u", 4).as("promo_share"),
              round($"total_u".cast("double") / 1e4, 4).as("total_revenue"))
  }

  /** TPC-H Q15 shape — top supplier(s) of 1996Q1 by revenue: the argmax
    * scalar rides a 1-row broadcast crossJoin and the equality compares
    * exact longs, so ties (all of them, as the spec requires) surface
    * identically in both engines. */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perSupp = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(revU($"l_extendedprice", $"l_discount")).as("rev_u"))
    val best = perSupp.agg(max($"rev_u").as("max_u"))
    perSupp.crossJoin(broadcast(best))
      .filter($"rev_u" === $"max_u")
      .join(broadcast(Tables.supplier(spark, sfDir)), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
              round($"rev_u".cast("double") / 1e4, 4).as("total_revenue"))
  }

  /** TPC-H Q16 shape — supplier-part-type counts: distinct suppliers
    * able to supply each surviving (brand, type, size) bucket, with the
    * NOT IN (delinquent suppliers) as a broadcast ANTI join. The
    * broadcast part filter (~13% of parts) and the anti join both run
    * BELOW the distinct so the pair exchange carries only surviving
    * rows — dedup of pruned-away pairs is wasted shuffle at 100 TB. */
  def q16SuppPartCnt(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val excl = Tables.supplier(spark, sfDir)
      .filter($"s_acctbal" < 0).select($"s_suppkey".as("x_suppkey"))
    val partF = Tables.part(spark, sfDir)
      .filter($"p_brand" =!= "Brand#1" && $"p_type" =!= "PROMO" &&
              $"p_size".isin(1, 5, 9, 13, 17, 21, 25, 29))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey")
      .join(broadcast(excl), $"l_suppkey" === $"x_suppkey", "left_anti")
      .join(broadcast(partF), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
  }

  /** TPC-H Q17 shape — small-quantity revenue for one brand: lineitems
    * below 20% of their part's average quantity. The correlated AVG is
    * a per-part aggregate broadcast back (both passes run only over the
    * brand's ~4% slice — the broadcast part filter prunes BEFORE the
    * heavy work); avg = exact-long sum / count, so the 0.2·avg compare
    * is IEEE-identical cross-engine. */
  def q17SmallQty(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val brandParts = Tables.part(spark, sfDir)
      .filter($"p_brand" === "Brand#3").select($"p_partkey")
    val li = Tables.lineitem(spark, sfDir)
      .join(broadcast(brandParts), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
    val avgQ = li.groupBy($"l_partkey".as("ap_partkey"))
      .agg((sum($"l_quantity".cast("long")).cast("double") /
              count(lit(1))).as("avg_qty"))
    // no broadcast HINT: at 100 TB the per-part table is parts/25 rows
    // (too big to force), and the join keys on the aggregate's own
    // partkey exchange anyway — Catalyst/AQE still picks broadcast at
    // small scale on stats
    li.join(avgQ, $"l_partkey" === $"ap_partkey")
      .filter($"l_quantity" < $"avg_qty" * 0.2)
      .agg(sum(c100($"l_extendedprice")).as("sum_c"),
           count(lit(1)).as("n_lines"))
      .select(round($"sum_c".cast("double") / 100 / 7.0, 4).as("avg_yearly"),
              $"n_lines")
  }

  /** TPC-H Q18 shape — large-volume orders: orders whose total quantity
    * exceeds 300 (the IN-subquery is the aggregate itself, joined back
    * on orderkey — co-partitioned with the li ⋈ orders exchange), top
    * 100 by price. Quantity sums are integral → the HAVING cut and the
    * join are exact; ordering ties break on orderkey. */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bigOrders = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast("long")).as("sum_qty"))
      .filter($"sum_qty" > 300L)
    Tables.orders(spark, sfDir)
      .join(bigOrders, $"o_orderkey" === $"l_orderkey")
      .join(broadcast(Tables.customer(spark, sfDir)), $"o_custkey" === $"c_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(100)
      .select($"c_custkey", $"c_name", $"o_orderkey",
              date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"),
              round($"o_totalprice", 4).as("o_totalprice"), $"sum_qty")
  }

  /** TPC-H Q19 shape — disjunctive predicate revenue: three
    * (brand, size-range, quantity-range) conjuncts OR'd together. The
    * plan test: the part filter (union of the three brand/size
    * conjuncts) must broadcast, and the residual OR runs codegen'd on
    * the joined rows — no fallback out of WholeStageCodegen. */
  def q19Disjunct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val partSel = Tables.part(spark, sfDir)
      .filter(($"p_brand" === "Brand#12" && $"p_size".between(1, 5)) ||
              ($"p_brand" === "Brand#23" && $"p_size".between(1, 10)) ||
              ($"p_brand" === "Brand#4"  && $"p_size".between(1, 15)))
      .select($"p_partkey", $"p_brand")
    Tables.lineitem(spark, sfDir)
      .join(broadcast(partSel), $"l_partkey" === $"p_partkey")
      .filter(($"p_brand" === "Brand#12" && $"l_quantity".between(1, 11)) ||
              ($"p_brand" === "Brand#23" && $"l_quantity".between(10, 20)) ||
              ($"p_brand" === "Brand#4"  && $"l_quantity".between(20, 30)))
      .agg(round(sum(revU($"l_extendedprice", $"l_discount")).cast("double") / 1e4,
                 4).as("revenue"),
           count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q20 shape — above-average suppliers of 'small *' parts in
    * 1996: a supplier qualifies if, for some such part, its shipped
    * quantity beats half the part's per-supplier average. The nested
    * subquery chain collapses to ONE (part, supplier) aggregate whose
    * HAVING is the integer cross-multiplication 2·q_ps·n_supp > q_total
    * (no float boundary), then a semi join onto supplier. */
  def q20PartPromoSupp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val smallParts = Tables.part(spark, sfDir)
      .filter($"p_name".startsWith("small")).select($"p_partkey")
    val ps = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp"))
      .join(broadcast(smallParts), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity".cast("long")).as("q_ps"))
    val perPart = Window.partitionBy($"l_partkey")
    val qualifying = ps
      .withColumn("q_total", sum($"q_ps").over(perPart))
      .withColumn("n_supp", count(lit(1)).over(perPart))
      .filter($"q_ps" * 2L * $"n_supp" > $"q_total")
      .select($"l_suppkey").distinct()
    Tables.supplier(spark, sfDir)
      .join(qualifying, $"s_suppkey" === $"l_suppkey", "left_semi")
      .join(broadcast(Tables.nation(spark, sfDir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_name", $"n_name", round($"s_acctbal", 4).as("s_acctbal"))
  }

  /** TPC-H Q21 shape — suppliers who kept orders waiting: the only late
    * supplier (ship > order date + 60d) on a multi-supplier 'F' order.
    * The textbook EXISTS (another supplier) + NOT-EXISTS (another late
    * supplier) self-joins collapse into ONE per-order aggregate: the
    * predicate pair is exactly `distinct suppliers ≥ 2 AND distinct
    * LATE suppliers = 1`, and when the late set is a singleton its
    * member IS `max(late suppkey)` — so the whole query is the
    * li ⋈ orders shuffle (on orderkey) feeding a groupBy on the SAME
    * key (exchange layout reused, zero further wide ops), versus the
    * r10-draft two distincts + semi + anti over pair tables (4
    * exchanges). Counts only → exact; the independent SQL formulation
    * in TpchPackSpec pins the semantic equivalence. */
  def q21WaitingSupp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fOrders = Tables.orders(spark, sfDir)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(fOrders, $"l_orderkey" === $"o_orderkey")
      // two-LEVEL aggregate instead of two count(distinct)s in one agg:
      // the latter plans an Expand (3x the joined stream before partial
      // aggregation); here level 1 collapses to (order, supplier, any
      // line late?) map-side and level 2 counts plain rows
      .groupBy($"o_orderkey", $"l_suppkey")
      .agg(max(when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
                    1L).otherwise(0L)).as("is_late"))
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_supp"),
           sum($"is_late").as("n_late"),
           max(when($"is_late" === 1L, $"l_suppkey")).as("waiting_supp"))
      .filter($"n_supp" >= 2 && $"n_late" === 1)
      .join(broadcast(Tables.supplier(spark, sfDir)),
            $"waiting_supp" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name".asc)
      .limit(20)
  }

  /** TPC-H Q22 shape — dormant high-balance customers: in six nations,
    * customers above the global positive-average balance with no RECENT
    * orders (none since 2001 — every customer has some order at the
    * generator's order/customer ratio, so "never ordered" is the empty
    * set; recency-dormancy is the real Q22 intent). The scalar AVG
    * arrives as (sum_cents, count) on a 1-row broadcast crossJoin and
    * the compare is the integer cross-multiplication bal_c·n > total_c;
    * the dormancy check is a LEFT ANTI against the recent-order custkey
    * set (date filter pushed to the parquet scan). */
  def q22DormantCusts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .filter($"c_nationkey".isin(1, 5, 9, 13, 17, 21))
      .select($"c_custkey", $"c_nationkey", c100($"c_acctbal").as("bal_c"))
    val avgPos = Tables.customer(spark, sfDir)
      .filter($"c_acctbal" > 0)
      .agg(sum(c100($"c_acctbal")).as("total_c"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
      .select($"o_custkey")
    cust.crossJoin(broadcast(avgPos))
      .filter($"bal_c" * $"n_pos" > $"total_c")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .join(broadcast(Tables.nation(spark, sfDir)),
            $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("numcust"),
           round(sum($"bal_c").cast("double") / 100, 4).as("totacctbal"))
  }
}
