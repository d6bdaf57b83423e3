package graft

import graft.operators.Core
import graft.telemetry.Telemetry

class CoreQueriesSpec extends SparkSpec {

  test("q1 pricing summary groups by flag+status with positive sums") {
    val rows = Core.q1PricingSummary(spark, sf).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
      assert(r.getAs[Double]("avg_qty") > 0)
    }
  }

  test("q_topk returns 10 customers in descending spend order") {
    val rows = Core.qTopK(spark, sf).collect()
    assert(rows.length === 10)
    val spends = rows.map(_.getAs[Double]("total_spent"))
    assert(spends.sameElements(spends.sorted.reverse))
  }

  test("q_window_rank keeps at most 3 rows per customer, ranked") {
    val rows = Core.qWindowRank(spark, sf).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(byCust.values.forall(_.length <= 3))
    byCust.values.foreach { g =>
      val ranked = g.sortBy(_.getAs[Int]("rn"))
      val prices = ranked.map(_.getAs[Double]("price"))
      assert(prices.sameElements(prices.sorted.reverse))
    }
  }

  test("semi and anti joins partition the customer/order space") {
    import org.apache.spark.sql.functions._
    val nCustomers = Tables.customer(spark, sf).count()
    val withOrders = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf),
            col("c_custkey") === col("o_custkey"), "left_semi").count()
    val withoutOrders = Core.qAntiJoin(spark, sf)
      .agg(sum("n_customers")).collect()(0)
    val anti = if (withoutOrders.isNullAt(0)) 0L else withoutOrders.getLong(0)
    assert(withOrders + anti === nCustomers)
  }

  test("dedup_latest yields one row per (user, event_type)") {
    val df = Telemetry.dedupLatest(spark, sf)
    assert(df.count() === df.select("user_id", "event_type").distinct().count())
  }

  test("sessionize: session counts sum to total events") {
    import org.apache.spark.sql.functions._
    val total = Tables.events(spark, sf).count()
    val summed = Telemetry.sessionize(spark, sf)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(summed === total)
  }

  test("q3_join_agg applies the customer broadcast filter BELOW the fact shuffle") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = Core.q3JoinAgg(spark, sf)
    val lp = df.queryExecution.optimizedPlan
    // the orderkey (fact-fact) join must have the custkey (broadcast
    // filter) join inside one of its children — i.e. orders are pruned
    // by segment BEFORE they shuffle on o_orderkey
    val orderkeyJoins = lp.collect {
      case j: Join if j.condition.exists(_.references.exists(_.name == "o_orderkey")) => j
    }
    assert(orderkeyJoins.nonEmpty, s"no orderkey join in:\n$lp")
    val broadcastBelowShuffle = orderkeyJoins.exists(_.children.exists(
      _.collectFirst {
        case j: Join if j.condition.exists(_.references.exists(_.name == "c_custkey")) => j
      }.isDefined))
    assert(broadcastBelowShuffle,
      s"custkey join is not below the orderkey join:\n$lp")
  }

  test("runtime bloom filter injects on q_bloom_join under its queryConfs") {
    val confs = SparkEntry.queryConfs("q_bloom_join")
    val (withBloom, result) = SparkEntry.withConfs(spark, confs) {
      val df = graft.operators.Core.qBloomJoin(spark, sf)
      (df.queryExecution.executedPlan.toString, df.collect().toSet)
    }
    assert(withBloom.toLowerCase.contains("bloom_filter"),
      s"no bloom filter in plan:\n${withBloom.take(1500)}")
    // semantics unchanged vs the un-filtered plan
    val plain = graft.operators.Core.qBloomJoin(spark, sf).collect().toSet
    assert(result === plain && result.nonEmpty)
  }
}
