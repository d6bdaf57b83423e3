package graft

import org.apache.spark.sql.functions._

/** The round-16 hot-vertex valve on [[graft.operators.GraphSim]]:
  * jaccardNeighbors ships with a default part-degree cap (the generic
  * node-similarity kernel must not be quadratic on the hottest vertex
  * of a power-law graph), and on the TPC-H degree distribution the cap
  * must be a no-op so the DuckDB oracle stays exact. */
class GraphSimCapSpec extends SparkSpec {
  import graft.operators.GraphSim

  test("default cap drops nothing on the TPC-H degree distribution") {
    import spark.implicits._
    val capped = GraphSim.jaccardNeighbors(spark, sf)
      .collect().map(_.toSeq).toSeq
    val exact = GraphSim.jaccardNeighbors(spark, sf, maxPartDegree = None)
      .collect().map(_.toSeq).toSeq
    assert(capped.nonEmpty)
    assert(capped === exact, "default cap changed the fixture's result")
    // the fixture's hottest part sits far below the default cap, so the
    // equivalence above is structural, not luck
    val maxDeg = Tables.lineitem(spark, sf)
      .select($"l_suppkey".as("s"), $"l_partkey".as("p")).distinct()
      .groupBy($"p").agg(count(lit(1)).as("d"))
      .agg(max($"d")).collect()(0).getLong(0)
    assert(maxDeg < 1024L, s"fixture part degree $maxDeg reached the cap")
  }

  test("a binding cap prunes the quadratic hot lists") {
    // every pair-bearing posting list has >= 2 suppliers, so cap=1
    // removes them all — the valve demonstrably fires when binding
    assert(GraphSim.jaccardNeighbors(spark, sf, maxPartDegree = Some(1))
      .collect().isEmpty)
  }
}
