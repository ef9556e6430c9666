package graft.operators

import org.apache.spark.sql.functions._
import graft.testutil.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("connectedComponents: chain + clique + isolated pair") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("src", "dst")
    val got = GraphQueries.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: long path needs multiple rounds (diameter > 2)") {
    val n = 12
    val edges = (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val got = GraphQueries.connectedComponents(edges).collect()
    assert(got.length === n + 1)
    assert(got.forall(_.getLong(1) == 0L))
  }

  test("driver union-find == distributed min-label loop (cap forced to 0)") {
    // deterministic pseudo-random graph with chains, triangles and junk
    val edges = (0 until 300).map { i =>
      val a = (i * 131) % 97L
      val b = (i * 17 + 5) % 97L
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).toDF("src", "dst")
    val fast = GraphQueries.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val dist = GraphQueries.connectedComponents(edges, driverCap = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(fast === dist)
  }

  test("nearDupComponents: every component's rep <= members, sizes >= 2 imply edges") {
    val comps = GraphQueries.nearDupComponents(spark, sf0001).collect()
    assert(comps.nonEmpty)
    for (r <- comps) {
      assert(r.getLong(0) <= r.getLong(2), "comp label must be the min member")
      assert(r.getLong(1) >= 2, "edge-endpoint nodes always have a partner")
    }
    // conservation: total clustered docs == distinct endpoints of the pair set
    val pairs = TextQueries.lshNearDupPairs(spark, sf0001)
    val endpoints = pairs.select(col("d1").as("d")).unionByName(
      pairs.select(col("d2").as("d"))).distinct().count()
    assert(comps.map(_.getLong(1)).sum === endpoints)
  }
}
