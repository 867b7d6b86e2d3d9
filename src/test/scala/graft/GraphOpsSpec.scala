package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Connected-components operator: exact component labels on shapes that
  * stress the iteration (long chains — worst case for plain label
  * propagation, covered by pointer jumping), plus isolated nodes and
  * the dedup-group summary.
  */
class GraphOpsSpec extends SparkSpecBase {

  private def components(
      edges: Seq[(Long, Long)],
      nodes: Seq[Long] = Nil): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    val n = if (nodes.isEmpty) None else Some(nodes.toDF("id"))
    GraphOps.connectedComponents(spark, e, "src", "dst", n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components and an isolated node get min-id labels") {
    val got = components(
      edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)),
      nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("a 200-node chain converges to one component (pointer jumping)") {
    val chain = (0L until 199L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.size === 200)
    assert(got.values.toSet === Set(0L))
  }

  test("edge direction and duplicates do not matter") {
    val got = components(Seq((5L, 4L), (4L, 5L), (5L, 4L), (3L, 4L)))
    assert(got === Map(3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  test("dedupGroups summarizes size and canonical survivor") {
    import spark.implicits._
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("id", "comp")
    val groups = GraphOps.dedupGroups(comps)
      .orderBy("component")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(groups.toSeq === Seq((1L, 3L, 1L), (9L, 1L, 9L)))
  }
}
