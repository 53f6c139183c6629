package graft

import graft.operators.GraphOps
import org.apache.spark.sql.DataFrame

/** Planted-graph semantics for the graph operators: the corpus-derived
  * co-purchase graph is sparse and hub-free, so these specs drive the
  * degree-ordered triangle enumeration and the integer PageRank with
  * graphs whose answers are known in closed form (cliques, stars,
  * cycles) or computable by a trivial driver-side reference loop.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(pairs: (Long, Long)*): DataFrame =
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")

  test("triangles: K4 — every vertex sits in C(3,2)=3 triangles") {
    // complete graph on 4 vertices: 4 triangles, each vertex in 3
    val e = canon(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val got = GraphOps.triangleParticipation(e)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: hub star + one rim edge — orientation finds the single triangle once") {
    // hub 0 connected to 1..6 (degree 6); rim edge 1-2 closes exactly
    // one triangle (0,1,2). The hub is the HIGHEST-ranked vertex, so
    // the degree-ordered enumeration must find the triangle from a rim
    // corner, never by fanning C(6,2) wedges out of the hub.
    val e = canon((1L to 6L).map(i => 0L -> i) :+ (1L -> 2L): _*)
    val got = GraphOps.triangleParticipation(e)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("triangles: triangle-free path yields no rows") {
    val e = canon(1L -> 2L, 2L -> 3L, 3L -> 4L)
    assert(GraphOps.triangleParticipation(e).count() == 0L)
  }

  /** Driver-side reference: the same fixed-point arithmetic (floor
    * division before the order-free sum) over an adjacency map. */
  private def refRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var r = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = und.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = deg.keys.map(v => v -> (150000L + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  test("pagerank: regular graph (C4 cycle) is an exact integer fixed point") {
    // every vertex degree 2: contribution in = 2·(1e6 div 2) = 1e6,
    // rank' = 150000 + 85·1e6 div 100 = 1000000 — bit-exact stability
    val e = canon(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L)
    val got = GraphOps.pageRankOn(e).as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1000000L), s"cycle drifted: $got")
  }

  test("pagerank: star matches the reference loop exactly (integer arithmetic)") {
    val edges = (1L to 5L).map(i => 0L -> i)
    val got = GraphOps.pageRankOn(canon(edges: _*))
      .as[(Long, Long)].collect().toMap
    assert(got == refRank(edges, 5), s"got $got vs ${refRank(edges, 5)}")
    assert(got(0L) > got(1L), "hub must out-rank leaves")
  }

  test("shortest path: path graph gives exact hop distances from the min vertex") {
    // 1-2-3-4-5-6-7-8: source = 1; vertex 8 is 7 hops away — beyond the
    // 6-round relaxation, so it must be ABSENT, not wrong
    val e = canon((1L to 7L).map(i => i -> (i + 1)): _*)
    val got = GraphOps.shortestPathOn(e).as[(Long, Long)].collect().toMap
    assert(got == (1L to 7L).map(i => i -> (i - 1)).toMap, s"got $got")
  }

  test("shortest path: cycle takes the shorter way around") {
    // C6 1..6: dist(4) = 3 via either arc; dist(6) = 1 backwards
    val e = canon(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 1L -> 6L)
    val got = GraphOps.shortestPathOn(e).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
                      5L -> 2L, 6L -> 1L), s"got $got")
  }

  test("shortest path: disconnected component is absent") {
    val e = canon(1L -> 2L, 5L -> 6L)
    val got = GraphOps.shortestPathOn(e).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L), s"got $got")
  }

  /** Driver-side reference for synchronized LPA: mode of neighbor
    * labels, ties to the smaller label, all vertices update at once. */
  private def refLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var l = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      l = adj.map { case (v, ns) =>
        val counts = ns.groupBy(l).view.mapValues(_.size).toSeq
        v -> counts.minBy { case (lbl, c) => (-c, lbl) }._1
      }
    }
    l
  }

  test("label propagation: two cliques + bridge keep distinct communities") {
    // K4 {1..4} and K4 {5..8} joined by 4-5: the mode favors the dense
    // side, so the bridge never merges them (min-label CC would)
    val k4a = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield i -> j
    val k4b = for (i <- 5L to 8L; j <- (i + 1) to 8L) yield i -> j
    val edges = k4a ++ k4b :+ (4L -> 5L)
    val got = GraphOps.labelPropagationOn(canon(edges: _*))
      .as[(Long, Long)].collect().toMap
    assert(got == refLpa(edges, 4), s"got $got vs ${refLpa(edges, 4)}")
    val aLbls = (1L to 4L).map(got).toSet
    val bLbls = (5L to 8L).map(got).toSet
    assert((aLbls & bLbls).isEmpty,
           s"bridge merged the cliques: $got")
  }

  test("label propagation: star collapses onto the mode with min-label ties") {
    val edges = (1L to 5L).map(i => 0L -> i)
    val got = GraphOps.labelPropagationOn(canon(edges: _*))
      .as[(Long, Long)].collect().toMap
    assert(got == refLpa(edges, 4), s"got $got vs ${refLpa(edges, 4)}")
  }
}
