package graft

import graft.ext.Dedup
import org.scalatest.funsuite.AnyFunSuite

class ClusterSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sp = spark

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import sp.implicits._
    Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("components: disjoint clusters get their own min label") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("components: a long chain converges (propagation over diameter)") {
    val chain = (1L until 12L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 12L).toSet)
  }

  test("components: min label wins regardless of pair orientation") {
    val got = cc(Seq((7L, 2L), (9L, 7L), (2L, 5L)))
    assert(got == Map(2L -> 2L, 5L -> 2L, 7L -> 2L, 9L -> 2L))
  }

  test("components: triangle + bridge merges into one component") {
    val got = cc(Seq((4L, 5L), (5L, 6L), (4L, 6L), (6L, 20L), (20L, 21L)))
    assert(got.values.toSet == Set(4L))
  }

  private def ccFast(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import sp.implicits._
    Dedup.connectedComponentsFast(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("components: pointer-jumping variant handles a diameter-40 chain in O(log d) rounds") {
    val chain = (1L until 41L).map(i => (i, i + 1))
    val got = ccFast(chain)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 41L).toSet)
  }

  test("components: pointer-jumping variant equals min-label on random graphs (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEdges: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong)
        b <- Gen.choose(1L, n.toLong) if a != b
      } yield (a, b))
      if edges.nonEmpty
    } yield edges
    val prop = Prop.forAll(genEdges) { edges =>
      cc(edges) == ccFast(edges)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("pageRank: 2-cycle symmetric, hub outranks leaves, mass conserved") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    // 2-node cycle: perfectly symmetric ranks at every iteration
    val cyc = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val rc = graft.ext.Web.pageRank(cyc, nNodes = 2, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rc(0L) == rc(1L) && math.abs(rc(0L) - 0.5) < 1e-6)
    // star: every leaf links to node 0 — the hub outranks every leaf
    val star = (1L to 9L).map(i => (i, 0L)).toDF("src", "dst")
    val rs = graft.ext.Web.pageRank(star, nNodes = 10, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((1L to 9L).forall(i => rs(0L) > rs(i)))
    // no dangling edges in the cycle graph => total mass stays ~1
    assert(math.abs(rc.values.sum - 1.0) < 1e-5)
  }
}
