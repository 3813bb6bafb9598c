package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 18 — the SIMILARITY / ANN family (Tier-C C3).
  *
  * Seeded clustered float vectors (centers + perturbations + planted
  * exact duplicates, so cosine TIES are real) and a plain-Scala twin
  * that re-derives every result from the documented contracts with no
  * engine code: its own left-to-right float→double dot folds (the
  * kernels document element order, so equality is exact, not
  * approximate), its own md5-60 (hex-slice) for the k-means seed, its
  * own Lloyd rounds under the 6-dp re-sync protocol, its own IVF
  * cell-assignment/probe/rank replay (candidates predicted, pruning
  * PROVEN — the probed cells must not cover the corpus), its own PQ
  * encode + ADC table from the engine-exported codebook. Engine answers
  * must match exactly; brute-force kNN doubles as the recall oracle for
  * the ANN paths. Seeded — found bugs stay found. */
class SimilarityDifferentialSpec extends AnyFunSuite with SparkTestBase {

  private val dim = 16

  private case class Vec(id: Long, label: String, e: Array[Float])

  private lazy val fixture: Seq[Vec] = {
    val rnd = new Random(170816003L)
    val centers = Seq.fill(6)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val out = scala.collection.mutable.ArrayBuffer.empty[Vec]
    var id = 0L
    centers.zipWithIndex.foreach { case (c, ci) =>
      (0 until 18).foreach { _ =>
        id += 1
        out += Vec(id, s"l$ci",
          c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.3f))
      }
    }
    // planted exact duplicates → cosine ties exercise the id tiebreak
    (0 until 6).foreach { i => id += 1
      out += Vec(id, out(i * 7).label, out(i * 7).e.clone()) }
    out.toSeq
  }

  private lazy val corpusDf = {
    val sp = spark
    import sp.implicits._
    fixture.map(v => (v.id, v.label, v.e)).toDF("vec_id", "label", "embedding")
  }
  private lazy val queries: Seq[Vec] = fixture.filter(_.id % 12 == 1)
  private lazy val queriesDf = {
    val sp = spark
    import sp.implicits._
    queries.map(v => (v.id, v.label, v.e)).toDF("vec_id", "label", "embedding")
  }

  // ---- independent numerics (documented element-order folds) -----------
  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def dotFF(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def dotDD(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < math.min(a.size, b.size)) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def cos(a: Array[Float], b: Array[Float]): Double =
    round6(dotFF(a, b) / (math.sqrt(dotFF(a, a)) * math.sqrt(dotFF(b, b))))
  private def md5_60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def twinKnn(qs: Seq[Vec], cs: Seq[Vec], k: Int,
                      labelFilter: Boolean = false): Set[(Long, Int, Long, Double)] =
    qs.flatMap { q =>
      cs.filter(c => c.id != q.id && (!labelFilter || c.label != q.label))
        .map(c => (c.id, cos(q.e, c.e)))
        .sortBy { case (cid, s) => (-s, cid) }
        .take(k).zipWithIndex
        .map { case ((cid, s), i) => (q.id, i + 1, cid, s) }
    }.toSet

  test("knnBrute + hardNegatives == twin exact top-k (ties broken by id)") {
    val got = graft.ext.Similarity.knnBrute(queriesDf, corpusDf, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == twinKnn(queries, fixture, 5))
    // deep lists too: the planted ties live beyond rank 5 — the engine's
    // (cos desc, id) tiebreak must match the twin through them
    val gotDeep = graft.ext.Similarity.knnBrute(queriesDf, corpusDf, 40).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(gotDeep == twinKnn(queries, fixture, 40))
    val gotHn = graft.ext.Similarity.hardNegatives(queriesDf, corpusDf, 5).collect()
      .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Int]("rank"), r.getAs[Long]("neg_id"),
        r.getAs[Double]("cos"))).toSet
    assert(gotHn == twinKnn(queries, fixture, 5, labelFilter = true))
    // ties must exist in the ranked lists (planted duplicates score equal
    // against every query — verify the id tiebreak is actually exercised)
    val byQ = twinKnn(queries, fixture, 40).groupBy(_._1)
    assert(byQ.exists(_._2.groupBy(_._4).exists(_._2.size > 1)),
      "fixture degenerate: no cosine ties in any ranked list")
  }

  test("kmeansFit == twin deterministic Lloyd (hash seed, 6-dp re-sync rounds)") {
    val (k, iters) = (5, 3)
    val base = fixture.map(v => v.id -> v.e.map(_.toDouble).toSeq).toMap
    var cents: Seq[(Int, Seq[Double])] = fixture
      .sortBy(v => (md5_60(v.id.toString), v.id)).take(k)
      .zipWithIndex.map { case (v, i) => (i + 1, base(v.id)) }
    var assigned = Map.empty[Long, Int]
    (1 to iters).foreach { _ =>
      assigned = base.map { case (id, x) =>
        id -> cents.map { case (c, cv) =>
          val d = round6(x.zip(cv).foldLeft(0.0)((a, p) => a + (p._1 - p._2) * (p._1 - p._2)))
          (d, c)
        }.min._2
      }
      cents = assigned.groupBy(_._2).toSeq.map { case (c, members) =>
        val vs = members.keys.toSeq.map(base)
        (c, (0 until dim).map(d => round6(vs.map(_(d)).sum / vs.size)))
      }.sortBy(_._1)
    }
    val want = cents.map { case (c, cv) =>
      (c, assigned.count(_._2 == c).toLong, cv) }.toSet
    val got = graft.ext.Similarity.kmeansFit(corpusDf, col("vec_id"), col("embedding"), k, iters)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toSeq)).toSet
    assert(got == want)
  }

  test("knnIvf == twin cell-assignment/probe/rank replay; pruning proven") {
    val (nprobe, k) = (2, 5)
    val cents = fixture.filter(_.id % 11 == 0) // deterministic sample, caller-supplied
    val centsDf = {
      val sp = spark
      import sp.implicits._
      cents.map(v => (v.id, v.e)).toDF("vec_id", "embedding")
    }
    // corpus → argmax cell (ccos desc, cell asc)
    val cellOf = fixture.map(v =>
      v.id -> cents.map(c => (cos(v.e, c.e), c)).maxBy { case (s, c) => (s, -c.id) }._2.id).toMap
    val want = queries.flatMap { q =>
      val probed = cents.map(c => (cos(q.e, c.e), c))
        .sortBy { case (s, c) => (-s, c.id) }.take(nprobe).map(_._2.id).toSet
      fixture.filter(v => v.id != q.id && probed(cellOf(v.id)))
        .map(v => (v.id, cos(q.e, v.e)))
        .sortBy { case (vid, s) => (-s, vid) }.take(k).zipWithIndex
        .map { case ((vid, s), i) => (q.id, i + 1, vid, s) }
    }.toSet
    val got = graft.ext.Similarity.knnIvf(queriesDf, corpusDf, centsDf, nprobe, k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want)
    // pruning must be real: every query's probed cells exclude part of the
    // corpus, and recall vs the brute twin stays useful on clustered data
    val cellSizes = cellOf.values.groupBy(identity).view.mapValues(_.size).toMap
    queries.foreach { q =>
      val probed = cents.map(c => (cos(q.e, c.e), c))
        .sortBy { case (s, c) => (-s, c.id) }.take(nprobe).map(_._2.id).toSet
      assert(probed.toSeq.map(cellSizes).sum < fixture.size,
        s"query ${q.id}: probe covered the whole corpus — no pruning")
    }
    val brute = twinKnn(queries, fixture, k).map(t => (t._1, t._3))
    val ivf = want.map(t => (t._1, t._3))
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall below gate on clustered fixture")
  }

  test("pqEncode + pqAdcSearch == twin encode and ADC table from the exported codebook") {
    val (m, kcb, topK) = (4, 8, 10)
    val codebook = graft.ext.Similarity.pqCodebookFromIds(
      corpusDf, col("vec_id"), col("embedding"), m, kcb)
    val sub = dim / m
    // twin encode: per subspace argmin of round6(x·x − 2x·c + c·c), ties
    // to the smaller code (array_position finds the FIRST minimum)
    def encode(v: Array[Float]): Seq[Int] = {
      val x = v.map(_.toDouble).toSeq
      (0 until m).map { s =>
        val xs = x.slice(s * sub, (s + 1) * sub)
        codebook(s).zipWithIndex.map { case (c, i) =>
          val cc = c.foldLeft(0.0)((a, y) => a + y * y)
          (round6(dotDD(xs, xs) - 2.0 * dotDD(xs, c) + cc), i)
        }.min._2
      }
    }
    val wantCodes = fixture.map(v => v.id -> encode(v.e)).toMap
    val gotCodesDf = graft.ext.Similarity.pqEncode(
      corpusDf, col("vec_id"), col("embedding"), codebook)
    val gotCodes = gotCodesDf.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(gotCodes == wantCodes)
    // codes must actually vary (degenerate codebooks would hide bugs)
    assert(wantCodes.values.toSet.size > 10, "fixture degenerate: near-constant codes")
    // twin ADC: lut from the same expansion, row score = Σ lut entries, round6
    val query = queries.head.e.map(_.toDouble).toSeq
    val lut = (0 until m).map { s =>
      val q = query.slice(s * sub, (s + 1) * sub)
      val qq = q.foldLeft(0.0)((a, x) => a + x * x)
      codebook(s).map { c =>
        val qc = q.indices.foldLeft(0.0)((a, i) => a + q(i) * c(i))
        val cc = c.foldLeft(0.0)((a, x) => a + x * x)
        round6(qq - 2.0 * qc + cc)
      }
    }
    val wantAdc = fixture.map { v =>
      val codes = wantCodes(v.id)
      (v.id, round6((0 until m).map(s => lut(s)(codes(s))).sum))
    }.sortBy { case (id, d) => (d, id) }.take(topK)
    val gotAdc = graft.ext.Similarity.pqAdcSearch(gotCodesDf, codebook, query, topK)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotAdc == wantAdc)
  }

  test("embeddingNearDups == twin threshold pairs (banded variant stays a verified subset)") {
    val threshold = 0.995
    val want = (for {
      a <- fixture; b <- fixture if a.id < b.id
      c = cos(a.e, b.e) if c >= threshold
    } yield (a.id, b.id, c)).toSet
    val got = graft.ext.Similarity.embeddingNearDups(corpusDf, threshold).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    assert(want.nonEmpty && want.exists(_._3 < 1.0),
      "fixture degenerate: only identical-vector pairs")
    val banded = graft.ext.Similarity.embeddingNearDupsBanded(corpusDf, threshold,
        nBits = 60, bandBits = 5, dim = dim).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"), r.getAs[Double]("cos"))).toSet
    assert(banded.subsetOf(want), s"banded produced non-pairs: ${banded -- want}")
    // the planted exact duplicates can never be missed (identical sign bands)
    val dups = want.filter(_._3 == 1.0)
    assert(dups.subsetOf(banded), s"banded missed identical pairs: ${dups -- banded}")
    // hot-band guard engaged (cap 1): candidates shrink to composite-band
    // + intra-signature pairs — still a verified subset, and identical
    // vectors are STILL never missed (they pair inside their signature
    // group, which the cap by construction cannot touch)
    val capped = graft.ext.Similarity.embeddingNearDupsBanded(corpusDf, threshold,
        nBits = 60, bandBits = 5, dim = dim, hotBandCap = 1).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"), r.getAs[Double]("cos"))).toSet
    assert(capped.subsetOf(want), s"capped banded produced non-pairs: ${capped -- want}")
    assert(dups.subsetOf(capped), s"capped banded missed identical pairs: ${dups -- capped}")
  }
}
