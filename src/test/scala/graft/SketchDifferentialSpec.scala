package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 19 — the SKETCH family (HDR histogram tables,
  * KMV/theta sketches, Count-Min): every sketch here is DETERMINISTIC
  * given its documented hash/bucket rule, so the twin REPLAYS each one
  * exactly in plain Scala (own md5-60 via hex slice, own top-k-bits
  * bucket arithmetic, own k-smallest and cell maps) — equality-grade
  * differentials, not just error bounds — and then the documented
  * ACCURACY contracts are gated against exact answers the twin computes
  * from the raw data (HDR's 2^−(k−1) relative error, theta's
  * exact-when-fits rule and sampling error, CMS one-sidedness).
  * Adversarial seeded inputs: bucket-boundary powers of two, value 1,
  * near-2^60 latencies, heavy duplicates, skewed token distributions,
  * planted set overlaps. Seeded — found bugs stay found. */
class SketchDifferentialSpec extends AnyFunSuite with SparkTestBase {

  private def md5_60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  // ---- HDR ------------------------------------------------------------
  private val hdrK = 8
  private lazy val hdrValues: Seq[Long] = {
    val rnd = new Random(170816004L)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    // lognormal-ish latencies
    (0 until 3000).foreach(_ => out += math.exp(rnd.nextGaussian() * 2 + 10).toLong.max(1))
    // exact bucket-boundary powers of two and their neighbours
    Seq(8, 9, 20, 40, 59).foreach { b =>
      out += (1L << b); out += (1L << b) - 1; out += (1L << b) + 1 }
    // tiny values below 2^k stay exact buckets; heavy duplicates
    (0 until 500).foreach(_ => out += 1L + rnd.nextInt(200))
    (0 until 300).foreach(_ => out += 123456789L)
    // near-2^60 nanosecond-scale extremes
    (0 until 10).foreach(_ => out += (1L << 60) + rnd.nextInt(1 << 20))
    out.toSeq
  }

  /** Twin bucket rule: keep the value's top k bits. */
  private def hdrBucket(v: Long): (Long, Long) = {
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(v)
    val shift = math.max(bitlen - hdrK, 0)
    val pw = 1L << shift
    val bmin = v - (v % pw)
    (bmin, bmin + (pw - 1))
  }

  test("hdrHistogram == twin bucket rule; any split merges to the one-shot table") {
    val sp = spark
    import sp.implicits._
    val df = hdrValues.toDF("v")
    val want = hdrValues.groupBy(hdrBucket).view.mapValues(_.size.toLong).toMap
    val one = graft.ext.Sketch.hdrHistogram(df, Seq.empty, col("v"), hdrK)
    val got = one.collect().map(r =>
      (r.getAs[Long]("bmin"), r.getAs[Long]("rep")) -> r.getAs[Long]("c")).toMap
    assert(got == want)
    // boundary values land in DIFFERENT buckets than their neighbours
    assert(hdrBucket((1L << 20)) != hdrBucket((1L << 20) - 1),
      "fixture degenerate: boundary did not split buckets")
    // merge invariance: seeded 5-way split, bucket-wise count addition
    val rnd = new Random(42)
    val parts = hdrValues.map(v => (rnd.nextInt(5), v))
    val merged = graft.ext.Sketch.hdrMerge(
      (0 until 5).map(i => graft.ext.Sketch.hdrHistogram(
        parts.filter(_._1 == i).map(_._2).toDF("v"), Seq.empty, col("v"), hdrK))
        .reduce(_ unionAll _))
    val gotMerged = merged.collect().map(r =>
      (r.getAs[Long]("bmin"), r.getAs[Long]("rep")) -> r.getAs[Long]("c")).toMap
    assert(gotMerged == want)
  }

  test("hdrPercentiles == twin cum rule; estimates within the documented 2^-(k-1) relative error") {
    val sp = spark
    import sp.implicits._
    val df = hdrValues.toDF("v")
    val hist = graft.ext.Sketch.hdrHistogram(df, Seq.empty, col("v"), hdrK)
    val ps = Seq(0.5, 0.9, 0.99, 0.999, 1.0)
    val got = graft.ext.Sketch.hdrPercentiles(hist, ps).collect()
      .map(r => r.getAs[Double]("p") -> (r.getAs[Long]("v_bmin"), r.getAs[Long]("v_est"))).toMap
    // twin: cumulative over rep-ordered buckets, first bucket reaching ceil(p·n)
    val buckets = hdrValues.groupBy(hdrBucket).view.mapValues(_.size.toLong)
      .toSeq.map { case ((bmin, rep), c) => (bmin, rep, c) }.sortBy(_._2)
    val n = hdrValues.size.toLong
    val want = ps.map { p =>
      val target = math.ceil(p * n).toLong
      var cum = 0L
      val b = buckets.find { case (_, _, c) => cum += c; cum >= target }.get
      p -> (b._1, b._2)
    }.toMap
    assert(got == want)
    // accuracy: estimate ≥ exact and within 2^-(k-1) relative error
    val sorted = hdrValues.sorted
    ps.foreach { p =>
      val exact = sorted(math.ceil(p * n).toInt - 1)
      val est = got(p)._2
      assert(est >= exact, s"p=$p: HDR estimate $est below exact $exact")
      assert((est - exact).toDouble / exact < math.pow(2.0, -(hdrK - 1)),
        s"p=$p: relative error ${(est - exact).toDouble / exact} above the documented bound")
    }
  }

  // ---- theta / KMV ----------------------------------------------------
  test("thetaSketches + thetaIntersections == twin KMV replay; exact when the set fits") {
    val sp = spark
    import sp.implicits._
    val rnd = new Random(170816005L)
    val k = 64
    // planted overlap structure: big∩big, big∩small (small fits → exact)
    val a = (0 until 2000).map(i => s"e$i")
    val b = (1200 until 3200).map(i => s"e$i")         // |a∩b| = 800
    val c = (0 until 40).map(i => s"e${i * 50}")       // small, ⊂-ish of a
    val rows = Seq("A" -> a, "B" -> b, "C" -> c).flatMap { case (s, es) =>
      rnd.shuffle(es).map(e => (s, e)) }
    val df = rows.toDF("s", "e")
    val sk = graft.ext.Sketch.thetaSketches(df, col("s"), col("e"), k)
    val gotSk = sk.collect().map(r => (r.getAs[String]("s"), r.getAs[Long]("rk")) -> r.getAs[Long]("h")).toMap
    // twin: k smallest distinct md5-60("theta:"+e) per set
    val hashesOf = Map("A" -> a, "B" -> b, "C" -> c).view
      .mapValues(_.map(e => md5_60(s"theta:$e")).distinct.sorted.take(k)).toMap
    val wantSk = hashesOf.flatMap { case (s, hs) =>
      hs.zipWithIndex.map { case (h, i) => (s, (i + 1).toLong) -> h } }.toMap
    assert(gotSk == wantSk)
    // twin intersections: theta rule + shared-sample rate-correction
    val pow60 = math.pow(2.0, 60)
    def theta(s: String) =
      if (hashesOf(s).size < k) 1.0 else (hashesOf(s).last + 1).toDouble / pow60
    def round4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wantIx = (for {
      (sa, sb) <- Seq(("A", "B"), ("A", "C"), ("B", "C"))
      th = math.min(theta(sa), theta(sb))
      kin = (hashesOf(sa).toSet & hashesOf(sb).toSet).count(h => (h + 1).toDouble / pow60 <= th)
    } yield (sa, sb, kin.toLong, round4(kin / th))).toSet
    val gotIx = graft.ext.Sketch.thetaIntersections(sk, k).collect()
      .map(r => (r.getAs[String]("sa"), r.getAs[String]("sb"), r.getAs[Long]("kin"),
        r.getAs[Double]("est"))).toSet
    assert(gotIx == wantIx)
    // accuracy contracts: C fits (|C| < k) → A∩C estimate is driven by A's
    // theta sample but every C hash is retained; big∩big estimate within
    // sampling error of the true 800
    val estAB = wantIx.find(t => t._1 == "A" && t._2 == "B").get._4
    assert(math.abs(estAB - 800.0) / 800.0 < 0.5,
      s"theta A∩B estimate $estAB implausibly far from 800")
    assert(theta("C") == 1.0, "fixture degenerate: C did not fit its sketch")
  }

  // ---- Count-Min ------------------------------------------------------
  test("cmsHeavyHitters == twin cell replay; estimates one-sided") {
    val sp = spark
    import sp.implicits._
    val rnd = new Random(170816006L)
    // skewed zipf-ish token stream as documents
    val vocab = (0 until 400).map(i => s"tok$i")
    val docs = (0 until 300).map { _ =>
      val n = 20 + rnd.nextInt(30)
      (0 until n).map { _ =>
        val r = rnd.nextDouble()
        if (r < 0.5) vocab(rnd.nextInt(5))        // heavy head
        else vocab(rnd.nextInt(vocab.size))
      }.mkString(" ")
    }.toDF("text")
    val (d, w, topK) = (4, 256, 15)
    val got = graft.ext.Sketch.cmsHeavyHitters(docs, col("text"), d, w, topK).collect()
      .map(r => (r.getAs[String]("tok"), r.getAs[Long]("cnt"), r.getAs[Long]("estimate"))).toSeq
    // twin: own token counts, own cell map, min over d row estimates
    val counts = docs.collect().map(_.getString(0)).flatMap(
      _.toLowerCase.split("\\W+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def cell(r: Int, tok: String) = java.lang.Math.floorMod(md5_60(s"cms$r:$tok"), w.toLong)
    val mass = counts.toSeq.flatMap { case (t, c) =>
      (0 until d).map(r => (r, cell(r, t)) -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(topK)
      .map { case (t, c) => (t, c, (0 until d).map(r => mass((r, cell(r, t)))).min) }
    assert(got == want)
    assert(want.forall { case (_, c, est) => est >= c }, "CMS under-estimated (impossible)")
    // collisions must be visible at this width (est > cnt somewhere), or
    // the one-sided contract is vacuous on this fixture
    assert(want.exists { case (_, c, est) => est > c },
      "fixture degenerate: no CMS collision at w=256")
  }
}
