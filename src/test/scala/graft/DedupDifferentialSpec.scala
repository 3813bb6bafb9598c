package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 16 — the DEDUP family (first Tier-C front; fronts
  * 1–15 cover the Tier-B query surface).
  *
  * A seeded generator builds a corpus with controlled duplication
  * structure — exact copies, k-token mutations, containment (short doc
  * quoted inside a long one), token shuffles, shared boilerplate — and a
  * plain-Scala TWIN recomputes every pairwise result from the documented
  * contracts with NO engine code: its own tokenizer (lowercase `\W+`),
  * its own md5-60 (hex-string slice — a different formulation than the
  * kernels' big-endian byte fold), its own shingle/winnow/minhash/simhash
  * models, its own union-find for clusters. Engine answers must match the
  * twin EXACTLY where the operator is exact (ngramJaccard, capped
  * variant's documented miss rule, simhash banded pairs, containment,
  * soft-dedup weights, canonical selection) and be a verified SUBSET with
  * predicted candidates where it is sketch-bounded (minhash LSH — the
  * twin replays the full signature+banding model, so even the candidate
  * set is predicted, not just bounded).
  *
  * Reference surface: the near-dup family SURVEY §2 C1/C2 assigns to the
  * engine (the reference delegates no dedup — this is the north-star
  * extension set), contracts documented at [[graft.ext.Dedup]].
  * Seeded — deterministic corpus, found bugs stay found. */
class DedupDifferentialSpec extends AnyFunSuite with SparkTestBase {

  // ---- independent primitives (no engine code) -------------------------
  private def toks(s: String): Array[String] =
    s.toLowerCase.split("\\W+").filter(_.nonEmpty)

  /** md5-60 via the hex string (the kernels fold bytes — different path,
    * same documented value: first 15 hex chars as a 60-bit long). */
  private def md5_60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def shingles3(s: String): Seq[String] = {
    val t = toks(s)
    if (t.length < 3) Seq.empty
    else t.sliding(3).map(_.mkString(" ")).toSeq.distinct
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def jac(a: Seq[String], b: Seq[String]): Double = {
    val (sa, sb) = (a.toSet, b.toSet)
    val inter = (sa & sb).size
    round6(inter.toDouble / (sa.size + sb.size - inter))
  }

  // ---- seeded corpus ---------------------------------------------------
  private val vocab = (0 until 60).map(i => s"w$i")
  private lazy val corpus: Seq[(Long, String)] = {
    val rnd = new Random(170816001L)
    def randDoc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val boiler = "w1 w2 w3 w4 w5 w6 w7 w8" // shared boilerplate run
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until 24).foreach { _ => out += randDoc(20 + rnd.nextInt(40)) }
    // exact duplicates
    (0 until 6).foreach { _ => out += out(rnd.nextInt(24)) }
    // near-dups: mutate k tokens of an existing doc
    (0 until 12).foreach { _ =>
      val base = toks(out(rnd.nextInt(24)))
      val k = 1 + rnd.nextInt(4)
      val mut = base.clone()
      (0 until k).foreach(_ => mut(rnd.nextInt(mut.length)) = vocab(rnd.nextInt(vocab.size)))
      out += mut.mkString(" ")
    }
    // containment: a short doc fully quoted inside a longer one
    (0 until 4).foreach { _ =>
      val short = randDoc(12 + rnd.nextInt(6))
      out += short
      out += s"${randDoc(25 + rnd.nextInt(20))} $short ${randDoc(10)}"
    }
    // token shuffles (same bag, different shingles)
    (0 until 4).foreach { _ =>
      val base = toks(out(rnd.nextInt(24)))
      out += rnd.shuffle(base.toSeq).mkString(" ")
    }
    // boilerplate-heavy docs (hot grams for the capped variant)
    (0 until 8).foreach { _ => out += s"$boiler ${randDoc(10 + rnd.nextInt(15))}" }
    out.toSeq.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  private lazy val docsDf = {
    val sp = spark
    import sp.implicits._
    corpus.toDF("id", "text")
  }

  private lazy val sh3ById: Map[Long, Seq[String]] =
    corpus.map { case (id, t) => id -> shingles3(t) }.toMap

  /** Twin all-pairs Jaccard at a threshold (pairs sharing ≥1 gram). */
  private def twinPairs(threshold: Double): Map[(Long, Long), Double] =
    (for {
      (a, ga) <- sh3ById.toSeq; (b, gb) <- sh3ById.toSeq
      if a < b && (ga.toSet & gb.toSet).nonEmpty
      j = jac(ga, gb) if j >= threshold
    } yield (a, b) -> j).toMap

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
      r.getAs[Double]("jac")).toMap

  // ---- the differentials -----------------------------------------------
  test("ngramJaccard == twin all-pairs (exact ground truth)") {
    val got = collectPairs(graft.ext.Dedup.ngramJaccard(docsDf, col("id"), col("text"),
      threshold = 0.3))
    val want = twinPairs(0.3)
    assert(got == want, s"diff: engine-only=${got.keySet -- want.keySet} " +
      s"twin-only=${want.keySet -- got.keySet}")
    assert(want.nonEmpty && want.values.exists(_ < 1.0),
      "fixture degenerate: no partial near-dup pairs")
  }

  test("ngramJaccardCapped: documented miss rule — drop pairs whose EVERY shared gram is hot") {
    val maxDf = 3
    val dfreq = sh3ById.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val want = twinPairs(0.3).filter { case ((a, b), _) =>
      (sh3ById(a).toSet & sh3ById(b).toSet).exists(g => dfreq(g) <= maxDf)
    }
    val got = collectPairs(graft.ext.Dedup.ngramJaccardCapped(docsDf, col("id"), col("text"),
      threshold = 0.3, maxDf = maxDf))
    assert(got == want)
    // the cap must actually bite on this fixture (boilerplate grams are hot)
    assert(dfreq.values.max > maxDf, "fixture degenerate: no hot gram")
  }

  test("minhashLsh == twin's full signature+banding replay (candidates predicted, not just bounded)") {
    val (numHashes, bandSize, threshold) = (16, 2, 0.3)
    // twin signatures from the documented family: sig[i] = min md5-60("i:"+gram)
    val sigs: Map[Long, Seq[Long]] = sh3ById.collect { case (id, grams) if grams.nonEmpty =>
      id -> (0 until numHashes).map(i => grams.map(g => md5_60(s"$i:$g")).min)
    }.toMap
    val nBands = numHashes / bandSize
    def bandKeys(s: Seq[Long]): Seq[Seq[Long]] =
      (0 until nBands).map(j => s.slice(j * bandSize, (j + 1) * bandSize))
    val want = (for {
      (a, sa) <- sigs.toSeq; (b, sb) <- sigs.toSeq
      if a < b && bandKeys(sa).zip(bandKeys(sb)).exists { case (x, y) => x == y }
      j = jac(sh3ById(a), sh3ById(b)) if j >= threshold
    } yield (a, b) -> j).toMap
    val got = collectPairs(graft.ext.Dedup.minhashLsh(docsDf, col("id"), col("text"),
      numHashes, bandSize, threshold))
    assert(got == want)
    // and the sketch recall contract holds on this fixture: every
    // high-similarity twin pair (J ≥ 0.75: miss prob (1−J²)⁸ ≈ 1e-3) is found
    val high = twinPairs(0.75)
    assert(high.nonEmpty, "fixture degenerate: no high-J pairs")
    assert(high.keySet.subsetOf(got.keySet),
      s"LSH missed high-J pairs: ${high.keySet -- got.keySet}")
  }

  test("containmentPairs == twin winnowing containment (doc-inside-doc detector)") {
    val (n, w, minShared, minContain) = (5, 4, 2, 0.5)
    // twin winnowing: md5-60 of 5-grams, window-of-4 minima, distinct
    def winnow(s: String): Set[Long] = {
      val t = toks(s)
      val hs = t.sliding(n).filter(_.length == n).map(g => md5_60(g.mkString(" "))).toArray
      if (hs.length < w) Set.empty
      else hs.sliding(w).map(_.min).toSet
    }
    val fps = corpus.map { case (id, t) => id -> winnow(t) }.toMap
    val want = (for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq
      if a < b
      shared = (fa & fb).size if shared >= minShared
      ca = round6(shared.toDouble / fa.size); cb = round6(shared.toDouble / fb.size)
      if math.max(ca, cb) >= minContain
    } yield (a, b) -> ((shared.toLong, fa.size.toLong, fb.size.toLong, ca, cb))).toMap
    val got = graft.ext.Dedup.containmentPairs(docsDf, col("id"), col("text"),
        n, w, minShared, minContain, maxDf = 1000)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Long]("n_fp_a"), r.getAs[Long]("n_fp_b"),
          r.getAs[Double]("contain_a"), r.getAs[Double]("contain_b")))).toMap
    assert(got == want)
    // the asymmetric detector must fire on the planted containments where
    // symmetric Jaccard stays below ITS OWN pairing bar
    val asymOnly = want.filter { case (k, v) => (v._4 >= 0.9 || v._5 >= 0.9) &&
      twinPairs(0.3).get(k).forall(_ < 0.3) }
    assert(asymOnly.nonEmpty, "fixture degenerate: no containment-only pair")
  }

  test("simhash + banded pairs == twin bit-vote and brute-force Hamming (pigeonhole-exact)") {
    val maxDist = 3
    def twinSimhash(s: String): Long = {
      val votes = Array.fill(60)(0)
      toks(s).foreach { t =>
        val h = md5_60(t)
        (0 until 60).foreach(j => if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1)
      }
      (0 until 60).foldLeft(0L)((acc, j) => if (votes(j) > 0) acc | (1L << j) else acc)
    }
    val twinSigs = corpus.map { case (id, t) => id -> twinSimhash(t) }.toMap
    val sig = graft.ext.Dedup.simhash(docsDf, col("id"), col("text"))
    val gotSigs = sig.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(gotSigs == twinSigs)
    val want = (for {
      (a, ha) <- twinSigs.toSeq; (b, hb) <- twinSigs.toSeq
      if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxDist
    } yield (a, b) -> d).toMap
    val got = graft.ext.Dedup.simhashPairs(sig, maxDist).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Int]("hamming")).toMap
    assert(got == want)
    assert(want.exists(_._2 > 0), "fixture degenerate: only distance-0 pairs")
  }

  test("softDedupWeights + canonicalByQuality == twin union-find over the pair graph") {
    val pairs = graft.ext.Dedup.ngramJaccard(docsDf, col("id"), col("text"), threshold = 0.5)
    // twin union-find (min-label components) over the SAME pair list the
    // engine consumes — the cluster/weight/keeper algebra is what's under test
    val es = twinPairs(0.5).keySet
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb } }
    val touched = es.flatMap(p => Seq(p._1, p._2))
    val cluster = corpus.map(_._1).map(id =>
      id -> (if (touched(id)) find(id) else id)).toMap
    val csize = cluster.values.groupBy(identity).view.mapValues(_.size).toMap
    val wantW = corpus.map(_._1).map(id =>
      (id, cluster(id), round6(1.0 / csize(cluster(id))))).sortBy(_._1)
    val gotW = graft.ext.Dedup.softDedupWeights(docsDf, col("id"), pairs)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster"),
        r.getAs[Double]("weight"))).toSeq
    assert(gotW == wantW)
    assert(csize.values.max >= 3, "fixture degenerate: no cluster of ≥3")
    // canonical selection: keeper = argmax quality (here: text length, ties → min id)
    val qual = corpus.map { case (id, t) => id -> t.length.toLong }.toMap
    val wantK = corpus.map(_._1).map { id =>
      val members = cluster.collect { case (m, c) if c == cluster(id) => m }
      val keeper = members.maxBy(m => (qual(m), -m))
      (id, cluster(id), qual(id), keeper, id == keeper)
    }.sortBy(_._1)
    val gotK = graft.ext.Dedup.canonicalByQuality(docsDf, col("id"), pairs,
        length(col("text")).cast("long"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("q"), r.getAs[Long]("keeper_id"), r.getAs[Boolean]("is_keeper"))).toSeq
    assert(gotK == wantK)
    // and the survivor set of removeNearDuplicates: corpus minus pair doc_b's
    val wantSurv = corpus.map(_._1).toSet -- es.map(_._2)
    val gotSurv = graft.ext.Dedup.removeNearDuplicates(docsDf, col("id"), pairs)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotSurv == wantSurv)
  }
}
