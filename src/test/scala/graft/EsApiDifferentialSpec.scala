package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 6 — the API family (`_rank_eval`, `_mtermvectors`,
  * highlight), where the invariants are MECHANICAL:
  *   - rank_eval metrics are recomputable from the request's own hit
  *     list + the ratings table (ES 6.5 contracts: precision@k counts
  *     the top min(k, retrieved) hits with the RETRIEVED count as the
  *     denominator, unrated docs irrelevant; reciprocal_rank and DCG are
  *     k-bounded too);
  *   - term vectors are a pure function of the analyzed token stream
  *     (re-derived here with an independent tokenizer);
  *   - highlight fragments derive from the lowered text + query terms
  *     (first-occurrence positions, ±30 window, fold-ordered tag wrap).
  * Seeded generators; any divergence is an engine bug in the API layer
  * (the underlying search/sort surface is covered by fronts 1–5).
  */
class EsApiDifferentialSpec extends AnyFunSuite with SparkTestBase {

  private val vocab = Seq("spark", "query", "engine", "table", "hash", "merge",
    "scan", "stream", "window", "batch", "filter", "sort", "join", "index")

  private def fixture = {
    val sp = spark
    import sp.implicits._
    val rnd = new Random(424242L)
    (1L to 60L).map { i =>
      val words = Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
      val text = if (i == 60L) "" else words.mkString(" ") +
        (if (i % 5 == 0) ", Mixed-CASE 42 end." else "")
      (i, text, (i * 13 % 400) + 20)
    }.toDF("doc_id", "text", "n_chars")
  }

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq

  test("rank_eval metrics recompute from the hit list (40 seeded requests)") {
    val rnd = new Random(7781L)
    val df = fixture
    val k = 10
    (0 until 40).grouped(8).zipWithIndex.foreach { case (batch, bi) =>
      val reqs = batch.map { i =>
        val lo = rnd.nextInt(350) + 20
        val hi = lo + 20 + rnd.nextInt(200)
        val size = Seq(5, 8, 10, 15)(rnd.nextInt(4))
        val body =
          s"""{"query": {"range": {"n_chars": {"gte": $lo, "lte": $hi}}},
             | "sort": [{"n_chars": {"order": "desc"}}, "doc_id"], "size": $size}""".stripMargin
        (s"q$i", body, Seq(col("n_chars").desc, col("doc_id").asc), lo, hi, size)
      }
      // seeded graded ratings: ~half the docs rated, grades 0..3
      val sp = spark
      import sp.implicits._
      val ratingRows = for {
        (name, _, _, _, _, _) <- reqs
        d <- 1L to 60L
        h = math.abs((name + ":" + d).hashCode)
        if h % 2 == 0
      } yield (name, d, h % 4)
      val ratings = ratingRows.toDF("request", "doc", "rating")
      val got = graft.dsl.EsQueryJson.rankEval(df,
        reqs.map { case (n, b, o, _, _, _) => (n, b, o) },
        idCol = "doc_id", ratings = ratings, k = k)
        .collect().map(r => r.getAs[String]("request") ->
          (r.getAs[Double]("precision"), r.getAs[Double]("reciprocal_rank"),
            r.getAs[Double]("dcg"))).toMap
      // independent twin: hit list from the body's own semantics
      val all = df.collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"))).toSeq
      val ratingMap = ratingRows.map { case (n, d, g) => (n, d) -> g }.toMap
      reqs.foreach { case (name, _, _, lo, hi, size) =>
        val hits = all.filter { case (_, nc) => nc >= lo && nc <= hi }
          .sortBy { case (d, nc) => (-nc, d) }.take(size).map(_._1)
        val topK = hits.take(k)
        val rel = topK.map(d => ratingMap.getOrElse((name, d), 0) > 0)
        val precision = if (topK.isEmpty) 0.0 else
          rel.count(identity).toDouble / topK.size
        val rr = rel.zipWithIndex.collectFirst { case (true, i) => 1.0 / (i + 1) }
          .getOrElse(0.0)
        val dcg = topK.zipWithIndex.map { case (d, i) =>
          val g = ratingMap.getOrElse((name, d), 0)
          if (g > 0) (math.pow(2.0, g) - 1.0) / (math.log(i + 2.0) / math.log(2.0)) else 0.0
        }.sum
        def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (gp, grr, gdcg) = got(name)
        assert(gp == r6(precision) && grr == r6(rr) && gdcg == r6(dcg),
          s"rank_eval divergence (batch $bi, $name, size=$size retrieved=${hits.size}): " +
            s"engine=(p=$gp rr=$grr dcg=$gdcg) twin=(p=${r6(precision)} rr=${r6(rr)} dcg=${r6(dcg)})")
      }
    }
  }

  test("_mtermvectors equals the independent token-stream twin (5 batches)") {
    val rnd = new Random(5531L)
    val df = fixture
    val raw = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    (0 until 5).foreach { bi =>
      val ids = Seq.fill(6)(rnd.nextInt(60) + 1L).distinct
      val got = graft.dsl.EsDsl.mTermVectors(df, col("doc_id"), col("text"), ids)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
          (r.getAs[Long]("term_freq"), r.getAs[String]("positions"))).toMap
      val want = ids.flatMap { id =>
        val toks = tokens(raw(id))
        toks.zipWithIndex.groupBy(_._1).map { case (t, occ) =>
          (id, t) -> (occ.size.toLong, occ.map(_._2).sorted.mkString(","))
        }
      }.toMap
      assert(got == want, s"termvectors divergence (batch $bi, ids=$ids): " +
        s"only-engine=${got.keySet -- want.keySet} only-twin=${want.keySet -- got.keySet} " +
        s"diff=${want.keySet.intersect(got.keySet).filter(k2 => got(k2) != want(k2)).take(5).map(k2 => (k2, got(k2), want(k2)))}")
    }
  }

  test("highlight fragments derive from the lowered text (50 seeded cases)") {
    val rnd = new Random(91457L)
    val df = fixture
    val raw = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    (0 until 50).foreach { ci =>
      val nTerms = 1 + rnd.nextInt(2)
      val terms = rnd.shuffle(vocab).take(nTerms)
      val nFrags = if (rnd.nextBoolean()) 1 else 2 + rnd.nextInt(2)
      val fragSize = Seq(40, 80, 120)(rnd.nextInt(3))
      val (pre, post) = if (rnd.nextBoolean()) ("<em>", "</em>") else ("[", "]")
      val tagOpts = if (pre == "<em>") ""
        else s""", "pre_tags": ["$pre"], "post_tags": ["$post"]"""
      val body =
        s"""{"query": {"match": {"text": "${terms.mkString(" ")}"}},
           | "highlight": {"fields": {"text": {"fragment_size": $fragSize,
           |   "number_of_fragments": $nFrags$tagOpts}}},
           | "sort": ["doc_id"], "size": 60}""".stripMargin
      val rows = graft.dsl.EsQueryJson.search(df, body).collect()
      def wrap(frag: String) =
        terms.foldLeft(frag)((acc, t) => acc.replace(t, s"$pre$t$post"))
      rows.foreach { r =>
        val lowered = raw(r.getAs[Long]("doc_id")).toLowerCase
        if (nFrags == 1) {
          // engine picks the FIRST QUERY TERM present (coalesce order)
          val pos = terms.iterator.map(t => lowered.indexOf(t) + 1).find(_ > 0)
          val want = pos.map { p =>
            val start = math.max(p - 30, 1)
            wrap(lowered.slice(start - 1, start - 1 + fragSize))
          }.orNull
          assert(r.getAs[String]("_highlight") == want,
            s"highlight divergence (case $ci, doc ${r.getAs[Long]("doc_id")}): " +
              s"terms=$terms\n engine=${r.getAs[String]("_highlight")}\n twin=$want")
        } else {
          val hits = terms.map(t => lowered.indexOf(t) + 1).filter(_ > 0)
            .distinct.sorted.take(nFrags)
          val want = hits.map { p =>
            val start = math.max(p - 30, 1)
            wrap(lowered.slice(start - 1, start - 1 + fragSize))
          }
          val gotF = Option(r.getAs[scala.collection.Seq[String]]("_highlight"))
            .map(_.toSeq).getOrElse(Seq.empty)
          assert(gotF == want,
            s"highlight divergence (case $ci, doc ${r.getAs[Long]("doc_id")}): " +
              s"terms=$terms\n engine=$gotF\n twin=$want")
        }
      }
    }
  }
}
