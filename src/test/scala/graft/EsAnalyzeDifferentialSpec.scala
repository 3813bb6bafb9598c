package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 7 — the analyzer chains behind `_analyze` (and
  * therefore behind every match/BM25 row): seeded texts run through the
  * engine's analyzeApi for each built-in analyzer and each registered
  * chain (synonyms, shingles, edge_ngram/ngram), compared token-for-token
  * (position, token, type) against independent plain-Scala twins derived
  * from the ES 6.5 docs — own tokenizers, own Lucene stop set, own
  * Harman S-stemmer from the published rules, own synonym-rule parser.
  * Divergence = an engine analysis bug (position renumbering, filter
  * order, stemmer rule, expansion placement).
  */
class EsAnalyzeDifferentialSpec extends AnyFunSuite with SparkTestBase {

  // ---- independent twins (ES 6.5 semantics, re-derived) ----

  // Lucene's EnglishAnalyzer default stop set (33 words), hardcoded
  // independently of the engine's list — a list drift is a find
  private val luceneStops = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  private def stemS(t: String): String =
    if (t.endsWith("ies") && !t.endsWith("eies") && !t.endsWith("aies"))
      t.dropRight(3) + "y"
    else if (t.endsWith("es") && !t.endsWith("aes") && !t.endsWith("ees") && !t.endsWith("oes"))
      t.dropRight(1)
    else if (t.endsWith("s") && !t.endsWith("us") && !t.endsWith("ss"))
      t.dropRight(1)
    else t

  private def std(text: String): Seq[(Int, String)] =
    text.toLowerCase.split("\\W+").filter(_.nonEmpty).zipWithIndex
      .map { case (t, i) => (i, t) }.toSeq

  type Tok = (Int, String, String)

  private def twin(analyzer: String, text: String, pattern: String = "\\W+"): Seq[Tok] =
    analyzer match {
      case "standard" =>
        std(text).map { case (i, t) =>
          (i, t, if (t.matches("[0-9]+")) "<NUM>" else "<ALPHANUM>") }
      case "whitespace" =>
        text.split("\\s+").filter(_.nonEmpty).zipWithIndex
          .map { case (t, i) => (i, t, "word") }.toSeq
      case "keyword" => Seq((0, text, "word"))
      case "simple" =>
        text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).zipWithIndex
          .map { case (t, i) => (i, t, "word") }.toSeq
      case "stop" =>
        text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).zipWithIndex
          .collect { case (t, i) if !luceneStops(t) => (i, t, "word") }.toSeq
      case "pattern" =>
        text.toLowerCase.split(pattern).filter(_.nonEmpty).zipWithIndex
          .map { case (t, i) => (i, t, "word") }.toSeq
      case "english" =>
        std(text).collect { case (i, t) if !luceneStops(t) => (i, stemS(t), "word") }
      case other => fail(s"no twin for $other")
    }

  private def synTwin(rules: Seq[String], text: String): Seq[Tok] = {
    // independent rule parse: "a, b, c" equivalence class (each member →
    // whole class), "a, b => c, d" explicit mapping (LHS replaced by RHS)
    val m = scala.collection.mutable.Map.empty[String, Seq[String]]
    rules.foreach { r =>
      def ts(s: String) = s.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq
      if (r.contains("=>")) {
        val Array(l, rr) = r.split("=>")
        ts(l).foreach(t => m(t) = (m.getOrElse(t, Seq.empty) ++ ts(rr)).distinct)
      } else {
        val cls = ts(r)
        cls.foreach(t => m(t) = (m.getOrElse(t, Seq.empty) ++ cls).distinct)
      }
    }
    std(text).flatMap { case (i, t) =>
      m.getOrElse(t, Seq(t)).map(mem =>
        (i, mem, if (mem == t) "word" else "SYNONYM"))
    }
  }

  private def shingleTwin(mn: Int, mx: Int, uni: Boolean, text: String): Seq[Tok] = {
    val toks = std(text).map(_._2)
    val grams = (mn to mx).flatMap { n =>
      toks.sliding(n).filter(_.length == n).zipWithIndex
        .map { case (w, i) => (i, w.mkString(" "), "shingle") }
    }
    grams ++ (if (uni) toks.zipWithIndex.map { case (t, i) => (i, t, "word") } else Nil)
  }

  private def ngramTwin(mn: Int, mx: Int, edge: Boolean, text: String): Seq[Tok] =
    std(text).flatMap { case (i, t) =>
      (mn to math.min(mx, t.length)).flatMap { n =>
        if (edge) Seq((i, t.take(n), "word"))
        else (0 to t.length - n).map(off => (i, t.substring(off, off + n), "word"))
      }
    }

  // ---- seeded text corpus ----

  private val words = Seq("Spark", "tables", "QUERIES", "engine", "runs",
    "studies", "goes", "bus", "glass", "the", "and", "into", "batch",
    "windows", "45", "3rd", "x9", "misses", "aes")

  private def texts(n: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    val seps = Seq(" ", ", ", "-", "_", ". ", "  ", "'", " & ")
    val gen = (1 to n).map { _ =>
      val k = 1 + rnd.nextInt(8)
      (1 to k).map(_ => words(rnd.nextInt(words.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
    }
    gen ++ Seq("", " ", "don't stop", "a_b-c d", " leading", "trailing ",
      "42 3rd and 9", "busses glasses ponies")
  }

  private def run(analyzer: String, ts: Seq[String],
                  pattern: String = "\\W+"): Map[Long, Seq[Tok]] = {
    val sp = spark
    import sp.implicits._
    val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out =
      if (analyzer == "pattern")
        graft.dsl.EsDsl.analyzeApi(df, col("id"), col("text"), "pattern", pattern)
      else graft.dsl.EsQueryJson.analyzeApi(df, col("id"), col("text"), analyzer)
    out.collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Int]("position"), r.getAs[String]("token"), r.getAs[String]("token_type"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
  }

  private def compareAll(analyzer: String, ts: Seq[String],
                         twinOf: String => Seq[Tok], pattern: String = "\\W+"): Unit = {
    val got = run(analyzer, ts, pattern)
    ts.zipWithIndex.foreach { case (t, i) =>
      val want = twinOf(t).sorted
      val g = got.getOrElse(i.toLong, Seq.empty)
      assert(g == want,
        s"$analyzer divergence on text #$i ${t.take(60).mkString}\n engine=$g\n twin  =$want")
    }
  }

  test("built-in analyzers match the twins (128 texts x 7 analyzers)") {
    val ts = texts(120, seed = 660L)
    compareAll("standard", ts, twin("standard", _))
    compareAll("whitespace", ts, twin("whitespace", _))
    compareAll("keyword", ts, twin("keyword", _))
    compareAll("simple", ts, twin("simple", _))
    compareAll("stop", ts, twin("stop", _))
    compareAll("english", ts, twin("english", _))
    compareAll("pattern", ts, twin("pattern", _, "[,;]+"), pattern = "[,;]+")
  }

  test("registered chains match the twins: synonyms, shingles, (edge_)ngrams") {
    val ts = texts(80, seed = 661L)
    val rules = Seq("spark, engine, core", "queries, searches => lookups",
      "the => the")
    graft.dsl.EsQueryJson.withSynonyms("syn", rules) {
      compareAll("syn", ts, synTwin(rules, _))
    }
    for ((mn, mx, uni) <- Seq((2, 2, false), (2, 3, true)))
      graft.dsl.EsQueryJson.withShingles("sh", mn, mx, uni) {
        compareAll("sh", ts, shingleTwin(mn, mx, uni, _))
      }
    graft.dsl.EsQueryJson.withEdgeNgrams("eg", 2, 5) {
      compareAll("eg", ts, ngramTwin(2, 5, edge = true, _))
    }
    graft.dsl.EsQueryJson.withNgrams("ng", 2, 3) {
      compareAll("ng", ts, ngramTwin(2, 3, edge = false, _))
    }
  }
}
