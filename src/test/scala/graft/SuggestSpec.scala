package graft

import graft.dsl.Suggest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SuggestSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sp = spark
  import scala.language.implicitConversions

  private def docs = {
    import sp.implicits._
    Seq(
      (1L, "spark table scan"),
      (2L, "spark table merge"),
      (3L, "spark query fast"),
      (4L, "sort query slow"),
      (5L, "spark table scan")).toDF("doc_id", "text")
  }

  test("vocabulary: doc_freq vs term_freq") {
    val v = Suggest.vocabulary(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v("spark") == (4L, 4L))
    assert(v("table") == (3L, 3L))
    assert(v("query") == (2L, 2L))
  }

  test("suggest_mode popular only keeps corrections beating the input's doc_freq") {
    import sp.implicits._
    // vocab: cat df 4, hat df 2, bat df 1. For input "hat": always mode
    // suggests both 1-edit neighbors; popular keeps only cat (4 > 2) and
    // gates bat (1 < 2).
    val d2 = Seq((1L, "cat hat"), (2L, "cat hat"), (3L, "cat bat"), (4L, "cat"))
      .toDF("doc_id", "text")
    def sugg(mode: String) =
      Suggest.termSuggest(d2, col("doc_id"), col("text"), "hat", mode = mode)
        .collect().map(_.getString(2)).toSet
    assert(sugg("always") == Set("cat", "bat"))
    assert(sugg("popular") == Set("cat"))
    assert(sugg("missing").isEmpty) // "hat" exists -> nothing to correct
  }

  test("term suggester: excludes the input token, ranks by doc_freq, caps edits") {
    val out = Suggest.termSuggest(docs, col("doc_id"), col("text"),
      "sprk spark", size = 3, maxEdits = 2).collect()
    val bySprk = out.filter(_.getString(0) == "sprk").sortBy(_.getInt(1))
    assert(bySprk.head.getString(2) == "spark") // doc_freq 4 beats the rest
    assert(bySprk.forall(_.getInt(3) <= 2))
    // the correctly-spelled token never suggests itself
    assert(out.filter(_.getString(0) == "spark").forall(_.getString(2) != "spark"))
  }

  test("completion suggester: prefix filter + weight order") {
    val out = Suggest.completionSuggest(docs, col("doc_id"), col("text"), "s", size = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.head == ("spark", 4L))
    assert(out.forall(_._1.startsWith("s")))
    assert(out.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("completion suggester: fuzzy prefix + contexts") {
    import sp.implicits._
    val ctxDocs = Seq(
      (1L, "spark table", "en"), (2L, "spark merge", "en"),
      (3L, "spark query", "de"), (4L, "sort things", "en"))
      .toDF("doc_id", "text", "lang")
    // typo'd prefix: "sprk" completes to spark via 1 Damerau edit
    val fz = Suggest.completionSuggest(ctxDocs, col("doc_id"), col("text"),
      "sprk", fuzziness = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(fz.head == ("spark", 3L))
    // fuzzy prefix_length pins the first char: "xprk" matches nothing
    assert(Suggest.completionSuggest(ctxDocs, col("doc_id"), col("text"),
      "xprk", fuzziness = 1).collect().isEmpty)
    // context narrows the dictionary AND the weights (en-only spark = 2)
    val ctx = Suggest.completionSuggest(ctxDocs, col("doc_id"), col("text"),
      "sprk", fuzziness = 1, contexts = Seq((col("lang"), Seq("en"))))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(ctx.head == ("spark", 2L))
    // fuzziness 0 stays exact-prefix
    assert(Suggest.completionSuggest(ctxDocs, col("doc_id"), col("text"),
      "sprk").collect().isEmpty)
  }

  test("phrase suggester: bigram counts rerank candidate phrases") {
    // "sprk tble": position-0 candidates {spark}, position-1 {table};
    // with max_edits=2 position-0 also admits 'sort' — 'spark table'
    // (bigram count 3) must outrank 'sort table' (count 0).
    val out = Suggest.phraseSuggest(docs, col("doc_id"), col("text"),
      "sprk tble", size = 5, maxEdits = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.head._1 == "spark table" && out.head._2 == 3L)
    assert(out.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("suggest plans stay distributed: no single-partition window") {
    val plan = Suggest.termSuggest(docs, col("doc_id"), col("text"), "sprk")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") || plan.contains("windowspecdefinition"),
      "term suggest window must carry a partition spec")
    val cPlan = Suggest.completionSuggest(docs, col("doc_id"), col("text"), "s")
      .queryExecution.executedPlan.toString
    assert(!cPlan.contains("Window"), "completion is sort-limit, no window")
  }

  test("phrase suggester: n-token bigram-sum and 1-token unigram paths") {
    // 3 tokens: score = bigram(t0 t1) + bigram(t1 t2); "spark table scan"
    // appears twice (docs 1 and 5) -> spark-table=3, table-scan=2 -> 5
    val out3 = Suggest.phraseSuggest(docs, col("doc_id"), col("text"),
      "sprk tble scn", size = 5, maxEdits = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out3.head == ("spark table scan", 5L))
    assert(out3.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // 1 token: unigram term_freq ranking
    val out1 = Suggest.phraseSuggest(docs, col("doc_id"), col("text"),
      "sprk", size = 3, maxEdits = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out1.head == ("spark", 4L))
  }
}
