package graft

import graft.dsl.EsQueryJson
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial fuzz of the ES-JSON front-end (round-14 task): every
  * generated body — valid, type-skewed, structurally mangled, or
  * truncated — must either compile to a plan or reject loudly with one
  * of the four stable `validateQuery` error classes (`ok`,
  * `parse_error`, `invalid_query`, `unknown_field` — the a198
  * contract). An exception type escaping [[EsQueryJson.validateQuery]]
  * IS the bug this spec hunts: it means some parse path throws outside
  * the classified set (a silent-misparse hazard for callers that
  * branch on the class). Bodies classified `ok` additionally EXECUTE
  * against a live frame — "compiles but explodes at runtime" is the
  * other silent failure mode.
  *
  * The generator is seeded (ScalaCheck `pureApply`), so the corpus is
  * deterministic run-to-run: a found bug stays found. */
class EsJsonFuzzSpec extends AnyFunSuite with SparkTestBase {

  // ---- generator ------------------------------------------------------
  private val strFields = Seq("id", "lang", "source", "text")
  private val numFields = Seq("doc_id", "n_chars")
  private def mixIn(good: Seq[String]): Gen[String] =
    Gen.frequency(9 -> Gen.oneOf(good), 1 -> Gen.const("no_such_field"))
  private val strField = mixIn(strFields)
  private val numField = mixIn(numFields)
  private val anyField = mixIn(strFields ++ numFields)

  private val words = Gen.oneOf("alpha", "beta", "hash", "table", "spark",
    "join", "the", "quick")
  private val phrase = Gen.chooseNum(1, 3)
    .flatMap(n => Gen.listOfN(n, words).map(_.mkString(" ")))
  private val strVal = Gen.oneOf("en", "de", "fr", "web", "wiki", "alpha")
  private val numVal = Gen.chooseNum(-5, 500)

  private def termGen: Gen[String] = Gen.oneOf(
    for { f <- strField; v <- strVal } yield s"""{"term": {"$f": "$v"}}""",
    for { f <- numField; v <- numVal } yield s"""{"term": {"$f": $v}}""")

  private def termsGen: Gen[String] =
    for { f <- strField; a <- strVal; b <- strVal }
      yield s"""{"terms": {"$f": ["$a", "$b"]}}"""

  private def rangeGen: Gen[String] = for {
    f <- numField; lo <- numVal; span <- Gen.chooseNum(1, 200)
    ops <- Gen.oneOf(Seq("gte", "lt"), Seq("gt"), Seq("gte", "lte"))
  } yield {
    val bounds = ops.map {
      case o @ ("gte" | "gt") => s""""$o": $lo"""
      case o => s""""$o": ${lo + span}"""
    }.mkString(", ")
    s"""{"range": {"$f": {$bounds}}}"""
  }

  private def existsGen: Gen[String] =
    anyField.map(f => s"""{"exists": {"field": "$f"}}""")

  private def patternGen: Gen[String] = for {
    f <- strField
    q <- Gen.oneOf(
      s"""{"prefix": {"$f": "a"}}""",
      s"""{"wildcard": {"$f": "a*"}}""",
      s"""{"regexp": {"$f": "[a-z]+"}}""",
      s"""{"regexp": {"$f": "[a-"}}""") // invalid pattern → must classify
  } yield q

  private def idsGen: Gen[String] =
    Gen.listOfN(2, strVal).map(vs =>
      s"""{"ids": {"values": [${vs.map(v => s""""$v"""").mkString(", ")}]}}""")

  private def matchGen: Gen[String] = for {
    f <- Gen.frequency(8 -> Gen.const("text"), 1 -> strField, 1 -> numField)
    q <- phrase
    form <- Gen.oneOf(1, 2, 3, 4, 5, 6)
    msm <- Gen.oneOf("1", "2", "\"75%\"", "\"-25%\"", "\"2<75%\"") // last: unsupported form
    an <- Gen.oneOf("english", "whitespace", "keyword", "klingon") // last: unknown analyzer
    fz <- Gen.oneOf("1", "\"AUTO\"", "\"MAX\"") // last: invalid
  } yield form match {
    case 1 => s"""{"match": {"$f": "$q"}}"""
    case 2 => s"""{"match": {"$f": {"query": "$q", "operator": "and"}}}"""
    case 3 => s"""{"match": {"$f": {"query": "$q", "minimum_should_match": $msm}}}"""
    case 4 => s"""{"match": {"$f": {"query": "$q", "analyzer": "$an"}}}"""
    case 5 => s"""{"match": {"$f": {"query": "$q", "fuzziness": $fz}}}"""
    case 6 => s"""{"match_phrase": {"$f": "$q"}}"""
  }

  private def phraseGen: Gen[String] = for {
    q <- phrase
    form <- Gen.oneOf(1, 2, 3)
  } yield form match {
    case 1 => s"""{"match_phrase": {"text": "$q"}}"""
    case 2 => s"""{"match_phrase": {"text": {"query": "$q", "slop": 1}}}"""
    case 3 => s"""{"match_phrase_prefix": {"text": "$q"}}"""
  }

  // query_string: the Lucene query-bar PARSER — fuzz both well-formed
  // syntax (fields, boolean ops, ranges, fuzzy, grouping) and mangled
  // syntax (unbalanced parens/quotes/brackets, dangling operators)
  private def queryStringGen: Gen[String] = for {
    w1 <- words; w2 <- words; f <- strField; lo <- numVal
    syntax <- Gen.oneOf(
      s"$w1 $w2",
      s"$w1 AND $w2",
      s"$w1 OR NOT $w2",
      s"$f:$w1",
      s"$w1 AND ($w2 OR $f:$w1)",
      s"""\"$w1 $w2\"""",
      s"$w1~1",
      s"n_chars:[$lo TO ${lo + 100}]",
      s"n_chars:>=$lo",
      s"$w1*",
      // mangled: each must classify, not escape
      s"($w1 AND",
      s"""\"$w1""",
      s"n_chars:[$lo TO",
      s"$w1 AND OR $w2",
      ":", "~", "()")
    df <- Gen.oneOf("text", "lang")
  } yield s"""{"query_string": {"query": "${syntax.replace("\"", "\\\"")}", "default_field": "$df"}}"""

  // more_like_this: valid doc-ref / free-text likes plus every reject
  // shape (missing fields/like, unsupported options, bad like entries)
  private def mltGen: Gen[String] = for {
    id <- Gen.chooseNum(0, 29)
    p <- phrase
    form <- Gen.oneOf(
      s"""{"more_like_this": {"fields": ["text"], "like": [{"_id": $id}], "min_term_freq": 1, "min_doc_freq": 1}}""",
      s"""{"more_like_this": {"fields": ["text"], "like": "$p", "min_term_freq": 1, "min_doc_freq": 1, "max_query_terms": 4}}""",
      s"""{"more_like_this": {"fields": ["text"], "like": [{"_id": $id}, "$p"], "min_term_freq": 1, "minimum_should_match": 1}}""",
      s"""{"more_like_this": {"fields": ["text"], "like": "$p", "include": true, "min_term_freq": 1}}""",
      s"""{"more_like_this": {"fields": ["text"], "like": "$p", "unlike": "table", "min_term_freq": 1}}""",
      s"""{"more_like_this": {"fields": ["text"], "like": [{"doc": {"text": "$p"}}], "min_term_freq": 1, "min_doc_freq": 1}}""",
      s"""{"more_like_this": {"like": "$p"}}""",                       // missing fields
      s"""{"more_like_this": {"fields": ["text"]}}""",                 // missing like
      s"""{"more_like_this": {"fields": ["text", "lang"], "like": "$p"}}""", // >1 field
      s"""{"more_like_this": {"fields": ["text"], "like": [{"doc": {"lang": "en"}}]}}""", // artificial doc missing the queried field
      s"""{"more_like_this": {"fields": ["text"], "like": "$p", "stop_words": ["x"]}}""", // unsupported option
      s"""{"more_like_this": {"fields": ["text"], "like": []}}""")     // empty like
  } yield form

  private def malformedLeafGen: Gen[String] = Gen.oneOf(
    """{"frobnicate": {"text": "x"}}""",          // unknown query kind
    """{"term": {"lang": "en", "source": "web"}}""", // two fields in a single-field body
    """{"term": {}}""",                            // empty body
    """{"range": {"n_chars": {"gte": "abc"}}}""",  // non-numeric bound on numeric field
    """{"range": {"n_chars": {"gte": 1, "ltee": 5}}}""", // typo'd bound → reject, not match-all
    """{"term": {"lang": {"value": "en", "boosst": 2}}}""", // typo'd term option
    """{"match": {"text": {"query": "hash", "operatr": "and"}}}""", // typo'd match option
    """{"bool": {"must": [{"term": {"lang": "en"}}], "shuold": []}}""", // typo'd bool clause
    """{"ids": {}}""",                             // missing values
    """{"match": {}}""",                           // no field
    """{"bool": {"must": 3}}""")                   // clause list is a scalar

  private def leafGen: Gen[String] = Gen.frequency(
    3 -> termGen, 2 -> termsGen, 3 -> rangeGen, 2 -> existsGen,
    2 -> patternGen, 1 -> idsGen, 4 -> matchGen, 2 -> phraseGen,
    3 -> queryStringGen, 2 -> mltGen, 2 -> malformedLeafGen)

  private def boolGen(depth: Int): Gen[String] = for {
    nMust <- Gen.chooseNum(0, 2)
    nShould <- Gen.chooseNum(0, 2)
    nNot <- Gen.chooseNum(0, 1)
    nFilter <- Gen.chooseNum(0, 1)
    sub = if (depth <= 0) leafGen else queryGen(depth - 1)
    must <- Gen.listOfN(nMust, sub)
    should <- Gen.listOfN(nShould, sub)
    mnot <- Gen.listOfN(nNot, sub)
    filt <- Gen.listOfN(nFilter, sub)
    msm <- Gen.option(Gen.chooseNum(0, 3))
  } yield {
    val parts = Seq(
      if (must.nonEmpty) Some(s""""must": [${must.mkString(", ")}]""") else None,
      if (should.nonEmpty) Some(s""""should": [${should.mkString(", ")}]""") else None,
      if (mnot.nonEmpty) Some(s""""must_not": [${mnot.mkString(", ")}]""") else None,
      if (filt.nonEmpty) Some(s""""filter": [${filt.mkString(", ")}]""") else None,
      msm.filter(_ => should.nonEmpty).map(m => s""""minimum_should_match": $m""")
    ).flatten
    s"""{"bool": {${parts.mkString(", ")}}}"""
  }

  private def queryGen(depth: Int): Gen[String] =
    Gen.frequency(7 -> leafGen, 3 -> boolGen(depth))

  // metric sub-agg arm: every 6.5 metric kind, script metrics, `missing`,
  // plus reject shapes (unsupported kind, empty spec)
  private def metricGen: Gen[String] = numField.flatMap(nf => Gen.frequency(
    3 -> Gen.const(s"""{"avg": {"field": "$nf"}}"""),
    2 -> Gen.const(s"""{"sum": {"field": "$nf"}}"""),
    2 -> Gen.const(s"""{"min": {"field": "$nf", "missing": 0}}"""),
    2 -> Gen.const(s"""{"max": {"field": "$nf"}}"""),
    2 -> Gen.const(s"""{"value_count": {"field": "$nf"}}"""),
    3 -> Gen.const(s"""{"stats": {"field": "$nf"}}"""),
    2 -> Gen.const(s"""{"extended_stats": {"field": "$nf", "sigma": 3}}"""),
    2 -> Gen.const(s"""{"percentiles": {"field": "$nf", "percents": [25, 50, 75]}}"""),
    1 -> Gen.const(s"""{"percentile_ranks": {"field": "$nf", "values": [10, 100]}}"""),
    2 -> Gen.const(s"""{"cardinality": {"field": "$nf"}}"""),
    1 -> Gen.const(s"""{"weighted_avg": {"value": {"field": "$nf"}, "weight": {"field": "doc_id"}}}"""),
    2 -> Gen.const(s"""{"avg": {"script": "doc['$nf'].value * 2"}}"""),
    1 -> Gen.const(s"""{"sum": {"script": "doc['$nf'].value ** 2"}}"""), // bad script op
    1 -> Gen.const(s"""{"median_absolute_deviation": {"field": "$nf"}}"""), // not a 6.5 metric
    1 -> Gen.const("""{"avg": {}}""")))                                     // no field

  // parent-pipeline arm riding a date_histogram with a metric `m`
  private def pipelineGen: Gen[String] = for {
    nf <- numField
    p <- Gen.oneOf(
      """{"cumulative_sum": {"buckets_path": "m"}}""",
      """{"derivative": {"buckets_path": "m"}}""",
      """{"moving_avg": {"buckets_path": "m", "window": 3}}""",
      """{"serial_diff": {"buckets_path": "m", "lag": 2}}""",
      """{"bucket_script": {"buckets_path": {"x": "m"}, "script": "params.x * 2"}}""",
      """{"bucket_selector": {"buckets_path": {"x": "m"}, "script": "params.x > 10"}}""",
      """{"bucket_sort": {"sort": [{"m": {"order": "desc"}}], "size": 3}}""",
      """{"cumulative_sum": {"buckets_path": "nope"}}""", // dangling path
      """{"derivative": {}}""")                           // missing path
  } yield s"""{"date_histogram": {"field": "ts", "interval": "day"},
             | "aggs": {"m": {"avg": {"field": "$nf"}}, "p": $p}}""".stripMargin

  private def bucketGen: Gen[String] = for {
    f <- anyField; nf <- numField; m <- metricGen
    sub <- Gen.frequency(2 -> Gen.const(""), 3 -> Gen.const(s""", "aggs": {"sub": $m}"""))
    a <- Gen.frequency(
      4 -> Gen.const(s"""{"terms": {"field": "$f", "size": 5}$sub}"""),
      3 -> Gen.const(s"""{"terms": {"field": "$f", "size": 5, "order": {"_key": "desc"}}$sub}"""),
      2 -> Gen.const(s"""{"terms": {"field": "lang", "size": 5, "missing": "none"}$sub}"""),
      1 -> Gen.const(s"""{"terms": {"size": 5}}"""), // no field
      3 -> Gen.const(s"""{"histogram": {"field": "$nf", "interval": 50, "min_doc_count": 1}$sub}"""),
      1 -> Gen.const(s"""{"histogram": {"field": "$nf", "interval": 0}}"""), // invalid: zero interval
      3 -> Gen.const(s"""{"date_histogram": {"field": "ts", "interval": "month"}$sub}"""),
      1 -> Gen.const(s"""{"date_histogram": {"field": "ts", "interval": "fortnight"}}"""), // bad interval
      3 -> Gen.const(s"""{"range": {"field": "$nf", "ranges": [{"to": 50}, {"from": 50, "to": 200}, {"from": 200}]}$sub}"""),
      1 -> Gen.const(s"""{"range": {"field": "$nf", "ranges": []}}"""), // empty ranges
      2 -> Gen.const(s"""{"date_range": {"field": "ts", "ranges": [{"to": "2024-06-01"}, {"from": "2024-06-01"}]}}"""),
      2 -> Gen.const(s"""{"missing": {"field": "$f"}$sub}"""),
      2 -> Gen.const(s"""{"global": {}$sub}"""),
      2 -> Gen.const(s"""{"sampler": {"shard_size": 10}$sub}"""),
      2 -> Gen.const(s"""{"significant_terms": {"field": "lang", "size": 3}}"""),
      2 -> Gen.const(s"""{"adjacency_matrix": {"filters": {"en": {"term": {"lang": "en"}}, "big": {"range": {"n_chars": {"gte": 100}}}}}}"""),
      3 -> Gen.const(s"""{"filters": {"filters": {"a": {"term": {"lang": "en"}}, "b": {"term": {"lang": "de"}}}}$sub}"""),
      1 -> Gen.const(s"""{"filters": {"filters": {"a": {"frobnicate": {}}}}}"""), // bad inner query
      2 -> Gen.const(s"""{"composite": {"size": 5, "sources": [{"l": {"terms": {"field": "lang"}}}, {"s": {"terms": {"field": "source"}}}]}}"""),
      2 -> Gen.const(s"""{"composite": {"size": 5, "sources": [{"l": {"terms": {"field": "lang"}}}], "after": {"l": "de"}}}"""),
      1 -> Gen.const(s"""{"nested": {"path": "items"}$sub}"""), // no nested field in the frame
      1 -> Gen.const(s"""{"frobnicate": {"field": "$f"}}"""),   // unknown agg kind
      2 -> Gen.const(s"""{"histogram": {"field": "$nf", "interval": 50, "min_doc_count": 0}}"""), // data-bounds zero fill
      2 -> Gen.const(s"""{"terms": {"field": "lang", "size": 5}, "aggs": {"m": {"date_histogram": {"field": "ts", "interval": "month", "min_doc_count": 0}}}}"""), // per-series fill
      3 -> Gen.const(s"""{"terms": {"field": "lang", "size": 5}, "aggs": {"m": {"terms": {"field": "$f", "size": 3, "min_doc_count": 0}}}}"""), // per-parent terms-leaf fill (round 15)
      2 -> Gen.const(s"""{"terms": {"field": "lang", "size": 5, "min_doc_count": 0}$sub}"""), // single-level terms fill (round 15)
      1 -> Gen.const(s"""{"terms": {"field": "lang", "size": 5}, "aggs": {"m": {"terms": {"field": "$f", "size": 3, "min_doc_count": 2}}}}"""), // terms leaf mdc>1 → reject
      1 -> Gen.const(s"""{"terms": {"field": "$f", "sizee": 5}}"""), // typo'd option → reject
      1 -> Gen.const(s"""{"avg": {"field": "$nf", "compression": 9}}""")) // unknown metric option → reject
  } yield a

  private def aggsGen: Gen[String] = for {
    a <- Gen.frequency(5 -> bucketGen, 2 -> metricGen, 2 -> pipelineGen)
    // sibling pipeline beside `g` (valid only when `g` is a bucket agg
    // with metric `sub` — the generator doesn't know, so both classes
    // arise: compile or loud classify)
    sib <- Gen.frequency(
      5 -> Gen.const(""),
      1 -> Gen.const(""", "sib": {"avg_bucket": {"buckets_path": "g>sub"}}"""),
      1 -> Gen.const(""", "sib": {"max_bucket": {"buckets_path": "g>_count"}}"""),
      1 -> Gen.const(""", "sib": {"sum_bucket": {"buckets_path": "nosuch>m"}}"""))
  } yield s""""aggs": {"g": $a$sib}"""

  private def sortGen: Gen[String] = Gen.oneOf(
    """"sort": ["doc_id"]""",
    """"sort": [{"n_chars": {"order": "desc"}}, "doc_id"]""",
    """"sort": ["_score", "doc_id"]""",
    """"sort": ["no_such_field"]""")

  // top-level search-body options: paging/fetch/score controls, valid and
  // reject shapes (incl. a typo'd key — ES rejects unknown body keys, and
  // pre-round-14 this engine silently IGNORED them)
  private def topOptGen: Gen[String] = Gen.oneOf(
    """"min_score": 0.5""",
    """"post_filter": {"term": {"lang": "en"}}""",
    """"post_filter": {"frobnicate": {}}""",
    """"_source": ["doc_id", "lang"]""",
    """"_source": false""",
    """"collapse": {"field": "lang"}""",
    """"search_after": [5], "sort": ["doc_id"]""",
    """"highlight": {"fields": {"text": {}}}""",
    """"rescore": {"window_size": 10, "query": {"rescore_query": {"match": {"text": "hash table"}}}}""",
    """"track_scores": true""",
    """"sorrt": ["doc_id"]""", // typo'd key → must reject, not silently ignore
    """"terminate_after": 5""", // unsupported body key → loud reject
    """"script_fields": {"dbl": {"script": "doc['n_chars'].value * 2"}}""",
    """"script_fields": {"bad": {"script": "doc['n_chars'].value ** 2"}}""") // bad op → reject

  private def bodyGen: Gen[String] = for {
    q <- queryGen(2)
    size <- Gen.option(Gen.chooseNum(0, 50).map(n => s""""size": $n"""))
    from <- Gen.option(Gen.chooseNum(0, 10).map(n => s""""from": $n"""))
    sort <- Gen.option(sortGen)
    aggs <- Gen.frequency(2 -> Gen.const(None), 1 -> aggsGen.map(Some(_)))
    opt <- Gen.frequency(3 -> Gen.const(None), 1 -> topOptGen.map(Some(_)))
    mangle <- Gen.frequency(9 -> Gen.const(0), 1 -> Gen.chooseNum(1, 8))
  } yield {
    val parts = Seq(Some(s""""query": $q"""), size, from, sort, aggs, opt).flatten
    val body = s"{${parts.mkString(", ")}}"
    if (mangle == 0) body else body.dropRight(mangle) // truncation → parse_error
  }

  // ---- the corpus (deterministic) --------------------------------------
  private val N = 1500
  private val corpus: Seq[String] =
    Gen.listOfN(N, bodyGen).pureApply(Gen.Parameters.default, Seed(20260815L))

  private def docs = {
    val sp = spark
    import sp.implicits._
    (0 until 30).map { i =>
      (s"d$i", i.toLong, Seq("en", "de", "fr")(i % 3), Seq("web", "wiki")(i % 2),
        s"alpha beta doc $i hash table spark join", (i * 17 + 3).toLong,
        java.sql.Timestamp.valueOf(f"2024-${i % 12 + 1}%02d-${i % 27 + 1}%02d 08:30:00"))
    }.toDF("id", "doc_id", "lang", "source", "text", "n_chars", "ts")
  }

  test(s"fuzz: $N random bodies all classify into the a198 error classes") {
    val classified = EsQueryJson.validateQuery(docs,
        corpus.zipWithIndex.map { case (b, i) => (f"q$i%04d", b) })
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
    assert(classified.length == N)
    val classes = classified.map(_._3).toSet
    assert(classes.subsetOf(Set("ok", "parse_error", "invalid_query", "unknown_field")))
    // generator coverage sanity: every class actually occurs, and the
    // corpus is not degenerate (mostly-valid bodies with a real error tail)
    val byClass = classified.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byClass.keySet == Set("ok", "parse_error", "invalid_query", "unknown_field"),
      s"missing class: $byClass")
    assert(byClass("ok") > N / 3, s"generator degenerated: $byClass")
  }

  test("fuzz: every ok-classified body also EXECUTES (compiles ⇒ runs)") {
    val d = docs.cache()
    try {
      val ok = EsQueryJson.validateQuery(d,
          corpus.zipWithIndex.map { case (b, i) => (f"q$i%04d", b) })
        .filter(col("error_class") === "ok")
        .collect().map(_.getString(0).stripPrefix("q").toInt)
      // bounded run budget: a deterministic stratified sample (every k-th
      // ok body) — still covers all generator arms over a 1500-body corpus
      val sample = ok.zipWithIndex.collect { case (i, j) if j % 5 == 0 => i }
      assert(sample.length >= 80, s"too few ok bodies to fuzz-execute: ${ok.length}")
      sample.foreach { i =>
        try {
          EsQueryJson.search(d, corpus(i)).collect()
          // validate compiles aggs too — so ok bodies with aggs must
          // also EXECUTE their aggregations
          if (corpus(i).contains("\"aggs\""))
            EsQueryJson.aggregations(d, corpus(i)).values.foreach(_.collect())
        }
        catch { case e: Throwable =>
          fail(s"ok-classified body q$i failed at execution: ${e.getMessage}\n${corpus(i)}")
        }
      }
    } finally { d.unpersist(); () }
  }
}
