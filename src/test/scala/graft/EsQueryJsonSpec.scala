package graft

import graft.dsl.EsQueryJson
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ES-JSON front-end == typed DSL on the same data. */
class EsQueryJsonSpec extends AnyFunSuite with SparkTestBase {

  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("_field_caps maps nested/object/date types and gates aggregatable") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "t", Seq(1.0), Map("k" -> "v"),
      new java.sql.Timestamp(0L), 1.5f, true, Seq("a"), Seq((1L, "x"))))
      .toDF("id", "txt", "arr", "m", "ts", "f", "b", "tags", "objs")
    val caps = EsQueryJson.fieldCaps(df).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(caps("id") == (("long", true, true)))
    assert(caps("txt") == (("text", true, false)))   // text: no fielddata -> not aggregatable
    // ES has no array type: arrays of scalars report the element type
    // (multi-valued field); only arrays of objects are nested
    assert(caps("arr") == (("double", true, true)))
    assert(caps("tags") == (("text", true, false)))
    assert(caps("objs") == (("nested", true, false)))
    assert(caps("m") == (("object", true, false)))
    assert(caps("ts") == (("date", true, true)))
    assert(caps("f") == (("float", true, true)))
    assert(caps("b") == (("boolean", true, true)))
  }

  test("metric agg script: expression metric matches the hand-built aggregate") {
    val got = EsQueryJson.aggregations(orders,
      """{"aggs": {"s": {"terms": {"field": "o_orderstatus", "size": 5},
        | "aggs": {"half": {"avg": {"script": "doc['o_totalprice'].value / 2"}}}}}}""".stripMargin)("s")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val want = orders.groupBy("o_orderstatus")
      .agg(round(avg(col("o_totalprice") / 2), 6).as("half"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("stats metric: 5-value response, nulls skipped, missing substitutes") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(10.0)), ("a", None), ("a", Some(30.0)),
      ("b", Some(5.0))).toDF("g", "v")
    val rows = EsQueryJson.aggregations(df,
      """{"aggs": {"g": {"terms": {"field": "g", "size": 5},
        | "aggs": {"st": {"stats": {"field": "v"}},
        |          "sm": {"stats": {"field": "v", "missing": 0}}}}}}""".stripMargin)("g")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    // nulls skipped: count 2 of 3 docs; avg over present values only
    assert(a.getAs[Long]("st_count") == 2L && a.getAs[Double]("st_min") == 10.0 &&
      a.getAs[Double]("st_max") == 30.0 && a.getAs[Double]("st_avg") == 20.0 &&
      a.getAs[Double]("st_sum") == 40.0)
    // `missing` folds the null doc in as 0
    assert(a.getAs[Long]("sm_count") == 3L && a.getAs[Double]("sm_min") == 0.0 &&
      a.getAs[Double]("sm_avg") == (40.0 / 3 * 1e6).round / 1e6)
    assert(rows("b").getAs[Long]("st_count") == 1L &&
      rows("b").getAs[Double]("st_sum") == 5.0)
  }

  test("round-14 fuzz finds stay found: interval/ranges/type-contract rejects") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("g", "v")
    // histogram interval must be > 0 (was a runtime DIVIDE_BY_ZERO)
    intercept[IllegalArgumentException] {
      EsQueryJson.aggregations(df,
        """{"aggs": {"g": {"histogram": {"field": "v", "interval": 0}}}}""")
    }
    // unknown date_histogram unit (date_trunc would silently NULL-bucket)
    intercept[IllegalArgumentException] {
      graft.dsl.EsDsl.dateHistogramBucket(col("v"), "fortnight")
    }
    // empty ranges array (was NoSuchElementException: head of empty list)
    intercept[IllegalArgumentException] {
      EsQueryJson.aggregations(df,
        """{"aggs": {"g": {"range": {"field": "v", "ranges": []}}}}""")
    }
    // scored match_phrase on a numeric field: analysis-time reject via the
    // kernel input contract (was a runtime ClassCastException)
    intercept[org.apache.spark.sql.AnalysisException] {
      EsQueryJson.search(df,
        """{"query": {"match_phrase": {"v": "x y"}}, "sort": ["_score"]}""")
        .queryExecution.analyzed
    }
    // _score sort over a filter-like kind compiles and scores 1.0
    val r = EsQueryJson.search(df,
      """{"query": {"term": {"g": "a"}}, "sort": ["_score"], "size": 5}""")
      .select("_score").collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(1.0))
  }

  test("suggesters reject unknown options loudly") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("g", "doc_id")
    intercept[IllegalArgumentException] {
      EsQueryJson.suggest(df,
        """{"s": {"text": "x", "term": {"field": "g", "max_editz": 2}}}""")
    }
    intercept[IllegalArgumentException] {
      EsQueryJson.suggest(df,
        """{"s": {"text": "x", "phrase": {"field": "g", "string_distance": "ngram"}}}""")
    }
    intercept[IllegalArgumentException] {
      EsQueryJson.suggest(df,
        """{"s": {"prefix": "x", "completion": {"field": "g", "skip_duplicates": true}}}""")
    }
  }

  test("fuzzy prefix_length prunes non-matching prefixes; transpositions default Damerau") {
    def ids(body: String) = EsQueryJson.search(orders, body)
      .select("o_orderpriority").distinct().collect().map(_.getString(0)).toSet
    // without prefix_length, "3-MEDIUMX" (1 edit) matches 3-MEDIUM
    val loose = ids("""{"query": {"fuzzy": {"o_orderpriority":
      | {"value": "3-MEDIUMX", "fuzziness": 1}}}}""".stripMargin)
    assert(loose == Set("3-MEDIUM"))
    // prefix_length 3 vs a value whose 3rd char differs -> nothing
    val pruned = ids("""{"query": {"fuzzy": {"o_orderpriority":
      | {"value": "3xMEDIUM", "fuzziness": 1, "prefix_length": 3}}}}""".stripMargin)
    assert(pruned.isEmpty)
    // ES default transpositions:true — a swapped pair is ONE edit
    val swapped = ids("""{"query": {"fuzzy": {"o_orderpriority":
      | {"value": "2-HGIH", "fuzziness": 1}}}}""".stripMargin)
    assert(swapped == Set("2-HIGH"))
    // transpositions:false opts back into classic Levenshtein (2 edits)
    val classic = ids("""{"query": {"fuzzy": {"o_orderpriority":
      | {"value": "2-HGIH", "fuzziness": 1, "transpositions": false}}}}""".stripMargin)
    assert(classic.isEmpty)
  }

  test("synonym analyzer: expansion classes, explicit mapping, msm over positions") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "spark engines win"), (2L, "fast zebra runs"),
      (3L, "database admin"), (4L, "db admin"), (5L, "nothing here"))
      .toDF("doc_id", "text")
    def ids(body: String) = EsQueryJson.withSynonyms("syn",
      Seq("rapid, quick, spark", "fast => quick", "db, rdbms => database")) {
      EsQueryJson.search(docs, body)
    }.select("doc_id").collect().map(_.getLong(0)).toSet
    // equivalence class: "rapid" matches docs containing spark
    assert(ids("""{"query": {"match": {"text": {"query": "rapid", "analyzer": "syn"}}}}""") == Set(1L))
    // explicit mapping: "fast" is REPLACED by quick -> doc 2's literal
    // "fast" no longer matches itself
    assert(ids("""{"query": {"match": {"text": {"query": "fast", "analyzer": "syn"}}}}""") == Set.empty)
    // db => database: query "rdbms" finds the database doc, not the db doc
    assert(ids("""{"query": {"match": {"text": {"query": "rdbms", "analyzer": "syn"}}}}""") == Set(3L))
    // msm over original positions: both terms required under operator:and
    assert(ids("""{"query": {"match": {"text":
      | {"query": "rapid zebra", "analyzer": "syn", "operator": "and"}}}}""".stripMargin) == Set.empty)
    assert(ids("""{"query": {"match": {"text":
      | {"query": "rapid engines", "analyzer": "syn", "operator": "and"}}}}""".stripMargin) == Set(1L))
    // unregistered term passes through unexpanded
    assert(ids("""{"query": {"match": {"text": {"query": "admin", "analyzer": "syn"}}}}""") == Set(3L, 4L))
    // multi-word expansion is a PHRASE alternative (synonym_graph shape)
    val mw = EsQueryJson.withSynonyms("syn", Seq("usa => united states")) {
      EsQueryJson.search(
        Seq((10L, "the united states of america"), (11L, "united airlines states"))
          .toDF("doc_id", "text"),
        """{"query": {"match": {"text": {"query": "usa", "analyzer": "syn"}}}}""")
    }.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(mw == Set(10L)) // consecutive "united states" only
  }

  test("shingle analyzer: bigram clauses, msm, output_unigrams") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "the data merge runs"), (2L, "the data lake"), (3L, "data merge"))
      .toDF("doc_id", "text")
    def ids(body: String) = EsQueryJson.withShingles("sh2") {
      EsQueryJson.search(docs, body)
    }.select("doc_id").collect().map(_.getLong(0)).toSet
    // both bigrams required under msm=2: only doc 1 has "the data" AND "data merge"
    assert(ids("""{"query": {"match": {"text": {"query": "the data merge",
      | "analyzer": "sh2", "minimum_should_match": 2}}}}""".stripMargin) == Set(1L))
    // msm default 1: any shingle
    assert(ids("""{"query": {"match": {"text": {"query": "the data merge",
      | "analyzer": "sh2"}}}}""".stripMargin) == Set(1L, 2L, 3L))
    // output_unigrams: a unigram clause alone can match
    val uni = EsQueryJson.withShingles("shu", outputUnigrams = true) {
      EsQueryJson.search(docs,
        """{"query": {"match": {"text": {"query": "lake", "analyzer": "shu"}}}}""")
    }.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(uni == Set(2L))
  }

  test("match fuzziness: per-term AUTO budgets, prefix_length, msm") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "spark table scan"), (2L, "spork bable"), (3L, "nothing here"))
      .toDF("doc_id", "text")
    def ids(body: String) = EsQueryJson.search(docs, body)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // "sprk" (4 chars -> AUTO 1) matches spark (insert) and spork (sub)
    assert(ids("""{"query": {"match": {"text": {"query": "sprk", "fuzziness": "AUTO"}}}}""") == Set(1L, 2L))
    // msm=2: both typo'd terms must fuzzy-match somewhere in the doc
    assert(ids("""{"query": {"match": {"text": {"query": "sprk tble",
      | "fuzziness": "AUTO", "minimum_should_match": 2}}}}""".stripMargin) == Set(1L))
    // prefix_length=2 kills the spark match for "eprk"-style typos
    assert(ids("""{"query": {"match": {"text": {"query": "xprk",
      | "fuzziness": 1, "prefix_length": 2}}}}""".stripMargin) == Set.empty)
    // fuzziness 0 behaves like the exact path
    assert(ids("""{"query": {"match": {"text": {"query": "spark", "fuzziness": 0}}}}""") == Set(1L))
  }

  test("query_string phrase proximity and match_phrase slop share semantics") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "spark table merge"), (2L, "spark a b c d merge"), (3L, "merge spark"))
      .toDF("doc_id", "text")
    def ids(body: String) = EsQueryJson.search(docs, body)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // qs NEAR: 1 gap within budget, 4 gaps out; the reversed adjacent
    // pair (doc 3) spans 2 shifted positions — in at slop ≥ 2 (Lucene
    // transposition cost), out at slop 1
    assert(ids("""{"query": {"query_string": {
      | "query": "\"spark merge\"~1", "default_field": "text"}}}""".stripMargin) == Set(1L))
    assert(ids("""{"query": {"query_string": {
      | "query": "\"spark merge\"~4", "default_field": "text"}}}""".stripMargin) == Set(1L, 2L, 3L))
    // match_phrase slop agrees
    assert(ids("""{"query": {"match_phrase": {"text": {"query": "spark merge", "slop": 1}}}}""") == Set(1L))
    assert(ids("""{"query": {"match_phrase": {"text": {"query": "spark merge", "slop": 2}}}}""") == Set(1L, 3L))
    // simple_query_string NEAR operator
    val sq = EsQueryJson.search(docs, """{"query": {"simple_query_string": {
      | "query": "\"spark merge\"~4", "fields": ["text"]}}}""".stripMargin)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sq == Set(1L, 2L, 3L))
    // slop 0 phrase unchanged (exact consecutive)
    assert(ids("""{"query": {"query_string": {
      | "query": "\"spark table\"", "default_field": "text"}}}""".stripMargin) == Set(1L))
  }

  test("rank_eval: hand-computed precision/mrr/dcg/ndcg") {
    val sp = spark
    import sp.implicits._
    // q1 top-3: d1 (unjudged=0), d2 (grade 2), d3 (grade 1); judged but
    // unretrieved: d9 (grade 3) -> caps the ideal DCG
    val hits = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3))
      .toDF("query_id", "doc_id", "rank")
    val judgments = Seq((1L, 2L, 2), (1L, 3L, 1), (1L, 9L, 3), (1L, 1L, 0))
      .toDF("query_id", "doc_id", "grade")
    val r = graft.dsl.RankEval.rankEval(hits, judgments, k = 3).collect().head
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val log2_3 = math.log(3) / math.log(2)
    val dcg = r6(3.0 / log2_3 + 1.0 / 2.0)                    // ranks 2, 3
    val idcg = r6(7.0 / 1.0 + 3.0 / log2_3 + 1.0 / 2.0)      // grades 3,2,1
    assert(r.getAs[Double]("precision_k") == r6(2.0 / 3.0))
    assert(r.getAs[Double]("mrr") == 0.5)                     // first rel at rank 2
    assert(r.getAs[Double]("dcg_k") == dcg)
    assert(r.getAs[Double]("ndcg_k") == r6(dcg / idcg))
    // no relevant hits at all -> mrr 0, ndcg 0
    val none = graft.dsl.RankEval.rankEval(
      Seq((2L, 5L, 1)).toDF("query_id", "doc_id", "rank"),
      Seq((2L, 6L, 0)).toDF("query_id", "doc_id", "grade"), k = 3).collect().head
    assert(none.getAs[Double]("mrr") == 0.0 && none.getAs[Double]("ndcg_k") == 0.0)
  }

  test("damerau kernel: true (unrestricted) DL matching DuckDB's variant") {
    import graft.functions.EditDistance.damerauStr
    assert(damerauStr("ab", "ba") == 1)       // transposition = 1 edit
    assert(damerauStr("abcd", "acbd") == 1)
    assert(damerauStr("ca", "abc") == 2)      // true DL (OSA would say 3)
    assert(damerauStr("kitten", "sitting") == 3)
    assert(damerauStr("", "abc") == 3 && damerauStr("abc", "") == 3)
    assert(damerauStr("same", "same") == 0)
    // codegen'd column expression agrees with the scala kernel
    val sp = spark
    import sp.implicits._
    val got = Seq(("ab", "ba"), ("ca", "abc"), ("x", "x")).toDF("a", "b")
      .select(graft.functions.EditDistance.damerauLev(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 2, 0))
  }

  test("zero_terms_query: stopword-only english match -> all / none / loud default") {
    def q(extra: String) = EsQueryJson.search(orders.limit(50),
      s"""{"query": {"match": {"o_orderpriority":
         |  {"query": "the and of", "analyzer": "english"$extra}}}, "size": 1000}""".stripMargin).count()
    assert(q(""", "zero_terms_query": "all"""") == 50)
    assert(q(""", "zero_terms_query": "none"""") == 0)
    val e = intercept[IllegalArgumentException] { q("") }
    assert(e.getMessage.contains("zero_terms_query"))
  }

  test("minimum_should_match forms: percentage, negative int, negative percentage") {
    def n(msm: String): Long = EsQueryJson.search(orders,
      s"""{"query": {"bool": {"should": [
         |   {"term": {"o_orderstatus": "F"}},
         |   {"term": {"o_orderpriority": "1-URGENT"}},
         |   {"range": {"o_totalprice": {"gte": 100000}}},
         |   {"range": {"o_orderdate": {"lt": "1995-01-01"}}}],
         |  "minimum_should_match": $msm}}, "size": 100000}""".stripMargin).count()
    assert(n("\"50%\"") == n("2"))   // floor(4 * 50%) = 2
    assert(n("\"75%\"") == n("3"))
    assert(n("-1") == n("3"))        // 4 optional - 1 allowed missing
    assert(n("\"-25%\"") == n("3"))  // 25% of 4 may be missing
    assert(n("\"100%\"") == n("4"))
    assert(n("1") > n("3"))          // sanity: looser matches more
  }

  test("collapse inner_hits: rank/collect/collapse windows share ONE exchange") {
    val q = EsQueryJson.search(orders,
      """{"collapse": {"field": "o_custkey", "inner_hits": {
        |   "size": 2, "sort": ["o_orderdate", "o_orderkey"],
        |   "_source": ["o_orderkey", "o_orderdate"]}},
        | "sort": [{"o_totalprice": {"order": "desc"}}, "o_orderkey"],
        | "size": 10}""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    val keyExchanges = "hashpartitioning\\(o_custkey".r.findAllIn(plan).size
    assert(keyExchanges == 1, s"collapse-key windows must share one exchange:\n$plan")
    // parent rows: one per customer; inner rows: ≤2 per kept parent
    val rows = q.select("o_custkey", "_inner.o_orderkey").collect()
    val perParent = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perParent.values.forall(n => n >= 1 && n <= 2) && perParent.size == 10)
  }

  test("stored scripts: id resolves to the inline twin, unregistered id fails loudly") {
    val inline = EsQueryJson.search(orders,
      """{"query": {"script": {"script": "doc['o_totalprice'].value > 300000"}},
        | "sort": ["o_orderkey"], "size": 10}""".stripMargin)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val stored = EsQueryJson.withScripts("big" -> "doc['o_totalprice'].value > 300000") {
      EsQueryJson.search(orders,
        """{"query": {"script": {"script": {"id": "big"}}},
          | "sort": ["o_orderkey"], "size": 10}""".stripMargin)
    }.select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(stored == inline && stored.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      EsQueryJson.search(orders,
        """{"query": {"script": {"script": {"id": "nope"}}}}""")
    }
    assert(e.getMessage.contains("not registered"))
  }

  test("bool/term/range/sort/from/size body") {
    val body =
      """{"query": {"bool": {
        |   "must": [{"term": {"o_orderstatus": "F"}},
        |            {"range": {"o_totalprice": {"gte": 1000, "lt": 200000}}}],
        |   "must_not": [{"terms": {"o_orderpriority": ["5-LOW"]}}]}},
        | "sort": [{"o_totalprice": {"order": "desc"}}, "o_orderkey"],
        | "from": 5, "size": 10}""".stripMargin
    val got = EsQueryJson.search(orders, body)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val want = orders.filter(col("o_orderstatus") === "F" &&
        col("o_totalprice") >= 1000 && col("o_totalprice") < 200000 &&
        !col("o_orderpriority").isin("5-LOW"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .offset(5).limit(10)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got == want && got.size == 10)
  }

  test("query over the materialized index with info.* fields") {
    val index = Merge.fold(mutDf(Seq(
      mut("k1", "U", "2024-01-01 00:00:00", 1, ("f", "etype", "purchase"), ("f", "val", "31")),
      mut("k2", "U", "2024-01-01 00:00:01", 2, ("f", "etype", "view")),
      mut("k3", "U", "2024-01-01 00:00:02", 3, ("f", "etype", "purchase")))))
    val body =
      """{"query": {"bool": {
        |  "must": [{"term": {"info.etype": "purchase"}}, {"exists": {"field": "info.val"}}]}},
        | "sort": ["id"]}""".stripMargin
    val got = EsQueryJson.search(index, body).select("id").collect().map(_.getString(0)).toSeq
    assert(got == Seq("k1"))
    // ids query
    val got2 = EsQueryJson.search(index, """{"query": {"ids": {"values": ["k2", "k3"]}}, "sort": ["id"]}""")
      .select("id").collect().map(_.getString(0)).toSeq
    assert(got2 == Seq("k2", "k3"))
  }

  test("terms aggregation with metric sub-aggs") {
    val body =
      """{"aggs": {"by_status": {"terms": {"field": "o_orderstatus", "size": 3},
        |  "aggs": {"avg_price": {"avg": {"field": "o_totalprice"}},
        |           "n_cust": {"cardinality": {"field": "o_custkey"}}}}}}""".stripMargin
    val out = EsQueryJson.aggregations(orders, body)("by_status")
    val rows = out.collect()
    assert(rows.length == 3 && out.columns.toSeq ==
      Seq("key", "doc_count", "avg_price", "n_cust"))
    val want = orders.groupBy(col("o_orderstatus")).count()
      .orderBy(desc("count"), col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == want)
  }

  test("date_histogram and bare metric aggs") {
    val dh = EsQueryJson.aggregations(orders,
      """{"aggs": {"by_month": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"}}}}""")("by_month")
    assert(dh.count() > 12)
    val m = EsQueryJson.aggregations(orders,
      """{"aggs": {"total": {"sum": {"field": "o_totalprice"}}}}""")("total")
    assert(m.collect().head.getDouble(0) > 0)
  }

  test("function_score: functions reshape the base score; filters gate functions") {
    // weight-only function over a filter query: score = 1.0 × weight when
    // the function filter matches, else 1.0 × neutral(=1 for multiply)
    val body =
      """{"query": {"function_score": {
        |   "query": {"term": {"o_orderstatus": "F"}},
        |   "functions": [
        |     {"filter": {"term": {"o_orderpriority": "1-URGENT"}}, "weight": 3.0},
        |     {"field_value_factor": {"field": "o_totalprice", "factor": 0.00001, "modifier": "log1p"}}]}},
        | "sort": [{"_score": {}}, "o_orderkey"], "size": 5}""".stripMargin
    val got = EsQueryJson.search(orders, body).select("o_orderkey", "_score").collect()
    val expect = orders.filter(col("o_orderstatus") === "F")
      .withColumn("_score", round(
        lit(1.0) * (when(col("o_orderpriority") === "1-URGENT", lit(3.0)).otherwise(lit(1.0)) *
          log(lit(1.0) + lit(0.00001) * col("o_totalprice"))), 6))
      .orderBy(desc("_score"), col("o_orderkey")).limit(5)
      .select("o_orderkey", "_score").collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      expect.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // every top doc got the 3× urgent boost
    assert(got.nonEmpty)
    // boost_mode replace ignores the query score entirely
    val rep = EsQueryJson.search(orders,
      """{"query": {"function_score": {
        |   "query": {"term": {"o_orderstatus": "F"}},
        |   "functions": [{"weight": 2.5}], "boost_mode": "replace"}},
        | "sort": [{"_score": {}}, "o_orderkey"], "size": 3}""".stripMargin)
      .select("_score").collect().map(_.getDouble(0)).toSeq
    assert(rep == Seq(2.5, 2.5, 2.5))
    // unscored context: function_score degrades to the inner query's filter
    val unscored = EsQueryJson.search(orders,
      """{"query": {"function_score": {"query": {"term": {"o_orderstatus": "P"}}}},
        | "sort": ["o_orderkey"], "size": 100000}""".stripMargin).count()
    assert(unscored == orders.filter(col("o_orderstatus") === "P").count())
  }

  test("match analyzer=english: stemmed recall, stopwords dropped, -ss untouched") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "the shiny tables"), (2L, "a table"), (3L, "pony rides"),
      (4L, "ponies ride"), (5L, "gloss finish")).toDF("doc_id", "text")
    def q(term: String): Seq[Long] = EsQueryJson.search(docs,
      s"""{"query": {"match": {"text": {"query": "$term", "analyzer": "english"}}},
         | "sort": ["doc_id"]}""".stripMargin)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(q("tables") == Seq(1L, 2L)) // plural query hits singular doc
    assert(q("ponies") == Seq(3L, 4L)) // ies→y conflation both directions
    assert(q("gloss") == Seq(5L))      // -ss never stripped
    // default analyzer unchanged: "tables" misses the "table" doc
    val plain = EsQueryJson.search(docs,
      """{"query": {"match": {"text": "tables"}}, "sort": ["doc_id"]}""")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(plain == Seq(1L))
    // a stopword-only query is rejected loudly
    intercept[IllegalArgumentException](q("the"))
  }

  test("range and date_range aggs bucket with from-inclusive/to-exclusive bounds") {
    val out = EsQueryJson.aggregations(orders,
      """{"aggs": {"pr": {"range": {"field": "o_totalprice", "ranges": [
        |  {"key": "a_low", "to": 150000}, {"key": "b_high", "from": 150000}]},
        | "aggs": {"mx": {"max": {"field": "o_totalprice"}}}}}}""".stripMargin)("pr")
    val rows = out.collect()
    assert(out.columns.toSeq == Seq("key", "doc_count", "mx"))
    val lo = orders.filter(col("o_totalprice") < 150000).count()
    val hi = orders.filter(col("o_totalprice") >= 150000).count()
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a_low" -> lo, "b_high" -> hi))
    assert(lo + hi == orders.count()) // disjoint cover, no row lost
    // overlapping ranges count rows in BOTH buckets (ES semantics)
    val ov = EsQueryJson.aggregations(orders,
      """{"aggs": {"pr": {"range": {"field": "o_totalprice", "ranges": [
        |  {"key": "all", "from": 0}, {"key": "some", "from": 150000}]}}}}""".stripMargin)("pr")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ov("all") == orders.count() && ov("some") == hi)
    // default keys are "from-to" with * for open bounds
    val dk = EsQueryJson.aggregations(orders,
      """{"aggs": {"pr": {"range": {"field": "o_totalprice",
        |  "ranges": [{"to": 150000}]}}}}""".stripMargin)("pr").collect()
    assert(dk.head.getString(0) == "*-150000")
  }

  test("collapse keeps the top hit per field value by the body's sort") {
    val body =
      """{"query": {"term": {"o_orderstatus": "F"}},
        | "collapse": {"field": "o_orderpriority"},
        | "sort": [{"o_totalprice": {"order": "desc"}}, "o_orderkey"], "size": 10}""".stripMargin
    val got = EsQueryJson.search(orders, body)
      .select("o_orderpriority", "o_orderkey").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    import org.apache.spark.sql.expressions.Window
    val want = orders.filter(col("o_orderstatus") === "F")
      .withColumn("rn", row_number().over(Window.partitionBy("o_orderpriority")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))))
      .filter(col("rn") === 1)
      .orderBy(desc("o_totalprice"), col("o_orderkey")).limit(10)
      .select("o_orderpriority", "o_orderkey").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == want)
    assert(got.map(_._1).distinct.size == got.size) // one hit per value
  }

  test("inner_hits: matched children only, sorted within parent, size-capped") {
    val sp2 = spark
    import sp2.implicits._
    val df = Seq(
      (1L, Seq((5.0, 1L), (9.0, 2L), (9.0, 3L), (2.0, 4L))),
      (2L, Seq((1.0, 1L))),
      (3L, Seq((7.0, 1L))))
      .toDF("pid", "kids")
      .select(col("pid"), col("kids").cast(
        "array<struct<score:double,kid:bigint>>"))
    val got = EsQueryJson.search(df,
      """{"query": {"nested": {"path": "kids",
        |  "query": {"range": {"kids.score": {"gte": 5}}},
        |  "inner_hits": {"size": 2, "sort": [
        |    {"kids.score": {"order": "desc"}}, "kids.kid"]}}},
        | "sort": ["pid"]}""".stripMargin)
      .select(col("pid"), col("_inner.score"), col("_inner.kid"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    // parent 2 has no matching child -> no hit; parent 1's ties break on kid;
    // the 5.0 child is cut by size=2
    assert(got == Seq((1L, 9.0, 2L), (1L, 9.0, 3L), (3L, 7.0, 1L)))
  }

  test("delete_by_query keeps NULL-predicate docs; update_by_query touches matches only") {
    val sp2 = spark
    import sp2.implicits._
    val df = Seq((1L, Some("a"), 10.0), (2L, None, 20.0), (3L, Some("b"), 30.0))
      .toDF("id", "tag", "price")
    // ES match semantics: doc 2's NULL tag does not match term(tag=a) → KEPT
    val kept = EsQueryJson.deleteByQuery(df, """{"query": {"term": {"tag": "a"}}}""")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
    val upd = EsQueryJson.updateByQuery(df,
      """{"query": {"range": {"price": {"gte": 20}}},
        | "script": {"source": "ctx._source.price = ctx._source.price * 2"}}""".stripMargin)
      .select("id", "price").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(upd == Map(1L -> 10.0, 2L -> 40.0, 3L -> 60.0))
    // scriptless body = identity (ES version-bump form)
    assert(EsQueryJson.updateByQuery(df, """{"query": {"match_all": {}}}""")
      .collect().length == 3)
  }

  test("post_filter narrows hits but not aggregations (faceted navigation)") {
    val body =
      """{"query": {"range": {"o_totalprice": {"gte": 100000}}},
        | "post_filter": {"term": {"o_orderstatus": "F"}},
        | "aggs": {"st": {"terms": {"field": "o_orderstatus", "size": 10}}},
        | "sort": ["o_orderkey"], "size": 100000}""".stripMargin
    val hits = EsQueryJson.search(orders, body)
    // hits honor BOTH the query and the post_filter
    assert(hits.count() ==
      orders.filter(col("o_totalprice") >= 100000 && col("o_orderstatus") === "F").count())
    // the facet keeps full query scope: every status bucket, not just F
    val buckets = EsQueryJson.aggregations(orders, body)("st")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = orders.filter(col("o_totalprice") >= 100000)
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(buckets == want && buckets.size > 1)
  }

  test("weighted_avg, percentile_ranks, adjacency_matrix aggs") {
    val wa2 = EsQueryJson.aggregations(orders,
      """{"aggs": {"w": {"weighted_avg": {
        |  "value": {"field": "o_totalprice"}, "weight": {"field": "o_custkey"}}}}}""".stripMargin)("w")
    val want = orders.agg(round(sum(col("o_totalprice") * col("o_custkey")) / sum(col("o_custkey")), 6))
      .collect().head.getDouble(0)
    assert(wa2.collect().head.getDouble(0) == want)
    val pr = EsQueryJson.aggregations(orders,
      """{"aggs": {"p": {"percentile_ranks": {"field": "o_totalprice", "values": [0, 10000000]}}}}""")("p")
    val r = pr.collect().head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 100.0) // below min / above max
    val adj = EsQueryJson.aggregations(orders,
      """{"aggs": {"a": {"adjacency_matrix": {"filters": {
        |  "f": {"term": {"o_orderstatus": "F"}},
        |  "urgent": {"term": {"o_orderpriority": "1-URGENT"}}}}}}}""".stripMargin)("a")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val nF = orders.filter(col("o_orderstatus") === "F").count()
    val nU = orders.filter(col("o_orderpriority") === "1-URGENT").count()
    val nFU = orders.filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT").count()
    assert(adj == Map("f" -> nF, "urgent" -> nU, "f&urgent" -> nFU))
  }

  test("pipeline aggs: cumulative_sum/derivative/moving_avg/bucket_sort + siblings") {
    val m = EsQueryJson.aggregations(orders,
      """{"aggs": {"by_m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "year"},
        |  "aggs": {"cnt2": {"value_count": {"field": "o_orderkey"}},
        |           "cum": {"cumulative_sum": {"buckets_path": "_count"}},
        |           "d": {"derivative": {"buckets_path": "_count"}}}},
        | "total": {"sum_bucket": {"buckets_path": "by_m>_count"}}}}""".stripMargin)
    val rows = m("by_m").collect()
    // cumulative_sum of counts ends at the table size; derivative null first
    assert(rows.last.getAs[Double]("cum") == orders.count().toDouble)
    assert(rows.head.isNullAt(rows.head.fieldIndex("d")))
    assert((1 until rows.length).forall { i =>
      rows(i).getAs[Double]("d") == rows(i).getLong(1).toDouble - rows(i - 1).getLong(1).toDouble })
    assert(m("total").collect().head.getDouble(0) == orders.count().toDouble)
    // bucket_sort truncates and reorders the bucket list
    val bs = EsQueryJson.aggregations(orders,
      """{"aggs": {"by_m": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "year"},
        |  "aggs": {"srt": {"bucket_sort": {"sort": [{"doc_count": {"order": "desc"}}], "size": 2}}}}}}""".stripMargin)("by_m")
      .collect()
    assert(bs.length == 2 && bs(0).getLong(1) >= bs(1).getLong(1))
    assert(bs(0).getLong(1) == rows.map(_.getLong(1)).max)
  }

  test("zero-filled histogram emits every bounded bucket; global escapes the query") {
    val filled = EsQueryJson.aggregations(orders,
      """{"query": {"range": {"o_totalprice": {"gte": 999999999}}},
        | "aggs": {"h": {"histogram": {"field": "o_totalprice", "interval": 100000,
        |   "min_doc_count": 0, "extended_bounds": {"min": 0, "max": 400000}}}}}""".stripMargin)("h")
      .collect()
    // nothing matches the query, yet all 5 bounded buckets appear at 0
    assert(filled.map(r => r.getLong(0) -> r.getLong(1)).toSeq ==
      Seq(0L -> 0L, 100000L -> 0L, 200000L -> 0L, 300000L -> 0L, 400000L -> 0L))
    val g = EsQueryJson.aggregations(orders,
      """{"query": {"range": {"o_totalprice": {"gte": 999999999}}},
        | "aggs": {"all": {"global": {}, "aggs": {"n": {"value_count": {"field": "o_orderkey"}}}}}}""".stripMargin)("all")
      .collect().head
    assert(g.getLong(0) == orders.count() && g.getLong(1) == orders.count())
  }

  test("extended_stats metric matches direct variance/stddev") {
    val out = EsQueryJson.aggregations(orders,
      """{"aggs": {"st": {"extended_stats": {"field": "o_totalprice"}}}}""")("st")
    val r = out.collect().head
    // POPULATION moments — the ES-6.5 response form (round 8)
    val want = orders.agg(
      round(var_pop(col("o_totalprice")), 6).as("v"),
      round(stddev_pop(col("o_totalprice")), 6).as("s")).collect().head
    assert(out.columns.contains("value_variance") || out.columns.exists(_.endsWith("_variance")))
    val vIdx = out.columns.indexWhere(_.endsWith("_variance"))
    val sIdx = out.columns.indexWhere(_.endsWith("_std_deviation"))
    assert(r.getDouble(vIdx) == want.getDouble(0) && r.getDouble(sIdx) == want.getDouble(1))
  }

  test("query scopes aggregations in the same body (ES behavior)") {
    val body =
      """{"query": {"term": {"o_orderstatus": "F"}},
        | "aggs": {"by_pri": {"terms": {"field": "o_orderpriority", "size": 10}}}}""".stripMargin
    val got = EsQueryJson.aggregations(orders, body)("by_pri")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = orders.filter(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("nested bucket aggs: terms inside date_histogram, ES size semantics") {
    val body =
      """{"aggs": {"by_month": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "month"},
        |  "aggs": {"by_status": {"terms": {"field": "o_orderstatus", "size": 2},
        |    "aggs": {"rev": {"sum": {"field": "o_totalprice"}}}}}}}}""".stripMargin
    val out = EsQueryJson.aggregations(orders, body)("by_month")
    assert(out.columns.toSeq == Seq("by_month", "by_status", "doc_count", "rev"))
    // manual: per month, top-2 statuses by count (count desc, key asc)
    import org.apache.spark.sql.expressions.Window
    val g = orders.groupBy(date_trunc("month", col("o_orderdate")).as("m"), col("o_orderstatus").as("s"))
      .agg(count(lit(1)).as("c"), round(sum(col("o_totalprice")), 4).as("rev"))
    val want = g.withColumn("rk",
        dense_rank().over(Window.partitionBy("m").orderBy(col("c").desc, col("s"))))
      .filter(col("rk") <= 2)
      .select("m", "s", "c", "rev").orderBy("m", "s")
      .collect().map(r => (r.get(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    val got = out.orderBy("by_month", "by_status")
      .collect().map(r => (r.get(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("three-level nested bucket chain groups once and prunes per level") {
    val body =
      """{"aggs": {"by_year": {"date_histogram": {"field": "o_orderdate", "calendar_interval": "year"},
        |  "aggs": {"by_status": {"terms": {"field": "o_orderstatus", "size": 2},
        |    "aggs": {"by_pri": {"terms": {"field": "o_orderpriority", "size": 1},
        |      "aggs": {"rev": {"sum": {"field": "o_totalprice"}}}}}}}}}}""".stripMargin
    val out = EsQueryJson.aggregations(orders, body)("by_year")
    assert(out.columns.toSeq == Seq("by_year", "by_status", "by_pri", "doc_count", "rev"))
    val rows = out.collect()
    // ≤ 2 statuses per year, exactly 1 priority within each (year, status)
    val perYearStatus = rows.groupBy(_.get(0)).view.mapValues(_.map(_.getString(1)).distinct.size)
    assert(perYearStatus.values.forall(_ <= 2))
    val perPair = rows.groupBy(r => (r.get(0), r.getString(1))).view.mapValues(_.length)
    assert(perPair.values.forall(_ == 1))
    // exactly one aggregation Exchange in the plan (plus window/sort ones)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
  }

  test("nested terms size prunes by parent total, not leaf count") {
    val body =
      """{"aggs": {"by_status": {"terms": {"field": "o_orderstatus", "size": 2},
        |  "aggs": {"by_pri": {"terms": {"field": "o_orderpriority", "size": 1}}}}}}""".stripMargin
    val out = EsQueryJson.aggregations(orders, body)("by_status").collect()
    // top-2 statuses overall, 1 top priority within each → exactly 2 rows
    val topStatuses = orders.groupBy("o_orderstatus").count()
      .orderBy(desc("count"), col("o_orderstatus")).limit(2)
      .collect().map(_.getString(0)).toSet
    assert(out.length == 2 && out.map(_.getString(0)).toSet == topStatuses)
  }

  test("filters agg computes metric sub-aggs per filter bucket") {
    val body =
      """{"aggs": {"split": {"filters": {"filters": {
        |    "urgent": {"term": {"o_orderpriority": "1-URGENT"}},
        |    "low": {"terms": {"o_orderpriority": ["4-NOT SPECIFIED", "5-LOW"]}}}},
        |  "aggs": {"rev": {"sum": {"field": "o_totalprice"}}}}}}""".stripMargin
    val r = EsQueryJson.aggregations(orders, body)("split").collect().head
    val urg = orders.filter(col("o_orderpriority") === "1-URGENT")
    assert(r.getAs[Long]("urgent") == urg.count())
    assert(r.getAs[Double]("urgent_rev") ==
      urg.agg(round(sum("o_totalprice"), 4)).collect().head.getDouble(0))
    assert(r.getAs[Long]("doc_count") == orders.count())
  }

  test("filters agg other_bucket counts none-of-the-above with its metrics") {
    val body =
      """{"aggs": {"split": {"filters": {"filters": {
        |    "urgent": {"term": {"o_orderpriority": "1-URGENT"}},
        |    "high": {"term": {"o_orderpriority": "2-HIGH"}}},
        |  "other_bucket": true},
        |  "aggs": {"rev": {"sum": {"field": "o_totalprice"}}}}}}""".stripMargin
    val r = EsQueryJson.aggregations(orders, body)("split").collect().head
    val rest = orders.filter(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    assert(r.getAs[Long]("_other_") == rest.count())
    assert(r.getAs[Double]("_other__rev") ==
      rest.agg(round(sum("o_totalprice"), 4)).collect().head.getDouble(0))
    assert(r.getAs[Long]("urgent") + r.getAs[Long]("high") + r.getAs[Long]("_other_")
      == r.getAs[Long]("doc_count"))
  }

  test("metric agg `missing` substitutes for null field values") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    val df = Seq((1L, Some(4.0)), (2L, None), (3L, Some(8.0)))
      .toDF("id", "x")
    def one(body: String) = EsQueryJson.aggregations(df, body)("m").collect().head
    // without missing: nulls skipped → avg(4, 8) = 6
    assert(one("""{"aggs": {"m": {"avg": {"field": "x"}}}}""").getAs[Double]("value") == 6.0)
    // with missing 10: avg(4, 10, 8)
    assert(one("""{"aggs": {"m": {"avg": {"field": "x", "missing": 10}}}}""")
      .getAs[Double]("value") == BigDecimal(22.0 / 3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // count counts the substituted docs too
    assert(one("""{"aggs": {"m": {"value_count": {"field": "x", "missing": 10}}}}""")
      .getAs[Long]("value") == 3L)
  }

  test("percentiles metric expands to one column per percent") {
    val body =
      """{"aggs": {"by_status": {"terms": {"field": "o_orderstatus", "size": 3},
        |  "aggs": {"price": {"percentiles": {"field": "o_totalprice", "percents": [25, 50, 75]}}}}}}""".stripMargin
    val out = EsQueryJson.aggregations(orders, body)("by_status")
    assert(out.columns.toSeq == Seq("key", "doc_count", "price_p25", "price_p50", "price_p75"))
    val r = out.orderBy("key").collect()
    assert(r.forall(x => x.getDouble(2) <= x.getDouble(3) && x.getDouble(3) <= x.getDouble(4)))
  }

  test("top_hits inside terms returns per-bucket top-n rows") {
    val body =
      """{"aggs": {"by_status": {"terms": {"field": "o_orderstatus"},
        |  "aggs": {"hits": {"top_hits": {"size": 2,
        |    "sort": [{"o_totalprice": {"order": "desc"}}],
        |    "_source": ["o_orderkey", "o_totalprice"]}}}}}}""".stripMargin
    val out = EsQueryJson.aggregations(orders, body)("by_status")
    assert(out.columns.toSeq == Seq("key", "rank", "o_orderkey", "o_totalprice"))
    val got = out.orderBy("key", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(3))).toSeq
    import org.apache.spark.sql.expressions.Window
    val want = orders.withColumn("rank", row_number().over(
        Window.partitionBy("o_orderstatus").orderBy(desc("o_totalprice"))))
      .filter(col("rank") <= 2).orderBy("o_orderstatus", "rank")
      .collect().map(r => (r.getAs[String]("o_orderstatus"), r.getAs[Int]("rank"), r.getAs[Double]("o_totalprice"))).toSeq
    assert(got == want && got.size == 6)
  }

  test("composite agg pages buckets in key order with after cursor") {
    val body =
      """{"aggs": {"pg": {"composite": {"size": 4,
        |  "sources": [{"st": {"terms": {"field": "o_orderstatus"}}},
        |              {"pri": {"terms": {"field": "o_orderpriority"}}}]}}}}""".stripMargin
    val p1 = EsQueryJson.aggregations(orders, body)("pg").collect()
    assert(p1.length == 4 && EsQueryJson.aggregations(orders, body)("pg").columns.toSeq ==
      Seq("st", "pri", "doc_count"))
    val (lastSt, lastPri) = (p1.last.getString(0), p1.last.getString(1))
    val body2 =
      s"""{"aggs": {"pg": {"composite": {"size": 4,
         |  "sources": [{"st": {"terms": {"field": "o_orderstatus"}}},
         |              {"pri": {"terms": {"field": "o_orderpriority"}}}],
         |  "after": {"st": "$lastSt", "pri": "$lastPri"}}}}}""".stripMargin
    val p2 = EsQueryJson.aggregations(orders, body2)("pg").collect()
    // pages tile the full bucket list without overlap
    val all = orders.groupBy("o_orderstatus", "o_orderpriority").count()
      .orderBy("o_orderstatus", "o_orderpriority")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert((p1 ++ p2).map(r => (r.getString(0), r.getString(1))).toSeq == all.take(8))
  }

  test("match_phrase: consecutive tokens only, short-doc guard") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "big data systems"), (2L, "data big systems"), (3L, "big"),
      (4L, ""), (5L, "the big data"), (6L, "big, data!")).toDF("doc_id", "text")
    val got = EsQueryJson.search(df,
      """{"query": {"match_phrase": {"text": "big data"}}, "sort": ["doc_id"]}""")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 5L, 6L)) // tokenizer strips punctuation like ES's standard analyzer
  }

  test("_score sort runs BM25 and orders desc by default") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = EsQueryJson.search(docs,
      """{"query": {"match": {"text": "spark query join"}}, "sort": ["_score", "doc_id"], "size": 10}""")
    val scores = out.select("_score").collect().map(_.getDouble(0)).toSeq
    assert(scores == scores.sorted.reverse && scores.nonEmpty && scores.head > 0)
    // highest-scored doc beats the rest by BM25, not raw term count alone
    val direct = graft.dsl.EsDsl.matchBm25(docs, col("text"), Seq("spark", "query", "join"))
      .orderBy(desc("_score"), col("doc_id")).select("doc_id").limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq == direct)
  }

  test("search_after pages tile the sorted result without overlap") {
    val body = (after: String) =>
      s"""{"query": {"term": {"o_orderstatus": "F"}},
         | "sort": [{"o_totalprice": {"order": "desc"}}, "o_orderkey"],
         | $after"size": 10}""".stripMargin
    val p1 = EsQueryJson.search(orders, body("")).collect()
    val last = p1.last
    val cursor =
      s""""search_after": [${last.getAs[Double]("o_totalprice")}, ${last.getAs[Long]("o_orderkey")}], """
    val p2 = EsQueryJson.search(orders, body(cursor)).collect()
    val all = orders.filter(col("o_orderstatus") === "F")
      .orderBy(desc("o_totalprice"), col("o_orderkey")).limit(20)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert((p1 ++ p2).map(_.getAs[Long]("o_orderkey")).toSeq == all)
  }

  test("multi_match fires on any field; terms order by metric sub-agg") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = EsQueryJson.search(docs,
      """{"query": {"multi_match": {"query": "spark web", "fields": ["text", "source"]}}, "sort": ["doc_id"], "size": 10000}""")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.filter(
        graft.dsl.EsDsl.matchQuery(col("text"), Seq("spark", "web")) ||
        graft.dsl.EsDsl.matchQuery(col("source"), Seq("spark", "web")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
    // only-source matches must be present (proves the second field counts)
    val sourceOnly = docs.filter(
        !graft.dsl.EsDsl.matchQuery(col("text"), Seq("spark", "web")) &&
        graft.dsl.EsDsl.matchQuery(col("source"), Seq("spark", "web")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sourceOnly.subsetOf(got))

    val byRev = EsQueryJson.aggregations(orders,
      """{"aggs": {"p": {"terms": {"field": "o_orderpriority", "size": 2, "order": {"rev": "asc"}},
        |  "aggs": {"rev": {"sum": {"field": "o_totalprice"}}}}}}""".stripMargin)("p")
      .collect().map(_.getDouble(2)).toSeq
    assert(byRev == byRev.sorted && byRev.size == 2) // lowest-revenue buckets first
  }

  test("match query on documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = EsQueryJson.search(docs,
      """{"query": {"match": {"text": {"query": "spark query join", "minimum_should_match": 2}}}, "sort": ["doc_id"], "size": 10000}""")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val want = docs.filter(graft.dsl.EsDsl.matchQuery(col("text"), Seq("spark", "query", "join"), 2))
      .orderBy("doc_id").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("scored bool: additive boosts, constant_score, filter never scores") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import graft.dsl.EsDsl
    // constant_score alone: every passing doc scores exactly the boost
    val cs = EsQueryJson.search(docs,
      """{"query": {"constant_score": {"filter": {"term": {"lang": "en"}}, "boost": 1.7}},
        | "sort": ["_score", "doc_id"], "size": 10000}""".stripMargin)
    assert(cs.select("_score").distinct().collect().map(_.getDouble(0)).toSeq == Seq(1.7))
    assert(cs.count() == docs.filter(col("lang") === "en").count())
    // bool: 2×BM25(match) + 0.5 constant + 3.0 term, vs hand-built
    val got = EsQueryJson.search(docs,
      """{"query": {"bool": {
        |   "must": [{"match": {"text": {"query": "spark query", "boost": 2}}}],
        |   "should": [
        |     {"constant_score": {"filter": {"term": {"lang": "en"}}, "boost": 0.5}},
        |     {"term": {"source": {"value": "src3", "boost": 3}}}]}},
        | "sort": ["_score", "doc_id"], "size": 10}""".stripMargin)
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (joined, scores, internals) = EsDsl.bm25Scores(docs, Seq(col("text") -> Seq("spark", "query")))
    val want = joined
      .filter(EsDsl.matchQuery(col("text"), Seq("spark", "query")))
      .withColumn("_score", round(lit(2.0) * scores.head
        + when(col("lang") === "en", lit(0.5)).otherwise(lit(0.0))
        + when(col("source") === "src3", lit(3.0)).otherwise(lit(0.0)), 6))
      .drop(internals: _*)
      .orderBy(desc("_score"), col("doc_id")).limit(10)
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want && got.nonEmpty)
    // a filter clause restricts but adds no score: same docs score equally
    // with the term moved from should to filter minus its boost
    val filtered = EsQueryJson.search(docs,
      """{"query": {"bool": {
        |   "must": [{"match": {"text": "spark"}}],
        |   "filter": [{"term": {"lang": "en"}}]}},
        | "sort": ["_score", "doc_id"], "size": 10000}""".stripMargin)
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val unfiltered = EsQueryJson.search(docs,
      """{"query": {"match": {"text": "spark"}}, "sort": ["_score", "doc_id"], "size": 10000}""")
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(filtered.nonEmpty)
    filtered.foreach { case (id, s) => assert(unfiltered(id) == s) }
  }

  test("scored match_phrase and multi_match best_fields") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import graft.dsl.EsDsl
    // phrase tf counts OVERLAPPING occurrences (Lucene exact-phrase freq)
    val sp2 = spark
    import sp2.implicits._
    val tiny = Seq((1L, "a a a"), (2L, "a b a a")).toDF("doc_id", "text")
    val pf = tiny.select(col("doc_id"),
      graft.functions.TextKernels.phraseFreqs(col("text"), Seq("a", "a")).as("f"))
      .orderBy("doc_id").collect().map(r => r.getSeq[Int](1).head).toSeq
    assert(pf == Seq(2, 1))
    // scored phrase: every returned doc contains the phrase; scores desc
    val ph = EsQueryJson.search(docs,
      """{"query": {"match_phrase": {"text": "the data"}}, "sort": ["_score", "doc_id"], "size": 10000}""")
    val phRows = ph.select("doc_id", "_score").collect()
    assert(phRows.nonEmpty)
    val phIds = phRows.map(_.getLong(0)).toSet
    val mustContain = docs.filter(EsDsl.matchPhrase(col("text"), Seq("the", "data")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(phIds == mustContain)
    // multi_match best_fields == max of the two single-field BM25 scores
    val mm = EsQueryJson.search(docs,
      """{"query": {"multi_match": {"query": "spark web", "fields": ["text", "source"]}},
        | "sort": ["_score", "doc_id"]}""".stripMargin)
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val byText = EsDsl.matchBm25(docs, col("text"), Seq("spark", "web"))
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val bySource = EsDsl.matchBm25(docs, col("source"), Seq("spark", "web"))
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(mm.nonEmpty)
    mm.foreach { case (id, s) =>
      val want = math.max(byText.getOrElse(id, 0.0), bySource.getOrElse(id, 0.0))
      assert(math.abs(s - want) < 1e-6, s"doc $id: $s vs $want")
    }
  }

  test("dis_max and boosting compositors") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import graft.dsl.EsDsl
    // tie_breaker 0: dis_max == max of single-query scores
    val dm0 = EsQueryJson.search(docs,
      """{"query": {"dis_max": {"queries": [
        |   {"match": {"text": "spark"}}, {"match": {"source": "src3"}}]}},
        | "sort": ["_score", "doc_id"], "size": 10000}""".stripMargin)
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val byText = EsDsl.matchBm25(docs, col("text"), Seq("spark"))
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val bySource = EsDsl.matchBm25(docs, col("source"), Seq("src3"))
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(dm0.nonEmpty)
    dm0.foreach { case (id, s) =>
      val want = math.max(byText.getOrElse(id, 0.0), bySource.getOrElse(id, 0.0))
      assert(math.abs(s - want) < 1e-6)
    }
    // boosting demotes but never drops: same doc set as the positive alone,
    // negative-matching docs scored at nb × positive
    val pos = EsQueryJson.search(docs,
      """{"query": {"match": {"text": "spark"}}, "sort": ["_score", "doc_id"], "size": 10000}""")
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val bo = EsQueryJson.search(docs,
      """{"query": {"boosting": {"positive": {"match": {"text": "spark"}},
        |   "negative": {"term": {"lang": "zh"}}, "negative_boost": 0.2}},
        | "sort": ["_score", "doc_id"], "size": 10000}""".stripMargin)
      .select("doc_id", "lang", "_score").collect()
    assert(bo.map(_.getLong(0)).toSet == pos.keySet)
    bo.foreach { r =>
      val want = pos(r.getLong(0)) * (if (r.getString(1) == "zh") 0.2 else 1.0)
      assert(math.abs(r.getDouble(2) - want) < 1e-5)
    }
  }

  test("rescore re-ranks only the window; outside keeps primary score") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plain = EsQueryJson.search(docs,
      """{"query": {"match": {"text": "spark query"}}, "sort": ["_score", "doc_id"]}""")
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val rescored = EsQueryJson.search(docs,
      """{"query": {"match": {"text": "spark query"}},
        | "rescore": {"window_size": 5,
        |   "query": {"rescore_query": {"match_phrase": {"text": "the data"}},
        |             "rescore_query_weight": 2}},
        | "sort": ["_score", "doc_id"]}""".stripMargin)
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(rescored.size == plain.length) // rescore never drops or adds docs
    // the primary top-5 (by score desc, id) got >= their primary score;
    // everyone else is byte-identical to the primary score
    val top5 = plain.sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
    plain.foreach { case (id, p) =>
      if (top5(id)) assert(rescored(id) >= p)
      else assert(rescored(id) == p)
    }
  }

  test("highlight: fragment window, em-wrapping, early-position clamp") {
    val sp2 = spark
    import sp2.implicits._
    val docs = Seq(
      (1L, "Spark at the very start of this document with much more text following after it"),
      (2L, "a long preamble that goes on for quite a while before we see spark appear here"),
      (3L, "nothing relevant at all")).toDF("doc_id", "text")
    val got = EsQueryJson.search(docs,
      """{"query": {"match": {"text": "spark"}},
        | "highlight": {"fields": {"text": {"fragment_size": 40}}},
        | "sort": ["doc_id"]}""".stripMargin)
      .select("doc_id", "_highlight").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc 3 doesn't match
    val f1 = got(0).getString(1)
    assert(f1.startsWith("<em>spark</em>") && f1.length <= 40 + "<em></em>".length)
    val f2 = got(1).getString(1)
    assert(f2.contains("<em>spark</em>") && !f2.startsWith("<em>"))
  }

  test("query_string: parse shapes, precedence, and exclusion binding") {
    import graft.dsl.QueryString
    import graft.dsl.QueryString._
    // NOT > AND > OR
    assert(parseLucene("a AND b OR c") ==
      Or(And(Term(None, "a"), Term(None, "b")), Term(None, "c")))
    assert(parseLucene("a OR NOT b AND c") ==
      Or(Term(None, "a"), And(Not(Term(None, "b")), Term(None, "c"))))
    // field grouping rebinds unfielded atoms to the field
    assert(parseLucene("f:(a OR b)") ==
      Or(Term(Some("f"), "a"), Term(Some("f"), "b")))
    // quoted parens inside a group don't close it early
    assert(parseLucene("f:(\"a (b\" c)") ==
      Or(Phrase(Some("f"), Seq("a", "b")), Term(Some("f"), "c")))
    // a dangling field with no value is rejected loudly (never a silent drop)
    intercept[IllegalArgumentException](parseLucene("lang: AND x"))
    // parens override; field scoping; phrase; wildcard
    assert(parseLucene("lang:en AND (x OR t:\"a b\") AND s:src1*") ==
      And(And(Term(Some("lang"), "en"),
              Or(Term(None, "x"), Phrase(Some("t"), Seq("a", "b")))),
          Wild(Some("s"), "src1*")))
    // adjacency = default operator (OR default, AND when configured)
    assert(parseLucene("a b") == Or(Term(None, "a"), Term(None, "b")))
    assert(parseLucene("a b", defaultAnd = true) == And(Term(None, "a"), Term(None, "b")))
    // `-x` / NOT-adjacency binds as AND NOT even under default OR
    assert(parseLucene("a -b") == And(Term(None, "a"), Not(Term(None, "b"))))
    assert(parseLucene("a NOT b") == And(Term(None, "a"), Not(Term(None, "b"))))
    // ranges, comparisons, fuzzy
    assert(parseLucene("f:[10 TO 20]") == Rng("f", Some("10"), Some("20"), loInc = true, hiInc = true))
    assert(parseLucene("f:{a TO *}") == Rng("f", Some("a"), None, loInc = false, hiInc = false))
    assert(parseLucene("f:>=25 AND g:<3") == And(Cmp("f", ">=", "25"), Cmp("g", "<", "3")))
    assert(parseLucene("name~1") == Fuzzy(None, "name", 1))
    assert(parseLucene("f:name~") == Fuzzy(Some("f"), "name", 2))
    intercept[IllegalArgumentException](parseLucene("f:[10 TO"))
    // simple syntax: + | - parens quotes
    assert(parseSimple("a + b | c") ==
      Or(And(Term(None, "a"), Term(None, "b")), Term(None, "c")))
    assert(parseSimple("a -b") == And(Term(None, "a"), Not(Term(None, "b"))))
    assert(parseSimple("\"a b\" | c*") == Or(Phrase(None, Seq("a", "b")), Wild(None, "c*")))
    // strict form throws on malformed input; simple degrades to bare terms
    intercept[IllegalArgumentException](parseLucene("(a OR b"))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lenient = docs.filter(
      QueryString.simple("(spark OR", _ => col("text"), Seq("text"))).count()
    val plain = docs.filter(
      graft.dsl.EsDsl.matchQuery(col("text"), Seq("spark")) ||
      graft.dsl.EsDsl.matchQuery(col("text"), Seq("or"))).count()
    assert(lenient == plain)
  }

  test("query_string end-to-end == hand-built typed-DSL predicate") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = EsQueryJson.search(docs,
      """{"query": {"query_string": {
        |   "query": "lang:en AND (spark OR \"the data\") -customer",
        |   "default_field": "text"}},
        | "sort": ["doc_id"], "size": 10000}""".stripMargin)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    import graft.dsl.EsDsl
    val want = docs.filter(
      EsDsl.matchQuery(col("lang"), Seq("en")) &&
        (EsDsl.matchQuery(col("text"), Seq("spark")) ||
          EsDsl.matchPhrase(col("text"), Seq("the", "data"))) &&
        !coalesce(EsDsl.matchQuery(col("text"), Seq("customer")), lit(false)))
      .orderBy("doc_id").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == want && got.nonEmpty)
    // multi-field default list ORs across fields
    val mf = EsQueryJson.search(docs,
      """{"query": {"simple_query_string": {"query": "spark | web", "fields": ["text", "source"]}},
        | "sort": ["doc_id"], "size": 10000}""".stripMargin).count()
    val mfWant = docs.filter(
      EsDsl.matchQuery(col("text"), Seq("spark")) || EsDsl.matchQuery(col("source"), Seq("spark")) ||
      EsDsl.matchQuery(col("text"), Seq("web")) || EsDsl.matchQuery(col("source"), Seq("web"))).count()
    assert(mf == mfWant)
  }

  test("missing agg buckets the null-field docs") {
    val p = orders.withColumn("maybe",
      when(col("o_orderstatus") === "F", col("o_totalprice")))
    val row = EsQueryJson.aggregations(p,
      """{"aggs": {"no_f": {"missing": {"field": "maybe"},
        |  "aggs": {"avg_tp": {"avg": {"field": "o_totalprice"}}}}}}""".stripMargin)("no_f")
      .collect()(0)
    assert(row.getLong(0) == orders.filter(col("o_orderstatus") =!= "F").count())
  }

  test("matrix_stats emits upper-triangle covariance/correlation rows") {
    val rows = EsQueryJson.aggregations(orders,
      """{"aggs": {"m": {"matrix_stats": {"fields": ["o_totalprice", "o_custkey"]}}}}""")("m")
      .collect()
    // upper triangle in the listed-fields order, rows sorted by name
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("o_custkey", "o_custkey"), ("o_totalprice", "o_custkey"),
      ("o_totalprice", "o_totalprice")))
    // self-correlation is exactly 1
    assert(rows.filter(r => r.getString(0) == r.getString(1))
      .forall(_.getDouble(3) == 1.0))
  }

  test("sampler agg bounds the metric scope to the top hits by score") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val row = EsQueryJson.aggregations(docs,
      """{"query": {"match": {"text": "spark"}},
        | "aggs": {"s": {"sampler": {"shard_size": 10},
        |   "aggs": {"avg_len": {"avg": {"field": "n_chars"}}}}}}""".stripMargin)("s")
      .collect()(0)
    assert(row.getLong(0) == 10) // more than 10 matches exist; capped
    val want = EsQueryJson.search(docs,
      """{"query": {"match": {"text": "spark"}}, "sort": ["_score", "doc_id"], "size": 10}""")
      .agg(round(avg(col("n_chars")), 6)).collect()(0).getDouble(0)
    assert(row.getDouble(1) == want)
  }

  test("significant_text surfaces query-correlated tokens") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = EsQueryJson.aggregations(docs,
      """{"query": {"term": {"lang": "zh"}},
        | "aggs": {"st": {"significant_text": {"field": "text", "size": 5, "min_doc_count": 2}}}}""".stripMargin)("st")
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(out.columns.toSeq == Seq("key", "fg", "bg", "score"))
    // scores are fg-share over bg-share: every surfaced token is enriched
    assert(rows.forall(_.getDouble(3) >= 1.0))
  }

  test("terms lookup inlines values from a registered table") {
    import spark.implicits._
    val lookup = Seq((1L, 10L), (2L, 20L), (3L, 10L)).toDF("id", "val")
    val got = EsQueryJson.withTables("lk" -> lookup) {
      EsQueryJson.search(orders.limit(0).withColumn("o_custkey", col("o_custkey")),
        """{"query": {"terms": {"o_custkey": {"index": "lk", "id": 2, "path": "val"}}}}""")
    } // compiles the isin against [20]
    assert(got.count() == 0)
    val pred = EsQueryJson.withTables("lk" -> lookup) {
      EsQueryJson.predicate(EsQueryJson.parse(
        """{"terms": {"x": {"index": "lk", "path": "val"}}}"""))
    }
    val hit = Seq(10L, 15L, 20L, 25L).toDF("x").filter(pred)
      .collect().map(_.getLong(0)).toSeq
    assert(hit == Seq(10L, 20L)) // no id -> all rows' values
    intercept[IllegalArgumentException] {
      EsQueryJson.predicate(EsQueryJson.parse(
        """{"terms": {"x": {"index": "nope", "path": "val"}}}"""))
    }
  }

  test("named queries populate matched_queries per hit") {
    val out = EsQueryJson.search(orders,
      """{"query": {"bool": {
        |   "must": [{"range": {"o_totalprice": {"gte": 0, "_name": "any"}}}],
        |   "should": [{"term": {"o_orderstatus": {"value": "F", "_name": "fin"}}}]}},
        | "sort": ["o_orderkey"], "size": 50}""".stripMargin)
    val byStatus = out.select(col("o_orderstatus"), col("matched_queries")).collect()
    assert(byStatus.forall { r =>
      val names = r.getSeq[String](1)
      if (r.getString(0) == "F") names == Seq("any", "fin") else names == Seq("any")
    })
  }

  test("moving_avg ewma model follows the s_t = a*x_t + (1-a)*s_{t-1} recursion") {
    import spark.implicits._
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0), (5, 50.0)).toDF("k", "x")
    val got = EsQueryJson.aggregations(df,
      """{"aggs": {"h": {"histogram": {"field": "k", "interval": 1},
        | "aggs": {"v": {"sum": {"field": "x"}},
        |          "e": {"moving_avg": {"buckets_path": "v", "window": 4,
        |                "model": "ewma", "settings": {"alpha": 0.5}}}}}}}""".stripMargin)("h")
      .orderBy("key").select("e").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(10.0, 15.0, 22.5, 31.25, 41.25))
  }

  test("moving_fn: default window excludes the current bucket; shift=window is trailing-inclusive") {
    import spark.implicits._
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)).toDF("k", "x")
    val got = EsQueryJson.aggregations(df,
      """{"aggs": {"h": {"histogram": {"field": "k", "interval": 1},
        | "aggs": {"v": {"sum": {"field": "x"}},
        |          "pm": {"moving_fn": {"buckets_path": "v", "window": 2,
        |                 "script": "MovingFunctions.max(values)"}},
        |          "ts": {"moving_fn": {"buckets_path": "v", "window": 2, "shift": 2,
        |                 "script": "MovingFunctions.sum(values)"}}}}}}""".stripMargin)("h")
      .orderBy("key").select("pm", "ts").collect()
    // pm: frame [-2,-1] -> null, 10, 20, 30 ; ts: frame [0,1] -> 30, 50, 70, 40
    assert(got.map(r => Option(r.get(0))).toSeq ==
      Seq(None, Some(10.0), Some(20.0), Some(30.0)))
    assert(got.map(_.getDouble(1)).toSeq == Seq(30.0, 50.0, 70.0, 40.0))
  }

  test("auto_date_histogram climbs the day->month->year ladder to honor the buckets cap") {
    import spark.implicits._
    val df = Seq("2020-01-01", "2020-01-03", "2020-03-15", "2021-07-01")
      .toDF("s").select(col("s").cast("date").as("d"))
    def run(target: Int) = EsQueryJson.aggregations(df,
      s"""{"aggs": {"a": {"auto_date_histogram": {"field": "d", "buckets": $target}}}}""")("a")
      .select("key", "doc_count", "interval").collect()
    val byDay = run(600) // 548-day span fits -> day rung
    assert(byDay.forall(_.getString(2) == "1d") && byDay.length == 4)
    val byMonth = run(20) // 19 spanned months fit -> month rung
    assert(byMonth.forall(_.getString(2) == "1M") && byMonth.length == 3)
    val byYear = run(2) // months overflow -> year rung
    assert(byYear.forall(_.getString(2) == "1y") && byYear.length == 2)
    assert(byYear.map(_.getLong(1)).toSeq == Seq(3L, 1L)) // 2020: 3 docs, 2021: 1
  }

  test("ip_range buckets compare numeric addresses, not strings; mask honors CIDR bounds") {
    import spark.implicits._
    // "9.x" > "10.x" lexicographically but NOT numerically — the classic
    // string-typed-ip bug the numeric compare must not have
    val df = Seq((1L, "9.0.0.1"), (2L, "10.1.2.3"), (3L, "10.255.0.1"),
      (4L, "192.168.0.7"), (5L, "10.128.0.0")).toDF("id", "ip")
    val out = EsQueryJson.aggregations(df,
      """{"aggs": {"r": {"ip_range": {"field": "ip",
        |  "ranges": [{"key": "below10", "to": "10.0.0.0"},
        |             {"mask": "10.0.0.0/9"},
        |             {"key": "rest", "from": "11.0.0.0"}]}}}}""".stripMargin)("r")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("below10") == 1)    // 9.0.0.1 only (numeric, not lexicographic)
    assert(out("10.0.0.0/9") == 1) // /9 spans 10.0.0.0-10.127.255.255: 10.1.2.3 in; 10.128.0.0 and 10.255.0.1 out
    assert(out("rest") == 1)       // 192.168.0.7; the two 10.128+ addresses land in no bucket (ES allows gaps)
  }

  test("min_score cuts scored hits; random_score is a seeded deterministic shuffle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val all = EsQueryJson.search(docs,
      """{"query": {"match": {"text": "spark"}}, "sort": ["_score", "doc_id"], "size": 10000}""")
    val cut = EsQueryJson.search(docs,
      """{"query": {"match": {"text": "spark"}}, "min_score": 1.0, "sort": ["_score", "doc_id"]}""")
    assert(cut.count() == all.filter(col("_score") >= 1.0).count())
    assert(cut.count() < all.count())
    val r1 = EsQueryJson.search(docs,
      """{"query": {"function_score": {"functions": [{"random_score": {"seed": "7", "field": "doc_id"}}]}},
        | "sort": [{"_score": {}}, "doc_id"], "size": 5}""".stripMargin)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val r2 = EsQueryJson.search(docs,
      """{"query": {"function_score": {"functions": [{"random_score": {"seed": "7", "field": "doc_id"}}]}},
        | "sort": [{"_score": {}}, "doc_id"], "size": 5}""".stripMargin)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val r3 = EsQueryJson.search(docs,
      """{"query": {"function_score": {"functions": [{"random_score": {"seed": "8", "field": "doc_id"}}]}},
        | "sort": [{"_score": {}}, "doc_id"], "size": 5}""".stripMargin)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(r1 == r2) // same seed -> same order
    assert(r1 != r3) // different seed -> different order
  }

  test("cross_fields is term-centric where best_fields is field-centric (split-name fixture)") {
    import spark.implicits._
    val people = Seq((1L, "ada", "lovelace"), (2L, "alan", "turing"),
      (3L, "ada", "turing"), (4L, "grace", "hopper"))
      .toDF("id", "first", "last")
    // cross_fields operator:and = every term in SOME field -> only the doc
    // whose first+last together cover both terms
    val cross = EsQueryJson.search(people,
      """{"query": {"multi_match": {"query": "ada turing", "fields": ["first", "last"],
        |   "type": "cross_fields", "operator": "and"}}, "sort": ["id"]}""".stripMargin)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(cross == Seq(3L))
    // best_fields msm=2 = both terms in ONE field -> nothing on split names
    val best = EsQueryJson.search(people,
      """{"query": {"multi_match": {"query": "ada turing", "fields": ["first", "last"],
        |   "minimum_should_match": 2}}, "sort": ["id"]}""".stripMargin)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(best.isEmpty)
    // ES rule: operator:and overrides an explicit (weaker) msm
    val both = EsQueryJson.search(people,
      """{"query": {"multi_match": {"query": "ada turing", "fields": ["first", "last"],
        |   "type": "cross_fields", "operator": "and", "minimum_should_match": 1}},
        | "sort": ["id"]}""".stripMargin)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(both == Seq(3L))
  }

  test("cross_fields scored: bool clause path agrees with the top-level path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val body =
      """{"query": {"multi_match": {"query": "spark src3", "fields": ["text", "source"],
        |   "type": "cross_fields", "tie_breaker": 0.4, "operator": "and"}},
        | "sort": ["_score", "doc_id"], "size": 50}""".stripMargin
    val top = EsQueryJson.search(docs, body)
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top.nonEmpty && top.forall(_._2 > 0))
    val inBool = EsQueryJson.search(docs,
      """{"query": {"bool": {"must": [
        |   {"multi_match": {"query": "spark src3", "fields": ["text", "source"],
        |      "type": "cross_fields", "tie_breaker": 0.4, "operator": "and"}}]}},
        | "sort": ["_score", "doc_id"], "size": 50}""".stripMargin)
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inBool == top) // same hits, same 6-dp scores
    // and it differs from best_fields on the same terms: cross_fields blends
    // df across fields, best_fields maxes per-field scores
    val bestScores = EsQueryJson.search(docs,
      """{"query": {"multi_match": {"query": "spark src3", "fields": ["text", "source"]}},
        | "sort": ["_score", "doc_id"], "size": 50}""".stripMargin)
      .select("doc_id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bestScores.toMap != top.toMap)
  }

  test("cross_fields tie_breaker tolerates a NULL field (no score poisoning)") {
    import spark.implicits._
    val people = Seq((1L, "grace", "hopper"), (2L, "grace", null.asInstanceOf[String]),
      (3L, "alan", "turing")).toDF("id", "first", "last")
    val got = EsQueryJson.search(people,
      """{"query": {"multi_match": {"query": "grace", "fields": ["first", "last"],
        |   "type": "cross_fields", "tie_breaker": 0.5}},
        | "sort": ["_score", "id"]}""".stripMargin)
      .select("id", "_score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // doc 2 (NULL last) must still be scored, not dropped by a NULL sum
    assert(got.map(_._1).sorted == Seq(1L, 2L) && got.forall(_._2 > 0))
  }

  test("_name inside function_score functions[].filter reaches matched_queries") {
    val out = EsQueryJson.search(orders,
      """{"query": {"function_score": {
        |   "query": {"term": {"o_orderstatus": "F"}},
        |   "functions": [{"filter": {"term": {"o_orderpriority": {"value": "5-LOW", "_name": "lowpri"}}},
        |                  "weight": 2}]}},
        | "sort": ["o_orderkey"], "size": 50}""".stripMargin)
      .select(col("o_orderpriority"), col("matched_queries")).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val names = r.getSeq[String](1)
      if (r.getString(0) == "5-LOW") names == Seq("lowpri") else names.isEmpty
    })
  }

  test("parent-join: has_parent/has_child/parent_id compose inside bool") {
    import spark.implicits._
    // orders with a customer parent struct and an items child array; order
    // 40 is an orphan (no parent), order 30 has one matching child only
    val df = Seq(
      (10L, 1L, Some(("BUILDING", 100.0)), Seq((50.0, 1.0), (49.0, 2.0))),
      (20L, 2L, Some(("MACHINERY", 50.0)), Seq((50.0, 1.0), (50.0, 2.0))),
      (30L, 1L, Some(("BUILDING", 100.0)), Seq((50.0, 1.0), (1.0, 2.0))),
      (40L, 3L, None, Seq((50.0, 1.0), (50.0, 2.0))))
      .toDF("o_orderkey", "o_custkey", "cust", "itemraw")
      .withColumn("customer", col("cust").cast("struct<c_mktsegment:string,c_acctbal:double>"))
      .withColumn("item",
        expr("transform(itemraw, x -> named_struct('l_quantity', x._1, 'l_extendedprice', x._2))"))
      .withColumn("_parent", col("o_custkey"))
    def ids(body: String): Seq[Long] =
      EsQueryJson.search(df, body).select("o_orderkey").collect().map(_.getLong(0)).toSeq
    // has_parent: orphan 40 never matches even though its children would
    assert(ids("""{"query": {"has_parent": {"parent_type": "customer",
                 |  "query": {"term": {"c_mktsegment": "BUILDING"}}}}, "sort": ["o_orderkey"]}""".stripMargin)
      == Seq(10L, 30L))
    // has_child min_children=2 drops order 30 (one matching child)
    assert(ids("""{"query": {"has_child": {"type": "item", "min_children": 2,
                 |  "query": {"range": {"item.l_quantity": {"gte": 49}}}}}, "sort": ["o_orderkey"]}""".stripMargin)
      == Seq(10L, 20L, 40L))
    // max_children=1 keeps exactly the single-match parent
    assert(ids("""{"query": {"has_child": {"type": "item", "max_children": 1,
                 |  "query": {"range": {"item.l_quantity": {"gte": 49}}}}}, "sort": ["o_orderkey"]}""".stripMargin)
      == Seq(30L))
    // both directions + parent_id exclusion inside one bool
    assert(ids("""{"query": {"bool": {
                 |  "must": [{"has_parent": {"parent_type": "customer",
                 |              "query": {"term": {"c_mktsegment": "BUILDING"}}}},
                 |           {"has_child": {"type": "item",
                 |              "query": {"range": {"item.l_quantity": {"gte": 49}}}}}],
                 |  "must_not": [{"parent_id": {"type": "order", "id": 1}}]}},
                 | "sort": ["o_orderkey"]}""".stripMargin)
      == Seq.empty) // BUILDING parents are custkey 1, all excluded by parent_id
    assert(ids("""{"query": {"bool": {
                 |  "must": [{"parent_id": {"type": "order", "id": 1}},
                 |           {"has_child": {"type": "item", "min_children": 2,
                 |              "query": {"range": {"item.l_quantity": {"gte": 49}}}}}]}},
                 | "sort": ["o_orderkey"]}""".stripMargin)
      == Seq(10L))
  }

  test("sliced scroll partitions the export and composes with search_after") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val total = docs.count()
    val parts = (0 until 3).map { i =>
      EsQueryJson.search(docs,
        s"""{"slice": {"id": $i, "max": 3, "field": "doc_id"}, "sort": ["doc_id"], "size": 10000}""")
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    }
    assert(parts.map(_.size.toLong).sum == total)      // covering
    assert(parts.flatten.toSet.size.toLong == total)   // disjoint
    assert(parts.forall(_.nonEmpty))
    // search_after inside a slice: the page after cursor s0(4) is rows 5..9
    val s0 = parts(0)
    val page = EsQueryJson.search(docs,
      s"""{"slice": {"id": 0, "max": 3, "field": "doc_id"},
         | "sort": ["doc_id"], "search_after": [${s0(4)}], "size": 5}""".stripMargin)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(page == s0.slice(5, 10))
    intercept[IllegalArgumentException] {
      EsQueryJson.search(docs, """{"slice": {"id": 3, "max": 3, "field": "doc_id"}}""")
    }
  }

  test("cjk analyzer: overlapping bigrams make CJK text searchable") {
    import spark.implicits._
    val df = Seq(
      (1L, "\u5927\u6570\u636e\u5904\u7406\u5f15\u64ce"),        // 大数据处理引擎
      (2L, "spark \u6570\u636e\u5f15\u64ce"),                       // spark 数据引擎
      (3L, "\u5c0f\u732b"),                                           // 小猫
      (4L, "plain latin text"))
      .toDF("doc_id", "text")
    def ids(body: String): Seq[Long] =
      EsQueryJson.search(df, body).select("doc_id").collect().map(_.getLong(0)).toSeq
    // the bigram 数据 occurs in docs 1 and 2
    assert(ids("""{"query": {"match": {"text": {"query": "\u6570\u636e", "analyzer": "cjk"}}},
                 | "sort": ["doc_id"]}""".stripMargin) == Seq(1L, 2L))
    // 处理引擎 analyzes to 3 bigrams; any-match hits 1 and 2, operator:and
    // (every analyzed bigram) hits only the doc with the full run
    assert(ids("""{"query": {"match": {"text": {"query": "\u5904\u7406\u5f15\u64ce", "analyzer": "cjk"}}},
                 | "sort": ["doc_id"]}""".stripMargin) == Seq(1L, 2L))
    assert(ids("""{"query": {"match": {"text": {"query": "\u5904\u7406\u5f15\u64ce", "analyzer": "cjk", "operator": "and"}}},
                 | "sort": ["doc_id"]}""".stripMargin) == Seq(1L))
    // mixed latin + CJK: the latin word tokenizes normally beside bigrams
    assert(ids("""{"query": {"match": {"text": {"query": "spark \u5f15\u64ce", "analyzer": "cjk", "operator": "and"}}},
                 | "sort": ["doc_id"]}""".stripMargin) == Seq(2L))
    // the 2-char doc is found by its bigram; a single-char query emits a
    // unigram which (as in ES cjk_bigram without output_unigrams) does NOT
    // match bigram-indexed text
    assert(ids("""{"query": {"match": {"text": {"query": "\u5c0f\u732b", "analyzer": "cjk"}}},
                 | "sort": ["doc_id"]}""".stripMargin) == Seq(3L))
    assert(ids("""{"query": {"match": {"text": {"query": "\u732b", "analyzer": "cjk"}}},
                 | "sort": ["doc_id"]}""".stripMargin).isEmpty)
  }

  test("round-8 operators keep distributed-safe plans") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // cross_fields: the shared stats frame broadcasts back (1-row), the
    // corpus never cross-joins itself
    val p102 = EsQueryJson.search(docs,
      """{"query": {"multi_match": {"query": "spark src3", "fields": ["text", "source"],
        |   "type": "cross_fields", "tie_breaker": 0.3, "operator": "and"}},
        | "sort": ["_score", "doc_id"], "size": 20}""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(p102.contains("BroadcastNestedLoopJoin") || p102.contains("BroadcastExchange"))
    assert(!p102.contains("CartesianProduct"))
    // slice: a narrow filter over the scan — no shuffle at all
    val p106 = EsQueryJson.search(docs,
      """{"slice": {"id": 0, "max": 3, "field": "doc_id"}}""")
      .queryExecution.executedPlan.toString
    assert(!p106.contains("Exchange"))
    // diversified_sampler: the per-value window is PARTITIONED (by lang),
    // never a single-partition global window
    val p109 = EsQueryJson.aggregations(docs,
      """{"aggs": {"sample": {"diversified_sampler": {
        |    "shard_size": 10, "field": "lang", "max_docs_per_value": 2},
        |  "aggs": {"avg_len": {"avg": {"field": "n_chars"}}}}}}""".stripMargin)("sample")
      .queryExecution.executedPlan.toString
    val windowLines = p109.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("lang")))
  }

  test("msearch: per-body hits tagged with the request index") {
    val out = EsQueryJson.msearch(orders, Seq(
      """{"query": {"term": {"o_orderstatus": "F"}}, "sort": ["o_orderkey"],
        | "size": 3, "_source": ["o_orderkey"]}""".stripMargin,
      """{"query": {"term": {"o_orderstatus": "O"}}, "sort": ["o_orderkey"],
        | "size": 2, "_source": ["o_orderkey"]}""".stripMargin))
      .orderBy("_search_idx", "o_orderkey").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 0L, 0L, 1L, 1L))
    val byReq = out.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).toSeq).toMap
    val f = orders.filter(col("o_orderstatus") === "F").orderBy("o_orderkey")
      .limit(3).collect().map(_.getLong(0)).toSeq
    assert(byReq(0L) == f && byReq(1L).size == 2)
  }

  test("rank_eval: precision@k, reciprocal rank, Burges DCG") {
    import spark.implicits._
    // ranked by score desc: d4(40), d3(30), d2(20), d1(10);
    // relevant: d3 (rating 1, rank 2), d1 (rating 2, rank 4)
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("doc_id", "s")
    val ratings = Seq(("r", 3L, 1), ("r", 1L, 2))
      .toDF("request", "doc", "rating")
    val out = EsQueryJson.rankEval(df,
      Seq(("r", """{"sort": [{"s": {"order": "desc"}}], "size": 4}""",
        Seq(col("s").desc))),
      idCol = "doc_id", ratings = ratings, k = 4).collect().head
    assert(out.getAs[Double]("precision") == 0.5)
    assert(out.getAs[Double]("reciprocal_rank") == 0.5) // first relevant at rank 2
    // dcg = (2^1-1)/log2(3) + (2^2-1)/log2(5)
    val want = BigDecimal(1.0 / (math.log(3) / math.log(2)) +
      3.0 / (math.log(5) / math.log(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getAs[Double]("dcg") == want)
  }

  test("decay shapes: exp and linear, and linear hits exact zero past the support") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    val df = Seq((1L, 150000.0), (2L, 200000.0), (3L, 450000.0)).toDF("id", "x")
    def score(shape: String) = EsQueryJson.search(df,
      s"""{"query": {"function_score": {
         |   "functions": [{"$shape": {"x": {"origin": 150000, "scale": 50000, "decay": 0.5}}}],
         |   "boost_mode": "replace"}}, "sort": [{"_score": {}}, "id"]}""".stripMargin)
      .select("id", "_score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val e = score("exp")
    assert(e(1L) == 1.0 && e(2L) == 0.5)          // decay^(dist/scale)
    assert(e(3L) == 0.015625)                     // 0.5^6
    val l = score("linear")
    assert(l(1L) == 1.0 && l(2L) == 0.5)          // 1 − 0.5·dist/scale
    assert(l(3L) == 0.0)                          // clamped at zero, not negative
    val g = score("gauss")
    assert(g(2L) == 0.5 && g(3L) == 0.0)          // 0.5^36 rounds to 0 at 6 dp
  }

  test("score_mode max/first skip non-matching functions; no-match keeps score 1") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    val df = Seq((1L, 5.0), (2L, 50.0)).toDF("id", "x")
    def run(mode: String) = EsQueryJson.search(df,
      s"""{"query": {"function_score": {
         |   "functions": [
         |     {"filter": {"range": {"x": {"gte": 10}}}, "weight": 7},
         |     {"filter": {"range": {"x": {"gte": 40}}}, "weight": 3}],
         |   "score_mode": "$mode", "boost_mode": "replace"}},
         | "sort": [{"_score": {}}, "id"]}""".stripMargin)
      .select("id", "_score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run("max") == Map(1L -> 1.0, 2L -> 7.0))   // doc 1 matches nothing → 1.0
    assert(run("min") == Map(1L -> 1.0, 2L -> 3.0))
    assert(run("first") == Map(1L -> 1.0, 2L -> 7.0))
    // ES avg is the WEIGHTED mean over matching functions: a bare-weight
    // function contributes w to numerator AND denominator → (7+3)/(7+3)
    assert(run("avg") == Map(1L -> 1.0, 2L -> 1.0))
    // with a real value function the weighting shows: doc x=50 matches
    // {2×x w=2} and {w=3} → (2·50 + 3)/(2+3) = 20.6
    val mixed = EsQueryJson.search(
      Seq((1L, 5.0), (2L, 50.0)).toDF("id", "x"),
      """{"query": {"function_score": {
        |   "functions": [
        |     {"filter": {"range": {"x": {"gte": 10}}},
        |      "field_value_factor": {"field": "x"}, "weight": 2},
        |     {"filter": {"range": {"x": {"gte": 40}}}, "weight": 3}],
        |   "score_mode": "avg", "boost_mode": "replace"}},
        | "sort": [{"_score": {}}, "id"]}""".stripMargin)
      .select("id", "_score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(mixed == Map(1L -> 1.0, 2L -> 20.6))
  }

  test("nested sort: mode reduction sees only filter-passing children") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    val df = Seq(
      (1L, Seq((10.0, 0.01), (50.0, 0.09))),   // only the 50-qty line is discounted
      (2L, Seq((20.0, 0.08))),                  // discounted 20
      (3L, Seq((1.0, 0.0))))                    // nothing discounted → null key, last
      .toDF("id", "raw")
      .select(col("id"), expr(
        "transform(raw, x -> named_struct('l_quantity', x._1, 'l_discount', x._2))").as("item"))
    val got = EsQueryJson.search(df,
      """{"sort": [{"item.l_quantity": {"mode": "min", "order": "asc",
        |            "nested": {"path": "item",
        |              "filter": {"range": {"item.l_discount": {"gte": 0.05}}}}}}, "id"],
        | "_source": ["id"]}""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    // unfiltered min would order 3 (1.0), 1 (10.0), 2 (20.0); filtered
    // mins are 1→50, 2→20, 3→null
    assert(got == Seq(2L, 1L, 3L))
  }

  test("terms agg on a script key: value_type string concatenates") {
    val got = EsQueryJson.aggregations(orders,
      """{"aggs": {"combo": {"terms": {
        |   "script": {"source": "doc['o_orderstatus'].value + '|' + doc['o_orderpriority'].value"},
        |   "value_type": "string", "size": 3}}}}""".stripMargin)("combo")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = orders.groupBy(concat(col("o_orderstatus"), lit("|"), col("o_orderpriority")).as("k"))
      .count().orderBy(desc("count"), col("k")).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want))
  }

  test("terms script key: generated substring offsets stay numeric under value_type string") {
    // the stringConcat '+'→'||' rewrite must not touch the compiler's OWN
    // offset arithmetic: substring(f, (0) + 1, ...) concatenating to '01'
    // would silently shift every key (ADVICE r16)
    val got = EsQueryJson.aggregations(orders,
      """{"aggs": {"combo": {"terms": {
        |   "script": {"source": "doc['o_orderpriority'].value.substring(0, 2) + doc['o_orderstatus'].value"},
        |   "value_type": "string", "size": 5}}}}""".stripMargin)("combo")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = orders.groupBy(concat(substring(col("o_orderpriority"), 1, 2), col("o_orderstatus")).as("k"))
      .count().orderBy(desc("count"), col("k")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want))
  }

  test("multi_match phrase_prefix fires on ANY field") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    val df = Seq((1L, "alpha beta", "the dawn breaks"), (2L, "the day", "x y"),
      (3L, "nothing here", "nor here")).toDF("id", "a", "b")
    val got = EsQueryJson.search(df,
      """{"query": {"multi_match": {"query": "the da", "type": "phrase_prefix",
        |   "fields": ["a", "b"]}}, "sort": ["id"], "_source": ["id"]}""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L))
  }

  test("search template renders params; unresolved placeholders reject loudly") {
    val got = EsQueryJson.searchTemplate(orders,
      """{"source": "{\"query\": {\"term\": {\"o_orderstatus\": \"{{st}}\"}}, \"sort\": [\"o_orderkey\"], \"size\": {{n}}}",
        | "params": {"st": "F", "n": 5}}""".stripMargin)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val want = orders.filter(col("o_orderstatus") === "F")
      .orderBy("o_orderkey").limit(5)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got == want)
    val e = intercept[IllegalArgumentException](EsQueryJson.searchTemplate(orders,
      """{"source": "{\"size\": {{missing}}}", "params": {}}"""))
    assert(e.getMessage.contains("unresolved"))
  }

  test("explainMatch: per-term weights sum to _score") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = EsQueryJson.explainMatch(docs, "text", "spark merge")
      .select("doc_id", "weight", "_score").collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      val sum = rs.map(_.getDouble(1)).sum
      val score = rs.head.getDouble(2)
      // components round at 6 dp individually; allow the last-digit slack
      assert(math.abs(sum - score) < 2e-6, s"sum $sum vs score $score")
    }
  }

  test("whitespace analyzer keeps case/punctuation; keyword is whole-string equality") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    val df = Seq((1L, "Spark! rocks", "en"), (2L, "spark rocks", "en"),
      (3L, "spark", "en-US")).toDF("id", "text", "lang")
    def ids(body: String) = EsQueryJson.search(df, body).collect().map(_.getLong(0)).toSeq
    // whitespace: "Spark!" only matches the doc with that exact token
    assert(ids("""{"query": {"match": {"text": {"query": "Spark!", "analyzer": "whitespace"}}},
                 | "sort": ["id"], "_source": ["id"]}""".stripMargin) == Seq(1L))
    // default analyzer lowercases + strips punctuation: both docs match
    assert(ids("""{"query": {"match": {"text": "spark"}},
                 | "sort": ["id"], "_source": ["id"]}""".stripMargin) == Seq(1L, 2L, 3L))
    // keyword: whole-field equality — "en" does not match "en-US"
    assert(ids("""{"query": {"match": {"lang": {"query": "en", "analyzer": "keyword"}}},
                 | "sort": ["id"], "_source": ["id"]}""".stripMargin) == Seq(1L, 2L))
  }

  test("mget preserves request order and drops missing ids; _count matches filter") {
    val got = EsQueryJson.mget(orders, "o_orderkey", Seq(7L, 1L, 999999999L, 5L))
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L, 1L, 5L), "request order, missing id dropped")
    val n = EsQueryJson.countApi(orders,
      """{"query": {"term": {"o_orderstatus": "F"}}}""")
      .collect().head.getLong(0)
    assert(n == orders.filter(col("o_orderstatus") === "F").count())
  }

  test("_geo_distance sort orders by haversine km from the origin") {
    import org.apache.spark.sql.SparkSession
    val sp: SparkSession = spark
    import sp.implicits._
    // fixed coordinates: 1° lon ≈ 111 km, so distances order 3 < 1 < 2
    val df = Seq((1L, 0.0, 2.0), (2L, 0.0, -5.0), (3L, 1.0, 0.0))
      .toDF("id", "location_lat", "location_lon")
    val got = EsQueryJson.search(df,
      """{"sort": [{"_geo_distance": {"location": {"lat": 0, "lon": 0},
        |            "order": "asc", "unit": "km"}}, "id"],
        | "_source": ["id"]}""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 1L, 2L))
  }

  test("index-time synonym analyzer changes df/tf/dl and therefore BM25") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "quick merge"), (2L, "fast merge"), (3L, "rapid results arrive"),
      (4L, "slow batch job")).toDF("doc_id", "text")
    def scores(body: String)(in: => org.apache.spark.sql.DataFrame) =
      in.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("_score")).toMap
    val body = """{"query": {"match": {"text": "quick"}}, "sort": ["_score", "doc_id"]}"""
    val idx = EsQueryJson.withSynonyms("syn", Seq("quick, fast, rapid")) {
      EsQueryJson.withIndexAnalyzer("text", "syn") {
        scores(body)(EsQueryJson.search(docs, body))
      }
    }
    // docs 2 and 3 match only via index-time expansion...
    assert(idx.keySet == Set(1L, 2L, 3L))
    // ...and plain search (no index analyzer) finds only the literal term
    val plain = scores(body)(EsQueryJson.search(docs, body))
    assert(plain.keySet == Set(1L))
    // expansion changes the stats the literal doc is scored with (df 1→3,
    // dl 2→4), so even doc 1's score differs from the unexpanded corpus
    assert(idx(1L) != plain(1L))
    // expanded stream: every member counts tf 1 for "quick"; doc 3's
    // longer field length norms its score below docs 1/2
    assert(idx(1L) == idx(2L) && idx(3L) < idx(1L))
  }

  test("query_then_fetch: one shard == global BM25; many shards skew scores") {
    val sp = spark
    import sp.implicits._
    val docs = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) "spark streams data" else "web pages and words here"))
      .toDF("doc_id", "text")
    // shards=1: shard-local stats ARE the global stats — scores must
    // equal matchBm25 exactly (same kernel, same fold)
    val local1 = graft.dsl.EsDsl.matchBm25QueryThenFetch(
      docs, col("doc_id"), col("text"), Seq("spark"), shards = 1)
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val global = graft.dsl.EsDsl.matchBm25(docs, col("text"), Seq("spark"))
      .select(col("doc_id"), col("_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(local1 == global)
    // shards=4: matching docs land on shards with different N/df/avgdl,
    // so at least two matching docs score differently even though their
    // tf and dl are identical (the per-shard skew the mode exhibits)
    val local4 = graft.dsl.EsDsl.matchBm25QueryThenFetch(
      docs, col("doc_id"), col("text"), Seq("spark"), shards = 4)
      .select("doc_id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(local4.keySet == global.keySet) // same HITS, different scores
    assert(local4.values.toSet.size > 1 && local4 != global)
  }

  test("routing narrows to the shard, not the doc set") {
    val sp = spark
    import sp.implicits._
    val docs = (1L to 200L).map(i => (i, s"src${i % 10}", "common text"))
      .toDF("doc_id", "source", "text")
    val hit = docs.filter(graft.dsl.EsDsl.routedTo(col("source"), "src3", shards = 4))
    val sources = hit.select("source").distinct().as[String].collect().toSet
    // every doc with the routing value is on its shard...
    assert(sources.contains("src3"))
    // ...and with 10 sources over 4 shards, colliding sources ride along
    // (routing is not a filter)
    assert(sources.size > 1 && sources.size < 10)
    // shards=1 degenerates to the whole index
    assert(docs.filter(graft.dsl.EsDsl.routedTo(col("source"), "src3", 1)).count() == 200)
  }

  test("_bulk: parse + cogroup apply == driver ES fold on randomized batches") {
    val sp = spark
    import sp.implicits._
    import graft.dsl.EsBulk
    val rnd = new scala.util.Random(42)
    val opsPlan = (0 until 30).map { n =>
      val id = 1L + rnd.nextInt(5)
      val op = Seq("index", "create", "update", "delete")(rnd.nextInt(4))
      (n.toLong * 2, op, id, s"k${rnd.nextInt(3)}", s"v$n")
    }
    val lines = opsPlan.flatMap { case (seq, op, id, k, v) =>
      val action = (seq, s"""{"$op": {"_id": $id}}""")
      op match {
        case "delete" => Seq(action)
        case "update" => Seq(action, (seq + 1, s"""{"doc": {"$k": "$v"}}"""))
        case _        => Seq(action, (seq + 1, s"""{"$k": "$v"}"""))
      }
    }.toDF("seq", "value")
    val standing = Seq((2L, Map("a" -> "x")), (4L, Map("a" -> "y")))
    val idx = standing.toDF("id", "doc")
    val parsed = EsBulk.parse(lines)
    val gotItems = EsBulk.items(idx, parsed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    val gotState = EsBulk.state(idx, parsed).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // reference: the same fold run per id driver-side over the plan
    val byId = opsPlan.groupBy(_._3)
    val expItems = scala.collection.mutable.Set.empty[(Long, Long, String, String)]
    val expState = scala.collection.mutable.Set.empty[(Long, String, String)]
    val allIds = (byId.keySet ++ standing.map(_._1)).toSeq
    allIds.foreach { id =>
      val ops = byId.getOrElse(id, Seq.empty).map { case (seq, op, _, k, v) =>
        EsBulk.BulkOp(seq, op, id, if (op == "delete") null else Map(k -> v))
      }
      val (items, fin) = EsBulk.fold(standing.toMap.get(id), ops)
      items.foreach { case (seq, op, r) => expItems += ((seq, id, op, r)) }
      fin.foreach(_.foreach { case (k, v) => expState += ((id, k, v)) })
    }
    assert(gotItems == expItems.toSet)
    assert(gotState == expState.toSet)
    // sanity: the scenario exercised at least one conflict and one delete
    assert(gotItems.exists(_._4 == "conflict") && gotItems.exists(_._4 == "deleted"))
  }

  test("_bulk update envelope: unsupported shapes reject loudly, supported ones apply") {
    val sp = spark
    import sp.implicits._
    import graft.dsl.EsBulk
    val idx = Seq((1L, Map("n" -> "5"))).toDF("id", "doc")
    def run(envelope: String): Set[(Long, String, String)] = {
      val lines = Seq(
        (0L, """{"update": {"_id": 1}}"""), (1L, envelope)).toDF("seq", "value")
      EsBulk.state(idx, EsBulk.parse(lines)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    }
    // supported: script arithmetic with parens / truncating division /
    // negative intermediate; retry_on_conflict accepted and ignored
    assert(run("""{"script": {"source": "ctx._source.n = (ctx._source.n - 9) / 3 + 100"}, "retry_on_conflict": 3}""")
      == Set((1L, "n", "99"))) // (5-9)/3 = -1 (truncation toward zero, not floor -2), +100
    assert(run("""{"doc": {"m": "y"}}""") == Set((1L, "n", "5"), (1L, "m", "y")))
    // rejected: unknown envelope key (silent drop would change writes)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    def fails(envelope: String, frag: String): Unit = {
      val e = intercept[Exception] { run(envelope) }
      assert(msgs(e).exists(_.contains(frag)), s"expected '$frag' in: ${msgs(e)}")
    }
    fails("""{"doc": {"m": "y"}, "_source": ["m"]}""", "unsupported _bulk update envelope keys")
    // rejected: bare-string / stored-id script shapes
    fails("""{"script": "ctx._source.n = 1"}""", "script must be")
    fails("""{"script": {"id": "stored1"}}""", "script must be")
    // rejected: doc and script together (ES 400s this too)
    fails("""{"doc": {"m": "y"}, "script": {"source": "ctx._source.n = 1"}}""",
      "cannot carry both doc and script")
    // rejected: neither doc nor script
    fails("""{"doc_as_upsert": true}""", "needs a doc or a script")
    // rejected inside the fold: unsupported script grammar / non-numeric ref
    fails("""{"script": {"source": "ctx._source.n = ctx._source.n.length()"}}""",
      "unsupported update script")
    val idx2 = Seq((1L, Map("n" -> "abc"))).toDF("id", "doc")
    val lines2 = Seq((0L, """{"update": {"_id": 1}}"""),
      (1L, """{"script": {"source": "ctx._source.n = ctx._source.n + 1"}}""")).toDF("seq", "value")
    val e2 = intercept[Exception] { EsBulk.state(idx2, EsBulk.parse(lines2)).collect() }
    assert(msgs(e2).exists(_.contains("not an integer")))
  }

  test("terms lookup: large value lists become one array-literal node") {
    val sp = spark
    import sp.implicits._
    // lookup doc resolves to 1000 values — far past the isin threshold
    val lookup = (1L to 1000L).map(v => (5L, v * 2)).toDF("id", "vals")
    val docs = (1L to 50L).map(i => (i, i * 2)).toDF("doc_id", "v")
    val hits = graft.dsl.EsQueryJson.withTables("lk" -> lookup) {
      val out = graft.dsl.EsQueryJson.search(docs,
        """{"query": {"terms": {"v": {"index": "lk", "id": 5, "path": "vals"}}},
          | "sort": ["doc_id"], "size": 100}""".stripMargin)
      assert(out.queryExecution.analyzed.toString.contains("array_contains"),
        "a 1000-value lookup must compile to array_contains, not a 1000-literal In")
      out.collect().map(_.getLong(0)).toSet
    }
    assert(hits == (1L to 50L).toSet, "every doc's v = 2i is in {2,4,...,2000}")
    // small lists keep the pushdown-friendly isin form
    val smallLookup = Seq((5L, 4L), (5L, 8L)).toDF("id", "vals")
    val small = graft.dsl.EsQueryJson.withTables("lk" -> smallLookup) {
      val out = graft.dsl.EsQueryJson.search(docs,
        """{"query": {"terms": {"v": {"index": "lk", "id": 5, "path": "vals"}}},
          | "sort": ["doc_id"], "size": 100}""".stripMargin)
      assert(!out.queryExecution.analyzed.toString.contains("array_contains"))
      out.collect().map(_.getLong(0)).toSet
    }
    assert(small == Set(2L, 4L))
  }

  test("filtered alias: filter conjoins with query and aggs; null fields do not match") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "a", 10), (2L, "a", 30), (3L, "b", 30), (4L, null, 30))
      .toDF("id", "grp", "v")
    val alias = graft.dsl.EsQueryJson.filteredAlias(df, """{"term": {"grp": "a"}}""")
    // null grp (doc 4) must NOT match — ES three-valued semantics
    assert(alias.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // a query against the alias composes
    val hits = graft.dsl.EsQueryJson.search(alias,
      """{"query": {"range": {"v": {"gte": 20}}}, "sort": ["id"]}""")
      .collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(2L))
  }

  test("withLuceneParity: OSA gates the adversarial pair, agrees on real typos") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "ca words here"), (2L, "abc thing")).toDF("doc_id", "text")
    val body = """{"query": {"match": {"text": {"query": "abc", "fuzziness": 2}}},
                 | "sort": ["doc_id"]}""".stripMargin
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // true-DL default: "ca"→"abc" = 2 (transpose + insert BETWEEN) — matches
    assert(ids(graft.dsl.EsQueryJson.search(docs, body)) == Set(1L, 2L))
    // Lucene's OSA automata: 3 — doc 1 must NOT match at fuzziness 2
    assert(graft.functions.EditDistance.withLuceneParity {
      ids(graft.dsl.EsQueryJson.search(docs, body))
    } == Set(2L))
    // on the real corpus the variants agree (real-word typos carry no
    // edit-after-transposition structure) — the evidence the true-DL
    // default is ES-equal on actual data
    val corpus = graft.queries.Tables.documents(sp, "/root/testdata/sf0.001")
    val typo = """{"query": {"match": {"text": {"query": "sprk tble querry",
                 |  "fuzziness": 1}}}, "sort": ["doc_id"], "size": 500}""".stripMargin
    val dl = ids(graft.dsl.EsQueryJson.search(corpus, typo))
    val osa = graft.functions.EditDistance.withLuceneParity {
      ids(graft.dsl.EsQueryJson.search(corpus, typo))
    }
    assert(dl.nonEmpty && dl == osa)
  }

  test("index-time shingles: shingle terms get df, field length inflates") {
    val sp = spark
    import sp.implicits._
    // unequal lengths: dl/avgdl must differ between the plain stream
    // (3/4) and the shingled stream (5/8) for the normalization check
    val docs = Seq((1L, "table hash join"), (2L, "hash table join with padding"))
      .toDF("doc_id", "text")
    def score(body: String, indexed: Boolean) = {
      def run = graft.dsl.EsQueryJson.search(docs, body)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      graft.dsl.EsQueryJson.withShingles("sh", outputUnigrams = true) {
        if (indexed) graft.dsl.EsQueryJson.withIndexAnalyzer("text", "sh")(run) else run
      }
    }
    val q = """{"query": {"match": {"text": "table_hash"}}, "sort": ["_score", "doc_id"]}"""
    // search-time-only: "table_hash" is one standard-analyzer token that
    // exists in no plain document — zero hits
    assert(score(q, indexed = false).isEmpty)
    // index-time: only doc 1 has the ADJACENT pair
    assert(score(q, indexed = true).keySet == Set(1L))
    // the unigram query scores differently once the stored stream
    // inflates dl (2n-1 = 5 vs 3) — same docs, different BM25
    val uq = """{"query": {"match": {"text": "join"}}, "sort": ["_score", "doc_id"]}"""
    val plain = score(uq, indexed = false)
    val sh = score(uq, indexed = true)
    assert(plain.keySet == Set(1L, 2L) && sh.keySet == Set(1L, 2L))
    assert(plain(1L) != sh(1L), "index-time shingling must shift length normalization")
    // ES 6.5 search_analyzer default: a NATURAL multi-term query against
    // the shingled field expands query-side too — "hash table" emits
    // {hash_table, hash, table}, so doc 2 (the adjacent pair) outscores
    // doc 1 (both unigrams, not adjacent) despite doc 1's shorter field
    val nat = score("""{"query": {"match": {"text": "hash table"}},
                      | "sort": ["_score", "doc_id"]}""".stripMargin, indexed = true)
    assert(nat.keySet == Set(1L, 2L))
    assert(nat(2L) > nat(1L), "adjacent-pair doc must win via the shingle clause")
    // operator:and counts ANALYZED clauses: all three must hit — only the
    // doc with the adjacent pair survives
    val natAnd = score("""{"query": {"match": {"text": {"query": "hash table",
                         |  "operator": "and"}}}, "sort": ["_score", "doc_id"]}""".stripMargin,
      indexed = true)
    assert(natAnd.keySet == Set(2L), "operator:and over analyzed shingle clauses")
    // filter context takes the same default: bool/filter match on the
    // shingled field expands the query and honors analyzed-clause msm
    val filt = graft.dsl.EsQueryJson.withShingles("sh", outputUnigrams = true) {
      graft.dsl.EsQueryJson.withIndexAnalyzer("text", "sh") {
        graft.dsl.EsQueryJson.search(docs,
          """{"query": {"bool": {"filter": [{"match": {"text": {"query": "hash table",
            |  "operator": "and"}}}]}}, "sort": ["doc_id"]}""".stripMargin)
          .collect().map(_.getLong(0)).toSet
      }
    }
    assert(filt == Set(2L), "filter-context match honors the index-default search analyzer")
  }

  test("index-time edge_ngram/ngram: prefix grams get df/tf, bounds and rejects hold") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "spark sql"), (2L, "spa"), (3L, "a")).toDF("doc_id", "text")
    def hits(q: String, edge: Boolean) = {
      def run = graft.dsl.EsQueryJson.search(docs,
        s"""{"query": {"match": {"text": "$q"}}, "sort": ["_score", "doc_id"]}""")
        .collect().map(_.getLong(0)).toSet
      if (edge) graft.dsl.EsQueryJson.withEdgeNgrams("ac", 2, 4) {
        graft.dsl.EsQueryJson.withIndexAnalyzer("text", "ac")(run)
      } else graft.dsl.EsQueryJson.withNgrams("ng", 3, 3) {
        graft.dsl.EsQueryJson.withIndexAnalyzer("text", "ng")(run)
      }
    }
    // edge stored streams: doc1 = [sp spa spar sq sql], doc2 = [sp spa]
    assert(hits("spar", edge = true) == Set(1L), "4-prefix isolates the longer word")
    assert(hits("spa", edge = true) == Set(1L, 2L), "3-prefix matches both docs")
    // the max_gram gotcha, faithfully: the FULL word exceeds max_gram=4,
    // so no stored gram equals it — ES's documented autocomplete limit
    assert(hits("spark", edge = true).isEmpty, "terms past max_gram must not match")
    // a token shorter than min_gram vanishes from the stream entirely
    assert(hits("a", edge = true).isEmpty, "sub-min_gram token must vanish")
    // inner substrings: only the non-edge ngram filter stores them
    assert(hits("par", edge = false) == Set(1L), "ngram stores inner substrings")
    assert(hits("par", edge = true).isEmpty, "edge_ngram stores prefixes only")
    // _analyze over the registered chain: grams carry the SOURCE token's
    // position, lengths ascending per token
    val toks = graft.dsl.EsQueryJson.withEdgeNgrams("ac", 2, 4) {
      graft.dsl.EsQueryJson.analyzeApi(docs.filter($"doc_id" === 1L),
        $"doc_id", $"text", "ac")
        .select("position", "token").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    }
    assert(toks == Seq((0, "sp"), (0, "spa"), (0, "spar"), (1, "sq"), (1, "sql")))
    // phrase adjacency over a grammed stream would be silently corrupt —
    // loud reject, as for shingle/synonym chains
    intercept[IllegalArgumentException] {
      graft.dsl.EsQueryJson.withEdgeNgrams("ac", 2, 4) {
        graft.dsl.EsQueryJson.withIndexAnalyzer("text", "ac") {
          graft.dsl.EsQueryJson.search(docs,
            """{"query": {"match_phrase": {"text": "spark sql"}}}""").collect()
        }
      }
    }
    // size bounds reject loudly at registration
    intercept[IllegalArgumentException] { graft.dsl.EsQueryJson.withEdgeNgrams("x", 0, 3)(()) }
    intercept[IllegalArgumentException] { graft.dsl.EsQueryJson.withNgrams("x", 4, 2)(()) }
  }

  test("index-time english: stems and stopwords live in the stored stream; cjk rejects") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "the tables of the database"), // stored: [table, database] — dl 2, not 5
      (2L, "table layout table notes"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    def hits(indexed: Boolean) = {
      val q = """{"query": {"match": {"text": "table"}}, "sort": ["_score", "doc_id"]}"""
      val run = if (indexed)
        graft.dsl.EsQueryJson.withIndexAnalyzer("text", "english") {
          graft.dsl.EsQueryJson.search(docs, q) }
      else graft.dsl.EsQueryJson.search(docs, q)
      run.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("_score")).toMap
    }
    // plain analysis: doc 1 holds the token "tables", not "table" — miss
    assert(hits(indexed = false).keySet == Set(2L))
    // index-time english: the stored stream holds the STEM — doc 1 hits,
    // and stopword removal shrank its dl to 2 (higher score than raw dl 5
    // would give); tf=2 on doc 2 keeps it scoring too
    val st = hits(indexed = true)
    assert(st.keySet == Set(1L, 2L))
    // index-time cjk cannot round-trip the stored view — loud rejection
    val e = intercept[IllegalArgumentException] {
      graft.dsl.EsQueryJson.withIndexAnalyzer("text", "cjk") {
        graft.dsl.EsQueryJson.search(docs, """{"query": {"match": {"text": "table"}}}""")
          .collect()
      }
    }
    assert(e.getMessage.contains("cjk"))
    // SCORED match with search-time english: the query side stems —
    // "tables" reaches doc 1 only when the stream is also stemmed
    // (index-time english), and reaches doc 2 either way via the stem
    val qe = """{"query": {"match": {"text": {"query": "tables", "analyzer": "english"}}},
               | "sort": ["_score", "doc_id"]}""".stripMargin
    val plainScored = graft.dsl.EsQueryJson.search(docs, qe)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(plainScored == Set(2L), "query stem 'table' vs raw stream: only doc 2")
    val bothSides = graft.dsl.EsQueryJson.withIndexAnalyzer("text", "english") {
      graft.dsl.EsQueryJson.search(docs, qe).collect().map(_.getAs[Long]("doc_id")).toSet
    }
    assert(bothSides == Set(1L, 2L), "ES-default english field: both sides stemmed")
    // other analyzers on a SCORED match reject loudly (were silently dropped)
    val e2 = intercept[IllegalArgumentException] {
      graft.dsl.EsQueryJson.search(docs,
        """{"query": {"match": {"text": {"query": "table", "analyzer": "whitespace"}}},
          | "sort": ["_score"]}""".stripMargin).collect()
    }
    assert(e2.getMessage.contains("scored match supports"))
  }

  test("match_phrase over an index-analyzed field runs on the stored stream") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "the hash tables of the engine"), // stemmed: [hash, table, engin]
      (2L, "a hash of the table"),           // stemmed: [hash, table] — stop-collapse adjacency
      (3L, "table hash order swapped"),      // wrong order — no phrase
      (4L, "nothing here")).toDF("doc_id", "text")
    val q = """{"query": {"match_phrase": {"text": "hash tables"}},
              | "sort": ["_score", "doc_id"]}""".stripMargin
    // raw field: neither "hash tables" (doc 1 has it! plural matches raw)...
    val raw = graft.dsl.EsQueryJson.search(docs, q)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(raw == Set(1L), "raw phrase matches only the literal plural")
    // english-indexed: the phrase stems to [hash, table] and runs over the
    // stemmed stream — doc 2 joins via stop-collapse (documented), doc 3
    // stays out (order matters)
    val st = graft.dsl.EsQueryJson.withIndexAnalyzer("text", "english") {
      graft.dsl.EsQueryJson.search(docs, q)
        .collect().map(_.getAs[Long]("doc_id")).toSet
    }
    assert(st == Set(1L, 2L))
    // predicate context takes the same path (bool/filter)
    val filt = graft.dsl.EsQueryJson.withIndexAnalyzer("text", "english") {
      graft.dsl.EsQueryJson.search(docs,
        """{"query": {"bool": {"filter": [{"match_phrase": {"text": "hash tables"}}]}},
          | "sort": ["doc_id"]}""".stripMargin)
        .collect().map(_.getAs[Long]("doc_id")).toSet
    }
    assert(filt == Set(1L, 2L))
    // shingle/synonym index chains reject loudly instead of silently
    // matching the raw text (their stored views interleave tokens)
    val e = intercept[IllegalArgumentException] {
      graft.dsl.EsQueryJson.withShingles("sh", outputUnigrams = true) {
        graft.dsl.EsQueryJson.withIndexAnalyzer("text", "sh") {
          graft.dsl.EsQueryJson.search(docs, q).collect()
        }
      }
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("multi_match consults each field's index analyzer (per-field search analyzer)") {
    val sp = spark
    import sp.implicits._
    // 'body' is english-indexed (stemmed stream), 'title' is plain
    val docs = Seq(
      (1L, "spark engine", "the hash table of the engine"), // singular: only the STEM matches "tables"
      (2L, "hash tables", "nothing relevant"),
      (3L, "other title", "also nothing")).toDF("doc_id", "title", "body")
    val q = """{"query": {"multi_match": {"query": "tables",
              |  "fields": ["title", "body"]}}, "sort": ["_score", "doc_id"]}""".stripMargin
    def run = graft.dsl.EsQueryJson.search(docs, q)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // plain: only the literal plural in title matches (doc 2)
    assert(run == Set(2L))
    // body english-indexed: the body clause stems query+stream → doc 1
    // joins via its stemmed body; doc 2 keeps its raw title match
    val mixed = graft.dsl.EsQueryJson.withIndexAnalyzer("body", "english") {
      graft.dsl.EsQueryJson.search(docs, q)
        .collect().map(_.getAs[Long]("doc_id")).toSet
    }
    assert(mixed == Set(1L, 2L))
    // predicate context (bool/filter) takes the same per-field defaulting
    val filt = graft.dsl.EsQueryJson.withIndexAnalyzer("body", "english") {
      graft.dsl.EsQueryJson.search(docs,
        """{"query": {"bool": {"filter": [{"multi_match": {"query": "tables",
          |  "fields": ["title", "body"]}}]}}, "sort": ["doc_id"]}""".stripMargin)
        .collect().map(_.getAs[Long]("doc_id")).toSet
    }
    assert(filt == Set(1L, 2L))
    // cross_fields + index-analyzed fields reject loudly (ES groups by
    // analyzer; blending differently-analyzed dfs is undefined here)
    val e3 = intercept[IllegalArgumentException] {
      graft.dsl.EsQueryJson.withIndexAnalyzer("body", "english") {
        graft.dsl.EsQueryJson.search(docs,
          """{"query": {"multi_match": {"query": "tables", "type": "cross_fields",
            |  "fields": ["title", "body"]}}, "sort": ["_score"]}""".stripMargin).collect()
      }
    }
    assert(e3.getMessage.contains("cross_fields over index-analyzed"))
  }

  test("fielddata terms agg: one vote per doc per distinct token") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "alpha alpha beta", 10),
                   (2L, "alpha gamma", 20),
                   (3L, "beta beta beta", 30)).toDF("doc_id", "text", "n")
    val got = graft.dsl.EsDsl.fielddataTermsAgg(docs, col("text"), col("n"), "avg_n", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    // alpha: docs 1,2 (doc 1 counted ONCE despite tf=2); beta: docs 1,3
    assert(got.contains(("alpha", 2L, 15.0)))
    assert(got.contains(("beta", 2L, 20.0)))
    assert(got.contains(("gamma", 1L, 20.0)))
  }

  test("validateQuery runs no corpus work, even for stats-collecting constructs") {
    // The three compile-time stats collects (terms-lookup fetch, common
    // cutoff_frequency df counts, auto_date_histogram span probe) must
    // be SKIPPED under validate — proven by validating against frames
    // whose evaluation throws: any executed job fails the classification
    // below. Schema errors in those same subtrees must still surface.
    val sp = spark
    import sp.implicits._
    val boom = udf { () =>
      if (true) throw new RuntimeException("corpus scan ran during validate")
      "x"
    }.asNondeterministic()
    val df = sp.range(3).select(col("id").as("doc_id"), boom().as("text"),
      boom().cast("date").as("ship_date"))
    val lookup = sp.range(2).select(col("id").as("doc_id"), boom().as("name"))
    val bodies = Seq(
      "v_common" -> """{"query": {"common": {"text": {"query": "the quick fox", "cutoff_frequency": 0.01}}}}""",
      "v_lookup" -> """{"query": {"terms": {"text": {"index": "lk", "path": "name"}}}}""",
      "v_adh" -> """{"size": 0, "aggs": {"d": {"auto_date_histogram": {"field": "ship_date", "buckets": 5}}}}""",
      "v_bad_field" -> """{"query": {"common": {"nope": {"query": "the fox"}}}}""",
      "v_bad_lookup_path" -> """{"query": {"terms": {"text": {"index": "lk", "path": "nope"}}}}""")
    val out = graft.dsl.EsQueryJson.withTables("lk" -> lookup) {
      graft.dsl.EsQueryJson.validateQuery(df, bodies)
    }.collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(out("v_common") == ((true, "ok")))
    assert(out("v_lookup") == ((true, "ok")))
    assert(out("v_adh") == ((true, "ok")))
    assert(out("v_bad_field")._1 == false)
    assert(out("v_bad_lookup_path")._1 == false)
    // sanity: the fixture genuinely explodes when anything executes
    intercept[Exception] { df.collect() }
  }

  test("more_like_this: selection, msm gate, include flag, reject shapes") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "spark hash table join spark"),   // the like doc
      (2L, "spark hash table lookup"),       // shares 3 selected terms
      (3L, "hash table of contents"),        // shares 2
      (4L, "spark only here"),               // shares 1
      (5L, "nothing relevant at all"),       // shares 0
      (6L, "spark hash crash")               // shares 2
    ).toDF("doc_id", "text")
    def ids(body: String): Seq[Long] =
      graft.dsl.EsQueryJson.search(docs, body)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    // min_doc_freq=2 drops like-only terms (join appears once in corpus →
    // df=1); selected = {spark, hash, table} (plus none beyond); msm=2
    val base = """{"query": {"bool": {"filter": [{"more_like_this": {
                 |  "fields": ["text"], "like": [{"_id": 1}],
                 |  "min_term_freq": 1, "min_doc_freq": 2,
                 |  "max_query_terms": 10, "minimum_should_match": 2%s}}]}},
                 | "sort": ["doc_id"], "size": 10}""".stripMargin
    assert(ids(base.format("")) == Seq(2L, 3L, 6L)) // like doc excluded, msm≥2
    // include: true keeps the like doc (it trivially shares everything)
    assert(ids(base.format(""", "include": true""")) == Seq(1L, 2L, 3L, 6L))
    // msm above every doc's overlap → empty, never an error
    val strict = base.replace(""""minimum_should_match": 2""",
      """"minimum_should_match": 9""")
    assert(ids(strict.format("")).isEmpty)
    // no candidate survives min_term_freq → matches nothing (ES behavior)
    assert(ids("""{"query": {"bool": {"filter": [{"more_like_this": {
                 |  "fields": ["text"], "like": "zzz yyy",
                 |  "min_term_freq": 2}}]}}, "size": 10}""".stripMargin).isEmpty)
    // scored form orders by shared-term BM25 and excludes the like doc
    val scored = graft.dsl.EsQueryJson.search(docs,
      """{"query": {"more_like_this": {
        |  "fields": ["text"], "like": [{"_id": 1}],
        |  "min_term_freq": 1, "min_doc_freq": 2, "minimum_should_match": 1}},
        | "sort": ["_score", "doc_id"], "size": 10}""".stripMargin)
      .select("doc_id").collect().map(_.getLong(0))
    assert(!scored.contains(1L) && scored.nonEmpty)
    assert(scored.head == 2L) // highest term overlap wins
    // unlike: terms from the unlike source leave the selection — with
    // {spark, hash} skipped only {table} remains, so doc 6 (no 'table')
    // drops and doc 4 ('spark' only) was never in
    val unliked = """{"query": {"bool": {"filter": [{"more_like_this": {
                    |  "fields": ["text"], "like": [{"_id": 1}],
                    |  "unlike": "spark hash crash",
                    |  "min_term_freq": 1, "min_doc_freq": 2,
                    |  "max_query_terms": 10, "minimum_should_match": 1}}]}},
                    | "sort": ["doc_id"], "size": 10}""".stripMargin
    assert(ids(unliked) == Seq(2L, 3L))
    // artificial document like: the {"doc": ...} text drives selection
    val art = """{"query": {"bool": {"filter": [{"more_like_this": {
                |  "fields": ["text"], "like": [{"doc": {"text": "spark hash table"}}],
                |  "min_term_freq": 1, "min_doc_freq": 2,
                |  "max_query_terms": 10, "minimum_should_match": 2}}]}},
                | "sort": ["doc_id"], "size": 10}""".stripMargin
    assert(ids(art) == Seq(1L, 2L, 3L, 6L)) // no doc ref → nothing excluded
    // reject shapes: two fields / artificial doc without the queried
    // field / unsupported option / empty like
    def rejects(body: String): Unit =
      intercept[IllegalArgumentException] {
        graft.dsl.EsQueryJson.search(docs, body)
      }
    rejects("""{"query": {"more_like_this": {"fields": ["text", "lang"], "like": "x"}}}""")
    rejects("""{"query": {"more_like_this": {"fields": ["text"], "like": [{"doc": {"lang": "en"}}]}}}""")
    rejects("""{"query": {"more_like_this": {"fields": ["text"], "like": "x", "stop_words": ["y"]}}}""")
    rejects("""{"query": {"more_like_this": {"fields": ["text"], "like": []}}}""")
  }

  test("_validate classifies mlt doc refs ok on an 'id'-keyed frame (ADVICE r14)") {
    // pre-fix: validate mode hardcoded idColName "doc_id", so a valid
    // more_like_this body with doc refs against a frame using the other
    // id convention built a nonexistent column and falsely classified
    val sp = spark
    import sp.implicits._
    val idFrame = Seq((1L, "spark hash table"), (2L, "hash join table"))
      .toDF("id", "text")
    val out = graft.dsl.EsQueryJson.validateQuery(idFrame, Seq(
      "v_mlt" -> """{"query": {"more_like_this": {"fields": ["text"],
                   | "like": [{"_id": 1}], "min_term_freq": 1}}}""".stripMargin))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out("v_mlt") == "ok")
  }

  test("constant-score fallback multiplies the clause boost (ADVICE r14)") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L))
      .toDF("doc_id", "lang", "n_chars")
    def scores(body: String): Seq[Double] =
      graft.dsl.EsQueryJson.search(docs, body)
        .select("_score").collect().map(_.getDouble(0)).toSeq
    // field-object boost (term/range), body-level boost (exists — the
    // allowlisted form; `terms` takes no body-level key), default 1.0
    assert(scores("""{"query": {"term": {"lang": {"value": "en", "boost": 3}}},
                    | "sort": ["_score", "doc_id"]}""".stripMargin) == Seq(3.0, 3.0))
    assert(scores("""{"query": {"exists": {"field": "lang", "boost": 0.5}},
                    | "sort": ["_score", "doc_id"]}""".stripMargin) == Seq(0.5, 0.5, 0.5))
    assert(scores("""{"query": {"term": {"lang": "en"}},
                    | "sort": ["_score", "doc_id"]}""".stripMargin) == Seq(1.0, 1.0))
    // range with a boost inside the field object
    assert(scores("""{"query": {"range": {"n_chars": {"gte": 15, "boost": 4}}},
                    | "sort": ["_score", "doc_id"]}""".stripMargin) == Seq(4.0, 4.0))
  }

  test("terms min_doc_count 0: zero buckets for index terms outside the scope") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      ("en", "web", 10L), ("en", "wiki", 20L), ("de", "web", 30L),
      ("fr", "wiki", 40L), ("de", "web", 50L)).toDF("lang", "source", "n")
    // query scopes to n >= 30: en drops out of scope but must come back
    // as a zero bucket (ES reads the term dictionary of the INDEX)
    val got = graft.dsl.EsQueryJson.aggregations(df,
      """{"query": {"range": {"n": {"gte": 30}}},
        | "aggs": {"l": {"terms": {"field": "lang", "size": 10, "min_doc_count": 0},
        |   "aggs": {"s": {"sum": {"field": "n"}}}}}}""".stripMargin)("l")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(2)))).toSeq
    // default order: _count desc, key asc; the zero bucket ranks last
    // and carries a null metric (the fill convention)
    assert(got == Seq(("de", 2L, Some(80.0)), ("fr", 1L, Some(40.0)), ("en", 0L, None)))
    // size truncation happens AFTER the fill: size 2 cuts the zero tail
    val cut = graft.dsl.EsQueryJson.aggregations(df,
      """{"query": {"range": {"n": {"gte": 30}}},
        | "aggs": {"l": {"terms": {"field": "lang", "size": 2, "min_doc_count": 0}}}}""".stripMargin)("l")
      .collect().map(_.getString(0)).toSeq
    assert(cut == Seq("de", "fr"))
    // exclude prunes the fill domain too
    val excl = graft.dsl.EsQueryJson.aggregations(df,
      """{"query": {"range": {"n": {"gte": 30}}},
        | "aggs": {"l": {"terms": {"field": "lang", "size": 10,
        |   "min_doc_count": 0, "exclude": "en"}}}}""".stripMargin)("l")
      .collect().map(_.getString(0)).toSeq
    assert(excl == Seq("de", "fr"))
  }

  test("nested terms leaf min_doc_count 0: per-parent term-dictionary fill") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      ("p1", "a", 5L), ("p1", "a", 6L), ("p1", "b", 7L),
      ("p2", "b", 8L), ("p2", "c", 9L), ("p3", "c", 1L)).toDF("g", "t", "n")
    // scope drops p3 entirely and thins the rest; every SURVIVING parent
    // must carry a bucket per index term of t ({a,b,c}), zeros filled
    val got = graft.dsl.EsQueryJson.aggregations(df,
      """{"query": {"range": {"n": {"gte": 5}}},
        | "aggs": {"g": {"terms": {"field": "g", "size": 10},
        |   "aggs": {"t": {"terms": {"field": "t", "size": 10, "min_doc_count": 0}}}}}}""".stripMargin)("g")
      .orderBy("g", "t")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("p1", "a", 2L), ("p1", "b", 1L), ("p1", "c", 0L),
      ("p2", "a", 0L), ("p2", "b", 1L), ("p2", "c", 1L)))
    // leaf size ranks AFTER the fill: real buckets beat zeros, zero tail
    // fills by key only up to size
    val sized = graft.dsl.EsQueryJson.aggregations(df,
      """{"query": {"range": {"n": {"gte": 5}}},
        | "aggs": {"g": {"terms": {"field": "g", "size": 10},
        |   "aggs": {"t": {"terms": {"field": "t", "size": 2, "min_doc_count": 0}}}}}}""".stripMargin)("g")
      .orderBy("g", "t")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(sized == Seq(
      ("p1", "a", 2L), ("p1", "b", 1L),
      ("p2", "b", 1L), ("p2", "c", 1L)))
    // a terms leaf with min_doc_count > 1 still rejects loudly
    intercept[IllegalArgumentException] {
      graft.dsl.EsQueryJson.aggregations(df,
        """{"aggs": {"g": {"terms": {"field": "g", "size": 10},
          |   "aggs": {"t": {"terms": {"field": "t", "size": 2, "min_doc_count": 2}}}}}}""".stripMargin)("g")
        .collect()
    }
  }

  test("zero-fill rejects fractional histogram intervals (ADVICE r14)") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("a", 1.0), ("a", 5.0), ("b", 2.0)).toDF("g", "v")
    // 0.5 truncated to step 0 pre-fix (runtime sequence failure); 2.5
    // filled misaligned keys — both must reject at parse time, on both
    // the single-level and the per-series fill paths
    def rejects(body: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        graft.dsl.EsQueryJson.aggregations(df, body).values.foreach(_.collect())
      }
      assert(e.getMessage.contains("positive whole number"), e.getMessage)
    }
    rejects("""{"aggs": {"h": {"histogram": {"field": "v", "interval": 0.5, "min_doc_count": 0}}}}""")
    rejects("""{"aggs": {"h": {"histogram": {"field": "v", "interval": 2.5, "min_doc_count": 0}}}}""")
    rejects("""{"aggs": {"g": {"terms": {"field": "g", "size": 5},
              | "aggs": {"h": {"histogram": {"field": "v", "interval": 2.5, "min_doc_count": 0}}}}}}""".stripMargin)
    // whole intervals still fill: keys 0,2,4 with the gap at 2 zeroed
    val filled = graft.dsl.EsQueryJson.aggregations(df,
      """{"aggs": {"h": {"histogram": {"field": "v", "interval": 2, "min_doc_count": 0}}}}""")("h")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(filled == Seq((0L, 1L), (2L, 1L), (4L, 1L)))
  }

  test("whitespace/fuzzy match count duplicate clauses per occurrence (ADVICE r15)") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "Alpha beta Alpha"),   // has Alpha (x2 in doc, irrelevant) and beta
      (2L, "Alpha gamma"),        // has Alpha, missing beta
      (3L, "alpha beta"),         // lowercase — whitespace analyzer is case-sensitive
      (4L, "beta Alpha delta")    // has both
    ).toDF("id", "t")
    // whitespace analyzer, operator:and, repeated query token: msm counts 3
    // occurrence clauses; both Alpha clauses are satisfied by one posting
    // (pre-fix the deduped intersect capped the count at 2 → matched NOTHING)
    val ws = EsQueryJson.search(df,
      """{"query": {"match": {"t": {"query": "Alpha beta Alpha",
        | "analyzer": "whitespace", "operator": "and"}}},
        | "sort": ["id"], "size": 10}""".stripMargin)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ws == Seq(1L, 4L))
    // fuzziness + operator:and with a repeated token: same clause math, the
    // per-distinct-term existential weighted by multiplicity
    val fz = EsQueryJson.search(df,
      """{"query": {"match": {"t": {"query": "alpha beta alpha",
        | "fuzziness": 0, "operator": "and"}}},
        | "sort": ["id"], "size": 10}""".stripMargin)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(fz == Seq(1L, 3L, 4L))  // default analyzer lowercases → 3 matches too
    // partial msm over duplicate clauses: "alpha alpha gamma" msm=2 — a doc
    // with only alpha satisfies TWO clauses (Lucene counts clauses, not terms)
    val msm2 = EsQueryJson.search(df,
      """{"query": {"match": {"t": {"query": "alpha alpha gamma",
        | "minimum_should_match": 2}}},
        | "sort": ["id"], "size": 10}""".stripMargin)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(msm2 == Seq(1L, 2L, 3L, 4L))
  }

  test("search_after composes with a custom sort `missing` substitute (ADVICE r15)") {
    val sp = spark
    import sp.implicits._
    // v null on even ids; missing:0 sorts them AS value 0 (ES substitute
    // semantics) — the sort key compiles to a coalesced computed column, so
    // the cursor compares against the substituted value and the null-tail
    // arms of the search_after predicate never engage
    val df = (1L to 8L).map(i => (i, if (i % 2 == 0) None else Some(i * 10.0)))
      .toDF("id", "v")
    val body = (after: String) =>
      s"""{"query": {"match_all": {}},
         | "sort": [{"v": {"order": "asc", "missing": 0}}, "id"],
         | $after"size": 3}""".stripMargin
    val p1 = EsQueryJson.search(df, body("")).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(p1 == Seq(2L, 4L, 6L))
    // the cursor carries the SUBSTITUTED sort value (what ES returns in the
    // hit's sort array): 0 for a missing-v doc
    val p2 = EsQueryJson.search(df, body(""""search_after": [0, 6], """))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(p2 == Seq(8L, 1L, 3L))
    val p3 = EsQueryJson.search(df, body(""""search_after": [30, 3], """))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(p3 == Seq(5L, 7L))
  }
}
