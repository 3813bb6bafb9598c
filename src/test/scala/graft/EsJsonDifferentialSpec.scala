package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Differential fuzz with MECHANICALLY-DERIVED oracles (round-15 task):
  * the round-14 fuzz proves every ok body EXECUTES; this spec proves the
  * ANSWER is right for the SQL-expressible subset of the generator. For
  * each generated body the same JSON AST is walked twice:
  *
  *   1. by [[graft.dsl.EsQueryJson]] (the engine under test), and
  *   2. by a ~100-line translator IN THIS SPEC that emits ANSI SQL
  *      encoding ES-6.5 semantics (missing-field null handling via
  *      coalesce, sort `missing: _last` defaults, terms/histogram key
  *      rules, bucket ordering) and runs it through `spark.sql` over a
  *      temp view — a fully independent evaluation path (SQL parser +
  *      optimizer, none of the DSL's Column-building code).
  *
  * Any divergence is an answer-level bug in one of the two walks — the
  * class of bug the fixed oracle corpus can't catch and the execute-only
  * fuzz can't see (three of round 14's eleven validation finds returned
  * plausible-but-wrong answers for multiple rounds). Subset covered:
  * term/terms/range/exists leaves, bool (must/filter/must_not/should +
  * minimum_should_match) to depth 2, sort (+ missing-last semantics) with
  * from/size pagination, and single-level terms / histogram /
  * date_histogram aggs with an optional metric sub-agg (min/max/sum/avg/
  * value_count) including `min_doc_count: 0` fills.
  *
  * Seeded (`pureApply`) — the corpus is deterministic; a found bug stays
  * found. ≥500 bodies compared (the round-15 "done" bar). */
class EsJsonDifferentialSpec extends AnyFunSuite with SparkTestBase {

  private val mapper = new ObjectMapper()

  // ---- fixture --------------------------------------------------------
  // nulls sprinkled on lang (every 11th) and n_chars (every 13th) so the
  // ES missing-field semantics genuinely differ from naive SQL; ts spans
  // 24 months so date_histogram has a real key range.
  private lazy val docs: DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // explicit Row + schema (not toDF(names)): Spark 4.1's toDF leaves an
    // UnresolvedSubqueryColumnAliases root that a temp view cannot
    // re-resolve (ASSIGNMENT_ARITY_MISMATCH at view expansion)
    val rows = (0 until 240).map { i =>
      val lang = if (i % 11 == 0) null else Seq("en", "de", "fr", "es", "zh")(i % 5)
      val source = Seq("web", "wiki", "book", "code")(i % 4)
      val n: java.lang.Long = if (i % 13 == 0) null else (i * 7 % 400).toLong
      val score = (i * 31 % 100) / 10.0
      val ts = java.sql.Timestamp.valueOf(
        f"${2023 + (i % 24) / 12}-${i % 12 + 1}%02d-${i % 27 + 1}%02d 06:00:00")
      Row(i.toLong, lang, source, n, score, ts)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("lang", StringType, nullable = true),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = true),
      StructField("score", DoubleType, nullable = false),
      StructField("ts", TimestampType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  // ---- body generator (the SQL-expressible subset) ---------------------
  private val strVals = Seq("en", "de", "fr", "es", "zh", "web", "wiki", "book", "nope")
  private val strFieldVal: Gen[(String, String)] = Gen.oneOf(
    for (v <- Gen.oneOf(strVals.take(6))) yield ("lang", v),
    for (v <- Gen.oneOf(strVals.drop(5))) yield ("source", v))
  private val numField = Gen.oneOf("doc_id", "n_chars", "score")

  private def termGen: Gen[String] = Gen.oneOf(
    strFieldVal.map { case (f, v) => s"""{"term": {"$f": "$v"}}""" },
    for { f <- numField; v <- Gen.chooseNum(0, 300) }
      yield s"""{"term": {"$f": $v}}""")

  private def termsGen: Gen[String] =
    strFieldVal.flatMap { case (f, _) =>
      Gen.pick(2, strVals).map(vs =>
        s"""{"terms": {"$f": [${vs.map(v => s""""$v"""").mkString(", ")}]}}""")
    }

  private def rangeGen: Gen[String] = for {
    f <- numField
    lo <- Gen.chooseNum(-10, 250)
    span <- Gen.chooseNum(5, 200)
    ops <- Gen.oneOf(Seq("gte", "lt"), Seq("gt"), Seq("gte", "lte"), Seq("lte"))
  } yield {
    val bounds = ops.map {
      case o @ ("gte" | "gt") => s""""$o": $lo"""
      case o => s""""$o": ${lo + span}"""
    }.mkString(", ")
    s"""{"range": {"$f": {$bounds}}}"""
  }

  private def existsGen: Gen[String] =
    Gen.oneOf("lang", "n_chars", "source").map(f => s"""{"exists": {"field": "$f"}}""")

  private def leafGen: Gen[String] =
    Gen.frequency(3 -> termGen, 2 -> termsGen, 4 -> rangeGen, 2 -> existsGen)

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
    msm <- Gen.option(Gen.chooseNum(1, 2))
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
    Gen.frequency(6 -> leafGen, 4 -> boolGen(depth))

  private def sortGen: Gen[String] = Gen.oneOf(
    """"sort": ["doc_id"]""",
    """"sort": [{"n_chars": {"order": "desc"}}, "doc_id"]""",
    """"sort": [{"n_chars": {"order": "asc"}}, "doc_id"]""",
    """"sort": [{"score": {"order": "desc"}}, "doc_id"]""",
    """"sort": [{"ts": {"order": "asc"}}, "doc_id"]""",
    """"sort": [{"lang": {"order": "desc"}}, "doc_id"]""")

  private def metricGen: Gen[Option[(String, String, String)]] = Gen.frequency(
    2 -> Gen.const(None),
    3 -> (for { k <- Gen.oneOf("min", "max", "sum", "avg", "value_count")
                f <- Gen.oneOf("n_chars", "score", "doc_id") }
      yield Some((k, f, s"""{"$k": {"field": "$f"}}"""))))

  /** One single-level agg: (aggs-json, leaf-kind, spec fields needed by
    * the SQL twin). */
  private def aggGen: Gen[String] = for {
    m <- metricGen
    sub = m.map { case (_, _, j) => s""", "aggs": {"m": $j}""" }.getOrElse("")
    a <- Gen.frequency(
      3 -> (for { f <- Gen.oneOf("lang", "source")
                  size <- Gen.oneOf(3, 5, 10)
                  ord <- Gen.oneOf("", """, "order": {"_key": "asc"}""",
                    """, "order": {"_key": "desc"}""")
                  mdc <- Gen.oneOf("", """, "min_doc_count": 0""") }
        yield s"""{"terms": {"field": "$f", "size": $size$ord$mdc}$sub}"""),
      2 -> (for { f <- Gen.oneOf("n_chars", "doc_id")
                  iv <- Gen.oneOf(25, 50, 100)
                  mdc <- Gen.oneOf("", """, "min_doc_count": 0""") }
        yield s"""{"histogram": {"field": "$f", "interval": $iv$mdc}$sub}"""),
      2 -> (for { iv <- Gen.oneOf("month", "year") }
        yield s"""{"date_histogram": {"field": "ts", "calendar_interval": "$iv"}$sub}"""))
  } yield s""""aggs": {"g": $a}"""

  private case class Body(json: String, hasSort: Boolean, hasAgg: Boolean)

  private def bodyGen: Gen[Body] = for {
    q <- queryGen(1)
    sort <- Gen.option(sortGen)
    page <- Gen.option(for { f <- Gen.chooseNum(0, 7); s <- Gen.chooseNum(1, 40) }
      yield s""""from": $f, "size": $s""")
    agg <- Gen.frequency(3 -> Gen.const(None), 2 -> aggGen.map(Some(_)))
  } yield {
    // pagination without a total sort order has no cross-engine contract
    val pageEff = page.filter(_ => sort.isDefined)
    val parts = Seq(Some(s""""query": $q"""), sort, pageEff, agg).flatten
    Body(s"{${parts.mkString(", ")}}", sort.isDefined, agg.isDefined)
  }

  private val N = 600
  private lazy val corpus: Seq[Body] =
    Gen.listOfN(N, bodyGen).pureApply(Gen.Parameters.default, Seed(15082026L))

  // ---- the mechanical SQL twin (ES-6.5 semantics in ANSI SQL) ----------

  private def lit(n: JsonNode): String =
    if (n.isNumber) n.asText() else s"'${n.asText()}'"

  /** Query AST → SQL predicate. Missing fields never match a positive
    * leaf (coalesce(..., FALSE) — ES's unindexed-doc rule), and must_not
    * matches docs where the inner clause is null-or-false. */
  private def qSql(q: JsonNode): String = {
    val kind = q.fieldNames().asScala.next()
    val body = q.get(kind)
    kind match {
      case "term" =>
        val f = body.fieldNames().asScala.next()
        val v = body.get(f)
        val value = if (v.isObject) v.get("value") else v
        s"coalesce($f = ${lit(value)}, FALSE)"
      case "terms" =>
        val f = body.fieldNames().asScala.next()
        val vs = body.get(f).elements().asScala.map(lit).mkString(", ")
        s"coalesce($f IN ($vs), FALSE)"
      case "range" =>
        val f = body.fieldNames().asScala.next()
        val b = body.get(f)
        val parts = Seq("gte" -> ">=", "gt" -> ">", "lte" -> "<=", "lt" -> "<")
          .flatMap { case (k, op) => Option(b.get(k)).map(v => s"$f $op ${lit(v)}") }
        s"coalesce(${parts.mkString(" AND ")}, FALSE)"
      case "exists" =>
        s"${body.get("field").asText()} IS NOT NULL"
      case "bool" =>
        val musts = (Option(body.get("must")).toSeq ++ Option(body.get("filter")).toSeq)
          .flatMap(_.elements().asScala).map(qSql)
        val nots = Option(body.get("must_not")).toSeq
          .flatMap(_.elements().asScala).map(n => s"NOT (${qSql(n)})")
        val shoulds = Option(body.get("should")).toSeq
          .flatMap(_.elements().asScala).map(qSql).toSeq
        // ES default minimum_should_match: 1 when the bool has shoulds and
        // no must/filter; 0 (scoring-only) otherwise
        val msmEff = Option(body.get("minimum_should_match")).map(_.asInt())
          .getOrElse(if (musts.isEmpty && shoulds.nonEmpty) 1 else 0)
        val shouldPred =
          if (shoulds.isEmpty || msmEff == 0) None
          else Some(shoulds.map(s => s"(CASE WHEN $s THEN 1 ELSE 0 END)")
            .mkString("(", " + ", s") >= $msmEff"))
        // "1=1", not "TRUE": Spark 4.1's parser mis-resolves a bare
        // parenthesized boolean literal after WHERE against a temp view
        // (ASSIGNMENT_ARITY_MISMATCH — found building this spec)
        val all = musts ++ nots ++ shouldPred
        if (all.isEmpty) "1=1" else all.mkString("(", ") AND (", ")")
    }
  }

  /** Sort spec → SQL ORDER BY items with ES's `missing: _last` default
    * for both directions. */
  private def sortSql(sort: JsonNode): String =
    sort.elements().asScala.map { e =>
      if (e.isTextual) s"${e.asText()} ASC NULLS LAST"
      else {
        val f = e.fieldNames().asScala.next()
        val dir = Option(e.get(f).get("order")).map(_.asText()).getOrElse("asc")
        s"$f ${dir.toUpperCase} NULLS LAST"
      }
    }.mkString(", ")

  /** Mirrors the engine's documented response rounding (avg 6 dp,
    * sum/min/max 4 dp — the same convention every oracle row pins). */
  private def metricSql(kind: String, f: String): String = kind match {
    case "value_count" => s"count($f)"
    case "avg" => s"round(avg($f), 6)"
    case k => s"round($k($f), 4)"   // min / max / sum
  }

  /** Agg AST → (SQL over `docs` scoped by `where`, number of columns).
    * Encodes the ES bucket rules the engine must match: null keys drop,
    * terms order `_count` desc / `_key` with key tiebreak then size-
    * truncate, histogram keys floor(v/iv)*iv as long, `min_doc_count: 0`
    * fills (terms: the index-wide term set; histogram: every interval
    * between the observed bounds), metric sub-aggs null on fills. */
  private def aggSql(agg: JsonNode, where: String): String = {
    val g = agg.get("g")
    val kind = g.fieldNames().asScala.toSeq.filterNot(_ == "aggs").head
    val spec = g.get(kind)
    val f = spec.get("field").asText()
    val metric = Option(g.get("aggs")).map { sub =>
      val m = sub.get("m")
      val mk = m.fieldNames().asScala.next()
      metricSql(mk, m.get(mk).get("field").asText())
    }
    val mSel = metric.map(m => s", $m AS m").getOrElse("")
    val mNull = metric.map(_ => ", NULL AS m").getOrElse("")
    val mOuter = metric.map(_ => ", b.m AS m").getOrElse("")
    kind match {
      case "terms" =>
        val size = Option(spec.get("size")).map(_.asInt()).getOrElse(10)
        val fill = Option(spec.get("min_doc_count")).exists(_.asInt() == 0)
        val ord = Option(spec.get("order")).map { o =>
          val t = o.fieldNames().asScala.next()
          val d = o.get(t).asText().toUpperCase
          t match { case "_key" => s"key $d"; case _ => s"doc_count $d, key ASC" }
        }.getOrElse("doc_count DESC, key ASC")
        if (!fill)
          s"""SELECT $f AS key, count(*) AS doc_count$mSel
             |FROM docs WHERE ($where) AND $f IS NOT NULL
             |GROUP BY $f ORDER BY $ord LIMIT $size""".stripMargin
        else
          s"""WITH b AS (SELECT $f AS key, count(*) AS doc_count$mSel
             |  FROM docs WHERE ($where) AND $f IS NOT NULL GROUP BY $f),
             |dom AS (SELECT DISTINCT $f AS key FROM docs WHERE $f IS NOT NULL)
             |SELECT dom.key AS key, coalesce(b.doc_count, 0) AS doc_count$mOuter
             |FROM dom LEFT JOIN b ON dom.key = b.key
             |ORDER BY $ord LIMIT $size""".stripMargin
      case "histogram" =>
        val iv = spec.get("interval").asLong()
        val keyExpr = s"CAST(floor($f / $iv) * $iv AS BIGINT)"
        val fill = Option(spec.get("min_doc_count")).exists(_.asInt() == 0)
        if (!fill)
          s"""SELECT $keyExpr AS key, count(*) AS doc_count$mSel
             |FROM docs WHERE ($where) AND $f IS NOT NULL
             |GROUP BY 1 ORDER BY key""".stripMargin
        else
          s"""WITH b AS (SELECT $keyExpr AS key, count(*) AS doc_count$mSel
             |  FROM docs WHERE ($where) AND $f IS NOT NULL GROUP BY 1),
             |bb AS (SELECT min(key) AS lo, max(key) AS hi FROM b),
             |dom AS (SELECT explode(sequence(lo, hi, $iv)) AS key FROM bb)
             |SELECT dom.key AS key, coalesce(b.doc_count, 0) AS doc_count$mOuter
             |FROM dom LEFT JOIN b ON dom.key = b.key ORDER BY key""".stripMargin
      case "date_histogram" =>
        val iv = spec.get("calendar_interval").asText()
        s"""SELECT date_trunc('$iv', $f) AS key, count(*) AS doc_count$mSel
           |FROM docs WHERE ($where) AND $f IS NOT NULL
           |GROUP BY 1 ORDER BY key""".stripMargin
    }
  }

  // ---- normalization + compare -----------------------------------------

  private def norm(v: Any): Any = v match {
    case null => null
    case d: java.lang.Double => BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    case f: java.lang.Float => BigDecimal(f.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    case d: java.math.BigDecimal => BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    case n: java.lang.Number => BigDecimal(n.longValue())
    case t: java.sql.Timestamp => t.toString
    case other => other
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => norm(r.get(i))))

  private def runSql(sql: String): DataFrame =
    try spark.sql(sql)
    catch { case e: Throwable =>
      fail(s"twin SQL failed: ${e.getMessage}\n$sql") }

  // ---- the differential -------------------------------------------------

  test(s"differential: $N generated bodies answer-match the mechanical SQL twin") {
    val d = docs.cache()
    d.createOrReplaceTempView("docs")
    val sp = spark
    var nHits = 0; var nAggs = 0
    try {
      corpus.zipWithIndex.foreach { case (b, i) =>
        val ast = mapper.readTree(b.json)
        val where = qSql(ast.get("query"))

        // hits: ordered compare under a sort (always doc_id-tiebroken by
        // the generator), set compare otherwise
        val hits = graft.dsl.EsQueryJson.search(d, b.json)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        val page = if (b.hasSort) {
          val from = Option(ast.get("from")).map(_.asInt()).getOrElse(0)
          val size = Option(ast.get("size")).map(_.asInt()).getOrElse(10)
          s"LIMIT $size OFFSET $from"
        } else ""
        val orderBy = if (b.hasSort) s"ORDER BY ${sortSql(ast.get("sort"))}" else ""
        val sqlHits = runSql(
          s"SELECT doc_id FROM docs WHERE $where $orderBy $page")
          .collect().map(_.getLong(0)).toSeq
        if (b.hasSort)
          assert(hits == sqlHits, s"body $i hits diverge:\n${b.json}")
        else {
          // no sort: ES default size 10 — both sides untruncated-compare
          val full = graft.dsl.EsQueryJson.search(d,
            b.json.replaceFirst("\\{", s"""{"size": 500, """))
            .select("doc_id").collect().map(_.getLong(0)).toSet
          assert(full == sqlHits.toSet, s"body $i hit SET diverges:\n${b.json}")
        }
        nHits += 1

        if (b.hasAgg) {
          val got = rows(graft.dsl.EsQueryJson.aggregations(d, b.json)("g"))
          val want = rows(runSql(aggSql(ast.get("aggs"), where)))
          assert(got == want,
            s"body $i agg diverges:\n${b.json}\n got: $got\nwant: $want")
          nAggs += 1
        }
      }
    } finally { d.unpersist(); () }
    // the corpus must genuinely cover both arms
    assert(nHits >= 500, s"too few hit comparisons: $nHits")
    assert(nAggs >= 150, s"too few agg comparisons: $nAggs")
  }
}
