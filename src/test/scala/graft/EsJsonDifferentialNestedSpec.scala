package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Differential fuzz, second front (round 15): WIDER agg shapes than
  * [[EsJsonDifferentialSpec]] (which pins single-level buckets + one
  * metric). Every generated body is answered twice — by the engine and by
  * a mechanical AST→ANSI-SQL translator run through `spark.sql` — and the
  * answers must match value-for-value. New coverage:
  *
  *   - NESTED 2-level bucket chains (terms/histogram/date_histogram outer
  *     × terms/histogram inner) including OUTER size truncation (rank by
  *     outer doc_count desc, key asc — computed on the full outer scope,
  *     not the inner-joined frame) and PER-PARENT inner terms truncation
  *     (row_number over each parent);
  *   - parent pipeline aggs (cumulative_sum / derivative over `_count` or
  *     a metric path) on histogram/date_histogram buckets;
  *   - named `filters` aggs (per-name count + per-name metric columns);
  *   - `range` aggs with keyed ranges + optional metric;
  *   - `stats` as the leaf metric (5-value expansion);
  *   - prefix / wildcard query leaves (keyword anchoring ↔ SQL LIKE).
  *
  * Same method as the first front: any divergence is an answer-level bug
  * in one of two INDEPENDENT evaluation paths — the class the fixed
  * oracle corpus cannot catch (round 15's first front caught the size-10
  * default and the null-key bucket on its first run). Seeded; ≥400
  * bodies. */
class EsJsonDifferentialNestedSpec extends AnyFunSuite with SparkTestBase {

  private val mapper = new ObjectMapper()

  // ---- fixture: same shape as the first front (nulls on lang / n_chars,
  // 24-month ts span) so missing-field semantics stay load-bearing -------
  private lazy val docs: DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rows = (0 until 240).map { i =>
      val lang = if (i % 11 == 0) null else Seq("en", "de", "fr", "es", "zh")(i % 5)
      val source = Seq("web", "wiki", "book", "code")(i % 4)
      val n: java.lang.Long = if (i % 13 == 0) null else (i * 7 % 400).toLong
      val score = (i * 31 % 100) / 10.0
      val ts = java.sql.Timestamp.valueOf(
        f"${2023 + (i % 24) / 12}-${i % 12 + 1}%02d-${i % 27 + 1}%02d 06:00:00")
      // deterministic word soup: single-space, lowercase, alnum-only —
      // the standard analyzer's token stream IS the whitespace split,
      // which keeps the match-family SQL twin mechanical
      val text = if (i % 17 == 0) null
        else (0 until 10).map(j => vocab((i * 7 + j * 3 + j * j) % 12)).mkString(" ")
      Row(i.toLong, lang, source, n, score, ts, text)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("lang", StringType, nullable = true),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = true),
      StructField("score", DoubleType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  // ---- query generator: first-front leaves + prefix/wildcard -----------
  private val strVals = Seq("en", "de", "fr", "es", "zh", "web", "wiki", "book", "nope")
  private val strFieldVal: Gen[(String, String)] = Gen.oneOf(
    for (v <- Gen.oneOf(strVals.take(6))) yield ("lang", v),
    for (v <- Gen.oneOf(strVals.drop(5))) yield ("source", v))

  private def termGen: Gen[String] = Gen.oneOf(
    strFieldVal.map { case (f, v) => s"""{"term": {"$f": "$v"}}""" },
    for { f <- Gen.oneOf("doc_id", "n_chars"); v <- Gen.chooseNum(0, 300) }
      yield s"""{"term": {"$f": $v}}""")

  private def rangeQGen: Gen[String] = for {
    f <- Gen.oneOf("doc_id", "n_chars", "score")
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

  /** Keyword-anchored prefix: first 1–2 chars of a live value (or a miss). */
  private def prefixGen: Gen[String] = for {
    (f, v) <- strFieldVal
    k <- Gen.chooseNum(1, 2)
  } yield s"""{"prefix": {"$f": "${v.take(k)}"}}"""

  /** Wildcard patterns over whole keyword values: star/question forms. */
  private def wildcardGen: Gen[String] = for {
    (f, v) <- strFieldVal
    pat <- Gen.oneOf(s"${v.take(1)}*", s"*${v.takeRight(1)}",
      s"${v.take(1)}*${v.takeRight(1)}", s"?${v.drop(1)}")
  } yield s"""{"wildcard": {"$f": "$pat"}}"""

  private def leafGen: Gen[String] = Gen.frequency(
    3 -> termGen, 3 -> rangeQGen, 2 -> existsGen, 2 -> prefixGen, 2 -> wildcardGen)

  private def boolGen: Gen[String] = for {
    nMust <- Gen.chooseNum(0, 2)
    nShould <- Gen.chooseNum(0, 2)
    nNot <- Gen.chooseNum(0, 1)
    must <- Gen.listOfN(nMust, leafGen)
    should <- Gen.listOfN(nShould, leafGen)
    mnot <- Gen.listOfN(nNot, leafGen)
  } yield {
    val parts = Seq(
      if (must.nonEmpty) Some(s""""must": [${must.mkString(", ")}]""") else None,
      if (should.nonEmpty) Some(s""""should": [${should.mkString(", ")}]""") else None,
      if (mnot.nonEmpty) Some(s""""must_not": [${mnot.mkString(", ")}]""") else None
    ).flatten
    s"""{"bool": {${parts.mkString(", ")}}}"""
  }

  private def queryGen: Gen[String] = Gen.frequency(6 -> leafGen, 4 -> boolGen)

  // ---- agg generator: five widened arms ---------------------------------

  /** Leaf metric: (kind, field, json). `stats` expands to 5 columns. */
  private def metricGen: Gen[Option[(String, String)]] = Gen.frequency(
    2 -> Gen.const(None),
    3 -> (for { k <- Gen.oneOf("min", "max", "sum", "avg", "value_count")
                f <- Gen.oneOf("n_chars", "score", "doc_id") }
      yield Some((k, f))),
    1 -> Gen.const(Some(("stats", "score"))))

  private def metricJson(m: Option[(String, String)]): String =
    m.map { case (k, f) => s""", "aggs": {"m": {"$k": {"field": "$f"}}}""" }.getOrElse("")

  private sealed trait Arm
  private case class Nested(outer: String, inner: String, m: Option[(String, String)]) extends Arm
  private case class Pipe(dateKeyed: Boolean, pipeKind: String, onCount: Boolean) extends Arm
  private case class FiltersArm(qa: String, qb: String, m: Option[(String, String)]) extends Arm
  private case class RangeArm(f: String, b1: Long, b2: Long, m: Option[(String, String)]) extends Arm

  /** outer bucket spec → (json fragment sans sub-aggs, SQL key expr, key
    * is-ranked-terms with size). */
  private def outerGen: Gen[(String, String, Option[Int])] = Gen.oneOf(
    for { f <- Gen.oneOf("lang", "source"); sz <- Gen.oneOf(2, 3, 10) }
      yield (s""""terms": {"field": "$f", "size": $sz}""", f, Some(sz)),
    for { f <- Gen.oneOf("n_chars", "doc_id"); iv <- Gen.oneOf(50L, 100L) }
      yield (s""""histogram": {"field": "$f", "interval": $iv}""",
        s"CAST(floor($f / $iv) * $iv AS BIGINT)", None),
    for (iv <- Gen.oneOf("month", "year"))
      yield (s""""date_histogram": {"field": "ts", "calendar_interval": "$iv"}""",
        s"date_trunc('$iv', ts)", None))

  /** inner bucket spec → (json fragment, SQL key expr, per-parent terms
    * size if ranked). */
  private def innerGen: Gen[(String, String, Option[Int])] = Gen.oneOf(
    for { f <- Gen.oneOf("lang", "source"); sz <- Gen.oneOf(2, 10) }
      yield (s""""terms": {"field": "$f", "size": $sz}""", f, Some(sz)),
    for { f <- Gen.oneOf("n_chars", "doc_id"); iv <- Gen.oneOf(50L, 100L) }
      yield (s""""histogram": {"field": "$f", "interval": $iv}""",
        s"CAST(floor($f / $iv) * $iv AS BIGINT)", None))

  private case class Body(json: String, twin: String)

  // field the SQL key expr groups on must be null-guarded like ES (bucket
  // aggs drop docs missing the field)
  private def keyField(expr: String): String =
    if (expr.contains("n_chars")) "n_chars"
    else if (expr.contains("doc_id")) "doc_id"
    else if (expr.startsWith("date_trunc")) "ts"
    else expr // terms: the bare column

  private def metricSql(kind: String, f: String): Seq[String] = kind match {
    case "value_count" => Seq(s"count($f) AS m")
    case "avg" => Seq(s"round(avg($f), 6) AS m")
    case "stats" => Seq(s"count($f) AS m_count", s"round(min($f), 4) AS m_min",
      s"round(max($f), 4) AS m_max", s"round(avg($f), 6) AS m_avg",
      s"round(sum($f), 4) AS m_sum")
    case k => Seq(s"round($k($f), 4) AS m")
  }

  // a metric over an empty/filled bucket never happens here (no mdc:0 in
  // this front), so plain aggregation SQL suffices.
  private def mCols(m: Option[(String, String)]): (String, String) = m match {
    case None => ("", "")
    case Some((k, f)) =>
      val sels = metricSql(k, f)
      (", " + sels.mkString(", "),
        ", " + sels.map(_.split(" AS ")(1)).map(c => s"b.$c").mkString(", "))
  }

  private def bodyGen: Gen[Body] = for {
    q <- queryGen
    arm <- Gen.frequency(
      4 -> (for { o <- outerGen; i <- innerGen; m <- metricGen }
        yield buildNested(q, o, i, m)),
      3 -> (for { dk <- Gen.oneOf(true, false); pk <- Gen.oneOf("cumulative_sum", "derivative")
                  oc <- Gen.oneOf(true, false) } yield buildPipe(q, dk, pk, oc)),
      2 -> (for { qa <- leafGen; qb <- leafGen; m <- metricGen }
        yield buildFilters(q, qa, qb, m)),
      2 -> (for { f <- Gen.oneOf("n_chars", "doc_id", "score")
                  b1 <- Gen.chooseNum(40L, 120L); w <- Gen.chooseNum(40L, 150L)
                  m <- metricGen } yield buildRange(q, f, b1, b1 + w, m)))
  } yield arm

  /** where-clause SQL for a query AST (same rules the first front proved:
    * positive leaves never match missing fields, must_not matches
    * null-or-false). */
  private def qSql(q: JsonNode): String = {
    val kind = q.fieldNames().asScala.next()
    val body = q.get(kind)
    def likeOf(pat: String): String =
      pat.flatMap { case '*' => "%"; case '?' => "_"; case c => s"$c" }
    kind match {
      case "term" =>
        val f = body.fieldNames().asScala.next()
        val v = body.get(f)
        val value = if (v.isObject) v.get("value") else v
        val l = if (value.isNumber) value.asText() else s"'${value.asText()}'"
        s"coalesce($f = $l, FALSE)"
      case "range" =>
        val f = body.fieldNames().asScala.next()
        val b = body.get(f)
        val parts = Seq("gte" -> ">=", "gt" -> ">", "lte" -> "<=", "lt" -> "<")
          .flatMap { case (k, op) => Option(b.get(k)).map(v => s"$f $op ${v.asText()}") }
        s"coalesce(${parts.mkString(" AND ")}, FALSE)"
      case "exists" => s"${body.get("field").asText()} IS NOT NULL"
      case "prefix" =>
        val f = body.fieldNames().asScala.next()
        s"coalesce($f LIKE '${body.get(f).asText()}%', FALSE)"
      case "wildcard" =>
        val f = body.fieldNames().asScala.next()
        s"coalesce($f LIKE '${likeOf(body.get(f).asText())}', FALSE)"
      case "bool" =>
        val musts = Option(body.get("must")).toSeq
          .flatMap(_.elements().asScala).map(qSql)
        val nots = Option(body.get("must_not")).toSeq
          .flatMap(_.elements().asScala).map(n => s"NOT (${qSql(n)})")
        val shoulds = Option(body.get("should")).toSeq
          .flatMap(_.elements().asScala).map(qSql).toSeq
        val shouldPred =
          if (shoulds.isEmpty || musts.nonEmpty) None   // default msm 1 only without must
          else Some(shoulds.mkString("(", ") OR (", ")"))
        val all = musts ++ nots ++ shouldPred
        if (all.isEmpty) "1=1" else all.mkString("(", ") AND (", ")")
    }
  }

  // ---- twins per arm -----------------------------------------------------

  /** Nested chain: outer buckets ranked/truncated on the FULL outer scope;
    * inner terms truncated per parent; compare sorted by (outer, inner). */
  private def buildNested(q: String, o: (String, String, Option[Int]),
                          i: (String, String, Option[Int]),
                          m: Option[(String, String)]): Body = {
    val (oJson, oKey, oSize) = o
    val (iJson, iKey, iSize) = i
    val json =
      s"""{"query": $q, "aggs": {"o": {$oJson,
         |  "aggs": {"i": {$iJson${metricJson(m)}}}}}}""".stripMargin
    val (mSel, mOuter) = mCols(m)
    val oGuard = s"${keyField(oKey)} IS NOT NULL"
    val iGuard = s"${keyField(iKey)} IS NOT NULL"
    val base =
      s"""b AS (SELECT $oKey AS ok, $iKey AS ik, count(*) AS doc_count$mSel
         |  FROM ddocs WHERE (@W@) AND $oGuard AND $iGuard GROUP BY 1, 2)""".stripMargin
    val outerSel = oSize match {
      case Some(sz) =>
        s""", tot AS (SELECT $oKey AS ok, count(*) AS c FROM ddocs
           |  WHERE (@W@) AND $oGuard GROUP BY 1
           |  ORDER BY c DESC, ok ASC LIMIT $sz)""".stripMargin
      case None => ""
    }
    val innerSel = iSize match {
      case Some(sz) =>
        s""", rk AS (SELECT *, row_number() OVER (
           |    PARTITION BY ok ORDER BY doc_count DESC, ik ASC) AS rn FROM b)""".stripMargin
      case None => ""
    }
    val src = if (iSize.isDefined) "rk" else "b"
    val innerCond = iSize.map(sz => s"$src.rn <= ${iSize.get}").getOrElse("1=1")
    val joinTot = if (oSize.isDefined) s"JOIN tot ON $src.ok = tot.ok" else ""
    val mProj = mOuter.replace("b.", s"$src.")
    val twin =
      s"""WITH $base$outerSel$innerSel
         |SELECT $src.ok AS ok, $src.ik AS ik, $src.doc_count AS doc_count$mProj
         |FROM $src $joinTot WHERE $innerCond ORDER BY ok, ik""".stripMargin
    Body(json, twin)
  }

  /** Pipeline over histogram/date_histogram buckets: cumulative_sum /
    * derivative on `_count` or on a sum-metric path. */
  private def buildPipe(q: String, dateKeyed: Boolean, pipeKind: String,
                        onCount: Boolean): Body = {
    val (bJson, keyExpr, guard) =
      if (dateKeyed)
        (""""date_histogram": {"field": "ts", "calendar_interval": "month"}""",
          "date_trunc('month', ts)", "ts IS NOT NULL")
      else
        (""""histogram": {"field": "n_chars", "interval": 50}""",
          "CAST(floor(n_chars / 50) * 50 AS BIGINT)", "n_chars IS NOT NULL")
    val path = if (onCount) "_count" else "m"
    val mJson = if (onCount) "" else """"m": {"sum": {"field": "score"}}, """
    val json =
      s"""{"query": $q, "aggs": {"g": {$bJson,
         |  "aggs": {$mJson"p": {"$pipeKind": {"buckets_path": "$path"}}}}}}""".stripMargin
    val mSel = if (onCount) "" else ", round(sum(score), 4) AS m"
    val mProj = if (onCount) "" else ", m"
    val src = if (onCount) "CAST(doc_count AS DOUBLE)" else "m"
    val pipeExpr = pipeKind match {
      case "cumulative_sum" =>
        s"round(sum($src) OVER (ORDER BY key ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)"
      case "derivative" => s"round($src - lag($src) OVER (ORDER BY key), 4)"
    }
    val twin =
      s"""WITH b AS (SELECT $keyExpr AS key, count(*) AS doc_count$mSel
         |  FROM ddocs WHERE (@W@) AND $guard GROUP BY 1)
         |SELECT key, doc_count$mProj, $pipeExpr AS p FROM b ORDER BY key""".stripMargin
    Body(json, twin)
  }

  /** Named filters agg → one row: doc_count, then per-name count (+ per-
    * name metric columns). */
  private def buildFilters(q: String, qa: String, qb: String,
                           m: Option[(String, String)]): Body = {
    val json =
      s"""{"query": $q, "aggs": {"g": {"filters": {"filters": {
         |  "fa": $qa, "fb": $qb}}${metricJson(m)}}}}""".stripMargin
    def armCols(name: String, pred: String): Seq[String] = {
      val cnt = s"count(CASE WHEN $pred THEN 1 END) AS $name"
      val ms = m.toSeq.flatMap { case (k, f) =>
        metricSql(k, s"CASE WHEN $pred THEN $f END")
          .map(_.replaceAll("AS m", s"AS ${name}_m"))
      }
      cnt +: ms
    }
    val pa = qSql(mapper.readTree(qa))
    val pb = qSql(mapper.readTree(qb))
    val cols = Seq("count(*) AS doc_count") ++ armCols("fa", pa) ++ armCols("fb", pb)
    val twin = s"""SELECT ${cols.mkString(",\n       ")} FROM ddocs WHERE (@W@)"""
    Body(json, twin)
  }

  /** Keyed range agg: three ranges (−∞,b1), [b1,b2), [b2,∞) + optional
    * metric; keys named in sort order. */
  private def buildRange(q: String, f: String, b1: Long, b2: Long,
                         m: Option[(String, String)]): Body = {
    val json =
      s"""{"query": $q, "aggs": {"g": {"range": {"field": "$f", "ranges": [
         |  {"key": "r1", "to": $b1},
         |  {"key": "r2", "from": $b1, "to": $b2},
         |  {"key": "r3", "from": $b2}]}${metricJson(m)}}}}""".stripMargin
    def arm(key: String, pred: String): String = {
      val ms = m.toSeq.flatMap { case (k, mf) =>
        metricSql(k, s"CASE WHEN $pred THEN $mf END") }
      (Seq(s"'$key' AS key",
        s"count(CASE WHEN $pred THEN 1 END) AS doc_count") ++ ms).mkString(", ")
    }
    val twin =
      s"""SELECT * FROM (
         |  SELECT ${arm("r1", s"$f < $b1")} FROM ddocs WHERE (@W@)
         |  UNION ALL SELECT ${arm("r2", s"$f >= $b1 AND $f < $b2")} FROM ddocs WHERE (@W@)
         |  UNION ALL SELECT ${arm("r3", s"$f >= $b2")} FROM ddocs WHERE (@W@))
         |ORDER BY key""".stripMargin
    Body(json, twin)
  }

  // ---- normalization + compare -------------------------------------------

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

  private val N = 400
  private lazy val corpus: Seq[(String, Body)] =
    Gen.listOfN(N, bodyGen)
      .pureApply(Gen.Parameters.default, Seed(16082026L))
      .map(b => (b.json, b))

  test(s"differential (widened aggs): $N bodies answer-match the SQL twin") {
    val d = docs.cache()
    d.createOrReplaceTempView("ddocs")
    var nNested = 0; var nPipe = 0; var nFilters = 0; var nRange = 0
    try {
      corpus.zipWithIndex.foreach { case ((json, b), i) =>
        val ast = mapper.readTree(json)
        val where = qSql(ast.get("query"))
        val twin = b.twin.replace("@W@", where)

        // hit-set check rides along (covers prefix/wildcard leaves)
        val full = graft.dsl.EsQueryJson.search(d,
          json.replaceFirst("\\{", s"""{"size": 500, """))
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val sqlHits = spark.sql(s"SELECT doc_id FROM ddocs WHERE $where")
          .collect().map(_.getLong(0)).toSet
        assert(full == sqlHits, s"body $i hit SET diverges:\n$json")

        val aggName = ast.get("aggs").fieldNames().asScala.next()
        val engine = graft.dsl.EsQueryJson.aggregations(d, json)(aggName)
        val aggKind = ast.get("aggs").get(aggName).fieldNames().asScala
          .toSeq.filterNot(_ == "aggs").head
        // nested frames have no contractual flat order: sort by key cols
        val engineSorted =
          if (aggName == "o") engine.orderBy(engine.columns(0), engine.columns(1))
          else aggKind match {
            case "filters" => engine                 // single row
            case "range" => engine.orderBy("key")
            case _ => engine.orderBy(engine.columns(0)) // pipeline buckets
          }
        val got = rows(engineSorted)
        val want = rows(spark.sql(twin))
        assert(got == want,
          s"body $i agg diverges:\n$json\ntwin:\n$twin\n got: $got\nwant: $want")
        aggName match {
          case "o" => nNested += 1
          case _ => aggKind match {
            case "filters" => nFilters += 1
            case "range" => nRange += 1
            case _ => nPipe += 1
          }
        }
      }
    } finally { d.unpersist(); () }
    assert(nNested >= 100, s"too few nested-chain comparisons: $nNested")
    assert(nPipe >= 60, s"too few pipeline comparisons: $nPipe")
    assert(nFilters >= 30, s"too few filters comparisons: $nFilters")
    assert(nRange >= 30, s"too few range comparisons: $nRange")
  }

  // ---- composite pagination property -------------------------------------
  // Mechanical invariant: walking composite pages with `after` cursors
  // (cursor = the last row of the previous page, nulls included when
  // missing_bucket admits them) reassembles EXACTLY the unpaged key list
  // in nulls-first ascending key order, every page within `size`. The
  // full list comes from the SQL twin, so both the page contents and the
  // cursor arithmetic are checked against an independent path.

  private case class CompSrc(name: String, json: String, keySql: String,
                             guard: Option[String])

  private def compSrcGen(idx: Int): Gen[CompSrc] = Gen.oneOf(
    for { f <- Gen.oneOf("lang", "source"); mb <- Gen.oneOf(true, false) }
      yield CompSrc(s"s$idx",
        s"""{"s$idx": {"terms": {"field": "$f", "missing_bucket": $mb}}}""",
        f, if (mb) None else Some(s"$f IS NOT NULL")),
    Gen.const(CompSrc(s"s$idx",
      s"""{"s$idx": {"histogram": {"field": "n_chars", "interval": 50}}}""",
      "CAST(floor(n_chars / 50) * 50 AS BIGINT)", Some("n_chars IS NOT NULL"))),
    Gen.const(CompSrc(s"s$idx",
      s"""{"s$idx": {"date_histogram": {"field": "ts", "calendar_interval": "month"}}}""",
      "date_trunc('month', ts)", Some("ts IS NOT NULL"))))

  private case class CompBody(q: String, srcs: Seq[CompSrc], size: Int)

  private def compBodyGen: Gen[CompBody] = for {
    q <- queryGen
    n <- Gen.chooseNum(1, 2)
    srcs <- Gen.sequence[Seq[CompSrc], CompSrc]((0 until n).map(compSrcGen))
    size <- Gen.oneOf(3, 5, 7)
  } yield CompBody(q, srcs, size)

  private def cursorJson(v: Any): String = v match {
    case null => "null"
    case s: String => s""""$s""""
    case t: java.sql.Timestamp => s""""${t.toString}""""
    case n => n.toString
  }

  test("composite: cursor-walked pages reassemble the unpaged SQL key list") {
    val d = docs.cache()
    d.createOrReplaceTempView("ddocs")
    val bodies = Gen.listOfN(120, compBodyGen)
      .pureApply(Gen.Parameters.default, Seed(160820262L))
    var nWalked = 0; var nNullCursor = 0
    try {
      bodies.zipWithIndex.foreach { case (b, i) =>
        val where = qSql(mapper.readTree(b.q))
        def body(after: Option[Seq[Any]]): String = {
          val aft = after.map { vs =>
            val kv = b.srcs.zip(vs).map { case (s, v) => s""""${s.name}": ${cursorJson(v)}""" }
            s""", "after": {${kv.mkString(", ")}}"""
          }.getOrElse("")
          s"""{"query": ${b.q}, "aggs": {"c": {"composite": {
             |  "size": ${b.size}, "sources": [${b.srcs.map(_.json).mkString(", ")}]$aft}}}}""".stripMargin
        }
        // walk the cursor until a short page
        var assembled = Vector.empty[Seq[Any]]
        var after: Option[Seq[Any]] = None
        var pages = 0
        var done = false
        while (!done) {
          val page = graft.dsl.EsQueryJson.aggregations(d, body(after))("c").collect()
          assert(page.length <= b.size, s"body $i page ${pages} over size:\n${body(after)}")
          assembled ++= page.map(r => (0 until r.length).map(j => norm(r.get(j))))
          pages += 1
          assert(pages <= 200, s"body $i cursor walk did not terminate")
          if (page.length < b.size) done = true
          else {
            val last = page.last
            val key = b.srcs.indices.map(j => last.get(j))
            if (key.exists(_ == null)) nNullCursor += 1
            after = Some(key)
          }
        }
        val keys = b.srcs.map(s => s"${s.keySql} AS ${s.name}").mkString(", ")
        val guards = b.srcs.flatMap(_.guard)
        val whereAll = (s"($where)" +: guards).mkString(" AND ")
        val ord = b.srcs.map(s => s"${s.name} ASC NULLS FIRST").mkString(", ")
        val want = rows(spark.sql(
          s"""SELECT $keys, count(*) AS doc_count FROM ddocs
             |WHERE $whereAll GROUP BY ${b.srcs.indices.map(_ + 1).mkString(", ")}
             |ORDER BY $ord""".stripMargin))
        assert(assembled == want,
          s"body $i composite walk diverges (${assembled.size} vs ${want.size} rows):\n${body(None)}")
        nWalked += 1
      }
    } finally { d.unpersist(); () }
    assert(nWalked >= 120)
    // missing_bucket pages must have genuinely exercised a null cursor
    assert(nNullCursor >= 3, s"too few null-cursor resumes: $nNullCursor")
  }

  test("composite: the after-cursor predicate is pushed below the aggregation") {
    // the cursor filter references only grouping keys, so Catalyst must
    // push it through the Aggregate — at scale the cursor prunes rows
    // BEFORE the shuffle, not buckets after it. Top-down treeString: a
    // pushed filter appears on a LATER line than the Aggregate; an
    // unpushed one would sit above it.
    val body =
      """{"aggs": {"c": {"composite": {"size": 5, "sources": [
        |  {"s0": {"terms": {"field": "source"}}}], "after": {"s0": "web"}}}}}""".stripMargin
    val plan = graft.dsl.EsQueryJson.aggregations(docs, body)("c")
      .queryExecution.optimizedPlan.treeString
    val lines = plan.linesIterator.toSeq
    val aggIdx = lines.indexWhere(_.contains("Aggregate"))
    val filterIdxs = lines.zipWithIndex.filter(_._1.contains("Filter")).map(_._2)
    assert(aggIdx >= 0 && filterIdxs.nonEmpty, s"unexpected plan shape:\n$plan")
    assert(filterIdxs.forall(_ > aggIdx),
      s"after-cursor filter not pushed below the Aggregate:\n$plan")
  }

  // ---- search_after cursor-walk property ----------------------------------
  // Walking sorted pages with search_after cursors must reassemble EXACTLY
  // the full sorted hit list (SQL twin) — including docs whose sort key is
  // null (they sort `missing: _last` by default, so they arrive on the
  // LAST pages, after non-null cursors) and resumes FROM a null cursor
  // value once the walk is inside the null tail. The doc_id tiebreak makes
  // every cursor unique, so the walk is deterministic.

  private case class SaBody(q: String, sf: String, dir: String, first: Boolean, size: Int)

  private def saGen: Gen[SaBody] = for {
    q <- queryGen
    sf <- Gen.oneOf("n_chars", "score", "doc_id")
    dir <- Gen.oneOf("asc", "desc")
    first <- if (sf == "n_chars") Gen.oneOf(true, false) else Gen.const(false)
    size <- Gen.oneOf(5, 9)
  } yield SaBody(q, sf, dir, first, size)

  test("search_after: cursor-walked pages reassemble the full sorted list") {
    val d = docs.cache()
    d.createOrReplaceTempView("ddocs")
    val bodies = Gen.listOfN(100, saGen)
      .pureApply(Gen.Parameters.default, Seed(160820266L))
    var nNullCursor = 0
    try {
      bodies.zipWithIndex.foreach { case (b, i) =>
        val where = qSql(mapper.readTree(b.q))
        val missing = if (b.first) s""", "missing": "_first"""" else ""
        def body(after: Option[(Any, Long)]): String = {
          val aft = after.map { case (v, id) =>
            s""", "search_after": [${cursorJson(v)}, $id]"""
          }.getOrElse("")
          s"""{"query": ${b.q}, "size": ${b.size},
             | "sort": [{"${b.sf}": {"order": "${b.dir}"$missing}}, "doc_id"]$aft}""".stripMargin
        }
        var assembled = Vector.empty[Long]
        var after: Option[(Any, Long)] = None
        var done = false; var pages = 0
        while (!done) {
          val page = graft.dsl.EsQueryJson.search(d, body(after))
            .select(b.sf, "doc_id").collect()
          assembled ++= page.map(_.getLong(1))
          pages += 1
          assert(pages <= 100, s"body $i search_after walk did not terminate")
          if (page.length < b.size) done = true
          else {
            val last = page.last
            if (last.isNullAt(0)) nNullCursor += 1
            after = Some((last.get(0), last.getLong(1)))
          }
        }
        val nulls = if (b.first) "NULLS FIRST" else "NULLS LAST"
        val want = spark.sql(
          s"""SELECT doc_id FROM ddocs WHERE $where
             |ORDER BY ${b.sf} ${b.dir.toUpperCase} $nulls, doc_id""".stripMargin)
          .collect().map(_.getLong(0)).toVector
        assert(assembled == want,
          s"body $i search_after walk diverges (${assembled.size} vs ${want.size}):\n${body(None)}")
      }
    } finally { d.unpersist(); () }
    // the walk must have genuinely resumed from null cursors
    assert(nNullCursor >= 3, s"too few null-cursor resumes: $nNullCursor")
  }

  // ---- top_hits differential ----------------------------------------------
  // top_hits inside a terms bucket: ES truncates the BUCKETS by the terms
  // size (count desc, key asc) first, drops null-key docs, and sorts hits
  // within each bucket with `missing: _last` for BOTH directions; rank is
  // 1-based per bucket. Twin: count-ranked key list joined to a
  // row_number window.

  private case class ThBody(q: String, f: String, tSize: Int, n: Int,
                            sf: String, dir: String)

  private def thGen: Gen[ThBody] = for {
    q <- queryGen
    f <- Gen.oneOf("lang", "source")
    tSize <- Gen.oneOf(2, 3, 10)
    n <- Gen.chooseNum(1, 3)
    sf <- Gen.oneOf("score", "n_chars", "doc_id")
    dir <- Gen.oneOf("asc", "desc")
  } yield ThBody(q, f, tSize, n, sf, dir)

  test("top_hits: 150 bodies answer-match the window-function SQL twin") {
    val d = docs.cache()
    d.createOrReplaceTempView("ddocs")
    val bodies = Gen.listOfN(150, thGen)
      .pureApply(Gen.Parameters.default, Seed(160820263L))
    try {
      bodies.zipWithIndex.foreach { case (b, i) =>
        val json =
          s"""{"query": ${b.q}, "aggs": {"g": {"terms": {"field": "${b.f}", "size": ${b.tSize}},
             |  "aggs": {"th": {"top_hits": {"size": ${b.n},
             |    "sort": [{"${b.sf}": {"order": "${b.dir}"}}, "doc_id"],
             |    "_source": ["doc_id"]}}}}}}""".stripMargin
        val where = qSql(mapper.readTree(json).get("query"))
        val got = rows(graft.dsl.EsQueryJson.aggregations(d, json)("g")
          .orderBy("key", "rank"))
        val twin =
          s"""WITH tot AS (SELECT ${b.f} AS key, count(*) AS c FROM ddocs
             |  WHERE ($where) AND ${b.f} IS NOT NULL GROUP BY 1
             |  ORDER BY c DESC, key ASC LIMIT ${b.tSize}),
             |r AS (SELECT ${b.f} AS key,
             |    row_number() OVER (PARTITION BY ${b.f}
             |      ORDER BY ${b.sf} ${b.dir.toUpperCase} NULLS LAST, doc_id ASC) AS rank,
             |    doc_id
             |  FROM ddocs WHERE ($where) AND ${b.f} IS NOT NULL)
             |SELECT r.key, r.rank, r.doc_id FROM r JOIN tot ON r.key = tot.key
             |WHERE r.rank <= ${b.n} ORDER BY key, rank""".stripMargin
        val want = rows(spark.sql(twin))
        assert(got == want,
          s"body $i top_hits diverges:\n$json\ntwin:\n$twin\n got: $got\nwant: $want")
      }
    } finally { d.unpersist(); () }
  }

  // ---- query_string differential ------------------------------------------
  // The Lucene-syntax front-end: the generator builds the AST first and
  // prints BOTH the query string and its SQL meaning (fully parenthesized,
  // so operator text — not precedence conventions — is under test), then
  // the parser+compiler must reproduce the same hit set. Covers fielded
  // term equality, inclusive/exclusive/star numeric ranges, comparison
  // atoms, _exists_, keyword wildcards, and AND/OR/NOT nesting with ES
  // null rules (a positive atom never matches a missing field; NOT keeps
  // null-field docs).

  private sealed trait QsNode { def lucene: String; def sql: String }
  private case class QsTerm(f: String, v: String) extends QsNode {
    def lucene = s"$f:$v"
    def sql = s"coalesce($f = '$v', FALSE)"
  }
  private case class QsNum(f: String, v: Long) extends QsNode {
    def lucene = s"$f:$v"
    def sql = s"coalesce($f = $v, FALSE)"
  }
  private case class QsRange(f: String, lo: Option[Long], hi: Option[Long],
                             loInc: Boolean, hiInc: Boolean) extends QsNode {
    def lucene = {
      val lb = if (loInc) "[" else "{"
      val rb = if (hiInc) "]" else "}"
      s"$f:$lb${lo.map(_.toString).getOrElse("*")} TO ${hi.map(_.toString).getOrElse("*")}$rb"
    }
    def sql = {
      val parts = lo.map(v => s"$f ${if (loInc) ">=" else ">"} $v").toSeq ++
        hi.map(v => s"$f ${if (hiInc) "<=" else "<"} $v").toSeq
      if (parts.isEmpty) s"$f IS NOT NULL"
      else s"coalesce(${parts.mkString(" AND ")}, FALSE)"
    }
  }
  private case class QsCmp(f: String, op: String, v: Long) extends QsNode {
    def lucene = s"$f:$op$v"
    def sql = s"coalesce($f $op $v, FALSE)"
  }
  private case class QsExists(f: String) extends QsNode {
    def lucene = s"_exists_:$f"
    def sql = s"$f IS NOT NULL"
  }
  private case class QsWild(f: String, pat: String) extends QsNode {
    def lucene = s"$f:$pat"
    def sql = s"coalesce($f LIKE '${pat.flatMap { case '*' => "%"; case '?' => "_"; case c => s"$c" }}', FALSE)"
  }
  private case class QsAnd(l: QsNode, r: QsNode) extends QsNode {
    def lucene = s"(${l.lucene} AND ${r.lucene})"
    def sql = s"((${l.sql}) AND (${r.sql}))"
  }
  private case class QsOr(l: QsNode, r: QsNode) extends QsNode {
    def lucene = s"(${l.lucene} OR ${r.lucene})"
    def sql = s"((${l.sql}) OR (${r.sql}))"
  }
  private case class QsNot(n: QsNode) extends QsNode {
    def lucene = s"(NOT ${n.lucene})"
    def sql = s"(NOT (${n.sql}))"
  }

  private def qsAtomGen: Gen[QsNode] = Gen.frequency(
    3 -> strFieldVal.map { case (f, v) => QsTerm(f, v) },
    2 -> (for { f <- Gen.oneOf("n_chars", "doc_id"); v <- Gen.chooseNum(0L, 300L) }
      yield QsNum(f, v)),
    3 -> (for {
      f <- Gen.oneOf("n_chars", "doc_id")
      lo <- Gen.option(Gen.chooseNum(0L, 200L))
      w <- Gen.chooseNum(20L, 200L)
      hi <- Gen.option(Gen.const(lo.getOrElse(0L) + w))
      loInc <- Gen.oneOf(true, false)
      hiInc <- Gen.oneOf(true, false)
    } yield QsRange(f, lo, hi, loInc, hiInc)),
    2 -> (for { f <- Gen.oneOf("n_chars", "doc_id"); op <- Gen.oneOf(">=", ">", "<=", "<")
                v <- Gen.chooseNum(0L, 300L) } yield QsCmp(f, op, v)),
    1 -> Gen.oneOf("lang", "n_chars", "source").map(QsExists),
    2 -> (for { (f, v) <- strFieldVal
                pat <- Gen.oneOf(s"${v.take(1)}*", s"*${v.takeRight(1)}", s"?${v.drop(1)}") }
      yield QsWild(f, pat)))

  private def qsNodeGen(depth: Int): Gen[QsNode] =
    if (depth <= 0) qsAtomGen
    else Gen.frequency(
      4 -> qsAtomGen,
      2 -> (for { l <- qsNodeGen(depth - 1); r <- qsNodeGen(depth - 1) } yield QsAnd(l, r)),
      2 -> (for { l <- qsNodeGen(depth - 1); r <- qsNodeGen(depth - 1) } yield QsOr(l, r)),
      1 -> qsNodeGen(depth - 1).map(QsNot))

  test("query_string: 300 generated Lucene strings answer-match the AST's SQL meaning") {
    val d = docs.cache()
    d.createOrReplaceTempView("ddocs")
    val nodes = Gen.listOfN(300, qsNodeGen(2))
      .pureApply(Gen.Parameters.default, Seed(160820264L))
    try {
      nodes.zipWithIndex.foreach { case (n, i) =>
        val json =
          s"""{"size": 500, "query": {"query_string": {"query":
             | ${new ObjectMapper().writeValueAsString(n.lucene)}}}}""".stripMargin
        val got = graft.dsl.EsQueryJson.search(d, json)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val want = spark.sql(s"SELECT doc_id FROM ddocs WHERE ${n.sql}")
          .collect().map(_.getLong(0)).toSet
        assert(got == want,
          s"qs $i diverges: ${n.lucene}\nsql: ${n.sql}\n got: ${got.toSeq.sorted}\nwant: ${want.toSeq.sorted}")
      }
    } finally { d.unpersist(); () }
  }

  // ---- match-family differential --------------------------------------------
  // Hit sets for match / match_phrase / match_phrase_prefix over the
  // synthetic text column. The fixture's text is lowercase single-space
  // word soup, so the standard analyzer's token stream equals the
  // whitespace split and the SQL twin stays mechanical:
  //   match OR            any query token present (array_contains)
  //   match AND           every query token present
  //   minimum_should_match at least N tokens present
  //   match_phrase        consecutive tokens (padded LIKE '% w1 w2 %')
  //   match_phrase_prefix phrase with the LAST token a prefix
  // Null-text docs match nothing.

  private val mfVocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu")

  private sealed trait MfBody { def json: String; def sql: String }
  private case class MfMatch(ws: Seq[String], op: String, msm: Option[Int]) extends MfBody {
    def json = {
      val msmPart = msm.map(m => s""", "minimum_should_match": $m""").getOrElse("")
      s"""{"match": {"text": {"query": "${ws.mkString(" ")}", "operator": "$op"$msmPart}}}"""
    }
    def sql = {
      val contains = ws.map(w => s"array_contains(split(text, ' '), '$w')")
      val pred =
        if (op == "and") contains.mkString("(", ") AND (", ")")
        else msm match {
          case Some(m) => contains.map(c => s"(CASE WHEN $c THEN 1 ELSE 0 END)")
            .mkString("(", " + ", s") >= $m")
          case None => contains.mkString("(", ") OR (", ")")
        }
      s"coalesce($pred, FALSE)"
    }
  }
  private case class MfPhrase(ws: Seq[String], prefix: Boolean) extends MfBody {
    def json =
      if (prefix) s"""{"match_phrase_prefix": {"text": "${ws.mkString(" ")}"}}"""
      else s"""{"match_phrase": {"text": "${ws.mkString(" ")}"}}"""
    def sql = {
      val tail = if (prefix) "%" else " %"
      s"coalesce(concat(' ', text, ' ') LIKE '% ${ws.mkString(" ")}$tail', FALSE)"
    }
  }

  private def mfGen: Gen[MfBody] = Gen.frequency(
    4 -> (for {
      k <- Gen.chooseNum(1, 3)
      ws <- Gen.listOfN(k, Gen.oneOf(mfVocab))
      op <- Gen.oneOf("or", "and")
      msm <- if (op == "or") Gen.option(Gen.chooseNum(1, k)) else Gen.const(None)
    } yield MfMatch(ws, op, msm)),
    2 -> (for {
      k <- Gen.chooseNum(2, 3)
      ws <- Gen.listOfN(k, Gen.oneOf(mfVocab))
      // prefix arm truncates the last word so the prefix read is live
      pfx <- Gen.oneOf(true, false)
    } yield MfPhrase(if (pfx) ws.init :+ ws.last.take(2) else ws, pfx)))

  test("match family: 250 generated bodies answer-match the token-twin SQL") {
    val d = docs.cache()
    d.createOrReplaceTempView("ddocs")
    val bodies = Gen.listOfN(250, mfGen)
      .pureApply(Gen.Parameters.default, Seed(160820265L))
    try {
      bodies.zipWithIndex.foreach { case (b, i) =>
        val json = s"""{"size": 500, "query": ${b.json}}"""
        val got = graft.dsl.EsQueryJson.search(d, json)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val want = spark.sql(s"SELECT doc_id FROM ddocs WHERE ${b.sql}")
          .collect().map(_.getLong(0)).toSet
        assert(got == want,
          s"mf $i diverges: ${b.json}\nsql: ${b.sql}\n got: ${got.toSeq.sorted}\nwant: ${want.toSeq.sorted}")
      }
    } finally { d.unpersist(); () }
  }
}
