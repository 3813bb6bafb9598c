package graft.dsl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The Elasticsearch query-DSL JSON surface — what a user of the reference
  * system actually writes (the reference keeps an ES 6.5 index queryable,
  * `/root/reference/pom.xml:25-26`, `README_zh.md:3`). Translates an ES
  * search body into the engine's DataFrame operators:
  *
  *  - `query`: term/terms/range/exists/prefix/wildcard/regexp/ids/match/
  *    match_all/bool (must/should/must_not/filter + minimum_should_match)
  *  - `sort` + `from`/`size`
  *  - single-level `aggs`: terms/histogram/date_histogram/filters buckets
  *    with avg/sum/min/max/value_count/cardinality metric sub-aggs
  *
  * Field names resolve to columns; `info.<qualifier>` reaches into the
  * dynamic map docs of the materialized index (ES-dynamic-mapping analog).
  * Everything compiles to the same codegen'd Catalyst plans as the typed
  * DSL — this is a front-end, not an interpreter.
  */
object EsQueryJson {

  private val mapper = new ObjectMapper()

  def parse(json: String): JsonNode = mapper.readTree(json)

  /** ES field name → Column (map-doc aware). */
  def field(name: String): Column =
    if (name.startsWith("info.")) element_at(col("info"), name.stripPrefix("info."))
    else col(name)

  private def litOf(n: JsonNode): Column = {
    if (n.isNumber) lit(n.asDouble() match {
      case d if d.isWhole && n.canConvertToLong => n.asLong()
      case _ => n.asDouble()
    })
    else if (n.isBoolean) lit(n.asBoolean())
    else lit(n.asText())
  }

  private def single(n: JsonNode): (String, JsonNode) = {
    val names = n.fieldNames().asScala.toSeq
    require(names.size == 1, s"expected a single-key object, got $names")
    (names.head, n.get(names.head))
  }

  /** Translate an ES `query` object to a predicate Column. */
  def predicate(q: JsonNode): Column = {
    val (kind, body) = single(q)
    kind match {
      case "match_all" => lit(true)
      case "term" =>
        val (f, v) = single(body)
        EsDsl.term(field(f), if (v.isObject) litOf(v.get("value")) else litOf(v))
      case "terms" =>
        val (f, vs) = single(body)
        field(f).isin(vs.elements().asScala.map(n =>
          if (n.isNumber) n.asLong().asInstanceOf[Any] else n.asText().asInstanceOf[Any]).toSeq: _*)
      case "range" =>
        val (f, b) = single(body)
        Seq(
          Option(b.get("gte")).map(field(f) >= litOf(_)),
          Option(b.get("gt")).map(field(f) > litOf(_)),
          Option(b.get("lte")).map(field(f) <= litOf(_)),
          Option(b.get("lt")).map(field(f) < litOf(_)))
          .flatten.reduceOption(_ && _).getOrElse(lit(true))
      case "exists" =>
        val f = body.get("field").asText()
        if (f.startsWith("info.")) EsDsl.existsKey(col("info"), f.stripPrefix("info."))
        else EsDsl.exists(col(f))
      case "prefix" =>
        val (f, v) = single(body)
        EsDsl.prefix(field(f), (if (v.isObject) v.get("value") else v).asText())
      case "wildcard" =>
        val (f, v) = single(body)
        EsDsl.wildcard(field(f), (if (v.isObject) v.get("value") else v).asText())
      case "regexp" =>
        val (f, v) = single(body)
        EsDsl.regexp(field(f), (if (v.isObject) v.get("value") else v).asText())
      case "ids" =>
        EsDsl.ids(col("id"), body.get("values").elements().asScala.map(_.asText(): Any).toSeq)
      case "match" =>
        val (f, v) = single(body)
        val (text, msm) =
          if (v.isObject)
            (v.get("query").asText(),
              Option(v.get("minimum_should_match")).map(_.asInt()).getOrElse(1))
          else (v.asText(), 1)
        EsDsl.matchQuery(field(f), text.split("\\s+").toSeq, msm)
      case "bool" =>
        def clauses(name: String): Seq[Column] = Option(body.get(name)).toSeq.flatMap { n =>
          if (n.isArray) n.elements().asScala.map(predicate).toSeq else Seq(predicate(n))
        }
        val msm = Option(body.get("minimum_should_match")).map(_.asInt()).getOrElse(1)
        EsDsl.bool(
          must = clauses("must") ++ clauses("filter"),
          should = clauses("should"),
          mustNot = clauses("must_not"),
          minimumShouldMatch = msm)
      case other => throw new IllegalArgumentException(s"unsupported query kind: $other")
    }
  }

  /** Apply `query` + `sort` + `from`/`size` of a search body. */
  def search(df: DataFrame, bodyJson: String): DataFrame = {
    val body = parse(bodyJson)
    val filtered = Option(body.get("query")).map(q => df.filter(predicate(q))).getOrElse(df)
    val sorted = Option(body.get("sort")) match {
      case Some(s) =>
        val cols = s.elements().asScala.toSeq.map { e =>
          if (e.isTextual) field(e.asText()).asc
          else {
            val (f, spec) = single(e)
            val order = Option(spec.get("order")).map(_.asText()).getOrElse("asc")
            if (order == "desc") field(f).desc else field(f).asc
          }
        }
        filtered.orderBy(cols: _*)
      case None => filtered
    }
    val from = Option(body.get("from")).map(_.asInt()).getOrElse(0)
    val size = Option(body.get("size")).map(_.asInt())
    val offs = if (from > 0) sorted.offset(from) else sorted
    size.map(offs.limit).getOrElse(offs)
  }

  /** Single-level ES `aggs`: one bucket agg (or none) + metric sub-aggs.
    * Like ES, a `query` in the same body scopes the aggregations. */
  def aggregations(df: DataFrame, bodyJson: String): Map[String, DataFrame] = {
    val body = parse(bodyJson)
    val aggs = Option(body.get("aggs"))
      .orElse(Option(body.get("aggregations")))
      .getOrElse(throw new IllegalArgumentException("no aggs in body"))
    val scoped = Option(body.get("query")).map(q => df.filter(predicate(q))).getOrElse(df)
    aggs.fields().asScala.map { e =>
      e.getKey -> oneAgg(scoped, e.getValue)
    }.toMap
  }

  private def metric(name: String, spec: JsonNode): Column = {
    val f = field(spec.get("field").asText())
    name match {
      case "avg" => round(avg(f), 6)
      case "sum" => round(sum(f), 4)
      case "min" => round(min(f), 4)
      case "max" => round(max(f), 4)
      case "value_count" => count(f)
      case "cardinality" => EsDsl.cardinality(f)
      case other => throw new IllegalArgumentException(s"unsupported metric: $other")
    }
  }

  private def subMetrics(node: JsonNode): Seq[Column] =
    Option(node.get("aggs")).toSeq.flatMap(_.fields().asScala.toSeq.map { e =>
      val (kind, spec) = single(e.getValue)
      metric(kind, spec).as(e.getKey)
    })

  private def oneAgg(df: DataFrame, node: JsonNode): DataFrame = {
    val kind = node.fieldNames().asScala.toSeq.filterNot(_ == "aggs").head
    val spec = node.get(kind)
    val ms = subMetrics(node)
    kind match {
      case "terms" =>
        val key = field(spec.get("field").asText()).as("key")
        val size = Option(spec.get("size")).map(_.asInt()).getOrElse(10)
        df.groupBy(key).agg(count(lit(1)).as("doc_count"), ms: _*)
          .orderBy(desc("doc_count"), col("key")).limit(size)
      case "histogram" =>
        val interval = spec.get("interval").asDouble()
        val key = EsDsl.histogramBucket(field(spec.get("field").asText()), interval).as("key")
        df.groupBy(key).agg(count(lit(1)).as("doc_count"), ms: _*).orderBy("key")
      case "date_histogram" =>
        val interval = Option(spec.get("calendar_interval"))
          .getOrElse(spec.get("interval")).asText()
        val key = EsDsl.dateHistogramBucket(field(spec.get("field").asText()), interval).as("key")
        df.groupBy(key).agg(count(lit(1)).as("doc_count"), ms: _*).orderBy("key")
      case "filters" =>
        val preds = spec.get("filters").fields().asScala.toSeq.map { e =>
          e.getKey -> predicate(e.getValue)
        }
        EsDsl.filtersAgg(df, Nil, preds: _*)
      case metricKind => // bare metric agg, no bucketing
        df.agg(metric(metricKind, spec).as("value"))
    }
  }
}
