package graft.dsl

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.streaming.BucketedIndex
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.jdk.CollectionConverters._

/** The `_search?scroll=1m` / `_search/scroll` API shape over the bucketed
  * incremental index — the user-facing wrapper for what the [[BucketedIndex
  * .readAt]] primitive already guarantees (a reference-parity deployment
  * scrolls the ES index the coprocessor maintains; here the scroll walks
  * the engine's own index).
  *
  * ES pins a scroll context to the segments live at open time and expires
  * it `keepAlive` after the last touch. Here [[open]] resolves the
  * manifest ONCE; every page reads that exact snapshot however much
  * ingest, compaction, or (grace-windowed) vacuum lands mid-walk — pair
  * the keepAlive with [[BucketedIndex.vacuum]]'s `keepLast` so pinned
  * dirs outlive the walk, the same sizing rule ES operators apply to
  * scroll keepAlive vs merge policy.
  *
  * Paging is cursor-based (`search_after` under the hood), never
  * offset-based: each page is one size-bounded query against the pinned
  * frame, so a million-page export does a million bounded scans — the
  * stateless-cursor pattern ES itself moved to (search_after/PIT) —
  * rather than `from`-style deep paging that re-sorts the whole index per
  * page. Sliced scroll composes freely: put `"slice": {"id": i, "max":
  * m}` in the body and open one scroll per slice; the md5-60 slice hash
  * partitions the export exactly ([[EsQueryJson]] slice support).
  *
  * Subset contract (loud rejects elsewhere): sorts must be plain fields
  * (optionally ordered); the doc key `id` is appended as the tiebreak
  * when absent — the deterministic analog of ES's `_doc`. The scroll id
  * stays valid across pages (ES 6.5 behavior) and each touch refreshes
  * the keepAlive window; touching an expired or cleared id fails with
  * ES's own "No search context found" message.
  */
object EsScroll {

  private val mapper = new ObjectMapper()

  private final class Context(
      val indexDir: String,
      val manifest: Map[Int, Long],
      val body: ObjectNode,
      val sortFields: Seq[String],
      val size: Int,
      val keepAliveMs: Long) {
    @volatile var expiresAt: Long = 0L
    @volatile var after: Option[Seq[Any]] = None
    @volatile var exhausted: Boolean = false
    /** The pinned snapshot, PERSISTED for the context's lifetime — the
      * Spark expression of ES holding the scroll's segment readers open:
      * every page is a bounded cursor query against the same data, and
      * re-scanning + re-decoding the pinned parquet once per page made
      * the walk O(pages × |snapshot|) in scan work. Spilled to disk when
      * it outgrows memory (the same bound ES's held readers have);
      * released on clear/expiry. */
    @volatile var frame: DataFrame = null
    def release(): Unit = {
      val f = frame
      if (f != null) { frame = null; try f.unpersist(false) catch { case _: Throwable => () } }
    }
  }

  private val contexts = scala.collection.concurrent.TrieMap[String, Context]()
  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** Injectable clock (tests drive expiry deterministically). */
  @volatile private[graft] var clock: () => Long = () => System.currentTimeMillis()

  /** `"1m"`/`"30s"`/`"2h"`/`"500ms"` → millis (the ES time-value grammar
    * scroll keepAlives actually use). */
  private[dsl] def parseKeepAlive(s: String): Long = {
    val m = "^(\\d+)(ms|s|m|h|d)$".r.findFirstMatchIn(s.trim).getOrElse(
      throw new IllegalArgumentException(s"bad scroll keepAlive: $s"))
    val n = m.group(1).toLong
    m.group(2) match {
      case "ms" => n
      case "s" => n * 1000L
      case "m" => n * 60000L
      case "h" => n * 3600000L
      case "d" => n * 86400000L
    }
  }

  /** Open a scroll over the index at `indexDir`: pins the current
    * manifest, returns the scroll id and the first page. */
  def open(spark: SparkSession, indexDir: String, bodyJson: String,
           scroll: String = "1m"): (String, DataFrame) = {
    val body = mapper.readTree(bodyJson) match {
      case o: ObjectNode => o
      case other => throw new IllegalArgumentException(s"scroll body must be an object: $other")
    }
    require(!body.has("from"), "scroll does not support from (ES rejects it too)")
    require(!body.has("search_after"),
      "search_after is the scroll cursor itself; do not pass it in the body")
    // normalize the sort to plain ordered fields + the id tiebreak
    val declared: Seq[(String, String)] =
      Option(body.get("sort")).toSeq.flatMap(_.elements().asScala.toSeq).map { e =>
        if (e.isTextual) (e.asText(), "asc")
        else {
          val f = e.fieldNames().asScala.next()
          require(!Set("_score", "_script", "_geo_distance").contains(f),
            s"scroll subset sorts by plain fields, got: $f")
          (f, Option(e.get(f).get("order")).map(_.asText()).getOrElse("asc"))
        }
      }
    val withTie = if (declared.exists(_._1 == "id")) declared
                  else declared :+ ("id" -> "asc")
    val sortArr = body.putArray("sort")
    withTie.foreach { case (f, o) =>
      sortArr.addObject().putObject(f).put("order", o)
    }
    val size = Option(body.get("size")).map(_.asInt()).getOrElse(10)
    body.remove("size")
    val ctx = new Context(indexDir, BucketedIndex.readManifest(indexDir),
      body, withTie.map(_._1), size, parseKeepAlive(scroll))
    ctx.expiresAt = clock() + ctx.keepAliveMs
    val id = s"scroll_${counter.incrementAndGet()}"
    contexts.put(id, ctx)
    (id, page(spark, ctx))
  }

  /** Fetch the next page (the `_search/scroll` call). Refreshes the
    * keepAlive; `scroll` overrides it like ES's per-call scroll param. */
  def next(spark: SparkSession, scrollId: String,
           scroll: Option[String] = None): DataFrame = {
    val ctx = contexts.get(scrollId).filter(c => clock() <= c.expiresAt)
      .getOrElse {
        contexts.remove(scrollId).foreach(_.release())
        throw new IllegalArgumentException(
          s"No search context found for id [$scrollId]")
      }
    ctx.expiresAt = clock() + scroll.map(parseKeepAlive).getOrElse(ctx.keepAliveMs)
    page(spark, ctx)
  }

  /** `DELETE _search/scroll` — free the context (and its cached snapshot). */
  def clear(scrollId: String): Unit = contexts.remove(scrollId).foreach(_.release())

  private def page(spark: SparkSession, ctx: Context): DataFrame = {
    var frame = ctx.frame
    if (frame == null) {
      frame = BucketedIndex.readAt(spark, ctx.indexDir, ctx.manifest).persist()
      ctx.frame = frame
    }
    if (ctx.exhausted) return frame.limit(0)
    val body = ctx.body.deepCopy()
    body.put("size", ctx.size)
    ctx.after.foreach { vals =>
      val arr = body.putArray("search_after")
      vals.foreach {
        case null => arr.addNull()
        case s: String => arr.add(s)
        case l: Long => arr.add(l)
        case i: Int => arr.add(i)
        case d: Double => arr.add(d)
        case other => throw new IllegalArgumentException(
          s"unsupported scroll cursor value type: ${other.getClass.getSimpleName}")
      }
    }
    val res = EsQueryJson.search(frame, mapper.writeValueAsString(body))
    // an API server serializes the page anyway: collect the (size-bounded)
    // page once, advance the cursor from its last row, and hand back a
    // local frame — the pinned parquet is not re-scanned when the caller
    // consumes the page
    val rows: Array[Row] = res.collect()
    if (rows.length < ctx.size) ctx.exhausted = true
    if (rows.nonEmpty) {
      val last = rows.last
      ctx.after = Some(ctx.sortFields.map { f =>
        if (f.startsWith("info.")) // map-doc qualifier (the index frame shape)
          Option(last.getAs[scala.collection.Map[String, String]]("info"))
            .flatMap(_.get(f.stripPrefix("info."))).orNull
        else {
          val i = res.schema.fieldNames.indexOf(f)
          require(i >= 0, s"scroll sort field '$f' missing from the page schema " +
            "(scroll subset sorts by result columns or info.* qualifiers)")
          last.get(i)
        }
      })
    }
    spark.createDataFrame(new java.util.ArrayList[Row](rows.toSeq.asJava), res.schema)
  }
}
