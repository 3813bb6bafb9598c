package graft.dsl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The ES `_bulk` API — the reference's CORE operation: its observer
  * batches HBase mutations into bulk index/delete requests
  * (`observer6/ElasticSearchBulkOperator.java` — the bulk buffer + timed
  * flush; `observer6/HbaseDataSyncEsObserver.java:93-129` builds the
  * update/delete items). This front-end parses the bulk NDJSON wire
  * shape and applies it onto a standing index frame with ES's per-item
  * semantics:
  *
  *  - `index`  — upsert whole doc: `created` if absent, else `updated`;
  *  - `create` — insert-only: `conflict` (ES 409) if the doc EXISTS at
  *    that point in the batch, doc untouched;
  *  - `update` — partial-doc merge (`{"doc": {...}}`): new keys add,
  *    shared keys overwrite; a merge that changes nothing is `noop`
  *    (ES detect_noop, default true — `"detect_noop": false` forces
  *    the write); `missing` (ES 404) if absent;
  *  - `delete` — `deleted` / `not_found`.
  *
  * Items apply in LINE ORDER per id — ES's intra-batch contract (later
  * items see earlier items' effects, `create` after `delete` succeeds).
  *
  * Scale shape: parse is narrow (from_json + a seq+1 self-join that
  * AQE broadcasts for bounded batches); apply is ONE cogroup on id —
  * the same one-shuffle-per-batch budget as the A13 merge fold, with
  * per-id state bounded by doc width. */
object EsBulk {

  case class BulkOp(seq: Long, op: String, id: Long, doc: Map[String, String],
                    upsert: Boolean = false, script: String = null,
                    upsertDoc: Map[String, String] = null,
                    scriptedUpsert: Boolean = false, detectNoop: Boolean = true)
  case class BulkOut(seq: Long, id: Long, op: String, result: String,
                     key: String, value: String, isState: Boolean)

  /** Parse `_bulk` NDJSON lines (`seq` = line number, `value` = raw
    * line). Action lines carry one of the four action keys; `index`/
    * `create`/`update` consume the FOLLOWING line as their doc
    * (`update` unwraps ES's `{"doc": {...}}` envelope).
    *
    * STRICT WIRE VALIDATION (the EsBulkFuzzSpec contract — no silent
    * misparse): every line must be either a well-formed action line or
    * the source doc of the immediately preceding doc-taking action.
    * Violations raise at first materialization with a stable error
    * class (ES 6.5 400s the whole request the same way):
    *  - `malformed action line` — an action-keyed line with several
    *    action keys, a non-integer/missing `_id`, or a non-object body;
    *  - `malformed action/metadata line` — a line where an action was
    *    expected that carries no action key (ES's exact failure, e.g.
    *    a stray doc after a `delete`);
    *  - `ambiguous bulk line` — a line positioned as a source doc that
    *    itself carries a bulk action key. ES silently treats it as the
    *    doc; unvalidated, this front-end would read it TWICE (as doc
    *    and as action) — rejecting loudly is the strict default.
    *    `ambiguousDocsAsSource = true` selects the ES-compatible mode
    *    instead: the line is consumed as the source doc (round-15 —
    *    the former documented deviation, now an option). Doc positions
    *    are then decided by the sequential ES walk (action/doc
    *    alternation), computed as a run-parity over ONE bounded window
    *    (the request's line list — coordinator-sized wire input, never
    *    corpus rows);
    *  - `truncated bulk body` — a doc-taking action with no following
    *    line;
    *  - `malformed source doc line` — a doc line that is not a JSON
    *    object.
    * In strict mode the checks are a fixed set of seq-joins + one tiny
    * agg folded into a 1-row broadcast guard — no window, no driver
    * collect. */
  def parse(lines: DataFrame,
            ambiguousDocsAsSource: Boolean = false): Dataset[BulkOp] = {
    val spark = lines.sparkSession
    import spark.implicits._
    val actionKeyList = typedLit(Seq("index", "create", "update", "delete"))
    // ONE parse pass computes every view of a line together (flat map =
    // content classification + index/create source doc; action struct;
    // update envelope) — the first cut of the validation built six
    // per-violation frames each re-scanning and re-parsing the lines,
    // which doubled the per-request cost of every bulk row in the gate
    val p = lines.select(col("seq"),
        from_json(col("value"), org.apache.spark.sql.types.DataType.fromDDL(
          "map<string, string>")).as("flat"),
        from_json(col("value"), org.apache.spark.sql.types.DataType.fromDDL(
          "struct<index: struct<_id: bigint>, create: struct<_id: bigint>, " +
            "update: struct<_id: bigint>, delete: struct<_id: bigint>>"))
          .as("a"),
        from_json(col("value"), org.apache.spark.sql.types.DataType.fromDDL(
          "struct<doc: map<string, string>, doc_as_upsert: boolean, " +
            "script: struct<source: string>, upsert: map<string, string>, " +
            "scripted_upsert: boolean, retry_on_conflict: int, " +
            "detect_noop: boolean>")).as("env"))
      .withColumn("ak", array_intersect(
        map_keys(coalesce(col("flat"), map_from_arrays(
          array().cast("array<string>"), array().cast("array<string>")))),
        actionKeyList))
      .withColumn("nk", size(col("ak")))
      .withColumn("docTaking",
        col("nk") === 1 && element_at(col("ak"), 1) =!= "delete")
      .withColumn("op",
        when(col("a.index").isNotNull, "index")
          .when(col("a.create").isNotNull, "create")
          .when(col("a.update").isNotNull, "update")
          .when(col("a.delete").isNotNull, "delete"))
      .withColumn("id", coalesce(col("a.index._id"), col("a.create._id"),
        col("a.update._id"), col("a.delete._id")))

    // strict wire validation (contract in the scaladoc above): each line
    // classifies against its PREDECESSOR (is it an expected source-doc
    // position?) and its SUCCESSOR's existence (truncation) — ONE
    // prev-join + ONE next-join, then a per-line violation expression.
    // Where several violations co-occur on one line the chain picks one;
    // the guard reports a single violation per batch anyway (ES 400s the
    // whole request), and the fuzz contract is class MEMBERSHIP.
    val withNbr0 =
      if (!ambiguousDocsAsSource)
        // strict mode: a doc position is simply "the predecessor is a
        // doc-taking action" — exact because an action-keyed line in doc
        // position rejects loudly, so runs of doc-taking lines cannot
        // validly chain
        p.join(p.select((col("seq") + 1).as("seq"),
            (col("nk") === 1 && col("docTaking")).as("_pd")), Seq("seq"), "left")
          .withColumn("_expDoc", coalesce(col("_pd"), lit(false)))
      else {
        // ES-compatible mode: doc positions follow the sequential walk
        // (a doc line, even action-keyed, is CONSUMED — the next line is
        // an action again). Within a maximal run of doc-taking-shaped
        // lines after a boundary, positions alternate: line i is a doc
        // iff its distance from the last non-doc-taking line is odd.
        // One window over the request's line list — bounded wire input.
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy("seq")
        val dtr = col("nk") === 1 && col("docTaking")
        p.withColumn("_pos", row_number().over(w))
          .withColumn("_lastBoundary", max(when(not(dtr), col("_pos"))).over(
            w.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("_expDoc",
            pmod(col("_pos") - coalesce(col("_lastBoundary"), lit(0L)), lit(2)) === 0)
          .drop("_pos", "_lastBoundary")
      }
    val withNbr = withNbr0
      .join(p.select((col("seq") - 1).as("seq"), lit(true).as("_hasNext")),
        Seq("seq"), "left")
    val ambiguous =
      if (ambiguousDocsAsSource) lit(null).cast("string")
      else when(col("_expDoc") && col("nk") > 0,
        lit("ambiguous bulk line (source doc carries a bulk action key)"))
    val violation =
      when(col("nk") > 1 && not(col("_expDoc")),
        lit("malformed action line (multiple action keys)"))
        .when(col("_expDoc"), coalesce(ambiguous,
          when(col("flat").isNull,
            lit("malformed source doc line (not a JSON object)"))))
        .when(col("nk") === 0,
          lit("malformed action/metadata line (expected an action)"))
        .when(col("nk") === 1 && (col("op").isNull || col("id").isNull),
          lit("malformed action line (bad or missing _id)"))
        // truncation (a doc-taking action with no following line) lives
        // IN the guard: riding the ops frame's `doc` column instead left
        // it prunable — a consumer projecting only op/id (or a
        // constant-folded pushed filter) would skip the raise entirely
        // (ADVICE round 14)
        .when(col("docTaking") && col("_hasNext").isNull,
          lit("truncated bulk body (action expects a source doc)"))
    // The guard CANNOT be a crossJoin+filter on the ops frame: a batch of
    // pure garbage parses to ZERO ops, and a filter over zero rows never
    // evaluates its predicate — the malformed batch would apply as a
    // silent no-op (found by EsBulkFuzzSpec). Instead the guard is a
    // 1-row aggregate UNIONED in as an extra (normally empty) partition:
    // evaluating its filter either passes (0 rows appended) or raises —
    // and union partitions always evaluate when the parse is consumed.
    val guard = withNbr
      .select(struct(col("seq"), violation.as("r")).as("v"))
      .filter(col("v.r").isNotNull)
      .agg(count(lit(1)).as("n"), min(col("v")).as("v"))
      .select(when(col("n") > 0, raise_error(concat(
          lit("_bulk: "), col("v.r"), lit(" [line "),
          col("v.seq").cast("string"), lit("]"))).cast("boolean"))
        .otherwise(lit(true)).as("_wire_ok"))
    val guardOps = guard.filter(not(col("_wire_ok")))
      .select(lit(-1L).as("seq"), lit("delete").as("op"), lit(-1L).as("id"),
        lit(null).cast("map<string, string>").as("doc"),
        lit(false).as("upsert"), lit(null).cast("string").as("script"),
        lit(null).cast("map<string, string>").as("upsertDoc"),
        lit(false).as("scriptedUpsert"), lit(true).as("detectNoop"))

    // a null/uncoercible _id cannot flow into the typed ops (the encoder
    // would NOT_NULL-assert before the wire guard fires); dropping such
    // lines here is safe because the guard rejects them loudly. Doc-
    // position lines are NOT actions — in ES-compatible mode an
    // action-keyed source doc would otherwise be read twice (the exact
    // hazard the strict default rejects).
    val act = withNbr
      .filter(not(col("_expDoc")) && col("op").isNotNull && col("id").isNotNull)
      .select(col("seq"), col("op"), col("id"))
    val docs = p.select((col("seq") - 1).as("seq"), col("flat"), col("env"),
      lit(true).as("_dl"))
    // reject-loudly validation of the update ENVELOPE (an unsupported
    // key silently dropped would change write semantics): every key must
    // be one this front-end implements, `script` must be the
    // `{"source": ...}` struct shape (stored-script ids and the bare
    // string shorthand are not wired here), and `doc`/`script` are
    // mutually exclusive (ES 400s that too). `retry_on_conflict` is
    // accepted and IGNORED: the per-id fold is serialized, so the
    // version conflicts it retries cannot occur. The checks ride the
    // `doc` column (evaluated for every update row), raising at action
    // time like ES's per-request validation.
    val knownEnv = typedLit(Seq(
      "doc", "doc_as_upsert", "script", "upsert", "scripted_upsert",
      "retry_on_conflict", "detect_noop"))
    val unknownKeys = array_except(map_keys(col("flat")), knownEnv)
    val updDoc =
      when(size(unknownKeys) > 0, raise_error(concat(
        lit("unsupported _bulk update envelope keys: "),
        concat_ws(", ", unknownKeys))).cast("map<string, string>"))
      .when(array_contains(map_keys(col("flat")), "script") &&
          col("env.script.source").isNull,
        raise_error(lit("_bulk update script must be {\"script\": {\"source\": ...}} " +
          "(stored-script ids / bare-string shorthand unsupported)"))
          .cast("map<string, string>"))
      .when(col("env.doc").isNotNull && col("env.script.source").isNotNull,
        raise_error(lit("_bulk update cannot carry both doc and script"))
          .cast("map<string, string>"))
      .when(col("env.doc").isNull && col("env.script.source").isNull,
        raise_error(lit("_bulk update action needs a doc or a script"))
          .cast("map<string, string>"))
      .otherwise(col("env.doc"))
    act.join(docs, Seq("seq"), "left")
      .select(col("seq"), col("op"), col("id"),
        // a truncated trailing action leaves `flat` null here; the union
        // guard's truncation class raises at the same materialization,
        // and unlike a doc-column raise it cannot be projection-pruned
        when(col("op") === "update", updDoc)
          .when(col("op") === "delete", lit(null))
          .otherwise(col("flat")).as("doc"),
        // the reference observer emits EVERY put as
        // prepareUpdate(...).setDocAsUpsert(true)
        // (`observer6/HbaseDataSyncEsObserver.java:93-129`) — an update
        // carrying `"doc_as_upsert": true` creates on a missing id
        // instead of returning `missing` (404)
        (col("op") === "update" &&
          coalesce(col("env.doc_as_upsert"), lit(false))).as("upsert"),
        when(col("op") === "update", col("env.script.source")).as("script"),
        when(col("op") === "update", col("env.upsert")).as("upsertDoc"),
        (col("op") === "update" &&
          coalesce(col("env.scripted_upsert"), lit(false))).as("scriptedUpsert"),
        (col("op") =!= "update" ||
          coalesce(col("env.detect_noop"), lit(true))).as("detectNoop"))
      .union(guardOps)
      .as[BulkOp]
  }

  /** Painless-SUBSET update script for the bulk fold:
    * `ctx._source.<field> = <expr>` where the rhs is Long arithmetic
    * (`+ - * / %`, parentheses, unary minus) over integer literals and
    * `ctx._source.<field>` refs whose values parse as Long; `/` truncates
    * toward zero (painless integer division — DuckDB's `//` on
    * non-negative operands). The same assignment grammar
    * [[EsQueryJson.updateByQuery]] compiles relationally; here it runs
    * against the per-id map inside the fold, so it is evaluated by a
    * ~30-line driver of the identical semantics. Unknown constructs and
    * missing/non-numeric refs throw — loudly, per the contract above. */
  private[dsl] def runUpdateScript(src: String, doc: Map[String, String])
      : Map[String, String] = {
    val asn = "ctx\\._source\\.([A-Za-z0-9_]+)\\s*=\\s*(.+)".r
    src.trim match {
      case asn(target, rhs) =>
        val bound = "ctx\\._source\\.([A-Za-z0-9_]+)".r.replaceAllIn(rhs, m => {
          val k = m.group(1)
          val v = doc.getOrElse(k, throw new IllegalArgumentException(
            s"update script references missing field '$k'"))
          require(v.matches("-?[0-9]+"),
            s"update script field '$k' is not an integer: '$v'")
          // parenthesize so negative values survive substitution into
          // any operator position (e.g. `2 * ctx._source.x` with x=-3)
          s"($v)"
        })
        require(bound.matches("[0-9+\\-*/%() ]+"),
          s"unsupported update script rhs after binding: $bound")
        doc + (target -> evalLong(bound).toString)
      case other => throw new IllegalArgumentException(
        s"update script must be 'ctx._source.<field> = <expr>', got: $other")
    }
  }

  /** Recursive-descent Long arithmetic: expr := term (('+'|'-') term)*;
    * term := factor (('*'|'/'|'%') factor)*; factor := '-' factor |
    * '(' expr ')' | literal. Division/modulo truncate toward zero (JVM
    * Long semantics == painless). */
  private def evalLong(s: String): Long = {
    var i = 0
    def skip(): Unit = while (i < s.length && s.charAt(i) == ' ') i += 1
    def factor(): Long = {
      skip()
      if (i < s.length && s.charAt(i) == '-') { i += 1; -factor() }
      else if (i < s.length && s.charAt(i) == '(') {
        i += 1; val v = expr(); skip()
        require(i < s.length && s.charAt(i) == ')', s"unbalanced parens in: $s")
        i += 1; v
      } else {
        val st = i
        while (i < s.length && s.charAt(i).isDigit) i += 1
        require(i > st, s"expected a number at offset $st in: $s")
        s.substring(st, i).toLong
      }
    }
    def term(): Long = {
      var v = factor()
      skip()
      while (i < s.length && "*/%".indexOf(s.charAt(i)) >= 0) {
        val op = s.charAt(i); i += 1
        val r = factor()
        v = op match { case '*' => v * r; case '/' => v / r; case _ => v % r }
        skip()
      }
      v
    }
    def expr(): Long = {
      var v = term()
      skip()
      while (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) {
        val op = s.charAt(i); i += 1
        val r = term()
        v = if (op == '+') v + r else v - r
        skip()
      }
      v
    }
    val v = expr()
    skip()
    require(i == s.length, s"trailing input at offset $i in: $s")
    v
  }

  /** The per-id ordered fold (public: the property spec runs the same
    * transition against a reference simulation). Returns (items, final
    * doc or None). */
  def fold(standing: Option[Map[String, String]], ops: Seq[BulkOp])
      : (Seq[(Long, String, String)], Option[Map[String, String]]) = {
    var doc = standing
    val items = ops.sortBy(_.seq).map { o =>
      val result = o.op match {
        case "index" =>
          val r = if (doc.isDefined) "updated" else "created"
          doc = Some(Option(o.doc).getOrElse(Map.empty)); r
        case "create" =>
          if (doc.isDefined) "conflict"
          else { doc = Some(Option(o.doc).getOrElse(Map.empty)); "created" }
        case "update" if o.script != null =>
          // scripted update (ES update-with-script): run against the
          // existing doc; on a missing id an `upsert` doc is indexed
          // as-is ("created", script NOT run) unless `scripted_upsert`
          // asks for the script to run over the upsert doc first
          if (doc.isDefined) { doc = Some(runUpdateScript(o.script, doc.get)); "updated" }
          else if (o.upsertDoc != null) {
            doc = Some(
              if (o.scriptedUpsert) runUpdateScript(o.script, o.upsertDoc)
              else o.upsertDoc)
            "created"
          } else "missing"
        case "update" =>
          if (doc.isEmpty) {
            // ES doc_as_upsert: the partial doc BECOMES the doc; a
            // doc-VALUED `upsert` is indexed as-is instead (the partial
            // doc is NOT merged over it — ES semantics). Both "created".
            if (o.upsert) { doc = Some(Option(o.doc).getOrElse(Map.empty)); "created" }
            else if (o.upsertDoc != null) { doc = Some(o.upsertDoc); "created" }
            else "missing"
          } else {
            // ES detect_noop (default TRUE): a partial-doc merge that
            // changes nothing reports "noop" and writes no new version;
            // `"detect_noop": false` forces the write
            val merged = doc.get ++ Option(o.doc).getOrElse(Map.empty)
            if (o.detectNoop && merged == doc.get) "noop"
            else { doc = Some(merged); "updated" }
          }
        case "delete" =>
          if (doc.isDefined) { doc = None; "deleted" } else "not_found"
      }
      (o.seq, o.op, result)
    }
    (items, doc)
  }

  private def applyAll(index: DataFrame, ops: Dataset[BulkOp]): Dataset[BulkOut] = {
    val spark = index.sparkSession
    import spark.implicits._
    val idx = index.select(col("id").cast("long").as("_1"), col("doc").as("_2"))
      .as[(Long, Map[String, String])]
    idx.groupByKey(_._1).cogroup(ops.groupByKey(_.id)) { (id, docs, opIt) =>
      val standing = docs.toSeq.headOption.map(_._2)
      val (items, fin) = fold(standing, opIt.toSeq)
      items.iterator.map { case (seq, op, r) =>
        BulkOut(seq, id, op, r, null, null, isState = false)
      } ++ fin.iterator.flatMap(m =>
        m.toSeq.sortBy(_._1).map { case (k, v) =>
          BulkOut(-1L, id, null, null, k, v, isState = true)
        })
    }
  }

  /** The bulk RESPONSE items: (seq, id, op, result) in line order. */
  def items(index: DataFrame, ops: Dataset[BulkOp]): DataFrame =
    applyAll(index, ops).filter(!col("isState"))
      .select(col("seq"), col("id"), col("op"), col("result"))

  /** The post-bulk index, exploded to (id, key, value) rows (map-order
    * free — the hash-stable shape). */
  def state(index: DataFrame, ops: Dataset[BulkOp]): DataFrame =
    applyAll(index, ops).filter(col("isState"))
      .select(col("id"), col("key"), col("value"))
}
