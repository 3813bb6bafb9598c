package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.dsl.EsBulk
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial fuzz of the `_bulk` NDJSON front-end — the sibling of
  * [[EsJsonFuzzSpec]] for the write path. Contract (the strict wire
  * validation in [[EsBulk.parse]]): every generated batch — well-formed,
  * structurally mangled, or truncated — must either apply cleanly or
  * reject loudly with a stable error class; no line may be silently
  * ignored or read twice (the pre-round-14 behavior for orphan/ambiguous
  * lines — found by writing this spec).
  *
  * The reference semantics is a driver-side state machine (`simValid`,
  * ~20 lines) that walks the batch exactly as ES's bulk parser does:
  * alternation of action and source-doc lines, one action key per action
  * line, integral `_id`, doc lines must be JSON objects and must not
  * carry action keys (where ES silently takes them as docs, this engine
  * rejects loudly — the documented deviation; unvalidated it would read
  * the line twice). Assertions over an executed stratified sample:
  *
  *   1. apply SUCCEEDS          ⇒ the state machine accepts the batch;
  *   2. apply THROWS            ⇒ the message carries a stable class;
  *   3. apply THROWS on a wire-VALID batch ⇒ the class is a fold-level
  *      one (update-envelope / script validation), never a wire class.
  *
  * The full 1000-batch corpus runs through the state machine (coverage
  * accounting); execution samples every k-th batch plus every sim-invalid
  * batch, so all wire-violation shapes the generator produces actually
  * hit the plan-side guard. Seeded (`pureApply`) — a found bug stays
  * found. */
class EsBulkFuzzSpec extends AnyFunSuite with SparkTestBase {

  // ---- generator ------------------------------------------------------

  private val docKey = Gen.oneOf("k0", "k1", "k2", "v")
  private val docVal = Gen.oneOf("a", "b", "c", "9", "17")
  private val anId = Gen.chooseNum(1L, 6L)

  /** One well-formed item: (action line, optional doc/envelope line). */
  private val goodItem: Gen[Seq[String]] = Gen.oneOf(
    for { id <- anId } yield Seq(s"""{"delete": {"_id": $id}}"""),
    for { id <- anId; k <- docKey; v <- docVal } yield
      Seq(s"""{"index": {"_id": $id}}""", s"""{"$k": "$v"}"""),
    for { id <- anId; k <- docKey; v <- docVal } yield
      Seq(s"""{"create": {"_id": $id}}""", s"""{"$k": "$v"}"""),
    for { id <- anId; k <- docKey; v <- docVal; up <- Gen.oneOf(true, false) } yield
      Seq(s"""{"update": {"_id": $id}}""",
        s"""{"doc": {"$k": "$v"}, "doc_as_upsert": $up}"""),
    for { id <- anId; n <- Gen.chooseNum(1, 9) } yield
      Seq(s"""{"update": {"_id": $id}}""",
        s"""{"script": {"source": "ctx._source.k0 = $n + 1"}, "upsert": {"k0": "0"}}"""))

  /** One mangled item — every wire-violation shape plus the fold-level
    * envelope/script landmines (which are wire-VALID). */
  private val badItem: Gen[Seq[String]] = Gen.oneOf(
    // garbage where an action belongs → malformed action/metadata line
    Gen.const(Seq("""{"oops": 1}""")),
    Gen.const(Seq("""not json at all""")),
    // doc-taking action with its doc line DROPPED → ambiguous (next line
    // is an action) or truncated (batch end)
    anId.map(id => Seq(s"""{"index": {"_id": $id}}""")),
    // two action keys on one line → malformed action line
    anId.map(id => Seq(s"""{"index": {"_id": $id}, "delete": {"_id": $id}}""")),
    // bad / missing _id → malformed action line
    anId.map(id => Seq(s"""{"index": {"_id": "x$id"}}""", """{"k0": "a"}""")),
    Gen.const(Seq("""{"create": {}}""", """{"k0": "a"}""")),
    Gen.const(Seq("""{"update": null}""", """{"doc": {"k0": "a"}}""")),
    // doc line that is not a JSON object → malformed source doc line
    anId.map(id => Seq(s"""{"index": {"_id": $id}}""", """[1, 2]""")),
    anId.map(id => Seq(s"""{"index": {"_id": $id}}""", """{"broken": """)),
    // doc line carrying an action key → ambiguous bulk line
    anId.map(id => Seq(s"""{"index": {"_id": $id}}""",
      s"""{"delete": {"_id": ${id + 1}}}""")),
    // stray doc after a delete → malformed action/metadata line
    anId.map(id => Seq(s"""{"delete": {"_id": $id}}""", """{"k0": "a"}""")),
    // wire-valid, fold-invalid: unknown envelope key / doc+script /
    // empty envelope / junk script
    anId.map(id => Seq(s"""{"update": {"_id": $id}}""",
      """{"doc": {"k0": "a"}, "nonsense": true}""")),
    anId.map(id => Seq(s"""{"update": {"_id": $id}}""",
      """{"doc": {"k0": "a"}, "script": {"source": "ctx._source.k0 = 1"}}""")),
    anId.map(id => Seq(s"""{"update": {"_id": $id}}""",
      """{"retry_on_conflict": 2}""")),
    anId.map(id => Seq(s"""{"update": {"_id": $id}}""",
      """{"script": {"source": "ctx._source.k0 = k0 +"}, "upsert": {"k0": "1"}}""")),
    anId.map(id => Seq(s"""{"update": {"_id": $id}}""",
      """{"script": {"source": "ctx._source.k0 = ctx._source.missing + 1"}}""")))

  private val batchGen: Gen[Seq[String]] = for {
    n <- Gen.chooseNum(1, 6)
    items <- Gen.listOfN(n,
      Gen.frequency(7 -> goodItem, 3 -> badItem))
  } yield items.flatten

  private val N = 1000
  private lazy val corpus: Seq[Seq[String]] =
    Gen.listOfN(N, batchGen).pureApply(Gen.Parameters.default, Seed(14082026L))

  // ---- driver-side reference state machine ---------------------------

  private val mapper = new ObjectMapper()
  private val actionKeys = Seq("index", "create", "update", "delete")

  /** ES's bulk line walk, with this engine's documented deviation (an
    * action-keyed line positioned as a doc rejects instead of being
    * silently taken as the doc). */
  private def simValid(lines: Seq[String]): Boolean = {
    var expectDoc = false
    for (l <- lines) {
      val node =
        try { val n = mapper.readTree(l); if (n != null && n.isObject) n else null }
        catch { case _: Exception => null }
      if (expectDoc) {
        if (node == null) return false // malformed source doc
        if (actionKeys.exists(node.has)) return false // ambiguous
        expectDoc = false
      } else {
        if (node == null) return false // garbage where an action belongs
        val aks = actionKeys.filter(node.has)
        if (aks.size != 1) return false // orphan doc / multi-key action
        val meta = node.get(aks.head)
        if (meta == null || !meta.isObject || !meta.has("_id") ||
          !meta.get("_id").isIntegralNumber) return false // bad _id
        expectDoc = aks.head != "delete"
      }
    }
    !expectDoc // a trailing doc-taking action is truncated
  }

  private val wireClasses = Seq(
    "malformed action line", "malformed action/metadata line",
    "ambiguous bulk line", "truncated bulk body", "malformed source doc line")
  private val foldClasses = Seq(
    "unsupported _bulk update envelope keys", "_bulk update script must be",
    "_bulk update cannot carry both", "_bulk update action needs",
    "update script", "unsupported update script rhs", "unbalanced parens",
    "expected a number", "trailing input")

  private def rootMessage(e: Throwable): String = {
    var t = e
    val sb = new StringBuilder(Option(t.getMessage).getOrElse(""))
    while (t.getCause != null && (t.getCause ne t)) {
      t = t.getCause; sb.append(" | ").append(Option(t.getMessage).getOrElse(""))
    }
    sb.toString
  }

  private def standing: DataFrame = {
    val sp = spark
    import sp.implicits._
    Seq((1L, Map("k0" -> "5")), (2L, Map("k1" -> "b")), (3L, Map("v" -> "z")))
      .toDF("id", "doc")
  }

  private def run(lines: Seq[String]): DataFrame = {
    val sp = spark
    import sp.implicits._
    val df = lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("seq", "value")
    EsBulk.items(standing, EsBulk.parse(df))
  }

  // ---- the fuzz -------------------------------------------------------

  test(s"bulk fuzz: $N batches — generator covers both verdicts, sample executes") {
    val verdicts = corpus.map(simValid)
    val nValid = verdicts.count(identity)
    assert(nValid > N / 4, s"generator degenerated: only $nValid wire-valid")
    assert(N - nValid > N / 8, s"generator degenerated: only ${N - nValid} wire-invalid")

    // execute every 13th batch + every sim-invalid batch among each 5th —
    // bounded run budget, all violation arms hit the plan-side guard
    val sample = corpus.zipWithIndex.filter { case (_, i) =>
      i % 13 == 0 || (!verdicts(i) && i % 5 == 0) }
    assert(sample.size >= 120, s"sample too small: ${sample.size}")
    var nOk = 0; var nWire = 0; var nFold = 0
    sample.foreach { case (batch, i) =>
      val valid = verdicts(i)
      try {
        run(batch).collect()
        nOk += 1
        assert(valid,
          s"batch $i applied cleanly but the reference walk rejects it:\n${batch.mkString("\n")}")
      } catch {
        case e: Throwable =>
          val msg = rootMessage(e)
          val isWire = wireClasses.exists(msg.contains)
          val isFold = foldClasses.exists(msg.contains)
          assert(isWire || isFold,
            s"batch $i threw an UNCLASSIFIED error: $msg\n${batch.mkString("\n")}")
          if (isWire) nWire += 1 else nFold += 1
          if (valid) assert(isFold && !isWire,
            s"batch $i is wire-valid but a wire class fired: $msg\n${batch.mkString("\n")}")
      }
    }
    // all three outcomes must actually occur, or the spec proves nothing
    assert(nOk >= 20, s"too few clean applies: $nOk")
    assert(nWire >= 20, s"too few wire rejections: $nWire")
    assert(nFold >= 3, s"too few fold-level rejections: $nFold")
  }

  test("bulk fuzz: each wire-violation class fires on its minimal batch") {
    def rejects(lines: Seq[String], cls: String): Unit = {
      val e = intercept[Throwable] { run(lines).collect() }
      val msg = rootMessage(e)
      assert(msg.contains(cls), s"expected '$cls', got: $msg")
    }
    rejects(Seq("""{"index": {"_id": 1}, "delete": {"_id": 1}}"""),
      "malformed action line")
    rejects(Seq("""{"index": {"_id": "abc"}}""", """{"k": "v"}"""),
      "malformed action line")
    rejects(Seq("""{"k": "v"}"""), "malformed action/metadata line")
    rejects(Seq("""{"delete": {"_id": 1}}""", """{"k": "v"}"""),
      "malformed action/metadata line")
    rejects(Seq("""{"index": {"_id": 1}}""", """{"delete": {"_id": 2}}"""),
      "ambiguous bulk line")
    rejects(Seq("""{"index": {"_id": 1}}""", """{"create": {"_id": 2}}""",
      """{"k": "v"}"""), "ambiguous bulk line")
    rejects(Seq("""{"index": {"_id": 1}}"""), "truncated bulk body")
    // a truncated UPDATE also trips the envelope check ("needs a doc or a
    // script") in the ops stage — evaluation order between the two loud
    // rejects is not pinned, either class is correct
    val e = intercept[Throwable] {
      run(Seq("""{"delete": {"_id": 1}}""", """{"update": {"_id": 2}}""")).collect()
    }
    val m = rootMessage(e)
    assert(m.contains("truncated bulk body") ||
      m.contains("_bulk update action needs"), s"unexpected class: $m")
    rejects(Seq("""{"index": {"_id": 1}}""", """[1, 2]"""),
      "malformed source doc line")
    // and the well-formed twin of each still applies
    val ok = run(Seq(
      """{"index": {"_id": 1}}""", """{"k": "v"}""",
      """{"delete": {"_id": 2}}""",
      """{"update": {"_id": 3}}""", """{"doc": {"v": "w"}}""",
      """{"create": {"_id": 9}}""", """{"k": "n"}""")).collect()
    assert(ok.length == 4)
    assert(ok.map(_.getString(3)).sorted.toSeq ==
      Seq("created", "deleted", "updated", "updated"))
  }

  // ---- state differential (round-15 task): ≥300 wire-valid batches ----
  // an INDEPENDENT ~40-line fold simulation (reimplements the ES bulk
  // semantics from the contract — never calls EsBulk.fold) must agree
  // with the engine's final index STATE for every generated valid batch.
  // This is the a195 oracle generalized: the wire fuzz proves accept/
  // reject; this proves the APPLIED ANSWER.

  private val goodBatchGen: Gen[Seq[String]] = for {
    n <- Gen.chooseNum(1, 7)
    items <- Gen.listOfN(n, goodItem)
  } yield items.flatten

  import scala.jdk.CollectionConverters._

  private def objMap(n: com.fasterxml.jackson.databind.JsonNode): Map[String, String] =
    n.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap

  /** ES bulk fold, re-derived from the contract (NOT EsBulk.fold): walk
    * action/doc line pairs mutating a standing map. Covers exactly the
    * goodItem shapes: index / create / delete / update{doc,
    * doc_as_upsert} / update{script "ctx._source.k0 = N + 1",
    * upsert {"k0": "0"}}. */
  private def simState(lines: Seq[String]): Map[Long, Map[String, String]] = {
    var st = Map(1L -> Map("k0" -> "5"), 2L -> Map("k1" -> "b"), 3L -> Map("v" -> "z"))
    var expect: Option[(String, Long)] = None
    for (l <- lines) {
      val node = mapper.readTree(l)
      expect match {
        case Some((op, id)) =>
          op match {
            case "index" => st += id -> objMap(node)
            case "create" => if (!st.contains(id)) st += id -> objMap(node)
            case "update" =>
              if (node.has("doc")) {
                if (st.contains(id)) st += id -> (st(id) ++ objMap(node.get("doc")))
                else if (node.has("doc_as_upsert") && node.get("doc_as_upsert").asBoolean())
                  st += id -> objMap(node.get("doc"))
              } else { // script arm
                if (st.contains(id)) {
                  val src = node.get("script").get("source").asText()
                  val n = "ctx\\._source\\.k0 = (\\d+) \\+ 1".r
                    .findFirstMatchIn(src).get.group(1).toLong
                  st += id -> (st(id) + ("k0" -> (n + 1).toString))
                } else if (node.has("upsert")) st += id -> objMap(node.get("upsert"))
              }
          }
          expect = None
        case None =>
          val op = actionKeys.find(node.has).get
          val id = node.get(op).get("_id").asLong()
          if (op == "delete") st -= id else expect = Some((op, id))
      }
    }
    st
  }

  private def engineState(lines: Seq[String]): Map[Long, Map[String, String]] = {
    val sp = spark
    import sp.implicits._
    val df = lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("seq", "value")
    EsBulk.state(standing, EsBulk.parse(df)).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => r.getString(1) -> r.getString(2)).toMap }
  }

  test("bulk state differential: 300+ valid batches match the independent fold sim") {
    val M = 300
    val valid = Gen.listOfN(M, goodBatchGen)
      .pureApply(Gen.Parameters.default, Seed(15082027L))
    assert(valid.size == M)
    valid.zipWithIndex.foreach { case (batch, i) =>
      val got = engineState(batch)
      val want = simState(batch)
      assert(got == want,
        s"batch $i final state diverges:\n${batch.mkString("\n")}\n got: $got\nwant: $want")
    }
  }

  // ---- ES-compatible ambiguous-doc mode (round-15 task) ---------------

  test("ambiguousDocsAsSource: action-keyed source docs consume as docs (ES mode)") {
    val sp = spark
    import sp.implicits._
    def run2(lines: Seq[String], compat: Boolean) = {
      val df = lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }
        .toDF("seq", "value")
      (EsBulk.items(standing, EsBulk.parse(df, ambiguousDocsAsSource = compat)),
        EsBulk.state(standing, EsBulk.parse(df, ambiguousDocsAsSource = compat)))
    }
    // the canonical ambiguity: an index action whose doc line carries a
    // bulk action key. Strict rejects (pinned in the minimal-batch test);
    // ES mode takes the line as the source doc — id 2 is NOT deleted.
    val lines = Seq("""{"index": {"_id": 1}}""", """{"delete": {"_id": 2}}""")
    val (items, state) = run2(lines, compat = true)
    val out = items.collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 1L && out.head.getString(3) == "updated")
    val st = state.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // id 1's doc is the action-keyed line (its nested value survives as
    // JSON text under the flat map model); id 2 untouched, id 3 untouched
    assert(st.map(_._1).toSet == Set(1L, 2L, 3L))
    assert(st.filter(_._1 == 1L).map(_._2) == Seq("delete"))
    // the ES walk CHAINS: after consuming line 2 as a doc, line 3 is an
    // action position again (delete id 3), and line 4 is its... none —
    // delete takes no doc, so a trailing doc line must still reject
    val chained = Seq(
      """{"index": {"_id": 1}}""", """{"index": {"_id": 9}}""",
      """{"delete": {"_id": 3}}""")
    val (items2, state2) = run2(chained, compat = true)
    assert(items2.collect().length == 2) // index 1 + delete 3; NO doc for id 9
    val st2 = state2.collect().map(_.getLong(0)).toSet
    assert(st2 == Set(1L, 2L)) // id 3 deleted; id 9 never indexed
    // strict mode still rejects the same batch loudly
    val e = intercept[Throwable] { run2(chained, compat = false)._1.collect() }
    assert(rootMessage(e).contains("ambiguous bulk line"))
    // and compat mode still rejects genuine garbage in action position
    val e2 = intercept[Throwable] {
      run2(Seq("""{"delete": {"_id": 1}}""", """{"k": "v"}"""), compat = true)._1.collect()
    }
    assert(rootMessage(e2).contains("malformed action/metadata line"))
  }

  test("wire validation survives column pruning and pushed filters (ADVICE r14)") {
    // pre-fix the truncation raise rode the `doc` column: a consumer
    // projecting only op/id (or a constant-foldable pushed filter)
    // pruned the raise away and the malformed batch read as clean
    val sp = spark
    import sp.implicits._
    val truncated = Seq((0L, """{"delete": {"_id": 4}}"""),
      (1L, """{"index": {"_id": 1}}""")).toDF("seq", "value")
    def msgOf(f: => Any): String = rootMessage(intercept[Throwable](f))
    assert(msgOf(EsBulk.parse(truncated).select("op", "id").count())
      .contains("truncated bulk body"))
    assert(msgOf(EsBulk.parse(truncated)
        .filter(org.apache.spark.sql.functions.col("op") === "delete").count())
      .contains("truncated bulk body"))
    // a fully-consumed clean batch still passes the same projections
    val clean = Seq((0L, """{"index": {"_id": 1}}"""), (1L, """{"k": "v"}"""))
      .toDF("seq", "value")
    assert(EsBulk.parse(clean).select("op", "id").count() == 1L)
  }
}
