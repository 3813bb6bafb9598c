package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential front 5 — the widened painless subset.
  *
  * Seeded generators produce painless-subset expressions as an AST that
  * prints BOTH the painless source (compiled by [[graft.dsl.Painless]]
  * through the engine's script contexts) and an independent plain-Scala
  * evaluation (Java string semantics, IEEE double arithmetic mirroring
  * the expression tree's association). Numeric and string expressions run
  * through `script_fields`, booleans through the filter-context `script`
  * query — the two ends of the script surface. Any divergence is an
  * engine compile bug (offset-base shifts, precedence, ternary nesting,
  * method-arg recursion).
  *
  * Deliberate subset contracts the twin ENCODES (not ES-painless-exact,
  * documented at [[graft.dsl.Painless]]): out-of-range substring
  * truncates (SQL) instead of throwing (Java), and `/` is SQL division
  * (the generator always divides by a double literal, where painless and
  * SQL agree).
  */
case class PainlessDoc(doc_id: Long, n_chars: Long, lang: String, source: String,
                       ts: java.sql.Timestamp)

class EsPainlessDifferentialSpec extends AnyFunSuite with SparkTestBase {

  type Doc = PainlessDoc
  private def Doc(id: Long, nc: Long, l: String, s: String) =
    // ~2.74 h apart: hour/minute/second/day-of-week/day-of-year all vary
    PainlessDoc(id, nc, l, s, new java.sql.Timestamp(1700000000000L + id * 9876543L))

  private val fixture: Seq[Doc] = {
    val langs = Seq("en", "de", "fr", "zz")
    val srcs = Seq("", "a", "src1", "web_archive", "crawl9", "s", "src16")
    (1L to 40L).map(i => Doc(i, (i * 37) % 997, langs((i % 4).toInt), srcs((i % 7).toInt)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // generator node: painless text + the independent evaluation
  case class NumG(p: String, f: Doc => Double)
  case class StrG(p: String, f: Doc => String)
  case class BoolG(p: String, f: Doc => Boolean)

  private val needles = Seq("a", "src", "web", "1", "rc", "en")

  private def numG(rnd: Random, depth: Int): NumG = {
    val c = if (depth <= 0) rnd.nextInt(4) else 4 + rnd.nextInt(9)
    c match {
      case 0 => val v = rnd.nextInt(9) + 1; NumG(v.toString, _ => v.toDouble)
      case 1 => val v = (rnd.nextInt(40) + 5) / 10.0; NumG(v.toString, _ => v)
      case 2 => NumG("doc['n_chars'].value", _.n_chars.toDouble)
      case 3 => NumG("doc['doc_id'].value", _.doc_id.toDouble)
      case 4 | 5 =>
        val op = Seq("+", "-", "*")(rnd.nextInt(3))
        val a = numG(rnd, depth - 1); val b = numG(rnd, depth - 1)
        NumG(s"(${a.p} $op ${b.p})", d => op match {
          case "+" => a.f(d) + b.f(d)
          case "-" => a.f(d) - b.f(d)
          case _ => a.f(d) * b.f(d)
        })
      case 6 =>
        val a = numG(rnd, depth - 1); val v = rnd.nextInt(8) + 2
        NumG(s"(${a.p} / $v.0)", d => a.f(d) / v)
      case 7 =>
        val a = numG(rnd, depth - 1); val v = rnd.nextInt(8) + 2
        NumG(s"(${a.p} % $v)", d => a.f(d) % v)
      case 8 =>
        val a = numG(rnd, depth - 1); val b = numG(rnd, depth - 1)
        val fn = Seq("min", "max")(rnd.nextInt(2))
        NumG(s"Math.$fn(${a.p}, ${b.p})",
          d => if (fn == "min") math.min(a.f(d), b.f(d)) else math.max(a.f(d), b.f(d)))
      case 9 =>
        val a = numG(rnd, depth - 1)
        rnd.nextInt(4) match {
          case 0 => NumG(s"Math.abs(${a.p})", d => math.abs(a.f(d)))
          case 1 => NumG(s"Math.log(Math.abs(${a.p}) + 1)", d => math.log(math.abs(a.f(d)) + 1))
          case 2 => NumG(s"Math.sqrt(Math.abs(${a.p}))", d => math.sqrt(math.abs(a.f(d))))
          case _ => NumG(s"Math.floor(${a.p})", d => math.floor(a.f(d)))
        }
      case 10 =>
        // methods attach to doc refs only (the subset's one-method-per-ref rule)
        val (p, f) = strRef(rnd)
        if (rnd.nextBoolean()) NumG(s"$p.length()", d => f(d).length.toDouble)
        else {
          val n = needles(rnd.nextInt(needles.size))
          NumG(s"$p.indexOf('$n')", d => f(d).indexOf(n).toDouble)
        }
      case _ =>
        val c0 = boolG(rnd, depth - 1); val a = numG(rnd, depth - 1); val b = numG(rnd, depth - 1)
        NumG(s"(${c0.p} ? ${a.p} : ${b.p})", d => if (c0.f(d)) a.f(d) else b.f(d))
    }
  }

  // string method receivers must be doc refs (the subset binds ONE method
  // per ref) — string COMPOSITION happens through the ternary
  private def strRef(rnd: Random): (String, Doc => String) =
    if (rnd.nextBoolean()) ("doc['source'].value", (d: Doc) => d.source)
    else ("doc['lang'].value", (d: Doc) => d.lang)

  private def strG(rnd: Random, depth: Int): StrG = {
    val c = if (depth <= 0) rnd.nextInt(2) else rnd.nextInt(5)
    c match {
      case 0 =>
        val (p, f) = strRef(rnd); StrG(p, f)
      case 1 =>
        val (p, f) = strRef(rnd)
        rnd.nextInt(3) match {
          case 0 =>
            val a = rnd.nextInt(4)
            // Java substring(begin): SQL truncation past the end (subset contract)
            StrG(s"$p.substring($a)", d => f(d).drop(a))
          case 1 =>
            val a = rnd.nextInt(3); val b = a + rnd.nextInt(4)
            StrG(s"$p.substring($a, $b)", d => f(d).slice(a, b))
          case _ =>
            val m = if (rnd.nextBoolean()) "toLowerCase" else "toUpperCase"
            StrG(s"$p.$m()", d => if (m == "toLowerCase") f(d).toLowerCase else f(d).toUpperCase)
        }
      case _ =>
        val c0 = boolG(rnd, depth - 1); val a = strG(rnd, depth - 1); val b = strG(rnd, depth - 1)
        StrG(s"(${c0.p} ? ${a.p} : ${b.p})", d => if (c0.f(d)) a.f(d) else b.f(d))
    }
  }

  private def boolG(rnd: Random, depth: Int): BoolG = {
    val c = if (depth <= 0) rnd.nextInt(3) else rnd.nextInt(6)
    c match {
      case 0 =>
        val op = Seq(">", ">=", "<", "<=", "==", "!=")(rnd.nextInt(6))
        val a = numG(rnd, math.max(0, depth - 1)); val b = numG(rnd, math.max(0, depth - 1))
        BoolG(s"(${a.p} $op ${b.p})", d => op match {
          case ">" => a.f(d) > b.f(d)
          case ">=" => a.f(d) >= b.f(d)
          case "<" => a.f(d) < b.f(d)
          case "<=" => a.f(d) <= b.f(d)
          case "==" => a.f(d) == b.f(d)
          case _ => a.f(d) != b.f(d)
        })
      case 1 =>
        val (p, f) = strRef(rnd)
        val m = Seq("contains", "startsWith", "endsWith")(rnd.nextInt(3))
        val n = needles(rnd.nextInt(needles.size))
        BoolG(s"$p.$m('$n')", d => m match {
          case "contains" => f(d).contains(n)
          case "startsWith" => f(d).startsWith(n)
          case _ => f(d).endsWith(n)
        })
      case 2 =>
        val (p, f) = strRef(rnd)
        val lit = Seq("en", "de", "src1", "a")(rnd.nextInt(4))
        val eq = rnd.nextBoolean()
        BoolG(s"($p ${if (eq) "==" else "!="} '$lit')",
          d => if (eq) f(d) == lit else f(d) != lit)
      case 3 | 4 =>
        val op = if (rnd.nextBoolean()) "&&" else "||"
        val a = boolG(rnd, depth - 1); val b = boolG(rnd, depth - 1)
        BoolG(s"(${a.p} $op ${b.p})",
          d => if (op == "&&") a.f(d) && b.f(d) else a.f(d) || b.f(d))
      case _ =>
        val c0 = boolG(rnd, depth - 1); val a = boolG(rnd, depth - 1); val b = boolG(rnd, depth - 1)
        BoolG(s"(${c0.p} ? ${a.p} : ${b.p})", d => if (c0.f(d)) a.f(d) else b.f(d))
    }
  }

  private def df = {
    val sp = spark
    import sp.implicits._
    fixture.toDF()
  }

  test("numeric + string script_fields match the independent twin (120 exprs)") {
    val rnd = new Random(20260816L)
    val nums = Seq.fill(80)(numG(rnd, 3))
    val strs = Seq.fill(40)(strG(rnd, 2))
    val d = df
    // batched: 20 expressions per search body
    nums.grouped(20).zipWithIndex.foreach { case (batch, bi) =>
      val sf = batch.zipWithIndex.map { case (g, i) =>
        s""""e$i": {"script": "${g.p.replace("\"", "\\\"")}"}"""
      }.mkString(", ")
      val body =
        s"""{"query": {"match_all": {}}, "script_fields": {$sf},
           | "sort": ["doc_id"], "size": ${fixture.size}}""".stripMargin
      val rows = graft.dsl.EsQueryJson.search(d, body).collect()
      assert(rows.length == fixture.size)
      rows.foreach { r =>
        val doc = fixture((r.getAs[Long]("doc_id") - 1).toInt)
        batch.zipWithIndex.foreach { case (g, i) =>
          val t = g.f(doc)
          val ev = r.getAs[Any](s"e$i") match {
            case l: Long => l.toDouble
            case i2: Int => i2.toDouble
            case x: Double => x
            case other => fail(s"unexpected engine type for ${g.p}: $other")
          }
          assert(math.abs(ev - t) < 1e-9 || math.abs(ev - round6(t)) < 1e-9,
            s"numeric divergence (batch $bi, e$i): ${g.p}\n doc=$doc engine=$ev twin=$t")
        }
      }
    }
    strs.grouped(20).zipWithIndex.foreach { case (batch, bi) =>
      val sf = batch.zipWithIndex.map { case (g, i) =>
        s""""s$i": {"script": "${g.p.replace("\"", "\\\"")}"}"""
      }.mkString(", ")
      val body =
        s"""{"query": {"match_all": {}}, "script_fields": {$sf},
           | "sort": ["doc_id"], "size": ${fixture.size}}""".stripMargin
      val rows = graft.dsl.EsQueryJson.search(d, body).collect()
      rows.foreach { r =>
        val doc = fixture((r.getAs[Long]("doc_id") - 1).toInt)
        batch.zipWithIndex.foreach { case (g, i) =>
          assert(r.getAs[String](s"s$i") == g.f(doc),
            s"string divergence (batch $bi, s$i): ${g.p}\n doc=$doc " +
              s"engine=${r.getAs[String](s"s$i")} twin=${g.f(doc)}")
        }
      }
    }
  }

  test("boolean script queries match the independent twin (60 predicates)") {
    val rnd = new Random(99173L)
    val d = df
    Seq.fill(60)(boolG(rnd, 3)).zipWithIndex.foreach { case (g, i) =>
      val body =
        s"""{"query": {"bool": {"filter": [{"script": {"script":
           |   "${g.p.replace("\"", "\\\"")}"}}]}},
           | "sort": ["doc_id"], "size": ${fixture.size}}""".stripMargin
      val got = graft.dsl.EsQueryJson.search(d, body)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      val want = fixture.filter(g.f).map(_.doc_id).toSet
      assert(got == want,
        s"predicate divergence ($i): ${g.p}\n engine=$got twin=$want")
    }
  }

  test("widening 2: params/locals/equals/date accessors match the twin (160 exprs)") {
    import java.time.ZoneOffset
    val rnd = new Random(4471823L)
    val d = df
    // generated case: painless source + params JSON + independent eval
    case class Case(src: String, params: String, f: Doc => Double)
    def zdt(doc: Doc) = doc.ts.toInstant.atZone(ZoneOffset.UTC)
    def gen(): Case = rnd.nextInt(6) match {
      case 0 => // numeric params over a generated sub-expression
        val a = rnd.nextInt(9) + 1; val b = (rnd.nextInt(40) + 5) / 10.0
        val sub = numG(rnd, 2)
        Case(s"(${sub.p}) * params.a + params.b", s"""{"a": $a, "b": $b}""",
          doc => sub.f(doc) * a + b)
      case 1 => // string param through .equals() gating two sub-expressions
        val l = Seq("en", "de", "fr", "zz", "xx")(rnd.nextInt(5))
        val a = numG(rnd, 1); val b = numG(rnd, 1)
        Case(s"doc['lang'].value.equals(params.l) ? ${a.p} : ${b.p}",
          s"""{"l": "$l"}""",
          doc => if (doc.lang == l) a.f(doc) else b.f(doc))
      case 2 => // local declarations, result referencing locals twice
        val sub = numG(rnd, 2); val m = rnd.nextInt(5) + 2
        Case(s"def r = ${sub.p}; def s2 = r * $m; return s2 + r", "{}",
          doc => { val r = sub.f(doc); r * m + r })
      case 3 => // typed local + isEmpty + string-method composition
        val n = rnd.nextInt(3) + 1
        Case(s"double w = doc['source'].value.isEmpty() ? $n : doc['source'].value.length(); w * 2",
          "{}",
          doc => { val w: Double = if (doc.source.isEmpty) n else doc.source.length; w * 2 })
      case 4 => // Joda getters (weekday base Monday=1, months 1-12)
        val (expr, f): (String, Doc => Double) = rnd.nextInt(5) match {
          case 0 => ("doc['ts'].value.getYear()", doc => zdt(doc).getYear)
          case 1 => ("doc['ts'].value.getMonthOfYear() * 100 + doc['ts'].value.getDayOfMonth()",
            doc => zdt(doc).getMonthValue * 100 + zdt(doc).getDayOfMonth)
          case 2 => ("doc['ts'].value.getDayOfWeek() * 10 + doc['ts'].value.getHourOfDay()",
            doc => zdt(doc).getDayOfWeek.getValue * 10 + zdt(doc).getHour)
          case 3 => ("doc['ts'].value.getMinuteOfHour() + doc['ts'].value.getSecondOfMinute()",
            doc => zdt(doc).getMinute + zdt(doc).getSecond)
          case _ => ("doc['ts'].value.getDayOfYear()", doc => zdt(doc).getDayOfYear.toDouble)
        }
        Case(expr, "{}", f)
      case _ => // .millis arithmetic with a param
        val k = rnd.nextInt(86400) + 1000
        Case(s"doc['ts'].value.millis % params.k", s"""{"k": $k}""",
          doc => (doc.ts.getTime % k).toDouble)
    }
    Seq.fill(160)(gen()).grouped(20).zipWithIndex.foreach { case (batch, bi) =>
      val sf = batch.zipWithIndex.map { case (c, i) =>
        s""""e$i": {"script": {"source": "${c.src.replace("\"", "\\\"")}", "params": ${c.params}}}"""
      }.mkString(", ")
      val body =
        s"""{"query": {"match_all": {}}, "script_fields": {$sf},
           | "sort": ["doc_id"], "size": ${fixture.size}}""".stripMargin
      val rows = graft.dsl.EsQueryJson.search(d, body).collect()
      assert(rows.length == fixture.size)
      rows.foreach { r =>
        val doc = fixture((r.getAs[Long]("doc_id") - 1).toInt)
        batch.zipWithIndex.foreach { case (c, i) =>
          val t = c.f(doc)
          val ev = r.getAs[Any](s"e$i") match {
            case l: Long => l.toDouble
            case i2: Int => i2.toDouble
            case x: Double => x
            case other => fail(s"unexpected engine type for ${c.src}: $other")
          }
          assert(math.abs(ev - t) < 1e-9 || math.abs(ev - round6(t)) < 1e-9,
            s"widening-2 divergence (batch $bi, e$i): ${c.src} params=${c.params}\n" +
              s" doc=$doc engine=$ev twin=$t")
        }
      }
    }
  }

  test("widening 2: compiled-SQL pins and loud rejects") {
    import graft.dsl.Painless
    // params bind as literals (doubles keep the D suffix), locals inline
    assert(Painless.compile("doc['n'].value * params.f", params = Map("f" -> 2L)) ==
      "n * 2")
    assert(Painless.compile("params.s", params = Map("s" -> "a'b")) == "'a''b'")
    assert(Painless.compile("def x = doc['a'].value + 1; x * x", extraIds = Set("a")) ==
      "(a + 1) * (a + 1)")
    assert(Painless.compile("def x = doc['a'].value; def y = x + 1; return y * 2") ==
      "((a) + 1) * 2")
    assert(Painless.compile("doc['s'].value.equals('x')") == "(s = 'x')")
    assert(Painless.compile("doc['ts'].value.millis") ==
      "unix_millis(cast(ts as timestamp))")
    assert(Painless.compile("doc['ts'].value.getDayOfWeek()") == "(weekday(ts) + 1)")
    // rejects: unbound param, non-declaration statement, trailing
    // declaration, unknown date accessor, params in a doc ref
    intercept[IllegalArgumentException] {
      Painless.compile("params.missing + 1", params = Map("other" -> 1L))
    }
    intercept[IllegalArgumentException] {
      Painless.compile("doc['a'].value = 2; doc['a'].value")
    }
    intercept[IllegalArgumentException] {
      Painless.compile("def x = doc['a'].value; def y = x + 1")
    }
    intercept[IllegalArgumentException] {
      Painless.compile("doc['ts'].value.getEra()")
    }
    // a local name never rewrites inside string literals
    assert(Painless.compile("def en = 1; doc['lang'].value == 'en' ? en : 0") ==
      "IF(lang  =  'en', (1), 0)")
  }

  test("loud rejects: unknown method, unknown identifier, Math.*, leftover syntax") {
    import graft.dsl.Painless
    intercept[IllegalArgumentException] { Painless.compile("doc['f'].value.reverse()") }
    intercept[IllegalArgumentException] { Painless.compile("bogus(doc['f'].value)") }
    intercept[IllegalArgumentException] { Painless.compile("Math.tan(doc['f'].value)") }
    intercept[IllegalArgumentException] { Painless.compile("doc['f'].value ? 1 :") }
    intercept[IllegalArgumentException] { Painless.compile("params.x + 1") }
    intercept[IllegalArgumentException] { Painless.compile("doc['f'].date.year") }
    intercept[IllegalArgumentException] { Painless.compile("doc['f'].value.substring(1, 2, 3)") }
    // and the happy paths the rejects bracket
    assert(Painless.compile("doc['f'].value.substring(1, 3)") == "substring(f, (1) + 1, (3) - (1))")
    assert(Painless.compile("a > 1 ? 2 : b < 3 ? 4 : 5", extraIds = Set("a", "b")) ==
      "IF(a > 1, 2, IF(b < 3, 4, 5))")
    assert(Painless.compile("Math.pow(doc['x'].value, 2) != 4") == "power(x, 2)  <>  4")
    // stringConcat rewrites USER '+' to || but never the compiler's own
    // offset arithmetic (ADVICE r16: substring(f, (2) || 1) concatenated '21')
    assert(Painless.compile("doc['s'].value.substring(2)", stringConcat = true) ==
      "substring(s, (2) + 1)")
    assert(Painless.compile("doc['s'].value.substring(1, 3) + '!'", stringConcat = true) ==
      "substring(s, (1) + 1, (3) - (1)) || '!'")
  }
}
