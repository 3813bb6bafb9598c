package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Fixture row (top-level: outer-scope-free Encoder). `m` values are
  * multiples of 0.25 so bucket sums are exact in binary — aggregation
  * order cannot perturb the doubles the twin folds. */
case class PipeDiffDoc(id: Long, g: String, n: Long, m: Double)

/** Pipeline-aggregation differential (round-16 fourth arm): the round-15
  * widened-agg arm covers cumulative_sum/derivative only; this one covers
  * the REST of the parent-pipeline surface — serial_diff (lag 1..3),
  * moving_avg (simple / linear / ewma models), moving_fn (max / min / sum
  * / unweightedAvg / stdDev with the ES shift frame that EXCLUDES the
  * current bucket by default), bucket_script, bucket_selector,
  * bucket_sort, and CHAINED pipes (a pipe whose buckets_path is another
  * pipe's output, with Spark-null = ES-gap skip propagation) — plus the
  * sibling pipelines (avg/sum/min/max/stats_bucket).
  *
  * The twin is plain Scala over the collected fixture: it buckets the
  * docs itself, applies the metric rounding the engine documents
  * (sum/min/max → 4 dp, avg → 6 dp), then evaluates each pipe as a list
  * operation in bucket-key order, mirroring ES's coordinator-side
  * semantics (derivative null on the first bucket; window aggregates skip
  * null/gap values; moving_fn's empty frame → null; ewma/linear folds in
  * the engine's documented closed forms). No Column machinery is reused.
  *
  * Seeded — deterministic corpus, found bugs stay found. */
class EsPipelineDifferentialSpec extends AnyFunSuite with SparkTestBase {

  private lazy val fixture: Seq[PipeDiffDoc] = (0 until 240).map { i =>
    PipeDiffDoc(i.toLong, Seq("p", "q", "r")(i % 3),
      (i * 13 % 200).toLong, (i * 17 % 40) * 0.25)
  }

  private lazy val docsDf = {
    val sp = spark
    import sp.implicits._
    fixture.toDF()
  }

  private def round(v: Double, p: Int): Double =
    BigDecimal(v).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- twin bucket model -------------------------------------------------
  /** One bucket: key → named column values (None = SQL null). */
  private case class Bucket(key: Long, cols: Map[String, Option[Double]])

  private def baseBuckets(iv: Long, metric: Option[(String, String)]): Seq[Bucket] = {
    fixture.groupBy(d => d.n / iv * iv).toSeq.sortBy(_._1).map { case (k, ds) =>
      val mcols: Map[String, Option[Double]] = metric match {
        case None => Map.empty
        case Some((nm, kind)) =>
          val vs = ds.map(_.m)
          val v = kind match {
            case "sum" => round(vs.sum, 4)
            case "avg" => round(vs.sum / vs.size, 6)
            case "min" => round(vs.min, 4)
            case "max" => round(vs.max, 4)
          }
          Map(nm -> Some(v))
      }
      Bucket(k, mcols ++ Map("doc_count" -> Some(ds.size.toDouble)))
    }
  }

  // ---- pipe AST ------------------------------------------------------------
  private sealed trait Pipe {
    def name: String
    def json: String
    /** buckets_path references (dependency inputs for the topo order). */
    def deps: Seq[String]
    /** Transform the ordered bucket list (append a column / filter / sort). */
    def apply(bs: Seq[Bucket]): Seq[Bucket]
  }
  private def pathOf(b: Bucket, p: String): Option[Double] =
    b.cols(if (p == "_count") "doc_count" else p)

  private case class PCumSum(name: String, path: String) extends Pipe {
    def deps = Seq(path)
    def json = s""""$name": {"cumulative_sum": {"buckets_path": "$path"}}"""
    def apply(bs: Seq[Bucket]) = {
      var acc = 0.0
      bs.map { b =>
        pathOf(b, path).foreach(acc += _) // window sum skips nulls
        b.copy(cols = b.cols + (name -> Some(round(acc, 4))))
      }
    }
  }
  private case class PDeriv(name: String, path: String) extends Pipe {
    def deps = Seq(path)
    def json = s""""$name": {"derivative": {"buckets_path": "$path"}}"""
    def apply(bs: Seq[Bucket]) = bs.zipWithIndex.map { case (b, i) =>
      val v = if (i == 0) None
        else for { c <- pathOf(b, path); p <- pathOf(bs(i - 1), path) } yield round(c - p, 4)
      b.copy(cols = b.cols + (name -> v))
    }
  }
  private case class PSerialDiff(name: String, path: String, lag: Int) extends Pipe {
    def deps = Seq(path)
    def json = s""""$name": {"serial_diff": {"buckets_path": "$path", "lag": $lag}}"""
    def apply(bs: Seq[Bucket]) = bs.zipWithIndex.map { case (b, i) =>
      val v = if (i < lag) None
        else for { c <- pathOf(b, path); p <- pathOf(bs(i - lag), path) } yield round(c - p, 4)
      b.copy(cols = b.cols + (name -> v))
    }
  }
  private case class PMovAvg(name: String, path: String, window: Int,
                             model: String, alpha: Double) extends Pipe {
    def deps = Seq(path)
    def json = {
      val extra = model match {
        case "simple" => ""
        case "linear" => s""", "model": "linear""""
        case "ewma" => s""", "model": "ewma", "settings": {"alpha": $alpha}"""
      }
      s""""$name": {"moving_avg": {"buckets_path": "$path", "window": $window$extra}}"""
    }
    def apply(bs: Seq[Bucket]) = bs.zipWithIndex.map { case (b, i) =>
      val frame = bs.slice(math.max(0, i - (window - 1)), i + 1).flatMap(pathOf(_, path))
      val v = model match {
        case "simple" =>
          if (frame.isEmpty) None else Some(round(frame.sum / frame.size, 6))
        case "linear" =>
          // weights 1..m toward the newest; exact int divisor
          if (frame.isEmpty) None
          else Some(round(
            frame.zipWithIndex.map { case (x, j) => (j + 1) * x }.foldLeft(0.0)(_ + _) /
              (frame.size * (frame.size + 1) / 2), 6))
        case "ewma" =>
          // closed form of s₁=x₁, sₜ=α·xₜ+(1−α)·sₜ₋₁: w₀=(1−α)^(m−1),
          // wⱼ=α·(1−α)^(m−1−j) for j>0 — the engine's documented fold
          if (frame.isEmpty) None
          else Some(round(frame.zipWithIndex.map { case (x, j) =>
            if (j == 0) math.pow(1.0 - alpha, frame.size - 1) * x
            else alpha * math.pow(1.0 - alpha, frame.size - 1 - j) * x
          }.foldLeft(0.0)(_ + _), 6))
      }
      b.copy(cols = b.cols + (name -> v))
    }
  }
  private case class PMovFn(name: String, path: String, window: Int,
                            shift: Int, fn: String) extends Pipe {
    def deps = Seq(path)
    def json = {
      val sh = if (shift != 0) s""", "shift": $shift""" else ""
      s""""$name": {"moving_fn": {"buckets_path": "$path", "window": $window$sh,
         | "script": "MovingFunctions.$fn(values)"}}""".stripMargin
    }
    def apply(bs: Seq[Bucket]) = bs.zipWithIndex.map { case (b, i) =>
      // ES frame: [-window+shift, shift-1] relative rows — default shift 0
      // EXCLUDES the current bucket
      val lo = math.max(0, i - window + shift)
      val hi = math.min(bs.size - 1, i + shift - 1)
      val frame = if (hi < lo) Nil else bs.slice(lo, hi + 1).flatMap(pathOf(_, path))
      val v =
        if (frame.isEmpty) None
        else fn match {
          case "max" => Some(round(frame.max, 4))
          case "min" => Some(round(frame.min, 4))
          case "sum" => Some(round(frame.sum, 4))
          case "unweightedAvg" => Some(round(frame.sum / frame.size, 6))
          case "stdDev" =>
            val mean = frame.sum / frame.size
            Some(round(math.sqrt(
              frame.map(x => (x - mean) * (x - mean)).sum / frame.size), 6))
        }
      b.copy(cols = b.cols + (name -> v))
    }
  }
  private case class PScript(name: String, a: String, b: String, form: String) extends Pipe {
    def deps = Seq(a, b)
    def json =
      s""""$name": {"bucket_script": {"buckets_path": {"a": "$a", "b": "$b"},
         | "script": "${form.replace("A", "params.a").replace("B", "params.b")}"}}""".stripMargin
    def apply(bs: Seq[Bucket]) = bs.map { b0 =>
      val v = for { x <- pathOf(b0, a); y <- pathOf(b0, b) } yield round(form match {
        case "A / B + 1" => x / y + 1
        case "A * 2 - B" => x * 2 - y
      }, 6)
      b0.copy(cols = b0.cols + (name -> v))
    }
  }
  private case class PSelector(name: String, a: String, threshold: Double) extends Pipe {
    def deps = Seq(a)
    def json =
      s""""$name": {"bucket_selector": {"buckets_path": {"a": "$a"},
         | "script": "params.a > $threshold"}}""".stripMargin
    // a null path value compares false in SQL — the bucket drops
    def apply(bs: Seq[Bucket]) = bs.filter(b => pathOf(b, a).exists(_ > threshold))
  }
  private case class PBucketSort(name: String, sortCol: Option[String],
                                 desc: Boolean, size: Option[Int]) extends Pipe {
    // sorts on the (unique) bucket key, or on a sibling pipe column with
    // the key as tie-break (the engine documents the deterministic
    // tie-break; ES's heap breaks ties arbitrarily)
    def deps = sortCol.toSeq
    def json = {
      val sz = size.map(n => s""", "size": $n""").getOrElse("")
      val f = sortCol.getOrElse("key")
      s""""$name": {"bucket_sort": {"sort": [{"$f": {"order": "${if (desc) "desc" else "asc"}"}}]$sz}}"""
    }
    def apply(bs: Seq[Bucket]) = {
      def prim(b: Bucket) = sortCol.map(c => b.cols(c).get).getOrElse(b.key.toDouble)
      val s = bs.sortBy(b => (if (desc) -prim(b) else prim(b), b.key))
      size.fold(s)(s.take)
    }
  }

  // ---- generators ------------------------------------------------------
  private def pipeGen(idx: Int, paths: Seq[String]): Gen[Pipe] = {
    val nm = s"p$idx"
    val pathG = Gen.oneOf(paths)
    Gen.frequency[Pipe](
      1 -> pathG.map(PCumSum(nm, _)),
      1 -> pathG.map(PDeriv(nm, _)),
      2 -> (for { p <- pathG; l <- Gen.chooseNum(1, 3) } yield PSerialDiff(nm, p, l)),
      3 -> (for {
        p <- pathG
        w <- Gen.chooseNum(2, 4)
        model <- Gen.oneOf("simple", "linear", "ewma")
        a <- Gen.oneOf(0.3, 0.5)
      } yield PMovAvg(nm, p, w, model, a)),
      3 -> (for {
        p <- pathG
        w <- Gen.chooseNum(1, 4)
        sh <- Gen.oneOf(0, 0, 1, 2)
        fn <- Gen.oneOf("max", "min", "sum", "unweightedAvg", "stdDev")
      } yield PMovFn(nm, p, w, sh, fn)),
      // the division form divides by _count only (never 0): a 0-valued
      // metric divisor trips Spark's ANSI DIVIDE_BY_ZERO — a loud runtime
      // reject the engine accepts as its contract (painless doubles are
      // IEEE there; Infinity buckets are garbage either way)
      2 -> (for { a <- pathG; f <- Gen.oneOf("A / B + 1", "A * 2 - B")
                  b <- if (f == "A / B + 1") Gen.const("_count") else pathG }
        yield PScript(nm, a, b, f)),
      1 -> (for { a <- pathG; t <- Gen.oneOf(2.0, 5.0, 40.0) } yield PSelector(nm, a, t)),
      1 -> (for { d <- Gen.oneOf(true, false); sz <- Gen.option(Gen.chooseNum(2, 6)) }
        yield PBucketSort(nm, None, d, sz)))
  }

  private case class PipeBody(iv: Long, metric: Option[(String, String)], pipes: Seq[Pipe]) {
    def json = {
      val metricJson = metric.map { case (nm, kind) =>
        s""""$nm": {"$kind": {"field": "m"}}""" }.toSeq
      val subs = (metricJson ++ pipes.map(_.json)).mkString(", ")
      s"""{"aggs": {"h": {"histogram": {"field": "n", "interval": $iv},
         | "aggs": {$subs}}}}""".stripMargin
    }
    // ES contract (AggregatorFactories.Builder#resolvePipelineAggregator-
    // Order, mirrored by the engine): sibling pipes execute in DECLARATION
    // order after a stable DFS resolves buckets_path dependencies first;
    // each pipe reduces the CURRENT bucket list — a selector ordered
    // before a value pipe shrinks the series it windows over, a
    // bucket_sort reorders/truncates the list later pipes iterate
    def eval: Seq[Bucket] = {
      val byName = pipes.map(p => p.name -> p).toMap
      val done = scala.collection.mutable.LinkedHashSet.empty[String]
      def visit(p: Pipe): Unit = if (!done.contains(p.name)) {
        p.deps.filter(byName.contains).foreach(d => visit(byName(d)))
        done += p.name
      }
      pipes.foreach(visit)
      done.toSeq.map(byName).foldLeft(baseBuckets(iv, metric))((bs, p) => p.apply(bs))
    }
  }

  private def bodyGen: Gen[PipeBody] = Gen.frequency(
    9 -> (for {
      iv <- Gen.oneOf(20L, 25L, 50L)
      metric <- Gen.option(Gen.oneOf("sum", "avg", "min", "max").map(k => ("met", k)))
      base = metric.map(_._1).toSeq :+ "_count"
      p1 <- pipeGen(1, base)
      // a second pipe may CHAIN on the first's output column (unless the
      // first reorders/filters the frame, where ES wouldn't expose a value)
      more <- Gen.frequency(
        2 -> Gen.const(Seq.empty[Pipe]),
        3 -> pipeGen(2, base ++ (p1 match {
          case _: PSelector | _: PBucketSort => Nil
          case _ => Seq(p1.name)
        })).map(Seq(_)))
    } yield PipeBody(iv, metric, p1 +: more)),
    // dependency-INVERTED declaration: a bucket_sort declared FIRST whose
    // sort path references a pipe declared AFTER it — the topo resolver
    // must order the cumulative_sum before the sort (cum_sum: total on
    // every bucket, so the sort key is never null on either side)
    1 -> (for {
      iv <- Gen.oneOf(20L, 25L, 50L)
      d <- Gen.oneOf(true, false)
      sz <- Gen.option(Gen.chooseNum(2, 6))
    } yield PipeBody(iv, None,
      Seq(PBucketSort("p1", Some("p2"), d, sz), PCumSum("p2", "_count")))))

  // ---- the differential -------------------------------------------------
  test("parent pipelines: 200 generated chains answer-match the list-fold twin") {
    val d = docsDf.cache()
    val bodies = Gen.listOfN(200, bodyGen)
      .pureApply(Gen.Parameters.default, Seed(160816003L))
    try {
      bodies.zipWithIndex.foreach { case (body, i) =>
        val out = graft.dsl.EsQueryJson.aggregations(d, body.json)("h")
        val cols = out.columns
        val got = out.collect().map { r =>
          cols.zipWithIndex.map { case (c, j) =>
            c -> (if (r.isNullAt(j)) None else Some(r.get(j) match {
              case l: Long => l.toDouble
              case x: Double => x
              case other => sys.error(s"unexpected col type: $other")
            }))
          }.toMap
        }.toSeq
        val want = body.eval.map(b =>
          b.cols + ("key" -> Some(b.key.toDouble)))
        val ok = got.size == want.size && got.zip(want).forall { case (g, w) =>
          w.forall { case (c, wv) =>
            val gv = g.getOrElse(c, sys.error(s"missing col $c in ${g.keys}"))
            (gv, wv) match {
              case (None, None) => true
              case (Some(a), Some(b)) => math.abs(a - b) <= 5e-6
              case _ => false
            }
          }
        }
        assert(ok, s"pipe $i diverges: ${body.json}\n got: ${got.take(6)}\nwant: ${want.take(6)}")
      }
    } finally { d.unpersist(); () }
  }

  test("sibling pipelines: 60 generated scalars answer-match the twin") {
    val d = docsDf.cache()
    val gen = for {
      iv <- Gen.oneOf(20L, 25L, 50L)
      mk <- Gen.oneOf("sum", "avg", "min", "max")
      sk <- Gen.oneOf("avg_bucket", "sum_bucket", "min_bucket", "max_bucket", "stats_bucket")
      onCount <- Gen.oneOf(true, false)
    } yield (iv, mk, sk, onCount)
    val bodies = Gen.listOfN(60, gen).pureApply(Gen.Parameters.default, Seed(160816004L))
    try {
      bodies.zipWithIndex.foreach { case ((iv, mk, sk, onCount), i) =>
        val path = if (onCount) "_count" else "met"
        val json =
          s"""{"aggs": {"h": {"histogram": {"field": "n", "interval": $iv},
             |   "aggs": {"met": {"$mk": {"field": "m"}}}},
             | "s": {"$sk": {"buckets_path": "h>$path"}}}}""".stripMargin
        val out = graft.dsl.EsQueryJson.aggregations(d, json)("s").collect().head
        val vals = baseBuckets(iv, Some(("met", mk))).flatMap(pathOf(_, path))
        sk match {
          case "avg_bucket" =>
            assert(math.abs(out.getDouble(0) - round(vals.sum / vals.size, 6)) <= 5e-6, s"sib $i avg")
          case "sum_bucket" =>
            assert(math.abs(out.getDouble(0) - round(vals.sum, 4)) <= 5e-6, s"sib $i sum")
          case "min_bucket" =>
            assert(math.abs(out.getDouble(0) - round(vals.min, 4)) <= 5e-6, s"sib $i min")
          case "max_bucket" =>
            assert(math.abs(out.getDouble(0) - round(vals.max, 4)) <= 5e-6, s"sib $i max")
          case "stats_bucket" =>
            val m = out.getValuesMap[Any](out.schema.fieldNames)
            assert(m("count") == vals.size.toLong, s"sib $i stats count")
            assert(math.abs(m("sum").asInstanceOf[Double] - round(vals.sum, 4)) <= 5e-6, s"sib $i stats sum")
            assert(math.abs(m("avg").asInstanceOf[Double] - round(vals.sum / vals.size, 6)) <= 5e-6, s"sib $i stats avg")
            // stats_bucket min/max round to 4 dp (the engine's documented
            // metric rounding) — a 6-dp avg metric input makes this visible
            assert(math.abs(m("min").asInstanceOf[Double] - round(vals.min, 4)) <= 5e-6, s"sib $i stats min")
            assert(math.abs(m("max").asInstanceOf[Double] - round(vals.max, 4)) <= 5e-6, s"sib $i stats max")
        }
      }
    } finally { d.unpersist(); () }
  }
}
