package graft

import graft.ext.{Corpus, Dedup, Similarity, Sketch, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 additions: sketches (Bloom, Count-Min), domain quota,
  * encoding-damage triage, JL projection, quality-canonical dedup keeper,
  * `_reindex`, and the masked cross-field span. Oracle rows cover the
  * corpus-level numbers; these specs pin the semantic contracts (one-sided
  * error, partitioning invariance, tie orders, conflict modes). */
class SketchOpsSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sp = spark

  test("bloom contamination: no false negatives on shared grams") {
    import sp.implicits._
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (2L, "alpha beta gamma delta trailing words here"),
      (3L, "totally different words with no shared grams at all")).toDF("doc_id", "text")
    val words = Sketch.bloomBuild(bench, col("text"), nGram = 4, mBits = 4096, k = 3)
    val out = Sketch.bloomContamination(corpus, col("doc_id"), col("text"),
        words, nGram = 4, k = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(2L), "doc sharing a benchmark 4-gram must flag — bloom error is one-sided")
  }

  test("cms heavy hitters: estimates one-sided, collisions visible at tiny w") {
    import sp.implicits._
    val docs = Seq((1L,
      "a a a b b c d e f g h i j k l m n o p q r s t u v w x y z aa bb cc"))
      .toDF("doc_id", "text")
    val hh = Sketch.cmsHeavyHitters(docs, col("text"), d = 2, w = 4, topK = 40).collect()
    assert(hh.nonEmpty)
    hh.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS estimate must upper-bound the true count: $r"))
    assert(hh.exists(r => r.getLong(2) > r.getLong(1)),
      "w=4 over a 29-token vocab must collide somewhere")
  }

  test("domainCap: global top-cap per domain, invariant to input partitioning") {
    import sp.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"d${i % 3}", i * 37 % 11)).toDF("id", "dom", "q0")
    def run(parts: Int) =
      Corpus.domainCap(df.repartition(parts), col("id"), col("dom"), col("q0"), cap = 4)
        .select("doc_id", "domain", "rn").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val one = run(1)
    assert(one == run(7), "two-phase prune must not depend on partitioning")
    assert(one.size == 12, "3 domains x cap 4")
  }

  test("encodingDamage: damage counts and token entropy") {
    import sp.implicits._
    val docs = Seq(
      (1L, "x \uFFFD y \u0001 z"),
      (2L, "a a a a"),
      (3L, "a b")).toDF("doc_id", "text")
    val m = TextAnalysis.encodingDamage(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getInt(1) == 1 && m(1L).getInt(2) == 1 && m(1L).getBoolean(4))
    assert(m(2L).getDouble(3) == 0.0 && !m(2L).getBoolean(4),
      "single-token-type doc has zero entropy (and +0.0, not -0.0)")
    assert(m(3L).getDouble(3) == 1.0, "two equiprobable tokens = 1 bit")
  }

  test("jlProject: deterministic sign matrix, exact per-component dots") {
    import sp.implicits._
    val signs = Similarity.jlSigns(4, 2)
    assert(signs == Similarity.jlSigns(4, 2))
    assert(signs.flatten.forall(s => s == 1 || s == -1))
    val vecs = Seq((1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(1f, 2f, 3f, 4f)))
      .toDF("vec_id", "embedding")
    val p = Similarity.jlProject(vecs, col("vec_id"), col("embedding"), signs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p(1L) == p(2L) && p(1L).length == 2)
    val expected = signs.map(row => row.zip(Seq(1d, 2d, 3d, 4d)).map { case (s, v) => s * v }.sum)
    assert(p(1L) == expected)
  }

  test("whitening: correlated dims decorrelate to unit variance, mean removed") {
    import sp.implicits._
    // 2-d vectors with strong correlation and wildly different scales
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 400).map { i =>
      val a = rnd.nextGaussian() * 10 + 5
      val b = 0.9 * a + rnd.nextGaussian() * 0.1 - 2
      (i.toLong, Seq(a, b))
    }.toDF("vec_id", "v")
    val (mu, w) = Similarity.whitenFit(vecs, col("v"), dim = 2)
    val white = Similarity.whitenApply(vecs, col("vec_id"), col("v"), mu, w)
    val g = white.agg(
      avg(element_at(col("white"), 1)).as("m0"),
      avg(element_at(col("white"), 2)).as("m1"),
      avg(element_at(col("white"), 1) * element_at(col("white"), 1)).as("v00"),
      avg(element_at(col("white"), 1) * element_at(col("white"), 2)).as("v01"),
      avg(element_at(col("white"), 2) * element_at(col("white"), 2)).as("v11"))
      .collect().head
    assert(math.abs(g.getDouble(0)) < 1e-9 && math.abs(g.getDouble(1)) < 1e-9,
      "whitened mean is zero")
    // the ridge (1e-6) costs lambda/sigma^2 on a tiny-residual dim, so
    // the bound is the gate's 1e-3, not machine epsilon
    assert(math.abs(g.getDouble(2) - 1) < 1e-3 && math.abs(g.getDouble(4) - 1) < 1e-3,
      "unit variance per dim")
    assert(math.abs(g.getDouble(3)) < 1e-3, "correlation removed")
    // the gate frame reports all-TRUE on this data
    val gate = Similarity.whitenGate(vecs, col("vec_id"), col("v"), dim = 2)
      .collect().map(_.getBoolean(2))
    assert(gate.length == 3 && gate.forall(identity))
  }

  test("canonicalByQuality: highest rank wins, ties to lowest id, singletons self-keep") {
    import sp.implicits._
    val docs = Seq((1L, 5), (2L, 9), (3L, 9), (4L, 7)).toDF("doc_id", "q0")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.canonicalByQuality(docs, col("doc_id"), pairs, col("q0"))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).toSet
    assert(out == Set((1L, 2L, false), (2L, 2L, true), (3L, 2L, false), (4L, 4L, true)))
  }

  test("reindex: index overwrites on conflict; create+proceed keeps existing; create alone rejected") {
    import sp.implicits._
    val src = Seq((1L, "n1"), (2L, "n2")).toDF("id", "v")
    val dst = Seq((1L, "o1"), (3L, "o3")).toDF("id", "v")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(asMap(graft.dsl.EsQueryJson.reindex(src, dst, "{}")) ==
      Map(1L -> "n1", 2L -> "n2", 3L -> "o3"))
    assert(asMap(graft.dsl.EsQueryJson.reindex(src, dst,
      """{"conflicts": "proceed", "dest": {"op_type": "create"}}""")) ==
      Map(1L -> "o1", 2L -> "n2", 3L -> "o3"))
    intercept[IllegalArgumentException] {
      graft.dsl.EsQueryJson.reindex(src, dst, """{"dest": {"op_type": "create"}}""")
    }
  }

  test("htmlStrip: script blocks vanish, tags become spaces, &amp; decodes last") {
    import sp.implicits._
    val df = Seq((1L,
      "<p>a &amp;lt; b</p><script>drop tables</script><a href=\"x\">link</a> &nbsp;&gt;end"))
      .toDF("id", "h")
    val out = df.select(TextAnalysis.htmlStrip($"h")).collect().head.getString(0)
    assert(!out.contains("drop"), "script CONTENT must be stripped, not just the tags")
    assert(out.contains("a &lt; b"), "&amp;lt; must decode to the literal '&lt;' — never twice")
    assert(out.contains(">end") && out.contains("link"))
  }

  test("analyzeApi: simple splits digits, stop preserves position increments, pattern splits on the regex") {
    import sp.implicits._
    val df = Seq((1L, "The X11 and b2b")).toDF("doc_id", "text")
    def toks(an: String, pat: String = "\\W+") =
      graft.dsl.EsDsl.analyzeApi(df, col("doc_id"), col("text"), an, pattern = pat)
        .orderBy("position").collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(toks("simple") == Seq(0 -> "the", 1 -> "x", 2 -> "and", 3 -> "b", 4 -> "b"),
      "simple tokenizes on non-LETTERS: digits split")
    assert(toks("stop") == Seq(1 -> "x", 3 -> "b", 4 -> "b"),
      "stop removes stopwords but keeps the pre-filter positions")
    assert(toks("pattern", pat = "[0-9]+") == Seq(0 -> "the x", 1 -> " and b", 2 -> "b"),
      "pattern splits on the given regex, lowercased")
  }

  test("keyword sub-field: term on .keyword is whole-string, match on base is analyzed") {
    import sp.implicits._
    val df = Seq((1L, "big data"), (2L, "data big"), (3L, "small data")).toDF("doc_id", "cat")
    def ids(body: String) = graft.dsl.EsQueryJson.search(df, body)
      .collect().map(_.getLong(0)).toSet
    assert(ids("""{"query": {"term": {"cat.keyword": "big data"}}, "sort": ["doc_id"]}""") == Set(1L))
    assert(ids("""{"query": {"match": {"cat": "big"}}, "sort": ["doc_id"]}""") == Set(1L, 2L))
  }

  test("silhouette: separated clusters score high, boundary vector scores low") {
    import sp.implicits._
    val vecs = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0.1f, 0f)),   // cluster A
      (3L, Seq(10f, 0f)), (4L, Seq(10.1f, 0f)), // cluster B
      (5L, Seq(5f, 0f))                          // boundary
    ).toDF("vec_id", "embedding")
    val cents = Seq((1, Seq(0.05d, 0d)), (2, Seq(10.05d, 0d))).toDF("cluster", "centroid")
    val clean = Similarity.silhouette(vecs.filter(col("vec_id") <= 4),
        col("vec_id"), col("embedding"), cents)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(clean(1) > 0.9 && clean(2) > 0.9, s"tight clusters must score high: $clean")
    // the boundary vector (s ≈ 0.02) joins cluster 1 and drags its mean down
    val all = Similarity.silhouette(vecs, col("vec_id"), col("embedding"), cents)
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(all(1)._1 + all(2)._1 == 5L)
    assert(all(1)._2 < all(2)._2, "boundary vector must lower its cluster's mean")
  }

  test("contaminationRuns: a shared 6-token span reports one run of 3 grams") {
    import sp.implicits._
    val bench = Seq((100L, "aa bb cc dd ee ff")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx yy aa bb cc dd ee ff zz"), // consecutive 6-token overlap
      (2L, "aa bb cc dd qq qq cc dd ee ff"), // two separated runs of 1
      (3L, "nothing shared here at all ok")).toDF("doc_id", "text")
    val out = graft.ext.Corpus.contaminationRuns(corpus, col("doc_id"), col("text"),
        bench, col("text"), nGram = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 3L, 6L)), "3 consecutive grams = one 6-token span")
    assert(out(2L) == ((2L, 1L, 4L)), "two scattered hits never merge into a run")
    assert(!out.contains(3L), "clean docs emit nothing")
  }

  test("termsAggWithError: bound brackets the exact count; full shard lists give zero error") {
    import sp.implicits._
    val df = (1 to 300).map(i => (i.toLong, s"k${i % 7}")).toDF("id", "key0")
    val exact = df.groupBy("key0").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.dsl.EsDsl.termsAggWithError(df, col("key0"), col("id"),
        size = 7, shardSize = 3, shards = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(approx.nonEmpty)
    approx.foreach { case (k, dc, err) =>
      assert(dc <= exact(k), s"reported count can only under-count: $k")
      assert(exact(k) <= dc + err, s"the bound must cover the hidden mass: $k $dc+$err < ${exact(k)}")
    }
    // shard_size covering every key => exact counts, zero bound
    val full = graft.dsl.EsDsl.termsAggWithError(df, col("key0"), col("id"),
        size = 7, shardSize = 7, shards = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    full.foreach { case (k, dc, err) => assert(dc == exact(k) && err == 0L) }
  }

  test("plan shapes: bloom probe and feature-hash are fully narrow; domain cap never cartesian") {
    import sp.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val words = new Array[Long](64)
    val bloomPlan = Sketch.bloomContamination(docs, col("doc_id"), col("text"),
      words, nGram = 4, k = 3).queryExecution.executedPlan.toString
    assert(!bloomPlan.contains("Exchange"),
      "bloom probe must stay narrow — the filter broadcasts inside the expression")
    val fhPlan = TextAnalysis.featureHashVectors(docs, col("doc_id"), col("text"), 16)
      .queryExecution.executedPlan.toString
    assert(!fhPlan.contains("Exchange"),
      "feature-hash vectors are one compiled in-row pass")
    val entPlan = TextAnalysis.encodingDamage(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!entPlan.contains("Exchange"), "encoding-damage is per-row kernels only")
    val dcPlan = graft.ext.Corpus.domainCap(docs.withColumn("dom", lit("d")),
      col("doc_id"), col("dom"), col("doc_id"), cap = 2)
      .queryExecution.executedPlan.toString
    assert(!dcPlan.contains("CartesianProduct") && !dcPlan.contains("BroadcastNestedLoop"),
      "domain cap is windows over hash exchanges, never a product")
  }

  test("video demux: frame slicing is exact, bad magic isolates, statics repeat frame 0") {
    import sp.implicits._
    implicit val s2: org.apache.spark.sql.SparkSession = sp
    val vids = graft.multimodal.Multimodal.encodeTestVideos(Seq(5L).toDF("doc_id"))
    val frames = graft.multimodal.Multimodal.videoFrames(vids)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getInt(3), r.getInt(4))).toMap
    // id=5: w=2 (5%5+2), h=5 ((5*3)%4+2), n=8 — frame 4 repeats frame 0
    assert(frames.size == 8)
    assert(frames(4) == frames(0), "every 4th frame is the static repeat of frame 0")
    assert(frames(1) != frames(0))
    // analytic ground truth for frame 1 over the 2×5 pattern
    val expected = (0 until 5).flatMap(y => (0 until 2).map(x =>
      ((5L * 31 + 7 + x * 11 + y * 13) % 256).toInt))
    assert(frames(1)._1 == expected.sum.toLong &&
      frames(1)._2 == expected.min && frames(1)._3 == expected.max)
    val junk = Seq((9L, Array[Byte]('X', 'X', 'X', 'X', 1, 1, 1))).toDF("doc_id", "payload")
    assert(graft.multimodal.Multimodal.videoFrames(junk).count() == 0,
      "unrecognized magic yields no rows (per-row isolation)")
  }

  test("multi_match ^boost: field score scales before the type combine") {
    import sp.implicits._
    val df = Seq(
      (1L, "spark", "other"),   // hits in a only
      (2L, "other", "spark")    // hits in b only
    ).toDF("doc_id", "a", "b")
    def scores(fields: String) = graft.dsl.EsQueryJson.search(df,
      s"""{"query": {"multi_match": {"query": "spark", "fields": [$fields]}},
         | "sort": ["_score", "doc_id"]}""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("_score"))).toMap
    val plain = scores("\"a\", \"b\"")
    val boosted = scores("\"a^3\", \"b\"")
    assert(plain(1L) == plain(2L), "symmetric fixture scores equal unboosted")
    assert(math.abs(boosted(1L) - 3 * plain(1L)) < 5e-6, "a^3 triples the a-field score")
    assert(boosted(2L) == plain(2L), "unboosted field unchanged")
    intercept[IllegalArgumentException] {
      graft.dsl.EsQueryJson.search(df,
        """{"query": {"multi_match": {"query": "spark", "fields": ["a^2", "b"],
          |   "type": "cross_fields"}}, "sort": ["_score", "doc_id"]}""".stripMargin).collect()
    }
  }

  test("field_masking_span: slop + order across parallel token streams") {
    import sp.implicits._
    val df = Seq(
      (1L, "spark x data", "w w ent"),
      (2L, "data x spark", "ent w w"),
      (3L, "spark x y z data", "w w w w ent")).toDF("doc_id", "text", "tags")
    def hits(slop: Int, inOrder: Boolean) = graft.dsl.EsQueryJson.search(df,
      s"""{"query": {"span_near": {"clauses": [
         |   {"span_term": {"text": "spark"}},
         |   {"field_masking_span": {"query": {"span_term": {"tags": "ent"}}, "field": "text"}}],
         | "slop": $slop, "in_order": $inOrder}},
         | "sort": ["doc_id"], "_source": ["doc_id"]}""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(hits(1, inOrder = true) == Set(1L))
    assert(hits(1, inOrder = false) == Set(1L, 2L))
    assert(hits(3, inOrder = true) == Set(1L, 3L))
  }

  test("dHash: invariant under monotone tone mapping where aHash flips") {
    import sp.implicits._
    implicit val s2: org.apache.spark.sql.SparkSession = sp
    def png(f: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        val g = f((x * 29 + y * 53) % 200 + 20)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val gamma = (g: Int) => g * g / 255 // strictly monotone tone curve
    val df = Seq((1L, png(identity)), (2L, png(gamma))).toDF("doc_id", "payload")
    val dh = graft.multimodal.Multimodal.imageDHash(df)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(dh(1L) == dh(2L),
      "adjacent-pixel gradients survive any strictly monotone tone map")
    val ah = graft.multimodal.Multimodal.imageAHash(df)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(ah(1L) != ah(2L),
      "the mean threshold moves non-linearly under the same tone map")
  }

  test("fold-based event ops are invariant to input partitioning") {
    import sp.implicits._
    def t(m: Int) = new java.sql.Timestamp(m * 60000L)
    val rnd = new scala.util.Random(11)
    val events = (1 to 400).map { i =>
      (i.toLong, t(rnd.nextInt(5000)), rnd.nextInt(20).toLong,
        Seq("signup", "view", "click", "purchase")(rnd.nextInt(4)), rnd.nextDouble())
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    def all(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    for (parts <- Seq(1, 13)) {
      val e = events.repartition(parts)
      assert(all(ext.Sessionize.funnel(e, Seq("signup", "view", "purchase"),
        Some(36000L))) == all(ext.Sessionize.funnel(events,
        Seq("signup", "view", "purchase"), Some(36000L))))
      assert(all(ext.Sessionize.eventTransitions(e)) ==
        all(ext.Sessionize.eventTransitions(events)))
      assert(all(ext.Sessionize.topPaths(e)) == all(ext.Sessionize.topPaths(events)))
      assert(all(ext.Sessionize.rfmSegments(e, col("value"))) ==
        all(ext.Sessionize.rfmSegments(events, col("value"))))
    }
    // CDC admission likewise (chunking is per-row; the join must not care)
    val docs = (1 to 60).map(i => (i.toLong, s"w${i % 7} " * 30)).toDF("doc_id", "text")
    def adm(df: org.apache.spark.sql.DataFrame) =
      all(Dedup.cdcIncrementalAdmission(df.filter(col("doc_id") % 2 === 0),
        df.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"), p = 7))
    assert(adm(docs.repartition(9)) == adm(docs))
  }

  test("theta sketches: partitioning-invariant; exact when the set fits") {
    import sp.implicits._
    val rnd = new scala.util.Random(9)
    val rows = (1 to 3000).map(_ => (s"s${rnd.nextInt(4)}", s"e${rnd.nextInt(800)}"))
      .toDF("src", "elem")
    def all(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    val base = Sketch.thetaIntersections(
      Sketch.thetaSketches(rows, col("src"), col("elem"), k = 64), k = 64)
    for (parts <- Seq(1, 17)) {
      val got = Sketch.thetaIntersections(
        Sketch.thetaSketches(rows.repartition(parts), col("src"), col("elem"), k = 64), k = 64)
      assert(all(got) == all(base), s"two-phase k-smallest must not depend on partitioning ($parts)")
    }
    // sets below k: theta = 1.0 and the estimate IS the exact intersection
    val tiny = Seq(("a", "x"), ("a", "y"), ("a", "z"), ("b", "y"), ("b", "z"), ("b", "w"))
      .toDF("src", "elem")
    val est = Sketch.thetaIntersections(
      Sketch.thetaSketches(tiny, col("src"), col("elem"), k = 64), k = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(est.toSeq == Seq(("a", "b", 2L, 2.0)))
  }

  test("hdr sketch tables: any split merges losslessly; estimates match one-shot") {
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val vals = (1 to 5000).map(_ => (rnd.nextInt(10).toLong, // arbitrary split key
      (math.exp(rnd.nextDouble() * 12) + 1).toLong)).toDF("part", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val oneshot = Sketch.hdrHistogram(vals, Seq.empty, col("v"))
    val merged = Sketch.hdrMerge(Sketch.hdrHistogram(vals, Seq(col("part")), col("v")))
    assert(rows(merged) == rows(oneshot), "bucket-wise count addition must be exact")
    assert(rows(Sketch.hdrPercentiles(merged, Seq(0.5, 0.9))) ==
      rows(Sketch.hdrPercentiles(oneshot, Seq(0.5, 0.9))))
    // the k-bit bucket keeps relative error < 2^-(k-1): rep/bmin bracket v
    val est = Sketch.hdrPercentiles(oneshot, Seq(0.5)).collect().head
    assert(est.getAs[Long]("v_est") >= est.getAs[Long]("v_bmin"))
    assert(est.getAs[Long]("v_est") - est.getAs[Long]("v_bmin") + 1 <=
      math.max(1L, est.getAs[Long]("v_bmin") / 128L + 1))
  }

  test("CachedFrames.clear unpersists the frames long-lived operators persist") {
    import sp.implicits._
    val before = sp.sparkContext.getPersistentRDDs.keySet
    val docs = Seq((1L, "a a b c"), (2L, "b c d e")).toDF("doc_id", "text")
    Sketch.cmsHeavyHitters(docs, col("text"), d = 2, w = 8, topK = 5).collect()
    val added = sp.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "cmsHeavyHitters persists its counts frame")
    graft.CachedFrames.clear()
    val after = sp.sparkContext.getPersistentRDDs.keySet
    assert(added.forall(id => !after.contains(id)),
      s"tracked frames must unpersist on clear(): still cached $added")
  }

  test("vocab rank ops: every Window is partitioned, result partitioning-invariant") {
    import sp.implicits._
    val rnd = new scala.util.Random(12)
    val docs = (1 to 200).map { i =>
      (i.toLong, (1 to 40).map(_ => s"w${rnd.nextInt(120)}").mkString(" "))
    }.toDF("doc_id", "text")
    def all(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    for (df <- Seq(TextAnalysis.vocabCoverage(docs, col("text"), Seq(5, 50, 100)),
                   TextAnalysis.zipfSlope(docs, col("text")))) {
      // sparkPlan, not executedPlan: AQE hides the tree pre-execution
      val wins = df.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty, "prefix-sum form still uses intra-partition windows")
      wins.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"unpartitioned Window (single-partition funnel) in plan: $w"))
    }
    for (parts <- Seq(1, 17)) {
      val d = docs.repartition(parts)
      assert(all(TextAnalysis.vocabCoverage(d, col("text"), Seq(5, 50, 100))) ==
        all(TextAnalysis.vocabCoverage(docs, col("text"), Seq(5, 50, 100))))
      assert(all(TextAnalysis.zipfSlope(d, col("text"))) ==
        all(TextAnalysis.zipfSlope(docs, col("text"))))
    }
  }

  test("rfm: cutoff-based scores, no rank window in the plan") {
    import sp.implicits._
    def t(m: Int) = new java.sql.Timestamp(m * 60000L)
    // 10 users with strictly increasing recency/frequency/monetary
    val events = (1 to 10).flatMap { u =>
      (1 to u).map(k => (u.toLong * 100 + k, t(u * 10 + k), u.toLong, u * 10.0))
    }.toDF("event_id", "ts", "user_id", "value")
    val out = ext.Sessionize.rfmSegments(events, col("value"))
    // the whole point: no ntile/rank window anywhere — cutoffs broadcast
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "RFM must assign by quantile cutoffs, not a global rank window")
    val segs = out.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(segs.values.sum == 10)
    // user 10 (most events, latest, highest value) lands in 555; user 1
    // (single old cheap event) in 111
    assert(segs.contains(555) && segs.contains(111), s"got $segs")
  }

  test("funnel: greedy first-match, order matters, late first-match kills") {
    import sp.implicits._
    def t(m: Int) = new java.sql.Timestamp(m * 60000L)
    val events = Seq(
      // user 1: full funnel in order, within windows
      (1L, t(0), "signup"), (1L, t(5), "view"), (1L, t(10), "purchase"),
      // user 2: view BEFORE signup doesn't count; no view after -> stage 1
      (2L, t(0), "view"), (2L, t(5), "signup"), (2L, t(10), "purchase"),
      // user 3: first view after signup is LATE (dead), an on-time
      // purchase later must NOT resurrect the funnel
      (3L, t(0), "signup"), (3L, t(120), "view"), (3L, t(125), "purchase"),
      // user 4: no funnel event types at all -> absent from the report
      (4L, t(0), "error")
    ).toDF("user_id", "ts", "event_type")
    val out = ext.Sessionize.funnel(events, Seq("signup", "view", "purchase"),
        withinSeconds = Some(3600L))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(3 -> 1L, 1 -> 2L), // user1 converts; users 2 and 3 stop at stage 1
      s"got $out")
    // without a window, user 3's late view counts
    val noWin = ext.Sessionize.funnel(events, Seq("signup", "view", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(noWin == Map(3 -> 2L, 1 -> 1L), s"got $noWin")
  }

  test("cohort retention + transitions: exact week offsets, row-ordered pairs") {
    import sp.implicits._
    def t(d: Int, h: Int = 0) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // 2024-01-01 is a Monday: users 1,2 cohort week 0; user 3 cohort week 1
    val events = Seq(
      (1L, t(1), 1L, "view"), (2L, t(2), 1L, "click"),   // u1 active wk0
      (3L, t(9), 1L, "view"),                             // u1 active wk1
      (4L, t(3), 2L, "view"),                             // u2 wk0 only
      (5L, t(8), 3L, "view"), (6L, t(16), 3L, "click")    // u3 wk1, wk2
    ).toDF("event_id", "ts", "user_id", "event_type")
    val ret = ext.Sessionize.cohortRetention(events)
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1), r.getLong(2))).toSet
    assert(ret == Set(("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
    val tr = ext.Sessionize.eventTransitions(events)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // u1: view->click->view ; u3: view->click
    assert(tr == Map(("view", "click") -> ((2L, 1.0)), ("click", "view") -> ((1L, 1.0))))
  }

  test("cdc admission: duplicate refused at 1.0, novel admitted at 0.0") {
    import sp.implicits._
    val standing = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup
      (20L, "completely novel words nowhere else observed")).toDF("doc_id", "text")
    val out = Dedup.cdcIncrementalAdmission(standing, incoming,
        col("doc_id"), col("text"), p = 7)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(10L) == ((1.0, false)), "byte-identical doc shares every chunk")
    assert(out(20L) == ((0.0, true)), "novel doc shares none")
  }

  test("video keyframes: frame 0 opens scene 0, cut rule is exact-integer") {
    import sp.implicits._
    implicit val s2: org.apache.spark.sql.SparkSession = sp
    val vids = graft.multimodal.Multimodal.encodeTestVideos(Seq(5L, 7L).toDF("doc_id"))
    val kf = graft.multimodal.Multimodal.videoKeyframes(vids)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byDoc = kf.groupBy(_._1)
    // frame 0 is always a keyframe and always scene 0
    assert(byDoc.values.forall(_.exists(t => t._2 == 0 && t._3 == 0)))
    // scene indices are consecutive from 0 in frame order
    byDoc.values.foreach { ks =>
      assert(ks.sortBy(_._2).map(_._3).toSeq == ks.indices.toSeq)
    }
    // the cut rule replayed by hand from the analytic pixel formula
    def sums(id: Long): Map[Int, Long] = {
      val w = (id % 5 + 2).toInt; val h = ((id * 3) % 4 + 2).toInt; val n = (id % 9 + 3).toInt
      (0 until n).map { f =>
        val fe = if (f % 4 == 0) 0 else f
        f -> (for { y <- 0 until h; x <- 0 until w }
          yield (id * 31 + fe * 7 + x * 11 + y * 13) % 256).sum
      }.toMap
    }
    for (id <- Seq(5L, 7L)) {
      val s = sums(id)
      val w = (id % 5 + 2).toInt; val h = ((id * 3) % 4 + 2).toInt
      val expect = (0 until s.size).filter(f =>
        f == 0 || math.abs(s(f) - s(f - 1)) > 32L * w * h).toSet
      assert(byDoc(id).map(_._2).toSet == expect)
    }
  }

  test("CDC chunking: an insertion re-chunks only the chunk it lands in") {
    import sp.implicits._
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    // insert one token mid-document
    val edited = (1 to 80).map(i => if (i == 40) s"w$i INSERTED" else s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = df.select(col("doc_id"),
        graft.functions.TextKernels.cdcChunks(col("text"), 7).as("ch"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)).toList).toMap
    val a = chunks(1L); val b = chunks(2L)
    assert(a != b, "the edited chunk's fingerprint changes")
    // every chunk except the one containing the insertion is preserved —
    // fixed-size segmentation would shift everything after token 40
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.size >= a.size - 2,
      s"only the edited chunk (and at most a re-split neighbor) may change: " +
        s"${a.size} vs shared ${shared.size}")
    // chunk lengths sum to the token count
    val lens = df.filter(col("doc_id") === 1L).select(
        graft.functions.TextKernels.cdcChunks(col("text"), 7).as("ch"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0).map(_.getInt(1))
    assert(lens.sum == 80)
    // shared-run property: both docs contain tokens w50..w80 untouched,
    // so every chunk fully inside that run is byte-identical
    assert(shared.nonEmpty)
  }

  test("NFC normalize: composes decomposed sequences, idempotent, fast-path exact") {
    import sp.implicits._
    val dec = "caf" + "e\u0301" + " latte"  // decomposed: e + COMBINING ACUTE
    val comp = "caf\u00e9 latte"            // composed U+00E9
    val df = Seq((1L, dec), (2L, comp), (3L, "plain ascii")).toDF("id", "t")
    val out = df.select(col("id"), graft.functions.Normalize.nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == comp)
    assert(out(1L) == out(2L), "decomposed and composed normalize to the same bytes")
    assert(out(3L) == "plain ascii", "already-normalized text passes through")
    // idempotence
    val twice = df.select(graft.functions.Normalize.nfcNormalize(
      graft.functions.Normalize.nfcNormalize(col("t"))).as("n"))
      .collect().map(_.getString(0)).toSet
    assert(twice == out.values.toSet)
  }

  test("hdr buckets cover the full Long range: epoch-nano values land in real buckets") {
    import sp.implicits._
    // values with bit length > 55 used to index past the 0..47 shift
    // array and collapse into one NULL bucket silently (non-ANSI
    // element_at) — epoch-nanosecond latencies are exactly this range
    val nanos = Seq(1723700000000000000L, // ~2^60.6, a 2024 epoch-nano
      1723700001234567890L, 9223372036854775807L, // Long.MaxValue
      1L, 1000L).toDF("v")
    val hist = Sketch.hdrHistogram(nanos, Seq.empty, col("v")).collect()
    assert(hist.forall(r => !r.isNullAt(0) && !r.isNullAt(1)), s"null bucket: ${hist.toSeq}")
    assert(hist.map(_.getLong(2)).sum == 5L, "every value must be counted")
    hist.foreach { r =>
      assert(r.getLong(0) >= 1L && r.getLong(1) >= r.getLong(0),
        s"bucket [${r.getLong(0)}, ${r.getLong(1)}] must be a real range")
    }
    // relative error contract holds out there too: p50 brackets its value
    val est = Sketch.hdrPercentiles(Sketch.hdrHistogram(nanos, Seq.empty, col("v")),
      Seq(0.99)).collect().head
    assert(est.getAs[Long]("v_est") >= 9223372036854775807L / 256L * 255L,
      "p99 must land in Long.MaxValue's bucket")
    intercept[IllegalArgumentException] {
      Sketch.hdrHistogram(nanos, Seq.empty, col("v"), k = 0)
    }
  }

  test("bloom probes at k >= 9: h1 + j*h2 overflows Long; build == probe positions") {
    // Failure-point pin for the floorMod fix (TextKernels.scala:150): at
    // k = 10 the Kirsch–Mitzenmacher sum h1 + j·h2 (two ~2^60 draws)
    // exceeds Long.MaxValue for high j, wrapping negative. Both the
    // Column build side (Spark pmod of the wrapped sum) and the compiled
    // probe kernel (Math.floorMod) must land on the SAME bit — a
    // regression to `%` on either side breaks the one-sided-error
    // contract below. The fixture is chosen so overflow provably occurs
    // (asserted via an independent md5-60 reimplementation).
    import sp.implicits._
    val benchText = (1 to 40).map(i => s"tok$i").mkString(" ")
    val bench = Seq((1L, benchText)).toDF("doc_id", "text")
    val n = 4
    val k = 10
    def md560(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val grams = benchText.split(" ").sliding(n).map(_.mkString(" ")).toSeq
    val overflows = grams.exists { g =>
      val h1 = BigInt(md560(g)); val h2 = BigInt(md560("bloom2:" + g))
      (0 until k).exists(j => h1 + h2 * j > Long.MaxValue)
    }
    assert(overflows, "fixture must exercise the Long-overflow branch at k=10")
    val words = Sketch.bloomBuild(bench, col("text"), nGram = n, mBits = 4096, k = k)
    // every bench gram must hit its own filter through the probe KERNEL
    val out = Sketch.bloomContamination(bench, col("doc_id"), col("text"),
        words, nGram = n, k = k).collect().head
    assert(out.getAs[Int]("n_grams") == grams.distinct.size)
    assert(out.getAs[Int]("hit_grams") == out.getAs[Int]("n_grams"),
      "no false negatives: kernel probe positions must equal build positions at k=10")
    // and an independent reference probe (wrapped-Long floorMod — the
    // documented semantics both sides implement) agrees bit-for-bit
    grams.distinct.foreach { g =>
      val h1 = md560(g); val h2 = md560("bloom2:" + g)
      (0 until k).foreach { j =>
        val p = java.lang.Math.floorMod(h1 + j.toLong * h2, 4096L)
        assert((words((p >> 6).toInt) & (1L << (p & 63L).toInt)) != 0L,
          s"build must have set bit $p for gram '$g' probe $j")
      }
    }
  }
}
