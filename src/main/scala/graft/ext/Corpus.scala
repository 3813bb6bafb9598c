package graft.ext

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators of an LLM training-data pipeline, beyond
  * per-document scoring (TextAnalysis) and dedup (Dedup):
  *
  *  - repetition signals — the Gopher/C4-style within-document duplication
  *    fractions used to filter degenerate/boilerplate text;
  *  - deterministic stratified sampling — hash-Bernoulli per stratum, the
  *    reproducible way to hit data-mixing rates (no RNG state, any subset
  *    of the corpus resamples identically);
  *  - token-window chunking — context-window shaping with stride/overlap.
  *
  * Everything is narrow per-document expression work except the
  * top-token aggregation in [[repetitionSignals]] (two hash aggregations
  * sharing one shuffle, the tf-idf shape). All signals are deterministic,
  * so DuckDB oracles reproduce them exactly.
  */
object Corpus {

  /** Within-document repetition fractions:
    *  - `dup_tok_frac`: 1 − distinct/total tokens;
    *  - `dup_2gram_frac`: 1 − distinct/total word 2-grams (0 for <2 tokens);
    *  - `top_tok_frac`: share of the most frequent token.
    * High values mark degenerate/boilerplate documents (the Gopher quality
    * filter family). */
  def repetitionSignals(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    // ALL five counters (tokens, distinct tokens, 2-grams, distinct
    // 2-grams, top-token multiplicity) come from one tokenize pass
    // ([[graft.functions.TextKernels.RepetitionStatsKernel]]) — fully
    // narrow, no explode, no join. The HOF formulation re-ran interpreted
    // transform/filter chains per counter and joined an explode+agg for
    // the mode: ~29 s vs sub-second at sf0.1.
    val s = graft.functions.TextKernels.repetitionStats(text)
    df.select(idCol.as("doc_id"), s.as("_s"))
      .select(
        col("doc_id"),
        element_at(col("_s"), 1).as("n"),
        element_at(col("_s"), 2).as("nd"),
        element_at(col("_s"), 3).as("n2"),
        element_at(col("_s"), 4).as("nd2"),
        element_at(col("_s"), 5).as("top_c"))
      .select(
        col("doc_id"),
        col("n").as("n_tokens"),
        round(when(col("n") > 0, lit(1.0) - col("nd").cast("double") / col("n"))
          .otherwise(lit(0.0)), 6).as("dup_tok_frac"),
        round(when(col("n2") > 0, lit(1.0) - col("nd2").cast("double") / col("n2"))
          .otherwise(lit(0.0)), 6).as("dup_2gram_frac"),
        round(when(col("n") > 0, col("top_c").cast("double") / col("n"))
          .otherwise(lit(0.0)), 6).as("top_tok_frac"))
  }

  /** Deterministic stratified Bernoulli sample: keep a row iff
    * `md5_60(id) mod 1e6 < rate(stratum)·1e6`. Hash-based, so the sample is
    * reproducible row-by-row on any engine (the DuckDB oracle replays the
    * identical md5 arithmetic) and needs no RNG coordination across
    * executors — the property that matters when mixing 100 TB corpora to
    * target rates. Fully narrow: no shuffle, pushdown-friendly. */
  def stratifiedSample(df: DataFrame, idCol: Column, stratumCol: Column,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val h = pmod(Hashing.md5Long60(idCol.cast("string")), lit(1000000L))
    val threshold = rates.foldLeft(lit((defaultRate * 1e6).toLong)) {
      case (acc, (stratum, r)) =>
        when(stratumCol === stratum, lit((r * 1e6).toLong)).otherwise(acc)
    }
    df.filter(h < threshold)
  }

  /** Deterministic EXACT-k uniform sample: the k docs with the smallest
    * seeded md5 sampling keys. Complements [[stratifiedSample]] (rate-based,
    * approximate count) when a pipeline needs "exactly k docs" — e.g. a
    * fixed-size eval set. Top-k is a sort-limit (TakeOrdered: per-partition
    * heaps + one k-row merge on the driver side of the exchange), never a
    * global sort; no RNG, so re-runs and repartitioning cannot change the
    * sample. */
  def exactKSample(df: DataFrame, idCol: Column, k: Int,
                   seed: String = "sample"): DataFrame = {
    val key = Hashing.md5Long60(concat(lit(s"$seed:"), idCol.cast("string")))
    df.withColumn("_sk", key).orderBy(col("_sk"), idCol).limit(k).drop("_sk")
  }

  /** Deterministic train/validation/test split by id hash — the standard
    * leakage-safe corpus split (assignment is a pure function of the id:
    * stable under re-runs, re-partitioning, and incremental appends, and a
    * doc can never migrate between splits as the corpus grows). Returns
    * the per-(source, split) doc/token counts a pipeline records as its
    * split manifest. One narrow pass + one hash agg — 100 TB-sane. */
  def hashSplit(df: DataFrame, idCol: Column, sourceCol: Column, text: Column,
                valPct: Int = 1, testPct: Int = 1): DataFrame = {
    require(valPct + testPct < 100, "val+test must leave room for train")
    val b = pmod(Hashing.md5Long60(concat(lit("split:"), idCol.cast("string"))), lit(100L))
    val split = when(b < 100L - valPct - testPct, "train")
      .when(b < 100L - testPct, "validation").otherwise("test")
    df.select(sourceCol.as("source"), split.as("split"),
        // null text must count 0 tokens (size() yields null/-1 on null
        // input depending on legacy config; the oracle's sum skips nulls)
        coalesce(size(graft.ext.TextAnalysis.tokens(text)), lit(0)).as("_n"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("_n").cast("long")).as("n_tokens"))
  }

  /** Filter-funnel report — the per-stage attrition manifest a cleaning
    * pipeline publishes: gopher quality gate → language known → exact-dup
    * representative (fingerprint min-id among survivors). Returns one row
    * per stage: (stage_idx, stage, n_in, n_kept, n_dropped).
    *
    * Scale shape: the three per-doc signals (gopher counters, langId,
    * fingerprint) are narrow; the only wide stages are one doc_id-keyed
    * join of the gopher verdict to the signal frame, the funnel's single
    * count-aggregate, and the fingerprint distinct-count agg over the
    * survivors. The 4-row report materializes from two 1-row aggregates —
    * nothing collects to the driver. */
  def filterFunnel(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val g = gopherFilter(df, idCol, text, minWords = 40, maxWords = 100000,
      minMeanLen = 3.5, maxMeanLen = 6.0, minStopwords = 2, maxTopTokFrac = 0.15)
      .select(col("doc_id"), col("pass").as("_g"))
    val sig = df.select(idCol.as("doc_id"),
      graft.ext.TextAnalysis.langId(text).as("_lang"),
      graft.ext.TextAnalysis.fingerprint(text).as("_fp"))
    val scored = graft.ext.Dedup.persistOnce(g.join(sig, "doc_id"))
    val counts = scored.agg(
      count(lit(1)).as("c0"),
      sum(when(col("_g"), 1L).otherwise(0L)).as("c1"),
      sum(when(col("_g") && col("_lang") =!= "und", 1L).otherwise(0L)).as("c2"))
    val dedup = scored.filter(col("_g") && col("_lang") =!= "und")
      .groupBy("_fp").agg(min("doc_id")).agg(count(lit(1)).as("c3"))
    counts.crossJoin(dedup)
      .select(explode(array(
        struct(lit(0).as("stage_idx"), lit("input").as("stage"),
          col("c0").as("n_in"), col("c0").as("n_kept")),
        struct(lit(1).as("stage_idx"), lit("gopher_quality").as("stage"),
          col("c0").as("n_in"), col("c1").as("n_kept")),
        struct(lit(2).as("stage_idx"), lit("lang_id").as("stage"),
          col("c1").as("n_in"), col("c2").as("n_kept")),
        struct(lit(3).as("stage_idx"), lit("exact_dedup").as("stage"),
          col("c2").as("n_in"), col("c3").as("n_kept")))).as("r"))
      .select(col("r.*"))
      .withColumn("n_dropped", col("n_in") - col("n_kept"))
  }

  /** Gopher-style composite quality filter: every rule evaluated in one
    * narrow pass (the [[repetitionSignals]] kernel supplies the counters),
    * returning a verdict plus the sorted list of failed rule names — the
    * audit trail a data pipeline keeps alongside the kept/dropped split.
    * Rules (Rae et al. 2021 "Scaling Language Models" table A1 family):
    * word count bounds, mean-word-length bounds, minimum distinct
    * stopwords, top-token concentration. */
  def gopherFilter(df: DataFrame, idCol: Column, text: Column,
                   minWords: Int = 20, maxWords: Int = 100000,
                   minMeanLen: Double = 2.0, maxMeanLen: Double = 10.0,
                   minStopwords: Int = 2, maxTopTokFrac: Double = 0.2): DataFrame = {
    val toks = TextAnalysis.tokens(text)
    val s = graft.functions.TextKernels.repetitionStats(text)
    val stopArr = array(graft.functions.TextKernels.englishStopwordList.map(lit): _*)
    val base = df.select(idCol.as("doc_id"), toks.as("_w"), s.as("_s"))
      .select(col("doc_id"),
        element_at(col("_s"), 1).as("_n"),
        element_at(col("_s"), 5).as("_top_c"),
        // int sum of lengths — exact, so the mean is the same double on
        // both engines regardless of fold order
        aggregate(col("_w"), lit(0), (a, x) => a + length(x)).as("_lensum"),
        size(array_intersect(col("_w"), stopArr)).as("_nstop"))
      .withColumn("_meanlen",
        when(col("_n") > 0, col("_lensum").cast("double") / col("_n")).otherwise(lit(0.0)))
      .withColumn("_topfrac",
        when(col("_n") > 0, col("_top_c").cast("double") / col("_n")).otherwise(lit(0.0)))
    val rules: Seq[(String, Column)] = Seq(
      "too_few_words" -> (col("_n") < minWords),
      "too_many_words" -> (col("_n") > maxWords),
      "mean_word_length" -> (col("_meanlen") < minMeanLen || col("_meanlen") > maxMeanLen),
      "too_few_stopwords" -> (col("_nstop") < minStopwords),
      "repetitive" -> (col("_topfrac") > maxTopTokFrac))
    base.select(col("doc_id"),
        col("_n").as("n_tokens"),
        array_sort(filter(array(rules.map { case (nm, c) => when(c, lit(nm)) }: _*),
          x => x.isNotNull)).as("fail_reasons"))
      .withColumn("pass", size(col("fail_reasons")) === 0)
  }

  /** Filter ABLATION / overlap report over the [[gopherFilter]] rules —
    * the threshold-tuning view a dataset team reads before committing a
    * filter stack: per rule, how many docs (and how much token mass) it
    * flags at all, and how many it flags UNIQUELY (no other rule fires —
    * the docs that rule alone is responsible for removing; a rule with
    * high flagged but near-zero unique is redundant with the rest of the
    * stack). One corpus pass (the filter itself) + a rules-sized agg —
    * the explode is over per-doc reason lists of ≤ |rules| entries. */
  def filterAblation(df: DataFrame, idCol: Column, text: Column,
                     minWords: Int = 20, maxWords: Int = 100000,
                     minMeanLen: Double = 2.0, maxMeanLen: Double = 10.0,
                     minStopwords: Int = 2, maxTopTokFrac: Double = 0.2): DataFrame = {
    val g = gopherFilter(df, idCol, text, minWords, maxWords,
      minMeanLen, maxMeanLen, minStopwords, maxTopTokFrac)
    g.select(col("n_tokens").cast("long").as("_nt"),
        size(col("fail_reasons")).as("_k"),
        explode(col("fail_reasons")).as("rule"))
      .groupBy("rule")
      .agg(
        count(lit(1)).as("docs_flagged"),
        sum(col("_nt")).as("tokens_flagged"),
        sum(when(col("_k") === 1, 1L).otherwise(0L)).as("docs_unique"),
        sum(when(col("_k") === 1, col("_nt")).otherwise(0L)).as("tokens_unique"))
      .orderBy("rule")
  }

  /** Temperature-scaled source mixing (the multilingual/multi-source
    * sampling rule: p(source) ∝ n^alpha, alpha<1 upweights small sources):
    * per-source keep-rates hit an expected `targetTotal` docs, applied by
    * the same deterministic md5-Bernoulli as [[stratifiedSample]]. Rates
    * live in a broadcast side table (one tiny agg + broadcast join — no
    * driver collect, any number of sources), so the whole op is one narrow
    * filter over the corpus. */
  def temperatureMixture(df: DataFrame, idCol: Column, sourceCol: Column,
                         alpha: Double, targetTotal: Long): DataFrame = {
    val counts = df.groupBy(sourceCol.as("_src")).agg(count(lit(1)).as("_n"))
    val wsum = counts.agg(sum(pow(col("_n").cast("double"), alpha)).as("_wsum"))
    val rates = counts.crossJoin(broadcast(wsum))
      .withColumn("_thr", floor(least(lit(1.0),
        lit(targetTotal.toDouble) * pow(col("_n").cast("double"), alpha) /
          col("_wsum") / col("_n")) * 1e6).cast("long"))
      .select(col("_src"), col("_thr"))
    df.join(broadcast(rates), sourceCol === col("_src"))
      .filter(pmod(Hashing.md5Long60(idCol.cast("string")), lit(1000000L)) < col("_thr"))
      .drop("_src", "_thr")
  }

  /** Benchmark decontamination — the eval-overlap scrub every training
    * corpus needs: a corpus doc is CONTAMINATED when it shares at least one
    * exact word `nGram`-gram with the benchmark set. Returns
    * `(doc_id, shared_grams)` for contaminated docs (distinct shared
    * grams — [[graft.functions.TextKernels.WordNgramsKernel]] emits sets).
    *
    * Scale shape: the benchmark side is tiny by construction (eval suites,
    * not corpora) — its distinct gram hashes BROADCAST; the corpus side is
    * a narrow kernel + explode into a broadcast semi-ish join, so the only
    * shuffle is the per-doc count of MATCHED grams (rare). Grams join by
    * their 60-bit md5 (long keys; the oracle replays the same hash). */
  def contamination(corpus: DataFrame, idCol: Column, text: Column,
                    bench: DataFrame, benchText: Column, nGram: Int = 8): DataFrame = {
    val bg = bench
      .select(explode(graft.functions.TextKernels.wordNgrams(benchText, nGram)).as("g"))
      .select(Hashing.md5Long60(col("g")).as("gh")).distinct()
    val cg = corpus.select(idCol.as("doc_id"),
        explode(graft.functions.TextKernels.wordNgrams(text, nGram)).as("g"))
      .select(col("doc_id"), Hashing.md5Long60(col("g")).as("gh"))
    cg.join(broadcast(bg), "gh")
      .groupBy("doc_id").agg(count(lit(1)).as("shared_grams"))
  }

  /** Contamination RUN report — the Lee et al. (2022) "long shared
    * substring" view the flat gram count can't give: per contaminated
    * doc, the number of matched POSITIONAL n-grams and the longest
    * consecutive run of them (a run of r consecutive matched grams = a
    * shared token span of r + n − 1 tokens; eval-set policies key on
    * that span length, e.g. scrub only overlaps ≥ 50 tokens). Positional
    * grams keep multiplicity — unlike [[contamination]]'s distinct set —
    * because runs are positional by definition. Plan: the bench gram set
    * broadcasts (benchmark-bounded), matched positions group per doc, and
    * runs come from the classic gaps-and-islands window (pos −
    * row_number) — both windows partition by doc_id, so the per-doc work
    * is bounded by the doc's own match count. */
  def contaminationRuns(corpus: DataFrame, idCol: Column, text: Column,
                        bench: DataFrame, benchText: Column,
                        nGram: Int = 8): DataFrame = {
    val bg = bench
      .select(explode(graft.functions.TextKernels.wordNgrams(benchText, nGram)).as("g"))
      .select(Hashing.md5Long60(col("g")).as("gh")).distinct()
    // positional hashes in one compiled pass
    // ([[graft.functions.TextKernels.PositionalGramHashKernel]]) — the
    // interpreted positional-gram HOF measured 10.8 s at sf0.1, this 0.6 s
    val positional = corpus
      .select(idCol.as("doc_id"),
        posexplode(graft.functions.TextKernels.positionalGramHashes(text, nGram))
          .as(Seq("pos", "gh")))
    val matched = positional.join(broadcast(bg), "gh")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    matched
      .withColumn("_isl", col("pos") - row_number().over(w))
      .groupBy("doc_id", "_isl").agg(count(lit(1)).as("_run"))
      .groupBy("doc_id")
      .agg(sum(col("_run")).as("matched_grams"), max(col("_run")).as("longest_run"))
      .withColumn("longest_run_tokens", col("longest_run") + lit(nGram - 1))
  }

  /** The applied form: the corpus minus contaminated docs (anti-join on
    * the flagged ids — the only extra wide stage). */
  def decontaminate(corpus: DataFrame, idCol: Column, text: Column,
                    bench: DataFrame, benchText: Column, nGram: Int = 8): DataFrame =
    corpus.join(
      contamination(corpus, idCol, text, bench, benchText, nGram)
        .select(col("doc_id").as("_contaminated_id")),
      idCol === col("_contaminated_id"), "left_anti")

  /** The benchmark gram-hash set as a driver-side value — bounded by
    * construction (eval suites, not corpora), the same boundedness the
    * broadcast in [[contamination]] relies on. Feed it to
    * [[decontaminateWithGramSet]] for the STREAMING form. */
  def benchGramHashes(bench: DataFrame, benchText: Column, nGram: Int = 8): Seq[Long] =
    bench.select(explode(graft.functions.TextKernels.wordNgrams(benchText, nGram)).as("g"))
      .select(Hashing.md5Long60(col("g")).as("gh")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted

  /** Streaming-safe decontamination: the batch form's agg + anti-join
    * cannot run inside a streaming query, but with the (bounded) bench
    * gram set inlined the whole scrub is ONE NARROW FILTER — the shape a
    * CDC ingest pipeline wants: no state, no watermark, per-row decision.
    * Works identically on batch frames. */
  def decontaminateWithGramSet(corpus: DataFrame, idCol: Column, text: Column,
                               gramHashes: Seq[Long], nGram: Int = 8): DataFrame = {
    val docGrams = transform(
      graft.functions.TextKernels.wordNgrams(text, nGram),
      g => Hashing.md5Long60(g))
    corpus.filter(
      size(array_intersect(docGrams, lit(gramHashes.toArray))) === 0)
  }

  /** Sequence packing: concatenate the corpus token stream in doc_id order
    * and cut it into fixed `budget`-token bins (docs may straddle bins) —
    * the GPT-style packing step that turns documents into training
    * sequences. Returns per-bin stats (doc count, token count, doc span).
    *
    * The global token offset is a DISTRIBUTED PREFIX SUM: range-partition
    * by doc_id + sort within partitions, per-partition totals to the
    * driver (#partitions values — bounded, not data-sized), broadcast
    * offsets back, intra-partition window cumsum. No single-partition
    * global window, no token-level explode — each doc expands only to the
    * bins it touches (≤ n/budget + 1 rows), so the wide work is one
    * groupBy(bin). Deterministic in doc_id order regardless of partition
    * boundaries. */
  def packTokens(df: DataFrame, idCol: Column, text: Column, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val base = df.select(idCol.as("doc_id"), size(TextAnalysis.tokens(text)).as("n"))
      .filter(col("n") > 0)
    // persistOnce is LOAD-BEARING (the rankedVocab lesson, TextAnalysis
    // :802): repartitionByRange samples boundaries PER JOB, so the
    // totals job and the window job must read the same materialized
    // assignment or the offsets are wrong at scale
    val parted = graft.ext.Dedup.persistOnce(base.repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("_pid", spark_partition_id()))
    val pidTotals = parted.groupBy("_pid").agg(sum(col("n")).as("_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // offset of pid p = sum of totals of pids < p (exclusive prefix sum)
    val pidOffsets = pidTotals.map(_._1)
      .zip(pidTotals.map(_._2).scanLeft(0L)(_ + _))
    val offsetOf = pidOffsets.foldLeft(lit(0L)) {
      case (acc, (pid, off)) => when(col("_pid") === pid, lit(off)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withOff = parted
      .withColumn("off", offsetOf + coalesce(sum(col("n")).over(w), lit(0L)))
    withOff
      .select(col("doc_id"), col("n"), col("off"),
        explode(sequence(expr(s"off DIV $budget"),
          expr(s"(off + n - 1) DIV $budget"))).as("bin"))
      .groupBy("bin").agg(
        count(lit(1)).as("n_docs"),
        sum(least((col("bin") + 1) * budget, col("off") + col("n")) -
          greatest(col("bin") * budget, col("off"))).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("bin")
  }

  /** Corpus snapshot DIFF — the dataset-versioning report between two
    * crawls/releases: per source, how many docs were added, removed,
    * changed (same id, different content fingerprint), or unchanged.
    * Content identity is the md5-60 of the text (the exact-dedup
    * fingerprint), so a whitespace-identical doc is "unchanged" and any
    * byte change is "changed". One full-outer join on the id — the only
    * wide stage; fingerprints are narrow. */
  def corpusDiff(prev: DataFrame, cur: DataFrame, idCol: Column,
                 text: Column, sourceCol: Column): DataFrame = {
    def fp(df: DataFrame, side: String) =
      // null text fingerprints as the empty doc — a present-but-empty row
      // must diff as changed/unchanged, never as added/removed
      df.select(idCol.as("doc_id"), sourceCol.as(s"_src_$side"),
        Hashing.md5Long60(coalesce(text, lit(""))).as(s"_fp_$side"))
    fp(prev, "p").join(fp(cur, "c"), Seq("doc_id"), "full_outer")
      .select(coalesce(col("_src_c"), col("_src_p")).as("source"),
        when(col("_fp_p").isNull, "added")
          .when(col("_fp_c").isNull, "removed")
          .when(col("_fp_p") === col("_fp_c"), "unchanged")
          .otherwise("changed").as("status"))
      .groupBy("source")
      .agg(sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
  }

  /** Padding-waste diagnostic for fixed-size batching — the "is length
    * bucketing worth it" report a training pipeline runs before choosing
    * its batching strategy. Docs (token counts clipped at `seqLen`) form
    * batches of `batchSize` under two orderings: `arrival` (doc_id — the
    * naive loader) and `length` ((n, doc_id) — length bucketing); every
    * sequence pads to its batch max, so padded slots = count·max(n) per
    * batch. Emits one row per strategy with total docs/batches/tokens/
    * padded slots and the waste fraction.
    *
    * Scale shape: the global batch index is the distributed ROW index —
    * range partition on the ordering key, per-partition row_number, plus
    * collected per-partition COUNT offsets (the [[packTokens]] prefix-sum
    * trick; the collect is #partitions-bounded). Per-batch and final aggs
    * are hash aggs. */
  def paddingWaste(df: DataFrame, idCol: Column, text: Column,
                   seqLen: Int, batchSize: Int): DataFrame = {
    require(seqLen > 0 && batchSize > 0, "seqLen and batchSize must be positive")
    val base = graft.ext.Dedup.persistOnce(
      df.select(idCol.as("doc_id"),
          least(size(TextAnalysis.tokens(text)), lit(seqLen)).as("n"))
        .filter(col("n") > 0))
    def strategy(name: String, sortCols: Seq[Column]): DataFrame = {
      // persistOnce load-bearing: cross-job range-assignment determinism
      // (TextAnalysis.rankedVocab:802 has the full story)
      val parted = graft.ext.Dedup.persistOnce(base.repartitionByRange(sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn("_pid", spark_partition_id()))
      val pidCounts = parted.groupBy("_pid").agg(count(lit(1)).as("_c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val pidOffsets = pidCounts.map(_._1)
        .zip(pidCounts.map(_._2).scanLeft(0L)(_ + _))
      val offsetOf = pidOffsets.foldLeft(lit(0L)) {
        case (acc, (pid, off)) => when(col("_pid") === pid, lit(off)).otherwise(acc)
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("_pid").orderBy(sortCols: _*)
      val batched = parted
        .withColumn("_rank", offsetOf + row_number().over(w) - 1)
        .withColumn("_batch", (col("_rank") / batchSize).cast("long"))
        .groupBy("_batch")
        .agg(count(lit(1)).as("_cnt"), max(col("n")).as("_mx"),
          sum(col("n").cast("long")).as("_tok"))
      batched.agg(
        count(lit(1)).as("n_batches"),
        sum(col("_cnt")).as("n_docs"),
        sum(col("_tok")).as("n_tokens"),
        sum(col("_cnt") * col("_mx")).as("n_padded_slots"))
        .select(lit(name).as("strategy"), col("n_batches"), col("n_docs"),
          col("n_tokens"), col("n_padded_slots"),
          round((col("n_padded_slots") - col("n_tokens")) * 1.0
            / col("n_padded_slots"), 6).as("waste_ratio"))
    }
    strategy("arrival", Seq(col("doc_id")))
      .unionAll(strategy("length", Seq(col("n"), col("doc_id"))))
  }

  /** Context-window chunking: token windows of `chunkSize` starting every
    * `stride` tokens (overlap = chunkSize − stride), final windows
    * truncated; empty docs emit nothing. One narrow explode — the standard
    * sequence-shaping step before tokenizer/packing stages. */
  def chunkTokens(df: DataFrame, idCol: Column, text: Column,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride, "need 0 < stride <= chunkSize")
    val toks = TextAnalysis.tokens(text)
    df.select(idCol.as("doc_id"), toks.as("toks"), size(toks).as("n"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          ceil(col("n").cast("double") / stride).cast("int") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkSize)).as("ctoks"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("ctoks")).as("n_tokens"),
        concat_ws(" ", col("ctoks")).as("chunk_text"))
  }

  /** Balanced shard assignment — the write-N-training-shards step. Docs
    * ordered by token count DESCENDING take shards in a serpentine
    * (boustrophedon) sweep over shard ids (0,1,…,n−1,n−1,…,1,0,0,1,…):
    * the rank-only form of the LPT greedy, which lands within one
    * max-item of perfect token balance with no driver-side heap. The
    * global descending rank uses the [[packTokens]] bounded-collect
    * prefix sum (#partitions row counts, never a single-partition
    * window), so the whole op is one range shuffle + one bounded
    * collect + one hash agg at any corpus size. Emits per-shard doc
    * count, token sum, and heaviest doc. */
  def packShards(df: DataFrame, idCol: Column, text: Column,
                 nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val base = df.select(idCol.as("doc_id"),
      size(TextAnalysis.tokens(text)).cast("long").as("n"))
    // persistOnce load-bearing: cross-job range-assignment determinism
    // (TextAnalysis.rankedVocab:802 has the full story)
    val parted = graft.ext.Dedup.persistOnce(
      base.repartitionByRange(col("n").desc, col("doc_id"))
        .sortWithinPartitions(col("n").desc, col("doc_id"))
        .withColumn("_pid", spark_partition_id()))
    val pidCounts = parted.groupBy("_pid").agg(count(lit(1)).as("_c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val pidOffsets = pidCounts.map(_._1)
      .zip(pidCounts.map(_._2).scanLeft(0L)(_ + _))
    val offsetOf = pidOffsets.foldLeft(lit(0L)) {
      case (acc, (pid, off)) => when(col("_pid") === pid, lit(off)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_pid").orderBy(col("n").desc, col("doc_id"))
    val ranked = parted
      .withColumn("rk", offsetOf + row_number().over(w).cast("long") - 1L)
    val pos = col("rk") % (2L * nShards)
    val shard = when(pos < nShards, pos).otherwise(lit(2L * nShards - 1L) - pos)
    ranked.withColumn("shard", shard)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
        max(col("n")).as("max_doc_tokens"))
      .orderBy("shard")
  }

  /** Dataset-card rollup — the corpus composition report every release
    * ships (docs/tokens/doc-length by source × language, with all the
    * marginal and grand totals): one CUBE aggregation, which Spark
    * executes as a single Expand + hash agg (one shuffle for every
    * grouping set at once — no per-slice re-scan of the corpus).
    * `gid` is the grouping bitmask (source bit 2, lang bit 1)
    * disambiguating rolled-up NULLs from data NULLs. */
  def corpusReport(df: DataFrame, idCol: Column, text: Column,
                   source: Column, lang: Column): DataFrame =
    df.select(source.as("source"), lang.as("lang"),
        size(TextAnalysis.tokens(text)).cast("long").as("n"))
      .cube("source", "lang")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_docs"),
        sum(col("n")).as("n_tokens"),
        round(sum(col("n")).cast("double") / count(lit(1)), 4).as("avg_doc_tokens"))
      .select("source", "lang", "gid", "n_docs", "n_tokens", "avg_doc_tokens")
      .orderBy(col("gid"), col("source").asc_nulls_first, col("lang").asc_nulls_first)

  /** Token-budget allocation — the pretraining mixture planning table:
    * per-source natural token counts, temperature-smoothed target shares
    * (w_s ∝ n_s^(1/T), the [[temperatureMixture]] convention), and the
    * allocated tokens under a total budget with an epoch cap
    * (alloc_s = min(budget·w_s, maxEpochs·n_s)). Epochs = alloc/natural.
    * Capped sources strand budget; production reruns with the leftover —
    * single pass here keeps the plan (and its oracle) closed-form. One
    * token-count agg + source-cardinality-bounded arithmetic. */
  def tokenBudget(df: DataFrame, idCol: Column, text: Column, sourceCol: Column,
                  budget: Long, temperature: Double, maxEpochs: Double): DataFrame = {
    val n = df.select(sourceCol.as("source"),
        size(TextAnalysis.tokens(text)).cast("long").as("nt"))
      .groupBy("source").agg(sum(col("nt")).as("n_tokens"))
    val pw = n.withColumn("p", pow(col("n_tokens").cast("double"), lit(1.0 / temperature)))
    val tot = pw.agg(sum(col("p")).as("tp"))
    pw.crossJoin(broadcast(tot))
      .withColumn("weight", round(col("p") / col("tp"), 6))
      .withColumn("alloc_tokens", round(
        least(lit(budget.toDouble) * col("weight"), lit(maxEpochs) * col("n_tokens")), 4))
      .withColumn("epochs", round(col("alloc_tokens") / col("n_tokens"), 6))
      .select("source", "n_tokens", "weight", "alloc_tokens", "epochs")
      .orderBy("source")
  }

  /** Epoch allocation under a token budget with REPETITION DECAY — the
    * data-constrained-scaling planner (Muennighoff et al. 2023: repeated
    * tokens are worth less each epoch; beyond ~4 epochs roughly nothing):
    * taking epoch `e` of source `s` spends its full `n_tokens` of budget
    * but yields utility `n_tokens · decay^(e−1)`. Utility DENSITY per
    * token is `decay^(e−1)` — identical across sources within an epoch —
    * so the greedy optimum fills whole epoch tiers in order (ties inside
    * a tier broken by source asc, the deterministic rule), with one
    * partial chunk where the budget runs out. Emits
    * `(source, epoch, n_tokens, take_tokens, utility)` for every chunk
    * with take_tokens > 0 — the "how many epochs of what" answer beside
    * [[tokenBudget]]'s single-pass temperature mix.
    *
    * Scale shape: ONE corpus-sized token agg; the greedy runs as a
    * cumsum window over the |sources|·maxEpochs grid — bounded by
    * construction (the hdrPercentiles sketch-window class), never
    * data-sized. */
  def epochAllocation(df: DataFrame, text: Column, sourceCol: Column,
                      budget: Long, decay: Double = 0.5,
                      maxEpochs: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.select(sourceCol.as("source"),
        size(TextAnalysis.tokens(text)).cast("long").as("nt"))
      .groupBy("source").agg(sum(col("nt")).as("n_tokens"))
    val grid = n.select(col("source"), col("n_tokens"),
        explode(sequence(lit(1), lit(maxEpochs))).as("epoch"))
    val w = Window.orderBy(col("epoch"), col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grid
      .withColumn("_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("take_tokens",
        greatest(lit(0L), least(col("n_tokens"), lit(budget) - col("_before"))))
      .filter(col("take_tokens") > 0)
      .withColumn("utility", round(col("take_tokens").cast("double") *
        pow(lit(decay), col("epoch") - 1), 4))
      .select("source", "epoch", "n_tokens", "take_tokens", "utility")
      .orderBy("epoch", "source")
  }

  /** DSIR importance log-weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): hashed-unigram bag
    * features; add-½-smoothed bucket distributions p (TARGET corpus) and
    * q (RAW corpus) over `buckets` hash buckets; the per-doc weight is
    * log(p(doc)/q(doc)) = Σ_b count_b · ln(p_b/q_b).
    *
    * Scale shape: both distributions are hash aggs capped at `buckets`
    * rows, broadcast back as the per-bucket log-ratio table; the doc pass
    * is one (doc,bucket) hash agg + a broadcast join + one per-doc agg —
    * the raw corpus shuffles only its (doc,bucket) counts, never text.
    * Per-bucket log-ratios round to 6 dp and the per-doc sum re-rounds
    * (the cross-engine float protocol). */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: Column,
                     text: Column, buckets: Int): DataFrame = {
    def bucket(t: Column): Column =
      pmod(graft.functions.Hashing.md5Long60(concat(lit("dsir:"), t)), lit(buckets.toLong))
    val tgt = target.select(explode(TextAnalysis.tokens(text)).as("t"))
      .select(bucket(col("t")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("ct"))
    // the raw corpus tokenizes ONCE: the (doc,bucket) counts serve both
    // the q distribution (one more tiny agg over ≤ docs·buckets rows)
    // and the per-doc scoring pass
    val docBuckets = Dedup.persistOnce(
      raw.select(idCol.as("doc_id"), explode(TextAnalysis.tokens(text)).as("t"))
        .select(col("doc_id"), bucket(col("t")).as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("n")))
    val rw = docBuckets.groupBy("b").agg(sum(col("n")).as("cr"))
    val tTot = tgt.agg(sum(col("ct")).cast("double").as("tt"))
    val rTot = rw.agg(sum(col("cr")).cast("double").as("rt"))
    // every bucket a raw doc can hit appears in rw; smoothing covers the
    // target side's empties
    val ratio = rw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("b"), round(
        log((coalesce(col("ct"), lit(0L)) + lit(0.5)) / (col("tt") + lit(0.5) * lit(buckets))) -
          log((col("cr") + lit(0.5)) / (col("rt") + lit(0.5) * lit(buckets))), 6).as("logr"))
    docBuckets
      .join(broadcast(ratio), "b")
      .groupBy("doc_id")
      .agg(round(sum(col("n") * col("logr")), 6).as("logw"))
  }

  /** DSIR resampling: top-`k` of [[dsirLogWeights]] under the Gumbel
    * trick — adding Gumbel(0,1) noise to each log-weight and taking the
    * top-k IS sampling k docs without replacement with probability ∝
    * weight. The uniforms are md5-derived from (seed, doc_id), so the
    * "random" sample is deterministic and the oracle replays it exactly.
    * One narrow column + a TakeOrdered(k) on top of the weight pass. */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: Column,
                   text: Column, buckets: Int, k: Int, seed: String): DataFrame = {
    val u = (pmod(graft.functions.Hashing.md5Long60(
        concat(lit(s"dsirg:$seed:"), col("doc_id").cast("string"))), lit(1000000L)) + lit(1L))
      .cast("double") / lit(1000001.0)
    dsirLogWeights(raw, target, idCol, text, buckets)
      .withColumn("gkey", round(col("logw") - log(-log(u)), 6))
      .orderBy(desc("gkey"), col("doc_id")).limit(k)
  }

  /** Cross-source n-gram overlap matrix — the between-source contamination
    * report run before fixing mixture weights (shared boilerplate or
    * mirrored content across crawls shows up as high Jaccard). Per source:
    * the DISTINCT word-`n`-gram set; per source pair (a < b): exact
    * Jaccard |A∩B| / (|A|+|B|−|A∩B|).
    *
    * Scale shape: the (source, gram) table is distinct-deduped (one hash
    * agg), the pair intersection is a gram-keyed self-join whose fan-out
    * per gram is bounded by C(#sources, 2) — source-count bounded, never
    * corpus-quadratic; set sizes broadcast onto the ≤ C(S,2)-row result. */
  def sourceOverlap(df: DataFrame, idCol: Column, text: Column,
                    sourceCol: Column, n: Int = 3): DataFrame = {
    // grams travel as 60-bit md5 hashes, not strings — the distinct and
    // the self-join shuffle 8-byte keys (the oracle applies the same
    // hash, so counts match exactly; 60-bit collisions are negligible).
    // Gramming runs in the one-pass TextKernels kernel (per-doc distinct,
    // which the source-level distinct subsumes), not the interpreted HOF.
    val grams = Dedup.fan(df, idCol) // fan: the gram-kernel map side (guide §2.5)
      .select(sourceCol.as("source"),
        explode(graft.functions.TextKernels.wordNgrams(text, n)).as("gs"))
      .select(col("source"), graft.functions.Hashing.md5Long60(col("gs")).as("g"))
      .distinct()
    val sizes = grams.groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = grams.select(col("source").as("src_a"), col("g"))
      .join(grams.select(col("source").as("src_b"), col("g")), "g")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("sz").as("sza"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("sz").as("szb"))), "src_b")
      .select(col("src_a"), col("src_b"), col("inter"),
        round(col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")), 6).as("jaccard"))
      .orderBy(desc("jaccard"), col("src_a"), col("src_b"))
  }

  /** Per-source distribution drift: the two-sample Kolmogorov–Smirnov
    * statistic between a source's doc-token-length distribution and the
    * rest of the corpus — the "did this crawl/source shift?" monitor for
    * mixture rebalancing. KS_s = max_x |F_s(x) − F_rest(x)| evaluated at
    * every observed length.
    *
    * Scale shape: one (source, length) hash agg, a per-length global agg,
    * a (distinct lengths × sources) grid join — bounded by value
    * cardinality × source count, not docs — and two cumulative windows
    * partitioned by source. CDF differences round to 6 dp before the max
    * so boundary rows are engine-stable. */
  def ksDrift(df: DataFrame, idCol: Column, text: Column,
              sourceCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val len = df.select(sourceCol.as("source"), size(TextAnalysis.tokens(text)).as("n"))
    val perSN = len.groupBy("source", "n").agg(count(lit(1)).as("cs"))
    val perN = len.groupBy("n").agg(count(lit(1)).as("ca"))
    val perS = len.groupBy("source").agg(count(lit(1)).as("ns"))
    val nAll = len.agg(count(lit(1)).as("na"))
    val grid = perN.crossJoin(broadcast(perS))
      .join(perSN, Seq("source", "n"), "left")
      .na.fill(0L, Seq("cs"))
      .crossJoin(broadcast(nAll))
      // a source that IS the whole corpus has no "rest" — drop it rather
      // than divide by zero into a null ks
      .filter(col("na") > col("ns"))
    val w = Window.partitionBy("source").orderBy("n")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("fs", sum(col("cs")).over(w).cast("double") / col("ns"))
      .withColumn("fr", (sum(col("ca")).over(w) - sum(col("cs")).over(w)).cast("double") /
        (col("na") - col("ns")))
      .withColumn("d", round(abs(col("fs") - col("fr")), 6))
      .groupBy("source").agg(max(col("d")).as("ks"))
      .orderBy(desc("ks"), col("source"))
  }

  /** Per-domain document quota: keep at most `cap` docs per domain, best
    * `rank` first (ties → lowest id — a total order), the per-host cap
    * web-scale pretraining mixes apply so no single domain dominates the
    * corpus. Two-phase top-k, NOT one global window: phase 1 ranks within
    * (domain, input partition) and keeps ≤ cap candidates per group — any
    * row outside its partition-local top-cap has ≥ cap better same-domain
    * rows in that partition alone, so pruning it is exact regardless of
    * how the input happens to be partitioned. Phase 2 ranks the ≤ cap·P
    * survivors per domain. A mega-domain (the 100 TB skew case: one host
    * = 10% of the web) therefore never funnels through a single sort
    * partition — the hot key is split P ways before the global window
    * sees it. */
  /** Composed data-prep pipeline — the end-to-end chain a training-corpus
    * build runs as ONE job, in the production order:
    *
    *   exact dedup (content fingerprint, min-id representative)
    *     → Gopher quality filter ([[gopherFilter]], pass only)
    *     → benchmark decontamination ([[decontaminate]], shared exact
    *       word n-gram vs the eval set)
    *     → temperature-scaled source mixing ([[temperatureMixture]])
    *
    * Every stage is the library's own operator; composing them pins the
    * INTERACTIONS the per-stage rows cannot: dedup runs first so a
    * duplicate cannot rescue a failing doc (and quality runs once per
    * distinct content, not per copy); decontamination sees only quality
    * survivors; the mix's per-source counts are POST-filter counts, so
    * keep-rates reflect what actually survives — the same chain run
    * stage-per-job would resample against pre-filter counts and miss the
    * target.
    *
    * Returns the selected docs `(doc_id, source, n_tokens)`. Scale shape:
    * one fingerprint agg (dedup) + a narrow quality pass + the broadcast
    * eval-gram semi-join + broadcast mix rates — the corpus is touched
    * once per stage, nothing data-sized reaches the driver, and every
    * join after dedup is broadcast-sized. */
  def prepPipeline(docs: DataFrame, idCol: Column, text: Column,
                   sourceCol: Column, evalDocs: DataFrame, evalText: Column,
                   nGram: Int = 4, alpha: Double = 0.6,
                   targetTotal: Long = 100L,
                   minWords: Int = 20, maxWords: Int = 100000,
                   minMeanLen: Double = 2.0, maxMeanLen: Double = 10.0,
                   minStopwords: Int = 2,
                   maxTopTokFrac: Double = 0.2): DataFrame =
    prepStages(docs, idCol, text, sourceCol, evalDocs, evalText, nGram,
      alpha, targetTotal, minWords, maxWords, minMeanLen, maxMeanLen,
      minStopwords, maxTopTokFrac).selected
      .select(col("doc_id"), col("source"), col("n_tokens"))

  /** The funnel-report twin of [[prepPipeline]] — per stage, docs in /
    * kept / dropped (the [[filterFunnel]] shape over the REAL composed
    * chain). Stage counts are one tiny agg per stage over the shared
    * persisted intermediates; the corpus work is identical to
    * [[prepPipeline]]. */
  def prepPipelineFunnel(docs: DataFrame, idCol: Column, text: Column,
                         sourceCol: Column, evalDocs: DataFrame,
                         evalText: Column, nGram: Int = 4,
                         alpha: Double = 0.6, targetTotal: Long = 100L,
                         minWords: Int = 20, maxWords: Int = 100000,
                         minMeanLen: Double = 2.0, maxMeanLen: Double = 10.0,
                         minStopwords: Int = 2,
                         maxTopTokFrac: Double = 0.2): DataFrame = {
    val st = prepStages(docs, idCol, text, sourceCol, evalDocs, evalText,
      nGram, alpha, targetTotal, minWords, maxWords, minMeanLen, maxMeanLen,
      minStopwords, maxTopTokFrac)
    // one tiny count per stage, assembled via a 1-row broadcast chain
    val counts = st.input.agg(count(lit(1)).as("c0"))
      .crossJoin(broadcast(st.deduped.agg(count(lit(1)).as("c1"))))
      .crossJoin(broadcast(st.quality.agg(count(lit(1)).as("c2"))))
      .crossJoin(broadcast(st.clean.agg(count(lit(1)).as("c3"))))
      .crossJoin(broadcast(st.selected.agg(count(lit(1)).as("c4"))))
    counts.select(explode(array(
        struct(lit(0).as("stage_idx"), lit("input").as("stage"),
          col("c0").as("n_in"), col("c0").as("n_kept")),
        struct(lit(1).as("stage_idx"), lit("exact_dedup").as("stage"),
          col("c0").as("n_in"), col("c1").as("n_kept")),
        struct(lit(2).as("stage_idx"), lit("gopher_quality").as("stage"),
          col("c1").as("n_in"), col("c2").as("n_kept")),
        struct(lit(3).as("stage_idx"), lit("decontaminate").as("stage"),
          col("c2").as("n_in"), col("c3").as("n_kept")),
        struct(lit(4).as("stage_idx"), lit("temperature_mix").as("stage"),
          col("c3").as("n_in"), col("c4").as("n_kept")))).as("r"))
      .select(col("r.*"))
      .withColumn("n_dropped", col("n_in") - col("n_kept"))
  }

  private case class PrepStages(input: DataFrame, deduped: DataFrame,
                                quality: DataFrame, clean: DataFrame,
                                selected: DataFrame)

  private def prepStages(docs: DataFrame, idCol: Column, text: Column,
                         sourceCol: Column, evalDocs: DataFrame,
                         evalText: Column, nGram: Int, alpha: Double,
                         targetTotal: Long, minWords: Int, maxWords: Int,
                         minMeanLen: Double, maxMeanLen: Double,
                         minStopwords: Int, maxTopTokFrac: Double): PrepStages = {
    val input = docs.select(idCol.as("doc_id"), text.as("_text"),
      sourceCol.as("source"))
    // exact dedup by content fingerprint: keep the min-id representative
    // (one agg + a self-semi-join on (fp, min_id) — no window)
    val withFp = input.withColumn("_fp",
      graft.ext.TextAnalysis.fingerprint(col("_text")))
    val keepIds = withFp.groupBy(col("_fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val deduped = graft.ext.Dedup.persistOnce(
      withFp.join(keepIds, Seq("doc_id"), "left_semi").drop("_fp"))
    // quality: gopherFilter verdicts joined back (both sides already
    // deduped; the join key is the unique doc_id)
    val verdicts = gopherFilter(deduped, col("doc_id"), col("_text"),
      minWords, maxWords, minMeanLen, maxMeanLen, minStopwords,
      maxTopTokFrac)
      .filter(col("pass")).select(col("doc_id"), col("n_tokens"))
    val quality = graft.ext.Dedup.persistOnce(
      deduped.join(verdicts, "doc_id"))
    // decontamination vs the (tiny) eval side — broadcast gram set
    val clean = graft.ext.Dedup.persistOnce(
      decontaminate(quality, col("doc_id"), col("_text"),
        evalDocs, evalText, nGram))
    // temperature mix over POST-filter source counts
    val selected = temperatureMixture(clean, col("doc_id"), col("source"),
      alpha, targetTotal)
    PrepStages(input, deduped, quality, clean, selected)
  }

  def domainCap(docs: DataFrame, idCol: Column, domain: Column, rank: Column,
                cap: Int): DataFrame = {
    val base = docs.select(idCol.as("doc_id"), domain.as("domain"), rank.as("r"))
    val order = Seq(col("r").desc, col("doc_id").asc)
    val local = Window.partitionBy(col("domain"), spark_partition_id()).orderBy(order: _*)
    val global = Window.partitionBy(col("domain")).orderBy(order: _*)
    base
      .withColumn("_lrn", row_number().over(local))
      .filter(col("_lrn") <= cap).drop("_lrn")
      .withColumn("rn", row_number().over(global))
      .filter(col("rn") <= cap)
  }
}
