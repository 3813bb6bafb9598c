package graft.ext

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic sketches for 100 TB pipelines: Bloom-filter membership
  * (decontamination when the benchmark gram SET outgrows the inlined-array
  * broadcast of [[Corpus.decontaminateWithGramSet]]) and Count-Min token
  * counts (heavy hitters in one corpus pass with sketch memory independent
  * of vocabulary size — Cormode & Muthukrishnan 2005). Both draw from the
  * engine's md5-60 hash family, so a DuckDB oracle reproduces every bit:
  * the sketches are deterministic functions of the data, not approximations
  * the oracle has to bound.
  *
  * Reference scope: the reference delegates querying to ES, which uses the
  * same trick internally (HLL for cardinality, BKD/bitset pruning); these
  * are the training-data-pipeline counterparts named in BASELINE.json.
  */
object Sketch {

  /** The k probe positions of one gram in an m-bit Bloom filter —
    * Kirsch–Mitzenmacher double hashing (two independent md5-60 draws,
    * pos_j = (h1 + j·h2) mod m), which preserves the standard
    * false-positive bound with only two base hashes per gram. */
  private def bloomPositions(g: Column, mBits: Int, k: Int): Seq[Column] = {
    val h1 = Hashing.md5Long60(g)
    val h2 = Hashing.md5Long60(concat(lit("bloom2:"), g))
    (0 until k).map(j => pmod(h1 + lit(j.toLong) * h2, lit(mBits.toLong)))
  }

  /** Build the filter word-array from the benchmark's n-gram stream. The
    * distinct bit positions collect to the driver — ≤ k·|bench grams|
    * values, benchmark-bounded like every decontamination build here —
    * and pack into m/64 longs. The WORDS array is constant-size in the
    * benchmark (m/64 longs; 128 KB at m=2^20): that constancy is the
    * whole point vs shipping the gram set itself. */
  def bloomBuild(bench: DataFrame, benchText: Column, nGram: Int = 8,
                 mBits: Int = 1 << 20, k: Int = 3): Array[Long] = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    val pos = bench
      .select(explode(graft.functions.TextKernels.wordNgrams(benchText, nGram)).as("g"))
      .select(explode(array(bloomPositions(col("g"), mBits, k): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    pos.foreach(p => words(p.toInt >> 6) |= (1L << (p.toInt & 63)))
    words
  }

  /** Per-doc Bloom contamination report: for each corpus doc, how many of
    * its distinct n-grams hit the filter (all k probe bits set), plus the
    * flag. The filter rides to executors as ONE literal long array and
    * the probe is codegen'd builtins (element_at + bitwiseAND against a
    * powers-of-two literal) — no UDF, fully narrow, one corpus pass, no
    * shuffle at all on the corpus side. Error is one-sided: a
    * contaminated gram ALWAYS hits (no false negatives — the property a
    * scrub needs); a clean doc flags at rate ≈ (1 − e^{−kn/m})^k per
    * gram. */
  def bloomContamination(corpus: DataFrame, idCol: Column, text: Column,
                         words: Array[Long], nGram: Int = 8, k: Int = 3): DataFrame = {
    // one compiled pass ([[graft.functions.TextKernels.BloomCountKernel]]):
    // same hash family + positions as [[bloomBuild]], but per-gram cost is
    // two compiled digests instead of two interpreted builtin-md5 chains —
    // 3.5 s → sub-second at sf0.1, still zero corpus shuffle
    val counts = graft.functions.TextKernels.bloomCounts(text, nGram, k, words)
    corpus.select(idCol.as("doc_id"), counts.as("_bc"))
      .select(col("doc_id"),
        element_at(col("_bc"), 1).cast("int").as("n_grams"),
        element_at(col("_bc"), 2).cast("int").as("hit_grams"))
      .withColumn("flagged", col("hit_grams") > 0)
  }

  /** Per-token exact counts — the vocab-sized agg every term-stats
    * operator here starts from (map-side combine collapses the corpus
    * stream before any shuffle). */
  private def tokenCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextAnalysis.tokens(text)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** Count-Min sketch of the corpus token counts: d rows × w cells. The
    * corpus is touched ONCE (the vocab agg); only the vocab table — not
    * the token stream — expands d ways into cells, so the Expand is
    * vocab-sized. Cell mass = Σ counts of tokens hashing there. */
  def cmsSketch(docs: DataFrame, text: Column, d: Int = 4, w: Int = 1024): DataFrame =
    cmsFromCounts(tokenCounts(docs, text), d, w)

  private def cmsCell(r: Int, tok: Column, w: Int): Column =
    pmod(Hashing.md5Long60(concat(lit(s"cms$r:"), tok)), lit(w.toLong))

  private def cmsFromCounts(counts: DataFrame, d: Int, w: Int): DataFrame =
    counts.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cmsCell(r, col("tok"), w).as("cell"))): _*)).as("rc"),
        col("cnt"))
      .groupBy(col("rc.r").as("r"), col("rc.cell").as("cell"))
      .agg(sum("cnt").as("mass"))

  /** Heavy hitters with their Count-Min estimates: the top-`topK` tokens
    * by true count next to the sketch read-back (min over the d row
    * estimates — always ≥ the true count, within εN of it with
    * probability 1−δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉). The sketch (≤ d·w rows)
    * broadcasts into the probe join; at 100 TB the only corpus-sized work
    * is the single vocab agg, and the sketch memory never grows with the
    * vocabulary — the property that lets a fleet of ingest workers merge
    * sketches by cell-wise addition instead of shipping vocabularies. */
  def cmsHeavyHitters(docs: DataFrame, text: Column, d: Int = 4, w: Int = 1024,
                      topK: Int = 20): DataFrame = {
    val counts = graft.CachedFrames.track(tokenCounts(docs, text).persist())
    val sketch = cmsFromCounts(counts, d, w)
    val top = counts.orderBy(desc("cnt"), col("tok")).limit(topK)
    val probes = top.select(col("tok"), col("cnt"),
      explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cmsCell(r, col("tok"), w).as("cell"))): _*)).as("rc"))
      .select(col("tok"), col("cnt"), col("rc.r").as("r"), col("rc.cell").as("cell"))
    probes.join(broadcast(sketch), Seq("r", "cell"))
      .groupBy("tok", "cnt")
      .agg(min("mass").as("estimate"))
      .orderBy(desc("cnt"), col("tok"))
  }
}
