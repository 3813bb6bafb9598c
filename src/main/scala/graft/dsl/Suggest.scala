package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ES suggesters (term / phrase / completion) over an analyzed text field.
  *
  * The reference's query surface is Elasticsearch 6.5
  * (`/root/reference/pom.xml:25-26`); its suggest API proposes corrections
  * (term), rephrased candidates scored by a language model (phrase), and
  * prefix completions from a weighted dictionary (completion). Here the
  * "index" is the corpus itself: the candidate dictionary is the corpus
  * vocabulary with document/term frequencies — one distributed aggregation;
  * ES builds the same per-shard term dictionary in its inverted index.
  *
  * Scale: the vocabulary aggregation is a hash groupBy on the term (the
  * only full-corpus pass); the suggest texts are a handful of literal
  * tokens broadcast against it. Per-token top-k uses a window PARTITIONED
  * by input token (bounded partitions); single-list top-k uses sort-limit
  * (TakeOrdered) — no global single-partition window anywhere.
  */
object Suggest {

  /** Analyzer (must match [[graft.ext.TextAnalysis.tokens]] and the DuckDB
    * oracle twin: lowercase, split on non-word runs). */
  private def analyze(text: String): Seq[String] =
    text.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq

  /** Corpus term dictionary: one row per distinct term of `field` with
    * document frequency and total term frequency. */
  def vocabulary(df: DataFrame, idCol: Column, field: Column): DataFrame =
    df.select(idCol.as("_doc"), explode(graft.ext.TextAnalysis.tokens(field)).as("term"))
      .groupBy("term")
      .agg(count_distinct(col("_doc")).as("doc_freq"), count(lit(1)).as("term_freq"))

  /** ES term suggester, `sort: frequency` mode: for each token of the
    * suggest text, corpus terms within `maxEdits` DAMERAU edits (ES's
    * `string_distance: internal` counts a transposition as one edit;
    * excluding the token itself), ranked by doc_freq desc, distance asc,
    * term asc; top `size` per token. The length pre-filter bounds the
    * distance evaluations (|len(term) − len(token)| ≤ maxEdits is a
    * necessary condition for Damerau distance ≤ maxEdits — transpositions
    * preserve length). */
  def termSuggest(df: DataFrame, idCol: Column, field: Column, text: String,
                  size: Int = 5, maxEdits: Int = 2,
                  mode: String = "always"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val inputs = analyze(text).distinct.toDF("token")
    // distance-0 rows ride along so the input token's own doc_freq (the
    // `suggest_mode` gate) comes out of the SAME vocabulary pass — no
    // second corpus aggregation; they are dropped before ranking.
    val cands = vocabulary(df, idCol, field)
      .join(broadcast(inputs),
        abs(length(col("term")) - length(col("token"))) <= maxEdits &&
          graft.functions.EditDistance.fuzzyLev(col("term"), col("token")) <= maxEdits)
      .withColumn("distance",
        graft.functions.EditDistance.fuzzyLev(col("term"), col("token")))
      .withColumn("_in_df", coalesce(
        max(when(col("distance") === 0, col("doc_freq")))
          .over(Window.partitionBy("token")), lit(0L)))
    val gate = mode match {
      case "always"  => lit(true)
      case "missing" => col("_in_df") === 0   // only correct absent terms
      case "popular" => col("doc_freq") > col("_in_df") // strictly more frequent
      case other => throw new IllegalArgumentException(s"suggest_mode: $other")
    }
    cands.filter(col("distance") > 0 && gate)
      .withColumn("rank", row_number().over(
        Window.partitionBy("token")
          .orderBy(desc("doc_freq"), col("distance"), col("term"))))
      .filter(col("rank") <= size)
      .select(col("token"), col("rank"), col("term").as("suggestion"),
        col("distance"), col("doc_freq"))
  }

  /** ES completion suggester: prefix completions from the corpus term
    * dictionary weighted by total term frequency, top `size` by weight
    * desc, term asc. Sort-limit — no window.
    *
    * ES 6.5 extensions:
    *  - `fuzziness` > 0: tolerant prefix match — a term completes the
    *    typed prefix if SOME prefix of the term (length within ±fuzziness
    *    of the typed length, insertions/deletions shift it) is within
    *    `fuzziness` Damerau edits of the input; the first
    *    `fuzzyPrefixLength` characters must still match exactly (ES's
    *    fuzzy.prefix_length default 1 — prunes the automaton, and here
    *    prunes before any distance evaluation).
    *  - `contexts`: (column, allowed values) pre-filters the corpus BEFORE
    *    the vocabulary aggregation — the ES context-filtered completion
    *    index. A context filter both narrows candidates and changes
    *    weights to in-context frequencies, exactly like a per-context
    *    completion field.
    * Scale shape unchanged: context filter pushes into the scan; the fuzzy
    * distance evaluates on the DISTINCT vocabulary (post-aggregation),
    * ≤ 2·fuzziness+1 short-prefix Damerau calls per distinct term. */
  def completionSuggest(df: DataFrame, idCol: Column, field: Column,
                        prefix: String, size: Int = 5,
                        fuzziness: Int = 0, fuzzyPrefixLength: Int = 1,
                        contexts: Seq[(Column, Seq[String])] = Nil): DataFrame = {
    val p = prefix.toLowerCase
    val scoped = contexts.foldLeft(df) { case (acc, (c, vs)) =>
      acc.filter(c.isin(vs: _*))
    }
    val matches =
      if (fuzziness == 0) col("term").startsWith(p)
      else {
        val exact = substring(col("term"), 1, fuzzyPrefixLength) ===
          lit(p.take(fuzzyPrefixLength))
        val lens = (math.max(fuzzyPrefixLength, p.length - fuzziness) to
          (p.length + fuzziness)).toSeq
        // prefix_length >= |prefix|+fuzziness pins the whole typed prefix
        // exactly — the fuzzy clause degenerates to exact-prefix
        if (lens.isEmpty) col("term").startsWith(p)
        else {
          val dists = lens.map(j => graft.functions.EditDistance.fuzzyLev(
            substring(col("term"), 1, j), lit(p)))
          exact && dists.reduce(least(_, _)) <= fuzziness
        }
      }
    vocabulary(scoped, idCol, field)
      .filter(matches)
      .orderBy(desc("term_freq"), col("term"))
      .limit(size)
      .select(col("term").as("suggestion"), col("term_freq").as("weight"))
  }

  /** ES phrase suggester (n-token form): per-position candidates within
    * `maxEdits` (the original token included, ES `always` mode), top
    * `shardSize` each by doc_freq; candidate phrases = the cross product
    * of the tiny per-position sets, scored by the SUM of the phrase's
    * consecutive-bigram corpus counts (an exact-integer stand-in for ES's
    * Stupid-Backoff LM — deterministic across engines, same ranking on
    * in-corpus bigrams; for a 2-token input this is exactly the single
    * bigram count). A 1-token input ranks by unigram term_freq. Top
    * `size` by score desc, phrase asc.
    *
    * Exactly two corpus passes: the vocabulary aggregation (persisted —
    * all candidate positions rank over ONE pass, window partitioned by
    * position, the [[termSuggest]] shape) and ONE fixed-list bigram-count
    * kernel pass scoring the DISTINCT bigrams of all candidate phrases
    * ([[graft.functions.TextKernels.BigramFreqsKernel]] — the
    * explode-all-bigrams + groupBy + join formulation shuffled the
    * corpus's ENTIRE bigram set to score ~25 candidates, 5.5 s of the old
    * 7.4 s at sf0.1). The candidate terms come to the driver
    * (≤ n×shardSize strings — query construction, the same step ES runs
    * on the coordinating node; more_like_this precedent), and the final
    * ranking is over the summed exact-integer counts. The driver-side
    * phrase product is bounded at 4096 (shardSize^n is the caller's knob —
    * ES likewise caps the candidate generator, and per-position top-
    * shard_size keeps each factor small). */
  def phraseSuggest(df: DataFrame, idCol: Column, field: Column, text: String,
                    size: Int = 3, shardSize: Int = 5, maxEdits: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = analyze(text)
    require(toks.nonEmpty, "phrase suggester needs at least one token")
    val vocab = graft.ext.Dedup.persistOnce(vocabulary(df, idCol, field))
    val inputs = toks.zipWithIndex.toDF("token", "pos")
    val cands = vocab
      .join(broadcast(inputs),
        abs(length(col("term")) - length(col("token"))) <= maxEdits &&
          graft.functions.EditDistance.fuzzyLev(col("term"), col("token")) <= maxEdits)
      .withColumn("rank", row_number().over(
        Window.partitionBy("pos").orderBy(desc("doc_freq"), col("term"))))
      .filter(col("rank") <= shardSize)
      .select(col("pos"), col("term"), col("term_freq"))
      .collect()
    if (toks.length == 1) {
      // no bigram context: rank the candidates by unigram frequency (the
      // backoff floor of the LM), already in hand from the vocab pass
      return cands.map(r => (r.getString(1), r.getLong(2)))
        .toSeq.toDF("suggestion", "score")
        .orderBy(desc("score"), col("suggestion"))
        .limit(size)
    }
    val byPos: Seq[Seq[String]] = toks.indices.map(p =>
      cands.filter(_.getInt(0) == p).map(_.getString(1)).toSeq.sorted)
    val phraseToks: Seq[Seq[String]] =
      byPos.foldLeft(Seq(Seq.empty[String])) { (acc, cs) =>
        for (a <- acc; c <- cs) yield a :+ c
      }.filter(_.length == toks.length) // empty if any position has no candidate
    require(phraseToks.size <= 4096,
      s"phrase candidate product ${phraseToks.size} exceeds 4096 — lower shard_size")
    if (phraseToks.isEmpty) return Seq.empty[(String, Long)].toDF("suggestion", "score")
    val grams = phraseToks.map(_.sliding(2).map(_.mkString(" ")).toSeq)
    val distinctGrams = grams.flatten.distinct
    val sums = distinctGrams.indices.map(i =>
      sum(element_at(col("_bf"), i + 1)).cast("long").as(s"_s$i"))
    val freqs = df
      .select(graft.functions.TextKernels.bigramFreqs(field, distinctGrams).as("_bf"))
      .agg(sums.head, sums.tail: _*)
      .collect()(0)
    val gramCount: Map[String, Long] = distinctGrams.zipWithIndex.map { case (g, i) =>
      g -> (if (freqs.isNullAt(i)) 0L else freqs.getLong(i))
    }.toMap
    phraseToks.zip(grams)
      .map { case (ts, gs) => (ts.mkString(" "), gs.map(gramCount).sum) }
      .toDF("suggestion", "score")
      .orderBy(desc("score"), col("suggestion"))
      .limit(size)
  }
}
