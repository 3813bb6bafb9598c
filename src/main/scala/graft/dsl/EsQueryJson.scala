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
  *    match_all/bool (must/should/must_not/filter + minimum_should_match)/
  *    query_string/simple_query_string (Lucene query-bar syntax, [[QueryString]])
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

  /** Injected clock for date math ([[DateMath]]) — pin `now` around query
    * CONSTRUCTION (resolution happens on the driver while the plan is
    * built): `EsQueryJson.withNow("1996-06-15T08:30:00Z") { search(...) }`.
    * A `"now"` key inside a range body overrides it per-query. */
  private val clock = new scala.util.DynamicVariable[Option[java.time.Instant]](None)

  def withNow[T](isoInstant: String)(f: => T): T =
    clock.withValue(Some(java.time.Instant.parse(isoInstant)))(f)

  /** Named-table registry for the `terms` lookup query (ES fetches the
    * lookup doc from another index on the coordinating node, then inlines
    * its values — the registry is the "other index" set). Scoped like the
    * clock: `withTables("nation" -> nationDf) { search(...) }`. */
  private val lookupTables =
    new scala.util.DynamicVariable[Map[String, DataFrame]](Map.empty)

  def withTables[T](tables: (String, DataFrame)*)(f: => T): T =
    lookupTables.withValue(tables.toMap)(f)

  /** Validate-only mode ([[validateQuery]]): three constructs need
    * driver-side STATS during compilation — the terms-lookup value
    * fetch, `common` terms' cutoff-frequency document counts, and
    * `auto_date_histogram`'s min/max span probe. Under this flag those
    * collects are replaced by deterministic placeholders (the plans are
    * still BUILT, so Spark's eager analysis keeps catching unknown
    * fields / type errors in the same subtrees) and validation runs no
    * Spark job — matching ES's no-shard-touched `_validate` contract. */
  private val validateOnly = new scala.util.DynamicVariable[Boolean](false)

  /** Schema of the frame the current request runs against, set by the
    * df-bearing entry points ([[search]], [[deleteByQuery]], ...). Lets
    * leaf compilers make FIELD-TYPE-aware parse decisions the way ES's
    * mapping does — e.g. a textual range bound against a numeric field
    * must coerce at PARSE time (junk → invalid_query, ES's
    * number_format_exception) instead of compiling into a lazy ANSI cast
    * that explodes executor-side (found by EsJsonFuzzSpec). Empty when a
    * predicate is built standalone — checks then degrade to the old
    * behavior, never to a false rejection. */
  private val querySchema =
    new scala.util.DynamicVariable[Option[org.apache.spark.sql.types.StructType]](None)

  /** The frame the current request runs against — the statistics source
    * for constructs whose QUERY CONSTRUCTION needs corpus stats the way
    * ES's coordinating node uses index stats (`more_like_this` term
    * selection). Scoped with [[querySchema]] by every df-bearing entry
    * point. */
  private val queryFrame = new scala.util.DynamicVariable[Option[DataFrame]](None)

  private def withSchemaOf[T](df: DataFrame)(f: => T): T =
    querySchema.withValue(Some(df.schema))(
      queryFrame.withValue(Some(df))(f))

  /** Stored-script registry (ES `PUT _scripts/{id}` / `GET _scripts/{id}`):
    * wherever a body accepts an inline painless `source`, `{"script":
    * {"id": "..."}}` resolves through here instead — same scoping
    * discipline as [[withTables]]. */
  private val storedScripts =
    new scala.util.DynamicVariable[Map[String, String]](Map.empty)

  def withScripts[T](scripts: (String, String)*)(f: => T): T =
    storedScripts.withValue(scripts.toMap)(f)

  /** Custom-analyzer registry for the `synonym` token filter — the day-one
    * ES index configuration this engine previously lacked. An analyzer
    * name registered here is usable wherever a body says `"analyzer":
    * "<name>"`; its behavior is standard tokenization + SEARCH-TIME
    * synonym expansion (the ES `synonym` filter on a search analyzer):
    * each query term expands to its synonym set and matches if the doc
    * contains ANY member; msm counts original term positions, exactly as
    * ES counts one position per expanded synonym group.
    *
    * Rules use Lucene/Solr synonym syntax, one rule per string:
    *   - `"quick, fast, speedy"` — equivalence class: each member expands
    *     to the whole class;
    *   - `"db, rdbms => database"` — explicit mapping: LHS terms are
    *     REPLACED by the RHS set (LHS no longer matches itself unless
    *     listed on the RHS).
    * Scoped like [[withTables]]: `withSynonyms("syn", rules) { search(...) }`.
    */
  private val synonymAnalyzers =
    new scala.util.DynamicVariable[Map[String, Map[String, Seq[String]]]](Map.empty)

  /** Shingle-analyzer registry (ES `shingle` token filter in a custom
    * analyzer): `withShingles("sh", min, max, outputUnigrams) { ... }`
    * makes `"analyzer": "sh"` tokenize into word n-grams of every size in
    * [min, max] (plus unigrams when requested) — the phrase-ish matching /
    * n-gram-agg building block. Same DynamicVariable scoping as
    * [[withTables]]. */
  private val shingleAnalyzers =
    new scala.util.DynamicVariable[Map[String, (Int, Int, Boolean)]](Map.empty)

  def withShingles[T](name: String, minSize: Int = 2, maxSize: Int = 2,
                      outputUnigrams: Boolean = false)(f: => T): T = {
    require(minSize >= 2 && maxSize >= minSize,
      s"shingle sizes must satisfy 2 <= min <= max, got [$minSize, $maxSize]")
    shingleAnalyzers.withValue(
      shingleAnalyzers.value + (name -> ((minSize, maxSize, outputUnigrams))))(f)
  }

  /** (edge_)ngram-analyzer registry (ES `edge_ngram` / `ngram` token
    * filters in a custom analyzer — the canonical production autocomplete
    * mapping): `withEdgeNgrams("ac", 1, 8) { ... }` makes a field bound
    * via [[withIndexAnalyzer]] store each token's PREFIXES of length
    * [min, max] ([[withNgrams]]: every substring of those lengths). The
    * engine models the mapping ES itself documents for autocomplete —
    * `search_analyzer: "standard"` — so the QUERY text stays
    * standard-analyzed: typing "spa" term-matches docs whose stream
    * stores the gram, while gramming the query too would make "spa" also
    * match any doc sharing "s" (the documented footgun). Values are
    * (minGram, maxGram, edge). Same DynamicVariable scoping as
    * [[withTables]]. */
  private val ngramAnalyzers =
    new scala.util.DynamicVariable[Map[String, (Int, Int, Boolean)]](Map.empty)

  def withEdgeNgrams[T](name: String, minGram: Int = 1, maxGram: Int = 20)(f: => T): T = {
    require(minGram >= 1 && maxGram >= minGram,
      s"edge_ngram sizes must satisfy 1 <= min <= max, got [$minGram, $maxGram]")
    ngramAnalyzers.withValue(
      ngramAnalyzers.value + (name -> ((minGram, maxGram, true))))(f)
  }

  def withNgrams[T](name: String, minGram: Int, maxGram: Int)(f: => T): T = {
    require(minGram >= 1 && maxGram >= minGram,
      s"ngram sizes must satisfy 1 <= min <= max, got [$minGram, $maxGram]")
    ngramAnalyzers.withValue(
      ngramAnalyzers.value + (name -> ((minGram, maxGram, false))))(f)
  }

  /** ES `_analyze` honoring the REGISTERED analyzer chains: a synonym
    * analyzer emits expansion members at the ORIGINAL token's position
    * (type `SYNONYM` for added members, `word` for the surviving
    * original — ES's token-type convention; a multi-word member emits as
    * one token, the [[withSynonyms]] subset); a shingle analyzer emits
    * positional word n-grams (position = starting token index, type
    * `shingle`, unigrams `word`). Unregistered names fall through to the
    * built-in [[EsDsl.analyzeApi]] analyzers. Narrow passes throughout. */
  def analyzeApi(df: DataFrame, idCol: Column, text: Column,
                 analyzer: String): DataFrame =
    if (synonymAnalyzers.value.contains(analyzer)) {
      val syn = synonymAnalyzers.value(analyzer)
      df.select(idCol.as("doc_id"),
          posexplode(graft.ext.TextAnalysis.tokens(text)).as(Seq("position", "_tok")))
        .withColumn("_members",
          coalesce(element_at(typedLit(syn), col("_tok")), array(col("_tok"))))
        .select(col("doc_id"), col("position"), col("_tok"),
          explode(col("_members")).as("token"))
        .withColumn("token_type",
          when(col("token") === col("_tok"), "word").otherwise("SYNONYM"))
        .drop("_tok")
    } else if (shingleAnalyzers.value.contains(analyzer)) {
      val (mn, mx, uni) = shingleAnalyzers.value(analyzer)
      val toksC = graft.ext.TextAnalysis.tokens(text)
      val base = df.select(idCol.as("doc_id"), toksC.as("_w"))
      val parts = (mn to mx).map { n =>
        base.filter(org.apache.spark.sql.functions.size(col("_w")) >= n)
          .select(col("doc_id"), posexplode(expr(
            s"transform(sequence(1, size(_w) - ${n - 1}), i -> concat_ws(' ', slice(_w, i, $n)))"))
            .as(Seq("position", "token")))
          .withColumn("token_type", lit("shingle"))
      } ++ (if (uni)
        Seq(base.select(col("doc_id"), posexplode(col("_w")).as(Seq("position", "token")))
          .withColumn("token_type", lit("word")))
      else Nil)
      parts.reduce(_ unionAll _)
    } else if (ngramAnalyzers.value.contains(analyzer)) {
      // (edge_)ngram filter: grams share the SOURCE token's position
      // (filters emit at posIncrement 0 after the first gram; ES's
      // _analyze reports the token position), type "word" as Lucene's
      // (Edge)NGramTokenFilter leaves it
      val (mn, mx, edge) = ngramAnalyzers.value(analyzer)
      df.select(idCol.as("doc_id"),
          posexplode(graft.ext.TextAnalysis.tokens(text)).as(Seq("position", "_tok")))
        .select(col("doc_id"), col("position"),
          explode(split(graft.functions.TextKernels.ngramStream(col("_tok"), mn, mx, edge), " "))
            .as("token"))
        .filter(col("token") =!= "")
        .withColumn("token_type", lit("word"))
    } else EsDsl.analyzeApi(df, idCol, text, analyzer)

  /** Per-FIELD index-time analyzer binding — the ES mapping's `analyzer`
    * property (vs the body-level `analyzer`, which is the SEARCH
    * analyzer). `withIndexAnalyzer("text", "syn") { search(...) }` makes
    * match queries over that field run against the index-time-EXPANDED
    * token stream: tf counts every stacked member, df counts docs
    * containing ANY member, and the field length (Lucene counts stacked
    * tokens in FieldInvertState.length) inflates accordingly — so BM25
    * scores genuinely differ from search-time-only expansion. Query terms
    * go through the standard search analyzer (the mapping's
    * `search_analyzer: "standard"` configuration — ES 6.5's recommended
    * setup once synonyms live in the index analyzer). Single-token
    * synonym members only: ES itself documents that multi-word synonyms
    * at index time corrupt positions (use search-time expansion there,
    * which [[withSynonyms]] + body `analyzer` already provide). */
  private val indexAnalyzers =
    new scala.util.DynamicVariable[Map[String, String]](Map.empty)

  def withIndexAnalyzer[T](fieldName: String, analyzer: String)(f: => T): T =
    indexAnalyzers.withValue(indexAnalyzers.value + (fieldName -> analyzer))(f)

  // Index-time analyzers resolve against the same registries as
  // search-time ones: a [[withShingles]]-registered name bound via
  // [[withIndexAnalyzer]] applies Lucene's shingle filter at INDEX time
  // with `token_separator: "_"` — the separator choice that keeps
  // shingle terms single tokens under the standard `\W+` tokenizer
  // (underscore is a word character), so the stored-stream re-join
  // trick stays lossless. Like index-time synonyms (a171), index-time
  // shingling changes what search-time shingling cannot: the field
  // length (2n−1 stacked tokens for bigrams+unigrams) inflates BM25's
  // length normalization for every query, and shingle terms get real
  // df/tf — a match for "table_hash" hits only docs with the adjacent
  // pair.
  //
  // SEARCH-ANALYZER DEFAULTING (ES 6.5): a `match` with no body-level
  // `analyzer` against an index-analyzed field analyzes the QUERY with
  // the same chain ([[defaultSearchTerms]]) — a shingled field expands
  // "hash table" to the terms {hash, table, hash_table} (the "_" is
  // the index chain's token_separator), an english field stops+stems
  // the query. Oracle rows: a197/a206 (shingles), a204 (english).
  // Synonym index analyzers are the exception BY MAPPING: this engine
  // models the `search_analyzer: "standard"` configuration ES itself
  // recommends once synonyms live in the index chain (query-side
  // re-expansion would double-expand), documented at [[storedField]].

  /** The STORED view of a field: the raw text, or — when the field has a
    * registered index analyzer — the expanded token stream re-joined to
    * text (tokens are `\W+`-free, so a space join round-trips through the
    * standard tokenizer losslessly). Narrow HOF, stays in codegen. */
  private def storedField(f: String): Column =
    indexAnalyzers.value.get(f) match {
      case None => field(f)
      case Some(an) if shingleAnalyzers.value.contains(an) =>
        val (mn, mx, uni) = shingleAnalyzers.value(an)
        // one compiled pass — the HOF form of this expansion ran
        // interpreted per token and dominated the a197 BM25 row
        graft.functions.TextKernels.shingleStream(field(f), mn, mx, uni)
      case Some(an) if ngramAnalyzers.value.contains(an) =>
        // index-time (edge_)ngram: the stored stream is the per-token
        // gram expansion — gram terms get real df/tf and dl inflates to
        // the gram count, the two deltas a search-time wildcard/prefix
        // query cannot produce (and the reason autocomplete BM25 ranks
        // short docs above long ones)
        val (mn, mx, edge) = ngramAnalyzers.value(an)
        graft.functions.TextKernels.ngramStream(field(f), mn, mx, edge)
      case Some("english") =>
        // index-time `english` (the ES mapping `"analyzer": "english"`):
        // the stored stream is the stopped+S-stemmed token stream. What
        // search-time `english` analysis cannot change, this does: dl
        // SHRINKS (stopwords leave the field length), df/tf move onto
        // the stems, and avgdl shifts for every query against the field.
        // Stemmed tokens stay `[a-z0-9_]+`, so the space re-join
        // round-trips through the standard tokenizer losslessly — the
        // same stored-view trick as synonyms/shingles. (`cjk` CANNOT use
        // this trick: its bigram tokens are non-ASCII, which the
        // standard `\W+` re-tokenize would destroy — an index-time cjk
        // mapping needs a stored token-array view, rejected loudly
        // below rather than silently corrupted.)
        array_join(graft.functions.TextKernels.englishTokens(field(f)), " ")
      case Some("cjk") =>
        throw new IllegalArgumentException(
          "index-time 'cjk' is unsupported: CJK bigram tokens do not survive " +
            "the standard-tokenizer round trip of the stored-view trick " +
            "(use search-time cjk analysis)")
      case Some(an) =>
        val syn = synonymAnalyzers.value.getOrElse(an,
          throw new IllegalArgumentException(
            s"index analyzer '$an' is not a withSynonyms- or " +
              "withShingleAnalyzer-registered analyzer"))
        require(syn.values.forall(_.forall(!_.contains(" "))),
          s"index-time analyzer '$an' has multi-word synonym members — " +
            "ES corrupts positions there; use search-time expansion")
        array_join(flatten(transform(graft.ext.TextAnalysis.tokens(field(f)),
          t => coalesce(element_at(typedLit(syn), t), array(t)))), " ")
    }

  /** ES 6.5 defaults a field's `search_analyzer` to its index analyzer:
    * when the field is index-analyzed and the body names no analyzer,
    * the QUERY text runs through the same chain. Returns the analyzed
    * query terms, or None when the query side stays standard-analyzed
    * (no index analyzer on the field, or a synonym index analyzer —
    * the documented explicit-`search_analyzer: "standard"` mapping).
    * Shingle terms join with "_", the index chain's token_separator,
    * so they hit the stored stream's shingle tokens exactly. */
  private def defaultSearchTerms(f: String, text: String): Option[Seq[String]] =
    indexAnalyzers.value.get(f).flatMap {
      case an if shingleAnalyzers.value.contains(an) =>
        val (mn, mx, uni) = shingleAnalyzers.value(an)
        val qToks = text.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
        Some(((mn to mx).flatMap(n => qToks.sliding(n).filter(_.length == n)
          .map(_.mkString("_"))) ++ (if (uni) qToks else Nil)).distinct)
      case "english" =>
        Some(text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
          .filterNot(graft.functions.TextKernels.englishStopwords.contains)
          .map(graft.functions.TextKernels.stemEnglish).distinct)
      case _ => None // synonyms + (edge_)ngrams: search_analyzer stays
                     // standard by mapping (ES's own autocomplete setup —
                     // gramming the query would match every shared 1-gram)
    }

  /** Phrase queries against an index-analyzed field: ES defaults the
    * search analyzer to the index analyzer here too, so the phrase runs
    * over the STORED stream with the query analyzed by the same chain —
    * never over the raw text (which the index does not contain).
    * Supported for `english`: both sides are the stop-dropped stemmed
    * stream, so the semantic is "phrase over the stop-COLLAPSED stream"
    * (the stored-view re-join collapses the position gaps ES's stop
    * filter leaves, on both sides — a stopword inside the doc or the
    * query does not break adjacency; documented deviation, stopword-free
    * phrases are ES-exact). Shingle and synonym index chains REJECT
    * loudly: their stored views interleave expansion tokens between word
    * positions, which would corrupt phrase adjacency silently (for a
    * shingled field the shingle `match` IS the phrase surrogate; for
    * synonyms use search-time expansion, whose multi-word members
    * already run as phrase alternatives). Returns (doc-side column,
    * analyzed phrase terms). */
  private def phraseField(f: String, terms: Seq[String]): (Column, Seq[String]) =
    indexAnalyzers.value.get(f) match {
      case None => (field(f), terms)
      case Some("english") =>
        val ts = terms.map(_.toLowerCase)
          .filterNot(graft.functions.TextKernels.englishStopwords.contains)
          .map(graft.functions.TextKernels.stemEnglish)
        require(ts.nonEmpty,
          s"english analyzer removed every phrase term: ${terms.mkString(" ")}")
        (storedField(f), ts)
      case Some(an) => throw new IllegalArgumentException(
        s"match_phrase against field '$f' with index analyzer '$an' is unsupported: " +
          "the expanded stored stream interleaves tokens between word positions " +
          "(use the match form — shingle matches ARE the phrase surrogate; " +
          "english index analyzers support phrases)")
    }

  /** Body-derived msm over ANALYZED clause count (operator:and = all
    * clauses; percentages/negatives resolve against the analyzed total) —
    * the counting every analyzer-aware match branch shares. */
  private def analyzedMsm(v: JsonNode, nClauses: Int): Int =
    if (v.isObject && Option(v.get("operator")).map(_.asText()).contains("and")) nClauses
    else if (v.isObject)
      Option(v.get("minimum_should_match")).map(msmOf(_, nClauses)).getOrElse(1)
    else 1

  def withSynonyms[T](name: String, rules: Seq[String])(f: => T): T = {
    val m = scala.collection.mutable.Map.empty[String, Seq[String]]
    rules.foreach { rule =>
      def toks(s: String) = s.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq
      rule.split("=>") match {
        case Array(lhs, rhs) =>
          val to = toks(rhs)
          toks(lhs).foreach(t => m(t) = (m.getOrElse(t, Seq.empty) ++ to).distinct)
        case Array(eq) =>
          val cls = toks(eq)
          cls.foreach(t => m(t) = (m.getOrElse(t, Seq.empty) ++ cls).distinct)
        case _ => throw new IllegalArgumentException(s"bad synonym rule: $rule")
      }
    }
    synonymAnalyzers.withValue(synonymAnalyzers.value + (name -> m.toMap))(f)
  }

  /** Script node → painless source: inline string, `{"source": ...}`, or
    * a stored-script `{"id": ...}` reference. */
  private def scriptSource(sNode: JsonNode): String =
    if (sNode.isObject) Option(sNode.get("source")).map(_.asText()).getOrElse {
      val id = Option(sNode.get("id")).map(_.asText()).getOrElse(
        throw new IllegalArgumentException("script needs source or id"))
      storedScripts.value.getOrElse(id, throw new IllegalArgumentException(
        s"stored script '$id' not registered (use EsQueryJson.withScripts)"))
    }
    else sNode.asText()

  /** Script node → its `"params": {...}` bindings (every ES script
    * context carries the same shape). Empty for inline-string scripts. */
  private def scriptParams(sNode: JsonNode): Map[String, Any] =
    if (sNode == null || !sNode.isObject) Map.empty
    else Option(sNode.get("params")).map(_.fields().asScala.map { e =>
      val v = e.getValue
      val any: Any =
        if (v.isTextual) v.asText()
        else if (v.isBoolean) v.asBoolean()
        else if (v.isIntegralNumber) v.asLong()
        else if (v.isNumber) v.asDouble()
        else throw new IllegalArgumentException(
          s"unsupported script param JSON type for '${e.getKey}': $v")
      e.getKey -> any
    }.toMap).getOrElse(Map.empty)

  /** ES field name → Column (map-doc aware). `<field>.keyword` resolves
    * to the raw column: ES's default text mapping adds an UN-ANALYZED
    * keyword sub-field holding the source string verbatim, and
    * relationally the raw column IS that sub-field (term/sort/agg on
    * `.keyword` = whole-string semantics, match on the base field =
    * analyzed semantics — same column, two access paths). */
  def field(name: String): Column =
    if (name.startsWith("info.")) element_at(col("info"), name.stripPrefix("info."))
    else if (name.endsWith(".keyword")) col(name.stripSuffix(".keyword"))
    else col(name)

  /** `"title^3"` per-field boost syntax (ES multi_match fields lists):
    * the field's score scales by the boost before the type combine. */
  private def splitFieldBoost(s: String): (String, Double) = s.split("\\^") match {
    case Array(f) => (f, 1.0)
    case Array(f, b) => (f, b.toDouble)
    case _ => throw new IllegalArgumentException(s"bad field boost: $s")
  }

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

  /** Collect `_name`-tagged leaf clauses anywhere in a query tree: the
    * name plus the clause node itself (the `_name` key rides inside the
    * field spec and every leaf compiler ignores it, as ES does). */
  private def namedClauses(q: JsonNode): Seq[(String, JsonNode)] = {
    val (kind, body) = single(q)
    kind match {
      case "bool" =>
        Seq("must", "should", "filter", "must_not").flatMap(k =>
          Option(body.get(k)).toSeq
            .flatMap(b => if (b.isArray) b.elements().asScala.toSeq else Seq(b))
            .flatMap(namedClauses))
      case "constant_score" | "function_score" =>
        // inner clauses evaluate in the top-level field context — recurse,
        // including function_score's per-function filters (a _name there
        // was silently dropped before round 8)
        Seq("filter", "query").flatMap(k => Option(body.get(k)).toSeq).flatMap(namedClauses) ++
          Option(body.get("functions")).toSeq
            .flatMap(_.elements().asScala.toSeq)
            .flatMap(fn => Option(fn.get("filter")).toSeq)
            .flatMap(namedClauses)
      case "dis_max" =>
        Option(body.get("queries")).toSeq
          .flatMap(_.elements().asScala.toSeq).flatMap(namedClauses)
      case "boosting" =>
        Seq("positive", "negative").flatMap(k => Option(body.get(k)).toSeq).flatMap(namedClauses)
      case "nested" | "has_child" | "has_parent" =>
        // inner fields bind to a different resolver; a _name there cannot
        // be re-evaluated per top-level row — reject loudly, don't drop it
        require(!subtreeHasName(body),
          s"_name inside a '$kind' query is not supported")
        Seq.empty
      case _ =>
        body.fields().asScala.toSeq.collect {
          case e if e.getValue.isObject && e.getValue.has("_name") =>
            e.getValue.get("_name").asText() -> q
        }
    }
  }

  private def subtreeHasName(n: JsonNode): Boolean =
    (n.isObject && n.has("_name")) || n.elements().asScala.exists(subtreeHasName)

  /** Translate an ES `query` object to a predicate Column. */
  def predicate(q: JsonNode): Column = predicateWith(q, field)

  /** As [[predicate]], with a pluggable field resolver — the `nested`
    * query rebinds field names to struct members of the array element. */
  /** Query-clause option allowlists, split by body shape. ES 6.5 rejects
    * unknown clause params; silently ignoring one is the worst of the
    * misparse classes — a typo'd range bound (`"ltee"`) turns the clause
    * into match-all with no diagnostic. Body-level kinds check the clause
    * body's keys; field-keyed kinds ({"term": {field: spec}}) check the
    * SPEC keys when the value is an object. Kinds with dynamic bodies
    * (terms, the geo family, percolate) are absent → validated by their
    * own parse. Accuracy-only knobs (rewrite, max_expansions,
    * max_determinized_states — this engine evaluates exactly what ES
    * approximates) and response-metadata-only ones (_name, boost in
    * filter context) are allowed through. */
  private val queryBodyKeys: Map[String, Set[String]] = Map(
    "exists" -> Set("field", "boost"),
    "ids" -> Set("values", "type", "boost"),
    "bool" -> Set("must", "should", "must_not", "filter",
      "minimum_should_match", "boost", "adjust_pure_negative", "_name"),
    "multi_match" -> Set("query", "fields", "type", "operator",
      "minimum_should_match", "tie_breaker", "boost", "fuzziness",
      "prefix_length", "slop"),
    "query_string" -> Set("query", "default_field", "fields",
      "default_operator", "boost"),
    "simple_query_string" -> Set("query", "default_field", "fields",
      "default_operator", "boost"),
    "constant_score" -> Set("filter", "boost"),
    "dis_max" -> Set("queries", "tie_breaker", "boost"),
    "function_score" -> Set("query", "functions", "score_mode",
      "boost_mode", "boost"),
    "boosting" -> Set("positive", "negative", "negative_boost", "boost"),
    "nested" -> Set("path", "query", "score_mode", "inner_hits"),
    "has_child" -> Set("type", "query", "score_mode", "min_children",
      "max_children"),
    "has_parent" -> Set("parent_type", "query", "score"),
    "parent_id" -> Set("type", "id"),
    "wrapper" -> Set("query"),
    "span_near" -> Set("clauses", "slop", "in_order", "boost"),
    "span_first" -> Set("match", "end", "boost"),
    "span_or" -> Set("clauses", "boost"),
    "span_not" -> Set("include", "exclude", "pre", "post", "boost"),
    "span_containing" -> Set("big", "little", "boost"),
    "span_within" -> Set("big", "little", "boost"),
    "script" -> Set("script", "boost"),
    "match_all" -> Set("boost"),
    "match_none" -> Set[String]())

  private val fieldQuerySpecKeys: Map[String, Set[String]] = Map(
    "term" -> Set("value", "boost"),
    "range" -> Set("gte", "gt", "lte", "lt", "boost", "now"),
    "prefix" -> Set("value", "boost", "rewrite"),
    "wildcard" -> Set("value", "boost", "rewrite"),
    "regexp" -> Set("value", "boost", "rewrite", "max_determinized_states"),
    "fuzzy" -> Set("value", "fuzziness", "prefix_length", "transpositions",
      "boost", "max_expansions", "rewrite"),
    "match" -> Set("query", "operator", "minimum_should_match", "analyzer",
      "fuzziness", "prefix_length", "zero_terms_query", "boost"),
    "match_phrase" -> Set("query", "slop", "analyzer", "boost"),
    "match_phrase_prefix" -> Set("query", "max_expansions", "boost"),
    "common" -> Set("query", "cutoff_frequency"),
    "terms_set" -> Set("terms", "minimum_should_match_field", "boost"),
    "span_term" -> Set("value", "boost"))

  private def checkQuerySpec(kind: String, body: JsonNode): Unit = {
    // `_name` (named queries, a74) rides on ANY clause
    queryBodyKeys.get(kind).foreach { allowed =>
      if (body != null && body.isObject) {
        val unknown = body.fieldNames().asScala.toSeq
          .filterNot(k => allowed(k) || k == "_name")
        require(unknown.isEmpty,
          s"unknown $kind option(s): ${unknown.sorted.mkString(", ")}")
      }
    }
    fieldQuerySpecKeys.get(kind).foreach { allowed =>
      if (body != null && body.isObject && body.size() == 1) {
        val spec = body.elements().next()
        if (spec.isObject) {
          val unknown = spec.fieldNames().asScala.toSeq
            .filterNot(k => allowed(k) || k == "_name")
          require(unknown.isEmpty,
            s"unknown $kind option(s): ${unknown.sorted.mkString(", ")}")
        }
      }
    }
  }

  private def predicateWith(q: JsonNode, fld: String => Column): Column = {
    def field(name: String): Column = fld(name) // shadow: all cases resolve through fld
    val (kind, body) = single(q)
    checkQuerySpec(kind, body)
    kind match {
      case "match_all" => lit(true)
      case "match_none" => lit(false)
      case "span_near" =>
        val clauses = body.get("clauses").elements().asScala.toSeq
        require(clauses.size == 2, s"span_near supports exactly 2 clauses, got ${clauses.size}")
        // each clause: span_term, span_multi wrapping prefix/wildcard/
        // regexp, or field_masking_span lifting a span_term from ANOTHER
        // field into this one's position space. The tuple is (field the
        // clause CLAIMS to be on, kind, value, field the tokens actually
        // come from) — masking makes the two differ.
        def side(c: JsonNode): (String, String, String, String) = {
          val (ck, cb) = single(c)
          ck match {
            case "span_term" =>
              val (f, v) = single(cb); (f, "term", v.asText(), f)
            case "span_multi" =>
              val (mk, mb) = single(cb.get("match"))
              require(Set("prefix", "wildcard", "regexp")(mk),
                s"span_multi supports prefix/wildcard/regexp, got $mk")
              val (f, vn) = single(mb)
              (f, mk, (if (vn.isObject) vn.get("value") else vn).asText(), f)
            case "field_masking_span" =>
              val masked = cb.get("field").asText()
              val (iq, ib) = single(cb.get("query"))
              require(iq == "span_term",
                s"field_masking_span supports a span_term inner query, got $iq")
              val (actual, v) = single(ib)
              (masked, "term", v.asText(), actual)
            case other => throw new IllegalArgumentException(
              s"span_near clause must be span_term, span_multi or field_masking_span, got $other")
          }
        }
        val (f1, k1, v1, a1) = side(clauses(0))
        val (f2, k2, v2, a2) = side(clauses(1))
        require(f1 == f2, s"span_near clauses must target one field, got $f1/$f2")
        val slop = Option(body.get("slop")).map(_.asInt()).getOrElse(0)
        val inOrder = Option(body.get("in_order")).map(_.asBoolean()).getOrElse(false)
        if (a1 == a2) {
          if (k1 == "term" && k2 == "term")
            graft.functions.Spans.spanNear(field(f1), v1, v2, slop, inOrder)
          else
            graft.functions.Spans.spanNearMulti(field(f1), k1, v1.toLowerCase,
              k2, v2.toLowerCase, slop, inOrder)
        } else {
          // masked cross-field near: positions of v1 in a1's token stream
          // against positions of v2 in a2's — the Lucene field-masking
          // contract (one shared position space; useful when the columns
          // are parallel token streams, e.g. raw vs stemmed). Same
          // distance rule as [[Spans.SpanNearMatch]]; cross-field tokens
          // at the SAME position count as overlapping spans and match
          // (distance 0 — there is no self-pairing to guard against).
          // Builtin HOFs over posexploded positions — codegen'd, narrow.
          require(k1 == "term" && k2 == "term",
            "field_masking_span composes with span_term clauses only")
          def positions(fieldName: String, term: String): Column =
            org.apache.spark.sql.functions.filter(
              transform(graft.ext.TextAnalysis.tokens(field(fieldName)),
                (t, i) => when(t === term, i)),
              p => p.isNotNull)
          val p1 = positions(a1, v1)
          val p2 = positions(a2, v2)
          exists(p1, p => exists(p2, q => {
            val ordered = q > p && q - p - 1 <= slop
            if (inOrder) ordered
            else ordered || (q === p) || (p > q && p - q - 1 <= slop)
          }))
        }
      case "span_multi" =>
        // a multi-term query lifted to a span. Standalone it degenerates to
        // "SOME token matches", evaluated over the delimiter-joined token
        // string (the matchPhrase trick): prefix stays one codegen'd
        // `contains`, wildcard/regexp one anchored `rlike` — no kernel, no
        // HOF. (Inside span_near the positional kernel side handles it.)
        val (mk, mb) = single(body.get("match"))
        val (f, vn) = single(mb)
        val v = (if (vn.isObject) vn.get("value") else vn).asText().toLowerCase
        val joined = concat(lit("|"),
          array_join(graft.ext.TextAnalysis.tokens(field(f)), "|"), lit("|"))
        mk match {
          case "prefix" => joined.contains("|" + v)
          case "wildcard" =>
            val re = v.flatMap {
              case '*' => "[^|]*"
              case '?' => "[^|]"
              case c if "\\.[]{}()^$+|".contains(c) => "\\" + c
              case c => c.toString
            }
            joined.rlike("\\|" + re + "\\|")
          case "regexp" => joined.rlike("\\|(?:" + v + ")\\|")
          case other => throw new IllegalArgumentException(
            s"span_multi supports prefix/wildcard/regexp, got $other")
        }
      case "span_first" =>
        val (f, v) = single(body.get("match").get("span_term"))
        graft.functions.Spans.spanFirst(field(f), v.asText(), body.get("end").asInt())
      case "span_or" =>
        // any span_term clause matches — over one field, a token-set test
        val terms = body.get("clauses").elements().asScala.toSeq.map(c => single(c.get("span_term")))
        require(terms.map(_._1).distinct.size == 1,
          s"span_or clauses must target one field, got ${terms.map(_._1).distinct}")
        EsDsl.matchQuery(field(terms.head._1), terms.map(_._2.asText()))
      case "span_not" =>
        val (f1, v1) = single(body.get("include").get("span_term"))
        val (f2, v2) = single(body.get("exclude").get("span_term"))
        require(f1 == f2, s"span_not include/exclude must target one field, got $f1/$f2")
        graft.functions.Spans.spanNot(field(f1), v1.asText(), v2.asText(),
          pre = Option(body.get("pre")).map(_.asInt()).getOrElse(0),
          post = Option(body.get("post")).map(_.asInt()).getOrElse(0))
      case "span_containing" | "span_within" =>
        // span_containing returns big spans, span_within little spans — as
        // document-level predicates both are "a big span contains a little
        // occurrence". big = span_near of two span_terms (in_order),
        // little = span_term.
        val big = body.get("big").get("span_near")
        val clauses = big.get("clauses").elements().asScala.toSeq
        require(clauses.size == 2, s"span_containing big must have 2 clauses, got ${clauses.size}")
        val (f1, v1) = single(clauses(0).get("span_term"))
        val (f2, v2) = single(clauses(1).get("span_term"))
        val (f3, v3) = single(body.get("little").get("span_term"))
        require(f1 == f2 && f2 == f3,
          s"span_containing clauses must target one field, got $f1/$f2/$f3")
        graft.functions.Spans.spanContaining(field(f1), v1.asText(), v2.asText(),
          slop = Option(big.get("slop")).map(_.asInt()).getOrElse(0), little = v3.asText())
      case "geo_distance" =>
        val dist = body.get("distance").asText()
        require(dist.endsWith("km"), s"geo_distance supports km distances, got $dist")
        val km = dist.stripSuffix("km").toDouble
        val rest = body.fieldNames().asScala.toSeq.filterNot(_ == "distance")
        require(rest.size == 1,
          s"geo_distance body must be 'distance' + exactly one point field " +
            s"(options like distance_type are unsupported), got $rest")
        val f = rest.head
        val pt = body.get(f)
        Geo.haversineKm(field(s"${f}_lat"), field(s"${f}_lon"),
          lit(pt.get("lat").asDouble()), lit(pt.get("lon").asDouble())) <= lit(km)
      case "geo_bounding_box" =>
        val (f, b) = single(body)
        val tl = b.get("top_left"); val br = b.get("bottom_right")
        Geo.boundingBox(field(s"${f}_lat"), field(s"${f}_lon"),
          tl.get("lat").asDouble(), tl.get("lon").asDouble(),
          br.get("lat").asDouble(), br.get("lon").asDouble())
      case "geo_polygon" =>
        val (f, b) = single(body)
        val pts = b.get("points").elements().asScala.toSeq
          .map(p => (p.get("lat").asDouble(), p.get("lon").asDouble()))
        Geo.pointInPolygon(field(s"${f}_lat"), field(s"${f}_lon"), pts)
      case "geo_shape" =>
        // documents carry POINTS; a shape query with relation=intersects is
        // then point-in-shape. envelope = bbox; polygon = GeoJSON ring
        // ([lon, lat] pairs, closing point repeated) via ray casting.
        val (f, b) = single(body)
        val shape = b.get("shape")
        val rel = Option(b.get("relation")).map(_.asText()).getOrElse("intersects")
        require(rel == "intersects", s"geo_shape over point fields supports intersects, got $rel")
        shape.get("type").asText() match {
          case "envelope" =>
            val cs = shape.get("coordinates")
            Geo.boundingBox(field(s"${f}_lat"), field(s"${f}_lon"),
              topLeftLat = cs.get(0).get(1).asDouble(), topLeftLon = cs.get(0).get(0).asDouble(),
              bottomRightLat = cs.get(1).get(1).asDouble(), bottomRightLon = cs.get(1).get(0).asDouble())
          case "polygon" =>
            val ring = shape.get("coordinates").get(0).elements().asScala.toSeq
              .map(p => (p.get(1).asDouble(), p.get(0).asDouble()))
            require(ring.length >= 4 && ring.head == ring.last,
              "GeoJSON polygon ring must close (first point repeated last)")
            Geo.pointInPolygon(field(s"${f}_lat"), field(s"${f}_lon"), ring.dropRight(1))
          case t => throw new IllegalArgumentException(s"unsupported geo_shape type: $t")
        }
      case "term" =>
        val (f, v) = single(body)
        EsDsl.term(field(f), if (v.isObject) litOf(v.get("value")) else litOf(v))
      case "terms" =>
        val (f, vs) = single(body)
        if (vs.isObject && vs.has("index")) {
          // terms LOOKUP: values come from another index's doc(s). ES
          // resolves the lookup on the coordinating node and inlines the
          // (bounded: one doc's field) term list into the query — the
          // driver-side collect here is that same step, not a distributed
          // anti-pattern. `id` matches the lookup table's first column
          // (the doc-id convention all driver tables follow).
          val idx = vs.get("index").asText()
          val t = lookupTables.value.getOrElse(idx, throw new IllegalArgumentException(
            s"terms lookup index '$idx' not registered (use EsQueryJson.withTables)"))
          val path = vs.get("path").asText()
          val lookedUp = Option(vs.get("id")) match {
            case Some(id) => t.filter(col(t.columns.head) === litOf(id))
            case None => t
          }
          val projected = lookedUp.select(col(path)) // eager analysis checks `path`
          val values =
            if (validateOnly.value) Seq(null: Any) // no fetch; null In-literal coerces to any type
            else projected.limit(65537).collect().map(_.get(0)).toSeq
          if (!validateOnly.value)
            require(values.nonEmpty, s"terms lookup $idx/$path resolved no values")
          // ES caps inlined lookup terms (index.max_terms_count, default
          // 65536) — same guard here, so an unbounded lookup table can't
          // silently become a driver-side collect of the world
          require(values.size <= 65536,
            s"terms lookup $idx/$path exceeds 65536 values (ES max_terms_count)")
          // small lists stay `isin` (an In-filter pushes to parquet);
          // large ones become ONE array-literal `array_contains` node —
          // a 65k-element In would put 65k Literal nodes in the plan
          // (null semantics agree: both are null→no-match in a filter)
          if (values.size <= 256) field(f).isin(values: _*)
          else values.head match {
            case _: java.lang.Long | _: java.lang.Integer =>
              array_contains(typedLit(values.map(v => v.asInstanceOf[Number].longValue())),
                field(f).cast("long"))
            case _ =>
              array_contains(typedLit(values.map(String.valueOf)), field(f))
          }
        } else
          field(f).isin(vs.elements().asScala.map(n =>
            if (n.isNumber) n.asLong().asInstanceOf[Any] else n.asText().asInstanceOf[Any]).toSeq: _*)
      case "range" =>
        val (f, b) = single(body)
        // mapping-aware bound parse (ES): a textual bound against a
        // NUMERIC field coerces at parse time — numeric strings become
        // numbers (ES accepts "50"), junk rejects as invalid_query
        // (number_format_exception) instead of becoming a lazy ANSI cast
        // that explodes executor-side. Dotted / unknown / non-numeric
        // fields skip the check (string ranges are lexicographic, as ES
        // keyword ranges are).
        val numericField = querySchema.value.exists(_.fields.exists(sf =>
          sf.name == f && sf.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]))
        def bound(n: JsonNode): Column =
          if (n.isTextual && DateMath.isDateMath(n.asText())) {
            val anchor = Option(b.get("now")).map(x => java.time.Instant.parse(x.asText()))
              .orElse(clock.value)
              .getOrElse(throw new IllegalArgumentException(
                s"date math '${n.asText()}' needs an injected clock (withNow or a 'now' body key)"))
            to_timestamp(lit(DateMath.literal(n.asText(), anchor)))
          } else if (n.isTextual && numericField) {
            val d = try n.asText().trim.toDouble catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"range bound '${n.asText()}' is not a number for numeric field '$f'")
            }
            if (d.isWhole && d.abs <= Long.MaxValue.toDouble) lit(d.toLong) else lit(d)
          } else litOf(n)
        Seq(
          Option(b.get("gte")).map(field(f) >= bound(_)),
          Option(b.get("gt")).map(field(f) > bound(_)),
          Option(b.get("lte")).map(field(f) <= bound(_)),
          Option(b.get("lt")).map(field(f) < bound(_)))
          .flatten.reduceOption(_ && _).getOrElse(lit(true))
      case "exists" =>
        val f = body.get("field").asText()
        if (f.startsWith("info.")) EsDsl.existsKey(col("info"), f.stripPrefix("info."))
        else EsDsl.exists(col(f))
      case "script" =>
        // filter-context `script` query: the painless subset
        // ([[Painless.compile]] — doc refs, string methods, ternaries,
        // Math.*) compiled through the SQL parser: a codegen'd
        // predicate, no interpreter — the script_score approach in
        // filter position
        val sNode = body.get("script")
        expr(Painless.compile(scriptSource(sNode), params = scriptParams(sNode)))
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
      case "more_like_this" => mltPredicate(body, field)
      case "match" =>
        val (f, v) = single(body)
        val (text, _, msm) = textBoostMsm(v)
        val analyzer = if (v.isObject) Option(v.get("analyzer")).map(_.asText()) else None
        analyzer match {
          case Some(name) if shingleAnalyzers.value.contains(name) =>
            val (mn, mx, uni) = shingleAnalyzers.value(name)
            val shOpAnd = v.isObject &&
              Option(v.get("operator")).map(_.asText()).contains("and")
            // total optional clauses = the query's shingle count
            val qToks = text.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
            val nClauses = ((mn to mx).flatMap(n => qToks.sliding(n)
              .filter(_.length == n).map(_.mkString(" "))) ++
              (if (uni) qToks else Nil)).distinct.length
            val shMsm =
              if (shOpAnd) nClauses
              else if (v.isObject)
                Option(v.get("minimum_should_match"))
                  .map(msmOf(_, nClauses)).getOrElse(1)
              else 1
            EsDsl.matchQueryShingles(field(f), text, (mn to mx).toSeq, uni, shMsm)
          case Some(name) if synonymAnalyzers.value.contains(name) =>
            // search-time synonym expansion: one clause per ORIGINAL query
            // term position (ES's msm counting over synonym groups); a
            // clause matches if the doc contains any member of the set
            val syn = synonymAnalyzers.value(name)
            val qTerms = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq.distinct
            require(qTerms.nonEmpty, "synonym match needs at least one query term")
            val synOpAnd = v.isObject &&
              Option(v.get("operator")).map(_.asText()).contains("and")
            val synMsm =
              if (synOpAnd) qTerms.length
              else if (v.isObject)
                Option(v.get("minimum_should_match"))
                  .map(msmOf(_, qTerms.length)).getOrElse(1)
              else 1
            val docToks = graft.ext.TextAnalysis.tokens(field(f))
            qTerms.map { t =>
              val set = syn.getOrElse(t, Seq(t))
              // multi-word members ("usa => united states") are PHRASE
              // alternatives (the synonym_graph behavior); single-token
              // members batch into one arrays_overlap
              val (multi, single) = set.partition(_.contains(" "))
              val singleCl =
                if (single.isEmpty) Nil
                else Seq(arrays_overlap(docToks, lit(single.toArray)))
              val multiCl = multi.map(m =>
                EsDsl.matchPhrase(field(f), m.split(" ").toSeq))
              (singleCl ++ multiCl).reduce(_ || _).cast("int")
            }.reduce(_ + _) >= synMsm
          case Some("english") =>
            val ztq = if (v.isObject)
              Option(v.get("zero_terms_query")).map(_.asText()).map {
                case "all" => true
                case "none" => false
                case other => throw new IllegalArgumentException(
                  s"unsupported zero_terms_query: $other")
              } else None
            // msm counts ANALYZED optional clauses (stopword-filtered,
            // stemmed, distinct) — like the cjk branch below, NOT the raw
            // whitespace split textBoostMsm uses: "the quick foxes" with
            // 100% must need 2 analyzed terms, not 3 raw ones
            val enTotal = text.split("\\s+").toSeq.map(_.toLowerCase)
              .filterNot(graft.functions.TextKernels.englishStopwords.contains)
              .map(graft.functions.TextKernels.stemEnglish).distinct.length
            val enOpAnd = v.isObject &&
              Option(v.get("operator")).map(_.asText()).contains("and")
            val enMsm =
              if (enOpAnd) enTotal
              else if (v.isObject)
                Option(v.get("minimum_should_match"))
                  .map(msmOf(_, enTotal)).getOrElse(1)
              else 1
            EsDsl.matchQueryEnglish(field(f), text.split("\\s+").toSeq, enMsm, ztq)
          case Some("cjk") =>
            // operator:and counts ANALYZED tokens (bigrams), not the
            // whitespace split the generic msm derivation uses
            val opAnd = v.isObject &&
              Option(v.get("operator")).map(_.asText()).contains("and")
            val cjkMsm =
              if (opAnd) graft.functions.TextKernels.analyzeCjk(text).distinct.length
              else if (v.isObject)
                Option(v.get("minimum_should_match"))
                  .map(msmOf(_, graft.functions.TextKernels.analyzeCjk(text).distinct.length))
                  .getOrElse(1)
              else 1
            EsDsl.matchQueryCjk(field(f), text, cjkMsm)
          case Some("whitespace") =>
            EsDsl.matchQueryWhitespace(field(f), text.split("\\s+").toSeq, msm)
          case Some("keyword") =>
            // keyword analyzer: the whole query is ONE token and the whole
            // field one term — the match degenerates to exact equality
            field(f) === lit(text)
          case Some(other) => throw new IllegalArgumentException(
            s"unsupported analyzer: $other (english/cjk/whitespace/keyword or a " +
              "withSynonyms-registered analyzer beyond the default)")
          case None =>
            // `fuzziness` on match: per-TERM AUTO budgets (ES), Damerau
            // default; prefix_length prunes before the distance
            (if (v.isObject) Option(v.get("fuzziness")) else None) match {
              case Some(n) =>
                def autoOf(t: String) = if (t.length < 3) 0 else if (t.length <= 5) 1 else 2
                val fOf: String => Int =
                  if (n.isTextual) { require(n.asText() == "AUTO",
                    s"fuzziness must be an int or AUTO, got ${n.asText()}"); autoOf }
                  else { val k = n.asInt(); _ => k }
                val pl = Option(v.get("prefix_length")).map(_.asInt()).getOrElse(0)
                EsDsl.matchQueryFuzzy(field(f), text.split("\\s+").toSeq, fOf, msm, pl)
              // plain match consults the field's INDEX analyzer (mapping-
              // scoped): the doc side is the expanded stream and — ES 6.5's
              // search_analyzer default — the query side analyzes with the
              // same chain; msm then counts ANALYZED clauses
              case None => defaultSearchTerms(f, text) match {
                case Some(ts) =>
                  require(ts.nonEmpty,
                    s"index-default search analyzer removed every query term: $text")
                  EsDsl.matchQuery(storedField(f), ts, analyzedMsm(v, ts.length))
                case None => EsDsl.matchQuery(storedField(f), text.split("\\s+").toSeq, msm)
              }
            }
        }
      case "match_phrase" =>
        val (f, v) = single(body)
        val text = (if (v.isObject) v.get("query") else v).asText()
        // `slop`: Lucene SloppyPhraseScorer semantics (the PhraseSlopMatch
        // kernel) — shifted-position span ≤ slop, out-of-order
        // arrangements included (a transposed pair costs 2)
        val slop = if (v.isObject) Option(v.get("slop")).map(_.asInt()).getOrElse(0) else 0
        val (docSide, ph) = phraseField(f, text.split("\\s+").toSeq)
        if (slop == 0) EsDsl.matchPhrase(docSide, ph)
        else graft.functions.Spans.phraseSlop(docSide, ph, slop)
      case "multi_match" =>
        // `^boost` suffixes affect scoring only — the match predicate
        // strips them
        val fnames = body.get("fields").elements().asScala.toSeq
          .map(f => splitFieldBoost(f.asText())._1)
        val fields = fnames.map(field)
        val qtext = body.get("query").asText()
        val terms = qtext.split("\\s+").toSeq
        val mmType = Option(body.get("type")).map(_.asText())
        val anyIndexed = fnames.exists(indexAnalyzers.value.contains)
        // type:phrase = match_phrase in ANY field (ES runs one phrase
        // query per field, dis-max'd; as a predicate that's an OR);
        // type:phrase_prefix likewise with the last term a prefix
        if (mmType.contains("phrase_prefix")) {
          // a stemmed PREFIX is not a prefix of the stemmed stream —
          // reject rather than silently matching raw text the index
          // doesn't hold
          require(!anyIndexed,
            "phrase_prefix against index-analyzed fields is unsupported")
          val ws = terms.map(_.toLowerCase)
          fields.map(f => graft.functions.Spans.phrasePrefix(f, ws.init, ws.last)).reduce(_ || _)
        } else if (mmType.contains("phrase"))
          fnames.map { f =>
            val (docSide, ph) = phraseField(f, terms)
            EsDsl.matchPhrase(docSide, ph)
          }.reduce(_ || _)
        else {
          // cross_fields `operator: and` = every term in SOME field
          // (term-centric); best/most_fields `operator: and` = ALL terms in
          // one field (field-centric — the per-field match runs with every
          // term a MUST). In ES operator:and makes EVERY term a must
          // regardless of any explicit minimum_should_match — and wins.
          val crossFields = mmType.contains("cross_fields")
          // cross_fields blends df across fields under ONE shared analyzer
          // (ES groups fields by analyzer; differently-analyzed groups
          // score separately — out of scope, reject rather than blend
          // incompatible streams)
          require(!crossFields || !anyIndexed,
            "cross_fields over index-analyzed fields is unsupported (ES groups by analyzer)")
          val opAnd = Option(body.get("operator")).map(_.asText()).contains("and")
          // and → all terms for EVERY type (pre-round-16 only cross_fields
          // honored it; best_fields `operator: and` admitted any-term docs
          // — round-16 score-differential find)
          val msm =
            if (opAnd) terms.size
            else Option(body.get("minimum_should_match")).map(msmOf(_, terms.size)).getOrElse(1)
          // `fuzziness` (best_fields/most_fields only — ES rejects it for
          // cross_fields too): the per-field clause becomes the fuzzy
          // match, doc matches if ANY field satisfies it
          Option(body.get("fuzziness")) match {
            case Some(n) =>
              require(!crossFields, "fuzziness is not supported with cross_fields (as in ES)")
              require(!anyIndexed,
                "fuzziness against index-analyzed fields is unsupported (edit distance " +
                  "over an expanded stored stream has no ES-comparable semantics)")
              def autoOf(t: String) = if (t.length < 3) 0 else if (t.length <= 5) 1 else 2
              val fOf: String => Int =
                if (n.isTextual) { require(n.asText() == "AUTO",
                  s"fuzziness must be an int or AUTO, got ${n.asText()}"); autoOf }
                else { val k = n.asInt(); _ => k }
              val pl = Option(body.get("prefix_length")).map(_.asInt()).getOrElse(0)
              fields.map(f => EsDsl.matchQueryFuzzy(f, terms, fOf, msm, pl)).reduce(_ || _)
            case None =>
              if (crossFields) EsDsl.multiMatchCrossFields(fields, terms, msm)
              else
                // per-field search-analyzer defaulting (ES: each field's
                // match runs under its OWN analyzer): an index-analyzed
                // field gets query-side expansion + the stored stream and
                // its msm counts ITS analyzed clauses; plain fields keep
                // the body-level msm over raw terms
                fnames.map { f =>
                  defaultSearchTerms(f, qtext) match {
                    case Some(ts) =>
                      require(ts.nonEmpty,
                        s"index-default search analyzer removed every query term: $qtext")
                      val fMsm =
                        if (opAnd) ts.length
                        else Option(body.get("minimum_should_match"))
                          .map(msmOf(_, ts.length)).getOrElse(1)
                      EsDsl.matchQuery(storedField(f), ts, fMsm)
                    case None => EsDsl.matchQuery(field(f), terms, msm)
                  }
                }.reduce(_ || _)
          }
        }
      case "match_phrase_prefix" =>
        // phrase with the LAST term a prefix — the search-as-you-type
        // query. One-pass positional kernel ([[graft.functions.Spans
        // .PhrasePrefixMatch]]): the HOF-exists formulation re-interpreted
        // per-position lambdas and ran ~6× slower at sf0.1.
        val (f, v) = single(body)
        val text = (if (v.isObject) v.get("query") else v).asText()
        val ws = text.toLowerCase.split("\\s+").toSeq
        require(ws.nonEmpty, "match_phrase_prefix needs at least one term")
        graft.functions.Spans.phrasePrefix(field(f), ws.init, ws.last)
      case "terms_set" =>
        // array-field match with a per-document minimum: at least
        // `minimum_should_match_field` of the given terms present
        val (f, spec2) = single(body)
        val terms = spec2.get("terms").elements().asScala.map(_.asText()).toSeq
        val msmField = spec2.get("minimum_should_match_field").asText()
        size(array_intersect(field(f), lit(terms.toArray))) >= field(msmField)
      case "wrapper" =>
        // base64-wrapped query body, decoded and compiled like any other
        val decoded = new String(
          java.util.Base64.getDecoder.decode(body.get("query").asText()),
          java.nio.charset.StandardCharsets.UTF_8)
        predicateWith(parse(decoded), fld)
      case "fuzzy" =>
        val (f, v) = single(body)
        val value = (if (v.isObject) v.get("value") else v).asText()
        // ES AUTO fuzziness: edits by query-term length (0 / 1 / 2)
        def auto(t: String) = if (t.length < 3) 0 else if (t.length <= 5) 1 else 2
        val fuzziness =
          if (v.isObject) Option(v.get("fuzziness")).map(n =>
            if (n.isTextual) { require(n.asText() == "AUTO",
              s"fuzziness must be an int or AUTO, got ${n.asText()}"); auto(value) }
            else n.asInt()).getOrElse(2)
          else 2
        // `prefix_length`: candidates must share the first p characters
        // (ES prunes the automaton; here it is a cheap conjunct evaluated
        // BEFORE the edit distance). `transpositions` defaults TRUE as in
        // ES 6.5 — Damerau distance (a swapped adjacent pair = 1 edit);
        // `transpositions: false` opts back into classic Levenshtein.
        val prefixLen =
          if (v.isObject) Option(v.get("prefix_length")).map(_.asInt()).getOrElse(0) else 0
        val transpositions =
          if (v.isObject) Option(v.get("transpositions")).forall(_.asBoolean()) else true
        val dist =
          if (transpositions) graft.functions.EditDistance.fuzzyLev(field(f), lit(value))
          else levenshtein(field(f), lit(value))
        val base = dist <= fuzziness
        if (prefixLen == 0) base
        else substring(field(f), 1, prefixLen) === lit(value.take(prefixLen)) && base
      case "nested" =>
        // predicate over child docs in an array-of-struct column: fields
        // inside rebind to struct members of the array element (`path.x`)
        val path = body.get("path").asText()
        val inner = body.get("query")
        org.apache.spark.sql.functions.exists(field(path), x =>
          predicateWith(inner, name =>
            x.getField(if (name.startsWith(path + ".")) name.stripPrefix(path + ".") else name)))
      case "has_child" =>
        // ES parent-join, child→parent direction: return PARENT docs with
        // >= min_children (default 1, ES default) and <= max_children
        // children matching the inner query. Children ride as an
        // array-of-struct column named by `type` — the same data shape the
        // `nested` query uses (b24); the count is a row-local
        // size(filter(...)), no join at query time.
        val ctype = body.get("type").asText()
        val matched = size(filter(field(ctype), x =>
          predicateWith(body.get("query"), name =>
            x.getField(if (name.startsWith(ctype + ".")) name.stripPrefix(ctype + ".") else name))))
        val minC = Option(body.get("min_children")).map(_.asInt()).getOrElse(1)
        Option(body.get("max_children")).map(_.asInt()) match {
          case Some(mx) => matched >= minC && matched <= mx
          case None => matched >= minC
        }
      case "has_parent" =>
        // parent→child direction: return CHILD docs whose parent matches
        // the inner query. Data shape: the child row carries its parent doc
        // denormalized as a struct column named by `parent_type` — the
        // declarative Spark analog of ES's shard-local parent lookup (the
        // denormalizing child→parent join is declared once upstream and
        // Catalyst picks broadcast/sort-merge; the predicate itself stays
        // row-local and codegen'd). A child with no parent never matches.
        val ptype = body.get("parent_type").asText()
        val parent = field(ptype)
        parent.isNotNull && predicateWith(body.get("query"), name =>
          parent.getField(if (name.startsWith(ptype + ".")) name.stripPrefix(ptype + ".") else name))
      case "parent_id" =>
        // children of ONE parent: the child row's `_parent` column (the
        // ES-6.5 `_parent` metadata field) equals the given id; `type`
        // names the child relation and is implicit in the single-frame
        // data model.
        field("_parent") === litOf(body.get("id"))
      case "constant_score" => // unscored context: just the wrapped filter
        predicateWith(body.get("filter"), fld)
      case "function_score" => // unscored context: the inner query's filter
        Option(body.get("query")).map(predicateWith(_, fld)).getOrElse(lit(true))
      case "dis_max" => // unscored: a doc matches if any clause matches
        body.get("queries").elements().asScala.map(predicateWith(_, fld)).reduce(_ || _)
      case "boosting" => // unscored: negative only demotes, never filters
        predicateWith(body.get("positive"), fld)
      case "query_string" | "simple_query_string" =>
        val q = body.get("query").asText()
        val defFields =
          Option(body.get("fields")).map(_.elements().asScala.map(_.asText()).toSeq)
            .orElse(Option(body.get("default_field")).map(n => Seq(n.asText())))
            .getOrElse(Seq.empty)
        val defaultAnd = Option(body.get("default_operator"))
          .exists(_.asText().equalsIgnoreCase("AND"))
        if (kind == "query_string") QueryString.lucene(q, fld, defFields, defaultAnd)
        else QueryString.simple(q, fld, defFields, defaultAnd)
      case "bool" =>
        def clauses(name: String): Seq[Column] = Option(body.get(name)).toSeq.flatMap { n =>
          if (n.isArray) n.elements().asScala.map(predicateWith(_, fld)).toSeq
          else Seq(predicateWith(n, fld))
        }
        val mustCl = clauses("must") ++ clauses("filter")
        val shouldCl = clauses("should")
        // ES default: should is optional when must/filter constrain the
        // query (msm 0), required (msm 1) when should stands alone
        val msm = Option(body.get("minimum_should_match")).map(msmOf(_, shouldCl.size))
          .getOrElse(if (mustCl.isEmpty) 1 else 0)
        EsDsl.bool(
          must = mustCl,
          should = if (msm > 0) shouldCl else Seq.empty,
          mustNot = clauses("must_not"),
          minimumShouldMatch = msm)
      case other => throw new IllegalArgumentException(s"unsupported query kind: $other")
    }
  }

  /** ES `suggest` body — one named suggester per call (term / phrase /
    * completion), dispatched to [[Suggest]]. The result shape follows the
    * suggester kind, as in the ES response. */
  def suggest(df: DataFrame, bodyJson: String, idField: String = "doc_id"): DataFrame = {
    val root = parse(bodyJson)
    val sug = Option(root.get("suggest")).getOrElse(root)
    val (_, spec) = single(sug)
    val idCol = field(idField)
    // same strictness as the search surface: unknown suggester options
    // (a typo'd `max_editz`, an unimplemented `string_distance`) reject
    // loudly instead of silently using defaults
    def checkKeys(node: JsonNode, what: String, allowed: Set[String]): Unit = {
      val unknown = node.fieldNames().asScala.toSeq.filterNot(allowed)
      require(unknown.isEmpty,
        s"unknown $what option(s): ${unknown.sorted.mkString(", ")}")
    }
    checkKeys(spec, "suggester", Set("text", "prefix", "term", "phrase",
      "completion"))
    if (spec.has("term")) {
      val t = spec.get("term")
      checkKeys(t, "term suggester", Set("field", "size", "max_edits",
        "suggest_mode"))
      Suggest.termSuggest(df, idCol, field(t.get("field").asText()),
        spec.get("text").asText(),
        size = Option(t.get("size")).map(_.asInt()).getOrElse(5),
        maxEdits = Option(t.get("max_edits")).map(_.asInt()).getOrElse(2),
        mode = Option(t.get("suggest_mode")).map(_.asText()).getOrElse("always"))
    } else if (spec.has("phrase")) {
      val p = spec.get("phrase")
      checkKeys(p, "phrase suggester", Set("field", "size", "shard_size",
        "max_edits"))
      Suggest.phraseSuggest(df, idCol, field(p.get("field").asText()),
        spec.get("text").asText(),
        size = Option(p.get("size")).map(_.asInt()).getOrElse(3),
        shardSize = Option(p.get("shard_size")).map(_.asInt()).getOrElse(5),
        maxEdits = Option(p.get("max_edits")).map(_.asInt()).getOrElse(1))
    } else if (spec.has("completion")) {
      val c = spec.get("completion")
      checkKeys(c, "completion suggester", Set("field", "size", "fuzzy",
        "contexts"))
      // `fuzzy` may be `true` (defaults: fuzziness AUTO over the prefix
      // length, prefix_length 1) or an options object, as in ES
      val prefix = spec.get("prefix").asText()
      def autoFuzz = if (prefix.length < 3) 0 else if (prefix.length <= 5) 1 else 2
      val (fz, fpl) = Option(c.get("fuzzy")) match {
        case None => (0, 1)
        case Some(fn) if fn.isBoolean =>
          (if (fn.asBoolean()) autoFuzz else 0, 1)
        case Some(fn) =>
          (Option(fn.get("fuzziness")).map(n =>
            if (n.isTextual) { require(n.asText() == "AUTO",
              s"fuzziness must be an int or AUTO, got ${n.asText()}"); autoFuzz }
            else n.asInt()).getOrElse(autoFuzz),
           Option(fn.get("prefix_length")).map(_.asInt()).getOrElse(1))
      }
      val ctxs = Option(c.get("contexts")).toSeq.flatMap(cn =>
        cn.fieldNames().asScala.toSeq.map { fn =>
          val vals = cn.get(fn)
          val vs = if (vals.isArray) vals.elements().asScala.map(_.asText()).toSeq
                   else Seq(vals.asText())
          (field(fn), vs)
        })
      Suggest.completionSuggest(df, idCol, field(c.get("field").asText()),
        prefix,
        size = Option(c.get("size")).map(_.asInt()).getOrElse(5),
        fuzziness = fz, fuzzyPrefixLength = fpl, contexts = ctxs)
    } else sys.error(s"unsupported suggester: ${spec.fieldNames().asScala.toSeq}")
  }

  /** Apply `query` + `sort` + `from`/`size` of a search body. A sort on
    * `_score` attaches a BM25 relevance score (the query must then be a
    * `match`); like ES, `_score` defaults to DESCENDING order. A
    * `_script` sort entry compiles its painless-arithmetic subset
    * (`doc['f'].value` refs) through the SQL parser into a codegen'd
    * sort-key column (6 dp, engine-stable order), dropped from the hit;
    * a `mode` (min/max/sum/avg over a multi-valued field) or a `missing`
    * substitute likewise materialize internal computed sort keys. */
  /** ES 6.5 `_validate/query`: parse + compile each body WITHOUT
    * executing. The full [[search]] compilation runs against the frame's
    * schema — Spark analyzes plans eagerly at Dataset construction, so
    * malformed JSON, unsupported constructs, and unknown fields all
    * surface exactly as execution would see them, while no job ever
    * runs (ES semantics: validate touches no shard). The three
    * compilation steps that normally collect driver-side stats
    * (terms-lookup values, `common` cutoff-frequency counts,
    * `auto_date_histogram` span) run under [[validateOnly]] with
    * placeholder stats, so validating those bodies is O(plan) too —
    * their schema/field errors still surface because the stats frames
    * are constructed (and thus analyzed) either way. Reports the error
    * CLASS, the stable contract part of the diagnostic (messages carry
    * engine-specific positions/names): `ok`, `parse_error` (body is not
    * JSON), `invalid_query` (well-formed but unsupported/ill-typed
    * construct), `unknown_field` (resolution failure against the
    * schema). Driver-only by design — the result is |bodies| rows. */
  def validateQuery(df: DataFrame, bodies: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bodies.map { case (qid, body) =>
      val cls =
        try {
          validateOnly.withValue(true) {
            search(df, body).queryExecution.analyzed
            // a body with aggs must also COMPILE its aggregations —
            // ES validates the whole body, not just the hits query
            val parsed = parse(body)
            if (parsed.has("aggs") || parsed.has("aggregations"))
              aggregations(df, body).values.foreach(_.queryExecution.analyzed)
          }
          "ok"
        }
        catch {
          case _: com.fasterxml.jackson.core.JsonProcessingException => "parse_error"
          case _: org.apache.spark.sql.AnalysisException => "unknown_field"
          case _: IllegalArgumentException | _: IllegalStateException |
               _: NullPointerException | _: MatchError => "invalid_query"
        }
      (qid, cls == "ok", cls)
    }.toDF("query_id", "valid", "error_class").orderBy("query_id")
  }

  def search(df: DataFrame, bodyJson: String): DataFrame =
    withSchemaOf(df)(searchImpl(df, bodyJson))

  /** Top-level `_search` body keys the engine implements. ES 6.5 rejects
    * any unrecognized body key; silently ignoring one (say a typo'd
    * `"sorrt"`) would return un-sorted hits with no diagnostic — the
    * silent-misparse class this front-end rejects everywhere else.
    * `suggest` is allowed through: a combined search+suggest body is
    * legal ES, the hits path just doesn't consume it (the suggest entry
    * point does). */
  private val knownSearchKeys = Set(
    "query", "sort", "from", "size", "search_after", "collapse",
    "min_score", "post_filter", "_source", "stored_fields",
    "docvalue_fields", "script_fields", "highlight", "rescore",
    "track_scores",
    "indices_boost", "slice", "aggs", "aggregations", "suggest")

  private def searchImpl(df: DataFrame, bodyJson: String): DataFrame = {
    val body = parse(bodyJson)
    val unknownTop = body.fieldNames().asScala.toSeq.filterNot(knownSearchKeys)
    require(unknownTop.isEmpty,
      s"unknown top-level search key(s): ${unknownTop.sorted.mkString(", ")}")
    // (field, explicitOrder, nullsPlacement) triples; _score defaults
    // desc, fields asc, missing docs last (the ES default). _script /
    // mode / custom-missing entries materialize as internal computed
    // columns so downstream sort/search_after machinery sees plain fields.
    var scriptSorts = Vector.empty[(String, Column)]
    def computed(c: Column): String = {
      val nm = s"_sort_key_${scriptSorts.size}"
      scriptSorts :+= nm -> c
      nm
    }
    val sortSpecs: Seq[(String, Option[String], Option[String])] =
      Option(body.get("sort")).toSeq.flatMap(_.elements().asScala.toSeq).map { e =>
        if (e.isTextual) (e.asText(), None, None)
        else {
          val (f, spec) = single(e)
          val order = Option(spec.get("order")).map(_.asText())
          if (f == "_script") {
            val sNode = spec.get("script")
            val bound = Painless.compile(scriptSource(sNode), params = scriptParams(sNode))
            // ES script sorts declare "type": number|string; numeric keys
            // take the 6-dp engine-stable rounding, string keys sort raw
            val key = if (Option(spec.get("type")).map(_.asText()).contains("string"))
              expr(bound) else round(expr(bound), 6)
            (computed(key), order, None)
          } else if (f == "_geo_distance") {
            // geo sort: great-circle distance from an origin. The key is
            // the 4-dp haversine km ([[Geo.haversineKm]]) so boundary rows
            // are engine-stable; callers should add an id tiebreak for a
            // total order, as with any ES distance sort.
            val unit = Option(spec.get("unit")).map(_.asText()).getOrElse("km")
            require(unit == "km", s"unsupported _geo_distance unit: $unit")
            val reserved = Set("order", "unit", "mode", "distance_type")
            val gf = spec.fieldNames().asScala.toSeq.filterNot(reserved)
            require(gf.size == 1, s"_geo_distance needs exactly one geo field, got $gf")
            val o = spec.get(gf.head)
            (computed(Geo.haversineKm(field(s"${gf.head}_lat"), field(s"${gf.head}_lon"),
              lit(o.get("lat").asDouble()), lit(o.get("lon").asDouble()))), order, None)
          } else if (spec.has("mode")) {
            // multi-valued field sort: reduce the array to one key per doc
            // (ES sort modes; array columns arise from the parent/nested
            // array-of-struct shape, e.g. item.l_quantity). A `nested`
            // block restricts the reduction to child docs passing its
            // filter (ES nested sort); no surviving child → null key →
            // the usual missing-last placement.
            val arr = Option(spec.get("nested")) match {
              case Some(nn) =>
                val path = nn.get("path").asText()
                require(f.startsWith(path + "."),
                  s"nested sort field $f must live under path $path")
                val member = f.stripPrefix(path + ".")
                val kept = Option(nn.get("filter")) match {
                  case Some(fq) =>
                    org.apache.spark.sql.functions.filter(field(path), x =>
                      predicateWith(fq, nm =>
                        if (nm.startsWith(path + ".")) x.getField(nm.stripPrefix(path + "."))
                        else field(nm)))
                  case None => field(path)
                }
                transform(kept, x => x.getField(member))
              case None => field(f)
            }
            val key = spec.get("mode").asText() match {
              case "min" => array_min(arr)
              case "max" => array_max(arr)
              case "sum" => aggregate(arr, lit(0.0), (acc, x) => acc + x)
              case "avg" => round(aggregate(arr, lit(0.0), (acc, x) => acc + x) /
                org.apache.spark.sql.functions.size(arr), 6)
              case m => throw new IllegalArgumentException(s"unsupported sort mode: $m")
            }
            (computed(key), order, None)
          } else if (spec.has("missing")) {
            spec.get("missing").asText() match {
              case p @ ("_first" | "_last") => (f, order, Some(p))
              // custom substitute: missing docs sort AS the given value
              case _ => (computed(coalesce(field(f), litOf(spec.get("missing")))), order, None)
            }
          } else (f, order, None)
        }
      }
    val dfScripted = scriptSorts.foldLeft(df) { case (acc, (n, c)) => acc.withColumn(n, c) }
    val minScore = Option(body.get("min_score")).map(_.asDouble())
    // `slice`: parallel scroll export — slice i of max owns the docs with
    // hash(slice field) % max == i. The hash is the engine's md5-60 family
    // (cross-engine deterministic, so the oracle can recompute membership);
    // the field defaults to the materialized-index `id`, as ES defaults to
    // `_id`. A narrow filter, so it composes with query/sort/search_after
    // and pushes into the scan; the N slices partition the export exactly.
    val df0 = Option(body.get("slice")) match {
      case Some(sl) =>
        val max = sl.get("max").asInt()
        val sid = sl.get("id").asInt()
        require(max >= 1 && sid >= 0 && sid < max,
          s"slice id must be in [0, max), got id=$sid max=$max")
        val f = Option(sl.get("field")).map(_.asText()).getOrElse("id")
        dfScripted.filter(pmod(graft.functions.Hashing.md5Long60(field(f).cast("string")),
          lit(max.toLong)) === lit(sid.toLong))
      case None => dfScripted
    }
    // `min_score` forces scoring even when the sort doesn't use _score;
    // so does `track_scores: true` (ES contract: compute _score for each
    // hit even though the sort is by field — the per-hit relevance rides
    // along without changing the order)
    val trackScores = Option(body.get("track_scores")).exists(_.asBoolean())
    val needsScore =
      sortSpecs.exists(_._1 == "_score") || minScore.isDefined || trackScores
    val scored = (Option(body.get("query")), Option(body.get("rescore"))) match {
      case (Some(q), Some(r)) if needsScore =>
        val tiebreaks = sortSpecs.filter(_._1 != "_score").map(s => field(s._1))
        rescoredSearch(df0, q, r, tiebreaks)
      case (Some(q), _) if needsScore => scoredSearch(df0, q)
      case (Some(q), _) if single(q)._1 == "common" =>
        df0.filter(commonTermsPredicate(df0, q.get("common")))
      case (Some(q), _) => df0.filter(predicate(q))
      case (None, _) =>
        require(!needsScore, "_score sort / min_score requires a query")
        df0
    }
    // `indices_boost`: multiplicative per-index score factor on a
    // multi-index frame (rows tagged with `_index`, the [[msearch]]-style
    // union convention). ES 6.5 accepts the object form {"idx": boost};
    // unlisted indices keep factor 1.0. Applied BEFORE min_score, as ES
    // compares the final (boosted) score. One codegen'd CASE — no
    // per-index pass.
    val ibScored = Option(body.get("indices_boost")) match {
      case Some(ib) =>
        require(scored.columns.contains("_score"),
          "indices_boost requires a scored query (sort by _score, min_score or track_scores)")
        require(scored.columns.contains("_index"),
          "indices_boost requires an _index column (multi-index frame)")
        val entries: Seq[(String, Double)] =
          if (ib.isArray) ib.elements().asScala.toSeq.map { e =>
            val (n, v) = single(e); n -> v.asDouble()
          }
          else ib.fields().asScala.toSeq.map(e => e.getKey -> e.getValue.asDouble())
        val factor = entries.foldLeft(lit(1.0)) { case (acc, (n, b)) =>
          when(col("_index") === n, lit(b)).otherwise(acc)
        }
        scored.withColumn("_score", round(col("_score") * factor, 6))
      case None => scored
    }
    val minScored = minScore.map(ms => ibScored.filter(col("_score") >= ms)).getOrElse(ibScored)
    // `post_filter`: narrows the HITS only, after scoring — by ES contract
    // the body's aggregations still see the full query scope (the faceted-
    // navigation idiom: facet counts stay global while the hit list honors
    // the selected facet). [[aggregations]] reads only `query`, so the
    // contract holds structurally; a plain narrow filter here, pushed into
    // the scan when the query itself is unscored.
    val filtered = Option(body.get("post_filter"))
      .map(pf => minScored.filter(predicate(pf))).getOrElse(minScored)
    // `_name`-tagged clauses → `matched_queries`: per returned hit, the
    // names of the tagged clauses it satisfies (one extra codegen'd
    // boolean per name — no second pass). Sorted: ES emits a set in match
    // order; sorting keeps the output hash deterministic.
    val named = Option(body.get("query")).toSeq.flatMap(namedClauses)
    val withNames =
      if (named.isEmpty) filtered
      else filtered.withColumn("matched_queries", array_sort(
        filter(array(named.map { case (n, cl) => when(predicate(cl), lit(n)) }: _*),
          x => x.isNotNull)))
    // `highlight`: a `_highlight` fragment column — window of
    // `fragment_size` chars around the first query-term occurrence (terms
    // tried in query order) over the lowercased field, occurrences wrapped
    // in <em> tags. Pure deterministic string ops (strpos/substr/replace),
    // so the oracle reproduces fragments byte-for-byte. Conservative
    // subset: the body's query must be match/match_phrase.
    val highlighted = Option(body.get("highlight")) match {
      case Some(h) =>
        // multiple fields each get their own `_highlight_<field>` column
        // (the relational shape of ES's per-field fragments map); a single
        // field keeps the plain `_highlight` name
        val fieldEntries = h.get("fields").fields().asScala.toSeq
          .map(e => e.getKey -> e.getValue)
        def highlightCol(fname: String, spec: JsonNode): Column =
          highlightFragments(body, h, fname, spec)
        fieldEntries match {
          case Seq((fname, spec)) =>
            withNames.withColumn("_highlight", highlightCol(fname, spec))
          case entries =>
            entries.foldLeft(withNames) { case (acc, (fname, spec)) =>
              acc.withColumn(s"_highlight_$fname", highlightCol(fname, spec))
            }
        }
      case None => withNames
    }
    highlightedTail(body, sortSpecs, scriptSorts.map(_._1), highlighted)
  }

  /** One field's highlight fragments (factored for the multi-field form):
    * the column is a single fragment at `number_of_fragments` 1, an array
    * otherwise — see the option comments inline. */
  private def highlightFragments(body: JsonNode, h: JsonNode,
                                 fname: String, spec: JsonNode): Column = {
    {
        val fragSize = Option(spec.get("fragment_size")).map(_.asInt()).getOrElse(100)
        // `number_of_fragments` > 1 switches `_highlight` to an ARRAY of
        // fragments — one per distinct first-occurrence position of each
        // query term, ordered by position in the text (ES's default
        // fragment order), capped at N. `pre_tags`/`post_tags` (first
        // entry, as ES uses for the default highlighter) replace <em>.
        val nFrags = Option(spec.get("number_of_fragments"))
          .orElse(Option(h.get("number_of_fragments"))).map(_.asInt()).getOrElse(1)
        // field-level settings override the global highlight object (ES
        // precedence, same as the nFrags lookup above)
        def firstTag(key: String, dflt: String) =
          Option(spec.get(key)).orElse(Option(h.get(key)))
            .map(_.elements().asScala.next().asText()).getOrElse(dflt)
        val preTag = firstTag("pre_tags", "<em>")
        val postTag = firstTag("post_tags", "</em>")
        // `highlight_query`: highlight with a DIFFERENT query than the one
        // that selected the hits (the ES idiom for rescore/synonym-aware
        // highlighting). Field-level overrides global, global overrides the
        // body query — the same precedence as the tag options above. Only
        // the highlight terms change; hit selection already happened.
        val hlq = Option(spec.get("highlight_query"))
          .orElse(Option(h.get("highlight_query")))
          .getOrElse(body.get("query"))
        val (kind, qb) = single(hlq)
        require(kind == "match" || kind == "match_phrase",
          s"highlight supports match/match_phrase queries, got $kind")
        val (_, v) = single(qb)
        val terms = (if (v.isObject) v.get("query").asText() else v.asText())
          .toLowerCase.split("\\s+").toSeq
        val lowered = lower(field(fname))
        def wrapTerms(frag: Column) = terms.foldLeft(frag)((acc, t) =>
          replace(acc, lit(t), lit(s"$preTag$t$postTag")))
        if (nFrags == 1) {
          val pos = terms.map(t => when(instr(lowered, t) > 0, instr(lowered, t)))
            .reduce(coalesce(_, _))
          val start = greatest(pos - 30, lit(1))
          val wrapped = wrapTerms(lowered.substr(start, lit(fragSize)))
          when(pos.isNotNull, wrapped)
        } else {
          val posArr = array(terms.map(t => instr(lowered, t)): _*)
          val hits = slice(array_sort(array_distinct(
            filter(posArr, p => p > 0))), 1, nFrags)
          val frags = transform(hits, p =>
            wrapTerms(lowered.substr(greatest(p - 30, lit(1)), lit(fragSize))))
          when(org.apache.spark.sql.functions.size(frags) > 0, frags)
        }
    }
  }

  /** The post-highlight half of [[search]] (search_after → sort →
    * collapse → pagination → inner_hits → docvalue/stored/_source
    * projection), factored so the highlight stage can attach one or many
    * fragment columns before it. */
  private def highlightedTail(body: JsonNode,
      sortSpecs: Seq[(String, Option[String], Option[String])],
      scriptSortNames: Seq[String], highlighted: DataFrame): DataFrame = {
    // `search_after`: deep pagination as a cursor on the sort tuple — the
    // next page is rows strictly after the cursor in sort order (ES's
    // replacement for deep from/size; no offset scan at scale). Direction-
    // aware lexicographic comparison over the sort fields.
    val paged = Option(body.get("search_after")) match {
      case Some(cursor) =>
        require(sortSpecs.nonEmpty, "search_after requires sort")
        val vals = cursor.elements().asScala.toSeq
        require(vals.size == sortSpecs.size, "search_after arity must match sort")
        def colOf(f: String) = if (f == "_score") col("_score") else field(f)
        def dirOf(spec: (String, Option[String], Option[String])) =
          spec._2.getOrElse(if (spec._1 == "_score") "desc" else "asc")
        // null-aware tuple comparison under the sort's missing placement
        // (default `_last`): a null-keyed hit sorts after every value, so
        // "after the cursor" at a non-null cursor INCLUDES the null tail,
        // and a null cursor (the walk is inside the tail) advances on the
        // tiebreak levels only. The plain ===/> form went null on both
        // and silently LOST every null-keyed doc past page one (same
        // cursor-walk property find as the composite fix; a227 pins it).
        val pred = sortSpecs.indices.map { i =>
          val eqPrefix = (0 until i).map { j =>
            val cj = colOf(sortSpecs(j)._1)
            if (vals(j).isNull) cj.isNull else cj === litOf(vals(j))
          }.reduceOption(_ && _).getOrElse(lit(true))
          val (_, _, missing) = sortSpecs(i)
          val c = colOf(sortSpecs(i)._1)
          val nullsFirst = missing.contains("_first")
          val cmp =
            if (vals(i).isNull) { if (nullsFirst) c.isNotNull else lit(false) }
            else {
              val base = if (dirOf(sortSpecs(i)) == "desc") c < litOf(vals(i))
                         else c > litOf(vals(i))
              if (nullsFirst) base else base || c.isNull
            }
          eqPrefix && cmp
        }.reduce(_ || _)
        highlighted.filter(pred)
      case None => highlighted
    }
    val sortCols = sortSpecs.map { case (f, order, missing) =>
      val c = if (f == "_score") col("_score") else field(f)
      val dir = order.getOrElse(if (f == "_score") "desc" else "asc")
      // ES default: missing docs last in either direction; "_first" flips
      (dir, missing) match {
        case ("desc", Some("_first")) => c.desc_nulls_first
        case ("desc", _) => c.desc_nulls_last
        case (_, Some("_first")) => c.asc_nulls_first
        case (_, _) => c.asc_nulls_last
      }
    }
    // `collapse`: one hit per distinct field value — the TOP hit by the
    // body's sort (per-group row_number over a partitioned window; bounded
    // partitions, no global sort).
    val collapsed = Option(body.get("collapse")) match {
      case Some(c) =>
        require(sortSpecs.nonEmpty, "collapse requires an explicit sort")
        val fieldCol = field(c.get("field").asText())
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(fieldCol).orderBy(sortCols: _*)
        val base = paged.withColumn("_collapse_rn", row_number().over(w))
        // collapse `inner_hits`: the top-k group members by the inner sort
        // ride the representative row as a list (built by a collect over
        // the SAME collapse-key partitioning — rank window, collect
        // window, and the collapse window share one exchange) and explode
        // into `_inner` rows only AFTER parent sort/from/size.
        Option(c.get("inner_hits")) match {
          case None => base.filter(col("_collapse_rn") === 1).drop("_collapse_rn")
          case Some(ih) =>
            val ihSize = Option(ih.get("size")).map(_.asInt()).getOrElse(3)
            val srcFields = Option(ih.get("_source"))
              .map(_.elements().asScala.map(_.asText()).toSeq)
              .getOrElse(throw new IllegalArgumentException(
                "collapse inner_hits requires _source (the inner-hit projection)"))
            val innerSort: Seq[Column] =
              Option(ih.get("sort")).map(_.elements().asScala.toSeq.map { e =>
                if (e.isTextual) field(e.asText()).asc
                else {
                  val (f, sp) = single(e)
                  if (Option(sp.get("order")).map(_.asText()).contains("desc"))
                    field(f).desc else field(f).asc
                }
              }).getOrElse(Seq.empty)
            require(innerSort.nonEmpty,
              "collapse inner_hits requires sort (give a unique tie-break)")
            val wI = org.apache.spark.sql.expressions.Window
              .partitionBy(fieldCol).orderBy(innerSort: _*)
            val wAll = org.apache.spark.sql.expressions.Window.partitionBy(fieldCol)
            val st = struct(col("_ih_rn").as("_rank") +:
              srcFields.map(f => field(f).as(f.replace('.', '_'))): _*)
            base
              .withColumn("_ih_rn", row_number().over(wI))
              .withColumn("_inner_list",
                array_sort(collect_list(when(col("_ih_rn") <= ihSize, st)).over(wAll)))
              .filter(col("_collapse_rn") === 1)
              .drop("_collapse_rn", "_ih_rn")
        }
      case None => paged
    }
    val sorted =
      if (sortSpecs.isEmpty) collapsed
      else collapsed.orderBy(sortCols: _*)
    val from = Option(body.get("from")).map(_.asInt()).getOrElse(0)
    // ES defaults `size` to 10 on every search — pre-round-15 an absent
    // size returned ALL hits, an answer-level deviation the differential
    // fuzz caught on its first run (and a scale hazard: an unsized query
    // over a 100 TB corpus must not return the corpus). `"size": 0` stays
    // meaningful (aggs-only request).
    val size = Option(body.get("size")).map(_.asInt()).getOrElse(10)
    val offs = if (from > 0) sorted.offset(from) else sorted
    val limited = offs.limit(size)
    // `inner_hits` on a top-level `nested` query: per returned PARENT hit,
    // the matching child docs land in an `_inner` struct column — one row
    // per inner hit (ES returns a per-hit child list; the exploded rows
    // are the relational equivalent). Children sort by the inner_hits
    // `sort` entries (give a unique tie-break member for a total order)
    // and cap at `size` (ES default 3). All per-parent work is narrow
    // HOFs AFTER pagination, so the fan-out never touches the parent
    // sort/from/size — and a parent that passed the nested predicate has
    // ≥1 matching child, so the explode drops no hits.
    val withInner = Option(body.get("query")).map(single).collect {
      case ("nested", nb) if nb.has("inner_hits") => nb
    } match {
      case Some(nb) =>
        // fail loud: combining nested inner_hits with collapse.inner_hits
        // would silently drop the collapse side (the _inner_list column
        // attached by the collapse pass never explodes in this branch)
        require(!limited.columns.contains("_inner_list"),
          "nested-query inner_hits cannot be combined with collapse inner_hits")
        val path = nb.get("path").asText()
        val ih = nb.get("inner_hits")
        val ihSize = Option(ih.get("size")).map(_.asInt()).getOrElse(3)
        def member(name: String) =
          if (name.startsWith(path + ".")) name.stripPrefix(path + ".") else name
        val matched = filter(field(path), x =>
          predicateWith(nb.get("query"), name => x.getField(member(name))))
        val ordered = Option(ih.get("sort")) match {
          case Some(sn) =>
            val entries = sn.elements().asScala.toSeq.map { e =>
              if (e.isTextual) (member(e.asText()), "asc")
              else {
                val (f, sp) = single(e)
                (member(f), Option(sp.get("order")).map(_.asText()).getOrElse("asc"))
              }
            }
            val cmp = (a: Column, b: Column) =>
              entries.map { case (m, ord) =>
                val (x, y) = if (ord == "desc") (b.getField(m), a.getField(m))
                             else (a.getField(m), b.getField(m))
                when(x < y, lit(-1)).when(x > y, lit(1)).otherwise(lit(0))
              }.reduceRight((c, acc) => when(c =!= 0, c).otherwise(acc))
            array_sort(matched, cmp)
          case None => matched
        }
        limited.withColumn("_inner", explode(slice(ordered, 1, ihSize)))
      case None =>
        // collapse inner_hits: the per-group list was attached during the
        // collapse window pass; fan out after parent pagination
        if (limited.columns.contains("_inner_list"))
          limited.withColumn("_inner", explode(col("_inner_list"))).drop("_inner_list")
        else limited
    }
    // `docvalue_fields`: per-hit values rendered from doc values rather
    // than `_source` — relationally, extra `<field>_dv` columns with the
    // requested `format` applied (`epoch_millis` → the long instant; a
    // date pattern → the formatted string; no format → the raw value).
    // Narrow computed columns, so they prune into the scan like any other.
    val withDv = Option(body.get("docvalue_fields")) match {
      case Some(dvf) =>
        dvf.elements().asScala.toSeq.foldLeft(withInner) { (acc, e) =>
          val (fname, fmt) =
            if (e.isTextual) (e.asText(), None)
            else (e.get("field").asText(), Option(e.get("format")).map(_.asText()))
          val c = fmt match {
            // cast handles TIMESTAMP_NTZ columns (parquet naive
            // timestamps); the session zone is pinned UTC, so the cast is
            // instant-preserving — the same reading DuckDB's epoch_ms gives
            case Some("epoch_millis") => unix_millis(field(fname).cast("timestamp"))
            case Some(p) => date_format(field(fname), p)
            case None => field(fname)
          }
          acc.withColumn(s"${fname}_dv", c)
        }
      case None => withInner
    }
    // `script_fields`: per-hit computed values from the painless-arithmetic
    // subset (the same doc['f'].value binding as script sorts and metric
    // scripts — codegen'd columns, no per-row interpreter). Like _score,
    // they ride the hit through `_source` filtering (ES returns script
    // fields regardless of source filtering).
    val scriptFieldNames = Option(body.get("script_fields")).toSeq
      .flatMap(_.fieldNames().asScala.toSeq)
    val withSf = Option(body.get("script_fields")) match {
      case Some(sfn) =>
        sfn.fields().asScala.toSeq.foldLeft(withDv) { (acc, e) =>
          val sfNode = e.getValue.get("script")
          val raw = scriptSource(sfNode)
          val c = expr(Painless.compile(raw, params = scriptParams(sfNode)))
          val withIt = acc.withColumn(e.getKey, c)
          // float outputs take the 6-dp engine-stable rounding; the
          // string/int/boolean values the widened subset can now produce
          // pass through exactly
          withIt.schema(e.getKey).dataType match {
            case org.apache.spark.sql.types.DoubleType |
                 org.apache.spark.sql.types.FloatType =>
              acc.withColumn(e.getKey, round(c, 6))
            case _ => withIt
          }
        }
      case None => withDv
    }
    // `stored_fields`: the explicit field-return list ("_none_" = return
    // no stored fields at all — metadata-only hits). The named fields join
    // the projection alongside `_source`; with `"_source": false` they ARE
    // the projection (plus whatever the body computed: _score, highlight…).
    val storedWanted: Seq[String] = Option(body.get("stored_fields")) match {
      case Some(sf) if sf.isTextual =>
        require(sf.asText() == "_none_",
          s"stored_fields accepts a field list or \"_none_\", got ${sf.asText()}")
        Seq.empty
      case Some(sf) =>
        sf.elements().asScala.map(_.asText()).toSeq
      case None => Seq.empty
    }
    // `_source` filtering: project the hit down to the named fields (plus
    // any engine-computed columns already requested by the body) — the
    // column-pruning hint Catalyst pushes all the way into the scan
    def computedCols = (Seq("_score", "matched_queries", "_highlight", "_inner")
      ++ scriptFieldNames
      ++ withSf.columns.filter(c => c.endsWith("_dv") || c.startsWith("_highlight_")))
      .filter(withSf.columns.contains)
    val projected = Option(body.get("_source")) match {
      case Some(src) if src.isArray =>
        val wanted = (src.elements().asScala.map(_.asText()).toSeq
          ++ storedWanted).distinct
        withSf.select((wanted.map(f => field(f).as(f)) ++ computedCols.map(col)): _*)
      case Some(other) =>
        require(other.isBoolean, "_source supports an include list or a boolean")
        if (other.asBoolean()) withSf
        else {
          // `"_source": false`: hits carry only stored fields + computed
          // columns (the ES metadata-only / fields-only response shape)
          val cols = (storedWanted.map(f => field(f).as(f)) ++ computedCols.map(col))
          require(cols.nonEmpty,
            "_source:false needs stored_fields or computed columns to return")
          withSf.select(cols: _*)
        }
      case None =>
        if (storedWanted.isEmpty) withSf
        else withSf.select((storedWanted.map(f => field(f).as(f))
          ++ computedCols.map(col)): _*)
    }
    // script-sort keys are sort machinery, not part of the hit
    scriptSortNames.foldLeft(projected)(_ drop _)
  }

  /** ES `_msearch`: several search bodies against one index in a single
    * call. Each body runs through [[search]] unchanged; its hits carry
    * the 0-based `_search_idx` of the request (ES returns an ordered
    * `responses` array — one unioned frame tagged with the request index
    * is the relational equivalent, and each body's own from/size keeps
    * every slice coordinator-bounded). Bodies must project
    * union-compatible hit columns; the caller controls both sides. */
  def msearch(df: DataFrame, bodies: Seq[String]): DataFrame = {
    require(bodies.nonEmpty, "msearch needs at least one body")
    bodies.zipWithIndex.map { case (b, i) =>
      search(df, b).withColumn("_search_idx", lit(i.toLong))
    }.reduce(_.unionByName(_))
  }

  /** ES `_mget`: fetch documents by id, PRESERVING request order (ES
    * returns `docs` in the order the ids were asked). The (id, position)
    * list broadcasts against the index — the corpus never shuffles and
    * the id equality pushes into the scan; a missing id simply yields no
    * row (ES emits a `found: false` stub — the relational form drops it,
    * and the caller can left-join the request list if stubs matter). */
  def mget(df: DataFrame, idCol: String, ids: Seq[Any]): DataFrame = {
    require(ids.nonEmpty, "mget needs at least one id")
    val sp = df.sparkSession
    import sp.implicits._
    val order = ids.zipWithIndex.map { case (v, i) => (v.toString, i.toLong) }
      .toDF("_mget_id", "_mget_idx")
    df.join(broadcast(order), df(idCol).cast("string") === col("_mget_id"))
      .drop("_mget_id")
      .orderBy("_mget_idx")
  }

  /** ES `_field_caps` API: per-field capabilities from the mapping — the
    * ES type name, and whether the field is searchable/aggregatable (text
    * needs fielddata for aggs in ES, so it reports non-aggregatable).
    * Pure schema reflection: no data is scanned, the rows come from the
    * driver-side StructType — constant cost at any corpus size. */
  def fieldCaps(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val sp = df.sparkSession
    import sp.implicits._
    // ES has no array type: an array of scalars reports the ELEMENT type
    // (array<string> is just a multi-valued "text" field); only arrays of
    // objects are "nested"
    def esType(dt: DataType): String = dt match {
      case LongType                        => "long"
      case IntegerType                     => "integer"
      case DoubleType                      => "double"
      case FloatType                       => "float"
      case BooleanType                     => "boolean"
      case StringType                      => "text"
      case TimestampType | TimestampNTZType => "date"
      case BinaryType                      => "binary"
      case ArrayType(_: StructType, _)     => "nested"
      case ArrayType(elem, _)              => esType(elem)
      case _: MapType | _: StructType      => "object"
      case other                           => other.simpleString
    }
    df.schema.fields.toSeq.map { f =>
      val es = esType(f.dataType)
      (f.name, es, true, es != "text" && es != "object" && es != "nested")
    }.toDF("field", "es_type", "searchable", "aggregatable")
      .orderBy("field")
  }

  /** ES `_delete_by_query`: the index minus every doc matching the body's
    * query — the relational anti-filter over the same predicate translator
    * [[search]] uses, so any filter-context query works. Docs where the
    * predicate is NULL (missing fields) do not match and are KEPT, the ES
    * three-valued-match behavior (`!coalesce(p, false)`, not SQL's
    * null-dropping NOT). Version conflicts are the snapshot layer's job
    * (BucketedIndex versioned publishes), not the plan's. */
  /** ES filtered ALIAS (`POST _aliases` with a `filter`): an alias is a
    * named VIEW of an index whose filter conjoins with EVERY request
    * against it — hits, counts and aggregations alike — because ES
    * installs it on the alias's reader rather than into the query (the
    * day-one multi-tenant pattern). The returned frame IS that view;
    * search/aggregations against it scope everything accordingly.
    * Filter-context semantics: no scoring, ES three-valued match (a NULL
    * predicate does not match). Scale: the filter sits directly over the
    * scan, so pushdown-eligible alias filters prune at the source. */
  def filteredAlias(df: DataFrame, filterJson: String): DataFrame =
    withSchemaOf(df)(df.filter(coalesce(predicate(parse(filterJson)), lit(false))))

  def deleteByQuery(df: DataFrame, bodyJson: String): DataFrame = withSchemaOf(df) {
    val body = parse(bodyJson)
    val q = Option(body.get("query")).getOrElse(
      throw new IllegalArgumentException("_delete_by_query needs a query"))
    df.filter(!coalesce(predicate(q), lit(false)))
  }

  /** ES `_update_by_query` with a painless-subset script: docs matching
    * the body's query get `ctx._source.<field> = <arithmetic over
    * ctx._source / doc refs>`; everything else passes through unchanged.
    * The assignment compiles to one conditional column (codegen'd, no
    * interpreter); the target keeps its original type when it already
    * exists. A scriptless body degenerates to the identity (ES uses that
    * form to bump versions — no relational effect). */
  def updateByQuery(df: DataFrame, bodyJson: String): DataFrame = withSchemaOf(df) {
    val body = parse(bodyJson)
    val matches = Option(body.get("query"))
      .map(q => coalesce(predicate(q), lit(false))).getOrElse(lit(true))
    Option(body.get("script")) match {
      case None => df
      case Some(sNode) => scriptAssign(df, sNode, matches)
    }
  }

  /** Compile the painless-subset assignment `ctx._source.<field> = <expr>`
    * into one conditional column on `df` (rows failing `matches` pass
    * through unchanged). Shared by [[updateByQuery]] and [[reindex]]. */
  private def scriptAssign(df: DataFrame, sNode: JsonNode, matches: Column): DataFrame = {
    val raw = scriptSource(sNode)
    val asn = "ctx\\._source\\.([A-Za-z0-9_]+)\\s*=\\s*(.+)".r
    raw match {
      case asn(target, rhs) =>
        val ctxRe = "ctx\\._source\\.([A-Za-z0-9_.]+)".r
        val ctxIds = ctxRe.findAllMatchIn(rhs).map(_.group(1)).toSet
        val bound = Painless.compile(
          ctxRe.replaceAllIn(rhs, m => m.group(1)), extraIds = ctxIds,
          params = scriptParams(sNode))
        val value =
          if (df.columns.contains(target)) expr(bound).cast(df.schema(target).dataType)
          else expr(bound)
        if (df.columns.contains(target))
          df.withColumn(target, when(matches, value).otherwise(col(target)))
        else df.withColumn(target, when(matches, value))
      case _ => throw new IllegalArgumentException(
        s"update script must be 'ctx._source.<field> = <expr>', got: $raw")
    }
  }

  /** ES `_reindex`: copy a source index's docs into a destination index —
    * optional `source.query` filter, optional painless-subset `script`
    * (the [[updateByQuery]] assignment grammar, applied to every copied
    * doc), and the ES id-conflict semantics: the default `op_type`
    * ("index") overwrites destination docs sharing an id with a copied
    * doc; `"op_type": "create"` with `"conflicts": "proceed"` keeps the
    * existing destination doc and admits only new ids (without
    * `conflicts: proceed` ES aborts on the first conflict — rejected
    * loudly here). Returns the post-reindex destination index. Plan
    * shape: a narrow filtered/transformed source scan + ONE id-keyed
    * left-anti join — at scale the only shuffle keys by doc id, and the
    * union adds no exchange. */
  def reindex(source: DataFrame, dest: DataFrame, bodyJson: String,
              idField: String = "id"): DataFrame = {
    val body = parse(bodyJson)
    val filtered = Option(body.get("source")).flatMap(s => Option(s.get("query")))
      .map(q => source.filter(coalesce(predicate(q), lit(false))))
      .getOrElse(source)
    val copied = Option(body.get("script")) match {
      case None => filtered
      case Some(sNode) => scriptAssign(filtered, sNode, lit(true))
    }
    val opType = Option(body.get("dest")).flatMap(d => Option(d.get("op_type")))
      .map(_.asText()).getOrElse("index")
    opType match {
      case "index" =>
        dest.join(copied.select(col(idField)), Seq(idField), "left_anti")
          .unionByName(copied)
      case "create" =>
        require(Option(body.get("conflicts")).map(_.asText()).contains("proceed"),
          "op_type create without conflicts:proceed aborts on the first conflict — pass \"conflicts\": \"proceed\"")
        dest.unionByName(
          copied.join(dest.select(col(idField)), Seq(idField), "left_anti"))
      case other => throw new IllegalArgumentException(
        s"unsupported reindex op_type: $other")
    }
  }

  /** ES `_search/template`: inline mustache-subset rendering — every
    * `{{name}}` placeholder in `source` is replaced by the matching
    * `params` value (numbers/booleans verbatim, strings raw — the
    * template supplies its own quotes, ES mustache behavior) and the
    * rendered body runs through [[search]]. Unresolved placeholders are
    * rejected loudly rather than silently rendered as ES's empty
    * string (an empty term is never what a relational caller wants). */
  /** Template rendering shared by [[searchTemplate]] and the
    * `_render/template` API (which returns the substituted body WITHOUT
    * executing): mustache-param substitution over inline or stored
    * (`_scripts/{id}`) template source; unresolved placeholders reject
    * loudly, exactly as execution would. */
  def renderTemplate(templateJson: String): String = {
    val t = parse(templateJson)
    // stored search templates live in the same `_scripts/{id}` namespace
    // as stored painless scripts (ES 6.5), so `{"id": ...}` resolves
    // through the same registry
    val src = scriptSource(t)
    val params = Option(t.get("params")).map(_.properties().asScala.toSeq
        .map(e => e.getKey -> e.getValue)).getOrElse(Seq.empty)
    val rendered = params.foldLeft(src) { case (acc, (k, v)) =>
      acc.replace(s"{{$k}}", if (v.isTextual) v.asText() else v.toString)
    }
    require(!rendered.matches("(?s).*\\{\\{[A-Za-z0-9_]+\\}\\}.*"),
      s"unresolved template placeholders in: $rendered")
    rendered
  }

  def searchTemplate(df: DataFrame, templateJson: String): DataFrame =
    search(df, renderTemplate(templateJson))

  /** ES `_explain`-style score decomposition for a `match` query: each
    * hit row is exploded per query term with (term, tf, df, idf, weight)
    * next to the total `_score` — "why did this doc score X". The
    * breakdown columns are the VERY expressions [[EsDsl.bm25ScoresMixed]]
    * sums (same one corpus-stats pass), so the parts provably add up to
    * the total; idf/weight round to 6 dp like every score surface. */
  def explainMatch(df: DataFrame, fieldName: String, queryText: String,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryText.toLowerCase.split("\\s+").toSeq.distinct
    val (joined, scores, internals) = EsDsl.bm25ScoresMixed(df,
      Seq(EsDsl.TermsBm25(field(fieldName), terms)), k1, b)
    val scored = joined.withColumn("_score", round(scores.head, 6))
      .filter(col("_score") > 0)
    val parts = terms.zipWithIndex.map { case (t, j) =>
      val tf = element_at(col("_tfs0"), j + 1).cast("double")
      val dfc = col(s"_df0_$j")
      val idf = log(lit(1.0) + (col("_n") - dfc + 0.5) / (dfc + 0.5))
      val lengthNorm = lit(k1) * (lit(1 - b) + lit(b) * col("_dl0") / col("_avgdl0"))
      struct(lit(t).as("term"), tf.as("tf"), dfc.as("df"), round(idf, 6).as("idf"),
        round(idf * (tf * (k1 + 1)) / (tf + lengthNorm), 6).as("weight"))
    }
    scored.withColumn("_e", explode(array(parts: _*)))
      .select(df.columns.map(col) ++ Seq(col("_e.term").as("term"),
        col("_e.tf").as("tf"), col("_e.df").as("df"), col("_e.idf").as("idf"),
        col("_e.weight").as("weight"), col("_score")): _*)
  }

  /** ES `_count`: the hit count of a query body without materializing
    * hits — predicate + one scalar aggregate (the count runs map-side
    * partial, no row ever leaves the executors). */
  def countApi(df: DataFrame, bodyJson: String): DataFrame = {
    val body = parse(bodyJson)
    val base = Option(body.get("query")) match {
      case Some(q) => df.filter(predicate(q))
      case None => df
    }
    base.agg(count(lit(1)).as("count"))
  }

  /** ES `_rank_eval`: run each request's search body, rank its hits
    * 1..size in the body's sort order, join the request's relevance
    * ratings, and emit the standard ranking metrics per request —
    * `precision` at k (graded ratings count as relevant when > 0),
    * `reciprocal_rank` of the first relevant hit (0 when none), and
    * `dcg` at k in the Burges form (2^rating − 1)/log2(rank + 1), which
    * reduces to the classic form on binary ratings. Each request's hit
    * list is body-`size`-bounded (like ES's own response), so the rank
    * window and metric agg run over ≤ k·#requests rows; ratings join
    * broadcast. `requests` entries are (name, bodyJson, rankOrder) where
    * rankOrder restates the body's sort as Columns (the window needs
    * materialized keys); `ratings` has (request, doc, rating). */
  def rankEval(df: DataFrame, requests: Seq[(String, String, Seq[Column])],
               idCol: String, ratings: DataFrame, k: Int): DataFrame = {
    require(requests.nonEmpty, "rank_eval needs at least one request")
    val hits = requests.map { case (name, body, order) =>
      val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
      search(df, body)
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(lit(name).as("request"), col(idCol).as("_doc"), col("rank"))
    }.reduce(_.unionByName(_))
    // ES metrics consider the top min(k, retrieved) hits ONLY — a body
    // `size` past k must not leak extra hits into the metrics — and
    // precision's denominator is the RETRIEVED count, not k (ES's
    // PrecisionAtK contract; short hit lists otherwise under-score).
    // Differential find (EsApiDifferentialSpec); the sibling
    // RankEval.rankEval always had the retrieved-count form.
    val rated = hits.filter(col("rank") <= k).join(
      broadcast(ratings.select(col("request"), col("doc").as("_doc"),
        col("rating").cast("double").as("rating"))),
      Seq("request", "_doc"), "left")
      .withColumn("rel", coalesce(col("rating"), lit(0.0)) > 0)
    rated.groupBy("request").agg(
      round(sum(when(col("rel"), 1.0).otherwise(0.0)) / count(lit(1)), 6).as("precision"),
      round(coalesce(max(when(col("rel"), lit(1.0) / col("rank"))), lit(0.0)), 6)
        .as("reciprocal_rank"),
      round(sum(when(col("rel"),
        (pow(lit(2.0), col("rating")) - 1.0) / log2(col("rank") + 1.0))
        .otherwise(0.0)), 6).as("dcg"))
      .orderBy("request")
  }

  /** ES `common` terms query (the pre-BM25 stopword-aware match): terms
    * whose document frequency exceeds `cutoff_frequency` (a fraction of N
    * when < 1, an absolute count when ≥ 1) are "high frequency" and stop
    * filtering; the low-frequency terms form the required match
    * (`low_freq_operator` and/or, `minimum_should_match.low_freq`). When
    * EVERY term is high-frequency the high group becomes the query with
    * `minimum_should_match.high_freq` (ES's all-stopwords fallback). The
    * df fetch is one tiny scalar aggregate collected on the driver — the
    * same coordinating-node step ES runs against its term dictionary —
    * and the resulting predicate is an ordinary codegen'd token-set test.
    * Supported at the top level of a search body (filter context). */
  private def commonTermsPredicate(df: DataFrame, body: JsonNode): Column = {
    val (f, spec) = single(body)
    val v = spec.get("query").asText()
    val terms = v.toLowerCase.split("\\s+").toSeq.distinct
    val cutoff = Option(spec.get("cutoff_frequency")).map(_.asDouble()).getOrElse(0.01)
    val toks = graft.ext.TextAnalysis.tokens(field(f))
    val aggCols = count(lit(1)).cast("double").as("_n") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(toks, t), 1L).otherwise(0L)).cast("double").as(s"_df$i")
      }
    val statsFrame = df.agg(aggCols.head, aggCols.tail: _*) // analysis checks the field
    // validate-only: skip the corpus df-counts; all-low-freq is the
    // placeholder shape (plan construction below is identical either way)
    val isHigh =
      if (validateOnly.value) terms.map(_ => false)
      else {
        val r = statsFrame.collect()(0)
        val n = r.getDouble(0)
        val threshold = if (cutoff < 1.0) cutoff * n else cutoff
        terms.indices.map(i => r.getDouble(i + 1) > threshold)
      }
    val low = terms.zip(isHigh).collect { case (t, false) => t }
    val high = terms.zip(isHigh).collect { case (t, true) => t }
    val lowOp = Option(spec.get("low_freq_operator")).map(_.asText()).getOrElse("or")
    val msmNode = Option(spec.get("minimum_should_match"))
    def msmOf(key: String, default: Int) = msmNode.flatMap(m =>
      if (m.isObject) Option(m.get(key)).map(_.asInt()) else Some(m.asInt()))
      .getOrElse(default)
    if (low.nonEmpty)
      EsDsl.matchQuery(field(f), low,
        if (lowOp == "and") low.size else msmOf("low_freq", 1))
    else
      EsDsl.matchQuery(field(f), high, msmOf("high_freq", 1))
  }

  /** The `_score`-producing query kinds. `match` is Lucene-shaped BM25
    * ([[EsDsl.matchBm25]]); `match_phrase` scores by phrase frequency
    * (overlapping occurrence count as tf, Lucene's exact-phrase freq);
    * `multi_match` is best_fields (max of per-field BM25, ES's default
    * type); `constant_score` scores its `boost` for every doc passing the
    * wrapped filter; `bool` accumulates ADDITIVELY over its scoring
    * clauses (must first, then should, in clause order — the association
    * the 6-dp oracle mirrors): match/phrase/multi_match clauses contribute
    * boost × BM25 (sharing ONE corpus pass and stats frame), a
    * `constant_score` or boosted `term` clause contributes its boost when
    * it matches, any other clause kind filters without scoring. `filter`
    * clauses never score (ES semantics). bool-level `minimum_should_match`
    * defaults ES-faithfully: 1 when the bool is should-only, else 0. */
  /** `more_like_this` query construction — the coordinating-node step ES
    * runs before searching: gather the like sources (doc refs fetched by
    * id — a |like|-bounded collect — plus free-text likes), count their
    * term frequencies, keep candidates with `min_term_freq`, score
    * tf·ln(N/df) against the CORPUS stats (the engine-wide MLT selection
    * formula, [[graft.ext.TextAnalysis.tfIdfTopK]] — ES uses Lucene's
    * 1+log form; same ordering on any one corpus, documented choice),
    * drop `min_doc_freq` failures, take `max_query_terms` by (score
    * desc, term asc). The candidate scoring runs as ONE bounded Spark
    * job (candidate terms ≤ the like docs' vocabulary), so round/log
    * semantics match the engine everywhere. Doc refs resolve `_id`
    * against `doc_id` when the frame has it, else `id` (the engine's two
    * id conventions); `include` defaults false (like docs excluded from
    * results); `minimum_should_match` defaults ES's "30%". `like` and
    * `unlike` accept free-text strings, `{"_id": n}` doc refs, and
    * `{"doc": {...}}` artificial documents; terms appearing in any
    * `unlike` source are skipped during selection (ES's exclusion set).
    * Unsupported options (per-field boosts, analyzer overrides, ...)
    * reject loudly. */
  private case class MltSpec(f: String, terms: Seq[String], likeIds: Seq[Long],
                             msm: Int, idColName: String)
  private def mltSpec(body: JsonNode): MltSpec = {
    val fields = Option(body.get("fields")).map(_.elements().asScala.toSeq.map(_.asText()))
      .getOrElse(throw new IllegalArgumentException("more_like_this needs 'fields'"))
    require(fields.size == 1,
      s"more_like_this supports exactly one field, got ${fields.mkString(", ")}")
    val f = fields.head
    require(!indexAnalyzers.value.contains(f),
      s"more_like_this against index-analyzed field '$f' is unsupported " +
        "(term selection over an expanded stream is not wired)")
    val known = Set("fields", "like", "unlike", "max_query_terms",
      "min_term_freq", "min_doc_freq", "minimum_should_match", "include",
      "boost")
    val unknown = body.fieldNames().asScala.toSeq.filterNot(known)
    require(unknown.isEmpty,
      s"unsupported more_like_this options: ${unknown.sorted.mkString(", ")}")
    // like/unlike entries: free-text strings, {"_id": n} doc refs, or
    // artificial documents {"doc": {"<field>": "..."}} (ES's third form —
    // the doc's value for the queried field stands in as like text)
    def entries(node: JsonNode, what: String): (Seq[Long], Seq[String]) = {
      val es = if (node.isArray) node.elements().asScala.toSeq else Seq(node)
      require(es.nonEmpty, s"more_like_this '$what' must not be empty")
      val (objs, texts) = es.partition(_.isObject)
      require(texts.forall(_.isTextual),
        s"more_like_this '$what' entries must be strings, {\"_id\": n} doc refs, " +
          "or {\"doc\": {...}} artificial documents")
      val (artificial, refs) = objs.partition(_.has("doc"))
      val ids = refs.map { n =>
        val keys = n.fieldNames().asScala.toSeq
        require(keys.forall(Set("_id", "_index", "_type")),
          s"more_like_this doc ref supports _id/_index/_type, got ${keys.mkString(", ")}")
        Option(n.get("_id")).map(_.asLong()).getOrElse(
          throw new IllegalArgumentException("more_like_this doc ref needs _id"))
      }
      val artTexts = artificial.map { n =>
        require(n.fieldNames().asScala.toSeq.forall(Set("doc", "_index", "_type")),
          "more_like_this artificial document supports doc/_index/_type keys")
        Option(n.get("doc").get(f)).map(_.asText()).getOrElse(
          throw new IllegalArgumentException(
            s"more_like_this artificial document must carry the queried field '$f'"))
      }
      (ids, texts.map(_.asText()) ++ artTexts)
    }
    val likeNode = Option(body.get("like"))
      .getOrElse(throw new IllegalArgumentException("more_like_this needs 'like'"))
    val (likeIds, likeTexts) = entries(likeNode, "like")
    val (unlikeIds, unlikeTexts) =
      Option(body.get("unlike")).map(entries(_, "unlike")).getOrElse((Seq.empty, Seq.empty))
    val maxQ = Option(body.get("max_query_terms")).map(_.asInt()).getOrElse(25)
    val minTf = Option(body.get("min_term_freq")).map(_.asInt()).getOrElse(2)
    val minDf = Option(body.get("min_doc_freq")).map(_.asInt()).getOrElse(5)
    val include = Option(body.get("include")).exists(_.asBoolean())
    val exclude = if (include) Seq.empty else likeIds
    if (validateOnly.value) {
      // resolve the id column from the schema (available in validate
      // mode) — a hardcoded "doc_id" would make mltPredicate build a
      // nonexistent column on an "id"-keyed frame and _validate would
      // falsely classify a valid body (ADVICE round 14)
      val idc = querySchema.value
        .map(sch => if (sch.fieldNames.contains("doc_id")) "doc_id" else "id")
        .getOrElse("doc_id")
      return MltSpec(f, Seq("placeholder"), exclude, 1, idc)
    }
    val df = queryFrame.value.getOrElse(throw new IllegalArgumentException(
      "more_like_this needs the search frame for term statistics " +
        "(run it through a df-bearing entry point)"))
    val idColName = if (df.columns.contains("doc_id")) "doc_id" else "id"
    def fetchTexts(ids: Seq[Long]): Seq[String] =
      if (ids.isEmpty) Seq.empty
      else df.filter(col(idColName).isin(ids: _*))
        .select(field(f).cast("string")).collect()
        .map(r => Option(r.getString(0)).getOrElse("")).toSeq
    // driver tokenization mirrors TextAnalysis.tokens (lower, \W+ split)
    def toks(ss: Seq[String]): Seq[String] =
      ss.flatMap(_.toLowerCase.split("\\W+").filter(_.nonEmpty))
    val tf = toks(fetchTexts(likeIds) ++ likeTexts)
      .groupBy(identity).view.mapValues(_.size).toMap
    // ES `unlike`: terms appearing in any unlike source are skipped
    // during selection (the "interesting terms" exclusion set)
    val skip = toks(fetchTexts(unlikeIds) ++ unlikeTexts).toSet
    val cands = tf.filter { case (t, c) => c >= minTf && !skip(t) }
      .keys.toSeq.sorted
    val msmNode = Option(body.get("minimum_should_match"))
    def msmFor(n: Int) =
      math.max(1, msmNode.map(msmOf(_, n)).getOrElse(msmOf(parse("\"30%\""), n)))
    if (cands.isEmpty) return MltSpec(f, Seq.empty, exclude, 1, idColName)
    val spark = df.sparkSession
    import spark.implicits._
    val candDf = cands.map(t => (t, tf(t).toLong)).toDF("term", "ltf")
    val terms = df
      .select(explode(array_distinct(graft.ext.TextAnalysis.tokens(field(f)))).as("term"))
      .filter(col("term").isin(cands: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .join(broadcast(candDf), "term")
      .crossJoin(broadcast(df.agg(count(lit(1)).as("n_docs"))))
      .withColumn("tfidf",
        round(col("ltf") * log(col("n_docs").cast("double") / col("df")), 6))
      .orderBy(desc("tfidf"), col("term")).limit(maxQ)
      .select("term").collect().map(_.getString(0)).toSeq
    MltSpec(f, terms, exclude, msmFor(terms.size), idColName)
  }

  /** The document-level `more_like_this` predicate (filter context): the
    * doc shares at least msm of the selected terms, like docs excluded.
    * Narrow — one token-set intersect against a literal term array. */
  private def mltPredicate(body: JsonNode, fld: String => Column): Column = {
    val spec = mltSpec(body)
    if (spec.terms.isEmpty) lit(false)
    else {
      val shared = size(array_intersect(
        array_distinct(graft.ext.TextAnalysis.tokens(fld(spec.f))),
        typedLit(spec.terms)))
      val base = shared >= lit(spec.msm)
      if (spec.likeIds.nonEmpty)
        base && !col(spec.idColName).isin(spec.likeIds: _*)
      else base
    }
  }

  private def scoredSearch(df: DataFrame, q: JsonNode): DataFrame = {
    val (kind, body) = single(q)
    checkQuerySpec(kind, body)
    kind match {
      case "match" =>
        val (f, v) = single(body)
        val (text, boost, msm0) = textBoostMsm(v)
        // SCORED-match search analyzer: `english` analyzes the QUERY side
        // (stop + S-stem, one clause per surviving token; msm counts
        // ANALYZED distinct terms like the filter branch) against the
        // field's stored stream — with an index-time english mapping this
        // is exactly ES 6.5's default english field (both sides stemmed).
        // Other analyzers reject loudly instead of being silently
        // dropped, the same contract the bulk envelope enforces.
        val analyzer = if (v.isObject) Option(v.get("analyzer")).map(_.asText()) else None
        val (terms, msm) = analyzer match {
          // no body analyzer: ES defaults search_analyzer to the field's
          // INDEX analyzer — a shingled field expands the query into
          // "_"-joined shingle terms (+unigrams per config), an english
          // field stops+stems it; msm counts the analyzed clauses
          case None => defaultSearchTerms(f, text) match {
            case Some(ts) =>
              require(ts.nonEmpty,
                s"index-default search analyzer removed every query term: $text")
              (ts, analyzedMsm(v, ts.length))
            case None => (text.split("\\s+").toSeq, msm0)
          }
          case Some("english") =>
            val ts = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
              .filterNot(graft.functions.TextKernels.englishStopwords.contains)
              .map(graft.functions.TextKernels.stemEnglish)
            require(ts.nonEmpty,
              s"english analyzer removed every query term of a scored match: $text")
            val enOpAnd = Option(v.get("operator")).map(_.asText()).contains("and")
            val m =
              if (enOpAnd) ts.distinct.length
              else Option(v.get("minimum_should_match"))
                .map(msmOf(_, ts.distinct.length)).getOrElse(1)
            (ts, m)
          case Some(other) => throw new IllegalArgumentException(
            s"scored match supports the default or 'english' analyzer, got '$other' " +
              "(use filter context, or an index-time analyzer for scored expansion)")
        }
        // scored match runs over the STORED field view: with an index-time
        // analyzer on the field, tf/df/avgdl all reflect the expanded
        // stream (index-time synonym scoring, provably different from
        // search-time expansion)
        val stored = storedField(f)
        val scored =
          if (boost == 1.0) EsDsl.matchBm25(df, stored, terms)
          else {
            val (joined, scores, internals) = EsDsl.bm25Scores(df, Seq(stored -> terms))
            joined.withColumn("_score", round(lit(boost) * scores.head, 6))
              .filter(col("_score") > 0).drop(internals: _*)
          }
        if (msm > 1) scored.filter(EsDsl.matchQuery(stored, terms, msm)) else scored
      case "more_like_this" =>
        // BM25 over the selected terms (the [[EsDsl.moreLikeThisBm25]]
        // scoring, sorted-term fold for a deterministic double), msm as a
        // shared-term-count gate, like docs excluded
        val spec = mltSpec(body)
        val boost = Option(body.get("boost")).map(_.asDouble()).getOrElse(1.0)
        if (spec.terms.isEmpty) df.withColumn("_score", lit(0.0)).filter(lit(false))
        else {
          val sortedTerms = spec.terms.sorted
          val (joined, scores, internals) =
            EsDsl.bm25Scores(df, Seq(field(spec.f) -> sortedTerms))
          val scored = joined
            .withColumn("_score", round(boosted(boost, scores.head), 6))
            .filter(col("_score") > 0).drop(internals: _*)
          val gated =
            if (spec.msm > 1)
              scored.filter(EsDsl.matchQuery(field(spec.f), sortedTerms, spec.msm))
            else scored
          if (spec.likeIds.nonEmpty)
            gated.filter(!col(spec.idColName).isin(spec.likeIds: _*))
          else gated
        }
      case "match_phrase" =>
        val (f, v) = single(body)
        val (text, boost, _) = textBoostMsm(v)
        // scored phrase freq counts EXACT-phrase occurrences; a slop there
        // would change tf — reject loudly rather than silently ignore
        if (v.isObject) Option(v.get("slop")).foreach(s => require(s.asInt() == 0,
          "slop on a SCORED match_phrase is unsupported (predicate context supports it)"))
        // index-analyzed fields: phrase tf/df/dl all come from the stored
        // stream with the query analyzed by the same chain (phraseField)
        val (docSide, ph) = phraseField(f, text.split("\\s+").toSeq)
        val (joined, scores, internals) =
          EsDsl.bm25ScoresMixed(df, Seq(EsDsl.PhraseBm25(docSide, ph)))
        joined.withColumn("_score", round(boosted(boost, scores.head), 6))
          .filter(col("_score") > 0).drop(internals: _*)
      case "multi_match" =>
        // per-field `^boost`: the field's BM25 raw scales BEFORE the type
        // combine (best_fields max / most_fields sum), ES semantics
        val fbs = body.get("fields").elements().asScala
          .map(f => splitFieldBoost(f.asText())).toSeq
        val fs = fbs.map(_._1)
        val fBoosts = fbs.map(_._2)
        def fieldBoosted(scores: Seq[Column]): Seq[Column] =
          scores.zip(fBoosts).map { case (s0, b0) => if (b0 == 1.0) s0 else s0 * lit(b0) }
        val qtext = body.get("query").asText()
        val ts = qtext.split("\\s+").toSeq
        val boost = Option(body.get("boost")).map(_.asDouble()).getOrElse(1.0)
        val anyIndexed = fs.exists(indexAnalyzers.value.contains)
        if (Option(body.get("type")).map(_.asText()).contains("phrase")) {
          // type:phrase scored: per-field phrase-frequency BM25, dis-max'd
          // (best field wins, ES's per-field phrase run) — one corpus pass
          // for all fields via the shared slot machinery; index-analyzed
          // fields run their phrase over the stored stream (phraseField)
          val (joined, scores, internals) =
            EsDsl.bm25ScoresMixed(df, fs.map { f =>
              val (docSide, ph) = phraseField(f, ts)
              EsDsl.PhraseBm25(docSide, ph)
            })
          val fscores = fieldBoosted(scores)
          val best = if (fscores.size == 1) fscores.head else greatest(fscores: _*)
          return joined.withColumn("_score", round(boosted(boost, best), 6))
            .filter(col("_score") > 0).drop(internals: _*)
        }
        val crossFields = Option(body.get("type")).map(_.asText()).contains("cross_fields")
        require(!crossFields || fBoosts.forall(_ == 1.0),
          "per-field ^boosts are not supported with cross_fields (term-centric blended df)")
        require(!crossFields || !anyIndexed,
          "cross_fields over index-analyzed fields is unsupported (ES groups by analyzer)")
        // operator:and wins over an explicit minimum_should_match (ES: and
        // makes every term a must, msm is ignored) — for EVERY type:
        // best/most_fields require all terms in SOME field (field-centric),
        // cross_fields every term somewhere (pre-round-16 only cross_fields
        // honored it; score-differential find)
        val opAnd = Option(body.get("operator")).map(_.asText()).contains("and")
        val msm =
          if (opAnd) ts.size
          else Option(body.get("minimum_should_match")).map(_.asInt()).getOrElse(1)
        // per-field search-analyzer defaulting (ES: each field's clause
        // runs under its own analyzer): index-analyzed fields get
        // query-side expansion + the stored stream for tf/df/dl
        val fieldTerms = fs.map(f => f -> defaultSearchTerms(f, qtext).getOrElse(ts))
        fieldTerms.foreach { case (f, tsF) => require(tsF.nonEmpty,
          s"index-default search analyzer removed every query term of '$f': $qtext") }
        def docSide(f: String) =
          if (indexAnalyzers.value.contains(f)) storedField(f) else field(f)
        val (joined, scores, internals) =
          EsDsl.bm25ScoresMixed(df, fieldTerms.map { case (f, tsF) =>
            EsDsl.TermsBm25(docSide(f), tsF) })
        val combined =
          if (crossFields)
            EsDsl.crossFieldsScore(fs.indices, ts.size,
              tieBreaker = Option(body.get("tie_breaker")).map(_.asDouble()).getOrElse(0.0))
          else mmCombine(body, fieldBoosted(scores))
        val scored = joined.withColumn("_score", round(boosted(boost, combined), 6))
          .filter(col("_score") > 0).drop(internals: _*)
        if (msm > 1) scored.filter(
          if (crossFields) EsDsl.multiMatchCrossFields(fs.map(field), ts, msm)
          else fieldTerms.map { case (f, tsF) =>
            EsDsl.matchQuery(docSide(f), tsF,
              if (indexAnalyzers.value.contains(f))
                math.min(msm, tsF.length) else msm)
          }.reduce(_ || _))
        else scored
      case "constant_score" =>
        val boost = Option(body.get("boost")).map(_.asDouble()).getOrElse(1.0)
        df.filter(predicate(body.get("filter")))
          .withColumn("_score", round(lit(boost).cast("double"), 6))
      case "bool" => scoredBool(df, body)
      case "function_score" => functionScore(df, body)
      case "dis_max" =>
        // score = best clause + tie_breaker × (sum of the others); a doc
        // matches if ANY clause matches (ES dis_max semantics)
        val qs = body.get("queries").elements().asScala.toSeq
        val tb = Option(body.get("tie_breaker")).map(_.asDouble()).getOrElse(0.0)
        val slots = scala.collection.mutable.ArrayBuffer.empty[EsDsl.Bm25Clause]
        val mk = clauseSlots(qs, slots)
        val (joined, raws, internals) =
          if (slots.isEmpty) (df, Seq.empty[Column], Seq.empty[String])
          else EsDsl.bm25ScoresMixed(df, slots.toSeq)
        val clauses = mk.map(_(raws))
        // every dis_max clause must score; an unscorable kind contributes
        // its match as a constant 1.0 (documented simplification)
        val scores = clauses.map { case (p, c) =>
          c.getOrElse(when(p, lit(1.0)).otherwise(lit(0.0)))
        }
        val best = if (scores.size == 1) scores.head else greatest(scores: _*)
        val total = scores.reduce(_ + _)
        val score = if (tb == 0.0) best else best + lit(tb) * (total - best)
        joined.filter(clauses.map(_._1).reduce(_ || _))
          .withColumn("_score", round(score, 6))
          .drop(internals: _*)
      case "boosting" =>
        // positive scores normally; matching the negative query multiplies
        // the score by negative_boost (ES demotion, not exclusion)
        val nb = Option(body.get("negative_boost")).map(_.asDouble()).getOrElse(0.5)
        val slots = scala.collection.mutable.ArrayBuffer.empty[EsDsl.Bm25Clause]
        val mk = clauseSlots(Seq(body.get("positive")), slots)
        val (joined, raws, internals) =
          if (slots.isEmpty) (df, Seq.empty[Column], Seq.empty[String])
          else EsDsl.bm25ScoresMixed(df, slots.toSeq)
        val (posPred, posScore) = mk.head(raws)
        val neg = coalesce(predicate(body.get("negative")), lit(false))
        val score = posScore.getOrElse(when(posPred, lit(1.0)).otherwise(lit(0.0))) *
          when(neg, lit(nb)).otherwise(lit(1.0))
        joined.filter(posPred)
          .withColumn("_score", round(score, 6))
          .drop(internals: _*)
      case _ =>
        // ES 6.5 scores EVERY query in query context: filter-like kinds
        // (term/terms/range/exists/ids/prefix/wildcard/regexp/...) rewrite
        // to a constant score per matching doc (keyword fields index no
        // norms, so Lucene's per-term constant ordering is flat across
        // matches) — emitted as the constant_score convention, 1.0.
        // Ordering under a _score sort then falls to the tiebreak, exactly
        // ES behavior for these kinds. The predicate compile still rejects
        // unknown kinds loudly. (Pre-round-14 this threw "unsupported
        // _score sort" — found as a false reject by the widened fuzz.)
        // A clause `boost` multiplies the constant (ES returns boost as
        // the score for a boosted filter-like clause; ADVICE round 14).
        df.filter(predicate(q)).withColumn("_score",
          round(lit(filterClauseBoost(q)), 6))
    }
  }

  /** The `boost` of a FILTER-LIKE clause (the constant-score fallback of
    * [[scoredSearch]]): `boost` at the body level (`terms`/`exists`/
    * `ids`/`match_all`) or inside the single field's option object
    * (`term`/`range`/`prefix`/`wildcard`/`regexp`/`fuzzy`); 1.0 when
    * absent. The allowlists already admit the key on these kinds. */
  private def filterClauseBoost(q: JsonNode): Double = {
    val (_, body) = single(q)
    if (!body.isObject) return 1.0
    Option(body.get("boost")).filter(_.isNumber).map(_.asDouble())
      .orElse {
        body.fieldNames().asScala.toSeq.filterNot(_ == "boost") match {
          case Seq(f) => Option(body.get(f)).filter(_.isObject)
            .flatMap(v => Option(v.get("boost")).filter(_.isNumber))
            .map(_.asDouble())
          case _ => None
        }
      }.getOrElse(1.0)
  }

  /** Query kinds [[scoredSearch]] can attach a `_score` to. */
  private val scoringKinds = Set("match", "match_phrase", "multi_match",
    "constant_score", "bool", "dis_max", "boosting", "function_score",
    "more_like_this")

  /** `function_score`: reshape the inner query's score with document-value
    * functions — ES's "boost by recency/popularity" workhorse. Supported
    * subset: `field_value_factor` (modifiers none/log1p/sqrt/square,
    * `missing` default), `gauss`/`exp`/`linear` decay on a numeric field
    * (origin/scale/offset/decay), `script_score`, seeded `random_score`,
    * and bare `weight` functions; each with an optional `filter` (a
    * non-matching function is skipped, ES behavior); `score_mode`
    * multiply (default) | sum | avg | max | min | first combines the
    * functions, `boost_mode` multiply (default) | sum | replace combines
    * with the query score.
    *
    * All function math is plain codegen'd double arithmetic with the
    * association mirrored textually by the oracle (NOTES.md cross-engine
    * rule); the final score rounds to 6 dp. A non-scoring inner query
    * filters with base score 1.0 (`constant_score` analog); no inner query
    * means match_all at 1.0. */
  private def functionScore(df: DataFrame, body: JsonNode): DataFrame = {
    val base = Option(body.get("query")) match {
      case Some(qn) =>
        val (k, _) = single(qn)
        if (scoringKinds(k)) scoredSearch(df, qn)
        else df.filter(predicate(qn)).withColumn("_score", lit(1.0))
      case None => df.withColumn("_score", lit(1.0))
    }
    val scoreMode = Option(body.get("score_mode")).map(_.asText()).getOrElse("multiply")
    val boostMode = Option(body.get("boost_mode")).map(_.asText()).getOrElse("multiply")
    require(Set("multiply", "sum", "avg", "max", "min", "first")(scoreMode),
      s"unsupported score_mode: $scoreMode")
    val neutral = if (scoreMode == "multiply") 1.0 else 0.0
    val fns = Option(body.get("functions")).toSeq.flatMap(_.elements().asScala.toSeq)
    val fVals = fns.map { fn =>
      val weight = Option(fn.get("weight")).map(_.asDouble())
      val value: Option[Column] =
        if (fn.has("field_value_factor")) {
          val s = fn.get("field_value_factor")
          val raw = field(s.get("field").asText())
          val x = Option(s.get("missing")).map(m => coalesce(raw, lit(m.asDouble()))).getOrElse(raw)
          val factor = Option(s.get("factor")).map(_.asDouble()).getOrElse(1.0)
          val fv = if (factor == 1.0) x.cast("double") else lit(factor) * x
          Some(Option(s.get("modifier")).map(_.asText()).getOrElse("none") match {
            case "none" => fv
            case "log1p" => log(lit(1.0) + fv) // written as ln(1 + fv), the oracle's exact shape
            case "sqrt" => sqrt(fv)
            case "square" => pow(fv, lit(2.0))
            case m => throw new IllegalArgumentException(s"unsupported field_value_factor modifier: $m")
          })
        } else if (Seq("gauss", "exp", "linear").exists(fn.has)) {
          val shape = Seq("gauss", "exp", "linear").find(fn.has).get
          val (f, s) = single(fn.get(shape))
          val origin = s.get("origin").asDouble()
          val scale = s.get("scale").asDouble()
          val offset = Option(s.get("offset")).map(_.asDouble()).getOrElse(0.0)
          val decay = Option(s.get("decay")).map(_.asDouble()).getOrElse(0.5)
          val dist0 = abs(field(f) - lit(origin))
          val dist = if (offset == 0.0) dist0 else greatest(dist0 - lit(offset), lit(0.0))
          // ES: a doc MISSING the decay field gets 1.0 from the function
          // (decay docs, "function will return 1.0"); the raw arithmetic
          // instead null-poisoned gauss/exp — and LINEAR's zero-clamp
          // greatest() SWALLOWED the null into 0.0, silently zeroing the
          // function (both round-16 score-differential finds). An explicit
          // isNull branch restores the ES constant for all three shapes.
          Some(when(field(f).isNull, lit(1.0)).otherwise(shape match {
            // gauss(x) = decay ^ ((dist/scale)²) — the closed form of
            // exp(−dist²/2σ²) with σ² = −scale²/(2 ln decay)
            case "gauss" => pow(lit(decay), pow(dist / lit(scale), lit(2.0)))
            // exp(x) = decay ^ (dist/scale) — exp(−λ·dist), λ = −ln(decay)/scale
            case "exp" => pow(lit(decay), dist / lit(scale))
            // linear(x) = max(1 − dist·(1−decay)/scale, 0) — the only shape
            // that reaches exactly zero (past scale/(1−decay) from origin)
            case _ => greatest(lit(1.0) - lit(1.0 - decay) * dist / lit(scale), lit(0.0))
          }))
        } else if (fn.has("script_score")) {
          // painless-arithmetic subset: `doc['f'].value` refs become
          // column refs, the rest must be plain arithmetic — compiled
          // through the SQL parser (codegen, no interpreter), the
          // bucket_script approach at the document level
          val sNode = fn.get("script_score").get("script")
          Some(expr(Painless.compile(scriptSource(sNode), params = scriptParams(sNode))))
        } else if (fn.has("random_score")) {
          // deterministic uniform [0,1): md5 of seed:field — ES's seeded
          // random_score is likewise a hash of (seed, field value), not an
          // RNG, so results are reproducible across runs and engines
          val s = fn.get("random_score")
          val seed = Option(s.get("seed")).map(_.asText()).getOrElse("0")
          val f = Option(s.get("field")).map(_.asText()).getOrElse(
            throw new IllegalArgumentException(
              "random_score needs a field (the deterministic hash basis)"))
          Some(pmod(graft.functions.Hashing.md5Long60(
              concat_ws(":", lit(seed), field(f).cast("string"))), lit(1000000L))
            .cast("double") / lit(1000000.0))
        } else None
      val v = (value, weight) match {
        case (Some(c), Some(w)) => lit(w) * c
        case (Some(c), None) => c
        case (None, Some(w)) => lit(w).cast("double")
        case (None, None) => throw new IllegalArgumentException(
          "function_score function needs field_value_factor, gauss, or weight")
      }
      (Option(fn.get("filter")).map(predicate), v, weight.getOrElse(1.0))
    }
    // multiply/sum fold every function in with the mode's neutral element
    // for a missed filter; max/min/first/avg see only MATCHING functions
    // (ES skips non-matching ones entirely), expressed as null-masked
    // values — greatest/least/coalesce all skip nulls. A row matching NO
    // function keeps the query score unmodified (factor 1.0).
    def masked = fVals.map { case (p, v, _) =>
      p.map(c => when(c, v).otherwise(lit(neutral))).getOrElse(v) }
    def nullMasked = fVals.map { case (p, v, _) => p.map(c => when(c, v)).getOrElse(v) }
    val fScore =
      if (fVals.isEmpty) lit(1.0)
      else scoreMode match {
        case "multiply" => masked.reduce(_ * _)
        case "sum" => masked.reduce(_ + _)
        case "max" => coalesce(
          (if (fVals.size == 1) nullMasked else Seq(greatest(nullMasked: _*))) :+
            lit(1.0).cast("double"): _*)
        case "min" => coalesce(
          (if (fVals.size == 1) nullMasked else Seq(least(nullMasked: _*))) :+
            lit(1.0).cast("double"): _*)
        case "first" => coalesce(nullMasked :+ lit(1.0).cast("double"): _*)
        case "avg" =>
          // ES avg is the WEIGHTED mean: Σ weighted-scores of matching
          // functions / Σ their weights (a bare-weight function thus
          // contributes exactly its weight to both sides)
          val wsum = fVals.map { case (p, _, w) =>
            p.map(c => when(c, lit(w)).otherwise(lit(0.0))).getOrElse(lit(w)) }.reduce(_ + _)
          when(wsum > 0, masked.reduce(_ + _) / wsum).otherwise(lit(1.0))
      }
    val combined = boostMode match {
      case "multiply" => col("_score") * fScore
      case "sum" => col("_score") + fScore
      case "replace" => fScore
      case m => throw new IllegalArgumentException(s"unsupported boost_mode: $m")
    }
    base.withColumn("_score", round(combined, 6))
  }

  /** Query text + optional boost / minimum_should_match of a clause body
    * (string shorthand or object form). */
  /** ES `minimum_should_match` value forms (ES 6.5 common-options page):
    * positive integer; negative integer (total minus that many may be
    * missing); `"N%"` (floor of the total, ES rounds down); `"-N%"`
    * (that percent may be missing). Combinations (`"3<90%"`) are not
    * supported — rejected loudly. */
  private def msmOf(node: JsonNode, total: Int): Int = {
    def fromInt(v: Int) = if (v >= 0) v else math.max(total + v, 0)
    if (node.isNumber) fromInt(node.asInt())
    else {
      val s = node.asText().trim
      require(!s.contains("<"), s"unsupported minimum_should_match form: $s")
      if (s.endsWith("%")) {
        val p = s.stripSuffix("%").trim.toInt
        if (p >= 0) total * p / 100 else math.max(total - (total * (-p) / 100), 0)
      } else fromInt(s.toInt)
    }
  }

  private def textBoostMsm(v: JsonNode): (String, Double, Int) =
    if (v.isObject) {
      val text = v.get("query").asText()
      val nTerms = text.split("\\s+").length
      // `operator: and` turns every term clause into a MUST (Lucene
      // MatchQuery); minimum_should_match applies to SHOULD clauses only,
      // so with both present `and` WINS and msm is moot — pre-round-16 the
      // explicit msm silently overrode the operator (score-differential
      // find: `operator: and, minimum_should_match: 1` matched any-term)
      val msm = Option(v.get("operator")).map(_.asText()) match {
        case Some("and") => nTerms
        case Some("or") | None =>
          Option(v.get("minimum_should_match")).map(msmOf(_, nTerms)).getOrElse(1)
        case Some(other) =>
          throw new IllegalArgumentException(s"unsupported match operator: $other")
      }
      (text, Option(v.get("boost")).map(_.asDouble()).getOrElse(1.0), msm)
    } else (v.asText(), 1.0, 1)

  private def boosted(boost: Double, raw: Column): Column =
    if (boost == 1.0) raw else lit(boost) * raw

  /** multi_match type: best_fields (max, the ES default) or most_fields
    * (sum — the multi-analyzer recall type). */
  private def mmCombine(body: JsonNode, scores: Seq[Column]): Column =
    Option(body.get("type")).map(_.asText()).getOrElse("best_fields") match {
      case "best_fields" => if (scores.size == 1) scores.head else greatest(scores: _*)
      // greatest() skips nulls but + does not: a doc missing ONE nullable
      // field null-poisoned the most_fields sum and was dropped where ES
      // scores it on the fields it has (round-16 score-differential find;
      // the crossFieldsScore tie_breaker had the same fix in round 13)
      case "most_fields" => scores.map(coalesce(_, lit(0.0))).reduce(_ + _)
      case other => throw new IllegalArgumentException(
        s"unsupported multi_match type: $other")
    }

  /** Per scoring clause: allocate BM25 kernel/stats slots (first sweep),
    * then — given the raw score columns — build (predicate, score
    * contribution) (second sweep). Shared by scored `bool`, `dis_max`, and
    * `boosting`. A clause kind with no scoring form contributes None. */
  private def clauseSlots(nodes: Seq[JsonNode],
                          slots: scala.collection.mutable.ArrayBuffer[EsDsl.Bm25Clause])
      : Seq[Seq[Column] => (Column, Option[Column])] =
    nodes.map[Seq[Column] => (Column, Option[Column])] { n =>
      val (k, b) = single(n)
      // A clause's score counts ONLY when the clause matches (Lucene: a
      // non-matching SHOULD contributes nothing; a doc missing the field
      // scores null). Ungated raws let (a) a partially-matched
      // `operator: and` clause leak its partial BM25 into bool/dis_max
      // totals and (b) a null raw poison the whole doc's score — both
      // round-16 score-differential finds. when(pred, …).otherwise(0)
      // also normalizes a null pred (missing field) to 0.
      def gated(pred: Column, raw: Column): Column =
        when(pred, raw).otherwise(lit(0.0))
      k match {
        case "match" =>
          val (f, v) = single(b)
          // clause-internal operator/minimum_should_match gates the CLAUSE
          // (pre-round-16 the pred ignored msm: a must `operator: and`
          // match inside bool admitted any-term docs — differential find)
          val (text, boost, msm) = textBoostMsm(v)
          val ts = text.split("\\s+").toSeq
          val idx = slots.size; slots += EsDsl.TermsBm25(field(f), ts)
          raws => {
            val pred = EsDsl.matchQuery(field(f), ts, msm)
            (pred, Some(gated(pred, boosted(boost, raws(idx)))))
          }
        case "match_phrase" =>
          val (f, v) = single(b)
          val (text, boost, _) = textBoostMsm(v)
          val ph = text.split("\\s+").toSeq
          val idx = slots.size; slots += EsDsl.PhraseBm25(field(f), ph)
          raws => {
            val pred = EsDsl.matchPhrase(field(f), ph)
            (pred, Some(gated(pred, boosted(boost, raws(idx)))))
          }
        case "multi_match" =>
          // best_fields (default): max over per-field BM25; most_fields:
          // sum (ES's multi-analyzer recall type); cross_fields: term-
          // centric blended-df dis-max (the score expression reads the
          // slot-internal columns, still in scope inside scoredBool)
          val fbs = b.get("fields").elements().asScala
            .map(f => splitFieldBoost(f.asText())).toSeq
          val fs = fbs.map(_._1)
          val fBoosts = fbs.map(_._2)
          val ts = b.get("query").asText().split("\\s+").toSeq
          val boost = Option(b.get("boost")).map(_.asDouble()).getOrElse(1.0)
          val crossFields = Option(b.get("type")).map(_.asText()).contains("cross_fields")
          require(!crossFields || fBoosts.forall(_ == 1.0),
            "per-field ^boosts are not supported with cross_fields (term-centric blended df)")
          // operator:and → all-terms rule for EVERY multi_match type: the
          // field-centric types (best/most_fields) require all terms in
          // SOME field, cross_fields requires every term somewhere
          // (pre-round-16 only cross_fields honored it here and at top
          // level — a best_fields `operator: and` clause admitted
          // any-term docs; score-differential find)
          val opAnd = Option(b.get("operator")).map(_.asText()).contains("and")
          val msm =
            if (opAnd) ts.size
            else Option(b.get("minimum_should_match")).map(_.asInt()).getOrElse(1)
          val idxs = fs.map { f => val i = slots.size; slots += EsDsl.TermsBm25(field(f), ts); i }
          raws => {
            if (crossFields) {
              val sc = EsDsl.crossFieldsScore(idxs, ts.size,
                tieBreaker = Option(b.get("tie_breaker")).map(_.asDouble()).getOrElse(0.0))
              val pred = EsDsl.multiMatchCrossFields(fs.map(field), ts, msm)
              (pred, Some(gated(pred, boosted(boost, sc))))
            } else {
              val perField = idxs.map(raws).zip(fBoosts)
                .map { case (s0, b0) => if (b0 == 1.0) s0 else s0 * lit(b0) }
              val combined = mmCombine(b, perField)
              val pred = EsDsl.multiMatch(fs.map(field), ts, msm)
              (pred, Some(gated(pred, boosted(boost, combined))))
            }
          }
        case "constant_score" =>
          val boost = Option(b.get("boost")).map(_.asDouble()).getOrElse(1.0)
          val p = predicate(b.get("filter"))
          _ => (p, Some(when(p, lit(boost)).otherwise(lit(0.0))))
        case "term" =>
          val (_, v) = single(b)
          val boost =
            if (v.isObject) Option(v.get("boost")).map(_.asDouble()).getOrElse(1.0) else 1.0
          val p = predicate(n)
          _ => (p, if (boost == 1.0) None else Some(when(p, lit(boost)).otherwise(lit(0.0))))
        case _ =>
          val p = predicate(n)
          _ => (p, None)
      }
    }

  /** `rescore`: re-rank the top `window_size` primary-ranked docs by
    * `primary + rescore_query_weight × secondary`; docs outside the window
    * keep their primary score. Both queries score in ONE shared corpus
    * pass; the window rank and all arithmetic use 6-dp-rounded scores with
    * a doc-order tiebreak, so the result is engine-deterministic. (ES runs
    * rescore on the coordinating node over window_size docs — the window
    * is small by construction; here it is a rank filter over the matched
    * set.) Stats are corpus-level for both queries, like ES. The window
    * rank breaks primary-score ties by the body's non-`_score` sort fields
    * (ascending) — a total order both engines reproduce. */
  private def rescoredSearch(df: DataFrame, q: JsonNode, r: JsonNode,
                             tiebreaks: Seq[Column]): DataFrame = {
    require(tiebreaks.nonEmpty,
      "rescore needs a non-_score sort field as the rank tiebreak")
    val rq = r.get("query").get("rescore_query")
    val w = Option(r.get("query").get("rescore_query_weight")).map(_.asDouble()).getOrElse(1.0)
    val window = Option(r.get("window_size")).map(_.asInt()).getOrElse(10)
    val slots = scala.collection.mutable.ArrayBuffer.empty[EsDsl.Bm25Clause]
    val mkP = clauseSlots(Seq(q), slots)
    val mkR = clauseSlots(Seq(rq), slots)
    val (joined, raws, internals) = EsDsl.bm25ScoresMixed(df, slots.toSeq)
    val (pPred, pOpt) = mkP.head(raws)
    val (_, rOpt) = mkR.head(raws)
    val primary = round(pOpt.getOrElse(when(pPred, lit(1.0)).otherwise(lit(0.0))), 6)
    val secondary = round(rOpt.getOrElse(lit(0.0)), 6)
    val matched = joined.filter(pPred)
      .withColumn("_primary", primary)
      .withColumn("_secondary", secondary)
    // The in-window set is the top `window` rows of a TOTAL order
    // (_primary desc, tiebreaks asc), so a distributed sort-limit
    // (TakeOrdered: per-partition top-k, driver merge of k·p rows) finds it
    // without the global single-partition Window a row_number() would need;
    // the tiny result then broadcast-joins back as the in-window flag.
    // distinct: if the tiebreaks are not a unique key, duplicate key tuples
    // in the window would multiply rows through the join (the rank filter
    // this replaced never changed the row count); null-safe equality (<=>):
    // an in-window row with a NULL sort field must still match itself.
    // (A driver-collected OR-predicate variant measured within noise of
    // this join under repeated runs — the join keeps everything one action
    // so the corpus-pass exchange can be reused.)
    val winKeys = matched
      .orderBy(col("_primary").desc +: tiebreaks.map(_.asc): _*)
      .limit(window)
      .select(col("_primary").as("_w_primary") +:
        tiebreaks.zipWithIndex.map { case (c, i) => c.as(s"_w_tb$i") }: _*)
      .distinct()
    val joinCond = ((col("_primary") <=> col("_w_primary")) +:
      tiebreaks.zipWithIndex.map { case (c, i) => c <=> col(s"_w_tb$i") })
      .reduce(_ && _)
    val wCols = "_w_primary" +: tiebreaks.indices.map(i => s"_w_tb$i")
    matched.join(broadcast(winKeys), joinCond, "left_outer")
      .withColumn("_score",
        when(col("_w_primary").isNotNull,
          round(col("_primary") + lit(w) * col("_secondary"), 6))
          .otherwise(col("_primary")))
      .drop((internals ++ Seq("_primary", "_secondary") ++ wCols): _*)
  }

  private def scoredBool(df: DataFrame, body: JsonNode): DataFrame = {
    def list(nm: String): Seq[JsonNode] = Option(body.get(nm)).toSeq.flatMap { n =>
      if (n.isArray) n.elements().asScala.toSeq else Seq(n)
    }
    val (must, should, filt, mustNot) =
      (list("must"), list("should"), list("filter"), list("must_not"))
    // one shared corpus pass for every BM25-scoring clause (must ++ should
    // in clause order)
    val scoring = must ++ should
    val slots = scala.collection.mutable.ArrayBuffer.empty[EsDsl.Bm25Clause]
    val mk = clauseSlots(scoring, slots)
    val (joined, rawScores, internals) =
      if (slots.isEmpty) (df, Seq.empty[Column], Seq.empty[String])
      else EsDsl.bm25ScoresMixed(df, slots.toSeq)
    val scoredClauses: Seq[(Column, Option[Column])] = mk.map(_(rawScores))
    val (mustCl, shouldCl) = scoredClauses.splitAt(must.size)
    val msm = Option(body.get("minimum_should_match")).map(_.asInt())
      .getOrElse(if (must.isEmpty && filt.isEmpty) 1 else 0)
    val pred = EsDsl.bool(
      must = mustCl.map(_._1) ++ filt.map(predicate),
      should = if (msm > 0) shouldCl.map(_._1) else Seq.empty,
      mustNot = mustNot.map(predicate),
      minimumShouldMatch = msm)
    val total = scoredClauses.flatMap(_._2).reduceOption(_ + _).getOrElse(lit(0.0))
    joined.filter(pred).withColumn("_score", round(total, 6)).drop(internals: _*)
  }

  /** ES `aggs`: bucket aggs (terms/histogram/date_histogram/filters/
    * composite) with metric sub-aggs (avg/sum/min/max/value_count/
    * cardinality/percentiles), `top_hits`, and NESTED bucket aggs —
    * `terms` inside `date_histogram` etc. A nested chain flattens to one
    * DataFrame grouped by every level's key (columns named by each level's
    * agg name); per-level `terms` size prunes top buckets by summed
    * doc_count within the enclosing bucket, exactly ES's
    * count-desc-then-key order. Like ES, a `query` in the same body scopes
    * the aggregations. */
  def aggregations(df: DataFrame, bodyJson: String): Map[String, DataFrame] =
    withSchemaOf(df)(aggregationsImpl(df, bodyJson))

  private def aggregationsImpl(df: DataFrame, bodyJson: String): Map[String, DataFrame] = {
    val body = parse(bodyJson)
    val aggs = Option(body.get("aggs"))
      .orElse(Option(body.get("aggregations")))
      .getOrElse(throw new IllegalArgumentException("no aggs in body"))
    val entries = aggs.fields().asScala.toSeq.map(e => e.getKey -> e.getValue)
    // `sampler` ranks by relevance: score the scope when the query can
    val wantsScore = entries.exists(e =>
      e._2.has("sampler") || e._2.has("diversified_sampler"))
    val scoped = Option(body.get("query")).map { q =>
      if (wantsScore && scoringKinds(single(q)._1)) scoredSearch(df, q)
      else df.filter(predicate(q))
    }.getOrElse(df)
    val (siblingPipes, normal) = entries.partition { case (_, n) =>
      n.fieldNames().asScala.exists(siblingPipelineKinds)
    }
    val base = normal.map { case (k, v) => k -> oneAgg(scoped, df, k, v) }.toMap
    // sibling pipeline aggs: a scalar over another agg's bucket metrics
    // (`buckets_path: "sibling>metric"`), evaluated on the finished frame
    base ++ siblingPipes.map { case (k, v) =>
      val (kind, spec) = single(v)
      checkAggSpec(kind, spec)
      val parts = spec.get("buckets_path").asText().split(">")
      require(parts.length == 2, s"sibling buckets_path must be 'agg>metric', got ${parts.toSeq}")
      val src = base.getOrElse(parts(0),
        throw new IllegalArgumentException(s"unknown sibling agg: ${parts(0)}"))
      val m = if (parts(1) == "_count") col("doc_count") else col(parts(1))
      // double like ES's value fields (a _count path would otherwise stay long)
      k -> (kind match {
        case "stats_bucket" => src.agg(
          count(m).as("count"),
          round(min(m), 4).cast("double").as("min"),
          round(max(m), 4).cast("double").as("max"),
          round(avg(m), 6).cast("double").as("avg"),
          round(sum(m), 4).cast("double").as("sum"))
        case "extended_stats_bucket" => src.agg(
          count(m).as("count"),
          round(min(m), 4).cast("double").as("min"),
          round(max(m), 4).cast("double").as("max"),
          round(avg(m), 6).cast("double").as("avg"),
          round(sum(m), 4).cast("double").as("sum"),
          round(var_pop(m), 6).cast("double").as("variance"),
          round(stddev_pop(m), 6).cast("double").as("std_deviation"))
        case "avg_bucket" => src.agg(round(avg(m), 6).cast("double").as("value"))
        case "sum_bucket" => src.agg(round(sum(m), 4).cast("double").as("value"))
        case "max_bucket" => src.agg(round(max(m), 4).cast("double").as("value"))
        case "min_bucket" => src.agg(round(min(m), 4).cast("double").as("value"))
        case "percentiles_bucket" =>
          // exact percentiles over the sibling's bucket metric (the bucket
          // set is bounded — coordinator-side in ES, a tiny agg here)
          val pcts = Option(spec.get("percents"))
            .map(_.elements().asScala.map(_.asDouble()).toSeq)
            .getOrElse(Seq(25.0, 50.0, 75.0))
          val cols = pcts.map { p =>
            val nm = if (p.isWhole) s"p${p.toLong}" else s"p${p.toString.replace('.', '_')}"
            round(EsDsl.percentileExact(m, p / 100.0), 4).cast("double").as(nm)
          }
          src.agg(cols.head, cols.tail: _*)
      })
    }
  }

  /** Metric agg → named column(s); `cond` restricts the metric to rows
    * matching a filters-bucket predicate (nulls elsewhere are ignored by
    * every aggregate here). `percentiles` expands to one column per
    * percent (`<name>_p<pct>`), exact like the typed DSL's b12. */
  private def metricCols(aggName: String, kind: String, spec: JsonNode,
                         cond: Option[Column] = None): Seq[(String, Column)] = {
    // lazy: weighted_avg has no top-level "field" key. Metric aggs also
    // accept a `script` instead of `field` (ES 6.5): the painless
    // arithmetic subset binds doc refs and compiles through the SQL
    // parser — the metric aggregates a codegen'd expression, same cost
    // shape as a plain column.
    lazy val raw0 = Option(spec.get("script")) match {
      case Some(sNode) =>
        expr(Painless.compile(scriptSource(sNode), params = scriptParams(sNode)))
      case None => field(spec.get("field").asText())
    }
    // metric `missing`: docs without the field aggregate AS this value
    // (ES behavior); without it nulls are simply skipped by the aggregate
    lazy val raw = Option(spec.get("missing")).map(m => coalesce(raw0, litOf(m)))
      .getOrElse(raw0)
    lazy val f = cond.map(c => when(c, raw)).getOrElse(raw)
    kind match {
      case "avg" => Seq(aggName -> round(avg(f), 6))
      case "sum" => Seq(aggName -> round(sum(f), 4))
      case "min" => Seq(aggName -> round(min(f), 4))
      case "max" => Seq(aggName -> round(max(f), 4))
      case "value_count" => Seq(aggName -> count(f))
      case "cardinality" => Seq(aggName -> EsDsl.cardinality(f))
      case "stats" =>
        // the 5-value ES stats response (count/min/max/avg/sum) flattened
        // to columns — same rounding as the single-value forms above
        Seq(
          s"${aggName}_count" -> count(f),
          s"${aggName}_min" -> round(min(f), 4),
          s"${aggName}_max" -> round(max(f), 4),
          s"${aggName}_avg" -> round(avg(f), 6),
          s"${aggName}_sum" -> round(sum(f), 4))
      case "extended_stats" =>
        // stats + POPULATION variance/std-dev (6 dp both engines) — the
        // exact ES-6.5 response moments (DuckDB var_pop/stddev_pop are the
        // oracle twins; sample moments were the pre-round-8 interim).
        // `sigma` adds the std_deviation_bounds columns (default 2σ).
        val sigma = Option(spec.get("sigma")).map(_.asDouble())
        Seq(
          s"${aggName}_count" -> count(f),
          s"${aggName}_min" -> round(min(f), 4),
          s"${aggName}_max" -> round(max(f), 4),
          s"${aggName}_sum" -> round(sum(f), 4),
          s"${aggName}_avg" -> round(avg(f), 6),
          s"${aggName}_variance" -> round(var_pop(f), 6),
          s"${aggName}_std_deviation" -> round(stddev_pop(f), 6)) ++
          sigma.toSeq.flatMap { sg =>
            Seq(
              s"${aggName}_upper" -> round(avg(f) + lit(sg) * stddev_pop(f), 6),
              s"${aggName}_lower" -> round(avg(f) - lit(sg) * stddev_pop(f), 6))
          }
      case "percentiles" =>
        val pcts = Option(spec.get("percents"))
          .map(_.elements().asScala.map(_.asDouble()).toSeq)
          .getOrElse(Seq(1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0))
        pcts.map { p =>
          val nm = if (p.isWhole) s"${aggName}_p${p.toLong}"
                   else s"${aggName}_p${p.toString.replace('.', '_')}"
          nm -> round(EsDsl.percentileExact(f, p / 100.0), 4)
        }
      case "percentile_ranks" =>
        // inverse percentiles: % of values ≤ each given bound (exact —
        // ES's t-digest estimate of the same quantity), 4 dp
        val vals = spec.get("values").elements().asScala.map(_.asDouble()).toSeq
        vals.map { v =>
          val nm = s"${aggName}_r${if (v.isWhole) v.toLong.toString else v.toString.replace('.', '_')}"
          nm -> round(sum(when(f <= v, 1.0).otherwise(0.0)) * lit(100.0) / count(f), 4)
        }
      case "weighted_avg" =>
        // {"value": {"field": f}, "weight": {"field": w}} — Σ(v·w)/Σ(w)
        // over rows where BOTH sides are present (ES skips missing)
        val vf = field(spec.get("value").get("field").asText())
        val wf = field(spec.get("weight").get("field").asText())
        val bothV = cond.map(c => when(c && wf.isNotNull, vf)).getOrElse(when(wf.isNotNull, vf))
        val bothW = cond.map(c => when(c && vf.isNotNull, wf)).getOrElse(when(vf.isNotNull, wf))
        Seq(aggName -> round(sum(bothV * bothW) / sum(bothW), 6))
      case "geo_centroid" =>
        // centroid of a point field (pair `F_lat`/`F_lon`, the [[Geo]]
        // convention): per-component avg — ES's centroid over points.
        // One hash agg with map-side partials, like any avg.
        val fn = spec.get("field").asText()
        def comp(nm: String) = cond.map(c => when(c, field(nm))).getOrElse(field(nm))
        Seq(
          s"${aggName}_lat" -> round(avg(comp(s"${fn}_lat")), 6),
          s"${aggName}_lon" -> round(avg(comp(s"${fn}_lon")), 6))
      case "geo_bounds" =>
        // smallest box covering the bucket's points: top_left = (max lat,
        // min lon), bottom_right = (min lat, max lon) — ES response shape
        // flattened to 4 columns. (wrap_longitude dateline wrapping is not
        // supported; the derived-coordinate domain never crosses it.)
        val fn = spec.get("field").asText()
        def comp(nm: String) = cond.map(c => when(c, field(nm))).getOrElse(field(nm))
        val (la, lo) = (comp(s"${fn}_lat"), comp(s"${fn}_lon"))
        Seq(
          s"${aggName}_top_left_lat" -> round(max(la), 6),
          s"${aggName}_top_left_lon" -> round(min(lo), 6),
          s"${aggName}_bottom_right_lat" -> round(min(la), 6),
          s"${aggName}_bottom_right_lon" -> round(max(lo), 6))
      case "scripted_metric" =>
        // ES's escape-hatch agg, supported in its distributed-safe
        // canonical form: `map_script` accumulates per-row arithmetic into
        // state sums (`state.x += <expr>` statements; painless
        // doc['f'].value refs; one top-level ternary per expression),
        // `combine_script` is the identity shard merge, and
        // `reduce_script` is arithmetic over `states.<x>` — bound here to
        // the cross-partition SUM of each state, exactly what the
        // canonical for-loop-over-states reduce computes. The whole thing
        // compiles to sum() partials + scalar arithmetic inside ONE hash
        // aggregate: map-side combine for free, no per-doc interpreter,
        // same codegen as any built-in metric.
        require(cond.isEmpty, "scripted_metric inside a filters bucket is not supported")
        def painless(raw: String, extra: Set[String] = Set.empty): String = {
          require(!raw.contains("doc['info."),
            s"scripted_metric doc refs must be plain columns, got $raw")
          // scripted_metric params live at the aggregation level and are
          // shared by map/combine/reduce scripts (ES 6.5 shape)
          Painless.compile(raw, extraIds = extra, params = scriptParams(spec))
        }
        val stateRe = "state\\.([A-Za-z_][A-Za-z0-9_]*)\\s*\\+=\\s*(.+)".r
        val sums = spec.get("map_script").asText().split(";").map(_.trim).filter(_.nonEmpty)
          .map {
            case stateRe(name, rhs) => name -> s"sum(${painless(rhs)})"
            case other => throw new IllegalArgumentException(
              s"unsupported map_script statement (need `state.x += expr`): $other")
          }.toSeq
        // init is the sum identity (states start at 0); combine must be the
        // identity shard merge — anything else would not be sum-mergeable
        Option(spec.get("combine_script")).map(_.asText().trim).foreach(c =>
          require(c == "return state" || c == "state",
            s"combine_script must be the identity shard merge ('return state'), got: $c"))
        val reduceRaw = spec.get("reduce_script").asText().trim.stripPrefix("return").trim
        val reduceSql = sums.sortBy(-_._1.length).foldLeft(reduceRaw) {
          case (acc, (n, s)) => acc.replace(s"states.$n", s)
        }
        require(!reduceSql.contains("states."),
          s"reduce_script references a state the map_script never accumulated: $reduceRaw")
        // the substituted reduce text embeds the already-compiled
        // sum(<map expr>) partials — allow the aggregate name and the
        // map script's bound columns through the outer compile
        val mapCols = "doc\\['([A-Za-z0-9_.]+)'\\]".r
          .findAllMatchIn(spec.get("map_script").asText()).map(_.group(1)).toSet
        Seq(aggName ->
          round(expr(painless(reduceSql, extra = mapCols + "sum")), 6).cast("double"))
      case other => throw new IllegalArgumentException(s"unsupported metric: $other")
    }
  }

  /** Per-kind agg option allowlists (the keys this engine implements,
    * plus accuracy-/rendering-only knobs that cannot change row-level
    * results: shard_size, execution_hint, collect_mode,
    * show_term_doc_count_error, precision_threshold, keyed, format).
    * ES 6.5 rejects unknown agg params; silently ignoring a SEMANTIC one
    * (a typo'd `sizee`, an unimplemented `distance_type`) would return
    * plausible-but-wrong buckets — the silent-misparse class the
    * round-14 strictness sweep closes. Kinds whose spec is a query body
    * (`filter`) or fully dynamic are absent → unchecked here, validated
    * by their own parse. */
  private val aggSpecKeys: Map[String, Set[String]] = Map(
    "terms" -> Set("field", "script", "value_type", "size", "order",
      "missing", "include", "exclude", "min_doc_count", "shard_size",
      "execution_hint", "collect_mode", "show_term_doc_count_error"),
    "histogram" -> Set("field", "interval", "offset", "min_doc_count",
      "extended_bounds", "keyed", "format"),
    "date_histogram" -> Set("field", "interval", "calendar_interval",
      "time_zone", "offset", "min_doc_count", "extended_bounds", "keyed",
      "format"),
    "geotile_grid" -> Set("field", "precision"),
    "geohash_grid" -> Set("field", "precision"),
    "range" -> Set("field", "ranges", "keyed", "script"),
    "date_range" -> Set("field", "ranges", "keyed", "format"),
    "ip_range" -> Set("field", "ranges", "keyed"),
    "geo_distance" -> Set("field", "origin", "unit", "ranges", "keyed"),
    "missing" -> Set("field"),
    "global" -> Set(),
    "nested" -> Set("path"),
    "reverse_nested" -> Set("path"),
    "children" -> Set("type"),
    "sampler" -> Set("shard_size"),
    "diversified_sampler" -> Set("shard_size", "max_docs_per_value", "field"),
    "significant_terms" -> Set("field", "size", "min_doc_count",
      "background_filter", "shard_size", "jlh", "chi_square"),
    "significant_text" -> Set("field", "size", "min_doc_count",
      "background_filter", "shard_size", "filter_duplicate_text", "jlh",
      "chi_square"),
    "adjacency_matrix" -> Set("filters", "separator"),
    "composite" -> Set("size", "sources", "after"),
    "auto_date_histogram" -> Set("field", "buckets", "format"),
    "matrix_stats" -> Set("fields", "missing"),
    "filters" -> Set("filters", "other_bucket", "other_bucket_key"),
    // metrics
    "avg" -> Set("field", "script", "missing"),
    "sum" -> Set("field", "script", "missing"),
    "min" -> Set("field", "script", "missing"),
    "max" -> Set("field", "script", "missing"),
    "value_count" -> Set("field", "script", "missing"),
    "cardinality" -> Set("field", "script", "missing", "precision_threshold"),
    "stats" -> Set("field", "script", "missing"),
    "extended_stats" -> Set("field", "script", "missing", "sigma"),
    "percentiles" -> Set("field", "script", "missing", "percents", "keyed",
      "tdigest", "hdr"),
    "percentile_ranks" -> Set("field", "script", "missing", "values", "keyed"),
    "weighted_avg" -> Set("value", "weight", "format"),
    "geo_centroid" -> Set("field"),
    "geo_bounds" -> Set("field", "wrap_longitude"),
    "scripted_metric" -> Set("init_script", "map_script", "combine_script",
      "reduce_script", "params"),
    "top_hits" -> Set("size", "sort", "_source", "from"),
    // pipelines
    "cumulative_sum" -> Set("buckets_path", "format"),
    "derivative" -> Set("buckets_path", "format", "gap_policy", "unit"),
    "serial_diff" -> Set("buckets_path", "format", "gap_policy", "lag"),
    "moving_avg" -> Set("buckets_path", "format", "gap_policy", "window",
      "model", "settings", "predict", "minimize"),
    "moving_fn" -> Set("buckets_path", "window", "script", "shift",
      "gap_policy"),
    "bucket_script" -> Set("buckets_path", "script", "format", "gap_policy"),
    "bucket_selector" -> Set("buckets_path", "script", "gap_policy"),
    "bucket_sort" -> Set("sort", "from", "size", "gap_policy"),
    "avg_bucket" -> Set("buckets_path", "format", "gap_policy"),
    "sum_bucket" -> Set("buckets_path", "format", "gap_policy"),
    "min_bucket" -> Set("buckets_path", "format", "gap_policy"),
    "max_bucket" -> Set("buckets_path", "format", "gap_policy"),
    "stats_bucket" -> Set("buckets_path", "format", "gap_policy"),
    "extended_stats_bucket" -> Set("buckets_path", "format", "gap_policy",
      "sigma"),
    "percentiles_bucket" -> Set("buckets_path", "format", "gap_policy",
      "percents"))

  /** Reject unknown option keys for a known agg kind (see [[aggSpecKeys]]). */
  private def checkAggSpec(kind: String, spec: JsonNode): Unit =
    aggSpecKeys.get(kind).foreach { allowed =>
      if (spec != null && spec.isObject) {
        val unknown = spec.fieldNames().asScala.toSeq.filterNot(allowed)
        require(unknown.isEmpty,
          s"unknown $kind option(s): ${unknown.sorted.mkString(", ")}")
      }
    }

  private val bucketKinds =
    Set("terms", "histogram", "date_histogram", "geotile_grid", "geohash_grid")

  /** Parent pipeline aggs: computed over the finished bucket frame (a
    * window ordered by bucket key — ES evaluates these on the coordinator
    * over the returned buckets, so the single-partition window sees only
    * the bounded bucket set, never raw rows). */
  private val bucketPipelineKinds =
    Set("cumulative_sum", "derivative", "moving_avg", "moving_fn", "serial_diff", "bucket_sort",
      "bucket_script", "bucket_selector")
  /** Sibling pipeline aggs: a scalar over another agg's bucket metrics. */
  private val siblingPipelineKinds =
    Set("avg_bucket", "sum_bucket", "max_bucket", "min_bucket", "stats_bucket",
      "extended_stats_bucket",
      "percentiles_bucket")

  /** Split a node's sub-`aggs` into metric columns, nested bucket entries,
    * top_hits entries, and parent-pipeline entries. */
  private def subAggs(node: JsonNode, cond: Option[Column] = None)
      : (Seq[(String, Column)], Seq[(String, JsonNode)], Seq[(String, JsonNode)],
         Seq[(String, String, JsonNode)]) = {
    val entries = Option(node.get("aggs")).toSeq.flatMap(_.fields().asScala.toSeq)
      .map(e => e.getKey -> e.getValue)
    val (buckets, rest0) = entries.partition { case (_, n) =>
      n.fieldNames().asScala.exists(k => bucketKinds(k) || k == "filters" || k == "composite")
    }
    val (pipeEntries, rest) = rest0.partition { case (_, n) =>
      n.fieldNames().asScala.exists(bucketPipelineKinds)
    }
    val (topHits, metrics) = rest.partition { case (_, n) =>
      n.fieldNames().asScala.contains("top_hits")
    }
    val ms = metrics.flatMap { case (nm, n) =>
      val (kind, spec) = single(n)
      checkAggSpec(kind, spec)
      metricCols(nm, kind, spec, cond)
    }
    val pipes = pipeEntries.map { case (nm, n) =>
      val (kind, spec) = single(n)
      checkAggSpec(kind, spec)
      (nm, kind, spec)
    }
    (ms, buckets, topHits, pipes)
  }

  /** One bucket level of a (possibly nested) chain. */
  private case class Level(name: String, kind: String, spec: JsonNode, node: JsonNode) {
    checkAggSpec(kind, spec)
    def key: Column = keyExpr.as(name)
    /** Docs whose computed key is null form NO bucket — ES drops
      * unindexed docs from every bucket agg (`missing` substitution in
      * [[keyExpr]] already made the key non-null when requested).
      * Pre-round-15 the groupBy kept a null-key bucket ES never returns —
      * an answer-level deviation EsJsonDifferentialSpec caught. */
    def keyNotNull: Column = keyExpr.isNotNull
    private def keyExpr: Column = kind match {
      case "terms" =>
        // `missing`: docs with a null key bucket under the given value
        Option(spec.get("missing")).map(m => coalesce(termsRawKey, litOf(m)))
          .getOrElse(termsRawKey)
      case "histogram" =>
        // `offset` shifts the bucket boundaries (integral offsets — keys
        // stay longs like the unshifted form)
        val f = field(spec.get("field").asText())
        val interval = spec.get("interval").asDouble()
        require(interval > 0, s"histogram interval must be > 0, got $interval")
        Option(spec.get("offset")).map(_.asDouble()) match {
          case Some(off) =>
            (floor((f - off) / interval) * interval + off).cast("long")
          case None => EsDsl.histogramBucket(f, interval)
        }
      case "date_histogram" =>
        val interval = Option(spec.get("calendar_interval")).getOrElse(spec.get("interval")).asText()
        val f0 = field(spec.get("field").asText())
        // `time_zone`: buckets align to LOCAL interval boundaries and keys
        // come back as the UTC instant of the local bucket start — convert
        // to the zone, truncate there, convert back (the ES rounding
        // pipeline; offset applies AFTER the zone conversion, as in ES)
        val tz = Option(spec.get("time_zone")).map(_.asText())
        val f = tz.map(z => from_utc_timestamp(f0, z)).getOrElse(f0)
        def backToUtc(c: Column) = tz.map(z => to_utc_timestamp(c, z)).getOrElse(c)
        // `offset` ("+6h"/"-1d"/"+30m"): bucket = trunc(ts − off) + off
        Option(spec.get("offset")).map(_.asText()) match {
          case Some(off) =>
            val m = "([+-]?)(\\d+)([hdm])".r
            val (neg, n, unit) = off match {
              case m(sign, num, u) => (sign == "-", num,
                u match { case "h" => "HOUR"; case "d" => "DAY"; case "m" => "MINUTE" })
              case other => throw new IllegalArgumentException(
                s"unsupported date_histogram offset: $other")
            }
            val iv = expr(s"INTERVAL '$n' $unit")
            val shifted = if (neg) f + iv else f - iv
            val bucket = EsDsl.dateHistogramBucket(shifted, interval)
            backToUtc(if (neg) bucket - iv else bucket + iv)
          case None => backToUtc(EsDsl.dateHistogramBucket(f, interval))
        }
      case "geotile_grid" =>
        val f = spec.get("field").asText()
        Geo.geotileKey(field(s"${f}_lat"), field(s"${f}_lon"),
          Option(spec.get("precision")).map(_.asInt()).getOrElse(7))
      case "geohash_grid" =>
        val f = spec.get("field").asText()
        Geo.geohashKey(field(s"${f}_lat"), field(s"${f}_lon"),
          Option(spec.get("precision")).map(_.asInt()).getOrElse(5))
    }
    def termsSize: Option[Int] =
      if (kind == "terms") Some(Option(spec.get("size")).map(_.asInt()).getOrElse(10)) else None
    /** Terms value source: a plain field, or a `script` computed key —
      * the painless subset (doc['f'].value refs, arithmetic; with
      * value_type string the painless `+` concatenation becomes SQL ||),
      * codegen'd like script_fields but at the bucket-key level. */
    private def termsRawKey: Column = Option(spec.get("script")) match {
      case Some(sNode) =>
        expr(Painless.compile(scriptSource(sNode), stringConcat =
          Option(spec.get("value_type")).map(_.asText()).contains("string"),
          params = scriptParams(sNode)))
      case None => field(spec.get("field").asText())
    }
    /** ES terms `include`/`exclude`: bucket keys must (not) FULLY match
      * the regex — anchored here because ES matches whole terms. Matches
      * against the `missing`-substituted key (as ES does), so a null-key
      * row is bucketed first and only then include/exclude-tested — a raw
      * rlike would silently drop it via the null predicate. */
    def termsKeyFilter: Option[Column] =
      if (kind != "terms" || (!spec.has("include") && !spec.has("exclude"))) None
      else {
        val f = Option(spec.get("missing")).map(m => coalesce(termsRawKey, litOf(m)))
          .getOrElse(termsRawKey)
        def anchored(r: JsonNode) = "^(?:" + r.asText() + ")$"
        // ES accepts either a regex string or an exact-value array for
        // include/exclude — the array form is a plain isin
        def pred(r: JsonNode): Column =
          if (r.isArray) f.isin(r.elements().asScala.toSeq.map(n =>
            if (n.isNumber) n.asLong().asInstanceOf[Any] else n.asText().asInstanceOf[Any]): _*)
          else f.rlike(anchored(r))
        val preds =
          Option(spec.get("include")).map(pred).toSeq ++
          Option(spec.get("exclude")).map(r => !pred(r)).toSeq
        preds.reduceOption(_ && _)
      }
    /** ES terms `order`: `_count` (default), `_key`, or a metric sub-agg
      * name → (target, "asc"|"desc"). */
    def termsOrder: (String, String) =
      Option(spec.get("order")).map(single).map { case (t, d) => (t, d.asText()) }
        .getOrElse(("_count", "desc"))
  }

  private def oneAgg(df: DataFrame, bg: DataFrame, name: String, node: JsonNode): DataFrame = {
    val kind = node.fieldNames().asScala.toSeq.filterNot(_ == "aggs").head
    val spec = node.get(kind)
    checkAggSpec(kind, spec)
    kind match {
      case "composite" => compositeAgg(df, spec)
      case "filters" => filtersAgg(df, node)
      case "filter" =>
        // single-filter bucket: metric sub-aggs scoped to one predicate
        // (the 1-ary `filters` form)
        val (ms, buckets, topHits, pipes) = subAggs(node)
        require(buckets.isEmpty && topHits.isEmpty && pipes.isEmpty,
          "filter agg supports metric sub-aggs only")
        df.filter(predicate(spec))
          .agg(count(lit(1)).as("doc_count"), ms.map { case (n, c) => c.as(n) }: _*)
      case "global" =>
        // escape the body's query scope: metric sub-aggs over the WHOLE
        // index (`bg`), the ES way to show filtered vs total side by side
        val (ms, buckets, topHits, pipes) = subAggs(node)
        require(buckets.isEmpty && topHits.isEmpty && pipes.isEmpty,
          "global supports metric sub-aggs only")
        val cols = ms.map { case (n, c) => c.as(n) }
        bg.agg(count(lit(1)).as("doc_count"), cols: _*)
      case "range" => rangeAgg(df, node, "range")
      case "date_range" => rangeAgg(df, node, "date_range")
      case "geo_distance" => rangeAgg(df, node, "geo_distance")
      case "ip_range" => rangeAgg(df, node, "ip_range")
      case "adjacency_matrix" => adjacencyMatrixAgg(df, spec)
      case "nested" =>
        // ES nested agg: sub-aggs over the CHILD docs of an array-of-
        // struct field — one explode rebinds the path, then the normal agg
        // walk runs with `path.member` field names resolving into the
        // exploded struct. doc_count counts child docs, ES behavior.
        val path = spec.get("path").asText()
        val exploded = df.withColumn(path, explode(col(path)))
        val inner = Option(node.get("aggs")).map(_.fields().asScala.toSeq).getOrElse(Seq.empty)
        require(inner.size == 1, s"nested agg needs exactly one sub-agg, got ${inner.size}")
        val (bName, bNode) = (inner.head.getKey, inner.head.getValue)
        // `reverse_nested` inside the nested bucket agg: the bucket's
        // doc_count stays child docs; the reverse_nested column counts
        // DISTINCT parent docs (parent id = the frame's first column, the
        // doc-id convention) — "how many parents per child term"
        val rn = Option(bNode.get("aggs")).toSeq
          .flatMap(_.fields().asScala.toSeq)
          .filter(_.getValue.has("reverse_nested"))
        if (rn.nonEmpty && bNode.has("terms")) {
          require(rn.size == 1 && rn.head.getValue.get("reverse_nested").size() == 0,
            "reverse_nested supports a single bare {} entry only")
          val l = Level(bName, "terms", bNode.get("terms"), bNode)
          val parentId = col(df.columns.head)
          val ms = Option(bNode.get("aggs")).toSeq.flatMap(_.fields().asScala.toSeq)
            .filterNot(_.getValue.has("reverse_nested"))
            .flatMap { e => val (k, sp) = single(e.getValue); metricCols(e.getKey, k, sp) }
          exploded.groupBy(l.key.as("key"))
            .agg(count(lit(1)).as("doc_count"),
              count_distinct(parentId).as(rn.head.getKey) +:
                ms.map { case (n2, c) => c.as(n2) }: _*)
            .orderBy(desc("doc_count"), col("key"))
            .limit(l.termsSize.getOrElse(10))
        } else oneAgg(exploded, exploded, bName, bNode)
      case "children" =>
        // ES parent-join `children` agg: sub-aggs switch scope to the
        // CHILD docs. In the array-of-struct data shape (`has_child`, b24)
        // this is the nested agg with `type` naming the child column —
        // one explode, then the normal agg walk with `type.member` names
        // resolving into the exploded struct. doc_count counts children.
        val ctype = spec.get("type").asText()
        val exploded = df.withColumn(ctype, explode(col(ctype)))
        val inner = Option(node.get("aggs")).map(_.fields().asScala.toSeq).getOrElse(Seq.empty)
        require(inner.size == 1, s"children agg needs exactly one sub-agg, got ${inner.size}")
        oneAgg(exploded, exploded, inner.head.getKey, inner.head.getValue)
      case "auto_date_histogram" =>
        // ES 6.1+ auto_date_histogram: pick the coarsest-necessary
        // rounding from a fixed ladder so the SPANNED bucket count (empty
        // buckets included — ES merges rounded buckets as it collects)
        // stays ≤ `buckets` (default 10). Ladder here: day → month → year,
        // the calendar rungs a DATE field can need (ES's finer
        // second/minute/hour rungs serve sub-day timestamps). The min/max
        // fetch is one 1-row aggregate — the same bounded coordinator-side
        // step as the terms-lookup fetch; everything after is one
        // date_trunc groupBy, identical plan shape to date_histogram.
        val f = field(spec.get("field").asText())
        val target = Option(spec.get("buckets")).map(_.asInt()).getOrElse(10)
        val (ms2, buckets2, topHits2, pipes2) = subAggs(node)
        require(buckets2.isEmpty && topHits2.isEmpty && pipes2.isEmpty,
          "auto_date_histogram supports metric sub-aggs only")
        val mmFrame = df.agg(min(f).cast("date").as("mn"), max(f).cast("date").as("mx"))
        // validate-only: the span probe is data work — a 1-day placeholder
        // span keeps the downstream plan shape without running a job
        val (mn, mx) =
          if (validateOnly.value) {
            val e = java.time.LocalDate.EPOCH; (e, e)
          } else {
            val mm = mmFrame.collect().head
            (mm.getDate(0).toLocalDate, mm.getDate(1).toLocalDate)
          }
        val days = java.time.temporal.ChronoUnit.DAYS.between(mn, mx) + 1
        val months = (mx.getYear - mn.getYear) * 12L + (mx.getMonthValue - mn.getMonthValue) + 1
        val unit =
          if (days <= target) "day"
          else if (months <= target) "month"
          else "year"
        val cols2 = ms2.map { case (n2, c) => c.as(n2) }
        df.groupBy(EsDsl.dateHistogramBucket(f, unit).as("key"))
          .agg(count(lit(1)).as("doc_count"), cols2: _*)
          .withColumn("interval", lit(
            unit match { case "day" => "1d"; case "month" => "1M"; case _ => "1y" }))
          .orderBy("key")
      case "missing" =>
        // bucket of docs where the field is null + metric sub-aggs
        val (ms, buckets, topHits, pipes) = subAggs(node)
        require(buckets.isEmpty && topHits.isEmpty && pipes.isEmpty,
          "missing supports metric sub-aggs only")
        df.filter(field(spec.get("field").asText()).isNull)
          .agg(count(lit(1)).as("doc_count"), ms.map { case (n, c) => c.as(n) }: _*)
      case "sampler" =>
        // metric sub-aggs over the top-`shard_size` hits. ES samples the
        // best-scoring docs; ties (and the unscored case) break on the
        // frame's first column — the doc-id convention — so the sample is
        // deterministic. The sort is bounded by a limit (TakeOrdered plan,
        // no global sort at scale).
        val shard = Option(spec.get("shard_size")).map(_.asInt()).getOrElse(100)
        val (ms, buckets, topHits, pipes) = subAggs(node)
        require(buckets.isEmpty && topHits.isEmpty && pipes.isEmpty,
          "sampler supports metric sub-aggs only")
        val ordered =
          if (df.columns.contains("_score"))
            df.orderBy(col("_score").desc, col(df.columns.head).asc)
          else df.orderBy(col(df.columns.head).asc)
        ordered.limit(shard)
          .agg(count(lit(1)).as("doc_count"), ms.map { case (n, c) => c.as(n) }: _*)
      case "diversified_sampler" =>
        // sampler with a diversity constraint: at most `max_docs_per_value`
        // docs per distinct `field` value enter the sample (ES's de-bias
        // against one dominant key). Per-value cap = row_number over a
        // window keyed by the field (bounded partitions — cardinality of
        // the dedup field); the global top-shard_size is a sort-limit
        // (TakeOrdered). Same determinism convention as `sampler`: score
        // desc when present, doc-id (first column) tiebreak.
        val shard = Option(spec.get("shard_size")).map(_.asInt()).getOrElse(100)
        val maxPer = Option(spec.get("max_docs_per_value")).map(_.asInt()).getOrElse(1)
        val divField = field(spec.get("field").asText())
        val (ms, buckets, topHits, pipes) = subAggs(node)
        require(buckets.isEmpty && topHits.isEmpty && pipes.isEmpty,
          "diversified_sampler supports metric sub-aggs only")
        val ord: Seq[Column] =
          if (df.columns.contains("_score")) Seq(col("_score").desc, col(df.columns.head).asc)
          else Seq(col(df.columns.head).asc)
        val w = org.apache.spark.sql.expressions.Window.partitionBy(divField).orderBy(ord: _*)
        df.withColumn("_dvs_rn", row_number().over(w))
          .filter(col("_dvs_rn") <= maxPer)
          .orderBy(ord: _*)
          .limit(shard)
          .agg(count(lit(1)).as("doc_count"), ms.map { case (n, c) => c.as(n) }: _*)
      case "matrix_stats" =>
        // ES matrix_stats plugin: pairwise sample covariance + Pearson
        // correlation over numeric fields, unpivoted to upper-triangle
        // rows. One aggregate pass; the explode runs over a 1-row frame.
        val fs = spec.get("fields").elements().asScala.toSeq.map(_.asText())
        val pairs = for { i <- fs.indices; j <- i until fs.size } yield (fs(i), fs(j))
        val aggCols = pairs.zipWithIndex.flatMap { case ((a, b), i) => Seq(
          round(covar_samp(field(a), field(b)), 6).as(s"_cov$i"),
          round(corr(field(a), field(b)), 6).as(s"_cor$i")) }
        val one = df.agg(aggCols.head, aggCols.tail: _*)
        val rows = array(pairs.zipWithIndex.map { case ((a, b), i) =>
          struct(lit(a).as("field_a"), lit(b).as("field_b"),
            col(s"_cov$i").as("covariance"), col(s"_cor$i").as("correlation")) }: _*)
        one.select(explode(rows).as("_p")).select(col("_p.*"))
          .orderBy("field_a", "field_b")
      case "significant_text" =>
        // significant_terms over the ANALYZED tokens of a text field: each
        // doc votes once per distinct term (ES's filter_duplicate_text
        // spirit); fg = query scope, bg = whole index; JLH-core ratio.
        val f = graft.ext.TextAnalysis.tokens(field(spec.get("field").asText()))
        val size0 = Option(spec.get("size")).map(_.asInt()).getOrElse(10)
        val minDoc = Option(spec.get("min_doc_count")).map(_.asInt()).getOrElse(3)
        // `background_filter` narrows the background set (ES: compare the
        // foreground against a chosen slice instead of the whole index)
        val bgEff = Option(spec.get("background_filter"))
          .map(q => bg.filter(coalesce(predicate(q), lit(false)))).getOrElse(bg)
        def termVotes(frame: DataFrame) =
          frame.select(explode(array_distinct(f)).as("key"))
        val fgc = termVotes(df).groupBy("key").agg(count(lit(1)).as("fg"))
        val bgc = termVotes(bgEff).groupBy("key").agg(count(lit(1)).as("bg"))
        val totals = df.agg(count(lit(1)).as("tot_fg"))
          .crossJoin(bgEff.agg(count(lit(1)).as("tot_bg")))
        fgc.join(bgc, "key").crossJoin(broadcast(totals))
          .withColumn("score",
            round((col("fg").cast("double") / col("tot_fg")) /
              (col("bg").cast("double") / col("tot_bg")), 6))
          .filter(col("fg") >= minDoc)
          .select(col("key"), col("fg"), col("bg"), col("score"))
          .orderBy(desc("score"), col("key")).limit(size0)
      case "significant_terms" =>
        // ES semantics: the body's query scopes the FOREGROUND; the whole
        // index is the background. Default score = fg share / bg share
        // (the JLH ratio core); a `chi_square` key selects the Pearson
        // chi-square statistic over the disjoint 2×2 contingency
        // (term present/absent × in-scope/out-of-scope). fg >=
        // min_doc_count, top-size by score either way.
        val f = field(spec.get("field").asText())
        val size = Option(spec.get("size")).map(_.asInt()).getOrElse(10)
        val minDoc = Option(spec.get("min_doc_count")).map(_.asInt()).getOrElse(3)
        // `background_filter`: the background becomes a chosen slice of
        // the index rather than the whole of it (ES's "uncommon vs a
        // tailored baseline" form); scores re-rank accordingly
        val bgEff = Option(spec.get("background_filter"))
          .map(q => bg.filter(coalesce(predicate(q), lit(false)))).getOrElse(bg)
        val fgc = df.groupBy(f.as("key")).agg(count(lit(1)).as("fg"))
        val bgc = bgEff.groupBy(f.as("key")).agg(count(lit(1)).as("bg"))
        val totals = df.agg(count(lit(1)).as("tot_fg"))
          .crossJoin(bgEff.agg(count(lit(1)).as("tot_bg")))
        val scoreCol =
          if (spec.has("chi_square")) {
            val a = col("fg").cast("double")
            val b = col("bg").cast("double") - col("fg")
            val c = col("tot_fg").cast("double") - col("fg")
            val d = (col("tot_bg").cast("double") - col("tot_fg")) - (col("bg") - col("fg"))
            round(col("tot_bg").cast("double") * pow(a * d - b * c, 2.0) /
              ((a + b) * (c + d) * (a + c) * (b + d)), 6)
          } else
            round((col("fg").cast("double") / col("tot_fg")) /
              (col("bg").cast("double") / col("tot_bg")), 6)
        fgc.join(bgc, "key").crossJoin(broadcast(totals))
          .withColumn("score", scoreCol)
          .filter(col("fg") >= minDoc)
          .select(col("key"), col("fg"), col("bg"), col("score"))
          .orderBy(desc("score"), col("key")).limit(size)
      case k if bucketKinds(k) =>
        // walk the nested-bucket chain; metrics and top_hits live at the
        // innermost level (ES allows both anywhere; the flat frame doesn't)
        var levels = Vector(Level(name, k, spec, node))
        var (ms, buckets, topHits, pipes) = subAggs(node)
        while (buckets.nonEmpty) {
          require(buckets.size == 1, s"at most one nested bucket agg per level, got ${buckets.map(_._1)}")
          require(ms.isEmpty && topHits.isEmpty && pipes.isEmpty,
            "metric/top_hits/pipeline sub-aggs are supported only at the innermost bucket level")
          val (bName, bNode) = buckets.head
          val bKind = bNode.fieldNames().asScala.toSeq.filterNot(_ == "aggs").head
          require(bucketKinds(bKind), s"nested bucket must be terms/histogram/date_histogram, got $bKind")
          levels :+= Level(bName, bKind, bNode.get(bKind), bNode)
          val s = subAggs(bNode); ms = s._1; buckets = s._2; topHits = s._3; pipes = s._4
        }
        if (topHits.nonEmpty) {
          require(levels.size == 1 && ms.isEmpty && topHits.size == 1,
            "top_hits: single bucket level, no sibling metrics")
          return topHitsAgg(df, levels.head, topHits.head._1, topHits.head._2.get("top_hits"))
        }
        val aliased = ms.map { case (n, c) => c.as(n) }
        // terms include/exclude prune bucket keys; filtering the rows by
        // key regex before grouping is equivalent (surviving buckets keep
        // their full doc_count) and pushes toward the scan
        val keyFiltered = levels.flatMap(_.termsKeyFilter)
          .foldLeft(df)((acc, p) => acc.filter(p))
        if (levels.size == 1) singleLevel(keyFiltered, bg, levels.head, aliased, pipes)
        else {
          val g0 = nestedLevels(keyFiltered, levels, aliased)
          val leaf = levels.last
          val leafMdc = Option(leaf.spec.get("min_doc_count")).map(_.asInt())
          val histLeaf = leaf.kind == "histogram" || leaf.kind == "date_histogram"
          val g =
            if (histLeaf && leafMdc.contains(0)) {
              // per-SERIES zero fill (the terms×date_histogram dashboard
              // shape): each outer-key combination fills every interval
              // between ITS OWN observed leaf bounds — ES's per-parent
              // min_doc_count:0 semantics. Spans come from a groupBy over
              // the FINISHED bucket frame (coordinator-sized); filled
              // buckets carry doc_count 0 and null metrics, and the
              // per-series pipelines below see the zeros.
              val outer = levels.init.map(l => col(l.name))
              val leafName = leaf.name
              val step = leaf.kind match {
                case "histogram" => lit(wholeInterval(leaf.spec))
                case _ =>
                  val iv = Option(leaf.spec.get("calendar_interval"))
                    .getOrElse(leaf.spec.get("interval")).asText()
                  expr(s"interval 1 $iv")
              }
              val spans = g0.groupBy(outer: _*)
                .agg(min(col(leafName)).as("_lo"), max(col(leafName)).as("_hi"))
              val full = spans.select(
                outer :+ explode(sequence(col("_lo"), col("_hi"), step)).as(leafName): _*)
              full.join(g0, levels.init.map(_.name) :+ leafName, "left")
                .na.fill(0L, Seq("doc_count"))
            } else if (histLeaf && leafMdc.exists(_ > 1))
              g0.filter(col("doc_count") >= leafMdc.get)
            else if (leaf.kind == "terms" && leafMdc.contains(0)) {
              // per-parent terms fill: every surviving parent bucket gets
              // a (zero-count, null-metric) bucket for every term of the
              // field in the INDEX (ES per-parent min_doc_count: 0) —
              // parents × the broadcast term dictionary, left-joined onto
              // the finished frame. The leaf `size` re-ranks AFTER the
              // fill; since zero buckets order below every real bucket
              // under `_count` desc, the pre-fill prune inside
              // nestedLevels kept exactly the real buckets that survive —
              // re-ranking only appends zero tails where a parent has
              // fewer than `size` real buckets.
              val outerNames = levels.init.map(_.name)
              val domain = termsFillDomain(bg, leaf, leaf.name)
              val parents = g0.select(outerNames.map(col): _*).distinct()
              val filled = parents.crossJoin(broadcast(domain))
                .join(g0, outerNames :+ leaf.name, "left")
                .na.fill(0L, Seq("doc_count"))
              leaf.termsSize.map { size =>
                val rk = dense_rank().over(
                  org.apache.spark.sql.expressions.Window
                    .partitionBy(outerNames.map(col): _*)
                    .orderBy(col("doc_count").desc, col(leaf.name)))
                filled.withColumn("_rk", rk).filter(col("_rk") <= size).drop("_rk")
              }.getOrElse(filled)
            } else g0
          if (pipes.isEmpty) g
          else {
            // per-series pipelines: window partitioned by the outer bucket
            // keys, ordered by the innermost key (derivative per term, the
            // dashboard shape)
            val part = levels.init.map(l => col(l.name))
            val ord = col(levels.last.name)
            applyBucketPipes(g, part, Seq(ord), part :+ ord, pipes)
          }
        }
      case "top_hits" => // bare top_hits: global top-n (one implicit bucket)
        topHitsAgg(df, null, name, spec)
      case metricKind => // bare metric agg, no bucketing
        val cols = metricCols("value", metricKind, spec).map { case (n, c) => c.as(n) }
        df.agg(cols.head, cols.tail: _*)
    }
  }

  /** Single-bucket path. ES terms order: `_count` desc by default, or
    * `_key` / a metric sub-agg name, key tiebreak either way. Parent
    * pipeline aggs (`pipes`) run over the FINISHED bucket frame with a
    * window ordered by key — the frame is the bounded bucket set (what ES's
    * coordinator holds), so the single-partition window is fine. */
  private def singleLevel(df: DataFrame, bg: DataFrame, l: Level, ms: Seq[Column],
                          pipes: Seq[(String, String, JsonNode)] = Nil): DataFrame = {
    val mdc = Option(l.spec.get("min_doc_count")).map(_.asInt())
    val grouped = df.filter(l.keyNotNull)
      .groupBy(l.key.as("key")).agg(count(lit(1)).as("doc_count"), ms: _*)
    val g0 =
      if (l.kind == "terms" && mdc.contains(0))
        // terms `min_doc_count: 0`: ES emits a zero-count bucket for
        // EVERY term of the field in the INDEX (global ordinals), not
        // just the query scope — the fill domain is one distinct over
        // the unscoped frame (the term-dictionary read), include/
        // exclude-filtered like the scoped side. Zero buckets carry
        // null metrics (the histogram-fill convention) and rank last
        // under the default `_count` order. (Pre-round-15 this silently
        // acted as min_doc_count 1.)
        termsFillDomain(bg, l, l.name).withColumnRenamed(l.name, "key")
          .join(grouped, Seq("key"), "full_outer")
          .na.fill(0L, Seq("doc_count"))
      else zeroFill(df, l, grouped)
    // terms `min_doc_count` > 1: prune rare buckets BEFORE the size
    // truncation (ES semantics; 1 is the default and a no-op, 0 is the
    // fill path handled above)
    val g = mdc.filter(_ > 1)
      .map(m => g0.filter(col("doc_count") >= m)).getOrElse(g0)
    val based = l.termsSize match {
      case Some(size) =>
        val (target, dir) = l.termsOrder
        val oc = target match {
          case "_count" => col("doc_count")
          case "_key" => col("key")
          case metricName => col(metricName)
        }
        val ordered = if (dir == "asc") g.orderBy(oc.asc, col("key"))
                      else g.orderBy(oc.desc, col("key"))
        ordered.limit(size)
      case None => g.orderBy("key")
    }
    if (pipes.isEmpty) return based
    applyBucketPipes(based, Seq.empty, Seq(col("key")), Seq(col("key")), pipes)
  }

  /** Parent pipeline aggs over a finished bucket frame — the series
    * window is key-ordered for single-level buckets, PARTITIONED BY the
    * outer bucket keys (`partCols`) for nested ones (derivative /
    * moving_avg PER SERIES, the terms×date_histogram dashboard shape);
    * each partition is one series' bounded bucket list, so the window
    * never sees raw rows.
    *
    * Execution order is ES 6.5's own (`AggregatorFactories.Builder#
    * resolvePipelineAggregatorOrder`): a STABLE DECLARATION-ORDER DFS
    * topological sort over buckets_path references among the sibling
    * pipes, cycles rejected with ES's own error. The ordered pipes then
    * reduce SEQUENTIALLY over the evolving bucket list, exactly like
    * ES's reduce phase: a bucket_selector ordered before a value pipe
    * removes buckets from the series that pipe windows over, and a
    * bucket_sort reorders/truncates the list later pipes iterate (a
    * derivative after a desc bucket_sort diffs desc-consecutive
    * buckets). ES parses aggs with order-preserving XContent, so JSON
    * declaration order is meaningful — the round-16 values-first
    * regrouping (justified by "the JSON aggs map is unordered") matched
    * only its own twin; ADVICE r16 flagged it. */
  private def applyBucketPipes(based: DataFrame,
      partCols: Seq[Column], keyOrd: Seq[Column],
      defaultOrder: Seq[Column],
      pipes: Seq[(String, String, JsonNode)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var out = based
    val byName = pipes.map(p => p._1 -> p).toMap
    def deps(kind: String, spec: JsonNode): Seq[String] = {
      val raw: Seq[String] = kind match {
        case "bucket_script" | "bucket_selector" =>
          spec.get("buckets_path").fields().asScala.toSeq.map(_.getValue.asText())
        case "bucket_sort" =>
          Option(spec.get("sort")).map(_.elements().asScala.toSeq.map(e => single(e)._1))
            .getOrElse(Nil)
        case _ => Seq(spec.get("buckets_path").asText())
      }
      raw.map(_.split(">")(0).split("\\.")(0)).filter(byName.contains)
    }
    val orderedNames = scala.collection.mutable.LinkedHashSet.empty[String]
    val visiting = scala.collection.mutable.Set.empty[String]
    def visit(n: String): Unit = if (!orderedNames.contains(n)) {
      require(visiting.add(n),
        s"Cyclical dependency found with pipeline aggregator [$n]")
      val (_, k, sp) = byName(n)
      deps(k, sp).foreach(visit)
      visiting -= n
      orderedNames += n
    }
    pipes.foreach(p => visit(p._1))
    // the CURRENT list order: bucket-key order until a bucket_sort
    // replaces it (ES reducers iterate the list in its current order)
    var curOrd: Seq[Column] = keyOrd
    var sorted = false
    def wOrd = Window.partitionBy(partCols: _*).orderBy(curOrd: _*)
    orderedNames.toSeq.map(byName).foreach { case (nm, kind, spec) =>
      def path: Column = spec.get("buckets_path").asText() match {
        case "_count" => col("doc_count")
        case p => col(p)
      }
      kind match {
        case "cumulative_sum" => // double like ES's value (a _count path is long)
          // ES emits the running sum for EVERY bucket, null inputs
          // contributing nothing (CumulativeSumPipelineAggregator starts
          // at 0 and skips null/NaN) — the raw window sum instead returned
          // NULL over an all-null prefix, e.g. chained on a derivative's
          // first bucket (round-16 pipeline-differential find)
          out = out.withColumn(nm, round(coalesce(sum(path).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            lit(0.0)), 4).cast("double"))
        case "derivative" => // null for the first bucket, ES behavior
          out = out.withColumn(nm, round(path - lag(path, 1).over(wOrd), 4).cast("double"))
        case "serial_diff" => // derivative at a configurable lag
          val lagN = Option(spec.get("lag")).map(_.asInt()).getOrElse(1)
          out = out.withColumn(nm, round(path - lag(path, lagN).over(wOrd), 4).cast("double"))
        case "moving_avg" =>
          val n = Option(spec.get("window")).map(_.asInt()).getOrElse(5)
          Option(spec.get("model")).map(_.asText()).getOrElse("simple") match {
            case "simple" => // plain trailing-window mean
              out = out.withColumn(nm, round(avg(path).over(
                wOrd.rowsBetween(-(n - 1), 0)), 6).cast("double"))
            case "ewma" =>
              // ES ewma model: s₁=x₁, sₜ=α·xₜ+(1−α)·sₜ₋₁ over the trailing
              // window — expanded to its closed-form weighted sum so both
              // engines fold the same left-to-right term list:
              //   w₁=(1−α)^(m−1), wᵢ=α·(1−α)^(m−i) for i>1
              val alpha = Option(spec.get("settings"))
                .flatMap(s => Option(s.get("alpha"))).map(_.asDouble()).getOrElse(0.3)
              // collect_list skips nulls: a window of only-gap buckets
              // (e.g. chained on a derivative's first bucket) is EMPTY —
              // ES emits no value there (the raw fold emitted 0.0; the
              // linear twin below divided by zero) — round-16
              // pipeline-differential find, guarded on both models
              out = out
                .withColumn("_mvals",
                  collect_list(path.cast("double")).over(wOrd.rowsBetween(-(n - 1), 0)))
                .withColumn(nm, round(expr(
                  s"""CASE WHEN size(_mvals) = 0 THEN CAST(NULL AS DOUBLE) ELSE
                     |aggregate(
                     |  transform(_mvals, (x, i) ->
                     |    CASE WHEN i = 0 THEN pow(1.0d - $alpha, size(_mvals) - 1) * x
                     |         ELSE $alpha * pow(1.0d - $alpha, size(_mvals) - 1 - i) * x END),
                     |  0.0d, (acc, x) -> acc + x) END""".stripMargin), 6).cast("double"))
                .drop("_mvals")
            case "linear" =>
              // ES linear model: weights 1..m increasing toward the newest
              // bucket — integer weights and an exact int divisor, so both
              // engines fold identical doubles
              out = out
                .withColumn("_mvals",
                  collect_list(path.cast("double")).over(wOrd.rowsBetween(-(n - 1), 0)))
                .withColumn(nm, round(expr(
                  """CASE WHEN size(_mvals) = 0 THEN CAST(NULL AS DOUBLE) ELSE
                    |aggregate(transform(_mvals, (x, i) -> (i + 1) * x),
                    |  0.0d, (acc, x) -> acc + x)
                    |/ (size(_mvals) * (size(_mvals) + 1) / 2) END""".stripMargin), 6)
                  .cast("double"))
                .drop("_mvals")
            case other => throw new IllegalArgumentException(
              s"unsupported moving_avg model: $other")
          }
        case "moving_fn" =>
          // ES 6.4+ moving_fn: a whitelisted MovingFunctions.<fn>(values)
          // script over a sliding window that by default EXCLUDES the
          // current bucket (shift 0 → frame [-window, -1]; shift = window
          // is moving_avg's trailing-inclusive frame). Each fn maps to the
          // matching SQL window aggregate — no interpreter.
          val n = spec.get("window").asInt()
          val shift = Option(spec.get("shift")).map(_.asInt()).getOrElse(0)
          val frame = wOrd.rowsBetween(-n + shift, shift - 1)
          val script = spec.get("script").asText().trim
          val fnName = "MovingFunctions\\.(\\w+)\\(values.*".r
          out = out.withColumn(nm, script match {
            case fnName("max") => round(max(path).over(frame), 4).cast("double")
            case fnName("min") => round(min(path).over(frame), 4).cast("double")
            case fnName("sum") => round(sum(path).over(frame), 4).cast("double")
            case fnName("unweightedAvg") => round(avg(path).over(frame), 6).cast("double")
            case fnName("stdDev") => round(stddev_pop(path).over(frame), 6).cast("double")
            case other => throw new IllegalArgumentException(
              s"unsupported moving_fn script: $other")
          })
        case "bucket_script" | "bucket_selector" =>
          // painless-arithmetic subset: `params.<name>` refs bind to the
          // buckets_path metric columns, the rest must be plain
          // arithmetic/comparison — substituted and handed to the SQL
          // parser (same codegen as any expression; no interpreter)
          val paths = spec.get("buckets_path").fields().asScala.toSeq
            .map(e => e.getKey -> (e.getValue.asText() match {
              case "_count" => "doc_count"; case p => p }))
          val substituted = paths.foldLeft(spec.get("script").asText()) {
            case (acc, (p, c)) => acc.replace(s"params.$p", c) }
          val script = Painless.compile(substituted,
            extraIds = paths.map(_._2).toSet)
          if (kind == "bucket_script")
            out = out.withColumn(nm, round(expr(script), 6).cast("double"))
          else out = out.filter(expr(script))
        case "bucket_sort" => // reorder/truncate the bucket list itself
          val sorts = Option(spec.get("sort")).map(_.elements().asScala.toSeq.map { e =>
            val (f0, s) = single(e)
            val f = f0 match { case "_key" => "key"; case "_count" => "doc_count"; case x => x }
            if (Option(s.get("order")).map(_.asText()).contains("desc")) col(f).desc else col(f).asc
          }).getOrElse(Nil)
          // new list order, key as deterministic tie-break (ES's heap
          // breaks ties arbitrarily); sort absent = truncate in the
          // current order (the ES from/size-only form)
          val ord = (if (sorts.nonEmpty) sorts else curOrd) ++ keyOrd
          val from = Option(spec.get("from")).map(_.asInt()).getOrElse(0)
          val szOpt = Option(spec.get("size")).map(_.asInt())
          if (from > 0 || szOpt.isDefined) {
            // per-PARENT truncation: ES sorts/truncates EACH parent
            // bucket's list (a global limit() starved whole series in the
            // nested dashboard shape); the rank frame is bucket-frame
            // sized, never raw rows
            val rk = org.apache.spark.sql.functions.row_number()
              .over(Window.partitionBy(partCols: _*).orderBy(ord: _*))
            out = out.withColumn("_bs_rk", rk)
              .filter(col("_bs_rk") > from &&
                szOpt.map(n => col("_bs_rk") <= from + n).getOrElse(lit(true)))
              .drop("_bs_rk")
          }
          curOrd = ord
          sorted = true
      }
    }
    // deterministic output order: key order unless bucket_sort chose one
    if (sorted) out.orderBy((partCols ++ curOrd): _*) else out.orderBy(defaultOrder: _*)
  }

  /** The index-wide term set of a `terms` level — the fill domain for
    * `min_doc_count: 0` (ES reads the field's global ordinals, i.e. the
    * term dictionary of the whole index, not the query scope): one
    * distinct over the UNSCOPED frame, include/exclude-filtered like the
    * scoped side, null keys dropped (null is not a term; `missing`
    * substitution happens inside [[Level.key]] before the null check).
    * Output is coordinator-sized — the bucket set ES itself would
    * materialize for this request. */
  private def termsFillDomain(bg: DataFrame, l: Level, as: String): DataFrame = {
    val filtered = l.termsKeyFilter.foldLeft(bg)((b, p) => b.filter(p))
    filtered.select(l.key.as(as)).filter(col(as).isNotNull).distinct()
  }

  /** Histogram interval for the zero-fill paths, which generate LONG
    * bucket keys with `sequence`: must be a positive WHOLE number — a
    * fractional interval would silently truncate (0.5 → step 0, 2.5 →
    * misaligned fill keys; ADVICE round 14). The plain (non-fill)
    * histogram path keeps fractional intervals. */
  private def wholeInterval(spec: JsonNode): Long = {
    val ivd = spec.get("interval").asDouble()
    require(ivd > 0 && ivd == math.floor(ivd) && !ivd.isInfinite,
      s"histogram interval with min_doc_count: 0 must be a positive whole number, got $ivd")
    ivd.toLong
  }

  /** `min_doc_count: 0` + `extended_bounds` on histogram/date_histogram:
    * emit EVERY bucket of the bounded range, zero for empty ones (the
    * gap-free series dashboards chart). The full key range generates from
    * one `sequence` (bounded by the bounds, not the data) and left-joins
    * the aggregated buckets; metric sub-aggs stay null in empty buckets
    * (ES behavior). */
  private def zeroFill(df: DataFrame, l: Level, g: DataFrame): DataFrame = {
    // ES `min_doc_count: 0` fills EVERY interval between the observed key
    // bounds (with or without extended_bounds — pre-round-14 the fill only
    // ran with bounds, silently behaving as min_doc_count 1 otherwise);
    // `extended_bounds` can only EXTEND that span, never shrink it, so a
    // data key outside the bounds stays (the old full-LEFT-join dropped
    // it). Bounds come from a 1-row agg over the FINISHED bucket frame —
    // the ES coordinator step, never a raw-row pass.
    val wantsFill = Option(l.spec.get("min_doc_count")).exists(_.asInt() == 0) &&
      (l.kind == "histogram" || l.kind == "date_histogram")
    if (!wantsFill) return g
    val eb = Option(l.spec.get("extended_bounds"))
    val dataBounds = g.agg(min(col("key")).as("_lo"), max(col("key")).as("_hi"))
    val full = l.kind match {
      case "histogram" =>
        val iv = wholeInterval(l.spec)
        val bounds = eb.map { b =>
          val (lo, hi) = (b.get("min").asLong(), b.get("max").asLong())
          require(lo % iv == 0 && hi % iv == 0,
            s"extended_bounds must align to the interval, got [$lo, $hi] @ $iv")
          // least/greatest skip nulls: empty data under bounds still fills
          dataBounds.select(least(col("_lo"), lit(lo)).as("_lo"),
            greatest(col("_hi"), lit(hi)).as("_hi"))
        }.getOrElse(dataBounds)
        bounds.select(explode(sequence(col("_lo"), col("_hi"), lit(iv))).as("key"))
      case _ =>
        val iv = Option(l.spec.get("calendar_interval")).getOrElse(l.spec.get("interval")).asText()
        val bounds = eb.map { b =>
          dataBounds.select(
            least(col("_lo"), to_timestamp(lit(b.get("min").asText()))).as("_lo"),
            greatest(col("_hi"), to_timestamp(lit(b.get("max").asText()))).as("_hi"))
        }.getOrElse(dataBounds)
        bounds.select(explode(sequence(col("_lo"), col("_hi"),
          expr(s"interval 1 $iv"))).as("key"))
    }
    full.join(g, Seq("key"), "left_outer").na.fill(0L, Seq("doc_count"))
  }

  /** Nested chain: one groupBy over every level's key; level i's bucket
    * doc_count is the window-sum of leaf counts over its key prefix, and a
    * `terms` size prunes buckets by dense_rank(count desc, key) WITHIN the
    * enclosing bucket — ES's order, computed without any join. Outer levels
    * prune first, so a parent's rank reflects its full child population. */
  private def nestedLevels(df: DataFrame, levels: Seq[Level], ms: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // min_doc_count inside a nested chain: supported on a histogram-kind
    // LEAF (per-parent fill/prune) and on a terms LEAF with value 0
    // (per-parent term-dictionary fill) — both handled by the caller on
    // the finished frame; anything else rejects rather than silently
    // acting as the default (a terms leaf with min_doc_count > 1 would
    // need the prune BEFORE size ranking)
    levels.init.foreach { l =>
      require(!Option(l.spec.get("min_doc_count")).exists(_.asInt() != 1),
        s"min_doc_count on a non-leaf nested level is not supported (level ${l.name})")
    }
    val leaf0 = levels.last
    require(Option(leaf0.spec.get("min_doc_count")).map(_.asInt()).forall(v =>
        v == 1 || leaf0.kind == "histogram" || leaf0.kind == "date_histogram" ||
          (leaf0.kind == "terms" && v == 0)),
      s"min_doc_count on a nested ${leaf0.kind} leaf is not supported")
    require(!(leaf0.spec.has("min_doc_count") && leaf0.spec.has("extended_bounds")),
      "extended_bounds with min_doc_count inside a nested chain is not supported")
    val names = levels.map(_.name)
    // Group with DEEPER-level null keys kept: a doc missing an inner field
    // still belongs to (and counts toward the ranking of) every ancestor
    // bucket — ES drops unindexed docs level-by-level, so an outer terms
    // `size` ranks on the FULL outer bucket count, not on the docs that
    // happen to carry the inner field. (Differential-fuzz find, round-15
    // second front: the old all-levels pre-filter truncated a 22-doc
    // outer bucket in favor of a 21-doc one whenever the 22-doc bucket
    // held more inner-null docs — a222 pins it.) Each level's own null
    // rows are dropped as the walk reaches it: they form no bucket at
    // that level and contribute nothing deeper.
    var g = df.groupBy(levels.map(_.key): _*).agg(count(lit(1)).as("doc_count"), ms: _*)
    levels.zipWithIndex.foreach { case (l, i) =>
      g = g.filter(col(names(i)).isNotNull)
      l.termsSize.foreach { size =>
        val isLeaf = i == levels.size - 1
        val withCnt =
          if (isLeaf) g.withColumn("_cnt", col("doc_count"))
          else g.withColumn("_cnt",
            sum(col("doc_count")).over(Window.partitionBy(names.take(i + 1).map(col): _*)))
        val rk = dense_rank().over(
          Window.partitionBy(names.take(i).map(col): _*).orderBy(col("_cnt").desc, col(names(i))))
        g = withCnt.withColumn("_rk", rk).filter(col("_rk") <= size).drop("_cnt", "_rk")
      }
    }
    g
  }

  /** `range` / `date_range` bucket aggs: named bucket ranges (`from`
    * inclusive, `to` exclusive — ES semantics) with metric sub-aggs, in ONE
    * pass: per-bucket conditional aggregates as columns of a single row,
    * unpivoted to one row per bucket with `stack` and ordered by `key`
    * (ES allows OVERLAPPING ranges — conditional counts handle that where
    * a CASE-assigned bucket id could not). Default bucket key is
    * `from-to` with `*` for an open bound; a `key` in the range spec
    * overrides it. `geo_distance` is the same machinery over a computed
    * ring value — haversine km from `origin` ([[Geo.haversineKm]], 4 dp
    * like the geo_distance query, so ring membership is engine-stable).
    * `ip_range` compares the numeric address ([[Net.aton]]) and also
    * accepts ES's `mask` (CIDR) bucket form. */
  private def rangeAgg(df: DataFrame, node: JsonNode, kind: String): DataFrame = {
    val dateRange = kind == "date_range"
    val spec = node.get(kind)
    val f = kind match {
      case "geo_distance" =>
        val fld0 = spec.get("field").asText()
        val o = spec.get("origin")
        val unit = Option(spec.get("unit")).map(_.asText()).getOrElse("km")
        require(unit == "km", s"geo_distance agg supports km, got $unit")
        Geo.haversineKm(field(s"${fld0}_lat"), field(s"${fld0}_lon"),
          lit(o.get("lat").asDouble()), lit(o.get("lon").asDouble()))
      case "ip_range" => Net.aton(field(spec.get("field").asText()))
      case _ => field(spec.get("field").asText())
    }
    val ranges = Option(spec.get("ranges")).toSeq.flatMap(_.elements().asScala)
    require(ranges.nonEmpty, s"$kind agg needs a non-empty ranges array")
    val buckets = ranges.map { r =>
      def bound(nm: String): Option[Column] = Option(r.get(nm)).map(n =>
        if (dateRange) to_timestamp(lit(n.asText()))
        else if (kind == "ip_range") lit(Net.ipToLong(n.asText()))
        else litOf(n))
      def txt(nm: String): String = Option(r.get(nm)).map(_.asText()).getOrElse("*")
      val key = Option(r.get("key")).map(_.asText()).getOrElse(s"${txt("from")}-${txt("to")}")
      val pred = Option(r.get("mask")) match {
        case Some(m) => // CIDR bucket: [network base, broadcast+1)
          require(kind == "ip_range", "mask ranges are ip_range-only")
          val (lo, hi) = Net.cidrRange(m.asText())
          f >= lo && f < hi
        case None => Seq(bound("from").map(f >= _), bound("to").map(f < _))
          .flatten.reduceOption(_ && _).getOrElse(lit(true))
      }
      val keyed = Option(r.get("key")).map(_.asText())
        .orElse(Option(r.get("mask")).map(_.asText())).getOrElse(key)
      keyed -> pred
    }
    require(buckets.map(_._1).distinct.size == buckets.size,
      s"range bucket keys must be unique, got ${buckets.map(_._1)}")
    val metricNames = subAggs(node)._1.map(_._1)
    // count(when(...)), not sum(when(...).otherwise(0)): a global agg over
    // an EMPTY query scope returns one all-null row, and ES emits
    // doc_count 0 for every range bucket there (differential-fuzz find,
    // round 15 second front — a221 pins it)
    val aggCols = buckets.zipWithIndex.flatMap { case ((_, p), i) =>
      count(when(p, 1L)).as(s"_c$i") +:
        subAggs(node, cond = Some(p))._1.map { case (mn, c) => c.as(s"_m${i}_$mn") }
    }
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = buckets.zipWithIndex.map { case ((k, _), i) =>
      (s"'$k'" +: s"_c$i" +: metricNames.map(mn => s"_m${i}_$mn")).mkString(", ")
    }.mkString(", ")
    val outNames = ("key" +: "doc_count" +: metricNames).mkString(", ")
    one.selectExpr(s"stack(${buckets.size}, $stackArgs) AS ($outNames)")
      .orderBy("key")
  }

  /** `adjacency_matrix`: one bucket per named filter plus one per pairwise
    * intersection (key `a&b`, filters in body order) — co-occurrence
    * counting in ONE conditional-aggregate pass, empty buckets omitted
    * (ES behavior). */
  private def adjacencyMatrixAgg(df: DataFrame, spec: JsonNode): DataFrame = {
    val named = spec.get("filters").fields().asScala.toSeq.map { e =>
      e.getKey -> predicate(e.getValue)
    }
    val buckets = named ++ (for {
      i <- named.indices
      j <- i + 1 until named.size
    } yield s"${named(i)._1}&${named(j)._1}" -> (named(i)._2 && named(j)._2))
    val aggCols = buckets.zipWithIndex.map { case ((_, p), i) =>
      sum(when(p, 1L).otherwise(0L)).as(s"_c$i")
    }
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = buckets.zipWithIndex.map { case ((k, _), i) => s"'$k', _c$i" }.mkString(", ")
    one.selectExpr(s"stack(${buckets.size}, $stackArgs) AS (key, doc_count)")
      .filter(col("doc_count") > 0).orderBy("key")
  }

  /** `filters` bucket agg: one row, a count column per named filter plus
    * `<filter>_<metric>` columns for metric sub-aggs (previously dropped).
    * `other_bucket: true` adds a bucket (named by `other_bucket_key`,
    * default `_other_`) counting docs matching NONE of the filters, with
    * the same metric sub-aggs — all still one conditional-aggregate
    * pass. */
  private def filtersAgg(df: DataFrame, node: JsonNode): DataFrame = {
    val spec = node.get("filters")
    val preds = spec.get("filters").fields().asScala.toSeq.map { e =>
      e.getKey -> predicate(e.getValue)
    }
    val withOther =
      if (Option(spec.get("other_bucket")).exists(_.asBoolean())) {
        val nm = Option(spec.get("other_bucket_key")).map(_.asText()).getOrElse("_other_")
        preds :+ (nm -> preds.map(p => !coalesce(p._2, lit(false))).reduce(_ && _))
      } else preds
    // count(when(...)): doc_count 0 per filter bucket on an empty query
    // scope, where sum() would null (same empty-scope rule as rangeAgg)
    val cols = withOther.flatMap { case (nm, p) =>
      count(when(p, 1L)).as(nm) +:
        subAggs(node, cond = Some(p))._1.map { case (mn, c) => c.as(s"${nm}_$mn") }
    }
    df.agg(count(lit(1)).as("doc_count"), cols: _*)
  }

  /** `top_hits`: per-bucket (or global, when `level` is null) top-n rows by
    * the body's sort, emitted flat with the bucket key and rank. */
  private def topHitsAgg(df: DataFrame, level: Level, name: String, spec: JsonNode): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = Option(spec.get("size")).map(_.asInt()).getOrElse(3)
    // hit sort inside a bucket: `missing: _last` for BOTH directions (the
    // ES default the body-level sort already honors — top_hits previously
    // used Spark's asc=nulls-first and put null-sort-key hits on top;
    // top_hits differential find, round-15 second front)
    val sortCols = Option(spec.get("sort")).toSeq.flatMap(_.elements().asScala.toSeq).map { e =>
      if (e.isTextual) field(e.asText()).asc_nulls_last
      else {
        val (f, s) = single(e)
        if (Option(s.get("order")).map(_.asText()).contains("desc")) field(f).desc_nulls_last
        else field(f).asc_nulls_last
      }
    }
    val source = Option(spec.get("_source")).toSeq
      .flatMap(_.elements().asScala.toSeq.map(_.asText()))
    // a doc with a null bucket key forms no bucket (same drop every other
    // bucket path applies), and a terms bucket list is ranked/truncated
    // by `size` (count desc, key asc) BEFORE hits are selected — both
    // were skipped here (differential find; a224 pins the combination)
    val keyed0 = if (level == null) df.withColumn("key", lit(0))
                 else df.filter(level.keyNotNull).withColumn("key", level.key)
    val keyed = Option(level).flatMap(_.termsSize).map { sz =>
      val keep = keyed0.groupBy("key").agg(count(lit(1)).as("_kc"))
        .orderBy(col("_kc").desc, col("key").asc).limit(sz).select("key")
      keyed0.join(broadcast(keep), "key")
    }.getOrElse(keyed0)
    val effSort = if (sortCols.nonEmpty) sortCols else Seq(monotonically_increasing_id().asc)
    val w = Window.partitionBy(col("key")).orderBy(effSort: _*)
    val ranked = keyed.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
    val out = if (source.nonEmpty) source.map(s => field(s).as(s.replace('.', '_'))) else
      df.columns.toSeq.map(col)
    ranked.select((col("key") +: col("rank") +: out): _*)
  }

  /** `composite` agg: multi-source buckets in key order with `size`/`after`
    * cursor paging — scroll-style aggregation pagination. Sources are
    * `terms` over a field. */
  private def compositeAgg(df: DataFrame, spec: JsonNode): DataFrame = {
    val sources = spec.get("sources").elements().asScala.toSeq.map { s =>
      val (nm, body) = single(s)
      val (k, ks) = single(body)
      val c = k match {
        case "terms" => field(ks.get("field").asText())
        case "histogram" =>
          EsDsl.histogramBucket(field(ks.get("field").asText()),
            ks.get("interval").asDouble())
        case "date_histogram" =>
          val interval = Option(ks.get("calendar_interval"))
            .getOrElse(ks.get("interval")).asText()
          EsDsl.dateHistogramBucket(field(ks.get("field").asText()), interval)
        case other => throw new IllegalArgumentException(
          s"composite source must be terms/histogram/date_histogram, got $other")
      }
      // `missing_bucket: true` admits docs with a null source value as an
      // explicit null-keyed bucket (sorted FIRST ascending, the ES 6.5
      // contract); the default EXCLUDES such docs — ES's behavior, made
      // explicit here with a null filter since Spark's groupBy would
      // otherwise keep a null group
      val missing = Option(ks.get("missing_bucket")).exists(_.asBoolean())
      (nm, c, missing)
    }
    val size = Option(spec.get("size")).map(_.asInt()).getOrElse(10)
    val dropped = sources.foldLeft(df) { case (acc, (_, c, missing)) =>
      if (missing) acc else acc.filter(c.isNotNull)
    }
    val g = dropped.groupBy(sources.map { case (nm, c, _) => c.as(nm) }: _*)
      .agg(count(lit(1)).as("doc_count"))
    val afterFiltered = Option(spec.get("after")) match {
      case Some(a) =>
        // lexicographic (k1..kn) > (a1..an) under nulls-FIRST ascending
        // order: a null cursor value (resuming past a missing_bucket
        // page) means "equal" is IS NULL and "greater" is IS NOT NULL —
        // the plain ===/> forms go null against a null cursor and
        // silently dropped every remaining sibling bucket (composite
        // cursor-walk property find, round-15 second front; a223 pins
        // it). Bucket keys themselves may also be null (missing_bucket),
        // which plain === would likewise drop mid-prefix.
        def eqAt(j: Int): Column = {
          val n = a.get(sources(j)._1)
          if (n == null || n.isNull) col(sources(j)._1).isNull
          else col(sources(j)._1) === litOf(n)
        }
        def gtAt(i: Int): Column = {
          val n = a.get(sources(i)._1)
          if (n == null || n.isNull) col(sources(i)._1).isNotNull
          else col(sources(i)._1) > litOf(n)
        }
        val pred = sources.indices.map { i =>
          val eqPrefix = (0 until i).map(eqAt).reduceOption(_ && _).getOrElse(lit(true))
          eqPrefix && gtAt(i)
        }.reduce(_ || _)
        g.filter(pred)
      case None => g
    }
    // nulls first: the missing bucket leads the ascending key order (ES)
    afterFiltered.orderBy(sources.map(s => col(s._1).asc_nulls_first): _*).limit(size)
  }
}
