package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All pure column expressions (whole-stage codegen, no UDFs): at 100 TB these
  * run as map-side projections inside the parquet scan — no shuffle at all
  * unless the caller aggregates.
  */
object Text {

  /** Whitespace tokenizer; drops empty tokens. Native single-pass
    * [[Tokens]] — value-identical to `filter(split(text, " "), _ =!= "")`
    * but without the interpreted per-element lambda (HOF lambdas run the
    * expression interpreter per array element; on a corpus the tokenizer
    * IS the scan cost) or the regex engine behind `split`. */
  def tokens(text: Column): Column = {
    import org.apache.spark.sql.graftshim.Shim
    Shim.column(Tokens(Shim.expression(text)))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Sliding-window document chunking — the RAG / context-window prep
    * primitive: fixed `size`-token windows starting every `size - overlap`
    * tokens (starts 0, step, 2·step, … while start < nTokens, so every
    * token lands in a chunk and consecutive chunks share `overlap`
    * tokens; the tail chunk may be short). Returns
    * `array<struct<ix:int, chunk:string, n:int>>` — explode it for one
    * row per chunk. Pure column expressions: at 100 TB this is a map-side
    * projection inside the scan, zero shuffles, and chunk rows never
    * materialize outside their task. Empty documents chunk to an empty
    * array (dropped by a plain explode). */
  def chunks(text: Column, size: Int, overlap: Int): Column = {
    require(size > 0, s"chunk size must be positive: $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size): $overlap vs $size")
    val step = size - overlap
    val ts = tokens(text)
    val n = org.apache.spark.sql.functions.size(ts)
    when(n > 0,
      transform(
        sequence(lit(0), ((n - 1) / lit(step)).cast("int")),
        k => struct(
          k.cast("int").as("ix"),
          array_join(slice(ts, k * step + 1, lit(size)), " ").as("chunk"),
          least(lit(size), n - k * step).cast("int").as("n"))))
      .otherwise(array().cast("array<struct<ix:int,chunk:string,n:int>>"))
  }

  def uniqueTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** BPE-style pre-tokenizer (the GPT-2 split pattern, ASCII form):
    * contraction suffixes, space-prefixed letter runs, digit runs,
    * punctuation runs. This is the split a subword tokenizer applies before
    * merges — its token count is the standard training-cost estimator.
    * Pure regex → codegen'd, no shuffle. */
  val BpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  def bpeTokens(text: Column): Column =
    filter(regexp_extract_all(text, lit(BpePattern), lit(0)),
      t => t.rlike("\\S"))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Mean token length (characters), null-safe for empty docs. */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0)).otherwise(
      aggregate(ts, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(ts))
  }

  /** Fraction of characters that are not alphanumeric or space —
    * high punctuation ratio is a classic low-quality signal. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")))
        .cast("double") / length(text))

  /** Language marker stopwords (standard high-frequency function words). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他"))

  /** Count of distinct marker words of one language present in the doc. */
  def langScore(words: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(array_intersect(words, array(markers.map(lit): _*)))
  }

  /** Stopword ratio: distinct marker hits (any language) / distinct tokens. */
  def stopwordRatio(text: Column): Column = {
    val ws = array_distinct(tokens(text))
    val all = langMarkers.flatMap(_._2).distinct
    when(size(ws) === 0, lit(0.0)).otherwise(
      size(array_intersect(ws, array(all.map(lit): _*))).cast("double") / size(ws))
  }

  /** Heuristic language ID: argmax of marker-word scores, first-listed wins
    * ties, "und" when nothing matches. Deterministic and SQL-expressible so
    * the DuckDB oracle can replay it exactly. */
  def langId(words: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(words, l) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), other) =>
      when(best > 0 && s === best, lit(l)).otherwise(other)
    }
  }

  /** Gopher-style repetition signals (Rae et al. 2021 quality filters):
    * high duplicate-token / duplicate-n-gram fractions and a dominant top
    * token mark boilerplate-ish, low-information docs. Pure column
    * expressions, DuckDB-replayable. */
  def dupTokenRatio(text: Column): Column = {
    val ws = tokens(text)
    when(size(ws) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(ws)).cast("double") / size(ws))
  }

  /** Fraction of word n-grams that are repeats of an earlier n-gram.
    * Distinct-gram counting via the codegen'd [[WordShingles]] (the HOF
    * shingle builder interprets its lambda per gram). */
  def dupNgramRatio(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.Shim
    val total = size(tokens(text)) - (n - 1)
    when(total <= 0, lit(0.0)).otherwise(
      lit(1.0) - size(Shim.column(WordShingles(Shim.expression(text), n)))
        .cast("double") / total)
  }

  /** Occurrence fraction of the most frequent token ([[TopTokenCount]] —
    * one native pass; the HOF form was O(distinct × total) interpreted). */
  def topTokenFrac(text: Column): Column = {
    import org.apache.spark.sql.graftshim.Shim
    val ws = tokens(text)
    when(size(ws) === 0, lit(0.0)).otherwise(
      Shim.column(TopTokenCount(Shim.expression(text)))
        .cast("double") / size(ws))
  }

  /** 48-bit polynomial rolling hash over the document's characters
    * (acc*31 + codepoint, mod a 48-bit prime). Kept below 2^53 so the exact
    * same arithmetic is expressible in DuckDB BIGINTs for the oracle. */
  val FpMod = 281474976710597L // largest prime < 2^48

  def fingerprint(text: Column): Column = {
    import org.apache.spark.sql.graftshim.Shim
    Shim.column(PolyHash(Shim.expression(text)))
  }

  /** Pre-tokenization cleanup (ftfy-lite): NFC normalization, control-char
    * strip, ASCII-whitespace-run collapse, trim — one fused codegen'd pass
    * ([[NormalizeText]]); map-side, zero shuffles. */
  def normalizeText(text: Column): Column = {
    import org.apache.spark.sql.graftshim.Shim
    Shim.column(NormalizeText(Shim.expression(text)))
  }

  /** Markup strip for crawled corpora: tags (`<...>`) become spaces so
    * `<p>a</p><p>b</p>` keeps a token boundary, then the five core
    * entities decode with `&amp;` LAST (never double-decodes
    * `&amp;lt;` → `<`), then space runs collapse and trim. Pure regex
    * chain — codegen'd map-side work, and the exact same chain the
    * oracle replays. Boilerplate REMOVAL (which lines to keep) is the
    * separate C4-style `lineDedup` operator; this is the character-level
    * markup pass that precedes it. */
  def stripHtml(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => regexp_replace(c, e, v) }
    trim(regexp_replace(decoded, " +", " "))
  }

  /** Same polynomial hash for a single token (used by simhash). */
  /** PII redaction (training-data hygiene — scrub before the corpus ships):
    * emails / dashed-or-dotted phone numbers / IPv4 literals replaced by
    * typed placeholders, plus per-kind match counts for audit. Pure
    * codegen'd `regexp_replace`/`regexp_count`; the patterns avoid
    * backrefs/lookaround so an RE2-based engine (the DuckDB oracle — and
    * most scrubbing services) replays them byte-for-byte. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  val Ipv4Re  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailRe)),
     regexp_count(text, lit(PhoneRe)),
     regexp_count(text, lit(Ipv4Re)))

  def tokenHash(word: Column): Column = fingerprint(word)

  /** C4-style boilerplate removal: drop every line that occurs in at least
    * `minDf` distinct documents (nav bars, cookie banners, "subscribe"
    * footers — the classic crawl-corpus cleaning step), reassembling each
    * document's surviving lines in order. A document whose EVERY line is
    * frequent disappears from the output entirely — it was pure
    * boilerplate, and dropping it is the cleaning semantics (C4 does the
    * same); callers needing row preservation left-join the result back.
    *
    * Scale shape: one narrow posexplode, a partial-agg doc-frequency count
    * over 8-byte line HASHES (the exchange carries one row per distinct
    * line hash, never the line text), an anti-join against the frequent
    * set (tiny by definition — boilerplate is the head of the line
    * distribution — so AQE broadcasts it), and one groupBy(doc) to
    * reassemble. A 64-bit line-hash collision could drop an innocent line
    * alongside a boilerplate one; at n distinct lines the chance any
    * collision exists is ~n²/2⁶⁵ — immaterial for cleaning.
    * Output: (idCol, cleaned). */
  def removeFrequentLines(df: org.apache.spark.sql.DataFrame, idCol: String,
                          textCol: String, minDf: Long,
                          sep: String = "\n"): org.apache.spark.sql.DataFrame = {
    val lines = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .withColumnRenamed("pos", "ord").withColumnRenamed("col", "line")
      .withColumn("h", xxhash64(col("line")))
    val frequent = lines.groupBy("h")
      .agg(count_distinct(col("id")).as("df"))
      .filter(col("df") >= minDf).select("h")
    lines.join(frequent, Seq("h"), "left_anti")
      .groupBy("id")
      .agg(concat_ws(sep, transform(
        array_sort(collect_list(struct(col("ord"), col("line")))),
        s => s("line"))).as("cleaned"))
      .withColumnRenamed("id", idCol)
  }

  /** Distributed BPE merge training — tokenizer fitting, the canonical
    * pretraining-pipeline step downstream of [[bpeTokens]]:
    * learn `nMerges` byte-pair merges from a corpus by iterated
    * most-frequent-adjacent-pair selection (Sennrich et al. 2016).
    *
    * Scale shape: ONE corpus-scale stage (pretoken explode → word counts —
    * the same shuffle [[Text.tokens]] vocab building pays), then every
    * iteration runs on the WORD VOCABULARY only — corpus-size-independent,
    * one partial-agg pair count + a 1-row argmax collect per merge; the
    * driver holds just the learned (l, r) list. Vocab lineage is cut with a
    * localCheckpoint every few merges so the plan depth stays O(1).
    *
    * Determinism: ties break on (freq DESC, l ASC, r ASC); merging is greedy
    * left-to-right and non-overlapping (`aaab` + merge (a,a) → `aa a b`),
    * matching the standard BPE definition — the DuckDB oracle replays the
    * identical recurrence.
    *
    * Returns (rank LONG, l, r, freq LONG) — one row per learned merge. */
  def bpeTrain(df: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    var vocab = df
      .select(explode(bpeTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("toks"), col("cnt"))
    vocab = graft.core.Materialize.stable(vocab)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val top = vocab
        .filter(size(col("toks")) >= 2)
        .select(explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("l"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("r"))).as("p"),
          col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, freq) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank.toLong, l, r, freq))
        val m = l + r
        // greedy left-to-right merge; CaseWhen branches evaluate in order so
        // element_at never sees an empty accumulator
        vocab = vocab.select(
          aggregate(col("toks"),
            array().cast(ArrayType(StringType, containsNull = false)),
            (acc, x) =>
              when(size(acc) === 0, array(x))
                .when(element_at(acc, -1) === lit(l) && x === lit(r),
                  concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
                .otherwise(concat(acc, array(x)))).as("toks"),
          col("cnt"))
        if (rank % 4 == 0) vocab = graft.core.Materialize.stable(vocab)
        rank += 1
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      merges.result().map { case (rk, l, r, f) => Row(rk, l, r, f) }.asJava,
      StructType(Seq(StructField("rank", LongType), StructField("l", StringType),
        StructField("r", StringType), StructField("freq", LongType))))
  }

  /** BPE ENCODE — apply a trained merge list ([[bpeTrain]] output, rank
    * order) to every document: the tokenizer-application pass that turns a
    * cleaned corpus into token ids for training. Returns (id, toks).
    *
    * Scale shape (100 TB): ZERO shuffle — one map-side pass through the
    * fused codegen'd [[BpeEncodeText]] primitive (pretokenize + filter +
    * encode + flatten in one expression; merge table is plan data; a
    * per-thread LRU memo makes Zipf-repeated words O(1) — the
    * dictionary-encode win without a dictionary join's corpus-wide
    * shuffle). */
  def bpeEncode(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    val enc = new BpeEncoder(merges.toArray)
    df.select(col(idCol).as("id"),
      Shim.column(BpeEncodeText(Shim.expression(col(textCol)), enc)).as("toks"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): combine several ranked
    * retrieval sources into one list by Σ 1/(kRrf + rank) — the standard
    * hybrid-retrieval merge (e.g. BM25 keyword + embedding cosine).
    *
    * Scale shape: each source is first bounded to its top-N by
    * `orderBy(...).limit` (TakeOrderedAndProject — per-partition partial
    * top-k, no corpus sort); ranks are then a window over AT MOST topN
    * rows per source, so the single-partition window is bounded by
    * construction, and the fusion groupBy runs over ≤ sources·topN rows.
    * Sources carry (idCol, scoreCol); ranks tie-break (score DESC, id
    * ASC) on the score AS GIVEN — round scores first if cross-engine
    * replay matters. */
  def rrfFuse(sources: Seq[org.apache.spark.sql.DataFrame], idCol: String,
      scoreCol: String, topN: Int, kRrf: Int = 60): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(sources.nonEmpty, "rrfFuse: no sources")
    val ranked = sources.map { s =>
      val top = s.select(col(idCol), col(scoreCol))
        .orderBy(col(scoreCol).desc, col(idCol).asc).limit(topN)
      top.withColumn("r", row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol).asc)))
        .select(col(idCol), col("r"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(sum(lit(1.0) / (col("r") + kRrf)).as("rrf"))
  }

  /** Per-document cross-entropy under a corpus-self bigram language model —
    * the perplexity-filter quality signal (CCNet-style, with the corpus
    * itself as the LM training set): documents whose token transitions are
    * atypical for the corpus score high.
    *
    * Model: Laplace-smoothed bigram, P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) with
    * V the corpus vocabulary size; score = mean over a document's bigram
    * slots of -log2 P. Deterministic integer counts → any engine replays it.
    *
    * Scale shape (100 TB): two linear groupBy passes build the model
    * (unigram + bigram counts, both partial-aggregated map-side), one
    * shuffle join scores the corpus against the bigram table (key = the
    * bigram — the join that IS the lookup; the unigram table is the small
    * side). Nothing is quadratic; the model tables are vocabulary-sized,
    * not corpus-sized.
    *
    * Returns (id, n_bigrams, xent) for documents with ≥1 bigram. */
  def bigramCrossEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
    val uni = toks.select(explode(col("ts")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = uni.count()
    val big = toks.select(col("id"), explode(
        when(size(col("ts")) >= 2,
          transform(sequence(lit(1), size(col("ts")) - 1),
            i => struct(element_at(col("ts"), i).as("w1"),
              element_at(col("ts"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bigCounts = big.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    big.join(bigCounts, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .select(col("id"),
        (-log2((col("c2") + 1).cast("double") /
          (col("c1") + vocab).cast("double"))).as("bits"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), avg(col("bits")).as("xent"))
  }

  /** BM25 relevance of every document against a fixed query-term set
    * (Robertson/Spärck Jones; the Lucene `(k1=1.2, b=0.75)` defaults and its
    * non-negative `ln(1 + (N-df+0.5)/(df+0.5))` idf).
    *
    * Scale shape (100 TB): the per-document term-frequency table is filtered
    * to the query terms INSIDE the scan projection (map-side, before any
    * exchange), so the one shuffle carries a row per (query term, matching
    * doc), not the corpus vocabulary; document-frequency stats aggregate
    * from that already-tiny table and broadcast back. Corpus size and mean
    * doc length are one scalar aggregate. No inverted index is required for
    * a fixed query set — for ad-hoc serving, persist `tf` keyed by term and
    * this becomes an index lookup.
    *
    * Returns (id, score DOUBLE) for documents matching ≥1 term. */
  /** Sentinel "term" carrying each doc's length through the one corpus
    * pass: a token can never BE a space (tokenization splits on it). */
  private[functions] val BmSentinel = " "

  /** The single corpus pass behind [[bm25]], exposed for plan assertions:
    * per-doc term frequencies of the query terms (filtered map-side INSIDE
    * the scan projection, before the one exchange) plus one sentinel row
    * per document carrying its length. */
  private[functions] def bm25TermRows(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, terms: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    val termArr = array(terms.map(lit): _*)
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
      .select(col("id"), size(col("ts")).as("dl"),
        filter(col("ts"), t => array_contains(termArr, t)).as("mts"))
      .select(col("id"), col("dl"),
        explode(concat(col("mts"), array(lit(BmSentinel)))).as("t"))
      .groupBy("id", "dl", "t").agg(count(lit(1)).as("tf"))
  }

  def bm25(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "bm25: empty query")
    require(!terms.contains(BmSentinel),
      "bm25: a bare space is not a valid query term")
    // ONE corpus pass: bm25TermRows (term filter map-side inside the scan,
    // sentinel row per doc) materialized via localCheckpoint, so the three
    // consumers below (corpus stats, document frequencies, scoring) never
    // re-scan the corpus. The old shape tokenized the corpus twice —
    // doubling the dominant CPU cost at scale — and plan-level exchange
    // reuse is defeated here by per-branch filter pushdown, so explicit
    // materialization of the tiny tf table is the robust single-pass form.
    val sent = BmSentinel
    val tfAll =
      graft.core.Materialize.stable(bm25TermRows(df, idCol, textCol, terms))
    // corpus stats ride the final plan as a broadcast one-row aggregate
    // over the sentinel rows (one per doc) instead of a driver collect —
    // an empty (or all-empty-docs) corpus yields an empty result through
    // ordinary SQL null/empty semantics rather than an NPE on a null
    // avg(dl); greatest() skips the null avg and guards avgdl = 0
    val stats = tfAll.filter(col("t") === sent)
      .agg(count(lit(1)).cast("double").as("nd"),
        greatest(avg(col("dl")), lit(1e-9)).as("avgdl"))
    val tf = tfAll.filter(col("t") =!= sent)
    val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "t")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("nd") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("s", col("idf") * (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("id").agg(sum(col("s")).as("score"))
  }
}
