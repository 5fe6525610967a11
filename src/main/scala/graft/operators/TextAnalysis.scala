package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.Text._

/** Text-analysis operators over the `documents` fixture: token counting,
  * n-gram language identification, quality scoring, and document
  * fingerprinting. All pure expression trees + one broadcast-sized profile
  * join — no UDFs, no driver-side loops.
  *
  * Scale design: token/quality/fingerprint are per-row projections
  * (shuffle-free, whole-stage codegen). Language-ID trains per-language
  * trigram profiles with one aggregation over the corpus (map-side partial
  * agg), and the resulting profile table is O(langs · 20) rows — broadcast
  * to score every document without a shuffle of the corpus.
  */
object TextAnalysis {

  /** Token counting: whitespace tokens, BPE-ish regex tokens (letter runs,
    * digit runs, single other chars), distinct-token vocabulary size. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        size(tokens($"text")).as("n_ws_tokens"),
        size(regexp_extract_all(lower($"text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .as("n_bpe_tokens"),
        size(array_distinct(tokens($"text"))).as("n_distinct_tokens"),
        length($"text").as("n_chars_actual"))
      .orderBy($"doc_id")
  }

  val ProfileSize = 20

  /** N-gram language-ID (Cavnar-Trenkle-lite): per-language profiles = the
    * top-20 character trigrams of that language's labeled corpus (count desc,
    * trigram asc); a document's predicted language maximizes |distinct doc
    * trigrams ∩ profile| (score desc, lang asc tiebreak).
    *
    * Two jobs by design. Job 1 trains the profiles: one explode + one
    * hash-partitioned count (map-side partial agg) + a top-20-per-lang window
    * over the tiny (lang, gram) aggregate — then the O(langs · 20) profile is
    * pulled to the driver, exactly like a broadcast of a dimension that fits
    * in kilobytes. Job 2 scores WITHOUT touching the corpus again beyond the
    * cached gram arrays: each document's sorted gram-hash array is merge-
    * walked against each language's 20-element literal array
    * (intersect_cardinality), and the argmax is a fixed CASE chain — no
    * second explode, no join, no per-doc window shuffle. At 100 TB the
    * corpus-sized data is touched twice and shuffled once (the profile
    * count); scoring is embarrassingly parallel per row. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.sources.Caches.shared(
      Tables.spread(Tables.documents(spark, dir))
        .filter(length($"text") >= 3)
        .select($"doc_id", $"lang",
          graft.functions.CharGrams(lower($"text"), 3).as("grams")))
    val profRows = docs
      .select($"lang", explode($"grams").as("gram"))
      .groupBy($"lang", $"gram").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"lang").orderBy($"cnt".desc, $"gram".asc)))
      .filter($"rn" <= ProfileSize)
      .select($"lang", $"gram")
      .collect()
    // lang asc, profile grams as sorted hash60s (IntersectCardinality's
    // sorted+distinct contract; 60-bit collisions are negligible)
    val profiles: Seq[(String, Seq[Long])] = profRows
      .groupBy(_.getString(0)).toSeq
      .map { case (lang, rows) =>
        lang -> rows.map(r => graft.functions.HashKernels.h60(r.getString(1))).sorted.toSeq
      }
      .sortBy(_._1)
    if (profiles.isEmpty) {
      return docs.select($"doc_id", lit(null).cast("string").as("pred_lang"),
        $"lang".as("actual_lang"), lit(false).as("correct")).limit(0)
    }
    // argmax(score desc, lang asc) as ONE fused kernel over the inverted
    // profile index (union postings, binary-searched per distinct doc gram):
    // the previous per-language expression fan-out (typedLit profile +
    // IntersectCardinality merge loop + struct, array_max'd) generated a
    // class whose size grew with |langs| and dominated cold codegen+JIT —
    // the r4 driver bench charged 14.6 s cold vs 0.7 s warm to this query.
    // The kernel also skips HashArray60 + array_sort: one pass over the
    // already-distinct gram array scores every language at once. Null index
    // = no profile gram matched (inner-join parity: such a doc produces no
    // row in the join-based formulation).
    val langNames = profiles.map(_._1)
    docs.withColumn("bi", graft.functions.BestProfileIndex(
        $"grams", profiles.map(_._2.toArray).toArray))
      .filter($"bi".isNotNull)
      .withColumn("pred_lang", element_at(typedLit(langNames), $"bi" + 1))
      .select($"doc_id", $"pred_lang", $"lang".as("actual_lang"),
        ($"pred_lang" === $"lang").as("correct"))
      .orderBy($"doc_id")
  }

  /** Quality scoring: exact int/int ratios (length, stopword, vocabulary
    * diversity, mean token length) combined in a fixed-order linear score —
    * bit-identical across engines, no rounding needed. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityRows(Tables.documents(spark, dir)).orderBy($"doc_id")
  }

  /** The quality projection over any (doc_id, text, n_chars) relation —
    * stateless per-row scoring, so it applies identically to the batch
    * corpus and to an arriving micro-batch (ingest-time quality gating);
    * `StreamProjectionSpec` pins batch/stream agreement. */
  def qualityRows(rows: DataFrame): DataFrame =
    withQuality(rows).select(col("doc_id"), col("n_chars"),
      col("stopword_ratio"), col("diversity"), col("mean_token_len"),
      col("quality"))

  /** [[qualityRows]]'s formula APPENDED to the caller's columns (text
    * survives) — the shape a composing gate needs ([[graft.operators.Curate.ingestRows]]
    * filters on quality and still chunks the text downstream). */
  def withQuality(rows: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val stopRatio = (size(filter(toks, t => t.isin("the", "a"))).cast("double") / nTok)
    val diversity = (size(array_distinct(toks)).cast("double") / nTok)
    val meanLen = (aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") / nTok)
    rows
      .withColumn("stopword_ratio", stopRatio)
      .withColumn("diversity", diversity)
      .withColumn("mean_token_len", meanLen)
      .withColumn("quality",
        lit(0.25) * col("stopword_ratio") + lit(0.5) * col("diversity") +
          lit(0.05) * col("mean_token_len"))
  }

  /** Repetition-based quality metrics (the Gopher/C4-style filter family):
    * the fraction of word bigrams / trigrams that are repeats of an earlier
    * occurrence within the same document. High duplicate-gram fractions mark
    * boilerplate and degenerate generations; training-data pipelines drop or
    * downweight such docs. Pure per-row projection over the fused gram
    * kernel (total windows = n−k+1; distinct from [[graft.functions.WordGramHashes]]),
    * shuffle-free, exact int/int divisions — engine-stable. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id",
        size($"toks").as("n_tokens"),
        (size($"toks") - 1 - size(graft.functions.WordGramHashes($"toks", 2))).as("dup2"),
        (size($"toks") - 2 - size(graft.functions.WordGramHashes($"toks", 3))).as("dup3"))
      .select($"doc_id", $"n_tokens",
        ($"dup2".cast("double") / ($"n_tokens" - 1).cast("double")).as("dup_bigram_frac"),
        ($"dup3".cast("double") / ($"n_tokens" - 2).cast("double")).as("dup_trigram_frac"))
      .withColumn("flagged", $"dup_bigram_frac" > 0.2)
      .orderBy($"doc_id")
  }

  /** Document fingerprinting: bottom-8 sketch of word-3-gram hash60s —
    * the 8 smallest shingle hashes summed into one bigint fingerprint
    * (a locality-ish content signature; equal fingerprints ⇒ near-identical
    * shingle sets with high probability). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir))
      .select($"doc_id", tokens($"text").as("toks"))
      .select($"doc_id", wordShingles($"toks").as("shingles"))
      .select($"doc_id",
        slice(array_sort(graft.functions.HashArray60($"shingles")), 1, 8).as("bottom8"))
      .select($"doc_id",
        aggregate($"bottom8", lit(0L), (acc, x) => acc + x).as("fingerprint"),
        element_at($"bottom8", 1).as("min_hash"),
        size($"bottom8").as("sketch_size"))
      .orderBy($"doc_id")
  }

  /** Redaction regexes — deliberately restricted to constructs Java's regex
    * and RE2 (the DuckDB oracle's engine) interpret identically: character
    * classes, bounded/unbounded counted repetition, no backreferences or
    * lookaround. Order of application matters and is fixed: emails first
    * (their local part could otherwise be half-eaten by the phone rule),
    * then IPs (dotted quads are not phone-shaped — the phone class has no
    * '.'), then phones. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII scrubbing (the C4/Dolma-style redaction pass): emails, IPv4s and
    * phone-shaped digit runs are replaced with typed placeholder tags, with
    * per-document redaction counts for audit. The fixture corpus is
    * synthetic word-soup with no PII, so the query CONSTRUCTS a PII-laden
    * corpus deterministically from fixture columns (every doc gets an
    * email, a phone and an IP derived from doc_id/lang/n_chars) and then
    * scrubs it — the oracle performs the identical construction, so every
    * row exercises every rule (no vacuous pass). Pure per-row projection:
    * shuffle-free, embarrassingly parallel at any corpus size; the digest
    * pins every byte of the scrubbed text. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables.documents(spark, dir)
      .select($"doc_id", concat(
        $"text",
        lit(" reach "), $"lang", $"doc_id".cast("string"), lit("@example.com"),
        lit(" or +1-555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
        lit(" from 10."), ($"doc_id" % 256).cast("string"),
        lit(".0."), ($"n_chars" % 256).cast("string")).as("raw"))
    piiScrubRows(raw)
      .select($"doc_id", $"n_emails", $"n_ips",
        length($"clean").as("n_clean_chars"), md5($"clean").as("digest"))
      .orderBy($"doc_id")
  }

  /** The scrubbing projection over any (doc_id, raw) relation — stateless
    * per-row redaction, so it applies identically to the batch corpus and
    * to an arriving micro-batch (ingest-time PII gating);
    * `StreamProjectionSpec` pins batch/stream agreement. */
  def piiScrubRows(rows: DataFrame): DataFrame =
    rows.select(col("doc_id"),
      size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("raw"), lit(Ipv4Re), lit(0))).as("n_ips"),
      regexp_replace(regexp_replace(regexp_replace(col("raw"),
        EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), PhoneRe, "<PHONE>").as("clean"))

  val VocabSize = 256

  /** Vocabulary build + out-of-vocabulary rate (the tokenizer-prep step):
    * the corpus's [[VocabSize]] most frequent tokens (count desc, token asc
    * — a deterministic cut) become the vocabulary; each document reports
    * how many of its token OCCURRENCES fall outside it. Job 1 is one
    * explode + gram-keyed count (map-side partial agg) + top-K — the vocab
    * is O(VocabSize) rows, pulled to the driver like any broadcast-sized
    * dimension. Job 2 is a pure projection: each doc's tokens are hashed
    * and membership-counted against the sorted vocab postings via the same
    * reference-object kernel pattern as language-ID — the corpus is never
    * exploded a second time and never joined. */
  def vocabOov(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.sources.Caches.shared(
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", tokens($"text").as("toks")))
    val vocab = docs.select(explode($"toks").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok".asc)
      .limit(VocabSize)
      .select($"tok").collect().map(r =>
        graft.functions.HashKernels.h60(r.getString(0)))
    docs.select($"doc_id", size($"toks").as("n_tokens"),
        graft.functions.CountInSet($"toks", vocab.sorted).as("n_in_vocab"))
      .select($"doc_id", $"n_tokens",
        ($"n_tokens" - $"n_in_vocab").as("n_oov"),
        (($"n_tokens" - $"n_in_vocab").cast("double") /
          $"n_tokens".cast("double")).as("oov_rate"))
      .orderBy($"doc_id")
  }

  val LineTokens = 10
  val BoilerplateDf = 2

  /** Dictionary-size threshold for [[boilerplate]]'s two physical plans:
    * at or below the cap the frequent-line dictionary is collected and
    * broadcast as a reference-object hash set (one binary search per line,
    * corpus never re-shuffled); above it the literal would stress the
    * driver/plan (2²⁰ longs ≈ 8 MB is the comfortable ceiling, the
    * [[graft.operators.Dedup.bloomBits]] cap philosophy), so the SAME
    * semantics run as a flagged left join of the exploded (doc, pos, line)
    * postings against the dictionary TABLE — the anti-join degradation the
    * r7 scaladoc documented — with positional reassembly in the per-doc
    * aggregate. Both plans are output-identical by construction (the spec
    * A/Bs them); every measured corpus sits far below the cap. */
  val BoilerplateDictCap = 1 << 20

  /** Boilerplate-line removal (the CCNet/RefinedWeb line-level dedup pass):
    * documents are segmented into fixed [[LineTokens]]-token "lines" (the
    * fixture corpus is single-line word-soup, so the segmentation stands in
    * for real newline splitting — deterministically mirrored by the oracle),
    * any line occurring in ≥ [[BoilerplateDf]] DISTINCT documents is
    * boilerplate (navigation chrome, cookie banners, template footers — and
    * here, the shared spans of the fixture's planted near-dups), and every
    * occurrence of a boilerplate line is removed. Output pins the kept text
    * byte-for-byte via md5.
    *
    * Scale shape: the corpus is never shuffled. Job 1 aggregates line-hash
    * document frequencies (one map-side-partial shuffle of line hashes,
    * 8-byte keys) and keeps only lines with df ≥ threshold — the FREQUENT-
    * line dictionary, which the heavy-hitter skew of real web text keeps
    * small relative to the corpus (raising the threshold shrinks it
    * monotonically). Job 2 broadcasts that dictionary as a reference-object
    * hash set and filters each document's lines in place
    * ([[graft.functions.FilterNotInSet]] — one digest + binary search per
    * line, shuffle-free). A dictionary above [[BoilerplateDictCap]]
    * switches job 2 to the exploded flagged-left-join plan (anti-join = the
    * flag-null rows) with positional reassembly — same output, one extra
    * linear shuffle instead of an overgrown broadcast literal. */
  def boilerplate(spark: SparkSession, dir: String): DataFrame =
    boilerplateImpl(spark, dir, None)

  /** `forceDictCap` exists for the A/B spec only (driving the oversized-
    * dictionary plan on a fixture whose dictionary is small); operators
    * always use [[BoilerplateDictCap]]. */
  private[graft] def boilerplateImpl(spark: SparkSession, dir: String,
      forceDictCap: Option[Long]): DataFrame = {
    import spark.implicits._
    val cap = forceDictCap.getOrElse(BoilerplateDictCap.toLong)
    val docs = graft.sources.Caches.shared(
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", tokens($"text").as("toks"))
        .select($"doc_id", transform(
          sequence(lit(1), ceil(size($"toks").cast("double") / LineTokens).cast("int")),
          i => concat_ws(" ", slice($"toks", (i - lit(1)) * LineTokens + lit(1), lit(LineTokens))))
          .as("lines")))
    val freq = graft.sources.Caches.shared(docs
      .select($"doc_id", explode($"lines").as("line"))
      .select($"doc_id", hash60($"line").as("lh"))
      .groupBy($"lh").agg(countDistinct($"doc_id").as("df"))
      .filter($"df" >= BoilerplateDf)
      .select($"lh"))
    if (freq.count() <= cap) {
      val frequent = freq.collect().map(_.getLong(0)).sorted
      docs
        .withColumn("kept", graft.functions.FilterNotInSet($"lines", frequent))
        .select($"doc_id",
          size($"lines").as("n_lines"),
          (size($"lines") - size($"kept")).as("n_removed"),
          md5(concat_ws(" ", $"kept")).as("digest"))
        .orderBy($"doc_id")
    } else {
      // oversized dictionary: explode to (doc, pos, line) postings, flag
      // boilerplate lines with a left join against the dictionary TABLE
      // (the anti-join's kept rows are exactly the flag-null ones, and the
      // flag doubles as the removal count), reassemble per document in
      // line order. Shuffles: the join on lh and the per-doc aggregate —
      // both linear in line count; collect_list state is bounded by
      // document length exactly like spanDedup's rebuild.
      docs
        .select($"doc_id", posexplode($"lines").as(Seq("pos", "line")))
        .withColumn("lh", hash60($"line"))
        .join(freq.withColumn("boiler", lit(true)), Seq("lh"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast("int").as("n_lines"),
          sum(when($"boiler", 1).otherwise(0)).cast("int").as("n_removed"),
          md5(concat_ws(" ", transform(
            sort_array(collect_list(when($"boiler".isNull,
              struct($"pos", $"line")))),
            s => s.getField("line")))).as("digest"))
        .orderBy($"doc_id")
    }
  }

  val SalientK = 3

  /** Per-document salient terms (the tf-idf-style keyword extraction a
    * curation pass uses for topic bucketing and cluster labeling): each
    * document's top [[SalientK]] tokens ranked by term frequency descending,
    * document frequency ascending (rarer across the corpus = more
    * characteristic), token ascending — a fully integer-exact ordering, so
    * the cut is deterministic on any engine (no floating-point idf).
    *
    * Scale shape: term frequencies are one (doc, token)-keyed count with
    * map-side partial aggregation; document frequencies re-aggregate that
    * result by token (vocabulary-sized output), and flow back via a
    * BROADCAST join — the corpus-sized tf relation is never shuffled again.
    * The top-k is a per-document window over rows already co-partitioned by
    * the tf groupBy's hash partitioning on (doc_id, tok) — Catalyst inserts
    * one exchange on doc_id for the window; at 100 TB both shuffles move
    * (token, int) pairs, not documents. */
  def salientTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the tf relation feeds BOTH the df aggregate (broadcast build) and
    // the scoring join — share one materialization instead of running the
    // corpus explode + (doc, tok) aggregate once per consumer (guide §5:
    // cache what is reused and expensive; this is the same posture as the
    // BM25 postings memo)
    val tf = graft.sources.Caches.shared(
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", explode(tokens($"text")).as("tok"))
        .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf")))
    val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "tok")
      .withColumn("rank", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"tf".desc, $"df".asc, $"tok".asc)))
      .filter($"rank" <= SalientK)
      .select($"doc_id", $"rank", $"tok", $"tf", $"df")
      .orderBy($"doc_id", $"rank")
  }

  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25QueryStride = 100
  val Bm25QueryTerms = 8
  val Bm25K = 10
  val Bm25DfCapFloor = 4096L

  /** Hard document-frequency ceiling on query terms, derived from corpus
    * size with the fixture-floored pattern of `Dedup.bloomBits` /
    * `Dedup.simhashBandBits`: terms with df > max(4096, N/20) are DROPPED
    * from the query before the postings join (and the drop is surfaced per
    * query as `n_terms_dropped`). Rationale: candidate volume is Σ df over
    * the selected terms, and on a vocabulary where even the 8 "rarest"
    * tokens of a document are stopwords (SCALING.md measures the flat
    * 31-token fixture at C ≈ (N/100)·8·0.05N — quadratic), "rarest" is no
    * protection — a saturated posting list must be refused outright, the
    * df-cutoff every production engine applies before WAND-style traversal.
    * The recall cost is honest and visible (dropped terms can no longer
    * match), never silent. The 4096 floor keeps every shipped fixture scale
    * bit-identical (measured max selected df: 392 at N=500, 3 885 at
    * N=5 000); above N ≈ 82k the 5 %-of-corpus rule binds. The oracle
    * mirrors the same greatest(4096, N/20) arithmetic. */
  private[graft] def bm25DfCap(nDocs: Long): Long =
    math.max(Bm25DfCapFloor, nDocs / 20)

  /** Query-workload stride, derived from corpus size (the fixture-floored
    * pattern of `Dedup.contamBenchStride`): every stride-th document
    * queries the corpus, and a constant stride grows the workload linearly
    * with the corpus — but a retrieval workload is externally bounded, and
    * the operator's cost claim is per-query. max(100, n/500) saturates the
    * carved workload at ≈ 500 queries; the floor holds at every fixture
    * scale and the 40k probe (knee n = 50 000), keeping the oracle's
    * `doc_id % 100` literal bit-identical. */
  private[graft] def bm25QueryStride(nDocs: Long): Long =
    graft.operators.Dedup.warnIfPastOracleFloor("bm25 query stride",
      math.max(Bm25QueryStride, nDocs / 500), Bm25QueryStride)

  /** Scored (query, doc) pairs BEFORE the top-k cut — the postings-join
    * volume [[graft.ScaleProbe]] tracks (= Σ df over the rarest query
    * terms; the quantity idf pruning keeps off the stopword lists and the
    * [[bm25DfCap]] ceiling bounds when the vocabulary has no rare terms).
    * `forceCap` exists for ScaleProbe A/Bs only (measuring the derived
    * floor against the bare N/20 rule); operators always derive. */
  /** The corpus-side index artifacts every BM25 surface shares: the
    * (doc, dl, tok, tf) postings (cache-shared, so every caller reads ONE
    * materialization), the vocabulary-sized document frequencies, and the
    * N/avgdl scalars (one metadata-cheap aggregate). */
  private def bm25Index(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, Double, Double) =
    // memoized per (session, dir): the (nDocs, avgdl) scalars are an EAGER
    // aggregate — without the memo every BM25 surface (the top-k query,
    // BOTH hybrid-RRF legs, every serving micro-batch) re-tokenized the
    // corpus per invocation just to recompute two constants, which was the
    // entire zero-warm-benefit steady cost the bench showed. The postings
    // and df tables ride the same memo (df is vocabulary-sized).
    graft.sources.Caches.memoizedValue(spark, s"text-bm25-index|$dir") {
      bm25IndexOver(Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), col("text")))
    }

  /** Bench fixture-charging hook: pre-build the memoized BM25 postings
    * index ([[bm25Index]] — tf + df tables and the N/avgdl scalars) so the
    * bm25-consuming queries' per-query bench numbers measure serve cost,
    * not whichever of them the session's map order let pay the one-time
    * build (r18 read that order shuffle as a text_index_drift 1→3 s
    * "regression"). At 100 TB this is the offline index build the serving
    * stack runs at its refresh cadence. */
  private[graft] def warmIndexes(spark: SparkSession, dir: String): Unit = {
    val (tf, dfreq, _, _) = bm25Index(spark, dir)
    tf.count()
    dfreq.count()
    ()
  }

  /** The index build over an EXPLICIT (doc_id, text) relation — shared by
    * the memoized base build ([[bm25Index]]) and the drift check's
    * fresh-statistics truth leg ([[lexDriftCheckFrames]]: "what would a
    * reindex over the grown corpus serve"). Un-memoized: callers own the
    * caching decision. */
  private[graft] def bm25IndexOver(rawDocs: DataFrame)
      : (DataFrame, DataFrame, Double, Double) = {
    val spark = rawDocs.sparkSession
    import spark.implicits._
    val docs = rawDocs
      .select($"doc_id", tokens($"text").as("toks"))
      .select($"doc_id", $"toks", size($"toks").as("dl"))
    // scalars from `docs`, not from tf: explode drops zero-token docs,
    // and a zero-token doc still counts toward N and pulls avgdl down
    val (nDocs, avgdl) = docs
      .agg(count(lit(1)).cast("double"), avg($"dl")).as[(Double, Double)].head()
    val tf = graft.sources.Caches.shared(
      docs.select($"doc_id", $"dl", explode($"toks").as("tok"))
        .groupBy($"doc_id", $"dl", $"tok").agg(count(lit(1)).as("tf")))
    val dfreq = graft.sources.Caches.shared(
      tf.groupBy($"tok").agg(count(lit(1)).as("df")))
    (tf, dfreq, nDocs, avgdl)
  }

  /** BM25 scores for an EXTERNAL query workload — `queryToks` is one row
    * per DISTINCT (query_id, tok); this is the retrieval-serving surface
    * ([[graft.operators.Similarity.hybridRrfFor]] feeds arriving micro-
    * batches through it). Terms absent from the corpus vocabulary drop at
    * the dfreq join: BM25's per-term sum only collects matching terms, so
    * an unseen term can never contribute — refusing it a rarest-8 slot is
    * the production behavior, not a loss. The batch operator's stride
    * workload flows through this SAME code path, so the oracle pins the
    * serving semantics too. */
  private[graft] def bm25ScoreQueries(spark: SparkSession, dir: String,
      queryToks: DataFrame, forceCap: Option[Long] = None,
      extraPostings: Option[DataFrame] = None): DataFrame = {
    val (baseTf, dfreq, nDocs, avgdl) = bm25Index(spark, dir)
    bm25ScoreOver(baseTf, dfreq, nDocs, avgdl, queryToks, forceCap,
      extraPostings)
  }

  /** The scoring core over EXPLICIT index artifacts — shared by the
    * in-session build ([[bm25ScoreQueries]]) and the persisted-index
    * serving path ([[bm25TopKFromSaved]]). */
  private def bm25ScoreOver(baseTf: DataFrame, dfreq: DataFrame,
      nDocs: Double, avgdl: Double, queryToks: DataFrame,
      forceCap: Option[Long] = None,
      extraPostings: Option[DataFrame] = None): DataFrame = {
    val spark = baseTf.sparkSession
    import spark.implicits._
    // ingest-appended postings segments ([[appendPostingsStream]]) join
    // the same scoring scan; df/N/avgdl stay PINNED at the base index's
    // values until an explicit reindex — the segment-append contract of
    // every incremental search engine (stale idf, bounded by segment-merge
    // cadence), matching the pinned-quantizer rule of the dense leg.
    // The merge drops base postings of any doc the delta re-lists
    // ([[graft.operators.Similarity.mergeDeltaRows]] — the one shared
    // implementation of the anti-join-union contract): before a compaction
    // that is a no-op (appended ids are fresh); after [[compactPostings]]
    // it is what makes a REPLAYED old epoch invisible (its rows are
    // already merged into the base) — latest wins, per doc.
    val tf = extraPostings.fold(baseTf)(
      graft.operators.Similarity.mergeDeltaRows(baseTf, _, "doc_id"))
    val cap = forceCap.getOrElse(bm25DfCap(nDocs.toLong))
    // rank first, cap second: the cap is on the ranking key (df asc), so
    // the capped set is a prefix of the ranking and rank-then-cap equals
    // cap-then-rank — but rank-then-cap also exposes how many of the
    // query's 8 rarest terms were refused (n_terms_dropped)
    val qterms = queryToks
      .join(broadcast(dfreq), "tok")
      .withColumn("qrn", row_number().over(
        Window.partitionBy($"query_id").orderBy($"df".asc, $"tok".asc)))
      .filter($"qrn" <= Bm25QueryTerms)
      .withColumn("n_terms_dropped", sum(when($"df" > cap, 1).otherwise(0))
        .over(Window.partitionBy($"query_id")).cast("int"))
      .filter($"df" <= cap)
      .select($"query_id", $"tok", $"df", $"n_terms_dropped")
    val idf = log(lit(1.0) +
      (lit(nDocs) - $"df" + lit(0.5)) / ($"df" + lit(0.5)))
    tf.join(broadcast(qterms), "tok")
      .filter($"doc_id" =!= $"query_id")
      .withColumn("contrib", idf * ($"tf" * lit(Bm25K1 + 1)) /
        ($"tf" + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * $"dl" / lit(avgdl))))
      .groupBy($"query_id", $"doc_id")
      .agg(round(sum($"contrib"), 6).as("score"),
        min($"n_terms_dropped").as("n_terms_dropped"))
  }

  private[graft] def bm25Candidates(spark: SparkSession, dir: String,
      forceCap: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val (tf, _, nDocs, _) = bm25Index(spark, dir)
    bm25ScoreQueries(spark, dir,
      tf.filter($"doc_id" % bm25QueryStride(nDocs.toLong) === 0)
        .select($"doc_id".as("query_id"), $"tok"),
      forceCap)
  }

  /** Ranked BM25 top-k for an external query workload (the
    * [[bm25TopKImpl]] cut over [[bm25ScoreQueries]]). */
  private[graft] def bm25TopKFor(spark: SparkSession, dir: String,
      queryToks: DataFrame): DataFrame =
    bm25RankCut(bm25ScoreQueries(spark, dir, queryToks))

  // ------------- incremental postings maintenance (ingest-time append)

  /** Tokenize an arriving (doc_id, text) batch into the postings layout
    * the base index stores — (doc_id, dl, tok, tf). Pure per-batch work
    * (tokenize + local count); the pinned df/N/avgdl stats are NOT touched,
    * so an appended posting scores exactly as the same row would in a
    * rebuilt segment under the same stats ([[bm25ScoreQueries]]). */
  private[graft] def encodeForPostings(docs: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    import docs.sparkSession.implicits._
    val carryCols = carry.map(col)
    docs.select($"doc_id" +: tokens($"text").as("toks") +: carryCols: _*)
      .select($"doc_id" +: size($"toks").as("dl") +:
        explode($"toks").as("tok") +: carryCols: _*)
      .groupBy($"doc_id" +: $"dl" +: $"tok" +: carryCols: _*)
      .agg(count(lit(1)).as("tf"))
  }

  /** Ingest-time lexical index maintenance: arriving (doc_id, text) rows
    * are tokenized into postings per micro-batch and APPENDED as a new
    * segment — the Lucene-segment contract mirrored on the dense leg's
    * [[graft.operators.Similarity.appendIndexStream]]: segments grow,
    * the corpus statistics (df, N, avgdl) stay pinned until an explicit
    * reindex, so retrieval sees new documents immediately at the honest
    * price of stale idf. Encoding is pure; replayed epochs append
    * byte-identical rows that [[readPostingsDelta]]'s (doc_id, tok) dedup
    * hides. */
  def appendPostingsStream(docStream: DataFrame, spark: SparkSession,
      dir: String, storeDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    docStream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        encodeForPostings(batch)
          .withColumn("epoch", lit(epoch))
          .write.mode("append").parquet(
            graft.operators.Similarity.appendTarget(spark, storeDir))
      }
  }

  /** The replay-safe read of the appended postings segments: byte-identical
    * replay copies collapse on the full (doc_id, tok, epoch) key, then the
    * LATEST epoch wins per DOCUMENT — the whole posting set of the newest
    * version replaces the old one (a changed re-upload may have dropped
    * tokens; row-level latest-wins would leak the removed ones). Epoch-less
    * stores (pre-epoch layout / batch backfills) keep the plain key dedup,
    * safe only under the append-only/byte-identical-replay contract. */
  def readPostingsDelta(spark: SparkSession, storeDir: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.parquet(
      graft.operators.Similarity.appendTarget(spark, storeDir))
    if (raw.columns.contains("epoch"))
      raw.dropDuplicates("doc_id", "tok", "epoch")
        .withColumn("_maxe", max($"epoch").over(
          Window.partitionBy($"doc_id")))
        .filter($"epoch" === $"_maxe").drop("_maxe", "epoch")
    else raw.dropDuplicates("doc_id", "tok")
  }

  /** Merge the appended postings segments back into the persisted base
    * postings ([[savePostingsIndex]] artifacts) — the segment-merge half
    * of the Lucene contract, off the serving path (the
    * [[graft.operators.Similarity.compactIndex]] twin for the sparse leg).
    * The df/N/avgdl statistics stay PINNED (compaction moves byte-identical
    * posting rows, so serving before and after is bit-equal —
    * `IndexMaintenanceSpec` pins it); refreshing the statistics is a
    * reindex ([[savePostingsIndex]] over the grown corpus), a separate
    * scheduled job. Same crash-safety ordering as the dense twin: merged
    * postings land in a sibling dir, swap in, then the store truncates
    * bounded by the fold watermark (a live appender's later rows
    * survive) — a crash between swap and truncate leaves rows in both
    * base and store, which the serving-side merge already handles (the
    * post-compaction replay state). */
  def compactPostings(spark: SparkSession, indexDir: String,
      storeDir: String): Unit = {
    import spark.implicits._
    val raw = spark.read.parquet(
      graft.operators.Similarity.appendTarget(spark, storeDir))
    val foldedThrough =
      if (raw.columns.contains("epoch"))
        raw.agg(org.apache.spark.sql.functions.max($"epoch"))
          .as[Option[Long]].head()
      else None
    val delta = readPostingsDelta(spark, storeDir)
    if (delta.isEmpty) return
    val base = spark.read.parquet(
      graft.operators.Similarity.resolveArtifact(spark, indexDir, "postings"))
    // a retraction tombstone (null token — [[CorpusLake.refreshPostingsFromLake]])
    // is spent once its doc's base rows are anti-joined away in THIS
    // rewrite: it shadows nothing afterwards (any future delta row takes
    // per-doc priority through the serving merge regardless), so the fold
    // drops it — the base never accumulates dead rows for deleted docs
    graft.operators.Similarity.mergeDeltaRows(base, delta, "doc_id")
      .filter(col("tok").isNotNull)
      .write.mode("overwrite").parquet(s"$indexDir/postings_compacting")
    graft.operators.Similarity.swapArtifact(spark, indexDir, "postings")
    graft.operators.Similarity.truncateStoreThrough(spark, storeDir,
      foldedThrough)
    // the loaded-artifact memo now points at the PRE-compaction file set —
    // drop it (and unpersist its cached frames) so the next load reads the
    // merged base; index artifacts are mutable at exactly this boundary
    graft.sources.Caches.invalidate(spark, s"text-bm25-index-saved|$indexDir")
  }

  /** The deterministic BATCH twin of the segment-append encode, as its own
    * oracled query (the [[graft.operators.Similarity.indexAppend]]
    * convention): every 10th document re-arrives under a fresh id and is
    * tokenized into exactly the postings rows [[appendPostingsStream]]
    * stores — DuckDB re-derives them from the same parquet, hash-pinning
    * the lexical maintenance encode end-to-end. */
  def postingsAppend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    encodeForPostings(
        Tables.documents(spark, dir)
          .filter($"doc_id" % 10 === 0)
          .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
      .orderBy($"doc_id", $"tok")
  }

  /** The lexical maintenance loop as ONE ingest stream — the
    * [[graft.operators.Similarity.maintainIndexStream]] twin for the
    * sparse leg: per micro-batch the arriving documents tokenize into an
    * epoch-stamped segment appended to `maintDir/seg`, and when the
    * segment fraction reaches `compactAt` of the persisted base postings,
    * [[compactPostings]] folds the segments into `indexDir` — all off the
    * query path.
    *
    * With `adviseDir` (the base-corpus fixture dir), the loop ALSO keeps
    * the raw (doc_id, text) lake partition under `maintDir/docs` and runs
    * the statistics-drift advisory ([[lexRetrainAdvised]]) at the
    * COMPACTION cadence, appending one (epoch, mean_recall,
    * retrain_advised) row to `maintDir/advisory` before each fold. The
    * cadence choice is deliberate: the advisory's truth leg is a fresh
    * index build over base ∪ everything-appended-since-reindex — a corpus
    * scan, the same order of work the segment merge itself pays — so it
    * rides the merge schedule rather than taxing every micro-batch (the
    * dense leg's per-batch advisory is cheap only because its truth is
    * memoized; a statistics truth cannot be). The docs partition is never
    * truncated by compaction — it accumulates until an explicit reindex,
    * exactly the window the SAVED-leg check must keep measuring
    * post-fold. Restart/replay safety is the dense twin's: epoch-stamped
    * writes, keyed read-side dedup, post-compaction overlap hidden by the
    * serving merge. */
  def maintainPostingsStream(docStream: DataFrame, spark: SparkSession,
      indexDir: String, maintDir: String,
      compactAt: Double = 0.25,
      adviseDir: Option[String] = None): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import spark.implicits._
    // running-counter trigger, the maintainIndexStream convention: base
    // counted once per (re)start/compaction, delta accumulated batch-side
    var baseCount = -1L
    var deltaCount = -1L
    docStream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val seg = encodeForPostings(batch).withColumn("epoch", lit(epoch))
        val n = seg.count()
        seg.write.mode("append").parquet(graft.operators.Similarity
          .appendTarget(spark, s"$maintDir/seg"))
        adviseDir.foreach { _ =>
          batch.select($"doc_id", $"text").withColumn("epoch", lit(epoch))
            .write.mode("append").parquet(graft.operators.Similarity
              .appendTarget(spark, s"$maintDir/docs"))
        }
        if (baseCount < 0) baseCount = spark.read.parquet(
          graft.operators.Similarity.resolveArtifact(spark, indexDir, "postings")).count()
        if (deltaCount < 0)
          deltaCount = spark.read.parquet(graft.operators.Similarity
            .appendTarget(spark, s"$maintDir/seg")).count()
        else deltaCount += n
        if (deltaCount > 0 && deltaCount >= compactAt * baseCount) {
          adviseDir.foreach { d =>
            val (mean, advised) = lexRetrainAdvised(spark, d, indexDir,
              s"$maintDir/seg", Dedup.readDocsDelta(spark, s"$maintDir/docs"))
            Seq((epoch, mean, advised))
              .toDF("epoch", "mean_recall", "retrain_advised")
              .write.mode("append").parquet(s"$maintDir/advisory")
          }
          compactPostings(spark, indexDir, s"$maintDir/seg")
          baseCount = -1
          deltaCount = 0
        }
      }
  }

  /** BM25 serving over base index ∪ ingest-appended segments: the query a
    * curation stack runs five minutes after new documents arrived, without
    * a reindex. Pinned-stats contract per [[bm25ScoreQueries]]. */
  def bm25TopKWithDelta(spark: SparkSession, dir: String,
      queryToks: DataFrame, storeDir: String): DataFrame =
    bm25RankCut(bm25ScoreQueries(spark, dir, queryToks,
      extraPostings = Some(readPostingsDelta(spark, storeDir))))

  // ------------- lexical drift advisory (the sparse-leg reindex trigger)

  /** Mean-recall margin under the lexical baseline past which
    * [[lexRetrainAdvised]] trips. Unlike the dense leg (whose ANN
    * approximation prices baseline recall below 1), base-statistics
    * serving at the snapshot IS the truth, so the baseline is exactly 1.0
    * and "drifted" means the pinned-idf ranking measurably diverges from
    * what a reindex over the grown corpus would serve. */
  val LexDriftRecallMargin = 0.05

  /** Statistics-drift check for the lexical leg — the
    * [[graft.operators.Similarity.indexDriftCheckFrames]] twin for BM25:
    * recall@[[Bm25K]] of the PINNED-statistics serving leg (base postings
    * ∪ `deltaTf` under the base's frozen df/N/avgdl) against the
    * FRESH-statistics truth (a full rebuild over base ∪ `deltaDocs` —
    * what an explicit reindex would serve), on the base stride query
    * workload. Each leg selects its rarest-8 query terms under its OWN
    * statistics — self-consistency is the point: the advisory measures
    * how far stale idf has bent the RANKING, not just the scores. Appends
    * distributed like the base vocabulary leave the two rankings near-
    * identical; a vocabulary-shifting ingest (new domain, new language)
    * re-weights idf until served lists diverge below
    * 1 − [[LexDriftRecallMargin]] — the signal to schedule
    * [[savePostingsIndex]] over the grown corpus. Truth-leg cost is one
    * corpus-scan index build per check (run it on the maintenance
    * cadence, not per query); the comparison itself joins two
    * ≤ k-per-query lists. */
  def lexDriftCheckFrames(spark: SparkSession, dir: String,
      deltaDocs: DataFrame, deltaTf: DataFrame): DataFrame = {
    import spark.implicits._
    val (baseTf, _, nDocs, _) = bm25Index(spark, dir)
    val q = baseTf.filter($"doc_id" % bm25QueryStride(nDocs.toLong) === 0)
      .select($"doc_id".as("query_id"), $"tok")
    val served = bm25RankCut(bm25ScoreQueries(spark, dir, q,
      extraPostings = Some(deltaTf)))
    lexDriftCompare(lexFreshTruth(spark, dir, deltaDocs, q), served)
  }

  /** The drift check over the REAL serving leg — persisted artifacts
    * ([[savePostingsIndex]]) ∪ the appended segment store. Post-
    * compaction the folded rows live in the persisted base and KEEP being
    * measured (the dense leg's [[graft.operators.Similarity.indexDriftCheckSaved]]
    * lesson): an in-session-base variant would snap back to baseline the
    * moment segments fold. `deltaDocs` is everything appended since the
    * last reindex — the raw-doc lake partition the maintenance loop keeps. */
  def lexDriftCheckSaved(spark: SparkSession, dir: String, indexDir: String,
      storeDir: String, deltaDocs: DataFrame): DataFrame = {
    import spark.implicits._
    val (tf, dfreq, nDocs, avgdl) = loadPostingsIndex(spark, indexDir)
    // the probe workload is pinned to the BASE corpus stride (the dense
    // leg's strideQueries convention), NOT carved from the saved
    // postings: after a fold the saved postings contain the appended
    // docs, and a workload drawn from them would shift at every
    // compaction — the advisory trend must measure a fixed probe set
    val (baseTf, _, baseN, _) = bm25Index(spark, dir)
    val q = baseTf.filter($"doc_id" % bm25QueryStride(baseN.toLong) === 0)
      .select($"doc_id".as("query_id"), $"tok")
    val served = bm25RankCut(bm25ScoreOver(tf, dfreq, nDocs, avgdl, q,
      extraPostings = Some(readPostingsDelta(spark, storeDir))))
    lexDriftCompare(lexFreshTruth(spark, dir, deltaDocs, q), served)
  }

  /** The fresh-statistics truth ranking: rebuild over base ∪ delta. */
  private def lexFreshTruth(spark: SparkSession, dir: String,
      deltaDocs: DataFrame, q: DataFrame): DataFrame = {
    val grown = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
      .unionByName(deltaDocs.select(col("doc_id"), col("text")))
    val (tf2, df2, n2, avg2) = bm25IndexOver(grown)
    bm25RankCut(bm25ScoreOver(tf2, df2, n2, avg2, q))
  }

  /** Per-query recall of the served list against the fresh-truth list,
    * with the advisory flag against the exact-1.0 baseline. 6dp re-pin
    * before the margin compare (engine-stable at the boundary). */
  private def lexDriftCompare(truth: DataFrame, served: DataFrame): DataFrame = {
    import truth.sparkSession.implicits._
    val t = truth.select($"query_id", $"doc_id")
    val s = served.select($"query_id", $"doc_id")
    val hits = t.join(s, Seq("query_id", "doc_id"), "left_semi")
      .groupBy($"query_id").agg(count(lit(1)).as("n_hits"))
    t.select($"query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select($"query_id",
        coalesce($"n_hits", lit(0L)).as("n_hits"),
        round(coalesce($"n_hits", lit(0L)) / lit(Bm25K.toDouble), 6).as("recall"))
      .withColumn("mean_recall",
        round(avg($"recall").over(Window.partitionBy()), 6))
      .withColumn("retrain_advised",
        $"mean_recall" < lit(1.0 - LexDriftRecallMargin))
      .select($"query_id", $"n_hits", $"recall", $"retrain_advised")
      .orderBy($"query_id")
  }

  /** The advisory scalar a maintenance loop acts on: (mean recall of
    * pinned-statistics serving vs the reindex truth, trip flag). */
  def lexRetrainAdvised(spark: SparkSession, dir: String, indexDir: String,
      storeDir: String, deltaDocs: DataFrame): (Double, Boolean) = {
    import spark.implicits._
    lexDriftCheckSaved(spark, dir, indexDir, storeDir, deltaDocs)
      .agg(avg($"recall"), max($"retrain_advised"))
      .as[(Double, Boolean)].head()
  }

  /** The deterministic BATCH twin of the lexical drift check, as its own
    * oracled query (the [[graft.operators.Similarity.indexDrift]]
    * convention): the [[postingsAppend]] delta (every 10th document
    * re-arriving under a fresh id) is served under pinned base statistics
    * and compared to the fresh-statistics rebuild — DuckDB re-derives the
    * full doubled chain (both term selections, both scorings, both
    * rankings, the recall join, mean-vs-margin). */
  def postingsDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val delta = Tables.documents(spark, dir)
      .filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    lexDriftCheckFrames(spark, dir, delta, encodeForPostings(delta))
  }

  /** The shared rank cut over a scored (query_id, doc_id, score,
    * n_terms_dropped) frame. */
  private def bm25RankCut(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"score".desc, $"doc_id".asc)))
      .filter($"rank" <= Bm25K)
      .select($"query_id", $"doc_id", $"rank", $"score", $"n_terms_dropped")
  }

  /** Persist the built lexical index — postings, document frequencies, and
    * the (N, avgdl) scalars — as three parquet tables (the
    * [[graft.operators.Similarity.saveIndex]] convention for the sparse
    * leg). At 100 TB the tokenize + postings build is a batch job whose
    * output OUTLIVES the session: a serving process loads the artifacts
    * and never re-tokenizes the corpus ([[bm25TopKFromSaved]]). */
  def savePostingsIndex(spark: SparkSession, dir: String,
      indexDir: String): Unit = {
    import spark.implicits._
    val (tf, dfreq, nDocs, avgdl) = bm25Index(spark, dir)
    tf.write.mode("overwrite").parquet(s"$indexDir/postings")
    dfreq.write.mode("overwrite").parquet(s"$indexDir/df")
    Seq((nDocs, avgdl)).toDF("n_docs", "avgdl")
      .write.mode("overwrite").parquet(s"$indexDir/stats")
  }

  /** Load persisted lexical-index artifacts ([[savePostingsIndex]]).
    * Memoized per (session, indexDir): the stats row is an eager
    * one-row collect and per-micro-batch serving must not re-read it. */
  private[graft] def loadPostingsIndex(spark: SparkSession, indexDir: String)
      : (DataFrame, DataFrame, Double, Double) =
    graft.sources.Caches.memoizedValue(spark, s"text-bm25-index-saved|$indexDir") {
      import spark.implicits._
      val tf = graft.sources.Caches.shared(
        spark.read.parquet(graft.operators.Similarity
          .resolveArtifact(spark, indexDir, "postings")))
      val dfreq = graft.sources.Caches.shared(
        spark.read.parquet(s"$indexDir/df"))
      val (nDocs, avgdl) = spark.read.parquet(s"$indexDir/stats")
        .select($"n_docs", $"avgdl").as[(Double, Double)].head()
      (tf, dfreq, nDocs, avgdl)
    }

  /** BM25 serving from a PERSISTED index, optionally ∪ an appended segment
    * store: scoring reads only the loaded artifacts — a fresh serving
    * session starts here; `IndexMaintenanceSpec` pins bit-equality with
    * the in-session build. */
  def bm25TopKFromSaved(spark: SparkSession, indexDir: String,
      queryToks: DataFrame, storeDir: Option[String] = None): DataFrame = {
    val (tf, dfreq, nDocs, avgdl) = loadPostingsIndex(spark, indexDir)
    bm25RankCut(bm25ScoreOver(tf, dfreq, nDocs, avgdl, queryToks,
      extraPostings = storeDir.map(readPostingsDelta(spark, _))))
  }

  /** BM25 top-k retrieval over an inverted index — the search half of a
    * curation stack (find the corpus documents most relevant to a probe
    * document: nearest-neighbor in lexical space, the sparse companion to
    * [[Similarity.topkBruteForce]]'s dense ANN). Every
    * [[bm25QueryStride]]-th document queries the corpus with its
    * [[Bm25QueryTerms]] RAREST distinct tokens (df ascending, token
    * ascending — the idf-pruning every production engine applies, taken to
    * its deterministic extreme; BM25's per-term sum only collects matching
    * terms, so scoring via the postings join is exact for the pruned term
    * set). Scores use the standard Robertson formulation with k1 = 1.2,
    * b = 0.75, idf = ln(1 + (N − df + ½)/(df + ½)), rounded 6 dp before
    * ranking so the tie-break (score desc, doc_id asc) is engine-stable.
    *
    * Scale shape: tf is one (doc, token)-keyed count with map-side partial
    * aggregation (the [[salientTerms]] index, reused structure); df
    * re-aggregates it to vocabulary size; the query-term table is tiny by
    * construction (|queries|·8 rows) and BROADCAST against the postings,
    * so candidate volume is Σ df(rarest query terms) — the short posting
    * lists, never the stopword lists, and never |queries| × |corpus| —
    * with [[bm25DfCap]] refusing any saturated term outright (each output
    * row carries the query's `n_terms_dropped` so degraded recall is
    * visible). The N/avgdl scalars are one metadata-cheap aggregate (the
    * langid-profile collect pattern). */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    // memoized like Similarity.topkBruteForce / topkIvfPq: the stride
    // workload's ranked list is the lexical leg of BOTH hybrid-RRF queries
    // and its own query — the scoring join (Σ df scored pairs) re-ran per
    // invocation with only the index memoized. Result is workload-sized
    // (≤ |queries|·k rows); external workloads stay uncached ([[bm25TopKFor]]).
    graft.sources.Caches.memoized(spark, s"text-bm25-topk|$dir")(
      graft.sources.Caches.shared(bm25TopKImpl(spark, dir, None)))

  /** `forceCap` threads the ScaleProbe A/B knob through the top-k cut. */
  private[graft] def bm25TopKImpl(spark: SparkSession, dir: String,
      forceCap: Option[Long]): DataFrame = {
    import spark.implicits._
    bm25Candidates(spark, dir, forceCap)
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"score".desc, $"doc_id".asc)))
      .filter($"rank" <= Bm25K)
      .select($"query_id", $"doc_id", $"rank", $"score", $"n_terms_dropped")
      .orderBy($"query_id", $"rank")
  }

  val HeavyK = 50
  val CmsEps = 0.001
  val CmsConfidence = 0.999
  val CmsSeed = 42

  /** Count-min-sketch heavy hitters: token occurrence counts estimated from
    * a CMS built over the exploded corpus (`DataFrameStatFunctions
    * .countMinSketch` — distributed mergeable sketch, one pass), reported
    * for the exact top-[[HeavyK]] tokens with the same sketch-oracle scheme
    * round 3 established for HLL/quantiles: the row carries the EXACT count
    * (oracle-checkable) plus bounded-error flags the oracle states as
    * literal TRUE — `est_ge_exact` (CMS never under-counts) and
    * `est_within_bound` (over-count ≤ ε·N with the sketch's width; a false
    * flag fails the hash gate, so the error bound IS verified at sf0.01).
    *
    * Scale shape: the sketch is a fixed ⌈2/ε⌉ × ⌈ln(1/δ)⌉ int table merged
    * associatively across partitions (no shuffle of tokens — partial
    * sketches merge on the driver); the exact top-k is the same map-side
    * partial count + TakeOrdered as [[topGrams]]. Probing happens on the
    * driver for k = 50 keys — broadcast-sized, like the langid profiles. */
  def sketchHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = graft.sources.Caches.shared(
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", explode(tokens($"text")).as("tok")))
    val nTotal = toks.count()
    val cms = toks.stat.countMinSketch("tok", CmsEps, CmsConfidence, CmsSeed)
    val top = toks.groupBy($"tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy($"exact_cnt".desc, $"tok".asc)
      .limit(HeavyK)
      .collect()
    val bound = (CmsEps * nTotal).toLong
    val rows = top.zipWithIndex.map { case (r, i) =>
      val est = cms.estimateCount(r.getString(0))
      (i + 1, r.getString(0), r.getLong(1),
        est >= r.getLong(1), est <= r.getLong(1) + bound)
    }
    spark.createDataFrame(rows.toSeq)
      .toDF("rank", "tok", "exact_cnt", "est_ge_exact", "est_within_bound")
  }

  val TopGrams = 50

  /** Corpus-level bigram frequency statistics: the [[TopGrams]] most frequent
    * word bigrams with occurrence count and document frequency — the
    * boilerplate/repetition profile a curation pass reads before setting
    * filter thresholds (and the df distribution behind the prefix-filter
    * dedup's effectiveness). One linear explode + one gram-keyed groupBy
    * (map-side partial aggregation collapses each partition to its distinct
    * grams before the shuffle); the top-k is a TakeOrdered, not a global
    * sort. Ties are broken by the gram string so the cut at rank 50 is
    * deterministic on any engine. */
  def topGrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir))
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= 2)
      .select($"doc_id", explode(transform(sequence(lit(1), size($"toks") - 1),
        i => concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1)))).as("gram"))
      .groupBy($"gram")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct($"doc_id").as("n_docs"))
      .orderBy($"n_occurrences".desc, $"gram".asc)
      .limit(TopGrams)
  }

  /** Add-k smoothing mass for [[lmPerplexity]] (k = 0.5, Jeffreys). */
  val LmAddK = 0.5

  /** Bigram language-model perplexity scoring — the CCNet-style quality
    * filter (Wenzek et al. 2020): train an n-gram LM on the corpus, score
    * every document by its average per-token negative log-likelihood, and
    * gate ingestion on the resulting perplexity (low ppl ⇒ fluent in-domain
    * text, high ppl ⇒ noise/boilerplate/other-language). The LM here is the
    * corpus's own add-k-smoothed bigram model — self-scoring, the setup of
    * in-domain filtering; swapping the training corpus changes only the
    * first input. P(w₂|w₁) = (c(w₁w₂)+k) / (c(w₁)+k·V) with k = [[LmAddK]]
    * and V the unigram vocabulary size; per-doc score = mean −ln P over its
    * bigrams (6 dp — summation order is partitioning-dependent), plus the
    * geometric-mean perplexity e^score (2 dp).
    *
    * Scale shape: counts are two partial-aggregated shuffles (bigram,
    * unigram); scoring joins the per-doc bigram stream to both count tables
    * ON THE TOKEN KEYS — shuffle joins, because at 100 TB the LM tables are
    * vocabulary-scale (billions of bigrams) and cannot broadcast; V rides
    * as a broadcast scalar. The per-doc reduction is one partial-agg
    * shuffle on doc_id. Nothing collects; every stage is linear in corpus
    * tokens. */
  def lmPerplexity(spark: SparkSession, dir: String): DataFrame =
    lmPerplexityRows(Tables.spread(Tables.documents(spark, dir)))

  /** The reusable core over any (…, doc_id, text) relation. */
  def lmPerplexityRows(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val toks = graft.sources.Caches.shared(
      rows.select($"doc_id", tokens($"text").as("s")))
    val uni = toks.select(explode($"s").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bg = toks.filter(size($"s") >= 2)
      .select($"doc_id", explode(transform(sequence(lit(1), size($"s") - 1),
        i => struct(element_at($"s", i).as("w1"),
          concat_ws(" ", element_at($"s", i), element_at($"s", i + 1)).as("bgram")))).as("p"))
      .select($"doc_id", $"p.w1", $"p.bgram")
    val bgc = bg.groupBy($"bgram").agg(count(lit(1)).as("c2"))
    bg.join(bgc, "bgram")
      .join(uni, $"w1" === $"tok")
      .join(broadcast(vocab), lit(true))
      .select($"doc_id",
        (-log(($"c2" + LmAddK) / ($"c1" + $"v" * LmAddK))).as("nll"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg($"nll"), 6).as("avg_nll"))
      .withColumn("ppl", round(exp($"avg_nll"), 2))
      .orderBy($"doc_id")
  }

  /** The persisted LM artifact [[lmScoreStream]] applies at ingest: bigram
    * counts, unigram counts, vocabulary size — trained in batch over the
    * reference corpus (yesterday's corpus, in the [[Sampling.mixtureRows]]
    * convention). */
  def lmModel(spark: SparkSession, dir: String): (DataFrame, DataFrame, Long) = {
    import spark.implicits._
    val toks = Tables.spread(Tables.documents(spark, dir))
      .select($"doc_id", tokens($"text").as("s"))
    val uni = toks.select(explode($"s").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c1"))
    val bgc = toks.filter(size($"s") >= 2)
      .select(explode(transform(sequence(lit(1), size($"s") - 1),
        i => concat_ws(" ", element_at($"s", i), element_at($"s", i + 1)))).as("bgram"))
      .groupBy($"bgram").agg(count(lit(1)).as("c2"))
    (bgc, uni, uni.count())
  }

  /** Streaming twin of [[lmPerplexity]] — the ingest-hygiene shape for LM
    * quality gating: each arriving (doc_id, text) row is scored against the
    * batch-trained model per row. Counts join LEFT (an arriving doc may
    * carry bigrams the model never saw; add-k smoothing prices them at
    * k/(c1+kV), down to 1/V for unseen histories — on in-model text the
    * left joins match every row and the scores equal [[lmPerplexityRows]]'s
    * bit-for-bit, which `StreamProjectionSpec` pins). The per-doc reduction
    * is an update-mode aggregate keyed by doc_id; state is bounded because
    * a document arrives in one batch (the [[Dedup.spanDedupStream]]
    * convention).
    *
    * Scale posture: the demo broadcasts the count tables; at corpus scale
    * the same plan is a stream-static SHUFFLE join on the token keys
    * against the persisted vocabulary-scale model, with only the arriving
    * batch's bigrams moving. */
  def lmScoreStream(docStream: DataFrame, bgc: DataFrame, uni: DataFrame,
      vocabSize: Long): DataFrame = {
    val toks = docStream.select(col("doc_id"), tokens(col("text")).as("s"))
    toks.filter(size(col("s")) >= 2)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(col("s")) - 1),
        i => struct(element_at(col("s"), i).as("w1"),
          concat_ws(" ", element_at(col("s"), i), element_at(col("s"), i + 1)).as("bgram")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.bgram").as("bgram"))
      .join(broadcast(bgc), Seq("bgram"), "left")
      .join(broadcast(uni.withColumnRenamed("tok", "w1")), Seq("w1"), "left")
      .withColumn("nll", -log((coalesce(col("c2"), lit(0L)) + LmAddK) /
        (coalesce(col("c1"), lit(0L)) + vocabSize * LmAddK)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("nll")), 6).as("avg_nll"))
  }
}
