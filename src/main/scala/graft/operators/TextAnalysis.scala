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
    * trigrams ∩ profile| (score desc, lang asc tiebreak). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select($"doc_id", $"lang", lower($"text").as("lc"))
      .select($"doc_id", $"lang", charShingles($"lc", 3).as("grams"))
      .persist()
    val profile = docs
      .select($"lang", explode($"grams").as("gram"))
      .groupBy($"lang", $"gram").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"lang").orderBy($"cnt".desc, $"gram".asc)))
      .filter($"rn" <= ProfileSize)
      .select($"lang".as("profile_lang"), $"gram")
    val scores = docs.select($"doc_id", $"lang", explode($"grams").as("gram"))
      .join(broadcast(profile), "gram")
      .groupBy($"doc_id", $"lang", $"profile_lang")
      .agg(count(lit(1)).as("score"))
    scores.withColumn("rn", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"score".desc, $"profile_lang".asc)))
      .filter($"rn" === 1)
      .select($"doc_id", $"profile_lang".as("pred_lang"), $"lang".as("actual_lang"),
        ($"profile_lang" === $"lang").as("correct"))
      .orderBy($"doc_id")
  }

  /** Quality scoring: exact int/int ratios (length, stopword, vocabulary
    * diversity, mean token length) combined in a fixed-order linear score —
    * bit-identical across engines, no rounding needed. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokens($"text")
    val nTok = size(toks).cast("double")
    val stopRatio = (size(filter(toks, t => t.isin("the", "a"))).cast("double") / nTok)
    val diversity = (size(array_distinct(toks)).cast("double") / nTok)
    val meanLen = (aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") / nTok)
    Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars",
        stopRatio.as("stopword_ratio"),
        diversity.as("diversity"),
        meanLen.as("mean_token_len"),
        (lit(0.25) * stopRatio + lit(0.5) * diversity +
          lit(0.05) * meanLen).as("quality"))
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
}
