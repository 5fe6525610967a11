package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Text.tokens

/** Distributed BPE tokenizer training — the vocabulary-construction step of
  * an LLM data pipeline (Sennrich et al. 2016): start from the corpus
  * word-frequency table with words split into characters (+ an explicit
  * `</w>` end-of-word symbol), then repeatedly merge the most frequent
  * adjacent symbol pair, re-counting after each merge. The learned merge
  * list IS the tokenizer.
  *
  * Self-pairs (l = r) are excluded from the candidate set: their greedy
  * application depends on run parity (in `a a a`, which pair merges is a
  * position question), while distinct-symbol merges are provably disjoint —
  * a match at i and one at i+1 would force l = r — so application is a pure
  * per-position expression, identical in any engine and any row order.
  * Production BPE implementations resolve self-pair runs left-to-right;
  * excluding them trades a rarely-chosen merge class for engine-exact
  * determinism (and an oracle-expressible application step).
  *
  * Scale shape: training runs on the WORD-FREQUENCY table, not the corpus —
  * one corpus-token shuffle builds it (~10⁸ distinct words at 100 TB, vs
  * 10¹³ corpus tokens), and every merge round after that is (1) a pair
  * fan-out + partial-aggregated count over vocab-scale rows, (2) a ONE-ROW
  * collect (the argmax pair — the langid-profile bounded-collect pattern),
  * (3) a pure per-row merge application, localCheckpointed so lineage stays
  * O(1) in rounds. A production run training 30k merges would batch
  * non-interacting top-k pairs per round to amortize round latency — same
  * plan shape, fewer rounds; [[BpeMerges]] = 6 keeps the oracle's unrolled
  * SQL finite. */
object Tokenizer {

  val BpeMerges = 6

  /** Apply merge (l, r) → lr to a symbol array: every adjacent (l, r)
    * occurrence collapses. Matches cannot overlap (l ≠ r — see class doc),
    * so the result is position-wise: a match start emits the merged symbol,
    * the position after a match start is dropped, everything else passes
    * through. 0-based `get` returns null out of range, keeping the guard
    * expressions total under ANSI. */
  private[graft] def applyMerge(s: Column, l: String, r: String): Column =
    filter(transform(sequence(lit(0), size(s) - 1), i =>
      when(get(s, i) === l && get(s, i + 1) === r, lit(l + r))
        .when(get(s, i - 1) === l && get(s, i) === r, lit(null).cast("string"))
        .otherwise(get(s, i))), x => x.isNotNull)

  /** The corpus word-frequency table in symbol form: one row per distinct
    * word, `s` = its characters + `</w>`. */
  private def wordTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir))
      .select(explode(tokens($"text")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .select($"freq", concat(transform(sequence(lit(1), length($"w")),
        i => $"w".substr(i, lit(1))), array(lit("</w>"))).as("s"))
  }

  /** Train [[BpeMerges]] merges; output one row per merge:
    * (rank, left_sym, right_sym, merged, weight = the pair's frequency-
    * weighted count at selection time). */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    var words = wordTable(spark, dir).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (k <- 1 to BpeMerges) {
      val (l, r, cnt) = words
        .select($"freq", explode(transform(sequence(lit(1), size($"s") - 1),
          i => struct(element_at($"s", i).as("l"), element_at($"s", i + 1).as("r")))).as("p"))
        .filter($"p.l" =!= $"p.r")
        .groupBy($"p.l".as("l"), $"p.r".as("r")).agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"l".asc, $"r".asc)
        .limit(1).as[(String, String, Long)].head()
      merges += ((k, l, r, l + r, cnt))
      if (k < BpeMerges)
        words = words.select($"freq", applyMerge($"s", l, r).as("s")).localCheckpoint()
    }
    spark.createDataFrame(merges.result())
      .toDF("rank", "left_sym", "right_sym", "merged", "weight")
      .orderBy($"rank")
  }

  /** Tokenize (doc_id, text) rows with a TRAINED merge list — batch or
    * STREAM: the ingest-time application of [[bpeTrain]]'s artifact. Words
    * explode to rows (BPE never merges across a word boundary), each word's
    * char+`</w>` symbols run the merges in rank order as CHAINED PROJECTIONS
    * — one materialized column per merge, deliberately not a folded nested
    * lambda, which would re-evaluate the whole chain per element reference
    * (the [[graft.functions.Text.wordShingles]] pitfall, exponential in the
    * merge count) — and the per-doc reduction counts words and symbols
    * before/after merging, making the learned compression observable. In a
    * stream the reduction is update-mode keyed by doc_id, state bounded by
    * single-batch arrival. */
  def bpeEncodeRows(rows: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words = rows
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"), concat(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))), array(lit("</w>"))).as("s"))
      .withColumn("n0", size(col("s")))
    val encoded = merges.foldLeft(words) { case (df, (l, r)) =>
      df.withColumn("s", applyMerge(col("s"), l, r))
    }
    encoded.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n0")).as("n_char_symbols"),
        sum(size(col("s"))).as("n_bpe_symbols"))
  }
}
