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
  * O(1) in rounds. A production run training 30k merges batches
  * non-interacting top-k pairs per round to amortize round latency — same
  * plan shape, ~k× fewer rounds, shipped as [[bpeTrainBatched]];
  * [[BpeMerges]] = 6 keeps the oracle's unrolled SQL finite. */
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
  def bpeTrain(spark: SparkSession, dir: String): DataFrame =
    // memoized: a trained tokenizer is THE canonical train-once artifact —
    // every downstream encode reuses the merge table; the driver-side merge
    // loop (one aggregation action per merge) re-ran per invocation only
    // because its localCheckpoint lineage defeats plan-equality sharing.
    graft.sources.Caches.memoized(spark, s"text-bpe-merges|$dir") {
      bpeTrainImpl(spark, dir)
    }

  private def bpeTrainImpl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    var words = wordTable(spark, dir).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (k <- 1 to BpeMerges) {
      // fully-merged single-symbol words contribute no pairs and must not
      // reach the fan-out (sequence(1, 0) descends and element_at walks
      // out of bounds — latent until a long training run collapses a word)
      val (l, r, cnt) = words.filter(size($"s") >= 2)
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

  /** Candidate pool multiplier for [[bpeTrainBatched]]: each round collects
    * the top `BatchPoolFactor`·k candidates and greedily packs up to k
    * non-interacting ones — a deeper pool survives dense interaction
    * clusters without another aggregation pass. */
  val BatchPoolFactor = 8

  /** Two merge pairs INTERACT when simultaneous application from one count
    * table is not equivalent to sequential application: (1) one's right
    * symbol is the other's left — their matches can share a position (in
    * `x a b`, (x,a) and (a,b) overlap at the `a`), which is also when
    * applying one destroys occurrences of the other; (2) one's MERGED
    * symbol is a component of the other — applying (ab,c)→"abc" CREATES
    * occurrences of a pair like (x,"abc") if the symbol "abc" already
    * exists in the vocabulary, so the latter's pooled count is stale; (3)
    * both produce the same merged string (symbol-identity conflation).
    * Pairwise non-interacting pairs have provably disjoint matches and
    * invariant counts, so a whole batch applies from ONE count table with
    * each member's weight exactly what sequential training would have
    * recorded. */
  private[graft] def interacts(a: (String, String), b: (String, String)): Boolean = {
    val (ma, mb) = (a._1 + a._2, b._1 + b._2)
    a._2 == b._1 || b._2 == a._1 ||
      ma == b._1 || ma == b._2 || mb == a._1 || mb == a._2 || ma == mb
  }

  /** Batched BPE training — the production round structure for 30k-merge
    * runs: per round, ONE pair-count aggregation (the [[bpeTrain]] plan),
    * one bounded collect of the top [[BatchPoolFactor]]·k candidates, and
    * a greedy pack of up to k pairwise non-interacting pairs applied as k
    * chained projections before the next count. Driver round-trips drop
    * from `nMerges` to ~`nMerges`/k (SCALING.md records the measured
    * round count at the 1k-merge demo scale).
    *
    * Exactness: within a batch, non-interaction makes member counts
    * invariant under the other members' application (see [[interacts]]),
    * so selected weights equal sequential training's. The divergence
    * window is selection ORDER at the batch boundary, two ways: a pair
    * CREATED by an earlier batch member (containing its merged symbol) can
    * out-rank a later member — sequential training would pick the created
    * pair first — and a pre-existing candidate skipped for interacting
    * with a selected member is deferred even where sequential training
    * would still pick it next at its post-merge count. Both cases push the
    * candidate to the next round's count table. Tail-order drift bounded
    * by the batch width, zero on the
    * fixture (`TokenizerSpec` pins batched ≡ sequential there), and the
    * standard trade of every batched BPE trainer. */
  def bpeTrainBatched(spark: SparkSession, dir: String,
      nMerges: Int = BpeMerges, batchK: Int = 2): DataFrame = {
    import spark.implicits._
    // a non-positive k would spin the round loop forever (each iteration
    // packs an empty batch and re-runs the full pair count) — fail loudly
    require(batchK >= 1, s"batchK must be >= 1, got $batchK")
    var words = wordTable(spark, dir).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var rounds = 0
    while (rank < nMerges) {
      val pool = words.filter(size($"s") >= 2) // the bpeTrain guard
        .select($"freq", explode(transform(sequence(lit(1), size($"s") - 1),
          i => struct(element_at($"s", i).as("l"), element_at($"s", i + 1).as("r")))).as("p"))
        .filter($"p.l" =!= $"p.r")
        .groupBy($"p.l".as("l"), $"p.r".as("r")).agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"l".asc, $"r".asc)
        .limit(BatchPoolFactor * batchK).as[(String, String, Long)].collect()
      if (pool.isEmpty) { rank = nMerges }
      else {
        val batch = pool.foldLeft(Vector.empty[(String, String, Long)]) {
          case (acc, cand) =>
            if (acc.size >= math.min(batchK, nMerges - rank)) acc
            else if (acc.exists(s => interacts((s._1, s._2), (cand._1, cand._2)))) acc
            else acc :+ cand
        }
        batch.foreach { case (l, r, cnt) =>
          rank += 1
          merges += ((rank, l, r, l + r, cnt))
        }
        if (rank < nMerges)
          words = batch.foldLeft(words) { case (df, (l, r, _)) =>
            df.select($"freq", applyMerge($"s", l, r).as("s"))
          }.localCheckpoint()
        rounds += 1
      }
    }
    System.err.println(s"[graft] bpe batched: ${merges.result().size} merges " +
      s"in $rounds rounds (k=$batchK)")
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
