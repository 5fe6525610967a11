package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Text._

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH, SimHash, and blocked n-gram Jaccard.
  * (Embedding-cosine near-dup lives in [[Similarity]] with the vector ops.)
  *
  * Scale design notes (the 100 TB posture, per operator):
  *  - exact: one hash-partitioned groupBy on the dedup key — the minimal
  *    possible shuffle; at scale the key would be a content digest computed
  *    at ingest so the shuffle payload is the digest, not the document.
  *  - MinHash: signatures are computed per-row with pure array expressions —
  *    NO shuffle, no explode of shingles through an exchange. The only
  *    shuffles are (a) the band-bucket self-join on (band, signature) and
  *    (b) candidate-pair verification, both of which move candidate rows
  *    only (LSH keeps candidates ~linear in the number of true near-dups).
  *  - SimHash: same shape — per-row signature, then a banded self-join on
  *    16-bit signature halves; hamming verification on the pairs.
  *  - n-gram Jaccard: blocked by document length band (near-dups can't
  *    differ much in length), turning the O(n²) pair space into
  *    O(n · block_width). Blocks are equi-join keys ⇒ hash-partitioned.
  */
object Dedup {

  /** Exact dedup by key columns: hash-groupBy keeping the smallest doc_id as
    * the surviving representative plus the duplicate cardinality. */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang", $"source")
      .agg(min($"doc_id").as("representative"), count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"source")
  }

  // ---------------------------------------------------------------- MinHash

  val MinhashPerms = 16   // H
  val MinhashBands = 4    // B bands of R = H/B rows
  val MinhashRows  = MinhashPerms / MinhashBands
  val JaccardThreshold = 0.8

  /** Large prime > 2^32 for the double-hash permutation family. */
  val MinhashPrime = 4294967311L

  /** Docs with word-3-gram hashes + MinHash signature + LSH band keys.
    *
    * Hashing: ONE md5 per shingle yields two independent 32-bit values
    * (h1 = hex[1..8], h2 = hex[9..16]); permutation i is h_i = (h1 + i·h2)
    * mod p — the standard 2-universal construction. Shingling + hashing +
    * the signature loop are fused in the native codegen'd
    * [[graft.functions.MinhashFromTokens]] kernel, and the verification gram
    * set is the sorted distinct hash60s from
    * [[graft.functions.WordGramHashes]] — no shingle string is materialized
    * (the oracle SQL carries the equivalent list-comprehension form). */
  private def signed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir))
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id",
        graft.functions.WordGramHashes($"toks", 3).as("grams"),
        graft.functions.MinhashFromTokens(
          $"toks", 3, MinhashPerms, MinhashPrime).as("sig"))
      .withColumn("bands", transform(sequence(lit(0), lit(MinhashBands - 1)),
        b => struct(b.as("band"),
          concat_ws(",", transform(slice($"sig", b * MinhashRows + 1, lit(MinhashRows)),
            x => x.cast("string"))).as("key"))))
  }

  /** MinHash+LSH near-duplicate pairs: shingle → minhash → band → bucket
    * self-join → exact-Jaccard verification ≥ 0.8. Output (id_a < id_b,
    * exact jaccard as int/int division — engine-exact). Verification runs
    * over the sorted distinct gram hashes (merge-walk intersection,
    * |A∪B| = |A|+|B|−|A∩B|), which equals the oracle's string-set Jaccard
    * exactly absent 60-bit collisions. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    minhashVerified(spark, dir).orderBy($"id_a", $"id_b")
  }

  /** Verified near-dup pairs, unsorted — [[clusters]] consumes this directly
    * so the graph build doesn't pay minhashLsh's presentation sort. */
  private def minhashVerified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // signatures are md5-heavy: materialize once, reuse for buckets + verify
    val docs = graft.sources.Caches.shared(signed(spark, dir))
    val buckets = docs.select($"doc_id", explode($"bands").as("b"))
      .select($"doc_id", $"b.band", $"b.key")
    val candidates = buckets.as("x").join(buckets.as("y"),
        $"x.band" === $"y.band" && $"x.key" === $"y.key" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("id_a"), $"y.doc_id".as("id_b"))
      .distinct()
    val a = docs.select($"doc_id".as("id_a"), $"grams".as("gr_a"), size($"grams").as("na"))
    val b = docs.select($"doc_id".as("id_b"), $"grams".as("gr_b"), size($"grams").as("nb"))
    val inter = graft.functions.IntersectCardinality($"gr_a", $"gr_b")
    candidates.join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard",
        inter.cast("double") / (($"na" + $"nb") - inter).cast("double"))
      .filter($"jaccard" >= JaccardThreshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /** Near-duplicate CLUSTERS: connected components over the MinHash pair
    * graph, labeling every clustered doc with its component's minimum doc_id
    * (the survivor). Iterative min-label propagation to fixpoint — the graph
    * is the PAIR graph (sparse: ~|true near-dups|), not the corpus, and
    * near-dup components are shallow (pairs/triples), so iterations ≈
    * component diameter ≈ 2-4. At 100 TB the same loop is the standard
    * large-star/small-star connected-components; each iteration is one
    * shuffle on doc_id. Lineage is cut per iteration (localCheckpoint). */
  def clusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = graft.sources.Caches.shared(
      minhashVerified(spark, dir).select($"id_a", $"id_b"))
    val sym = edges.union(edges.select($"id_b", $"id_a")).toDF("src", "dst")
    var labels = edges.select(explode(array($"id_a", $"id_b")).as("doc_id"))
      .distinct()
      .withColumn("label", $"doc_id")
      .localCheckpoint()
    var iter = 0
    var changed = true
    while (changed && iter < 20) {
      val prop = sym.join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy($"dst").agg(min($"label").as("nlabel"))
        .withColumnRenamed("dst", "doc_id")
      // carry a changed flag instead of re-joining old vs new labels — the
      // convergence check is then a count on already-checkpointed data (no
      // extra shuffle per iteration)
      val next = labels.join(prop, Seq("doc_id"), "left")
        .select($"doc_id",
          least($"label", coalesce($"nlabel", $"label")).as("label"),
          (coalesce($"nlabel", $"label") < $"label").as("chg"))
        .localCheckpoint()
      changed = next.filter($"chg").limit(1).count() > 0
      labels = next.select($"doc_id", $"label")
      iter += 1
    }
    labels.select($"doc_id", $"label".as("cluster_rep")).orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- SimHash

  val SimhashBits = 48
  val HammingThreshold = 3

  /** SimHash near-duplicate pairs: per-doc 48-bit signature (native
    * codegen'd kernel [[graft.functions.SimhashSignature]]; bit j is the
    * sign of Σ ±1 by bit j of each token's 48-bit hash), banded self-join on
    * the three 16-bit slices (a pair within hamming ≤ 2 must agree exactly
    * on at least one slice; hamming 3 recall is partial by design — a
    * documented approximation, identical on both engines). 48 bits (not 64)
    * keeps floor(h/2^j) exact in the oracle's double arithmetic. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // HashArray60 yields 60-bit hashes; the signature reads bits 0..47 only,
    // so the values match the oracle's (hash60 % 2^48) formulation exactly
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select($"doc_id", graft.functions.HashArray60(tokens($"text")).as("hs"))
      .select($"doc_id",
        graft.functions.SimhashSignature($"hs", SimhashBits).as("sim"))
    val cached = graft.sources.Caches.shared(docs)
    val parts = cached.select($"doc_id", $"sim",
        explode(array(
          struct(lit(0).as("part"), shiftright($"sim", 32).as("key")),
          struct(lit(1).as("part"), (shiftright($"sim", 16) % 65536).as("key")),
          struct(lit(2).as("part"), ($"sim" % 65536).as("key")))).as("p"))
      .select($"doc_id", $"sim", $"p.part", $"p.key")
    parts.as("x").join(parts.as("y"),
        $"x.part" === $"y.part" && $"x.key" === $"y.key" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("id_a"), $"y.doc_id".as("id_b"),
        bit_count($"x.sim".bitwiseXOR($"y.sim")).as("hamming"))
      .distinct()
      .filter($"hamming" <= HammingThreshold)
      .orderBy($"id_a", $"id_b")
  }

  // -------------------------------------------------- benchmark decontamination

  val ContamBenchStride = 50
  val ContamGram = 8
  val ContamMinShared = 8

  /** Benchmark decontamination: flag corpus documents sharing ≥ 8 distinct
    * word-8-grams with any "benchmark" document (here every 50th doc stands
    * in for the held-out eval set). The canonical pre-training hygiene pass:
    * eval-set n-grams must not leak into training data. High-order grams on
    * purpose (GPT-3 used 13-grams, Llama-family ~8): chance 8-gram
    * collisions are ~0, so any match is a real contamination signal —
    * low-order grams would drown in vocabulary-level background overlap.
    *
    * Scale shape: the benchmark set is SMALL by definition, so its exploded
    * (gram, bench_id) postings are broadcast; the corpus is exploded to
    * grams once and map-side inner-joined against that broadcast — rows that
    * match no benchmark gram (the overwhelming majority) die before any
    * exchange, and the only shuffle is the partial-aggregated overlap count
    * on (doc_id, bench_id). The corpus itself is never shuffled. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grams = Tables.spread(Tables.documents(spark, dir))
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= ContamGram)
      .select($"doc_id",
        graft.functions.WordGramHashes($"toks", ContamGram).as("grams"))
      .withColumn("ng", size($"grams"))
    val bench = grams.filter($"doc_id" % ContamBenchStride === 0)
      .select($"doc_id".as("bench_id"), explode($"grams").as("gram"))
    val corpus = grams.filter($"doc_id" % ContamBenchStride =!= 0)
      .select($"doc_id", $"ng", explode($"grams").as("gram"))
    corpus.join(broadcast(bench), "gram")
      .groupBy($"doc_id", $"ng", $"bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= ContamMinShared)
      .select($"doc_id", $"bench_id", $"n_shared",
        ($"n_shared".cast("double") / $"ng".cast("double")).as("overlap_frac"))
      .orderBy($"doc_id", $"bench_id")
  }

  /** Streaming twin of [[contamination]]: a STREAM of documents checked
    * against the static benchmark postings — a stream-static join, the shape
    * of online ingest hygiene (docs flagged as they arrive, before landing
    * in the training corpus). The static side is broadcast; per micro-batch
    * the stream is exploded to gram postings, map-side joined, and the
    * overlap count aggregated in update mode (state keyed by
    * (doc_id, bench_id) — bounded because a doc's grams all arrive in one
    * batch; production would add a watermark on an ingest timestamp).
    *
    * `bench`: static (bench_id, gram) postings, e.g.
    * `contaminationBenchPostings`. Stream schema: (doc_id, text). */
  def contaminationStream(docStream: DataFrame, bench: DataFrame): DataFrame = {
    val grams = docStream
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= ContamGram)
      .select(col("doc_id"),
        explode(graft.functions.WordGramHashes(col("toks"), ContamGram)).as("gram"))
    grams.join(broadcast(bench), "gram")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= ContamMinShared)
  }

  /** The static benchmark postings for [[contaminationStream]]. */
  def contaminationBenchPostings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" % ContamBenchStride === 0)
      .select($"doc_id".as("bench_id"), tokens($"text").as("toks"))
      .filter(size($"toks") >= ContamGram)
      .select($"bench_id",
        explode(graft.functions.WordGramHashes($"toks", ContamGram)).as("gram"))
  }

  // ------------------------------------------------------- n-gram Jaccard

  val LenBand = 16
  val NgramThreshold = 0.8

  /** Blocked word-bigram Jaccard near-dup: documents are bucketed by length
    * band (|Δ n_chars| ≤ 16 for candidates — near-dups can't change length
    * much); the right side is replicated to its 3 neighboring bands so the
    * pair search is a pure equi-join on the band key (shuffle on band, no
    * cross product). Verification is exact Jaccard over hash60'd bigrams —
    * long-array intersection, with |A∪B| = |A|+|B|−|A∩B| so only the
    * intersection is materialized. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // grams emerge from the fused kernel already sorted + distinct, so the
    // pairwise intersection is a native merge-walk (IntersectCardinality)
    // instead of a hash set per pair
    val docs = graft.sources.Caches.shared(
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", $"n_chars", tokens($"text").as("toks"))
        .filter(size($"toks") >= 2)
        .select($"doc_id", $"n_chars",
          graft.functions.WordGramHashes($"toks", 2).as("grams"))
        .withColumn("ng", size($"grams")))
    val left = docs.withColumn("band", ($"n_chars" / LenBand).cast("long"))
    val right = docs.select($"doc_id".as("id_b"), $"n_chars".as("nc_b"),
        $"grams".as("gr_b"), $"ng".as("ng_b"),
        explode(array((-1 to 1).map(d => ($"n_chars" / LenBand).cast("long") + d): _*)).as("band"))
    val inter = graft.functions.IntersectCardinality($"grams", $"gr_b")
    val jac = inter.cast("double") / (($"ng" + $"ng_b") - inter).cast("double")
    // size-ratio prefilter: J = i/(na+nb-i) ≤ min/max, so min/max < τ can
    // never reach the threshold — prune BEFORE the set intersection. For
    // τ = 0.8 in exact integers: 5·min ≥ 4·max. Purely physical; the oracle
    // keeps the plain formulation.
    //
    // The jaccard threshold lives INSIDE the join condition, after the cheap
    // conjuncts: a separate post-join .filter gets merged by Catalyst as
    // And(filter, joinCond), which evaluates the O(|grams|) intersection
    // FIRST for every band collision. Inline ordering keeps the And
    // short-circuit cheap-first (PlanSpec pins this); the projection
    // recomputes the intersection only for final survivors.
    left.join(right,
        left("band") === right("band") && left("doc_id") < right("id_b") &&
          abs(left("n_chars") - right("nc_b")) <= LenBand &&
          least(left("ng"), right("ng_b")) * 5 >= greatest(left("ng"), right("ng_b")) * 4 &&
          jac >= NgramThreshold)
      .select($"doc_id".as("id_a"), $"id_b", jac.as("jaccard"))
      .orderBy($"id_a", $"id_b")
  }
}
