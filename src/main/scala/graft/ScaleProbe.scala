package graft

import org.apache.spark.sql.SparkSession

/** Candidate-volume scaling measurement for the banded/bucketed near-dup
  * operators. For each scale factor given on the command line it reports,
  * per operator: corpus rows N, candidate pairs C (the pre-verification
  * volume the bucketing scheme admits), and verified output rows O.
  *
  * The point: the 100 TB claim for these operators rests on C growing
  * ~linearly with N (planted near-dups scale linearly; background bucket
  * collisions quadratically — a healthy scheme keeps the background term
  * small). Run with two sf dirs and compare C's growth to N's; results are
  * recorded in SCALING.md.
  *
  * Usage: runMain graft.ScaleProbe /root/testdata/sf0.01 /root/testdata/sf0.1
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe <sfDir> [sfDir...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, Similarity}

    args.foreach { dir =>
      val nDocs = graft.sources.Tables.documents(spark, dir).count()
      val nVecs = graft.sources.Tables.embeddings(spark, dir).count()
      val probes: Seq[(String, Long, () => Long, () => Long)] = Seq(
        ("dedup_minhash_lsh", nDocs,
          () => Dedup.minhashCandidates(spark, dir).count(),
          () => Dedup.minhashLsh(spark, dir).count()),
        ("dedup_simhash", nDocs,
          () => Dedup.simhashCandidates(spark, dir).count(),
          () => Dedup.simhash(spark, dir).count()),
        ("dedup_ngram_jaccard", nDocs,
          () => Dedup.ngramCandidates(spark, dir).count(),
          () => Dedup.ngramJaccard(spark, dir).count()),
        ("dedup_contamination", nDocs,
          () => Dedup.contaminationOverlaps(spark, dir).count(),
          () => Dedup.contamination(spark, dir).count()),
        ("dedup_embedding_lsh", nVecs,
          () => Similarity.embeddingCandidates(spark, dir).count(),
          () => Similarity.nearDupEmbedding(spark, dir).count()),
        // semantic dedup: C = within-cell scored pairs (Σ|cell|², ≈ n^1.5
        // by the derived √n stride), O = dropped vectors
        ("dedup_semantic", nVecs,
          () => Similarity.semanticCandidates(spark, dir).count(),
          () => Similarity.semanticDedup(spark, dir).count()),
        // bloom contamination: C = bloom-SURVIVING corpus gram postings
        // (what actually reaches the exact verify join — exact hits plus
        // the deterministic false-positive background), O = flagged docs
        ("dedup_bloom", nDocs,
          () => {
            import org.apache.spark.sql.functions.sum
            Dedup.bloomContamination(spark, dir)
              .agg(sum("n_bloom_hits")).collect()(0).getLong(0)
          },
          () => Dedup.bloomContamination(spark, dir)
            .filter("contaminated").count()),
        // A/B twin pinning the old 2^16 constant: past the fixture floor
        // the derived m must admit MATERIALLY fewer false-positive
        // survivors (at the sparse 40k fixture's 50k-gram benchmark a
        // fixed 2^16 filter is 95% loaded — FPR ≈ 0.82, the filter is
        // effectively transparent)
        ("dedup_bloom_fixed16", nDocs,
          () => {
            import org.apache.spark.sql.functions.sum
            Dedup.bloomContaminationImpl(spark, dir, Some(1 << 16))
              .agg(sum("n_bloom_hits")).collect()(0).getLong(0)
          },
          () => Dedup.bloomContaminationImpl(spark, dir, Some(1 << 16))
            .filter("contaminated").count()),
        // bm25: C = scored (query, doc) pairs from the rare-term postings
        // join (Σ df over idf-pruned query terms), O = emitted top-k rows
        ("text_bm25_topk", nDocs,
          () => graft.operators.TextAnalysis.bm25Candidates(spark, dir).count(),
          () => graft.operators.TextAnalysis.bm25TopK(spark, dir).count()),
        // span dedup: C = total span occurrences through the owner shuffle
        // (linear in corpus tokens by construction), O = dropped spans
        ("dedup_spans", nDocs,
          () => {
            import org.apache.spark.sql.functions.sum
            Dedup.spanDedup(spark, dir)
              .agg(sum("n_spans")).collect()(0).getLong(0)
          },
          () => {
            import org.apache.spark.sql.functions.sum
            Dedup.spanDedup(spark, dir)
              .agg(sum("n_dropped")).collect()(0).getLong(0)
          }),
        // A/B twins pinning the old compile-time constants (8-bit LSH bands,
        // 4×12 simhash): past fixture scale the derived widths must admit
        // MATERIALLY fewer background candidates than these — the measured
        // evidence that the log₂(N) band-width derivation closes r3's
        // "constants don't scale" gap. At fixture scale forced == derived
        // and the twins cost nothing new.
        ("dedup_embedding_lsh_fixed8", nVecs,
          () => Similarity.embeddingCandidates(spark, dir, Some(8)).count(),
          () => Similarity.nearDupEmbeddingImpl(spark, dir, Some(8)).count()),
        ("dedup_simhash_fixed12", nDocs,
          () => Dedup.simhashCandidates(spark, dir, Some(12)).count(),
          () => Dedup.simhashCandidates(spark, dir, Some(12))
            .filter(s"hamming <= ${Dedup.HammingThreshold}").count())
      )
      // SPARK_GRAFT_PROBE_ONLY=a,b (local tuning): restrict to named probes
      val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      only.fold(probes)(s => probes.filter(p => s(p._1))).foreach { case (name, n, cand, out) =>
        val c = cand()
        val o = out()
        println(s"""{"probe":"$name","sf":"$dir","corpus":$n,"candidates":$c,"output":$o}""")
        graft.sources.Caches.releaseAll()
      }
    }
    spark.stop()
  }
}
