package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Semantic checks for the dedup + similarity + text-analysis operators that
  * go beyond the DuckDB hash-compare: known planted near-duplicates must be
  * found, backgrounds must not be, and approximations must behave as
  * documented. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("minhash-lsh finds planted near-dup pairs and no low-jaccard pairs") {
    val pairs = Dedup.minhashLsh(spark, dir)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    // every reported pair really is >= threshold
    assert(pairs.forall(_._3 >= Dedup.JaccardThreshold))
    // a known planted pair (verified against the fixture by direct Jaccard)
    assert(pairs.forall { case (a, b, _) => a < b })
  }

  test("minhash-lsh agrees with exhaustive jaccard on which pairs exist") {
    import graft.functions.Text._
    // exhaustive ground truth at sf0.001 (500 docs → 125k pairs, fine locally)
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", wordShingles(tokens($"text")).as("sh"))
    val truth = docs.as("a").join(docs.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        jaccard($"a.sh", $"b.sh").as("j"))
      .filter($"j" >= Dedup.JaccardThreshold)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val found = Dedup.minhashLsh(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // LSH with 4x4 bands at j>=0.8: P(miss) = (1-j^4)^4 <= 4e-5 — expect
    // exact agreement on this fixture
    assert(found == truth)
  }

  test("simhash emits only pairs within the hamming threshold") {
    val rows = Dedup.simhash(spark, dir)
      .select($"hamming").as[Int].collect()
    assert(rows.nonEmpty && rows.forall(h => h >= 0 && h <= Dedup.HammingThreshold))
  }

  test("wide simhash banding is complete: banded pairs equal the " +
      "all-pairs recompute at the same signatures") {
    // ground truth: all-pairs hamming over the SAME two signature words
    // (500 docs → 125k pairs locally) — any pair the 4-band split misses
    // is a completeness bug, any extra pair a key-collision leak past the
    // hamming filter
    val bandBits = 12 // the fixture floor Dedup.simhashWideBandBits derives
    val wordBits = 2 * bandBits
    val sigs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", graft.functions.Text.tokens($"text").as("toks"))
      .select($"doc_id",
        graft.functions.SimhashSignature(
          graft.functions.HashArray60($"toks"), wordBits).as("sa"),
        graft.functions.SimhashSignature(
          graft.functions.HashArray60(
            transform($"toks", t => concat(lit("w2|"), t))),
          wordBits).as("sb"))
    val truth = sigs.as("a").join(sigs.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        (bit_count($"a.sa".bitwiseXOR($"b.sa")) +
          bit_count($"a.sb".bitwiseXOR($"b.sb"))).as("h"))
      .filter($"h" <= Dedup.HammingThreshold)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val found = Dedup.simhashWide(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(found == truth,
      s"banded ${found.size} pairs vs all-pairs ${truth.size}")
    assert(found.nonEmpty, "the planted fixture must yield wide near-dups")
    // the width derivation: fixture floor 12, and the cap binds at 24
    // (2^27-doc knee) instead of the narrow scheme's 15 (2^18 knee)
    assert(Dedup.simhashWideBandBits(500) == 12)
    assert(Dedup.simhashWideBandBits(200000) == 15)
    assert(Dedup.simhashWideBandBits(1L << 30) == 24)
    assert(Dedup.simhashBandBits(1L << 30) == 15)
  }

  test("simhashAuto dispatches the scheme at the narrow cap's knee and " +
      "equals the narrow operator below it") {
    // the crossover, pinned exactly: the narrow derivation is unclipped
    // up to N = 2^18 (⌈log₂N⌉ − 3 = 15 = the cap) and CLIPS one doc past
    // it — the dispatch must flip at that boundary, not near it
    assert(Dedup.simhashBandBits(1L << 18) == 15)
    assert(Dedup.simhashBandBits((1L << 18) + 1) == 15,
      "one past the knee the narrow derivation clips (silently, pre-auto)")
    assert(Dedup.simhashWideBandBits((1L << 18) + 1) == 16,
      "the wide derivation keeps deriving where the narrow one clips")
    assert(!Dedup.simhashUseWide(1L << 18),
      "at the knee the narrow scheme is still unclipped — keep it")
    assert(Dedup.simhashUseWide((1L << 18) + 1),
      "one past the knee the dispatch must select the wide scheme")
    assert(!Dedup.simhashUseWide(500) && Dedup.simhashUseWide(1L << 27))
    // below the knee the dispatched operator IS the narrow operator —
    // row-for-row (the shared-oracle claim dedup_simhash_auto rests on)
    val auto = Dedup.simhashAuto(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    val narrow = Dedup.simhash(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    assert(auto == narrow,
      "simhashAuto below the knee must equal the narrow operator exactly")
    assert(auto.nonEmpty)
  }

  test("ngram jaccard respects the length-band contract") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars".as("nc"))
    val pairs = Dedup.ngramJaccard(spark, dir)
    val joined = pairs
      .join(docs.withColumnRenamed("doc_id", "id_a").withColumnRenamed("nc", "nc_a"), "id_a")
      .join(docs.withColumnRenamed("doc_id", "id_b").withColumnRenamed("nc", "nc_b"), "id_b")
      .select(abs($"nc_a" - $"nc_b").as("d")).as[Long].collect()
    assert(joined.nonEmpty && joined.forall(_ <= Dedup.LenBand))
  }

  test("brute-force topk returns k ranked neighbors per query") {
    val rows = Similarity.topkBruteForce(spark, dir)
      .groupBy($"query_id").agg(count(lit(1)).as("n"), max($"rank").as("maxr"))
      .as[(Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, n, maxr) => n == Similarity.TopK && maxr == Similarity.TopK })
  }

  test("ivf topk is a subset-quality approximation of brute force") {
    val brute = Similarity.topkBruteForce(spark, dir)
      .filter($"rank" === 1).select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toMap
    val ivf = Similarity.topkIvf(spark, dir)
      .filter($"rank" === 1).select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toMap
    // IVF probes 2/|cells| of the corpus; its rank-1 either matches brute
    // force or is a different (lower-cosine) vector — but never a vector
    // brute force scored higher than brute's rank-1 (sanity of scoring).
    assert(ivf.keySet == brute.keySet)
  }

  test("pq topk: exact-cosine values, and rerank recall@10 vs brute force >= 0.7") {
    val brute = Similarity.topkBruteForce(spark, dir)
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    val pq = Similarity.topkPq(spark, dir)
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    // the re-rank stage reports EXACT cosines: any (query, neighbor) pair
    // both lists carry must agree bit-for-bit
    val bruteCos = brute.map(r => (r._1, r._2) -> r._3).toMap
    assert(pq.collect { case (q, n, c) if bruteCos.contains((q, n)) =>
      c == bruteCos((q, n)) }.forall(identity))
    // recall@10 floor (measured 0.76 on this fixture; 62 seeded codes vs
    // near-random vectors is PQ's worst case — rerank carries the recall)
    val bruteSets = brute.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val pqSets = pq.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(pqSets.keySet == bruteSets.keySet)
    val recalls = bruteSets.map { case (q, bs) =>
      (bs & pqSets(q)).size.toDouble / Similarity.TopK }
    assert(recalls.sum / recalls.size >= 0.7, s"mean recall ${recalls.sum / recalls.size}")
  }

  test("ivf-pq topk: exact-cosine values, subset of probed cells, recall floor vs ivf") {
    val ivfpq = Similarity.topkIvfPq(spark, dir)
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    // re-rank reports EXACT cosines — agree bit-for-bit with brute force
    // wherever both lists carry the pair
    val bruteCos = Similarity.topkBruteForce(spark, dir)
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(ivfpq.nonEmpty)
    assert(ivfpq.collect { case (q, n, c) if bruteCos.contains((q, n)) =>
      c == bruteCos((q, n)) }.forall(identity))
    // the IVF stage bounds the candidate set: every reported neighbor must
    // also be reachable by plain IVF's scan (same cells, exact scoring) —
    // PQ can only LOSE candidates to its shortlist, never add cells
    val ivfSets = Similarity.topkIvf(spark, dir)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val pqSets = ivfpq.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(pqSets.keySet == ivfSets.keySet)
    // recall@10 of the composition vs the IVF-only scan (isolates the PQ
    // shortlist loss from the cell-probing loss); floor measured on fixture
    val recalls = ivfSets.map { case (q, is) =>
      (is & pqSets(q)).size.toDouble / math.min(Similarity.TopK, is.size) }
    assert(recalls.sum / recalls.size >= 0.6, s"mean recall ${recalls.sum / recalls.size}")
  }

  test("nprobe sweep: recall climbs monotonically to 1.0 at full cell coverage") {
    // the recall/cost frontier an IVF deployment tunes: more probed cells
    // ⇒ candidate supersets ⇒ recall vs exact truth is non-decreasing,
    // reaching 1.0 when every cell is probed (the scan degenerates to
    // brute force). sf0.001 derives ≤ 3 cells, so nprobe 3 = exhaustive.
    val truth = Similarity.topkBruteForce(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val frontier = (1 to 3).map { np =>
      val got = Similarity.topkIvfWith(spark, dir, np)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = truth.map { case (k, ts) =>
        (ts & got.getOrElse(k, Set())).size.toDouble / ts.size }
      np -> rs.sum / rs.size
    }
    System.err.println(s"[graft] ivf nprobe frontier: " +
      frontier.map { case (np, r) => f"$np -> $r%.3f" }.mkString(", "))
    frontier.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(b >= a - 1e-9, s"recall must not drop with more probes: $frontier")
    }
    assert(frontier.last._2 == 1.0, s"full coverage must be exact: $frontier")
  }

  test("ivf hard negatives: label contract holds and recall floor vs the exact scan") {
    val exact = Similarity.hardNegatives(spark, dir)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val ivf = Similarity.hardNegativesIvf(spark, dir)
      .select($"query_id", $"anchor_label", $"neighbor_id", $"neg_label")
      .as[(Long, Int, Long, Int)].collect()
    assert(ivf.nonEmpty)
    // the label-mismatch predicate holds on every emitted row
    assert(ivf.forall { case (_, al, _, nl) => al != nl })
    val ivfSets = ivf.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    assert(ivfSets.keySet == exact.keySet.toSet)
    // hard negatives live NEAR the anchor — the anchor's probed cells hold
    // most of them; floor measured on the fixture (the sim_ann_recall
    // methodology applied to the mining variant)
    val recalls = exact.map { case (q, es) =>
      (es & ivfSets(q)).size.toDouble / es.size }
    assert(recalls.sum / recalls.size >= 0.5, s"mean recall ${recalls.sum / recalls.size}")
  }

  test("hybrid rrf ann: shared lexical leg, ANN dense leg, overlap floor vs exact fusion") {
    val exact = Similarity.hybridRrf(spark, dir)
      .select($"query_id", $"doc_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val ann = Similarity.hybridRrfAnn(spark, dir)
      .select($"query_id", $"doc_id", $"lex_rank", $"sem_rank")
      .as[(Long, Long, Int, Int)].collect()
    assert(ann.nonEmpty)
    // the lexical leg is SHARED: wherever the ANN fusion reports a lex rank
    // it must be bm25's own rank for that (query, doc)
    val lex = TextAnalysis.bm25TopK(spark, dir)
      .select($"query_id", $"doc_id", $"rank")
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(ann.forall { case (q, d, lr, _) => lr == lex.getOrElse((q, d), 0) })
    // the dense leg is the IVFADC index: its ranks are topkIvfPq's own
    val dense = Similarity.topkIvfPq(spark, dir)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(ann.forall { case (q, d, _, sr) => sr == dense.getOrElse((q, d), 0) })
    // fused-list overlap floor vs the exact-leg fusion (the ANN legs'
    // own recall floors ride the PQ specs; fusion can only dampen the
    // difference — the lexical half is identical)
    val annSets = ann.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(annSets.keySet == exact.keySet.toSet)
    val overlaps = exact.map { case (q, es) =>
      (es & annSets(q)).size.toDouble / es.size }
    assert(overlaps.sum / overlaps.size >= 0.6, s"mean overlap ${overlaps.sum / overlaps.size}")
  }

  test("k-means-refined PQ codebook: error non-increasing, recall@10 >= strided seeds past the knee") {
    // the sparse probe point's embedding side (the ScaleFixture generator
    // arithmetic, 20k iid vectors — PQ's worst case and the scale where
    // pqStride leaves its fixture floor, so the refined path is exactly
    // the production regime the strided oracle no longer covers)
    val nVecs = 20000L
    import graft.functions.HashKernels.h60
    val c = graft.sources.Caches.shared(spark.range(nVecs).as[Long].map { i =>
        val v = Array.tabulate(Similarity.Dims) { d =>
          ((h60(s"vec|$i|$d") % 2001L) - 1000L).toDouble / 1000.0 }
        (i, v.toSeq, math.sqrt(v.map(x => x * x).sum))
      }.toDF("vec_id", "v", "nrm"))
    val q = Similarity.strideQueries(c)
    val cb0 = Similarity.pqCodebook(c, Similarity.pqStride(nVecs))
    val (cb1, errs) = Similarity.pqRefineCodebook(c, cb0)
    // Lloyd's guarantee: per-round quantization error never increases,
    // and training genuinely moves the codebook (strict first-round drop)
    assert(errs.size >= 2, s"rounds: $errs")
    assert(errs.zip(errs.tail).forall { case (a, b) => b <= a + 1e-9 }, s"errs: $errs")
    assert(errs.last < errs.head * 0.999, s"no real improvement: $errs")
    // recall@10 vs exact ground truth: the refined codebook must hold or
    // beat the strided seeds (it optimizes exactly the quantization error
    // the ADC ordering runs on)
    val truth = Similarity.topkBruteForceFor(c, q)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(cb: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.pqRerank(c, q, Similarity.pqAdcScanFor(c, q, cb))
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = truth.map { case (k, ts) => (ts & got.getOrElse(k, Set())).size.toDouble / ts.size }
      rs.sum / rs.size
    }
    val rSeed = recallOf(cb0)
    val rRefined = recallOf(cb1)
    System.err.println(f"[graft] pq refine @${nVecs}: err ${errs.head}%.4f -> " +
      f"${errs.last}%.4f over ${errs.size} rounds, recall@10 seed $rSeed%.4f " +
      f"-> refined $rRefined%.4f")
    // deterministic fixture + deterministic training ⇒ pin the measured
    // IMPROVEMENT, not just non-regression (measured 0.52 → 0.635)
    assert(rRefined >= rSeed + 0.05, s"refined $rRefined vs strided $rSeed")
  }

  test("lloyd-refined IVF cells: recall-per-probe beats strided seeds past the knee") {
    // the sparse probe point (the ScaleFixture generator arithmetic —
    // SPARK_GRAFT_IVF_REFINE_N overrides for the SCALING.md 40k row);
    // strided seeds are the oracled behavior below the ivfCellStride knee,
    // Lloyd-trained cells the production surface above it — the IVF mirror
    // of the PQ-codebook refinement test above
    val nVecs = sys.env.get("SPARK_GRAFT_IVF_REFINE_N").map(_.toLong).getOrElse(20000L)
    import graft.functions.HashKernels.h60
    // CLUSTERED fixture (unlike the iid one the PQ test uses): vectors sit
    // around 150 planted centers with ±0.3 noise — the structure real
    // embedding corpora have and a trained coarse quantizer exists to find.
    // On structureless iid vectors Lloyd has nothing to learn and measured
    // recall-per-probe does NOT improve (−0.027 at this probe point) — the
    // honest boundary of the claim, stated here rather than hidden.
    val nClusters = 150
    val c = graft.sources.Caches.shared(spark.range(nVecs).as[Long].map { i =>
        val cl = (h60(s"cl|$i") % nClusters).toInt
        val v = Array.tabulate(Similarity.Dims) { d =>
          val center = ((h60(s"ctr|$cl|$d") % 2001L) - 1000L).toDouble / 1000.0
          val noise = ((h60(s"nz|$i|$d") % 601L) - 300L).toDouble / 1000.0
          center + noise
        }
        (i, v.toSeq, math.sqrt(v.map(x => x * x).sum))
      }.toDF("vec_id", "v", "nrm"))
    val q = Similarity.strideQueries(c)
    val seeds = Similarity.centroids(c, Similarity.ivfCellStride(nVecs))
    val (cents, _, rounds) = Similarity.kmeansRounds(c, seeds, Similarity.KmeansEps, 4)
    // training genuinely moves and settles: assignment inertia never rises
    assert(rounds.nonEmpty)
    assert(rounds.map(_._2).sliding(2).forall {
      case Seq(a, b) => b <= a + 1e-6; case _ => true }, rounds.toString)
    val truth = Similarity.topkBruteForceFor(c, q)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(cc: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.topkIvfFor(c, cc, q, Similarity.NProbe)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = truth.map { case (k, ts) => (ts & got.getOrElse(k, Set())).size.toDouble / ts.size }
      rs.sum / rs.size
    }
    val rSeed = recallOf(seeds)
    val rRefined = recallOf(cents)
    System.err.println(f"[graft] ivf refine @${nVecs}: ${rounds.size} rounds, " +
      f"recall@10/nprobe=${Similarity.NProbe} seed $rSeed%.4f -> refined $rRefined%.4f")
    // deterministic fixture + deterministic training ⇒ pin the measured
    // improvement at the default 20k point (measured in SCALING.md)
    if (nVecs == 20000L) assert(rRefined >= rSeed + 0.03,
      s"refined $rRefined vs strided $rSeed")
    else assert(rRefined >= rSeed - 1e-9, s"refined $rRefined vs strided $rSeed")
  }

  test("oracled refined-recall harness: refined holds or beats seeded on the fixture") {
    // the ORACLED surface of the refinement claim (fixed 2 Lloyd rounds,
    // hash-compared against DuckDB by the driver) must itself show
    // refined >= seeded in the mean — the sparse-probe test above pins the
    // strict improvement where the stride leaves its floor
    val rows = Similarity.annRecallPqRefined(spark, dir)
      .select($"recall_seeded", $"recall_refined").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    val (ms, mr) = (rows.map(_._1).sum / rows.length, rows.map(_._2).sum / rows.length)
    assert(mr >= ms, s"refined mean $mr below seeded mean $ms")
  }

  test("nearest-centroid kernel equals the max_by join twin on every vector") {
    val c = Similarity.corpus(spark, dir)
    val cents = Similarity.centroids(c, Similarity.NCentroids.toLong)
    def collectAssign(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", $"cent_id", $"csim")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val viaKernel = collectAssign(Similarity.assignedCells(c, cents))
    val viaJoin = collectAssign(Similarity.assignedCellsViaJoin(c, cents))
    assert(viaKernel.keySet == viaJoin.keySet && viaKernel.nonEmpty)
    viaKernel.foreach { case (id, a) =>
      assert(a == viaJoin(id), s"vec $id: kernel $a != join ${viaJoin(id)}") }
    // exact-tie fixture: a vector equidistant (same cosine) from two
    // centroids must take the lower cent_id on both paths
    import org.apache.spark.sql.functions.{lit => flit}
    val e1 = (Array(1.0, 1.0) ++ Array.fill(62)(0.0)).toSeq  // bisector of e2/e3
    val tieC = Seq((99L, e1)).toDF("vec_id", "v")
      .withColumn("nrm", org.apache.spark.sql.functions.sqrt(flit(2.0)))
    val c2 = ((1.0 +: Array.fill(63)(0.0)).toSeq, 1.0)
    val c3 = ((0.0 +: 1.0 +: Array.fill(62)(0.0)).toSeq, 1.0)
    val tieCents = Seq((5L, c2._1, c2._2), (7L, c3._1, c3._2))
      .toDF("cent_id", "cv", "cn")
    val k = collectAssign(Similarity.assignedCells(tieC, tieCents))
    val j = collectAssign(Similarity.assignedCellsViaJoin(tieC, tieCents))
    assert(k(99L)._1 == 5L, s"tie must take lower cent_id: ${k(99L)}")
    assert(k == j, s"tie fixture diverged: $k vs $j")
  }

  test("pq encode: native kernel codes equal the min_by join twin (incl. exact ties)") {
    val c = Similarity.corpus(spark, dir)
    val cb = Similarity.pqCodebook(c, 8L) // the fixture-floor codebook stride
    def collectCodes(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect().map(r => r._1 -> r._2).toMap
    val viaKernel = collectCodes(Similarity.pqEncode(c, cb))
    val viaJoin = collectCodes(Similarity.pqEncodeViaJoin(c, cb))
    assert(viaKernel.keySet == viaJoin.keySet && viaKernel.nonEmpty)
    viaKernel.foreach { case (id, ks) =>
      assert(ks == viaJoin(id), s"vec $id: kernel $ks != join ${viaJoin(id)}") }
    // exact-tie fixture: a vector EQUIDISTANT from two codebook entries in
    // every subspace must take the lower code id on both paths
    import org.apache.spark.sql.functions.{lit => flit}
    val a = Array.fill(64)(0.0)
    val b = Array.fill(64)(2.0)
    val mid = Array.fill(64)(1.0) // dist² = 64·1 to both entries per subspace
    val tieC = Seq((0L, a.toSeq), (8L, b.toSeq), (99L, mid.toSeq))
      .toDF("vec_id", "v").withColumn("nrm", flit(1.0))
    val tieCb = Seq((0L, a.toSeq), (8L, b.toSeq)).toDF("cid", "cv")
      .withColumn("cidx",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy($"cid")) - 1)
    val k = collectCodes(Similarity.pqEncode(tieC, tieCb))
    val j = collectCodes(Similarity.pqEncodeViaJoin(tieC, tieCb))
    assert(k(99L) == Seq.fill(Similarity.PqM)(0), s"tie must take lower cid: ${k(99L)}")
    assert(k == j, s"tie fixture diverged: $k vs $j")
  }

  test("linear probe: weights match an exhaustive driver-side GD recompute; loss non-increasing") {
    def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val data = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
      .map { case (_, v, l) =>
        (1.0 +: v.map(_.toDouble)) -> (if (l < 5) 1.0 else 0.0) }
    val n = data.length.toDouble
    var w = Array.fill(Similarity.Dims + 1)(0.0)
    var prevMse = Double.MaxValue
    (1 to Similarity.ProbeIters).foreach { _ =>
      val preds = data.map { case (x, _) =>
        x.indices.map(d => w(d) * x(d)).sum }
      val mse = data.zip(preds).map { case ((_, y), p) =>
        (p - y) * (p - y) }.sum / n
      assert(mse <= prevMse + 1e-9, s"loss must not increase: $prevMse -> $mse")
      prevMse = mse
      val steps = w.indices.map(d => round6(Similarity.ProbeLr *
        2.0 * data.zip(preds).map { case ((x, y), p) => (p - y) * x(d) }.sum / n))
      w = w.indices.map(d => round6(w(d) - steps(d))).toArray
    }
    val got = Similarity.linearProbe(spark, dir)
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    assert(got.length == w.length)
    // 6dp re-pinning makes both trajectories bit-identical up to the
    // distributed avg's partition-order noise, absorbed by the rounding
    got.zip(w).zipWithIndex.foreach { case ((a, b), d) =>
      assert(math.abs(a - b) <= 1e-6 + 1e-9, s"dim $d: $a != $b") }
  }

  test("hybrid rrf: fused score reconstructs from the legs' ranks exactly") {
    val lex = TextAnalysis.bm25TopK(spark, dir)
      .select($"query_id", $"doc_id", $"rank")
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val sem = Similarity.topkBruteForce(spark, dir)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val fused = Similarity.hybridRrf(spark, dir)
      .select($"query_id", $"doc_id", $"lex_rank", $"sem_rank", $"rrf_score")
      .as[(Long, Long, Int, Int, Double)].collect()
    assert(fused.nonEmpty)
    fused.foreach { case (q, d, lr, sr, s) =>
      // reported leg ranks are the legs' own (0 = leg did not retrieve)
      assert(lr == lex.getOrElse((q, d), 0), s"lex_rank ($q,$d)")
      assert(sr == sem.getOrElse((q, d), 0), s"sem_rank ($q,$d)")
      val expect = BigDecimal(
        (if (lr > 0) 1.0 / (Similarity.RrfK + lr) else 0.0) +
        (if (sr > 0) 1.0 / (Similarity.RrfK + sr) else 0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(s == expect, s"rrf score ($q,$d): $s != $expect")
    }
    // fusion property: with k=60 and top-10 legs, ANY doc both legs
    // retrieved (score >= 2/(60+10)) strictly beats ANY single-leg doc
    // (score <= 1/(60+1)) — consensus dominates, RRF's design point
    fused.groupBy(_._1).values.foreach { rows =>
      val both = rows.filter(r => r._3 > 0 && r._4 > 0).map(_._5)
      val single = rows.filter(r => r._3 == 0 || r._4 == 0).map(_._5)
      if (both.nonEmpty && single.nonEmpty)
        assert(both.min > single.max, s"consensus must dominate: $rows")
    }
  }

  test("balanced sample: per-cell quota exact, dense cells cannot dominate") {
    val out = Similarity.balancedSample(spark, dir)
      .select($"vec_id", $"cell_id", $"pos", $"selected")
      .as[(Long, Long, Int, Boolean)].collect()
    assert(out.nonEmpty)
    val n = out.length.toLong
    val cells = out.groupBy(_._2)
    val quota = (n / Similarity.BalancedSampleDen + cells.size - 1) / cells.size
    // selection is exactly pos <= quota, so each cell contributes
    // min(quota, |cell|) — a dense cell is capped at the same quota as a
    // sparse one (the point of the operator)
    cells.foreach { case (cell, members) =>
      val sel = members.count(_._4)
      assert(sel == math.min(quota, members.size), s"cell $cell kept $sel")
      // positions are a dense 1..|cell| ranking
      assert(members.map(_._3).sorted.toSeq == (1 to members.size))
    }
    // deterministic: rerun selects the identical vector set
    val again = Similarity.balancedSample(spark, dir)
      .filter($"selected").select($"vec_id").as[Long].collect().toSet
    assert(again == out.filter(_._4).map(_._1).toSet)
  }

  test("language profiles are deterministic and predictions cover all docs") {
    val out = TextAnalysis.langId(spark, dir)
    assert(out.count() == 500)
    val langs = out.select($"pred_lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr", "zh")))
  }

  test("contamination agrees with exhaustive 8-gram overlap ground truth") {
    import graft.functions.Text._
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", wordShingles(tokens($"text"), Dedup.ContamGram).as("sh"))
      .filter(size($"sh") > 0)
    val bench = docs.filter($"doc_id" % Dedup.ContamBenchStride === 0)
      .select($"doc_id".as("bench_id"), $"sh".as("bsh"))
    val corpus = docs.filter($"doc_id" % Dedup.ContamBenchStride =!= 0)
    val truth = corpus.join(bench, lit(true))
      .select($"doc_id", $"bench_id",
        size(array_intersect($"sh", $"bsh")).as("shared"))
      .filter($"shared" >= Dedup.ContamMinShared)
      .select($"doc_id", $"bench_id").as[(Long, Long)].collect().toSet
    val found = Dedup.contamination(spark, dir)
      .select($"doc_id", $"bench_id").as[(Long, Long)].collect().toSet
    assert(found == truth, s"found=${found.size} truth=${truth.size}")
  }

  test("repetition fractions are exact ratios in [0,1] over all docs") {
    val rep = TextAnalysis.repetition(spark, dir)
    val rows = rep.select($"n_tokens", $"dup_bigram_frac", $"dup_trigram_frac")
      .as[(Int, Double, Double)].collect()
    assert(rows.length == 500)
    assert(rows.forall { case (n, b, t) =>
      n >= 3 && b >= 0.0 && b <= 1.0 && t >= 0.0 && t <= 1.0 })
    // a duplicate trigram window implies its leading bigram window is also a
    // duplicate, so the raw counts must obey dup3 <= dup2
    assert(rows.forall { case (n, b, t) =>
      math.round(t * (n - 2)) <= math.round(b * (n - 1)) })
  }

  test("packing lays docs contiguously: starts chain with no gaps or overlaps") {
    import graft.operators.Packing
    val out = Packing.packing(spark, dir)
      .select($"doc_id", $"n_tokens", $"bin_id", $"bin_offset")
      .as[(Long, Int, Long, Long)].collect()
    assert(out.length == 500)
    val byStart = out.map { case (id, n, bin, off) =>
      (bin * Packing.SeqLen + off, n, id)
    }.sortBy(s => (s._1, s._3))
    assert(byStart.head._1 == 0L, "stream must start at token 0")
    byStart.sliding(2).foreach { case Array((s1, n1, _), (s2, _, _)) =>
      assert(s2 == s1 + n1, s"gap/overlap at start=$s2 (expected ${s1 + n1})")
    case _ => ()
    }
  }

  test("fingerprint is stable under recomputation") {
    val a = TextAnalysis.fingerprint(spark, dir).select($"doc_id", $"fingerprint")
      .as[(Long, Long)].collect().toMap
    val b = TextAnalysis.fingerprint(spark, dir).select($"doc_id", $"fingerprint")
      .as[(Long, Long)].collect().toMap
    assert(a == b && a.size == 500)
  }

  test("span dedup matches an exhaustive driver-side recompute") {
    val out = Dedup.spanDedup(spark, dir)
      .select($"doc_id", $"n_spans", $"n_dropped")
      .as[(Long, Long, Long)].collect()
      .map { case (id, s, d) => id -> ((s, d)) }.toMap
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    // exhaustive ground truth: first occurrence per span text across the
    // corpus in (doc_id, span_id) order is kept, everything else drops
    val seen = scala.collection.mutable.Set.empty[String]
    val truth = docs.map { case (id, text) =>
      val spans = text.split(" ", -1).grouped(Dedup.SpanTokens)
        .map(_.mkString(" ")).toSeq
      id -> ((spans.size.toLong, spans.count(s => !seen.add(s)).toLong))
    }.toMap
    assert(out.keySet == truth.keySet)
    truth.foreach { case (id, (nSpans, nDropped)) =>
      assert(out(id) == ((nSpans, nDropped)), s"doc $id")
    }
    assert(truth.values.map(_._2).sum > 0, "fixture should contain dup spans")
  }

  test("substring dedup matches an exhaustive driver-side recompute") {
    val k = Dedup.SubstrGram
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    // ground truth: global first occurrence per gram string, later
    // occurrences are duplicated anchors, islands merge within k
    val occs = scala.collection.mutable.LinkedHashMap[String, List[(Long, Int)]]()
    for ((id, text) <- docs) {
      val t = text.split(" ", -1)
      for (i <- 0 to t.length - k)
        occs.updateWith(t.slice(i, i + k).mkString(" "))(
          o => Some((id, i + 1) :: o.getOrElse(Nil)))
    }
    val dupAnchors = occs.values.flatMap { o =>
      o.reverse.drop(1)  // reverse-accumulated: drop the FIRST occurrence
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val truth = docs.map { case (id, text) =>
      val n = text.split(" ", -1).length
      val ps = dupAnchors.getOrElse(id, Nil)
      var spans = 0L; var tokens = 0L
      var first = -1; var last = -1
      for (p <- ps) {
        if (first < 0) { first = p; last = p }
        else if (p - last > k) { spans += 1; tokens += last - first + k; first = p; last = p }
        else last = p
      }
      if (first >= 0) { spans += 1; tokens += last - first + k }
      id -> ((math.max(n - k + 1, 0).toLong, ps.size.toLong, spans, tokens,
        BigDecimal(tokens.toDouble / math.max(n, 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = Dedup.substringDedup(spark, dir)
      .select($"doc_id", $"n_grams", $"n_dup_starts", $"n_dup_spans",
        $"n_dup_tokens", $"dup_frac")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length == docs.length)
    got.foreach { case (id, ng, nds, nsp, ntk, fr) =>
      assert(truth(id) == ((ng, nds, nsp, ntk, fr)), s"doc $id: got ($ng,$nds,$nsp,$ntk,$fr) want ${truth(id)}")
    }
    // non-vacuous: the fixture's planted near-dups create duplicated spans
    assert(got.exists(_._4 > 0))
  }

  test("span dedup digest of an untouched doc equals the original text hash") {
    import graft.functions.Text._
    val joined = Dedup.spanDedup(spark, dir)
      .join(graft.sources.Tables.documents(spark, dir), "doc_id")
      .withColumn("orig_digest", hash60($"text"))
    val untouched = joined.filter($"n_dropped" === 0)
    // aligned spans rejoined with single spaces reconstruct the text exactly
    assert(untouched.count() > 0)
    assert(untouched.filter($"clean_digest" =!= $"orig_digest").count() == 0)
    // and a doc that lost spans must NOT hash to its original text
    assert(joined.filter($"n_dropped" > 0)
      .filter($"clean_digest" === $"orig_digest").count() == 0)
  }

  test("kmeans partitions the whole corpus over the seeded clusters") {
    val rows = Similarity.kmeans(spark, dir)
      .select($"cluster_id", $"n_members", $"csum", $"csumsq")
      .as[(Long, Long, Double, Double)].collect()
    val nVecs = graft.sources.Tables.embeddings(spark, dir).count()
    val nSeeds = graft.sources.Tables.embeddings(spark, dir)
      .filter($"vec_id" % 200 === 0).count()
    // every vector lands in exactly one surviving cluster; clusters only
    // ever shrink from the seed set (empty ones drop, none appear)
    assert(rows.map(_._2).sum == nVecs)
    assert(rows.length <= nSeeds && rows.nonEmpty)
    assert(rows.forall { case (_, n, _, sq) => n > 0 && sq > 0 })
    // deterministic under recomputation (fixed seeds, fixed iterations,
    // 6dp-rounded means)
    val again = Similarity.kmeans(spark, dir)
      .select($"cluster_id", $"n_members", $"csum", $"csumsq")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("kmeans stop condition fires on a planted converged fixture; max-iters bounds the rest") {
    // corpus = exact copies of the two unit-axis seeds: round-1 means equal
    // the seeds (0/1 components are 6dp-exact), so the measured shift is 0
    // and the loop must stop after ONE round despite an 8-round budget
    def axis(hot: Int): Seq[Double] = Seq.tabulate(64)(d => if (d == hot) 1.0 else 0.0)
    val c = (0 until 8).map(i => (i.toLong, axis(i % 2))).toDF("vec_id", "v")
      .withColumn("nrm", graft.functions.Vec.norm($"v"))
    val seeds = Seq((100L, axis(0)), (101L, axis(1))).toDF("cent_id", "cv")
      .withColumn("cn", graft.functions.Vec.norm($"cv"))
    val (out, rounds) = Similarity.kmeansLoop(c, seeds, Similarity.KmeansEps, 8)
    assert(rounds.length == 1 && rounds.head._1 <= Similarity.KmeansEps,
      s"planted fixture must converge in one round: $rounds")
    val res = out.select($"cluster_id", $"n_members", $"inertia")
      .as[(Long, Long, Double)].collect()
    assert(res.map(_._2).sum == 8 && res.forall(_._3 == 0.0), res.toSeq.toString)
    // with a convergence threshold that can never fire, the max-iteration
    // bound must govern (and each round reports its shift/inertia)
    val (_, capped) = Similarity.kmeansLoop(c, seeds, -1.0, 3)
    assert(capped.length == 3, capped.toString)
    // inertia is non-increasing over the trajectory
    assert(capped.map(_._2).sliding(2).forall { case Seq(a, b) => b <= a; case _ => true })
  }

  test("bloom contamination is a superset probe with no false negatives") {
    val bloom = Dedup.bloomContamination(spark, dir)
      .select($"doc_id", $"n_grams", $"n_bloom_hits", $"n_exact_hits")
      .as[(Long, Int, Long, Long)].collect()
    assert(bloom.nonEmpty)
    // no false negatives (exact ⊆ bloom) and hits bounded by the gram count
    assert(bloom.forall { case (_, ng, nb, ne) => nb >= ne && nb <= ng })
    // every pair the exact operator reports shares >= 8 grams with SOME
    // bench doc, so the bloom op's exact count must be at least that
    val bmap = bloom.map(r => r._1 -> r._4).toMap
    Dedup.contamination(spark, dir)
      .select($"doc_id", $"n_shared").as[(Long, Long)].collect()
      .foreach { case (id, nShared) => assert(bmap(id) >= nShared, s"doc $id") }
  }

  test("bloom filter size derives from benchmark size above the fixture floor") {
    // every fixture scale stays at the floor (oracle arithmetic unchanged)
    assert(Dedup.bloomBits(347) == 65536)
    assert(Dedup.bloomBits(4457) == 65536)
    assert(Dedup.bloomBits(65536 / 12) == 65536)
    // past the floor: next power of two holding >= 12 bits per item
    assert(Dedup.bloomBits(65536 / 12 + 1) == 131072)
    assert(Dedup.bloomBits(100000) == 1 << 21)
    // capped where production shards the filter instead
    assert(Dedup.bloomBits(Long.MaxValue / 16) == Dedup.MaxBloomLiteralBits)
    assert(Dedup.MaxBloomLiteralBits == 1 << 24)
  }

  test("role-carving strides derive from corpus size above their fixture floors") {
    import graft.operators.TextAnalysis
    // floor regime: every shipped fixture (500/5000 docs) and the 40k
    // probe point keep the oracle literals (% 50, % 10, % 100) bit-identical
    for (n <- Seq(500L, 5000L, 40000L)) {
      assert(Dedup.contamBenchStride(n) == Dedup.ContamBenchStride)
      assert(Dedup.incrementalStride(n) == Dedup.IncrementalStride)
      assert(TextAnalysis.bm25QueryStride(n) == TextAnalysis.Bm25QueryStride)
    }
    // past the knee the carved role sets saturate instead of growing
    // linearly: bench ≈ 1000 docs, arriving batch ≈ 4096, queries ≈ 500
    assert(Dedup.contamBenchStride(1000000L) == 1000L)      // bench = n/stride = 1000
    assert(Dedup.incrementalStride(1000000L) == 244L)       // batch ≈ 4098
    assert(TextAnalysis.bm25QueryStride(1000000L) == 2000L) // queries = 500
  }

  test("layout constants derive from input size above their fixture floors") {
    import graft.operators.{Layout, Sampling}
    // shuffle shards: every shipped fixture and the 40k probe point keep
    // the oracle's `mod 8` literal; past 2^19 docs a shard outgrows one
    // task's sort memory and the count derives (25 G docs ⇒ ~48 k shards,
    // the documented 100 TB figure)
    for (n <- Seq(500L, 5000L, 40000L))
      assert(Sampling.shuffleShards(n) == Sampling.ShuffleShards.toLong)
    assert(Sampling.shuffleShards(1L << 19) == 8L)
    assert(Sampling.shuffleShards((1L << 19) * 8 + 1) == 9L)
    assert(Sampling.shuffleShards(25L * 1000 * 1000 * 1000) == 47684L)
    // bucket count: floor at 16 until a bucket outgrows ~2 GiB; 100 TB of
    // fact table derives the documented ~50 k buckets
    assert(Layout.nBuckets(0L) == 16)
    assert(Layout.nBuckets(16L * Layout.BucketBytes) == 16)
    assert(Layout.nBuckets(16L * Layout.BucketBytes + 1) == 17)
    assert(Layout.nBuckets(100L * 1000 * 1000 * 1000 * 1000) == 46567)
  }

  test("semantic dedup salted sub-cell split: identical output, bounded per-task pairing") {
    // sf0.001 is itself a mega-cell (stride floor 200 => every vector
    // assigns to the single seed), so forcing a small cap exercises the
    // salted split on genuinely skewed data
    val cap = 8
    val plain = Similarity.semanticDedup(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val salted = Similarity.semanticDedupImpl(spark, dir, Some(cap))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(plain == salted, "salted split must not change the dropped set")
    // pair coverage is exact: same candidate multiset either way
    val cPlain = Similarity.semanticCandidates(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().sorted.toSeq
    val cSalted = Similarity.semanticCandidates(spark, dir, Some(cap))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().sorted.toSeq
    assert(cPlain == cSalted)
    assert(cPlain.distinct.size == cPlain.size, "each pair exactly once")
    // the split threshold does its job: no (cell, p, q) task exceeds ~cap²
    // pairs (4× slack for hash-block size variation at this tiny cap),
    // while the unsalted mega-cell concentrates ALL pairs in one task
    val taskSizes = Similarity.semanticCandidates(spark, dir, Some(cap))
      .groupBy($"cent_id", $"pa", $"qa").count()
      .select($"count").as[Long].collect()
    assert(taskSizes.max <= 4L * cap * cap,
      s"max task ${taskSizes.max} pairs > 4·cap²=${4 * cap * cap}")
    val unsaltedMax = Similarity.semanticCandidates(spark, dir)
      .groupBy($"cent_id", $"pa", $"qa").count()
      .select($"count").as[Long].collect().max
    assert(taskSizes.max < unsaltedMax,
      s"salting should shrink the worst task ($unsaltedMax -> ${taskSizes.max})")
  }

  test("semantic dedup drops only verified within-cell near-dups") {
    val out = Similarity.semanticDedup(spark, dir)
      .select($"vec_id", $"keeper_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    // keeper precedes the dropped vector and the reported cosine clears τ
    assert(out.forall { case (v, k, c) => k < v && c >= Similarity.SemDedupCosine })
    // dropped ids are distinct (one verdict per vector)
    assert(out.map(_._1).distinct.length == out.length)
    // independent cosine recompute from the raw vectors
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    out.foreach { case (v, k, c) =>
      val (a, b) = (vecs(v).map(_.toDouble), vecs(k).map(_.toDouble))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val cos = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      assert(math.abs(BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble - c) < 1e-9,
        s"pair ($k,$v)")
    }
  }

  test("connected components: chain, cliques, and forest all label by min in O(log^2 n) rounds") {
    // a 300-node path is the adversarial shape for min-label propagation
    // (needs 299 propagation rounds); star contraction must close it fast
    val chain = spark.range(0, 299).selectExpr("id as a", "id + 1 as b")
    val (labels, rounds) = Dedup.connectedComponents(chain.toDF)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size == 300 && got.values.forall(_ == 0L), "one component labeled 0")
    // measured: 10 = 9 contracting rounds (~log2 300 halvings) + 1
    // fixpoint-confirmation round; min-label propagation would need 299
    assert(rounds <= 12, s"path-300 converged in $rounds rounds (diameter-free bound)")

    // two cliques + an isolated edge, shuffled orientation and duplicates
    val cliqueEdges = for {
      base <- Seq(1000L, 2000L); i <- 0 until 6; j <- 0 until 6 if i != j
    } yield (base + i, base + j)
    val e2 = (cliqueEdges ++ Seq((7L, 5L), (5L, 7L))).toDF("a", "b")
    val (l2, _) = Dedup.connectedComponents(e2)
    val m2 = l2.as[(Long, Long)].collect().toMap
    assert((0 until 6).forall(i => m2(1000L + i) == 1000L))
    assert((0 until 6).forall(i => m2(2000L + i) == 2000L))
    assert(m2(5L) == 5L && m2(7L) == 5L)

    // empty edge set: no labels, zero rounds, no failure
    val (l3, r3) = Dedup.connectedComponents(Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(l3.isEmpty && r3 == 0)
  }
}
