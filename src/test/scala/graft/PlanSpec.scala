package graft

import graft.operators.{Dedup, Relational, Similarity}

/** Physical-plan shape assertions: the optimizations we design for must
  * actually appear in the executed plan — filters pushed into the parquet
  * scan, small dimensions broadcast, global top-k as TakeOrderedAndProject,
  * and no accidental cartesian products in the banded similarity joins.
  * These are the ".explain and iterate" checks of the build brief, pinned
  * as tests so a regression can't slip in silently. */
class PlanSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6: all three predicates push down to the parquet scan") {
    val p = plan(Relational.q6ForecastRevenue(spark, dir))
    // non-empty PushedFilters on the scan (the plan string truncates the
    // list, so check the scan's DataFilters carry all three columns)
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    val scanLine = p.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("DataFilters: [isnotnull(l_shipdate"), scanLine)
  }

  test("q6: scan reads only the referenced columns") {
    val p = plan(Relational.q6ForecastRevenue(spark, dir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_shipdate") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_returnflag"), readSchema)
  }

  test("q2: dimension join is a broadcast hash join") {
    val p = plan(Relational.q2NationRegion(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q12: global top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan(Relational.q12TopK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q4: EXISTS plans as a semi join, not inner + distinct") {
    val p = plan(Relational.q4SemiJoin(spark, dir))
    assert(p.contains("LeftSemi"), p)
  }

  test("banded near-dup joins never degenerate to cartesian products") {
    Seq(Dedup.minhashLsh(spark, dir), Dedup.ngramJaccard(spark, dir),
        Similarity.nearDupEmbedding(spark, dir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p.linesIterator.take(5).mkString("\n"))
    }
  }

  test("ngram jaccard: candidates come from a prefix-postings join, verification pays per candidate only") {
    val p = plan(Dedup.ngramJaccard(spark, dir))
    // the candidate join is on gram equality carrying the cheap size-ratio
    // conjunct — and crucially does NOT evaluate the set intersection
    val candLine = p.linesIterator
      .find(l => l.contains("Join") && l.contains("least("))
      .getOrElse(fail(s"no candidate join with the size-ratio prefilter:\n$p"))
    assert(!candLine.contains("intersect_cardinality"), candLine)
    // the O(|grams|) intersection appears only above the candidate join
    // (verify per candidate pair), never inside a cross-pairing condition
    assert(p.contains("intersect_cardinality"), p)
    // round 4: the ppjoin accumulated-overlap bound runs as a pair-keyed
    // aggregate (k, last matched ranks) between the postings join and the
    // verification — its filter references the aggregated i_last/j_last,
    // and the aggregate itself carries the max-rank accumulators
    assert(p.contains("i_last") && p.contains("j_last"), p)
    assert(p.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.contains("max(rank")), p)
  }

  test("as-of join: one hash exchange, no join operator (union + running-last)") {
    val p = plan(Relational.qAsOfJoin(spark, dir))
    // COVERAGE claims the as-of is a single-shuffle union + window; a Spark
    // upgrade regressing it to a range-explosion join would show extra
    // exchanges or a physical join node
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("brute-force topk broadcasts the query side (corpus never shuffles for the join)") {
    val p = plan(Similarity.topkBruteForce(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q1: aggregation is partial (map-side) + final") {
    val p = plan(Relational.q1PricingSummary(spark, dir))
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p)
    // two HashAggregate levels around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("pii scrub: pure projection — no exchange except the output sort") {
    val p = plan(graft.operators.TextAnalysis.piiScrub(spark, dir))
    // the redaction itself must not shuffle; the only exchange is the
    // presentation orderBy's range partitioning
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
    // reads only the columns the construction needs
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("source"), readSchema)
  }

  test("mixture: corpus joins the broadcast rate table and is never hash-shuffled") {
    val p = plan(graft.operators.Sampling.mixture(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // hash exchanges belong to the tiny per-source count/total aggregates,
    // never to the corpus-sized side: every hashpartitioning line here
    // repartitions `source`-keyed aggregate rows (O(|sources|))
    p.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
      assert(l.contains("source"), l)
    }
  }

  test("vocab OOV: one corpus explode for training, scoring is a kernel projection") {
    val p = plan(graft.operators.TextAnalysis.vocabOov(spark, dir))
    // scoring side: count_in_set runs as a projection over the cached docs —
    // no join against a vocab relation, no second explode
    assert(p.contains("count_in_set"), p)
    assert(!p.contains("Join"), p)
    assert(!p.linesIterator.exists(l => l.contains("Generate") && l.contains("explode")), p)
  }

  test("view serves with sketch/ext measures stay broadcast-only and " +
      "group-sized — no sort-merge join, no cartesian") {
    // the quantile/distinct/extremes serve = sums fold + ONE broadcast
    // ext leg (max_by per group); the sketch union (ObjectHashAggregate)
    // belongs to the MAINTENANCE side only. A SortMergeJoin or cartesian
    // appearing here means a corpus-sized exchange crept into the serve.
    for (q <- Seq("corpus_view_quantile", "corpus_view_topk",
        "corpus_card_live", "corpus_views_shared", "corpus_card_live_q")) {
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(!p.contains("SortMergeJoin"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }
}
