package graft

/** Driver-contract consistency: every oracle key must name a real query,
  * non-oracled queries must be the documented exceptions, and every query
  * must run and produce a stable schema on the smoke fixture. Catches
  * queries/oracleSql drift before the driver's gate does. */
class ContractSpec extends SparkSpec {

  test("oracleSql keys are exactly the oracle-checkable queries") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without a query: ${o.diff(q)}")
    // every query is oracled (q_sketch_distinct carries exact-count columns
    // plus bounded-error flags precisely so it can be)
    assert(q.diff(o).isEmpty, s"non-oracled queries: ${q.diff(o)}")
  }

  test("every query ANALYZES on sf0.001 — fixture drift fails here by name") {
    // cheap analysis-only sweep (no execution): a regenerated fixture whose
    // schema no longer matches a loader (round 10: events.ts nanos→micros)
    // must fail THIS test with every broken query named, not surface as
    // silently missing CORRECTNESS keys at round close
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf("sf0.001")).schema; None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries no longer analyze on the current fixtures:\n" +
        failures.mkString("\n"))
  }

  test("every query runs on sf0.001 and returns rows with non-empty schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf("sf0.001"))
        if (df.schema.isEmpty) Some(s"$name: empty schema")
        else if (df.count() == 0) Some(s"$name: zero rows")
        else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("fixture text is ASCII — the byte/char conflation the oracles rely on") {
    // the media/CDC oracle SQL indexes text by CHARACTER (substr/ord) while
    // the Spark side scans UTF-8 BYTES; they agree only while every fixture
    // document is pure ASCII (a multi-byte char would shift every later
    // position AND send ord() past the 256-entry gear table, silently
    // dropping boundaries). Enforce the assumption where it lives instead
    // of discovering it as an unexplained hash mismatch.
    import org.apache.spark.sql.functions._
    for (d <- Seq("sf0.001", "sf0.01")) {
      val nonAscii = graft.sources.Tables.documents(spark, sf(d))
        .filter(length(col("text")) =!= length(encode(col("text"), "UTF-8")))
        .count()
      assert(nonAscii == 0, s"$d: $nonAscii non-ASCII documents break the " +
        "byte/char oracle convention (see media_cdc_dedup oracle)")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("bench JSON line fits the harness's retained-output window in the worst case") {
    // the harness keeps only the last 2000 chars of bench stdout (measured
    // across BENCH_r01..r07 tails; sbt's trailing success line consumes
    // ~75); round 6's full-double-precision line overflowed the window and
    // the round's numbers were lost (BENCH_r06 parsed: null). Bench
    // degrades per-query precision (2 dp -> 1 dp -> 1 dp for the >=0.95 s
    // tail only -> 0 dp) and finally COVERAGE (slowest-first entries +
    // "q_omitted":n) until the line fits — full ms precision always lands
    // in BENCH_FULL.json — so the invariant is that the emergency level
    // bounds the line for ANY query count/durations. Worst case: every
    // query at 99.49 s (max 0-dp width), the realistic-mix case, and the
    // all-null case must all fit the ~1925-char post-[success] budget.
    import scala.collection.immutable.ListMap
    val worst = ListMap(SparkEntry.queries.keys.map(_ -> Option(99.49)).toSeq: _*)
    val mixed = ListMap(SparkEntry.queries.keys.zipWithIndex.map { case (k, i) =>
      k -> Option(if (i % 3 == 0) 12.345 else 0.42) }.toSeq: _*)
    val nulls = ListMap(SparkEntry.queries.keys.map(_ -> Option.empty[Double]).toSeq: _*)
    // errorful runs spend the errors block from the SAME budget: the
    // all-fail case is the catastrophic ceiling (capped errors block +
    // q_omitted map) and must fit like the clean cases
    val allErrors = SparkEntry.queries.keys.map(k =>
      k -> ("SparkException: " + ("x" * 120))).toMap
    val someErrors = allErrors.take(2)
    Seq((worst, Map.empty[String, String]), (mixed, Map.empty[String, String]),
        (nulls, Map.empty[String, String]), (worst, someErrors),
        (nulls, allErrors)).foreach { case (rs, errs) =>
      val line = Bench.benchLine(rs, errs, 9999.99, "/root/testdata/sf0.1")
      // by-construction max: QsBudget + 86 chars of fixed line overhead
      // (prefix/total/suffix); +75 for sbt's [success] tail stays ≤ 2000.
      // The literal window bound is asserted INDEPENDENTLY of QsBudget so
      // raising the budget past the window cannot self-certify.
      assert(line.length <= Bench.QsBudget + 86,
        s"bench line would be ${line.length} chars — emergency truncation failed")
      assert(line.length <= 1925,
        s"bench line ${line.length} chars exceeds the post-[success] window")
      assert(line.contains("\"metric\":\"total\""))
    }
    // emergency keeps the slow tail: with every query slow, the omitted
    // counter appears and at least 60 of the slowest entries survive
    val w = Bench.benchLine(worst, Map.empty, 9999.99, "sf")
    assert(w.contains("\"q_omitted\":"), "worst case must reach the emergency level")
    assert(w.count(_ == ':') >= 60, s"emergency level kept too few entries: $w")
    // ... and an errorful run still reports both error detail and timings
    val e = Bench.benchLine(worst, someErrors, 9999.99, "sf")
    assert(e.contains("\"errors\":{") && e.contains("SparkException"))
    // catastrophic all-fail: errors block capped, counter present
    val c = Bench.benchLine(nulls, allErrors, 0.0, "sf")
    assert(c.contains("\"errors_omitted\":"), "all-fail errors block must cap")
  }
}
