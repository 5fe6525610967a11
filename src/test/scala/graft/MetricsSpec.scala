package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{sum => fsum}
import graft.streaming.StreamMetrics

/** The per-batch stream-health store: one row per micro-batch through the
  * listener bus, per-query summary rollup, and the append-store
  * compaction hygiene. */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("stream metrics: one row per micro-batch; summary and compaction") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-metrics").toString
    val l = StreamMetrics.attach(spark, dir)
    try {
      val in = MemoryStream[Long]
      val cp = java.nio.file.Files
        .createTempDirectory("cp_metrics").toString
      val q = in.toDF().writeStream.queryName("metrics_probe")
        .format("noop").option("checkpointLocation", cp).start()
      in.addData(1L, 2L, 3L)
      q.processAllAvailable()
      in.addData(4L, 5L)
      q.processAllAvailable()
      q.stop()
      // the listener bus is asynchronous by design (a slow metrics disk
      // must never block the stream): poll until both batch rows land
      def probeRows() = StreamMetrics.metrics(spark, dir)
        .filter($"query" === "metrics_probe")
      val deadline = System.currentTimeMillis() + 30000
      while (probeRows().filter($"input_rows" > 0).count() < 2 &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(probeRows().filter($"input_rows" > 0).count() == 2,
        "expected exactly two data-carrying batch rows")
      def totalRows() = probeRows()
        .agg(fsum($"input_rows")).as[Option[Long]].head().getOrElse(0L)
      assert(totalRows() == 5L, "metrics rows do not cover the input")
      val roll = StreamMetrics.summary(spark, dir)
        .filter($"query" === "metrics_probe")
        .select($"n_batches", $"total_rows", $"peak_state_rows",
          $"p50_batch_ms", $"p95_batch_ms", $"max_batch_ms")
        .as[(Long, Long, Long, Double, Double, Long)].head()
      assert(roll._2 == 5L && roll._1 >= 2L,
        s"summary rollup off: $roll")
      // stateless query: no state rows ever reported
      assert(roll._3 == 0L)
      // latency percentiles: ordered, positive, bounded by the max
      assert(roll._4 > 0 && roll._4 <= roll._5 && roll._5 <= roll._6,
        s"batch-duration percentiles disordered: $roll")
      // compaction folds the one-file-per-batch accretion; reads unchanged
      val (fb, fa) = StreamMetrics.compactMetrics(spark, dir)
      assert(fb >= 2L && fa == 1L, s"compaction did not fold: $fb -> $fa")
      assert(totalRows() == 5L, "compaction changed the metrics content")
    } finally StreamMetrics.detach(spark, l)
  }

  test("stream metrics: terminations distinguish a crash from a clean stop") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-metrics-term").toString
    val l = StreamMetrics.attach(spark, dir)
    try {
      // a clean stop...
      val ok = MemoryStream[Long]
      val cpA = java.nio.file.Files
        .createTempDirectory("cp_term_ok").toString
      val qOk = ok.toDF().writeStream.format("noop")
        .option("checkpointLocation", cpA).start()
      ok.addData(1L); qOk.processAllAvailable(); qOk.stop()
      // ...and a batch that dies with an exception
      val bad = MemoryStream[Long]
      val cpB = java.nio.file.Files
        .createTempDirectory("cp_term_bad").toString
      val qBad = bad.toDF().writeStream
        .option("checkpointLocation", cpB)
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new IllegalStateException("deliberate batch failure")
        }.start()
      bad.addData(2L)
      intercept[Exception] { qBad.processAllAvailable() }
      // the listener bus is async: poll for both termination rows
      val deadline = System.currentTimeMillis() + 30000
      def terms() = StreamMetrics.terminations(spark, dir)
      while (terms().count() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val byRun = terms()
        .select($"run_id", $"failed", $"error")
        .as[(String, Boolean, String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val okRow = byRun(qOk.runId.toString)
      val badRow = byRun(qBad.runId.toString)
      assert(!okRow._1 && okRow._2.isEmpty,
        s"clean stop recorded as a failure: $okRow")
      assert(badRow._1 && badRow._2.contains("deliberate batch failure"),
        s"crash not recorded with its error: $badRow")
      // a query that measured batches BEFORE dying gets the failure
      // decoration on its summary row: one read answers healthy + died
      val mid = MemoryStream[Long]
      val cpC = java.nio.file.Files
        .createTempDirectory("cp_term_mid").toString
      val qMid = mid.toDF().writeStream.queryName("mid_probe")
        .option("checkpointLocation", cpC)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          if (id > 0) throw new IllegalStateException("late batch failure")
          df.count(); ()
        }.start()
      mid.addData(7L); qMid.processAllAvailable()
      mid.addData(8L)
      intercept[Exception] { qMid.processAllAvailable() }
      val sDeadline = System.currentTimeMillis() + 30000
      def midRow() = StreamMetrics.summary(spark, dir)
        .filter($"query" === "mid_probe")
        .select($"failed_runs", $"last_error")
        .as[(Long, Option[String])].collect()
      while ((midRow().isEmpty || midRow().head._1 == 0L) &&
          System.currentTimeMillis() < sDeadline)
        Thread.sleep(200)
      val row = midRow().head
      assert(row._1 == 1L && row._2.exists(_.contains("late batch failure")),
        s"summary missing the failure decoration: $row")
    } finally StreamMetrics.detach(spark, l)
  }

  test("stream metrics: spool compaction neither loses racing appends " +
      "nor double-serves drained rows") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-metrics-spool").toString
    def spoolRow(runId: String, batchId: Long): Unit =
      Seq(("q", "qid", runId, batchId, 1000L + batchId, 1L,
          Option(1.0), Option(1.0), 5L, 0L))
        .toDF("query", "query_id", "run_id", "batch_id", "wall_millis",
          "input_rows", "input_rows_per_sec", "processed_rows_per_sec",
          "batch_duration_ms", "state_rows")
        .coalesce(1).write.mode("append").parquet(s"$dir/batches_spool")
    def served() = StreamMetrics.metrics(spark, dir).count()
    spoolRow("r1", 0L); spoolRow("r1", 1L)
    assert(served() == 2L, "spool rows must serve before any compaction")
    val (b1, a1) = StreamMetrics.compactMetrics(spark, dir)
    assert(b1 == 2L && a1 == 1L, s"fold: $b1 -> $a1")
    assert(served() == 2L)
    // crash between the swap and the spool drain leaves a row in BOTH
    // stores — the (run_id, batch_id) dedup must serve it once
    spoolRow("r1", 1L)
    assert(served() == 2L, "duplicated drained row double-served")
    // an append landing after the drain listing (the live listener with
    // no quiesce point) must survive to the next pass
    spoolRow("r1", 2L)
    assert(served() == 3L, "racing append lost")
    val (_, a2) = StreamMetrics.compactMetrics(spark, dir)
    assert(a2 == 1L && served() == 3L,
      "second pass must fold the stragglers without changing the content")
  }
}
