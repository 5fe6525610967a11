package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sequence
import graft.streaming.Stateful
import graft.streaming.Stateful.{FunnelEvent, FunnelOut}

/** Batch ≡ stream parity for the funnel: the window-chain staging
  * (`Sequence.funnelUserFlags`) and the mapGroupsWithState fold
  * (`Stateful.funnelStages`) must reach the same stage per user when the
  * stream receives events in per-user event-time order — the documented
  * parity contract. Seeded random workload with timestamp ties, deadline
  * gaps, and out-of-funnel noise events. */
class SequenceSpec extends SparkSpec {
  import spark.implicits._

  test("window staging and streaming fold reach the same stage per user") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(42)
    val types = Seq("view", "click", "purchase", "error", "signup")
    val base = 1700000000000L
    val events = (for { u <- 1L to 20L; i <- 1 to 12 } yield {
      // 3-day span at coarse 6-minute granularity so same-ms ties actually
      // occur and the strict-comparison rule is exercised
      val t = base + rnd.nextInt(3 * 24 * 10).toLong * 360000L
      FunnelEvent(u, u * 100 + i, types(rnd.nextInt(types.size)), new Timestamp(t))
    }).toSeq

    val batchStages = Sequence.funnelUserFlags(
        events.toDF().select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ms")))
      .select($"user_id", ($"s1" + $"s2" + $"s3").as("stage"))
      .as[(Long, Int)].collect().toMap

    // stream in global event-time order (⇒ per-user in-order), split across
    // two micro-batches so the fold crosses the state store at least once
    val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = sorted.splitAt(sorted.size / 2)
    val in = MemoryStream[FunnelEvent]
    val q = Stateful.funnelStages(in.toDS())
      .writeStream.format("memory").queryName("seq_parity").outputMode("update").start()
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamStages = spark.table("seq_parity").as[FunnelOut].collect()
      .groupBy(_.user_id).map { case (u, outs) => u -> outs.map(_.stage).max }

    assert(streamStages == batchStages)
    // non-vacuous: the workload must exercise more than one final stage
    assert(batchStages.values.toSet.size >= 2)
  }

  test("reorder-buffered funnel matches batch bit-for-bit under out-of-order arrival") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val types = Seq("view", "click", "purchase", "error", "signup")
    val base = 1700000000000L
    // a 6-hour span at 6-minute granularity (ties occur), randomized users
    val random = (for { u <- 1L to 15L; i <- 1 to 10 } yield {
      val t = base + rnd.nextInt(60).toLong * 360000L
      FunnelEvent(u, u * 100 + i, types(rnd.nextInt(types.size)), new Timestamp(t))
    }).toSeq
    // ... plus a user whose funnel arrives fully REVERSED across batches —
    // the case the one-pass fold provably lower-bounds (purchase and click
    // are consumed before their prerequisites and never revisited)
    val rev = Seq(
      FunnelEvent(99L, 9903L, "purchase", new Timestamp(base + 3 * 360000L)),
      FunnelEvent(99L, 9902L, "click", new Timestamp(base + 2 * 360000L)),
      FunnelEvent(99L, 9901L, "view", new Timestamp(base + 1 * 360000L)))
    val all = random ++ rev
    val batchStages = Sequence.funnelUserFlags(
        all.toDF().select($"user_id", $"event_id", $"event_type",
          unix_millis($"ts").as("ms")))
      .select($"user_id", ($"s1" + $"s2" + $"s3").as("stage"))
      .as[(Long, Int)].collect().toMap
    assert(batchStages(99L) == 3)
    // deliver in REVERSE event-time order over three micro-batches; the
    // 7-hour watermark delay covers the whole span, so nothing is late
    val batches = (random.sortBy(e => (-e.ts.getTime, e.event_id)) ++ rev)
      .grouped((all.size + 2) / 3).toSeq
    // a far-future sentinel (other user) advances the watermark past every
    // real event so the buffers drain and the estimates converge
    val sentinel = FunnelEvent(100000L, 1L, "error",
      new Timestamp(base + 20L * 3600 * 1000))
    def lastStages(out: Seq[FunnelOut]): Map[Long, Int] =
      out.zipWithIndex.groupBy(_._1.user_id)
        .map { case (u, rows) => u -> rows.maxBy(_._2)._1.stage }
    val in = MemoryStream[FunnelEvent]
    val q = Stateful.funnelStagesReordered(in.toDS(), "7 hours")
      .writeStream.format("memory").queryName("seq_reorder").outputMode("update").start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    in.addData(sentinel)
    q.processAllAvailable()
    q.stop()
    val streamed = lastStages(spark.table("seq_reorder").as[FunnelOut].collect().toSeq)
    assert((streamed - sentinel.user_id) == batchStages,
      s"reordered stream != batch:\n${(streamed - sentinel.user_id).toSeq.sorted}\n${batchStages.toSeq.sorted}")
    // the unbuffered one-pass fold on the same delivery provably diverges
    // on the reversed user — the gap the reorder buffer exists to close
    val in2 = MemoryStream[FunnelEvent]
    val q2 = Stateful.funnelStages(in2.toDS())
      .writeStream.format("memory").queryName("seq_unbuffered").outputMode("update").start()
    rev.foreach { e => in2.addData(e); q2.processAllAvailable() }
    q2.stop()
    val plain = lastStages(spark.table("seq_unbuffered").as[FunnelOut].collect().toSeq)
    assert(plain(99L) < 3, s"one-pass fold should lower-bound here: $plain")
  }
}
