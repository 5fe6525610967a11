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
}
