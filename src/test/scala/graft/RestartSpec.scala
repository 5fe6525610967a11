package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{KeyedStores, KeyedUpsertForeachWriter, StreamPipeline}

/** Checkpoint-restart semantics (SURVEY.md §7.5.1): a file-source stream
  * stopped and restarted from the same checkpoint must not re-apply data it
  * already committed, and must pick up files added while it was down. */
class RestartSpec extends SparkSpec {

  private def writeFile(dir: Path, name: String, lines: String*): Unit =
    Files.writeString(dir.resolve(name), lines.mkString("\n"))

  test("file-source stream restarted from checkpoint processes each doc once") {
    val store = "t_restart"
    KeyedStores.clear(store)
    val inDir = Files.createTempDirectory("restart_in")
    val cp = Files.createTempDirectory("restart_cp").toString

    def runOnce(): Unit = {
      val envelope = spark.readStream
        .schema("value STRING")
        .text(inDir.toString)
      val q = StreamPipeline.transform(envelope)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", cp)
        .foreach(new KeyedUpsertForeachWriter(store))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeFile(inDir, "batch1.json",
      """{"timestamp_ms": "1530305100936", "fx_marker": "EUR/GBP"}""",
      """{"timestamp_ms": "1530305100815", "fx_marker": "USD/CHF"}""")
    runOnce()
    assert(KeyedStores.snapshot(store).keySet == Set("EUR/GBP", "USD/CHF"))

    // second run: same checkpoint, one new file — the old file must NOT be
    // re-processed (its epoch is committed in the checkpoint), the new one is
    writeFile(inDir, "batch2.json",
      """{"timestamp_ms": "1530305300000", "fx_marker": "EUR/JPY"}""")
    runOnce()
    val state = KeyedStores.snapshot(store)
    assert(state.keySet == Set("EUR/GBP", "USD/CHF", "EUR/JPY"))
    assert(state("EUR/GBP")(1) == "1530305100936")
  }

  test("funnel state survives checkpoint restart (stage resumes, not resets)") {
    import spark.implicits._
    import graft.streaming.Stateful
    import graft.streaming.Stateful.{FunnelEvent, FunnelOut}
    val inDir = Files.createTempDirectory("funnel_in")
    val cp = Files.createTempDirectory("funnel_cp").toString
    val outDir = Files.createTempDirectory("funnel_out").resolve("out").toString

    def runOnce(): Unit = {
      val ev = spark.readStream
        .schema("user_id LONG, event_id LONG, event_type STRING, ts TIMESTAMP")
        .json(inDir.toString)
        .as[FunnelEvent]
      val q = Stateful.funnelStages(ev)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelOut], _: Long) =>
          b.write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeFile(inDir, "b1.json",
      """{"user_id": 9, "event_id": 1, "event_type": "view", "ts": "2024-01-01T00:00:00.000Z"}""")
    runOnce()
    // second run, same checkpoint: click + purchase arrive. Stage 2 and 3
    // are only reachable if the (stage=1, anchor) state was RECOVERED from
    // the state store — a reset funnel would reject the click (no view seen)
    // and finish at stage 0.
    writeFile(inDir, "b2.json",
      """{"user_id": 9, "event_id": 2, "event_type": "click", "ts": "2024-01-01T00:05:00.000Z"}""",
      """{"user_id": 9, "event_id": 3, "event_type": "purchase", "ts": "2024-01-01T00:09:00.000Z"}""")
    runOnce()
    val stages = spark.read.parquet(outDir).as[FunnelOut].collect()
      .filter(_.user_id == 9L).map(_.stage)
    assert(stages.contains(1)) // first run emitted the view-only stage
    assert(stages.max == 3)    // restart resumed from stage 1, not from scratch
  }
}
