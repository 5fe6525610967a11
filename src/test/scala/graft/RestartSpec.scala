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
}
