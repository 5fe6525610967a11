package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{KeyedStores, KeyedUpsertForeachWriter, StreamPipeline}

/** S2-S4 semantics (SURVEY.md §2.1): streaming replay of the reference
  * pipeline through MemoryStream into the keyed-upsert sinks, plus the
  * foreach-writer lifecycle / epoch-replay contract. */
class StreamPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    """{"timestamp_ms": "1530305100936", "fx_marker": "EUR/GBP"}
      |{"timestamp_ms": "1530305100815", "fx_marker": "USD/CHF"}""".stripMargin,
    """{"timestamp_ms": "1530305100969", "fx_marker": "EUR/CHF"}""",
    """{"timestamp_ms": "1530305200000", "fx_marker": "EUR/GBP"}""",
    """{"timestamp_ms": "1530305100000", "fx_marker": ""}""",
    """garbage""")

  test("foreach sink: streaming replay converges to one row per key") {
    val store = "t_foreach"
    KeyedStores.clear(store)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val cp = Files.createTempDirectory("cp_foreach").toString
    val q = StreamPipeline.startForeach(in.toDF(), store, cp)
    in.addData(fixture: _*)
    q.processAllAvailable()
    q.stop()
    val state = KeyedStores.snapshot(store)
    assert(state.keySet == Set("EUR/GBP", "USD/CHF", "EUR/CHF"))
    // last-processed wins: the 1530305200000 EUR/GBP arrived in the same
    // batch; with foreach the in-batch order is partition-dependent, but the
    // key set and per-key presence are deterministic.
    assert(state("EUR/CHF")(1) == "1530305100969")
  }

  test("foreachBatch sink (default parquet store): event-time LWW within batch") {
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("pq_batch").toString
    val cp = Files.createTempDirectory("cp_batch").toString
    val in = MemoryStream[String]
    in.addData(fixture: _*)
    val q = StreamPipeline.startBatchMerge(in.toDF(), storeDir, cp)
    q.awaitTermination()
    import spark.implicits._
    val store = new graft.streaming.ParquetKeyedStore(storeDir, "fx_marker", "timestamp_ms")
    val state = store.read(spark).get
      .select($"fx_marker", $"timestamp_ms").as[(String, String)].collect().toMap
    assert(state.keySet == Set("EUR/GBP", "USD/CHF", "EUR/CHF"))
    // within-batch winner is by timestamp_ms, deterministically
    assert(state("EUR/GBP") == "1530305200000")
    assert(state("USD/CHF") == "1530305100815")
  }

  test("default batch merge: distributed LWW across micro-batches, no driver collect") {
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("pq_store").toString
    val cp = Files.createTempDirectory("cp_pq").toString
    val in = MemoryStream[String]
    in.addData(fixture: _*)
    val q = StreamPipeline.startBatchMerge(in.toDF(), storeDir, cp)
    q.awaitTermination()
    // second run, same store: EUR/CHF gets a newer tick, USD/CHF an older one
    val cp2 = Files.createTempDirectory("cp_pq2").toString
    val in2 = MemoryStream[String]
    in2.addData("""{"timestamp_ms": "1530306000000", "fx_marker": "EUR/CHF"}
                  |{"timestamp_ms": "1530300000001", "fx_marker": "USD/CHF"}""".stripMargin)
    val q2 = StreamPipeline.startBatchMerge(in2.toDF(), storeDir, cp2)
    q2.awaitTermination()
    import spark.implicits._
    val store = new graft.streaming.ParquetKeyedStore(storeDir, "fx_marker", "timestamp_ms")
    val state = store.read(spark).get
      .select($"fx_marker", $"timestamp_ms").as[(String, String)].collect().toMap
    assert(state.keySet == Set("EUR/GBP", "USD/CHF", "EUR/CHF"))
    assert(state("EUR/CHF") == "1530306000000") // newer tick won
    assert(state("USD/CHF") == "1530305100815") // older tick lost (event-time LWW)
  }

  test("foreach writer honors (partitionId, epochId): replayed epoch skipped") {
    val store = "t_epoch"
    KeyedStores.clear(store)
    val w1 = new KeyedUpsertForeachWriter(store)
    assert(w1.open(0, 7L))
    w1.process(Row("K", "100"))
    w1.close(null)
    // same partition+epoch replayed (checkpoint recovery) → open refuses
    val w2 = new KeyedUpsertForeachWriter(store)
    assert(!w2.open(0, 7L))
    // new epoch processes fine and overwrites
    val w3 = new KeyedUpsertForeachWriter(store)
    assert(w3.open(0, 8L))
    w3.process(Row("K", "200"))
    w3.close(null)
    assert(KeyedStores.snapshot(store)("K")(1) == "200")
  }

  test("failed epoch is not marked committed and can be retried") {
    val store = "t_retry"
    KeyedStores.clear(store)
    val w1 = new KeyedUpsertForeachWriter(store)
    assert(w1.open(3, 1L))
    w1.process(Row("A", "1"))
    w1.close(new RuntimeException("task died")) // not committed
    val w2 = new KeyedUpsertForeachWriter(store)
    assert(w2.open(3, 1L)) // retry allowed
    w2.process(Row("A", "2"))
    w2.close(null)
    assert(KeyedStores.snapshot(store)("A")(1) == "2")
  }
}
