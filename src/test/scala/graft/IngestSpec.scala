package graft

import org.apache.spark.sql.functions._
import graft.operators.Ingest

/** P1-P10 semantics (SURVEY.md §2.2) against the reference's own wire fixture
  * (cassandra_sink.scala:92-97) plus the adversarial rows from FIXTURES.md §A:
  * empty marker, null/missing marker, malformed JSON, multi-line messages,
  * duplicate keys with older/newer timestamps, trailing newlines. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  // The blog fixture: one Kafka message value carrying multiple
  // newline-delimited JSON docs, plus adversarial payloads.
  private val messages = Seq(
    // reference example (two docs in one message)
    """{"timestamp_ms": "1530305100936", "fx_marker": "EUR/GBP"}
      |{"timestamp_ms": "1530305100815", "fx_marker": "USD/CHF"}""".stripMargin,
    """{"timestamp_ms": "1530305100969", "fx_marker": "EUR/CHF"}
      |{"timestamp_ms": "1530305100964", "fx_marker": "USD/CAD"}""".stripMargin,
    // duplicate key, newer timestamp — should win the upsert
    """{"timestamp_ms": "1530305200000", "fx_marker": "EUR/GBP"}""",
    // duplicate key, older timestamp — should lose
    """{"timestamp_ms": "1530300000000", "fx_marker": "USD/CHF"}""",
    // empty marker → filtered (cassandra_sink.scala:120)
    """{"timestamp_ms": "1530305100000", "fx_marker": ""}""",
    // missing marker (null) → filtered by null-rejecting predicate
    """{"timestamp_ms": "1530305100001"}""",
    // malformed JSON → null struct → filtered
    """not json at all""",
    // trailing newline / empty line in a message
    "{\"timestamp_ms\": \"1530305100500\", \"fx_marker\": \"AUD/NZD\"}\n")

  private def decoded = Ingest.filterKeyed(Ingest.deriveDate(
    Ingest.decode(messages.toDF("value"))))

  test("decode parses every well-formed doc and drops bad keys") {
    val markers = decoded.select("fx_marker").as[String].collect().sorted
    assert(markers.toSeq == Seq("AUD/NZD", "EUR/CHF", "EUR/GBP", "EUR/GBP",
      "USD/CAD", "USD/CHF", "USD/CHF"))
  }

  test("derived date matches the reference expression semantics (UTC)") {
    val row = decoded.filter($"fx_marker" === "EUR/CHF")
      .select($"timestamp_dt".cast("string")).as[String].head()
    // 1530305100969 ms = 2018-06-29T20:45:00.969Z
    assert(row == "2018-06-29")
  }

  test("keyed upsert keeps the max-timestamp row per marker") {
    val state = Ingest.latestPerKey(decoded)
      .select($"fx_marker", $"timestamp_ms").as[(String, String)]
      .collect().toMap
    assert(state("EUR/GBP") == "1530305200000") // newer duplicate won
    assert(state("USD/CHF") == "1530305100815") // older duplicate lost
    assert(state.keySet == Set("AUD/NZD", "EUR/CHF", "EUR/GBP", "USD/CAD", "USD/CHF"))
  }

  test("null structs from malformed JSON are dropped, not crashed on") {
    assert(decoded.filter($"fx_marker".isNull).count() == 0)
  }

  test("envelope round-trip over events equals direct computation") {
    val viaEnvelope = Ingest.referencePipeline(spark, sf("sf0.001"))
    val direct = graft.sources.Tables.events(spark, sf("sf0.001"))
      .select($"event_type".as("fx_marker"), unix_millis($"ts").as("ms"))
      .filter($"fx_marker".isNotNull && $"fx_marker" =!= "")
      .groupBy($"fx_marker").agg(max($"ms").as("ms"))
    val a = viaEnvelope.select($"fx_marker", $"timestamp_ms".cast("long").as("ms"))
      .as[(String, Long)].collect().toMap
    val b = direct.as[(String, Long)].collect().toMap
    assert(a == b)
  }
}
