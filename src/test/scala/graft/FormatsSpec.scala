package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Formats, Tables}

/** Source-format breadth: the documents fixture (free text with every CSV
  * hazard: commas, quotes, multi-word fields) must round-trip exactly
  * through ORC, JSON-lines, and CSV with the declared-schema readers. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf("sf0.001"))
    .select($"doc_id", $"lang", $"source", $"n_chars", $"text")

  private def assertSame(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame): Unit = {
    assert(b.count() == a.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("documents round-trip exactly through ORC") {
    val out = Files.createTempDirectory("fmt_orc").toString
    Formats.writeOrc(docs, out)
    assertSame(docs, Formats.readOrc(spark, out))
  }

  test("documents round-trip exactly through JSON lines with declared schema") {
    val out = Files.createTempDirectory("fmt_json").toString
    Formats.writeJsonLines(docs, out)
    val back = Formats.readJsonLines(spark, out, docs.schema)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      docs.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assertSame(docs, back)
  }

  test("documents round-trip exactly through CSV (quotes/commas survive)") {
    val out = Files.createTempDirectory("fmt_csv").toString
    Formats.writeCsv(docs, out)
    assertSame(docs, Formats.readCsv(spark, out, docs.schema))
  }

  test("media blobs round-trip through per-file writes and the binaryFile source") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("fmt_blob").toString
    // the multimodal payloads (opaque bytes) as the media lake's files
    val blobs = graft.operators.Multimodal
      .withMedia(docs.limit(25))
      .select($"doc_id".as("id"), $"media.data".as("data"))
    Formats.writeBlobFiles(blobs, out)
    val back = Formats.readBinaryFiles(spark, out, glob = "*.bin")
      .select(
        regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long").as("id"),
        col("content"), col("length"))
    assert(back.count() == 25)
    val joined = back.join(blobs, "id")
    assert(joined.count() == 25)
    // byte-exact content and consistent length metadata
    assert(joined.filter(col("content") =!= col("data")).count() == 0)
    assert(joined.filter(col("length") =!= length(col("data"))).count() == 0)
  }
}
