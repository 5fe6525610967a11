package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: binary payload schema, frame fanout, batched
  * feature-extraction stub. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("media struct carries binary data + typed metadata") {
    val df = Multimodal.withMedia(graft.sources.Tables.documents(spark, dir))
    val f = df.schema("media").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(f("data").dataType.typeName == "binary")
    val meta = f("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSet == Set("n_bytes", "mime", "n_frames"))
    // payload bytes round-trip: decode(data) == text
    val bad = df.filter(decode($"media.data", "UTF-8") =!= $"text").count()
    assert(bad == 0)
  }

  test("frame sample covers every byte exactly once") {
    val frames = Multimodal.frameSample(spark, dir)
      .groupBy($"doc_id").agg(sum($"frame_bytes").as("total"), count(lit(1)).as("n"))
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", length($"text").as("len"))
    val mismatches = frames.join(docs, "doc_id")
      .filter($"total" =!= $"len").count()
    assert(mismatches == 0)
  }

  test("feature extraction is deterministic, batched, and total") {
    val media = Multimodal.withMedia(graft.sources.Tables.documents(spark, dir))
    val f1 = Multimodal.extractFeatures(media).as[(Long, Array[Long])].collect()
      .map { case (id, fs) => id -> fs.toSeq }.toMap
    val f2 = Multimodal.extractFeatures(media, batchSize = 7).as[(Long, Array[Long])]
      .collect().map { case (id, fs) => id -> fs.toSeq }.toMap
    assert(f1.size == 500 && f1 == f2) // batch size must not change results
    assert(f1.values.forall(_.length == 4))
  }
}
