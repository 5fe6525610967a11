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

  test("media near-dup banding is complete: equals exhaustive hamming over signatures") {
    import graft.operators.Dedup
    val nBands = Dedup.HammingThreshold + 1
    val bits = Dedup.simhashBandBits(
      graft.sources.Tables.documents(spark, dir).count())
    val sigs = Multimodal.mediaSignatures(
        graft.sources.Tables.documents(spark, dir), nBands * bits)
      .as[(Long, Long)].collect()
    // exhaustive all-pairs ground truth (500 sigs -> 125k cheap XORs)
    val truth = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= Dedup.HammingThreshold
    } yield (a, b, h)).sortBy(p => (p._1, p._2)).toSeq
    val got = Multimodal.mediaNearDup(spark, dir)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect().toSeq
    assert(got.nonEmpty, "fixture must yield at least one perceptual pair")
    assert(got == truth, s"banding missed/invented pairs:\n$got\n$truth")
    // a planted byte-identical payload pair collides at hamming 0
    val planted = Multimodal.mediaSignatures(
        Seq((1L, "same payload bytes", "en"), (2L, "same payload bytes", "en"))
          .toDF("doc_id", "text", "lang"), nBands * bits)
      .as[(Long, Long)].collect().map(_._2)
    assert(planted(0) == planted(1))
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
