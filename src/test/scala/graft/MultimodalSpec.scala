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

  test("cdc chunks cover every byte exactly once and size near the divisor") {
    val chunks = Multimodal.cdcChunks(graft.sources.Tables.documents(spark, dir))
      .groupBy($"doc_id").agg(sum($"chunk_bytes").as("total"),
        count(lit(1)).as("n"))
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", length($"text").as("len"))
    val joined = chunks.join(docs, "doc_id")
    assert(joined.filter($"total" =!= $"len").count() == 0)
    // mean chunk size should sit near the divisor geometry (expected 64 B;
    // wide tolerance — unclamped CDC has a geometric size distribution)
    val (totBytes, totChunks) = joined
      .agg(sum($"total"), sum($"n")).as[(Long, Long)].head()
    val mean = totBytes.toDouble / totChunks
    assert(mean > 16 && mean < 256, s"mean chunk $mean")
  }

  test("cdc chunking survives a byte shift that defeats fixed-offset framing") {
    // corpus doc + the same payload with ONE byte prepended: every
    // fixed-offset frame after the edit shifts (near-zero hash overlap),
    // while CDC boundaries re-align at the first surviving boundary
    // (high overlap) — the reason content-defined chunking exists
    // a multi-KB payload (fixture docs concatenated) so the chunk count is
    // large enough that only the edit-touched prefix chunk differs
    val text = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .filter($"doc_id" < 12).orderBy($"doc_id")
      .select($"text").as[String].collect().mkString(" ")
    val docs = Seq((1L, text, "en"), (2L, "X" + text, "en"))
      .toDF("doc_id", "text", "lang")
    def hashSets(df: org.apache.spark.sql.DataFrame, hcol: String) = df
      .select($"doc_id", col(hcol)).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cdc = hashSets(Multimodal.cdcChunks(docs), "ch")
    val cdcOverlap = (cdc(1L) & cdc(2L)).size.toDouble / cdc(1L).size
    val fixed = hashSets(Multimodal.frameHashes(docs), "fh")
    val fixedOverlap = (fixed(1L) & fixed(2L)).size.toDouble / fixed(1L).size
    assert(cdcOverlap >= 0.8, s"cdc overlap $cdcOverlap")
    assert(fixedOverlap <= 0.1, s"fixed-offset overlap $fixedOverlap")
    // the same contrast at the fingerprint level: the CDC signature of the
    // shifted payload stays within the near-dup hamming threshold, the
    // fixed-offset signature drifts to ~half-random distance
    import graft.operators.Dedup
    def hamming(sigs: Map[Long, Long]) =
      java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    def sigMap(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"sim").as[(Long, Long)].collect().toMap
    val hCdc = hamming(sigMap(Multimodal.cdcSignatures(docs, 48)))
    val hFixed = hamming(sigMap(Multimodal.mediaSignatures(docs, 48)))
    assert(hCdc <= Dedup.HammingThreshold, s"cdc sig hamming $hCdc")
    assert(hFixed > Dedup.HammingThreshold, s"fixed sig hamming $hFixed")
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
