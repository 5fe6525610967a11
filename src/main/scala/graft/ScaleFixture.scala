package graft

import org.apache.spark.sql.SparkSession

/** Synthesizes a LARGER documents/embeddings fixture for [[ScaleProbe]]'s
  * third scale point (the driver ships sf ≤ 0.1; the band-width derivations
  * in `Similarity.lshBandBits` / `Dedup.simhashBandBits` only change above
  * those sizes, so proving they bend the candidate curve needs a bigger N).
  *
  * Deliberately SPARSE: texts are unique random-vocab token sequences and
  * vectors are iid pseudo-random, so true near-dup pairs ≈ 0 and the
  * candidate count C measures pure background bucket collisions — the term
  * that kills a banding scheme at 100 TB (the r3 SCALING.md analysis; the
  * planted-duplicate fixtures measure recall instead). Everything derives
  * deterministically from the portable hash60, so reruns are bit-identical.
  *
  * Usage: runMain graft.ScaleFixture <outDir> <nDocs> <nVecs>
  */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleFixture <outDir> <nDocs> <nVecs>")
    val Array(outDir, nDocsS, nVecsS) = args
    val nDocs = nDocsS.toLong
    val nVecs = nVecsS.toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.HashKernels.h60

    val langs = Array("en", "de", "fr", "es", "zh")
    spark.range(nDocs).as[Long].map { i =>
      // 80–119 tokens from a 50k-word vocab: docs share words (realistic
      // token-frequency overlap for simhash) but no two docs are near-dups
      val nTok = 80 + (h60(s"len|$i") % 40).toInt
      val sb = new StringBuilder
      var j = 0
      while (j < nTok) {
        if (j > 0) sb.append(' ')
        sb.append("w").append(h60(s"tok|$i|$j") % 50000)
        j += 1
      }
      val text = sb.toString
      (i, text, langs((h60(s"lang|$i") % langs.length).toInt), "synth", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    spark.range(nVecs).as[Long].map { i =>
      val v = Array.tabulate(64) { d =>
        ((h60(s"vec|$i|$d") % 2001L) - 1000L).toFloat / 1000f
      }
      (i, v, (i % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // events at the driver fixture's DENSITY (sf0.01: 10k events / 150
    // users / 30 days) but nDocs events: users scale with N so the
    // per-user event rate — and with it the watermark-horizon reorder
    // buffer ScaleProbe's funnel_state measures — should stay ~constant.
    // That constancy IS the linear-state claim for the streaming funnel.
    val nUsers = math.max(10L, nDocs * 150 / 10000)
    val spanMs = 30L * 24 * 3600 * 1000
    val types = Array("view", "click", "signup", "purchase", "error")
    spark.range(nDocs).as[Long].map { i =>
      val ts = new java.sql.Timestamp(
        java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli +
          h60(s"ets|$i") % spanMs)
      (i, ts, h60(s"eu|$i") % nUsers,
        types((h60(s"ety|$i") % types.length).toInt),
        (h60(s"ev|$i") % 1000L).toDouble / 10.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    println(s"""{"fixture":"$outDir","docs":$nDocs,"vecs":$nVecs}""")
    spark.stop()
  }
}
