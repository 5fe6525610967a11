package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Stateful
import graft.streaming.Stateful.{SessionEvent, SessionOut}

/** Stateful streaming semantics via MemoryStream (SURVEY.md §5.2.3). */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("watermarked tumbling window counts finalize per window") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = Stateful.windowedCounts(in.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    in.addData((ts(0), "click"), (ts(1), "click"), (ts(2), "view"),
               (ts(16), "click"))
    q.processAllAvailable()
    // push the watermark far ahead so the first windows finalize
    in.addData((ts(120), "click"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wc")
      .select($"window_start", $"event_type", $"n_events")
      .as[(Timestamp, String, Long)].collect().toSet
    assert(rows.contains((new Timestamp(1699999800000L), "click", 2L)) ||
           rows.exists(_._2 == "click")) // window alignment depends on epoch grid
    assert(rows.exists { case (_, t, n) => t == "view" && n == 1 })
  }

  test("dropDuplicatesWithinWatermark suppresses duplicate event ids") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val q = Stateful.dedupWithinWatermark(
        in.toDF().toDF("event_id", "ts"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    in.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(1)), (2L, ts(1)), (3L, ts(2)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dd").select($"event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val q = Stateful.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // user 7: events at 0,5,10 (one session), then 50 (gap 40min > 30min)
    in.addData(SessionEvent(7, 1, ts(0)), SessionEvent(7, 2, ts(5)),
               SessionEvent(7, 3, ts(10)))
    q.processAllAvailable()
    in.addData(SessionEvent(7, 4, ts(50)))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess").as[SessionOut].collect()
    // first session closed when the t=50 event arrived
    assert(sessions.length == 1)
    assert(sessions.head.n_events == 3)
    assert(sessions.head.session_start == ts(0) && sessions.head.session_end == ts(10))
  }

  test("event-time timeout flushes the final open session once the watermark passes") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val q = Stateful.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sessflush").outputMode("append").start()
    in.addData(SessionEvent(9, 1, ts(0)), SessionEvent(9, 2, ts(5)))
    q.processAllAvailable()
    // an event far in the future (any key) pushes the watermark past
    // user 9's gap horizon (t5 + 30min gap + 10min delay); the expired
    // event-time timeout then flushes user 9's open session
    in.addData(SessionEvent(10, 3, ts(120)))
    q.processAllAvailable()
    in.addData(SessionEvent(10, 4, ts(121))) // one more batch so the timeout batch commits
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessflush").as[SessionOut].collect()
      .filter(_.user_id == 9)
    assert(sessions.length == 1, s"open session not flushed: ${sessions.toSeq}")
    assert(sessions.head.n_events == 2)
    assert(sessions.head.session_start == ts(0) && sessions.head.session_end == ts(5))
  }

  test("update-mode streaming aggregation upserts running counts per key") {
    implicit val ctx = spark.sqlContext
    val store = "t_runcount"
    graft.streaming.KeyedStores.clear(store)
    val in = MemoryStream[(Timestamp, String)]
    val counts = in.toDF().toDF("ts", "event_type")
      .groupBy($"event_type")
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"))
    val q = counts.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // update mode emits only changed keys per epoch; upsert each
        batch.collect().foreach { r =>
          graft.streaming.KeyedStores.store(store)
            .put(r.getString(0), Seq(r.getString(0), r.getLong(1)))
        }
      }.start()
    in.addData((ts(0), "click"), (ts(1), "click"), (ts(2), "view"))
    q.processAllAvailable()
    in.addData((ts(3), "click"))
    q.processAllAvailable()
    q.stop()
    val state = graft.streaming.KeyedStores.snapshot(store)
    assert(state("click")(1) == 3L) // running count carried across epochs
    assert(state("view")(1) == 1L)
  }

  test("stream-stream interval join matches the batch twin's pairs") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val out = Stateful.streamAttribution(
      clicks.toDF().toDF("user_id", "event_id", "ts"),
      purchases.toDF().toDF("user_id", "event_id", "ts"))
    val q = out.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    // user 1: clicks at t0,t5; purchase at t10 → both attributed
    // user 1: purchase at t50 → outside 30min of both clicks
    // user 2: click at t0 only, no purchase
    clicks.addData((1L, 101L, ts(0)), (1L, 102L, ts(5)), (2L, 201L, ts(0)))
    purchases.addData((1L, 901L, ts(10)), (1L, 902L, ts(50)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attr")
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    assert(rows == Set((901L, 101L), (901L, 102L)))
  }

  test("cross-batch out-of-order event widens the session instead of corrupting it") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val q = Stateful.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sessooo").outputMode("append").start()
    in.addData(SessionEvent(11, 1, ts(40)))
    q.processAllAvailable()
    // watermark is now ts(30); ts(35) is out of order but NOT late — it must
    // extend the session backward (start=min), never move end backward
    in.addData(SessionEvent(11, 2, ts(35)))
    q.processAllAvailable()
    // flush via watermark far past the gap horizon
    in.addData(SessionEvent(12, 3, ts(200)))
    q.processAllAvailable()
    in.addData(SessionEvent(12, 4, ts(201)))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessooo").as[SessionOut].collect()
      .filter(_.user_id == 11)
    assert(sessions.length == 1, sessions.toSeq.toString)
    assert(sessions.head.session_start == ts(35) && sessions.head.session_end == ts(40))
    assert(sessions.head.n_events == 2)
  }

  test("stream-static contamination flags arriving docs against broadcast benchmark") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Dedup
    val bench = Dedup.contaminationBenchPostings(spark, sf("sf0.01"))
    // doc 92 is the known contaminated doc at sf0.01 (shares 18 8-grams with
    // bench doc 450); doc 1 is clean
    val docs = graft.sources.Tables.documents(spark, sf("sf0.01"))
      .filter($"doc_id".isin(92, 1))
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val q = Dedup.contaminationStream(in.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("contam").outputMode("update").start()
    in.addData(docs.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("contam")
      .select($"doc_id", $"bench_id", $"n_shared").as[(Long, Long, Long)].collect()
    assert(flagged.map(f => (f._1, f._2)).toSet == Set((92L, 450L)))
    assert(flagged.head._3 == 18L)
  }

  test("stream-static minhash near-dup flags an arriving near-duplicate of a corpus doc") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Dedup
    val dir = sf("sf0.01")
    val buckets = Dedup.minhashCorpusBuckets(spark, dir)
    // an exact copy of corpus doc 7's text arrives under a new id (J = 1.0,
    // every band collides); a vocabulary-disjoint doc arrives alongside
    val copied = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" === 7).select($"text").as[String].head()
    val noise = (1 to 40).map(i => s"zqxv$i wkjy$i").mkString(" ")
    val in = MemoryStream[(Long, String)]
    val q = Dedup.nearDupStream(in.toDF().toDF("doc_id", "text"), buckets)
      .writeStream.format("memory").queryName("neardup").outputMode("update").start()
    in.addData((99999L, copied), (99998L, noise))
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("neardup")
      .select($"doc_id", $"corpus_id", $"jaccard").as[(Long, Long, Double)].collect()
    assert(flagged.exists(f => f._1 == 99999L && f._2 == 7L && f._3 == 1.0), flagged.toSeq.toString)
    assert(!flagged.exists(_._1 == 99998L), flagged.toSeq.toString)
  }

  test("stream bloom contamination flags arriving docs through the bitset probe") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Dedup
    val dir = sf("sf0.01")
    val (bits, bench) = Dedup.bloomBenchStatics(spark, dir)
    // doc 92 shares 18 8-grams with bench doc 450 (the known contamination);
    // a vocabulary-disjoint doc must die at the bloom probe
    val docs = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id".isin(92, 1))
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val noise = (1 to 40).map(i => s"zqxv$i wkjy$i").mkString(" ")
    val in = MemoryStream[(Long, String)]
    val q = Dedup.bloomContaminationStream(in.toDF().toDF("doc_id", "text"), bits, bench)
      .writeStream.format("memory").queryName("bloomc").outputMode("update").start()
    in.addData(docs.toIndexedSeq :+ ((99998L, noise)): _*)
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("bloomc")
      .select($"doc_id", $"n_bloom_hits", $"n_exact_hits")
      .as[(Long, Long, Long)].collect()
    assert(flagged.map(_._1).toSet == Set(92L), flagged.toSeq.toString)
    val f92 = flagged.find(_._1 == 92L).get
    // no false negatives: the exact count matches the batch operator's 18,
    // and bloom hits dominate it
    assert(f92._3 == 18L && f92._2 >= f92._3)
  }

  test("stream-static span dedup sheds corpus spans from arriving docs") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Dedup
    val dir = sf("sf0.01")
    val hashes = Dedup.spanCorpusHashes(spark, dir)
    // an exact copy of corpus doc 7 arrives (every span already owned by the
    // corpus → all dropped); a vocabulary-disjoint doc keeps everything
    val copied = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" === 7).select($"text").as[String].head()
    val noise = (1 to 40).map(i => s"zqxv$i wkjy$i").mkString(" ")
    val in = MemoryStream[(Long, String)]
    val q = Dedup.spanDedupStream(in.toDF().toDF("doc_id", "text"), hashes)
      .writeStream.format("memory").queryName("spandd").outputMode("update").start()
    in.addData((99999L, copied), (99998L, noise))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("spandd")
      .select($"doc_id", $"n_spans", $"n_dropped", $"clean_digest")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    import org.apache.spark.sql.functions.lit
    val emptyDigest = spark.range(1)
      .select(graft.functions.Text.hash60(lit("")).as("d")).as[Long].head()
    val noiseDigest = spark.range(1)
      .select(graft.functions.Text.hash60(lit(noise)).as("d")).as[Long].head()
    val copy = out(99999L)
    assert(copy._2 > 0 && copy._3 == copy._2, s"copy must shed all spans: $copy")
    assert(copy._4 == emptyDigest)
    val fresh = out(99998L)
    assert(fresh._3 == 0L && fresh._4 == noiseDigest, s"fresh doc untouched: $fresh")
  }

  test("retrieval serving: streamed corpus queries return the batch operator's rows") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Similarity
    val dir = sf("sf0.01")
    // the batch operator's stride-100 workload includes query 100 and 300;
    // serve those SAME ids through the foreachBatch path
    val probe = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id".isin(100L, 300L)).select($"doc_id", $"text")
      .join(graft.sources.Tables.embeddings(spark, dir)
        .withColumnRenamed("vec_id", "doc_id"), "doc_id")
      .select($"doc_id".as("query_id"), $"text", $"embedding")
      .as[(Long, String, Array[Float])].collect()
    assert(probe.length == 2)
    // default serving path: the IVFADC dense leg — parity vs hybridRrfAnn
    val outDir = java.nio.file.Files.createTempDirectory("graft-serve").toString + "/out"
    val in = MemoryStream[(Long, String, Array[Float])]
    val q = Similarity.serveRetrievalStream(
        in.toDF().toDF("query_id", "text", "embedding"), spark, dir, outDir)
      .start()
    in.addData(probe.toSeq)
    q.processAllAvailable()
    q.stop()
    def collectRows(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"doc_id", $"lex_rank", $"sem_rank", $"rrf_score", $"rank")
      .as[(Long, Long, Int, Int, Double, Int)].collect().sortBy(r => (r._1, r._6))
    val served = collectRows(spark.read.parquet(outDir))
    val batch = collectRows(
      Similarity.hybridRrfAnn(spark, dir).filter($"query_id".isin(100L, 300L)))
    assert(served.nonEmpty && served.toSeq == batch.toSeq,
      s"serve != batch:\n${served.toSeq}\n${batch.toSeq}")
    // exact-dense option: parity vs the brute-force-leg batch operator
    val outDir2 = java.nio.file.Files.createTempDirectory("graft-serve").toString + "/out"
    val in2 = MemoryStream[(Long, String, Array[Float])]
    val q2 = Similarity.serveRetrievalStream(
        in2.toDF().toDF("query_id", "text", "embedding"), spark, dir, outDir2,
        annDense = false)
      .start()
    in2.addData(probe.toSeq)
    q2.processAllAvailable()
    q2.stop()
    val served2 = collectRows(spark.read.parquet(outDir2))
    val batch2 = collectRows(
      Similarity.hybridRrf(spark, dir).filter($"query_id".isin(100L, 300L)))
    assert(served2.nonEmpty && served2.toSeq == batch2.toSeq,
      s"serve(exact) != batch:\n${served2.toSeq}\n${batch2.toSeq}")
  }

  test("streaming probe scoring: trained weights applied at ingest match batch math") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Similarity
    val dir = sf("sf0.01")
    // train offline on the corpus (the artifact a serving job would load)
    val (w, _) = Similarity.linearProbeLoop(
      graft.sources.Tables.embeddings(spark, dir)
        .select($"vec_id", graft.functions.Vec.asDouble($"embedding").as("v"),
          org.apache.spark.sql.functions.when($"label" < 5, 1.0).otherwise(0.0).as("y")),
      Similarity.ProbeLr, Similarity.ProbeIters)
    // stream a handful of corpus vectors through the serve twin
    val sample = graft.sources.Tables.embeddings(spark, dir)
      .filter($"vec_id" % 500 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val in = MemoryStream[(Long, Array[Float])]
    val q = Similarity.probeScoreStream(
        in.toDF().toDF("vec_id", "embedding"), w)
      .writeStream.format("memory").queryName("probest").outputMode("append").start()
    in.addData(sample.toSeq)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("probest")
      .select($"vec_id", $"score", $"selected")
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out.size == sample.length && sample.nonEmpty)
    sample.foreach { case (id, emb) =>
      val x = 1.0 +: emb.map(_.toDouble)
      val expect = BigDecimal(x.indices.map(d => w(d) * x(d)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (_, score, sel) = out(id)
      assert(math.abs(score - expect) <= 1e-9, s"vec $id: $score != $expect")
      assert(sel == (score >= 0.5))
    }
  }

  test("stream-static frame dedup: arriving corpus payload needs no writes") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Multimodal
    val dir = sf("sf0.01")
    val hashes = Multimodal.mediaFrameHashes(spark, dir)
    // an exact copy of corpus doc 7's payload (every frame already stored
    // → zero bytes to write); a byte-disjoint payload writes everything
    val copied = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" === 7).select($"text").as[String].head()
    val noise = (1 to 40).map(i => s"zqxv$i wkjy$i").mkString(" ")
    val in = MemoryStream[(Long, String)]
    val q = Multimodal.frameDedupStream(
        in.toDF().toDF("doc_id", "text")
          .withColumn("lang", org.apache.spark.sql.functions.lit("xx")),
        hashes)
      .writeStream.format("memory").queryName("framedd").outputMode("update").start()
    in.addData((99999L, copied), (99998L, noise))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("framedd")
      .select($"doc_id", $"n_frames", $"n_stored_frames", $"bytes_to_write")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val copy = out(99999L)
    assert(copy._2 > 0 && copy._3 == copy._2 && copy._4 == 0L,
      s"corpus copy already fully stored: $copy")
    val fresh = out(99998L)
    assert(fresh._3 == 0L && fresh._4 == noise.getBytes("UTF-8").length.toLong,
      s"fresh payload writes every byte: $fresh")
  }

  test("stream-static cdc dedup: a byte-SHIFTED corpus payload still mostly collides") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Multimodal
    val dir = sf("sf0.01")
    val hashes = Multimodal.cdcCorpusHashes(spark, dir)
    val copied = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" === 7).select($"text").as[String].head()
    val noise = (1 to 40).map(i => s"zqxv$i wkjy$i").mkString(" ")
    val in = MemoryStream[(Long, String)]
    val q = Multimodal.cdcDedupStream(
        in.toDF().toDF("doc_id", "text")
          .withColumn("lang", org.apache.spark.sql.functions.lit("xx")),
        hashes)
      .writeStream.format("memory").queryName("cdcdd").outputMode("update").start()
    // the SHIFTED copy is the case fixed-offset framing cannot serve: one
    // prepended byte, and frameDedupStream would re-write ~everything;
    // CDC boundaries re-align, so the store skips most of the payload
    in.addData((99999L, copied), (99998L, "X" + copied), (99997L, noise))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("cdcdd")
      .select($"doc_id", $"n_chunks", $"n_stored_chunks", $"bytes_to_write")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val copy = out(99999L)
    assert(copy._2 > 0 && copy._3 == copy._2 && copy._4 == 0L,
      s"exact corpus copy already fully stored: $copy")
    val shifted = out(99998L)
    assert(shifted._3.toDouble / shifted._2 >= 0.8,
      s"shifted copy must still mostly collide: $shifted")
    val fresh = out(99997L)
    assert(fresh._3 == 0L && fresh._4 == noise.getBytes("UTF-8").length.toLong,
      s"fresh payload writes every byte: $fresh")
  }

  test("stream-static media near-dup: shifted corpus payload flagged at ingest, noise passes") {
    implicit val ctx = spark.sqlContext
    import graft.operators.{Dedup, Multimodal}
    val dir = sf("sf0.01")
    val (bandBits, buckets) = Multimodal.mediaStatics(spark, dir)
    val copied = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" === 7).select($"text").as[String].head()
    val noise = (1 to 40).map(i => s"zqxv$i wkjy$i").mkString(" ")
    val in = MemoryStream[(Long, String)]
    val q = Multimodal.mediaNearDupStream(
        in.toDF().toDF("doc_id", "text")
          .withColumn("lang", org.apache.spark.sql.functions.lit("xx")),
        bandBits, buckets)
      .writeStream.format("memory").queryName("mediand").outputMode("update").start()
    // an exact re-upload (hamming 0 to its corpus twin), a byte-SHIFTED
    // re-upload (the case the fixed-offset fingerprint cannot catch — CDC
    // chunks re-align so it stays within the threshold), and disjoint noise
    in.addData((99999L, copied), (99998L, "X" + copied), (99997L, noise))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("mediand")
      .select($"doc_id", $"corpus_id", $"hamming")
      .as[(Long, Long, Int)].collect()
    val exact = out.filter(_._1 == 99999L)
    assert(exact.exists(r => r._2 == 7L && r._3 == 0), s"re-upload: ${exact.toSeq}")
    val shifted = out.filter(_._1 == 99998L)
    assert(shifted.exists(r => r._2 == 7L && r._3 <= Dedup.HammingThreshold),
      s"shifted re-upload must still collide: ${shifted.toSeq}")
    assert(!out.exists(_._1 == 99997L), s"noise must pass: ${out.toSeq}")
  }

  test("stream-static substring dedup: closed-form islands match the batch window math") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Dedup
    val dir = sf("sf0.01")
    val hashes = Dedup.substringCorpusHashes(spark, dir)
    val k = Dedup.SubstrGram
    // an exact corpus copy (every anchor duplicated -> one island covering
    // the whole doc), a vocabulary-disjoint doc (zero), and a half-breed:
    // corpus prefix + disjoint suffix -> exactly one island, union length
    // = prefix anchors span
    val copied = graft.sources.Tables.documents(spark, dir)
      .filter($"doc_id" === 7).select($"text").as[String].head()
    val noise = (1 to 40).map(i => s"zqxv$i wkjy$i").mkString(" ")
    val mixed = copied.split(" ", -1).take(16).mkString(" ") + " " + noise
    val in = MemoryStream[(Long, String)]
    val q = Dedup.substringDedupStream(in.toDF().toDF("doc_id", "text"), hashes)
      .writeStream.format("memory").queryName("subdd").outputMode("update").start()
    // ... and a doc SHORTER than the gram width: no anchors, but the row
    // must still surface with all-zero counts (batch-twin parity — the
    // r8-era inner explode silently dropped it)
    val short = "tiny doc"
    in.addData((99999L, copied), (99998L, noise), (99997L, mixed), (99996L, short))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("subdd")
      .select($"doc_id", $"n_grams", $"n_dup_starts", $"n_dup_spans", $"n_dup_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val shortRow = out(99996L)
    assert(shortRow == ((99996L, 0L, 0L, 0L, 0L)), s"short doc zeros: $shortRow")
    val nCopy = copied.split(" ", -1).length
    val copy = out(99999L)
    assert(copy._2 == nCopy - k + 1 && copy._3 == copy._2, s"copy all dup: $copy")
    assert(copy._4 == 1L && copy._5 == nCopy, s"copy = one island covering the doc: $copy")
    val fresh = out(99998L)
    assert(fresh._3 == 0L && fresh._4 == 0L && fresh._5 == 0L, s"fresh untouched: $fresh")
    // mixed: anchors 1..16-k+1 are corpus grams (suffix windows cross into
    // noise vocabulary), one island, union = 16 tokens
    val mix = out(99997L)
    assert(mix._3 == 16 - k + 1 && mix._4 == 1L && mix._5 == 16L, s"mixed prefix island: $mix")
  }

  test("stream-static semantic dedup flags an arriving near-copy of a corpus vector") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Similarity
    val dir = sf("sf0.001")
    val (cents, cells) = Similarity.semanticStatics(spark, dir)
    // an exact copy of corpus vector 7 arrives under a new id (cosine 1.0
    // with its twin, so SOME corpus keeper qualifies); a near-axis probe
    // arrives alongside — its cosine to any fixture vector is ≤ ~1/|v| ≈
    // 0.25 < τ = 0.4, so it must pass through unflagged
    val copied = graft.sources.Tables.embeddings(spark, dir)
      .filter($"vec_id" === 7).select($"embedding").as[Array[Float]].head()
    val axis = Array.tabulate(64)(d => if (d == 0) 8f else 0f)
    val in = MemoryStream[(Long, Array[Float])]
    val q = Similarity.semanticDedupStream(
        in.toDF().toDF("vec_id", "embedding"), cents, cells)
      .writeStream.format("memory").queryName("semdd").outputMode("update").start()
    in.addData((999999L, copied), (999998L, axis))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("semdd")
      .select($"vec_id", $"keeper_id", $"cosine", $"cell_id")
      .as[(Long, Long, Double, Long)].collect()
    val copy = out.find(_._1 == 999999L)
    assert(copy.nonEmpty, s"arriving near-copy not flagged: ${out.toSeq}")
    // the corpus is the keeper by definition; vec 7 itself qualifies at
    // cosine 1.0, so the min-id keeper is at most 7 and clears τ
    assert(copy.get._2 <= 7L && copy.get._3 >= Similarity.SemDedupCosine, copy.toString)
    assert(!out.exists(_._1 == 999998L), s"axis probe wrongly flagged: ${out.toSeq}")
    // batch parity: the same operator over the same rows as a batch frame
    // (every stage is stateless except the final update-mode reduction)
    val batch = Similarity.semanticDedupStream(
        Seq((999999L, copied), (999998L, axis)).toDF("vec_id", "embedding"),
        cents, cells)
      .select($"vec_id", $"keeper_id", $"cosine", $"cell_id")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.sortBy(_._1).toSeq == batch.sortBy(_._1).toSeq)
  }

  test("batch and streaming session semantics agree on closed sessions") {
    import graft.operators.Windows
    // batch twin over the same fixture events
    val batch = Windows.sessions(spark, sf("sf0.001"))
    assert(batch.count() > 0)
    // closed sessions have start <= end and positive counts
    val bad = batch.filter($"session_start" > $"session_end" || $"n_events" <= 0).count()
    assert(bad == 0)
  }

  test("streaming packer chains per-shard offsets contiguously across micro-batches") {
    import graft.operators.Packing
    import graft.operators.Packing.{PackDoc, PackOut}
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[PackDoc]
    val q = Packing.packStream(in.toDS())
      .writeStream.format("memory").queryName("pk").outputMode("append").start()
    // batch 1: two shards; batch 2 must RESUME shard 0's offset (state), and
    // doc 30's 3000 tokens straddle a 2048-token bin boundary
    in.addData(PackDoc(10, 1000, 0), PackDoc(11, 500, 0), PackDoc(20, 2000, 1))
    q.processAllAvailable()
    in.addData(PackDoc(30, 3000, 0), PackDoc(21, 100, 1))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("pk").as[PackOut].collect()
      .groupBy(_.shard).view.mapValues(_.sortBy(d => d.bin_id * Packing.SeqLen + d.bin_offset))
    // contiguity: each doc starts exactly where the previous one ended
    out.foreach { case (_, docs) =>
      docs.foldLeft(0L) { (expected, d) =>
        val start = d.bin_id * Packing.SeqLen + d.bin_offset
        assert(start == expected, s"doc ${d.doc_id} starts at $start, expected $expected")
        start + d.n_tokens
      }
    }
    // cross-batch resume: doc 30 starts at shard 0's running total 1500
    val d30 = out(0).find(_.doc_id == 30L).get
    assert(d30.bin_id == 0L && d30.bin_offset == 1500L)
    // per-shard token totals match the batch invariant (sum of inputs)
    assert(out(0).map(_.n_tokens).sum == 4500L && out(1).map(_.n_tokens).sum == 2100L)
  }

  test("sessionize rejects a watermark delay at or beyond the session gap") {
    import spark.implicits._
    val empty = spark.emptyDataset[graft.streaming.Stateful.SessionEvent]
    // ≥ gap would let accepted out-of-order events precede start − gap and
    // silently diverge from the batch twin — the guard must throw instead
    val e = intercept[IllegalArgumentException] {
      graft.streaming.Stateful.sessionize(empty, watermarkDelay = "60 minutes")
    }
    assert(e.getMessage.contains("session gap"))
    // the documented default stays accepted
    graft.streaming.Stateful.sessionize(empty, watermarkDelay = "10 minutes")
    assert(graft.streaming.Stateful.parseDelayMs("45 seconds") == 45000L)
  }

  test("streaming funnel advances stages across batches with the strict-ms + deadline rule") {
    import graft.streaming.Stateful.{FunnelEvent, FunnelOut}
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = Stateful.funnelStages(in.toDS())
      .writeStream.format("memory").queryName("funnel").outputMode("update").start()
    // user 1: full in-order conversion inside the 24h deadline, across batches
    // user 2: click with EARLIER event time than any view (in-order arrival;
    //         the batch twin also rejects it — no preceding view)
    // user 3: click exactly at the view's ms — strict > rejects the tie
    // user 4: OUT-OF-ORDER ARRIVAL — click@5min in batch 1, its view@0 only
    //         in batch 2: the one-pass fold never revisits the click, so the
    //         stream finishes at 1 where the batch re-sort would reach 2 —
    //         the documented lower bound under late arrival
    in.addData(
      FunnelEvent(1, 10, "view", ts(0)), FunnelEvent(1, 11, "click", ts(5)),
      FunnelEvent(2, 20, "click", ts(0)), FunnelEvent(2, 21, "view", ts(1)),
      FunnelEvent(3, 30, "view", ts(2)), FunnelEvent(3, 31, "click", ts(2)),
      FunnelEvent(4, 40, "click", ts(5)))
    q.processAllAvailable()
    in.addData(FunnelEvent(1, 12, "purchase", ts(9)),
      FunnelEvent(4, 41, "view", ts(0)))
    q.processAllAvailable()
    q.stop()
    // stage is monotone per user, so max = the latest emitted stage
    val last = spark.table("funnel").as[FunnelOut].collect()
      .groupBy(_.user_id).map { case (u, outs) => u -> outs.map(_.stage).max }
    assert(last(1L) == 3) // view->click->purchase, state carried across batches
    assert(last(2L) == 1) // click before any view cannot advance (batch agrees)
    assert(last(3L) == 1) // equal-ms click fails the strict comparison
    assert(last(4L) == 1) // late view: stream is a lower bound (batch says 2)
  }

  test("streaming funnel deadline: a step past 24h does not convert") {
    import graft.streaming.Stateful.{FunnelEvent, FunnelOut}
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = Stateful.funnelStages(in.toDS())
      .writeStream.format("memory").queryName("funnel_late").outputMode("update").start()
    val dayMin = (graft.operators.Sequence.FunnelDeadlineMs / 60000L).toInt
    in.addData(
      FunnelEvent(5, 1, "view", ts(0)),
      FunnelEvent(5, 2, "click", ts(dayMin + 1)), // 24h+1min after the view
      FunnelEvent(5, 3, "purchase", ts(dayMin + 2)))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("funnel_late").as[FunnelOut].collect().last
    assert(last.stage == 1) // stuck at the view: the click missed the deadline
  }
}
