package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The stateless per-row operators (quality scoring, context chunking) must
  * run UNCHANGED on a stream — same function, same results as batch over the
  * same rows. This is the library's batch/stream unification contract for
  * its projection-shaped operators: ingest-time gating and context
  * preparation reuse the verified batch logic verbatim. */
class StreamProjectionSpec extends SparkSpec {

  private def docRows(n: Int): Seq[(Long, String, Long)] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)].head(n).toSeq
  }

  test("quality scoring agrees batch vs stream on the same documents") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val rows = docRows(20)
    val in = MemoryStream[(Long, String, Long)]
    val q = graft.operators.TextAnalysis.qualityRows(
        in.toDF().toDF("doc_id", "text", "n_chars"))
      .writeStream.format("memory").queryName("sq").outputMode("append").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sq").orderBy($"doc_id")
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.TextAnalysis.qualityRows(
        rows.toDF("doc_id", "text", "n_chars")).orderBy($"doc_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.size == 20)
  }

  test("chunking agrees batch vs stream on the same documents") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val rows = docRows(10).map { case (id, text, _) => (id, text) }
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.Packing.chunkRows(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sc").outputMode("append").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sc").orderBy($"doc_id", $"chunk_id")
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Packing.chunkRows(rows.toDF("doc_id", "text"))
      .orderBy($"doc_id", $"chunk_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("pii scrubbing agrees batch vs stream on the same raw rows") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val rows = docRows(15).map { case (id, text, _) =>
      (id, s"$text mail me at user$id@test.org or call +44 20 7946 $id from 192.168.0.$id")
    }
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.TextAnalysis.piiScrubRows(in.toDF().toDF("doc_id", "raw"))
      .writeStream.format("memory").queryName("sp").outputMode("append").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sp").orderBy($"doc_id")
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.TextAnalysis.piiScrubRows(
        rows.toDF("doc_id", "raw")).orderBy($"doc_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.size == 15)
    // and the scrub actually redacted each injected shape
    assert(batch.forall(r => r(3).toString.contains("<EMAIL>") &&
      r(3).toString.contains("<IP>") && r(3).toString.contains("<PHONE>")))
  }

  test("LM model trained in batch scores a stream identically to batch; unseen text priced by smoothing") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val dir = sf("sf0.001")
    val (bgc, uni, v) = graft.operators.TextAnalysis.lmModel(spark, dir)
    val corpusRows = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].head(30).toSeq
    // plus a doc of tokens the model has never seen: every bigram prices at
    // the unseen-history floor 1/V => avg_nll = ln(V)
    val novel = (999999L, "qqxx wwyy eezz")
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.TextAnalysis.lmScoreStream(
        in.toDF().toDF("doc_id", "text"), bgc, uni, v)
      .writeStream.format("memory").queryName("lms").outputMode("update").start()
    in.addData(corpusRows :+ novel: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("lms")
      .groupBy($"doc_id").agg(org.apache.spark.sql.functions.last($"avg_nll").as("avg_nll"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed.contains(novel._1))
    assert(math.abs(streamed(novel._1) - math.log(v.toDouble)) < 1e-6,
      s"novel doc nll ${streamed(novel._1)} vs ln(V)=${math.log(v.toDouble)}")
    // corpus docs scored by the full-corpus model in stream = batch scores
    // from the same full-corpus model (lmPerplexity trains on the FULL
    // corpus, and these 30 docs are a subset of it)
    val fullBatch = graft.operators.TextAnalysis.lmPerplexity(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    corpusRows.foreach { case (id, _) =>
      assert(streamed(id) == fullBatch(id), s"doc $id: ${streamed(id)} vs ${fullBatch(id)}")
    }
  }

  test("DSIR model trained in batch scores a stream identically to batch") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val dir = sf("sf0.001")
    val (tgt, raw, totals) = graft.operators.Sampling.dsirModel(spark, dir)
    val rows = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].head(30).toSeq
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.Sampling.dsirScoreRows(
        in.toDF().toDF("doc_id", "text"), tgt, raw, totals)
      .writeStream.format("memory").queryName("dsir").outputMode("update").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dsir")
      .groupBy($"doc_id").agg(org.apache.spark.sql.functions.last($"logw").as("logw"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the oracled batch query scores these same docs with the same
    // full-corpus model — stream scores must match bit-for-bit
    val batch = graft.operators.Sampling.dsir(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    rows.foreach { case (id, _) =>
      assert(streamed(id) == batch(id), s"doc $id: ${streamed(id)} vs ${batch(id)}")
    }
  }

  test("mixture policy trained in batch gates a stream identically to batch") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val dir = sf("sf0.001")
    val thresholds = graft.operators.Sampling.mixtureThresholds(spark, dir)
    val rows = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"source").as[(Long, String)].head(60).toSeq
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.Sampling.mixtureRows(
        in.toDF().toDF("doc_id", "source"), thresholds)
      .writeStream.format("memory").queryName("mx").outputMode("append").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("mx").orderBy($"doc_id")
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Sampling.mixtureRows(
        rows.toDF("doc_id", "source"), thresholds).orderBy($"doc_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // non-vacuous: the policy must actually drop something and keep something
    assert(streamed.nonEmpty && streamed.size < rows.size)
  }

  test("curriculum policy trained in batch bands a stream identically to batch") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val dir = sf("sf0.001")
    val thresholds = graft.operators.Sampling.curriculumThresholds(spark, dir)
    val rows = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].head(60).toSeq
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.Sampling.curriculumRows(
        in.toDF().toDF("doc_id", "text"), thresholds)
      .writeStream.format("memory").queryName("curr").outputMode("append").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curr").orderBy($"doc_id")
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Sampling.curriculumRows(
        rows.toDF("doc_id", "text"), thresholds).orderBy($"doc_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // non-vacuous: the quartile policy must actually split the sample
    val bands = streamed.map(_(2)).distinct
    assert(bands.size >= 3)
  }

  test("temperature policy trained in batch gates a stream identically to batch") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val dir = sf("sf0.001")
    val thresholds = graft.operators.Sampling.temperatureThresholds(spark, dir)
    val rows = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"lang").as[(Long, String)].head(60).toSeq
    // ... plus a language the policy never saw: it must SURFACE with
    // threshold 0 / selected=false (conservative reject), not silently
    // vanish the way the old inner join dropped it
    val unseen = (999999L, "xx-unseen")
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.Sampling.temperatureMixtureRows(
        in.toDF().toDF("doc_id", "lang"), thresholds)
      .writeStream.format("memory").queryName("tmx").outputMode("append").start()
    in.addData(rows :+ unseen: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tmx").orderBy($"doc_id")
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Sampling.temperatureMixtureRows(
        (rows :+ unseen).toDF("doc_id", "lang"), thresholds).orderBy($"doc_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    val unseenRow = streamed.find(_.head == 999999L)
    assert(unseenRow.exists(r => r(2) == 0L && r(3) == false),
      s"unseen language must surface rejected: $unseenRow")
    // non-vacuous: both decisions occur in the streamed window
    val flags = streamed.map(_.last).toSet
    assert(flags == Set(true, false))
  }

  test("ingest-time curation chain (quality -> mixture -> scrub -> chunk) agrees batch vs stream") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val dir = sf("sf0.001")
    val thresholds = graft.operators.Sampling.mixtureThresholds(spark, dir)
    // real fixture docs with PII injected into the text body, so the scrub
    // stage inside the chain is exercised, not vacuous
    val rows = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"n_chars", $"source")
      .as[(Long, String, Long, String)].head(80).toSeq
      .map { case (id, text, nc, src) =>
        // PII leads the text so the placeholder lands on a chunk boundary
        // (chunk rows expose first/last tokens only)
        (id, s"bot$id@spam.example $text", nc, src) }
    val in = MemoryStream[(Long, String, Long, String)]
    val q = graft.operators.Curate.ingestRows(
        in.toDF().toDF("doc_id", "text", "n_chars", "source"), thresholds)
      .writeStream.format("memory").queryName("ic").outputMode("append").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ic").orderBy($"doc_id", $"chunk_id")
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Curate.ingestRows(
        rows.toDF("doc_id", "text", "n_chars", "source"), thresholds)
      .orderBy($"doc_id", $"chunk_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // the chain gates (mixture dropped some docs) and scrubs (the injected
    // address became a placeholder token in some chunk)
    val docIds = streamed.map(_.head).distinct
    assert(docIds.nonEmpty && docIds.size < rows.size)
    val toks = streamed.flatMap(r => Seq(r(4).toString, r(5).toString))
    assert(toks.contains("<EMAIL>") && !toks.exists(_.contains("@")))
  }
}
