package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{Models, Sampling, Similarity, TextAnalysis, Tokenizer}
import graft.sources.{Caches, Tables}

/** Trained-model persistence: every small-model artifact (BPE merges,
  * probe weights, mixture thresholds, DSIR counts, bigram-LM counts)
  * round-trips to disk and serves from a COLD session (all memos dropped)
  * bit-identically to in-session serving — the build-once/serve-forever
  * contract the index artifacts already carry, closed for the models. */
class ModelArtifactsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSeq

  test("every trained model serves from cold artifacts bit-identically") {
    import spark.implicits._
    Caches.releaseAll()
    val modelDir = java.nio.file.Files
      .createTempDirectory("graft-models").toString

    // deterministic serve workloads: stride slices re-keyed as "arrivals"
    val docSlice = Tables.documents(spark, dir)
      .filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 5000000L).as("doc_id"), $"source", $"lang",
        $"text")
    val vecSlice = Tables.embeddings(spark, dir)
      .filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 5000000L).as("vec_id"), $"embedding")

    // in-session references (training runs here, serving via the same
    // parameterized appliers the FromSaved wrappers call)
    val bpeRef = rows(Tokenizer.bpeEncodeRows(
      docSlice.select($"doc_id", $"text"),
      Tokenizer.bpeTrain(spark, dir)
        .orderBy($"rank").select($"left_sym", $"right_sym")
        .as[(String, String)].collect().toSeq).orderBy($"doc_id"))
    val probeW = Similarity.linearProbe(spark, dir)
      .orderBy($"dim").select($"weight").as[Double].collect()
    val probeRef = rows(Similarity.probeScoreStream(vecSlice, probeW)
      .orderBy($"vec_id"))
    val mixRef = rows(Sampling.mixtureRows(
        docSlice.select($"doc_id", $"source", $"lang"),
        Sampling.mixtureThresholds(spark, dir))
      .orderBy($"doc_id"))
    val (tgt, raw, totals) = Sampling.dsirModel(spark, dir)
    val dsirRef = rows(Sampling.dsirScoreRows(
      docSlice.select($"doc_id", $"text"), tgt, raw, totals)
      .orderBy($"doc_id"))
    val (bgc, uni, vocab) = TextAnalysis.lmModel(spark, dir)
    val lmRef = rows(TextAnalysis.lmScoreStream(
      docSlice.select($"doc_id", $"text"), bgc, uni, vocab)
      .orderBy($"doc_id"))
    assert(bpeRef.nonEmpty && probeRef.nonEmpty && mixRef.nonEmpty &&
      dsirRef.nonEmpty && lmRef.nonEmpty)

    Models.saveAll(spark, dir, modelDir)
    // the cold session: every in-session memo and cached frame dropped —
    // serving may read ONLY the persisted artifacts
    Caches.releaseAll()

    assert(rows(Models.bpeEncodeRowsFromSaved(spark, modelDir,
        docSlice.select($"doc_id", $"text")).orderBy($"doc_id")) == bpeRef,
      "BPE encode from saved merges differs")
    assert(rows(Models.probeScoreFromSaved(spark, modelDir, vecSlice)
        .orderBy($"vec_id")) == probeRef,
      "probe scores from saved weights differ")
    assert(rows(Models.mixtureRowsFromSaved(spark, modelDir,
        docSlice.select($"doc_id", $"source", $"lang"))
        .orderBy($"doc_id")) == mixRef,
      "mixture gating from saved thresholds differs")
    assert(rows(Models.dsirScoreFromSaved(spark, modelDir,
        docSlice.select($"doc_id", $"text")).orderBy($"doc_id")) == dsirRef,
      "DSIR scores from saved counts differ")
    assert(rows(Models.lmScoreFromSaved(spark, modelDir,
        docSlice.select($"doc_id", $"text")).orderBy($"doc_id")) == lmRef,
      "LM scores from saved counts differ")

    // cold-start ingest curation: the whole stateless gate chain booted
    // from the model dir alone matches the in-session chain
    val ingestRef = rows(graft.operators.Curate.ingestRows(
        docSlice.select($"doc_id", $"source", $"text"),
        Sampling.mixtureThresholds(spark, dir))
      .orderBy($"doc_id", $"chunk_id"))
    assert(rows(Models.ingestRowsFromSaved(spark, modelDir,
        docSlice.select($"doc_id", $"source", $"text"))
        .orderBy($"doc_id", $"chunk_id")) == ingestRef,
      "cold-start ingest chain differs from in-session")
    assert(ingestRef.nonEmpty)

    // crash-safe swap: an interrupted re-save (fully-written _compacting,
    // main deleted) recovers on the next load
    val fs = new org.apache.hadoop.fs.Path(modelDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(
      new org.apache.hadoop.fs.Path(s"$modelDir/probe_weights"),
      new org.apache.hadoop.fs.Path(s"$modelDir/probe_weights_compacting"))
    assert(rows(Models.probeScoreFromSaved(spark, modelDir, vecSlice)
        .orderBy($"vec_id")) == probeRef,
      "interrupted-swap recovery failed for a model artifact")
    Caches.releaseAll()
  }
}
