package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The capstone composition: an end-to-end training-data curation pass built
  * ENTIRELY from the library's verified operators —
  *
  *   quality floor (TextAnalysis.quality)
  *   ∧ language confidence (TextAnalysis.langId: prediction == label)
  *   ∧ near-dup removal (Dedup.clusters: keep only cluster survivors)
  *   → deterministic stratified sample per language (Sampling's content-hash
  *     ranking — same rows on any engine, cluster size, or day)
  *
  * This is the shape a dataset-release pipeline actually runs, and it proves
  * the operators COMPOSE: one DAG, each stage reusing the cached
  * sub-pipelines it shares with the standalone queries. At 100 TB each stage
  * keeps its own posture (per-row projections, one profile shuffle, the
  * sparse pair graph) — composition adds joins on doc_id only, all
  * hash-partitioned on the same key.
  */
object Curate {

  val QualityFloor = 0.45
  val PerLang = 10

  def curate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val quality = TextAnalysis.quality(spark, dir).select($"doc_id", $"quality")
    val confident = TextAnalysis.langId(spark, dir)
      .filter($"correct").select($"doc_id")
    val dupLosers = Dedup.clusters(spark, dir)
      .filter($"cluster_rep" =!= $"doc_id").select($"doc_id")
    val kept = Tables.documents(spark, dir).select($"doc_id", $"lang")
      .join(quality, "doc_id").filter($"quality" >= QualityFloor)
      .join(confident, "doc_id")
      .join(dupLosers, Seq("doc_id"), "left_anti")
    Sampling.rankPerStratum(kept, "lang", PerLang)
      .select($"lang", $"rn", $"doc_id", $"quality")
      .orderBy($"lang", $"rn")
  }

  /** Ingest-time curation: the STREAMING twin of the batch pass, composed
    * entirely from the library's stateless row stages so one call runs
    * unchanged on a batch corpus or an arriving micro-batch —
    *
    *   quality gate ([[TextAnalysis.withQuality]] ≥ [[QualityFloor]])
    *   → mixture gate ([[Sampling.mixtureRows]] vs a batch-trained
    *     broadcast policy — yesterday's corpus trains, today's ingest gates)
    *   → PII scrub ([[TextAnalysis.piiScrubRows]] on the text)
    *   → context chunking ([[Packing.chunkRows]] over the SCRUBBED text)
    *
    * What the batch [[curate]] has that this cannot: corpus-global stages
    * (language-ID profile training, near-dup clustering, deterministic
    * stratified sampling) — those need the whole corpus and stay batch;
    * the stream twin gates and prepares what arrives. No shuffle, no state:
    * the only non-projection is the broadcast policy join.
    * `StreamProjectionSpec` pins batch ≡ stream. */
  def ingestRows(rows: DataFrame, thresholds: DataFrame): DataFrame = {
    val gated = TextAnalysis.withQuality(rows)
      .filter(col("quality") >= QualityFloor)
      .select(rows.columns.map(col).toIndexedSeq: _*)
    val mixed = Sampling.mixtureRows(gated, thresholds)
    val scrubbed = TextAnalysis.piiScrubRows(
      mixed.select(col("doc_id"), col("text").as("raw")))
    Packing.chunkRows(scrubbed.select(col("doc_id"), col("clean").as("text")))
  }

  /** The last mile: [[curate]]'s selected documents cut into model-context
    * chunks ([[Packing.chunkRows]]) — the full corpus → curated docs →
    * training-sequence shape a dataset release actually ships. The curated
    * selection is tiny relative to the corpus (a per-language sample), so it
    * broadcasts into a semi-join that prunes the corpus BEFORE the chunk
    * fanout — only survivors are ever tokenized and exploded. */
  def prepare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val selected = curate(spark, dir).select($"lang", $"doc_id")
    val survivors = Tables.documents(spark, dir)
      .join(broadcast(selected), "doc_id")
    Packing.chunkRows(survivors.select($"doc_id", $"text"))
      .join(broadcast(selected), "doc_id")
      .select($"lang", $"doc_id", $"chunk_id", $"chunk_start",
        $"n_chunk_tokens", $"first_token", $"last_token")
      .orderBy($"lang", $"doc_id", $"chunk_id")
  }
}
