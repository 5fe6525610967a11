package graft

import org.apache.spark.sql.functions._

/** Structural contract of the context-window chunking: full token coverage,
  * correct overlap, and short-tail handling — properties the row-hash oracle
  * can't state directly. */
class ChunkingSpec extends SparkSpec {

  test("every token is covered and chunks advance by the stride") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val chunks = graft.operators.Packing.chunking(spark, dir)
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", size(split($"text", " ")).as("n"))
    val agg = chunks.groupBy($"doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max($"chunk_start" + $"n_chunk_tokens").as("covered"),
      min($"n_chunk_tokens").as("min_len"),
      max($"n_chunk_tokens").as("max_len"))
    val joined = agg.join(docs, "doc_id")
    // the last chunk ends exactly at the token count: nothing dropped
    assert(joined.filter($"covered" =!= $"n").count() == 0)
    // chunk count is the closed form ⌊(n−1)/stride⌋+1
    assert(joined.filter($"n_chunks" =!=
      (floor(($"n" - 1) / graft.operators.Packing.ChunkStride) + 1)).count() == 0)
    // no chunk exceeds the window, none is empty
    assert(joined.filter($"max_len" > graft.operators.Packing.ChunkSize ||
      $"min_len" <= 0).count() == 0)
  }
}
