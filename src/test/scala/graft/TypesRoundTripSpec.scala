package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Nested-type round-trips (SURVEY §2.3 "multimodal columns"): struct /
  * array / map / binary columns must survive a parquet write-read cycle
  * bit-exactly — the storage contract multimodal payload schemas rely on. */
class TypesRoundTripSpec extends SparkSpec {
  import spark.implicits._

  test("struct/array/map/binary columns round-trip through parquet") {
    val df = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .select(
        $"doc_id",
        struct($"lang", $"source", $"n_chars").as("meta"),
        split($"text", " ").as("tokens"),
        map(lit("lang"), $"lang", lit("source"), $"source").as("tags"),
        encode($"text", "UTF-8").as("payload"))
    val out = Files.createTempDirectory("types_rt").toString
    df.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)

    // parquet widens nullability on read (expected); types must match exactly
    assert(back.schema.catalogString == df.schema.catalogString)
    // content equality via full except in both directions (handles maps,
    // which are not hashable client-side)
    val flattenedA = df.select($"doc_id", $"meta.lang", $"meta.n_chars",
      concat_ws(" ", $"tokens").as("t"), $"tags"("lang").as("tl"), hex($"payload").as("p"))
    val flattenedB = back.select($"doc_id", $"meta.lang", $"meta.n_chars",
      concat_ws(" ", $"tokens").as("t"), $"tags"("lang").as("tl"), hex($"payload").as("p"))
    assert(flattenedA.exceptAll(flattenedB).count() == 0)
    assert(flattenedB.exceptAll(flattenedA).count() == 0)
    assert(back.count() == 500)
  }

  test("ivf approximation quality is quantified and sane on the fixture") {
    import graft.operators.Similarity
    val brute = Similarity.topkBruteForce(spark, sf("sf0.001"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.topkIvf(spark, sf("sf0.001"))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.map { q =>
      val got = ivf.getOrElse(q, Set.empty)
      got.intersect(brute(q)).size.toDouble / brute(q).size
    }.toSeq
    val mean = recalls.sum / recalls.size
    // IVF probes 2 cells of ~3 on this fixture: recall must be meaningfully
    // above random (10/499 ≈ 2%) — pin a generous floor so regressions in
    // cell assignment or probing are caught
    assert(mean > 0.2, s"mean IVF recall@10 = $mean")
  }
}
