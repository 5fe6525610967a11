package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Partition-layout pruning: a date-partitioned write must let a date
  * filter prune directories at planning time (PartitionFilters on the scan,
  * not a post-scan Filter) — the layout that turns a 100 TB time-range query
  * into a few-partition read. */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned layout prunes partitions for a date filter") {
    val out = Files.createTempDirectory("events_bydate").toString
    graft.sources.Tables.events(spark, sf("sf0.001"))
      .withColumn("event_date", to_date($"ts"))
      .write.partitionBy("event_date").mode("overwrite").parquet(out)

    val pruned = spark.read.parquet(out)
      .filter($"event_date" === "2024-01-15")
    val plan = pruned.queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("PartitionFilters: [isnotnull(event_date"), scan)
    // pruning actually cut the read: scanned row count equals the one day
    val expected = graft.sources.Tables.events(spark, sf("sf0.001"))
      .filter(to_date($"ts") === "2024-01-15").count()
    assert(pruned.count() == expected && expected > 0)
  }
}
