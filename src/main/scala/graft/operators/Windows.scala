package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.Num._

/** Event-time windowing over the `events` fixture. Each operator is written
  * against a batch DataFrame here (DuckDB-oracle-checkable, SURVEY.md §5.2
  * "batch twin" rule); `graft.streaming.Stateful` runs the same shapes under
  * readStream with watermarks.
  *
  * Scale: tumbling/sliding windows are groupBy on a derived time bucket —
  * one shuffle, map-side partial agg. Sliding replicates each row
  * window/slide (=2×) before the shuffle. Session windows are the classic
  * gaps-and-islands: one shuffle on user_id, a per-user sort, no further
  * exchanges (at 100 TB: keys are users ⇒ high cardinality, no skew hotspot;
  * a salted variant would only be needed for pathological single-user
  * firehoses).
  */
object Windows {

  /** Tumbling 15-minute windows: event count + exact value sum per window. */
  def tumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), moneySum($"value").as("sum_value"))
      .select($"w.start".as("window_start"), $"n_events", $"sum_value")
      .orderBy($"window_start")
  }

  /** Sliding windows (1 hour, 30-minute slide): each event lands in 2
    * windows. */
  def sliding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), moneySum($"value").as("sum_value"))
      .select($"w.start".as("window_start"), $"n_events", $"sum_value")
      .orderBy($"window_start")
  }

  val AttributionMinutes = 30

  /** Interval (range) join: attribute each purchase to the same user's
    * clicks in the preceding 30 minutes. Implemented scalably: both sides
    * are blocked into 30-minute time buckets and the click side is
    * replicated to (bucket, bucket+1), so the range condition becomes an
    * equi-join on (user, bucket) with a residual filter — pair space is
    * per-user-per-bucket, never |clicks|×|purchases|. Streaming twin:
    * `Stateful.streamAttribution` (same predicate under watermarks). */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val winMs = AttributionMinutes * 60000L
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", $"ts", unix_millis($"ts").as("ms"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ms".as("p_ms"),
        ($"ms" / winMs).cast("long").as("bucket"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"), $"ms".as("c_ms"),
        explode(array(($"ms" / winMs).cast("long"), ($"ms" / winMs).cast("long") + 1)).as("bucket"))
    purchases.join(clicks,
        $"user_id" === $"c_user" && purchases("bucket") === clicks("bucket") &&
          $"c_ms" <= $"p_ms" && $"c_ms" > $"p_ms" - winMs)
      .select($"user_id", $"purchase_id", $"click_id", ($"p_ms" - $"c_ms").as("lag_ms"))
      .orderBy($"user_id", $"purchase_id", $"click_id")
  }

  val SessionGapMinutes = 30

  /** Session windows per user with a 30-minute inactivity gap —
    * gaps-and-islands with window functions: session starts where the gap
    * from the previous event exceeds the threshold; session_id is the
    * running count of starts. Batch twin of streaming session_window. */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", unix_millis($"ts").as("ms"))
      .withColumn("prev_ms", lag($"ms", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ms".isNull ||
          $"ms" - $"prev_ms" > SessionGapMinutes * 60000L, 1).otherwise(0))
      .withColumn("session_seq", sum($"new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_seq")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id", $"session_seq")
  }
}
