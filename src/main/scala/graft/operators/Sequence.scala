package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Ordered event-sequence analytics over the `events` fixture — the funnel
  * and cohort-retention queries every product-analytics warehouse runs at
  * scale (the reference's Kafka→Cassandra envelope carries exactly this kind
  * of clickstream; `cassandra_sink.scala:104-110` stops at per-row upsert —
  * these are the downstream reads such a sink feeds).
  *
  * Both operators are formulated to hold at 100 TB:
  *
  *  - [[funnel]] is ONE shuffle + ONE sort (partition by user, order by
  *    event time); the three stage predicates are chained running-`min`
  *    window aggregates over that single sort — Catalyst plans all three
  *    `Window` operators on the same exchange+sort with no re-shuffle, the
  *    sort spills per-partition, and no per-user event list is ever
  *    materialized in memory (deliberately NOT `collect_list`+fold, which
  *    dies on whale users).
  *  - [[retention]] is two shuffles: a partition-wide window `min` on
  *    user_id (first-touch cohort), then the (cohort, week)-keyed count
  *    distinct, which Spark executes as two-level partial aggregation on
  *    (cohort, week, user). User count per (cohort, week) cell is bounded
  *    by cohort size — no skew hotspot beyond what AQE handles.
  */
object Sequence {

  /** The ordered funnel: view → click → purchase. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Conversion deadline: each step must land within 24 h of the previous
    * step's anchor time, or the user does not convert. Without a deadline
    * every fixture user eventually does everything (67 events/user/month)
    * and the funnel degenerates to the distinct-user count; 24 h splits
    * the fixture 150 → 60 → 25 at sf0.01. */
  val FunnelDeadlineMs: Long = 86400000L

  /** Strict-ordered funnel with a conversion deadline: a user completes
    * step k+1 only with an event STRICTLY LATER (event-time ms) than —
    * and within [[FunnelDeadlineMs]] of — their earliest completion of
    * step k. Output is one row per step: (step, event_type, users).
    *
    * The window formulation: with events per user ordered by (ms, event_id)
    * and a ROWS-preceding frame, `t1_prev` = min ms of views before this
    * row; a click qualifies iff `t1_prev < ms ≤ t1_prev + deadline` —
    * equivalent to the global rule anchored on min(view ms) because any
    * strictly-earlier view precedes the click in the sort (so the running
    * min has already converged to the global min at every row that can
    * qualify), and equal-ms views fail the strict comparison on both
    * formulations (the DuckDB oracle is the global min-chain; the
    * equivalence is exact, not approximate). `t2_prev` chains the same
    * argument onto qualified clicks for the purchase step. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perUser = funnelUserFlags(Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", unix_millis($"ts").as("ms")))
    perUser
      .agg(sum($"s1").as("u1"), sum($"s2").as("u2"), sum($"s3").as("u3"))
      .select(explode(array(
        struct(lit(1).as("step"), lit(FunnelSteps(0)).as("event_type"), $"u1".as("users")),
        struct(lit(2).as("step"), lit(FunnelSteps(1)).as("event_type"), $"u2".as("users")),
        struct(lit(3).as("step"), lit(FunnelSteps(2)).as("event_type"), $"u3".as("users")))).as("f"))
      .select($"f.step", $"f.event_type", $"f.users")
      .orderBy($"step")
  }

  /** The per-user stage flags over any (user_id, event_id, event_type, ms)
    * relation — (user_id, s1, s2, s3) with s_k = 1 iff step k was completed
    * under the strict-ms + deadline rule. Exposed so the batch≡stream
    * parity spec can drive the SAME events through this window chain and
    * through `Stateful.funnelStages`' fold (`SequenceSpec`); the reached
    * stage is s1+s2+s3 by the chain's monotonicity (s_{k+1} ⇒ s_k). */
  private[graft] def funnelUserFlags(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val prev = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("t1_prev", min(when($"event_type" === FunnelSteps(0), $"ms")).over(prev))
      .withColumn("c2", $"event_type" === FunnelSteps(1) &&
        $"ms" > $"t1_prev" && $"ms" <= $"t1_prev" + FunnelDeadlineMs)
      .withColumn("t2_prev", min(when($"c2", $"ms")).over(prev))
      .withColumn("c3", $"event_type" === FunnelSteps(2) &&
        $"ms" > $"t2_prev" && $"ms" <= $"t2_prev" + FunnelDeadlineMs)
      .groupBy($"user_id").agg(
        max(when($"event_type" === FunnelSteps(0), 1).otherwise(0)).as("s1"),
        max(when($"c2", 1).otherwise(0)).as("s2"),
        max(when($"c3", 1).otherwise(0)).as("s3"))
  }

  /** Weekly cohort retention: cohort = the user's first-touch epoch DAY
    * (min event day), week_offset = whole weeks since cohort day; one row
    * per (cohort_day, week_offset) with the distinct active users. Epoch-day
    * integer arithmetic on both sides — no engine-specific week-truncation
    * semantics to diverge on. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // FLOOR division via the pmod identity: Spark's `div` truncates toward
    // zero where the oracle's DuckDB `//` floors — they agree only for
    // ms ≥ 0, and a pre-1970 timestamp would silently shift its cohort by
    // a day. (week_offset below is a plain `div`: day − cohort_day ≥ 0 by
    // the min, so truncation IS floor there.)
    val ev = Tables.events(spark, dir)
      .select($"user_id",
        expr("(unix_millis(ts) - pmod(unix_millis(ts), 86400000)) div 86400000").as("day"))
    val firstTouch = Window.partitionBy($"user_id")
    ev.withColumn("cohort_day", min($"day").over(firstTouch))
      .withColumn("week_offset", expr("(day - cohort_day) div 7"))
      .groupBy($"cohort_day", $"week_offset")
      .agg(countDistinct($"user_id").as("active_users"))
      .orderBy($"cohort_day", $"week_offset")
  }
}
