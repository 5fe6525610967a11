package graft

import org.apache.spark.sql.functions._

/** SQL-surface registration of the native expressions + agreement of the
  * gaps-and-islands session operator with Spark's native session_window. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       simhash(array(5L, 5L, 5L)) AS s,
        |       intersect_cardinality(array(1L,3L,7L), array(3L,5L,7L)) AS i,
        |       minhash(array(10L, 20L), array(3L, 1L)) AS m
        |""".stripMargin).head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getLong(1) == 5L) // all tokens equal: signature = the hash itself
    assert(row.getInt(2) == 2)
    val m = row.getSeq[Long](3)
    assert(m.length == 16 && m.head == 10L) // i=0: min(h1) = 10
  }

  test("gaps-and-islands sessions agree with Spark's native session_window") {
    val native = graft.sources.Tables.events(spark, sf("sf0.001"))
      .groupBy($"user_id",
        session_window($"ts", s"${graft.operators.Windows.SessionGapMinutes} minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("session_start"), $"n_events")
    val ours = graft.operators.Windows.sessions(spark, sf("sf0.001"))
      .select($"user_id", $"session_start", $"n_events")
    // same session count and identical (user, start, n) triples
    val a = native.as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val b = ours.as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(a == b, s"native=${a.size} ours=${b.size} diff=${(a diff b).take(3)} ${(b diff a).take(3)}")
  }
}
