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

  test("gram-size arguments accept int/long literals and reject the rest readably") {
    GraftExtensions.register(spark)
    val ok = spark.sql(
      "SELECT char_grams('abcd', CAST(3 AS BIGINT)) AS a, word_gram_hashes(array('x','y'), 2) AS b").head()
    assert(ok.getSeq[String](0) == Seq("abc", "bcd"))
    assert(ok.getSeq[Long](1).length == 1)
    val err = intercept[Exception] {
      spark.sql("SELECT char_grams('abcd', 'three')").collect()
    }
    assert(err.getMessage.contains("literal integer gram size"), err.getMessage)
  }

  test("qsketch functions compose end-to-end from SQL: build, union, " +
      "quantile — exact below capacity; bad p rejected readably") {
    GraftExtensions.register(spark)
    spark.range(1000)
      .select(col("id"), (col("id") % 101).cast("double").as("v"))
      .createOrReplaceTempView("qs_fixture")
    val row = spark.sql(
      """SELECT qsketch_quantile(qsketch_union(s), 0.5d) AS med
        |FROM (SELECT qsketch_build(xxhash64(id), v) AS s
        |      FROM qs_fixture GROUP BY id % 4)""".stripMargin).head()
    val exact = spark.sql("SELECT percentile(v, 0.5d) FROM qs_fixture")
      .head().getDouble(0)
    // 1000 occurrences < capacity: the unioned sample is the whole
    // multiset, so the SQL chain must be EXACT
    assert(row.getDouble(0) == exact,
      s"sql qsketch median ${row.getDouble(0)} != exact $exact")
    val err = intercept[Exception] {
      spark.sql("SELECT qsketch_quantile(CAST(NULL AS BINARY), v) FROM qs_fixture")
        .collect()
    }
    assert(err.getMessage.contains("literal double"), err.getMessage)
  }

  test("gear_chunk_ends is SQL-callable, honors the divisor, and covers the payload") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT gear_chunk_ends(encode('tiny', 'UTF-8')) AS short,
        |       gear_chunk_ends(encode(repeat('abcdef ', 200), 'UTF-8')) AS d64,
        |       gear_chunk_ends(encode(repeat('abcdef ', 200), 'UTF-8'), 16) AS d16
        |""".stripMargin).head()
    // below the window: one chunk covering the whole payload
    assert(row.getSeq[Int](0) == Seq(4))
    val (d64, d16) = (row.getSeq[Int](1), row.getSeq[Int](2))
    // ends ascend and always close at n; a finer divisor only ADDS cuts
    assert(d64.last == 1400 && d64 == d64.sorted && d16.last == 1400)
    assert(d16.size >= d64.size)
    assert(d64.toSet.subsetOf(d16.toSet),
      "coarser boundaries are a subset: divisor 64 zeros imply divisor-16 zeros... " +
        s"d64=$d64 d16=$d16")
    // non-positive divisor: rejected at analysis, not as a per-row
    // ArithmeticException inside a task (the literalInt convention)
    val err = intercept[Exception] {
      spark.sql("SELECT gear_chunk_ends(encode('abc', 'UTF-8'), 0)").collect()
    }
    assert(err.getMessage.contains("divisor must be >= 1"), err.getMessage)
  }

  test("count_in_set is SQL-callable with a literal set and rejects non-literals") {
    GraftExtensions.register(spark)
    val h = graft.functions.HashKernels.h60("aa")
    val row = spark.sql(
      s"SELECT count_in_set(array('aa', 'bb', 'aa'), array(${h}L)) AS c").head()
    assert(row.getInt(0) == 2) // multiplicity counts
    val err = intercept[Exception] {
      spark.sql("SELECT count_in_set(array('a'), array(rand()*0))").collect()
    }
    assert(err.getMessage.contains("literal array<bigint> set"), err.getMessage)
  }

  test("ragged/null dot_product input and empty minhash input yield null") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d)) AS ragged,
        |       dot_product(array(1.0d, cast(null AS double)), array(3.0d, 4.0d)) AS withnull,
        |       minhash(cast(array() AS array<bigint>), cast(array() AS array<bigint>)) AS m0
        |""".stripMargin).head()
    assert(row.isNullAt(0), "length mismatch must yield null")
    assert(row.isNullAt(1), "null element must yield null")
    assert(row.isNullAt(2), "empty minhash input must yield null")
  }

  test("hash kernels skip null elements; minhash over no elements is null") {
    val df = Seq(
      (1L, Seq(Option("a"), None, Option("b"))),
      (2L, Seq.empty[Option[String]]),
      (3L, Seq[Option[String]](None))
    ).toDF("id", "arr")
    val out = df.select($"id",
        graft.functions.HashArray60($"arr").as("h"),
        graft.functions.MinhashFromStrings($"arr", 4, 4294967311L).as("m"))
      .orderBy($"id").collect()
    assert(out(0).getSeq[Long](1) ==
      Seq(graft.functions.HashKernels.h60("a"), graft.functions.HashKernels.h60("b")))
    assert(!out(0).isNullAt(2))
    assert(out(1).getSeq[Long](1).isEmpty && out(1).isNullAt(2))
    assert(out(2).getSeq[Long](1).isEmpty && out(2).isNullAt(2))
  }

  test("centroid aggregator ignores wrong-dimension and null vectors") {
    val agg = udaf(new graft.functions.CentroidAgg(2))
    val df = Seq(
      ("a", Option(Seq(1.0, 3.0))),
      ("a", Option(Seq(3.0, 5.0))),
      ("a", Option(Seq(1.0))), // wrong dimension: not summed, not counted
      ("a", None)              // null: not summed, not counted
    ).toDF("k", "v")
    val out = df.groupBy($"k").agg(agg($"v").as("c")).head()
    assert(out.getSeq[Double](1) == Seq(2.0, 4.0))
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
