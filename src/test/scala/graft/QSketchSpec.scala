package graft

import org.apache.spark.sql.functions._
import graft.functions.{QSketch, QSketchKernel}

/** The mergeable bottom-k quantile sketch: canonical serialization,
  * order/partitioning independence, union mergeability, exactness at or
  * below capacity, sampling accuracy above it, and null semantics. */
class QSketchSpec extends SparkSpec {

  private def sketchOf(rows: Seq[(Long, Double)]): Array[Byte] = {
    val agg = new graft.functions.QSketchBuildAgg
    var b = agg.zero
    rows.foreach(r => b = agg.reduce(b, r))
    agg.finish(b)
  }

  test("qsketch: canonical bytes — any insertion order, split, or merge " +
      "tree yields identical serialization") {
    val rows = (1 to 10000).map(i => (i.toLong, (i % 977).toDouble))
    val a = sketchOf(rows)
    val b = sketchOf(scala.util.Random.shuffle(rows))
    assert(java.util.Arrays.equals(a, b), "insertion order changed the bytes")
    // merge of disjoint halves == build of the whole
    val agg = new graft.functions.QSketchUnionAgg
    val (l, r) = rows.splitAt(4321)
    var u = agg.zero
    u = agg.reduce(u, sketchOf(l))
    u = agg.reduce(u, sketchOf(r))
    assert(java.util.Arrays.equals(agg.finish(u), a),
      "union of split sketches != sketch of the union")
    // overlapping replay (same occurrences twice) collapses exactly
    var v = agg.zero
    v = agg.reduce(v, a)
    v = agg.reduce(v, sketchOf(l))
    assert(java.util.Arrays.equals(agg.finish(v), a),
      "replayed occurrences inflated the sample")
  }

  test("qsketch: at or below capacity the sample is the whole multiset " +
      "and interpolated quantiles are exact") {
    val vals = (0 until 1000).map(_.toDouble)
    val b = sketchOf(vals.zipWithIndex.map { case (v, i) => (i.toLong, v) })
    assert(QSketchKernel.sampleSize(b) == 1000)
    // interpolated quantile == Spark percentile semantics on the sorted set
    assert(QSketchKernel.quantileBoxed(b, 0.5) == 499.5)
    assert(QSketchKernel.quantileBoxed(b, 0.0) == 0.0)
    assert(QSketchKernel.quantileBoxed(b, 1.0) == 999.0)
    assert(math.abs(QSketchKernel.quantileBoxed(b, 0.9) - 899.1) < 1e-9)
    // duplicate VALUES from different docs are distinct occurrences
    val dup = sketchOf(Seq((1L, 7.0), (2L, 7.0), (3L, 1.0)))
    assert(QSketchKernel.sampleSize(dup) == 3)
    assert(QSketchKernel.quantileBoxed(dup, 1.0) == 7.0)
  }

  test("qsketch: above capacity the bottom-k sample bounds rank error") {
    val n = 60000
    val rows = (0 until n).map(i => (QSketchKernel.mix64(i.toLong), i.toDouble))
    val b = sketchOf(rows)
    assert(QSketchKernel.sampleSize(b) == QSketchKernel.K)
    for (p <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = QSketchKernel.quantileBoxed(b, p)
      val rank = est / n // values are 0..n-1, so value/n IS the rank
      assert(math.abs(rank - p) < 0.04,
        s"p=$p: estimated rank $rank off by ${math.abs(rank - p)}")
    }
  }

  test("qsketch: malformed binaries fail by name, not by buffer underflow") {
    val good = sketchOf(Seq((1L, 2.0)))
    for (bad <- Seq(Array[Byte](1, 2), good.dropRight(3),
        good ++ Array[Byte](0), Array[Byte](-1, -1, -1, -1))) {
      val e = intercept[IllegalArgumentException] {
        QSketchKernel.quantileBoxed(bad, 0.5)
      }
      assert(e.getMessage.contains("qsketch"), e.getMessage)
    }
  }

  test("qsketch: NaN values are skipped (null semantics); empty input " +
      "and null sketches serve null") {
    val b = sketchOf(Seq((1L, Double.NaN), (2L, 5.0), (3L, Double.NaN)))
    assert(QSketchKernel.sampleSize(b) == 1)
    assert(QSketchKernel.quantileBoxed(b, 0.5) == 5.0)
    val empty = sketchOf(Seq((1L, Double.NaN)))
    assert(empty == null, "all-NaN input must finish to null")
    val union = new graft.functions.QSketchUnionAgg
    var u = union.zero
    u = union.reduce(u, null)
    assert(union.finish(u) == null, "union of nulls must stay null")
  }

  test("qsketch: distributed build over a DataFrame equals the local " +
      "build, and the quantile expression serves through codegen") {
    import spark.implicits._
    val n = 20000
    val df = spark.range(n).repartition(13)
      .select(col("id"), (col("id") % 997).cast("double").as("v"))
    val b = df.agg(QSketch.buildAgg(xxhash64(col("id")), col("v")).as("s"))
      .select(col("s")).as[Array[Byte]].head()
    val hs = df.select(col("id"), xxhash64(col("id")).as("h"))
      .as[(Long, Long)].collect().toMap
    val local = sketchOf((0 until n)
      .map(i => (hs(i.toLong), (i % 997).toDouble)))
    assert(java.util.Arrays.equals(b, local),
      "13-partition distributed build != local sequential build")
    // serve through the native expression (codegen path)
    val est = df.agg(QSketch.buildAgg(xxhash64(col("id")), col("v")).as("s"))
      .select(QSketch.quantile(col("s"), 0.5).as("q"))
      .as[Double].head()
    val exact = df.selectExpr("percentile(v, 0.5)").as[Double].head()
    assert(math.abs(est - exact) <= math.max(25.0, exact * 0.05),
      s"median estimate $est vs exact $exact")
  }
}
