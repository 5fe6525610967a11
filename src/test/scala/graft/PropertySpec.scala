package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY.md §5.2.4) using scalacheck generators with
  * a fixed seed (the scalatest-scalacheck bridge isn't in the offline cache,
  * so sampling is explicit — same coverage, deterministic replay). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // epoch millis across 1970..2100, as the reference keeps them: strings
  private val msGen: Gen[Long] = Gen.choose(0L, 4102444800000L)

  test("timestamp_dt derivation agrees with java.time UTC for arbitrary millis") {
    val ms = sample(Gen.listOfN(500, msGen), 42L)
    val df = ms.map(_.toString).toDF("timestamp_ms")
    val got = graft.operators.Ingest.deriveDate(df)
      .select($"timestamp_ms", $"timestamp_dt".cast("string"))
      .as[(String, String)].collect().toMap
    ms.foreach { m =>
      val expect = java.time.Instant.ofEpochSecond(m / 1000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      assert(got(m.toString) == expect, s"ms=$m")
    }
  }

  private val docGen: Gen[(String, Long)] = for {
    marker <- Gen.oneOf("EUR/GBP", "USD/CHF", "A", "x y", "")
    ms <- msGen
  } yield (marker, ms)

  test("decode(encode(docs)) recovers exactly the non-empty-keyed docs") {
    (1L to 10L).foreach { seed =>
      val docs = sample(Gen.listOfN(40, docGen), seed)
      // serialize: newline-join into one message per 3 docs
      val lines = docs.map { case (mk, ms) =>
        s"""{"timestamp_ms": "$ms", "fx_marker": "$mk"}"""
      }
      val messages = lines.grouped(3).map(_.mkString("\n")).toSeq
      val decoded = graft.operators.Ingest.filterKeyed(
          graft.operators.Ingest.decode(messages.toDF("value")))
        .select($"fx_marker", $"timestamp_ms")
        .as[(String, String)].collect().toList.sorted
      val expected = docs.filter(_._1.nonEmpty)
        .map { case (mk, ms) => (mk, ms.toString) }.sorted
      assert(decoded == expected, s"seed=$seed")
    }
  }

  // random token arrays: small vocab (forces duplicate shingles), mixed
  // lengths straddling every k in use (2, 3, 8), occasional unicode and
  // NULL tokens (concat_ws drops null + separator; the kernel must agree)
  private val toksGen: Gen[Seq[String]] = for {
    n <- Gen.choose(0, 30)
    toks <- Gen.listOfN(n,
      Gen.oneOf("a", "bb", "ccc", "dédé", "中文", "e f", null: String))
  } yield toks

  test("fused WordGramHashes equals the wordShingles+HashArray60+sort chain") {
    import graft.functions.Text._
    val rows = sample(Gen.listOfN(200, toksGen), 7L)
    Seq(2, 3, 8).foreach { k =>
      val df = rows.map(Tuple1(_)).toDF("toks")
      val out = df.select(
          graft.functions.WordGramHashes($"toks", k).as("fused"),
          array_sort(array_distinct(
            graft.functions.HashArray60(wordShingles($"toks", k)))).as("chain"))
        .filter(not($"fused" <=> $"chain"))
      assert(out.count() == 0, s"k=$k: ${out.take(1).toSeq}")
    }
  }

  test("fused MinhashFromTokens equals MinhashFromStrings over wordShingles") {
    import graft.functions.Text._
    val rows = sample(Gen.listOfN(200, toksGen), 11L)
    val df = rows.map(Tuple1(_)).toDF("toks")
    val perms = graft.operators.Dedup.MinhashPerms
    val prime = graft.operators.Dedup.MinhashPrime
    // MinhashFromStrings(wordShingles) yields null for < k tokens (empty
    // shingle set) — exactly the fused kernel's contract
    val out = df.select(
        graft.functions.MinhashFromTokens($"toks", 3, perms, prime).as("fused"),
        graft.functions.MinhashFromStrings(
          wordShingles($"toks", 3), perms, prime).as("chain"))
      .filter(not($"fused" <=> $"chain"))
    assert(out.count() == 0, out.take(1).toSeq.toString)
  }

  test("CharGrams equals the charShingles HOF formulation") {
    import graft.functions.Text._
    val strGen = for {
      n <- Gen.choose(0, 40)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'é', '中', ' '))
    } yield cs.mkString
    val rows = sample(Gen.listOfN(300, strGen), 13L)
    val df = rows.map(Tuple1(_)).toDF("s")
    Seq(3, 4).foreach { k =>
      val out = df.select(
          graft.functions.CharGrams($"s", k).as("fused"),
          charShingles($"s", k).as("chain"))
        .filter(not($"fused" <=> $"chain"))
      assert(out.count() == 0, s"k=$k: ${out.take(1).toSeq}")
    }
  }

  // distinct-gram arrays over a small alphabet, so profile overlaps (and
  // exact score ties, which exercise the lang-asc tiebreak) are common
  private val gramsGen: Gen[Seq[String]] = for {
    n <- Gen.choose(0, 25)
    gs <- Gen.listOfN(n, Gen.oneOf("aa", "ab", "ba", "bb", "cc", "cd", "dé", "中中"))
  } yield gs.distinct

  test("BestProfileIndex equals the IntersectCardinality argmax formulation") {
    import graft.functions.HashKernels.h60
    val profileGen = Gen.listOfN(4,
      Gen.someOf("aa", "ab", "ba", "bb", "cc", "cd", "dé", "中中").map(_.toSeq))
    (1L to 5L).foreach { seed =>
      val profiles: Array[Array[Long]] = sample(profileGen, seed)
        .map(_.map(s => h60(s)).sorted.toArray).toArray
      val rows = sample(Gen.listOfN(300, gramsGen), seed + 100)
      val df = rows.map(Tuple1(_)).toDF("grams")
      // reference formulation: the pre-round-5 per-language expression tree
      val entries = profiles.toSeq.zipWithIndex.map { case (ph, i) =>
        struct(
          graft.functions.IntersectCardinality(
            array_sort(graft.functions.HashArray60($"grams")), typedLit(ph.toSeq)).as("score"),
          lit(-i).as("negRank"))
      }
      val out = df
        .withColumn("fused", graft.functions.BestProfileIndex($"grams", profiles))
        .withColumn("best", array_max(array(entries: _*)))
        .select($"fused",
          when($"best.score" > 0, -$"best.negRank").cast("int").as("chain"))
        .filter(not($"fused" <=> $"chain"))
      assert(out.count() == 0, s"seed=$seed: ${out.take(1).toSeq}")
    }
  }

  test("NearestCentroid kernel equals the max_by join twin on random vectors") {
    import graft.operators.Similarity
    // random doubles INCLUDING near-tie clusters: vectors drawn from a
    // coarse value grid make rounded-cosine collisions common, driving the
    // kernel through its boundary-zone BigDecimal fallback
    val vecGen = Gen.listOfN(64, Gen.oneOf(-0.5, -0.25, 0.0, 0.25, 0.5, 0.125))
    (1L to 3L).foreach { seed =>
      val vecs = sample(Gen.listOfN(120, vecGen), seed)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = vecs.toDF("vec_id", "v")
        .withColumn("nrm", sqrt(graft.functions.DotProduct($"v", $"v")))
        .filter($"nrm" > 0)
      val cents = df.filter($"vec_id" % 10 === 0)
        .select($"vec_id".as("cent_id"), $"v".as("cv"), $"nrm".as("cn"))
      val k = Similarity.assignedCells(df, cents)
        .select($"vec_id", $"cent_id", $"csim")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      val j = Similarity.assignedCellsViaJoin(df, cents)
        .select($"vec_id", $"cent_id", $"csim")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(k == j, s"seed=$seed: first diff ${k.zip(j).find(p => p._1 != p._2)}")
    }
  }

  test("kernels survive non-finite cosines (zero-norm vector) without crashing") {
    // a zero-norm vector makes every cosine NaN; the kernel must degrade
    // like the join twin (Spark round() passes NaN through) instead of
    // throwing NumberFormatException from BigDecimal(NaN)
    val vecs = Seq(
      (0L, Seq.fill(64)(0.0)),            // zero norm → NaN cosines
      (1L, Seq.tabulate(64)(i => if (i == 0) 1.0 else 0.0)),
      (2L, Seq.tabulate(64)(i => if (i == 1) 1.0 else 0.0)))
    val df = vecs.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(graft.functions.DotProduct($"v", $"v")))
    // centroids: the finite-norm rows only (a NaN CENTROID poisons every
    // assignment identically in kernel and twin — not the case under test)
    val cents = df.filter($"nrm" > 0)
      .select($"vec_id".as("cent_id"), $"v".as("cv"), $"nrm".as("cn"))
    // must not throw; the zero-norm row's csim is NaN, the others finite
    val rows = graft.operators.Similarity.assignedCells(df, cents)
      .select($"vec_id", $"csim").as[(Long, Double)].collect().toMap
    assert(rows(0L).isNaN && !rows(1L).isNaN && !rows(2L).isNaN)
    // PqEncode with a NaN codebook entry: encodes without throwing
    val cbFlat = Seq.fill(64)(Double.NaN) ++ Seq.tabulate(64)(_ * 0.01)
    val codes = df.select(
        graft.functions.PqEncode($"v", cbFlat, 8, 8).as("codes"))
      .as[Seq[Int]].collect()
    assert(codes.length == 3 && codes.forall(_.length == 8))
  }

  test("gear chunk kernel's rolling hash equals the closed-form window sum") {
    import graft.functions.GearKernels
    // independent closed-form reference: h_i = sum_t gear[b_{i-t}] * 2^t,
    // boundary iff (h >> 20) % divisor == 0 — exactly what the DuckDB
    // oracles compute; the kernel's O(1)/byte rolling de-windowing must
    // reproduce it bit-for-bit on arbitrary byte content
    def reference(data: Array[Byte], divisor: Long): Seq[Int] = {
      val n = data.length
      if (n <= GearKernels.GearWindow) Seq(n)
      else {
        val b = (GearKernels.GearWindow to n - 1).filter { i =>
          val h = (0 until GearKernels.GearWindow).map { t =>
            GearKernels.gearTable(data(i - 1 - t) & 0xff) << t }.sum
          ((h >>> 20) % divisor) == 0L
        }
        b :+ n
      }
    }
    val rnd = new scala.util.Random(11)
    for (len <- Seq(0, 1, 7, 8, 9, 64, 1000); div <- Seq(32L, 64L)) {
      val data = Array.fill(len)(rnd.nextInt(256).toByte)
      val got = GearKernels.chunkEnds(data, div).toIntArray().toSeq
      assert(got == reference(data, div), s"len=$len div=$div")
    }
    // ... and on real fixture text bytes (the ASCII regime the oracle's
    // ord()-based closed form runs in)
    val text = graft.sources.Tables.documents(spark, sf("sf0.001"))
      .filter($"doc_id" < 5).select($"text").as[String].collect().mkString(" ")
    val bytes = text.getBytes("UTF-8")
    assert(GearKernels.chunkEnds(bytes, 64L).toIntArray().toSeq ==
      reference(bytes, 64L))
  }

  test("PqEncode kernel equals the min_by join twin on random vectors") {
    import graft.operators.Similarity
    import org.apache.spark.sql.expressions.Window
    val vecGen = Gen.listOfN(64, Gen.oneOf(-0.5, -0.25, 0.0, 0.25, 0.5, 0.125))
    (1L to 3L).foreach { seed =>
      val vecs = sample(Gen.listOfN(120, vecGen), seed)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = vecs.toDF("vec_id", "v").withColumn("nrm", lit(1.0))
      val cb = df.filter($"vec_id" % 15 === 0)
        .select($"vec_id".as("cid"), $"v".as("cv"))
        .withColumn("cidx", row_number().over(Window.orderBy($"cid")) - 1)
      val k = Similarity.pqEncode(df, cb).select($"vec_id", $"codes")
        .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
      val j = Similarity.pqEncodeViaJoin(df, cb).select($"vec_id", $"codes")
        .as[(Long, Seq[Int])].collect().sortBy(_._1).toSeq
      assert(k == j, s"seed=$seed: first diff ${k.zip(j).find(p => p._1 != p._2)}")
    }
  }

  test("CountInSet equals the per-token membership sum (with multiplicity)") {
    import graft.functions.HashKernels.h60
    val vocabStrings = Seq("aa", "ba", "cc", "dé")
    val vocab = vocabStrings.map(s => h60(s)).sorted.toArray
    // multiplicity matters: use NON-distinct token lists
    val toksGen2 = for {
      n <- Gen.choose(0, 25)
      gs <- Gen.listOfN(n, Gen.oneOf("aa", "ab", "ba", "bb", "cc", "cd", "dé", "中中"))
    } yield gs
    val rows = sample(Gen.listOfN(400, toksGen2), 17L)
    val df = rows.map(Tuple1(_)).toDF("toks")
    val out = df.select(
        graft.functions.CountInSet($"toks", vocab).as("fused"),
        size(filter($"toks", t => t.isin(vocabStrings: _*))).as("chain"))
      .filter(not($"fused" <=> $"chain"))
    assert(out.count() == 0, out.take(1).toSeq.toString)
  }
}
