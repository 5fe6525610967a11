package graft

import org.apache.spark.sql.functions._
import graft.operators.Tokenizer

/** BPE training semantics beyond the DuckDB hash-compare: the merge
  * application is exact (disjoint-match collapse, no re-merge within a
  * round), and training is deterministic with well-formed output. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def applied(s: Seq[String], l: String, r: String): Seq[String] =
    Seq(Tuple1(s)).toDF("s")
      .select(Tokenizer.applyMerge($"s", l, r).as("out"))
      .as[Seq[String]].head()

  test("applyMerge collapses every disjoint occurrence, including adjacent ones") {
    assert(applied(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(applied(Seq("x", "a", "b", "y"), "a", "b") == Seq("x", "ab", "y"))
    assert(applied(Seq("a", "b", "b"), "a", "b") == Seq("ab", "b"))
    // no occurrence -> unchanged; boundary positions are total (no OOB)
    assert(applied(Seq("b", "a"), "a", "b") == Seq("b", "a"))
    assert(applied(Seq("a"), "a", "b") == Seq("a"))
  }

  test("bpe encoding with trained merges compresses and agrees batch vs stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val dir = sf("sf0.001")
    val merges = Tokenizer.bpeTrain(spark, dir)
      .as[(Int, String, String, String, Long)].collect()
      .sortBy(_._1).map(m => (m._2, m._3)).toSeq
    val rows = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].head(25).toSeq
    val batch = Tokenizer.bpeEncodeRows(rows.toDF("doc_id", "text"), merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // every doc: 0 < n_bpe <= n_chars, and the corpus-trained merges must
    // actually fire somewhere (global compression)
    assert(batch.values.forall { case (_, c, b) => b > 0 && b <= c })
    assert(batch.values.map(_._3).sum < batch.values.map(_._2).sum)
    val in = MemoryStream[(Long, String)]
    val q = Tokenizer.bpeEncodeRows(in.toDF().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName("bpe").outputMode("update").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("bpe")
      .groupBy($"doc_id").agg(
        org.apache.spark.sql.functions.last($"n_words").as("w"),
        org.apache.spark.sql.functions.last($"n_char_symbols").as("c"),
        org.apache.spark.sql.functions.last($"n_bpe_symbols").as("b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(streamed == batch)
  }

  test("bpe training is deterministic and well-formed on the fixture") {
    val dir = sf("sf0.001")
    val out = Tokenizer.bpeTrain(spark, dir)
      .as[(Int, String, String, String, Long)].collect()
    assert(out.map(_._1).toSeq == (1 to Tokenizer.BpeMerges))
    assert(out.forall { case (_, l, r, m, w) => m == l + r && l != r && w > 0 })
    // each merge rule is distinct
    assert(out.map(_._4).distinct.length == out.length)
    val again = Tokenizer.bpeTrain(spark, dir)
      .as[(Int, String, String, String, Long)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("batched bpe training equals sequential on the fixture, in fewer rounds") {
    val dir = sf("sf0.001")
    val seq = Tokenizer.bpeTrain(spark, dir)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // non-interacting batch members keep sequential counts AND sequential
    // selection order — ranks, symbols and weights all bit-identical at
    // the widths whose batches re-count before a created pair can rank
    for (k <- Seq(2, 3)) {
      val batched = Tokenizer.bpeTrainBatched(spark, dir,
          Tokenizer.BpeMerges, batchK = k)
        .as[(Int, String, String, String, Long)].collect().toSeq
      assert(batched == seq, s"batchK=$k:\n$batched\n$seq")
    }
    // ... and the ONE documented divergence window, pinned exactly: at
    // k = 6 the whole run is one batch, so sequential's 6th pick — the
    // pair ("er","</w>") CREATED by merge 1 — cannot be seen; the batch
    // defers it and takes the next uncreated pair instead. Everything
    // before the created pair's rank is still bit-identical.
    val one = Tokenizer.bpeTrainBatched(spark, dir,
        Tokenizer.BpeMerges, batchK = 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(one.take(5) == seq.take(5), s"prefix must agree:\n$one\n$seq")
    val mergedSyms = seq.take(5).map(_._4).toSet
    assert(mergedSyms.contains(seq(5)._2) || mergedSyms.contains(seq(5)._3),
      s"sequential's divergent pick must be a created pair: ${seq(5)}")
    assert(!mergedSyms.contains(one(5)._2) && !mergedSyms.contains(one(5)._3),
      s"the batch's pick must predate the batch: ${one(5)}")
  }

  test("interaction predicate matches the overlap semantics applyMerge relies on") {
    // (x,a)+(a,b): share the middle symbol -> matches can overlap
    assert(Tokenizer.interacts(("x", "a"), ("a", "b")))
    assert(Tokenizer.interacts(("a", "b"), ("x", "a")))
    // disjoint symbol boundaries -> provably disjoint matches
    assert(!Tokenizer.interacts(("a", "b"), ("c", "d")))
    // shared LEFT symbols (a,b)+(a,c) never overlap (one position cannot
    // hold both b and c)
    assert(!Tokenizer.interacts(("a", "b"), ("a", "c")))
    // one's MERGED symbol is the other's component: applying (ab,c)->"abc"
    // CREATES (x,"abc") occurrences when "abc" is already a vocabulary
    // symbol, so the pooled count of (x,"abc") is stale -> interacting
    assert(Tokenizer.interacts(("ab", "c"), ("x", "abc")))
    assert(Tokenizer.interacts(("x", "abc"), ("ab", "c")))
    assert(Tokenizer.interacts(("ab", "c"), ("abc", "y")))
    // two spellings of the same merged string conflate symbol identity
    assert(Tokenizer.interacts(("a", "bc"), ("ab", "c")))
  }
}
