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
}
