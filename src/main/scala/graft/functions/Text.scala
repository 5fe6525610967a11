package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text/hash primitives shared by dedup, similarity and text-analysis
  * operators. Everything here is a pure Catalyst expression tree (codegen'd,
  * no UDFs) designed to be **engine-portable**: the identical computation is
  * expressible in ANSI-ish SQL (DuckDB) so every operator built on these
  * primitives is oracle-checkable.
  *
  * The portable hash is md5-based: `hash60(s)` = first 15 hex chars of
  * md5(s) parsed as a 60-bit non-negative bigint. md5 is overkill
  * cryptographically but it is the one hash both engines compute
  * bit-identically; at 100 TB one would swap in xxhash64 behind the same
  * Column-combinator seam (the operator shapes are hash-agnostic).
  */
object Text {

  /** 60-bit non-negative portable hash.
    * DuckDB twin: CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT).
    * Backed by the native [[Hash60]] kernel — one compiled digest + shift,
    * bit-identical to the conv/substring/md5 chain (HashKernels contract);
    * `plans.KernelRewrites` rewrites the interpreted chain to this kernel
    * when it appears in user-written plans too. */
  def hash60(s: Column): Column = Hash60(s)

  /** 32-bit fold of hash60 (for bit-level ops that must avoid sign traps). */
  def hash32(s: Column): Column = hash60(s) % 4294967296L

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word k-shingles ("w1 w2 w3") of a token array.
    * Empty when the doc has fewer than k tokens.
    *
    * IMPORTANT: pass a *materialized column* (an attribute), not a nested
    * expression like `tokens($"text")` — lambda bodies re-evaluate their
    * captured expressions PER ELEMENT in interpreted HOF evaluation, so a
    * nested split() would run once per shingle per reference (measured 20×
    * slowdown). Same rule for [[charShingles]]. */
  def wordShingles(toks: Column, k: Int = 3): Column = {
    val n = size(toks)
    when(n >= k,
      array_distinct(transform(sequence(lit(0), n - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct character k-grams of a string. */
  def charShingles(text: Column, k: Int = 4): Column = {
    val n = length(text)
    when(n >= k,
      array_distinct(transform(sequence(lit(0), n - k),
        i => text.substr(i + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two distinct-element arrays, as an exact
    * int/int division (bit-identical across engines). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
