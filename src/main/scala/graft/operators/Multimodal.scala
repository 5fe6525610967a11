package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Text.hash60

/** Multimodal-column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, plus frame sampling and a (stubbed) feature-extraction
  * stage.
  *
  * The image/audio codec libraries are not in this container, so the DECODE
  * step is a clearly-marked deterministic stub ([[FakeDecoder]]); everything
  * Spark-side — the schema (binary + metadata struct), the per-frame
  * explode, the batch-shaped partition processing, partitioning behavior —
  * is real and tested. On a real cluster the stub body is replaced by the
  * codec call; nothing else changes.
  *
  * Scale: payloads stay opaque bytes end-to-end (no string round-trip);
  * frame sampling is a generator expression (posexplode of a sequence —
  * fanout without a shuffle); feature extraction is mapPartitions-batched so
  * a vectorized/native decoder amortizes per-batch setup, mirroring the
  * arrow-batch shape a Pandas-UDF pipeline would use.
  */
object Multimodal {

  val FrameBytes = 64

  /** Synthesize a media payload per document: the UTF-8 bytes of its text
    * standing in for an opaque blob, plus a typed metadata struct. */
  def withMedia(df: DataFrame): DataFrame =
    df.withColumn("media", struct(
      encode(col("text"), "UTF-8").as("data"),
      struct(
        length(encode(col("text"), "UTF-8")).as("n_bytes"),
        concat(lit("application/x-graft-"), col("lang")).as("mime"),
        ceil(length(encode(col("text"), "UTF-8")).cast("double") / FrameBytes)
          .cast("int").as("n_frames")).as("meta")))

  /** Metadata extraction: typed fields out of the media struct + a content
    * digest of the first 8 bytes — all binary-native ops. */
  def metadata(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withMedia(Tables.documents(spark, dir))
      .select($"doc_id",
        $"media.meta.n_bytes".as("n_bytes"),
        $"media.meta.mime".as("mime"),
        $"media.meta.n_frames".as("n_frames"),
        hex(substring($"media.data", 1, 8)).as("head_hex"))
      .orderBy($"doc_id")
  }

  /** Frame sampling: explode each payload into fixed-size frames with a
    * per-frame content hash — the generator-fanout shape a video
    * frame-sampler uses (sampling every k-th frame = a filter on frame_idx). */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withMedia(Tables.documents(spark, dir))
      .select($"doc_id", $"media.data".as("data"), $"media.meta.n_frames".as("n_frames"))
      .select($"doc_id", $"n_frames",
        posexplode(transform(sequence(lit(0), $"n_frames" - 1),
          i => substring_index_bytes($"data", i))).as(Seq("frame_idx", "frame")))
      .select($"doc_id", $"frame_idx",
        length($"frame").as("frame_bytes"),
        hash60(hex($"frame")).as("frame_hash"))
      .orderBy($"doc_id", $"frame_idx")
  }

  /** Frame i of a binary column (1-based byte offsets). */
  private def substring_index_bytes(data: Column, i: Column): Column =
    data.substr(i * FrameBytes + 1, lit(FrameBytes))

  /** (doc_id, frame_idx, frame byte length, frame content hash) for every
    * fixed-size frame of every payload — the shared scan of
    * [[frameDedup]] / [[mediaFrameHashes]] (the [[frameSample]] generator
    * fanout, no shuffle). */
  private[graft] def frameHashes(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    withMedia(docs)
      .select($"doc_id", $"media.data".as("data"),
        $"media.meta.n_frames".as("n_frames"))
      .select($"doc_id",
        posexplode(transform(sequence(lit(0), $"n_frames" - 1),
          i => substring_index_bytes($"data", i))).as(Seq("frame_idx", "frame")))
      .select($"doc_id", $"frame_idx",
        length($"frame").as("frame_bytes"), hash60(hex($"frame")).as("fh"))
  }

  /** Global first-occurrence key: (doc_id, frame_idx) packed into one
    * BIGINT so the owner reduction is a plain partial-aggregatable `min`
    * (a struct-min or window-rank formulation would concentrate a hot
    * frame hash — think the all-zeros padding frame — in one task; min is
    * combinable map-side, so even a frame every document shares collapses
    * before the exchange). Bounds: frame_idx < 2²⁴ (16M frames = a 1 GiB
    * payload at 64 B/frame) and doc_id < 2³⁹ — beyond either the packed
    * key would silently corrupt first-occurrence ownership, so the bound
    * is ENFORCED with raise_error (a loud task failure, the
    * `Dedup.connectedComponents` round-cap convention) rather than
    * documented-only. */
  private def occKey(docId: Column, frameIdx: Column): Column =
    when(frameIdx >= lit(1L << 24) || docId >= lit(1L << 39) ||
        frameIdx < 0 || docId < 0,
      raise_error(concat(lit("occKey overflow: doc_id="), docId,
        lit(" frame_idx="), frameIdx, lit(" exceed the 2^39/2^24 packing"))))
      .otherwise(docId * lit(1L << 24) + frameIdx)

  /** Frame-level storage dedup over the media lake — the content-defined-
    * chunking question a blob store asks before ingesting media: which
    * fixed-size frames has it already stored, and how many bytes does
    * dedup save? Corpus-wide first-occurrence-wins by frame hash (the
    * [[graft.operators.Dedup.spanDedup]] counting formulation on BINARY
    * frames — no pairwise step exists in the problem): a frame is
    * DUPLICATED iff an earlier (doc_id, frame_idx) emitted the same bytes.
    * Output per document: frame/byte totals and the duplicated share —
    * `bytes_saved` is exactly the storage a hash-addressed frame store
    * would not re-write.
    *
    * Scale shape: three linear steps — generator frame fanout (no
    * shuffle), one groupBy(frame hash) min-reduction (map-side combinable
    * even under hot-frame skew, see [[occKey]]), one equi-join back on the
    * hash (co-partitioned with the owner table the groupBy just produced)
    * + per-doc count. Never a pair join; C is exactly linear in payload
    * bytes. */
  /** The corpus frame table, memoized per (session, dir) — the
    * [[cdcCorpusChunks]] pattern on fixed-offset frames: [[frameDedup]]
    * consumes it twice per invocation and [[mediaFrameHashes]] re-derives
    * the same scan for the stream twin's static side. */
  private[graft] def corpusFrameHashes(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Caches.memoized(spark, s"media-frames|$dir")(
      graft.sources.Caches.shared(
        frameHashes(Tables.spread(Tables.documents(spark, dir)))))

  def frameDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = corpusFrameHashes(spark, dir)
    val owners = frames
      .groupBy($"fh").agg(min(occKey($"doc_id", $"frame_idx")).as("own_key"))
    frames.join(owners, "fh")
      .withColumn("dup", occKey($"doc_id", $"frame_idx") =!= $"own_key")
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_frames"),
        sum(when($"dup", 1L).otherwise(0L)).as("n_dup_frames"),
        sum($"frame_bytes").cast("long").as("payload_bytes"),
        sum(when($"dup", $"frame_bytes").otherwise(0L)).cast("long").as("bytes_saved"))
      .orderBy($"doc_id")
  }

  // ------------------------------------------- content-defined chunking

  /** CDC window width in bytes: the boundary decision reads only the last
    * [[CdcWindow]] bytes, which is what makes chunk boundaries CONTENT
    * properties — an edit re-aligns every boundary whose window it does
    * not touch. */
  val CdcWindow = graft.functions.GearKernels.GearWindow

  /** Boundary divisor: a position ends a chunk when its window gear-hash's
    * mid bits ≡ 0 (mod [[CdcDivisor]]) ⇒ expected chunk size =
    * [[CdcDivisor]] bytes, matching [[FrameBytes]] so the fixed-vs-CDC
    * comparison is size-for-size. */
  val CdcDivisor = graft.functions.GearKernels.GearDivisor.toInt

  /** The PERCEPTUAL fingerprint chunks finer than the storage dedup: the
    * bit-majority signature needs enough chunk-hash votes per payload to
    * stay stable under partial edits (fixture payloads are ~400 B — 64 B
    * chunks give ~7 votes, too few for a 48-bit majority; 32 B gives ~13
    * and the near-dup family stays non-vacuous at every fixture scale).
    * A granularity policy knob, like [[CdcDivisor]]; the oracle pins the
    * same literal. */
  val FingerprintDivisor = 32L

  /** Content-defined chunk boundaries of a binary payload: END positions
    * (1-based, ascending) of every chunk, plus n itself — ONE pass through
    * the native [[graft.functions.GearChunkEnds]] gear-hash kernel (the
    * FastCDC-family O(1)/byte rolling boundary scan production CDC stores
    * run; boundary iff the trailing-[[CdcWindow]]-byte gear sum's mid bits
    * ≡ 0 mod [[CdcDivisor]] — exact int64 arithmetic the DuckDB oracles
    * reproduce closed-form, gear table interpolated from the same
    * derivation). Pure per-position predicate (no min/max chunk clamp —
    * the classic clamp makes boundary i depend on boundary i−1, a
    * sequential chain; unclamped CDC is fully data-parallel and its
    * degenerate tails are bounded in expectation by the divisor
    * geometry). */
  private def cdcEnds(data: Column, divisor: Long): Column =
    graft.functions.GearChunkEnds(data, divisor)

  /** Per-payload chunk structs (start, len) from the boundary ends —
    * shared by the exploding scan and the per-row signature. */
  private def cdcSpans(ends: Column): Column =
    zip_with(concat(array(lit(0)), slice(ends, lit(1), size(ends) - 1)), ends,
      (s, e) => struct((s + 1).as("cs"), (e - s).as("ln")))

  /** (doc_id, chunk_idx, chunk_bytes, ch) for every content-defined chunk
    * of every payload — the CDC twin of [[frameHashes]] (generator fanout,
    * no shuffle). */
  private[graft] def cdcChunks(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    withMedia(docs)
      .select($"doc_id", $"media.data".as("data"))
      .select($"doc_id", $"data",
        posexplode(cdcSpans(cdcEnds($"data", CdcDivisor))).as(Seq("chunk_idx", "sp")))
      .select($"doc_id", $"chunk_idx",
        $"sp.ln".cast("long").as("chunk_bytes"),
        hash60(hex($"data".substr($"sp.cs", $"sp.ln"))).as("ch"))
  }

  /** Frame-level storage dedup over CONTENT-DEFINED chunks — the
    * alignment-robust production variant of [[frameDedup]]: fixed-offset
    * framing loses every frame after an early byte edit (one inserted byte
    * shifts all later 64-byte windows), while CDC boundaries are content
    * properties, so a shifted payload re-aligns at the first surviving
    * boundary and every later chunk still collides with the store
    * (`MultimodalSpec` proves the shifted-payload case both ways). Same
    * counting formulation, same packed-min owner reduction, same linear
    * scale shape as [[frameDedup]] — only the chunker changed. */
  /** The corpus chunk table, memoized per (session, dir) and pinned via
    * `Caches.shared`: the native gear-hash boundary scan is the expensive
    * leg, and [[cdcDedup]] consumes the table TWICE per invocation (owner
    * reduction + join back) while [[cdcCorpusHashes]] re-derives the same
    * chunks for the stream twin's static side. One scan per session serves
    * all of them; the pinned table is chunk-count-sized (linear in corpus
    * bytes / mean chunk size, spillable) and dropped by `releaseAll`. */
  private[graft] def cdcCorpusChunks(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Caches.memoized(spark, s"media-cdc-chunks|$dir")(
      graft.sources.Caches.shared(
        cdcChunks(Tables.spread(Tables.documents(spark, dir)))))

  def cdcDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val chunks = cdcCorpusChunks(spark, dir)
    val owners = chunks
      .groupBy($"ch").agg(min(occKey($"doc_id", $"chunk_idx")).as("own_key"))
    chunks.join(owners, "ch")
      .withColumn("dup", occKey($"doc_id", $"chunk_idx") =!= $"own_key")
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(when($"dup", 1L).otherwise(0L)).as("n_dup_chunks"),
        sum($"chunk_bytes").cast("long").as("payload_bytes"),
        sum(when($"dup", $"chunk_bytes").otherwise(0L)).cast("long").as("bytes_saved"))
      .orderBy($"doc_id")
  }

  /** Distinct corpus CDC chunk hashes — the static side of
    * [[cdcDedupStream]]. */
  def cdcCorpusHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cdcCorpusChunks(spark, dir).select($"ch").distinct()
  }

  /** Streaming twin of [[cdcDedup]] — ingest-time storage dedup with the
    * alignment-robust chunker (the [[frameDedupStream]] contract: corpus
    * precedes the stream, any corpus occurrence marks a chunk
    * already-stored; per arriving doc, what the store must write). */
  def cdcDedupStream(docStream: DataFrame, corpusHashes: DataFrame): DataFrame = {
    import docStream.sparkSession.implicits._
    cdcChunks(docStream)
      .join(broadcast(corpusHashes.withColumn("stored", lit(true))),
        Seq("ch"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(when($"stored", 1L).otherwise(0L)).as("n_stored_chunks"),
        sum(when($"stored", lit(0L)).otherwise($"chunk_bytes")).cast("long")
          .as("bytes_to_write"))
  }

  /** Per-payload CDC fingerprint: [[graft.functions.SimhashSignature]]
    * bit-majority over the payload's content-defined chunk hashes — the
    * shift-robust twin of [[mediaSignatures]] (same per-row no-shuffle
    * shape; the hash ARRAY is computed inline, never exploded). */
  private[graft] def cdcSignatures(docs: DataFrame, sigBits: Int): DataFrame = {
    import docs.sparkSession.implicits._
    withMedia(docs)
      .select($"doc_id", $"media.data".as("data"))
      .select($"doc_id", transform(cdcSpans(cdcEnds($"data", FingerprintDivisor)),
        sp => hash60(hex($"data".substr(sp.getField("cs"), sp.getField("ln"))))).as("chs"))
      .select($"doc_id",
        graft.functions.SimhashSignature($"chs", sigBits).as("sim"))
  }

  /** Per-payload perceptual fingerprint: the [[graft.functions.SimhashSignature]]
    * bit-majority over the payload's frame hashes — the TMK-style video/
    * media fingerprint structure (per-frame hashes voted into one
    * signature), computed per row with NO shuffle (the frame array never
    * explodes). */
  private[graft] def mediaSignatures(docs: DataFrame, sigBits: Int): DataFrame = {
    import docs.sparkSession.implicits._
    withMedia(docs)
      .select($"doc_id", $"media.data".as("data"),
        $"media.meta.n_frames".as("n_frames"))
      .select($"doc_id", transform(sequence(lit(0), $"n_frames" - 1),
        i => hash60(hex(substring_index_bytes($"data", i)))).as("fhs"))
      .select($"doc_id",
        graft.functions.SimhashSignature($"fhs", sigBits).as("sim"))
  }

  /** Perceptual near-duplicate media pairs: payloads whose frame-hash
    * fingerprints are within hamming ≤ [[graft.operators.Dedup.HammingThreshold]]
    * — re-encoded/re-uploaded blobs and padding-level variants (frame-exact
    * content dominates the vote, so identical payloads collide at hamming 0
    * and near-identical ones nearby). HONEST fixture caveat: fixed-offset
    * framing is alignment-sensitive (an early edit shifts every later
    * frame), so text-level near-dups mostly do NOT land within the
    * threshold — the fixture yields a small handful of pairs (2 at sf0.01)
    * and that is the true semantics of frame-level fingerprinting, stated
    * rather than inflated. [[mediaNearDupCdc]] is the alignment-ROBUST
    * variant (content-defined chunk boundaries re-align after an edit)
    * and the production choice; this fixed-offset form is kept as the
    * cheap-chunker baseline the A/B spec measures against.
    *
    * Scale shape: identical to `Dedup.simhash` — per-row signature, Manku
    * k+1 banded self-join (pigeonhole-complete at any derived band width),
    * exact hamming verify on collisions only. */
  def mediaNearDup(spark: SparkSession, dir: String): DataFrame =
    bandedSigPairs(spark, dir, mediaSignatures, "media simhash band bits")

  /** Perceptual near-duplicate media pairs over the CONTENT-DEFINED chunk
    * fingerprint ([[cdcSignatures]]) — the alignment-robust variant of
    * [[mediaNearDup]]: a byte inserted early in a payload shifts every
    * fixed-offset frame (so [[mediaNearDup]]'s signatures diverge to
    * ~half-random hamming) but re-aligns CDC chunks at the first surviving
    * boundary, so the shifted payload's chunk-hash vote — and with it the
    * signature — stays within the hamming threshold (`MultimodalSpec`
    * drives exactly that A/B). Same Manku banding, same scale shape. */
  def mediaNearDupCdc(spark: SparkSession, dir: String): DataFrame =
    bandedSigPairs(spark, dir, cdcSignatures, "media cdc simhash band bits")

  /** The shared Manku-banded signature self-join of the two perceptual
    * near-dup variants: per-row signature, (k+1)-band equi-join
    * (pigeonhole-complete at hamming ≤ k), exact hamming verify on
    * collisions only — `Dedup.simhash`'s structure on media signatures. */
  private def bandedSigPairs(spark: SparkSession, dir: String,
      sigOf: (DataFrame, Int) => DataFrame, knob: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Dedup
    val nBands = Dedup.HammingThreshold + 1
    val bandBits = mediaBandBits(spark, dir, knob)
    val sigs = graft.sources.Caches.shared(sigOf(
      Tables.spread(Tables.documents(spark, dir)), nBands * bandBits))
    val parts = Dedup.sigBandParts(sigs, nBands, bandBits)
    parts.as("x").join(parts.as("y"),
        $"x.part" === $"y.part" && $"x.key" === $"y.key" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("id_a"), $"y.doc_id".as("id_b"),
        bit_count($"x.sim".bitwiseXOR($"y.sim")).as("hamming"))
      .distinct()
      .filter($"hamming" <= Dedup.HammingThreshold)
      .orderBy($"id_a", $"id_b")
  }

  /** Fixture-floored band width for the media fingerprints ([[mediaNearDup]]
    * family): derived from corpus size, warned past the 48-bit oracle
    * regime (the `Dedup.simhashBandBits` scheme). */
  private def mediaBandBits(spark: SparkSession, dir: String, knob: String): Int = {
    import graft.operators.Dedup
    Dedup.warnIfPastOracleFloor(knob,
      Dedup.simhashBandBits(Tables.nDocs(spark, dir)).toLong,
      12L).toInt
  }

  /** The static side for [[mediaNearDupStream]]: the derived band width
    * AND every corpus payload's CDC-fingerprint band keys with the full
    * signature riding along for the exact hamming verify — (part, key,
    * corpus_id, corpus_sim). Returned AS A PAIR (the `semanticStatics`
    * convention) so the stream side fingerprints at exactly the width the
    * bucket table was built with: past the ~32k-doc knee the derived
    * width grows, and a caller-must-know default would silently stop
    * matching (different signature widths never collide). */
  def mediaStatics(spark: SparkSession, dir: String): (Int, DataFrame) = {
    import graft.operators.Dedup
    val nBands = Dedup.HammingThreshold + 1
    val bandBits = mediaBandBits(spark, dir, "media cdc simhash band bits")
    val buckets = Dedup.sigBandParts(
        cdcSignatures(Tables.documents(spark, dir), nBands * bandBits),
        nBands, bandBits)
      .select(col("part"), col("key"), col("doc_id").as("corpus_id"),
        col("sim").as("corpus_sim"))
    (bandBits, buckets)
  }

  /** Streaming twin of [[mediaNearDupCdc]] — perceptual near-dup detection
    * at ingest: each arriving payload is CDC-fingerprinted PER ROW (pure
    * projection, no stream state), its band keys stream-static joined
    * against the corpus bucket table, bucket collisions verified with the
    * exact signature hamming, and multi-band matches of the same pair
    * collapsed in an update-mode (doc_id, corpus_id) aggregation (the
    * [[graft.operators.Dedup.nearDupStream]] contract on media
    * fingerprints). `bandBits` comes from [[mediaStatics]] together with
    * the bucket table — the pair keeps the stream fingerprint width and
    * the index width provably equal.
    *
    * Scale posture: the demo broadcasts the bucket table; at corpus scale
    * the same plan is a stream-static SHUFFLE join on (part, key) against
    * a bucketed signature table — only the arriving batch's band keys
    * move. */
  def mediaNearDupStream(docStream: DataFrame, bandBits: Int,
      corpusBuckets: DataFrame): DataFrame = {
    import graft.operators.Dedup
    val nBands = Dedup.HammingThreshold + 1
    Dedup.sigBandParts(cdcSignatures(docStream, nBands * bandBits), nBands, bandBits)
      .join(broadcast(corpusBuckets), Seq("part", "key"))
      .filter(col("doc_id") =!= col("corpus_id"))
      .withColumn("hamming", bit_count(col("sim").bitwiseXOR(col("corpus_sim"))))
      .filter(col("hamming") <= Dedup.HammingThreshold)
      .groupBy(col("doc_id"), col("corpus_id"))
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Distinct corpus frame hashes — the static side of
    * [[frameDedupStream]] (the `Dedup.spanCorpusHashes` pattern). */
  def mediaFrameHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpusFrameHashes(spark, dir).select($"fh").distinct()
  }

  /** Streaming twin of [[frameDedup]] — ingest-time storage dedup: each
    * arriving (doc_id, text) payload is frame-hashed per row (no
    * stream-side shuffle) and checked against the STATIC corpus frame
    * table; any corpus occurrence marks the frame already-stored (the
    * corpus precedes the stream, so there is no in-stream first-occurrence
    * exemption — the `Dedup.spanDedupStream` convention). Output per
    * arriving doc: how many frames / bytes the store must actually write. */
  def frameDedupStream(docStream: DataFrame, corpusHashes: DataFrame): DataFrame = {
    import docStream.sparkSession.implicits._
    frameHashes(docStream)
      .join(broadcast(corpusHashes.withColumn("stored", lit(true))),
        Seq("fh"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_frames"),
        sum(when($"stored", 1L).otherwise(0L)).as("n_stored_frames"),
        sum(when($"stored", lit(0L)).otherwise($"frame_bytes")).cast("long")
          .as("bytes_to_write"))
  }

  /** Media-lake round trip — the binary-payload end-to-end the reference's
    * sole-value-column write implies (cassandra_sink.scala:113): every
    * document's UTF-8 bytes land as an individual `<doc_id>.bin` blob via
    * [[graft.sources.Formats.writeBlobFiles]] (executor-parallel, Hadoop
    * `FileSystem`), are read back through the core `binaryFile` source, and
    * the output carries (doc_id, byte length, md5 digest) — the digest pins
    * every byte of every blob against the DuckDB oracle computed directly
    * over `documents.text`. The lake directory is rebuilt per invocation
    * (delete + write) so regenerated fixtures can't leave stale blobs. */
  def mediaLake(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lake = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-media-lake/" +
        java.lang.Long.toHexString(graft.functions.HashKernels.h60(s"v1|$dir")))
    val base = new org.apache.hadoop.fs.Path(lake.getPath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // rebuild the blob store only when the SOURCE fixture changed (or the
    // store is missing): the old delete-and-rewrite per serve re-wrote
    // every blob on every invocation to guard against stale blobs from a
    // regenerated fixture — the listing-signature memo makes that guard
    // exact instead of paranoid (any change to documents.parquet
    // invalidates and forces the delete + rewrite), so repeat serves pay
    // the binaryFile read + digest only
    if (!fs.exists(base))
      graft.sources.Caches.invalidate(spark, "media_lake")
    graft.sources.Caches.bySignature[String](spark, "media_lake",
        s"$dir/documents.parquet") {
      if (fs.exists(base)) fs.delete(base, true)
      graft.sources.Formats.writeBlobFiles(
        Tables.documents(spark, dir)
          .select($"doc_id".as("id"), encode($"text", "UTF-8").as("data")),
        lake.getPath)
      lake.getPath
    }
    graft.sources.Formats.readBinaryFiles(spark, lake.getPath, "*.bin")
      .select(
        regexp_extract($"path", "(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        $"length".as("n_bytes"),
        md5($"content").as("digest"))
      .orderBy($"doc_id")
  }

  /** The stubbed decode/feature-extract stage: deterministic fake features
    * derived from frame bytes (REPLACE-ME: codec call goes here). Runs
    * batched per partition so a real decoder would amortize model/codec
    * setup per batch, not per row. */
  object FakeDecoder {
    /** "Features" = 4 bigints folded from the payload bytes. Deterministic,
      * pure, collision-resistant enough for tests. */
    def features(bytes: Array[Byte]): Array[Long] = {
      // REPLACE-ME(decoder): real implementation calls the image/audio codec.
      var h0 = 1125899906842597L; var h1 = 31L; var h2 = 7L; var h3 = 131L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        h0 = h0 * 31 + b; h1 = h1 * 131 + b; h2 = h2 ^ (b.toLong << (i % 56)); h3 += b
        i += 1
      }
      Array(h0, h1, h2, h3)
    }
  }

  /** Batch-shaped feature extraction over (doc_id, media.data): processes
    * partition iterators in fixed-size batches (the arrow-batch shape),
    * calling the decoder stub once per row within a materialized batch. */
  def extractFeatures(df: DataFrame, batchSize: Int = 64): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id"), col("media.data").as("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init the codec/model once here
        batch.map { case (id, bytes) => (id, FakeDecoder.features(bytes)) }
      })
      .toDF("doc_id", "features")
  }
}
