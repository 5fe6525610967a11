package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.CorpusLake

/** REAL-process kill validation of the crash-spec alphabet (the round-17
  * verdict's directive #5): [[CrashPointSpec]] / [[StreamResumeSpec]] /
  * [[LakeModelSpec]] reconstruct writer-death states from the protocol's
  * DOCUMENTED write order — sound, but self-referential: if the order in
  * code ever diverged from the documented order, those specs would
  * reconstruct the WRONG states and still pass. This spec closes the
  * loop end-to-end: it forks a child JVM running the real
  * [[CorpusLake.maintainCorpusStream]], SIGKILLs it while a batch's data
  * append has landed but its manifest row has not (observed live from
  * the filesystem — the genuine mid-commit instant), and then asserts
  * the SURVIVING directory state is one the spec alphabet covers:
  *   - committed-only serve (the killed lake's snapshot equals an
  *     uninterrupted twin's at the same committed head),
  *   - at most ONE uncommitted (orphan) epoch,
  *   - any `*_compacting` dir in a recognized torn state,
  *   - a stranded lease only under the stream's stable owner tag,
  * and finally that a SAME-CHECKPOINT restart (the production resume
  * path) converges the killed lake to the twin's end state, with vacuum
  * reclaiming the dead batch's orphans. */
class StreamKillSpec extends SparkSpec {

  private val dir = sf("sf0.001")
  private val NBatches = 24

  /** Unique 40-token docs, 2 per file, explicit strictly-increasing
    * MTIMEs (the file source orders batches by mtime; same-millisecond
    * ties break unpredictably) — the [[StreamResumeSpec]] fixture shape
    * on a distinct id range. */
  private def writeBatchFile(inDir: String, i: Int): Unit = {
    def doc(k: Int): String = {
      val id = 8300000L + i * 10 + k
      val text = (1 to 40).map(j => s"kil${i}x${k}w$j").mkString(" ")
      s"""{"doc_id": $id, "text": "$text"}"""
    }
    val p = Files.writeString(Paths.get(s"$inDir/batch$i.json"),
      doc(0) + "\n" + doc(1))
    Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
  }

  /** Completed parquet part-files under a store (the committer moves
    * them into place at job commit; in-flight ones live under
    * `_temporary` and are excluded, exactly as Spark's listing does). */
  private def partFiles(store: String): Long = {
    val p = Paths.get(store)
    if (!Files.exists(p)) 0L
    else try {
      Files.walk(p).iterator().asScala.count { f =>
        val n = f.getFileName.toString
        n.startsWith("part-") &&
          !f.iterator().asScala.exists(_.toString == "_temporary")
      }
    } catch {
      // the walk races the LIVE child's committer, which deletes
      // `_temporary` task dirs between our listing and our visit — a
      // vanished entry is a normal mid-commit race, not a failure;
      // report "no observation" and let the poll loop sample again
      case _: java.io.UncheckedIOException => -1L
    }
  }

  private def snapshot(corpus: String, v: Option[Long] = None) =
    CorpusLake.readCorpusAt(spark, dir, corpus, v)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def statOf(corpus: String, name: String): Long =
    CorpusLake.lakeStats(spark, corpus)
      .filter(col("stat") === name).select(col("value"))
      .collect().head.getLong(0)

  test("a SIGKILLed real maintenance stream leaves a state the crash " +
      "alphabet covers, and the same-checkpoint resume converges") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-kill").toString
    Files.createDirectories(Paths.get(s"$root/in"))
    for (i <- 0 until NBatches) writeBatchFile(s"$root/in", i)
    val corpus = s"$root/corpus"
    CorpusLake.initCorpus(spark, dir, s"$root/idx")

    // the uninterrupted twin, over byte-identical inputs, in-process
    val twin = Files.createTempDirectory("graft-kill-twin").toString
    Files.createDirectories(Paths.get(s"$twin/in"))
    for (i <- 0 until NBatches) writeBatchFile(s"$twin/in", i)
    CorpusLake.initCorpus(spark, dir, s"$twin/idx")
    def drain(rootDir: String): Unit = {
      val src = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(s"$rootDir/in")
      val q = CorpusLake.maintainCorpusStream(src, spark, dir,
          s"$rootDir/idx", s"$rootDir/corpus", s"$rootDir/maint")
        .option("checkpointLocation", s"$rootDir/cp")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain(twin)
    val twinHead = CorpusLake.manifest(spark, s"$twin/corpus")
      .agg(max($"version")).as[Long].head()
    val twinFinal = snapshot(s"$twin/corpus")

    // fork the child: same JVM, same classpath, same --add-opens set
    val raw = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    val opens = raw.sliding(2).collect {
      case List(k, v) if k == "--add-opens" => List(k, v)
    }.toList.flatten ++ raw.filter(_.startsWith("--add-opens="))
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java")
      .toString
    val cmd = (javaBin :: opens) ++ List("-Xmx2g",
      "-Dspark.ui.enabled=false", "-cp",
      System.getProperty("java.class.path"),
      "graft.StreamKillChild", root, dir)
    val proc = new ProcessBuilder(cmd.asJava)
      .directory(new java.io.File(root))
      .redirectOutput(new java.io.File(s"$root/child.log"))
      .redirectErrorStream(true)
      .start()

    // observe the live filesystem for the genuine mid-commit instant:
    // once >= 3 batches committed, the FIRST poll where the docs store
    // grew but the manifest did not is a writer inside the
    // data-appended / manifest-pending window — SIGKILL it there
    val deadline = System.currentTimeMillis() + 180000L
    var lastManifest = 0L
    var lastDocs = 0L
    var killedMidCommit = false
    var aliveAtKill = false
    while (proc.isAlive && !killedMidCommit &&
        System.currentTimeMillis() < deadline) {
      val m = partFiles(s"$corpus/manifest")
      val d = partFiles(s"$corpus/docs")
      if (m < 0 || d < 0) {
        Thread.sleep(5) // raced a mid-commit delete; sample again
      } else if (m >= 3 && d > lastDocs && m == lastManifest && lastDocs > 0) {
        aliveAtKill = proc.isAlive
        proc.destroyForcibly() // SIGKILL — no shutdown hooks, no cleanup
        killedMidCommit = true
      } else {
        if (m != lastManifest) lastManifest = m
        lastDocs = d
        Thread.sleep(5)
      }
    }
    if (!killedMidCommit) proc.destroyForcibly() // backstop: kill anyway
    proc.waitFor()
    assert(killedMidCommit && aliveAtKill,
      "the kill must land while the child is INSIDE a commit (data " +
        "appended, manifest pending) — the poll loop never caught one; " +
        s"see $root/child.log")

    // ---- the surviving state must be one the spec alphabet covers ----
    val head = CorpusLake.manifest(spark, corpus)
      .agg(max($"version")).as[Long].head()
    assert(head >= 2L, "kill landed before any meaningful history")
    // committed-only serve: the killed lake equals the twin AS OF the
    // same committed head — the dead batch's appended rows never serve
    assert(snapshot(corpus) == snapshot(s"$twin/corpus", Some(head)),
      "the killed lake's serve diverged from the twin at its head — " +
        "orphan rows leaked into the committed read")
    // at most one orphan (in-flight) epoch — the single-writer protocol
    // permits exactly one open batch
    val orphans = statOf(corpus, "uncommitted_epochs")
    assert(orphans <= 1L,
      s"$orphans uncommitted epochs survive a single kill — the write " +
        "order in code cannot match the documented one-open-batch protocol")
    // any *_compacting dir must be in a recognized torn state: either
    // uncommitted (no _SUCCESS) or a completed swap middle (main absent)
    Files.list(Paths.get(corpus)).iterator().asScala
      .filter(_.getFileName.toString.endsWith("_compacting"))
      .foreach { p: Path =>
        val name = p.getFileName.toString
        val main = Paths.get(corpus, name.stripSuffix("_compacting"))
        assert(!Files.exists(p.resolve("_SUCCESS")) || !Files.exists(main),
          s"unrecognized torn state at $name: committed compacting dir " +
            "BESIDE a live main is outside the spec alphabet")
      }
    // a stranded lease may only carry the stream's stable owner tag
    val lease = Paths.get(s"$corpus/_writer_lease")
    if (Files.exists(lease))
      assert(Files.readString(lease).startsWith("ingest-batch-"),
        "a stranded lease under a foreign tag is outside the alphabet")
    // the checkpoint may hold an offsets/N without its commits/N (the
    // replay marker state StreamResumeSpec reconstructs) — never the
    // reverse (a commit marker for a batch whose offsets are missing)
    def maxIdx(d: String): Long = {
      val p = Paths.get(d)
      if (!Files.exists(p)) -1L
      else Files.list(p).iterator().asScala
        .map(_.getFileName.toString).filter(_.forall(_.isDigit))
        .map(_.toLong).foldLeft(-1L)(math.max)
    }
    assert(maxIdx(s"$root/cp/commits") <= maxIdx(s"$root/cp/offsets"),
      "a commit marker exists for an un-offsetted batch — outside the " +
        "streaming checkpoint's documented write order")

    // ---- the production resume path converges on the twin ----
    CorpusLake.backdateWriterLease(spark, corpus, ageMs = 16L * 60 * 1000)
    drain(root)
    assert(snapshot(corpus) == twinFinal,
      "same-checkpoint resume after a REAL kill diverged from the twin")
    assert(CorpusLake.manifest(spark, corpus)
        .agg(max($"version")).as[Long].head() >= twinHead,
      "resume lost committed history (burned epochs may only ADD versions)")
    CorpusLake.vacuumCorpus(spark, corpus, 0L)
    assert(statOf(corpus, "uncommitted_epochs") == 0L,
      "vacuum must reclaim the killed batch's orphans")
    assert(snapshot(corpus) == twinFinal,
      "vacuum changed the resumed serve")
  }
}
