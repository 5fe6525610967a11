package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusLake, TextAnalysis}
import graft.sources.Tables

/** Zero-copy lake branches: creation at head, snapshot isolation both
  * ways, overlay LWW with branch-local deletes, vacuum governance via
  * the parent pin, merge-wins fold-back, chained branches, and the
  * zone-pruned read crossing the parent chain. */
class LakeBranchSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def commitTo(corpus: String, v: Long): Unit = {
    import spark.implicits._
    Seq((v, 0L, 0L, 0L, 0L, 0L))
      .toDF("version", "n_arrived", "n_admitted", "n_duplicate",
        "n_contaminated", "n_low_quality")
      .write.mode("append").parquet(s"$corpus/manifest")
  }

  private def baseDocs = Tables.spread(Tables.documents(spark, dir))
    .select(col("doc_id"), col("text"))

  /** Parent lake with one committed update epoch (" u1" on ids ≡1 mod 10). */
  private def mkParent(): String = {
    import spark.implicits._
    val parent = java.nio.file.Files
      .createTempDirectory("graft-branch-spec").toString + "/parent"
    baseDocs.filter($"doc_id" % 10 === 1)
      .select($"doc_id", concat($"text", lit(" u1")).as("text"),
        lit(0L).as("epoch"))
      .write.mode("append").parquet(s"$parent/docs")
    commitTo(parent, 0L)
    parent
  }

  private def served(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] = {
    import spark.implicits._
    df.select($"doc_id", $"text").as[(Long, String)].collect().toSeq.sorted
  }

  test("branch: zero-copy creation, isolation both ways, merge-wins fold-back") {
    import spark.implicits._
    val parent = mkParent()
    val branch = parent.stripSuffix("/parent") + "/exp"
    val base = CorpusLake.createBranch(spark, dir, parent, branch, "exp")
    assert(base == 0L)
    // zero-copy: the branch holds no data store, only the pointer; and it
    // serves exactly the parent head
    assert(!graft.sources.Formats.pathExists(spark, s"$branch/docs"),
      "branch creation copied data")
    val parentHead = served(CorpusLake.readCorpusAt(spark, dir, parent))
    assert(served(CorpusLake.readCorpusAt(spark, dir, branch)) == parentHead)

    // parent moves on; branch commits its own epoch + a takedown
    baseDocs.filter($"doc_id" % 8 === 3)
      .select($"doc_id", concat($"text", lit(" p2")).as("text"),
        lit(1L).as("epoch"))
      .write.mode("append").parquet(s"$parent/docs")
    commitTo(parent, 1L)
    assert(CorpusLake.nextLakeVersion(spark, branch) == 1L,
      "branch version space must start at base+1")
    baseDocs.filter($"doc_id" % 6 === 5)
      .select($"doc_id", concat($"text", lit(" b1")).as("text"),
        lit(1L).as("epoch"))
      .write.mode("append").parquet(s"$branch/docs")
    commitTo(branch, 1L)
    CorpusLake.deleteDocs(spark, branch,
      baseDocs.filter($"doc_id" % 7 === 4).select($"doc_id"))

    // isolation: the branch never sees " p2"; the parent never sees " b1"
    // or the branch's tombstones
    val branchHead = served(CorpusLake.readCorpusAt(spark, dir, branch))
    assert(!branchHead.exists(_._2.endsWith(" p2")),
      "parent post-branch commit leaked into the branch")
    assert(branchHead.exists(_._2.endsWith(" b1")))
    assert(!branchHead.exists(_._1 % 7 == 4), "branch delete not applied")
    val parentMid = served(CorpusLake.readCorpusAt(spark, dir, parent))
    assert(!parentMid.exists(_._2.endsWith(" b1")),
      "branch commit leaked into the parent")
    assert(parentMid.exists(_._1 % 7 == 4),
      "branch tombstone leaked into the parent")
    // time travel on the branch: the base version serves pre-branch state
    assert(served(CorpusLake.readCorpusAt(spark, dir, branch, Some(0L)))
      == parentHead)
    // CDC on the branch names exactly the branch-local changes
    val feed = CorpusLake.readCorpusChanges(spark, dir, branch, base, None)
      .select($"doc_id", $"change_type").as[(Long, String)].collect()
    assert(feed.nonEmpty && feed.forall { case (id, ct) =>
      (ct == "delete" && id % 7 == 4) ||
        (ct == "update" && id % 6 == 5 && id % 7 != 4) },
      s"branch CDC window wrong: ${feed.take(5).mkString(", ")}")

    // merge-wins: one parent epoch carries the branch's net effect
    val vMerge = CorpusLake.mergeBranch(spark, branch)
    assert(vMerge == 2L, s"merge committed at $vMerge")
    val merged = served(CorpusLake.readCorpusAt(spark, dir, parent))
    assert(!merged.exists(_._1 % 7 == 4), "merged tombstones not applied")
    assert(merged.filter(r => r._1 % 6 == 5).forall(_._2.endsWith(" b1")),
      "branch updates lost the merge LWW")
    assert(merged.exists(r => r._1 % 8 == 3 && r._1 % 6 != 5 &&
      r._2.endsWith(" p2")), "parent-only updates lost in the merge")
    // an already-merged branch has nothing NEW only if it committed
    // nothing more — here a second merge re-applies the same net effect
    // idempotently (LWW over identical rows)
    assert(CorpusLake.mergeBranch(spark, branch) == 3L)
    assert(served(CorpusLake.readCorpusAt(spark, dir, parent)) == merged)
  }

  test("branch: vacuum governance and drop; vacuum refuses on the branch itself") {
    import spark.implicits._
    val parent = mkParent()
    val branch = parent.stripSuffix("/parent") + "/exp2"
    CorpusLake.createBranch(spark, dir, parent, branch, "exp2")
    // the parent can't collapse history the branch still serves
    baseDocs.filter($"doc_id" % 8 === 3)
      .select($"doc_id", concat($"text", lit(" p2")).as("text"),
        lit(1L).as("epoch"))
      .write.mode("append").parquet(s"$parent/docs")
    commitTo(parent, 1L)
    val exPin = intercept[IllegalArgumentException] {
      CorpusLake.vacuumCorpus(spark, parent, 1L)
    }
    assert(exPin.getMessage.contains("branch_exp2"),
      s"vacuum refusal must name the branch pin: ${exPin.getMessage}")
    // vacuum on the branch itself is refused outright
    val exBr = intercept[IllegalArgumentException] {
      CorpusLake.vacuumCorpus(spark, branch, 0L)
    }
    assert(exBr.getMessage.contains("branch"), exBr.getMessage)
    // a fresh branch with no commits merges nothing
    assert(CorpusLake.mergeBranch(spark, branch) == -1L)
    // drop releases the pin; the parent vacuum now proceeds
    CorpusLake.dropBranch(spark, branch)
    assert(!graft.sources.Formats.pathExists(spark, branch),
      "dropBranch left the branch dir behind")
    CorpusLake.vacuumCorpus(spark, parent, 1L)
    assert(CorpusLake.retentionFloor(spark, parent) == 1L)
  }

  test("branch: chains overlay transitively and the pruned read crosses the chain") {
    import spark.implicits._
    val parent = mkParent()
    val b1 = parent.stripSuffix("/parent") + "/b1"
    val b2 = parent.stripSuffix("/parent") + "/b2"
    CorpusLake.createBranch(spark, dir, parent, b1, "b1")
    baseDocs.filter($"doc_id" % 6 === 5)
      .select($"doc_id", concat($"text", lit(" b1")).as("text"),
        lit(1L).as("epoch"))
      .write.mode("append").parquet(s"$b1/docs")
    commitTo(b1, 1L)
    val base2 = CorpusLake.createBranch(spark, dir, b1, b2, "b2")
    assert(base2 == 1L, s"nested branch based at $base2")
    baseDocs.filter($"doc_id" % 11 === 6)
      .select($"doc_id", concat($"text", lit(" b2")).as("text"),
        lit(2L).as("epoch"))
      .write.mode("append").parquet(s"$b2/docs")
    commitTo(b2, 2L)
    // the grandchild serves all three layers, innermost-wins
    val full = served(CorpusLake.readCorpusAt(spark, dir, b2))
    assert(full.filter(_._1 % 11 == 6).forall(_._2.endsWith(" b2")))
    assert(full.exists(r => r._1 % 6 == 5 && r._1 % 11 != 6 &&
      r._2.endsWith(" b1")))
    assert(full.exists(r => r._1 % 10 == 1 && r._1 % 6 != 5 &&
      r._1 % 11 != 6 && r._2.endsWith(" u1")))
    // zone-pruned range read resolves files across the WHOLE chain and
    // stays row-identical; stats only exist on the parent — the branch
    // legs degrade conservatively, never to wrong answers
    CorpusLake.collectFileStats(spark, parent)
    val fullRange = full.filter(r => r._1 >= 100L && r._1 <= 299L)
    assert(served(CorpusLake.readCorpusAtRange(spark, dir, b2, 100L, 299L))
      == fullRange, "chained pruned read diverged")
    val (cand, total) = CorpusLake.pruningStats(spark, b2, 150L, 160L)
    assert(total > 0 && cand <= total)
  }

  test("branch: squash-rebase replays the net effect onto the parent's new head") {
    import spark.implicits._
    val parent = mkParent()
    val root = parent.stripSuffix("/parent")
    val (b1, b2) = (s"$root/r1", s"$root/r2")
    CorpusLake.createBranch(spark, dir, parent, b1, "r1")
    baseDocs.filter($"doc_id" % 6 === 5)
      .select($"doc_id", concat($"text", lit(" b1")).as("text"),
        lit(1L).as("epoch"))
      .write.mode("append").parquet(s"$b1/docs")
    commitTo(b1, 1L)
    CorpusLake.deleteDocs(spark, b1,
      baseDocs.filter($"doc_id" % 7 === 4).select($"doc_id"))
    // the parent advances past the branch point
    baseDocs.filter($"doc_id" % 8 === 3)
      .select($"doc_id", concat($"text", lit(" p2")).as("text"),
        lit(1L).as("epoch"))
      .write.mode("append").parquet(s"$parent/docs")
    commitTo(parent, 1L)

    val newBase = CorpusLake.rebaseBranch(spark, dir, b1, b2, "r2")
    assert(newBase == 1L, s"rebased onto $newBase, expected the new head 1")
    val rebased = served(CorpusLake.readCorpusAt(spark, dir, b2))
    // the rebased branch sees the parent's new epoch AND its own changes;
    // for conflicting docs the branch wins (squash epoch > new base)
    assert(rebased.exists(r => r._1 % 8 == 3 && r._1 % 6 != 5 &&
      r._1 % 7 != 4 && r._2.endsWith(" p2")),
      "parent's post-branch epoch missing after rebase")
    assert(rebased.filter(_._1 % 6 == 5).forall(_._2.endsWith(" b1")),
      "branch updates lost the rebase LWW")
    assert(!rebased.exists(_._1 % 7 == 4), "branch takedowns lost in rebase")
    // the old branch is untouched: still blind to " p2"
    val old = served(CorpusLake.readCorpusAt(spark, dir, b1))
    assert(!old.exists(_._2.endsWith(" p2")), "rebase mutated the old branch")
    // both live branches listed; dropping the old releases only its pin
    assert(CorpusLake.branches(spark, parent)
      .select($"name").as[String].collect().toSet == Set("r1", "r2"))
    CorpusLake.dropBranch(spark, b1)
    assert(CorpusLake.branches(spark, parent)
      .select($"name").as[String].collect().toSeq == Seq("r2"))
  }

  test("branch: evolved carry columns ride merge and replication intact") {
    import spark.implicits._
    val parent = mkParent()
    val root = parent.stripSuffix("/parent")
    val (branch, replica) = (s"$root/evo", s"$root/replica")
    CorpusLake.createBranch(spark, dir, parent, branch, "evo")
    // the branch commits an epoch with an EVOLVED metadata column
    Seq((6000001L, "evolved doc body", 1L, "crawl-7"))
      .toDF("doc_id", "text", "epoch", "source")
      .write.mode("append").parquet(s"$branch/docs")
    commitTo(branch, 1L)
    assert(CorpusLake.readCorpusAt(spark, dir, branch)
      .filter($"doc_id" === 6000001L).select($"source").as[String].head()
      == "crawl-7", "evolved column lost on the branch read")
    // merge: the evolved column lands in the parent epoch
    CorpusLake.mergeBranch(spark, branch)
    assert(CorpusLake.readCorpusAt(spark, dir, parent)
      .filter($"doc_id" === 6000001L).select($"source").as[String].head()
      == "crawl-7", "evolved column lost in the merge")
    // replication: the column rides the CDC feed to the follower
    CorpusLake.replicateLake(spark, dir, parent, replica)
    assert(CorpusLake.readCorpusAt(spark, dir, replica)
      .filter($"doc_id" === 6000001L).select($"source").as[String].head()
      == "crawl-7", "evolved column lost through replication")
    // pre-evolution docs serve null there, on every surface
    assert(CorpusLake.readCorpusAt(spark, dir, replica)
      .filter($"doc_id" === 3L).select($"source").isEmpty ||
      CorpusLake.readCorpusAt(spark, dir, replica)
        .filter($"doc_id" === 3L).select($"source")
        .as[Option[String]].head().isEmpty,
      "pre-evolution doc must serve null for the evolved column")
  }

  test("branch: DESCRIBE BRANCHES lists live branches and drop removes them") {
    import spark.implicits._
    val parent = mkParent()
    val root = parent.stripSuffix("/parent")
    CorpusLake.createBranch(spark, dir, parent, s"$root/d1", "d1")
    CorpusLake.createBranch(spark, dir, parent, s"$root/d2", "d2")
    val listed = CorpusLake.branches(spark, parent)
      .select($"name", $"base_version").as[(String, Long)].collect().toSet
    assert(listed == Set(("d1", 0L), ("d2", 0L)), s"listing: $listed")
    CorpusLake.dropBranch(spark, s"$root/d1")
    assert(CorpusLake.branches(spark, parent)
      .select($"name").as[String].collect().toSeq == Seq("d2"))
    // lakeStats carries the branch facts on both sides
    def stats(d: String) = CorpusLake.lakeStats(spark, d)
      .as[(String, Long)].collect().toMap
    assert(stats(parent)("live_branches") == 1L &&
      stats(parent)("is_branch_of_version") == -1L)
    assert(stats(s"$root/d2")("is_branch_of_version") == 0L)
  }

  test("branch: ingest admission dedups shared history, isolated from post-branch parent commits") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.sources.Caches.releaseAll()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-branch-ingest").toString
    val (idx, parent, pMaint) = (s"$tmp/idx", s"$tmp/parent", s"$tmp/pm")
    val (branch, bMaint) = (s"$tmp/exp", s"$tmp/bm")
    CorpusLake.initCorpus(spark, dir, idx)
    def words(p: String) = (1 to 40).map(i => s"$p$i").mkString(" ")
    def nearDup(t: String) = t.split(" ").dropRight(1).mkString(" ") + " changed"
    val (docA, docB) = (words("shareda"), words("laterb"))

    val inP = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val qP = CorpusLake.maintainCorpusStream(
        inP.toDF().toDF("doc_id", "text"), spark, dir, idx, parent, pMaint)
      .start()
    try {
      // pre-branch shared history: the parent admits docA
      inP.addData((5000001L, docA)); qP.processAllAvailable()
      CorpusLake.createBranch(spark, dir, parent, branch, "ing")
      // post-branch parent commit: docB — invisible to the branch
      inP.addData((5000002L, docB)); qP.processAllAvailable()
    } finally qP.stop()

    val inB = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val qB = CorpusLake.maintainCorpusStream(
        inB.toDF().toDF("doc_id", "text"), spark, dir, idx, branch, bMaint,
        sharedBucketDirs = Seq(s"$pMaint/buckets"))
      .start()
    try {
      inB.addData((5000003L, nearDup(docA)), (5000004L, nearDup(docB)))
      qB.processAllAvailable()
    } finally qB.stop()

    val log = CorpusLake.admissionLog(spark, branch)
      .select($"doc_id", $"decision", $"first_dup")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(log(5000003L)._1 == "duplicate" &&
      log(5000003L)._2.contains(5000001L),
      s"shared-history dup not caught on the branch: ${log(5000003L)}")
    assert(log(5000004L)._1 == "admitted",
      s"post-branch parent doc leaked into branch admission: ${log(5000004L)}")
  }

  test("branch: lake-fed lexical refresh consumes the branch overlay, retraction included") {
    import spark.implicits._
    val parent = mkParent()
    val root = parent.stripSuffix("/parent")
    val (branch, maintB) = (s"$root/lex", s"$root/maintB")
    CorpusLake.createBranch(spark, dir, parent, branch, "lex")
    // branch commits a fresh doc and takes down BASE doc 3
    Seq((8000001L, "zebra quark flux lattice prism vortex"))
      .toDF("doc_id", "text").withColumn("epoch", lit(1L))
      .write.mode("append").parquet(s"$branch/docs")
    commitTo(branch, 1L)
    CorpusLake.deleteDocs(spark, branch, Seq(3L).toDF("doc_id"))
    // the refresher follows the BRANCH head and its overlay change feed
    val win = CorpusLake.refreshPostingsFromLake(spark, dir, branch, maintB)
    assert(win.contains((Long.MinValue, 2L)), s"window: $win")
    val seg = TextAnalysis.readPostingsDelta(spark, s"$maintB/seg")
    assert(seg.filter($"doc_id" === 8000001L && $"tok" === "zebra")
      .limit(1).count() == 1, "branch doc's postings missing")
    // the takedown rides as a tombstone posting: doc re-listed, null token
    val tomb = seg.filter($"doc_id" === 3L)
      .select($"tok").as[Option[String]].collect().toSeq
    assert(tomb == Seq(None), s"tombstone row wrong: $tomb")
    // the PARENT's own refresh sees none of it
    val maintP = s"$root/maintP"
    CorpusLake.refreshPostingsFromLake(spark, dir, parent, maintP)
    val pSeg = TextAnalysis.readPostingsDelta(spark, s"$maintP/seg")
    assert(pSeg.filter($"doc_id" === 8000001L).limit(1).count() == 0 &&
      pSeg.filter($"doc_id" === 3L && $"tok".isNull).limit(1).count() == 0,
      "branch changes leaked into the parent's index refresh")
  }
}
