package graft

import org.apache.spark.storage.StorageLevel
import graft.sources.Caches

/** Cache-hygiene contract: composing operators share one materialization per
  * logical plan instead of re-persisting it (the CacheManager warning), and
  * releaseAll returns storage to empty so long-lived sessions don't pin
  * executor memory across pipelines. */
class CachesSpec extends SparkSpec {

  test("shared() persists a plan once and reuses it for an equal plan") {
    import spark.implicits._
    Caches.releaseAll()
    val base = spark.range(100).select($"id", ($"id" * 2).as("v"))
    val first = Caches.shared(base)
    first.count()
    assert(first.storageLevel != StorageLevel.NONE)
    val trackedAfterFirst = Caches.trackedCount
    // an EQUAL plan built independently must not create a second cache entry
    val again = Caches.shared(spark.range(100).select($"id", ($"id" * 2).as("v")))
    again.count()
    assert(again.storageLevel != StorageLevel.NONE)
    assert(Caches.trackedCount == trackedAfterFirst)
    Caches.releaseAll()
    assert(base.storageLevel == StorageLevel.NONE)
    assert(Caches.trackedCount == 0)
  }

  test("memoized() returns the same handle per key and releaseAll drops it") {
    import spark.implicits._
    Caches.releaseAll()
    var builds = 0
    def build() = { builds += 1; spark.range(10).select($"id") }
    val a = Caches.memoized(spark, "memo-test")(build())
    val b = Caches.memoized(spark, "memo-test")(build())
    assert((a eq b) && builds == 1)
    val other = Caches.memoized(spark, "memo-test-2")(build())
    assert(builds == 2 && !(other eq a))
    Caches.releaseAll()
    val c = Caches.memoized(spark, "memo-test")(build())
    assert(builds == 3 && !(c eq a))
    Caches.releaseAll()
  }

  test("memoizedCount() builds once per key and releaseAll drops the memo") {
    Caches.releaseAll()
    var builds = 0
    def build(): Long = { builds += 1; 42L }
    assert(Caches.memoizedCount(spark, "count-test")(build()) == 42L)
    assert(Caches.memoizedCount(spark, "count-test")(build()) == 42L)
    assert(builds == 1, "second lookup must return the cached scalar")
    assert(Caches.memoizedCount(spark, "count-test-2")(build()) == 42L)
    assert(builds == 2, "a different key must build its own value")
    Caches.releaseAll()
    assert(Caches.memoizedCount(spark, "count-test")(build()) == 42L)
    assert(builds == 3, "releaseAll must drop the scalar memo")
    Caches.releaseAll()
  }

  test("invalidate() drops only the prefixed keys and unpersists their frames") {
    import spark.implicits._
    Caches.releaseAll()
    // two DISTINCT plans: equal plans would share one CacheManager entry
    // and invalidating one would (correctly) unpersist both
    var builds = 0
    def frame(n: Int) = { builds += 1; Caches.shared(spark.range(n).toDF("id")) }
    val idxTuple = Caches.memoizedValue(spark, "inv-test-idx|/tmp/a") {
      (frame(10), 42L)
    }
    val keep = Caches.memoized(spark, "inv-keep")(frame(20))
    assert(builds == 2)
    Caches.invalidate(spark, "inv-test-idx|/tmp/a")
    // the tuple's frame was unpersisted, the unrelated memo survives
    assert(idxTuple._1.storageLevel == StorageLevel.NONE)
    assert(keep.storageLevel != StorageLevel.NONE)
    assert(Caches.memoized(spark, "inv-keep")(frame(20)) eq keep)
    assert(builds == 2, "a surviving memo must not rebuild")
    Caches.memoizedValue(spark, "inv-test-idx|/tmp/a")((frame(10), 43L))
    assert(builds == 3, "an invalidated key must rebuild")
    Caches.releaseAll()
  }

  test("memoizedValue() fails fast when two call sites collide on a key at different types") {
    Caches.releaseAll()
    Caches.memoizedValue(spark, "type-collision-test")(42L)
    intercept[IllegalStateException] {
      Caches.memoizedValue[String](spark, "type-collision-test")("nope")
    }
    assert(Caches.memoizedValue(spark, "type-collision-test")(0L) == 42L)
    Caches.releaseAll()
  }

  test("bySignature() memoizes per listing signature and re-reads on any file change") {
    import spark.implicits._
    Caches.releaseAll()
    val dir = java.nio.file.Files.createTempDirectory("graft-sig").toString
    spark.range(5).select($"id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    var builds = 0
    def read(): Long = Caches.bySignature[Long](spark, "sig-test", dir) {
      builds += 1
      spark.read.parquet(dir).count()
    }
    assert(read() == 5L && builds == 1)
    assert(read() == 5L && builds == 1,
      "unchanged listing must serve the memo, not re-read")
    // APPEND a file → signature changes → re-read sees the new rows
    spark.range(3).select(($"id" + 100).as("id")).coalesce(1)
      .write.mode("append").parquet(dir)
    assert(read() == 8L && builds == 2,
      "an appended file must invalidate the memo")
    // REWRITE in place (delete + overwrite, fresh part names) → re-read
    spark.range(2).select($"id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    assert(read() == 2L && builds == 3,
      "an overwritten store must invalidate the memo")
    // a DIFFERENT key over the same path holds its own entry
    var other = 0
    val s = Caches.bySignature[String](spark, "sig-test-2", dir) {
      other += 1; "x"
    }
    assert(s == "x" && other == 1 && builds == 3)
    // type collision on one key fails fast, like memoizedValue
    intercept[IllegalStateException] {
      Caches.bySignature[String](spark, "sig-test", dir)("nope")
    }
    // releaseAll drops the memo: same bytes on disk, but a fresh build
    Caches.releaseAll()
    assert(read() == 2L && builds == 4,
      "releaseAll must drop signature memos")
    Caches.releaseAll()
  }

  test("composed curate pipeline tracks caches and releases them all") {
    Caches.releaseAll()
    val dir = sf("sf0.001")
    SparkEntry.queries("pipeline_curate")(spark, dir).count()
    // the composition persisted sub-pipeline intermediates...
    assert(Caches.trackedCount > 0)
    val handleCount = Caches.trackedCount
    // ...and re-running the SAME query re-uses them instead of stacking more
    SparkEntry.queries("pipeline_curate")(spark, dir).count()
    assert(Caches.trackedCount == handleCount)
    Caches.releaseAll()
    assert(Caches.trackedCount == 0)
  }
}
