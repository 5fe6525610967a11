package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped cache registry for the intermediate results operators
  * reuse (minhash signatures, gram arrays, label-propagation edges, …).
  *
  * Two jobs:
  *  - `shared` persists a plan only if no EQUAL plan is already cached
  *    (`Dataset.storageLevel` consults the session CacheManager by canonical
  *    plan), so composing pipelines — `Curate` reusing `langId`/`clusters` —
  *    silently share one cache instead of tripping "Asked to cache already
  *    cached data" warnings, and a query re-invoked in the same session
  *    reuses its prior materialization.
  *  - every handle this object persisted is tracked, and `releaseAll`
  *    unpersists them: a long-lived session (the driver's Verify loop, a
  *    notebook, a 1000-executor job server) calls it between pipelines so
  *    finished queries don't pin executor storage memory forever.
  *
  * `releaseAll` drains GLOBALLY, so it is only safe at a pipeline boundary
  * of a single-tenant session: in a session hosting concurrent pipelines
  * (parallel suites, a multi-user job server) one pipeline's drain would
  * evict another's in-flight caches — a silent recompute cliff, not a
  * wrongness bug. A multi-tenant host should scope a registry per pipeline.
  */
object Caches {

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), DataFrame]
  private val values =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), Any]

  /** Memoize a RESULT handle by (session, key) — for deterministic
    * pipelines whose plan `shared`'s plan-equality can never match across
    * invocations: an iterative computation (label propagation) re-built per
    * call carries fresh localCheckpoint lineage IDs, so the CacheManager
    * sees a brand-new plan each time and the loop re-executes even though
    * the result is identical. Returning the SAME DataFrame handle makes
    * reuse trivial. Only for results that are pure functions of the key
    * within a session (fixture-dir-derived, deterministic); `releaseAll`
    * drops the memo with the caches. */
  def memoized(spark: org.apache.spark.sql.SparkSession, key: String)
      (build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((spark, key), build)

  /** Memoize an arbitrary VALUE by (session, key) — for the eager
    * per-invocation driver actions an index build runs before any plan
    * exists (a corpus row count sizing a stride, an index's collected
    * scalars, a tuple of index artifacts). Same contract as [[memoized]]:
    * only for values that are pure functions of the key within a session
    * (immutable fixture dir); dropped by `releaseAll`. The ClassTag check
    * makes two call sites accidentally sharing a key at DIFFERENT types
    * fail fast with the colliding key name, instead of a
    * ClassCastException far from the offending call (erasure limits the
    * check to the outer class — a Tuple4 of the wrong element types still
    * slips — but that is exactly the distant-CCE case this can catch). */
  def memoizedValue[T](spark: org.apache.spark.sql.SparkSession, key: String)
      (build: => T)(implicit ct: scala.reflect.ClassTag[T]): T = {
    val v = values.getOrElseUpdate((spark, key), build)
    ct.unapply(v).getOrElse(throw new IllegalStateException(
      s"Caches.memoizedValue key '$key' already holds a ${v.getClass.getName} " +
        s"but this call site requested ${ct.runtimeClass.getName} — " +
        "two call sites are colliding on the key"))
  }

  /** [[memoizedValue]] at Long — kept as the named entry point the stride
    * sizing call sites read naturally. */
  def memoizedCount(spark: org.apache.spark.sql.SparkSession, key: String)
      (build: => Long): Long =
    memoizedValue(spark, key)(build)

  private val signed =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), (Long, Any)]

  /** Order-independent signature of a path's recursive file listing
    * (name, length, mtime per file) — one local-FS metadata walk, no
    * Spark job. Changes whenever any file under the path is added,
    * removed, renamed, resized or re-written (parquet writers always
    * create fresh UUID part names, so an in-place rewrite cannot alias). */
  private def listingSignature(spark: org.apache.spark.sql.SparkSession,
      path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    var h = 0L
    var n = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      var f = st.getPath.toString.hashCode.toLong
      f = f * 1000003L + st.getLen
      f = f * 1000003L + st.getModificationTime
      h ^= f * -7046029254386353131L // order-independent mix
      n += 1
    }
    h * 1000003L + n
  }

  /** Memoize a value derived from the files under `path`, invalidated by
    * the path's listing signature: a re-read happens exactly when
    * something on disk changed. This is METADATA memoization (parsed
    * pointer rows, analyzed read plans / inferred schemas), never result
    * caching — a returned DataFrame handle is an unpersisted plan that
    * still scans parquet on every execution. The win is the per-call
    * driver round trip: every `spark.read.parquet` runs a schema-inference
    * Spark job (a 32-task one under mergeSchema), and the lake serve
    * paths re-read the same KB-scale manifest/pointer artifacts several
    * times per query (guide §5: the driver should do almost no data
    * work). The listing walk is a local-FS metadata op; at 100 TB the
    * same role is played by a table format's cached log snapshot
    * (guide §6 — manifest metadata beats directory listing). */
  def bySignature[T](spark: org.apache.spark.sql.SparkSession, key: String,
      path: String)(build: => T)(implicit ct: scala.reflect.ClassTag[T]): T = {
    val sig = listingSignature(spark, path)
    val k = (spark, s"$key|$path")
    signed.get(k) match {
      case Some((s, v)) if s == sig =>
        ct.unapply(v).getOrElse(throw new IllegalStateException(
          s"Caches.bySignature key '$key' holds a ${v.getClass.getName} " +
            s"but this call site requested ${ct.runtimeClass.getName}"))
      case _ =>
        val v = build
        signed.put(k, (sig, v))
        v
    }
  }

  /** Persist `df` unless an equal plan is already cached; track the handle. */
  def shared(df: DataFrame): DataFrame = synchronized {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist()
      tracked += df
    }
    df
  }

  /** Drop every memo/value entry of `spark` whose key starts with
    * `prefix`, unpersisting any DataFrame handles the dropped entries hold
    * (including inside tuples) — the invalidation hook for the ONE place
    * the immutable-dir contract does not apply: persisted index artifacts,
    * which change at a compaction boundary. Callers (compaction jobs)
    * invalidate their own key namespace; everything else stays cached. */
  def invalidate(spark: org.apache.spark.sql.SparkSession,
      prefix: String): Unit = synchronized {
    def unp(x: Any): Unit = x match {
      case ds: org.apache.spark.sql.Dataset[_] =>
        try ds.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () }
        tracked.filterInPlace(_ ne ds)
      case p: Product => p.productIterator.foreach(unp)
      case _ => ()
    }
    memo.filterInPlace { case ((s, k), df) =>
      val drop = (s eq spark) && k.startsWith(prefix)
      if (drop) unp(df)
      !drop
    }
    values.filterInPlace { case ((s, k), v) =>
      val drop = (s eq spark) && k.startsWith(prefix)
      if (drop) unp(v)
      !drop
    }
    signed.filterInPlace { case ((s, k), _) =>
      !((s eq spark) && k.startsWith(prefix))
    }
  }

  /** Number of currently tracked (persisted, unreleased) handles. */
  def trackedCount: Int = synchronized(tracked.size)

  /** Unpersist every tracked handle (non-blocking) and forget them. Only
    * NonFatal unpersist failures (e.g. a stopped session) are swallowed —
    * fatal errors and interrupts propagate. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach { df =>
      try df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    tracked.clear()
    memo.clear()
    values.clear()
    signed.clear()
  }
}
