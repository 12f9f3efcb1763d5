package graft

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Process-scoped memo of expensive shared intermediates — the
  * "materialize pairs once, fan out" production contract, wired into
  * the query registry so the bench/verify processes honor it too.
  *
  * The near-dup pair graph and its connected-components closure are
  * consumed by six+ downstream audits (cluster stats/best/size
  * histogram, PageRank, triangles, k-core, assortativity, degree
  * histogram). Each audit is individually correct when it recomputes
  * the chain, but an operator library that *encourages* re-running an
  * iterative fixpoint per consumer is an anti-pattern at 100 TB: in
  * production the pair table is written ONCE per corpus snapshot and
  * every audit reads the materialized table. This object is the
  * process-local form of that contract: the first consumer pays the
  * build (an eager `localCheckpoint`, which also cuts the iterative
  * lineage), every later consumer reuses the executor-resident
  * blocks. The cluster-scale form is [[asTable]] — write the
  * intermediate ONCE as a parquet table, serve every consumer
  * `spark.read` of the sink — which [[of]] routes to automatically
  * when [[SinkConfKey]] is set; a spec pins sink-backed rows ==
  * memo-backed rows across the dedup family.
  *
  * Keyed by `spark.sessionUUID` (unique and stable per session — an
  * identity hash code is neither, and can collide with a dead
  * session's key after GC), plus data dir and kind, so different
  * scale factors and test sessions never cross-contaminate; values
  * are deterministic (every builder here is seed-free md5/sort-based),
  * so reuse cannot change any oracle row.
  *
  * Concurrency: the map holds lazy cells, not built frames. The
  * mapping function only allocates a cell, so `computeIfAbsent` never
  * runs a Spark job while holding a bin lock (which would both block
  * unrelated keys and forbid the nested `of()` calls some builders
  * make — a recursive map update). Forcing the cell's `lazy val`
  * synchronizes on the cell alone, so each key still builds exactly
  * once.
  *
  * Lifecycle: entries of a stopped session are useless (their
  * checkpoint blocks die with the context) — a context-stop listener
  * evicts them so long-lived multi-session processes don't pin dead
  * sessions against GC, and a validate-on-hit guard rebuilds rather
  * than hand out a frame bound to a stopped context.
  */
object Materialized {

  private final class Cell(@volatile private var build: () => DataFrame) {
    lazy val df: DataFrame = {
      val built = build()
      build = null // release the builder closure (captured frames/lambdas)
      built
    }
  }

  private val cache = new ConcurrentHashMap[String, Cell]()
  private val hooked = ConcurrentHashMap.newKeySet[String]()

  /** Spark conf key: when set to a base directory, [[of]] routes every
    * memoized intermediate through [[asTable]] — the production face —
    * instead of the process-local checkpoint memo.
    */
  val SinkConfKey = "spark.graft.materialized.path"

  /** Spark conf key: byte threshold for the HYBRID face. When BOTH
    * this (> 0) and [[SinkConfKey]] are set, [[of]] keeps each memo
    * as a process-local checkpoint but PROMOTES any memo whose
    * measured block footprint reaches the threshold to its parquet
    * sink table, releasing the blocks — small memos keep executor-
    * block read speed, big ones stop pinning the heap. This is the
    * middle memory contract between the all-blocks memo face (fastest,
    * biggest heap floor) and the all-parquet sink face (8 g floor,
    * per-read parquet tax). With only [[SinkConfKey]] set the sink
    * face is unchanged: everything routes to parquet.
    */
  val SpillConfKey = "spark.graft.materialized.spillBytes"

  def of(spark: SparkSession, dir: String, kind: String)
        (build: => DataFrame): DataFrame = {
    val sinkBase = spark.conf.get(SinkConfKey, "")
    // Fail fast on an unparsable or negative threshold: silently
    // coercing e.g. '8g' to 0 would flip the session from the intended
    // hybrid face to the full sink face — a silent change of the
    // documented memory/performance contract.
    val spillBytes = {
      val raw = spark.conf.get(SpillConfKey, "0").trim
      val parsed = raw.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"$SpillConfKey must be a plain byte count (got '$raw'); " +
          "suffixed forms like '8g' are not parsed — spell out the bytes"))
      if (parsed < 0) throw new IllegalArgumentException(
        s"$SpillConfKey must be >= 0 (got $parsed); 0 disables the hybrid face")
      parsed
    }
    if (sinkBase.nonEmpty && spillBytes <= 0L)
      return asTable(spark, dir, kind, sinkBase)(build)
    val uuid = org.apache.spark.sql.GraftSqlShim.sessionUUID(spark)
    val key = s"$uuid|$dir|$kind"
    registerEviction(spark, uuid)
    def builder() = memoBuild(spark, dir, kind, sinkBase, spillBytes, () => build)
    val cell = cache.computeIfAbsent(key, _ => new Cell(() => builder()))
    val df = cell.df
    if (df.sparkSession.sparkContext.isStopped) {
      // Defensive: sessionUUID keys make a cross-session stale hit
      // impossible, so reaching here means the CALLER's own context
      // stopped after the memo was built. Drop the dead cell so a
      // later live caller rebuilds cleanly; the rebuild below then
      // surfaces Spark's own stopped-context error to this caller
      // instead of handing out a frame whose blocks are gone.
      cache.remove(key, cell)
      cache.computeIfAbsent(key, _ => new Cell(() => builder())).df
    } else df
  }

  /** Build one memo on the checkpoint (or hybrid) face. Plain memo
    * face: eager localCheckpoint, as always. Hybrid face (sink base +
    * spill threshold): a sink table already on disk — written by a
    * prior process or a prior promotion — is served directly with no
    * build at all; otherwise the memo is built as a checkpoint,
    * measured, and promoted to the sink iff it reached the threshold
    * (the write streams from the checkpoint blocks, not a recompute,
    * and the blocks are released right after).
    */
  private def memoBuild(spark: SparkSession, dir: String, kind: String,
                        sinkBase: String, spillBytes: Long,
                        build: () => DataFrame): DataFrame = {
    if (sinkBase.nonEmpty && sinkTableExists(spark, dir, kind, sinkBase))
      return asTable(spark, dir, kind, sinkBase)(sys.error(
        s"unreachable: sink table for $kind exists, build must not run"))
    val built = build().localCheckpoint(true)
    if (sinkBase.nonEmpty &&
        org.apache.spark.sql.GraftSqlShim.checkpointBytes(built).exists(_ >= spillBytes)) {
      val served = asTable(spark, dir, kind, sinkBase)(built)
      org.apache.spark.sql.GraftSqlShim.unpersistCheckpoint(built)
      served
    } else built
  }

  /** The memo's PRODUCTION face: materialize the intermediate as a
    * parquet table under `base` once per corpus snapshot, then serve
    * every consumer `spark.read.parquet` of the sink. This is the
    * contract a 100 TB run actually uses — the pair table / CC
    * closure must survive the session (and be shareable across jobs,
    * clusters, days), which executor-resident checkpoint blocks
    * cannot.
    *
    * Write-once discipline: the sink is keyed by (kind, data dir), so
    * one corpus snapshot gets exactly one build; a `_SUCCESS` marker
    * from ANY prior process (not just this one) skips the write —
    * builders are deterministic (seed-free md5/sort arithmetic), so a
    * prior snapshot's table is byte-equivalent to a rebuild. In-
    * process races collapse onto one lazy cell exactly like the memo
    * path (allocation under the CHM bin lock, the write under the
    * cell's own lock). Row ORDER is not part of this contract —
    * parquet read-back concatenates files in listing order — so
    * consumers that need an order sort after reading, which every
    * registry consumer already does.
    *
    * The sink name is INJECTIVE in (kind, dir): the human-readable
    * sanitized dir is suffixed with an md5 of the raw dir string, so
    * two corpora whose paths sanitize identically (`/a/sf10` vs
    * `/a_sf10`) can never collide onto one sink and silently serve
    * each other's table. Cross-PROCESS writers are handled by
    * build-to-temp + rename: the table is written to a sibling temp
    * dir and only renamed onto the live path when the live slot is
    * empty, so a reader never scans a half-written live path and a
    * concurrent second writer discards its temp instead of clobbering
    * the winner. The commit loop re-checks the `_SUCCESS` marker
    * before every destructive step and never renames onto an existing
    * dst (Hadoop's local-FS rename nests into an existing dir instead
    * of failing); a live path WITHOUT a marker is an abandoned partial
    * write and is removed. Residual caveat: plain FS ops have no
    * compare-and-swap, so a winner that completes its rename in the
    * instant between the marker re-check and the abandoned-dir delete
    * can still be clobbered — that window is one syscall wide and only
    * reachable when a previous writer CRASHED mid-commit; on stores
    * without atomic dir rename (raw S3), run one writer per sink base
    * — the usual object-store table caveat. Crashed writers' stale
    * `.inprogress-*` temps are garbage-collected best-effort (age
    * > 1 h) before the next build of the same sink.
    */
  def asTable(spark: SparkSession, dir: String, kind: String, base: String)
             (build: => DataFrame): DataFrame = {
    val path = sinkPath(dir, kind, base)
    val cell = sinks.computeIfAbsent(path, p => new SinkCell(p, () => build))
    cell.ensureWritten(spark)
    spark.read.parquet(path)
  }

  private def sinkPath(dir: String, kind: String, base: String): String = {
    val safeDir = dir.replaceAll("[^A-Za-z0-9._-]", "_").stripPrefix("_")
    val digest = org.apache.commons.codec.digest.DigestUtils.md5Hex(dir).take(8)
    s"${base.stripSuffix("/")}/${kind}__${safeDir}__$digest"
  }

  /** True iff the sink already holds a COMMITTED table for this memo
    * (`_SUCCESS` present) — the hybrid face's no-build fast path.
    */
  private def sinkTableExists(spark: SparkSession, dir: String,
                              kind: String, base: String): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(sinkPath(dir, kind, base), "_SUCCESS")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(marker)
  }

  private val sinks = new ConcurrentHashMap[String, SinkCell]()

  private final class SinkCell(path: String,
                               @volatile private var build: () => DataFrame) {
    private var written = false
    def ensureWritten(spark: SparkSession): Unit = synchronized {
      if (!written) {
        val dst = new org.apache.hadoop.fs.Path(path)
        val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
        val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          gcStaleTemps(fs, dst)
          val tmp = new org.apache.hadoop.fs.Path(
            path + ".inprogress-" + java.util.UUID.randomUUID().toString.take(8))
          build().write.mode("overwrite").parquet(tmp.toString)
          commit(fs, tmp, dst, marker)
        }
        build = null
        written = true
      }
    }

    /** Publish `tmp` onto `dst`. Invariants (the round-12 TOCTOU fix —
      * the old shape could delete a winner's LIVE table between its
      * marker re-check and the rename):
      *   - the marker is re-checked before EVERY destructive step; a
      *     marker means a winner finished — discard tmp, never touch dst;
      *   - rename is only attempted when dst is ABSENT (Hadoop local-FS
      *     rename onto an existing dir nests src inside it and reports
      *     success — renaming blind would corrupt the live table);
      *   - dst-present-without-marker (a crashed writer's partial
      *     rename target) is deleted, then the loop re-checks the
      *     marker before retrying, so a winner landing mid-loop is
      *     honored on the next pass.
      * Three passes bound the retries; losing three straight races to
      * concurrent committers of the SAME deterministic table is not a
      * live configuration (one writer per sink base is the documented
      * deployment), so past that we fail loudly rather than spin.
      */
    private def commit(fs: org.apache.hadoop.fs.FileSystem,
                       tmp: org.apache.hadoop.fs.Path,
                       dst: org.apache.hadoop.fs.Path,
                       marker: org.apache.hadoop.fs.Path): Unit = {
      var attempts = 0
      while (attempts < 3) {
        attempts += 1
        if (fs.exists(marker)) {
          // a concurrent process finished (possibly while we built):
          // keep the winner's live table, discard ours — builders are
          // deterministic, the tables are byte-equivalent
          fs.delete(tmp, true)
          return
        }
        if (!fs.exists(dst)) {
          if (fs.rename(tmp, dst)) return
          // dst appeared between the check and the rename — loop to
          // re-examine (marker first: a finished winner wins)
        } else {
          // dst without a marker is an abandoned partial write from a
          // crashed writer — remove it; the next pass re-checks the
          // marker before renaming (see scaladoc for the one-syscall
          // residual window this leaves on CAS-free stores)
          fs.delete(dst, true)
        }
      }
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"Materialized sink commit lost 3 races (concurrent writers on one sink base?): $path")
    }

    /** Best-effort GC of `.inprogress-*` siblings left by crashed
      * writers: only temps of THIS sink, only when older than 1 h (a
      * live concurrent writer's temp is at most minutes old while it
      * builds). Failures are swallowed — GC must never fail a build.
      */
    private def gcStaleTemps(fs: org.apache.hadoop.fs.FileSystem,
                             dst: org.apache.hadoop.fs.Path): Unit =
      try {
        val parent = dst.getParent
        if (parent != null && fs.exists(parent)) {
          val prefix = dst.getName + ".inprogress-"
          val cutoff = System.currentTimeMillis() - 60L * 60 * 1000
          fs.listStatus(parent).foreach { st =>
            if (st.getPath.getName.startsWith(prefix) &&
                st.getModificationTime < cutoff)
              try fs.delete(st.getPath, true) catch { case _: Throwable => () }
          }
        }
      } catch { case _: Throwable => () }
  }

  /** Test hygiene: forget which sinks were written (the parquet stays
    * on disk; a later call re-checks `_SUCCESS`).
    */
  def clearSinks(): Unit = sinks.clear()

  /** Evict every entry of `uuid` when its context stops. One listener
    * per (context, session) pair; the `hooked` guard keys on both so a
    * recreated context gets a fresh hook.
    */
  private def registerEviction(spark: SparkSession, uuid: String): Unit = {
    val sc = spark.sparkContext
    val hookKey = s"${sc.applicationId}|$uuid"
    if (hooked.add(hookKey)) {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          evict(uuid)
          hooked.remove(hookKey) // keep the guard set bounded too
        }
      })
    }
  }

  /** Drop every memoized frame of one session (checkpoint blocks are
    * released with their context; this clears the references).
    */
  def evict(uuid: String): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next().startsWith(s"$uuid|")) it.remove()
  }

  /** Test hygiene: drop every memoized frame. */
  def clear(): Unit = cache.clear()

  /** Test visibility: number of live entries for a session. */
  def entriesFor(uuid: String): Int = {
    var n = 0
    cache.keySet().forEach(k => if (k.startsWith(s"$uuid|")) n += 1)
    n
  }
}
