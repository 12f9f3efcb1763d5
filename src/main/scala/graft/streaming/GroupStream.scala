package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Streaming connected components: the continuously-ingesting face of
  * [[Dedup.connectedGroups]] — near-dup candidate PAIRS arrive forever
  * (e.g. the band-collision output of [[CurateStream]]'s stage 3, or
  * any LSH/similarity pair feed) and the doc→group mapping is kept
  * current after every micro-batch. This was the one batch dedup
  * stage with no streaming twin: exact dedup streams via digests,
  * near-dup candidate generation streams via band state, but group
  * RESOLUTION previously required a full-corpus batch CC rerun.
  *
  * State design — a sink-resident root CHANGELOG, not a keyed state
  * store. Union-find is inherently cross-key (merging components
  * rewrites OTHER keys' roots), which `transformWithState`'s
  * per-key-isolated state cannot express, and the doc→root map grows
  * with the corpus — the exact shape the repo keeps OUT of the state
  * store ([[CurateStream]] precedent: state stores hold bounded
  * per-key state; corpus-growing state lives in the parquet sink).
  * The changelog at `outDir/_state/roots/batch_id=<id>` holds rows
  * `(doc_id, root)` written only when a doc's root CHANGES; because
  * roots are component minima and merges only ever lower them, a
  * doc's current root is `min(root)` over its rows — the read face
  * ([[sinkGroups]]) is one corpus-sized groupBy at READ time, never
  * per batch.
  *
  * Per micro-batch (all frames batch-bounded unless noted):
  *   1. roots of batch-touched docs: the corpus-sized changelog is
  *      probed MAP-ONLY (semi-join against the broadcast batch node
  *      set) and only the touched subset aggregates;
  *   2. batch edges collapse to ROOT-level edges (two broadcast
  *      joins against the touched-root map) and
  *      [[Dedup.connectedGroups]] runs on that root graph — work is
  *      O(batch), independent of corpus size;
  *   3. the resulting `old_root → new_root` remap (merged components
  *      only) rewrites members: one more MAP-ONLY changelog scan
  *      against the broadcast remap finds every doc whose current
  *      root merged away. Stale rows cannot match: a remap key is a
  *      CURRENT root of some touched doc, and any superseded root
  *      value was itself rewritten when it merged (so it is current
  *      for nothing). Amortized rewrite volume over the stream's
  *      life is the classic union-by-min bound — each doc rewrites
  *      only when its component's minimum drops;
  *   4. new nodes land with their resolved root; changed members and
  *      new nodes append as `batch_id=<id>` (idempotent overwrite —
  *      the [[CurateStream]] exactly-once contract, durable
  *      checkpoint included).
  *
  * Order independence: unlike the admission twins, NO arrival-order
  * assumption is needed — union-find is confluent, so any pair
  * arrival order converges to the batch CC answer. The replay spec
  * pins `sinkGroups == connectedGroups(all pairs)` exactly.
  *
  * Shape at 100 TB: per batch, two map-only scans of the changelog
  * (both probe sides broadcast, batch-sized) and a batch-bounded CC;
  * the changelog grows by one row per doc plus one per root change
  * (compact periodically by rewriting `min(root)` per doc, as any
  * streaming-state table). A production deployment buckets the
  * changelog by doc_id so the read face's groupBy is shuffle-free.
  */
object GroupStream {

  private val rootSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("root", LongType)))

  /** State as of the START of `batchId` — prior batches only, so a
    * replayed batch recomputes from the same state it first saw
    * (batch_id is the partition column; the filter prunes dirs).
    */
  private def readStateOr(spark: SparkSession, path: String,
                          batchId: Long): DataFrame = {
    StateCompaction.assertReadable(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], rootSchema)
    else
      spark.read.schema(rootSchema.add(StructField("batch_id", LongType)))
        .parquet(path)
        .filter(col("batch_id") < batchId)
        .select(col("doc_id"), col("root"))
  }

  /** Start the incremental-CC stream over `pairs` (columns doc_a,
    * doc_b). See object scaladoc for the state contract.
    */
  def groupsToSink(pairs: DataFrame, outDir: String,
                   checkpointDir: Option[String] = None,
                   compactEvery: Int = 0): StreamingQuery =
    pairs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$outDir/_checkpoint"))
      // compactEvery > 0 opts into CADENCED changelog compaction (see
      // [[CurateStream.curateToSink]] for the window/crash analysis:
      // recovery before the state reads, compaction after the batch's
      // writes — both between micro-batches by construction).
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (compactEvery > 0)
          StateCompaction.recoverTable(batch.sparkSession, s"$outDir/_state/roots")
        groupBatch(batch, batchId, outDir)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          compact(batch.sparkSession, outDir)
      }
      .start()

  /** One micro-batch of incremental union-find — package-visible so
    * the replay spec and state probe drive it directly.
    */
  private[graft] def groupBatch(batch: Dataset[Row], batchId: Long,
                                outDir: String): Unit = {
    val spark = batch.sparkSession
    val e = batch
      .select(col("doc_a").cast("long").as("doc_a"),
        col("doc_b").cast("long").as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .localCheckpoint(false)
    val nodes = e.select(col("doc_a").as("doc_id"))
      .union(e.select(col("doc_b").as("doc_id")))
      .distinct()
      .localCheckpoint(false)

    // 1. current roots of touched docs: map-only probe of the
    // corpus-sized changelog (batch node set broadcast), then a
    // batch-sized aggregate — min(root) IS the latest root because
    // merges only ever lower a doc's root
    val log = readStateOr(spark, s"$outDir/_state/roots", batchId)
    val touched = log.join(broadcast(nodes), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(min("root").as("root"))
      .localCheckpoint(false)
    val prov = nodes.join(touched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("root"), col("doc_id")).as("prov_root"))
      .localCheckpoint(false)

    // 2. root-level union graph + batch-bounded CC (keep-min rule —
    // identical group_id convention to the batch operator)
    val rootEdges = e
      .join(prov.select(col("doc_id").as("doc_a"), col("prov_root").as("ra")),
        Seq("doc_a"))
      .join(prov.select(col("doc_id").as("doc_b"), col("prov_root").as("rb")),
        Seq("doc_b"))
      .select(col("ra").as("doc_a"), col("rb").as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()
    val remap = Dedup.connectedGroups(rootEdges)
      .filter(col("group_id") =!= col("doc_id"))
      .select(col("doc_id").as("old_root"), col("group_id").as("new_root"))
      .localCheckpoint(false)

    // 3. members of merged components: second map-only changelog scan
    // (remap broadcast); only CURRENT roots can match (see scaladoc)
    val memberRewrites = log
      .join(broadcast(remap), log("root") === remap("old_root"))
      .select(col("doc_id"), col("new_root").as("root"))
      .dropDuplicates("doc_id")

    // 4. new nodes with their resolved root; one idempotent batch dir
    val newRows = nodes
      .join(touched.select("doc_id"), Seq("doc_id"), "left_anti")
      .join(prov, Seq("doc_id"))
      .join(broadcast(remap), col("prov_root") === col("old_root"), "left")
      .select(col("doc_id"),
        coalesce(col("new_root"), col("prov_root")).as("root"))
    memberRewrites.unionByName(newRows)
      .write.mode("overwrite")
      .parquet(s"$outDir/_state/roots/batch_id=$batchId")
    ()
  }

  /** The current doc→group mapping — same columns and keep-min
    * semantics as [[Dedup.connectedGroups]]. One corpus-sized groupBy
    * at read time (bucket the changelog by doc_id in production to
    * make it shuffle-free); roots only decrease, so min(root) is the
    * latest value without any batch_id tie-breaking. Before the first
    * micro-batch commits, the changelog directory does not exist —
    * same guard as [[readStateOr]], empty frame instead of an
    * AnalysisException.
    */
  def sinkGroups(spark: SparkSession, outDir: String): DataFrame = {
    StateCompaction.assertReadable(spark, s"$outDir/_state/roots")
    val p = new org.apache.hadoop.fs.Path(s"$outDir/_state/roots")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("group_id", LongType))))
    else
      spark.read.parquet(p.toString)
        .groupBy("doc_id").agg(min("root").as("group_id"))
  }

  /** Changelog compaction — the maintenance operation the object
    * scaladoc prescribes, made executable: every batch dir STRICTLY
    * BELOW the newest one collapses to `min(root)` per doc in a
    * single baseline dir `batch_id=<maxId-1>`. Correctness rides the
    * same monotonicity as every read: roots only ever decrease, so
    * min-over-prior-rows IS the state as of the start of batch
    * `maxId` — [[readStateOr]] for any future batch and
    * [[sinkGroups]] read identical values before and after (the
    * replay spec pins this). The newest dir is NEVER touched: it is
    * the only batch Structured Streaming can replay after a crash
    * (foreachBatch commits lag the sink write), and its replay reads
    * `batch_id < maxId` — exactly the compacted baseline.
    *
    * Run while the stream is stopped (or between micro-batches) with
    * NO concurrent readers: a read landing inside the delete-to-rename
    * window would see only the newest dir, so the window is fenced by
    * an in-progress marker that makes every read/write face throw
    * instead ([[StateCompaction.assertReadable]]). Commit discipline,
    * crash recovery (target id recorded with the committed tmp, rename
    * results checked) and the full case analysis live in
    * [[StateCompaction]] — min(root) per doc is subsumption-sound
    * because roots only ever decrease.
    */
  def compact(spark: SparkSession, outDir: String): Unit =
    StateCompaction.compactTable(spark, s"$outDir/_state/roots", rootSchema,
      _.groupBy("doc_id").agg(min("root").as("root")))
}
