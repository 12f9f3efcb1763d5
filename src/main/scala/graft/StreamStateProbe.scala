package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.EventOps
import graft.streaming.EventStreams

/** Measures Structured Streaming STATE-STORE size for the heaviest
  * streaming twins against their design bounds — the evidence behind
  * the "state is O(users) / O(open windows) / O(buckets)" claims in
  * the streaming scaladocs, which plan-shape inspection cannot give
  * (state lives in the store, not the plan).
  *
  * `runMain graft.StreamStateProbe [sfDir] [chunks]`
  *
  * Replays the corpus in time-ordered chunks through every stateful
  * twin family and records per-micro-batch `stateOperators` metrics
  * (numRowsTotal, memoryUsedBytes), then checks each twin's bound:
  *   - sessionGaps: state rows == distinct users (two longs per key)
  *   - errorRateHourly: state rows ≤ distinct event hours, with
  *     watermark eviction keeping the FINAL count at the open tail,
  *     not the stream's history
  *   - streamingSemanticDupFlags: state rows ≤ nTables·2^bits bucket
  *     keys (admission-capped vectors inside each)
  *   - perUserQuota: state rows == distinct users (ONE counter per
  *     key regardless of traffic — transformWithState ValueState)
  *   - transitionEdges: state rows == distinct users (one last-event
  *     row per key)
  *   - streamingAttribution: state rows == distinct users (two-field
  *     last-touch state)
  *   - strictFunnelHits: state rows == distinct users (three longs)
  *   - runningLabelCentroids: state rows == distinct labels (one
  *     (count, sum-vector) per label — label-cardinality, not corpus)
  * Prints one JSON line; exits 1 when a bound is violated.
  */
object StreamStateProbe {

  private case class Probe(rows: Seq[Long], mem: Seq[Long])

  private def run[T](spark: SparkSession, name: String, chunks: Int,
                     data: Seq[T], start: MemoryStream[T] =>
      org.apache.spark.sql.streaming.DataStreamWriter[_])
      (implicit enc: org.apache.spark.sql.Encoder[T]): Probe = {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[T]
    val q = start(mem).queryName(name).start()
    try {
      data.grouped(math.max(1, data.length / chunks + 1)).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
      val progress = q.recentProgress.toSeq
        .filter(p => p.stateOperators.nonEmpty && p.numInputRows > 0)
      Probe(progress.map(_.stateOperators.head.numRowsTotal),
        progress.map(_.stateOperators.head.memoryUsedBytes))
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val chunks = if (args.length > 1) args(1).toInt else 8
    val spark = GraftSession.configure(SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val events = Tables.events(spark, sfDir)
    var failures = List.empty[String]
    def check(cond: Boolean, msg: => String): Unit =
      if (!cond) failures ::= msg

    // 1. sessionGaps: keyed state is exactly one entry per user
    val sessRows = EventOps.withTsUs(events)
      .select("user_id", "ts_us").as[EventStreams.SessEvent]
      .collect().sortBy(_.ts_us).toSeq
    val nUsers = sessRows.map(_.user_id).distinct.size
    val pSess = run[EventStreams.SessEvent](spark, "probe_sgap", chunks, sessRows,
      m => EventStreams.sessionGaps(m.toDS()).toDF()
        .writeStream.format("memory").outputMode("append"))
    check(pSess.rows.last == nUsers,
      s"sessionGaps state ${pSess.rows.last} != distinct users $nUsers")

    // 2. errorRateHourly: open tumbling windows, watermark-evicted
    val erRows = EventOps.withTsTimestamp(events)
      .select("ts", "event_type").as[(java.sql.Timestamp, String)]
      .collect().sortBy(_._1.getTime).toSeq
    val nHours = erRows.map(_._1.getTime / 3600000L).distinct.size
    val pEr = run[(java.sql.Timestamp, String)](spark, "probe_erate", chunks, erRows,
      m => EventStreams.errorRateHourly(m.toDF().toDF("ts", "event_type"))
        .writeStream.format("memory").outputMode("append"))
    check(pEr.rows.max <= nHours,
      s"errorRateHourly peak state ${pEr.rows.max} > distinct hours $nHours")
    check(pEr.rows.last < nHours || nHours <= 3,
      s"errorRateHourly final state ${pEr.rows.last} shows no watermark eviction over $nHours hours")

    // 3. semantic dup, full-precision reference: ≤ nTables·2^bits
    // bucket keys
    val (nTables, bits) = (4, 8)
    val vecRows = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val pSem = run[(Long, Seq[Double])](spark, "probe_semdup", chunks, vecRows,
      m => EventStreams.streamingSemanticDupFlags(m.toDF().toDF("vec_id", "v"),
          nTables = nTables, bitsPerTable = bits, fullPrecisionState = true).toDF()
        .writeStream.format("memory").outputMode("append"))
    val bucketBound = nTables.toLong << bits
    check(pSem.rows.last <= bucketBound,
      s"semanticDup state ${pSem.rows.last} > bucket-key bound $bucketBound")

    // 3b. the DEFAULT path (int8-quantized state since round 11): same
    // bucket-key bound, materially smaller per-entry payload, and the
    // default-on promotion gate — pair recall AND precision ≥ 0.95
    // against the full-precision reference on this corpus replay
    val pSem8 = run[(Long, Seq[Double])](spark, "probe_semdup8", chunks, vecRows,
      m => EventStreams.streamingSemanticDupFlags(m.toDF().toDF("vec_id", "v"),
          nTables = nTables, bitsPerTable = bits).toDF()
        .writeStream.format("memory").outputMode("append"))
    check(pSem8.rows.last <= bucketBound,
      s"semanticDupInt8 state ${pSem8.rows.last} > bucket-key bound $bucketBound")
    check(pSem8.mem.max < pSem.mem.max,
      s"semanticDupInt8 state ${pSem8.mem.max} B not smaller than full ${pSem.mem.max} B")
    def pairsOf(table: String): Set[(Long, Long)] =
      spark.table(table).collect()
        .map(r => (r.getLong(2), r.getLong(0))).toSet
    val fullPairs = pairsOf("probe_semdup")
    val int8Pairs = pairsOf("probe_semdup8")
    val sharedPairs = fullPairs intersect int8Pairs
    val recall = if (fullPairs.isEmpty) 1.0 else sharedPairs.size.toDouble / fullPairs.size
    val precision = if (int8Pairs.isEmpty) 1.0 else sharedPairs.size.toDouble / int8Pairs.size
    check(recall >= 0.95, f"semanticDupInt8 recall $recall%.4f < 0.95 vs full-precision replay")
    check(precision >= 0.95, f"semanticDupInt8 precision $precision%.4f < 0.95 vs full-precision replay")

    // 4. perUserQuota (transformWithState): ONE ValueState counter per
    // user — state is O(users) regardless of per-user traffic.
    // transformWithState requires the RocksDB provider (column
    // families); scope it to THIS query so the other twins keep the
    // default HDFSBacked store and their memory numbers stay
    // comparable with prior rounds' artifacts.
    val quotaRows = EventOps.withTsUs(events)
      .select("user_id", "ts_us", "event_id")
      .collect().sortBy(r => (r.getLong(1), r.getLong(2)))
      .map(r => EventStreams.QuotaEvent(r.getLong(0), r.getLong(2))).toSeq
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val priorProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val pQuota =
      try run[EventStreams.QuotaEvent](spark, "probe_quota", chunks, quotaRows,
        m => EventStreams.perUserQuota(m.toDS()).toDF()
          .writeStream.format("memory").outputMode("append"))
      finally priorProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    check(pQuota.rows.last == nUsers,
      s"perUserQuota state ${pQuota.rows.last} != distinct users $nUsers")

    // 5. transitionEdges: one last-event row per user
    val seqRows = EventOps.withTsUs(events)
      .select("user_id", "ts_us", "event_id", "event_type")
      .as[EventStreams.SeqEvent]
      .collect().sortBy(e => (e.ts_us, e.event_id)).toSeq
    val pTrans = run[EventStreams.SeqEvent](spark, "probe_trans", chunks, seqRows,
      m => EventStreams.transitionEdges(m.toDS()).toDF()
        .writeStream.format("memory").outputMode("append"))
    check(pTrans.rows.last == nUsers,
      s"transitionEdges state ${pTrans.rows.last} != distinct users $nUsers")

    // 6. streamingAttribution: two-field last-touch state per user
    val attrRows = EventOps.withTsUs(events)
      .select("user_id", "ts_us", "event_id", "event_type", "value")
      .as[EventStreams.AttrEvent]
      .collect().sortBy(e => (e.ts_us, e.event_id)).toSeq
    val pAttr = run[EventStreams.AttrEvent](spark, "probe_attr", chunks, attrRows,
      m => EventStreams.streamingAttribution(m.toDS()).toDF()
        .writeStream.format("memory").outputMode("append"))
    check(pAttr.rows.last == nUsers,
      s"streamingAttribution state ${pAttr.rows.last} != distinct users $nUsers")

    // 7. strictFunnelHits: three longs per user
    val funRows = EventOps.withTsUs(events)
      .select("user_id", "ts_us", "event_type")
      .as[EventStreams.FunnelEvent]
      .collect().sortBy(_.ts_us).toSeq
    val pFun = run[EventStreams.FunnelEvent](spark, "probe_funnel", chunks, funRows,
      m => EventStreams.strictFunnelHits(m.toDS()).toDF()
        .writeStream.format("memory").outputMode("append"))
    check(pFun.rows.last == nUsers,
      s"strictFunnelHits state ${pFun.rows.last} != distinct users $nUsers")

    // 8. runningLabelCentroids: one (count, sum-vector) per LABEL —
    // state scales with label cardinality, never the corpus
    val labVecs = Tables.embeddings(spark, sfDir)
      .selectExpr("label", "embedding")
      .as[EventStreams.LabeledVec].collect().toSeq
    val nLabels = labVecs.map(_.label).distinct.size
    val pCent = run[EventStreams.LabeledVec](spark, "probe_centroid", chunks, labVecs,
      m => EventStreams.runningLabelCentroids(m.toDS()).toDF()
        .writeStream.format("memory").outputMode("update"))
    check(pCent.rows.last == nLabels,
      s"runningLabelCentroids state ${pCent.rows.last} != distinct labels $nLabels")

    val twins = Seq(
      ("sessionGaps", pSess, s""""bound_users":$nUsers"""),
      ("errorRateHourly", pEr, s""""bound_hours":$nHours"""),
      ("semanticDup", pSem, s""""bound_buckets":$bucketBound"""),
      ("semanticDupInt8", pSem8,
        f""""bound_buckets":$bucketBound,"recall_vs_full":$recall%.4f,"precision_vs_full":$precision%.4f"""),
      ("perUserQuota", pQuota, s""""bound_users":$nUsers"""),
      ("transitionEdges", pTrans, s""""bound_users":$nUsers"""),
      ("streamingAttribution", pAttr, s""""bound_users":$nUsers"""),
      ("strictFunnelHits", pFun, s""""bound_users":$nUsers"""),
      ("runningLabelCentroids", pCent, s""""bound_labels":$nLabels"""))
    val body = twins.map { case (n, p, bound) =>
      s""""$n":{"batches":${p.rows.size},"rows_final":${p.rows.last},""" +
        s""""rows_peak":${p.rows.max},"mem_peak_bytes":${p.mem.max},$bound}"""
    }.mkString(",")
    println(s"""{"metric":"stream_state","sf":"$sfDir","chunks":$chunks,$body}""")
    failures.foreach(f => println(s"BOUND VIOLATED: $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
