package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column conventions: opaque `binary` payloads + typed
  * metadata structs, with decode / feature-extraction plumbing.
  *
  * Convention (the part that matters at 100 TB):
  *   - payload: BinaryType — the raw media bytes, stored inline in
  *     parquet (or as object-store pointers for >row-group-size
  *     blobs; same schema either way).
  *   - meta: StructType(media_type, n_bytes, source) — queryable
  *     without touching the payload, so filters/pruning never read
  *     the blob pages (columnar win: metadata predicates push down,
  *     payload column is only scanned by decode stages).
  *
  * The decode itself is STUBBED (no image/audio libs in this
  * container): [[FakeDecoded]] features are a deterministic pure
  * function of the payload bytes. The Spark-side plumbing — schema,
  * partition-iterator batch shape, typed Dataset boundary — is real;
  * swap `decodeStub` for an actual codec binding per partition
  * (load-library-once-per-partition pattern) and nothing else
  * changes.
  */
object Multimodal {

  /** Project `documents` into the multimodal layout: payload =
    * UTF-8 bytes of the text (deterministic fake media), meta struct
    * derived per row. Media type fanned out deterministically from
    * doc_id so all three modalities appear.
    */
  def asMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        length(col("text").cast("binary")).as("n_bytes"),
        col("source").as("source")).as("meta"))

  /** Oracle-checkable payload statistics — metadata-only reads plus a
    * payload digest (binary md5 == text md5 for UTF-8 payloads).
    */
  def payloadStats(documents: DataFrame): DataFrame =
    asMedia(documents).select(
      col("doc_id"),
      col("meta.media_type").as("media_type"),
      col("meta.n_bytes").as("n_bytes"),
      md5(col("payload")).as("digest"))
      .orderBy("doc_id")

  /** Typed record crossing the Dataset boundary into decode. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Decoded features. STUB SEMANTICS: deterministic fake values
    * derived from payload bytes — a real build links a codec here.
    */
  case class FakeDecoded(doc_id: Long, media_type: String,
                         width: Int, height: Int, n_frames: Int, checksum: Long)

  /** ======= STUB: fake "decode" of a media payload. =======
    * Deterministic pure function of the bytes (rolling checksum →
    * pseudo width/height/frames). Replace the body with e.g. a JNI
    * image decoder; the per-partition iterator shape (init once,
    * stream records, no per-row setup) is the real contract.
    */
  private[graft] def decodeStub(r: MediaRecord): FakeDecoded = {
    var cs = 1125899906842597L
    var i = 0
    while (i < r.payload.length) { cs = cs * 31 + (r.payload(i) & 0xff); i += 1 }
    val w = 64 + ((cs >>> 8) % 1024).toInt.abs
    val h = 64 + ((cs >>> 24) % 1024).toInt.abs
    val f = if (r.media_type == "video") 1 + ((cs >>> 40) % 300).toInt.abs else 1
    FakeDecoded(r.doc_id, r.media_type, w, h, f, cs)
  }

  /** Decode/feature-extract stage: typed mapPartitions so any real
    * codec initializes once per partition (the `it => ...` closure
    * runs once per partition; per-record work streams through it).
    * This is the Scala analogue of mapInPandas batch processing.
    */
  def decodeFeatures(documents: DataFrame): Dataset[FakeDecoded] = {
    val spark = documents.sparkSession
    import spark.implicits._
    asMedia(documents)
      .select(col("doc_id"), col("payload"), col("meta.media_type").as("media_type"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // real impl: val codec = Codec.load() — once per partition
        it.map(decodeStub)
      }
  }

  /** "Frame sampling" over video payloads: take every `stride`-th
    * byte as a fake frame id — demonstrates payload-slicing plumbing
    * with metadata-pruned input (only video rows ever read payload).
    */
  def sampleFrames(documents: DataFrame, stride: Int = 16): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    asMedia(documents)
      .filter(col("meta.media_type") === "video")
      .select(col("doc_id"), col("payload"), col("meta.media_type").as("media_type"))
      .as[MediaRecord]
      .map { r =>
        val frames = r.payload.indices.by(stride).map(i => r.payload(i).toInt & 0xff).toArray
        (r.doc_id, frames.length, frames)
      }
      .toDF("doc_id", "n_frames", "frame_bytes")
      .orderBy("doc_id")
  }
}
