package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Bearly
import graft.operators.{Dedup, EventOps, Multimodal, Similarity, TextAnalysis}
import graft.queries.{Relational, TpchShapes}

/** multimodal payload operators — the `mmQueries`/`mmOracles` slice of the driver contract
  * (split from the single SparkEntry registry in round 9; SparkEntry
  * merges every domain trait back into the 313-key map the driver
  * reads — see [[graft.SparkEntry]]).
  */
private[graft] trait MultimodalRegistry {
  protected def mmQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_frame_entropy" -> ((s, d) => Multimodal.frameEntropy(Tables.documents(s, d))),
    "mm_modality_mix" -> ((s, d) => Multimodal.modalityMix(Tables.documents(s, d))),
    "mm_size_outliers" -> ((s, d) => Multimodal.payloadSizeOutliers(Tables.documents(s, d))),
    // --- multimodal ---
    "mm_payload_stats" -> ((s, d) => Multimodal.payloadStats(Tables.documents(s, d))),
    "mm_payload_dedup" -> ((s, d) => Multimodal.payloadDedup(Tables.documents(s, d))),
    "mm_decode_features" -> ((s, d) =>
      Multimodal.decodeFeatures(Tables.documents(s, d)).toDF().orderBy("doc_id")),
    "mm_sample_frames" -> ((s, d) => Multimodal.sampleFrames(Tables.documents(s, d))),
    "mm_shard_manifest" -> ((s, d) => Multimodal.shardManifest(Tables.documents(s, d))),
    "mm_text_embedding_align" -> ((s, d) =>
      Multimodal.textEmbeddingAlign(Tables.documents(s, d), Tables.embeddings(s, d))),
  )

  protected def mmOracles: Map[String, String] = Map(
    // deterministic fake-modality fan-out (doc_id % 3) — the
    // mm_payload_stats convention rolled to (source, media_type)
    "mm_modality_mix" ->
      """WITH m AS (SELECT source,
        |                  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |                       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |                  octet_length(encode(text)) AS n_bytes
        |           FROM documents),
        |cells AS (SELECT source, media_type, count(*) AS n_assets,
        |                 CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        |          FROM m GROUP BY 1, 2),
        |tot AS (SELECT source, sum(n_assets) AS n_src FROM cells GROUP BY 1)
        |SELECT c.source, c.media_type, c.n_assets, c.total_bytes,
        |       round(CAST(c.n_assets AS DOUBLE) / t.n_src, 6) AS share
        |FROM cells c JOIN tot t USING (source) ORDER BY 1, 2""".stripMargin,
    // per-modality median/MAD size outliers over the fake-media meta
    "mm_size_outliers" ->
      """WITH m AS (SELECT doc_id,
        |                  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |                       WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |                  octet_length(encode(text)) AS n_bytes
        |           FROM documents),
        |med AS (SELECT media_type, quantile_cont(n_bytes, 0.5) AS med_b FROM m GROUP BY 1),
        |mad AS (SELECT m.media_type, quantile_cont(abs(n_bytes - med_b), 0.5) AS mad_b
        |        FROM m JOIN med USING (media_type) GROUP BY 1)
        |SELECT m.media_type, doc_id, CAST(n_bytes AS INTEGER) AS n_bytes,
        |       round(med_b, 4) AS med_bytes,
        |       round(abs(n_bytes - med_b) / (1.4826 * mad_b), 4) AS robust_score
        |FROM m JOIN med USING (media_type) JOIN mad USING (media_type)
        |WHERE mad_b > 0 AND abs(n_bytes - med_b) > 1.5 * 1.4826 * mad_b
        |ORDER BY media_type, doc_id""".stripMargin,
    // every 16th byte of the video payload (ascii(substr) — text is
    // ASCII at generation) → per-doc byte-distribution entropy (nats)
    "mm_frame_entropy" ->
      """WITH fr AS (
        |  SELECT doc_id, CAST(len(frames) AS INTEGER) AS n_frames, unnest(frames) AS b
        |  FROM (
        |    SELECT doc_id,
        |           list_transform(range(1, length(text)+1, 16),
        |                          i -> ascii(substr(text, CAST(i AS INTEGER), 1))) AS frames
        |    FROM documents WHERE doc_id % 3 = 2)),
        |c AS (SELECT doc_id, n_frames, b, count(*) AS c FROM fr GROUP BY 1, 2, 3)
        |SELECT doc_id, n_frames,
        |       round(-sum((CAST(c AS DOUBLE) / n_frames) * ln(CAST(c AS DOUBLE) / n_frames)), 6)
        |         AS entropy
        |FROM c GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,
    "mm_payload_stats" ->
      """SELECT doc_id,
        |       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |            WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_payload_dedup" ->
      """SELECT media_type, md5(text) AS digest, min(doc_id) AS keep_id,
        |       count(*) AS n_copies FROM (
        |  SELECT doc_id, text,
        |         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |              WHEN 1 THEN 'audio' ELSE 'video' END AS media_type
        |  FROM documents) t
        |GROUP BY 1, 2 ORDER BY media_type, keep_id""".stripMargin,
    // decode stub: md5 the payload (UTF-8 text bytes ⇒ md5(text)),
    // carve width/height/frames out of 6-hex-char chunks — exactly
    // Multimodal.decodeStub.
    "mm_decode_features" ->
      """SELECT doc_id,
        |       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |            WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |       CAST(64 + CAST(concat('0x', substr(md5(text),1,6)) AS BIGINT) % 1024 AS INTEGER) AS width,
        |       CAST(64 + CAST(concat('0x', substr(md5(text),7,6)) AS BIGINT) % 1024 AS INTEGER) AS height,
        |       CAST(CASE WHEN doc_id % 3 = 2
        |            THEN 1 + CAST(concat('0x', substr(md5(text),13,6)) AS BIGINT) % 300
        |            ELSE 1 END AS INTEGER) AS n_frames,
        |       md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // frame sampling: every 16th byte of the UTF-8 payload; documents
    // text is ASCII (verified at generation), so byte i == char i and
    // ascii(substr(...)) reproduces the byte values.
    "mm_sample_frames" ->
      """SELECT doc_id, CAST(len(frames) AS INTEGER) AS n_frames,
        |       md5(array_to_string(frames, ',')) AS frames_md5
        |FROM (
        |  SELECT doc_id,
        |         list_transform(range(1, length(text)+1, 16),
        |                        i -> ascii(substr(text, CAST(i AS INTEGER), 1))) AS frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY doc_id""".stripMargin,
    // content-addressed shards: same md5-hex-prefix arithmetic as
    // text_hash_sample; text is ASCII so octet_length == payload bytes
    "mm_shard_manifest" ->
      """WITH m AS (SELECT CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 16
        |                    AS shard_id,
        |                  CASE CAST(doc_id % 3 AS INTEGER)
        |                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |                    ELSE 'video' END AS media_type,
        |                  octet_length(encode(text)) AS n_bytes
        |           FROM documents)
        |SELECT shard_id, count(*) AS n_assets,
        |       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |       CAST(sum(CASE WHEN media_type = 'image' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_image,
        |       CAST(sum(CASE WHEN media_type = 'audio' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_audio,
        |       CAST(sum(CASE WHEN media_type = 'video' THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_video
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    // full-outer coverage + Pearson r of (n_chars, l2 norm) via raw sums
    "mm_text_embedding_align" ->
      """WITH d AS (SELECT doc_id AS id, n_chars FROM documents),
        |e AS (SELECT vec_id AS id,
        |             round(sqrt(list_sum(list_transform(
        |               CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm
        |      FROM embeddings),
        |j AS (SELECT coalesce(d.id, e.id) AS id, n_chars, l2_norm
        |      FROM d FULL OUTER JOIN e ON d.id = e.id),
        |mm AS (SELECT CAST(n_chars AS DOUBLE) AS x, l2_norm AS y FROM j
        |       WHERE n_chars IS NOT NULL AND l2_norm IS NOT NULL),
        |s AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
        |             sum(x * y) AS sxy, sum(x * x) AS sx2, sum(y * y) AS sy2,
        |             count(CASE WHEN y = 0.0 THEN 1 END) AS n_zero_norm FROM mm),
        |c AS (SELECT
        |  count(CASE WHEN n_chars IS NOT NULL AND l2_norm IS NOT NULL THEN 1 END)
        |    AS n_matched,
        |  count(CASE WHEN l2_norm IS NULL THEN 1 END) AS n_text_only,
        |  count(CASE WHEN n_chars IS NULL THEN 1 END) AS n_vector_only FROM j)
        |SELECT n_matched, n_text_only, n_vector_only, n_zero_norm,
        |       CASE WHEN m * sx2 - sx * sx > 0 AND m * sy2 - sy * sy > 0 THEN
        |         round((m * sxy - sx * sy) /
        |               sqrt((m * sx2 - sx * sx) * (m * sy2 - sy * sy)), 6)
        |       END AS len_norm_corr
        |FROM c, s""".stripMargin,
  )
}
