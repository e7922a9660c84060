package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media payload row: opaque bytes + typed metadata — the multimodal
  * column pattern (binary payload, mime tag, string-map metadata). */
final case class MediaRow(
    doc_id: Long,
    payload: Array[Byte],
    mime: String,
    meta: Map[String, String])

/** Features the (stubbed) decoder extracts per payload. */
final case class MediaFeatures(
    doc_id: Long,
    mime: String,
    n_bytes: Int,
    checksum: Long,
    width: Int,
    height: Int,
    n_frames: Int)

/** Multimodal-column plumbing (builder prompt: image/audio/video as
  * opaque binary + typed metadata; decode behind a stub).
  *
  * The real decode step would link an image/audio codec, which this
  * container does not ship — [[Multimodal.fakeDecode]] is the
  * clearly-marked deterministic STUB standing in for it. What IS real
  * and tested is everything Spark-side: the binary+metadata schema, the
  * typed `Dataset[MediaRow]` encoding, and the batched `mapPartitions`
  * execution shape (fixed-size batches, exactly how a vectorized decode
  * UDF consumes record batches). At 100 TB the payloads stay in
  * executors end-to-end: no collect, no shuffle — a pure map stage whose
  * parallelism is the scan's.
  */
object Multimodal {

  /** Batch size for the decoder loop — the record-batch shape a
    * vectorized UDF would see. */
  val DecodeBatchSize = 64

  /** Wrap documents as media rows: payload = utf-8 bytes (deterministic
    * stand-in for real media bytes), mime fanned out over three
    * modalities by doc_id, metadata as a typed map. */
  def toMedia(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    documents.selectExpr(
      "doc_id",
      "CAST(text AS BINARY) AS payload",
      "CASE WHEN doc_id % 3 = 0 THEN 'image/png' " +
        "WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime",
      "map('source', source, 'lang', lang) AS meta")
      .as[MediaRow]
  }

  /** STUB DECODER — deterministic fake. A real implementation would call
    * an image/audio library here (not available in this container); the
    * fake derives "decoded" dimensions from the payload bytes so tests
    * have stable expectations.
    */
  def fakeDecode(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    val checksum = bytes.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    val dim = (checksum % 1024).toInt + 1
    MediaFeatures(
      doc_id = row.doc_id,
      mime = row.mime,
      n_bytes = bytes.length,
      checksum = checksum,
      width = if (row.mime.startsWith("image") || row.mime.startsWith("video")) dim else 0,
      height = if (row.mime.startsWith("image") || row.mime.startsWith("video")) dim / 2 + 1 else 0,
      n_frames = if (row.mime.startsWith("video")) (checksum % 240).toInt + 1
                 else if (row.mime.startsWith("audio")) (checksum % 48000).toInt + 1
                 else 1)
  }

  /** Distributed decode: batched mapPartitions over the typed dataset —
    * the execution shape of a vectorized decode UDF (per-partition
    * iterator, fixed-size record batches, no driver involvement). */
  def decodeFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch => batch.map(fakeDecode) }
    }
  }

  /** Oracle-checkable slice of the plumbing: payload byte length, md5
    * digest and modality tag survive the binary round-trip identically
    * in both engines (md5 of the utf-8 bytes). */
  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_multimodal_meta",
      (s, d) => Tables.documents(s, d).selectExpr(
        "doc_id",
        "octet_length(CAST(text AS BINARY)) AS n_bytes",
        "md5(CAST(text AS BINARY)) AS digest",
        "CASE WHEN doc_id % 3 = 0 THEN 'image/png' " +
          "WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
             |  md5(text) AS digest,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
             |       WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
