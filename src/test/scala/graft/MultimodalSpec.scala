package graft

import graft.operators.{MediaRow, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal-column plumbing: typed binary payloads through the batched
  * mapPartitions decode path (decoder itself is the documented stub). */
class MultimodalSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("toMedia wraps every document with payload bytes and typed metadata") {
    val media = Multimodal.toMedia(Tables.documents(spark, sf))
    val rows = media.collect()
    assert(rows.length === 500)
    val r = rows.minBy(_.doc_id)
    assert(r.payload.nonEmpty)
    assert(Set("image/png", "audio/wav", "video/mp4").contains(r.mime))
    assert(r.meta.keySet === Set("source", "lang"))
  }

  test("decodeFeatures is distributed, total, and deterministic") {
    val media = Multimodal.toMedia(Tables.documents(spark, sf))
    val feats1 = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    val feats2 = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(feats1.length === 500)
    assert(feats1.toSeq === feats2.toSeq) // stub decode is pure
    // payload bytes survived intact: n_bytes equals the ascii text length
    val nchars = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    feats1.foreach(f => assert(f.n_bytes.toLong === nchars(f.doc_id)))
  }

  test("modalities fan out by doc_id and get modality-specific features") {
    val feats = Multimodal.decodeFeatures(
      Multimodal.toMedia(Tables.documents(spark, sf))).collect()
    feats.foreach { f =>
      f.mime match {
        case "image/png" => assert(f.doc_id % 3 === 0 && f.width > 0 && f.n_frames === 1)
        case "audio/wav" => assert(f.doc_id % 3 === 1 && f.width === 0 && f.n_frames > 0)
        case "video/mp4" => assert(f.doc_id % 3 === 2 && f.width > 0 && f.n_frames > 0)
      }
    }
  }

  test("decode batch shape: partition iterators consumed in fixed-size batches") {
    import spark.implicits._
    // 130 rows in one partition → batches of 64,64,2; all rows must survive
    val rows = (0L until 130L).map(i =>
      MediaRow(i, s"payload-$i".getBytes("UTF-8"), "image/png", Map.empty))
    val ds = spark.createDataset(rows).repartition(1)
    val out = Multimodal.decodeFeatures(ds).collect()
    assert(out.length === 130)
    assert(out.map(_.doc_id).toSet === (0L until 130L).toSet)
  }
}
