package graft

import graft.ext.{MediaRecord, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing (SURVEY §7.5): pack, decode stub,
  * frame sampling, downsampling. The decode innards are a documented
  * deterministic stub; what these tests pin is the Spark-side contract —
  * schema, byte math, partition-local execution. */
class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  private def media = {
    val s = spark
    import s.implicits._
    Multimodal.packDocuments(
      Seq((1L, "abcdefgh"), (2L, "0123456789ab")).toDF("doc_id", "text"),
      "doc_id", "text")
  }

  test("packDocuments produces binary payload + kind metadata") {
    val r = media.orderBy(col("media_id")).head()
    assert(r.getAs[String]("kind") == "text/plain")
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "abcdefgh")
  }

  test("decodeFeatures: stub dims and rolling-byte checksum") {
    val s = spark
    import s.implicits._
    val f = Multimodal.decodeFeatures(media.as[MediaRecord])
      .collect().map(x => x.media_id -> x).toMap
    assert(f(1L).n_bytes == 8)
    assert(f(1L).width == 16 + 8 % 640 && f(1L).height == 16 + 8 % 480)
    val expected = "abcdefgh".getBytes("UTF-8")
      .foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    assert(f(1L).checksum == expected)
  }

  test("frames partition the payload exactly, in order") {
    val f = Multimodal.framesWithBytes(media, 4)
      .filter(col("media_id") === 2).orderBy(col("frame_idx")).collect()
    assert(f.map(_.getAs[Long]("frame_len")).toSeq == Seq(3L, 3L, 3L, 3L))
    // frame md5s must equal the md5 of the corresponding text slices
    val s = spark
    import s.implicits._
    val exp = Seq("012", "345", "678", "9ab").toDF("t")
      .select(md5(encode(col("t"), "UTF-8"))).collect().map(_.getString(0))
    assert(f.map(_.getAs[String]("frame_md5")).toSeq == exp.toSeq)
  }

  test("frames cover uneven lengths without gaps or overlap") {
    val s = spark
    import s.implicits._
    val odd = Multimodal.packDocuments(
      Seq((9L, "abcdefghijk")).toDF("doc_id", "text"), "doc_id", "text")
    val lens = Multimodal.frames(odd, 4).orderBy(col("frame_idx"))
      .collect().map(_.getAs[Long]("frame_len"))
    assert(lens.sum == 11L)
    assert(lens.forall(l => l == 2L || l == 3L))
  }

  test("downsample keeps every stride-th byte") {
    val out = Multimodal.downsample(media, 2)
      .filter(col("media_id") === 1).head()
    assert(out.getAs[Long]("n_bytes") == 8L)
    assert(out.getAs[Long]("n_bytes_small") == 4L) // a, c, e, g
  }
}
