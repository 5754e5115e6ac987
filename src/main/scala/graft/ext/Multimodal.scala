package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media record: opaque binary payload + typed metadata. The payload
  * is never interpreted by Spark itself — only by the (stubbed) decode
  * step — so the column travels through shuffles/scans as plain bytes. */
case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

/** Output of the decode/feature-extract stub. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
    width: Int, height: Int, checksum: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * Extension scope (SURVEY.md §7.5). The container ships no image/audio
  * codecs, so [[decodeFeatures]] is a clearly-marked DETERMINISTIC STUB:
  * the Spark-side plumbing — schema, binary column handling, partition-
  * local batched processing via `mapPartitions`, frame slicing — is real
  * and tested; only the innermost "decode bytes with a codec" call is
  * fake. Swap [[decodeStub]] for a real codec to productionize.
  *
  * Scale notes (100 TB): payloads stay columnar (Parquet binary),
  * metadata predicates push down without touching payload bytes, decode
  * is partition-local (no shuffle), and frame sampling is pure
  * per-row expression work.
  */
object Multimodal {

  /** Pack a text corpus into media records — a stand-in acquisition step
    * (payload = UTF-8 bytes) exercising the binary-column path end to
    * end with real data. */
  def packDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("media_id"),
      lit("text/plain").as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decode: a real implementation would hand `payload` to a codec
    * (JPEG/PNG/FLAC/...) here. This deterministic fake derives "decoded"
    * dimensions and a checksum from the bytes alone so tests are stable
    * offline. The `mapPartitions` shape — batched, partition-local, no
    * driver involvement — is exactly what a codec-backed version needs. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length
    var acc = 0L
    var i = 0
    while (i < n) { // byte-wise rolling hash; replace with codec output
      acc = (acc * 31 + (r.payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    MediaFeatures(r.media_id, r.kind, n, 16 + n % 640, 16 + n % 480, acc)
  }

  /** Decode / feature-extract over the corpus: partition-local batches,
    * codec boundary isolated in [[decodeStub]]. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Frame-sample: split each payload into `n` contiguous byte-range
    * "frames" (frame i covers bytes (i·len/n, (i+1)·len/n]) and emit
    * per-frame length + md5 — the shape of a video frame-sampler, as
    * pure expressions (no UDF). */
  def frames(media: DataFrame, n: Int): DataFrame =
    media
      .withColumn("_len", octet_length(col("payload")))
      .select(col("media_id"), col("_len"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"))
      .withColumn("_start", (col("frame_idx") * col("_len") / n).cast("long") + 1)
      .withColumn("_end", ((col("frame_idx") + 1) * col("_len") / n).cast("long"))
      .withColumn("frame_len", (col("_end") - col("_start") + 1).cast("long"))
      .select(col("media_id"), col("frame_idx"), col("frame_len"))

  /** Frame-sample carrying the sliced bytes and their digest (kept
    * separate from [[frames]] so metadata-only consumers never touch
    * payload bytes). */
  def framesWithBytes(media: DataFrame, n: Int): DataFrame =
    media
      .withColumn("_len", octet_length(col("payload")))
      .select(col("media_id"), col("payload"), col("_len"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"))
      .withColumn("_start", (col("frame_idx") * col("_len") / n).cast("long") + 1)
      .withColumn("_end", ((col("frame_idx") + 1) * col("_len") / n).cast("long"))
      .withColumn("frame", expr(
        "substring(payload, cast(_start as int), cast(_end - _start + 1 as int))"))
      .select(col("media_id"), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))

  /** "Resize" stub for fixed-rate media: keep every `stride`-th byte —
    * the downsampling access pattern (gather over the payload) without a
    * codec. Deterministic, expression-only. */
  def downsample(media: DataFrame, stride: Int): DataFrame =
    media.withColumn("payload_small",
      expr(s"filter(transform(sequence(1, octet_length(payload)), " +
        s"i -> IF(i % $stride = 1, substring(payload, i, 1), null)), " +
        "x -> x is not null)"))
      .withColumn("payload_small",
        expr("aggregate(payload_small, cast('' as binary), (a, x) -> concat(a, x))"))
      .select(col("media_id"), col("kind"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        octet_length(col("payload_small")).cast("long").as("n_bytes_small"),
        md5(col("payload_small")).as("small_md5"))
}
