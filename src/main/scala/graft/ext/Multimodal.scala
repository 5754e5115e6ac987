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
  def frames(media: DataFrame, n: Int): DataFrame = {
    require(n > 0, "frame count must be positive")
    media
      // long BEFORE the multiply: frame_idx * len in int32 overflows at
      // ~2 GiB/n payloads (ANSI crash, or negative offsets with ANSI off)
      .withColumn("_len", octet_length(col("payload")).cast("long"))
      .select(col("media_id"), col("_len"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"))
      .withColumn("_start", (col("frame_idx") * col("_len") / n).cast("long") + 1)
      .withColumn("_end", ((col("frame_idx") + 1) * col("_len") / n).cast("long"))
      .withColumn("frame_len", (col("_end") - col("_start") + 1).cast("long"))
      .select(col("media_id"), col("frame_idx"), col("frame_len"))
  }

  /** Frame-sample carrying the sliced bytes and their digest (kept
    * separate from [[frames]] so metadata-only consumers never touch
    * payload bytes). */
  def framesWithBytes(media: DataFrame, n: Int): DataFrame = {
    require(n > 0, "frame count must be positive")
    media
      .withColumn("_len", octet_length(col("payload")).cast("long"))
      .select(col("media_id"), col("payload"), col("_len"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"))
      .withColumn("_start", (col("frame_idx") * col("_len") / n).cast("long") + 1)
      .withColumn("_end", ((col("frame_idx") + 1) * col("_len") / n).cast("long"))
      .withColumn("frame", expr(
        "substring(payload, cast(_start as int), cast(_end - _start + 1 as int))"))
      .select(col("media_id"), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))
  }

  /** "Resize" stub for fixed-rate media: keep bytes 0, stride, 2*stride,
    * ... — the downsampling access pattern without a codec. A typed
    * partition-local kernel: the per-byte expression form (array of
    * single-byte slices + incremental concat) copies the accumulator per
    * step — O(bytes^2 / stride) movement per row, unusable at media
    * sizes. */
  def downsample(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    val sp = media.sparkSession
    import sp.implicits._
    media.select(col("media_id").cast("long"), col("kind"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, payload) =>
        val small = new Array[Byte]((payload.length + stride - 1) / stride)
        var i = 0
        while (i < small.length) { small(i) = payload(i * stride); i += 1 }
        (id, kind, payload.length.toLong, small)
      })
      .toDF("media_id", "kind", "n_bytes", "payload_small")
      .select(col("media_id"), col("kind"), col("n_bytes"),
        octet_length(col("payload_small")).cast("long").as("n_bytes_small"),
        md5(col("payload_small")).as("small_md5"))
  }
}
