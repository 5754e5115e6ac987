package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media record: opaque binary payload + typed metadata. The payload
  * is never interpreted by Spark itself — only by the decode step — so
  * the column travels through shuffles/scans as plain bytes. */
case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

/** Decoded binary-PPM (P6) image features: header fields as parsed from
  * the file bytes + payload statistics. */
case class PpmFeatures(media_id: Long, width: Int, height: Int,
    maxval: Int, n_pixels: Long, mean_px: Double, checksum: Long)

/** Decoded RIFF/WAVE (PCM) audio features: fmt-chunk fields as parsed
  * from the file bytes + data-chunk statistics. */
case class WavFeatures(media_id: Long, channels: Int, sample_rate: Int,
    bits_per_sample: Int, n_samples: Long, mean_amp: Double, checksum: Long)

case class WavTone(media_id: Long, n_samples: Long, re_q4: Long,
    im_q4: Long)

case class PpmGradient(media_id: Long, width: Long, height: Long,
    grad_energy: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * Extension scope (SURVEY.md §7.5). The container ships no codec
  * LIBRARIES, so the decoders target two public formats whose byte
  * layout needs none: binary PPM (P6 — the netpbm image format:
  * ASCII header, raw RGB payload) and RIFF/WAVE PCM (chunked header,
  * raw sample payload). [[decodePpm]]/[[decodeWav]] are REAL parsers —
  * magic check, whitespace/comment-tolerant header scan (PPM), chunk
  * walk with word-alignment padding (WAV) — not stubs; swapping in
  * JPEG/FLAC means replacing only the per-record parse function.
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

  /** Pack each document's UTF-8 bytes into a VALID binary-PPM (P6)
    * image: `width` px wide, as many full rows as the bytes fill
    * (documents shorter than one row are dropped — a PPM needs ≥ 1 row),
    * surplus bytes truncated. Pure expression work — header via
    * `format_string`, payload via binary substr/concat; no UDF. */
  def packPpm(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 16): DataFrame = {
    require(width > 0, "width must be positive")
    val bytes = encode(col(textCol).cast("string"), "UTF-8")
    val h = (octet_length(bytes) / (3 * width)).cast("int")
    docs
      .withColumn("__graft_h", h)
      .filter(col("__graft_h") >= 1)
      .select(col(idCol).cast("long").as("media_id"),
        lit("image/ppm").as("kind"),
        concat(
          encode(format_string(s"P6\n$width %d\n255\n", col("__graft_h")),
            "UTF-8"),
          bytes.substr(lit(1), col("__graft_h") * lit(3 * width)))
          .as("payload"))
  }

  /** 4-byte little-endian encoding of a non-negative int column, as
    * pure expressions: hex → zero-pad → unhex gives the big-endian
    * bytes, byte-wise substring concat reverses them. */
  private def le32(x: Column): Column = {
    val be = unhex(lpad(hex(x.cast("long")), 8, "0"))
    concat(substring(be, 4, 1), substring(be, 3, 1),
      substring(be, 2, 1), substring(be, 1, 1))
  }

  /** Pack each document's UTF-8 bytes into a VALID RIFF/WAVE file:
    * 8-bit mono PCM at `sampleRate`, one sample per byte. The fixed
    * header parts are driver-side constant bytes; only the two size
    * fields vary per row ([[le32]] expressions). Empty documents are
    * dropped (a zero-sample WAV has an empty data chunk). */
  def packWav(docs: DataFrame, idCol: String, textCol: String,
      sampleRate: Int = 8000): DataFrame = {
    require(sampleRate > 0, "sampleRate must be positive")
    def leConst(v: Long, w: Int): Array[Byte] =
      Array.tabulate(w)(i => ((v >> (8 * i)) & 0xff).toByte)
    // "WAVE" + the complete fmt chunk (PCM=1, mono, 8-bit ⇒ byteRate =
    // sampleRate, blockAlign = 1); everything here is row-independent
    val waveFmt: Array[Byte] =
      "WAVEfmt ".getBytes("US-ASCII") ++ leConst(16, 4) ++ leConst(1, 2) ++
        leConst(1, 2) ++ leConst(sampleRate, 4) ++ leConst(sampleRate, 4) ++
        leConst(1, 2) ++ leConst(8, 2)
    val data = encode(col(textCol).cast("string"), "UTF-8")
    val n = octet_length(data).cast("long")
    docs
      .filter(octet_length(data) > 0)
      .select(col(idCol).cast("long").as("media_id"),
        lit("audio/wav").as("kind"),
        concat(lit("RIFF".getBytes("US-ASCII")), le32(n + 36),
          lit(waveFmt), lit("data".getBytes("US-ASCII")), le32(n), data)
          .as("payload"))
  }

  /** Real binary-PPM (P6) parse of one record: magic check, whitespace-
    * and-`#`-comment-tolerant ASCII header scan for width/height/maxval,
    * then payload statistics (mean over all RGB bytes + the rolling-31
    * checksum) over exactly width×height×3 bytes. Malformed input fails
    * loudly with the record id. */
  /** Header scan shared by [[parsePpm]] and [[ppmResize]]: P6 magic,
    * whitespace-and-comment-tolerant width/height/maxval, then the
    * single terminator byte. Returns (width, height, maxval,
    * payloadOffset); malformed input fails loudly with the id. */
  private def scanPpmHeader(mediaId: Long,
      b: Array[Byte]): (Int, Int, Int, Int) = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"media $mediaId: $msg")
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') fail("not a P6 PPM")
    var i = 2
    def isWs(c: Byte): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r'
    def skipWsAndComments(): Unit = {
      var done = false
      while (!done && i < b.length) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (isWs(b(i))) i += 1
        else done = true
      }
    }
    def readInt(what: String): Int = {
      skipWsAndComments()
      if (i >= b.length || b(i) < '0' || b(i) > '9') fail(s"bad $what")
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val w = readInt("width")
    val h = readInt("height")
    val maxval = readInt("maxval")
    // exactly ONE whitespace byte separates the header from the payload
    if (i >= b.length || !isWs(b(i))) fail("missing header terminator")
    i += 1
    if (b.length - i < w.toLong * h * 3)
      fail(s"payload truncated: need ${w.toLong * h * 3} bytes")
    (w, h, maxval, i)
  }

  private[graft] def parsePpm(r: MediaRecord): PpmFeatures = {
    val b = r.payload
    val (w, h, maxval, i) = scanPpmHeader(r.media_id, b)
    val n = w.toLong * h * 3
    var sum = 0L
    var acc = 0L
    var j = i
    val end = i + n.toInt
    while (j < end) {
      val u = b(j) & 0xff
      sum += u
      acc = (acc * 31 + u) % 1000000007L
      j += 1
    }
    PpmFeatures(r.media_id, w, h, maxval, w.toLong * h,
      sum.toDouble / n, acc)
  }

  /** Real RIFF/WAVE parse of one record: RIFF/WAVE magic, then the
    * chunk walk (id + LE32 size, word-aligned — odd-sized chunks carry
    * a pad byte) collecting the fmt fields and the data-chunk
    * statistics. Only uncompressed 8-bit PCM payload stats are
    * computed (one sample per byte); other bit depths parse their
    * header but fail loudly at the stats step rather than mis-reading
    * sample boundaries. */
  /** RIFF chunk walk shared by [[parseWav]] and [[wavDecimate]]:
    * magic, fmt fields, data-chunk location — with the same overrun /
    * ordering / PCM checks. Returns (channels, rate, bits, dataOffset,
    * dataSize). */
  private def scanWavChunks(mediaId: Long,
      b: Array[Byte]): (Int, Int, Int, Int, Int) = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"media $mediaId: $msg")
    def ascii(off: Int, len: Int) = new String(b, off, len, "US-ASCII")
    def le16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def le32at(off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    if (b.length < 12 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE")
      fail("not a RIFF/WAVE file")
    var channels = -1
    var rate = -1
    var bits = -1
    var dataOff = -1
    var dataSize = -1
    var i = 12
    while (i + 8 <= b.length) {
      val id = ascii(i, 4)
      val size = le32at(i + 4)
      val body = i + 8
      if (body + size > b.length) fail(s"chunk $id overruns payload")
      if (id == "fmt ") {
        if (size < 16) fail("fmt chunk too short")
        if (le16(body) != 1) fail("not uncompressed PCM")
        channels = le16(body + 2)
        rate = le32at(body + 4).toInt
        bits = le16(body + 14)
      } else if (id == "data") {
        if (channels < 0) fail("data chunk before fmt")
        if (bits != 8) fail(s"unsupported bit depth $bits")
        dataOff = body
        dataSize = size.toInt
      }
      i = body + size.toInt + (size.toInt & 1) // word alignment pad
    }
    if (channels < 0) fail("no fmt chunk")
    if (dataOff < 0) fail("no data chunk")
    (channels, rate, bits, dataOff, dataSize)
  }

  private[graft] def parseWav(r: MediaRecord): WavFeatures = {
    val b = r.payload
    val (channels, rate, bits, dataOff, dataSize) =
      scanWavChunks(r.media_id, b)
    val nSamples = dataSize.toLong / channels
    var sum = 0L
    var acc = 0L
    var j = dataOff
    val end = dataOff + dataSize
    while (j < end) {
      val u = b(j) & 0xff
      sum += u
      acc = (acc * 31 + u) % 1000000007L
      j += 1
    }
    WavFeatures(r.media_id, channels, rate, bits, nSamples,
      if (nSamples == 0) 0d else sum.toDouble / (nSamples * channels), acc)
  }

  /** Decode / feature-extract PPM images over the corpus:
    * partition-local batches, no shuffle, no driver involvement. */
  def decodePpm(media: Dataset[MediaRecord]): Dataset[PpmFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(parsePpm))
  }

  /** Decode / feature-extract WAV audio over the corpus — same
    * partition-local shape as [[decodePpm]]. */
  def decodeWav(media: Dataset[MediaRecord]): Dataset[WavFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(parseWav))
  }

  /** Sobel gradient energy over REAL decoded PPM pixels — the image
    * DSP feature next to [[wavTone]]'s audio one: per interior pixel,
    * the 3×3 Sobel |gx| + |gy| over integer luminance (r + g + b,
    * undivided), summed per image. Pure integer arithmetic end to
    * end — nothing to quantize, nothing engine-dependent. The feature
    * a curation pipeline thresholds to drop flat/synthetic images
    * (near-zero energy) or noise (extreme energy).
    *
    * Same scale shape as [[decodePpm]]: partition-local typed kernel
    * over the payload bytes, no shuffle. Images with fewer than 3 rows
    * have no interior and score 0. */
  def ppmGradient(media: Dataset[MediaRecord]): Dataset[PpmGradient] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val b = r.payload
      val (w, h, _, off) = scanPpmHeader(r.media_id, b)
      def lum(x: Int, y: Int): Long = {
        val p = off + (y * w + x) * 3
        ((b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)).toLong
      }
      var e = 0L
      var y = 1
      while (y < h - 1) {
        var x = 1
        while (x < w - 1) {
          val gx = (lum(x + 1, y - 1) + 2 * lum(x + 1, y) +
            lum(x + 1, y + 1)) -
            (lum(x - 1, y - 1) + 2 * lum(x - 1, y) + lum(x - 1, y + 1))
          val gy = (lum(x - 1, y + 1) + 2 * lum(x, y + 1) +
            lum(x + 1, y + 1)) -
            (lum(x - 1, y - 1) + 2 * lum(x, y - 1) + lum(x + 1, y - 1))
          e += math.abs(gx) + math.abs(gy)
          x += 1
        }
        y += 1
      }
      PpmGradient(r.media_id, w.toLong, h.toLong, e)
    })
  }

  /** Away-from-zero 1e-4 quantizer — the SQL `round(x)::BIGINT`
    * contract on `1e4·x` (DuckDB rounds half AWAY from zero;
    * `Math.round` rounds half toward +∞ and would disagree on
    * negative twiddles). */
  private def q4(x: Double): Long =
    if (x >= 0) math.floor(x * 1e4 + 0.5).toLong
    else -math.floor(-x * 1e4 + 0.5).toLong

  /** Single-bin integer DFT over the decoded WAV payload — the tone
    * probe (Goertzel's use case as the direct correlation form):
    * `re = Σ x_i·round(1e4·cos(2π·cycles·i/N))` and the sine twin, an
    * audio FEATURE computed from real sample bytes rather than header
    * metadata. Twiddles quantize to 1e-4 integers BEFORE the sums, so
    * the accumulators are exact longs and sub-ULP `cos`/`sin`
    * disagreement between engines dies at the grid (the log2/ln
    * discipline applied to trigonometry). |re| ≤ 255·1e4·N keeps the
    * sum in long range past N = 3·10¹².
    *
    * Same scale shape as [[decodeWav]]: partition-local typed kernel,
    * no shuffle, no driver involvement. */
  def wavTone(media: Dataset[MediaRecord], cycles: Int = 8)
      : Dataset[WavTone] = {
    require(cycles >= 1, "cycles must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (channels, _, _, dataOff, dataSize) =
        scanWavChunks(r.media_id, r.payload)
      val n = dataSize / channels
      val nD = n.toDouble
      var re = 0L
      var im = 0L
      var i = 0
      while (i < n) {
        val u = (r.payload(dataOff + i) & 0xff).toLong
        // mirror the oracle's chain: ((2·π)·cycles)·i / n
        val ang = 2.0 * math.Pi * cycles.toDouble * i.toDouble / nD
        re += u * q4(math.cos(ang))
        im += u * q4(math.sin(ang))
        i += 1
      }
      WavTone(r.media_id, n.toLong, re, im)
    })
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

  /** REAL 2-D image downscale: nearest-neighbor by integer `factor` —
    * output pixel (x, y) is input pixel (x·f, y·f) — re-encoded as a
    * VALID P6 (new dims in the header, same maxval), so the output of
    * the resize step feeds anything that reads PPM, including
    * [[decodePpm]] (decode → transform → re-encode, closed loop).
    * Images smaller than one output pixel drop. Partition-local typed
    * kernel like the decoders: no shuffle, payload bytes touched once.
    * Emits small dims + exact byte sum + md5 of the re-encoded file
    * (header included), so an oracle can rebuild the identical small
    * file from source bytes and hash it. */
  def ppmResize(media: Dataset[MediaRecord], factor: Int): DataFrame = {
    require(factor >= 1, "resize factor must be >= 1")
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions(_.flatMap { r =>
      val b = r.payload
      val (w, h, maxval, off) = scanPpmHeader(r.media_id, b)
      val (w2, h2) = (w / factor, h / factor)
      if (w2 < 1 || h2 < 1) None
      else {
        val header = s"P6\n$w2 $h2\n$maxval\n".getBytes("US-ASCII")
        val out = new Array[Byte](header.length + w2 * h2 * 3)
        System.arraycopy(header, 0, out, 0, header.length)
        var sum = 0L
        var k = header.length
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) {
            val src = off + 3 * (y * factor * w + x * factor)
            var c = 0
            while (c < 3) {
              out(k) = b(src + c)
              sum += b(src + c) & 0xff
              k += 1; c += 1
            }
            x += 1
          }
          y += 1
        }
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(out).map(x => f"$x%02x").mkString
        Some((r.media_id, w2, h2, (w2 * h2 * 3).toLong, sum, hex))
      }
    }).toDF("media_id", "small_w", "small_h", "n_bytes_small",
      "sum_small", "small_md5")
  }

  /** Perceptual average-hash (aHash) of a P6 image — the classic
    * image-near-dup fingerprint: box-average the grayscale image onto
    * an 8×8 grid, threshold each cell against the integer mean of the
    * 64 cell averages (strict >), pack row-major into 64 bits. Near-
    * identical images (re-encodes, minor noise) land within a few
    * Hamming bits; pair them with [[Dedup.hammingDupPairs]].
    *
    * All-integer arithmetic — per-pixel gray `(r+g+b)/3`, per-cell
    * `sum/npx`, grid mean `Σ/64`, every division a floor — so the hash
    * is a pure function of the pixel bytes, engine-replayable (the
    * oracle recomputes it from the same bytes in SQL). Images smaller
    * than 8×8 are dropped. Partition-local typed kernel like
    * [[ppmResize]]: narrow, zero shuffles, bytes touched once. */
  def ppmAHash(media: Dataset[MediaRecord]): DataFrame = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions(_.flatMap { r =>
      val b = r.payload
      val (w, h, _, off) = scanPpmHeader(r.media_id, b)
      if (w < 8 || h < 8) None
      else {
        val ca = new Array[Long](64)
        var ci = 0
        while (ci < 8) {
          val (y0, y1) = (ci * h / 8, (ci + 1) * h / 8)
          var cj = 0
          while (cj < 8) {
            val (x0, x1) = (cj * w / 8, (cj + 1) * w / 8)
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val p = off + 3 * (y * w + x)
                sum += ((b(p) & 0xff) + (b(p + 1) & 0xff) +
                  (b(p + 2) & 0xff)) / 3
                x += 1
              }
              y += 1
            }
            ca(ci * 8 + cj) = sum / ((y1 - y0).toLong * (x1 - x0))
            cj += 1
          }
          ci += 1
        }
        val m = ca.sum / 64
        var hash = 0L
        var i = 0
        while (i < 64) { if (ca(i) > m) hash |= (1L << i); i += 1 }
        Some((r.media_id, hash))
      }
    }).toDF("media_id", "ahash")
  }

  /** Perceptual average-hash of an 8-bit mono PCM WAV — [[ppmAHash]]'s
    * audio sibling: the sample stream splits into 64 equal-count
    * segments (integer-boundary, `[s·n/64, (s+1)·n/64)`), each
    * segment's floor-mean amplitude thresholds against the floor-mean
    * of the 64 segment means (strict >), packed segment-major into 64
    * bits. Level-preserving re-encodes and small tail edits land
    * within a few Hamming bits — pair with [[Dedup.hammingDupPairs]],
    * exactly like the image form. All-integer arithmetic, pure
    * function of the data-chunk bytes, engine-replayable; streams
    * shorter than 64 samples drop. Partition-local typed kernel:
    * narrow, zero shuffles, sample bytes touched once. */
  def wavAHash(media: Dataset[MediaRecord]): DataFrame = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions(_.flatMap { r =>
      val b = r.payload
      val (channels, _, _, off, size) = scanWavChunks(r.media_id, b)
      if (channels != 1)
        throw new IllegalArgumentException(
          s"media ${r.media_id}: aHash supports mono, got $channels")
      if (size < 64) None
      else {
        val sm = new Array[Long](64)
        var s = 0
        while (s < 64) {
          val o0 = (s.toLong * size / 64).toInt
          val o1 = ((s + 1).toLong * size / 64).toInt
          var sum = 0L
          var i = o0
          while (i < o1) { sum += b(off + i) & 0xff; i += 1 }
          sm(s) = sum / (o1 - o0)
          s += 1
        }
        val gm = sm.sum / 64
        var hash = 0L
        var i = 0
        while (i < 64) { if (sm(i) > gm) hash |= (1L << i); i += 1 }
        Some((r.media_id, hash))
      }
    }).toDF("media_id", "ahash")
  }

  /** REAL audio decimation: keep every `factor`-th sample of an 8-bit
    * mono PCM stream and re-encode a VALID RIFF/WAVE whose fmt chunk
    * carries the divided sample rate — duration is preserved, the
    * output plays (and [[decodeWav]] parses it). Partition-local typed
    * kernel; data bytes touched once. Emits the new rate/sample count,
    * exact sample sum, the md5 of the DATA chunk, and the rebuilt file
    * bytes for downstream consumers. */
  def wavDecimate(media: Dataset[MediaRecord], factor: Int): DataFrame = {
    require(factor >= 1, "decimation factor must be >= 1")
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions(_.map { r =>
      val b = r.payload
      val (channels, rate, _, off, size) = scanWavChunks(r.media_id, b)
      if (channels != 1)
        throw new IllegalArgumentException(
          s"media ${r.media_id}: decimation supports mono, got $channels")
      val n2 = (size + factor - 1) / factor
      val rate2 = rate / factor
      def le(v: Long, w: Int): Array[Byte] =
        Array.tabulate(w)(i => ((v >> (8 * i)) & 0xff).toByte)
      val header = "RIFF".getBytes("US-ASCII") ++ le(n2 + 36L, 4) ++
        "WAVEfmt ".getBytes("US-ASCII") ++ le(16, 4) ++ le(1, 2) ++
        le(1, 2) ++ le(rate2, 4) ++ le(rate2, 4) ++ le(1, 2) ++
        le(8, 2) ++ "data".getBytes("US-ASCII") ++ le(n2, 4)
      val out = new Array[Byte](header.length + n2)
      System.arraycopy(header, 0, out, 0, header.length)
      var sum = 0L
      var i = 0
      while (i < n2) {
        val u = b(off + i * factor)
        out(header.length + i) = u
        sum += u & 0xff
        i += 1
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      val dataMd5 = md.digest(
        java.util.Arrays.copyOfRange(out, header.length, out.length))
        .map(x => f"$x%02x").mkString
      (r.media_id, rate2, n2.toLong, sum, dataMd5, out)
    }).toDF("media_id", "rate_small", "n_samples_small", "sum_small",
      "data_md5", "payload_small")
  }
}
