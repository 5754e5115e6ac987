package graft

import graft.ext.{MediaRecord, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing (SURVEY §7.5): pack, real PPM/WAV
  * decode, frame sampling, downsampling. The parser tests feed
  * hand-built byte arrays (comments, extra chunks, padding) that the
  * expression-built packers never produce, pinning that the decoders
  * actually read the header bytes rather than replaying the builder. */
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

  test("parsePpm reads dimensions from the header (with comments) and " +
      "stats from exactly width*height*3 payload bytes") {
    // hand-built P6: comment line + generous whitespace the packer
    // never emits; 2x1 px = 6 payload bytes, then 2 TRAILING junk
    // bytes the parser must ignore
    val px = Array[Byte](10, 20, 30, 40, 50, 60)
    val bytes = "P6\n# a comment\n 2\t1\n255\n".getBytes("US-ASCII") ++
      px ++ Array[Byte](99, 99)
    val f = Multimodal.parsePpm(MediaRecord(7L, "image/ppm", bytes))
    assert(f.width == 2 && f.height == 1 && f.maxval == 255)
    assert(f.n_pixels == 2L)
    assert(math.abs(f.mean_px - 35.0) < 1e-12)
    assert(f.checksum ==
      px.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L))
    // malformed inputs fail loudly, never return garbage
    intercept[IllegalArgumentException] {
      Multimodal.parsePpm(MediaRecord(8L, "x", "P5\n1 1\n255\n ".getBytes))
    }
    intercept[IllegalArgumentException] { // truncated payload
      Multimodal.parsePpm(MediaRecord(9L, "x", "P6\n2 2\n255\n".getBytes ++
        Array[Byte](1, 2, 3)))
    }
  }

  test("parseWav walks RIFF chunks (unknown chunk + odd-size padding) " +
      "and reads fmt fields from the bytes") {
    def le(v: Long, w: Int): Array[Byte] =
      Array.tabulate(w)(i => ((v >> (8 * i)) & 0xff).toByte)
    val samples = Array[Byte](0, 50, 100, -56) // unsigned: 0,50,100,200
    // an odd-sized LIST chunk (3 bytes + 1 pad) BEFORE fmt/data — a
    // real-world layout the chunk walk must skip correctly
    val list = "LIST".getBytes("US-ASCII") ++ le(3, 4) ++
      Array[Byte](1, 2, 3, 0)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le(16, 4) ++ le(1, 2) ++
      le(2, 2) ++ le(44100, 4) ++ le(88200, 4) ++ le(2, 2) ++ le(8, 2)
    val data = "data".getBytes("US-ASCII") ++ le(4, 4) ++ samples
    val body = "WAVE".getBytes("US-ASCII") ++ list ++ fmt ++ data
    val bytes = "RIFF".getBytes("US-ASCII") ++ le(body.length.toLong, 4) ++
      body
    val f = Multimodal.parseWav(MediaRecord(3L, "audio/wav", bytes))
    assert(f.channels == 2 && f.sample_rate == 44100 &&
      f.bits_per_sample == 8)
    assert(f.n_samples == 2L) // 4 bytes / 2 channels
    assert(math.abs(f.mean_amp - 87.5) < 1e-12)
    intercept[IllegalArgumentException] {
      Multimodal.parseWav(MediaRecord(4L, "x", "RIFX1234WAVE".getBytes))
    }
  }

  test("packPpm/decodePpm and packWav/decodeWav roundtrip through " +
      "expression-built files") {
    val s = spark
    import s.implicits._
    // 50 chars = one full 16-wide row (48 bytes) + 2 truncated
    val docs = Seq((1L, "a" * 50), (2L, "xy")).toDF("doc_id", "text")
    val ppm = Multimodal.decodePpm(
      Multimodal.packPpm(docs, "doc_id", "text", width = 16)
        .as[MediaRecord]).collect()
    assert(ppm.length == 1) // doc 2 is shorter than one row -> dropped
    assert(ppm(0).media_id == 1L && ppm(0).width == 16 &&
      ppm(0).height == 1 && ppm(0).maxval == 255)
    assert(math.abs(ppm(0).mean_px - 'a'.toInt) < 1e-12)
    val wav = Multimodal.decodeWav(
      Multimodal.packWav(docs, "doc_id", "text", sampleRate = 8000)
        .as[MediaRecord]).collect().map(w => w.media_id -> w).toMap
    assert(wav(1L).n_samples == 50L && wav(2L).n_samples == 2L)
    assert(wav(2L).channels == 1 && wav(2L).sample_rate == 8000 &&
      wav(2L).bits_per_sample == 8)
    assert(math.abs(wav(2L).mean_amp - ('x'.toInt + 'y'.toInt) / 2.0) < 1e-12)
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

  test("ppmAHash: half-dark/half-bright image sets exactly the bright " +
      "quadrant bits; identical images pair at Hamming 0, inverse at 64") {
    val s = spark
    import s.implicits._
    // 8×8 P6: left half black, right half white → 64 cells of 1 px;
    // mean = (32·0 + 32·255)/64 = 127 → bit set iff x >= 4
    def img(invert: Boolean): Array[Byte] = {
      val header = "P6\n8 8\n255\n".getBytes("US-ASCII")
      val px = Array.tabulate(8 * 8 * 3) { k =>
        val bright = ((k / 3) % 8 >= 4) ^ invert
        if (bright) 0xff.toByte else 0x00.toByte
      }
      header ++ px
    }
    val media = Seq(
      MediaRecord(1L, "image/ppm", img(invert = false)),
      MediaRecord(2L, "image/ppm", img(invert = false)),
      MediaRecord(3L, "image/ppm", img(invert = true)),
      MediaRecord(4L, "image/ppm", "P6\n4 4\n255\n".getBytes ++
        Array.fill(48)(0x10.toByte))). // < 8×8 → dropped
      toDS()
    val hashes = Multimodal.ppmAHash(media)
    val m = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per row the set bits are cj 4..7 → byte 0xF0 per row
    val expected = java.lang.Long.parseUnsignedLong("f0f0f0f0f0f0f0f0", 16)
    assert(m == Map(1L -> expected, 2L -> expected, 3L -> ~expected))
    val pairs = graft.ext.Dedup.hammingDupPairs(hashes, "media_id", "ahash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // only the identical pair survives (1,3)/(2,3) are Hamming 64
    assert(pairs == Set((1L, 2L, 0L)))
  }

  test("wavAHash: loud-half/quiet-half stream sets exactly the loud " +
      "segment bits; identical streams pair at Hamming 0, inverse never") {
    val s = spark
    import s.implicits._
    def le(v: Long, w: Int): Array[Byte] =
      Array.tabulate(w)(i => ((v >> (8 * i)) & 0xff).toByte)
    def wav(samples: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ le(samples.length + 36L, 4) ++
        "WAVEfmt ".getBytes("US-ASCII") ++ le(16, 4) ++ le(1, 2) ++
        le(1, 2) ++ le(8000, 4) ++ le(8000, 4) ++ le(1, 2) ++ le(8, 2) ++
        "data".getBytes("US-ASCII") ++ le(samples.length.toLong, 4) ++
        samples
    // 128 samples: first half 200, second half 0 → segments 0..31 mean
    // 200, 32..63 mean 0; grid mean = (32·200)/64 = 100 → bits 0..31
    def sig(invert: Boolean): Array[Byte] = Array.tabulate(128) { i =>
      val loud = (i < 64) ^ invert
      if (loud) 200.toByte else 0.toByte
    }
    val media = Seq(
      MediaRecord(1L, "audio/wav", wav(sig(invert = false))),
      MediaRecord(2L, "audio/wav", wav(sig(invert = false))),
      MediaRecord(3L, "audio/wav", wav(sig(invert = true))),
      MediaRecord(4L, "audio/wav", wav(Array.fill(63)(9.toByte)))
    ).toDS() // #4 < 64 samples → dropped
    val hashes = Multimodal.wavAHash(media)
    val m = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = java.lang.Long.parseUnsignedLong("00000000ffffffff", 16)
    assert(m == Map(1L -> expected, 2L -> expected, 3L -> ~expected))
    val pairs = graft.ext.Dedup.hammingDupPairs(hashes, "media_id", "ahash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 0L))) // inverse is Hamming 64 — never paired
  }

  test("ppmResize keeps pixel (x*f, y*f), re-encodes a valid P6 the " +
      "decoder accepts, drops sub-pixel images") {
    val s = spark
    import s.implicits._
    // 4x4 image whose pixel (x, y) is RGB (10x+y, 100+x, 200+y):
    // factor 2 keeps pixels (0,0), (2,0), (0,2), (2,2)
    def px(x: Int, y: Int) =
      Array((10 * x + y).toByte, (100 + x).toByte, (200 + y).toByte)
    val payload = "P6\n4 4\n255\n".getBytes("US-ASCII") ++
      (for (y <- 0 until 4; x <- 0 until 4) yield px(x, y))
        .flatten.toArray
    val tiny = "P6\n1 1\n255\nabc".getBytes("US-ASCII") // 1x1: drops at f=2
    val in = Seq(MediaRecord(1L, "image/ppm", payload),
      MediaRecord(2L, "image/ppm", tiny)).toDS()
    val out = Multimodal.ppmResize(in, 2).collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L)
    assert(out(0).getInt(1) == 2 && out(0).getInt(2) == 2)

    val expectBody = Seq(px(0, 0), px(2, 0), px(0, 2), px(2, 2)).flatten
    assert(out(0).getLong(3) == 12L)
    assert(out(0).getLong(4) == expectBody.map(_ & 0xff).sum.toLong)
    val expectFile = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ expectBody
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(out(0).getString(5) ==
      md.digest(expectFile).map(b => f"$b%02x").mkString)

    // the re-encoded file parses: decode sees the new dimensions
    val small = MediaRecord(1L, "image/ppm", expectFile)
    val feats = Multimodal.decodePpm(Seq(small).toDS()).head()
    assert(feats.width == 2 && feats.height == 2 && feats.n_pixels == 4L)
  }

  test("wavDecimate halves the rate, keeps every factor-th sample, " +
      "and re-encodes a file decodeWav accepts") {
    val s = spark
    import s.implicits._
    val packed = Multimodal.packWav(
      Seq((7L, "abcdefg")).toDF("doc_id", "text"),
      "doc_id", "text", sampleRate = 8000)
    val out = Multimodal.wavDecimate(packed.as[MediaRecord], 2).head()
    assert(out.getAs[Int]("rate_small") == 4000)
    assert(out.getAs[Long]("n_samples_small") == 4L) // a c e g
    assert(out.getAs[Long]("sum_small") ==
      "aceg".getBytes("US-ASCII").map(_ & 0xff).sum.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(out.getAs[String]("data_md5") ==
      md.digest("aceg".getBytes("US-ASCII")).map(b => f"$b%02x").mkString)

    // the rebuilt file is a valid WAV at the divided rate
    val feats = Multimodal.decodeWav(Seq(MediaRecord(7L, "audio/wav",
      out.getAs[Array[Byte]]("payload_small"))).toDS()).head()
    assert(feats.sample_rate == 4000 && feats.n_samples == 4L &&
      feats.bits_per_sample == 8)
  }

  test("wavTone: integer DFT replays a scalar loop; an exact-period " +
      "signal correlates fully with the cosine leg") {
    val s = spark
    import s.implicits._
    // n = 4 with cycles = 8: every angle is a multiple of 4pi, so the
    // cosine twiddle is exactly 1e4 and the sine twiddle quantizes to 0
    val rec = Multimodal.packWav(Seq((1L, "abcd"), (2L, "hello world"))
        .toDF("doc_id", "text"), "doc_id", "text").as[MediaRecord]
    val got = Multimodal.wavTone(rec, cycles = 8).collect()
      .map(t => t.media_id -> t).toMap
    assert(got(1L).n_samples == 4L)
    assert(got(1L).re_q4 == (97L + 98 + 99 + 100) * 10000L)
    assert(got(1L).im_q4 == 0L)
    // scalar replay of the general case
    val text = "hello world"
    def q4(x: Double): Long =
      if (x >= 0) math.floor(x * 1e4 + 0.5).toLong
      else -math.floor(-x * 1e4 + 0.5).toLong
    val n = text.length
    var re = 0L; var im = 0L
    for (i <- 0 until n) {
      val u = text.charAt(i).toLong
      val ang = 2.0 * math.Pi * 8.0 * i.toDouble / n.toDouble
      re += u * q4(math.cos(ang)); im += u * q4(math.sin(ang))
    }
    assert(got(2L).re_q4 == re && got(2L).im_q4 == im)
  }

  test("ppmGradient: scalar Sobel replay on a known image; flat images " +
      "score zero; short images have no interior") {
    val s = spark
    import s.implicits._
    // 16-wide rows of 48 chars each; 3 rows of a CONSTANT byte -> all
    // luminances equal -> every gx, gy = 0
    val flat = "a" * 144
    // 3 rows with the middle row brighter: vertical gradient
    val ridge = ("a" * 48) + ("z" * 48) + ("a" * 48)
    val rec = Multimodal.packPpm(
        Seq((1L, flat), (2L, ridge), (3L, "b" * 96)).toDF("doc_id", "text"),
        "doc_id", "text", width = 16).as[MediaRecord]
    val got = Multimodal.ppmGradient(rec).collect()
      .map(g => g.media_id -> g).toMap
    assert(got(1L).grad_energy == 0L)
    assert(got(3L).height == 2L && got(3L).grad_energy == 0L) // no interior
    // scalar replay for the ridge
    val lumA = 3L * 'a'; val lumZ = 3L * 'z'
    // interior row y=1 (the z row); for every interior x the 3x3
    // neighborhood is column-symmetric -> gx = 0; gy sums
    // (a-row below) - (a-row above) = 0 too? No: gy uses corners a,
    // below = a+2a+a... compute directly:
    def lum(x: Int, y: Int): Long = if (y == 1) lumZ else lumA
    var e = 0L
    for (x <- 1 to 14) {
      val gx = (lum(x+1,0) + 2*lum(x+1,1) + lum(x+1,2)) -
        (lum(x-1,0) + 2*lum(x-1,1) + lum(x-1,2))
      val gy = (lum(x-1,2) + 2*lum(x,2) + lum(x+1,2)) -
        (lum(x-1,0) + 2*lum(x,0) + lum(x+1,0))
      e += math.abs(gx) + math.abs(gy)
    }
    assert(got(2L).grad_energy == e)
  }
}
