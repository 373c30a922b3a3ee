package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MediaPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def media = Seq(
    (1L, Array.tabulate(2500)(_.toByte)),
    (2L, Array.tabulate(999)(i => (i * 3).toByte)),
    (3L, Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47) ++ Array.fill(100)(7.toByte))
  ).toDF("media_id", "payload")

  test("decodeFeatures: payload pruned, typed metadata out, stub decode applied") {
    val out = MediaPipeline.decodeFeatures(spark, media, frameSize = 1000)
      .orderBy("media_id").collect()
    assert(!out.head.schema.fieldNames.contains("payload"))
    val r1 = out(0)
    assert(r1.getAs[Long]("n_bytes") === 2500L)
    assert(r1.getAs[Int]("n_frames") === 3) // ceil(2500/1000)
    assert(r1.getAs[Int]("width") === 64 + 2500 % 577)
    assert(out(2).getAs[String]("format") === "png") // magic sniffing is real
    assert(out(1).getAs[String]("format") === "bin")
  }

  test("sampleFrames: every stride-th frame, correctly indexed and sized") {
    val out = MediaPipeline.sampleFrames(spark, media, frameSize = 1000, stride = 2)
      .filter(col("media_id") === 1L).orderBy("frame_idx").collect()
    // 2500 bytes -> frames of 1000,1000,500 -> kept: idx 0 (1000B), idx 1 (500B)
    assert(out.length === 2)
    assert(out(0).getAs[Array[Byte]]("frame").length === 1000)
    assert(out(1).getAs[Array[Byte]]("frame").length === 500)
  }

  test("audio features stub: fixed dim, deterministic") {
    val a = Codecs.audioFeaturesStub(Array.tabulate(100)(_.toByte), 16)
    val b = Codecs.audioFeaturesStub(Array.tabulate(100)(_.toByte), 16)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 16)
  }

  test("resize: per-row output matches Codecs.resizeStub byte-for-byte") {
    val out = MediaPipeline.resize(spark, media, w = 64, h = 48)
      .orderBy("media_id").collect()
    val expected = Seq(
      1L -> Array.tabulate(2500)(_.toByte),
      2L -> Array.tabulate(999)(i => (i * 3).toByte),
      3L -> (Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47) ++ Array.fill(100)(7.toByte)))
    out.zip(expected).foreach { case (row, (id, payload)) =>
      assert(row.getAs[Long]("media_id") === id)
      assert(row.getAs[Long]("n_bytes_in") === payload.length.toLong)
      assert(row.getAs[Array[Byte]]("resized").toSeq ===
        Codecs.resizeStub(payload, 64, 48).toSeq)
    }
  }

  test("REAL codec: ImageIO decode of an encoded PNG recovers exact dims and pixels") {
    val png = Codecs.encodePng(5, 3, 10, 20, 30)
    assert(Codecs.magicFormat(png) === "png")
    val meta = Codecs.decodeImage(png)
    assert((meta.width, meta.height, meta.channels, meta.format) === ((5, 3, 3, "png")))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    for (y <- 0 until 3; x <- 0 until 5)
      assert((img.getRGB(x, y) & 0xffffff) === ((10 << 16) | (20 << 8) | 30))
  }

  test("REAL codec: nearest-neighbor resize picks exactly in(2x, 2y) on a 4x4 gradient") {
    val src = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) src.setRGB(x, y, (x * 16) << 16 | (y * 16) << 8 | 7)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", baos)
    val resized = Codecs.resize(baos.toByteArray, 2, 2)
    val out = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert((out.getWidth, out.getHeight) === ((2, 2)))
    for (y <- 0 until 2; x <- 0 until 2)
      assert((out.getRGB(x, y) & 0xffffff) === (((2 * x * 16) << 16) | ((2 * y * 16) << 8) | 7))
  }

  test("REAL codec: WAV PCM16 round-trip recovers exact samples and metadata") {
    val samples = Array[Short](-3, 0, 1000, Short.MinValue, Short.MaxValue, 16384)
    val wav = Codecs.encodeWav(samples, sampleRate = 8000)
    val meta = Codecs.decodeWav(wav).get
    assert((meta.sampleRate, meta.channels, meta.nSamples) === ((8000, 1, 6L)))
    val pcm = Codecs.decodePcm16(wav).get
    assert(pcm.toSeq === samples.map(_ / 32768.0).toSeq)
    // constant-amplitude feature: every bucket is exactly v/32768
    val const = Codecs.encodeWav(Array.fill[Short](100)(4096), 8000)
    assert(Codecs.audioFeatures(const, 4).toSeq === Seq.fill(4)(0.125f))
  }

  test("magic gate: text payloads never reach ImageIO (the 3x multimodal_decode drift), every JDK raster signature still does") {
    // text-as-binary — the whole documents corpus — must short-circuit
    // to the stub without an ImageIO SPI probe per row
    val text = "alpha beta gamma delta".getBytes("UTF-8")
    assert(!Codecs.maybeRaster(text))
    assert(Codecs.decodeImage(text) === Codecs.decodeImageStub(text))
    // every signature the JDK's standard readers accept still attempts
    // the real decode: png, jpeg, gif, riff, bmp, tiff (both byte
    // orders), and the 0x00 type byte of headerless wbmp
    val sigs = Seq(
      Array(0x89, 0x50, 0x4e, 0x47), Array(0xff, 0xd8, 0xff, 0xe0),
      Array(0x47, 0x49, 0x46, 0x38), Array(0x52, 0x49, 0x46, 0x46),
      Array(0x42, 0x4d, 0x00, 0x00), Array(0x49, 0x49, 0x2a, 0x00),
      Array(0x4d, 0x4d, 0x00, 0x2a), Array(0x00, 0x00, 0x18, 0x18))
    sigs.foreach { s =>
      assert(Codecs.maybeRaster(s.map(_.toByte)),
        s"signature ${s.map(b => f"$b%02x").mkString(" ")} must pass the gate")
    }
    // a gated-through but undecodable payload still lands on the stub
    val junkPng = Array(0x89, 0x50, 0x4e, 0x47, 1, 2, 3).map(_.toByte)
    assert(Codecs.decodeImage(junkPng) === Codecs.decodeImageStub(junkPng))
    // and a REAL png still decodes real dims through the gate
    val png = Codecs.encodePng(7, 4, 1, 2, 3)
    val meta = Codecs.decodeImage(png)
    assert((meta.width, meta.height) === ((7, 4)))
  }

  test("REAL codec: pipeline dispatches decodable payloads to the real decoder") {
    val real = Seq((9L, Codecs.encodePng(33, 21, 1, 2, 3))).toDF("media_id", "payload")
    val row = MediaPipeline.decodeFeatures(spark, real).collect().head
    assert(row.getAs[Int]("width") === 33)     // real dims, not 64 + n%577
    assert(row.getAs[Int]("height") === 21)
    assert(row.getAs[Int]("channels") === 3)
    assert(row.getAs[String]("format") === "png")
  }

  test("aHash64: invariant to shade jitter and resize, sensitive to structure") {
    val base = Codecs.encodeBandPng(16, pattern = 0x5, dark = 40, bright = 200)
    val jittered = Codecs.encodeBandPng(16, pattern = 0x5, dark = 55, bright = 185)
    assert(!java.util.Arrays.equals(base, jittered), "fixtures must be byte-distinct")
    assert(Codecs.aHash64(base) === Codecs.aHash64(jittered),
      "shade jitter must not change the perceptual hash")
    // a resize (even through a re-encode) keeps the hash: band structure
    // survives nearest-neighbor resampling of band-aligned sizes
    assert(Codecs.aHash64(Codecs.resize(base, 32, 32)) === Codecs.aHash64(base),
      "resize must not change the perceptual hash")
    // flipping one band flips exactly that band's 8 bits
    val other = Codecs.encodeBandPng(16, pattern = 0x7, dark = 40, bright = 200)
    val diff = java.lang.Long.bitCount(Codecs.aHash64(base) ^ Codecs.aHash64(other))
    assert(diff === 8, s"one changed band must flip exactly 8 bits, flipped $diff")
    // expected bit layout: band j bright => hash byte j = 0xFF
    assert(Codecs.aHash64(base) === 0xFF00FFL)
  }

  test("encodeCellPng: aHash64 recovers the planted 64-bit pattern exactly") {
    val p = 0x0F0F0F0F0F0F0F0FL ^ (3L << 56) // mixed bright/dark incl. a flip
    assert(Codecs.aHash64(Codecs.encodeCellPng(16, p, 40, 200)) === p)
    // jitter invariance carries over from the band fixture
    assert(Codecs.aHash64(Codecs.encodeCellPng(16, p, 55, 185)) === p)
    // a single-bit pattern edit moves the hash by exactly one bit
    val q = p ^ (1L << 17)
    assert(java.lang.Long.bitCount(
      Codecs.aHash64(Codecs.encodeCellPng(16, q, 40, 200)) ^ p) === 1)
  }

  test("hammingGroups: bands find 1-3-bit variants, transitive closure, no false merges") {
    import graft.ops.Multimodal
    val base = 0x00FF00FF00FF00FFL
    val rows = Seq(
      (1L, base),                              // family A base
      (2L, base ^ (1L << 3)),                  // 1 bit off base
      (3L, base ^ (1L << 3) ^ (3L << 40)),     // 3 off #2, 4 off base: TRANSITIVE
      (4L, base ^ 0xF0F0L << 16),              // 8 bits away: separate group
      (5L, base ^ 0xF0F0L << 16),              // exact dup of #4
      (6L, 0x123456789ABCDEF0L))               // unrelated singleton
    val out = Multimodal.hammingGroups(spark,
        rows.toDF("id", "h"), "id", "h", maxDist = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // 1-2 direct (dist 1); 2-3 direct (dist 3); 1-3 only via transitivity
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 1L)
    assert(out(4L) === 4L && out(5L) === 4L, "exact dups group via distinct-hash collapse")
    assert(out(6L) === 6L, "far hash stays a singleton")
  }

  test("hammingGroupsBanded: wider bands with radius probes find the identical groups") {
    import graft.ops.Multimodal
    // Pseudo-random 64-bit corpus + planted near-dup chains: md5-derived
    // bases (realistic bit density) with 1-3-bit variants. Pigeonhole
    // holds for ANY m with t = floor(d/m), so m=4 (t=0, exact 16-bit
    // bands) and m=2 (t=1, 32-bit bands probed through 33 XOR masks)
    // must produce byte-identical components — the dial changes
    // candidate volume, never the answer.
    def md5h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      (7 to 0 by -1).foldLeft(0L)((h, j) => (h << 8) | (d(8 + j) & 0xffL))
    }
    val rows = (0L until 200L).flatMap { i =>
      val base = md5h(s"mih:$i")
      Seq((i * 10, base), (i * 10 + 1, base ^ (1L << (i % 64).toInt)),
        (i * 10 + 2, base ^ (7L << (i % 60).toInt)))
    }
    def groups(bands: Int) = Multimodal.hammingGroupsBanded(spark,
        rows.toDF("id", "h"), "id", "h", maxDist = 3, bands = bands)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).sortBy(_._1).toSeq
    val g4 = groups(4)
    assert(groups(2) === g4, "m=2/t=1 must equal m=4/t=0")
    // sanity: the planted variants actually grouped with their base
    val byId = g4.toMap
    assert((0L until 200L).forall(i => byId(i * 10 + 1) === byId(i * 10)))
  }

  test("hammingMasks: ball sizes are exactly sum of binomials, oversize dials refuse") {
    import graft.ops.Multimodal
    assert(Multimodal.hammingMasks(16, 0) === Seq(0L))
    assert(Multimodal.hammingMasks(32, 1).length === 33)
    assert(Multimodal.hammingMasks(32, 1).distinct.length === 33)
    assert(Multimodal.hammingMasks(21, 2).length === 1 + 21 + 210)
    intercept[IllegalArgumentException](Multimodal.hammingMasks(64, 3))
  }

  test("audioHash64: invariant to level jitter, sensitive to section structure") {
    def clip(pattern: Int, loud: Short, quiet: Short): Array[Byte] =
      Codecs.encodeWav(Array.tabulate(512) { i =>
        if (((pattern >> (i / 64)) & 1) == 1) loud else quiet
      }, sampleRate = 8000)
    val base = clip(0x5, 9600, 800)
    val jittered = clip(0x5, 10080, 944)
    assert(!java.util.Arrays.equals(base, jittered), "fixtures must be byte-distinct")
    assert(Codecs.audioHash64(base) === Codecs.audioHash64(jittered),
      "level jitter must not change the envelope hash")
    val other = clip(0x7, 9600, 800)
    val diff = java.lang.Long.bitCount(Codecs.audioHash64(base) ^ Codecs.audioHash64(other))
    assert(diff === 8, s"one changed section must flip exactly 8 bits, flipped $diff")
    // expected layout: section j loud => hash byte j = 0xFF
    assert(Codecs.audioHash64(base) === 0xFF00FFL)
    // the peak probe equals the planted loud level exactly (dyadic PCM16)
    assert(Codecs.audioHash64AndPeak(base)._2 === 9600)
  }

  test("REAL codec: animated-GIF frame extraction recovers every frame's dims and gray") {
    // 3 frames, distinct sizes impossible in GIF (global canvas) so fixed
    // dims, per-frame gray values spread across the palette range.
    val planted = Seq((11, 7, 0), (11, 7, 97), (11, 7, 255))
    val gif = Codecs.encodeGifGray(planted)
    // magic bytes prove a real container was written
    assert(new String(gif.take(6), "US-ASCII") === "GIF89a")
    val frames = Codecs.decodeGifFrames(gif)
    assert(frames === planted, "per-frame (w,h,gray) must round-trip bit-exact")
    // frame-count parse is real: re-encode with a different count
    assert(Codecs.decodeGifFrames(Codecs.encodeGifGray(planted.take(2))).length === 2)
  }

  test("framesReal: oracle arithmetic reproduced end-to-end through the GIF codec") {
    // one planted id exercised through the full operator path arithmetic
    val id = 40L
    val nf = (2 + id % 4).toInt; val w = (8 + id % 16).toInt; val h = (8 + (id / 5) % 8).toInt
    val frames = Codecs.decodeGifFrames(Codecs.encodeGifGray(
      (0 until nf).map(k => (w, h, ((id * 7 + k * 31) % 256).toInt))))
    assert(frames.length === nf)
    frames.zipWithIndex.foreach { case ((fw, fh, g), k) =>
      assert((fw, fh) === (w, h))
      assert(g === ((id * 7 + k * 31) % 256).toInt)
    }
  }

  test("audioFeatures: ANN-contract shape (Array[Float] of fixed dim) per payload") {
    val out = MediaPipeline.audioFeatures(spark, media, dim = 16)
      .orderBy("media_id").collect()
    assert(out.length === 3)
    out.foreach { r =>
      val f = r.getSeq[Float](1)
      assert(f.length === 16)
    }
    // values match the stub applied directly
    assert(out(1).getSeq[Float](1).toArray.toSeq ===
      Codecs.audioFeaturesStub(Array.tabulate(999)(i => (i * 3).toByte), 16).toSeq)
  }
}
