package graft.multimodal

/** Media codecs: REAL pure-JDK decode for the formats the JDK ships
  * codecs for, deterministic stubs for everything else.
  *
  *  - Images: `javax.imageio` (PNG, JPEG, GIF, BMP readers are part of
  *    the JDK). [[decodeImage]] / [[resize]] run the real decoder and
  *    fall back to the old deterministic stubs when the payload is not a
  *    decodable image — the stub path is what the documents-as-binary
  *    oracle queries exercise (their payloads are UTF-8 text), and its
  *    outputs are pure arithmetic on the byte length so DuckDB can
  *    replicate them.
  *  - Audio: `javax.sound.sampled` (WAV/AIFF/AU PCM). [[decodeWav]] /
  *    [[audioFeatures]] decode real PCM; non-audio payloads fall back to
  *    the byte-histogram stub.
  *  - Video: no JDK codec exists; frame sampling stays a byte-window
  *    stub ([[sampleFramesStub]]) with real Spark-side plumbing.
  *
  * Real-path correctness is proven two ways: MediaPipelineSpec decodes
  * known-good byte arrays (exact pixels / exact PCM samples), and the
  * multimodal_*_real oracle queries plant PNG/WAV fixtures whose decoded
  * properties are arithmetic in doc_id — Spark decodes actual bytes,
  * DuckDB recomputes the expected values.
  */
object Codecs {

  final case class ImageMeta(width: Int, height: Int, channels: Int, format: String)

  /** REAL image decode via ImageIO; falls back to [[decodeImageStub]]
    * when the payload is not an image the JDK can read.
    */
  def decodeImage(payload: Array[Byte]): ImageMeta = {
    val img = readImage(payload)
    if (img != null)
      ImageMeta(img.getWidth, img.getHeight, img.getRaster.getNumBands,
        magicFormat(payload))
    else decodeImageStub(payload)
  }

  /** Magic-byte gate ahead of [[readImage]]: the signatures of every
    * raster format the JDK's standard ImageIO readers accept (png, jpeg,
    * gif, bmp, tiff both byte orders, riff/webp attempts-and-fails like
    * today, and a 0x00 lead for headerless wbmp). A payload that cannot
    * be any of them — e.g. every text-as-binary document in a mixed
    * corpus — must not pay an ImageIO SPI probe per row: at bench scale
    * that probe alone tripled `multimodal_decode` (0.21 s → 0.69 s on
    * 40k rows) while returning null every time.
    */
  private[multimodal] def maybeRaster(payload: Array[Byte]): Boolean = {
    def at(i: Int, b: Int): Boolean = (payload(i) & 0xff) == b
    payload.length >= 4 && (
      at(0, 0x89) || // png
      at(0, 0xff) || // jpeg
      (at(0, 0x47) && at(1, 0x49)) || // gif
      (at(0, 0x52) && at(1, 0x49)) || // riff
      (at(0, 0x42) && at(1, 0x4d)) || // bmp
      (at(0, 0x49) && at(1, 0x49)) || (at(0, 0x4d) && at(1, 0x4d)) || // tiff
      at(0, 0x00)) // wbmp (no signature; type byte 0)
  }

  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage =
    if (!maybeRaster(payload)) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }

  /** STUB image decode (non-image payloads): dimensions derived
    * deterministically from the payload length, replicable in SQL.
    */
  def decodeImageStub(payload: Array[Byte]): ImageMeta = {
    val n = payload.length
    ImageMeta(
      width = 64 + (n % 577),
      height = 64 + ((n / 7) % 433),
      channels = 1 + ((n / 11) % 3),
      format = magicFormat(payload))
  }

  /** Format sniffing from magic bytes (public file-format signatures). */
  def magicFormat(payload: Array[Byte]): String = {
    def startsWith(sig: Int*): Boolean =
      payload.length >= sig.length && sig.zipWithIndex.forall { case (b, i) =>
        (payload(i) & 0xff) == b }
    if (startsWith(0x89, 0x50, 0x4e, 0x47)) "png"
    else if (startsWith(0xff, 0xd8, 0xff)) "jpeg"
    else if (startsWith(0x52, 0x49, 0x46, 0x46)) "riff"
    else if (startsWith(0x47, 0x49, 0x46, 0x38)) "gif"
    else "bin"
  }

  /** REAL resize: nearest-neighbor resample (deterministic — no
    * platform-dependent filtering) re-encoded as PNG. Non-image payloads
    * fall back to [[resizeStub]].
    */
  def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = readImage(payload)
    if (img == null) resizeStub(payload, w, h)
    else {
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val sy = y * img.getHeight / h
        var x = 0
        while (x < w) {
          out.setRGB(x, y, img.getRGB(x * img.getWidth / w, sy))
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }
  }

  /** STUB resize (non-image payloads): re-hashes the payload to a
    * length-contract digest so downstream schema/flow is exercised.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.min(payload.length, w * h / 64 + 16))
    var i = 0
    while (i < out.length) { out(i) = (payload(i % math.max(payload.length, 1)) ^ (w + h)).toByte; i += 1 }
    out
  }

  /** STUB frame sampling: treats the payload as `frameSize`-byte frames
    * and returns every `stride`-th frame (a real impl needs a video
    * codec, which the JDK does not ship).
    */
  def sampleFramesStub(payload: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] = {
    payload.grouped(frameSize).zipWithIndex
      .collect { case (f, i) if i % stride == 0 => f }
      .toSeq
  }

  final case class WavMeta(sampleRate: Int, channels: Int, nSamples: Long)

  /** REAL audio probe: container metadata via AudioSystem (WAV/AIFF/AU).
    * Returns None for payloads no JDK codec accepts.
    */
  def decodeWav(payload: Array[Byte]): Option[WavMeta] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        Some(WavMeta(f.getSampleRate.toInt, f.getChannels, ais.getFrameLength))
      } finally ais.close()
    } catch { case _: Exception => None }

  /** REAL PCM decode: interleaved 16-bit signed samples as doubles in
    * [-1, 1) (v / 32768 — exact in binary floating point). Only
    * PCM_SIGNED 16-bit payloads are supported; others return None.
    */
  def decodePcm16(payload: Array[Byte]): Option[Array[Double]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16) None
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1)
            val v = if (f.isBigEndian) ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff))
            else ((hi << 8) | lo)
            out(i) = v / 32768.0
            i += 1
          }
          Some(out)
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Audio feature vector: REAL path buckets mean |amplitude| of the
    * decoded PCM stream by sample index mod `dim`; non-audio payloads
    * fall back to the byte-histogram stub.
    */
  def audioFeatures(payload: Array[Byte], dim: Int): Array[Float] =
    decodePcm16(payload) match {
      case Some(samples) =>
        val sums = new Array[Double](dim)
        val counts = new Array[Long](dim)
        var i = 0
        while (i < samples.length) {
          sums(i % dim) += math.abs(samples(i)); counts(i % dim) += 1; i += 1
        }
        Array.tabulate(dim)(j => if (counts(j) == 0) 0f else (sums(j) / counts(j)).toFloat)
      case None => audioFeaturesStub(payload, dim)
    }

  /** STUB audio feature: fixed-length "embedding" from byte histogram
    * moments (non-audio payloads).
    */
  def audioFeaturesStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  // ---- deterministic fixture encoders (test + oracle plants) ---------------

  /** Encode a solid-color RGB PNG — the planted fixture for the
    * multimodal_*_real oracle queries (decoded properties arithmetic in
    * the caller's id).
    */
  def encodePng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Decode an image payload to (width, height, r, g, b of pixel(0,0)) —
    * the oracle-checkable probe of a decoded/resized image. Throws on
    * non-image payloads (the real-fixture queries only feed it PNGs).
    */
  def probeImage(payload: Array[Byte]): (Int, Int, Int, Int, Int) = {
    val img = readImage(payload)
    require(img != null, "probeImage: payload is not a decodable image")
    val rgb = img.getRGB(0, 0)
    (img.getWidth, img.getHeight, (rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
  }

  /** Encode a horizontal-band grayscale PNG: `size`×`size`, split into 8
    * equal row bands; band j is `bright` iff bit j of `pattern` is set,
    * else `dark` (r = g = b). The planted fixture for perceptual-hash
    * dedup: two images with the same pattern but different shades have
    * different bytes yet the same [[aHash64]].
    */
  def encodeBandPng(size: Int, pattern: Int, dark: Int, bright: Int): Array[Byte] = {
    require(size % 8 == 0, "band fixture needs size divisible by 8")
    val img = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val band = size / 8
    var y = 0
    while (y < size) {
      val v = if (((pattern >> (y / band)) & 1) == 1) bright else dark
      val rgb = (v << 16) | (v << 8) | v
      var x = 0
      while (x < size) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Encode an 8×8-cell grayscale PNG carrying a full 64-bit pattern:
    * `size`×`size`, split into an 8×8 grid; cell (row j, col i) is
    * `bright` iff bit (8·j + i) of `pattern` is set, else `dark`
    * (r = g = b). As long as 0 < popcount(pattern) < 64 and
    * dark < bright, [[aHash64]] recovers `pattern` exactly (every
    * bright cell is above the grid mean, every dark cell below) — the
    * planted fixture for HAMMING-distance perceptual dedup, where
    * variants of a base pattern differ in 1–2 chosen bits.
    */
  def encodeCellPng(size: Int, pattern: Long, dark: Int, bright: Int): Array[Byte] = {
    require(size % 8 == 0, "cell fixture needs size divisible by 8")
    val img = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val cell = size / 8
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        val bit = 8 * (y / cell) + (x / cell)
        val v = if (((pattern >>> bit) & 1L) == 1L) bright else dark
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** 64-bit average hash (aHash), the classic perceptual image
    * fingerprint: sample an 8×8 grid by nearest neighbor, grayscale each
    * sample as (r+g+b)/3, and set bit (8·row + col) iff the sample is at
    * or above the grid mean. The threshold compares `gray·64 ≥ Σgray` in
    * integer arithmetic — no floating point, so the hash is exactly
    * reproducible. Byte-level edits that do not cross the mean (shade
    * jitter, re-encoding, resizing) preserve the hash; structural edits
    * flip bits ∝ changed area. Throws on non-image payloads.
    */
  def aHash64(payload: Array[Byte]): Long = {
    val img = readImage(payload)
    require(img != null, "aHash64: payload is not a decodable image")
    aHashOf(img)
  }

  /** [[aHash64]] plus the gray value at (x, y), from a SINGLE decode —
    * the per-row shape the perceptual-dedup scan uses (decoding is the
    * dominant per-image cost; never pay it twice for two probes).
    */
  def aHash64AndGray(payload: Array[Byte], x: Int, y: Int): (Long, Int) = {
    val img = readImage(payload)
    require(img != null, "aHash64AndGray: payload is not a decodable image")
    (aHashOf(img), grayAt(img, x, y))
  }

  private def grayAt(img: java.awt.image.BufferedImage, x: Int, y: Int): Int = {
    val rgb = img.getRGB(x, y)
    (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
  }

  private def aHashOf(img: java.awt.image.BufferedImage): Long = {
    val gray = new Array[Int](64)
    var j = 0
    while (j < 8) {
      val y = j * img.getHeight / 8
      var i = 0
      while (i < 8) {
        val rgb = img.getRGB(i * img.getWidth / 8, y)
        gray(8 * j + i) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        i += 1
      }
      j += 1
    }
    val sum = gray.sum
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (gray(k) * 64 >= sum) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** Grayscale value of pixel (x, y) — the oracle-checkable shade probe
    * of a planted fixture. Throws on non-image payloads.
    */
  def probeGray(payload: Array[Byte], x: Int, y: Int): Int = {
    val img = readImage(payload)
    require(img != null, "probeGray: payload is not a decodable image")
    grayAt(img, x, y)
  }

  /** 64-bit loudness-envelope hash — [[aHash64]]'s audio twin: REAL PCM
    * decode, 64 equal time buckets, bit k set iff bucket k's mean
    * |amplitude| is at or above the whole clip's mean. The threshold is
    * the cross-multiplication `sum_k · n ≥ total · n_k` — every operand
    * is an exact dyadic rational (PCM16 / 32768) or an int, so the hash
    * is exactly reproducible. Level jitter that stays on one side of the
    * mean (re-mastering, volume changes within a section) preserves the
    * hash; structural edits (a section going loud↔quiet) flip that
    * section's bits. Throws on non-PCM16 payloads.
    */
  def audioHash64(payload: Array[Byte]): Long =
    envelopeHashOf(decodePcm16(payload).getOrElse(
      throw new IllegalArgumentException("audioHash64: payload is not PCM16 audio")))

  private def envelopeHashOf(s: Array[Double]): Long = {
    val n = s.length
    require(n >= 64, s"audioHash64: need >= 64 samples, got $n")
    val sums = new Array[Double](64)
    val counts = new Array[Int](64)
    var total = 0.0
    var k = 0
    while (k < 64) {
      val lo = k * n / 64
      val hi = (k + 1) * n / 64
      var i = lo
      while (i < hi) { sums(k) += math.abs(s(i)); i += 1 }
      counts(k) = hi - lo
      total += sums(k)
      k += 1
    }
    var hash = 0L
    k = 0
    while (k < 64) {
      if (sums(k) * n >= total * counts(k)) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** [[audioHash64]] plus the peak |sample| as a PCM16 integer, from a
    * single decode — the per-row shape of the audio near-dup scan.
    */
  def audioHash64AndPeak(payload: Array[Byte]): (Long, Int) = {
    val s = decodePcm16(payload).getOrElse(
      throw new IllegalArgumentException("audioHash64AndPeak: payload is not PCM16 audio"))
    var peak = 0.0
    var i = 0
    while (i < s.length) { if (math.abs(s(i)) > peak) peak = math.abs(s(i)); i += 1 }
    (envelopeHashOf(s), math.round(peak * 32768).toInt)
  }

  /** Encode an ANIMATED grayscale GIF — one solid-gray frame per
    * `(w, h, gray)` triple — via the pure-JDK `javax.imageio` GIF writer
    * (`writeToSequence`). Grayscale frames palettize losslessly (the
    * 256-gray palette holds every value exactly), so decode(encode(x))
    * round-trips bit-exact — the property the multimodal_frames_real
    * oracle arithmetic depends on (verified per-value in
    * MediaPipelineSpec).
    */
  def encodeGifGray(frames: Seq[(Int, Int, Int)]): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (w, h, gray) =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g2 = img.createGraphics()
        g2.setColor(new java.awt.Color(gray, gray, gray))
        g2.fillRect(0, 0, w, h)
        g2.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** REAL per-frame decode of an animated GIF: `(width, height, gray of
    * pixel(0,0))` for every frame, via the JDK GIF `ImageReader`
    * (`getNumImages(true)` + indexed `read`) — the frame-extraction
    * stage of a video-ish pipeline with an actual container codec, not
    * byte chunking. Throws on non-GIF payloads.
    */
  def decodeGifFrames(payload: Array[Byte]): Seq[(Int, Int, Int)] = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      (0 until reader.getNumImages(true)).map { i =>
        val img = reader.read(i)
        (img.getWidth, img.getHeight, img.getRGB(0, 0) & 0xff)
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** Encode mono 16-bit little-endian PCM WAV (44-byte RIFF header). */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }
}
