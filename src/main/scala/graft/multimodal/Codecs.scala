package graft.multimodal

/** Media decode STUBS.
  *
  * Real image/audio/video decode needs codec libraries (javacv/ffmpeg,
  * TwelveMonkeys, javax.imageio plugins) that are NOT present in this
  * container. Each function below is a clearly-marked deterministic fake
  * that derives its outputs from the payload bytes alone, so the
  * surrounding Spark plumbing — schemas, mapPartitions batch shape,
  * partition-parallel decode, column contracts — is real, testable, and
  * oracle-checkable. Swapping a real codec in changes ONLY these
  * function bodies.
  */
object Codecs {

  final case class ImageMeta(width: Int, height: Int, channels: Int, format: String)

  /** STUB image decode: dimensions derived deterministically from the
    * payload (real impl: ImageIO.read / ffmpeg probe).
    */
  def decodeImageStub(payload: Array[Byte]): ImageMeta = {
    // ??? real decode goes here; deterministic fake below (pure
    // arithmetic on the byte length, so the DuckDB oracle can replicate
    // the whole pipeline end-to-end).
    val n = payload.length
    ImageMeta(
      width = 64 + (n % 577),
      height = 64 + ((n / 7) % 433),
      channels = 1 + ((n / 11) % 3),
      format = magicFormat(payload))
  }

  /** STUB format sniffing from magic bytes — this part is real logic
    * (the signatures are public file-format magic numbers).
    */
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

  /** STUB resize: real impl scales pixels; the fake re-hashes the payload
    * to a W*H-independent digest so downstream schema/flow is exercised.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // ??? real resample goes here; deterministic fake below.
    val out = new Array[Byte](math.min(payload.length, w * h / 64 + 16))
    var i = 0
    while (i < out.length) { out(i) = (payload(i % math.max(payload.length, 1)) ^ (w + h)).toByte; i += 1 }
    out
  }

  /** STUB frame sampling: treats the payload as `frameSize`-byte frames
    * and returns every `stride`-th frame (real impl: ffmpeg -vf select).
    */
  def sampleFramesStub(payload: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] = {
    payload.grouped(frameSize).zipWithIndex
      .collect { case (f, i) if i % stride == 0 => f }
      .toSeq
  }

  /** STUB audio feature: fixed-length "embedding" from byte histogram
    * moments (real impl: mel spectrogram → encoder).
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
}
