package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog.Catalog

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata. The decode step is a clearly-marked STUB
  * (codec libs are not in this container — see `graft.multimodal.Codecs`);
  * the Spark-side contract — schema, batch shape, partition-parallel
  * decode via mapPartitions, metadata extraction — is real and tested
  * (MultimodalSpec).
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("sha", StringType))), nullable = true)))

  /** Binary-column metadata extraction, oracle-checked: documents' text
    * reinterpreted as a binary payload → byte length + digest. At 100 TB
    * this is the "stat pass" over a media corpus: narrow, no shuffle,
    * column-pruned to (doc_id, text).
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    c.ref("documents")
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"))
      .select(
        col("media_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        // DuckDB's md5 only takes VARCHAR; md5 over the UTF-8 bytes of the
        // text equals md5 of the binary payload, so both engines agree.
        md5(col("payload")).as("digest"),
        base64(substring(col("payload"), 1, 8)).as("magic_b64"))
      .orderBy("media_id")
  }

  val binaryMetaSql: String =
    """SELECT doc_id AS media_id,
      |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |       md5(text) AS digest,
      |       to_base64(CAST(substring(text, 1, 8) AS BLOB)) AS magic_b64
      |FROM documents ORDER BY media_id""".stripMargin

  /** The decode/feature-extract pipeline (graft.multimodal.MediaPipeline)
    * over documents-as-binary: mapPartitions stub decode, payload pruned
    * after the stage. The stub derives every feature deterministically
    * from the byte length, so the DuckDB oracle replicates the ENTIRE
    * pipeline — schema, per-row values, row count — end to end.
    */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val media = c.ref("documents")
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
    graft.multimodal.MediaPipeline.decodeFeatures(spark, media).orderBy("media_id")
  }

  val decodeFeaturesSql: String =
    // The format CASE mirrors Codecs.magicFormat for the prefixes that can
    // occur in valid UTF-8 text ('RIFF', 'GIF8' are plain ASCII); the
    // png/jpeg signatures start with 0x89/0xFF which cannot lead a valid
    // UTF-8 string, so 'bin' covers everything else.
    """SELECT doc_id AS media_id,
      |       CASE WHEN text LIKE 'RIFF%' THEN 'riff'
      |            WHEN text LIKE 'GIF8%' THEN 'gif'
      |            ELSE 'bin' END AS format,
      |       CAST(64 + (octet_length(CAST(text AS BLOB)) % 577) AS INT) AS width,
      |       CAST(64 + ((octet_length(CAST(text AS BLOB)) // 7) % 433) AS INT) AS height,
      |       CAST(1 + ((octet_length(CAST(text AS BLOB)) // 11) % 3) AS INT) AS channels,
      |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |       CAST((octet_length(CAST(text AS BLOB)) + 999) // 1000 AS INT) AS n_frames
      |FROM documents ORDER BY media_id""".stripMargin

  /** Frame-sampling fan-out (MediaPipeline.sampleFrames) with the binary
    * frames reduced to their lengths so the oracle can replicate the
    * kept-frame arithmetic: frames of `frameSize` bytes, every `stride`-th
    * kept, re-indexed densely.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val media = c.ref("documents")
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
    graft.multimodal.MediaPipeline.sampleFrames(spark, media, frameSize = 100, stride = 2)
      .select(col("media_id"), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"))
      .orderBy("media_id", "frame_idx")
  }

  val frameSampleSql: String =
    """WITH m AS (SELECT doc_id AS media_id,
      |                  octet_length(CAST(text AS BLOB)) AS n
      |           FROM documents),
      |k AS (SELECT media_id, n,
      |             unnest(range(0, CAST((n + 99) // 100 AS BIGINT), 2)) AS orig_idx
      |      FROM m)
      |SELECT media_id,
      |       CAST(orig_idx // 2 AS INT) AS frame_idx,
      |       CAST(least(100, n - orig_idx * 100) AS BIGINT) AS frame_bytes
      |FROM k ORDER BY media_id, frame_idx""".stripMargin

  /** Resize (thumbnail) pass with the binary output reduced to its
    * length so the oracle can replicate the stub's size contract
    * (`min(n, w*h/64 + 16)`); byte-level stub fidelity is asserted in
    * MediaPipelineSpec against Codecs.resizeStub directly (documents
    * carry non-ASCII text, so a bytewise SQL twin is not UTF-8-safe).
    */
  def resizeMeta(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog(spark, dir)
    val media = c.ref("documents")
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
    graft.multimodal.MediaPipeline.resize(spark, media, w = 64, h = 48)
      .select(col("media_id"), col("n_bytes_in"),
        octet_length(col("resized")).cast("long").as("n_bytes_out"))
      .orderBy("media_id")
  }

  val resizeMetaSql: String =
    """SELECT doc_id AS media_id,
      |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes_in,
      |       CAST(least(octet_length(CAST(text AS BLOB)), 64 * 48 // 64 + 16) AS BIGINT) AS n_bytes_out
      |FROM documents ORDER BY media_id""".stripMargin

  // ---- REAL-codec fixtures ---------------------------------------------------
  // Every 5th doc_id plants an actual PNG (solid color, dimensions and
  // color arithmetic in doc_id) or WAV (constant-amplitude PCM16). Spark
  // DECODES REAL BYTES through ImageIO / AudioSystem; DuckDB recomputes
  // the expected properties arithmetically — so a broken decoder (or a
  // stub silently taking over) fails the row. Encoded byte counts are
  // excluded from the output: PNG/WAV container overhead is not
  // SQL-predictable, and the point is decode(encode(x)) == x.

  import graft.multimodal.Codecs

  private val plantedPngSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType)))

  /** One real PNG per selected doc: w = 16 + id%32, h = 16 + (id/3)%24,
    * solid color (id%256, id*7%256, id*13%256). Executor-side encode —
    * the driver never holds payloads.
    */
  private def plantedPng(spark: SparkSession, dir: String): DataFrame = {
    val ids = Catalog(spark, dir).ref("documents")
      .filter(col("doc_id") % 5 === 0).select(col("doc_id"))
    val rows = ids.rdd.map { r =>
      val id = r.getLong(0)
      Row(id, Codecs.encodePng(
        (16 + id % 32).toInt, (16 + (id / 3) % 24).toInt,
        (id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt))
    }
    spark.createDataFrame(rows, plantedPngSchema)
  }

  /** Real ImageIO decode of planted PNGs through the standard pipeline. */
  def decodeReal(spark: SparkSession, dir: String): DataFrame =
    graft.multimodal.MediaPipeline.decodeFeatures(spark, plantedPng(spark, dir))
      .select(col("media_id"), col("format"), col("width"), col("height"), col("channels"))
      .orderBy("media_id")

  val decodeRealSql: String =
    """SELECT doc_id AS media_id, 'png' AS format,
      |       CAST(16 + doc_id % 32 AS INT) AS width,
      |       CAST(16 + (doc_id // 3) % 24 AS INT) AS height,
      |       CAST(3 AS INT) AS channels
      |FROM documents WHERE doc_id % 5 = 0 ORDER BY media_id""".stripMargin

  /** Real resize: planted PNG → nearest-neighbor 20×12 → re-decode the
    * output PNG and report its dimensions and pixel(0,0) color. Solid
    * input ⇒ any correct resample preserves the color exactly.
    */
  def resizeReal(spark: SparkSession, dir: String): DataFrame = {
    val resized = graft.multimodal.MediaPipeline
      .resize(spark, plantedPng(spark, dir), w = 20, h = 12)
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("out_w", IntegerType, nullable = false),
      StructField("out_h", IntegerType, nullable = false),
      StructField("r", IntegerType, nullable = false),
      StructField("g", IntegerType, nullable = false),
      StructField("b", IntegerType, nullable = false)))
    val rows = resized.rdd.map { row =>
      val (w, h, r, g, b) = Codecs.probeImage(row.getAs[Array[Byte]](2))
      Row(row.getLong(0), w, h, r, g, b)
    }
    spark.createDataFrame(rows, schema).orderBy("media_id")
  }

  val resizeRealSql: String =
    """SELECT doc_id AS media_id,
      |       CAST(20 AS INT) AS out_w, CAST(12 AS INT) AS out_h,
      |       CAST(doc_id % 256 AS INT) AS r,
      |       CAST((doc_id * 7) % 256 AS INT) AS g,
      |       CAST((doc_id * 13) % 256 AS INT) AS b
      |FROM documents WHERE doc_id % 5 = 0 ORDER BY media_id""".stripMargin

  /** Real WAV PCM decode: planted constant-amplitude mono PCM16 at
    * 8 kHz → AudioSystem metadata + bucketed mean |amplitude| (exact
    * dyadic arithmetic, so the double compares bit-equal).
    */
  def audioReal(spark: SparkSession, dir: String): DataFrame = {
    val ids = Catalog(spark, dir).ref("documents")
      .filter(col("doc_id") % 5 === 0).select(col("doc_id"))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("amp", DoubleType, nullable = false)))
    val rows = ids.rdd.map { r =>
      val id = r.getLong(0)
      val n = (64 + id % 128).toInt
      val v = ((id % 1000) * 16).toShort
      val wav = Codecs.encodeWav(Array.fill(n)(v), sampleRate = 8000)
      val meta = Codecs.decodeWav(wav).getOrElse(
        throw new IllegalStateException(s"WAV did not decode for id $id"))
      val amp = Codecs.audioFeatures(wav, dim = 4)(0).toDouble
      Row(id, meta.sampleRate, meta.nSamples, amp)
    }
    spark.createDataFrame(rows, schema).orderBy("media_id")
  }

  val audioRealSql: String =
    """SELECT doc_id AS media_id,
      |       CAST(8000 AS INT) AS sample_rate,
      |       CAST(64 + doc_id % 128 AS BIGINT) AS n_samples,
      |       CAST((doc_id % 1000) * 16 AS DOUBLE) / 32768 AS amp
      |FROM documents WHERE doc_id % 5 = 0 ORDER BY media_id""".stripMargin

  /** REAL animated-GIF frame extraction (replacing byte-chunk framing
    * for the container-codec case): every 5th doc plants an actual
    * multi-frame GIF — `2 + id%4` solid-gray frames of
    * `(8 + id%16) × (8 + (id/5)%8)` with frame k's gray
    * `(id·7 + k·31) % 256` — encoded executor-side with the JDK GIF
    * writer and decoded back frame-BY-frame through the JDK GIF reader
    * ([[graft.multimodal.Codecs.decodeGifFrames]]). The oracle
    * recomputes every frame's dimensions and pixel value arithmetically,
    * so a broken container parse, frame miscount, or palette
    * quantization fails the row. Scale: encode+decode are
    * partition-parallel scan work; one row per frame fans out exactly
    * like production frame sampling.
    */
  def framesReal(spark: SparkSession, dir: String): DataFrame = {
    val ids = Catalog(spark, dir).ref("documents")
      .filter(col("doc_id") % 5 === 0).select(col("doc_id"))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("gray", IntegerType, nullable = false)))
    val rows = ids.rdd.flatMap { r =>
      val id = r.getLong(0)
      val nf = (2 + id % 4).toInt
      val w = (8 + id % 16).toInt
      val h = (8 + (id / 5) % 8).toInt
      val gif = Codecs.encodeGifGray(
        (0 until nf).map(k => (w, h, ((id * 7 + k * 31) % 256).toInt)))
      val frames = Codecs.decodeGifFrames(gif)
      frames.zipWithIndex.map { case ((fw, fh, gray), k) =>
        Row(id, frames.length, k, fw, fh, gray)
      }
    }
    spark.createDataFrame(rows, schema).orderBy("media_id", "frame_idx")
  }

  val framesRealSql: String =
    """WITH m AS (SELECT doc_id AS media_id, 2 + doc_id % 4 AS nf
      |           FROM documents WHERE doc_id % 5 = 0),
      |f AS (SELECT media_id, nf, unnest(range(0, nf)) AS k FROM m)
      |SELECT media_id,
      |       CAST(nf AS INT) AS n_frames,
      |       CAST(k AS INT) AS frame_idx,
      |       CAST(8 + media_id % 16 AS INT) AS width,
      |       CAST(8 + (media_id // 5) % 8 AS INT) AS height,
      |       CAST((media_id * 7 + k * 31) % 256 AS INT) AS gray
      |FROM f ORDER BY media_id, frame_idx""".stripMargin

  /** Image perceptual near-dup via 64-bit average hash over REAL PNG
    * decode. Every 5th doc plants a band-pattern PNG: family = doc_id%8
    * decides WHICH bands are bright (the structure), while per-doc shade
    * jitter (dark = 40+(id/8)%20, bright = 200-(id/40)%20) makes the
    * pixel BYTES differ inside a family. [[Codecs.aHash64]] is invariant
    * to the jitter but not the structure, so images group exactly by
    * family — byte-distinct near-duplicates land in one perceptual
    * bucket (n_shades > 1 proves the members aren't byte-identical).
    * DuckDB recomputes the expected hash arithmetically (band j bright ⇒
    * hash byte j = 0xFF), so a decoder or threshold bug fails the row.
    *
    * Scale shape: hash + shade are per-row scan work on executors
    * (mapPartitions-style RDD stage, payloads never leave their
    * partition); the rollup shuffles 20-byte (hash, shade) rows — the
    * same one-aggregation shape as exact dedup, at any corpus size.
    *
    * LIMITATION: this variant groups by EXACT hash equality (hamming
    * distance 0) — shade jitter inside a planted band pattern. A
    * re-encoded/resized image whose hash differs by 1–3 bits does NOT
    * group here; use [[phashHammingNearDup]] / [[hammingGroups]] for
    * true hamming-distance near-dup.
    */
  def phashNearDup(spark: SparkSession, dir: String): DataFrame = {
    val ids = Catalog(spark, dir).ref("documents")
      .filter(col("doc_id") % 5 === 0).select(col("doc_id"))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false),
      StructField("dark_shade", IntegerType, nullable = false)))
    val rows = ids.rdd.map { r =>
      val id = r.getLong(0)
      val pattern = ((id % 8) * 2 + 1).toInt
      val dark = (40 + (id / 8) % 20).toInt
      val bright = (200 - (id / 40) % 20).toInt
      val png = Codecs.encodeBandPng(16, pattern, dark, bright)
      // pattern has bit 0 set and bits 4-7 clear, so band 7 (rows 14-15)
      // is always dark — probe it for the per-doc shade (single decode)
      val (hash, shade) = Codecs.aHash64AndGray(png, 0, 15)
      Row(id, hash, shade)
    }
    spark.createDataFrame(rows, schema)
      .groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_imgs"), min(col("media_id")).as("representative_id"),
        countDistinct(col("dark_shade")).as("n_shades"))
      .orderBy("representative_id")
  }

  /** The expected-hash layout both perceptual fixtures share: pattern
    * bit j set ⇒ hash byte j = 0xFF (bands for images, sections for
    * audio). One builder so the two oracle twins cannot diverge; planted
    * patterns are (id%8)*2+1 ∈ [1,15], so 4 bytes cover every case.
    */
  private val patternHash64Sql: String =
    (0 until 4).map { j =>
      val bit = 1 << j
      val byte = 255L << (8 * j)
      s"(CASE WHEN (p & $bit) = $bit THEN CAST($byte AS BIGINT) ELSE 0 END)"
    }.mkString("\n       + ")

  val phashNearDupSql: String =
    s"""WITH m AS (
      |  SELECT doc_id, (doc_id % 8) * 2 + 1 AS p,
      |         40 + (doc_id // 8) % 20 AS dark
      |  FROM documents WHERE doc_id % 5 = 0),
      |h AS (
      |  SELECT doc_id, dark,
      |         $patternHash64Sql AS ahash
      |  FROM m)
      |SELECT ahash, count(*) AS n_imgs, min(doc_id) AS representative_id,
      |       count(DISTINCT dark) AS n_shades
      |FROM h GROUP BY 1 ORDER BY representative_id""".stripMargin

  /** Audio perceptual near-dup — [[phashNearDup]]'s twin over REAL WAV
    * PCM16 decode. Every 5th doc plants an 8-section clip (64 samples
    * per section): family = doc_id%8 decides WHICH sections are loud
    * (the structure), per-doc level jitter (loud = (600+(id/8)%50)·16,
    * quiet = (40+(id/40)%20)·16) changes the PCM bytes inside a family.
    * [[Codecs.audioHash64]] is invariant to the jitter but not the
    * structure — clips group exactly by family, and n_levels > 1 proves
    * members are byte-distinct. Section j loud ⇒ its 8 envelope buckets
    * all exceed the clip mean ⇒ hash byte j = 0xFF, so DuckDB recomputes
    * the expected hash arithmetically (same layout as the image hash).
    */
  def audioNearDup(spark: SparkSession, dir: String): DataFrame = {
    val ids = Catalog(spark, dir).ref("documents")
      .filter(col("doc_id") % 5 === 0).select(col("doc_id"))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("envhash", LongType, nullable = false),
      StructField("peak", IntegerType, nullable = false)))
    val rows = ids.rdd.map { r =>
      val id = r.getLong(0)
      val pattern = ((id % 8) * 2 + 1).toInt
      val loud = ((600 + (id / 8) % 50) * 16).toShort
      val quiet = ((40 + (id / 40) % 20) * 16).toShort
      val samples = Array.tabulate(512) { i =>
        if (((pattern >> (i / 64)) & 1) == 1) loud else quiet
      }
      val wav = Codecs.encodeWav(samples, sampleRate = 8000)
      val (hash, peak) = Codecs.audioHash64AndPeak(wav)
      Row(id, hash, peak)
    }
    spark.createDataFrame(rows, schema)
      .groupBy(col("envhash"))
      .agg(count(lit(1)).as("n_clips"), min(col("media_id")).as("representative_id"),
        countDistinct(col("peak")).as("n_levels"))
      .orderBy("representative_id")
  }

  val audioNearDupSql: String =
    s"""WITH m AS (
      |  SELECT doc_id, (doc_id % 8) * 2 + 1 AS p,
      |         (600 + (doc_id // 8) % 50) * 16 AS loud
      |  FROM documents WHERE doc_id % 5 = 0),
      |h AS (
      |  SELECT doc_id, loud,
      |         $patternHash64Sql AS envhash
      |  FROM m)
      |SELECT envhash, count(*) AS n_clips, min(doc_id) AS representative_id,
      |       count(DISTINCT loud) AS n_levels
      |FROM h GROUP BY 1 ORDER BY representative_id""".stripMargin

  // ---- Hamming-banded perceptual near-dup -----------------------------------
  // Exact-hash grouping (phashNearDup above) misses the entire point of a
  // perceptual hash: a re-encoded/resized/cropped image lands 1–3 bits
  // away, not 0. The sub-quadratic public pattern is multi-index hashing
  // (Norouzi et al. 2012) — the same band-then-verify shape as MinHash
  // LSH (Dedup.scala minhashLsh): split the 64-bit hash into d+1 bands;
  // two hashes within hamming distance d must agree EXACTLY on at least
  // one band (pigeonhole), so an exact-match band self-join finds every
  // candidate pair with zero false negatives, and popcount(xor) ≤ d
  // verifies. All-pairs is never materialized.

  /** Group a `(id, hash64)` relation by hamming distance ≤ `maxDist`:
    * general multi-index hashing — band the hash into `bands` pieces
    * with per-band tolerance t = ⌊maxDist / bands⌋ (pigeonhole: if two
    * hashes differ in ≤ maxDist bits, splitting into `bands` pieces
    * leaves at least one piece differing in ≤ t bits — still zero
    * false negatives), probe each band within radius t by XOR-mask
    * enumeration, verify candidates with `bit_count(a ^ b) <= maxDist`,
    * and resolve connected components via [[Dedup.clustersOf]] (driver
    * union-find when the edge set is tiny, distributed min-label past
    * the threshold).
    *
    * `bands` is the corpus-size dial. With m bands of width w = 64/m,
    * expected band-collision candidates are ~m·N²/2^w while the probe
    * enumeration emits Σ_{i≤t} C(w,i) rows per hash per band — so
    * FEWER, WIDER bands trade a small linear enumeration factor for an
    * exponential candidate-volume cut. The default m = maxDist+1 (t=0,
    * pure exact-match bands, e.g. 16-bit bands at d=3) is right up to
    * ~10⁷ distinct hashes; past that, pick m with 64/m ≥ log₂N (e.g.
    * m=2: 32-bit bands, t=1, 33 probe masks — candidate volume drops
    * by 2^16 while probe rows grow 33×). The 8× ScaleProbe records the
    * crossover on a realistic-density corpus.
    *
    * Scale shape: pair work runs over DISTINCT hashes, not rows — a
    * corpus-proportional dup family collapses to one hash row before any
    * join (the same "dedup at signature level" move as MinHash). Band
    * rows are 3×8-byte; the verify join carries only (band-colliding
    * distinct-hash pairs), sub-quadratic by construction.
    * Returns (id, hash, group_rep) — every input row labeled with the
    * min-id of its hamming component.
    */
  def hammingGroups(spark: SparkSession, hashed: DataFrame, idCol: String,
      hashCol: String, maxDist: Int): DataFrame =
    hammingGroupsBanded(spark, hashed, idCol, hashCol, maxDist, maxDist + 1)

  def hammingGroupsBanded(spark: SparkSession, hashed: DataFrame, idCol: String,
      hashCol: String, maxDist: Int, bands: Int): DataFrame = {
    require(bands >= 1 && bands <= 64, s"bands must be in [1, 64], got $bands")
    val tol = maxDist / bands    // per-band radius (pigeonhole-exact)
    val width = 64 / bands       // last band absorbs the remainder bits
    val h = hashed.select(col(idCol).cast("long").as("id"), col(hashCol).as("hash"))
    // Distinct-hash relation: identical hashes group for free (exact
    // dedup); hrep = min id carries the eventual group label.
    val dh = h.groupBy("hash").agg(min(col("id")).as("hrep")).localCheckpoint()
    def bandVal(b: Int): Column = {
      val lo = b * width
      val w = if (b == bands - 1) 64 - lo else width
      val mask = if (w == 64) -1L else (1L << w) - 1L
      shiftrightunsigned(col("hash"), lo).bitwiseAND(lit(mask))
    }
    val banded = dh.select(col("hash"), col("hrep"),
        posexplode(array((0 until bands).map(bandVal): _*)).as(Seq("band", "bval")))
    // Probe side: every band value XOR'd with every mask of popcount
    // ≤ tol over that band's width — a STATIC mask list (data-
    // independent), so the enumeration is one explode of a literal
    // array. t=0 degenerates to the plain exact-match band join.
    val probes =
      if (tol == 0) banded
      else {
        val probeVals = (0 until bands).map { b =>
          val lo = b * width
          val w = if (b == bands - 1) 64 - lo else width
          val masks = hammingMasks(w, tol)
          when(col("band") === b,
            array(masks.map(m => col("bval").bitwiseXOR(lit(m))): _*))
        }.reduceRight(_.otherwise(_))
        banded.select(col("hash"), col("hrep"), col("band"),
          explode(probeVals).as("bval"))
      }
    val a = banded.as("a")
    val b = probes.as("b")
    val edges = a.join(b,
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.hrep") < col("b.hrep"))
      .filter(expr("bit_count(a.hash ^ b.hash)") <= maxDist)
      .select(col("a.hrep").as("id1"), col("b.hrep").as("id2"))
      .distinct()
    val comps = Dedup.clustersOf(spark, edges, 1L << 20)
      .withColumnRenamed("doc_id", "hrep_key")
      .withColumnRenamed("cluster_rep", "comp_rep")
    h.join(dh, "hash")
      .join(comps, col("hrep") === col("hrep_key"), "left")
      .select(col("id"), col("hash"),
        coalesce(col("comp_rep"), col("hrep")).as("group_rep"))
  }

  /** All XOR masks of popcount ≤ `tol` over `w` bits — the radius-`tol`
    * hamming ball around any band value is {bval ^ m : m ∈ masks}.
    * Data-independent, so probe enumeration is one explode of a literal
    * array. Σ_{i≤tol} C(w,i) masks; the require keeps an absurd dial
    * (wide band × deep radius) from silently exploding the plan.
    */
  private[graft] def hammingMasks(w: Int, tol: Int): Seq[Long] = {
    val masks = (0 to tol).flatMap(k =>
      (0 until w).combinations(k).map(_.foldLeft(0L)((m, i) => m | (1L << i))))
    require(masks.length <= 4096,
      s"hamming probe ball too large: C($w, <=$tol) = ${masks.length} masks")
    masks
  }

  /** Oracle query: hamming-banded near-dup over planted 64-bit cell
    * PNGs. Family f = doc_id%8 fixes a base pattern P(f) = (2f+1) |
    * ((~f & 7) << 4) expanded byte-wise (bit j of P ⇒ hash byte j all
    * bright) — every family has exactly 32 bright cells, and any two
    * bases differ in ≥ 2 bytes = 16 bits. Variant v = (doc_id/8)%3
    * flips bit 56 (v=1) or bits 56–57 (v=2) of the planted pattern:
    * 1–2-bit hash differences that EXACT grouping ([[phashNearDup]])
    * can never merge — within a family every pairwise distance ≤ 2,
    * across families ≥ 12, so d = 3 groups exactly by family. Shade
    * jitter keeps the pixel bytes distinct inside a variant. The real
    * decode path runs end-to-end (encode PNG → ImageIO decode →
    * aHash64); DuckDB recomputes groups arithmetically. n_hashes > 1
    * in every group is the proof the fixture defeats exact grouping.
    */
  def phashHammingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val ids = Catalog(spark, dir).ref("documents")
      .filter(col("doc_id") % 5 === 0).select(col("doc_id"))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val rows = ids.rdd.map { r =>
      val id = r.getLong(0)
      val f = (id % 8).toInt
      val p = ((f << 1) | 1) | ((~f & 0x7) << 4)
      var base = 0L
      var j = 0
      while (j < 8) { if (((p >> j) & 1) == 1) base |= 0xFFL << (8 * j); j += 1 }
      val v = ((id / 8) % 3).toInt
      val planted = base ^ (if (v == 0) 0L else if (v == 1) 1L << 56 else 3L << 56)
      val dark = (40 + (id / 24) % 20).toInt
      val bright = (180 + (id / 40) % 20).toInt
      val png = Codecs.encodeCellPng(16, planted, dark, bright)
      Row(id, Codecs.aHash64(png))
    }
    val hashed = spark.createDataFrame(rows, schema)
    hammingGroups(spark, hashed, "media_id", "ahash", maxDist = 3)
      .groupBy(col("group_rep").as("representative_id"))
      .agg(count(lit(1)).as("n_imgs"), countDistinct(col("hash")).as("n_hashes"))
      .orderBy("representative_id")
  }

  val phashHammingSql: String =
    """WITH m AS (SELECT doc_id, doc_id % 8 AS f, (doc_id // 8) % 3 AS v
      |           FROM documents WHERE doc_id % 5 = 0)
      |SELECT min(doc_id) AS representative_id,
      |       count(*) AS n_imgs,
      |       count(DISTINCT v) AS n_hashes
      |FROM m GROUP BY f ORDER BY representative_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_binary_meta" -> (binaryMeta _),
    "multimodal_decode" -> (decodeFeatures _),
    "multimodal_frames" -> (frameSample _),
    "multimodal_resize" -> (resizeMeta _),
    "multimodal_decode_real" -> (decodeReal _),
    "multimodal_resize_real" -> (resizeReal _),
    "multimodal_audio_real" -> (audioReal _),
    "multimodal_frames_real" -> (framesReal _),
    "multimodal_phash_neardup" -> (phashNearDup _),
    "multimodal_phash_hamming" -> (phashHammingNearDup _),
    "multimodal_audio_neardup" -> (audioNearDup _))

  val oracles: Map[String, String] = Map(
    "multimodal_binary_meta" -> binaryMetaSql,
    "multimodal_decode" -> decodeFeaturesSql,
    "multimodal_frames" -> frameSampleSql,
    "multimodal_resize" -> resizeMetaSql,
    "multimodal_decode_real" -> decodeRealSql,
    "multimodal_resize_real" -> resizeRealSql,
    "multimodal_audio_real" -> audioRealSql,
    "multimodal_frames_real" -> framesRealSql,
    "multimodal_phash_neardup" -> phashNearDupSql,
    "multimodal_phash_hamming" -> phashHammingSql,
    "multimodal_audio_neardup" -> audioNearDupSql)
}
