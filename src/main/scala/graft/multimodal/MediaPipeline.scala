package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-side multimodal plumbing over opaque binary payload columns.
  *
  * Decode is REAL for JDK-supported formats (ImageIO images, sampled
  * WAV/AIFF PCM — see Codecs.scala) with deterministic stub fallback for
  * everything else; the surrounding dataflow is the real 100 TB design:
  *
  *  - decode runs inside `mapPartitions` on the columnar scan output —
  *    per-partition batching, no driver involvement, no shuffle;
  *  - the payload column is pruned away right after feature extraction,
  *    so only narrow typed metadata flows further (at 100 TB the binary
  *    column is ~all the bytes — never carry it past the decode stage);
  *  - frame sampling explodes to (media_id, frame_idx, frame) rows,
  *    which is the shape a downstream embedding stage consumes.
  */
object MediaPipeline {

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType),
    StructField("n_frames", IntegerType)))

  /** Decode + feature-extract each payload; binary column does not
    * survive this stage. `frameSize` drives the stub frame count
    * (ceil(n_bytes / frameSize)).
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame, frameSize: Int = 1000): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rows = media.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val meta = Codecs.decodeImage(payload)
        Row(id, meta.format, meta.width, meta.height, meta.channels,
          payload.length.toLong,
          ((payload.length + frameSize - 1) / frameSize))
      }
    }
    spark.createDataFrame(rows, featureSchema)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType)))

  /** Sample frames: one output row per kept frame — the fan-out stage
    * ahead of per-frame embedding. Partition-parallel, no shuffle.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameSize: Int = 1000, stride: Int = 2): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rows = media.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](payloadIdx)
        Codecs.sampleFramesStub(payload, frameSize, stride).zipWithIndex.map {
          case (f, i) => Row(id, i, f)
        }
      }
    }
    spark.createDataFrame(rows, frameSchema)
  }

  val resizeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes_in", LongType, nullable = false),
    StructField("resized", BinaryType)))

  /** Resize each payload to target dimensions (real nearest-neighbor
    * resample for decodable images, stub otherwise — Codecs.resize).
    * Partition-parallel, payload-in/payload-out shape; downstream stages
    * read `resized` instead of the original bytes.
    */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rows = media.rdd.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        Row(r.getLong(idIdx), payload.length.toLong, Codecs.resize(payload, w, h))
      }
    }
    spark.createDataFrame(rows, resizeSchema)
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** Fixed-dimension feature vector per payload (real PCM bucket means
    * for decodable audio, byte-histogram stub otherwise —
    * Codecs.audioFeatures). Output shape feeds the Similarity/Ivf ANN
    * operators directly (same Array[Float] contract as the embeddings
    * table).
    */
  def audioFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): DataFrame = {
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val rows = media.rdd.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        Row(r.getLong(idIdx), Codecs.audioFeatures(payload, dim).toSeq)
      }
    }
    spark.createDataFrame(rows, audioFeatureSchema)
  }
}
