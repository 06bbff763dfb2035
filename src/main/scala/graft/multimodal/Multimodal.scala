package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata extracted by a
  * partition-batched decode step.
  *
  * The container has no codec libraries, so [[decodeStub]] is a
  * clearly-marked deterministic FAKE standing in for a real decoder
  * (libjpeg/ffmpeg/...). Everything around it — the binary column
  * contract, the `mapPartitions` batching (one decoder instance per
  * partition, not per row — the same shape a JNI/native codec needs),
  * the typed output schema — is the real plumbing a production pipeline
  * would keep while swapping the stub for a codec call.
  *
  * Scale: decode is a narrow per-partition map (no shuffle); payload
  * columns stay off the shuffle path until after metadata extraction so
  * a wide binary column never rides through an exchange.
  */
object Multimodal {

  /** Typed metadata a decoder yields for one payload. */
  final case class MediaMeta(width: Int, height: Int, format: String)

  /** Declared bounding box for the K50 registered resize plan — shared
    * with the oracle mirror so the two can never drift. */
  val ResizeMaxDim = 256

  private val Formats = Array("png", "jpeg", "webp")

  /** FAKE decode — deterministic function of the payload bytes only.
    * A real implementation would parse the container header; the stub
    * derives plausible fields from the byte length so tests and oracle
    * SQL can pin the plumbing end-to-end. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    // 64-bit multiply: n*7 overflows Int for payloads > ~306 MB, which
    // would break the >=1 dimension contract (round-4 review finding)
    MediaMeta(n % 640 + 1, ((n.toLong * 7L) % 480L).toInt + 1, Formats(n % 3))
  }

  /** FAKE feature-extract — 4 deterministic floats per payload (a real
    * pipeline would run an image/audio encoder here). Batched per
    * partition like [[decodeStub]]. */
  def featureStub(payload: Array[Byte]): Array[Float] = {
    val n = payload.length
    Array(n.toFloat, (n % 7).toFloat, (n % 11).toFloat,
      (if (n == 0) 0 else payload(0) & 0xff).toFloat)
  }

  /** Resize planning: clamp metadata to a bounding box preserving
    * aspect ratio (the pure geometry a resize kernel needs; the pixel
    * work itself lives behind the stubbed codec). */
  def resizeStub(m: MediaMeta, maxDim: Int): MediaMeta = {
    require(maxDim >= 1)
    val scale = math.min(1.0, maxDim.toDouble / math.max(m.width, m.height))
    MediaMeta(math.max(1, (m.width * scale).toInt),
      math.max(1, (m.height * scale).toInt), m.format)
  }

  /** Frame-sampling plumbing for video-like payloads: the (fake) frame
    * count is a deterministic function of the byte length
    * (`n_bytes mod 16 + 1`); every `stride`-th frame index is emitted
    * with a per-frame content hash — one row per sampled frame.
    * Declarative explode over a sequence, so the sampler is a codegen'd
    * lateral expansion, not a driver loop. */
  def withFrameSamples(df: DataFrame, stride: Int = 2): DataFrame = {
    require(stride >= 1)
    val frameCount = (length(col("payload")) % 16 + 1).cast("int")
    df
      .select(col("doc_id"), col("payload"), frameCount.as("n_frames"))
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        sha2(concat(col("payload"), lit(":".getBytes("UTF-8")),
          col("frame_idx").cast("string").cast("binary")), 256).as("frame_sha"))
  }

  /** Feature extraction for an (id, payload) DataFrame via the same
    * partition-batched map shape as [[withDecodedMeta]] (one encoder
    * instance per partition) — schema (doc_id, features array<float>).
    * The embedding column this produces is what the ANN stack
    * ([[graft.ops.AnnLsh]]/[[graft.ops.AnnIvf]]) consumes — payload →
    * features → similarity is the full multimodal bridge. */
  def withFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one encoder instance per partition would be initialized here
        it.map { case (id, payload) => (id, featureStub(payload)) }
      }.toDF("doc_id", "features")
  }

  /** Resize planning for an (id, payload) DataFrame — decode + the
    * [[resizeStub]] bounding-box geometry in ONE partition-batched
    * pass (decoder and resize kernel share the per-partition codec
    * instance a real implementation would hold); schema
    * (doc_id, width, height, rs_width, rs_height, format). */
  def withResizePlan(df: DataFrame, maxDim: Int = ResizeMaxDim): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one decoder + resize kernel per partition would live here
        it.map { case (id, payload) =>
          val m = decodeStub(payload)
          val r = resizeStub(m, maxDim)
          (id, m.width, m.height, r.width, r.height, m.format)
        }
      }.toDF("doc_id", "width", "height", "rs_width", "rs_height", "format")
  }

  /** Decode metadata for an (id, payload) DataFrame via a
    * partition-batched map — schema (doc_id, width, height, format). */
  def withDecodedMeta(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      df.select(col("doc_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      // one decoder instance per partition would be initialized here
      it.map { case (id, payload) =>
        val m = decodeStub(payload)
        (id, m.width, m.height, m.format)
      }
    }.toDF("doc_id", "width", "height", "format")
  }
}
