package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition in bounded batches.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * container): `FakeCodec` writes/parses a deterministic 12-byte header
  * [magic:int][width:int][height:int] + payload. Everything Spark-side —
  * schema, binary column handling, partition-batched decode, metadata
  * projection — is real and is what carries over to a real codec
  * (swap `FakeCodec.decode` for e.g. a JNI image decoder). */
object Multimodal {

  val Magic: Int = 0x47464D4D // "GFMM"

  final case class MediaMeta(id: Long, width: Int, height: Int,
                             payload_len: Int, format: String)

  object FakeCodec {
    def encode(id: Long, width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + payload.length)
      out.putInt(Magic).putInt(width).putInt(height).put(payload)
      out.array()
    }

    /** Parse the header; throws on corrupt magic (surfaced as task error —
      * a real pipeline would route these to a quarantine sink). */
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      require(bytes.length >= 12, s"media blob too short: ${bytes.length}")
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val magic = bb.getInt()
      require(magic == Magic, f"bad magic 0x$magic%08x for id $id")
      MediaMeta(id, bb.getInt(), bb.getInt(), bytes.length - 12, "fake")
    }
  }

  /** Synthesize a deterministic media table from a document table:
    * width/height derived from the id, payload from the content bytes.
    * Mirrors what a real ingest of (id, image_bytes) would look like.
    * @param corruptModulus when > 0, every id divisible by it gets a
    *   CORRUPT blob (flipped magic) — deterministic bad records for
    *   exercising the [[extractMetaTagged]] quarantine path end-to-end
    *   (a real petabyte ingest always carries truncated/bit-rotted
    *   blobs; the contract gate plants them instead of hoping). */
  def synthesizeMedia(docs: DataFrame, corruptModulus: Long = 0L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("id").as[Long], col("content").cast("binary").as[Array[Byte]])
      .map { case (id, bytes) =>
        val w = (id % 48 + 16).toInt
        val h = (id % 32 + 16).toInt
        val payload = java.util.Arrays.copyOf(bytes, math.min(bytes.length, 256))
        val blob = FakeCodec.encode(id, w, h, payload)
        if (corruptModulus > 0 && id % corruptModulus == 0)
          java.nio.ByteBuffer.wrap(blob).putInt(0, Magic ^ 0x5A5A5A5A)
        (id, blob)
      }
      .toDF("id", "media")
  }

  /** Decode/feature-extract: partition-batched metadata extraction over the
    * binary column (the mapInPandas analogue in Scala — one decoder
    * instance per partition, rows streamed through it). */
  def extractMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").as[Long], col("media").as[Array[Byte]])
      .mapPartitions { it =>
        // per-partition decoder state would live here (buffers, JNI handle)
        it.map { case (id, bytes) => FakeCodec.decode(id, bytes) }
      }
      .toDF()
  }

  /** Quarantine-routing decode (the 100-TB ingest shape): corrupt blobs
    * must not kill the task — the reference fails the whole batch on a
    * malformed record (/root/reference/utils/sequence_reader.cu:156-168),
    * which is right for a CLI and wrong for a petabyte ingest. One decode
    * pass emits every row tagged with a nullable `error`; callers split it
    * into the good stream and the quarantine sink. Cache (or checkpoint)
    * the returned frame before splitting so the decode runs once, not once
    * per branch. */
  def extractMetaTagged(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").as[Long], col("media").as[Array[Byte]])
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            // a NULL blob is corrupt input too, not a task-killing NPE
            require(bytes != null, "null media blob")
            val m = FakeCodec.decode(id, bytes)
            (id, m.width, m.height, m.payload_len, m.format, null: String)
          } catch {
            // NonFatal, not just IllegalArgumentException: ANY decoder
            // failure on one blob must route to quarantine, not kill the
            // stage (round-3 review finding)
            case scala.util.control.NonFatal(e) =>
              (id, -1, -1, -1, null: String,
                s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        }
      }
      .toDF("id", "width", "height", "payload_len", "format", "error")
  }

  /** The good rows of [[extractMetaTagged]] (schema == [[extractMeta]]). */
  def goodMeta(tagged: DataFrame): DataFrame =
    tagged.where(col("error").isNull)
      .select("id", "width", "height", "payload_len", "format")

  /** The quarantined rows: (id, error) — written to a quarantine sink and
    * counted into lineage so dropped mass is observable, never silent. */
  def quarantined(tagged: DataFrame): DataFrame =
    tagged.where(col("error").isNotNull).select("id", "error")

  /** Deterministic "frame sample" stand-in: every nth 16-byte slice of the
    * payload becomes one frame row (id, frame_idx, frame_bytes) — the
    * explode-shaped plumbing of video frame sampling. */
  def sampleFrames(media: DataFrame, everyNth: Int = 4): Dataset[(Long, Int, Array[Byte])] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").as[Long], col("media").as[Array[Byte]])
      .flatMap { case (id, bytes) =>
        val payload = java.util.Arrays.copyOfRange(bytes, 12, bytes.length)
        val nFrames = payload.length / 16
        (0 until nFrames by everyNth).map { f =>
          (id, f, java.util.Arrays.copyOfRange(payload, f * 16, f * 16 + 16))
        }
      }
  }
}
