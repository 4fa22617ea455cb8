package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Cols._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata.
  *
  * The container has no image/audio codecs, so the DECODE step is an
  * explicitly-marked deterministic STUB ([[decodeHeaderStub]]) — it parses
  * "header" bytes arithmetically the way a real decoder would parse a
  * magic number + dimensions. Everything around it is the real Spark
  * plumbing a production decoder drops into:
  *   - payloads live in a `binary` column next to typed metadata;
  *   - per-record decode runs in `mapPartitions` (one decoder instance per
  *     partition — the batch shape a JNI/FFI codec needs; this is the Scala
  *     analogue of `mapInPandas` batches);
  *   - frame sampling is strided byte-slicing, a pure expression;
  *   - everything downstream (schema, partitioning, joins) is ordinary
  *     columnar Spark.
  */
object Multimodal {

  /** Typed decode result — the schema a real image decoder would emit. */
  case class MediaMeta(
      doc_id: Long,
      format_id: Long,
      width: Long,
      height: Long,
      n_frames: Long
  )

  /** documents → (doc_id, payload: binary, byte_len): the ingest step.
    * In production the payload column arrives from the datalake as-is;
    * here we materialize the document text's UTF-8 bytes as the payload.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      lng(length(col("text").cast(BinaryType))).as("byte_len")
    )

  /** STUB DECODER (deterministic fake): reads the first four "header"
    * bytes as format/width/height, derives a frame count from the payload
    * size. A real decoder replaces ONLY the body of the partition loop.
    */
  def decodeHeaderStub(spark: SparkSession, payloads: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init goes here (decoder handle, scratch buffers)
        it.map { case (docId, bytes) =>
          def b(i: Int): Long = if (i < bytes.length) bytes(i) & 0xffL else 0L
          MediaMeta(
            doc_id = docId,
            format_id = b(0),
            width = b(1) * 256L + b(2),
            height = b(3) * 256L + b(0),
            n_frames = bytes.length / 64L + 1L
          )
        }
      }
  }

  /** Strided frame sampling: `nFrames` slices of `frameLen` bytes taken
    * every `stride` bytes, fingerprinted with md5. Pure expressions —
    * whole-stage codegen, no decoder needed for coverage-style checks.
    */
  def sampleFrames(payloads: DataFrame, nFrames: Int, stride: Int, frameLen: Int): DataFrame =
    payloads
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), lit(nFrames - 1)),
            f => md5(col("payload").substr(f * stride + 1, lit(frameLen)))
          )
        ).as(Seq("frame_idx", "frame_md5"))
      )
      .select(col("doc_id"), lng(col("frame_idx")).as("frame_idx"), col("frame_md5"))
}
