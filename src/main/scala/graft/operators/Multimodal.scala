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

  /** "Resize" stub: the deterministic stand-in for a decoder-side
    * downscale — halves the stub-decoded dimensions and fingerprints a
    * 2:1 byte-subsampled payload (every other byte, in order). A real
    * resize replaces the subsample expression with a codec call; the
    * schema, scaling arithmetic, and digest plumbing are what downstream
    * consumers actually depend on.
    */
  def resizeStub(payloads: DataFrame, factor: Int): DataFrame =
    payloads.select(
      col("doc_id"),
      (lng(length(col("payload"))) / factor).cast(LongType).as("scaled_len"),
      md5(
        array_join(
          transform(
            sequence(lit(1), greatest(length(col("payload")), lit(1)), lit(factor)),
            i => col("payload").cast(StringType).substr(i, lit(1))
          ),
          ""
        )
      ).as("subsample_md5")
    )

  /** Feature extraction over the raw bytes — exact integer features only
    * (distinct byte count, modal byte, byte checksum), so the result is
    * engine-independent. The histogram is a distributed explode + count,
    * the shape any per-byte/per-pixel statistic takes at scale.
    */
  def byteFeatures(payloads: DataFrame): DataFrame = {
    val perByte = payloads
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(1), greatest(length(col("payload")), lit(1))),
            i => ascii(col("payload").cast(StringType).substr(i, lit(1)))
          )
        ).as("b")
      )
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    perByte
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast(LongType).as("n_distinct_bytes"),
        max(struct(col("cnt"), (-col("b")).as("nb")))
          .getField("nb")
          .cast(LongType)
          .as("neg_mode_byte"),
        sum(col("b") * col("cnt")).cast(LongType).as("byte_sum")
      )
      .select(
        col("doc_id"),
        col("n_distinct_bytes"),
        (-col("neg_mode_byte")).cast(LongType).as("mode_byte"),
        col("byte_sum")
      )
  }

  /** Batched model-inference plumbing — the batch shape every real
    * embedding/captioning model needs (GPU kernels amortize over a batch,
    * so the model must be invoked once per BATCH, never once per row).
    * Rows are grouped into fixed-size batches inside each partition
    * (`it.grouped`), one "model call" per batch; per-partition init (the
    * session/decoder handle) sits at the top of the partition loop. This is
    * the Scala analogue of a `mapInPandas` batch UDF.
    *
    * The model here is an explicitly-marked deterministic STUB: component
    * j of the vector is `(md5_60(payload ‖ "#j") mod 2001 − 1000) / 1000`,
    * so the DuckDB oracle bit-checks the complete output vectors. A real
    * encoder replaces only the body of `runModelBatch`.
    *
    * `batchCalls` (optional accumulator) counts model invocations so the
    * once-per-batch contract is testable, not just claimed.
    */
  def embedBatchStub(
      spark: SparkSession,
      payloads: DataFrame,
      dim: Int = 8,
      batchSize: Int = 32,
      batchCalls: Option[org.apache.spark.util.LongAccumulator] = None
  ): DataFrame = {
    import spark.implicits._
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init goes here (model session, pinned batch buffers)
        def runModelBatch(batch: Seq[(Long, Array[Byte])]): Seq[(Long, Array[Double])] = {
          batchCalls.foreach(_.add(1))
          batch.map { case (id, bytes) =>
            val v = Array.tabulate(dim) { j =>
              val salted = bytes ++ s"#$j".getBytes(java.nio.charset.StandardCharsets.UTF_8)
              (graft.functions.Md5Exprs.md5Top60(salted) % 2001L - 1000L) / 1000.0
            }
            (id, v)
          }
        }
        it.grouped(batchSize).flatMap(runModelBatch)
      }
      .toDF("doc_id", "embedding")
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
