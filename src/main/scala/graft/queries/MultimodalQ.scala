package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.Multimodal

/** Multimodal (binary-payload) query surface. The payload is the document
  * text's UTF-8 bytes (ASCII-verified corpus), so the DuckDB oracle can
  * reproduce byte-level results through string functions.
  */
object MultimodalQ {

  val all: Seq[Q] = Seq(
    Q(
      "m_meta",
      (s, d) =>
        Multimodal
          .withPayload(Tables.documents(s, d))
          .select(col("doc_id"), col("byte_len"), md5(col("payload")).as("payload_md5"))
          .orderBy("doc_id"),
      Some(
        """SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_len,
          |       md5(text) AS payload_md5
          |FROM documents ORDER BY doc_id""".stripMargin
      ),
      doc = "Binary-column ingest: payload byte length + content digest."
    ),
    Q(
      "m_frames",
      (s, d) =>
        Multimodal
          .sampleFrames(
            Multimodal.withPayload(Tables.documents(s, d)),
            nFrames = 4,
            stride = 64,
            frameLen = 16
          )
          .orderBy("doc_id", "frame_idx"),
      Some(
        """SELECT doc_id, f.frame_idx::BIGINT AS frame_idx,
          |       md5(substr(text, f.frame_idx * 64 + 1, 16)) AS frame_md5
          |FROM documents, (SELECT unnest(generate_series(0, 3)) AS frame_idx) f
          |ORDER BY doc_id, frame_idx""".stripMargin
      ),
      doc = "Strided frame sampling over the binary payload (pure " +
        "expressions; frames past end-of-payload hash the empty slice in " +
        "both engines)."
    ),
    Q(
      "m_decode",
      (s, d) =>
        Multimodal
          .decodeHeaderStub(s, Multimodal.withPayload(Tables.documents(s, d)))
          .toDF()
          .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |  ascii(substr(text, 1, 1))::BIGINT AS format_id,
          |  (ascii(substr(text, 2, 1)) * 256 + ascii(substr(text, 3, 1)))::BIGINT AS width,
          |  (ascii(substr(text, 4, 1)) * 256 + ascii(substr(text, 1, 1)))::BIGINT AS height,
          |  (octet_length(encode(text)) // 64 + 1)::BIGINT AS n_frames
          |FROM documents ORDER BY doc_id""".stripMargin
      ),
      doc = "STUB decoder (mapPartitions batch shape — where a real codec " +
        "plugs in): header bytes → typed MediaMeta columns."
    ),
    Q(
      "m_resize",
      (s, d) =>
        Multimodal
          .resizeStub(Multimodal.withPayload(Tables.documents(s, d)), factor = 2)
          .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |  (octet_length(encode(text)) // 2)::BIGINT AS scaled_len,
          |  md5(array_to_string(list_transform(
          |        generate_series(1, greatest(length(text), 1), 2),
          |        i -> substr(text, i, 1)), '')) AS subsample_md5
          |FROM documents ORDER BY doc_id""".stripMargin
      ),
      doc = "Resize stub: scaled length + digest of the 2:1 byte-subsampled " +
        "payload — the decoder-side downscale's schema and plumbing, " +
        "deterministic without codecs."
    ),
    Q(
      "m_features",
      (s, d) =>
        Multimodal
          .byteFeatures(Multimodal.withPayload(Tables.documents(s, d)))
          .orderBy("doc_id"),
      Some(
        """WITH bytes AS (
          |  SELECT doc_id, unnest(list_transform(
          |           generate_series(1, greatest(length(text), 1)),
          |           i -> ascii(substr(text, i, 1)))) AS b
          |  FROM documents
          |), counts AS (
          |  SELECT doc_id, b, count(*) AS cnt FROM bytes GROUP BY doc_id, b
          |), ranked AS (
          |  SELECT doc_id, b, cnt, max(cnt) OVER (PARTITION BY doc_id) AS mx
          |  FROM counts
          |)
          |SELECT doc_id,
          |  count(*)::BIGINT AS n_distinct_bytes,
          |  min(CASE WHEN cnt = mx THEN b END)::BIGINT AS mode_byte,
          |  sum(b * cnt)::BIGINT AS byte_sum
          |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin
      ),
      doc = "Byte-level feature extraction (distinct bytes, modal byte with " +
        "lowest-wins ties, checksum) — exact integer features via a " +
        "distributed histogram, the shape any per-byte/per-pixel statistic " +
        "takes at scale."
    ),
    Q(
      "m_embed_batch",
      (s, d) => {
        val emb = Multimodal.embedBatchStub(
          s,
          Multimodal.withPayload(Tables.documents(s, d))
        )
        emb
          .select(
            col("doc_id") +:
              (0 until 8).map(j => element_at(col("embedding"), j + 1).as(s"e$j")): _*
          )
          .orderBy("doc_id")
      },
      Some(
        s"""SELECT doc_id,
           |  ${(0 until 8)
            .map(j =>
              s"CAST((('0x' || substr(md5(text || '#$j'), 1, 15))::BIGINT % 2001 - 1000) AS DOUBLE) / 1000.0 AS e$j"
            )
            .mkString(",\n  ")}
           |FROM documents ORDER BY doc_id""".stripMargin
      ),
      doc = "Batched model-inference plumbing: fixed-size batches per model " +
        "call inside mapPartitions (the GPU-amortization contract), with a " +
        "deterministic md5-derived stub vector so the oracle bit-checks " +
        "all 8 components; MultimodalSpec asserts the once-per-batch call " +
        "count via accumulator."
    )
  )
}
