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
    )
  )
}
