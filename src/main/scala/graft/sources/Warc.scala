package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500) web-archive container source + sink — gate −1 of a
  * crawl pipeline: the format a Common-Crawl-shaped corpus actually
  * arrives in, before [[graft.operators.Html.extract]] ever sees a text
  * column. Generalizes the reference's suffix-filtered container-directory
  * scan (/root/reference/src/index.js:145-146) from `.txt` to the
  * crawl-archive case, the way [[TextSource.readTxtDir]] did for `.txt`.
  *
  * Layout/scale posture:
  *   - A WARC corpus is a directory of `.warc.gz` shards (Common Crawl:
  *     ~1 GB each), every RECORD its own gzip member so readers can
  *     resync on member boundaries. The source reads whole shards via
  *     Spark's `binaryFile` relation — one task per shard, the natural
  *     unit (a shard must be decompressed sequentially anyway), with the
  *     suffix filter pushed down as `pathGlobFilter` so non-archive files
  *     are never opened. `binaryFile` caps a single file at 2 GB — the
  *     shard convention's size, by design; bigger shards should be re-cut
  *     upstream, not streamed through a wider row.
  *   - Record parsing is imperative byte-walking with no relational
  *     structure to push down — the same legitimate `flatMap`-on-bytes
  *     slot as the media decoders ([[graft.operators.Multimodal]]);
  *     everything downstream of the parse (response filter, HTTP slice,
  *     extraction) is Catalyst expressions.
  *   - The sink writes one shard per PARTITION, one gzip member per
  *     record, through the Hadoop FileSystem API (so `dir` may be any
  *     defaultFS-resolvable path, not only local disk) — partition-
  *     parallel, no driver funnel. Java's gzip writes a zero MTIME, so
  *     shard bytes are a pure function of partition content: writes are
  *     deterministic and idempotent per partition.
  *
  * Malformed-input contract (the [[TextSource]] permissive discipline):
  * a record that cannot be framed — bad/missing `WARC/` version line,
  * missing/unparseable `Content-Length`, or a block truncated by EOF —
  * yields a row with `malformed` set (`bad-version` / `bad-length` /
  * `truncated`) and parsing of that shard STOPS (without a trustworthy
  * length there is no safe resync inside a member; the next gzip member
  * starts clean). Well-formed records never carry `malformed`.
  */
object Warc {

  val schema: StructType = StructType(
    Seq(
      StructField("path", StringType),
      StructField("rec_offset", LongType), // offset in the DECOMPRESSED stream
      StructField("warc_type", StringType),
      StructField("record_id", StringType),
      StructField("target_uri", StringType),
      StructField("warc_date", StringType),
      StructField("content_type", StringType),
      StructField("content_length", LongType),
      StructField("block", BinaryType),
      StructField("malformed", StringType)
    )
  )

  // ---------------------------------------------------------------- render

  private val Crlf = "\r\n"

  /** One complete WARC record (headers + block + record separator) as
    * bytes — the writer half of the format, used by the sink and by the
    * deterministic fixtures the oracle replays.
    */
  def renderRecord(
      warcType: String,
      recordId: String,
      targetUri: Option[String],
      warcDate: String,
      contentType: String,
      block: Array[Byte],
      extra: Seq[(String, String)] = Nil
  ): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(Crlf)
    sb.append("WARC-Type: ").append(warcType).append(Crlf)
    sb.append("WARC-Record-ID: ").append(recordId).append(Crlf)
    sb.append("WARC-Date: ").append(warcDate).append(Crlf)
    targetUri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append(Crlf))
    extra.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(Crlf) }
    sb.append("Content-Type: ").append(contentType).append(Crlf)
    sb.append("Content-Length: ").append(block.length).append(Crlf)
    sb.append(Crlf)
    val head = sb.toString.getBytes("UTF-8")
    val out = new ByteArrayOutputStream(head.length + block.length + 4)
    out.write(head)
    out.write(block)
    out.write(s"$Crlf$Crlf".getBytes("UTF-8"))
    out.toByteArray
  }

  /** A `response` record wrapping an HTTP/1.1 200 with an HTML body —
    * the record shape [[responses]] consumes.
    */
  def responseRecord(uri: String, recordId: String, warcDate: String, html: String): Array[Byte] = {
    val body = html.getBytes("UTF-8")
    val http =
      (s"HTTP/1.1 200 OK${Crlf}Content-Type: text/html; charset=utf-8$Crlf" +
        s"Content-Length: ${body.length}$Crlf$Crlf").getBytes("UTF-8")
    val block = new ByteArrayOutputStream(http.length + body.length)
    block.write(http)
    block.write(body)
    renderRecord(
      "response",
      recordId,
      Some(uri),
      warcDate,
      "application/http; msgtype=response",
      block.toByteArray
    )
  }

  // ------------------------------------------------------------------ sink

  /** Write a WARC shard directory: one `part-<partition>.warc.gz` per
    * non-empty partition of `records`, one gzip member per record. The
    * input must carry a `record_bytes: binary` column of fully-rendered
    * records ([[renderRecord]]); the caller owns partitioning/ordering
    * (e.g. `repartition(n, $"g").sortWithinPartitions(...)` for a
    * deterministic layout).
    */
  def write(records: DataFrame, dir: String): Unit = {
    val out = dir
    records
      .select(col("record_bytes"))
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val conf = new org.apache.hadoop.conf.Configuration()
          val path = new org.apache.hadoop.fs.Path(f"$out/part-$pid%05d.warc.gz")
          val fs = path.getFileSystem(conf)
          val os = fs.create(path, true)
          try it.foreach { r =>
            // one gzip member per record: each record independently
            // decompressible, members concatenate into a valid stream
            // (Java gzip writes zero MTIME — member bytes are deterministic)
            val buf = new ByteArrayOutputStream()
            val gz = new GZIPOutputStream(buf)
            gz.write(r.getAs[Array[Byte]](0))
            gz.close()
            buf.writeTo(os)
          } finally os.close()
        }
      }
  }

  // ---------------------------------------------------------------- source

  /** All records of every `*.warc` / `*.warc.gz` shard under `dir` —
    * whole-shard tasks via `binaryFile` (suffix filter pushed down as
    * `pathGlobFilter`), then the per-shard streaming parse.
    */
  def read(spark: SparkSession, dir: String, glob: String = "*.warc*"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(schema)
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))
      .flatMap { r =>
        parseShard(r.getString(0), r.getAs[Array[Byte]](1))
          .map(w =>
            Row(
              w.path,
              w.recOffset,
              w.warcType,
              w.recordId,
              w.targetUri,
              w.warcDate,
              w.contentType,
              w.contentLength,
              w.block,
              w.malformed
            )
          )
      }(enc)
  }

  /** The `response` records of [[read]], with the HTTP block sliced into
    * status / headers / body — Catalyst expressions over the parsed rows
    * (the body split rides the WARC framing's Content-Length, so a body
    * containing `\r\n\r\n` slices correctly: only the FIRST delimiter in
    * the block separates HTTP headers from body). `body_text` decodes
    * UTF-8 (the fixture corpora's charset; production charset sniffing
    * would branch on `http_content_type` here).
    */
  /** Re-spread parsed records when the shard count undershoots the
    * session's parallelism: a gzip member stream parses sequentially per
    * shard (whole-shard tasks are forced), but everything downstream —
    * HTTP slicing, charset decode, extraction — is per-record CPU work
    * that would otherwise run at shard-count parallelism. A real crawl
    * corpus has thousands of ~1 GB shards and skips this exchange; the
    * guard keeps small directories from serializing a 32-core session
    * behind 8 tasks (measured 11.5 s → ~3 s on the 8-shard fixture at
    * 10× data).
    */
  private def respread(spark: SparkSession, recs0: DataFrame): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    if (recs0.rdd.getNumPartitions < p) recs0.repartition(p) else recs0
  }

  def responses(spark: SparkSession, dir: String, glob: String = "*.warc*"): DataFrame =
    httpSlice(
      respread(
        spark,
        read(spark, dir, glob)
          .filter(col("malformed").isNull && col("warc_type") === "response")
      )
    )

  /** The HTTP status/header/body slice over any [[schema]]-shaped record
    * rows (whole-directory scans AND [[fetch]]ed point reads share it) —
    * pure Catalyst expressions, see [[responses]] for the contract.
    */
  def httpSlice(recs: DataFrame): DataFrame = {
    // byte-preserving single-byte charset view for the header scan: every
    // char index in it IS a byte offset into the block
    val latin = expr("decode(block, 'ISO-8859-1')")
    recs
      .withColumn("http_head_len", instr(latin, "\r\n\r\n"))
      .withColumn(
        "http_head",
        when(col("http_head_len") > 0, substring_index(latin, "\r\n\r\n", 1))
      )
      .withColumn(
        "http_status",
        regexp_extract(col("http_head"), "^HTTP/[0-9.]+ (\\d{3})", 1).cast("int")
      )
      .withColumn(
        "http_content_type",
        regexp_extract(col("http_head"), "(?im)^Content-Type:\\s*([^\r\n]*)", 1)
      )
      .withColumn(
        "http_location",
        regexp_extract(col("http_head"), "(?im)^Location:\\s*([^\r\n]*)", 1)
      )
      .withColumn(
        "body_text",
        when(
          col("http_head_len") > 0,
          expr("decode(substring(block, http_head_len + 4), 'UTF-8')")
        ).otherwise(lit(""))
      )
      .select(
        col("path"),
        col("rec_offset"),
        col("record_id"),
        col("target_uri"),
        col("warc_date"),
        col("http_status"),
        col("http_content_type"),
        col("http_location"),
        col("body_text")
      )
  }

  // ------------------------------------------------------------ CDX index

  /** Schema of [[memberIndex]]: one row per gzip MEMBER with its
    * compressed byte extent — the capture-index columns a CDX file
    * carries so a reader can fetch one record from a multi-TB archive
    * with a single ranged read + one-member gunzip.
    */
  val memberSchema: StructType = StructType(
    Seq(
      StructField("path", StringType),
      StructField("member_offset", LongType), // COMPRESSED offset in the shard
      StructField("member_len", LongType), // COMPRESSED member length
      StructField("warc_type", StringType),
      StructField("target_uri", StringType),
      StructField("warc_date", StringType),
      StructField("content_length", LongType),
      StructField("malformed", StringType)
    )
  )

  /** Split a (possibly multi-member) gzip buffer into members:
    * `(compressedOffset, compressedLength, decompressedBytes)`. Walks
    * each member's header (FLG extras skipped per RFC 1952), inflates
    * raw deflate to find the exact compressed extent
    * (`Inflater.getBytesRead` + the 8-byte CRC32/ISIZE trailer), and
    * stops at the first unframeable member (the [[parseShard]] halt
    * discipline — past corruption there is no safe resync).
    */
  private[graft] def gzipMembers(raw: Array[Byte]): Seq[(Long, Long, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Byte])]
    var pos = 0
    var halt = false
    while (!halt && pos + 10 <= raw.length) {
      val start = pos
      if ((raw(pos) & 0xff) != 0x1f || (raw(pos + 1) & 0xff) != 0x8b) halt = true
      else {
        val flg = raw(pos + 3) & 0xff
        var p = pos + 10
        try {
          if ((flg & 4) != 0) { // FEXTRA
            val xlen = (raw(p) & 0xff) | ((raw(p + 1) & 0xff) << 8)
            p += 2 + xlen
          }
          if ((flg & 8) != 0) { while (raw(p) != 0) p += 1; p += 1 } // FNAME
          if ((flg & 16) != 0) { while (raw(p) != 0) p += 1; p += 1 } // FCOMMENT
          if ((flg & 2) != 0) p += 2 // FHCRC
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(raw, p, raw.length - p)
          val bos = new ByteArrayOutputStream(1 << 16)
          val buf = new Array[Byte](1 << 16)
          var truncated = false
          while (!inf.finished() && !truncated) {
            val n = inf.inflate(buf)
            if (n > 0) bos.write(buf, 0, n)
            else if (inf.needsInput()) truncated = true // ran off the buffer mid-member
          }
          val compEnd = p + inf.getBytesRead.toInt + 8 // CRC32 + ISIZE trailer
          inf.end()
          if (truncated || compEnd > raw.length) halt = true
          else {
            out += ((start.toLong, (compEnd - start).toLong, bos.toByteArray))
            pos = compEnd
          }
        } catch {
          case _: ArrayIndexOutOfBoundsException | _: java.util.zip.DataFormatException =>
            halt = true
        }
      }
    }
    out.toSeq
  }

  /** The capture index of a shard directory: one row per gzip member
    * with its COMPRESSED byte extent plus the member's (first) record
    * headers — what a Common-Crawl CDX file stores per capture. Built by
    * one sequential pass over each shard (whole-shard tasks, like
    * [[read]]); consumed by [[fetch]] as ranged point reads. One record
    * per member is the archive convention this engine's sink writes; a
    * multi-record member indexes as its first record.
    */
  def memberIndex(spark: SparkSession, dir: String, glob: String = "*.warc.gz"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(memberSchema)
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))
      .flatMap { r =>
        val path = r.getString(0)
        gzipMembers(r.getAs[Array[Byte]](1)).flatMap { case (off, clen, bytes) =>
          parseShard(path, bytes).headOption.map { w =>
            Row(path, off, clen, w.warcType, w.targetUri, w.warcDate, w.contentLength, w.malformed)
          }
        }
      }(enc)
  }

  /** Ranged point reads: for each index row `(path, member_offset,
    * member_len)`, seek to the member, read exactly its compressed
    * bytes, gunzip, and frame the record — [[schema]]-shaped rows
    * (`rec_offset` is member-relative, i.e. 0). This is the random-
    * access half of the CDX contract: fetching k captures from a 100 TB
    * archive costs k ranged reads of a few KB each, never a shard scan.
    * Hadoop `Configuration` is built once per PARTITION (constructing it
    * per row re-parses the XML resources — measured 7.4 s → ~1.5 s on a
    * 1 352-capture bulk lookup), `FileSystem` instances come from
    * Hadoop's per-scheme cache, and a bulk lookup whose index arrives in
    * fewer partitions than the session's parallelism is re-spread so the
    * point reads fan out across cores.
    */
  def fetch(spark: SparkSession, index: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val rows = index.select(col("path"), col("member_offset"), col("member_len"))
    val par = spark.sparkContext.defaultParallelism
    val spread = if (rows.rdd.getNumPartitions < par) rows.repartition(par) else rows
    spread.mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      it.flatMap { r =>
        val pathStr = r.getString(0)
        val buf = new Array[Byte](r.getLong(2).toInt)
        val p = new org.apache.hadoop.fs.Path(pathStr)
        val in = p.getFileSystem(conf).open(p)
        try {
          in.seek(r.getLong(1))
          in.readFully(buf)
        } finally in.close()
        parseShard(pathStr, buf).map(w =>
          Row(
            w.path,
            w.recOffset,
            w.warcType,
            w.recordId,
            w.targetUri,
            w.warcDate,
            w.contentType,
            w.contentLength,
            w.block,
            w.malformed
          )
        )
      }
    }(enc)
  }

  // ------------------------------------------------------- fixture corpus

  val FixtureDate = "2026-01-01T00:00:00Z"

  /** Deterministic crawl-archive fixture over the documents table, built
    * once per corpus version (fingerprinted + atomic, the [[TextIndex]]
    * recipe): `nShards` real `.warc.gz` shards, each holding whole
    * `doc_id % nShards` groups — per group one `warcinfo` record, then a
    * `request` + `response` pair per document, the response body being
    * the [[graft.operators.Html.dirtyHtml]] page. Pure string/byte
    * concatenation from table columns, so the oracle replays CONSTRUCTION
    * directly from `documents` — a correct source parse must round-trip
    * to exactly the directly-constructed pages.
    */
  /** The fixture archive's PERSISTED CDX asset (the production shape:
    * Common Crawl publishes cdx-*.gz files beside every crawl so readers
    * never re-walk shards): [[memberIndex]] rows + the SURT key, written
    * once per corpus fingerprint. Returns (warcDir, cdxParquetPath).
    * Point lookups then read this small parquet (capture metadata only,
    * no blocks) and pay [[fetch]]'s ranged reads — the shard walk is a
    * one-time build cost, not a per-query one.
    */
  def ensureCdxDir(sfDir: String, docs: DataFrame): (String, String) = {
    val warcDir = ensureFixtureDir(sfDir, docs)
    val dir = graft.operators.Indexes
      .fingerprintDirOn("warc-cdx", sfDir, docs, "doc_id", "text", "v=1")
    graft.operators.Indexes.atomicBuild(dir, "_SUCCESS") { tmp =>
      memberIndex(docs.sparkSession, warcDir)
        .withColumn("surt", graft.operators.Urls.surt(col("target_uri")))
        .write
        .mode("overwrite")
        .parquet(s"$tmp/idx")
      java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
      ()
    }
    (warcDir, s"$dir/idx")
  }

  def ensureFixtureDir(sfDir: String, docs: DataFrame, nShards: Int = 8): String = {
    val dir = graft.operators.Indexes
      .fingerprintDirOn("warc-fixture", sfDir, docs, "doc_id", "text", s"ns=$nShards,v=2")
    graft.operators.Indexes.atomicBuild(dir, "_SUCCESS") { tmp =>
      val spark = docs.sparkSession
      import spark.implicits._
      val pages = graft.operators.Html.dirtyHtml(docs).as[(Long, String)]
      // one gzip member PER RECORD (request and response as separate
      // rows — the sink contract and the archive convention, and what
      // lets memberIndex/fetch treat member == capture): `sub` keeps the
      // request before its response within a doc
      val docRecs = pages.flatMap { case (id, html) =>
        val uri = s"http://example.com/doc/$id"
        val req = renderRecord(
          "request",
          s"<urn:uuid:req-$id>",
          Some(uri),
          FixtureDate,
          "application/http; msgtype=request",
          s"GET /doc/$id HTTP/1.1${Crlf}Host: example.com$Crlf$Crlf".getBytes("UTF-8")
        )
        val resp = responseRecord(uri, s"<urn:uuid:resp-$id>", FixtureDate, html)
        Seq(
          ((id % nShards).toInt, 1, id, 0, req),
          ((id % nShards).toInt, 1, id, 1, resp)
        )
      }
      val infoRecs = docs
        .select((col("doc_id") % nShards).cast("int").as("g"))
        .distinct()
        .as[Int]
        .map { g =>
          (
            g,
            0,
            -1L,
            0,
            renderRecord(
              "warcinfo",
              s"<urn:uuid:info-$g>",
              None,
              FixtureDate,
              "application/warc-fields",
              s"software: graft$Crlf".getBytes("UTF-8")
            )
          )
        }
      val records = docRecs
        .union(infoRecs)
        .toDF("g", "ord", "doc_id", "sub", "record_bytes")
        .repartition(nShards, col("g"))
        .sortWithinPartitions(col("g"), col("ord"), col("doc_id"), col("sub"))
      write(records, tmp)
      java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
      ()
    }
    dir
  }

  /** The fixture's responses parsed back to (doc_id, html) — the input
    * contract of [[graft.operators.Html.extract]], with doc_id recovered
    * from the WARC-Target-URI.
    */
  def fixturePages(spark: SparkSession, dir: String): DataFrame =
    responses(spark, dir)
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        col("body_text").as("html")
      )

  // ----------------------------------------------------------------- WET

  /** One WET `conversion` record (the Common-Crawl extracted-text sidecar
    * convention): `Content-Type: text/plain`, `WARC-Refers-To` naming the
    * response record the text was extracted from, block = UTF-8 text.
    */
  def conversionRecord(
      uri: String,
      recordId: String,
      refersTo: String,
      warcDate: String,
      text: String
  ): Array[Byte] =
    renderRecord(
      "conversion",
      recordId,
      Some(uri),
      warcDate,
      "text/plain",
      text.getBytes("UTF-8"),
      extra = Seq("WARC-Refers-To" -> refersTo)
    )

  /** Write extracted pages as a WET shard directory (`.warc.gz`, one
    * conversion record per page, whole `doc_id % nShards` groups per
    * shard) — the publishable extracted-text sidecar of a processed
    * crawl. Same sink as [[write]]: partition-parallel, one gzip member
    * per record, deterministic bytes.
    */
  def writeWet(pages: DataFrame, dir: String, nShards: Int = 8): Unit = {
    val spark = pages.sparkSession
    import spark.implicits._
    val records = pages
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        (
          (id % nShards).toInt,
          id,
          conversionRecord(
            s"http://example.com/doc/$id",
            s"<urn:uuid:conv-$id>",
            s"<urn:uuid:resp-$id>",
            FixtureDate,
            text
          )
        )
      }
      .toDF("g", "doc_id", "record_bytes")
      .repartition(nShards, col("g"))
      .sortWithinPartitions(col("g"), col("doc_id"))
    write(records, dir)
  }

  /** The `conversion` records of a WET directory, text decoded — the
    * read half of the sidecar round-trip.
    */
  def conversions(spark: SparkSession, dir: String, glob: String = "*.warc*"): DataFrame =
    respread(
      spark,
      read(spark, dir, glob)
        .filter(col("malformed").isNull && col("warc_type") === "conversion")
    )
      .select(
        col("path"),
        col("record_id"),
        col("target_uri"),
        expr("decode(block, 'UTF-8')").as("text")
      )

  /** Deterministic WET fixture: the dirty-page corpus extracted
    * ([[graft.operators.Html.extract]], all-boilerplate pages dropped),
    * published as WET shards once per corpus fingerprint.
    */
  def ensureWetDir(sfDir: String, docs: DataFrame, nShards: Int = 8): String = {
    val dir = graft.operators.Indexes
      .fingerprintDirOn("wet-fixture", sfDir, docs, "doc_id", "text", s"ns=$nShards,v=1")
    graft.operators.Indexes.atomicBuild(dir, "_SUCCESS") { tmp =>
      val pages = graft.operators.Html
        .extract(graft.operators.Html.dirtyHtml(docs))
        .filter(col("n_good") > 0)
        .select(col("doc_id"), col("extracted").as("text"))
      writeWet(pages, tmp, nShards)
      java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
      ()
    }
    dir
  }

  // ------------------------------------------------------------ redirects

  /** A `response` record carrying an HTTP/1.1 301 with a `Location`
    * header and an empty body — the redirect shape [[graft.operators.Redirects]]
    * resolves. `location` may be relative (RFC 7231 permits it; the
    * parser resolves it against the request URI).
    */
  def redirectRecord(uri: String, recordId: String, warcDate: String, location: String): Array[Byte] = {
    val http =
      (s"HTTP/1.1 301 Moved Permanently${Crlf}Location: $location$Crlf" +
        s"Content-Length: 0$Crlf$Crlf").getBytes("UTF-8")
    renderRecord(
      "response",
      recordId,
      Some(uri),
      warcDate,
      "application/http; msgtype=response",
      http
    )
  }

  /** Deterministic redirect-archive fixture: every doc is a response at
    * `http://example.com/doc/<id>`; a doc_id-arithmetic rule makes some
    * of them 301s (priority order — earlier wins):
    *
    *   - id≡7 (mod 16)  → `/doc/(id+8)` — one half of an a↔b CYCLE;
    *   - id≡15 (mod 16) → `/doc/(id-8)` — the other half;
    *   - id≡11 (mod 16) → `http://example.com/ext/<id>` — DANGLING
    *     (a target outside the fetched corpus);
    *   - id≡3 (mod 8)   → `/doc/(id-2)` — a 2-hop chain head (the
    *     target is itself a 1-hop redirect);
    *   - id≡1 (mod 4)   → `/doc/(id-1)` as a RELATIVE Location (RFC
    *     7231) — 1-hop to a terminal 200;
    *   - else a 200 with a tiny body.
    *
    * Cycle halves and chain heads use absolute Locations, the 1-hop rule
    * a relative one, so both resolution paths are exercised.
    */
  def ensureRedirectDir(sfDir: String, docs: DataFrame, nShards: Int = 8): String = {
    val dir = graft.operators.Indexes
      .fingerprintDirOn("redir-fixture", sfDir, docs, "doc_id", "text", s"ns=$nShards,v=1")
    graft.operators.Indexes.atomicBuild(dir, "_SUCCESS") { tmp =>
      val spark = docs.sparkSession
      import spark.implicits._
      val records = docs
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val uri = s"http://example.com/doc/$id"
          val rec =
            if (id % 16 == 7) redirectRecord(uri, s"<urn:uuid:red-$id>", FixtureDate, s"http://example.com/doc/${id + 8}")
            else if (id % 16 == 15) redirectRecord(uri, s"<urn:uuid:red-$id>", FixtureDate, s"http://example.com/doc/${id - 8}")
            else if (id % 16 == 11) redirectRecord(uri, s"<urn:uuid:red-$id>", FixtureDate, s"http://example.com/ext/$id")
            else if (id % 8 == 3) redirectRecord(uri, s"<urn:uuid:red-$id>", FixtureDate, s"http://example.com/doc/${id - 2}")
            else if (id % 4 == 1) redirectRecord(uri, s"<urn:uuid:red-$id>", FixtureDate, s"/doc/${id - 1}")
            else responseRecord(uri, s"<urn:uuid:resp-$id>", FixtureDate, s"<p>ok $id</p>")
          ((id % nShards).toInt, id, rec)
        }
        .toDF("g", "doc_id", "record_bytes")
        .repartition(nShards, col("g"))
        .sortWithinPartitions(col("g"), col("doc_id"))
      write(records, tmp)
      java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
      ()
    }
    dir
  }

  // ----------------------------------------------------------------- WAT

  /** One WAT `metadata` record (the Common-Crawl link-metadata sidecar
    * convention): `Content-Type: application/json`, `WARC-Refers-To`
    * naming the response it describes, block = the JSON envelope. The
    * envelope here is the documented SUBSET
    * `{"url":"…","links":["…",…]}` — the full WAT format nests HTTP
    * headers and more; canonical URLs contain no JSON-significant
    * characters, so assembly is plain concatenation (a production writer
    * over arbitrary metadata would JSON-escape).
    */
  def metadataRecord(
      uri: String,
      recordId: String,
      refersTo: String,
      warcDate: String,
      json: String
  ): Array[Byte] =
    renderRecord(
      "metadata",
      recordId,
      Some(uri),
      warcDate,
      "application/json",
      json.getBytes("UTF-8"),
      extra = Seq("WARC-Refers-To" -> refersTo)
    )

  /** Write per-page WAT envelopes (`doc_id`, `wat` JSON string) as a
    * sidecar shard directory — same partition-parallel sink as [[write]].
    */
  def writeWat(envelopes: DataFrame, dir: String, nShards: Int = 8): Unit = {
    val spark = envelopes.sparkSession
    import spark.implicits._
    val records = envelopes
      .select(col("doc_id"), col("wat"))
      .as[(Long, String)]
      .map { case (id, json) =>
        (
          (id % nShards).toInt,
          id,
          metadataRecord(
            s"http://example.com/doc/$id",
            s"<urn:uuid:wat-$id>",
            s"<urn:uuid:resp-$id>",
            FixtureDate,
            json
          )
        )
      }
      .toDF("g", "doc_id", "record_bytes")
      .repartition(nShards, col("g"))
      .sortWithinPartitions(col("g"), col("doc_id"))
    write(records, dir)
  }

  /** The `metadata` records of a WAT directory, JSON decoded — the read
    * half of the sidecar round-trip.
    */
  def watRecords(spark: SparkSession, dir: String, glob: String = "*.warc*"): DataFrame =
    respread(
      spark,
      read(spark, dir, glob)
        .filter(col("malformed").isNull && col("warc_type") === "metadata")
    )
      .select(
        col("path"),
        col("record_id"),
        col("target_uri"),
        expr("decode(block, 'UTF-8')").as("wat")
      )

  /** Deterministic WAT fixture: each dirty page's hrefs resolved (RFC
    * 3986) against its archive fetch URI and canonicalized, the sorted
    * distinct link set assembled into the JSON envelope, published as
    * WAT shards once per corpus fingerprint — the link-graph sidecar a
    * crawl publishes beside WARC and WET.
    */
  def ensureWatDir(sfDir: String, docs: DataFrame, nShards: Int = 8): String = {
    val dir = graft.operators.Indexes
      .fingerprintDirOn("wat-fixture", sfDir, docs, "doc_id", "text", s"ns=$nShards,v=1")
    graft.operators.Indexes.atomicBuild(dir, "_SUCCESS") { tmp =>
      import graft.operators.Urls
      val uri = concat(lit("http://example.com/doc/"), col("doc_id"))
      val links = graft.operators.Html
        .dirtyHtml(docs)
        .select(
          col("doc_id"),
          explode(
            regexp_extract_all(col("html"), lit("href=\"([^\"]*)\""), lit(1))
          ).as("href")
        )
        .select(col("doc_id"), Urls.normalizeUrl(Urls.resolveUrl(uri, col("href"))).as("link"))
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_set(col("link"))).as("ls"))
      val envelopes = links.select(
        col("doc_id"),
        concat(
          lit("{\"url\":\"http://example.com/doc/"),
          col("doc_id"),
          lit("\",\"links\":["),
          concat_ws(",", transform(col("ls"), l => concat(lit("\""), l, lit("\"")))),
          lit("]}")
        ).as("wat")
      )
      writeWat(envelopes, tmp, nShards)
      java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$tmp/_SUCCESS"))
      ()
    }
    dir
  }

  // ------------------------------------------------------------- the parse

  private[graft] final case class Rec(
      path: String,
      recOffset: Long,
      warcType: String,
      recordId: String,
      targetUri: String,
      warcDate: String,
      contentType: String,
      contentLength: Long,
      block: Array[Byte],
      malformed: String
  )

  /** Decompress (if gzipped — Java's GZIPInputStream consumes
    * concatenated members natively) and frame every record in a shard.
    */
  private[graft] def parseShard(path: String, raw: Array[Byte]): Seq[Rec] = {
    val bytes =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) {
        val in = new GZIPInputStream(new ByteArrayInputStream(raw), 1 << 16)
        val out = new ByteArrayOutputStream(raw.length * 4)
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } else raw
    val recs = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var pos = 0
    def lineAt(p: Int): (String, Int) = {
      // a header line, CRLF- (or bare-LF-) terminated
      var e = p
      while (e < bytes.length && bytes(e) != '\n') e += 1
      val cut = if (e > p && bytes(e - 1) == '\r') e - 1 else e
      (new String(bytes, p, cut - p, "UTF-8"), math.min(e + 1, bytes.length))
    }
    var halt = false
    while (!halt && pos < bytes.length) {
      // skip inter-record CRLFs
      while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos < bytes.length) {
        val recOff = pos.toLong
        val (version, afterV) = lineAt(pos)
        if (!version.startsWith("WARC/")) {
          recs += Rec(path, recOff, null, null, null, null, null, -1L, null, "bad-version")
          halt = true // no trustworthy length — cannot resync inside this stream
        } else {
          var p = afterV
          val headers = scala.collection.mutable.Map.empty[String, String]
          var open = true
          while (open && p < bytes.length) {
            val (l, np) = lineAt(p)
            p = np
            if (l.isEmpty) open = false
            else {
              val i = l.indexOf(':')
              if (i > 0) headers += (l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
            }
          }
          val len = headers.get("content-length").flatMap(_.toLongOption)
          len match {
            case None =>
              recs += Rec(
                path, recOff,
                headers.getOrElse("warc-type", null),
                headers.getOrElse("warc-record-id", null),
                headers.getOrElse("warc-target-uri", null),
                headers.getOrElse("warc-date", null),
                headers.getOrElse("content-type", null),
                -1L, null, "bad-length"
              )
              halt = true
            case Some(n) if p + n > bytes.length =>
              recs += Rec(
                path, recOff,
                headers.getOrElse("warc-type", null),
                headers.getOrElse("warc-record-id", null),
                headers.getOrElse("warc-target-uri", null),
                headers.getOrElse("warc-date", null),
                headers.getOrElse("content-type", null),
                n, java.util.Arrays.copyOfRange(bytes, p, bytes.length), "truncated"
              )
              halt = true
            case Some(n) =>
              recs += Rec(
                path, recOff,
                headers.getOrElse("warc-type", null),
                headers.getOrElse("warc-record-id", null),
                headers.getOrElse("warc-target-uri", null),
                headers.getOrElse("warc-date", null),
                headers.getOrElse("content-type", null),
                n, java.util.Arrays.copyOfRange(bytes, p, p + n.toInt), null
              )
              pos = p + n.toInt
          }
        }
      }
    }
    recs.toSeq
  }
}
