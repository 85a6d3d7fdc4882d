package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** WARC (ISO 28500) record reader — the container CommonCrawl and every
  * large public web corpus actually ships, and therefore the ingest seam a
  * 100 TB training-data pipeline starts from. The reference ingests one
  * JSON block stream (`/root/reference/crawler/blocks.go`); a web-corpus
  * engine additionally needs the archive shape: many records concatenated
  * in one blob, each self-describing via `Content-Length`.
  *
  * Scope: the framing layer — version line, CRLF header block,
  * `Content-Length`-delimited payload octets, CRLF CRLF record separator —
  * which is the part that must be byte-exact (an off-by-one desyncs every
  * later record in the file). HTTP-response header splitting inside a
  * `response` payload is a caller concern (`payload` is returned verbatim).
  *
  * Shape for scale: one typed `mapPartitions` over (id, blob) rows — each
  * archive member parses independently (WARC files are the unit of
  * parallelism in practice: CommonCrawl segments are ~1 GB gzip members),
  * nothing on the driver, records stream out of an iterator without
  * materializing the whole blob's record list.
  */
object WarcIngest {

  final case class WarcRecord(doc_id: Long, rec_idx: Int, warc_type: String,
      target_uri: Option[String], content_length: Long, payload: String)

  /** Parse every record of every blob. `df` must have a LONG id column and
    * a STRING blob column (UTF-8; `Content-Length` counts the payload's
    * UTF-8 octets per the spec). Malformed framing (no terminating blank
    * line, short payload, non-numeric length) fails loudly — a silent skip
    * would desync and mis-attribute payloads.
    */
  def parseRecords(spark: SparkSession, df: DataFrame, idCol: String,
      blobCol: String): Dataset[WarcRecord] = {
    import spark.implicits._
    df.selectExpr(s"CAST($idCol AS LONG)", s"CAST($blobCol AS STRING)")
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, blob) =>
        parseBlob(id, blob.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      })
  }

  private val Version = "WARC/1.0\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Iterator over one blob's records (exposed for direct tests). */
  private[ingest] def parseBlob(id: Long, bytes: Array[Byte]): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = 0
      private var idx = 0
      skipSeparators()

      private def skipSeparators(): Unit =
        while (pos < bytes.length &&
            (bytes(pos) == '\r'.toByte || bytes(pos) == '\n'.toByte)) pos += 1

      override def hasNext: Boolean = pos < bytes.length

      override def next(): WarcRecord = {
        require(startsWithAt(bytes, Version, pos),
          s"blob $id: expected WARC/1.0 version line at offset $pos")
        pos += Version.length
        // header block: CRLF-terminated lines until the empty line
        var warcType: String = null
        var uri: Option[String] = None
        var len = -1L
        var done = false
        while (!done) {
          val eol = indexOfCrlf(bytes, pos, id)
          if (eol == pos) { pos += 2; done = true } // empty line ends headers
          else {
            val line = new String(bytes, pos, eol - pos,
              java.nio.charset.StandardCharsets.UTF_8)
            pos = eol + 2
            val i = line.indexOf(':')
            require(i > 0, s"blob $id: malformed WARC header line '$line'")
            val key = line.substring(0, i).trim.toLowerCase
            val value = line.substring(i + 1).trim
            key match {
              case "warc-type" => warcType = value
              case "warc-target-uri" => uri = Some(value)
              case "content-length" =>
                len = value.toLongOption.getOrElse(
                  sys.error(s"blob $id: non-numeric Content-Length '$value'"))
              case _ => // other headers (WARC-Date, WARC-Record-ID, …) pass through
            }
          }
        }
        require(len >= 0, s"blob $id record $idx: missing Content-Length")
        require(pos + len <= bytes.length,
          s"blob $id record $idx: payload truncated (${bytes.length - pos} < $len)")
        val payload = new String(bytes, pos, len.toInt,
          java.nio.charset.StandardCharsets.UTF_8)
        pos += len.toInt
        skipSeparators() // the record's trailing CRLF CRLF (+ next padding)
        val r = WarcRecord(id, idx, warcType, uri, len, payload)
        idx += 1
        r
      }
    }

  /** Gzipped variant — the shape CommonCrawl actually distributes
    * (`.warc.gz`: each record its own gzip MEMBER, members concatenated so
    * a range request can start at any member boundary). `GZIPInputStream`
    * reads concatenated members natively; after inflation the framing
    * parser above applies unchanged. `df` needs a LONG id column and a
    * BINARY gzip-blob column.
    */
  def parseGzipRecords(spark: SparkSession, df: DataFrame, idCol: String,
      gzCol: String): Dataset[WarcRecord] = {
    import spark.implicits._
    df.selectExpr(s"CAST($idCol AS LONG)", gzCol)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, gz) =>
        parseBlob(id, gunzipAll(gz))
      })
  }

  /** Inflate a (possibly multi-member) gzip blob to one byte array. */
  private[ingest] def gunzipAll(gz: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz), 64 * 1024)
    try in.readAllBytes() finally in.close()
  }

  /** Per-record gzip compression for fixtures/tests (one member per
    * record, the CommonCrawl layout).
    */
  private[graft] def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(record); out.close()
    bos.toByteArray
  }

  private def startsWithAt(hay: Array[Byte], needle: Array[Byte], off: Int): Boolean = {
    if (off + needle.length > hay.length) return false
    var i = 0
    while (i < needle.length) {
      if (hay(off + i) != needle(i)) return false
      i += 1
    }
    true
  }

  private def indexOfCrlf(bytes: Array[Byte], from: Int, id: Long): Int = {
    var i = from
    while (i + 1 < bytes.length) {
      if (bytes(i) == '\r'.toByte && bytes(i + 1) == '\n'.toByte) return i
      i += 1
    }
    sys.error(s"blob $id: unterminated WARC header block")
  }
}
