package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC-style record shards: the container shape web-scale corpora
  * actually arrive in (CommonCrawl WARC/WET: length-prefixed records
  * concatenated into large shard objects). Two halves:
  *
  *  - [[buildShards]] — serialize (doc_id, text) into record strings
  *    (`WARC/1.0` version line, `WARC-Record-ID` / `Content-Length`
  *    headers, CRLF framing, payload, CRLF CRLF trailer) and concatenate
  *    them in doc_id order into one blob per hash shard. Record layout is
  *    pure Column arithmetic; the ordered concat is the G1 machinery
  *    (array_sort over collected structs), so blobs are
  *    partition-layout-independent byte for byte.
  *  - [[parseShards]] — the honest reader: records are recovered by
  *    reading `Content-Length` and slicing that many BYTES, never by
  *    splitting on a delimiter — a payload containing the literal record
  *    delimiter (or a whole fake record) parses intact. That property is
  *    what the framing exists for, and the s11 roundtrip query proves it
  *    by injecting a fake empty record into every 7th payload.
  *
  * Content-Length counts UTF-8 bytes (`octet_length`), not characters —
  * multi-byte text (the Vietnamese corpus) keeps writer and parser honest.
  *
  * Scale shape: one shuffle to group records into shards (pick `shards`
  * so a blob is an object-store-sized unit — the s9/s10 small-files
  * discipline applied at the record-container level); parsing is one
  * map pass, each blob decoded lazily record-by-record through an
  * iterator (the parser never materializes a blob's record list). The
  * per-shard ordered concat funnels a shard's full payload through one
  * reducer — at 100 TB that is the point (a shard IS a file-sized unit),
  * and blob size is controlled by `shards`, exactly like s9's
  * files-per-leaf knob.
  *
  * Reference seed: the reference reads loose per-doc text files
  * (data_processing/load_documents.py); this is the same ingest boundary
  * re-expressed as the container format a 100 TB corpus would really use.
  */
object Warc {

  private val CrLf = "\r\n"
  /** Version line + trailer framing shared by writer, parser, and the
    * oracle SQL (interpolated, so the three can never drift).
    */
  val VersionLine = "WARC/1.0"
  val IdHeader = "WARC-Record-ID: "
  val LenHeader = "Content-Length: "

  /** One record per row: version line, id + length headers, blank line,
    * payload, blank-line trailer. `Content-Length` is octet_length(payload)
    * — bytes, not chars.
    */
  private def recordCol(idCol: String, payloadCol: String) =
    concat(
      lit(VersionLine + CrLf + IdHeader), col(idCol).cast("string"),
      lit(CrLf + LenHeader), octet_length(col(payloadCol)).cast("string"),
      lit(CrLf + CrLf), col(payloadCol), lit(CrLf + CrLf))

  /** Shard blobs: (shard, blob, n_records), records in `idCol` order
    * within each blob. Null payloads serialize as empty records.
    */
  def buildShards(docs: DataFrame, shards: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    docs
      .select(col(idCol), coalesce(col(textCol), lit("")).as("__payload"))
      .select(col(idCol), pmod(col(idCol), lit(shards.toLong)).as("shard"),
        recordCol(idCol, "__payload").as("__rec"))
      .groupBy(col("shard"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col(idCol), col("__rec")))),
            s => s.getField("__rec")), "").as("blob"),
        count(lit(1)).as("n_records"))
  }

  /** Parse shard blobs back into records: (shard, rec_idx, byte_offset,
    * doc_id, text) with `byte_offset` = the record's byte offset within
    * its blob and `rec_idx` its 0-based position. Length-driven (see
    * object scaladoc); malformed framing fails loudly rather than
    * resyncing on a delimiter.
    */
  def parseShards(shardDf: DataFrame, shardCol: String = "shard",
      blobCol: String = "blob"): DataFrame = {
    val spark = shardDf.sparkSession
    import spark.implicits._
    shardDf
      .select(col(shardCol).cast("long"), col(blobCol))
      .as[(Long, String)]
      .flatMap { case (shard, blob) =>
        val bytes = if (blob == null) Array.emptyByteArray
          else blob.getBytes(UTF_8)
        new Iterator[(Long, Long, Long, Long, String)] {
          private var pos = 0
          private var idx = 0L
          def hasNext: Boolean = pos < bytes.length
          def next(): (Long, Long, Long, Long, String) = {
            val off = pos.toLong
            val headEnd = indexOfBlankLine(bytes, pos)
            val head = new String(bytes, pos, headEnd - pos, UTF_8)
            val lines = head.split("\r\n")
            require(lines.headOption.contains(VersionLine),
              s"bad record at byte $pos of shard $shard: '${lines.headOption}'")
            val id = lines.collectFirst {
              case l if l.startsWith(IdHeader) =>
                l.substring(IdHeader.length).trim.toLong
            }.getOrElse(sys.error(s"no $IdHeader at byte $pos"))
            val len = lines.collectFirst {
              case l if l.startsWith(LenHeader) =>
                l.substring(LenHeader.length).trim.toInt
            }.getOrElse(sys.error(s"no $LenHeader at byte $pos"))
            val payloadStart = headEnd + 4 // skip \r\n\r\n
            require(payloadStart + len + 4 <= bytes.length,
              s"truncated record at byte $pos of shard $shard")
            val text = new String(bytes, payloadStart, len, UTF_8)
            pos = payloadStart + len + 4 // skip payload + \r\n\r\n trailer
            val i = idx; idx += 1
            (shard, i, off, id, text)
          }
        }
      }
      .toDF("shard", "rec_idx", "byte_offset", "doc_id", "text")
  }

  /** First index of \r\n\r\n at or after `from` (start of the blank line
    * ending the header block). Byte scan — framing bytes are ASCII, so
    * scanning raw UTF-8 cannot false-positive inside a multi-byte char.
    */
  private def indexOfBlankLine(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
      i += 1
    }
    sys.error(s"no header terminator after byte $from")
  }
}
