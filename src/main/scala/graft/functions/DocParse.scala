package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the DOCUMENT-corpus ingest face
  * ([[graft.io.DocsIO]]): WARC record splitting and whole-file
  * line decoding, both per-file on executors, both kept as Catalyst
  * expressions so the explode + downstream parse stay in whole-stage
  * codegen — the same shape as [[NtParse.ParseRdfFileExpr]] on the
  * RDF side. A raw training corpus arrives as WARC (Common Crawl) or
  * jsonl(.gz); these are the first hop that turns crawl bytes into
  * rows the cleaning chain ([[graft.pipeline.Scrub]]) can eat. */
object DocParse {

  private val EMPTY = new GenericArrayData(Array.empty[Any])

  /** WARC record: the ISO 28500 frame is `WARC/1.x CRLF headers CRLF
    * CRLF body(Content-Length) CRLF CRLF`. Only the five headers a
    * pipeline routes on are projected; everything else stays in the
    * body bytes. */
  val warcRecordType: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("body", BinaryType, nullable = false)))

  private def headerValue(headers: Map[String, String], k: String): Any =
    headers.get(k).map(UTF8String.fromString).orNull

  /** Static entry point for generated code: split one (possibly
    * gzip-member-concatenated — the Common Crawl layout compresses
    * each record as its own member) WARC file into records. Strict
    * mode throws a positioned per-file error; permissive returns the
    * records parsed before the first bad frame (a torn frame leaves
    * no resynchronization point — Content-Length is the only walk). */
  def parseWarc(path: UTF8String, content: Array[Byte],
                permissive: Boolean): org.apache.spark.sql.catalyst.util.ArrayData = {
    val p = path.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    try {
      val bytes =
        if (p.endsWith(".gz")) {
          val in = graft.io.QuadsIO.wrapDecompress("gz",
            new java.io.ByteArrayInputStream(content))
          try in.readAllBytes() finally in.close()
        } else content
      var pos = 0
      def fail(msg: String) =
        throw new IllegalArgumentException(s"$p: byte $pos: $msg")
      def line(): String = {
        val nl = bytes.indexOf('\n'.toByte, pos)
        if (nl < 0) fail("truncated header line")
        val end = if (nl > pos && bytes(nl - 1) == '\r'.toByte) nl - 1 else nl
        val s = new String(bytes, pos, end - pos,
          java.nio.charset.StandardCharsets.UTF_8)
        pos = nl + 1
        s
      }
      while (pos < bytes.length) {
        // inter-record padding: the frame ends with CRLF CRLF, and
        // some writers pad with extra blank lines
        while (pos < bytes.length &&
          (bytes(pos) == '\r'.toByte || bytes(pos) == '\n'.toByte)) pos += 1
        if (pos < bytes.length) {
          val magic = line()
          if (!magic.startsWith("WARC/")) fail(s"expected WARC/1.x, got '$magic'")
          var headers = Map.empty[String, String]
          var h = line()
          while (h.nonEmpty) {
            val c = h.indexOf(':')
            if (c < 0) fail(s"malformed WARC header '$h'")
            headers += (h.substring(0, c).trim.toLowerCase ->
              h.substring(c + 1).trim)
            h = line()
          }
          val lenStr = headers.getOrElse("content-length",
            fail("missing Content-Length"))
          // toLongOption + Long comparison: a bare .toInt would throw
          // an unpositioned NumberFormatException on a non-numeric
          // value, and a length over 2^31 would wrap negative and
          // slip past the truncation check into copyOfRange
          val lenL = lenStr.toLongOption.getOrElse(
            fail(s"non-numeric Content-Length '$lenStr'"))
          if (lenL < 0) fail(s"negative Content-Length $lenL")
          if (pos.toLong + lenL > bytes.length) fail("truncated record body")
          val len = lenL.toInt
          val body = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
          pos += len
          out += org.apache.spark.sql.catalyst.InternalRow(
            headerValue(headers, "warc-type"),
            headerValue(headers, "warc-record-id"),
            headerValue(headers, "warc-target-uri"),
            headerValue(headers, "warc-date"),
            headerValue(headers, "content-type"),
            body)
        }
      }
      new GenericArrayData(out.toArray)
    } catch {
      // permissive keeps the records parsed BEFORE the first bad
      // frame: Content-Length is the only walk, so there is no
      // resynchronization point after one
      case e: Exception if permissive =>
        val _ = e; new GenericArrayData(out.toArray)
    }
  }

  /** (path, content) → array<warc record struct>. */
  case class ParseWarcExpr(left: Expression, right: Expression,
                           permissive: Boolean) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, BinaryType) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string path, binary content), got $other")
      }
    override def dataType: DataType =
      ArrayType(warcRecordType, containsNull = false)
    override def prettyName: String = "parse_warc"
    override def nullSafeEval(p: Any, c: Any): Any =
      parseWarc(p.asInstanceOf[UTF8String], c.asInstanceOf[Array[Byte]],
        permissive)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (p, c) => s"""
        |${ev.value} = graft.functions.DocParse.parseWarc($p, $c, $permissive);
        """.stripMargin)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def parseWarcCol(path: Column, content: Column,
                   permissive: Boolean = false): Column =
    GraftColumnBridge.column(ParseWarcExpr(
      GraftColumnBridge.expression(path), GraftColumnBridge.expression(content),
      permissive))

  /** Static entry point for generated code: HTTP message → payload
    * (everything after the first CRLF CRLF; the whole body when no
    * header separator exists — a WARC `resource` record carries the
    * payload bare). */
  def httpPayload(body: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < body.length) {
      if (body(i) == '\r'.toByte && body(i + 1) == '\n'.toByte &&
        body(i + 2) == '\r'.toByte && body(i + 3) == '\n'.toByte)
        return java.util.Arrays.copyOfRange(body, i + 4, body.length)
      i += 1
    }
    body
  }

  case class HttpPayloadExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects binary, got $other")
      }
    override def dataType: DataType = BinaryType
    override def prettyName: String = "http_payload"
    override def nullSafeEval(b: Any): Any =
      httpPayload(b.asInstanceOf[Array[Byte]])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b => s"""
        |${ev.value} = graft.functions.DocParse.httpPayload($b);
        """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def httpPayloadCol(body: Column): Column =
    GraftColumnBridge.column(HttpPayloadExpr(GraftColumnBridge.expression(body)))

  /** Static entry point for generated code: decompress (by the path's
    * compression suffix, if recognized) and split a whole file into
    * lines — the jsonl fallback for codecs the distributed text
    * reader cannot decode (zstd/xz/lz4; none splittable, so the
    * one-file-per-task parallelism is identical — only the decoder
    * differs, the same rule as the N-Triples reader). */
  def decodeLines(path: UTF8String, content: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val (_, comp) = graft.io.QuadsIO.splitCompression(path.toString)
    val raw: java.io.InputStream = new java.io.ByteArrayInputStream(content)
    val in = comp.fold(raw)(graft.io.QuadsIO.wrapDecompress(_, raw))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    new GenericArrayData(text.split("\n", -1)
      .map(l => UTF8String.fromString(l.stripSuffix("\r")): Any))
  }

  case class DecodeLinesExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, BinaryType) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string path, binary content), got $other")
      }
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "decode_lines"
    override def nullSafeEval(p: Any, c: Any): Any =
      decodeLines(p.asInstanceOf[UTF8String], c.asInstanceOf[Array[Byte]])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (p, c) => s"""
        |${ev.value} = graft.functions.DocParse.decodeLines($p, $c);
        """.stripMargin)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def decodeLinesCol(path: Column, content: Column): Column =
    GraftColumnBridge.column(DecodeLinesExpr(
      GraftColumnBridge.expression(path), GraftColumnBridge.expression(content)))
}
