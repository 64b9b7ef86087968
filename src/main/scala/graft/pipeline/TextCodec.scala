package graft.pipeline

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compressed TEXT ingestion — web corpora arrive gzip-framed (WARC/WET
  * files are concatenated RFC 1952 members), so decompression belongs in
  * the engine as per-row codegen'd expressions, not a driver-side
  * preprocessing step: `gunzip_text(binary)` inflates one-or-many
  * concatenated gzip members to the UTF-8 text (multi-member streams —
  * the WARC layout — decode to the concatenation, every member framed
  * and CRC-verified by hand), and `gzip_text(string)` is the deterministic
  * inverse used to construct round-trip gates in-plan (the JDK writer
  * emits a fixed header: MTIME 0, no name/comment, so equal text ⇒
  * equal bytes).
  *
  * Corrupt, truncated, or non-gzip bytes decode to NULL — never a
  * throw, never a silent partial text (a member whose CRC fails is
  * rejected whole). Scale: both are narrow per-row expressions; bytes
  * never leave the task, nothing shuffles.
  */
object TextCodec {

  /** Gzip (one member, deterministic header) of the UTF-8 text. */
  def gzipBytes(text: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(text.length / 2 + 32)
    val gz = new GZIPOutputStream(bos)
    gz.write(text)
    gz.close()
    bos.toByteArray
  }

  /** Inflate concatenated gzip members; null on any corruption.
    *
    * Framed by hand (header fields → `Inflater(nowrap)` → CRC32/ISIZE
    * trailer, member by member) rather than through `GZIPInputStream`:
    * the JDK reader swallows a malformed next-member header as
    * end-of-stream, silently dropping everything after the corruption —
    * exactly the partial-text outcome this decoder must never produce.
    * Here every byte of the input must belong to a fully-verified
    * member; trailing garbage, a truncated second member, a CRC or
    * length mismatch all reject the WHOLE value to null. */
  /** Hard ceiling on decompressed output per value. ISIZE in the trailer
    * is only verifiable AFTER full inflation, so without an in-loop cap a
    * small hostile member (a "gzip bomb" in untrusted WARC/web input)
    * would inflate gigabytes into the per-row buffer before rejection.
    * 64 MiB comfortably covers any real document row; a corpus with
    * larger values should call the explicit-cap overload. */
    val MaxOutputBytes: Long = 64L << 20

  def gunzipBytes(bytes: Array[Byte]): Array[Byte] =
    gunzipBytes(bytes, MaxOutputBytes)

  def gunzipBytes(bytes: Array[Byte], maxOut: Long): Array[Byte] = {
    if (bytes == null || bytes.length < 18) return null
    val out = new ByteArrayOutputStream(bytes.length * 3 + 64)
    var off = 0
    try {
      while (off < bytes.length) {
        off = inflateMember(bytes, off, out, maxOut)
        if (off < 0) return null
      }
      out.toByteArray
    } catch {
      case _: java.io.IOException => null
      case _: java.util.zip.DataFormatException => null
      case _: IndexOutOfBoundsException => null
    }
  }

  /** Decode one RFC 1952 member starting at `off`; append its text to
    * `out` and return the offset just past its trailer, or -1 on any
    * malformation. */
  private def inflateMember(b: Array[Byte], off: Int,
      out: ByteArrayOutputStream, maxOut: Long): Int = {
    var p = off
    def u8(i: Int): Int = b(i) & 0xff
    if (b.length - p < 18) return -1 // header(10) + trailer(8) minimum
    if (u8(p) != 0x1f || u8(p + 1) != 0x8b || u8(p + 2) != 8) return -1
    val flg = u8(p + 3)
    if ((flg & 0xe0) != 0) return -1 // reserved bits must be zero
    p += 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte little-endian length + payload
      if (b.length - p < 2) return -1
      p += 2 + (u8(p) | (u8(p + 1) << 8))
    }
    if ((flg & 8) != 0) { // FNAME: zero-terminated
      while (p < b.length && b(p) != 0) p += 1
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
      while (p < b.length && b(p) != 0) p += 1
      p += 1
    }
    if ((flg & 2) != 0) p += 2 // FHCRC
    if (p >= b.length) return -1
    val inf = new java.util.zip.Inflater(true)
    val crc = new java.util.zip.CRC32
    var size = 0L
    var consumed = 0
    try { // finally-released: DataFormatException is the EXPECTED path
      inf.setInput(b, p, b.length - p) // for corrupt rows; without end()
      val buf = new Array[Byte](8192) //  native zlib memory waits for GC
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
          return -1 // truncated deflate stream (or preset-dict)
        }
        out.write(buf, 0, n)
        crc.update(buf, 0, n)
        size += n
        if (out.size().toLong > maxOut) return -1 // bomb guard (all members)
      }
      consumed = inf.getBytesRead.toInt
    } finally inf.end()
    p += consumed
    if (b.length - p < 8) return -1 // trailer truncated
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
        (u8(i + 3).toLong << 24)) & 0xffffffffL
    if (le32(p) != crc.getValue) return -1
    if (le32(p + 4) != (size & 0xffffffffL)) return -1
    p + 8
  }

  /** UTF8String bridges for codegen call sites. */
  def gzipUtf8(text: UTF8String): Array[Byte] = gzipBytes(text.getBytes)

  def gunzipUtf8(bytes: Array[Byte]): UTF8String = {
    val raw = gunzipBytes(bytes)
    if (raw == null) null else UTF8String.fromBytes(raw)
  }

  /** `gzip_text(string)`: deterministic gzip bytes of the text. */
  case class GzipTextExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gzip_text requires string input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      TextCodec.gzipUtf8(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.pipeline.TextCodec.gzipUtf8($c);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "gzip_text"
  }

  /** `gunzip_text(binary)`: decoded text, null on corrupt/non-gzip. */
  case class GunzipTextExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gunzip_text requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      TextCodec.gunzipUtf8(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.TextCodec.gunzipUtf8($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "gunzip_text"
  }
}
