package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compressed TEXT ingestion — web corpora arrive gzip-framed (WARC/WET
  * files are concatenated RFC 1952 members), so decompression belongs in
  * the engine as per-row codegen'd expressions, not a driver-side
  * preprocessing step: `gunzip_text(binary)` inflates one-or-many
  * concatenated gzip members to the UTF-8 text (multi-member streams —
  * the WARC layout — decode to the concatenation, the JDK reader's
  * native behavior), and `gzip_text(string)` is the deterministic
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

  /** Inflate concatenated gzip members; null on any corruption. */
  def gunzipBytes(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.length < 18 ||
      (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b) return null
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 8192)
      val out = new ByteArrayOutputStream(bytes.length * 3 + 64)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close()
      out.toByteArray
    } catch {
      case _: java.io.IOException => null // bad CRC, truncation, bad framing
    }
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
