package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.{AdtsHeader, H264Nal, ImageHeader, Mp3Header, Vp9Ivf}

/** The MEDIA SOURCE — the documented codec seam made real as a
  * DataSource V2 BATCH source: `spark.read.format("graft.sources.
  * MediaSource").option("decode", "vp9").load(dir)` scans a directory
  * tree of media files into `(path, size, mtime_ms, bytes, meta)` rows,
  * running the structural decoder AT SCAN TIME inside the partition
  * reader (the Multimodal scaladoc's "decode at scan" deployment shape;
  * a real transform-codec decoder drops into the same dispatch map).
  *
  * Scale design — the two properties that matter at 100 TB of media:
  *
  *   - COLUMN PRUNING REACHES THE FILE READ
  *     ([[MediaScanBuilder.pruneColumns]]): when the projection needs
  *     neither `bytes` nor `meta`, the reader emits rows from directory
  *     metadata alone and NEVER OPENS the file — a `count` or
  *     path/size inventory over petabytes of video costs a directory
  *     listing, not a scan ([[MediaSource.contentReads]] observes this
  *     in-suite). `meta` without `bytes` still reads the file but emits
  *     only the parsed struct, so payloads never enter the row.
  *   - SIZE-BALANCED PARTITIONS: files greedy-bin-pack into partitions
  *     by cumulative byte size (`partitionTargetBytes`, default 128 MiB
  *     — the parquet-scan convention), so one partition per giant file
  *     and many small files per partition, independent of file count.
  *
  * Driver work is ONE directory walk (sorted for determinism); bytes
  * stay inside their task — the source never shuffles.
  */
class MediaSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MediaSource.schemaFor(options.getOrDefault("decode", "none"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MediaTable(schema)
}

object MediaSource {

  /** Structural decoders by option name; the parse function returns the
    * struct row or null. A production transform-codec decoder (FFI into
    * libav) registers here — one entry, nothing else changes. */
  val decoders: Map[String, (StructType, Array[Byte] => InternalRow)] = Map(
    "image" -> ((ImageHeader.ImageMetaExpr.schema, ImageHeader.parseRow _)),
    "mp3" -> ((Mp3Header.Mp3MetaExpr.schema, Mp3Header.parseRow _)),
    "adts" -> ((AdtsHeader.AdtsMetaExpr.schema, AdtsHeader.parseRow _)),
    "h264" -> ((H264Nal.H264MetaExpr.schema, H264Nal.parseRow _)),
    "vp9" -> ((Vp9Ivf.Vp9MetaExpr.schema, Vp9Ivf.parseRow _)))

  def schemaFor(decode: String): StructType = {
    val base = Seq(
      StructField("path", StringType, nullable = false),
      StructField("size", LongType, nullable = false),
      StructField("mtime_ms", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false))
    decode match {
      case "none" => StructType(base)
      case d if decoders.contains(d) =>
        StructType(base :+ StructField("meta", decoders(d)._1, nullable = true))
      case d => throw new IllegalArgumentException(
        s"unknown decode option '$d' (expected none|${decoders.keys.toSeq.sorted.mkString("|")})")
    }
  }

  /** Test observability: file-content reads performed by partition
    * readers (meaningful in local mode, where tasks share the JVM). */
  val contentReads = new AtomicLong(0)
}

class MediaTable(schema: StructType) extends Table with SupportsRead {
  override def name(): String = "media"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("media source requires a path"))
    val decode = options.getOrDefault("decode", "none")
    MediaSource.schemaFor(decode) // validate the option eagerly
    val target = options.getLong("partitionTargetBytes", 128L * 1024 * 1024)
    new MediaScanBuilder(path, decode, target)
  }
}

class MediaScanBuilder(path: String, decode: String, targetBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = MediaSource.schemaFor(decode)
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new MediaScan(path, decode, targetBytes, required)
}

/** One file's driver-side listing entry. */
final case class MediaFile(path: String, size: Long, mtimeMs: Long)

final case class MediaFilesPartition(files: Array[MediaFile]) extends InputPartition

class MediaScan(path: String, decode: String, targetBytes: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** One sorted recursive walk; greedy bin-pack by cumulative size. */
  override def planInputPartitions(): Array[InputPartition] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(root))
      throw new IllegalArgumentException(s"media source path is not a directory: $path")
    val files = java.nio.file.Files.walk(root).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(p => MediaFile(p.toString, java.nio.file.Files.size(p),
        java.nio.file.Files.getLastModifiedTime(p).toMillis))
      .toArray.sortBy(_.path)
    val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    val cur = scala.collection.mutable.ArrayBuffer.empty[MediaFile]
    var curBytes = 0L
    files.foreach { f =>
      if (cur.nonEmpty && curBytes + f.size > targetBytes) {
        parts += MediaFilesPartition(cur.toArray); cur.clear(); curBytes = 0L
      }
      cur += f; curBytes += f.size
    }
    if (cur.nonEmpty) parts += MediaFilesPartition(cur.toArray)
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val dec = decode
    val req = required
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val files = partition.asInstanceOf[MediaFilesPartition].files
      private var i = -1
      private var row: InternalRow = null
      // which columns the projection kept, in its order
      private val cols = req.fields.map(_.name)
      private val needsContent = cols.contains("bytes") || cols.contains("meta")
      private val parseFull: Array[Byte] => InternalRow =
        if (cols.contains("meta")) MediaSource.decoders(dec)._2 else null
      // Catalyst prunes NESTED fields too: the required `meta` struct may
      // be a reordered subset of the decoder's schema, so project the
      // parsed row onto the requested subfields by name.
      private val metaProjection: Array[(Int, DataType)] =
        if (parseFull == null) null
        else {
          val full = MediaSource.decoders(dec)._1
          req.fields.find(_.name == "meta").get.dataType
            .asInstanceOf[StructType].fields.map { f =>
              val j = full.fieldIndex(f.name)
              (j, full.fields(j).dataType)
            }
        }
      private def parse(content: Array[Byte]): InternalRow = {
        val r = parseFull(content)
        if (r == null) null
        else InternalRow.fromSeq(metaProjection.toSeq.map {
          case (j, dt) => if (r.isNullAt(j)) null else r.get(j, dt)
        })
      }

      override def next(): Boolean = {
        i += 1
        if (i >= files.length) return false
        val f = files(i)
        val content: Array[Byte] =
          if (needsContent) {
            MediaSource.contentReads.incrementAndGet()
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f.path))
          } else null
        row = InternalRow.fromSeq(cols.map {
          case "path" => UTF8String.fromString(f.path)
          case "size" => f.size
          case "mtime_ms" => f.mtimeMs
          case "bytes" => content
          case "meta" => parse(content)
        }.toSeq)
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
