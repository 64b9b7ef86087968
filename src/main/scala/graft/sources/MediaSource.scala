package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, StringContains, StringEndsWith, StringStartsWith}
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
  *   - FILTERS AND LIMIT PUSH INTO THE LISTING
  *     ([[MediaScanBuilder.pushFilters]]): `path` string predicates and
  *     `size`/`mtime_ms` comparisons drop files during the walk — a
  *     `path` PREFIX predicate prunes whole subtrees before descent
  *     (`SKIP_SUBTREE`), so a query over one collection never lists its
  *     million siblings — and a pushed LIMIT terminates the walk after
  *     enough surviving files. Residual filters stay with Spark.
  *
  * Driver work is at most ONE directory walk (sorted for determinism);
  * bytes stay inside their task — the source never shuffles.
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

  /** Test observability: files surfaced by the most recent directory
    * walk (after pushed-filter pruning — a skipped subtree never
    * counts). Spark may plan a scan more than once, so this is a
    * per-walk figure, not a running total. */
  val filesListedLastWalk = new AtomicLong(0)

  /** Which pushed filters the walk can evaluate: path string predicates
    * and size/mtime comparisons. Everything else stays with Spark. */
  private[sources] def supportedFilter(f: Filter): Boolean = f match {
    case EqualTo(a, _) => a == "path" || a == "size" || a == "mtime_ms"
    case StringStartsWith("path", _) | StringEndsWith("path", _) |
         StringContains("path", _) => true
    case GreaterThan(a, _) => a == "size" || a == "mtime_ms"
    case GreaterThanOrEqual(a, _) => a == "size" || a == "mtime_ms"
    case LessThan(a, _) => a == "size" || a == "mtime_ms"
    case LessThanOrEqual(a, _) => a == "size" || a == "mtime_ms"
    case _ => false
  }

  private[sources] def eval(f: Filter, file: MediaFile): Boolean = {
    def num(a: String): Long = if (a == "size") file.size else file.mtimeMs
    f match {
      case EqualTo("path", v) => file.path == v.toString
      case EqualTo(a, v) => num(a) == v.asInstanceOf[Number].longValue
      case StringStartsWith("path", p) => file.path.startsWith(p)
      case StringEndsWith("path", s) => file.path.endsWith(s)
      case StringContains("path", s) => file.path.contains(s)
      case GreaterThan(a, v) => num(a) > v.asInstanceOf[Number].longValue
      case GreaterThanOrEqual(a, v) => num(a) >= v.asInstanceOf[Number].longValue
      case LessThan(a, v) => num(a) < v.asInstanceOf[Number].longValue
      case LessThanOrEqual(a, v) => num(a) <= v.asInstanceOf[Number].longValue
      case _ => true
    }
  }
}

class MediaTable(schema: StructType) extends Table with SupportsRead {
  override def name(): String = "media"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
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
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {
  private var required: StructType = MediaSource.schemaFor(decode)
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(MediaSource.supportedFilter)
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  /** Partial push: the walk stops after `limit` surviving files; Spark
    * keeps its own global limit on top. */
  override def pushLimit(l: Int): Boolean = { limit = l; false }
  override def build(): Scan =
    new MediaScan(path, decode, targetBytes, required, pushed, limit)
}

/** One file's driver-side listing entry. */
final case class MediaFile(path: String, size: Long, mtimeMs: Long)

/** Streaming high-water mark: the max `(mtime_ms, path)` key claimed.
  * Serialized as `<mtime>:<path>` — the numeric field comes first, so
  * the first `:` splits unambiguously whatever the path contains. */
final case class MediaOffset(mtime: Long, path: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"$mtime:$path"
}

object MediaOffset {
  def parse(json: String): MediaOffset = {
    val i = json.indexOf(':')
    MediaOffset(json.substring(0, i).toLong, json.substring(i + 1))
  }
}

final case class MediaFilesPartition(files: Array[MediaFile]) extends InputPartition

class MediaScan(path: String, decode: String, targetBytes: Long,
    required: StructType, filters: Array[Filter], limit: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** STREAMING read — the landing-zone shape: a crawl keeps dropping
    * files into the tree, each micro-batch picks up the files that
    * arrived since the last offset. The offset is the max
    * `(mtime_ms, path)` key processed so far (lexicographic on the
    * pair), so the tree only needs to be APPEND-ONLY: new files carry
    * a later mtime (or a greater path at the same millisecond) and are
    * claimed exactly once; rewrites of already-claimed files are
    * deliberately NOT re-emitted. Pushed column pruning and filters
    * apply unchanged — each trigger's walk prunes subtrees and skips
    * payload reads exactly like the batch path. */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new MediaStream

  private def keyGt(a: MediaFile, m: Long, p: String): Boolean =
    a.mtimeMs > m || (a.mtimeMs == m && a.path > p)

  final class MediaStream
      extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
    import org.apache.spark.sql.connector.read.streaming.Offset
    override def initialOffset(): Offset = MediaOffset(-1L, "")
    override def deserializeOffset(json: String): Offset = MediaOffset.parse(json)
    override def latestOffset(): Offset = {
      val fs = listFiles()
      if (fs.isEmpty) MediaOffset(-1L, "")
      else {
        val m = fs.maxBy(f => (f.mtimeMs, f.path))
        MediaOffset(m.mtimeMs, m.path)
      }
    }
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val s = start.asInstanceOf[MediaOffset]
      val e = end.asInstanceOf[MediaOffset]
      pack(listFiles().filter(f =>
        keyGt(f, s.mtime, s.path) && !keyGt(f, e.mtime, e.path)))
    }
    override def createReaderFactory(): PartitionReaderFactory =
      MediaScan.this.createReaderFactory()
  }

  /** One sorted recursive walk with pushed filters applied AT THE
    * LISTING: a `path` prefix predicate prunes whole subtrees before
    * descent, per-file predicates drop entries before they reach a
    * partition, and a pushed limit stops the walk after enough
    * surviving files. */
  private def listFiles(): Array[MediaFile] = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(root))
      throw new IllegalArgumentException(s"media source path is not a directory: $path")
    val prefixes = filters.collect { case StringStartsWith("path", p) => p }
    // a directory can contain matches iff for every required prefix p,
    // some path starting with dir+sep can start with p — i.e. dir+sep
    // and p are prefix-compatible in either direction
    def dirCanMatch(dir: String): Boolean = prefixes.forall { p =>
      val ds = dir + java.io.File.separator
      ds.startsWith(p) || p.startsWith(ds)
    }
    val found = scala.collection.mutable.ArrayBuffer.empty[MediaFile]
    var remaining = if (limit >= 0) limit else Int.MaxValue
    java.nio.file.Files.walkFileTree(root, new java.nio.file.SimpleFileVisitor[java.nio.file.Path] {
      import java.nio.file.{FileVisitResult, Path}
      import java.nio.file.attribute.BasicFileAttributes
      override def preVisitDirectory(d: Path, a: BasicFileAttributes): FileVisitResult =
        if (remaining <= 0) FileVisitResult.TERMINATE
        else if (dirCanMatch(d.toString)) FileVisitResult.CONTINUE
        else FileVisitResult.SKIP_SUBTREE
      override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
        if (remaining <= 0) return FileVisitResult.TERMINATE
        if (a.isRegularFile) {
          val m = MediaFile(f.toString, a.size(), a.lastModifiedTime().toMillis)
          if (filters.forall(MediaSource.eval(_, m))) {
            found += m
            remaining -= 1
          }
        }
        FileVisitResult.CONTINUE
      }
    })
    MediaSource.filesListedLastWalk.set(found.size)
    found.toArray.sortBy(_.path)
  }

  /** Greedy bin-pack by cumulative size (one oversized file → its own
    * partition; small files share). */
  private def pack(files: Array[MediaFile]): Array[InputPartition] = {
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

  override def planInputPartitions(): Array[InputPartition] = pack(listFiles())

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
