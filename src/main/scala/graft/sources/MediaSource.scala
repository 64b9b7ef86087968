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

import graft.pipeline.{AdtsHeader, GifAnim, H264Nal, ImageHeader, Mp3Header, Mp3L3, Vp9Ivf}

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
  * `listParallelism` fans the walk itself out as Spark jobs in
  * recursive frontier rounds (`listDirBudget` dirs per task, unvisited
  * leftovers re-fanned) for 10⁸-file trees, and `maxListedFiles`
  * fail-fast-guards the driver-side surviving-file array. Bytes stay
  * inside their task — the source never shuffles.
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
    "mp3l3" -> ((Mp3L3.SpectralSchema, Mp3L3.spectralRow _)),
    "adts" -> ((AdtsHeader.AdtsMetaExpr.schema, AdtsHeader.parseRow _)),
    "h264" -> ((H264Nal.H264MetaExpr.schema, H264Nal.parseRow _)),
    "vp9" -> ((Vp9Ivf.Vp9MetaExpr.schema, Vp9Ivf.parseRow _)),
    "gifanim" -> ((GifAnim.metaSchema, GifAnim.metaRow _)),
    "avstruct" -> ((graft.pipeline.StructFingerprint.metaSchema,
      graft.pipeline.StructFingerprint.metaRow _)))

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

  /** Test observability: how many DISTRIBUTED rounds (Spark jobs) the
    * most recent walk used. 0 = the whole listing ran driver-side. */
  val distributedRoundsLastWalk = new AtomicLong(0)

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

  /** A directory can contain matches iff for every required prefix p,
    * some path starting with dir+sep can start with p — i.e. dir+sep
    * and p are prefix-compatible in either direction. */
  private[sources] def dirCanMatch(dir: String, prefixes: Array[String]): Boolean =
    prefixes.forall { p =>
      val ds = dir + java.io.File.separator
      ds.startsWith(p) || p.startsWith(ds)
    }

  /** One pruned recursive walk of `rootDir` — a STATIC method (not a
    * scan-instance closure) so the distributed listing's tasks ship
    * only the filter array, and the same code runs driver-side and
    * executor-side byte for byte. `cap` bounds the surviving-file
    * count (pushed limit); Int.MaxValue = unbounded. */
  private[sources] def walkTree(rootDir: String, prefixes: Array[String],
      filters: Array[Filter], cap: Int): Array[MediaFile] = {
    val found = scala.collection.mutable.ArrayBuffer.empty[MediaFile]
    var remaining = cap
    java.nio.file.Files.walkFileTree(java.nio.file.Paths.get(rootDir),
      new java.nio.file.SimpleFileVisitor[java.nio.file.Path] {
        import java.nio.file.{FileVisitResult, Path}
        import java.nio.file.attribute.BasicFileAttributes
        override def preVisitDirectory(d: Path, a: BasicFileAttributes): FileVisitResult =
          if (remaining <= 0) FileVisitResult.TERMINATE
          else if (dirCanMatch(d.toString, prefixes)) FileVisitResult.CONTINUE
          else FileVisitResult.SKIP_SUBTREE
        override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
          if (remaining <= 0) return FileVisitResult.TERMINATE
          if (a.isRegularFile) {
            val m = MediaFile(f.toString, a.size(), a.lastModifiedTime().toMillis)
            if (filters.forall(eval(_, m))) {
              found += m
              remaining -= 1
            }
          }
          FileVisitResult.CONTINUE
        }
      })
    found.toArray
  }

  /** Budgeted breadth-first walk, the unit of the RECURSIVE distributed
    * listing: visit at most `dirBudget` directories under `rootDir`
    * (pruned by [[dirCanMatch]] before descent, exactly like
    * [[walkTree]]), collecting files that pass `filters` up to `cap`.
    * Directories still queued when the budget runs out are returned
    * UNVISITED so the caller can re-fan them as the next round's tasks —
    * this is what keeps a skewed tree (one giant subtree, or a long
    * single-child chain) from serializing the walk onto one task: any
    * subtree bigger than the budget splits itself. Hitting `cap`
    * instead drops the remainder — a valid partial limit push, same
    * contract as [[walkTree]]. Static for the same reason walkTree is:
    * tasks ship only the filter array, and driver and executor run the
    * identical bytes. */
  private[sources] def walkBudgeted(rootDir: String, prefixes: Array[String],
      filters: Array[Filter], cap: Int,
      dirBudget: Int): (Array[MediaFile], Array[String]) = {
    import scala.jdk.CollectionConverters._
    val found = scala.collection.mutable.ArrayBuffer.empty[MediaFile]
    val queue = scala.collection.mutable.Queue(rootDir)
    var budget = dirBudget
    while (queue.nonEmpty && budget > 0 && found.length < cap) {
      val dir = queue.dequeue()
      budget -= 1
      val stream = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      val children =
        (try stream.iterator().asScala.toArray finally stream.close())
          .sortBy(_.toString)
      var i = 0
      while (i < children.length && found.length < cap) {
        val c = children(i)
        if (java.nio.file.Files.isDirectory(c)) {
          if (dirCanMatch(c.toString, prefixes)) queue += c.toString
        } else if (java.nio.file.Files.isRegularFile(c)) {
          val m = MediaFile(c.toString, java.nio.file.Files.size(c),
            java.nio.file.Files.getLastModifiedTime(c).toMillis)
          if (filters.forall(eval(_, m))) found += m
        }
        i += 1
      }
    }
    val pending = if (found.length >= cap) Array.empty[String] else queue.toArray
    (found.toArray, pending)
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
    // Qualify to an absolute path at construction: the legacy-offset
    // discrimination in [[MediaOffset.parse]] relies on paths never
    // starting with a bare digit run followed by ':', which only holds
    // for absolute paths — enforce the invariant rather than document it.
    val path = Option(options.get("path")).map { p =>
      if (p.contains("://") || p.startsWith("file:")) p
      else java.nio.file.Paths.get(p).toAbsolutePath.toString
    }.getOrElse(
      throw new IllegalArgumentException("media source requires a path"))
    val decode = options.getOrDefault("decode", "none")
    MediaSource.schemaFor(decode) // validate the option eagerly
    val target = options.getLong("partitionTargetBytes", 128L * 1024 * 1024)
    val listPar = options.getInt("listParallelism", 0)
    val slackMs = options.getLong("mtimeSlackMs", 0L)
    val dirBudget = options.getInt("listDirBudget", 4096)
    val maxListed = options.getInt("maxListedFiles", 10 * 1000 * 1000)
    new MediaScanBuilder(path, decode, target, listPar, slackMs, dirBudget,
      maxListed)
  }
}

class MediaScanBuilder(path: String, decode: String, targetBytes: Long,
    listParallelism: Int = 0, mtimeSlackMs: Long = 0L,
    listDirBudget: Int = 4096, maxListedFiles: Int = 10 * 1000 * 1000)
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
    new MediaScan(path, decode, targetBytes, required, pushed, limit,
      listParallelism, mtimeSlackMs, listDirBudget, maxListedFiles)
}

/** One file's driver-side listing entry. */
final case class MediaFile(path: String, size: Long, mtimeMs: Long)

/** Streaming high-water mark: the max `(mtime_ms, path)` key claimed,
  * plus `seq` — a slack-window claim counter that lets the offset
  * advance (and so trigger a micro-batch) when a BACKDATED file lands
  * below the `(mtime, path)` high-water mark (see `mtimeSlackMs`).
  * Serialized as `<mtime>:<seq>:<path>` — the numeric fields come
  * first, so the first two `:` split unambiguously whatever the path
  * contains. */
final case class MediaOffset(mtime: Long, path: String, seq: Long = 0L)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"$mtime:$seq:$path"
}

object MediaOffset {
  /** Tolerant of the pre-`seq` checkpoint format `<mtime>:<path>`: if
    * the segment between the first two `:` is not a plain number, the
    * offset is the legacy two-field form and everything after the
    * first `:` is the path (seq = 0). Unambiguous for absolute paths —
    * they start with `/` or a scheme letter, never a bare digit run
    * followed by `:`. */
  def parse(json: String): MediaOffset = {
    val i = json.indexOf(':')
    val mtime = json.substring(0, i).toLong
    val j = json.indexOf(':', i + 1)
    val mid = if (j < 0) "" else json.substring(i + 1, j)
    if (j >= 0 && mid.nonEmpty && mid.forall(c => c >= '0' && c <= '9'))
      MediaOffset(mtime, json.substring(j + 1), mid.toLong)
    else MediaOffset(mtime, json.substring(i + 1))
  }
}

final case class MediaFilesPartition(files: Array[MediaFile]) extends InputPartition

class MediaScan(path: String, decode: String, targetBytes: Long,
    required: StructType, filters: Array[Filter], limit: Int,
    listParallelism: Int = 0, mtimeSlackMs: Long = 0L,
    listDirBudget: Int = 4096, maxListedFiles: Int = 10 * 1000 * 1000)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** STREAMING read — the landing-zone shape: a crawl keeps dropping
    * files into the tree, each micro-batch picks up the files that
    * arrived since the last offset. The offset is the max
    * `(mtime_ms, path)` key processed so far (lexicographic on the
    * pair), so by default the tree needs to be APPEND-ONLY: new files
    * carry a later mtime (or a greater path at the same millisecond)
    * and are claimed exactly once; rewrites of already-claimed files
    * are deliberately NOT re-emitted. A file landing with an OLDER
    * mtime (clock skew, `mv` into place preserving timestamps) would
    * be silently skipped under that contract — `mtimeSlackMs` relaxes
    * it: each trigger also re-examines the window `[hwm - slack, hwm]`
    * and claims any un-claimed path it finds there, deduplicated
    * against a claim ledger persisted in the stream's checkpoint (so a
    * restart does not re-emit). The ledger only ever holds paths whose
    * mtime is inside the slack window — bounded by arrival rate ×
    * slack, not corpus size. Pushed column pruning and filters apply
    * unchanged; a pushed LIMIT is ignored on the streaming listing
    * (truncating the walk would advance the high-water mark past
    * never-emitted files and lose them permanently). */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new MediaStream(checkpointLocation)

  private def keyGt(a: MediaFile, m: Long, p: String): Boolean =
    a.mtimeMs > m || (a.mtimeMs == m && a.path > p)

  final class MediaStream(checkpointLocation: String)
      extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
    import org.apache.spark.sql.connector.read.streaming.Offset

    /** Claim ledger (slack mode only): path → mtime of every emitted
      * file still inside the slack window, persisted at commit so a
      * restart resumes with the same dedup state. `pending` holds the
      * claims of the batch currently planned-but-uncommitted.
      *
      * Spark hands `checkpointLocation` as a QUALIFIED URI
      * (`file:/tmp/...`, `hdfs://...`), so the ledger is resolved
      * through the Hadoop FileSystem API — the same way Spark's own
      * HDFSMetadataLog keeps its offsets — never through `java.nio`,
      * which would treat the scheme as a relative path segment and
      * silently drop the ledger under the driver's CWD (losing the
      * dedup state on any restart from another directory or host, and
      * breaking non-local checkpoint filesystems outright). */
    private val ledgerPath =
      new org.apache.hadoop.fs.Path(checkpointLocation, "graft-media-claims")
    // MicroBatchStream construction is driver-side, so an active session
    // is the normal case; fall back to the default session and then a
    // bare Configuration rather than failing stream creation with an
    // opaque error if the resuming thread has no active handle. The
    // bare-Configuration leg is safe ONLY for a local checkpoint: for
    // hdfs://, s3a://, etc. it would resolve with DEFAULT Hadoop config
    // (no cluster addresses, no auth), silently binding the claims
    // ledger to the wrong filesystem and degrading exactly-once — so a
    // non-local scheme with no session to borrow config from FAILS
    // loudly instead.
    private val ledgerFs = {
      val sessionConf = org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.sparkContext.hadoopConfiguration)
      val conf = sessionConf.getOrElse {
        val scheme = ledgerPath.toUri.getScheme
        if (scheme != null && scheme != "file")
          throw new IllegalStateException(
            s"MediaSource claim ledger at '$ledgerPath' uses scheme " +
              s"'$scheme' but no SparkSession is available to supply " +
              "Hadoop configuration; refusing to resolve a non-local " +
              "checkpoint filesystem with default config (it would " +
              "silently bind the dedup ledger to the wrong filesystem)")
        new org.apache.hadoop.conf.Configuration()
      }
      ledgerPath.getFileSystem(conf)
    }
    private var claimed: Map[String, Long] =
      if (mtimeSlackMs <= 0L || !ledgerFs.exists(ledgerPath)) Map.empty
      else {
        val in = ledgerFs.open(ledgerPath)
        val text = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        text.linesIterator.filter(_.nonEmpty).map { l =>
          val i = l.indexOf('\t')
          l.substring(i + 1) -> l.substring(0, i).toLong
        }.toMap
      }
    private var pending: Map[String, Long] = Map.empty

    private def inWindow(f: MediaFile, hwmMtime: Long): Boolean =
      f.mtimeMs >= hwmMtime - mtimeSlackMs

    override def initialOffset(): Offset = MediaOffset(-1L, "")
    override def deserializeOffset(json: String): Offset = MediaOffset.parse(json)
    override def latestOffset(): Offset = {
      // streaming NEVER applies the pushed limit to the listing: the
      // high-water mark must come from the full tree
      val fs = listFiles(applyLimit = false)
      if (fs.isEmpty) MediaOffset(-1L, "")
      else {
        val m = fs.maxBy(f => (f.mtimeMs, f.path))
        // seq makes the offset advance when a BACKDATED file lands
        // below an unchanged (mtime, path) hwm: claimed.size + the
        // count of unclaimed in-window files moves exactly when a new
        // claimable path appears (claiming one leaves it constant)
        val seq = if (mtimeSlackMs <= 0L) 0L
          else claimed.size.toLong +
            fs.count(f => inWindow(f, m.mtimeMs) && !claimed.contains(f.path))
        MediaOffset(m.mtimeMs, m.path, seq)
      }
    }
    override def commit(end: Offset): Unit = if (mtimeSlackMs > 0L) {
      val e = end.asInstanceOf[MediaOffset]
      // fold in the committed batch's claims, prune what fell out of
      // the window (those paths can never be re-examined again — the
      // hwm mtime is monotone), persist atomically
      claimed = (claimed ++ pending).filter(_._2 >= e.mtime - mtimeSlackMs)
      pending = Map.empty
      // write-then-rename so a crash mid-write never leaves a torn
      // ledger. FileContext rename(OVERWRITE) is atomic on HDFS; on the
      // local FS (RawLocalFs) overwrite is delete-then-rename, so a
      // crash in that gap can lose the ledger — the same caveat Spark's
      // FileContextBasedCheckpointFileManager carries. The degradation
      // is at-least-once (in-window files may re-emit after such a
      // crash), never data loss.
      val tmp = new org.apache.hadoop.fs.Path(
        ledgerPath.getParent, "graft-media-claims.tmp")
      ledgerFs.mkdirs(ledgerPath.getParent)
      val out = ledgerFs.create(tmp, true)
      try out.write(claimed.map { case (p, m) => s"$m\t$p" }
        .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      org.apache.hadoop.fs.FileContext.getFileContext(ledgerPath.toUri,
          ledgerFs.getConf)
        .rename(tmp, ledgerPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    override def stop(): Unit = ()
    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val s = start.asInstanceOf[MediaOffset]
      val e = end.asInstanceOf[MediaOffset]
      val fs = listFiles(applyLimit = false)
      val emit = fs.filter { f =>
        val inRange = keyGt(f, s.mtime, s.path) && !keyGt(f, e.mtime, e.path)
        // slack rescue: key AT OR BELOW the start hwm, inside the
        // window, never claimed — the backdated arrival
        val rescued = mtimeSlackMs > 0L && !keyGt(f, s.mtime, s.path) &&
          inWindow(f, e.mtime) && !claimed.contains(f.path)
        inRange || rescued
      }
      // every emitted in-window file enters the ledger — otherwise the
      // NEXT batch's rescue clause (its key is then ≤ start) re-emits it
      if (mtimeSlackMs > 0L)
        pending = emit.iterator.filter(inWindow(_, e.mtime))
          .map(f => f.path -> f.mtimeMs).toMap
      pack(emit)
    }
    override def createReaderFactory(): PartitionReaderFactory =
      MediaScan.this.createReaderFactory()
  }

  /** One sorted listing with pushed filters applied AT THE LISTING: a
    * `path` prefix predicate prunes whole subtrees before descent,
    * per-file predicates drop entries before they reach a partition,
    * and a pushed limit stops the walk after enough surviving files.
    *
    * By default the walk is a single driver-side recursive descent —
    * fine to millions of files. `listParallelism` > 0 runs the walk as
    * RECURSIVE frontier rounds (the InMemoryFileIndex approach, plus
    * re-fanning): each round's directories are walked with a per-task
    * budget of `listDirBudget` directories, and whatever a task leaves
    * unvisited becomes the next round's frontier. A round with ≥2
    * directories runs as a Spark job (`listParallelism` tasks); a
    * 1-directory round runs driver-side with a budget of 1 — just that
    * level — so a single-child chain or a one-giant-subtree first level
    * expands into a wide frontier within a couple of cheap rounds
    * instead of serializing the whole walk onto one task. Pushed-filter
    * semantics are identical driver-vs-distributed (spec-asserted, same
    * static walk code both sides). Under the fan-out a pushed limit
    * caps each task's walk and the sorted union is truncated after
    * collect — any `limit` surviving files is a valid partial push
    * (Spark holds the exact global limit).
    *
    * The surviving-file array lives on the driver (it must: partition
    * planning is driver-side), so `maxListedFiles` guards it: a listing
    * that exceeds the guard fails fast with the pushdown remedies
    * rather than silently eating driver memory. */
  private def listFiles(applyLimit: Boolean = true): Array[MediaFile] = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(root))
      throw new IllegalArgumentException(s"media source path is not a directory: $path")
    val prefixes: Array[String] =
      filters.collect { case StringStartsWith("path", p) => p }
    val cap0 = if (applyLimit && limit >= 0) limit else Int.MaxValue
    // the guard bounds every path through here: walks stop at cap
    val cap = math.min(cap0.toLong, maxListedFiles + 1L).toInt
    def guard(n: Int): Unit =
      if (n > maxListedFiles) throw new IllegalStateException(
        s"media listing exceeded maxListedFiles=$maxListedFiles surviving files " +
          s"under $path; push a path/size/mtime filter or a LIMIT, raise the " +
          "option, or split the read by subtree")
    MediaSource.distributedRoundsLastWalk.set(0)
    val found: Array[MediaFile] =
      if (listParallelism <= 0) MediaSource.walkTree(path, prefixes, filters, cap)
      else {
        val fsSer = filters; val pfxSer = prefixes; val capSer = cap
        val budget = listDirBudget
        val sc = org.apache.spark.sql.SparkSession.active.sparkContext
        val acc = scala.collection.mutable.ArrayBuffer.empty[MediaFile]
        var frontier: Array[String] = Array(path)
        var rounds = 0L
        while (frontier.nonEmpty && acc.length < cap) {
          val results: Array[(Array[MediaFile], Array[String])] =
            if (frontier.length < 2)
              // expand one level driver-side to discover parallelism
              frontier.map(MediaSource.walkBudgeted(_, prefixes, filters, cap, 1))
            else {
              rounds += 1
              sc.parallelize(frontier.toSeq.sorted,
                  math.min(listParallelism, frontier.length))
                .map(d => MediaSource.walkBudgeted(d, pfxSer, fsSer, capSer, budget))
                .collect()
            }
          results.foreach { case (fs, _) => acc ++= fs }
          guard(acc.length)
          frontier = results.flatMap(_._2)
        }
        MediaSource.distributedRoundsLastWalk.set(rounds)
        acc.toArray
      }
    guard(found.length)
    val sorted = found.sortBy(_.path)
    val out = if (sorted.length > cap0) sorted.take(cap0) else sorted
    MediaSource.filesListedLastWalk.set(out.length)
    out
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
