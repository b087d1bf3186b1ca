package graft.store

import graft.codec._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.TaskContext
import scala.collection.mutable

/** How the writer partitions input before encoding (SURVEY.md §3.3).
  *
  *  - ByKey: explicit range partitioning on a key (north rule: doc_id) —
  *    rows get globally key-sorted row ids; deterministic at any parallelism
  *    because the partition count is fixed, not derived from cores.
  *  - ByKeySalted: range partition on (key, salt) for skewed keys (north
  *    rule: skewed `source` values) — equal keys spread over adjacent
  *    partitions, global key order preserved.
  *  - AsIs: keep the input partitioning/order (pycolumns append semantics —
  *    row id = arrival order).
  */
sealed trait OrderMode
final case class ByKey(key: String, numParts: Int) extends OrderMode
final case class ByKeySalted(key: String, numParts: Int, salts: Int) extends OrderMode
case object AsIs extends OrderMode

/** Row selection (pycolumns util.extract_rows canonical forms,
  * /root/reference/pycolumns/util.py:6-57): everything / slice (with step) /
  * explicit row-id list carrying request positions (gather returns rows in
  * request order via `_pos`, mirroring C `_read_rows_sortind` scatter-back,
  * _column_pywrap.c:616-668).
  */
sealed trait Selection extends Serializable
case object SelAll extends Selection
final case class SelRange(start: Long, stop: Long, step: Long) extends Selection
final case class SelIds(ids: Array[Long], pos: Array[Long]) extends Selection
/** Sorted, disjoint global [start, stop) ranges — produced by zone-map
  * chunk pruning on value predicates (DSv2 pushdown).
  */
final case class SelRanges(starts: Array[Long], stops: Array[Long]) extends Selection

/** A decode task unit: one (segment, partition) with the chunks to read.
  * Pruning already happened on the driver against the manifest zone map
  * (rowstart/nrows — the reference's chunk binary search, util.py:358-377).
  */
final case class DecodeUnit(
    root: String,
    segment: Long,
    part: Int,
    globalOffset: Long,
    partRows: Long,
    colChunks: Map[String, Seq[ChunkMeta]],
    sel: Selection) extends Serializable

object ColumnStore {

  def sparkType(pt: PType.PType): DataType = pt match {
    case PType.I64 => LongType
    case PType.I32 => IntegerType
    case PType.I16 => ShortType
    case PType.F64 => DoubleType
    case PType.F32 => FloatType
    case PType.BOOL => BooleanType
    case PType.STR => StringType
    case PType.BIN => BinaryType
    case PType.I32LIST => ArrayType(IntegerType, containsNull = false)
  }

  def ptypeOf(dt: DataType): PType.PType = dt match {
    case LongType => PType.I64
    case IntegerType => PType.I32
    case ShortType => PType.I16
    case DoubleType => PType.F64
    case FloatType => PType.F32
    case BooleanType => PType.BOOL
    case StringType => PType.STR
    case BinaryType => PType.BIN
    case ArrayType(IntegerType, _) => PType.I32LIST
    case other => throw new IllegalArgumentException(
      s"unsupported type $other (reference supports numpy scalar dtypes only," +
        " pycolumns column.py:398-406)")
  }

  /** Schema inference (pycolumns TableSchema.from_array, schema.py:78-133). */
  def specFromSchema(schema: StructType, targetChunkBytes: Long = 1L << 20,
      chunkRows: Int = 0): TableSpec =
    TableSpec(schema.fields.toSeq.map(f =>
      ColumnSpec(f.name, ptypeOf(f.dataType).id)), targetChunkBytes, chunkRows)

  def create(root: String, spec: TableSpec): ColumnStore = {
    require(!FsIO.exists(s"$root/${Format.SchemaFile}"), s"store exists at $root")
    FsIO.mkdirs(root)
    FsIO.mkdirs(s"$root/${Format.MetaDir}")
    FsIO.mkdirs(s"$root/${Format.SegmentsDir}")
    FsIO.writeAtomic(s"$root/${Format.SchemaFile}", BinCodec.writeTableSpec(spec))
    new ColumnStore(root)
  }

  def open(root: String): ColumnStore = {
    require(FsIO.exists(s"$root/${Format.SchemaFile}"), s"no store at $root")
    new ColumnStore(root)
  }

  def exists(root: String): Boolean = FsIO.exists(s"$root/${Format.SchemaFile}")

  // ---------------------------------------------------------------- encode

  /** Column accumulation during encode; one per column per partition. */
  private final class ColBuilder(val spec: ColumnSpec) {
    private val pt = spec.ptype
    private val longs = mutable.ArrayBuilder.make[Long]
    private val ints = mutable.ArrayBuilder.make[Int]
    private val shorts = mutable.ArrayBuilder.make[Short]
    private val doubles = mutable.ArrayBuilder.make[Double]
    private val floats = mutable.ArrayBuilder.make[Float]
    private val bools = mutable.ArrayBuilder.make[Boolean]
    private val strs = mutable.ArrayBuilder.make[String]
    private val bins = mutable.ArrayBuilder.make[Array[Byte]]
    private val listLens = mutable.ArrayBuilder.make[Int]
    private val listVals = mutable.ArrayBuilder.make[Int]
    var rawBytes: Long = 0L
    var count: Int = 0

    /** Consume one InternalRow field — primitive getters and bulk array
      * copies only (no per-value boxing; `getArray(i).toIntArray()` is one
      * Platform.copyMemory). Encode throughput is memory-bandwidth-bound,
      * so this path matters at every scale.
      */
    def add(row: InternalRow, i: Int): Unit = {
      require(!row.isNullAt(i),
        s"null in column ${spec.name}: the store has no null support " +
          "(reference columns are dense numpy arrays)")
      pt match {
        case PType.I64 => longs += row.getLong(i); rawBytes += 8
        case PType.I32 => ints += row.getInt(i); rawBytes += 4
        case PType.I16 => shorts += row.getShort(i); rawBytes += 2
        case PType.F64 => doubles += row.getDouble(i); rawBytes += 8
        case PType.F32 => floats += row.getFloat(i); rawBytes += 4
        case PType.BOOL => bools += row.getBoolean(i); rawBytes += 1
        case PType.STR =>
          val s = row.getUTF8String(i).toString; strs += s; rawBytes += s.length + 4
        case PType.BIN =>
          val b = row.getBinary(i); bins += b; rawBytes += b.length + 4
        case PType.I32LIST =>
          val arr = row.getArray(i).toIntArray()
          listLens += arr.length
          listVals.addAll(arr)
          rawBytes += 4L * arr.length + 4
      }
      count += 1
    }

    def flush(): ColVec = {
      val v: ColVec = pt match {
        case PType.I64 => LongVec(longs.result())
        case PType.I32 => IntVec(ints.result())
        case PType.I16 => ShortVec(shorts.result())
        case PType.F64 => DoubleVec(doubles.result())
        case PType.F32 => FloatVec(floats.result())
        case PType.BOOL => BoolVec(bools.result())
        case PType.STR => StrVec(strs.result())
        case PType.BIN => BinVec(bins.result())
        case PType.I32LIST => IntListVec(listLens.result(), listVals.result())
      }
      longs.clear(); ints.clear(); shorts.clear(); doubles.clear()
      floats.clear(); bools.clear(); strs.clear(); bins.clear()
      listLens.clear(); listVals.clear()
      rawBytes = 0L
      count = 0
      v
    }
  }

  /** Push-based encoder for one partition — the heart of the engine
    * (SURVEY.md §2.5 C1). Used by both write surfaces: the API append path
    * (pull from an iterator, `encodePartition`) and the DSv2 `BatchWrite`
    * DataWriter (Spark pushes rows in).
    */
  private[graft] final class PartitionEncoder(spec: TableSpec, segDir: String,
      segment: Long, val part: Int, lineage: String, cfg: CodecConfig) {
    private val t0 = System.nanoTime()
    private val cols = spec.columns.toArray
    private val builders = cols.map(new ColBuilder(_))
    private val chunks = mutable.ArrayBuffer.empty[ChunkMeta]
    private val streams = new Array[java.io.OutputStream](cols.length)
    private val tmpNames = new Array[String](cols.length)
    private val offsets = new Array[Long](cols.length)
    private val chunkIdx = new Array[Int](cols.length)
    // per-column codec config + chunk boundaries (reference: chunksize and
    // compression resolve PER COLUMN through the schema, schema.py:264-325;
    // each column's chunk grid is independent, like pycolumns chunked cols)
    private val colCfg = cols.map(c => CodecConfig.forColumn(cfg, c.compression))
    private val colTarget = cols.map { c =>
      if (c.chunkRows > 0) c.chunkRows
      else if (spec.chunkRows > 0) spec.chunkRows
      else 0 // derive from observed bytes/row at the 256-row mark
    }
    private val colRowStart = new Array[Long](cols.length)
    private var nrows = 0L

    locally { // open one tmp stream per column
      var c = 0
      while (c < cols.length) {
        tmpNames(c) = s"$segDir/${Format.colFile(part, cols(c).name)}" +
          ".tmp-" + java.util.UUID.randomUUID().toString.take(8)
        // createOut: Hadoop stream off-local; nio + hand-written Hadoop-
        // compatible .crc sidecar on local paths (read-path verification
        // unchanged, no per-file chmod fork)
        streams(c) = FsIO.createOut(tmpNames(c))
        c += 1
      }
    }

    private def flushCol(c: Int): Unit = {
      if (builders(c).count == 0) return
      val vec = builders(c).flush()
      val (blob, info) = Chunk.encodeWithInfo(vec, colCfg(c))
      streams(c).write(blob)
      // membership filter interleaved AFTER its chunk in the same file:
      // chunk reads stay exact ranged reads, and the few-KB filter region
      // is what an unindexed point lookup reads INSTEAD of the chunk
      val filter = if (cfg.chunkFilters) graft.codec.MemberFilter.fromVec(vec)
        else None
      filter.foreach(streams(c).write)
      val (fk, fOff, fLen) = filter match {
        case Some(f) => (1, offsets(c) + blob.length, f.length.toLong)
        case None => (0, 0L, 0L)
      }
      chunks += ChunkMeta(cols(c).name, chunkIdx(c), colRowStart(c),
        info.nrows, info.codec, info.outer,
        Format.colFile(part, cols(c).name), offsets(c), blob.length.toLong,
        info.rawBytes, FsIO.crc32c(blob),
        info.statsKind, info.minBits, info.maxBits, info.sumKind, info.sumBits,
        fk, fOff, fLen)
      offsets(c) += blob.length + fLen
      chunkIdx(c) += 1
      colRowStart(c) += vec.n
    }

    /** Consume one row (fields in spec.columns order). */
    def add(row: InternalRow): Unit = {
      var c = 0
      while (c < cols.length) {
        builders(c).add(row, c)
        if (colTarget(c) == 0 && builders(c).count >= 256) {
          // derive rows/chunk so THIS column's chunk is ~target bytes
          // uncompressed (reference '1m' policy, chunks.py:600-618)
          val bytesTarget =
            if (cols(c).chunkBytes > 0) cols(c).chunkBytes else spec.targetChunkBytes
          // floor 16, not 256: with multi-MB values a 256-row floor builds
          // gigabyte chunk payloads (the Bytes.Writer 2 GiB guard trips)
          val perRow = builders(c).rawBytes.toDouble / builders(c).count
          colTarget(c) = math.max(16, math.min(1 << 22,
            (bytesTarget / math.max(1.0, perRow)).toInt))
        }
        if (colTarget(c) > 0 && builders(c).count >= colTarget(c)) flushCol(c)
        c += 1
      }
      nrows += 1
    }

    /** Flush tails, publish column files, checkpoint the part manifest. */
    def finish(): Array[Byte] = {
      var c = 0
      while (c < cols.length) {
        flushCol(c)
        streams(c).close()
        val dest = s"$segDir/${Format.colFile(part, cols(c).name)}"
        FsIO.delete(dest)
        FsIO.rename(tmpNames(c), dest)
        c += 1
      }
      val manifest = PartManifest(segment, part, nrows,
        System.nanoTime() - t0, lineage, 0, chunks.toSeq)
      val bytes = BinCodec.writePartManifest(manifest)
      // checkpoint: partition complete (doubles as the resume marker)
      FsIO.writeAtomic(s"$segDir/${Format.partManifestFile(part, 0)}", bytes)
      bytes
    }

    /** Drop this attempt's tmp files (DSv2 task abort). */
    def abort(): Unit = {
      var c = 0
      while (c < cols.length) {
        try streams(c).close() catch { case _: Exception => }
        try FsIO.delete(tmpNames(c)) catch { case _: Exception => }
        c += 1
      }
    }
  }

  /** Encode one partition's rows into per-column chunk files + manifest.
    * Runs inside `runJob` on executors; resumable: if the partition
    * manifest already exists, the input is skipped and the prior result
    * returned.
    */
  private[graft] def encodePartition(
      it: Iterator[InternalRow],
      spec: TableSpec,
      segDir: String,
      segment: Long,
      lineage: String,
      cfg: CodecConfig): (Int, Array[Byte]) = {
    val part = TaskContext.getPartitionId()
    val manifestPath = s"$segDir/${Format.partManifestFile(part, 0)}"
    if (FsIO.exists(manifestPath)) {
      // resume: partition already complete from a prior attempt/run
      return part -> FsIO.readAll(manifestPath)
    }
    val enc = new PartitionEncoder(spec, segDir, segment, part, lineage, cfg)
    try {
      while (it.hasNext) enc.add(it.next())
      part -> enc.finish()
    } catch {
      case e: Throwable =>
        // close streams + drop this attempt's tmp files: a failed task (null
        // value, I/O error) must not leak an open stream and an orphan
        // .tmp-xxxx per column per attempt
        enc.abort()
        throw e
    }
  }

  /** Publish a segment: consolidated manifest, then the (not-yet-visible)
    * commit record, then ONE atomic create-exclusive `.commit-<n>` marker
    * in the segments dir that is simultaneously the commit-order sequence
    * allocation AND the publication. Shared by the API append path and the
    * DSv2 BatchWrite commit.
    *
    * Why a marker: global row ids are assigned by reader-side segment
    * ORDER, and ordering by segment NUMBER would renumber already-visible
    * rows when a lower-numbered claimed segment commits later (writer A
    * claims seg 1, B claims seg 2, B commits first: B's rows are visible;
    * A's later commit must append AFTER them, not shift them). A two-step
    * scheme (claim a sequence, then publish) would still break on a writer
    * that STALLS between the steps while a later sequence publishes; here
    * allocation and publication are the same single atomic create, so a
    * stalled writer is simply not committed yet and always lands after.
    * Losing the race just retries the next number; readers sort by marker
    * number, and pre-marker (legacy) segments keep their number order
    * (markers always allocate above every existing segment number).
    * Marker count is bounded by segment count; compactSegments resets both.
    *
    * The published segment is encoded IN THE MARKER NAME
    * (`.commit-<n>-<seg>`): create-exclusive is atomic for the name, but a
    * payload is only atomically visible on close (and on HDFS-like stores
    * the content of an open file is empty to readers), so a name-only
    * protocol closes the window where a concurrent lister sees the marker
    * but reads 0 bytes. Older stores carry payload-only `.commit-<n>`
    * markers; readers still parse those (with a bounded retry for the
    * create-to-close window).
    */
  private[graft] def commitSegment(segDir: String, seg: Long,
      byPart: Seq[(Int, Array[Byte])], lineage: String): Unit = {
    val sorted = byPart.sortBy(_._1)
    FsIO.writeAtomic(s"$segDir/${Format.SegManifestFile}",
      BinCodec.writeSegManifest(sorted.map(_._2)))
    val rows = sorted.map(m => BinCodec.readPartManifest(m._2).nrows)
    FsIO.writeAtomic(s"$segDir/_commit.bin",
      BinCodec.writeSegmentCommit(SegmentCommit(seg, rows, lineage, markered = true)))
    val segsDir = segDir.substring(0, segDir.lastIndexOf('/'))
    val names = FsIO.list(segsDir)
    val floor = (names.collect { case n if n.startsWith(".commit-") => markerParts(n)._1 } ++
      names.collect { case n if n.startsWith("seg") => n.drop(3).toLong })
      .foldLeft(-1L)(math.max)
    var n = floor + 1
    var published = false
    while (!published && n < floor + 1000000) {
      try {
        FsIO.createExclusive(s"$segsDir/.commit-$n-$seg", Array.emptyByteArray)
        published = true
      } catch { case _: java.io.IOException => n += 1 }
    }
    require(published, s"could not publish a commit marker in $segsDir")
  }

  /** Parse a marker filename: `(sequence, Some(segment))` for the v3
    * name-encoded form `.commit-<n>-<seg>`, `(sequence, None)` for a legacy
    * `.commit-<n>` whose segment lives in the payload.
    */
  private[graft] def markerParts(name: String): (Long, Option[Long]) = {
    val body = name.drop(".commit-".length)
    val i = body.indexOf('-')
    if (i < 0) (body.toLong, None)
    else (body.substring(0, i).toLong, Some(body.substring(i + 1).toLong))
  }
}

/** A graft column store rooted at `root` — the Spark-native analogue of
  * `pycolumns.Columns` storage (SURVEY.md §1). All table-level operations
  * (write/read/update/vacuum) are Spark jobs; metadata handling is
  * driver-side and O(partitions).
  */
class ColumnStore(val root: String) extends Serializable {
  import ColumnStore._

  // ------------------------------------------------------- metadata cache
  // Driver-side caches so repeated planning does O(segments) — not
  // O(partitions) — metadata round-trips. Commits are immutable once
  // written (updates never change row counts), so the commit cache needs no
  // invalidation; manifests change on update/vacuum, which call
  // invalidateManifests(). @transient: executors reopen by root.

  @transient private lazy val specCache =
    new java.util.concurrent.atomic.AtomicReference[TableSpec](null)
  @transient private lazy val commitCache =
    new java.util.concurrent.ConcurrentHashMap[Long, SegmentCommit]()
  @transient private lazy val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[Long, IndexedSeq[PartManifest]]()
  @transient private lazy val colStatsCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Map[Int, Map[String, (Int, Long, Long)]]]()
  @transient private lazy val rawBytesCache =
    new java.util.concurrent.atomic.AtomicReference[Map[String, Long]](null)

  private[graft] def invalidateManifests(): Unit = {
    manifestCache.clear()
    colStatsCache.clear()
    rawBytesCache.set(null)
  }

  /** Segment REPLACEMENT (compactSegments) reuses segment numbers, so even
    * the otherwise-immutable commit records must drop.
    */
  private[graft] def invalidateAll(): Unit = {
    manifestCache.clear()
    colStatsCache.clear()
    rawBytesCache.set(null)
    commitCache.clear()
    markerCache.clear()
    specCache.set(null)
  }

  def spec: TableSpec = {
    val c = specCache.get()
    if (c != null) c
    else {
      val s = BinCodec.readTableSpec(FsIO.readAll(s"$root/${Format.SchemaFile}"))
      specCache.set(s)
      s
    }
  }

  private def writeSpec(s: TableSpec): Unit = {
    FsIO.writeAtomic(s"$root/${Format.SchemaFile}", BinCodec.writeTableSpec(s))
    specCache.set(s)
  }

  // ------------------------------------------------------------- segments

  /** Committed segments in ROW-ID order = commit order (see commitSegment):
    * marker-published segments sort by their `.commit-<n>` number; legacy
    * (pre-marker) segments are visible by their commit record alone and
    * sort by segment number — always below marker numbers. A markered
    * commit record WITHOUT a marker is a commit in flight (or crashed
    * mid-publish): invisible.
    */
  def segments: Seq[Long] = {
    val names = FsIO.list(s"$root/${Format.SegmentsDir}")
    val markerOf: Map[Long, Long] = names // seg -> smallest marker number
      .collect { case m if m.startsWith(".commit-") => ColumnStore.markerParts(m) }
      .map { case (n, segOpt) => segOpt.getOrElse(markerSeg(n)) -> n }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).min }
    names.filter(_.startsWith("seg")).map(_.drop(3).toLong)
      .filter(s => FsIO.exists(s"${Format.segDir(root, s)}/_commit.bin"))
      .flatMap { s =>
        val c = segmentCommit(s)
        if (!c.markered) Some((s, s)) // legacy: order by number
        else markerOf.get(s).map(n => (n, s)) // visible iff published
      }
      .sortBy(identity).map(_._2)
  }

  /** Segment a LEGACY payload-carrying `.commit-<n>` marker publishes
    * (immutable → cached). Current markers encode the segment in the name
    * and never reach here. The legacy writer created the name then wrote
    * the payload, so a concurrent lister could observe an empty file for a
    * moment — retry briefly before failing with a retryable error rather
    * than throwing an index error from a 0-byte read. A naive "skip
    * unreadable markers" would be WRONG: treating marker n as absent while
    * n+1 is visible would renumber rows once n's payload lands.
    */
  @transient private lazy val markerCache =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Long]()
  private def markerSeg(n: Long): Long = {
    // read-retry OUTSIDE the map update: computeIfAbsent holds the bin lock
    // for its whole body, so a crashed-mid-publish marker's 50×10 ms retry
    // would stall unrelated lookups hashing to the same bin; read first,
    // then publish the resolved value with putIfAbsent (idempotent — every
    // racer resolves the same immutable payload)
    val cached = markerCache.get(n)
    if (cached != null) return cached.longValue
    val path = s"$root/${Format.SegmentsDir}/.commit-$n"
    var attempt = 0
    var seg = -1L
    while (seg < 0) {
      val bytes = FsIO.readAll(path)
      if (bytes.nonEmpty) seg = new Bytes.Reader(bytes).readVar()
      else if (attempt >= 50) throw new java.io.IOException(
        s"commit marker $path still empty after ${attempt} reads — " +
          "writer in flight or crashed mid-publish; retry the operation")
      else { attempt += 1; Thread.sleep(10) }
    }
    markerCache.putIfAbsent(n, seg)
    seg
  }

  def segmentCommit(seg: Long): SegmentCommit =
    commitCache.computeIfAbsent(seg, _ =>
      BinCodec.readSegmentCommit(FsIO.readAll(s"${Format.segDir(root, seg)}/_commit.bin")))

  /** All partition manifests of a segment, partition order, at their
    * highest update version — via the consolidated `_manifest.bin` written
    * at commit. One directory listing + one file read per segment (plus one
    * read per UPDATED partition), instead of a list + read per partition:
    * at 10^5 partitions on an object store that is the difference between
    * milliseconds and minutes of serial driver time before the first task.
    */
  def partManifests(seg: Long): IndexedSeq[PartManifest] =
    manifestCache.computeIfAbsent(seg, _ => loadPartManifests(seg))

  private def loadPartManifests(seg: Long): IndexedSeq[PartManifest] = {
    val dir = Format.segDir(root, seg)
    val names = FsIO.list(dir)
    // max update version per part from the single listing; ignore leftover
    // .tmp-xxxx from crashed atomic writes (endsWith .bin + toIntOption)
    val verRe = """^p(\d+)\.manifest\.v(\d+)\.bin$""".r
    val topVer = mutable.HashMap.empty[Int, Int]
    names.foreach {
      case verRe(p, v) =>
        val pi = p.toInt
        val vi = v.toInt
        if (vi > topVer.getOrElse(pi, 0)) topVer(pi) = vi
      case _ =>
    }
    def patched(base: IndexedSeq[PartManifest]): IndexedSeq[PartManifest] =
      if (topVer.isEmpty) base
      else base.map { m =>
        topVer.get(m.part) match {
          case Some(v) if v > m.updateVersion =>
            BinCodec.readPartManifest(
              FsIO.readAll(s"$dir/${Format.partManifestFile(m.part, v)}"))
          case _ => m
        }
      }
    if (names.contains(Format.SegManifestFile)) {
      patched(BinCodec.readSegManifest(FsIO.readAll(s"$dir/${Format.SegManifestFile}")))
    } else {
      // legacy segment without a consolidated manifest: per-part reads
      val baseRe = """^p(\d+)\.manifest\.bin$""".r
      val parts = names.collect { case baseRe(p) => p.toInt }.sorted
      patched(parts.toIndexedSeq.map(p =>
        BinCodec.readPartManifest(FsIO.readAll(s"$dir/${Format.partManifestFile(p, 0)}"))))
    }
  }

  /** Per-(partition, column) min/max ROLL-UP over the chunk zone maps,
    * derived from the cached manifests (no format change) and kind-aware
    * (Long / double-bits / unsigned-prefix order). Lets query planning skip
    * whole partitions before walking chunk lists: at 10^5 partitions ×
    * 10^3 chunks × k filtered columns, the per-chunk walk alone is ~10^8
    * driver comparisons per query — the roll-up reduces the common
    * selective case to O(partitions). Mixed/absent stat kinds collapse to
    * kind 0 = never skip (conservative).
    */
  def partColStats(seg: Long): Map[Int, Map[String, (Int, Long, Long)]] =
    colStatsCache.computeIfAbsent(seg, _ => partManifests(seg).map { m =>
      m.part -> m.chunks.groupBy(_.column).map { case (cn, cs) =>
        val kinds = cs.map(_.statsKind).distinct
        if (kinds.sizeIs != 1 || kinds.head == 0) cn -> ((0, 0L, 0L))
        else {
          val k = kinds.head
          def lt(a: Long, b: Long): Boolean = k match {
            case 2 => java.lang.Double.longBitsToDouble(a) <
              java.lang.Double.longBitsToDouble(b)
            case 3 => java.lang.Long.compareUnsigned(a, b) < 0
            case _ => a < b
          }
          var mn = cs.head.minBits
          var mx = cs.head.maxBits
          cs.foreach { c =>
            if (lt(c.minBits, mn)) mn = c.minBits
            if (lt(mx, c.maxBits)) mx = c.maxBits
          }
          cn -> ((k, mn, mx))
        }
      }
    }.toMap)

  /** Decoded (uncompressed) bytes per column, summed over every chunk —
    * the size statistic Catalyst needs to plan joins over graft tables
    * (e.g. pick a broadcast side). Cached with the manifests.
    */
  def colRawBytes: Map[String, Long] = {
    val c = rawBytesCache.get()
    if (c != null) c
    else {
      val m = mutable.HashMap.empty[String, Long].withDefaultValue(0L)
      for (seg <- segments; pm <- partManifests(seg); ch <- pm.chunks)
        m(ch.column) += ch.rawBytes
      val out = m.toMap
      rawBytesCache.set(out)
      out
    }
  }

  /** Highest-version manifest for (seg, part) — updates bump the version.
    * Parts are dense 0..n-1 in partition order, so this is an array index.
    */
  def partManifest(seg: Long, part: Int): PartManifest = {
    val ms = partManifests(seg)
    if (part < ms.length && ms(part).part == part) ms(part)
    else ms.find(_.part == part).getOrElse(
      throw new IllegalStateException(s"no manifest for seg=$seg part=$part"))
  }

  def nrows: Long = segments.map(segmentCommit(_).totalRows).sum

  /** Monotone stamp of in-place mutation state: the sum of every
    * partition's update version (scatter updates and vacuum bump these).
    * Indexes capture it at build time; DSv2 index routing requires it
    * unchanged — O(partitions) over the cached manifests.
    */
  def updateStamp: Long =
    segments.map(s => partManifests(s).map(_.updateVersion.toLong).sum).sum

  /** Equal-length invariant across columns (pycolumns Columns.verify,
    * columns.py:449-469): every column must cover every row of every
    * committed partition.
    */
  def verify(): Unit = {
    val cols = spec.columns
    for (seg <- segments) {
      val commit = segmentCommit(seg)
      commit.partRows.zipWithIndex.foreach { case (rows, part) =>
        val m = partManifest(seg, part)
        for (c <- cols if c.addedAtSegment <= seg) {
          val covered = m.chunks.filter(_.column == c.name).map(_.nrows.toLong).sum
          require(covered == rows,
            s"column ${c.name} covers $covered of $rows rows in seg=$seg part=$part")
        }
      }
    }
  }

  // --------------------------------------------------------------- write

  /** Encode `df` as the next segment. First write → segment 0; subsequent →
    * append (pycolumns Columns.append, columns.py:603-634: column-name sets
    * must match exactly; values cast to column dtypes).
    */
  def append(spark: SparkSession, df: DataFrame, order: OrderMode = AsIs,
      lineage: String = "", cfg: CodecConfig = CodecConfig.default): Long = {
    val s = spec
    val names = df.columns.toSet
    val seg = claimSegment(lineage)
    val expect = s.columns.filter(_.addedAtSegment <= seg).map(_.name).toSet
    require(names == expect,
      s"appended data columns $names != table columns $expect " +
        "(reference rejects mismatched column sets, columns.py:619-627)")
    writeSegment(spark, df, seg, order, lineage, cfg)
    seg
  }

  /** Next segment number, ignoring claims — used only for schema-evolution
    * bookkeeping (`addedAtSegment`), never for allocating a write target
    * (writes go through [[claimSegment]]).
    */
  private[graft] def nextSegment: Long = {
    val dirs = FsIO.list(s"$root/${Format.SegmentsDir}")
      .filter(_.startsWith("seg")).map(_.drop(3).toLong)
    val committed = segments.toSet
    val orphans = dirs.filterNot(committed)
    if (orphans.nonEmpty) orphans.min
    else if (dirs.isEmpty) 0L
    else dirs.max + 1
  }

  /** Atomically CLAIM the segment a write will target — optimistic
    * concurrency for simultaneous writers (beyond the single-process
    * reference). The claim is a create-exclusive marker inside the segment
    * dir: two appends that both compute the same next number race on the
    * create and exactly one wins; the loser advances to the next number.
    * Concurrent appends can therefore never interleave partition files
    * inside one segment.
    *
    * Resume contract: the claim records the append's identity. A NON-empty
    * lineage identifies a logical job — an uncommitted segment whose claim
    * matches it is our own interrupted attempt (streaming batch replay,
    * retried named appends), re-entered so the partition manifests
    * resume-skip completed work. Anonymous appends (empty lineage) claim
    * under a random identity: they never resume across processes, and —
    * unlike the previous orphan-reuse heuristic — a FAILED anonymous
    * append's partial segment can no longer be silently absorbed into an
    * unrelated later append.
    */
  private[graft] def claimSegment(lineage: String): Long = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val ident =
      if (lineage.nonEmpty) s"lineage:$lineage"
      else s"anon:${java.util.UUID.randomUUID()}"
    def claimPath(seg: Long) = s"${Format.segDir(root, seg)}/_claim.bin"
    // Two-phase claim: "pending" until any FOREIGN content of the dir is
    // wiped (a pre-claim-format store may hold a dead append's checkpointed
    // partition manifests — resume-skip would silently absorb its rows),
    // then "ready". A crash between claim and clean re-enters through the
    // pending state and cleans again before any of OUR work exists.
    def wipeForeign(seg: Long): Unit = {
      val d = Format.segDir(root, seg)
      FsIO.list(d).filterNot(_ == "_claim.bin")
        .foreach(f => FsIO.delete(s"$d/$f", recursive = true))
    }
    def markReady(seg: Long): Unit =
      FsIO.writeAtomic(claimPath(seg), s"$ident\nready".getBytes(utf8))
    val dirs = FsIO.list(s"$root/${Format.SegmentsDir}")
      .filter(_.startsWith("seg")).map(_.drop(3).toLong).sorted
    val committed = segments.toSet
    val orphans = dirs.filterNot(committed)
    if (lineage.nonEmpty) {
      orphans.foreach { o =>
        val content =
          try {
            if (FsIO.exists(claimPath(o)))
              Some(new String(FsIO.readAll(claimPath(o)), utf8).split('\n').toSeq)
            else None
          } catch { case _: Exception => None }
        content.foreach { lines =>
          if (lines.headOption.contains(ident)) {
            // our interrupted attempt: finish a crashed clean, then resume
            if (lines.lift(1).contains("pending")) { wipeForeign(o); markReady(o) }
            return o
          }
        }
      }
    }
    // claim an unclaimed orphan (pre-claim-format store, or a crash between
    // mkdirs and claim), else the next fresh number; a lost race advances
    var unclaimed = orphans.filter(o => !FsIO.exists(claimPath(o)))
    var next = if (dirs.isEmpty) 0L else dirs.max + 1
    var attempts = 0
    while (attempts < 1000) {
      val seg =
        if (unclaimed.nonEmpty) { val h = unclaimed.head; unclaimed = unclaimed.tail; h }
        else { val s = next; next += 1; s }
      FsIO.mkdirs(Format.segDir(root, seg))
      try {
        FsIO.createExclusive(claimPath(seg), s"$ident\npending".getBytes(utf8))
        wipeForeign(seg) // no-op for a fresh dir; wipes legacy partials
        markReady(seg)
        return seg
      } catch { case _: java.io.IOException => attempts += 1 }
    }
    throw new IllegalStateException(
      s"could not claim a segment in $root after 1000 attempts")
  }

  /** Cast-on-write (pycolumns util.get_data_with_conversion, util.py:412-428)
    * including numpy fixed-width truncation: int→'U5' keeps 5 chars
    * (tests/test_access.py:169-182).
    */
  private def normalize(df: DataFrame, s: TableSpec): DataFrame = {
    val cols = s.columns.filter(c => df.columns.contains(c.name)).map { c =>
      val base = col(c.name).cast(sparkType(c.ptype))
      val trunc =
        if (c.fixedWidth > 0 && c.ptype == PType.STR) substring(base, 1, c.fixedWidth)
        else if (c.fixedWidth > 0 && c.ptype == PType.BIN) substring(base, 1, c.fixedWidth)
        else base
      trunc.as(c.name)
    }
    df.select(cols: _*)
  }

  private def writeSegment(spark: SparkSession, df0: DataFrame, seg: Long,
      order: OrderMode, lineage: String, cfg: CodecConfig): Unit = {
    val s = spec
    val df1 = normalize(df0, s)
    val df = order match {
      case ByKey(key, n) =>
        df1.repartitionByRange(n, col(key)).sortWithinPartitions(col(key))
      case ByKeySalted(key, n, salts) =>
        // salt spreads skewed key ranges over partitions; global key order
        // is preserved because the salt only splits equal-key runs
        df1.withColumn("_salt", pmod(xxhash64(df1.columns.map(col): _*), lit(salts)))
          .repartitionByRange(n, col(key), col("_salt"))
          .sortWithinPartitions(col(key), col("_salt"))
          .drop("_salt")
      case AsIs => df1
    }
    val segDir = Format.segDir(root, seg)
    FsIO.mkdirs(segDir)
    val specB = s
    val rootB = root
    // unboxed path: execute the plan to InternalRows (datasource-style) and
    // encode per partition; runJob returns results in partition order
    val rdd = df.queryExecution.toRdd
    val manifests: Array[(Int, Array[Byte])] =
      spark.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) =>
        ColumnStore.encodePartition(it, specB,
          s"$rootB/${Format.SegmentsDir}/seg$seg", seg, lineage, cfg))
    // commit: per-partition row counts in partition-id order fix the global
    // row-id assignment (SURVEY.md §7.5(6)). The consolidated manifest goes
    // first so a segment with a commit record always has one.
    ColumnStore.commitSegment(segDir, seg, manifests.toSeq, lineage)
  }

  // ---------------------------------------------------------------- read

  /** Global row offset of each (segment, part), ordered. */
  def partOffsets(): Seq[(Long, Int, Long, Long)] = {
    // (segment, part, globalOffset, partRows)
    var off = 0L
    val out = mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
    for (seg <- segments) {
      val commit = segmentCommit(seg)
      commit.partRows.zipWithIndex.foreach { case (rows, part) =>
        out += ((seg, part, off, rows))
        off += rows
      }
    }
    out.toSeq
  }

  /** Read selected columns/rows back as a DataFrame with `_row_id` (and
    * `_pos` for id-list gathers). Chunk pruning against the manifest
    * rowstart/nrows zone map happens here, on the driver, before any task
    * launches — the Spark analogue of the reference's chunk binary search.
    */
  def read(spark: SparkSession, columns: Seq[String] = Seq.empty,
      sel: Selection = SelAll, emptyMeansAll: Boolean = true): DataFrame = {
    val s = spec
    val (units, wanted) = planUnits(columns, sel, emptyMeansAll)
    val fields = mutable.ArrayBuffer(StructField("_row_id", LongType, nullable = false))
    if (sel.isInstanceOf[SelIds])
      fields += StructField("_pos", LongType, nullable = false)
    wanted.foreach(cn => fields +=
      StructField(cn, sparkType(s.col(cn).ptype), nullable = false))
    val schema = StructType(fields.toSeq)
    val specB = s
    val wantedB = wanted
    val rdd = spark.sparkContext
      .parallelize(units, math.max(1, units.size))
      .flatMap(u => Decode.decodeUnit(u, specB, wantedB))
    spark.createDataFrame(rdd, schema)
  }

  /** Driver-side scan planning: partition pruning + per-unit chunk pruning
    * against the manifest zone map. Shared by the API read path and the
    * DSv2 connector.
    */
  def planUnits(columns: Seq[String], sel: Selection,
      emptyMeansAll: Boolean = true): (Seq[DecodeUnit], Seq[String]) = {
    val s = spec
    // emptyMeansAll=false (DSv2 empty projection): decode NO columns, the
    // units carry row counts only (count(*) never opens a chunk file)
    val wanted = if (columns.isEmpty && emptyMeansAll) s.colNames else columns
    wanted.foreach(s.col(_)) // validate
    val offs = partOffsets()
    // SelIds: sort (id, pos) ONCE, then each partition/chunk slices its span
    // with binary search — O((P + chunks) log N) total, not O(P × N)
    val sortedSel = sel match {
      case SelIds(ids, pos) =>
        val order = ids.indices.toArray.sortBy(ids(_))
        val sIds = new Array[Long](ids.length)
        val sPos = new Array[Long](ids.length)
        var i = 0
        while (i < order.length) { sIds(i) = ids(order(i)); sPos(i) = pos(order(i)); i += 1 }
        SelIds(sIds, sPos)
      case other => other
    }
    // binary search: first index in sIds with value >= key
    def lowerBound(a: Array[Long], key: Long): Int = {
      var lo = 0
      var hi = a.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (a(mid) < key) lo = mid + 1 else hi = mid
      }
      lo
    }
    val units = mutable.ArrayBuffer.empty[DecodeUnit]
    // manifests looked up once per SEGMENT (consolidated file, cached)
    var curSeg = -1L
    var segManifests: IndexedSeq[PartManifest] = null
    for ((seg, part, off, rows) <- offs) {
      val localSel: Option[Selection] = sortedSel match {
        case SelAll => Some(SelAll)
        case SelRange(start, stop, step) =>
          if (stop <= off || start >= off + rows) None
          else Some(SelRange(start, stop, step))
        case SelRanges(starts, stops) =>
          val ks = mutable.ArrayBuilder.make[Long]
          val ke = mutable.ArrayBuilder.make[Long]
          var i = 0
          while (i < starts.length) {
            if (stops(i) > off && starts(i) < off + rows) {
              ks += starts(i); ke += stops(i)
            }
            i += 1
          }
          val a = ks.result()
          if (a.isEmpty) None else Some(SelRanges(a, ke.result()))
        case SelIds(sIds, sPos) =>
          val from = lowerBound(sIds, off)
          val until = lowerBound(sIds, off + rows)
          if (from == until) None
          else Some(SelIds(
            java.util.Arrays.copyOfRange(sIds, from, until),
            java.util.Arrays.copyOfRange(sPos, from, until)))
      }
      localSel.foreach { ls =>
        if (seg != curSeg) { curSeg = seg; segManifests = partManifests(seg) }
        val m =
          if (part < segManifests.length && segManifests(part).part == part)
            segManifests(part)
          else segManifests.find(_.part == part).getOrElse(
            throw new IllegalStateException(s"no manifest for seg=$seg part=$part"))
        val perCol = wanted.map { cn =>
          // manifest PRESENCE decides fill-vs-chunks: a backfilled column
          // materializes chunks on first update, so addedAtSegment alone
          // would hide the written values
          val colChunks = m.chunks.filter(_.column == cn)
          if (colChunks.isEmpty) cn -> Seq.empty[ChunkMeta] // fill col
          else cn -> pruneChunks(colChunks, ls, off)
        }.toMap
        units += DecodeUnit(root, seg, part, off, rows, perCol, ls)
      }
    }
    (units.toSeq, wanted)
  }

  private def pruneChunks(chunks: Seq[ChunkMeta], sel: Selection,
      off: Long): Seq[ChunkMeta] = sel match {
    case SelAll => chunks
    case SelRange(start, stop, _) =>
      chunks.filter(c => off + c.rowStartLocal < stop &&
        off + c.rowStartLocal + c.nrows > start)
    case SelRanges(starts, stops) =>
      chunks.filter { c =>
        val lo = off + c.rowStartLocal
        val hi = lo + c.nrows
        starts.indices.exists(i => starts(i) < hi && stops(i) > lo)
      }
    case SelIds(ids, _) =>
      // ids arrive sorted (planUnits sorts once); chunks sorted by row start
      // — one merge walk, O(chunks + ids)
      val sorted = chunks.sortBy(_.rowStartLocal)
      val out = mutable.ArrayBuffer.empty[ChunkMeta]
      var i = 0
      sorted.foreach { c =>
        val lo = off + c.rowStartLocal
        val hi = lo + c.nrows
        while (i < ids.length && ids(i) < lo) i += 1
        if (i < ids.length && ids(i) < hi) out += c
      }
      out.toSeq
  }

  // ---------------------------------------------------------------- meta

  def metaNames: Seq[String] =
    FsIO.list(s"$root/${Format.MetaDir}").filter(_.endsWith(".bin"))
      .map(_.stripSuffix(".bin"))

  /** Meta entries are arbitrary JSON trees (pycolumns Meta accepts any
    * JSON-serializable value, metafile.py:5-99) stored as UTF-8 JSON text.
    */
  def metaWrite(name: String, data: JVal): Unit =
    FsIO.writeAtomic(s"$root/${Format.MetaDir}/$name.bin",
      Json.render(data).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def metaRead(name: String): JVal =
    Json.parse(new String(FsIO.readAll(s"$root/${Format.MetaDir}/$name.bin"),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Dict-update semantics (pycolumns Meta.update, metafile.py:85-99):
    * top-level keys of `data` overwrite/extend the stored object.
    */
  def metaUpdate(name: String, data: JObj): JVal = {
    val merged = metaRead(name) match {
      case o: JObj => o.updated(data)
      case _ => throw new IllegalArgumentException(
        s"meta '$name' is not an object; update requires dict semantics")
    }
    metaWrite(name, merged)
    merged
  }

  def metaDelete(name: String): Unit =
    FsIO.delete(s"$root/${Format.MetaDir}/$name.bin")

  // ------------------------------------------------------------- evolve

  /** Add a column back-filled with a fill value for all existing rows
    * (pycolumns create_column + fill, columns.py:471-485, column.py:312-344).
    */
  def addColumn(c: ColumnSpec): Unit = {
    val s = spec
    require(!s.colNames.contains(c.name), s"column ${c.name} exists")
    writeSpec(s.copy(columns = s.columns :+ c.copy(addedAtSegment = nextSegment)))
  }

  /** Delete a column: schema entry dropped, chunk files removed. Stale
    * manifest entries for the column are harmless (readers resolve chunks
    * by requested column names only).
    */
  def dropColumn(name: String): Unit = {
    val s = spec
    require(s.colNames.contains(name), s"no such column $name")
    require(s.columns.size > 1, "cannot drop the last column")
    writeSpec(s.copy(columns = s.columns.filterNot(_.name == name)))
    for (seg <- segments) {
      val dir = Format.segDir(root, seg)
      FsIO.list(dir)
        .filter(f => f.matches(
          s"p\\d+\\.${java.util.regex.Pattern.quote(name)}(\\.c\\d+\\.v\\d+|\\.g\\d+)?\\.bin"))
        .foreach(f => FsIO.delete(s"$dir/$f"))
    }
    FsIO.delete(s"$root/${Format.IndexDir}/$name", recursive = true)
  }

  def dropStore(): Unit = FsIO.delete(root, recursive = true)
}
