package graft.sources

import graft.store._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util.{Map => JMap, Set => JSet}
import scala.collection.mutable

/** DataSource V2 read connector: `spark.read.format("graft").load(root)`.
  *
  * Catalyst integration (the Spark-first alternative to the API read path):
  *  - column pruning (SupportsPushDownRequiredColumns) reaches the file
  *    level — unselected columns' chunk files are never opened;
  *  - filter pushdown (SupportsPushDownFilters): `_row_id` comparisons
  *    become row-range pruning, and comparisons on numeric columns prune
  *    CHUNKS through the manifest's per-chunk min/max zone map — the
  *    base-data analogue of Parquet row-group statistics (the reference's
  *    index1 coarse index, pycolumns column.py:584-613). Pushed filters are
  *    also returned as residuals, so Spark re-applies them exactly —
  *    pruning is a performance contract, not a correctness one (same model
  *    as the built-in Parquet source).
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def root(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source requires a path"))
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTable.fullSchema(ColumnStore.open(root(options)).spec)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object GraftTable {
  def fullSchema(spec: TableSpec): StructType =
    StructType(StructField("_row_id", LongType, nullable = false) +:
      spec.columns.map(c =>
        StructField(c.name, ColumnStore.sparkType(c.ptype), nullable = false)))
}

class GraftTable(root: String) extends Table with SupportsRead {
  private val store = ColumnStore.open(root)
  override def name(): String = s"graft.`$root`"
  override def schema(): StructType = GraftTable.fullSchema(store.spec)
  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root)
}

class GraftScanBuilder(root: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private val store = ColumnStore.open(root)
  private val spec = store.spec
  private var required: StructType = GraftTable.fullSchema(spec)
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Spark may prune everything (count(*)): keep _row_id as the cheapest
    // column to materialize row existence
    required =
      if (requiredSchema.isEmpty)
        StructType(Seq(StructField("_row_id", LongType, nullable = false)))
      else requiredSchema
  }

  /** Accept (for pruning) filters we can evaluate against the zone map;
    * everything is ALSO returned as residual so Spark re-applies exactly.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftScan.prunable(spec, _))
    filters // all residual: chunk pruning is best-effort, like Parquet
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GraftScan(root, required, pushed)
}

object GraftScan {
  private def statsKind(spec: TableSpec, col: String): Int =
    if (col == "_row_id") 1
    else spec.columns.find(_.name == col).map(_.ptype) match {
      case Some(graft.codec.PType.I64) | Some(graft.codec.PType.I32) |
           Some(graft.codec.PType.I16) | Some(graft.codec.PType.BOOL) => 1
      case Some(graft.codec.PType.F64) | Some(graft.codec.PType.F32) => 2
      case _ => 0
    }

  def prunable(spec: TableSpec, f: Filter): Boolean = f match {
    case sources.GreaterThan(c, v: Number) => statsKind(spec, c) != 0
    case sources.GreaterThanOrEqual(c, v: Number) => statsKind(spec, c) != 0
    case sources.LessThan(c, v: Number) => statsKind(spec, c) != 0
    case sources.LessThanOrEqual(c, v: Number) => statsKind(spec, c) != 0
    case sources.EqualTo(c, v: Number) => statsKind(spec, c) != 0
    case sources.And(l, r) => prunable(spec, l) && prunable(spec, r)
    case _ => false
  }

  /** Value interval [lo, hi] implied by a filter for a column (inclusive,
    * in doubles — exact enough for pruning decisions).
    */
  private def interval(f: Filter, col: String): Option[(Double, Double)] = f match {
    case sources.GreaterThan(c, v: Number) if c == col =>
      Some((v.doubleValue, Double.PositiveInfinity))
    case sources.GreaterThanOrEqual(c, v: Number) if c == col =>
      Some((v.doubleValue, Double.PositiveInfinity))
    case sources.LessThan(c, v: Number) if c == col =>
      Some((Double.NegativeInfinity, v.doubleValue))
    case sources.LessThanOrEqual(c, v: Number) if c == col =>
      Some((Double.NegativeInfinity, v.doubleValue))
    case sources.EqualTo(c, v: Number) if c == col =>
      Some((v.doubleValue, v.doubleValue))
    case _ => None
  }

  /** Global row ranges whose chunks can satisfy all pushed filters. */
  def planSelection(store: ColumnStore, pushed: Array[Filter]): Selection = {
    if (pushed.isEmpty) return SelAll
    val spec = store.spec
    // flatten ANDs
    def flat(f: Filter): Seq[Filter] = f match {
      case sources.And(l, r) => flat(l) ++ flat(r)
      case other => Seq(other)
    }
    val fs = pushed.flatMap(flat)
    // _row_id bounds
    var rowLo = 0L
    var rowHi = Long.MaxValue
    fs.foreach {
      case sources.GreaterThan(c, v: Number) if c == "_row_id" =>
        rowLo = math.max(rowLo, v.longValue + 1)
      case sources.GreaterThanOrEqual(c, v: Number) if c == "_row_id" =>
        rowLo = math.max(rowLo, v.longValue)
      case sources.LessThan(c, v: Number) if c == "_row_id" =>
        rowHi = math.min(rowHi, v.longValue)
      case sources.LessThanOrEqual(c, v: Number) if c == "_row_id" =>
        rowHi = math.min(rowHi, v.longValue + 1)
      case sources.EqualTo(c, v: Number) if c == "_row_id" =>
        rowLo = math.max(rowLo, v.longValue); rowHi = math.min(rowHi, v.longValue + 1)
      case _ =>
    }
    // value predicates -> surviving chunk row-ranges per column, intersected
    val valueCols = fs.flatMap {
      case f =>
        spec.columns.map(_.name).filter(c => interval(f, c).isDefined)
          .map(c => (c, interval(f, c).get))
    }
    var ranges: Option[Seq[(Long, Long)]] = None
    if (valueCols.nonEmpty) {
      val byCol = valueCols.groupBy(_._1)
      byCol.foreach { case (colName, ivs) =>
        val lo = ivs.map(_._2._1).max
        val hi = ivs.map(_._2._2).min
        val cs = spec.columns.find(_.name == colName)
        val surviving = mutable.ArrayBuffer.empty[(Long, Long)]
        for ((seg, part, off, rows) <- store.partOffsets()) {
          val m = store.partManifest(seg, part)
          val colChunks = m.chunks.filter(_.column == colName)
          if (colChunks.isEmpty) {
            // column backfilled after this segment: every row carries the
            // fill value. Include the partition when the fill satisfies the
            // interval; conservatively include if the fill is non-numeric.
            val fillOk = cs.forall { c =>
              Decode.fillValue(c) match {
                case n: Number => val d = n.doubleValue; d >= lo && d <= hi
                case b: Boolean => val d = if (b) 1.0 else 0.0; d >= lo && d <= hi
                case _ => true
              }
            }
            if (fillOk) surviving += ((off, off + rows))
          } else colChunks.foreach { cm =>
            val keep =
              if (cm.statsKind == 0) true // no stats (e.g. NaN-bearing): can't prune
              else {
                val (cMin, cMax) =
                  if (cm.statsKind == 1) (cm.minBits.toDouble, cm.maxBits.toDouble)
                  else (java.lang.Double.longBitsToDouble(cm.minBits),
                    java.lang.Double.longBitsToDouble(cm.maxBits))
                cMax >= lo && cMin <= hi
              }
            if (keep)
              surviving += ((off + cm.rowStartLocal, off + cm.rowStartLocal + cm.nrows))
          }
        }
        val merged = mergeRanges(surviving.toSeq)
        ranges = Some(ranges.fold(merged)(prev => intersectRanges(prev, merged)))
      }
    }
    val base: Seq[(Long, Long)] = ranges.getOrElse(Seq((0L, Long.MaxValue)))
    val clipped = base.map { case (a, b) => (math.max(a, rowLo), math.min(b, rowHi)) }
      .filter { case (a, b) => a < b }
    if (clipped.isEmpty) SelRanges(Array.empty, Array.empty)
    else if (clipped == Seq((0L, Long.MaxValue))) SelAll
    else if (clipped.size == 1) SelRange(clipped.head._1, clipped.head._2, 1L)
    else SelRanges(clipped.map(_._1).toArray, clipped.map(_._2).toArray)
  }

  def mergeRanges(rs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    if (rs.isEmpty) return Seq.empty
    val sorted = rs.sortBy(_._1)
    val out = mutable.ArrayBuffer(sorted.head)
    sorted.tail.foreach { case (a, b) =>
      val (la, lb) = out.last
      if (a <= lb) out(out.size - 1) = (la, math.max(lb, b))
      else out += ((a, b))
    }
    out.toSeq
  }

  def intersectRanges(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    var j = 0
    val xs = x.sortBy(_._1)
    val ys = y.sortBy(_._1)
    while (i < xs.length && j < ys.length) {
      val lo = math.max(xs(i)._1, ys(j)._1)
      val hi = math.min(xs(i)._2, ys(j)._2)
      if (lo < hi) out += ((lo, hi))
      if (xs(i)._2 < ys(j)._2) i += 1 else j += 1
    }
    out.toSeq
  }
}

class GraftScan(root: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan root=$root, PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val store = ColumnStore.open(root)
    val sel = GraftScan.planSelection(store, pushed)
    val wanted = required.fieldNames.filterNot(_ == "_row_id").toSeq
    val (units, _) = store.planUnits(wanted, sel)
    units.map(u => GraftInputPartition(u, store.spec, wanted,
      required.fieldNames.toSeq): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required)
}

final case class GraftInputPartition(unit: DecodeUnit, spec: TableSpec,
    wanted: Seq[String], outFields: Seq[String]) extends InputPartition

class GraftReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new PartitionReader[InternalRow] {
      // unboxed path: Decode emits catalyst values directly (UTF8String,
      // UnsafeArrayData bulk copies), permuted to the required fields
      private val it = Decode.decodeUnitInternal(p.unit, p.spec, p.wanted, p.outFields)
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        current = it.next()
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
