package graft.store

import graft.codec._
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Executor-side chunk decode for one (segment, partition) unit.
  * Mirrors the reference read path (pycolumns chunks.py:633-669: histogram
  * rows per chunk, decompress each touched chunk once, slice rows out) —
  * here each unit decodes its pruned chunk list sequentially and emits Rows.
  */
object Decode {

  /** Chunk integrity checking on read (CRC32C vs the manifest), enabled
    * with -Dgraft.verify.crc=true. Off by default: the reference does not
    * checksum reads either, and the cost is ~15%% of decode time.
    */
  private val verifyCrc: Boolean =
    java.lang.Boolean.getBoolean("graft.verify.crc")

  private def readBlob(u: DecodeUnit, cm: ChunkMeta): Array[Byte] = {
    val blob = FsIO.readRange(
      s"${Format.segDir(u.root, u.segment)}/${cm.file}", cm.offset, cm.nbytes.toInt)
    if (verifyCrc) {
      val crc = FsIO.crc32c(blob)
      require(crc == cm.crc,
        s"chunk CRC mismatch in ${cm.file} @${cm.offset}: " +
          f"manifest ${cm.crc}%08x, read $crc%08x (corruption or torn write)")
    }
    blob
  }

  /** Typed accessor facade over a decoded chunk. */
  private final class VecView(vec: ColVec) {
    private val listOffsets: Array[Int] = vec match {
      case IntListVec(lengths, _) =>
        val o = new Array[Int](lengths.length + 1)
        var i = 0
        while (i < lengths.length) { o(i + 1) = o(i) + lengths(i); i += 1 }
        o
      case _ => null
    }

    def get(i: Int): Any = vec match {
      case LongVec(a) => a(i)
      case IntVec(a) => a(i)
      case ShortVec(a) => a(i)
      case DoubleVec(a) => a(i)
      case FloatVec(a) => a(i)
      case BoolVec(a) => a(i)
      case StrVec(a) => a(i)
      case BinVec(a) => a(i)
      case l: IntListVec =>
        val from = listOffsets(i)
        val until = listOffsets(i + 1)
        val out = new Array[Int](until - from)
        System.arraycopy(l.values, from, out, 0, out.length)
        out.toSeq
    }

    /** Catalyst-value accessor for the unboxed InternalRow read path:
      * strings as UTF8String, token lists as UnsafeArrayData (one bulk
      * copy, no per-int boxing).
      */
    def getInternal(i: Int): Any = vec match {
      case StrVec(a) => UTF8String.fromString(a(i))
      case l: IntListVec =>
        val from = listOffsets(i)
        val until = listOffsets(i + 1)
        val out = new Array[Int](until - from)
        System.arraycopy(l.values, from, out, 0, out.length)
        UnsafeArrayData.fromPrimitiveArray(out)
      case _ => get(i)
    }
  }

  /** Default/parsed fill value for columns added after this segment
    * (pycolumns backfill: 0 / '' / fill_value, column.py:312-344).
    */
  def fillValue(cs: ColumnSpec): Any = {
    val f = cs.fill
    cs.ptype match {
      case PType.I64 => f.map(_.toLong).getOrElse(0L)
      case PType.I32 => f.map(_.toInt).getOrElse(0)
      case PType.I16 => f.map(_.toShort).getOrElse(0.toShort)
      case PType.F64 => f.map(_.toDouble).getOrElse(0.0)
      case PType.F32 => f.map(_.toFloat).getOrElse(0.0f)
      case PType.BOOL => f.exists(_.toBoolean)
      case PType.STR => f.getOrElse("")
      case PType.BIN => f.map(_.getBytes("UTF-8")).getOrElse(Array.empty[Byte])
      case PType.I32LIST => Seq.empty[Int]
    }
  }

  /** Selected local row indices for a unit, ascending, with output
    * positions (for SelIds request-order reconstruction).
    */
  private def selectedLocals(u: DecodeUnit): (Array[Long], Array[Long]) = u.sel match {
    case SelAll =>
      val n = u.partRows.toInt
      val loc = new Array[Long](n)
      var i = 0
      while (i < n) { loc(i) = i; i += 1 }
      (loc, null)
    case SelRange(start, stop, step) =>
      val lo = math.max(start, u.globalOffset)
      val hi = math.min(stop, u.globalOffset + u.partRows)
      val out = mutable.ArrayBuilder.make[Long]
      // first gid >= lo on the step grid anchored at start
      val k0 = if (lo <= start) 0L else (lo - start + step - 1) / step
      var gid = start + k0 * step
      while (gid < hi) {
        out += gid - u.globalOffset
        gid += step
      }
      (out.result(), null)
    case SelRanges(starts, stops) =>
      val out = mutable.ArrayBuilder.make[Long]
      var i = 0
      while (i < starts.length) {
        var gid = math.max(starts(i), u.globalOffset)
        val hi = math.min(stops(i), u.globalOffset + u.partRows)
        while (gid < hi) {
          out += gid - u.globalOffset
          gid += 1
        }
        i += 1
      }
      (out.result(), null)
    case SelIds(ids, pos) =>
      // sorted disk order (the reference's sortind gather,
      // _column_pywrap.c:616-668); positions scatter results back
      val order = ids.indices.sortBy(ids(_))
      val loc = new Array[Long](ids.length)
      val p = new Array[Long](ids.length)
      var i = 0
      order.foreach { oi =>
        loc(i) = ids(oi) - u.globalOffset
        p(i) = pos(oi)
        i += 1
      }
      (loc, p)
  }

  /** DSv2 read path: emit InternalRows directly (catalyst values; token
    * arrays via UnsafeArrayData bulk copies). outFields selects/permutes
    * from (_row_id, wanted...).
    */
  def decodeUnitInternal(u: DecodeUnit, spec: TableSpec, wanted: Seq[String],
      outFields: Seq[String]): Iterator[InternalRow] = {
    val (locals, _) = selectedLocals(u)
    if (locals.isEmpty) return Iterator.empty
    val n = locals.length
    val colValues = new Array[Array[Any]](wanted.size)
    var ci = 0
    wanted.foreach { cn =>
      val cs = spec.col(cn)
      val chunks = u.colChunks(cn)
      val vals = new Array[Any](n)
      if (chunks.isEmpty) {
        val fv = fillValue(cs) match {
          case s: String => UTF8String.fromString(s)
          case seq: Seq[_] => UnsafeArrayData.fromPrimitiveArray(
            seq.map(_.asInstanceOf[Number].intValue).toArray)
          case other => other
        }
        java.util.Arrays.fill(vals.asInstanceOf[Array[AnyRef]], fv.asInstanceOf[AnyRef])
      } else {
        val sorted = chunks.sortBy(_.rowStartLocal)
        var si = 0
        sorted.foreach { cm =>
          val lo = cm.rowStartLocal
          val hi = lo + cm.nrows
          while (si < n && locals(si) < lo) si += 1
          if (si < n && locals(si) < hi) {
            val view = new VecView(Chunk.decode(readBlob(u, cm)))
            while (si < n && locals(si) < hi) {
              vals(si) = view.getInternal((locals(si) - lo).toInt)
              si += 1
            }
          }
        }
        // same coverage contract as decodeUnit: a planning gap must fail
        // loudly, not surface as NPEs / silent nulls downstream
        require((0 until n).forall(vals(_) != null),
          s"selection not fully covered by chunks for column $cn in " +
            s"seg=${u.segment} part=${u.part}")
      }
      colValues(ci) = vals
      ci += 1
    }
    // map outFields onto (_row_id, wanted...) positions
    val srcIdx = outFields.map {
      case "_row_id" => -1
      case cn => wanted.indexOf(cn)
    }.toArray
    (0 until n).iterator.map { i =>
      val arr = new Array[Any](srcIdx.length)
      var f = 0
      while (f < srcIdx.length) {
        arr(f) = if (srcIdx(f) < 0) u.globalOffset + locals(i)
          else colValues(srcIdx(f))(i)
        f += 1
      }
      new GenericInternalRow(arr)
    }
  }

  def decodeUnit(u: DecodeUnit, spec: TableSpec,
      wanted: Seq[String]): Iterator[Row] = {
    val (locals, positions) = selectedLocals(u)
    if (locals.isEmpty) return Iterator.empty
    val n = locals.length
    val colValues = new Array[Array[Any]](wanted.size)

    var ci = 0
    wanted.foreach { cn =>
      val cs = spec.col(cn)
      val chunks = u.colChunks(cn)
      val vals = new Array[Any](n)
      if (chunks.isEmpty) {
        // synthesized fill column for segments predating the column
        val fv = fillValue(cs)
        java.util.Arrays.fill(vals.asInstanceOf[Array[AnyRef]], fv.asInstanceOf[AnyRef])
      } else {
        val sorted = chunks.sortBy(_.rowStartLocal)
        var si = 0 // cursor into locals (ascending)
        sorted.foreach { cm =>
          val lo = cm.rowStartLocal
          val hi = lo + cm.nrows
          // advance to first selected local in this chunk
          while (si < n && locals(si) < lo) si += 1
          if (si < n && locals(si) < hi) {
            val view = new VecView(Chunk.decode(readBlob(u, cm)))
            while (si < n && locals(si) < hi) {
              vals(si) = view.get((locals(si) - lo).toInt)
              si += 1
            }
          }
        }
        require((0 until n).forall(vals(_) != null),
          s"selection not fully covered by chunks for column $cn in " +
            s"seg=${u.segment} part=${u.part}")
      }
      colValues(ci) = vals
      ci += 1
    }

    val hasPos = positions != null
    (0 until n).iterator.map { i =>
      val base = mutable.ArrayBuffer[Any](u.globalOffset + locals(i))
      if (hasPos) base += positions(i)
      var c = 0
      while (c < colValues.length) { base += colValues(c)(i); c += 1 }
      Row.fromSeq(base.toSeq)
    }
  }
}
