package graft.index

import graft.codec.Bytes
import graft.store.{ColumnStore, FsIO, SelRange}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary index per column — the Spark-native replacement for the
  * reference's `.index`/`.sorted`/`.index1` trio (pycolumns
  * column.py:483-613).
  *
  * Build: `select(value, row_id) → repartitionByRange(value) →
  * sortWithinPartitions(value, row_id)` persisted as Parquet. Spark's
  * Tungsten external shuffle sort subsumes BOTH reference branches
  * (in-memory argsort and the external k-way mergesort, mergesort.py) —
  * SURVEY.md §2.3 I1-I3: do not reimplement.
  *
  * Lookup: because rows are globally value-sorted, Parquet row-group
  * min/max statistics are exactly the reference's coarse `index1` zone map
  * (every-10,000th sorted value, column.py:584-613): a `WHERE value > v`
  * prunes row groups the same way the in-RAM bisect prunes 10k-row windows,
  * then Catalyst's pushed filter refines within groups. Results are row-id
  * sets in value order (the reference's contract: `Indices`, value-sorted).
  *
  * Tie-break by row_id (documented divergence: numpy argsort tie order is
  * unspecified; reference tests use tie-free data).
  */
object Index {

  final val ValueCol = "value"
  final val RowIdCol = "row_id"

  def dir(store: ColumnStore, col: String): String =
    s"${store.root}/index/$col"

  private def metaPath(store: ColumnStore, col: String): String =
    s"${dir(store, col)}/_idxmeta.bin"

  def exists(store: ColumnStore, col: String): Boolean =
    FsIO.exists(metaPath(store, col))

  /** Index metadata: rows/stamp the build captured, plus the LIVE delta
    * generations (name, rows) — LSM-style sorted runs stacked on the base
    * sort by incremental refreshes. The meta is the COMMIT POINT: a gen
    * directory not listed here does not exist to readers (crashed refresh
    * attempts leave only invisible orphans, GC'd by the next refresh).
    */
  private[graft] final case class IdxMeta(rows: Long, stamp: Long,
      gens: Seq[(String, Long)]) {
    def deltaRows: Long = gens.map(_._2).sum
  }

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private[graft] def readMeta(store: ColumnStore, col: String): IdxMeta = {
    val r = new Bytes.Reader(FsIO.readAll(metaPath(store, col)))
    val rows = r.readVar()
    val stamp = if (r.remaining > 0) r.readVar() else -1L
    val gens =
      if (r.remaining > 0) {
        val n = r.readVar().toInt
        (0 until n).map { _ =>
          val name = new String(r.readBytes(r.readVar().toInt), utf8)
          (name, r.readVar())
        }
      } else Seq.empty
    IdxMeta(rows, stamp, gens)
  }

  private def writeMeta(store: ColumnStore, col: String, m: IdxMeta): Unit = {
    val w = new Bytes.Writer()
    w.writeVar(m.rows)
    w.writeVar(m.stamp)
    w.writeVar(m.gens.size.toLong)
    m.gens.foreach { case (name, rows) =>
      val b = name.getBytes(utf8)
      w.writeVar(b.length.toLong); w.writeBytes(b)
      w.writeVar(rows)
    }
    FsIO.writeAtomic(metaPath(store, col), w.result())
  }

  /** Rows visible to the index at build time (staleness contract: appends
    * don't appear until rebuild — tests/test_create_index.py:164-185).
    */
  def builtRows(store: ColumnStore, col: String): Long =
    readMeta(store, col).rows

  /** Store update-stamp captured at build time (-1 for legacy metas). */
  def builtStamp(store: ColumnStore, col: String): Long =
    readMeta(store, col).stamp

  /** May the DSv2 scan route THROUGH this index? Stricter than the API
    * staleness contract (stale reads are legal inside `updating{}`): scan
    * routing prunes row ranges before residual filtering, so the index must
    * reflect every append AND every in-place update — nrows and the store
    * update-stamp must both match what the build saw. One metadata read
    * (not exists + two readAlls — on an object store those are three
    * serial round-trips per scan-planning call).
    */
  def routableFor(store: ColumnStore, col: String): Boolean = {
    val meta =
      try FsIO.readAll(metaPath(store, col))
      catch { case _: Exception => return false } // no index
    val r = new Bytes.Reader(meta)
    val rows = r.readVar()
    val stamp = if (r.remaining > 0) r.readVar() else -1L
    rows == store.nrows && stamp >= 0 && stamp == store.updateStamp
  }

  /** Build (or rebuild) the index for a column. One shuffle, fully
    * distributed; partition count scales with data size so a 100× larger
    * table gets proportionally more sort partitions.
    */
  def create(spark: SparkSession, store: ColumnStore, col: String,
      overwrite: Boolean = false): Unit = {
    require(store.spec.col(col).ptypeId != graft.codec.PType.I32LIST.id,
      s"cannot index array column $col")
    if (exists(store, col)) {
      require(overwrite, s"index on $col exists " +
        "(reference raises unless overwrite=True, column.py:492-497)")
      drop(store, col)
    }
    val nrows = store.nrows
    val df = store.read(spark, Seq(col))
      .select(org.apache.spark.sql.functions.col(col).as(ValueCol),
        org.apache.spark.sql.functions.col("_row_id").as(RowIdCol))
    // ~2M rows per sort partition; bounded so tiny tables get 1 partition
    val parts = math.max(1, math.min(2048, (nrows / (2L << 20)).toInt + 1))
    df.repartitionByRange(parts, asc(ValueCol), asc(RowIdCol))
      .sortWithinPartitions(asc(ValueCol), asc(RowIdCol))
      .write.mode("overwrite").parquet(dir(store, col))
    // stamp recorded for DSv2 routing freshness (see routableFor); a full
    // build collapses every delta generation into the base sort
    writeMeta(store, col, IdxMeta(nrows, store.updateStamp, Seq.empty))
  }

  def drop(store: ColumnStore, col: String): Unit =
    FsIO.delete(dir(store, col), recursive = true)

  /** Re-stamp the index as fresh after a maintenance op that PRESERVES
    * every (value, row_id) pair — vacuum (COW chunk merge) and segment
    * compaction. Those ops bump partition update versions, so the store's
    * update stamp moves past the one the build captured and DSv2 routing
    * would disengage FOREVER despite the index still being exactly right.
    * Callers must verify the index was fresh BEFORE the maintenance op
    * (see Columns.vacuum) — re-stamping a stale index would launder real
    * staleness into routability.
    */
  def restamp(store: ColumnStore, col: String): Unit = {
    if (!exists(store, col)) return
    val m = readMeta(store, col)
    if (m.rows != store.nrows) return // a real rebuild is owed
    writeMeta(store, col, m.copy(stamp = store.updateStamp))
  }

  /** Names of the live delta generations (empty after a full build). */
  private[graft] def deltaGens(store: ColumnStore, col: String): Seq[String] =
    readMeta(store, col).gens.map(_._1)

  /** Every parquet path of the index: the base sort plus the meta-listed
    * delta generations. ALL index readers (API lookups, DSv2 routing) go
    * through this — gen dirs are underscore-prefixed, so the base read
    * never double-counts them, and unlisted (orphaned) gens are invisible.
    */
  def table(spark: SparkSession, store: ColumnStore, col: String): DataFrame = {
    val d = dir(store, col)
    val paths = d +: readMeta(store, col).gens.map { case (g, _) => s"$d/$g" }
    spark.read.parquet(paths: _*)
  }

  /** Bring the index up to date after APPENDS by sorting only the rows the
    * build has not seen — O(new rows), not a full re-sort (the reference
    * rebuilds from scratch on every append, column.py:615-626; at 100 TB a
    * per-append full re-sort of the whole column is the single most
    * expensive faithful behavior, so this deliberately improves on it).
    *
    * LSM shape: each refresh writes the new rows, value-sorted, as a delta
    * GENERATION (`_gen-*` dir) and commits it by listing it in the meta —
    * the meta write is the atomic commit point, so readers never observe a
    * half-written generation and a crashed attempt leaves only an orphan
    * dir the next refresh GCs. Each generation is itself range-sorted, so
    * Parquet row-group pruning applies per gen.
    *
    * Maintenance is amortized O(delta), NEVER periodically O(table):
    *  - more than `maxDeltaGens` gens → MERGE all gens + the new rows into
    *    one generation (cost = total delta rows, bounding per-scan file
    *    count without touching the base);
    *  - deltas reaching ~1/4 of the table → full rebuild restores one
    *    globally-sorted base (amortized: O(table) work per O(table/4) rows
    *    appended — the LSM compaction trade).
    *
    * Falls back to a full rebuild when rows were updated IN PLACE since
    * the build (the update stamp moved — deltas can't express changed
    * values) or when the meta predates stamps.
    */
  def refresh(spark: SparkSession, store: ColumnStore, col: String,
      maxDeltaGens: Int = 8): Unit = {
    if (!exists(store, col)) return
    val m = readMeta(store, col)
    val n = store.nrows
    if (m.rows == n && m.stamp == store.updateStamp) return // already fresh
    val newRows = n - m.rows
    val incrementalOk = m.stamp >= 0 && m.stamp == store.updateStamp && newRows > 0
    if (!incrementalOk || (m.deltaRows + newRows) * 4L > n) {
      create(spark, store, col, overwrite = true)
      return
    }
    val d = dir(store, col)
    val fresh = store.read(spark, Seq(col), SelRange(m.rows, n, 1L))
      .select(org.apache.spark.sql.functions.col(col).as(ValueCol),
        org.apache.spark.sql.functions.col("_row_id").as(RowIdCol))
    val merge = m.gens.size >= maxDeltaGens
    val (df, genRows, newGens) =
      if (merge) {
        // collapse every gen + the new rows into ONE generation — reads
        // only delta data, the base sort is untouched
        val old = spark.read.parquet(m.gens.map(g => s"$d/${g._1}"): _*)
        (old.unionAll(fresh), m.deltaRows + newRows, Seq.empty[(String, Long)])
      } else (fresh, newRows, m.gens)
    val parts = math.max(1, math.min(2048, (genRows / (2L << 20)).toInt + 1))
    val gen = s"_gen-${java.util.UUID.randomUUID().toString.take(12)}"
    df.repartitionByRange(parts, asc(ValueCol), asc(RowIdCol))
      .sortWithinPartitions(asc(ValueCol), asc(RowIdCol))
      .write.mode("overwrite").parquet(s"$d/$gen")
    // COMMIT: the meta swap makes the new generation (and, on merge, the
    // disappearance of the old ones) visible atomically
    writeMeta(store, col, IdxMeta(n, store.updateStamp, newGens :+ (gen, genRows)))
    // GC: gen dirs no longer referenced — merged-away gens and orphans of
    // crashed attempts. GRACE PERIOD from DE-LISTING (like table-format
    // snapshot expiry): a reader that loaded the previous meta may still be
    // mid-read on a just-merged gen, and the dir's own age says nothing
    // about that — so the first refresh that finds a dir unreferenced
    // writes a `_gone` tombstone (starting the clock), and only a LATER
    // refresh deletes it once the tombstone outlives the grace window.
    val grace = sys.props.get("graft.index.gc.graceMs").map(_.toLong)
      .getOrElse(15L * 60 * 1000)
    val now = System.currentTimeMillis()
    val live = (newGens.map(_._1) :+ gen).toSet
    FsIO.list(d).filter(f => f.startsWith("_gen-") && !live(f)).foreach { f =>
      val tomb = s"$d/$f/_gone"
      try {
        if (!FsIO.exists(tomb)) {
          val w = new Bytes.Writer()
          w.writeVar(now)
          FsIO.writeAtomic(tomb, w.result())
        } else if (now - new Bytes.Reader(FsIO.readAll(tomb)).readVar() > grace) {
          FsIO.delete(s"$d/$f", recursive = true)
        }
      } catch { case _: Exception => () } // GC is best-effort, never fatal
    }
  }

  private def load(spark: SparkSession, store: ColumnStore, col: String): DataFrame = {
    require(exists(store, col),
      s"column $col has no index (reference raises, column.py:476-481)")
    table(spark, store, col)
  }

  // ------------------------------------------------------- query surface
  // All return a DataFrame[row_id: bigint] in value-then-row_id order
  // (the reference returns Indices slices of the value-sorted permutation).

  private def ids(df: DataFrame, cond: Column): DataFrame =
    df.where(cond).select(RowIdCol)

  def gt(spark: SparkSession, s: ColumnStore, c: String, v: Any): DataFrame =
    ids(load(spark, s, c), col(ValueCol) > lit(v))
  def ge(spark: SparkSession, s: ColumnStore, c: String, v: Any): DataFrame =
    ids(load(spark, s, c), col(ValueCol) >= lit(v))
  def lt(spark: SparkSession, s: ColumnStore, c: String, v: Any): DataFrame =
    ids(load(spark, s, c), col(ValueCol) < lit(v))
  def le(spark: SparkSession, s: ColumnStore, c: String, v: Any): DataFrame =
    ids(load(spark, s, c), col(ValueCol) <= lit(v))
  def eq(spark: SparkSession, s: ColumnStore, c: String, v: Any): DataFrame =
    ids(load(spark, s, c), col(ValueCol) === lit(v))
  def ne(spark: SparkSession, s: ColumnStore, c: String, v: Any): DataFrame =
    ids(load(spark, s, c), col(ValueCol) =!= lit(v))

  /** All four interval types (pycolumns between, column.py:841-914):
    * "[]" closed, "[)" half-open right, "(]" half-open left, "()" open.
    */
  def between(spark: SparkSession, s: ColumnStore, c: String, lo: Any, hi: Any,
      interval: String = "[]"): DataFrame = {
    val v = col(ValueCol)
    val cond = interval match {
      case "[]" => v >= lit(lo) && v <= lit(hi)
      case "[)" => v >= lit(lo) && v < lit(hi)
      case "(]" => v > lit(lo) && v <= lit(hi)
      case "()" => v > lit(lo) && v < lit(hi)
      case other => throw new IllegalArgumentException(s"bad interval '$other'")
    }
    ids(load(spark, s, c), cond)
  }

  /** IN-list (pycolumns match, column.py:688-729). Small lists compile to
    * `isin` (pushed to parquet); large probe sets should use
    * `matchDf` (broadcast semi join) instead.
    */
  def matchIn(spark: SparkSession, s: ColumnStore, c: String, values: Seq[Any]): DataFrame =
    ids(load(spark, s, c), col(ValueCol).isin(values: _*))

  /** IN via join for large probe sets: broadcast left-semi join against the
    * index (SURVEY.md Q4 mapping).
    */
  def matchDf(spark: SparkSession, s: ColumnStore, c: String, probe: DataFrame): DataFrame = {
    val p = probe.toDF(ValueCol).distinct()
    load(spark, s, c)
      .join(broadcast(p), Seq(ValueCol), "left_semi")
      .select(RowIdCol)
  }
}

/** Boolean combination of row-id sets (pycolumns Indices & / |,
  * indices.py:123-139): sorted-unique contract preserved structurally —
  * intersect/union produce distinct ids; ordering applied on materialize.
  */
object RowIds {
  def and(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def or(a: DataFrame, b: DataFrame): DataFrame = a.union(b).distinct()

  /** Materialize as a sorted Array[Long] (Indices are sorted unique int64).
    *
    * DRIVER-MATERIALIZATION CONTRACT: this is an UNBOUNDED `collect()`,
    * provided only to honor the pycolumns `Indices` array surface
    * (indices.py materializes eagerly) — tests and small interactive
    * results. Engine paths must never call it: keep row-id sets as
    * DataFrames and compose them with [[graft.api.Columns.gather]] /
    * `Index.matchDf`, which stay distributed at any cardinality.
    */
  def collectSorted(df: DataFrame): Array[Long] =
    df.distinct().orderBy(Index.RowIdCol).collect().map(_.getLong(0))
}
