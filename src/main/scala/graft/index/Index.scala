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

  /** Rows visible to the index at build time (staleness contract: appends
    * don't appear until rebuild — tests/test_create_index.py:164-185).
    */
  def builtRows(store: ColumnStore, col: String): Long = {
    val r = new Bytes.Reader(FsIO.readAll(metaPath(store, col)))
    r.readVar()
  }

  /** Store update-stamp captured at build time (-1 for legacy metas). */
  def builtStamp(store: ColumnStore, col: String): Long = {
    val r = new Bytes.Reader(FsIO.readAll(metaPath(store, col)))
    r.readVar()
    if (r.remaining > 0) r.readVar() else -1L
  }

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
    val w = new Bytes.Writer()
    w.writeVar(nrows)
    w.writeVar(store.updateStamp) // for DSv2 routing freshness (see routableFor)
    FsIO.writeAtomic(metaPath(store, col), w.result())
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
    if (builtRows(store, col) != store.nrows) return // a real rebuild is owed
    val w = new Bytes.Writer()
    w.writeVar(store.nrows)
    w.writeVar(store.updateStamp)
    FsIO.writeAtomic(metaPath(store, col), w.result())
  }

  private val DeltaRe = """^delta-(\d+)-\d+\.parquet$""".r

  /** Row offsets of the delta generations already hoisted into the index
    * dir (one generation per incremental refresh since the last full build).
    */
  private[graft] def deltaGens(store: ColumnStore, col: String): Seq[Long] =
    FsIO.list(dir(store, col)).collect { case DeltaRe(f) => f.toLong }
      .distinct.sorted

  /** Bring the index up to date after APPENDS by sorting only the rows the
    * build has not seen — O(new-segment), not a full re-sort (the reference
    * rebuilds from scratch on every append, column.py:615-626; at 100 TB a
    * per-append full re-sort of the whole column is the single most
    * expensive faithful behavior, so this deliberately improves on it).
    *
    * Mechanics: rows `[builtRows, nrows)` are read chunk-pruned (only the
    * new segments' chunks decode), range-sorted by value, and the resulting
    * part files are hoisted INTO the index dir under deterministic names
    * (`delta-<fromRow>-<i>.parquet`). Every reader — API lookups and the
    * DSv2 index routing — does `spark.read.parquet(dir)`, so deltas are
    * visible with no read-path change; each delta is itself value-sorted,
    * so Parquet row-group pruning still applies per generation.
    *
    * Crash safety: the meta (rows, stamp) commits LAST, so a crashed
    * refresh leaves the index formally stale (DSv2 routing stays off, the
    * next refresh retries); the retry first deletes any partial
    * `delta-<from>-*` files, so no row is ever indexed twice.
    *
    * Falls back to a full rebuild when rows were updated IN PLACE since the
    * build (the update stamp moved — delta rows can't express changed
    * values), when the meta predates stamps, or after `maxDeltaGens`
    * generations (bounding the per-scan file count; the rebuild collapses
    * deltas back into one sorted table).
    */
  def refresh(spark: SparkSession, store: ColumnStore, col: String,
      maxDeltaGens: Int = 8): Unit = {
    if (!exists(store, col)) return
    val r = new Bytes.Reader(FsIO.readAll(metaPath(store, col)))
    val built = r.readVar()
    val stamp = if (r.remaining > 0) r.readVar() else -1L
    val n = store.nrows
    if (built == n && stamp == store.updateStamp) return // already fresh
    val incrementalOk = stamp >= 0 && stamp == store.updateStamp &&
      built < n && deltaGens(store, col).size < maxDeltaGens
    if (!incrementalOk) { create(spark, store, col, overwrite = true); return }
    val from = built
    val d = dir(store, col)
    // retry hygiene: a crashed prior attempt may have hoisted SOME files of
    // this generation before the meta committed — drop them first
    FsIO.list(d)
      .filter(f => f.startsWith(s"delta-$from-") && f.endsWith(".parquet"))
      .foreach(f => FsIO.delete(s"$d/$f"))
    val df = store.read(spark, Seq(col), SelRange(from, n, 1L))
      .select(org.apache.spark.sql.functions.col(col).as(ValueCol),
        org.apache.spark.sql.functions.col("_row_id").as(RowIdCol))
    val parts = math.max(1, math.min(2048, ((n - from) / (2L << 20)).toInt + 1))
    val tmp = s"$d/.delta-tmp-$from" // dot-prefixed: hidden from index reads
    df.repartitionByRange(parts, asc(ValueCol), asc(RowIdCol))
      .sortWithinPartitions(asc(ValueCol), asc(RowIdCol))
      .write.mode("overwrite").parquet(tmp)
    val files = FsIO.list(tmp).filter(_.endsWith(".parquet")).sorted
    files.zipWithIndex.foreach { case (f, i) =>
      FsIO.rename(s"$tmp/$f", s"$d/delta-$from-$i.parquet")
    }
    FsIO.delete(tmp, recursive = true)
    val w = new Bytes.Writer()
    w.writeVar(n)
    w.writeVar(store.updateStamp)
    FsIO.writeAtomic(metaPath(store, col), w.result())
  }

  private def load(spark: SparkSession, store: ColumnStore, col: String): DataFrame = {
    require(exists(store, col),
      s"column $col has no index (reference raises, column.py:476-481)")
    spark.read.parquet(dir(store, col))
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
