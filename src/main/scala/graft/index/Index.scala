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

  private def legacyMetaPath(store: ColumnStore, col: String): String =
    s"${dir(store, col)}/_idxmeta.bin"

  /** Index metadata: rows/stamp the build captured, plus the LIVE delta
    * generations (name, rows) — LSM-style sorted runs stacked on the base
    * sort by incremental refreshes. The meta is the COMMIT POINT: a gen
    * directory not listed here does not exist to readers (crashed refresh
    * attempts leave only invisible orphans, GC'd by the next refresh).
    *
    * CONCURRENCY (CAS commits): metas are EPOCH-NAMED files
    * `_meta-<epoch>-<uuid>.bin`, published by atomic rename; the effective
    * meta is the one with the highest epoch (uuid ascending breaks the
    * rare same-epoch tie deterministically). A writer reads the winner at
    * epoch e, does its work, commits at e+1, then re-lists: if its file is
    * not the winner it LOST the race — it re-reads and retries or no-ops.
    * A losing writer's GEN dirs are left in place (a reader that sampled
    * its meta mid-race keeps every dir it references, protected by the
    * tombstone grace); superseded meta FILES are swept by the winner, and
    * readers re-list on a failed read. Two same-epoch commits are both valid
    * views built from the same parent; picking either is equivalent to one
    * of the two racing writers having committed last. A legacy single
    * `_idxmeta.bin` (pre-CAS stores) reads as epoch 0.
    *
    * BASE VERSIONING: the base sort lives in a meta-named `_base-<uuid>`
    * subdir (`base`; "" = legacy root layout). A full REBUILD writes a NEW
    * base dir and commits it — it never overwrites files another meta
    * references, so an incremental refresh racing a rebuild yields two
    * self-consistent candidate metas (old base + delta vs new base) and
    * the CAS picks one; the loser's dirs age out through the same
    * tombstone-grace GC as generations. (With an overwritten-in-place
    * base, the racing incremental meta would have double-listed the
    * rebuilt rows — new-base ∪ old-delta — a correctness bug, not a leak.)
    */
  private[graft] final case class IdxMeta(rows: Long, stamp: Long,
      gens: Seq[(String, Long)], base: String = "") {
    def deltaRows: Long = gens.map(_._2).sum
  }

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val MetaName = """_meta-(\d+)-([0-9a-f]+)\.bin""".r

  /** Meta files winner-first: epoch descending, then uuid ascending. */
  private def listMetas(d: String): Seq[(Long, String)] =
    FsIO.list(d).collect { case n @ MetaName(e, u) => (e.toLong, u, n) }
      .sortBy { case (e, u, _) => (-e, u) }
      .map { case (e, _, n) => (e, n) }

  def exists(store: ColumnStore, col: String): Boolean = {
    val d = dir(store, col)
    listMetas(d).nonEmpty || FsIO.exists(legacyMetaPath(store, col))
  }

  private def parseMeta(bytes: Array[Byte]): IdxMeta = {
    val r = new Bytes.Reader(bytes)
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
    val base =
      if (r.remaining > 0) new String(r.readBytes(r.readVar().toInt), utf8)
      else "" // legacy: base sort at the index dir root
    IdxMeta(rows, stamp, gens, base)
  }

  /** Effective meta + its epoch. Retries on a read of a just-GC'd meta
    * file (re-list picks the live winner).
    */
  private[graft] def readMetaEpoch(store: ColumnStore, col: String): (IdxMeta, Long) = {
    val d = dir(store, col)
    var attempt = 0
    while (true) {
      val metas = listMetas(d)
      try {
        return metas.headOption match {
          case Some((e, name)) => (parseMeta(FsIO.readAll(s"$d/$name")), e)
          case None => (parseMeta(FsIO.readAll(legacyMetaPath(store, col))), 0L)
        }
      } catch {
        case _: java.io.IOException if attempt < 3 => attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private[graft] def readMeta(store: ColumnStore, col: String): IdxMeta =
    readMetaEpoch(store, col)._1

  /** Identity of the effective meta FILE (epoch + uuid name; "legacy" for
    * pre-CAS stores). Every index build/refresh commits a fresh uuid-named
    * meta, so this string changes whenever the index content can change —
    * including a store deleted and rebuilt at the SAME path with the same
    * nrows/stamp. Used as the content-identifying part of planning-cache
    * keys (GraftScan.cachedPlan).
    */
  private[graft] def metaIdent(store: ColumnStore, col: String): String =
    listMetas(dir(store, col)).headOption.map(_._2).getOrElse("legacy")

  /** CAS commit: publish `m` at `epoch` and return whether we WON (our
    * file is the effective meta). On a win, sweeps every superseded meta
    * file: in-flight readers that already listed re-list on the failed
    * read (readMetaEpoch retries), and readers mid-scan of a superseded
    * meta's GENS are protected by the tombstone grace window, so the meta
    * files themselves need no retention.
    */
  private[graft] def commitMeta(store: ColumnStore, col: String, m: IdxMeta,
      epoch: Long): Boolean = {
    val d = dir(store, col)
    val uuid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val name = f"_meta-$epoch%019d-$uuid.bin"
    val w = new Bytes.Writer()
    w.writeVar(m.rows)
    w.writeVar(m.stamp)
    w.writeVar(m.gens.size.toLong)
    m.gens.foreach { case (gn, rows) =>
      val b = gn.getBytes(utf8)
      w.writeVar(b.length.toLong); w.writeBytes(b)
      w.writeVar(rows)
    }
    val bb = m.base.getBytes(utf8)
    w.writeVar(bb.length.toLong); w.writeBytes(bb)
    FsIO.writeAtomic(s"$d/$name", w.result())
    val metas = listMetas(d)
    val won = metas.headOption.exists(_._2 == name)
    if (won) {
      metas.drop(1)
        .foreach { case (_, n) => try FsIO.delete(s"$d/$n") catch { case _: Exception => () } }
      val legacy = legacyMetaPath(store, col)
      if (FsIO.exists(legacy))
        try FsIO.delete(legacy) catch { case _: Exception => () }
    }
    won
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
    * update-stamp must both match what the build saw. One listing + one
    * read per scan-planning call (the listing picks the CAS winner; it
    * replaced the single fixed-name read when metas became epoch-named).
    */
  def routableFor(store: ColumnStore, col: String): Boolean = {
    val m =
      try readMeta(store, col)
      catch { case _: Exception => return false } // no index
    m.rows == store.nrows && m.stamp >= 0 && m.stamp == store.updateStamp
  }

  /** Build (or rebuild) the index for a column. One shuffle, fully
    * distributed; partition count scales with data size so a 100× larger
    * table gets proportionally more sort partitions.
    */
  def create(spark: SparkSession, store: ColumnStore, col: String,
      overwrite: Boolean = false): Unit = {
    require(store.spec.col(col).ptypeId != graft.codec.PType.I32LIST.id,
      s"cannot index array column $col")
    if (exists(store, col))
      require(overwrite, s"index on $col exists " +
        "(reference raises unless overwrite=True, column.py:492-497)")
    val nrows = store.nrows
    val df = store.read(spark, Seq(col))
      .select(org.apache.spark.sql.functions.col(col).as(ValueCol),
        org.apache.spark.sql.functions.col("_row_id").as(RowIdCol))
    // ~2M rows per sort partition; bounded so tiny tables get 1 partition
    val parts = math.max(1, math.min(2048, (nrows / (2L << 20)).toInt + 1))
    val d = dir(store, col)
    // NEW versioned base dir — never overwrites files another meta (or an
    // in-flight reader) references; superseded bases age out via the GC
    val base = s"_base-${java.util.UUID.randomUUID().toString.take(12)}"
    df.repartitionByRange(parts, asc(ValueCol), asc(RowIdCol))
      .sortWithinPartitions(asc(ValueCol), asc(RowIdCol))
      .write.mode("overwrite").parquet(s"$d/$base")
    // stamp recorded for DSv2 routing freshness (see routableFor); a full
    // build collapses every delta generation into the new base.
    // Commit-until-win: a rebuild reflects the complete CURRENT table, so
    // it must end up the effective meta even if incremental refreshes race
    // it (their metas reference the OLD base — self-consistent, loser).
    val m = IdxMeta(nrows, store.updateStamp, Seq.empty, base)
    var attempt = 0
    var done = false
    while (!done && attempt < 16) {
      val e = if (exists(store, col)) readMetaEpoch(store, col)._2 else 0L
      done = commitMeta(store, col, m, e + 1)
      attempt += 1
    }
    require(done, s"index build on $col lost ${attempt} meta commit races")
    gcSweep(store, col)
  }

  /** Full path of the meta's base-sort parquet (legacy: the dir itself). */
  private[graft] def basePath(store: ColumnStore, col: String): String = {
    val d = dir(store, col)
    val b = readMeta(store, col).base
    if (b.isEmpty) d else s"$d/$b"
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
    var attempt = 0
    while (attempt < 4) {
      val (m, e) = readMetaEpoch(store, col)
      if (m.rows != store.nrows) return // a real rebuild is owed
      if (m.stamp == store.updateStamp) return // someone already stamped
      if (commitMeta(store, col, m.copy(stamp = store.updateStamp), e + 1)) return
      attempt += 1 // lost a CAS race — re-read the winner and re-decide
    }
  }

  /** Names of the live delta generations (empty after a full build). */
  private[graft] def deltaGens(store: ColumnStore, col: String): Seq[String] =
    readMeta(store, col).gens.map(_._1)

  /** Every parquet path of the index: the base sort plus the meta-listed
    * delta generations. ALL index readers (API lookups, DSv2 routing) go
    * through this — gen dirs are underscore-prefixed, so the base read
    * never double-counts them, and unlisted (orphaned) gens are invisible.
    *
    * The schema is declared explicitly (it is fixed by construction:
    * `value` = the column's type, `row_id` = long), so the read skips the
    * per-call parquet footer inference — index lookups are issued once per
    * query operator and the footer round-trips were pure fixed cost.
    */
  def table(spark: SparkSession, store: ColumnStore, col: String): DataFrame = {
    val d = dir(store, col)
    val m = readMeta(store, col)
    val basePath = if (m.base.isEmpty) d else s"$d/${m.base}"
    val paths = basePath +: m.gens.map { case (g, _) => s"$d/$g" }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(ValueCol,
        graft.store.ColumnStore.sparkType(store.spec.col(col).ptype)),
      org.apache.spark.sql.types.StructField(RowIdCol,
        org.apache.spark.sql.types.LongType)))
    spark.read.schema(schema).parquet(paths: _*)
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
    var attempt = 0
    var done = false
    while (!done && attempt < 4) {
      done = refreshOnce(spark, store, col, maxDeltaGens)
      attempt += 1 // lost a CAS race: re-read the winner — usually the
                   // racing refresh already covered our rows → no-op
    }
    require(done, s"index refresh on $col lost ${attempt} meta commit races")
  }

  /** One refresh attempt against the current meta winner. Returns false
    * IFF the final CAS commit lost to a concurrent writer (the caller
    * re-reads and retries); every other exit is a clean completion.
    */
  private def refreshOnce(spark: SparkSession, store: ColumnStore, col: String,
      maxDeltaGens: Int): Boolean = {
    if (!exists(store, col)) return true
    val (m, epoch) = readMetaEpoch(store, col)
    val n = store.nrows
    if (m.rows == n && m.stamp == store.updateStamp) return true // fresh
    val newRows = n - m.rows
    val incrementalOk = m.stamp >= 0 && m.stamp == store.updateStamp && newRows > 0
    if (!incrementalOk || (m.deltaRows + newRows) * 4L > n) {
      create(spark, store, col, overwrite = true) // commit-until-win inside
      return true
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
    // COMMIT (CAS): the epoch-named meta makes the new generation (and, on
    // merge, the disappearance of the old ones) visible atomically; losing
    // the race leaves our gen as an unreferenced orphan for the sweep
    // below to tombstone — a reader that sampled our meta mid-race still
    // has every dir it references.
    if (!commitMeta(store, col,
        IdxMeta(n, store.updateStamp, newGens :+ (gen, genRows), m.base), epoch + 1))
      return false
    gcSweep(store, col)
    true
  }

  /** GC: `_gen-*` and `_base-*` dirs no longer referenced — merged-away
    * gens, superseded bases, and orphans of crashed/lost attempts. GRACE
    * PERIOD from DE-LISTING (like table-format snapshot expiry): a reader
    * that loaded a previous meta may still be mid-read on a just-delisted
    * dir, and the dir's own age says nothing about that — so the first
    * sweep that finds a dir unreferenced writes a `_gone` tombstone
    * (starting the clock), and only a LATER sweep deletes it once the
    * tombstone outlives the grace window.
    *
    * live = dirs referenced by ANY meta file still present — NOT just the
    * caller's commit: in a same-epoch CAS tie both writers can transiently
    * believe they won, and sweeping with only one's view would tombstone
    * (then delete) a dir the effective winner references. Lost-race metas
    * are themselves swept by later commits, after which their orphan dirs
    * become unreferenced and age out here.
    */
  private[graft] def gcSweep(store: ColumnStore, col: String): Unit = {
    val d = dir(store, col)
    val grace = sys.props.get("graft.index.gc.graceMs").map(_.toLong)
      .getOrElse(15L * 60 * 1000)
    val now = System.currentTimeMillis()
    val metas = listMetas(d).map { case (_, name) =>
      try Some(parseMeta(FsIO.readAll(s"$d/$name")))
      catch { case _: Exception => None }
    } :+ (try Some(parseMeta(FsIO.readAll(legacyMetaPath(store, col))))
      catch { case _: Exception => None })
    val live: Set[String] = metas.flatten
      .flatMap(m => m.gens.map(_._1) ++ (if (m.base.nonEmpty) Seq(m.base) else Nil))
      .toSet
    FsIO.list(d)
      .filter(f => f.startsWith("_gen-") || f.startsWith("_base-"))
      .foreach { f =>
        val tomb = s"$d/$f/_gone"
        try {
          if (live(f)) {
            // an IN-FLIGHT dir can be tombstoned by a concurrent sweep
            // before its writer commits; once committed (live) the stale
            // tombstone must go, or a LATER delisting would delete the dir
            // instantly instead of after a fresh grace window
            if (FsIO.exists(tomb)) FsIO.delete(tomb)
          } else if (!FsIO.exists(tomb)) {
            // tombstone now, delete on a LATER sweep once it outlives the
            // grace — never in the same pass: a dir without a meta entry
            // may belong to a writer that simply has not committed yet
            val w = new Bytes.Writer()
            w.writeVar(now)
            FsIO.writeAtomic(tomb, w.result())
          } else if (now - new Bytes.Reader(FsIO.readAll(tomb)).readVar() >= grace) {
            FsIO.delete(s"$d/$f", recursive = true)
          }
        } catch { case _: Exception => () } // GC is best-effort, never fatal
      }
    // legacy ROOT base (meta.base == ""): once no present meta references
    // it, age its loose part-files out through a root-level tombstone
    if (metas.flatten.exists(_.base.isEmpty)) {
      // LIVE root base: drop any stale tombstone (mirrors the live-dir
      // branch above) — a transient meta-read failure must not leave a
      // clock running that would later delete live part-files without a
      // fresh grace window (ADVICE r05, low)
      val tomb = s"$d/_rootbase_gone"
      try { if (FsIO.exists(tomb)) FsIO.delete(tomb) }
      catch { case _: Exception => () }
    } else {
      val tomb = s"$d/_rootbase_gone"
      try {
        if (FsIO.list(d).exists(f => f.startsWith("part-"))) {
          if (!FsIO.exists(tomb)) {
            val w = new Bytes.Writer()
            w.writeVar(now)
            FsIO.writeAtomic(tomb, w.result())
          } else if (now - new Bytes.Reader(FsIO.readAll(tomb)).readVar() > grace) {
            FsIO.list(d).filter(f => f.startsWith("part-") || f == "_SUCCESS")
              .foreach(f => FsIO.delete(s"$d/$f"))
            FsIO.delete(tomb)
          }
        }
      } catch { case _: Exception => () }
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
