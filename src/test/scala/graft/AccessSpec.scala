package graft

import graft.api._
import graft.codec.PType
import graft.store.ColumnSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** F2: remaining test_access.py ports — read-only mode IOErrors, negative
  * indexing forms, column deletion.
  */
class AccessSpec extends AnyFunSuite {
  import SparkTestBase._

  private def mk(n: Int = 50): Columns = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("x", DoubleType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until n).map(i => Row(i.toLong, i * 0.5)), 2), schema)
    Columns.fromDataFrame(spark, tmpDir("graft-acc"), df)
  }

  test("read-only mode raises IOException on every mutation (test_access.py:263-274)") {
    val rw = mk()
    rw.metaWrite("m", Map("a" -> "1"))
    val ro = Columns.open(spark, rw.root, mode = "r")
    val df = rw.read(Seq("id"))
    intercept[java.io.IOException] { ro.append(df) }
    intercept[java.io.IOException] { ro("x").update(Seq(0L), Seq(1.0)) }
    intercept[java.io.IOException] { ro("x").createIndex() }
    intercept[java.io.IOException] { ro.metaWrite("m2", Map.empty[String, Any]) }
    intercept[java.io.IOException] { ro.metaUpdate("m", Map("a" -> "2")) }
    intercept[java.io.IOException] { ro.metaDelete("m") }
    intercept[java.io.IOException] { ro.vacuum() }
    intercept[java.io.IOException] { ro.addColumn(ColumnSpec("y", PType.I32.id)) }
    intercept[java.io.IOException] { ro.dropColumn("x") }
    intercept[java.io.IOException] { ro.dropSub("anything") }
    intercept[java.io.IOException] {
      ro.createSub("s2", graft.store.TableSpec(Seq(ColumnSpec("a", PType.I64.id))))
    }
    intercept[java.io.IOException] { ro("x").dropIndex() }
    // reads still fine
    assert(ro.read().count() == 50)
    assert(ro.metaRead("m") == graft.store.JObj("a" -> graft.store.JStr("1")))
    rw.dropStore()
  }

  test("negative slice and row forms wrap around (util.extract_rows)") {
    val c = mk(20)
    val tail = c.read(Seq("id"), Slice(-5, Long.MaxValue)).collect().map(_.getLong(1)).sorted
    assert(tail.toSeq == (15L until 20L))
    val one = c.read(Seq("id"), RowAt(-1)).collect()
    assert(one.head.getLong(2) == 19L)
    val some = c.read(Seq("id"), RowList(Seq(-2L, 0L))).collect().map(_.getLong(2)).sorted
    assert(some.toSeq == Seq(0L, 18L))
    intercept[IllegalArgumentException] { c.read(Seq("id"), RowAt(20)).collect() }
    c.dropStore()
  }

  test("explicit _row_id in the column list yields ONE id column on both read routes") {
    val c = mk(20)
    // DSv2 route (step-1 full read): must not duplicate the prepended id
    val full = c.read(Seq("_row_id", "id"))
    assert(full.columns.toSeq == Seq("_row_id", "id"))
    // downstream references must not be ambiguous
    assert(full.where(org.apache.spark.sql.functions.col("_row_id") < 5).count() == 5)
    // id-only request works (and is id-only)
    assert(c.read(Seq("_row_id")).columns.toSeq == Seq("_row_id"))
    // row path (stepped slice): same contract instead of a planUnits error
    val stepped = c.read(Seq("_row_id", "id"), Slice(0, 10, 2))
    assert(stepped.columns.contains("id") && stepped.columns.count(_ == "_row_id") == 1)
    assert(stepped.count() == 5)
    c.dropStore()
  }

  test("dropColumn removes files and schema entry (S11)") {
    val c = mk()
    c("x").createIndex()
    c.dropColumn("x")
    assert(c.columnNames == Seq("id"))
    intercept[IllegalArgumentException] { c("x") }
    assert(c.read().columns.toSeq == Seq("_row_id", "id"))
    // files gone
    val left = c.store.segments.flatMap(s =>
      graft.store.FsIO.list(graft.store.Format.segDir(c.root, s)))
      .filter(_.contains(".x."))
    assert(left.isEmpty, s"x files remain: $left")
    intercept[IllegalArgumentException] { c.dropColumn("id") } // last column
    c.dropStore()
  }

  test("updating{} is reentrant: only the outermost exit rebuilds") {
    val c = mk(30)
    c("id").createIndex()
    c.updating { o =>
      o.updating { i => i("id").update(Seq(0L), Seq(999L)) }
      // inner exit must NOT rebuild: the index still serves the stale value
      assert(graft.index.RowIds.collectSorted(o("id") === 999L).isEmpty,
        "nested updating{} exit rebuilt the index early")
    }
    // outermost exit rebuilt: the new value is visible through the index
    assert(graft.index.RowIds.collectSorted(c("id") === 999L).toSeq == Seq(0L))
    c.dropStore()
  }

  test("one-step column create with data (setColumn, columns.py:971-990)") {
    val c = mk(40)
    import org.apache.spark.sql.functions.col
    // full coverage: every row gets id*3
    c.setColumn("y", c.read(Seq("id"))
      .select(col("_row_id"), (col("id") * 3L).as("value")))
    assert(c.columnNames == Seq("id", "x", "y"))
    val out = c.read(Seq("id", "y")).collect().sortBy(_.getLong(0))
    out.foreach(r => assert(r.getLong(2) == r.getLong(1) * 3L))
    // partial coverage: uncovered rows carry the fill
    c.setColumn("z", spark.range(5)
      .selectExpr("id AS _row_id", "CAST(7.5 AS DOUBLE) AS value"),
      fill = Some("1.25"))
    val z = c.read(Seq("z")).collect().sortBy(_.getLong(0)).map(_.getDouble(1))
    assert(z.take(5).forall(_ == 7.5) && z.drop(5).forall(_ == 1.25))
    // name collision rejected; read-only mode rejected
    intercept[IllegalArgumentException] {
      c.setColumn("y", spark.range(1).selectExpr("id AS _row_id", "id AS value"))
    }
    val ro = Columns.open(spark, c.root, mode = "r")
    intercept[java.io.IOException] {
      ro.setColumn("w", spark.range(1).selectExpr("id AS _row_id", "id AS value"))
    }
    c.dropStore()
  }

  test("list() directory tree and reload() (columns.py:854-886)") {
    val c = mk(10)
    c.metaWrite("info", Map("a" -> "1"))
    c.createSubFromDataFrame("telemetry", c.read(Seq("id")).select("id"))
    val brief = c.list()
    assert(brief.contains("root has 2 columns 1 metadata"), brief)
    assert(brief.contains("telemetry/"), brief)
    val full = c.list(full = true)
    assert(full.contains("- id") && full.contains("- x") && full.contains("- {info}"), full)
    assert(c.reload().nrows == 10)
    c.dropStore()
  }

  test("resize grows with fill values, shrink rejected (C6)") {
    val c = mk(10)
    c.resize(15)
    assert(c.nrows == 15)
    val out = c.read().collect().sortBy(_.getLong(0))
    assert(out.length == 15)
    // new rows carry the default fills (0 / 0.0)
    out.drop(10).foreach { r =>
      assert(r.getLong(1) == 0L && r.getDouble(2) == 0.0)
    }
    // original rows untouched
    assert(out(9).getLong(1) == 9L && out(9).getDouble(2) == 4.5)
    intercept[IllegalArgumentException] { c.resize(5) }
    c.resize(15) // no-op ok
    c.dropStore()
  }
}
