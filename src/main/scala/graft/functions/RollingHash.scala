package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a-style rolling polynomial hash of a string's UTF-8 bytes —
  * a document fingerprint primitive (dedup keys, shingle anchors).
  *
  * Implemented as a native Catalyst `Expression` WITH `doGenCode`, not a
  * Scala UDF: it stays inside whole-stage codegen (no serialization
  * boundary, no boxing per row), which matters when fingerprinting 10^12
  * documents.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** h = (h * FNV_PRIME) xor byte, seeded with the FNV-64 offset basis. */
  def hashBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h = (h * 0x100000001b3L) ^ (b(i) & 0xffL)
      i += 1
    }
    h
  }
}

object GraftFunctions {
  /** Register graft SQL functions on a session (idempotent). The public
    * `SparkSessionExtensions.injectFunction` route works identically for
    * spark-submit deployments; this is the in-session equivalent.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "scala_udf")
  }

  /** Column API for the fingerprint (requires register(spark) once). */
  def rolling_hash(c: Column): Column = call_function("rolling_hash", c)

  /** Cosine similarity against a fixed query vector (codegen'd). */
  def cosine_sim(v: Column, query: Column): Column =
    call_function("cosine_sim", v, query)
}
