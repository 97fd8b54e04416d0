package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string — the primitive behind
  * the compression-ratio quality filter (Gopher measures corpora this
  * way: text that compresses too well is templated/repetitive, text
  * that barely compresses is high-entropy noise; both tails are
  * curation signals). Raw DEFLATE (nowrap, no zlib header) at the
  * default level, so the length reflects content redundancy only.
  *
  * Determinism: java.util.zip.Deflater at a FIXED level is
  * deterministic for a given input within a JVM — the in-JVM
  * recomputation gate in OperatorSpec is exact equality. No DuckDB
  * twin exists (no deflate in its SQL surface), so the consuming query
  * is declared no-oracle by design, like the sketch ops.
  *
  * Thread-local Deflater + scratch buffer: one native zlib stream per
  * executor thread, reset per row — no per-row allocation beyond the
  * UTF-8 bytes Spark already materializes. */
object DeflateLenKernel {
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION,
        /* nowrap = */ true)
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16 * 1024)
  }

  def len(s: UTF8String): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val b = buf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(b)
    total
  }
}

case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"deflate_len expects string, got ${t.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(a: Any): Any =
    DeflateLenKernel.len(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeflateLenKernel$$.MODULE$$.len($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  private val FN = "deflate_len"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FN, exprs => DeflateLen(exprs.head), "built-in")

  def deflateLen(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function(FN, c)
  }
}
