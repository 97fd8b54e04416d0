package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the engine's portable 32-bit string hash: the first
  * 4 md5 bytes of the UTF-8 encoding as an unsigned integer — exactly
  * the value `conv(substring(md5(x),1,8),16,10)` produces in Spark and
  * `('0x'||substr(md5(x),1,8))::BIGINT` produces in DuckDB, so every
  * query using it stays oracle-checkable. The expression replaces a
  * 3-op chain (md5 hex string → substring → radix parse), cutting two
  * string allocations per call on the near-dup hot paths (shingle and
  * term hashing).
  */
object PortableHash32Kernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    ((digest(0) & 0xFFL) << 24) | ((digest(1) & 0xFFL) << 16) |
      ((digest(2) & 0xFFL) << 8) | (digest(3) & 0xFFL)
  }

  /** hash("<prefix bytes><slice bytes>") without materializing the
    * concatenated string: feeds the digest incrementally from a shared
    * byte array. Value-identical to [[hash]] over the concatenation —
    * md5 is defined over the byte stream, not over how it is chunked.
    * The winnow kernel's per-gram hot path uses this to cut three
    * allocations per gram (substring slice, concat, getBytes copy). */
  def hashPrefixedSlice(prefix: Array[Byte], bytes: Array[Byte],
      off: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(prefix)
    d.update(bytes, off, len)
    val digest = d.digest()
    ((digest(0) & 0xFFL) << 24) | ((digest(1) & 0xFFL) << 16) |
      ((digest(2) & 0xFFL) << 8) | (digest(3) & 0xFFL)
  }
}

case class PortableHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"portable_hash32 expects string, got ${t.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash32"

  override def nullSafeEval(a: Any): Any =
    PortableHash32Kernel.hash(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PortableHash32Kernel$$.MODULE$$.hash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableHash32 {
  private val FN = "portable_hash32"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FN, exprs => PortableHash32(exprs.head), "built-in")

  def portableHash32(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function(FN, c)
  }
}
