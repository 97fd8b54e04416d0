package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The hashing kernel for [[MinHashSig]]: one pass over a document's
  * shingle array producing all `n` MinHash signature slots.
  *
  * Per shingle: a 64-bit FNV-1a base hash of the UTF-8 bytes, then the
  * i-th hash function is splitmix64(base + i·GOLDEN) — the standard
  * "one strong base hash + cheap independent mixes" MinHash family
  * (Broder '97 resemblance sketches). All integer math wraps in Java,
  * so this sidesteps ANSI-mode overflow checking that Column-level long
  * arithmetic would hit, and costs n·O(1) per shingle instead of n
  * string-concat+hash evaluations.
  */
object MinHashKernel {
  final val GOLDEN = 0x9E3779B97F4A7C15L

  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** shingles: array<string> (non-null elements) → array<long> of n mins. */
  def compute(shingles: ArrayData, n: Int): ArrayData = {
    val mins = Array.fill(n)(Long.MaxValue)
    val m = shingles.numElements()
    var s = 0
    while (s < m) {
      val base = fnv1a(shingles.getUTF8String(s).getBytes)
      var i = 0
      while (i < n) {
        val h = splitmix64(base + i * GOLDEN)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native Catalyst expression: full n-wide MinHash signature of a
  * shingle array in a single per-row pass — replaces the
  * explode(shingles) × seeds → groupBy(min) formulation, which costs a
  * full shuffle of the exploded shingle relation. This is a pure map:
  * signatures never shuffle; only the (doc, band-key) relation does.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got ${t.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    MinHashKernel.compute(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashKernel$$.MODULE$$.compute($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val FN = "minhash_sig"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FN, exprs => {
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => sys.error(s"minhash_sig: numHashes must be an int literal, got $other")
        }
        MinHashSig(exprs.head, n)
      }, "built-in")

  def minhashSig(spark: SparkSession, shingles: Column, numHashes: Int): Column = {
    register(spark)
    call_function(FN, shingles, org.apache.spark.sql.functions.lit(numHashes))
  }
}
