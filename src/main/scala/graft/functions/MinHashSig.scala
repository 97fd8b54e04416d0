package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The hashing kernel for [[MinHashSig]]: one pass over a document's
  * pre-hashed shingle array producing all `n` MinHash signature slots.
  *
  * The hash family is the classic affine family over the Mersenne prime
  * p = 2^31 - 1 (Broder '97 resemblance sketches; Carter–Wegman
  * universal hashing): h_i(x) = (A(i)·x + B(i)) mod p, with fixed
  * seeded coefficients. Inputs are 32-bit base hashes already reduced
  * mod p, so every product stays < 2^62 — NO wrapping arithmetic.
  * That makes the identical computation expressible in ANSI SQL
  * (DuckDB included), which is what lets the full MinHash-LSH query be
  * hash-checked against an independent oracle instead of being a
  * seeded-hash black box.
  */
object MinHashKernel {
  final val P = 2147483647L // 2^31 - 1

  /** Fixed affine coefficients, deterministic across runs/JVMs. The
    * DuckDB oracle SQL is generated from these same arrays
    * (single source of truth — graft.queries.TextOps). */
  val (coefA: Array[Long], coefB: Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(32)(1L + rnd.nextInt((P - 1).toInt))
    val b = Array.fill(32)(rnd.nextInt(P.toInt).toLong)
    (a, b)
  }

  /** hashes: array<long>, each in [0, P) → array<long> of n mins. */
  def compute(hashes: ArrayData, n: Int): ArrayData = {
    val mins = Array.fill(n)(Long.MaxValue)
    val m = hashes.numElements()
    var s = 0
    while (s < m) {
      val x = hashes.getLong(s)
      var i = 0
      while (i < n) {
        val h = (coefA(i) * x + coefB(i)) % P
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native Catalyst expression: full n-wide MinHash signature of a
  * pre-hashed shingle array in a single per-row pass — replaces the
  * explode(shingles) × seeds → groupBy(min) formulation, which costs a
  * full shuffle of the exploded shingle relation. This is a pure map:
  * signatures never shuffle; only the (doc, band-key) relation does.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<bigint>, got ${t.simpleString}")
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

  def minhashSig(spark: SparkSession, hashes: Column, numHashes: Int): Column = {
    register(spark)
    call_function(FN, hashes, org.apache.spark.sql.functions.lit(numHashes))
  }
}
