package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: the bucket index of `value` against a
  * SORTED cutoff array — the count of cutoffs strictly below the value
  * (C++ lower_bound), via an O(log B) binary search.
  *
  * This is the rank-map primitive of the sketch-threshold twins
  * (q_agg_spearman_approx): every row of a 100 TB fact table gets a
  * quantile bucket from a broadcast approx_percentile cutoff array.
  * The two declarative formulations both fail at this row count: a
  * higher-order-function fold (`aggregate(cuts, 0, ...)`) drops the
  * stage out of whole-stage codegen and pays O(B) interpreted lambda
  * evals per row, and an unrolled log2(B)-step withColumn binary search
  * pays a per-run Catalyst planning cost that dwarfs the execution
  * (measured: 8.6 s vs 0.9 s for the same histogram at sf0.1). The
  * expression generates one tight primitive loop inline in the fused
  * stage; interpreted eval matches the generated code exactly
  * (asserted in KernelProps).
  */
case class BucketIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType is private[sql] in Spark 4, so no ExpectsInputTypes;
  // callers guarantee (double, array<double>) inputs (cast upstream).
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // match on element type only: SimplifyCasts strips a no-op
    // array<double> cast but flips containsNull, and a strict
    // ArrayType equality would un-resolve the optimized plan
    val ok = left.dataType == DoubleType && (right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bucket_index expects (double, array<double>), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bucket_index"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[Double]
    val cuts = b.asInstanceOf[ArrayData]
    var lo = 0
    var hi = cuts.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      // fail loudly on a null cutoff: the function is registered
      // session-wide, and getDouble on a null slot reads garbage bits —
      // a silently arbitrary bucket for sql callers outside the
      // internal cast-upstream contract
      if (cuts.isNullAt(mid)) throw new IllegalArgumentException(
        "bucket_index: null element in the cutoff array")
      if (cuts.getDouble(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $b.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($b.isNullAt($mid)) {
         |    throw new IllegalArgumentException(
         |      "bucket_index: null element in the cutoff array");
         |  }
         |  if ($b.getDouble($mid) < $a) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BucketIndex {
  private val FN = "bucket_index"

  /** Register in the session's function registry (idempotent) so the
    * expression is reachable from both the Column API and spark.sql. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FN, exprs => BucketIndex(exprs.head, exprs(1)), "built-in")

  /** Column-API entry point: count of `cuts` elements strictly below
    * `v` — `cuts` MUST be sorted ascending (approx_percentile output
    * over ascending percentiles is). */
  def bucketIndex(spark: SparkSession, v: Column, cuts: Column): Column = {
    register(spark)
    call_function(FN, v, cuts)
  }
}
