package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.9 udaf): elementwise vector average
  * as an `Aggregator[IN, BUF, OUT]` — mergeable partial state, so Spark
  * runs it as a two-phase aggregate (map-side partial + merge after
  * shuffle), the distributive shape that scales.
  *
  * Used for embedding centroids; VectorOps' declared queries use the
  * relational posexplode formulation (DuckDB-oracle-able) — this typed
  * form is the API surface users reach for from Dataset code, asserted
  * equivalent in VectorOpsSpec.
  */
object VectorAvg {

  case class Buf(var sum: Array[Double], var n: Long)

  val agg: Aggregator[Array[Double], Buf, Array[Double]] =
    new Aggregator[Array[Double], Buf, Array[Double]] {
      override def zero: Buf = Buf(Array.emptyDoubleArray, 0L)

      override def reduce(b: Buf, v: Array[Double]): Buf = {
        if (b.sum.isEmpty) b.sum = new Array[Double](v.length)
        var i = 0
        while (i < v.length) { b.sum(i) += v(i); i += 1 }
        b.n += 1
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        if (a.sum.isEmpty) b
        else if (b.sum.isEmpty) a
        else {
          var i = 0
          while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
          a.n += b.n
          a
        }
      }

      override def finish(b: Buf): Array[Double] =
        if (b.n == 0) b.sum else b.sum.map(_ / b.n)

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    }
}
