package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.MisraGries

/** ScalaCheck laws for the Misra-Gries heavy-hitter summary
  * (functions/MisraGries.scala) under arbitrary partitionings — the
  * property that makes q_llm_heavy_hitters exact: however Spark splits
  * the data and merges partials, every true heavy hitter survives into
  * the candidate set. Pure JVM, no SparkSession. */
object CorpusStatsProps extends Properties("graft.misragries") {

  // small alphabet + skewed picks, so heavy hitters actually occur
  private val token: Gen[String] =
    Gen.frequency(8 -> Gen.const("hh"), 4 -> Gen.const("mid"),
      1 -> Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
  private val stream: Gen[List[String]] = Gen.listOf(token)
  private val kGen: Gen[Int] = Gen.chooseNum(2, 12)

  /** Simulate Spark's partial/final tree: chunk the stream, reduce each
    * chunk independently, merge the partials left-to-right. */
  private def run(xs: List[String], k: Int, chunk: Int): Map[String, Long] = {
    val a = MisraGries.agg(k)
    val partials = xs.grouped(math.max(1, chunk)).map(
      _.foldLeft(a.zero)(a.reduce)).toList
    a.finish(partials.foldLeft(a.zero)(a.merge))
  }

  property("every term with count > n/k survives (candidate superset)") =
    forAll(stream, kGen, Gen.chooseNum(1, 7)) { (xs, k, chunk) =>
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val summary = run(xs, k, chunk)
      exact.forall { case (t, c) =>
        c * k <= xs.size || summary.contains(t)
      }
    }

  property("summary counts never exceed true counts") =
    forAll(stream, kGen, Gen.chooseNum(1, 7)) { (xs, k, chunk) =>
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      run(xs, k, chunk).forall { case (t, c) =>
        c <= exact.getOrElse(t, 0L)
      }
    }

  property("summary holds at most k-1 counters") =
    forAll(stream, kGen, Gen.chooseNum(1, 7)) { (xs, k, chunk) =>
      run(xs, k, chunk).size <= k - 1
    }

  property("error bound: true - estimate <= n/k for surviving terms") =
    forAll(stream, kGen, Gen.chooseNum(1, 7)) { (xs, k, chunk) =>
      // Agarwal et al. PODS'12: merged MG keeps the eps = 1/k guarantee
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      run(xs, k, chunk).forall { case (t, c) =>
        (exact.getOrElse(t, 0L) - c) * k <= xs.size.toLong
      }
    }
}
