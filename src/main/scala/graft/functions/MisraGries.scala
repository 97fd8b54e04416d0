package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter summary (typed UDAF; Misra & Gries 1982;
  * merge rule per Agarwal et al., PODS 2012 "Mergeable Summaries").
  *
  * State: at most k-1 (term, count) counters. Guarantee: every term whose
  * true frequency exceeds N/k is PRESENT in the final summary (counts are
  * underestimates, by at most the summary's cumulative decrement). The
  * summary is therefore a candidate SUPERSET for exact heavy hitters —
  * q_llm_heavy_hitters broadcasts the candidates and re-counts them
  * exactly, so the declared output is deterministic and exact even though
  * the intermediate summary content depends on partition order.
  *
  * Scale shape: reduce keeps a BOUNDED buffer per partition (a full
  * hash-agg's map-side state is vocabulary-sized; this is k-1 entries no
  * matter how wide the vocabulary), and merge sums counters then rescales
  * by the k-th largest count — the mergeable-summaries rule that
  * preserves the frequency guarantee across Spark's partial/final
  * aggregation tree. Reference implements nothing (SURVEY.md §0); the
  * algorithm is public literature.
  */
object MisraGries {

  case class Buf(m: Map[String, Long])

  def agg(k: Int): Aggregator[String, Buf, Map[String, Long]] =
    new Aggregator[String, Buf, Map[String, Long]] {
      override def zero: Buf = Buf(Map.empty)

      override def reduce(b: Buf, t: String): Buf =
        b.m.get(t) match {
          case Some(c) => Buf(b.m.updated(t, c + 1))
          case None if b.m.size < k - 1 => Buf(b.m.updated(t, 1L))
          // summary full + unseen term: decrement every counter (the
          // arriving term and one unit of each counter "cancel"), drop
          // zeros — the classic MG step
          case None =>
            Buf(b.m.collect { case (s, c) if c > 1 => s -> (c - 1) })
        }

      override def merge(a: Buf, b: Buf): Buf = {
        val m = b.m.foldLeft(a.m) { case (acc, (t, c)) =>
          acc.updated(t, acc.getOrElse(t, 0L) + c)
        }
        if (m.size <= k - 1) Buf(m)
        else {
          // subtract the k-th largest count from everything and keep
          // positives: ≤ k-1 survivors, error grows by ≤ cut — the
          // PODS'12 mergeability argument
          val cut = m.values.toArray.sortWith(_ > _).apply(k - 1)
          Buf(m.collect { case (t, c) if c > cut => t -> (c - cut) })
        }
      }

      override def finish(b: Buf): Map[String, Long] = b.m

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Map[String, Long]]()
    }
}
