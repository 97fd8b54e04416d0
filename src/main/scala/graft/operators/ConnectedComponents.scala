package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via hash-min label propagation with
  * pointer jumping — the shared engine behind duplicate-cluster
  * resolution (q_llm_dup_groups over text near-dup pairs,
  * q_llm_semdedup over embedding near-dup pairs).
  *
  * Per round: every vertex takes the min label among itself and its
  * neighbors (one edge⋈label join co-located on the cached edge
  * partitioning + one map-side-combined shuffle of per-vertex minima),
  * then one pointer jump (label ← label(label)) — convergence in
  * ~log(diameter) rounds instead of O(diameter). No driver-side graph;
  * the only driver value per round is the one-row convergence scalar.
  *
  * Lineage control: each round's label table is localCheckpoint'ed
  * (eager) so the plan does not double per round; superseded checkpoint
  * RDDs are unpersisted as soon as the next round materializes (cache
  * hygiene — round-2 verdict). On a real cluster this is reliable
  * checkpointing, the same idiom GraphFrames uses.
  */
object ConnectedComponents {

  private def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** @param ids   one column `id` — every vertex (isolated ones included)
    * @param edges two columns `src`, `dst` — undirected pairs
    * @return (id, label) where label = min id of the component */
  def run(ids: DataFrame, edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    // Edges symmetrized and hash-partitioned on dst ONCE, cached: every
    // round's join then co-locates on the cached layout and only the
    // (small) label table moves.
    val both = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("dst"))
      .persist()
    both.count() // materialize before the loop reads it repeatedly

    var labels = ids.select(col("id"), col("id").as("label")).localCheckpoint()
    var labelsRdd = backingRdd(labels)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val nbrMin = both
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("label")).as("nmin"))
      // checkpointed: the jump join reads it twice — without the
      // materialization the full edge pass would run 2x
      // LAZY checkpoints (eager = false): the convergence agg below is
      // the round's single materializing job — it computes stepped,
      // stores both checkpoint RDDs, and returns the scalar in ONE job
      // instead of three (each eager checkpoint used to run its own
      // job; at bench scale the per-round cost is job-scheduling
      // overhead, not data). Lineage is still truncated: after the agg,
      // `next` reads from its checkpoint, not the round's plan.
      val stepped = labels
        .join(nbrMin.select(col("src").as("id"), col("nmin")), Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(false)
      val next = stepped
        .join(stepped.select(col("id").as("label"), col("label").as("label2")),
          Seq("label"), "left")
        .select(col("id"),
          coalesce(col("label2"), col("label")).as("label"),
          when(coalesce(col("label2"), col("label")) < col("old"), 1L)
            .otherwise(0L).as("chg"))
        .localCheckpoint(false)
      val rt0 = System.nanoTime()
      changed = next.agg(sum(col("chg"))).head().getLong(0)
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(f"[cc] round $rounds%d changed=$changed%d took ${(System.nanoTime() - rt0) / 1e9}%.2f s")
      // `next` is materialized (eager checkpoint + the agg above), so
      // this round's intermediate and the previous labels are dead.
      backingRdd(stepped).foreach(_.unpersist(blocking = false))
      labelsRdd.foreach(_.unpersist(blocking = false))
      labels = next.select(col("id"), col("label"))
      labelsRdd = backingRdd(next)
      rounds += 1
    }
    both.unpersist(blocking = false)
    labels
  }
}
