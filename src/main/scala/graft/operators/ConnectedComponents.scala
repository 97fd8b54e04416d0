package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components via hash-min label propagation with
  * pointer jumping — the shared engine behind duplicate-cluster
  * resolution (q_llm_dup_groups over text near-dup pairs,
  * q_llm_semdedup over embedding near-dup pairs, q_llm_split_safe's
  * leakage-safe split).
  *
  * Per round: every vertex takes the min label among itself and its
  * neighbors (one join co-located on the cached edge partitioning +
  * one combined reduceByKey of per-vertex minima), then one pointer
  * jump (label ← label(label)) — convergence in ~log(diameter) rounds
  * instead of O(diameter). No driver-side graph; the only driver value
  * per round is the convergence count.
  *
  * The LOOP runs on co-partitioned RDDs, not DataFrames — deliberately.
  * A DataFrame fixpoint loop pays Catalyst analysis + physical planning
  * + whole-stage-codegen compilation on EVERY round's new plan: measured
  * ~0.5 s/round of pure driver time at sf0.1 against a ~0.07 s round
  * job, and that overhead is per-round-fixed no matter the data size.
  * The RDD loop is the Pregel/GraphX idiom for exactly this shape: the
  * edge relation is hash-partitioned once and every round's join +
  * reduceByKey reuses that partitioner (narrow on the edge side, one
  * bounded shuffle of per-vertex minima) with millisecond driver
  * overhead. Catalyst still plans everything OUTSIDE the loop (edge
  * generation, final projection); only the fixpoint itself is RDD.
  *
  * 100 TB posture: identical shuffle discipline to the DataFrame form —
  * per round one co-partitioned edge⋈label join plus one map-side-
  * combined minimum shuffle, rounds logarithmic in component diameter
  * via the pointer jump. (The alternating large-star/small-star
  * contraction additionally shrinks the edge set across rounds; with
  * near-dup graphs the edge set is already output-bounded and the
  * measured cost was per-round driver overhead, which the RDD loop
  * removes outright, so the simpler proven-against-oracle recurrence is
  * kept.) Superseded label RDDs are unpersisted as each round lands;
  * storage is MEMORY_AND_DISK so label state spills instead of OOMing.
  */
object ConnectedComponents {

  /** Total order for the id column's runtime type — the "min" in
    * hash-min. Must match the engines the oracles run on: Spark/DuckDB
    * `min` over the same column type (numeric order for numerics,
    * binary-lexicographic for strings — fixture ids are ASCII, where
    * UTF8String order ≡ java.lang.String order). */
  private def orderingFor(dt: DataType): Ordering[Any] = dt match {
    case StringType  => Ordering.String.on[Any](_.asInstanceOf[String])
    case LongType    => Ordering.Long.on[Any](_.asInstanceOf[Long])
    case IntegerType => Ordering.Int.on[Any](_.asInstanceOf[Int])
    case ShortType   => Ordering.Short.on[Any](_.asInstanceOf[Short])
    case other => sys.error(s"ConnectedComponents: unsupported id type $other")
  }

  /** @param ids   one column `id` — every vertex (isolated ones included)
    * @param edges two columns `src`, `dst` — undirected pairs
    * @return (id, label) where label = min id of the component */
  def run(ids: DataFrame, edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val runT0 = System.nanoTime()
    def dbg(msg: => String): Unit =
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(f"[cc] $msg (t+${(System.nanoTime() - runT0) / 1e9}%.2f s)")

    val spark = ids.sparkSession
    val idType = ids.schema("id").dataType
    require(edges.schema("src").dataType == idType &&
      edges.schema("dst").dataType == idType,
      s"edge endpoint type must match id type $idType")
    implicit val ord: Ordering[Any] = orderingFor(idType)

    // Partitioner sized to the VERTEX table's scan parallelism, not the
    // global shuffle default: the loop state is O(|V|) label records, and
    // a 32-way shuffle of a few thousand labels makes every round pay
    // ~200 near-empty task launches (measured 0.55 s/round at sf0.1 —
    // pure scheduling). On a real cluster the id scan has hundreds of
    // partitions and this expression recovers full parallelism.
    val nPart = math.max(4, math.min(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt,
      ids.rdd.getNumPartitions * 2))
    val part = new HashPartitioner(nPart)
    dbg(s"partitions=$nPart")

    // Edges symmetrized and hash-partitioned by destination ONCE; every
    // round's label lookup then co-locates on this layout and only the
    // (small) per-vertex label/minimum records move.
    val et0 = System.nanoTime()
    val both: RDD[(Any, Any)] = edges.select("src", "dst").rdd
      .flatMap { r =>
        val s = r.get(0); val d = r.get(1)
        Iterator((d, s), (s, d)) // keyed by dst: (dst, src)
      }
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    both.count() // materialize before the loop reads it repeatedly
    dbg(f"edge materialize took ${(System.nanoTime() - et0) / 1e9}%.2f s")

    var labels: RDD[(Any, Any)] = ids.select("id").rdd
      .map(r => (r.get(0), r.get(0)))
      .partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()

    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val rt0 = System.nanoTime()
      // min label among each vertex's neighbors: edge side is cached on
      // `part`, labels side is on `part` — the join is narrow; the
      // reduceByKey map-side combines before its bounded shuffle.
      val nbrMin: RDD[(Any, Any)] = both
        .join(labels, part) // (dst, (src, label(dst)))
        .map { case (_, (src, lbl)) => (src, lbl) }
        .reduceByKey(part, ord.min(_, _))
      val stepped: RDD[(Any, (Any, Any))] = labels
        .leftOuterJoin(nbrMin, part)
        .mapValues { case (old, nm) =>
          (old, nm.fold(old)(m => ord.min(old, m))) // (old, min-of-self-and-nbrs)
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      // Pointer jump (label ← label(label); a label is always a live id,
      // so the lookup side is `stepped` itself keyed by id), with the
      // convergence count ACCUMULATED inside the same materializing job
      // — one job per round, not a separate count pass. A retried task
      // can over-add to the accumulator; that can only delay convergence
      // detection by a (harmless, label-stable) extra round, never end
      // the loop early, and maxRounds bounds it.
      val acc = spark.sparkContext.longAccumulator("cc-changed")
      val next: RDD[(Any, Any)] = stepped
        .map { case (id, (old, lbl)) => (lbl, (id, old)) }
        .leftOuterJoin(stepped.mapValues(_._2), part)
        .map { case (lbl, ((id, old), l2)) =>
          val nw = l2.getOrElse(lbl)
          if (ord.lt(nw, old)) acc.add(1L)
          (id, nw)
        }
        .partitionBy(part)
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      changed = acc.value
      dbg(f"round $rounds%d changed=$changed%d took ${(System.nanoTime() - rt0) / 1e9}%.2f s")
      stepped.unpersist(blocking = false)
      labels.unpersist(blocking = false)
      labels = next
      rounds += 1
    }
    both.unpersist(blocking = false)
    dbg("loop done")

    val out = labels.map { case (id, lbl) => Row(id, lbl) }
    spark.createDataFrame(out,
      StructType(Seq(StructField("id", idType), StructField("label", idType))))
  }
}
