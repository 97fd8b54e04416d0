package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-isolation probe for the optimization round (not part of
  * the driver contract; removed or inert in CI). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = f
        println(f"[scratch] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
      }
    }
    def fp = Tables(spark, d, "documents")
      .agg(count(lit(1)), sum(col("doc_id")), sum(length(col("text"))))
      .head().mkString(",")
    val pairs = graft.operators.StageCache.relation(spark, "jaccpairs", d)(fp) {
      sys.error("stage should already be committed")
    }.select(col("d1"), col("d2"))
    time("pairs_count") { pairs.count() }
    val e = pairs.localCheckpoint(true)
    time("post_ckpt_marker") { 1L }
    val sym = e.select(explode(array(
        struct(col("d1").as("v"), col("d2").as("w")),
        struct(col("d2").as("v"), col("d1").as("w")))).as("p"))
      .select(col("p.v").as("v"), col("p.w").as("w"))
    val adjL = sym.groupBy("v")
      .agg(array_sort(collect_list(col("w"))).as("nbrs"))
    time("adj_build_count") { adjL.count() }
    val adj = adjL.localCheckpoint(true)
    time("post_adj_ckpt") { 1L }
    val common = graft.functions.SortedIntersectSize
      .sortedIntersectSize(spark, col("n1"), col("n2"))
    time("join_intersect_agg") {
      e.join(adj.select(col("v").as("v1"), col("nbrs").as("n1"))
          .hint("shuffle_hash"), col("d1") === col("v1"))
        .join(adj.select(col("v").as("v2"), col("nbrs").as("n2"))
          .hint("shuffle_hash"), col("d2") === col("v2"))
        .select(col("d1"), col("d2"), common.as("c"))
        .select(explode(array(
            struct(col("d1").as("doc_id"), col("c")),
            struct(col("d2").as("doc_id"), col("c")))).as("p"))
        .select(col("p.doc_id").as("doc_id"), col("p.c").as("c"))
        .groupBy("doc_id").agg((sum(col("c")) / 2).cast("long").as("n_tri"))
        .filter(col("n_tri") > 0).count()
    }
    Bench.sweep(spark)
    spark.stop()
  }
}
