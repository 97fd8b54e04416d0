package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
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
      (1 to 4).foreach { i =>
        Bench.sweep(spark)
        val t0 = System.nanoTime()
        val r = f
        println(f"[scratch] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
      }
      Bench.sweep(spark)
    }
    def fp = Tables(spark, d, "documents")
      .agg(count(lit(1)), sum(col("doc_id")), sum(length(col("text"))))
      .head().mkString(",")
    def pairs = graft.operators.StageCache.relation(spark, "jaccpairs", d)(fp) {
      sys.error("stage should already be committed")
    }.select(col("d1"), col("d2"))

    // parameterized pagerank variant
    def pr(repart: Boolean, hints: Boolean, eagerCkpt: Boolean): Long = {
      val s = spark
      var edges0 = pairs.select(explode(array(
          struct(col("d1").as("src"), col("d2").as("dst")),
          struct(col("d2").as("src"), col("d1").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      if (repart) edges0 = edges0.repartition(
        s.sessionState.conf.numShufflePartitions, col("src"))
      val edges = if (eagerCkpt) edges0.localCheckpoint(true) else edges0.persist()
      def hh(df: DataFrame) = if (hints) df.hint("shuffle_hash") else df
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .withColumnRenamed("src", "doc")
      val nn = deg.agg(count(lit(1)).as("n"))
      val node = deg.crossJoin(broadcast(nn))
        .selectExpr("doc", "deg",
          "150000000L div n as base", "1000000000L div n as p0")
        .persist()
      val weighted = edges
        .join(hh(node.selectExpr("doc as src", "deg")), "src")
        .persist()
      val r0 = node.selectExpr("doc", "p0 as pr")
      val r3 = (1 to 3).foldLeft(r0) { (r, _) =>
        weighted
          .join(hh(r.selectExpr("doc as src", "pr")), "src")
          .selectExpr("dst", "pr div deg as contrib")
          .groupBy("dst").agg(sum(col("contrib")).as("s"))
          .crossJoin(broadcast(nn))
          .selectExpr("dst as doc",
            "(150000000L div n) + (85L * s) div 100 as pr")
      }
      node.join(hh(r3), "doc")
        .selectExpr("doc as doc_id", "deg", "pr as pr_u")
        .orderBy("doc_id").count()
    }
    time("pr_old_ckpt_nohint") { pr(repart = false, hints = false, eagerCkpt = true) }
    time("pr_persist_nohint") { pr(repart = false, hints = false, eagerCkpt = false) }
    time("pr_persist_hint") { pr(repart = false, hints = true, eagerCkpt = false) }
    time("pr_repart_persist_hint") { pr(repart = true, hints = true, eagerCkpt = false) }
    time("pr_repart_persist_nohint") { pr(repart = true, hints = false, eagerCkpt = false) }
    spark.stop()
  }
}
