package graft
import org.apache.spark.sql.SparkSession

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

    // representative tail queries (≤0.35 s each) + a few mid-weight ones
    val tail = Seq(
      "q_agg_distinct", "q_agg_hash", "q_agg_mode", "q_agg_stats",
      "q_win_rank", "q_win_topk_group", "q_join_inner", "q_join_skew",
      "q_events_sessionize", "q_events_transition", "q_llm_tfidf",
      "q_llm_span_dedup", "q_llm_keyword_topk", "q_retention_cohort",
      "q_llm_entropy", "q_llm_heavy_hitters", "q_fn_math", "q_sort_multi",
      "q_gapfill_hourly", "q_llm_boilerplate")

    def runAll(): Double = {
      val t0 = System.nanoTime()
      tail.foreach { n =>
        try SparkEntry.queries(n)(spark, d).count()
        catch { case e: Throwable => println(s"[scratch] $n threw: $e") }
      }
      Bench.sweep(spark)
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up both code paths
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    runAll()
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    runAll()
    (1 to 3).foreach { i =>
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      val a = runAll()
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      val b = runAll()
      println(f"[scratch] round$i parallelismFirst=true ${a}%.3f s  false ${b}%.3f s")
    }
    spark.stop()
  }
}
