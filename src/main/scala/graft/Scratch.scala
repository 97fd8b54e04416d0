package graft
import org.apache.spark.sql.SparkSession

/** Throwaway stage-isolation probe for the optimization round (not part of
  * the driver contract; removed or inert in CI). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- Seq("q_llm_jaccard_pairs", "q_llm_kmeans", "q_llm_ppl_bucket",
        "q_llm_bpe_vocab")) {
      val df = SparkEntry.queries(n)(spark, d)
      println(s"[scratch] $n inputFiles = ${df.inputFiles.toSeq.distinct.mkString(", ")}")
    }
    spark.stop()
  }
}
