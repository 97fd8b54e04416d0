package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    val s = spark
    def time(name: String)(f: => Long): Unit = {
      (1 to 4).foreach { i =>
        Bench.sweep(spark)
        val t0 = System.nanoTime()
        val r = f
        println(f"[scratch] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
      }
      Bench.sweep(spark)
    }
    // jaccard_pairs cumulative prefixes
    def docs0 = Tables(s, d, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
      .select(col("doc_id"), col("source"),
        array_distinct(split(col("text"), " ")).as("toks"))
      .select(col("doc_id"), col("source"), col("toks"),
        size(col("toks")).as("sz"),
        array_sort(transform(col("toks"), tk => xxhash64(tk))).as("hs"))
    time("j1_docs_kernel") { docs0.count() }
    time("j2_docs_persist_count") {
      val dk = docs0.persist(); val c = dk.count(); c
    }
    def mk(dk: org.apache.spark.sql.DataFrame) = {
      val tok = dk.select(col("doc_id"), col("source"), col("sz"),
        explode(col("toks")).as("token"))
      val dfreq = tok.groupBy("token").agg(count(lit(1)).as("df"))
      val wRank = Window.partitionBy("doc_id").orderBy(col("df"), col("token"))
      tok.join(dfreq, Seq("token"))
        .withColumn("rk", row_number().over(wRank))
        .filter(col("rk") <= floor(col("sz") / 2) + 1)
        .select(col("token"), col("source"), col("doc_id"), col("sz"),
          col("rk"))
    }
    time("j3_prefix_build") {
      val dk = docs0.persist(); dk.count()
      mk(dk).count()
    }
    time("j4_cand_join") {
      val dk = docs0.persist(); dk.count()
      val prefix = mk(dk)
      prefix.alias("x").join(prefix.alias("y"),
          col("x.token") === col("y.token")
            && col("x.source") === col("y.source")
            && (col("x.sz") < col("y.sz")
              || (col("x.sz") === col("y.sz")
                && col("x.doc_id") < col("y.doc_id")))
            && col("y.sz") <= col("x.sz") * 2
            && col("x.rk") <= col("x.sz")
              - floor((col("x.sz") * 2 + 2) / 3) + 1
            && (least(col("x.sz") - col("x.rk"), col("y.sz") - col("y.rk"))
              + 1) * 3 >= col("x.sz") + col("y.sz"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("d1"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("d2"))
        .distinct().count()
    }
    time("j5_full") {
      SparkEntry.queries("q_llm_jaccard_pairs")(spark, d).count()
    }
    spark.stop()
  }
}
