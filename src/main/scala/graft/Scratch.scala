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
        Bench.sweep(spark)
      }
    }
    val np = spark.sessionState.conf.numShufflePartitions
    val li0 = Tables(spark, d, "lineitem").select(col("l_returnflag").as("flag"),
      col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    val li = li0.repartition(np, col("x"), col("y"))
    val B = 128
    val ps = array((1 until B).map(i => lit(i.toDouble / B)): _*)
    time("sketch_norepart") {
      li0.groupBy("flag").agg(
        percentile_approx(col("x"), ps, lit(2500)).as("tx"),
        percentile_approx(col("y"), ps, lit(2500)).as("ty")).count()
    }
    time("sketch_repart") {
      li.groupBy("flag").agg(
        percentile_approx(col("x"), ps, lit(2500)).as("tx"),
        percentile_approx(col("y"), ps, lit(2500)).as("ty")).count()
    }
    import graft.functions.BucketIndex.bucketIndex
    val cuts = li.groupBy("flag").agg(
      percentile_approx(col("x"), ps, lit(2500)).as("tx"),
      percentile_approx(col("y"), ps, lit(2500)).as("ty"))
    time("bucket_pass") {
      li.join(broadcast(cuts), "flag")
        .select(col("flag"),
          bucketIndex(spark, col("x").cast("double"),
            col("tx").cast("array<double>")).as("bx"),
          bucketIndex(spark, col("y").cast("double"),
            col("ty").cast("array<double>")).as("by"))
        .groupBy("flag", "bx", "by").agg(count(lit(1)).as("cnt")).count()
    }
    spark.stop()
  }
}
