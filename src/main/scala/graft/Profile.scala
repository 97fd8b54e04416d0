package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main: time named queries (args) at SPARK_GRAFT_SF_DIR,
  * printing per-query seconds; `-e` also prints the formatted plan. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = args.contains("-e")
    val names = args.filterNot(_.startsWith("-"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // UTC: keep the events NTZ cast value-preserving (see Bench.scala)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"[profile] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
        Bench.sweep(spark)
      }
    }
    spark.stop()
  }
}
