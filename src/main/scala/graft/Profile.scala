package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main: time named queries (args) at SPARK_GRAFT_SF_DIR,
  * printing per-query seconds; `-e` also prints the formatted plan;
  * `-mh` times the minhash pipeline stage by stage. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = args.contains("-e")
    val names = args.filterNot(_.startsWith("-"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    if (args.contains("-mh")) {
      val tks = col("toks")
      val base = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), when(size(tks) >= 3,
            array_distinct(transform(sequence(lit(0), size(tks) - 3),
              i => concat_ws(" ", element_at(tks, i + 1),
                element_at(tks, i + 2), element_at(tks, i + 3)))))
          .otherwise(array(col("text"))).as("shs"))
      (1 to 2).foreach { i =>
        time(s"base.count $i")(base.count())
        time(s"shingle-materialize $i")(
          base.select(sum(size(col("shs")).cast("long"))).collect())
        val sig = base.select(col("doc_id"),
          graft.functions.MinHashSig.minhashSig(spark, col("shs"), 32).as("sig"))
        time(s"sig $i")(sig.select(max(element_at(col("sig"), 1))).collect())
        val docArr = base.select(col("doc_id"), size(col("shs")).as("sz"),
          array_sort(transform(col("shs"), sh => xxhash64(sh))).as("hss"))
        time(s"docArr $i")(docArr.select(max(element_at(col("hss"), 1))).collect())
        val bands = array((0 until 8).map { b =>
          struct(lit(b).as("band"),
            xxhash64((0 until 4).map(r =>
              element_at(col("sig"), b * 4 + r + 1)): _*).as("bkey"))
        }: _*)
        val bandKeys = sig.select(col("doc_id"), explode(bands).as("bk"))
          .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
        val cand = bandKeys.alias("x")
          .join(bandKeys.alias("y"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
              && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .distinct()
        time(s"cand $i")(cand.count())
      }
    }

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"[profile] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
      }
    }
    spark.stop()
  }
}
