package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.ExactlyOnceSink
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    val dir = Files.createTempDirectory("graft-probe-id").toString
    val setup = new ExactlyOnceSink(dir)
    setup.setIdentityColumn(spark, "rid")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val tasks = (0 until 4).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          try {
            val s = new ExactlyOnceSink(dir, appId = s"writer-$w")
            val v = s.commitAppend(spark.range(w * 100, w * 100 + 25).toDF("x"))
            println(s"WRITER $w committed v=$v")
          } catch { case e: Throwable => println(s"WRITER $w FAILED: $e") }
        }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(dir, "_graft_log")).iterator().asScala.toSeq.sortBy(_.toString)
      .foreach(f => println(s"== $f\n" + Files.readString(f).take(400)))
    import spark.implicits._
    val ids = new ExactlyOnceSink(dir).read(spark).select("rid").as[Long].collect().sorted
    println(s"count=${ids.length} ids=${ids.take(12).mkString(",")}...")
    spark.stop()
  }
}
