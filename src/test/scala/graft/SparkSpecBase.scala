package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session fixture (one JVM-wide session via getOrCreate;
  * same configs the driver harness uses). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"

  def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Drain-and-close for Files.list/walk streams — the same discipline
    * the sink's main path applies (each undrained stream is a leaked
    * directory FD until GC; a long suite run accumulates them). */
  def withDirStream[A, B](s: java.util.stream.Stream[A])(
      f: Iterator[A] => B): B = {
    import scala.jdk.CollectionConverters._
    try f(s.iterator().asScala) finally s.close()
  }
}
