package graft

import org.apache.spark.sql.SparkSession
import graft.streaming.{CommitStore, ExactlyOnceSink}

/** A writer PROCESS that dies at the worst moment (CrashInjectionSpec):
  * after moving its staged data under `data/` but BEFORE claiming the
  * version — the exact window the commit protocol's vacuum-age argument
  * (ExactlyOnceSink scaladoc) is load-bearing for. `Runtime.halt` skips
  * every shutdown hook and finally block, so nothing cleans up: the
  * parent asserts readers never see the orphan, the log stays linear,
  * and an aged vacuum reclaims the bytes — over BOTH commit stores.
  *
  * args: tableDir storeKind(posix|cput) mode(append|mor)
  *
  *  - append: commitAppend halted at [[ExactlyOnceSink.stagedHook]]
  *    (data dir moved, claim never attempted) — orphans `files/<uuid>`;
  *  - mor: deleteDV halted at [[ExactlyOnceSink.txnStagedHook]] (change
  *    dir moved, claim never attempted) — orphans `changes/<uuid>`.
  *
  * Prints `CRASH_ADVERSARY_ARMED` before the verb so the parent can
  * distinguish "died at the seam" (exit 137) from "died setting up". */
object CrashAdversary {
  def main(args: Array[String]): Unit = {
    val tableDir = args(0)
    val storeKind = args(1)
    val mode = args(2)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-crash-adversary-$mode")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val sink = new ExactlyOnceSink(tableDir, appId = "crash-writer",
      storeFactory = CommitStore.forName(storeKind))
    val die: () => Unit = () => {
      // stdout may be lost on halt — that's fine, the marker below
      // already flushed before the verb started
      Runtime.getRuntime.halt(137)
    }
    println("CRASH_ADVERSARY_ARMED")
    Console.flush()
    mode match {
      case "append" =>
        sink.stagedHook = die
        sink.commitAppend(
          Seq((1000L, "doomed"), (1001L, "doomed")).toDF("id", "x"))
      case "mor" =>
        sink.txnStagedHook = die
        sink.deleteDV(spark, org.apache.spark.sql.functions.col("id") === 1L)
      case other => sys.error(s"unknown crash mode '$other'")
    }
    // unreachable when the seam fires; reaching here is a test failure
    println("CRASH_ADVERSARY_SURVIVED")
    spark.stop()
    sys.exit(3)
  }
}
