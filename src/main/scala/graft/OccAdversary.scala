package graft

import org.apache.spark.sql.SparkSession
import graft.streaming.{CommitStore, ExactlyOnceSink}

/** One OCC writer PROCESS for the two-JVM adversary test
  * (TwoJvmOccSpec): a real forked JVM with its own SparkSession racing
  * rival processes on SHARED tables — `commitAppend` + `merge` (the
  * snapshot-verb conflict shape) on table A, and allow-gaps identity
  * appends (RESERVE IDENTITY metadata claims + data claims) on table
  * B. Two tables because merge's whole-row replace semantics
  * deliberately null columns the update frame omits — mixing it with
  * auto-assigned identity on one table would assert nothing the
  * protocol promises. The in-JVM stress spec (OccStressSpec) races
  * threads; this main is what turns the claim primitive's
  * cross-process story — exclusive create / conditional put, NOT any
  * JVM-level lock — from a design-note assertion into a tested fact.
  *
  * args: tableA tableB writerId nRounds storeKind(posix|cput)
  *
  * Emits one final line `OCC_ADVERSARY_DONE writer=<id>` the parent
  * parses; exits nonzero on any failure. Row ids are writer-disjoint
  * (writerId * 1e6 + ordinal) so the parent reconstructs the exact
  * expected state of both tables. */
object OccAdversary {
  def main(args: Array[String]): Unit = {
    val tableA = args(0)
    val tableB = args(1)
    val writerId = args(2).toInt
    val n = args(3).toInt
    val storeKind = args(4)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-occ-adversary-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val store = CommitStore.forName(storeKind)
      val a = new ExactlyOnceSink(tableA, appId = s"adv-$writerId",
        storeFactory = store)
      val b = new ExactlyOnceSink(tableB, appId = s"adv-$writerId",
        storeFactory = store)
      (0 until n).foreach { i =>
        val base = writerId * 1000000L + i * 10L
        a.commitAppend(Seq.tabulate(3)(j => (base + j, s"w$writerId-a$i"))
          .toDF("id", "x").coalesce(1))
        // every third round, a SNAPSHOT verb races the rivals' appends:
        // merge re-reads live state and rewrites it — the conflict
        // shape (stale read → recompute → re-claim) appends alone
        // never produce
        if (i % 3 == 2)
          a.merge(spark,
            Seq((base, s"w$writerId-m$i")).toDF("id", "x"), Seq("id"))
        // identity table: every append is a RESERVE IDENTITY metadata
        // claim + a data claim, both racing the rival process
        b.commitAppend(Seq.tabulate(2)(j => (base + j, s"w$writerId-b$i"))
          .toDF("k", "y").coalesce(1))
      }
      println(s"OCC_ADVERSARY_DONE writer=$writerId")
    } finally spark.stop()
  }
}
