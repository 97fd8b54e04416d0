package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.streaming.{CommitStore, ExactlyOnceSink}

/** TWO REAL JVMs racing one table set — the cross-process OCC
  * adversary (r16 verdict #2). OccStressSpec races threads inside one
  * JVM, where a shared mutex could silently be doing the claim
  * primitive's job; forking real processes proves the commit point is
  * the STORAGE primitive itself (POSIX exclusive create / emulated
  * conditional PUT — both backends run). Each child ([[OccAdversary]])
  * drives commitAppend + merge on table A and allow-gaps identity
  * appends (RESERVE IDENTITY metadata claims + data claims) on table
  * B; the parent then asserts the protocol's cross-process promises:
  * a LINEAR GAP-FREE log, the exact model state on both tables,
  * CONTIGUOUS unique identity values (no crash → reservations leave
  * no holes), and the log-fold rowCount. */
class TwoJvmOccSpec extends SparkSpecBase {

  private val Rounds = 5

  private def forkWriter(tableA: String, tableB: String, writerId: Int,
      storeKind: String): Process = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(java, "-Xmx2g", "-cp", cp) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "graft.OccAdversary", tableA, tableB,
      writerId.toString, Rounds.toString, storeKind)).asJava
    new ProcessBuilder(cmd)
      .redirectErrorStream(true)
      .redirectOutput(
        Files.createTempFile(s"occ-adv-$writerId-", ".log").toFile)
      .start()
  }

  for (storeKind <- Seq("posix", "cput"))
    test(s"two forked JVMs race appends+merge+identity over $storeKind; " +
        "the log stays linear and gap-free") {
      val tableA = Files.createTempDirectory(s"graft-2jvm-a-$storeKind").toString
      val tableB = Files.createTempDirectory(s"graft-2jvm-b-$storeKind").toString
      val store = CommitStore.forName(storeKind)
      // declare the identity rule BEFORE data lands (version 0 of B)
      new ExactlyOnceSink(tableB, storeFactory = store)
        .setIdentityColumn(spark, "rid", allowGaps = true)

      val procs = Seq(1, 2).map(w => forkWriter(tableA, tableB, w, storeKind))
      procs.zipWithIndex.foreach { case (p, i) =>
        assert(p.waitFor(600, TimeUnit.SECONDS),
          s"writer ${i + 1} did not finish in time")
        assert(p.exitValue() === 0,
          s"writer ${i + 1} exited ${p.exitValue()} — its OCC loop failed " +
            "cross-process")
      }

      // fresh handles (the parent observed nothing mid-run)
      val a = new ExactlyOnceSink(tableA, storeFactory = store)
      val b = new ExactlyOnceSink(tableB, storeFactory = store)

      // 1. LINEAR, GAP-FREE history on both tables: every version from
      // 0..max exists — claims are dense even across processes
      Seq("A" -> a, "B" -> b).foreach { case (tag, s) =>
        val vs = s.committedVersions()
        assert(vs.nonEmpty && vs === (0L to vs.max),
          s"table $tag log has gaps or is empty: $vs")
      }
      // both writers actually interleaved work: table A carries each
      // writer's appends (3 per round) and merges (1 per 3 rounds)
      val merges = 2 * ((Rounds + 0) / 3)
      assert(a.committedVersions().size === 2 * Rounds + merges)

      // 2. table A state matches the model exactly
      val expectA = (for {
        w <- Seq(1, 2); i <- 0 until Rounds; j <- 0 until 3
      } yield {
        val base = w * 1000000L + i * 10L
        val x = if (j == 0 && i % 3 == 2) s"w$w-m$i" else s"w$w-a$i"
        (base + j) -> x
      }).toMap
      val gotA = a.read(spark).select("id", "x").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(gotA === expectA, "table A diverged from the model")
      assert(a.rowCount(spark) === expectA.size.toLong)

      // 3. table B: contiguous unique identity across processes — no
      // crash happened, so reservations left no holes, and two JVMs
      // reserving through the same dense claim sequence can never
      // overlap
      val ridRows = b.read(spark).select("rid", "k").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val total = 2L * Rounds * 2L
      assert(ridRows.length.toLong === total)
      assert(ridRows.map(_._1).sorted.toSeq === (1L to total),
        "identity values are not contiguous/unique across processes")
      assert(b.rowCount(spark) === total)
    }
}
