package graft

import java.nio.file.Files
import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}
import graft.streaming.CommitStore

/** Commit-store canary (round 17): prices the claim primitive itself
  * across the two backends — POSIX hard-link exclusive create vs the
  * emulated object-store conditional PUT (store-wide JVM monitor + OS
  * advisory lock per claim). Three regimes, mirroring how the sink
  * actually drives the store:
  *
  *   - serial: one writer claiming successive versions (the streaming
  *     ingest shape) — claims/sec;
  *   - contended-distinct: 8 threads claiming DISJOINT version ranges
  *     (concurrent OCC appends between conflicts) — aggregate
  *     claims/sec, where the cput store's single lock serializes and
  *     the posix store does not;
  *   - same-key race: 8 threads × rounds all claiming ONE version
  *     (the conflict instant itself) — winners are asserted exactly 1
  *     per round.
  *
  * Local-FS numbers bound the EMULATION's overhead only; on a real
  * object store both backends' costs are replaced by the store's PUT
  * latency (the contract note in CommitStore.scala). Emits one JSON
  * line and persists golden/store_r17.json. */
object StoreBench {
  private def f1(v: Double): String = f"$v%.1f"

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  private def bench(kind: String, factory: CommitStore.Factory)
      : (String, Map[String, Double]) = {
    val entry = """{"txn":{"appId":"bench","version":0},""" +
      s""""payload":"${"x" * 512}"}"""
    // serial
    val d1 = Files.createTempDirectory(s"graft-storebench-$kind-serial")
    val st1 = factory(d1)
    val nSerial = 4000
    val (tSerial, _) = time {
      (0 until nSerial).foreach { v =>
        require(st1.putIfAbsent(f"$v%020d.json", entry))
      }
    }
    // contended, disjoint keys
    val d2 = Files.createTempDirectory(s"graft-storebench-$kind-cont")
    val st2 = factory(d2)
    val threads = 8
    val perThread = 500
    val pool = Executors.newFixedThreadPool(threads)
    val barrier = new CyclicBarrier(threads)
    val (tCont, _) = time {
      (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            barrier.await(30, TimeUnit.SECONDS)
            (0 until perThread).foreach { i =>
              require(st2.putIfAbsent(
                f"${t * 1000000 + i}%020d.json", entry))
            }
          }
        })
      }.foreach(_.get(120, TimeUnit.SECONDS))
    }
    // same-key race
    val d3 = Files.createTempDirectory(s"graft-storebench-$kind-race")
    val st3 = factory(d3)
    val rounds = 200
    val (tRace, wins) = time {
      (0 until rounds).map { r =>
        val b = new CyclicBarrier(threads)
        (0 until threads).map { t =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = {
              b.await(30, TimeUnit.SECONDS)
              st3.putIfAbsent(f"$r%020d.json", entry)
            }
          })
        }.map(_.get(60, TimeUnit.SECONDS)).count(identity)
      }.sum
    }
    pool.shutdownNow()
    require(wins == rounds, s"$kind: $wins winners over $rounds rounds")
    (kind, Map(
      "serial_claims_per_sec" -> nSerial / tSerial,
      "contended_claims_per_sec" -> (threads * perThread) / tCont,
      "race_rounds_per_sec" -> rounds / tRace))
  }

  def main(args: Array[String]): Unit = {
    val results = Seq(
      bench("posix", CommitStore.Posix),
      bench("cput", CommitStore.ConditionalPut))
    val js = results.map { case (k, m) =>
      s""""$k":{${m.toSeq.sortBy(_._1)
        .map { case (n, v) => s""""$n":${f1(v)}""" }.mkString(",")}}"""
    }.mkString(",")
    val line = s"""{"metric":"store_bench","unit":"ops_per_sec",$js}"""
    println(line)
    Files.createDirectories(java.nio.file.Paths.get("golden"))
    Files.writeString(java.nio.file.Paths.get("golden/store_r17.json"),
      line + "\n")
  }
}
