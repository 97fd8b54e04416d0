package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CommitStore, ConditionalPutCommitStore,
  PosixCommitStore}

/** The [[CommitStore]] contract, exercised identically over both
  * backends (POSIX hard-link and emulated object-store conditional
  * put), plus injected-race one-winner proofs: many writers "putting"
  * the same key concurrently — exactly one wins, the loser's content
  * never becomes visible, and a reader never observes a torn object.
  * No Spark needed — this is the storage layer under the sink. */
class CommitStoreSpec extends AnyFunSuite {

  private def stores(tag: String): Seq[(String, CommitStore)] = {
    val d1 = Files.createTempDirectory(s"graft-store-posix-$tag")
    val d2 = Files.createTempDirectory(s"graft-store-cput-$tag")
    Seq("posix" -> CommitStore.Posix(d1), "cput" -> CommitStore.ConditionalPut(d2))
  }

  test("contract: putIfAbsent/put/read/list/exists/delete over both backends") {
    stores("contract").foreach { case (kind, st) =>
      assert(st.list().isEmpty, s"[$kind] fresh root must list empty")
      assert(st.putIfAbsent("00000000000000000001.json", "{\"a\":1}"),
        s"[$kind] first conditional put must win")
      assert(!st.putIfAbsent("00000000000000000001.json", "{\"a\":2}"),
        s"[$kind] second conditional put must lose")
      assert(st.read("00000000000000000001.json") === "{\"a\":1}",
        s"[$kind] loser content must never become visible")
      st.put("m.checkpoint", "h1\nh2\n")
      assert(st.readLines("m.checkpoint") === Seq("h1", "h2"))
      st.put("m.checkpoint", "h3\n") // unconditional PUT replaces
      assert(st.read("m.checkpoint") === "h3\n")
      assert(st.exists("m.checkpoint") && !st.exists("nope"))
      assert(st.list().toSet === Set("00000000000000000001.json", "m.checkpoint"),
        s"[$kind] internal staging/lock objects must never be listed")
      val in = st.inputStream("00000000000000000001.json")
      try assert(new String(in.readNBytes(5), "UTF-8") === "{\"a\":")
      finally in.close()
      assert(st.modifiedTime("m.checkpoint") > 0L)
      st.touch("m.checkpoint") // ordering hint; must not throw
      assert(st.delete("m.checkpoint") && !st.exists("m.checkpoint"))
      assert(!st.delete("m.checkpoint"), s"[$kind] second delete is false")
      intercept[IllegalArgumentException](st.read("../escape"))
    }
  }

  test("race: N writers put the same key concurrently; exactly one wins") {
    stores("race").foreach { case (kind, st) =>
      (0 until 20).foreach { round =>
        val n = 8
        val barrier = new CyclicBarrier(n)
        val pool = Executors.newFixedThreadPool(n)
        try {
          val wins = (0 until n).map { i =>
            pool.submit(new java.util.concurrent.Callable[Boolean] {
              def call(): Boolean = {
                barrier.await(10, TimeUnit.SECONDS)
                st.putIfAbsent(f"$round%020d.json", s"""{"writer":$i}""")
              }
            })
          }.map(_.get(30, TimeUnit.SECONDS))
          assert(wins.count(identity) === 1,
            s"[$kind] round $round: ${wins.count(identity)} winners")
          val winner = wins.indexOf(true)
          assert(st.read(f"$round%020d.json") === s"""{"writer":$winner}""",
            s"[$kind] round $round: visible content is not the winner's")
        } finally pool.shutdownNow()
      }
    }
  }

  test("cput: one winner even when the check→create window is forced open") {
    // stall the FIRST writer inside the critical section while a rival
    // tries the same key: the rival must BLOCK (not interleave) and then
    // lose — the emulator's mutual exclusion is what a native
    // conditional PUT gives for free
    val dir = Files.createTempDirectory("graft-store-hook")
    val st = CommitStore.ConditionalPut(dir)
    val inSection = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val entered = new java.util.concurrent.atomic.AtomicInteger(0)
    ConditionalPutCommitStore.raceHook = { _ =>
      if (entered.incrementAndGet() == 1) {
        inSection.countDown()
        assert(release.await(10, TimeUnit.SECONDS), "hook never released")
      }
    }
    try {
      val pool = Executors.newFixedThreadPool(2)
      try {
        val first = pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = st.putIfAbsent("k.json", "first")
        })
        assert(inSection.await(10, TimeUnit.SECONDS))
        val second = pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = st.putIfAbsent("k.json", "second")
        })
        // the rival must not complete while the first holds the section
        Thread.sleep(150)
        assert(!second.isDone,
          "rival entered the critical section concurrently")
        release.countDown()
        assert(first.get(10, TimeUnit.SECONDS) === true)
        assert(second.get(10, TimeUnit.SECONDS) === false)
        assert(st.read("k.json") === "first")
      } finally pool.shutdownNow()
    } finally ConditionalPutCommitStore.raceHook = _ => ()
  }

  test("backends interoperate: a table written via posix reads via cput") {
    val dir = Files.createTempDirectory("graft-store-interop")
    val a = CommitStore.Posix(dir)
    assert(a.putIfAbsent("00000000000000000000.json", "x"))
    a.put("00000000000000000000.crc", "c")
    val b = CommitStore.ConditionalPut(dir)
    assert(b.list().toSet ===
      Set("00000000000000000000.json", "00000000000000000000.crc"))
    assert(!b.putIfAbsent("00000000000000000000.json", "y"),
      "cput must see posix-created objects as existing")
    assert(b.putIfAbsent("00000000000000000001.json", "z"))
    assert(!a.putIfAbsent("00000000000000000001.json", "w"),
      "posix must see cput-created objects as existing")
    assert(CommitStore.forName("posix") eq CommitStore.Posix)
    assert(CommitStore.forName("cput") eq CommitStore.ConditionalPut)
    intercept[RuntimeException](CommitStore.forName("s3"))
  }

  test("cput: a crashed lock-holding writer never orphans the store") {
    // the emulator's mutual exclusion is an OS advisory lock precisely
    // because the kernel releases it on process death — a lock FILE
    // would be orphaned by a crashed writer and deadlock every rival.
    // Fork a process that takes the lock and hangs, kill it, and prove
    // a rival's conditional put proceeds.
    val dir = Files.createTempDirectory("graft-store-crash")
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val log = Files.createTempFile("store-lock-holder", ".log")
    val p = new ProcessBuilder(javaBin, "-cp",
        System.getProperty("java.class.path"),
        "graft.StoreLockHolder", dir.toString)
      .redirectErrorStream(true)
      .redirectOutput(log.toFile)
      .start()
    try {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (!Files.readString(log).contains("STORE_LOCK_HELD")) {
        assert(System.nanoTime() < deadline, "lock holder never started")
        Thread.sleep(50)
      }
      // while the foreign process holds the lock, a putIfAbsent from
      // here must WAIT (run it async and observe it not completing)
      val st = CommitStore.ConditionalPut(dir)
      val pool = Executors.newFixedThreadPool(1)
      try {
        val f = pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = st.putIfAbsent("k.json", "v")
        })
        Thread.sleep(300)
        assert(!f.isDone, "putIfAbsent ignored a foreign process's lock")
        // kill the holder: the kernel releases its flock, the rival
        // proceeds — liveness after writer death, no manual cleanup
        p.destroyForcibly()
        assert(f.get(15, TimeUnit.SECONDS) === true)
        assert(st.read("k.json") === "v")
      } finally pool.shutdownNow()
    } finally if (p.isAlive) p.destroyForcibly()
  }

  test("factory classes are what forName says") {
    val d = Files.createTempDirectory("graft-store-kind")
    assert(CommitStore.Posix(d).isInstanceOf[PosixCommitStore])
    assert(CommitStore.ConditionalPut(d)
      .isInstanceOf[ConditionalPutCommitStore])
  }
}
