package graft

/** Test fixture process for CommitStoreSpec's crashed-writer liveness
  * proof: grabs the conditional-put store's advisory lock exactly the
  * way [[graft.streaming.ConditionalPutCommitStore]] does, announces
  * it, and hangs until killed. The spec then destroys this process and
  * asserts a rival's putIfAbsent proceeds — the OS releases flocks on
  * process death, which is precisely why the emulator uses an OS lock
  * rather than a lock FILE (which a crashed writer would orphan,
  * deadlocking the store).
  *
  * args: storeRootDir */
object StoreLockHolder {
  def main(args: Array[String]): Unit = {
    val root = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(root)
    val ch = java.nio.channels.FileChannel.open(
      root.resolve(".store.lock"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    ch.lock()
    println("STORE_LOCK_HELD")
    System.out.flush()
    Thread.sleep(600000) // parent kills us long before this
  }
}
