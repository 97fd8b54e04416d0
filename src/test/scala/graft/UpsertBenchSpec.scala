package graft

import java.nio.file.Files

/** Cross-validates the sink's two MERGE protocols: the identical
  * deterministic update stream applied copy-on-write and merge-on-read
  * must produce the same row count and value checksum (UpsertBench.run
  * asserts counts internally; this pins the cross-protocol equality at
  * a small config so a DV regression can't hide behind either path). */
class UpsertBenchSpec extends SparkSpecBase {

  test("copy-on-write and merge-on-read merges converge to identical state") {
    def once(mor: Boolean): UpsertBench.UpsertResult = {
      val dir = Files.createTempDirectory(
        s"graft-upsert-spec-${if (mor) "mor" else "cow"}").toString
      UpsertBench.run(spark, sf, scale = 2, batches = 3,
        updatesPerBatch = 50, mor = mor, tableDir = dir)
    }
    val cow = once(mor = false)
    val mor = once(mor = true)
    assert(cow.baseRows === mor.baseRows)
    assert(cow.checksum === mor.checksum,
      "CoW and MOR merge histories must converge to the same table")
  }
}
