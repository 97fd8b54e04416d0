package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType}
import graft.streaming.ExactlyOnceSink

/** Type widening (the Delta type-widening feature analog): a lossless
  * widen (byte<short<int<long, float<double) is the ONE type flip the
  * write path accepts — as an explicit evolution under mergeSchema=true
  * (the table type widens, the commit declares the `typeWidening`
  * reader feature, old narrow files stay live and coerce on read), or
  * implicitly for a NARROWER write (the frame upcasts to the table type
  * before staging, so no new narrow files appear). Everything else
  * (narrowing, cross-family) still aborts. */
class TypeWideningSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-widen").toString

  test("int -> long widening under mergeSchema: type, values, metadata all coherent") {
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(Seq((1, "a"), (2, "b")).toDF("v", "x")) // v: int
    assert(sink.read(spark).schema("v").dataType == IntegerType)
    // the widening write: long frame, evolution opt-in
    sink.commitAppend(Seq((3000000000L, "c")).toDF("v", "x"),
      mergeSchema = true)
    val got = sink.read(spark)
    assert(got.schema("v").dataType == LongType,
      "read must present the widened type over mixed-width files")
    assert(got.select("v").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3000000000L))
    // table schema recorded widened; later metadata still coherent
    assert(sink.latestSchema().get("v").dataType == LongType)
    assert(sink.rowCount(spark) == 3L)
    // numeric stats fold across narrow and wide files
    assert(sink.columnStats("v") == Some(("1", "3000000000")))
  }

  test("widening without mergeSchema fails loudly, naming the fix") {
    val sink = new ExactlyOnceSink(tmp())
    sink.commitAppend(Seq((1, "a")).toDF("v", "x"))
    val e = intercept[RuntimeException](
      sink.commitAppend(Seq((2L, "b")).toDF("v", "x")))
    assert(e.getMessage.contains("WIDENING") &&
      e.getMessage.contains("mergeSchema"), e.getMessage)
  }

  test("a NARROWER write upcasts to the table type — no new narrow files, no opt-in needed") {
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(Seq((10L, "a")).toDF("v", "x")) // table: long
    sink.commitAppend(Seq((20, "b")).toDF("v", "x")) // int frame: fine
    val got = sink.read(spark)
    assert(got.schema("v").dataType == LongType)
    assert(got.select("v").as[Long].collect().sorted.toSeq == Seq(10L, 20L))
    // the staged file itself carries long: reading JUST the second
    // commit's files shows the upcast happened at write, not read
    val secondDir = sink.commitDataDirs(1).head
    val raw = spark.read.parquet(
      Paths.get(dir, "data", secondDir).toString)
    assert(raw.schema("v").dataType == LongType,
      "narrow frame must be upcast before staging")
  }

  test("cross-family and narrowing flips still abort") {
    val sink = new ExactlyOnceSink(tmp())
    sink.commitAppend(Seq((1L, "a")).toDF("v", "x"))
    // narrowing long -> int is the UPCAST path (accepted); but a float
    // into an integral column is cross-family and must abort even with
    // mergeSchema
    val e1 = intercept[RuntimeException](
      sink.commitAppend(Seq((1.5f, "b")).toDF("v", "x"), mergeSchema = true))
    assert(e1.getMessage.contains("type mismatch"), e1.getMessage)
    // string into a numeric column: same
    val e2 = intercept[RuntimeException](
      sink.commitAppend(Seq(("nope", "b")).toDF("v", "x"), mergeSchema = true))
    assert(e2.getMessage.contains("type mismatch"), e2.getMessage)
  }

  test("float -> double widens; the widening commit declares the reader feature") {
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(Seq((1.5f, "a")).toDF("v", "x"))
    val wv = sink.commitAppend(Seq((2.25d, "b")).toDF("v", "x"),
      mergeSchema = true)
    assert(sink.read(spark).schema("v").dataType == DoubleType)
    assert(sink.read(spark).schema("v").dataType != FloatType)
    val entry = Files.readString(
      Paths.get(dir, "_graft_log", f"$wv%020d.json"))
    assert(entry.contains("\"typeWidening\""),
      "the widening commit must declare the reader feature — a reader " +
        "that cannot coerce mixed-width files would misread the column")
    // non-widening commits do NOT carry it
    val v2 = sink.commitAppend(Seq((3.5d, "c")).toDF("v", "x"))
    assert(!Files.readString(Paths.get(dir, "_graft_log",
      f"$v2%020d.json")).contains("typeWidening"))
  }

  test("widening survives checkpoint + cleanupLog; DV delete and merge work over mixed files") {
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir, checkpointInterval = 3)
    sink.commitAppend(Seq((1, "a"), (2, "b")).toDF("v", "x").coalesce(1))
    sink.commitAppend(Seq((5000000000L, "c")).toDF("v", "x"),
      mergeSchema = true)
    // MOR delete hits a row in the NARROW (pre-widening) file
    sink.deleteDV(spark, col("v") === 1)
    // CoW-free upsert with a narrow updates frame into the widened table
    sink.mergeDV(spark, Seq((2, "b2")).toDF("v", "x"), Seq("v"))
    (0 until 3).foreach(i =>
      sink.commitAppend(Seq((100L + i, s"d$i")).toDF("v", "x")))
    sink.cleanupLog(minAgeMs = 0)
    val cold = new ExactlyOnceSink(dir)
    val got = cold.read(spark)
    assert(got.schema("v").dataType == LongType)
    assert(got.select("v", "x").as[(Long, String)].collect().toMap ==
      Map(2L -> "b2", 5000000000L -> "c", 100L -> "d0", 101L -> "d1",
        102L -> "d2"))
  }

  test("a clone of a widened table serves the widened type and the mixed-width files") {
    val srcDir = tmp()
    val src = new ExactlyOnceSink(srcDir)
    src.commitAppend(Seq((1, "a")).toDF("v", "x"))
    src.commitAppend(Seq((4000000000L, "b")).toDF("v", "x"),
      mergeSchema = true)
    val cloneDir = tmp()
    src.cloneTo(cloneDir) // the typeWidening feature rides the copied log
    val clone = new ExactlyOnceSink(cloneDir)
    val got = clone.read(spark)
    assert(got.schema("v").dataType == LongType)
    assert(got.select("v").as[Long].collect().sorted.toSeq ==
      Seq(1L, 4000000000L))
    // and the clone keeps evolving independently
    clone.commitAppend(Seq((7, "c")).toDF("v", "x")) // narrow: upcast
    assert(clone.read(spark).count() == 3)
    assert(src.read(spark).count() == 2, "clone append leaked to source")
  }

  test("RESTORE to a pre-widening version rolls the type back with the snapshot") {
    val sink = new ExactlyOnceSink(tmp())
    val v0 = sink.commitAppend(Seq((1, "a")).toDF("v", "x"))
    sink.commitAppend(Seq((4000000000L, "b")).toDF("v", "x"),
      mergeSchema = true)
    sink.restore(spark, v0)
    // the restore snapshot's live files are all narrow, and the commit
    // records the as-of schema — the table IS int again (the Delta
    // RESTORE semantics: schema rolls back with the data)
    assert(sink.read(spark).schema("v").dataType == IntegerType)
    assert(sink.latestSchema().get("v").dataType == IntegerType)
    // re-widening afterwards still needs the explicit opt-in
    val e = intercept[RuntimeException](
      sink.commitAppend(Seq((5L, "c")).toDF("v", "x")))
    assert(e.getMessage.contains("WIDENING"))
    sink.commitAppend(Seq((5000000000L, "c")).toDF("v", "x"),
      mergeSchema = true)
    assert(sink.read(spark).schema("v").dataType == LongType)
    assert(sink.read(spark).select("v").as[Long].collect().sorted.toSeq ==
      Seq(1L, 5000000000L))
  }

  test("nested-nullability-only differences are the same type, not a flip") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val sink = new ExactlyOnceSink(tmp())
    // literal-built array column: containsNull = false
    sink.commitAppend(Seq((1L, Seq(1, 2))).toDF("k", "arr"))
    assert(!sink.latestSchema().get("arr").dataType
      .asInstanceOf[ArrayType].containsNull)
    // the same logical type with containsNull = true (what a parquet
    // round-trip of the table's own data can produce) must APPEND, not
    // abort as a 'column type mismatch' printing two identical
    // catalogStrings
    val loose = spark.createDataFrame(
      java.util.Arrays.asList(Row(2L, Seq(3))),
      StructType(Seq(StructField("k", LongType),
        StructField("arr", ArrayType(IntegerType, containsNull = true)))))
    sink.commitAppend(loose)
    assert(sink.read(spark).count() == 2)
    // round-trip append of the table's own data: the canonical trigger
    sink.commitAppend(sink.read(spark).select("k", "arr").limit(1))
    assert(sink.read(spark).count() == 3)
    // a REAL element-type flip under the same array shell still aborts
    val flip = spark.createDataFrame(
      java.util.Arrays.asList(Row(3L, Seq("s"))),
      StructType(Seq(StructField("k", LongType),
        StructField("arr", ArrayType(StringType, containsNull = true)))))
    val e = intercept[RuntimeException](sink.commitAppend(flip))
    assert(e.getMessage.contains("type mismatch"), e.getMessage)
  }

  test("an OCC append racing a widening commit never reverts the widened schema") {
    import java.util.concurrent.{Callable, CountDownLatch, Executors}
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(Seq((1, "a")).toDF("v", "x")) // table: int
    // Appenders stage int frames while a widening commit lands mid-race.
    // A writer that staged BEFORE the widening but claimed AFTER used to
    // re-record its stale stage-time schemaString as the new latest
    // metaData — silently reverting the evolution. The recorded schema
    // is now re-derived against the fresh committed table at every
    // claim attempt.
    val n = 6
    val pool = Executors.newFixedThreadPool(n)
    val started = new CountDownLatch(n)
    try {
      val appenders = (0 until n).map { i =>
        pool.submit(new Callable[Long] {
          def call(): Long = {
            started.countDown()
            new ExactlyOnceSink(dir)
              .commitAppend(Seq((10 + i, s"w$i")).toDF("v", "x"))
          }
        })
      }
      started.await()
      val wv = new ExactlyOnceSink(dir).commitAppend(
        Seq((9000000000L, "wide")).toDF("v", "x"), mergeSchema = true)
      appenders.foreach(_.get())
      // once widened, EVERY later commit's recorded schema must stay
      // long — the TypeWideningSpec latestSchema invariant, now under
      // concurrency
      val log = Paths.get(dir, "_graft_log")
      withDirStream(Files.list(log)) { s =>
        s.filter(_.getFileName.toString.endsWith(".json")).foreach { p =>
          val ver = p.getFileName.toString.stripSuffix(".json").toLong
          if (ver >= wv) {
            val body = Files.readString(p)
            assert(!body.contains("\"name\":\"v\",\"type\":\"integer\""),
              s"commit $ver reverted the widened column type:\n" +
                body.take(400))
          }
        }
      }
      assert(sink.latestSchema().get("v").dataType == LongType)
      assert(sink.read(spark).count() == (n + 2).toLong)
    } finally pool.shutdown()
  }

  test("time travel before the widening presents the as-of (narrow) type — the Delta semantics") {
    val sink = new ExactlyOnceSink(tmp())
    val v0 = sink.commitAppend(Seq((1, "a")).toDF("v", "x"))
    sink.commitAppend(Seq((2L, "b")).toDF("v", "x"), mergeSchema = true)
    // unlike column mapping (current names at every version), the TYPE a
    // version presents is its snapshot's own: pre-widening files are int
    assert(sink.read(spark, versionAsOf = Some(v0))
      .schema("v").dataType == IntegerType)
    assert(sink.read(spark).schema("v").dataType == LongType)
  }

  test("claim retry re-validates: a rival's INCOMPATIBLE evolution aborts the commit, never silently keeps the rival type") {
    // r14 advice #2: enforceSchema ran once at commitAppend entry; a
    // rival that mergeSchema-adds x:int while this writer stages x:string
    // is not a widening in either direction, so evolvedSchemaOf would
    // keep the rival's committed type and the claim would record
    // metadata disagreeing with the staged parquet bytes — silently.
    // The retry path must re-validate and abort instead (the
    // MetadataChangedException Delta raises for this).
    val dir = tmp()
    val a = new ExactlyOnceSink(dir)
    a.commitAppend(Seq((1, "p"), (2, "q")).toDF("n", "pay"))
    val b = new ExactlyOnceSink(dir)
    a.stagedHook = () => {
      a.stagedHook = () => () // fire once
      b.commitAppend(Seq((3, "r", 7)).toDF("n", "pay", "x"),
        mergeSchema = true) // rival lands x:int AFTER a validated+staged
    }
    val e = intercept[RuntimeException] {
      a.commitAppend(Seq((4, "s", "oops")).toDF("n", "pay", "x"),
        mergeSchema = true) // our staged x is a STRING
    }
    assert(e.getMessage.contains("type mismatch"),
      s"expected a metadata-conflict abort, got: ${e.getMessage}")
    // the table is unharmed: rival's x:int stands, our staged dir is an
    // orphan (never claimed), reads stay coherent
    val got = b.read(spark)
    assert(got.schema("x").dataType == IntegerType)
    assert(got.count() == 3L)
  }

  test("claim retry re-validates: a rival's COMPATIBLE evolution (new unrelated column) does not block the commit") {
    val dir = tmp()
    val a = new ExactlyOnceSink(dir)
    a.commitAppend(Seq((1, "p")).toDF("n", "pay"))
    val b = new ExactlyOnceSink(dir)
    a.stagedHook = () => {
      a.stagedHook = () => ()
      b.commitAppend(Seq((2, "q", 9L)).toDF("n", "pay", "extra"),
        mergeSchema = true)
    }
    a.commitAppend(Seq((3, "r")).toDF("n", "pay"))
    val got = a.read(spark)
    assert(got.count() == 3L)
    // the rival's evolution survived our commit's recorded metadata
    assert(got.schema.fieldNames.contains("extra"))
    assert(got.filter(col("n") === 3).select("extra").head().isNullAt(0))
  }

  test("a metadata-only commit losing a race to a widening rival records the EVOLVED schema") {
    // constraint/generated/domain/row-tracking commits re-derive the
    // recorded schemaString on EVERY claim attempt: a stale at-entry
    // schema recorded after losing to a widening rival would silently
    // revert the rival's evolution in latestSchema
    val dir = tmp()
    val a = new ExactlyOnceSink(dir)
    a.commitAppend(Seq((1, "p")).toDF("v", "x")) // v: int
    val b = new ExactlyOnceSink(dir)
    a.metaClaimHook = () => {
      a.metaClaimHook = () => ()
      b.commitAppend(Seq((3000000000L, "w")).toDF("v", "x"),
        mergeSchema = true) // rival widens v mid-race
    }
    a.setConstraint(spark, "pos", "v > 0")
    assert(new ExactlyOnceSink(dir).latestSchema().get.apply("v")
      .dataType == LongType,
      "the constraint commit reverted the rival's widening")
    // same guarantee when the rival ADDS a column and a domain commit races
    a.metaClaimHook = () => {
      a.metaClaimHook = () => ()
      b.commitAppend(Seq((5L, "z", 9L)).toDF("v", "x", "extra"),
        mergeSchema = true)
    }
    a.setDomainMetadata("d", Map("k" -> "1"))
    assert(new ExactlyOnceSink(dir).latestSchema().get
      .fieldNames.contains("extra"),
      "the domain commit reverted the rival's added column")
  }

  test("rename racing a schema evolution aborts with a metadata conflict, never reverts it") {
    // a mapping commit's recorded schema is a TRANSFORM of the schema
    // it read — re-recording the stale transform would revert a rival
    // evolution, silently re-deriving could rename a column the rival
    // dropped. It aborts instead (Delta's MetadataChangedException
    // posture) and the re-run, deriving fresh, succeeds.
    val dir = tmp()
    val a = new ExactlyOnceSink(dir)
    a.commitAppend(Seq((1, "p")).toDF("v", "x"))
    val b = new ExactlyOnceSink(dir)
    a.metaClaimHook = () => {
      a.metaClaimHook = () => ()
      b.commitAppend(Seq((2, "q", 7L)).toDF("v", "x", "extra"),
        mergeSchema = true)
    }
    val e = intercept[RuntimeException](a.renameColumn("x", "x2"))
    assert(e.getMessage.contains("metadata conflict"),
      s"expected a metadata-conflict abort, got: ${e.getMessage}")
    val after = new ExactlyOnceSink(dir).latestSchema().get
    assert(after.fieldNames.contains("extra"),
      "the aborted rename leaked its stale schema")
    assert(after.fieldNames.contains("x") && !after.fieldNames.contains("x2"))
    // the caller's re-run derives from the fresh schema and commits
    a.renameColumn("x", "x2")
    val done = new ExactlyOnceSink(dir).latestSchema().get
    assert(done.fieldNames.contains("x2") && done.fieldNames.contains("extra"))
  }

  test("a snapshot over files that lost the widened column cannot shrink the recorded schema") {
    // the protocol-fuzz-found product: widen -> delete-everything ->
    // narrow append (no visible file carries n any more, so the READ
    // presents a frame without it) -> full-clause MERGE (a snapshot
    // computed from that frame). Recording the frame's schema would
    // SHRINK the table schema, and the next mergeSchema append would
    // re-introduce n at the NARROW width — coercing committed long
    // values down on read. Snapshot claims must record the evolved
    // union (latestSchema ∪ frame) instead.
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(Seq((1L, "a", 10)).toDF("id", "x", "n")) // n: int
    sink.commitAppend(Seq((2L, "b", 1L << 33)).toDF("id", "x", "n"),
      mergeSchema = true) // widen to long
    sink.delete(spark, col("id") >= 0L) // snapshot: the table empties
    sink.commitAppend(Seq((3L, "c")).toDF("id", "x")) // narrow: no n file
    sink.mergeFull(spark, Seq((3L, "u")).toDF("id", "x"), Seq("id"))
    assert(sink.latestSchema().get.apply("n").dataType == LongType,
      "the snapshot shrank the recorded table schema")
    // re-introducing n under mergeSchema must stay long (upcast write)
    sink.commitAppend(Seq((4L, "d", 7)).toDF("id", "x", "n"),
      mergeSchema = true)
    val got = sink.read(spark)
    assert(got.schema("n").dataType == LongType,
      "n re-entered at the narrow width — wide committed data would coerce down")
    assert(got.filter(col("id") === 4L).select("n").as[Long].head() == 7L)
  }

  test("MOR probe survives a restore-shaped lift spanning a widening boundary") {
    // fuzz seed 12 (round 16): a restore-shaped entry (backfill,
    // restore) can reference dirs from BOTH sides of a type widening —
    // int-era and long-era files. The MOR probe used to scan all its
    // dirs in ONE mergeSchema read, and parquet's schema merge refuses
    // int vs bigint (Spark's union coerces; parquet's merge does not).
    // The probe must read one dir per scan and union by name.
    val dir = tmp()
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(Seq((1L, 1)).toDF("id", "n")) // n: int era
    sink.commitAppend(Seq((2L, 3000000000L)).toDF("id", "n"),
      mergeSchema = true) // widen: long era
    // restore-shaped lift over both eras via the row-tracking backfill
    sink.enableRowTracking(spark, backfill = true)
    sink.deleteDV(spark, col("id") === 1L)
    assert(sink.read(spark).select("id", "n").as[(Long, Long)]
      .collect().toMap === Map(2L -> 3000000000L))
    // the same product through RESTORE's own lifted entry
    sink.restore(spark, toVersion = 1L)
    sink.deleteDV(spark, col("id") === 2L)
    assert(sink.read(spark).select("id", "n").as[(Long, Long)]
      .collect().toMap === Map(1L -> 1L))
  }
}
