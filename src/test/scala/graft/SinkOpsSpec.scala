package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.ExactlyOnceSink

/** q_sink_zorder_skip (SURVEY §2.1): the z-order clustered sink's
  * two-column stat skipping, measured and asserted — the conjunctive
  * prune must (a) lose no rows, (b) skip files, (c) prune at least as
  * hard as either single-column prune (the z-order payoff: footer stats
  * tight on BOTH clustered columns at once). */
class SinkOpsSpec extends SparkSpecBase {

  test("merge_read recipe: every semantic arm of the build actually bites") {
    // the q_sink_merge_read oracle passes vacuously if the fixture never
    // exercises an arm — pin that each one has matching rows: the
    // merge-over-merge overlap (last-writer-wins precedence), the second
    // merge's insert split, the first merge's update AND insert splits,
    // and the copy-on-write delete over an untouched row
    val ev = Tables(spark, sf, "events")
    val id = col("event_id")
    assert(ev.filter(col("user_id") === 5 && id % 3 === 0).count() > 0,
      "merge2 must REPLACE a row merge1 touched")
    assert(ev.filter(col("user_id") === 5 && id % 2 === 0 && id % 3 =!= 0)
      .count() > 0, "merge2 must also INSERT")
    assert(ev.filter(id % 2 === 1 && id % 3 === 0).count() > 0,
      "merge1 must UPDATE seeded rows")
    assert(ev.filter(id % 2 === 0 && id % 3 === 0).count() > 0,
      "merge1 must INSERT unseeded rows")
    assert(ev.filter(id % 2 === 1 && id % 3 =!= 0 &&
      col("user_id") =!= 5 && col("value") < 10).count() > 0,
      "the delete must remove at least one merge-untouched row")
  }

  test("conjunctive two-column skipping: lossless, and prunes harder than either column") {
    val events = Tables(spark, sf, "events")
    val dir = Files.createTempDirectory("graft-zorder-spec").toString
    val sink = new ExactlyOnceSink(dir)
    sink.commitAppend(events, clusterBy = Seq("user_id", "value"),
      clusterFiles = 16)

    val total = sink.read(spark).inputFiles.toSet
    assert(total.size >= 8, s"expected a multi-file clustered table, got ${total.size}")

    // A tight box in both dimensions (sf0.001: users 0-14, value 0-327).
    val (uLo, uHi) = (2.0, 5.0)
    val (vLo, vHi) = (30.0, 90.0)
    val byUser = sink.readSkippingAll(spark, Seq(("user_id", uLo, uHi))).inputFiles.toSet
    val byValue = sink.readSkippingAll(spark, Seq(("value", vLo, vHi))).inputFiles.toSet
    val both = sink.readSkippingAll(spark,
      Seq(("user_id", uLo, uHi), ("value", vLo, vHi))).inputFiles.toSet

    // conjunction = intersection of the per-column survivor sets
    assert(both == (byUser intersect byValue))
    // each column's stats prune on their own (z-order kept both tight)
    assert(byUser.size < total.size, "user_id stats pruned nothing")
    assert(byValue.size < total.size, "value stats pruned nothing")
    // and the conjunction prunes at least as hard as the best single column
    assert(both.size <= math.min(byUser.size, byValue.size))

    // lossless: pruned scan + exact predicate == full scan + exact predicate
    val pred = col("user_id").between(uLo, uHi) && col("value").between(vLo, vHi)
    val viaSkip = sink.readSkippingAll(spark,
        Seq(("user_id", uLo, uHi), ("value", vLo, vHi)))
      .filter(pred).agg(count(lit(1)), sum("value")).head()
    val viaFull = events.filter(pred).agg(count(lit(1)), sum("value")).head()
    assert(viaSkip == viaFull)
    assert(viaFull.getLong(0) > 0, "test box matched no rows — not probative")
  }

  test("q_sink_zorder_skip matches the direct events aggregate") {
    val direct = Tables(spark, sf, "events")
      .filter(col("user_id").between(4, 9) && col("value").between(50, 200))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Det.sumMoney(col("value")).as("val_sum"))
      .orderBy("event_type")
    assert(q("q_sink_zorder_skip").collect().toSeq == direct.collect().toSeq)
  }

  test("bloom lookup prunes user-striped files where range stats cannot") {
    val events = Tables(spark, sf, "events")
    val dir = Files.createTempDirectory("graft-bloom-spec").toString
    val sink = new ExactlyOnceSink(dir)
    (0 until 8).foreach { k =>
      sink.commitAppend(events.filter(pmod(col("user_id"), lit(8)) === k)
        .coalesce(1), bloomBy = Seq("user_id"))
    }
    val total = sink.read(spark).inputFiles.toSet
    val pruned = sink.readLookup(spark, "user_id", "7").inputFiles.toSet
    // every file's user RANGE spans ~the whole domain, so only the
    // bloom can prune — and it must keep the stripe holding user 7
    assert(pruned.size < total.size,
      s"bloom pruned nothing (${pruned.size}/${total.size})")
    val viaBloom = sink.readLookup(spark, "user_id", "7")
      .filter(col("user_id") === 7).agg(count(lit(1)), sum("value")).head()
    val direct = events.filter(col("user_id") === 7)
      .agg(count(lit(1)), sum("value")).head()
    assert(viaBloom == direct)
    assert(direct.getLong(0) > 0, "probe user missing — not probative")

    // the write recorded the bloom policy as a metadata domain
    assert(sink.domainMetadata("graft.bloom")
      .exists(_.get("columns").contains("user_id")))
    // blooms SURVIVE OPTIMIZE: pack the stripes ~2:1 and the probe must
    // still prune (the packed adds carry recomputed blooms — before
    // round 16 compaction silently dropped them and a bloom-less file
    // is kept conservatively, so pruning died)
    val maxStripe = total
      .map(f => Files.size(Paths.get(java.net.URI.create(f)))).max
    assert(sink.compactSmall(spark, targetBytes = 2 * maxStripe + 1) > 0)
    val packed = sink.read(spark).inputFiles.toSet
    assert(packed != total && packed.size > 1, "compaction did not repack")
    val prunedPacked = sink.readLookup(spark, "user_id", "7").inputFiles.toSet
    assert(prunedPacked.size < packed.size,
      s"bloom pruning lost after OPTIMIZE (${prunedPacked.size}/${packed.size})")
    assert(sink.readLookup(spark, "user_id", "7")
      .filter(col("user_id") === 7).agg(count(lit(1)), sum("value")).head()
      == direct)
    // the CoW snapshot path keeps the policy too: compact() rewrites
    // the whole table and an ABSENT key must prune to zero files —
    // possible only if the rewritten adds carry blooms at all
    sink.compact(spark)
    assert(sink.readLookup(spark, "user_id", "987654321").inputFiles.isEmpty,
      "compact dropped the bloom policy (bloom-less files read conservatively)")
    assert(sink.readLookup(spark, "user_id", "7")
      .filter(col("user_id") === 7).agg(count(lit(1)), sum("value")).head()
      == direct)
  }

  test("q_sink_shred_read: shredded JSON field prunes files and matches the raw fixture") {
    val events = Tables(spark, sf, "events")
    // the declared query (runs the build) equals the raw-JSON aggregate
    val direct = events
      .withColumn("k_shred",
        get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("k_shred").between(0, 9))
      .groupBy("k_shred")
      .agg(count(lit(1)).as("n"),
        graft.queries.Det.sumMoney(col("value")).as("val_sum"))
      .orderBy("k_shred")
    assert(q("q_sink_shred_read").collect().toSeq === direct.collect().toSeq)
    assert(direct.count() === 10L, "probe range not fully populated")
    // and the read is genuinely FILE-pruned on the shredded column: the
    // skipping scan opens strictly fewer files than the full table scan
    val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir")).toFile
      .listFiles().filter(_.getName.startsWith("graft-shred-sf0.001"))
      .head.toString
    val sink = new ExactlyOnceSink(dir)
    val total = sink.read(spark).inputFiles.length
    val pruned = sink.readSkipping(spark, "k_shred", 0, 9).inputFiles.length
    assert(total >= 8 && pruned < total,
      s"shredded-field skipping opened $pruned/$total files — no pruning")
  }

  test("appends without bloomBy inherit the declared bloom policy") {
    val events = Tables(spark, sf, "events").limit(400)
    val dir = Files.createTempDirectory("graft-bloom-default").toString
    val sink = new ExactlyOnceSink(dir)
    // the FIRST write declares the policy; every later append omits it
    sink.commitAppend(events.coalesce(1), bloomBy = Seq("user_id"))
    sink.commitAppend(events.withColumn("user_id", col("user_id") + 1000000)
      .coalesce(1)) // plain OCC append, no bloomBy
    sink.appendBatch(events.withColumn("user_id", col("user_id") + 2000000)
      .coalesce(1), batchId = 0, streamAppId = "s1") // cursored append
    // an ABSENT key prunes to ZERO files — possible only if every file
    // (including the policy-less appends') carries a bloom; a bloom-less
    // file is kept conservatively and would break the assert
    assert(sink.read(spark).inputFiles.length === 3)
    assert(sink.readLookup(spark, "user_id", "987654321").inputFiles.isEmpty,
      "an append without bloomBy wrote bloom-less files despite the " +
        "declared graft.bloom policy")
    // the streaming (process) path inherits it too
    val dir2 = Files.createTempDirectory("graft-bloom-default-stream").toString
    val sink2 = new ExactlyOnceSink(dir2)
    sink2.commitAppend(events.coalesce(1), bloomBy = Seq("user_id"))
    sink2.process(events.withColumn("user_id", col("user_id") + 1000000)
      .coalesce(1), batchId = 1)
    assert(sink2.read(spark).inputFiles.length === 2)
    assert(sink2.readLookup(spark, "user_id", "987654321").inputFiles.isEmpty,
      "a streaming micro-batch wrote bloom-less files despite the " +
        "declared graft.bloom policy")
    // an EXPLICIT bloomBy still overrides the policy (wider bitmap)
    val v = sink.commitAppend(events.withColumn("user_id",
      col("user_id") + 3000000).coalesce(1),
      bloomBy = Seq("user_id"), bloomBits = 8192)
    assert(v > 0)
    assert(sink.readLookup(spark, "user_id", "987654321").inputFiles.isEmpty)
  }

  test("a policy-less append after DROP COLUMN never narrows the declared bloom policy") {
    // activeBloomPolicy() filters the declared set down to the LIVE
    // schema, which is right for staging (a dropped column cannot get a
    // bloom) but must never be re-RECORDED: the graft.bloom domain keeps
    // the caller's full declaration, so the narrowing stays transient
    // (the same posture compactSmall takes for graft.clustering)
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bloom-narrow").toString
    val sink = new ExactlyOnceSink(dir)
    val df = (0 until 50).map(i => (i, s"k$i", s"u$i")).toDF("id", "k", "u")
    sink.commitAppend(df.coalesce(1), bloomBy = Seq("k", "u"), bloomBits = 2048)
    assert(sink.domainMetadata("graft.bloom").flatMap(_.get("columns"))
      .exists(_.split(',').toSet == Set("k", "u")))
    sink.dropColumn("u")
    // inherited-policy appends (plain, cursored, streaming) must leave
    // the recorded declaration untouched
    sink.commitAppend(df.drop("u").coalesce(1))
    sink.appendBatch(df.drop("u").coalesce(1), batchId = 0, streamAppId = "s9")
    assert(sink.domainMetadata("graft.bloom").flatMap(_.get("columns"))
      .exists(_.split(',').toSet == Set("k", "u")),
      "an inherited-policy append re-recorded the schema-narrowed view, " +
        "making the DROP's narrowing permanent")
    // staging still honors the live-schema policy: the surviving column
    // prunes to zero files on an absent key
    assert(sink.readLookup(spark, "k", "absent-key").inputFiles.isEmpty)
    // and an EXPLICIT re-declaration still replaces the recorded set
    sink.commitAppend(df.drop("u").coalesce(1), bloomBy = Seq("k"))
    assert(sink.domainMetadata("graft.bloom").flatMap(_.get("columns"))
      .contains("k"))
  }

  test("q_sink_bloom_lookup matches the direct events aggregate") {
    val direct = Tables(spark, sf, "events")
      .filter(col("user_id") === 7)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Det.sumMoney(col("value")).as("val_sum"))
      .orderBy("event_type")
    assert(q("q_sink_bloom_lookup").collect().toSeq == direct.collect().toSeq)
  }

  test("q_sink_gen_read matches deriving the generated expression over raw events") {
    val direct = Tables(spark, sf, "events")
      .filter(pmod(col("user_id"), lit(8)) === 3)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Det.sumMoney(col("value")).as("val_sum"))
      .orderBy("event_type")
    assert(q("q_sink_gen_read").collect().toSeq == direct.collect().toSeq)
  }

  test("q_sink_timetravel sees exactly the first two chunked appends") {
    val direct = Tables(spark, sf, "events")
      .filter(pmod(col("event_id"), lit(4)) < 2)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Det.sumMoney(col("value")).as("val_sum"))
      .orderBy("event_type")
    assert(q("q_sink_timetravel").collect().toSeq == direct.collect().toSeq)
  }

  test("q_sink_cdc_read carries each DV delete's OWN change set") {
    val ev = Tables(spark, sf, "events")
    // second delete's set excludes rows the first already removed
    val d4 = ev.filter(col("user_id") === 3)
      .select(lit("delete").as("_change_type"), lit(4).as("batch"),
        col("event_type"), col("value"))
    val d5 = ev.filter(col("user_id") =!= 3 && col("value") > 250)
      .select(lit("delete").as("_change_type"), lit(5).as("batch"),
        col("event_type"), col("value"))
    val direct = d4.unionAll(d5)
      .groupBy(col("_change_type"), col("batch"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Det.sumMoney(col("value")).as("val_sum"))
      .orderBy("batch", "event_type")
    val got = q("q_sink_cdc_read").collect().toSeq
    assert(got == direct.collect().toSeq)
    assert(got.nonEmpty && got.map(_.getInt(1)).distinct.sorted == Seq(4, 5),
      "both DV-delete versions must contribute change rows")
  }
}
