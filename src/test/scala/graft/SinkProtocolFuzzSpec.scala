package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.ExactlyOnceSink

/** Model-based fuzz of the sink's commit protocol: seeded random
  * sequences of append / merge / mergeFull (all four clause outcomes) /
  * replaceWhere (atomic predicate backfill) /
  * mergeDV / delete / deleteDV / restore / schema evolution / column
  * rename / column DROP / shallow clone / cleanupLog / vacuum /
  * incremental OPTIMIZE (copy-on-write and merge-on-read, including
  * DV-cap-forced rewrites), checked after every step against an
  * in-memory reference model — live state, per-version history for
  * time travel, and the retention boundary — and at the end by a
  * CDC-replay fold (the change feed from the earliest retained version
  * must reconstruct the final state exactly). The targeted specs
  * (StreamingSpec, LogCheckpointSpec, ColumnMappingSpec) pin each
  * feature in isolation; this one hunts for INTERACTION bugs no
  * hand-written scenario anticipates. Seeds are fixed, so a failure
  * reproduces. */
class SinkProtocolFuzzSpec extends SparkSpecBase {
  import spark.implicits._

  private def df(rows: Seq[(Long, String)], xName: String = "x") =
    rows.toDF("id", xName)

  /** Collect (id → x), tolerating the schemaless empty frame a
    * delete-everything history leaves behind. */
  private def state(d: org.apache.spark.sql.DataFrame,
      xName: String = "x"): Map[Long, String] =
    if (!d.columns.contains("id")) Map.empty
    else d.select("id", xName).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  /** The widened numeric column's state: (id → n) for rows carrying a
    * non-null n, longValue-normalized so the same map compares across
    * the int and long phases of the column's life. */
  private def nState(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    if (!d.columns.contains("n")) Map.empty
    else d.filter(col("n").isNotNull).select("id", "n").collect()
      .map(r => r.getLong(0) -> r.get(1).asInstanceOf[Number].longValue).toMap

  /** The evolved column's state: (id → y) for rows carrying a non-null
    * y. Rows written before the evolution, and whole-row upserts that
    * omit y, read back null — the model tracks exactly that. */
  private def yState(d: org.apache.spark.sql.DataFrame): Map[Long, String] =
    if (!d.columns.contains("y")) Map.empty
    else d.filter(col("y").isNotNull).select("id", "y").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  // the forceCloneAt variants FORCE the clone fork at that step — the
  // arm is otherwise probabilistic and a no-fork run would leave the
  // clone × {merge, DV, restore, evolution, rename, retention} product
  // untested for that seed. cleanBeforeClone additionally runs
  // cleanupLog(0) immediately before the forced fork, so the clone
  // copies a CLEANED log — its early history exists only through the
  // rewritten checkpoint entries (the r12 verdict's highest-value
  // untested product: clone-of-a-cleaned-log).
  // EVERY fixed seed runs over BOTH commit-store backends (r17): the
  // POSIX hard-link store and the emulated object-store conditional-put
  // store — proving the protocol depends only on the CommitStore
  // contract (put-if-absent + put + list + read-after-write), the one
  // property an s3/gcs/adls deployment must supply. Exploratory env
  // seeds run posix-only (local bug-hunting).
  // rivalAt (round 18): at that step a rival PURE APPEND lands inside a
  // snapshot/MOR verb's staged→claim window (the txnStagedHook seam) —
  // the WriteSerializable rebase path under the whole interaction
  // product. Seed 7 runs the CoW-merge rebase early; seed 23 the MOR
  // rebase late (post-evolution history); seed 12 rebases AFTER the
  // mid-run backfill, so the re-rendered entry re-allocates row ids
  // against the rival-advanced watermark; seed 91 rebases on the CLONE
  // of a cleaned log (foreign absolute-path files under snapshotBase).
  for { (seed, forceCloneAt, cleanBeforeClone, forceBackfillAt, rivalAt, storeKind) <- (Seq(
      (7L, -1, false, -1, 9), (23L, -1, false, -1, 18),
      (101L, -1, false, -1, -1),
      (55L, 8, false, -1, -1),
      // two more sequence draws: one plain, one forking LATE (step 20 of 32)
      // so the clone inherits a long history — incl. whatever renames,
      // drops and full-clause merges the run accumulated — and the
      // post-fork verbs run against mostly-foreign files
      (13L, -1, false, -1, -1), (42L, 20, false, -1, -1),
      // checkpoint-seeded clone: retention truncates the source log
      // mid-history, THEN the fork copies it — every pre-anchor version
      // the clone serves resolves through checkpoint body entries whose
      // dirs cloneTo made absolute
      (91L, 16, true, -1, 20),
      // same product, LATE fork (step 28 of 32): the cleaned log carries
      // a long accumulated history (renames/drops/full-clause merges),
      // so most of what the clone serves is checkpoint-rewritten, and
      // only a handful of verbs run post-fork
      (67L, 28, true, -1, -1),
      // round 16, mid-run BACKFILL seeds (≡ 0 mod 4; the arm is forced
      // at a fixed step so coverage never depends on the draw): seed 12
      // adopts tracking early and runs 26 more verbs tracked; seed 28
      // forks a clone at step 14 (multipart log — 28 % 3 == 1) and then
      // backfills THE CLONE at step 22, so id assignment runs over
      // foreign absolute-path files and every later verb (incl. restore
      // to pre-enablement versions) exercises the boundary carry
      (12L, -1, false, 6, 11), (28L, 14, false, 22, -1))
        .flatMap { case (sd, fc, cb, fb, ra) =>
          Seq(("posix", sd), ("cput", sd)).map { case (k, _) =>
            (sd, fc, cb, fb, ra, k) } } ++
      // exploratory sweep hook: GRAFT_FUZZ_SEEDS=3,5,8 runs extra seeds
      // with no forced arms — local bug-hunting only, CI runs the fixed
      // list above (a found bug graduates to a forced-arm seed + a
      // minimal regression in the owning spec)
      sys.env.get("GRAFT_FUZZ_SEEDS").toSeq.flatMap(_.split(','))
        .filter(_.nonEmpty).map(_.trim.toLong)
        // an env seed colliding with a fixed seed would register a
        // duplicate test name and ABORT the whole suite (0 tests run)
        .filterNot(Set(7L, 23L, 101L, 55L, 13L, 42L, 91L, 67L, 12L, 28L))
        // GRAFT_FUZZ_STORE=cput sweeps the object-store emulation;
        // exploratory seeds land the rival-append rebase mid-run too
        .map(sd => (sd, -1, false, -1, 10 + (sd % 15).toInt,
          sys.env.getOrElse("GRAFT_FUZZ_STORE", "posix"))))
  }
    test(s"protocol fuzz seed=$seed store=$storeKind" +
        (if (forceCloneAt > 0) s" (clone forked at step $forceCloneAt" +
          (if (cleanBeforeClone) ", log cleaned first" else "") + ")"
         else "") +
        ": reads, time travel and retention match the model") {
      val storeF = graft.streaming.CommitStore.forName(storeKind)
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-fuzz-$seed").toString
      val interval = 3
      // MULTIPART CHECKPOINTS ride half the seeds (partBytes = 1 forces
      // one sidecar per entry — the maximal split), so sidecar-served
      // snapshot seeding runs under the full verb product: DV deletes,
      // renames/drops, restore, retention truncation (91/67 clean the
      // log BEFORE the clone forks, so the clone serves early history
      // from rewritten sidecars alone), and the cold-reader replay
      val partBytes = if (seed % 3 == 1) 1L else 8L << 20
      var sink = new ExactlyOnceSink(dir, checkpointInterval = interval,
        checkpointPartBytes = partBytes, storeFactory = storeF)
      // ROW TRACKING rides most seeds (one stays untracked as the
      // control): after EVERY verb the differential check asserts id
      // uniqueness, id stability for every surviving business key
      // (through CoW/MOR merges, DV tiers incl. cap-forced rewrites,
      // compaction, restore, rename/drop, clone forks, cleanupLog),
      // and watermark monotonicity — the interaction surface no
      // hand-written scenario enumerates. Odd seeds enable at birth;
      // seeds ≡ 0 (mod 4) adopt tracking MID-RUN via the metadata-only
      // BACKFILL (arm 23), so every later verb — including restore to
      // a PRE-enablement version — runs against backfilled ids; seeds
      // ≡ 2 (mod 4) stay untracked as the control.
      var tracked = seed % 2 == 1
      val backfillable = !tracked && seed % 4 == 0
      if (tracked) sink.enableRowTracking(spark)
      var rowIds = Map.empty[Long, Long] // business key -> _row_id
      var wmLast = 0L
      var curDir = dir // the table the verbs currently target
      // set once by the clone arm: (source dir, its frozen model state)
      var clonedFrom: Option[(String, Map[Long, String], Map[Long, String],
        Map[Long, Long], Option[Boolean], String)] = None

      var live = Map.empty[Long, String] // the model's committed state
      var doms = Map.empty[String, Map[String, String]] // domain metadata
      var ys = Map.empty[Long, String] // evolved column (empty before arm 13)
      var ns = Map.empty[Long, Long] // widened column (empty before arm 19)
      // n's lifecycle: None = not in the schema; Some(false) = int;
      // Some(true) = widened to long. A RESTORE rolls both back with
      // the snapshot, and the WIDTH a read presents must track this.
      var nsType: Option[Boolean] = None
      // (version, x-state, y-state, n-state, n-type) after each commit
      var history = Vector.empty[(Long, Map[Long, String],
        Map[Long, String], Map[Long, Long], Option[Boolean])]
      var nextId = 0L
      var anchor = 0L // versions below this are outside retained history
      // current LOGICAL name of the x column (arm 14 renames it once;
      // reads at EVERY version present the current mapping, so the
      // model needs no per-version name history)
      var xName = "x"
      // arm 16 drops the evolved column once: reads at EVERY version
      // present the current schema, so the drop collapses y
      // expectations for ALL history (past included) and evolution
      // stops (the dead physical name is reserved for good)
      var droppedY = false

      def freshRows(n: Int): Seq[(Long, String)] =
        (0 until n).map { _ => nextId += 1; (nextId, s"s$seed-v$nextId") }

      def checkRead(): Unit = {
        val d = sink.read(spark)
        assert(state(d, xName) === live,
          s"live state diverged after ${history.size} commits")
        assert(yState(d) === ys,
          s"evolved-column state diverged after ${history.size} commits")
        assert(nState(d) === ns,
          s"widened-column state diverged after ${history.size} commits")
        // the WIDTH the read presents must track the model's lifecycle
        // (int before the widening commit, long after, rolled back by
        // RESTORE with the rest of the snapshot)
        nsType.foreach { wide =>
          if (d.columns.contains("n")) {
            val t = d.schema("n").dataType
            if (!wide)
              assert(t == org.apache.spark.sql.types.IntegerType,
                s"n presents long before the widening after ${history.size} commits")
            else if (ns.values.exists(_ > Int.MaxValue))
              // a surviving beyond-int value can only live in a wide-era
              // file, so the visible-file union MUST present long (a
              // down-coercion would also corrupt nState — double gate)
              assert(t == org.apache.spark.sql.types.LongType,
                s"n presents the wrong width after ${history.size} commits")
            else
              // documented presentation semantics: the width is the
              // union of the VISIBLE files' schemas, and MOR removes can
              // retire every wide-era file while only int-representable
              // values survive — int or long are both faithful here
              // (the recorded table schema stays monotone regardless;
              // found by sweep seed 8)
              assert(t == org.apache.spark.sql.types.IntegerType ||
                t == org.apache.spark.sql.types.LongType)
          }
        }
        // metadata-only COUNT(*) must equal the model after EVERY verb —
        // appends, CoW/MOR merges, DV deletes (remove/vector/rewrite
        // tiers), restore, compaction, retention, and post-clone verbs
        // over foreign files
        assert(sink.rowCount(spark) === live.size.toLong,
          s"metadata rowCount diverged after ${history.size} commits")
        // the newest version checksum must verify against a fresh fold
        // AND agree with the model — every verb writes one, so this
        // pins the .crc protocol under the whole interaction product
        sink.verifyChecksum().foreach { c =>
          c.numRows.foreach(n => assert(n === live.size.toLong,
            s"checksum numRows diverged after ${history.size} commits"))
        }
        assert(sink.activeDomains() === doms,
          s"domain metadata diverged after ${history.size} commits")
        // metadata MIN/MAX: only served when no tombstones exist — when
        // it answers, it must be exact
        sink.columnStats("id").foreach { case (lo, hi) =>
          assert(live.nonEmpty, "columnStats answered on an empty table")
          assert(lo.toDouble.toLong == live.keys.min &&
            hi.toDouble.toLong == live.keys.max,
            s"metadata columnStats ($lo,$hi) diverged from model " +
              s"(${live.keys.min},${live.keys.max})")
        }
        if (tracked) {
          val wi = sink.readWithRowIds(spark)
          val idNow: Map[Long, Long] =
            if (!wi.columns.contains("id")) Map.empty
            else wi.select(col("id"), col("_row_id")).collect()
              .map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(idNow.keySet === live.keySet,
            s"row-id read's key set diverged after ${history.size} commits")
          assert(idNow.values.toSeq.distinct.size == idNow.size,
            s"duplicate row ids after ${history.size} commits: $idNow")
          idNow.keySet.intersect(rowIds.keySet).foreach { k =>
            assert(idNow(k) == rowIds(k),
              s"row id of surviving key $k drifted " +
                s"(${rowIds(k)} -> ${idNow(k)}) after ${history.size} commits")
          }
          rowIds = idNow
          val w = sink.rowIdWatermark().getOrElse(0L)
          assert(w >= wmLast,
            s"row-id watermark regressed ($wmLast -> $w)")
          wmLast = w
        }
      }

      (1 to 32).foreach { step =>
        (if (step == forceCloneAt) 15
         else if (step == forceBackfillAt) 23
         else if (step == rivalAt) 24
         else rnd.nextInt(24)) match {
          case 24 => // CONFLICT NARROWING (round 18): a rival pure
            // append lands inside the verb's staged→claim window; under
            // WriteSerializable the verb must REBASE (zero recomputes,
            // counter-checked) and the rival's rows must stay visible.
            // Odd seeds run the CoW merge (snapshotBase path); even
            // seeds the MOR delete (delta-shaped path), falling back to
            // the merge when the table is empty.
            val rivalRows = freshRows(2)
            var rivalV = -1L
            val rivalSink = new ExactlyOnceSink(curDir,
              appId = s"fuzz-rival-$step", checkpointInterval = interval,
              checkpointPartBytes = partBytes, storeFactory = storeF)
            sink.txnStagedHook = () => {
              sink.txnStagedHook = () => () // fire once
              rivalV = rivalSink.commitAppend(df(rivalRows, xName))
            }
            val (rb0, rc0) = (sink.txnRebases.get(), sink.txnRecomputes.get())
            try {
              if (seed % 2 == 1 || live.isEmpty) {
                // CoW merge rebase: updates + inserts over the stale read
                val upd = rnd.shuffle(live.keys.toSeq).take(rnd.nextInt(3))
                  .map(k => (k, s"rb$step-$k"))
                val ins = freshRows(1)
                val rows = upd ++ ins
                val v = sink.merge(spark, df(rows, xName), Seq("id"))
                // the rival append is its own history point (its state =
                // pre-verb live + rival rows)
                history :+= ((rivalV, live ++ rivalRows, ys, ns, nsType))
                live = live ++ rivalRows ++ rows
                ys = ys -- rows.map(_._1)
                ns = ns -- rows.map(_._1)
                history :+= ((v, live, ys, ns, nsType))
              } else {
                // MOR delete rebase
                val cut = live.keys.toSeq(rnd.nextInt(live.size))
                val v = sink.deleteDV(spark, col("id") <= cut)
                history :+= ((rivalV, live ++ rivalRows, ys, ns, nsType))
                // rival ids are monotone-fresh, so the stale predicate
                // never matched them — they survive alongside the keeps
                live = live.filter(_._1 > cut) ++ rivalRows
                ys = ys.filter(_._1 > cut)
                ns = ns.filter(_._1 > cut)
                history :+= ((v, live, ys, ns, nsType))
              }
              assert(rivalV >= 0, "the rival append never fired")
              assert(sink.txnRebases.get() - rb0 >= 1,
                s"step $step: the rival append did not trigger a rebase")
              assert(sink.txnRecomputes.get() - rc0 === 0,
                s"step $step: a disjoint rival append forced a recompute")
            } finally sink.txnStagedHook = () => ()
          case 23 => // adopt row tracking mid-run: metadata-only backfill
            if (backfillable && !tracked) {
              val v = sink.enableRowTracking(spark, backfill = true)
              assert(v >= 0, "backfill enable on a fuzz table returned no version")
              tracked = true
              rowIds = Map.empty // ids exist from NOW; stability starts here
              wmLast = 0L
              history :+= ((v, live, ys, ns, nsType)) // physical-only: state unchanged
            }
          case 0 | 1 | 2 | 3 => // append fresh rows
            val rows = freshRows(1 + rnd.nextInt(3))
            val v = sink.commitAppend(df(rows, xName))
            live = live ++ rows
            history :+= ((v, live, ys, ns, nsType))
          case 4 | 5 => // merge: update some existing + insert some fresh
            val upd = rnd.shuffle(live.keys.toSeq).take(rnd.nextInt(3))
              .map(k => (k, s"upd$step-$k"))
            val ins = freshRows(rnd.nextInt(2))
            val rows = upd ++ ins
            if (rows.nonEmpty) {
              // alternate copy-on-write and merge-on-read upserts — the
              // model is identical, only the physical protocol differs
              val v = if (rnd.nextBoolean())
                sink.mergeDV(spark, df(rows, xName), Seq("id"))
              else sink.merge(spark, df(rows, xName), Seq("id"))
              live = live ++ rows
              ys = ys -- rows.map(_._1) // whole-row upsert omits y -> null
              ns = ns -- rows.map(_._1) // ... and n
              history :+= ((v, live, ys, ns, nsType))
            }
          case 6 => // delete a random id range
            if (live.nonEmpty) {
              val cut = live.keys.toSeq(rnd.nextInt(live.size))
              val v = sink.delete(spark, col("id") <= cut)
              live = live.filter(_._1 > cut)
              ys = ys.filter(_._1 > cut)
              ns = ns.filter(_._1 > cut)
              history :+= ((v, live, ys, ns, nsType))
            }
          case 10 => // merge-on-read delete of a random id range
            if (live.nonEmpty) {
              val cut = live.keys.toSeq(rnd.nextInt(live.size))
              val v = sink.deleteDV(spark, col("id") <= cut,
                // tiny cap occasionally forces the rewrite tier
                dvMaxRows = if (rnd.nextBoolean()) 1 else 100000)
              live = live.filter(_._1 > cut)
              ys = ys.filter(_._1 > cut)
              ns = ns.filter(_._1 > cut)
              history :+= ((v, live, ys, ns, nsType))
            }
          case 11 => // merge-on-read delete of specific ids
            if (live.nonEmpty) {
              val picks = rnd.shuffle(live.keys.toSeq).take(1 + rnd.nextInt(3))
              val v = sink.deleteDV(spark, col("id").isin(picks: _*))
              live = live -- picks
              ys = ys -- picks
              ns = ns -- picks
              history :+= ((v, live, ys, ns, nsType))
            }
          case 7 => // retention: reclaim below the newest checkpoint.
            // The anchor comes from the SINK's own truncation marker —
            // an estimate from history's last data version undercounts
            // when metadata-only commits (rename, domains) pushed a
            // checkpoint past it, and the restore/time-travel arms would
            // then pick reclaimed versions (found by sweep seed 3)
            sink.cleanupLog(minAgeMs = 0)
            anchor = math.max(anchor, sink.truncatedBelow())
          case 8 => // physical maintenance must never change any read:
            // vacuum, or incremental OPTIMIZE (tiny target forces real
            // packing of whatever small files exist)
            if (rnd.nextBoolean()) sink.vacuum(minAgeMs = 0)
            else {
              val v = sink.compactSmall(spark, targetBytes = 1L << 20)
              if (v >= 0) history :+= ((v, live, ys, ns, nsType)) // state unchanged
            }
          case 9 => // time travel to a random retained version
            history.filter(_._1 >= anchor) match {
              case h if h.nonEmpty =>
                val (v, expect, expectY, expectN, _) = h(rnd.nextInt(h.size))
                val past = sink.read(spark, versionAsOf = Some(v))
                assert(state(past, xName) === expect, s"time travel to $v diverged")
                assert(yState(past) === expectY,
                  s"time travel to $v diverged on the evolved column")
                assert(nState(past) === expectN,
                  s"time travel to $v diverged on the widened column")
              case _ => ()
            }
          case 12 => // RESTORE to a random retained non-empty version
            history.filter(h => h._1 >= anchor && h._2.nonEmpty) match {
              case h if h.nonEmpty =>
                val (v, expect, expectY, expectN, expectW) =
                  h(rnd.nextInt(h.size))
                try {
                  val rv = sink.restore(spark, v)
                  live = expect
                  ys = expectY
                  ns = expectN // n rolls back with the snapshot —
                  nsType = expectW // width included (TypeWideningSpec)
                  history :+= ((rv, live, ys, ns, nsType))
                } catch {
                  // a backfill-tracked table REFUSES restores to
                  // versions lifting files that never got id blocks
                  // (retired before enablement — fresh ids would break
                  // stability, fuzz seed 20); the arm becomes a no-op
                  case e: RuntimeException if tracked &&
                      Option(e.getMessage)
                        .exists(_.contains("row-id stability")) => ()
                }
              case _ => ()
            }
          case 13 => // schema evolution: append WIDENED rows (id, x, y).
            // After arm 16 dropped y, its physical name is tombstoned
            // for good (ColumnMappingSpec: re-adding the dead physical
            // is rejected as reserved), so evolution stops for the run.
            if (!droppedY) {
              val rows = freshRows(1 + rnd.nextInt(2))
              val wide = rows.map { case (i, s) => (i, s, s"y$i") }
                .toDF("id", xName, "y")
              val v = sink.commitAppend(wide, mergeSchema = true)
              live = live ++ rows
              ys = ys ++ rows.map { case (i, _) => i -> s"y$i" }
              history :+= ((v, live, ys, ns, nsType))
            }
          case 14 => // column mapping: rename x ONCE, mid-history —
            // every later verb must keep translating; reads at every
            // version present the renamed view
            if (xName == "x" && history.nonEmpty) {
              val v = sink.renameColumn("x", "x2")
              xName = "x2"
              history :+= ((v, live, ys, ns, nsType))
            }
          case 18 => // REPLACE WHERE: the atomic backfill verb — delete
            // everything at/above a sampled key and insert fresh rows
            // in ONE snapshot commit (ids are monotone, so every fresh
            // row satisfies the predicate and the per-row guard holds)
            if (live.nonEmpty) {
              val lo = live.keys.toSeq(rnd.nextInt(live.size))
              val rows = freshRows(1 + rnd.nextInt(2))
              val v = sink.replaceWhere(spark, col("id") >= lo,
                df(rows, xName))
              live = live.filter(_._1 < lo) ++ rows
              ys = ys.filter(_._1 < lo)
              ns = ns.filter(_._1 < lo)
              history :+= ((v, live, ys, ns, nsType))
            }
          case 17 => // FULL-CLAUSE MERGE: one matched key DELETED (its
            // source row consumed, not inserted), one absent key retired
            // by the not-matched-by-source clause, the rest whole-row
            // updated + fresh inserts — all four clause outcomes under
            // the whole interaction product (evolution, rename, clone,
            // retention, CDC replay)
            if (live.nonEmpty) {
              val ks = rnd.shuffle(live.keys.toSeq)
              val delK = ks.headOption.toSeq
              val updK = ks.drop(1).take(rnd.nextInt(2))
              val syncK = ks.drop(1 + updK.size).headOption.toSeq
              val ins = freshRows(rnd.nextInt(2))
              val updates = (delK ++ updK).map(k => (k, s"mf$step-$k")) ++ ins
              val v = sink.mergeFull(spark, df(updates, xName), Seq("id"),
                matchedDelete = delK.headOption.map(k => col("id") === k),
                notMatchedBySourceDelete =
                  syncK.headOption.map(k => col("id") === k))
              live = (live -- delK -- syncK) ++
                updK.map(k => (k, s"mf$step-$k")) ++ ins
              ys = ys -- delK -- syncK -- updK -- ins.map(_._1)
              ns = ns -- delK -- syncK -- updK -- ins.map(_._1)
              history :+= ((v, live, ys, ns, nsType))
            }
          case 16 => // DROP COLUMN: drop the evolved column once,
            // mid-history — reads at EVERY version present the current
            // schema, so y expectations collapse to empty across ALL
            // history (time travel and restore targets included), and
            // the dead physical stays tombstoned for the rest of the
            // run (arm 13 stops evolving). Exercises drop x {merge, DV
            // delete, restore-across-drop, time travel, CDC replay,
            // clone} interactions.
            if (!droppedY && ys.nonEmpty) {
              val v = sink.dropColumn("y")
              droppedY = true
              ys = Map.empty
              history = history.map { case (hv, hx, _, hn, hw) =>
                (hv, hx, Map.empty[Long, String], hn, hw)
              }
              history :+= ((v, live, ys, ns, nsType))
            }
          case 19 | 20 => // TYPE WIDENING (the r13 feature under the
            // full verb product): n enters the schema as INT via
            // evolution, one later hit WIDENS it to long under
            // mergeSchema (mixed-width files stay live), and every hit
            // after that writes a NARROW int frame into the widened
            // table (the upcast-at-write path — no new narrow files).
            // DV deletes, merges, replaceWhere, compaction, restore,
            // rename, clone, retention and the CDC fold then all run
            // over the mixed-width file set; restore rolls the WIDTH
            // back with the snapshot and the model tracks it.
            nsType match {
              case None => // introduce n: int, schema evolution
                val rows = freshRows(1 + rnd.nextInt(2))
                val wide = rows.map { case (i, s) => (i, s, i.toInt * 10) }
                  .toDF("id", xName, "n")
                val v = sink.commitAppend(wide, mergeSchema = true)
                live = live ++ rows
                ns = ns ++ rows.map { case (i, _) => i -> (i * 10L) }
                nsType = Some(false)
                history :+= ((v, live, ys, ns, nsType))
              case Some(false) => // widen int -> long (beyond-int value)
                val rows = freshRows(1)
                val wide = rows.map { case (i, s) => (i, s, (1L << 33) + i) }
                  .toDF("id", xName, "n")
                val v = sink.commitAppend(wide, mergeSchema = true)
                live = live ++ rows
                ns = ns ++ rows.map { case (i, _) => i -> ((1L << 33) + i) }
                nsType = Some(true)
                history :+= ((v, live, ys, ns, nsType))
              case Some(true) => // narrow int frame into the widened table
                val rows = freshRows(1)
                val wide = rows.map { case (i, s) => (i, s, i.toInt) }
                  .toDF("id", xName, "n")
                val v = sink.commitAppend(wide, mergeSchema = true)
                live = live ++ rows
                ns = ns ++ rows.map { case (i, _) => i -> i }
                history :+= ((v, live, ys, ns, nsType))
            }
          case 21 => // DOMAIN METADATA set/update (the round-15 action):
            // per-domain latest-wins delta under the whole product —
            // checkpoint aux survival, retention, clone carry
            val d = s"dom${rnd.nextInt(3)}"
            val cfg = Map("v" -> s"s$step")
            sink.setDomainMetadata(d, cfg)
            doms = doms.updated(d, cfg)
          case 22 => // DOMAIN METADATA remove (tombstone delta)
            if (doms.nonEmpty) {
              val d = doms.keys.toSeq(rnd.nextInt(doms.size))
              sink.removeDomainMetadata(d)
              doms = doms - d
            }
          case 15 => // SHALLOW CLONE once, mid-history: fork the table
            // and run EVERY remaining verb against the clone — merges,
            // DV deletes, restores, evolution, renames, retention and
            // maintenance all operate over foreign (source-rooted)
            // files; the source must stay byte-frozen (checked at the
            // end). Model state carries over unchanged: a clone IS the
            // source's state at clone time.
            if (clonedFrom.isEmpty && history.nonEmpty) {
              if (cleanBeforeClone && step == forceCloneAt) {
                // truncate the source log first: the clone must serve its
                // early history from rewritten checkpoint entries alone
                sink.cleanupLog(minAgeMs = 0)
                anchor = math.max(anchor, sink.truncatedBelow())
              }
              val cloneDir =
                Files.createTempDirectory(s"graft-fuzz-$seed-clone").toString
              // createTempDirectory pre-creates the dir; cloneTo only
              // rejects an existing LOG, so this is fine
              sink.cloneTo(cloneDir)
              clonedFrom = Some((dir, live, ys, ns, nsType, xName))
              curDir = cloneDir
              sink = new ExactlyOnceSink(cloneDir,
                checkpointInterval = interval,
                checkpointPartBytes = partBytes, storeFactory = storeF)
            }
        }
        checkRead()
      }

      // CDC soundness across the whole verb product: take the EARLIEST
      // retained state-changing version as the base snapshot and fold
      // the change feed (base, latest] over it — within each batch
      // deletes apply first (a RESTORE batch is a multiset diff, so an
      // updated id carries a delete of the old row AND an insert of the
      // new one in the SAME version), then inserts/update-postimages
      // upsert; preimages are ignored. The fold must land exactly on
      // the model's final state across merges (CoW and MOR), DV deletes
      // at every tier, restore diffs, schema evolution, renames (the
      // feed presents the CURRENT logical mapping regardless of which
      // side of the rename a change dir was staged on), retention, and
      // the clone fork (pre-fork change dirs resolve through cloneTo's
      // rewritten absolute paths).
      history.filter(_._1 >= anchor).headOption.foreach { case (v0, s0, y0, n0, _) =>
        val feed = sink.readChanges(spark, fromVersion = v0)
        var fx = s0
        var fy = y0
        var fn = n0
        if (feed.columns.contains("_change_type")) {
          val hasY = feed.columns.contains("y")
          val hasN = feed.columns.contains("n")
          val rows = feed.select(col("batch").cast("long"),
              col("_change_type"), col("id"), col(xName),
              (if (hasY) col("y") else lit(null).cast("string")).as("y"),
              // cast flattens the int/long mix the widened column's
              // pre- and post-widening change dirs present
              (if (hasN) col("n").cast("long")
               else lit(null).cast("long")).as("n"))
            .collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
              r.getString(3), if (r.isNullAt(4)) null else r.getString(4),
              if (r.isNullAt(5)) None else Some(r.getLong(5))))
          rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, batch) =>
            batch.filter(_._2 == "delete").foreach { case (_, _, id, _, _, _) =>
              fx -= id; fy -= id; fn -= id
            }
            batch.filter(c => c._2 == "insert" || c._2 == "update_postimage")
              .foreach { case (_, _, id, x, y, nOpt) =>
                fx += (id -> x)
                if (y == null) fy -= id else fy += (id -> y)
                nOpt match {
                  case None => fn -= id
                  case Some(nv) => fn += (id -> nv)
                }
              }
          }
        }
        assert(fx === live,
          s"CDC replay from v$v0 diverged from the model on x")
        assert(fy === ys,
          s"CDC replay from v$v0 diverged from the model on the evolved column")
        assert(fn === ns,
          s"CDC replay from v$v0 diverged from the model on the widened column")

        // CDC FILE PRUNING differential (round 17): a pruned selective
        // feed, post-filtered by its own predicate, must equal the
        // unpruned feed's slice — over whatever change-dir shapes
        // (pre-stats entries, restores, MOR, clone-rewritten absolute
        // dirs) this seed's history produced. Pruning is file-level
        // and conservative; this is the soundness half.
        if (feed.columns.contains("_change_type")) {
          val lo = 2.0 + (seed % 5).toDouble
          val hi = lo + 6.0
          val pruned = sink.readChanges(spark, fromVersion = v0,
            pruneBy = Seq(("id", lo, hi)))
          def slice(d: org.apache.spark.sql.DataFrame): Set[(Long, String, String)] =
            if (!d.columns.contains("id")) Set.empty
            else d.filter(col("id").between(lo, hi))
              .select(col("id"), col("_change_type"), col(xName))
              .collect()
              .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
              .toSet
          assert(slice(pruned) === slice(feed),
            s"pruned CDC feed [$lo,$hi] from v$v0 lost or invented changes")
        }
      }

      // if the run forked onto a clone, the SOURCE must read exactly its
      // frozen at-clone state — no later verb may have leaked across
      clonedFrom.foreach { case (srcDir, frozen, frozenY, frozenN, _, frozenX) =>
        val src = new ExactlyOnceSink(srcDir, storeFactory = storeF)
        val d = src.read(spark)
        assert(state(d, frozenX) === frozen,
          "source table diverged after the clone forked")
        assert(yState(d) === frozenY,
          "source evolved-column state diverged after the clone forked")
        assert(nState(d) === frozenN,
          "source widened-column state diverged after the clone forked")
      }

      // a cold reader (fresh instance, checkpoint-seeded) sees the same
      // final state, and time travel below retention fails loudly
      val cold = new ExactlyOnceSink(curDir,
        checkpointPartBytes = partBytes, storeFactory = storeF)
      assert(state(cold.read(spark), xName) === live,
        "cold replay diverged from the model")
      if (anchor > 0)
        history.filter(_._1 < anchor).lastOption.foreach { case (v, _, _, _, _) =>
          val e = intercept[RuntimeException](
            cold.read(spark, versionAsOf = Some(v)))
          assert(e.getMessage.contains("retained history"))
        }
    }
}
