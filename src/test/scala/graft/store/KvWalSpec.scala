package graft.store

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ranges.{Bound, ScanRange}

/** Opt-in WAL durability: a restart (in-memory wipe + [[KvStore.replayWal]])
  * must reconstruct exactly the acknowledged state — cells, versions,
  * deletes, drops, AND the per-region bookkeeping (`rowCount`, `maxStamp`)
  * that statistics and streaming-source offsets are served from. A torn
  * record at the log tail (crash mid-append) must be discarded, not crash
  * replay. Default path is untouched: no other spec enables the WAL. */
class KvWalSpec extends AnyFunSuite {

  private def key(i: Int): Array[Byte] = f"row$i%04d".getBytes("UTF-8")
  private def cell(qual: String, ts: Long, v: String) =
    KvCell("f", qual, ts, v.getBytes("UTF-8"))
  private val all = ScanRange[Array[Byte]](Bound(None, inclusive = false),
    Bound(None, inclusive = false))

  private def snapshot(t: KvTable): Seq[(String, Seq[(String, String, Long, String)])] =
    t.regions.indices.flatMap(r =>
      t.scan(r, all, ColumnSet.All, None, versions = Int.MaxValue, None).map(row =>
        new String(row.key, "UTF-8") ->
          row.cells.map(c => (c.cf, c.qual, c.ts, new String(c.value, "UTF-8")))
            .sorted))

  test("restart replay reconstructs cells, deletes, drops, and region bookkeeping") {
    val dir = Files.createTempDirectory("graft-wal")
    KvStore.enableWal(dir)
    try {
      val t = KvStore.createTable("wal:t1", Seq("row0300", "row0600").map(_.getBytes("UTF-8")),
        maxVersions = 2, dropExisting = true, maxVersionsByCf = Map("f" -> 2))
      (0 until 900).foreach(i => t.put(key(i), Seq(cell("q", 100L, s"a$i"))))
      // second generation: version stacking + a partial-column update
      (0 until 900 by 5).foreach(i =>
        t.put(key(i), Seq(cell("q", 200L, s"b$i"), cell("q2", 200L, "x"))))
      // ranged delete with a key-range restriction (logged as exact keys)
      val deleted = t.delete(Seq(ScanRange[Array[Byte]](
        Bound(Some(key(100)), inclusive = true),
        Bound(Some(key(150)), inclusive = false))), None)
      assert(deleted == 50)
      // a second table that is dropped: replay must NOT resurrect it
      val t2 = KvStore.createTable("wal:gone", Seq.empty, dropExisting = true)
      t2.put(key(1), Seq(cell("q", 1L, "z")))
      KvStore.drop("wal:gone")
      // a third table renamed, with writes logged under BOTH names
      val t3 = KvStore.createTable("wal:old", Seq.empty, dropExisting = true)
      t3.put(key(1), Seq(cell("q", 5L, "pre")))
      KvStore.rename("wal:old", "wal:new")
      t3.put(key(2), Seq(cell("q", 6L, "post")))

      val before = snapshot(t)
      val countsBefore = t.regions.map(_.rowCount.get())
      val stampsBefore = t.regions.map(_.maxStamp.get())
      def hist(table: KvTable): Seq[Map[Long, Long]] = {
        import scala.jdk.CollectionConverters._
        table.regions.map(_.mutHist.asScala.map {
          case (s, n) => (s.longValue(), n.sum()) }.toMap)
      }
      val histBefore = hist(t)
      assert(countsBefore.sum == 850)

      // "restart": wipe memory (bypassing the logged dropAll on purpose —
      // a crash logs nothing), then replay the log
      KvStore.disableWal()
      val replayed = {
        KvStore.replayWal(dir)
        KvStore.table("wal:t1")
      }
      assert(!KvStore.exists("wal:gone"), "dropped table must stay dropped")
      assert(!KvStore.exists("wal:old") && KvStore.exists("wal:new"),
        "rename must replay as a move, not a copy")
      assert(snapshot(KvStore.table("wal:new")) == Seq(
        "row0001" -> Seq(("f", "q", 5L, "pre")),
        "row0002" -> Seq(("f", "q", 6L, "post"))),
        "writes logged before AND after the rename must both land")
      assert(snapshot(replayed) == before)
      assert(replayed.regions.map(_.rowCount.get()) == countsBefore,
        "statistics row counters must survive the restart")
      assert(replayed.regions.map(_.maxStamp.get()) == stampsBefore,
        "streaming-source offsets (maxStamp) must survive the restart")
      assert(hist(replayed) == histBefore,
        "admission-control stamp histograms must survive the restart")
      assert(replayed.maxVersions == 2 && replayed.versionCap("f") == 2)
      // CDC delete markers survive too: a post-restart tombstone stream
      // still sees the deletion window
      val marks = replayed.regions.indices.flatMap(r => replayed.tombstonesIn(
        r, all, TimeRange(Long.MinValue, Long.MaxValue))).toSeq
      assert(marks.size == 50 && marks.forall(_._2 == stampsBefore.max),
        s"expected 50 delete markers at the delete stamp, got ${marks.take(3)}")
    } finally {
      KvStore.disableWal()
      KvStore.drop("wal:t1")
      KvStore.drop("wal:new")
      KvStore.drop("wal:old")
    }
  }

  test("checkpoint: snapshot + log rotation replays snapshot+tail to identical state") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-wal-ckpt")
    KvStore.enableWal(dir)
    try {
      val t = KvStore.createTable("wal:ck", Seq("row0300", "row0600").map(_.getBytes("UTF-8")),
        maxVersions = 2, dropExisting = true, maxVersionsByCf = Map("f" -> 2))
      (0 until 900).foreach(i => t.put(key(i), Seq(cell("q", 100L, s"a$i"))))
      (0 until 900 by 4).foreach(i =>
        t.put(key(i), Seq(cell("q", 200L, s"b$i"), cell("q2", 200L, "x"))))
      assert(t.delete(Seq(ScanRange[Array[Byte]](
        Bound(Some(key(50)), inclusive = true),
        Bound(Some(key(80)), inclusive = false))), None, stamp = 300L) == 30)
      val logBefore = Files.size(dir.resolve(Wal.FileName))

      // CHECKPOINT: the image absorbs the history; the log starts over
      KvStore.checkpointWal()
      val logAfter = Files.size(dir.resolve(Wal.FileName))
      assert(Files.exists(dir.resolve(Snapshot.FileName)))
      // the rotated log holds only the 9-byte generation marker
      assert(logAfter < 20L && logBefore > 10000L,
        s"rotation must truncate the log ($logBefore -> $logAfter bytes)")

      // TAIL: mutations after the checkpoint land in the fresh log only
      (900 until 950).foreach(i => t.put(key(i), Seq(cell("q", 400L, s"c$i"))))
      assert(t.delete(Seq(ScanRange[Array[Byte]](
        Bound(Some(key(0)), inclusive = true),
        Bound(Some(key(10)), inclusive = false))), None, stamp = 500L) == 10)
      val tailSize = Files.size(dir.resolve(Wal.FileName))
      assert(tailSize > 0L && tailSize < logBefore / 4,
        s"the tail must be tail-sized, not history-sized ($tailSize vs $logBefore)")

      val before = snapshot(t)
      val countsBefore = t.regions.map(_.rowCount.get())
      val stampsBefore = t.regions.map(_.maxStamp.get())
      val histBefore = t.regions.map(_.mutHist.asScala.map {
        case (s, n) => (s.longValue(), n.sum()) }.toMap)
      val marksBefore = t.regions.indices.flatMap(r => t.tombstonesIn(
        r, all, TimeRange(Long.MinValue, Long.MaxValue))).toSeq
        .map { case (k, s) => (new String(k, "UTF-8"), s) }.sorted

      // "restart": wipe memory, replay snapshot + tail
      KvStore.disableWal()
      KvStore.replayWal(dir)
      val replayed = KvStore.table("wal:ck")
      assert(snapshot(replayed) == before)
      assert(replayed.regions.map(_.rowCount.get()) == countsBefore,
        "row counters must survive a snapshot+tail restart")
      assert(replayed.regions.map(_.maxStamp.get()) == stampsBefore,
        "streaming offsets (maxStamp) must survive a snapshot+tail restart")
      assert(replayed.regions.map(_.mutHist.asScala.map {
        case (s, n) => (s.longValue(), n.sum()) }.toMap) == histBefore,
        "admission histograms must survive a snapshot+tail restart")
      assert(replayed.regions.indices.flatMap(r => replayed.tombstonesIn(
        r, all, TimeRange(Long.MinValue, Long.MaxValue))).toSeq
        .map { case (k, s) => (new String(k, "UTF-8"), s) }.sorted == marksBefore,
        "delete markers (pre- and post-checkpoint) must survive the restart")
      assert(replayed.maxVersions == 2 && replayed.versionCap("f") == 2)

      // replay is repeatable and the log keeps accumulating tail records
      // across a restart: re-open, append, wipe, replay again
      KvStore.enableWal(dir)
      KvStore.table("wal:ck").put(key(999), Seq(cell("q", 600L, "tail2")))
      val fullState = snapshot(KvStore.table("wal:ck"))
      KvStore.disableWal()
      KvStore.replayWal(dir) // snapshot + (tail with both generations)
      assert(snapshot(KvStore.table("wal:ck")) == fullState)
    } finally {
      KvStore.disableWal()
      KvStore.drop("wal:ck")
    }
  }

  test("checkpoint crash window: a stale full log is skipped, not double-applied") {
    import scala.jdk.CollectionConverters._
    // simulate a crash BETWEEN the snapshot rename and the log truncate:
    // the new snapshot coexists with the old FULL log. Replaying that log
    // over the image would double-count the admission histograms (puts
    // tick mutHist unconditionally) — the generation pairing must skip it.
    val dir = Files.createTempDirectory("graft-wal-crash")
    KvStore.enableWal(dir)
    try {
      val t = KvStore.createTable("wal:cw", Seq.empty, dropExisting = true)
      (0 until 200).foreach(i => t.put(key(i), Seq(cell("q", 100L, s"a$i"))))
      val stale = dir.resolve("stale-log-copy")
      Files.copy(dir.resolve(Wal.FileName), stale)
      KvStore.checkpointWal()
      val hist = t.regions.map(_.mutHist.asScala.map {
        case (s, n) => (s.longValue(), n.sum()) }.toMap)
      val state = snapshot(t)
      // crash simulation: the pre-rotation log "survives" the truncate
      KvStore.disableWal()
      Files.copy(stale, dir.resolve(Wal.FileName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      KvStore.replayWal(dir)
      val replayed = KvStore.table("wal:cw")
      assert(snapshot(replayed) == state)
      assert(replayed.regions.map(_.mutHist.asScala.map {
        case (s, n) => (s.longValue(), n.sum()) }.toMap) == hist,
        "a stale log replayed over the snapshot must not double-count " +
          "the admission histograms")
      assert(replayed.regions.map(_.rowCount.get()) ==
        t.regions.map(_.rowCount.get()))
    } finally {
      KvStore.disableWal()
      KvStore.drop("wal:cw")
    }
  }

  test("MVCC row-level deletes replay to the same converged state") {
    val dir = Files.createTempDirectory("graft-wal-mvcc")
    KvStore.enableWal(dir)
    try {
      // the delta-writer shape: stamped deleteRow@T + put@T+1, applied in
      // BOTH orders across keys — replay re-applies records in log order
      // and must converge identically (the MVCC erase-≤-stamp rule is what
      // makes log order irrelevant per key)
      val t = KvStore.createTable("wal:mvcc", Seq.empty, maxVersions = 2,
        dropExisting = true)
      t.put(key(1), Seq(cell("q", 100L, "old1")))
      t.put(key(2), Seq(cell("q", 100L, "old2")))
      t.deleteRow(key(1), stamp = 200L)          // delete-then-put
      t.put(key(1), Seq(cell("q", 201L, "new1")))
      t.put(key(2), Seq(cell("q", 201L, "new2"))) // put-then-delete
      t.deleteRow(key(2), stamp = 200L)
      t.deleteRow(key(3), stamp = 200L)          // delete of an absent row
      val before = snapshot(t)
      assert(before == Seq(
        "row0001" -> Seq(("f", "q", 201L, "new1")),
        "row0002" -> Seq(("f", "q", 201L, "new2"))))

      KvStore.disableWal()
      KvStore.replayWal(dir)
      val replayed = KvStore.table("wal:mvcc")
      assert(snapshot(replayed) == before)
      assert(replayed.regions.map(_.rowCount.get()).sum == 2L)
    } finally {
      KvStore.disableWal()
      KvStore.drop("wal:mvcc")
    }
  }

  test("secondary-index mutations replay from their own records; hooks stay quiet") {
    val dir = Files.createTempDirectory("graft-wal-idx")
    KvStore.enableWal(dir)
    try {
      // connector-level shape: main table with an attached index hook — the
      // hook's index-table mutations go through the ordinary logged put /
      // deleteRow, so replay restores the index from its OWN records while
      // hooks (attached to the pre-replay instances only) never re-fire
      val main = KvStore.createTable("wal:m", Seq.empty, dropExisting = true)
      val idx = KvStore.createTable("wal:m__idx__v", Seq.empty, dropExisting = true)
      main.attachHook("wal:m__idx__v",
        new graft.datasource.SecondaryIndex.IndexMaintainer("wal:m__idx__v", "f", "q"))
      main.put(key(1), Seq(cell("q", 10L, "alpha")))
      main.put(key(2), Seq(cell("q", 10L, "alpha")))
      main.put(key(1), Seq(cell("q", 20L, "beta"))) // retires (alpha, key1)
      main.delete(Seq(ScanRange.point(key(2))), None, stamp = 30L) // retires (alpha, key2)
      val mainBefore = snapshot(main)
      val idxBefore = snapshot(idx)
      assert(idxBefore.size == 1, s"only (beta, key1) must survive: $idxBefore")

      KvStore.replayWal(dir)
      assert(snapshot(KvStore.table("wal:m")) == mainBefore)
      assert(snapshot(KvStore.table("wal:m__idx__v")) == idxBefore,
        "replayed index-table records must reconstruct the index exactly " +
          "(no hook double-fire, no lost retirement)")
    } finally {
      KvStore.disableWal()
      KvStore.drop("wal:m"); KvStore.drop("wal:m__idx__v")
    }
  }

  test("torn tail is discarded; preceding records replay") {
    val dir = Files.createTempDirectory("graft-wal-torn")
    KvStore.enableWal(dir)
    try {
      val t = KvStore.createTable("wal:torn", Seq.empty, dropExisting = true)
      t.put(key(1), Seq(cell("q", 10L, "keep")))
      KvStore.disableWal() // flush + close
      // simulate a crash mid-append: a record tag + half a table name
      val log = dir.resolve("graft-wal.log")
      Files.write(log, Array[Byte](2, 0, 50, 'w', 'a'),
        java.nio.file.StandardOpenOption.APPEND)
      KvStore.replayWal(dir)
      val rt = KvStore.table("wal:torn")
      assert(snapshot(rt) == Seq("row0001" -> Seq(("f", "q", 10L, "keep"))))
    } finally {
      KvStore.disableWal()
      KvStore.drop("wal:torn")
    }
  }

  test("auto-checkpoint: sustained writes rotate the log themselves; restart replays snapshot + bounded tail") {
    val dir = Files.createTempDirectory("graft-wal-auto")
    KvStore.enableWal(dir)
    KvStore.setWalAutoCheckpoint(records = 100, bytes = 0)
    try {
      val t = KvStore.createTable("wal:auto", Seq.empty, dropExisting = true)
      (0 until 1000).foreach(i => t.put(key(i), Seq(cell("q", 100L + i, s"v$i"))))
      // ~1000 records at a 100-record gate: rotation fired ~10 times with
      // NO application checkpoint call — generation is the witness
      val gen = Snapshot.generationOf(dir)
      assert(gen >= 8, s"sustained writes must auto-rotate (generation $gen)")
      // recovery cost is bounded by the CADENCE, not the history: the live
      // log holds at most ~one gate's worth of records
      val tail = Files.size(dir.resolve(Wal.FileName))
      assert(tail < 110L * 40, s"tail must be gate-sized, got $tail bytes")
      val before = snapshot(t)
      KvStore.disableWal()
      KvStore.replayWal(dir) // snapshot + bounded tail
      assert(snapshot(KvStore.table("wal:auto")) == before)
    } finally {
      KvStore.setWalAutoCheckpoint(
        KvStore.DefaultAutoCheckpointRecords, KvStore.DefaultAutoCheckpointBytes)
      KvStore.disableWal()
      KvStore.drop("wal:auto")
    }
  }

  test("auto-checkpoint byte gate: log size alone triggers rotation") {
    val dir = Files.createTempDirectory("graft-wal-autob")
    KvStore.enableWal(dir)
    KvStore.setWalAutoCheckpoint(records = 0, bytes = 4096)
    try {
      val t = KvStore.createTable("wal:autob", Seq.empty, dropExisting = true)
      val fat = "x" * 200
      val rotBefore = KvStore.walRotations
      val rotNsBefore = KvStore.walRotationNanos
      (0 until 200).foreach(i => t.put(key(i), Seq(cell("q", 100L + i, fat))))
      assert(Snapshot.generationOf(dir) >= 2,
        "crossing the byte gate repeatedly must rotate repeatedly")
      // rotation observability: the counters a CDC operator tunes
      // setWalAutoCheckpoint against must record each firing and its wall
      val rotations = KvStore.walRotations - rotBefore
      assert(rotations >= 2, s"rotation counter must track firings, got $rotations")
      assert(KvStore.walRotationNanos - rotNsBefore > 0L,
        "rotation latency must accumulate")
      assert(Files.size(dir.resolve(Wal.FileName)) < 4096L + 300L,
        "live log must stay near the byte gate")
      val before = snapshot(t)
      KvStore.disableWal()
      KvStore.replayWal(dir)
      assert(snapshot(KvStore.table("wal:autob")) == before)
    } finally {
      KvStore.setWalAutoCheckpoint(
        KvStore.DefaultAutoCheckpointRecords, KvStore.DefaultAutoCheckpointBytes)
      KvStore.disableWal()
      KvStore.drop("wal:autob")
    }
  }

  test("auto-checkpoint under concurrent writers: the rotation fence loses no acknowledged write") {
    // 8 writers × 250 puts racing ~20 auto-rotations: the rotation fence
    // (KvStore.logged read side vs checkpointWal's write side) must place
    // every mutation wholly in the image or wholly in the fresh log —
    // replay losing even one row means a record landed in a truncated
    // log's past. This was UNSAFE before the fence (manual checkpoints
    // required caller quiesce); automatic rotation makes it load-bearing.
    val dir = Files.createTempDirectory("graft-wal-autoc")
    KvStore.enableWal(dir)
    KvStore.setWalAutoCheckpoint(records = 100, bytes = 0)
    try {
      val t = KvStore.createTable("wal:autoc", Seq.empty, dropExisting = true)
      // phase 1: 8 putters race the auto-rotations; phase 2: 2 deleters
      // race them too (phases are sequential because a delete only erases
      // cells PRESENT at delete time — racing a put with a later-stamped
      // delete of the same key is nondeterministic by design)
      val putters = (0 until 8).map { w =>
        new Thread(() => (0 until 250).foreach { i =>
          t.put(key(w * 1000 + i), Seq(cell("q", 100L, s"w$w-$i")))
        })
      }
      putters.foreach(_.start()); putters.foreach(_.join())
      val deleters = (0 until 2).map { d =>
        new Thread(() => (0 until 250 by 5).foreach { i =>
          t.deleteRow(key(d * 1000 + i), stamp = 200L)
        })
      }
      deleters.foreach(_.start()); deleters.foreach(_.join())
      assert(Snapshot.generationOf(dir) >= 2, "rotation must have fired mid-race")
      val expected = 2000 - 2 * 50 // two slices lose every 5th key
      KvStore.disableWal()
      KvStore.replayWal(dir)
      val replayed = KvStore.table("wal:autoc")
      val rows = snapshot(replayed)
      assert(rows.size == expected,
        s"acknowledged puts+deletes must survive the racing rotations, got ${rows.size}")
      assert(replayed.regions.map(_.rowCount.get()).sum == expected.toLong)
    } finally {
      KvStore.setWalAutoCheckpoint(
        KvStore.DefaultAutoCheckpointRecords, KvStore.DefaultAutoCheckpointBytes)
      KvStore.disableWal()
      KvStore.drop("wal:autoc")
    }
  }

  test("group commit: batched flush keeps torn-tail semantics; sync makes the tail durable") {
    val dir = Files.createTempDirectory("graft-wal-group")
    KvStore.enableWal(dir, groupCommitRecords = 8)
    try {
      val t = KvStore.createTable("wal:grp", Seq.empty, dropExisting = true)
      (1 to 20).foreach(i => t.put(key(i), Seq(cell("q", 10L + i, s"v$i"))))
      val log = dir.resolve("graft-wal.log")
      // 21 records (create + 20 puts) at batch 8: two full batches flushed,
      // 5 records still buffered — the on-disk log is a PREFIX of acked
      // state, which is exactly the group-commit durability contract
      val sizeBeforeSync = Files.size(log)
      KvStore.walSync()
      assert(Files.size(log) > sizeBeforeSync,
        "sync must push the buffered tail (5 records) to the file")
      // torn tail on TOP of a group-committed log still discards cleanly
      KvStore.disableWal()
      Files.write(log, Array[Byte](2, 0, 50, 'w', 'a'),
        java.nio.file.StandardOpenOption.APPEND)
      KvStore.replayWal(dir)
      val rt = KvStore.table("wal:grp")
      val rows = snapshot(rt)
      assert(rows.size == 20, s"all synced records must replay, got ${rows.size}")
      assert(rows.contains("row0020" -> Seq(("f", "q", 30L, "v20"))))
    } finally {
      KvStore.disableWal()
      KvStore.drop("wal:grp")
    }
  }
}
