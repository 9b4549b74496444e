package graft.store

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.nio.file.{Files, Path, StandardOpenOption}

/** Opt-in write-ahead log for the embedded store (SURVEY §7.1 scopes
  * persistence out of the driver harness, so this is OFF by default —
  * enable with `-Dgraft.kv.wal=/dir` or [[KvStore.enableWal]]).
  *
  * Durability scope: every record is FLUSHED to the OS per `recordDone`
  * (JVM-crash durable); [[sync]] additionally fsyncs (power-loss durable)
  * and runs at write-task commit, streaming epoch, and checkpoint-marker
  * boundaries — the same two-level trade HBase makes between WAL append
  * and sync.
  *
  * Model: physical redo logging, one append-ordered file standing in for the
  * per-region-server WALs a distributed deployment would keep (HBase's HLog;
  * the reference's cluster owns this layer, so the connector never sees it —
  * here the store IS in-process, so durability has to live here). Every
  * mutation that reaches table state appends one record *before* returning:
  * table create/drop, cell puts, and the keys removed by a ranged delete
  * (logged physically, post-resolution, so replay needs no predicate
  * re-evaluation). Replay ([[KvStore.replayWal]]) rebuilds tables by
  * re-applying records in order; because `put` is an idempotent
  * upsert-by-stamp and deletes are logged as exact keys, replay converges to
  * the pre-crash state — including the per-region `maxStamp` high-water
  * marks, which makes a [[graft.datasource.GraftMicroBatchStream]]
  * checkpoint valid across a store restart (the offsets a resumed streaming
  * query presents still mean the same thing).
  *
  * A torn tail (crash mid-append) is detected by EOF inside a record and
  * discarded — the mutation never acked, standard WAL semantics.
  *
  * COMPATIBILITY: a log/snapshot dir is tied to the library build that
  * wrote it. Derived tables (secondary indexes) replay PHYSICALLY — their
  * entry bytes are whatever the writing build's layout produced — so a
  * build that changes a derived layout (e.g. the index entry terminator)
  * must start from a fresh dir; the snapshot's format version gates this
  * for snapshots, and logs carry no cross-build promise.
  *
  * GROUP COMMIT (opt-in, `groupCommitRecords > 1` via
  * `-Dgraft.kv.walGroupCommit=N` or [[KvStore.enableWal]]): appends stay
  * serialized but the stream flushes once per N records instead of every
  * record, the batched-fsync trade every production WAL makes (HBase's
  * ring-buffer sync, Postgres's commit_delay). Durability weakens from
  * per-mutation to per-batch — a crash can lose up to the last N-1 records,
  * each individually complete, so replay still converges on a prefix of
  * acked state and a torn tail is still just the final partial record.
  * Callers holding an epoch boundary (the streaming sink's per-task commit)
  * call [[sync]] to force the tail out. Default stays 1: correctness-first
  * per-record flush.
  */
final class Wal private[store] (val dir: Path, val groupCommitRecords: Int = 1) {
  import Wal._

  Files.createDirectories(dir)
  /** Bytes already in the log file when this handle opened (append mode) —
    * [[bytesLogged]] adds the bytes written through this handle on top. */
  private val openBytes: Long = {
    val f = dir.resolve(FileName)
    if (Files.exists(f)) Files.size(f) else 0L
  }
  /** True when the log file holds no records yet (fresh or truncated) —
    * [[KvStore.enableWal]] stamps such a log with the current snapshot
    * generation before anything else lands in it. */
  private[store] val isEmptyLog: Boolean = openBytes == 0L
  private val fos = new java.io.FileOutputStream(
    dir.resolve(FileName).toFile, /*append=*/ true)
  /** Long-range append counter between the Data- and Buffered- layers:
    * DataOutputStream's own `written`/`size()` saturates at Int.MaxValue,
    * which with the record gate disabled and a byte threshold past ~2 GiB
    * would make auto-rotation silently never fire — the counter must have
    * the same range as the threshold it gates. Volatile write under the
    * Wal monitor (every log* is synchronized), volatile read from
    * [[KvStore.maybeAutoCheckpoint]] without it. */
  @volatile private var appended = 0L
  private val out = new DataOutputStream(new java.io.OutputStream {
    private val buf = new BufferedOutputStream(fos)
    override def write(b: Int): Unit = { buf.write(b); appended += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      buf.write(b, off, len); appended += len
    }
    override def flush(): Unit = buf.flush()
    override def close(): Unit = buf.close()
  })

  private var pending = 0
  @volatile private var records = 0L

  /** Records appended through this handle — one of the two gates of
    * [[KvStore.maybeAutoCheckpoint]]'s rotation policy. Resets naturally
    * when rotation swaps in a fresh handle. */
  private[store] def recordsLogged: Long = records

  /** Total log size this handle accounts for: bytes present at open plus
    * bytes appended since (the dedicated long counter above — NOT
    * DataOutputStream.size(), whose Int saturation would disable the byte
    * gate past 2 GiB). The other rotation gate. */
  private[store] def bytesLogged: Long = openBytes + appended

  /** Record boundary: flush when the group-commit budget is exhausted. */
  private def recordDone(): Unit = {
    records += 1
    pending += 1
    if (pending >= groupCommitRecords) { out.flush(); pending = 0 }
  }

  /** Force the buffered tail out AND fsync it — epoch/commit boundaries
    * (the streaming sink's per-task commit, checkpoint markers): records
    * synced here survive power loss, not just a JVM crash. Per-record
    * `recordDone` flushes only to the OS page cache — per-mutation fsync
    * would serialize every put on the disk, so the per-record durability
    * level is JVM-crash; callers holding an ack boundary call this. */
  def sync(): Unit = synchronized {
    out.flush()
    fos.getFD.sync()
    pending = 0
  }

  private def bytes(d: DataOutputStream, b: Array[Byte]): Unit = {
    d.writeInt(b.length); d.write(b)
  }

  def logCreate(name: String, splits: Seq[Array[Byte]], maxVersions: Int,
      maxVersionsByCf: Map[String, Int]): Unit = synchronized {
    out.writeByte(CreateRec); out.writeUTF(name)
    out.writeInt(splits.size); splits.foreach(bytes(out, _))
    out.writeInt(maxVersions)
    out.writeInt(maxVersionsByCf.size)
    maxVersionsByCf.foreach { case (cf, cap) => out.writeUTF(cf); out.writeInt(cap) }
    recordDone()
  }

  def logPut(table: String, key: Array[Byte], cells: Seq[KvCell]): Unit = synchronized {
    out.writeByte(PutRec); out.writeUTF(table); bytes(out, key)
    out.writeInt(cells.size)
    cells.foreach { c =>
      out.writeUTF(c.cf); out.writeUTF(c.qual); out.writeLong(c.ts); bytes(out, c.value)
    }
    recordDone()
  }

  def logDeleteKey(table: String, key: Array[Byte], stamp: Long): Unit = synchronized {
    out.writeByte(DeleteKeyRec); out.writeUTF(table); bytes(out, key)
    out.writeLong(stamp)
    recordDone()
  }

  def logDrop(name: String): Unit = synchronized {
    out.writeByte(DropRec); out.writeUTF(name); recordDone()
  }

  def logClear(): Unit = synchronized { out.writeByte(ClearRec); recordDone() }

  def logRename(oldName: String, newName: String): Unit = synchronized {
    out.writeByte(RenameRec); out.writeUTF(oldName); out.writeUTF(newName)
    recordDone()
  }

  /** Log generation marker — the FIRST record of a freshly rotated log
    * ([[KvStore.checkpointWal]]). Replay after a snapshot uses it to tell
    * the rotated tail (generation == snapshot's) from a STALE pre-rotation
    * log left behind by a crash between the snapshot rename and the log
    * truncate: re-applying the stale log over the snapshot would
    * double-count the admission histograms (puts tick [[KvTable]]'s
    * mutHist unconditionally), so stale logs are skipped — the snapshot
    * already contains everything they recorded. */
  def logGeneration(gen: Long): Unit = synchronized {
    out.writeByte(GenRec); out.writeLong(gen)
    recordDone()
  }

  def close(): Unit = synchronized(out.close())
}

object Wal {
  private[store] val FileName = "graft-wal.log"
  private val CreateRec = 1
  private val PutRec = 2
  private val DeleteKeyRec = 3
  private val DropRec = 4
  private val ClearRec = 5
  private val RenameRec = 6
  private val GenRec = 7

  /** Re-apply every complete record in `dir`'s log through `apply*`
    * callbacks; a torn tail is silently dropped. */
  private[store] def replay(dir: Path,
      applyCreate: (String, Seq[Array[Byte]], Int, Map[String, Int]) => Unit,
      applyPut: (String, Array[Byte], Seq[KvCell]) => Unit,
      applyDeleteKey: (String, Array[Byte], Long) => Unit,
      applyDrop: String => Unit,
      applyClear: () => Unit,
      applyRename: (String, String) => Unit,
      applyGeneration: Long => Boolean = _ => true): Unit = {
    val f = dir.resolve(FileName)
    if (!Files.exists(f)) return
    val in = new DataInputStream(new java.io.BufferedInputStream(Files.newInputStream(f)))
    def bytes(): Array[Byte] = {
      val n = in.readInt()
      require(n >= 0 && n <= (1 << 30), s"corrupt WAL length $n")
      val b = new Array[Byte](n); in.readFully(b); b
    }
    try {
      var done = false
      // a log with no leading generation marker is generation 0 (written
      // before any checkpoint) — the decision fires before the FIRST
      // record applies, so a stale pre-rotation log is skipped whole
      var genChecked = false
      def admit(gen: Long): Boolean = { genChecked = true; applyGeneration(gen) }
      while (!done) {
        val tag = in.read() // -1 at clean EOF (record boundary)
        if (tag != -1 && tag != GenRec && !genChecked && !admit(0L)) return
        tag match {
          case -1 => done = true
          case CreateRec =>
            val name = in.readUTF()
            val splits = Seq.fill(in.readInt())(bytes())
            val maxVersions = in.readInt()
            val byCf = Seq.fill(in.readInt())(in.readUTF() -> in.readInt()).toMap
            applyCreate(name, splits, maxVersions, byCf)
          case PutRec =>
            val table = in.readUTF(); val key = bytes()
            val cells = Seq.fill(in.readInt())(
              KvCell(in.readUTF(), in.readUTF(), in.readLong(), bytes()))
            applyPut(table, key, cells)
          case DeleteKeyRec =>
            val table = in.readUTF(); val key = bytes()
            applyDeleteKey(table, key, in.readLong())
          case DropRec => applyDrop(in.readUTF())
          case ClearRec => applyClear()
          case RenameRec => applyRename(in.readUTF(), in.readUTF())
          case GenRec =>
            if (!admit(in.readLong())) done = true // stale log: stop
          case other => throw new java.io.IOException(s"corrupt WAL record tag $other")
        }
      }
    } catch {
      case _: EOFException => // torn tail: crash mid-append, mutation unacked
    } finally in.close()
  }
}
