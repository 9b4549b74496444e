package graft.store

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.nio.file.{Files, Path, StandardOpenOption}

/** Opt-in write-ahead log for the embedded store (SURVEY §7.1 scopes
  * persistence out of the driver harness, so this is OFF by default —
  * enable with `-Dgraft.kv.wal=/dir` or [[KvStore.enableWal]]).
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
  * discarded — the mutation never acked, standard WAL semantics. Appends are
  * serialized and flushed per record (group commit is a real deployment's
  * optimization; correctness first here).
  */
final class Wal private[store] (val dir: Path) {
  import Wal._

  Files.createDirectories(dir)
  private val out = new DataOutputStream(new BufferedOutputStream(
    Files.newOutputStream(dir.resolve(FileName),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)))

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
    out.flush()
  }

  def logPut(table: String, key: Array[Byte], cells: Seq[KvCell]): Unit = synchronized {
    out.writeByte(PutRec); out.writeUTF(table); bytes(out, key)
    out.writeInt(cells.size)
    cells.foreach { c =>
      out.writeUTF(c.cf); out.writeUTF(c.qual); out.writeLong(c.ts); bytes(out, c.value)
    }
    out.flush()
  }

  def logDeleteKey(table: String, key: Array[Byte], stamp: Long): Unit = synchronized {
    out.writeByte(DeleteKeyRec); out.writeUTF(table); bytes(out, key)
    out.writeLong(stamp)
    out.flush()
  }

  def logDrop(name: String): Unit = synchronized {
    out.writeByte(DropRec); out.writeUTF(name); out.flush()
  }

  def logClear(): Unit = synchronized { out.writeByte(ClearRec); out.flush() }

  def logRename(oldName: String, newName: String): Unit = synchronized {
    out.writeByte(RenameRec); out.writeUTF(oldName); out.writeUTF(newName)
    out.flush()
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

  /** Re-apply every complete record in `dir`'s log through `apply*`
    * callbacks; a torn tail is silently dropped. */
  private[store] def replay(dir: Path,
      applyCreate: (String, Seq[Array[Byte]], Int, Map[String, Int]) => Unit,
      applyPut: (String, Array[Byte], Seq[KvCell]) => Unit,
      applyDeleteKey: (String, Array[Byte], Long) => Unit,
      applyDrop: String => Unit,
      applyClear: () => Unit,
      applyRename: (String, String) => Unit): Unit = {
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
      while (!done) {
        val tag = in.read() // -1 at clean EOF (record boundary)
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
          case other => throw new java.io.IOException(s"corrupt WAL record tag $other")
        }
      }
    } catch {
      case _: EOFException => // torn tail: crash mid-append, mutation unacked
    } finally in.close()
  }
}
