package graft.store

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, StandardCopyOption}

/** WAL CHECKPOINT: a point-in-time image of the whole store, paired with
  * log rotation ([[KvStore.checkpointWal]]) so the redo log stops growing
  * with history — HBase's memstore-flush + WAL-roll in one move, Postgres's
  * CHECKPOINT. Without it the log is the complete mutation history and a
  * CDC-rate workload replays (and stores) every version ever written; with
  * it, restart cost is snapshot + tail, and the tail is bounded by the
  * checkpoint cadence.
  *
  * The image is EXACT table state, not a logical re-export: per region it
  * carries the row/version maps, the delete markers, the mutation
  * high-water mark, and the admission histogram — so a restarted store
  * serves identical answers AND identical streaming offsets/backlogs
  * (the `maxStamp` vector and `mutHist` admission cuts a resumed
  * [[graft.datasource.GraftMicroBatchStream]] checkpoint depends on).
  * Row counters are recomputed from the restored maps.
  *
  * Crash safety: the image lands in a temp file, is fsynced, and renames
  * atomically over the previous snapshot; only then is the log truncated.
  * Snapshot and log pair through a GENERATION number (the rotated log's
  * first record is a generation marker): replay applies a log only when
  * its generation matches the snapshot's, so the crash window between the
  * rename and the truncate — new snapshot + STALE full log — restores
  * exactly the image (the stale log is skipped; re-applying it would
  * double-count the admission histograms, which `put` ticks
  * unconditionally). A crash before the rename leaves the previous
  * snapshot + its matching full log: the state before the checkpoint. */
private[store] object Snapshot {

  val FileName = "graft-wal.snapshot"
  private val Magic = 0x47524654 // "GRFT"
  // v2 added the log-generation field; bumping makes a pre-generation
  // snapshot fail with a clear version error instead of misparsing
  private val Version = 2

  private def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit = {
    out.writeInt(b.length); out.write(b)
  }

  private def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    require(n >= 0 && n <= (1 << 30), s"corrupt snapshot length $n")
    val b = new Array[Byte](n); in.readFully(b); b
  }

  /** Serialize every table to `dir/FileName` (tmp + fsync + atomic rename).
    * `generation` identifies the rotated log this snapshot pairs with —
    * replay applies only a log tail of the SAME generation, so a stale
    * pre-rotation log (crash between rename and truncate) is skipped
    * instead of double-applied over the image. Caller holds the store lock
    * and has quiesced writers. */
  def write(dir: Path, tables: Seq[KvTable], generation: Long): Unit = {
    val tmp = dir.resolve(FileName + ".tmp")
    val fos = new FileOutputStream(tmp.toFile)
    val out = new DataOutputStream(new BufferedOutputStream(fos))
    try writeBody(out, fos, tables, generation)
    catch { case t: Throwable =>
      try out.close() catch { case _: Throwable => }
      Files.deleteIfExists(tmp)
      throw t
    }
    Files.move(tmp, dir.resolve(FileName),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def writeBody(out: DataOutputStream, fos: FileOutputStream,
      tables: Seq[KvTable], generation: Long): Unit = {
    out.writeInt(Magic); out.writeInt(Version)
    out.writeLong(generation)
    out.writeInt(tables.size)
    tables.foreach { t =>
      out.writeUTF(t.name)
      val splits = t.splitPoints
      out.writeInt(splits.size); splits.foreach(writeBytes(out, _))
      out.writeInt(t.maxVersions)
      out.writeInt(t.maxVersionsByCf.size)
      t.maxVersionsByCf.foreach { case (cf, cap) => out.writeUTF(cf); out.writeInt(cap) }
      t.regions.foreach { r =>
        out.writeLong(r.maxStamp.get())
        // admission histogram: stamp → landed row-mutations
        out.writeInt(r.mutHist.size())
        r.mutHist.forEach((stamp, adder) => {
          out.writeLong(stamp); out.writeLong(adder.sum())
        })
        // delete markers
        out.writeInt(r.tombstones.size())
        r.tombstones.forEach((key, stamp) => {
          writeBytes(out, key); out.writeLong(stamp)
        })
        // rows: key → (cf, qual) → ts(desc) → value
        out.writeInt(r.rows.size())
        r.rows.forEach((key, cols) => {
          writeBytes(out, key)
          out.writeInt(cols.size())
          cols.forEach((col, versions) => {
            out.writeUTF(col._1); out.writeUTF(col._2)
            out.writeInt(versions.size())
            versions.forEach((ts, v) => { out.writeLong(ts); writeBytes(out, v) })
          })
        })
      }
    }
    out.flush()
    fos.getFD.sync()
    out.close()
  }

  /** The generation recorded in `dir`'s snapshot header, 0 when absent or
    * unreadable — [[KvStore.enableWal]]'s marker-stamping probe (a bad
    * header will fail loudly in [[load]] where it matters). */
  def generationOf(dir: Path): Long = {
    val f = dir.resolve(FileName)
    if (!Files.exists(f)) return 0L
    val in = new DataInputStream(new BufferedInputStream(Files.newInputStream(f)))
    try {
      if (in.readInt() != Magic || in.readInt() != Version) 0L
      else in.readLong()
    } catch { case _: java.io.IOException => 0L } finally in.close()
  }

  /** Load `dir/FileName` if present, handing each rebuilt table to
    * `register`; returns the snapshot's log generation (0 when no
    * checkpoint exists — pure-log replay applies everything). */
  def load(dir: Path, register: (String, KvTable) => Unit): Long = {
    val f = dir.resolve(FileName)
    if (!Files.exists(f)) return 0L
    val in = new DataInputStream(new BufferedInputStream(Files.newInputStream(f)))
    try {
      require(in.readInt() == Magic, "corrupt snapshot: bad magic")
      require(in.readInt() == Version, "unsupported snapshot version")
      val generation = in.readLong()
      val nTables = in.readInt()
      (0 until nTables).foreach { _ =>
        val name = in.readUTF()
        val splits = IndexedSeq.fill(in.readInt())(readBytes(in))
        val maxVersions = in.readInt()
        val byCf = Seq.fill(in.readInt())(in.readUTF() -> in.readInt()).toMap
        val t = new KvTable(name, splits, maxVersions, byCf)
        t.regions.foreach { r =>
          r.maxStamp.set(in.readLong())
          (0 until in.readInt()).foreach { _ =>
            val stamp = in.readLong()
            val adder = new java.util.concurrent.atomic.LongAdder
            adder.add(in.readLong())
            r.mutHist.put(stamp, adder)
          }
          (0 until in.readInt()).foreach { _ =>
            val key = readBytes(in)
            r.tombstones.put(key, in.readLong())
          }
          val nRows = in.readInt()
          (0 until nRows).foreach { _ =>
            val key = readBytes(in)
            val cols = new java.util.concurrent.ConcurrentHashMap[(String, String),
              java.util.concurrent.ConcurrentSkipListMap[java.lang.Long, Array[Byte]]]()
            (0 until in.readInt()).foreach { _ =>
              val cf = in.readUTF(); val qual = in.readUTF()
              val versions = new java.util.concurrent.ConcurrentSkipListMap[java.lang.Long, Array[Byte]](
                java.util.Comparator.reverseOrder[java.lang.Long]())
              (0 until in.readInt()).foreach { _ =>
                val ts = in.readLong(); versions.put(ts, readBytes(in))
              }
              cols.put((cf, qual), versions)
            }
            r.rows.put(key, cols)
          }
          r.rowCount.set(r.rows.size().toLong)
        }
        register(name, t)
      }
      generation
    } finally in.close()
  }
}
