package graft.datasource

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.catalog.{Field, GraftCatalog}
import graft.ranges.BytesUtil
import graft.store.{KvCell, KvStore}

/** Write path: DataFrame → store puts, with create-table-and-presplit DDL
  * (reference createTableIfNotExist + insert + convertToPut,
  * HBaseRelation.scala:124-267). `INSERT OVERWRITE` / `overwritePartitions`
  * ride [[org.apache.spark.sql.connector.write.SupportsOverwrite]]: a
  * whole-table overwrite drops and recreates (fresh presplits); a
  * conditional overwrite deletes the matching key set first (exact-compile
  * only — an over-approximate condition would erase rows the condition
  * didn't select) and then appends. */
class GraftWriteBuilder(catalog: GraftCatalog, opts: GraftOptions, info: LogicalWriteInfo)
    extends WriteBuilder with org.apache.spark.sql.connector.write.SupportsOverwrite
    // update-mode streaming writes ARE kv upserts: a group's re-emission
    // overwrites its previous cells in place (same rowkey), so treating
    // update as append is exactly the store's semantics — this marker lets
    // watermarked streaming aggregations sink straight into the table
    with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend {

  private var dropAndRecreate = false
  private var deleteFirst: Option[Array[org.apache.spark.sql.sources.Filter]] = None

  override def truncate(): WriteBuilder = { dropAndRecreate = true; this }

  override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = {
    if (filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]))
      dropAndRecreate = true
    else {
      require(FilterCompiler.partition(catalog, filters)._2.isEmpty,
        s"overwrite condition must compile exactly (got residual in " +
          s"${filters.mkString(", ")}) — an over-approximate overwrite would " +
          "delete rows the condition didn't select")
      deleteFirst = Some(filters)
    }
    this
  }

  /** The write declares REGION-ALIGNED distribution+ordering
    * ([[RequiresDistributionAndOrdering]]): range-partition the incoming
    * rows by the row-key columns (in key order) and sort within each task.
    * Contiguous key slices mean every task lands in O(1) store regions —
    * without it each of N write tasks opens connections to (and interleaves
    * puts across) ALL M region servers, an N×M fan-out that dominates bulk
    * loads at cluster scale; it is the write-side twin of the reference's
    * presplit-for-parallelism intent (HBaseRelation.scala:161-164). Sorted
    * task-local key order also turns the store's skip-list inserts into
    * append-position hits. Non-strict: AQE may coalesce the exchange for
    * small writes rather than forcing 200 near-empty range partitions. */
  override def build(): Write = new Write
      with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
    import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder}

    // WAL rotation observability (SQL UI): the write node reports how many
    // auto-checkpoints THIS write triggered and the wall they cost — the
    // feedback a CDC operator tuning setWalAutoCheckpoint needs, next to
    // the scan-side graftRowsScanned family. Deltas against construction
    // time (the store counters are JVM-monotonic) — which assumes ONE
    // writer at a time: rotations triggered by a concurrent write (or by
    // anything else between planning and commit) land in this node's delta
    // and would double-count across concurrent writers. That matches how
    // the store is driven here (Verify/Bench run queries sequentially;
    // streaming sinks commit micro-batches one at a time); per-trigger
    // attribution would need the rotation path to tag its caller.
    private val rotationsAtStart = KvStore.walRotations
    private val rotationNanosAtStart = KvStore.walRotationNanos

    override def supportedCustomMetrics():
        Array[org.apache.spark.sql.connector.metric.CustomMetric] =
      Array(new GraftWriteMetrics.WalRotations, new GraftWriteMetrics.WalRotationMs)

    override def reportDriverMetrics():
        Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
      Array(
        GraftMetricsDefs.task("graftWalRotations",
          KvStore.walRotations - rotationsAtStart),
        GraftMetricsDefs.task("graftWalRotationMs",
          (KvStore.walRotationNanos - rotationNanosAtStart) / 1000000L))

    private def keyOrder: Array[SortOrder] =
      catalog.rowKeyParts.map(p => Expressions.sort(
        Expressions.column(p.field.name), SortDirection.ASCENDING,
        NullOrdering.NULLS_FIRST)).toArray

    override def requiredDistribution():
        org.apache.spark.sql.connector.distributions.Distribution =
      org.apache.spark.sql.connector.distributions.Distributions.ordered(keyOrder)

    override def requiredOrdering(): Array[SortOrder] = keyOrder

    override def distributionStrictlyRequired(): Boolean = false

    override def toBatch: BatchWrite =
      new GraftBatchWrite(catalog, opts, info.schema(), dropAndRecreate, deleteFirst)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new GraftStreamingWrite(catalog, opts, info.schema(), dropAndRecreate)
  }
}

/** Native DSv2 streaming sink: `df.writeStream.format("graft-kv")` — each
  * micro-batch's tasks run the SAME row→put encoder as batch writes. Epoch
  * commit/abort are no-ops: the delivery guarantee is AT-LEAST-ONCE, with
  * latest-merge reads converging to exactly-once CONTENTS (a replayed row
  * overwrites the same logical cells, and the newest version wins).
  * Strict cell-level idempotence additionally needs the `timestamp` option
  * (fixed stamps make replayed puts byte-identical): on the default
  * registered-stamp path each replay writes a NEW version, so versioned
  * (`maxVersions>1` / `mergeToLatest=false` / `_cell_ts`) and CDC readers
  * can observe replay duplicates after a mid-epoch failure — the standard
  * caveat for non-transactional streaming sinks. DDL (create + presplit)
  * runs once, driver-side, when the query starts. */
class GraftStreamingWrite(catalog: GraftCatalog, opts: GraftOptions,
    writeSchema: StructType, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    GraftDdl.ensureTable(catalog, opts, dropExisting = truncate)
    new GraftStreamingWriterFactory(catalog, opts, writeSchema)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftStreamingWriterFactory(catalog: GraftCatalog, opts: GraftOptions,
    writeSchema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(catalog, opts, writeSchema)
}

class GraftBatchWrite(catalog: GraftCatalog, opts: GraftOptions,
    writeSchema: StructType, truncate: Boolean,
    deleteFirst: Option[Array[org.apache.spark.sql.sources.Filter]] = None)
    extends BatchWrite {

  // EVERY overwrite — truncate AND conditional — writes into a
  // region-aligned STAGING table and installs at commit. Destroying state at
  // factory-creation time would leave rows deleted (or the whole table
  // dropped) with nothing appended if the job fails mid-write, and a
  // self-referential `INSERT OVERWRITE t SELECT ... FROM t` would scan the
  // already-emptied table. Staging keeps the main table untouched until the
  // job succeeds; commit then runs drop-recreate (truncate) or
  // delete-matching (conditional), followed by the install. In a
  // distributed store the install is a bulkload-style region handoff
  // (metadata op, staging regions share the main table's split points);
  // in-process it replays the staged cells through `main.put`, so WAL
  // logging and index maintenance hooks fire normally.
  private val stagingName: Option[String] =
    if (truncate || deleteFirst.isDefined)
      Some(opts.storeName(catalog) + "#overwrite-staging-" + java.util.UUID.randomUUID())
    else None

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // DDL runs once, driver-side, before tasks launch (reference
    // createTableIfNotExist, HBaseRelation.scala:124-175) — but never
    // destructively: a truncate's drop-recreate is deferred to commit.
    GraftDdl.ensureTable(catalog, opts, dropExisting = false)
    stagingName.foreach { sn =>
      val main = KvStore.table(opts.storeName(catalog))
      KvStore.createTable(sn, main.regionInfos.flatMap(_.start),
        main.maxVersions, dropExisting = true, main.maxVersionsByCf)
    }
    new GraftWriterFactory(catalog, opts, writeSchema, stagingName)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    stagingName.foreach { sn =>
      if (truncate) GraftDdl.ensureTable(catalog, opts, dropExisting = true)
      else {
        val hrf = FilterCompiler.compileAll(catalog, deleteFirst.get.toSeq)
          .exactOrThrow("deleteFirst")
        KvStore.table(opts.storeName(catalog)).deleteNow(hrf.ranges, hrf.pred)
      }
      val main = KvStore.table(opts.storeName(catalog))
      val staging = KvStore.table(sn)
      staging.regions.foreach(_.rows.forEach { (key, row) =>
        val cells = Seq.newBuilder[KvCell]
        row.forEach { (ck, vmap) =>
          vmap.forEach((ts, value) => cells += KvCell(ck._1, ck._2, ts, value))
        }
        main.put(key, cells.result())
      })
      KvStore.drop(sn)
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    stagingName.foreach(KvStore.drop)
}

object GraftDdl {

  /** Create with presplit regions: split keys interpolate min→max split
    * points; `numReg ≥ 4` enforced like the reference (HBaseRelation.scala:
    * 150-164). Table absent + no `newtable` ⇒ default 5 regions. */
  def ensureTable(catalog: GraftCatalog, opts: GraftOptions, dropExisting: Boolean): Unit = {
    val name = opts.storeName(catalog)
    if (!dropExisting && KvStore.exists(name)) {
      // table DDL is settled, but index hooks live on the in-memory KvTable
      // instance — (re-)attach so a fresh process (or a WAL-replayed store)
      // resumes maintenance before the first mutation
      SecondaryIndex.ensure(catalog, opts, droppedMain = false)
      return
    }
    if (catalog.saltBuckets > 0) {
      // salted tables presplit ON the salt boundaries — one region per
      // bucket, which is the whole point (each bucket takes 1/n of a
      // monotone write stream); numeric/string split options are ignored
      val splits = (1 until catalog.saltBuckets).map(b => Array(b.toByte))
      KvStore.createTable(name, splits, math.max(opts.maxVersions, 1), dropExisting,
        opts.familyMaxVersions)
      SecondaryIndex.ensure(catalog, opts, droppedMain = dropExisting)
      return
    }
    val numReg = if (opts.newTable > 0) opts.newTable else 5
    require(numReg > 3, s"newtable=$numReg: region count must be at least 4")
    val first = catalog.rowKeyParts.head.field
    val splits = (opts.minSplitNum, opts.maxSplitNum) match {
      // numeric first key part: interpolate in VALUE space and encode with
      // the key's coder, so regions stay balanced for numeric keys (string
      // split points like "aaaaaa" would dump every numeric key in region 0)
      case (Some(lo), Some(hi)) =>
        val n = numReg - 1
        (0 until n).map { i =>
          val v = lo + (hi - lo) * i / math.max(n - 1, 1)
          first.dataType match {
            case org.apache.spark.sql.types.LongType    => first.coder.encode(first.dataType, v)
            case org.apache.spark.sql.types.IntegerType => first.coder.encode(first.dataType, v.toInt)
            case dt => throw new IllegalArgumentException(s"numeric splits on $dt key")
          }
        }
      case _ =>
        splitKeys(opts.minSplit.getBytes("UTF-8"), opts.maxSplit.getBytes("UTF-8"), numReg - 1)
    }
    KvStore.createTable(name, splits, math.max(opts.maxVersions, 1), dropExisting,
      opts.familyMaxVersions)
    SecondaryIndex.ensure(catalog, opts, droppedMain = dropExisting)
  }

  /** n split points linearly interpolated across [min, max] inclusive,
    * n ≥ 2 (first = min, last = max) — the Bytes.split(min, max, numReg-3)
    * shape: n = numReg-1 boundaries ⇒ numReg regions. */
  def splitKeys(min: Array[Byte], max: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val width = math.max(min.length, max.length)
    def toBig(a: Array[Byte]): BigInt =
      BigInt(1, java.util.Arrays.copyOf(a, width)) // right-padded with 0x00
    val lo = toBig(min)
    val hi = toBig(max)
    (0 until n).map { i =>
      val v = lo + (hi - lo) * i / (n - 1)
      val raw = v.toByteArray.dropWhile(_ == 0)
      val out = new Array[Byte](width)
      System.arraycopy(raw, 0, out, width - raw.length, raw.length)
      out
    }
  }
}

class GraftWriterFactory(catalog: GraftCatalog, opts: GraftOptions, writeSchema: StructType,
    targetTable: Option[String] = None)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(catalog, opts, writeSchema, targetTable)
}

/** Row → (rowkey bytes, cells) codec shared by every write path — batch,
  * streaming, and row-level delta (reference convertToPut,
  * HBaseRelation.scala:202-267): composite keys concatenated with fixed
  * widths, nulls skipped, map columns fanned out. `schema` may be any
  * subset of the catalog's columns that includes every key part — the
  * delta path instantiates one codec over the full row schema and one
  * over the row-id (key-only) schema. */
final class KvRowCodec(catalog: GraftCatalog, schema: StructType) extends Serializable {

  // resolve schema positions to catalog fields by NAME
  private val slots: Array[(Field, Int, DataType)] =
    schema.fields.zipWithIndex.map { case (sf, i) =>
      (catalog.field(sf.name), i, sf.dataType)
    }
  private val keySlots = catalog.rowKeyParts.map { p =>
    val slot = slots.find(_._1.name == p.field.name).getOrElse(
      throw new IllegalArgumentException(
        s"write is missing row-key column ${p.field.name}"))
    (p, slot._2, slot._3)
  }
  private val valueSlots = slots.filterNot { case (f, _, _) => f.isRowKey }

  /** Dynamic-map value columns fan out to data-dependent qualifiers, so a
    * rewritten row can't prove it shadows every qualifier the old row had —
    * the delta update path must delete-then-put for such tables. */
  val hasDynamicColumns: Boolean =
    valueSlots.exists(_._3.isInstanceOf[MapType])

  /** Whether `row` writes a cell into EVERY declared value column — if so,
    * a put at a newer stamp fully shadows the row's previous values under
    * latest-merge reads (no stale column can leak through a null). */
  def coversAllValueColumns(row: InternalRow): Boolean =
    valueSlots.forall { case (_, i, _) => !row.isNullAt(i) }

  def key(row: InternalRow): Array[Byte] = {
    val keyBytes = keySlots.map { case (p, i, dt) =>
      require(!row.isNullAt(i), s"row-key column ${p.field.name} is null")
      val v = CatalystConv.fromCatalyst(dt, row.get(i, dt))
      val enc = p.field.coder.encode(p.field.dataType, v)
      // Fixed-width parts must encode to EXACTLY the declared width (like
      // the reference): zero-padding an under-length value would silently
      // mutate it on round trip ('ab' → 'ab\0\0\0\0') and equality filters
      // on the original value would never match.
      require(p.width <= 0 || enc.length == p.width,
        s"${p.field.name}: encoded ${enc.length} bytes but declared length ${p.width}; " +
          "fixed-width key parts require exact-length values")
      enc
    }
    val logical = BytesUtil.concat(keyBytes: _*)
    if (catalog.saltBuckets > 0)
      BytesUtil.concat(Array(catalog.saltOf(logical)), logical)
    else logical
  }

  def cells(row: InternalRow, ts: Long): Seq[KvCell] = {
    val cells = Seq.newBuilder[KvCell]
    valueSlots.foreach { case (f, i, dt) =>
      if (!row.isNullAt(i)) {
        val v = CatalystConv.fromCatalyst(dt, row.get(i, dt))
        (f.dataType, v) match {
          // dynamic map fan-out (reference HBaseRelation.scala:244-261)
          case (MapType(StringType, MapType(LongType, vt, _), _), m: collection.Map[_, _]) =>
            m.foreach { case (q, versions) =>
              versions.asInstanceOf[collection.Map[Long, Any]].foreach { case (vts, x) =>
                cells += KvCell(f.cf, q.toString, vts, f.coder.encode(vt, x))
              }
            }
          case (MapType(StringType, vt, _), m: collection.Map[_, _]) =>
            m.foreach { case (q, x) => cells += KvCell(f.cf, q.toString, ts, f.coder.encode(vt, x)) }
          case (MapType(LongType, vt, _), m: collection.Map[_, _]) =>
            m.foreach { case (vts, x) =>
              cells += KvCell(f.cf, f.qual, vts.asInstanceOf[Long], f.coder.encode(vt, x))
            }
          case (dt2, _) =>
            val enc = f.coder.encode(dt2, v)
            // var-width INDEXED values become index entry keys terminated
            // by 0x00 (SecondaryIndex.entryKey) — reject a NUL-bearing
            // value HERE, before any table state changes, instead of
            // letting the index hook throw mid-mutation
            if (f.indexed && f.byteWidth <= 0) {
              var bi = 0
              while (bi < enc.length) {
                require(enc(bi) != 0,
                  s"${f.name}: var-width indexed values must not contain a " +
                    "0x00 byte (the index entry terminator)")
                bi += 1
              }
            }
            cells += KvCell(f.cf, f.qual, ts, enc)
        }
      }
    }
    cells.result()
  }
}

/** Append-path writer: one put per row at the fixed (option) or wall-clock
  * timestamp. With `delete=true` ([[GraftOptions.deleteWrite]]) each row is
  * a row-level delete TOMBSTONE of its key instead — the distributed
  * retirement path (WAL-logged, MVCC-stamped, index hooks fire), so a
  * data-dependent key set dies without ever visiting the driver. */
class GraftDataWriter(catalog: GraftCatalog, opts: GraftOptions, writeSchema: StructType,
    targetTable: Option[String] = None)
    extends DataWriter[InternalRow] {

  private val table = KvStore.table(targetTable.getOrElse(opts.storeName(catalog)))
  private val codec = new KvRowCodec(catalog, writeSchema)

  override def write(row: InternalRow): Unit = opts.timestamp match {
    // explicit timestamps keep the documented stream low-watermark caveat
    case Some(ts) =>
      if (opts.deleteWrite) table.deleteRow(codec.key(row), ts)
      else table.put(codec.key(row), codec.cells(row, ts))
    // default stamps are assigned REGISTERED (KvTable.withWriteStamp), so
    // a concurrent CDC offset capture can never strand this row below an
    // already-committed offset; key-scoped, so only the row's region's
    // capture floor dips
    case None =>
      val key = codec.key(row)
      table.withWriteStamp(key) { ts =>
        if (opts.deleteWrite) table.deleteRow(key, ts)
        else table.put(key, codec.cells(row, ts))
      }
  }

  override def commit(): WriterCommitMessage = {
    // epoch boundary: under WAL group commit the buffered tail must be
    // durable before this task acks its rows
    KvStore.walSync()
    GraftCommit
  }

  override def abort(): Unit = ()

  override def close(): Unit = ()
}

case object GraftCommit extends WriterCommitMessage

/** Write-side custom metrics ([[GraftWriteBuilder]]): WAL auto-checkpoint
  * rotations attributable to a batch write, surfaced in the SQL UI beside
  * the scan-side [[GraftMetricsDefs]] family. */
private[datasource] object GraftWriteMetrics {
  import org.apache.spark.sql.connector.metric.CustomSumMetric

  final class WalRotations extends CustomSumMetric {
    override def name(): String = "graftWalRotations"
    override def description(): String = "WAL auto-checkpoint rotations during write"
  }
  final class WalRotationMs extends CustomSumMetric {
    override def name(): String = "graftWalRotationMs"
    override def description(): String = "wall ms spent in WAL snapshot+rotation"
  }
}
