package graft.datasource

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.GraftCatalog
import graft.store.KvStore

/** SQL `UPDATE` / arbitrary-predicate `DELETE` / `MERGE INTO` via DSv2
  * row-level operations in DELTA mode
  * ([[org.apache.spark.sql.connector.write.SupportsDelta]]) — the natural
  * fit for a KV engine, where every change is a per-row mutation addressed
  * by row key; there is no file/group to copy-rewrite. Spark rewrites the
  * statement into scan → (join with the source / condition) → delta write,
  * and the writer receives per-row insert/update/delete callbacks carrying
  * the row id (= the table's row-key columns). An UPDATE that assigns a key
  * column moves the row (delete old identity + put new); landing on an
  * existing key upserts over it — KV semantics, where the key IS the
  * identity.
  *
  * MVCC stamping keeps concurrent tasks commutative: deletes land at the
  * statement stamp T, puts at T+1, and the store's delete erases only cell
  * versions ≤ its stamp ([[graft.store.KvTable.deleteRow]]) — so a delete
  * and a put of the same key converge to the put no matter which task's
  * mutation reaches the store first.
  *
  * UPDATE semantics: when the new row covers every declared value column,
  * the update is a pure put — old versions stay readable under
  * `VERSION AS OF` time travel, HBase put semantics. When a value column is
  * set to NULL (or the table has dynamic-map columns, whose qualifiers are
  * data-dependent), a put alone would leak the stale cell through the null
  * under latest-merge reads, so the writer deletes the row's visible
  * history first: the nulled column reads back NULL, at the cost of
  * pre-update time travel for that row (the store has no per-cell
  * tombstone — documented trade, mirroring how an HBase UPDATE-to-null
  * needs an explicit DeleteColumn marker).
  *
  * Exact-predicate DELETEs never reach this path: Spark's metadata-delete
  * optimization consults [[GraftTable.canDeleteWhere]] first and routes
  * every fully-compilable predicate to the O(ranges) store delete; only
  * residual-bearing predicates (e.g. on value columns) pay the
  * scan-and-rewrite. */
class GraftRowLevelOperationBuilder(catalog: GraftCatalog, opts: GraftOptions,
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOperation(catalog, opts, info.command)
}

class GraftRowLevelOperation(catalog: GraftCatalog, opts: GraftOptions,
    cmd: RowLevelOperation.Command) extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  /** The rewrite's read half is the ordinary scan surface — filters and
    * column pruning push down exactly as in a SELECT, so a `DELETE ...
    * WHERE k < 10 AND v = 'x'` scans only the key range and ships only the
    * needed columns. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(catalog, opts, GraftTable.tableSchema(catalog, opts))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new GraftDeltaWrite(catalog, opts, info)
    }

  /** Row identity = the row-key columns. Spark's rewrite carries these from
    * the scan to the writer and forbids assigning them in UPDATE/MERGE. */
  override def rowId(): Array[NamedReference] =
    catalog.rowKeyParts.map(p => Expressions.column(p.field.name)).toArray
}

/** No distribution requirement: a delta plan's output mixes row and row-id
  * attribute namespaces (per-command), so a key-column reference does not
  * resolve uniformly across DELETE/UPDATE/MERGE plans — and row-level
  * statements touch the matched subset, not bulk-load volumes, so the
  * region-fan-out argument of the append path carries less weight. */
class GraftDeltaWrite(catalog: GraftCatalog, opts: GraftOptions,
    info: LogicalWriteInfo) extends DeltaWrite {
  override def toBatch: DeltaBatchWrite = {
    val rowIdSchema = info.rowIdSchema.orElseGet(() =>
      throw new IllegalStateException("delta write without a row-id schema"))
    new GraftDeltaBatchWrite(catalog, opts, info.schema(), rowIdSchema)
  }
}

/** Statement-stamp allocator for row-level writes: wall-clock time, but
  * strictly monotone ACROSS statements even within one millisecond — a
  * second statement's delete stamp must exceed the first's put stamp
  * (delete@T2 erases only cells ≤ T2), or back-to-back UPDATEs in the same
  * ms would leave the first statement's cells visible under the second's
  * rewrite. Driver-side state, matching where a distributed deployment
  * would allocate the statement timestamp anyway. */
private object StatementStamp {
  private val last = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
  /** returns the delete stamp; the statement's put stamp is +1, and the
    * next statement's delete stamp is allocated past BOTH */
  def next(): Long =
    last.updateAndGet(prev => math.max(System.currentTimeMillis(), prev + 2))
}

class GraftDeltaBatchWrite(catalog: GraftCatalog, opts: GraftOptions,
    rowSchema: StructType, rowIdSchema: StructType) extends DeltaBatchWrite {

  private var registeredStamp: Option[Long] = None

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    // One statement stamp pair, allocated driver-side so every task agrees:
    // deletes at T, puts at T+1 (see class doc on commutativity).
    val deleteStamp = opts.timestamp.getOrElse(StatementStamp.next())
    if (opts.timestamp.isEmpty) {
      // Register T as IN-FLIGHT across the table for the statement's whole
      // lifetime (released at commit/abort): the stamp is allocated HERE but
      // tasks land mutations later, when wall clock has moved past it — a
      // concurrent CDC capture (min(maxStamp, now-1, minInFlight-1)) would
      // otherwise commit an offset >= T and permanently miss the statement's
      // mutations. Explicit `timestamp` writes keep their documented
      // low-watermark caveat. In a distributed deployment this registration
      // is the statement-stamp registry the coordinator keeps anyway.
      KvStore.table(opts.storeName(catalog)).regions
        .foreach(_.beginWrite(deleteStamp))
      registeredStamp = Some(deleteStamp)
    }
    new GraftDeltaWriterFactory(catalog, opts, rowSchema, rowIdSchema, deleteStamp)
  }

  private def release(): Unit = {
    registeredStamp.foreach(s =>
      KvStore.table(opts.storeName(catalog)).regions.foreach(_.endWrite(s)))
    registeredStamp = None
  }

  // Mutations apply as tasks run; puts/deletes are idempotent per
  // (key, stamp), so a retried task converges — same model as the append
  // path's writers.
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // a row-level statement is ack'd only after its WAL tail is durable —
    // the same redo rule the append path's per-task commit enforces
    KvStore.walSync()
    release()
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = release()
}

class GraftDeltaWriterFactory(catalog: GraftCatalog, opts: GraftOptions,
    rowSchema: StructType, rowIdSchema: StructType, deleteStamp: Long)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(catalog, opts, rowSchema, rowIdSchema, deleteStamp)
}

class GraftDeltaWriter(catalog: GraftCatalog, opts: GraftOptions,
    rowSchema: StructType, rowIdSchema: StructType, deleteStamp: Long)
    extends DeltaWriter[InternalRow] {

  private val table = KvStore.table(opts.storeName(catalog))
  // lazy: a DELETE plan projects no row columns — its rowSchema can't (and
  // needn't) resolve the key slots a row codec requires
  private lazy val rowCodec = new KvRowCodec(catalog, rowSchema)
  private val idCodec = new KvRowCodec(catalog, rowIdSchema)
  private val putStamp = deleteStamp + 1

  /** Does writing `row` over an EXISTING destination row risk leaking the
    * old row's cells through a null (or a data-dependent dynamic-map
    * qualifier) under latest-merge reads? If so the destination's visible
    * history must be deleted first — the class-doc trade. */
  private def needsShadowDelete(row: InternalRow): Boolean =
    rowCodec.hasDynamicColumns || !rowCodec.coversAllValueColumns(row)

  override def insert(row: InternalRow): Unit = {
    val key = rowCodec.key(row)
    // MERGE NOT MATCHED may still LAND on an existing key (KV upsert
    // semantics — the key is the identity); the stale-leak guard applies
    // to the destination exactly as it does for updates
    if (needsShadowDelete(row)) table.deleteRow(key, deleteStamp)
    table.put(key, rowCodec.cells(row, putStamp))
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    table.deleteRow(idCodec.key(id), deleteStamp)

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    val oldKey = idCodec.key(id)
    val newKey = rowCodec.key(row)
    if (!java.util.Arrays.equals(oldKey, newKey)) {
      // key-changing update: the row moves — delete the old identity, put
      // the new. MVCC stamps make the two halves race-safe across tasks
      // (delete@T never erases a put@T+1), so `UPDATE t SET k = k + 1`
      // converges no matter which task's delete(k) meets which task's
      // put(k). Landing on an EXISTING key upserts over it — KV semantics,
      // where the key IS the identity (no duplicate-key error to raise) —
      // so the DESTINATION needs the same stale-leak guard as the same-key
      // branch: without it, `UPDATE t SET k = 2, v = NULL WHERE k = 1`
      // would read back k=2's OLD v through the null.
      table.deleteRow(oldKey, deleteStamp)
      if (needsShadowDelete(row)) table.deleteRow(newKey, deleteStamp)
      table.put(newKey, rowCodec.cells(row, putStamp))
    } else {
      // pure put when the new row shadows every value column (time travel
      // to pre-update versions survives); delete-then-put when a null or a
      // dynamic-map column could let a stale cell leak through (class doc)
      if (needsShadowDelete(row)) table.deleteRow(oldKey, deleteStamp)
      table.put(newKey, rowCodec.cells(row, putStamp))
    }
  }

  override def commit(): WriterCommitMessage = GraftCommit
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
