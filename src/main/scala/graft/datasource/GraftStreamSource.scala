package graft.datasource

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.catalog.GraftCatalog
import graft.ranges.{Bound, BytesUtil, ScanRange}
import graft.store.KvStore

/** Micro-batch offsets for the kv streaming source: one MVCC stamp per
  * region — each region's mutation high-water mark at the batch boundary.
  * A batch reads, per region, exactly the cells with
  * `lastOffset < ts ≤ newOffset`. Per-region (not one global stamp) because
  * each region server advances independently in a distributed deployment;
  * the vector is what a per-server WAL position would serialize to. */
final case class GraftStreamOffset(stamps: Map[Int, Long]) extends Offset {
  override def json(): String =
    stamps.toSeq.sortBy(_._1).map { case (r, s) => s""""$r":$s""" }
      .mkString("{", ",", "}")
}

object GraftStreamOffset {
  /** Strict parse: the whole string must be the `json()` shape — a
    * truncated or foreign checkpoint offset must FAIL loudly here, not
    * degrade to an empty stamp map that would silently restart every
    * region from the beginning of history (re-emitting all CDC rows to
    * downstream consumers). */
  def parse(json: String): GraftStreamOffset = {
    val t = json.trim
    require(t.matches("""\{\s*\}|\{"\d+":-?\d+(,"\d+":-?\d+)*\}"""),
      s"malformed graft-kv stream offset: $json")
    GraftStreamOffset("\"(\\d+)\"\\s*:\\s*(-?\\d+)".r.findAllMatchIn(t)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
  }

  /** Accepts both live [[GraftStreamOffset]]s and the engine's serialized
    * checkpoint form (anything else round-trips through its json). */
  def of(o: Offset): GraftStreamOffset = o match {
    case g: GraftStreamOffset => g
    case other => parse(other.json())
  }
}

/** Native streaming SOURCE: `spark.readStream.format("graft-kv")` — the CDC
  * counterpart of [[GraftStreamingWrite]]. Offsets ride the store's MVCC
  * cell stamps: each micro-batch plans a time-range scan per region over
  * the stamp window `(last, latest]`, so a batch's rows are exactly the
  * rows something was written to in the window, merged to their
  * latest-in-window cell values — upsert CDC, the shape an incremental
  * dedup/index refresh consumes. Both offset capture (`latestOffset`) and
  * batch planning are O(regions): the high-water marks are maintained by
  * `put` ([[graft.store.KvTable.Region.maxStamp]]), never scanned for.
  *
  * Contract and scope:
  *  - Rows are emitted with the columns whose cells fall in the window; a
  *    partial-column update streams the touched columns and nulls for the
  *    rest (HBase WAL replication ships changed cells, same semantics).
  *  - Writes must advance past the committed offset to be streamed: a
  *    write stamped ≤ a region's committed high-water mark is invisible to
  *    the stream (standard CDC low-watermark caveat). Default current-time
  *    stamps satisfy this BY CONSTRUCTION: they are assigned registered
  *    ([[graft.store.KvTable.withWriteStamp]]) and offset capture stays
  *    below every registered stamp and below the current millisecond — so
  *    a writer preempted mid-put cannot be stranded behind a faster
  *    neighbor's committed offset. Explicit `timestamp` writes into the
  *    past remain invisible to the stream (the documented trade).
  *  - Deletes stream ONLY under the `tombstones=true` read option, which
  *    appends a `_deleted` boolean column to the schema: each delete marker
  *    in the window emits a key-only row (`_deleted=true`, value columns
  *    null, `_cell_ts` = delete stamp — HBase delete-marker semantics), and
  *    a marker superseded by a newer re-put is suppressed in favor of the
  *    upsert row. Without the option deletes are invisible (upsert-only CDC).
  *  - Filter pushdown and column pruning apply per batch exactly as in
  *    batch scans (key ranges prune regions inside the window).
  *  - [[SupportsTriggerAvailableNow]]: an AvailableNow run pins the target
  *    offset vector at start and drains up to it, so write-then-stream
  *    round trips terminate deterministically.
  *  - Admission control ([[SupportsAdmissionControl]]): the
  *    `maxRowsPerBatch` read option advertises `ReadLimit.maxRows`, and
  *    [[latestOffset]] honors any maxRows limit by cutting the offset
  *    vector at a global stamp whose backlog fits the budget — a stream
  *    restarted after downtime (or first started against a populated
  *    table) drains its backlog in bounded, stamp-ordered chunks instead
  *    of one micro-batch sized like the whole table. Composes with
  *    AvailableNow: the drain still terminates at the pinned target, in
  *    budget-sized steps. */
class GraftMicroBatchStream(catalog: GraftCatalog, opts: GraftOptions,
    requiredSchema: StructType, filters: Array[Filter])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  require(opts.timestamp.isEmpty,
    "the exact-version `timestamp` read option is batch-only; a streaming " +
      "read's version windows are its offsets (minStamp/maxStamp clip the " +
      "stream to a stamp range if needed)")

  private def table = KvStore.table(opts.storeName(catalog))

  @volatile private var availableNowTarget: Option[GraftStreamOffset] = None

  /** Offset capture with the write low-watermark: each region's offset is
    * `min(maxStamp, now − 1, min in-flight stamp − 1)`. The in-flight cap
    * excludes registered default-stamp writes whose cells are not visible
    * yet; the now−1 cap excludes the CURRENT millisecond, so a writer that
    * takes this millisecond's stamp after our capture still lands above
    * the committed offset (wall-clock monotonicity is the one assumption —
    * the same one HBase replication makes). Writes with explicit
    * `timestamp` options keep the class doc's low-watermark caveat. */
  private def liveLatest: GraftStreamOffset = {
    val nowSafe = System.currentTimeMillis() - 1
    GraftStreamOffset(table.regions.map { r =>
      val safe = math.min(r.maxStamp.get(), math.min(nowSafe, r.minInFlight - 1))
      r.index -> safe
    }.toMap)
  }

  /** Before the first write every region sits at Long.MinValue — the same
    * value an empty region's high-water mark reports, so "nothing yet" and
    * "start of history" coincide. */
  override def initialOffset(): Offset =
    GraftStreamOffset(table.regions.map(r => r.index -> Long.MinValue).toMap)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(liveLatest)

  override def getDefaultReadLimit: ReadLimit =
    opts.maxRowsPerBatch.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cap = availableNowTarget.getOrElse(liveLatest)
    maxRowsOf(limit) match {
      case None         => cap
      case Some(budget) => admit(GraftStreamOffset.of(start), cap, budget)
    }
  }

  private def maxRowsOf(limit: ReadLimit): Option[Long] = limit match {
    case r: ReadMaxRows => Some(r.maxRows())
    case c: CompositeReadLimit =>
      c.getReadLimits.collectFirst { case r: ReadMaxRows => r.maxRows() }
    case _ => None
  }

  /** Admission control: largest per-region stamp cut ≤ `cap` whose total
    * backlog stays within `budget` rows. Walks the per-region mutation
    * histograms ([[graft.store.KvTable.Region.mutHist]]) merged in GLOBAL
    * stamp order, so a catch-up drains oldest-mutations-first across all
    * regions — replaying history in write order rather than letting one
    * region race ahead. Whole stamps admit atomically (every mutation at
    * the cut stamp lands in the same batch) and only when they FIT the
    * remaining budget, so a batch never exceeds `budget` — except the
    * first pending stamp, which always admits even when larger than the
    * budget (the progress guarantee that keeps a stream from stalling on
    * a burst). Cost is
    * O(distinct stamps in the window): stamps are millisecond-resolution,
    * so histograms are bounded by active wall-clock ms, never row count. */
  private def admit(start: GraftStreamOffset, cap: GraftStreamOffset,
      budget: Long): GraftStreamOffset = {
    import scala.jdk.CollectionConverters._
    // one entry per GLOBAL stamp (same-stamp mutations across regions sum):
    // the cut applies to every region at once, so the whole global stamp is
    // the atomic admission unit — admitting it partially is impossible
    val pending = table.regions.iterator.flatMap { r =>
      val lo = start.stamps.getOrElse(r.index, Long.MinValue)
      val hi = cap.stamps.getOrElse(r.index, Long.MinValue)
      if (hi <= lo) Iterator.empty
      else r.mutHist.subMap(Long.box(lo), false, Long.box(hi), true)
        .entrySet().iterator().asScala
        .map(e => (e.getKey.longValue(), e.getValue.sum()))
    }.toSeq.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toArray.sortBy(_._1)
    var remaining = budget
    var cut = Long.MinValue
    var admitted = 0
    var fits = true
    while (admitted < pending.length && fits) {
      val (stamp, n) = pending(admitted)
      // whole stamps only, within budget; the FIRST stamp always admits
      if (admitted > 0 && n > remaining) fits = false
      else { cut = stamp; remaining -= n; admitted += 1 }
    }
    if (admitted == pending.length) cap // whole backlog fits — drain to cap
    else GraftStreamOffset(cap.stamps.map { case (ri, hi) =>
      ri -> math.max(start.stamps.getOrElse(ri, Long.MinValue), math.min(hi, cut))
    })
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = liveLatest

  override def deserializeOffset(json: String): Offset = GraftStreamOffset.parse(json)

  /** Offsets are derived from store state that survives independently of
    * the query (the stamps ARE the data), so nothing to clean up. */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = GraftStreamOffset.of(start).stamps
    val e = GraftStreamOffset.of(end).stamps
    implicit val ord: Ordering[Array[Byte]] = BytesUtil.byteArrayOrdering
    val hrf = FilterCompiler.compileAll(catalog, filters.toSeq)
    table.regionInfos.flatMap { r =>
      val lo = s.getOrElse(r.index, Long.MinValue)
      val hi = e.getOrElse(r.index, Long.MinValue)
      if (hi <= lo) None // region unchanged in this window — no partition
      else {
        val regionRange = ScanRange[Array[Byte]](
          Bound(r.start, inclusive = true), Bound(r.end, inclusive = false))
        val clipped = ScanRange.and(hrf.ranges, Seq(regionRange))
        if (clipped.isEmpty) None
        else {
          // stamp window (lo, hi] as a [min, max) TimeRange, intersected
          // with any user-supplied minStamp/maxStamp clip on the options
          val winMin = math.max(
            if (lo == Long.MinValue) Long.MinValue else lo + 1,
            opts.minStamp.getOrElse(0L))
          val winMax = math.min(
            if (hi == Long.MaxValue) Long.MaxValue else hi + 1,
            opts.maxStamp.getOrElse(Long.MaxValue))
          val batchOpts = opts.copy(timestamp = None,
            minStamp = Some(winMin), maxStamp = Some(winMax))
          Some(GraftInputPartition(catalog, batchOpts, r.index, r.host,
            clipped.map(SerializableRange.from), hrf.pred,
            requiredSchema,
            tombstoneWindow = if (opts.tombstones)
              Some(graft.store.TimeRange(winMin, winMax)) else None): InputPartition)
        }
      }
    }.toArray
  }

  /** Same factory as batch reads: the partitions are ordinary time-range
    * scans, so the row and columnar readers (and their scan metrics) are
    * shared with the batch path. */
  override def createReaderFactory(): PartitionReaderFactory = new GraftReaderFactory
}
