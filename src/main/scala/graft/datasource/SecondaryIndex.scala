package graft.datasource

import org.apache.spark.sql.sources._

import graft.catalog.{Field, GraftCatalog}
import graft.ranges.{Bound, BytesUtil, ScanRange}
import graft.store.{ColumnSet, KvCell, KvStore, RowHook}

/** Global secondary indexes over non-key columns — the Phoenix-style global
  * index the reference connector lacks (its only access path is the row
  * key; every predicate on a value column is a full scan with a server-side
  * filter, reference HBaseFilter.scala:126-407).
  *
  * Layout: one derived table per indexed column, keyed
  * `encode(value) ‖ main row key` (the main key rides the cell value too,
  * so readers never re-parse variable-width prefixes). Maintenance is a
  * store-side [[RowHook]] — the coprocessor model: EVERY mutation path
  * (batch/streaming put, SQL DELETE/UPDATE/MERGE, ranged delete) reports the
  * row's before/after latest state and the hook diffs it into index
  * delete+put, so out-of-band writers can't leave the index stale.
  *
  * Reads consult the index in the scan PLANNER: a selective predicate on an
  * indexed column compiles to value ranges, the planner range-scans the
  * index (a bounded, selectivity-proportional read served region-side at
  * scale), and the main scan collapses to point gets grouped per region.
  * Correctness never depends on the consult: index ranges may
  * over-approximate (value-prefix ranges include longer-string false
  * positives) because the row-level predicate is still evaluated — the
  * library's "ranges prune, predicates decide" invariant. A consult that
  * would return more than [[LookupCap]] keys falls back to the ordinary
  * region scan (at that selectivity a scan beats point-get fan-out anyway).
  *
  * Versioned/time-travel reads never consult: the index reflects CURRENT
  * row state, and a historical read may match rows whose old versions
  * satisfy the predicate while their current value does not.
  */
object SecondaryIndex {

  /** Fallback threshold: more matches than this and the consult declines.
    * Driver-side cost is keys × ~40 bytes; 100k ≈ 4 MB, and beyond that
    * point-get fan-out loses to a straight region scan. */
  val LookupCap = 100000

  def indexTableName(mainStoreName: String, field: Field): String =
    indexTableName(mainStoreName, field.name)

  /** By Spark-side column name — ALTER TABLE paths derive index names for
    * columns being dropped/renamed without re-parsing a catalog. */
  def indexTableName(mainStoreName: String, col: String): String =
    s"${mainStoreName}__idx__$col"

  /** Index-table DDL + hook attach; idempotent, runs with the main table's
    * DDL. `droppedMain=true` (INSERT OVERWRITE / truncate) recreates the
    * index tables too — stale entries of dropped rows must not survive. */
  def ensure(catalog: GraftCatalog, opts: GraftOptions, droppedMain: Boolean): Unit = {
    val indexed = catalog.indexedFields
    if (indexed.isEmpty) return
    val mainName = opts.storeName(catalog)
    val main = KvStore.table(mainName)
    indexed.foreach { f =>
      val idxName = indexTableName(mainName, f)
      if (droppedMain || !KvStore.exists(idxName)) {
        // presplit evenly over the first encoded-value byte: without value
        // statistics a uniform byte split is the neutral choice, and the
        // store's planner prunes per-region ranges either way
        val splits = Seq(Array(0x40.toByte), Array(0x80.toByte), Array(0xc0.toByte))
        KvStore.createTable(idxName, splits, maxVersions = 1, dropExisting = droppedMain)
      }
      main.attachHook(idxName, new IndexMaintainer(idxName, f.cf, f.qual,
        f.cover.map { c => val cf = catalog.field(c); (cf.cf, cf.qual) },
        varWidth = f.byteWidth <= 0))
    }
  }

  /** Entry key layout — unique per (value, row), value-ordered so a value
    * range is a key range. FIXED-width values concatenate directly:
    * `encode(value) ‖ main stored key`. VAR-width values (strings with no
    * declared length) insert a 0x00 TERMINATOR — `encode(value) ‖ 0x00 ‖
    * main stored key` — which makes value order a true ORDER EMBEDDING of
    * entry order: a value sorts strictly BEFORE every extension of itself
    * ("a"‖0x00‖k < "ab"‖…, since 0x00 is the minimal byte), so every
    * comparison bound on the value maps to a TIGHT entry bound with no
    * prefix hazards (without the terminator, a short value's entries
    * escape past any finite bound through their appended main-key bytes —
    * e.g. value "a" with main key 0xFF… sorts above "ac"). The Phoenix
    * VARCHAR contract follows: var-width indexed values must not CONTAIN
    * 0x00 — validated at write ENCODE time (before any state changes,
    * [[GraftWrite]]) and re-checked here on entry INSERTION; entry
    * RETIREMENT (`validate = false`) never throws, so a row whose old
    * value somehow carries a NUL (an out-of-band store writer) can still
    * be updated or deleted instead of being poisoned forever. */
  private[datasource] def entryKey(valueBytes: Array[Byte], mainKey: Array[Byte],
      varWidth: Boolean, validate: Boolean = true): Array[Byte] =
    if (!varWidth) BytesUtil.concat(valueBytes, mainKey)
    else {
      if (validate) {
        var i = 0
        while (i < valueBytes.length) {
          require(valueBytes(i) != 0,
            "var-width indexed values must not contain a 0x00 byte (it is " +
              "the index entry terminator — the Phoenix VARCHAR contract)")
          i += 1
        }
      }
      BytesUtil.concat(valueBytes, Array(0.toByte), mainKey)
    }

  /** The store hook maintaining one column's index: on any change of the
    * observed latest state (the indexed column, or a covered column riding
    * in the entry), retire the stale entry and insert the fresh one. Covered
    * cells carry the RAW stored bytes under their original (cf, qualifier),
    * so the ordinary materializer decodes them with the column's own coder.
    * Index-table mutations go through the ordinary logged put/delete, so
    * WAL replay restores the index without re-firing hooks. */
  final class IndexMaintainer(idxName: String, cf: String, qual: String,
      covered: Seq[(String, String)] = Nil,
      varWidth: Boolean = false) extends RowHook {
    override val cols: Set[(String, String)] = covered.toSet + ((cf, qual))
    override def onMutate(key: Array[Byte],
        before: Map[(String, String), Array[Byte]],
        after: Map[(String, String), Array[Byte]], stamp: Long): Unit = {
      def same(a: Option[Array[Byte]], b: Option[Array[Byte]]): Boolean = (a, b) match {
        case (Some(x), Some(y)) => java.util.Arrays.equals(x, y)
        case (None, None)       => true
        case _                  => false
      }
      if (cols.exists(c => !same(before.get(c), after.get(c)))) {
        val idx = KvStore.table(idxName)
        // delete-then-put covers both shapes: an indexed-value change
        // re-keys the entry (old key dies, new key born), a covered-only
        // change refreshes the SAME key (the delete at `stamp` erases the
        // stale covered cells, the put re-lands the fresh ones at `stamp`)
        before.get((cf, qual)).foreach { v =>
          val ek = entryKey(v, key, varWidth, validate = false)
          idx.registered(ek, stamp)(idx.deleteRow(ek, stamp))
        }
        after.get((cf, qual)).foreach { v =>
          val cells = KvCell("i", "k", stamp, key) +: covered.flatMap { case (ccf, cq) =>
            after.get((ccf, cq)).map(raw => KvCell(ccf, cq, stamp, raw))
          }
          val ek = entryKey(v, key, varWidth)
          idx.registered(ek, stamp)(idx.put(ek, cells))
        }
      }
    }
  }

  /** INDEX-ONLY scan: when the projection and every pushed filter live
    * inside {indexed column, main row-key parts}, the whole query is
    * answerable from the index table as an ORDINARY RANGE SCAN — entry keys
    * are `enc(value) ‖ main key`, which is exactly a composite-key catalog
    * `(value, key parts…)`, so the standard compiler/materializer/columnar
    * machinery runs unchanged against the index regions. No point-get
    * fan-out, no main-table touch: the Phoenix index-only-scan shape, the
    * dominant win at cluster scale.
    *
    * Returned: the synthesized index catalog, or None when any gate fails.
    * Gates err toward None — this path must be EXACT (it replaces the row
    * set, not just pruning):
    *  - fixed-width indexed column on an unsalted table (the entry layout
    *    must parse as composite fixed-offset key parts);
    *  - latest-merge, single-version, no time window (entry stamps are
    *    index-maintenance times, not row cell times);
    *  - no pushed limit/top-N or reverse (their per-partition early-stop
    *    contract is tied to MAIN key order) and no grouped agg pushdown
    *    (the O(1)-state group reader needs group-prefix contiguity, which
    *    index order breaks); global agg partials are order-free and allowed;
    *  - every filter references only index-resident fields and compiles
    *    exactly against the index catalog;
    *  - at least one top-level conjunct constrains the indexed column with
    *    a null-excluding shape, and no filter anywhere tests it for NULL —
    *    rows whose indexed value is null exist in the main table but not in
    *    the index, so only a null-excluding conjunction makes the two row
    *    sets provably equal. */
  def indexOnlyPlan(catalog: GraftCatalog, opts: GraftOptions, filters: Seq[Filter],
      neededFields: Seq[String], groupCols: Seq[String], limited: Boolean):
      Option[GraftCatalog] = {
    if (catalog.saltBuckets != 0 || limited) return None
    if (!opts.mergeToLatest || opts.maxVersions != 1 || opts.timeRange.isDefined ||
      opts.tombstones) return None
    val mainName = opts.storeName(catalog)
    catalog.indexedFields.iterator.flatMap { f =>
      // fixed-width indexed values parse as ordinary fixed-offset composite
      // key parts; a VAR-width value (no declared length — the common
      // string index) is still decodable when the main key is all fixed
      // width: the value's length is the entry length minus the fixed tail
      // (RowKeyPart's negative-offset/width conventions)
      val decodable = f.byteWidth > 0 || catalog.rowKeyLength > 0
      if (!decodable || !f.coder.preservesOrdering(f.dataType)) None
      else if (!KvStore.exists(indexTableName(mainName, f))) None
      else {
        val idxCat = indexOnlyCatalog(catalog, f)
        val names = idxCat.fields.map(_.name).toSet
        // a grouped pushed aggregate streams per-group partials with O(1)
        // state on prefix change, which needs the grouping to be a
        // byte-contiguous PREFIX of the INDEX key order (indexed column
        // first, then main key parts, all order-preserving) — `GROUP BY
        // indexed_col` over a selective filter is the classic shape
        val idxKeyFields = idxCat.rowKeyFields
        // The streaming group reader compares DECODED group values, so
        // grouping works for var-width leading values too: the 0x00 entry
        // terminator keeps each value's entries contiguous (a value sorts
        // strictly before all its byte-extensions), and even a fragmented
        // run would only emit extra partial rows for Spark's final
        // aggregate to merge — exactly as it merges groups spanning
        // region boundaries.
        val groupOk = groupCols.isEmpty || (
          groupCols.length <= idxKeyFields.length &&
          groupCols.zip(idxKeyFields).forall { case (g, kf) =>
            g == kf.name && kf.coder.preservesOrdering(kf.dataType)
          })
        val ok = groupOk &&
          neededFields.forall(names.contains) &&
          filters.forall(_.references.forall(names.contains)) &&
          filters.forall(fl => FilterCompiler.compile(idxCat, fl).handled) &&
          filters.exists(valueRanges(f, _).isDefined) &&
          !filters.exists(mentionsNullTest(_, f.name))
        if (ok) Some(idxCat) else None
      }
    }.nextOption()
  }

  /** The index table seen as an ordinary graft catalog: the indexed column
    * is key part 0, the main key parts follow at shifted offsets, and any
    * covered columns appear as plain value fields (their cells ride in the
    * entries under their original cf/qualifier — see [[IndexMaintainer]]). */
  private[graft] def indexOnlyCatalog(cat: GraftCatalog, f: Field): GraftCatalog = {
    val keyF = f.copy(cf = graft.catalog.GraftCatalog.RowKeyFamily,
      qual = f.name, indexed = false, cover = Nil)
    val w = f.byteWidth
    val parts =
      if (w > 0)
        graft.catalog.RowKeyPart(keyF, 0, w) +:
          cat.rowKeyParts.map(p => graft.catalog.RowKeyPart(p.field, w + p.offset, p.width))
      else {
        // var-width value + all-fixed main key: the value spans the entry
        // minus the 0x00 terminator and the fixed tail (width =
        // -(2 + tail) — trailing = tail + 1 bytes skipped), and the main
        // key parts anchor to the entry's END (negative offsets) — see
        // RowKeyPart's layout conventions and [[entryKey]]
        val tail = cat.rowKeyLength
        require(tail > 0,
          s"var-width index ${f.name} needs an all-fixed-width main row key")
        graft.catalog.RowKeyPart(keyF, 0, -(2 + tail)) +:
          cat.rowKeyParts.map(p =>
            graft.catalog.RowKeyPart(p.field, p.offset - tail, p.width))
      }
    val coveredFields = f.cover.map(c =>
      cat.field(c).copy(indexed = false, cover = Nil))
    GraftCatalog(cat.namespace, s"${cat.table}__idx__${f.name}", cat.tableCoderName,
      (keyF +: cat.rowKeyParts.map(_.field)) ++ coveredFields, parts,
      numVersions = 1, saltBuckets = 0)
  }

  /** Does this filter tree test `name` for null anywhere (IsNull /
    * EqualNullSafe(null) / any such test under Not)? Those are the shapes
    * whose truth differs between the main table (null rows exist) and the
    * index (they don't). */
  private def mentionsNullTest(fl: Filter, name: String): Boolean = fl match {
    case IsNull(a)            => a == name
    case EqualNullSafe(a, v)  => a == name && v == null
    case And(l, r)            => mentionsNullTest(l, name) || mentionsNullTest(r, name)
    case Or(l, r)             => mentionsNullTest(l, name) || mentionsNullTest(r, name)
    case Not(c)               => mentionsNullTest(c, name)
    case _                    => false
  }

  /** Planner consult: if the pushed filters are selective on an indexed
    * column, return the matching MAIN-table point ranges (sorted, deduped)
    * — or None to keep the ordinary scan. Over-approximation is safe (the
    * row predicate still runs); under-approximation would lose rows, so
    * every gate here errs toward None. */
  def lookup(catalog: GraftCatalog, opts: GraftOptions,
      filters: Seq[Filter]): Option[Seq[ScanRange[Array[Byte]]]] = {
    val indexed = catalog.indexedFields
    if (indexed.isEmpty) return None
    // current-state index ⇒ latest-merge single-version reads. A lower
    // stamp bound alone (the TTL window [cutoff, ∞)) stays safe: the
    // newest-in-window cell is either the current cell (the index's view)
    // or expired (row invisible — the point get over-approximates and the
    // time-filtered predicate drops it). An UPPER stamp bound is the unsafe
    // case — a historical read can match rows whose old value satisfied
    // the filter while the current value (the index entry) does not.
    if (!opts.mergeToLatest || opts.maxVersions != 1 ||
      opts.timeRange.exists(_.maxStamp != Long.MaxValue)) return None
    val mainName = opts.storeName(catalog)
    indexed.iterator.flatMap { f =>
      val idxName = indexTableName(mainName, f)
      if (!KvStore.exists(idxName)) None
      else {
        // intersect the value ranges of every top-level (AND-ed) filter
        // that constrains this column
        val perFilter = filters.flatMap(valueRanges(f, _))
        if (perFilter.isEmpty) None
        else {
          implicit val ord: Ordering[Array[Byte]] = BytesUtil.byteArrayOrdering
          val valueRs = perFilter.reduce(ScanRange.and(_, _))
          if (valueRs == Seq(ScanRange.all[Array[Byte]])) None
          else scanIndex(idxName, valueRs, opts.indexLookupCap.getOrElse(LookupCap),
            fixedWidth = f.byteWidth > 0)
        }
      }
    }.nextOption()
  }

  /** (coveredFloor, upperBound) match-count estimates for `valueRs` against
    * the index's O(1) per-region row counters — the logical semi-join
    * rule's gate, O(regions) with zero entry reads. `floor` sums regions
    * FULLY covered by the entry ranges (every row matches); `upper` sums
    * every INTERSECTING region (no row outside them can match). */
  private[graft] def estimateMatches(idxName: String,
      valueRs: Seq[ScanRange[Array[Byte]]], fixedWidth: Boolean): (Long, Long) = {
    implicit val ord: Ordering[Array[Byte]] = BytesUtil.byteArrayOrdering
    val idx = KvStore.table(idxName)
    val entryRs = ScanRange.normalize(valueRs.map(valueToEntryRange(_, fixedWidth)))
    def sameBound(a: Bound[Array[Byte]], b: Bound[Array[Byte]]): Boolean =
      a.inclusive == b.inclusive && ((a.value, b.value) match {
        case (Some(x), Some(y)) => java.util.Arrays.equals(x, y)
        case (None, None)       => true
        case _                  => false
      })
    var floor = 0L; var upper = 0L
    idx.regionInfos.foreach { r =>
      val regionRange = ScanRange[Array[Byte]](
        Bound(r.start, inclusive = true), Bound(r.end, inclusive = false))
      val inter = ScanRange.and(entryRs, Seq(regionRange))
      if (inter.nonEmpty) {
        val c = idx.regions(r.index).rowCount.get()
        upper += c
        val fully = inter match {
          case Seq(one) => sameBound(one.start, regionRange.start) &&
            sameBound(one.end, regionRange.end)
          case _ => false
        }
        if (fully) floor += c
      }
    }
    (floor, upper)
  }

  /** Diagnostic: index entries read by the most recent consult — lets tests
    * assert the selectivity pre-check declined WITHOUT scanning (IndexSpec),
    * and quantifies plan-time consult cost. Driver-side planning state, not
    * a concurrency-safe metric. */
  private[graft] val lastConsultEntriesRead =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Read matching main keys out of the index table; None over `cap`. */
  private def scanIndex(idxName: String, valueRs: Seq[ScanRange[Array[Byte]]],
      cap: Int, fixedWidth: Boolean): Option[Seq[ScanRange[Array[Byte]]]] = {
    implicit val ord: Ordering[Array[Byte]] = BytesUtil.byteArrayOrdering
    val idx = KvStore.table(idxName)
    val entryRs = ScanRange.normalize(valueRs.map(valueToEntryRange(_, fixedWidth)))
    lastConsultEntriesRead.set(0L)
    def sameBound(a: Bound[Array[Byte]], b: Bound[Array[Byte]]): Boolean =
      a.inclusive == b.inclusive && ((a.value, b.value) match {
        case (Some(x), Some(y)) => java.util.Arrays.equals(x, y)
        case (None, None)       => true
        case _                  => false
      })
    // SELECTIVITY PRE-CHECK off the O(1) per-region row counters: an index
    // region FULLY covered by the entry ranges contributes every row it
    // holds, so if the covered total alone exceeds the cap the consult
    // declines after O(regions) counter reads — an unselective range
    // predicate never pays O(cap) index entry reads just to discover it
    // should fall back to the region scan. Boundary regions (partially
    // covered) stay unknown and are charged by the scan below, which keeps
    // the pre-check conservative: it can only decline consults the scan
    // would also have declined.
    var coveredFloor = 0L
    val regionCover = idx.regionInfos.map { r =>
      val regionRange = ScanRange[Array[Byte]](
        Bound(r.start, inclusive = true), Bound(r.end, inclusive = false))
      val inter = ScanRange.and(entryRs, Seq(regionRange))
      val fully = inter match {
        case Seq(one) => sameBound(one.start, regionRange.start) &&
          sameBound(one.end, regionRange.end)
        case _ => false
      }
      if (fully) coveredFloor += idx.regions(r.index).rowCount.get()
      (r, inter)
    }
    if (coveredFloor > cap) return None
    val keys = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    regionCover.foreach { case (r, inter) =>
      inter.foreach { range =>
        val it = idx.scan(r.index, range, ColumnSet.All, None, 1, None)
        while (it.hasNext) {
          if (keys.size > cap) return None
          lastConsultEntriesRead.incrementAndGet()
          it.next().cells.find(c => c.cf == "i" && c.qual == "k")
            .foreach(c => keys += c.value)
        }
      }
    }
    // entry keys are unique per (value, row) and normalized ranges are
    // disjoint, so no key arrives twice — sort once for the planner
    val sorted = keys.sortWith(BytesUtil.compareBytes(_, _) < 0)
    Some(sorted.map(k => ScanRange.point(k)).toSeq)
  }

  /** A closed range in VALUE space → the covering index-key range.
    *
    * FIXED-width values concatenate directly with the main key, so
    * inclusive bounds widen to just past the value prefix (exactly
    * [[FilterCompiler]]'s prefixExpand rule) — exclusive bounds stay
    * tight because fixed-width values have no byte-prefix relationships.
    *
    * VAR-width entries carry the 0x00 TERMINATOR ([[entryKey]]), which
    * makes the mapping an exact order embedding: every value bound maps
    * to a TIGHT entry bound —
    *   start ≥ v  → ≥ v‖0x00 (v's own first entry);
    *   start > v  → ≥ v‖0x01 (past v's entries; extensions of v have a
    *                next byte ≥ 0x01, the no-NUL contract, so none skip);
    *   end   ≤ v  → < v‖0x01;   end < v → < v‖0x00.
    * A value that byte-prefixes the bound sorts (with its terminator)
    * strictly below the bound's own entries, so nothing escapes. */
  private def valueToEntryRange(r: ScanRange[Array[Byte]], fixedWidth: Boolean):
      ScanRange[Array[Byte]] =
    if (!fixedWidth) {
      val start = r.start match {
        case Bound(Some(b), true)  => Bound(Some(BytesUtil.concat(b, Array(0.toByte))), true)
        case Bound(Some(b), false) => Bound(Some(BytesUtil.concat(b, Array(1.toByte))), true)
        case other => other
      }
      val end = r.end match {
        case Bound(Some(b), true)  => Bound(Some(BytesUtil.concat(b, Array(1.toByte))), false)
        case Bound(Some(b), false) => Bound(Some(BytesUtil.concat(b, Array(0.toByte))), false)
        case other => other
      }
      ScanRange(start, end)
    } else {
      val start = r.start match {
        case Bound(Some(b), false) => BytesUtil.prefixUpperBound(b) match {
          case Some(up) => Bound(Some(up), true)
          case None     => Bound(Some(b), false)
        }
        case other => other
      }
      val end = r.end match {
        case Bound(Some(b), true) => BytesUtil.prefixUpperBound(b) match {
          case Some(up) => Bound(Some(up), false)
          case None     => Bound.posInf[Array[Byte]]
        }
        case other => other
      }
      ScanRange(start, end)
    }

  /** Value-space ranges a single filter implies for column `f`, or None if
    * this filter does not constrain `f` exactly enough to prune with.
    * And: one compilable side suffices (superset). Or: both sides must
    * compile (else the union is unbounded). Not/unknown: None. */
  private[graft] def valueRanges(f: Field, filter: Filter): Option[Seq[ScanRange[Array[Byte]]]] = {
    implicit val ord: Ordering[Array[Byte]] = BytesUtil.byteArrayOrdering
    def enc(v: Any): Array[Byte] = f.coder.encode(f.dataType, v)
    filter match {
      case EqualTo(a, v) if a == f.name && v != null =>
        Some(Seq(ScanRange.point(enc(v))))
      case EqualNullSafe(a, v) if a == f.name && v != null =>
        Some(Seq(ScanRange.point(enc(v))))
      case In(a, vs) if a == f.name =>
        // nulls match nothing as a positive filter — drop them; an
        // all-null/empty list matches no rows at all
        Some(ScanRange.normalize(
          vs.filter(_ != null).toSeq.map(v => ScanRange.point(enc(v)))))
      case LessThan(a, v) if a == f.name && v != null =>
        Some(f.coder.lessRanges(f.dataType, v, inclusive = false))
      case LessThanOrEqual(a, v) if a == f.name && v != null =>
        Some(f.coder.lessRanges(f.dataType, v, inclusive = true))
      case GreaterThan(a, v) if a == f.name && v != null =>
        Some(f.coder.greaterRanges(f.dataType, v, inclusive = false))
      case GreaterThanOrEqual(a, v) if a == f.name && v != null =>
        Some(f.coder.greaterRanges(f.dataType, v, inclusive = true))
      case StringStartsWith(a, p) if a == f.name &&
          f.dataType == org.apache.spark.sql.types.StringType =>
        val prefix = p.getBytes("UTF-8")
        Some(Seq(ScanRange(Bound(Some(prefix), inclusive = true),
          BytesUtil.prefixUpperBound(prefix) match {
            case Some(up) => Bound(Some(up), inclusive = false)
            case None     => Bound.posInf[Array[Byte]]
          })))
      case And(l, r) =>
        (valueRanges(f, l), valueRanges(f, r)) match {
          case (Some(a), Some(b)) => Some(ScanRange.and(a, b))
          case (a, b)             => a.orElse(b)
        }
      case Or(l, r) =>
        for { a <- valueRanges(f, l); b <- valueRanges(f, r) }
          yield ScanRange.or(a, b)
      case _ => None
    }
  }
}
