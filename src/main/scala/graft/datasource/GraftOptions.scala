package graft.datasource

import graft.catalog.GraftCatalog
import graft.store.{ColumnSet, TimeRange}

/** Per-relation options (reference HBaseRelation.scala:77-110,346-363 +
  * HBaseTableCatalog.scala:230-255). */
final case class GraftOptions(
    catalogJson: String,
    cluster: String,
    newTable: Int,
    minSplit: String,
    maxSplit: String,
    minSplitNum: Option[Long],
    maxSplitNum: Option[Long],
    timestamp: Option[Long],
    minStamp: Option[Long],
    maxStamp: Option[Long],
    maxVersions: Int,
    familyMaxVersions: Map[String, Int],
    mergeToLatest: Boolean,
    restrictive: String,
    /** streaming-read CDC option: also emit delete tombstones, with a
      * `_deleted` boolean column appended to the schema (see
      * [[GraftMicroBatchStream]]). */
    tombstones: Boolean = false,
    /** streaming-read admission control: advertise
      * `ReadLimit.maxRows(n)` so a catch-up backlog drains in stamp-ordered
      * chunks of ~n rows instead of one unbounded micro-batch (see
      * [[GraftMicroBatchStream.latestOffset]]). */
    maxRowsPerBatch: Option[Long] = None,
    /** Secondary-index consult cap override (`indexLookupCap` option):
      * consults returning more point keys than this fall back to a region
      * scan — at that selectivity a scan beats point-get fan-out. Default
      * [[SecondaryIndex.LookupCap]]. */
    indexLookupCap: Option[Int] = None,
    /** Write-side delete mode (`delete` option): the writer issues a
      * row-level delete tombstone per incoming row's KEY instead of a put —
      * value columns are ignored, so a key-only frame suffices. This is the
      * DISTRIBUTED retirement primitive: a CDC consumer that must drop a
      * data-dependent key set (e.g. an inverted index's old postings)
      * computes the keys as a DataFrame and writes them here, and each
      * writer task deletes against its own region slice — no driver
      * round-trip of the key set, unlike collect + `In`-filter delete. */
    deleteWrite: Boolean = false,
    /** Expert batch-read option (`keyPrefixes`, '\\u0001'-joined UTF-8
      * strings): restrict the scan to rows whose ENCODED row key starts
      * with one of the prefixes, compiled STRAIGHT to ScanRanges at plan
      * time — no Catalyst predicate tree. This is the large-fan-out sliver
      * read ([[graft.queries.StreamBatch.bandIndexLookup]]): a CDC batch's
      * tens of thousands of bucket prefixes as a pushed filter tree would
      * cost tens of seconds of analyzer/optimizer walks per micro-batch,
      * while the same set as ranges is an O(n log n) sort+sweep. Exact
      * EVERYWHERE it is accepted: on salted tables each prefix fans
      * across every salt bucket (bucket byte + prefix ranges). Rejected
      * loudly at plan time when the leading row-key part is not a
      * raw-encoded (non-avro) string — byte prefixes over other
      * encodings would silently select the wrong rows — and when a
      * non-empty value parses to zero prefixes (a silent zero-row scan;
      * a bare empty value falls under the uniform empty-option-means-absent
      * rule instead). */
    keyPrefixes: Option[Seq[String]] = None,
    /** Table-level time-to-live (ms): cells stamped before `now - ttl` are
      * invisible to batch reads (HBase TTL semantics, table-wide rather than
      * per-family). Implemented exactly by folding the TTL window into the
      * scan's time range at plan time ([[GraftScan.planInputPartitions]]) —
      * one `now` snapshot per query, so every partition, predicate, pushed
      * aggregate, and the `_cell_ts` column agree on visibility. Physical
      * removal is a separate, explicit [[graft.store.KvTable.compact]]. */
    ttl: Option[Long] = None) extends Serializable {

  /** TTL folded into the stamp window (identity without `ttl`): reads see
    * `[max(minStamp, now-ttl), maxStamp)`; an exact-version read below the
    * cutoff sees nothing. The returned options carry no `ttl` — resolution
    * happens once, driver-side. */
  def withTtlResolved(now: Long): GraftOptions = ttl match {
    case None => this
    case Some(t) =>
      val cutoff = now - t
      timestamp match {
        case Some(ts) if ts >= cutoff => copy(ttl = None)
        case Some(_) => // exact-version read of an expired stamp: empty window
          copy(timestamp = None, minStamp = Some(1L), maxStamp = Some(0L), ttl = None)
        case None =>
          copy(minStamp = Some(math.max(minStamp.getOrElse(0L), cutoff)), ttl = None)
      }
  }

  /** Store-registry key for this relation. The `cluster` option namespaces
    * the table, so two relations carrying different cluster ids resolve to
    * INDEPENDENT stores even under the same table name — the multi-cluster
    * capability of the reference, where each DataFrame can carry its own
    * `hbaseConfigFile`/`hbaseConfiguration`
    * (HBaseRelation.scala:93-110,360-362;
    * examples JoinTablesFrom2Clusters.scala:101-133). An absent cluster id
    * targets the default cluster. */
  def storeName(catalog: GraftCatalog): String =
    if (cluster.isEmpty) catalog.qualifiedName else s"$cluster#${catalog.qualifiedName}"

  /** HBase time semantics (reference handleTimeSemantics,
    * HBaseTableScan.scala:496-516): exact version XOR time range. */
  def timeRange: Option[TimeRange] = (timestamp, minStamp, maxStamp) match {
    case (Some(ts), None, None) => Some(TimeRange(ts, ts + 1))
    case (None, None, None)     => None
    case (None, lo, hi)         => Some(TimeRange(lo.getOrElse(0L), hi.getOrElse(Long.MaxValue)))
    case _ => throw new IllegalArgumentException(
      "timestamp cannot be combined with minStamp/maxStamp")
  }
}

object GraftOptions {

  def apply(raw: java.util.Map[String, String]): GraftOptions = {
    // normalize to case-insensitive lookup: getTable properties may arrive
    // original-cased while read options come pre-lowercased
    val opts = raw match {
      case m: org.apache.spark.sql.util.CaseInsensitiveStringMap => m
      case m => new org.apache.spark.sql.util.CaseInsensitiveStringMap(m)
    }
    def get(k: String): Option[String] = Option(opts.get(k)).filter(_.nonEmpty)
    GraftOptions(
      catalogJson = get(GraftCatalog.CatalogOption).getOrElse(
        throw new IllegalArgumentException("missing required option \"catalog\"")),
      cluster = get("cluster").getOrElse(""),
      newTable = get(GraftCatalog.NewTable).map(_.toInt).getOrElse(0),
      minSplit = get(GraftCatalog.MinSplit).getOrElse("aaaaaa"),
      maxSplit = get(GraftCatalog.MaxSplit).getOrElse("zzzzzz"),
      minSplitNum = get("minSplitNum").map(_.toLong),
      maxSplitNum = get("maxSplitNum").map(_.toLong),
      timestamp = get(GraftCatalog.Timestamp).map(_.toLong),
      minStamp = get(GraftCatalog.MinStamp).map(_.toLong),
      maxStamp = get(GraftCatalog.MaxStamp).map(_.toLong),
      maxVersions = get(GraftCatalog.MaxVersions).map(_.toInt).getOrElse(1),
      // per-family retention overrides, "cf1=2,cf2=1" (HBase keeps the cap
      // on each HColumnDescriptor; the table-level maxVersions is the
      // default for families not listed)
      familyMaxVersions = get(GraftCatalog.FamilyMaxVersions)
        .map(_.split(",").iterator.map { kv =>
          val Array(cf, n) = kv.split("=", 2)
          cf.trim -> n.trim.toInt
        }.toMap).getOrElse(Map.empty),
      mergeToLatest = get(GraftCatalog.MergeToLatest).forall(_.toBoolean),
      restrictive = get(GraftCatalog.Restrictive).getOrElse("auto").toLowerCase,
      tombstones = get("tombstones").exists(_.toBoolean),
      maxRowsPerBatch = get("maxRowsPerBatch").map(_.toLong),
      indexLookupCap = get("indexLookupCap").map(_.toInt),
      deleteWrite = get("delete").exists(_.toBoolean),
      keyPrefixes = get("keyPrefixes").map { v =>
        // blank entries (a trailing separator) are tolerated, but an
        // ALL-empty set is rejected: it would AND an empty range union
        // into the scan and silently return zero rows where the caller
        // plausibly meant "no restriction"
        val ps = v.split('\u0001').toSeq.filter(_.nonEmpty)
        require(ps.nonEmpty,
          "keyPrefixes is set but contains no non-empty prefix — omit the " +
            "option entirely for an unrestricted scan")
        ps
      },
      ttl = get("ttl").map(_.toLong))
  }
}
