package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.GraftCatalog
import graft.datasource.{GraftOptions, GraftTable, SecondaryIndex}
import graft.ranges.{BytesUtil, ScanRange}
import graft.store.KvStore

/** DISTRIBUTED index consult — the cluster-scale replacement for the
  * driver-side [[SecondaryIndex.lookup]] when the matching key set is too
  * large to materialize at plan time but still selective enough to beat a
  * full scan.
  *
  * The driver consult caps at `indexLookupCap` keys (~4 MB) because a
  * plan-time scan of the index on the driver is a per-query RPC storm at
  * cluster scale; past the cap it falls back to the FULL region scan even
  * when only 1% of a 10-billion-row table matches. This rule moves that
  * middle band into the executors:
  *
  * {{{ Filter(cond, main) ==>
  *     Join(Filter(cond, main'), broadcast(Project(keys, Filter(valuePred, idx))), LeftSemi, key = key) }}}
  *
  * - the INDEX side is an ordinary DSv2 relation over the index table (the
  *   same re-keyed catalog the index-only scan uses), so the value
  *   predicate pushes into its scan as a KEY-PREFIX range — the index read
  *   is selectivity-proportional and fully distributed;
  * - the index side carries a BROADCAST hint: the main scan advertises
  *   `SupportsRuntimeFiltering` on its row key, so the broadcast build
  *   side's key set reaches the main scan AT RUNTIME and re-plans it into
  *   pruned regions / point gets — the consult's whole benefit, with the
  *   key set flowing executor→broadcast instead of through query planning;
  * - the original Filter stays directly above the main relation, so
  *   ordinary pushdown (key ranges, residual predicates, column pruning)
  *   is untouched, and the semi-join only ever RESTRICTS — correctness
  *   never rides the index (same contract as the consult).
  *
  * Soundness: rewritten conjuncts reference ONLY the indexed column and
  * compile through [[SecondaryIndex.valueRanges]], whose accepted shapes
  * are all null-rejecting positive predicates — a row with a NULL indexed
  * value (absent from the index) cannot satisfy them, so restricting to
  * index-matched keys loses nothing. The index reflects current state;
  * the same read-option gates as the consult (latest-merge, single
  * version, no historical upper bound) apply.
  *
  * Gating (all O(regions), via [[SecondaryIndex.estimateMatches]] region
  * counters): rewrite only when the estimated match upper bound exceeds
  * the consult cap (below it, the plan-time consult is strictly better —
  * point gets with zero join machinery) and stays under `maxKeys`
  * (above it, the predicate is unselective and the full scan wins). With
  * the consult's own gate this is one automatic THREE-WAY policy, no conf
  * required: estimate ≤ `indexLookupCap` → plan-time point gets;
  * cap < estimate ≤ `maxKeys` → distributed semi-join consult;
  * estimate > `maxKeys` → plain full scan. ON by default; opt out with
  * `spark.graft.index.semiJoin.enabled=false`. Band edges are
  * differential-tested in IndexSemiJoinSpec (exact-cap decline / cap−1
  * accept, exact-maxKeys accept / maxKeys−1 decline).
  * Injected as a PreCBO rule (runs ONCE, after filters have settled onto
  * relations, before join reordering). */
object IndexSemiJoin extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.index.semiJoin.enabled"
  val MaxKeysKey = "spark.graft.index.semiJoin.maxKeys"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val maxKeys = conf.getConfString(MaxKeysKey, "5000000").toLong
    plan.transformUp {
      case f @ Filter(cond, rel: DataSourceV2Relation) =>
        rel.table match {
          case gt: GraftTable if cond.deterministic =>
            rewrite(cond, rel, gt, maxKeys).getOrElse(f)
          case _ => f
        }
    }
  }

  private def rewrite(cond: Expression, rel: DataSourceV2Relation,
      gt: GraftTable, maxKeys: Long): Option[LogicalPlan] = {
    val cat: GraftCatalog = gt.graftCatalog
    val opts: GraftOptions = gt.graftOptions
    if (cat.indexedFields.isEmpty) return None
    // same read-option gates as the plan-time consult: the index mirrors
    // CURRENT state only
    if (!opts.mergeToLatest || opts.maxVersions != 1 ||
      opts.timeRange.exists(_.maxStamp != Long.MaxValue) || opts.tombstones)
      return None
    implicit val ord: Ordering[Array[Byte]] = BytesUtil.byteArrayOrdering
    val conjuncts = splitConjunctivePredicates(cond)
    val mainName = opts.storeName(cat)
    val cap = opts.indexLookupCap.getOrElse(SecondaryIndex.LookupCap)
    cat.indexedFields.iterator.flatMap { field =>
      val idxName = SecondaryIndex.indexTableName(mainName, field)
      // order-preserving layouts whose entries PARSE as a (value, main-key)
      // composite relation: fixed-width values always do; a var-width value
      // (the common string index) does when the main key is all fixed
      // width — the value's length is the entry minus the fixed tail,
      // exactly like the index-only scan (RowKeyPart's negative
      // offset/width conventions)
      val decodable = field.byteWidth > 0 || cat.rowKeyLength > 0
      if (!KvStore.exists(idxName) || !decodable ||
        !field.coder.preservesOrdering(field.dataType)) None
      else rel.output.find(_.name == field.name).flatMap { attr =>
        // conjuncts over the indexed column alone, compiled through the
        // SAME value-range machinery the consult uses (acceptance there
        // guarantees null-rejection and index-key pushability)
        val chosen = conjuncts.filter { c =>
          c.references.toSeq == Seq(attr) && c.deterministic &&
            GraftShim.translateFilter(c)
              .exists(SecondaryIndex.valueRanges(field, _).isDefined)
        }
        val ranges = chosen.flatMap(c =>
          GraftShim.translateFilter(c).flatMap(SecondaryIndex.valueRanges(field, _)))
        if (ranges.isEmpty) None
        else {
          val valueRs = ranges.reduce(ScanRange.and(_, _))
          if (valueRs.isEmpty || valueRs == Seq(ScanRange.all[Array[Byte]])) None
          else {
            val (_, upper) = SecondaryIndex.estimateMatches(idxName, valueRs,
              fixedWidth = field.byteWidth > 0)
            if (upper <= cap || upper > maxKeys) None
            else Some(buildJoin(cond, rel, gt, cat, opts, field, attr, chosen))
          }
        }
      }
    }.nextOption()
  }

  private def buildJoin(cond: Expression, rel: DataSourceV2Relation,
      gt: GraftTable, cat: GraftCatalog, opts: GraftOptions,
      field: graft.catalog.Field, attr: Attribute,
      chosen: Seq[Expression]): LogicalPlan = {
    val idxCat = SecondaryIndex.indexOnlyCatalog(cat, field)
    val idxRel = DataSourceV2Relation.create(
      new GraftTable(idxCat, opts), None, None, CaseInsensitiveStringMap.empty())
    val idxValAttr = idxRel.output.find(_.name == field.name).get
    val idxCond = chosen.map(_.transform {
      case a: AttributeReference if a.exprId == attr.exprId => idxValAttr
    }).reduce[Expression](And(_, _))
    val keyNames = cat.rowKeyFields.map(_.name)
    val mainKeys = keyNames.map(n => rel.output.find(_.name == n).get)
    val idxKeys = keyNames.map(n => idxRel.output.find(_.name == n).get)
    // V2 pushdown consumes every translatable conjunct, leaving the build
    // side Filter-less — and Spark's PartitionPruning only injects the
    // runtime filter when the build side still LOOKS selective
    // (hasSelectivePredicate scans for a Filter whose condition is
    // likely-selective). This self-comparison is untranslatable (column vs
    // column never becomes a source filter) yet a BinaryComparison, so it
    // survives pushdown purely to carry that signal; it evaluates true for
    // every index entry (entry values are never null) at one comparison
    // per already-filtered index row.
    val dppGuard = EqualTo(idxValAttr, idxValAttr)
    val right = Project(idxKeys, Filter(And(idxCond, dppGuard), idxRel))
    val joinCond = mainKeys.zip(idxKeys)
      .map { case (a, b) => EqualTo(a, b): Expression }.reduce(And(_, _))
    // the filter stays DIRECTLY above the (consult-disabled) relation so
    // scan pushdown is untouched; LeftSemi commutes with it
    val mainSide = Filter(cond, relWithoutConsult(rel, gt))
    Join(mainSide, right, LeftSemi, Some(joinCond),
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
  }

  /** The main relation with its plan-time consult disabled — the lookup
    * now happens distributed; a driver consult would duplicate it. Reads
    * that carry per-read options (a `catalog` key) resolve options at scan
    * build, so those override via the relation's option map; SQL-catalog
    * reads resolve from the table instance. */
  private def relWithoutConsult(rel: DataSourceV2Relation,
      gt: GraftTable): DataSourceV2Relation =
    if (rel.options.containsKey("catalog")) {
      val m = new java.util.HashMap[String, String](rel.options)
      m.put("indexLookupCap", "0")
      rel.copy(options = new CaseInsensitiveStringMap(m))
    } else rel.copy(table = gt.withIndexConsultDisabled)
}
