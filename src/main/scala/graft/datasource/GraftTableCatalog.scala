package graft.datasource

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.GraftCatalog
import graft.store.KvStore

/** SQL-first surface for the kv engine: a DSv2 `TableCatalog` plugin, so the
  * whole lifecycle runs in plain SQL — no JSON catalog string in user hands:
  *
  * {{{
  * SET spark.sql.catalog.graft = graft.datasource.GraftTableCatalog
  * CREATE TABLE graft.default.t (k BIGINT, v STRING, w DOUBLE)
  *   TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4')
  * INSERT INTO graft.default.t SELECT ...
  * SELECT * FROM graft.default.t WHERE k > 10   -- full pushdown surface
  * DELETE FROM graft.default.t WHERE k < 5      -- SupportsDelete, exact only
  * DROP TABLE graft.default.t
  * }}}
  *
  * The reference has nothing comparable (its DSv1 path is options-only); this
  * is the idiomatic Spark-4 integration. `CREATE TABLE` synthesizes the same
  * JSON catalog the options path uses — `rowkey` (colon-joined field list,
  * default: first column), `family` (default `f`), `length.<field>` for
  * fixed-width composite string key parts — then creates the presplit store
  * table. Table definitions live in a JVM-wide registry (the stand-in for a
  * metastore), like the store itself. */
class GraftTableCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog {

  private var catalogName: String = "graft"

  // ---- FunctionCatalog: serves the salt-bucket transform functions the
  // scan's KeyGroupedPartitioning references, enabling storage-partitioned
  // joins between salted tables (see SaltFunctions)
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespaceExists(namespace))
      SaltFunctions.names.map(Identifier.of(namespace, _)).toArray
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    SaltFunctions.load(ident.name).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident))

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  // registry keys are STRUCTURAL (namespace segments, name) — a dot-joined
  // string would misbucket identifiers whose segments contain dots and make
  // listTables re-split on the wrong boundaries
  private def key(ident: Identifier): (Seq[String], String) =
    (ident.namespace.toSeq, ident.name)

  override def listTables(namespace: Array[String]): Array[Identifier] =
    GraftTableRegistry.entries.keys.toArray.collect {
      case (ns, name) if ns == namespace.toSeq =>
        Identifier.of(namespace, name)
    }

  override def loadTable(ident: Identifier): Table =
    loadWith(ident, identity)

  /** Time travel over the store's MVCC cell stamps (epoch millis):
    * `VERSION AS OF v` reads cells stamped ≤ v (v = a raw store stamp);
    * `TIMESTAMP AS OF t` reads cells stamped ≤ t (Spark hands micros).
    * Both compile to the same time-range scan the `maxStamp` read option
    * uses — latest-version merge as of that instant. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadAsOf(ident, version.toLong + 1)

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    loadAsOf(ident, timestamp / 1000 + 1) // micros → ms, inclusive bound

  private def loadAsOf(ident: Identifier, maxStampExclusive: Long): Table =
    // a fixed-write-stamp table property would conflict with the read-side
    // time range — drop it for the as-of read
    loadWith(ident, props => props - "timestamp" +
      ("minStamp" -> "0", "maxStamp" -> maxStampExclusive.toString))

  private def loadWith(ident: Identifier,
      adapt: Map[String, String] => Map[String, String]): Table =
    GraftTableRegistry.entries.get(key(ident)) match {
      case Some((json, rawProps)) =>
        val props = adapt(rawProps)
        val opts = GraftOptions(new CaseInsensitiveStringMap(
          (props + ("catalog" -> json)).asJava))
        new GraftTable(GraftCatalog.parse(json, props), opts,
          acceptAnySchema = false)
      case None => throw new NoSuchTableException(ident)
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (GraftTableRegistry.entries.contains(key(ident)))
      throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "graft-kv tables shard by row-key range presplits, not partition transforms; " +
        "use TBLPROPERTIES ('numRegions' = 'n')")
    val props = properties.asScala.toMap
    val json = GraftTableCatalog.synthesizeCatalogJson(ident, schema, props)
    val storeProps = props ++ Map(
      "newtable" -> props.getOrElse("numRegions", "4"))
    val opts = GraftOptions(new CaseInsensitiveStringMap(
      (storeProps + ("catalog" -> json)).asJava))
    val catalog = GraftCatalog.parse(json, storeProps)
    GraftDdl.ensureTable(catalog, opts, dropExisting = false)
    GraftTableRegistry.entries.put(key(ident), (json, storeProps))
    new GraftTable(catalog, opts, acceptAnySchema = false)
  }

  /** `ALTER TABLE ADD/DROP/RENAME COLUMN` for NON-KEY columns — all three
    * are schema-on-read-trivial for a KV engine, metadata edits that touch
    * no stored byte:
    *  - ADD maps a fresh qualifier in the value family; rows written before
    *    the alter have no cell there and read back as null.
    *  - DROP hides the qualifier; surviving cells become invisible (and a
    *    later ADD of the same name re-exposes them — HBase semantics, where
    *    re-declaring a column over existing data reads what's stored).
    *  - RENAME changes only the Spark-side name: a `qualifier.<field>`
    *    property pins the column to its ORIGINAL stored qualifier, so data
    *    written before the rename stays readable under the new name.
    * Key changes and type updates are rejected: the row-key layout is the
    * table's physical sort order, so those would need a table rewrite, not
    * a metadata edit. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val (json, props0) = GraftTableRegistry.entries.getOrElse(key(ident),
      throw new NoSuchTableException(ident))
    val catalog = GraftCatalog.parse(json, props0)
    var schema = catalog.schema
    // pin the key list through schema edits: a defaulted rowkey property
    // ("first column") must not drift when columns are added or dropped
    var props = props0 +
      ("rowkey" -> catalog.rowKeyFields.map(_.name).mkString(":"))
    val keyNames = catalog.rowKeyFields.map(_.name)
    def isKey(col: String): Boolean = keyNames.exists(_.equalsIgnoreCase(col))
    val alterOpts = GraftOptions(new CaseInsensitiveStringMap(
      (props0 + ("catalog" -> json)).asJava))
    val mainName = alterOpts.storeName(catalog)
    def indexList: Seq[String] = props.get("index")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          s"ADD COLUMN ${add.fieldNames.mkString(".")}: nested additions are not supported")
        val colName = add.fieldNames.head
        require(!schema.fieldNames.exists(_.equalsIgnoreCase(colName)),
          s"column $colName already exists")
        require(add.isNullable,
          s"ADD COLUMN $colName: new columns must be nullable — rows written " +
            "before the alter have no cell for the new qualifier and read as null")
        require(add.position == null,
          s"ADD COLUMN $colName: FIRST/AFTER positions are not supported " +
            "(columns append; key order is fixed by the rowkey property)")
        schema = schema.add(org.apache.spark.sql.types.StructField(
          colName, add.dataType, nullable = true))
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          s"DROP COLUMN ${del.fieldNames.mkString(".")}: nested drops are not supported")
        val colName = del.fieldNames.head
        val idx = schema.fieldNames.indexWhere(_.equalsIgnoreCase(colName))
        if (idx < 0) require(del.ifExists, s"column $colName does not exist")
        else {
          val actual = schema.fieldNames(idx)
          require(!isKey(actual),
            s"DROP COLUMN $actual: key parts are the table's physical sort " +
              "order — dropping one would need a table rewrite")
          require(schema.fields.length - 1 > keyNames.length,
            s"DROP COLUMN $actual: a table needs at least one value column")
          schema = StructType(schema.fields.patch(idx, Nil, 1))
          props = props - s"qualifier.$actual" - s"length.$actual"
          // indexed column: the derived index table and its maintenance
          // hook die with the column — an orphaned hook would keep writing
          // a dead index on every subsequent mutation
          if (indexList.exists(_.equalsIgnoreCase(actual))) {
            val idxName = SecondaryIndex.indexTableName(mainName, actual)
            if (KvStore.exists(mainName)) KvStore.table(mainName).detachHook(idxName)
            KvStore.drop(idxName)
            val rest = indexList.filterNot(_.equalsIgnoreCase(actual))
            props = if (rest.isEmpty) props - "index"
              else props + ("index" -> rest.mkString(","))
            props = props - s"cover.$actual"
          }
          // scrub the dropped column from other indexes' INCLUDE lists
          // (their entries keep stale covered cells, which readers never
          // request once the catalog stops declaring the cover)
          props = props.flatMap {
            case (k, v) if k.startsWith("cover.") =>
              val kept = v.split(",").map(_.trim)
                .filter(c => c.nonEmpty && !c.equalsIgnoreCase(actual))
              if (kept.isEmpty) None else Some(k -> kept.mkString(","))
            case kv => Some(kv)
          }
        }
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames.length == 1,
          s"RENAME COLUMN ${ren.fieldNames.mkString(".")}: nested renames are not supported")
        val colName = ren.fieldNames.head
        val idx = schema.fieldNames.indexWhere(_.equalsIgnoreCase(colName))
        require(idx >= 0, s"column $colName does not exist")
        val actual = schema.fieldNames(idx)
        require(!isKey(actual),
          s"RENAME COLUMN $actual: key parts are baked into the row-key " +
            "layout — renaming one would need a table rewrite")
        require(!schema.fieldNames.exists(_.equalsIgnoreCase(ren.newName)),
          s"column ${ren.newName} already exists")
        // the stored qualifier stays the ORIGINAL name (or wherever an
        // earlier rename already pinned it) — only the Spark name moves
        val storedQual = props.getOrElse(s"qualifier.$actual", actual)
        props = props - s"qualifier.$actual" +
          (s"qualifier.${ren.newName}" -> storedQual)
        props.get(s"length.$actual").foreach { l =>
          props = props - s"length.$actual" + (s"length.${ren.newName}" -> l)
        }
        schema = StructType(schema.fields.updated(idx,
          schema.fields(idx).copy(name = ren.newName)))
        // indexed column: the index table is named by the Spark-side column
        // name, so it renames along, the old hook id detaches, and the
        // `index`/`cover` TBLPROPERTIES follow — the final `ensure` below
        // re-attaches the maintainer under the new name
        if (indexList.exists(_.equalsIgnoreCase(actual))) {
          val oldIdx = SecondaryIndex.indexTableName(mainName, actual)
          val newIdx = SecondaryIndex.indexTableName(mainName, ren.newName)
          if (KvStore.exists(oldIdx)) KvStore.rename(oldIdx, newIdx)
          if (KvStore.exists(mainName)) KvStore.table(mainName).detachHook(oldIdx)
          props = props + ("index" -> indexList.map(c =>
            if (c.equalsIgnoreCase(actual)) ren.newName else c).mkString(","))
          props.get(s"cover.$actual").foreach { v =>
            props = props - s"cover.$actual" + (s"cover.${ren.newName}" -> v)
          }
        }
        // the renamed column may ride in other indexes' INCLUDE lists
        props = props.map {
          case (k, v) if k.startsWith("cover.") =>
            k -> v.split(",").map { c =>
              if (c.trim.equalsIgnoreCase(actual)) ren.newName else c.trim
            }.mkString(",")
          case kv => kv
        }
      case other => throw new UnsupportedOperationException(
        s"graft-kv supports only ADD/DROP/RENAME COLUMN of non-key columns (got $other): " +
          "the row key layout and existing qualifier bytes are fixed at CREATE TABLE")
    }
    val newJson = GraftTableCatalog.synthesizeCatalogJson(ident, schema, props)
    GraftTableRegistry.entries.put(key(ident), (newJson, props))
    // re-attach maintenance hooks under the post-alter catalog: renamed
    // indexes get their new hook id, and covered-list edits refresh the
    // maintainers' observed-column sets (attach overwrites by id)
    if (KvStore.exists(mainName)) {
      val newCat = GraftCatalog.parse(newJson, props)
      SecondaryIndex.ensure(newCat, GraftOptions(new CaseInsensitiveStringMap(
        (props + ("catalog" -> newJson)).asJava)), droppedMain = false)
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    GraftTableRegistry.entries.remove(key(ident)) match {
      case Some((json, props)) =>
        val opts = GraftOptions(new CaseInsensitiveStringMap(
          (props + ("catalog" -> json)).asJava))
        val cat = GraftCatalog.parse(json, props)
        val mainName = opts.storeName(cat)
        // derived secondary-index tables die with their main table
        cat.indexedFields.foreach(f =>
          KvStore.drop(SecondaryIndex.indexTableName(mainName, f)))
        KvStore.drop(mainName)
        true
      case None => false
    }

  /** `ALTER TABLE ... RENAME TO` — metadata-only end to end: the registry
    * entry re-keys, the catalog JSON re-synthesizes under the new
    * identifier, and the store re-keys its table handle
    * ([[KvStore.rename]]); regions, cells, counters, and streaming offsets
    * ride along untouched. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val (json, props) = GraftTableRegistry.entries.getOrElse(key(oldIdent),
      throw new NoSuchTableException(oldIdent))
    if (GraftTableRegistry.entries.contains(key(newIdent)))
      throw new TableAlreadyExistsException(newIdent)
    val catalog = GraftCatalog.parse(json, props)
    // pin the key list, same reason as alterTable: a defaulted rowkey
    // property must not drift through metadata edits
    val newProps = props +
      ("rowkey" -> catalog.rowKeyFields.map(_.name).mkString(":"))
    val newJson = GraftTableCatalog.synthesizeCatalogJson(
      newIdent, catalog.schema, newProps)
    val opts = GraftOptions(new CaseInsensitiveStringMap(
      (props + ("catalog" -> json)).asJava))
    val oldMain = opts.storeName(catalog)
    val newMain = opts.storeName(GraftCatalog.parse(newJson, newProps))
    KvStore.rename(oldMain, newMain)
    // derived index tables follow the rename, and the main table's hooks
    // re-target the new index names (a hook writing to the orphaned old
    // name while reads consult the new one would silently under-index)
    catalog.indexedFields.foreach { f =>
      val oldIdx = SecondaryIndex.indexTableName(oldMain, f)
      val newIdx = SecondaryIndex.indexTableName(newMain, f)
      if (KvStore.exists(oldIdx)) KvStore.rename(oldIdx, newIdx)
      val t = KvStore.table(newMain)
      t.detachHook(oldIdx)
      t.attachHook(newIdx, new SecondaryIndex.IndexMaintainer(newIdx, f.cf, f.qual,
        f.cover.map { c => val cv = catalog.field(c); (cv.cf, cv.qual) }))
    }
    GraftTableRegistry.entries.remove(key(oldIdent))
    GraftTableRegistry.entries.put(key(newIdent), (newJson, newProps))
  }

  // ---- SupportsNamespaces: registry-backed, single-level (no nesting) ----

  private def nsKey(namespace: Array[String]): Seq[String] = namespace.toSeq

  override def namespaceExists(namespace: Array[String]): Boolean =
    nsKey(namespace) == Seq("default") ||
      GraftTableRegistry.namespaces.contains(nsKey(namespace)) ||
      GraftTableRegistry.entries.keys.exists(_._1 == nsKey(namespace))

  override def listNamespaces(): Array[Array[String]] =
    (GraftTableRegistry.entries.keys.map(_._1).toSet ++
      GraftTableRegistry.namespaces.keys + Seq("default"))
      .toArray.sortBy(_.mkString(".")).map(_.toArray)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // single-level
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace))
      GraftTableRegistry.namespaces.getOrElse(nsKey(namespace), Map.empty).asJava
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    GraftTableRegistry.namespaces.put(nsKey(namespace), metadata.asScala.toMap)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    var meta = GraftTableRegistry.namespaces.getOrElse(nsKey(namespace), Map.empty)
    changes.foreach {
      case set: NamespaceChange.SetProperty => meta += (set.property -> set.value)
      case rm: NamespaceChange.RemoveProperty => meta -= rm.property
      case other => throw new UnsupportedOperationException(s"namespace change $other")
    }
    GraftTableRegistry.namespaces.put(nsKey(namespace), meta)
  }

  /** DROP NAMESPACE; CASCADE drops the namespace's tables (store included),
    * RESTRICT (the default) refuses on a non-empty namespace. */
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val tables = listTables(namespace)
    if (tables.nonEmpty) {
      if (!cascade) throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty (${tables.length} tables); " +
          "use DROP NAMESPACE ... CASCADE")
      tables.foreach(dropTable)
    }
    GraftTableRegistry.namespaces.remove(nsKey(namespace))
    true
  }
}

/** JVM-wide table-definition registry — the metastore stand-in, mirroring
  * how [[graft.store.KvStore]] stands in for the region servers. */
private[datasource] object GraftTableRegistry {
  /** (namespace segments, table name) → (catalog JSON, table properties) */
  val entries = TrieMap[(Seq[String], String), (String, Map[String, String])]()
  /** explicitly created namespaces → their metadata (namespaces implied by
    * existing tables need no entry here) */
  val namespaces = TrieMap[Seq[String], Map[String, String]]()
}

object GraftTableCatalog {

  /** Synthesize the options-path JSON catalog from a SQL CREATE TABLE:
    * `rowkey` property (colon-joined, default first column) marks key
    * fields; everything else maps to the `family` property's column family
    * (default "f") with qualifier = column name. `length.<field>` pins a
    * fixed byte width (required for non-final string key parts). */
  def synthesizeCatalogJson(ident: Identifier, schema: StructType,
      props: Map[String, String]): String = {
    val ns = if (ident.namespace.isEmpty) "default" else ident.namespace.mkString(".")
    val rowkey = props.getOrElse("rowkey", schema.fields.head.name)
    val keyParts = rowkey.split(':').toSeq
    keyParts.foreach { k =>
      require(schema.fieldNames.contains(k), s"rowkey field $k not in schema")
    }
    val family = props.getOrElse("family", "f")
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    }
    // `index` TBLPROPERTY: comma-separated non-key columns that carry a
    // global secondary index (SecondaryIndex) — becomes the per-column
    // "index" flag so JSON-catalog and SQL-DDL tables share one code path
    val indexedCols: Set[String] = props.get("index")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    indexedCols.foreach { c =>
      require(schema.fieldNames.contains(c), s"index column $c not in schema")
    }
    val cols = schema.fields.map { f =>
      val cf = if (keyParts.contains(f.name)) "rowkey" else family
      val len = props.get(s"length.${f.name}")
        .map(l => s""", "length":"${esc(l)}"""").getOrElse("")
      // a `qualifier.<field>` property pins the stored qualifier when it
      // differs from the Spark name (ALTER TABLE RENAME COLUMN keeps data
      // addressed by its original qualifier bytes)
      val qual = props.getOrElse(s"qualifier.${f.name}", f.name)
      // `cover.<col>` TBLPROPERTY → the indexed column's INCLUDE list
      val idx = if (indexedCols.contains(f.name))
        s""", "index":"true"""" + props.get(s"cover.${f.name}")
          .map(v => s""", "cover":"${esc(v)}"""").getOrElse("")
      else ""
      // the catalog parses `type` with CatalystSqlParser — any SQL type
      // string Spark prints round-trips
      s""""${esc(f.name)}":{"cf":"${esc(cf)}", "col":"${esc(qual)}", """ +
        s""""type":"${esc(f.dataType.sql.toLowerCase)}"$len$idx}"""
    }.mkString(",\n")
    // non-final string key parts need a declared width, or the write path
    // can't delimit the composite key — fail at CREATE, not first INSERT
    keyParts.init.foreach { k =>
      val f = schema.fields(schema.fieldIndex(k))
      require(f.dataType != StringType || props.contains(s"length.$k"),
        s"composite key part $k is a string before the last position — " +
          s"declare TBLPROPERTIES ('length.$k' = '<bytes>')")
    }
    // `saltBuckets` TBLPROPERTY → the table node's "salt": the bucket count
    // must live in the catalog JSON itself so every reader/writer agrees on
    // the key layout (see GraftCatalog.saltBuckets)
    val salt = props.get("saltBuckets")
      .map(n => s""", "salt":"${esc(n)}"""").getOrElse("")
    s"""{"table":{"namespace":"${esc(ns)}", "name":"${esc(ident.name)}"$salt},
       |"rowkey":"${esc(rowkey)}",
       |"columns":{
       |$cols}}""".stripMargin
  }
}
