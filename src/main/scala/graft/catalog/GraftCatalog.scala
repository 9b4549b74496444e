package graft.catalog

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types._

import graft.types.FieldCoder

/** One column mapping: Spark column ↔ (column family, qualifier) + coder.
  * Reference: core/.../HBaseTableCatalog.scala:72-130 (`Field`).
  */
final case class Field(
    name: String,
    cf: String,
    qual: String,
    typeName: Option[String],
    coderName: String,
    avroSchemaJson: Option[String],
    length: Int,
    /** Global secondary index on this (non-key) column — catalog
      * `"index":"true"` on the column node. Writes through the connector
      * maintain a derived index table keyed `encode(value) ‖ main row key`
      * (see [[graft.datasource.SecondaryIndex]]); selective reads on the
      * column consult it instead of scanning every region. */
    indexed: Boolean = false,
    /** Covered (Phoenix INCLUDE) columns — catalog `"cover":"a,b"` on an
      * indexed column node: their values ride inside each index entry, so
      * projections touching them stay INDEX-ONLY instead of falling back to
      * point gets on the main table. */
    cover: Seq[String] = Nil) extends Serializable {

  val isRowKey: Boolean = cf == GraftCatalog.RowKeyFamily

  /** Dynamic column: empty qualifier + map type collects all qualifiers of
    * the family (reference HBaseTableScan.scala:97-110). */
  def isDynamic: Boolean = qual.isEmpty && dataType.isInstanceOf[MapType]

  @transient lazy val coder: FieldCoder = avroSchemaJson match {
    case Some(s) => new graft.types.AvroCoder(s)
    case None    => FieldCoder.byName(coderName)
  }

  @transient lazy val dataType: DataType = avroSchemaJson match {
    case Some(s) => graft.types.AvroCoder.sqlTypeFor(s)
    case None    => CatalystSqlParser.parseDataType(typeName.get)
  }

  /** Encoded width: explicit catalog `length`, else the coder's width. */
  def byteWidth: Int = if (length > 0) length else coder.byteWidth(dataType)
}

/** One part of a (possibly composite) row key, with its byte offset.
  *
  * Layout conventions (shared by every key decode/predicate path):
  *  - `offset >= 0`: byte offset from the START of the stored key;
  *    `offset < 0`: from the END (`keyLen + offset`) — parts that FOLLOW a
  *    var-width part, decodable when everything after that part is fixed.
  *  - `width >= 0`: fixed byte width; `width == -1`: to the end of the key
  *    (var-width LAST part); `width < -1`: to the end MINUS `-width - 1`
  *    trailing bytes (a var-width part with a fixed-width tail after it —
  *    the secondary-index entry layout `enc(value) ‖ main key`).
  * Main-table catalogs only ever use `offset >= 0` with at most one
  * var-width LAST part ([[GraftCatalog.validate]]); the extended forms are
  * synthesized for derived index catalogs
  * ([[graft.datasource.SecondaryIndex.indexOnlyCatalog]]). */
final case class RowKeyPart(field: Field, offset: Int, width: Int) extends Serializable {
  /** Resolved start offset of this part within a `keyLen`-byte key. */
  def offsetIn(keyLen: Int): Int = RowKeyPart.offsetIn(offset, width, keyLen)
  /** Resolved byte length of this part within a `keyLen`-byte key. */
  def lengthIn(keyLen: Int): Int = RowKeyPart.lengthIn(offset, width, keyLen)
}

/** THE single implementation of the layout conventions above — every key
  * decode path (materializer, server-side key predicates) resolves a
  * part's (offset, width) against a concrete key length through these, so
  * the conventions can never diverge between decoders. Allocation-free:
  * the callers sit on per-row scan hot paths. */
object RowKeyPart {
  def offsetIn(offset: Int, width: Int, keyLen: Int): Int =
    if (offset < 0) keyLen + offset else offset
  def lengthIn(offset: Int, width: Int, keyLen: Int): Int =
    if (width >= 0) width
    else keyLen - offsetIn(offset, width, keyLen) - (-width - 1)
  /** False when the key is too short for the part. */
  def inBounds(offset: Int, width: Int, keyLen: Int): Boolean = {
    val off = offsetIn(offset, width, keyLen)
    val len = lengthIn(offset, width, keyLen)
    off >= 0 && len >= 0 && off + len <= keyLen
  }
}

/** Parsed catalog: table identity + ordered column map + row key layout.
  * Reference: core/.../HBaseTableCatalog.scala:152-305.
  */
final case class GraftCatalog(
    namespace: String,
    table: String,
    tableCoderName: String,
    fields: Seq[Field],
    rowKeyParts: Seq[RowKeyPart],
    numVersions: Int,
    /** Phoenix-style salt-bucket count (0 = unsalted). When > 0, every
      * stored key is `hash(logical key) % saltBuckets` as ONE prefix byte +
      * the logical key: monotonically increasing keys (event ids, time
      * stamps — the classic region-server hot-spot) spread across
      * `saltBuckets` regions instead of hammering the last one. The salt
      * lives in the catalog JSON (`"table":{"salt":"n"}`) — NOT in per-read
      * options — so every reader/writer of the table agrees by
      * construction; a disagreeing salt would silently mis-decode every
      * key. `RowKeyPart.offset`s are parsed salt-inclusive, so all decode
      * paths (materializer, columnar, key predicates) shift automatically;
      * range pruning fans each logical key range out per salt bucket
      * ([[graft.datasource.FilterCompiler]]). */
    saltBuckets: Int = 0) extends Serializable {

  /** bytes the salt prefix occupies in stored keys */
  def saltLen: Int = if (saltBuckets > 0) 1 else 0

  /** The salt byte of a fully-encoded LOGICAL key (salt excluded):
    * deterministic hash, stable across the library's writers and readers. */
  def saltOf(logicalKey: Array[Byte]): Byte =
    GraftCatalog.saltOf(logicalKey, saltBuckets).toByte

  def qualifiedName: String = s"$namespace:$table"

  def rowKeyFields: Seq[Field] = rowKeyParts.map(_.field)

  def valueFields: Seq[Field] = fields.filterNot(_.isRowKey)

  def field(name: String): Field = fields.find(_.name == name)
    .getOrElse(throw new IllegalArgumentException(s"no column $name in catalog for $table"))

  /** Catalog column order is the DataFrame column order
    * (reference HBaseTableCatalog.scala:152-160). */
  def schema: StructType =
    StructType(fields.map(f => StructField(f.name, f.dataType, nullable = !f.isRowKey)))

  /** Total fixed row-key length, or -1 if the last part is variable. */
  def rowKeyLength: Int = {
    val last = rowKeyParts.last
    if (last.width < 0) -1 else last.offset + last.width
  }

  def families: Seq[String] = valueFields.map(_.cf).distinct

  def hasDynamicFields: Boolean = valueFields.exists(_.isDynamic)

  /** Columns carrying a global secondary index (catalog `"index":"true"`). */
  def indexedFields: Seq[Field] = valueFields.filter(_.indexed)

  private[catalog] def validate(): Unit = {
    rowKeyParts.zipWithIndex.foreach { case (p, i) =>
      val f = p.field
      require(f.coder.preservesOrdering(f.dataType) || f.avroSchemaJson.isDefined,
        s"row-key field ${f.name}: coder ${f.coderName} does not preserve sort order")
      // Only the last key dimension may be variable-length
      // (reference HBaseTableCatalog.scala:184-204).
      if (i < rowKeyParts.size - 1)
        require(p.width > 0,
          s"row-key field ${f.name} is variable-length but not the last key part; " +
            "give it an explicit \"length\"")
    }
    fields.filter(_.indexed).foreach { f =>
      require(!f.isRowKey, s"index on ${f.name}: key parts are already the primary index")
      require(!f.isDynamic, s"index on ${f.name}: dynamic (schema-on-read) columns cannot be indexed")
      require(f.avroSchemaJson.isEmpty, s"index on ${f.name}: Avro columns cannot be indexed")
      require(!(f.dataType == BinaryType && f.byteWidth <= 0),
        s"index on ${f.name}: var-width binary cannot be indexed (binary " +
          "payloads may contain the 0x00 entry terminator) — declare an " +
          "explicit \"length\"")
      f.cover.foreach { c =>
        val cf = fields.find(_.name == c).getOrElse(
          sys.error(s"cover column $c of index ${f.name} is not in the catalog"))
        require(!cf.isRowKey && !cf.isDynamic && cf.avroSchemaJson.isEmpty && c != f.name,
          s"cover column $c of index ${f.name}: must be a plain non-key value column")
      }
    }
    fields.filterNot(_.indexed).foreach(f =>
      require(f.cover.isEmpty, s"${f.name}: \"cover\" requires \"index\":\"true\""))
  }
}

object GraftCatalog {

  val RowKeyFamily = "rowkey"

  /** Salt-bucket assignment shared by the writer ([[GraftCatalog.saltOf]])
    * and the catalog-served V2 salt function
    * ([[graft.datasource.SaltBound]]) — one definition, so the co-location
    * promise the scan reports for storage-partitioned joins is the writer's
    * actual placement by construction. */
  def saltOf(logicalKey: Array[Byte], buckets: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.bytesHash(logicalKey, 0x9747b28c),
      buckets)

  // option keys (reference HBaseTableCatalog.scala:230-255, HBaseRelation.scala:346-363)
  val CatalogOption = "catalog"
  val NewTable = "newtable"
  val MinSplit = "minTableSplitPoint"
  val MaxSplit = "maxTableSplitPoint"
  val MaxVersions = "maxVersions"
  val FamilyMaxVersions = "familyMaxVersions"
  val Timestamp = "timestamp"
  val MinStamp = "minStamp"
  val MaxStamp = "maxStamp"
  val MergeToLatest = "mergeToLatest"
  val Restrictive = "restrictive"

  /** Parse the JSON catalog string. Format (reference
    * HBaseTableCatalog.scala:256-305):
    * {{{
    * {"table":{"namespace":"default","name":"t","tableCoder":"PrimitiveType","version":"2.0"},
    *  "rowkey":"key1:key2",
    *  "columns":{"col0":{"cf":"rowkey","col":"key1","type":"string","length":"6"}, ...}}
    * }}}
    */
  def parse(json: String, options: Map[String, String] = Map.empty): GraftCatalog = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    val tbl = root.get("table")
    require(tbl != null, "catalog is missing \"table\"")
    val namespace = opt(tbl, "namespace").getOrElse("default")
    val name = opt(tbl, "name").getOrElse(sys.error("catalog table has no name"))
    val version = opt(tbl, "version").getOrElse("1.0")
    val tableCoder = opt(tbl, "tableCoder") match {
      case Some(c) => c
      case None =>
        // version >= 2.0 requires an explicit coder (reference :271-286)
        require(version == "1.0", s"catalog version $version requires explicit tableCoder")
        FieldCoder.Primitive
    }

    val rowKeySpec = Option(root.get("rowkey")).map(_.asText())
      .getOrElse(sys.error("catalog is missing \"rowkey\""))
    val keyNames = rowKeySpec.split(":").toSeq

    // salt-bucket count rides the table node so every reader and writer of
    // this catalog string agrees on the key layout (see the field's doc)
    val saltBuckets = opt(tbl, "salt").map(_.toInt).getOrElse(0)
    require(saltBuckets == 0 || (saltBuckets >= 4 && saltBuckets <= 256),
      s"salt=$saltBuckets: bucket count must be 4..256 (one region per bucket, " +
        "and the presplit rule wants at least 4 regions)")

    val colsNode = root.get("columns")
    require(colsNode != null, "catalog is missing \"columns\"")
    val fields = ArrayBuffer[Field]()
    val it = colsNode.fields() // Jackson preserves JSON insertion order
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      fields += Field(
        name = e.getKey,
        cf = c.get("cf").asText(),
        qual = opt(c, "col").getOrElse(""),
        typeName = opt(c, "type"),
        coderName = opt(c, "coder").getOrElse(tableCoder),
        // option keys may be lowercased by Spark's CaseInsensitiveStringMap
        avroSchemaJson = opt(c, "avro").flatMap(k =>
          options.get(k).orElse(options.collectFirst {
            case (ok, ov) if ok.equalsIgnoreCase(k) => ov
          })),
        length = opt(c, "length").map(_.toInt).getOrElse(-1),
        indexed = opt(c, "index").exists(_.toBoolean),
        cover = opt(c, "cover").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
    }

    // row-key byte offsets (reference initRowKey, HBaseTableCatalog.scala:
    // 184-204); parsed SALT-INCLUSIVE so every offset consumer decodes
    // stored keys correctly without knowing about salting
    val keyFields = keyNames.map { kn =>
      fields.find(f => f.isRowKey && f.qual == kn)
        .getOrElse(sys.error(s"rowkey part $kn has no column mapping"))
    }
    var off = if (saltBuckets > 0) 1 else 0
    val parts = keyFields.map { f =>
      val w = f.byteWidth
      val p = RowKeyPart(f, off, w)
      off = if (w < 0) Int.MinValue else off + w
      p
    }

    val cat = GraftCatalog(
      namespace, name, tableCoder,
      fields.toSeq, parts,
      numVersions = options.get(MaxVersions).map(_.toInt).getOrElse(1),
      saltBuckets = saltBuckets)
    cat.validate()
    cat
  }

  private def opt(n: JsonNode, key: String): Option[String] =
    Option(n.get(key)).map(_.asText()).filter(_.nonEmpty)
}
