package graft.datasource

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

import graft.catalog.GraftCatalog
import graft.types.FieldCoder

/** The salt-bucket assignment as a catalog-served V2 function, so Spark can
  * reason about co-location between two salted tables.
  *
  * A salted table's scan reports `KeyGroupedPartitioning(bucket(n, key))`
  * ([[GraftScan.outputPartitioning]]); Spark resolves the `bucket` transform
  * by loading this function from the table's catalog
  * ([[GraftTableCatalog.loadFunction]]) and then plans storage-partitioned
  * joins: two salted tables with the same bucket count joined on their row
  * key need NO shuffle — bucket i of one side can only match bucket i of
  * the other, exactly like a pre-bucketed Hive table pair, but derived from
  * the store's physical layout. At 100 TB this removes the dominant cost of
  * a kv × kv join (shuffling both sides).
  *
  * Catalyst accepts only single-reference transforms in a key-grouped
  * partitioning (`KeyGroupedPartitioning.supportsExpressions`), so the
  * standard `bucket(n, key)` shape is the one that works: the bucket count
  * travels as the transform's `numBuckets`, not a child, and the single
  * child is the key reference. Two consequences, both enforced at the
  * reporting site ([[GraftScan.outputPartitioning]]):
  *
  *  - single-column row keys only (a composite key would need a
  *    multi-reference transform);
  *  - [[FieldCoder.Primitive]]-coded keys only: the salt byte is
  *    `murmur3(encoded key) % n` ([[GraftCatalog.saltOf]]), so the coder is
  *    part of the function's semantics — this bound function's
  *    `canonicalName` says so, and serving it for a differently-coded table
  *    would falsely co-locate keys that salt into different buckets.
  *
  * Evaluation (`produceResult`) replays the writer's placement exactly:
  * `coder.encode` then the same seeded murmur.
  */
private[graft] object SaltFunctions {

  /** The transform/function name served for a table whose single key part
    * uses `coderName`; None = no co-location function for that coder. */
  def nameFor(coderName: String): Option[String] = coderName match {
    case FieldCoder.Primitive => Some("bucket")
    case _                    => None
  }

  def load(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(new SaltUnbound)
    case _        => None
  }

  val names: Seq[String] = Seq("bucket")
}

private[graft] final class SaltUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, key): salt bucket of the PrimitiveType-encoded key"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
        inputType.fields.head.dataType == IntegerType,
      s"bucket expects (numBuckets INT, key); got $inputType")
    new SaltBound(inputType.fields(1).dataType)
  }
}

private[graft] final class SaltBound(keyType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  /** SPJ compatibility compares this across the two join sides — the coder
    * is part of the identity (see class doc); bucket-count identity rides
    * the transform's numBuckets. */
  override def canonicalName(): String =
    s"graft.salt.${FieldCoder.Primitive}"
  override def isResultNullable: Boolean = false

  @transient private lazy val coder: FieldCoder =
    FieldCoder.byName(FieldCoder.Primitive)

  override def produceResult(input: InternalRow): Integer = {
    // with v2.bucketing.shuffle.enabled Spark evaluates this over the
    // NON-kv join side's rows, where a nullable key that survives
    // null-inference (e.g. the preserved side of an outer join) arrives as
    // null. A null key matches no stored row, so any deterministic bucket
    // is correct — use 0 rather than NPE-ing the task.
    if (input.isNullAt(1)) return Int.box(0)
    val v = CatalystConv.fromCatalyst(keyType, input.get(1, keyType))
    Int.box(GraftCatalog.saltOf(coder.encode(keyType, v), input.getInt(0)))
  }
}
