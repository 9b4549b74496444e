package graft.catalog

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference CatalogSuite assertions (CatalogSuite.scala:45-55):
  * key-length arithmetic and column-order preservation. */
class CatalogSpec extends AnyFunSuite {

  val compositeCatalog: String =
    s"""{"table":{"namespace":"default", "name":"table1", "tableCoder":"PrimitiveType"},
       |"rowkey":"key1:key2",
       |"columns":{
       |"col00":{"cf":"rowkey", "col":"key1", "type":"string", "length":"6"},
       |"col01":{"cf":"rowkey", "col":"key2", "type":"int"},
       |"col1":{"cf":"cf1", "col":"col1", "type":"boolean"},
       |"col2":{"cf":"cf2", "col":"col2", "type":"double"},
       |"col3":{"cf":"cf3", "col":"col3", "type":"float"},
       |"col4":{"cf":"cf4", "col":"col4", "type":"int"},
       |"col5":{"cf":"cf5", "col":"col5", "type":"bigint"},
       |"col6":{"cf":"cf6", "col":"col6", "type":"smallint"},
       |"col7":{"cf":"cf7", "col":"col7", "type":"string"},
       |"col8":{"cf":"cf8", "col":"col8", "type":"tinyint"}}}""".stripMargin

  test("composite key offsets: string(6) + int(4) = 10 bytes") {
    val cat = GraftCatalog.parse(compositeCatalog)
    assert(cat.rowKeyParts.size == 2)
    assert(cat.rowKeyParts(0).offset == 0 && cat.rowKeyParts(0).width == 6)
    assert(cat.rowKeyParts(1).offset == 6 && cat.rowKeyParts(1).width == 4)
    assert(cat.rowKeyLength == 10)
  }

  test("column order preserved from catalog JSON") {
    val cat = GraftCatalog.parse(compositeCatalog)
    assert(cat.schema.fieldNames.toSeq ==
      Seq("col00", "col01", "col1", "col2", "col3", "col4", "col5", "col6", "col7", "col8"))
    assert(cat.schema("col5").dataType == LongType)
    assert(cat.schema("col6").dataType == ShortType)
    assert(cat.schema("col8").dataType == ByteType)
  }

  test("variable-length key part only allowed last") {
    val bad =
      """{"table":{"namespace":"default","name":"t"},
        |"rowkey":"key1:key2",
        |"columns":{
        |"a":{"cf":"rowkey","col":"key1","type":"string"},
        |"b":{"cf":"rowkey","col":"key2","type":"int"},
        |"c":{"cf":"cf1","col":"c","type":"string"}}}""".stripMargin
    assertThrows[IllegalArgumentException](GraftCatalog.parse(bad))
  }

  test("version 2.0 requires explicit tableCoder") {
    val bad =
      """{"table":{"namespace":"default","name":"t","version":"2.0"},
        |"rowkey":"key",
        |"columns":{"a":{"cf":"rowkey","col":"key","type":"string"}}}""".stripMargin
    assertThrows[IllegalArgumentException](GraftCatalog.parse(bad))
  }

  test("dynamic column: empty qualifier + map type") {
    val cat = GraftCatalog.parse(
      """{"table":{"namespace":"default","name":"t"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey","col":"key","type":"string"},
        |"dyn":{"cf":"cf1","col":"","type":"map<string,int>"}}}""".stripMargin)
    val dyn = cat.field("dyn")
    assert(dyn.isDynamic)
    assert(dyn.dataType == MapType(StringType, IntegerType))
  }
}
