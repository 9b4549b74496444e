package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ranges.ScanRange

/** TTL visibility ([[graft.datasource.GraftOptions.withTtlResolved]]) and
  * physical compaction ([[KvTable.compact]]). */
class CompactionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  import spark.implicits._

  private val catalogJson =
    """{"table":{"namespace":"default", "name":"ttltab"},
      |"rowkey":"key",
      |"columns":{
      |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"v":{"cf":"f", "col":"v", "type":"string"}}}""".stripMargin

  private def write(rows: Seq[(Long, String)], ts: Long): Unit =
    rows.toDF("key", "v").write.format("graft-kv")
      .options(Map("catalog" -> catalogJson, "newtable" -> "4",
        "minSplitNum" -> "0", "maxSplitNum" -> "100", "timestamp" -> ts.toString))
      .mode("append").save()

  private def readTtl(ttlMs: Long) = spark.read.format("graft-kv")
    .option("catalog", catalogJson).option("ttl", ttlMs.toString).load()

  private def readPlain = spark.read.format("graft-kv")
    .option("catalog", catalogJson).load()

  test("ttl reads hide expired cells; predicates cannot resurrect them") {
    val now = System.currentTimeMillis()
    write(Seq((1L, "old"), (2L, "old")), ts = 1000L)       // epoch-ancient
    write(Seq((2L, "new"), (3L, "new")), ts = now)
    val tenYears = 10L * 365 * 24 * 3600 * 1000

    // plain read: all three rows, key 2 latest-merged to "new"
    assert(readPlain.count() == 3)
    // ttl read: key 1's only cell is expired -> the row is gone entirely
    val visible = readTtl(tenYears).collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(visible.toSeq == Seq((2L, "new"), (3L, "new")))
    // an exact predicate on the expired value must not match (the window is
    // part of the scan, so the store predicate never sees the old cell)
    assert(readTtl(tenYears).filter(col("v") === "old").count() == 0)
  }

  test("compact physically drops expired cells and empty rows, reads unchanged") {
    val tenYears = 10L * 365 * 24 * 3600 * 1000
    val pre = readTtl(tenYears).collect().map(_.toSeq).toSet
    val table = KvStore.table("default:ttltab")
    val preRows = table.regions.map(_.rowCount.get()).sum
    assert(preRows == 3)

    // key 2's shadowed old version was already discarded at put time by the
    // version cap (maxVersions=1), so only key 1's expired cell remains
    val (cells, rows, _) = table.compact(System.currentTimeMillis() - tenYears)
    assert(cells == 1, s"key 1's cell is the only expired survivor, got $cells")
    assert(rows == 1, s"only key 1 empties out, got $rows")
    assert(table.regions.map(_.rowCount.get()).sum == 2)

    assert(readTtl(tenYears).collect().map(_.toSeq).toSet == pre)
    // post-compact, even a plain read agrees: the space is reclaimed
    assert(readPlain.count() == 2)
  }

  test("compact trims CDC tombstones and admission histogram behind the horizon") {
    val table = KvStore.table("default:ttltab")
    table.delete(Seq(ScanRange.all[Array[Byte]]), None, stamp = 5000L)
    val markersPre = table.regionInfos.map(r =>
      table.tombstonesIn(r.index, ScanRange.all[Array[Byte]],
        TimeRange(Long.MinValue, Long.MaxValue)).size).sum
    assert(markersPre >= 2)

    val (_, _, dropped) = table.compact(expireBefore = Long.MinValue, cdcHorizon = 6000L)
    assert(dropped == markersPre)
    val markersPost = table.regionInfos.map(r =>
      table.tombstonesIn(r.index, ScanRange.all[Array[Byte]],
        TimeRange(Long.MinValue, Long.MaxValue)).size).sum
    assert(markersPost == 0)
  }

  test("ttl composes with an explicit stamp window and exact-version reads") {
    val now = System.currentTimeMillis()
    val opts = graft.datasource.GraftOptions(new java.util.HashMap[String, String] {
      put("catalog", catalogJson); put("ttl", "1000")
    })
    val resolved = opts.withTtlResolved(now)
    assert(resolved.ttl.isEmpty)
    assert(resolved.timeRange.get.minStamp == now - 1000)
    // exact-version read of an expired stamp: empty window, not an error
    val exact = opts.copy(timestamp = Some(now - 5000)).withTtlResolved(now)
    assert(exact.timeRange.get.minStamp > exact.timeRange.get.maxStamp)
    // exact-version read of a live stamp passes through untouched
    val live = opts.copy(timestamp = Some(now - 10)).withTtlResolved(now)
    assert(live.timeRange.get == TimeRange(now - 10, now - 9))
  }
}
