package graft.datasource

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.store.KvStore

/** SQL-first lifecycle through the DSv2 TableCatalog plugin: CREATE TABLE /
  * INSERT INTO / SELECT (with the full pushdown surface) / DELETE FROM /
  * DROP TABLE — no JSON catalog string in user hands. */
class CatalogSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", classOf[GraftTableCatalog].getName)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  test("CREATE / INSERT / SELECT / DELETE / DROP, all in SQL") {
    spark.sql(
      """CREATE TABLE graft.default.sqlt (k BIGINT, name STRING, bal DOUBLE)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '100')""".stripMargin)
    assert(KvStore.exists("default:sqlt"))

    spark.range(1, 101)
      .selectExpr("id AS k", "concat('n', CAST(id AS STRING)) AS name",
        "CAST(id AS DOUBLE) * 1.5 AS bal")
      .createOrReplaceTempView("src")
    spark.sql("INSERT INTO graft.default.sqlt SELECT k, name, bal FROM src")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.sqlt")
      .head().getLong(0) == 100L)

    // pushdown works through the catalog path: key range prunes regions
    val ranged = spark.sql(
      "SELECT k, name FROM graft.default.sqlt WHERE k >= 10 AND k < 20 ORDER BY k")
    assert(ranged.collect().map(_.getLong(0)).toSeq == (10L until 20L))
    assert(ranged.rdd.getNumPartitions < KvStore.table("default:sqlt").regions.size)

    // exact delete: key range + value predicate both compile exactly
    spark.sql("DELETE FROM graft.default.sqlt WHERE k >= 50 AND name LIKE 'n5%'")
    // n50..n59 fall in [50, 60); n5 is below 50 and survives
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.sqlt")
      .head().getLong(0) == 90L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.sqlt WHERE k = 55")
      .head().getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.sqlt WHERE k = 5")
      .head().getLong(0) == 1L)

    assert(spark.sql("SHOW TABLES IN graft.default").collect()
      .map(_.getString(1)).contains("sqlt"))
    spark.sql("DROP TABLE graft.default.sqlt")
    assert(!KvStore.exists("default:sqlt"))
  }

  test("index TBLPROPERTY: SQL-DDL tables get a consulted secondary index; RENAME TO re-targets it") {
    spark.sql(
      """CREATE TABLE graft.default.sqlidx (k BIGINT, owner STRING, v BIGINT)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '100',
        |               'index' = 'owner', 'cover.owner' = 'v')""".stripMargin)
    assert(KvStore.exists("default:sqlidx__idx__owner"))
    spark.sql("INSERT INTO graft.default.sqlidx VALUES (1,'a',10),(2,'b',20),(3,'a',30)")
    val a = spark.sql(
      "SELECT k FROM graft.default.sqlidx WHERE owner = 'a' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(a == Seq(1L, 3L))
    // the covered column rides in the entries (owner is var-width so this
    // stays on the consult path, but the cover list must parse + maintain)
    val av = spark.sql(
      "SELECT k, v FROM graft.default.sqlidx WHERE owner = 'a' ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(av == Seq((1L, 10L), (3L, 30L)))

    // the rename target is catalog-relative (same Spark rule as the rn1/rn2
    // test below: a graft.-prefixed target would nest the catalog name into
    // the namespace)
    spark.sql("ALTER TABLE graft.default.sqlidx RENAME TO default.sqlidx2")
    assert(KvStore.exists("default:sqlidx2__idx__owner"))
    assert(!KvStore.exists("default:sqlidx__idx__owner"))
    // post-rename writes must keep maintaining the RENAMED index
    spark.sql("INSERT INTO graft.default.sqlidx2 VALUES (4,'a',40)")
    val a2 = spark.sql(
      "SELECT k FROM graft.default.sqlidx2 WHERE owner = 'a' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(a2 == Seq(1L, 3L, 4L))

    spark.sql("DROP TABLE graft.default.sqlidx2")
    assert(!KvStore.exists("default:sqlidx2__idx__owner"),
      "index tables die with their main table")
  }

  test("ALTER TABLE DROP/RENAME COLUMN of an indexed column: index follows, no orphan hook") {
    spark.sql(
      """CREATE TABLE graft.default.idxalt (k BIGINT, owner STRING, grade STRING, v BIGINT)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '100',
        |               'index' = 'owner,grade', 'cover.owner' = 'v')""".stripMargin)
    spark.sql("INSERT INTO graft.default.idxalt VALUES " +
      "(1,'a','x',10),(2,'b','y',20),(3,'a','x',30)")
    assert(KvStore.exists("default:idxalt__idx__owner"))
    assert(KvStore.exists("default:idxalt__idx__grade"))

    // RENAME an indexed column: index table renames, hook re-targets
    spark.sql("ALTER TABLE graft.default.idxalt RENAME COLUMN owner TO who")
    assert(KvStore.exists("default:idxalt__idx__who"))
    assert(!KvStore.exists("default:idxalt__idx__owner"))
    val a = spark.sql(
      "SELECT k, v FROM graft.default.idxalt WHERE who = 'a' ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == Seq((1L, 10L), (3L, 30L)))
    // post-rename writes maintain the RENAMED index, not an orphan
    spark.sql("INSERT INTO graft.default.idxalt VALUES (4,'a','y',40)")
    val a2 = spark.sql(
      "SELECT k FROM graft.default.idxalt WHERE who = 'a' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(a2 == Seq(1L, 3L, 4L))

    // DROP an indexed column: derived table dies, hook detaches — a write
    // after the drop must not resurrect the index table
    spark.sql("ALTER TABLE graft.default.idxalt DROP COLUMN grade")
    assert(!KvStore.exists("default:idxalt__idx__grade"),
      "dropping an indexed column must drop its derived index table")
    spark.sql("INSERT INTO graft.default.idxalt VALUES (5,'c',50)")
    assert(!KvStore.exists("default:idxalt__idx__grade"),
      "an orphaned hook must not keep writing a dead index table")
    // the surviving index still consults correctly
    val c = spark.sql(
      "SELECT k FROM graft.default.idxalt WHERE who = 'c'")
      .collect().map(_.getLong(0)).toSeq
    assert(c == Seq(5L))
    spark.sql("DROP TABLE graft.default.idxalt")
    assert(!KvStore.exists("default:idxalt__idx__who"))
  }

  test("INSERT OVERWRITE replaces table contents with fresh presplits") {
    spark.sql(
      """CREATE TABLE graft.default.ovw (k BIGINT, v STRING)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '100')""".stripMargin)
    spark.sql("INSERT INTO graft.default.ovw VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("INSERT OVERWRITE graft.default.ovw VALUES (2, 'B'), (9, 'Z')")
    val rows = spark.sql("SELECT k, v FROM graft.default.ovw ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((2L, "B"), (9L, "Z")))
    spark.sql("DROP TABLE graft.default.ovw")
  }

  test("conditional overwrite is staged: commit installs, failed jobs leave the table untouched") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    spark.sql(
      """CREATE TABLE graft.default.covw (k BIGINT, v STRING)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '100')""".stripMargin)
    spark.sql("INSERT INTO graft.default.covw VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    def contents(): Seq[(Long, String)] =
      spark.sql("SELECT k, v FROM graft.default.covw ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    // success path: delete the matching slice, install the staged rows
    Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
      .writeTo("graft.default.covw").overwrite(col("k") === 2L)
    assert(contents() == Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "Z")))
    // failure path: a task throws mid-write (null row key) — because the
    // delete is deferred to commit and writes go to a staging table, the
    // main table must come through COMPLETELY untouched (the old
    // delete-at-factory-creation behavior lost the k=1 row here)
    intercept[Throwable] {
      Seq((Some(5L), "x"), (Option.empty[Long], "boom")).toDF("k", "v")
        .writeTo("graft.default.covw").overwrite(col("k") === 1L)
    }
    assert(contents() == Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "Z")))
    // no staging leftovers
    assert(!KvStore.exists("default:covw#overwrite-staging"))
    spark.sql("DROP TABLE graft.default.covw")
  }

  test("ALTER TABLE ADD COLUMN: schema-on-read — pre-alter rows read null") {
    spark.sql(
      """CREATE TABLE graft.default.altt (k BIGINT, v STRING)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '100')""".stripMargin)
    spark.sql("INSERT INTO graft.default.altt VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE graft.default.altt ADD COLUMN w DOUBLE")
    // new column resolves, positional INSERT sees the widened schema
    spark.sql("INSERT INTO graft.default.altt VALUES (3, 'c', 3.5)")
    val rows = spark.sql("SELECT k, v, w FROM graft.default.altt ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    assert(rows == Seq((1L, "a", null), (2L, "b", null), (3L, "c", 3.5)))
    // the new qualifier participates in the pushdown surface like any column
    assert(spark.sql("SELECT k FROM graft.default.altt WHERE w > 3.0")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // key mutations are rejected — the row-key layout is physical
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.default.altt DROP COLUMN k")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.default.altt RENAME COLUMN k TO kk")
    }
    // rows survived the rejected alters
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.altt")
      .head().getLong(0) == 3L)
    spark.sql("DROP TABLE graft.default.altt")
  }

  test("ALTER TABLE RENAME / DROP COLUMN: metadata-only, data stays addressed") {
    spark.sql(
      """CREATE TABLE graft.default.rent (k BIGINT, v STRING, w DOUBLE)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '100')""".stripMargin)
    try {
      spark.sql("INSERT INTO graft.default.rent VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
      // rename is metadata-only: pre-rename cells read under the new name
      // because the stored qualifier stays pinned to the original
      spark.sql("ALTER TABLE graft.default.rent RENAME COLUMN v TO label")
      assert(spark.sql("SELECT label FROM graft.default.rent WHERE k = 1")
        .head().getString(0) == "a")
      // writes and pushdown under the new name land on the SAME qualifier
      spark.sql("INSERT INTO graft.default.rent VALUES (3, 'c', 3.5)")
      assert(spark.sql("SELECT k FROM graft.default.rent WHERE label = 'c'")
        .collect().map(_.getLong(0)).toSeq == Seq(3L))
      // a chained rename keeps the ORIGINAL qualifier pinned
      spark.sql("ALTER TABLE graft.default.rent RENAME COLUMN label TO tag")
      assert(spark.sql("SELECT tag FROM graft.default.rent ORDER BY k")
        .collect().map(_.getString(0)).toSeq == Seq("a", "b", "c"))
      // DROP hides the column (cells survive, invisible)
      spark.sql("ALTER TABLE graft.default.rent DROP COLUMN tag")
      assert(!spark.table("graft.default.rent").schema.fieldNames.contains("tag"))
      assert(spark.sql("SELECT count(*) AS n FROM graft.default.rent")
        .head().getLong(0) == 3L)
      // re-ADDing the ORIGINAL name maps the original qualifier, so the
      // surviving cells re-expose — KV schema-on-read, as documented
      spark.sql("ALTER TABLE graft.default.rent ADD COLUMN v STRING")
      assert(spark.sql("SELECT v FROM graft.default.rent ORDER BY k")
        .collect().map(_.getString(0)).toSeq == Seq("a", "b", "c"))
      // the last value column can't be dropped
      spark.sql("ALTER TABLE graft.default.rent DROP COLUMN v")
      intercept[Exception] {
        spark.sql("ALTER TABLE graft.default.rent DROP COLUMN w")
      }
    } finally spark.sql("DROP TABLE graft.default.rent")
  }

  test("ALTER TABLE RENAME TO: registry and store re-key, data rides along") {
    spark.sql(
      """CREATE TABLE graft.default.rn1 (k BIGINT, v STRING)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '100')""".stripMargin)
    spark.sql("INSERT INTO graft.default.rn1 VALUES (1, 'a'), (60, 'b')")
    spark.sql("ALTER TABLE graft.default.rn1 RENAME TO default.rn2")
    try {
      assert(KvStore.exists("default:rn2") && !KvStore.exists("default:rn1"))
      assert(spark.sql("SELECT v FROM graft.default.rn2 ORDER BY k")
        .collect().map(_.getString(0)).toSeq == Seq("a", "b"))
      // pushdown and writes keep working under the new name
      spark.sql("INSERT INTO graft.default.rn2 VALUES (80, 'c')")
      assert(spark.sql("SELECT k FROM graft.default.rn2 WHERE v = 'c'")
        .head().getLong(0) == 80L)
      intercept[Exception](spark.sql("SELECT * FROM graft.default.rn1"))
    } finally spark.sql("DROP TABLE graft.default.rn2")
  }

  test("namespaces: CREATE / SHOW / DROP, RESTRICT refuses non-empty") {
    spark.sql("CREATE NAMESPACE graft.ns1")
    assert(spark.sql("SHOW NAMESPACES IN graft")
      .collect().map(_.getString(0)).contains("ns1"))
    intercept[Exception](spark.sql("CREATE NAMESPACE graft.ns1"))
    spark.sql(
      """CREATE TABLE graft.ns1.t1 (k BIGINT, v STRING)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '100')""".stripMargin)
    spark.sql("INSERT INTO graft.ns1.t1 VALUES (1, 'a')")
    assert(spark.sql("SHOW TABLES IN graft.ns1")
      .collect().map(_.getString(1)).toSeq == Seq("t1"))
    // RESTRICT (the default) refuses a non-empty namespace
    intercept[Exception](spark.sql("DROP NAMESPACE graft.ns1"))
    spark.sql("DROP NAMESPACE graft.ns1 CASCADE")
    assert(!KvStore.exists("ns1:t1"), "CASCADE must drop the namespace's store tables")
    assert(!spark.sql("SHOW NAMESPACES IN graft")
      .collect().map(_.getString(0)).contains("ns1"))
  }

  test("TRUNCATE TABLE empties the store table, fresh presplits included") {
    spark.sql(
      """CREATE TABLE graft.default.trt (k BIGINT, v STRING)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '100')""".stripMargin)
    try {
      spark.sql("INSERT INTO graft.default.trt VALUES (1, 'a'), (60, 'b')")
      spark.sql("TRUNCATE TABLE graft.default.trt")
      assert(spark.sql("SELECT count(*) AS n FROM graft.default.trt")
        .head().getLong(0) == 0L)
      // table stays writable after the truncate
      spark.sql("INSERT INTO graft.default.trt VALUES (7, 'c')")
      assert(spark.sql("SELECT v FROM graft.default.trt").head().getString(0) == "c")
    } finally spark.sql("DROP TABLE graft.default.trt")
  }

  test("composite string key parts need declared widths at CREATE time") {
    val ex = intercept[IllegalArgumentException] {
      spark.sql(
        """CREATE TABLE graft.default.badkey (a STRING, b BIGINT, v DOUBLE)
          |TBLPROPERTIES ('rowkey' = 'a:b')""".stripMargin)
    }
    assert(ex.getMessage.contains("length.a"))
    // with the width declared, the same shape works
    spark.sql(
      """CREATE TABLE graft.default.goodkey (a STRING, b BIGINT, v DOUBLE)
        |TBLPROPERTIES ('rowkey' = 'a:b', 'length.a' = '2')""".stripMargin)
    spark.sql("INSERT INTO graft.default.goodkey VALUES ('aa', 1, 1.0), ('bb', 2, 2.0)")
    assert(spark.sql(
      "SELECT v FROM graft.default.goodkey WHERE a = 'bb' AND b = 2")
      .head().getDouble(0) == 2.0)
    spark.sql("DROP TABLE graft.default.goodkey")
  }

  test("time travel: VERSION AS OF / TIMESTAMP AS OF read the store as of a stamp") {
    import spark.implicits._
    val json =
      """{"table":{"namespace":"default", "name":"ttravel"},
        |"rowkey":"key",
        |"columns":{
        |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"bal":{"cf":"f", "col":"bal", "type":"double"}}}""".stripMargin
    // two stamped generations through the options write path
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "bal").write.format("graft-kv")
      .options(Map("catalog" -> json, "newtable" -> "4", "timestamp" -> "1000",
        "maxVersions" -> "2"))
      .mode("append").save()
    Seq((1L, 11.0), (2L, 21.0)).toDF("k", "bal").write.format("graft-kv")
      .options(Map("catalog" -> json, "timestamp" -> "2000", "maxVersions" -> "2"))
      .mode("append").save()
    GraftTableRegistry.entries.put((Seq("default"), "ttravel"),
      (json, Map("maxVersions" -> "2")))

    def bals(sql: String): Map[Long, Double] = spark.sql(sql).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // current read: generation 2
    assert(bals("SELECT k, bal FROM graft.default.ttravel") ==
      Map(1L -> 11.0, 2L -> 21.0))
    // as of store stamp 1000: generation 1
    assert(bals("SELECT k, bal FROM graft.default.ttravel VERSION AS OF '1000'") ==
      Map(1L -> 10.0, 2L -> 20.0))
    // as of event time 2000 ms (timestamp_millis is timezone-free): gen 2
    assert(bals("SELECT k, bal FROM graft.default.ttravel " +
      "TIMESTAMP AS OF timestamp_millis(2000)") == Map(1L -> 11.0, 2L -> 21.0))
    assert(bals("SELECT k, bal FROM graft.default.ttravel " +
      "TIMESTAMP AS OF timestamp_millis(1500)") == Map(1L -> 10.0, 2L -> 20.0))
    GraftTableRegistry.entries.remove((Seq("default"), "ttravel"))
  }

  test("readStream.table streams a catalog table (CDC through the SQL path)") {
    import org.apache.spark.sql.streaming.Trigger
    spark.sql(
      """CREATE TABLE graft.default.cdc_sqlt (k BIGINT, v STRING)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '100')""".stripMargin)
    try {
      spark.sql("INSERT INTO graft.default.cdc_sqlt VALUES (1, 'a'), (60, 'b')")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-sqlt-ckpt").toString
      val got = scala.collection.mutable.ArrayBuffer[Set[(Long, String)]]()
      def drain(): Unit = {
        val q = spark.readStream.table("graft.default.cdc_sqlt")
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
            if (rows.nonEmpty) got.synchronized { got += rows }
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drain()
      assert(got.last == Set((1L, "a"), (60L, "b")))
      // a second INSERT streams incrementally from the shared checkpoint
      spark.sql("INSERT INTO graft.default.cdc_sqlt VALUES (75, 'c')")
      drain()
      assert(got.last == Set((75L, "c")),
        s"resumed read must emit only the new insert: ${got.last}")
    } finally spark.sql("DROP TABLE graft.default.cdc_sqlt")
  }

  test("non-exact DELETE predicates take the row-level path and delete exactly") {
    spark.sql(
      """CREATE TABLE graft.default.delkeep (k BIGINT, v DOUBLE)
        |TBLPROPERTIES ('rowkey' = 'k')""".stripMargin)
    spark.sql("INSERT INTO graft.default.delkeep VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    // v + 1 > 2 is not a compilable store predicate — the metadata delete
    // steps aside and Spark rewrites into scan → delta write (row-level
    // deletes of exactly the matched keys, never an over-approximated range)
    spark.sql("DELETE FROM graft.default.delkeep WHERE v + 1.0 > 2.0")
    val left = spark.sql("SELECT k FROM graft.default.delkeep ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(left == Seq(1L))
    spark.sql("DROP TABLE graft.default.delkeep")
  }

  test("UPDATE: value predicate, in-place; full-row updates keep version history") {
    spark.sql(
      """CREATE TABLE graft.default.updt (k BIGINT, name STRING, bal DOUBLE)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '10',
        |               'maxVersions' = '2')""".stripMargin)
    spark.sql("INSERT INTO graft.default.updt VALUES " +
      "(1, 'a', 10.0), (2, 'b', 20.0), (3, 'c', 30.0)")
    val preStamp = graft.store.KvStore.table("default:updt")
      .regions.map(_.maxStamp.get()).max

    spark.sql("UPDATE graft.default.updt SET bal = bal + 1.0, name = upper(name) " +
      "WHERE bal >= 20.0")
    val rows = spark.sql("SELECT k, name, bal FROM graft.default.updt ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, "a", 10.0), (2L, "B", 21.0), (3L, "C", 31.0)))

    // the update covered every value column → pure put: pre-update versions
    // stay readable under time travel (HBase put semantics)
    val asOf = spark.sql(
      s"SELECT k, name, bal FROM graft.default.updt VERSION AS OF '$preStamp' ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(asOf == Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))

    // a key-column assignment MOVES the row: old identity deleted, new key
    // put — and the delete@T / put@T+1 stamp split keeps a key-shifting
    // UPDATE race-safe across tasks
    spark.sql("UPDATE graft.default.updt SET k = k + 1 WHERE k >= 1")
    val shifted = spark.sql("SELECT k, name FROM graft.default.updt ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(shifted == Seq((2L, "a"), (3L, "B"), (4L, "C")))
    spark.sql("DROP TABLE graft.default.updt")
  }

  test("UPDATE SET NULL reads back null — no stale cell leaks through latest-merge") {
    spark.sql(
      """CREATE TABLE graft.default.updnull (k BIGINT, a STRING, b DOUBLE)
        |TBLPROPERTIES ('rowkey' = 'k')""".stripMargin)
    spark.sql("INSERT INTO graft.default.updnull VALUES (1, 'x', 1.5), (2, 'y', 2.5)")
    spark.sql("UPDATE graft.default.updnull SET a = NULL WHERE k = 1")
    val rows = spark.sql("SELECT k, a, b FROM graft.default.updnull ORDER BY k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, None, 1.5), (2L, Some("y"), 2.5)))
    spark.sql("DROP TABLE graft.default.updnull")
  }

  test("key-changing UPDATE / MERGE insert onto an existing key: no stale-cell leak") {
    spark.sql(
      """CREATE TABLE graft.default.updmove (k BIGINT, a STRING, b DOUBLE)
        |TBLPROPERTIES ('rowkey' = 'k')""".stripMargin)
    try {
      spark.sql("INSERT INTO graft.default.updmove VALUES (1, 'x', 1.5), (2, 'y', 2.5)")
      // the moved row lands ON k=2 with a NULL; k=2's old a='y' must not
      // bleed through the null under latest-merge reads
      spark.sql("UPDATE graft.default.updmove SET k = 2, a = NULL WHERE k = 1")
      val rows = spark.sql("SELECT k, a, b FROM graft.default.updmove ORDER BY k")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSeq
      assert(rows == Seq((2L, None, 1.5)),
        s"destination row must not leak its pre-update cells: $rows")
      // MERGE NOT MATCHED upserting a null column onto an existing key has
      // the same hazard on the DELTA path (a matched action forces
      // WriteDelta; an insert-only merge rewrites to the plain append,
      // whose put-over-existing upsert is the documented KV semantic)
      spark.sql("INSERT INTO graft.default.updmove VALUES (5, 'z', 9.5)")
      spark.sql("SELECT 5 AS k, CAST(NULL AS STRING) AS a, 7.5 AS b")
        .createOrReplaceTempView("updmove_src")
      spark.sql(
        """MERGE INTO graft.default.updmove t USING updmove_src s ON t.k = s.k + 100
          |WHEN MATCHED THEN UPDATE SET b = s.b
          |WHEN NOT MATCHED THEN INSERT (k, a, b) VALUES (s.k, s.a, s.b)""".stripMargin)
      val merged = spark.sql("SELECT a, b FROM graft.default.updmove WHERE k = 5")
        .collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toSeq
      assert(merged == Seq((None, 7.5)),
        s"MERGE insert onto an existing key must not leak its old cells: $merged")
    } finally spark.sql("DROP TABLE graft.default.updmove")
  }

  test("DELETE plans: exact predicates go metadata-only, residuals go row-level") {
    spark.sql(
      """CREATE TABLE graft.default.delplan (k BIGINT, v DOUBLE)
        |TBLPROPERTIES ('rowkey' = 'k')""".stripMargin)
    try {
      // fully-compilable predicate: the metadata delete (no scan, no write
      // job) — the O(ranges) store-side path
      val exact = spark.sql(
        "EXPLAIN FORMATTED DELETE FROM graft.default.delplan WHERE k < 5")
        .head().getString(0)
      assert(exact.contains("DeleteFromTable") && !exact.contains("WriteDelta"),
        s"exact delete must stay metadata-only:\n$exact")
      // residual predicate: rewritten into scan -> delta write
      val residual = spark.sql(
        "EXPLAIN FORMATTED DELETE FROM graft.default.delplan WHERE v + 1.0 > 2.0")
        .head().getString(0)
      assert(residual.contains("WriteDelta"),
        s"residual delete must take the row-level path:\n$residual")
    } finally spark.sql("DROP TABLE graft.default.delplan")
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert") {
    spark.sql(
      """CREATE TABLE graft.default.mrg (k BIGINT, v STRING, n BIGINT)
        |TBLPROPERTIES ('rowkey' = 'k', 'numRegions' = '4',
        |               'minSplitNum' = '0', 'maxSplitNum' = '10')""".stripMargin)
    spark.sql("INSERT INTO graft.default.mrg VALUES " +
      "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    spark.range(0, 5).selectExpr("id AS k", "concat('s', CAST(id AS STRING)) AS v",
      "id * 100 AS n").createOrReplaceTempView("mrg_src")

    spark.sql(
      """MERGE INTO graft.default.mrg t USING mrg_src s ON t.k = s.k
        |WHEN MATCHED AND s.k = 2 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v, n = t.n + s.n
        |WHEN NOT MATCHED AND s.k > 0 THEN INSERT (k, v, n) VALUES (s.k, s.v, s.n)
        |""".stripMargin)

    val rows = spark.sql("SELECT k, v, n FROM graft.default.mrg ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // 1,3 matched-updated; 2 matched-deleted; 4 not-matched-inserted
    // (0 excluded by the insert guard); source rows beyond 4 don't exist
    assert(rows == Seq((1L, "s1", 110L), (3L, "s3", 330L), (4L, "s4", 400L)))
    spark.sql("DROP TABLE graft.default.mrg")
  }
}
