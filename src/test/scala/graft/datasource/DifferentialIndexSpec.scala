package graft.datasource

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.store.KvStore

/** DIFFERENTIAL sweep of the var-width (terminated) index algebra: every
  * comparison shape over an adversarial value/key population, each run
  * through THREE plans — index-only scan, point-get consult, and the
  * opt-in distributed semi-join — and checked against a locally computed
  * oracle. The population is built to hit every boundary the terminator
  * exists for: empty strings, prefix chains ("a" < "ab" < "abc"),
  * negative bigint keys (0xFF… key bytes), NULL values (no index entry),
  * and values adjacent in byte space ("b" vs "ba").
  */
class DifferentialIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  private val catalogJson =
    """{"table":{"namespace":"default", "name":"difftab"},
      |"rowkey":"key",
      |"columns":{
      |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"name":{"cf":"f", "col":"n", "type":"string", "index":"true"},
      |"note":{"cf":"f", "col":"o", "type":"string"}}}""".stripMargin

  // prefix chains + byte-adjacent values + empty string + NULL; keys span
  // negative (0xFF-leading encodings) and positive space deterministically
  private val alphabet: Seq[String] =
    Seq("", "a", "ab", "abc", "abd", "ac", "b", "ba", "bb", "z", "zz", null)

  private val rows: Seq[(Long, String)] = (0 until 240).map { i =>
    val key = (i - 120).toLong // negative half encodes with high bytes
    (key, alphabet(i % alphabet.size))
  }

  private lazy val populated: Unit = {
    import spark.implicits._
    rows.map { case (k, v) => (k, v, s"note$k") }
      .toDF("key", "name", "note").write.format("graft-kv")
      .options(Map("catalog" -> catalogJson, "newtable" -> "4",
        "timestamp" -> "100"))
      .mode("overwrite").save()
  }

  private def read(extra: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("graft-kv")
      .options(Map("catalog" -> catalogJson) ++ extra).load()

  /** (description, Spark predicate, local oracle over non-null values). */
  private def predicates: Seq[(String, Column, String => Boolean)] = {
    val bounds = Seq("", "a", "ab", "abc", "ac", "b", "ba", "c", "zz")
    bounds.flatMap { b =>
      Seq[(String, Column, String => Boolean)](
        (s"= '$b'",  col("name") === b,      v => v == b),
        (s"< '$b'",  col("name") < b,        v => v < b),
        (s"<= '$b'", col("name") <= b,       v => v <= b),
        (s"> '$b'",  col("name") > b,        v => v > b),
        (s">= '$b'", col("name") >= b,       v => v >= b),
        (s"startsWith '$b'", col("name").startsWith(b), v => v.startsWith(b)))
    } ++ Seq[(String, Column, String => Boolean)](
      ("between a/ac", col("name").between("a", "ac"),
        v => v >= "a" && v <= "ac"),
      ("between ab/ba", col("name").between("ab", "ba"),
        v => v >= "ab" && v <= "ba"),
      ("isin a,abc,ba,zz", col("name").isin("a", "abc", "ba", "zz"),
        v => Set("a", "abc", "ba", "zz")(v)),
      ("in-or-range", col("name").isin("ab", "b") || col("name") > "z",
        v => v == "ab" || v == "b" || v > "z"))
  }

  private def expectedKeys(p: String => Boolean): Seq[Long] =
    rows.collect { case (k, v) if v != null && p(v) => k }.sorted

  test("every comparison shape matches the oracle on all three index plans") {
    populated
    var checked = 0
    predicates.foreach { case (desc, pred, oracle) =>
      val want = expectedKeys(oracle)
      // 1. index-only ({name, key} projection)
      val ixOnly = read().filter(pred).select("key")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ixOnly == want, s"[$desc] index-only path diverged")
      // 2. point-get consult (note forces the wider projection)
      val consult = read().filter(pred).select("key", "note")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(consult == want, s"[$desc] consult path diverged")
      // 3. distributed semi-join (enabled, tiny cap so the middle band
      // engages wherever the estimate clears it; results must match
      // regardless of whether the rewrite fires)
      spark.conf.set(graft.plans.IndexSemiJoin.EnabledKey, "true")
      try {
        val semi = read(Map("indexLookupCap" -> "2"))
          .filter(pred).select("key", "note")
          .collect().map(_.getLong(0)).sorted.toSeq
        assert(semi == want, s"[$desc] semi-join path diverged")
      } finally spark.conf.unset(graft.plans.IndexSemiJoin.EnabledKey)
      checked += 1
    }
    info(s"$checked predicate shapes × 3 plans, all oracle-equal")
    // NULL values never satisfy a positive comparison and never enter the
    // index — IS NULL must still find them through the main scan
    val nulls = read().filter(col("name").isNull).select("key")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(nulls == rows.collect { case (k, null) => k }.sorted)
  }
}
