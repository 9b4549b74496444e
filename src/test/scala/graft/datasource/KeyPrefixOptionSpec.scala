package graft.datasource

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.store.KvStore

/** Differential guard for the `keyPrefixes` read option: for RANDOM prefix
  * sets over a corpus of random var-length string keys (ASCII + multi-byte
  * UTF-8, adjacent/nested prefixes, keys shorter than prefixes, prefixes
  * matching nothing), the option-restricted read must return EXACTLY the
  * rows whose key startsWith one of the prefixes — the string-prefix ⟺
  * UTF-8-byte-prefix equivalence the option's range compilation relies
  * on, plus the sort+sweep union of overlapping prefix ranges. Seeded, so
  * failures reproduce. An over-approximation here would be a silent
  * handled=true wrong answer (the option has no Spark-side residual). */
class KeyPrefixOptionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  private val catalog =
    """{"table":{"namespace":"default", "name":"prefdiff"},
      |"rowkey":"key",
      |"columns":{
      |"ik":{"cf":"rowkey", "col":"key", "type":"string"},
      |"n":{"cf":"f", "col":"n", "type":"bigint"}}}""".stripMargin

  // alphabet mixes ASCII with 2- and 3-byte UTF-8 codepoints so byte-prefix
  // boundaries land mid-codepoint-sequence if the equivalence were wrong
  private val alpha = "abz09:ßñ漢".toCharArray

  private def randKey(r: scala.util.Random): String =
    (0 until (1 + r.nextInt(8))).map(_ => alpha(r.nextInt(alpha.length))).mkString

  test("random prefix sets: option read == client-side startsWith (30 seeds)") {
    import spark.implicits._
    val r0 = new scala.util.Random(4242)
    val keys = (0 until 3000).map(_ => randKey(r0)).distinct
    val rows = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
    rows.toDF("ik", "n").write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "8",
        "minSplit" -> "0", "maxSplit" -> "z"))
      .mode("overwrite").save()
    val expectAll = rows.toMap
    (1 to 30).foreach { seed =>
      val r = new scala.util.Random(seed)
      // prefix pool: random fragments + fragments OF REAL KEYS (guaranteed
      // hits, incl. whole keys — a prefix equal to a full key must match it)
      val prefixes = ((0 until r.nextInt(6)).map(_ => randKey(r).take(1 + r.nextInt(4))) ++
        (0 until r.nextInt(4)).map { _ =>
          val k = keys(r.nextInt(keys.length)); k.take(1 + r.nextInt(k.length))
        }).distinct.filter(_.nonEmpty)
      if (prefixes.nonEmpty) {
        val got = spark.read.format("graft-kv")
          .options(Map("catalog" -> catalog,
            "keyPrefixes" -> prefixes.mkString("\u0001"))).load()
          .collect().map(row => (row.getString(0), row.getLong(1))).toMap
        val want = expectAll.filter { case (k, _) => prefixes.exists(k.startsWith) }
        assert(got == want,
          s"seed=$seed prefixes=${prefixes.mkString("|")}: " +
            s"got ${got.size} rows, want ${want.size}; " +
            s"extra=${(got.keySet -- want.keySet).take(3)} " +
            s"missing=${(want.keySet -- got.keySet).take(3)}")
      }
    }
    KvStore.drop("default:prefdiff")
  }

  test("salted tables: option read == client-side startsWith (exact via bucket fan-out)") {
    import spark.implicits._
    val salted =
      """{"table":{"namespace":"default", "name":"prefsalt", "salt":"8"},
        |"rowkey":"key",
        |"columns":{
        |"ik":{"cf":"rowkey", "col":"key", "type":"string"},
        |"n":{"cf":"f", "col":"n", "type":"bigint"}}}""".stripMargin
    val r0 = new scala.util.Random(777)
    val keys = (0 until 2000).map(_ => randKey(r0)).distinct
    val rows = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
    rows.toDF("ik", "n").write.format("graft-kv")
      .options(Map("catalog" -> salted, "newtable" -> "8"))
      .mode("overwrite").save()
    val expectAll = rows.toMap
    (1 to 10).foreach { seed =>
      val r = new scala.util.Random(seed * 31)
      val prefixes = ((0 until 3).map(_ => randKey(r).take(1 + r.nextInt(3))) ++
        (0 until 3).map { _ =>
          val k = keys(r.nextInt(keys.length)); k.take(1 + r.nextInt(k.length))
        }).distinct.filter(_.nonEmpty)
      val got = spark.read.format("graft-kv")
        .options(Map("catalog" -> salted,
          "keyPrefixes" -> prefixes.mkString(""))).load()
        .collect().map(row => (row.getString(0), row.getLong(1))).toMap
      val want = expectAll.filter { case (k, _) => prefixes.exists(k.startsWith) }
      assert(got == want,
        s"seed=$seed prefixes=${prefixes.mkString("|")}: salted option read " +
          s"returned ${got.size} rows, want ${want.size} — the option must be " +
          "EXACT on salted tables (round-9 verdict: a silent superset is a " +
          "correctness footgun)")
    }
    KvStore.drop("default:prefsalt")
  }

  test("non-string leading key part: the option throws instead of silently dropping rows") {
    import spark.implicits._
    val numKey =
      """{"table":{"namespace":"default", "name":"prefnum"},
        |"rowkey":"key",
        |"columns":{
        |"id":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"n":{"cf":"f", "col":"n", "type":"bigint"}}}""".stripMargin
    (0L until 50L).map(i => (i, i)).toDF("id", "n").write.format("graft-kv")
      .options(Map("catalog" -> numKey, "newtable" -> "4",
        "minSplitNum" -> "0", "maxSplitNum" -> "50"))
      .mode("overwrite").save()
    val ex = intercept[Exception] {
      spark.read.format("graft-kv")
        .options(Map("catalog" -> numKey, "keyPrefixes" -> "12")).load()
        .count()
    }
    assert(ex.getMessage.contains("keyPrefixes"),
      s"expected a keyPrefixes layout rejection, got: ${ex.getMessage}")
    KvStore.drop("default:prefnum")
  }

  test("all-empty prefix set: the option throws instead of silently returning zero rows") {
    import spark.implicits._
    Seq(("k1", 1L)).toDF("ik", "n").write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4",
        "minSplit" -> "0", "maxSplit" -> "z"))
      .mode("overwrite").save()
    // a bare empty VALUE falls under the uniform "empty option = absent"
    // rule (every option goes through the same nonEmpty filter), so it is
    // an unrestricted scan, not an error
    assert(spark.read.format("graft-kv")
      .options(Map("catalog" -> catalog, "keyPrefixes" -> "")).load()
      .count() == 1L)
    // but a NON-empty value that parses to zero prefixes (separators
    // only) is a rejected silent-zero-rows hazard
    Seq("", "").foreach { v =>
      val ex = intercept[Exception] {
        spark.read.format("graft-kv")
          .options(Map("catalog" -> catalog, "keyPrefixes" -> v)).load()
          .count()
      }
      assert(ex.getMessage.contains("keyPrefixes"),
        s"value of ${v.length} separators: expected an empty-set rejection, " +
          s"got: ${ex.getMessage}")
    }
    KvStore.drop("default:prefdiff")
  }
}
