package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.store.KvStore

/** kv32's snapshot validity must survive a restart under the WAL: the
  * built-for-dir marker persists as a one-row meta table, so replay
  * restores BOTH the code table and the proof it was completely built —
  * a restarted server serves probes without re-encoding the corpus
  * (correctness was never at stake; the rebuild was a full corpus
  * re-encode paid on every restart). */
class Kv32WalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  test("a replayed marker serves the replayed snapshot without a rebuild") {
    val walDir = Files.createTempDirectory("graft-wal-kv32")
    KvStore.enableWal(walDir)
    try {
      KvStore.drop("default:kv_ivfpq_codes")
      KvStore.drop("default:kv_ivfpq_meta")
      Pipeline.kv32ForgetInProcess()
      val built = Pipeline.kv32IvfPqScan(spark, dir).collect()
      assert(built.nonEmpty)
      // "restart": wipe memory + in-process marker, then replay the log
      KvStore.disableWal()
      Pipeline.kv32ForgetInProcess()
      KvStore.replayWal(walDir)
      assert(KvStore.exists("default:kv_ivfpq_codes"), "replay must restore the code table")
      assert(KvStore.exists("default:kv_ivfpq_meta"), "replay must restore the marker")
      // table identity is the rebuild detector: a drop + re-encode swaps
      // the KvTable instance the registry serves
      val replayedIdentity = System.identityHashCode(KvStore.table("default:kv_ivfpq_codes"))
      val served = Pipeline.kv32IvfPqScan(spark, dir).collect()
      assert(served.nonEmpty)
      assert(System.identityHashCode(KvStore.table("default:kv_ivfpq_codes")) == replayedIdentity,
        "a replayed marker must serve the replayed snapshot, not drop + rebuild")
      assert(served.map(_.toString).sorted.toSeq == built.map(_.toString).sorted.toSeq,
        "replayed snapshot must serve the same results as the freshly built one")
      // and a DIFFERENT dir still forces the rebuild (stale-snapshot guard)
      Pipeline.kv32ForgetInProcess()
      val other = Pipeline.kv32IvfPqScan(spark, "/root/testdata/sf0.01")
      other.limit(1).collect()
      assert(System.identityHashCode(KvStore.table("default:kv_ivfpq_codes")) != replayedIdentity,
        "a dir switch must drop and rebuild the snapshot")
    } finally {
      KvStore.disableWal()
      KvStore.drop("default:kv_ivfpq_codes")
      KvStore.drop("default:kv_ivfpq_meta")
      Pipeline.kv32ForgetInProcess()
    }
  }

  test("a torn rebuild cannot leave a stale marker validating a partial snapshot") {
    // the rebuild's WAL ordering contract: marker-drop precedes table-drop
    // precedes rewrite, and the marker is re-written only after a COMPLETE
    // build — so a crash anywhere mid-rebuild replays to a marker-less
    // state that forces a rebuild, never a marker endorsing partial codes
    val walDir = Files.createTempDirectory("graft-wal-kv32torn")
    KvStore.enableWal(walDir)
    try {
      KvStore.drop("default:kv_ivfpq_codes")
      KvStore.drop("default:kv_ivfpq_meta")
      Pipeline.kv32ForgetInProcess()
      val good = Pipeline.kv32IvfPqScan(spark, dir).collect()
      // emulate the rebuild interrupted mid-write: marker gone, codes
      // table replaced by a partial/foreign table, CRASH before the
      // marker write
      KvStore.drop("default:kv_ivfpq_meta")
      KvStore.drop("default:kv_ivfpq_codes")
      val junk = KvStore.createTable("default:kv_ivfpq_codes", Seq.empty)
      junk.put("zz".getBytes("UTF-8"),
        Seq(graft.store.KvCell("f", "c", 1L, Array[Byte](1, 2))))
      // "restart": wipe + replay
      KvStore.disableWal()
      Pipeline.kv32ForgetInProcess()
      KvStore.replayWal(walDir)
      assert(KvStore.exists("default:kv_ivfpq_codes"), "partial table replays")
      assert(!KvStore.exists("default:kv_ivfpq_meta"),
        "no marker may survive a torn rebuild")
      // serving must REBUILD from the corpus, not trust the partial table
      val served = Pipeline.kv32IvfPqScan(spark, dir).collect()
      assert(served.map(_.toString).sorted.toSeq == good.map(_.toString).sorted.toSeq,
        "post-crash serve must rebuild and match the clean snapshot")
    } finally {
      KvStore.disableWal()
      KvStore.drop("default:kv_ivfpq_codes")
      KvStore.drop("default:kv_ivfpq_meta")
      Pipeline.kv32ForgetInProcess()
    }
  }
}
