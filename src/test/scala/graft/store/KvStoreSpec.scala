package graft.store

import org.scalatest.funsuite.AnyFunSuite

import graft.ranges.{Bound, ScanRange}

/** Region bookkeeping truth tests: the O(1) row counters and mutation
  * high-water marks that plan-time statistics and streaming offsets ride —
  * both must track the skip lists exactly through mixed put/delete traffic
  * (a drifting counter would silently skew join-side broadcast decisions;
  * a stale stamp would make a micro-batch miss writes). */
class KvStoreSpec extends AnyFunSuite {

  private def key(i: Int): Array[Byte] = f"row$i%04d".getBytes("UTF-8")
  private def cell(ts: Long, v: String = "v") =
    KvCell("f", "q", ts, v.getBytes("UTF-8"))
  private val all = Seq(ScanRange[Array[Byte]](Bound(None, inclusive = false),
    Bound(None, inclusive = false)))

  test("rowCount tracks scan count through mixed put/delete") {
    val t = KvStore.createTable("spec:counters", Seq("row0300", "row0600")
      .map(_.getBytes("UTF-8")), dropExisting = true)
    (0 until 900).foreach(i => t.put(key(i), Seq(cell(100L))))
    // re-put of existing keys must NOT double-count
    (0 until 900 by 3).foreach(i => t.put(key(i), Seq(cell(200L, "v2"))))
    def counted: Long = t.regions.map(_.rowCount.get()).sum
    def scanned: Long = t.regions.indices.map(r =>
      all.iterator.flatMap(t.scan(r, _, ColumnSet.All, None, 1, None)).size.toLong).sum
    assert(counted == 900L)
    assert(counted == scanned)
    // range+predicate delete decrements exactly the removed rows
    val removed = t.delete(Seq(ScanRange[Array[Byte]](
      Bound(Some(key(100)), inclusive = true),
      Bound(Some(key(500)), inclusive = false))), None)
    assert(removed == 400L)
    assert(counted == 500L)
    assert(counted == scanned)
    // per-region counts agree with per-region scans
    t.regions.foreach { r =>
      val n = all.iterator.flatMap(t.scan(r.index, _, ColumnSet.All, None, 1, None)).size.toLong
      assert(r.rowCount.get() == n, s"region ${r.index}")
    }
  }

  test("maxStamp is the monotone newest-written stamp per region") {
    val t = KvStore.createTable("spec:stamps", Seq("row0500").map(_.getBytes("UTF-8")),
      dropExisting = true)
    assert(t.regions.forall(_.maxStamp.get() == Long.MinValue))
    t.put(key(1), Seq(cell(1000L)))
    t.put(key(700), Seq(cell(3000L)))
    assert(t.regions(0).maxStamp.get() == 1000L)
    assert(t.regions(1).maxStamp.get() == 3000L)
    // an older stamp never lowers the mark
    t.put(key(2), Seq(cell(500L)))
    assert(t.regions(0).maxStamp.get() == 1000L)
    // deletes ADVANCE the mark to their stamp (they are mutations a CDC
    // stream must observe) — and a backdated delete stamp never lowers it
    t.delete(all, None, stamp = 5000L)
    assert(t.regions(0).maxStamp.get() == 5000L)
    assert(t.regions(1).maxStamp.get() == 5000L)
    t.put(key(3), Seq(cell(600L)))
    t.delete(all, None, stamp = 100L)
    assert(t.regions(0).maxStamp.get() == 5000L)
    // the delete markers carry their stamps for the tombstone feed
    val marks = t.regions.indices.flatMap(r => t.tombstonesIn(r, all.head,
      TimeRange(Long.MinValue, Long.MaxValue))).map(_._2).toSet
    assert(marks == Set(5000L, 100L))
  }

  test("scan leases: acquire/release balance, double-release trips the assert") {
    val t = KvStore.createTable("spec:leases", Seq.empty, dropExisting = true)
    assert(t.openScanCount == 0L)
    t.acquireScanLease(); t.acquireScanLease()
    assert(t.openScanCount == 2L)
    assert(KvStore.openScanCount >= 2L) // global ledger sees this table
    t.releaseScanLease(); t.releaseScanLease()
    assert(t.openScanCount == 0L)
    // an unbalanced release is a reader bug — it must fail loudly, not
    // drift the ledger negative and mask a real leak elsewhere
    intercept[AssertionError](t.releaseScanLease())
    KvStore.drop("spec:leases")
  }

  test("deletes are MVCC: only versions <= the delete stamp are erased") {
    val t = KvStore.createTable("spec:mvccdel", Seq("row0500").map(_.getBytes("UTF-8")),
      maxVersions = 3, dropExisting = true)
    t.put(key(1), Seq(cell(100L, "old"), cell(300L, "new")))
    t.put(key(2), Seq(cell(100L, "only-old")))

    // delete@200 sees only the ts<=200 history: key(1)'s ts=300 cell
    // survives (the put "arrived after" the delete), key(2) dies entirely
    t.delete(all, None, stamp = 200L)
    val k1 = t.get(key(1), ColumnSet.All, None, versions = 3)
    assert(k1.isDefined && k1.get.cells.map(c => (c.ts, new String(c.value))) ==
      Seq((300L, "new")))
    assert(t.get(key(2), ColumnSet.All, None, versions = 3).isEmpty)
    assert(t.regions.map(_.rowCount.get()).sum == 1L)

    // deleteRow is the same rule: delete@T then put@T+1 commute — apply
    // them put-first and the row must still converge to the put
    t.put(key(3), Seq(cell(401L, "winner")))
    t.deleteRow(key(3), stamp = 400L)
    val k3 = t.get(key(3), ColumnSet.All, None, versions = 3)
    assert(k3.isDefined && k3.get.cells.map(c => new String(c.value)) == Seq("winner"))
    // ...and delete-first converges identically
    t.deleteRow(key(4), stamp = 400L)
    t.put(key(4), Seq(cell(401L, "winner")))
    val k4 = t.get(key(4), ColumnSet.All, None, versions = 3)
    assert(k4.isDefined && k4.get.cells.map(c => new String(c.value)) == Seq("winner"))

    // a fully-erased row leaves a tombstone AND decrements the counter once
    val marks = t.regions.indices.flatMap(r => t.tombstonesIn(r, all.head,
      TimeRange(Long.MinValue, Long.MaxValue))).toMap
    assert(marks.keySet.map(new String(_)).contains("row0002"))
    assert(t.regions.map(_.rowCount.get()).sum == 3L) // keys 1, 3, 4
  }
}
