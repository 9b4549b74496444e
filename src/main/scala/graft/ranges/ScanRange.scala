package graft.ranges

/** Interval algebra over row-key ranges — the connector's core planning
  * data structure (reference: core/.../ScanRange.scala:32-267).
  *
  * Clean-room redesign: instead of the reference's binary-search insert/merge,
  * ranges are normalized (sorted, non-overlapping) by a single sort+sweep, and
  * AND/OR are pairwise-intersect + normalize. Semantics are identical; the
  * shapes are simpler to prove and to test.
  *
  * A `Bound` is an optional endpoint with inclusivity; `None` means -inf for
  * starts and +inf for ends.
  */
final case class Bound[T](value: Option[T], inclusive: Boolean)

object Bound {
  def negInf[T]: Bound[T] = Bound(None, inclusive = true)
  def posInf[T]: Bound[T] = Bound(None, inclusive = true)
  def incl[T](v: T): Bound[T] = Bound(Some(v), inclusive = true)
  def excl[T](v: T): Bound[T] = Bound(Some(v), inclusive = false)
}

/** `[start, end]` with per-side inclusivity; either side may be infinite. */
final case class ScanRange[T](start: Bound[T], end: Bound[T]) {

  def isPoint(implicit ord: Ordering[T]): Boolean = (start.value, end.value) match {
    case (Some(a), Some(b)) => start.inclusive && end.inclusive && ord.equiv(a, b)
    case _ => false
  }

  def isEmpty(implicit ord: Ordering[T]): Boolean = (start.value, end.value) match {
    case (Some(a), Some(b)) =>
      val c = ord.compare(a, b)
      c > 0 || (c == 0 && !(start.inclusive && end.inclusive))
    case _ => false
  }

  def contains(v: T)(implicit ord: Ordering[T]): Boolean = {
    val geStart = start.value.forall { s =>
      val c = ord.compare(v, s); c > 0 || (c == 0 && start.inclusive)
    }
    val leEnd = end.value.forall { e =>
      val c = ord.compare(v, e); c < 0 || (c == 0 && end.inclusive)
    }
    geStart && leEnd
  }

  /** Intersection of two ranges; None if empty. */
  def intersect(o: ScanRange[T])(implicit ord: Ordering[T]): Option[ScanRange[T]] = {
    val s = ScanRange.maxStart(start, o.start)
    val e = ScanRange.minEnd(end, o.end)
    val r = ScanRange(s, e)
    if (r.isEmpty) None else Some(r)
  }
}

object ScanRange {

  def all[T]: ScanRange[T] = ScanRange(Bound.negInf, Bound.posInf)
  def point[T](v: T): ScanRange[T] = ScanRange(Bound.incl(v), Bound.incl(v))
  def atMost[T](v: T, inclusive: Boolean = true): ScanRange[T] =
    ScanRange(Bound.negInf, Bound(Some(v), inclusive))
  def atLeast[T](v: T, inclusive: Boolean = true): ScanRange[T] =
    ScanRange(Bound(Some(v), inclusive), Bound.posInf)
  def closed[T](lo: T, hi: T): ScanRange[T] = ScanRange(Bound.incl(lo), Bound.incl(hi))

  /** Later (tighter) of two start bounds. */
  private[ranges] def maxStart[T](a: Bound[T], b: Bound[T])(implicit ord: Ordering[T]): Bound[T] =
    (a.value, b.value) match {
      case (None, _) => b
      case (_, None) => a
      case (Some(x), Some(y)) =>
        val c = ord.compare(x, y)
        if (c > 0) a
        else if (c < 0) b
        else Bound(Some(x), a.inclusive && b.inclusive)
    }

  /** Earlier (tighter) of two end bounds. */
  private[ranges] def minEnd[T](a: Bound[T], b: Bound[T])(implicit ord: Ordering[T]): Bound[T] =
    (a.value, b.value) match {
      case (None, _) => b
      case (_, None) => a
      case (Some(x), Some(y)) =>
        val c = ord.compare(x, y)
        if (c < 0) a
        else if (c > 0) b
        else Bound(Some(x), a.inclusive && b.inclusive)
    }

  /** Start-bound ordering for normalization: -inf first, then by value;
    * inclusive start sorts before exclusive start at the same value. */
  private def startLt[T](a: Bound[T], b: Bound[T])(implicit ord: Ordering[T]): Boolean =
    (a.value, b.value) match {
      case (None, None)       => false
      case (None, _)          => true
      case (_, None)          => false
      case (Some(x), Some(y)) =>
        val c = ord.compare(x, y)
        c < 0 || (c == 0 && a.inclusive && !b.inclusive)
    }

  /** Can `b` extend / touch a range ending at `e`? (overlap or adjacency) */
  private def connects[T](e: Bound[T], s: Bound[T])(implicit ord: Ordering[T]): Boolean =
    (e.value, s.value) match {
      case (None, _) => true // e = +inf
      case (_, None) => true // s = -inf
      case (Some(x), Some(y)) =>
        val c = ord.compare(y, x)
        c < 0 || (c == 0 && (e.inclusive || s.inclusive))
    }

  /** Is end-bound `a` beyond end-bound `b`? */
  private def endGt[T](a: Bound[T], b: Bound[T])(implicit ord: Ordering[T]): Boolean =
    (a.value, b.value) match {
      case (None, None)       => false
      case (None, _)          => true
      case (_, None)          => false
      case (Some(x), Some(y)) =>
        val c = ord.compare(x, y)
        c > 0 || (c == 0 && a.inclusive && !b.inclusive)
    }

  /** Sort + sweep-merge into a minimal sorted, non-overlapping list. */
  def normalize[T](ranges: Seq[ScanRange[T]])(implicit ord: Ordering[T]): Seq[ScanRange[T]] = {
    val live = ranges.filterNot(_.isEmpty)
    if (live.size <= 1) return live
    val sorted = live.sortWith((a, b) => startLt(a.start, b.start))
    val out = collection.mutable.ArrayBuffer[ScanRange[T]](sorted.head)
    for (r <- sorted.tail) {
      val last = out.last
      if (connects(last.end, r.start)) {
        if (endGt(r.end, last.end)) out(out.size - 1) = ScanRange(last.start, r.end)
      } else out += r
    }
    out.toSeq
  }

  /** Union of two range lists. */
  def or[T](as: Seq[ScanRange[T]], bs: Seq[ScanRange[T]])(implicit ord: Ordering[T]): Seq[ScanRange[T]] =
    normalize(as ++ bs)

  /** Intersection of two range lists (pairwise clip + normalize). */
  def and[T](as: Seq[ScanRange[T]], bs: Seq[ScanRange[T]])(implicit ord: Ordering[T]): Seq[ScanRange[T]] =
    normalize(for { a <- as; b <- bs; r <- a.intersect(b) } yield r)
}
