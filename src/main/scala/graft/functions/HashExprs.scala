package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import org.apache.spark.sql.graftshim.GraftShim

/** Native Catalyst expressions for the dedup sketches.
  *
  * Spark's higher-order functions (`transform`, `filter`, `aggregate`) are
  * CodegenFallback: building word-bigram shingles with
  * `transform(sequence(...), concat_ws(...))` and then 32
  * `array_min(transform(...))` signature columns walks the token array in
  * interpreted, boxing code dozens of times per row — measured ~11 s for
  * 5 000 documents. These expressions take the RAW token array (from the
  * codegen'd `split`) and compute the whole sketch in ONE pass of tight
  * primitive Java (doGenCode), hashing bigrams by chaining xxhash64 over
  * adjacent tokens with zero string allocation. Signature computation is a
  * pure map-side projection — no explode, no groupBy, no shuffle — so a
  * 100 TB corpus sketches as an embarrassingly-parallel scan.
  *
  * Hash family: base_j = chain of XXH64.hashUTF8String over the shingle's
  * tokens (seed 42); h_i(j) = XXH64.hashInt(i, base_j).
  */
object HashSketch {
  /** Per-thread MD5 instance: expression objects are shared across
    * concurrently-running tasks through the codegen reference array, so a
    * per-expression digest would race; a per-row `getInstance` pays a JCA
    * provider lookup plus allocation on every call. */
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** The calling thread's reusable MD5 digest, already reset. */
  def md5Digest(): java.security.MessageDigest = {
    val md = md5Local.get()
    md.reset()
    md
  }

  /** Little-endian uint64 of MD5-digest bytes 8..15 — DuckDB's
    * `md5_number_lower` convention. Every md5-derived sketch in the repo
    * MUST route through this ONE packing (the cross-engine oracle contract
    * hinges on the exact byte order; independent copies can drift). */
  def leUint64(dig: Array[Byte]): Long =
    (dig(8) & 0xffL) | ((dig(9) & 0xffL) << 8) | ((dig(10) & 0xffL) << 16) |
      ((dig(11) & 0xffL) << 24) | ((dig(12) & 0xffL) << 32) |
      ((dig(13) & 0xffL) << 40) | ((dig(14) & 0xffL) << 48) |
      ((dig(15) & 0xffL) << 56)

  /** `md5_number_lower` of raw bytes: MD5 then [[leUint64]]. */
  def md5NumberLower(bytes: Array[Byte]): Long =
    leUint64(md5Digest().digest(bytes))

  /** Shared one-pass minhash loop (interpreted eval path). Returns the
    * `numHashes` mins over bigram shingles of `arr` (or unigrams when the
    * array has a single token). */
  def minhashMins(arr: ArrayData, numHashes: Int): Array[Long] = {
    val n = arr.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val shingleCount = if (n == 1) 1 else n - 1
    var j = 0
    while (j < shingleCount) {
      // null tokens (containsNull arrays) are skipped, like SimHash64
      if (!arr.isNullAt(j) && (n == 1 || !arr.isNullAt(j + 1))) {
        var base = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        if (n > 1) base = XXH64.hashUTF8String(arr.getUTF8String(j + 1), base)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashInt(i, base)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    mins
  }

  /** Codegen for the same loop; emits code filling `mins` from `a`. */
  def minhashMinsCode(ctx: CodegenContext, a: String, mins: String,
      numHashes: Int): String = {
    val xxh = classOf[XXH64].getName
    val j = ctx.freshName("j"); val i = ctx.freshName("i")
    val base = ctx.freshName("base"); val h = ctx.freshName("h")
    val nEl = ctx.freshName("nEl"); val nSh = ctx.freshName("nSh")
    s"""
       |long[] $mins = new long[$numHashes];
       |java.util.Arrays.fill($mins, Long.MAX_VALUE);
       |int $nEl = $a.numElements();
       |int $nSh = $nEl == 1 ? 1 : $nEl - 1;
       |for (int $j = 0; $j < $nSh; $j++) {
       |  if ($a.isNullAt($j) || ($nEl > 1 && $a.isNullAt($j + 1))) continue;
       |  long $base = $xxh.hashUTF8String($a.getUTF8String($j), 42L);
       |  if ($nEl > 1) $base = $xxh.hashUTF8String($a.getUTF8String($j + 1), $base);
       |  for (int $i = 0; $i < $numHashes; $i++) {
       |    long $h = $xxh.hashInt($i, $base);
       |    if ($h < $mins[$i]) $mins[$i] = $h;
       |  }
       |}
     """.stripMargin
  }
}

/** MinHash signature over bigram shingles of a token array: output
  * array<long> of length `numHashes`. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if numHashes <= 0 => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs numHashes > 0, got $numHashes")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string> input, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(HashSketch.minhashMins(v.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      s"""
         |${HashSketch.minhashMinsCode(ctx, a, mins, numHashes)}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused minhash → LSH-band hashes over bigram shingles of a token array:
  * one pass computes the `numHashes` signature mins, then chains each band's
  * `rows` mins into a single band-bucket hash. Output is array<long> of
  * length `bands`, consumed by exactly ONE `posexplode` — keeping the whole
  * sketch a single expression means Catalyst's CollapseProject can never
  * duplicate the token walk into per-band copies. */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {

  private lazy val rows = numHashes / bands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if bands <= 0 || numHashes <= 0 || numHashes % bands != 0 =>
      // numHashes <= 0 would otherwise slip through 0 % bands == 0 and give
      // every document the constant band hash 42 — a quadratic candidate blowup
      TypeCheckResult.TypeCheckFailure(
        s"minhash_bands needs 0 < bands dividing 0 < numHashes, got bands=$bands numHashes=$numHashes")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands needs array<string> input, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val mins = HashSketch.minhashMins(v.asInstanceOf[ArrayData], numHashes)
    val bhs = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var r = 0
      while (r < rows) { h = XXH64.hashLong(mins(b * rows + r), h); r += 1 }
      bhs(b) = h
      b += 1
    }
    new GenericArrayData(bhs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins"); val bhs = ctx.freshName("bhs")
      val b = ctx.freshName("b"); val r = ctx.freshName("r")
      val h = ctx.freshName("h")
      s"""
         |${HashSketch.minhashMinsCode(ctx, a, mins, numHashes)}
         |long[] $bhs = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = 42L;
         |  for (int $r = 0; $r < $rows; $r++) {
         |    $h = $xxh.hashLong($mins[$b * $rows + $r], $h);
         |  }
         |  $bhs[$b] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bhs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over a token array in one pass: bit b of the per-token
  * hash votes ±1; fingerprint bit = sign of the vote sum (set iff strictly
  * more set-votes than unset-votes).
  *
  * Hash base: default is XXH64.hashUTF8String(token, 42) — fastest, stays
  * in whole-stage codegen. `md5Base=true` hashes each token to the
  * little-endian uint64 of MD5-digest bytes 8..15 instead — exactly
  * DuckDB's `md5_number_lower(token)` — making the fingerprint (and every
  * Hamming-distance pair derived from it) reproducible by the SQL oracle;
  * that variant delegates codegen to a reference call (MessageDigest is
  * not codegen-friendly) but the surrounding plan stays compiled. */
case class SimHash64(child: Expression, md5Base: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string> input, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h =
          if (md5Base) HashSketch.md5NumberLower(arr.getUTF8String(j).getBytes)
          else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (md5Base) {
      val self = ctx.addReferenceObj("simhashMd5", this, classOf[SimHash64].getName)
      return nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = (Long) $self.nullSafeEval($a);")
    }
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts"); val j = ctx.freshName("j")
      val b = ctx.freshName("b"); val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $counts = new int[64];
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  if (!$a.isNullAt($j)) {
         |    long $h = $xxh.hashUTF8String($a.getUTF8String($j), 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) { if ($counts[$b] > 0) $fp |= 1L << $b; }
         |${ev.value} = $fp;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sorted, de-duplicated word-bigram shingle set of a token array — the
  * per-document prep for [[SortedJaccard]] reranks over the SAME shingle
  * universe MinHash sketches (single-token arrays shingle to the token
  * itself, mirroring [[HashSketch.minhashMins]]). One pass of primitive
  * UTF8String work replacing the
  * `sort_array(array_distinct(transform(sequence(...), concat_ws(...))))`
  * HOF chain, which is CodegenFallback and boxes per shingle. Binary
  * UTF8String sort order == `sort_array`'s. Codegen delegates to eval via
  * a reference object (the sort dominates; the surrounding projection stays
  * compiled). */
case class SortedShingles(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_shingles needs array<string> input, got $other")
  }

  @transient private lazy val space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = if (n <= 1) n else n - 1
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](cnt)
    var j = 0; var m = 0
    while (j < cnt) {
      if (!arr.isNullAt(j) && (n == 1 || !arr.isNullAt(j + 1))) {
        out(m) =
          if (n == 1) arr.getUTF8String(j)
          else org.apache.spark.unsafe.types.UTF8String.concatWs(space,
            arr.getUTF8String(j), arr.getUTF8String(j + 1))
        m += 1
      }
      j += 1
    }
    val trimmed = java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(trimmed,
      (a: org.apache.spark.unsafe.types.UTF8String,
       b: org.apache.spark.unsafe.types.UTF8String) => a.compareTo(b))
    // drop adjacent duplicates (array is sorted)
    var w = 0
    var r = 0
    while (r < trimmed.length) {
      if (w == 0 || trimmed(r).compareTo(trimmed(w - 1)) != 0) {
        trimmed(w) = trimmed(r); w += 1
      }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(trimmed, w).asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sortedShingles", this, classOf[SortedShingles].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact Jaccard similarity of two SORTED, de-duplicated string arrays via
  * a single O(n+m) merge — no per-pair hash set (array_intersect allocates
  * an OpenHashSet per call), no boxing. Callers must pre-sort with
  * `sort_array(array_distinct(...))` once per row BEFORE the pair join, so
  * the per-pair cost is the merge alone; unsorted input silently
  * undercounts. Result matches size(array_intersect)/size(union) on the
  * same sets, with NULL (not NaN) when both sets are empty. */
case class SortedJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard needs two array<string> inputs, got $other")
  }

  override def nullable: Boolean = true

  // null elements (sort_array places them first) are skipped; two empty
  // token sets yield NULL (matching Divide-by-zero semantics of the
  // size(array_intersect)/union formulation), never NaN — NaN sorts above
  // every double in Spark and would pass `>= threshold` filters.
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0; var nulls = 0
    while (i < na && a.isNullAt(i)) { i += 1; nulls += 1 }
    while (j < nb && b.isNullAt(j)) { j += 1; nulls += 1 }
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val denom = na + nb - nulls - inter
    if (denom == 0) null else inter.toDouble / denom.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val c = ctx.freshName("c")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val nulls = ctx.freshName("nulls"); val denom = ctx.freshName("denom")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0; int $nulls = 0;
         |while ($i < $na && $a.isNullAt($i)) { $i++; $nulls++; }
         |while ($j < $nb && $b.isNullAt($j)) { $j++; $nulls++; }
         |while ($i < $na && $j < $nb) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |int $denom = $na + $nb - $nulls - $inter;
         |if ($denom == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = (double) $inter / (double) $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Winnowing-style min-MD5 k-gram document fingerprint in one pass: the
  * lexicographic minimum of md5(substring(text, i, k)) over every character
  * position i. Replaces the `array_min(transform(sequence(...), md5(...)))`
  * HOF chain (CodegenFallback, one boxed UTF8String + hex string per
  * position) with a single loop that reuses one MessageDigest per row and
  * compares raw digests unsigned (same order as the hex strings, which are
  * only rendered once at the end). Substring positions are CHARACTER-based
  * (UTF8String.substringSQL) so results are bit-identical to the SQL form. */
case class MinKgramMd5(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if k <= 0 => TypeCheckResult.TypeCheckFailure(
      // k <= 0 would hash the empty substring at every position, fingerprinting
      // EVERY document as md5("") and collapsing a dedup into one cluster
      s"min_kgram_md5 needs k > 0, got $k")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_kgram_md5 needs string input, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val len = text.numChars()
    val n = math.max(len - k + 1, 1)
    val md = HashSketch.md5Digest()
    var best: Array[Byte] = null
    var i = 1
    while (i <= n) {
      md.reset()
      md.update(text.substringSQL(i, k).getBytes)
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(toHex(best))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def toHex(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(d.length * 2)
    d.foreach { b => sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      .append(Character.forDigit(b & 0xf, 16)) }
    sb.toString
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // per-row cost is the md5 loop itself; delegate to eval via a reference
    // object so the surrounding projection stays in whole-stage codegen
    val self = ctx.addReferenceObj("minKgramMd5", this, classOf[MinKgramMd5].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Little-endian uint64 of MD5-digest bytes 8..15 of a string — exactly
  * DuckDB's `md5_number_lower(s)`, the cross-engine hash convention every
  * md5-derived sketch in this repo shares (see [[SimHash64]] md5Base). A
  * scalar entry point for operators that need ONE reproducible uniform
  * 64-bit value per row (deterministic sampling, bucket assignment) rather
  * than a per-token vote. Codegen delegates the digest to a reference call
  * (MessageDigest is not codegen-friendly); the surrounding plan stays
  * compiled. */
case class Md5NumberLower(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_number_lower needs string input, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    HashSketch.md5NumberLower(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("md5NumLower", this, classOf[Md5NumberLower].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (Long) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level entry points. Inputs are token arrays (e.g. from the
  * codegen'd `split`); the expressions do the (bigram) shingling internally. */
object HashExprs {
  def minhashSig(tokens: Column, numHashes: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(tokens), numHashes))
  def minhashBands(tokens: Column, numHashes: Int, bands: Int): Column =
    GraftShim.column(MinHashBands(GraftShim.expression(tokens), numHashes, bands))
  def simhash64(tokens: Column, md5Base: Boolean = false): Column =
    GraftShim.column(SimHash64(GraftShim.expression(tokens), md5Base))
  def sortedShingles(tokens: Column): Column =
    GraftShim.column(SortedShingles(GraftShim.expression(tokens)))
  def sortedJaccard(a: Column, b: Column): Column =
    GraftShim.column(SortedJaccard(GraftShim.expression(a), GraftShim.expression(b)))
  def minKgramMd5(text: Column, k: Int): Column =
    GraftShim.column(MinKgramMd5(GraftShim.expression(text), k))
  def md5NumberLower(s: Column): Column =
    GraftShim.column(Md5NumberLower(GraftShim.expression(s)))
}
