package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text-hashing expressions: the per-document halves
  * of MinHash and SimHash as SCALAR functions over the in-row token
  * array.
  *
  * Why scalar, not aggregate: a signature is a pure function of one
  * document, so computing it must not shuffle. The previous scale forms
  * exploded tokens/shingle indices into row-per-token streams and
  * re-assembled signatures with 64 codegen'd aggregates — correct and
  * partial-aggregated, but it materialized corpus×tokens intermediate
  * rows and paid a hash-aggregate probe per token. These expressions
  * keep the whole loop inside one generated function call per row:
  * signatures fuse into the parquet scan, and the first shuffle of the
  * dedup pipeline is the (already tiny) banded candidate join.
  *
  * Hash parity is bit-for-bit with the Column forms used by the specs
  * and by any persisted signature table:
  *  - shingle hash   = xxhash64(shingle_string)          (seed 42)
  *  - minhash h_i    = xxhash64(shingle_hash: long, i: int)
  *    (seed chaining: hashInt(i, hashLong(s, 42)) — exactly Spark's
  *    multi-argument xxhash64)
  *  - simhash votes  = xxhash64(token_string) bit b, +1/-1
  * all via Spark's own [[XXH64]] static methods.
  */
object TextHashExprs {

  private val SEED = 42L // Spark's xxhash64 default seed

  // ----- static helpers, called from generated code -----

  /** Distinct xxhash64 values of the k-token shingles of `toks`
    * (shingle string = k consecutive tokens joined by one space —
    * byte-identical to concat_ws(" ", slice(ws, i+1, k))). First-seen
    * order; fewer than k tokens → empty (callers gate on token count,
    * matching the explode form's `sequence(0, n-k)` domain). */
  def shingleHashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val parts = new Array[UTF8String](k)
    val seen = new java.util.HashSet[java.lang.Long](Math.min(n, 1024))
    val out = new Array[Long](n - k + 1)
    var m = 0
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val h = XXH64.hashUTF8String(UTF8String.concatWs(SPACE, parts: _*), SEED)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }
  private val SPACE = UTF8String.fromString(" ")

  private val MD5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Portable rolling fingerprints: the `keep` smallest DISTINCT
    * md5-prefix window hashes. Window = k consecutive tokens joined by
    * one space; hash = the first 4 md5 bytes of the window's UTF-8
    * bytes as an unsigned 32-bit value — bit-identical to DuckDB's
    * `('0x' || substr(md5(w), 1, 8))::BIGINT` and to Spark's
    * `conv(substring(md5(w), 1, 8), 16, 10)`. Fewer than k tokens →
    * one whole-text window (matching `concat_ws` over the full array,
    * which for zero tokens is the empty string). */
  def portableFingerprints(toks: ArrayData, k: Int, keep: Int): ArrayData = {
    val md = MD5.get()
    def h(s: UTF8String): Long = {
      md.reset()
      val d = md.digest(s.getBytes)
      ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    }
    val n = toks.numElements()
    val seen = new java.util.HashSet[java.lang.Long](Math.min(Math.max(n, 4), 1024))
    val out: Array[Long] =
      if (n < k) {
        val parts = new Array[UTF8String](n)
        var i = 0
        while (i < n) { parts(i) = toks.getUTF8String(i); i += 1 }
        Array(h(UTF8String.concatWs(SPACE, parts: _*)))
      } else {
        val parts = new Array[UTF8String](k)
        val hs = new Array[Long](n - k + 1)
        var m = 0
        var i = 0
        while (i <= n - k) {
          var j = 0
          while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
          val v = h(UTF8String.concatWs(SPACE, parts: _*))
          if (seen.add(v)) { hs(m) = v; m += 1 }
          i += 1
        }
        java.util.Arrays.copyOf(hs, m)
      }
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(
      if (out.length <= keep) out else java.util.Arrays.copyOf(out, keep))
  }

  /** Positional portable fingerprints: element i is the md5-prefix
    * hash of the window STARTING at token i — same hashing as
    * [[portableFingerprints]] (first 4 md5 bytes of the
    * space-joined window, unsigned 32-bit), but in position order,
    * with multiplicity, unsorted: the form span-level rewrite ops
    * need to map a duplicated hash back to the tokens it covers.
    * Fewer than k tokens → one whole-run window at position 0; zero
    * tokens → empty array (nothing to cover). */
  def positionalFingerprints(toks: ArrayData, k: Int): ArrayData = {
    val md = MD5.get()
    def h(s: UTF8String): Long = {
      md.reset()
      val d = md.digest(s.getBytes)
      ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    }
    val n = toks.numElements()
    val out: Array[Long] =
      if (n == 0) Array.emptyLongArray
      else if (n < k) {
        val parts = new Array[UTF8String](n)
        var i = 0
        while (i < n) { parts(i) = toks.getUTF8String(i); i += 1 }
        Array(h(UTF8String.concatWs(SPACE, parts: _*)))
      } else {
        val parts = new Array[UTF8String](k)
        val hs = new Array[Long](n - k + 1)
        var i = 0
        while (i <= n - k) {
          var j = 0
          while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
          hs(i) = h(UTF8String.concatWs(SPACE, parts: _*))
          i += 1
        }
        hs
      }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** MinHash signature from precomputed shingle hashes: element i is
    * min over hashes s of xxhash64(s, i). Empty input → null (no
    * shingles means no signature — callers gate on token count). */
  def minHashFromHashes(hs: ArrayData, numHashes: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var si = 0
    while (si < n) {
      val base = XXH64.hashLong(hs.getLong(si), SEED)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashInt(i, base)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      si += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  // ----- portable MinHash (replayable in any SQL engine) -----

  /** Modulus for the portable affine hash family: 2^61 - 1 (Mersenne
    * prime). Operands are bounded so a*h + b < 2^63 — no overflow in
    * Spark ANSI mode or any engine with signed 64-bit integers. */
  val PortableMod: Long = (1L << 61) - 1

  /** Deterministic affine coefficients (a_i, b_i) for the portable
    * MinHash family h_i(x) = (a_i*x + b_i) mod [[PortableMod]] — derived
    * from md5 so ANY engine (or a human) can re-derive them, and bounded
    * (a_i < 2^30, b_i < 2^32, x < 2^32) so products stay below 2^63.
    * The same arrays are inlined as literals into the DuckDB oracle. */
  def portableCoeffs(numHashes: Int): (Array[Long], Array[Long]) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = {
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    }
    val as = Array.tabulate(numHashes)(i => h32(s"graft:mh:a:$i") % ((1L << 30) - 1) + 1)
    val bs = Array.tabulate(numHashes)(i => h32(s"graft:mh:b:$i"))
    (as, bs)
  }

  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  /** Portable MinHash signature from md5-prefix shingle hashes
    * ([[portableFingerprints]] values, all < 2^32): element i is
    * min over hashes x of (a_i*x + b_i) mod 2^61-1. The mod is what
    * makes each h_i a permutation-like reshuffle — a plain affine map
    * is monotone in x and every h_i would pick the same shingle.
    * Empty input → null (callers gate on token count). */
  def portableMinHash(hs: ArrayData, numHashes: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val (as, bs) = coeffCache.computeIfAbsent(numHashes, portableCoeffs)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var si = 0
    while (si < n) {
      val x = hs.getLong(si)
      var i = 0
      while (i < numHashes) {
        val v = (as(i) * x + bs(i)) % PortableMod
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      si += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Portable 64-bit SimHash: like [[simHashSig]] but the token hash
    * is the first 8 md5 bytes (big-endian) — the bit pattern of
    * `('0x' || substr(md5(t), 1, 16))::UBIGINT` in any SQL engine, so
    * an external oracle re-derives every vote and bit. */
  def portableSimHash(toks: ArrayData): Long = {
    val md = MD5.get()
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xFFL); j += 1 }
        var b = 0
        while (b < 64) {
          votes(b) += (((h >>> b).toInt & 1) << 1) - 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** 64-bit SimHash over the token array (unit weights): bit b set iff
    * the sum over tokens of ±1 (sign of bit b of the token's xxhash64)
    * is positive. Token-less input → 0L, matching the Column form. */
  def simHashSig(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = XXH64.hashUTF8String(toks.getUTF8String(i), SEED)
        var b = 0
        while (b < 64) {
          votes(b) += (((h >>> b).toInt & 1) << 1) - 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  // ----- expressions -----

  private def checkArrayOf(e: Expression, et: DataType,
                           what: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(t, _) if t == et => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$what expects array<$et>, got $other")
    }

  case class ShingleHashesExpr(child: Expression, k: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(child, StringType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"

    override def nullSafeEval(a: Any): Any =
      shingleHashes(a.asInstanceOf[ArrayData], k)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.TextHashExprs.shingleHashes($a, $k);
        """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class MinHashFromHashesExpr(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(child, LongType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash_from_hashes"

    override def nullSafeEval(a: Any): Any =
      minHashFromHashes(a.asInstanceOf[ArrayData], numHashes)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val tmp = ctx.freshName("mh")
        s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
        |  graft.functions.TextHashExprs.minHashFromHashes($a, $numHashes);
        |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
        """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class PortableFpExpr(child: Expression, k: Int, keep: Int)
      extends UnaryExpression {
    require(k >= 1 && keep >= 1, s"window k=$k and keep=$keep must be >= 1")
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(child, StringType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "portable_fingerprints"

    override def nullSafeEval(a: Any): Any =
      portableFingerprints(a.asInstanceOf[ArrayData], k, keep)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.TextHashExprs.portableFingerprints($a, $k, $keep);
        """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class PositionalFpExpr(child: Expression, k: Int)
      extends UnaryExpression {
    require(k >= 1, s"window k=$k must be >= 1")
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(child, StringType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "positional_fingerprints"

    override def nullSafeEval(a: Any): Any =
      positionalFingerprints(a.asInstanceOf[ArrayData], k)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.TextHashExprs.positionalFingerprints($a, $k);
        """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class PortableMinHashExpr(child: Expression, numHashes: Int)
      extends UnaryExpression {
    require(numHashes >= 1, s"numHashes=$numHashes must be >= 1")
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(child, LongType, prettyName)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "portable_minhash"

    override def nullSafeEval(a: Any): Any =
      portableMinHash(a.asInstanceOf[ArrayData], numHashes)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val tmp = ctx.freshName("pmh")
        s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
        |  graft.functions.TextHashExprs.portableMinHash($a, $numHashes);
        |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
        """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class SimHashSigExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(child, StringType, prettyName)
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_sig"

    override def nullSafeEval(a: Any): Any =
      simHashSig(a.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.TextHashExprs.simHashSig($a);
        """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class PortableSimHashExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(child, StringType, prettyName)
    override def dataType: DataType = LongType
    override def prettyName: String = "portable_simhash"

    override def nullSafeEval(a: Any): Any =
      portableSimHash(a.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.TextHashExprs.portableSimHash($a);
        """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** How many elements of `arr` are present in the sorted `set`
    * (binary search per element; `arr` is assumed deduplicated, as the
    * fingerprint expressions emit). */
  def countInSortedSet(arr: ArrayData, set: Array[Long]): Int = {
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) c += 1
      i += 1
    }
    c
  }

  /** 0-based indices of `arr` elements present in the sorted `set`
    * (binary search per element; output ascends by construction).
    * The positional form of [[countInSortedSet]] — span-cut guards
    * need WHICH windows matched, not how many. */
  def positionsInSortedSet(arr: ArrayData, set: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val hits = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) {
        hits(m) = i; m += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == n) hits else java.util.Arrays.copyOf(hits, m))
  }

  /** Membership-count guard against a driver-built sorted hash set —
    * the stateless form of a small-side semi-join (the set rides along
    * as a codegen reference object, once per task). Built for streaming
    * decontamination: a micro-batch row is checked map-only, with no
    * stream join and no state. */
  case class CountInSortedSetExpr(child: Expression, set: Array[Long])
      extends UnaryExpression {
    // sortedness is validated ONCE in countInSortedSetCol — Catalyst
    // copies expressions on every transform (and streams re-plan per
    // micro-batch), so a per-copy O(n) check on a multi-million-entry
    // set would be paid over and over
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(child, LongType, prettyName)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "count_in_sorted_set"

    override def nullSafeEval(a: Any): Any =
      countInSortedSet(a.asInstanceOf[ArrayData], set)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setRef = ctx.addReferenceObj("sortedSet", set, "long[]")
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} =
        |  graft.functions.TextHashExprs.countInSortedSet($a, $setRef);
        """.stripMargin)
    }

    // structural equality/explain must not walk the (large) set
    override def flatArguments: Iterator[Any] = Iterator(child)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class PositionsInSortedSetExpr(child: Expression, set: Array[Long])
      extends UnaryExpression {
    // sortedness is validated ONCE in positionsInSortedSetCol — same
    // per-copy-cost argument as CountInSortedSetExpr above
    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayOf(child, LongType, prettyName)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "positions_in_sorted_set"

    override def nullSafeEval(a: Any): Any =
      positionsInSortedSet(a.asInstanceOf[ArrayData], set)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setRef = ctx.addReferenceObj("sortedSet", set, "long[]")
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} =
        |  graft.functions.TextHashExprs.positionsInSortedSet($a, $setRef);
        """.stripMargin)
    }

    // structural equality/explain must not walk the (large) set
    override def flatArguments: Iterator[Any] = Iterator(child)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ----- Column API -----
  def shingleHashesCol(tokens: Column, k: Int): Column =
    GraftColumnBridge.column(
      ShingleHashesExpr(GraftColumnBridge.expression(tokens), k))
  def minHashFromHashesCol(hashes: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashFromHashesExpr(GraftColumnBridge.expression(hashes), numHashes))
  def simHashSigCol(tokens: Column): Column =
    GraftColumnBridge.column(
      SimHashSigExpr(GraftColumnBridge.expression(tokens)))
  def portableFingerprintsCol(tokens: Column, k: Int, keep: Int): Column =
    GraftColumnBridge.column(
      PortableFpExpr(GraftColumnBridge.expression(tokens), k, keep))
  def positionalFingerprintsCol(tokens: Column, k: Int): Column =
    GraftColumnBridge.column(
      PositionalFpExpr(GraftColumnBridge.expression(tokens), k))
  def portableMinHashCol(hashes: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      PortableMinHashExpr(GraftColumnBridge.expression(hashes), numHashes))
  def portableSimHashCol(tokens: Column): Column =
    GraftColumnBridge.column(
      PortableSimHashExpr(GraftColumnBridge.expression(tokens)))
  def positionsInSortedSetCol(hashes: Column, set: Array[Long]): Column = {
    var i = 1 // allocation-free ascending check, once per plan build
    while (i < set.length) {
      require(set(i - 1) <= set(i),
        "positionsInSortedSet needs an ascending-sorted set (binary search)")
      i += 1
    }
    GraftColumnBridge.column(
      PositionsInSortedSetExpr(GraftColumnBridge.expression(hashes), set))
  }
  def countInSortedSetCol(hashes: Column, set: Array[Long]): Column = {
    var i = 1 // allocation-free ascending check, once per plan build
    while (i < set.length) {
      require(set(i - 1) <= set(i),
        "countInSortedSet needs an ascending-sorted set (binary search)")
      i += 1
    }
    GraftColumnBridge.column(
      CountInSortedSetExpr(GraftColumnBridge.expression(hashes), set))
  }
}
