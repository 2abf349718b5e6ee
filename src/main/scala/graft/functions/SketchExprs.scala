package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable sketch aggregates (custom Catalyst
  * `TypedImperativeAggregate`s — the SURVEY §2.10 extension surface).
  *
  * Sketches are the aggregation story at 100 TB: a bounded buffer per
  * group per partition, combined map-side, merged associatively across
  * partitions — the full shuffle carries k values per (partition,
  * group), never the data. Spark ships HyperLogLog++
  * (`approx_count_distinct`), but its register layout is
  * engine-internal: no external system can replay it, so a result
  * carrying it can't be hash-audited. The KMV sketch here trades a
  * little accuracy for EXACT replayability — its state is the k
  * smallest values of a portable hash, a deterministic set any SQL
  * engine reproduces with `row_number() OVER (ORDER BY hash)`, making
  * the estimate itself bit-for-bit checkable by the battery oracle.
  */
object SketchExprs {

  /** Numeric coercion for aggregate inputs: SQL callers pass INT
    * literals (`topk_freq(w, 1, 0, 64)` per its own usage doc) whose
    * eval yields java.lang.Integer — a raw asInstanceOf[Long] would
    * ClassCastException at execution. (`AbstractDataType` is
    * private[sql], so the ImplicitCastInputTypes route is not open to
    * an external library; runtime widening is.) */
  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case n: java.lang.Number => n.longValue()
    case d: Decimal => d.toLong
    case other => throw new IllegalArgumentException(
      s"numeric argument expected, got ${other.getClass.getName}")
  }

  private def asDouble(v: Any): Double = v match {
    case d: java.lang.Double => d
    case n: java.lang.Number => n.doubleValue()
    case d: Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"numeric argument expected, got ${other.getClass.getName}")
  }

  /** K-Minimum-Values distinct-count sketch (Bar-Yossef et al.,
    * RANDOM '02; the "bottom-k" form surveyed in Cohen & Kaplan, PODS
    * '07) over an already-hashed LONG column. Keeps the k smallest
    * DISTINCT non-null hash values; the estimator reads the kth
    * smallest as a density sample: fewer than k distinct hashes seen
    * means the count is exact, otherwise `(k-1) * space / kth`.
    *
    * Returns `struct(n_retained int, kth_min long, estimate double)`
    * — `estimate` is computed from the other two with `space` (the
    * hash range, exclusive upper bound), so an external replay derives
    * all three from the same rank-≤-k hash set.
    *
    * Merge is set-union re-capped at k — associative and commutative,
    * so partial aggregation (map-side combine) applies; the buffer
    * never exceeds k longs. Skew-immune: a hot group costs k longs per
    * partition, not its cardinality. */
  /** With `emitState = true` the aggregate returns the raw sorted
    * k-min hash ARRAY instead of the summary struct — the persistable
    * sketch-table form: store one array per fine-grained group (per
    * day, per shard), then roll coarser granularities up later by
    * merging arrays instead of re-scanning 100 TB of history
    * ([[graft.pipeline.Sketches.mergeSketches]]). */
  case class KmvSketch(
      child: Expression, k: Int, space: Long,
      emitState: Boolean = false,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

    require(k >= 2, s"KMV needs k >= 2, got $k")
    require(space > 0, s"hash space must be positive, got $space")

    override def prettyName: String = "kmv_distinct"
    override def nullable: Boolean = false
    override def dataType: DataType =
      if (emitState) ArrayType(LongType, containsNull = false)
      else StructType(Seq(
        StructField("n_retained", IntegerType, nullable = false),
        StructField("kth_min", LongType, nullable = true),
        StructField("estimate", DoubleType, nullable = false)))

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    private def insert(buf: java.util.TreeSet[java.lang.Long],
                       h: Long): Unit = {
      if (buf.size < k) { buf.add(h); () }
      else if (h < buf.last) {
        // strictly smaller than the current kth: replace. Equal or
        // larger values can't be among the k smallest (TreeSet already
        // dedups equal hashes).
        if (buf.add(h)) buf.pollLast()
        ()
      }
    }

    override def update(buf: java.util.TreeSet[java.lang.Long],
                        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) insert(buf, v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: java.util.TreeSet[java.lang.Long],
                       other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = other.iterator()
      while (it.hasNext) insert(buf, it.next())
      buf
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
      if (emitState) {
        val arr = new Array[Long](buf.size)
        val it = buf.iterator()
        var i = 0
        while (it.hasNext) { arr(i) = it.next(); i += 1 }
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
      } else {
        val n = buf.size
        val kth: java.lang.Long = if (n == 0) null else buf.last
        val est =
          if (n < k) n.toDouble // saw the whole population: exact
          else (k - 1).toDouble * space.toDouble / buf.last.toDouble
        InternalRow(n, kth, est)
      }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * buf.size)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KmvSketch =
      copy(child = newChild)
  }

  /** Space-Saving heavy-hitters sketch (Metwally, Agrawal & El Abbadi,
    * ICDT '05) over a STRING item column, with the summary-reinsertion
    * merge of Agarwal et al., "Mergeable Summaries" (PODS '12).
    *
    * State: at most `m` counters `(item → (count, err))`. A present
    * item's arrival adds its weight to `count`; a new item beyond
    * capacity evicts the minimum-count counter and INHERITS its count
    * as both starting mass and overestimate bound (`err`). The
    * classical guarantees follow: `count` never underestimates the
    * item's true frequency, `count − err` never overestimates it, and
    * every item with true frequency > N/m is retained.
    *
    * `weight`/`errw` generalize the unit update so a PERSISTED sketch
    * rolls up through the same operator: re-inserting a stored counter
    * `(item, count, err)` as weight=count, errw=err is exactly the
    * PODS '12 re-insertion merge (on eviction the victim's count adds
    * to the incoming `err` too). Raw-data callers pass weight=1,
    * errw=0.
    *
    * Determinism: with NO evictions (distinct items ≤ m in every
    * partial) the counters are exact, err is 0, and the output is a
    * pure function of the input multiset — the battery oracle replays
    * it with GROUP BY + ORDER BY. Under eviction pressure the retained
    * SET can depend on Spark's partition-merge order (inherent to every
    * counter-based summary); the ε-bounds above still hold and the
    * property spec asserts those instead. Output: the full counter
    * array sorted (count desc, err asc, item asc) — top-k selection is
    * a downstream `slice`, not the aggregate's business.
    *
    * Scale shape: partial aggregation applies; a hot group crosses the
    * shuffle as ≤ m counters per partition regardless of cardinality
    * (the [[KmvSketch]] argument, applied to frequency). */
  case class SpaceSavingTopK(
      item: Expression, weight: Expression, errw: Expression, m: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]]
    with TernaryLike[Expression] {

    require(m >= 1, s"Space-Saving needs m >= 1 counters, got $m")

    override def first: Expression = item
    override def second: Expression = weight
    override def third: Expression = errw

    override def prettyName: String = "topk_freq"
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
      containsNull = false)

    override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
      new java.util.HashMap[String, Array[Long]]()

    private def insert(buf: java.util.HashMap[String, Array[Long]],
                       key: String, w: Long, e: Long): Unit = {
      val cur = buf.get(key)
      if (cur != null) { cur(0) += w; cur(1) += e; return }
      if (buf.size < m) { buf.put(key, Array(w, e)); return }
      // evict the minimum-count counter; fixed tie-break (max err,
      // then max key) keeps single-sequence evaluation deterministic
      var vKey: String = null
      var vCnt = Long.MaxValue
      var vErr = -1L
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        val c = en.getValue()(0); val er = en.getValue()(1)
        if (c < vCnt || (c == vCnt && (er > vErr ||
            (er == vErr && (vKey == null || en.getKey.compareTo(vKey) > 0))))) {
          vKey = en.getKey; vCnt = c; vErr = er
        }
      }
      buf.remove(vKey)
      buf.put(key, Array(vCnt + w, vCnt + e))
    }

    override def update(buf: java.util.HashMap[String, Array[Long]],
                        input: InternalRow): java.util.HashMap[String, Array[Long]] = {
      val k = item.eval(input)
      if (k != null) {
        val w = weight.eval(input)
        if (w != null) {
          val e = errw.eval(input)
          insert(buf, k.toString, asLong(w),
            if (e == null) 0L else asLong(e))
        }
      }
      buf
    }

    override def merge(buf: java.util.HashMap[String, Array[Long]],
                       other: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
      val it = other.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        insert(buf, en.getKey, en.getValue()(0), en.getValue()(1))
      }
      buf
    }

    override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
      val entries = new Array[(String, Long, Long)](buf.size)
      val it = buf.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        val en = it.next()
        entries(i) = (en.getKey, en.getValue()(0), en.getValue()(1))
        i += 1
      }
      val sorted = entries.sortWith { (a, b) =>
        if (a._2 != b._2) a._2 > b._2
        else if (a._3 != b._3) a._3 < b._3
        else a._1 < b._1
      }
      new GenericArrayData(sorted.map { case (k, c, e) =>
        InternalRow(UTF8String.fromString(k), c, e)
      }.toArray[Any])
    }

    override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
      // encode each key ONCE (serialize runs per shuffle row on the
      // partial-aggregation hot path)
      val encoded = new Array[(Array[Byte], Array[Long])](buf.size)
      var bytes = 4
      var i = 0
      val it0 = buf.entrySet().iterator()
      while (it0.hasNext) {
        val en = it0.next()
        val kb = en.getKey.getBytes(StandardCharsets.UTF_8)
        encoded(i) = (kb, en.getValue)
        bytes += 4 + kb.length + 16
        i += 1
      }
      val bb = ByteBuffer.allocate(bytes)
      bb.putInt(buf.size)
      encoded.foreach { case (kb, cnts) =>
        bb.putInt(kb.length); bb.put(kb)
        bb.putLong(cnts(0)); bb.putLong(cnts(1))
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new java.util.HashMap[String, Array[Long]](n * 2)
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val kb = new Array[Byte](len); bb.get(kb)
        buf.put(new String(kb, StandardCharsets.UTF_8),
          Array(bb.getLong, bb.getLong))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): SpaceSavingTopK =
      copy(item = newFirst, weight = newSecond, errw = newThird)
  }

  /** Bottom-k-by-hash uniform sample — the quantile-sketch member of
    * the portable-hash family. Keeps the `k` rows whose 48-bit
    * portable hash of a UNIQUE row key is smallest, carrying one
    * DOUBLE measure per retained row. Because the hash is a fixed
    * pseudorandom permutation of row identities, the retained set is a
    * uniform k-sample WITHOUT replacement that is (a) deterministic,
    * (b) order- and partition-independent (bottom-k union is
    * associative and commutative, same argument as [[KmvSketch]]), and
    * (c) externally replayable: any engine reproduces it with
    * `row_number() OVER (ORDER BY hash) <= k`. Rank-based statistics
    * (quantiles) read off the sorted sample with standard
    * sampling error O(1/√k) in rank; when a group has ≤ k rows the
    * sample IS the group and every quantile is exact.
    *
    * A KLL sketch (Karnin-Lang-Liberty, FOCS '16) achieves a better
    * ε-vs-space trade, but its compaction is randomized — two runs
    * disagree, and nothing outside the engine can audit the result.
    * This repo's discipline is replayability first; the sample's
    * √k error is priced in the scaladoc of the callers.
    *
    * Hash collisions (two distinct rows, same 48-bit hash) resolve
    * deterministically to the SMALLER measure; the oracle replays that
    * with `min(v) … GROUP BY hash`. Output: `array<struct<h, v>>`
    * sorted by hash — the canonical persistable state; quantile
    * extraction is downstream column arithmetic. */
  case class BottomKSample(
      hash: Expression, value: Expression, k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]]
    with BinaryLike[Expression] {

    require(k >= 1, s"bottom-k sample needs k >= 1, got $k")

    override def left: Expression = hash
    override def right: Expression = value

    override def prettyName: String = "bottomk_sample"
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false))),
      containsNull = false)

    override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
      new java.util.TreeMap[java.lang.Long, java.lang.Double]()

    private def insert(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                       h: Long, v: Double): Unit = {
      val cur = buf.get(h)
      if (cur != null) {
        // total order (Double.compare): `v < cur` is order-dependent
        // when a measure is NaN (NaN never compares less), breaking
        // the documented min(v)-replay determinism — NaN sorts ABOVE
        // every finite value, so finite always wins regardless of
        // insertion order
        if (java.lang.Double.compare(v, cur) < 0) { buf.put(h, v); () }
      } else if (buf.size < k) {
        buf.put(h, v); ()
      } else if (h < buf.lastKey) {
        buf.put(h, v); buf.pollLastEntry(); ()
      }
    }

    override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                        input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
      val h = hash.eval(input)
      if (h != null) {
        val v = value.eval(input)
        if (v != null) {
          insert(buf, asLong(h), asDouble(v))
        }
      }
      buf
    }

    override def merge(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                       other: java.util.TreeMap[java.lang.Long, java.lang.Double]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
      val it = other.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        insert(buf, en.getKey, en.getValue)
      }
      buf
    }

    override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
      val out = new Array[Any](buf.size)
      val it = buf.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        val en = it.next()
        out(i) = InternalRow(en.getKey.longValue(), en.getValue.doubleValue())
        i += 1
      }
      new GenericArrayData(out)
    }

    override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 16 * buf.size)
      bb.putInt(buf.size)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        bb.putLong(en.getKey); bb.putDouble(en.getValue)
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new java.util.TreeMap[java.lang.Long, java.lang.Double]()
      var i = 0
      while (i < n) {
        buf.put(bb.getLong, bb.getDouble)
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BottomKSample =
      copy(hash = newLeft, value = newRight)
  }

  /** The portable row-hash shared by [[CmSketch]] and its driver-side
    * replay: the first 12 hex digits of md5("r:item") as a long —
    * DuckDB spells the identical value
    * `('0x' || substr(md5(r || ':' || item), 1, 12))::BIGINT`. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[graft] def cmHash48(row: Int, item: String): Long = {
    val md = md5Local.get() // per-row × per-depth hot path: no
    md.reset()              // per-call getInstance allocation
    val d = md.digest((row.toString + ":" + item)
      .getBytes(StandardCharsets.UTF_8))
    // first 12 hex digits = top 6 bytes, big-endian
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms '05)
    * over a STRING item column with a LONG weight: `depth` rows of
    * `width` counters; each arrival adds its weight to one counter per
    * row, the row's bucket chosen by a per-row portable hash
    * ([[cmHash48]] mod width). A point-frequency query reads the MIN
    * of its `depth` counters — never an underestimate for
    * non-negative weights, over by at most `e/width · N` with
    * probability `1 − e^-depth`.
    *
    * The family member that completes the mergeable-summary set (KMV
    * cardinality, Space-Saving top-k, bottom-k quantiles): frequency
    * POINT LOOKUP over items nobody pre-declared — top-k only answers
    * for items the sketch retained; CM answers for any item, including
    * one that never arrived (answer ≤ noise bound).
    *
    * Merge is cellwise sum — exactly associative AND commutative with
    * no eviction anywhere, so unlike Space-Saving under pressure the
    * result is a pure function of the input multiset in EVERY regime:
    * the battery oracle replays sketch cells and estimates
    * bit-for-bit at any scale. Output: the `depth·width` cell array,
    * row-major — estimates are downstream column arithmetic
    * ([[graft.pipeline.Sketches.cmEstimates]]), persistence/rollup is
    * a cellwise-sum GROUP BY ([[graft.pipeline.Sketches.mergeCmSketches]]).
    *
    * Scale shape: partial aggregation applies; a group crosses the
    * shuffle as `depth·width` longs per partition regardless of item
    * cardinality or skew. Size `width ≥ e/ε` for additive error
    * `ε·N`; `depth = 4` gives the standard 98% confidence. */
  case class CmSketch(
      item: Expression, weight: Expression, depth: Int, width: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with BinaryLike[Expression] {

    require(depth >= 1 && depth <= 16,
      s"CM depth must lie in [1, 16], got $depth")
    require(width >= 1, s"CM width must be positive, got $width")
    require(depth.toLong * width <= (1L << 22),
      s"CM state depth*width=${depth.toLong * width} exceeds 4M cells — " +
        "this buffer crosses the shuffle per (partition, group); size " +
        "width to the error bound, not the cardinality")

    override def left: Expression = item
    override def right: Expression = weight

    override def prettyName: String = "cm_sketch"
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val k = item.eval(input)
      if (k != null) {
        val w = weight.eval(input)
        if (w != null) {
          val s = k.toString
          val wl = asLong(w)
          var r = 0
          while (r < depth) {
            buf(r * width + (cmHash48(r, s) % width).toInt) += wl
            r += 1
          }
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any =
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * buf.length)
      bb.asLongBuffer().put(buf)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val buf = new Array[Long](bytes.length / 8)
      ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): CmSketch =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CmSketch =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CmSketch =
      copy(item = newLeft, weight = newRight)
  }
}
