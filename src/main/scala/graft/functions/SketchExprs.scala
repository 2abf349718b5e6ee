package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

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
}
