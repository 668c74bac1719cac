package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded ordered collect: keep the `k` entries with the SMALLEST `ord` and
  * return their values sorted by (ord, value) ascending.
  *
  * This is the skew-safe primitive behind sessionize / multiline folding:
  * `collect_list` holds every row of a group in one aggregation buffer, so a
  * hot conv_id (the repo's own generator routes 20% of all rows to conv 0)
  * concentrates that share of the corpus in ONE task's memory. This
  * aggregate's buffer is a size-k max-heap — bounded regardless of group
  * size — and it merges partially (map-side combine keeps every partial
  * buffer ≤ k too), so a 10^11-turn hot conversation costs each task at most
  * k entries. The cap is the reference's own shape: multiline enforces
  * `max_lines` per event (multiline/multiline_config.go:54,
  * message_buffer.go addLine), truncating pathological events instead of
  * buffering them unboundedly.
  */
case class OrderedTopKStrings(left: Expression, right: Expression, k: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[OrderedTopKStrings.Buf]
    with BinaryLike[Expression] {
  require(k > 0, s"ordered_topk: k must be positive, got $k")

  import OrderedTopKStrings._

  def ord: Expression = left
  def value: Expression = right

  // analysis-time typing: a wrong-typed ordering column must fail the query
  // plan, not throw ClassCastException mid-job after the shuffle ran
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"ordered_topk ordering column must be INT, got ${left.dataType.simpleString}")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ordered_topk value column must be STRING, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def prettyName: String = "ordered_topk_strings"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val o = ord.eval(input)
    val v = value.eval(input)
    if (o != null && v != null)
      buf.offer(o.asInstanceOf[Int], v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = { buf.absorb(other); buf }

  override def eval(buf: Buf): Any = new GenericArrayData(buf.sortedValues)

  override def serialize(buf: Buf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Buf = Buf.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): OrderedTopKStrings =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OrderedTopKStrings =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): OrderedTopKStrings =
    copy(left = l, right = r)
}

object OrderedTopKStrings {

  /** size-bounded max-heap over (ord, value); keeps the k smallest. */
  final class Buf(val k: Int) {
    private var ords = new Array[Int](math.min(k, 16))
    private var vals = new Array[UTF8String](math.min(k, 16))
    private var n = 0

    @inline private def gt(i: Int, oOrd: Int, oVal: UTF8String): Boolean = {
      val c = java.lang.Integer.compare(ords(i), oOrd)
      c > 0 || (c == 0 && vals(i).compareTo(oVal) > 0)
    }

    def offer(o: Int, v0: UTF8String): Unit = {
      if (n == k && !gt(0, o, v0)) return // not better than current worst
      val v = v0.clone() // input buffers are reused — must own the bytes
      if (n < k) {
        if (n == ords.length) {
          val cap = math.min(k.toLong, ords.length * 2L).toInt
          ords = java.util.Arrays.copyOf(ords, cap)
          vals = java.util.Arrays.copyOf(vals, cap)
        }
        ords(n) = o; vals(n) = v; n += 1
        siftUp(n - 1)
      } else {
        ords(0) = o; vals(0) = v
        siftDown(0)
      }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) >> 1
        if (gt(i, ords(p), vals(p))) { swap(i, p); i = p } else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && gt(l, ords(m), vals(m))) m = l
        if (r < n && gt(r, ords(m), vals(m))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val to = ords(a); ords(a) = ords(b); ords(b) = to
      val tv = vals(a); vals(a) = vals(b); vals(b) = tv
    }

    def absorb(other: Buf): Unit = {
      var i = 0
      while (i < other.n) { offer(other.ords(i), other.vals(i)); i += 1 }
    }

    def sortedValues: Array[Any] = {
      val idx = (0 until n).sortBy(i => (ords(i), vals(i)))
      idx.map(vals(_): Any).toArray
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(n)
      var i = 0
      while (i < n) {
        out.writeInt(ords(i))
        val b = vals(i).getBytes
        out.writeInt(b.length)
        out.write(b)
        i += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Buf {
    def fromBytes(bytes: Array[Byte], k: Int): Buf = {
      val in = ByteBuffer.wrap(bytes)
      val buf = new Buf(k)
      val n = in.getInt
      var i = 0
      while (i < n) {
        val o = in.getInt
        val len = in.getInt
        val b = new Array[Byte](len)
        in.get(b)
        buf.offer(o, UTF8String.fromBytes(b))
        i += 1
      }
      buf
    }
  }
}

/** Bounded best-k by score: keep the `k` (score, id) pairs with the LARGEST
  * score (ties broken by smallest id) and return them as an
  * array<struct<neighbor_id:long, cos:double>> sorted by (score desc, id).
  *
  * This is the skew-safe per-query top-k for the ANN paths: `row_number()
  * .over(Window.partitionBy(query_id))` sorts EVERY candidate of a query in
  * one task — at 10^12 corpus vectors a query's candidate set (LSH ~L/2^b of
  * the corpus, IVF ~nprobe/nlist) is millions of rows, a guaranteed
  * straggler/spill. This aggregate holds at most k entries per buffer, merges
  * partially (map-side combine bounds every partial too), and the shuffle
  * carries one ≤k-entry buffer per (partition, query) instead of every
  * candidate row.
  */
case class TopKByScore(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByScore.Buf]
    with BinaryLike[Expression] {
  require(k > 0, s"topk_by_score: k must be positive, got $k")

  import TopKByScore._

  def score: Expression = left
  def id: Expression = right

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score score column must be DOUBLE, got ${left.dataType.simpleString}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score id column must be BIGINT, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def prettyName: String = "topk_by_score"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("neighbor_id", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = score.eval(input)
    val v = id.eval(input)
    if (s != null && v != null)
      buf.offer(s.asInstanceOf[Double], v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = { buf.absorb(other); buf }

  override def eval(buf: Buf): Any = new GenericArrayData(buf.sortedEntries)

  override def serialize(buf: Buf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Buf = Buf.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKByScore =
    copy(left = l, right = r)
}

object TopKByScore {

  /** size-bounded min-heap over (score desc, id asc) preference: the root is
    * the WORST entry kept, evicted when a better candidate arrives. */
  final class Buf(val k: Int) {
    private var scores = new Array[Double](math.min(k, 16))
    private var ids = new Array[Long](math.min(k, 16))
    private var n = 0

    // entry i is WORSE than (s, id): lower score, or same score + larger id
    @inline private def worse(i: Int, s: Double, id: Long): Boolean = {
      val c = java.lang.Double.compare(scores(i), s)
      c < 0 || (c == 0 && ids(i) > id)
    }

    def offer(s: Double, id: Long): Unit = {
      if (n == k && !worse(0, s, id)) return // not better than current worst
      if (n < k) {
        if (n == scores.length) {
          val cap = math.min(k.toLong, scores.length * 2L).toInt
          scores = java.util.Arrays.copyOf(scores, cap)
          ids = java.util.Arrays.copyOf(ids, cap)
        }
        scores(n) = s; ids(n) = id; n += 1
        siftUp(n - 1)
      } else {
        scores(0) = s; ids(0) = id
        siftDown(0)
      }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(i, scores(p), ids(p))) { swap(i, p); i = p } else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && worse(l, scores(m), ids(m))) m = l
        if (r < n && worse(r, scores(m), ids(m))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def absorb(other: Buf): Unit = {
      var i = 0
      while (i < other.n) { offer(other.scores(i), other.ids(i)); i += 1 }
    }

    def sortedEntries: Array[Any] = {
      val idx = (0 until n).sortBy(i => (-scores(i), ids(i)))
      idx.map { i =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](ids(i), scores(i))): Any
      }.toArray
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(n)
      var i = 0
      while (i < n) {
        out.writeDouble(scores(i))
        out.writeLong(ids(i))
        i += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Buf {
    def fromBytes(bytes: Array[Byte], k: Int): Buf = {
      val in = ByteBuffer.wrap(bytes)
      val buf = new Buf(k)
      val n = in.getInt
      var i = 0
      while (i < n) {
        val s = in.getDouble
        val id = in.getLong
        buf.offer(s, id)
        i += 1
      }
      buf
    }
  }
}
