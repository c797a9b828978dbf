package graft.ops

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Exact per-group top-k with bounded aggregation state.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY ...)` followed by
  * `rn <= k` serializes every row of a group through one window task —
  * with low-cardinality groups (priority buckets, language strata) the
  * dominant group becomes a single-task bottleneck at scale, and the
  * whole table crosses the shuffle. Top-k is an aggregation, not a
  * window: each map task keeps a k-row heap per group (partial
  * aggregation), the shuffle moves only `k × maps` rows per group, and
  * the reduce side merges heaps. State is O(k) regardless of group
  * size, so the plan survives a 100x scale-up unchanged.
  *
  * Mirrors the reference's limit-per-group extracts
  * (geoparquet_io/core/extract.py) without the window bottleneck.
  */
object TopK {

  /** Heap of the current best ≤ k rows. `ord` is the rank order
    * (smallest = rank 1); the heap is a max-heap under `ord` so the
    * head is the worst kept row, evicted on a better insert.
    */
  final class Buffer(val k: Int, ord: Ordering[InternalRow]) {
    val heap = new java.util.PriorityQueue[UnsafeRow](k + 1, ord.reverse)
    def insert(row: UnsafeRow): Unit = {
      if (heap.size < k) heap.offer(row.copy())
      else if (ord.compare(row, heap.peek) < 0) {
        heap.poll(); heap.offer(row.copy())
      }
    }
  }

  /** Aggregate over `struct(orderKey..., payload...)` rows: evaluates to
    * `array<struct>` of the k smallest rows under the key order (first
    * `numKeys` struct fields, with per-key descending flags), ascending —
    * element i is the rank-(i+1) row.
    */
  case class TopKRows(
      child: Expression,
      k: Int,
      numKeys: Int,
      descending: Seq[Boolean],
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buffer] with UnaryLike[Expression] {
    require(k >= 1, "top-k needs k >= 1")

    private def structType: StructType = child.dataType.asInstanceOf[StructType]

    @transient private lazy val rankOrdering: Ordering[InternalRow] = {
      val fields = structType.fields
      new InterpretedOrdering((0 until numKeys).map { i =>
        SortOrder(BoundReference(i, fields(i).dataType, fields(i).nullable),
          if (descending(i)) Descending else Ascending)
      })
    }
    @transient private lazy val toUnsafe: UnsafeProjection =
      UnsafeProjection.create(structType.fields.map(_.dataType))

    override def createAggregationBuffer(): Buffer = new Buffer(k, rankOrdering)

    override def update(buffer: Buffer, input: InternalRow): Buffer = {
      val v = child.eval(input)
      if (v != null) buffer.insert(toUnsafe(v.asInstanceOf[InternalRow]))
      buffer
    }

    override def merge(buffer: Buffer, other: Buffer): Buffer = {
      val it = other.heap.iterator()
      while (it.hasNext) buffer.insert(it.next())
      buffer
    }

    override def eval(buffer: Buffer): Any = {
      val arr = new Array[UnsafeRow](buffer.heap.size)
      buffer.heap.toArray(arr)
      java.util.Arrays.sort(arr, rankOrdering)
      new GenericArrayData(arr.asInstanceOf[Array[Any]])
    }

    override def serialize(buffer: Buffer): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buffer.heap.size)
      val it = buffer.heap.iterator()
      while (it.hasNext) {
        val row = it.next()
        val bytes = row.getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(storage: Array[Byte]): Buffer = {
      val in = ByteBuffer.wrap(storage)
      val buffer = createAggregationBuffer()
      val n = in.getInt
      val width = structType.length
      var i = 0
      while (i < n) {
        val len = in.getInt
        val bytes = new Array[Byte](len)
        in.get(bytes)
        val row = new UnsafeRow(width)
        row.pointTo(bytes, len)
        buffer.insert(row)
        i += 1
      }
      buffer
    }

    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
    override def withNewMutableAggBufferOffset(o: Int): ImperativeAggregate =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ImperativeAggregate =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): TopKRows =
      copy(child = newChild)
    override def prettyName: String = "top_k_rows"
  }

  /** Exact top-k rows per group, ranked 1..k in `rankCol` (int).
    *
    * Output columns = the input columns plus `rankCol`; row r of group g
    * equals the window formulation
    * `row_number() OVER (PARTITION BY groupCols ORDER BY order...) = r`
    * whenever the order is total within each group (tie-broken by a
    * unique column), with O(k) state per group per task instead of a
    * full-group window.
    *
    * @param order (column, descending) rank keys, highest priority first.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      order: Seq[(Column, Boolean)], k: Int, rankCol: String): DataFrame = {
    val payload = df.columns.toSeq
    val packed = struct(
      order.zipWithIndex.map { case ((c, _), i) => c.as(s"__k$i") } ++
        payload.map(col): _*)
    val agg = GraftBridge.column(
      TopKRows(GraftBridge.expression(packed), k, order.size,
        order.map(_._2)).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(agg.as("__top"))
      .select(posexplode(col("__top")).as(Seq("__pos", "__row")))
      .select(payload.map(n => col(s"__row.$n").as(n)) :+
        (col("__pos") + 1).cast("int").as(rankCol): _*)
  }
}
