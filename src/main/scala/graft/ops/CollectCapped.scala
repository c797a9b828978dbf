package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `collect_list` with a hard cap on aggregation-buffer size.
  *
  * The built-in `collect_list` buffers EVERY group member — on a posting
  * list keyed by n-gram, one corpus-frequent gram ("the " at 100 TB)
  * would accumulate the whole corpus into a single aggregation buffer.
  * This aggregate stops retaining ids past `cap`, so per-group state is
  * O(cap) no matter how hot the key, while a companion `count(*)` in the
  * same aggregation still reports the TRUE group size. Callers that
  * filter to `count <= cap` therefore get complete lists exactly where
  * the list is small enough to matter, and bounded memory everywhere
  * else — the contract the df-pruned set-similarity join needs.
  */
object CollectCapped {

  final class Buffer(val cap: Int) {
    var ids = new Array[Long](math.min(cap, 16))
    var n = 0
    def add(v: Long): Unit = if (n < cap) {
      if (n == ids.length)
        ids = java.util.Arrays.copyOf(ids, math.min(cap, ids.length * 2))
      ids(n) = v; n += 1
    }
  }

  case class CollectCappedAgg(
      child: Expression,
      cap: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buffer] with UnaryLike[Expression]
    with ImplicitCastInputTypes {
    require(cap >= 1, "collect_capped needs cap >= 1")

    // analysis-time type contract: without it a non-Long child passed
    // analysis and died per-row with ClassCastException inside update()
    override def inputTypes: Seq[DataType] = Seq(LongType)

    override def createAggregationBuffer(): Buffer = new Buffer(cap)

    override def update(buffer: Buffer, input: InternalRow): Buffer = {
      val v = child.eval(input)
      if (v != null) buffer.add(v.asInstanceOf[Long])
      buffer
    }

    override def merge(buffer: Buffer, other: Buffer): Buffer = {
      var i = 0
      while (i < other.n && buffer.n < cap) { buffer.add(other.ids(i)); i += 1 }
      buffer
    }

    override def eval(buffer: Buffer): Any =
      new GenericArrayData(java.util.Arrays.copyOf(buffer.ids, buffer.n))

    override def serialize(buffer: Buffer): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * buffer.n)
      bb.putInt(buffer.n)
      var i = 0
      while (i < buffer.n) { bb.putLong(buffer.ids(i)); i += 1 }
      bb.array()
    }

    override def deserialize(storage: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(storage)
      val buffer = createAggregationBuffer()
      val n = bb.getInt
      var i = 0
      while (i < n) { buffer.add(bb.getLong); i += 1 }
      buffer
    }

    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def withNewMutableAggBufferOffset(o: Int): ImperativeAggregate =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ImperativeAggregate =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): CollectCappedAgg =
      copy(child = newChild)
    override def prettyName: String = "collect_capped"
  }

  /** Aggregate column: first-`cap` longs of the group (see contract above). */
  def collectCapped(c: Column, cap: Int): Column =
    GraftBridge.column(
      CollectCappedAgg(GraftBridge.expression(c), cap).toAggregateExpression())
}
