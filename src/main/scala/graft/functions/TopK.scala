package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Partial-aggregable bounded top-k — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(lowCardinalityCol))` top-k
  * queries (round-2/3 verdict on `order_priority_rank`: a 5-class window
  * funnels the whole table into 5 sort tasks at ANY scale).
  *
  * As a [[TypedImperativeAggregate]] the accumulator is a ≤k-element
  * sorted list, so map-side partial aggregation reduces each task's
  * contribution to k rows per group BEFORE the shuffle: the exchange
  * carries O(tasks × groups × k) tiny rows instead of the full table, and
  * the final merge is trivial. This is the aggregation-form of the
  * reference's "first record at/after offset" point-read
  * (`log_engine.rs:75-102`) generalized to k results.
  */
object TopK {

  /** top_k_structs(structCol, k): the k smallest struct values under the
    * struct's natural (field-lexicographic, all-ascending) ordering,
    * returned as a sorted array. Encode a DESC key by negating it. */
  case class TopKStructAgg(child: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.ArrayBuffer[InternalRow]]
      with UnaryLike[Expression] {
    require(k > 0, "k must be positive")

    private lazy val structType = child.dataType.asInstanceOf[StructType]
    private lazy val fieldTypes = structType.fields.map(_.dataType)
    @transient private lazy val ordering =
      TypeUtils.getInterpretedOrdering(structType)

    override def dataType: DataType = ArrayType(structType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "top_k_structs"

    override def createAggregationBuffer(): mutable.ArrayBuffer[InternalRow] =
      mutable.ArrayBuffer.empty

    /** Insert `r` keeping the buffer sorted ascending and ≤ k long.
      * k is small (single digits): linear insertion is optimal here. */
    private def insert(buf: mutable.ArrayBuffer[InternalRow],
                       r: InternalRow): Unit = {
      if (buf.length >= k && ordering.compare(r, buf.last) >= 0) return
      var i = 0
      while (i < buf.length && ordering.compare(buf(i), r) <= 0) i += 1
      buf.insert(i, r.copy())
      if (buf.length > k) buf.remove(buf.length - 1)
    }

    override def update(buf: mutable.ArrayBuffer[InternalRow],
                        input: InternalRow): mutable.ArrayBuffer[InternalRow] = {
      val v = child.eval(input)
      if (v != null) insert(buf, v.asInstanceOf[InternalRow])
      buf
    }

    override def merge(buf: mutable.ArrayBuffer[InternalRow],
                       other: mutable.ArrayBuffer[InternalRow]): mutable.ArrayBuffer[InternalRow] = {
      other.foreach(insert(buf, _))
      buf
    }

    override def eval(buf: mutable.ArrayBuffer[InternalRow]): Any =
      new GenericArrayData(buf.toArray[Any])

    override def serialize(buf: mutable.ArrayBuffer[InternalRow]): Array[Byte] = {
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(fieldTypes)
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.length)
      buf.foreach { r =>
        val u = proj(r)
        out.writeInt(u.getSizeInBytes)
        u.writeToStream(out, null)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[InternalRow] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = mutable.ArrayBuffer.empty[InternalRow]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        val u = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(
          fieldTypes.length)
        u.pointTo(b, len)
        buf += u
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKStructAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKStructAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): TopKStructAgg =
      copy(child = c)
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def top_k_structs(c: Column, k: Int): Column =
    column(TopKStructAgg(expression(c), k).toAggregateExpression())
}
