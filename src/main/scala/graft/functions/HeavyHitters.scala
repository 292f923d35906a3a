package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary — the third sketch family next to
  * HLL (`approx_user_count`) and Greenwald-Khanna
  * (`approx_value_percentiles`): k counters of bounded memory answering
  * "which items exceed an s-fraction of the stream" without the full
  * per-item aggregation.
  *
  * The summary is MERGEABLE (Agarwal et al., "Mergeable Summaries",
  * PODS 2012): combining two summaries and subtracting the (k+1)-th
  * largest count preserves the deterministic guarantee under ANY merge
  * tree — exactly what a partial-aggregable Spark aggregate needs. After
  * any sequence of updates/merges over a weighted stream of total weight
  * N: every item with true weight > N/(k+1) is present in the summary,
  * and each reported count underestimates the true weight by at most
  * N/(k+1). The summary CONTENTS depend on arrival order (like GK), but
  * the guarantee does not — queries built on it report the guarantee's
  * verdict, which is deterministic.
  */
object HeavyHitters {

  /** misra_gries(struct(term string, w long), k) -> array<struct<term,
    * est>> sorted by (est desc, term asc). Weighted update = a 1-entry
    * summary merge, so update and merge share one compression routine. */
  case class MisraGriesAgg(child: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
      with UnaryLike[Expression] {
    require(k > 0, "k must be positive")

    private val outType = StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false)))
    override def dataType: DataType = ArrayType(outType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "misra_gries"

    override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
      mutable.HashMap.empty

    /** Restore the ≤k-counter invariant: subtract the (k+1)-th largest
      * count from every counter and drop the non-positive ones. */
    private def compress(buf: mutable.HashMap[UTF8String, Long]): Unit = {
      if (buf.size <= k) return
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val c = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = buf.iterator.flatMap { case (t, n) =>
        if (n - c <= 0) Some(t) else None
      }.toArray
      dead.foreach(buf.remove)
      buf.keys.toArray.foreach(t => buf(t) -= c)
    }

    override def update(buf: mutable.HashMap[UTF8String, Long],
                        input: InternalRow): mutable.HashMap[UTF8String, Long] = {
      val v = child.eval(input)
      if (v != null) {
        val row = v.asInstanceOf[InternalRow]
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val term = row.getUTF8String(0)
          val w = row.getLong(1)
          if (w > 0) {
            buf.get(term) match {
              case Some(n) => buf(term) = n + w
              // clone: the UTF8String points into a reused unsafe buffer
              case None => buf(term.clone()) = w
            }
            compress(buf)
          }
        }
      }
      buf
    }

    override def merge(buf: mutable.HashMap[UTF8String, Long],
                       other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
      other.foreach { case (t, w) =>
        buf.get(t) match {
          case Some(n) => buf(t) = n + w
          case None => buf(t) = w
        }
      }
      compress(buf)
      buf
    }

    override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
      val sorted = buf.toArray.sortBy { case (t, n) => (-n, t) }
      new GenericArrayData(sorted.map { case (t, n) =>
        InternalRow(t, n): Any
      })
    }

    override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (t, n) =>
        val b = t.getBytes
        out.writeInt(b.length)
        out.write(b)
        out.writeLong(n)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = mutable.HashMap.empty[UTF8String, Long]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        buf(UTF8String.fromBytes(b)) = in.readLong()
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
      copy(child = c)
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def misra_gries(c: Column, k: Int): Column =
    column(MisraGriesAgg(expression(c), k).toAggregateExpression())
}
