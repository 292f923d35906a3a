package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Imperative vector kernels for the similarity operators.
  *
  * Semantics are EXACTLY the declarative `aggregate(transform(sequence(1,n),
  * k -> a[k]*b[k]), 0d, +)` fold: double elements, products summed
  * sequentially left-to-right — the order the DuckDB oracle's
  * `list_sum(list_transform(generate_series(...)))` uses, so cosine values
  * stay bit-identical while skipping the per-element interpreted lambdas.
  */
object VectorOps {

  private def seqDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** dot_seq(array<double>, array<double>) -> double (sequential fold). */
  case class DotSeq(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      seqDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** norm2_seq(array<double>) -> double: sequential Σ v[i]². */
  case class Norm2Seq(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      seqDot(v, v)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** srp_bucket(array<double>) -> long: sign-random-projection bucket.
    * Plane component for (plane j, 1-based dim d) is
    * ((j*dim + d) * 2654435761) mod 2^32 / 2^32 - 0.5 — identical to the
    * declarative/oracle expression, summed in dim order. */
  case class SrpBucket(child: Expression, numPlanes: Int, dim: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      var bucket = 0L
      var j = 0
      while (j < numPlanes) {
        var acc = 0d
        var i = 0
        while (i < dim) {
          val u = ((j.toLong * dim + i + 1) * 2654435761L) % 4294967296L
          acc += v.getDouble(i) * (u.toDouble / 4294967296.0 - 0.5)
          i += 1
        }
        if (acc > 0) bucket |= 1L << j
        j += 1
      }
      bucket
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def srp_bucket(v: Column, numPlanes: Int, dim: Int): Column =
    column(SrpBucket(expression(v), numPlanes, dim))

  def dot_seq(a: Column, b: Column): Column =
    column(DotSeq(expression(a), expression(b)))
  def norm2_seq(v: Column): Column = column(Norm2Seq(expression(v)))
}
