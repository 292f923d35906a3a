package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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

  /** Numeric element accessor by declared type — reading float-backed
    * ArrayData with getDouble returns stride-garbage on UnsafeArrayData,
    * so the SQL-registered forms must branch on the real element type
    * (AbstractDataType is private[sql], so ImplicitCastInputTypes is not
    * available to inject casts). */
  private def getter(dt: DataType): (ArrayData, Int) => Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case DoubleType => (a, i) => a.getDouble(i)
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case other => throw new IllegalArgumentException(
        s"expected array<float|double>, got array<$other>")
    }

  private def checkElem(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float|double>, got ${other.simpleString}")
  }

  private def seqDot(a: ArrayData, ga: (ArrayData, Int) => Double,
                     b: ArrayData, gb: (ArrayData, Int) => Double): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0d
    var i = 0
    while (i < n) {
      acc += ga(a, i) * gb(b, i)
      i += 1
    }
    acc
  }

  /** dot_seq(array<double>, array<double>) -> double (sequential fold).
    * ImplicitCastInputTypes: the SQL-registered form would otherwise read
    * float-backed arrays as doubles — UnsafeArrayData returns silent
    * garbage at the wrong stride (the Column API callers cast first). */
  case class DotSeq(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      Seq(checkElem(left.dataType, "dot_seq"),
        checkElem(right.dataType, "dot_seq"))
        .find(_ != TypeCheckResult.TypeCheckSuccess)
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
    @transient private lazy val gl = getter(left.dataType)
    @transient private lazy val gr = getter(right.dataType)
    override protected def nullSafeEval(a: Any, b: Any): Any =
      seqDot(a.asInstanceOf[ArrayData], gl, b.asInstanceOf[ArrayData], gr)
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** norm2_seq(array<double>) -> double: sequential Σ v[i]². */
  case class Norm2Seq(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkElem(child.dataType, "norm2_seq")
    @transient private lazy val g = getter(child.dataType)
    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      seqDot(v, g, v, g)
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
    override def checkInputDataTypes(): TypeCheckResult =
      checkElem(child.dataType, "srp_bucket")
    @transient private lazy val g = getter(child.dataType)
    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      // a vector shorter than `dim` contributes zeros for the missing
      // components — without the bound, reads past numElements() return
      // unchecked garbage on UnsafeArrayData (silent wrong buckets)
      val bound = math.min(dim, v.numElements())
      var bucket = 0L
      var j = 0
      while (j < numPlanes) {
        var acc = 0d
        var i = 0
        while (i < bound) {
          val u = ((j.toLong * dim + i + 1) * 2654435761L) % 4294967296L
          acc += g(v, i) * (u.toDouble / 4294967296.0 - 0.5)
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
