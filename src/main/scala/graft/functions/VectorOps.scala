package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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

  /** Java source for element i of `arr` as double — the codegen twin of
    * [[getter]] (same float-vs-double stride discipline). */
  private def getterJava(dt: DataType, arr: String, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case DoubleType => s"$arr.getDouble($i)"
      case FloatType => s"(double) $arr.getFloat($i)"
      case other => throw new IllegalArgumentException(
        s"expected array<float|double>, got array<$other>")
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
      extends BinaryExpression {
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
    // the dot kernel sits inside every ANN scoring join (Q·N or
    // Σ bucket² evaluations) — a CodegenFallback here breaks the whole
    // stage out of codegen, so the loop is generated inline; the Java
    // fold is the same left-to-right order as nullSafeEval/the oracle
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0d;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ${getterJava(left.dataType, a, i)} * ${getterJava(right.dataType, b, i)};
        }
        ${ev.value} = $acc;
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** norm2_seq(array<double>) -> double: sequential Σ v[i]². */
  case class Norm2Seq(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkElem(child.dataType, "norm2_seq")
    @transient private lazy val g = getter(child.dataType)
    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      seqDot(v, g, v, g)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val e = ctx.freshName("e")
        s"""
        int $n = $v.numElements();
        double $acc = 0d;
        for (int $i = 0; $i < $n; $i++) {
          double $e = ${getterJava(child.dataType, v, i)};
          $acc += $e * $e;
        }
        ${ev.value} = $acc;
        """
      })
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** srp_bucket(array<double>) -> long: sign-random-projection bucket.
    * Plane component for (absolute plane p = planeOffset + j, 1-based
    * dim d) is ((p*dim + d) * 2654435761) mod 2^32 / 2^32 - 0.5 —
    * identical to the declarative/oracle expression, summed in dim
    * order. `planeOffset` selects an independent BAND of planes from the
    * same deterministic family (offset 0 = the original single-band
    * bucket, bit j of the result ↔ absolute plane planeOffset+j). */
  case class SrpBucket(child: Expression, numPlanes: Int, dim: Int,
                       planeOffset: Int = 0)
      extends UnaryExpression {
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
          val u = (((planeOffset + j).toLong * dim + i + 1) * 2654435761L) % 4294967296L
          acc += g(v, i) * (u.toDouble / 4294967296.0 - 0.5)
          i += 1
        }
        if (acc > 0) bucket |= 1L << j
        j += 1
      }
      bucket
    }
    // numPlanes·dim Knuth-hash products per row, evaluated on BOTH sides
    // of the banded near-dup self-join — generated inline for the same
    // reason as DotSeq (identical arithmetic to nullSafeEval: long hash,
    // double division, sign test per plane)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val bound = ctx.freshName("bound")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val u = ctx.freshName("u")
        s"""
        int $bound = java.lang.Math.min($dim, $v.numElements());
        ${ev.value} = 0L;
        for (int $j = 0; $j < $numPlanes; $j++) {
          double $acc = 0d;
          for (int $i = 0; $i < $bound; $i++) {
            long $u = (((long) ($planeOffset + $j) * $dim + $i + 1) * 2654435761L) % 4294967296L;
            $acc += ${getterJava(child.dataType, v, i)} * ((double) $u / 4294967296.0 - 0.5);
          }
          if ($acc > 0) ${ev.value} |= 1L << $j;
        }
        """
      })
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Deterministic product-quantization codebook component for
    * (subspace m, codeword k, 0-based sub-dim d): the same Knuth-hash →
    * [-0.5, 0.5) unit used by [[SrpBucket]]'s planes, over a seeded flat
    * index so codebooks and hyperplanes are decorrelated. At real scale
    * codebooks come from k-means; a deterministic synthetic codebook keeps
    * the DuckDB oracle twin exact (same trade as the IVF subsample
    * centroids). */
  def pqCodeword(seed: Long, numCodewords: Int, subDim: Int,
                 m: Int, k: Int, d: Int): Double = {
    val flat = (m.toLong * numCodewords + k) * subDim + d + 1
    val u = ((seed + flat) * 2654435761L) % 4294967296L
    u.toDouble / 4294967296.0 - 0.5
  }

  /** Codeword lookup: an explicit TRAINED codebook when given (flat
    * layout `[(m*numCodewords + k)*subDim + d]` — 8×16×8 doubles = 8 KB,
    * embedded in the plan and shipped with the task closure like any
    * literal), else the deterministic synthetic generator the oracle twin
    * mirrors. Swapping books never changes the plan shape — the
    * k-means-vs-synthetic trade lives entirely in this lookup.
    *
    * The expression field is an `IndexedSeq`, not a raw `Array`: case-class
    * equality on Array is reference-based, which would stop
    * `semanticEquals` / exchange reuse from firing on two plans built from
    * equal-content books (round-6 ADVICE). The seq's backing array is
    * extracted once here so the per-element hot loop stays unboxed. */
  private def codewordFn(book: Option[IndexedSeq[Double]], seed: Long,
                         numCodewords: Int, subDim: Int): (Int, Int, Int) => Double =
    book match {
      case Some(b) =>
        val arr = b.toArray
        (m, k, d) => arr((m * numCodewords + k) * subDim + d)
      case None => (m, k, d) => pqCodeword(seed, numCodewords, subDim, m, k, d)
    }

  /** Zero-copy structural-equality wrapper for a caller-supplied book. The
    * caller must not mutate the array afterwards (trained books are frozen
    * once training returns). */
  private def wrapBook(book: Option[Array[Double]]): Option[IndexedSeq[Double]] =
    book.map(scala.collection.immutable.ArraySeq.unsafeWrapArray(_))

  /** The full codebook as a flat array for the GENERATED code path: the
    * trained book verbatim, or the synthetic generator materialized once
    * (numSub·numCodewords·subDim doubles — 8 KB at the shipped sizes), so
    * generated loops do one array read per component either way. */
  private def materializedBook(book: Option[IndexedSeq[Double]], seed: Long,
                               numSub: Int, numCodewords: Int,
                               subDim: Int): Array[Double] =
    book match {
      case Some(b) => b.toArray
      case None =>
        val a = new Array[Double](numSub * numCodewords * subDim)
        var m = 0
        while (m < numSub) {
          var k = 0
          while (k < numCodewords) {
            var d = 0
            while (d < subDim) {
              a((m * numCodewords + k) * subDim + d) =
                pqCodeword(seed, numCodewords, subDim, m, k, d)
              d += 1
            }
            k += 1
          }
          m += 1
        }
        a
    }

  /** pq_encode(array<double>) -> array<long>: per subspace, the index of
    * the L2-nearest codeword (sequential distance fold in dim order,
    * strict < so ties keep the smallest k — `list_position(l, list_min(l))`
    * in the oracle). */
  case class PqEncode(child: Expression, numSub: Int, numCodewords: Int,
                      subDim: Int, seed: Long,
                      book: Option[IndexedSeq[Double]] = None)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      checkElem(child.dataType, "pq_encode")
    @transient private lazy val g = getter(child.dataType)
    @transient private lazy val cw = codewordFn(book, seed, numCodewords, subDim)
    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val bound = v.numElements()
      val codes = new Array[Long](numSub)
      var m = 0
      while (m < numSub) {
        var best = 0L
        var bestDist = Double.MaxValue
        var k = 0
        while (k < numCodewords) {
          var acc = 0d
          var d = 0
          while (d < subDim) {
            val i = m * subDim + d
            val x = (if (i < bound) g(v, i) else 0d) - cw(m, k, d)
            acc += x * x
            d += 1
          }
          if (acc < bestDist) { bestDist = acc; best = k }
          k += 1
        }
        codes(m) = best
        m += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
    }
    // numSub·numCodewords·subDim fused multiply-adds per row inside the
    // ADC scoring joins — generated inline against the materialized book
    // reference (trained or synthetic, one array read per component;
    // identical arithmetic and strict-< tie rule as nullSafeEval)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val bk = ctx.addReferenceObj("pqBook",
          materializedBook(book, seed, numSub, numCodewords, subDim), "double[]")
        val bound = ctx.freshName("bound")
        val codes = ctx.freshName("codes")
        val m = ctx.freshName("m")
        val k = ctx.freshName("k")
        val d = ctx.freshName("d")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val x = ctx.freshName("x")
        val best = ctx.freshName("best")
        val bestDist = ctx.freshName("bestDist")
        s"""
        int $bound = $v.numElements();
        long[] $codes = new long[$numSub];
        for (int $m = 0; $m < $numSub; $m++) {
          long $best = 0L;
          double $bestDist = Double.MAX_VALUE;
          for (int $k = 0; $k < $numCodewords; $k++) {
            double $acc = 0d;
            for (int $d = 0; $d < $subDim; $d++) {
              int $i = $m * $subDim + $d;
              double $x = ($i < $bound ? ${getterJava(child.dataType, v, i)} : 0d)
                - $bk[($m * $numCodewords + $k) * $subDim + $d];
              $acc += $x * $x;
            }
            if ($acc < $bestDist) { $bestDist = $acc; $best = $k; }
          }
          $codes[$m] = $best;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
        """
      })
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** pq_adc_dot(array<double> query, array<long> codes) -> double:
    * asymmetric-distance dot product of the raw query against the
    * codeword-reconstructed vector, accumulated in flat dim order (one
    * accumulator, subspace-major) — the order the oracle's
    * generate_series(1, dim) fold uses. */
  /** The codes argument must be array<long> (pq_encode output) — on the
    * SQL-registered surface an unchecked double array would be
    * bit-reinterpreted by getLong into garbage codes. */
  private def checkCodes(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<bigint> codes (pq_encode output), got ${other.simpleString}")
    }

  case class PqAdcDot(left: Expression, right: Expression, numSub: Int,
                      numCodewords: Int, subDim: Int, seed: Long,
                      book: Option[IndexedSeq[Double]] = None)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      Seq(checkElem(left.dataType, "pq_adc_dot"),
        checkCodes(right.dataType, "pq_adc_dot"))
        .find(_ != TypeCheckResult.TypeCheckSuccess)
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
    @transient private lazy val gl = getter(left.dataType)
    @transient private lazy val cw = codewordFn(book, seed, numCodewords, subDim)
    override protected def nullSafeEval(q: Any, c: Any): Any = {
      val qv = q.asInstanceOf[ArrayData]
      val codes = c.asInstanceOf[ArrayData]
      val bound = qv.numElements()
      var acc = 0d
      var m = 0
      val mBound = math.min(numSub, codes.numElements())
      while (m < mBound) {
        val k = codes.getLong(m).toInt
        var d = 0
        while (d < subDim) {
          val i = m * subDim + d
          if (i < bound)
            acc += gl(qv, i) * cw(m, k, d)
          d += 1
        }
        m += 1
      }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (q, c) => {
        val bk = ctx.addReferenceObj("pqBook",
          materializedBook(book, seed, numSub, numCodewords, subDim), "double[]")
        val bound = ctx.freshName("bound")
        val mBound = ctx.freshName("mBound")
        val acc = ctx.freshName("acc")
        val m = ctx.freshName("m")
        val k = ctx.freshName("k")
        val d = ctx.freshName("d")
        val i = ctx.freshName("i")
        s"""
        int $bound = $q.numElements();
        int $mBound = java.lang.Math.min($numSub, $c.numElements());
        double $acc = 0d;
        for (int $m = 0; $m < $mBound; $m++) {
          int $k = (int) $c.getLong($m);
          for (int $d = 0; $d < $subDim; $d++) {
            int $i = $m * $subDim + $d;
            if ($i < $bound)
              $acc += ${getterJava(left.dataType, q, i)} * $bk[($m * $numCodewords + $k) * $subDim + $d];
          }
        }
        ${ev.value} = $acc;
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** pq_recon_n2(array<long> codes) -> double: squared norm of the
    * codeword-reconstructed vector, same flat accumulation order. */
  case class PqReconN2(child: Expression, numSub: Int, numCodewords: Int,
                       subDim: Int, seed: Long,
                       book: Option[IndexedSeq[Double]] = None)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkCodes(child.dataType, "pq_recon_n2")
    @transient private lazy val cw = codewordFn(book, seed, numCodewords, subDim)
    override protected def nullSafeEval(c: Any): Any = {
      val codes = c.asInstanceOf[ArrayData]
      var acc = 0d
      var m = 0
      val mBound = math.min(numSub, codes.numElements())
      while (m < mBound) {
        val k = codes.getLong(m).toInt
        var d = 0
        while (d < subDim) {
          val w = cw(m, k, d)
          acc += w * w
          d += 1
        }
        m += 1
      }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val bk = ctx.addReferenceObj("pqBook",
          materializedBook(book, seed, numSub, numCodewords, subDim), "double[]")
        val mBound = ctx.freshName("mBound")
        val acc = ctx.freshName("acc")
        val m = ctx.freshName("m")
        val k = ctx.freshName("k")
        val d = ctx.freshName("d")
        val w = ctx.freshName("w")
        s"""
        int $mBound = java.lang.Math.min($numSub, $c.numElements());
        double $acc = 0d;
        for (int $m = 0; $m < $mBound; $m++) {
          int $k = (int) $c.getLong($m);
          for (int $d = 0; $d < $subDim; $d++) {
            double $w = $bk[($m * $numCodewords + $k) * $subDim + $d];
            $acc += $w * $w;
          }
        }
        ${ev.value} = $acc;
        """
      })
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def pq_encode(v: Column, numSub: Int, numCodewords: Int, subDim: Int,
                seed: Long, book: Option[Array[Double]] = None): Column =
    column(PqEncode(expression(v), numSub, numCodewords, subDim, seed,
      wrapBook(book)))
  def pq_adc_dot(q: Column, codes: Column, numSub: Int, numCodewords: Int,
                 subDim: Int, seed: Long,
                 book: Option[Array[Double]] = None): Column =
    column(PqAdcDot(expression(q), expression(codes), numSub, numCodewords,
      subDim, seed, wrapBook(book)))
  def pq_recon_n2(codes: Column, numSub: Int, numCodewords: Int, subDim: Int,
                  seed: Long, book: Option[Array[Double]] = None): Column =
    column(PqReconN2(expression(codes), numSub, numCodewords, subDim, seed,
      wrapBook(book)))

  def srp_bucket(v: Column, numPlanes: Int, dim: Int,
                 planeOffset: Int = 0): Column =
    column(SrpBucket(expression(v), numPlanes, dim, planeOffset))

  def dot_seq(a: Column, b: Column): Column =
    column(DotSeq(expression(a), expression(b)))
  def norm2_seq(v: Column): Column = column(Norm2Seq(expression(v)))
}
