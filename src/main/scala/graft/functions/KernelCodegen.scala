package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.types.DataType

/** Whole-stage-codegen participation for compiled-Scala kernels.
  *
  * `CodegenFallback` doesn't just interpret ONE expression — it breaks the
  * entire surrounding stage out of whole-stage codegen, de-fusing every
  * operator in it (scans, filters, projections) back to volcano iteration.
  * For kernels whose body is real compiled Scala (MD5 digests, gram
  * assembly, signature folds) inlining the body into generated Java buys
  * little — the body is already JIT-compiled — but STAYING IN the fused
  * stage matters. These mixins emit a call to the expression's own
  * `nullSafeEval` through a plan reference: one boxed call per row, stage
  * fusion intact, and interpreted/codegen paths are the same code by
  * construction (asserted anyway in ScaleGuardSpec).
  */
object KernelCodegen {
  /** Cast the boxed `nullSafeEval` result to the expression's Java type. */
  private[functions] def unbox(dt: DataType, raw: String): String = {
    val jt = CodeGenerator.javaType(dt)
    if (CodeGenerator.isPrimitiveType(dt))
      s"((${CodeGenerator.boxedType(dt)}) $raw).${jt}Value()"
    else s"($jt) $raw"
  }
}

trait KernelCodegenUnary extends UnaryExpression {
  /** Public surface for generated code (nullSafeEval is protected). */
  final def evalKernel(a: Any): Any = nullSafeEval(a)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("kernel", this,
        classOf[KernelCodegenUnary].getName)
      val tmp = ctx.freshName("kres")
      // some kernels return null on non-null input (e.g. minhash of an
      // empty set); ev.isNull is a constant when !nullable, so only emit
      // the assignment when the variable exists
      val onNull =
        if (nullable) s"${ev.isNull} = true;"
        else "throw new IllegalStateException(\"null kernel result for non-nullable expression\");"
      s"""
      Object $tmp = $ref.evalKernel($v);
      if ($tmp == null) {
        $onNull
      } else {
        ${ev.value} = ${KernelCodegen.unbox(dataType, tmp)};
      }
      """
    })
}

trait KernelCodegenBinary extends BinaryExpression {
  final def evalKernel(a: Any, b: Any): Any = nullSafeEval(a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("kernel", this,
        classOf[KernelCodegenBinary].getName)
      val tmp = ctx.freshName("kres")
      val onNull =
        if (nullable) s"${ev.isNull} = true;"
        else "throw new IllegalStateException(\"null kernel result for non-nullable expression\");"
      s"""
      Object $tmp = $ref.evalKernel($a, $b);
      if ($tmp == null) {
        $onNull
      } else {
        ${ev.value} = ${KernelCodegen.unbox(dataType, tmp)};
      }
      """
    })
}
