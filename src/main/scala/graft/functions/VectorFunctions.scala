package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vector math primitives for the similarity/dedup hot paths.
  *
  * The pair-scoring loop at scale is |candidates| × dim multiply-adds; a
  * Scala UDF or zip_with+aggregate pays per-element boxing. [[ArrayDot]]
  * is a native Catalyst Expression with codegen: a tight primitive-double
  * loop over ArrayData, fused into whole-stage codegen.
  */
object VectorFunctions {

  /** Dot product of two array<double> columns. */
  case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      java.lang.Double.valueOf(acc)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += $a.getDouble($i) * $b.getDouble($i);
          }
          ${ev.value} = $acc;
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
      copy(l, r)
  }

  def array_dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Widens a numeric array column to array<double>. */
  def toDoubleArray(c: Column): Column = transform(c, x => x.cast("double"))

  /** L2-normalized double array — precompute ONCE per row so pair loops
    * reduce to a single codegen'd dot product. Delegates to the fused
    * native kernel: the composed transform/sqrt version re-evaluated the
    * norm subexpression per element (O(dim²) interpreted). */
  def unitVector(c: Column): Column = KernelExpressions.unit_vector(c)
}
