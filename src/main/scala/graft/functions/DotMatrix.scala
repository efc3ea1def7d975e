package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot products of one double-array column against a CONSTANT matrix,
  * in a single codegen loop: `dot_matrix(v, M)[r] == dot_product(v,
  * M[r])` with the identical sequential fold, so swapping N separate
  * literal-array DotProducts for one DotMatrix cannot change a single
  * bit of output.
  *
  * Why it exists: the LSH bucket (8 hyperplanes) and IVF cell
  * assignment (16 centroids) otherwise embed N copies of a 64-element
  * literal array in the plan — N large generated methods to
  * janino-compile and N array materializations per row. One reference
  * object + one nested loop compiles small and runs tight; the
  * constant matrix lives in the generated class, not the row stream.
  */
case class DotMatrix(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "dot_matrix"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dot_matrix expects array<double> input, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val out = new Array[Double](matrix.length)
    var r = 0
    while (r < matrix.length) {
      val row = matrix(r)
      val n = math.min(v.numElements(), row.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * row(i); i += 1 }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("dotMatrix", matrix, "double[][]")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |double[] $out = new double[$m.length];
         |for (int $r = 0; $r < $m.length; $r++) {
         |  int $n = java.lang.Math.min($v.numElements(), $m[$r].length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $v.getDouble($i) * $m[$r][$i];
         |  }
         |  $out[$r] = $s;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  // keep explain/toString small: never print the matrix payload
  override def toString: String =
    s"dot_matrix($child, <${matrix.length}x${matrix.headOption.map(_.length).getOrElse(0)}>)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DotMatrix {
  /** Column-API entry point. */
  def apply(v: Column, matrix: Array[Array[Double]]): Column =
    ColumnBridge.column(DotMatrix(ColumnBridge.expression(v), matrix))
}
