package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused q20 fixed-point cosine — the oracle-parity scoring
  * (floats scaled by 2^20, rounded half-away-from-zero to integers held in
  * doubles; every product and partial sum is an exact integer, so the score
  * is bit-identical in any engine) in ONE loop per pair.
  *
  * Arithmetic contract (must not drift — three DuckDB oracles mirror it):
  * identical to the declarative
  * `aggregate(zip_with(quantize(a), quantize(b), …))` chain with the
  * denominator written as sqrt(na·nb) — NOT sqrt(na)·sqrt(nb) — and
  * quantization `round(x·1048576.0)` with HALF_UP ties (away from zero;
  * x·2^20 is exact for float x, so ties genuinely occur). The declarative
  * form walks each 64-float array four times and materializes the quantized
  * intermediates; on the near-dup candidate path that measured 23× slower
  * than a fused loop. NULL if either side is null, lengths differ, or a
  * norm is zero.
  */
case class ArrayCosineQ20(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // type inferred (Seq[ArrayType]) — AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // can return NULL from non-null inputs (length mismatch, zero norm); without
  // this, non-nullable children make nullSafeCodeGen render ev.isNull as the
  // literal `false` and the generated `false = true;` fails Janino compile
  override def nullable: Boolean = true
  override def prettyName: String = "array_cosine_q20"

  @inline private def q20(x: Double): Double = {
    val v = x * 1048576.0
    if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = q20(x.getFloat(i).toDouble)
        val yi = q20(y.getFloat(i).toDouble)
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      val nn = nx * ny
      if (nn == 0.0) null else dot / math.sqrt(nn)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val nn = ctx.freshName("nn")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xv = ((double) $x.getFloat($i)) * 1048576.0;
         |    final double $yv = ((double) $y.getFloat($i)) * 1048576.0;
         |    final double $xi = $xv >= 0 ? java.lang.Math.floor($xv + 0.5) : java.lang.Math.ceil($xv - 0.5);
         |    final double $yi = $yv >= 0 ? java.lang.Math.floor($yv + 0.5) : java.lang.Math.ceil($yv - 0.5);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  final double $nn = $nx * $ny;
         |  if ($nn == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / java.lang.Math.sqrt($nn); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayCosineQ20 =
    copy(left = newLeft, right = newRight)
}

object ArrayCosineQ20 {
  val info = new ExpressionInfo(classOf[ArrayCosineQ20].getName, "array_cosine_q20")

  def register(spark: SparkSession): Unit = {
    val fid = FunctionIdentifier("array_cosine_q20")
    if (!spark.sessionState.functionRegistry.functionExists(fid))
      spark.sessionState.functionRegistry.registerFunction(
        fid, info,
        (children: Seq[Expression]) => ArrayCosineQ20(children.head, children(1)))
  }

  /** Column wrapper — direct catalyst construction, session-independent
    * (see [[Native]]). */
  def of(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Native.column(ArrayCosineQ20(Native.expression(a), Native.expression(b)))
}
