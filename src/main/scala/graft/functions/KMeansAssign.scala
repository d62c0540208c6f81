package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Nearest-center assignment for [[graft.ml.DetKMeans]]:
  * `kmeans_assign(z: array<double>, centers: array<array<double>>)` → the
  * 0-based index of the center with the smallest squared Euclidean
  * distance; ties keep the FIRST (smallest) index, matching the oracle's
  * lexicographic `min(struct(dist, cluster))`.
  *
  * Why a custom expression: the declarative forms both lose —
  * `transform`/`array_min`/`array_position` are CodegenFallback (an
  * interpreted walk per row per Lloyd's iteration), and a literal-centers
  * CASE ladder inlines k×d scalar constants into the generated source, so
  * every iteration's new centers force a fresh Janino compile. Here the
  * centers ride in ONE array literal (a reference object in generated
  * code), so the source is iteration-invariant — one compile per fit, tight
  * primitive loops per row. The inner accumulation `d += t·t` in ascending
  * dimension order IS the left-associated sum the oracle writes out.
  */
case class KMeansAssign(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "kmeans_assign"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(z: Any, cs: Any): Any = {
    val zv = z.asInstanceOf[ArrayData]
    val cv = cs.asInstanceOf[ArrayData]
    val k = cv.numElements()
    val nd = zv.numElements()
    var best = 0L
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < k) {
      val c = cv.getArray(j)
      var d = 0.0
      var i = 0
      while (i < nd) {
        val t = zv.getDouble(i) - c.getDouble(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = j.toLong }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (zv, cv) => {
      val k = ctx.freshName("k")
      val nd = ctx.freshName("nd")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |final int $k = $cv.numElements();
         |final int $nd = $zv.numElements();
         |long $best = 0L;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $j = 0; $j < $k; $j++) {
         |  final org.apache.spark.sql.catalyst.util.ArrayData $c = $cv.getArray($j);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $nd; $i++) {
         |    final double $t = $zv.getDouble($i) - $c.getDouble($i);
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = (long) $j; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): KMeansAssign =
    copy(left = newLeft, right = newRight)
}

object KMeansAssign {
  def register(spark: SparkSession): Unit = {
    val fid = FunctionIdentifier("kmeans_assign")
    if (!spark.sessionState.functionRegistry.functionExists(fid))
      spark.sessionState.functionRegistry.registerFunction(
        fid, new ExpressionInfo(classOf[KMeansAssign].getName, "kmeans_assign"),
        (children: Seq[Expression]) => KMeansAssign(children.head, children(1)))
  }

  /** Column wrapper — direct catalyst construction, session-independent
    * (see [[Native]]). */
  def of(z: org.apache.spark.sql.Column,
         centers: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Native.column(KMeansAssign(Native.expression(z), Native.expression(centers)))
}
