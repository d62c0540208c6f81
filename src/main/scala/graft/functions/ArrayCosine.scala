package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two float-vector columns.
  *
  * The declarative form — `aggregate(zip_with(a, b, …))` × 3 for dot and both
  * norms — materializes an intermediate array and walks each vector four
  * times per pair. This expression is one fused loop with whole-stage codegen
  * (`doGenCode` emits a plain float loop), which is the (b) tier of the
  * custom-operator preference order: a Catalyst expression before ever
  * considering a UDF. Returns null if either side is null or lengths differ.
  */
case class ArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // type inferred (Seq[ArrayType]) — AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // can return NULL from non-null inputs (length mismatch, zero norm); without
  // this, non-nullable children make nullSafeCodeGen render ev.isNull as the
  // literal `false` and the generated `false = true;` fails Janino compile
  override def nullable: Boolean = true
  override def prettyName: String = "array_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      val denom = math.sqrt(nx) * math.sqrt(ny)
      if (denom == 0.0) null else dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = (double) $x.getFloat($i);
         |    final double $yi = (double) $y.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  final double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |  if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayCosine =
    copy(left = newLeft, right = newRight)
}

/** Registration: per-session (`VectorFunctions.register`) for library use, or
  * cluster-wide via `spark.sql.extensions=graft.functions.GraftExtensions`. */
object VectorFunctions {
  val info = new ExpressionInfo(classOf[ArrayCosine].getName, "array_cosine")

  def register(spark: SparkSession): Unit = {
    val fid = FunctionIdentifier("array_cosine")
    if (!spark.sessionState.functionRegistry.functionExists(fid))
      spark.sessionState.functionRegistry.registerFunction(
        fid, info,
        (children: Seq[Expression]) => ArrayCosine(children.head, children(1)))
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("array_cosine"), VectorFunctions.info,
      (children: Seq[Expression]) => ArrayCosine(children.head, children(1))))
    // shared builders (TextKernels) — the per-session register path and
    // this injection can never drift
    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[NgramArray].getName, "word_ngrams"),
      TextKernels.ngramBuilder))
    ext.injectFunction((FunctionIdentifier("run_stats"),
      new ExpressionInfo(classOf[RunStats].getName, "run_stats"),
      TextKernels.runStatsBuilder))
    ext.injectFunction((FunctionIdentifier("trigram_keys"),
      new ExpressionInfo(classOf[TrigramKeys].getName, "trigram_keys"),
      TextKernels.trigramBuilder))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfColumnPruning)
  }
}
