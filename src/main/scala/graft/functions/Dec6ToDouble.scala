package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._

/** Native codegen'd form of the engine-portable scale-6 decimal→double
  * sequence (`Exact.dec6ToDouble` semantics; see there and SURVEY §3).
  *
  * The composed-Column form costs ~4 Catalyst decimal ops (abs, floor,
  * subtract, compares — each a BigDecimal allocation) per OUTPUT row,
  * which doubled output-heavy queries (events_sessions 0.47 → 1.05 s at
  * sf0.1; linear in rows, so ~+10 s on basket_features at the 100×
  * corpus). This expression does the whole conversion in one static JVM
  * call ([[graft.Exact.dec6Portable]]): Long-path arithmetic whenever the
  * unscaled value fits 62 bits (every real sum), BigInteger split above.
  * Bit-identical to the composed form — ExactDec6Spec pins all regimes. */
case class Dec6ToDouble(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dec6_to_double needs a DECIMAL argument, got ${t.simpleString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    graft.Exact.dec6Portable(
      input.asInstanceOf[Decimal].toJavaBigDecimal)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.Exact.dec6Portable($c.toJavaBigDecimal())")
  override protected def withNewChildInternal(newChild: Expression): Dec6ToDouble =
    copy(child = newChild)
}

object Dec6ToDouble {
  private val fnName = "graft_dec6_to_double"

  private def register0(spark: SparkSession): String = {
    val fid = FunctionIdentifier(fnName)
    if (!spark.sessionState.functionRegistry.functionExists(fid))
      spark.sessionState.functionRegistry.registerFunction(
        fid,
        new ExpressionInfo(classOf[Dec6ToDouble].getName, fnName),
        (children: Seq[Expression]) => Dec6ToDouble(children.head))
    fnName
  }

  /** Column wrapper: builds the Column directly from the catalyst
    * expression — session-independent, nothing re-registers per call.
    * [[register]] remains for SQL-text use of the name. */
  def of(c: Column): Column = Native.column(Dec6ToDouble(Native.expression(c)))

  def register(spark: SparkSession): Unit = { register0(spark); () }
}
