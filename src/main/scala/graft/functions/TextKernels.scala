package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the text/dedup hot paths. The SQL
  * higher-order-function formulations they replace evaluate interpreted
  * (transform/filter/aggregate lambdas sit outside whole-stage codegen) and
  * allocate per lambda step; these compile to one tight loop each. Each
  * kernel's eval and codegen paths are exact twins of the SQL semantics
  * they replace, so every DuckDB oracle stays untouched.
  */
object TextKernels {

  private[functions] val Space = UTF8String.fromString(" ")

  def register(spark: SparkSession): Unit = {
    val ng = FunctionIdentifier("word_ngrams")
    if (!spark.sessionState.functionRegistry.functionExists(ng))
      spark.sessionState.functionRegistry.registerFunction(
        ng, new ExpressionInfo(classOf[NgramArray].getName, "word_ngrams"),
        (children: Seq[Expression]) => NgramArray(children.head,
          children(1).eval(null).asInstanceOf[Int]))
    val rs = FunctionIdentifier("run_stats")
    if (!spark.sessionState.functionRegistry.functionExists(rs))
      spark.sessionState.functionRegistry.registerFunction(
        rs, new ExpressionInfo(classOf[RunStats].getName, "run_stats"),
        (children: Seq[Expression]) => RunStats(children.head))
  }
}

/** `word_ngrams(words, n)`: space-joined sliding n-grams of a string array
  * — element i is the gram starting at word i (0-based), the empty array
  * when the input is shorter than n. Replaces
  * `transform(sequence(…), i -> concat_ws(' ', slice(words, i, n)))`,
  * which costs an array slice allocation plus an interpreted lambda step
  * per gram. Null elements are skipped inside a gram exactly as
  * `concat_ws` skips them. */
case class NgramArray(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram width must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val words = new Array[UTF8String](len)
    var i = 0
    while (i < len) { words(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](len - n + 1)
    val buf = new Array[UTF8String](n)
    i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { buf(j) = words(i + j); j += 1 }
      out(i) = UTF8String.concatWs(TextKernels.Space, buf: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val sep = ctx.addReferenceObj("sep", TextKernels.Space, classOf[UTF8String].getName)
      val len = ctx.freshName("len")
      val words = ctx.freshName("words")
      val out = ctx.freshName("out")
      val buf = ctx.freshName("buf")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |final int $len = $v.numElements();
         |if ($len < $n) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  final $u[] $words = new $u[$len];
         |  for (int $i = 0; $i < $len; $i++) {
         |    $words[$i] = $v.isNullAt($i) ? null : $v.getUTF8String($i);
         |  }
         |  final Object[] $out = new Object[$len - $n + 1];
         |  final $u[] $buf = new $u[$n];
         |  for (int $i = 0; $i <= $len - $n; $i++) {
         |    for (int $j = 0; $j < $n; $j++) $buf[$j] = $words[$i + $j];
         |    $out[$i] = $u.concatWs($sep, $buf);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NgramArray =
    copy(child = newChild)
}

/** `run_stats(arr)`: struct(mx, nd, dup) over a string array — the max
  * occurrence count of any element, the distinct-element count, and the
  * total mass of elements occurring more than once. One binary sort + one
  * scan; replaces both the O(n·distinct) interpreted
  * `transform(array_distinct(a), u -> size(filter(a, …)))` count pattern
  * and the sorted-run SQL `aggregate` lambda. UTF8String's comparator is
  * the same binary order `array_sort` uses, and each null element counts
  * as its own singleton — exactly the lambda's `s.prev IS NOT NULL`
  * behavior. */
case class RunStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("mx", LongType, nullable = false),
    StructField("nd", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))
  override def prettyName: String = "run_stats"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var nNull = 0
    val words = new Array[UTF8String](len)
    var i = 0
    var k = 0
    while (i < len) {
      if (arr.isNullAt(i)) nNull += 1
      else { words(k) = arr.getUTF8String(i); k += 1 }
      i += 1
    }
    java.util.Arrays.sort(words, 0, k, java.util.Comparator.naturalOrder[UTF8String]())
    var mx = 0L; var nd = nNull.toLong; var dup = 0L
    if (nNull > 0 && mx < 1L) mx = 1L
    var run = 0L
    i = 0
    while (i < k) {
      if (i > 0 && words(i).equals(words(i - 1))) {
        run += 1
        dup += (if (run == 2L) 2L else 1L)
      } else {
        run = 1L
        nd += 1L
      }
      if (run > mx) mx = run
      i += 1
    }
    new GenericInternalRow(Array[Any](mx, nd, dup))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val len = ctx.freshName("len")
      val words = ctx.freshName("words")
      val nNull = ctx.freshName("nNull")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val mx = ctx.freshName("mx")
      val nd = ctx.freshName("nd")
      val dup = ctx.freshName("dup")
      val run = ctx.freshName("run")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |final int $len = $v.numElements();
         |final $u[] $words = new $u[$len];
         |int $nNull = 0; int $k = 0;
         |for (int $i = 0; $i < $len; $i++) {
         |  if ($v.isNullAt($i)) $nNull++;
         |  else $words[$k++] = $v.getUTF8String($i);
         |}
         |java.util.Arrays.sort($words, 0, $k);
         |long $mx = $nNull > 0 ? 1L : 0L;
         |long $nd = (long) $nNull;
         |long $dup = 0L;
         |long $run = 0L;
         |for (int $i = 0; $i < $k; $i++) {
         |  if ($i > 0 && $words[$i].equals($words[$i - 1])) {
         |    $run += 1L;
         |    $dup += ($run == 2L) ? 2L : 1L;
         |  } else {
         |    $run = 1L;
         |    $nd += 1L;
         |  }
         |  if ($run > $mx) $mx = $run;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $mx, $nd, $dup });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RunStats =
    copy(child = newChild)
}
