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

  /** Shared function builders — the single source for both the per-session
    * `register` path and the cluster-wide `GraftExtensions` injection, so
    * the two registration paths can never drift. */
  private[functions] val ngramBuilder: Seq[Expression] => Expression = {
    children =>
      children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, IntegerType) =>
          NgramArray(children.head, i)
        case org.apache.spark.sql.catalyst.expressions.Literal(l: Long, LongType) =>
          NgramArray(children.head, l.toInt)
        case other => throw new IllegalArgumentException(
          s"word_ngrams: the gram width must be an integer literal, got $other")
      }
  }
  private[functions] val runStatsBuilder: Seq[Expression] => Expression =
    children => RunStats(children.head)
  private[functions] val trigramBuilder: Seq[Expression] => Expression =
    children => TrigramKeys(children.head, children(1))

  def register(spark: SparkSession): Unit = {
    def reg(name: String, cls: Class[_], builder: Seq[Expression] => Expression): Unit = {
      val fid = FunctionIdentifier(name)
      if (!spark.sessionState.functionRegistry.functionExists(fid))
        spark.sessionState.functionRegistry.registerFunction(
          fid, new ExpressionInfo(cls.getName, name), builder)
    }
    reg("word_ngrams", classOf[NgramArray], ngramBuilder)
    reg("run_stats", classOf[RunStats], runStatsBuilder)
    reg("trigram_keys", classOf[TrigramKeys], trigramBuilder)
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

/** `trigram_keys(c, n)`: the first `n` sliding char-trigram keys of string
  * `c`, each packed as three 21-bit UTF-16 code-unit values in one long
  * (cu[i]·2⁴² + cu[i+1]·2²¹ + cu[i+2]) — one compiled pass over the
  * string. Replaces `transform(sequence(0, n-1), i -> ascii(__ch[i]) * 2⁴²
  * + ascii(__ch[i+1]) * 2²¹ + ascii(__ch[i+2]))` over `__ch = split(c,
  * '')`, which materializes ONE UTF8String PER CHARACTER and runs an
  * interpreted lambda with three array probes per gram. `ascii` of a
  * 1-code-unit split piece IS that code unit (surrogate halves included),
  * so `String.charAt` reproduces the SQL form's value for every input. */
case class TrigramKeys(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "trigram_keys"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(c: Any, n: Any): Any = {
    val s = c.asInstanceOf[UTF8String].toString
    val k0 = n.asInstanceOf[Long]
    val k = math.min(math.max(k0, 0L), math.max(s.length - 2, 0).toLong).toInt
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      out(i) = s.charAt(i).toLong * 4398046511104L +
        s.charAt(i + 1).toLong * 2097152L + s.charAt(i + 2).toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, n) => {
      val s = ctx.freshName("s")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |final String $s = $c.toString();
         |final int $k = (int) Math.min(Math.max($n, 0L), (long) Math.max($s.length() - 2, 0));
         |final long[] $out = new long[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  $out[$i] = (long) $s.charAt($i) * 4398046511104L
         |    + (long) $s.charAt($i + 1) * 2097152L + (long) $s.charAt($i + 2);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrigramKeys =
    copy(left = newLeft, right = newRight)
}

/** `count_in_<tag>(arr)`: how many elements of a string array belong to a
  * fixed word set — one compiled loop over a shared hash set. Replaces
  * `size(filter(arr, t -> t IN (w1, …, wk)))`, whose interpreted lambda
  * scans the k-term IN list per element (language ID runs FOUR of those
  * per document). Null elements never count, exactly as `t IN (…)`
  * evaluates null → filter drops. The word set is baked in at
  * registration ([[CountIn.register]]) or resolved via [[CountIn.of]]. */
object CountIn {
  /** Tag = md5 of the NUL-joined word list (the separator cannot occur in
    * a whitespace-split token, so distinct lists cannot alias; 128 bits
    * makes a collision implausible, unlike a 32-bit hashCode). */
  private def tagOf(words: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(words.mkString("\u0000").getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  }

  def register(spark: SparkSession, words: Seq[String]): String = {
    val name = s"count_in_${tagOf(words)}"
    val fid = FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(fid))
      spark.sessionState.functionRegistry.registerFunction(
        fid, new ExpressionInfo(classOf[CountIn].getName, name),
        (children: Seq[Expression]) => CountIn(children.head, words))
    name
  }

  /** Column builder — direct catalyst construction, session-independent
    * (see [[Native]]); the session parameter is retained for source
    * compatibility but no longer used. [[register]] remains for SQL-text
    * use of `count_in_<md5-of-words>`. */
  def of(spark: SparkSession, arr: org.apache.spark.sql.Column,
         words: Seq[String]): org.apache.spark.sql.Column =
    Native.column(CountIn(Native.expression(arr), words))
}

case class CountIn(child: Expression, words: Seq[String]) extends UnaryExpression {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "count_in"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var cnt = 0L
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) cnt += 1L
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val setRef = ctx.addReferenceObj("set", set, "java.util.HashSet")
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |final int $len = $v.numElements();
         |long $cnt = 0L;
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$v.isNullAt($i) && $setRef.contains($v.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CountIn =
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
