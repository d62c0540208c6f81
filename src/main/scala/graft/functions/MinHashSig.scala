package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numHashes` MinHash values of a shingle set in one pass.
  *
  * Replaces `numHashes` separate `array_min(transform(shingles, g ->
  * xxhash64(...)))` expressions — that formulation walks the shingle array
  * k times, materializes k intermediate arrays, and (the real cost) hands
  * Janino a plan whose compile time dominated cold-start MinHash runs.
  * Here: one loop over shingles, k seeded XXH64 lanes, one codegen unit.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, k)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
         |final int $n = $v.numElements();
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    final org.apache.spark.unsafe.types.UTF8String $s = $v.getUTF8String($i);
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      final long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |        $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), (long) $k);
         |      if ($h < $mins[$k]) $mins[$k] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def register(spark: SparkSession, numHashes: Int): String = {
    val name = s"minhash_sig_$numHashes"
    val fid = FunctionIdentifier(name)
    // numHashes is encoded in the name, so an existing registration is
    // identical — skip the noisy re-register
    if (!spark.sessionState.functionRegistry.functionExists(fid))
      spark.sessionState.functionRegistry.registerFunction(
        fid, new ExpressionInfo(classOf[MinHashSig].getName, name),
        (children: Seq[Expression]) => MinHashSig(children.head, numHashes))
    name
  }
}
