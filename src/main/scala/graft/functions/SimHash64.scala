package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** 64-bit SimHash of a token array in one pass.
  *
  * Token multiplicity weights the bit votes naturally (each occurrence votes
  * once), which is exactly the explode → per-token counts → 64 aggregate
  * columns formulation this replaces — same votes, same hash, one narrow map
  * instead of a shuffle.
  *
  * Two token-hash modes, chosen at construction:
  *  - `portable = false` ("simhash64"): two 32-bit Murmur3 lanes (seeds 42 /
  *    0x9747b28c) combined — the fast in-cluster form.
  *  - `portable = true` ("simhash64_md5"): the little-endian long of the
  *    first 8 MD5 digest bytes — the exact value DuckDB's
  *    `md5_number_upper()` returns, so an external SQL engine can replay
  *    the bit votes and the fingerprint bit-for-bit. MD5 costs ~10× Murmur
  *    per token; that is the determinism price (the portable-ln precedent)
  *    and the per-doc map stays scan-parallel.
  */
case class SimHash64(child: Expression, portable: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = if (portable) "simhash64_md5" else "simhash64"
  override def nullIntolerant: Boolean = true

  @inline private def tokenHash(s: org.apache.spark.unsafe.types.UTF8String): Long =
    if (portable) SimHash64.md5Long(s)
    else {
      val h1 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
      val h2 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28c)
      (h1.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash(arr.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val out = ctx.freshName("out")
      val hashExpr =
        if (portable)
          s"final long $h = graft.functions.SimHash64.md5Long($s);"
        else
          s"""final int $h1 = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
             |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42);
             |    final int $h2 = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
             |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 0x9747b28c);
             |    final long $h = (((long) $h1) << 32) | (((long) $h2) & 0xFFFFFFFFL);""".stripMargin
      s"""
         |final int $n = $v.numElements();
         |final int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i)) {
         |    final org.apache.spark.unsafe.types.UTF8String $s = $v.getUTF8String($i);
         |    $hashExpr
         |    for (int $j = 0; $j < 64; $j++) {
         |      if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) { if ($votes[$j] > 0) $out |= (1L << $j); }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Little-endian long of the first 8 MD5 digest bytes of the string —
    * numerically equal (as the unsigned 64-bit pattern) to DuckDB's
    * `md5_number_upper(s)`, which is what makes the portable SimHash
    * replayable by the oracle. Called from both eval and generated code. */
  def md5Long(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong(0)
  }

  def register(spark: SparkSession): Unit = {
    val fid = FunctionIdentifier("simhash64")
    if (!spark.sessionState.functionRegistry.functionExists(fid))
      spark.sessionState.functionRegistry.registerFunction(
        fid, new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (children: Seq[Expression]) => SimHash64(children.head, portable = false))
    val fidMd5 = FunctionIdentifier("simhash64_md5")
    if (!spark.sessionState.functionRegistry.functionExists(fidMd5))
      spark.sessionState.functionRegistry.registerFunction(
        fidMd5, new ExpressionInfo(classOf[SimHash64].getName, "simhash64_md5"),
        (children: Seq[Expression]) => SimHash64(children.head, portable = true))
  }
}
