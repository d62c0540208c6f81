package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All `dim` deterministic embedding components of a text in one pass.
  *
  * Contract (identical to the declarative
  * `conv(substring(md5(concat(text, '|', i)), 1, 8), 16, 10) % 2001 - 1000`
  * form and to the DuckDB oracle's hex parse): component i = unsigned first
  * 32 bits of md5(text ⧺ "|" ⧺ i) mod 2001 − 1000. The declarative form
  * builds `dim` separate concat→md5→substring→conv trees, re-copying the
  * text and round-tripping through hex strings per component; this fused
  * expression copies the UTF-8 bytes once, reuses one MessageDigest, and
  * reads the leading digest bytes directly.
  */
case class EmbedComponents(child: Expression, dim: Int) extends UnaryExpression {

  require(dim > 0 && dim <= 1000)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "embed_components"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](dim)
    var k = 0
    while (k < dim) {
      md.reset()
      md.update(bytes)
      md.update('|'.toByte)
      md.update(String.valueOf(k).getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      out(k) = h % 2001 - 1000
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "embedMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }""".stripMargin)
    nullSafeCodeGen(ctx, ev, v => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      // byte extraction goes through named locals: Janino mis-parses the
      // inline "(d[i] & 0xffL) << s" chain as a cast expression
      s"""
         |final byte[] $bytes = $v.getBytes();
         |final long[] $out = new long[$dim];
         |for (int $k = 0; $k < $dim; $k++) {
         |  $md.reset();
         |  $md.update($bytes);
         |  $md.update((byte) '|');
         |  $md.update(String.valueOf($k).getBytes(java.nio.charset.StandardCharsets.US_ASCII));
         |  final byte[] $d = $md.digest();
         |  long $h = 0L;
         |  for (int ${k}b = 0; ${k}b < 4; ${k}b++) {
         |    $h = ($h << 8) | (((long) $d[${k}b]) & 0xffL);
         |  }
         |  $out[$k] = $h % 2001 - 1000;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): EmbedComponents =
    copy(child = newChild)
}

object EmbedComponents {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  def register(spark: SparkSession, dim: Int): String = {
    val name = s"embed_components_$dim"
    val fid = FunctionIdentifier(name)
    // dim is encoded in the name, so an existing registration is identical
    if (!spark.sessionState.functionRegistry.functionExists(fid))
      spark.sessionState.functionRegistry.registerFunction(
        fid, new ExpressionInfo(classOf[EmbedComponents].getName, name),
        (children: Seq[Expression]) => EmbedComponents(children.head, dim))
    name
  }

  /** Column wrapper — direct catalyst construction, session-independent
    * (see [[Native]]). [[register]] remains for SQL-text use. */
  def of(text: Column, dim: Int): Column =
    Native.column(EmbedComponents(Native.expression(text), dim))
}
