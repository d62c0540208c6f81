package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** All SRP-LSH bucket keys for one vector in a single fused pass.
  *
  * The declarative formulation needs tables×bits separate
  * `aggregate(zip_with(v, array(<dim literals>), …))` expressions — at
  * 12×5×64 that's a plan so large that Janino compile time dominated the
  * whole ann_lsh query (~7 s at sf0.1). Here the hyperplanes ride along as a
  * codegen reference object (one flat double[]) and the generated code is
  * three tight loops. Returns array<int> of length `tables`; element t is
  * table t's `bits`-bit bucket key.
  */
case class SrpBuckets(child: Expression, planes: Array[Double],
                      tables: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  require(planes.length == tables * bits * dim, "planes must be tables*bits*dim flat")

  // Array[Double] equality is reference-based, which would make structurally
  // identical expressions compare unequal — Catalyst canonicalization and
  // subexpression elimination would miss. Compare planes by content.
  override def equals(other: Any): Boolean = other match {
    case s: SrpBuckets =>
      child == s.child && tables == s.tables && bits == s.bits && dim == s.dim &&
        java.util.Arrays.equals(planes, s.planes)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(classOf[SrpBuckets], child,
      Int.box(tables), Int.box(bits), Int.box(dim), Int.box(java.util.Arrays.hashCode(planes)))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "srp_buckets"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(dim, arr.numElements())
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        var s = 0.0
        var j = 0
        while (j < n) { s += arr.getFloat(j).toDouble * planes(off + j); j += 1 }
        if (s > 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      s"""
         |final int $n = java.lang.Math.min($dim, $v.numElements());
         |final int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    final int $off = ($t * $bits + $b) * $dim;
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $s += ((double) $v.getFloat($j)) * $planesRef[$off + $j];
         |    }
         |    if ($s > 0) $bucket |= (1 << $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

object SrpBuckets {
  /** Registers `srp_buckets_<tag>(vec)` with the planes bound in the builder
    * closure (planes can't travel through SQL text), and returns the
    * function name to use in `expr(...)`. */
  def register(spark: SparkSession, tag: String, planes: Array[Double],
               tables: Int, bits: Int, dim: Int): String = {
    val name = s"srp_buckets_$tag"
    val fid = FunctionIdentifier(name)
    // the tag encodes (tables, bits, dim, seed) and planes derive from them,
    // so an existing registration is identical — skip the noisy re-register
    if (!spark.sessionState.functionRegistry.functionExists(fid))
      spark.sessionState.functionRegistry.registerFunction(
        fid, new ExpressionInfo(classOf[SrpBuckets].getName, name),
        (children: Seq[Expression]) => SrpBuckets(children.head, planes, tables, bits, dim))
    name
  }
}
