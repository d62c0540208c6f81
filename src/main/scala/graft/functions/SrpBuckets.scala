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
  * codegen reference object (one flat long[]) and the generated code is
  * three tight loops. Returns array<int> of length `tables`; element t is
  * table t's `bits`-bit bucket key.
  *
  * EXACT-INTEGER projections (the scale-parity contract): the vector is
  * quantized once to q20 fixed point (round-half-away, the ArrayCosineQ20
  * recipe) and each hyperplane component is an INTEGER, so every product
  * (≤ 2^52) and the running sum (≤ 2^58 over 64 dims) is exact in a long —
  * the sign test, and hence the bucket key, is bit-reproducible on any
  * engine and any accumulation order. Gaussian doubles would leave the
  * bucketing JVM-private (seeded `Random.nextGaussian` is not expressible
  * in SQL), which is what kept the embed_neardup oracle recall-dependent:
  * at sf0.1 SRP recall at the demo threshold dropped to 0.94 and the
  * exact-all-pairs "oracle" diverged. Integer planes let the DuckDB twin
  * replay the identical bucketing (md5 digit-fold, the hashBucketSql
  * recipe), turning the oracle into an implementation-parity check that
  * holds at EVERY scale; recall vs brute force stays a measured AnnSpec
  * property. Sign-projection families with symmetric integer components
  * are the SimHash construction — recall behavior matches the Gaussian
  * family in practice.
  */
case class SrpBuckets(child: Expression, planes: Array[Long],
                      tables: Int, bits: Int, dim: Int,
                      q20In: Boolean = false)
    extends UnaryExpression {

  require(planes.length == tables * bits * dim, "planes must be tables*bits*dim flat")

  // Array equality is reference-based, which would make structurally
  // identical expressions compare unequal — Catalyst canonicalization and
  // subexpression elimination would miss. Compare planes by content.
  override def equals(other: Any): Boolean = other match {
    case s: SrpBuckets =>
      child == s.child && tables == s.tables && bits == s.bits && dim == s.dim &&
        q20In == s.q20In && java.util.Arrays.equals(planes, s.planes)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(classOf[SrpBuckets], child,
      Int.box(tables), Int.box(bits), Int.box(dim), Boolean.box(q20In),
      Int.box(java.util.Arrays.hashCode(planes)))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "srp_buckets"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(dim, arr.numElements())
    // quantize once per vector, not once per (table, bit); q20In inputs
    // (array<long> already on the q20 grid — the hybrid index path) are
    // taken verbatim
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (q20In) q(i) = arr.getLong(i)
      else {
        val xv = arr.getFloat(i).toDouble * 1048576.0
        q(i) = (if (xv >= 0) math.floor(xv + 0.5) else math.ceil(xv - 0.5)).toLong
      }
      i += 1
    }
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        var s = 0L
        var j = 0
        while (j < n) { s += q(j) * planes(off + j); j += 1 }
        if (s > 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val xv = ctx.freshName("xv")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val bucket = ctx.freshName("bucket")
      val fill =
        if (q20In) s"$q[$i] = $v.getLong($i);"
        else
          s"""final double $xv = ((double) $v.getFloat($i)) * 1048576.0;
             |  $q[$i] = (long) ($xv >= 0 ? java.lang.Math.floor($xv + 0.5)
             |                            : java.lang.Math.ceil($xv - 0.5));""".stripMargin
      s"""
         |final int $n = java.lang.Math.min($dim, $v.numElements());
         |final long[] $q = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $fill
         |}
         |final int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    final int $off = ($t * $bits + $b) * $dim;
         |    long $s = 0L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $s += $q[$j] * $planesRef[$off + $j];
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
  def register(spark: SparkSession, tag: String, planes: Array[Long],
               tables: Int, bits: Int, dim: Int,
               q20In: Boolean = false): String = {
    val name = if (q20In) s"srp_buckets_q20_$tag" else s"srp_buckets_$tag"
    val fid = FunctionIdentifier(name)
    // the tag encodes (tables, bits, dim, seed) and planes derive from them,
    // so an existing registration is identical — skip the noisy re-register
    if (!spark.sessionState.functionRegistry.functionExists(fid))
      spark.sessionState.functionRegistry.registerFunction(
        fid, new ExpressionInfo(classOf[SrpBuckets].getName, name),
        (children: Seq[Expression]) =>
          SrpBuckets(children.head, planes, tables, bits, dim, q20In))
    name
  }
}
