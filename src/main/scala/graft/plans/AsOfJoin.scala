package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftInternal, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, BoundReference, Expression, JoinedRow, Literal, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{GenerateUnsafeRowJoiner, LazilyGeneratedOrdering}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native as-of (point-in-time) join — the whole-operator custom-plan tier
  * of the brief (preference (c)): a Catalyst `LogicalPlan` node, a
  * `SparkStrategy`, and a physical `SparkPlan` that does a co-partitioned
  * merge, installed through `ExperimentalMethods`/`SparkSessionExtensions`.
  *
  * Compared to the composed union+window formulation (graft.operators.AsOf),
  * this shuffles each side once on its key (exactly like a sort-merge join),
  * needs no null-padded union schema, keeps O(1) state per partition (the
  * last-seen right payload), and emits left rows streamingly — the shape a
  * 100 TB as-of backfill wants. Semantics match DuckDB `ASOF LEFT JOIN`
  * (match iff rightTime <= leftTime, latest wins; NULL keys/times never
  * match).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    matched: Seq[AttributeReference])
  extends BinaryNode {

  require(leftKey.dataType == rightKey.dataType, "as-of key types must match")
  require(leftTime.dataType == rightTime.dataType, "as-of time types must match")

  override def output: Seq[Attribute] = left.output ++ matched
  override def producedAttributes: AttributeSet = AttributeSet(matched)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of join: requires both children hash-clustered on their key
  * and sorted by (key, time) — EnsureRequirements plans the exchanges/sorts
  * exactly as it would for a sort-merge join — then merges partition pairs
  * with a single forward pass carrying the most recent right payload. */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Expression],
    matched: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ matched
  override def producedAttributes: AttributeSet = AttributeSet(matched)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // left rows pass through unchanged: distribution and order are preserved
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  /** Defensive copartitioning validation: zipPartitions pairs partitions by
    * index, which is only correct if the planner gave both children the SAME
    * partitioning spec. EnsureRequirements guarantees that today (identical
    * ClusteredDistributions → identical exchanges, and AQE's
    * CoalesceShufflePartitions applies one uniform spec to both stages), but
    * a future planner change would otherwise surface as silent mis-joins —
    * fail loudly instead. */
  private def checkCopartitioned(): Unit = {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val (lp, rp) = (left.outputPartitioning, right.outputPartitioning)
    if (lp.numPartitions != rp.numPartitions)
      throw new IllegalStateException(
        s"AsOfJoinExec children are not co-partitioned: left=$lp right=$rp — " +
          "the planner/AQE produced incompatible specs; as-of results would be wrong")
    (lp, rp) match {
      case (lh: HashPartitioning, rh: HashPartitioning) =>
        val li = lh.expressions.indexWhere(_.semanticEquals(leftKey))
        val ri = rh.expressions.indexWhere(_.semanticEquals(rightKey))
        if (li < 0 || li != ri)
          throw new IllegalStateException(
            s"AsOfJoinExec hash keys misaligned: left=$lh (key $leftKey at $li), " +
              s"right=$rh (key $rightKey at $ri) — partition pairing would mis-join")
      case _ => // single partition / coalesced specs: the count check above
                // is the strongest cheap invariant available
    }
  }

  protected override def doExecute(): RDD[InternalRow] = {
    checkCopartitioned()
    // codegen'd hot path: both sides project (key, time) through an
    // UnsafeProjection once per row, and all comparisons go through
    // generated orderings over those 2-column rows — no per-row
    // interpreted Expression.eval, no boxing. Copying the projected
    // UnsafeRow when caching it across iterator advances also makes the
    // carried key safe for buffer-backed types (UTF8String, arrays) whose
    // eval result would otherwise alias the spill reader's reused buffer.
    val lKtB = Seq(leftKey, leftTime).map(BindReferences.bindReference(_, left.output))
    val rKtB = Seq(rightKey, rightTime).map(BindReferences.bindReference(_, right.output))
    val payloadB = payload.map(BindReferences.bindReference(_, right.output))
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    // orderings over the projected (key, time) row: advance-condition is the
    // lexicographic (rk, rt) <= (lk, lt); the match-guard compares key only
    val ktOrd = new LazilyGeneratedOrdering(Seq(
      SortOrder(BoundReference(0, keyType, nullable = true), Ascending),
      SortOrder(BoundReference(1, timeType, nullable = true), Ascending)))
    val keyOnlyOrd = new LazilyGeneratedOrdering(Seq(
      SortOrder(BoundReference(0, keyType, nullable = true), Ascending)))
    // fixed-width integral types compare as primitive longs — the common
    // as-of shape (long/int keys, timestamp/date times) skips the generic
    // row comparator entirely
    def longGetter(dt: org.apache.spark.sql.types.DataType): Option[(UnsafeRow, Int) => Long] = {
      import org.apache.spark.sql.types._
      dt match {
        case LongType | TimestampType | TimestampNTZType => Some((r, i) => r.getLong(i))
        case IntegerType | DateType => Some((r, i) => r.getInt(i).toLong)
        case ShortType => Some((r, i) => r.getShort(i).toLong)
        case ByteType => Some((r, i) => r.getByte(i).toLong)
        // compact decimals order by their unscaled long — scales are equal on
        // both sides (type equality is required by the logical node)
        case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
          Some((r, i) => r.getDecimal(i, d.precision, d.scale).toUnscaledLong)
        case _ => None
      }
    }
    val keyGetOpt = longGetter(keyType)
    val timeGetOpt = longGetter(timeType)
    val outputAttrs = output
    val combinedSchema = left.output ++ matched

    val leftSchema = StructType(left.output.map(a => StructField(a.name, a.dataType, a.nullable)))
    val payloadSchema = StructType(matched.map(a => StructField(a.name, a.dataType, a.nullable)))

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKtProj = UnsafeProjection.create(lKtB)
      val rKtProj = UnsafeProjection.create(rKtB)
      val payloadProj = UnsafeProjection.create(payloadB)
      val outProj = UnsafeProjection.create(outputAttrs, combinedSchema)
      // all-null payload as an UnsafeRow, built once per partition
      val nullPayload = UnsafeProjection.create(matched.map(a =>
        Literal.create(null, a.dataType): Expression))(InternalRow.empty).copy()
      // sorted children emit UnsafeRows: appending the payload is then two
      // generated memcpys instead of a per-field output projection
      val rowJoiner = GenerateUnsafeRowJoiner.create(leftSchema, payloadSchema)
      val joined = new JoinedRow
      def emit(lRow: InternalRow, payloadRow: UnsafeRow): InternalRow = lRow match {
        case u: UnsafeRow => rowJoiner.join(u, payloadRow)
        case _ => outProj(joined(lRow, payloadRow))
      }

      // pending right head: each right row is projected exactly once. The
      // un-copied curKt safely survives across left rows — rKtProj's buffer
      // is only overwritten at the next advance.
      var curRight: InternalRow = null
      var curKt: UnsafeRow = null
      def advanceRight(): Unit = {
        curRight = null
        while (curRight == null && rIter.hasNext) {
          val r = rIter.next()
          val kt = rKtProj(r)
          // NULL key/time rows can never match — skip them here
          if (!kt.isNullAt(0) && !kt.isNullAt(1)) { curRight = r; curKt = kt }
        }
      }
      advanceRight()

      if (keyGetOpt.isDefined && timeGetOpt.isDefined) {
        // fast path: primitive comparisons, no row copies for the carried key
        val keyGet = keyGetOpt.get
        val timeGet = timeGetOpt.get
        var haveLast = false
        var lastKeyL = 0L
        var lastPayload: UnsafeRow = null

        lIter.map { lRow =>
          val lKt = lKtProj(lRow)
          var matchedRow: UnsafeRow = nullPayload
          if (!lKt.isNullAt(0) && !lKt.isNullAt(1)) {
            val lk = keyGet(lKt, 0)
            val lt = timeGet(lKt, 1)
            var advancing = curRight != null
            while (advancing) {
              val ck = keyGet(curKt, 0)
              if (ck < lk || (ck == lk && timeGet(curKt, 1) <= lt)) {
                haveLast = true
                lastKeyL = ck
                lastPayload = payloadProj(curRight).copy()
                advanceRight()
                advancing = curRight != null
              } else advancing = false
            }
            if (haveLast && lastKeyL == lk) matchedRow = lastPayload
          }
          emit(lRow, matchedRow)
        }
      } else {
        // generic path: codegen'd orderings over the projected (key, time)
        // rows; defensive copies — the source buffers are reused
        var lastKt: UnsafeRow = null
        var lastPayload: UnsafeRow = null

        lIter.map { lRow =>
          val lKt = lKtProj(lRow)
          var matchedRow: UnsafeRow = nullPayload
          if (!lKt.isNullAt(0) && !lKt.isNullAt(1)) {
            // consume every right row at or before (lk, lt)
            while (curRight != null && ktOrd.compare(curKt, lKt) <= 0) {
              lastKt = curKt.copy()
              lastPayload = payloadProj(curRight).copy()
              advanceRight()
            }
            if (lastPayload != null && keyOnlyOrd.compare(lastKt, lKt) == 0) {
              matchedRow = lastPayload
            }
          }
          emit(lRow, matchedRow)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column pruning through the custom node: Catalyst's own ColumnPruning
  * does not descend into plan nodes it doesn't know, so without this rule a
  * `select`/`count` above an as-of join reads EVERY left column off the scan
  * — at 100 TB the difference between a pruned parquet read and a full one.
  * When a parent consumes a subset of the left child's output, narrow the
  * left side to (consumed ∪ key ∪ time); the right side is pre-pruned by the
  * API (NativeAsOf.asofJoin). */
object AsOfColumnPruning extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}

  private def prune(a: AsOfJoinPlan, consumed: AttributeSet): Option[AsOfJoinPlan] = {
    val required = consumed ++ AttributeSet(Seq(a.leftKey, a.leftTime))
    val kept = a.left.output.filter(required.contains)
    if (kept.length < a.left.output.length) Some(a.copy(left = Project(kept, a.left)))
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(list, a: AsOfJoinPlan) =>
      prune(a, AttributeSet(list.flatMap(_.references))).map(Project(list, _)).getOrElse(p)
    case g @ Aggregate(grouping, aggs, a: AsOfJoinPlan, hint) =>
      prune(a, AttributeSet((grouping ++ aggs).flatMap(_.references)))
        .map(Aggregate(grouping, aggs, _, hint)).getOrElse(g)
  }
}

/** Plans AsOfJoinPlan into AsOfJoinExec. Injectable two ways: session-local
  * via `NativeAsOf.install` (ExperimentalMethods) or cluster-wide via
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKey, p.rightKey, p.leftTime, p.rightTime,
        p.payload, p.matched, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Public API over the custom plan node. */
object NativeAsOf {

  /** Idempotently adds the as-of strategy + pruning rule to the session. */
  def install(spark: SparkSession): Unit = synchronized {
    val em = spark.experimental
    if (!em.extraStrategies.contains(AsOfJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsOfJoinStrategy
    if (!em.extraOptimizations.contains(AsOfColumnPruning))
      em.extraOptimizations = em.extraOptimizations :+ AsOfColumnPruning
  }

  /** For each left row, attach the most recent right row of the same key
    * with rightTime <= leftTime (unmatched left rows get NULL payload).
    * Key and time columns must have identical types on both sides (cast
    * upstream); right side should be unique per (key, time). Payload
    * columns come back as `matched_<name>`. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    // prune + null-filter the right side here: Catalyst does not push
    // projections/filters through an unknown node, so the build side must
    // arrive minimal
    val rightPruned = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select((Seq(rightKey, rightTime) ++ rightPayload).distinct.map(col): _*)
    val lPlan = GraftInternal.analyzed(left)
    val rPlan = GraftInternal.analyzed(rightPruned)
    val resolver = spark.sessionState.conf.resolver
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(s"column `$name` not found on $side side"))
    val payloadAttrs = rightPayload.map(attr(rPlan, _, "right"))
    val matchedAttrs = payloadAttrs.map(a =>
      AttributeReference(s"matched_${a.name}", a.dataType, nullable = true)())
    GraftInternal.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, leftKey, "left"), attr(rPlan, rightKey, "right"),
      attr(lPlan, leftTime, "left"), attr(rPlan, rightTime, "right"),
      payloadAttrs, matchedAttrs))
  }
}
