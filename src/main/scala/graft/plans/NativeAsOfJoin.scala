package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, TimestampType}

/** Native as-of join — the full custom-operator stack (SURVEY.md §4 tier c):
  * logical node → planner strategy → physical exec.
  *
  * Semantics: for each probe row, the build-side `value` of the greatest
  * build `ts <= probe ts` within the same key (inclusive, like DuckDB's
  * ASOF JOIN); null when no build row qualifies.
  *
  * Why a custom exec: the composable rewrite (union + window forward-fill,
  * [[graft.operators.AsOfJoin]]) sorts the UNION of both sides and carries
  * null-padded probe columns through the shuffle. This operator instead
  * shuffles each side once on the key, sorts each side independently
  * (probe rows never pay for build-row width and vice versa), and
  * stream-merges the two sorted iterators per partition with O(1) state —
  * the textbook sorted-merge as-of. At 100 TB that halves sort volume and
  * removes the null-padding overhead.
  *
  * Scope: single key column and event-time column, both evaluated as longs
  * internally (bigint keys, timestamp micros) — the hot path. Other shapes
  * fall back to the composable rewrite.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightValue: Expression, outputAttr: AttributeReference)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ outputAttr
  override def producedAttributes: AttributeSet = AttributeSet(outputAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightValue: Expression, outputAttr: AttributeReference)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outputAttr
  override def producedAttributes: AttributeSet = AttributeSet(outputAttr)

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  private def asLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    case TimestampType => Cast(e, LongType) // micros
    case dt => throw new IllegalArgumentException(s"unsupported as-of type $dt")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(asLong(leftKey), left.output)
    val lTs = BindReferences.bindReference(asLong(leftTs), left.output)
    val rKey = BindReferences.bindReference(asLong(rightKey), right.output)
    val rTs = BindReferences.bindReference(asLong(rightTs), right.output)
    val rVal = BindReferences.bindReference(rightValue, right.output)
    val valueType: DataType = rightValue.dataType
    val leftWidth = left.output.size

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val valueProj = GenerateUnsafeProjection.generate(
        Seq(BoundReference(0, valueType, nullable = true)),
        Seq(AttributeReference("v", valueType)()))
      val joiner = new JoinedRow
      val outProj = GenerateUnsafeProjection.generate(
        output.zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        },
        output)
      val nullValueRow = {
        val r = new GenericInternalRow(1); r.setNullAt(0)
        valueProj(r).copy()
      }

      new Iterator[InternalRow] {
        private val rBuf = rIt.buffered
        private var stateKey = 0L
        private var hasState = false
        private var stateValue: UnsafeRow = nullValueRow

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val lRow = lIt.next()
          val kObj = lKey.eval(lRow)
          val tObj = lTs.eval(lRow)
          if (kObj == null || tObj == null) {
            // NULL key/ts matches nothing — emit without consulting state.
            joiner(lRow, nullValueRow)
            return outProj(joiner)
          }
          val k = kObj.asInstanceOf[Long]
          val t = tObj.asInstanceOf[Long]
          // advance build side through every row with (key, ts) <= (k, t)
          var advanced = true
          while (advanced && rBuf.hasNext) {
            val rRow = rBuf.head
            val rkObj = rKey.eval(rRow)
            val rtObj = rTs.eval(rRow)
            if (rkObj == null || rtObj == null) {
              rBuf.next() // un-matchable build row, sorted to the head
            } else {
              val rk = rkObj.asInstanceOf[Long]
              val rt = rtObj.asInstanceOf[Long]
              if (rk < k || (rk == k && rt <= t)) {
                if (rk == k) {
                  stateKey = k; hasState = true
                  val v = rVal.eval(rRow)
                  val tmp = new GenericInternalRow(1)
                  if (v == null) tmp.setNullAt(0) else tmp.update(0, v)
                  stateValue = valueProj(tmp).copy()
                }
                rBuf.next()
              } else advanced = false
            }
          }
          val matched = hasState && stateKey == k
          val vRow: InternalRow = if (matched) stateValue else nullValueRow
          joiner(lRow, vRow)
          // rebind: output columns 0..leftWidth-1 from left, leftWidth from value
          outProj(joiner)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rv, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, out) :: Nil
    case _ => Nil
  }
}

/** Public API for the native as-of join. */
object NativeAsOfJoin {

  /** Attach `build`'s latest `valueCol` (build.ts <= probe.ts, same key) to
    * every probe row as `as`. Key must be bigint, ts columns bigint or
    * timestamp. NULL handling follows join semantics: a NULL key or ts
    * matches nothing, so probe rows with either NULL keep their row with a
    * NULL as-of value and build rows with either NULL are ignored — handled
    * inside the merge (NULLS FIRST ordering puts them at the head of each
    * partition), no extra scan or routing. Installs the planner strategy on
    * the session at first use.
    */
  def join(probe: DataFrame, build: DataFrame, key: String, ts: String,
      valueCol: String, as: String): DataFrame = {
    val spark: SparkSession = probe.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = probe.queryExecution.analyzed
    // re-alias the build side so self-joins (probe and build from the same
    // source) cannot share attribute ids — a fresh Project mints new exprIds
    val rFresh = build.select(build.columns.toSeq.map(c =>
      org.apache.spark.sql.functions.col(c).as(c)): _*)
    val rPlan = {
      val p = rFresh.queryExecution.analyzed
      if (p.outputSet.intersect(lPlan.outputSet).isEmpty) p
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        p.output.map(a => Alias(a, a.name)()), p)
    }
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val rv = attr(rPlan, valueCol)
    val outAttr = AttributeReference(as, rv.dataType, nullable = true)()
    Bridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, ts), attr(rPlan, ts),
      rv, outAttr))
  }
}
