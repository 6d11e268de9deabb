package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, Attribute, Cast, Expression, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/**
 * AS-OF JOIN as a first-class operator — the brief's preference-ladder rung
 * (c): a custom `LogicalPlan` + `Rule[LogicalPlan]` + `SparkStrategy` +
 * `SparkPlan`, for semantics the built-in operators cannot express as one
 * physical operation.
 *
 * Semantics: every PROBE row (left) picks the single latest REFERENCE row
 * (right) with the same key and `refTime <= probeTime` (ties and ordering
 * pinned by the right child's (key, time, tiebreak…) sort); probes with no
 * qualifying reference keep nulls. Optional `tolerance` (same units as the
 * time columns) drops matches older than `probeTime - tolerance`.
 *
 * Why a custom operator: the composable formulations are structurally worse —
 * the range-join + argmax re-scans every prior reference row per probe
 * (per-key quadratic), and the union + running-`last()` window trick (see
 * `EventOps.asofJoin`) inflates the row stream, carries only ONE payload
 * column, and pays a window buffer. This exec is the plan you would want at
 * 100 TB: ONE hash exchange per side on the join key (AQE-sized), ONE
 * per-partition sort each, then a streaming two-pointer merge — O(|probe| +
 * |reference|) per partition, O(1) state (the current candidate row), full
 * right payload carried, no row inflation, no window buffer, spill-free.
 *
 * Reference analog: the import path's "latest exported state as of this
 * message" lookup (ImportDatabaseOrTable.java:43-73 processes each message
 * against current catalog state); here generalized to event-time.
 */
object AsOfJoinPlans {

  // ---------------------------------------------------------------- logical

  /** Logical as-of join. `rightTieBreak` columns extend the right-side sort
    * so "latest" is a total order (e.g. highest id wins among equal times). */
  case class AsOfJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTime: Expression,
      rightTime: Expression,
      rightTieBreak: Seq[Expression],
      tolerance: Option[Long]) extends BinaryNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  // -------------------------------------------------------------- optimizer

  /** Probe-side predicate pushdown: a filter above the as-of join that only
    * references probe columns commutes with the join (dropping probe rows
    * never changes any other probe's match). REFERENCE-side conjuncts must
    * NOT push — filtering the reference changes which row is "latest", so
    * they stay above the join. The generic PushDownPredicates cannot know
    * this about a foreign node; this rule teaches the optimizer exactly the
    * safe half. */
  object PushProbeFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, a: AsOfJoinPlan) =>
        val (probeOnly, rest) = splitConjunctivePredicates(cond)
          .partition(c => c.deterministic && c.references.subsetOf(a.left.outputSet))
        if (probeOnly.isEmpty) f
        else {
          val pushed = a.copy(left = Filter(probeOnly.reduce(And), a.left))
          rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  /** Column pruning through the as-of join: a Project above it needs only
    * some output columns, so each child shrinks to (needed ∩ its output) ∪
    * (its join keys/time/tiebreak). The generic ColumnPruning rule cannot
    * do this for a foreign node; without it a wide reference table is
    * scanned in full to enrich two columns.
    *
    * Placement matters: injected via `GraftExtensions.injectOptimizerRule`
    * this runs INSIDE the operator-optimization fixed point, so the
    * inserted child Projects cascade through Catalyst's own pruning into
    * the scans (ReadSchema) through any subtree. On the runtime
    * `spark.experimental.extraOptimizations` path (AsOfJoin.register) it
    * runs AFTER that fixed point, so pruning reaches the scan only when
    * the child is a simple Project/Filter/Scan chain (physical-planning
    * PhysicalOperation collapses those); a join/aggregate-shaped child
    * keeps its full width there — use the extension for wide-child
    * pipelines. */
  object PruneAsOfJoinColumns extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case p @ Project(_, a: AsOfJoinPlan) =>
        val needed = org.apache.spark.sql.catalyst.expressions.AttributeSet(
          p.references.toSeq ++
            a.leftKeys.flatMap(_.references) ++ a.rightKeys.flatMap(_.references) ++
            a.leftTime.references ++ a.rightTime.references ++
            a.rightTieBreak.flatMap(_.references))
        def prune(child: LogicalPlan): LogicalPlan = {
          val keep = child.output.filter(needed.contains)
          if (keep.length == child.output.length) child
          else Project(keep, child)
        }
        val l2 = prune(a.left)
        val r2 = prune(a.right)
        if ((l2 eq a.left) && (r2 eq a.right)) p
        else p.copy(child = a.copy(left = l2, right = r2))
    }
  }

  // --------------------------------------------------------------- strategy

  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, tol) =>
        AsOfJoinExec(lk, rk, lt, rt, tb, tol, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  // ------------------------------------------------------------------- exec

  /** Streaming two-pointer merge as-of join. Children arrive hash-clustered
    * on the key (one exchange each, exactly like a shuffled join) and sorted
    * by (key, time[, tiebreak]) — EnsureRequirements supplies both from
    * `requiredChildDistribution` / `requiredChildOrdering`. Per partition:
    * advance the reference pointer monotonically, remember only the latest
    * qualifying row (copied — sort output reuses row buffers), emit probe ⋈
    * candidate or probe ⋈ nulls. */
  case class AsOfJoinExec(
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTime: Expression,
      rightTime: Expression,
      rightTieBreak: Seq[Expression],
      tolerance: Option[Long],
      left: SparkPlan,
      right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys ++ (rightTime +: rightTieBreak)).map(SortOrder(_, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    protected override def doExecute(): RDD[InternalRow] = {
      val tol = tolerance
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
        val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
        val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
        val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(right.output.length)
        // bind against `output` (right attrs nullable), not the raw child
        // outputs — else the BoundReferences are non-nullable and the
        // null-padded rows read back as zeros
        val outProj = UnsafeProjection.create(output, output)

        new Iterator[InternalRow] {
          // right-head key/time are projected ONCE per reference row (at
          // advance), not once per probe that peeks at it; candidate rows
          // copy into reusable buffers, so the steady state allocates
          // nothing per row.
          private var rHead: InternalRow = null
          private var rHeadKey: InternalRow = null // projection buffer view
          private var rHeadTime: Long = 0L
          private var rHeadTimeNull: Boolean = false
          private var candidate: InternalRow = null
          private var candidateKey: InternalRow = null
          private var candidateTime: Long = 0L
          private val hasTol = tol.isDefined
          private val tolV = tol.getOrElse(0L)

          // SQL equi-join semantics: NULL never matches NULL. The natural
          // ordering used by the merge compares nulls as equal, so a
          // null-keyed reference row must never become a candidate — skip
          // them on advance (they sort first within the partition, so this
          // consumes a prefix, preserving the monotone pointer).
          private def advance(): Unit = {
            rHead = null; rHeadKey = null
            var searching = rIter.hasNext
            while (searching) {
              val row = rIter.next()
              val key = rKeyProj(row)
              if (!key.anyNull) {
                rHead = row
                rHeadKey = key
                val rtRow = rTimeProj(row)
                rHeadTimeNull = rtRow.isNullAt(0)
                rHeadTime = if (rHeadTimeNull) 0L else rtRow.getLong(0)
                searching = false
              } else searching = rIter.hasNext
            }
          }
          advance()

          private def keep(row: InternalRow, key: InternalRow): Unit = {
            (row, candidate) match {
              case (u: org.apache.spark.sql.catalyst.expressions.UnsafeRow,
                    c: org.apache.spark.sql.catalyst.expressions.UnsafeRow) => c.copyFrom(u)
              case _ => candidate = row.copy()
            }
            (key, candidateKey) match {
              case (u: org.apache.spark.sql.catalyst.expressions.UnsafeRow,
                    c: org.apache.spark.sql.catalyst.expressions.UnsafeRow) => c.copyFrom(u)
              case _ => candidateKey = key.copy()
            }
            candidateTime = rHeadTime
          }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l)
            val ltRow = lTimeProj(l)
            val ltNull = ltRow.isNullAt(0)
            val lt = if (ltNull) Long.MinValue else ltRow.getLong(0)
            // null-keyed probes never match (SQL equi-join semantics) —
            // emit with nulls without advancing the reference pointer
            val lkNull = lk.anyNull
            var scanning = rHead != null && !ltNull && !lkNull
            while (scanning) {
              val cmp = keyOrd.compare(rHeadKey, lk)
              if (cmp < 0 || (cmp == 0 && rHeadTimeNull)) {
                advance(); scanning = rHead != null
              } else if (cmp == 0 && rHeadTime <= lt) {
                keep(rHead, rHeadKey)
                advance(); scanning = rHead != null
              } else scanning = false
            }
            val matched = !ltNull && !lkNull && candidate != null &&
              keyOrd.compare(candidateKey, lk) == 0 &&
              (!hasTol || lt - candidateTime <= tolV)
            outProj(joined(l, if (matched) candidate else nullRight))
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }
}

/** Dataset-level entry point. */
object AsOfJoin {
  import AsOfJoinPlans._

  /** Idempotently arm the session with the strategy + the probe-side
    * pushdown rule (`spark.experimental` is the runtime twin of the
    * `GraftExtensions` deployment-level injection). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushProbeFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushProbeFilterThroughAsOfJoin
    if (!spark.experimental.extraOptimizations.contains(PruneAsOfJoinColumns))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneAsOfJoinColumns
  }

  /**
   * probe ⟕asof reference on `keys`, latest `refTimeCol <= probeTimeCol`;
   * among equal times the greatest (time, tieBreakCols…) wins. Reference
   * columns come back suffixed (`refSuffix`) and nullable, full payload —
   * self-joins are safe (the suffix projection re-aliases with fresh
   * attribute ids, the same dedup the analyzer does for plain joins).
   * Time columns must be integral (use the canonical `ts_us`).
   *
   * `direction = "forward"` flips the semantics to the EARLIEST
   * `refTimeCol >= probeTimeCol` (the "next maintenance window after the
   * event" lookup), ties to the SMALLEST (time, tieBreakCols…).
   * Implemented by negating the time (and tiebreak) expressions into the
   * SAME merge exec — no second operator, no plan duplication; forward
   * tiebreak columns must therefore be integral. `tolerance` bounds
   * `refTime - probeTime` in the forward direction.
   */
  def asofJoin(
      probe: DataFrame,
      reference: DataFrame,
      keys: Seq[String],
      probeTimeCol: String,
      refTimeCol: String,
      tieBreakCols: Seq[String] = Nil,
      tolerance: Option[Long] = None,
      refSuffix: String = "_r",
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward|forward, got '$direction'")
    val forward = direction == "forward"
    val spark = probe.sparkSession
    register(spark)
    val lplan = GraftSqlBridge.analyzed(probe)
    val rRaw = GraftSqlBridge.analyzed(reference)
    val rplan = Project(rRaw.output.map(a => Alias(a, a.name + refSuffix)()), rRaw)
    def attr(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asofJoin: no column '$n' in [${out.map(_.name).mkString(", ")}]"))
    def asLong(a: Attribute): Expression =
      if (a.dataType == LongType) a else Cast(a, LongType)
    def oriented(a: Attribute): Expression = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val integral = Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType)
      require(!forward || integral.contains(a.dataType),
        s"asofJoin forward: column '${a.name}' must be integral (its ordering is negated)")
      val base = asLong(a)
      if (forward) org.apache.spark.sql.catalyst.expressions.UnaryMinus(base) else base
    }
    val plan = AsOfJoinPlan(
      lplan, rplan,
      keys.map(k => attr(lplan.output, k)),
      keys.map(k => attr(rplan.output, k + refSuffix)),
      oriented(attr(lplan.output, probeTimeCol)),
      oriented(attr(rplan.output, refTimeCol + refSuffix)),
      tieBreakCols.map(c =>
        if (forward) oriented(attr(rplan.output, c + refSuffix))
        else attr(rplan.output, c + refSuffix)),
      tolerance)
    GraftSqlBridge.ofRows(spark, plan)
  }
}
