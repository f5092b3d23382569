package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, AttributeSet, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, JoinedRow, LessThan, LessThanOrEqual, Literal,
  RowNumber, RowOrdering, SortOrder, UnsafeProjection, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples,
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy,
  UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Per-key top-k as a first-class operator: logical node, optimizer
  * rewrite, planner strategy and a two-phase physical operator with
  * PARTIAL TOP-K PUSHDOWN — the (c)-tier extension path
  * (`LogicalPlan` + `Rule` + `SparkStrategy` + `SparkPlan`, wired via
  * `SparkSessionExtensions`).
  *
  * Spark plans `row_number() OVER (PARTITION BY k ORDER BY o) ≤ n` as
  * exchange → sort → window → filter: EVERY row shuffles and sorts,
  * then all but n per key are discarded. This operator bounds the
  * work before the exchange: a map-side pass keeps only the top n
  * rows per key per partition (a bounded heap per key — no sort), so
  * the shuffle carries at most n·keys(partition) rows, and the
  * reduce-side pass merges the per-partition survivors exactly. At
  * 100 TB with n=3 over customer keys this is the difference between
  * shuffling the orders table and shuffling ≤3 rows per (customer,
  * input-partition) — the same asymmetry partial aggregation gives
  * hash aggregates, applied to rank filtering.
  *
  * The rewrite ([[TopKRewrite]]) fires on the DECLARATIVE form — the
  * window+filter every query already writes (w1, j1) — so queries
  * stay plain DataFrame code and the oracle SQL is untouched; ties
  * beyond the sort order are resolved arbitrarily in BOTH forms, so
  * determinism needs a total order either way (every suite query
  * carries a full tiebreaker). Memory: the map-side heaps hold
  * n·distinct-keys(partition) rows — the bound a hash aggregate's
  * partial phase already accepts — and the partial phase caps tracked
  * keys at `spark.graft.topk.maxKeysPerPartition` (default 4M), past
  * which rows of untracked keys pass through untrimmed: the exchange
  * carries more rows, the final phase still computes the exact answer,
  * memory stays bounded (differential-tested with a cap of 1).
  *
  * Kill switch: `spark.graft.topkRewrite=false` disables the rewrite
  * (used by the differential tests to hold the operator to the
  * window form's exact output).
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: Attribute, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  // rankAttr is produced here, not drawn from the child, so default
  // canonicalization leaves its exprId untouched — two otherwise
  // identical branches of a self-join then never canonicalize equal
  // and exchange/stage reuse silently turns off. Appending it to the
  // normalization input gives it a deterministic positional id.
  override def allAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSeq =
    child.output :+ rankAttr
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKeyPlan = copy(child = newChild)
}

/** Rewrites `Filter(rank-predicate, Window([row_number() as r], K, O))`
  * into [[TopKPerKeyPlan]]. Matches only the exact single-window-
  * expression shape with a top-level `r <= n` / `r < n` / `r = 1`
  * predicate (mixed windows, compound predicates and every other rank
  * function keep Spark's window path). The rank attribute keeps its
  * exprId, so parents resolve unchanged.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(r: AttributeReference, Literal(n: Int, IntegerType))
        if r.semanticEquals(rank) => Some(n)
      case LessThan(r: AttributeReference, Literal(n: Int, IntegerType))
        if r.semanticEquals(rank) => Some(n - 1)
      case EqualTo(r: AttributeReference, Literal(1, IntegerType))
        if r.semanticEquals(rank) => Some(1)
      case GreaterThanOrEqual(Literal(n: Int, IntegerType), r: AttributeReference)
        if r.semanticEquals(rank) => Some(n)
      case GreaterThan(Literal(n: Int, IntegerType), r: AttributeReference)
        if r.semanticEquals(rank) => Some(n - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.topkRewrite", "true").toBoolean)
      return plan
    plan.transformUp {
      case f @ Filter(cond, w: Window)
          if w.windowExpressions.size == 1 =>
        w.windowExpressions.head match {
          case a @ Alias(WindowExpression(RowNumber(), spec), _)
              if spec.orderSpec.nonEmpty =>
            limitOf(cond, a.toAttribute) match {
              case Some(n) if n >= 1 =>
                TopKPerKeyPlan(spec.partitionSpec, spec.orderSpec, n,
                  a.toAttribute, w.child)
              case _ => f
            }
          case _ => f
        }
    }
  }
}

/** Plans [[TopKPerKeyPlan]] as partial (map-side) + final top-k; the
  * exchange between them is inserted by `EnsureRequirements` from the
  * final node's required distribution.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, rankAttr, child) =>
      val partial =
        TopKPerKeyExec(keys, order, k, rankAttr, partial = true,
          planLater(child))
      TopKPerKeyExec(keys, order, k, rankAttr, partial = false,
        partial) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key top-k pass. `partial = true` runs before the
  * exchange on whatever partitioning the child has (no required
  * distribution, emits no rank); the final pass requires clustering
  * on the keys and appends the rank column. Both keep one bounded
  * heap per key seen in the partition — no sort of the input.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: Attribute, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  // both phases: the partial node carries rankAttr in its argument
  // list without outputting it, and an attribute that is neither
  // produced nor from the child renders the node as invalid ("!")
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  // See TopKPerKeyPlan.allAttributes: gives the produced rankAttr a
  // positional exprId under canonicalization so identical self-join
  // branches compare equal and AQE reuses the exchange/stage.
  override def allAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSeq =
    child.output :+ rankAttr

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val orderExprs = order
    val limit = k
    val emitRank = !partial
    val outSchema = output
    // Spill fallback (partial phase only): the heap map grows with
    // distinct keys per partition — the same bound a hash aggregate's
    // partial phase accepts. Past the cap, rows of UNTRACKED keys pass
    // through untrimmed instead of growing the map; the final phase
    // recomputes the exact per-key top-k after the exchange either
    // way, so the cap trades shuffle volume for bounded memory without
    // touching correctness. The final phase cannot pass through (it
    // must emit exact ranks); its memory contract matches a final hash
    // aggregate, where the key space is already partitioned down.
    val maxKeys =
      conf.getConfString("spark.graft.topk.maxKeysPerPartition",
        "4194304").toInt
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(orderExprs, childOutput)
      // max-heap under the sort order: head = worst kept row; a new
      // row enters only if it beats the head once the heap is full.
      val heaps = new java.util.HashMap[InternalRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      // Lazily drains the input, absorbing rows into the heaps and
      // yielding the overflow passthrough rows as they occur; the
      // heap contents follow once the input is exhausted (Iterator.++
      // builds its right side by name, after the left completes).
      val passthrough = iter.filter { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null && (!partial || heaps.size < maxKeys)) {
          heap = scala.collection.mutable.PriorityQueue.empty(ord)
          heaps.put(key.copy(), heap)
        }
        if (heap == null) true // over cap: emit untrimmed
        else {
          if (heap.size < limit) heap.enqueue(row.copy())
          else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue()
            heap.enqueue(row.copy())
          }
          false
        }
      }
      def drained: Iterator[InternalRow] = {
        val rankedProj =
          if (emitRank)
            UnsafeProjection.create(outSchema, childOutput :+ rankAttr)
          else null
        val rankRow = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(1)
        val joined = new JoinedRow
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala.flatMap { heap =>
          val rows = heap.dequeueAll.reverse // ascending under ord
          if (!emitRank) rows.iterator
          else rows.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.setInt(0, i + 1)
            rankedProj(joined(r, rankRow))
          }
        }
      }
      passthrough ++ drained
    }, preservesPartitioning = true)
  }
}
