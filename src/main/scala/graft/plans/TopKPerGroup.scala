package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension — the SURVEY §2 "custom operator"
  * preference path (c): a logical node + planner strategy + physical
  * operator for per-group top-k, the one heavy relational shape whose
  * built-in spelling (Window rank + filter) cannot reduce map-side.
  *
  * Why a custom operator instead of the Window form: a window top-k
  * shuffles EVERY row of the fact table to its group's partition, sorts
  * the whole partition, then discards all but k rows per group. This
  * operator plans as TWO phases, exactly like a hash aggregate:
  *
  *   TopKPerGroupExec(final)   — exact top-k after the group exchange
  *     +- ShuffleExchange(hash(group))   [inserted by EnsureRequirements]
  *       +- TopKPerGroupExec(partial)    — bounded per-key heaps map-side
  *
  * The partial phase caps each input partition's contribution at k rows
  * PER GROUP, so the shuffle carries at most partitions·groups·k rows
  * instead of every row — the same partial-reduction law that makes
  * aggregation scale, applied to an order statistic.
  *
  * Memory discipline (round-8 advice): in the partial phase a single task
  * can see EVERY group, so an unbounded heap map would be
  * O(total_groups × k) per task and OOM instead of spilling at high group
  * cardinality (sim_knn_graph: groups = every vector). The partial phase
  * therefore caps its heap map at `spark.graft.topk.maxPartialGroups`
  * (default 65536) live groups; once full, rows of UNSEEN groups stream
  * through unreduced. Partial reduction is only an optimization — the
  * final phase (whose state is output-sized: its partition's groups × k,
  * i.e. exactly the rows it returns) restores exactness, so the cap
  * trades shuffle volume for bounded memory, never correctness.
  *
  * Determinism: callers must pass a TOTAL ordering (tie-broken sort
  * keys); the retained row SET is then unique regardless of partitioning
  * or arrival order, which is what makes the operator oracle-pairable.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "top-k needs k > 0")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans the logical node as the partial/final exec pair. Injected via
  * `GraftExtensions` (build-time `spark.sql.extensions`) or
  * `TopKOps.ensureStrategy` (runtime, idempotent).
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groupExprs, ordering, k, child) =>
      val partial =
        TopKPerGroupExec(groupExprs, ordering, k, planLater(child), partial = true)
      TopKPerGroupExec(groupExprs, ordering, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** The final phase demands co-located groups — EnsureRequirements
    * inserts the hash exchange between the two phases; the partial phase
    * runs wherever the data already is.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprsLocal = groupExprs
    val orderingLocal = ordering
    val kLocal = k
    // partial-only group-map cap (final state is output-sized by the
    // ClusteredDistribution, so capping it would only break exactness)
    val maxGroups =
      if (partial)
        conf.getConfString("spark.graft.topk.maxPartialGroups", "65536").toInt
      else Int.MaxValue
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprsLocal, childOutput)
      // codegen'd row comparator on the (total) sort keys
      val cmp = GenerateOrdering.generate(orderingLocal, childOutput)
      // max-heap: head = WORST retained row, evicted on a better arrival
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      new Iterator[InternalRow] {
        // a row whose group overflowed the map, streamed through unreduced
        private var overflow: InternalRow = null
        private var drained: java.util.Iterator[java.util.PriorityQueue[InternalRow]] = null
        private var current: java.util.Iterator[InternalRow] =
          java.util.Collections.emptyIterator()
        /** Consume input until it is exhausted or an overflow row must be
          * emitted (it references the scanner's reused buffer, so it goes
          * downstream before the next iter.next(), like any narrow op).
          */
        private def consume(): Unit = {
          while (overflow == null && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              if (heaps.size() >= maxGroups) { overflow = row }
              else {
                heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, cmp.reversed())
                heaps.put(key.copy(), heap)
              }
            }
            if (heap != null) {
              if (heap.size < kLocal) heap.add(row.copy())
              else if (cmp.compare(row, heap.peek()) < 0) {
                heap.poll()
                heap.add(row.copy())
              }
            }
          }
        }
        override def hasNext: Boolean = {
          if (overflow != null) return true
          consume()
          if (overflow != null) return true
          if (drained == null) drained = heaps.values().iterator()
          while (!current.hasNext && drained.hasNext) current = drained.next().iterator()
          current.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty top-k iterator")
          if (overflow != null) { val r = overflow; overflow = null; r }
          else current.next()
        }
      }
    }
  }
}
