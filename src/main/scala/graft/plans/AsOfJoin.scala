package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.{DataFrame, SparkSession}

/** AS-OF JOIN as a first-class operator: logical node → planner
  * strategy → physical sort-merge exec (the builder guideline's tier
  * (c) — `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered via
  * `SparkSessionExtensions`/`experimental.extraStrategies`).
  *
  * Semantics: for every left row, attach the LATEST right row with the
  * same key whose ordering tuple is STRICTLY BEFORE the left row's
  * (lexicographic over the ordering expressions — a (ts, id) tuple
  * gives the deterministic tie-break a bare timestamp can't), or nulls
  * when no such row exists. This is the "most recent quote before each
  * trade" primitive; the window-over-union encoding
  * ([[graft.ops.RelationalQueries.q14AsOfJoin]]) expresses the same
  * thing only when both sides can be folded into ONE table's ordering —
  * the operator form works for genuinely separate relations.
  *
  * Null KEYS use null-safe equality (null matches null): the merge
  * compares keys with Catalyst's natural ordering, where nulls sort
  * together — the same grouping a window's `PARTITION BY` gives them,
  * so the two encodings agree on null-keyed rows (a plain SQL equi-join
  * would instead drop them).
  *
  * Physical execution is the plan you'd want at 100 TB: both children
  * hash-partitioned on the key ([[ClusteredDistribution]] — Catalyst's
  * EnsureRequirements inserts the exchanges and co-partitions them,
  * exactly as for a shuffled equi-join) and sorted within partitions by
  * (key, ordering). The exec then MERGES each co-partition pair in one
  * linear pass with O(1) state — one candidate row — never
  * materializing a per-key buffer, never a range self-join. Output
  * preserves the left partitioning and ordering, so a downstream
  * aggregate on the same key reuses the shuffle. */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrd: Seq[Expression], rightOrd: Seq[Expression],
    inclusive: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; everything else falls
  * through to the built-in strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lo, ro, incl) =>
      AsOfJoinExec(lk, rk, lo, ro, incl, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrd: Seq[Expression], rightOrd: Seq[Expression],
    inclusive: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Both sides clustered on the key: EnsureRequirements co-partitions
  // them (same machinery as SortMergeJoin), so zipPartitions below pairs
  // partition i of each side on the same key space.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((leftKeys ++ leftOrd).map(SortOrder(_, Ascending)),
        (rightKeys ++ rightOrd).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys ++ leftOrd).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lOrdProj = UnsafeProjection.create(leftOrd, left.output)
      val rOrdProj = UnsafeProjection.create(rightOrd, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val ordOrd = RowOrdering.createNaturalAscendingOrdering(leftOrd.map(_.dataType))
      val nullRight: InternalRow = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // Spark's operator contract expects exec output rows to be
      // UnsafeRow (getByteArrayRdd / SortExec / UnsafeRowSerializer all
      // cast) — emitting the reused JoinedRow directly would crash any
      // direct collect/sort/shuffle consumer that has no Project on
      // top. Same resultProj discipline as SortMergeJoinExec.
      val resultProj = UnsafeProjection.create(output, output)
      val buffered = rIter.buffered
      // O(1) merge state: the latest right row seen whose key might still
      // match, plus a copy of its key (projections reuse buffers).
      var candidate: InternalRow = null
      var candidateKey: UnsafeRow = null
      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        val lo = lOrdProj(lRow)
        var advance = true
        while (advance && buffered.hasNext) {
          val rk = rKeyProj(buffered.head)
          val cmp = keyOrd.compare(rk, lk)
          if (cmp < 0) {
            buffered.next() // right key entirely behind: discard
          } else if (cmp == 0 && {
            val c = ordOrd.compare(rOrdProj(buffered.head), lo)
            c < 0 || (inclusive && c == 0)
          }) {
            candidateKey = rk.copy()
            candidate = buffered.next().copy() // strictly-before match: keep latest
          } else {
            advance = false // right side caught up — stop for this left row
          }
        }
        // stale candidates (from an earlier key) fail the equality check
        if (candidate != null && keyOrd.compare(candidateKey, lk) == 0)
          resultProj(joined(lRow, candidate))
        else resultProj(joined(lRow, nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public builder: `AsOf.join(trades, quotes, ...)`. Column resolution
  * is by name against each side's analyzed plan; right-side column
  * names must not collide with the left's (rename before joining — the
  * operator keeps both sides' columns). */
object AsOf {
  /** Idempotently add the planner strategy to the session (the
    * `experimental.extraStrategies` public extension point; sessions
    * built with `spark.sql.extensions=graft.functions.GraftExtensions`
    * get it injected there instead). */
  def register(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies = AsOfJoinStrategy +: s.experimental.extraStrategies

  /** `inclusive = false` (default) matches the latest right row STRICTLY
    * before the left ordering tuple; `inclusive = true` allows an exact
    * tuple tie (pandas merge_asof's default backward direction). */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftOrd: Seq[String], rightOrd: Seq[String],
           inclusive: Boolean = false): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size &&
            leftOrd.nonEmpty && leftOrd.size == rightOrd.size,
      "as-of join needs matching key and ordering column lists")
    val s = left.sparkSession
    register(s)
    val lp = GraftShim.analyzed(left)
    val rp = GraftShim.analyzed(right)
    // Resolve with the SESSION's resolver (case-insensitive under the
    // default spark.sql.caseSensitive=false), not String == — the old
    // exact-match resolution rejected "Timestamp" for a column named
    // "timestamp" that every other Spark API accepts, and its
    // case-sensitive collision check let "id"/"ID" through to a later
    // ambiguity error (round-7 review).
    val resolver = s.sessionState.analyzer.resolver
    val dup = rp.output.map(_.name)
      .filter(rn => lp.output.exists(la => resolver(la.name, rn)))
    require(dup.isEmpty, s"rename right-side columns colliding with left: $dup")
    def resolve(p: LogicalPlan, n: String): Attribute =
      p.output.filter(a => resolver(a.name, n)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column '$n' not found among ${p.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"column '$n' is ambiguous: ${many.map(_.name).mkString(", ")}")
      }
    val (lkA, rkA) = (leftKeys.map(resolve(lp, _)), rightKeys.map(resolve(rp, _)))
    val (loA, roA) = (leftOrd.map(resolve(lp, _)), rightOrd.map(resolve(rp, _)))
    // The merge compares right-side projections with orderings built
    // from the LEFT side's types — a type mismatch would silently
    // compare mismatched representations and return wrong rows, so it
    // must fail fast here instead.
    def requireSameTypes(l: Seq[Attribute], r: Seq[Attribute], what: String): Unit =
      l.zip(r).foreach { case (a, b) =>
        require(a.dataType == b.dataType,
          s"as-of join $what type mismatch: '${a.name}' ${a.dataType.simpleString} vs " +
          s"'${b.name}' ${b.dataType.simpleString} — cast one side before joining")
      }
    requireSameTypes(lkA, rkA, "key")
    requireSameTypes(loA, roA, "ordering")
    GraftShim.ofRows(s, AsOfJoinPlan(lp, rp, lkA, rkA, loA, roA, inclusive))
  }
}
