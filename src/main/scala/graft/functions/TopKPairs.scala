package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, payload) pairs under
  * the supplied (score DESC, payload ASC) ordering. Inserts append; the
  * buffer compacts (sort + truncate to k) whenever it exceeds 2k, so
  * memory stays O(k) regardless of group size and duplicates are
  * preserved exactly (a tree-set would silently collapse identical
  * pairs). Values are INTERNAL representations (UTF8String,
  * InternalRow, ...), already defensively copied by the caller. */
final class TopKPairsBuffer(val k: Int, ord: Ordering[(Any, Any)]) {
  val pairs = new ArrayBuffer[(Any, Any)](k + 1)

  private def compactTo(n: Int): Unit =
    if (pairs.length > n) {
      val best = pairs.sorted(ord).take(n)
      pairs.clear()
      pairs ++= best
    }

  def insert(score: Any, payload: Any): Unit = {
    pairs += ((score, payload))
    if (pairs.length > 2 * k) compactTo(k)
  }

  def mergeIn(other: TopKPairsBuffer): Unit = {
    pairs ++= other.pairs
    compactTo(k)
  }

  /** The final (score DESC, payload ASC) top-k list. */
  def result: Seq[(Any, Any)] = pairs.sorted(ord).take(k).toSeq
}

/** Native top-k aggregate, exposed as `graft_topk(score, payload, k)` →
  * `array<struct<score, payload>>` sorted (score DESC, payload ASC).
  * Score and payload take ANY orderable type — a `struct(tf, -df)`
  * score expresses a composite (tf DESC, df ASC) ranking key, a string
  * payload ranks tokens/documents directly.
  *
  * The window idiom — `row_number() OVER (PARTITION BY g ORDER BY score
  * DESC) <= k` — computes the same thing but must SORT every group's
  * full row set after shuffling ALL rows to the group's partition. This
  * aggregate keeps a bounded k-pair buffer per group and combines
  * map-side, so each partition ships at most k pairs per group into the
  * shuffle — at 100 TB, the difference between shuffling the corpus and
  * shuffling k rows per group. The (c) tier of the builder guideline:
  * a `TypedImperativeAggregate` where no built-in aggregate (max_by is
  * k=1; collect_list is unbounded) expresses bounded top-k.
  *
  * Ordering uses Catalyst's interpreted SQL ordering for the child
  * types (struct = field-by-field, double = total order with NaN
  * ranked ABOVE every number, exactly like `ORDER BY score DESC` in
  * both Spark and DuckDB — a naive `sortBy(-score)` would invert that
  * and silently drop NaN-scored pairs the window idiom keeps).
  *
  * Determinism: the comparator is total — (score DESC, payload ASC) —
  * so the result is independent of input partitioning and merge order,
  * and the oracle replays it as a row_number window. */
final case class TopKPairs(
    scoreChild: Expression,
    payloadChild: Expression,
    kChild: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuffer] {

  private lazy val k: Int = kChild.eval().asInstanceOf[Number].intValue()

  /** (score DESC, payload ASC) for the child types — built once via the
    * shared [[TopKPairs.orderingFor]] factory so tests exercise the
    * EXACT production comparator. Buffers only ever hold non-null
    * values (update skips nulls). */
  @transient private lazy val bestFirst: Ordering[(Any, Any)] =
    TopKPairs.orderingFor(scoreChild.dataType, payloadChild.dataType)

  /** Serializer for one (score, payload) pair — UnsafeRow bytes are a
    * self-contained, type-agnostic wire format. */
  @transient private lazy val pairProjection: UnsafeProjection =
    UnsafeProjection.create(Array(scoreChild.dataType, payloadChild.dataType))

  override def children: Seq[Expression] = Seq(scoreChild, payloadChild, kChild)
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", scoreChild.dataType, nullable = false),
    StructField("payload", payloadChild.dataType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!RowOrdering.isOrderable(scoreChild.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"${TopKPairs.name} score type ${scoreChild.dataType.sql} is not orderable")
    else if (!RowOrdering.isOrderable(payloadChild.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"${TopKPairs.name} payload type ${payloadChild.dataType.sql} is not orderable")
    else if (!(kChild.dataType == IntegerType || kChild.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"${TopKPairs.name} k must be an integer literal, got ${kChild.dataType.sql}")
    else if (!kChild.foldable || kChild.eval() == null || {
               // validate the LONG value before any int truncation: a
               // 2^32+1 literal truncates to 1 and silently returns
               // top-1 instead of erroring (round-7 review)
               val v = kChild.eval().asInstanceOf[Number].longValue()
               v < 1 || v > Int.MaxValue
             })
      TypeCheckResult.TypeCheckFailure(
        s"${TopKPairs.name} k must be a positive literal within int range")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKPairsBuffer = new TopKPairsBuffer(k, bestFirst)

  override def update(buffer: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    val s = scoreChild.eval(input)
    val p = payloadChild.eval(input)
    if (s != null && p != null)
      // copyValue: eval may return views into reused row/byte buffers
      // (UTF8String, UnsafeRow) — the buffer outlives the input row
      buffer.insert(InternalRow.copyValue(s), InternalRow.copyValue(p))
    buffer
  }

  override def merge(buffer: TopKPairsBuffer, input: TopKPairsBuffer): TopKPairsBuffer = {
    buffer.mergeIn(input)
    buffer
  }

  override def eval(buffer: TopKPairsBuffer): Any =
    new GenericArrayData(buffer.result.map { case (s, p) =>
      new GenericInternalRow(Array[Any](s, p))
    }.toArray[Any])

  override def serialize(buffer: TopKPairsBuffer): Array[Byte] = {
    val best = buffer.result // ship at most k pairs across the wire
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(best.length)
    best.foreach { case (s, p) =>
      val row = pairProjection(InternalRow(s, p))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKPairsBuffer(k, bestFirst)
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      row.pointTo(rowBytes, len)
      buf.insert(
        InternalRow.copyValue(row.get(0, scoreChild.dataType)),
        InternalRow.copyValue(row.get(1, payloadChild.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreChild = newChildren(0), payloadChild = newChildren(1), kChild = newChildren(2))

  override def prettyName: String = TopKPairs.name
}

object TopKPairs {
  val name = "graft_topk"

  /** The one (score DESC, payload ASC) comparator, shared by production
    * and the property tests so the two can never drift. The (double,
    * bigint) shape — every ANN query's hot path — gets a direct
    * primitive-compare path with no interpreted-ordering dispatch;
    * `SQLOrderingUtil.compareDoubles` keeps its semantics IDENTICAL to
    * the generic path (SQL total order: NaN ranks above every number,
    * -0.0 ties 0.0 — matching both Spark's ORDER BY and the DuckDB
    * oracle's window replay). Buffer entries are boxed either way
    * (generic pairs); what the fast path removes is per-comparison
    * virtual dispatch in the O(n log k) compaction sorts. */
  def orderingFor(scoreType: DataType, payloadType: DataType): Ordering[(Any, Any)] =
    (scoreType, payloadType) match {
      case (DoubleType, LongType) =>
        (a: (Any, Any), b: (Any, Any)) => {
          val c = org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(
            b._1.asInstanceOf[Double], a._1.asInstanceOf[Double])
          if (c != 0) c
          else java.lang.Long.compare(a._2.asInstanceOf[Long], b._2.asInstanceOf[Long])
        }
      case _ =>
        val scoreOrd = TypeUtils.getInterpretedOrdering(scoreType)
        val payloadOrd = TypeUtils.getInterpretedOrdering(payloadType)
        (a: (Any, Any), b: (Any, Any)) => {
          val c = scoreOrd.compare(b._1, a._1)
          if (c != 0) c else payloadOrd.compare(a._2, b._2)
        }
    }

  /** Arity-checked builder shared by both registration paths. */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 3, s"$name takes exactly 3 arguments (score, payload, k)")
    TopKPairs(exprs(0), exprs(1), exprs(2)).toAggregateExpression()
  }

  /** Idempotent per-session registration (same contract as
    * [[DotProduct.register]]). */
  def register(spark: SparkSession): Unit = {
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
  }
}
