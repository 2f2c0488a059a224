package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, payload) pairs under
  * (score DESC, payload ASC) order. Inserts append; the buffer compacts
  * (sort + truncate to k) whenever it exceeds 2k, so memory stays O(k)
  * regardless of group size and duplicates are preserved exactly (a
  * tree-set would silently collapse identical pairs). */
final class TopKPairsBuffer(val k: Int) {
  val pairs = new ArrayBuffer[(Double, Long)](k + 1)

  private def compactTo(n: Int): Unit =
    if (pairs.length > n) {
      val best = pairs.sorted(TopKPairsBuffer.bestFirst).take(n)
      pairs.clear()
      pairs ++= best
    }

  def insert(score: Double, payload: Long): Unit = {
    pairs += ((score, payload))
    if (pairs.length > 2 * k) compactTo(k)
  }

  def mergeIn(other: TopKPairsBuffer): Unit = {
    pairs ++= other.pairs
    compactTo(k)
  }

  /** The final (score DESC, payload ASC) top-k list. */
  def result: Seq[(Double, Long)] =
    pairs.sorted(TopKPairsBuffer.bestFirst).take(k).toSeq
}

object TopKPairsBuffer {
  /** (score DESC, payload ASC) with SQL total ordering on the score:
    * `java.lang.Double.compare` ranks NaN above every number, so a
    * NaN-scored pair sorts FIRST — exactly like Spark's `ORDER BY score
    * DESC` and DuckDB's row_number window. A naive `sortBy(-score)`
    * would invert that (NaN survives negation) and silently drop
    * NaN-scored pairs from the top-k the window idiom would keep. */
  val bestFirst: Ordering[(Double, Long)] = (a: (Double, Long), b: (Double, Long)) => {
    val c = java.lang.Double.compare(b._1, a._1)
    if (c != 0) c else java.lang.Long.compare(a._2, b._2)
  }
}

/** Native top-k aggregate, exposed as `graft_topk(score, payload, k)` →
  * `array<struct<score double, payload bigint>>` sorted (score DESC,
  * payload ASC).
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

  override def children: Seq[Expression] = Seq(scoreChild, payloadChild, kChild)
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreChild.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"${TopKPairs.name} score must be DOUBLE, got ${scoreChild.dataType.sql}")
    else if (payloadChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"${TopKPairs.name} payload must be BIGINT, got ${payloadChild.dataType.sql}")
    else if (!(kChild.dataType == IntegerType || kChild.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"${TopKPairs.name} k must be an integer literal, got ${kChild.dataType.sql}")
    else if (!kChild.foldable || kChild.eval() == null ||
             kChild.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure(s"${TopKPairs.name} k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKPairsBuffer = new TopKPairsBuffer(k)

  override def update(buffer: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    val s = scoreChild.eval(input)
    val p = payloadChild.eval(input)
    if (s != null && p != null)
      buffer.insert(s.asInstanceOf[Double], p.asInstanceOf[Long])
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
    val bos = new ByteArrayOutputStream(4 + 16 * best.length)
    val out = new DataOutputStream(bos)
    out.writeInt(best.length)
    best.foreach { case (s, p) => out.writeDouble(s); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKPairsBuffer(k)
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
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
