package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Named access to Spark's OWN bloom-filter expressions (the pair the
  * engine uses internally for runtime row-group filters, exposed here as
  * callable functions): `graft_bloom_agg(xxhash64(x), est_items,
  * num_bits)` builds a serialized sketch, `graft_bloom_contains(sketch,
  * xxhash64(x))` probes it. Nothing is reimplemented — registration
  * only, same TypedImperativeAggregate machinery as [[TopKPairs]]. The
  * probe side requires a FOLDABLE sketch (a literal or scalar
  * subquery), which is exactly the intended shape: the sketch is a
  * driver/broadcast-held constant, never a per-row value. */
object BloomSketch {

  val aggName = "graft_bloom_agg"
  val containsName = "graft_bloom_contains"

  private val aggBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 3,
      s"$aggName takes exactly 3 arguments (xxhash64 value, est_items, num_bits)")
    new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)).toAggregateExpression()
  }

  private val containsBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2,
      s"$containsName takes exactly 2 arguments (sketch, xxhash64 value)")
    BloomFilterMightContain(exprs(0), exprs(1))
  }

  /** Idempotent per-session registration (same contract as
    * [[DotProduct.register]]). */
  def register(spark: SparkSession): Unit = {
    Seq((aggName, aggBuilder), (containsName, containsBuilder)).foreach {
      case (n, b) =>
        if (!spark.sessionState.functionRegistry.functionExists(FunctionIdentifier(n)))
          spark.sessionState.functionRegistry.createOrReplaceTempFunction(n, b, "built-in")
    }
  }

  /** Extension-pipeline injection — the SAME surface [[register]]
    * gives a live session, so an extension-configured deployment
    * (`spark.sql.extensions=graft.functions.GraftExtensions`) gets the
    * bloom functions too; they were reachable only through the code
    * path before (round-7 review). */
  def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    Seq((aggName, aggBuilder), (containsName, containsBuilder)).foreach {
      case (n, b) => ext.injectFunction((
        FunctionIdentifier(n),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          BloomSketch.getClass.getName, n),
        b))
    }
}
