package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit frequency-weighted SimHash over a space-tokenized text
  * column, exposed as the SQL function `graft_simhash(text)`.
  *
  * The signature is definable with built-ins two ways — the explode +
  * groupBy form (codegen'd but pays a shuffle of 64 longs per doc) and
  * the higher-order `aggregate` fold (zero-shuffle but HOF lambdas run
  * interpreted, with two array allocations per token) — and both parse
  * md5 HEX TEXT per bit or per half. This expression is the fused best
  * of both: one md5 per token read as RAW DIGEST BYTES (bit j of the
  * signature is exactly bit j of the digest read MSB-first — the hex
  * digit/nibble arithmetic of the composable forms collapses to one
  * shift), 64 int counter updates per token, no intermediate arrays, no
  * shuffle, inside whole-stage codegen. At 100 TB the signature runs at
  * scan rate in the read stage; being a pure scalar expression it also
  * drops into Structured Streaming projections unchanged.
  *
  * Tokenization reuses `UTF8String.split(" ", -1)` — the exact code
  * path of SQL `split(text, ' ')` — so empty tokens from doubled /
  * leading / trailing spaces count identically to the composable forms
  * and to the DuckDB oracle's `string_split`. Parity across all three
  * derivations is pinned by DedupBlockingSpec and SimHash64Spec.
  *
  * Cites reference behavior: exclowd/arrow-parquet-logs has no near-dup
  * operator; this backs the dedup superset (SURVEY §2 LLM-pipeline
  * items), same builder tier (b) as [[DotProduct]].
  */
final case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${SimHash64.name} expects a string column, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  val name = "graft_simhash"

  private val Space = UTF8String.fromString(" ")

  // MessageDigest is stateful and not thread-safe; one per executor task
  // thread, reset per token. (Same pattern as Spark's own Md5 via
  // commons DigestUtils, minus the hex-string round trip.)
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** The full signature of one document; called from generated code. */
  def compute(text: UTF8String): Long = {
    val toks = text.split(Space, -1)
    val counts = new Array[Int](64)
    val md = digests.get()
    var t = 0
    while (t < toks.length) {
      md.reset()
      val dig = md.digest(toks(t).getBytes)
      // First 8 digest bytes, MSB-first: bit j of the token's
      // contribution = bit (63 - j) of h.
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      var j = 0
      while (j < 64) {
        counts(j) += (((h >>> (63 - j)) & 1L).toInt << 1) - 1
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  /** The arity-checked builder both registration paths share. */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 1, s"$name takes exactly 1 argument")
    SimHash64(exprs.head)
  }

  /** Idempotent per-session registration (see [[DotProduct.register]]). */
  def register(spark: SparkSession): Unit = {
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
  }
}
