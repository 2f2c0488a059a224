package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector — the production registration path for
  * graft's native functions (the builder guideline's "registered via
  * SparkSessionExtensions"). Wire it at session build:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * or `withExtensions(new GraftExtensions)`. [[DotProduct.register]]
  * remains the fallback for sessions whose construction graft doesn't
  * control (the driver's harness).
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(DotProduct.name),
      new ExpressionInfo(classOf[DotProduct].getName, DotProduct.name),
      GraftExtensions.dotProductBuilder))
    ext.injectFunction((
      FunctionIdentifier(TopKPairs.name),
      new ExpressionInfo(classOf[TopKPairs].getName, TopKPairs.name),
      TopKPairs.builder))
    ext.injectFunction((
      FunctionIdentifier(SimHash64.name),
      new ExpressionInfo(classOf[SimHash64].getName, SimHash64.name),
      SimHash64.builder))
    BloomSketch.inject(ext)
    // Rewrite the composable aggregate(zip_with(...)) dot-product idiom
    // to the fused expression wherever it is provably equivalent.
    ext.injectOptimizerRule(_ => DotProductRewrite)
    // Plan the custom as-of join logical node to its sort-merge exec.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  /** The `graft_dot` expression builder the injector registers. */
  val dotProductBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, s"${DotProduct.name} takes exactly 2 arguments")
    DotProduct(exprs(0), exprs(1))
  }
}
