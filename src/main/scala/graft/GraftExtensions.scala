package graft

import graft.expressions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * functions into any session via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), making
  * `cosine_similarity(a, b)` available to plain Spark SQL across the
  * cluster — no per-session registration code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    // Pre-CBO, not the operator-optimization fixpoint: the rewrite emits
    // a custom logical node whose expression lists must not be rewritten
    // by the stock operator rules that iterate that batch.
    ext.injectPreCBORule(_ => graft.plans.LshProbeRewrite)
    ext.injectPlannerStrategy(s => graft.plans.LshProbeStrategy(s))
  }
}
