package graft.rules

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.RegexCountExpr

/** Optimizer rule: `size(regexp_extract_all(x, 'pattern', 0))` — the
  * natural Spark idiom for counting regex matches (this codebase used it
  * too) — materializes every match as a string just to take the array
  * length. Rewrite it to the allocation-free counting kernel
  * ([[RegexCountExpr]]) whenever the pattern is a literal and the group
  * index is 0. The rewrite is exactly count-preserving (both sides are
  * the same Java `find()` loop) and idempotent (the rewritten tree no
  * longer matches), and the result is cast back to `size`'s INT type so
  * downstream resolution is untouched. */
object RegexCountRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(RegExpExtractAll(subject,
          Literal(p: UTF8String, StringType), Literal(0, IntegerType)), _) =>
        Cast(RegexCountExpr(subject, p.toString), IntegerType)
    }
}

/** Session extension entry point — the (c)-tier Catalyst integration:
  * `GraftSession` installs it programmatically via `withExtensions`, and
  * spark-submit users can set
  * `spark.sql.extensions=graft.rules.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RegexCountRule)
}
