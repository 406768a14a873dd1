/*
 * Catalyst extension for presto_truffle_spark (SURVEY.md §4.3).
 *
 * The one §4.3 bullet that genuinely wants a Scala `Rule[LogicalPlan]`
 * rather than a DataFrame-level rewrite: selectivity/cost-ordered
 * conjuncts. Catalyst's optimizer pushes and merges Filter predicates
 * but evaluates an `And` chain left-to-right exactly as written, so a
 * query spelled `expensive_regex(s) AND cheap_range(x)` pays the regex
 * on every row even though the range check would short-circuit most of
 * them. At 100 TB, conjunct order inside the fused whole-stage-codegen
 * loop is a first-order cost.
 *
 * `ReorderCheapConjuncts` reorders the deterministic conjuncts of every
 * Filter by a static cost rank (comparisons < arithmetic < string
 * prefix/suffix ops < LIKE < regex < UDFs), leaving anything
 * non-deterministic strictly in place (reordering around a
 * non-deterministic predicate would change observable evaluation
 * counts). `And` is commutative in SQL three-valued logic for
 * deterministic operands — the same legality argument Catalyst's own
 * PushDownPredicates relies on when it splits and re-nests conjuncts —
 * so the rewrite is semantics-preserving by construction; the sort is
 * stable so equal-cost conjuncts keep their written order.
 *
 * Also injects `cents(x)` — the repo-wide exact-cents convention
 * `CAST(floor(x * 100 + 0.5) AS BIGINT)` (FIXTURES.md) — as a native
 * SQL function, demonstrating the expression-injection half of the
 * SparkSessionExtensions surface. The builder composes existing
 * catalyst expressions, so it inherits whole-stage codegen untouched.
 *
 * Built by tools/build_native.sh with the Scala compiler BUNDLED in the
 * Spark distribution (no external toolchain). Loaded via
 *   spark.jars=native/presto-truffle-ext.jar
 *   spark.sql.extensions=prestotruffle.PrestoTruffleExtensions
 * Driver sessions are vanilla and never need this jar: every registered
 * query uses pure DataFrame/SQL. The extension is the engine-internal
 * optimization layer, verified by tools/native_ext_check.py in its own
 * session (tests/test_native_ext.py).
 */
package prestotruffle

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

object ReorderCheapConjuncts extends Rule[LogicalPlan] {

  /** Static cost rank of one conjunct: dominated by the most expensive
   *  node it contains, tie-broken by tree size (smaller first). */
  private def cost(e: Expression): Long = {
    var worst = 1L
    var nodes = 0L
    e.foreach { n =>
      nodes += 1
      val c: Long = n match {
        case _: UserDefinedExpression => 1000000L // ScalaUDF / PythonUDF
        case _: RLike                 => 10000L
        case _: Like | _: LikeAll | _: LikeAny => 1000L
        case _: Contains | _: StartsWith | _: EndsWith => 100L
        case _: In | _: InSet         => 10L
        case _                        => 1L
      }
      if (c > worst) worst = c
    }
    worst * 1000L + math.min(nodes, 999L)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond @ And(_, _), child) if cond.deterministic =>
      val conjuncts = splitConjuncts(cond)
      val ordered   = conjuncts.sortBy(cost) // stable: ties keep order
      if (ordered == conjuncts) f
      else Filter(ordered.reduceLeft(And), child)
  }
}

class PrestoTruffleExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ReorderCheapConjuncts)
    ext.injectFunction(
      (
        FunctionIdentifier("cents"),
        new ExpressionInfo(
          classOf[PrestoTruffleExtensions].getName,
          "cents"
        ),
        // Deliberately DOUBLE-space (args cast up front): the repo's
        // cents convention targets double-typed parquet columns, and an
        // explicit cast keeps behavior identical whether the caller
        // hands a double, decimal literal, or int — no silent exact
        // decimal arithmetic on literals that real columns never get.
        (args: Seq[Expression]) =>
          Cast(
            Floor(
              Add(
                Multiply(
                  Cast(args.head, org.apache.spark.sql.types.DoubleType),
                  Literal(100.0d)
                ),
                Literal(0.5d)
              )
            ),
            LongType
          )
      )
    )
  }
}
