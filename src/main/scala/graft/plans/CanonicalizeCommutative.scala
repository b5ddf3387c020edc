package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{DotProduct, PopcountAnd}

/** Optimizer rule: canonicalize the argument order of graft's COMMUTATIVE
  * native kernels (`graft_dot`, `graft_popcnt_and`) under a deterministic
  * key, so semantically-equal calls become syntactically equal.
  *
  * Why it matters: Spark's common-subexpression elimination and plan/
  * exchange reuse compare expressions SYNTACTICALLY — `graft_dot(a, b)`
  * and `graft_dot(b, a)` are the same O(dim) kernel, but appear as two
  * subexpressions to codegen (computed twice in one projection) and
  * defeat ReuseExchange when they title two branches of a self-join. Both
  * kernels are EXACTLY commutative: dot multiplies per index before its
  * fixed-order sum and popcount ANDs per word, so swapping arguments is
  * bit-identical — unlike reordering a general float sum, which this rule
  * never does. Swaps happen only on a STRICT key inequality, so the rule
  * is idempotent and safe under the optimizer's fixed-point batch.
  *
  * Registered via [[graft.GraftExtensions]] (`injectOptimizerRule`), the
  * shared-cluster deployment route; sessions the library did not
  * construct merely miss the optimization, never correctness.
  */
object CanonicalizeCommutativeVectorOps extends Rule[LogicalPlan] {

  /** Deterministic ordering key: the canonicalized form strips cosmetic
    * differences (names, case) while keeping semantic identity, so equal
    * columns order equally no matter how they were written.
    */
  private def key(e: Expression): (Int, String) =
    (e.canonicalized.hashCode, e.canonicalized.toString)

  private def swap(l: Expression, r: Expression): Boolean = {
    val (kl, kr) = (key(l), key(r))
    kl._1 > kr._1 || (kl._1 == kr._1 && kl._2 > kr._2)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(l, r) if swap(l, r) => DotProduct(r, l)
      case PopcountAnd(l, r) if swap(l, r) => PopcountAnd(r, l)
    }
}
