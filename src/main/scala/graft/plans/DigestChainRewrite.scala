package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

import graft.functions.Md5Prefix64

/** Optimizer rule (the `Rule[LogicalPlan]` extension tier, next to the
  * [[AsOfJoinStrategy]] planner tier and the native-Expression tier):
  * rewrites the repo's DECLARATIVE digest chain
  * `cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)` into the
  * native [[graft.functions.Md5Prefix64]] expression.
  *
  * Why a rule and not just the function: the declarative chain is the
  * LIVING DEFINITION — it appears in session-free fallbacks
  * ([[graft.operators.Dedup.digest64]]), in user-authored SQL, and in
  * every DuckDB oracle mirror. The rewrite makes the optimization a
  * PROPERTY OF THE SESSION rather than of call sites: any plan that
  * spells out the chain gets the measured 30% digest speedup
  * (DESIGN.md §5, 2.5 s → 1.75 s over 2.9M grams) without knowing the
  * native expression exists. Bit-identical by construction —
  * Md5Prefix64 reads the same 60 bits the hex prefix encodes
  * (Md5Prefix64Spec pins equality on ascii/unicode/empty/long inputs).
  *
  * Matched shape, precisely: md5's argument must be a STRING cast to
  * binary (the analyzer's implicit cast for `md5(stringCol)`) — a
  * genuinely binary-typed argument is left alone (the native
  * expression's contract is string input); positions 1/15 and bases
  * 16/10 must be the exact literals. Anything else passes through
  * untouched. */
object DigestChainRewrite extends Rule[LogicalPlan] {

  private object DigestChain {
    def unapply(e: Expression): Option[Expression] = e match {
      case cast: Cast if cast.dataType == LongType =>
        cast.child match {
          case conv: Conv => conv.children match {
            case Seq(sub: Substring,
                     Literal(16, IntegerType), Literal(10, IntegerType)) =>
              sub.children match {
                case Seq(m: Md5,
                         Literal(1, IntegerType), Literal(15, IntegerType)) =>
                  m.child match {
                    case inner: Cast if inner.dataType == BinaryType &&
                        inner.child.dataType == StringType =>
                      Some(inner.child)
                    case direct if direct.dataType == StringType =>
                      Some(direct)
                    case _ => None
                  }
                case _ => None
              }
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DigestChain(strChild) => Md5Prefix64(strChild)
    }
}
