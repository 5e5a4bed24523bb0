package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Jalali, JalaliDateExpr}

/** Optimizer rule: make Jalali date-string windows sargable.
  *
  * The reference's F2 filter (SURVEY.md §2.4; mabna_tables_create.py:244)
  * compares a derived `'yyyy/MM/dd'` Jalali string lexicographically:
  * `jalali_date(d) BETWEEN '1399/01/01' AND '1402/12/29'`. Evaluated as
  * written, that is a per-row calendar conversion inside the filter and
  * an opaque predicate no source can push. But `jalali_date` is a
  * strictly monotonic day-bijection, so every comparison against a
  * valid Jalali literal is equivalent to the same comparison of the raw
  * DateType column against the converted Gregorian day — which Parquet
  * scans push as min/max row-group pruning and partitioned tables turn
  * into partition pruning.
  *
  * `jalali_date(d) ⋈ 'jy/jm/jd'  ⟺  d ⋈ toGregorian(jy,jm,jd)`
  * for ⋈ ∈ {=, <, ≤, >, ≥}, both literal orientations. Unparseable
  * literals are left untouched.
  */
object SargableJalaliFilter extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) => f.copy(condition = rewrite(cond))
  }

  private def rewrite(e: Expression): Expression = e.transformUp {
    case GreaterThanOrEqual(J(d), L(x)) => GreaterThanOrEqual(d, x)
    case GreaterThan(J(d), L(x)) => GreaterThan(d, x)
    case LessThanOrEqual(J(d), L(x)) => LessThanOrEqual(d, x)
    case LessThan(J(d), L(x)) => LessThan(d, x)
    case EqualTo(J(d), L(x)) => EqualTo(d, x)
    case GreaterThanOrEqual(L(x), J(d)) => GreaterThanOrEqual(x, d)
    case GreaterThan(L(x), J(d)) => GreaterThan(x, d)
    case LessThanOrEqual(L(x), J(d)) => LessThanOrEqual(x, d)
    case LessThan(L(x), J(d)) => LessThan(x, d)
    case EqualTo(L(x), J(d)) => EqualTo(x, d)
  }

  /** Match jalali_date over a DateType child. */
  private object J {
    def unapply(e: Expression): Option[Expression] = e match {
      case JalaliDateExpr(child) if child.dataType == DateType => Some(child)
      case _ => None
    }
  }

  /** Match a CANONICAL 'yyyy/MM/dd' Jalali literal → DateType literal.
    * Non-canonical dates (e.g. Esfand 30 of a non-leap year) are left
    * unrewritten: `j2d` would normalize them onto a real Gregorian day,
    * silently changing which rows the comparison admits — the original
    * string comparison must keep its (vacuous) semantics instead. */
  private object L {
    private val pat = """(\d{4})/(\d{2})/(\d{2})""".r
    def unapply(e: Expression): Option[Literal] = e match {
      case Literal(s: UTF8String, StringType) => s.toString match {
        case pat(jys, jms, jds) =>
          scala.util.Try {
            val (jy, jm, jd) = (jys.toInt, jms.toInt, jds.toInt)
            val (gy, gm, gd) = Jalali.toGregorian(jy, jm, jd)
            require(Jalali.fromGregorian(gy, gm, gd) == ((jy, jm, jd)),
              s"non-canonical Jalali date $s")
            val epochDay = java.time.LocalDate.of(gy, gm, gd).toEpochDay.toInt
            Literal(epochDay, DateType)
          }.toOption
        case _ => None
      }
      case _ => None
    }
  }
}

/** Session extensions: the sargable-Jalali rule + every graft SQL
  * function, so `spark.sql.extensions=graft.plans.GraftExtensions`
  * equips any session (including pure-SQL users) with the engine. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => SargableJalaliFilter)
    ext.injectPostHocResolutionRule { session =>
      // registration is idempotent; post-hoc keeps it out of hot paths
      graft.functions.GraftFunctions.register(session)
      graft.functions.ArrayMath.register(session)
      graft.functions.TextHashFunctions.register(session)
      graft.functions.MediaFunctions.register(session)
      NoopRule
    }
  }
  private object NoopRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan
  }
}
