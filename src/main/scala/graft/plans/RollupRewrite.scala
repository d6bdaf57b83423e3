package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DateType, LongType, TimestampType}

/** Optimizer rule (extension ladder step (c), SURVEY.md §3):
  * MATERIALIZED-ROLLUP rewrite — answer an aggregate over the raw
  * event stream from a pre-aggregated rollup table when every piece of
  * the query is derivable from the rollup's grain. The classic
  * materialized-view aggregate rewrite (Goldstein & Larson, SIGMOD'01)
  * — at 100 TB this is THE telemetry lever: a dashboard's
  * per-day/per-service counts re-aggregate a few million rollup rows
  * instead of re-scanning the raw table.
  *
  * The rollup contract (see [[graft.telemetry.Rollups]]): one row per
  * (hour-truncated time, dims…) with `cnt = count(*)` plus per-measure
  * `sum/<sumLong>/min/max` columns. A query
  *
  * {{{ events.filter(dims/aligned-time).groupBy(f(ts), dims)
  *          .agg(count/sum/min/max) }}}
  *
  * rewrites to the same shape over the rollup with count(*)→sum(cnt),
  * sum(x)→sum(sum_x), min(x)→min(min_x), max(x)→max(max_x) — exact for
  * counts, integer sums (the `sumLong` measures) and min/max (lossless
  * re-aggregation / idempotence). A DOUBLE `sum` re-aggregates per-hour
  * FP partials: the value is order-stable in magnitude (same summands,
  * different association) but not guaranteed bit-identical to the raw
  * scan — the one knowingly-tolerated deviation from strict answer
  * preservation; register only `sumLong` measures if bit-exactness is
  * required. Groupings may use the time column only through
  * hour-invariant wrappers (`date_trunc` at hour or coarser, `hour()`,
  * a cast to date); filters may touch dims freely and the time column
  * only as `ts >= L` / `ts < L` with L hour-ALIGNED (those commute
  * exactly with hour truncation). Anything else — distinct aggregates,
  * agg FILTER clauses, avg, unaligned bounds, unregistered columns —
  * bails to the original plan: the rewrite is answer-preserving
  * (bit-exact except the double-sum case above) or absent.
  *
  * Registration is one conf ([[SPEC_KEY]]) holding a JSON spec — meant
  * to be scoped around the intended query (SparkEntry.queryConfs), the
  * same blast-radius discipline as [[RangeJoinRewrite]]. Time
  * arithmetic is only claimed for the spec's `tz` (UTC): a session in
  * any other zone bails. */
object RollupRewrite extends Rule[LogicalPlan] {

  val SPEC_KEY = "spark.graft.rollupRewrite.spec"

  private val HourUs = 3600L * 1000000L

  /** Parsed [[SPEC_KEY]] JSON. Base table matching is by explicit
    * `basePath` or by `basePathSuffix` (e.g. "events.parquet" matches
    * any sf dir); the rollup location is explicit `rollupPath` or
    * derived `rollupRoot/md5(basePath)` via [[rollupPathFor]] so a
    * static conf serves every scale factor. */
  final case class Measure(sum: Option[String], sumLong: Option[String],
                           min: Option[String], max: Option[String])
  final case class Spec(basePath: Option[String], basePathSuffix: Option[String],
                        rollupPath: Option[String], rollupRoot: Option[String],
                        icebergRollup: Boolean,
                        timeCol: String, grainCol: String, grain: String,
                        tz: String,
                        dims: Seq[String], count: String,
                        measures: Map[String, Measure])

  def rollupPathFor(root: String, basePath: String): String = {
    val md = MessageDigest.getInstance("MD5")
      .digest(normPath(basePath).getBytes("UTF-8"))
    s"$root/${md.map(b => f"$b%02x").mkString}"
  }

  private def normPath(p: String): String =
    p.replaceFirst("^file:(//)?", "").stripSuffix("/")

  /** The conf holds ONE spec object or a JSON ARRAY of them (an MV
    * hierarchy, e.g. day + hour rollups of the same base). Specs are
    * tried IN DECLARED ORDER — list the coarsest (smallest) rollup
    * first and the query lands on the cheapest one that can answer
    * it. */
  private def specs: Seq[Spec] =
    SQLConf.get.getConfString(SPEC_KEY, "").trim match {
      case "" => Nil
      case js => scala.util.Try {
        import org.json4s._
        import org.json4s.jackson.JsonMethods.parse
        def one(j: JValue): Spec = {
          def str(f: String): Option[String] =
            (j \ f).toOption.collect { case JString(s) => s }
          def meas(v: JValue): Measure = {
            def s(f: String) = (v \ f).toOption.collect { case JString(x) => x }
            Measure(s("sum"), s("sumLong"), s("min"), s("max"))
          }
          Spec(str("basePath"), str("basePathSuffix"),
            str("rollupPath"), str("rollupRoot"),
            (j \ "icebergRollup").toOption.contains(JBool(true)),
            str("timeCol").getOrElse("ts"),
            str("grainCol").getOrElse("hour_ts"),
            str("grain").getOrElse("hour"),
            str("tz").getOrElse("UTC"),
            (j \ "dims").toOption.collect {
              case JArray(a) => a.collect { case JString(s) => s }
            }.getOrElse(Nil),
            str("count").getOrElse("cnt"),
            (j \ "measures").toOption.collect {
              case JObject(fs) => fs.map { case (k, v) => k -> meas(v) }.toMap
            }.getOrElse(Map.empty))
        }
        parse(js) match {
          case JArray(items) => items.map(one)
          case obj => Seq(one(obj))
        }
      }.getOrElse(Nil)
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Strip Projects (collecting alias definitions — the optimizer's
    * PullOutGroupingExpressions parks complex group-bys in a Project
    * below the Aggregate), collect Filter conjuncts, reach the scan. */
  private def unwrap(p: LogicalPlan)
      : Option[(Seq[Expression], Map[ExprId, Expression], LogicalRelation)] =
    p match {
      case lr: LogicalRelation => Some((Nil, Map.empty, lr))
      case Filter(cond, c) =>
        unwrap(c).map { case (fs, am, lr) => (conjuncts(cond) ++ fs, am, lr) }
      case Project(pl, c) if pl.forall {
          case _: AttributeReference => true
          case a: Alias => a.child.deterministic
          case _ => false } =>
        unwrap(c).map { case (fs, am, lr) =>
          (fs, am ++ pl.collect { case a: Alias => a.exprId -> a.child }, lr)
        }
      case _ => None
    }

  /** Substitute project-alias attributes by their defining expressions
    * until everything is in terms of the scan's own output. */
  private def inline(e: Expression, am: Map[ExprId, Expression]): Expression = {
    var cur = e
    var i = 0
    while (i < 10 && cur.references.exists(r => am.contains(r.exprId))) {
      cur = cur.transformUp {
        case a: AttributeReference if am.contains(a.exprId) => am(a.exprId)
      }
      i += 1
    }
    cur
  }

  private def scanPath(lr: LogicalRelation): Option[String] =
    lr.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.size == 1 =>
        Some(normPath(fs.location.rootPaths.head.toString))
      case _ => None
    }

  private def baseMatches(s: Spec, path: String): Boolean =
    s.basePath.map(normPath).contains(path) ||
      s.basePathSuffix.exists(suf => path.endsWith("/" + suf))

  /** date_trunc units at the grain or coarser — f(ts) == f(grain(ts)). */
  private val CoarserThanHour = Set("hour", "day", "dd", "week", "month",
    "mon", "mm", "quarter", "year", "yyyy", "yy")
  private val CoarserThanDay = CoarserThanHour - "hour"

  private def truncUnits(grain: String): Set[String] = grain match {
    case "hour" => CoarserThanHour
    case "day"  => CoarserThanDay
    case _      => Set.empty
  }

  private def grainMicros(grain: String): Option[Long] = grain match {
    case "hour" => Some(HourUs)
    case "day"  => Some(24L * HourUs)
    case _      => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val ss = specs
    if (ss.isEmpty) return plan
    // time arithmetic (grain alignment, trunc commutation) is only
    // claimed for UTC — any other session zone keeps the raw plan
    if (ss.exists(_.tz != "UTC") ||
        SQLConf.get.sessionLocalTimeZone != "UTC") return plan
    plan.transformUp {
      case agg @ Aggregate(groups, aggs, child, _) =>
        (for {
          (rawFilters, am, lr) <- unwrap(child)
          path <- scanPath(lr)
          filters = rawFilters.map(inline(_, am))
          groups2 = groups.map(inline(_, am))
          aggs2 = aggs.map {
            case al: Alias => Alias(inline(al.child, am), al.name)(
              exprId = al.exprId, qualifier = al.qualifier,
              explicitMetadata = al.explicitMetadata)
            case ar: AttributeReference =>
              inline(ar, am) match {
                case same: AttributeReference if same.exprId == ar.exprId => ar
                case other => Alias(other, ar.name)(exprId = ar.exprId)
              }
            case other => other
          }
          // first spec (declared order: coarsest first) that answers
          rewritten <- ss.view
            .filter(s => baseMatches(s, path))
            .flatMap(s => tryRewrite(s, path, agg, groups2, aggs2, filters, lr))
            .headOption
        } yield rewritten).getOrElse(agg)
    }
  }

  private def tryRewrite(s: Spec, basePath: String, agg: Aggregate,
                         groups: Seq[Expression], aggs: Seq[NamedExpression],
                         filters: Seq[Expression], lr: LogicalRelation)
      : Option[LogicalPlan] = {
    val byName = lr.output.map(a => a.name -> a).toMap
    val tsAttr = byName.get(s.timeCol).filter(_.dataType == TimestampType)
      .getOrElse(return None)
    val dimAttrs: Map[ExprId, String] =
      s.dims.flatMap(d => byName.get(d).map(_.exprId -> d)).toMap

    // the rollup scan: a FRESH analyzed plan per firing (fresh exprIds
    // — safe under unions of rewritten aggregates). An Iceberg rollup
    // (icebergRollup=true, e.g. one maintained by
    // graft.streaming.StreamingRollup.maintainIceberg) resolves through
    // the cold reader — merge-on-read deletes applied — so the MV can
    // live on the chain with time travel and still serve the rewrite.
    val rollupPath = s.rollupPath.getOrElse(
      rollupPathFor(s.rollupRoot.getOrElse(return None), basePath))
    if (normPath(rollupPath) == basePath) return None
    val rollupLr: LogicalPlan = scala.util.Try {
      if (s.icebergRollup)
        graft.catalog.IcebergTableReader.read(SparkSession.active, rollupPath)
          .queryExecution.analyzed
      else SparkSession.active.read.parquet(rollupPath)
        .queryExecution.analyzed
    }.toOption.getOrElse(return None)
    val rByName = rollupLr.output.map(a => a.name -> a).toMap
    def rcol(n: String): Option[Attribute] = rByName.get(n)
    val grainAttr = rcol(s.grainCol).filter(_.dataType == TimestampType)
      .getOrElse(return None)
    val cntAttr = rcol(s.count).filter(_.dataType == LongType)
      .getOrElse(return None)

    def mapDim(a: AttributeReference): Option[Expression] =
      dimAttrs.get(a.exprId).flatMap(rcol).filter(_.dataType == a.dataType)

    /** Grain-aligned (UTC) timestamp literal. */
    val grainUs = grainMicros(s.grain).getOrElse(return None)
    def aligned(l: Literal): Boolean = l.value match {
      case v: Long => Math.floorMod(v, grainUs) == 0L
      case _ => false
    }
    def isTs(e: Expression): Boolean = e match {
      case a: AttributeReference => a.exprId == tsAttr.exprId
      case _ => false
    }

    // ---- filters: dims freely, ts only via aligned half-open bounds
    val newFilters: Seq[Expression] = filters.map { f =>
      if (f.deterministic && f.references.nonEmpty &&
          f.references.forall(r => dimAttrs.contains(r.exprId))) {
        f.transform {
          case a: AttributeReference => mapDim(a).getOrElse(return None)
        }
      } else f match {
        // constraint inference adds isnotnull(ts); a row's ts is null
        // iff its hour truncation is, so the guard transfers exactly
        case IsNotNull(t) if isTs(t) => IsNotNull(grainAttr)
        case GreaterThanOrEqual(t, l: Literal) if isTs(t) && aligned(l) =>
          GreaterThanOrEqual(grainAttr, l)
        case LessThanOrEqual(l: Literal, t) if isTs(t) && aligned(l) =>
          GreaterThanOrEqual(grainAttr, l)
        case LessThan(t, l: Literal) if isTs(t) && aligned(l) =>
          LessThan(grainAttr, l)
        case GreaterThan(l: Literal, t) if isTs(t) && aligned(l) =>
          LessThan(grainAttr, l)
        case _ => return None
      }
    }

    // ---- aggregate functions: count/sum/min/max over the registry
    def mapAggExpr(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      def measureOf(e: Expression): Option[(Measure, Boolean)] = e match {
        case a: AttributeReference =>
          s.measures.get(a.name).filter(_ => byName.get(a.name)
            .exists(_.exprId == a.exprId)).map(_ -> false)
        case Cast(a: AttributeReference, LongType, _, _) =>
          s.measures.get(a.name).filter(_ => byName.get(a.name)
            .exists(_.exprId == a.exprId)).map(_ -> true)
        case _ => None
      }
      ae.aggregateFunction match {
        case c: Count if c.children.forall(ch =>
            ch.foldable && ch.eval() != null) =>
          // count(*) == sum of per-grain counts; coalesce keeps the
          // empty-input global aggregate at 0, like Count
          Some(Coalesce(Seq(
            ae.copy(aggregateFunction = Sum(cntAttr)), Literal(0L))))
        case sm: Sum => measureOf(sm.child).flatMap { case (m, isLong) =>
          (if (isLong) m.sumLong else m.sum).flatMap(rcol).map { c =>
            ae.copy(aggregateFunction =
              sm.withNewChildren(Seq(c)).asInstanceOf[Sum])
          }.filter(_.dataType == ae.dataType)
        }
        case mn: Min => measureOf(mn.child).flatMap { case (m, isLong) =>
          if (isLong) None else m.min.flatMap(rcol).map { c =>
            ae.copy(aggregateFunction = Min(c))
          }.filter(_.dataType == ae.dataType)
        }
        case mx: Max => measureOf(mx.child).flatMap { case (m, isLong) =>
          if (isLong) None else m.max.flatMap(rcol).map { c =>
            ae.copy(aggregateFunction = Max(c))
          }.filter(_.dataType == ae.dataType)
        }
        case _ => None
      }
    }

    // ---- general expression mapping: aggs, dims, hour-invariant time
    def mapExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => mapAggExpr(ae)
      case t @ TruncTimestamp(f: Literal, ts, _) if isTs(ts) &&
          f.value != null &&
          truncUnits(s.grain)(f.value.toString.toLowerCase) =>
        Some(t.withNewChildren(Seq(f, grainAttr)))
      case h @ Hour(ts, _) if isTs(ts) && s.grain == "hour" =>
        Some(h.withNewChildren(Seq(grainAttr)))
      case c @ Cast(ts, DateType, _, _) if isTs(ts) =>
        Some(c.withNewChildren(Seq(grainAttr)))
      case a: AttributeReference => mapDim(a)
      case l if l.references.isEmpty && l.children.isEmpty => Some(l)
      case other if other.deterministic =>
        val kids = other.children.map(mapExpr)
        if (kids.forall(_.isDefined))
          Some(other.withNewChildren(kids.map(_.get)))
        else None
      case _ => None
    }

    val newGroups = groups.map(g => mapExpr(g).getOrElse(return None))
    val newAggs: Seq[NamedExpression] = aggs.map {
      case al: Alias =>
        Alias(mapExpr(al.child).getOrElse(return None), al.name)(
          exprId = al.exprId, qualifier = al.qualifier,
          explicitMetadata = al.explicitMetadata)
      case ar: AttributeReference =>
        Alias(mapExpr(ar).getOrElse(return None), ar.name)(exprId = ar.exprId)
      case _ => return None
    }

    // prune the rollup scan to what the rewritten query touches
    val needed = AttributeSet(
      (newGroups ++ newAggs ++ newFilters).flatMap(_.references))
    val pruned = Project(rollupLr.output.filter(needed.contains), rollupLr)
    val filtered =
      if (newFilters.isEmpty) pruned
      else Filter(newFilters.reduce(And), pruned)
    Some(Aggregate(newGroups, newAggs, filtered))
  }
}
