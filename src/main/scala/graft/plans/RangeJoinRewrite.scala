package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule (extension ladder step (c), SURVEY.md §3): rewrite
  * INTERVAL-OVERLAP joins into the bucketed equi-join Spark cannot
  * derive itself — the automated form of the hand-written
  * [[graft.operators.RangeJoin.intervalOverlap]] plan (and of the
  * range-join optimization commercial Spark runtimes ship as a
  * licensed feature).
  *
  * Pattern: an INNER join whose condition contains the overlap pair
  *
  * {{{ a.lo <= b.hi  AND  b.lo <= a.hi }}}
  *
  * over integral bounds (a.* from one side, b.* from the other). A
  * plain planner either falls back to BroadcastNestedLoopJoin (no
  * equi-conjunct at all) or hash-joins on the remaining equi keys and
  * evaluates the overlap as a per-key-QUADRATIC residual — both
  * collapse at scale.
  *
  * Rewrite: explode each side to the fixed-width grid cells its
  * interval touches (`lo div W … max(lo,hi) div W` — ≤ len/W+1 cells),
  * join on cell equality (PLUS every original conjunct, so the result
  * is a strict filter of the original semantics), and keep each
  * surviving pair exactly once at its CANONICAL cell — the cell of
  * `greatest(a.lo, b.lo)`, which both sides provably generate: it is
  * ≥ each lo, and ≤ each `max(lo, hi)` because the overlap predicates
  * bound it by both his. No distinct pass, no duplicates, bit-equal
  * rows.
  *
  * Truncated `div` (not floor) is used for the cells; correctness only
  * needs cell(x) monotone and shared by both sides, which truncation
  * satisfies for any sign. Bin width comes from
  * `spark.graft.rangeJoinRewrite.binSize` (rows explode by
  * ~len/W — the user picks W near the typical interval length); the
  * rule is OFF while the conf is unset. Guards: inner joins only,
  * deterministic integral bounds, not already rewritten (cell columns
  * are marked by name — the rule runs inside a fixed-point batch).
  *
  * Blast radius: while the conf is set the rule fires on EVERY inner
  * join whose condition contains a crossing ≤-pair of integral
  * columns, so an unrelated join (or one long-tail interval) could
  * otherwise explode into span/W cells per row with no bound. Two
  * containments: (1) the conf is meant to be scoped — set it around
  * the intended query and unset it after, as
  * [[graft.operators.RangeJoin.intervalOverlapRewrite]] does; (2) a
  * hard per-row cap `spark.graft.rangeJoinRewrite.maxCellsPerRow`
  * (default 4096): any row whose interval would generate more cells
  * fails FAST with a clear error naming both confs — an explicit stop,
  * never an OOM-by-Generate, and never a silently wrong result. */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val BIN_KEY = "spark.graft.rangeJoinRewrite.binSize"
  val MAX_CELLS_KEY = "spark.graft.rangeJoinRewrite.maxCellsPerRow"
  private val DEFAULT_MAX_CELLS = 4096L
  private val CELL_PREFIX = "__graft_cell"

  private def binSize: Option[Long] =
    SQLConf.get.getConfString(BIN_KEY, "").trim match {
      case "" => None
      case s  => scala.util.Try(s.toLong).toOption.filter(_ > 0)
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** The four overlap bounds, or None when this join is not the
    * pattern: (aLo, aHi) reference only `left`, (bLo, bHi) only
    * `right`, all integral and deterministic. */
  private def overlapBounds(cs: Seq[Expression], left: LogicalPlan,
                            right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression)] = {
    def leftOnly(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def rightOnly(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet)
    val les = cs.collect {
      case LessThanOrEqual(x, y) => (x, y)
      case GreaterThanOrEqual(y, x) => (x, y) // y >= x  ≡  x <= y
    }.filter { case (x, y) =>
      integral(x) && integral(y) && x.deterministic && y.deterministic
    }
    val candidates = for {
      (aLo, bHi) <- les if leftOnly(aLo) && rightOnly(bHi)
      (bLo, aHi) <- les if rightOnly(bLo) && leftOnly(aHi)
    } yield (aLo, aHi, bLo, bHi)
    candidates.headOption
  }

  private def maxCellsPerRow: Long =
    SQLConf.get.getConfString(MAX_CELLS_KEY, "").trim match {
      case "" => DEFAULT_MAX_CELLS
      case s  => scala.util.Try(s.toLong).toOption.filter(_ > 0)
        .getOrElse(DEFAULT_MAX_CELLS)
    }

  private def cellGenerate(side: LogicalPlan, lo: Expression,
                           hi: Expression, w: Long,
                           attrName: String): (LogicalPlan, Attribute) = {
    val loCell = new IntegralDivide(asLong(lo), Literal(w))
    val hiCell = new IntegralDivide(
      asLong(Greatest(Seq(asLong(lo), asLong(hi)))), Literal(w))
    // Sequence is TimeZoneAwareExpression: resolved only WITH a zone,
    // even for integral bounds
    val cells = new Sequence(loCell, hiCell, Literal(1L))
      .withTimeZone(SQLConf.get.sessionLocalTimeZone)
    // per-row blast-radius cap: fail fast with a clear error instead of
    // letting one long interval (or a mis-targeted join) explode the
    // Generate — span information only exists at runtime, so the guard
    // must be a row-level expression, not a planner check
    val cap = maxCellsPerRow
    val nCells = Add(Subtract(hiCell, loCell), Literal(1L))
    val guarded = If(
      GreaterThan(nCells, Literal(cap)),
      Cast(new RaiseError(Concat(Seq(
        Literal("rangeJoinRewrite: a row's interval spans "),
        Cast(nCells, org.apache.spark.sql.types.StringType),
        Literal(s" grid cells > $MAX_CELLS_KEY=$cap; raise $BIN_KEY toward " +
          "the typical interval length, raise the cap, or unset " +
          s"$BIN_KEY so this join keeps its original plan")))),
        cells.dataType),
      cells)
    val cellAttr = AttributeReference(attrName, LongType, nullable = false)()
    val gen = Generate(Explode(guarded), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(cellAttr), side)
    (gen, cellAttr)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = binSize match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint)
            if j.resolved &&
              !left.output.exists(_.name.startsWith(CELL_PREFIX)) &&
              !right.output.exists(_.name.startsWith(CELL_PREFIX)) =>
          val cs = conjuncts(cond)
          overlapBounds(cs, left, right) match {
            case None => j
            case Some((aLo, aHi, bLo, bHi)) =>
              val (genL, cellL) =
                cellGenerate(left, aLo, aHi, w, s"${CELL_PREFIX}_l")
              val (genR, cellR) =
                cellGenerate(right, bLo, bHi, w, s"${CELL_PREFIX}_r")
              val canonical = EqualTo(cellL,
                new IntegralDivide(
                  Greatest(Seq(asLong(aLo), asLong(bLo))), Literal(w)))
              val newCond = (Seq(EqualTo(cellL, cellR), canonical) ++ cs)
                .reduce(And)
              Project(j.output,
                Join(genL, genR, Inner, Some(newCond), hint))
          }
      }
  }
}
