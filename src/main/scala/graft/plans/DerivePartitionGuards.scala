package graft.plans

import java.time.{Instant, LocalDate, ZoneId}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, TimestampType}

/** Custom optimizer rule: derive `(year, month, day)` partition guards
  * from `ts` bounds on hive-partitioned lakes.
  *
  * The lakes this engine writes (graft.etl.PartitionedLake) partition by
  * `year/month/day` DERIVED from the event timestamp `ts`. A predicate on
  * `ts` alone cannot prune those partition directories — Spark has no way
  * to know the columns are functionally related — so every incremental /
  * IVM consumer had to AND a hand-built day-granular guard next to its ts
  * bound (PartitionedLake.sinceDay/upToDay). This rule is the automatic
  * version: whenever a Filter sits on a file relation whose partition
  * schema is exactly the convention's `(year, month, day)` ints AND the
  * filter constrains a TimestampType column named `ts` with a literal
  * bound, the equivalent conservative day-granular tuple comparison is
  * conjoined. Conservative = the boundary DAY is always kept (both bound
  * directions), so each added guard is implied by its ts predicate and
  * can never change results — only which directories are listed.
  *
  * The day arithmetic uses the session time zone (the same zone the
  * writer's `year(ts)`/`month(ts)`/`dayofmonth(ts)` derivations used), so
  * guard and partition values agree by construction.
  *
  * Injected via [[graft.GraftExtensions]] into the operator-optimization
  * batch, which runs to FIXPOINT: idempotence comes from checking the
  * canonicalized guard against the existing conjuncts (a guard already
  * present — hand-written or from a previous pass — is never re-added).
  *
  * The `ts`-name convention matters: a lake may carry OTHER timestamp
  * columns unrelated to its partition derivation (the lineitem lake
  * partitions on l_shipdate), and guarding those would silently drop
  * rows. Only the column the convention derives from is ever guarded,
  * and only on relations partitioned by EXACTLY (year, month, day).
  * The one thing no plan-level check can verify is a lake that breaks
  * the convention itself — (year, month, day) derived from some other
  * timestamp while a column named `ts` also exists; plain parquet has
  * no metadata slot for "generated from" (table formats do, which is
  * how Delta/Iceberg make this rewrite safe unconditionally). For such
  * lakes, `SET spark.graft.partitionGuards=false` ([[EnabledKey]])
  * disables the rule.
  */
object DerivePartitionGuards extends Rule[LogicalPlan] with PredicateHelper {

  private val TsCol = "ts"

  /** Kill switch: `SET spark.graft.partitionGuards=false` disables the
    * rule for sessions whose lakes do not follow the convention (partition
    * columns derived from the column named `ts`) — the escape hatch for
    * the one thing the rule cannot verify from the plan alone. */
  val EnabledKey = "spark.graft.partitionGuards"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transform {
    case f @ Filter(cond, rel: LogicalRelation) =>
      partitionYmd(rel) match {
        case Some((y, m, d)) =>
          val conjuncts = splitConjunctivePredicates(cond)
          val existing = conjuncts.map(_.canonicalized).toSet
          val guards = conjuncts.flatMap(guardFor(_, y, m, d))
            .filterNot(g => existing.contains(g.canonicalized))
          if (guards.isEmpty) f
          else Filter((conjuncts ++ guards).reduce(And), rel)
        case None => f
      }
  }

  /** The `(year, month, day)` integer partition attributes of a
    * hive-partitioned file relation following the lake convention. The
    * partition schema must be EXACTLY these three columns — a relation
    * partitioned on anything more or different is outside the convention
    * and is left alone (the rule cannot verify from the plan that the
    * partition values derive from `ts`; the exact-schema check plus the
    * column-name convention is the contract, [[EnabledKey]] the escape
    * hatch). */
  private def partitionYmd(rel: LogicalRelation)
      : Option[(Attribute, Attribute, Attribute)] =
    rel.relation match {
      case fs: HadoopFsRelation
          if fs.partitionSchema.fieldNames.sorted.toSeq == Seq("day", "month", "year") =>
        def attr(n: String): Option[Attribute] =
          rel.output.find(a => a.name == n && a.dataType == IntegerType)
        for (y <- attr("year"); m <- attr("month"); d <- attr("day"))
          yield (y, m, d)
      case _ => None
    }

  private def isTs(a: Expression): Boolean = a match {
    case ar: AttributeReference => ar.name == TsCol && ar.dataType == TimestampType
    case _ => false
  }

  /** Conservative day-granular twin of one ts-vs-literal conjunct, if it
    * has one. Lower bounds (>=, >) map to "since that day", upper bounds
    * (<=, <) to "up to that day" — both keep the boundary day, so the
    * guard is implied by the ts predicate it rides with. */
  private def guardFor(p: Expression, y: Attribute, m: Attribute,
                       d: Attribute): Seq[Expression] = p match {
    case GreaterThanOrEqual(a, Literal(v: Long, TimestampType)) if isTs(a) =>
      Seq(sinceDay(day(v), y, m, d))
    case GreaterThan(a, Literal(v: Long, TimestampType)) if isTs(a) =>
      Seq(sinceDay(day(v), y, m, d))
    case LessThanOrEqual(a, Literal(v: Long, TimestampType)) if isTs(a) =>
      Seq(upToDay(day(v), y, m, d))
    case LessThan(a, Literal(v: Long, TimestampType)) if isTs(a) =>
      Seq(upToDay(day(v), y, m, d))
    case EqualTo(a, Literal(v: Long, TimestampType)) if isTs(a) =>
      Seq(sinceDay(day(v), y, m, d), upToDay(day(v), y, m, d))
    // literal-first spellings of the same bounds
    case LessThanOrEqual(Literal(v: Long, TimestampType), a) if isTs(a) =>
      Seq(sinceDay(day(v), y, m, d))
    case LessThan(Literal(v: Long, TimestampType), a) if isTs(a) =>
      Seq(sinceDay(day(v), y, m, d))
    case GreaterThanOrEqual(Literal(v: Long, TimestampType), a) if isTs(a) =>
      Seq(upToDay(day(v), y, m, d))
    case GreaterThan(Literal(v: Long, TimestampType), a) if isTs(a) =>
      Seq(upToDay(day(v), y, m, d))
    case EqualTo(Literal(v: Long, TimestampType), a) if isTs(a) =>
      Seq(sinceDay(day(v), y, m, d), upToDay(day(v), y, m, d))
    case _ => Seq.empty
  }

  private def day(micros: Long): LocalDate =
    day(micros, ZoneId.of(conf.sessionLocalTimeZone))

  /** Micros-since-epoch → local date in the given zone (the rule passes
    * the session time zone — the zone the writer's year/month/day
    * derivations used). floorDiv/floorMod, not `/`/`%`: truncation toward
    * zero would round PRE-epoch timestamps to the wrong day, breaking the
    * monotonicity the conservative-guard argument rests on
    * (property-tested in PropertySpec). */
  private[graft] def day(micros: Long, zone: ZoneId): LocalDate =
    Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
      .atZone(zone)
      .toLocalDate

  private def lit(i: Int): Literal = Literal(i, IntegerType)

  /** (year, month, day) >= date, as a tuple comparison. */
  private def sinceDay(dt: LocalDate, y: Attribute, m: Attribute,
                       d: Attribute): Expression =
    Or(GreaterThan(y, lit(dt.getYear)),
      And(EqualTo(y, lit(dt.getYear)),
        Or(GreaterThan(m, lit(dt.getMonthValue)),
          And(EqualTo(m, lit(dt.getMonthValue)),
            GreaterThanOrEqual(d, lit(dt.getDayOfMonth))))))

  /** (year, month, day) <= date, as a tuple comparison. */
  private def upToDay(dt: LocalDate, y: Attribute, m: Attribute,
                      d: Attribute): Expression =
    Or(LessThan(y, lit(dt.getYear)),
      And(EqualTo(y, lit(dt.getYear)),
        Or(LessThan(m, lit(dt.getMonthValue)),
          And(EqualTo(m, lit(dt.getMonthValue)),
            LessThanOrEqual(d, lit(dt.getDayOfMonth))))))
}
