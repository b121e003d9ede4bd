package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DateType

import graft.jobs.Snapshots

/** HIDDEN PARTITIONING, the Iceberg read-side half: a table partitioned
  * by a GENERATED column (`graft.partitionBy = ev_day` +
  * `graft.generated.ev_day = date(ts)`) should partition-prune for a
  * query that only constrains the SOURCE column — `WHERE ts BETWEEN a
  * AND b` — without the user ever naming `ev_day`. This optimizer rule
  * derives the partition predicate: for every conjunct `src ⋈ literal`
  * over a DV-eligible shape it appends `gen ⋈ f(literal)` to the scan's
  * Filter, which FileSourceStrategy then routes into `partitionFilters`
  * — Catalyst partition pruning with zero stats or data reads.
  *
  * Soundness has two legs:
  *   1. the generated-column invariant `gen = f(src)` holds on EVERY
  *      row — enforced at write time by `withGenerated`'s contradiction
  *      refusal on all ingest paths — so narrowing by a consequence of
  *      the original predicate can never drop a matching row;
  *   2. `f` must be MONOTONE (non-decreasing), so `src >= A ⇒ f(src) >=
  *      f(A)` and `src <= B ⇒ f(src) <= f(B)`. Only a whitelist of
  *      floor-shaped generators derives: `date(src)` / `to_date(src)`,
  *      `year(src)`, `date_trunc(unit, src)`, `cast(src as date)`, and
  *      `floor(src / n)` / `src div n` for positive literal `n`.
  *      Equality derives for ANY deterministic generator (`src = A ⇒
  *      f(src) = f(A)` needs no monotonicity).
  *
  * `f(literal)` is evaluated once at plan time under the session (same
  * timezone the writer materialized under), memoized per (generator,
  * literal). The added conjunct is redundant for correctness — the
  * original predicate still runs in the scan — so any shape this rule
  * does not recognize simply keeps today's behavior. Idempotent for the
  * fixed-point batch: a conjunct already present is never re-added. */
object GeneratedPruningRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Install into `spark.experimental.extraOptimizations` once. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  private val generatedPrefix = "graft.generated."

  /** (genSql, srcName, literal, session timezone, result type) →
    * evaluated f(literal), memoized — the plan-time eval is a one-row
    * local job. The TIMEZONE is part of the key: date/to_date/year/
    * date_trunc over a timestamp are timezone-dependent, and a value
    * cached under one session's zone must never derive a partition
    * predicate for a session running under another (it would silently
    * prune files that match there). The generated column's data type
    * rides too — the eval casts to it. */
  private val evalCache =
    TrieMap.empty[(String, String, Expression, String, org.apache.spark.sql.types.DataType), Option[Literal]]

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, l: LogicalRelation) if indexOf(l).isDefined =>
      val idx = indexOf(l).get
      val spark = l.relation.asInstanceOf[HadoopFsRelation].sparkSession
      val props = Snapshots.tableProperties(spark, idx.root, idx.version)
      val partCols = graft.core.HivePartitions.columnsOf(props)
      val gens = partCols.flatMap(c =>
        props.get(generatedPrefix + c).map(g => c -> g))
      if (gens.isEmpty) f
      else {
        val conjuncts = splitConjunctivePredicates(cond)
        val derived = gens.flatMap { case (genCol, genSql) =>
          l.output.find(_.name == genCol).toSeq.flatMap { genAttr =>
            sourceOf(spark, genSql).toSeq.flatMap { case (srcName, monotone) =>
              conjuncts.flatMap(derive(spark, _, srcName, genSql, genAttr, monotone))
            }
          }
        }
        val fresh = derived.filterNot(d => conjuncts.exists(_.semanticEquals(d)))
        if (fresh.isEmpty) f
        else Filter((conjuncts ++ fresh).reduce(And), l)
      }
  }

  private def indexOf(l: LogicalRelation): Option[SnapshotFileIndex] =
    l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case i: SnapshotFileIndex => Some(i)
        case _ => None
      }
      case _ => None
    }

  /** The generator's single source column and whether the generator is
    * in the monotone whitelist (None = unsupported shape, no
    * derivation). */
  private def sourceOf(
      spark: SparkSession, genSql: String): Option[(String, Boolean)] = {
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(genSql)
      catch { case _: Exception => return None }
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _ => None
    }
    parsed match {
      case uf: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        val fn = uf.nameParts.last.toLowerCase(java.util.Locale.ROOT)
        (fn, uf.arguments) match {
          case ("date" | "to_date" | "year", Seq(a)) =>
            attrName(a).map(_ -> true)
          // Iceberg's other partition transforms: NOT monotone (they
          // wrap), so only the monotonicity-free equality/IN derivation
          // applies — `WHERE ts = T` still prunes to month(T)/day(T)/
          // hour(T) partitions
          case ("month" | "day" | "dayofmonth" | "hour", Seq(a)) =>
            attrName(a).map(_ -> false)
          case ("date_trunc", Seq(_: Literal, a)) =>
            attrName(a).map(_ -> true)
          case ("floor", Seq(d: Divide)) =>
            (attrName(d.left), d.right) match {
              case (Some(n), Literal(v, _)) if positive(v) => Some(n -> true)
              case _ => None
            }
          case _ => None
        }
      case c: Cast if c.dataType == DateType => attrName(c.child).map(_ -> true)
      case d: IntegralDivide =>
        (attrName(d.left), d.right) match {
          case (Some(n), Literal(v, _)) if positive(v) => Some(n -> true)
          case _ => None
        }
      case _ => None
    }
  }

  private def positive(v: Any): Boolean = v match {
    case n: Number => n.doubleValue() > 0
    case d: org.apache.spark.sql.types.Decimal => d.toDouble > 0
    case _ => false
  }

  /** One derived conjunct on the generated column, if this conjunct is
    * a recognized bound on the source column. */
  private def derive(
      spark: SparkSession, conjunct: Expression, srcName: String,
      genSql: String, genAttr: Attribute, monotone: Boolean): Option[Expression] = {
    def isSrc(e: Expression): Boolean = e match {
      case a: Attribute => a.name == srcName
      case _ => false
    }
    def f(lit: Expression): Option[Literal] = {
      if (evalCache.size > 512) evalCache.clear() // bound the memo
      val tz = spark.sessionState.conf.sessionLocalTimeZone
      evalCache.getOrElseUpdate(
        (genSql, srcName, lit.canonicalized, tz, genAttr.dataType),
        evalGenerated(spark, genSql, srcName, lit, genAttr))
    }
    conjunct match {
      case EqualTo(a, lit: Literal) if isSrc(a) => f(lit).map(EqualTo(genAttr, _))
      case EqualTo(lit: Literal, a) if isSrc(a) => f(lit).map(EqualTo(genAttr, _))
      case In(a, list) if isSrc(a) && list.nonEmpty && list.size <= 64 &&
          list.forall(_.isInstanceOf[Literal]) =>
        // src IN (…) ⇒ gen IN (f(…)) — equality-grade, monotonicity-free
        val mapped = list.map(l => f(l.asInstanceOf[Literal]))
        if (mapped.forall(_.isDefined))
          Some(In(genAttr, mapped.flatten.distinct))
        else None
      case _ if !monotone => None
      case GreaterThanOrEqual(a, lit: Literal) if isSrc(a) =>
        f(lit).map(GreaterThanOrEqual(genAttr, _))
      case GreaterThan(a, lit: Literal) if isSrc(a) =>
        f(lit).map(GreaterThanOrEqual(genAttr, _)) // f floors: gen >= f(A)
      case LessThanOrEqual(a, lit: Literal) if isSrc(a) =>
        f(lit).map(LessThanOrEqual(genAttr, _))
      case LessThan(a, lit: Literal) if isSrc(a) =>
        f(lit).map(LessThanOrEqual(genAttr, _))
      case GreaterThanOrEqual(lit: Literal, a) if isSrc(a) => // A >= src ⇔ src <= A
        f(lit).map(LessThanOrEqual(genAttr, _))
      case GreaterThan(lit: Literal, a) if isSrc(a) =>
        f(lit).map(LessThanOrEqual(genAttr, _))
      case LessThanOrEqual(lit: Literal, a) if isSrc(a) =>
        f(lit).map(GreaterThanOrEqual(genAttr, _))
      case LessThan(lit: Literal, a) if isSrc(a) =>
        f(lit).map(GreaterThanOrEqual(genAttr, _))
      case _ => None
    }
  }

  /** Evaluate the generator over one literal — a one-row local job,
    * session-timezone-consistent with the write-time materialization.
    * Any failure = no derivation (sound: the conjunct is an optional
    * narrowing). */
  private def evalGenerated(
      spark: SparkSession, genSql: String, srcName: String,
      lit: Expression, genAttr: Attribute): Option[Literal] =
    try {
      val substituted = spark.sessionState.sqlParser.parseExpression(genSql)
        .transform {
          case a: UnresolvedAttribute if a.nameParts.last.equalsIgnoreCase(srcName) => lit
        }
      val v = spark.range(1)
        .select(org.apache.spark.sql.functions.expr(substituted.sql)
          .cast(genAttr.dataType))
        .head().get(0)
      if (v == null) None else Some(Literal.create(v, genAttr.dataType))
    } catch { case _: Exception => None }
}
