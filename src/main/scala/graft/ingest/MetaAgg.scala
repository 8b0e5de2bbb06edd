package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  ExprId, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  OneRowRelation, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types._

/** METADATA-ONLY aggregates: a genuine optimizer `Rule[LogicalPlan]`
  * that answers a global (ungrouped, unfiltered) `count(*)`,
  * `count(col)`, `min(col)`, `max(col)` over a manifest store from the
  * MANIFEST alone — zero data files opened. At 100 TB this turns "how
  * many rows / what's the watermark" — the two questions every
  * operational job asks first — from a full scan (or at best a
  * footer-metadata pass over a million files) into O(#files) driver
  * arithmetic on facts the commit already recorded:
  *
  *  - `rows` (the manifest's tenth field) is the file's exact row
  *    count, recomputed by every rewrite path, so `count(*)` is the
  *    sum over the snapshot;
  *  - `nullStats` (eighth field) holds (nullCount, rowCount), so
  *    `count(col)` — non-null count — is `Σ (rows − nulls)`;
  *  - the integer stat rectangle (range column + colStats) holds exact
  *    per-file min/max of NON-NULL values — precisely SQL min/max
  *    semantics — so the extremes fold across files. A column that is
  *    all-null in some file simply has no stats there and the rule
  *    declines (conservative; min over all-null needs a NULL answer
  *    the stats cannot prove).
  *
  * Soundness rules, all conservative-by-construction:
  *
  *  - only row-count-preserving operators may sit between the
  *    Aggregate and the manifest leaves: Project (any projection — it
  *    never changes cardinality) and Union (rows add). A Filter, Join,
  *    Limit, Sample, Generate — anything else — kills the rewrite.
  *  - column identity is tracked by ExprId through
  *    projections/unions, never by name, so schema-evolution
  *    projections (coalesce/cast of renamed physicals) simply drop
  *    that column's metadata rather than mis-binding it;
  *  - every file in the snapshot must carry the needed fact (rows for
  *    count(*), the column's nullStats for count(col), the column's
  *    integer stats for min/max); one statless file disables that
  *    aggregate — a pre-rows-field manifest keeps scanning, exactly
  *    as before;
  *  - DISTINCT and FILTER (`count(DISTINCT x)`, `agg(...) FILTER
  *    (WHERE ...)`) never match; outputs computed OVER routed
  *    aggregates (`count(*) + 1`) fold like matview-routed computed
  *    outputs: rewrite the aggregate subtree to its literal, then
  *    require the remainder deterministic, aggregate-free and
  *    reference-free;
  *  - the rewritten output must keep each alias's exact ExprId and
  *    dataType (count → long; min/max literals are built at the
  *    attribute's own integral type, date days included).
  *
  * Installed per session via `spark.experimental.extraOptimizations`
  * the first time a [[ManifestStore]] is read (idempotent), the same
  * public hook [[MatViewRouter]] uses. */
object MetaAgg {

  /** Idempotently add the rule to this session's optimizer. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[MetaAggRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new MetaAggRule
  }

  /** Per-column provable facts for one row-preserving subtree:
    * non-null count, integral bounds, exact decimal VALUE bounds
    * (declined unless every file records the attribute's own scale),
    * and double bounds (absent when any file held a NaN — parquet
    * drops the stats — so a NaN-would-win max correctly declines). */
  private[ingest] case class ColMeta(nonNulls: Option[Long],
                                     bounds: Option[(Long, Long)],
                                     decBounds: Option[(BigDecimal, BigDecimal)]
                                       = None,
                                     dblBounds: Option[(Double, Double)] =
                                       None)
  private[ingest] case class NodeMeta(rows: Long, cols: Map[ExprId, ColMeta],
                                      parts: Option[PartMeta] = None)

  /** GROUPED facts for a PARTITIONED store: the partition columns (by
    * ExprId, in [[ManifestFileIndex.partitionSchema]] order) and the
    * exact row count per partition tuple — `GROUP BY partition_cols →
    * count(*)` is pure manifest arithmetic. */
  private[ingest] case class PartMeta(attrs: Seq[ExprId],
                                      groups: Map[Seq[String], Long])

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType => true
    case _ => false
  }

  /** The subtree's exact row count and per-column facts, or None when
    * anything between the leaves and here could change cardinality or
    * the manifest lacks the facts. */
  private[ingest] def meta(p: LogicalPlan): Option[NodeMeta] = p match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case idx: ManifestFileIndex
          if idx.files.nonEmpty && idx.files.forall(_.rows.isDefined) =>
          val rows = idx.files.map(_.rows.get).sum
          val partCols = fs.partitionSchema.map(_.name)
          val cols = lr.output.map { a =>
            val nn =
              if (idx.files.forall(_.nullStats.contains(a.name)))
                Some(idx.files.map { f =>
                  val (nulls, r) = f.nullStats(a.name); r - nulls
                }.sum)
              else None
            val bounds =
              if (integral(a.dataType) &&
                  idx.files.forall(_.stats.contains(a.name)))
                Some((idx.files.map(_.stats(a.name)._1).min,
                  idx.files.map(_.stats(a.name)._2).max))
              else None
            val dec = a.dataType match {
              case dt: DecimalType
                if idx.files.forall(f => f.decStats.get(a.name)
                  .exists(_._3 == dt.scale)) =>
                val vs = idx.files.map { f =>
                  val (lo, hi, s) = f.decStats(a.name)
                  (BigDecimal(BigInt(lo), s), BigDecimal(BigInt(hi), s))
                }
                Some((vs.map(_._1).min, vs.map(_._2).max))
              case _ => None
            }
            val dbl = a.dataType match {
              case DoubleType | FloatType
                if idx.files.forall(_.dblStats.contains(a.name)) =>
                val vs = idx.files.map { f =>
                  val (lo, hi) = f.dblStats(a.name)
                  (java.lang.Double.longBitsToDouble(lo),
                    java.lang.Double.longBitsToDouble(hi))
                }
                Some((vs.map(_._1).min, vs.map(_._2).max))
              case _ => None
            }
            a.exprId -> ColMeta(nn, bounds, dec, dbl)
          }.toMap
          val parts =
            if (partCols.isEmpty) None
            else {
              // partition attrs are the relation outputs carrying the
              // partition schema's names (string-typed in the index
              // path); every file's partValues align positionally
              val attrs = partCols.map(n =>
                lr.output.find(_.name.equalsIgnoreCase(n)))
              if (attrs.exists(_.isEmpty) ||
                  idx.files.exists(_.partValues.size != partCols.size)) None
              else Some(PartMeta(attrs.flatten.map(_.exprId),
                idx.files.groupBy(_.partValues)
                  .view.mapValues(_.map(_.rows.get).sum).toMap))
            }
          Some(NodeMeta(rows, cols, parts))
        case _ => None
      }
      case _ => None
    }
    case Project(pl, ch) => meta(ch).map { m =>
      val remap: Map[ExprId, ExprId] = pl.collect {
        case a: AttributeReference => a.exprId -> a.exprId
        case al @ Alias(a: AttributeReference, _) => a.exprId -> al.exprId
      }.toMap
      val cols = pl.flatMap {
        case a: AttributeReference =>
          m.cols.get(a.exprId).map(a.exprId -> _)
        case al @ Alias(a: AttributeReference, _) =>
          m.cols.get(a.exprId).map(al.exprId -> _)
        case _ => None
      }.toMap
      // grouped facts survive a projection on the SURVIVING partition
      // columns: groups merge (row counts add) over any pruned-away
      // dimension — exactly what a GROUP BY on a partition subset
      // needs after column pruning drops the rest
      val parts = m.parts.flatMap { pm =>
        val kept = pm.attrs.zipWithIndex
          .filter { case (id, _) => remap.contains(id) }
        if (kept.isEmpty) None
        else Some(PartMeta(kept.map(k => remap(k._1)),
          pm.groups.toSeq
            .groupBy { case (tuple, _) => kept.map(k => tuple(k._2)) }
            .view.mapValues(_.map(_._2).sum).toMap))
      }
      NodeMeta(m.rows, cols, parts)
    }
    case u: Union =>
      val ms = u.children.map(meta)
      if (ms.exists(_.isEmpty)) None
      else {
        val metas = ms.map(_.get)
        val cols = u.output.zipWithIndex.flatMap { case (a, i) =>
          val per = u.children.zip(metas)
            .map { case (c, m) => m.cols.get(c.output(i).exprId) }
          if (per.exists(_.isEmpty)) None
          else {
            val cs = per.flatten
            val nn =
              if (cs.forall(_.nonNulls.isDefined))
                Some(cs.flatMap(_.nonNulls).sum)
              else None
            val bd =
              if (cs.forall(_.bounds.isDefined)) {
                val bs = cs.flatMap(_.bounds)
                Some((bs.map(_._1).min, bs.map(_._2).max))
              } else None
            val dec =
              if (cs.forall(_.decBounds.isDefined)) {
                val bs = cs.flatMap(_.decBounds)
                Some((bs.map(_._1).min, bs.map(_._2).max))
              } else None
            val dbl =
              if (cs.forall(_.dblBounds.isDefined)) {
                val bs = cs.flatMap(_.dblBounds)
                Some((bs.map(_._1).min, bs.map(_._2).max))
              } else None
            Some(a.exprId -> ColMeta(nn, bd, dec, dbl))
          }
        }.toMap
        // grouped facts union when every child carries them on the SAME
        // output positions, in the same column order; group rows add
        val parts: Option[PartMeta] = {
          val positions = metas.head.parts.map(_.attrs.map { id =>
            u.children.head.output.indexWhere(_.exprId == id)
          })
          positions.filter(_.forall(_ >= 0)).flatMap { pos =>
            val aligned = u.children.zip(metas).map { case (c, m) =>
              m.parts.filter(_.attrs ==
                pos.map(i => c.output(i).exprId))
            }
            if (aligned.exists(_.isEmpty)) None
            else {
              val merged = aligned.flatten.flatMap(_.groups.toSeq)
                .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
              Some(PartMeta(pos.map(i => u.output(i).exprId), merged))
            }
          }
        }
        Some(NodeMeta(metas.map(_.rows).sum, cols, parts))
      }
    case _ => None
  }

  private object NoRoute extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  private def boundLit(a: AttributeReference, v: Long): Literal =
    a.dataType match {
      case ByteType => Literal(v.toByte, ByteType)
      case ShortType => Literal(v.toShort, ShortType)
      case IntegerType => Literal(v.toInt, IntegerType)
      case DateType => Literal(v.toInt, DateType)
      case _ => Literal(v, LongType)
    }

  /** The provable min/max literal for one attribute at ITS OWN type,
    * or None (→ scan). A ±0.0 double/float extreme declines: parquet
    * keeps one sign's bits and Spark's scan-side min may surface the
    * other — value-equal, but not bit-identical for a hash compare. */
  private def extremeLit(a: AttributeReference, cm: ColMeta,
                         isMin: Boolean): Option[Literal] =
    a.dataType match {
      case dt if integral(dt) =>
        cm.bounds.map(b => boundLit(a, if (isMin) b._1 else b._2))
      case dt: DecimalType => cm.decBounds.map { b =>
        Literal(Decimal(if (isMin) b._1 else b._2, dt.precision, dt.scale),
          dt)
      }
      case DoubleType => cm.dblBounds.flatMap { b =>
        val v = if (isMin) b._1 else b._2
        if (v == 0.0) None else Some(Literal(v, DoubleType))
      }
      case FloatType => cm.dblBounds.flatMap { b =>
        val v = if (isMin) b._1 else b._2
        if (v == 0.0) None else Some(Literal(v.toFloat, FloatType))
      }
      case _ => None
    }

  final class MetaAggRule extends Rule[LogicalPlan] {

    /** Rewrite one output: aggregate subtrees fold to per-scope
      * literals via `lit`; the remainder must end up deterministic,
      * aggregate-free, and reference-free (group attrs are substituted
      * by `lit` too on the grouped path). */
    private def fold(al: Alias,
                     lit: PartialFunction[Expression, Expression]): Alias = {
      val rewritten = al.child.transformDown(lit.orElse {
        case _: AggregateExpression => throw NoRoute
      })
      if (!rewritten.deterministic || rewritten.references.nonEmpty ||
          rewritten.exists(_.isInstanceOf[AggregateExpression]))
        throw NoRoute
      if (rewritten.dataType != al.dataType) throw NoRoute
      Alias(rewritten, al.name)(exprId = al.exprId, qualifier = al.qualifier)
    }

    private def routeGlobal(agg: Aggregate, m: NodeMeta): LogicalPlan = try {
      val aliases = agg.aggregateExpressions.map {
        case al: Alias => fold(al, {
          case AggregateExpression(fn, _, false, None, _) => fn match {
            case Count(Seq(l: Literal)) if l.value != null =>
              Literal(m.rows, LongType)
            case Count(Seq(a: AttributeReference)) =>
              m.cols.get(a.exprId).flatMap(_.nonNulls)
                .map(Literal(_, LongType)).getOrElse(throw NoRoute)
            case Min(a: AttributeReference) =>
              m.cols.get(a.exprId)
                .flatMap(extremeLit(a, _, isMin = true))
                .getOrElse(throw NoRoute)
            case Max(a: AttributeReference) =>
              m.cols.get(a.exprId)
                .flatMap(extremeLit(a, _, isMin = false))
                .getOrElse(throw NoRoute)
            case _ => throw NoRoute
          }
        })
        case _ => throw NoRoute
      }
      Project(aliases, OneRowRelation())
    } catch { case NoRoute => agg }

    /** `GROUP BY <subset of partition columns> → count(*)` answered
      * from the manifest's per-partition row sums: one LocalRelation
      * row per surviving group, every output evaluated from per-group
      * literals (group values are the partition strings; counts are
      * exact). Data-column aggregates decline — per-group column stats
      * are not recorded. */
    private def routeGrouped(agg: Aggregate, pm: PartMeta): LogicalPlan =
      try {
        val geAttrs = agg.groupingExpressions.map {
          case a: AttributeReference if pm.attrs.contains(a.exprId) => a
          case _ => throw NoRoute
        }
        if (geAttrs.map(_.exprId).distinct.size != geAttrs.size)
          throw NoRoute
        val positions = geAttrs.map(a => pm.attrs.indexOf(a.exprId))
        val grouped: Map[Seq[String], Long] = pm.groups.toSeq
          .groupBy { case (tuple, _) => positions.map(tuple) }
          .view.mapValues(_.map(_._2).sum).toMap
        val groupIds = geAttrs.map(_.exprId).toSet
        val data = grouped.toSeq.sortBy(_._1.mkString(" "))
          .map { case (values, rows) =>
            val byId = geAttrs.map(_.exprId).zip(values).toMap
            val aliases = agg.aggregateExpressions.map {
              case al: Alias => fold(al, {
                case a: AttributeReference if groupIds.contains(a.exprId) =>
                  if (a.dataType != StringType) throw NoRoute
                  Literal(org.apache.spark.unsafe.types.UTF8String
                    .fromString(byId(a.exprId)), StringType)
                case AggregateExpression(fn, _, false, None, _) => fn match {
                  case Count(Seq(l: Literal)) if l.value != null =>
                    Literal(rows, LongType)
                  // count of a partition column: its values come from
                  // directory names and are never null in the index path
                  case Count(Seq(a: AttributeReference))
                    if groupIds.contains(a.exprId) ||
                      pm.attrs.contains(a.exprId) =>
                    Literal(rows, LongType)
                  case _ => throw NoRoute
                }
              })
              // a bare group-attribute output (no alias) is the common
              // groupBy shape: substitute its literal under its own id
              case a: AttributeReference if groupIds.contains(a.exprId) =>
                if (a.dataType != StringType) throw NoRoute
                Alias(Literal(org.apache.spark.unsafe.types.UTF8String
                  .fromString(byId(a.exprId)), StringType), a.name)(
                  exprId = a.exprId, qualifier = a.qualifier)
              case _ => throw NoRoute
            }
            org.apache.spark.sql.catalyst.InternalRow
              .fromSeq(aliases.map(_.child.eval(null)))
          }
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          agg.aggregateExpressions.map(_.toAttribute), data)
      } catch { case NoRoute => agg }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(ge, _, child, _) =>
        meta(child) match {
          case None => agg
          case Some(m) if ge.isEmpty => routeGlobal(agg, m)
          case Some(m) => m.parts match {
            case Some(pm) => routeGrouped(agg, pm)
            case None => agg
          }
        }
    }
  }
}
