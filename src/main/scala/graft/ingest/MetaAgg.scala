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

  /** Per-column provable facts for one row-preserving subtree. */
  private[ingest] case class ColMeta(nonNulls: Option[Long],
                                     bounds: Option[(Long, Long)])
  private[ingest] case class NodeMeta(rows: Long, cols: Map[ExprId, ColMeta])

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
            a.exprId -> ColMeta(nn, bounds)
          }.toMap
          Some(NodeMeta(rows, cols))
        case _ => None
      }
      case _ => None
    }
    case Project(pl, ch) => meta(ch).map { m =>
      NodeMeta(m.rows, pl.flatMap {
        case a: AttributeReference =>
          m.cols.get(a.exprId).map(a.exprId -> _)
        case al @ Alias(a: AttributeReference, _) =>
          m.cols.get(a.exprId).map(al.exprId -> _)
        case _ => None
      }.toMap)
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
            Some(a.exprId -> ColMeta(nn, bd))
          }
        }.toMap
        Some(NodeMeta(metas.map(_.rows).sum, cols))
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

  final class MetaAggRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(ge, aes, child, _) if ge.isEmpty =>
        meta(child) match {
          case None => agg
          case Some(m) => try {
            val aliases = aes.map {
              case al @ Alias(e, name) =>
                val rewritten = e.transformDown {
                  case AggregateExpression(fn, _, false, None, _) => fn match {
                    case Count(Seq(l: Literal)) if l.value != null =>
                      Literal(m.rows, LongType)
                    case Count(Seq(a: AttributeReference)) =>
                      m.cols.get(a.exprId).flatMap(_.nonNulls)
                        .map(Literal(_, LongType)).getOrElse(throw NoRoute)
                    case Min(a: AttributeReference) =>
                      m.cols.get(a.exprId).flatMap(_.bounds)
                        .map(b => boundLit(a, b._1)).getOrElse(throw NoRoute)
                    case Max(a: AttributeReference) =>
                      m.cols.get(a.exprId).flatMap(_.bounds)
                        .map(b => boundLit(a, b._2)).getOrElse(throw NoRoute)
                    case _ => throw NoRoute
                  }
                  case _: AggregateExpression => throw NoRoute
                }
                if (!rewritten.deterministic || rewritten.references.nonEmpty ||
                    rewritten.exists(_.isInstanceOf[AggregateExpression]))
                  throw NoRoute
                if (rewritten.dataType != al.dataType) throw NoRoute
                Alias(rewritten, name)(exprId = al.exprId,
                  qualifier = al.qualifier)
              case _ => throw NoRoute
            }
            Project(aliases, OneRowRelation())
          } catch { case NoRoute => agg }
        }
    }
  }
}
