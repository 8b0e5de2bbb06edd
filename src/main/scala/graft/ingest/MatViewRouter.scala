package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

/** Predicate-aware MATVIEW ROUTING (round-13 verdict, stretch #7): a
  * genuine optimizer `Rule[LogicalPlan]` that rewrites a user's
  * base-table aggregate onto its materialized view — the user writes
  * the query against the SOURCE store; if a registered view is exactly
  * that aggregate and is FRESH (covers the source's current manifest
  * version), the plan substitutes the view's tiny store for the
  * corpus-wide scan+shuffle. At 100 TB this is the difference between
  * "the warehouse has summary tables if you know their names" and "the
  * optimizer answers the query from them".
  *
  * Mechanics — deliberately conservative, correctness-first:
  *
  *  - Matching is CANONICALIZED-PLAN EQUALITY against the view's
  *    defining aggregate, optimized once at registration: exactly the
  *    query the view maintains routes, anything else (extra columns, a
  *    filter, a different agg) does not. [[ManifestFileIndex]] carries
  *    value equality on (root, files) so two reads of one snapshot
  *    canonicalize equal — the same contract InMemoryFileIndex ships.
  *  - FRESHNESS is re-checked at optimization time against the source's
  *    manifest version (one directory listing, no data IO): any commit
  *    after the registered `as_of` disables routing until the view is
  *    refreshed and re-registered. A stale view can never answer.
  *  - The substituted subtree keeps the original output attribute ids
  *    (an aliasing Project), so parent operators resolve untouched.
  *
  * Installed per session via `spark.experimental.extraOptimizations`
  * (the public hook for user rules — runs after Catalyst's own
  * batches, i.e. against the same optimized shape the registration
  * captured). */
object MatViewRouter {

  private case class Entry(target: LogicalPlan, replacement: LogicalPlan,
                           sourceRoot: String, asOf: Long)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** The defining aggregate every (groupCols, valueCol) [[MatView]]
    * maintains — count + exact decimal sum per group, the view's `n`
    * and `vsum` columns. This exact shape (over the source's CURRENT
    * snapshot) is what routes. */
  def definingQuery(spark: SparkSession, source: ManifestStore,
                    groupCols: Seq[String], valueCol: String): DataFrame =
    source.read(spark).getOrElse(
      throw new IllegalStateException(s"empty source ${source.root}"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,6)"))
          .cast("decimal(38,6)").as("vsum"))

  /** Register `viewRoot` as the routed answer for the defining
    * aggregate over `source`. Captures the CURRENT source version: the
    * caller registers after a [[MatView.refresh]], so view and source
    * agree. Returns false (no registration) on an empty view. */
  def register(spark: SparkSession, viewRoot: String, source: ManifestStore,
               groupCols: Seq[String], valueCol: String): Boolean = {
    install(spark)
    val viewStore = new ManifestStore(viewRoot)
    val st = viewStore.read(spark) match {
      case Some(df) => df
      case None => return false
    }
    val asOf = st.agg(max(col("as_of"))).head().getLong(0)
    // drop any existing registration BEFORE optimizing the defining
    // query: with a live fresh entry the rule would route the defining
    // query itself, and the captured target would be the ROUTED plan —
    // which never matches a user query, silently disabling routing on
    // every second register (bench pass 2 / the concurrent pass caught
    // exactly this alternation)
    entries.remove(viewRoot)
    val target = definingQuery(spark, source, groupCols, valueCol)
      .queryExecution.optimizedPlan
    val replacement = st
      .select((groupCols ++ Seq("n", "vsum")).map(col): _*)
      .queryExecution.optimizedPlan
    entries.put(viewRoot, Entry(target, replacement, source.root, asOf))
    true
  }

  /** Drop a registration (tests; or a decommissioned view). */
  def unregister(viewRoot: String): Unit = entries.remove(viewRoot)

  /** Idempotently add the routing rule to this session's optimizer. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RouteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new RouteRule
  }

  final class RouteRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (entries.isEmpty) return plan
      import scala.jdk.CollectionConverters._
      var p = plan
      entries.values.asScala.foreach { e =>
        // freshness gate, once per entry per optimization: a source
        // commit past the registered as_of disables routing (the view
        // would answer stale); errors disable conservatively. The probe
        // goes through ManifestVersionCache (one real listing per root
        // per TTL, invalidated by in-process commits) and is LAZY —
        // evaluated only when a candidate subtree actually matches, so
        // unrelated queries pay nothing per registered view (r14
        // ADVICE #2 + agenda #6).
        lazy val fresh =
          try ManifestVersionCache
            .version(SparkSession.active, e.sourceRoot) == e.asOf
          catch { case _: Throwable => false }
        // substitute AT MOST ONE site per entry per QUERY: the stored
        // replacement plan carries fixed internal ExprIds, and splicing
        // it twice (a UNION of the defining aggregate with itself) would
        // duplicate attribute ids across branches — a shape
        // post-analysis rules assume impossible. The guard must hold
        // across fixedPoint re-invocations of this rule, so "already
        // substituted" is detected from the PLAN (a subtree equal to the
        // replacement), not from per-apply state. The second site keeps
        // reading the source — correct, just unrouted; routing both
        // would need fresh-ExprId re-aliasing per splice.
        var substituted =
          p.exists(sub => sub.canonicalized == e.replacement.canonicalized)
        p = p.transformUp {
          // plan equality BEFORE the freshness probe: `fresh` lists a
          // directory, and most subtrees of most queries are not
          // candidates — probing first would pay one listing per
          // registered entry on EVERY query in the session
          case sub if !substituted &&
            sub.canonicalized == e.target.canonicalized && fresh =>
            substituted = true
            // keep the original attribute ids so parents resolve
            Project(e.replacement.output.zip(sub.output).map {
              case (n, o) => Alias(n, o.name)(exprId = o.exprId,
                qualifier = o.qualifier)
            }, e.replacement)
        }
      }
      p
    }
  }
}
