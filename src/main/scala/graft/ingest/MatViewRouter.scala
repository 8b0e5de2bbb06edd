package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

/** Matview ROUTING (round-13 stretch #7, widened in round 15 #2): a
  * genuine optimizer `Rule[LogicalPlan]` that rewrites a user's
  * base-table aggregate onto its materialized view — the user writes
  * the query against the SOURCE store; if a registered view maintains
  * that aggregate and is FRESH (covers the source's current manifest
  * version), the plan substitutes the view's tiny store for the
  * corpus-wide scan+shuffle. At 100 TB this is the difference between
  * "the warehouse has summary tables if you know their names" and "the
  * optimizer answers the query from them".
  *
  * What routes (round 15 widened the round-14 exact-plan-equality
  * matcher into a structural one):
  *
  *  - the EXACT defining aggregate — count + exact decimal sum per
  *    group, plus any sketch family the view maintains (HLL distinct /
  *    count-min frequency / fixed-domain histogram);
  *  - SUBSUMED queries: a Filter on GROUP columns above the defining
  *    aggregate (Catalyst pushes it below the Aggregate into the scan —
  *    the matcher lifts it and re-applies it over the view: filtering a
  *    view row ≡ filtering its group) and a Project of a SUBSET of the
  *    defining outputs (column pruning narrows the Aggregate itself —
  *    the matcher maps each surviving output to its view column);
  *  - HAVING-style filters ABOVE the aggregate need no special case:
  *    the Aggregate subtree routes and the parent Filter stays, its
  *    attribute ids preserved by the aliasing Project.
  *
  * What can NEVER route (conservative, correctness-first):
  *
  *  - a filter referencing a NON-group column below the aggregate (the
  *    view's partials already folded those rows — no residual exists);
  *  - a different grouping, a different aggregate expression, a
  *    different source snapshot (leaf-relation equality is part of the
  *    match — [[ManifestFileIndex]] carries value equality on
  *    (root, files) so two reads of one snapshot canonicalize equal);
  *  - a STALE view: freshness is re-checked at optimization time
  *    against the source's manifest version through
  *    [[ManifestVersionCache]] (one listing per root per TTL,
  *    invalidated by in-process commits), and only AFTER a candidate
  *    subtree matches, so unrelated queries pay nothing per registered
  *    view.
  *
  * Matching mechanics: the candidate `Aggregate(ge, ae, child)` is
  * decomposed by stripping attribute-only Projects and collecting
  * Filter conditions along every leaf path (a pushed filter appears
  * once per Union branch of a multi-commit store; every path must
  * carry the SAME conjunct set, or a hand-built union of differently
  * filtered reads would silently re-filter as their intersection).
  * The stripped core must canonicalize equal to the registered
  * source's stripped read plan; grouping must be exactly the
  * registered group attributes; every output must be a group column
  * or canonically equal (after by-name attribute alignment) to one of
  * the registered defining aggregate's expressions.
  *
  * Installed per session via `spark.experimental.extraOptimizations`
  * (the public hook for user rules — runs after Catalyst's own
  * batches, i.e. against the same optimized shape the registration
  * captured). */
object MatViewRouter {

  /** One recognizable aggregate-output shape: `canon` is the aligned
    * expression to match canonically; `rebuild` produces the routed
    * output from the view's column. Each defining output registers its
    * exact form (rebuild = the view attribute itself) AND, when the
    * output is a Cast over the raw aggregate, the cast-STRIPPED form:
    * PushDownPredicates moves a HAVING filter under the final-cast
    * Project, leaving the Aggregate with the uncast sum — the stripped
    * variant rebuilds as Cast(view.col, innerType), value-exact because
    * the view stores exactly the widened value (a widening round-trip
    * loses nothing, and an inner-sum overflow stored null either way).
    *
    * `rollup`, when present, produces the RE-AGGREGATING form for a
    * group-subset query (`groupBy` on fewer columns than the view):
    * count partials SUM exactly and decimal-sum partials SUM exactly,
    * so n → sum(view.n) and vsum → sum(view.vsum) answer any rollup of
    * the view's grouping from the view alone. The sketch columns carry
    * NO rollup form on purpose: their merges are estimate-preserving
    * but not proven BYTE-identical to the direct aggregate (HLL mode
    * transitions), and a routed answer must hash-match the unrouted
    * one — a rollup query touching a sketch column stays on the source
    * scan. */
  private[ingest] case class Tmpl(viewCol: String, canon: Expression,
                                  rebuild: Attribute => Expression,
                                  rollup: Option[Attribute => Expression] =
                                    None)

  private[ingest] case class Entry(
      groupNames: Set[String],                 // lowercased group columns
      srcChild: LogicalPlan,                   // the defining Aggregate's child
      srcAttrByName: Map[String, Attribute],   // lowercased name → source attr
      templates: Seq[Tmpl],                    // recognizable agg outputs
      viewPlan: LogicalPlan,                   // optimized view read (group+agg cols)
      viewAttrByName: Map[String, Attribute],  // lowercased name → view attr
      // every source store whose version must still match for the view
      // to be fresh — one (root, as_of) for the plain aggregate view,
      // (fact, dim) pairs for a join view
      sources: Seq[(String, Long)])

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Per-root registration locks. Re-registration has an unavoidable
    * unregistered WINDOW (the entry must be removed before the defining
    * query is optimized, or the rule would route it and capture the
    * routed plan as the template); two concurrent gates registering one
    * root serialize here, and the loser then takes the skip path below
    * instead of re-opening the window. */
  private val regLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** True when a live entry for `viewRoot` already answers exactly this
    * registration (same group columns, same aggregate outputs, same
    * source watermarks) — the repeat-gate steady state. Skipping the
    * re-registration is what keeps CONCURRENT gates safe: the r15
    * concurrent pass caught `store_matview_join` asserting "routed"
    * while its sibling rollup gate was mid-re-registration of the SAME
    * view (entry removed, defining query still optimizing) — with the
    * skip, an equivalent fresh entry is never dropped at all. */
  private def equivalentLive(viewRoot: String, groupCols: Seq[String],
                             aggNames: Seq[String],
                             sources: Seq[(String, Long)]): Boolean = {
    val e = entries.get(viewRoot)
    e != null && e.sources == sources &&
      e.groupNames == groupCols.map(_.toLowerCase).toSet &&
      e.templates.map(_.viewCol).distinct == aggNames
  }

  /** The defining aggregate every [[MatView]] maintains — count + exact
    * decimal sum per group, plus the optional sketch families (HLL
    * distinct / count-min frequency / histogram quantile). This shape
    * (over the source's CURRENT snapshot), and its group-filtered /
    * output-pruned subsumptions, is what routes. */
  def definingQuery(spark: SparkSession, source: ManifestStore,
                    groupCols: Seq[String], valueCol: String,
                    distinctCol: Option[String] = None,
                    freqCol: Option[String] = None,
                    histCol: Option[String] = None): DataFrame =
    MatView.definingAgg(
      source.read(spark).getOrElse(
        throw new IllegalStateException(s"empty source ${source.root}")),
      groupCols, valueCol, distinctCol, freqCol, histCol)

  /** Register `viewRoot` as the routed answer for the defining
    * aggregate over `source`. Captures the CURRENT source version: the
    * caller registers after a [[MatView.refresh]], so view and source
    * agree. Returns false (no registration) on an empty view. */
  def register(spark: SparkSession, viewRoot: String, source: ManifestStore,
               groupCols: Seq[String], valueCol: String,
               distinctCol: Option[String] = None,
               freqCol: Option[String] = None,
               histCol: Option[String] = None): Boolean = {
    install(spark)
    val viewStore = new ManifestStore(viewRoot)
    val st = viewStore.read(spark) match {
      case Some(df) => df
      case None => return false
    }
    val asOf = st.agg(max(col("as_of"))).head().getLong(0)
    val aggNames = Seq("n", "vsum") ++ distinctCol.map(_ => "dsk") ++
      freqCol.map(_ => "csk") ++ histCol.map(_ => "hsk")
    val sources = Seq(source.root -> asOf)
    if (equivalentLive(viewRoot, groupCols, aggNames, sources)) return true
    regLocks.computeIfAbsent(viewRoot, _ => new Object).synchronized {
      if (equivalentLive(viewRoot, groupCols, aggNames, sources)) return true
      // drop any existing registration BEFORE optimizing the defining
      // query: with a live fresh entry the rule would route the defining
      // query itself, and the captured shapes would be the ROUTED plan —
      // which never matches a user query, silently disabling routing on
      // every second register (bench pass 2 / the concurrent pass caught
      // exactly this alternation)
      entries.remove(viewRoot)
      val defining = definingQuery(spark, source, groupCols, valueCol,
        distinctCol, freqCol, histCol).queryExecution.optimizedPlan
    val (ge0, ae0, child0) = defining match {
      case Aggregate(g, a, c, _) => (g, a, c)
      case other => throw new IllegalStateException(
        s"defining query did not optimize to an Aggregate:\n$other")
    }
    require(child0.collect { case f: Filter => f }.isEmpty,
      "source read plan unexpectedly carries filters")
    val srcAttrs = child0.output
      .map(a => a.name.toLowerCase -> a).toMap
    // alignment: the templates are stored over the REGISTERED source's
    // attributes; a candidate's expressions are rewritten onto the same
    // attributes by name before canonical comparison
    val groupNames = ge0.map {
      case a: AttributeReference => a.name.toLowerCase
      case other => throw new IllegalStateException(
        s"non-attribute group expression in defining aggregate: $other")
    }.toSet
    val templates = templatesOf(ae0, srcAttrs, aggNames)
    require(templates.map(_.viewCol).distinct == aggNames,
      s"defining aggregate outputs " +
        s"${templates.map(_.viewCol).distinct} != $aggNames")
    val viewPlan = st
      .select((groupCols ++ aggNames).map(col): _*)
      .queryExecution.optimizedPlan
    val viewAttrs = viewPlan.output.map(a => a.name.toLowerCase -> a).toMap
    entries.put(viewRoot, Entry(groupNames, child0, srcAttrs, templates,
      viewPlan, viewAttrs, sources))
    true
    }
  }

  /** Register `viewRoot` (a [[JoinMatView]]'s store) as the routed
    * answer for the defining aggregate over `fact ⋈ dim` (round-15
    * session 2 — the star-join summary, THE warehouse reporting shape
    * at 100 TB: a per-dimension-attribute rollup of a fact store served
    * without touching the fact OR the join). Matching rides on
    * [[coreMatch]]'s canonical-equality fallback: the whole Join
    * subtree — including the optimizer's inferred IsNotNull filters on
    * the equi-join keys, which appear identically in every candidate —
    * must canonicalize equal to the registered child, so there is no
    * filter-free requirement here. Freshness covers BOTH stores: a
    * commit to either past its registered version disables routing.
    * Group-subset ROLLUPS route exactly as for plain views (summable
    * partials re-aggregate); group FILTERS do not (predicate pushdown
    * moves them inside the join before this rule runs — declined
    * structurally, never wrongly answered). */
  def registerJoin(spark: SparkSession, viewRoot: String,
                   fact: ManifestStore, dim: ManifestStore,
                   groupCols: Seq[String], valueCol: String,
                   joinKeys: Seq[String]): Boolean = {
    install(spark)
    val st = new ManifestStore(viewRoot).read(spark) match {
      case Some(df) => df
      case None => return false
    }
    val head = st.agg(max(col("as_of")), max(col("dim_as_of"))).head()
    val (asOfF, asOfD) = (head.getLong(0), head.getLong(1))
    val aggNames = Seq("n", "vsum")
    val sources = Seq(fact.root -> asOfF, dim.root -> asOfD)
    // repeat registration of a fresh equivalent entry skips the remove/
    // re-optimize window entirely — see [[equivalentLive]] (the two join
    // gates register the SAME view and run concurrently in the bench)
    if (equivalentLive(viewRoot, groupCols, aggNames, sources)) return true
    regLocks.computeIfAbsent(viewRoot, _ => new Object).synchronized {
      if (equivalentLive(viewRoot, groupCols, aggNames, sources)) return true
      entries.remove(viewRoot)
      val defining = new JoinMatView(viewRoot, groupCols, valueCol, joinKeys)
        .defining(spark, fact, dim).queryExecution.optimizedPlan
    val (ge0, ae0, child0) = defining match {
      case Aggregate(g, a, c, _) => (g, a, c)
      case other => throw new IllegalStateException(
        s"join defining query did not optimize to an Aggregate:\n$other")
    }
    val srcAttrs = child0.output.map(a => a.name.toLowerCase -> a).toMap
    require(srcAttrs.size == child0.output.size,
      s"ambiguous join output names: ${child0.output.map(_.name)}")
    val groupNames = ge0.map {
      case a: AttributeReference => a.name.toLowerCase
      case other => throw new IllegalStateException(
        s"non-attribute group expression in join defining aggregate: $other")
    }.toSet
    val templates = templatesOf(ae0, srcAttrs, aggNames)
    require(templates.map(_.viewCol).distinct == aggNames,
      s"join defining aggregate outputs " +
        s"${templates.map(_.viewCol).distinct} != $aggNames")
    val viewPlan = st.select((groupCols ++ aggNames).map(col): _*)
      .queryExecution.optimizedPlan
    val viewAttrs = viewPlan.output.map(a => a.name.toLowerCase -> a).toMap
    entries.put(viewRoot, Entry(groupNames, child0, srcAttrs, templates,
      viewPlan, viewAttrs, sources))
    true
    }
  }

  /** Recognizable output shapes of a defining aggregate: the exact
    * aliased expression plus, for a Cast-wrapped output, the
    * cast-STRIPPED variant (see [[Tmpl]]); summable partials (n, vsum)
    * get the re-aggregating rollup form, sketches none. Shared by both
    * register paths so plain and join views recognize identically. */
  private def templatesOf(ae0: Seq[NamedExpression],
                          srcAttrs: Map[String, Attribute],
                          aggNames: Seq[String]): Seq[Tmpl] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
    // summable partials re-aggregate exactly; sketches don't (see Tmpl)
    def sumOf(a: Attribute): Expression = Sum(a).toAggregateExpression()
    val rollupOf: Map[String, Attribute => Expression] = Map(
      "n" -> sumOf _, "vsum" -> sumOf _)
    ae0.collect {
      case Alias(childE, name) if aggNames.contains(name) =>
        val exact = Tmpl(name, align(childE, srcAttrs), a => a,
          rollupOf.get(name))
        val stripped = childE match {
          case Cast(inner, _, _, _) =>
            Seq(Tmpl(name, align(inner, srcAttrs),
              a => Cast(a, inner.dataType),
              rollupOf.get(name).map(r =>
                (a: Attribute) => Cast(r(a), inner.dataType))))
          case _ => Nil
        }
        exact +: stripped
    }.flatten
  }

  /** Drop a registration (tests; or a decommissioned view). */
  def unregister(viewRoot: String): Unit = entries.remove(viewRoot)

  /** Registered entry count (the bench's optimizer-overhead probe). */
  def registeredCount: Int = entries.size

  /** BENCH-ONLY: replicate an existing registration under `n` synthetic
    * keys so the optimizer-overhead probe measures the rule at
    * many-views scale (matching cost per entry is identical to the
    * real one — same captured plans). Returns the keys; the caller
    * unregisters them. */
  private[graft] def replicateForOverheadProbe(viewRoot: String,
                                               n: Int): Seq[String] = {
    val e = entries.get(viewRoot)
    require(e != null, s"no registration for $viewRoot")
    (1 to n).map { i =>
      val k = s"$viewRoot#synthetic-$i"
      entries.put(k, e)
      k
    }
  }

  /** Idempotently add the routing rule to this session's optimizer. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RouteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new RouteRule
  }

  /** A projection that only forwards columns: bare attributes, or
    * same-name aliases of attributes (Union output deduplication emits
    * `col#1 AS col#2` — a fresh exprId, same name). Alignment is
    * by NAME, so stripping these is sound; a RENAMING alias is not
    * forwarded (conservative no-match). */
  private def attrOnly(pl: Seq[NamedExpression]): Boolean = pl.forall {
    case _: AttributeReference => true
    case Alias(a: AttributeReference, n) => a.name.equalsIgnoreCase(n)
    case _ => false
  }

  /** Match a candidate read subtree against the registered source's,
    * modulo attribute-only Projects (column pruning narrows them per
    * query) and candidate-side Filters (whose conditions are returned,
    * one list per leaf path — a pushed filter lands once per Union
    * branch of a multi-commit store). Works structurally, never
    * REBUILDING a stripped plan: pruning can leave Union branches with
    * different column sets, and a synthesized Union over them would be
    * invalid (`output` throws). None = no match. */
  private def coreMatch(cand: LogicalPlan, reg: LogicalPlan)
  : Option[Seq[Seq[Expression]]] = {
    def stripCand(p: LogicalPlan): (LogicalPlan, Seq[Expression]) = p match {
      case Filter(c, ch) =>
        val (s, cs) = stripCand(ch); (s, c +: cs)
      case Project(pl, ch) if attrOnly(pl) => stripCand(ch)
      case x => (x, Nil)
    }
    def stripReg(p: LogicalPlan): LogicalPlan = p match {
      case Project(pl, ch) if attrOnly(pl) => stripReg(ch)
      case x => x
    }
    val (c0, conds0) = stripCand(cand)
    val r0 = stripReg(reg)
    (c0, r0) match {
      case (cu: Union, ru: Union)
          if cu.children.size == ru.children.size =>
        val parts = cu.children.zip(ru.children)
          .map { case (cc, rr) => coreMatch(cc, rr) }
        if (parts.exists(_.isEmpty)) None
        else Some(parts.flatMap(_.get).map(conds0 ++ _))
      case (cl, rl) =>
        // leaves (and any other identical shape): exact canonical
        // equality — ManifestFileIndex carries value equality on
        // (root, files), so two reads of one snapshot compare equal
        if (cl.canonicalized == rl.canonicalized) Some(Seq(conds0)) else None
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Rewrite every attribute reference onto `attrs` by (lowercased)
    * name, so expressions from different plan instances of the same
    * scan compare canonically. Unknown names throw (caller catches →
    * no match). */
  private def align(e: Expression, attrs: Map[String, Attribute]): Expression =
    e.transform {
      case a: AttributeReference =>
        attrs.getOrElse(a.name.toLowerCase,
          throw new NoSuchElementException(a.name))
    }

  /** The routed substitute for a matched candidate, or None. */
  private def routeOne(agg: Aggregate, e: Entry): Option[LogicalPlan] = try {
    val paths = coreMatch(agg.child, e.srcChild) match {
      case Some(ps) => ps
      case None => return None
    }
    // grouping: exactly the registered group attributes (projection
    // route), or a NONEMPTY strict subset (rollup route — the outputs
    // re-aggregate summable partials over the view). An EMPTY grouping
    // never routes: a global aggregate over an empty source returns one
    // (0, null) row while sum() over an empty view returns nulls — the
    // one rollup whose answers can differ.
    val geNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name.toLowerCase
      case _ => return None
    }
    if (geNames.distinct != geNames) return None
    val isExact = geNames.toSet == e.groupNames
    val isRollup = !isExact && geNames.nonEmpty &&
      geNames.toSet.subsetOf(e.groupNames)
    if (!isExact && !isRollup) return None
    // every leaf path must carry the SAME conjunct set (a pushed filter
    // lands once per Union branch); conjuncts may reference only group
    // columns — anything else pre-filters rows the view already folded
    val pathSets = paths.map(_.flatMap(conjuncts)
      .map(c => align(c, e.srcAttrByName).canonicalized).toSet)
    if (pathSets.distinct.size != 1) return None
    // deterministic too: a rand()-style condition references no columns
    // (so the name check alone would pass) but samples ROWS on the
    // source and GROUPS on the view — never liftable
    val condsAligned = paths.head.flatMap(conjuncts)
    if (!condsAligned.forall(c => c.deterministic &&
      c.references.forall(a =>
        e.groupNames.contains(a.name.toLowerCase)))) return None
    // map each output to its view expression. Outputs need not BE a
    // defining aggregate verbatim: Catalyst collapses post-aggregate
    // Projects INTO the Aggregate (`cast(vsum as double) AS value_sum`,
    // `n + 1`, …), so every subtree canonically equal to a registered
    // template is REWRITTEN to its view column and whatever remains must
    // be aggregate-free, deterministic, and reference only group
    // columns — classic view rewriting, compute-over-the-view included.
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    val srcGroupIds = e.groupNames.map(n => e.srcAttrByName(n).exprId)
    def isSrcAttr(a: AttributeReference): Boolean =
      e.srcAttrByName.get(a.name.toLowerCase).exists(_.exprId == a.exprId)
    // aggregates WE introduce (rollup rebuilds) are tracked by identity:
    // any OTHER aggregate surviving the rewrite is an unmatched user
    // aggregate and kills the route
    val introduced = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Expression, java.lang.Boolean]())
    val outCols: Seq[(NamedExpression, Expression)] =
      agg.aggregateExpressions.map { ne =>
        val (out, childE): (NamedExpression, Expression) = ne match {
          case a: AttributeReference => (a, a)
          case al @ Alias(c, _) => (al, c)
          case _ => return None
        }
        val aligned = align(childE, e.srcAttrByName)
        val rewritten = aligned.transformDown {
          case sub if e.templates
              .exists(_.canon.canonicalized == sub.canonicalized) =>
            val t = e.templates
              .find(_.canon.canonicalized == sub.canonicalized).get
            val va = e.viewAttrByName(t.viewCol)
            if (isExact) t.rebuild(va)
            else t.rollup match {
              case Some(r) =>
                val re = r(va)
                re.foreach {
                  case ae: AggregateExpression => introduced.add(ae); ()
                  case _ =>
                }
                re
              case None => return None // sketch rollups never route
            }
        }
        // remaining source references may only be GROUP columns — remap
        // them onto the view's; anything else (the value column outside
        // a template, a leftover aggregate) cannot be answered
        val finalE = rewritten.transform {
          case a: AttributeReference if srcGroupIds.contains(a.exprId) =>
            e.viewAttrByName(a.name.toLowerCase)
        }
        if (finalE.exists {
          case ae: AggregateExpression => !introduced.contains(ae)
          case _ => false
        }) return None
        if (!finalE.deterministic) return None
        if (finalE.exists {
          case a: AttributeReference => isSrcAttr(a)
          case _ => false
        }) return None
        out -> finalE
      }
    // the routed output must carry EXACTLY the original types — a
    // mismatch would change an attribute's dataType mid-optimization,
    // which downstream operators (and Spark's plan integrity checks)
    // assume impossible
    if (outCols.exists { case (out, repl) => repl.dataType != out.dataType })
      return None
    // rebuild: Filter(conds over view attrs) under an aliasing Project
    // (exact/projection route) or a re-aggregating Aggregate on the
    // subset grouping (rollup route) — either way the ORIGINAL output
    // attribute ids are kept so parents resolve
    val remapped = condsAligned.map(c => align(c, e.viewAttrByName))
    val filtered = remapped.reduceOption(And)
      .map(Filter(_, e.viewPlan)).getOrElse(e.viewPlan)
    val aliases = outCols.map { case (out, repl) =>
      Alias(repl, out.name)(exprId = out.exprId, qualifier = out.qualifier)
    }
    Some(
      if (isExact) Project(aliases, filtered)
      else Aggregate(geNames.map(e.viewAttrByName), aliases, filtered))
  } catch { case _: NoSuchElementException => None }

  final class RouteRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (entries.isEmpty) return plan
      import scala.jdk.CollectionConverters._
      var p = plan
      entries.values.asScala.foreach { e =>
        // freshness gate, once per entry per optimization: a source
        // commit past the registered as_of disables routing (the view
        // would answer stale); errors disable conservatively. LAZY —
        // evaluated only when a candidate actually matches, so
        // unrelated queries never pay the probe (r14 ADVICE #2), and
        // the probe itself is served by ManifestVersionCache.
        lazy val fresh =
          try e.sources.forall { case (root, asOf) =>
            ManifestVersionCache.version(SparkSession.active, root) == asOf
          } catch { case _: Throwable => false }
        // substitute AT MOST ONE site per entry per QUERY: the stored
        // view plan carries fixed internal ExprIds, and splicing it
        // twice (a UNION of the defining aggregate with itself) would
        // duplicate attribute ids across branches — a shape
        // post-analysis rules assume impossible. The guard must hold
        // across fixedPoint re-invocations of this rule, so "already
        // substituted" is detected from the PLAN (the view's leaf
        // relations present), not from per-apply state. The second
        // site keeps reading the source — correct, just unrouted.
        val viewLeaves = e.viewPlan.collectLeaves().map(_.canonicalized)
        var substituted = p.collectLeaves()
          .exists(l => viewLeaves.contains(l.canonicalized))
        p = p.transformUp {
          case agg: Aggregate if !substituted =>
            routeOne(agg, e).filter(_ => fresh) match {
              case Some(routed) => substituted = true; routed
              case None => agg
            }
        }
      }
      p
    }
  }
}
