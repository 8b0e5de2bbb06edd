package graft.ingest

import org.apache.spark.sql.SparkSession

/** Matview AUTO-REFRESH (round-15 stretch #9): a registered view goes
  * stale on every source commit and silently stops routing until
  * someone re-refreshes and re-registers — in a STREAMING ingest that
  * is every micro-batch, i.e. routing would effectively never fire.
  *
  * A binding ties a view to its source store; [[ManifestStore]]'s one
  * commit funnel calls [[onCommit]] after every published version, so
  * each micro-batch's append triggers `MatView.refresh` (delta-only —
  * the refresh reads the files the manifest diff names, never the
  * corpus) followed by [[MatViewRouter.register]], and routed answers
  * stay CURRENT across micro-batches with no caller code in the
  * stream's foreachBatch at all.
  *
  * Failure containment: a refresh failure logs and disables nothing —
  * the view simply stays at its previous `as_of`, the router's
  * freshness gate sees version ≠ as_of, and queries fall back to the
  * source scan (correct, just unrouted). The ingest commit itself can
  * never be failed by its refresh hook.
  *
  * Re-entrancy: the refresh commits to the VIEW's store, whose root
  * carries no binding (bindings are keyed by SOURCE root), so the
  * nested onCommit is a cheap empty lookup. Binding a view's store as
  * another binding's source (view-on-view chains) is not supported. */
object MatViewAutoRefresh {

  private final case class Binding(view: MatView, source: ManifestStore)

  private val bindings =
    new java.util.concurrent.ConcurrentHashMap[String, List[Binding]]()

  private def keyOf(root: String): String =
    if (root.length > 1 && root.endsWith("/")) root.dropRight(1) else root

  /** Bind `view` to `source`: refresh + register now, and again after
    * every in-process commit to the source. groupCols/valueCol and the
    * sketch families must be the ones the view was created with. */
  def bind(spark: SparkSession, view: MatView, source: ManifestStore,
           groupCols: Seq[String], valueCol: String,
           distinctCol: Option[String] = None,
           freqCol: Option[String] = None,
           histCol: Option[String] = None): Unit = {
    bindings.merge(keyOf(source.root), List(Binding(view, source)),
      (a, b) => b ::: a.filterNot(_.view.root == view.root))
    refreshOne(spark, Binding(view, source), groupCols, valueCol,
      distinctCol, freqCol, histCol)
  }

  /** Drop a binding (tests; or a decommissioned view). */
  def unbind(sourceRoot: String, viewRoot: String): Unit =
    bindings.computeIfPresent(keyOf(sourceRoot),
      (_, l) => l.filterNot(_.view.root == viewRoot) match {
        case Nil => null
        case rest => rest
      })

  // the per-binding column spec lives on the MatView instance; register
  // needs it too, so bind() stores it alongside
  private val specs = new java.util.concurrent.ConcurrentHashMap[String,
    (Seq[String], String, Option[String], Option[String], Option[String])]()

  private def refreshOne(spark: SparkSession, b: Binding,
                         groupCols: Seq[String], valueCol: String,
                         distinctCol: Option[String],
                         freqCol: Option[String],
                         histCol: Option[String]): Unit = {
    specs.put(b.view.root,
      (groupCols, valueCol, distinctCol, freqCol, histCol))
    try {
      b.view.refresh(spark, b.source)
      MatViewRouter.register(spark, b.view.root, b.source, groupCols,
        valueCol, distinctCol, freqCol, histCol)
      ()
    } catch {
      case e: Throwable =>
        // the view stays at its previous as_of: queries fall back to
        // the source scan (unrouted, never stale)
        System.err.println(s"[matview] auto-refresh of ${b.view.root} " +
          s"failed: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(160))
    }
  }

  // a refresh itself commits (to the view store); if someone binds a
  // view's own store as a source — or chains views — the nested
  // onCommit must not recurse into more refreshes on this thread
  private val inProgress = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Called by [[ManifestStore]] after every published commit. */
  private[ingest] def onCommit(spark: SparkSession, root: String): Unit = {
    if (inProgress.get()) return
    val bs = bindings.get(keyOf(root))
    if (bs != null) {
      inProgress.set(java.lang.Boolean.TRUE)
      try bs.foreach { b =>
        val spec = specs.get(b.view.root)
        if (spec != null)
          refreshOne(spark, b, spec._1, spec._2, spec._3, spec._4, spec._5)
      } finally inProgress.set(java.lang.Boolean.FALSE)
    }
  }
}
