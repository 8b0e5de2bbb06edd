package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A materialized STAR-JOIN aggregate (round-15 session 2): the view's
  * defining query is `fact ⋈ dim` (inner equi-join on `joinKeys`)
  * folded by [[MatView.definingAgg]] on `groupCols` — typically fact
  * measures rolled up BY A DIMENSION ATTRIBUTE, the canonical
  * warehouse reporting shape. At 100 TB the routed version answers the
  * report without touching the fact store OR paying the join.
  *
  * Maintenance is delta-incremental on the FACT side: new fact commits
  * join against the CURRENT dimension and fold into the stored partials
  * (n and vsum add exactly — the same merge algebra [[MatView]] uses),
  * valid precisely while the dimension is UNCHANGED. Any dim version
  * bump — and any fact rewrite (delete/compact/forget) — triggers a
  * full recompute: a changed dim row can relabel EXISTING fact rows,
  * so no delta exists. The view rows carry BOTH watermarks
  * (`as_of` = fact version, `dim_as_of` = dim version);
  * [[MatViewRouter.registerJoin]] registers both and freshness checks
  * both at optimization time. */
final class JoinMatView(val root: String, groupCols: Seq[String],
                        valueCol: String, joinKeys: Seq[String]) {

  private def store = new ManifestStore(root)

  /** Current view contents: (groupCols…, n, vsum, as_of, dim_as_of). */
  def state(spark: SparkSession): Option[DataFrame] = store.read(spark)

  /** The defining join aggregate over the CURRENT snapshots — what a
    * user writes, and what [[MatViewRouter.registerJoin]] captures. */
  def defining(spark: SparkSession, fact: ManifestStore,
               dim: ManifestStore): DataFrame =
    MatView.definingAgg(
      fact.read(spark).getOrElse(
          throw new IllegalStateException(s"empty fact store ${fact.root}"))
        .join(dim.read(spark).getOrElse(
          throw new IllegalStateException(s"empty dim store ${dim.root}")),
          joinKeys),
      groupCols, valueCol, None, None, None)

  /** Bring the view up to (fact, dim)'s current versions; returns the
    * fact version. No-op when both watermarks already match. */
  def refresh(spark: SparkSession, fact: ManifestStore,
              dim: ManifestStore): Long = {
    val vF = fact.currentVersion(spark)
    val vD = dim.currentVersion(spark)
    val st = state(spark)
    val marks = st.map { df =>
      val r = df.agg(max(col("as_of")), max(col("dim_as_of"))).head()
      (r.getLong(0), r.getLong(1))
    }
    if (marks.contains((vF, vD))) return vF
    val dimNow = dim.read(spark)
    def aggJoined(f: DataFrame): Option[DataFrame] = dimNow.map(d =>
      MatView.definingAgg(f.join(d, joinKeys), groupCols, valueCol,
        None, None, None))
    // full recompute when: first build, the DIMENSION moved (existing
    // fact rows may re-label), or the fact was rewritten (folded
    // partials may include removed rows)
    val full = marks.isEmpty || marks.exists(_._2 != vD) ||
      fact.removedSince(spark, marks.get._1)
    val fresh: Option[DataFrame] =
      if (full) fact.read(spark).flatMap(aggJoined) match {
        case some @ Some(_) => some
        // fact (or dim) emptied: the view empties at its own schema
        case None => st.map(_.drop("as_of", "dim_as_of").limit(0))
      }
      else fact.readAddedSince(spark, marks.get._1) match {
        // versions moved with no files added: carry partials forward
        case None => st.map(_.drop("as_of", "dim_as_of"))
        case Some(delta) => aggJoined(delta) match {
          case Some(dAgg) =>
            Some(st.get.drop("as_of", "dim_as_of").unionByName(dAgg)
              .groupBy(groupCols.map(col): _*)
              .agg(sum(col("n")).as("n"),
                sum(col("vsum")).cast("decimal(38,6)").as("vsum")))
          case None => st.map(_.drop("as_of", "dim_as_of"))
        }
      }
    fresh.foreach(f => store.replaceAll(spark,
      f.withColumn("as_of", lit(vF)).withColumn("dim_as_of", lit(vD)),
      commitKey = Some(s"jrefresh@$vF:$vD")))
    vF
  }
}
