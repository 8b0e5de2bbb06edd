package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the library surface): times one
  * named query N times at a given sf dir and dumps stage cardinalities
  * for q17. Usage: runMain graft.tools.Probe <name> [sfDir] [passes] */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q17_assets_shape")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "q17_assets_shape") {
      graft.Tables.registerAll(spark, dir)
      println("events rows: " + spark.table("events").count())
      val la1 = spark.sql(
        """SELECT COUNT(*) FROM events
           WHERE event_type IN ('purchase','click','view') AND value <> 0.0""")
      println("lending_assets_1 rows: " + la1.collect()(0).getLong(0))
      spark.sql(
        """SELECT user_id AS ilk, MIN(event_id) s, MAX(event_id) e FROM events
           WHERE event_type IN ('purchase','click','view') AND value <> 0.0
           GROUP BY 1""").createOrReplaceTempView("ilks_probe")
      println("ilks: " + spark.table("ilks_probe").count())
      val fill = spark.sql(
        """SELECT COUNT(*) n FROM (SELECT ilk,
             explode(sequence(s, (SELECT MAX(e) FROM ilks_probe), 100))
           FROM ilks_probe)""")
      println("noop_filling rows: " + fill.collect()(0).getLong(0))
    }
    if (name == "semdedup_sweep") {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val all = graft.ops.Similarity.nearDupUniverse(spark, dir).localCheckpoint()
      val unit = all.select(col("vec_id"),
        expr("transform(e, x -> x / nrm)").as("e"), lit(1.0).as("nrm"))
      val exact = graft.ops.Similarity.cosinePairs(all, all)
        .filter(col("cosine") >= 0.9).select("i", "j")
      val nExact = exact.count()
      for (k <- Seq(4, 8, 16); p <- Seq(1, 2, 3); if p <= k) {
        val cents = graft.ops.Ivf.centroids(unit, k)
        val b = unit.select("vec_id", "e", "nrm").as[(Long, Seq[Double], Double)]
          .flatMap { case (id, e, _) =>
            graft.ops.Ivf.nearestN(cents, e.toArray, p).map(c => (id, c)) }
          .toDF("vec_id", "cluster")
        val cand = b.select(col("cluster"), col("vec_id").as("i"))
          .join(b.select(col("cluster"), col("vec_id").as("j")), Seq("cluster"))
          .filter(col("i") < col("j")).select("i", "j").distinct()
        val hit = exact.join(cand, Seq("i", "j"), "left_semi").count()
        println(s"k=$k probes=$p: edges $hit/$nExact candidates=${cand.count()}")
      }
      spark.stop(); return
    }
    if (name.startsWith("plan:")) {
      val q = name.stripPrefix("plan:")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect()
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Window [") || l.contains("Exchange"))
        .foreach(l => println("PLANLINE: " + l.trim.take(250)))
      spark.stop(); return
    }
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to passes) {
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"$name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
