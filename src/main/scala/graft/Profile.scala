package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (round 15): times individual
  * declared queries in isolation — repeated warm runs, per-run wall,
  * construct-vs-execute split — and dumps `explain("formatted")` for
  * plan-diff evidence (plans/r15/<q>_before|after.txt).
  *
  * Deliberately NOT part of the driver contract: Bench.scala stays the
  * only source of record numbers. This exists so an optimization's
  * before/after can be measured in seconds instead of a full 18-minute
  * bench run per hypothesis (guide §1: measure first, isolate the
  * query).
  *
  * Usage:
  *   runMain graft.Profile <sfDir> <reps> [q1 q2 ...]
  *     no names = all declared queries
  *   env SPARK_GRAFT_PLANS_OUT=<dir>  also write <dir>/<q>.txt explains
  *   env SPARK_GRAFT_CPUS             core count (default 32)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val plansOut = sys.env.get("SPARK_GRAFT_PLANS_OUT")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same untimed warmup as Bench: touch every fixture table once
    Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    // pseudo-queries for fixed-cost attribution: the shared table
    // registration and a single-table load, timed like a gate
    val pseudo: Seq[(String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "_register_all" -> ((s: SparkSession, d: String) => {
        Tables.registerAll(s, d); s.range(1).toDF("x")
      }),
      "_load_events" -> ((s: SparkSession, d: String) =>
        Tables.load(s, d, "events")))
    val qs = (SparkEntry.queries.toSeq ++ pseudo).sortBy(_._1)
      .filter(kv => names.isEmpty || names.contains(kv._1))
    qs.foreach { case (name, fn) =>
      try {
        spark.sparkContext.setJobDescription(s"profile:$name")
        val walls = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val tc = System.nanoTime()
          df.count()
          val t1 = System.nanoTime()
          spark.catalog.clearCache()
          ((tc - t0) / 1e9, (t1 - tc) / 1e9)
        }
        val cons = walls.map(_._1)
        val exec = walls.map(_._2)
        val tot = walls.map(w => w._1 + w._2)
        def f(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", d)
        println(s"""{"q":"$name","min":${f(tot.min)},""" +
          s""""construct":[${cons.map(f).mkString(",")}],""" +
          s""""exec":[${exec.map(f).mkString(",")}]}""")
        plansOut.foreach { dir =>
          val d = new java.io.File(dir); d.mkdirs()
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/$name.txt"),
            plan.getBytes("UTF-8"))
        }
      } catch {
        case e: Throwable =>
          println(s"""{"q":"$name","error":"${e.getClass.getSimpleName}: ${
            String.valueOf(e.getMessage).take(120).replace('"', '\'')
              .replace('\n', ' ')}"}""")
      }
    }
    spark.stop()
  }
}
