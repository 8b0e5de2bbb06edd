package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Java processes on this host other than our own JVM (and our parent
    * sbt, which is idle while runMain executes). Bench numbers inflate
    * 2-10x when another local[N] Spark JVM runs concurrently — record the
    * evidence in the output so a contaminated run is self-evident. */
  private def otherJvmCount(): Int = {
    val self = ProcessHandle.current()
    val parents = Iterator.iterate(Option(self))(_.flatMap(h =>
      if (h.parent().isPresent) Some(h.parent().get()) else None))
      .takeWhile(_.isDefined).take(8).flatten.map(_.pid()).toSet
    ProcessHandle.allProcesses().filter { h =>
      val cmd = h.info().command()
      cmd.isPresent && cmd.get().endsWith("java") && !parents.contains(h.pid())
    }.count().toInt
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val jvmsBefore = otherJvmCount()
    val loadBefore = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed section, stable query order
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries persist intermediates (LSH bands, shingles); drop them so
      // accumulated storage doesn't steal execution memory from later ones
      spark.catalog.clearCache()
      name -> dt
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // re-sample after the run: a competing JVM that starts mid-benchmark
    // is exactly the contamination this flag exists to expose
    val jvmsAfter = otherJvmCount()
    val contaminated = jvmsBefore > 0 || jvmsAfter > 0
    val loadAfter = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val env = s""""env":{"other_jvms":$jvmsBefore,"other_jvms_after":$jvmsAfter,""" +
      s""""load_avg_before":$loadBefore,"load_avg_after":$loadAfter,""" +
      s""""cpus":$cpus,"contaminated":$contaminated}"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",$env}"""
    if (contaminated)
      System.err.println(s"[bench] WARNING: other JVM(s) alive during the " +
        s"run (before=$jvmsBefore, after=$jvmsAfter) - wall times are " +
        "likely inflated by CPU contention")
    // sbt prefixes stdout with [info], which broke the driver's parse in
    // round 1 — persist the metric line to a file as the canonical copy.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
