package graft

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Isolated measurement harness for the bench's universe demux /
  * decode-through tier (guide §1: isolate the query before optimizing
  * it) — NOT part of the driver contract; Bench.scala stays the only
  * source of record numbers. Builds the same 1M-log demuxed store the
  * bench builds, then times BOTH decode-through formulations:
  *
  *  - `union`: the r15 build-round shape — one union of N
  *    partition-pruned per-table Demux.table branches (N scans, N
  *    codegen stages);
  *  - `dispatch`: the opt-round-1 shape — ONE scan filtered by
  *    [[graft.ingest.Demux.decodesOk]]'s per-row entry dispatch.
  *
  * Both counts must agree (the bench's conservation expectation);
  * DecodeDispatchSpec holds them row-equal per table. Explains land in
  * plans/r15 when SPARK_GRAFT_PLANS_OUT is set.
  *
  * Usage: runMain graft.UniverseProfile [reps]
  */
object UniverseProfile {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val plansOut = sys.env.get("SPARK_GRAFT_PLANS_OUT")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ingest.Demux
    val defs = graft.fixtures.UniverseFixture.defs()
    require(defs.nonEmpty, "reference config tree not present")
    val (raw, rawRows) = graft.fixtures.UniverseFixture
      .scaledRaw(spark, defs, targetRows = 1_000_000L)
    val tagged = Demux.taggedKnown(raw, defs)
      .repartition(F.col("table_name"))
    val out = java.nio.file.Files
      .createTempDirectory("graft_universe_prof").toString + "/demux"
    spark.sparkContext.setJobDescription("universe_prof: demux write")
    val tw0 = System.nanoTime()
    tagged.write.mode("overwrite").partitionBy("table_name").parquet(out)
    println(f"demux write: ${(System.nanoTime() - tw0) / 1e9}%.2f s " +
      s"(raw rows $rawRows)")
    val base = spark.read.parquet(out)

    def unionDf: DataFrame = defs.map { d =>
      Demux.table(base.filter(F.col("table_name") === d.qualified)
        .drop("table_name"), d)
        .select(F.lit(1L).as("one"))
    }.reduce(_.union(_))
    def dispatchDf: DataFrame = base.filter(Demux.decodesOk(defs))

    def time(tag: String, df: => DataFrame): Long = {
      spark.sparkContext.setJobDescription(s"universe_prof: $tag")
      var n = -1L
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        n = df.count()
        println(f"$tag rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"($n rows, ${n / ((System.nanoTime() - t0) / 1e9)}%.0f rows/s)")
      }
      n
    }
    val nd = time("dispatch", dispatchDf)
    val nu = time("union", unionDf)
    println(s"conserved: ${nd == nu} (dispatch $nd, union $nu)")
    plansOut.foreach { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      def dump(name: String, df: DataFrame): Unit =
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, name),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      dump("universe_decode_before.txt", unionDf)
      dump("universe_decode_after.txt", dispatchDf)
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(out).getParentFile)
    spark.stop()
  }
}
