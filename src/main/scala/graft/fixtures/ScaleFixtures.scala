package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The sf1 scale tier (round-12 agenda #3): 10× the driver's sf0.1
  * fixtures, self-generated deterministically so the headline queries
  * can be measured — and oracle-checked — one order of magnitude past
  * the correctness tier. Every scaling claim before this rested on
  * sf0.1 plus targeted volume gates; sf1 is where O(n²) cliffs and
  * memory blowups that 600 k rows structurally cannot expose would
  * show up as super-linear wall growth (the bench's `sf1` section
  * reports per-query ratios against the same run's sf0.1 numbers).
  *
  * Construction = 10 replicas of sf0.1 with disjoint key spaces:
  *
  *  - Foreign keys shift together (orderkey/custkey/partkey/suppkey,
  *    event user_id, doc/vec ids), so join selectivities and per-key
  *    group sizes match TPC-H's own scaling (more groups, same size) —
  *    NOT 10×-deeper groups, which would be a different workload.
  *  - `nation`/`region` stay fixed (dimensions, like TPC-H at any SF).
  *  - Document TEXT is salted per replica (every 5th word tagged, ~75%
  *    of 3-gram shingles touched → cross-replica jaccard ≈ 0.24,
  *    measured): exact replication would plant a 10-member duplicate
  *    group on EVERY doc, making pair-emitting dedup quadratic by
  *    fixture construction rather than by plan — the opposite of what
  *    a linear-scaling measurement needs. In-replica near-dup pairs
  *    keep their planted structure (same positions salt the same way).
  *  - Embeddings get deterministic ±0.02 per-dimension noise (cosine
  *    of a (vec_id, dim, replica) hash angle): distinct vectors, same
  *    cluster/label geometry.
  *
  * Deterministic end to end (no RNG, content hashed from ids), so the
  * corpus fingerprint — and every TruthCache/ANN artifact keyed on it —
  * is stable across builds. The output lands as one plain
  * `<table>.parquet` FILE per table (matching the driver's sfN layout,
  * and what DuckDB's `read_parquet` expects for local oracle runs) under
  * `fixtures/sf1/`, built once and kept (gitignored). */
object ScaleFixtures {

  val Replicas = 10
  val dir = "/root/repo/fixtures/sf1"
  private val marker = s"$dir/_SF1_v1"
  private val lock = new Object

  /** Per-table replica transform: key columns shifted by disjoint
    * strides (sf0.1 maxima: orderkey 150 k, custkey 15 k, partkey 20 k,
    * suppkey 1 k, event_id 100 k, user_id 1.5 k, doc_id 5 k, vec_id 2 k). */
  private def replicate(t: String, df: DataFrame, i: Int): DataFrame = {
    def shift(c: String, stride: Long): DataFrame => DataFrame =
      _.withColumn(c, col(c) + lit(stride * i))
    val id = identity[DataFrame] _
    val f: DataFrame => DataFrame = t match {
      case "lineitem" =>
        shift("l_orderkey", 1000000L) andThen shift("l_partkey", 100000L) andThen
          shift("l_suppkey", 10000L)
      case "orders" => shift("o_orderkey", 1000000L) andThen shift("o_custkey", 100000L)
      case "customer" => shift("c_custkey", 100000L)
      case "supplier" => shift("s_suppkey", 10000L)
      case "part" => shift("p_partkey", 100000L)
      case "events" => shift("event_id", 1000000L) andThen shift("user_id", 10000L)
      case "documents" =>
        shift("doc_id", 100000L) andThen { d =>
          if (i == 0) d
          else d.withColumn("text", expr(
            s"""array_join(transform(split(text, ' '),
               |  (w, j) -> CASE WHEN (j + $i) % 5 = 0
               |            THEN concat(w, '_r$i') ELSE w END), ' ')""".stripMargin))
            .withColumn("n_chars", length(col("text")).cast("long"))
        }
      case "embeddings" =>
        shift("vec_id", 100000L) andThen { d =>
          if (i == 0) d
          else d.withColumn("embedding", expr(
            s"""transform(embedding, (x, j) ->
               |  CAST(x + 0.02D * cos(CAST(vec_id AS DOUBLE) * 31.0D
               |    + j * 7.0D + $i * 13.0D) AS FLOAT))""".stripMargin))
        }
      case _ => id // nation, region: fixed dimensions
    }
    f(df)
  }

  private[graft] val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Build once (marker-guarded, persists across JVMs); returns `dir`. */
  def ensureSf1(spark: SparkSession,
                baseDir: String = "/root/testdata/sf0.1"): String =
    lock.synchronized {
      if (new java.io.File(marker).exists()) return dir
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      graft.ops.BuildLog.timed("sf1_fixture_build") {
        val out = new java.io.File(dir)
        if (out.exists()) rm(out)
        out.mkdirs()
        tables.foreach { t =>
          val base = spark.read.parquet(s"$baseDir/$t.parquet")
          val full =
            if (t == "region" || t == "nation") base
            else (0 until Replicas).map(replicate(t, base, _))
              .reduce(_.unionByName(_))
          // one plain FILE per table, like the driver's sfN dirs: write
          // the single part under a tmp dir, then move it into place
          val tmp = s"$dir/_build_$t"
          full.coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(f => f.getName.endsWith(".parquet")).get
          java.nio.file.Files.move(part.toPath,
            java.nio.file.Paths.get(s"$dir/$t.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          rm(new java.io.File(tmp))
        }
        java.nio.file.Files.write(java.nio.file.Paths.get(marker),
          s"replicas=$Replicas base=$baseDir\n".getBytes("UTF-8"))
      }
      dir
    }

  val linearDir = "/root/repo/fixtures/sf1linear"
  private val linearMarker = s"$linearDir/_SF1LINEAR_v1"

  /** The LINEAR scale tier for the flagship (round-12 verdict #2):
    * events at 10× the block span with the ilk (user) set held FIXED —
    * the reference's actual production axis (`assets_per_type.sql`
    * fills per-ilk per-block-step, and a real warehouse grows by blocks,
    * not by collateral types). The replicated-key sf1 tier scales BOTH
    * fill axes at once, which makes the flagship's series fill quadratic
    * BY FIXTURE (measured once at 92.7×, SURVEY §7.13); here the fill
    * grows exactly 10× and the flagship can be measured — and
    * oracle-checked — at scale without measuring fixture construction.
    *
    * Replicas are span-contiguous: event_id shifts by the base span
    * (max-min+1) per replica, so the global id range is one dense 10× block
    * window with no inter-replica holes inflating the fill. user_id,
    * event_type, value, ts, props are untouched — per-ilk event depth
    * grows 10×, matching "same collaterals, ten times the history".
    * Deterministic (pure column arithmetic); ships ONLY events.parquet
    * (the flagship reads nothing else — q17AssetsShapeEventsOnly). */
  def ensureSf1Linear(spark: SparkSession,
                      baseDir: String = "/root/testdata/sf0.1"): String =
    lock.synchronized {
      if (new java.io.File(linearMarker).exists()) return linearDir
      graft.ops.BuildLog.timed("sf1linear_fixture_build") {
        buildLinear(spark, baseDir, linearDir)
        java.nio.file.Files.write(java.nio.file.Paths.get(linearMarker),
          s"replicas=$Replicas base=$baseDir\n".getBytes("UTF-8"))
      }
      linearDir
    }

  /** The linear-tier construction itself (outDir-parameterized so specs
    * can build a small-base copy without touching the real fixture). */
  private[graft] def buildLinear(spark: SparkSession, baseDir: String,
                                 outDir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    val out = new java.io.File(outDir)
    if (out.exists()) rm(out)
    out.mkdirs()
    val base = spark.read.parquet(s"$baseDir/events.parquet")
    // stride = SPAN (max-min+1), not max+1: a base fixture whose min
    // event_id is nonzero would otherwise leave min-sized holes between
    // replica windows, contradicting the dense-window contract (r13
    // ADVICE #4); replicas shift to min + i*span
    val mm = base.agg(min(col("event_id")), max(col("event_id"))).head()
    val stride = mm.getLong(1) - mm.getLong(0) + 1
    val full = (0 until Replicas)
      .map(i => base.withColumn("event_id",
        col("event_id") + lit(stride * i)))
      .reduce(_.unionByName(_))
    val tmp = s"$outDir/_build_events"
    full.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$outDir/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    rm(new java.io.File(tmp))
    // the other tables ride along UNSCALED (hard link, copy fallback):
    // the tier's semantic is "same warehouse, 10x the event history",
    // and a complete dir lets the standard oracle tooling
    // (Verify + tools/check_oracle_each.py) run against it unchanged
    tables.filterNot(_ == "events").foreach { t =>
      val src = java.nio.file.Paths.get(s"$baseDir/$t.parquet")
      val dst = java.nio.file.Paths.get(s"$outDir/$t.parquet")
      try java.nio.file.Files.createLink(dst, src)
      catch { case _: Throwable =>
        java.nio.file.Files.copy(src, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }
}
