package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** Execution-config correctness matrix (round-11 agenda #1).
  *
  * Every custom Catalyst expression ships TWO evaluation paths —
  * interpreted `eval`/`nullSafeEval` and generated `doGenCode` — and the
  * native `TypedImperativeAggregate` sketches ship serialize/merge paths
  * whose exercise depends on the physical aggregate strategy. Until this
  * spec, all 209 gates had only ever run under ONE execution
  * configuration (whole-stage codegen on, AQE at bench defaults, shuffle
  * partitions = cpus), so a divergence between the eval and codegen
  * bodies — the classic silent-wrong-answer bug class — had nothing to
  * catch it.
  *
  * The matrix: every gate touching a custom expression or native
  * aggregate re-runs on a session clone with
  *
  *   - `spark.sql.codegen.wholeStage=false` (no fused pipelines),
  *   - `spark.sql.codegen.factoryMode=NO_CODEGEN` (projections/predicates
  *     interpret every expression — `nullSafeEval` runs, `doGenCode`
  *     never does),
  *   - `spark.sql.adaptive.enabled=true` (runtime re-planning on),
  *   - `spark.sql.shuffle.partitions=2` (different partial-aggregate
  *     merge trees and exchange shapes),
  *
  * and every result hash must equal the default-config hash. Float
  * outputs are safe to compare exactly: every gate was built
  * order-insensitive for the DuckDB oracle (DECIMAL-cast sums, explicit
  * rounding), so a partition-count change cannot legitimately move a
  * bit — any difference IS an eval/codegen split.
  */
class ExecConfigMatrixSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def hashOf(df: DataFrame): String = {
    val rows = df.collect().map(_.toString).sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Gates covering every custom expression and native aggregate, each
    * named with what it exercises (codec/Expressions.scala,
    * ops/NativeAggs.scala, ops/Similarity.scala, ops/PageRank.scala):
    *
    *  - abi_decode_buygem / abi_decode_frob — DecodeEvent, DecodeCalldata,
    *    Keccak256 (dispatch), Bytes32ToAscii, ChecksumAddress
    *  - abi_demux_counts — Keccak256 signature index + demux tagging
    *  - maker_wad_ray — RescaleToDouble (Decimal path), decode structs
    *  - maker_rad_extreme — RescaleToDouble (binary path),
    *    UintToDecimalString, IntToDecimalString, wideIntsAsBinary decode
    *  - assets_per_type — Bytes32ToAscii + ray/wad inside the full CTE
    *    chain (registered-SQL surface)
    *  - q06_series_fill — generate_series TVF resolution
    *  - q26_sketches — HLL/quantile sketch aggregates
    *  - events_heavy_discover / events_heavy_verified — CmsAgg,
    *    CmsMergeAgg, CmsEstimate, CmsTotal, MgAgg, MgEstimate
    *  - events_histogram — HistAgg, HistMergeAgg, HistQuantile, HistOor
    *  - store_matview_quantile / store_matview_distinct — sketch
    *    aggregates through the incremental-matview merge path
    *  - dedup_minhash_lsh — MinHashAgg (TypedImperativeAggregate)
    *  - dedup_simhash — SimHashAgg
    *  - graph_triangles — IntersectCountSortedLong (codegen'd adjacency
    *    intersection)
    *  - ann_topk_brute — DotDouble (codegen'd dot product)
    *  - rag_retrieve — hash-embed + sparse cosine composition
    *  - emb_semdedup — centroid/cosine math over array columns
    *  - assets_per_type_verbatim — PgDiv (integral AND float8 branches),
    *    PgEncodeEscape, through the PG front-end's translated text
    */
  private val gates = Seq(
    "abi_decode_buygem", "abi_decode_frob", "abi_demux_counts",
    "maker_wad_ray", "maker_rad_extreme", "assets_per_type",
    "assets_per_type_verbatim",
    "q06_series_fill", "q26_sketches",
    "events_heavy_discover", "events_heavy_verified", "events_histogram",
    "store_matview_quantile", "store_matview_distinct",
    "dedup_minhash_lsh", "dedup_simhash",
    "graph_triangles", "ann_topk_brute", "rag_retrieve", "emb_semdedup")

  test("interpreted eval + AQE + 2 shuffle partitions ≡ default config") {
    val queries = SparkEntry.queries
    val missing = gates.filterNot(queries.contains)
    assert(missing.isEmpty, s"matrix names unknown gates: $missing")

    // default-config truth on the shared session
    val expected = gates.map(n => n -> hashOf(queries(n)(spark, dir))).toMap

    // the variant session: interpreted expressions, AQE on, 2 partitions.
    // newSession() shares the SparkContext but owns its SQL conf, so the
    // overrides cannot leak into other suites.
    val alt = spark.newSession()
    alt.conf.set("spark.sql.codegen.wholeStage", "false")
    alt.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    alt.conf.set("spark.sql.adaptive.enabled", "true")
    alt.conf.set("spark.sql.shuffle.partitions", "2")

    val diverged = gates.flatMap { n =>
      val h = hashOf(queries(n)(alt, dir))
      if (h == expected(n)) None else Some(n)
    }
    assert(diverged.isEmpty,
      s"eval/codegen split: $diverged produced different results under " +
        "NO_CODEGEN + AQE + 2 shuffle partitions")
  }

  test("the variant conf actually disables codegen (guard against a vacuous matrix)") {
    // if a Spark upgrade renames either conf key, the matrix above would
    // silently re-run everything under the DEFAULT config and prove
    // nothing — pin the mechanism: a plan on the variant session must
    // contain no WholeStageCodegen span.
    val alt = spark.newSession()
    alt.conf.set("spark.sql.codegen.wholeStage", "false")
    alt.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val plan = alt.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WholeStageCodegen"),
      "wholeStage=false did not remove codegen spans - conf key drifted?")
    // and the interpreted path must actually run our eval bodies: a
    // custom expression evaluated on the variant session still answers
    graft.codec.GraftFunctions.register(alt)
    val r = alt.sql("SELECT wad(CAST(1500000000000000000 AS DECIMAL(38,0))) AS w")
      .head().getDouble(0)
    assert(r == 1.5)
  }
}
