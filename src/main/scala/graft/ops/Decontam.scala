package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Benchmark decontamination — the training-pipeline step that removes
  * eval-set leakage from the training corpus (SURVEY §7.5 adjunct): a
  * training document is CONTAMINATED when it shares at least one
  * distinct word n-gram with any benchmark document (the exact-match
  * n-gram rule of GPT-3 appendix C / The Pile; n here 5).
  *
  * Scale shape: the corpus side is one shingle pass (map-side,
  * already-proven [[Dedup.shingles]]); the benchmark side is tiny by
  * nature (benchmarks are KBs–MBs against a 100 TB corpus), so its
  * distinct n-gram set broadcasts and the contamination test is a
  * broadcast semi-join fused behind the corpus scan — no shuffle of
  * corpus shingles, no self-join. A zipf-hot n-gram cannot blow up a
  * task: the join is semi (existence), not an expansion.
  */
object Decontam {

  /** (doc_id, contaminated) for every TRAIN doc (`!isEval`), true when
    * the doc shares ≥1 distinct n-gram with the eval set. Each side is
    * shingled exactly once, from its own pre-filtered scan — shingling
    * the full corpus and semi-joining the eval slice out afterwards
    * would tokenize the 100 TB training side twice. */
  def flags(docs: DataFrame, isEval: Column, n: Int = 5): DataFrame = {
    val evalSh = Dedup.shingles(docs.filter(isEval), n)
      .select("sh").distinct()
    val contaminated = Dedup.shingles(docs.filter(!isEval), n)
      .join(evalSh, Seq("sh"), "left_semi")
      .select("doc_id").distinct()
      .withColumn("contaminated", lit(true))
    docs.filter(!isEval).select("doc_id")
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** Gate: docs with doc_id % 10 == 0 play the benchmark set; every
    * other doc is flagged. The fixture's planted near-duplicate pairs
    * straddle the split, so both flag values occur. */
  def decontaminate(s: SparkSession, dir: String): DataFrame =
    flags(Tables.load(s, dir, "documents"),
      pmod(col("doc_id"), lit(10)) === 0)
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontaminate" -> (decontaminate _))

  val oracle: Map[String, String] = Map(
    "decontaminate" -> s"""
      WITH ${Dedup.shingleCtes("documents", 5)},
      evalsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
      contam AS (SELECT DISTINCT doc_id FROM sh
                 WHERE doc_id % 10 <> 0 AND s IN (SELECT s FROM evalsh))
      SELECT d.doc_id, (c.doc_id IS NOT NULL) AS contaminated
      FROM documents d LEFT JOIN contam c ON d.doc_id = c.doc_id
      WHERE d.doc_id % 10 <> 0
      ORDER BY d.doc_id""")
}
