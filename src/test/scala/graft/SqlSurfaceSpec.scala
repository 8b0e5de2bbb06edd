package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.codec.GraftFunctions
import graft.ops.{Curation, Dedup}

/** SQL-surface access to the curation family (round-12 verdict stretch
  * #8): the `sql_curation` gate runs the full quality → dedup → budget
  * pipeline through `spark.sql` alone, and the registered sketch
  * functions (`minhash_agg`, `simhash_agg`) reproduce the Scala API's
  * values from SQL text — a warehouse user needs no Scala to curate. */
class SqlSurfaceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("sql_curation: every stage non-vacuous, budget prefix correct") {
    val out = Curation.sqlCuration(spark, dir).collect()
    assert(out.nonEmpty)
    // the budget cut keeps at most half the surviving corpus' words,
    // and the kept set is a doc_id-ordered prefix
    val ids = out.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted)
    // stage counts: quality classes all fire, dedup removes the planted
    // copies (every doc_id % 3 == 0 re-appears shifted by 1e6)
    Tables.registerAll(spark, dir)
    val verdicts = spark.sql("""
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0),
      metrics AS (
        SELECT doc_id, text,
          size(filter(split(text, ' '), w -> w <> '')) AS n_words,
          size(filter(split(lower(text), ' '),
            w -> w IN ('the','be','to','of','and','a','in','that'))) AS n_stop
        FROM docs)
      SELECT CASE WHEN n_words < 20 THEN 'too_short'
                  WHEN n_stop * 25 < n_words THEN 'few_stopwords'
                  ELSE 'ok' END AS verdict, COUNT(*) AS n
      FROM metrics GROUP BY 1""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(verdicts.keySet == Set("too_short", "few_stopwords", "ok"),
      s"a quality class never fires: $verdicts")
    // planted duplicates exist among 'ok' docs and none survive dedup
    assert(!ids.exists(_ >= 1000000L),
      "a planted duplicate survived the SQL dedup stage")
  }

  test("SQL minhash_agg over SQL-built shingles equals the Scala API signature") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, dir)
    // shingles via SQL HOFs (3-gram sliding windows, distinct), then the
    // registered sketch aggregate — zero Scala API in the query text
    val viaSql = spark.sql("""
      WITH sh AS (
        SELECT doc_id, explode(array_distinct(transform(
          sequence(0, size(split(text, ' ')) - 3),
          i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3))))) AS sh
        FROM documents WHERE size(split(text, ' ')) >= 3)
      SELECT doc_id, minhash_agg(CAST(hash(sh) AS BIGINT)) AS mins
      FROM sh GROUP BY doc_id""")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaApi = Dedup.minhash(
      Dedup.shingles(Tables.load(spark, dir, "documents")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql.keySet == viaApi.keySet)
    assert(viaSql == viaApi, "SQL minhash signatures diverge from the API")
    assert(viaSql.valuesIterator.next().size == Dedup.NumHashes)
  }
}
