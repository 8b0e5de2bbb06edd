package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, LshIndex}
import graft.streaming.CorpusStream

case class StreamDoc(doc_id: Long, text: String, lang: String)

/** Streaming near-dup-filtered corpus ingestion: survivors match a
  * sequential reference over the brute-jaccard truth, the documented
  * bridge semantics hold, and replayed batch commits are no-ops. */
class CorpusStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cstream_$tag").toString

  test("streamed survivors equal a sequential per-batch reference") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.load(spark, dir, "documents")
    val rows = docs.select("doc_id", "text", "lang").as[StreamDoc]
      .collect().sortBy(_.doc_id)
    // brute ground truth over the whole corpus (deterministic fixture)
    val truth = Dedup.jaccardPairs(Dedup.shingles(docs), 0.7)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)

    // sequential reference: process batches in id order; per batch, form
    // components over truth pairs among (batch ∪ kept-so-far) touching
    // the batch, keep batch docs that are their component's minimum
    val batches = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
    var kept = Vector.empty[Long]
    batches.foreach { batch =>
      val ids = batch.map(_.doc_id)
      val inScope = (ids ++ kept).toSet
      val edges = truth.filter { case (i, j) =>
        inScope(i) && inScope(j) && (ids.contains(i) || ids.contains(j))
      }
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (i, j) =>
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
      kept = kept ++ ids.filter(d => find(d) == d)
    }

    val indexRoot = tmp("seq") + "/index"
    val corpus = new graft.ingest.ManifestStore(tmp("seq") + "/corpus")
    val stream = MemoryStream[StreamDoc]
    val q = CorpusStream.dedupIngestStream(stream.toDF(), indexRoot, corpus,
      tmp("seq") + "/ckpt", 0.7)
    batches.foreach { b => stream.addData(b.toIndexedSeq); q.processAllAvailable() }
    q.stop()

    val stored = corpus.read(spark).get
    val storedIds = stored.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(storedIds == kept.toSet,
      s"streamed=$storedIds reference=${kept.toSet}")
    assert(storedIds.size < rows.length) // something was actually dropped
    // payload columns flow through untouched
    val langs = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    stored.select("doc_id", "lang").collect()
      .foreach(r => assert(langs(r.getLong(0)) == r.getString(1)))
  }

  test("mid-stream maintenance (compact + vacuum) changes no survivor decision") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.load(spark, dir, "documents")
    val rows = docs.select("doc_id", "text", "lang").as[StreamDoc]
      .collect().sortBy(_.doc_id)
    val batches = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq

    def runStream(tag: String, maintainEvery: Int): Set[Long] = {
      val root = tmp(tag)
      val corpus = new graft.ingest.ManifestStore(s"$root/corpus")
      val stream = MemoryStream[StreamDoc]
      val q = CorpusStream.dedupIngestStream(stream.toDF(), s"$root/index",
        corpus, s"$root/ckpt", 0.7, maintainEvery = maintainEvery)
      batches.foreach { b => stream.addData(b.toIndexedSeq); q.processAllAvailable() }
      q.stop()
      corpus.read(spark).get.select("doc_id").collect().map(_.getLong(0)).toSet
    }

    val plain = runStream("maint_off", 0)
    val maintained = runStream("maint_on", 1)
    assert(maintained == plain && plain.nonEmpty,
      "maintenance between batches must not change survivor decisions")
  }

  test("bridge doc drops without retracting earlier survivors") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 102 shared tokens → doc C (their 80-shingle prefix chain) has
    // jaccard 0.8 with A and with B, while A and B overlap at 80/120 =
    // 0.667 < 0.7: C transitively links A and B but neither is a direct
    // dup of the other
    val w = (1 to 102).map(i => s"w$i")
    val a = StreamDoc(1L, w.mkString(" "), "en")
    val b = StreamDoc(2L, (w.take(82) ++ (1 to 20).map(i => s"x$i")).mkString(" "), "en")
    val c = StreamDoc(3L, w.take(82).mkString(" "), "en")

    val indexRoot = tmp("bridge") + "/index"
    val corpus = new graft.ingest.ManifestStore(tmp("bridge") + "/corpus")
    val stream = MemoryStream[StreamDoc]
    val q = CorpusStream.dedupIngestStream(stream.toDF(), indexRoot, corpus,
      tmp("bridge") + "/ckpt", 0.7)
    Seq(a, b, c).foreach { d => stream.addData(d); q.processAllAvailable() }
    q.stop()

    // A kept (first), B kept (0.667 < threshold vs A), the late bridge C
    // dies against both — already-appended survivors are never retracted
    val ids = corpus.read(spark).get.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L), s"got $ids")
  }

  test("curated stream: quality first, sampling last, index blocks sampled-out survivors") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // all docs lang fr (rate 25). Knuth draws: d(1)=61, d(3)=87, d(5)=17,
    // d(35)=19 — so doc 1 is a SURVIVOR the sampler drops from the
    // corpus, doc 5 samples in, doc 35 would sample in (19 < 25) and can
    // only be absent if the INDEX (fed pre-sample) deduped it against 1
    val w = (1 to 102).map(i => s"q$i")
    val good1 = StreamDoc(1L, w.mkString(" "), "fr")
    val spam3 = StreamDoc(3L, Seq.fill(300)("spam").mkString(" "), "fr")
    val good5 = StreamDoc(5L, (1 to 102).map(i => s"z$i").mkString(" "), "fr")
    // exact copy of good5 in the SAME batch: the md5 front must collapse
    // it before LSH (its draw is irrelevant — it dies pre-sample)
    val copy7 = StreamDoc(7L, good5.text, "fr")
    // 82-token prefix: jaccard 0.8 with doc 1 (the bridge-test shape)
    val near35 = StreamDoc(35L, w.take(82).mkString(" "), "fr")

    val indexRoot = tmp("curated") + "/index"
    val corpus = new graft.ingest.ManifestStore(tmp("curated") + "/corpus")
    val stream = MemoryStream[StreamDoc]
    val q = CorpusStream.curatedIngestStream(stream.toDF(), indexRoot, corpus,
      tmp("curated") + "/ckpt", 0.7)
    stream.addData(good1, spam3, good5, copy7); q.processAllAvailable()
    stream.addData(near35); q.processAllAvailable()
    q.stop()

    val ids = corpus.read(spark).get.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // 1: survived dedup, sampled out (draw 61 >= 25)
    // 3: quality-rejected (too_repetitive) before it could touch the index
    // 5: survived everything (draw 17 < 25)
    // 7: in-batch exact dup of 5, collapsed by the md5 front
    // 35: dropped by DEDUP against the indexed-but-unsampled doc 1 —
    //     sampling alone would have kept it (draw 19 < 25)
    assert(ids == Set(5L), s"got $ids")
  }

  test("replayed batch commits are no-ops (exactly-once under restart)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "lang").as[StreamDoc].collect().take(20)
    val indexRoot = tmp("replay") + "/index"
    val corpusRoot = tmp("replay") + "/corpus"
    val corpus = new graft.ingest.ManifestStore(corpusRoot)
    val stream = MemoryStream[StreamDoc]
    val q = CorpusStream.dedupIngestStream(stream.toDF(), indexRoot, corpus,
      tmp("replay") + "/ckpt", 0.7)
    stream.addData(docs.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val before = corpus.read(spark).get.count()
    // a restart can re-deliver batch 0; both appends carry its commit
    // key, so re-committing changes nothing
    val survivors = CorpusStream.batchSurvivors(
      docs.toSeq.toDF("doc_id", "text", "lang"), indexRoot, 0.7)
    corpus.append(spark, survivors, commitKey = Some("corpus-batch-0"))
    LshIndex.append(survivors, indexRoot, commitKey = Some("index-batch-0"))
    assert(corpus.read(spark).get.count() == before)
  }

  test("exactFirst: re-ingests drop on the exact stage, even sub-shingle docs") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // distinct long docs (no near-dups) + one 2-token doc: too short for
    // the 3-gram shingles, so LSH can NEVER pair it — only the exact
    // stage can catch its re-ingest
    def long(i: Long) = StreamDoc(i,
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i", "en")
    val batch1 = Seq(long(1), long(2), StreamDoc(3, "tiny doc", "en"))
    val batch2 = Seq( // exact re-ingests under NEW ids + one new doc
      long(11).copy(text = long(1).text),
      StreamDoc(13, "tiny doc", "en"),
      long(14))

    def run(exactFirst: Boolean): Set[Long] = {
      val root = tmp(s"exact$exactFirst")
      val corpus = new graft.ingest.ManifestStore(root + "/corpus")
      val stream = MemoryStream[StreamDoc]
      val q = CorpusStream.dedupIngestStream(stream.toDF(), root + "/index",
        corpus, root + "/ckpt", 0.7, exactFirst = exactFirst)
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
      q.stop()
      corpus.read(spark).get.select("doc_id").collect().map(_.getLong(0)).toSet
    }

    // exact stage: both re-ingests (long AND sub-shingle) dropped
    assert(run(exactFirst = true) == Set(1L, 2L, 3L, 14L))
    // LSH-only: the long re-ingest drops (jaccard 1.0) but the
    // sub-shingle copy is invisible to banding and gets admitted —
    // the documented semantic difference
    assert(run(exactFirst = false) == Set(1L, 2L, 3L, 13L, 14L))
  }

  test("exactFirst maintenance consolidates blooms without changing decisions") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("exactmaint")
    val corpus = new graft.ingest.ManifestStore(root + "/corpus")
    val stream = MemoryStream[StreamDoc]
    val q = CorpusStream.dedupIngestStream(stream.toDF(), root + "/index",
      corpus, root + "/ckpt", 0.7, maintainEvery = 2, exactFirst = true)
    def doc(i: Long) = StreamDoc(i,
      s"one$i two$i three$i four$i five$i six$i seven$i", "en")
    (0L to 4L).foreach { b =>
      stream.addData(Seq(doc(b * 10), doc(b * 10 + 1)))
      q.processAllAvailable()
    }
    // batches 2 and 4 ran consolidate+vacuum; re-ingest everything —
    // the consolidated bloom must still see every survivor
    stream.addData((0L to 4L).flatMap(b =>
      Seq(doc(b * 10).copy(doc_id = 100 + b), // same text, new id
        doc(b * 10 + 1).copy(doc_id = 200 + b))))
    q.processAllAvailable()
    q.stop()
    val ids = corpus.read(spark).get.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == (0L to 4L).flatMap(b => Seq(b * 10, b * 10 + 1)).toSet,
      s"got $ids")
    // consolidation actually retired the per-batch blooms
    val bloomDir = new java.io.File(s"$root/index/exact/bloom")
    val blooms = bloomDir.listFiles((_, n) =>
      n.startsWith("bloom-") && n.endsWith(".bin"))
    assert(blooms.length <= 3, // consolidated + at most the appends since
      s"expected consolidation to retire old blooms, found ${blooms.length}")
  }

  test("streaming label maintenance equals the offline batch labeling") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.load(spark, dir, "documents")
    val rows = docs.select("doc_id", "text", "lang").as[StreamDoc]
      .collect().sortBy(_.doc_id)
    val root = tmp("labels")
    val corpus = new graft.ingest.ManifestStore(s"$root/corpus")
    val labels = new graft.ingest.ManifestStore(s"$root/labels")
    val stream = MemoryStream[StreamDoc]
    val q = CorpusStream.labeledIngestStream(stream.toDF(), s"$root/index",
      corpus, labels, s"$root/ckpt", 0.7)
    rows.grouped(math.max(1, rows.length / 3 + 1))
      .foreach { b => stream.addData(b.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    // nothing dropped: the labeled mode admits everything
    assert(corpus.read(spark).get.count() == rows.length.toLong)
    val live = labels.read(spark).get.select("doc_id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the maintained table must be indistinguishable from the offline
    // full-corpus labeling (same threshold, same LSH edge semantics)
    val offline = graft.ops.Components.dedupComponents(spark, dir)
      .select("doc_id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(live == offline,
      s"diverging labels: ${(live.toSet -- offline.toSet).take(5)} vs " +
        s"${(offline.toSet -- live.toSet).take(5)}")
  }
}
