package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.fixtures.MakerFixtures
import graft.ingest.Demux
import graft.streaming.ChainStream
import graft.ops.Multimodal

final case class RawLog(address: Array[Byte], topics: Seq[Array[Byte]],
                        data: Array[Byte], block_number: Long,
                        block_hash: Array[Byte], log_index: Int,
                        transaction_index: Int, transaction_hash: Array[Byte])

class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("streaming decode = batch decode (same code path, two triggers)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    MakerFixtures.ensure(spark)
    val raw = spark.read.parquet(MakerFixtures.rawLogsPath).as[RawLog].collect()
    val frobDef = MakerFixtures.tableDef("vat_call_frob")

    val stream = MemoryStream[RawLog]
    val q = ChainStream.decodedTable(stream.toDF(), frobDef)
      .writeStream.format("memory").queryName("frob_stream")
      .outputMode("append").start()
    val (first, rest) = raw.splitAt(700)
    stream.addData(first.toIndexedSeq)
    q.processAllAvailable()
    stream.addData(rest.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("frob_stream").count()
    val batch = Demux.table(spark.read.parquet(MakerFixtures.rawLogsPath), frobDef).count()
    assert(streamed == batch)
    assert(batch == 800)
  }

  test("windowed volume with watermark emits bounded-state aggregates") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    MakerFixtures.ensure(spark)
    val raw = spark.read.parquet(MakerFixtures.rawLogsPath).as[RawLog].collect()
    val buyDef = MakerFixtures.tableDef("psm_evt_buygem")

    val stream = MemoryStream[RawLog]
    val windowed = ChainStream.windowedVolume(
      ChainStream.decodedTable(stream.toDF(), buyDef), "value")
    val q = windowed.writeStream.format("memory").queryName("vol_stream")
      .outputMode("complete").start()
    stream.addData(raw.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val streamRows = spark.table("vol_stream").count()
    val batchRows = ChainStream.windowedVolume(
      Demux.table(spark.read.parquet(MakerFixtures.rawLogsPath), buyDef), "value").count()
    assert(streamRows == batchRows)
    assert(streamRows > 0)
  }
}

class MultimodalSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("feature extraction: deterministic, fixed-dim, batch-shaped") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 200))
      .collect().sortBy(_.media_id)
    assert(feats.length == 200)
    assert(feats.forall(_.features.length == 16))
    // deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 200))
      .collect().sortBy(_.media_id)
    assert(feats.zip(again).forall { case (a, b) =>
      a.features.sameElements(b.features) && a.feature_norm == b.feature_norm })
  }

  test("frame sampling strides the payload") {
    val frames = Multimodal.sampleFrames(Multimodal.syntheticMedia(spark, 100))
      .collect()
    assert(frames.nonEmpty)
    // only every 4th frame index kept
    assert(frames.forall(_.getInt(1) % 4 == 0))
  }
}
