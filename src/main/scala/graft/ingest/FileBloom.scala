package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** file_bloom_agg(hash64) → binary: one serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] per group, fed the
  * xxhash64 of the indexed column's values (`putLong`; the probe side
  * calls `mightContainLong` on the same hash — Spark's own
  * runtime-bloom-join pairing). All buffers of one aggregation are
  * created with identical sizing, so partial merges are always
  * compatible. Null inputs (the hash column is NULL exactly when the
  * VALUE was null) are skipped: a bloom answers "might this non-null
  * value be present", never null semantics — that's nullStats' job. */
private[graft] case class FileBloomAgg(child: Expression,
                                       expectedItems: Long,
                                       fpp: Double,
                                       mutableAggBufferOffset: Int = 0,
                                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter = {
    b1.mergeInPlace(b2)
    b1
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(storage))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): FileBloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FileBloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FileBloomAgg =
    copy(child = newChild)
  override def prettyName: String = "file_bloom_agg"
}

/** Per-commit Bloom SIDECAR — the point-probe index family min/max
  * structurally cannot serve: `WHERE tx_hash = '0x…'` over an
  * arrival-ordered store, where every file spans the whole value range
  * but at most one holds the key.
  *
  * Why a sidecar and not a manifest field: a useful bloom is sized by
  * the file's row count (~10 bits/row at 1% fpp — ~1.2 MB for a
  * million-row file), which would bloat the TEXT manifest a thousandfold
  * at warehouse file sizes. The sidecar lives INSIDE its immutable
  * commit directory (`data/<commit>/_blooms/blooms.idx` — the
  * underscore prefix keeps it invisible to every data listing), is
  * written BEFORE the manifest that makes the commit visible, travels
  * with the directory through vacuum's whole-dir reclaim, and is
  * process-cached deserialized exactly like the commit's file statuses.
  *
  * Format: `rel <TAB> col <TAB> base64(bloom)` lines closed by `#end`
  * — an incomplete sidecar (writer crash after data, before manifest:
  * that commit never becomes visible anyway) parses as empty, i.e. no
  * pruning, never a wrong answer. */
private[graft] object BloomSidecar {

  private val Terminator = "#end"

  private def sidecarPath(commitDir: Path): Path =
    new Path(commitDir, "_blooms/blooms.idx")

  /** Deserialized (rel → col → filter) per commit dir, process-cached:
    * published commit dirs are immutable, so one read serves every
    * query in the JVM. Bounded the same way as the status cache. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, Map[String, BloomFilter]]]()

  def cached(key: String, commitDir: Path, fs: FileSystem)
  : Map[String, Map[String, BloomFilter]] = {
    if (cache.size > 256) cache.clear()
    cache.computeIfAbsent(key, _ => load(commitDir, fs))
  }

  private def load(commitDir: Path, fs: FileSystem)
  : Map[String, Map[String, BloomFilter]] =
    try {
      val p = sidecarPath(commitDir)
      if (!fs.exists(p)) return Map.empty
      val in = fs.open(p)
      val text =
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          StandardCharsets.UTF_8)
        finally in.close()
      val lines = text.split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
      if (!lines.lastOption.contains(Terminator)) return Map.empty
      lines.dropRight(1).flatMap { line =>
        line.split('\t') match {
          case Array(rel, col, b64) =>
            try Some((rel, col, BloomFilter.readFrom(new ByteArrayInputStream(
              java.util.Base64.getUrlDecoder.decode(b64)))))
            catch { case scala.util.control.NonFatal(_) => None }
          case _ => None
        }
      }.groupBy(_._1).view.mapValues(
        _.map(t => t._2 -> t._3).toMap).toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** Write one sidecar for a commit: entries are (rel under store root,
    * column, serialized filter). Created exclusively inside the
    * still-unpublished commit dir — no reader can race it. */
  def write(fs: FileSystem, commitDir: Path,
            entries: Seq[(String, String, Array[Byte])]): Unit = {
    if (entries.isEmpty) return
    val body = new StringBuilder
    entries.foreach { case (rel, col, bytes) =>
      body.append(rel).append('\t').append(col).append('\t')
        .append(java.util.Base64.getUrlEncoder.withoutPadding
          .encodeToString(bytes))
        .append('\n')
    }
    body.append(Terminator).append('\n')
    val p = sidecarPath(commitDir)
    val out = fs.create(p, false)
    try out.write(body.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The union of bloom-indexed columns across a set of commit dirs —
    * what [[ManifestStore.compact]] re-indexes so a maintenance rewrite
    * never silently drops the point-probe family. */
  def colsOf(fs: FileSystem, commitDirs: Seq[(String, Path)]): Seq[String] =
    commitDirs.flatMap { case (key, dir) =>
      cached(key, dir, fs).values.flatMap(_.keys)
    }.distinct
}
