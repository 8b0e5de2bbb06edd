package graft.ingest

import org.apache.spark.sql.SparkSession

/** Process-wide cache of (store root → current manifest version) for
  * freshness probes (round-15 agenda #6).
  *
  * [[MatViewRouter]] must re-check every registered view's source
  * version at OPTIMIZATION time — but a directory listing per
  * registered view per optimizer invocation multiplies out: hundreds
  * of views × fixedPoint re-invocations × every query in the session,
  * each a round-trip on object storage. The cache bounds that to one
  * listing per root per TTL window, with two invalidation paths:
  *
  *  - IN-PROCESS COMMITS invalidate immediately:
  *    [[ManifestStore.commitWith]] calls [[invalidate]] after every
  *    published version, so a local writer's commit is visible to the
  *    very next freshness probe — no TTL wait, no stale routing from
  *    our own writes.
  *  - EXTERNAL writers (another driver committing to the same store)
  *    are bounded by the TTL: a view can answer from a snapshot at
  *    most [[ttlMs]] old — the same staleness contract every
  *    metadata-cached table format (Delta, Iceberg) exposes, and far
  *    tighter than the view itself (which is only as fresh as its
  *    last refresh anyway).
  */
object ManifestVersionCache {

  private final case class Probe(version: Long, atNanos: Long)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Probe]()

  /** Probe TTL. Volatile so tests can tighten/disable it; 10 s default
    * — freshness probes are per-query planning, commits are seconds to
    * minutes apart. */
  @volatile var ttlMs: Long = 10000L

  /** Cache-internal key: trailing-slash-insensitive so a store built
    * with "dir/" and a probe with "dir" agree. */
  private def keyOf(root: String): String =
    if (root.length > 1 && root.endsWith("/")) root.dropRight(1) else root

  /** Listing + probe counters, exposed so the bench can measure
    * optimizer overhead (probes served vs listings paid). */
  private val listingsDone = new java.util.concurrent.atomic.AtomicLong
  private val probesServed = new java.util.concurrent.atomic.AtomicLong
  def listings: Long = listingsDone.get
  def probes: Long = probesServed.get

  /** The store's current manifest version — cached, one real listing
    * per root per TTL window. */
  def version(spark: SparkSession, root: String): Long = {
    probesServed.incrementAndGet()
    val k = keyOf(root)
    val now = System.nanoTime()
    val hit = cache.get(k)
    if (hit != null && (now - hit.atNanos) / 1000000L < ttlMs) hit.version
    else {
      listingsDone.incrementAndGet()
      val v = new ManifestStore(root).currentVersion(spark)
      cache.put(k, Probe(v, now))
      v
    }
  }

  /** Drop a root's cached probe (called from every in-process commit). */
  def invalidate(root: String): Unit = cache.remove(keyOf(root))

  /** Tests: forget everything. */
  def clear(): Unit = cache.clear()
}
