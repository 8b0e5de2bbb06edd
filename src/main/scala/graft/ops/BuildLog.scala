package graft.ops

/** Run registry of one-time artifact build wall-times (round-11 agenda
  * #2: CAUSAL cold-cost attribution).
  *
  * The bench's cold-cost budget is Σ max(0, p1−p2) per query — a sound
  * TOTAL, but an inferred attribution: any p1 inflation below the
  * per-query contention floor (host noise, a draining load) books as
  * "build cost" against whatever query it landed on (r10: `customers_rfm`
  * carried a 10.7 s "cold build" it cannot have — it builds no artifact —
  * and host weather alone pushed the inferred total within 11% of the
  * ceiling). The fix is causal evidence: every artifact build site
  * records its ACTUAL wall time here — [[AnnIndex.publishAtomically]]
  * (the shared funnel for TruthCache tables and ANN inverted lists, which
  * knows whether it really wrote or found the artifact published),
  * [[IvfModel.trainedOrLoad]]'s train-miss path, and the persisted-index
  * builders ([[LshIndex.append]], [[ExactIndex.append]],
  * [[IvfIndex.build]]). The bench drains the registry per pass and gates
  * the cold ceiling on NAMED builds only; the remainder is reported as
  * `unattributed` (noise) instead of tripping the gate.
  *
  * Thread-safe and allocation-light: builds are rare (tens per run) and
  * seconds-long, so a ConcurrentLinkedQueue is free at any concurrency. */
object BuildLog {

  private val q =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()

  /** Record `seconds` of build wall time under `name`. */
  def record(name: String, seconds: Double): Unit = q.add((name, seconds))

  /** Time `body` and record it under `name`. Records on failure too —
    * a crashed 30 s build still burned 30 s of pass-1 wall. */
  def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally record(name, (System.nanoTime() - t0) / 1e9)
  }

  /** Drain all recorded builds, summed per name, descending by cost.
    * Draining (not peeking) lets the bench attribute per PASS. */
  def drain(): Seq[(String, Double)] = {
    val out = scala.collection.mutable.Map.empty[String, Double]
    var e = q.poll()
    while (e != null) {
      out(e._1) = out.getOrElse(e._1, 0.0) + e._2
      e = q.poll()
    }
    out.toSeq.sortBy(-_._2)
  }
}
