package graft

/** Env-gated (`GRAFT_PROFILE=1`) driver-side micro-profiler for
  * fixed-per-query overhead attribution: the bench's 250+ sub-second
  * queries pay driver-side costs (staleness marker probes, dir
  * fingerprint walks, per-call temp-view DDL) that per-query wall-clock
  * can't decompose. Call sites wrap the suspect paths in [[timed]];
  * Bench resets before its timed loop and dumps the counters (plus
  * per-query Spark job counts) to `BENCH_PROFILE.json`. Disabled, the
  * wrapper is a single static-field branch — nothing on the hot path.
  */
object Profiling {
  val enabled: Boolean = sys.env.contains("GRAFT_PROFILE")

  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  def timed[T](key: String)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      try f
      finally {
        val d = System.nanoTime() - t0
        counters.compute(key, (_, v) => {
          val a = if (v == null) Array(0L, 0L) else v
          a(0) += 1; a(1) += d; a
        })
      }
    }

  def reset(): Unit = counters.clear()

  /** (key, calls, totalSec) sorted by total time desc. */
  def report(): Seq[(String, Long, Double)] = {
    import scala.jdk.CollectionConverters._
    counters.asScala.toSeq
      .map { case (k, a) => (k, a(0), a(1) / 1e9) }
      .sortBy(-_._3)
  }
}
