package graft

/** Box-calibration probe shared by every measurement main (Bench since
  * r18; ManifestCeiling and CommitContention from r19 — VERDICT r18 ask
  * 6): fixed CPU-bound work — a deterministic xorshift fill,
  * single-threaded sort, and hash fold over 4M longs, no Spark, no I/O —
  * run 5×, MINIMUM of the last 4. Min, not median: the probe calibrates
  * the box's best-case single-core speed, and transient contention (a
  * JIT queue, another process) only ever inflates the other statistics.
  *
  * Interpretation rule (the measurement ledger, SCALE.md): numbers are
  * comparable across rounds at EQUAL probe readings; a uniform shift at
  * equal probes is code, at unequal probes it's the box.
  */
object BoxProbe {

  private def once(): Double = {
    val n = 1 << 22
    val a = new Array[Long](n)
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < n) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; a(i) = x; i += 1 }
    val t0 = System.nanoTime()
    java.util.Arrays.sort(a)
    var h = 1L
    i = 0
    while (i < n) { h = h * 31 + a(i); i += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    if (h == 0L) System.err.println("probe: improbable zero fold")
    dt
  }

  /** Seconds for the fixed work: min of the last 4 of 5 runs. */
  def measure(): Double = (0 until 5).map(_ => once()).drop(1).min
}
