package graft.util

import java.util.concurrent.atomic.AtomicLong

/** Accumulates the wall-clock a gate spends in its MODEL-EXPORT stage
  * (the [[graft.sim.ModelStore.save]] writes the r13 exported-model
  * oracles added — fit + parquet write), so [[graft.Bench]] can report
  * per-query `export_s` next to the total and a judge can see whether a
  * regression sits in the operator or in the gate-only export overhead
  * (VERDICT r13 item 2: the r12→r13 in-tree total grew 29% purely from
  * in-gate export work).
  *
  * A process-global counter, not a per-thread one, on purpose: the
  * export jobs are Spark actions whose work spans executor threads, but
  * the SAVE CALL itself runs on Bench's single driver loop thread, and
  * Bench resets before each query — so attribution to the in-flight
  * query is exact for the driver-loop protocol. Concurrent gate runs
  * (not a Bench mode) would merely pool their export time here.
  */
object GateTimer {
  private val exportNanos = new AtomicLong(0L)

  /** Zero the accumulator — Bench calls this before each timed query. */
  def reset(): Unit = exportNanos.set(0L)

  /** Seconds accumulated since the last [[reset]]. */
  def exportSeconds: Double = exportNanos.get() / 1e9

  /** Run `body`, adding its wall-clock to the export accumulator. */
  def timeExport[T](body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally { exportNanos.addAndGet(System.nanoTime() - t0); () }
  }
}
