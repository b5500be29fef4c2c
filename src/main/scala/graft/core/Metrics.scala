package graft.core

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import scala.jdk.CollectionConverters._

/** Process-wide performance counters — the reference's `metrics.go` +
  * `performancecounters.go`: named monotonic counters under the `pilosa`
  * prometheus namespace, scraped from `GET /metrics` in Prometheus text
  * format and queryable through the `fb_performance_counters` system table
  * (`reference/sql3/planner/opsystemtable.go:271-303` schema: nodeid,
  * namespace, subsystem, counter_name, value, counter_type).
  *
  * Counter names below mirror `reference/metrics.go:8-58`. A `LongAdder`
  * per counter keeps the hot path contention-free (facade handlers run on
  * a thread pool); gauges for process health are sampled at scrape time.
  */
object Metrics {

  // reference/metrics.go names used by the serving surfaces here
  val SqlQueries       = "sql_queries_total"
  val PqlQueries       = "pql_queries_total"
  val SetBit           = "set_bit_total"
  val ClearBit         = "clear_bit_total"
  val ImportedN        = "imported_total"
  val CreateIndex      = "create_index_total"
  val DeleteIndex      = "delete_index_total"
  val CreateField      = "create_field_total"
  val DeleteField      = "delete_field_total"
  val RecalculateCache = "recalculate_cache_total"
  val TransactionStart = "transaction_start"
  val TransactionEnd   = "transaction_end"
  val HttpRequest      = "http_request_total"
  // flat-counter form of the reference's slow="true" label on its
  // http_requests duration summary (metrics.go:185-195, collectStats)
  val SlowQuery        = "http_request_slow_total"

  private val counters = new ConcurrentHashMap[String, LongAdder]

  def inc(name: String): Unit = add(name, 1L)
  def add(name: String, n: Long): Unit =
    counters.computeIfAbsent(name, _ => new LongAdder).add(n)

  def get(name: String): Long =
    Option(counters.get(name)).map(_.sum()).getOrElse(0L)

  /** Counter rows, sorted by name (counter_type 0 = CTR_TYPE_RAW,
    * `reference/performancecounters.go:20-39`). */
  def snapshot: Seq[(String, Long)] =
    counters.asScala.map { case (k, v) => k -> v.sum() }.toSeq.sortBy(_._1)

  /** Process gauges (`metrics.go:41-46` goroutines/open_files/heap_alloc
    * analogues on the JVM). */
  def gauges: Seq[(String, Long)] = {
    val threads = Thread.activeCount().toLong
    val open = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case u: com.sun.management.UnixOperatingSystemMXBean =>
        u.getOpenFileDescriptorCount
      case _ => 0L
    }
    val heap = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage
    Seq(
      "goroutines" -> threads, // JVM threads; name kept for scrape parity
      "open_files" -> open,
      // Go HeapAlloc ≈ live object bytes → JVM used; HeapInuse ≈ bytes in
      // in-use spans → JVM used is the closest pressure-tracking analogue
      // (committed would read as a flat line unrelated to usage)
      "heap_alloc" -> heap.getUsed,
      "heap_inuse" -> heap.getUsed,
      "heap_committed" -> heap.getCommitted)
  }

  /** Prometheus text exposition (the `promhttp.Handler` output shape the
    * reference mounts at `/metrics`, `reference/http_handler.go:495`). */
  def prometheus: String = {
    val sb = new StringBuilder
    snapshot.foreach { case (name, v) =>
      sb.append(s"# TYPE pilosa_$name counter\n")
      sb.append(s"pilosa_$name $v\n")
    }
    gauges.foreach { case (name, v) =>
      sb.append(s"# TYPE pilosa_$name gauge\n")
      sb.append(s"pilosa_$name $v\n")
    }
    sb.toString
  }

  /** Reset all counters — test isolation only. */
  private[graft] def reset(): Unit = counters.clear()
}
