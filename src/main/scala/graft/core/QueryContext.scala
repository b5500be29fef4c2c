package graft.core

/** Per-request cancellation checkpoints — the engine-side half of the
  * reference's `validateQueryContext` (`reference/executor.go:8165-8180`),
  * which every executor section polls so a cancelled or deadline-expired
  * request stops BETWEEN calls, not just inside one (`executor.go:193,251,
  * 270,545,683,1783`). Spark already aborts the *running jobs* of a killed
  * request (job-group cancellation interrupts task threads); this hook
  * covers the driver-side gaps — the next call of a multi-call PQL program
  * would otherwise start fresh jobs after the one-shot group cancel.
  *
  * The serving facade installs a checker for the request's lifetime; query
  * loops call [[validate]] at their call boundaries. Outside a request the
  * check is a no-op, so library users never pay or see it.
  */
object QueryContext {
  private val noop: () => Unit = () => ()
  private val tl = new ThreadLocal[() => Unit] {
    override def initialValue(): () => Unit = noop
  }

  /** Run `f` with `check` active on this thread (restores the previous
    * checker after — nested requests compose). */
  def install[A](check: () => Unit)(f: => A): A = {
    val prev = tl.get()
    tl.set(check)
    try f finally tl.set(prev)
  }

  /** Throws if the current request was cancelled or timed out; no-op when
    * no checker is installed. Call at call/statement boundaries. */
  def validate(): Unit = tl.get()()
}
