package graft.util

/** Shared driver-side job-overlap helper (guide §2.6 / ADVICE r16).
  *
  * One definition of the settle-then-rethrow policy that was
  * previously re-inlined at three sites (Pipeline.awaitSettled,
  * Dedup.saveLshIndex, Streams.stageOrderedBatches): run independent
  * Spark jobs concurrently and wait for ALL of them to SETTLE before
  * returning. A fail-fast Await(Future.sequence) would unwind the
  * caller — unpersisting or deleting the very frames sibling jobs are
  * still reading — while those jobs run, leaving nondeterministic
  * partial state. Here every job runs to completion, then the first
  * failure (if any) rethrows.
  */
object Concurrency {
  import scala.concurrent.{blocking, Await, Future}
  import scala.concurrent.ExecutionContext.Implicits.global

  /** Run `jobs` concurrently on the global pool; return only after
    * every job settled; rethrow the first failure. Each body is
    * wrapped in `blocking` (ADVICE r16): the jobs hold their thread
    * through a full Spark action, and without the marker a batch of
    * jobs near the fixed-size global pool's width starves anything
    * else sharing it — `blocking` lets the pool compensate with extra
    * threads for the duration. */
  def awaitSettled(jobs: Seq[() => Unit]): Unit = {
    val settled = Await.result(
      Future.sequence(jobs.map(f => Future(blocking(scala.util.Try(f()))))),
      scala.concurrent.duration.Duration.Inf)
    settled.collectFirst { case scala.util.Failure(e) => throw e }: Unit
  }
}
