package graft.ops

import scala.collection.mutable

/** Sliding-window failure budget — znap H2 (reference:
  * utils/TimePeriodEventTracker.scala:18-44; budgets "3 source failures
  * per minute / 3 pipeline failures per hour",
  * application.conf:111-121, PipelineManager.scala:35-38,76-102).
  *
  * Used by the driver-side restart loop around
  * `StreamingQuery.awaitTermination`: restart while within budget, crash
  * the job (non-zero exit) when exceeded — same escalation the reference
  * performs via its supervision strategy.
  */
final class ErrorBudget(maxEvents: Int, periodMs: Long) {
  private val times = mutable.Queue[Long]()

  /** Register a failure at time `tMs` (caller-supplied clock for
    * determinism). Returns true iff the budget is EXCEEDED — i.e. more
    * than maxEvents failures within the trailing period.
    */
  def register(tMs: Long): Boolean = synchronized {
    times.enqueue(tMs)
    while (times.nonEmpty && times.head <= tMs - periodMs) { times.dequeue(); () }
    times.size > maxEvents
  }

  def count: Int = synchronized(times.size)
}

/** Restart-with-budget supervisor for streaming queries (znap
  * PipelineManager restart policy, reference :63-103).
  */
object Supervised {
  /** Run `body` repeatedly until it succeeds or the failure budget is
    * exceeded; returns Right(result) or Left(last error).
    */
  def run[A](budget: ErrorBudget, clock: () => Long)(body: () => A): Either[Throwable, A] = {
    while (true) {
      try return Right(body())
      catch {
        case e: Throwable =>
          if (budget.register(clock())) return Left(e)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
