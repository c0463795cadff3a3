package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ErrorBudget, Supervised}

/** Failure-budget semantics — znap H2 (reference
  * utils/TimePeriodEventTracker.scala:18-44: ≤N events per trailing
  * period; exceed → escalate).
  */
class ErrorBudgetSpec extends AnyFunSuite {

  test("budget allows up to maxEvents within the period, trips after") {
    val b = new ErrorBudget(3, 60000L)
    assert(!b.register(0L))
    assert(!b.register(1000L))
    assert(!b.register(2000L))
    assert(b.register(3000L)) // 4th within 60 s → exceeded
  }

  test("events outside the trailing period are forgotten") {
    val b = new ErrorBudget(3, 60000L)
    assert(!b.register(0L))
    assert(!b.register(1000L))
    assert(!b.register(2000L))
    // 61 s later: the first three fell out of the window
    assert(!b.register(63000L))
    assert(b.count === 1)
  }

  test("supervised run: restarts within budget, gives up beyond it") {
    var now = 0L
    val clock = () => { now += 1000L; now }
    var attempts = 0
    // succeeds on 3rd attempt, budget 3/min → Right
    val ok = Supervised.run(new ErrorBudget(3, 60000L), clock) { () =>
      attempts += 1
      if (attempts < 3) throw new RuntimeException("transient")
      "done"
    }
    assert(ok === Right("done"))
    // always fails, budget 2/min → Left after 3rd failure
    var n = 0
    val bad = Supervised.run(new ErrorBudget(2, 60000L), clock) { () =>
      n += 1; throw new RuntimeException(s"boom$n")
    }
    assert(bad.isLeft && n === 3)
  }
}
