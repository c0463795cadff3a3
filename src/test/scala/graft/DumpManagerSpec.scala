package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{DumpAlreadyRunning, DumpManager, DumpStatus, IllegalDumpTransition}

/** Dump lifecycle state machine — direct analog of the reference's only
  * test suite (DumpTrackerSuite.scala:15-262): legal/illegal transitions,
  * per-target exclusivity, UID uniqueness/non-reuse.
  */
class DumpManagerSpec extends AnyFunSuite {
  import DumpStatus._

  test("start → running → finish") {
    val m = new DumpManager
    val uid = m.start("snapshots")
    assert(m.status(uid) === Running)
    assert(m.runningFor("snapshots").contains(uid))
    m.finish(uid)
    assert(m.status(uid) === FinishedSuccessfully)
    assert(m.runningFor("snapshots").isEmpty)
  }

  test("start → abort and start → fail") {
    val m = new DumpManager
    val a = m.start("t1"); m.abort(a); assert(m.status(a) === Aborted)
    val f = m.start("t1"); m.fail(f); assert(m.status(f) === Failed)
  }

  test("unknown uid reports Unknown status") {
    val m = new DumpManager
    assert(m.status("dump-99999999") === Unknown)
  }

  test("illegal transitions throw (finish twice, abort finished, fail unknown)") {
    val m = new DumpManager
    val uid = m.start("t")
    m.finish(uid)
    intercept[IllegalDumpTransition](m.finish(uid))
    intercept[IllegalDumpTransition](m.abort(uid))
    intercept[IllegalDumpTransition](m.fail(uid))
    intercept[IllegalDumpTransition](m.finish("dump-00000042"))
  }

  test("one running dump per target unless force-restart") {
    val m = new DumpManager
    val first = m.start("t")
    val e = intercept[DumpAlreadyRunning](m.start("t"))
    assert(e.uid === first)
    // different target is fine
    m.start("other")
    // force restart aborts the old dump and starts a new one
    val second = m.start("t", forceRestart = true)
    assert(m.status(first) === Aborted)
    assert(m.status(second) === Running)
    assert(m.runningFor("t").contains(second))
  }

  test("uids are unique and never reused after any terminal state") {
    val m = new DumpManager
    val uids = (1 to 20).map { i =>
      val u = m.start(s"t$i")
      i % 3 match {
        case 0 => m.finish(u)
        case 1 => m.abort(u)
        case 2 => m.fail(u)
      }
      u
    }
    assert(uids.distinct.size === uids.size)
    val more = (1 to 20).map(i => m.start(s"t$i"))
    assert((uids ++ more).distinct.size === uids.size + more.size)
  }
}
