package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{DumpAlreadyRunning, DumpManager, DumpRunnerBusy, DumpStatus, IllegalDumpTransition}

/** Dump lifecycle state machine — direct analog of the reference's only
  * test suite (DumpTrackerSuite.scala:15-262), case for case:
  * legal/illegal transitions (full 3-terminal × 3-op matrix), runner-keyed
  * terminal transitions with wrong-runner rejection, per-target AND
  * per-runner exclusivity, UID uniqueness/non-reuse. The reference's
  * "start with a used/duplicate uid" cases (:225-261) are N/A by
  * construction here — uids are generated internally, uniqueness asserted
  * below.
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

  test("full terminal-state matrix: finish/abort/fail each rejected from every terminal state") {
    // reference DumpTrackerSuite :115-205 — 9 illegal cases
    val terminalize: Seq[(String, DumpManager => String => Unit)] = Seq(
      "finished" -> (m => m.finish _),
      "aborted" -> (m => m.abort _),
      "failed" -> (m => m.fail _))
    terminalize.foreach { case (state, toTerminal) =>
      val m = new DumpManager
      val uid = m.start("t")
      toTerminal(m)(uid)
      withClue(s"from $state:") {
        intercept[IllegalDumpTransition](m.finish(uid))
        intercept[IllegalDumpTransition](m.abort(uid))
        intercept[IllegalDumpTransition](m.fail(uid))
      }
    }
  }

  test("not-started dumps cannot be finished, aborted, or failed") {
    // reference :93-112
    val m = new DumpManager
    intercept[IllegalDumpTransition](m.finish("dump-00000042"))
    intercept[IllegalDumpTransition](m.abort("dump-00000042"))
    intercept[IllegalDumpTransition](m.fail("dump-00000042"))
  }

  test("runner-keyed terminal transitions: legal runner succeeds, wrong runner throws") {
    // reference :40-69 — terminal ops are keyed by the runner actor
    def freshRunningDump(): (DumpManager, String) = {
      val m = new DumpManager
      (m, m.start("t", runner = "runner-1"))
    }
    val (m1, u1) = freshRunningDump()
    intercept[IllegalDumpTransition](m1.finishByRunner("runner-2"))
    assert(m1.finishByRunner("runner-1") === u1)
    assert(m1.status(u1) === FinishedSuccessfully)
    val (m2, u2) = freshRunningDump()
    intercept[IllegalDumpTransition](m2.abortByRunner("runner-2"))
    assert(m2.abortByRunner("runner-1") === u2)
    assert(m2.status(u2) === Aborted)
    val (m3, u3) = freshRunningDump()
    intercept[IllegalDumpTransition](m3.failByRunner("runner-2", "message"))
    assert(m3.failByRunner("runner-1", "message") === u3)
    assert(m3.status(u3) === Failed)
  }

  test("one running dump per runner; runner freed by any terminal state") {
    // reference :217-223 — two dumps with one runner
    val m = new DumpManager
    val u = m.start("t1", runner = "r")
    val e = intercept[DumpRunnerBusy](m.start("t2", runner = "r"))
    assert(e.uid === u)
    assert(m.runningOf("r").contains(u))
    m.finishByRunner("r")
    assert(m.runningOf("r").isEmpty)
    // freed runner can start again; abort/fail also free it
    val u2 = m.start("t2", runner = "r"); m.abort(u2)
    val u3 = m.start("t3", runner = "r"); m.fail(u3)
    assert(m.runningOf("r").isEmpty)
    m.start("t4", runner = "r")
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
