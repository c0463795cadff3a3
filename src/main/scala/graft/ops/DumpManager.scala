package graft.ops

/** Dump lifecycle state machine — the one component the reference actually
  * tests (DumpTrackerSuite, 27 cases) — re-expressed as a plain driver-side
  * registry (reference: dumps/DumpManager.scala:36-115,
  * dumps/DumpTracker.scala:13-87, states dumps/package.scala:13-18).
  *
  * Semantics preserved:
  *  - one running dump per target unless force-restart;
  *  - one running dump per RUNNER (reference DumpTracker keys terminal
  *    transitions by the runner actor: DumpTracker.scala:44-63);
  *  - terminal transitions reported by a runner are validated against the
  *    runner that started the dump (wrong/unknown runner throws);
  *  - states Unknown / Running / FinishedSuccessfully / Aborted / Failed;
  *  - illegal transitions throw;
  *  - dump UIDs are unique and never reused, even after terminal states.
  *    (The reference's "start with a used uid throws" cases are N/A here:
  *    uids are generated internally, so collision is impossible by
  *    construction — asserted by the uniqueness spec.)
  *
  * In the Spark engine a "dump" wraps a batch job over the snapshot table
  * (Replay.dump); cancellation maps to sparkContext.cancelJobGroup(uid).
  */
object DumpStatus extends Enumeration {
  val Unknown, Running, FinishedSuccessfully, Aborted, Failed = Value
}

final class IllegalDumpTransition(msg: String) extends IllegalStateException(msg)
final class DumpAlreadyRunning(val target: String, val uid: String)
    extends IllegalStateException(s"dump $uid already running for $target")
final class DumpRunnerBusy(val runner: String, val uid: String)
    extends IllegalStateException(s"runner $runner already runs dump $uid")

final class DumpManager {
  import DumpStatus._

  private var nextId = 0L
  private val statusByUid = scala.collection.mutable.Map[String, DumpStatus.Value]()
  private val targetByUid = scala.collection.mutable.Map[String, String]()
  private val runnerByUid = scala.collection.mutable.Map[String, String]()
  private val runningByTarget = scala.collection.mutable.Map[String, String]()
  private val runningByRunner = scala.collection.mutable.Map[String, String]()

  /** Start a dump for `target`, optionally bound to a `runner` (the
    * executing job/thread identity). Rejects if one is running for the
    * target (unless forceRestart, which aborts the old one) or if the
    * runner already runs a dump, mirroring DumpManager.startDump
    * (reference :62-100) + DumpTracker.dumpStarted (reference :24-38).
    */
  def start(target: String, forceRestart: Boolean = false,
      runner: String = ""): String = synchronized {
    runningByTarget.get(target) match {
      case Some(old) if !forceRestart => throw new DumpAlreadyRunning(target, old)
      case Some(old) => abort(old)
      case None =>
    }
    if (runner.nonEmpty) runningByRunner.get(runner).foreach { u =>
      throw new DumpRunnerBusy(runner, u)
    }
    nextId += 1
    val uid = f"dump-$nextId%08d"
    statusByUid(uid) = Running
    targetByUid(uid) = target
    runningByTarget(target) = uid
    if (runner.nonEmpty) {
      runnerByUid(uid) = runner
      runningByRunner(runner) = uid
    }
    uid
  }

  def status(uid: String): DumpStatus.Value =
    synchronized(statusByUid.getOrElse(uid, Unknown))

  private def finishWith(uid: String, to: DumpStatus.Value): Unit = synchronized {
    statusByUid.get(uid) match {
      case Some(Running) =>
        statusByUid(uid) = to
        targetByUid.get(uid).foreach { t =>
          if (runningByTarget.get(t).contains(uid)) runningByTarget.remove(t)
        }
        runnerByUid.get(uid).foreach { r =>
          if (runningByRunner.get(r).contains(uid)) runningByRunner.remove(r)
        }
      case other =>
        throw new IllegalDumpTransition(s"$uid: ${other.getOrElse(Unknown)} -> $to")
    }
  }

  def finish(uid: String): Unit = finishWith(uid, FinishedSuccessfully)
  def abort(uid: String): Unit = finishWith(uid, Aborted)
  def fail(uid: String): Unit = finishWith(uid, Failed)

  /** Runner-keyed terminal transitions (the reference's only terminal
    * API, DumpTracker.scala:44-63): the runner must be the one that
    * started a still-running dump. Returns the finished dump's uid.
    */
  private def uidOfRunner(runner: String): String =
    runningByRunner.getOrElse(runner,
      throw new IllegalDumpTransition(s"runner $runner has no running dump"))
  def finishByRunner(runner: String): String = synchronized {
    val u = uidOfRunner(runner); finish(u); u
  }
  def abortByRunner(runner: String): String = synchronized {
    val u = uidOfRunner(runner); abort(u); u
  }
  def failByRunner(runner: String, message: String): String = synchronized {
    val u = uidOfRunner(runner); fail(u); u
  }

  /** Every dump uid ever started, in start order (reference RestApi's
    * GET /dumps, restapi/RestApi.scala:62-68 → DumpManager.getDumps).
    */
  def dumps: Seq[String] = synchronized(statusByUid.keys.toSeq.sorted)

  def runningFor(target: String): Option[String] =
    synchronized(runningByTarget.get(target))
  def runningOf(runner: String): Option[String] =
    synchronized(runningByRunner.get(runner))
}
