package graft.ops

/** Dump lifecycle state machine — the one component the reference actually
  * tests (DumpTrackerSuite, 27 cases) — re-expressed as a plain driver-side
  * registry (reference: dumps/DumpManager.scala:36-115,
  * dumps/DumpTracker.scala:13-87, states dumps/package.scala:13-18).
  *
  * Semantics preserved:
  *  - one running dump per target unless force-restart;
  *  - states Unknown / Running / FinishedSuccessfully / Aborted / Failed;
  *  - illegal transitions throw;
  *  - dump UIDs are unique and never reused, even after terminal states.
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

final class DumpManager {
  import DumpStatus._

  private var nextId = 0L
  private val statusByUid = scala.collection.mutable.Map[String, DumpStatus.Value]()
  private val targetByUid = scala.collection.mutable.Map[String, String]()
  private val runningByTarget = scala.collection.mutable.Map[String, String]()

  /** Start a dump for `target`. Rejects if one is running for the target
    * (unless forceRestart, which aborts the old one), mirroring
    * DumpManager.startDump (reference :62-100).
    */
  def start(target: String, forceRestart: Boolean = false): String = synchronized {
    runningByTarget.get(target) match {
      case Some(old) if !forceRestart => throw new DumpAlreadyRunning(target, old)
      case Some(old) => abort(old)
      case None =>
    }
    nextId += 1
    val uid = f"dump-$nextId%08d"
    statusByUid(uid) = Running
    targetByUid(uid) = target
    runningByTarget(target) = uid
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
      case other =>
        throw new IllegalDumpTransition(s"$uid: ${other.getOrElse(Unknown)} -> $to")
    }
  }

  def finish(uid: String): Unit = finishWith(uid, FinishedSuccessfully)
  def abort(uid: String): Unit = finishWith(uid, Aborted)
  def fail(uid: String): Unit = finishWith(uid, Failed)

  def runningFor(target: String): Option[String] =
    synchronized(runningByTarget.get(target))
}
