package graft.store

/** Test-only bridge into `private[store]` commit machinery: lets specs
  * drive [[IcebergLikeTable.commitAndGc]] with a manifest captured BEFORE
  * a concurrent mutation, reproducing races deterministically that public
  * entry points (which re-read the manifest at entry) would hide.
  */
object StoreTestAccess {
  def commit(t: IcebergLikeTable)(prev: t.Manifest, next: t.Manifest): Unit =
    t.commitAndGc(prev, next)
}
