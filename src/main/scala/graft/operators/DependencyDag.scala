package graft.operators

import org.apache.spark.sql.DataFrame

/** Dependency DAG of replicated tables (S11,
  * `lib/webhookdb/replicator.rb:212-230`, `base.rb:318-336`, `1249-1260`):
  * integrations declare `dependsOn`; a parent's upsert notifies dependents
  * with the parent's CHANGED rows, and recursive backfills cascade through
  * the tree parents-first.
  */
object DependencyDag {

  val MaxDepth = 15 // replicator.rb:212-230 recursion guard

  /** Parents-first topological order; cycles or over-deep chains throw. */
  def topoOrder(specs: Seq[ReplicatorSpec]): Seq[ReplicatorSpec] = {
    val byName = specs.map(s => s.name -> s).toMap
    def depth(s: ReplicatorSpec, seen: Set[String]): Int = s.dependsOn match {
      case None => 0
      case Some(p) =>
        require(!seen.contains(p), s"dependency cycle at ${s.name}")
        require(seen.size < MaxDepth, s"dependency chain deeper than $MaxDepth")
        byName.get(p).map(ps => 1 + depth(ps, seen + s.name)).getOrElse(0)
    }
    specs.sortBy(s => (depth(s, Set(s.name)), s.name))
  }

  /** Snapshot storage abstraction for cascade runs (tests use an in-memory
    * map; production uses the parquet snapshot/table store). */
  trait TableStore {
    def read(spec: ReplicatorSpec): DataFrame
    def write(spec: ReplicatorSpec, snapshot: DataFrame): Unit
  }

  /** Apply one webhook batch to `root`, then cascade: each dependent
    * receives the parent's changed rows translated by `childBatchFor` into
    * its own webhook batch (`on_dependency_webhook_upsert`), recursively.
    * Unchanged parent rows trigger nothing — the row-diff suppression
    * contract. */
  def cascade(specs: Seq[ReplicatorSpec], rootName: String, batch: DataFrame,
              store: TableStore,
              childBatchFor: (ReplicatorSpec, DataFrame) => DataFrame): Unit = {
    val byParent = specs.groupBy(_.dependsOn)
    def step(spec: ReplicatorSpec, webhooks: DataFrame, depth: Int): Unit = {
      require(depth <= MaxDepth, "dependency cascade too deep")
      val target = store.read(spec)
      val (snapshot, changed) = Pipeline.applyBatch(spec, target, webhooks)
      store.write(spec, snapshot)
      if (changed.isEmpty) return
      byParent.getOrElse(Some(spec.name), Nil).foreach { child =>
        step(child, childBatchFor(child, changed), depth + 1)
      }
    }
    val root = specs.find(_.name == rootName)
      .getOrElse(throw new NoSuchElementException(s"no replicator $rootName"))
    step(root, batch, 0)
  }
}
