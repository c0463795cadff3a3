package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.store.IcebergLikeTable

/** Custom Catalyst leaf: "scan of an [[IcebergLikeTable]]" as a LOGICAL
  * fact, not a baked file list. The table stays symbolic through analysis
  * so the optimizer — not the caller — decides how to materialize it:
  * [[GraftBucketPrune]] turns a `WHERE conv_id = 'k'` predicate into a
  * single-bucket manifest read (the storage layout made visible to
  * Catalyst), and everything else becomes the ordinary snapshot scan.
  *
  * This is the §4.1-style rewrite the built-in operators genuinely cannot
  * express: Spark's parquet relation prunes *Hive-style partition dirs*
  * and *footer ranges*, but the bucket of `hash(key) pmod B` under an
  * equality predicate is knowable only to the engine that owns the
  * manifest. znap answers the same query with a DynamoDB point `getItem`
  * (reference: restapi/DynamoDBEntityReader.scala:38-73); here the
  * planner routes SQL to the equivalent pruned read automatically.
  *
  * Registered per-session either via the public
  * `spark.experimental.extraOptimizations` hook ([[GraftScan.install]])
  * or via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.functions.GraftExtensions]]).
  */
final case class GraftScan(table: IcebergLikeTable, output: Seq[Attribute])
    extends LeafNode with MultiInstanceRelation {
  override def newInstance(): GraftScan =
    copy(output = output.map(_.newInstance()))
  // Pre-rewrite stats: report the default (large) size so a join against
  // this relation is never broadcast on a guess; once the rule replaces
  // the leaf with the real parquet scan, real file stats take over.
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = conf.defaultSizeInBytes)
}

object GraftScan {
  /** The table as a DataFrame whose leaf is the symbolic [[GraftScan]] —
    * register it as a temp view and the whole SQL surface (joins, aggs,
    * point predicates) runs against the store with pruning decided at
    * optimization time.
    */
  def relation(spark: SparkSession, table: IcebergLikeTable): DataFrame = {
    val out: Seq[Attribute] = table.schema().fields.toSeq
      .map(f => AttributeReference(f.name, f.dataType, f.nullable, f.metadata)())
    Shim.ofRows(spark, GraftScan(table, out))
  }

  /** Install [[GraftBucketPrune]] on an existing session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(GraftBucketPrune))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GraftBucketPrune
}

/** Optimizer rewrite for [[GraftScan]] leaves:
  *
  *  - `Filter(... key = 'k' ...)` directly above the scan → the manifest-
  *    pruned single-bucket read ([[IcebergLikeTable.lookup]]): O(1/B) of
  *    the files, no job spent hashing (the bucket is computed driver-side
  *    from the committed bucket count);
  *  - `Filter(... statsCol ≤/≥/BETWEEN … ...)` → the stats-pruned range
  *    scan, but only when provably snapshot-exact (no outstanding deltas
  *    — see `PinnedView.rangeScanIfExact`); SQL time-window reads over a
  *    compacted/OPTIMIZE'd table touch only the intersecting files;
  *  - any other shape → the ordinary snapshot-consistent [[IcebergLikeTable.read]].
  *
  * The replacement subplan is re-rooted under a Project that re-binds the
  * original attribute ids, so every parent expression stays resolved. The
  * full original predicate is kept above the pruned read — pruning is a
  * superset guarantee (a key's rows live only in its bucket), the filter
  * still enforces exact semantics, and residual non-key conjuncts are
  * untouched. Runs once per plan: after rewrite no [[GraftScan]] remains,
  * so the rule is a no-op at fixpoint.
  *
  * Snapshot consistency across leaves: the manifest is resolved ONCE per
  * (table, optimizer invocation) via [[IcebergLikeTable.pin]], and every
  * leaf of that table materializes from the same pin — a self-join (or a
  * query over two tables) can no longer observe two different committed
  * snapshots when a merge lands between per-leaf rebind calls.
  */
object GraftBucketPrune extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val pins = scala.collection.mutable
      .Map[IcebergLikeTable, IcebergLikeTable#PinnedView]()
    def pinOf(t: IcebergLikeTable): IcebergLikeTable#PinnedView =
      pins.getOrElseUpdate(t, t.pin())
    plan.transformDown {
      case Filter(cond, g: GraftScan) =>
        val keyAttr = g.output.find(_.name == g.table.keyCol)
        // key = 'k', key IN ('a','b',...), and the optimizer's InSet form
        // all prune; OptimizeIn may have run first, so both shapes appear.
        val keys: Option[Seq[String]] = keyAttr.flatMap { a =>
          splitConjunctivePredicates(cond).collectFirst {
            case EqualTo(l: AttributeReference, Literal(v: UTF8String, StringType))
                if l.semanticEquals(a) => Seq(v.toString)
            case EqualTo(Literal(v: UTF8String, StringType), r: AttributeReference)
                if r.semanticEquals(a) => Seq(v.toString)
            case In(l: AttributeReference, vs)
                if l.semanticEquals(a) &&
                  vs.forall(_.isInstanceOf[Literal]) &&
                  vs.forall(_.dataType == StringType) =>
              vs.collect { case Literal(v: UTF8String, StringType) => v.toString }
            case InSet(l: AttributeReference, vs) if l.semanticEquals(a) =>
              vs.toSeq.collect { case v: UTF8String => v.toString }
          }
        }
        // range bounds on the table's stats column (ts_us BETWEEN …,
        // ts_us <= …): prunable to the intersecting files — but ONLY via
        // PinnedView.rangeScanIfExact, which refuses when outstanding
        // deltas could make file skipping resurrect superseded rows.
        // Strict bounds (<, >) prune with their inclusive superset; the
        // retained Filter enforces exactness either way.
        def longLit(l: Literal): Option[Long] = l.value match {
          case i: java.lang.Integer => Some(i.toLong)
          case j: java.lang.Long => Some(j)
          case s: java.lang.Short => Some(s.toLong)
          case _ => None
        }
        val statsAttr = g.table.statsCol.flatMap(sc => g.output.find(_.name == sc))
        val bounds: Seq[(Option[Long], Option[Long])] = statsAttr.toSeq.flatMap { a =>
          splitConjunctivePredicates(cond).flatMap {
            case GreaterThanOrEqual(l: AttributeReference, lit: Literal)
                if l.semanticEquals(a) => longLit(lit).map(v => (Some(v), None))
            case GreaterThan(l: AttributeReference, lit: Literal)
                if l.semanticEquals(a) => longLit(lit).map(v => (Some(v), None))
            case LessThanOrEqual(l: AttributeReference, lit: Literal)
                if l.semanticEquals(a) => longLit(lit).map(v => (None, Some(v)))
            case LessThan(l: AttributeReference, lit: Literal)
                if l.semanticEquals(a) => longLit(lit).map(v => (None, Some(v)))
            case EqualTo(l: AttributeReference, lit: Literal)
                if l.semanticEquals(a) => longLit(lit).map(v => (Some(v), Some(v)))
            case GreaterThanOrEqual(lit: Literal, r: AttributeReference)
                if r.semanticEquals(a) => longLit(lit).map(v => (None, Some(v)))
            case GreaterThan(lit: Literal, r: AttributeReference)
                if r.semanticEquals(a) => longLit(lit).map(v => (None, Some(v)))
            case LessThanOrEqual(lit: Literal, r: AttributeReference)
                if r.semanticEquals(a) => longLit(lit).map(v => (Some(v), None))
            case LessThan(lit: Literal, r: AttributeReference)
                if r.semanticEquals(a) => longLit(lit).map(v => (Some(v), None))
            case EqualTo(lit: Literal, r: AttributeReference)
                if r.semanticEquals(a) => longLit(lit).map(v => (Some(v), Some(v)))
            case _ => None
          }
        }
        val range: Option[(Long, Long)] =
          if (bounds.isEmpty) None
          else Some((
            (bounds.flatMap(_._1) :+ Long.MinValue).max,
            (bounds.flatMap(_._2) :+ Long.MaxValue).min))
        val scan = keys match {
          case Some(Seq(k)) => pinOf(g.table).lookup(g.table.keyCol, k)
          case Some(ks) if ks.nonEmpty => pinOf(g.table).lookupMany(g.table.keyCol, ks)
          case _ => range.flatMap { case (lo, hi) =>
            pinOf(g.table).rangeScanIfExact(lo, hi)
          }.getOrElse(pinOf(g.table).read())
        }
        Filter(cond, rebind(g, scan))
      case g: GraftScan => rebind(g, pinOf(g.table).read())
    }
  }

  /** Re-root `df`'s analyzed plan under the leaf's original attribute ids
    * (aligned by column name — both sides derive from the committed table
    * schema).
    */
  private def rebind(g: GraftScan, df: DataFrame): LogicalPlan = {
    val replacement = df.queryExecution.analyzed
    val byName = replacement.output.map(a => a.name -> a).toMap
    Project(g.output.map { o =>
      val source = byName.getOrElse(o.name, throw new IllegalStateException(
        s"GraftScan view is stale: column '${o.name}' is no longer in the " +
          s"table's committed schema (a dropColumn happened after the view " +
          "was registered) — re-register the relation"))
      Alias(source, o.name)(exprId = o.exprId,
        qualifier = o.qualifier, explicitMetadata = Some(o.metadata))
    }, replacement)
  }
}
