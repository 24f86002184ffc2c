package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.SqlShims

/** Logical "materialize a bounded shortlist, then fetch exactly those
  * rows from an at-rest table with the id list pushed into its scan"
  * node — the single-plan answer to the split-layout serving question
  * PqServeProbe closed with two measured negatives (r15/r16):
  *
  *  - Spark's runtime bloom filter ([[org.apache.spark.sql.catalyst
  *    .optimizer.InjectRuntimeFilter]]) only seeds from a SELECTIVE
  *    FILTER node on the creation side of a join; a top-k shortlist is
  *    a TakeOrdered, not a Filter, so the float scan reads the corpus
  *    no matter how the knobs are opened (measured: 2M rows vs the
  *    bounded hop's 1.17M at 1M×2 layouts);
  *  - DPP keys on partition columns, and a vec_id shortlist is not a
  *    partition predicate.
  *
  * Until this node, the engine's split-PQ serve was therefore an
  * honest TWO-PLAN staged execution with a caller-visible driver hop
  * ([[graft.index.PqIndexStore.searchRefinedSplit]] collects the ≤
  * `candidates` shortlist ids and inlines them as a literal IN). This
  * node moves that hop INSIDE one physical operator: the caller gets
  * ONE DataFrame whose plan shows the staging explicitly, nothing runs
  * until the caller acts, and the whole composition is re-usable
  * anywhere a DataFrame is (foreachBatch micro-batches, the optimizer
  * rule's rewrites, further joins/filters on top).
  *
  * Shape: `child` is the shortlist plan (bounded — `maxShortlist` is a
  * hard `require` at execution, the same bounded-driver-collect class
  * as broadcast builds and the serving loops' per-request results);
  * `fetch` is the ANALYZED plan of the at-rest table, held as a plain
  * field rather than a child so no optimizer transform rewrites it —
  * it is re-planned from scratch at execution time with the runtime
  * `In(fetchId, ids)` filter, which is what lets the parquet source
  * push the point list into row-group stats + dictionary skipping
  * (the store-owned id-clustered layout contract,
  * [[graft.index.PqIndexStore.writeSplit]], makes that skipping
  * shortlist-proportional).
  *
  * Execution-time re-planning is the same move Spark itself makes for
  * adaptive subqueries and broadcast pruning: the list simply cannot
  * exist at static-planning time. `output` is the fetch table's own
  * attribute set, so everything above this node binds as if it were
  * the table.
  */
final case class ShortlistFetch(
    idExpr: Attribute,
    fetch: LogicalPlan,
    fetchIdName: String,
    maxShortlist: Int,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = fetch.output
  // the node PRODUCES the fetch table's attributes (they come from the
  // side plan, not the shortlist child); idExpr stays in `references`
  // so ColumnPruning keeps the id column alive in the child
  override def producedAttributes: AttributeSet = outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): ShortlistFetch =
    copy(child = newChild)
}

/** Physical [[ShortlistFetch]] (planned by [[LshProbeStrategy]]).
  *
  * `doExecute` (driver, once per fresh plan): run the shortlist child
  * (`executeCollect` — bounded by `maxShortlist`, enforced), build
  * `Filter(In(fetchId, <ids as literals>), fetch)` as a FRESH logical
  * plan and hand it to the full analyzer/optimizer/planner pipeline —
  * predicate pushdown then drives the point list into the parquet
  * scan exactly as a caller-written literal filter would. The
  * `inFilterThreshold` floor is raised to the shortlist width first
  * (store contract, r15 ADVICE: below it ParquetFilters degrades the
  * IN to one [min,max] range and the fetch reads ~the corpus).
  *
  * An empty shortlist short-circuits to an empty relation — `In` with
  * an empty list is an analysis error, and there is nothing to fetch.
  */
final case class ShortlistFetchExec(
    idExpr: Attribute,
    // driver-only: doExecute re-plans it; executors never see it (and a
    // FileIndex inside a LogicalRelation is not serializable anyway —
    // without @transient, a parent shuffle's canonicalized plan drags
    // this node into task-closure serialization)
    @transient fetch: LogicalPlan,
    fetchIdName: String,
    maxShortlist: Int,
    override val output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override protected def withNewChildInternal(newChild: SparkPlan): ShortlistFetchExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val ord = child.output.indexWhere(_.exprId == idExpr.exprId)
    require(ord >= 0,
      s"shortlist id ${idExpr.name}#${idExpr.exprId.id} not in child output " +
        child.output.mkString("[", ", ", "]"))
    val dt = child.output(ord).dataType
    val rows = child.executeCollect()
    require(rows.length <= maxShortlist,
      s"shortlist produced ${rows.length} rows > declared bound $maxShortlist — " +
        "the child must be limit-bounded; an unbounded shortlist is a " +
        "corpus-sized driver collect")
    val spark = SparkSession.active
    val resolver = spark.sessionState.analyzer.resolver
    val fetchId = fetch.output.find(a => resolver(a.name, fetchIdName)).getOrElse(
      throw new IllegalArgumentException(
        s"fetch id column '$fetchIdName' not in fetch output " +
          fetch.output.map(_.name).mkString("[", ", ", "]")))
    // Point-list pushdown has a REAL ceiling: ParquetFilters builds the
    // pushed IN as an or-chain and parquet-mr evaluates it recursively,
    // so the task thread's stack overflows around ~2,000 points
    // (bisected: a 2,000-id list dies in FileScanRDD with
    // StackOverflowError, 9,500 ids on the range path are fine). Up to
    // the ceiling we size the threshold so the points push exactly;
    // past it we CAP the threshold so the IN degrades to one [min,max]
    // range — reads more, stays correct, and the post-scan InSet filter
    // (OptimizeIn's hash set, no recursion) cuts the rows. 512 leaves
    // a 4× stack margin; it is also about where the per-row-group
    // or-chain evaluation cost stops paying for the skipping anyway.
    // The crossover is documented at the serve layer: a union fetch
    // past the ceiling costs one full float-table pass per batch.
    val tk = "spark.sql.parquet.pushdown.inFilterThreshold"
    val pushCeiling = 512
    if (rows.length <= pushCeiling) {
      if (spark.conf.get(tk, "10").toInt < rows.length)
        spark.conf.set(tk, math.max(rows.length, 1).toString)
    } else if (spark.conf.get(tk, "10").toInt > pushCeiling)
      spark.conf.set(tk, pushCeiling.toString)
    val pruned =
      if (rows.isEmpty) LocalRelation(fetch.output)
      else Filter(In(fetchId, rows.toSeq.map(r => Literal(r.get(ord, dt), dt))), fetch)
    SqlShims.ofRows(spark, pruned).queryExecution.toRdd
  }
}
