package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, GreaterThanOrEqual, In, JoinedRow, LessThanOrEqual, Literal, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, UnaryNode, Union}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

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

object ShortlistFetch {

  /** Point-list pushdown has a REAL ceiling: ParquetFilters builds the
    * pushed IN as an or-chain and parquet-mr evaluates it recursively,
    * so the task thread's stack overflows around ~2,000 points
    * (bisected: a 2,000-id list dies in FileScanRDD with
    * StackOverflowError, 9,500 ids on the range path are fine). 512
    * leaves a 4× stack margin; it is also about where the per-row-group
    * or-chain evaluation cost stops paying for the skipping anyway. */
  val PushCeiling = 512

  private[plans] def idAttrOf(spark: SparkSession, p: LogicalPlan,
                              fetchIdName: String): Attribute = {
    val resolver = spark.sessionState.analyzer.resolver
    p.output.find(a => resolver(a.name, fetchIdName)).getOrElse(
      throw new IllegalArgumentException(
        s"fetch id column '$fetchIdName' not in fetch output " +
          p.output.map(_.name).mkString("[", ", ", "]")))
  }

  /** Plan + execute the point fetch for a bounded id list (driver,
    * once per fresh plan): build the pruned logical plan and hand it
    * to the full analyzer/optimizer/planner pipeline — predicate
    * pushdown then drives the point list into the parquet scan exactly
    * as a caller-written literal filter would.
    *
    * Up to [[PushCeiling]] ids: ONE `Filter(In(...))` scan; the
    * `inFilterThreshold` floor is raised to the list width first
    * (store contract, r15 ADVICE: below it ParquetFilters degrades the
    * IN to one [min,max] range and the fetch reads ~the corpus).
    *
    * PAST the ceiling (r16 open thread #3 — closed): the ids are
    * sorted and split into ceiling-sized CHUNKS, each fetched by its
    * own sub-scan of the same relation (same shared FileIndex —
    * `newInstance` re-keys attributes only, no re-listing) under
    * `chunk_min <= id <= chunk_max AND id IN (chunk)`, unioned. Every
    * pushed or-chain stays ≤ [[PushCeiling]] points (no StackOverflow
    * by construction), every sub-scan's row groups are pruned by both
    * its tight range and its point list, so rows-read stays
    * shortlist-proportional instead of one full table pass per batch
    * (PqServeProbe prices both sides of the boundary). Non-integral id
    * types (no sort order to chunk on) or a non-relation fetch plan
    * keep the r16 behavior: the threshold is CAPPED at the ceiling so
    * the IN degrades to one [min,max] range — reads more, stays
    * correct, and the post-scan InSet filter (OptimizeIn's hash set,
    * no recursion) cuts the rows.
    *
    * The session conf mutation is scoped (r16 ADVICE, medium): the
    * threshold is restored in a finally after the re-planned query's
    * RDD graph is built — the parquet readers capture the pushdown
    * settings at that point, so the restore cannot un-push them, and a
    * user-set value (or concurrently-planning query) never sees the
    * fetch's temporary floor afterwards.
    */
  private[plans] def executeFetch(spark: SparkSession, fetch: LogicalPlan,
                                  fetchIdName: String, ids: Array[Any],
                                  dt: DataType): RDD[InternalRow] = {
    if (ids.isEmpty)
      return SqlShims.ofRows(spark, LocalRelation(fetch.output))
        .queryExecution.toRdd
    val sortedNumeric: Option[Array[Any]] = dt match {
      case LongType    => Some(ids.sortBy(_.asInstanceOf[Long]))
      case IntegerType => Some(ids.sortBy(_.asInstanceOf[Int]))
      case _           => None
    }
    val tk = "spark.sql.parquet.pushdown.inFilterThreshold"
    val saved = spark.conf.getOption(tk)
    def floorTo(n: Int): Unit =
      if (spark.conf.get(tk, "10").toInt < n) spark.conf.set(tk, n.toString)
    try {
      val pruned: LogicalPlan =
        if (ids.length <= PushCeiling) {
          floorTo(ids.length)
          Filter(In(idAttrOf(spark, fetch, fetchIdName),
            ids.toSeq.map(v => Literal(v, dt))), fetch)
        } else sortedNumeric match {
          case Some(sorted) =>
            floorTo(PushCeiling)
            val fid = idAttrOf(spark, fetch, fetchIdName)
            // every branch references the SAME fetch subtree — the
            // analyzer's DeduplicateRelations re-instances the self-
            // union exactly as it does for df.filter(a).union(
            // df.filter(b)), and the shared FileIndex is listed once
            val branches = sorted.grouped(PushCeiling).map { chunk =>
              Filter(And(
                And(GreaterThanOrEqual(fid, Literal(chunk.head, dt)),
                  LessThanOrEqual(fid, Literal(chunk.last, dt))),
                In(fid, chunk.toSeq.map(v => Literal(v, dt)))),
                fetch).asInstanceOf[LogicalPlan]
            }.toSeq
            Union(branches)
          case None =>
            // no sort order to chunk on: cap the threshold so the
            // pushed IN degrades to one [min,max] range — correct,
            // loud in the probes, never a stack overflow
            if (spark.conf.get(tk, "10").toInt > PushCeiling)
              spark.conf.set(tk, PushCeiling.toString)
            Filter(In(idAttrOf(spark, fetch, fetchIdName),
              ids.toSeq.map(v => Literal(v, dt))), fetch)
        }
      // toRdd builds the physical RDD graph eagerly — the parquet
      // reader factories capture the pushdown conf HERE, inside the
      // scoped window
      SqlShims.ofRows(spark, pruned).queryExecution.toRdd
    } finally saved match {
      case Some(v) => spark.conf.set(tk, v)
      case None    => spark.conf.unset(tk)
    }
  }
}

/** Physical [[ShortlistFetch]] (planned by [[LshProbeStrategy]]).
  *
  * `doExecute` (driver, once per fresh plan): run the shortlist child
  * (`executeCollect` — bounded by `maxShortlist`, enforced), then plan
  * + execute the point fetch via [[ShortlistFetch.executeFetch]] (one
  * pushed-IN scan up to the push ceiling, chunked sub-scans past it).
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
    // the exec node's own session, not SparkSession.active (r16 ADVICE:
    // an action triggered from another thread or a multi-session driver
    // would re-plan the fetch against the wrong session — missing its
    // strategies/registrations, carrying different confs)
    ShortlistFetch.executeFetch(session, fetch, fetchIdName,
      rows.map(_.get(ord, dt)).distinct, dt)
  }
}

/** [[ShortlistFetch]]'s JOIN form (r16 ADVICE: the batched split-PQ /
  * SQ8 serves executed the ADC codes scan TWICE — once when the fetch
  * node collected its shortlist child, again when the (q_id, id) pairs
  * were re-evaluated as the rerank join's broadcast side). This node
  * collects the bounded shortlist PAIRS once and feeds BOTH consumers
  * from that single materialization: the distinct ids drive the pushed
  * point fetch exactly like [[ShortlistFetch]], and the collected rows
  * become the build side of a broadcast hash join executed inside the
  * node — output = fetch columns ++ child columns, one joined row per
  * (fetched row, matching shortlist pair). One codes-width scan per
  * request set, for real.
  *
  * Bounds: `maxIds` caps the DISTINCT id union pushed into the fetch
  * (the registration's `maxBatchFetch` contract, loud). The collected
  * pair rows are structurally ≤ requests × candidates (the serve's
  * per-request WindowGroupLimit) and the same bytes already crossed
  * the driver when the pairs were a broadcast build side — a hard
  * 4096×maxIds sanity ceiling keeps a mis-declared child loud instead
  * of silently corpus-collecting.
  */
final case class ShortlistFetchJoin(
    idExpr: Attribute,
    fetch: LogicalPlan,
    fetchIdName: String,
    maxIds: Int,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = fetch.output ++ child.output
  // only the fetch side's attributes are produced HERE; the child's
  // flow through normally so column-level bookkeeping sees them
  override def producedAttributes: AttributeSet = AttributeSet(fetch.output)
  override protected def withNewChildInternal(newChild: LogicalPlan): ShortlistFetchJoin =
    copy(child = newChild)
}

/** Physical [[ShortlistFetchJoin]] (planned by [[LshProbeStrategy]]).
  * One `executeCollect` of the pair child; distinct ids → the shared
  * [[ShortlistFetch.executeFetch]] pushed point fetch; the collected
  * pairs, grouped by id, broadcast to the fetch's partitions and
  * hash-joined row-by-row (every fetched row matches ≥ 1 pair by
  * construction — its id came from the pairs).
  */
final case class ShortlistFetchJoinExec(
    idExpr: Attribute,
    @transient fetch: LogicalPlan,
    fetchIdName: String,
    maxIds: Int,
    override val output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override protected def withNewChildInternal(newChild: SparkPlan): ShortlistFetchJoinExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val ord = child.output.indexWhere(_.exprId == idExpr.exprId)
    require(ord >= 0,
      s"shortlist id ${idExpr.name}#${idExpr.exprId.id} not in child output " +
        child.output.mkString("[", ", ", "]"))
    val dt = child.output(ord).dataType
    val rows = child.executeCollect()
    require(rows.length <= 4096L * math.max(maxIds, 1),
      s"shortlist pairs produced ${rows.length} rows (> 4096 × maxIds=$maxIds) — " +
        "the child must be per-request limit-bounded; an unbounded pair set " +
        "is a corpus-sized driver collect")
    if (rows.isEmpty) return sparkContext.emptyRDD[InternalRow]
    val ids = rows.map(_.get(ord, dt)).distinct
    require(ids.length <= maxIds,
      s"shortlist union has ${ids.length} distinct ids > declared bound $maxIds — " +
        "size the registration's maxBatchFetch to the real batch, or split the batch")
    val spark = session
    val fetchAttr = ShortlistFetch.idAttrOf(spark, fetch, fetchIdName)
    require(fetchAttr.dataType == dt,
      s"fetch id '$fetchIdName' is ${fetchAttr.dataType}, shortlist id is $dt — " +
        "the join key types must match exactly")
    val fetchOrd = fetch.output.indexWhere(_.exprId == fetchAttr.exprId)
    val fetched = ShortlistFetch.executeFetch(spark, fetch, fetchIdName, ids, dt)
    val byId: Map[Any, Array[InternalRow]] = rows.groupBy(_.get(ord, dt))
    val bc = sparkContext.broadcast(byId)
    val fetchOutput = fetch.output
    val childOutput = child.output
    val outAttrs = output
    fetched.mapPartitions { iter =>
      val m = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, fetchOutput ++ childOutput)
      iter.flatMap { frow =>
        m.get(frow.get(fetchOrd, dt)) match {
          case Some(pairs) => pairs.iterator.map(p => proj(joined(frow, p)))
          case None        => Iterator.empty
        }
      }
    }
  }
}
