package graft

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Registry of persisted intermediates so long-lived sessions can release
  * them once a query materializes. Several stage-frames are deliberately
  * persisted (HOF columns don't codegen, so multi-referenced derivations
  * recompute without a barrier — see NearDup.withSignatures); without a
  * paired unpersist those blocks accumulate in executor storage for the
  * lifetime of the session. Verify/Bench call [[release]] after each query;
  * a spec asserts nothing stays cached.
  */
object Caches {
  private val live = mutable.ArrayBuffer.empty[DataFrame]
  private val liveRddIds = mutable.ArrayBuffer.empty[(org.apache.spark.SparkContext, Int)]

  /** persist() + track for later release. */
  def persist(df: DataFrame): DataFrame = synchronized {
    live += df
    df.persist()
  }

  /** Eager localCheckpoint() + track the checkpoint blocks for release.
    * For iterative operators (scale/Clusters): persist() alone caches data
    * but keeps the logical plan nested, and self-join loops double the plan
    * per round — analysis itself blows up after ~6 rounds. Checkpointing
    * truncates lineage to the materialized rows. (On a real cluster a
    * reliable checkpoint() to durable storage is the fault-tolerant form;
    * executor-local blocks are the right trade for these small label
    * tables.)
    */
  def localCheckpoint(df: DataFrame): DataFrame = synchronized {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    liveRddIds ++= sc.getPersistentRDDs.keySet.diff(before).map(sc -> _)
    out
  }

  /** Lazy localCheckpoint: truncates lineage like [[localCheckpoint]] but
    * defers materialization into the first action that touches the frame —
    * no extra serialized job, unlike the eager form (measured: eager
    * barriers in corpus_prepare_v4 cost ~3.5 s of additional
    * materialization jobs at sf0.1).
    *
    * This is the cure for combinatorial ANALYZED-plan growth, a distinct
    * failure mode from recompute: a multi-stage pipeline whose stages each
    * reference their upstream frame 2–3× (self-joins, anti-joins, LSH
    * candidate joins) builds a logical tree that duplicates the upstream
    * subtree at every reference, so the tree grows exponentially with
    * stage count. persist() dedupes EXECUTION but not ANALYSIS — every
    * downstream action still pays Catalyst analysis + cache-lookup
    * canonicalization over the full tree, which reached 10,120
    * InMemoryTableScan nodes and ~4.5 s of driver time PER ACTION (fully
    * cached!) at corpus_prepare_v4's semantic stage. A lazy local
    * checkpoint replaces the subtree with one LogicalRDD leaf: same
    * blocks, same single computation, milliseconds of planning. (At
    * cluster scale with preemptible executors, [[reliableCheckpoint]] is
    * the durable sibling; executor-local blocks are the right trade for
    * single-app batch queries.)
    */
  def lazyBarrier(df: DataFrame): DataFrame = synchronized {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // SPARK_GRAFT_BARRIER_DEBUG=1 prints per-barrier creation cost: under
    // AQE, localCheckpoint(eager=false) still materializes the subtree's
    // query stages at CREATION time, so this is where a staged pipeline's
    // wall-clock actually goes (see tools.StageProbe)
    val t0 = System.nanoTime()
    val out = df.localCheckpoint(eager = false)
    if (sys.env.contains("SPARK_GRAFT_BARRIER_DEBUG"))
      System.err.println(f"[barrier] ${(System.nanoTime() - t0) / 1e9}%.3f s  " +
        df.queryExecution.logical.getClass.getSimpleName)
    liveRddIds ++= sc.getPersistentRDDs.keySet.diff(before).map(sc -> _)
    out
  }

  /** Eager reliable checkpoint() — lineage cut to files under
    * `sc.setCheckpointDir`, surviving executor loss. The durable sibling of
    * [[localCheckpoint]] for iterative operators on unreliable executors:
    * same lineage truncation, but a lost executor replays from storage
    * instead of failing the job (local checkpoint blocks are
    * non-replicated executor state). Costs one write+read of the frame per
    * call — the right trade when rounds are long-lived or executors are
    * preemptible. Requires a checkpoint dir to be configured.
    */
  def reliableCheckpoint(df: DataFrame): DataFrame = {
    require(df.sparkSession.sparkContext.getCheckpointDir.nonEmpty,
      "reliable checkpointing needs spark.sparkContext.setCheckpointDir(...)")
    df.checkpoint()
  }

  // --- session-pinned frames: shared ACROSS registered queries ---------
  // Keyed on the SparkContext REFERENCE (weakly): identity hash codes can
  // collide across contexts, and a strong key would retain every stopped
  // context's pinned localCheckpoint frames for the JVM lifetime. A weak
  // key guarantees (a) a later session can never receive frames bound to
  // a different (possibly dead) context and (b) a collected context's
  // entries vanish with it in multi-session JVMs.
  private val memo =
    new java.util.WeakHashMap[org.apache.spark.SparkContext, mutable.Map[String, Any]]()

  /** Memoized once per (SparkContext, key): the sharing mechanism for
    * stage frames that several REGISTERED QUERIES derive identically (the
    * capstone prep prefix — v4/v5/v6/v7/v8/audit each re-derived the same
    * normalize→gate→dedup staging chain, ~1.5 s of pure barrier
    * materialization EACH at sf0.1). Build the shared frames inside `mk`
    * with [[pinnedBarrier]] (NOT [[lazyBarrier]] — per-query [[release]]
    * would unpersist a truncated-lineage frame out from under later
    * queries). Pinned frames survive release() and die with their
    * context — on a cluster this is precisely "materialize the curated
    * staging table once, let every downstream job read it".
    */
  def sessionMemo[T](spark: org.apache.spark.sql.SparkSession, key: String)(mk: => T): T =
    synchronized {
      val sc = spark.sparkContext
      var perCtx = memo.get(sc)
      if (perCtx == null) { perCtx = mutable.Map.empty[String, Any]; memo.put(sc, perCtx) }
      perCtx.getOrElseUpdate(key, mk).asInstanceOf[T]
    }

  /** Lineage barrier for session-pinned frames: same lazy localCheckpoint
    * as [[lazyBarrier]] but deliberately NOT tracked for [[release]] —
    * only for frames registered through [[sessionMemo]], whose lifetime is
    * the session, not the query.
    */
  def pinnedBarrier(df: DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    val out = df.localCheckpoint(eager = false)
    if (sys.env.contains("SPARK_GRAFT_BARRIER_DEBUG"))
      System.err.println(f"[barrier pinned] ${(System.nanoTime() - t0) / 1e9}%.3f s  " +
        df.queryExecution.logical.getClass.getSimpleName)
    out
  }

  /** Unpersist every tracked frame and clear the registry. */
  def release(): Unit = synchronized {
    live.foreach(_.unpersist())
    live.clear()
    liveRddIds.foreach { case (sc, id) =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    liveRddIds.clear()
  }
}
