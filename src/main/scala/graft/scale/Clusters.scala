package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected-component resolution over near-dup candidate pairs — the stage
  * that turns pairwise similarity hits (NearDup/Similarity output) into
  * keep/drop decisions. Pairs alone under-delete: if A~B and B~C, keeping
  * "the lower id of each pair" keeps A and C even though all three are one
  * duplicate group. Production dedup (the reference pipelines' published
  * shape — MapReduce CC, Kiveris et al. 2014; see PAPERS.md) resolves the
  * pair graph into components and keeps one canonical doc per component.
  *
  * 100 TB posture: iterative min-label propagation with pointer jumping —
  * each round is one edge-join + groupBy-min (shuffle on node id) plus one
  * label-to-label join, and the jump squares resolved path lengths, so
  * rounds needed grow with log(component diameter), not diameter. Dedup
  * components are overwhelmingly tiny (pairs/triples), so in practice 2-3
  * rounds converge; the driver-side loop only ever compares one boolean per
  * round (`changed.isEmpty`), never collects data.
  */
object Clusters {

  /** Resolves the undirected pair graph into components.
    * Returns one row per node appearing in `pairs`:
    * (node, cluster_id) with cluster_id = the component's minimum node id.
    *
    * `reliable = true` flips the per-round lineage cut from executor-local
    * checkpoint blocks to a durable `checkpoint()` (requires
    * `sc.setCheckpointDir`): same operator, but a preempted executor
    * replays its label partition from storage instead of failing the whole
    * iteration — the production setting for long dedup runs on spot
    * capacity.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 16,
                          reliable: Boolean = false): DataFrame = {
    val cut: DataFrame => DataFrame =
      if (reliable) graft.Caches.reliableCheckpoint else graft.Caches.localCheckpoint
    // cut + distinct here, on the PAIR list: the input is typically an
    // expensive similarity join that everything below (nodes, edges,
    // labels) re-references — materialize it once; distinct at this level
    // (LSH candidates repeat a pair once per colliding band) makes the
    // 3-way edge union distinct by construction — reversal can't collide
    // with a<b pairs, self-loops come from the distinct node set
    val half = cut(pairs.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst")).distinct())
    // Checkpoints (not persists) throughout: the loop self-joins its own
    // output, so a nested plan doubles per round — lineage must be cut to
    // the materialized rows each iteration, or analysis alone blows up
    // around round 6.
    // Undirected edges plus a self-loop per node: with self-loops,
    // min-over-neighbor-labels subsumes "keep own label", so the loop body
    // is one join + groupBy with no per-round union (unions whose branches
    // descend from the same checkpointed relation trip Union's constraint
    // rewrite in analysis).
    val nodes = half.select(col("src"))
      .union(half.select(col("dst").as("src"))).distinct()
    // no distinct() over the edge union: min() is idempotent under
    // duplicate edges, and deduping the corpus-sized edge list would be
    // the loop's single largest shuffle bought for nothing (an input pair
    // listed twice at worst doubles that edge's join rows)
    val edges = cut(
      half.union(half.select(col("dst").as("src"), col("src").as("dst")))
        .union(nodes.select(col("src"), col("src").as("dst"))))
    // nodes is already the distinct node set — labels reuse it instead of
    // re-distincting the 3-way edge union
    var labels = cut(nodes.select(col("src").as("node"))
      .withColumn("label", col("node")))
    // Labels only ever decrease pointwise, so the label sum is a strictly
    // decreasing convergence witness: one scalar action per round instead
    // of a change-detection join.
    var labelSum = sumOf(labels)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // min over every neighbor's label (self-loop covers the own label)
      val prop = edges.as("e")
        .join(labels.as("l"), col("e.dst") === col("l.node"))
        .groupBy(col("e.src").as("node"))
        .agg(min(col("l.label")).as("label"))
      // pointer jump: follow the label one more hop (label(label(x))).
      // Every label is itself a node of the pair graph (labels start as node
      // ids and min() keeps them in-set), so the join always matches.
      val jumped = cut(prop.as("p")
        .join(prop.select(col("node").as("jn"), col("label").as("jl")).as("j"),
          col("p.label") === col("j.jn"), "left")
        .select(col("p.node").as("node"),
          coalesce(col("j.jl"), col("p.label")).as("label")))
      val newSum = sumOf(jumped)
      done = newSum == labelSum
      labelSum = newSum
      labels = jumped
      iter += 1
    }
    labels.select(col("node"), col("label").as("cluster_id"))
  }

  private def sumOf(labels: DataFrame): Long = {
    val r = labels.agg(sum("label")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** [[connectedComponents]] plus the dedup verdict: cluster size and the
    * canonical flag (lowest id in the component survives). One row per doc
    * that participated in at least one pair.
    */
  def dedupClusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    val sizes = cc.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "cluster_id")
      .select(col("node").as("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("node") === col("cluster_id")).as("is_canonical"))
  }

  /** PageRank over the undirected pair graph (`rank = (1-d) + d·Σ
    * rank(nbr)/deg(nbr)`, fixed iteration count): the centrality
    * companion to [[connectedComponents]] — inside a dup cluster the
    * highest-rank node is the hub the others orbit, a better canonical-
    * representative choice than min-id when clusters are star-shaped.
    *
    * Each iteration is one co-partitioned join + one aggregate on the
    * node key; a lazy lineage barrier per iteration keeps the analyzed
    * tree linear in rounds (the [[connectedComponents]] lesson). State
    * per round is one double per node.
    */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
               iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    val deg = graft.Caches.lazyBarrier(
      sym.groupBy("src").agg(count(lit(1)).as("deg")))
    val withDeg = graft.Caches.lazyBarrier(sym.join(deg, "src"))
    val nodes = deg.select(col("src").as("node"))
    var ranks = nodes.withColumn("rank", lit(1.0d))
    for (i <- 1 to iterations) {
      val contrib = withDeg.join(ranks, col("src") === col("node"))
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      // The symmetrized graph gives every ranked node at least one
      // incoming edge (it appears as some dst), so `contrib` already
      // covers the full node set — the textbook `nodes LEFT JOIN contrib`
      // re-attachment is a guaranteed full match and is elided: one join
      // per round instead of two. (Dangling-node redistribution doesn't
      // arise either: every node has out-degree by construction.)
      val next = contrib.select(col("dst").as("node"),
        (lit(1.0d - damping) + lit(damping) * col("s")).as("rank"))
      // barrier every SECOND round: each barrier costs a serialized
      // stage-job materialization (the corpus_prepare_v4 scheduling-floor
      // lesson), while two rounds of join lineage stay well under the
      // analyzed-tree blowup threshold — halving the floor halves the
      // query's wall-clock at small SF without touching semantics.
      ranks = if (i % 2 == 0 || i == iterations) graft.Caches.lazyBarrier(next)
              else next
    }
    ranks
  }

  /** Synchronous label propagation (community detection): every node
    * starts as its own label; each round it adopts the most frequent
    * label among its NEIGHBORS, ties to the smaller label — a total
    * deterministic order, so the rounds are exactly replayable (and
    * integer-exact: counts, argmax, nothing else). The community
    * complement of [[connectedComponents]] (which finds reachability,
    * not density) and [[pageRank]] (centrality): on a near-dup graph LPA
    * splits a weakly-bridged component into its dense template clusters.
    *
    * Scale shape: per round one edge–label join (shuffle on src) and one
    * (node, label) count aggregate with map-side combine; label state is
    * one long per node. Same barrier cadence as pageRank (every second
    * round) — the cost is serial round depth, not per-round work.
    */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
                       iterations: Int = 4): DataFrame = {
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    val edges = graft.Caches.lazyBarrier(sym)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    val w = Window.partitionBy("node").orderBy(col("c").desc, col("label"))
    for (i <- 1 to iterations) {
      val next = edges
        .join(labels.select(col("node").as("src"), col("label")), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("node"), col("label"))
      labels = if (i % 2 == 0 || i == iterations) graft.Caches.lazyBarrier(next)
               else next
    }
    labels
  }
}
