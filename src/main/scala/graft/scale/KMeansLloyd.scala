package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over embeddings, built so every iteration is
  * bit-reproducible across engines — the property the mllib fit (used by
  * `Similarity.ivfTopK`) cannot give, which is why its recall arm is
  * rows-only while this operator is fully DuckDB-oracle-checked.
  *
  * Exactness scheme:
  *   - vectors quantized once to a 1e-6 integer grid (`floor(v·1e6)`:
  *     float→double cast is exact, one rounded multiply, floor — identical
  *     on any IEEE-754 engine);
  *   - centroids carried as (per-dim BIGINT sums, member count) — the
  *     UPDATE step is pure integer addition, order-independent, so shuffle
  *     nondeterminism cannot perturb it;
  *   - the ASSIGN step derives each centroid mean `sx/cnt` and the squared
  *     distance as doubles, but per-row as a LEFT FOLD in dimension order
  *     (`aggregate(zip_with(...))` ⇄ `list_reduce(list_transform(...))`),
  *     never a cross-row double aggregation — both engines see the same
  *     operation tree over the same exact integers, so the argmin (ties to
  *     the lower centroid id) is deterministic.
  *
  * Scale shape: the centroid table is k rows and broadcast; ASSIGN is one
  * scan with a per-row fold (no shuffle); UPDATE is one integer
  * aggregation keyed by (cid, dim). Lineage is barriered per round
  * (the pageRank scheduling-floor lesson). Seeds are the k lowest-id
  * vectors — deterministic and oracle-replayable; k-means++ would need a
  * random stream the oracle could not follow.
  */
object KMeansLloyd {

  /** (vec_id, vqs: array<bigint>) — the 1e-6-quantized corpus. */
  def quantized(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    embs.select(col(idCol).as("vec_id"),
      expr(s"transform($vecCol, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000D) AS BIGINT))")
        .as("vqs"))

  /** Final assignment after `iterations` Lloyd rounds from the k lowest-id
    * seeds: (vec_id, cid, dist) with dist the squared grid-space distance
    * scaled back to vector units.
    */
  def assign(embs: DataFrame, idCol: String, vecCol: String,
             k: Int, iterations: Int): DataFrame = {
    // deliberately NOT barriered: every caller hands in either a raw
    // parquet scan (recompute = cheap re-read) or an already-barriered
    // frame (corpus_prepare_v5's withVec), and a lazy barrier here costs
    // one serialized job per query — the round floor the capstone bench
    // exposed
    val ev = quantized(embs, idCol, vecCol)

    // c0: the k lowest-id vectors, cid = 1..k in id order, cnt = 1. The
    // orderBy+limit is a distributed TakeOrdered (never a one-task global
    // window); the row_number window then runs over k rows only.
    var cent: DataFrame = ev.orderBy("vec_id").limit(k)
      .withColumn("cid", row_number().over(Window.orderBy("vec_id")))
      .select(col("cid"), col("vqs").as("sxs"), lit(1L).as("cnt"))

    var assigned: DataFrame = null
    for (i <- 1 to iterations) {
      // ASSIGN: broadcast the k-row centroid table; per-row in-order fold
      // of (v − sx/cnt)² over dims; argmin with ties to the lower cid.
      assigned = ev.crossJoin(broadcast(cent))
        .withColumn("dist", expr(
          """aggregate(zip_with(vqs, sxs,
            |  (v, sx) -> pow(CAST(v AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE), 2D)),
            |  0D, (acc, x) -> acc + x)""".stripMargin))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"), col("dist"))

      // UPDATE: exact integer per-dim sums, rebuilt into dim-ordered arrays.
      if (i < iterations) {
        val sums = assigned.join(ev, "vec_id")
          .select(col("cid"), posexplode(col("vqs")).as(Seq("dim", "vq")))
          .groupBy("cid", "dim").agg(sum(col("vq")).as("sx"),
            count(lit(1)).as("cnt"))
        cent = graft.Caches.lazyBarrier(sums
          .groupBy("cid")
          .agg(expr("transform(array_sort(collect_list(struct(dim, sx))), p -> p.sx)")
            .as("sxs"),
            max(col("cnt")).as("cnt")))
      }
    }
    assigned
  }

  /** The unrolled CTE chain for `assign` (no WITH, no output) so callers
    * can embed k-means inside a larger WITH pipeline: `ev` (quantized
    * vectors from `evBody`), `c0` (seeds), then `iterations` generated
    * CTE pairs (assignment a_i, centroids c_i). The final assignment CTE
    * is `a<iterations>` with columns (vec_id, cid, dist).
    */
  def oracleCtes(k: Int, iterations: Int,
                 evBody: String = "SELECT vec_id, embedding FROM embeddings"): String = {
    def assignCte(i: Int) =
      s"""a$i AS (
         |  SELECT vec_id, cid, dist FROM (
         |    SELECT e.vec_id, c.cid,
         |      list_reduce(list_transform(generate_series(1, len(e.vqs)),
         |          j -> pow(CAST(e.vqs[j] AS DOUBLE)
         |                   - CAST(c.sxs[j] AS DOUBLE) / CAST(c.cnt AS DOUBLE), 2)),
         |        (x, y) -> x + y) AS dist,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        list_reduce(list_transform(generate_series(1, len(e.vqs)),
         |            j -> pow(CAST(e.vqs[j] AS DOUBLE)
         |                     - CAST(c.sxs[j] AS DOUBLE) / CAST(c.cnt AS DOUBLE), 2)),
         |          (x, y) -> x + y) ASC, c.cid ASC) AS rn
         |    FROM ev e CROSS JOIN c${i - 1} c) WHERE rn = 1)""".stripMargin
    def updateCte(i: Int) =
      s"""c$i AS (
         |  SELECT cid, list(sx ORDER BY dim) AS sxs, MAX(cnt) AS cnt FROM (
         |    SELECT a.cid, d.dim, SUM(e.vqs[d.dim]) AS sx, COUNT(*) AS cnt
         |    FROM a${i} a JOIN ev e USING (vec_id)
         |    CROSS JOIN (SELECT unnest(generate_series(1,
         |        (SELECT MAX(len(vqs)) FROM ev))) AS dim) d
         |    GROUP BY 1, 2) GROUP BY cid)""".stripMargin
    val iters = (1 to iterations).map { i =>
      if (i < iterations) assignCte(i) + ",\n" + updateCte(i) else assignCte(i)
    }.mkString(",\n")
    s"""ev AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS vqs
       |  FROM ($evBody)),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid,
       |    vqs AS sxs, CAST(1 AS BIGINT) AS cnt
       |  FROM ev ORDER BY vec_id LIMIT $k),
       |$iters""".stripMargin
  }

  /** Standalone oracle: the CTE chain over the `embeddings` table plus a
    * final projection (`outputSql` typically reads `a<iterations>`).
    */
  def oracleSql(k: Int, iterations: Int, outputSql: String): String =
    s"WITH ${oracleCtes(k, iterations)}\n$outputSql"
}

/** Farthest-point (k-center greedy, Gonzalez) coreset selection — the
  * diversity-maximizing complement to k-means: each round adds the point
  * farthest from everything already chosen (ties to the lower id),
  * yielding the classic 2-approximation of the k-center cover and a
  * monotonically shrinking covering radius.
  *
  * Same exactness scheme as [[KMeansLloyd]]: 1e-6-quantized integers,
  * per-row in-order distance folds over exact (a−b) BIGINTs, cross-row
  * MIN only (comparison, not accumulation — order-safe). The chosen set
  * is ≤ k rows, broadcast each round; rounds are lineage-barriered.
  */
object FarthestPoint {

  def select(embs: org.apache.spark.sql.DataFrame, idCol: String,
             vecCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = KMeansLloyd.quantized(embs, idCol, vecCol)
    var chosen = graft.Caches.lazyBarrier(ev.orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("vqs"), lit(1).as("rank"),
        lit(0.0d).as("radius")))
    for (r <- 2 to k) {
      val m = ev
        .join(chosen.select(col("vec_id").as("cid")),
          col("vec_id") === col("cid"), "left_anti")
        .crossJoin(broadcast(chosen.select(col("vqs").as("cvqs"))))
        .withColumn("dist", expr(
          """aggregate(zip_with(vqs, cvqs,
            |  (a, b) -> pow(CAST(a - b AS DOUBLE), 2D)),
            |  0D, (x, y) -> x + y)""".stripMargin))
        .groupBy("vec_id").agg(min(col("dist")).as("mind"))
      val p = m.orderBy(col("mind").desc, col("vec_id")).limit(1)
      // barriered EVERY round: chosen is referenced twice per round
      // (anti-join + broadcast), so the pageRank every-second-round
      // cadence re-doubles subtrees here and measured slower
      chosen = graft.Caches.lazyBarrier(chosen.unionByName(
        p.join(ev, "vec_id")
          .select(col("vec_id"), col("vqs"), lit(r).as("rank"),
            col("mind").as("radius"))))
    }
    chosen.select(col("rank").cast("int").as("rank"), col("vec_id"),
      col("radius"))
  }

  /** Unrolled DuckDB oracle over `embeddings` (MATERIALIZED CTEs — the
    * inlined form re-evaluates each round's predecessors exponentially).
    */
  def oracleSql(k: Int): String = {
    def dist(e: String, c: String) =
      s"""list_reduce(list_transform(generate_series(1, len($e.vqs)),
         |    j -> pow(CAST($e.vqs[j] - $c.vqs[j] AS DOUBLE), 2)),
         |  (x, y) -> x + y)""".stripMargin
    val rounds = (2 to k).map { r =>
      s"""m$r AS MATERIALIZED (
         |  SELECT e.vec_id, MIN(${dist("e", "c")}) AS mind
         |  FROM ev e CROSS JOIN c${r - 1} c
         |  WHERE e.vec_id NOT IN (SELECT vec_id FROM c${r - 1})
         |  GROUP BY 1),
         |p$r AS (
         |  SELECT vec_id, mind FROM m$r
         |  ORDER BY mind DESC, vec_id LIMIT 1),
         |c$r AS MATERIALIZED (
         |  SELECT * FROM c${r - 1}
         |  UNION ALL
         |  SELECT e.vec_id, e.vqs, $r AS rank, p.mind AS radius
         |  FROM p$r p JOIN ev e USING (vec_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS vqs
       |  FROM embeddings),
       |c1 AS MATERIALIZED (
       |  SELECT vec_id, vqs, 1 AS rank, CAST(0 AS DOUBLE) AS radius
       |  FROM ev ORDER BY vec_id LIMIT 1),
       |$rounds
       |SELECT CAST(rank AS INT) AS rank, vec_id,
       |  ROUND(radius / 1e12, 6) AS radius
       |FROM c$k ORDER BY rank""".stripMargin
  }
}

/** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998) —
  * the relevance-aware complement of [[FarthestPoint]]: greedily pick k
  * items maximizing λ·Rel(e) − (1−λ)·max sim to the already-picked set,
  * with similarity = −squared-L2 on the 1e-6 quantized grid and relevance
  * anchored to the lowest-id vector as the query. λ = 0.5 ⇒
  * score = 0.5·minDistToSelected − 0.5·distToQuery (both in vector
  * units). Round 1 is pure relevance (nearest to the query); every later
  * round trades relevance against diversity — the RAG-reranking /
  * demo-selection staple.
  *
  * Scale shape per round: one anti-join + one ≤k-row broadcast + a
  * per-row in-order fold — identical to FPS; distances come from exact
  * BIGINT grid coordinates so both engines fold identical doubles, and
  * ties break on vec_id. Oracle = unrolled MATERIALIZED CTEs.
  */
object MmrSelect {

  private def distTo(other: String): String =
    s"""aggregate(zip_with(vqs, $other,
       |  (a, b) -> pow(CAST(a - b AS DOUBLE), 2D)),
       |  0D, (x, y) -> x + y)""".stripMargin

  def select(embs: org.apache.spark.sql.DataFrame, idCol: String,
             vecCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val ev0 = KMeansLloyd.quantized(embs, idCol, vecCol)
    val q = ev0.orderBy("vec_id").limit(1)
    val ev = graft.Caches.lazyBarrier(ev0
      .join(q.select(col("vec_id").as("qid")),
        col("vec_id") === col("qid"), "left_anti")
      .crossJoin(broadcast(q.select(col("vqs").as("qvqs"))))
      .withColumn("dq", expr(distTo("qvqs")))
      .select("vec_id", "vqs", "dq"))
    var chosen = graft.Caches.lazyBarrier(
      ev.orderBy(col("dq").asc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("vqs"), col("dq"), lit(1).as("rank"),
          (lit(-0.5d) * (col("dq") / lit(1e12))).as("score")))
    for (r <- 2 to k) {
      val m = ev
        .join(chosen.select(col("vec_id").as("cid")),
          col("vec_id") === col("cid"), "left_anti")
        .crossJoin(broadcast(chosen.select(col("vqs").as("cvqs"))))
        .withColumn("ds", expr(distTo("cvqs")))
        .groupBy("vec_id").agg(min(col("ds")).as("mind"))
      val p = m.join(ev, "vec_id")
        .withColumn("score",
          lit(0.5d) * (col("mind") / lit(1e12)) -
            lit(0.5d) * (col("dq") / lit(1e12)))
        .orderBy(col("score").desc, col("vec_id")).limit(1)
      chosen = graft.Caches.lazyBarrier(chosen.unionByName(
        p.select(col("vec_id"), col("vqs"), col("dq"),
          lit(r).as("rank"), col("score"))))
    }
    chosen.select(col("rank").cast("int").as("rank"), col("vec_id"),
      col("score"))
  }

  /** Unrolled DuckDB oracle (MATERIALIZED CTEs, FPS-style). */
  def oracleSql(k: Int): String = {
    def dist(a: String, b: String) =
      s"""list_reduce(list_transform(generate_series(1, len($a)),
         |    j -> pow(CAST($a[j] - $b[j] AS DOUBLE), 2)),
         |  (x, y) -> x + y)""".stripMargin
    val rounds = (2 to k).map { r =>
      s"""m$r AS MATERIALIZED (
         |  SELECT e.vec_id, MIN(${dist("e.vqs", "c.vqs")}) AS mind
         |  FROM ev e CROSS JOIN c${r - 1} c
         |  WHERE e.vec_id NOT IN (SELECT vec_id FROM c${r - 1})
         |  GROUP BY 1),
         |p$r AS (
         |  SELECT e.vec_id, e.vqs, e.dq,
         |    0.5 * (m.mind / 1e12) - 0.5 * (e.dq / 1e12) AS score
         |  FROM m$r m JOIN ev e USING (vec_id)
         |  ORDER BY score DESC, e.vec_id LIMIT 1),
         |c$r AS MATERIALIZED (
         |  SELECT * FROM c${r - 1}
         |  UNION ALL
         |  SELECT vec_id, vqs, dq, $r AS rank, score FROM p$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev0 AS MATERIALIZED (
       |  SELECT vec_id, list_transform(embedding,
       |    v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS vqs
       |  FROM embeddings),
       |q AS MATERIALIZED (
       |  SELECT vec_id AS qid, vqs AS qvqs FROM ev0 ORDER BY vec_id LIMIT 1),
       |ev AS MATERIALIZED (
       |  SELECT e.vec_id, e.vqs, ${dist("e.vqs", "q.qvqs")} AS dq
       |  FROM ev0 e CROSS JOIN q WHERE e.vec_id <> q.qid),
       |c1 AS MATERIALIZED (
       |  SELECT vec_id, vqs, dq, 1 AS rank, -0.5 * (dq / 1e12) AS score
       |  FROM ev ORDER BY dq ASC, vec_id LIMIT 1),
       |$rounds
       |SELECT CAST(rank AS INT) AS rank, vec_id, ROUND(score, 6) AS score
       |FROM c$k ORDER BY rank""".stripMargin
  }
}
