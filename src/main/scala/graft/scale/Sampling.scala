package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, auditable sampling for training-data mixtures.
  *
  * `rand(seed)` sampling is NOT reproducible at scale: the draw depends on
  * partition layout and task retries, so two runs of the same job (or a
  * recovered run) can keep different rows. Hash-gating on a stable key is
  * the production shape — keep a row iff
  * `polyHash(key ':' salt) mod 10000 < rate*10000`. The decision is a pure
  * function of (key, salt): re-runs, retries, repartitions, and even other
  * engines (the DuckDB oracle) agree row for row. Changing the salt draws
  * an independent sample; sweeping the rate with a fixed salt yields
  * nested samples (a 10% sample is a subset of the 20% one), which is how
  * scaling-law subsets stay comparable.
  */
object Sampling {

  /** Bucket in [0, 10000) for a key under a salt (4-decimal rate grid).
    *
    * Two deliberate mixing steps, both oracle-replayable:
    *   - the salt PREFIXES the key — a rolling hash diffuses a prefix
    *     through every step, whereas a suffix salt only offsets the final
    *     value (`h*31 + c`), making near-equal salts draw near-identical
    *     samples;
    *   - the hash is SQUARED mod P before bucketing (mid-square mixing) —
    *     the raw rolling hash has no avalanche on trailing characters, so
    *     consecutive keys ("…123", "…124") land in consecutive buckets and
    *     a plain `h % 10000` keeps contiguous id-runs instead of a sample.
    */
  def sampleBucket(key: Column, salt: String): Column = {
    val h = TextOps.polyHash(concat(lit(salt + ":"), key.cast("string")))
    ((h * h) % TextOps.P) % 10000
  }

  /** Full-modulus form of [[sampleBucket]] (same salt-prefix + mid-square
    * mixing, no 1e4 bucketing): a total-order key in [0, P) for seeded
    * shuffles and weighted draws.
    */
  def orderHash(key: Column, salt: String): Column = {
    val h = TextOps.polyHash(concat(lit(salt + ":"), key.cast("string")))
    (h * h) % TextOps.P
  }

  /** Uniform draw in (0, 1] derived from [[orderHash]] — the deterministic
    * stand-in for `rand()` every sampler here uses.
    */
  def uniformDraw(key: Column, salt: String): Column =
    (orderHash(key, salt).cast("double") + 1.0d) / (TextOps.P.toDouble + 1.0d)

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * every row draws u = uniform(0,1] from its hash and ranks by
    * u^(1/weight); the top n ARE a weight-proportional sample without
    * replacement. One hash + one pow per row, then a top-n
    * (TakeOrderedAndProject — per-partition heaps, no global sort), so the
    * draw costs one scan at any corpus size and is reproducible from
    * (salt, key) alone.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     n: Int, salt: String): DataFrame =
    df.withColumn("aes_key",
        pow(uniformDraw(col(keyCol), salt),
          lit(1.0d) / col(weightCol).cast("double")))
      .orderBy(col("aes_key").desc, col(keyCol))
      .limit(n)

  /** Per-group weighted cap: within every `groupCol` keep the `cap`
    * highest A-ES keys — [[capPerGroup]]'s weight-aware form (each kept
    * set is a weight-proportional without-replacement draw from its
    * group). Same WindowGroupLimit-friendly rank-and-filter shape.
    */
  def capPerGroupWeighted(df: DataFrame, keyCol: String, groupCol: String,
                          weightCol: String, cap: Int, salt: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(col("aes_key").desc, col(keyCol))
    df.withColumn("aes_key",
        pow(uniformDraw(col(keyCol), salt),
          lit(1.0d) / col(weightCol).cast("double")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk", "aes_key")
  }

  /** Keep ~`rate` of rows, decided purely by hash(key, salt). */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 salt: String): DataFrame =
    df.filter(sampleBucket(col(keyCol), salt) < math.round(rate * 10000).toInt)

  /** Per-stratum rates (e.g. per-language mixture weights); strata not in
    * `rates` use `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultRate * 10000).toInt)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(math.round(r * 10000).toInt)).otherwise(acc)
    }
    df.filter(sampleBucket(col(keyCol), salt) < threshold)
  }

  /** Rebalance a corpus to a target mixture over `stratumCol`: per-stratum
    * keep-rates are COMPUTED from the observed counts (rate_g =
    * scale·t_g/N_g with scale = min_g N_g/t_g — the largest output for
    * which no stratum is over-asked), then applied with the same
    * deterministic hash gate as [[hashSample]]. Strata not in `targets`
    * are dropped. This is the domain-reweighting step of a training
    * mixture (DoReMi-style fixed-weight application, not the optimizer):
    * two aggregations + one broadcast-sized join of per-stratum rates —
    * the corpus itself is touched once, and the decision stays a pure
    * function of (key, salt) so retries and the oracle agree row for row.
    */
  def rebalanceToTarget(df: DataFrame, keyCol: String, stratumCol: String,
                        targets: Map[String, Double], salt: String): DataFrame = {
    val share = targets.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("double")) { case (acc, (s, w)) =>
        when(col(stratumCol) === s, lit(w)).otherwise(acc)
      }
    val tagged = df.withColumn("target_share", share)
      .filter(col("target_share").isNotNull)
    val counts = tagged.groupBy(col(stratumCol)).agg(
      count(lit(1)).as("n_g"), first(col("target_share")).as("t_g"))
    val budget = counts.agg(
      min(col("n_g").cast("double") / col("t_g")).as("scale_c"))
    // budget is a 1-row aggregate: hint it so the plan stays a BNLJ even
    // when the broadcast threshold is disabled/outgrown (never a
    // CartesianProduct at scale)
    val rates = counts.crossJoin(broadcast(budget))
      .withColumn("rate", least(lit(1.0),
        col("scale_c") * col("t_g") / col("n_g").cast("double")))
    tagged.join(rates.select(col(stratumCol), col("rate")), Seq(stratumCol))
      .filter(sampleBucket(col(keyCol), salt) < round(col("rate") * 10000))
  }

  /** Temperature-flattened mixture (the multilingual "alpha sampling"
    * rule): target shares are COMPUTED from the observed stratum counts as
    * share_g ∝ N_g^alpha — alpha = 1 keeps the natural distribution,
    * alpha → 0 approaches uniform — then applied as per-stratum keep-rates
    * through the same deterministic hash gate as [[rebalanceToTarget]].
    * With alpha < 1 the SMALLEST stratum minimizes N_g/share_g, so the
    * tail is kept in full and only the head downsamples (flattening
    * without upsampling: rate_g = scale·share_g/N_g, scale =
    * min_g N_g/share_g). Same scale shape as rebalanceToTarget: two
    * aggregations + a broadcast-sized rate join; the corpus is scanned
    * once and every keep decision is a pure function of (key, salt).
    */
  def temperatureSample(df: DataFrame, keyCol: String, stratumCol: String,
                        alpha: Double, salt: String): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_g"))
    val z = counts.agg(sum(pow(col("n_g"), alpha)).as("z"))
    val shares = counts.crossJoin(broadcast(z))
      .withColumn("share", pow(col("n_g"), alpha) / col("z"))
    val budget = shares.agg(
      min(col("n_g").cast("double") / col("share")).as("scale_c"))
    val rates = shares.crossJoin(broadcast(budget))
      .withColumn("rate", least(lit(1.0),
        col("scale_c") * col("share") / col("n_g").cast("double")))
    df.join(rates.select(col(stratumCol), col("rate")), Seq(stratumCol))
      .filter(sampleBucket(col(keyCol), salt) < round(col("rate") * 10000))
  }

  /** Exactly-`n` deterministic global sample: every row ranked by its hash
    * bucket (ties → key), first n kept — "give me a reproducible 10k-doc
    * eval subset" without a full shuffle or a driver-side reservoir. Plans
    * as TakeOrderedAndProject: each partition keeps an n-row bounded heap,
    * the driver merges n·nPartitions candidates — no global sort of the
    * corpus, no rand() partition-layout dependence.
    */
  def fixedSizeSample(df: DataFrame, keyCol: String, n: Int,
                      salt: String): DataFrame = {
    require(n > 0, "n must be positive")
    df.orderBy(sampleBucket(col(keyCol), salt), col(keyCol)).limit(n)
  }

  /** Per-group cap — "at most `cap` docs per domain/source", the standard
    * guard against one crawl domain dominating a training mixture. Rows
    * within a group are ranked by the deterministic sample bucket (ties →
    * key), so WHICH rows survive is a pure function of (key, salt): the
    * kept set is a uniform-at-random-looking, reproducible draw rather
    * than "whatever arrived first", and re-runs/retries/other engines
    * agree row for row.
    *
    * Scale shape: one shuffle on the group key; the rank-≤-cap filter is
    * Spark's WindowGroupLimit rewrite (per-partition bounded heap before
    * any full sort), so a group with 10 M rows costs its partition a
    * cap-sized heap, not a 10 M-row sort.
    */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String, cap: Int,
                  salt: String): DataFrame = {
    require(cap > 0, "cap must be positive")
    // collision-safe internal name: withColumn silently REPLACES an
    // existing column, which on a generic utility surface would corrupt
    // caller data that happened to share the temp name
    val rk = Iterator.from(0).map(i => s"_cap_rk$i")
      .find(n => !df.columns.contains(n)).get
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(sampleBucket(col(keyCol), salt), col(keyCol))
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= cap)
      .drop(rk)
  }

  /** Deterministic train/val/test assignment: the bucket grid is carved
    * into contiguous ranges sized by `splits` (name -> fraction, summing to
    * ~1), and each row's split is a pure function of (key, salt) — the
    * leakage-proof form of a holdout: a document can never migrate between
    * splits across runs, retries, engines, or corpus growth (new docs land
    * in their own bucket; existing assignments never move). Zero shuffles —
    * one hash + one comparison chain per row.
    */
  def assignSplits(df: DataFrame, keyCol: String,
                   splits: Seq[(String, Double)], salt: String): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split fractions sum to $total, not 1")
    val b = sampleBucket(col(keyCol), salt)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // ordered when-chain over cumulative bounds; the last split absorbs the
    // rounding tail of the grid
    val assigned = splits.init.zip(cum.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), c)) =>
        val cond = b < lit(math.round(c * 10000).toInt)
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
      }
      .fold(lit(splits.head._1))(_.otherwise(lit(splits.last._1)))
    df.withColumn("split", assigned)
  }

  /** [[assignSplits]] keyed by near-dup CLUSTER, not document: every
    * member of a cluster draws its split from the cluster
    * representative's bucket, so a near-dup pair can never straddle
    * train/test — the leakage the per-doc form cannot see (a doc and its
    * near-duplicate hash to independent buckets; ~frac_a x frac_b of
    * pairs would cross splits and leak test content into training).
    * `clusters` = (doc, rep) from
    * [[graft.scale.Clusters.connectedComponents]] (its `node`/
    * `cluster_id` columns, renamed by the caller); docs in no cluster are
    * their own representative. One broadcast-size join (clusters table ~
    * the duplicate docs only) + the same zero-shuffle hash chain.
    */
  def assignSplitsByCluster(df: DataFrame, keyCol: String, clusters: DataFrame,
                            splits: Seq[(String, Double)], salt: String): DataFrame = {
    val rep = clusters.select(col("doc").as(keyCol), col("rep").as("_rep"))
    val withRep = df.join(rep, Seq(keyCol), "left")
      .withColumn("_split_key", coalesce(col("_rep"), col(keyCol)))
      .drop("_rep")
    assignSplits(withRep, "_split_key", splits, salt).drop("_split_key")
  }

  /** Weighted corpus mixture: each part is hash-sampled at its rate under
    * a part-specific salt and tagged `mix_source`. One scan per part, no
    * shuffle — the mixture is a pure filter + union.
    */
  def mixture(parts: Seq[(String, DataFrame, Double)], keyCol: String,
              salt: String): DataFrame =
    parts.map { case (tag, df, rate) =>
      hashSample(df, keyCol, rate, s"$salt/$tag")
        .withColumn("mix_source", lit(tag))
    }.reduce(_.unionByName(_))
}
