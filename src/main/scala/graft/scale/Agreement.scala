package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-rater agreement statistics (SURVEY §7 eval layer): Cohen's kappa
  * (two raters), Fleiss' kappa (fixed m raters), Krippendorff's alpha
  * (nominal metric, complete data) — the standard labeling-QA trio.
  *
  * Shared discipline: every confusion count, marginal product and pair
  * count stays BIGINT through the aggregations; doubles appear only in
  * one final expression written identically for Spark and the DuckDB
  * oracles. Hand-computed textbook values are pinned in AgreementSpec —
  * the check the oracle parity CANNOT provide (a formula error would be
  * mirrored by the oracle and hash-match anyway).
  *
  * Scale shape: everything reduces map-side to |classes|- or
  * |units|-sized frames before any join; the final scalar row is two
  * bounded broadcasts.
  */
object Agreement {

  /** Cohen's kappa between label columns `a` and `b`: one row
    * (n, agree, po, pe, kappa).
    *
    * Rows where either label is NULL are EXCLUDED (a null row would
    * otherwise count toward n but never toward agree or the marginals —
    * silently depressing po without touching pe). Degenerate input where
    * both raters emit a single class makes pe = 1 and kappa 0/0 = NaN by
    * definition — callers wanting a guard should check pe < 1; the spec
    * pins only non-degenerate fixtures, matching the statistic's domain.
    */
  def cohenKappa(df: DataFrame, a: String, b: String): DataFrame = {
    val rated = df.filter(col(a).isNotNull && col(b).isNotNull)
    val tot = rated.agg(count(lit(1)).as("n"),
      sum(when(col(a) === col(b), 1L).otherwise(0L)).as("agree"))
    val ma = rated.groupBy(col(a).as("cls")).agg(count(lit(1)).as("na"))
    val mb = rated.groupBy(col(b).as("cls")).agg(count(lit(1)).as("nb"))
    val peNum = ma.join(mb, "cls").agg(sum(col("na") * col("nb")).as("pe_num"))
    tot.crossJoin(broadcast(peNum))
      .select(col("n"), col("agree"),
        round(col("agree").cast("double") / col("n").cast("double"), 6).as("po"),
        round(col("pe_num").cast("double") /
          (col("n").cast("double") * col("n").cast("double")), 6).as("pe"),
        round((col("agree").cast("double") / col("n").cast("double") -
          col("pe_num").cast("double") /
            (col("n").cast("double") * col("n").cast("double"))) /
          (lit(1.0d) - col("pe_num").cast("double") /
            (col("n").cast("double") * col("n").cast("double"))), 6).as("kappa"))
  }

  /** Fleiss' kappa over a melted (unit, cls) frame with exactly `m`
    * ratings per unit: one row (n_units, p_bar, p_e, fleiss_kappa).
    */
  def fleissKappa(melt: DataFrame, unitCol: String, clsCol: String,
                  m: Int): DataFrame = {
    val pairs = (m * (m - 1)).toDouble
    val obs = melt.groupBy(col(unitCol), col(clsCol))
      .agg(count(lit(1)).as("k"))
      .groupBy(col(unitCol)).agg(sum(col("k") * (col("k") - 1)).as("agree_ord"))
      .agg(count(lit(1)).as("n_units"), sum("agree_ord").as("agree_sum"))
    val exp_ = melt.groupBy(col(clsCol)).agg(count(lit(1)).as("nc"))
      .agg(sum("nc").as("nn"), sum(col("nc") * col("nc")).as("sq_sum"))
    obs.crossJoin(broadcast(exp_))
      .select(col("n_units"),
        round(col("agree_sum").cast("double") /
          (lit(pairs) * col("n_units").cast("double")), 6).as("p_bar"),
        round(col("sq_sum").cast("double") /
          (col("nn").cast("double") * col("nn").cast("double")), 6).as("p_e"),
        round((col("agree_sum").cast("double") /
            (lit(pairs) * col("n_units").cast("double")) -
          col("sq_sum").cast("double") /
            (col("nn").cast("double") * col("nn").cast("double"))) /
          (lit(1.0d) - col("sq_sum").cast("double") /
            (col("nn").cast("double") * col("nn").cast("double"))), 6)
          .as("fleiss_kappa"))
  }

  /** Krippendorff's alpha (nominal, complete data) over a melted
    * (unit, cls) frame with exactly `m` ratings per unit: one row
    * (n_units, dis_pairs, n_values, d_obs, d_exp, alpha).
    */
  def krippendorffAlpha(melt: DataFrame, unitCol: String, clsCol: String,
                        m: Int): DataFrame = {
    val unitPairs = (m * (m - 1) / 2).toLong
    val perUnit = melt.groupBy(col(unitCol), col(clsCol))
      .agg(count(lit(1)).as("k"))
      .groupBy(col(unitCol))
      .agg(sum(expr("(k * (k - 1)) div 2")).as("agree_pairs"))
    val obs = perUnit.agg(count(lit(1)).as("n_units"),
      sum(lit(unitPairs) - col("agree_pairs")).as("dis_pairs"))
    val exp_ = melt.groupBy(col(clsCol)).agg(count(lit(1)).as("nc"))
      .agg(sum("nc").as("nn"), sum(col("nc") * (col("nc") - 1)).as("agree_ord"))
    obs.crossJoin(broadcast(exp_))
      .select(col("n_units"), col("dis_pairs"), col("nn").as("n_values"),
        round(col("dis_pairs").cast("double") /
          (lit(unitPairs.toDouble) * col("n_units").cast("double")), 6).as("d_obs"),
        round((col("nn").cast("double") * (col("nn").cast("double") - 1.0d) -
          col("agree_ord").cast("double")) /
          (col("nn").cast("double") * (col("nn").cast("double") - 1.0d)), 6)
          .as("d_exp"),
        round(lit(1.0d) -
          (col("dis_pairs").cast("double") /
            (lit(unitPairs.toDouble) * col("n_units").cast("double"))) /
          ((col("nn").cast("double") * (col("nn").cast("double") - 1.0d) -
            col("agree_ord").cast("double")) /
            (col("nn").cast("double") * (col("nn").cast("double") - 1.0d))), 6)
          .as("alpha"))
  }
}
