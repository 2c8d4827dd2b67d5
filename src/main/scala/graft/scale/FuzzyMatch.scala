package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity matching (edit distance <= 1) without a cross join: the
  * deletion-neighborhood block. Every string's candidate key set is
  * itself plus each single-character deletion; two strings within one
  * edit (insert / delete / substitute) ALWAYS share at least one key
  * (substitution at i: both sides delete i; insert/delete: the shorter
  * string IS a deletion variant of the longer), so an equi-join on the
  * variant finds every true pair and `levenshtein` verifies the
  * survivors exactly.
  *
  * 100 TB posture: candidates are |key| + 1 variants per record joined on
  * a hashable string key — index size O(N·L), never the O(N·M) cross
  * join a naive fuzzy join costs; the verify runs only on block
  * collisions. This is the textual analog of the LSH band-bucket
  * discipline the near-dup family uses.
  */
object FuzzyMatch {

  /** The string plus all single-character deletions (distinct — deleting
    * any char of a same-char run yields one variant).
    */
  def deletionVariants(name: Column): Column =
    array_distinct(transform(
      sequence(lit(1), length(name) + 1),
      i => when(i === length(name) + 1, name)
        .otherwise(concat(name.substr(lit(1), i - 1),
          name.substr(i + 1, length(name))))))

  /** All (probe, master) pairs within edit distance 1. Output:
    * (probe_id, master_id, probe_name, master_name, distance).
    */
  def matchWithin1(probes: DataFrame, master: DataFrame,
                   idCol: String, nameCol: String): DataFrame = {
    def keyed(df: DataFrame, prefix: String) =
      df.select(col(idCol).as(s"${prefix}_id"), col(nameCol).as(s"${prefix}_name"))
        .withColumn("variant", explode(deletionVariants(col(s"${prefix}_name"))))
    keyed(probes, "probe").join(keyed(master, "master"), "variant")
      .select("probe_id", "master_id", "probe_name", "master_name").distinct()
      .withColumn("distance", levenshtein(col("probe_name"), col("master_name")))
      .filter(col("distance") <= 1)
  }
}
