package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) matching — the approximate-string side of
  * dedup candidate generation.
  *
  * Scale design: never the naive O(n²) cross product. Rows are first grouped
  * by a cheap blocking key (caller-chosen, e.g. brand + first token), and the
  * pairwise `levenshtein` comparison runs over DISTINCT (block, name) groups,
  * not rows: with repeated names the comparison count is quadratic in the
  * vocabulary per block, independent of row count — at 1000× the data the
  * same name table is compared, only the group-count join grows. Per-row
  * results are then reconstituted from the group summaries. Oversized blocks
  * remain the skew risk; bound them upstream if the key distribution is
  * heavy-tailed.
  */
object FuzzyOps {

  /** Per-row fuzzy-duplicate summary over a blocked self-join.
    *
    * For every row with at least one within-block neighbour at edit
    * distance ≤ `maxDist` (excluding itself), returns the neighbour count,
    * the best (minimum) distance, and the deterministic best-match key
    * (distance ties broken by smallest neighbour key).
    *
    * @param df       input relation
    * @param keyCol   unique row key column name
    * @param nameCol  string column to compare
    * @param blockCol SQL expression producing the blocking key
    */
  def fuzzyMatchSummary(df: DataFrame, keyCol: String, nameCol: String,
      blockCol: String, maxDist: Int): DataFrame = {
    val rows = df.select(col(keyCol).as("k"), col(nameCol).as("nm"),
      expr(blockCol).as("blk"))

    // One row per (block, name): group count and the two smallest keys
    // (kmin2 serves rows that ARE the group minimum). A single window pass
    // partitioned by the group provides all three.
    val w = Window.partitionBy("blk", "nm")
    val ranked = rows
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(w.orderBy("k")))
    val groups = ranked.where(col("rn") <= 2)
      .groupBy("blk", "nm")
      .agg(max(col("cnt")).as("cnt"),
        max(when(col("rn") === 1, col("k"))).as("kmin"),
        max(when(col("rn") === 2, col("k"))).as("kmin2"))

    // Distinct-name comparison: within a block, distinct names always differ
    // (d ≥ 1), so the own-group d=0 case never appears here.
    val a = groups.select(col("blk"), col("nm").as("a_nm"), col("cnt").as("a_cnt"))
    val b = groups.select(col("blk"), col("nm").as("b_nm"), col("cnt").as("b_cnt"),
      col("kmin").as("b_kmin"))
    val other = a.join(b, Seq("blk"))
      .where(col("a_nm") =!= col("b_nm"))
      // bounded edit distance: the threshold variant bands the DP to
      // O(maxDist·len) per pair (returns -1 when exceeded) instead of
      // O(len²) — the per-comparison knob once blocking has bounded the
      // comparison count
      .withColumn("d", levenshtein(col("a_nm"), col("b_nm"), maxDist))
      .where(col("d").between(0, maxDist))
      .groupBy(col("blk"), col("a_nm").as("nm"))
      .agg(
        sum(col("b_cnt")).as("n_other"),
        min(col("d")).as("d_other"),
        min_by(col("b_kmin"), struct(col("d"), col("b_kmin"))).as("match_other"))

    // Reconstitute per-row answers: own-group duplicates are distance 0 and
    // dominate; otherwise fall back to the best other-name group.
    ranked.select(col("k"), col("nm"), col("blk"), col("cnt"))
      .join(groups.select(col("blk"), col("nm"), col("kmin"), col("kmin2")), Seq("blk", "nm"))
      .join(other, Seq("blk", "nm"), "left")
      .withColumn("n_matches", col("cnt") - 1 + coalesce(col("n_other"), lit(0L)))
      .where(col("n_matches") > 0)
      .select(
        col("k").as("a_key"),
        col("n_matches"),
        when(col("cnt") >= 2, lit(0L))
          .otherwise(col("d_other").cast("long")).as("best_dist"),
        when(col("cnt") >= 2,
            when(col("k") === col("kmin"), col("kmin2")).otherwise(col("kmin")))
          .otherwise(col("match_other")).as("best_match"))
  }

  /** Blocked Jaro–Winkler candidate pairs: every distinct within-block
    * name pair scoring ≥ `threshold` — the transposition-tolerant,
    * prefix-weighted scorer record linkage prefers over raw edit distance
    * for person/product names. Scoring runs the native codegen'd
    * [[graft.plans.JaroWinklerSim]] expression (semantics pinned to
    * DuckDB's jaro_winkler_similarity).
    *
    * Same scale discipline as [[fuzzyMatchSummary]]: comparisons run over
    * DISTINCT (block, name) — quadratic in the per-block name VOCABULARY,
    * independent of row count — and the self-join is block-keyed, so no
    * cross product ever forms. Bound oversized blocks upstream when the
    * key is heavy-tailed. */
  def jaroWinklerPairs(df: DataFrame, nameCol: String, blockCol: String,
                       threshold: Double): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must be in [0,1], got $threshold")
    val names = df
      .select(expr(blockCol).as("blk"), col(nameCol).as("nm"))
      .where(col("nm").isNotNull)
      .distinct()
    val a = names.select(col("blk"), col("nm").as("nm_a"))
    val b = names.select(col("blk"), col("nm").as("nm_b"))
    a.join(b, Seq("blk"))
      .where(col("nm_a") < col("nm_b"))
      .withColumn("sim",
        call_function("jaro_winkler", col("nm_a"), col("nm_b")))
      .where(col("sim") >= threshold)
      .select(col("blk"), col("nm_a"), col("nm_b"), round(col("sim"), 6).as("sim"))
  }
}
