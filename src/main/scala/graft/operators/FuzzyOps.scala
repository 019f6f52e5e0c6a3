package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) matching — the approximate-string side of
  * dedup candidate generation.
  *
  * Scale design: never the naive O(n²) cross product. Rows are first grouped
  * by a cheap blocking key (caller-chosen, e.g. brand + first token); the
  * pairwise `levenshtein` comparison runs only within a block, as a plain
  * equi-join on the block key that Catalyst shuffles by block. Comparison
  * cost is Σ|block|² instead of n² — at 1000× data the knob is the blocking
  * function (tighter key), not the join strategy. Oversized blocks are the
  * skew risk; bound them upstream (salt or cap) if the key distribution is
  * heavy-tailed.
  */
object FuzzyOps {

  /** Per-row fuzzy-duplicate summary over a blocked self-join.
    *
    * For every row with at least one within-block neighbour at edit
    * distance ≤ `maxDist` (excluding itself), returns the neighbour count,
    * the best (minimum) distance, and the deterministic best-match key
    * (ties broken by smallest key).
    *
    * @param df       input relation
    * @param keyCol   unique row key column name
    * @param nameCol  string column to compare
    * @param blockCol SQL expression producing the blocking key
    */
  def fuzzyMatchSummary(df: DataFrame, keyCol: String, nameCol: String,
      blockCol: String, maxDist: Int): DataFrame = {
    val b = df.select(col(keyCol).as("k"), col(nameCol).as("nm"),
      expr(blockCol).as("blk"))
    val a = b.select(col("k").as("a_key"), col("nm").as("a_nm"), col("blk"))
    val c = b.select(col("k").as("b_key"), col("nm").as("b_nm"), col("blk"))
    a.join(c, Seq("blk"))
      .where(col("a_key") =!= col("b_key"))
      .withColumn("d", levenshtein(col("a_nm"), col("b_nm")))
      .where(col("d") <= maxDist)
      .groupBy(col("a_key"))
      .agg(
        count(lit(1)).as("n_matches"),
        min(col("d")).cast("long").as("best_dist"),
        // struct ordering breaks distance ties by smallest neighbour key
        min_by(col("b_key"), struct(col("d"), col("b_key"))).as("best_match"))
  }
}
