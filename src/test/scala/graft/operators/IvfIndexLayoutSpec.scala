package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted ANN index layout: [[SimilarityOps.writeIvfPqIndex]] writes
  * (id, code word) cell-partitioned; [[SimilarityOps.readIvfPqIndexTopK]]
  * probes it through a broadcast join on the partition column. Pins the
  * three claims the layout makes: (1) search over the persisted index
  * equals the in-memory search bitwise (same models), (2) the probe scan
  * carries a dynamic-partition-pruning filter on `cell` — whole
  * directories are skipped, not rows, and (3) the on-disk layout is one
  * hive directory per inverted list with no embedding column anywhere.
  */
class IvfIndexLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("persisted cell-partitioned index: search parity, DPP pruning, vector-free layout") {
    val rnd = new scala.util.Random(41)
    val emb = (0 until 96).map(i => (i.toLong, Array.fill(32)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    // the query side must be FILE-backed for claim (2): DPP's insertion rule
    // wants a selective predicate on the pruning side, and a filter over an
    // in-memory LocalRelation constant-folds away (ConvertToLocalRelation)
    // before the rule runs — with an in-memory query set the probe join
    // still works, it just reads every partition. File-backed filtered
    // queries are the production shape.
    val embPath = java.nio.file.Files.createTempDirectory("ivf-emb-src").toString
    emb.write.mode("overwrite").parquet(embPath)
    val queries = spark.read.parquet(embPath).where(col("vec_id") < 3)
    val (centroids, books) = SimilarityOps.fitIvfPq(emb, nCentroids = 8, nSub = 4,
      nPqCentroids = 8, kmeansIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString

    SimilarityOps.writeIvfPqIndex(emb, centroids, books, dir)

    // (3) layout: hive cell=N directories; index rows carry id + codes only
    val cellDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.length <= 8, s"expected ≤8 cell dirs, got ${cellDirs.length}")
    val indexSchema = spark.read.parquet(dir).schema.fieldNames.toSet
    assert(indexSchema == Set("vec_id", "codes", "cell"),
      s"index must not carry vectors: $indexSchema")

    // (1) parity with the in-memory search under the same models
    val fromIndex = SimilarityOps.readIvfPqIndexTopK(spark, dir, queries,
      centroids, books, k = 5, nProbe = 3).collect().toSet
    val inMemory = SimilarityOps.ivfPqTopKWith(emb, queries, k = 5,
      centroids, books, nProbe = 3).collect().toSet
    assert(fromIndex == inMemory,
      s"index search diverged: ${(inMemory diff fromIndex) ++ (fromIndex diff inMemory)}")

    // (2) the probe join plans dynamic partition pruning on the scan
    val planned = SimilarityOps.readIvfPqIndexTopK(spark, dir, queries,
      centroids, books, k = 5, nProbe = 3)
    planned.collect()
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"probe scan must carry a dynamic partition-pruning filter on cell:\n$plan")
  }
}
