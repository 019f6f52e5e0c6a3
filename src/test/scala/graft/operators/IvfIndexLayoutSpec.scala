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

  test("continuous index maintenance: streamed appends land in the same cells, search sees them") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(43)
    val base = (0 until 64).map(i => (i.toLong, Array.fill(32)(rnd.nextFloat() * 2 - 1)))
    val emb = base.toDF("vec_id", "embedding")
    val (centroids, books) = SimilarityOps.fitIvfPq(emb, nCentroids = 8, nSub = 4,
      nPqCentroids = 8, kmeansIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf-index-append").toString
    SimilarityOps.writeIvfPqIndex(emb, centroids, books, dir)

    // new vectors arrive as a stream: exact doubled copies of low-id corpus
    // members (scaling by 2 preserves every cell assignment and cosine) —
    // each micro-batch is coded against the SAME frozen models and appended
    // cell-partitioned, the foreachBatch maintenance loop of a live index
    val incoming = (0 until 4).map { i =>
      val (id, v) = base(i)
      (1000L + id, v.map(_ * 2f))
    }
    val in = MemoryStream[(Long, Array[Float])](spark)
    val q = in.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        SimilarityOps.writeIvfPqIndex(b, centroids, books, dir, mode = "append")
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ivf-append-ckpt").toString)
      .start()
    in.addData(incoming.take(2))
    q.processAllAvailable()
    in.addData(incoming.drop(2))
    q.processAllAvailable()
    q.stop()

    // the appended rows carry the codes the batch build would assign...
    val union = (base ++ incoming).toDF("vec_id", "embedding")
    val expectCodes = SimilarityOps.ivfPqCode(union, centroids, books)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val gotCodes = spark.read.parquet(dir)
      .select(col("vec_id"), col("cell").cast("int"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(gotCodes == expectCodes, "streamed appends must code like the batch build")

    // ...and search over the maintained index equals in-memory search over
    // the unioned corpus (same models throughout)
    val queries = union.where(col("vec_id") === 1000L || col("vec_id") === 1L)
    val fromIndex = SimilarityOps.readIvfPqIndexTopK(spark, dir, queries,
      centroids, books, k = 3, nProbe = 8).collect().toSet
    val inMemory = SimilarityOps.ivfPqTopKWith(union, queries, k = 3,
      centroids, books, nProbe = 8).collect().toSet
    assert(fromIndex == inMemory, "maintained index diverged from batch rebuild")
  }
}
