package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal ingest path: opaque media files land via the built-in
  * `binaryFile` source as (path, length, content) rows and flow straight
  * into the binary-column operators — no custom reader needed, and the
  * pathGlobFilter/recursive options cover the bucket-of-blobs layout a
  * media corpus actually has.
  */
class BinaryFileSourceSpec extends SparkSpec {

  test("binaryFile source reads blobs into the multimodal operator chain") {
    val dir = java.nio.file.Files.createTempDirectory("blobs")
    val payloads = Map("a.bin" -> "alpha-bytes", "b.bin" -> "bee", "skip.txt" -> "nope")
    payloads.foreach { case (name, body) =>
      java.nio.file.Files.write(dir.resolve(name), body.getBytes("UTF-8"))
    }

    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin") // layout-level filtering at the source
      .load(dir.toString)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length"), col("content"))

    val rows = df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), new String(r.getAs[Array[Byte]](2), "UTF-8"))).toMap
    assert(rows == Map("a.bin" -> (11L, "alpha-bytes"), "b.bin" -> (3L, "bee")))

    // binary rows feed the existing metadata extractor unchanged
    import graft.operators.MultimodalOps
    val meta = MultimodalOps.binaryMeta(
      df.withColumn("id", col("name")), binCol = "content", idCol = "id")
    assert(meta.count() == 2)
  }
}
