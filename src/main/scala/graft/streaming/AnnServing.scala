package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.SimilarityOps

/** Streaming QUERY-side ANN serving over the persisted IVF-PQ index — the
  * counterpart of the streamed ingest path (`ivfPqCode` + append in
  * `StreamingPqIngestSpec`): query vectors arrive as a stream, each
  * micro-batch runs the SAME DPP-pruned probe join as the batch search
  * ([[SimilarityOps.readIvfPqIndexTopK]]) against the frozen models, and
  * results flow to the caller's sink.
  *
  * Shape: foreachBatch, not a declarative stream-static join — the search's
  * per-query top-k ranking window is not available under streaming
  * semantics, and foreachBatch hands each micro-batch to exactly the batch
  * plan (broadcast query side → file-level partition pruning on the cell
  * directories), so serving inherits the index layout's scale properties
  * per batch: a b-query batch probing p cells reads p inverted lists, never
  * the index. Model lifecycle contract: `centroids`/`books` must be the
  * pair the index is currently written under — after a
  * [[SimilarityOps.refitIvfPqIndex]], restart the serving query with the
  * new models (the old ones describe nothing on disk).
  */
object AnnServing {

  /** A ready-to-`start()` writer: each micro-batch of query vectors
    * (idCol, vecCol) is searched against the index at `path`; `sink`
    * receives (top-k DataFrame, batch id). Exactly-once is the sink's
    * concern (pair with an idempotent writer keyed on batch id — the
    * [[IdempotentParquetSink]] pattern). */
  def topKWriter(queries: DataFrame, path: String,
                 centroids: Array[(Int, Seq[Double], Double)],
                 books: Array[Array[Seq[Double]]],
                 k: Int, nProbe: Int = 4,
                 vecCol: String = "embedding", idCol: String = "vec_id")
                (sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    queries.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val topK = SimilarityOps.readIvfPqIndexTopK(batch.sparkSession, path, batch,
        centroids, books, k, nProbe, vecCol, idCol)
      sink(topK, batchId)
    }
}
