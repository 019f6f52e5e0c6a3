package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.security.MessageDigest

/** Multimodal-column operators: image/audio/video as opaque `binary` columns
  * with typed metadata, plus sniff / decode / feature-extract / frame-sample
  * stages.
  *
  * Container sniffing ([[sniffContainer]]: magic-byte format detection and
  * PNG IHDR dimensions) is REAL — pure expressions over header bytes, no
  * codec needed. The pixel/sample decode step is a clearly-marked
  * deterministic STUB — the codec libraries are not in this container — but
  * the Spark-side plumbing is the production shape: binary columns travel
  * in columnar batches, metadata extraction is a narrow per-partition pass
  * (one codec context per partition, not per row), and nothing widens the
  * binary payload through a shuffle. At 100 TB the binary column stays
  * pruned away unless a stage actually touches it (nested-schema pruning on
  * the parquet scan).
  */
object MultimodalOps {

  /** An opaque media payload with routing metadata. */
  final case class MediaRow(id: Long, mediaType: String, bytes: Array[Byte])

  /** Extracted features; `width`/`height` come from the decode stub. */
  final case class MediaFeature(
      id: Long, mediaType: String, byteLen: Long, sha256: String,
      width: Int, height: Int)

  /** STUB decode: a real implementation would hand `bytes` to an image/audio
    * decoder; this deterministic fake derives dimensions from content length
    * so tests exercise the full dataflow. Replace the body, keep the
    * signature. */
  def decodeStub(bytes: Array[Byte]): (Int, Int) =
    (64 + (bytes.length % 512), 64 + ((bytes.length * 7) % 512))

  private def sha256Hex(bytes: Array[Byte], md: MessageDigest): String =
    md.digest(bytes).map("%02x".format(_)).mkString

  /** Per-partition feature extraction: one digest/codec context per
    * partition, batch-shaped iteration — the `mapPartitions` pattern a real
    * decoder needs (expensive init amortised across the partition). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val (w, h) = decodeStub(r.bytes)
        MediaFeature(r.id, r.mediaType, r.bytes.length.toLong,
          sha256Hex(r.bytes, md), w, h)
      }
    }
  }

  /** STUB resize: a real implementation would decode, scale, and re-encode;
    * this deterministic fake subsamples every `factor`-th byte, preserving
    * the shape of the operation (binary → smaller binary, per partition). */
  def resizeStub(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(r =>
      r.copy(bytes = r.bytes.zipWithIndex.collect { case (b, i) if i % factor == 0 => b })))
  }

  /** Deterministic frame sampling: every `stride`-th slice of `frameLen`
    * bytes — the video-keyframe access pattern over an opaque payload. */
  def sampleFrames(media: Dataset[MediaRow], frameLen: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      Iterator.range(0, math.max(r.bytes.length - frameLen + 1, 0), stride * frameLen)
        .map(off => (r.id, off, r.bytes.slice(off, off + frameLen)))
    }.toDF("id", "frame_offset", "frame_bytes")
  }

  /** Column-level frame sampling: every `stride`-th `frameLen`-byte slice
    * of a binary column, as (id, frame_offset, frame_hex) rows — the same
    * access pattern as [[sampleFrames]] but expressed with
    * `sequence`+`explode`+`substr`, so it stays inside whole-stage codegen
    * and needs no typed serialization. Payloads shorter than one frame
    * yield no rows. The explode fan-out is bounded by payload/stride — a
    * narrow generator, no shuffle. */
  def frameSlices(df: DataFrame, binCol: String, idCol: String,
                  frameLen: Int, stride: Int): DataFrame = {
    require(frameLen > 0 && stride > 0, s"need frameLen>0, stride>0; got $frameLen, $stride")
    val step = stride.toLong * frameLen
    df.select(col(idCol), col(binCol),
        length(col(binCol)).cast("long").as("n"))
      .where(col("n") >= frameLen)
      .select(col(idCol),
        explode(sequence(lit(0L), col("n") - frameLen, lit(step))).as("frame_offset"),
        col(binCol))
      .select(col(idCol), col("frame_offset"),
        upper(hex(col(binCol).substr(col("frame_offset").cast("int") + 1,
          lit(frameLen)))).as("frame_hex"))
  }

  /** REAL (stub-free) container sniffing over an opaque binary column —
    * pure codegen'd expressions, no codec library: magic-byte format
    * detection (PNG/JPEG/GIF/RIFF/MP4) plus PNG dimensions parsed from the
    * IHDR chunk (PNG's first chunk is always IHDR, so width/height are
    * big-endian uint32s at fixed offsets 16/20 — parseable without a
    * decoder). Narrow per-row map over the first 24 bytes; at 100 TB this
    * is the "route by container type" dispatch ahead of the per-format
    * decode stage ([[extractFeatures]]'s mapPartitions pattern), and the
    * binary column's tail never leaves the scan. */
  def sniffContainer(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val hdr = upper(hex(substring(col(binCol), 1, 12))) // 24 hex chars
    val fmt = when(hdr.startsWith("89504E470D0A1A0A"), "png")
      .when(hdr.startsWith("FFD8FF"), "jpeg")
      .when(hdr.startsWith("474946383"), "gif") // GIF87a / GIF89a
      .when(hdr.startsWith("52494646"), "riff") // WAV / AVI / WebP envelope
      .when(substring(hdr, 9, 8) === "66747970", "mp4") // "ftyp" at byte 4
      .otherwise("unknown")
    df.select(
      col(idCol),
      fmt.as("format"),
      when(fmt === "png",
        conv(hex(substring(col(binCol), 17, 4)), 16, 10).cast("long")).as("png_width"),
      when(fmt === "png",
        conv(hex(substring(col(binCol), 21, 4)), 16, 10).cast("long")).as("png_height"))
  }

  /** Exact media deduplication over an opaque binary column — the
    * multimodal analog of [[DedupOps.exact]]: byte-identical payloads
    * (re-uploads, mirrored assets) collapse to one keeper. Content-hash
    * equality is BYTE equality, so two containers with the same inner
    * media but different envelopes (or PNGs differing only in metadata)
    * correctly stay distinct — exact dedup routes; near-dup lives in
    * perceptual-hash land. The hash is md5 over the uppercase hex encoding
    * (not the raw bytes) so any engine without blob hashing can recompute
    * it. One narrow hash pass, then a hash-partitioned window for keeper
    * and group size — one shuffle on the digest, the same plan as text
    * exact-dedup: at 100 TB hashing happens in the scan and only
    * (id, 32-char digest) rows reach the exchange, never payload bytes. */
  def exactBinaryDedup(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    df.select(col(idCol), md5(upper(hex(col(binCol)))).as("content_hash"))
      .withColumn("keeper_id", min(col(idCol)).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("is_dup", col(idCol) =!= col("keeper_id"))
  }

  /** Column-level metadata over any DataFrame with a binary column —
    * the oracle-checkable subset (length, digest, header bytes, stub dims).
    */
  def binaryMeta(df: DataFrame, binCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("byte_len"),
      md5(col(binCol)).as("digest"),
      upper(hex(substring(col(binCol), 1, 8))).as("header_hex"),
      (lit(64L) + length(col(binCol)).cast("long") % 512).as("width"),
      (lit(64L) + (length(col(binCol)).cast("long") * 7) % 512).as("height"))

  /** Documents table → media dataset (text bytes standing in for an opaque
    * payload; schema and partitioning are what's exercised). */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("id"), lit("text/plain").as("mediaType"),
        col("text").cast("binary").as("bytes"))
      .as[MediaRow]
  }
}
