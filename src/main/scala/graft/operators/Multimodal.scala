package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by typed partition-level ops (the Scala analogue of
  * mapInPandas batches). The actual media codecs are NOT available in this
  * container, so the decode step is a clearly-marked deterministic stub —
  * the Spark-side contract (schema, batch shape, partition-parallel
  * processing, no driver collect) is real and tested.
  */
object Multimodal {

  /** Attach a binary payload column. Here the payload is the UTF-8 bytes of
    * the text (a deterministic stand-in for image/audio bytes) plus typed
    * metadata, mirroring how a real corpus carries `image BINARY,
    * width INT, ...` columns.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      concat(lit("doc/"), (col("doc_id") % 3).cast("string")).as("media_type"))

  /** STUB decode: a real deployment would decode image/audio bytes here
    * (codec libraries absent in this container). Deterministic identity
    * stand-in so downstream feature shapes are real.
    */
  private def decodeStub(bytes: Array[Byte]): Array[Byte] = bytes

  /** Feature extraction over binary payloads: 16-bin byte histogram per
    * document, computed partition-parallel with a typed map (batch shape:
    * one row in, one fixed-width feature row out).
    */
  def byteHistogram(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    import spark.implicits._
    withBin.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        val bytes = decodeStub(raw)
        val hist = new Array[Long](16)
        bytes.foreach(b => hist((b & 0xff) >>> 4) += 1)
        (id, bytes.length.toLong, hist.toSeq)
      })
      .toDF("doc_id", "n_bytes", "hist16")
  }

  /** Frame sampling: slice the payload into fixed-size frames and keep
    * every `stride`-th one (video frame-sample shape: offsets + frame
    * checksums, not the frames themselves, leave the executor).
    */
  def frameSample(withBin: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val spark = withBin.sparkSession
    import spark.implicits._
    withBin.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        val bytes = decodeStub(raw)
        val nFrames = bytes.length / frameBytes
        val sampled = (0 until nFrames by stride).map { f =>
          val frame = bytes.slice(f * frameBytes, (f + 1) * frameBytes)
          // 32-bit-masked polynomial checksum: wrap-free in 64-bit math, so
          // the same value is computable exactly in the SQL oracle (BIGINT
          // overflow errors in DuckDB rule out Java Long wrap semantics)
          frame.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) & 0xffffffffL)
        }
        (id, nFrames.toLong, sampled.length.toLong, sampled)
      })
      .toDF("doc_id", "n_frames", "n_sampled", "frame_sums")
  }
}
