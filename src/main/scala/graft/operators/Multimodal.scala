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

  /** Exact dedup over the binary payload (content-hash group-by): every
    * group of byte-identical blobs with the kept (minimum) doc id and
    * the duplicate count — Dedup.exact's shape on the binary column.
    * One keyed shuffle on the 32-byte content hash; at 100 TB of media
    * this is the cheapest dedup rung because only hashes shuffle, never
    * payload bytes.
    */
  def contentDedup(withBin: DataFrame): DataFrame =
    withBin.groupBy(sha2(col("payload"), 256).as("h"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))

  /** (doc_id, sh) distinct byte-n-gram hash sets of the payload — the
    * byte-domain twin of Dedup.shingleSets (one native codegen'd pass,
    * elements are xxhash64s of each n-byte window).
    */
  def byteGramSets(withBin: DataFrame, n: Int): DataFrame =
    withBin.select(col("doc_id"),
        graft.functions.TextOps.byteGramHashes(col("payload"), n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Locality near-dup over payload bytes: MinHash-LSH banded candidate
    * generation + exact byte-gram Jaccard confirm — the full Dedup
    * banding machinery on the byte domain, so blob near-dedup is NEVER
    * all-pairs (the 100 TB contract: shuffles are keyed by band hash,
    * pairwise work is confirm-only). For real media, a decoder-derived
    * perceptual byte stream (frame luma, downsampled PCM) feeds the same
    * operator; here the payload bytes stand in (decode stub, file doc).
    * Output: (doc_a, doc_b, jac).
    */
  def nearDupBlobs(withBin: DataFrame, n: Int, threshold: Double): DataFrame =
    Dedup.nearDupBySets(byteGramSets(withBin, n), threshold)

  /** (doc_id, sh) winnowed byte-fingerprint sets of the payload —
    * ~|blob|/w fingerprints per blob instead of ~|blob| gram hashes
    * (one native codegen'd pass; see TextHash.byteWinnowHashes).
    */
  def winnowSets(withBin: DataFrame, n: Int, w: Int): DataFrame =
    withBin.select(col("doc_id"),
        graft.functions.TextOps.byteWinnowHashes(col("payload"), n, w).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Winnowed blob near-dup: the CHEAP rung above [[nearDupBlobs]] for
    * large blobs — fingerprint cardinality is bounded at ~|blob|/w, so
    * both the candidate join and the exact-Jaccard confirm do ~w× less
    * work per blob than the full byte-gram path, and the candidate
    * generator (a postings join on the fingerprint value,
    * Dedup.nearDupByPostings) is EXHAUSTIVE rather than probabilistic:
    * any pair with jac >= threshold shares a fingerprint by
    * construction. Jaccard here is over winnowed fingerprint sets — the
    * standard winnowing similarity (MOSS), deterministic and
    * oracle-recomputable, approximating gram Jaccard with resolution w.
    * Output: (doc_a, doc_b, jac).
    */
  def nearDupBlobsWinnow(withBin: DataFrame, n: Int, w: Int,
                         threshold: Double): DataFrame =
    Dedup.nearDupByPostings(winnowSets(withBin, n, w), threshold)

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
