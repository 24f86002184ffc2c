package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque media blob. */
case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long, format: String)

/** Multimodal-column plumbing: media (image/audio/video) is carried as
  * an opaque BINARY column + typed metadata struct; decode /
  * feature-extract runs as a partition-local batch function
  * (`mapPartitions` over `Dataset[(id, bytes)]` — the Scala analog of
  * `mapInPandas`: one JVM-side batch per partition, no per-row overhead,
  * no data leaves the executor).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * container): `decodeStub` derives deterministic fake dimensions from
  * the byte payload. The Spark-side contract — binary column schema,
  * partition-preserving batch shape, typed output Encoder — is real and
  * is what a codec drop-in would inherit unchanged.
  */
object Multimodal {

  /** Deterministic fake decode — replace with a real codec. Reads only
    * cheap properties of the payload so behavior is reproducible and
    * oracle-checkable.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(
      doc_id = id,
      n_bytes = n,
      width = 64L + (n % 57L) * 16L,
      height = 64L + (n % 37L) * 16L,
      format = (n % 3L) match {
        case 0L => "png"
        case 1L => "jpeg"
        case _ => "webp"
      })
  }

  /** Attach media metadata to a DataFrame holding (idCol LONG, binCol
    * BINARY). Executes as one partition-local pass.
    */
  def extractMeta(spark: SparkSession, df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** Demo source: treat each document's UTF-8 bytes as an opaque blob —
    * exercises the binary-column path end-to-end on the test corpus.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] =
    extractMeta(spark, docs.withColumn("blob", encode(col("text"), "UTF-8")), "doc_id", "blob")
}
