package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables.t

/** Multimodal-column plumbing: treat content as an opaque `binary` column
  * with typed metadata, processed in executor-side BATCHES via
  * mapPartitions (the Scala analogue of `mapInPandas` batch shape).
  *
  * The decode step is a clearly-marked STUB — no image/audio codecs exist in
  * this container — replaced by a deterministic md5-derived fake, so the
  * Spark-side plumbing (schema, batching, partitioning) is real and the
  * values are oracle-checkable.
  */
object MultimodalOps {

  final case class MmMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int, channels: Int)

  /** STUB decode: deterministic fake dimensions from the content hash.
    * A real deployment swaps this body for an actual codec call; the
    * signature (bytes in, typed metadata out) and the batched driver loop
    * stay as-is. */
  def stubDecode(docId: Long, bytes: Array[Byte]): MmMeta = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString
    val width = 1 + Integer.parseInt(h.substring(0, 3), 16) % 1024
    val height = 1 + Integer.parseInt(h.substring(3, 6), 16) % 1024
    MmMeta(docId, bytes.length.toLong, width, height, 3)
  }

  /** Binary column → batched "decode" → typed metadata. Batching (32 rows)
    * mirrors the arrow-batch shape a vectorized UDF would see. */
  def mmMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(32).flatMap { batch => // batch boundary = vectorized-UDF shape
          batch.map { case (id, bytes) => stubDecode(id, bytes) }
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> mmMeta _)

  val oracles: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(1 + CAST('0x' || substr(md5(text), 1, 3) AS INT) % 1024 AS INT) AS width,
         CAST(1 + CAST('0x' || substr(md5(text), 4, 3) AS INT) % 1024 AS INT) AS height,
         CAST(3 AS INT) AS channels
         FROM documents ORDER BY doc_id""")
}
