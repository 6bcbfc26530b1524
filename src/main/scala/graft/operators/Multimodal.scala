package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media carried as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The decode step is a STUB (no image/audio codecs in this container):
  * `decodeStub` derives deterministic fake features from the bytes. The
  * Spark-side shape is real — binary column, typed Dataset batches via
  * mapPartitions (the Scala analog of mapInPandas: one iterator per
  * partition, amortizing per-batch decoder setup), explicit output schema,
  * partition-count control for decoder parallelism.
  */
object Multimodal {

  /** A media row: id + opaque payload + declared modality. */
  case class MediaRecord(doc_id: Long, media: Array[Byte], modality: String)

  /** Extracted features (what a real image/audio decoder would emit). */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      first_byte: Int,
      fake_width: Int,
      fake_height: Int,
      embedding: Array[Float])

  /** STUB decoder: a real implementation would decode image/audio here
    * (e.g. JPEG → pixels). Deterministic stand-in: geometry from payload
    * length, an 8-dim "embedding" from byte moments.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val b = r.media
    val emb = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < b.length) { acc += (b(j) & 0xff); j += 8 }
      (acc % 1000).toFloat / 1000f
    }
    MediaFeatures(r.doc_id, b.length.toLong,
      if (b.isEmpty) -1 else b(0) & 0xff,
      fake_width = (b.length % 640) + 1,
      fake_height = (b.length % 480) + 1,
      embedding = emb)
  }

  /** The pipeline: text → binary payload (stand-in for stored media blobs),
    * repartition for decoder parallelism, batch-decode, typed features out.
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, partitions: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("media"),
        lit("text/plain").as("modality"))
      .as[MediaRecord]
      .repartition(partitions)
      .mapPartitions { batch =>
        // per-partition decoder init would go here (load codec once)
        batch.map(decodeStub)
      }
  }
}
