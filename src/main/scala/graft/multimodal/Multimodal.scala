package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (BASELINE north star: "image/audio/video as
  * opaque binary columns with typed metadata"). The container ships no
  * image/audio codecs, so the DECODE step is a clearly-marked
  * deterministic stub ([[stubDecodeFeatures]]) — what is real, and
  * tested, is everything Spark-side: the binary column + metadata schema,
  * the batched `mapPartitions` operator shape (the JVM twin of a Pandas
  * `mapInPandas` batch), partition preservation, and the feature/frame
  * schemas downstream operators consume.
  *
  * The binary payload is the document's UTF-8 text bytes — deterministic,
  * fixture-derived, and (the corpus being ASCII) byte-equal to what
  * DuckDB sees as characters, so even the stubbed feature math is
  * oracle-gated instead of merely smoke-tested.
  *
  * Scale notes: payloads stay opaque until the one `mapPartitions` pass;
  * metadata-only queries prune the binary column at the scan (columnar
  * parquet — verified via ReadSchema). Feature extraction is
  * embarrassingly parallel, no shuffle; repartition count is the only
  * knob at 100 TB.
  */
object Multimodal {

  /** Documents as a multimodal asset table: opaque `payload` binary +
    * typed metadata struct (media kind, byte length, fake WxH derived
    * from the length — stands in for a real container-header parse).
    */
  def assets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(
      $"doc_id",
      encode($"text", "UTF-8").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("kind"),
        octet_length(encode($"text", "UTF-8")).as("n_bytes"),
        ($"n_chars" % 640 + 1).cast("long").as("width"),
        ($"n_chars" % 480 + 1).cast("long").as("height")).as("meta"))
  }

  private val FeatureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("f0", LongType), StructField("f1", LongType),
    StructField("f2", LongType), StructField("f3", LongType)))

  /** STUB DECODE — stands in for image/audio decoding (no codecs in this
    * container): features are a 4-bucket byte histogram (byte % 4) of the
    * payload. Deterministic; replace with a real decoder without touching
    * the operator shape. Runs as one batched `mapPartitions` pass so a
    * real decoder amortizes model/codec init per partition, exactly like
    * a Pandas-UDF batch.
    */
  def stubDecodeFeatures(assets: DataFrame): DataFrame = {
    val s = assets.sparkSession
    val rdd = assets.select(col("doc_id"), col("payload"), col("meta.kind"))
      .rdd.mapPartitions { it =>
        // per-partition init would go here (codec / model handle)
        it.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val kind = r.getString(2)
          val hist = new Array[Long](4)
          var i = 0
          while (i < payload.length) {
            hist((payload(i) & 0xff) % 4) += 1L
            i += 1
          }
          Row(id, kind, hist(0), hist(1), hist(2), hist(3))
        }
      }
    s.createDataFrame(rdd, FeatureSchema)
  }

  /** Frame sampling for "video" payloads: every `stride`-th byte is a
    * "frame", emitted as (doc_id, frame_idx, frame_byte) — the Spark
    * shape of video frame extraction (explode of a per-asset sample), as
    * a codegen'd Column pipeline, no UDF.
    */
  def sampleFrames(assets: DataFrame, stride: Int, maxFrames: Int): DataFrame = {
    assets
      .filter(col("meta.kind") === "video" && col("meta.n_bytes") > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), least(
            floor((col("meta.n_bytes") - 1) / stride),
            lit(maxFrames - 1L))),
          j => getbit_byte(col("payload"), j * stride)))
          .as(Seq("frame_idx", "frame_byte")))
  }

  /** byte at 0-based position `pos` of a binary column, as BIGINT
    * (ASCII payloads: byte value == decoded char code).
    */
  private def getbit_byte(payload: org.apache.spark.sql.Column,
                          pos: org.apache.spark.sql.Column) =
    ascii(decode(substr(payload, pos.cast("int") + 1, lit(1)), "UTF-8")).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata-only scan: the binary column must be pruned (ReadSchema).
    "q85_mm_metadata" -> ((s, d) => {
      import s.implicits._
      assets(s, d)
        .select($"doc_id", $"meta.kind".as("kind"),
          $"meta.n_bytes".as("n_bytes"), $"meta.width".as("width"),
          $"meta.height".as("height"))
        .orderBy($"doc_id")
    }),

    // Stubbed decode via batched mapPartitions; oracle checks the
    // histogram math through the text view of the same bytes.
    "q86_mm_features" -> ((s, d) => {
      import s.implicits._
      stubDecodeFeatures(assets(s, d)).orderBy($"doc_id")
    }),

    // Frame sampling (video assets only): every 64th byte, max 4 frames.
    "q87_mm_frames" -> ((s, d) => {
      import s.implicits._
      sampleFrames(assets(s, d), 64, 4).orderBy($"doc_id", $"frame_idx")
    })
  )

  def oracles: Map[String, String] = Map(
    "q85_mm_metadata" ->
      """SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           n_chars % 640 + 1 AS width,
           n_chars % 480 + 1 AS height
         FROM documents ORDER BY doc_id""",
    // ASCII corpus: byte histogram == character-code histogram.
    "q86_mm_features" ->
      """SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(len(list_filter(codes, c -> c % 4 = 0)) AS BIGINT) AS f0,
           CAST(len(list_filter(codes, c -> c % 4 = 1)) AS BIGINT) AS f1,
           CAST(len(list_filter(codes, c -> c % 4 = 2)) AS BIGINT) AS f2,
           CAST(len(list_filter(codes, c -> c % 4 = 3)) AS BIGINT) AS f3
         FROM (SELECT doc_id,
                 list_transform(range(length(text)),
                   i -> ascii(text[CAST(i + 1 AS INTEGER)])) AS codes
               FROM documents) t
         ORDER BY doc_id""",
    "q87_mm_frames" ->
      """SELECT doc_id, frame_idx,
           CAST(ascii(text[CAST(frame_idx * 64 + 1 AS INTEGER)]) AS BIGINT) AS frame_byte
         FROM (SELECT doc_id, text,
                 unnest(range(least((length(text) - 1) // 64 + 1, 4))) AS frame_idx
               FROM documents
               WHERE doc_id % 3 = 2 AND length(text) > 0) t
         ORDER BY doc_id, frame_idx"""
  )
}
