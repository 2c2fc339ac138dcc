package graft.model

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed core of the cleaned bibliographic record (SURVEY.md §1.4 /
  * FIXTURES.md A2): the int-or-raw union cells (`cleaner.py:67-71`) are a
  * typed Option[Int] plus the preserved raw string; unknown `{Field}:`
  * tags ride in `extra`.
  *
  * `DataFrame` stays the lingua franca of the query layer (dynamic
  * schema); this case class is the type-safe handle for Dataset-style
  * consumers (`TaggedText.ingest(...)` → [[DocRecord.typed]]).
  */
final case class DocRecord(
    src_file: String,
    area: String,
    block_idx: Long,
    title: String,
    reference_type: Option[String],
    label: String,
    author: Option[Seq[String]],
    tertiary_author: Option[Seq[String]],
    subsidiary_author: Option[Seq[String]],
    keywords: Option[Seq[String]],
    author_address: Option[Seq[String]],
    publisher: Option[String],
    place_published: Option[String],
    year: Option[Int],
    year_raw: Option[String],
    volume: Option[Int],
    volume_raw: Option[String],
    issue: Option[Int],
    issue_raw: Option[String],
    abstract_ : Option[String],
    journal: Option[String],
    pages: Option[String],
    doi: Option[String],
    url: Option[String],
    isbn_issn: Option[String],
    date: Option[String],
    subject: Option[String],
    notes: Option[String],
    extra: Map[String, String])

object DocRecord {
  /** Ingest output (column `abstract` is a Scala keyword clash — renamed
    * to `abstract_` in the typed view) as a typed Dataset.
    */
  def typed(df: DataFrame): Dataset[DocRecord] = {
    val s = df.sparkSession
    import s.implicits._
    df.withColumnRenamed("abstract", "abstract_").as[DocRecord]
  }
}
