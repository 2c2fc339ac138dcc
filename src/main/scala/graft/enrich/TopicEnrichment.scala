package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.BibGraph

/** Topic enrichment — the reference's classification pipeline (SURVEY.md
  * §2.9 L3, §3.3; `TopicClassfication.py:142-202`, `TopicTocsv.py:43-79`)
  * with the LLM call replaced by a deterministic classifier stub so the
  * engine stays hermetic (SURVEY §7.5 risk 5).
  *
  * Stub: topic_id = 1 + doc_id % 22, and every 37th doc yields an invalid
  * id (99) to exercise the validation path (`topic_id ∈ VALID_TOPIC_IDS`,
  * `TopicClassfication.py:180-184`) and the success/error split
  * (`TopicClassfication.py:260-299` — S8 partitioned sink,
  * [[writePartitioned]]).
  *
  * The validating join is a broadcast left join against the 22-row
  * taxonomy dim; rows that miss are status='error' — at any scale this is
  * a map-side operation.
  */
object TopicEnrichment {

  /** Classifier-stub output + validating join: every document with its
    * raw predicted id, validation status, and the resolved (cleaned)
    * topic name — name corrected from id as in the reference
    * (`TopicClassfication.py:186-190`).
    */
  def classified(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    BibGraph.docs(s, d)
      .withColumn("topic_id",
        when($"doc_id" % 37 === 0, lit(99L)).otherwise($"doc_id" % 22 + 1))
      .join(broadcast(Taxonomy.df(s).select($"id", $"topic_name")),
        $"id" === $"topic_id".cast("int"), "left")
      .select($"title", $"ref_type", $"label", $"topic_id",
        when($"id".isNull, lit("error")).otherwise(lit("ok")).as("status"),
        trim(regexp_replace($"topic_name", "\\s*\\(.*?\\)", "")).as("topic"))
  }

  /** S8: success/error partitioned JSON sink for classification output. */
  def writePartitioned(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("status").json(path)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // L3 validating join with error split (counts by status + topic).
    "q81_topic_classify" -> ((s, d) => {
      import s.implicits._
      classified(s, d)
        .select($"title", $"topic_id", $"status", $"topic")
        .orderBy($"title")
    }),

    // TopicTocsv.py:43-79: P11 incomplete-row filter + P9 label map with
    // Other_Article default + P10 paren strip → (paperTitle, paperLabel,
    // topicName) relationship rows.
    "q82_topic_rels" -> ((s, d) => {
      import s.implicits._
      classified(s, d)
        .filter($"status" === "ok" && $"title".isNotNull &&
          $"ref_type".isNotNull && $"topic".isNotNull && $"topic" =!= "")
        .select($"title".as("paperTitle"), $"label".as("paperLabel"),
          $"topic".as("topicName"))
        .orderBy($"paperTitle")
    })
  )

  private def P = BibGraph.sqlPrelude

  /** Shared oracle mirror of [[classified]] (stub formula + validating
    * join + paren strip) — one definition for both q81 and q82.
    */
  private val clsSql = """cls AS (
  SELECT title, ref_type, label,
    CASE WHEN doc_id % 37 = 0 THEN 99 ELSE doc_id % 22 + 1 END AS topic_id
  FROM docs),
j AS (
  SELECT c.title, c.ref_type, c.label, c.topic_id,
    CASE WHEN t.id IS NULL THEN 'error' ELSE 'ok' END AS status,
    trim(regexp_replace(t.topic_name, '\s*\(.*?\)', '', 'g')) AS topic
  FROM cls c LEFT JOIN topics t ON t.id = CAST(c.topic_id AS INTEGER))"""

  def oracles: Map[String, String] = Map(
    "q81_topic_classify" ->
      s"""WITH $P,
         $clsSql
         SELECT title, topic_id, status, topic FROM j ORDER BY title""",
    "q82_topic_rels" ->
      s"""WITH $P,
         $clsSql
         SELECT title AS paperTitle, label AS paperLabel, topic AS topicName
         FROM j
         WHERE status = 'ok' AND title IS NOT NULL
           AND ref_type IS NOT NULL AND topic IS NOT NULL AND topic <> ''
         ORDER BY paperTitle"""
  )
}
