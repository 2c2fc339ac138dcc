package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every SQL-expressible
  * operator has a matching DuckDB oracle entry; non-SQL-expressible ones
  * (GraphX connected components, streaming) are registered queries with a
  * rows-only check and get ScalaTest coverage instead.
  *
  * Execution-time note for plan-only tooling: a handful of registry
  * entries (LSH candidates, GraphX CC/BFS/PageRank consumers, the
  * coauthor-reach family) EXECUTE work at construction time — they
  * persist-then-`count()` an intermediate so cache ownership stays inside
  * the query function (the noop-sink Bench measures this honestly).
  * Calling `queries(name)(s, d)` is therefore "run", not "build a lazy
  * plan"; use `.explain` on the RETURNED frame, but don't assume
  * construction was free.
  */
object SparkEntry {

  private def registries: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    (relational.TpchQueries.queries, relational.TpchQueries.oracles),
    (text.TextAnalysis.queries, text.TextAnalysis.oracles),
    (text.Curation.queries, text.Curation.oracles),
    (dedup.Dedup.queries, dedup.Dedup.oracles),
    (similarity.Similarity.queries, similarity.Similarity.oracles),
    (graph.GraphQueries.queries, graph.GraphQueries.oracles),
    (resolve.EntityResolution.queries, resolve.EntityResolution.oracles),
    (streaming.Events.queries, streaming.Events.oracles),
    (streaming.DocsStream.queries, streaming.DocsStream.oracles),
    (streaming.ExactlyOnceSink.queries, streaming.ExactlyOnceSink.oracles),
    (enrich.TopicEnrichment.queries, enrich.TopicEnrichment.oracles),
    (enrich.TermEncoding.queries, enrich.TermEncoding.oracles),
    (ingest.TaggedQueries.queries, ingest.TaggedQueries.oracles),
    (query.QueryText.queries, query.QueryText.oracles),
    (query.ChatStore.queries, query.ChatStore.oracles),
    (sinks.SinkQueries.queries, sinks.SinkQueries.oracles),
    (multimodal.Multimodal.queries, multimodal.Multimodal.oracles)
  )

  /** The full oracle-gated registry: every SURVEY.md §2 operator has at
    * least one entry, and most have several (a direct gate plus the
    * composed queries that ride it — e.g. the ER serve matrix gates one
    * kernel per CRUD shape AND the multi-day lifecycles composed from
    * them), so the registry is larger than the operator inventory by
    * design: 150+ gates over the ~59-operator surface.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.iterator.map(_._2).reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q.txt family 10 (SURVEY §7.3): per-year document counts for an
    * alias-expanded keyword — exercises the whole spine: document frame →
    * HAS_KEYWORD + ALIAS_OF edges → alias-expanded semi-join → groupBy.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q68_keyword_per_year")(spark, "/root/testdata/sf0.001")
}
