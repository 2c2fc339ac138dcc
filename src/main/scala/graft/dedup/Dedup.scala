package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorOps

/** Deduplication suite over `documents` / `embeddings`: exact (hash
  * groupBy), first-occurrence keep (reference A1 semantics), MinHash+LSH
  * (shingle → minhash → band → bucket self-join), n-gram Jaccard
  * verification, SimHash, and embedding-cosine near-dup.
  *
  * Reference analogs: `title_deduplication` first-wins (`cleaner.py:77-94`,
  * SURVEY A1), edge/node dedup (A4, A6), and the §2.8 entity-resolution
  * shape (candidate pairs → verify) — generalized to the operators a
  * 100 TB training-data pipeline needs.
  *
  * Hash-function determinism: every hash here is md5 over an explicit
  * string (seed || '|' || shingle) — identical hex in Spark and DuckDB —
  * and minhash = lexicographic MIN over those hex strings, so signatures
  * are engine-independent. No reliance on murmur3/xxhash (engine-specific).
  *
  * Scale notes (100 TB):
  *  - Exact dedup is one hash-shuffle on the content digest; map-side
  *    partial aggregation collapses duplicates before the shuffle.
  *  - MinHash-LSH replaces the O(n²) all-pairs join with a self-join on
  *    (band_id, band_hash) buckets — shuffle is O(n·bands), and skewed
  *    buckets (degenerate bands) are the thing to watch: AQE skew-join
  *    handles moderate skew; a hard cap per bucket is the escape hatch.
  *  - The Jaccard verify stage runs only on blocked candidates (here:
  *    same-source blocking), never all pairs.
  *  - Cosine near-dup at scale goes through the LSH/IVF path in
  *    graft.similarity; the all-pairs form here is the correctness
  *    baseline at fixture scale.
  */
object Dedup {

  private val NSeeds = 8

  /** 3-token shingles of a whitespace-tokenized text column (0-based
    * Spark array indexing; empty when the doc has <3 tokens).
    */
  private def shingles(toksCol: String): Column =
    when(expr(s"size($toksCol) >= 3"),
      expr(s"transform(sequence(0, size($toksCol) - 3)," +
        s" j -> concat($toksCol[j], ' ', $toksCol[j+1], ' ', $toksCol[j+2]))"))
      .otherwise(expr("array()"))

  /** MinHash signature: per seed i, lexicographic min of md5(i||'|'||sh). */
  private def minhash(shCol: String, seed: Int): Column =
    expr(s"array_min(transform($shCol, x -> md5(concat('$seed', '|', x))))")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup summary: one hash-shuffle on the content digest.
    "q30_dedup_exact" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(md5($"text").as("h"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"h").as("n_unique"))
        .withColumn("n_dups", $"n_docs" - $"n_unique")
    }),

    // First-occurrence keep per key (reference A1: stable ingest order =
    // doc_id; row_number, not dropDuplicates, for exact first-wins).
    "q31_dedup_first_per_key" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("group_n", count(lit(1)).over(
          Window.partitionBy($"lang", $"source")))
        .filter($"rn" === 1)
        .select($"lang", $"source", $"doc_id".as("kept_doc_id"), $"group_n")
        .orderBy($"lang", $"source")
    }),

    // MinHash signatures (first 4 seeds shown; LSH uses all 8).
    "q32_minhash_signatures" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("toks", split($"text", " "))
        .withColumn("sh", shingles("toks"))
        .select($"doc_id",
          minhash("sh", 0).as("mh_0"), minhash("sh", 1).as("mh_1"),
          minhash("sh", 2).as("mh_2"), minhash("sh", 3).as("mh_3"))
        .orderBy($"doc_id")
    }),

    // LSH candidate pairs: explode (seed, minhash) bands, self-join on
    // equal band hash. O(n·bands) shuffle instead of O(n²) compare.
    "q33_minhash_lsh_pairs" -> ((s, d) => {
      import s.implicits._
      val sig = Tables.documents(s, d)
        .withColumn("toks", split($"text", " "))
        .withColumn("sh", shingles("toks"))
        .select($"doc_id", posexplode(array((0 until NSeeds).map(i =>
          minhash("sh", i)): _*)).as(Seq("band", "h")))
      val a = sig.as("a")
      val b = sig.as("b")
      a.join(b, $"a.band" === $"b.band" && $"a.h" === $"b.h" &&
          $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .distinct()
        .orderBy($"d1", $"d2")
    }),

    // n-gram (token-set) Jaccard near-dup on blocked pairs (same-source
    // blocking), exact integer threshold: |∩|*1000 >= 700*|∪|.
    "q34_jaccard_neardup" -> ((s, d) => {
      import s.implicits._
      val t = Tables.documents(s, d)
        .select($"doc_id", $"source", array_distinct(split($"text", " ")).as("t"))
      val a = t.as("a")
      val b = t.as("b")
      a.join(b, $"a.source" === $"b.source" && $"a.doc_id" < $"b.doc_id")
        .withColumn("inter", size(array_intersect($"a.t", $"b.t")).cast("long"))
        .withColumn("uni",
          (size($"a.t") + size($"b.t")).cast("long") - $"inter")
        .filter($"inter" * 1000 >= $"uni" * 700)
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
          expr("CAST(inter * 1000 DIV uni AS BIGINT)").as("jaccard_permille"))
        .orderBy($"d1", $"d2")
    }),

    // SimHash (16-bit, hex-digit majority vote over md5'd tokens).
    "q35_simhash" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("th", expr("transform(split(text, ' '), t -> md5(t))"))
        .select($"doc_id", expr(
          """concat_ws('', transform(sequence(1, 16), p ->
             CASE WHEN aggregate(th, 0, (acc, x) ->
                    acc + IF(substring(x, p, 1) >= '8', 1, -1)) > 0
             THEN '1' ELSE '0' END))""").as("simhash"))
        .orderBy($"doc_id")
    }),

    // Embedding-cosine near-dup (cos >= 0.25 ⟺ 16·dot² >= |a|²|b|², exact
    // integers). All-pairs baseline; the scale path is LSH/IVF blocking.
    "q36_cosine_neardup" -> ((s, d) => {
      import s.implicits._
      val q = Tables.embeddings(s, d)
        .select($"vec_id", VectorOps.quantize($"embedding").as("e"))
        .withColumn("nrm", VectorOps.norm2($"e"))
      val a = q.as("a")
      val b = q.as("b")
      a.join(b, $"a.vec_id" < $"b.vec_id")
        .withColumn("dot", VectorOps.dot($"a.e", $"b.e"))
        .filter($"dot" > 0 && $"dot" * $"dot" * 16 >= $"a.nrm" * $"b.nrm")
        .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"), $"dot")
        .orderBy($"v1", $"v2")
    })
  )

  def oracles: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique,
         count(*) - count(DISTINCT md5(text)) AS n_dups FROM documents""",
    "q31_dedup_first_per_key" ->
      """SELECT lang, source, doc_id AS kept_doc_id, group_n FROM (
           SELECT lang, source, doc_id,
             row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn,
             count(*) OVER (PARTITION BY lang, source) AS group_n
           FROM documents) t
         WHERE rn = 1 ORDER BY lang, source""",
    "q32_minhash_signatures" ->
      """WITH sh AS (
           SELECT doc_id,
             CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t)-1),
               j -> t[j] || ' ' || t[j+1] || ' ' || t[j+2]) ELSE [] END AS s
           FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents) t0)
         SELECT doc_id,
           list_min(list_transform(s, x -> md5('0' || '|' || x))) AS mh_0,
           list_min(list_transform(s, x -> md5('1' || '|' || x))) AS mh_1,
           list_min(list_transform(s, x -> md5('2' || '|' || x))) AS mh_2,
           list_min(list_transform(s, x -> md5('3' || '|' || x))) AS mh_3
         FROM sh ORDER BY doc_id""",
    "q33_minhash_lsh_pairs" ->
      """WITH sh AS (
           SELECT doc_id,
             CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t)-1),
               j -> t[j] || ' ' || t[j+1] || ' ' || t[j+2]) ELSE [] END AS s
           FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents) t0),
         mh AS (
           SELECT doc_id, i,
             list_min(list_transform(s, x -> md5(i::VARCHAR || '|' || x))) AS h
           FROM sh, range(8) r(i))
         SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM mh a JOIN mh b ON a.i = b.i AND a.h = b.h AND a.doc_id < b.doc_id
         ORDER BY d1, d2""",
    "q34_jaccard_neardup" ->
      """WITH t AS (SELECT doc_id, source,
                      list_distinct(string_split(text,' ')) AS t FROM documents)
         SELECT d1, d2, CAST(inter * 1000 // uni AS BIGINT) AS jaccard_permille
         FROM (SELECT a.doc_id AS d1, b.doc_id AS d2,
                 CAST(len(list_intersect(a.t, b.t)) AS BIGINT) AS inter,
                 CAST(len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)) AS BIGINT) AS uni
               FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id) p
         WHERE inter * 1000 >= uni * 700
         ORDER BY d1, d2""",
    "q35_simhash" ->
      """SELECT doc_id,
           list_aggregate(list_transform(range(1, 17), p ->
             CASE WHEN list_sum(list_transform(th, x ->
                    CASE WHEN substring(x, p, 1) >= '8' THEN 1 ELSE -1 END)) > 0
             THEN '1' ELSE '0' END), 'string_agg', '') AS simhash
         FROM (SELECT doc_id,
                 list_transform(string_split(text,' '), t -> md5(t)) AS th
               FROM documents) t
         ORDER BY doc_id""",
    "q36_cosine_neardup" ->
      """WITH q AS (
           SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS e
           FROM embeddings),
         n AS (SELECT vec_id, e,
                 CAST(list_sum(list_transform(e, x -> x*x)) AS BIGINT) AS nrm
               FROM q),
         p AS (SELECT a.vec_id AS v1, b.vec_id AS v2, a.nrm AS na, b.nrm AS nb,
                 CAST(list_sum(list_transform(a.e, (x,i) -> x * b.e[i])) AS BIGINT) AS dot
               FROM n a JOIN n b ON a.vec_id < b.vec_id)
         SELECT v1, v2, dot FROM p
         WHERE dot > 0 AND dot * dot * 16 >= na * nb
         ORDER BY v1, v2"""
  )
}
