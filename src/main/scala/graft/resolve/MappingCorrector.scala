package graft.resolve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.8-C2: the pluggable cluster corrector behind the mapping-refinement
  * operator (`recorrect_mapping.py:70-127`). The reference sends each
  * large cluster to an LLM as `"original": "representative"` lines and
  * gets corrected lines back; the engine keeps exactly that TEXT contract
  * so any client (an LLM call, a rules engine, the deterministic stub
  * below) plugs in without touching the pipeline.
  *
  * Returning None = the call failed after retries — the cluster keeps its
  * original mapping (`recorrect_mapping.py:186-191`).
  */
trait MappingCorrector extends Serializable {
  def correct(clusterString: String): Option[String]
}

object MappingCorrector {

  /** One cluster as the reference's line format (`recorrect_mapping.py:
    * 176-177`): `"orig": "rep"` per line.
    */
  def renderCluster(entries: Seq[(String, String)]): String =
    entries.map { case (o, r) => s""""$o": "$r"""" }.mkString("\n")

  /** Python `.strip(c)`: remove ALL leading/trailing occurrences. */
  private def stripChars(s: String, c: Char): String =
    s.dropWhile(_ == c).reverse.dropWhile(_ == c).reverse

  /** `_parse_deepseek_response` (`recorrect_mapping.py:33-67`): split each
    * non-empty line on the FIRST ':', strip whitespace then '"' then "'"
    * from both sides, keep non-empty keys (last occurrence of a repeated
    * key wins — dict overwrite); unparseable lines are skipped; every
    * original key the response missed is filled in as a SELF-mapping.
    * Returns entries in first-seen key order (deterministic).
    *
    * DELIBERATE reference-parity caveat: a term that itself contains ':'
    * is truncated at its first colon on re-parse — the reference's parser
    * has exactly this behavior, so a corrector echoing the rendered
    * format maps `"AI: applications": "rep"` to key "AI" and the real
    * term falls back to a self-mapping (pinned by `MappingCorrectorSpec`).
    * Colon-free terms (the overwhelming case for keywords/orgs) are
    * unaffected; fixing it would diverge from the modeled contract.
    */
  def parseResponse(text: String,
                    originalKeys: Seq[String]): Seq[(String, String)] = {
    val parsed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (line0 <- text.split('\n'); line = line0.trim if line.nonEmpty) {
      val idx = line.indexOf(':')
      if (idx >= 0) {
        val key = stripChars(stripChars(line.substring(0, idx).trim, '"'), '\'')
        val value =
          stripChars(stripChars(line.substring(idx + 1).trim, '"'), '\'')
        if (key.nonEmpty) parsed(key) = value
      }
      // else: unparseable line — skipped (the reference logs a warning)
    }
    for (k <- originalKeys if !parsed.contains(k)) parsed(k) = k
    parsed.toSeq
  }

  /** `refine_mapping_with_deepseek` (`recorrect_mapping.py:130-204`) as a
    * distributed pipeline over an (original, representative) frame:
    * regroup by representative (J11), gate on distinct-original count
    * (A9, `min_cluster_size_for_api`), run the corrector per large
    * cluster INSIDE tasks (clusters are bounded; no driver collect),
    * parse with self-map fill-in, and merge — corrector output wins over
    * the untouched entry for the same original (the reference fills
    * unprocessed words in only afterward, `:197-204`).
    */
  def refineMapping(mapping: DataFrame, corrector: MappingCorrector,
                    minClusterSize: Int): DataFrame = {
    val s = mapping.sparkSession
    import s.implicits._
    val clustered = mapping
      .select(col("original").cast("string"),
        col("representative").cast("string"))
      .groupBy(col("representative"))
      .agg(collect_list(col("original")).as("originals"))
      .as[(String, Seq[String])]
    val tagged = clustered.flatMap { case (rep, originals0) =>
      val originals = originals0.distinct.sorted // deterministic render order
      val entries = originals.map(o => (o, rep))
      if (originals.size >= minClusterSize) {
        corrector.correct(renderCluster(entries)) match {
          case Some(resp) =>
            parseResponse(resp, originals).map { case (o, r) => (o, r, 1) }
          case None => entries.map { case (o, r) => (o, r, 0) }
        }
      } else entries.map { case (o, r) => (o, r, 0) }
    }.toDF("original", "representative", "corrected")
    val w = Window.partitionBy(col("original"))
      .orderBy(col("corrected").desc, col("representative"))
    tagged.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("original"), col("representative"))
  }
}

/** Deterministic stand-in for the reference's LLM corrector (SURVEY §7.5
  * risk 5): re-point every member of the cluster at the SECOND-smallest
  * member (numeric order when all keys are numeric, lexicographic
  * otherwise) — a non-trivial, testable correction rule.
  */
object PromoteSecondCorrector extends MappingCorrector {
  def correct(clusterString: String): Option[String] = {
    val keys = MappingCorrector.parseResponse(clusterString, Nil).map(_._1)
    // every key stripped to empty (e.g. quote-only originals) — treat as
    // a failed call (None keeps the original mapping, the documented
    // fallback) instead of crashing on sorted.head
    if (keys.isEmpty) return None
    val sorted =
      if (keys.forall(k => k.nonEmpty && k.forall(_.isDigit)))
        keys.sortBy(_.toLong)
      else keys.sorted
    val rep = if (sorted.size >= 2) sorted(1) else sorted.head
    Some(MappingCorrector.renderCluster(keys.map(k => (k, rep))))
  }
}
