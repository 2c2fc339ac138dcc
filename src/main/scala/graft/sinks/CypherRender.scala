package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cypher-text rendering (SURVEY.md §2.2 P4-P6/P8 and the deprecated S9
  * statement sink, `utils.py:7-43,90-97` + `Deprecated/extractor.py`):
  * the engine never executes Cypher — these render statements/fragments
  * as strings for export, as the reference's deprecated uploader path
  * did. Scalar helpers are plain Scala (schema-level, driver-side);
  * [[mergeStatements]] is the row-level path as codegen'd Column
  * expressions.
  */
object CypherRender {

  /** P4: escape `\` and `'` for embedding in single-quoted Cypher. */
  def escapeCypherString(value: String): String =
    value.replace("\\", "\\\\").replace("'", "\\'")

  /** P4 as a Column (for row-level statement rendering). */
  def escapeCypher(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "'", "\\\\'")

  /** P5: lowercase, space/hyphen → underscore, backtick-quote keys that
    * are not plain identifiers.
    */
  def normalizePropKey(key: String): String = {
    val k = key.toLowerCase.replace(" ", "_").replace("-", "_")
    if (k.contains("/") || !k.matches("^[a-zA-Z_][a-zA-Z0-9_]*$")) s"`$k`"
    else k
  }

  /** P6: render a property map as a Cypher map literal — numbers/booleans
    * raw, strings escaped+quoted, lists bracketed, nulls dropped.
    */
  def formatCypherProperties(props: Seq[(String, Any)]): String = {
    val parts = props.flatMap { case (key, value) =>
      val k = normalizePropKey(key)
      value match {
        case null => None
        case v: Int => Some(s"$k: $v")
        case v: Long => Some(s"$k: $v")
        case v: Double => Some(s"$k: $v")
        case v: Boolean => Some(s"$k: $v")
        case v: Seq[_] =>
          val items = v.filter(_ != null)
            .map(i => s"'${escapeCypherString(i.toString)}'")
          Some(s"$k: [${items.mkString(", ")}]")
        case v: String => Some(s"$k: '${escapeCypherString(v)}'")
        case _ => None
      }
    }
    s"{${parts.mkString(", ")}}"
  }

  /** P8: render a list for Neo4j LOAD CSV (`"` doubled, bracketed). */
  def formatListProperty(items: Seq[String]): String =
    if (items == null || items.isEmpty) ""
    else s"[${items.filter(_ != null).map(_.replace("\"", "\"\"")).mkString(",")}]"

  /** S9 equivalent: one `MERGE` statement per document row, deduplicated
    * preserving first occurrence (`Deprecated/extractor.py:108` —
    * `list(dict.fromkeys(...))`; here statements are distinct per title
    * already, so `dropDuplicates` suffices). Input needs (title, label).
    */
  def mergeStatements(docs: DataFrame): DataFrame =
    docs.select(concat(
        lit("MERGE (p:"), col("label"),
        lit(" {title: '"), escapeCypher(col("title")), lit("'})"))
      .as("statement"))
      .dropDuplicates("statement")
}
