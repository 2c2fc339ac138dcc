package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Neo4j bulk-import CSV sinks (SURVEY.md §2.1 S5-S7; headers verified
  * against the reference's shipped artifacts, FIXTURES.md A4):
  *
  *   nodes:   `:ID,:LABEL,name`  /  documents: `:ID,:LABEL,title,year,...`
  *            (`csv_extractor.py:45-59,87-96,101-148`)
  *   edges:   `:START_ID(L),:END_ID(L),:TYPE`  (`csv_extractor.py:212-241`)
  *
  * CSV escaping matches Python's `csv` QUOTE_MINIMAL: fields quoted only
  * when needed, embedded quotes doubled (`escape` = `"` — Spark's default
  * backslash-escape would diverge), UTF-8 (CJK passes through unquoted).
  *
  * `coalesce(1)` mirrors the reference's one-file-per-label layout for
  * import parity; at 100 TB you drop it and let neo4j-admin take the
  * part-files — the header/escaping contract is unchanged. `asFile = true`
  * goes one step further and leaves a LITERAL `<path>` file (not a Spark
  * directory) via [[promoteSingleFile]] — full filename parity with
  * `csv_extractor.py`'s `open(...csv)` outputs.
  */
object Neo4jCsv {

  private def write(df: DataFrame, path: String, singleFile: Boolean,
                    asFile: Boolean = false): Unit = {
    val out = if (singleFile || asFile) df.coalesce(1) else df
    val target = if (asFile) path + ".__spark_tmp" else path
    out.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .option("emptyValue", "")
      .csv(target)
    if (asFile) promoteSingleFile(df.sparkSession, target, path)
  }

  /** Promote a single-part Spark CSV directory to a LITERAL file at
    * `filePath` — the reference's exact on-disk layout (`csv_extractor.py:
    * 101-148` opens `documents.csv` / `<label>_nodes.csv` directly), so
    * `neo4j-admin database import --nodes=documents.csv` works without
    * globbing. The promotion is one driver-side metadata `rename` plus a
    * directory delete on the target FileSystem (no data movement on local
    * or HDFS). Import-parity mode only: it implies `coalesce(1)`; at
    * 100 TB keep the part-file directory and glob.
    */
  private def promoteSingleFile(spark: SparkSession, tmpDir: String,
                                filePath: String): Unit = {
    val dir = new Path(tmpDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
    require(parts.length == 1,
      s"expected exactly one part file in $tmpDir, found ${parts.length}")
    val dst = new Path(filePath)
    fs.delete(dst, false)
    if (!fs.rename(parts(0), dst))
      throw new java.io.IOException(s"rename ${parts(0)} -> $dst failed")
    fs.delete(dir, true)
  }

  /** Entity node CSV: unique ids under one label (A4 first-writer-wins ≡
    * dropDuplicates on the id).
    */
  def writeEntityNodes(nodes: DataFrame, label: String, path: String,
                       singleFile: Boolean = true,
                       asFile: Boolean = false): Unit = {
    val out = nodes.select(col("id").as(":ID"), lit(label).as(":LABEL"),
      col("id").as("name")).dropDuplicates(":ID")
    write(out, path, singleFile, asFile)
  }

  /** Document node CSV with the reference's FULL 12-column property set
    * (`csv_extractor.py:45-59`): `:ID,:LABEL,title,year,abstract,journal,
    * volume,issue,pages,doi,url,isbn_issn`. A property column absent from
    * the input frame is written empty — the reference's missing-key
    * behavior (`csv_extractor.py:127-140` dynamic header, blank fill).
    *
    * `dynamicExtra = true` appends the `extra` map's observed keys —
    * sorted, one trailing column each — so unknown `{Field}:` tags that
    * survive ingest reach the CSV, the dynamic-header semantics of
    * `csv_extractor.py:127-140` extended to the long tail. Header
    * derivation is a driver-side distinct over map keys (the reference
    * reads its header off the collected dict the same way).
    */
  def writeDocumentNodes(docs: DataFrame, path: String,
                         singleFile: Boolean = true,
                         dynamicExtra: Boolean = false,
                         asFile: Boolean = false): Unit = {
    val have = docs.columns.toSet
    def c(name: String) =
      (if (have(name)) col(name) else lit(null).cast("string")).as(name)
    // case-variant tags ({title}: vs {Title}:) pass the case-sensitive
    // known-fields filter into `extra`; appending them verbatim would emit
    // a DUPLICATE header (unreadable round-trip), so any extra key that
    // collides with a fixed column name is written under an `extra_`
    // prefix instead — every observed key still reaches the CSV exactly
    // once, the dynamic-header contract
    val fixedNames = Set(":ID", ":LABEL", "title", "year", "abstract",
      "journal", "volume", "issue", "pages", "doi", "url", "isbn_issn")
    val extraKeys: Seq[String] =
      if (dynamicExtra && have("extra"))
        docs.select(explode(map_keys(col("extra"))).as("k")).distinct()
          .collect().map(_.getString(0)).sorted.toSeq
      else Nil
    val base = Seq(
      col("title").as(":ID"), col("label").as(":LABEL"),
      col("title").as("title"), c("year"), c("abstract"), c("journal"),
      c("volume"), c("issue"), c("pages"), c("doi"), c("url"),
      c("isbn_issn"))
    val extras = extraKeys.map { k =>
      val name = if (fixedNames(k)) s"extra_$k" else k
      col("extra").getItem(k).as(name)
    }
    val out = docs.select(base ++ extras: _*).dropDuplicates(":ID")
    write(out, path, singleFile, asFile)
  }

  /** Relationship CSV: `(src, dst, rel_type)` rows under one type. */
  def writeRels(edges: DataFrame, relType: String, startLabel: String,
                endLabel: String, path: String,
                singleFile: Boolean = true,
                asFile: Boolean = false): Unit = {
    val out = edges.filter(col("rel_type") === relType)
      .select(col("src").as(s":START_ID($startLabel)"),
        col("dst").as(s":END_ID($endLabel)"),
        col("rel_type").as(":TYPE"))
      .distinct()
    write(out, path, singleFile, asFile)
  }
}

/** JSON sinks (SURVEY.md §2.1 S7): the alias-mapping persistence of
  * `keyword_merger.py:235-247` / `Hype.py:71-86`, as JSON-lines of
  * `{original, representative}` (columnar-idiomatic; the reference's
  * single-dict layout is a driver-side rendering of the same rows).
  */
object JsonSinks {
  def writeMapping(mapping: DataFrame, path: String): Unit =
    mapping.select("original", "representative")
      .write.mode("overwrite").json(path)

  def readMapping(s: SparkSession, path: String): DataFrame =
    s.read.schema("original STRING, representative STRING").json(path)
}
