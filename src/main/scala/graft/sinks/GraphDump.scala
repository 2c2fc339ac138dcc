package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.BibGraph
import graft.resolve.EntityResolution

/** The full-graph CSV dump orchestration — `csv_extractor.__main__`
  * (`csv_extractor.py:299-313`): ONE run over a cleaned ingest writes
  * every node CSV (documents + one per linked label), every
  * document-linked relationship CSV (one per rel type in the edge
  * config), and the three ALIAS_OF files (Keyword / Organization /
  * Author_Address), deriving the three alias mappings at the reference
  * thresholds (`Hype.py:73-82`: keywords and addresses θ=0.95, orgs
  * θ=0.96).
  *
  * File naming mirrors the reference: `documents`, `<label>_nodes`,
  * `<rel_type>_rels`, `<label>_alias_of_rels` (each a Spark CSV
  * directory). Alias files with no non-identity entries are skipped, as
  * the reference skips empty files. Returns the manifest of written
  * entries for callers/tests.
  *
  * Scale notes: the edge frame is built once and persisted across its
  * (config-size) reuses; every writer is a narrow projection +
  * per-key dedup — one shuffle each. PUBLISHED_BY uses the documented
  * first-non-empty Publisher/Place-Published key (`Hype.py:38-44`),
  * consistent with the engine's taggedEdges everywhere else.
  */
object GraphDump {

  def dumpGraph(ingested0: DataFrame, outDir: String,
                dynamicExtra: Boolean = false,
                kwThreshold: (Int, Int) = (19, 20),
                orgThreshold: (Int, Int) = (24, 25),
                addrThreshold: (Int, Int) = (19, 20)): Seq[String] = {
    import org.apache.spark.storage.StorageLevel
    val manifest = Seq.newBuilder[String]
    // the cleaned ingest feeds every writer and all three mappings —
    // persist it once or each of the ~16 write jobs re-parses the export
    val ingested = ingested0.persist(StorageLevel.MEMORY_AND_DISK)
    val edges = BibGraph.taggedEdges(ingested)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 1. document nodes (csv_extractor.py:33-60,101-125)
    Neo4jCsv.writeDocumentNodes(ingested, s"$outDir/documents",
      dynamicExtra = dynamicExtra)
    manifest += "documents"

    // 2. linked-entity nodes, one CSV per label; a label fed by several
    //    rel types (Author via AUTHORED + TERTIARY_AUTHORED) unions them
    //    (csv_extractor.py:64-97,128-148)
    val byLabel = BibGraph.TaggedEdgeConfig.groupBy(_.nodeLabel).toSeq
      .sortBy(_._1)
    for ((label, specs) <- byLabel) {
      val ids = specs.map { spec =>
        val side = if (spec.fromNew) "src" else "dst"
        edges.filter(col("rel_type") === spec.relType)
          .select(col(side).as("id"))
      }.reduce(_ unionAll _)
      val name = s"${label.toLowerCase}_nodes"
      Neo4jCsv.writeEntityNodes(ids, label, s"$outDir/$name")
      manifest += name
    }

    // 3. document-linked relationship CSVs, one per rel type
    //    (csv_extractor.py:153-241)
    for (spec <- BibGraph.TaggedEdgeConfig) {
      val (startLabel, endLabel) =
        if (spec.fromNew) (spec.nodeLabel, "Document")
        else ("Document", spec.nodeLabel)
      val name = s"${spec.relType.toLowerCase}_rels"
      Neo4jCsv.writeRels(edges, spec.relType, startLabel, endLabel,
        s"$outDir/$name")
      manifest += name
    }
    edges.unpersist(blocking = false)

    // 4. the three ALIAS_OF files (csv_extractor.py:246-313) from the
    //    ingest-derived mappings at the reference thresholds; empty
    //    mappings are skipped like the reference's empty files
    val aliases = Seq(
      ("Keyword", Seq("keywords"), kwThreshold),
      ("Organization", Seq("publisher", "place_published"), orgThreshold),
      ("Author_Address", Seq("author_address"), addrThreshold))
    for ((label, cols, (num, den)) <- aliases) {
      val rels = EntityResolution.ingestedTermMapping(ingested, cols, num, den)
        .filter(col("original") =!= col("representative"))
        .select(col("original").as("src"), col("representative").as("dst"),
          lit("ALIAS_OF").as("rel_type"))
        .localCheckpoint() // probe + write read the same materialization
      if (!rels.isEmpty) {
        val name = s"${label.toLowerCase}_alias_of_rels"
        Neo4jCsv.writeRels(rels, "ALIAS_OF", label, label, s"$outDir/$name")
        manifest += name
      }
    }
    ingested.unpersist(blocking = false)
    manifest.result()
  }
}
