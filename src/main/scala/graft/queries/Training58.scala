package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Fifty-eighth wave — DSv2 index-aggregate depth:
  *
  *  - q340: COUNT(*) + MIN/MAX(doc_id) answered ENTIRELY from the gbd
  *    connector's block index (round-8 extension of the q138 COUNT
  *    pushdown): one task, zero shard-data bytes, at any corpus size —
  *    the metadata-only statistics query every catalog/planner issues
  *    constantly against a 100 TB table.
  */
object Training58 {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q340_gbd_agg_pushdown",
      (s, d) => {
        val path = graft.sources.GbdFormat.stageDocuments(s, d, blockRecords = 64)
        s.read.format("graft.sources.GbdSource").load(path)
          .agg(
            count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
      },
      Some("""
        SELECT count(*) AS n_docs, min(doc_id) AS min_doc,
               max(doc_id) AS max_doc
        FROM documents""")),
  )
}
