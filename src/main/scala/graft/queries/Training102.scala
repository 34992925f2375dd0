package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Hundred-second wave — DSv2 runtime filtering depth:
  *
  *  - q468: join-driven block pruning on the gbd connector
  *    (`SupportsRuntimeFiltering`, the round-9 extension of q138's
  *    static push + q340's aggregate pushdown). The manifest side
  *    selects two ingest batches (`doc_id div 64 IN (1, 5)` — batches
  *    are id-contiguous by ingest construction, so the predicate is
  *    block-aligned but NOT expressible as a static doc_id comparison
  *    the source could push). Dynamic partition pruning broadcasts the
  *    manifest, hands the scan the runtime `In(doc_id, …)` set, and the
  *    scan drops every block whose (minId, maxId) range misses the set
  *    — at 100 TB this is the difference between scanning the corpus
  *    and scanning two batches when reprocessing a manifest. The spec
  *    pins `dynamicpruning` in the plan AND the observed post-filter
  *    block count; the oracle is the plain semantic join.
  */
object Training102 {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q468_gbd_runtime_prune",
      (s, d) => {
        val path = graft.sources.GbdFormat.stageDocuments(s, d, blockRecords = 64)
        val docs = s.read.format("graft.sources.GbdSource").load(path)
        val manifest = s.read.parquet(s"$d/documents.parquet")
          .filter(expr("doc_id div 64 IN (1, 5)"))
          .select("doc_id")
        docs.join(broadcast(manifest), "doc_id")
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(length(col("payload")).cast("long")).as("payload_bytes"))
          .orderBy("lang")
      },
      Some("""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(strlen(text)) AS BIGINT) AS payload_bytes
        FROM documents
        WHERE doc_id // 64 IN (1, 5)
        GROUP BY 1 ORDER BY 1""")),
  )
}
