package graft.sources

import java.io.{DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 connector for a block-structured binary
  * corpus shard format ("gbd" — graft binary documents). This is the
  * custom-SOURCE counterpart of the engine's custom Expression /
  * optimizer Rule / physical operator: the full
  * `TableProvider → Table → ScanBuilder → Scan → Batch → PartitionReader`
  * chain, with the two scan optimizations that matter at 100 TB done at
  * the SOURCE, before any byte is read:
  *
  *  - **Stats-based block pruning** (`SupportsPushDownFilters`): the
  *    shard carries a per-block (minId, maxId) index; pushed doc_id
  *    range predicates drop whole blocks from the plan, so a selective
  *    scan schedules tasks only for blocks that can match — the same
  *    idea as parquet row-group skipping, implemented here end-to-end.
  *    Pushed filters are ALSO kept as residuals (pushFilters returns
  *    them), so Spark re-applies them per row — pruning is a pure
  *    optimization and can never change results.
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): the
  *    record layout is (doc_id, lang, payload) with the variable-size
  *    payload LAST and length-prefixed, so a projection that doesn't
  *    need `payload` skips over the bytes without materializing them —
  *    a metadata-only scan of a multimodal shard reads ~16 bytes/record.
  *  - **COUNT(*) pushdown** (`SupportsPushDownAggregates`): per-block
  *    row counts live in the gbx index, so an unfiltered count is
  *    answered from the index footers alone — one task, zero data
  *    bytes, at any corpus size (see `GbdCountScan`).
  *
  * Each block is one `InputPartition` — on a cluster, one task per
  * block, scheduled wherever the block's byte range is local. Writes go
  * through the DSv2 write path (`SupportsWrite` → `GbdBatchWrite`): one
  * shard + index per input partition, written executor-side and
  * committed atomically per task; the reader accepts either a single
  * shard or a directory of `part-*.gbd` shards (each with its own
  * index), so the two halves compose. `GbdFormat.write` remains as
  * driver-side staging scaffolding for tests.
  *
  * Shard layout (all big-endian, via DataOutputStream):
  *   header: magic "GBD1"
  *   blocks: nRecords:int, then per record
  *           docId:long, langLen:int, langBytes, payloadLen:int, payload
  *           (a length of -1 marks SQL NULL; no bytes follow)
  *   index file `<shard>.gbx`: magic "GBX1", nBlocks:int, then per block
  *           offset:long, nRecords:int, minId:long, maxId:long
  */
object GbdFormat {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  final case class BlockMeta(offset: Long, nRecords: Int, minId: Long, maxId: Long)

  /** Write rows as a gbd shard + gbx index. Driver-side, for staging
    * and tests (see class doc for the production-writer story).
    */
  def write(path: String, rows: Seq[(Long, String, Array[Byte])], blockRecords: Int): Unit = {
    // unique write-aside names: concurrent stagers of the same path each
    // write their own tmp pair and the (idempotent, same-content) renames
    // race harmlessly — no writer ever truncates another's in-progress file
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val tmpData = Paths.get(s"$path.$tag.tmp")
    val tmpIdx = Paths.get(s"$path.gbx.$tag.tmp")
    val blocks = ArrayBuffer.empty[BlockMeta]
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(tmpData.toFile)))
    try {
      out.writeBytes("GBD1")
      var offset = 4L
      rows.grouped(blockRecords).foreach { g =>
        val start = offset
        out.writeInt(g.length)
        offset += 4
        g.foreach { case (id, lang, payload) =>
          // -1 length = the format's null marker (the reader and the
          // distributed shard writer both speak it; writing unguarded
          // would NPE on the nullable source columns instead)
          out.writeLong(id)
          offset += 8
          if (lang == null) { out.writeInt(-1); offset += 4 }
          else {
            val lb = lang.getBytes("UTF-8")
            out.writeInt(lb.length)
            out.write(lb)
            offset += 4 + lb.length
          }
          if (payload == null) { out.writeInt(-1); offset += 4 }
          else {
            out.writeInt(payload.length)
            out.write(payload)
            offset += 4 + payload.length
          }
        }
        blocks += BlockMeta(start, g.length, g.map(_._1).min, g.map(_._1).max)
      }
    } finally out.close()
    val idx = new DataOutputStream(new FileOutputStream(tmpIdx.toFile))
    try {
      idx.writeBytes("GBX1")
      idx.writeInt(blocks.length)
      blocks.foreach { b =>
        idx.writeLong(b.offset); idx.writeInt(b.nRecords)
        idx.writeLong(b.minId); idx.writeLong(b.maxId)
      }
    } finally idx.close()
    // write-aside then rename: readers never observe a half-written shard
    Files.move(tmpData, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmpIdx, Paths.get(path + ".gbx"), StandardCopyOption.REPLACE_EXISTING)
  }

  /** A path may be a single shard or a directory of part-*.gbd shards
    * (the distributed writer's output); each shard carries its own
    * index.
    */
  def shardsOf(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.getName.endsWith(".gbd")).map(_.getPath).sorted.toSeq
    else Seq(path)
  }

  def readIndex(path: String): Seq[BlockMeta] = {
    val in = new DataInputStream(new FileInputStream(path + ".gbx"))
    try {
      val magic = new Array[Byte](4); in.readFully(magic)
      require(new String(magic, "UTF-8") == "GBX1", s"not a gbx index: $path.gbx")
      val n = in.readInt()
      (0 until n).map { _ =>
        BlockMeta(in.readLong(), in.readInt(), in.readLong(), in.readLong())
      }
    } finally in.close()
  }

  /** Stage the harness `documents` table as a gbd shard under the JVM
    * temp dir (payload = UTF-8 text bytes), once per sfDir; returns the
    * shard path. Write-aside + atomic rename makes concurrent stagers
    * safe.
    */
  def stageDocuments(spark: SparkSession, sfDir: String, blockRecords: Int = 512): String = {
    // cache key carries the block geometry (stagers asking for different
    // blockRecords must not share a shard) AND the source's content
    // fingerprint (graft.Stage.key: per-file size+mtime + md5 of the
    // full path) — a documents.parquet regenerated in place gets a
    // fresh shard instead of silently serving stale blocks, and two
    // dataset dirs can never collide onto one shard
    val dirKey = graft.Stage.key(sfDir, "documents")
    val path = Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft_gbd_${dirKey}_b$blockRecords.gbd").toString
    if (!Files.exists(Paths.get(path)) || !Files.exists(Paths.get(path + ".gbx"))) {
      val rows = spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("doc_id", "lang", "text")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2).getBytes("UTF-8")))
        .sortBy(_._1)
        .toSeq
      write(path, rows, blockRecords)
    }
    path
  }
}

/** `spark.read.format("graft.sources.GbdSource").load(path)` */
class GbdSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GbdFormat.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new GbdTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

final class GbdTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "gbd source requires a path (use .load(path) / .save(path))")
  override def name(): String = s"gbd:$path"
  override def schema(): StructType = GbdFormat.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GbdScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GbdWriteBuilder(path, info)
}

final class GbdScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var required: StructType = GbdFormat.Schema
  private var pushed: Array[Filter] = Array.empty
  private var aggPushed: Option[Seq[AggregateFunc]] = None

  /** Accept doc_id comparisons for block pruning; return EVERY filter as
    * a residual so Spark re-evaluates them row-by-row (pruning is an
    * optimization, never a correctness dependency).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("doc_id", _) | GreaterThan("doc_id", _) | GreaterThanOrEqual("doc_id", _) |
          LessThan("doc_id", _) | LessThanOrEqual("doc_id", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }

  /** COUNT(*) / MIN(doc_id) / MAX(doc_id) with no grouping — in any
    * combination — are answered from the block index alone: per-block
    * (nRecords, minId, maxId) live in the gbx footer, so the aggregate
    * reads ZERO shard-data bytes and schedules ONE task regardless of
    * corpus size. Complete pushdown is only offered on a residual-free
    * scan: pushFilters keeps every predicate as a residual, and Spark
    * only attempts aggregate pushdown when no post-scan filters remain,
    * so an index answer can never silently ignore a WHERE clause.
    * Partial (per-group) pushdown is declined — grouped aggregates
    * need the data.
    */
  private def isDocIdRef(
      e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames().sameElements(Array("doc_id"))
      case _ => false
    }

  private def indexAnswerable(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case m: Min => isDocIdRef(m.column)
    case m: Max => isDocIdRef(m.column)
    case _ => false
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    pushed.isEmpty &&
      agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().nonEmpty &&
      agg.aggregateExpressions().forall(indexAnswerable)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (supportCompletePushDown(agg)) {
      aggPushed = Some(agg.aggregateExpressions().toSeq); true
    } else false
  }

  override def build(): Scan = aggPushed match {
    case Some(fs) => new GbdAggScan(path, fs)
    case None => new GbdScan(path, required, pushed)
  }
}

/** Index-only aggregate scan: one partition emitting one pre-aggregated
  * row computed from the gbx block metadata (count = Σ nRecords,
  * min = min(minId), max = max(maxId)) — no shard data file is ever
  * opened. An empty table answers count 0 and NULL min/max (standard
  * aggregate semantics).
  */
final class GbdAggScan(path: String, funcs: Seq[AggregateFunc]) extends Scan with Batch {
  private lazy val metas = GbdFormat.shardsOf(path).flatMap(GbdFormat.readIndex)
  private lazy val values: Array[Any] = funcs.map {
    case _: CountStar => java.lang.Long.valueOf(metas.map(_.nRecords.toLong).sum)
    case _: Min =>
      if (metas.isEmpty) null else java.lang.Long.valueOf(metas.map(_.minId).min)
    case _: Max =>
      if (metas.isEmpty) null else java.lang.Long.valueOf(metas.map(_.maxId).max)
    case other => sys.error(s"unexpected pushed aggregate $other")
  }.toArray
  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"count_$i", LongType, nullable = false)
    case (_: Min, i) => StructField(s"min_$i", LongType, nullable = true)
    case (_: Max, i) => StructField(s"max_$i", LongType, nullable = true)
    case (other, _) => sys.error(s"unexpected pushed aggregate $other")
  })
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(GbdAggPartition(values.toIndexedSeq))
  override def createReaderFactory(): PartitionReaderFactory = new GbdAggReaderFactory
  /** Shows in `.explain` — the no-data-read evidence the spec asserts
    * (the historical `count-pushdown` token is kept for count-only
    * pushes; mixed pushes report `agg-pushdown`).
    */
  override def description(): String = {
    val what = funcs.map {
      case _: CountStar => "count(*)"
      case _: Min => "min(doc_id)"
      case _: Max => "max(doc_id)"
      case other => other.toString
    }.mkString(",")
    if (funcs.forall(_.isInstanceOf[CountStar]))
      s"gbd count-pushdown rows=${values.head} (index-only, no data read)"
    else s"gbd agg-pushdown [$what] (index-only, no data read)"
  }
}

final case class GbdAggPartition(vs: IndexedSeq[Any]) extends InputPartition

final class GbdAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val vs = partition.asInstanceOf[GbdAggPartition].vs
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = new GenericInternalRow(vs.toArray)
      override def close(): Unit = ()
    }
  }
}

final class GbdScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // filter values arrive boxed; doc_id predicates may carry Int or Long
  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  private def blockSurvives(b: GbdFormat.BlockMeta): Boolean =
    pushed.forall {
      case EqualTo("doc_id", v) => asLong(v).forall(x => x >= b.minId && x <= b.maxId)
      case GreaterThan("doc_id", v) => asLong(v).forall(b.maxId > _)
      case GreaterThanOrEqual("doc_id", v) => asLong(v).forall(b.maxId >= _)
      case LessThan("doc_id", v) => asLong(v).forall(b.minId < _)
      case LessThanOrEqual("doc_id", v) => asLong(v).forall(b.minId <= _)
      case _ => true
    }

  // ---- runtime (join-driven) block pruning -------------------------------
  // DPP hands the scan the build side's doc_id set as In("doc_id", ...)
  // AFTER planning but BEFORE execution; a block survives iff some value
  // falls inside its (minId, maxId) range. Like the static push, this is
  // a pure optimization: the join itself re-filters every surviving row.

  @volatile private var runtimeIds: Option[Array[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("doc_id"))

  override def filter(filters: Array[Filter]): Unit = {
    // Pruning is only SOUND if the kept id set is a superset of the
    // matching ids: a value the Long conversion doesn't cover (a Decimal
    // or String arriving through some future cast on doc_id) must
    // disable runtime pruning for the scan entirely — silently dropping
    // it from the set would prune blocks that hold genuinely matching
    // rows (missing results, not a slow query).
    runtimeIds = filters.collectFirst {
      case org.apache.spark.sql.sources.In("doc_id", vs) =>
        val converted = vs.map(asLong)
        if (converted.forall(_.isDefined))
          Some(converted.flatten.sorted)
        else None // unconvertible value => no-op, never unsound
    }.flatten
    GbdScan.lastRuntime = runtimeIds.map(ids => (ids.length, planNow().length))
  }

  private def blockSurvivesRuntime(b: GbdFormat.BlockMeta): Boolean =
    runtimeIds.forall { ids =>
      // sorted array: any id within [minId, maxId]?
      val i = java.util.Arrays.binarySearch(ids, b.minId)
      val at = if (i >= 0) i else -i - 1
      at < ids.length && ids(at) <= b.maxId
    }

  private lazy val allBlocks: Seq[(String, GbdFormat.BlockMeta)] =
    GbdFormat.shardsOf(path).flatMap(p => GbdFormat.readIndex(p).map(b => (p, b)))

  /** Re-evaluated on every call so a runtime filter() delivered between
    * planning and execution re-prunes (BatchScanExec re-plans partitions
    * after pushing runtime filters — a cached lazy val would freeze the
    * pre-filter block list).
    */
  private def planNow(): Array[InputPartition] =
    allBlocks.iterator
      .filter { case (_, b) => blockSurvives(b) && blockSurvivesRuntime(b) }
      .map { case (p, b) => GbdBlockPartition(p, b.offset, b.nRecords): InputPartition }
      .toArray

  override def planInputPartitions(): Array[InputPartition] = planNow()
  override def createReaderFactory(): PartitionReaderFactory =
    new GbdReaderFactory(required.fieldNames)

  /** Shows in `.explain` — the pruning evidence plan specs assert on. */
  override def description(): String = {
    val total = allBlocks.length
    val kept = allBlocks.count { case (_, b) => blockSurvives(b) }
    s"gbd blocks=$kept/$total cols=${required.fieldNames.mkString(",")} " +
      s"pushed=${pushed.mkString(",")}"
  }
}

object GbdScan {
  /** Test observability: (runtime-filter value count, blocks surviving
    * after the runtime prune) from the most recent `filter()` call.
    */
  @volatile var lastRuntime: Option[(Int, Int)] = None
}

final case class GbdBlockPartition(path: String, offset: Long, nRecords: Int)
    extends InputPartition

final class GbdReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GbdBlockPartition]
    new GbdBlockReader(p, cols)
  }
}

/** Reads one block. Skips payload bytes entirely when the projection
  * doesn't include them (`DataInputStream.skipBytes` → no allocation,
  * and on a real filesystem no page-cache pollution either).
  */
final class GbdBlockReader(p: GbdBlockPartition, cols: Array[String])
    extends PartitionReader[InternalRow] {
  private val needLang = cols.contains("lang")
  private val needPayload = cols.contains("payload")
  private val in = {
    val fis = new FileInputStream(p.path)
    try {
      // require forward progress: FileInputStream.skip returns 0 past
      // EOF, so a truncated shard with a stale index must fail the task,
      // not hang it
      var toSkip = p.offset
      while (toSkip > 0) {
        val s = fis.skip(toSkip)
        require(s > 0, s"truncated shard ${p.path}: cannot seek to offset ${p.offset}")
        toSkip -= s
      }
      val d = new DataInputStream(new java.io.BufferedInputStream(fis, 1 << 16))
      val n = d.readInt()
      require(n == p.nRecords, s"index/block mismatch at offset ${p.offset}: $n vs ${p.nRecords}")
      d
    } catch {
      case e: Throwable => fis.close(); throw e // no fd leak on a bad block/index
    }
  }
  private var remaining = p.nRecords
  private var row: InternalRow = _

  private def skipFully(n: Int): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skipBytes(left)
      require(s > 0, s"truncated block at offset ${p.offset}")
      left -= s
    }
  }

  override def next(): Boolean = {
    if (remaining == 0) return false
    remaining -= 1
    val id = in.readLong()
    // length -1 marks SQL NULL (distinct from length 0 = empty value)
    val langLen = in.readInt()
    val lang: AnyRef =
      if (langLen < 0) null
      else if (needLang) {
        val b = new Array[Byte](langLen); in.readFully(b); UTF8String.fromBytes(b)
      } else { skipFully(langLen); null }
    val payLen = in.readInt()
    val payload: AnyRef =
      if (payLen < 0) null
      else if (needPayload) {
        val b = new Array[Byte](payLen); in.readFully(b); b
      } else { skipFully(payLen); null }
    val values = cols.map {
      case "doc_id" => java.lang.Long.valueOf(id)
      case "lang" => lang
      case "payload" => payload
    }
    row = new GenericInternalRow(values.asInstanceOf[Array[Any]])
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** Distributed write path: one shard (+ its gbx index) per input
  * partition, written by the executor that holds the partition — the
  * production counterpart of `GbdFormat.write`'s driver-side staging.
  * Each task streams its rows into `part-<partition>-<uuid>.gbd.tmp`
  * in `blockRecords` blocks, tracking per-block (minId, maxId) as it
  * goes; task commit renames index-then-data (readers discover shards
  * by `*.gbd` listing, so an index without its data file is invisible
  * and a half-written tmp is never visible at all). Input rows arrive
  * in the table schema (doc_id, lang, payload); null lang/payload are
  * stored with a -1 length marker and read back as null.
  */
final class GbdWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GbdBatchWrite(
      path, info.options.getInt("blockRecords", 512))
  }
}

final class GbdBatchWrite(dir: String, blockRecords: Int) extends BatchWrite {
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GbdWriterFactory(dir, blockRecords)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  /** Job-level abort: tasks that already committed renamed their shards
    * into place, so roll them back here — otherwise a failed job leaves
    * a partial (and on rerun, duplicated) directory.
    */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GbdShardCommitted(p, _) if p.nonEmpty =>
        Files.deleteIfExists(Paths.get(p))
        Files.deleteIfExists(Paths.get(s"$p.gbx"))
      case _ => ()
    }
}

final case class GbdShardCommitted(path: String, nRecords: Long) extends WriterCommitMessage

final class GbdWriterFactory(dir: String, blockRecords: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GbdShardWriter(dir, partitionId, blockRecords)
}

final class GbdShardWriter(dir: String, partitionId: Int, blockRecords: Int)
    extends DataWriter[InternalRow] {
  private val tag = java.util.UUID.randomUUID().toString.take(8)
  private val finalPath =
    java.nio.file.Paths.get(dir, f"part-$partitionId%05d-$tag.gbd")
  private val tmpData = java.nio.file.Paths.get(s"$finalPath.tmp")
  private val tmpIdx = java.nio.file.Paths.get(s"$finalPath.gbx.tmp")

  private val out = new DataOutputStream(new java.io.BufferedOutputStream(
    new FileOutputStream(tmpData.toFile)))
  out.writeBytes("GBD1")
  private var offset = 4L
  private var total = 0L

  // current block accumulator: record bytes are buffered so the block
  // header (nRecords) can be written first, as the reader expects
  private val blockBuf = new java.io.ByteArrayOutputStream()
  private val blockOut = new DataOutputStream(blockBuf)
  private var blockN = 0
  private var blockMin = Long.MaxValue
  private var blockMax = Long.MinValue
  private val blocks = ArrayBuffer.empty[GbdFormat.BlockMeta]

  private def flushBlock(): Unit = if (blockN > 0) {
    val bytes = blockBuf.toByteArray
    blocks += GbdFormat.BlockMeta(offset, blockN, blockMin, blockMax)
    out.writeInt(blockN)
    out.write(bytes)
    offset += 4 + bytes.length
    blockBuf.reset(); blockN = 0
    blockMin = Long.MaxValue; blockMax = Long.MinValue
  }

  // length -1 encodes SQL NULL so a write→read round trip preserves null
  // semantics (empty string/bytes stay distinct from null)
  private def writeField(bytes: Array[Byte]): Unit =
    if (bytes == null) blockOut.writeInt(-1)
    else { blockOut.writeInt(bytes.length); blockOut.write(bytes) }

  override def write(row: InternalRow): Unit = {
    val id = row.getLong(0)
    val lang = if (row.isNullAt(1)) null else row.getUTF8String(1).getBytes
    val payload = if (row.isNullAt(2)) null else row.getBinary(2)
    blockOut.writeLong(id)
    writeField(lang)
    writeField(payload)
    blockMin = math.min(blockMin, id); blockMax = math.max(blockMax, id)
    blockN += 1; total += 1
    if (blockN >= blockRecords) flushBlock()
  }

  override def commit(): WriterCommitMessage = {
    flushBlock()
    out.close()
    if (total == 0) { // empty partition: no shard litter
      Files.deleteIfExists(tmpData)
      return GbdShardCommitted("", 0L)
    }
    val idx = new DataOutputStream(new FileOutputStream(tmpIdx.toFile))
    try {
      idx.writeBytes("GBX1")
      idx.writeInt(blocks.length)
      blocks.foreach { b =>
        idx.writeLong(b.offset); idx.writeInt(b.nRecords)
        idx.writeLong(b.minId); idx.writeLong(b.maxId)
      }
    } finally idx.close()
    // index first, then data: readers list *.gbd, so the shard only
    // becomes visible once both files are in place
    Files.move(tmpIdx, Paths.get(s"$finalPath.gbx"), StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmpData, finalPath, StandardCopyOption.REPLACE_EXISTING)
    GbdShardCommitted(finalPath.toString, total)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(tmpData)
    Files.deleteIfExists(tmpIdx)
  }

  override def close(): Unit = ()
}
