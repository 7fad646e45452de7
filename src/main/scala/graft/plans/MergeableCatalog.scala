package graft.plans

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** An in-memory DataSource V2 catalog whose tables support ROW-LEVEL
  * operations — the interface (`SupportsRowLevelOperations`) that unlocks
  * Spark's native `MERGE INTO` statement (README.md:28 "updates", the
  * textual form of the upsert family: `sink_upsert`/`sink_cdc_apply`
  * implement the same semantics as windows).
  *
  * Spark's built-in file sources cannot MERGE; the analyzer's
  * `RewriteMergeIntoTable` rule requires a v2 table that declares how its
  * rows are replaced. This catalog implements the GROUP-BASED contract
  * (the one Iceberg/Delta's copy-on-write mode uses): the operation's
  * scan reads the affected row groups, Spark computes the merged output
  * (surviving rows + updates + inserts — one join, fully distributed),
  * and the operation's write REPLACES those groups atomically on commit.
  * Here the whole table is one group, so commit swaps the table contents.
  *
  * Scale shape: the distributed part of MERGE — the target↔source join
  * and the merged-row computation — is Spark's own plan, identical to
  * what it produces for Iceberg at any scale; executors stream rows
  * through reader/writer factories, never through the driver's query
  * path. What is deliberately simplified is the COMMIT PAYLOAD: writers
  * hand row buffers to the driver where a production catalog hands file
  * handles, and groups are whole-table where a production catalog tracks
  * per-file groups (`requiredMetadataAttributes` = _file + runtime group
  * filtering). The MERGE surface, rewrite, and plan shape — the parts
  * this entry pins — are the production ones.
  */
class MergeableCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog {

  private var catalogName: String = "graftcat"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    MergeableCatalog.tables.keySet().asScala
      .filter(_.namespace().sameElements(namespace)).toArray

  override def loadTable(ident: Identifier): Table = {
    val t = MergeableCatalog.tables.get(ident)
    if (t == null) throw new NoSuchTableException(ident)
    t
  }

  /** `VERSION AS OF v` time travel: every commit appends an immutable
    * snapshot (version 0 = the empty table at creation), and a versioned
    * load returns a read-only table over that snapshot — the
    * Iceberg/Delta history contract in miniature, backing the
    * "timestamped raw history" mandate (README.md:27) with a queryable
    * form. Snapshots share row arrays (commits replace the reference,
    * never mutate), so history costs one pointer per version plus the
    * appended rows.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = MergeableCatalog.tables.get(ident)
    if (t == null) throw new NoSuchTableException(ident)
    val v = try version.toInt catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"version must be an integer snapshot id, got '$version'")
    }
    new SnapshotTable(s"${t.name()}@v$v", t.schema(), t.snapshotAt(v))
  }

  /** `TIMESTAMP AS OF t` time travel: resolves to the LATEST snapshot
    * whose commit time is ≤ t — the Iceberg/Delta timestamp-travel
    * contract. Commit times here come from a SYNTHETIC commit clock
    * (version v committed at BASE + v minutes) so timestamp travel is
    * deterministic and replayable; a storage-backed catalog would read
    * real commit metadata, with exactly this floor-to-version lookup.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = MergeableCatalog.tables.get(ident)
    if (t == null) throw new NoSuchTableException(ident)
    require(timestamp >= MergeableCatalog.CommitClockBaseMicros,
      s"timestamp precedes the first snapshot of ${t.name()}")
    val v = math.min(
      (timestamp - MergeableCatalog.CommitClockBaseMicros) / 60000000L,
      t.versionCount - 1L).toInt
    new SnapshotTable(s"${t.name()}@t$timestamp", t.schema(), t.snapshotAt(v))
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (MergeableCatalog.tables.containsKey(ident))
      throw new TableAlreadyExistsException(ident)
    // `PARTITIONED BY (bucket(n, col))` — the storage-partitioned-join
    // layout; any other transform is rejected loudly rather than
    // silently ignored
    val bucket = partitions.toSeq match {
      case Seq() => None
      case Seq(t) if t.name == "bucket" =>
        val n = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value.asInstanceOf[Number].intValue()
        }.getOrElse(throw new IllegalArgumentException(
          s"bucket transform needs a literal bucket count: $t"))
        val colName = t.references.head.fieldNames.mkString(".")
        val idx = schema.fieldIndex(colName)
        require(schema.fields(idx).dataType == LongType,
          s"bucket column $colName must be BIGINT")
        Some(BucketSpec(idx, n, t))
      case other => throw new UnsupportedOperationException(
        s"unsupported partitioning: ${other.mkString(", ")}")
    }
    val t = new MergeableMemTable(ident.toString, schema, bucket)
    MergeableCatalog.tables.put(ident, t)
    t
  }

  /** `ALTER TABLE … ADD COLUMNS` — in-place schema evolution, the v2
    * counterpart of `scan_merge_schema`'s file-side widening: the table's
    * schema gains the new trailing columns and EVERY existing snapshot
    * (current and historical) reads back with NULL backfill — pure
    * schema-on-read, no data rewrite in a production catalog (here the
    * in-memory rows are padded once, standing in for the reader-side
    * projection a file catalog performs per scan). Only top-level
    * appended columns are supported; anything positional or nested is
    * rejected loudly rather than half-applied.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = MergeableCatalog.tables.get(ident)
    if (t == null) throw new NoSuchTableException(ident)
    val adds = changes.map {
      case a: TableChange.AddColumn
          if a.fieldNames().length == 1 && a.position() == null =>
        org.apache.spark.sql.types.StructField(
          a.fieldNames()(0), a.dataType(), a.isNullable)
      case other => throw new UnsupportedOperationException(
        s"only top-level appended ADD COLUMNS is supported: $other")
    }
    t.evolve(adds)
    t
  }

  override def dropTable(ident: Identifier): Boolean =
    MergeableCatalog.tables.remove(ident) != null

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val t = MergeableCatalog.tables.remove(oldIdent)
    if (t == null) throw new NoSuchTableException(oldIdent)
    MergeableCatalog.tables.put(newIdent, t)
  }

  // Namespaces are accepted permissively: this catalog's contract is the
  // row-level-operation machinery, not namespace lifecycle.
  override def listNamespaces(): Array[Array[String]] =
    MergeableCatalog.tables.keySet().asScala.map(_.namespace().toSeq).toSet
      .map((ns: Seq[String]) => ns.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    Array.empty

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    util.Collections.emptyMap()

  override def namespaceExists(namespace: Array[String]): Boolean = true

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit = ()

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new NoSuchNamespaceException(namespace)

  // FunctionCatalog: the one function the partitioning layer needs.
  // Spark resolves a table's partition transforms against the table's
  // OWN catalog with an empty-namespace identifier (V2ExpressionUtils
  // .loadV2FunctionOpt), so `bucket` must live here for the
  // storage-partitioned join's compatibility check to bind both sides
  // to the same canonical function.
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty[String], "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name() == "bucket") GraftBucket
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
}

/** `bucket(n, key)`: ((key mod n) + n) mod n — deterministic, sign-safe,
  * and trivially replayable in SQL, which keeps every entry over a
  * bucketed table oracle-pairable (a murmur-style bucket would be
  * engine-private). Both sides of a storage-partitioned join bind to
  * THIS object, so `canonicalName` equality — Spark's co-partition
  * compatibility test — holds by construction.
  */
object GraftBucket extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String = "bucket(n, key) = ((key % n) + n) % n"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket(n, key) takes 2 arguments, got $inputType")
    BucketBound
  }
}

object BucketBound extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket(int, bigint)"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val k = input.getLong(1)
    (((k % n) + n) % n).toInt
  }
}

private[plans] final case class BucketSpec(colIdx: Int, n: Int, transform: Transform) {
  def idOf(row: InternalRow): Int = {
    val k = row.getLong(colIdx)
    (((k % n) + n) % n).toInt
  }
}

object MergeableCatalog {
  // one table store per JVM: every session (and every executor thread in
  // local mode) sees the same committed state, like a shared metastore
  private val tables = new ConcurrentHashMap[Identifier, MergeableMemTable]()

  // synthetic commit clock origin: version v "committed" at BASE + v min
  private[plans] val CommitClockBaseMicros: Long =
    java.time.Instant.parse("2024-06-01T00:00:00Z").toEpochMilli * 1000L
}

/** The v2 table: batch-readable, batch-writable (append + truncate), and
  * row-level-operable. Committed rows live in one immutable array swapped
  * atomically on commit — readers snapshot it at scan-build time, so a
  * MERGE's scan and its replacing write see a consistent version.
  */
class MergeableMemTable(
    tableName: String, tableSchema: StructType,
    bucket: Option[BucketSpec] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations {

  @volatile private var committed: Array[InternalRow] = Array.empty

  // the LIVE schema: starts as the created schema, widened by `evolve`
  @volatile private var curSchema: StructType = tableSchema

  // snapshot per commit; index = version, version 0 = empty at creation
  private val history =
    scala.collection.mutable.ArrayBuffer[Array[InternalRow]](Array.empty)

  private[plans] def currentRows: Array[InternalRow] = committed

  /** Append columns to the schema; NULL-backfill every stored snapshot
    * row to the new arity so current AND versioned reads stay aligned
    * with `schema()` (see `alterTable` for the production analogy).
    */
  private[plans] def evolve(newCols: Seq[org.apache.spark.sql.types.StructField]): Unit =
    synchronized {
      val oldTypes = curSchema.fields.map(_.dataType)
      val oldWidth = oldTypes.length
      curSchema = StructType(curSchema.fields ++ newCols)
      val width = curSchema.length
      def pad(rows: Array[InternalRow]): Array[InternalRow] = rows.map { r =>
        val vals = new Array[Any](width)
        var i = 0
        while (i < oldWidth) { vals(i) = r.get(i, oldTypes(i)); i += 1 }
        new GenericInternalRow(vals): InternalRow
      }
      // history entries share row arrays with `committed` by reference;
      // pad each DISTINCT array once so sharing (and memory) is preserved
      val seen = new java.util.IdentityHashMap[Array[InternalRow], Array[InternalRow]]()
      def padShared(rows: Array[InternalRow]): Array[InternalRow] = {
        val cached = seen.get(rows)
        if (cached != null) cached else { val p = pad(rows); seen.put(rows, p); p }
      }
      for (i <- history.indices) history(i) = padShared(history(i))
      committed = padShared(committed)
    }

  private[plans] def versionCount: Int = synchronized { history.length }

  private[plans] def snapshotAt(version: Int): Array[InternalRow] =
    synchronized {
      require(version >= 0 && version < history.length,
        s"no snapshot $version for table $tableName " +
          s"(versions 0..${history.length - 1})")
      history(version)
    }

  override def name(): String = tableName
  override def schema(): StructType = curSchema
  override def partitioning(): Array[Transform] =
    bucket.map(_.transform).toArray
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => bucket match {
      case Some(spec) => new KeyedMemScan(curSchema, committed, spec)
      case None => new MemScan(curSchema, committed)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(this, replaceAll = false, rowLevel = false)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      // the operation's scan defines the GROUPS the write replaces; one
      // group = the whole table, so no metadata attributes are needed
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        () => new MemScan(curSchema, committed)
      override def newWriteBuilder(lwi: LogicalWriteInfo): WriteBuilder =
        new MemWriteBuilder(MergeableMemTable.this, replaceAll = true,
          rowLevel = true)
    }

  private[plans] def commitRows(rows: Array[InternalRow], replaceAll: Boolean): Unit =
    synchronized {
      committed = if (replaceAll) rows else committed ++ rows
      history += committed
    }
}

/** Read-only view of one committed snapshot, returned by versioned loads. */
private final class SnapshotTable(
    tableName: String, tableSchema: StructType, rows: Array[InternalRow])
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new MemScan(tableSchema, rows)
}

/** Scan over a snapshot: rows split into up to 4 input partitions so the
  * read side exercises the normal parallel reader path, not a single task.
  */
private class MemScan(schema: StructType, snapshot: Array[InternalRow])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.min(4, math.max(1, snapshot.length))
    (0 until n).map(i => MemPartition(
      snapshot.zipWithIndex.collect { case (r, j) if j % n == i => r })
    ).toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition match {
        case MemPartition(rs) => rs
        case KeyedMemPartition(rs, _) => rs
      }
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = rows(i)
        override def close(): Unit = ()
      }
    }
}

/** Bucketed scan: one input partition per PRESENT bucket, each carrying
  * its key (`HasPartitionKey`), and the scan reports
  * `KeyGroupedPartitioning` over the table's bucket transform — the
  * contract behind Spark's STORAGE-PARTITIONED JOIN: two tables bucketed
  * the same way on the join key join with ZERO shuffle, the layout move
  * that makes 100 TB fact-fact joins affordable (Iceberg exposes its
  * bucket layout through exactly this interface).
  */
private final class KeyedMemScan(
    schema: StructType, snapshot: Array[InternalRow], spec: BucketSpec)
    extends MemScan(schema, snapshot) with SupportsReportPartitioning {
  private val grouped: Seq[(Int, Array[InternalRow])] =
    snapshot.groupBy(spec.idOf).toSeq.sortBy(_._1)
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(spec.transform), math.max(1, grouped.length))
  override def planInputPartitions(): Array[InputPartition] =
    if (grouped.isEmpty) Array(KeyedMemPartition(Array.empty, 0))
    else grouped.map { case (id, rows) =>
      KeyedMemPartition(rows, id)
    }.toArray[InputPartition]
}

private final case class MemPartition(rows: Array[InternalRow]) extends InputPartition

private final case class KeyedMemPartition(rows: Array[InternalRow], bucketId: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucketId))
}

/** Append by default; `truncate()` (INSERT OVERWRITE) and the row-level
  * replace path both flip to replace-on-commit.
  */
private final class MemWriteBuilder(
    table: MergeableMemTable, replaceAll: Boolean, rowLevel: Boolean)
    extends WriteBuilder with SupportsTruncate {
  private var replace = replaceAll
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new MemBatchWrite(table, table.schema(), replace, rowLevel)
  }
}

/** Executors buffer their rows and hand them back as commit messages; the
  * driver-side commit swaps (or extends) the table contents atomically —
  * the standard DSv2 commit protocol, with row buffers standing in for
  * the file handles a storage-backed catalog would carry.
  *
  * Row-level writes arrive OP-PREFIXED: `ReplaceDataExec` only applies
  * its op-stripping projection when the operation declares
  * `requiredMetadataAttributes` (its `writingTask` falls back to the
  * plain task otherwise — WriteToDataSourceV2Exec.scala in Spark 4.1),
  * so a metadata-free connector receives MergeRows' raw
  * `[__row_operation, cols...]` layout. The writer strips the leading
  * operation column itself (all surviving group-based rows are
  * WRITE/WRITE_WITH_METADATA; DELETE rows are skipped defensively).
  */
private final class MemBatchWrite(
    table: MergeableMemTable, schema: StructType,
    replaceAll: Boolean, rowLevel: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    MemWriterFactory(schema, rowLevel)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    table.commitRows(
      messages.flatMap(_.asInstanceOf[MemWriteMessage].rows), replaceAll)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private final case class MemWriterFactory(schema: StructType, rowLevel: Boolean)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
      private val n = schema.length
      // projects [op, c0..cn-1] -> [c0..cn-1]; built lazily so plain
      // appends (rows already in table layout) never pay for it
      private lazy val stripOp = UnsafeProjection.create(
        schema.fields.zipWithIndex.map { case (f, i) =>
          BoundReference(i + 1, f.dataType, nullable = true)
        }.toIndexedSeq)
      private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      override def write(record: InternalRow): Unit =
        if (rowLevel && record.numFields == n + 1) {
          if (record.getInt(0) != 1) buf += stripOp(record).copy() // 1 = DELETE
        } else buf += record.copy()
      override def commit(): WriterCommitMessage = MemWriteMessage(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

private final case class MemWriteMessage(rows: Array[InternalRow])
    extends WriterCommitMessage
