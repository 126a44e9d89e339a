package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.connector.expressions.{Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeFiltering}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.{FileStats, SnapshotLake}

/** DataSource V2 connector for the snapshot lake —
  * `spark.read.format("graftlake").option("path", root)` — the
  * Spark-native packaging of the manifest/index layer:
  *
  *   - **Snapshot isolation / time travel**: the scan resolves ONE
  *     manifest version (`versionAsOf` or head) at planning time and
  *     holds its explicit file list — commits landing later change
  *     nothing mid-query, the q217 property exposed through the
  *     standard reader API.
  *   - **Filter pushdown → FILE pruning**: range/equality filters reach
  *     [[GraftLakeScanBuilder.pushFilters]], are converted to
  *     [[FileStats.Range]]s, and prune the file list through the same
  *     conservative `mayMatch` every native reader uses — a file the
  *     sidecar index disproves never becomes an input partition, so
  *     Catalyst's planner sees only the surviving files. ALL filters
  *     are reported back as residual (`pushedFilters()` is empty), so
  *     Spark re-applies them row-level above the scan: pruning is a
  *     performance lever, never a correctness input — exactly the
  *     contract of `readPruned`, now composed with any DataFrame query.
  *   - **Column pruning → parquet projection**: the required schema
  *     from [[GraftLakeScanBuilder.pruneColumns]] becomes the parquet
  *     read projection (`parquet.read.schema`), so unselected columns
  *     are never decoded — `ReadSchema` through a custom connector.
  *   - One input partition per manifest file: Spark schedules them like
  *     any other scan (32 files ⇒ 32 tasks), locality-free on object
  *     storage exactly as Delta/Iceberg connectors plan.
  *
  * Scope (documented, enforced): plain (non-hive-partitioned) listings
  * of primitive-typed columns (long/int/double/float/boolean/string),
  * no live deletion vectors — the shapes the row-group [[Group]]
  * converter handles. The native [[SnapshotLake.read]] path keeps full
  * coverage; this connector exists so the lake participates in the
  * standard source API with its index intact.
  */
class GraftLakeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftlake"

  private def rootOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graftlake needs .option(\"path\", <lake root>) or load(<root>)")
    p
  }

  private def versionOf(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("versionAsOf")).map(_.toLong)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = rootOf(options)
    // a lake with no committed version yet has no schema — the WRITE
    // path creates it (ACCEPT_ANY_SCHEMA below skips the append-vs-table
    // schema match that would otherwise reject the first commit)
    if (SnapshotLake.currentVersion(root).isEmpty) new StructType()
    else SnapshotLake.read(SparkSession.active, root, versionOf(options)).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GraftLakeTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

final class GraftLakeTable(root: String, schema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graftlake:$root"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] = {
    // BATCH_WRITE routes DataFrameWriter.save into the v2 plan;
    // V1_BATCH_WRITE tells it the Write resolves to an InsertableRelation
    val caps = java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)
    // creating commit: nothing to enforce against. Existing lake:
    // schema IS enforced — an append whose columns don't match fails
    // analysis, the Delta writer contract.
    if (schema.isEmpty) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLakeScanBuilder(
      Option(options.get("path")).getOrElse(root),
      Option(options.get("versionAsOf")).map(_.toLong), schema,
      startingVersion = Option(options.get("startingVersion"))
        .map(_.toLong).getOrElse(0L),
      ignoreChanges = Option(options.get("ignoreChanges"))
        .exists(_.toBoolean))

  /** Batch writes via the V1 fallback (`V1_BATCH_WRITE`) — the whole
    * input lands through [[SnapshotLake.append]]/[[SnapshotLake.overwrite]]
    * on the driver-side plan, which distributes the actual parquet write
    * and sidecar harvest itself and serializes only the manifest CAS:
    * exactly the shape Spark's own JDBC v2 connector uses, with the
    * lake's snapshot-isolation and index guarantees intact.
    * `.option("statsCols", "a,b")` / `.option("bloomCol", "k")` request
    * commit-time sidecar indexes. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftLakeWriteBuilder(
      Option(info.options.get("path")).getOrElse(root), info.options)
}

final class GraftLakeWriteBuilder(root: String,
                                  options: CaseInsensitiveStringMap)
    extends WriteBuilder with SupportsTruncate {
  private var overwriteAll = false
  override def truncate(): WriteBuilder = { overwriteAll = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: org.apache.spark.sql.DataFrame,
                            overwrite: Boolean): Unit = {
          val idx = SnapshotLake.IndexSpec(
            Option(options.get("statsCols")).toSeq
              .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
            Option(options.get("bloomCol")).map(_.trim).filter(_.nonEmpty))
          val replacing = overwriteAll || overwrite
          // schema enforcement lives HERE: supportsExternalMetadata
          // means Spark hands the writer the query's own schema, so
          // analysis never compares it to the table's — an append that
          // doesn't match the lake (names AND types, Delta's contract)
          // must fail before any file is written. Overwrite replaces
          // the table, so any schema is legal.
          if (!replacing)
            SnapshotLake.currentVersion(root).foreach { v =>
              val lake = SnapshotLake
                .read(data.sparkSession, root, Some(v)).schema
              def shape(s: StructType) = s.fields.toSeq.map(f => (f.name, f.dataType))
              require(shape(data.schema) == shape(lake),
                s"append schema ${data.schema.simpleString} does not match " +
                  s"lake schema ${lake.simpleString} at $root")
            }
          if (replacing) SnapshotLake.overwrite(data, root, idx)
          else SnapshotLake.append(data, root, idx)
          ()
        }
      }
  }
}

final class GraftLakeScanBuilder(root: String, version: Option[Long],
                                 fullSchema: StructType,
                                 startingVersion: Long = 0L,
                                 ignoreChanges: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var ranges: Seq[FileStats.Range] = Nil
  private var residual: Array[Filter] = Array.empty
  private var aggPushed: Option[(StructType, Seq[Any])] = None

  /** Convert prunable conjuncts to index ranges. GreaterThan/LessThan
    * prune as their inclusive forms — a SUPERSET range, conservative by
    * construction. Everything is returned as residual: Spark re-applies
    * every filter row-level, so a range the index can't serve (or a
    * filter shape this never inspects) costs only unpruned files. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def s(v: Any): Option[String] = v match {
      case null => None
      case _: Long | _: Int | _: Double | _: Float | _: Short | _: Byte |
           _: String => Some(v.toString)
      case _ => None
    }
    ranges = filters.toSeq.flatMap {
      case EqualTo(a, v) => s(v).map(x => FileStats.Range(a, Some(x), Some(x)))
      case GreaterThanOrEqual(a, v) => s(v).map(x => FileStats.Range(a, Some(x), None))
      case GreaterThan(a, v) => s(v).map(x => FileStats.Range(a, Some(x), None))
      case LessThanOrEqual(a, v) => s(v).map(x => FileStats.Range(a, None, Some(x)))
      case LessThan(a, v) => s(v).map(x => FileStats.Range(a, None, Some(x)))
      case _ => None
    }
    residual = filters
    filters // all residual — pruning is advisory, never correctness
  }

  override def pushedFilters(): Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Metadata-only aggregate pushdown — COUNT(*) from the rows
    * sidecars, MIN/MAX (and COUNT(col) when null totals are known) from
    * the stats sidecars, answered at PLANNING time with zero data files
    * read: the Delta/Iceberg `numRecords` fast path through the
    * standard `SupportsPushDownAggregates` contract. Declared PARTIAL
    * (`supportCompletePushDown` = false), so Spark still runs a final
    * aggregate over the one emitted row — min(min), max(max),
    * sum(count) — and an unpushable shape simply falls back to a real
    * scan. Refused whenever metadata can't answer EXACTLY: any pushed
    * or residual filter, a GROUP BY, live deletion vectors, a file
    * without sidecar coverage, or a non-numeric column (parquet footer
    * binary stats may be truncated; numeric stats are exact). */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions.nonEmpty) return false
    if (ranges.nonEmpty || residual.nonEmpty) return false
    val v = version.orElse(SnapshotLake.currentVersion(root))
      .getOrElse(return false)
    if (SnapshotLake.deletesOf(root, v).nonEmpty) return false
    if (SnapshotLake.files(root, v).exists(_.startsWith("data/commit=")))
      return false

    def numericField(c: String): Option[StructField] =
      fullSchema.fields.find(_.name == c).filter(f => f.dataType match {
        case LongType | IntegerType | DoubleType | FloatType => true
        case _ => false
      })
    def parse(dt: DataType, s: String): Any = dt match {
      case LongType => try s.toLong catch { case _: NumberFormatException => s.toDouble.toLong }
      case IntegerType => try s.toInt catch { case _: NumberFormatException => s.toDouble.toInt }
      case DoubleType => s.toDouble
      case FloatType => s.toFloat
      case other => throw new IllegalStateException(other.toString)
    }
    def nameOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          Some(nr.fieldNames.head)
        case _ => None
      }
    lazy val totalRows = SnapshotLake.fastCount(root, Some(v))

    val cols: Seq[Option[(StructField, Any)]] =
      aggregation.aggregateExpressions.toSeq.map {
        case _: CountStar =>
          totalRows.map(n => StructField("count_star", LongType, nullable = false) -> n)
        case c: Count if !c.isDistinct => c.column match {
          // count(1)/count(lit) — every row counts, null-free by construction
          case l: Literal[_] if l.value != null =>
            totalRows.map(n => StructField("count_lit", LongType, nullable = false) -> n)
          case e => for {
            col <- nameOf(e)
            r <- SnapshotLake.statsRange(root, col, Some(v))
            nulls <- r.nulls
            n <- totalRows
          } yield StructField(s"count_$col", LongType, nullable = false) -> (n - nulls)
        }
        case m: Min => for {
          col <- nameOf(m.column)
          f <- numericField(col)
          r <- SnapshotLake.statsRange(root, col, Some(v))
        } yield StructField(s"min_$col", f.dataType, nullable = true) -> parse(f.dataType, r.min)
        case m: Max => for {
          col <- nameOf(m.column)
          f <- numericField(col)
          r <- SnapshotLake.statsRange(root, col, Some(v))
        } yield StructField(s"max_$col", f.dataType, nullable = true) -> parse(f.dataType, r.max)
        case _: AggregateFunc => None
      }
    if (cols.exists(_.isEmpty)) return false
    val resolved = cols.flatten
    aggPushed = Some((StructType(resolved.map(_._1)), resolved.map(_._2)))
    true
  }

  override def build(): Scan = aggPushed match {
    case Some((schema, row)) => new GraftLakeAggScan(schema, row)
    case None => buildFileScan()
  }

  private def buildFileScan(): Scan = {
    val v = version.orElse(SnapshotLake.currentVersion(root)).getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    require(SnapshotLake.deletesOf(root, v).isEmpty,
      "graftlake connector does not read versions with live deletion vectors")
    val all = SnapshotLake.files(root, v)
    require(all.forall(!_.startsWith("data/commit=")),
      "graftlake connector reads plain listings (hive-partitioned lakes " +
        "go through SnapshotLake.read)")
    fullSchema.fields.foreach { f => GraftLakeScan.parquetTypeOf(f); () }
    val stats = all.map(f => f.substring(0, f.lastIndexOf('/'))).distinct
      .flatMap(dir => FileStats.readStatsSidecar(root, dir)).toMap
    val kept = all.filter(f =>
      FileStats.mayMatch(stats.getOrElse(f, Map.empty), ranges))
    new GraftLakeScan(java.nio.file.Paths.get(root).toAbsolutePath.toString,
      kept, all.size, required, fullSchema, ranges, stats,
      root, startingVersion, ignoreChanges)
  }
}

final case class GraftLakeInputPartition(absPath: String) extends InputPartition

final class GraftLakeScan(rootAbs: String, kept: Seq[String], total: Int,
                          required: StructType, fullSchema: StructType,
                          ranges: Seq[FileStats.Range],
                          stats: Map[String, Map[String, FileStats.ColRange]],
                          root: String = "", startingVersion: Long = 0L,
                          ignoreChanges: Boolean = false)
    extends Scan with Batch with SupportsRuntimeFiltering {
  /** Files still scheduled after static AND runtime pruning. */
  @volatile private var liveFiles: Seq[String] = kept
  /** Pruning evidence for audits: files surviving the pushed ranges. */
  def keptFiles: Int = liveFiles.size
  def totalFiles: Int = total
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftLakeScan kept=${liveFiles.size}/$total pruned=${
      ranges.map(r => s"${r.col}∈[${r.lo.getOrElse("-∞")},${r.hi.getOrElse("∞")}]")
        .mkString(",")}"

  /** Runtime (join-driven) file pruning — Spark's DPP machinery hands
    * the build side's key set to the scan at EXECUTION time, after the
    * dimension is materialized; files whose sidecar range disproves
    * every key are dropped before any task launches. Same conservative
    * `mayMatch` as planning-time pruning, and the keys are re-checked
    * row-level by the join itself, so this can only skip I/O, never
    * change an answer. */
  override def filterAttributes(): Array[NamedReference] =
    // only columns the (pruned) scan still OUTPUTS — Spark resolves
    // these against readSchema, so an unprojected stats column here
    // fails analysis even though the sidecar could prune on it
    stats.valuesIterator.flatMap(_.keysIterator).toSet
      .intersect(required.fieldNames.toSet).toArray
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
  override def filter(filters: Array[Filter]): Unit = {
    def str(v: Any): Option[String] = v match {
      case null => None
      case _: Long | _: Int | _: Double | _: Float | _: Short | _: Byte |
           _: String => Some(v.toString)
      case u: UTF8String => Some(u.toString)
      case _ => None
    }
    // Per filter: a pre-computed [min,max] HULL of the build-side key
    // set (one comparison per file), refined per-value only when the
    // set is small — a million-key build side costs one pass to take
    // the hull, then O(files) work, never O(files × keys).
    val checks: Seq[String => Boolean] = filters.toSeq.map {
      case org.apache.spark.sql.sources.In(a, vs) =>
        val conv = vs.map(str)
        if (conv.contains(None)) { (_: String) => true } // null/opaque key: no pruning
        else {
          val keys = conv.flatten.toSeq
          if (keys.isEmpty) { (_: String) => false } // empty build side: empty join
          else {
            val numeric = fullSchema.fields.find(_.name == a).exists(_.dataType match {
              case LongType | IntegerType | DoubleType | FloatType |
                   ShortType | ByteType => true
              case _ => false
            })
            val ord: Ordering[String] =
              if (numeric) Ordering.by((s: String) => s.toDouble)
              else (a0: String, b0: String) => FileStats.utf8Cmp(a0, b0)
            val hull = FileStats.Range(a, Some(keys.min(ord)), Some(keys.max(ord)))
            (f: String) => {
              val fr = stats.getOrElse(f, Map.empty)
              FileStats.mayMatch(fr, Seq(hull)) &&
                (keys.length > 4096 || keys.exists(k =>
                  FileStats.mayMatch(fr, Seq(FileStats.Range(a, Some(k), Some(k))))))
            }
          }
        }
      case _ => (_: String) => true // unknown runtime-filter shape prunes nothing
    }
    liveFiles = liveFiles.filter(f => checks.forall(_(f)))
  }

  override def planInputPartitions(): Array[InputPartition] =
    liveFiles.map(f => GraftLakeInputPartition(s"$rootAbs/$f")).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    // count(*)-style empty projection still needs one decodable column
    // to drive row iteration; emit zero-width rows either way
    val projection =
      if (required.nonEmpty) required
      else StructType(fullSchema.fields.take(1))
    new GraftLakeReaderFactory(projection, required.isEmpty)
  }
}

/** The scan a fully-pushed aggregate resolves to: ONE synthetic input
  * partition emitting ONE row of sidecar-derived values, in the
  * aggregate-expression order Spark expects — no data file is opened.
  * Spark's final aggregate (the partial-pushdown contract) folds the
  * single row: min(min)=min, sum(count)=count. */
final class GraftLakeAggScan(schema: StructType, row: Seq[Any])
    extends Scan with Batch {
  def metadataOnly: Boolean = true
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftLakeAggScan metadata-only [${schema.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftLakeAggPartition(row))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = !emitted && { emitted = true; true }
          override def get(): InternalRow = new GenericInternalRow(
            p.asInstanceOf[GraftLakeAggPartition].values.toArray)
          override def close(): Unit = ()
        }
    }
}

final case class GraftLakeAggPartition(values: Seq[Any]) extends InputPartition

object GraftLakeScan {
  /** The parquet projection field for one Spark field — also the
    * supported-type gate, checked at Scan build time. */
  def parquetTypeOf(f: StructField): String = f.dataType match {
    case LongType => s"optional int64 ${f.name};"
    case IntegerType => s"optional int32 ${f.name};"
    case DoubleType => s"optional double ${f.name};"
    case FloatType => s"optional float ${f.name};"
    case BooleanType => s"optional boolean ${f.name};"
    case StringType => s"optional binary ${f.name} (UTF8);"
    case other => throw new UnsupportedOperationException(
      s"graftlake connector does not decode ${f.name}: $other")
  }
}

final class GraftLakeReaderFactory(projection: StructType, emptyRows: Boolean)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftLakePartitionReader(
      p.asInstanceOf[GraftLakeInputPartition].absPath, projection, emptyRows)
}

final class GraftLakePartitionReader(absPath: String, projection: StructType,
                                     emptyRows: Boolean)
    extends PartitionReader[InternalRow] {
  private val reader: ParquetReader[Group] = {
    val conf = new Configuration()
    val hPath = new org.apache.hadoop.fs.Path(absPath)
    // the projection must carry each field's OWN repetition (Spark
    // writes non-nullable columns as `required`; a blanket `optional`
    // fails parquet's containment check) — take the requested fields
    // verbatim from the file's footer schema
    val fileSchema = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hPath, conf))
      try r.getFooter.getFileMetaData.getSchema finally r.close()
    }
    val proj = new org.apache.parquet.schema.MessageType("graft_projection",
      projection.fields.map(f =>
        fileSchema.getType(fileSchema.getFieldIndex(f.name))): _*)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, proj.toString)
    ParquetReader.builder(new GroupReadSupport(), hPath).withConf(conf).build()
  }
  private var cur: Group = _

  override def next(): Boolean = { cur = reader.read(); cur != null }

  override def get(): InternalRow =
    if (emptyRows) new GenericInternalRow(Array.empty[Any])
    else {
      val values = new Array[Any](projection.length)
      val gt = cur.getType
      var i = 0
      while (i < projection.length) {
        val f = projection.fields(i)
        val gi = gt.getFieldIndex(f.name)
        values(i) =
          if (cur.getFieldRepetitionCount(gi) == 0) null
          else f.dataType match {
            case LongType => cur.getLong(gi, 0)
            case IntegerType => cur.getInteger(gi, 0)
            case DoubleType => cur.getDouble(gi, 0)
            case FloatType => cur.getFloat(gi, 0)
            case BooleanType => cur.getBoolean(gi, 0)
            case StringType => UTF8String.fromString(cur.getString(gi, 0))
            case other => throw new UnsupportedOperationException(other.toString)
          }
        i += 1
      }
      new GenericInternalRow(values)
    }

  override def close(): Unit = reader.close()
}
