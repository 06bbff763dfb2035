package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 census source — the production form of the reference's
  * table scan (SURVEY.md §3.3, §7.2 phase 8).
  *
  * The reference's scan is an HTTP GET whose request already carries the
  * projection (`get=` column list) and the geography predicate
  * (`for`/`in`), returning a JSON array-of-arrays whose row 0 is the
  * schema and rows 1..n are all-string data
  * (`/root/reference/Test_census_tract.py:143-176`; ZCTA variant
  * `test_final_zcta.py:84-108`). This source expresses that exact
  * contract through the DSv2 pushdown interfaces:
  *
  *  - `SupportsPushDownRequiredColumns` — Catalyst's column pruning
  *    reaches `readSchema()`, the engine-side form of the `get=` list
  *    (reference R2);
  *  - `SupportsPushDownFilters` — equality/IN predicates on the `state`
  *    column are absorbed by the scan, the engine-side form of
  *    `in=state:XX` (reference R1), and PRUNE PARTITIONS at planning;
  *  - partitions are the reference's (dataset × state-chunk) splits:
  *    one `InputPartition` per 3-state chunk of the census state domain
  *    (`chunk_list(states, 3)`, `Test_census_tract.py:329-331`) — 51
  *    FIPS codes → 17 partitions, each independently fetchable/retryable
  *    exactly like the reference's per-chunk GET (Spark task retry
  *    subsumes its tenacity loop, SURVEY §4.1).
  *
  * The data behind a partition is a local JSON array-of-arrays fixture
  * (option `path`) in the reference's wire format; a real deployment
  * would issue the HTTP GET inside `PartitionReader` instead — the
  * planning, pushdown, and partitioning contract is identical (the
  * fixture file must be executor-visible, like the sink roots).
  *
  * Reference schema semantics carried over:
  *  - all cells `StringType`, nullable (§1.2 — the API returns quoted
  *    strings even for counts);
  *  - option `expect` = the `all_vars` list: expected columns come
  *    first in declared order, file-only extras are appended (R6,
  *    `Test_census_tract.py:174-175`), expected-but-absent columns are
  *    NULL-filled (R5, `:171-172`), duplicates dropped keeping first
  *    (R18, `:155-156`).
  */
class CensusSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CensusSource.schemaFor(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new CensusTable(schema, properties.get("path"),
      FetchPolicy.fromProperties(properties))

  override def supportsExternalMetadata(): Boolean = true
}

/** Reference R14/R15 fetch-operational options (see [[Retry]]): retry
  * attempts/backoff around each partition read and a per-partition
  * pre-fetch throttle — `maxAttempts` (default 5 =
  * tenacity `stop_after_attempt(5)`), `retryBaseWaitMs`,
  * `retryMaxWaitMs` (default 60 s = the reference's backoff cap),
  * `throttleMs` (the reference sleeps 10 s per chunk; default 0 for
  * local files). */
case class FetchPolicy(maxAttempts: Int, baseWaitMs: Long,
    maxWaitMs: Long, throttleMs: Long)

object FetchPolicy {
  val Default: FetchPolicy = FetchPolicy(5, 1000L, 60000L, 0L)

  def fromProperties(properties: JMap[String, String]): FetchPolicy = {
    val p = properties.asScala.map { case (k, v) => k.toLowerCase -> v }
    FetchPolicy(
      p.get("maxattempts").map(_.toInt).getOrElse(Default.maxAttempts),
      p.get("retrybasewaitms").map(_.toLong).getOrElse(Default.baseWaitMs),
      p.get("retrymaxwaitms").map(_.toLong).getOrElse(Default.maxWaitMs),
      p.get("throttlems").map(_.toLong).getOrElse(Default.throttleMs))
  }
}

object CensusSource {
  /** The census state-FIPS domain (reference R11): 01..56 minus the
    * unassigned codes, zero-padded. */
  def stateFips: Seq[String] =
    (1 to 56).filterNot(graft.census.Mapping.unassignedFips)
      .map(i => f"$i%02d")

  /** The reference's 3-state chunking (`chunk_list(states, 3)`). */
  def stateChunks: Seq[Seq[String]] = stateFips.grouped(3).toSeq

  private[sources] def readArrays(path: String): Vector[Vector[String]] = {
    val root = new ObjectMapper().readTree(new java.io.File(path))
    root.elements().asScala.map { row =>
      row.elements().asScala
        .map(c => if (c.isNull) null else c.asText()).toVector
    }.toVector
  }

  private[sources] def header(path: String): Vector[String] =
    readArrays(path).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"census fixture $path has no header row"))

  /** Expected-first, extras-appended, first-occurrence-deduped column
    * order (R5/R6/R18). */
  private[sources] def columnOrder(expect: Seq[String],
      fileHeader: Seq[String]): Seq[String] =
    (expect ++ fileHeader.filterNot(expect.contains)).distinct

  def schemaFor(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("census source requires a 'path' option"))
    val expect = Option(options.get("expect")).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    StructType(columnOrder(expect, header(path))
      .map(StructField(_, StringType, nullable = true)))
  }
}

class CensusTable(tableSchema: StructType, path: String, policy: FetchPolicy)
    extends Table with SupportsRead {
  override def name(): String = s"census($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CensusScanBuilder(tableSchema, path, policy)
}

class CensusScanBuilder(fullSchema: StructType, path: String, policy: FetchPolicy)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Absorb geo predicates on `state` (the reference's `in=state:XX`);
    * everything else stays a Spark-side residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case EqualTo("state", _: String) => true
      case In("state", _) => true
      case IsNotNull("state") => true
      case _ => false
    }
    pushed = ok
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new CensusScan(required, pushed, path, policy)
}

/** One 3-state chunk of the fixture (the reference's per-chunk GET). */
case class CensusPartition(states: Seq[String]) extends InputPartition

class CensusScan(required: StructType, pushed: Array[Filter], path: String,
    policy: FetchPolicy = FetchPolicy.Default)
    extends Scan with Batch {

  /** States allowed by the pushed geo predicates (None = all). */
  private val wantedStates: Option[Set[String]] = {
    val sets = pushed.collect {
      case EqualTo("state", v: String) => Set(v)
      case In("state", vs) => vs.collect { case s: String => s }.toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Partition pruning: a chunk whose states are all excluded by the
    * pushed predicate is never planned — the reference simply does not
    * issue that GET. Rows whose state lies outside the census domain
    * belong to no chunk (the reference never requests them). A fixture
    * without a `state` column (the single-call ZCTA shape,
    * `test_final_zcta.py:193`) is one unchunked partition. */
  override def planInputPartitions(): Array[InputPartition] =
    if (!CensusSource.header(path).contains("state"))
      Array(CensusPartition(Seq.empty))
    else
      CensusSource.stateChunks
        .filter(ch => wantedStates.forall(w => ch.exists(w.contains)))
        .map(CensusPartition(_): InputPartition)
        .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new CensusReaderFactory(path, required.fieldNames.toSeq,
      wantedStates, pushed.exists {
        case IsNotNull("state") => true
        case _ => false
      }, policy)

  override def description(): String =
    s"CensusScan path=$path, PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.simpleString}"
}

class CensusReaderFactory(path: String, requiredCols: Seq[String],
    wantedStates: Option[Set[String]], stateNotNull: Boolean,
    policy: FetchPolicy)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val states = partition.asInstanceOf[CensusPartition].states.toSet
    new CensusPartitionReader(path, requiredCols, states, wantedStates,
      stateNotNull, policy)
  }
}

/** Reads the fixture's data rows for one state chunk, applying the
  * pushed geo predicate, NULL-filling expected-but-absent columns (R5)
  * and projecting to the pruned schema. The read honors the R14/R15
  * fetch policy: throttle before the fetch, retry with capped
  * exponential backoff around it. A production variant performs the
  * chunk's HTTP GET here instead of the file read — same policy, same
  * partition contract. */
class CensusPartitionReader(path: String, requiredCols: Seq[String],
    chunkStates: Set[String], wantedStates: Option[Set[String]],
    stateNotNull: Boolean, policy: FetchPolicy)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    if (policy.throttleMs > 0) Thread.sleep(policy.throttleMs)
    val all = Retry.withBackoff(policy.maxAttempts, policy.baseWaitMs,
      policy.maxWaitMs)(CensusSource.readArrays(path))
    val fileHeader = all.head
    val colIdx = fileHeader.zipWithIndex.toMap // first occurrence wins (R18)
    val stateIdx = colIdx.get("state")
    val reqIdx: Seq[Option[Int]] = requiredCols.map(colIdx.get)
    all.iterator.drop(1)
      .filter { r =>
        stateIdx match {
          // no geo column: state is NULL-filled, so any pushed state
          // predicate (equality/IN/IsNotNull) matches nothing
          case None => wantedStates.isEmpty && !stateNotNull
          case Some(i) =>
            val s = r(i)
            s != null &&
              (chunkStates.isEmpty || chunkStates.contains(s)) &&
              wantedStates.forall(_.contains(s))
        }
      }
      .map { r =>
        InternalRow.fromSeq(reqIdx.map {
          case Some(i) if i < r.length && r(i) != null => UTF8String.fromString(r(i))
          case _ => null // expected-but-absent column: NULL fill (R5)
        })
      }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
