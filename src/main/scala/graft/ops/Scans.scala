package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import Util._

/** Category A — scans / sources / sinks (SURVEY.md §2.2 A1-A3).
  *
  * Mirrors the reference's scan→project contract: the Census API request
  * carries the projection list and geo predicate
  * (`Test_census_tract.py:161-164`) — here Catalyst pushes the same
  * projection/filter into the parquet scan (check `.explain`:
  * `PushedFilters`, pruned `ReadSchema`).
  */
object Scans {

  /** Session-lifetime scratch root for sink round-trips — recursively
    * deleted on JVM exit so repeated bench/verify runs don't accumulate
    * tmp garbage (round-4 review finding). */
  private lazy val tmpSinkRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_sinks_")
    sys.addShutdownHook {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del))
        f.delete(): Unit
      }
      del(p.toFile)
    }
    p
  }

  /** Sink output root: `spark.graft.sinkRoot` conf, else the
    * `GRAFT_SINK_ROOT` env var, else the local temp dir. On a real
    * cluster the driver-local temp dir is invisible to executors, so
    * cluster deployments MUST set one of the overrides to a shared-FS
    * path (s3a://…, hdfs://…) — round-4 verdict (c). Locally the temp
    * default keeps verify/bench runs self-cleaning. */
  private def sinkRoot(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.sinkRoot")
      .orElse(sys.env.get("GRAFT_SINK_ROOT"))
      .getOrElse(tmpSinkRoot.toString)

  /** Unique per-invocation sink path: concurrent runs must not clobber
    * each other's output (round-3 advice). Package-private so sibling
    * op families with a sink leg (D25 sketch cube) share the root
    * discipline instead of growing their own. */
  private[ops] def freshSinkDir(spark: SparkSession, prefix: String): String =
    s"${sinkRoot(spark)}/$prefix${java.util.UUID.randomUUID().toString}"

  /** A1: projection-only scan of lineitem — parquet reads exactly 4 columns. */
  def scanProject(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixture data —
      // order by every output column for a value-deterministic result
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))

  /** A2: filter + narrow projection — predicate pushdown + column pruning
    * reach the parquet scan (row-group stats skip at scale). */
  def scanPruneFilter(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_odate"))
      .orderBy(col("o_orderkey"))

  /** A3: CSV sink round-trip — reference R20/R22 semantics (headered CSV,
    * empty string ↔ NULL at the COPY boundary). Writes `region` as CSV,
    * reads it back with an explicit all-typed schema, proves losslessness
    * against a plain oracle scan of the original table. */
  def sinkRoundtripCsv(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "csv_roundtrip_")
    t(spark, sfDir, "region")
      .write.mode("overwrite")
      .option("header", "true").option("nullValue", "\\N")
      .csv(out)
    val schema = StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType)))
    spark.read
      .option("header", "true").option("nullValue", "\\N")
      .schema(schema).csv(out)
      .orderBy(col("r_regionkey"))
  }

  /** A12: JSON-lines sink round-trip — the interchange format of the
    * reference's API world (R16: the census payload itself is JSON,
    * `Test_census_tract.py:117-120`). A typed slice of `customer`
    * writes as JSON lines and reads back under an EXPLICIT schema
    * (schemaless JSON reads infer and stringly-type); the oracle scans
    * the ORIGINAL table, so any serialize/parse drift — double
    * round-trip included — fails the hash. */
  def sinkRoundtripJson(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "json_roundtrip_")
    t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"),
        col("c_acctbal").cast("double").as("c_bal"))
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_bal", DoubleType)))
    spark.read.schema(schema).json(out)
      .orderBy(col("c_custkey"), col("c_name"), col("c_bal"))
  }

  /** A14: XML sink round-trip — the hierarchical-interchange format
    * (Spark 4's built-in `xml` source, the donated spark-xml): the
    * nation table writes as one `<nation>` row element per record and
    * reads back under an EXPLICIT schema (schemaless XML infers and
    * stringly-types exactly like JSON). Entity escaping round-trips
    * through the writer/reader pair; the oracle scans the ORIGINAL
    * table, so any serialize/parse drift fails the hash. */
  def sinkRoundtripXml(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "xml_roundtrip_")
    t(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("overwrite").format("xml")
      .option("rowTag", "nation").option("rootTag", "nations")
      .save(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    spark.read.format("xml")
      .option("rowTag", "nation").schema(schema).load(out)
      .orderBy(col("n_nationkey"))
  }

  /** A13: DSv2 manifest-committed sink round-trip — the WRITE rung of
    * the DSv2 ladder beside the [[graft.sources.CensusSource]] read
    * rung: a typed orders slice writes through
    * [[graft.sources.AuditSink]] (full `BatchWrite` commit protocol —
    * task-staged files, driver-published manifest, the reference's
    * stage-then-COPY discipline), and the read-back trusts ONLY the
    * manifest-listed files, so an uncommitted or aborted task file can
    * never leak into the result. Oracle scans the ORIGINAL table. */
  def sinkDsv2Audit(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "dsv2_audit_")
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast("double").as("o_price"))
      .write.format("graft.sources.AuditSink").mode("overwrite")
      .option("path", out).save()
    val files = graft.sources.AuditSink.committedFiles(spark, out)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderpriority", StringType),
      StructField("o_price", DoubleType)))
    spark.read.schema(schema)
      .option("quote", "\"").option("escape", "\"")
      .csv(files: _*)
      .orderBy(col("o_orderkey"), col("o_orderpriority"), col("o_price"))
  }

  /** A7: ORC sink round-trip — the second columnar format beside
    * parquet (the reference's warehouse world is format-plural: CSV
    * staging, columnar at rest — `images/dp02_metadata.png` shows
    * lzo/az64 encodings). A typed slice of `orders` (bigint, string,
    * double, date) writes as ORC and reads back; the oracle scans the
    * ORIGINAL table, so any encode/decode drift fails the hash. */
  def sinkRoundtripOrc(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "orc_roundtrip_")
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate").cast("date").as("o_odate"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out).orderBy(col("o_orderkey"))
  }

  /** A15: codec-explicit parquet roundtrip — zstd compression and a
    * sort-within-partitions layout, the write shape a 100-TB lakehouse
    * table actually uses (zstd ≈ gzip ratios at snappy-class speed;
    * the per-file sort tightens min/max column stats so downstream
    * scans skip row groups). Values must survive the codec bit-exact:
    * the oracle scans the ORIGINAL table. */
  def sinkRoundtripParquetZstd(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "pq_zstd_roundtrip_")
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate").cast("date").as("o_odate"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.mode("overwrite")
      .option("compression", "zstd")
      .parquet(out)
    spark.read.parquet(out).orderBy(col("o_orderkey"))
  }

  /** A5: the DSv2 census scan (reference R1/R2 — SURVEY §3.3): reads
    * the API-shaped JSON array-of-arrays fixture through
    * [[graft.sources.CensusSource]]. The `isin` geo predicate pushes
    * into the scan (`in=state:XX`) and prunes state-chunk partitions
    * at planning; the 4-column select prunes the read schema (`get=`).
    * Pushdown is asserted in `PlanAuditSpec`; source semantics
    * (NULL-fill, column order, chunking) in `CensusSourceSpec`. */
  def scanCensusDsv2(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft.sources.CensusSource")
      .option("path", graft.sources.CensusFixture.path)
      .option("expect", graft.sources.CensusFixture.Expect.mkString(","))
      .load()
      .filter(col("state").isin("06", "36", "48"))
      .select(col("NAME"), col("DP02_0001E"), col("state"), col("tract"))
      .orderBy(col("state"), col("tract"))

  /** A26: DSv2 AGGREGATE pushdown — `COUNT(*) GROUP BY state` answered
    * COMPLETELY inside the census source
    * (`SupportsPushDownAggregates`): the chunk partitioning is BY
    * state, so per-partition final counts are globally final and
    * Spark plans NO aggregate node at all — the scan's output IS the
    * result (pinned in `CensusSourceSpec`, alongside the fallback:
    * an unsupported grouping declines the pushdown and plans
    * normally). For the reference's real API this is the difference
    * between downloading every tract row to count them and shipping
    * back one tally per state — at 100 TB, aggregate pushdown into
    * the source is the biggest single IO lever after column pruning
    * and partition pruning (A5 covers those two). */
  def scanCensusAggPushdown(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft.sources.CensusSource")
      .option("path", graft.sources.CensusFixture.path)
      .option("expect", graft.sources.CensusFixture.Expect.mkString(","))
      .load()
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n_tracts"))
      .orderBy(col("state").asc_nulls_first)

  /** A27: DSv2 TopN pushdown (`SupportsPushDownTopN`) — `ORDER BY
    * state, tract LIMIT 10` pushed into the census source: each
    * chunk partition sorts locally and returns only its top-10, so
    * at most partitions×10 rows cross the scan boundary instead of
    * the whole relation; Spark's TakeOrdered merges the partial
    * tops (the pushdown is declared PARTIAL — per-partition locals,
    * globally merged). The paging movement every API-backed source
    * needs: "first page of the catalog" must not download the
    * catalog. Plan + bound pinned in `CensusSourceSpec` beside the
    * plain-LIMIT variant. */
  def scanCensusTopnPushdown(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.format("graft.sources.CensusSource")
      .option("path", graft.sources.CensusFixture.path)
      .option("expect", graft.sources.CensusFixture.Expect.mkString(","))
      .load()
      .select(col("state"), col("tract"), col("NAME"))
      .orderBy(col("state"), col("tract"))
      .limit(10)

  /** A28: DSv2 RUNTIME filtering (`SupportsRuntimeV2Filtering`) — the
    * v2-source form of dynamic partition pruning, completing the
    * pushdown matrix (columns A5, filters A5, aggregates A26,
    * TopN/limit A27, runtime keys HERE): the census table joins a
    * parquet-backed region dimension on `state`, the selective
    * predicate lives on the DIM (`d_active`), and Spark evaluates the
    * dim FIRST, calling the scan's `filter()` with the surviving
    * state keys BEFORE partitions are planned — chunks containing no
    * matching state are never planned, and for the real API those
    * GETs are never issued. Pruning is PARTITION-granular (the same
    * directory-level granularity file-source DPP gives): the matched
    * states' chunk-mates still flow and the join absorbs them.
    * `CensusSourceSpec` pins the proof via the scan's numOutputRows:
    * exactly the 2 pruned chunks' rows, not the table's 102. */
  def scanCensusRuntimeFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dimPath = freshSinkDir(spark, "census_dim_")
    // the dim predicate must be EQUALITY-SHAPED: a bare boolean
    // attribute is not "likely selective" to the pruning rule and
    // silently disables DPP (the r12 AqeSpec finding, re-confirmed
    // here for the v2 path)
    Seq(("06", "west", "yes"), ("36", "east", "yes"), ("48", "south", "no"))
      .toDF("d_state", "d_region", "d_active")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("d_active") === "yes")
    val census = spark.read.format("graft.sources.CensusSource")
      .option("path", graft.sources.CensusFixture.path)
      .option("expect", graft.sources.CensusFixture.Expect.mkString(","))
      .load()
    census.join(dim, census("state") === dim("d_state"))
      .groupBy(col("state"), col("d_region"))
      .agg(count(lit(1)).as("n_tracts"))
      .orderBy(col("state"))
  }

  /** A29: WRITE-AUDIT-PUBLISH — the production load discipline tying
    * the store (A18) to the expectations battery (A24): a batch lands
    * on a STAGING manifest (readers oblivious), quality gates run
    * against the staged VIEW, and only a passing batch publishes —
    * one atomic manifest rename, zero data movement; a failing batch
    * is discarded without ever having been visible. The movement
    * Iceberg's WAP / Delta's staging tables run on every serious
    * pipeline: at 100 TB you cannot un-publish a bad batch that
    * readers already joined against — the audit must happen BEFORE
    * visibility. Sequence: v1 baseline; a CORRUPT batch (balances
    * forced below the −1000 floor) stages, the audit counts its
    * violations, REJECTED + discarded; the clean batch stages, audit
    * passes, publishes as v2. Output: the audited numbers of both
    * stagings plus the published table — which must equal the clean
    * staged view exactly (the oracle proves the bad batch never
    * leaked). `SnapshotStoreSpec` pins the invisibility/atomicity
    * laws. */
  def warehouseWap(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "wap_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 10 === 0))
    val batch = cust.filter(col("c_custkey") % 10 === 5)
    def audited(phase: String, staged: DataFrame): DataFrame =
      staged.agg(count(lit(1)).as("n_rows"),
        sum(cents(col("c_acctbal"))).as("cents_sum"),
        sum(when(col("c_acctbal") < -1000.0d, 1L).otherwise(0L))
          .as("n_violations"))
        .select(lit(phase).as("phase"), col("n_rows"), col("cents_sum"),
          col("n_violations"))
    // corrupt batch: every balance forced below the domain floor
    val id1 = SnapshotStore.stageAppend(spark, root, batch
      .withColumn("c_acctbal", -abs(col("c_acctbal")) - 2000.0d))
    // the audit MUST complete (eager checkpoint of its 1-row result)
    // before the discard deletes the staged data — the same ordering
    // a production gate observes; a lazy audit over discarded files
    // is a FILE_NOT_EXIST at execution time
    val audit1 = audited("audit_1_rejected",
      SnapshotStore.readStaged(spark, root, id1)).localCheckpoint(true)
    SnapshotStore.discardStaged(spark, root, id1)
    val id2 = SnapshotStore.stageAppend(spark, root, batch)
    val audit2 = audited("audit_2_passed",
      SnapshotStore.readStaged(spark, root, id2))
    SnapshotStore.publishStaged(spark, root, id2)
    audit1.unionAll(audit2)
      .unionAll(audited("published", SnapshotStore.read(spark, root)))
      .orderBy(col("phase"))
  }

  /** A4: the reference's audit-log sink (R16/R17,
    * `Test_census_tract.py:63-104`): keep only `x-ratelimit*` headers
    * via map_filter, serialize to JSON, append to the log, read back.
    * Append mode (never overwrite) is the R17 semantics; the path is
    * unique per invocation so concurrent runs don't interleave. */
  def sinkAppendAuditLog(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "audit_log_")
    t(spark, sfDir, "events")
      .select(col("event_id"),
        to_json(map_filter(
          map(lit("x-ratelimit-remaining"), col("event_id").cast("string"),
            lit("content-type"), lit("json")),
          (k, _) => k.startsWith("x-ratelimit"))).as("audit"))
      .write.mode("append").json(out)
    spark.read
      .schema(StructType(Seq(
        StructField("event_id", org.apache.spark.sql.types.LongType),
        StructField("audit", StringType))))
      .json(out)
      .orderBy(col("event_id"))
  }

  /** A11: corrupt-tolerant ingest — the PERMISSIVE-mode contract for
    * messy feeds (the reference's world is hand-maintained CSV/JSON
    * exports): region rows serialize to JSON, three deterministically
    * malformed lines are appended, and the read-back maps bad lines to
    * `_corrupt_record` instead of failing the job (one poison line
    * must not kill a 100-TB load). Output: good/corrupt line counts
    * plus an exact value checksum of the good rows — the oracle
    * derives all three from the original table (+ the constant 3). */
  def scanCorruptTolerant(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "corrupt_json_")
    t(spark, sfDir, "region").write.mode("overwrite").json(out)
    // three malformed lines: truncated object, bare text, wrong bracket
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "part-corrupt.json"),
      java.util.Arrays.asList(
        """{"r_regionkey": 99, "r_name": "TRUNCATED""",
        """not json at all""",
        """["also", "not", "an", "object"]"""),
      java.nio.charset.StandardCharsets.UTF_8)
    val schema = StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType),
      StructField("_corrupt_record", StringType)))
    val read = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(out)
    read.agg(
      sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
      sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
      sum(when(col("_corrupt_record").isNull, col("r_regionkey"))
        .otherwise(0L)).cast("long").as("key_checksum"))
  }

  /** A10: schema evolution across file batches — the file-level
    * analogue of the census pipeline's union-by-name (R5/R10): batch 1
    * writes (c_custkey, c_name), batch 2 adds c_acctbal with re-keyed
    * ids; `mergeSchema` reads both generations as one relation with
    * the missing column NULL-filled. At 100 TB this is the everyday
    * reality of a long-lived table root: old files never rewrite when
    * the schema grows. The oracle rebuilds the same union with an
    * explicit CAST(NULL AS DOUBLE) leg. */
  def scanSchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "schema_evo_")
    val customer = t(spark, sfDir, "customer")
    customer.select(col("c_custkey"), col("c_name"))
      .write.mode("overwrite").parquet(s"$out/gen1")
    customer.select((col("c_custkey") + 1000000L).as("c_custkey"),
        col("c_name"), col("c_acctbal"))
      .write.mode("overwrite").parquet(s"$out/gen2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$out/gen1", s"$out/gen2")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** A8: hive-partitioned layout + partition pruning — the 100-TB
    * first line of defense. Orders write out hive-partitioned by
    * order year (`.../o_year=1997/part-*.parquet`); the read-back
    * filters on the partition column, so Spark's partition pruning
    * plans ONLY the matching directory — the other years' files are
    * never opened (pinned in `PlanAuditSpec`: one selected partition,
    * no data filter needed). The oracle computes the same aggregate
    * from the unpartitioned original, so a row leaking in from an
    * unpruned partition fails the hash. */
  def sinkPartitionedPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "part_prune_")
    t(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    spark.read.parquet(out)
      .filter(col("o_year") === 1997)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        decSumDbl(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** A35: DYNAMIC partition overwrite — the warehouse reload mode that
    * replaces ONLY the partitions the incoming batch touches and
    * leaves every other partition untouched (Hive/Spark
    * `partitionOverwriteMode=dynamic`; the default STATIC mode would
    * truncate the whole table first — the classic accidental-data-loss
    * reload). Here the 1997 partition is re-landed with revised
    * amounts (doubled — exact in IEEE, a power-of-two scale) while
    * 1995/1996/1998… survive from the first write; the oracle pins
    * exactly that merge semantics (non-touched years original, 1997
    * revised). At 100 TB this is THE idempotent daily-reload shape:
    * the rewrite cost is proportional to the touched partitions, not
    * the table, and the job can re-run safely. */
  def sinkDynamicOverwrite(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "dyn_ovr_")
    val base = t(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    base.write.mode("overwrite").partitionBy("o_year").parquet(out)
    val revised = base.filter(col("o_year") === 1997)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try revised.write.mode("overwrite").partitionBy("o_year").parquet(out)
    finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
    spark.read.parquet(out)
      .groupBy(col("o_year").cast("bigint").as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        decSumDbl(col("o_totalprice")).as("total_price"))
      .orderBy(col("yr"))
  }

  /** A37: multi-path scoped read with `basePath` — how a backfill
    * bounds its IO: instead of scanning the table root and filtering
    * (which still LISTS every partition), the job names exactly the
    * partition directories it owns (`spark.read.option("basePath",
    * root).parquet(dir1996, dir1997)`) — listing AND scan cost are
    * proportional to the named paths, and `basePath` recovers the
    * partition column from the directory names so downstream logic is
    * identical to a root read. The oracle computes the same result by
    * filtering the base table: path scoping must be value-transparent
    * — a row leaking from an unnamed partition fails the hash. */
  def scanGlobPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "glob_paths_")
    t(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    spark.read.option("basePath", out)
      .parquet(s"$out/o_year=1996", s"$out/o_year=1997")
      .groupBy(col("o_year").cast("bigint").as("yr"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        decSumDbl(col("o_totalprice")).as("total_price"))
      .orderBy(col("yr"), col("o_orderpriority"))
  }

  /** A24: declarative data-quality EXPECTATIONS in one pass — the
    * Delta-Live-Tables/Great-Expectations movement: every load
    * declares its invariants (not-null, value range, domain pattern,
    * key uniqueness) and the engine reports violation counts from the
    * SAME aggregation, never one filtered scan per rule (k rules as k
    * scans is k× the IO at 100 TB — the A21 rationale as a rule
    * battery). Violations are SYNTHESIZED deterministically (the
    * fixture is clean): NULL status every 97th key, negated price
    * every 89th, malformed priority every 83rd, every 101st row
    * re-sent (duplicate key). One row out: each rule's violation
    * count plus a thresholded verdict (<2% nulls), all computed
    * exactly; uniqueness = COUNT(*) − COUNT(DISTINCT key) rides the
    * same pass. */
  def scanExpectations(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty = t(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 97 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderstatus")).as("st"),
        when(col("o_orderkey") % 89 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")).as("tp"),
        when(col("o_orderkey") % 83 === 0, lit("9-BOGUS"))
          .otherwise(col("o_orderpriority")).as("pr"))
    val d2 = dirty.unionAll(dirty.filter(col("o_orderkey") % 101 === 0))
    d2.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("st").isNull, 1L).otherwise(0L)).as("n_null_status"),
      sum(when(col("tp") < 0 || col("tp") > 1000000, 1L).otherwise(0L))
        .as("n_price_oob"),
      sum(when(!col("pr").rlike("^[1-5]-"), 1L).otherwise(0L))
        .as("n_bad_priority"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_dup_keys"))
      .withColumn("status_ok",
        col("n_null_status") * 50 < col("n_rows"))
  }

  /** A25: snapshot OPTIMIZE — compaction + sort-order rewrite AS A
    * COMMIT: four commits accrete the small-file layout every
    * streaming/CDC load produces (v1 overwrite + three appends, one
    * file each — the J9/J15 accretion shape), then OPTIMIZE reads the
    * latest snapshot and republishes it compacted (2 files,
    * sorted-within-partitions on the key so zone maps tighten — the
    * A15 rationale) as version 5. The movement the public
    * `OPTIMIZE` / `rewrite_data_files` commands run: content is
    * BIT-IDENTICAL (the oracle proves v5 ≡ v4), only the file layout
    * changes, and history stays time-travelable — v1..v4 still read
    * exactly (F9 plans this compaction; this op commits it through
    * the store). File counts come from `_metadata` (A23) and are
    * deterministic by construction: 1, 2, 3, 4, then 2. */
  def snapshotOptimize(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "snapshot_opt_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    def slice(m: Int) = cust.filter(col("c_custkey") % 10 === m)
      .repartition(1)
    SnapshotStore.commitOverwrite(spark, root, slice(0))
    SnapshotStore.commitAppend(spark, root, slice(5))
    SnapshotStore.commitAppend(spark, root, slice(7))
    SnapshotStore.commitAppend(spark, root, slice(3))
    SnapshotStore.commitOverwrite(spark, root,
      SnapshotStore.read(spark, root)
        .repartition(2).sortWithinPartitions(col("c_custkey")))
    (1 to 5).map { v =>
      SnapshotStore.read(spark, root, asOf = Some(v))
        .select(col("c_acctbal"), col("_metadata.file_name").as("fname"))
        .agg(count(lit(1)).as("n_rows"),
          sum(cents(col("c_acctbal"))).as("cents_sum"),
          countDistinct(col("fname")).as("n_files"))
        .select(lit(v).as("version"), col("n_rows"), col("cents_sum"),
          col("n_files"))
    }.reduce(_.unionAll(_)).orderBy(col("version"))
  }

  /** A39: OPTIMIZE … ZORDER as a SnapshotStore commit — the layout
    * rewrite that makes F10's zone-map arithmetic REAL at the store
    * layer: four append-era commits each span the whole customer-key
    * range (every band read must open every dir — the accumulated-
    * appends state A25 compacts by size, this re-CLUSTERS by value),
    * then `commitOverwriteClustered` rewrites the content into 8
    * range-clustered dirs on the (custkey, price) Morton key with
    * per-dir zone maps on `o_custkey`. The registered result is a
    * key-band aggregate read through `readPruned` — value-transparent
    * by construction (pruning only drops dirs that cannot match), so
    * the oracle recomputes it from raw orders; the pruning WIN
    * (dirsOpened < dirsTotal) is pinned in `SnapshotStoreSpec`, not
    * here, because sampled range boundaries are not oracle-stable. */
  def warehouseZorderRewrite(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "zorder_rw_")
    // one fact scan feeds all four append slices
    val o = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_cents"))
      .localCheckpoint(true)
    def slice(m: Int) = o.filter(col("o_orderkey") % 4 === m).repartition(1)
    SnapshotStore.commitOverwrite(spark, root, slice(0),
      statsCol = Some("o_custkey"))
    (1 to 3).foreach(m => SnapshotStore.commitAppend(spark, root, slice(m),
      statsCol = Some("o_custkey")))
    SnapshotStore.commitOverwriteClustered(spark, root,
      graft.ops.Layout.mortonKey(col("o_custkey").cast("long"),
        col("price_cents").cast("long")),
      statsCol = "o_custkey", bins = 8)
    val band = SnapshotStore.readPruned(spark, root, "o_custkey", 10L, 60L)
    band.df.filter(col("o_custkey").between(10, 60))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price_cents")).as("cents_sum"),
        countDistinct(col("o_custkey")).as("n_cust"))
  }

  /** A44: MULTI-KEY zone-map pruning after a two-key ZORDER rewrite —
    * the round-17 verdict's "prune on either key" ask. A39 proved the
    * clustered-rewrite mechanics but recorded stats on ONE column, so
    * a predicate on the second Morton key could never skip a file;
    * here `commitOverwriteClustered` records per-dir [min,max] for
    * BOTH interleaved keys (one groupBy job for all dirs × columns —
    * the manifest line grows by one tab-triple per column), and the
    * registered result reads a band on EACH key through `readPruned`.
    * Value-transparent by construction (pruning only drops dirs that
    * cannot match; the exact predicate still applies), so the oracle
    * recomputes both bands from raw orders; the pruning WIN on each
    * key (dirsOpened < dirsTotal) is pinned in `SnapshotStoreSpec`
    * because sampled range boundaries are not oracle-stable.
    *
    * Scale shape: this is the 100-TB point of z-ordering — ONE layout
    * serves selective predicates on k dimensions with file-skip
    * effectiveness ~ bins^(1/k) per dimension; stats collection stays
    * one metadata-cardinality aggregate. */
  def warehouseZorderPrune(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "zorder_prune_")
    val o = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_cents"))
      .localCheckpoint(true)
    def slice(m: Int) = o.filter(col("o_orderkey") % 4 === m).repartition(1)
    SnapshotStore.commitOverwrite(spark, root, slice(0))
    (1 to 3).foreach(m => SnapshotStore.commitAppend(spark, root, slice(m)))
    SnapshotStore.commitOverwriteClustered(spark, root,
      graft.ops.Layout.mortonKey(col("o_custkey").cast("long"),
        col("price_cents").cast("long")),
      statsCols = Seq("o_custkey", "price_cents"), bins = 8)
    def band(name: String, pr: SnapshotStore.PrunedRead,
        pred: org.apache.spark.sql.Column): DataFrame =
      pr.df.filter(pred)
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price_cents")).as("cents_sum"),
          countDistinct(col("o_custkey")).as("n_cust"))
        .select(lit(name).as("band"), col("n_orders"), col("cents_sum"),
          col("n_cust"))
    val byCust = band("custkey_10_60",
      SnapshotStore.readPruned(spark, root, "o_custkey", 10L, 60L),
      col("o_custkey").between(10, 60))
    val byPrice = band("price_1m_5m_cents",
      SnapshotStore.readPruned(spark, root, "price_cents",
        1000000L, 5000000L),
      col("price_cents").between(1000000L, 5000000L))
    byCust.unionAll(byPrice).orderBy(col("band"))
  }

  /** A47: COMMIT HISTORY as a first-class relation (r18) — Iceberg's
    * `table$history` / Delta's `DESCRIBE HISTORY` over the snapshot
    * store: the A18 three-commit lineage plus an equality-delete
    * commit, then ONE frame joining each version's manifest
    * composition ([[graft.sources.SnapshotStore.history]] — data
    * segments, outstanding delete vectors; metadata-cardinality,
    * never a data read) with its row count and exact-cents balance.
    * The operator's read of every historical version is the audit
    * posture ("what did each commit do to the table"); at 100 TB the
    * history frame itself costs O(versions) manifest lines — the
    * per-version counts here are the verification layer the oracle
    * rebuilds from raw customer. */
  def warehouseHistory(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "snapshot_history_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 10 === 0))
    SnapshotStore.commitAppend(spark, root,
      cust.filter(col("c_custkey") % 10 === 5))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 1000.0d).as("c_acctbal")))
    SnapshotStore.commitDelete(spark, root, "c_custkey",
      col("c_custkey") % 200 === 0)
    val counts = (1 to 4).map { v =>
      SnapshotStore.read(spark, root, asOf = Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(cents(col("c_acctbal"))).as("bal_cents"))
        .select(lit(v).as("version"), col("n_rows"), col("bal_cents"))
    }.reduce(_.union(_))
    SnapshotStore.history(spark, root)
      .join(counts, Seq("version"))
      .orderBy(col("version"))
  }

  /** A46: PARTITION-SPEC / STATS EVOLUTION (r18) — the Iceberg
    * partition-evolution contract re-expressed on the snapshot store:
    * early commits record zone maps on the ORIGINAL layout key
    * (`o_orderkey` ranges — the "partitioned by order id" era), a
    * later append records stats on a NEW key (`o_custkey`) without
    * rewriting anything that came before. The read path needs no
    * spec registry: pruning is per-SEGMENT against whatever column
    * that segment recorded — an old-key predicate still skips
    * old-era dirs after the evolution, a new-key predicate skips
    * new-era dirs, and a segment with no stats for the queried
    * column is ALWAYS opened (soundness — the same law A44 pins).
    * That is exactly how a 100 TB table survives a partition-spec
    * change: no rewrite wave, no flag day, old data prunes by the
    * old spec and new data by the new one. The checked output is
    * value-transparent (band aggregates the oracle recomputes from
    * raw orders); the dirs-opened arithmetic is pinned in
    * `SnapshotStoreSpec`. */
  def warehousePartitionEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "part_evolution_")
    val o = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_cents"))
      .localCheckpoint(true)
    // one aggregate action sizes the era splits — a single
    // map-side-combined MAX pass whose driver result is one long (in
    // production the split points come from the table's own metadata,
    // not a scan; here the checkpointed frame makes the pass cheap)
    val k = o.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
    // era 1 (original spec): two orderkey-range segments, stats on
    // the ORIGINAL key
    SnapshotStore.commitOverwrite(spark, root,
      o.filter(col("o_orderkey") < k / 3).repartition(1),
      statsCols = Seq("o_orderkey"))
    SnapshotStore.commitAppend(spark, root,
      o.filter(col("o_orderkey") >= k / 3 && col("o_orderkey") < 2 * k / 3)
        .repartition(1),
      statsCols = Seq("o_orderkey"))
    // evolution: the new era records stats on the NEW key only
    SnapshotStore.commitAppend(spark, root,
      o.filter(col("o_orderkey") >= 2 * k / 3).repartition(1),
      statsCols = Seq("o_custkey"))
    def band(name: String, pr: SnapshotStore.PrunedRead,
        pred: org.apache.spark.sql.Column): DataFrame =
      pr.df.filter(pred)
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price_cents")).as("cents_sum"),
          countDistinct(col("o_custkey")).as("n_cust"))
        .select(lit(name).as("band"), col("n_orders"), col("cents_sum"),
          col("n_cust"))
    // old-key band inside era-1a: era-1b prunes, the stat-less-for-
    // orderkey new era opens (soundness)
    val byOrder = band("orderkey_first_sixth",
      SnapshotStore.readPruned(spark, root, "o_orderkey", 0L, k / 6),
      col("o_orderkey").between(0L, k / 6))
    // new-key band: the evolved segment prunes by ITS spec; the two
    // old-era segments have no custkey stats and always open
    val byCust = band("custkey_10_60",
      SnapshotStore.readPruned(spark, root, "o_custkey", 10L, 60L),
      col("o_custkey").between(10L, 60L))
    byOrder.unionAll(byCust).orderBy(col("band"))
  }

  /** A40: CHECK-constraint enforcement at commit — the Delta/Iceberg
    * `ADD CONSTRAINT CHECK` contract on the snapshot store: a clean
    * base lands, a second CLEAN batch passes its checked append, and
    * a batch with three kinds of synthesized dirt (negative balance,
    * NULL name, out-of-domain segment) is REJECTED atomically — the
    * store keeps exactly the two clean batches, and the caller gets
    * the per-rule violation bill from ONE aggregation pass instead of
    * a poisoned table. NULL check results count as violations (the
    * SQL CHECK would let them through; a warehouse gate must not —
    * both engines spell the same CASE). The result joins the bill to
    * the post-rejection store row count, so the hash proves BOTH the
    * counting and the atomic reject. */
  def warehouseConstraints(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    import spark.implicits._
    val root = freshSinkDir(spark, "constraints_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"))
    // the balance rule is the TPC-H domain floor — naturally-negative
    // balances are legal; only the injected dirt breaches it
    val checks = Seq(
      "acctbal_above_floor" -> (col("c_acctbal") >= -1000.0),
      "name_not_null" -> col("c_name").isNotNull,
      "segment_in_domain" -> col("c_mktsegment").isin(
        "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 4 === 0).repartition(1))
    val (vClean, _) = SnapshotStore.commitAppendChecked(spark, root,
      cust.filter(col("c_custkey") % 4 === 2).repartition(1), checks)
    require(vClean.nonEmpty, "the clean batch must commit")
    val dirty = cust.filter(col("c_custkey") % 2 === 1)
      .withColumn("c_acctbal", when(col("c_custkey") % 10 === 1,
        col("c_acctbal") - 20000.0).otherwise(col("c_acctbal")))
      .withColumn("c_name", when(col("c_custkey") % 10 === 3,
        lit(null).cast("string")).otherwise(col("c_name")))
      .withColumn("c_mktsegment", when(col("c_custkey") % 10 === 5,
        lit("UNKNOWN_SEG")).otherwise(col("c_mktsegment")))
    val (vDirty, bill) =
      SnapshotStore.commitAppendChecked(spark, root, dirty, checks)
    require(vDirty.isEmpty, "the dirty batch must be rejected")
    val storeRows = broadcast(SnapshotStore.read(spark, root)
      .agg(count(lit(1)).as("store_rows")))
    bill.toDF("rule", "n_violations")
      .crossJoin(storeRows)
      .orderBy(col("rule"))
  }

  /** A41: vacuum DRY-RUN — the audit every production retention job
    * offers before the destructive pass: the plan reports what WOULD
    * drop (manifests outside the retention window) and what WOULD be
    * reclaimed (a planted crashed-writer orphan dir), while the
    * result row reads the store's CURRENT content THROUGH the
    * snapshot reader AFTER planning — the hash proves both the plan
    * arithmetic and that planning touched nothing. */
  def warehouseVacuumPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "vacplan_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"))
    def slice(m: Int) = cust.filter(col("c_custkey") % 3 === m)
      .repartition(1)
    SnapshotStore.commitOverwrite(spark, root, slice(0))
    SnapshotStore.commitAppend(spark, root, slice(1))
    SnapshotStore.commitOverwrite(spark, root, slice(2))
    // a crashed writer: staged data, manifest never published
    slice(0).write.mode("overwrite").parquet(s"$root/data/orphan-crashed")
    val (drop, orphans) = SnapshotStore.vacuumPlan(spark, root, keepLast = 2)
    SnapshotStore.read(spark, root)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("bal_cents")).as("cents_sum"))
      .select(lit(drop.length).as("n_drop"),
        lit(orphans.length).as("n_orphans"),
        col("n_rows"), col("cents_sum"))
  }

  /** A23: the `_metadata` file-introspection surface — every file
    * source exposes a hidden `_metadata` struct (file_name, file_size,
    * row_index, …) that debugging, auditing, and incremental-load
    * bookkeeping read without a separate filesystem listing; it is how
    * a pipeline answers "which file did this corrupt row come from"
    * (A11's question one level deeper) and how compaction planners
    * (F9) see the row→file mapping inside the query itself. Layout is
    * made DETERMINISTIC so file-level facts are oracle-checkable: the
    * write repartitions by the partition column, so each year
    * directory holds exactly ONE file and per-file `row_index` spans
    * exactly [0, n_rows). The oracle recomputes everything from the
    * base table (n_files must be 1, max row_index = n_rows − 1);
    * file_size is deliberately absent (compression-dependent — the
    * one _metadata field with no portable value). */
  def scanMetadataFiles(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "meta_")
    t(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .repartition(col("o_year"))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    spark.read.parquet(out)
      .select(col("o_year"), col("_metadata.file_name").as("fname"),
        col("_metadata.row_index").as("ri"))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("fname")).as("n_files"),
        max(col("ri")).as("max_row_index"))
      .orderBy(col("o_year"))
  }

  /** C19: DYNAMIC partition pruning — the runtime companion of A8's
    * static prune, and the decisive star-schema scan optimization at
    * 100 TB: the fact is partitioned by year, but the selective
    * predicate lives on the DIMENSION (`is_current`), so the fact's
    * surviving partitions are unknowable at plan time — no literal
    * year predicate ever touches the fact. Catalyst inserts a
    * `DynamicPruningExpression` into the fact scan's PartitionFilters
    * that evaluates the (broadcast) dim side FIRST and skips every
    * non-matching year directory at runtime; without DPP the scan
    * reads all years and the join discards the rows after the fact.
    * `PlanAuditSpec` pins both halves: the dynamicpruning filter in
    * the scan AND a partitions-read count below the directory count.
    *
    * The dim is a year calendar derived once from the date column with
    * an attribute flag — the standard shape (a real warehouse joins
    * `dim_date` filtered on `is_current_quarter`, not a date literal
    * someone must remember to update). */
  def joinDynamicPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshSinkDir(spark, "dpp_")
    t(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    val fact = spark.read.parquet(out)
    val dim = t(spark, sfDir, "orders")
      .select(year(col("o_orderdate")).as("d_year")).distinct()
      .withColumn("is_current", col("d_year") >= 1997)
      .filter(col("is_current"))
    fact.join(dim, fact("o_year") === dim("d_year"))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        decSumDbl(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_year"))
  }

  /** The fixture key the current `graft_bkt_*` tables were built from
    * (null until first build). Guarded by the object lock in
    * [[joinBucketedColocated]]; keyed on fixture CONTENT so switching
    * fixtures (or regenerating one in place) rebuilds, while bench
    * reps over the same fixture pay the load once — the production
    * contract bucketing exists for (pay the layout at load, amortize
    * over every join). */
  @volatile private var bucketedTablesKey: String = null

  /** A9: bucketed co-located join — the zero-shuffle fact-fact join
    * layout. Both sides persist as bucketed tables on the join key
    * (same bucket count), so each side's scan already satisfies the
    * join's clustering requirement and the sort-merge join plans with
    * NO exchange on either side (pinned in `PlanAuditSpec`). At 100 TB
    * this converts the two biggest shuffles of a fact-fact join into
    * a bucket-aligned local merge — the bucketing cost is paid once at
    * load, amortized over every subsequent join (the build-once check
    * below IS that contract: reps/consumers after the first read the
    * existing tables). The merge hint forces SMJ so the pin is
    * meaningful at fixture scale (Spark would otherwise broadcast the
    * small side). */
  def joinBucketedColocated(spark: SparkSession, sfDir: String): DataFrame = {
    val buckets = 8
    val key = FixtureCache.contentKey(spark.sessionState.newHadoopConf(),
      Seq(s"$sfDir/lineitem.parquet", s"$sfDir/orders.parquet")) +
      "@" + spark.conf.get("spark.sql.warehouse.dir")
    Scans.synchronized {
      val ready = bucketedTablesKey == key &&
        spark.catalog.tableExists("graft_bkt_lineitem") &&
        spark.catalog.tableExists("graft_bkt_orders")
      if (!ready) {
        // a fresh session's in-memory catalog forgets managed tables but
        // their warehouse directories survive the JVM — saveAsTable then
        // fails with LOCATION_ALREADY_EXISTS. Drop both the entry and any
        // orphaned location before writing (idempotent re-run contract,
        // same reasoning as freshSinkDir).
        for (name <- Seq("graft_bkt_lineitem", "graft_bkt_orders")) {
          spark.sql(s"DROP TABLE IF EXISTS $name")
          // resolve through the session's Hadoop FileSystem, not
          // java.io.File — the warehouse may live on HDFS/S3, where a
          // local-file delete silently no-ops and the idempotent re-run
          // contract breaks with LOCATION_ALREADY_EXISTS (r8 verdict #2)
          val loc = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"), name)
          val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
          if (fs.exists(loc)) { fs.delete(loc, true); () }
        }
        t(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable("graft_bkt_lineitem")
        t(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable("graft_bkt_orders")
        bucketedTablesKey = key
      }
    }
    spark.table("graft_bkt_lineitem").hint("merge")
      .join(spark.table("graft_bkt_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        decSumDbl(col("l_extendedprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** A6: MERGE upsert load ([[graft.census.Warehouse.merge]]) — the
    * third load mode beside R21's drop-and-recreate and R22's blind
    * append: a deterministic update batch (every 10th customer gains
    * 1000.00 balance) plus an insert batch (every 100th customer
    * re-keyed past the key domain) merged into the customer dimension.
    * Matched rows take the update, unmatched updates insert, untouched
    * target rows survive — the oracle rebuilds the same row set with
    * the identical FULL OUTER + existence-switch composition. */
  def warehouseMergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val target = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val updates = target.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") + 1000.0d).as("c_acctbal"))
    val inserts = target.filter(col("c_custkey") % 100 === 0)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(col("c_name"), lit("_new")).as("c_name"), col("c_acctbal"))
    graft.census.Warehouse.merge(target, updates.union(inserts), Seq("c_custkey"))
      .select(col("c_custkey"), col("c_name"),
        cents(col("c_acctbal")).as("acctbal_cents"))
      .orderBy(col("c_custkey"))
  }

  /** A18: snapshot time travel ([[graft.sources.SnapshotStore]]) —
    * manifest-swap snapshot isolation, the lakehouse movement the
    * sink family lacked: three commits build three versions of a
    * customer slice (v1 overwrite, v2 APPEND — carries v1's data
    * directories forward without reading or rewriting a byte, v3
    * overwrite-rebuild), then each version is read back AS OF its
    * number and aggregated. The oracle recomputes the three row sets
    * from the base table with pure SQL — so the store must return
    * exactly the right historical content from its manifests, not
    * just the latest. A fresh root per run: versions are immutable,
    * re-running re-publishes v1..v3 identically. */
  def warehouseTimeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "snapshot_tt_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 10 === 0))
    SnapshotStore.commitAppend(spark, root,
      cust.filter(col("c_custkey") % 10 === 5))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 1000.0d).as("c_acctbal")))
    (1 to 3).map { v =>
      SnapshotStore.read(spark, root, asOf = Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents_sum"))
        .select(lit(v).as("version"), col("n_rows"),
          col("acctbal_cents_sum"))
    }.reduce(_.union(_)).orderBy(col("version"))
  }

  /** A36: named TAGS + tag-protected vacuum — the release-management
    * rung over the A18 snapshot store: the same three-commit history,
    * then `audited` pins v1 and `prod` pins v2, and a `keepLast = 1`
    * VACUUM runs BETWEEN tagging and reading — retention alone would
    * keep only v3, so the audited/prod reads below succeed purely
    * because tags protect their snapshots (manifest AND data) from
    * the sweep; if protection broke, the tagged reads would lose rows
    * or fail and the oracle hash would catch it. Refs are one-file
    * pointers committed by temp-write + atomic rename (retag = move,
    * last writer wins); at 100 TB this is how "prod" stays a stable
    * name while versions churn underneath, and how a compliance hold
    * survives aggressive retention. */
  def warehouseTags(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "snapshot_tags_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 10 === 0))
    SnapshotStore.commitAppend(spark, root,
      cust.filter(col("c_custkey") % 10 === 5))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 1000.0d).as("c_acctbal")))
    SnapshotStore.setTag(spark, root, "audited", 1)
    SnapshotStore.setTag(spark, root, "prod", 2)
    SnapshotStore.vacuum(spark, root, keepLast = 1)
    Seq("audited" -> SnapshotStore.readTag(spark, root, "audited"),
      "latest" -> SnapshotStore.read(spark, root),
      "prod" -> SnapshotStore.readTag(spark, root, "prod"))
      .map { case (ref, df) =>
        df.agg(count(lit(1)).as("n_rows"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents_sum"))
          .select(lit(ref).as("ref"), col("n_rows"),
            col("acctbal_cents_sum"))
      }.reduce(_.union(_)).orderBy(col("ref"))
  }

  /** A38: INCREMENTAL materialized-view maintenance — the rollup is
    * maintained by MERGING batch partials, never recomputed: batch 1
    * lands as the view's initial state, batch 2 aggregates ALONE
    * (cost ∝ batch) and full-outer-merges onto the state by group key
    * (`coalesce(old,0) + coalesce(new,0)` per measure — new groups
    * appear via the outer side, absent groups carry forward). This is
    * Spark's own partial-aggregation algebra lifted to user level —
    * COUNT/SUM are self-mergeable, and because the measures here are
    * exact integers (cents) the merge re-associates BIT-EXACTLY: the
    * oracle computes the direct one-shot aggregate over everything,
    * so the hash equality IS the view-maintenance correctness proof.
    * At 100 TB this is the difference between a daily O(batch) merge
    * and an O(table) recompute; AVG-style measures ride along as
    * (sum, count) pairs, while MIN/MAX only merge under inserts —
    * the delete-retraction caveat the scaladoc records. */
  def warehouseIncrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val base = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        cents(col("o_totalprice")).as("tc"))
    def rollup(df: DataFrame): DataFrame =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), sum(col("tc")).as("sum_cents"))
    val state = rollup(base.filter(col("o_orderkey") % 3 =!= 0))
      .withColumnRenamed("n_orders", "n0")
      .withColumnRenamed("sum_cents", "s0")
    val delta = rollup(base.filter(col("o_orderkey") % 3 === 0))
      .withColumnRenamed("n_orders", "n1")
      .withColumnRenamed("sum_cents", "s1")
    state.join(delta, Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("s0"), lit(0L)) + coalesce(col("s1"), lit(0L)))
          .as("sum_cents"))
      .orderBy(col("o_orderpriority"))
  }

  /** A42: incremental MV maintenance under DELETES — the retraction
    * path A38's scaladoc declared as a caveat, made executable
    * (round-16 verdict #7). The view (per-priority COUNT / SUM /
    * MIN / MAX over order cents) is maintained through a CDC delete
    * batch WITHOUT an O(table) recompute:
    *
    *  - COUNT/SUM retract EXACTLY: the delete batch aggregates alone
    *    (cost ∝ batch) and subtracts from the state — exact integer
    *    cents, so the subtraction is bit-exact;
    *  - MIN/MAX are not retractable from the aggregate alone: a group
    *    is flagged DIRTY only when the deleted batch's extreme
    *    touches the stored extreme (deleted_min ≤ state_min or
    *    deleted_max ≥ state_max), and ONLY dirty groups recompute
    *    their extremes from the remaining base rows — the recompute
    *    join is bounded by the broadcast dirty-key set, so a delete
    *    batch that never touches an extreme costs O(batch) total;
    *  - groups retracted to zero support DROP from the view.
    *
    * The oracle computes the one-shot aggregate over (initial \
    * deleted) directly, so hash equality IS the retraction-
    * correctness proof. */
  def warehouseIncrementalAggDel(spark: SparkSession, sfDir: String): DataFrame = {
    val base = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        cents(col("o_totalprice")).as("tc"))
    def rollup(df: DataFrame, sfx: String): DataFrame =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as(s"n$sfx"), sum(col("tc")).as(s"s$sfx"),
          min(col("tc")).as(s"mn$sfx"), max(col("tc")).as(s"mx$sfx"))
    // view contents after the initial build
    val live0 = base.filter(col("o_orderkey") % 3 =!= 0)
    val state = rollup(live0, "0")
    // the CDC delete batch: every 7th live order retracts
    val delBatch = live0.filter(col("o_orderkey") % 7 === 0)
    val dAgg = rollup(delBatch, "1")
    val merged = state.join(dAgg, Seq("o_orderpriority"), "left")
      .select(col("o_orderpriority"),
        (col("n0") - coalesce(col("n1"), lit(0L))).as("n_orders"),
        (col("s0") - coalesce(col("s1"), lit(0L))).as("sum_cents"),
        col("mn0"), col("mx0"),
        (col("mn1").isNotNull &&
          (col("mn1") <= col("mn0") || col("mx1") >= col("mx0")))
          .as("dirty"))
    // extremes recomputed ONLY for dirty groups, over remaining rows
    val remaining = live0.filter(col("o_orderkey") % 7 =!= 0)
    val recomputed = remaining
      .join(broadcast(merged.filter(col("dirty"))
        .select(col("o_orderpriority"))), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(min(col("tc")).as("rmn"), max(col("tc")).as("rmx"))
    merged.join(recomputed, Seq("o_orderpriority"), "left")
      .filter(col("n_orders") > 0)
      .select(col("o_orderpriority"), col("n_orders"), col("sum_cents"),
        when(col("dirty"), col("rmn")).otherwise(col("mn0")).as("min_cents"),
        when(col("dirty"), col("rmx")).otherwise(col("mx0")).as("max_cents"))
      .orderBy(col("o_orderpriority"))
  }

  /** A43: warehouse-side SCHEMA EVOLUTION — an append commit ADDS a
    * column and the snapshot read absorbs it additively (the
    * Delta/Iceberg evolution contract): rows from pre-evolution
    * commits surface the new column as NULL, post-evolution rows
    * carry their values, nothing is rewritten. Distinct from A10
    * (file-level mergeSchema on a raw directory): here the evolution
    * happens THROUGH the versioned commit protocol, and the read
    * path's by-name assembly is what makes every older snapshot and
    * time-travel read keep working. The presentation folds the NULLs
    * into a 'legacy' tier so the oracle can rebuild the exact frame
    * from the base table. */
  def warehouseSchemaAddCol(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "snapshot_addcol_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 2 === 0))
    SnapshotStore.commitAppend(spark, root,
      cust.filter(col("c_custkey") % 2 === 1)
        .withColumn("c_tier",
          when(col("c_acctbal") >= 5000.0d, "gold").otherwise("std")))
    SnapshotStore.read(spark, root)
      .groupBy(coalesce(col("c_tier"), lit("legacy")).as("tier"))
      .agg(count(lit(1)).as("n_cust"),
        sum(cents(col("c_acctbal"))).as("bal_cents"))
      .orderBy(col("tier"))
  }

  /** A45: RESTORE — roll the table back to an earlier snapshot as a
    * NEW commit (Delta `RESTORE`, Iceberg `rollback`): the A18
    * three-commit history, then version 1's content is re-committed
    * as version 4. The restore is FORWARD history, not erasure — the
    * bad versions 2 and 3 stay time-travel-readable for audit (the
    * difference between RESTORE and a vacuum), and the restored
    * snapshot is verifiably bit-equal to its source. At 100 TB the
    * restore commit is METADATA-ONLY in spirit: the engine re-reads
    * v1 and rewrites it here (the simple store has no manifest
    * re-pointing), but the read path never touches v2/v3 data, and
    * the check the row carries — v4 ≡ v1 on count and exact-cents
    * sum — is the invariant a manifest-repointing implementation
    * must also satisfy. */
  def warehouseRestore(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "snapshot_restore_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 10 === 0))
    SnapshotStore.commitAppend(spark, root,
      cust.filter(col("c_custkey") % 10 === 5))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 1000.0d).as("c_acctbal")))
    // RESTORE to v1: re-commit the v1 snapshot as v4
    SnapshotStore.commitOverwrite(spark, root,
      SnapshotStore.read(spark, root, asOf = Some(1)))
    (1 to 4).map { v =>
      SnapshotStore.read(spark, root, asOf = Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents_sum"))
        .select(lit(v).as("version"), col("n_rows"),
          col("acctbal_cents_sum"))
    }.reduce(_.union(_)).orderBy(col("version"))
  }

  /** A17: MERGE with a DELETE arm
    * ([[graft.census.Warehouse.mergeWithDeletes]]) — the full CDC load
    * over the A6 customer dimension: every 10th customer updates
    * (+1000.00), every 7th-not-10th DELETES, every 100th inserts under
    * a fresh key, and one delete targets an ABSENT key (1000001 + the
    * insert offset misses) to exercise the no-op arm. The surviving
    * row set comes back out; the oracle rebuilds it with the identical
    * FULL OUTER + delete-filter composition. */
  def warehouseMergeDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val target = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val updates = target.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") + 1000.0d).as("c_acctbal"), lit("U").as("op"))
    val deletes = target
      .filter(col("c_custkey") % 7 === 0 && col("c_custkey") % 10 =!= 0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        lit("D").as("op"))
    val inserts = target.filter(col("c_custkey") % 100 === 0)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(col("c_name"), lit("_new")).as("c_name"), col("c_acctbal"),
        lit("U").as("op"))
    val ghostDelete = target.filter(col("c_custkey") === 1L)
      .select((col("c_custkey") + 2000000L).as("c_custkey"), col("c_name"),
        col("c_acctbal"), lit("D").as("op"))
    graft.census.Warehouse.mergeWithDeletes(target,
        updates.union(deletes).union(inserts).union(ghostDelete),
        Seq("c_custkey"))
      .select(col("c_custkey"), col("c_name"),
        cents(col("c_acctbal")).as("acctbal_cents"))
      .orderBy(col("c_custkey"))
  }

  /** A16: SCD2 MERGE load ([[graft.census.Warehouse.mergeScd2]]) — the
    * history-preserving counterpart of A6 over the same customer
    * dimension. The target carries a synthesized timeline (every 20th
    * customer has a closed 2023 version at 500.00 less, everyone an
    * open 2024 version); the 2025-06-01 batch then exercises every
    * merge arm at once: every 10th customer changes (+1000.00 → close
    * the 2024 row, open a 2025 one), every other 7th re-sends its
    * UNCHANGED attributes (idempotence: no spurious version), every
    * 100th inserts under a fresh key. The full versioned table comes
    * back out; (key, valid_from) is unique by construction, so the
    * ORDER BY is fully tie-broken. */
  def warehouseMergeScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val asOf = java.sql.Date.valueOf("2025-06-01")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val open = cust.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
      lit(java.sql.Date.valueOf("2024-01-01")).as("valid_from"),
      lit(null).cast("date").as("valid_to"))
    val hist = cust.filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") - 500.0d).as("c_acctbal"),
        lit(java.sql.Date.valueOf("2023-01-01")).as("valid_from"),
        lit(java.sql.Date.valueOf("2024-01-01")).as("valid_to"))
    val changed = cust.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") + 1000.0d).as("c_acctbal"))
    val same = cust.filter(col("c_custkey") % 7 === 0 &&
      col("c_custkey") % 10 =!= 0)
    val inserts = cust.filter(col("c_custkey") % 100 === 0)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(col("c_name"), lit("_new")).as("c_name"), col("c_acctbal"))
    graft.census.Warehouse.mergeScd2(hist.union(open),
        changed.union(same).union(inserts), Seq("c_custkey"), lit(asOf))
      .select(col("c_custkey"), col("c_name"),
        cents(col("c_acctbal")).as("acctbal_cents"),
        col("valid_from"), col("valid_to"))
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  /** A21: OBSERVED scan — QC metrics for free on the side of a query
    * (`Dataset.observe` → CollectMetrics): the scan's row count, value
    * mass, and null count are collected BY THE SAME JOB that answers
    * the query. At 100 TB a separate QC pass is a second full scan,
    * which is why every production load attaches its quality gates as
    * observations instead. The observation is semantically
    * TRANSPARENT — the registered result is the plain filtered
    * projection (oracle-checked as usual, proving the metrics node
    * changes nothing); the metric VALUES come back through the
    * `Observation` handle and are pinned against direct aggregates in
    * `ObserveSpec`. Metrics attach BEFORE the status filter, so they
    * profile everything scanned, not just what survives.
    *
    * GOTCHA (pinned in `ObserveSpec`): the query must end in
    * `orderBy().limit()` — TakeOrderedAndProject, one pass — not a
    * global sort, whose range-SAMPLING job executes the metrics
    * subtree a second time and silently DOUBLES every accumulated
    * value. Any production observation placed under a global sort has
    * this bug. */
  def observedOrders(spark: SparkSession, sfDir: String,
      obs: Option[org.apache.spark.sql.Observation]): DataFrame = {
    val base = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("tp_cents"))
    val m = Seq(count(lit(1)).as("n_rows"),
      sum(col("tp_cents")).as("cents_sum"),
      sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L))
        .as("n_null_status"))
    val observed = obs match {
      case Some(o) => base.observe(o, m.head, m.tail: _*)
      case None => base.observe("scan_qc", m.head, m.tail: _*)
    }
    observed.filter(col("o_orderstatus") === "F")
      .orderBy(col("o_orderkey")).limit(500)
  }

  def scanObserved(spark: SparkSession, sfDir: String): DataFrame =
    observedOrders(spark, sfDir, None)

  /** A20: snapshot VACUUM ([[graft.sources.SnapshotStore.vacuum]]) —
    * the retention sweep that completes A18's time-travel story: the
    * same v1 overwrite / v2 append / v3 rebuild commits, PLUS a
    * planted crashed-writer orphan (staged data, manifest never
    * published), then `vacuum(keepLast = 2)`. Exactly ONE manifest
    * drops (v1) and exactly ONE data directory is reclaimed (the
    * orphan) — v1's data dir survives because v2's append manifest
    * still carries it, the subtlety that makes naive age-based
    * cleanup corrupt appended tables. The surviving versions then
    * read back AS OF with their exact historical content (the oracle
    * recomputes both from the base table), proving the sweep removed
    * nothing a keeper references. */
  def snapshotVacuum(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "snapshot_vac_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 10 === 0))
    SnapshotStore.commitAppend(spark, root,
      cust.filter(col("c_custkey") % 10 === 5))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 1000.0d).as("c_acctbal")))
    cust.filter(col("c_custkey") === 1L)
      .write.parquet(s"$root/data/orphan-crashed-writer")
    val (droppedManifests, removedDirs) =
      SnapshotStore.vacuum(spark, root, keepLast = 2)
    (2 to 3).map { v =>
      SnapshotStore.read(spark, root, asOf = Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents_sum"))
        .select(lit(v).as("version"), col("n_rows"),
          col("acctbal_cents_sum"),
          lit(droppedManifests.toLong).as("n_dropped_manifests"),
          lit(removedDirs.toLong).as("n_removed_dirs"))
    }.reduce(_.union(_)).orderBy(col("version"))
  }

  /** A30: MERGE-ON-READ DELETE ([[graft.sources.SnapshotStore.commitDelete]])
    * — the deletion-vector movement F12's copy-on-write bill argues
    * for: a GDPR-style erasure on the A18 snapshot store that rewrites
    * ZERO data files. v1 publishes a customer slice; v2 deletes every
    * 30th key by committing only a deletion-vector sidecar (the
    * deleted keys as one small parquet + one manifest line — O(deleted
    * keys), where copy-on-write is O(every touched file), the
    * amplification F12 prices); v3 RE-INSERTS the deleted keys via an
    * ordinary append, proving the DV is scoped to the data that
    * existed when the delete committed (the per-file semantics of
    * lakehouse deletion vectors — an append after the delete is not
    * retro-deleted). Each version reads back AS OF its number: v1
    * still serves the pre-delete content (time travel through a
    * delete), v2 subtracts the keys at read (merge-on-read), v3 shows
    * them re-inserted with shifted balances. The no-rewrite law (v1's
    * data files byte-untouched by the delete) and the
    * overwrite-materializes law are pinned in `SnapshotStoreSpec`. */
  def warehouseDeleteMor(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "snapshot_mor_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 10 === 0))
    SnapshotStore.commitDelete(spark, root, "c_custkey",
      col("c_custkey") % 30 === 0)
    SnapshotStore.commitAppend(spark, root,
      cust.filter(col("c_custkey") % 30 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 1000.0d).as("c_acctbal")))
    (1 to 3).map { v =>
      SnapshotStore.read(spark, root, asOf = Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents_sum"))
        .select(lit(v).as("version"), col("n_rows"),
          col("acctbal_cents_sum"))
    }.reduce(_.union(_)).orderBy(col("version"))
  }

  /** A34: MERGE-ON-READ UPSERT
    * ([[graft.sources.SnapshotStore.commitUpsert]]) — the Iceberg-v2
    * equality-delete write path beside A30's pure delete: v1 publishes
    * the customer slice, v2 upserts ONE batch (every 20th key updated
    * at +1000, every 100th key inserted under a fresh id) as a single
    * commit of (equality-delete DV, batch dir) — matched rows are
    * superseded without rewriting a file, fresh keys insert, untouched
    * rows survive; v3 REPLAYS the identical batch and must change
    * nothing (the CDC at-least-once posture). Each version reads back
    * AS OF its number; the oracle recomputes all three from the base
    * table with the A6 SCD1 composition. */
  def warehouseUpsertMor(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "snapshot_umor_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 10 === 0))
    val batch = cust.filter(col("c_custkey") % 20 === 0)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") + 1000.0d).as("c_acctbal"))
      .union(cust.filter(col("c_custkey") % 100 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          concat(col("c_name"), lit("_new")).as("c_name"), col("c_acctbal")))
    SnapshotStore.commitUpsert(spark, root, "c_custkey", batch)
    SnapshotStore.commitUpsert(spark, root, "c_custkey", batch) // replay
    (1 to 3).map { v =>
      SnapshotStore.read(spark, root, asOf = Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents_sum"))
        .select(lit(v).as("version"), col("n_rows"),
          col("acctbal_cents_sum"))
    }.reduce(_.union(_)).orderBy(col("version"))
  }

  /** A33: ZERO-COPY CLONE ([[graft.sources.SnapshotStore.shallowClone]]) —
    * the Delta shallow-clone movement: a clone of the source's latest
    * snapshot costs ONE manifest write (the clone references the
    * source's data directories verbatim), after which the two roots
    * diverge freely. The query publishes a 2-version source, clones
    * it, then appends a DIFFERENT batch to each root — the clone's
    * post-clone append must be invisible to the source and vice
    * versa; both finals and the shared pre-clone content come back
    * out. The shallow-clone hazard (a source vacuum can reclaim dirs
    * a live clone references) is pinned in `SnapshotStoreSpec`. */
  def warehouseClone(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val src = freshSinkDir(spark, "snapshot_clone_src_")
    val dst = freshSinkDir(spark, "snapshot_clone_dst_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    SnapshotStore.commitOverwrite(spark, src,
      cust.filter(col("c_custkey") % 10 === 0))
    SnapshotStore.commitAppend(spark, src,
      cust.filter(col("c_custkey") % 10 === 5))
    SnapshotStore.shallowClone(spark, src, dst)
    // divergent post-clone appends: source gets the %10=3 slice, the
    // clone gets the %100=0 slice at +1000 — each invisible to the other
    SnapshotStore.commitAppend(spark, src,
      cust.filter(col("c_custkey") % 10 === 3))
    SnapshotStore.commitAppend(spark, dst,
      cust.filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 1000.0d).as("c_acctbal")))
    def scoped(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents_sum"))
        .select(lit(name).as("scope"), col("n_rows"),
          col("acctbal_cents_sum"))
    scoped("clone_at_fork", SnapshotStore.read(spark, dst, asOf = Some(1)))
      .union(scoped("clone_final", SnapshotStore.read(spark, dst)))
      .union(scoped("source_final", SnapshotStore.read(spark, src)))
      .orderBy(col("scope"))
  }

  /** A31: ZONE-MAP file skipping at the SNAPSHOT-STORE layer
    * ([[graft.sources.SnapshotStore.readPruned]]) — F10 proved the
    * skip arithmetic as a query; here the store's manifests CARRY the
    * per-directory min/max (recorded at commit time from the written
    * batch, one narrow scan) and the reader skips non-overlapping
    * directories BEFORE opening a file — the A8/C19 pruning discipline
    * one level up, and after partition pruning the first IO lever at
    * 100 TB. Four appended batches land key-range-disjoint zone maps
    * on a derived `k_bucket` column; a range read then opens exactly
    * the 2 overlapping directories of 4 (the counts ride the result
    * row), and the returned rows are IDENTICAL to an unpruned
    * read+filter — value transparency, which the oracle re-proves by
    * computing the answer from the base table with no store at all.
    * Random-range transparency and the stat-less-dir soundness rule
    * are pinned in `SnapshotStoreSpec`. */
  def warehouseStatsPrune(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "snapshot_zm_")
    val base = t(spark, sfDir, "customer")
      .select(col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"),
        (col("c_custkey") % 100).as("k_bucket"))
    for (i <- 0 to 3)
      SnapshotStore.commitAppend(spark, root,
        base.filter(col("k_bucket").between(25 * i, 25 * i + 24)),
        statsCol = Some("k_bucket"))
    val pruned = SnapshotStore.readPruned(spark, root, "k_bucket", 30L, 60L)
    pruned.df.filter(col("k_bucket").between(30, 60))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("bal_cents")).as("acctbal_cents_sum"))
      .select(col("n_rows"), col("acctbal_cents_sum"),
        lit(pruned.dirsOpened.toLong).as("n_dirs_opened"),
        lit(pruned.dirsTotal.toLong).as("n_dirs_total"))
  }

  /** A22: snapshot CHANGE FEED — the row-level diff between committed
    * versions of the A18 snapshot store, i.e. the read side of CDC
    * (Delta's table_changes / Iceberg's changelog scan): downstream
    * incremental consumers ask "what changed between v_a and v_b"
    * instead of re-reading the whole table. The same three commits as
    * A18 (v1 overwrite, v2 append, v3 overwrite-rebuild) are published,
    * then the feed is computed for v1→v2 (pure inserts — the append)
    * and v2→v3 (updates for the rebuilt keys, deletes for the rest),
    * covering all three op kinds. Unchanged rows are NOT part of a
    * change feed and are filtered on the exact integer-cents
    * comparison.
    *
    * Scale shape: one FULL OUTER shuffle per version pair on the key —
    * the identical movement as the A6 MERGE, and the best possible
    * without file-level change tracking; a store that recorded per-file
    * add/remove in its manifests could skip the unchanged files
    * entirely, which is exactly what the A18 manifests enable for the
    * append case (v2's feed IS its appended directories). The oracle
    * recomputes both version contents from the base table and diffs
    * them with the same FULL OUTER composition. */
  def warehouseSnapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = freshSinkDir(spark, "snapshot_diff_")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 10 === 0))
    SnapshotStore.commitAppend(spark, root,
      cust.filter(col("c_custkey") % 10 === 5))
    SnapshotStore.commitOverwrite(spark, root,
      cust.filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 1000.0d).as("c_acctbal")))
    def feed(va: Int, vb: Int): DataFrame = {
      val a = SnapshotStore.read(spark, root, asOf = Some(va))
        .select(col("c_custkey").as("key_a"),
          cents(col("c_acctbal")).as("cents_before"))
      val b = SnapshotStore.read(spark, root, asOf = Some(vb))
        .select(col("c_custkey").as("key_b"),
          cents(col("c_acctbal")).as("cents_after"))
      a.join(b, col("key_a") === col("key_b"), "full_outer")
        .withColumn("op",
          when(col("key_a").isNull, "I")
            .when(col("key_b").isNull, "D")
            .otherwise("U"))
        .filter(col("op") =!= "U" ||
          col("cents_before") =!= col("cents_after"))
        .select(lit(va).as("from_v"), lit(vb).as("to_v"), col("op"),
          coalesce(col("key_a"), col("key_b")).as("c_custkey"),
          col("cents_before"), col("cents_after"))
    }
    feed(1, 2).unionAll(feed(2, 3))
      .orderBy(col("from_v"), col("c_custkey"))
  }

  /** A19: point-in-time read over an SCD2 dimension — the CONSUMER of
    * A16's history-preserving merge, and the enrichment every fact
    * load runs: each order joins the customer VERSION that was valid
    * on its order date (`valid_from <= d < valid_to`, open row =
    * unbounded). The dimension is built by
    * [[graft.census.Warehouse.mergeScd2]] itself (full 1995 history +
    * 1998 open rows, then a 2000-06-01 batch changes every 10th
    * customer), so the query exercises merge output THROUGH the read
    * path; the oracle constructs the expected version timeline
    * directly — proving both the merge and the as-of semantics at
    * once. Per version date: orders matched, distinct customers,
    * revenue.
    *
    * Scale shape: the join is an EQUI hash join on the customer key
    * with the validity range as a post-join filter — per key only a
    * handful of versions, so the filter touches a bounded fan-out;
    * this is the standard SCD2 lookup shape (a range-only join would
    * plan as a nested loop). One partial-agg rollup over 3 version
    * dates; the distinct-customer count expands only the 3-group
    * frame. */
  def warehouseScd2Asof(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val hist = cust.select(col("c_custkey"), col("c_name"),
      (col("c_acctbal") - 500.0d).as("c_acctbal"),
      lit(java.sql.Date.valueOf("1995-01-01")).as("valid_from"),
      lit(java.sql.Date.valueOf("1998-01-01")).as("valid_to"))
    val open = cust.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
      lit(java.sql.Date.valueOf("1998-01-01")).as("valid_from"),
      lit(null).cast("date").as("valid_to"))
    val changed = cust.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"),
        (col("c_acctbal") + 1000.0d).as("c_acctbal"))
    val dim = graft.census.Warehouse.mergeScd2(hist.union(open), changed,
      Seq("c_custkey"), lit(java.sql.Date.valueOf("2000-06-01")))
    val facts = t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"),
        cents(col("o_totalprice")).as("tpc"))
    facts.join(dim, col("o_custkey") === col("c_custkey") &&
        col("d") >= col("valid_from") &&
        (col("valid_to").isNull || col("d") < col("valid_to")))
      .groupBy(col("valid_from"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(col("tpc")).as("revenue_cents"))
      .orderBy(col("valid_from"))
  }
}
