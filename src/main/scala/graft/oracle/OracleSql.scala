package graft.oracle

/** DuckDB oracle SQL, one entry per oracle-checked query in
  * graft.SparkEntry.queries. Written in portable ANSI-flavored DuckDB SQL
  * (SURVEY.md §2.2 determinism contract): exact decimal internals with
  * DOUBLE/BIGINT/STRING finals matching graft.ops.Util exactly, explicit
  * NULLS FIRST/LAST on every nullable sort key, fully tie-broken ORDER BY,
  * column names identical to the Spark side.
  *
  * Deliberately absent (driver records a rows-only check; semantics are
  * pinned by unit tests instead):
  *  - agg_approx_distinct (HLL sketch estimate is engine-specific),
  *  - agg_approx_percentile (Greenwald-Khanna summary is
  *    engine-specific; rank-error bound unit-tested at all scales),
  *  - dedup_minhash (Murmur3 LSH signatures aren't portable SQL),
  *  - dedup_simhash (xxhash64 fingerprints aren't portable SQL),
  *  - dedup_embedding / sim_ann_topk (fixed-seed Gaussian hyperplanes
  *    aren't portable SQL),
  *  - sim_ivf_topk (k-means IVF cell ids aren't portable SQL).
  */
object OracleSql {

  /** dbl(x) of graft.ops.Util: fix to DECIMAL(38,6), then DOUBLE. */
  private def dbl(expr: String): String =
    s"CAST(CAST($expr AS DECIMAL(38,6)) AS DOUBLE)"

  /** dec(x) of graft.ops.Util. */
  private def dec(expr: String): String = s"CAST($expr AS DECIMAL(18,4))"

  /** The stub-decode projection shared by the multimodal oracles —
    * ONE definition so `multimodal_decode` and `multimodal_resize` can
    * never drift from each other (they must both mirror
    * `Multimodal.decodeStub` exactly). */
  private val decodeStubSql: String =
    """SELECT doc_id,
      |    CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
      |    CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INTEGER) AS height,
      |    ['png', 'jpeg', 'webp'][octet_length(encode(text)) % 3 + 1] AS format
      |  FROM documents""".stripMargin

  /** K60 multimodal asset dedup: groups by the PAYLOAD itself (the
    * engine groups by its 256-bit hash — collision-free equivalence),
    * format from the shared stub-decode mirror. */
  private val multimodalDedupSql: String =
    """WITH g AS (
      |  SELECT ['png', 'jpeg', 'webp'][octet_length(encode(text)) % 3 + 1]
      |      AS format,
      |    encode(text) AS payload, octet_length(encode(text)) AS n_bytes,
      |    COUNT(*) AS n
      |  FROM documents GROUP BY 1, 2, 3
      |)
      |SELECT format, CAST(SUM(n) AS BIGINT) AS n_payloads,
      |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |  CAST(SUM(n - 1) AS BIGINT) AS n_dup,
      |  CAST(SUM(n * n_bytes) AS BIGINT) AS bytes_total,
      |  CAST(SUM((n - 1) * n_bytes) AS BIGINT) AS bytes_dedupable
      |FROM g GROUP BY format
      |ORDER BY format""".stripMargin

  /** The token-trigram shingle-set + min-shingle-bucket CTEs — the
    * SQL-portable bucket family shared by dedup_ngram_jaccard,
    * dedup_clusters, dedup_end_to_end, and dedup_health (all four
    * oracles must see the identical shingle relation). */
  private val shingleCtes: String =
    """d AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(0, len(toks) - 2),
      |      i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]))) AS shingles
      |  FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 3
      |), bk AS (
      |  SELECT doc_id, shingles, list_min(shingles) AS bucket FROM d
      |)""".stripMargin

  /** The Morton-interleave CTE chain over `lineitem(l_partkey,
    * l_suppkey)` — the SQL mirror of `graft.ops.Layout.spread16` /
    * `mortonKey`, ONE definition shared by the `layout_zorder` audit
    * and the `layout_zonemap_skip` pruning report (both must see the
    * identical Z-file assignment). Ends in a `z` relation carrying
    * (l_partkey, l_suppkey, z). */
  private val mortonZCtes: String =
    """s0 AS (
      |  SELECT l_partkey, l_suppkey,
      |    l_partkey & 65535 AS a, l_suppkey & 65535 AS b
      |  FROM lineitem
      |), s1 AS (SELECT l_partkey, l_suppkey,
      |    (a | (a << 8)) & 16711935 AS a, (b | (b << 8)) & 16711935 AS b FROM s0
      |), s2 AS (SELECT l_partkey, l_suppkey,
      |    (a | (a << 4)) & 252645135 AS a, (b | (b << 4)) & 252645135 AS b FROM s1
      |), s3 AS (SELECT l_partkey, l_suppkey,
      |    (a | (a << 2)) & 858993459 AS a, (b | (b << 2)) & 858993459 AS b FROM s2
      |), s4 AS (SELECT l_partkey, l_suppkey,
      |    (a | (a << 1)) & 1431655765 AS a, (b | (b << 1)) & 1431655765 AS b FROM s3
      |), z AS (
      |  SELECT l_partkey, l_suppkey, (a | (b << 1)) AS z FROM s4
      |)""".stripMargin

  /** The part co-occurrence graph (support-pruned, quantity ≥ 25) —
    * shared by graph_triangles / graph_pagerank / graph_similar; all
    * oracles must see the identical edge set (mirror of
    * `Graphs.coOccurrenceEdges`). The pr CTE mirrors the engine's skew
    * cap (`Buckets.members`, same as the dedup_containment oracle):
    * only the cap smallest parts per order generate pairs — TPC-H
    * orders hold ≤ 7 lineitems so fixtures are bit-identical, and a
    * degenerate mega-order truncates identically in both engines
    * (round-11 advice: this cap was previously engine-only). */
  private def coGraphCtes(minQty: Int = 25): String =
    s"""pn AS (
       |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS node FROM lineitem
       |  WHERE l_quantity >= $minQty
       |), pr AS (
       |  SELECT okey, node,
       |    row_number() OVER (PARTITION BY okey ORDER BY node) AS rn
       |  FROM pn
       |), e AS (
       |  SELECT DISTINCT a.node AS u, b.node AS v
       |  FROM pr a JOIN pr b ON a.okey = b.okey AND a.node < b.node
       |  WHERE a.rn <= ${graft.ops.Buckets.MaxBucket}
       |    AND b.rn <= ${graft.ops.Buckets.MaxBucket}
       |)""".stripMargin

  /** PageRank with the engine's exact iteration count unrolled as
    * chained CTEs — per-edge contributions term-rounded to 12 dp and
    * summed as exact DECIMAL(28,14) (associative), one IEEE
    * multiply-add + 12 dp re-round per node per step: both engines
    * walk the identical float sequence (mirror of
    * `Graphs.graphPagerank`). */
  private val pagerankSql: String = {
    val iters = graft.ops.Graphs.PagerankIters
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT dg2.node,
         |    round(CAST(0.15 AS DOUBLE) / (SELECT c FROM n)
         |      + CAST(0.85 AS DOUBLE)
         |        * CAST(SUM(CAST(round(r.rank / dg.d, 12) AS DECIMAL(28,14))) AS DOUBLE),
         |      12) AS rank
         |  FROM sym s
         |  JOIN deg dg ON s.src = dg.node
         |  JOIN r${i - 1} r ON s.src = r.node
         |  JOIN deg dg2 ON s.dst = dg2.node
         |  GROUP BY dg2.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${coGraphCtes()}, sym AS (
       |  SELECT u AS src, v AS dst FROM e
       |  UNION ALL
       |  SELECT v AS src, u AS dst FROM e
       |), deg AS (
       |  SELECT src AS node, COUNT(*) AS d FROM sym GROUP BY src
       |), n AS (SELECT COUNT(*) AS c FROM deg),
       |r0 AS (
       |  SELECT node, round(CAST(1 AS DOUBLE) / (SELECT c FROM n), 12) AS rank
       |  FROM deg
       |),
       |$steps
       |SELECT r.node, d.d, r.rank
       |FROM r$iters r JOIN deg d ON r.node = d.node
       |ORDER BY r.rank DESC, r.node
       |LIMIT 20""".stripMargin
  }

  /** HITS with the engine's iteration count unrolled as chained CTEs —
    * 12 dp score rounds, exact DECIMAL(28,14) cross-node sums, one
    * IEEE divide per normalization (mirror of `Graphs.graphHits`). */
  private val hitsSql: String = {
    val iters = graft.ops.Graphs.HitsIters
    val steps = (1 to iters).map { i =>
      s"""sa$i AS (
         |  SELECT be.p, SUM(CAST(h.h AS DECIMAL(28,14))) AS s
         |  FROM be JOIN h${i - 1} h ON be.c = h.c GROUP BY be.p
         |), a$i AS (
         |  SELECT p, round(CAST(s AS DOUBLE) /
         |    (SELECT CAST(SUM(s) AS DOUBLE) FROM sa$i), 12) AS a
         |  FROM sa$i
         |), sh$i AS (
         |  SELECT be.c, SUM(CAST(a.a AS DECIMAL(28,14))) AS s
         |  FROM be JOIN a$i a ON be.p = a.p GROUP BY be.c
         |), h$i AS (
         |  SELECT c, round(CAST(s AS DOUBLE) /
         |    (SELECT CAST(SUM(s) AS DOUBLE) FROM sh$i), 12) AS h
         |  FROM sh$i
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH be AS (
       |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_quantity >= ${graft.ops.Graphs.HitsMinQty}
       |), nc AS (SELECT COUNT(DISTINCT c) AS n FROM be),
       |h0 AS (
       |  SELECT DISTINCT c,
       |    round(CAST(1 AS DOUBLE) / (SELECT n FROM nc), 12) AS h
       |  FROM be
       |),
       |$steps
       |SELECT role, node, score FROM (
       |  SELECT 'authority' AS role, CAST(p AS BIGINT) AS node,
       |    a AS score
       |  FROM a$iters ORDER BY a DESC, p LIMIT 10
       |) ta
       |UNION ALL
       |SELECT role, node, score FROM (
       |  SELECT 'hub' AS role, CAST(c AS BIGINT) AS node, h AS score
       |  FROM h$iters ORDER BY h DESC, c LIMIT 10
       |) th
       |ORDER BY role, score DESC, node""".stripMargin
  }

  /** The langid stopword profiles as DuckDB list literals (mirror of
    * `LlmData.langProfiles`). */
  private val langProfilesSql: Seq[(String, String)] = Seq(
    "de" -> "['der','die','das','und','ist','nicht','ein','ich']",
    "en" -> "['the','a','of','and','to','in','is','that']",
    "es" -> "['el','la','de','los','que','y','en','un']",
    "fr" -> "['le','la','les','et','des','un','une','est']",
    "zh" -> "['的','是','在','了','我']")

  /** The langid argmax (alphabetical-first tie-break) as a CASE over a
    * distinct-token list column — shared by text_langid and
    * corpus_curation, mirroring `LlmData.langidExpr`. */
  private def langidCaseSql(toks: String): String = {
    def sc(p: String) = s"len(list_intersect($toks, $p))"
    val whens = langProfilesSql.init.zipWithIndex.map { case ((l, p), i) =>
      val conds = langProfilesSql.drop(i + 1)
        .map { case (_, q) => s"${sc(p)} >= ${sc(q)}" }
      s"WHEN ${conds.mkString("\n     AND ")} THEN '$l'"
    }
    s"CASE\n    ${whens.mkString("\n    ")}\n    ELSE '${langProfilesSql.last._1}'\n  END"
  }

  /** Shared by dedup_ngram_jaccard and (as the edge set of the
    * dedup_clusters recursive closure) dedup_clusters — both oracles
    * must see the identical pair relation. The rk CTE mirrors the
    * engine's skew cap (`Buckets.members`, round-6 verdict #1): only
    * the cap smallest doc_ids per min-shingle bucket generate pairs
    * (fixture buckets are all far below the cap, so results are
    * bit-identical; a degenerate corpus truncates identically in both
    * engines). */
  private val ngramJaccardSql: String =
    s"""WITH $shingleCtes, rk AS (
       |  SELECT doc_id, shingles, bucket,
       |    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
       |  FROM bk
       |), pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    len(list_intersect(a.shingles, b.shingles)) AS n_int,
       |    len(a.shingles) + len(b.shingles)
       |      - len(list_intersect(a.shingles, b.shingles)) AS n_union
       |  FROM rk a JOIN rk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  WHERE a.rn <= ${graft.ops.Buckets.MaxBucket}
       |    AND b.rn <= ${graft.ops.Buckets.MaxBucket}
       |)
       |SELECT doc_a, doc_b,
       |  ${dbl(s"${dec("n_int")} / n_union")} AS jaccard
       |FROM pairs
       |WHERE ${dbl(s"${dec("n_int")} / n_union")} >= CAST(0.5 AS DOUBLE)
       |ORDER BY doc_a, doc_b""".stripMargin

  val all: Map[String, String] = Map(
    // ---------------- A: scans / sinks ----------------
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "scan_prune_filter" ->
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_odate
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |ORDER BY o_orderkey""".stripMargin,

    "sink_roundtrip_csv" ->
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""",

    // the ORC writer/reader must be lossless for bigint/string/double/
    // date — the oracle reads the ORIGINAL table
    "sink_roundtrip_orc" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(o_orderdate AS DATE) AS o_odate
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // A15 codec roundtrip: values must survive zstd bit-exact — the
    // oracle scans the ORIGINAL table
    "sink_roundtrip_parquet_zstd" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(o_orderdate AS DATE) AS o_odate
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // DSv2 manifest-committed sink: the oracle scans the ORIGINAL table
    "sink_dsv2_audit" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice AS o_price
        |FROM orders
        |ORDER BY o_orderkey, o_orderpriority, o_price""".stripMargin,

    // JSON lines round-trip: the oracle scans the ORIGINAL table
    "sink_roundtrip_json" ->
      """SELECT c_custkey, c_name, c_acctbal AS c_bal
        |FROM customer
        |ORDER BY c_custkey, c_name, c_bal""".stripMargin,

    // XML round-trip: the oracle scans the ORIGINAL table — any
    // writer/reader (escaping, typing) drift fails the hash
    "sink_roundtrip_xml" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    "sink_append_audit_log" ->
      """SELECT event_id,
        |  CAST(json_object('x-ratelimit-remaining', CAST(event_id AS VARCHAR))
        |    AS VARCHAR) AS audit
        |FROM events
        |ORDER BY event_id""".stripMargin,

    // The DSv2 census fixture is a closed-form function of
    // (state fips, tract index) — see graft.sources.CensusFixture —
    // so the oracle rebuilds the relation from range() like
    // census_states does.
    "scan_census_dsv2" ->
      """SELECT 'Census Tract ' || CAST(t.idx AS VARCHAR) || ', State ' || s.fips
        |    AS "NAME",
        |  CAST(s.id * 100 + t.idx AS VARCHAR) AS "DP02_0001E",
        |  s.fips AS state, t.tr AS tract
        |FROM (SELECT range AS id, printf('%02d', range) AS fips
        |      FROM range(1, 57) WHERE range NOT IN (3, 7, 14, 43, 52)) s
        |CROSS JOIN (VALUES (1, '000100'), (2, '000200')) t(idx, tr)
        |WHERE s.fips IN ('06', '36', '48')
        |ORDER BY state, tract""".stripMargin,

    // A28 runtime filtering must be value-transparent: the dim is
    // query-defined (active: 06 west, 36 east; 48 inactive) and every
    // census state carries exactly 2 tracts
    "scan_census_runtime_filter" ->
      """SELECT * FROM (VALUES
        |  ('06', 'west', CAST(2 AS BIGINT)),
        |  ('36', 'east', CAST(2 AS BIGINT))
        |) t(state, d_region, n_tracts)
        |ORDER BY state""".stripMargin,

    // A27 TopN pushdown must be value-transparent: the oracle is the
    // closed-form fixture's first page
    "scan_census_topn_pushdown" ->
      """SELECT s.fips AS state, t.tr AS tract,
        |  'Census Tract ' || CAST(t.idx AS VARCHAR) || ', State ' || s.fips
        |    AS "NAME"
        |FROM (SELECT range AS id, printf('%02d', range) AS fips
        |      FROM range(1, 57) WHERE range NOT IN (3, 7, 14, 43, 52)) s
        |CROSS JOIN (VALUES (1, '000100'), (2, '000200')) t(idx, tr)
        |ORDER BY state, tract
        |LIMIT 10""".stripMargin,

    // A26 aggregate pushdown must be value-transparent: the oracle
    // rebuilds the per-state tally from the closed-form fixture
    // (every census state carries exactly 2 tracts)
    "scan_census_agg_pushdown" ->
      """SELECT printf('%02d', range) AS state, CAST(2 AS BIGINT) AS n_tracts
        |FROM range(1, 57) WHERE range NOT IN (3, 7, 14, 43, 52)
        |ORDER BY state""".stripMargin,

    // PERMISSIVE ingest: the 3 malformed lines are a fixed constant of
    // the query; the good-row stats come from the original table
    "scan_corrupt_tolerant" ->
      """SELECT count(*) AS n_good,
        |  CAST(3 AS BIGINT) AS n_corrupt,
        |  CAST(sum(r_regionkey) AS BIGINT) AS key_checksum
        |FROM region""".stripMargin,

    // schema evolution must be value-transparent: the merged read of
    // two file generations equals an explicit NULL-filled union
    "scan_schema_evolution" ->
      """SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal
        |FROM customer
        |UNION ALL
        |SELECT c_custkey + 1000000, c_name, c_acctbal FROM customer
        |ORDER BY c_custkey""".stripMargin,

    // partition pruning must be value-transparent: the oracle computes
    // the same aggregate from the UNPARTITIONED original, so a row
    // leaking in from an unpruned partition fails the hash
    "sink_partitioned_prune" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders,
         |  ${dbl(s"sum(${dec("o_totalprice")})")} AS total_price
         |FROM orders
         |WHERE year(o_orderdate) = 1997
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    // D27 Pareto/ABC: per-line cents rounded ONCE (identical IEEE
    // product both engines), class cuts are integer cross-multiplies —
    // no float threshold; one double division finalizes the share
    // D30 chi-square independence: exact integer contingency; each
    // (obs-exp)^2/exp term is IEEE ops on identical inputs, rounded
    // 9 dp and DECIMAL-summed (text_entropy discipline). DuckDB
    // SUM(BIGINT) is HUGEINT — cast margins/totals before the output.
    "agg_chi_square" ->
      """WITH obs AS (
        |  SELECT c_mktsegment AS seg, o_orderpriority AS pri,
        |    COUNT(*) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2
        |), rt AS (SELECT seg, SUM(o) AS r FROM obs GROUP BY seg),
        |ct AS (SELECT pri, SUM(o) AS c FROM obs GROUP BY pri),
        |g AS (SELECT SUM(o) AS n, COUNT(DISTINCT seg) AS n_seg,
        |        COUNT(DISTINCT pri) AS n_pri FROM obs),
        |terms AS (
        |  SELECT CAST(round(
        |      (obs.o - (rt.r * ct.c) / CAST(g.n AS DOUBLE)) *
        |      (obs.o - (rt.r * ct.c) / CAST(g.n AS DOUBLE)) /
        |      ((rt.r * ct.c) / CAST(g.n AS DOUBLE)), 9)
        |    AS DECIMAL(28,9)) AS term,
        |    g.n, g.n_seg, g.n_pri
        |  FROM obs
        |  JOIN rt ON obs.seg = rt.seg
        |  JOIN ct ON obs.pri = ct.pri
        |  CROSS JOIN g
        |), s AS (
        |  SELECT n, n_seg, n_pri,
        |    round(CAST(SUM(term) AS DOUBLE), 6) AS chi2
        |  FROM terms GROUP BY n, n_seg, n_pri
        |)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST((n_seg - 1) * (n_pri - 1) AS BIGINT) AS dof, chi2,
        |  round(sqrt(chi2 /
        |    CAST(n * LEAST(n_seg - 1, n_pri - 1) AS DOUBLE)), 6)
        |    AS cramers_v
        |FROM s""".stripMargin,

    // A39 clustered rewrite: pruned band reads are value-transparent,
    // so the oracle recomputes the band from raw orders
    "warehouse_zorder_rewrite" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS cents_sum,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |FROM orders
        |WHERE o_custkey BETWEEN 10 AND 60""".stripMargin,

    // A44 multi-key zone-map pruning is value-transparent: the exact
    // band predicates still apply after the dir skip, so the oracle
    // recomputes each band straight from raw orders
    "warehouse_zorder_prune" ->
      """SELECT band, n_orders, cents_sum, n_cust FROM (
        |  SELECT 'custkey_10_60' AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS cents_sum,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |  FROM orders WHERE o_custkey BETWEEN 10 AND 60
        |  UNION ALL
        |  SELECT 'price_1m_5m_cents' AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS cents_sum,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |  FROM orders
        |  WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |    BETWEEN 1000000 AND 5000000
        |) ORDER BY band""".stripMargin,

    // A41 vacuum dry-run: keepLast=2 drops exactly v1's manifest and
    // reclaims exactly the planted orphan; the content row reads the
    // untouched store (v3 = the %3==2 slice)
    "warehouse_vacuum_plan" ->
      """SELECT CAST(1 AS INT) AS n_drop, CAST(1 AS INT) AS n_orphans,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum
        |FROM customer
        |WHERE c_custkey % 3 = 2""".stripMargin,

    // A40 CHECK constraints: the bill recomputes from the same dirt
    // expressions; store_rows = both clean batches (the dirty one is
    // atomically rejected). NULL check results count as violations in
    // both engines (CASE ... THEN 0 ELSE 1).
    "warehouse_constraints" ->
      """WITH dirty AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 1 THEN c_acctbal - 20000.0
        |         ELSE c_acctbal END AS bal,
        |    CASE WHEN c_custkey % 10 = 3 THEN NULL
        |         ELSE c_name END AS name,
        |    CASE WHEN c_custkey % 10 = 5 THEN 'UNKNOWN_SEG'
        |         ELSE c_mktsegment END AS seg
        |  FROM customer WHERE c_custkey % 2 = 1
        |), bill AS (
        |  SELECT 'acctbal_above_floor' AS rule,
        |    CAST(SUM(CASE WHEN bal >= -1000.0 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_violations
        |  FROM dirty
        |  UNION ALL
        |  SELECT 'name_not_null',
        |    CAST(SUM(CASE WHEN name IS NOT NULL THEN 0 ELSE 1 END)
        |      AS BIGINT)
        |  FROM dirty
        |  UNION ALL
        |  SELECT 'segment_in_domain',
        |    CAST(SUM(CASE WHEN seg IN ('AUTOMOBILE', 'BUILDING',
        |      'FURNITURE', 'HOUSEHOLD', 'MACHINERY')
        |      THEN 0 ELSE 1 END) AS BIGINT)
        |  FROM dirty
        |), sr AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS store_rows
        |  FROM customer WHERE c_custkey % 2 = 0
        |)
        |SELECT rule, n_violations, store_rows FROM bill, sr
        |ORDER BY rule""".stripMargin,

    // F14 clustering metric: arrival (orderkey mod 32) vs Z-order
    // (the F10 file rule) zone overlap depth — the shared Morton CTE
    "layout_cluster_metric" ->
      s"""WITH $mortonZCtes, za AS (
         |  SELECT 'arrival' AS layout, l_orderkey % 32 AS fid,
         |    MIN(l_partkey) AS mn, MAX(l_partkey) AS mx
         |  FROM lineitem GROUP BY l_orderkey % 32
         |), zz AS (
         |  SELECT 'zorder' AS layout, z >> 16 AS fid,
         |    MIN(l_partkey) AS mn, MAX(l_partkey) AS mx
         |  FROM z GROUP BY z >> 16
         |), zones AS (
         |  SELECT * FROM za UNION ALL SELECT * FROM zz
         |), pairs AS (
         |  SELECT a.layout, CAST(COUNT(*) AS BIGINT) AS n_overlaps
         |  FROM zones a JOIN zones b
         |    ON a.layout = b.layout AND a.mx >= b.mn AND a.mn <= b.mx
         |  GROUP BY a.layout
         |)
         |SELECT z1.layout, CAST(COUNT(*) AS BIGINT) AS n_files,
         |  CAST(SUM(z1.mx - z1.mn) AS BIGINT) AS span_sum,
         |  round(CAST(MAX(p.n_overlaps) AS DOUBLE) /
         |    CAST(COUNT(*) AS DOUBLE), 6) AS avg_overlap
         |FROM zones z1 JOIN pairs p ON z1.layout = p.layout
         |GROUP BY z1.layout
         |ORDER BY z1.layout""".stripMargin,

    // D31 KS test: exact integer cross-multiply numerator over the
    // pooled value-type table; HUGEINT here mirrors Spark's DECIMAL(38)
    "agg_ks_test" ->
      """WITH o AS (
        |  SELECT o_orderstatus AS s, o_totalprice AS v
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')
        |), byv AS (
        |  SELECT v,
        |    SUM(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS af,
        |    SUM(CASE WHEN s = 'O' THEN 1 ELSE 0 END) AS ao
        |  FROM o GROUP BY v
        |), cum AS (
        |  SELECT v,
        |    SUM(af) OVER (ORDER BY v) AS cf,
        |    SUM(ao) OVER (ORDER BY v) AS co
        |  FROM byv
        |), tot AS (
        |  SELECT SUM(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS nf,
        |    SUM(CASE WHEN s = 'O' THEN 1 ELSE 0 END) AS no
        |  FROM o
        |)
        |SELECT CAST(nf AS BIGINT) AS n_f, CAST(no AS BIGINT) AS n_o,
        |  CAST(MAX(ABS(cf * no - co * nf)) AS BIGINT) AS d_num,
        |  round(CAST(MAX(ABS(cf * no - co * nf)) AS DOUBLE) /
        |    (CAST(nf AS DOUBLE) * CAST(no AS DOUBLE)), 9) AS ks
        |FROM cum, tot GROUP BY nf, no""".stripMargin,

    // D33 Welch t: exact per-class moments (DECIMAL sums of (14,2)
    // values and their squares), one fixed IEEE expression tree
    "agg_welch_ttest" ->
      """WITH m AS (
        |  SELECT
        |    SUM(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS nf0,
        |    CAST(SUM(CASE WHEN s = 'F' THEN v END) AS DOUBLE) AS sxf,
        |    CAST(SUM(CASE WHEN s = 'F' THEN v * v END) AS DOUBLE) AS sxxf,
        |    SUM(CASE WHEN s = 'O' THEN 1 ELSE 0 END) AS no0,
        |    CAST(SUM(CASE WHEN s = 'O' THEN v END) AS DOUBLE) AS sxo,
        |    CAST(SUM(CASE WHEN s = 'O' THEN v * v END) AS DOUBLE) AS sxxo
        |  FROM (SELECT o_orderstatus AS s,
        |          CAST(o_totalprice AS DECIMAL(14,2)) AS v
        |        FROM orders WHERE o_orderstatus IN ('F', 'O'))
        |), d AS (
        |  SELECT nf0, no0,
        |    CAST(nf0 AS DOUBLE) AS nf, CAST(no0 AS DOUBLE) AS no,
        |    sxf, sxxf, sxo, sxxo
        |  FROM m
        |), e AS (
        |  SELECT nf0, no0, nf, no, sxf / nf AS mf, sxo / no AS mo,
        |    ((sxxf - sxf * sxf / nf) / (nf - 1)) / nf AS sef,
        |    ((sxxo - sxo * sxo / no) / (no - 1)) / no AS seo
        |  FROM d
        |)
        |SELECT CAST(nf0 AS BIGINT) AS n_f, CAST(no0 AS BIGINT) AS n_o,
        |  round(mf, 6) AS mean_f, round(mo, 6) AS mean_o,
        |  round((mf - mo) / sqrt(sef + seo), 6) AS t_stat,
        |  round((sef + seo) * (sef + seo) /
        |    (sef * sef / (nf - 1) + seo * seo / (no - 1)), 4) AS df_welch
        |FROM e""".stripMargin,

    // D35 Mann-Whitney U: tie-corrected average ranks as doubled-rank
    // integers (HUGEINT mirror of Spark's DECIMAL(38))
    "agg_mann_whitney" ->
      """WITH o AS (
        |  SELECT o_orderstatus AS s, o_totalprice AS v
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')
        |), byv AS (
        |  SELECT v,
        |    SUM(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS af,
        |    SUM(CASE WHEN s = 'O' THEN 1 ELSE 0 END) AS ao
        |  FROM o GROUP BY v
        |), cum AS (
        |  SELECT af, ao,
        |    SUM(af + ao) OVER (ORDER BY v) - af - ao AS cbefore
        |  FROM byv
        |), tot AS (
        |  SELECT SUM(CASE WHEN s = 'F' THEN 1 ELSE 0 END) AS nf,
        |    SUM(CASE WHEN s = 'O' THEN 1 ELSE 0 END) AS no
        |  FROM o
        |), r AS (
        |  SELECT nf, no,
        |    SUM(CAST(af AS HUGEINT) * (2 * cbefore + af + ao + 1)) AS r2f
        |  FROM cum, tot GROUP BY nf, no
        |)
        |SELECT CAST(nf AS BIGINT) AS n_f, CAST(no AS BIGINT) AS n_o,
        |  round(CAST(r2f - CAST(nf AS HUGEINT) * (nf + 1) AS DOUBLE)
        |    / 2.0, 2) AS u_stat,
        |  round(CAST(r2f - CAST(nf AS HUGEINT) * (nf + 1) AS DOUBLE)
        |    / 2.0 / (CAST(nf AS DOUBLE) * CAST(no AS DOUBLE)), 9) AS auc
        |FROM r""".stripMargin,

    // D36 Benford: first digit from the integer-cents STRING (no
    // float log in the bucketing); expected shares are shared literals
    "agg_benford" ->
      """WITH b AS (
        |  SELECT digit, CAST(benford AS DOUBLE) AS benford
        |  FROM (VALUES (1, 0.30103), (2, 0.176091), (3, 0.124939),
        |    (4, 0.09691), (5, 0.079181), (6, 0.066947), (7, 0.057992),
        |    (8, 0.051153), (9, 0.045757)) t(digit, benford)
        |), d AS (
        |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders
        |), g AS (
        |  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
        |), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
        |SELECT g.digit, g.n,
        |  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
        |  b.benford,
        |  round(abs(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - b.benford),
        |    6) AS abs_dev
        |FROM g JOIN b USING (digit) CROSS JOIN tot
        |ORDER BY digit""".stripMargin,

    // D32 Gini: exact DECIMAL spend sums + integer ranks; one final
    // IEEE division
    "agg_gini" ->
      """WITH spend AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS x
        |  FROM orders GROUP BY o_custkey
        |), ranked AS (
        |  SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x, o_custkey)
        |    AS BIGINT) AS i
        |  FROM spend
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  CAST(SUM(x) AS DOUBLE) AS total_spend,
        |  round(CAST(2 * SUM(x * i) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
        |    / CAST(COUNT(*) * SUM(x) AS DOUBLE), 9) AS gini
        |FROM ranked""".stripMargin,

    "agg_pareto_abc" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100,
        |      0) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem GROUP BY l_partkey
        |), ranked AS (
        |  SELECT l_partkey, rev_cents,
        |    CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM rev
        |), tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total FROM rev),
        |classed AS (
        |  SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
        |              WHEN cum * 20 <= total * 19 THEN 'B'
        |              ELSE 'C' END AS abc,
        |    rev_cents, total
        |  FROM ranked, tot
        |)
        |SELECT abc, count(*) AS n_parts,
        |  CAST(SUM(rev_cents) AS BIGINT) AS class_cents,
        |  CAST(SUM(rev_cents) AS DOUBLE) / CAST(MAX(total) AS DOUBLE)
        |    AS rev_share
        |FROM classed GROUP BY abc
        |ORDER BY abc""".stripMargin,

    // A38 incremental view maintenance: the oracle is the DIRECT
    // one-shot aggregate — hash equality proves partial-merge ≡
    // recompute
    "warehouse_incremental_agg" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS sum_cents
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // A43 schema evolution: pre-evolution rows (even keys) read the
    // added column as NULL → 'legacy'; post-evolution rows carry the
    // committed tier rule
    "warehouse_schema_add_col" ->
      """SELECT CASE WHEN c_custkey % 2 = 0 THEN 'legacy'
        |            WHEN c_acctbal >= 5000 THEN 'gold'
        |            ELSE 'std' END AS tier,
        |  COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS bal_cents
        |FROM customer
        |GROUP BY 1
        |ORDER BY tier""".stripMargin,

    // A42 retraction path: the one-shot aggregate over (initial \
    // deleted) — hash equality proves the engine's incremental
    // COUNT/SUM retraction + dirty-group MIN/MAX recompute correct
    "warehouse_incremental_agg_del" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(SUM(tc) AS BIGINT) AS sum_cents,
        |  MIN(tc) AS min_cents, MAX(tc) AS max_cents
        |FROM (SELECT o_orderpriority, o_orderkey,
        |        CAST(round(o_totalprice * 100, 0) AS BIGINT) AS tc
        |      FROM orders)
        |WHERE o_orderkey % 3 <> 0 AND o_orderkey % 7 <> 0
        |GROUP BY o_orderpriority
        |HAVING count(*) > 0
        |ORDER BY o_orderpriority""".stripMargin,

    // A37 multi-path scoped read: path scoping must be
    // value-transparent — the oracle filters the base table
    "scan_glob_paths" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority,
         |  count(*) AS n_orders,
         |  ${dbl(s"sum(${dec("o_totalprice")})")} AS total_price
         |FROM orders
         |WHERE year(o_orderdate) IN (1996, 1997)
         |GROUP BY 1, 2
         |ORDER BY yr, o_orderpriority""".stripMargin,

    // A35 dynamic partition overwrite: the oracle IS the merge
    // semantics — untouched years from the original landing, 1997
    // from the revised batch (doubling is exact in IEEE)
    "sink_dynamic_overwrite" ->
      s"""WITH base AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_totalprice
         |  FROM orders
         |), final AS (
         |  SELECT yr, o_totalprice FROM base WHERE yr <> 1997
         |  UNION ALL
         |  SELECT yr, o_totalprice * 2 AS o_totalprice
         |  FROM base WHERE yr = 1997
         |)
         |SELECT yr, count(*) AS n_orders,
         |  ${dbl(s"sum(${dec("o_totalprice")})")} AS total_price
         |FROM final GROUP BY yr
         |ORDER BY yr""".stripMargin,

    // A24 expectations: identical deterministic dirt synthesis, one
    // aggregation with FILTER-clause rule counts
    "scan_expectations" ->
      """WITH dirty AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 97 = 0 THEN NULL
        |         ELSE o_orderstatus END AS st,
        |    CASE WHEN o_orderkey % 89 = 0 THEN -o_totalprice
        |         ELSE o_totalprice END AS tp,
        |    CASE WHEN o_orderkey % 83 = 0 THEN '9-BOGUS'
        |         ELSE o_orderpriority END AS pr
        |  FROM orders
        |), d2 AS (
        |  SELECT * FROM dirty
        |  UNION ALL SELECT * FROM dirty WHERE o_orderkey % 101 = 0
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) FILTER (WHERE st IS NULL) AS BIGINT)
        |    AS n_null_status,
        |  CAST(count(*) FILTER (WHERE tp < 0 OR tp > 1000000) AS BIGINT)
        |    AS n_price_oob,
        |  CAST(count(*) FILTER (WHERE NOT regexp_matches(pr, '^[1-5]-'))
        |    AS BIGINT) AS n_bad_priority,
        |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |    AS n_dup_keys,
        |  count(*) FILTER (WHERE st IS NULL) * 50 < count(*) AS status_ok
        |FROM d2""".stripMargin,

    // A29 WAP: both staged views and the published table recomputed
    // from the base table — 'published' MUST equal the clean staged
    // view (the bad batch never leaked past its audit)
    "warehouse_wap" ->
      """WITH v1 AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 0
        |), bad AS (
        |  SELECT -abs(c_acctbal) - 2000 AS c_acctbal
        |  FROM customer WHERE c_custkey % 10 = 5
        |), good AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 5
        |), s1 AS (
        |  SELECT * FROM v1 UNION ALL SELECT * FROM bad
        |), s2 AS (
        |  SELECT * FROM v1 UNION ALL SELECT * FROM good
        |)
        |SELECT 'audit_1_rejected' AS phase,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS cents_sum,
        |  CAST(count(*) FILTER (WHERE c_acctbal < -1000) AS BIGINT)
        |    AS n_violations
        |FROM s1
        |UNION ALL
        |SELECT 'audit_2_passed', CAST(count(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE c_acctbal < -1000) AS BIGINT)
        |FROM s2
        |UNION ALL
        |SELECT 'published', CAST(count(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE c_acctbal < -1000) AS BIGINT)
        |FROM s2
        |ORDER BY phase""".stripMargin,

    // A25 snapshot OPTIMIZE: version contents recomputed from the base
    // table (v5 must be bit-identical to v4 — OPTIMIZE changes layout,
    // never content); file counts are deterministic by construction
    "snapshot_optimize" ->
      """WITH t AS (
        |  SELECT c_custkey % 10 AS m,
        |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
        |  FROM customer
        |), v(version, nf) AS (
        |  VALUES (1, 1), (2, 2), (3, 3), (4, 4), (5, 2)
        |), k(version, mm) AS (
        |  VALUES (1, 0),
        |    (2, 0), (2, 5),
        |    (3, 0), (3, 5), (3, 7),
        |    (4, 0), (4, 5), (4, 7), (4, 3),
        |    (5, 0), (5, 5), (5, 7), (5, 3)
        |)
        |SELECT k.version, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(t.cents) AS BIGINT) AS cents_sum,
        |  CAST(MIN(v.nf) AS BIGINT) AS n_files
        |FROM k JOIN t ON t.m = k.mm JOIN v ON v.version = k.version
        |GROUP BY k.version
        |ORDER BY k.version""".stripMargin,

    // A23 _metadata introspection: the deterministic one-file-per-year
    // layout makes the file-level facts recomputable from the base
    // table (n_files = 1, row_index spans [0, n_rows))
    "scan_metadata_files" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  count(*) AS n_rows,
        |  CAST(1 AS BIGINT) AS n_files,
        |  CAST(count(*) - 1 AS BIGINT) AS max_row_index
        |FROM orders
        |GROUP BY 1
        |ORDER BY o_year""".stripMargin,

    // C22 LATERAL top-k: literal SQL in both engines (spark.sql runs
    // this exact text); inner and outer ORDER BYs fully tie-broken
    "sql_lateral_topk" ->
      """SELECT n_name, t.c_name, t.bal_cents
        |FROM nation,
        |LATERAL (
        |  SELECT c_name, CAST(round(c_acctbal * 100, 0) AS BIGINT)
        |    AS bal_cents
        |  FROM customer WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        |) t
        |ORDER BY n_name, bal_cents DESC, c_name""".stripMargin,

    // H16 timezone: DuckDB ICU double-hop localization; the offset is
    // integer epoch subtraction (fractions cancel before division)
    "fn_timezone" ->
      """WITH b AS (
        |  SELECT event_id, ts,
        |    (ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS ny,
        |    (ts AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo' AS tky
        |  FROM events
        |)
        |SELECT event_id, CAST(ny AS DATE) AS ny_date,
        |  CAST(EXTRACT(hour FROM ny) AS INT) AS ny_hour,
        |  CAST(EXTRACT(hour FROM tky) AS INT) AS tokyo_hour,
        |  CAST((CAST(floor(EXTRACT(epoch FROM ny)) AS BIGINT)
        |      - CAST(floor(EXTRACT(epoch FROM ts)) AS BIGINT)) / 60 AS INT)
        |    AS ny_offset_min
        |FROM b
        |ORDER BY event_id""".stripMargin,

    // C21 null-safe join: IS NOT DISTINCT FROM joins the planted
    // NULL keys onto the UNKNOWN dimension row instead of dropping
    // them (a plain equi join loses every 10th customer here)
    "join_null_safe" ->
      s"""WITH cust AS (
         |  SELECT c_custkey,
         |    CASE WHEN c_custkey % 10 = 0 THEN NULL
         |         ELSE c_nationkey END AS nkey,
         |    c_acctbal
         |  FROM customer
         |), dim AS (
         |  SELECT CAST(n_nationkey AS BIGINT) AS dkey, n_name FROM nation
         |  UNION ALL
         |  SELECT CAST(NULL AS BIGINT), 'UNKNOWN'
         |)
         |SELECT n_name, count(*) AS n_cust,
         |  ${dbl(s"sum(${dec("c_acctbal")})")} AS acctbal_sum
         |FROM cust JOIN dim ON nkey IS NOT DISTINCT FROM dkey
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin,

    // C19 dynamic partition pruning must be value-transparent: the
    // oracle computes the joined-and-pruned result directly (every
    // year ≥ 1997 survives the calendar-dim filter)
    "join_dynamic_prune" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |  count(*) AS n_orders,
         |  ${dbl(s"sum(${dec("o_totalprice")})")} AS total_price
         |FROM orders
         |WHERE year(o_orderdate) >= 1997
         |GROUP BY 1
         |ORDER BY o_year""".stripMargin,

    // bucketing must be value-transparent: the oracle joins the
    // original unbucketed tables
    "join_bucketed_colocated" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
         |  ${dbl(s"sum(${dec("l_extendedprice")})")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    // MERGE upsert (Warehouse.merge): FULL OUTER + existence switch —
    // matched rows take the update batch, unmatched updates insert,
    // untouched target rows survive. Update keys are never NULL here,
    // so u.c_custkey IS NOT NULL is the existence test.
    "warehouse_merge_upsert" ->
      """WITH tgt AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer
        |), upd AS (
        |  SELECT c_custkey, c_name, c_acctbal + 1000 AS c_acctbal
        |  FROM tgt WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name || '_new', c_acctbal
        |  FROM tgt WHERE c_custkey % 100 = 0
        |)
        |SELECT COALESCE(u.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END
        |    AS c_name,
        |  CAST(round(CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
        |    ELSE t.c_acctbal END * 100, 0) AS BIGINT) AS acctbal_cents
        |FROM tgt t FULL OUTER JOIN upd u ON t.c_custkey = u.c_custkey
        |ORDER BY c_custkey""".stripMargin,

    // time travel: each version's content recomputed from the base
    // table - the store must serve exact historical sets, not latest
    "warehouse_time_travel" ->
      """WITH v1 AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 0
        |), v2 AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 5
        |), v3 AS (
        |  SELECT c_acctbal + 1000 AS c_acctbal FROM customer
        |  WHERE c_custkey % 100 = 0
        |)
        |SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents_sum FROM v1
        |UNION ALL
        |SELECT 2, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) FROM v2
        |UNION ALL
        |SELECT 3, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) FROM v3
        |ORDER BY version""".stripMargin,

    // A36 tags: ref contents recomputed from the base table (audited
    // = v1, prod = v2, latest = v3); the engine side vacuums between
    // tagging and reading, so a hash match proves tag protection
    "warehouse_tags" ->
      """WITH v1 AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 0
        |), v2 AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 5
        |), v3 AS (
        |  SELECT c_acctbal + 1000 AS c_acctbal FROM customer
        |  WHERE c_custkey % 100 = 0
        |)
        |SELECT 'audited' AS ref, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents_sum FROM v1
        |UNION ALL
        |SELECT 'prod', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) FROM v2
        |UNION ALL
        |SELECT 'latest', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) FROM v3
        |ORDER BY ref""".stripMargin,

    // A22 snapshot change feed: both version contents recomputed from
    // the base table, diffed with the same FULL OUTER + op-case
    // composition the engine runs; unchanged rows filtered on the
    // exact integer-cents comparison.
    "warehouse_snapshot_diff" ->
      """WITH v1 AS (
        |  SELECT c_custkey, CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
        |  FROM customer WHERE c_custkey % 10 = 0
        |), v2 AS (
        |  SELECT c_custkey, CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
        |  FROM customer WHERE c_custkey % 10 IN (0, 5)
        |), v3 AS (
        |  SELECT c_custkey,
        |    CAST(round((c_acctbal + 1000) * 100, 0) AS BIGINT) AS cents
        |  FROM customer WHERE c_custkey % 100 = 0
        |), d12 AS (
        |  SELECT 1 AS from_v, 2 AS to_v,
        |    CASE WHEN a.c_custkey IS NULL THEN 'I'
        |         WHEN b.c_custkey IS NULL THEN 'D' ELSE 'U' END AS op,
        |    COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
        |    a.cents AS cents_before, b.cents AS cents_after
        |  FROM v1 a FULL JOIN v2 b ON a.c_custkey = b.c_custkey
        |), d23 AS (
        |  SELECT 2, 3,
        |    CASE WHEN a.c_custkey IS NULL THEN 'I'
        |         WHEN b.c_custkey IS NULL THEN 'D' ELSE 'U' END,
        |    COALESCE(a.c_custkey, b.c_custkey), a.cents, b.cents
        |  FROM v2 a FULL JOIN v3 b ON a.c_custkey = b.c_custkey
        |)
        |SELECT * FROM (SELECT * FROM d12 UNION ALL SELECT * FROM d23)
        |WHERE op <> 'U' OR cents_before <> cents_after
        |ORDER BY from_v, c_custkey""".stripMargin,

    // A21 observed scan: the CollectMetrics node is semantically
    // transparent — the oracle is the plain filtered projection; the
    // metric values themselves are pinned in ObserveSpec
    "scan_observed" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS tp_cents
        |FROM orders
        |WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey
        |LIMIT 500""".stripMargin,

    // A20 vacuum: keepLast=2 drops exactly the v1 manifest and
    // reclaims exactly the planted orphan dir (v1's data survives via
    // v2's append manifest); surviving versions must read back with
    // their exact historical content
    "snapshot_vacuum" ->
      """WITH v2 AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 5
        |), v3 AS (
        |  SELECT c_acctbal + 1000 AS c_acctbal FROM customer
        |  WHERE c_custkey % 100 = 0
        |)
        |SELECT 2 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents_sum,
        |  CAST(1 AS BIGINT) AS n_dropped_manifests,
        |  CAST(1 AS BIGINT) AS n_removed_dirs
        |FROM v2
        |UNION ALL
        |SELECT 3, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT),
        |  CAST(1 AS BIGINT), CAST(1 AS BIGINT) FROM v3
        |ORDER BY version""".stripMargin,

    // A30 merge-on-read delete: each version's content recomputed from
    // the base table — v1 pre-delete (time travel THROUGH a delete),
    // v2 minus the DV keys (merge-on-read subtraction), v3 with the
    // deleted keys RE-INSERTED at +1000 (the DV is scoped to data that
    // existed when the delete committed, so a later append revives the
    // key — the per-file lakehouse DV semantics)
    "warehouse_delete_mor" ->
      """WITH v1 AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 0
        |), v2 AS (
        |  SELECT c_acctbal FROM customer
        |  WHERE c_custkey % 10 = 0 AND c_custkey % 30 <> 0
        |), v3 AS (
        |  SELECT c_acctbal FROM v2
        |  UNION ALL
        |  SELECT c_acctbal + 1000 AS c_acctbal FROM customer
        |  WHERE c_custkey % 30 = 0
        |)
        |SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents_sum FROM v1
        |UNION ALL
        |SELECT 2, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) FROM v2
        |UNION ALL
        |SELECT 3, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) FROM v3
        |ORDER BY version""".stripMargin,

    // A34 merge-on-read upsert: v1 pre-upsert, v2 the SCD1 result
    // (updates supersede via the equality-delete DV, inserts land,
    // untouched rows survive), v3 an exact REPLAY of the same batch —
    // content must be unchanged (the CDC at-least-once posture)
    "warehouse_upsert_mor" ->
      """WITH v1 AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 0
        |), v2 AS (
        |  SELECT c_acctbal FROM customer
        |  WHERE c_custkey % 10 = 0 AND c_custkey % 20 <> 0
        |  UNION ALL
        |  SELECT c_acctbal + 1000 FROM customer WHERE c_custkey % 20 = 0
        |  UNION ALL
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 100 = 0
        |)
        |SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents_sum FROM v1
        |UNION ALL
        |SELECT 2, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) FROM v2
        |UNION ALL
        |SELECT 3, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) FROM v2
        |ORDER BY version""".stripMargin,

    // A33 zero-copy clone: each scope's content recomputed from the
    // base table — the clone-at-fork equals the source's pre-fork
    // content, and the two post-fork appends are mutually invisible
    "warehouse_clone" ->
      """WITH fork AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 IN (0, 5)
        |), clone_final AS (
        |  SELECT c_acctbal FROM fork
        |  UNION ALL
        |  SELECT c_acctbal + 1000 FROM customer WHERE c_custkey % 100 = 0
        |), source_final AS (
        |  SELECT c_acctbal FROM fork
        |  UNION ALL
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 3
        |)
        |SELECT 'clone_at_fork' AS scope, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents_sum FROM fork
        |UNION ALL
        |SELECT 'clone_final', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |FROM clone_final
        |UNION ALL
        |SELECT 'source_final', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |FROM source_final
        |ORDER BY scope""".stripMargin,

    // A31 zone-map pruned read: the oracle computes the answer from
    // the base table with no store at all — pruning must be value-
    // transparent; the dir counts are closed-form (4 disjoint
    // 25-wide k_bucket batches, [30,60] overlaps exactly 2)
    "warehouse_stats_prune" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents_sum,
        |  CAST(2 AS BIGINT) AS n_dirs_opened,
        |  CAST(4 AS BIGINT) AS n_dirs_total
        |FROM customer
        |WHERE c_custkey % 100 BETWEEN 30 AND 60""".stripMargin,

    // MERGE with deletes: matched 'D' removes the row, unmatched 'D'
    // is a no-op, 'U' behaves as the A6 upsert
    "warehouse_merge_delete" ->
      """WITH tgt AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer
        |), chg AS (
        |  SELECT c_custkey, c_name, c_acctbal + 1000 AS c_acctbal, 'U' AS op
        |  FROM tgt WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_acctbal, 'D' AS op
        |  FROM tgt WHERE c_custkey % 7 = 0 AND c_custkey % 10 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name || '_new', c_acctbal, 'U' AS op
        |  FROM tgt WHERE c_custkey % 100 = 0
        |  UNION ALL
        |  SELECT c_custkey + 2000000, c_name, c_acctbal, 'D' AS op
        |  FROM tgt WHERE c_custkey = 1
        |)
        |SELECT COALESCE(u.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END
        |    AS c_name,
        |  CAST(round(CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
        |    ELSE t.c_acctbal END * 100, 0) AS BIGINT) AS acctbal_cents
        |FROM tgt t FULL OUTER JOIN chg u ON t.c_custkey = u.c_custkey
        |WHERE u.op IS NULL OR u.op <> 'D'
        |ORDER BY c_custkey""".stripMargin,

    // SCD2 merge: history rows pass through; open rows close + reopen
    // when attrs changed, pass through when unchanged; fresh keys open.
    // The join leg mirrors the engine's single full-outer join over the
    // OPEN slice; the IS NOT DISTINCT FROM comparisons mirror the
    // null-safe attr equality of Warehouse.mergeScd2
    "warehouse_merge_scd2" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer
        |), tgt AS (
        |  SELECT c_custkey, c_name, c_acctbal - 500 AS c_acctbal,
        |    DATE '2023-01-01' AS valid_from, DATE '2024-01-01' AS valid_to
        |  FROM cust WHERE c_custkey % 20 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_acctbal,
        |    DATE '2024-01-01', CAST(NULL AS DATE)
        |  FROM cust
        |), upd AS (
        |  SELECT c_custkey, c_name, c_acctbal + 1000 AS c_acctbal
        |  FROM cust WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_acctbal
        |  FROM cust WHERE c_custkey % 7 = 0 AND c_custkey % 10 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name || '_new', c_acctbal
        |  FROM cust WHERE c_custkey % 100 = 0
        |), j AS (
        |  SELECT t.c_custkey AS tk, t.c_name AS tn, t.c_acctbal AS tb,
        |    t.valid_from AS tf, t.valid_to AS tt,
        |    u.c_custkey AS uk, u.c_name AS un, u.c_acctbal AS ub,
        |    (t.c_name IS NOT DISTINCT FROM u.c_name AND
        |     t.c_acctbal IS NOT DISTINCT FROM u.c_acctbal) AS same
        |  FROM (SELECT * FROM tgt WHERE valid_to IS NULL) t
        |  FULL OUTER JOIN upd u ON t.c_custkey = u.c_custkey
        |), merged AS (
        |  SELECT c_custkey, c_name, c_acctbal, valid_from, valid_to
        |  FROM tgt WHERE valid_to IS NOT NULL
        |  UNION ALL
        |  SELECT tk, tn, tb, tf, tt FROM j
        |  WHERE uk IS NULL OR (tk IS NOT NULL AND same)
        |  UNION ALL
        |  SELECT tk, tn, tb, tf, DATE '2025-06-01' FROM j
        |  WHERE tk IS NOT NULL AND uk IS NOT NULL AND NOT same
        |  UNION ALL
        |  SELECT uk, un, ub, DATE '2025-06-01', CAST(NULL AS DATE) FROM j
        |  WHERE uk IS NOT NULL AND (tk IS NULL OR NOT same)
        |)
        |SELECT c_custkey, c_name,
        |  CAST(round(c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents,
        |  valid_from, valid_to
        |FROM merged
        |ORDER BY c_custkey, valid_from""".stripMargin,

    // A19 SCD2 point-in-time read: the oracle constructs the expected
    // post-merge version timeline DIRECTLY (full 1995 history, 1998
    // open rows closed at 2000-06-01 for changed keys, new open
    // versions), so it proves mergeScd2's output AND the as-of join
    "warehouse_scd2_asof" ->
      """WITH cust AS (
        |  SELECT c_custkey FROM customer
        |), dim AS (
        |  SELECT c_custkey, DATE '1995-01-01' AS valid_from,
        |    DATE '1998-01-01' AS valid_to FROM cust
        |  UNION ALL
        |  SELECT c_custkey, DATE '1998-01-01', CAST(NULL AS DATE)
        |  FROM cust WHERE c_custkey % 10 <> 0
        |  UNION ALL
        |  SELECT c_custkey, DATE '1998-01-01', DATE '2000-06-01'
        |  FROM cust WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey, DATE '2000-06-01', CAST(NULL AS DATE)
        |  FROM cust WHERE c_custkey % 10 = 0
        |), facts AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS tpc
        |  FROM orders
        |)
        |SELECT d2.valid_from, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(COUNT(DISTINCT f.o_custkey) AS BIGINT) AS n_customers,
        |  CAST(SUM(f.tpc) AS BIGINT) AS revenue_cents
        |FROM facts f JOIN dim d2 ON f.o_custkey = d2.c_custkey
        |  AND f.d >= d2.valid_from
        |  AND (d2.valid_to IS NULL OR f.d < d2.valid_to)
        |GROUP BY d2.valid_from
        |ORDER BY d2.valid_from""".stripMargin,

    // ---------------- B: filters / projections ----------------
    "filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
        |  AND l_quantity < CAST(24.0 AS DOUBLE)
        |  AND l_returnflag IN ('A', 'R')
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag""".stripMargin,

    "filter_null_like" ->
      """SELECT p_partkey, p_name, p_brand
        |FROM part
        |WHERE p_name LIKE '%widget%' AND p_brand IS NOT NULL
        |ORDER BY p_partkey""".stripMargin,

    "project_compute" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${dbl(s"${dec("l_extendedprice")} * (1 - ${dec("l_discount")})")} AS disc_price,
         |  CAST(year(l_shipdate) AS INTEGER) AS ship_year
         |FROM lineitem
         |ORDER BY l_orderkey, l_linenumber, disc_price, ship_year""".stripMargin,

    "filter_subquery" ->
      """SELECT c_custkey, c_acctbal
        |FROM customer
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) *
        |      (SELECT COUNT(*) FROM customer)
        |    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "project_rename_norm" ->
      """SELECT c_custkey AS customer_id,
        |  replace(c_name, '#', '_') AS name_norm,
        |  upper(trim(c_mktsegment)) AS segment_norm
        |FROM customer
        |ORDER BY customer_id""".stripMargin,

    // ---------------- C: joins ----------------
    "join_broadcast_inner" ->
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,

    "join_shuffle_inner" ->
      s"""SELECT o_orderkey,
         |  ${dbl(s"SUM(${dec("l_extendedprice")} * (1 - ${dec("l_discount")}))")} AS revenue,
         |  COUNT(*) AS n_lines
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderkey
         |ORDER BY o_orderkey""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "join_full_outer" ->
      """SELECT s_suppkey, s_nationkey, c_custkey, c_nationkey
        |FROM supplier FULL JOIN customer ON s_nationkey = c_nationkey
        |ORDER BY s_suppkey ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin,

    // C45 scale-safe full outer: both sides aggregate FIRST (output is
    // key-space-bounded at any SF), then FULL OUTER on the aggregate
    // frames. floor(acctbal/1000) is one IEEE divide + floor in both
    // engines; cents sums CAST to BIGINT (DuckDB SUM(BIGINT) yields
    // HUGEINT → float64 fetch → hash mismatch otherwise).
    "join_full_outer_topk" ->
      """WITH s AS (
        |  SELECT s_nationkey AS snk,
        |    CAST(floor(s_acctbal / 1000) AS BIGINT) AS sband,
        |    COUNT(*) AS n_supp,
        |    CAST(SUM(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS supp_cents
        |  FROM supplier GROUP BY 1, 2
        |), c AS (
        |  SELECT c_nationkey AS cnk,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS cband,
        |    COUNT(*) AS n_cust,
        |    CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS cust_cents
        |  FROM customer GROUP BY 1, 2
        |)
        |SELECT COALESCE(s.snk, c.cnk) AS nationkey,
        |  COALESCE(s.sband, c.cband) AS band,
        |  s.n_supp, s.supp_cents, c.n_cust, c.cust_cents
        |FROM s FULL JOIN c ON s.snk = c.cnk AND s.sband = c.cband
        |ORDER BY COALESCE(s.supp_cents, 0) + COALESCE(c.cust_cents, 0) DESC,
        |  nationkey, band
        |LIMIT 50""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "join_theta" ->
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        |ORDER BY s_suppkey, c_custkey""".stripMargin,

    // the oracle states the question in its natural (quadratic) form;
    // the engine answers it from running windows without pair fan-out
    "join_theta_agg" ->
      """SELECT n_name,
        |  count(*)::BIGINT AS n_pairs,
        |  min(s_acctbal - c_acctbal) AS min_gap,
        |  max(s_acctbal - c_acctbal) AS max_gap
        |FROM supplier
        |JOIN customer
        |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        |JOIN nation ON n_nationkey = s_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "join_range_interval" ->
      """SELECT e1.event_id AS view_id, e2.event_id AS click_id,
        |  epoch_us(e2.ts) - epoch_us(e1.ts) AS gap_us
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e2.ts >= e1.ts AND e2.ts < e1.ts + INTERVAL 5 MINUTE
        |WHERE e1.event_type = 'view' AND e2.event_type = 'click'
        |ORDER BY view_id, click_id""".stripMargin,

    // C16: identical band semantics through the native RangeJoinExec
    // sliding-window merge — SAME oracle as C9, so the two
    // implementations are pinned to the same truth
    "join_range_native" ->
      """SELECT e1.event_id AS view_id, e2.event_id AS click_id,
        |  epoch_us(e2.ts) - epoch_us(e1.ts) AS gap_us
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e2.ts >= e1.ts AND e2.ts < e1.ts + INTERVAL 5 MINUTE
        |WHERE e1.event_type = 'view' AND e2.event_type = 'click'
        |ORDER BY view_id, click_id""".stripMargin,

    "join_asof" ->
      """WITH w AS (
        |  SELECT event_id, user_id, event_type,
        |    lag(event_id) OVER win AS prev_event_id,
        |    lag(event_type) OVER win AS prev_event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER win AS gap_us
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT event_id, user_id, prev_event_id, prev_event_type, gap_us
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    // the native-operator path (graft.plans.AsOfJoin) computes the SAME
    // as-of semantics as the C10 window trick — one oracle, two engine
    // implementations, both must match it
    "join_asof_native" ->
      """WITH w AS (
        |  SELECT event_id, user_id, event_type,
        |    lag(event_id) OVER win AS prev_event_id,
        |    lag(event_type) OVER win AS prev_event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER win AS gap_us
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT event_id, user_id, prev_event_id, prev_event_type, gap_us
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    // the ONE SQL text both engines execute verbatim (Spark runs this
    // exact string via spark.sql over same-named temp views) — keep it
    // in the ANSI subset both dialects share
    "sql_tpch_q3" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS o_odate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    // H13 collation: UTF8_LCASE grouping mirrored by GROUP BY lower()
    // (equivalent on the ASCII brand domain); canon = binary MIN
    "fn_collation" ->
      """WITH v AS (
        |  SELECT p_brand AS b FROM part
        |  UNION ALL SELECT upper(p_brand) FROM part
        |  UNION ALL SELECT lower(p_brand) FROM part
        |)
        |SELECT MIN(b) AS canon, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT b) AS BIGINT) AS n_forms
        |FROM v GROUP BY lower(b)
        |ORDER BY canon""".stripMargin,

    // H15 try_* arithmetic: TRY_CAST and out-of-bounds list indexing
    // mirror try_cast/try_element_at; the BIGINT overflow is
    // analytically known (odd keys overflow). The zero-divisor arm is
    // an EXPLICIT CASE-to-NULL, not DuckDB's native divide-to-NULL:
    // DuckDB's ieee_floating_point_ops setting (default true from
    // 1.3+) makes x/0.0 return inf/nan instead of NULL, so relying on
    // the native behavior would silently flip this column under a
    // DuckDB upgrade in the oracle harness (round-14 advice) — the
    // NULL-on-zero contract is spelled in the SQL.
    "fn_try_arith" ->
      """WITH b AS (
        |  SELECT o_orderkey, o_orderkey % 5 AS d,
        |    (CASE WHEN o_orderkey % 3 = 0 THEN 'x' ELSE '' END) ||
        |      CAST(o_orderkey % 100 AS VARCHAR) AS s
        |  FROM orders
        |)
        |SELECT o_orderkey,
        |  CASE WHEN d = 0 THEN NULL
        |    ELSE CAST(o_orderkey AS DOUBLE) / CAST(d AS DOUBLE) END AS q,
        |  TRY_CAST(s AS INTEGER) AS n,
        |  CASE WHEN o_orderkey % 101 = 0 AND o_orderkey % 2 = 0
        |    THEN 9223372036854775807 END AS ov,
        |  string_split(s, 'x')[2] AS second_part
        |FROM b
        |ORDER BY o_orderkey""".stripMargin,

    // H14 SQL UDF: the engine declares graft_disc_price as a SQL UDF
    // and Catalyst inlines it; the oracle inlines the body by hand —
    // the two must be semantically identical
    "fn_sql_udf" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // K64 canonical-URL dedup: identical synthesis + canonicalization
    // semantics, DuckDB dialect (regexp_replace needs the 'g' flag —
    // it replaces FIRST match only by default, unlike Spark; the
    // scheme+host slice is a list[1:3] join where Spark uses
    // substring_index — equal results, different functions)
    "dedup_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.Site'
        |          ELSE 'https://www.site' END)
        |    || CAST(doc_id % 5 AS VARCHAR) || '.example.org/p/'
        |    || CAST(doc_id % 200 AS VARCHAR)
        |    || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
        |    || (CASE WHEN doc_id % 7 = 0 THEN '?utm_source=feed&utm_campaign=x'
        |             WHEN doc_id % 11 = 0 THEN '?ref=home&utm_medium=cpc'
        |             ELSE '' END)
        |    || (CASE WHEN doc_id % 13 = 0 THEN '#section-2' ELSE '' END) AS raw
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, raw,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(raw, '#.*', '', 'g'), 'utm_[^&#]*', '', 'g'),
        |      '\?&+', '?', 'g'), '&&+', '&', 'g'), '[?&]+$', '', 'g') AS u5
        |  FROM u
        |), t2 AS (
        |  SELECT doc_id, raw,
        |    regexp_replace(regexp_replace(u5, '/+\?', '?', 'g'),
        |      '/$', '', 'g') AS u7
        |  FROM s
        |), c AS (
        |  SELECT doc_id, raw,
        |    lower(array_to_string(string_split(u7, '/')[1:3], '/'))
        |      || substr(u7,
        |           length(array_to_string(string_split(u7, '/')[1:3], '/')) + 1)
        |      AS canonical_url
        |  FROM t2
        |)
        |SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT raw) AS BIGINT) AS n_variants,
        |  MIN(doc_id) AS keep_doc_id
        |FROM c GROUP BY canonical_url
        |ORDER BY canonical_url""".stripMargin,

    // C28 pipe syntax: the oracle is the CLASSIC formulation of the
    // piped pipeline — result equality is the lowering check
    "sql_pipe_syntax" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |  CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100,
        |    0) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // C24 TPC-H Q4-shaped EXISTS: literal SQL in both engines;
    // lateness derived from shipdate (fixture has no commit/receipt
    // dates); the EXISTS must decorrelate to a left-semi on orderkey
    "sql_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
        |  AND EXISTS (
        |    SELECT * FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // C25 TPC-H Q13-shaped outer-count distribution: the priority
    // filter lives in the JOIN ON clause (WHERE would turn the outer
    // join inner and lose the zero-order bucket); count(o_orderkey)
    // ignores NULLs so unmatched customers count 0
    "sql_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey
        |    AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // C26 TPC-H Q21-shaped sole-late-supplier: EXISTS + NOT EXISTS
    // over the same fact (l2 semi, l3 anti, both keyed l_orderkey);
    // the NOT EXISTS arm also correlates on the outer o_orderdate
    "sql_tpch_q21" ->
      """SELECT n_name, s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (
        |    SELECT * FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT * FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY n_name, s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,

    // C29: pure-scan aggregate — every predicate pushable, one row out.
    "sql_tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |                CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    // C30: eight-relation snowflake; share-of-total from one aggregate.
    // Ratio is the lone float step — rounded at 9 places; numerator
    // COALESCEd after the DOUBLE cast so a NATION_3-free year is 0.0
    // in both engines rather than engine-typed NULL arithmetic.
    "sql_tpch_q8" ->
      """SELECT o_year,
        |  ROUND(COALESCE(CAST(SUM(CASE WHEN nation = 'NATION_3'
        |                               THEN volume END) AS DOUBLE), 0.0) /
        |        CAST(SUM(volume) AS DOUBLE), 9) AS mkt_share
        |FROM (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume,
        |    n2.n_name AS nation
        |  FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |    AND p_type = 'PROMO'
        |) all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,

    // C31: wide-key groupBy + deterministic top-20 page.
    "sql_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |    AS revenue,
        |  c_acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    // C32: single-pass conditional share-of-total (promo / all).
    "sql_tpch_q14" ->
      """SELECT ROUND(100.0 *
        |  COALESCE(CAST(SUM(CASE WHEN p_type = 'PROMO'
        |                         THEN volume END) AS DOUBLE), 0.0) /
        |  CAST(SUM(volume) AS DOUBLE), 9) AS promo_revenue
        |FROM (
        |  SELECT CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume, p_type
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
        |) promo""".stripMargin,

    // C33: CTE consumed twice (join + scalar MAX); argmax equality on
    // the exact DECIMAL, cast DOUBLE only in the projection.
    "sql_tpch_q15" ->
      """WITH revenue0 AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |        (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier
        |JOIN revenue0 ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
        |ORDER BY s_suppkey""".stripMargin,

    // C34: correlated scalar-AVG subquery; threshold is exact because
    // l_quantity is integral (sum exact under 2^53, one shared IEEE
    // divide), so decorrelation cannot change the row set.
    "sql_tpch_q17" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
        |            AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_size < 5
        |  AND l_quantity < (
        |    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = p_partkey)""".stripMargin,

    // C35: three OR'd (brand, size, quantity) arms — join residual.
    "sql_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |                (1 - CAST(l_discount AS DECIMAL(18,4))))
        |            AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size >= 1 AND p_size <= 5
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size >= 1 AND p_size <= 10
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#34' AND p_size >= 1 AND p_size <= 15
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,

    // C36: NOT EXISTS anti-join + uncorrelated scalar threshold.
    // The above-average test is cross-multiplied (balance × count >
    // exact-decimal total) so no engine-ordered float sum is compared.
    "sql_tpch_q22" ->
      """SELECT cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM (
        |  SELECT SUBSTRING(c_mktsegment, 1, 2) AS cntrycode, c_acctbal
        |  FROM customer
        |  WHERE SUBSTRING(c_mktsegment, 1, 2)
        |        IN ('AU', 'BU', 'FU', 'HO', 'MA')
        |    AND c_acctbal * (SELECT COUNT(*) FROM customer
        |                     WHERE c_acctbal > 0.0) >
        |        (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
        |                     AS DOUBLE)
        |         FROM customer WHERE c_acctbal > 0.0)
        |    AND NOT EXISTS (
        |      SELECT * FROM orders
        |      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |) custsale
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin,

    // C44 COUNT-bug shape: a correlated scalar COUNT must be 0, never
    // NULL, for outer rows with no matches — pinned on the filter arm
    // too, where the bug silently drops rows
    "sql_count_bug" ->
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM orders
        |   WHERE o_custkey = c_custkey
        |     AND o_orderpriority = '1-URGENT') AS n_urgent
        |FROM customer
        |WHERE (SELECT COUNT(*) FROM orders
        |       WHERE o_custkey = c_custkey
        |         AND o_orderpriority = '1-URGENT') <= 2
        |ORDER BY c_custkey""".stripMargin,

    // C43 TPC-H Q1, the full spec shape as shared literal SQL: factor
    // casts kept at DECIMAL(12,4) so the triple charge product stays
    // inside both engines' 38-digit exactness
    "sql_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |           * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |           * (1 - CAST(l_discount AS DECIMAL(12,4)))
        |           * (1 + CAST(l_tax AS DECIMAL(12,4)))) AS DOUBLE)
        |    AS sum_charge,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) / COUNT(*)
        |            AS DECIMAL(38,6)) AS DOUBLE) AS avg_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) / COUNT(*)
        |            AS DECIMAL(38,6)) AS DOUBLE) AS avg_price,
        |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) / COUNT(*)
        |            AS DECIMAL(38,6)) AS DOUBLE) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // C37 (TPC-H Q2 adapted — no partsupp in the fixture: "supplied"
    // = appears on a lineitem; min-cost supplier becomes min-acctbal
    // supplier): correlated scalar-min subquery repeated inside and
    // out, DISTINCT collapses the lineitem fan-in. No arithmetic on
    // the compared doubles — stored-value equality only.
    "sql_tpch_q2" ->
      """SELECT DISTINCT s_acctbal, s_name, n_name,
        |  CAST(p_partkey AS BIGINT) AS p_partkey, p_brand
        |FROM part, supplier, lineitem, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size = 15 AND p_type = 'STANDARD'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND s_acctbal = (
        |    SELECT MIN(s2.s_acctbal)
        |    FROM supplier s2, lineitem l2, nation n2, region r2
        |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, p_brand""".stripMargin,

    // C38 (TPC-H Q9 adapted — supply cost proxied as 60% of retail
    // price since partsupp is absent): per-row amount stays EXACT
    // DECIMAL end-to-end (scales small enough that both engines keep
    // full precision), one CAST TO DOUBLE after the final sum.
    "sql_tpch_q9" ->
      """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |    CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(12,4))
        |      * (1 - CAST(l_discount AS DECIMAL(12,4)))
        |      - CAST(p_retailprice AS DECIMAL(12,4))
        |        * CAST(l_quantity AS DECIMAL(12,4))
        |        * CAST(0.6 AS DECIMAL(4,2)) AS amount
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%widget%'
        |) profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,

    // C39 (TPC-H Q11 adapted — "stock value" = lineitem shipped value
    // for half the nations' suppliers; the fixed q11 share fraction
    // empties at growing SF, so the threshold is SCALE-FREE: parts
    // worth > 2× the mean part value, cross-multiplied so both sides
    // stay exact DECIMAL×INTEGER and the boundary cannot float-flap):
    // HAVING against two uncorrelated scalar subqueries.
    "sql_tpch_q11" ->
      """SELECT CAST(l_partkey AS BIGINT) AS ps_partkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |           * CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS value
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_nationkey <= 12
        |GROUP BY l_partkey
        |HAVING SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |           * CAST(l_quantity AS DECIMAL(12,4)))
        |       * (SELECT COUNT(DISTINCT l_partkey)
        |          FROM lineitem
        |          JOIN supplier ON s_suppkey = l_suppkey
        |          JOIN nation ON s_nationkey = n_nationkey
        |          WHERE n_nationkey <= 12) > (
        |  SELECT 2 * SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |                 * CAST(l_quantity AS DECIMAL(12,4)))
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_nationkey <= 12)
        |ORDER BY value DESC, ps_partkey""".stripMargin,

    // C40 (TPC-H Q12 adapted — no l_shipmode/commit/receipt dates:
    // mode proxied by l_returnflag, lateness by a ship-lag band).
    "sql_tpch_q12" ->
      """SELECT l_returnflag AS ship_mode,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY l_returnflag
        |ORDER BY ship_mode""".stripMargin,

    // C41 (TPC-H Q16 adapted — supplier bridge is the lineitem):
    // NOT IN excluded-supplier subquery + COUNT DISTINCT per part
    // attribute triple.
    "sql_tpch_q16" ->
      """SELECT p_brand, p_type, CAST(p_size AS INT) AS p_size,
        |  CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND s_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // C42 (TPC-H Q20 adapted — "availqty exceeds half the demand"
    // becomes the SCALE-FREE "this supplier shipped > 2× the part's
    // mean per-supplier quantity", cross-multiplied by the supplier
    // count so no division enters the boundary): nested IN whose
    // inner relation joins two grouped aggregates of the same fact.
    // l_quantity is integer-valued — its double sums are exact in
    // any order, so the boundary is engine-stable.
    "sql_tpch_q20" ->
      """SELECT s_name, CAST(s_suppkey AS BIGINT) AS s_suppkey
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_nationkey <= 12
        |  AND s_suppkey IN (
        |    SELECT sp.l_suppkey
        |    FROM (SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
        |          FROM lineitem
        |          JOIN part ON p_partkey = l_partkey
        |          WHERE p_type = 'PROMO'
        |          GROUP BY l_suppkey, l_partkey) sp
        |    JOIN (SELECT l_partkey AS pk, SUM(l_quantity) AS tot,
        |                 COUNT(DISTINCT l_suppkey) AS ns
        |          FROM lineitem GROUP BY l_partkey) pt
        |      ON sp.l_partkey = pt.pk
        |    WHERE sp.qty * pt.ns > 2 * pt.tot)
        |ORDER BY s_name, s_suppkey""".stripMargin,

    // C27 recursive CTE calendar spine: integer month-index recursion
    // (ym = year*12 + month — no engine-specific date arithmetic),
    // LEFT JOIN a deliberately thin slice so zero-fill months exist;
    // the loop bound rides INSIDE the recursion (spine carries hi):
    // referencing the bounds CTE from the recursive step instead
    // re-aggregated the whole orders table EVERY iteration — ~80
    // redundant fact scans, 12 s at sf0.1 and a catastrophe at 100 TB;
    // yr recovered via floor() — NEVER bare CAST of a fractional
    // double: DuckDB CAST(1995.5 AS BIGINT) ROUNDS half-even where
    // Spark TRUNCATES, so the two engines disagree on every odd month
    "sql_recursive_cte" ->
      """WITH RECURSIVE bounds AS (
        |  SELECT CAST(min(year(o_orderdate) * 12 + month(o_orderdate)) AS INT) AS lo,
        |         CAST(max(year(o_orderdate) * 12 + month(o_orderdate)) AS INT) AS hi
        |  FROM orders
        |),
        |spine(ym, hi) AS (
        |  SELECT lo, hi FROM bounds
        |  UNION ALL
        |  SELECT ym + 1, hi FROM spine WHERE ym < hi
        |),
        |m AS (
        |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT) AS ym,
        |         count(*) AS n_orders,
        |         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |           AS rev_cents
        |  FROM orders
        |  WHERE o_orderkey % 97 = 0
        |  GROUP BY CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT)
        |)
        |SELECT CAST(floor((spine.ym - 1) / 12) AS BIGINT) AS yr,
        |       CAST((spine.ym - 1) % 12 + 1 AS BIGINT) AS mon,
        |       COALESCE(m.n_orders, CAST(0 AS BIGINT)) AS n_orders,
        |       COALESCE(m.rev_cents, CAST(0 AS BIGINT)) AS rev_cents
        |FROM spine LEFT JOIN m ON spine.ym = m.ym
        |ORDER BY spine.ym""".stripMargin,

    // C23 TPC-H Q7 volume shipping: literal SQL in both engines; the
    // disjunctive nation-pair predicate can't push to either scan, the
    // two nation legs broadcast, the pair residual runs on the joined
    // stream; years cast to BIGINT for cross-engine type agreement
    "sql_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |    AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
        |    l_extendedprice, l_discount
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    // C18 TPC-H Q5: 6-way snowflake join, literal SQL in both engines
    "sql_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |    AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    // C20 TPC-H Q18: large-volume customers — literal SQL in both
    // engines (spark.sql runs this exact text); the IN subquery is the
    // aggregate-HAVING self-reference Catalyst plans as a semi join
    "sql_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_cents,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
        |    AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY total_cents DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    // tolerance masks the match columns when the nearest prior event
    // is farther than 6 h (21_600_000_000 us) — NULLs, never a farther
    // fallback
    "join_asof_tolerance" ->
      """WITH w AS (
        |  SELECT event_id, user_id, event_type,
        |    lag(event_id) OVER win AS prev_event_id,
        |    lag(event_type) OVER win AS prev_event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER win AS gap_us
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT event_id, user_id,
        |  CASE WHEN gap_us <= 21600000000 THEN prev_event_id END AS prev_event_id,
        |  CASE WHEN gap_us <= 21600000000 THEN prev_event_type END AS prev_event_type,
        |  CASE WHEN gap_us <= 21600000000 THEN gap_us END AS gap_us
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    // nearest: closer of the strict lag/lead neighbors, ties backward
    "join_asof_nearest" ->
      """WITH w AS (
        |  SELECT event_id, user_id, event_type,
        |    lag(event_id) OVER win AS p_id,
        |    lag(event_type) OVER win AS p_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER win AS p_gap,
        |    lead(event_id) OVER win AS n_id,
        |    lead(event_type) OVER win AS n_type,
        |    lead(epoch_us(ts)) OVER win - epoch_us(ts) AS n_gap
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT event_id, user_id,
        |  CASE WHEN p_gap IS NOT NULL AND (n_gap IS NULL OR p_gap <= n_gap)
        |    THEN p_id ELSE n_id END AS near_event_id,
        |  CASE WHEN p_gap IS NOT NULL AND (n_gap IS NULL OR p_gap <= n_gap)
        |    THEN p_type ELSE n_type END AS near_event_type,
        |  CASE WHEN p_gap IS NOT NULL AND (n_gap IS NULL OR p_gap <= n_gap)
        |    THEN p_gap ELSE n_gap END AS gap_us,
        |  CASE WHEN p_gap IS NOT NULL AND (n_gap IS NULL OR p_gap <= n_gap)
        |    THEN 'backward'
        |    WHEN n_gap IS NOT NULL THEN 'forward' END AS side
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "join_asof_forward" ->
      """WITH w AS (
        |  SELECT event_id, user_id, event_type,
        |    lead(event_id) OVER win AS next_event_id,
        |    lead(event_type) OVER win AS next_event_type,
        |    lead(epoch_us(ts)) OVER win - epoch_us(ts) AS gap_us
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT event_id, user_id, next_event_id, next_event_type, gap_us
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    // salting must be value-transparent: the oracle is the PLAIN
    // unsalted join over the same synthetic-skew key
    "join_skew_salted" ->
      s"""WITH facts AS (
         |  SELECT l_quantity,
         |    CASE WHEN l_orderkey % 3 = 0 THEN 0
         |         ELSE l_orderkey % 25 END AS n_key
         |  FROM lineitem
         |)
         |SELECT n_name, count(*) AS n_items,
         |  ${dbl(s"sum(${dec("l_quantity")})")} AS sum_qty
         |FROM facts JOIN nation ON n_key = n_nationkey
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin,

    // ---------------- D: aggregations ----------------
    "agg_hash_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dbl(s"SUM(${dec("l_quantity")})")} AS sum_qty,
         |  ${dbl(s"SUM(${dec("l_extendedprice")})")} AS sum_base_price,
         |  ${dbl(s"SUM(${dec("l_extendedprice")} * (1 - ${dec("l_discount")}))")} AS sum_disc_price,
         |  ${dbl(s"SUM(${dec("l_quantity")}) / COUNT(*)")} AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_skew_salted" ->
      s"""SELECT l_returnflag,
         |  ${dbl(s"SUM(${dec("l_quantity")})")} AS sum_qty,
         |  COUNT(*) AS n
         |FROM lineitem
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin,

    "agg_minmax_by" ->
      """SELECT o_orderstatus,
        |  max_by(o_orderpriority, o_orderkey) AS prio_of_last,
        |  min_by(o_orderpriority, o_orderkey) AS prio_of_first,
        |  MAX(o_orderkey) AS last_key,
        |  MIN(o_orderkey) AS first_key
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // 1.5-sigma outlier screen in exact DECIMAL(38,0) arithmetic:
    // (n*x - s)^2 * (n-1) * 100 > 225 * n * (n*q - s^2) — squared
    // comparison, no sqrt/division/float, identical decisions in both
    // engines at the sigma boundary
    "agg_outlier_zscore" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cts
        |  FROM orders
        |), st AS (
        |  SELECT o_orderstatus, COUNT(*) AS n,
        |    SUM(CAST(cts AS DECIMAL(38,0))) AS s,
        |    SUM(CAST(cts AS DECIMAL(38,0)) * CAST(cts AS DECIMAL(38,0))) AS q
        |  FROM o GROUP BY o_orderstatus
        |)
        |SELECT o.o_orderkey, o.o_orderstatus, o.cts, CAST(st.n AS BIGINT) AS n
        |FROM o JOIN st USING (o_orderstatus)
        |WHERE st.n > 1 AND
        |  (CAST(st.n AS DECIMAL(38,0)) * o.cts - st.s)
        |    * (CAST(st.n AS DECIMAL(38,0)) * o.cts - st.s)
        |    * (st.n - 1) * 100
        |  > 225 * CAST(st.n AS DECIMAL(38,0))
        |    * (CAST(st.n AS DECIMAL(38,0)) * st.q - st.s * st.s)
        |ORDER BY o.o_orderkey""".stripMargin,

    // D21 equi-width histogram: the bucket decision is INTEGER (exact
    // HALF_UP cents, then integer DIV) so no float boundary can flip a
    // row's bucket between engines; share via the decimal contract
    "agg_histogram" ->
      s"""WITH c AS (
         |  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) // 500000
         |    AS bucket
         |  FROM lineitem
         |), h AS (
         |  SELECT bucket, COUNT(*) AS n FROM c GROUP BY bucket
         |), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h)
         |SELECT h.bucket, h.bucket * 5000 AS lo_dollars,
         |  (h.bucket + 1) * 5000 AS hi_dollars, CAST(h.n AS BIGINT) AS n,
         |  ${dbl(s"${dec("h.n")} / t.total")} AS share
         |FROM h, t
         |ORDER BY h.bucket""".stripMargin,

    // D23 equi-depth histogram: exact octile boundaries (quantile_cont
    // over integer cents interpolates on exact eighths = bit-identical
    // to Spark percentile), strict-> assignment puts ties low in both
    "agg_histogram_eqdepth" ->
      s"""WITH c AS (
         |  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c
         |  FROM lineitem
         |), q AS (
         |  SELECT quantile_cont(c,
         |    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS qs
         |  FROM c
         |), h AS (
         |  SELECT CAST(len(list_filter(q.qs, b -> c.c > b)) AS BIGINT)
         |      AS bucket,
         |    COUNT(*) AS n, MIN(c.c) AS min_cents, MAX(c.c) AS max_cents
         |  FROM c, q GROUP BY 1
         |), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h)
         |SELECT h.bucket, CAST(h.n AS BIGINT) AS n, h.min_cents,
         |  h.max_cents, ${dbl(s"${dec("h.n")} / t.total")} AS share
         |FROM h, t
         |ORDER BY h.bucket""".stripMargin,

    // D22 exact mode with the DECLARED tie-break (count DESC, value
    // ASC) — a bare mode() is tie-nondeterministic in both engines
    "agg_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
        |  FROM orders GROUP BY 1, 2
        |), r AS (
        |  SELECT o_orderstatus, o_orderpriority, c,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY c DESC, o_orderpriority) AS rn,
        |    SUM(c) OVER (PARTITION BY o_orderstatus) AS n_rows
        |  FROM c
        |)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |  CAST(c AS BIGINT) AS n_mode, CAST(n_rows AS BIGINT) AS n_rows
        |FROM r WHERE rn = 1
        |ORDER BY o_orderstatus""".stripMargin,

    // I5 outer explode: empty match lists become a [NULL] singleton
    // so the part survives with a NULL word — mirroring explode_outer
    "gen_explode_outer" ->
      """WITH b AS (
        |  SELECT p_partkey,
        |    list_filter(string_split(p_name, ' '), w -> w LIKE 'w%') AS l
        |  FROM part
        |)
        |SELECT p_partkey, CAST(len(l) AS INT) AS n_match,
        |  unnest(CASE WHEN len(l) = 0 THEN [CAST(NULL AS VARCHAR)]
        |    ELSE l END) AS word
        |FROM b
        |ORDER BY p_partkey, word NULLS FIRST""".stripMargin,

    // D26 bitmap distinct: the bitmap path must be EXACT — the oracle
    // is plain count(distinct), equality is the checked contract
    "agg_bitmap_distinct" ->
      """SELECT o_orderstatus,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust_exact
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // D24 conditional/boolean aggregates: count_if mirrored by the
    // ANSI FILTER clause; DISTINCT sum over exact integer cents
    // (HUGEINT→BIGINT cast per the agg_pivot note)
    "agg_conditional" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  bool_and(o_totalprice > 0) AS all_positive,
        |  bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        |  CAST(SUM(DISTINCT CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS cents_distinct_sum,
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // CAST to BIGINT: DuckDB's SUM over integers is HUGEINT, which the
    // driver's hasher reads as float64 and hash-mismatches against
    // Spark's BIGINT pivot counts (round-4 verdict). SUM(CASE) (not
    // COUNT) keeps NULL for empty cells — Spark's PivotFirst leaves
    // missing combinations NULL, not 0.
    "agg_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS "F",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS "O",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS "P"
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "agg_unpivot" ->
      """SELECT p_partkey, metric, value FROM (
        |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS BIGINT) AS value
        |  FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'price_cents',
        |    CAST(round(p_retailprice * 100, 0) AS BIGINT)
        |  FROM part
        |) ORDER BY p_partkey, metric""".stripMargin,

    "agg_percentile" ->
      """SELECT o_orderstatus,
        |  quantile_cont(tpc, 0.5) AS median_cents,
        |  quantile_cont(tpc, 0.25) AS q1_cents
        |FROM (SELECT o_orderstatus,
        |        CAST(round(o_totalprice * 100, 0) AS BIGINT) AS tpc
        |      FROM orders)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // D37 percentile_disc: the SQL-standard rule (smallest value whose
    // cume_dist >= p) written out EXPLICITLY via cume_dist — DuckDB's
    // quantile_disc picks index floor(p*(n-1)), which differs from the
    // standard (and from Spark's percentile_disc) for e.g. n=5, p=0.9.
    // cume_dist is k/n in IEEE double in both engines, and the inputs
    // are exact integer cents, so the selected element is identical.
    "agg_percentile_disc" ->
      """WITH cd AS (
        |  SELECT o_orderpriority, tpc,
        |    cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY tpc)
        |      AS c
        |  FROM (SELECT o_orderpriority,
        |          CAST(round(o_totalprice * 100, 0) AS BIGINT) AS tpc
        |        FROM orders)
        |)
        |SELECT o_orderpriority,
        |  CAST(MIN(CASE WHEN c >= 0.25 THEN tpc END) AS BIGINT) AS p25_cents,
        |  CAST(MIN(CASE WHEN c >= 0.5  THEN tpc END) AS BIGINT) AS p50_cents,
        |  CAST(MIN(CASE WHEN c >= 0.75 THEN tpc END) AS BIGINT) AS p75_cents,
        |  CAST(MIN(CASE WHEN c >= 0.9  THEN tpc END) AS BIGINT) AS p90_cents,
        |  COUNT(*) AS n_orders
        |FROM cd
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // D39 MAD: both medians via the D37 explicit cume_dist standard
    // rule on integer cents; dispersion is one exact-decimal division
    // finalized to DOUBLE
    "agg_median_abs_dev" ->
      s"""WITH src AS (
         |  SELECT l_returnflag AS rf,
         |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS epc
         |  FROM lineitem
         |), cd1 AS (
         |  SELECT rf, epc,
         |    cume_dist() OVER (PARTITION BY rf ORDER BY epc) AS c
         |  FROM src
         |), m AS (
         |  SELECT rf,
         |    CAST(MIN(CASE WHEN c >= 0.5 THEN epc END) AS BIGINT)
         |      AS median_cents
         |  FROM cd1 GROUP BY rf
         |), dev AS (
         |  SELECT s.rf, m.median_cents, abs(s.epc - m.median_cents) AS d
         |  FROM src s JOIN m ON s.rf = m.rf
         |), cd2 AS (
         |  SELECT rf, median_cents, d,
         |    cume_dist() OVER (PARTITION BY rf ORDER BY d) AS c
         |  FROM dev
         |)
         |SELECT rf, COUNT(*) AS n, MIN(median_cents) AS median_cents,
         |  CAST(MIN(CASE WHEN c >= 0.5 THEN d END) AS BIGINT) AS mad_cents,
         |  ${dbl(s"${dec("CAST(MIN(CASE WHEN c >= 0.5 THEN d END) AS BIGINT)")} / MIN(median_cents)")}
         |    AS dispersion
         |FROM cd2
         |GROUP BY rf
         |ORDER BY rf""".stripMargin,

    // D40 trimmed mean: same cume_dist bounds as D38, survivors
    // DROPPED instead of clamped; both means under the contract
    // SUM(DECIMAL)/COUNT division
    "agg_trimmed_mean" ->
      s"""WITH src AS (
         |  SELECT l_returnflag AS rf,
         |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS epc
         |  FROM lineitem
         |), cd AS (
         |  SELECT rf, epc,
         |    cume_dist() OVER (PARTITION BY rf ORDER BY epc) AS c
         |  FROM src
         |), b AS (
         |  SELECT rf,
         |    CAST(MIN(CASE WHEN c >= 0.05 THEN epc END) AS BIGINT)
         |      AS lo_cents,
         |    CAST(MIN(CASE WHEN c >= 0.95 THEN epc END) AS BIGINT)
         |      AS hi_cents
         |  FROM cd GROUP BY rf
         |)
         |SELECT s.rf, COUNT(*) AS n,
         |  CAST(COUNT(CASE WHEN s.epc BETWEEN b.lo_cents AND b.hi_cents
         |    THEN 1 END) AS BIGINT) AS n_kept,
         |  ${dbl(s"SUM(${dec("s.epc")}) / COUNT(*)")} AS mean_cents,
         |  ${dbl(s"SUM(CASE WHEN s.epc BETWEEN b.lo_cents AND b.hi_cents THEN ${dec("s.epc")} END) / COUNT(CASE WHEN s.epc BETWEEN b.lo_cents AND b.hi_cents THEN 1 END)")}
         |    AS trim_mean_cents
         |FROM src s JOIN b ON s.rf = b.rf
         |GROUP BY s.rf
         |ORDER BY s.rf""".stripMargin,

    // D38 winsorized mean: [p05, p95] DISCRETE clamp bounds from the
    // same explicit cume_dist standard rule as D37 (exact integer
    // cents → identical bound element in both engines), then the
    // contract mean SUM(DECIMAL)/COUNT(*) on raw and clamped cents.
    "agg_winsorized_mean" ->
      s"""WITH src AS (
         |  SELECT l_returnflag AS rf,
         |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS epc
         |  FROM lineitem
         |), cd AS (
         |  SELECT rf, epc,
         |    cume_dist() OVER (PARTITION BY rf ORDER BY epc) AS c
         |  FROM src
         |), b AS (
         |  SELECT rf,
         |    CAST(MIN(CASE WHEN c >= 0.05 THEN epc END) AS BIGINT)
         |      AS lo_cents,
         |    CAST(MIN(CASE WHEN c >= 0.95 THEN epc END) AS BIGINT)
         |      AS hi_cents
         |  FROM cd GROUP BY rf
         |)
         |SELECT s.rf, COUNT(*) AS n,
         |  MIN(b.lo_cents) AS lo_cents, MIN(b.hi_cents) AS hi_cents,
         |  ${dbl(s"SUM(${dec("s.epc")}) / COUNT(*)")} AS mean_cents,
         |  ${dbl(s"SUM(${dec("LEAST(GREATEST(s.epc, b.lo_cents), b.hi_cents)")}) / COUNT(*)")}
         |    AS winsor_mean_cents
         |FROM src s JOIN b ON s.rf = b.rf
         |GROUP BY s.rf
         |ORDER BY s.rf""".stripMargin,

    "agg_distinct" ->
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(DISTINCT o_orderpriority) AS n_prio
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "agg_rollup" ->
      s"""SELECT c_mktsegment, n_name, COUNT(*) AS n,
         |  ${dbl(s"SUM(${dec("c_acctbal")})")} AS bal,
         |  GROUPING(c_mktsegment, n_name) AS gid
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY ROLLUP (c_mktsegment, n_name)
         |ORDER BY gid, c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  GROUPING(o_orderstatus, o_orderpriority) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin,

    "agg_having" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust
        |FROM customer
        |GROUP BY c_mktsegment
        |HAVING COUNT(*) > 25
        |ORDER BY c_mktsegment""".stripMargin,

    "agg_collect_sorted" ->
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
        |  COUNT(*) AS n,
        |  MIN(c_custkey) AS min_k,
        |  MAX(c_custkey) AS max_k
        |FROM customer
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "agg_udaf_second_max" ->
      """WITH tp AS (
        |  SELECT DISTINCT c_mktsegment,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS tp_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), r AS (
        |  SELECT c_mktsegment, tp_cents,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY tp_cents DESC) AS rn
        |  FROM tp
        |)
        |SELECT c_mktsegment, tp_cents AS second_max_cents
        |FROM r WHERE rn = 2
        |ORDER BY c_mktsegment""".stripMargin,

    // ---------------- E: windows ----------------
    "win_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  rank() OVER win AS rnk,
        |  dense_rank() OVER win AS drnk,
        |  row_number() OVER win AS rn
        |FROM customer
        |WINDOW win AS (PARTITION BY c_mktsegment
        |               ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "win_running_sum" ->
      s"""SELECT o_custkey, o_orderkey,
         |  ${dbl(s"SUM(${dec("o_totalprice")}) OVER win")} AS running_total
         |FROM orders
         |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_sliding_avg" ->
      s"""SELECT o_custkey, o_orderkey,
         |  ${dbl(s"SUM(${dec("o_totalprice")}) OVER win / COUNT(*) OVER win")} AS moving_avg
         |FROM orders
         |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_range_frame" ->
      """SELECT s_suppkey, s_nationkey, bal_cents,
        |  CAST(SUM(bal_cents) OVER (PARTITION BY s_nationkey ORDER BY bal_cents
        |    RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS range_sum_cents
        |FROM (SELECT s_suppkey, s_nationkey,
        |        CAST(round(s_acctbal * 100, 0) AS BIGINT) AS bal_cents
        |      FROM supplier)
        |ORDER BY s_suppkey""".stripMargin,

    "win_lead_lag" ->
      """SELECT event_id, user_id,
        |  lag(event_type) OVER win AS prev_type,
        |  lead(event_type) OVER win AS next_type,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER win AS gap_us
        |FROM events
        |WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "win_ntile_pct" ->
      """SELECT o_orderkey, tp_cents,
        |  CAST(ntile(4) OVER win AS INTEGER) AS nt,
        |  percent_rank() OVER win AS pr,
        |  cume_dist() OVER win AS cd
        |FROM (SELECT o_orderkey,
        |        CAST(round(o_totalprice * 100, 0) AS BIGINT) AS tp_cents
        |      FROM orders)
        |WINDOW win AS (ORDER BY tp_cents, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    // last_value/nth_value need the explicit full-partition frame in
    // BOTH engines — the default frame ends at the current row
    "win_first_last" ->
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_orderkey) OVER win AS first_order,
        |  last_value(o_orderkey) OVER win AS last_order,
        |  nth_value(o_orderkey, 2) OVER win AS second_order
        |FROM orders
        |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey, o_custkey, first_order, last_order, second_order""".stripMargin,

    // E9 time-interval range frame: literal SQL in both engines; ties
    // are frame peers so no unique tiebreak is needed in the frame
    "win_range_time" ->
      """SELECT event_id, user_id,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
        |  AS DECIMAL(38,6)) AS DOUBLE) AS rolling_24h
        |FROM events
        |ORDER BY event_id""".stripMargin,

    // E8 IGNORE NULLS navigation: identical deterministic NULL
    // synthesis (every 3rd order carries a reading) and identical
    // frames; IGNORE NULLS sits inside the call in DuckDB
    // E12 running distinct: first-seen flag + running sum (windowed
    // COUNT(DISTINCT) is unsupported in both engines; the collect_set
    // workaround is O(cardinality) per row)
    "win_running_distinct" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
        |  FROM events
        |), fl AS (
        |  SELECT user_id, event_id, event_type, tus,
        |    CASE WHEN row_number() OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY tus, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
        |  FROM ev
        |)
        |SELECT event_id, user_id, event_type,
        |  CAST(SUM(first_seen) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_so_far
        |FROM fl
        |ORDER BY event_id""".stripMargin,

    // E11 gaps-and-islands: day_number − row_number is constant within
    // a consecutive run; DuckDB DATE − DATE is integer days (Spark
    // side uses unix_date); sum(len) CAST from HUGEINT
    "win_gap_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        |), lab AS (
        |  SELECT user_id, d,
        |    CAST(d - DATE '1970-01-01' AS BIGINT)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY d) AS g
        |  FROM days
        |), isl AS (
        |  SELECT user_id, g, min(d) AS sd, max(d) AS ed, count(*) AS len
        |  FROM lab GROUP BY user_id, g
        |)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(max(len) AS BIGINT) AS longest,
        |  CAST(sum(len) AS BIGINT) AS active_days,
        |  min(sd) AS first_day, max(ed) AS last_day
        |FROM isl GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // E10 dedupe-to-latest: row_number over (key, recency DESC, unique
    // tie-break) = 1 — key-cardinality output, whole-row retention
    "win_dedup_latest" ->
      """SELECT o_custkey, o_orderkey, o_odate, o_orderstatus, tp_cents
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(o_orderdate AS DATE) AS o_odate, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS tp_cents,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders
        |) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,

    "win_ignore_nulls" ->
      """WITH b AS (
        |  SELECT o_custkey, o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0
        |      THEN CAST(round(o_totalprice * 100, 0) AS BIGINT) END AS v
        |  FROM orders
        |)
        |SELECT o_custkey, o_orderkey, v,
        |  last_value(v IGNORE NULLS) OVER runw AS ffill,
        |  first_value(v IGNORE NULLS) OVER fullw AS first_nn,
        |  nth_value(v, 2 IGNORE NULLS) OVER fullw AS second_nn
        |FROM b
        |WINDOW runw AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  fullw AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // ---------------- F: sorts / limits / census ----------------
    "sort_multi_nulls" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey""".stripMargin,

    // F13 OFFSET pagination: literal SQL in both engines; ordering
    // covers every output column (lineitem rows are not key-unique)
    // so page boundaries are permutation-stable
    "sort_page_offset" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 10 OFFSET 40""".stripMargin,

    "limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 10""".stripMargin,

    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        CAST(row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "census_states" ->
      """SELECT printf('%02d', range) AS fips
        |FROM range(1, 57)
        |WHERE range NOT IN (3, 7, 14, 43, 52)
        |ORDER BY fips""".stripMargin,

    "census_union_byname" ->
      """SELECT c_custkey, c_name, c_mktsegment, CAST(NULL AS DOUBLE) AS c_acctbal
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), c_acctbal
        |FROM customer WHERE c_custkey % 2 = 1
        |ORDER BY c_custkey""".stripMargin,

    "census_clean_cast" ->
      """SELECT p_partkey,
        |  CASE WHEN p_size % 7 = 0 THEN '  '
        |       WHEN p_size % 11 = 0 THEN '-666666666'
        |       ELSE CAST(p_size AS VARCHAR) END AS raw_size,
        |  CASE WHEN p_size % 7 = 0 OR p_size % 11 = 0 THEN NULL
        |       ELSE CAST(p_size AS BIGINT) END AS clean_size
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    // sentinel rows (p_size % 11 = 0) clean to NULL and can never pass
    // the > 25 filter — the oracle states that directly on the raw col
    "census_sentinel_filter" ->
      """SELECT p_partkey, CAST(p_size AS BIGINT) AS clean_size
        |FROM part
        |WHERE p_size % 11 <> 0 AND p_size > 25
        |ORDER BY p_partkey""".stripMargin,

    // ---------------- G: set ops ----------------
    "set_union_distinct" ->
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION
        |  SELECT s_nationkey FROM supplier
        |) ORDER BY nationkey""".stripMargin,

    "set_intersect" ->
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT
        |  SELECT s_nationkey FROM supplier
        |) ORDER BY nationkey""".stripMargin,

    "set_except" ->
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT
        |  SELECT s_nationkey FROM supplier
        |) ORDER BY nationkey""".stripMargin,

    "set_intersect_all" ->
      """SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey FROM supplier
        |) GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "set_except_all" ->
      """SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey FROM supplier
        |) GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    // ---------------- H: scalar functions ----------------
    "fn_string" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS up,
        |  lower(c_mktsegment) AS lo,
        |  trim(c_name) AS tr,
        |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS pad,
        |  substring(c_name, 1, 8) AS sub,
        |  concat_ws('-', c_mktsegment, c_name) AS cw,
        |  replace(c_name, '#', '_') AS tl,
        |  CAST(length(c_name) AS INTEGER) AS len,
        |  starts_with(c_name, 'Customer') AS sw,
        |  str_split(c_name, '#')[1] AS tok
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "fn_regex" ->
      """SELECT p_partkey,
        |  regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        |  regexp_replace(p_name, '\s+', '_', 'g') AS name_us
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dy,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INTEGER) AS days_since,
        |  CAST(o_orderdate AS DATE) + 7 AS plus7,
        |  last_day(CAST(o_orderdate AS DATE)) AS ld,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "fn_date2" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus3m,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS isoweek,
        |  CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS doy,
        |  CAST(date_trunc('year', o_orderdate) AS DATE) AS ystart,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |  make_date(CAST(year(o_orderdate) AS BIGINT),
        |            CAST(month(o_orderdate) AS BIGINT),
        |            CAST(day(o_orderdate) AS BIGINT)) AS remade
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      s"""SELECT p_partkey,
         |  ${dbl(s"round(${dec("p_retailprice")}, 2)")} AS r2,
         |  abs(p_retailprice - CAST(1000.0 AS DOUBLE)) AS ab,
         |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
         |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
         |  CAST(p_partkey % 7 AS BIGINT) AS pm,
         |  pow(CAST(p_size AS DOUBLE), CAST(2.0 AS DOUBLE)) AS pw,
         |  sqrt(CAST(p_size AS DOUBLE)) AS sq,
         |  round(ln(CAST(p_size AS DOUBLE) + CAST(1.0 AS DOUBLE)), 4) AS lg,
         |  greatest(p_retailprice, CAST(500.0 AS DOUBLE)) AS gr,
         |  least(p_retailprice, CAST(500.0 AS DOUBLE)) AS le
         |FROM part
         |ORDER BY p_partkey""".stripMargin,

    "fn_cond_null" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < CAST(50000.0 AS DOUBLE) THEN 'low'
        |       WHEN o_totalprice < CAST(150000.0 AS DOUBLE) THEN 'mid'
        |       ELSE 'high' END AS band,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  CASE WHEN o_orderpriority IS NOT NULL THEN 'has' ELSE 'none' END AS prio_flag
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // VARIANT surface: typed path gets mirror as json_extract casts;
    // the shape string and the malformed probe are fixture-constant
    // (every props row is {"k": int}; '{' || props is invalid JSON)
    "fn_variant" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INT) AS k,
        |  CAST(json_extract(props, '$.k') AS VARCHAR) AS k_str,
        |  CAST(NULL AS INT) AS missing_k,
        |  CASE WHEN props IS NULL THEN NULL
        |    ELSE 'OBJECT<k: BIGINT>' END AS vtype,
        |  CASE WHEN event_id % 100 <> 0 THEN NULL
        |    WHEN props IS NULL THEN TRUE
        |    ELSE NOT json_valid('{' || props) END AS bad_is_null
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "fn_json" ->
      """WITH j AS (
        |  SELECT event_id, event_type,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |  FROM events
        |)
        |SELECT event_id, k,
        |  to_json(struct_pack(event_type := event_type, k := k)) AS j
        |FROM j WHERE k IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "fn_array" ->
      """SELECT p_partkey,
        |  CAST(len(toks) AS INTEGER) AS n_tok,
        |  list_contains(toks, 'widget') AS has_widget,
        |  toks[1] AS first_tok,
        |  array_to_string(list_sort(toks), ',') AS sorted_toks
        |FROM (SELECT p_partkey, str_split(p_name, ' ') AS toks FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "fn_map" ->
      """SELECT event_id,
        |  array_to_string(list_sort(map_keys(
        |    map(['x-ratelimit-remaining', 'content-type', 'etype'],
        |        [CAST(event_id AS VARCHAR), 'json', event_type]))), ',')
        |    AS keys_sorted,
        |  CAST(json_object('x-ratelimit-remaining', CAST(event_id AS VARCHAR))
        |    AS VARCHAR) AS ratelimit_json
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "fn_bitwise" ->
      """SELECT p_partkey,
        |  p_partkey & 255 AS band,
        |  p_partkey | 16 AS bor,
        |  xor(p_partkey, CAST(p_size AS BIGINT)) AS bxor,
        |  CAST(p_size AS INTEGER) << 3 AS shl,
        |  p_partkey >> 2 AS shr,
        |  ~p_size AS bnot,
        |  CAST(bit_count(p_partkey) AS INTEGER) AS popcnt
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    // ---------------- I: generators / UDFs ----------------
    "gen_explode_pos" ->
      """SELECT doc_id, CAST(r.range - 1 AS INTEGER) AS pos,
        |  toks[CAST(r.range AS INTEGER)] AS token
        |FROM (SELECT doc_id, list_slice(str_split(text, ' '), 1, 5) AS toks
        |      FROM documents) d, range(1, 6) r
        |WHERE r.range <= len(toks)
        |ORDER BY doc_id, pos""".stripMargin,

    "udf_scalar_fips" ->
      """SELECT range AS id, printf('%02d', range) AS fips
        |FROM range(1, 57)
        |WHERE range NOT IN (3, 7, 14, 43, 52)
        |ORDER BY id""".stripMargin,

    // I4 SQL table function: the engine declares graft_head_tokens and
    // applies it LATERALLY; the oracle inlines the body (the I1 mirror
    // at width 3) — inlining must be semantically exact
    "fn_sql_udtf" ->
      """SELECT doc_id, CAST(r.range - 1 AS INTEGER) AS pos,
        |  toks[CAST(r.range AS INTEGER)] AS tok
        |FROM (SELECT doc_id, list_slice(str_split(text, ' '), 1, 3) AS toks
        |      FROM documents) d, range(1, 4) r
        |WHERE r.range <= len(toks)
        |ORDER BY doc_id, pos""".stripMargin,

    "udtf_generator" ->
      """SELECT p_partkey, CAST(r.range AS INTEGER) - 1 AS pos,
        |  substr(p_name, CAST(r.range AS INTEGER), 3) AS gram
        |FROM part, range(1, 4096) r
        |WHERE r.range <= length(p_name) - 2
        |ORDER BY p_partkey, pos""".stripMargin,

    // ---------------- J: event-time windowing (batch semantics) ----------------
    // J4-J8 _be: the true-streaming ops run TO COMPLETION over the
    // fixture (one micro-batch — nothing is late, dedup state sees
    // every id, join state never evicts mid-stream), so the streamed
    // result must equal the plain batch relation below EXACTLY.
    "stream_watermark_late_be" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
        |    AS wstart,
        |  event_type, COUNT(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY wstart, event_type""".stripMargin,

    // fixture event_ids are unique, so the deduped stream carries the
    // whole corpus
    "stream_dedup_be" ->
      """SELECT event_type, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "stream_stream_static_join_be" ->
      """SELECT 'seg_' || CAST(user_id % 4 AS VARCHAR) AS segment,
        |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1
        |ORDER BY segment""".stripMargin,

    "stream_stateful_custom_be" ->
      """SELECT user_id, COUNT(*) AS n_events
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "stream_stream_interval_join_be" ->
      """SELECT e1.user_id, COUNT(*) AS n_pairs,
        |  CAST(SUM(epoch_us(e2.ts) - epoch_us(e1.ts)) AS BIGINT)
        |    AS sum_gap_us
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e2.ts >= e1.ts AND e2.ts < e1.ts + INTERVAL 5 MINUTE
        |WHERE e1.event_type = 'view' AND e2.event_type = 'click'
        |GROUP BY e1.user_id
        |ORDER BY e1.user_id""".stripMargin,

    "stream_tumbling" ->
      s"""SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS wstart,
         |  event_type, COUNT(*) AS n,
         |  ${dbl(s"SUM(${dec("value")})")} AS sval
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY wstart, event_type""".stripMargin,

    "stream_sliding" ->
      s"""SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)
         |    - CAST(k.range AS BIGINT) * 900 AS wstart,
         |  COUNT(*) AS n,
         |  ${dbl(s"SUM(${dec("value")})")} AS sval
         |FROM events, range(0, 4) k
         |GROUP BY 1
         |ORDER BY wstart""".stripMargin,

    "stream_session" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER win IS NULL
        |           OR ts - lag(ts) OVER win >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM o
        |)
        |SELECT user_id,
        |  CAST(floor(epoch(MIN(ts))) AS BIGINT) AS sess_start,
        |  COUNT(*) AS n_events,
        |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
        |FROM s
        |GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_start""".stripMargin,

    // ordered funnel: click qualifies only at/after the user's first
    // view, purchase only at/after the first qualifying click
    "funnel_conversion" ->
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS v_us FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.v_us
        |  GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.c_us
        |  GROUP BY e.user_id
        |)
        |SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view_users,
        |  CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_after_view,
        |  CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_after_click""".stripMargin,

    // J43 funnel latency: same funnel CTEs as J11; gap quantiles via
    // the D37 explicit cume_dist standard rule on exact BIGINT micros
    "events_funnel_latency" ->
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS v_us FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.v_us
        |  GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.c_us
        |  GROUP BY e.user_id
        |), gaps AS (
        |  SELECT 'view_to_click' AS stage, c.c_us - v.v_us AS gap_us
        |  FROM c JOIN v ON c.user_id = v.user_id
        |  UNION ALL
        |  SELECT 'click_to_purchase', p.p_us - c.c_us
        |  FROM p JOIN c ON p.user_id = c.user_id
        |), cd AS (
        |  SELECT stage, gap_us,
        |    cume_dist() OVER (PARTITION BY stage ORDER BY gap_us) AS cdv
        |  FROM gaps
        |)
        |SELECT stage, COUNT(*) AS n_users,
        |  CAST(MIN(CASE WHEN cdv >= 0.5 THEN gap_us END) AS BIGINT)
        |    AS p50_us,
        |  CAST(MIN(CASE WHEN cdv >= 0.9 THEN gap_us END) AS BIGINT)
        |    AS p90_us,
        |  CAST(MAX(gap_us) AS BIGINT) AS max_us
        |FROM cd
        |GROUP BY stage
        |ORDER BY stage""".stripMargin,

    // cohort = first-activity epoch day; weekly offsets, distinct
    // active users — integer day arithmetic in both engines
    "retention_cohorts" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        |), cohort AS (
        |  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
        |)
        |SELECT c.cohort_day, (e.day - c.cohort_day) // 7 AS offset_week,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM ev e JOIN cohort c ON e.user_id = c.user_id
        |GROUP BY c.cohort_day, (e.day - c.cohort_day) // 7
        |ORDER BY cohort_day, offset_week""".stripMargin,

    // first-order Markov transition matrix: consecutive per-user
    // (type -> next type) steps in (ts, event_id) order, with each
    // transition's share of its source type
    "path_transitions" ->
      s"""WITH nx AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS to_type
         |  FROM events
         |), tr AS (
         |  SELECT from_type, to_type, COUNT(*) AS n
         |  FROM nx WHERE to_type IS NOT NULL GROUP BY from_type, to_type
         |), tot AS (
         |  SELECT from_type, SUM(n) AS n_from FROM tr GROUP BY from_type
         |)
         |SELECT tr.from_type, tr.to_type, CAST(tr.n AS BIGINT) AS n,
         |  ${dbl(s"${dec("tr.n")} / t.n_from")} AS share
         |FROM tr JOIN tot t ON tr.from_type = t.from_type
         |ORDER BY tr.from_type, tr.to_type""".stripMargin,

    // batch gap sessionization: 30-min-gap island numbering (lag +
    // cumulative new-session flag) in (ts, event_id) order, per-user
    // session metrics — all integer micro arithmetic
    // J23 DAU/WAU: the coverage trick — each distinct (day,user) pair
    // contributes to the 7 window days it covers, so rolling distinct
    // is a second plain DISTINCT, mirroring the engine exactly
    // J31 RFM: quintiles via ntile over FULLY tie-broken orderings
    // (metric, user_id); recency against corpus max day, never
    // wall-clock; DuckDB ntile is BIGINT — CAST to INT for parity
    "events_rfm" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, value FROM events
        |), per AS (
        |  SELECT user_id,
        |    CAST(max(d) - DATE '1970-01-01' AS BIGINT) AS last_day,
        |    count(*) AS frequency,
        |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS monetary_cents
        |  FROM ev GROUP BY user_id
        |), g AS (SELECT max(last_day) AS gmax FROM per),
        |base AS (
        |  SELECT user_id, gmax - last_day AS recency_days,
        |    frequency, monetary_cents
        |  FROM per, g
        |), s AS (
        |  SELECT user_id, recency_days, frequency, monetary_cents,
        |    CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS INT)
        |      AS r,
        |    CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS INT) AS f,
        |    CAST(ntile(5) OVER (ORDER BY monetary_cents, user_id) AS INT)
        |      AS m
        |  FROM base
        |)
        |SELECT user_id, recency_days, frequency, monetary_cents, r, f, m,
        |  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
        |    AS segment
        |FROM s ORDER BY user_id""".stripMargin,

    "events_active_users" ->
      s"""WITH du AS (
         |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
         |), dau AS (
         |  SELECT day, COUNT(*) AS dau FROM du GROUP BY day
         |), cover AS (
         |  SELECT DISTINCT du.day + CAST(t.i AS INTEGER) AS day, du.user_id
         |  FROM du, unnest(generate_series(0, 6)) AS t(i)
         |), wau AS (
         |  SELECT day, COUNT(*) AS wau FROM cover GROUP BY day
         |)
         |SELECT d.day, CAST(d.dau AS BIGINT) AS dau,
         |  CAST(w.wau AS BIGINT) AS wau,
         |  ${dbl(s"${dec("d.dau")} / w.wau")} AS stickiness
         |FROM dau d JOIN wau w USING (day)
         |ORDER BY d.day""".stripMargin,

    // J35 cohort LTV: integer epoch-weeks (floor-div on positive day
    // numbers ≡ Spark's truncating cast), cumulative window over the
    // tiny cohort×age matrix
    "events_cohort_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, value,
        |    CAST((CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS BIGINT)
        |      AS wk
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, min(wk) AS cwk FROM ev GROUP BY user_id
        |), cells AS (
        |  SELECT c.cwk, e.wk - c.cwk AS age,
        |    count(DISTINCT e.user_id) AS n_active,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100, 0) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS rev_cents
        |  FROM ev e JOIN cohort c ON e.user_id = c.user_id
        |  GROUP BY c.cwk, e.wk - c.cwk
        |)
        |SELECT cwk, age, CAST(n_active AS BIGINT) AS n_active, rev_cents,
        |  CAST(SUM(rev_cents) OVER (PARTITION BY cwk ORDER BY age
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_cents
        |FROM cells
        |ORDER BY cwk, age""".stripMargin,

    // J33 attribution: the J16 island CTEs, one lag inside the
    // (user, session) refinement, session-opening purchases → 'direct'
    "events_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tus
        |  FROM events
        |), fl AS (
        |  SELECT user_id, event_id, event_type, value, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |           OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END
        |      AS new_s
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        |), sid AS (
        |  SELECT user_id, event_id, event_type, value, tus,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM fl
        |), pv AS (
        |  SELECT event_type, value,
        |    lag(event_type) OVER (PARTITION BY user_id, session_id
        |      ORDER BY tus, event_id) AS prev_type
        |  FROM sid
        |)
        |SELECT COALESCE(prev_type, 'direct') AS touch,
        |  count(*) AS n_conversions,
        |  CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS credited_cents
        |FROM pv WHERE event_type = 'purchase'
        |GROUP BY 1
        |ORDER BY touch""".stripMargin,

    "sessionize_batch" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
         |), fl AS (
         |  SELECT user_id, event_id, tus,
         |    CASE WHEN lag(tus) OVER w IS NULL
         |           OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
         |), sid AS (
         |  SELECT user_id, tus,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |      ROWS UNBOUNDED PRECEDING) AS session_id
         |  FROM fl
         |), s AS (
         |  SELECT user_id, session_id, COUNT(*) AS n_ev,
         |    MAX(tus) - MIN(tus) AS dur_us
         |  FROM sid GROUP BY user_id, session_id
         |)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
         |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
         |  ${dbl(s"${dec("SUM(n_ev)")} / COUNT(*)")} AS events_per_session,
         |  CAST(SUM(dur_us) AS BIGINT) AS active_us
         |FROM s GROUP BY user_id
         |ORDER BY user_id""".stripMargin,

    // daily resample + forward fill: per-user dense day grid, last
    // observed value per day (ts, event_id tie-break), unobserved days
    // carry the prior value via last_value IGNORE NULLS
    "events_resample_ffill" ->
      """WITH daily AS (
        |  SELECT user_id, day, value AS v_day FROM (
        |    SELECT user_id, epoch_us(ts) // 86400000000 AS day, value,
        |      row_number() OVER (
        |        PARTITION BY user_id, epoch_us(ts) // 86400000000
        |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |    FROM events)
        |  WHERE rn = 1
        |), grid AS (
        |  SELECT user_id, unnest(range(d0, d1 + 1)) AS day
        |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        |        FROM daily GROUP BY user_id)
        |)
        |SELECT g.user_id, g.day,
        |  last_value(d.v_day IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS UNBOUNDED PRECEDING) AS value,
        |  d.v_day IS NOT NULL AS observed
        |FROM grid g LEFT JOIN daily d
        |  ON g.user_id = d.user_id AND g.day = d.day
        |ORDER BY g.user_id, g.day""".stripMargin,

    // daily resample + linear interpolation: identical expression tree
    // to the engine (IEEE ops are correctly rounded — same float walk),
    // 9 dp final round; grid spans active days so both neighbors exist
    "events_interpolate" ->
      """WITH daily AS (
        |  SELECT user_id, day, value AS v_day FROM (
        |    SELECT user_id, epoch_us(ts) // 86400000000 AS day, value,
        |      row_number() OVER (
        |        PARTITION BY user_id, epoch_us(ts) // 86400000000
        |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |    FROM events)
        |  WHERE rn = 1
        |), grid AS (
        |  SELECT user_id, unnest(range(d0, d1 + 1)) AS day
        |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        |        FROM daily GROUP BY user_id)
        |), j AS (
        |  SELECT g.user_id, g.day, d.v_day,
        |    last_value(d.v_day IGNORE NULLS) OVER w_past AS vp,
        |    last_value(CASE WHEN d.v_day IS NOT NULL THEN g.day END IGNORE NULLS)
        |      OVER w_past AS dp,
        |    first_value(d.v_day IGNORE NULLS) OVER w_future AS vn,
        |    first_value(CASE WHEN d.v_day IS NOT NULL THEN g.day END IGNORE NULLS)
        |      OVER w_future AS dn
        |  FROM grid g LEFT JOIN daily d
        |    ON g.user_id = d.user_id AND g.day = d.day
        |  WINDOW
        |    w_past AS (PARTITION BY g.user_id ORDER BY g.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    w_future AS (PARTITION BY g.user_id ORDER BY g.day
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, day,
        |  CASE WHEN v_day IS NOT NULL THEN v_day
        |    ELSE round(vp + (vn - vp) * (CAST(day - dp AS DOUBLE) / (dn - dp)), 9)
        |  END AS value,
        |  v_day IS NOT NULL AS observed
        |FROM j
        |ORDER BY user_id, day""".stripMargin,

    // J19 rolling z-score: frame sums are exact DECIMAL (value 2 dp,
    // value² rounded to its exact 4 dp), then the IDENTICAL IEEE
    // mean/variance/z expression tree as the Spark side with one 6 dp
    // final round; < 3 predecessors or zero variance -> NULL
    "events_anomaly" ->
      """WITH b AS (
        |  SELECT event_id, user_id, value,
        |    COUNT(value) OVER w AS n_prev,
        |    SUM(CAST(value AS DECIMAL(18,4))) OVER w AS s1,
        |    SUM(CAST(round(value * value, 4) AS DECIMAL(18,4))) OVER w AS s2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
        |), z AS (
        |  SELECT event_id, user_id, value, CAST(n_prev AS BIGINT) AS n_prev,
        |    CASE WHEN n_prev >= 3 AND
        |      CAST(s2 AS DOUBLE) / CAST(n_prev AS DOUBLE)
        |        - (CAST(s1 AS DOUBLE) / CAST(n_prev AS DOUBLE))
        |          * (CAST(s1 AS DOUBLE) / CAST(n_prev AS DOUBLE)) > 0
        |    THEN round(
        |      (value - CAST(s1 AS DOUBLE) / CAST(n_prev AS DOUBLE))
        |      / sqrt(CAST(s2 AS DOUBLE) / CAST(n_prev AS DOUBLE)
        |        - (CAST(s1 AS DOUBLE) / CAST(n_prev AS DOUBLE))
        |          * (CAST(s1 AS DOUBLE) / CAST(n_prev AS DOUBLE))), 6)
        |    END AS zscore
        |  FROM b
        |)
        |SELECT event_id, user_id, value, n_prev, zscore,
        |  COALESCE(abs(zscore) > 2.0, FALSE) AS is_anomaly
        |FROM z
        |ORDER BY user_id, event_id""".stripMargin,

    // triangle census of the part co-occurrence graph (edges = part
    // pairs sharing an order), via the same degree-orientation the
    // L5 degree distribution: exact integer floor(log2) via the
    // binary-digit count (a float log2 flips power-of-two boundaries)
    // L11 assortativity: both orientations per edge, exact integer
    // moments, one closed-form double (IEEE sqrt is correctly rounded
    // in both engines)
    "graph_assortativity" ->
      s"""WITH ${coGraphCtes()}, deg AS (
         |  SELECT node, COUNT(*) AS d FROM (
         |    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
         |  ) GROUP BY node
         |), b AS (
         |  SELECT du.d AS x, dv.d AS y FROM e
         |  JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
         |  UNION ALL
         |  SELECT dv.d AS x, du.d AS y FROM e
         |  JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
         |), m AS (
         |  SELECT COUNT(*) AS m2, SUM(x) AS sx, SUM(y) AS sy,
         |    SUM(x * y) AS sxy, SUM(x * x) AS sx2, SUM(y * y) AS sy2
         |  FROM b
         |)
         |SELECT CAST(m2 AS BIGINT) AS m2,
         |  round((CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |    / sqrt((CAST(m2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
         |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |      * (CAST(m2 AS DOUBLE) * CAST(sy2 AS DOUBLE)
         |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         |    AS assortativity
         |FROM m""".stripMargin,

    // L10 bucketed clustering coefficient: ratio of exact-integer
    // sums per degree bucket (never a mean of float ratios — double
    // summation order is engine/partitioning-dependent); same
    // orientation + closer join as L1, each triangle credits 3 corners
    "graph_clustering_coeff" ->
      s"""WITH ${coGraphCtes()}, deg AS (
         |  SELECT node, COUNT(*) AS d FROM (
         |    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
         |  ) GROUP BY node
         |), fwd AS (
         |  SELECT
         |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
         |      THEN e.u ELSE e.v END AS x,
         |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
         |      THEN e.v ELSE e.u END AS y,
         |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
         |      THEN dv.d ELSE du.d END AS dy
         |  FROM e
         |  JOIN deg du ON e.u = du.node
         |  JOIN deg dv ON e.v = dv.node
         |), tri AS (
         |  SELECT e1.x AS a, e1.y AS b, e2.y AS c
         |  FROM fwd e1
         |  JOIN fwd e2 ON e1.x = e2.x
         |    AND (e1.dy < e2.dy OR (e1.dy = e2.dy AND e1.y < e2.y))
         |  JOIN fwd e3 ON e3.x = e1.y AND e3.y = e2.y
         |), tpn AS (
         |  SELECT node, COUNT(*) AS t FROM (
         |    SELECT a AS node FROM tri
         |    UNION ALL SELECT b AS node FROM tri
         |    UNION ALL SELECT c AS node FROM tri
         |  ) GROUP BY node
         |), j AS (
         |  SELECT deg.d, COALESCE(tpn.t, 0) AS t
         |  FROM deg LEFT JOIN tpn ON deg.node = tpn.node
         |)
         |SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |  CAST(SUM(t) AS BIGINT) AS tri_sum,
         |  CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS wedge_sum,
         |  CASE WHEN SUM((d * (d - 1)) // 2) = 0 THEN NULL
         |       ELSE CAST(SUM(t) AS DOUBLE) /
         |            CAST(SUM((d * (d - 1)) // 2) AS DOUBLE) END AS coeff
         |FROM j GROUP BY 1
         |ORDER BY bucket""".stripMargin,

    "graph_degree_dist" ->
      s"""WITH ${coGraphCtes()}, deg AS (
         |  SELECT node, COUNT(*) AS d FROM (
         |    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
         |  ) GROUP BY node
         |)
         |SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |  CAST(MIN(d) AS BIGINT) AS min_deg,
         |  CAST(MAX(d) AS BIGINT) AS max_deg,
         |  CAST(SUM(d) AS BIGINT) AS deg_sum
         |FROM deg GROUP BY 1
         |ORDER BY bucket""".stripMargin,

    // engine uses: direct each edge low→high by (degree, id), wedge
    // join on canonically-ordered out-pairs, one equi-join closes each
    // triangle exactly once
    "graph_triangles" ->
      s"""WITH ${coGraphCtes()}, deg AS (
         |  SELECT node, COUNT(*) AS d FROM (
         |    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
         |  ) GROUP BY node
         |), fwd AS (
         |  SELECT
         |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
         |      THEN e.u ELSE e.v END AS x,
         |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
         |      THEN e.v ELSE e.u END AS y,
         |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
         |      THEN dv.d ELSE du.d END AS dy
         |  FROM e
         |  JOIN deg du ON e.u = du.node
         |  JOIN deg dv ON e.v = dv.node
         |), tri AS (
         |  SELECT COUNT(*) AS n_triangles
         |  FROM fwd e1
         |  JOIN fwd e2 ON e1.x = e2.x
         |    AND (e1.dy < e2.dy OR (e1.dy = e2.dy AND e1.y < e2.y))
         |  JOIN fwd e3 ON e3.x = e1.y AND e3.y = e2.y
         |), st AS (
         |  SELECT COUNT(*) AS n_nodes, SUM(d) // 2 AS n_edges,
         |    SUM((d * (d - 1)) // 2) AS n_wedges
         |  FROM deg
         |)
         |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
         |  CAST(n_edges AS BIGINT) AS n_edges,
         |  CAST(n_wedges AS BIGINT) AS n_wedges,
         |  CAST(n_triangles AS BIGINT) AS n_triangles,
         |  CASE WHEN n_wedges = 0 THEN NULL
         |    ELSE ${dbl(s"${dec("n_triangles * 3")} / n_wedges")} END AS clustering
         |FROM st, tri""".stripMargin,

    "graph_pagerank" -> pagerankSql,

    "graph_hits" -> hitsSql,

    // neighborhood-Jaccard node similarity: common-neighbor counts
    // from the wedge self-join (tighter support cut 35 — no
    // orientation shortcut exists for FULL common-neighbor counts),
    // union = da + db − cn, exact-decimal division, top-20. The nk CTE
    // mirrors the engine's per-center neighbor cap
    // (Graphs.neighborhoodSimilar via Buckets.members): only the cap
    // smallest neighbors per center expand into wedges; denominators
    // keep FULL degrees — identical on both sides.
    "graph_similar" ->
      s"""WITH ${coGraphCtes(35)}, sym AS (
         |  SELECT u AS src, v AS dst FROM e
         |  UNION ALL
         |  SELECT v AS src, u AS dst FROM e
         |), deg AS (
         |  SELECT src AS node, COUNT(*) AS d FROM sym GROUP BY src
         |), nk AS (
         |  SELECT src, dst,
         |    row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
         |  FROM sym
         |), w AS (
         |  SELECT a.dst AS na, b.dst AS nb, COUNT(*) AS cn
         |  FROM nk a JOIN nk b ON a.src = b.src AND a.dst < b.dst
         |  WHERE a.rn <= ${graft.ops.Buckets.MaxBucket}
         |    AND b.rn <= ${graft.ops.Buckets.MaxBucket}
         |  GROUP BY a.dst, b.dst
         |)
         |SELECT w.na, w.nb, CAST(w.cn AS BIGINT) AS cn,
         |  ${dbl(s"${dec("w.cn")} / (da.d + db.d - w.cn)")} AS jacc
         |FROM w
         |JOIN deg da ON w.na = da.node
         |JOIN deg db ON w.nb = db.node
         |ORDER BY jacc DESC, w.na, w.nb
         |LIMIT 20""".stripMargin,

    // L3 observability companion (the dedup_health pattern): how much
    // does the neighbor cap truncate the support-35 graph — zero at
    // every fixture scale, and the hub alarm at production scale
    "graph_health" ->
      s"""WITH ${coGraphCtes(35)}, sym AS (
         |  SELECT u AS src, v AS dst FROM e
         |  UNION ALL
         |  SELECT v AS src, u AS dst FROM e
         |), deg AS (
         |  SELECT src AS node, COUNT(*) AS d FROM sym GROUP BY src
         |)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |  CAST(SUM(d) // 2 AS BIGINT) AS n_edges,
         |  CAST(MAX(d) AS BIGINT) AS max_degree,
         |  CAST(SUM(CASE WHEN d > ${graft.ops.Buckets.MaxBucket}
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_capped_nodes,
         |  CAST(SUM(GREATEST(d - ${graft.ops.Buckets.MaxBucket}, 0))
         |    AS BIGINT) AS n_dropped_neighbors
         |FROM deg""".stripMargin,

    // H11 URL battery: same synthesized URL (pure function of the
    // row), dissected with anchored regexes — exact for this shape,
    // mirroring Spark's parse_url outputs field for field
    "fn_url" ->
      """WITH u AS (
        |  SELECT o_orderkey,
        |    'https://www.shop' || CAST(o_orderkey % 5 AS VARCHAR) ||
        |    '.example.com/cat/' || CAST(o_custkey % 7 AS VARCHAR) ||
        |    '/item?id=' || CAST(o_orderkey AS VARCHAR) ||
        |    '&pri=' || replace(o_orderpriority, ' ', '+') AS url
        |  FROM orders
        |)
        |SELECT o_orderkey,
        |  regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
        |  regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '\?(.*)$', 1) AS query,
        |  regexp_extract(url, '[?&]id=([^&]*)', 1) AS q_id,
        |  regexp_extract(url, '^([a-z]+)://', 1) AS proto
        |FROM u
        |ORDER BY o_orderkey""".stripMargin,

    // L4 component labeling: the dedup_clusters recursive min-label
    // closure over the SPARSE (support-48) co-occurrence graph — at
    // the looser cuts the graph is one giant component (vacuous
    // labels, n² reach pairs); at 48 it is hundreds of small
    // co-purchase components and the closure is bounded
    "graph_components" ->
      s"""WITH RECURSIVE ${coGraphCtes(graft.ops.Graphs.ComponentsMinQty)},
         |und AS (
         |  SELECT u AS src, v AS dst FROM e
         |  UNION ALL
         |  SELECT v AS src, u AS dst FROM e
         |), verts AS (
         |  SELECT DISTINCT src AS id FROM und
         |), reach(id, lbl) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.id
         |), comp AS (
         |  SELECT id AS node, MIN(lbl) AS component_id FROM reach GROUP BY id
         |), sz AS (
         |  SELECT component_id, COUNT(*) AS n_nodes
         |  FROM comp GROUP BY component_id
         |)
         |SELECT c.node, c.component_id, CAST(s.n_nodes AS BIGINT) AS n_nodes
         |FROM comp c JOIN sz s USING (component_id)
         |ORDER BY component_id, node""".stripMargin,

    // L8 bounded k-core peel: KcoreRounds unrolled (degree filter →
    // induced-edge filter) rounds over the identical capped edge CTE
    "graph_kcore" -> {
      val k = graft.ops.Graphs.KcoreK
      val last = s"e${graft.ops.Graphs.KcoreRounds}"
      val rounds = (1 to graft.ops.Graphs.KcoreRounds).map { i =>
        s"""und$i AS (
           |  SELECT u AS src, v AS dst FROM e${i - 1}
           |  UNION ALL
           |  SELECT v AS src, u AS dst FROM e${i - 1}
           |), keep$i AS (
           |  SELECT src AS id FROM und$i GROUP BY src
           |  HAVING count(*) >= $k
           |), e$i AS (
           |  SELECT u, v FROM e${i - 1}
           |  WHERE u IN (SELECT id FROM keep$i)
           |    AND v IN (SELECT id FROM keep$i)
           |)""".stripMargin
      }.mkString(", ")
      s"""WITH ${coGraphCtes()}, e0 AS (SELECT u, v FROM e), $rounds,
         |undf AS (
         |  SELECT u AS node FROM $last UNION ALL SELECT v FROM $last
         |)
         |SELECT node, CAST(count(*) AS BIGINT) AS degree
         |FROM undf GROUP BY node
         |ORDER BY node""".stripMargin
    },

    // L7 label propagation: Graphs.LpaRounds unrolled count+argmax
    // rounds over the identical capped edge CTE; argmax = row_number
    // ordered (c DESC, lbl) — the deterministic tie-min rule
    "graph_label_prop" -> {
      val rounds = (1 to graft.ops.Graphs.LpaRounds).map { i =>
        s"""r$i AS (
           |  SELECT u.src, l.lbl, count(*) AS c
           |  FROM und u JOIN l${i - 1} l ON l.id = u.dst
           |  GROUP BY u.src, l.lbl
           |), l$i AS (
           |  SELECT src AS id, lbl FROM (
           |    SELECT src, lbl,
           |      row_number() OVER (PARTITION BY src
           |        ORDER BY c DESC, lbl) AS rn
           |    FROM r$i) WHERE rn = 1
           |)""".stripMargin
      }.mkString(", ")
      val last = s"l${graft.ops.Graphs.LpaRounds}"
      s"""WITH ${coGraphCtes(graft.ops.Graphs.ComponentsMinQty)},
         |und AS (
         |  SELECT u AS src, v AS dst FROM e
         |  UNION ALL
         |  SELECT v AS src, u AS dst FROM e
         |), l0 AS (
         |  SELECT DISTINCT src AS id, src AS lbl FROM und
         |), $rounds, sz AS (
         |  SELECT lbl, count(*) AS n FROM $last GROUP BY lbl
         |)
         |SELECT $last.id AS node, $last.lbl AS community,
         |  CAST(sz.n AS BIGINT) AS n_members
         |FROM $last JOIN sz USING (lbl)
         |ORDER BY community, node""".stripMargin
    },

    // L9 modularity of the L7 partition: the identical unrolled-LPA
    // labels extended with the Newman-Girvan aggregation — one exact
    // integer numerator over one decimal division (the share
    // discipline), bit-agreed between engines
    "graph_modularity" -> {
      val rounds = (1 to graft.ops.Graphs.LpaRounds).map { i =>
        s"""r$i AS (
           |  SELECT u.src, l.lbl, count(*) AS c
           |  FROM und u JOIN l${i - 1} l ON l.id = u.dst
           |  GROUP BY u.src, l.lbl
           |), l$i AS (
           |  SELECT src AS id, lbl FROM (
           |    SELECT src, lbl,
           |      row_number() OVER (PARTITION BY src
           |        ORDER BY c DESC, lbl) AS rn
           |    FROM r$i) WHERE rn = 1
           |)""".stripMargin
      }.mkString(", ")
      val last = s"l${graft.ops.Graphs.LpaRounds}"
      s"""WITH ${coGraphCtes(graft.ops.Graphs.ComponentsMinQty)},
         |und AS (
         |  SELECT u AS src, v AS dst FROM e
         |  UNION ALL
         |  SELECT v AS src, u AS dst FROM e
         |), l0 AS (
         |  SELECT DISTINCT src AS id, src AS lbl FROM und
         |), $rounds, tagged AS (
         |  SELECT a.lbl AS lu, b.lbl AS lv
         |  FROM e JOIN $last a ON a.id = e.u JOIN $last b ON b.id = e.v
         |), mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges FROM e),
         |ein AS (SELECT CAST(COUNT(*) AS BIGINT) AS e_in
         |  FROM tagged WHERE lu = lv),
         |degc AS (
         |  SELECT l.lbl, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e) s
         |  JOIN $last l ON l.id = s.n
         |  GROUP BY l.lbl
         |), sums AS (SELECT CAST(SUM(d * d) AS BIGINT) AS sum_d2,
         |  CAST(COUNT(*) AS BIGINT) AS n_communities FROM degc)
         |SELECT sums.n_communities, mm.m_edges,
         |  ein.e_in AS n_internal_edges,
         |  ${dbl(s"${dec("(4 * mm.m_edges * ein.e_in - sums.sum_d2)")} / " +
             "(4 * mm.m_edges * mm.m_edges)")} AS modularity
         |FROM mm, ein, sums""".stripMargin
    },

    // L6 bounded-depth BFS: recursive min-distance closure over the
    // same support-48 edge CTE, depth-guarded at Graphs.BfsMaxHops —
    // UNION (set) semantics bound the (id, d) space so the recursion
    // terminates on cyclic graphs
    "graph_bfs" ->
      s"""WITH RECURSIVE ${coGraphCtes(graft.ops.Graphs.ComponentsMinQty)},
         |und AS (
         |  SELECT u AS src, v AS dst FROM e
         |  UNION ALL
         |  SELECT v AS src, u AS dst FROM e
         |), seed AS (
         |  SELECT MIN(src) AS s FROM und
         |), walk(id, d) AS (
         |  SELECT s, 0 FROM seed
         |  UNION
         |  SELECT u.dst, w.d + 1 FROM walk w
         |  JOIN und u ON u.src = w.id
         |  WHERE w.d < ${graft.ops.Graphs.BfsMaxHops}
         |)
         |SELECT id AS node, CAST(MIN(d) AS INT) AS dist
         |FROM walk GROUP BY id
         |ORDER BY node""".stripMargin,

    // Z-order layout audit: Morton-interleave the low 16 bits of
    // (l_partkey, l_suppkey) — the same magic-number dilation as
    // graft.ops.Layout.spread16 — and report per-16-bit-prefix-bucket
    // row counts and dimension min/max (the per-file skipping stats)
    "layout_zorder" ->
      s"""WITH $mortonZCtes
         |SELECT CAST(z >> 16 AS INT) AS z_bucket, CAST(COUNT(*) AS BIGINT) AS n,
         |  MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
         |  MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
         |FROM z
         |GROUP BY z >> 16
         |ORDER BY z_bucket""".stripMargin,

    // F10 zone-map skipping over the same Z-files: candidate = zone
    // overlap with [400, 480]; rows_missed proves overlap soundness
    "layout_zonemap_skip" ->
      s"""WITH $mortonZCtes, f AS (
         |  SELECT z >> 16 AS file_id, COUNT(*) AS n_rows,
         |    MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
         |    SUM(CASE WHEN l_partkey BETWEEN 400 AND 480 THEN 1 ELSE 0 END)
         |      AS n_match
         |  FROM z GROUP BY 1
         |)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
         |  CAST(SUM(CASE WHEN max_part >= 400 AND min_part <= 480
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_candidate_files,
         |  CAST(SUM(CASE WHEN n_match > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_matching_files,
         |  CAST(SUM(n_rows) AS BIGINT) AS rows_total,
         |  CAST(SUM(CASE WHEN max_part >= 400 AND min_part <= 480
         |    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
         |  CAST(SUM(n_match) AS BIGINT) AS rows_matched,
         |  CAST(SUM(CASE WHEN NOT (max_part >= 400 AND min_part <= 480)
         |    THEN n_match ELSE 0 END) AS BIGINT) AS rows_missed
         |FROM f""".stripMargin,

    // F11 per-column profile: canonical string form (cents for the
    // double; BIGINT/DATE text is engine-identical), melt, then the
    // same two-level exact-NDV aggregation as the engine
    "stats_table_profile" ->
      s"""WITH canon AS (
         |  SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
         |    CAST(o_custkey AS VARCHAR) AS o_custkey,
         |    o_orderstatus,
         |    CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR)
         |      AS o_totalprice_cents,
         |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
         |    o_orderpriority
         |  FROM orders
         |), stacked AS (
         |  SELECT 'o_orderkey' AS col_name, o_orderkey AS val FROM canon
         |  UNION ALL SELECT 'o_custkey', o_custkey FROM canon
         |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM canon
         |  UNION ALL SELECT 'o_totalprice_cents', o_totalprice_cents FROM canon
         |  UNION ALL SELECT 'o_orderdate', o_orderdate FROM canon
         |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM canon
         |), pv AS (
         |  SELECT col_name, val, COUNT(*) AS c FROM stacked GROUP BY 1, 2
         |), p AS (
         |  SELECT col_name, SUM(c) AS n_rows,
         |    SUM(CASE WHEN val IS NULL THEN c ELSE 0 END) AS n_nulls,
         |    COUNT(val) AS n_distinct,
         |    SUM(CASE WHEN val IS NOT NULL THEN length(val) * c ELSE 0 END)
         |      AS len_sum
         |  FROM pv GROUP BY col_name
         |)
         |SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
         |  CAST(n_nulls AS BIGINT) AS n_nulls,
         |  CAST(n_distinct AS BIGINT) AS n_distinct,
         |  CASE WHEN n_rows > n_nulls THEN
         |    ${dbl(s"${dec("len_sum")} / (n_rows - n_nulls)")} END AS avg_len
         |FROM p
         |ORDER BY col_name""".stripMargin,

    // F12 delete plan: same synthesized inventory as F9; touched files
    // rewrite WHOLE (copy-on-write), amplification = rewritten/deleted
    "layout_delete_plan" ->
      s"""WITH fr AS (
         |  SELECT CAST(ts AS DATE) AS part, user_id % 50 AS file_id,
         |    64 + length(COALESCE(props, '')) AS row_bytes,
         |    user_id % 97 = 0 AS del
         |  FROM events
         |), f AS (
         |  SELECT part, file_id, COUNT(*) AS n_rows, SUM(row_bytes) AS bytes,
         |    SUM(CASE WHEN del THEN 1 ELSE 0 END) AS n_del,
         |    SUM(CASE WHEN del THEN row_bytes ELSE 0 END) AS del_bytes
         |  FROM fr GROUP BY part, file_id
         |)
         |SELECT part, CAST(COUNT(*) AS BIGINT) AS n_files,
         |  CAST(SUM(CASE WHEN n_del > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_files_touched,
         |  CAST(SUM(n_del) AS BIGINT) AS rows_deleted,
         |  CAST(SUM(del_bytes) AS BIGINT) AS bytes_deleted,
         |  CAST(SUM(CASE WHEN n_del > 0 THEN bytes ELSE 0 END) AS BIGINT)
         |    AS bytes_rewritten,
         |  CASE WHEN SUM(del_bytes) > 0 THEN
         |    ${dbl(s"${dec("SUM(CASE WHEN n_del > 0 THEN bytes ELSE 0 END)")} / SUM(del_bytes)")}
         |  END AS amplification
         |FROM f GROUP BY part
         |ORDER BY part""".stripMargin,

    // compaction plan over the synthesized file inventory (partition =
    // event date, file = user_id mod 50, size = sum of 64+len(props));
    // banding: group = floor(bytes-before / 8192) over file_id order
    "layout_compaction" ->
      """WITH fr AS (
        |  SELECT CAST(ts AS DATE) AS part, user_id % 50 AS file_id,
        |    64 + length(COALESCE(props, '')) AS row_bytes
        |  FROM events
        |), f AS (
        |  SELECT part, file_id, CAST(SUM(row_bytes) AS BIGINT) AS bytes
        |  FROM fr GROUP BY part, file_id
        |), c AS (
        |  SELECT part, bytes,
        |    SUM(bytes) OVER (PARTITION BY part ORDER BY file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes
        |      AS cum_before
        |  FROM f
        |), g AS (
        |  SELECT part, cum_before // 8192 AS grp,
        |    COUNT(*) AS n_files, SUM(bytes) AS bytes
        |  FROM c GROUP BY part, cum_before // 8192
        |)
        |SELECT part, CAST(SUM(n_files) AS BIGINT) AS n_files,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN n_files > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_compacted_groups,
        |  CAST(SUM(bytes) AS BIGINT) AS bytes_total,
        |  CAST(SUM(CASE WHEN n_files > 1 THEN bytes ELSE 0 END) AS BIGINT)
        |    AS bytes_moved
        |FROM g
        |GROUP BY part
        |ORDER BY part""".stripMargin,

    // ---------------- K: LLM-data ops ----------------
    // K73 soft dedup: copy counts group sha256(text); 1/n weights
    // term-rounded 9 dp, DECIMAL(28,9)-summed (text_entropy discipline)
    "dedup_soft" ->
      """WITH c AS (
        |  SELECT sha256(text) AS h, COUNT(*) AS n_copies
        |  FROM documents GROUP BY 1
        |), d AS (
        |  SELECT doc_id, source, sha256(text) AS h FROM documents
        |), g AS (
        |  SELECT d.source, c.n_copies FROM d JOIN c ON d.h = c.h
        |)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  round(CAST(SUM(CAST(round(1.0 / n_copies, 9) AS DECIMAL(28,9)))
        |             AS DOUBLE), 6) AS eff_docs,
        |  round(round(CAST(SUM(CAST(round(1.0 / n_copies, 9)
        |                            AS DECIMAL(28,9))) AS DOUBLE), 6)
        |        / COUNT(*), 6) AS eff_ratio
        |FROM g
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    // K74 tokenizer fertility: BPE pre-tokens (the K17 regex) per
    // whitespace word, grouped by the corpus lang label
    "text_fertility" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_ws,
         |  CAST(SUM(len(regexp_extract_all(text,
         |    ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))) AS BIGINT) AS n_bpe,
         |  ${dbl(s"${dec("SUM(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')))")} / SUM(len(str_split(text, ' ')))")}
         |    AS fertility
         |FROM documents
         |GROUP BY lang
         |ORDER BY lang""".stripMargin,

    // K77 n-gram novelty: the shared trigram relation, doc frequency
    // grouped by the shingle TEXT (collision-free mirror of the
    // engine's xxhash64 key)
    "text_ngram_novelty" ->
      s"""WITH $shingleCtes, sh AS (
         |  SELECT doc_id, UNNEST(shingles) AS shingle FROM d
         |), dfreq AS (
         |  SELECT shingle, COUNT(DISTINCT doc_id) AS nd
         |  FROM sh GROUP BY shingle
         |), perdoc AS (
         |  SELECT sh.doc_id, COUNT(*) AS tt,
         |    SUM(CASE WHEN dfreq.nd = 1 THEN 1 ELSE 0 END) AS nv
         |  FROM sh JOIN dfreq ON sh.shingle = dfreq.shingle
         |  GROUP BY sh.doc_id
         |)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(tt) AS BIGINT) AS n_shingles,
         |  CAST(SUM(nv) AS BIGINT) AS n_novel,
         |  round(CAST(SUM(nv) AS DOUBLE) / CAST(SUM(tt) AS DOUBLE), 6)
         |    AS novelty
         |FROM perdoc JOIN documents USING (doc_id)
         |GROUP BY source
         |ORDER BY source""".stripMargin,

    // K78 balanced subsample: per-language md5 ranking against the
    // min class count
    "sample_balanced" ->
      """WITH counts AS (
        |  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
        |), cap AS (SELECT MIN(n) AS cap FROM counts),
        |ranked AS (
        |  SELECT lang, CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5('bal' || CAST(doc_id AS VARCHAR)), doc_id)
        |    AS BIGINT) AS rk
        |  FROM documents
        |)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN rk <= cap THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  round(CAST(SUM(CASE WHEN rk <= cap THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS kept_share
        |FROM ranked, cap
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    // K85 Neyman allocation: exact moments per stratum, 6-dp-rounded
    // weights summed as exact DECIMAL
    "sample_neyman" ->
      """WITH m AS (
        |  SELECT lang, COUNT(*) AS n,
        |    CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(n_chars AS DECIMAL(18,0)) * n_chars) AS DOUBLE)
        |      AS sxx
        |  FROM documents GROUP BY lang
        |), wtd AS (
        |  SELECT lang, n,
        |    round(sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
        |               / (CAST(n AS DOUBLE) - 1)), 6) AS sd_chars,
        |    CAST(round(CAST(n AS DOUBLE) *
        |      sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
        |           / (CAST(n AS DOUBLE) - 1)), 6) AS DECIMAL(28,6)) AS w
        |  FROM m
        |), tot AS (SELECT SUM(w) AS wtot FROM wtd)
        |SELECT lang, CAST(n AS BIGINT) AS n_docs, sd_chars,
        |  round(CAST(w AS DOUBLE) / CAST(wtot AS DOUBLE), 6)
        |    AS weight_share,
        |  round(10000.0 * CAST(w AS DOUBLE) / CAST(wtot AS DOUBLE), 2)
        |    AS alloc_10k
        |FROM wtd, tot
        |ORDER BY lang""".stripMargin,

    // K86 audio framing: closed forms of the 25ms/10ms STFT geometry
    // over the declared 4-bytes-per-sample PCM interpretation
    "multimodal_audio_frames" ->
      """WITH g AS (
        |  SELECT source,
        |    CAST(octet_length(encode(text)) AS BIGINT) // 4 AS samples
        |  FROM documents
        |), f AS (
        |  SELECT source, samples,
        |    CASE WHEN samples < 400 THEN 0
        |         ELSE (samples - 400) // 160 + 1 END AS frames
        |  FROM g
        |)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_assets,
        |  CAST(SUM(CASE WHEN frames = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_too_short,
        |  CAST(SUM(samples) AS BIGINT) AS n_samples,
        |  CAST(SUM(frames) AS BIGINT) AS n_frames,
        |  CAST(SUM(frames * 400) AS BIGINT) AS n_frame_samples,
        |  round(CAST(SUM(frames * 400) AS DOUBLE) /
        |    CAST(SUM(samples) AS DOUBLE), 6) AS read_factor
        |FROM f
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    // K75 sliding-window chunking: closed integer forms of the
    // LangChain splitter geometry (S=128, T=96); emitted tokens =
    // L + (S-T)*(n_chunks-1)
    "chunk_sliding" ->
      """WITH g AS (
        |  SELECT source, CAST(len(str_split(text, ' ')) AS BIGINT) AS len
        |  FROM documents
        |), c AS (
        |  SELECT source, len,
        |    CASE WHEN len <= 128 THEN 1
        |         ELSE (len - 128 + 95) // 96 + 1 END AS n_chunks
        |  FROM g
        |)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
        |  CAST(SUM(len + 32 * (n_chunks - 1)) AS BIGINT) AS n_emitted,
        |  round(CAST(SUM(len + 32 * (n_chunks - 1)) AS DOUBLE) /
        |    CAST(SUM(len) AS DOUBLE), 6) AS redundancy
        |FROM c
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    // K76 packing-efficiency curve: doc-per-sequence padding bill per
    // candidate context length; the 4-way unnest multiplies only the
    // scalar length frame
    "pack_efficiency" ->
      """WITH g AS (
        |  SELECT CAST(len(str_split(text, ' ')) AS BIGINT) AS len
        |  FROM documents
        |), e AS (
        |  SELECT len, CAST(ctx AS BIGINT) AS ctx,
        |    (len + CAST(ctx AS BIGINT) - 1) // CAST(ctx AS BIGINT) AS seqs
        |  FROM g, (SELECT UNNEST([256, 512, 1024, 2048]) AS ctx) t
        |)
        |SELECT ctx, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len) AS BIGINT) AS n_tokens,
        |  CAST(SUM(seqs) AS BIGINT) AS n_seqs,
        |  CAST(SUM(seqs * ctx) - SUM(len) AS BIGINT) AS n_padding,
        |  round(CAST(SUM(len) AS DOUBLE) /
        |    CAST(SUM(seqs * ctx) AS DOUBLE), 6) AS efficiency
        |FROM e
        |GROUP BY ctx
        |ORDER BY ctx""".stripMargin,

    // J36 Kaplan-Meier life table: per-user (start, end, event) frame,
    // cumulative entered/exited window sums over the distinct-day
    // spine; hazard is the sole division, NULL on an empty risk set
    "events_survival" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, event_type, value
        |  FROM events
        |), per AS (
        |  SELECT user_id, MIN(day) AS start_day, MAX(day) AS last_day,
        |    MIN(CASE WHEN event_type = 'purchase' AND value >= 100.0
        |             THEN day END) AS purch_day
        |  FROM ev GROUP BY user_id
        |), per2 AS (
        |  SELECT user_id, start_day,
        |    COALESCE(purch_day, last_day) AS end_day,
        |    purch_day IS NOT NULL AS is_event
        |  FROM per
        |), spine AS (SELECT DISTINCT day FROM ev),
        |st AS (SELECT start_day AS day, COUNT(*) AS n_start
        |       FROM per2 GROUP BY 1),
        |en AS (SELECT end_day AS day, COUNT(*) AS n_end,
        |         SUM(CASE WHEN is_event THEN 1 ELSE 0 END) AS d,
        |         SUM(CASE WHEN is_event THEN 0 ELSE 1 END) AS c
        |       FROM per2 GROUP BY 1),
        |tl AS (
        |  SELECT s.day,
        |    SUM(COALESCE(st.n_start, 0)) OVER (ORDER BY s.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS entered,
        |    SUM(COALESCE(en.n_end, 0)) OVER (ORDER BY s.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - COALESCE(en.n_end, 0) AS exited_before,
        |    COALESCE(en.d, 0) AS d, COALESCE(en.c, 0) AS c
        |  FROM spine s
        |  LEFT JOIN st ON s.day = st.day
        |  LEFT JOIN en ON s.day = en.day
        |)
        |SELECT day, CAST(entered - exited_before AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
        |  CASE WHEN entered - exited_before > 0
        |    THEN round(CAST(d AS DOUBLE) /
        |               CAST(entered - exited_before AS DOUBLE), 9)
        |  END AS hazard
        |FROM tl
        |ORDER BY day""".stripMargin,

    // E13 period-over-period: epoch-week buckets, exact cents, lag
    // over the collapsed week spine
    "win_pop_change" ->
      """WITH weekly AS (
        |  SELECT CAST((CAST(ts AS DATE) - DATE '1970-01-01') // 7
        |    AS BIGINT) AS week,
        |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS revenue_cents
        |  FROM events GROUP BY 1
        |)
        |SELECT week, revenue_cents,
        |  lag(revenue_cents) OVER (ORDER BY week) AS prev_cents,
        |  CASE WHEN lag(revenue_cents) OVER (ORDER BY week) <> 0
        |    THEN round(CAST(revenue_cents -
        |      lag(revenue_cents) OVER (ORDER BY week) AS DOUBLE) /
        |      CAST(lag(revenue_cents) OVER (ORDER BY week) AS DOUBLE), 6)
        |  END AS pct_change
        |FROM weekly
        |ORDER BY week""".stripMargin,

    // E12 streaks: gaps-and-islands over exact daily cents; first-row
    // and non-increase days both break (CASE NULL -> ELSE 1)
    "win_streaks" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)
        |), flagged AS (
        |  SELECT user_id, day,
        |    CASE WHEN v > lag(v) OVER (PARTITION BY user_id ORDER BY day)
        |         THEN 0 ELSE 1 END AS brk
        |  FROM daily
        |), isl AS (
        |  SELECT user_id,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flagged
        |), runs AS (
        |  SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS run_len
        |  FROM isl GROUP BY user_id, island
        |)
        |SELECT user_id, CAST(SUM(run_len) AS BIGINT) AS n_days,
        |  CAST(MAX(run_len) AS BIGINT) AS longest_up_run
        |FROM runs GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // J37 stickiness: weeks are integer epoch-day DIV 7 (calendar week
    // functions disagree across engines); one division per week
    "events_stickiness" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), ud2 AS (
        |  SELECT user_id, day,
        |    CAST((day - DATE '1970-01-01') // 7 AS BIGINT) AS week
        |  FROM ud
        |), dau AS (
        |  SELECT week, day, CAST(COUNT(*) AS BIGINT) AS dau
        |  FROM ud2 GROUP BY week, day
        |), weekly AS (
        |  SELECT week, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(dau) AS BIGINT) AS dau_total
        |  FROM dau GROUP BY week
        |), wau AS (
        |  SELECT week, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM ud2 GROUP BY week
        |)
        |SELECT weekly.week, n_days, wau, dau_total,
        |  round(CAST(dau_total AS DOUBLE) /
        |    CAST(n_days * wau AS DOUBLE), 9) AS stickiness
        |FROM weekly JOIN wau ON weekly.week = wau.week
        |ORDER BY weekly.week""".stripMargin,

    // H19 lambda battery: list_transform/list_filter/list_aggregate —
    // every scalar integer-exact
    "fn_lambda" ->
      """WITH p AS (
        |  SELECT p_partkey, str_split(p_name, ' ') AS toks FROM part
        |)
        |SELECT p_partkey,
        |  CAST(len(list_filter(toks, t -> length(t) > 4)) AS BIGINT)
        |    AS n_long,
        |  CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
        |    AS BIGINT) AS len_sum,
        |  array_to_string(list_transform(toks, t -> upper(t)), '-')
        |    AS upper_join,
        |  list_contains(toks, 'widget') AS has_widget,
        |  len(list_filter(toks, t -> length(t) < 3)) = 0 AS all_min3
        |FROM p
        |ORDER BY p_partkey""".stripMargin,

    // J39 inter-event cadence: exact integer micros gaps, exact
    // DECIMAL moments, one IEEE mean/sd tree per type
    "events_inter_event" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS gap
        |  FROM events
        |), m AS (
        |  SELECT event_type, COUNT(*) AS n0,
        |    CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DOUBLE) AS sg,
        |    CAST(SUM(CAST(gap AS DECIMAL(38,0)) * gap) AS DOUBLE) AS sgg
        |  FROM g WHERE gap IS NOT NULL GROUP BY event_type
        |)
        |SELECT event_type, CAST(n0 AS BIGINT) AS n_gaps,
        |  round((sg / CAST(n0 AS DOUBLE)) / 1000000.0, 6) AS mean_gap_s,
        |  round(sqrt((sgg - sg * sg / CAST(n0 AS DOUBLE))
        |             / (CAST(n0 AS DOUBLE) - 1)) / 1000000.0, 6)
        |    AS sd_gap_s
        |FROM m
        |ORDER BY event_type""".stripMargin,

    // G6 symmetric difference: two EXCEPTs + UNION ALL of tagged
    // disjoint sides
    "set_symmetric_diff" ->
      """WITH r AS (
        |  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        |), a AS (
        |  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        |)
        |SELECT l_orderkey, 'returned_only' AS side
        |FROM (SELECT l_orderkey FROM r EXCEPT SELECT l_orderkey FROM a)
        |UNION ALL
        |SELECT l_orderkey, 'accepted_only' AS side
        |FROM (SELECT l_orderkey FROM a EXCEPT SELECT l_orderkey FROM r)
        |ORDER BY side, l_orderkey""".stripMargin,

    // J42 seasonality: weekday = epoch days mod 7 (0=Thursday) —
    // calendar DOW functions disagree on the week start across engines
    "events_seasonality" ->
      """WITH e AS (
        |  SELECT CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7
        |    AS BIGINT) AS dow,
        |    user_id, CAST(round(value * 100, 0) AS BIGINT) AS vc
        |  FROM events
        |), g AS (
        |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |    CAST(SUM(vc) AS BIGINT) AS revenue_cents
        |  FROM e GROUP BY dow
        |), tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM g)
        |SELECT dow, n_events, n_users, revenue_cents,
        |  round(CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE), 6)
        |    AS share
        |FROM g, tot
        |ORDER BY dow""".stripMargin,

    // J41 SES run rate: 16-term truncated α=1/2 smoothing — every
    // weight an exact power of two, terms bit-exact before the
    // 9-dp round + DECIMAL sum
    "events_forecast_ses" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)
        |), idx AS (
        |  SELECT user_id, y,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) - 1
        |      AS BIGINT) AS t
        |  FROM daily
        |), lastd AS (
        |  SELECT user_id, MAX(t) AS tn, CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM idx GROUP BY user_id
        |), terms AS (
        |  SELECT i.user_id, l.n_days,
        |    CASE WHEN i.t = 0 THEN l.tn ELSE l.tn - i.t + 1 END AS k, i.y
        |  FROM idx i JOIN lastd l ON i.user_id = l.user_id
        |  WHERE i.t >= CASE WHEN l.tn >= 16 THEN l.tn - 15 ELSE 0 END
        |)
        |SELECT user_id, n_days,
        |  round(CAST(SUM(CAST(round(CAST(y AS DOUBLE) /
        |    CAST((CAST(1 AS BIGINT) << k) AS DOUBLE), 9) AS DECIMAL(28,9)))
        |    AS DOUBLE), 6) AS ses
        |FROM terms
        |GROUP BY user_id, n_days
        |ORDER BY user_id""".stripMargin,

    // J38 power-user curve: histogram over the active-day domain with
    // a descending cumulative "at least d days" share
    "events_power_curve" ->
      """WITH act AS (
        |  SELECT user_id, COUNT(DISTINCT CAST(ts AS DATE)) AS active_days
        |  FROM events GROUP BY user_id
        |), byd AS (
        |  SELECT CAST(active_days AS BIGINT) AS active_days,
        |    CAST(COUNT(*) AS BIGINT) AS n_users
        |  FROM act GROUP BY active_days
        |), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users_total FROM act)
        |SELECT active_days, n_users,
        |  CAST(SUM(n_users) OVER (ORDER BY active_days DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users_at_least,
        |  round(CAST(SUM(n_users) OVER (ORDER BY active_days DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / n_users_total, 6) AS pct_at_least
        |FROM byd, tot
        |ORDER BY active_days""".stripMargin,

    "dedup_exact" ->
      """WITH h AS (SELECT doc_id, sha256(text) AS text_sha FROM documents),
        |r AS (SELECT doc_id, text_sha,
        |        row_number() OVER (PARTITION BY text_sha ORDER BY doc_id) AS rn
        |      FROM h)
        |SELECT doc_id, text_sha FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "dedup_ngram_jaccard" -> ngramJaccardSql,

    // K52 incremental dedup: only old-by-new candidates via the stored
    // capped bucket membership (rank over OLD docs only); the same
    // shingle CTEs, melt-free since DuckDB intersects the lists
    // directly; best partner = min old id at the max duplicate score
    "dedup_incremental" ->
      s"""WITH $shingleCtes, nw AS (
         |  SELECT doc_id, shingles, bucket FROM bk WHERE doc_id % 10 = 0
         |), old AS (
         |  SELECT doc_id, shingles, bucket,
         |    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
         |  FROM bk WHERE doc_id % 10 <> 0
         |), sc AS (
         |  SELECT n.doc_id AS doc_new, o.doc_id AS doc_old,
         |    len(list_intersect(n.shingles, o.shingles)) AS n_int,
         |    len(n.shingles) + len(o.shingles)
         |      - len(list_intersect(n.shingles, o.shingles)) AS n_union
         |  FROM nw n JOIN old o
         |    ON n.bucket = o.bucket AND o.rn <= ${graft.ops.Buckets.MaxBucket}
         |), sj AS (
         |  SELECT doc_new, doc_old,
         |    ${dbl(s"${dec("n_int")} / n_union")} AS j
         |  FROM sc
         |), agg AS (
         |  SELECT doc_new, COUNT(*) AS n_cand,
         |    SUM(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) AS n_dups,
         |    MAX(CASE WHEN j >= 0.5 THEN j END) AS best_jaccard
         |  FROM sj GROUP BY doc_new
         |), best AS (
         |  SELECT sj.doc_new, MIN(sj.doc_old) AS best_old
         |  FROM sj JOIN agg USING (doc_new)
         |  WHERE agg.best_jaccard IS NOT NULL AND sj.j = agg.best_jaccard
         |  GROUP BY sj.doc_new
         |)
         |SELECT d.doc_id AS doc_new,
         |  CAST(coalesce(a.n_cand, 0) AS BIGINT) AS n_cand,
         |  CAST(coalesce(a.n_dups, 0) AS BIGINT) AS n_dups,
         |  a.best_jaccard, b.best_old,
         |  coalesce(a.n_dups, 0) = 0 AS is_novel
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
         |LEFT JOIN agg a ON d.doc_id = a.doc_new
         |LEFT JOIN best b ON d.doc_id = b.doc_new
         |ORDER BY doc_new""".stripMargin,

    // asymmetric containment over the SAME min-shingle candidate pairs
    // (and the same skew-cap rank): C(X in Y) = |X∩Y| / |X| per side,
    // kept when either direction ≥ 0.5; contained_doc picks the more-
    // contained side (ties → doc_a, matching the engine's >=)
    "dedup_containment" ->
      s"""WITH $shingleCtes, rk AS (
         |  SELECT doc_id, shingles, bucket,
         |    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
         |  FROM bk
         |), pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    len(list_intersect(a.shingles, b.shingles)) AS n_shared,
         |    len(a.shingles) AS n_a, len(b.shingles) AS n_b
         |  FROM rk a JOIN rk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  WHERE a.rn <= ${graft.ops.Buckets.MaxBucket}
         |    AND b.rn <= ${graft.ops.Buckets.MaxBucket}
         |), sc AS (
         |  SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
         |    ${dbl(s"${dec("n_shared")} / n_a")} AS c_ab,
         |    ${dbl(s"${dec("n_shared")} / n_b")} AS c_ba
         |  FROM pairs
         |)
         |SELECT doc_a, doc_b, n_shared, c_ab, c_ba,
         |  CASE WHEN c_ab >= c_ba THEN doc_a ELSE doc_b END AS contained_doc
         |FROM sc
         |WHERE GREATEST(c_ab, c_ba) >= CAST(0.5 AS DOUBLE)
         |ORDER BY doc_a, doc_b""".stripMargin,

    // min-label closure over the SAME pair relation: every label
    // reachable from a vertex is enumerated by the recursive CTE
    // (UNION dedupes, so it terminates), and MIN picks the component
    // representative — the declarative mirror of the engine's
    // iterative min-label propagation (graft.ops.Components).
    // K81 dedup savings: the K19 closure labels joined to token
    // lengths — removable = non-canonical cluster members
    "dedup_savings" ->
      s"""WITH RECURSIVE jacc AS (
         |  SELECT doc_a, doc_b FROM ($ngramJaccardSql)
         |), und AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jacc
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM jacc
         |), verts AS (
         |  SELECT DISTINCT src AS id FROM und
         |), reach(id, lbl) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.id
         |), rm AS (
         |  SELECT id AS doc_id FROM reach GROUP BY id
         |  HAVING id <> MIN(lbl)
         |), toks AS (
         |  SELECT doc_id, source,
         |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents
         |)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN rm.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_removable_docs,
         |  CAST(SUM(CASE WHEN rm.doc_id IS NOT NULL THEN n_tok ELSE 0 END)
         |    AS BIGINT) AS n_removable_tokens,
         |  round(CAST(SUM(CASE WHEN rm.doc_id IS NOT NULL THEN n_tok
         |                 ELSE 0 END) AS DOUBLE)
         |    / CAST(SUM(n_tok) AS DOUBLE), 6) AS savings_ratio
         |FROM toks LEFT JOIN rm USING (doc_id)
         |GROUP BY source
         |ORDER BY source""".stripMargin,

    "dedup_clusters" ->
      s"""WITH RECURSIVE jacc AS (
         |  SELECT doc_a, doc_b FROM ($ngramJaccardSql)
         |), und AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jacc
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM jacc
         |), verts AS (
         |  SELECT DISTINCT src AS id FROM und
         |), reach(id, lbl) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.id
         |)
         |SELECT id AS doc_id, MIN(lbl) AS cluster_id,
         |  id = MIN(lbl) AS is_canonical
         |FROM reach
         |GROUP BY id
         |ORDER BY cluster_id, doc_id""".stripMargin,

    // cross-source duplication matrix: the shared K6 pair relation
    // joined back to documents, source pair normalized unordered
    "dedup_source_overlap" ->
      s"""WITH jacc AS (
         |  SELECT doc_a, doc_b FROM ($ngramJaccardSql)
         |)
         |SELECT least(da.source, db.source) AS src_a,
         |  greatest(da.source, db.source) AS src_b,
         |  count(*) AS n_pairs
         |FROM jacc j
         |JOIN documents da ON j.doc_a = da.doc_id
         |JOIN documents db ON j.doc_b = db.doc_id
         |GROUP BY 1, 2
         |ORDER BY src_a, src_b""".stripMargin,

    // the same recursive closure, composed to the quality-aware
    // representative pick: per cluster, the longest member wins
    // (tie-break: smallest doc_id) — mirrored as row_number() = 1
    "dedup_keep_best" ->
      s"""WITH RECURSIVE jacc AS (
         |  SELECT doc_a, doc_b FROM ($ngramJaccardSql)
         |), und AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jacc
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM jacc
         |), verts AS (
         |  SELECT DISTINCT src AS id FROM und
         |), reach(id, lbl) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.id
         |), clusters AS (
         |  SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id
         |), m AS (
         |  SELECT c.cluster_id, c.doc_id, d.n_chars,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |      ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
         |  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
         |)
         |SELECT cluster_id,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
         |  count(*) AS n_members,
         |  CAST(sum(n_chars) AS BIGINT) AS bytes_cluster
         |FROM m GROUP BY cluster_id
         |ORDER BY cluster_id""".stripMargin,

    // the same recursive closure, composed to the one-row dedup
    // decision summary: canonical survivors keep their bytes, the rest
    // are removed; unclustered documents are trivially canonical
    "dedup_end_to_end" ->
      s"""WITH RECURSIVE jacc AS (
         |  SELECT doc_a, doc_b FROM ($ngramJaccardSql)
         |), und AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jacc
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM jacc
         |), verts AS (
         |  SELECT DISTINCT src AS id FROM und
         |), reach(id, lbl) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT u.dst, r.lbl FROM reach r JOIN und u ON u.src = r.id
         |), clusters AS (
         |  SELECT id AS doc_id, id = MIN(lbl) AS is_canonical
         |  FROM reach GROUP BY id
         |), flags AS (
         |  SELECT dd.n_chars, COALESCE(c.is_canonical, TRUE) AS keep
         |  FROM documents dd LEFT JOIN clusters c ON dd.doc_id = c.doc_id
         |)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
         |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         |  CAST(SUM(n_chars) AS BIGINT) AS bytes_total,
         |  CAST(SUM(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS bytes_kept,
         |  CAST(SUM(CASE WHEN keep THEN 0 ELSE n_chars END) AS BIGINT) AS bytes_removed
         |FROM flags""".stripMargin,

    // bucket-population health over the SQL-portable min-shingle
    // family; the MinHash / embedding-LSH overflow totals are pinned at
    // their brute-force-proven fixture ground truth (0 — see
    // GroundTruthSpec: zero truncation is what makes those candidate
    // sets complete), so engine-side truncation fails this row loudly
    "dedup_health" ->
      s"""WITH $shingleCtes, counts AS (
         |  SELECT bucket, COUNT(*) AS n FROM bk GROUP BY bucket
         |  HAVING COUNT(*) > 1
         |)
         |SELECT CAST(COUNT(*) AS BIGINT) AS ngram_buckets,
         |  CAST(COALESCE(MAX(n), 0) AS BIGINT) AS ngram_max_bucket,
         |  CAST(COALESCE(SUM(GREATEST(n - ${graft.ops.Buckets.MaxBucket}, 0)), 0) AS BIGINT)
         |    AS ngram_overflow,
         |  CAST(0 AS BIGINT) AS minhash_overflow,
         |  CAST(0 AS BIGINT) AS embedding_overflow
         |FROM counts""".stripMargin,

    // distinct (doc, shingle) rows are exactly the unnest of the
    // list_distinct shingle sets; the benchmark partition is source
    // 'src0' (standing in for an eval set)
    "contamination_ngram" ->
      s"""WITH $shingleCtes, s AS (
         |  SELECT doc_id, unnest(shingles) AS shingle FROM d
         |), tagged AS (
         |  SELECT s.doc_id, s.shingle, dd.source
         |  FROM s JOIN documents dd ON s.doc_id = dd.doc_id
         |), bench AS (
         |  SELECT DISTINCT shingle FROM tagged WHERE source = 'src0'
         |)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM tagged
         |WHERE source IS DISTINCT FROM 'src0'
         |  AND shingle IN (SELECT shingle FROM bench)
         |GROUP BY doc_id
         |ORDER BY n_shared DESC, doc_id
         |LIMIT 20""".stripMargin,

    // the screen composed to the removal decision: docs sharing >= 5
    // distinct shingles with the benchmark are removed; per-lang
    // kept/removed accounting over all non-benchmark docs (null-safe
    // complement, as in contamination_ngram)
    // the Bloom pre-filter variant (K58) is exactness-preserving by
    // construction (no false negatives + unchanged exact join), so it
    // shares K29's oracle verbatim
    "decontaminate_bloom" ->
      s"""WITH $shingleCtes, s AS (
         |  SELECT doc_id, unnest(shingles) AS shingle FROM d
         |), tagged AS (
         |  SELECT s.doc_id, s.shingle, dd.source
         |  FROM s JOIN documents dd ON s.doc_id = dd.doc_id
         |), bench AS (
         |  SELECT DISTINCT shingle FROM tagged WHERE source = 'src0'
         |), removed AS (
         |  SELECT doc_id FROM tagged
         |  WHERE source IS DISTINCT FROM 'src0'
         |    AND shingle IN (SELECT shingle FROM bench)
         |  GROUP BY doc_id
         |  HAVING COUNT(*) >= 5
         |), base AS (
         |  SELECT dd.doc_id, dd.lang,
         |    len(str_split(dd.text, ' ')) AS n_toks,
         |    dd.doc_id IN (SELECT doc_id FROM removed) AS rm
         |  FROM documents dd
         |  WHERE dd.source IS DISTINCT FROM 'src0'
         |)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  CAST(SUM(CASE WHEN rm THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN rm THEN 0 ELSE n_toks END) AS BIGINT) AS tokens_kept
         |FROM base
         |GROUP BY lang
         |ORDER BY lang""".stripMargin,

    "decontaminate" ->
      s"""WITH $shingleCtes, s AS (
         |  SELECT doc_id, unnest(shingles) AS shingle FROM d
         |), tagged AS (
         |  SELECT s.doc_id, s.shingle, dd.source
         |  FROM s JOIN documents dd ON s.doc_id = dd.doc_id
         |), bench AS (
         |  SELECT DISTINCT shingle FROM tagged WHERE source = 'src0'
         |), removed AS (
         |  SELECT doc_id FROM tagged
         |  WHERE source IS DISTINCT FROM 'src0'
         |    AND shingle IN (SELECT shingle FROM bench)
         |  GROUP BY doc_id
         |  HAVING COUNT(*) >= 5
         |), base AS (
         |  SELECT dd.doc_id, dd.lang,
         |    len(str_split(dd.text, ' ')) AS n_toks,
         |    dd.doc_id IN (SELECT doc_id FROM removed) AS rm
         |  FROM documents dd
         |  WHERE dd.source IS DISTINCT FROM 'src0'
         |)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  CAST(SUM(CASE WHEN rm THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN rm THEN 0 ELSE n_toks END) AS BIGINT) AS tokens_kept
         |FROM base
         |GROUP BY lang
         |ORDER BY lang""".stripMargin,

    "sample_stratified" ->
      """WITH counts AS (
        |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
        |), tot AS (
        |  SELECT SUM(n_docs) AS n_total FROM counts
        |), quotas AS (
        |  SELECT lang, n_docs,
        |    GREATEST(1, CAST(ROUND(
        |      CAST(n_docs * 100 AS DECIMAL(18,4)) / n_total) AS BIGINT)) AS quota
        |  FROM counts, tot
        |), ranked AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents
        |)
        |SELECT r.lang,
        |  CAST(MAX(q.n_docs) AS BIGINT) AS n_docs,
        |  CAST(MAX(q.quota) AS BIGINT) AS quota,
        |  CAST(COUNT(*) AS BIGINT) AS n_sampled
        |FROM ranked r JOIN quotas q ON r.lang = q.lang
        |WHERE r.rn <= q.quota
        |GROUP BY r.lang
        |ORDER BY r.lang""".stripMargin,

    // the dedup window partitions on the raw text (grouping-equivalent
    // to the engine's 256-bit text hash — same equality classes)
    "corpus_curation" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang, text,
         |    len(str_split(text, ' ')) AS n_tokens,
         |    list_distinct(str_split(text, ' ')) AS toksd
         |  FROM documents
         |), flags AS (
         |  SELECT lang, n_tokens,
         |    (n_tokens BETWEEN 20 AND 80) AS q,
         |    (${langidCaseSql("toksd")} = lang) AS agree,
         |    (ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1) AS keep1
         |  FROM base
         |)
         |SELECT lang,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |  CAST(SUM(CASE WHEN agree THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_agree,
         |  CAST(SUM(CASE WHEN keep1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup_keep,
         |  CAST(SUM(CASE WHEN q AND agree AND keep1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_final,
         |  CAST(SUM(CASE WHEN q AND agree AND keep1 THEN n_tokens ELSE 0 END)
         |    AS BIGINT) AS tokens_final
         |FROM flags
         |GROUP BY lang
         |ORDER BY lang""".stripMargin,

    "pack_token_budget" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    CAST(len(str_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents
        |), cum AS (
        |  SELECT lang, n_toks,
        |    SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks
        |  FROM toks
        |)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(MAX(cum_toks) AS BIGINT) AS tokens_used
        |FROM cum
        |WHERE cum_toks <= 2000
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    // sliding-window token chunking (window 32, stride 24): chunk count
    // = ceil(max(n-32,0)/24)+1, last chunk may be short; sha256 of the
    // reassembled chunk text pins content without shipping strings
    "chunk_tokens" ->
      """WITH tk AS (
        |  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
        |), cfg AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    (GREATEST(len(toks) - 32, 0) + 23) // 24 + 1 AS n_chunks
        |  FROM tk
        |), ch AS (
        |  SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_id
        |  FROM cfg
        |)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  CAST(LEAST(32, n - chunk_id * 24) AS INT) AS n_chunk_toks,
        |  sha256(array_to_string(
        |    list_slice(toks, chunk_id * 24 + 1,
        |      chunk_id * 24 + LEAST(32, n - chunk_id * 24)), ' ')) AS chunk_sha
        |FROM ch
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // sequence packing: next-fit of the chunk_tokens spans (window 32,
    // stride 24) into 64-token sequences, (doc_id, chunk_id) order
    // within the md5 'shard' mod-16 shard; the recursive CTE advances
    // every shard one chunk per iteration, carrying (seq_id, fill) —
    // the sequential fold the engine runs inside mapPartitions
    "pack_sequences" ->
      s"""WITH RECURSIVE tk AS (
         |  SELECT doc_id, len(str_split(text, ' ')) AS n FROM documents
         |), cfg AS (
         |  SELECT doc_id, n, (GREATEST(n - 32, 0) + 23) // 24 + 1 AS n_chunks
         |  FROM tk
         |), ch AS (
         |  SELECT doc_id, n, unnest(range(0, n_chunks)) AS chunk_id FROM cfg
         |), items AS (
         |  SELECT ('0x' || substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard,
         |    doc_id, CAST(chunk_id AS INT) AS chunk_id,
         |    CAST(LEAST(32, n - chunk_id * 24) AS BIGINT) AS n_toks
         |  FROM ch
         |), ranked AS (
         |  SELECT shard, doc_id, chunk_id, n_toks,
         |    row_number() OVER (PARTITION BY shard
         |      ORDER BY doc_id, chunk_id) AS rn
         |  FROM items
         |), rec AS (
         |  SELECT shard, rn, doc_id, chunk_id, n_toks,
         |    CAST(0 AS BIGINT) AS seq_id, n_toks AS fill
         |  FROM ranked WHERE rn = 1
         |  UNION ALL
         |  SELECT r.shard, r.rn, r.doc_id, r.chunk_id, r.n_toks,
         |    CASE WHEN p.fill + r.n_toks > 64 THEN p.seq_id + 1
         |      ELSE p.seq_id END,
         |    CASE WHEN p.fill + r.n_toks > 64 THEN r.n_toks
         |      ELSE p.fill + r.n_toks END
         |  FROM rec p JOIN ranked r ON r.shard = p.shard AND r.rn = p.rn + 1
         |)
         |SELECT shard, seq_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  ${dbl(s"${dec("SUM(n_toks)")} / 64")} AS fill_ratio,
         |  string_agg(doc_id || ':' || chunk_id, ','
         |    ORDER BY doc_id || ':' || chunk_id) AS members
         |FROM rec
         |GROUP BY shard, seq_id
         |ORDER BY shard, seq_id""".stripMargin,

    // Gopher repetition filters (Rae et al. 2021, public): top-token
    // fraction + duplicate-bigram fraction per doc; <2-token docs have
    // no bigrams -> NULL ratio in both engines
    // PII scrub: both engines inject the same synthetic PII (a pure
    // function of doc_id), then count matches and redact with 'g'
    // (DuckDB replaces first-only by default; Spark replaces all).
    // Regexes stay in the Java-regex ∩ RE2 common subset.
    "text_pii_scrub" ->
      """WITH t2 AS (
        |  SELECT doc_id,
        |    text ||
        |    CASE WHEN doc_id % 7 = 0
        |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0
        |      THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.25 logged'
        |      ELSE '' END AS text2
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(text2,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  sha256(regexp_replace(regexp_replace(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS scrub_sha
        |FROM t2
        |ORDER BY doc_id""".stripMargin,

    // K51 Flesch reading ease: identical regex counting rules
    // (sentence-ender runs min 1, nonempty whitespace tokens,
    // lowercased vowel-group runs) + the IDENTICAL IEEE formula tree,
    // one 4 dp final round; zero-word docs NULL
    "text_readability" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
        |      AS n_sentences,
        |    len(list_filter(str_split_regex(text, '[ \t\n\x0B\f\r]+'),
        |      t -> length(t) > 0)) AS n_words,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS n_syllables
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(n_sentences AS BIGINT) AS n_sentences,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_syllables AS BIGINT) AS n_syllables,
        |  CASE WHEN n_words > 0 THEN
        |    round(206.835
        |      - 1.015 * (CAST(n_words AS DOUBLE)
        |        / CAST(n_sentences AS DOUBLE))
        |      - 84.6 * (CAST(n_syllables AS DOUBLE)
        |        / CAST(n_words AS DOUBLE)), 4)
        |  END AS flesch
        |FROM m
        |ORDER BY doc_id""".stripMargin,

    // K49 charset screen: same deterministic non-ASCII / control-char
    // injection as the Spark side (pure function of doc_id), counts
    // via length-difference of a GLOBAL regex strip (RE2 ∩ Java hex
    // classes; DuckDB needs the explicit 'g' flag)
    "text_charset" ->
      s"""WITH inj AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 5 = 0 THEN ' naïve café résumé' ELSE '' END ||
         |    CASE WHEN doc_id % 13 = 0 THEN ' ' || chr(7) || 'bell'
         |      ELSE '' END AS t2
         |  FROM documents
         |), m AS (
         |  SELECT doc_id, CAST(length(t2) AS BIGINT) AS n_chars,
         |    CAST(length(t2) -
         |      length(regexp_replace(t2, '[^\\x00-\\x7F]', '', 'g'))
         |      AS BIGINT) AS n_non_ascii,
         |    CAST(length(t2) -
         |      length(regexp_replace(t2, '[\\x00-\\x1F]', '', 'g'))
         |      AS BIGINT) AS n_ctrl,
         |    CAST(length(t2) -
         |      length(regexp_replace(t2, '[0-9]', '', 'g'))
         |      AS BIGINT) AS n_digits
         |  FROM inj
         |)
         |SELECT doc_id, n_chars, n_non_ascii, n_ctrl,
         |  CASE WHEN n_chars > 0
         |    THEN ${dbl(s"${dec("n_chars - n_non_ascii")} / n_chars")}
         |  END AS ascii_ratio,
         |  CASE WHEN n_chars > 0
         |    THEN ${dbl(s"${dec("n_digits")} / n_chars")}
         |  END AS digit_ratio
         |FROM m
         |ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      s"""WITH tk AS (
         |  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
         |), uni AS (
         |  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_toks FROM (
         |    SELECT doc_id, tok, COUNT(*) AS c
         |    FROM (SELECT doc_id, unnest(toks) AS tok FROM tk)
         |    GROUP BY doc_id, tok)
         |  GROUP BY doc_id
         |), bg AS (
         |  SELECT doc_id, SUM(c) AS n_bi, COUNT(*) AS n_bi_d FROM (
         |    SELECT doc_id, b, COUNT(*) AS c FROM (
         |      SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
         |        i -> concat_ws(' ', toks[i+1], toks[i+2]))) AS b
         |      FROM tk WHERE len(toks) >= 2)
         |    GROUP BY doc_id, b)
         |  GROUP BY doc_id
         |)
         |SELECT u.doc_id, CAST(u.n_toks AS BIGINT) AS n_toks,
         |  ${dbl(s"${dec("u.top_c")} / u.n_toks")} AS top_tok_ratio,
         |  CAST(COALESCE(b.n_bi, 0) AS BIGINT) AS n_bigrams,
         |  CASE WHEN b.n_bi IS NULL THEN NULL
         |    ELSE ${dbl(s"${dec("b.n_bi - b.n_bi_d")} / b.n_bi")} END
         |    AS dup_bigram_ratio
         |FROM uni u LEFT JOIN bg b ON u.doc_id = b.doc_id
         |ORDER BY u.doc_id""".stripMargin,

    // deterministic hash-Bernoulli sampling: keep iff the first 8 md5
    // hex chars of 'graft'||doc_id, as a 32-bit draw, fall below the
    // per-stratum threshold (en -> 0.25 * 2^32; integer compare, no
    // float edge — byte-identical decisions in both engines)
    "sample_hash_bernoulli" ->
      s"""WITH draws AS (
         |  SELECT lang,
         |    (('0x' || substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |      < CASE WHEN lang = 'en' THEN 1073741824 ELSE 4294967296 END) AS keep
         |  FROM documents
         |)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  ${dbl(s"${dec("SUM(CASE WHEN keep THEN 1 ELSE 0 END)")} / COUNT(*)")}
         |    AS keep_ratio
         |FROM draws
         |GROUP BY lang
         |ORDER BY lang""".stripMargin,

    // deterministic holdout split: one md5 draw (salt 'split') mod
    // 1000 -> three ranges (test <10, val <30, train) — disjoint and
    // exhaustive by construction, stable as the corpus grows
    // bigram-LM surprisal (mirror of LlmData.textSurprisalBigram):
    // adjacency via zipped parallel unnests, corpus-fit conditional
    // p(w2|w1) = c12/c1, per-term 9 dp round + exact-decimal sum (the
    // text_entropy walk), 6 dp final; < 2-token docs LEFT-join to
    // (0, NULL)
    // K71 Zipf fit: the K47 adjacency CTE, ranked by (c DESC, w1, w2);
    // text_entropy term-round discipline (9 dp, DECIMAL(28,9) sums),
    // D28 closed forms finalize
    "text_zipf" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |    x -> len(x) > 0) AS l
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, len(l) - 1), i -> l[i+1])) AS w1,
        |    unnest(list_transform(range(0, len(l) - 1), i -> l[i+2])) AS w2
        |  FROM tk WHERE len(l) >= 2
        |), freq AS (
        |  SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2
        |), pts AS (
        |  SELECT round(log10(row_number() OVER (ORDER BY c DESC, w1, w2)),
        |      9) AS x,
        |    round(log10(c), 9) AS y
        |  FROM freq
        |), m AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CAST(x AS DECIMAL(28,9))) AS sx,
        |    SUM(CAST(y AS DECIMAL(28,9))) AS sy,
        |    SUM(CAST(round(x * y, 9) AS DECIMAL(28,9))) AS sxy,
        |    SUM(CAST(round(x * x, 9) AS DECIMAL(28,9))) AS sx2,
        |    SUM(CAST(round(y * y, 9) AS DECIMAL(28,9))) AS sy2
        |  FROM pts
        |)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope,
        |  round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    / ((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
        |FROM m""".stripMargin,

    "text_surprisal_bigram" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |    x -> len(x) > 0) AS l
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, len(l) - 1), i -> l[i+1])) AS w1,
        |    unnest(list_transform(range(0, len(l) - 1), i -> l[i+2])) AS w2
        |  FROM tk WHERE len(l) >= 2
        |), c12 AS (
        |  SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
        |), c1 AS (
        |  SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1
        |), terms AS (
        |  SELECT c12.w1, c12.w2,
        |    round(-ln(CAST(c12.c12 AS DOUBLE) / c1.c1), 9) AS term
        |  FROM c12 JOIN c1 ON c12.w1 = c1.w1
        |), per_doc AS (
        |  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
        |    round(CAST(SUM(CAST(term AS DECIMAL(28,9))) AS DOUBLE)
        |      / COUNT(*), 6) AS surprisal
        |  FROM bg JOIN terms ON bg.w1 = terms.w1 AND bg.w2 = terms.w2
        |  GROUP BY bg.doc_id
        |)
        |SELECT d.doc_id,
        |  CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  p.surprisal
        |FROM (SELECT doc_id FROM documents) d
        |LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // quality-weighted importance sampling (mirror of
    // LlmData.sampleQualityWeighted): per-mille keep weight from the
    // quality tier (token band + stopword OCCURRENCE count — list_filter,
    // not the distinct list_intersect), md5 draw salt 'qw'
    "sample_quality_weighted" ->
      """WITH f AS (
        |  SELECT doc_id, len(toks) AS n_toks,
        |    len(list_filter(toks, t -> list_contains(
        |      ['the','a','of','and','to','in','is'], t))) AS n_stop,
        |    ('0x' || substr(md5('qw' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 1000 AS draw
        |  FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
        |), k AS (
        |  SELECT draw,
        |    (CASE WHEN n_toks BETWEEN 20 AND 80 THEN 800 ELSE 300 END
        |     + CASE WHEN n_stop >= 2 THEN 200 ELSE 0 END) AS keep_pm
        |  FROM f
        |)
        |SELECT CAST(keep_pm AS INT) AS keep_pm,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN draw < keep_pm THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(CAST(CAST(SUM(CASE WHEN draw < keep_pm THEN 1 ELSE 0 END)
        |    AS DECIMAL(18,4)) / COUNT(*) AS DECIMAL(38,6)) AS DOUBLE) AS rate
        |FROM k GROUP BY keep_pm
        |ORDER BY keep_pm""".stripMargin,

    "split_holdout" ->
      """WITH d AS (
        |  SELECT CASE WHEN b < 10 THEN 'test' WHEN b < 30 THEN 'val'
        |           ELSE 'train' END AS split,
        |    lang, len(str_split(text, ' ')) AS n_toks
        |  FROM (SELECT
        |      ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        % 1000 AS b,
        |      lang, text
        |    FROM documents)
        |)
        |SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens
        |FROM d GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin,

    // K66 dataset card: one row per source — doc/token mass, corpus
    // share, exact-dup membership rate (group by the TEXT itself —
    // the hash-collision-free mirror), language breadth, dominant
    // language with the D22 tie rule (count DESC, lang ASC)
    "dataset_card" ->
      """WITH d AS (
        |  SELECT source, lang, len(str_split(text, ' ')) AS n_toks,
        |    count(*) OVER (PARTITION BY text) > 1 AS is_dup
        |  FROM documents
        |), pl AS (
        |  SELECT source, lang, count(*) AS c FROM d GROUP BY source, lang
        |), dom AS (
        |  SELECT source, lang AS top_lang FROM (
        |    SELECT source, lang,
        |      row_number() OVER (PARTITION BY source
        |        ORDER BY c DESC, lang) AS rn
        |    FROM pl) WHERE rn = 1
        |), card AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
        |    count(*) FILTER (WHERE is_dup) AS n_dup_docs,
        |    count(DISTINCT lang) AS n_langs
        |  FROM d GROUP BY source
        |), tot AS (
        |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tok_total FROM card
        |)
        |SELECT c.source, CAST(c.n_docs AS BIGINT) AS n_docs, c.n_tokens,
        |  CAST(CAST(CAST(c.n_tokens AS DECIMAL(18,4)) / tot.tok_total
        |    AS DECIMAL(38,6)) AS DOUBLE) AS token_share,
        |  CAST(CAST(CAST(c.n_dup_docs AS DECIMAL(18,4)) / c.n_docs
        |    AS DECIMAL(38,6)) AS DOUBLE) AS dup_rate,
        |  CAST(c.n_langs AS BIGINT) AS n_langs, dom.top_lang
        |FROM card c JOIN dom USING (source) CROSS JOIN tot
        |ORDER BY c.source""".stripMargin,

    // K65 split leakage: the K6 verified pair relation joined to the
    // K44 hash-split assignment; cross-split category pairs are leaks
    "split_leakage" ->
      s"""WITH jacc AS (
         |  SELECT doc_a, doc_b FROM ($ngramJaccardSql)
         |), sp AS (
         |  SELECT doc_id,
         |    CASE WHEN b < 10 THEN 'test' WHEN b < 30 THEN 'val'
         |         ELSE 'train' END AS split
         |  FROM (SELECT doc_id,
         |      ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |        % 1000 AS b
         |    FROM documents)
         |), px AS (
         |  SELECT least(a.split, b.split) AS split_lo,
         |    greatest(a.split, b.split) AS split_hi
         |  FROM jacc
         |  JOIN sp a ON a.doc_id = jacc.doc_a
         |  JOIN sp b ON b.doc_id = jacc.doc_b
         |)
         |SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs,
         |  split_lo <> split_hi AS is_leak
         |FROM px GROUP BY split_lo, split_hi
         |ORDER BY split_lo, split_hi""".stripMargin,

    // deterministic fixed-size sample: md5-priority (salt 'res'), keep
    // the 100 globally-smallest priorities — the distributed reservoir
    "sample_reservoir" ->
      """SELECT doc_id, lang, source, n_chars, priority FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    ('0x' || substr(md5('res' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      AS priority
        |  FROM documents
        |  ORDER BY priority, doc_id
        |  LIMIT 100
        |)
        |ORDER BY doc_id""".stripMargin,

    // weighted corpus mixing: integer per-mille targets over a
    // half-corpus budget, threshold = min(2^32, 2^32·target/available)
    // (shortfall reported, never upsampled), md5 draw salt 'mix'; all
    // integer arithmetic up to the one final ratio. The threshold CASE
    // mirrors LlmData.mixThreshold: cap branch short-circuits, and the
    // multiply runs in HUGEINT (Spark side: DECIMAL(38,0)) because
    // 2^32·n_target overflows BIGINT at n_target ≥ 2^31
    // temperature resampling: integer weight = round(sqrt(n)*1e6)
    // (sqrt is IEEE-correctly-rounded in both engines; the rounded
    // BIGINT weight makes the cross-language sum order-free), then
    // the corpus_mix HUGEINT threshold walk with salt 'temp'
    // K61 epoch planning: identical sqrt-weight + HUGEINT target walk
    // as K55 over token mass; 4-epoch repeat cap
    "corpus_epochs" ->
      s"""WITH pl AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |    SUM(len(str_split(text, ' '))) AS avail_tokens
         |  FROM documents GROUP BY lang
         |), w AS (
         |  SELECT lang, n_docs, avail_tokens,
         |    CAST(round(sqrt(CAST(avail_tokens AS DOUBLE)) * 1000000) AS BIGINT)
         |      AS weight,
         |    SUM(avail_tokens) OVER () AS tsum,
         |    SUM(CAST(round(sqrt(CAST(avail_tokens AS DOUBLE)) * 1000000)
         |      AS BIGINT)) OVER () AS wsum
         |  FROM pl
         |), tg AS (
         |  SELECT lang, n_docs, avail_tokens, weight,
         |    CAST((CAST(weight AS HUGEINT) * tsum * 2) // wsum AS BIGINT)
         |      AS target_tokens
         |  FROM w
         |), eff AS (
         |  SELECT lang, n_docs, avail_tokens, target_tokens,
         |    LEAST(target_tokens, avail_tokens * 4) AS effective_tokens
         |  FROM tg
         |)
         |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(avail_tokens AS BIGINT) AS avail_tokens,
         |  CAST(target_tokens AS BIGINT) AS target_tokens,
         |  CAST(effective_tokens AS BIGINT) AS effective_tokens,
         |  ${dbl(s"${dec("effective_tokens")} / avail_tokens")} AS epochs,
         |  CASE WHEN target_tokens > 0 THEN
         |    ${dbl(s"${dec("effective_tokens")} / target_tokens")} END
         |    AS fill_ratio
         |FROM eff
         |ORDER BY lang""".stripMargin,

    "sample_temperature" ->
      s"""WITH pl AS (
         |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
         |), w AS (
         |  SELECT lang, n_docs,
         |    CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS weight,
         |    SUM(n_docs) OVER () AS total,
         |    SUM(CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT))
         |      OVER () AS wsum
         |  FROM pl
         |), tg AS (
         |  SELECT lang, n_docs, weight,
         |    CAST((CAST(weight AS HUGEINT) * (total // 2)) // wsum AS BIGINT)
         |      AS n_target
         |  FROM w
         |), th AS (
         |  SELECT lang, n_docs, weight, n_target,
         |    CASE WHEN n_target >= n_docs THEN CAST(4294967296 AS BIGINT)
         |      ELSE CAST((CAST(n_target AS HUGEINT) * 4294967296) // n_docs
         |        AS BIGINT) END AS threshold
         |  FROM tg
         |), kept AS (
         |  SELECT d.lang,
         |    SUM(CASE WHEN ('0x' || substr(md5('temp' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
         |          < t.threshold THEN 1 ELSE 0 END) AS n_kept
         |  FROM documents d JOIN th t ON d.lang = t.lang
         |  GROUP BY d.lang
         |)
         |SELECT t.lang, CAST(t.n_docs AS BIGINT) AS n_docs,
         |  CAST(t.weight AS BIGINT) AS weight,
         |  CAST(t.n_target AS BIGINT) AS n_target,
         |  CAST(k.n_kept AS BIGINT) AS n_kept,
         |  CASE WHEN t.n_target = 0 THEN NULL
         |    ELSE ${dbl(s"${dec("k.n_kept")} / t.n_target")} END AS fill_ratio
         |FROM th t JOIN kept k ON t.lang = k.lang
         |ORDER BY t.lang""".stripMargin,

    // drift contribution ranked by its EXACT integer numerator
    // |c_a*N_b - c_b*N_a| (HUGEINT product) - no float term anywhere
    "corpus_drift" ->
      """WITH sides AS (
        |  SELECT doc_id,
        |    (CAST(substr(source, 4) AS BIGINT) % 2) = 0 AS is_a
        |  FROM documents
        |), tc AS (
        |  SELECT tok,
        |    SUM(CASE WHEN s.is_a THEN 1 ELSE 0 END) AS c_a,
        |    SUM(CASE WHEN NOT s.is_a THEN 1 ELSE 0 END) AS c_b
        |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
        |        FROM documents) t
        |  JOIN sides s USING (doc_id)
        |  GROUP BY tok
        |), tot AS (
        |  SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b FROM tc
        |)
        |SELECT tok, CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
        |  CAST(abs(CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a)
        |    AS BIGINT) AS drift_num
        |FROM tc, tot
        |ORDER BY drift_num DESC, tok
        |LIMIT 20""".stripMargin,

    "corpus_mix" ->
      s"""WITH pl AS (
         |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
         |), tg AS (
         |  SELECT lang, n_docs,
         |    (CASE lang WHEN 'en' THEN 400 WHEN 'de' THEN 150 WHEN 'es' THEN 150
         |       WHEN 'fr' THEN 150 WHEN 'zh' THEN 150 ELSE 0 END
         |     * (SUM(n_docs) OVER () // 2)) // 1000 AS n_target
         |  FROM pl
         |), th AS (
         |  SELECT lang, n_docs, n_target,
         |    CASE WHEN n_target >= n_docs THEN CAST(4294967296 AS BIGINT)
         |      ELSE CAST((CAST(n_target AS HUGEINT) * 4294967296) // n_docs
         |        AS BIGINT) END AS threshold
         |  FROM tg
         |), kept AS (
         |  SELECT d.lang,
         |    SUM(CASE WHEN ('0x' || substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
         |          < t.threshold THEN 1 ELSE 0 END) AS n_kept
         |  FROM documents d JOIN th t ON d.lang = t.lang
         |  GROUP BY d.lang
         |)
         |SELECT t.lang, CAST(t.n_docs AS BIGINT) AS n_docs,
         |  CAST(t.n_target AS BIGINT) AS n_target,
         |  CAST(k.n_kept AS BIGINT) AS n_kept,
         |  CASE WHEN t.n_target = 0 THEN NULL
         |    ELSE ${dbl(s"${dec("k.n_kept")} / t.n_target")} END AS fill_ratio
         |FROM th t JOIN kept k ON t.lang = k.lang
         |ORDER BY t.lang""".stripMargin,

    // unigram Shannon entropy: per-term c*ln(c) rounded to 9dp and
    // summed as exact decimal (associative — a raw float SUM would
    // flap with aggregation order), then one IEEE divide/subtract and
    // a 6dp final round
    "text_entropy" ->
      """WITH tc AS (
        |  SELECT doc_id, tok, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY doc_id, tok
        |), agg AS (
        |  SELECT doc_id, SUM(c) AS n_toks, COUNT(*) AS n_distinct,
        |    SUM(CAST(round(c * ln(c), 9) AS DECIMAL(28,9))) AS scl
        |  FROM tc GROUP BY doc_id
        |)
        |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  round(ln(n_toks) - CAST(scl AS DOUBLE) / n_toks, 6) AS entropy
        |FROM agg
        |ORDER BY doc_id""".stripMargin,

    // deterministic md5-draw sharding (same draw idiom as
    // sample_hash_bernoulli, salt 'shard', mod 16): per-shard doc count
    // and token mass — the pre-write balance report
    "corpus_shard" ->
      """SELECT CAST(('0x' || substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS INT) AS shard,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents
        |GROUP BY 1
        |ORDER BY shard""".stripMargin,

    // duplicated-span accounting: every 16-token window (stride 1)
    // hashed by the sha256 of its reassembled text; a span is
    // duplicated when seen in >= 2 distinct docs; per-doc counts and
    // fraction (NULL for docs shorter than the window)
    "dedup_substring" ->
      s"""WITH tk AS (
         |  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
         |), sp AS (
         |  SELECT doc_id,
         |    sha256(array_to_string(list_slice(toks, p + 1, p + 16), ' ')) AS h
         |  FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 15)) AS p
         |        FROM tk WHERE len(toks) >= 16)
         |), dup AS (
         |  SELECT h FROM sp GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
         |), pd AS (
         |  SELECT doc_id, COUNT(*) AS n_dup FROM sp JOIN dup USING (h)
         |  GROUP BY doc_id
         |)
         |SELECT t.doc_id,
         |  CAST(GREATEST(len(t.toks) - 15, 0) AS BIGINT) AS n_spans,
         |  CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_spans,
         |  CASE WHEN GREATEST(len(t.toks) - 15, 0) = 0 THEN NULL
         |    ELSE ${dbl(s"${dec("COALESCE(p.n_dup, 0)")} / GREATEST(len(t.toks) - 15, 0)")}
         |  END AS dup_span_ratio
         |FROM tk t LEFT JOIN pd p ON t.doc_id = p.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    "text_tokens_bpe" ->
      s"""SELECT doc_id,
         |  CAST(len(str_split(text, ' ')) AS INTEGER) AS n_ws,
         |  CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS INTEGER) AS n_bpe,
         |  ${dbl(s"${dec("len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))")} / len(str_split(text, ' '))")} AS bpe_per_ws
         |FROM documents
         |ORDER BY doc_id""".stripMargin,

    // K62 quality x duplication calibration: fixed 100-per-mille
    // stopword-ratio bands (exact integer DIV), dup membership by
    // grouping the text itself (engine groups its hash)
    "quality_dup_calibration" ->
      s"""WITH d AS (
         |  SELECT text, len(str_split(text, ' ')) AS nt,
         |    len(list_filter(str_split(text, ' '),
         |      t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS ns
         |  FROM documents
         |), q AS (
         |  SELECT text, nt, ((1000 * ns) // nt) // 100 AS q_band FROM d
         |), c AS (
         |  SELECT text, COUNT(*) AS n_copies FROM documents GROUP BY text
         |), g AS (
         |  SELECT q.q_band, COUNT(*) AS n_docs,
         |    SUM(CASE WHEN c.n_copies > 1 THEN 1 ELSE 0 END) AS n_dup_members,
         |    SUM(q.nt) AS n_tokens
         |  FROM q JOIN c ON q.text = c.text
         |  GROUP BY q.q_band
         |)
         |SELECT CAST(q_band AS BIGINT) AS q_band,
         |  CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_dup_members AS BIGINT) AS n_dup_members,
         |  ${dbl(s"${dec("n_dup_members")} / n_docs")} AS dup_rate,
         |  CAST(n_tokens AS BIGINT) AS n_tokens
         |FROM g
         |ORDER BY q_band""".stripMargin,

    // K59 BPE merge learning: vocabulary-weighted adjacent char-pair
    // counts over the same pre-token regex, top 20 with the declared
    // (n DESC, pair ASC) tie-break
    // K69 merge-rule coverage: same pair relation as bpe_learn_merges
    // (single shared derivation on the engine side), ranked by K59's
    // exact (n DESC, pair) order; one exact integer division at the end
    "bpe_merge_coverage" ->
      """WITH vocab AS (
        |  SELECT w, COUNT(*) AS wc FROM (
        |    SELECT unnest(regexp_extract_all(text,
        |      ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS w
        |    FROM documents)
        |  WHERE length(w) >= 2 GROUP BY w
        |), p AS (
        |  SELECT unnest(list_transform(range(1, length(w)),
        |    i -> substr(w, i, 2))) AS pair, wc
        |  FROM vocab
        |), pc AS (
        |  SELECT pair, CAST(SUM(wc) AS BIGINT) AS n FROM p GROUP BY pair
        |), ranked AS (
        |  SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rk
        |  FROM pc
        |), tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM pc),
        |sizes(vocab_size) AS (VALUES (10), (25), (50), (100)),
        |cov AS (
        |  SELECT vocab_size, count(*) AS n_merges,
        |    CAST(sum(n) AS BIGINT) AS covered
        |  FROM ranked, sizes WHERE rk <= vocab_size GROUP BY vocab_size
        |)
        |SELECT CAST(vocab_size AS BIGINT) AS vocab_size, n_merges, covered,
        |  CAST(covered AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
        |FROM cov, tot
        |ORDER BY vocab_size""".stripMargin,

    "bpe_learn_merges" ->
      """WITH vocab AS (
        |  SELECT w, COUNT(*) AS wc FROM (
        |    SELECT unnest(regexp_extract_all(text,
        |      ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS w
        |    FROM documents)
        |  WHERE length(w) >= 2 GROUP BY w
        |), p AS (
        |  SELECT unnest(list_transform(range(1, length(w)),
        |    i -> substr(w, i, 2))) AS pair, wc
        |  FROM vocab
        |)
        |SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
        |FROM p GROUP BY pair
        |ORDER BY n DESC, pair
        |LIMIT 20""".stripMargin,

    // mirrors the engine's capped prefix-bucket + Levenshtein verify:
    // only the 256 smallest doc_ids per 16-char-prefix bucket pair up
    // (fixture buckets are far below the cap — identical truncation in
    // a degenerate corpus), then exact edit distance on the 200-char
    // normalized prefix
    "dedup_fuzzy" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |      1, 200) AS prefix
        |  FROM documents
        |), rk AS (
        |  SELECT doc_id, prefix, substr(prefix, 1, 16) AS bucket,
        |    row_number() OVER (PARTITION BY substr(prefix, 1, 16)
        |      ORDER BY doc_id) AS rn
        |  FROM d
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS dist
        |FROM rk a JOIN rk b
        |  ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        | AND a.rn <= 256 AND b.rn <= 256
        |WHERE levenshtein(a.prefix, b.prefix) <= 40
        |ORDER BY doc_a, doc_b""".stripMargin,

    // correlation/covariance from exact-decimal raw moments (mirror of
    // Aggregates.aggCorrMoments): the five moment sums are exact and
    // associative in both engines; the final covar/corr derivation is
    // the IDENTICAL double expression tree, so the correctly-rounded
    // IEEE walk matches
    // H18 calendar battery: ISO weeks both engines; DuckDB isodow ≡
    // Spark weekday+1 (dayofweek numbering differs — avoided)
    "fn_calendar" ->
      """WITH d0 AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT CAST(year(d) AS BIGINT) AS yr,
        |  CAST(quarter(d) AS BIGINT) AS q,
        |  count(*) AS n_orders,
        |  CAST(SUM(CASE WHEN d = last_day(d) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_monthend,
        |  CAST(COUNT(DISTINCT weekofyear(d)) AS BIGINT) AS n_weeks,
        |  CAST(SUM(CASE WHEN isodow(d) = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mondays,
        |  CAST(MIN(dayofyear(d)) AS BIGINT) AS min_doy,
        |  CAST(MAX(dayofyear(d)) AS BIGINT) AS max_doy
        |FROM d0 GROUP BY 1, 2
        |ORDER BY yr, q""".stripMargin,

    // H17 try_cast battery: identical dirt synthesis from CLEAN
    // string renderings (integer/date only — double→string formatting
    // is engine-specific); TRY_CAST NULLs on malformed in both
    "fn_try_cast" ->
      """WITH raw AS (
        |  SELECT
        |    CASE WHEN o_orderkey % 7 = 0
        |      THEN CAST(o_orderkey AS VARCHAR) || 'x'
        |      ELSE CAST(o_orderkey AS VARCHAR) END AS s_int,
        |    CASE WHEN o_orderkey % 11 = 0 THEN '2020-13-45'
        |      ELSE CAST(CAST(o_orderdate AS DATE) AS VARCHAR) END AS s_date,
        |    CASE WHEN o_orderkey % 13 = 0 THEN 'N/A'
        |      ELSE CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |        AS VARCHAR) END AS s_cents
        |  FROM orders
        |), p AS (
        |  SELECT TRY_CAST(s_int AS BIGINT) AS i,
        |    TRY_CAST(s_date AS DATE) AS d,
        |    TRY_CAST(s_cents AS BIGINT) AS c
        |  FROM raw
        |)
        |SELECT count(*) AS n_rows,
        |  CAST(SUM(CASE WHEN i IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bad_int,
        |  CAST(SUM(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bad_date,
        |  CAST(SUM(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bad_cents,
        |  CAST(SUM(i) AS BIGINT) AS sum_int,
        |  MIN(d) AS min_date, MAX(d) AS max_date,
        |  CAST(SUM(c) AS BIGINT) AS sum_cents
        |FROM p""".stripMargin,

    // D29 ordered string agg: DuckDB spells the order inside
    // string_agg; the inner order is fully tie-broken
    "agg_listagg" ->
      """WITH ranked AS (
        |  SELECT c_mktsegment, c_name, c_acctbal, c_custkey,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer
        |)
        |SELECT c_mktsegment,
        |  string_agg(c_name, ',' ORDER BY c_acctbal DESC, c_custkey)
        |    AS top_names,
        |  count(*) AS n
        |FROM ranked WHERE rk <= 3
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // D28 OLS from exact moments: the D20 moment CTE, single-division
    // closed forms (intercept is (Σy·Σx²−Σx·Σxy)/den, never chained
    // through slope — one rounding point per statistic)
    "agg_regression" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))
        |      * CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))
        |      * CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sx2,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))
        |      * CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sy2
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6) AS slope,
        |  round((sy * sx2 - sx * sxy) / (n * sx2 - sx * sx), 6)
        |    AS intercept,
        |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |    / ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6) AS r2
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "agg_corr_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))
        |      * CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))
        |      * CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sx2,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))
        |      * CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sy2
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round((sxy - sx * sy / n) / (n - 1), 6) AS covar_samp,
        |  round((n * sxy - sx * sy)
        |    / sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6) AS corr
        |FROM m ORDER BY l_returnflag""".stripMargin,

    // embedding-column health stats (mirror of LlmData.embeddingStats):
    // per-vector norms via the K3 exact-decimal squared-sum + one
    // double sqrt; mean via the text_entropy 9 dp term-round discipline
    "embedding_stats" ->
      """WITH p AS (
        |  SELECT vec_id, label,
        |    CAST(unnest(embedding) AS DECIMAL(18,9)) AS x
        |  FROM embeddings
        |), nr AS (
        |  SELECT vec_id, label, sqrt(CAST(SUM(x * x) AS DOUBLE)) AS norm
        |  FROM p GROUP BY vec_id, label
        |)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  round(CAST(SUM(CAST(round(norm, 9) AS DECIMAL(28,14))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_norm,
        |  round(MIN(norm), 6) AS min_norm,
        |  round(MAX(norm), 6) AS max_norm
        |FROM nr GROUP BY label
        |ORDER BY label""".stripMargin,

    // K72 hybrid RRF: lexical leg = distinct-token overlap, vector
    // leg = the sim_topk exact-decimal cosine; fusion consumes only
    // integer RANKS — two exact reciprocals added once
    "sim_hybrid_rrf" ->
      """WITH qt AS (
        |  SELECT DISTINCT unnest(str_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id = 0
        |), ct AS (
        |  SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id <> 0
        |), ov AS (
        |  SELECT doc_id, count(*) AS ov FROM ct JOIN qt USING (tok)
        |  GROUP BY doc_id
        |), lexr AS (
        |  SELECT d.doc_id,
        |    row_number() OVER (ORDER BY COALESCE(ov.ov, 0) DESC, d.doc_id)
        |      AS r_lex
        |  FROM (SELECT doc_id FROM documents WHERE doc_id <> 0) d
        |  LEFT JOIN ov ON d.doc_id = ov.doc_id
        |), q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |p AS (
        |  SELECT e.vec_id,
        |    CAST(unnest(e.embedding) AS DECIMAL(18,9)) AS x,
        |    CAST(unnest((SELECT qe FROM q)) AS DECIMAL(18,9)) AS y
        |  FROM embeddings e WHERE e.vec_id <> 0
        |), a AS (
        |  SELECT vec_id, CAST(SUM(x * y) AS DOUBLE) AS dot,
        |    CAST(SUM(x * x) AS DOUBLE) AS n2
        |  FROM p GROUP BY vec_id
        |), qn AS (
        |  SELECT CAST(SUM(v * v) AS DOUBLE) AS qn2
        |  FROM (SELECT CAST(unnest(qe) AS DECIMAL(18,9)) AS v FROM q)
        |), vecr AS (
        |  SELECT vec_id AS doc_id,
        |    row_number() OVER (
        |      ORDER BY round(dot / (sqrt(n2) * sqrt(qn2)), 6) DESC, vec_id)
        |      AS r_vec
        |  FROM a, qn
        |)
        |SELECT l.doc_id, CAST(l.r_lex AS BIGINT) AS r_lex,
        |  CAST(v.r_vec AS BIGINT) AS r_vec,
        |  round(1.0 / (60 + l.r_lex) + 1.0 / (60 + v.r_vec), 9) AS rrf
        |FROM lexr l JOIN vecr v ON l.doc_id = v.doc_id
        |ORDER BY rrf DESC, l.doc_id
        |LIMIT 10""".stripMargin,

    "sim_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |p AS (
        |  SELECT e.vec_id,
        |    CAST(unnest(e.embedding) AS DECIMAL(18,9)) AS x,
        |    CAST(unnest((SELECT qe FROM q)) AS DECIMAL(18,9)) AS y
        |  FROM embeddings e WHERE e.vec_id <> 0
        |), a AS (
        |  SELECT vec_id, CAST(SUM(x * y) AS DOUBLE) AS dot,
        |    CAST(SUM(x * x) AS DOUBLE) AS n2
        |  FROM p GROUP BY vec_id
        |), qn AS (
        |  SELECT CAST(SUM(v * v) AS DOUBLE) AS qn2
        |  FROM (SELECT CAST(unnest(qe) AS DECIMAL(18,9)) AS v FROM q)
        |)
        |SELECT vec_id, round(dot / (sqrt(n2) * sqrt(qn2)), 6) AS score
        |FROM a, qn
        |ORDER BY score DESC, vec_id
        |LIMIT 5""".stripMargin,

    "text_stats" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  ${dbl(s"SUM(${dec("len(str_split(text, ' '))")}) / COUNT(*)")} AS avg_tokens,
         |  COUNT(DISTINCT source) AS n_sources
         |FROM documents
         |GROUP BY lang
         |ORDER BY lang""".stripMargin,

    "text_tokens_topk" ->
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents)
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 10""".stripMargin,

    // same term-rounded exact-decimal discipline as text_entropy; the
    // division CAST(ctok AS DOUBLE) / total matches Spark's
    // ctok.cast(double) / lit(total) operand-for-operand
    "text_surprisal" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
        |), n AS (SELECT COUNT(*) AS total FROM tk),
        |vocab AS (SELECT tok, COUNT(*) AS ctok FROM tk GROUP BY tok),
        |dc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tk GROUP BY doc_id, tok),
        |agg AS (
        |  SELECT doc_id, SUM(c) AS n_toks,
        |    SUM(CAST(round(c * ln(CAST(ctok AS DOUBLE) / total), 9)
        |      AS DECIMAL(28,9))) AS slp
        |  FROM dc JOIN vocab USING (tok), n
        |  GROUP BY doc_id
        |)
        |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
        |  round(-CAST(slp AS DOUBLE) / n_toks, 6) AS surprisal
        |FROM agg
        |ORDER BY doc_id""".stripMargin,

    "text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents
        |)
        |SELECT doc_id, sha256(norm) AS norm_hash,
        |  CAST(length(norm) AS BIGINT) AS n_norm_chars,
        |  count(*) OVER (PARTITION BY norm) > 1 AS is_dup_normalized
        |FROM n
        |ORDER BY doc_id""".stripMargin,

    "text_bigrams" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split_regex(text, '\s+'),
        |    x -> len(x) > 0) AS l
        |  FROM documents
        |), bg AS (
        |  SELECT unnest(list_transform(range(0, len(l) - 1),
        |    i -> concat_ws(' ', l[i+1], l[i+2]))) AS bigram
        |  FROM toks WHERE len(l) >= 2
        |)
        |SELECT bigram, count(*) AS n
        |FROM bg GROUP BY bigram
        |ORDER BY n DESC, bigram
        |LIMIT 20""".stripMargin,

    // K63 boilerplate accounting: the engine groups segments by their
    // 64-bit xxhash; the oracle groups by the segment text itself —
    // collision-free equivalence at corpus scale. Tumbling 8-token
    // segments mirror LlmData.BoilerSegTokens; the trailing short
    // segment is a segment like any other (both sides slice-and-cap).
    "text_boilerplate" ->
      s"""WITH base AS (
         |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
         |), segs AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(0, (len(l) + 7) // 8),
         |      s -> array_to_string(list_slice(l, s * 8 + 1, s * 8 + 8),
         |        ' '))) AS seg_text
         |  FROM base
         |), freq AS (
         |  SELECT seg_text, count(DISTINCT doc_id) AS nd
         |  FROM segs GROUP BY seg_text
         |)
         |SELECT s.doc_id, count(*) AS n_seg,
         |  count(*) FILTER (WHERE f.nd >= 2) AS n_boiler,
         |  ${dbl(s"${dec("count(*) FILTER (WHERE f.nd >= 2)")} / count(*)")}
         |    AS boiler_ratio
         |FROM segs s JOIN freq f USING (seg_text)
         |GROUP BY s.doc_id
         |ORDER BY s.doc_id""".stripMargin,

    "text_tfidf" ->
      """SELECT token, tf, df,
        |  round(tf * ln((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / df), 4)
        |    AS tfidf
        |FROM (
        |  SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY token
        |)
        |ORDER BY tfidf DESC, token
        |LIMIT 20""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  sha256(array_to_string(list_sort(list_distinct(str_split(text, ' '))), ' ')) AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "text_rolling_hash" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(7 AS BIGINT),
        |      list_transform(range(1, length(text) + 1),
        |        i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 2147483647) AS rhash
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id,
         |  CAST(len(toks) AS INTEGER) AS n_tokens,
         |  ${dbl(s"${dec("length(text) - (len(toks) - 1)")} / len(toks)")} AS avg_tok_len,
         |  ${dbl(s"${dec("len(list_filter(toks, tk -> tk IN ('the','a','of','and','to','in','is')))")} / len(toks)")} AS stopword_ratio
         |FROM (SELECT doc_id, text, str_split(text, ' ') AS toks FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      """SELECT doc_id,
        |  CAST(len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','ich'])) AS INTEGER) AS s_de,
        |  CAST(len(list_intersect(toks, ['the','a','of','and','to','in','is','that'])) AS INTEGER) AS s_en,
        |  CAST(len(list_intersect(toks, ['el','la','de','los','que','y','en','un'])) AS INTEGER) AS s_es,
        |  CAST(len(list_intersect(toks, ['le','la','les','et','des','un','une','est'])) AS INTEGER) AS s_fr,
        |  CAST(len(list_intersect(toks, ['的','是','在','了','我'])) AS INTEGER) AS s_zh,
        |  CASE
        |    WHEN len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','ich'])) >= len(list_intersect(toks, ['the','a','of','and','to','in','is','that']))
        |     AND len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','ich'])) >= len(list_intersect(toks, ['el','la','de','los','que','y','en','un']))
        |     AND len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','ich'])) >= len(list_intersect(toks, ['le','la','les','et','des','un','une','est']))
        |     AND len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','ich'])) >= len(list_intersect(toks, ['的','是','在','了','我'])) THEN 'de'
        |    WHEN len(list_intersect(toks, ['the','a','of','and','to','in','is','that'])) >= len(list_intersect(toks, ['el','la','de','los','que','y','en','un']))
        |     AND len(list_intersect(toks, ['the','a','of','and','to','in','is','that'])) >= len(list_intersect(toks, ['le','la','les','et','des','un','une','est']))
        |     AND len(list_intersect(toks, ['the','a','of','and','to','in','is','that'])) >= len(list_intersect(toks, ['的','是','在','了','我'])) THEN 'en'
        |    WHEN len(list_intersect(toks, ['el','la','de','los','que','y','en','un'])) >= len(list_intersect(toks, ['le','la','les','et','des','un','une','est']))
        |     AND len(list_intersect(toks, ['el','la','de','los','que','y','en','un'])) >= len(list_intersect(toks, ['的','是','在','了','我'])) THEN 'es'
        |    WHEN len(list_intersect(toks, ['le','la','les','et','des','un','une','est'])) >= len(list_intersect(toks, ['的','是','在','了','我'])) THEN 'fr'
        |    ELSE 'zh'
        |  END AS langid
        |FROM (SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "multimodal_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  sha256(text) AS payload_sha
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "multimodal_frame_sample" ->
      """SELECT doc_id, CAST(r.range AS INTEGER) AS frame_idx,
        |  sha256(text || ':' || CAST(r.range AS VARCHAR)) AS frame_sha
        |FROM documents, range(0, 16) r
        |WHERE r.range <= octet_length(encode(text)) % 16
        |  AND r.range % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // byte0_hex is NULL for zero-length payloads in BOTH engines: there
    // is no first byte to render (unguarded, Spark's stub yielded '00'
    // where DuckDB's hex-slice yielded '' — round-5 advice)
    "multimodal_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS DOUBLE) AS f_len,
        |  CAST(octet_length(encode(text)) % 7 AS DOUBLE) AS f_mod7,
        |  CAST(octet_length(encode(text)) % 11 AS DOUBLE) AS f_mod11,
        |  CASE WHEN octet_length(encode(text)) = 0 THEN NULL
        |    ELSE hex(encode(text))[1:2] END AS byte0_hex
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "multimodal_decode" ->
      s"""WITH d AS (
         |  $decodeStubSql
         |)
         |SELECT doc_id, width, height, format FROM d
         |ORDER BY doc_id""".stripMargin,

    // K50 resize planning: the SHARED stub decode, then the IDENTICAL
    // IEEE scale (maxDim / max-dim double divide) + floor + clamp walk
    // the Scala resizeStub runs (toInt on a positive double == floor);
    // the box size comes from the one declared constant
    "multimodal_dedup" -> multimodalDedupSql,

    "multimodal_resize" ->
      s"""WITH d AS (
         |  $decodeStubSql
         |), s AS (
         |  SELECT doc_id, width, height, format,
         |    LEAST(1.0, ${graft.multimodal.Multimodal.ResizeMaxDim}.0
         |      / GREATEST(width, height)) AS scale
         |  FROM d
         |)
         |SELECT doc_id, width, height,
         |  CAST(GREATEST(1, FLOOR(width * scale)) AS INTEGER) AS rs_width,
         |  CAST(GREATEST(1, FLOOR(height * scale)) AS INTEGER) AS rs_height,
         |  format
         |FROM s
         |ORDER BY doc_id""".stripMargin,

    // A45 restore: v1..v3 are the A18 history; v4 re-commits v1's
    // content (RESTORE is forward history) — the oracle recomputes all
    // four states from the base table, v4 ≡ v1 by construction
    "warehouse_restore" ->
      """WITH v1 AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 0
        |), v2 AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 5
        |), v3 AS (
        |  SELECT c_acctbal + 1000 AS c_acctbal FROM customer
        |  WHERE c_custkey % 100 = 0
        |)
        |SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents_sum FROM v1
        |UNION ALL
        |SELECT 2, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) FROM v2
        |UNION ALL
        |SELECT 3, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) FROM v3
        |UNION ALL
        |SELECT 4, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) FROM v1
        |ORDER BY version""".stripMargin,

    // E15 exact Lorenz curve at value-domain cardinality: identical
    // per-(pri, cents) collapse + descending cumulative sweep; both
    // report points recovered inside the boundary tie block with
    // integer ceil-division
    "win_cumulative_share" ->
      s"""WITH vals AS (
         |  SELECT o_orderpriority AS pri,
         |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS tc,
         |    COUNT(*) AS cnt
         |  FROM orders GROUP BY 1, 2
         |), swept AS (
         |  SELECT pri, tc, cnt,
         |    SUM(cnt) OVER (PARTITION BY pri ORDER BY tc DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         |    SUM(cnt * tc) OVER (PARTITION BY pri ORDER BY tc DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
         |    SUM(cnt) OVER (PARTITION BY pri) AS n,
         |    SUM(cnt * tc) OVER (PARTITION BY pri) AS total_cents
         |  FROM vals
         |), sp AS (
         |  SELECT *, cum_n - cnt AS prev_n,
         |    cum_cents - cnt * tc AS prev_cents
         |  FROM swept
         |), half AS (
         |  SELECT pri,
         |    prev_n + (total_cents - 2 * prev_cents + 2 * tc - 1)
         |      // (2 * tc) AS n_to_half,
         |    row_number() OVER (PARTITION BY pri ORDER BY tc DESC) AS rk
         |  FROM sp WHERE cum_cents * 2 >= total_cents
         |), decile AS (
         |  SELECT pri, n, total_cents, (n + 9) // 10 AS k,
         |    prev_cents + ((n + 9) // 10 - prev_n) * tc
         |      AS top_decile_cents,
         |    row_number() OVER (PARTITION BY pri ORDER BY tc DESC) AS rk
         |  FROM sp WHERE cum_n >= (n + 9) // 10
         |)
         |SELECT d.pri, CAST(d.n AS BIGINT) AS n,
         |  CAST(d.total_cents AS BIGINT) AS total_cents,
         |  CAST(d.k AS BIGINT) AS n_top_decile,
         |  ${dbl(s"${dec("d.top_decile_cents")} / d.total_cents")}
         |    AS top_decile_share,
         |  CAST(h.n_to_half AS BIGINT) AS n_to_half,
         |  ${dbl(s"${dec("h.n_to_half")} / d.n")} AS frac_to_half
         |FROM decile d JOIN half h ON d.pri = h.pri
         |WHERE d.rk = 1 AND h.rk = 1
         |ORDER BY d.pri""".stripMargin,

    // J45 top user paths: identical rank-capped listagg with the
    // fully tie-broken inner order (the D29 discipline)
    "events_top_paths" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rk
        |  FROM events
        |), p AS (
        |  SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY tus, event_id) AS path
        |  FROM ranked WHERE rk <= 8 GROUP BY user_id
        |)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path
        |ORDER BY n_users DESC, path
        |LIMIT 20""".stripMargin,

    // A47 commit history: manifest composition is determined by the
    // recipe (1 seg / 2 segs / 1 seg / 1 seg + 1 DV); row counts and
    // balances recomputed from raw customer, v4 minus the deleted keys
    "warehouse_history" ->
      """WITH v1 AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 0
        |), v2 AS (
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_acctbal FROM customer WHERE c_custkey % 10 = 5
        |), v3 AS (
        |  SELECT c_acctbal + 1000 AS c_acctbal FROM customer
        |  WHERE c_custkey % 100 = 0
        |), v4 AS (
        |  SELECT c_acctbal + 1000 AS c_acctbal FROM customer
        |  WHERE c_custkey % 100 = 0 AND c_custkey % 200 <> 0
        |)
        |SELECT 1 AS version, 1 AS n_segments, 0 AS n_delete_vectors,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS bal_cents FROM v1
        |UNION ALL
        |SELECT 2, 2, 0, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |  FROM v2
        |UNION ALL
        |SELECT 3, 1, 0, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |  FROM v3
        |UNION ALL
        |SELECT 4, 1, 1, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |  FROM v4
        |ORDER BY version""".stripMargin,

    // D43 categorical entropy: the K33 term-round + exact-decimal-sum
    // discipline over (status, priority) counts
    "agg_group_entropy" ->
      """WITH c AS (
        |  SELECT o_orderstatus AS s, o_orderpriority AS pri,
        |    COUNT(*) AS c
        |  FROM orders GROUP BY 1, 2
        |), a AS (
        |  SELECT s, SUM(c) AS n, COUNT(*) AS k,
        |    SUM(CAST(round(c * ln(c), 9) AS DECIMAL(28,9))) AS scl
        |  FROM c GROUP BY s
        |)
        |SELECT s, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  round((ln(n) - CAST(scl AS DOUBLE) / n) / ln(2), 6)
        |    AS entropy_bits,
        |  CASE WHEN k > 1 THEN
        |    round((ln(n) - CAST(scl AS DOUBLE) / n) / ln(k), 6)
        |  END AS entropy_norm
        |FROM a ORDER BY s""".stripMargin,

    // H20 edit-distance battery: deterministic same-row pairs; the
    // thresholded 3-arg form spelled as the equivalent CASE
    "fn_editdist" ->
      """WITH p AS (
        |  SELECT p_brand,
        |    levenshtein(p_name, reverse(p_name)) AS lv_rev,
        |    levenshtein(p_name, upper(p_name)) AS lv_up,
        |    CASE WHEN levenshtein(p_name, p_brand) > 10 THEN -1
        |         ELSE levenshtein(p_name, p_brand) END AS lv_brand_10
        |  FROM part
        |)
        |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(lv_rev) AS BIGINT) AS sum_lv_rev,
        |  CAST(MAX(lv_rev) AS BIGINT) AS max_lv_rev,
        |  CAST(SUM(lv_up) AS BIGINT) AS sum_lv_up,
        |  CAST(SUM(CASE WHEN lv_brand_10 >= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_within_10
        |FROM p GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    // A46 partition-spec evolution: the store is value-transparent —
    // the oracle recomputes both band aggregates from raw orders with
    // the same floor-division era arithmetic
    "warehouse_partition_evolution" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders
        |), k AS (
        |  SELECT MAX(o_orderkey) + 1 AS k FROM o
        |)
        |SELECT 'custkey_10_60' AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(price_cents) AS BIGINT) AS cents_sum,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |FROM o WHERE o_custkey BETWEEN 10 AND 60
        |UNION ALL
        |SELECT 'orderkey_first_sixth',
        |  CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(price_cents) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
        |FROM o, k WHERE o_orderkey BETWEEN 0 AND k // 6
        |ORDER BY band""".stripMargin,

    // C46 bloom-prefiltered semi-join: the bloom has no false
    // negatives and the exact semi-join removes false positives, so
    // the oracle is the PLAIN semi-join — hash equality proves the
    // prefilter changed nothing but the bytes moved
    "join_bloom_semi" ->
      """SELECT l_returnflag AS rf, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS qty_cents,
        |  CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
        |GROUP BY l_returnflag
        |ORDER BY rf""".stripMargin,

    // D41 Spearman: identical distinct-value rank maps (doubled
    // tie-averaged ranks stay integer), exact 128-bit moment sums
    // (HUGEINT here ≡ the engine's DECIMAL(38) in range), one
    // closed-form double per group
    "agg_spearman" ->
      """WITH li AS (
        |  SELECT l_returnflag AS rf,
        |    CAST(round(l_quantity * 100, 0) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
        |  FROM lineitem
        |), xc AS (
        |  SELECT rf, x, COUNT(*) AS cnt FROM li GROUP BY rf, x
        |), xr AS (
        |  SELECT rf, x,
        |    2 * COALESCE(SUM(cnt) OVER (PARTITION BY rf ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + cnt + 1 AS rx
        |  FROM xc
        |), yc AS (
        |  SELECT rf, y, COUNT(*) AS cnt FROM li GROUP BY rf, y
        |), yr AS (
        |  SELECT rf, y,
        |    2 * COALESCE(SUM(cnt) OVER (PARTITION BY rf ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + cnt + 1 AS ry
        |  FROM yc
        |), j AS (
        |  SELECT li.rf, rx, ry FROM li
        |  JOIN xr ON li.rf = xr.rf AND li.x = xr.x
        |  JOIN yr ON li.rf = yr.rf AND li.y = yr.y
        |), m AS (
        |  SELECT rf, COUNT(*) AS n,
        |    CAST(SUM(CAST(rx AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(ry AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS DOUBLE)
        |      AS sxy,
        |    CAST(SUM(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS DOUBLE)
        |      AS sx2,
        |    CAST(SUM(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS DOUBLE)
        |      AS sy2
        |  FROM j GROUP BY rf
        |)
        |SELECT rf, CAST(n AS BIGINT) AS n,
        |  CASE WHEN (n * sx2 - sx * sx) > 0 AND (n * sy2 - sy * sy) > 0
        |    THEN round((n * sxy - sx * sy)
        |      / sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6)
        |  END AS spearman_rho
        |FROM m ORDER BY rf""".stripMargin,

    // J44 CUSUM change point: devₜ = days·cₜ − total keeps the series
    // integer (zero-sum per type); argmax |CUSUM| with earliest-day
    // tie-break is deterministic in both engines
    "events_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)
        |), sized AS (
        |  SELECT event_type, day, cnt,
        |    COUNT(*) OVER (PARTITION BY event_type) AS days,
        |    SUM(cnt) OVER (PARTITION BY event_type) AS total
        |  FROM daily
        |), cs AS (
        |  SELECT event_type, day, cnt, days, total,
        |    SUM(days * cnt - total) OVER (PARTITION BY event_type
        |      ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        |  FROM sized
        |), pick AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY abs(cusum) DESC, day) AS rk
        |  FROM cs
        |)
        |SELECT event_type, day AS change_day,
        |  CAST(cnt AS BIGINT) AS day_count,
        |  CAST(days AS BIGINT) AS days,
        |  CAST(total AS BIGINT) AS total,
        |  CAST(cusum AS BIGINT) AS cusum_at_change
        |FROM pick WHERE rk = 1
        |ORDER BY event_type""".stripMargin,

    // L14 reciprocity over the part-succession digraph: identical
    // lead-window edge derivation, EXISTS for the reciprocal probe
    "graph_reciprocity" ->
      s"""WITH seq AS (
         |  SELECT l_partkey AS src,
         |    lead(l_partkey) OVER (PARTITION BY l_orderkey
         |      ORDER BY l_linenumber, l_partkey) AS dst
         |  FROM lineitem
         |), edges AS (
         |  SELECT DISTINCT src, dst FROM seq
         |  WHERE dst IS NOT NULL AND src <> dst
         |), recip AS (
         |  SELECT COUNT(*) AS n_reciprocated FROM edges e
         |  WHERE EXISTS (SELECT 1 FROM edges r
         |    WHERE r.src = e.dst AND r.dst = e.src)
         |), nn AS (
         |  SELECT COUNT(*) AS n_nodes FROM (
         |    SELECT src AS node FROM edges
         |    UNION SELECT dst FROM edges)
         |), ee AS (
         |  SELECT COUNT(*) AS n_edges FROM edges
         |)
         |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
         |  CAST(n_edges AS BIGINT) AS n_edges,
         |  CAST(n_reciprocated AS BIGINT) AS n_reciprocated,
         |  CAST(n_reciprocated // 2 AS BIGINT) AS n_mutual_pairs,
         |  CAST(n_edges - n_reciprocated AS BIGINT) AS n_asymmetric,
         |  ${dbl(s"${dec("n_reciprocated")} / n_edges")} AS reciprocity
         |FROM nn, ee, recip""".stripMargin,

    // K90 code detection: identical deterministic injection (pure
    // function of doc_id), identical strip-class automaton
    "text_code_detect" ->
      """WITH injected AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 7 = 0
        |         THEN ' int f(x){return a[i]<=y&&b!=0;}' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0
        |         THEN ' (see note <1>)' ELSE '' END AS t2
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, length(t2) AS n_chars,
        |    length(t2) - length(regexp_replace(t2,
        |      '[{}()\[\];=<>|&]', '', 'g')) AS n_code_chars
        |  FROM injected
        |)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |  CAST(n_code_chars AS BIGINT) AS n_code_chars,
        |  CASE WHEN n_chars > 0 THEN
        |    CAST(CAST(CAST(n_code_chars AS DECIMAL(18,4)) / n_chars
        |      AS DECIMAL(38,6)) AS DOUBLE) END AS code_char_ratio,
        |  n_code_chars >= 10 AS is_code
        |FROM c ORDER BY doc_id""".stripMargin
  )
}
