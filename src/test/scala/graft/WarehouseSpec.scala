package graft

import org.apache.spark.sql.SaveMode
import graft.census.Warehouse

/** R21/R22 warehouse-load semantics: create-if-absent, Append = COPY,
  * Overwrite = rebuild, sorted layout applied before write. */
class WarehouseSpec extends SparkTestBase {

  private def mkDf(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"row$i")).toDF("id", "v")
  }

  test("merge: updates override (incl. NULL overwrite), inserts land, rest survive") {
    import spark.implicits._
    val target = Seq((Some(1L), Some("a")), (Some(2L), Some("b")),
      (None, Some("n"))).toDF("id", "v")
    val updates = Seq((Some(2L), None: Option[String]), // matched → NULL v wins
      (Some(3L), Some("c")),                            // unmatched → insert
      (None, Some("nn"))                                // NULL key merges, not dups
    ).toDF("id", "v")
    val got = Warehouse.merge(target, updates, Seq("id")).collect()
      .map(r => (Option(r.get(0)).map(_.toString.toLong),
        Option(r.get(1)).map(_.toString))).toSet
    assert(got == Set(
      (Some(1L), Some("a")), (Some(2L), None), (Some(3L), Some("c")),
      (None, Some("nn"))))
  }

  test("merge rejects duplicate update keys (MERGE cardinality violation)") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val dups = Seq((2L, "x"), (2L, "y"), (3L, "c")).toDF("id", "v")
    val e = intercept[Exception] {
      Warehouse.merge(target, dups, Seq("id")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("MERGE_CARDINALITY_VIOLATION")),
      s"wrong failure: $e")
    // and a unique-keyed frame still merges fine through the guard
    val ok = Warehouse.merge(target,
      Seq((2L, "x"), (3L, "c")).toDF("id", "v"), Seq("id")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ok == Set((1L, "a"), (2L, "x"), (3L, "c")))
  }

  test("mergeScd2: every arm, plus the no-overlap / one-open-row / idempotence laws") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val d = java.sql.Date.valueOf(_: String)
    def scd2(rows: Seq[(Long, String, String, Option[String])]) =
      rows.map { case (k, v, f, t) => (k, v, d(f), t.map(d)) }
        .toDF("id", "v", "valid_from", "valid_to")
    // key 1: history + open (will change); 2: open, unchanged re-send;
    // 3: open, untouched by the batch; 5: fresh key
    val target = scd2(Seq(
      (1L, "a0", "2023-01-01", Some("2024-01-01")),
      (1L, "a1", "2024-01-01", None),
      (2L, "b", "2024-01-01", None),
      (3L, "c", "2024-01-01", None)))
    val updates = Seq((1L, "a2"), (2L, "b"), (5L, "e")).toDF("id", "v")
    val out = Warehouse.mergeScd2(target, updates, Seq("id"),
      lit(d("2025-06-01")))
    val got = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString))).toSet
    assert(got == Set(
      (1L, "a0", "2023-01-01", Some("2024-01-01")),   // history untouched
      (1L, "a1", "2024-01-01", Some("2025-06-01")),   // closed at batch time
      (1L, "a2", "2025-06-01", None),                 // new open version
      (2L, "b", "2024-01-01", None),                  // unchanged → no version
      (3L, "c", "2024-01-01", None),                  // untouched open row
      (5L, "e", "2025-06-01", None)))                 // fresh key opens
    // SCD2 invariants on the merged table
    val byKey = got.groupBy(_._1)
    for ((k, vs) <- byKey) {
      assert(vs.count(_._4.isEmpty) == 1, s"key $k open-row count != 1")
      // versions never overlap: sorted by valid_from, each row's
      // valid_to equals the next row's valid_from
      val sorted = vs.toSeq.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Seq(prev, next) => assert(prev._4.contains(next._3),
          s"key $k: ${prev._4} does not meet ${next._3}")
        case _ =>
      }
    }
    // idempotence: re-running the same batch against the merged table
    // changes nothing (unchanged attrs never open a version)
    val again = Warehouse.mergeScd2(out, updates, Seq("id"),
      lit(d("2025-07-01")))
    assert(again.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDate(2).toString, Option(r.getDate(3)).map(_.toString))).toSet
      == got)
    // same cardinality guard as SCD1
    val e = intercept[Exception] {
      Warehouse.mergeScd2(target,
        Seq((1L, "x"), (1L, "y")).toDF("id", "v"), Seq("id"),
        lit(d("2025-06-01"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("MERGE_CARDINALITY_VIOLATION")))
  }

  test("mergeWithDeletes: every arm — delete, ghost delete no-op, update, insert, guard") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changes = Seq(
      (2L, "b2", "U"), // matched update
      (3L, "c", "D"),  // matched delete
      (4L, "d", "U"),  // unmatched insert
      (9L, "x", "D")   // ghost delete: absent key, must be a no-op
    ).toDF("id", "v", "op")
    val got = Warehouse.mergeWithDeletes(target, changes, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (4L, "d")))
    // an update AND a delete for one key in one batch is the MERGE
    // cardinality violation, same as duplicate updates
    val e = intercept[Exception] {
      Warehouse.mergeWithDeletes(target,
        Seq((2L, "x", "U"), (2L, "y", "D")).toDF("id", "v", "op"),
        Seq("id")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("MERGE_CARDINALITY_VIOLATION")))
  }

  test("append loads accumulate like COPY; overwrite rebuilds") {
    val tbl = "graft_wh_test"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Warehouse.load(mkDf(5), tbl, SaveMode.Append, Seq("id"))
    assert(spark.table(tbl).count() == 5)
    Warehouse.load(mkDf(5), tbl, SaveMode.Append, Seq("id"))
    assert(spark.table(tbl).count() == 10)
    Warehouse.load(mkDf(3), tbl, SaveMode.Overwrite, Seq("id"))
    assert(spark.table(tbl).count() == 3)
    assert(spark.table(tbl).columns.toSeq == Seq("id", "v"))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("jdbc format round-trips through a real embedded database") {
    val dbPath = java.nio.file.Files
      .createTempDirectory("graft_derby_").resolve("db")
    val opts = Map(
      "url" -> s"jdbc:derby:$dbPath;create=true",
      "driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    def readBack() = spark.read.format("jdbc").options(opts)
      .option("dbtable", "GRAFT_JDBC_T").load()
    // Append creates-if-absent then accumulates (COPY semantics)
    Warehouse.load(mkDf(5), "GRAFT_JDBC_T", SaveMode.Append,
      format = "jdbc", options = opts)
    assert(readBack().count() == 5)
    Warehouse.load(mkDf(5), "GRAFT_JDBC_T", SaveMode.Append,
      format = "jdbc", options = opts)
    assert(readBack().count() == 10)
    // Overwrite rebuilds (the ZCTA pipeline's drop-and-recreate path)
    Warehouse.load(mkDf(3), "GRAFT_JDBC_T", SaveMode.Overwrite,
      format = "jdbc", options = opts)
    val back = readBack()
    assert(back.count() == 3)
    assert(back.columns.map(_.toLowerCase).toSeq == Seq("id", "v"))
  }

  test("A19: SCD2 as-of read routes every order to exactly one version") {
    val rows = graft.ops.Scans.warehouseScd2Asof(spark, sfDir).collect()
    assert(rows.map(_.getDate(0).toString).toSeq ==
      Seq("1995-01-01", "1998-01-01", "2000-06-01"),
      "the three version dates, in order")
    val orders = graft.ops.Util.t(spark, sfDir, "orders")
    // validity ranges partition [1995, inf) per key (the mergeScd2
    // no-overlap law), so the as-of join is a function: every order
    // matches exactly one dimension version
    assert(rows.map(_.getLong(1)).sum == orders.count())
    // only every-10th customers have a 2000-06-01 version
    val custs = graft.ops.Util.t(spark, sfDir, "customer").count()
    assert(rows.last.getLong(2) <= custs / 10 + 1)
  }

  test("files form disjoint sorted key ranges (SORTKEY layout)") {
    val tbl = "graft_wh_sorted"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    import org.apache.spark.sql.functions._
    Warehouse.load(mkDf(100).orderBy(rand(42)), tbl, SaveMode.Overwrite, Seq("id"))
    val ranges = spark.table(tbl)
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.nonEmpty)
    // range partitioning ⇒ file key ranges never overlap
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlap: $ranges")
      case _ =>
    }
    spark.sql(s"DROP TABLE $tbl")
  }
}
