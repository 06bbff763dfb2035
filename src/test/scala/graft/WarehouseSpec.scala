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
