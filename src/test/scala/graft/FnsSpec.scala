package graft

import org.apache.spark.sql.functions._

/** H20 (edit-distance battery) laws. */
class FnsSpec extends SparkTestBase {

  test("H20: distance to the uppercased self equals the alphabetic char count") {
    // every alphabetic char is exactly one substitution; nothing else
    // moves — a closed form both engines must hit for the oracle to
    // hash-match
    val bad = graft.ops.Util.t(spark, sfDir, "part")
      .select(col("p_name"),
        levenshtein(col("p_name"), upper(col("p_name"))).as("lv_up"),
        length(regexp_replace(col("p_name"), "[^a-zA-Z]", ""))
          .as("n_alpha"))
      .filter(col("lv_up") =!= col("n_alpha"))
      .count()
    assert(bad == 0L)
  }

  test("H20: the thresholded form is -1 exactly beyond the cap") {
    val bad = graft.ops.Util.t(spark, sfDir, "part")
      .select(
        levenshtein(col("p_name"), col("p_brand")).as("lv"),
        levenshtein(col("p_name"), col("p_brand"), 10).as("lv10"))
      .filter(
        (col("lv") > 10 && col("lv10") =!= -1) ||
        (col("lv") <= 10 && col("lv10") =!= col("lv")))
      .count()
    assert(bad == 0L)
  }

  test("H20: the registered battery aggregates per brand, non-empty") {
    val rows = graft.ops.Fns.fnEditDist(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) > 0L && r.getLong(2) >= 0L))
  }
}
