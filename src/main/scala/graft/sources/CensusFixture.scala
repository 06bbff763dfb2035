package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

/** Deterministic census-API-shaped fixture for [[CensusSource]]: a JSON
  * array-of-arrays file in the reference's wire format (row 0 = column
  * names, rows 1..n = all-string data — `Test_census_tract.py:167-168`),
  * two tract rows per state of the census domain. Every cell is a pure
  * function of (state fips, tract index), so the DuckDB oracle can
  * reconstruct the identical relation from `range()` without reading
  * the file — the same closed-form trick as `census_states`. */
object CensusFixture {
  /** The `all_vars` expectation list handed to the source (R5/R6). */
  val Expect: Seq[String] =
    Seq("NAME", "DP02_0001E", "DP03_0002E", "state", "tract")

  private val tracts = Seq("000100", "000200")

  /** Data rows in file-column order (variables first, geo appended —
    * the API's column placement). */
  def rows: Seq[Seq[String]] = for {
    fips <- CensusSource.stateFips
    (tr, idx) <- tracts.zipWithIndex
  } yield {
    val i = idx + 1
    Seq(
      s"Census Tract $i, State $fips",
      (fips.toInt * 100 + i).toString,
      (fips.toInt * 1000 + i * 7).toString,
      fips,
      tr)
  }

  /** JVM-lifetime fixture file, written once and removed on exit. */
  lazy val path: String = {
    val p = java.nio.file.Files.createTempFile("graft_census_fixture_", ".json")
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    (Expect +: rows).foreach { r =>
      val a = arr.addArray()
      r.foreach(a.add)
    }
    java.nio.file.Files.writeString(p, mapper.writeValueAsString(arr))
    p.toFile.deleteOnExit()
    p.toString
  }
}
