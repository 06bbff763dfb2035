package graft.census

/** The reference's 62-row code→label column mapping, source-materialized
  * (no Excel reader in the offline jar set — SURVEY.md §1.4).
  *
  * Mirrors `/root/reference/Census Data Fields for API.xlsx` sheet1 as
  * loaded by `Test_census_tract.py:46-55`: keys upper-cased + trimmed,
  * value = human-readable label. Full extraction in
  * `/root/repo/FIXTURES.md` §3.
  */
object Mapping {
  /** code → label; apply to column names via [[Normalize.renameByMapping]]. */
  val codeToLabel: Map[String, String] = Map(
    "DP02_0060E" -> "Less than High School",
    "DP02_0061E" -> "Some High School",
    "DP02_0062E" -> "High School Degree",
    "DP02_0063E" -> "Some College, No Degree",
    "DP02_0064E" -> "Associate's Degree",
    "DP02_0068E" -> "Bachelor's Degree or Greater",
    "DP03_0062E" -> "Median Household Income",
    "DP03_0052E" -> "HH Income <$10K",
    "DP03_0053E" -> "HH Income $10K-15K",
    "DP03_0054E" -> "HH Income $15K-25K",
    "DP03_0055E" -> "HH Income $25K-35K",
    "DP03_0056E" -> "HH Income $35K-50K",
    "DP03_0057E" -> "HH Income $50K-75K",
    "DP03_0058E" -> "HH Income $75K-100K",
    "DP03_0059E" -> "HH Income $100K-150K",
    "DP03_0060E" -> "HH Income $150K-200K",
    "DP03_0061E" -> "HH Income >$200K",
    "DP03_0097PE" -> "Private Health Insurance",
    "DP03_0009PE" -> "Unemployment Rate",
    "DP05_0076E" -> "Hispanic",
    "DP05_0082E" -> "White Non-Hispanic",
    "DP05_0083E" -> "Black Non-Hispanic",
    "DP05_0084E" -> "Alaska Native",
    "DP05_0085E" -> "Asian Alone",
    "DP05_0086E" -> "Native Hawaiian",
    "DP05_0087E" -> "Some Other Race Alone",
    "DP05_0088E" -> "Two or More Races",
    "S0101_C01_001E" -> "Total Population",
    "S0101_C01_002E" -> "Age <5",
    "S0101_C01_003E" -> "Age 5-9",
    "S0101_C01_004E" -> "Age 10-14",
    "S0101_C01_005E" -> "Age 15-19",
    "S0101_C01_006E" -> "Age 20-24",
    "S0101_C01_007E" -> "Age 25-29",
    "S0101_C01_008E" -> "Age 30-34",
    "S0101_C01_009E" -> "Age 35-39",
    "S0101_C01_010E" -> "Age 40-44",
    "S0101_C01_011E" -> "Age 45-49",
    "S0101_C01_012E" -> "Age 50-54",
    "S0101_C01_013E" -> "Age 55-59",
    "S0101_C01_014E" -> "Age 60-64",
    "S0101_C01_015E" -> "Age 65-69",
    "S0101_C01_016E" -> "Age 70-74",
    "S0101_C01_017E" -> "Age 75-79",
    "S0101_C01_018E" -> "Age 80-84",
    "S0101_C01_019E" -> "Age 85+",
    "S0101_C01_020E" -> "Age 5-14",
    "S0101_C01_021E" -> "Age 15-17",
    "S0101_C01_022E" -> "Under 18 Years",
    "S0101_C01_023E" -> "Age 18-24",
    "S0101_C01_024E" -> "Age 15-44",
    "S0101_C01_025E" -> "Age 16+",
    "S0101_C01_026E" -> "Age 18+",
    "S0101_C01_027E" -> "Age 21+",
    "S0101_C01_028E" -> "Age 60+",
    "S0101_C01_029E" -> "Age 62+",
    "S0101_C01_030E" -> "Age 65+",
    "S0101_C01_031E" -> "Age 75+",
    "S0101_C01_032E" -> "Median Age",
    "S0101_C03_001E" -> "Total Male Population",
    "S0101_C05_001E" -> "Total Female Population",
    "S0101_C05_024E" -> "Females, Child Bearing Age (15-44)"
  )

  /** Geo/identity columns exempt from the unmapped-column audit
    * (`Test_census_tract.py:356-359`). */
  val geoColumns: Set[String] = Set("TRACT", "COUNTY", "STATE", "STATE_FIPS", "NAME")

  /** The reference's static geo domain: FIPS 01..56 minus unassigned codes
    * (`Test_census_tract.py:327`). */
  val unassignedFips: Set[Int] = Set(3, 7, 14, 43, 52)
}
