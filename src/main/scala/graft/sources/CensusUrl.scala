package graft.sources

/** Builds the reference's census API request URLs — the missing piece
  * between [[HttpFetcher]] (transport) and [[CensusSource]] (scan):
  * with these three, the reference's R1 contract runs end-to-end over
  * HTTP (`spark.read.format("graft.sources.CensusSource")
  * .option("path", CensusUrl.tract(...))
  * .option("fetcherClass", classOf[HttpFetcher].getName)`).
  *
  * Tract form (`/root/reference/Test_census_tract.py:158-164,343`):
  * `https://api.census.gov/data/{year}/{dataset}?get=NAME,<vars>&
  * for=tract:*&in=state:<chunk>` — `NAME` is prepended and the list
  * first-occurrence-deduped (`:155-156`, `dict.fromkeys`), the state
  * chunk is comma-joined (`:343`).
  *
  * ZCTA form (`test_final_zcta.py:96-101`):
  * `...?get=<vars>&for=zip+code+tabulation+area:<zcta>` (no NAME
  * prepend, optional API key).
  *
  * Spaces are form-encoded as `+` (what python-requests produces for
  * query params); the census API's own delimiters (`,` `:` `*`) stay
  * literal, exactly as the reference sends them.
  */
object CensusUrl {
  val Base = "https://api.census.gov/data"

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
      .replace("%2C", ",").replace("%3A", ":").replace("%2A", "*")

  private def query(params: Seq[(String, String)]): String =
    params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")

  /** The tract pull for one state chunk: NAME-prepended,
    * first-occurrence-deduped variable list, `for=tract:*`,
    * `in=state:01,02,03`. */
  def tract(year: Int, dataset: String, variables: Seq[String],
      states: Seq[String]): String = {
    val vars = ("NAME" +: variables).distinct
    s"$Base/$year/$dataset?" + query(Seq(
      "get" -> vars.mkString(","),
      "for" -> "tract:*",
      "in" -> s"state:${states.mkString(",")}"))
  }

  /** The single national ZCTA pull (one call per table — no chunking,
    * `test_final_zcta.py:160-186`). */
  def zcta(year: Int, dataset: String, variables: Seq[String],
      zcta: String = "*", apiKey: Option[String] = None): String =
    s"$Base/$year/$dataset?" + query(Seq(
      "get" -> variables.mkString(","),
      "for" -> s"zip code tabulation area:$zcta") ++
      apiKey.map("key" -> _))
}
