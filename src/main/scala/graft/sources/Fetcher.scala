package graft.sources

import java.io.InputStream

/** The transport seam of the census source (round-5 verdict task 4).
  *
  * The reference's chunk fetch is an HTTP GET
  * (`/root/reference/Test_census_tract.py:143-176`); the offline
  * fixture read and a production HTTP client are two implementations of
  * this one interface. `fetch` opens the bytes behind one chunk target
  * — it is called once per RETRY ATTEMPT inside
  * [[Retry.withBackoff]], so transient transport failures (the
  * reference's HTTPError) surface as exceptions here and are retried
  * under the R14/R15 policy without the reader knowing the transport.
  *
  * Selected per scan via the `fetcherClass` option (a class name with a
  * no-arg constructor, instantiated on the driver for schema/planning
  * reads and on executors for partition reads — the standard DSv2
  * string-option plug point).
  */
trait CensusFetcher extends Serializable {
  def fetch(target: String): InputStream
}

/** Default transport: the target is a local/shared-FS file path. */
class FileFetcher extends CensusFetcher {
  override def fetch(target: String): InputStream =
    new java.io.FileInputStream(target)
}

object CensusFetcher {
  val DefaultClass: String = classOf[FileFetcher].getName

  def forName(className: String): CensusFetcher =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[CensusFetcher]
}
