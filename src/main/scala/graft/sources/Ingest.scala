package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration

/** Ingest utility (SURVEY S1/S2): the reference's download policy
  * (`/root/reference/src/io/GeoJSONDownloader.ts:19-151`) re-expressed
  * with the transport abstracted away:
  *
  *  - retry with fixed backoff: up to 10 retries, waiting between
  *    attempts ("wait a minute in case we are rate limited",
  *    `:121-141`);
  *  - endpoint serialization: downloads sharing an endpoint run
  *    strictly one-after-another (the Overpass rate-limit policy,
  *    `:27-63`), while distinct endpoints proceed in parallel;
  *  - Skimap bbox POST-filter: OSM queries carry the bbox server-side,
  *    the Skimap collection is filtered after download
  *    (`:102-118` booleanContains) — here a DataFrame filter over the
  *    canonical (geomType, coords) shape.
  *
  * The fetch function is injected: the zero-egress environment (and
  * the tests) use `file://` fixtures; a production deployment swaps in
  * an HTTP fetch without touching the policy code. Downloads happen on
  * the driver — they are a handful of archive files, not data-plane
  * work; the cluster-side ingest starts at the written files.
  */
object Ingest {

  /** One download: `name` labels the output, `endpoint` is the
    * serialization group (same endpoint → sequential), `url` the
    * source, `target` the local file to write.
    */
  final case class DownloadSpec(name: String, endpoint: String, url: String,
      target: String)

  type Fetcher = String => Array[Byte]

  /** `file://` fetcher used by tests and local fixtures. */
  val fileFetcher: Fetcher = url => {
    val uri = new java.net.URI(url)
    require(uri.getScheme == "file", s"fileFetcher got non-file URL: $url")
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(uri))
  }

  /** Download with retry + fixed backoff (GeoJSONDownloader.ts:121-141:
    * 10 retries, 60 s sleep). Returns the number of attempts made;
    * rethrows the last failure when retries are exhausted. `sleeper`
    * is injectable so tests assert the backoff without waiting.
    */
  def downloadToFile(url: String, target: String, fetcher: Fetcher,
      retries: Int = 10, backoffMs: Long = 60000L,
      sleeper: Long => Unit = Thread.sleep): Int = {
    var attempt = 1
    while (true) {
      try {
        val bytes = fetcher(url)
        java.nio.file.Files.write(java.nio.file.Paths.get(target), bytes)
        return attempt
      } catch {
        case e: Throwable =>
          if (attempt > retries) throw e
          sleeper(backoffMs)
          attempt += 1
      }
    }
    attempt // unreachable
  }

  /** Run all downloads: one sequential chain per endpoint, chains in
    * parallel (GeoJSONDownloader.ts:27-63). Returns name → attempts.
    */
  def downloadAll(specs: Seq[DownloadSpec], fetcher: Fetcher,
      retries: Int = 10, backoffMs: Long = 60000L,
      sleeper: Long => Unit = Thread.sleep): Map[String, Int] = {
    import scala.concurrent.ExecutionContext.Implicits.global
    val chains = specs.groupBy(_.endpoint).values.toSeq.map { group =>
      Future {
        group.map(s => s.name ->
          downloadToFile(s.url, s.target, fetcher, retries, backoffMs,
            sleeper)).toMap
      }
    }
    Await.result(Future.sequence(chains), Duration.Inf)
      .foldLeft(Map.empty[String, Int])(_ ++ _)
  }

  /** Keep features fully contained in [minLon, minLat, maxLon, maxLat]
    * — the Skimap post-download bbox filter over the canonical
    * (geomType, coords) feature shape.
    */
  def bboxFilter(features: DataFrame, minLon: Double, minLat: Double,
      maxLon: Double, maxLat: Double): DataFrame = {
    def in(p: Column) =
      element_at(p, 1) >= minLon && element_at(p, 1) <= maxLon &&
        element_at(p, 2) >= minLat && element_at(p, 2) <= maxLat
    features.filter(forall(col("coords"), in))
  }
}
