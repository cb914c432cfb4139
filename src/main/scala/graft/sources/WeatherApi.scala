package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import graft.schema.WeatherSchema

/** S1 of SURVEY.md §2a: the HTTP REST source (OpenWeather current-weather
  * GET, /root/reference/Load-Data-From-API/main.py:72-77), isolated
  * behind a replayable interface.
  *
  * The network call is the only non-relational edge of the pipeline, so
  * it lives behind [[Fetcher]]: production supplies an HTTP
  * implementation; tests and this zero-egress environment replay
  * recorded response bodies. Everything downstream (schema'd parse →
  * clean → land → ingest) is identical either way — which is the point:
  * the engine's correctness never depends on the transport.
  */
object WeatherApi {

  /** One API call → one raw JSON response body. */
  trait Fetcher { def fetch(): String }

  /** Replay recorded API response bodies in order (cycling), the test
    * stand-in for the HTTP GET.
    */
  final class ReplayFetcher(bodies: Seq[String]) extends Fetcher {
    require(bodies.nonEmpty, "need at least one recorded body")
    private var i = -1
    def fetch(): String = { i = (i + 1) % bodies.size; bodies(i) }
  }

  /** Parse one fetched body against the DECLARED API schema — never
    * schema inference (SURVEY.md §1): absent branches become null
    * leaves exactly as BigQuery's schema'd load would produce.
    */
  def fetchFrame(spark: SparkSession, fetcher: Fetcher): DataFrame =
    spark.read.schema(WeatherSchema.api)
      .json(spark.createDataset(Seq(fetcher.fetch()))(Encoders.STRING))
}
