package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WeatherApi

/** The live HTTP boundary (S1) against a loopback stub server — the
  * real `java.net.http` transport, zero egress: retries on 5xx,
  * fail-fast on 4xx, query-parameter encoding, and the fetched body
  * flowing through the same schema'd parse as the fixture path.
  */
class HttpFetcherSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val body =
    """{"coord":{"lon":87.0,"lat":23.25},""" +
      """"weather":[{"id":800,"main":"Clear","description":"clear sky"}],""" +
      """"main":{"temp":300.15,"feels_like":301.0,"pressure":1000,""" +
      """"humidity":50,"temp_min":299.0,"temp_max":302.0},""" +
      """"visibility":10000,"wind":{"speed":3.0,"deg":120},""" +
      """"clouds":{"all":40},"dt":1661760000,"name":"B"}"""

  /** Serve `handler` on an ephemeral loopback port for the duration of
    * `f`.
    */
  private def withServer[A](handler: HttpExchange => Unit)(
      f: String => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/weather", (ex: HttpExchange) => handler(ex))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/weather")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, payload: String): Unit = {
    val bytes = payload.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  test("GET carries encoded query params; body parses under the API schema") {
    @volatile var seenQuery: String = null
    withServer { ex =>
      seenQuery = ex.getRequestURI.getRawQuery
      respond(ex, 200, body)
    } { url =>
      val fetcher = new WeatherApi.HttpFetcher(
        url, Map("lat" -> "23.25", "lon" -> "87.0", "appid" -> "k e y"))
      val df = WeatherApi.fetchFrame(spark, fetcher)
      val row = df.selectExpr("name", "main.temp", "weather[0].main").collect()
      assert(row.length === 1)
      assert(row(0).getString(0) === "B")
      assert(row(0).getDouble(1) === 300.15)
      assert(row(0).getString(2) === "Clear")
      assert(seenQuery === "appid=k+e+y&lat=23.25&lon=87.0")
    }
  }

  test("5xx retries up to the budget, then succeeds") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      if (calls.incrementAndGet() <= 2) respond(ex, 503, "busy")
      else respond(ex, 200, body)
    } { url =>
      val fetcher = new WeatherApi.HttpFetcher(
        url, Map.empty, retries = 2, backoffMillis = 1L)
      assert(fetcher.fetch() === body)
      assert(calls.get() === 3)
    }
  }

  test("5xx beyond the retry budget propagates the failure") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      calls.incrementAndGet(); respond(ex, 500, "down")
    } { url =>
      val fetcher = new WeatherApi.HttpFetcher(
        url, Map.empty, retries = 1, backoffMillis = 1L)
      val e = intercept[java.io.IOException](fetcher.fetch())
      assert(e.getMessage.contains("500"))
      assert(calls.get() === 2) // initial + 1 retry, no more
    }
  }

  test("3xx fails immediately — this client never follows redirects") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      calls.incrementAndGet()
      ex.getResponseHeaders.add("Location", "http://127.0.0.1/elsewhere")
      respond(ex, 302, "moved")
    } { url =>
      val fetcher = new WeatherApi.HttpFetcher(
        url, Map.empty, retries = 3, backoffMillis = 1L)
      val e = intercept[WeatherApi.NonRetryableResponse](fetcher.fetch())
      assert(e.getMessage.contains("302"))
      assert(calls.get() === 1)
    }
  }

  test("4xx fails immediately — a bad key is not retryable") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      calls.incrementAndGet(); respond(ex, 401, "bad key")
    } { url =>
      val fetcher = new WeatherApi.HttpFetcher(
        url, Map("appid" -> "wrong"), retries = 3, backoffMillis = 1L)
      val e = intercept[java.io.IOException](fetcher.fetch())
      assert(e.getMessage.contains("401"))
      assert(calls.get() === 1)
    }
  }
}
