package graft

import java.nio.file.Files
import java.util.Base64
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{LogEvent, LogEvents}
import graft.streaming.Commands

/** S2 command stream (decode → gate → dispatch) and the streaming
  * log sink (K6/K7 as a continuous query).
  */
class CommandsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  test("command stream: each matching message dispatches once; unknown skipped") {
    val root = Files.createTempDirectory("graft-cmd")
    val dir = Files.createDirectories(root.resolve("commands"))
    Files.write(dir.resolve("batch1.txt"), String.join("\n",
      b64("collect-weather-data"),
      b64("cleanup-older-data"),
      b64("collect-weather-data"),
      b64("unknown-command")).getBytes)

    val collects = new AtomicInteger
    val cleanups = new AtomicInteger
    Commands.runOnce(spark, dir.toString, root.resolve("ckpt").toString, Map(
      "collect-weather-data" -> (() => { collects.incrementAndGet(); () }),
      "cleanup-older-data" -> (() => { cleanups.incrementAndGet(); () })))

    assert(collects.get() == 2 && cleanups.get() == 1)

    // exactly-once: draining again dispatches nothing new
    Commands.runOnce(spark, dir.toString, root.resolve("ckpt").toString, Map(
      "collect-weather-data" -> (() => { collects.incrementAndGet(); () })))
    assert(collects.get() == 2)
  }

  test("streaming log sink: envelope stream lands partitioned + normalized") {
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft-logstream")
    val out = root.resolve("logs").toString
    val input = MemoryStream[String]
    val events = Seq(
      LogEvent("p", "svc", "proc", "py", LogEvents.ApiLogging,
        Some("f"), None, None, "success", "ok"),
      LogEvent("p", "svc", "proc", "py", LogEvents.BqCleanupLogging,
        None, None, None, "Error", "boom"))
    input.addData(LogEvents.toEnvelope(events.toDS())
      .as[String].collect().toSeq: _*)

    val q = LogEvents.appendStream(
      input.toDF().toDF("value"), out, root.resolve("ckpt").toString)
    q.awaitTermination()

    val back = LogEvents.read(spark, out)
    assert(back.count() == 2)
    assert(back.select("message_type").as[String].collect().toSet ==
      Set("success", "error")) // "Error" normalized in-stream
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_ == "_spark_metadata").toSet
    assert(dirs == Set(s"log_type=${LogEvents.ApiLogging}",
      s"log_type=${LogEvents.BqCleanupLogging}"))
  }
}
