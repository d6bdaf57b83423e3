package graft.sources

import java.net.InetSocketAddress
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** OTLP/HTTP PUSH receiver — closes the last ingestion-shape gap with
  * the reference, which is fed live pdata batches by the collector
  * runtime (`/root/reference/exporter.go:101,130,175`
  * `consumeTraces`/`consumeMetrics`/`consumeLogs`). Spark executors
  * can't accept pushes, so the receiver bridges push → pull with a
  * durable SPOOL: each accepted POST body (a serialized
  * `Export{Trace,Logs,Metrics}ServiceRequest`) is written whole to
  * `<spool>/<signal>/` — write-to-temp then ATOMIC rename, so the
  * streaming file source never observes a partial file — and the 200
  * is sent only after the spool write completes. That is at-least-once
  * handoff with the same durability point as the reference's
  * consume→write path: an acked request is on disk.
  *
  * The receiver does NO parsing on the hot path (beyond the route) —
  * decoding happens on executors via [[OtelProtoSource.tracesStream]] /
  * [[OtelProtoSource.logsStream]] / metrics twins, exactly like a
  * collector receiver's enqueue. Standard OTLP/HTTP surface:
  * `POST /v1/{traces,logs,metrics}` with `application/x-protobuf`;
  * JSON bodies get 415 (the engine's OTLP/JSON path is the
  * collector-file-drop source [[OtelJsonSource]]), other methods 405,
  * unknown routes 404. Responses are empty Export*ServiceResponse
  * messages (zero proto bytes), per spec.
  *
  * Scale: one receiver instance is collector-sidecar shaped. For a
  * 1000-executor deployment you run N receivers behind a balancer, all
  * spooling to shared storage — the streaming source's file log
  * handles many writers; per-file decode keeps parallelism = request
  * count, and nothing funnels through the driver.
  */
final class OtlpHttpReceiver(spoolDir: String, host: String = "127.0.0.1",
                             port: Int = 0) {

  private val signals = Map(
    "/v1/traces" -> "traces", "/v1/logs" -> "logs", "/v1/metrics" -> "metrics")

  private val seq = new AtomicLong(0L)
  val accepted: Map[String, AtomicLong] =
    signals.values.map(_ -> new AtomicLong(0L)).toMap

  private val inflight: Path = {
    val p = Paths.get(spoolDir, ".inflight")
    Files.createDirectories(p)
    signals.values.foreach(s => Files.createDirectories(Paths.get(spoolDir, s)))
    p
  }

  private val server: HttpServer =
    HttpServer.create(new InetSocketAddress(host, port), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
  server.createContext("/", (ex: HttpExchange) => {
    try handle(ex)
    catch {
      case t: Throwable =>
        respond(ex, 500, s"""{"error":"${t.getMessage}"}""".getBytes("UTF-8"))
    }
  })
  server.start()

  def uri: String = s"http://$host:${server.getAddress.getPort}"
  def stop(): Unit = { server.stop(0); () }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    signals.get(path) match {
      case None =>
        respond(ex, 404, s"""{"error":"no route: $path"}""".getBytes("UTF-8"))
      case Some(_) if ex.getRequestMethod != "POST" =>
        respond(ex, 405, """{"error":"method not allowed"}""".getBytes("UTF-8"))
      case Some(signal) =>
        val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
        if (!ct.startsWith("application/x-protobuf"))
          respond(ex, 415,
            """{"error":"use application/x-protobuf (OTLP/JSON ingest is the collector file-drop source)"}"""
              .getBytes("UTF-8"))
        else {
          val body = ex.getRequestBody.readAllBytes()
          // durability point: temp write + atomic move BEFORE the ack.
          // Name is (epochMs, per-process seq) — unique and roughly
          // arrival-ordered for the file source's log.
          val name =
            f"${System.currentTimeMillis()}%013d-${seq.getAndIncrement()}%06d.pb"
          val tmp = inflight.resolve(s"$signal-$name")
          Files.write(tmp, body)
          Files.move(tmp, Paths.get(spoolDir, signal, name),
            StandardCopyOption.ATOMIC_MOVE)
          accepted(signal).incrementAndGet()
          ex.getResponseHeaders.add("Content-Type", "application/x-protobuf")
          respond(ex, 200, Array.emptyByteArray) // empty Export*ServiceResponse
        }
    }
  }
}

object OtlpHttpReceiver {
  /** Spool subdirectory the streaming sources should tail for a signal. */
  def spoolPath(spoolDir: String, signal: String): String = s"$spoolDir/$signal"
}
