package graft

import java.io.IOException
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.StreamingQueryException

import graft.recovery.Recovery
import graft.sink.PartitionedParquetSink
import graft.sink.PartitionedParquetSink.SinkConfig
import graft.streaming.{Delivery, StreamingIngest}
import graft.streaming.Delivery.{PermanentException, RetryPolicy}

/** Delivery semantics: permanent-vs-retryable classification, bounded
  * backoff, and the retrying ingest path's at-least-once +
  * no-duplicate-manifest-entries contract (mirrors the reference's
  * errors.go taxonomy + exporterhelper retry queue). */
class DeliverySpec extends SparkSpec {

  // ---- classification --------------------------------------------------

  test("isPermanent matches the reference's four permanent groups") {
    val permanent = Seq(
      "401 Unauthorized: token rejected",
      "authentication failed for principal",
      "403 Forbidden",
      "Access Denied (Service: S3)",
      "Bad Request: malformed partition spec",
      "validation failed: field id collision",
      "namespace already exists")
    permanent.foreach { m =>
      assert(Delivery.isPermanent(new RuntimeException(m)), m)
    }
    val transient = Seq(
      "connection reset by peer",
      "503 Service Unavailable",
      "timeout waiting for lock",
      "throttled: slow down")
    transient.foreach { m =>
      assert(!Delivery.isPermanent(new IOException(m)), m)
    }
  }

  test("isPermanent walks the cause chain and treats AnalysisException as permanent by type") {
    val wrapped = new RuntimeException("stage failed",
      new IOException("task died", new RuntimeException("permission denied on bucket")))
    assert(Delivery.isPermanent(wrapped))
    val analysisFail =
      intercept[Throwable](spark.sql("SELECT definitely_not_a_column FROM range(1)"))
    assert(Delivery.isPermanent(new RuntimeException("wrapped", analysisFail)))
    assert(!Delivery.isPermanent(new RuntimeException("outer", new IOException("reset"))))
  }

  // ---- retry loop ------------------------------------------------------

  test("retry backs off exponentially with a cap and returns the first success") {
    val sleeps = ArrayBuffer.empty[Long]
    val retries = ArrayBuffer.empty[Int]
    val attempts = new AtomicInteger(0)
    val policy = RetryPolicy(maxAttempts = 10, initialBackoffMs = 50,
      maxBackoffMs = 120, multiplier = 2.0, sleep = sleeps += _)
    val out = Delivery.retry(policy, (n, _) => retries += n) {
      if (attempts.incrementAndGet() < 5) throw new IOException("connection reset")
      "ok"
    }
    assert(out === "ok")
    assert(attempts.get() === 5)
    assert(retries.toSeq === Seq(1, 2, 3, 4))
    // 50 → 100 → capped at 120 thereafter
    assert(sleeps.toSeq === Seq(50L, 100L, 120L, 120L))
  }

  test("retry rethrows the last transient error after maxAttempts") {
    val attempts = new AtomicInteger(0)
    val e = intercept[IOException] {
      Delivery.retry(RetryPolicy(maxAttempts = 3, sleep = _ => ())) {
        attempts.incrementAndGet()
        throw new IOException(s"reset ${attempts.get()}")
      }
    }
    assert(attempts.get() === 3)
    assert(e.getMessage === "reset 3")
  }

  test("retry fails fast on a permanent error: one attempt, wrapped") {
    val sleeps = ArrayBuffer.empty[Long]
    val attempts = new AtomicInteger(0)
    val e = intercept[PermanentException] {
      Delivery.retry(RetryPolicy(sleep = sleeps += _)) {
        attempts.incrementAndGet()
        throw new RuntimeException("invalid credentials")
      }
    }
    assert(attempts.get() === 1)
    assert(sleeps.isEmpty)
    assert(e.getCause.getMessage === "invalid credentials")
  }

  // ---- retrying ingest -------------------------------------------------

  test("transient failure between write and register: retried batch lands once in the manifest") {
    val base = Files.createTempDirectory("graft-delivery").toString
    val batch = Tables.events(spark, sf).limit(400)
    val srcDir = s"$base/src"
    batch.write.parquet(srcDir)

    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    val manifest = s"$base/manifest"
    val failures = new AtomicInteger(1) // first registration attempt dies
    val retried = new AtomicInteger(0)
    val q = Delivery.ingestWithManifestRetrying(
      StreamingIngest.readEvents(spark, srcDir, batch.schema), cfg,
      s"$base/chk", manifest,
      policy = RetryPolicy(maxAttempts = 4, initialBackoffMs = 1, sleep = _ => ()),
      onRetry = (_, _) => retried.incrementAndGet(),
      beforeRegister = _ =>
        if (failures.getAndDecrement() > 0) throw new IOException("connection reset"))
    q.awaitTermination()
    assert(retried.get() === 1)

    // at-least-once: every source row present (duplicates allowed — the
    // failed attempt's files persist), no row lost
    val out = spark.read.parquet(PartitionedParquetSink.tablePath(cfg))
    assert(out.count() >= batch.count())
    assert(out.select(batch.columns.map(org.apache.spark.sql.functions.col): _*)
      .distinct().count() === batch.distinct().count())

    // idempotent commit: manifest paths are unique and cover storage
    // exactly (no orphans left behind, nothing double-registered)
    val m = spark.read.parquet(manifest)
    assert(m.count() === m.select("file_path").distinct().count())
    assert(Recovery.scanOrphans(spark, PartitionedParquetSink.tablePath(cfg), m)
      .count() === 0)
  }

  test("permanent failure fails the query fast: no retries, cause surfaced") {
    val base = Files.createTempDirectory("graft-delivery-perm").toString
    val batch = Tables.events(spark, sf).limit(100)
    val srcDir = s"$base/src"
    batch.write.parquet(srcDir)

    val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
    val attempts = new AtomicInteger(0)
    val q = Delivery.ingestWithManifestRetrying(
      StreamingIngest.readEvents(spark, srcDir, batch.schema), cfg,
      s"$base/chk", s"$base/manifest",
      policy = RetryPolicy(maxAttempts = 5, initialBackoffMs = 1, sleep = _ => ()),
      beforeRegister = _ => {
        attempts.incrementAndGet()
        throw new RuntimeException("403 Forbidden: catalog write denied")
      })
    val e = intercept[StreamingQueryException](q.awaitTermination())
    assert(attempts.get() === 1) // fail-fast, not a hot retry loop
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[PermanentException]))
  }
}
