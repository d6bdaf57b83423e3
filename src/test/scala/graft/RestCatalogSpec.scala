package graft

import java.nio.file.Files

import org.json4s._

import graft.catalog.RestCatalogClient
import graft.catalog.RestCatalogClient.{CatalogAuth, DataFile, Settings}
import graft.streaming.Delivery.{PermanentException, RetryPolicy}

/** Drives [[RestCatalogClient]] against an in-JVM loopback HTTP server
  * implementing the Iceberg REST catalog protocol (config+prefix,
  * OAuth2 client-credentials, namespace/table CRUD, optimistic commit
  * with `assert-ref-snapshot-id`). The server is written from the
  * protocol spec, independent of the client, so a client-side
  * misreading of the API shows up as a failure here, not a silent
  * agreement. */
class RestCatalogSpec extends SparkSpec {
  private implicit val formats: Formats = DefaultFormats

  private def fastRetry = RetryPolicy(maxAttempts = 4, initialBackoffMs = 1, sleep = _ => ())

  private def withCatalog(f: (FakeRestCatalog, RestCatalogClient) => Unit): Unit = {
    val fake = new FakeRestCatalog
    fake.warehouseDir = "file://" + Files.createTempDirectory("graft-restcat").toString
    try {
      val client = new RestCatalogClient(Settings(fake.uri,
        warehouse = fake.warehouseDir,
        auth = CatalogAuth(clientId = "svc", clientSecret = "hunter2"),
        retry = fastRetry))
      f(fake, client)
    } finally fake.stop()
  }

  test("icebergSchemaJson: fresh ids are unique, sequential, pre-order; nested types covered") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("attrs", MapType(StringType, StringType)),
      StructField("tags", ArrayType(StringType)),
      StructField("nested", StructType(Seq(
        StructField("a", IntegerType),
        StructField("b", ArrayType(StructType(Seq(
          StructField("c", DoubleType)))))))),
      StructField("ts", TimestampType)))
    val (json, topIds) = RestCatalogClient.icebergSchemaJson(schema)
    // every id in the document (field ids + element/key/value ids) is
    // unique and the set is exactly 1..N — Iceberg's fresh-assignment
    // contract, matching the sink's footer ids
    def ids(j: JValue): Seq[BigInt] = j match {
      case JObject(fields) => fields.flatMap {
        // field/element/key/value ids — NOT schema-id (a version number)
        case (k, JInt(n)) if k == "id" || k == "element-id" ||
          k == "key-id" || k == "value-id" => Seq(n)
        case (_, v) => ids(v)
      }
      case JArray(vs) => vs.flatMap(ids)
      case _ => Nil
    }
    val all = ids(json)
    assert(all.distinct.size === all.size)
    assert(all.map(_.toInt).sorted === (1 to all.size))
    // top-level ids are in declaration order (pre-order: parent precedes
    // children), and the map resolves partition sources correctly
    assert(topIds("id") === 1)
    val declOrder = schema.fieldNames.toSeq.map(topIds)
    assert(declOrder === declOrder.sorted, "ids not pre-order by declaration")
    assert((json \ "type") === JString("struct"))
  }

  test("oauth client-credentials: token fetched on 401 and replayed; bad secret is permanent") {
    withCatalog { (fake, client) =>
      // first call hits 401 (client has no token yet), refreshes, replays
      client.ensureNamespace("otel")
      assert(fake.tokenIssued.get() === 1)
      assert(fake.namespaces.toSet === Set("otel"))

      val bad = new RestCatalogClient(Settings(fake.uri,
        auth = CatalogAuth(clientId = "svc", clientSecret = "wrong"),
        retry = fastRetry))
      intercept[PermanentException](bad.listNamespaces())
    }
  }

  /** r16: the reference's loggingTransport (internal/iceberg/http.go)
    * — verbosity-gated catalog round-trip observability. The invariant
    * that matters: the token value NEVER appears in a log entry, only
    * its presence and header length. */
  test("http request log: detailed sees every call, normal only errors, token never leaks") {
    withCatalog { (fake, _) =>
      fake.validToken = "sekrit-token-value"
      val entries = scala.collection.mutable.ArrayBuffer
        .empty[RestCatalogClient.HttpLogEntry]
      val client = new RestCatalogClient(Settings(fake.uri,
        auth = CatalogAuth(token = "sekrit-token-value"), retry = fastRetry),
        verbosity = "detailed", httpLog = entries += _)
      client.ensureNamespace("nslog")
      assert(client.listNamespaces().contains("nslog"))
      assert(entries.nonEmpty, "detailed verbosity must record every call")
      // 404 existence probes are part of the ensure-verbs' normal flow
      assert(entries.forall(e => e.status < 400 || e.status == 404))
      val authed = entries.filter(_.hasAuthorization)
      assert(authed.nonEmpty)
      assert(authed.forall(_.authorizationLength ==
        "Bearer sekrit-token-value".length))
      // the token value must not leak into any recorded string
      entries.foreach(e => assert(!e.toString.contains("sekrit"),
        s"token leaked: $e"))

      // normal verbosity: successful calls are silent, errors recorded
      val errs = scala.collection.mutable.ArrayBuffer
        .empty[RestCatalogClient.HttpLogEntry]
      val bad = new RestCatalogClient(Settings(fake.uri,
        auth = CatalogAuth(token = "wrong"), retry = fastRetry),
        verbosity = "normal", httpLog = errs += _)
      intercept[Exception](bad.listNamespaces())
      assert(errs.nonEmpty && errs.forall(_.status >= 400),
        s"normal verbosity must record only error responses: $errs")

      // basic verbosity: nothing recorded, even on errors
      val none = scala.collection.mutable.ArrayBuffer
        .empty[RestCatalogClient.HttpLogEntry]
      val silent = new RestCatalogClient(Settings(fake.uri,
        auth = CatalogAuth(token = "wrong"), retry = fastRetry),
        verbosity = "basic", httpLog = none += _)
      intercept[Exception](silent.listNamespaces())
      assert(none.isEmpty)
    }
  }

  test("static bearer token path works without the oauth endpoint") {
    withCatalog { (fake, _) =>
      fake.validToken = "static-tok"
      val client = new RestCatalogClient(Settings(fake.uri,
        auth = CatalogAuth(token = "static-tok"), retry = fastRetry))
      client.ensureNamespace("ns1")
      assert(client.listNamespaces() === Seq("ns1"))
      // wrong static token cannot refresh → permanent
      val bad = new RestCatalogClient(Settings(fake.uri,
        auth = CatalogAuth(token = "nope"), retry = fastRetry))
      intercept[PermanentException](bad.listNamespaces())
    }
  }

  test("ensureNamespace/ensureTable are idempotent and tolerate create races") {
    withCatalog { (fake, client) =>
      client.ensureNamespace("otel")
      client.ensureNamespace("otel") // second call: GET hit, no POST
      // simulate a lost race: namespace exists server-side but client GETs 404 first
      // (direct 409 path) — pre-insert then call through a fresh client
      fake.namespaces += "raced"
      client.ensureNamespace("raced")

      val schema = Tables.events(spark, sf).limit(1).schema
      client.ensureTable("otel", "events", schema, partitionCols = Seq("event_type"))
      val before = fake.requests.size
      client.ensureTable("otel", "events", schema) // cache hit: zero requests
      assert(fake.requests.size === before)
      // server got the fresh-id schema and the identity spec
      val tbl = fake.tables(("otel", "events"))
      val ids = (tbl.schemaJson \ "fields").extract[Seq[JValue]]
        .map(f => ((f \ "name").extract[String], (f \ "id").extract[Int]))
      assert(ids.map(_._2) === (1 to ids.size)) // sequential fresh ids
      val spec = (tbl.specJson \ "fields").extract[Seq[JValue]]
      assert(spec.map(f => (f \ "transform").extract[String]) === Seq("identity"))
      assert(spec.map(f => (f \ "field-id").extract[Int]) === Seq(1000))
      assert(spec.map(f => (f \ "source-id").extract[Int]) ===
             Seq(ids.toMap.apply("event_type")))
    }
  }

  test("appendDataFiles commits snapshots; listDataFiles unions all snapshots") {
    withCatalog { (fake, client) =>
      client.ensureNamespace("otel")
      client.ensureTable("otel", "events", Tables.events(spark, sf).limit(1).schema)
      client.appendDataFiles("otel", "events", Seq(
        DataFile("s3a://b/t/f1.parquet", 100, 10),
        DataFile("s3a://b/t/f2.parquet", 200, 20)))
      client.appendDataFiles("otel", "events", Seq(
        DataFile("s3a://b/t/f3.parquet", 300, 30),
        DataFile("s3a://b/t/f1.parquet", 100, 10))) // re-register dedups
      val files = client.listDataFiles("otel", "events")
      assert(files.toSet === Set("s3a://b/t/f1.parquet", "s3a://b/t/f2.parquet",
                                 "s3a://b/t/f3.parquet"))
      assert(fake.tables(("otel", "events")).snapshots.size === 2)
      // missing table → empty, not an error
      assert(client.listDataFiles("otel", "absent") === Seq.empty)
    }
  }

  test("commit conflict (409) retries optimistically against the new head") {
    withCatalog { (fake, client) =>
      client.ensureNamespace("otel")
      client.ensureTable("otel", "t", Tables.events(spark, sf).limit(1).schema)
      client.appendDataFiles("otel", "t", Seq(DataFile("f1", 1, 1)))
      // a concurrent writer moves main between our load and commit:
      // the fake flips currentId right after the next table GET
      val tbl = fake.tables(("otel", "t"))
      val realId = tbl.currentId
      tbl.currentId = Some(999999L) // client will load this and assert on it...
      // ...but a "concurrent" commit resets it before our POST lands
      val t2 = new Thread(() => { Thread.sleep(30); tbl.currentId = realId })
      t2.start()
      // first attempt asserts 999999 → by commit time main is back at realId → 409 → retry
      client.appendDataFiles("otel", "t", Seq(DataFile("f2", 2, 2)))
      t2.join()
      assert(client.listDataFiles("otel", "t").toSet === Set("f1", "f2"))
    }
  }

  test("concurrent appenders all land: the optimistic loop converges under contention") {
    withCatalog { (fake, client) =>
      client.ensureNamespace("otel")
      client.ensureTable("otel", "t", Tables.events(spark, sf).limit(1).schema)
      // 4 threads × 5 appends racing on the same branch: every commit
      // asserts the head it loaded, losers 409 and replay — all 20 file
      // sets must land, nothing lost, nothing double-registered. The
      // racing client gets a deep retry budget: a 4-way conflict storm
      // can 409 the same commit several times in a row legitimately.
      val racer = new RestCatalogClient(Settings(fake.uri,
        warehouse = fake.warehouseDir,
        auth = CatalogAuth(clientId = "svc", clientSecret = "hunter2"),
        retry = RetryPolicy(maxAttempts = 30, initialBackoffMs = 1,
          sleep = _ => ())))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 4).map { t =>
        new Thread(() => {
          try (0 until 5).foreach { i =>
            racer.appendDataFiles("otel", "t",
              Seq(DataFile(s"f-$t-$i", 1, 1)))
          } catch { case e: Throwable => errs.add(e) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, errs)
      val files = client.listDataFiles("otel", "t")
      assert(files.size === 20 && files.distinct.size === 20)
      assert(files.toSet === (for (t <- 0 until 4; i <- 0 until 5)
        yield s"f-$t-$i").toSet)
    }
  }

  /** r12 (VERDICT): Puffin statistics sidecars must ride REST-cataloged
    * tables — the reference's actual deployment shape — or a cataloged
    * user loses the point-lookup/NDV levers. Round-trip: build indexes
    * with [[graft.catalog.IcebergMaintenance]], publish via
    * `set-statistics`, resolve through a catalog load AND the cold
    * chain, survive a 409 conflict, then `remove-statistics`. */
  test("set-statistics round-trip: REST-registered sidecars restore point/ndv pruning; 409-replay safe") {
    import graft.catalog.{IcebergMaintenance, IcebergTableMetadata, IcebergTableReader}
    withCatalog { (fake, client) =>
      import spark.implicits._
      client.ensureNamespace("otel")
      val df = (0L until 4000L).map(i => (i, s"p$i")).toDF("id", "payload")
      client.ensureTable("otel", "tstats", df.schema)
      val loc = fake.tables(("otel", "tstats")).location
      val dataDir = java.nio.file.Files
        .createTempDirectory("graft-rest-stats").toString + "/data"
      df.repartition(8, org.apache.spark.sql.functions.col("id") % 8)
        .write.parquet(dataDir)
      val paths = java.nio.file.Files.list(java.nio.file.Paths.get(dataDir))
        .toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
        .toSeq.sorted
      val counts = graft.recovery.Recovery.fileRowCounts(spark, paths)
      client.appendDataFiles("otel", "tstats", paths.map(p =>
        DataFile(p, java.nio.file.Files.size(java.nio.file.Paths.get(p)),
          counts.getOrElse(p, 0L))))

      // build both indexes on the chain, then strip the chain's own
      // registration — leaving a table whose ONLY statistics record
      // will be what the REST catalog carries
      IcebergMaintenance.writeBloomIndex(spark, loc, "id")
      IcebergMaintenance.writeNdvIndex(spark, loc, Seq("id"), k = 512)
      val conf = spark.sparkContext.hadoopConfiguration
      val entry = IcebergTableReader.metadata(spark, loc).statistics.head
      IcebergTableMetadata.removeStatistics(conf, loc, entry.snapshotId)
      assert(IcebergTableReader.metadata(spark, loc).statistics.isEmpty)
      val nF = paths.size
      val (unpruned, _, _) = IcebergTableReader.pointFiles(spark, loc, "id", 7L)
      assert(unpruned.size === nF, "without stats every file must be kept")

      // publish via REST under a 409 storm: a "concurrent" writer moves
      // main between our load and commit (same choreography as the
      // append-conflict test) — the optimistic loop must replay
      val tbl = fake.tables(("otel", "tstats"))
      val realId = tbl.currentId
      tbl.currentId = Some(424242L)
      val t2 = new Thread(() => { Thread.sleep(30); tbl.currentId = realId })
      t2.start()
      client.setStatistics("otel", "tstats", entry)
      t2.join()

      // the catalog carries the spec-complete entry...
      val viaCatalog = client.loadTable("otel", "tstats").get.statistics
      assert(viaCatalog.map(s => (s.snapshotId, s.path, s.fileSizeInBytes,
        s.footerSizeInBytes)) === Seq((entry.snapshotId, entry.path,
        entry.fileSizeInBytes, entry.footerSizeInBytes)))
      assert(viaCatalog.head.footerSizeInBytes > 0)
      assert(viaCatalog.head.blobMetadata.map(_.blobType).toSet ===
        Set("graft-bloom-v1", "graft-kmv-ndv-v1"))
      // ...and the mirror restored the cold chain: point pruning and
      // metadata-only NDV both resolve again
      val (kept, _, _) = IcebergTableReader.pointFiles(spark, loc, "id", 7L)
      assert(kept.size < nF, "REST-registered bloom did not prune")
      val got7 = IcebergTableReader.readPoint(spark, loc, "id", 7L).collect()
      assert(got7.length === 1 && got7(0).getAs[Long]("id") === 7L)
      val ndv = IcebergTableReader.ndvFromStats(spark, loc).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(math.abs(ndv("id") - 4000L) <= 200L)

      // idempotent replay: setting the same entry again is a replace,
      // not a duplicate
      client.setStatistics("otel", "tstats", entry)
      assert(client.loadTable("otel", "tstats").get.statistics.size === 1)

      // remove-statistics drops it from catalog AND chain; reads fall
      // back to unpruned but stay exact
      client.removeStatistics("otel", "tstats", entry.snapshotId)
      assert(client.loadTable("otel", "tstats").get.statistics.isEmpty)
      assert(IcebergTableReader.metadata(spark, loc).statistics.isEmpty)
      val got7b = IcebergTableReader.readPoint(spark, loc, "id", 7L).collect()
      assert(got7b.length === 1)
    }
  }

  test("upsertFiles: merge-on-read DML through the REST commit protocol") {
    import graft.catalog.{IcebergCommit, IcebergTableReader}
    withCatalog { (fake, client) =>
      import spark.implicits._
      client.ensureNamespace("otel")
      val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("id", "name", "value")
      client.ensureTable("otel", "dim", v1.schema)
      val loc = fake.tables(("otel", "dim")).location
      val base = Files.createTempDirectory("graft-rest-upsert").toString
      def landed(df: org.apache.spark.sql.DataFrame, dir: String)
          : Seq[DataFile] = {
        df.coalesce(1).write.parquet(dir)
        val paths = graft.recovery.Recovery.listDataFiles(spark, dir)
          .collect().map(_.getString(0)).toSeq.sorted
        val counts = graft.recovery.Recovery.fileRowCounts(spark, paths)
        paths.map(p => DataFile(p, 0L, counts.getOrElse(p, 0L)))
      }
      client.appendDataFiles("otel", "dim", landed(v1, s"$base/d1"))

      // nightly refresh: id=2 changes, id=4 is new — ONE snapshot with
      // the fresh rows plus an equality delete on the key column
      val u = Seq((2L, "b2", 99.0), (4L, "d", 40.0))
        .toDF("id", "name", "value")
      val idField = RestCatalogClient.fieldIdOf(
        client.loadTable("otel", "dim").get.schemaJson, "id").get
      val keyFiles = landed(u.select($"id"), s"$base/k2")
      client.upsertFiles("otel", "dim", landed(u, s"$base/d2"),
        keyFiles.map(f =>
          IcebergCommit.DeleteFileSpec(f, content = 2, Seq(idField))))

      // the standalone chain cold-reads with the deletes APPLIED: the
      // updated row replaces its predecessor, the insert lands, rows
      // untouched by the key set survive
      val back = IcebergTableReader.read(spark, loc)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(back.toSeq === Seq((1L, "a", 10.0), (2L, "b2", 99.0),
        (3L, "c", 30.0), (4L, "d", 40.0)))
      // and the catalog advanced: two snapshots, head at the upsert
      assert(fake.tables(("otel", "dim")).snapshots.size === 2)

      // 409-replay safety, same choreography as the append-conflict
      // test: a concurrent writer moves main between load and commit
      val tbl = fake.tables(("otel", "dim"))
      val realId = tbl.currentId
      tbl.currentId = Some(707070L)
      val t2 = new Thread(() => { Thread.sleep(30); tbl.currentId = realId })
      t2.start()
      val u2 = Seq((4L, "d2", 44.0)).toDF("id", "name", "value")
      val keyFiles2 = landed(u2.select($"id"), s"$base/k3")
      client.upsertFiles("otel", "dim", landed(u2, s"$base/d3"),
        keyFiles2.map(f =>
          IcebergCommit.DeleteFileSpec(f, content = 2, Seq(idField))))
      t2.join()
      val back2 = IcebergTableReader.read(spark, loc)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(2)))
      assert(back2.toSeq === Seq((1L, 10.0), (2L, 99.0), (3L, 30.0),
        (4L, 44.0)))
    }
  }

  test("5xx is transient (retried); 403 is permanent (fail fast)") {
    withCatalog { (fake, client) =>
      client.ensureNamespace("otel")
      fake.failNext503.set(2)
      assert(client.listNamespaces() === Seq("otel")) // survived 2×503

      // bad static token → 401 with no refresh path → permanent, fail fast
      fake.failNext503.set(0)
      val bad = new RestCatalogClient(Settings(fake.uri,
        auth = CatalogAuth(token = "evil"), retry = RetryPolicy(
          maxAttempts = 5, initialBackoffMs = 1, sleep = _ => ())))
      val before = fake.requests.size
      intercept[PermanentException](bad.listNamespaces())
      // permanent at the first request (config discovery 401s): exactly
      // one request hit the server, no retry spin
      assert(fake.requests.size === before + 1)
      assert(fake.requests.last === "GET /v1/config")
    }
  }

  test("streaming ingest commits each batch to the catalog exactly once, through a 503") {
    withCatalog { (fake, client) =>
      import graft.sink.PartitionedParquetSink
      import graft.sink.PartitionedParquetSink.SinkConfig
      import graft.streaming.{Delivery, StreamingIngest}
      val base = Files.createTempDirectory("graft-restcat-stream").toString
      val batch = Tables.events(spark, sf).limit(400)
      val srcDir = s"$base/src"
      batch.write.parquet(srcDir)
      val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")

      // a transient 503 lands mid-first-batch: the client's retry layer
      // must absorb it (invisible to the batch) without double-registering
      fake.failNext503.set(1)
      Delivery.ingestWithCatalogRetrying(
        StreamingIngest.readEvents(spark, srcDir, batch.schema), cfg,
        s"$base/chk", client, "otel", "events", policy = fastRetry)
        .awaitTermination()
      assert(fake.failNext503.get() === 0, "injected 503 was never served")

      val tablePath = PartitionedParquetSink.tablePath(cfg)
      def storagePaths = graft.recovery.Recovery.listDataFiles(spark, tablePath)
        .collect().map(_.getString(0)).toSet
      val reg1 = client.listDataFiles("otel", "events")
      assert(reg1.toSet === storagePaths && reg1.nonEmpty)
      assert(reg1.size === reg1.distinct.size)
      // catalog table got the sink's partition columns as identity spec
      val spec = (fake.tables(("otel", "events")).specJson \ "fields")
        .extract[Seq[JValue]].map(f => (f \ "name").extract[String])
      assert(spec === Seq("year", "month", "day"))

      // second run with NEW source files: exactly the delta registers
      batch.limit(100).write.mode("append").parquet(srcDir)
      Delivery.ingestWithCatalogRetrying(
        StreamingIngest.readEvents(spark, srcDir, batch.schema), cfg,
        s"$base/chk", client, "otel", "events", policy = fastRetry)
        .awaitTermination()
      val reg2 = client.listDataFiles("otel", "events")
      assert(reg2.toSet === storagePaths)
      assert(reg2.size === reg2.distinct.size, "a path was registered twice")
    }
  }

  test("end-to-end: sink-written parquet registered and listed through the catalog") {
    withCatalog { (fake, client) =>
      import graft.sink.PartitionedParquetSink
      import graft.sink.PartitionedParquetSink.SinkConfig
      val base = Files.createTempDirectory("graft-restcat-e2e").toString
      val batch = Tables.events(spark, sf).limit(500)
      val cfg = SinkConfig(base, "events", tsColumn = "ts", granularity = "daily")
      PartitionedParquetSink.writeBatch(batch, cfg)
      val tablePath = PartitionedParquetSink.tablePath(cfg)

      client.ensureNamespace("otel")
      client.ensureTable("otel", "events", batch.schema,
        partitionCols = Seq("event_type"))
      val files = graft.recovery.Recovery.listDataFiles(spark, tablePath)
        .collect().map(r => DataFile(r.getString(0), r.getLong(1), 0L)).toSeq
      client.appendDataFiles("otel", "events", files)

      val registered = client.listDataFiles("otel", "events")
      assert(registered.toSet === files.map(_.path).toSet && registered.nonEmpty)
      // the registered list reads back to exactly the written rows
      val back = spark.read.option("basePath", tablePath)
        .parquet(registered: _*)
      assert(back.count() === batch.count())
    }
  }

  /** r6 (ADVICE): Iceberg resolves columns by field id, so the ids the
    * SINK stamps into parquet footers and the ids the catalog schema
    * declares must agree for every field that exists in both — with
    * arrays and maps in the schema (every OTel flat table has them),
    * the old interleaved numbering diverged after the first container. */
  test("parquet footer field ids match the catalog schema ids (arrays+maps)") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("attrs", MapType(StringType, StringType)),
      StructField("tags", ArrayType(StringType)),
      StructField("nested", StructType(Seq(
        StructField("a", IntegerType),
        StructField("b", ArrayType(StructType(Seq(
          StructField("c", DoubleType)))))))),
      StructField("ts", TimestampType)))
    val row = org.apache.spark.sql.Row(
      1L, Map("k" -> "v"), Seq("t1"),
      org.apache.spark.sql.Row(7, Seq(org.apache.spark.sql.Row(1.5))),
      java.sql.Timestamp.valueOf("2024-03-05 07:30:00"))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(row), schema)

    val dir = Files.createTempDirectory("graft-fieldid").toString
    graft.sink.PartitionedParquetSink.withIcebergFieldIds(df)
      .coalesce(1).write.mode("overwrite").parquet(dir)

    // harvest (dotted path → field id) from the written footer
    val file = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    val footerIds = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def walk(t: org.apache.parquet.schema.Type, path: Seq[String]): Unit = {
      val p = path :+ t.getName
      if (t.getId != null) footerIds(p.mkString(".")) = t.getId.intValue()
      t match {
        case g: org.apache.parquet.schema.GroupType =>
          g.getFields.asScala.foreach(walk(_, p))
        case _ => ()
      }
    }
    try reader.getFooter.getFileMetaData.getSchema.getFields.asScala
      .foreach(walk(_, Nil))
    finally reader.close()
    assert(footerIds.nonEmpty)

    // harvest (dotted path → id) from the catalog schema JSON
    val (json, _) = RestCatalogClient.icebergSchemaJson(schema)
    val catalogIds = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def walkJson(j: JValue, path: Seq[String]): Unit = j match {
      case JObject(fields) =>
        val name = fields.collectFirst { case ("name", JString(n)) => n }
        val id = fields.collectFirst { case ("id", JInt(n)) => n.toInt }
        val p = name.map(path :+ _).getOrElse(path)
        (name, id) match {
          case (Some(n), Some(i)) => catalogIds(p.mkString(".")) = i
          case _ => ()
        }
        fields.foreach { case (_, v) => walkJson(v, p) }
      case JArray(vs) => vs.foreach(walkJson(_, path))
      case _ => ()
    }
    walkJson(json, Nil)

    // every footer id resolves to the SAME id in the catalog schema
    footerIds.foreach { case (path, fid) =>
      assert(catalogIds.get(path).contains(fid),
        s"field $path: footer id $fid vs catalog id ${catalogIds.get(path)}")
    }
    // and all sink-stampable fields made it to the footer (both walks
    // cover exactly the non-container-nested struct fields)
    val stampable = Set("id", "attrs", "tags", "nested", "nested.a",
      "nested.b", "ts")
    assert(footerIds.keySet === stampable)
  }

  /** r6: the commit writes REAL Iceberg v2 Avro metadata. The
    * INDEPENDENT reader here is org.apache.avro's GenericDatumReader
    * (the reference Avro implementation, from the Spark classpath) —
    * if the hand-rolled [[graft.catalog.AvroOcf]] writer deviates from
    * the Avro spec in any byte, this decode fails. */
  test("commit round-trips through the reference Avro implementation") {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import scala.jdk.CollectionConverters._

    def avroRecords(path: String): (Seq[GenericRecord], Map[String, String]) = {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(new java.net.URI(path)))
      val rdr = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
      val recs = rdr.iterator().asScala.toList
      val meta = rdr.getMetaKeys.asScala.toList
        .map(k => k -> rdr.getMetaString(k)).toMap
      rdr.close()
      (recs, meta)
    }

    withCatalog { (fake, client) =>
      client.ensureNamespace("otel")
      client.ensureTable("otel", "events", Tables.events(spark, sf).limit(1).schema)
      client.appendDataFiles("otel", "events", Seq(
        DataFile("s3a://b/t/f1.parquet", 100, 10),
        DataFile("s3a://b/t/f2.parquet", 200, 20)))

      val (_, listPath) = fake.tables(("otel", "events")).snapshots.head
      val (manifests, listMeta) = avroRecords(listPath)
      assert(listMeta("format-version") === "2")
      assert(manifests.size === 1)
      val mf = manifests.head
      assert(mf.get("added_data_files_count").asInstanceOf[Int] === 2)
      assert(mf.get("added_rows_count").asInstanceOf[Long] === 30L)
      assert(mf.get("sequence_number").asInstanceOf[Long] === 1L)
      assert(mf.get("content").asInstanceOf[Int] === 0)

      val manifestPath = mf.get("manifest_path").toString
      // manifest_length matches the actual file byte length
      val realLen = java.nio.file.Files.size(
        java.nio.file.Paths.get(new java.net.URI(manifestPath)))
      assert(mf.get("manifest_length").asInstanceOf[Long] === realLen)

      val (entries, mMeta) = avroRecords(manifestPath)
      assert(mMeta("format-version") === "2" && mMeta("content") === "data")
      // the embedded table schema is the catalog's current schema
      assert(mMeta("schema").contains("\"fields\""))
      assert(entries.size === 2)
      val byPath = entries.map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        df.get("file_path").toString ->
          (e.get("status").asInstanceOf[Int],
           df.get("record_count").asInstanceOf[Long],
           df.get("file_size_in_bytes").asInstanceOf[Long],
           df.get("file_format").toString)
      }.toMap
      assert(byPath("s3a://b/t/f1.parquet") === ((1, 10L, 100L, "PARQUET")))
      assert(byPath("s3a://b/t/f2.parquet") === ((1, 20L, 200L, "PARQUET")))
      // every manifest field carries its spec field-id (readers resolve
      // columns by id, not name — the cross-engine contract)
      val schemaJson = org.json4s.jackson.JsonMethods.parse(listMeta("avro.schema"))
      val ids = (schemaJson \ "fields").children
        .map(f => (f \ "field-id").extract[Int])
      assert(ids.take(7) === Seq(500, 501, 502, 517, 515, 516, 503))

      // and the client's own schema-driven reader agrees
      assert(client.listDataFiles("otel", "events").toSet ===
        Set("s3a://b/t/f1.parquet", "s3a://b/t/f2.parquet"))
    }
  }

  /** The schema-driven [[graft.catalog.AvroOcf]] READER must also decode
    * manifests produced by OTHER writers: different field order and the
    * `deflate` codec, both exercised by writing with the reference Avro
    * implementation and reading with ours. */
  test("AvroOcf reader decodes reference-written files (deflate, reordered fields)") {
    import org.apache.avro.{Schema => ASchema}
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

    // field order differs from our writer's (file_path before status),
    // and ints/longs/unions/arrays are all present
    val schemaStr =
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |  {"name":"file_path","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"split_offsets","type":["null",{"type":"array","items":"long"}],"default":null}]}},
        |{"name":"status","type":"int"},
        |{"name":"snapshot_id","type":["null","long"],"default":null}
        |]}""".stripMargin
    val schema = new ASchema.Parser().parse(schemaStr)
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.setMeta("content", "data")
    w.create(schema, out)
    (0 until 3).foreach { i =>
      val df = new GenericData.Record(schema.getField("data_file").schema())
      df.put("file_path", s"f$i.parquet")
      df.put("record_count", i.toLong * 10)
      df.put("split_offsets",
        if (i == 0) null
        else java.util.Arrays.asList(Long.box(4L), Long.box(8L)))
      val rec = new GenericData.Record(schema)
      rec.put("data_file", df)
      rec.put("status", 1)
      rec.put("snapshot_id", if (i == 2) Long.box(99L) else null)
      w.append(rec)
    }
    w.close()

    val (meta, records) = graft.catalog.AvroOcf.read(out.toByteArray)
    assert(meta("avro.codec") === "deflate" && meta("content") === "data")
    assert(records.size === 3)
    val r2 = records(2).asInstanceOf[Map[String, Any]]
    assert(r2("status") === 1)
    assert(r2("snapshot_id") === 99L)
    val df2 = r2("data_file").asInstanceOf[Map[String, Any]]
    assert(df2("file_path") === "f2.parquet")
    assert(df2("record_count") === 20L)
    assert(df2("split_offsets") === Seq(4L, 8L))
    val df0 = records(0).asInstanceOf[Map[String, Any]]
      .apply("data_file").asInstanceOf[Map[String, Any]]
    assert(df0("split_offsets") === null)
  }

  test("updateSpecFields: composite bucket spec evolves through the catalog") {
    import org.apache.spark.sql.types._
    withCatalog { (fake, client) =>
      client.ensureNamespace("otel")
      val schema = StructType(Seq(StructField("ts", LongType),
        StructField("service", LongType)))
      client.ensureTable("otel", "spans", schema)
      // the composite point-lookup spec the verdict called for:
      // hour(ts) × bucket[16](service)
      client.updateSpecFields("otel", "spans", Seq(
        ("ts_hour", "ts", "hour"),
        ("service_bucket", "service", "bucket[16]")))
      val info = client.loadTable("otel", "spans").get
      val fields = graft.catalog.IcebergPartitioning.fieldsOf(
        info.defaultSpec.get)
      assert(fields.map(f => (f.name, f.transform, f.fieldId)) === Seq(
        ("ts_hour", "hour", 1000),
        ("service_bucket", "bucket[16]", 1001)))
      // the stand-alone chain mirrors the new default spec
      val conf = spark.sparkContext.hadoopConfiguration
      val m = graft.catalog.IcebergTableMetadata.load(conf, info.location).get
      val coldFields = graft.catalog.IcebergPartitioning.fields(m)
      assert(coldFields.map(_.transform) === Seq("hour", "bucket[16]"))
      // an unknown transform is rejected before any commit
      val e = intercept[Exception] {
        client.updateSpecFields("otel", "spans",
          Seq(("bad", "ts", "void[3]")))
      }
      assert(e.getMessage.contains("transform"))
      // a SECOND evolution continues the field-id sequence (Iceberg v2:
      // partition field ids are unique ACROSS specs — a foreign reader
      // keying tuples by id must never see 1000 mean two different
      // (source, transform) pairs)
      client.updateSpecFields("otel", "spans",
        Seq(("ts_day", "ts", "day")))
      val info2 = client.loadTable("otel", "spans").get
      val f2 = graft.catalog.IcebergPartitioning.fieldsOf(
        info2.defaultSpec.get)
      assert(f2.map(f => (f.name, f.fieldId)) === Seq(("ts_day", 1002)))
    }
  }

  test("updateProperties: set/remove round-trip catalog AND stand-alone chain") {
    import org.apache.spark.sql.types._
    withCatalog { (fake, client) =>
      client.ensureNamespace("otel")
      val schema = StructType(Seq(StructField("id", LongType)))
      client.ensureTable("otel", "knobs", schema)
      // retention knobs ride properties (the operator's real use)
      client.updateProperties("otel", "knobs",
        set = Map("history.expire.max-snapshot-age-ms" -> "3600000",
                  "commit.retry.num-retries" -> "7"))
      // server state + client read-back agree
      assert(fake.tables(("otel", "knobs")).props.toMap ===
        Map("history.expire.max-snapshot-age-ms" -> "3600000",
            "commit.retry.num-retries" -> "7"))
      val info = client.loadTable("otel", "knobs").get
      assert(info.properties("commit.retry.num-retries") === "7")
      // the stand-alone chain mirrors the knobs (cold readers see them)
      val conf = spark.sparkContext.hadoopConfiguration
      val m1 = graft.catalog.IcebergTableMetadata.load(conf, info.location).get
      assert(m1.properties("history.expire.max-snapshot-age-ms") === "3600000")
      // remove one, overwrite the other — converged state on both sides
      client.updateProperties("otel", "knobs",
        set = Map("commit.retry.num-retries" -> "3"),
        remove = Set("history.expire.max-snapshot-age-ms"))
      assert(fake.tables(("otel", "knobs")).props.toMap ===
        Map("commit.retry.num-retries" -> "3"))
      val m2 = graft.catalog.IcebergTableMetadata.load(conf, info.location).get
      assert(m2.properties.get("history.expire.max-snapshot-age-ms").isEmpty)
      assert(m2.properties("commit.retry.num-retries") === "3")
      // properties CARRY FORWARD across unrelated chain commits
      graft.catalog.IcebergTableMetadata.commit(conf, info.location,
        m2.schemaJson, None, None)
      val m3 = graft.catalog.IcebergTableMetadata.load(conf, info.location).get
      assert(m3.properties("commit.retry.num-retries") === "3")
    }
  }

  test("testConnection: best-effort probe — success count, failure diagnostic, never throws") {
    withCatalog { (fake, client) =>
      client.ensureNamespace("otel")
      client.ensureNamespace("metrics")
      assert(client.testConnection() === Right(2))
    }
    // unreachable catalog: Left with a diagnostic (and the reference's
    // no-token hint when no auth is configured), not an exception
    val dead = new RestCatalogClient(Settings("http://127.0.0.1:1",
      retry = fastRetry))
    dead.testConnection() match {
      case Left(msg) =>
        assert(msg.contains("connection test failed"))
        assert(msg.contains("no authentication configured"))
      case Right(n) => fail(s"expected failure, got Right($n)")
    }
  }
}
